"""Round-13 operator tests: pure-Python replays of every inference_queries
statistic against the same parquet, plus planted-shape detection tests.

Replay discipline (test_round12b_ops): exact integers compare with ==;
rounded doubles compare via _r6 half-away rounding of a Python expression
tree that MIRRORS the engines' double tree (including float() casts where
the SQL casts to DOUBLE before multiplying — int*int would stay exact in
Python where the engines round)."""

from __future__ import annotations

import collections
import datetime
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from fusionspark.queries.inference_queries import (
    bartlett_test,
    bowker_symmetry,
    cliffs_delta,
    cochran_armitage,
    cvm_two_sample,
    ece_calibration,
    embedding_dim_stats,
    graph_assortativity,
    jonckheere_terpstra,
    kpss_test,
    mantel_haenszel,
    morans_i,
    ordinal_association,
    pass_at_k,
    permutation_entropy,
    theil_u,
    wilcoxon_signed_rank,
)

_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _r6(x: float) -> float:
    s = x * 1e6
    return (math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)) / 1e6


def _cents(v: float) -> int:
    return math.floor(v * 100.0 + 0.5)


def _daily(rows):
    d = collections.defaultdict(int)
    for r in rows:
        d[r["ts"].date()] += _cents(r["value"])
    return d


def _dow(ts) -> int:
    return (ts.weekday() + 1) % 7  # python Mon=0 -> Sun=0 convention


# ---------------------------------------------------------------------------
# day-grid pair statistics
# ---------------------------------------------------------------------------


def test_ordinal_association_replay(spark, sf_dir):
    rows = _events(sf_dir)
    x = collections.defaultdict(int)
    c = collections.defaultdict(int)
    for r in rows:
        day = r["ts"].date()
        x[day] += _cents(r["value"])
        c[day] += 1
    days = sorted(x)
    nc = nd = n1 = n2 = n0 = 0
    for i, a in enumerate(days):
        for b in days[i + 1:]:
            s = (x[a] - x[b]) * (c[a] - c[b])
            nc += s > 0
            nd += s < 0
            n1 += x[a] == x[b]
            n2 += c[a] == c[b]
            n0 += 1
    got = ordinal_association(spark, sf_dir).collect()[0]
    assert (got["n_pairs"], got["concordant"], got["discordant"]) == (n0, nc, nd)
    assert got["gamma"] == _r6((nc - nd) / (nc + nd))
    assert got["somers_d_cx"] == _r6((nc - nd) / (n0 - n1))
    assert got["somers_d_xc"] == _r6((nc - nd) / (n0 - n2))


def test_jonckheere_replay(spark, sf_dir):
    rows = _events(sf_dir)
    vals = {t: sorted(_cents(r["value"]) for r in rows if r["event_type"] == t)
            for t in _TYPES}
    j2 = 0
    for i in range(5):
        for j in range(i + 1, 5):
            for vb in vals[_TYPES[j]]:
                # 2*#less + #ties, counted directly (quadratic but sf0.001)
                j2 += 2 * sum(1 for va in vals[_TYPES[i]] if va < vb)
                j2 += sum(1 for va in vals[_TYPES[i]] if va == vb)
    ns = [len(vals[t]) for t in _TYPES]
    n = sum(ns)
    sn2 = sum(v * v for v in ns)
    snv = sum(v * v * (2 * v + 3) for v in ns)
    dev4 = 2 * j2 - (n * n - sn2)
    got = jonckheere_terpstra(spark, sf_dir).collect()[0]
    assert got["n_obs"] == n
    assert got["j_doubled"] == j2
    assert got["dev4"] == dev4
    assert got["direction"] == (dev4 > 0) - (dev4 < 0)
    z = dev4 / math.sqrt(float(n * n * (2 * n + 3) - snv) * 16 / 72)
    assert got["z"] == _r6(z) + 0.0


def test_wilcoxon_replay(spark, sf_dir):
    rows = _events(sf_dir)
    xp = collections.defaultdict(int)
    xv = collections.defaultdict(int)
    for r in rows:
        if r["event_type"] == "purchase":
            xp[r["ts"].date()] += _cents(r["value"])
        elif r["event_type"] == "view":
            xv[r["ts"].date()] += _cents(r["value"])
    diffs = [xp[d] - xv[d] for d in set(xp) | set(xv) if xp[d] != xv[d]]
    ads = sorted(abs(d) for d in diffs)
    # doubled midranks
    w2 = 0
    for d in diffs:
        if d > 0:
            below = sum(1 for a in ads if a < abs(d))
            cnt = sum(1 for a in ads if a == abs(d))
            w2 += 2 * below + cnt + 1
    n = len(diffs)
    ties = sum(
        t * t * t - t
        for t in collections.Counter(ads).values()
        if t > 1
    )
    dev4 = 2 * w2 - n * (n + 1)
    got = wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert got["n_nonzero"] == n
    assert got["w_plus_doubled"] == w2
    assert got["dev4"] == dev4
    z = dev4 / math.sqrt(float(2 * n * (n + 1) * (2 * n + 1) - ties) / 3)
    assert got["z"] == _r6(z) + 0.0


def test_cliffs_delta_replay(spark, sf_dir):
    rows = _events(sf_dir)
    p = sorted(_cents(r["value"]) for r in rows if r["event_type"] == "purchase")
    v = sorted(_cents(r["value"]) for r in rows if r["event_type"] == "view")
    gt = sum(1 for a in p for b in v if a > b)
    lt = sum(1 for a in p for b in v if a < b)
    got = cliffs_delta(spark, sf_dir).collect()[0]
    assert (got["n_purchase"], got["n_view"]) == (len(p), len(v))
    assert (got["n_greater"], got["n_less"]) == (gt, lt)
    assert got["delta"] == _r6((gt - lt) / (len(p) * len(v))) + 0.0
    nm = len(p) * len(v)
    bands = [(147, "negligible"), (330, "small"), (474, "medium")]
    mag = "large"
    for lim, name in reversed(bands):
        if abs(gt - lt) * 1000 < lim * nm:
            mag = name
    assert got["magnitude"] == mag


# ---------------------------------------------------------------------------
# categorical / stratified
# ---------------------------------------------------------------------------


def test_cochran_armitage_replay(spark, sf_dir):
    rows = _events(sf_dir)
    n = collections.Counter()
    a = collections.Counter()
    for r in rows:
        w = _dow(r["ts"])
        n[w] += 1
        a[w] += r["event_type"] == "purchase"
    nn, aa = sum(n.values()), sum(a.values())
    snw = sum(n[w] * w for w in n)
    snw2 = sum(n[w] * w * w for w in n)
    saw = sum(a[w] * w for w in a)
    tnum = nn * saw - aa * snw
    got = cochran_armitage(spark, sf_dir).collect()[0]
    assert (got["n_obs"], got["n_pos"], got["n_doses"]) == (nn, aa, len(n))
    assert got["t_num"] == tnum
    z = tnum / math.sqrt(float(aa * (nn - aa)) * float(nn * snw2 - snw * snw) / nn)
    assert got["z"] == _r6(z) + 0.0


def test_mantel_haenszel_replay(spark, sf_dir):
    rows = _events(sf_dir)
    cell = collections.Counter()
    for r in rows:
        w = _dow(r["ts"])
        g = r["user_id"] % 2
        pos = r["event_type"] == "purchase"
        cell[(w, g, pos)] += 1
    sad = sbc = se = sv = 0.0
    sa = 0
    for w in range(7):
        a = cell[(w, 1, True)]
        b = cell[(w, 1, False)]
        c = cell[(w, 0, True)]
        d = cell[(w, 0, False)]
        ni = a + b + c + d
        sa += a
        if ni > 0:
            sad += (a * d) / ni
            sbc += (b * c) / ni
            se += ((a + b) * (a + c)) / ni
        if ni > 1:
            sv += float((a + b) * (c + d)) * float((a + c) * (b + d)) / (
                (float(ni) * ni) * (ni - 1)
            )
    got = mantel_haenszel(spark, sf_dir).collect()[0]
    assert got["sum_a"] == sa
    assert got["sum_e"] == _r6(se)
    assert got["or_mh"] == _r6(sad / sbc) + 0.0
    assert got["chi2_cmh"] == _r6((sa - se) * (sa - se) / sv) + 0.0
    assert got["direction"] == (sa > se) - (sa < se)


def test_theil_u_replay(spark, sf_dir):
    rows = _events(sf_dir)
    cells = collections.Counter()
    for r in rows:
        cells[(_dow(r["ts"]), r["event_type"])] += 1
    n = sum(cells.values())
    sk = 0.0
    for j, t in enumerate(_TYPES):
        k = sum(cells[(i, t)] for i in range(7))
        if k > 0:
            sk += k * math.log(k)
    sr = 0.0
    for i in range(7):
        rr = sum(cells[(i, t)] for t in _TYPES)
        if rr > 0:
            sr += rr * math.log(rr)
    sc = sum(c * math.log(c) for c in
             (cells[(i, t)] for i in range(7) for t in _TYPES) if c > 0)
    hy = math.log(n) - sk / n
    hyx = (sr - sc) / n
    got = theil_u(spark, sf_dir).collect()[0]
    assert got["n_obs"] == n
    assert got["h_type"] == _r6(hy)
    assert got["h_type_given_dow"] == _r6(hyx)
    assert got["theil_u"] == _r6((hy - hyx) / hy) + 0.0


def test_bowker_replay(spark, sf_dir):
    rows = sorted(_events(sf_dir), key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    trans = collections.Counter()
    for a, b in zip(rows, rows[1:]):
        if a["user_id"] == b["user_id"]:
            trans[(a["event_type"], b["event_type"])] += 1
    chi2 = 0.0
    df = 0
    for i in range(5):
        for j in range(i + 1, 5):
            cij = trans[(_TYPES[i], _TYPES[j])]
            cji = trans[(_TYPES[j], _TYPES[i])]
            if cij + cji > 0:
                chi2 += (cij - cji) ** 2 / (cij + cji)
                df += 1
    got = bowker_symmetry(spark, sf_dir).collect()[0]
    assert got["n_transitions"] == sum(trans.values())
    assert got["df"] == df
    assert got["chi2"] == _r6(chi2) + 0.0


# ---------------------------------------------------------------------------
# variance / distribution shape
# ---------------------------------------------------------------------------


def test_bartlett_replay(spark, sf_dir):
    rows = _events(sf_dir)
    g = collections.defaultdict(list)
    for r in rows:
        g[r["event_type"]].append(_cents(r["value"]))
    ns = [len(g[t]) for t in _TYPES]
    ss_ = [sum(g[t]) for t in _TYPES]
    sss = [sum(v * v for v in g[t]) for t in _TYPES]
    n = sum(ns)
    sstot = sum(sss)
    sb = sum(float(s) * s / k for s, k in zip(ss_, ns))
    sln = sum(
        (k - 1) * math.log((q - float(s) * s / k) / (k - 1))
        for k, s, q in zip(ns, ss_, sss)
    )
    sinv = sum(1.0 / (k - 1) for k in ns)
    chi2 = ((n - 5) * math.log((sstot - sb) / (n - 5)) - sln) / (
        1 + (sinv - 1.0 / (n - 5)) / 12
    )
    got = bartlett_test(spark, sf_dir).collect()[0]
    assert got["n_obs"] == n
    assert got["chi2"] == _r6(chi2) + 0.0
    assert got["variances_differ"] == (chi2 > 9488 / 1000)


def test_cvm_replay(spark, sf_dir):
    rows = _events(sf_dir)
    p = sorted(_cents(r["value"]) for r in rows if r["event_type"] == "purchase")
    v = sorted(_cents(r["value"]) for r in rows if r["event_type"] == "view")
    n, m = len(p), len(v)
    grid = sorted(set(p) | set(v))
    cp = collections.Counter(p)
    cv = collections.Counter(v)
    fp = fv = 0
    s2 = 0
    for val in grid:
        fp += cp[val]
        fv += cv[val]
        s2 += (cp[val] + cv[val]) * (m * fp - n * fv) ** 2
    t = float(s2) / ((float(n) * m) * (float(n + m) * (n + m)))
    got = cvm_two_sample(spark, sf_dir).collect()[0]
    assert (got["n_purchase"], got["n_view"]) == (n, m)
    assert got["cvm_t"] == _r6(t)


def test_kpss_replay(spark, sf_dir):
    d = _daily(_events(sf_dir))
    days = sorted(d)
    n = len(days)
    s = sum(d.values())
    dev = [n * d[k] - s for k in days]
    p = 0
    sp2 = sd2 = 0
    for x in dev:
        p += x
        sp2 += p * p
        sd2 += x * x
    eta = float(sp2) / (float(n) * float(sd2))
    got = kpss_test(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    assert got["kpss_eta"] == _r6(eta)
    assert got["nonstationary"] == (eta > 463 / 1000)


def test_permutation_entropy_replay(spark, sf_dir):
    d = _daily(_events(sf_dir))
    xs = [d[k] for k in sorted(d)]

    def trit(hi, lo):
        return 2 if hi > lo else (1 if hi == lo else 0)

    pats = collections.Counter(
        trit(x2, x1) * 9 + trit(x3, x1) * 3 + trit(x3, x2)
        for x1, x2, x3 in zip(xs, xs[1:], xs[2:])
    )
    nw = sum(pats.values())
    sc = sum(c * math.log(c) for c in pats.values() if c > 0)
    h = math.log(nw) - sc / nw
    got = permutation_entropy(spark, sf_dir).collect()[0]
    assert got["n_windows"] == nw == len(xs) - 2
    assert got["n_patterns"] == len(pats)
    assert got["perm_entropy"] == _r6(h) + 0.0
    ln6 = 1791759469228055 / 10**15
    assert got["normalized"] == _r6(h / ln6) + 0.0


def test_permutation_entropy_monotone_is_zero(spark, tmp_path):
    """A strictly increasing series has ONE ordinal pattern -> H = 0."""
    base = datetime.datetime(2026, 2, 1, 12)
    ts, vals = [], []
    for i in range(10):
        ts.append(base + datetime.timedelta(days=i))
        vals.append(float(i + 1))  # strictly increasing daily revenue
    tbl = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 10, pa.int64()),
            "event_type": pa.array(["view"] * 10, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 10, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = permutation_entropy(spark, str(tmp_path)).collect()[0]
    assert got["n_windows"] == 8
    assert got["n_patterns"] == 1
    assert got["perm_entropy"] == 0.0
    assert got["normalized"] == 0.0


# ---------------------------------------------------------------------------
# graph / embeddings / spatial
# ---------------------------------------------------------------------------


def test_assortativity_replay(spark, sf_dir):
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    edges = set()
    for d in range(n_docs):
        for a, b in ((1, 1), (1, 2), (3, 1)):
            t = (d * a + b) % n_docs
            if t != d:
                edges.add((min(d, t), max(d, t)))
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    sjk = sum(deg[a] * deg[b] for a, b in edges)
    sjpk = sum(deg[a] + deg[b] for a, b in edges)
    sj2k2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    num4 = 4 * m * sjk - sjpk * sjpk
    den4 = 2 * m * sj2k2 - sjpk * sjpk
    got = graph_assortativity(spark, sf_dir).collect()[0]
    assert got["n_edges"] == m
    assert (got["num4"], got["den4"]) == (num4, den4)
    assert got["assortativity"] == _r6(num4 / den4) + 0.0


def test_embedding_dim_stats_replay(spark, sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    per = collections.defaultdict(list)
    for r in tbl:
        for i, v in enumerate(r["embedding"]):
            per[i].append(math.floor(float(v) * 1000000.0 + 0.5))
    got = {r["dim"]: r for r in embedding_dim_stats(spark, sf_dir).collect()}
    assert sorted(got) == sorted(per)
    for dim, qs in per.items():
        r = got[dim]
        n, sq, ssq = len(qs), sum(qs), sum(q * q for q in qs)
        assert (r["n"], r["min_micro"], r["max_micro"], r["sum_micro"]) == (
            n, min(qs), max(qs), sq,
        )
        assert r["mean"] == _r6((sq / n) / 1000000.0) + 0.0
        assert r["variance"] == _r6(
            (ssq - float(sq) * sq / n) / (n - 1) / 1e12
        ) + 0.0


def test_morans_i_replay(spark, sf_dir):
    rows = _events(sf_dir)
    x = collections.Counter(r["user_id"] for r in rows)
    users = sorted(x)
    n = len(users)
    s = sum(x.values())
    coord = {
        u: (_md5_32(f"gx:{u}") % 10000, _md5_32(f"gy:{u}") % 10000)
        for u in users
    }
    d = {u: n * x[u] - s for u in users}
    se = 0
    npairs = 0
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            dx = coord[a][0] - coord[b][0]
            dy = coord[a][1] - coord[b][1]
            if dx * dx + dy * dy <= 10000:
                npairs += 1
                se += d[a] * d[b]
    sd2 = sum(v * v for v in d.values())
    got = morans_i(spark, sf_dir).collect()[0]
    assert (got["n_users"], got["n_pairs"]) == (n, npairs)
    if npairs and sd2:
        i_stat = (float(n) * float(se)) / (float(npairs) * float(sd2))
        assert got["morans_i"] == _r6(i_stat) + 0.0
    assert got["expected_i"] == _r6(-1.0 / (n - 1))


# ---------------------------------------------------------------------------
# eval / calibration
# ---------------------------------------------------------------------------


def test_pass_at_k_replay(spark, sf_dir):
    rows = _events(sf_dir)
    n = collections.Counter()
    c = collections.Counter()
    for r in rows:
        n[r["user_id"]] += 1
        c[r["user_id"]] += r["event_type"] == "purchase"
    got = {r["user_id"]: r for r in pass_at_k(spark, sf_dir).collect()}
    expect_users = [u for u in n if n[u] >= 5]
    assert sorted(got) == sorted(expect_users)
    for u in expect_users:
        prod = 1.0
        for i in range(5):
            prod *= 0.0 if n[u] - c[u] - i <= 0 else (n[u] - c[u] - i) / (n[u] - i)
        r = got[u]
        assert (r["n_attempts"], r["n_correct"]) == (n[u], c[u])
        assert r["pass_at_5"] == _r6(1.0 - prod)


def test_pass_at_k_boundary_values():
    """c = 0 -> pass@5 = 0; c >= n-4 -> a zero factor -> pass@5 = 1."""
    def pass5(n, c):
        prod = 1.0
        for i in range(5):
            prod *= 0.0 if n - c - i <= 0 else (n - c - i) / (n - i)
        return 1.0 - prod

    assert pass5(20, 0) == 0.0
    assert pass5(20, 16) == 1.0  # n-c = 4 < 5: success guaranteed in top-5
    assert 0.0 < pass5(20, 5) < 1.0


def test_ece_replay(spark, sf_dir):
    rows = _events(sf_dir)
    cell = collections.Counter()
    pos = collections.Counter()
    for r in rows:
        k = (_dow(r["ts"]), r["user_id"] % 2)
        cell[k] += 1
        pos[k] += r["event_type"] == "purchase"
    nn = sum(cell[(w, 1)] for w in range(7))
    ece = 0.0
    mce = 0.0
    used = 0
    for w in range(7):
        ne, ae = cell[(w, 0)], pos[(w, 0)]
        no, ao = cell[(w, 1)], pos[(w, 1)]
        if ne > 0 and no > 0:
            gap = abs(ao / no - ae / ne)
            ece += (no / nn) * gap
            mce = max(mce, gap)
            used += 1
    got = ece_calibration(spark, sf_dir).collect()[0]
    assert (got["n_eval"], got["n_bins_used"]) == (nn, used)
    assert got["ece"] == _r6(ece)
    assert got["mce"] == _r6(mce)


def test_cochran_armitage_planted_trend(spark, tmp_path):
    """A planted monotone dose-response (purchase rate rising with dow)
    must produce direction = +1 and a large positive z."""
    base = datetime.datetime(2026, 2, 1, 12)  # a Sunday (dow 0)
    ts, uid, etype = [], [], []
    eid = 0
    for w in range(7):
        day = base + datetime.timedelta(days=w)
        assert _dow(day) == w
        for i in range(100):
            ts.append(day + datetime.timedelta(seconds=i))
            uid.append(eid)
            etype.append("purchase" if i < 10 * (w + 1) else "view")
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array([1.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = cochran_armitage(spark, str(tmp_path)).collect()[0]
    assert got["n_obs"] == 700
    assert got["n_pos"] == sum(10 * (w + 1) for w in range(7))
    assert got["direction"] == 1
    assert got["z"] > 6.0  # overwhelming planted trend
