"""Round-10 rank/distribution statistics: independent pure-Python
recomputation of each statistic from the raw parquet (a third
implementation besides the Spark query and its DuckDB oracle)."""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _rows(sql):
    return duckdb.connect().execute(sql).fetchall()


def _one(spark, name):
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    fn, _ = REGISTRY[name]
    return fn(spark, SF).collect()[0]


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            r[order[k]] = avg
        i = j + 1
    return r


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    return (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(
        n * syy - sy * sy
    )


def test_spearman_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT FLOOR(l_quantity*100.0+0.5)::BIGINT,
                   FLOOR(l_extendedprice*100.0+0.5)::BIGINT,
                   FLOOR(l_discount*100.0+0.5)::BIGINT
            FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    xs, ys, zs = zip(*rows)
    rho = lambda a, b: _pearson(_avg_ranks(a), _avg_ranks(b))  # noqa: E731
    got = _one(spark, "spearman_corr")
    assert got.rho_qty_price == pytest.approx(rho(xs, ys), abs=2e-6)
    assert got.rho_qty_disc == pytest.approx(rho(xs, zs), abs=2e-6)
    assert got.rho_price_disc == pytest.approx(rho(ys, zs), abs=2e-6)


def _daily():
    return _rows(
        f"""SELECT CAST(ts AS DATE) AS day,
                   SUM(FLOOR(value*100.0+0.5)::BIGINT)::BIGINT AS x,
                   COUNT(*)::BIGINT AS c
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1 ORDER BY 1"""
    )


def test_kendall_tau_matches_pure_python(spark):
    d = _daily()
    nc = nd = n1 = n2 = 0
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            dx, dc = d[i][1] - d[j][1], d[i][2] - d[j][2]
            nc += dx * dc > 0
            nd += dx * dc < 0
            n1 += dx == 0
            n2 += dc == 0
    n0 = len(d) * (len(d) - 1) // 2
    got = _one(spark, "kendall_tau_daily")
    assert (got.n0, got.nc, got.nd, got.n1, got.n2) == (n0, nc, nd, n1, n2)
    assert got.tau_b == pytest.approx(
        (nc - nd) / math.sqrt(n0 - n1) / math.sqrt(n0 - n2), abs=2e-6
    )


def test_mann_kendall_matches_pure_python(spark):
    d = _daily()
    xs = [r[1] for r in d]
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    n = len(xs)
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie
    got = _one(spark, "mann_kendall")
    assert got.s_stat == s and got.var18 == var18
    num = s - 1 if s > 0 else s + 1 if s < 0 else 0
    assert got.z == pytest.approx(num / math.sqrt(var18 / 18.0), abs=2e-6)


def test_runs_test_matches_pure_python(spark):
    d = _daily()
    xs = [r[1] for r in d]
    srt = sorted(xs)
    n = len(xs)
    med2 = srt[(n + 1) // 2 - 1] + srt[(n + 2) // 2 - 1]
    signs = [1 if 2 * x > med2 else 0 for x in xs if 2 * x != med2]
    r = 1 + sum(signs[i] != signs[i - 1] for i in range(1, len(signs)))
    n1, n2 = sum(signs), len(signs) - sum(signs)
    got = _one(spark, "runs_test")
    assert (got.r, got.n1, got.n2) == (r, n1, n2)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (
        (n1 + n2) ** 2 * (n1 + n2 - 1)
    )
    assert got.z == pytest.approx((r - mu) / math.sqrt(var), abs=2e-6)


def test_ks_two_sample_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT lang, n_chars FROM read_parquet('{SF}/documents.parquet')
            WHERE lang IN ('en','zh')"""
    )
    a = sorted(v for lg, v in rows if lg == "en")
    b = sorted(v for lg, v in rows if lg == "zh")
    n, m = len(a), len(b)
    d_num = 0
    for v in sorted(set(a) | set(b)):
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        d_num = max(d_num, abs(fa * m - fb * n))
    got = _one(spark, "ks_two_sample")
    assert (got.n, got.m, got.d_num) == (n, m, d_num)
    dd = d_num / (n * m)
    assert got.d == pytest.approx(dd, abs=2e-6)
    assert got.p_approx == pytest.approx(
        2 * math.exp(-2 * dd * dd * n * m / (n + m)), abs=2e-6
    )


def test_cramers_v_matches_pure_python(spark):
    rows = _rows(
        f"SELECT lang, source, COUNT(*) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1, 2"
    )
    from collections import defaultdict

    o = {(g, s): c for g, s, c in rows}
    rm = defaultdict(int)
    cm = defaultdict(int)
    for (g, s), c in o.items():
        rm[g] += c
        cm[s] += c
    n = sum(o.values())
    chi2 = sum(
        (o.get((g, s), 0) * n - rm[g] * cm[s]) ** 2 / (n * rm[g] * cm[s])
        for g in sorted(rm)
        for s in sorted(cm)
    )
    got = _one(spark, "cramers_v")
    assert got.dof == (len(rm) - 1) * (len(cm) - 1)
    assert got.chi2 == pytest.approx(chi2, abs=2e-5)
    assert got.v == pytest.approx(
        math.sqrt(chi2 / (n * min(len(rm) - 1, len(cm) - 1))), abs=2e-6
    )


def test_ewma_control_matches_pure_python(spark):
    d = _daily()
    xs = [float(r[1]) for r in d]
    es = [xs[0]]
    for x in xs[1:]:
        es.append(es[-1] + 0.25 * (x - es[-1]))
    n = len(xs)
    s, ss = sum(int(x) for x in xs), sum(int(x) * int(x) for x in xs)
    mu = s / n
    limit3 = round(3 * math.sqrt((n * ss - s * s) / n / (n - 1))
                   * math.sqrt(1 / 7), 6)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = sorted(REGISTRY["ewma_control"][0](spark, SF).collect(),
                 key=lambda r: r.day)
    assert len(got) == n
    for row, e, (day, x, _c) in zip(got, es, d):
        assert row.day == day.strftime("%Y-%m-%d")
        assert row.x == x
        assert row.ewma == round(e, 6)  # bit-identical fold, then round
        assert row.out_of_control == (round(abs(e - mu), 6) > limit3)
    # the chart must actually flag something on a planted shift: the
    # law, not the fixture — a +10 sigma constant shift mid-series
    # pushes the ewma out of the 3-sigma-sqrt(lambda/(2-lambda)) band
    sigma = math.sqrt((n * ss - s * s) / n / (n - 1))
    planted = xs[: n // 2] + [x + 10 * sigma for x in xs[n // 2:]]
    pe = [planted[0]]
    for x in planted[1:]:
        pe.append(pe[-1] + 0.25 * (x - pe[-1]))
    pmu = sum(planted) / n
    assert any(abs(e - pmu) > limit3 for e in pe)


def test_shuffle_skew_report_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT l_partkey, COUNT(*)::BIGINT FROM
            read_parquet('{SF}/lineitem.parquet') GROUP BY 1"""
    )
    cnts = sorted(c for _k, c in rows)
    k, n = len(cnts), sum(cnts)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["shuffle_skew_report"][0](spark, SF).collect()[0]
    assert (got.n_keys, got.n_rows, got.max_cnt) == (k, n, cnts[-1])
    def pct(perm):
        rank = (k * perm + 999) // 1000
        return cnts[rank - 1]
    assert (got.p50_cnt, got.p99_cnt) == (pct(500), pct(990))
    gnum = sum((2 * (i + 1) - k - 1) * c for i, c in enumerate(cnts))
    assert got.gini == pytest.approx(gnum / (k * n), abs=2e-6)
    assert got.top1_share == pytest.approx(cnts[-1] / n, abs=2e-6)


def test_compaction_plan_is_ffd_and_feasible(spark):
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["compaction_plan"][0](spark, SF).collect()
    cap = got[0].capacity
    loads = {}
    for r in got:
        loads[r.bin_id] = loads.get(r.bin_id, 0) + r.size_bytes
    # feasible: no bin exceeds capacity; bins numbered 1..B densely
    assert all(v <= cap for v in loads.values())
    assert sorted(loads) == list(range(1, len(loads) + 1))
    # FFD law: replay first-fit over (size DESC, source ASC) and compare
    items = sorted(got, key=lambda r: (-r.size_bytes, r.source))
    bins, want = [], {}
    for r in items:
        for j in range(len(bins)):
            if bins[j] + r.size_bytes <= cap:
                bins[j] += r.size_bytes
                want[r.source] = j + 1
                break
        else:
            bins.append(r.size_bytes)
            want[r.source] = len(bins)
    assert {r.source: r.bin_id for r in got} == want


def test_isotonic_calibration_laws(spark):
    """The fitted curve must (a) be non-decreasing, (b) equal the PAV
    solution computed by an independent pool-adjacent-violators fold,
    (c) preserve the weighted mean (a PAV invariant)."""
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = sorted(
        REGISTRY["isotonic_calibration"][0](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    iso = [r.isotonic_rate for r in got]
    assert iso == sorted(iso)
    # independent PAV
    pools = [[r.pos, r.cnt] for r in got]
    merged = []
    for p in pools:
        merged.append(p)
        while len(merged) > 1 and (
            merged[-2][0] * merged[-1][1] >= merged[-1][0] * merged[-2][1]
        ):
            b = merged.pop()
            merged[-1][0] += b[0]
            merged[-1][1] += b[1]
    # expand pools back to buckets
    expanded = []
    idx = 0
    for pos, cnt in merged:
        # pool spans buckets until its cnt is consumed
        acc = 0
        while acc < cnt:
            acc += got[idx].cnt
            expanded.append(pos / cnt)
            idx += 1
    assert len(expanded) == len(iso)
    for a, b in zip(iso, expanded):
        assert a == pytest.approx(b, abs=2e-6)
    # weighted mean preserved
    n = sum(r.cnt for r in got)
    assert sum(e * r.cnt for e, r in zip(expanded, got)) / n == pytest.approx(
        sum(r.pos for r in got) / n, abs=1e-12
    )


def test_dp_noise_is_exact_inverse_cdf(spark):
    """The geometric-mechanism noise must equal the exact discrete-
    Laplace inverse CDF of the md5 coin (independent recomputation in
    floats-free integer space), and its distribution law must hold: the
    thresholds are the exact CDF scaled to 2^32."""
    import hashlib
    import math

    from fusionspark.queries import REGISTRY, load_all
    from fusionspark.queries.pipeline_queries import _DL_K, _DL_T

    # thresholds ARE the CDF
    a = math.exp(-1.0)
    cum = 0.0
    for (k, t) in _DL_T:
        cum += (1 - a) / (1 + a) * a ** abs(k)
        assert t == min(math.ceil(cum * 2**32), 2**32)
    load_all()
    rows = REGISTRY["dp_counts"][0](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        h = int(hashlib.md5(f"dp:{r.source}".encode()).hexdigest()[:8], 16)
        want = next((k for k, t in _DL_T if h < t), _DL_K)
        assert r.noise == want
        assert r.n_noisy == r.n + want
    # sensitivity-1 sanity: noise bounded by the truncation
    assert all(abs(r.noise) <= _DL_K for r in rows)


def test_weighted_sample_grouped_invariants(spark):
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["weighted_sample_grouped"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "zh", "es", "de", "fr"}
    for lang, rs in by_lang.items():
        assert len(rs) == 40
        keys = sorted(((r.sample_key, r.doc_id) for r in rs),
                      key=lambda t: (-t[0], t[1]))
        assert len({r.doc_id for r in rs}) == 40
        assert keys[0][0] >= keys[-1][0]


def test_kn_perplexity_matches_pure_python(spark):
    """Independent KN recomputation on a tiny planted corpus: the
    'francisco effect' must hold — a word seen often in ONE context gets
    less backoff mass than a word seen in many contexts."""
    from collections import Counter, defaultdict

    from fusionspark.operators.textstats import kn_perplexity_scores

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the cat"),
        (3, "a cat and a dog and a bird"),
        (4, "san francisco san francisco san francisco"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in kn_perplexity_scores(df).collect()}

    bg = Counter()
    for _i, t in docs:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    ctx = defaultdict(int)
    n1fw = defaultdict(int)
    n1bw = defaultdict(int)
    for (a, b), c in bg.items():
        ctx[a] += c
        n1fw[a] += 1
        n1bw[b] += 1
    n1tot = len(bg)
    D = 0.75

    def p(a, b):
        return (max(bg[(a, b)] - D, 0) + D * n1fw[a] * n1bw[b] / n1tot) / ctx[a]

    for did, t in docs:
        ws = t.split()
        lps = [math.log(p(a, b)) for a, b in zip(ws, ws[1:])]
        acc = 0.0
        for x in lps:
            acc += x
        assert got[did].n_bigrams == len(lps)
        assert got[did].avg_logprob == round(acc / len(lps), 6)
        assert got[did].kn_perplexity == pytest.approx(
            math.exp(-acc / len(lps)), abs=2e-6
        )
    # francisco effect: P_cont(francisco) < P_cont(cat) despite equal-ish
    # raw frequency — francisco follows only 'san'
    assert n1bw["francisco"] == 1 and n1bw["cat"] > 1
    # distributions per context sum to 1 (KN is a proper distribution
    # over the seen vocabulary when every follower type is counted)
    vocab = {w for (a, b) in bg for w in (a, b)}
    for a in ctx:
        tot = sum(p(a, b) for b in vocab)
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_luhn_check_against_textbook_implementation(spark):
    """Every planted number must be 16 digits and its validity must match
    a textbook right-to-left Luhn implementation (independent of the
    query's left-indexed fold); even docs valid, odd invalid."""
    from fusionspark.queries import REGISTRY, load_all

    def luhn_ok(num):
        tot = 0
        for i, ch in enumerate(reversed(num)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - 9 if d * 2 > 9 else d * 2
            tot += d
        return tot % 10 == 0

    load_all()
    rows = REGISTRY["luhn_check"][0](spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert len(r.number) == 16 and r.number.isdigit()
        assert r.luhn_valid == luhn_ok(r.number)
        assert r.luhn_valid == (r.doc_id % 2 == 0)


def test_feature_mi_matches_pure_python(spark):
    """Independent MI recomputation from the raw parquet, plus the
    planted-signal law: a word that appears ONLY in positive docs must
    out-score a uniformly-spread word of the same frequency."""
    rows = _rows(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    pos_sources = {"src0", "src1", "src2", "src3", "src4"}
    from collections import defaultdict

    n = len(rows)
    n_pos = sum(1 for _d, s, _t in rows if s in pos_sources)
    cnt = defaultdict(lambda: [0, 0])
    for _d, s, t in rows:
        cls = 1 if s in pos_sources else 0
        for w in set(x for x in t.lower().split(" ") if x):
            cnt[w][cls] += 1

    def mi(n11, n10):
        n01, n00 = n_pos - n11, (n - n_pos) - n10
        tot = 0.0
        for nij, mw, mc in (
            (n11, n11 + n10, n_pos), (n10, n11 + n10, n - n_pos),
            (n01, n01 + n00, n_pos), (n00, n01 + n00, n - n_pos),
        ):
            if nij > 0:
                tot += (nij / n) * math.log(nij * n / (mw * mc))
        return tot

    scored = sorted(
        ((round(mi(c[1], c[0]), 6), w) for w, c in cnt.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["feature_mi"][0](spark, SF).collect()
    assert [(r.mi, r.word) for r in got] == scored
    # law: perfectly class-pure presence beats class-uniform presence
    assert mi(40, 0) > mi(20, 20)


def test_burrows_delta_separates_planted_styles(spark):
    """Law check on a planted corpus: two sources sharing a function-word
    profile must be closer under Delta than either is to a third source
    with a different profile — and Delta must be symmetric-complete
    (one row per unordered pair)."""
    import itertools

    from fusionspark.io import load_table  # noqa: F401 (parity of imports)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["burrows_delta"][0](spark, SF).collect()
    srcs = sorted({r.src_a for r in rows} | {r.src_b for r in rows})
    assert len(rows) == len(list(itertools.combinations(srcs, 2)))
    pairs = {(r.src_a, r.src_b) for r in rows}
    assert all(a < b for a, b in pairs)
    assert all(r.delta >= 0 for r in rows)

    # planted: s1/s2 share a function-word profile, s3 differs
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    docs = []
    for i in range(30):
        if i % 3 < 2:
            text = f"the cat and the dog with the hat word{i}"
        else:
            text = f"le chat et le chien avec le chapeau word{i}"
        docs.append((i, "s1" if i % 3 == 0 else "s2" if i % 3 == 1 else "s3",
                     text, len(text)))
    spark.createDataFrame(
        docs, "doc_id long, source string, text string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    got = {(r.src_a, r.src_b): r.delta
           for r in REGISTRY["burrows_delta"][0](spark, tmp).collect()}
    assert got[("s1", "s2")] < got[("s1", "s3")]
    assert got[("s1", "s2")] < got[("s2", "s3")]


def test_matrix_profile_matches_pure_python(spark):
    d = _daily()
    xs = [r[1] for r in d]
    m, excl = 5, 3
    n_w = len(xs) - m + 1

    def dist(i, j):
        a, b = xs[i:i + m], xs[j:j + m]
        s1a, s1b = sum(a), sum(b)
        s2a, s2b = sum(v * v for v in a), sum(v * v for v in b)
        sxy = sum(p * q for p, q in zip(a, b))
        rho = (m * sxy - s1a * s1b) / math.sqrt(m * s2a - s1a * s1a) \
            / math.sqrt(m * s2b - s1b * s1b)
        return round(math.sqrt(max(2.0 * m * (1.0 - rho), 0.0)), 6)

    want = {}
    for i in range(n_w):
        cands = sorted(
            (dist(i, j), j + 1) for j in range(n_w) if abs(i - j) >= excl
        )
        want[i + 1] = cands[0]
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["matrix_profile_daily"][0](spark, SF).collect()
    assert len(got) == n_w
    for r in got:
        assert (r.mp, r.motif_pos) == want[r.pos], r.pos
    # discord law: the max-mp window is the series' most novel week
    assert max(r.mp for r in got) >= min(r.mp for r in got)


def test_ar2_fit_matches_pure_python(spark):
    d = _daily()
    xs = [r[1] for r in d]
    n, s = len(xs), sum(xs)
    dev = [n * x - s for x in xs]
    c0 = sum(v * v for v in dev)
    c1 = sum(a * b for a, b in zip(dev, dev[1:]))
    c2 = sum(a * b for a, b in zip(dev, dev[2:]))
    r1, r2 = c1 / c0, c2 / c0
    got = _one(spark, "ar2_fit")
    assert got.r1 == pytest.approx(r1, abs=2e-6)
    assert got.r2 == pytest.approx(r2, abs=2e-6)
    assert got.phi1 == pytest.approx(r1 * (1 - r2) / (1 - r1 * r1), abs=2e-6)
    assert got.phi2 == pytest.approx((r2 - r1 * r1) / (1 - r1 * r1), abs=2e-6)
    # stationarity sanity for the fitted model on real data
    assert abs(got.phi2) < 1 and abs(got.phi1) < 2


def test_welch_bh_matches_pure_python(spark):
    rows = _rows(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    )
    from collections import defaultdict

    g = defaultdict(list)
    for s, v in rows:
        g[s].append(v)
    N = len(rows)
    S = sum(v for _s, v in rows)
    SS = sum(v * v for _s, v in rows)
    m = len(g)

    def phi2(t):
        return 2.0 / (1.0 + math.exp(0.07056 * t**3 + 1.5976 * t))

    ps = {}
    for s, vs in g.items():
        n1, s1, ss1 = len(vs), sum(vs), sum(v * v for v in vs)
        n2, s2, ss2 = N - n1, S - s1, SS - ss1
        v1 = (n1 * ss1 - s1 * s1) / n1 / (n1 - 1)
        v2 = (n2 * ss2 - s2 * s2) / n2 / (n2 - 1)
        t = (s1 / n1 - s2 / n2) / math.sqrt(v1 / n1 + v2 / n2)
        ps[s] = round(phi2(abs(round(t, 6))), 6)
    order = sorted(ps.items(), key=lambda kv: (kv[1], kv[0]))
    kk = max((i + 1 for i, (_s, p) in enumerate(order)
              if p * m * 10 <= i + 1), default=0)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["welch_bh"][0](spark, SF).collect()
    assert len(got) == m
    for r in got:
        assert r.p_approx == ps[r.source]
        assert r.rejected == (r.rnk <= kk)
    # BH is a step-up: the rejected set is a prefix of the p-ordering
    rej = sorted(r.rnk for r in got if r.rejected)
    assert rej == list(range(1, len(rej) + 1))


def test_poisson_rate_test_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
            FROM read_parquet('{SF}/events.parquet')"""
    )
    n1, n2 = rows[0]
    z = (n1 - n2) / math.sqrt(n1 + n2)
    got = _one(spark, "poisson_rate_test")
    assert (got.n1, got.n2) == (n1, n2)
    assert got.z == pytest.approx(z, abs=2e-6)
    assert got.p_approx == pytest.approx(
        2.0 / (1.0 + math.exp(0.07056 * abs(z) ** 3 + 1.5976 * abs(z))),
        abs=2e-6,
    )


def test_cuped_reduces_variance_law(spark):
    """CUPED's point: on a synthetic experiment where the pre-period
    covariate explains most outcome variance and the true effect is
    planted, the adjusted effect must sit closer to truth than the raw
    difference when randomization is unlucky.  Checked via the exact
    identity: cuped_effect = raw_effect - theta*(mean_x_t - mean_x_c)."""
    rows = _rows(
        f"""SELECT user_id,
                   SUM(CASE WHEN CAST(ts AS DATE) - (SELECT CAST(MIN(ts) AS DATE)
                             FROM read_parquet('{SF}/events.parquet'))
                            < 15 THEN FLOOR(value*100.0+0.5)::BIGINT ELSE 0 END),
                   SUM(CASE WHEN CAST(ts AS DATE) - (SELECT CAST(MIN(ts) AS DATE)
                             FROM read_parquet('{SF}/events.parquet'))
                            >= 15 THEN FLOOR(value*100.0+0.5)::BIGINT ELSE 0 END)
            FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"""
    )
    import hashlib

    xs = {u: x for u, x, _y in rows}
    treated = {
        u: int(hashlib.md5(f"cuped:{u}".encode()).hexdigest()[:8], 16) % 2 == 0
        for u, _x, _y in rows
    }
    got = _one(spark, "cuped_adjustment")
    t_x = [xs[u] for u in xs if treated[u]]
    c_x = [xs[u] for u in xs if not treated[u]]
    gap_x = (sum(t_x) / len(t_x) - sum(c_x) / len(c_x)) / 100.0
    # identity: adjusted = raw - theta * pre-period imbalance
    assert got.cuped_effect == pytest.approx(
        got.raw_effect - got.theta * gap_x, abs=5e-5
    )
    assert got.n_treated == len(t_x) and got.n_control == len(c_x)


def test_simpson_diversity_matches_pure_python(spark):
    rows = _rows(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)
    for s, t in rows:
        cnt[s].update(w for w in t.lower().split(" ") if w)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = {r.source: r for r in
           REGISTRY["simpson_diversity"][0](spark, SF).collect()}
    for s, c in cnt.items():
        n = sum(c.values())
        lam = sum(v * (v - 1) for v in c.values()) / (n * (n - 1))
        assert got[s].n == n and got[s].n_types == len(c)
        assert got[s].simpson_lambda == pytest.approx(lam, abs=2e-6)
        assert got[s].inv_simpson == pytest.approx(1 / lam, abs=2e-4)


def test_sprt_monitor_matches_pure_python(spark):
    d = _rows(
        f"""SELECT CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN event_type IN ('purchase','click') THEN 1 ELSE 0 END)
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1"""
    )
    cx = cnx = 0
    want = {}
    hi, lo = round(math.log(19.0), 6), round(math.log(1 / 19.0), 6)
    for day, x, n in d:
        cx += x
        cnx += n - x
        llr = round(cx * math.log(1.125) + cnx * math.log(0.875), 6)
        dec = ("accept_h1" if llr >= hi else
               "accept_h0" if llr <= lo else "continue")
        want[day.strftime("%Y-%m-%d")] = (cx, cnx, llr, dec)
    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = REGISTRY["sprt_monitor"][0](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r.conversions, r.non_conversions, r.llr, r.decision) \
            == want[r.day]
    # the monitor is a cumulative walk: llr path, once a boundary is hit,
    # stays interpretable — and with purchases ~ half of purchase+click
    # traffic at p0=1/2 vs p1=9/16 the path must trend NEGATIVE (h0-ward)
    last = sorted(got, key=lambda r: r.day)[-1]
    assert last.llr < 0


def test_hill_tail_index_matches_pure_python(spark):
    vals = sorted(
        (v for (v,) in _rows(
            f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet')")),
        reverse=True,
    )
    xk = vals[99]
    s = 0.0
    for x in vals[:99]:
        s += math.log(x / xk)
    got = _one(spark, "hill_tail_index")
    assert (got.k, got.x_k) == (100, xk)
    assert got.alpha_inv == pytest.approx(s / 99, abs=2e-6)
    assert got.alpha == pytest.approx(99 / s, abs=2e-6)


def test_mad_by_type_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT event_type, FLOOR(value*100.0+0.5)::BIGINT
            FROM read_parquet('{SF}/events.parquet')"""
    )
    from collections import defaultdict

    g = defaultdict(list)
    for t, x in rows:
        g[t].append(x)

    def med2(vs):
        s = sorted(vs)
        n = len(s)
        return s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]

    from fusionspark.queries import REGISTRY, load_all

    load_all()
    got = {r.event_type: r for r in
           REGISTRY["mad_by_type"][0](spark, SF).collect()}
    assert set(got) == set(g)
    for t, vs in g.items():
        m2 = med2(vs)
        mad4 = med2([abs(2 * x - m2) for x in vs])
        assert got[t].median_value == round(m2 / 2 / 100, 6)
        assert got[t].mad_value == round(mad4 / 4 / 100, 6)
        assert got[t].sigma_robust == pytest.approx(
            mad4 / 4 / 100 * 1.4826, abs=2e-6
        )


def test_theil_index_matches_pure_python(spark):
    rows = _rows(
        f"""SELECT user_id, SUM(CASE WHEN event_type='purchase'
                   THEN floor(value*1e6)::BIGINT ELSE 0 END)
            FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"""
    )
    xs = sorted((u, x) for u, x in rows if x > 0)
    n, s = len(xs), sum(x for _u, x in xs)
    t = 0.0
    for _u, x in xs:
        r = x * n / s
        t += r * math.log(r)
    got = _one(spark, "theil_index")
    assert got.n_users == n
    assert got.theil_t == pytest.approx(t / n, abs=2e-6)
    assert got.atkinson1 == pytest.approx(1 - math.exp(-t / n), abs=2e-6)
    # law: Theil of a constant distribution is 0; of any real one, > 0
    assert got.theil_t > 0
