"""Round-12 operator tests: ROUGE-L LCS, MOSS winnowing fingerprints,
Cochran's Q, Kendall's W, Page's trend test, Simpson's-paradox audit,
KMV sketch intersection — each checked against an INDEPENDENT pure-Python
recomputation from the raw parquet (the third-implementation discipline),
plus the behavioral laws the implementations lean on (LCS 3-way-max ==
branch-on-eq, winnowing's shared-run guarantee, Cochran constant-row
invariance, W = 1 under perfect agreement, Page L maximal on monotone
tables, a planted Simpson reversal, KMV exactness below k)."""

from __future__ import annotations

import collections
import hashlib
import math
import random

import pyarrow.parquet as pq

from fusionspark.queries.analytics_queries import (
    cochran_q,
    kendall_w,
    kmv_intersect,
    page_trend,
    simpsons_paradox,
)
from fusionspark.queries.pipeline_queries import (
    rouge_l_eval,
    winnowing_fingerprints,
)


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _r6(x: float) -> float:
    """6-decimal HALF-AWAY rounding — python's round() is half-even and
    diverges from Spark F.round / DuckDB ROUND at exactly-representable
    halfway ratios (e.g. 1/128 = 0.0078125 -> 0.007813 in both engines,
    0.007812 from round()); the test_round12_ops._round_away discipline."""
    s = x * 1e6
    return (math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)) / 1e6


def _words(text: str) -> list[str]:
    return [w for w in text.lower().split(" ") if w]


# ---------------------------------------------------------------------------
# rouge_l_eval
# ---------------------------------------------------------------------------


def _lcs(xs, ys) -> int:
    """Textbook branch-on-eq LCS."""
    prev = [0] * (len(ys) + 1)
    for x in xs:
        cur = [0]
        for j, y in enumerate(ys, start=1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def test_rouge_l_python_replay(spark, sf_dir):
    got = {r["doc_id"]: r for r in rouge_l_eval(spark, sf_dir).collect()}
    rows = [r for r in _docs(sf_dir) if len(_words(r["text"])) >= 40]
    assert sorted(got) == sorted(r["doc_id"] for r in rows)
    for r in rows[:60]:
        ws = _words(r["text"])
        cand, ref = ws[:25], ws[25:85]
        lcs = _lcs(cand, ref)
        g = got[r["doc_id"]]
        assert (g["n_cand"], g["n_ref"], g["lcs_len"]) == (
            len(cand), len(ref), lcs,
        )
        assert math.isclose(
            g["rouge_l_f"], _r6(2.0 * lcs / (len(cand) + len(ref))),
            abs_tol=1e-9,
        )


def test_lcs_three_way_max_equals_branch_form():
    """The query's max(prev[j-1]+eq, prev[j], new[j-1]) recurrence equals
    the textbook branch-on-eq LCS on random sequences (the adjacent-cell
    |diff| <= 1 property makes the unconditional 3-way max safe)."""
    rng = random.Random(7)
    for _ in range(200):
        xs = [rng.randrange(4) for _ in range(rng.randrange(12))]
        ys = [rng.randrange(4) for _ in range(rng.randrange(12))]
        prev = [0] * (len(ys) + 1)
        for x in xs:
            cur = [0]
            for j, y in enumerate(ys, start=1):
                cur.append(
                    max(prev[j - 1] + (1 if x == y else 0), prev[j], cur[j - 1])
                )
            prev = cur
        assert prev[-1] == _lcs(xs, ys)


def test_rouge_l_identity_and_order_sensitivity():
    """LCS of a sequence with itself is its length; reversing loses order
    credit that clipped unigram overlap (rouge1) cannot see."""
    xs = list("abcdefgh")
    assert _lcs(xs, xs) == 8
    assert _lcs(xs, xs[::-1]) == 1  # distinct symbols: only 1 in-order char
    # clipped unigram overlap is 8 either way — ROUGE-L separates them.


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------

_K, _W = 3, 4


def _fingerprints(ws: list[str]) -> set[int]:
    hs = [
        _md5_32("wf:" + " ".join(ws[i:i + _K]))
        for i in range(len(ws) - _K + 1)
    ]
    return {
        min(hs[i:i + _W]) for i in range(len(hs) - _W + 1)
    }


def test_winnowing_python_replay(spark, sf_dir):
    rows = [r for r in _docs(sf_dir) if len(_words(r["text"])) >= _K + _W]
    fps = {r["doc_id"]: _fingerprints(_words(r["text"])) for r in rows}
    df = collections.Counter()
    for s in fps.values():
        for f in s:
            df[f] += 1
    rare = {f for f, c in df.items() if c <= 50}
    pair = collections.Counter()
    by_fp = collections.defaultdict(list)
    for d, s in fps.items():
        for f in s:
            if f in rare:
                by_fp[f].append(d)
    for f, ds in by_fp.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair[(ds[i], ds[j])] += 1
    expect = sorted(
        ((c, a, b) for (a, b), c in pair.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = winnowing_fingerprints(spark, sf_dir).collect()
    assert [(r["shared"], r["a_id"], r["b_id"]) for r in got] == [
        (c, a, b) for c, a, b in expect
    ]
    for r in got:
        assert r["nfp_a"] == len(fps[r["a_id"]])
        assert r["nfp_b"] == len(fps[r["b_id"]])
        assert math.isclose(
            r["containment"],
            _r6(r["shared"] / min(r["nfp_a"], r["nfp_b"])),
            abs_tol=1e-9,
        )


def test_winnowing_shared_run_guarantee():
    """Schleimer et al. Theorem: two docs sharing a run of >= k+w-1 words
    share at least one fingerprint — for ANY surrounding context."""
    rng = random.Random(11)
    shared_run = [f"run{i}" for i in range(_K + _W - 1 + 3)]
    for trial in range(50):
        pre_a = [f"a{rng.randrange(1000)}" for _ in range(rng.randrange(20))]
        post_a = [f"a{rng.randrange(1000)}" for _ in range(rng.randrange(20))]
        pre_b = [f"b{rng.randrange(1000)}" for _ in range(rng.randrange(20))]
        post_b = [f"b{rng.randrange(1000)}" for _ in range(rng.randrange(20))]
        fa = _fingerprints(pre_a + shared_run + post_a)
        fb = _fingerprints(pre_b + shared_run + post_b)
        assert fa & fb, f"trial {trial}: guarantee violated"


def test_winnowing_density():
    """Fingerprint count per doc is ~2/(w+1) of the k-gram count — the
    paper's expected density — and never exceeds the window count."""
    rng = random.Random(13)
    ws = [f"w{rng.randrange(10_000)}" for _ in range(500)]
    n_kgrams = len(ws) - _K + 1
    n_windows = n_kgrams - _W + 1
    nf = len(_fingerprints(ws))
    assert nf <= n_windows
    assert 0.5 * 2 / (_W + 1) <= nf / n_kgrams <= 2.0 * 2 / (_W + 1)


# ---------------------------------------------------------------------------
# cochran_q
# ---------------------------------------------------------------------------


def _cochran(table: list[tuple[int, int, int]]):
    k = 3
    t = [sum(row[j] for row in table) for j in range(k)]
    num = (k - 1) * (k * sum(x * x for x in t) - sum(t) ** 2)
    den = sum(k * sum(row) - sum(row) ** 2 for row in table)
    return None if den == 0 else num / den


def test_cochran_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    d0 = min(r["ts"].date() for r in rows)
    users = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        users[r["user_id"]]  # ensure every user appears
        if r["event_type"] == "purchase":
            third = min((r["ts"].date() - d0).days // 10, 2)
            users[r["user_id"]][third] = 1
    table = list(users.values())
    q = _cochran(table)
    got = cochran_q(spark, sf_dir).collect()[0]
    t = [sum(row[j] for row in table) for j in range(3)]
    assert (got["n_users"], got["t1"], got["t2"], got["t3"]) == (
        len(table), t[0], t[1], t[2],
    )
    if q is None:
        assert got["q_stat"] is None
    else:
        assert math.isclose(got["q_stat"], _r6(q), abs_tol=1e-9)


def test_cochran_constant_rows_cancel():
    """Adding all-0 or all-1 users leaves Q unchanged — the invariance the
    query relies on to skip row filtering."""
    rng = random.Random(3)
    base = [
        tuple(rng.randrange(2) for _ in range(3)) for _ in range(40)
    ]
    q0 = _cochran(base)
    padded = base + [(0, 0, 0)] * 17 + [(1, 1, 1)] * 9
    assert math.isclose(_cochran(padded), q0, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# kendall_w
# ---------------------------------------------------------------------------


def _avg_ranks(xs):
    """Average ranks (ascending) with ties, as exact fractions x2."""
    out = []
    for x in xs:
        less = sum(1 for y in xs if y < x)
        eq = sum(1 for y in xs if y == x)
        out.append(2 * less + eq + 1)  # doubled average rank
    return out


def test_kendall_w_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["ts"].date(), r["event_type"]) for r in rows)
    n, k = len(days), len(types)
    rsum = dict.fromkeys(types, 0)
    tt = 0
    for d in days:
        xs = [cnt[(d, g)] for g in types]
        for g, dr in zip(types, _avg_ranks(xs)):
            rsum[g] += dr
        for _, t in collections.Counter(xs).items():
            tt += t * t * t - t
    sr2 = sum(v * v for v in rsum.values())
    w = (3 * sr2 - 3 * k * n * n * (k + 1) ** 2) / (
        n * n * k * (k * k - 1) - n * tt
    )
    got = kendall_w(spark, sf_dir).collect()[0]
    assert (got["n_blocks"], got["k_objects"]) == (n, k)
    assert (got["sum_dr2"], got["ties_term"]) == (sr2, tt)
    assert math.isclose(got["w"], _r6(w), abs_tol=1e-9)


def test_kendall_w_perfect_agreement_is_one():
    """Identical untied rankings on every block give W == 1 exactly."""
    n, k = 10, 5
    # doubled ranks of untied ranking 1..k are 2,4,..,2k
    rsum = [n * 2 * (j + 1) for j in range(k)]
    sr2 = sum(v * v for v in rsum)
    w = (3 * sr2 - 3 * k * n * n * (k + 1) ** 2) / (n * n * k * (k * k - 1))
    assert w == 1.0


def test_kendall_w_is_friedman_effect_size(spark, sf_dir):
    """W == chi2_F / (n (k-1)) when no ties correction applies; with the
    shared doubled-rank machinery the two queries must agree through the
    tie-free part of the identity: chi2_F recomputed from W's integers."""
    got = kendall_w(spark, sf_dir).collect()[0]
    n, k = got["n_blocks"], got["k_objects"]
    sr2 = got["sum_dr2"]
    chi2_f = 3.0 * sr2 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    w_untied = chi2_f / (n * (k - 1))
    # with ties, W >= the untied form (denominator shrinks)
    assert got["w"] >= round(w_untied, 6) - 1e-9


# ---------------------------------------------------------------------------
# page_trend
# ---------------------------------------------------------------------------


def test_page_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["ts"].date(), r["event_type"]) for r in rows)
    n, k = len(days), len(types)
    rsum = dict.fromkeys(types, 0)
    for d in days:
        xs = [cnt[(d, g)] for g in types]
        for g, dr in zip(types, _avg_ranks(xs)):
            rsum[g] += dr
    l2 = sum((j + 1) * rsum[g] for j, g in enumerate(types))
    dev = 6 * l2 - 3 * n * k * (k + 1) ** 2
    chi2 = dev * dev / (n * k * k * (k * k - 1) * (k + 1))
    got = page_trend(spark, sf_dir).collect()[0]
    assert (got["n_blocks"], got["k_treatments"], got["l_doubled"]) == (
        n, k, l2,
    )
    assert got["l_stat"] == l2 / 2.0
    assert got["trend_direction"] == (dev > 0) - (dev < 0)
    assert math.isclose(got["chi2_l"], _r6(chi2), abs_tol=1e-9)


def test_page_l_maximal_on_monotone_table():
    """A table whose values strictly increase in the hypothesized order on
    every block maximizes L (= n * sum j*j with untied ranks) and fires
    direction +1."""
    n, k = 8, 5
    l_doubled = n * sum(j * 2 * j for j in range(1, k + 1))
    dev = 6 * l_doubled - 3 * n * k * (k + 1) ** 2
    assert dev > 0
    # any permuted (non-monotone) assignment scores strictly less
    ranks = list(range(1, k + 1))
    best = sum(j * r for j, r in zip(ranks, ranks))
    for perm in [(2, 1, 3, 4, 5), (5, 4, 3, 2, 1), (1, 3, 2, 5, 4)]:
        assert sum(j * r for j, r in zip(ranks, perm)) <= best
        if perm != tuple(ranks):
            assert sum(j * r for j, r in zip(ranks, perm)) < best


# ---------------------------------------------------------------------------
# simpsons_paradox
# ---------------------------------------------------------------------------


def test_simpson_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    cell = collections.Counter()
    conv = collections.Counter()
    for r in rows:
        dow = (r["ts"].weekday() + 1) % 7  # python Mon=0 -> Sun=0 convention
        g = r["user_id"] % 2
        cell[(dow, g)] += 1
        if r["event_type"] == "purchase":
            conv[(dow, g)] += 1
    tn0 = sum(v for (d, g), v in cell.items() if g == 0)
    ta0 = sum(v for (d, g), v in conv.items() if g == 0)
    tn1 = sum(v for (d, g), v in cell.items() if g == 1)
    ta1 = sum(v for (d, g), v in conv.items() if g == 1)
    da = (ta1 * tn0 > ta0 * tn1) - (ta1 * tn0 < ta0 * tn1)
    got = {r["dow"]: r for r in simpsons_paradox(spark, sf_dir).collect()}
    assert sorted(got) == sorted({d for d, _ in cell})
    for d, r in got.items():
        n0, a0 = cell[(d, 0)], conv[(d, 0)]
        n1, a1 = cell[(d, 1)], conv[(d, 1)]
        assert (r["n0"], r["a0"], r["n1"], r["a1"]) == (n0, a0, n1, a1)
        ds = (a1 * n0 > a0 * n1) - (a1 * n0 < a0 * n1)
        assert r["dir_stratum"] == ds
        assert r["dir_aggregate"] == da
        assert r["reversed"] == (ds * da < 0)


def test_simpson_planted_reversal_detected(spark, tmp_path):
    """The classic UC-Berkeley shape: grp1 wins in EVERY stratum yet loses
    in aggregate, because grp1 concentrates in the hard stratum — run the
    actual query on a planted events table and assert it flags every
    stratum reversed (ADVICE r12: the arithmetic-only form could not
    catch a regression in the query itself)."""
    import datetime

    import pyarrow as pa

    # stratum Sunday/dow=0 (easy): grp0 80/100, grp1 90/100 -> grp1 ahead
    # stratum Monday/dow=1 (hard): grp0 10/100, grp1 200/1000 -> grp1 ahead
    # aggregate: grp0 90/200 vs grp1 290/1100 -> grp1 BEHIND: the paradox
    strata = {
        datetime.datetime(2026, 1, 4, 12): ((100, 80), (100, 90)),  # Sun
        datetime.datetime(2026, 1, 5, 12): ((100, 10), (1000, 200)),  # Mon
    }
    tn0 = ta0 = tn1 = ta1 = 0
    ts, uid, etype = [], [], []
    for day, ((n0, a0), (n1, a1)) in strata.items():
        assert a1 * n0 > a0 * n1  # grp1 ahead within the stratum
        tn0, ta0, tn1, ta1 = tn0 + n0, ta0 + a0, tn1 + n1, ta1 + a1
        for g, n, a in ((0, n0, a0), (1, n1, a1)):
            for i in range(n):
                ts.append(day + datetime.timedelta(seconds=i))
                uid.append(2 * i + g)  # user_id % 2 == g
                etype.append("purchase" if i < a else "view")
    assert ta1 * tn0 < ta0 * tn1  # grp1 behind in aggregate
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array([0.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = {r["dow"]: r for r in simpsons_paradox(spark, str(tmp_path)).collect()}
    assert sorted(rows) == [0, 1]
    for dow, ((n0, a0), (n1, a1)) in zip((0, 1), strata.values()):
        r = rows[dow]
        assert (r["n0"], r["a0"], r["n1"], r["a1"]) == (n0, a0, n1, a1)
        assert r["dir_stratum"] == 1
        assert r["dir_aggregate"] == -1
        assert r["reversed"] is True


# ---------------------------------------------------------------------------
# kmv_intersect
# ---------------------------------------------------------------------------


def test_kmv_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    sets = collections.defaultdict(set)
    for r in rows:
        sets[r["event_type"]].add(r["user_id"])
    K = 64
    sk = {
        g: sorted({_md5_32(f"kmv:{u}") for u in us})[:K]
        for g, us in sets.items()
    }
    got = {
        (r["type_a"], r["type_b"]): r
        for r in kmv_intersect(spark, sf_dir).collect()
    }
    types = sorted(sets)
    for i, g1 in enumerate(types):
        for g2 in types[i + 1:]:
            a, b = set(sk[g1]), set(sk[g2])
            union_k = sorted(a | b)[:K]
            inter = sum(1 for h in union_k if h in a and h in b)
            ti = len(sets[g1] & sets[g2])
            tu = len(sets[g1] | sets[g2])
            r = got[(g1, g2)]
            assert (r["union_k"], r["kmv_inter"]) == (len(union_k), inter)
            assert math.isclose(
                r["est_jaccard"], _r6(inter / len(union_k)), abs_tol=1e-9
            )
            assert (r["true_inter"], r["true_union"]) == (ti, tu)
            assert math.isclose(r["true_jaccard"], _r6(ti / tu), abs_tol=1e-9)


def test_kmv_exact_below_k():
    """When |A u B| <= k the union sketch IS the union, so the estimate is
    exactly Jaccard — the small-set degenerate case the CASE-free
    min(k, |union|) denominator handles."""
    K = 64
    rng = random.Random(5)
    a = {rng.randrange(10_000) for _ in range(30)}
    b = {rng.randrange(10_000) for _ in range(30)}
    ha = sorted({_md5_32(f"kmv:{u}") for u in a})[:K]
    hb = sorted({_md5_32(f"kmv:{u}") for u in b})[:K]
    union_k = sorted(set(ha) | set(hb))[:K]
    inter = sum(1 for h in union_k if h in set(ha) and h in set(hb))
    assert len(union_k) == len(a | b)  # no md5 collision in this draw
    assert inter / len(union_k) == len(a & b) / len(a | b)


def test_kmv_estimator_envelope():
    """On sets far above k the estimate stays within a loose CLT envelope
    of the true Jaccard (sigma ~ sqrt(J(1-J)/k); allow 4 sigma)."""
    K = 64
    a = {f"a{i}" for i in range(3000)} | {f"s{i}" for i in range(1000)}
    b = {f"b{i}" for i in range(3000)} | {f"s{i}" for i in range(1000)}
    true_j = len(a & b) / len(a | b)
    ha = sorted({_md5_32(f"kmv:{u}") for u in a})[:K]
    hb = sorted({_md5_32(f"kmv:{u}") for u in b})[:K]
    union_k = sorted(set(ha) | set(hb))[:K]
    est = sum(1 for h in union_k if h in set(ha) and h in set(hb)) / len(union_k)
    sigma = math.sqrt(true_j * (1 - true_j) / K)
    assert abs(est - true_j) <= 4 * sigma
