"""Hypothesis property tests for the round-13 inference operators: laws
that must hold on ARBITRARY inputs, not just the gate corpus — the
doubled-U grid formula vs direct pair counting (Jonckheere), midrank
completeness (Wilcoxon), Cliff's delta antisymmetry/bounds, CvM
positive-definiteness, KPSS shift/scale invariance, permutation-entropy
time-reversal symmetry, Bowker symmetric-matrix zero, Mantel-Haenszel
collapsibility on identical strata, Theil-U bounds + independence zero,
and pass@k monotonicity."""

from __future__ import annotations

import collections
import itertools
import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ── pure-python reference forms (the engines' exact formulas) ─────────────


def _jt_j2_grid(groups: list[list[int]]) -> int:
    """The engines' grid form: J2 = sum_v sum_{i<j} cnt_j(v)*(2*cum_i(v)
    + cnt_i(v)) with cum_i = strictly-below cumulative."""
    vals = sorted({v for g in groups for v in g})
    cnt = [collections.Counter(g) for g in groups]
    cum = [0] * len(groups)
    j2 = 0
    for v in vals:
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                j2 += cnt[j][v] * (2 * cum[i] + cnt[i][v])
        for i in range(len(groups)):
            cum[i] += cnt[i][v]
    return j2


def _jt_j2_pairs(groups: list[list[int]]) -> int:
    """Direct definition: 2*#{x_a < x_b} + #{x_a == x_b} over a < b."""
    j2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for a in groups[i]:
                for b in groups[j]:
                    j2 += 2 * (a < b) + (a == b)
    return j2


def _w2(diffs: list[int], positive: bool) -> int:
    """Doubled midrank sum of |d| over the chosen sign class."""
    ads = sorted(abs(d) for d in diffs)
    total = 0
    for d in diffs:
        if (d > 0) == positive:
            below = sum(1 for a in ads if a < abs(d))
            cnt = sum(1 for a in ads if a == abs(d))
            total += 2 * below + cnt + 1
    return total


def _cliffs(xs: list[int], ys: list[int]) -> float:
    gt = sum(1 for a in xs for b in ys if a > b)
    lt = sum(1 for a in xs for b in ys if a < b)
    return (gt - lt) / (len(xs) * len(ys))


def _cvm(xs: list[int], ys: list[int]) -> float:
    n, m = len(xs), len(ys)
    cp, cv = collections.Counter(xs), collections.Counter(ys)
    fp = fv = s2 = 0
    for v in sorted(set(xs) | set(ys)):
        fp += cp[v]
        fv += cv[v]
        s2 += (cp[v] + cv[v]) * (m * fp - n * fv) ** 2
    return float(s2) / ((float(n) * m) * (float(n + m) * (n + m)))


def _kpss_ratio(xs: list[int]) -> tuple[int, int]:
    """(sum P^2, n * sum d^2) as exact ints — the eta ratio pieces."""
    n, s = len(xs), sum(xs)
    dev = [n * x - s for x in xs]
    p = sp2 = sd2 = 0
    for d in dev:
        p += d
        sp2 += p * p
        sd2 += d * d
    return sp2, n * sd2


def _perm_patterns(xs: list[int]) -> collections.Counter:
    def trit(hi, lo):
        return 2 if hi > lo else (1 if hi == lo else 0)

    return collections.Counter(
        trit(b, a) * 9 + trit(c, a) * 3 + trit(c, b)
        for a, b, c in zip(xs, xs[1:], xs[2:])
    )


def _entropy(counter: collections.Counter) -> float:
    nw = sum(counter.values())
    return math.log(nw) - sum(c * math.log(c) for c in counter.values()) / nw


def _pass5(n: int, c: int) -> float:
    prod = 1.0
    for i in range(5):
        prod *= 0.0 if n - c - i <= 0 else (n - c - i) / (n - i)
    return 1.0 - prod


# ── laws ──────────────────────────────────────────────────────────────────

_vals = st.lists(st.integers(0, 8), min_size=1, max_size=12)


@settings(max_examples=120, deadline=None)
@given(st.lists(_vals, min_size=2, max_size=4))
def test_jt_grid_equals_pair_definition(groups):
    """The cumulative-grid fold computes EXACTLY the doubled pairwise
    Mann-Whitney sum — the identity the oracle and Spark plan rely on."""
    assert _jt_j2_grid(groups) == _jt_j2_pairs(groups)
    # extremal: fully separated ordered groups reach the maximum 2*prod
    sep = [[10 * i + v for v in g] for i, g in enumerate(groups)]
    mx = 2 * sum(
        len(a) * len(b) for a, b in itertools.combinations(sep, 2)
    )
    assert _jt_j2_pairs(sep) == mx


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(-9, 9).filter(bool), min_size=1, max_size=15))
def test_wilcoxon_midranks_complete(diffs):
    """W2(positive) + W2(negative) == n(n+1): doubled midranks over all
    nonzero diffs always sum to twice the full rank total."""
    n = len(diffs)
    assert _w2(diffs, True) + _w2(diffs, False) == n * (n + 1)


@settings(max_examples=120, deadline=None)
@given(_vals, _vals)
def test_cliffs_delta_antisymmetric_bounded(xs, ys):
    d = _cliffs(xs, ys)
    assert -1.0 <= d <= 1.0
    assert d == -_cliffs(ys, xs)
    assert _cliffs(xs, xs) == 0.0


@settings(max_examples=120, deadline=None)
@given(_vals, _vals)
def test_cvm_positive_definite(xs, ys):
    """T >= 0, T == 0 iff the two samples are proportional multisets
    (equal ECDFs), and T is symmetric."""
    t = _cvm(xs, ys)
    assert t >= 0.0
    assert t == _cvm(ys, xs)
    same = _cvm(xs, xs)
    assert same == 0.0
    cx, cy = collections.Counter(xs), collections.Counter(ys)
    prop = all(
        cx[v] * len(ys) == cy[v] * len(xs) for v in set(xs) | set(ys)
    )
    assert (t == 0.0) == prop


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=2, max_size=12),
    st.integers(-20, 20),
    st.integers(1, 5),
)
def test_kpss_shift_and_scale_invariant(xs, shift, scale):
    """eta is invariant under x -> c*x + b (exact-integer pieces scale
    by c^2 in numerator AND denominator; shift cancels in deviations)."""
    a0, b0 = _kpss_ratio(xs)
    a1, b1 = _kpss_ratio([scale * x + shift for x in xs])
    # exact rational equality: a0/b0 == a1/b1
    assert a0 * b1 == a1 * b0


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=3, max_size=20))
def test_permutation_entropy_reversal_symmetric(xs):
    """Time reversal permutes the 27 pattern classes bijectively, so the
    pattern HISTOGRAM (as a multiset of counts) and the entropy are
    reversal-invariant."""
    p1 = _perm_patterns(xs)
    p2 = _perm_patterns(list(reversed(xs)))
    assert sorted(p1.values()) == sorted(p2.values())
    assert abs(_entropy(p1) - _entropy(p2)) < 1e-12


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=20))
def test_bowker_zero_iff_symmetric(trans):
    """chi2 == 0 iff every unordered pair has c_ij == c_ji."""
    c = collections.Counter(trans)
    chi2 = 0.0
    for i in range(10):
        for j in range(i + 1, 10):
            cij, cji = c[(i, j)], c[(j, i)]
            if cij + cji:
                chi2 += (cij - cji) ** 2 / (cij + cji)
    sym = all(
        c[(i, j)] == c[(j, i)] for i in range(10) for j in range(i + 1, 10)
    )
    assert (chi2 == 0.0) == sym


@settings(max_examples=80, deadline=None)
@given(
    st.integers(1, 50), st.integers(0, 50), st.integers(1, 50),
    st.integers(0, 50), st.integers(1, 6),
)
def test_mh_collapsible_on_identical_strata(a, b, c, d, k):
    """k identical 2x2 strata: OR_MH == the single-stratum odds ratio
    (the collapsibility case where adjustment must change nothing)."""
    a, c = a, c
    if b == 0 or c == 0:  # OR undefined in the single table
        b += 1
    n = a + b + c + d
    sad = k * (a * d) / n
    sbc = k * (b * c) / n
    assert abs(sad / sbc - (a * d) / (b * c)) < 1e-12


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(1, 9), min_size=2, max_size=4),
    st.lists(st.integers(1, 9), min_size=2, max_size=4),
)
def test_theil_u_zero_under_independence(rws, cls):
    """Exact product counts c_ij = r_i * k_j give H(Y|X) == H(Y): U == 0
    up to float noise; and U is within [0, 1] on these grids."""
    n = sum(rws) * sum(cls)
    cells = {(i, j): rws[i] * cls[j] for i in range(len(rws))
             for j in range(len(cls))}
    sk = sum(
        (sum(cells[(i, j)] for i in range(len(rws))))
        * math.log(sum(cells[(i, j)] for i in range(len(rws))))
        for j in range(len(cls))
    )
    sr = sum(
        (sum(cells[(i, j)] for j in range(len(cls))))
        * math.log(sum(cells[(i, j)] for j in range(len(cls))))
        for i in range(len(rws))
    )
    sc = sum(v * math.log(v) for v in cells.values())
    hy = math.log(n) - sk / n
    hyx = (sr - sc) / n
    assert abs(hy - hyx) < 1e-9  # independence: knowing X removes nothing
    if hy > 0:
        assert -1e-9 <= (hy - hyx) / hy <= 1.0


@settings(max_examples=120, deadline=None)
@given(st.integers(5, 60))
def test_pass_at_k_monotone_in_successes(n):
    """pass@5 is nondecreasing in c, 0 at c=0, exactly 1 once n-c < 5."""
    prev = -1.0
    for c in range(n + 1):
        p = _pass5(n, c)
        assert p >= prev - 1e-15
        prev = p
    assert _pass5(n, 0) == 0.0
    assert _pass5(n, n - 4) == 1.0
