"""Hypothesis laws for the round-14 eval family: each law checks that an
algebraic rewrite a query ships (common-denominator ARI, paired-product
MCC denominator, block-form AP, integer-argmax KS) equals the textbook
definition, or that a required invariance holds — on arbitrary
contingencies / score tables, pure Python (no Spark)."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# a random small RECTANGULAR contingency table: clusters × labels
@st.composite
def _ct_matrices(draw):
    ncols = draw(st.integers(2, 5))
    m = draw(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=ncols,
                max_size=ncols,
            ),
            min_size=2,
            max_size=5,
        )
    )
    return m


_CT = _ct_matrices().filter(lambda m: sum(sum(r) for r in m) >= 4)


def _pair_counts(m):
    n = sum(sum(r) for r in m)
    sij = sum(v * (v - 1) // 2 for r in m for v in r)
    sa = sum(s * (s - 1) // 2 for s in (sum(r) for r in m))
    sb = sum(
        s * (s - 1) // 2
        for s in (sum(r[j] for r in m) for j in range(len(m[0])))
    )
    t = n * (n - 1) // 2
    return n, t, sij, sa, sb


@settings(max_examples=200, deadline=None)
@given(_CT)
def test_ari_common_denominator_equals_textbook(m):
    """2(T·Σij − Sa·Sb)/(T(Sa+Sb) − 2SaSb) == (Σij − SaSb/T)/((Sa+Sb)/2
    − SaSb/T) — the query's integer rewrite vs Hubert-Arabie, exact over
    rationals."""
    n, t, sij, sa, sb = _pair_counts(m)
    if t == 0 or t * (sa + sb) == 2 * sa * sb:
        return
    lhs = Fraction(2 * (t * sij - sa * sb), t * (sa + sb) - 2 * sa * sb)
    exp = Fraction(sa * sb, t)
    rhs = (Fraction(sij) - exp) / (Fraction(sa + sb, 2) - exp)
    assert lhs == rhs


@settings(max_examples=200, deadline=None)
@given(_CT)
def test_rand_index_agreement_form(m):
    """(T + 2Σij − Sa − Sb)/T counts exactly the agreeing pairs
    (both-same + both-different)."""
    n, t, sij, sa, sb = _pair_counts(m)
    if t == 0:
        return
    # brute force over the expanded labeling
    items = []
    for i, r in enumerate(m):
        for j, v in enumerate(r):
            items += [(i, j)] * v
    agree = 0
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            same_c = items[x][0] == items[y][0]
            same_l = items[x][1] == items[y][1]
            agree += same_c == same_l
    assert t + 2 * sij - sa - sb == agree


@settings(max_examples=200, deadline=None)
@given(_CT)
def test_fowlkes_mallows_squared_is_precision_times_recall(m):
    n, t, sij, sa, sb = _pair_counts(m)
    if sa == 0 or sb == 0:
        return
    fm2 = Fraction(sij * sij, sa * sb)
    assert fm2 == Fraction(sij, sa) * Fraction(sij, sb)


@settings(max_examples=200, deadline=None)
@given(_CT)
def test_mi_symmetry_and_nmi_bounds(m):
    """MI(ct) == MI(ctᵀ); 0 ≤ NMI ≤ 1 (+1e-12 float slop)."""
    n = sum(sum(r) for r in m)

    def mi_of(mm):
        rows = [sum(r) for r in mm]
        cols = [sum(r[j] for r in mm) for j in range(len(mm[0]))]
        s = 0.0
        for i, r in enumerate(mm):
            for j, v in enumerate(r):
                if v > 0:
                    s += (v / n) * math.log((v * n) / (rows[i] * cols[j]))
        return s

    tr = [[m[i][j] for i in range(len(m))] for j in range(len(m[0]))]
    assert abs(mi_of(m) - mi_of(tr)) < 1e-9
    rows = [sum(r) for r in m]
    cols = [sum(r[j] for r in m) for j in range(len(m[0]))]
    hc = -sum((a / n) * math.log(a / n) for a in rows if a > 0)
    hl = -sum((b / n) * math.log(b / n) for b in cols if b > 0)
    if hc + hl > 0:
        nmi = 2 * mi_of(m) / (hc + hl)
        assert -1e-12 <= nmi <= 1.0 + 1e-12


@settings(max_examples=200, deadline=None)
@given(_CT)
def test_vmeasure_identity_on_diagonal(m):
    """A diagonal contingency (clusters == labels) has homogeneity =
    completeness = V = 1."""
    k = min(len(m), len(m[0]))
    diag = [[m[i][j] if i == j else 0 for j in range(k)] for i in range(k)]
    n = sum(sum(r) for r in diag)
    if n == 0 or sum(1 for i in range(k) if diag[i][i] > 0) < 2:
        return
    hlc = 0.0  # H(label|cluster) over a diagonal is 0
    for i in range(k):
        v = diag[i][i]
        if v > 0:
            hlc += -(v / n) * math.log(v / v)
    assert hlc == 0.0


_CONF = st.tuples(
    st.integers(0, 500), st.integers(0, 500), st.integers(0, 500),
    st.integers(0, 500),
)


@settings(max_examples=300, deadline=None)
@given(_CONF)
def test_balanced_accuracy_and_youden_rewrites(c):
    """The query's common-denominator integer forms equal (tpr+tnr)/2 and
    tpr+tnr−1 exactly over rationals."""
    tp, fp, tn, fn = c
    if (tp + fn) == 0 or (tn + fp) == 0:
        return
    tpr = Fraction(tp, tp + fn)
    tnr = Fraction(tn, tn + fp)
    ba = Fraction(tp * (tn + fp) + tn * (tp + fn), 2 * (tp + fn) * (tn + fp))
    yj = Fraction(
        tp * (tn + fp) + tn * (tp + fn) - (tp + fn) * (tn + fp),
        (tp + fn) * (tn + fp),
    )
    assert ba == (tpr + tnr) / 2
    assert yj == tpr + tnr - 1


@settings(max_examples=300, deadline=None)
@given(_CONF)
def test_mcc_paired_product_denominator(c):
    """sqrt((a·b)) with a=(tp+fp)(tp+fn), b=(tn+fp)(tn+fn) equals the
    4-factor textbook denominator (as reals); MCC ∈ [−1, 1]."""
    tp, fp, tn, fn = c
    a = (tp + fp) * (tp + fn)
    b = (tn + fp) * (tn + fn)
    if a == 0 or b == 0:
        return
    mcc = (tp * tn - fp * fn) / math.sqrt(float(a) * float(b))
    assert -1.0 - 1e-12 <= mcc <= 1.0 + 1e-12


_SCORES = st.lists(
    st.tuples(st.integers(-20, 20), st.booleans()), min_size=2, max_size=60
).filter(lambda rows: any(y for _, y in rows) and any(not y for _, y in rows))


@settings(max_examples=200, deadline=None)
@given(_SCORES)
def test_pr_auc_block_form_equals_per_row_on_distinct_scores(rows):
    """When scores are tie-free, the distinct-score block AP equals the
    classic per-row Σ_pos P@rank / P (exact over rationals)."""
    # de-dup scores to force tie-free
    seen = {}
    for s, y in rows:
        if s not in seen:
            seen[s] = y
    rows = sorted(seen.items(), key=lambda t: -t[0])
    P = sum(1 for _, y in rows if y)
    if P == 0:
        return
    # per-row classic
    ap_row = Fraction(0)
    tp = 0
    for i, (_, y) in enumerate(rows, 1):
        if y:
            tp += 1
            ap_row += Fraction(tp, i) / P
    # block form over distinct scores (each block = 1 row here)
    ap_block = Fraction(0)
    cn = ctp = 0
    for s, y in rows:
        cn += 1
        ctp += y
        if y:
            ap_block += Fraction(1 * ctp, P * cn)
    assert ap_row == ap_block


@settings(max_examples=200, deadline=None)
@given(_SCORES)
def test_ks_integer_argmax_equals_float_form(rows):
    """max |ctp·Nn − cfp·Np| / (Np·Nn) == max |ctp/Np − cfp/Nn| (exact
    over rationals) — the query's integer compare loses nothing."""
    grid = {}
    for s, y in rows:
        c, cp = grid.get(s, (0, 0))
        grid[s] = (c + 1, cp + (1 if y else 0))
    NP = sum(cp for _, cp in grid.values())
    NN = sum(c - cp for c, cp in grid.values())
    if NP == 0 or NN == 0:
        return
    ctp = cfp = 0
    best_int = 0
    best_frac = Fraction(0)
    for s in sorted(grid):
        c, cp = grid[s]
        ctp += cp
        cfp += c - cp
        best_int = max(best_int, abs(ctp * NN - cfp * NP))
        best_frac = max(
            best_frac, abs(Fraction(ctp, NP) - Fraction(cfp, NN))
        )
    assert Fraction(best_int, NP * NN) == best_frac


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=4, max_size=200))
def test_brier_murphy_identity_for_bin_constant_forecasts(bins):
    """When every forecast is its bin's midpoint (bin-constant), Murphy's
    identity REL − RES + UNC == Brier holds exactly up to float slop."""
    # forecast = bin/10 + 0.05, outcome = deterministic rule
    rows = [(b, 1 if (b * 7 + i) % 3 == 0 else 0) for i, b in enumerate(bins)]
    n = len(rows)
    sy = sum(y for _, y in rows)
    if sy == 0 or sy == n:
        return
    ybar = sy / n
    per_bin = {}
    for b, y in rows:
        nb, s = per_bin.get(b, (0, 0))
        per_bin[b] = (nb + 1, s + y)
    rel = sum(
        nb * ((s / nb) - (b / 10 + 0.05)) ** 2 for b, (nb, s) in per_bin.items()
    ) / n
    res = sum(nb * ((s / nb) - ybar) ** 2 for b, (nb, s) in per_bin.items()) / n
    unc = ybar * (1 - ybar)
    brier = sum((b / 10 + 0.05 - y) ** 2 for b, y in rows) / n
    assert abs((rel - res + unc) - brier) < 1e-9


@settings(max_examples=300, deadline=None)
@given(
    st.floats(0, 1e6, allow_nan=False),
    st.floats(0, 1e6, allow_nan=False),
    st.floats(0.1, 1e3, allow_nan=False),
)
def test_silhouette_scale_invariance(a, b, k):
    """s = (b−a)/max(a,b) is invariant under distance scaling and lives
    in [−1, 1]."""
    if max(a, b) < 1e-6 or max(k * a, k * b) == 0.0:
        return
    s1 = (b - a) / max(a, b)
    s2 = (k * b - k * a) / max(k * a, k * b)
    assert abs(s1 - s2) < 1e-9
    assert -1.0 - 1e-12 <= s1 <= 1.0 + 1e-12
