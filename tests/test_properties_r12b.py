"""Hypothesis property tests for the round-12 operators: laws that must
hold on ARBITRARY inputs, not just the gate corpus — the LCS recurrence
identities behind rouge_l_eval, the winnowing fingerprint guarantees,
Cochran constant-row invariance, Kendall-W bounds, Page-L extremality,
Simpson direction consistency, and the KMV min-union algebra."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_round12b_ops import (
    _cochran,
    _fingerprints,
    _lcs,
    _md5_32,
)

# ── LCS (rouge_l_eval) ─────────────────────────────────────────────────────

_seq = st.lists(st.integers(0, 5), max_size=14)


@settings(max_examples=150, deadline=None)
@given(_seq, _seq)
def test_lcs_symmetry_and_bounds(xs, ys):
    """LCS(x,y) == LCS(y,x); 0 <= LCS <= min lengths; LCS(x,x) == |x|."""
    l = _lcs(xs, ys)
    assert l == _lcs(ys, xs)
    assert 0 <= l <= min(len(xs), len(ys))
    assert _lcs(xs, xs) == len(xs)


@settings(max_examples=150, deadline=None)
@given(_seq, _seq, st.integers(0, 5))
def test_lcs_monotone_under_append(xs, ys, z):
    """Appending a symbol never decreases LCS, and increases it by at
    most 1 — the adjacent-cell property the 3-way-max form leans on."""
    base = _lcs(xs, ys)
    assert base <= _lcs(xs + [z], ys) <= base + 1
    assert base <= _lcs(xs, ys + [z]) <= base + 1


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_lcs_subsequence_is_exact(data):
    """For ys a true subsequence of xs, LCS == |ys| exactly."""
    xs = data.draw(st.lists(st.integers(0, 9), min_size=1, max_size=14))
    mask = data.draw(
        st.lists(st.booleans(), min_size=len(xs), max_size=len(xs))
    )
    ys = [x for x, keep in zip(xs, mask) if keep]
    assert _lcs(xs, ys) == len(ys)


# ── winnowing (winnowing_fingerprints) ─────────────────────────────────────

_K, _W = 3, 4


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]),
             min_size=_K + _W, max_size=60)
)
def test_winnowing_fp_subset_of_kgram_hashes(ws):
    """Every fingerprint IS some k-gram hash of the doc (window minima
    select, never invent), and the count is bounded by the window count."""
    kgram_hashes = {
        _md5_32("wf:" + " ".join(ws[i:i + _K]))
        for i in range(len(ws) - _K + 1)
    }
    fps = _fingerprints(ws)
    assert fps <= kgram_hashes
    assert len(fps) <= len(ws) - _K + 1 - _W + 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
)
def test_winnowing_guarantee_any_context(pre, post):
    """The shared-run guarantee holds under ARBITRARY contexts: a run of
    k+w-1 identical words always leaves a common fingerprint."""
    run = [f"r{i}" for i in range(_K + _W - 1)]
    fa = _fingerprints(pre + run + post)
    fb = _fingerprints(run)
    assert fa & fb


# ── Cochran's Q (cochran_q) ────────────────────────────────────────────────

_row = st.tuples(st.integers(0, 1), st.integers(0, 1), st.integers(0, 1))


@settings(max_examples=100, deadline=None)
@given(st.lists(_row, min_size=3, max_size=30), st.integers(0, 8),
       st.integers(0, 8))
def test_cochran_constant_row_invariance(rows, n0, n1):
    """Q is invariant under adding all-0 / all-1 rows (the law the query
    relies on to skip filtering), whenever Q is defined at all."""
    q = _cochran(rows)
    qq = _cochran(rows + [(0, 0, 0)] * n0 + [(1, 1, 1)] * n1)
    if q is None:
        assert qq is None
    else:
        assert math.isclose(q, qq, rel_tol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.lists(_row, min_size=3, max_size=30))
def test_cochran_nonnegative_and_permutation_symmetric(rows):
    """Q >= 0, and permuting the three periods leaves Q unchanged
    (the statistic is symmetric in the treatments)."""
    q = _cochran(rows)
    if q is None:
        return
    assert q >= -1e-12
    perm = [(r[2], r[0], r[1]) for r in rows]
    assert math.isclose(q, _cochran(perm), rel_tol=1e-12)


# ── Kendall's W / Page's L (kendall_w, page_trend) ─────────────────────────


def _doubled_ranks(xs):
    return [
        2 * sum(1 for y in xs if y < x) + sum(1 for y in xs if y == x) + 1
        for x in xs
    ]


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.integers(0, 6), min_size=4, max_size=4),
                min_size=2, max_size=12))
def test_kendall_w_in_unit_interval(blocks):
    """Tie-corrected W stays in [0, 1] on arbitrary integer blocks
    (denominator > 0 unless every block is fully tied)."""
    n, k = len(blocks), 4
    rsum = [0] * k
    tt = 0
    for xs in blocks:
        for j, dr in enumerate(_doubled_ranks(xs)):
            rsum[j] += dr
        for t in {x: xs.count(x) for x in xs}.values():
            tt += t * t * t - t
    den = n * n * k * (k * k - 1) - n * tt
    if den == 0:
        return  # all blocks fully tied: W undefined
    num = 3 * sum(r * r for r in rsum) - 3 * k * n * n * (k + 1) ** 2
    w = num / den
    assert -1e-12 <= w <= 1 + 1e-12


@settings(max_examples=80, deadline=None)
@given(st.permutations(list(range(1, 6))), st.integers(2, 10))
def test_page_l_maximal_iff_identity_order(perm, n):
    """Across all rank permutations, L = n * sum(j * r_j) is maximized
    exactly by the monotone (identity) assignment — the rearrangement
    inequality Page's test is built on."""
    ident = sum(j * j for j in range(1, 6))
    got = sum(j * r for j, r in zip(range(1, 6), perm))
    assert got <= ident
    if list(perm) == list(range(1, 6)):
        assert got == ident


# ── Simpson direction (simpsons_paradox) ───────────────────────────────────


@settings(max_examples=150, deadline=None)
@given(st.integers(1, 50), st.integers(0, 50), st.integers(1, 50),
       st.integers(0, 50))
def test_simpson_sign_matches_rate_compare(n0, a0, n1, a1):
    """The exact cross-multiplication sign equals the float rate
    comparison whenever the rates are well separated, and never
    overflows/divides — the reason the query compares integers."""
    a0, a1 = min(a0, n0), min(a1, n1)
    ds = (a1 * n0 > a0 * n1) - (a1 * n0 < a0 * n1)
    r0, r1 = a0 / n0, a1 / n1
    if abs(r1 - r0) > 1e-9:
        assert ds == (1 if r1 > r0 else -1)
    else:
        assert ds == 0 or abs(r1 - r0) > 0


# ── KMV min-union algebra (kmv_intersect, maintain_kmv_stream) ─────────────


def _kmv(hashes, k=8):
    return tuple(sorted(set(hashes))[:k])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 1000), max_size=30),
       st.lists(st.integers(0, 1000), max_size=30),
       st.lists(st.integers(0, 1000), max_size=30))
def test_kmv_min_union_is_a_semilattice(a, b, c):
    """Sketch merge (k smallest of the union) is commutative,
    associative, and idempotent — the law that makes ANY batch slicing
    and any replay converge to the one-shot sketch bit-for-bit."""
    def merge(x, y, k=8):
        return _kmv(list(x) + list(y), k)

    sa, sb, sc = _kmv(a), _kmv(b), _kmv(c)
    assert merge(sa, sb) == merge(sb, sa)
    assert merge(merge(sa, sb), sc) == merge(sa, merge(sb, sc))
    assert merge(sa, sa) == sa
    # and merging sketches == sketching the merged multiset
    assert merge(sa, sb) == _kmv(a + b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=60))
def test_kmv_exact_below_k_property(xs):
    """Below the cap the sketch IS the distinct set, so the estimator's
    exact branch (count < k -> count) is lossless."""
    k = 64
    sk = _kmv(xs, k)
    if len(set(xs)) <= k:
        assert set(sk) == set(xs)
        assert len(sk) == len(set(xs))
