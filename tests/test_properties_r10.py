"""Hypothesis property tests for round-10 operators: laws that must hold
on ARBITRARY inputs, not just the gate corpus."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789", min_size=16, max_size=16))
def test_luhn_expression_equals_textbook(num):
    """The query's left-indexed double-every-second fold == the textbook
    right-to-left implementation, for EVERY 16-digit string."""
    # replicate the query's fold (positions 1..16, double when (16-i)%2==1)
    s = 0
    for i1 in range(1, 17):
        d = int(num[i1 - 1])
        if (16 - i1) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    ours = s % 10 == 0
    tot = 0
    for i, ch in enumerate(reversed(num)):
        d = int(ch)
        if i % 2 == 1:
            d = d * 2 - 9 if d * 2 > 9 else d * 2
        tot += d
    assert ours == (tot % 10 == 0)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 50)).map(
            lambda t: (min(t[0], t[1]), t[1])
        ),
        min_size=2,
        max_size=12,
    )
)
def test_isotonic_minimax_equals_pav(buckets):
    """max_{j<=i} min_{k>=i} avg(y_j..y_k) == pool-adjacent-violators,
    for arbitrary (pos, cnt) bucket sequences (the identity the
    isotonic_calibration oracle relies on)."""
    n = len(buckets)
    # minimax
    cpos = [0]
    ccnt = [0]
    for p, c in buckets:
        cpos.append(cpos[-1] + p)
        ccnt.append(ccnt[-1] + c)

    def avg(j, k):
        return (cpos[k + 1] - cpos[j]) / (ccnt[k + 1] - ccnt[j])

    minimax = []
    for i in range(n):
        best = -math.inf
        for j in range(i + 1):
            m = min(avg(j, k) for k in range(i, n))
            best = max(best, m)
        minimax.append(best)
    # PAV
    pools = []
    for p, c in buckets:
        pools.append([p, c])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
    pav = []
    for p, c in pools:
        cnt_left = c
        # expand pool over the buckets it absorbed
        while cnt_left > 0:
            take = buckets[len(pav)][1]
            pav.append(p / c)
            cnt_left -= take
    assert len(pav) == n
    for a, b in zip(minimax, pav):
        assert abs(a - b) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=12, max_size=40),
)
def test_mann_kendall_invariances(xs):
    """S flips sign under series reversal; |S| is bounded by n(n-1)/2;
    a strictly increasing series attains the bound."""
    def s_stat(v):
        return sum(
            (v[j] > v[i]) - (v[j] < v[i])
            for i in range(len(v))
            for j in range(i + 1, len(v))
        )

    n = len(xs)
    s = s_stat(xs)
    assert s_stat(list(reversed(xs))) == -s
    assert abs(s) <= n * (n - 1) // 2
    inc = sorted(set(xs))
    if len(inc) >= 2:
        assert s_stat(inc) == len(inc) * (len(inc) - 1) // 2


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(1, 1000), min_size=2, max_size=30),
    st.integers(2, 5),
)
def test_ffd_feasibility_and_bound(sizes, factor):
    """First-fit-decreasing with capacity = factor*max(size): every bin
    fits, and the bin count respects the volume lower bound and FFD's
    11/9*OPT + 1 guarantee vs the volume bound."""
    cap = factor * max(sizes)
    items = sorted(sizes, reverse=True)
    bins = []
    for sz in items:
        for j in range(len(bins)):
            if bins[j] + sz <= cap:
                bins[j] += sz
                break
        else:
            bins.append(sz)
    assert all(b <= cap for b in bins)
    lower = math.ceil(sum(sizes) / cap)
    assert len(bins) >= lower
    assert len(bins) <= math.ceil(11 / 9 * lower) + 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=50))
def test_discrete_laplace_thresholds_monotone(hashes):
    """The dp_counts inverse CDF: noise is monotone non-decreasing in the
    coin, symmetric-ish around 2^31, and bounded by the truncation."""
    from fusionspark.queries.pipeline_queries import _DL_K, _DL_T

    def noise(h):
        return next((k for k, t in _DL_T if h < t), _DL_K)

    ns = [noise(h) for h in sorted(hashes)]
    assert ns == sorted(ns)
    assert all(-_DL_K <= v <= _DL_K for v in ns)
    assert noise(0) == -_DL_K
    # the +k tail saturates at the first threshold that hits 2^32 (mass
    # beyond it is < 2^-32 per step) — the max draw is that k, not _DL_K
    k_sat = min(k for k, t in _DL_T if t >= 2**32)
    assert noise(2**32 - 1) == k_sat and k_sat >= 20
    assert noise(2**31) in (-1, 0, 1)
