"""Round-15 eval additions: pure-Python replays of ROC AUC, the cost
sweep, ROC decile points, per-stratum calibration, and grid log loss
against the same parquet, plus bounds/consistency checks for NDCG@10.
The replays recompute each metric from the textbook definition (brute
pair counting for AUC, an explicit threshold sweep for cost) — nothing
shared with the Spark implementations beyond the NB replay fixture."""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq

from fusionspark.queries.eval_queries import (
    calibration_strata,
    cost_curve,
    log_loss_grid,
    ndcg_multi,
    roc_auc,
    roc_points,
)
from tests.test_eval_ops import _nb_py


def _grid(p):
    g = collections.defaultdict(lambda: [0, 0])
    for r in p:
        c = g[r["s"]]
        c[0] += 1
        c[1] += r["y"]
    return g


def test_roc_auc_brute_pairs(spark, sf_dir):
    """AUC must equal the Mann-Whitney pair count: wins + ties/2 over
    all pos×neg pairs — counted here per score cell, the O(cells²)
    brute force the grid cumulative replaces."""
    p = _nb_py(sf_dir)
    g = _grid(p)
    cells = sorted(g.items())
    u2 = 0  # 2U: 2 per win, 1 per tie
    for i, (si, (ci, cpi)) in enumerate(cells):
        ni = ci - cpi
        for sj, (cj, cpj) in cells[i:]:
            if sj == si:
                u2 += cpj * ni  # ties (same cell): pos·neg once
            else:
                u2 += 2 * cpj * ni  # pos above neg: full win
    P = sum(v[1] for v in g.values())
    N = sum(v[0] - v[1] for v in g.values())
    got = roc_auc(spark, sf_dir).collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (P, N)
    assert got["roc_auc"] == u2 / (2 * P * N)
    assert 0.5 < got["roc_auc"] <= 1.0  # the NB ranker genuinely ranks


def test_cost_curve_explicit_sweep(spark, sf_dir):
    p = _nb_py(sf_dir)
    g = _grid(p)
    NN = sum(v[0] - v[1] for v in g.values())
    n = sum(v[0] for v in g.values())
    best = None
    pb = nb = 0  # positives / negatives strictly below t
    for s in sorted(g):
        fn, fp = pb, NN - nb
        cost = 1 * fp + 5 * fn
        if best is None or cost < best[0] or (cost == best[0] and s < best[1]):
            best = (cost, s, fp, fn)
        c, cp = g[s]
        pb += cp
        nb += c - cp
    got = cost_curve(spark, sf_dir).collect()[0]
    assert got["threshold_score"] == best[1]
    assert (got["fp"], got["fn"], got["cost"]) == (best[2], best[3], best[0])
    assert got["cost_rate"] == best[0] / n


def test_roc_points_decile_replay(spark, sf_dir):
    """Replay NTILE(10) over (-µscore, doc_id) and the decile
    cumulatives; every (tpr, fpr) step must match exactly and the curve
    must be monotone ending at (1, 1)."""
    p = _nb_py(sf_dir)
    order = sorted(
        p, key=lambda r: (-math.floor(r["s"] * 1e6 + 0.5), r["doc_id"])
    )
    n = len(order)
    q, rem = divmod(n, 10)
    sizes = [q + 1 if i < rem else q for i in range(10)]
    P = sum(r["y"] for r in order)
    N = n - P
    rows = roc_points(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    idx = 0
    cum_pos = cum_neg = 0
    for i, row in enumerate(rows):
        chunk = order[idx: idx + sizes[i]]
        idx += sizes[i]
        np_ = sum(r["y"] for r in chunk)
        cum_pos += np_
        cum_neg += len(chunk) - np_
        assert (row["n"], row["n_pos"]) == (len(chunk), np_)
        assert (row["cum_pos"], row["cum_neg"]) == (cum_pos, cum_neg)
        assert row["tpr"] == cum_pos / P
        assert row["fpr"] == cum_neg / N
    assert rows[-1]["tpr"] == 1.0 and rows[-1]["fpr"] == 1.0


def test_calibration_strata_replay(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    src = {d["doc_id"]: d["source"] for d in docs}
    p = _nb_py(sf_dir)
    bins = collections.defaultdict(lambda: [0, 0, 0])  # n, sy, spu
    for r in p:
        b = min(r["pu"] // 100000, 9)
        cell = bins[(src[r["doc_id"]], b)]
        cell[0] += 1
        cell[1] += r["y"]
        cell[2] += r["pu"]
    per_src = collections.defaultdict(lambda: [0, 0, 0, 0.0])
    for (s, _b), (nb, sy, spu) in bins.items():
        dev = abs(1000000 * sy - spu)
        a = per_src[s]
        a[0] += nb
        a[1] += 1
        a[2] += dev
        a[3] = max(a[3], dev / nb)
    rows = calibration_strata(spark, sf_dir).collect()
    assert len(rows) == len(per_src)
    for row in rows:
        n, used, devsum, mxq = per_src[row["source"]]
        assert (row["n"], row["n_bins_used"]) == (n, used)
        assert row["ece"] == math.floor(devsum / n + 0.5) / 1e6
        assert row["mce"] == math.floor(mxq + 0.5) / 1e6
        assert 0.0 <= row["ece"] <= row["mce"] <= 1.0


def test_log_loss_grid_replay(spark, sf_dir):
    p = _nb_py(sf_dir)
    grid = collections.defaultdict(lambda: [0, 0])
    for r in p:
        puc = min(max(r["pu"], 1), 999999)
        g = grid[puc]
        g[0] += 1
        g[1] += r["y"]
    ls = 0.0
    for puc in sorted(grid):
        nb, sy = grid[puc]
        ls += sy * -math.log(puc / 1e6) + (nb - sy) * -math.log(
            1.0 - puc / 1e6
        )
    n = sum(g[0] for g in grid.values())
    got = log_loss_grid(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert abs(got["log_loss"] - ls / n) < 1e-6
    assert got["log_loss"] > 0.0


def test_ndcg_multi_bounds_and_mrr_consistency(spark, sf_dir):
    """Each per-query NDCG is in [0, 1]; a query whose FIRST hit is at
    rank 1 (RR = 1) must have NDCG > 0, and a query with no hits in the
    top 10 (RR = 0) must have NDCG = 0 — binary-relevance DCG and RR
    share their support."""
    from fusionspark.queries.eval_queries import mrr_multi

    nd = ndcg_multi(spark, sf_dir).collect()[0]
    rr = mrr_multi(spark, sf_dir).collect()[0]
    for i in range(1, 6):
        v = nd[f"ndcg_{i}"]
        assert 0.0 <= v <= 1.0
        if rr[f"rr_{i}"] == 0.0:
            assert v == 0.0
        else:
            assert v > 0.0
    m = sum(nd[f"ndcg_{i}"] for i in range(1, 6)) / 5.0
    assert abs(nd["ndcg"] - m) < 5e-6  # mean of rounded ≈ rounded mean
