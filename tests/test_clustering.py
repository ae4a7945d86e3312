"""Exact-integer k-means tests (operators/clustering.py): bit-parity with
an independent numpy/pure-int replay of the same spec, planted-cluster
recovery, and empty-cluster carry-over."""

from __future__ import annotations

import numpy as np

from fusionspark.operators import clustering
from fusionspark.operators.spectral import SCALE

R, OFF = clustering.R, clustering.OFF


def _np_lloyd(x: np.ndarray, k: int, iters: int):
    """Pure-Python replay of the exact spec: int grid, offset floor-div
    centroids, (dist, c) ties."""
    xi = np.floor(x * float(SCALE)).astype(np.int64)
    cents = [(xi[i] * R).tolist() for i in range(k)]  # ids are 0..n-1 in order
    assign = None
    for it in range(iters + 1):
        d = np.array(
            [((xi * R - np.array(c)) ** 2).sum(axis=1) for c in cents]
        )  # (k, n)
        assign = np.argmin(d, axis=0)  # argmin takes lowest index on ties
        dist2 = d[assign, np.arange(len(xi))]
        if it == iters:
            return assign, dist2
        new = []
        for c in range(k):
            m = xi[assign == c]
            if len(m) == 0:
                new.append(cents[c])
                continue
            s, n = m.sum(axis=0), len(m)
            new.append([((int(sj) + OFF * n) * R) // n - OFF * R for sj in s])
        cents = new


def _planted(n=300, k=4, dim=64):
    rng = np.random.default_rng(11)
    centers = rng.uniform(-0.6, 0.6, size=(k, dim))
    lab = np.arange(n) % k
    x = centers[lab] + rng.normal(scale=0.02, size=(n, dim))
    return np.clip(x, -0.9, 0.9), lab


def _df(spark, x):
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)


def test_lloyd_matches_pure_int_replay(spark):
    x, _ = _planted()
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in clustering.lloyd(_df(spark, x), k=4, iters=3).collect()
    }
    assign, dist2 = _np_lloyd(x, k=4, iters=3)
    assert len(got) == len(x)
    for i in range(len(x)):
        assert got[i] == (assign[i], dist2[i])


def test_lloyd_recovers_planted_clusters(spark):
    x, lab = _planted()
    got = clustering.lloyd(_df(spark, x), k=4, iters=3).collect()
    # each k-means cluster should be pure w.r.t. the planted labels
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r["cluster"], set()).add(int(lab[r["vec_id"]]))
    for members in by_cluster.values():
        assert len(members) == 1
    assert len(by_cluster) == 4


def test_empty_cluster_keeps_centroid(spark):
    # two tight planted blobs but k=4: two seeds end up empty and must
    # carry their previous centroid instead of crashing or NaN-ing
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [
            rng.normal(0.5, 0.005, size=(40, 64)),
            rng.normal(-0.5, 0.005, size=(40, 64)),
        ]
    )
    x = np.clip(x, -0.9, 0.9)
    got = clustering.lloyd(_df(spark, x), k=4, iters=3).collect()
    assert len(got) == 80
    assign, dist2 = _np_lloyd(x, k=4, iters=3)
    for r in got:
        assert r["cluster"] == assign[r["vec_id"]]
        assert r["dist2"] == dist2[r["vec_id"]]
