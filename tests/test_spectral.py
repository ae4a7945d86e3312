"""Spectral operator tests (operators/spectral.py): exact-integer moment
parity vs numpy, power-iteration convergence on planted-structure data
(the synthetic corpus is near-isotropic, so the registered query attests
the fixed-iteration computation while THIS file attests convergence),
and zero-shuffle doc scoring consistency."""

from __future__ import annotations

import numpy as np
import pytest

from fusionspark.operators import spectral


def _planted(n: int = 400, dim: int = 64, strength: float = 4.0) -> np.ndarray:
    """Deterministic corpus with one dominant axis: isotropic noise plus a
    rank-1 signal along a fixed unit direction."""
    rng = np.random.default_rng(7)
    axis = rng.normal(size=dim)
    axis /= np.linalg.norm(axis)
    coeff = rng.normal(size=(n, 1)) * strength
    x = rng.normal(size=(n, dim)) * 0.05 + coeff * axis * 0.1
    return np.clip(x, -0.9, 0.9)


def _df(spark, x: np.ndarray):
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)


@pytest.fixture(scope="module")
def planted(spark):
    x = _planted()
    return x, _df(spark, x)


def _np_cov_int(x: np.ndarray, scale: int = spectral.SCALE):
    xi = np.floor(x * float(scale)).astype(np.int64)
    n = len(xi)
    g = xi.T @ xi
    sx = xi.sum(axis=0)
    return n * g - np.outer(sx, sx), n


def test_gram_int_matches_numpy(spark, planted):
    x, df = planted
    got = {
        (r["i"], r["j"]): r["s"]
        for r in spectral.gram_int(df, dim=64).collect()
    }
    xi = np.floor(x * float(spectral.SCALE)).astype(np.int64)
    g = xi.T @ xi
    sx = xi.sum(axis=0)
    assert got[(-2, -2)] == len(x)
    for j in range(64):
        assert got[(-1, j)] == sx[j]
    for i in range(0, 64, 17):
        for j in range(64):
            assert got[(i, j)] == g[i, j]


def test_covariance_int_exact(spark, planted):
    x, df = planted
    cint, n = _np_cov_int(x)
    rows = spectral.covariance_int(df, dim=64).collect()
    assert len(rows) == 64 * 64
    for r in rows:
        assert r["n"] == n
        assert r["c_int"] == cint[r["i"], r["j"]]


def test_power_iteration_converges_on_planted_axis(spark, planted):
    """With a dominant planted axis the 8-round iterate matches the true
    top eigenvector of the quantized covariance (numpy eigh) to ~1e-4."""
    x, df = planted
    cint, n = _np_cov_int(x)
    c = cint.astype(np.float64) / (float(n) ** 2 * float(spectral.SCALE) ** 2)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    k = np.argmax(np.abs(top))
    if top[k] < 0:
        top = -top
    got = spectral.pca_top_component(df, iters=8, dim=64).collect()
    v = np.zeros(64)
    for r in got:
        v[r["dim"] - 1] = r["loading"]
    gk = np.argmax(np.abs(v))
    if v[gk] < 0:
        v = -v
    assert np.abs(v - top).max() < 1e-4
    assert got[0]["eigval"] == pytest.approx(evals[-1], rel=1e-4)


def test_spectrum_stats_closed_form(spark, planted):
    x, df = planted
    cint, n = _np_cov_int(x)
    c = cint.astype(np.float64) / (float(n) ** 2 * float(spectral.SCALE) ** 2)
    row = spectral.spectrum_stats(df, dim=64).collect()[0]
    assert row["total_variance"] == pytest.approx(np.trace(c), abs=1e-6)
    assert row["frobenius"] == pytest.approx((c * c).sum(), abs=1e-6)
    assert row["effective_rank"] == pytest.approx(
        np.trace(c) ** 2 / (c * c).sum(), abs=1e-3
    )
    # planted rank-1 signal → effective rank far below isotropic 64
    assert row["effective_rank"] < 20


def test_pca_scores_match_centered_projection(spark, planted):
    x, df = planted
    cint, n = _np_cov_int(x)
    c = cint.astype(np.float64) / (float(n) ** 2 * float(spectral.SCALE) ** 2)
    # replay the same 8 power iterations in numpy (float order differs, but
    # convergence on planted data puts both within 1e-5 of the eigenvector)
    v = np.full(64, 0.125)
    for _ in range(8):
        w = c @ v
        v = w / np.linalg.norm(w)
    k = np.argmax(np.abs(v))
    if v[k] < 0:
        v = -v
    xi = np.floor(x * float(spectral.SCALE)).astype(np.int64)
    sx = xi.sum(axis=0)
    expect = ((n * xi - sx).astype(np.float64) @ v) / (float(n) * float(spectral.SCALE))
    got = spectral.pca_scores(df, iters=8, dim=64).collect()
    assert len(got) == len(x)
    for r in got:
        assert r["pc1_score"] == pytest.approx(expect[r["vec_id"]], abs=1e-4)


def test_covariance_topk_deterministic_cut(spark, planted):
    x, df = planted
    cint, _ = _np_cov_int(x)
    iu = np.triu_indices(64, k=1)
    order = sorted(
        zip(np.abs(cint[iu]), iu[0], iu[1]), key=lambda t: (-t[0], t[1], t[2])
    )
    want = [(int(i) + 1, int(j) + 1) for _, i, j in order[:20]]
    got = [
        (r["dim_i"], r["dim_j"])
        for r in spectral.covariance_topk(df, k=20, dim=64).collect()
    ]
    assert got == want


def test_corpus_is_near_isotropic_premise(spark, sf_dir):
    """Documents the premise stated in spectral_queries: the synthetic
    embeddings are near-isotropic, so the registered pca query attests a
    fixed-iteration computation, not a converged axis.  If testdata ever
    gains real structure this fails loudly and the docstring should be
    revisited (the queries themselves stay correct either way)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = spectral.spectrum_stats(emb, dim=64).collect()[0]
    assert row["effective_rank"] > 40


def test_covariance_overflow_guard_raises(spark, planted):
    """The documented n²·scale² < 2⁶³ envelope is enforced loudly: an
    oversized scale fails the job instead of silently wrapping int64."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    _, df = planted
    big = spectral.covariance_int(df, dim=64, scale=10_000_000_000)
    with _pytest.raises(Exception) as ei:
        big.collect()
    assert "reduce `scale`" in str(ei.value) or "raise_error" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_drift_detects_planted_mean_shift(spark):
    """Two slices offset by a known constant vector: mean_shift recovers
    ~‖offset‖ and the effective ranks stay near the common shape."""
    rng = np.random.default_rng(5)
    base = rng.normal(scale=0.05, size=(300, 64))
    off = np.full(64, 0.2)
    a = np.clip(base[:150], -0.9, 0.9)
    b = np.clip(base[150:] + off, -0.9, 0.9)
    dfa, dfb = _df(spark, a), _df(spark, np.asarray(b))
    row = spectral.drift(dfa, dfb).collect()[0]
    assert row["n_a"] == 150 and row["n_b"] == 150
    expect = np.linalg.norm(a.mean(axis=0) - b.mean(axis=0))
    assert row["mean_shift"] == pytest.approx(expect, rel=0.02)


def test_moments_int_matches_numpy(spark, planted):
    x, df = planted
    got = {r["j"]: r["s"] for r in spectral.moments_int(df, dim=64).collect()}
    xi = np.floor(x * float(spectral.SCALE)).astype(np.int64)
    sx = xi.sum(axis=0)
    assert got[-2] == len(x)
    for j in range(64):
        assert got[j] == sx[j]


def test_centroid_outliers_match_numpy_ranking(spark, planted):
    x, df = planted
    xi = np.floor(x * float(spectral.SCALE)).astype(np.int64)
    n = len(xi)
    sx = xi.sum(axis=0)
    d2 = ((n * xi - sx).astype(object) ** 2).sum(axis=1)  # exact (python int)
    order = sorted(range(n), key=lambda i: (-d2[i], i))[:10]
    got = spectral.centroid_outliers(df, k=10).collect()
    assert [r["vec_id"] for r in got] == order
    for r in got:
        want = float(np.sqrt(float(d2[r["vec_id"]]))) / (n * float(spectral.SCALE))
        assert abs(r["dist"] - want) < 1e-6


def test_centroid_outliers_flags_planted_corruption(spark, planted):
    x, _ = planted
    bad = x.copy()
    bad[3] = 0.9  # saturated row, far from the near-zero centroid
    bad[17] = -0.9
    got = spectral.centroid_outliers(_df(spark, bad), k=2).collect()
    assert {r["vec_id"] for r in got} == {3, 17}
