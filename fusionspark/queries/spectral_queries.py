"""Spectral / linear-algebra query family over the embeddings table
(operators/spectral.py): exact integer covariance, closed-form spectrum
summary, and a fixed-iteration power-method PCA whose iterate is
BIT-identical across engines (every float sum is a left-to-right fold over
an explicitly ordered list on both sides — see the operator docstring).

Not in the reference (north-star additions for a 100 TB curation
pipeline): dimension-covariance screens for encoder redundancy, the
participation-ratio effective rank detects embedding-space collapse, and
PC1 doc scores give drift/outlier coordinates.  The power method follows
``markov_stationary``'s fixed-iteration contract (8 rounds from the exact
uniform start 1/√64 = 0.125): on a near-isotropic corpus like this
synthetic one the 8-round iterate is a partial iterate by construction —
the oracle attests the computation, the planted-signal pytest attests
convergence where a dominant axis exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import spectral
from fusionspark.queries import query

_ITERS = 8

# exact-integer second moments on the floor(x·1e5) grid; MATERIALIZED so
# the 8 iteration CTEs don't re-run the n·d² unnest (the BPE-oracle rule)
_BASE = """
    x AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                              e -> FLOOR(CAST(e AS DOUBLE) * 100000.0)::BIGINT) AS xi
        FROM embeddings
    ),
    dims AS (SELECT unnest(range(64))::INT AS d),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM x),
    sx AS MATERIALIZED (
        SELECT d.d AS j, SUM(xi[d.d + 1])::BIGINT AS sx FROM x, dims d GROUP BY d.d
    ),
    sxy AS MATERIALIZED (
        SELECT i.d AS i, j.d AS j, SUM(xi[i.d + 1] * xi[j.d + 1])::BIGINT AS sxy
        FROM x, dims i, dims j
        GROUP BY i.d, j.d
    ),
    cint AS MATERIALIZED (
        SELECT s.i, s.j,
               (SELECT n FROM nn) * s.sxy - a.sx * b.sx AS c_int
        FROM sxy s JOIN sx a ON a.j = s.i JOIN sx b ON b.j = s.j
    ),
    cmat AS MATERIALIZED (
        SELECT i, j,
               CAST(c_int AS DOUBLE)
               / (CAST((SELECT n FROM nn) * (SELECT n FROM nn) AS DOUBLE) * 1.0e10) AS c
        FROM cint
    )
"""


def _iter_ctes(iters: int = _ITERS) -> str:
    """The unrolled power iteration: w = C·v (per-row ordered fold),
    nrm = ‖w‖ (ordered fold + sqrt), v = w/nrm.  Every per-round CTE is
    MATERIALIZED — without it DuckDB inlines each reference and the
    8-round chain re-evaluates exponentially (the oracle twin of the
    Spark side's per-iteration localCheckpoint)."""
    parts = ["v0 AS MATERIALIZED (SELECT d AS j, 0.125::DOUBLE AS v FROM dims)"]
    prev = "v0"
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
        SELECT c.i, list_reduce(list(c.c * v.v ORDER BY c.j), (a, b) -> a + b) AS w
        FROM cmat c JOIN {prev} v ON v.j = c.j GROUP BY c.i
    ),
    n{t} AS MATERIALIZED (
        SELECT sqrt(list_reduce(list(w * w ORDER BY i), (a, b) -> a + b)) AS nrm
        FROM w{t}),
    v{t} AS MATERIALIZED (
        SELECT i AS j, w / (SELECT nrm FROM n{t}) AS v FROM w{t})"""
        )
        prev = f"v{t}"
    return ",\n    ".join(parts)


_PCA_CHAIN = f"""{_BASE},
    {_iter_ctes()},
    sgn AS (
        SELECT CASE WHEN v >= 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS s
        FROM v{_ITERS} ORDER BY abs(v) DESC, j ASC LIMIT 1
    )
"""


@query(
    "covariance_topk",
    f"""
    WITH {_BASE}
    SELECT (i + 1)::BIGINT AS dim_i, (j + 1)::BIGINT AS dim_j,
           ROUND(CAST(c_int AS DOUBLE)
                 / (CAST((SELECT n FROM nn) * (SELECT n FROM nn) AS DOUBLE)
                    * 1.0e10), 6) AS cov
    FROM cint
    WHERE i < j
    ORDER BY abs(c_int) DESC, i ASC, j ASC
    LIMIT 20
    """,
)
def covariance_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-covarying dimension pairs.  The ranking cut compares
    exact BIGINTs (covariance × n²·scale²), so the top-k boundary is
    engine-deterministic — no float ordering anywhere before the final
    display division.  Scale shape: one Arrow pass of per-partition
    int64 GEMM partials (4096+65 rows each), one tiny groupBy, corpus
    vectors never shuffle."""
    return spectral.covariance_topk(load_table(spark, sf_dir, "embeddings"), k=20)


@query(
    "embedding_spectrum",
    f"""
    WITH {_BASE},
    tv AS (SELECT list_reduce(list(c ORDER BY i), (a, b) -> a + b) AS tv
           FROM cmat WHERE i = j),
    fr AS (SELECT list_reduce(list(c * c ORDER BY i * 64 + j), (a, b) -> a + b) AS fr
           FROM cmat)
    SELECT ROUND((SELECT tv FROM tv), 6) AS total_variance,
           ROUND((SELECT fr FROM fr), 6) AS frobenius,
           ROUND(CASE WHEN (SELECT fr FROM fr) <> 0
                      THEN (SELECT tv FROM tv) * (SELECT tv FROM tv)
                           / (SELECT fr FROM fr)
                      ELSE 0.0 END, 6) AS effective_rank
    """,
)
def embedding_spectrum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form spectral summary: tr(C), tr(C²), and the
    participation-ratio effective rank tr(C)²/tr(C²) (64 = isotropic,
    →1 = collapsed embedding space).  Exact for any spectrum — the
    convergence-free companion of pca_embeddings."""
    return spectral.spectrum_stats(load_table(spark, sf_dir, "embeddings"))


@query(
    "pca_embeddings",
    f"""
    WITH {_PCA_CHAIN}
    SELECT (j + 1)::BIGINT AS dim,
           ROUND(v * (SELECT s FROM sgn), 6) AS loading,
           ROUND((SELECT nrm FROM n{_ITERS}), 6) AS eigval
    FROM v{_ITERS}
    """,
)
def pca_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal axis after exactly 8 power iterations from the
    uniform start (fixed-iteration contract, as markov_stationary).
    eigval = ‖C·v‖ of the final round — equals λ₁ once converged, and is
    a well-defined partial iterate otherwise.  The oracle unrolls the
    same 8 rounds; every float in the chain is bit-identical across
    engines (ordered folds + IEEE ops only)."""
    return spectral.pca_top_component(
        load_table(spark, sf_dir, "embeddings"), iters=_ITERS
    )


@query(
    "pca_doc_scores",
    f"""
    WITH {_PCA_CHAIN},
    varr AS MATERIALIZED (
        SELECT list(v * (SELECT s FROM sgn) ORDER BY j) AS varr FROM v{_ITERS}
    ),
    sxarr AS MATERIALIZED (SELECT list(sx ORDER BY j) AS sxarr FROM sx)
    SELECT x.vec_id,
           ROUND(list_reduce(
                     list_transform(range(64),
                         k -> CAST(nn.n * xi[k + 1]
                                   - sxarr[k + 1] AS DOUBLE) * varr[k + 1]),
                     (a, b) -> a + b)
                 / (CAST(nn.n AS DOUBLE) * 100000.0),
                 6) AS pc1_score
    FROM x, varr, sxarr, nn
    """,
)
def pca_doc_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's coordinate along the (8-iteration) principal
    axis, mean-centered in exact integer space: the centered value
    n·x_int − Σx is a BIGINT, the projection folds j-ascending, one
    division at the end.  Scale shape: broadcasts 2·64 values; scoring
    is whole-stage-codegen array math, zero shuffle on the corpus."""
    return spectral.pca_scores(load_table(spark, sf_dir, "embeddings"), iters=_ITERS)


def _slice_ctes(p: str, where: str) -> str:
    """Per-slice exact-moment chain (x → nn → sx → sxy → cint → cmat →
    tv/fr), prefixed so two slices coexist in one WITH."""
    return f"""
    x_{p} AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                              e -> FLOOR(CAST(e AS DOUBLE) * 100000.0)::BIGINT) AS xi
        FROM embeddings WHERE {where}
    ),
    nn_{p} AS (SELECT COUNT(*)::BIGINT AS n FROM x_{p}),
    sx_{p} AS MATERIALIZED (
        SELECT d.d AS j, SUM(xi[d.d + 1])::BIGINT AS sx FROM x_{p}, dims d GROUP BY d.d
    ),
    sxy_{p} AS MATERIALIZED (
        SELECT i.d AS i, j.d AS j, SUM(xi[i.d + 1] * xi[j.d + 1])::BIGINT AS sxy
        FROM x_{p}, dims i, dims j
        GROUP BY i.d, j.d
    ),
    cmat_{p} AS MATERIALIZED (
        SELECT s.i, s.j,
               CAST((SELECT n FROM nn_{p}) * s.sxy - a.sx * b.sx AS DOUBLE)
               / (CAST((SELECT n FROM nn_{p}) * (SELECT n FROM nn_{p}) AS DOUBLE)
                  * 1.0e10) AS c
        FROM sxy_{p} s JOIN sx_{p} a ON a.j = s.i JOIN sx_{p} b ON b.j = s.j
    ),
    tv_{p} AS (SELECT list_reduce(list(c ORDER BY i), (x, y) -> x + y) AS tv
               FROM cmat_{p} WHERE i = j),
    fr_{p} AS (SELECT list_reduce(list(c * c ORDER BY i * 64 + j), (x, y) -> x + y) AS fr
               FROM cmat_{p})"""


@query(
    "embedding_drift",
    f"""
    WITH dims AS (SELECT unnest(range(64))::INT AS d),
    {_slice_ctes("a", "vec_id % 2 = 0")},
    {_slice_ctes("b", "vec_id % 2 = 1")},
    num AS (
        SELECT a.j,
               (SELECT n FROM nn_b) * a.sx - (SELECT n FROM nn_a) * b.sx AS num
        FROM sx_a a JOIN sx_b b USING (j)
    ),
    ssq AS (SELECT SUM(num::HUGEINT * num::HUGEINT) AS ssq FROM num)
    SELECT (SELECT n FROM nn_a) AS n_a,
           (SELECT n FROM nn_b) AS n_b,
           ROUND(sqrt(CAST((SELECT ssq FROM ssq) AS DOUBLE))
                 / (CAST((SELECT n FROM nn_a) AS DOUBLE)
                    * CAST((SELECT n FROM nn_b) AS DOUBLE) * 100000.0),
                 6) AS mean_shift,
           ROUND(CASE WHEN (SELECT fr FROM fr_a) <> 0
                      THEN (SELECT tv FROM tv_a) * (SELECT tv FROM tv_a)
                           / (SELECT fr FROM fr_a)
                      ELSE 0.0 END, 6) AS er_a,
           ROUND(CASE WHEN (SELECT fr FROM fr_b) <> 0
                      THEN (SELECT tv FROM tv_b) * (SELECT tv FROM tv_b)
                           / (SELECT fr FROM fr_b)
                      ELSE 0.0 END, 6) AS er_b
    """,
)
def embedding_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shift between two corpus slices (even vs odd vec_id —
    the snapshot-vs-snapshot shape): exact-integer mean displacement
    (num_j = n_B·Σx_A − n_A·Σx_B in BIGINT, squared/summed in
    decimal(38)/HUGEINT) + per-slice participation-ratio effective rank.
    A shrinking effective rank between snapshots is the embedding-collapse
    alarm; a large mean_shift is domain drift.  Two gram_int partial
    passes; the corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    return spectral.drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )


@query(
    "distance_outliers",
    """
    WITH x AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                              e -> FLOOR(CAST(e AS DOUBLE) * 100000.0)::BIGINT) AS xi
        FROM embeddings
    ),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM x),
    dims AS (SELECT unnest(range(64))::INT AS d),
    sx AS MATERIALIZED (
        SELECT d.d AS j, SUM(xi[d.d + 1])::BIGINT AS sx FROM x, dims d GROUP BY d.d
    ),
    d2 AS (
        SELECT x.vec_id,
               SUM((((SELECT n FROM nn) * xi[s.j + 1] - s.sx)::HUGEINT)
                   * (((SELECT n FROM nn) * xi[s.j + 1] - s.sx)::HUGEINT)) AS d2
        FROM x, sx s
        GROUP BY x.vec_id
    )
    SELECT vec_id,
           ROUND(sqrt(CAST(d2 AS DOUBLE))
                 / (CAST((SELECT n FROM nn) AS DOUBLE) * 100000.0), 6) AS dist
    FROM d2
    ORDER BY d2 DESC, vec_id ASC
    LIMIT 20
    """,
)
def distance_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vectors by exact centroid distance
    (operators/spectral.py::centroid_outliers) — the corrupt-embedding
    screen: the ranking key Σ(n·x_int − Σx)² is exact integer arithmetic
    (decimal(38)/HUGEINT), so the cut is bit-deterministic on both
    engines; one sqrt + division at display.  One moments partial pass +
    a broadcast of 65 longs; the corpus never shuffles."""
    return spectral.centroid_outliers(load_table(spark, sf_dir, "embeddings"), k=20)
