"""Exact-arithmetic distributed k-means (Lloyd) over the embedding table.

Not in the reference (north-star addition): corpus clustering is the
workhorse of curation at scale — domain discovery, cluster-balanced
sampling, semantic shard assignment, IVF coarse quantizers.  The usual
blocker for cross-engine attestation is float non-determinism in the
assign step; this implementation removes floats from the loop entirely:

* Vectors quantize once to the shared integer grid (``floor(x·1e5)``,
  spectral.quantize — the same grid as the spectral family).
* Centroids live on a 1024× refined integer grid: ``c_j =
  floor(Σx_j·1024 / n)``, computed with an additive offset so the
  numerator is non-negative and truncating division (Python ``//``,
  DuckDB ``//``) IS floor division on both engines.
* Distances are exact BIGINTs: ``Σ_j (x_j·1024 − c_j)²`` ≤ 64·(2.05e8)²
  ≈ 2.7e18 < 2⁶³ (bounds hold for n ≤ ~30k rows at SCALE=1e5 like the
  spectral moments; shrink SCALE to go bigger — the grid is the spec).
* argmin ties break on cluster id via lexicographic (dist, c) struct
  ordering.  Every assignment is therefore bit-reproducible anywhere.

Scale shape: per iteration ONE distributed pass — the k·d centroid
literal ships inside the plan (k=8, d=64 → 512 longs), the assign runs
as whole-stage-codegen array expressions with zero shuffle, and the
update is a (k·d)-row groupBy of exact integer sums.  The k·d driver
collect per round is the same bounded contract as the NB weights / BPE
argmax (COVERAGE.md driver-bounded collects).  Empty clusters keep
their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusionspark.operators.spectral import SCALE, quantize

R = 1024  # centroid grid refinement: c_j = floor(Σx·R / n)
OFF = 1_000_000  # > SCALE, makes the division numerator non-negative


def _dist2(cent_arr: F.Column) -> F.Column:
    """Exact BIGINT squared distance between the row's quantized vector
    (column ``xi``) and one centroid array (both on the ×R grid)."""
    return F.aggregate(
        F.zip_with(
            F.col("xi"), cent_arr, lambda x, c: (x * F.lit(R) - c) * (x * F.lit(R) - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def _assign(rows: DataFrame, cents: list[list[int]]) -> DataFrame:
    """rows(id, xi) → (id, xi, cluster, dist2): argmin over the centroid
    literals, ties to the lowest cluster id ((dist, c) struct min)."""
    carr = F.array(
        *[
            F.struct(
                F.lit(ci).cast("int").alias("c"),
                F.array(*[F.lit(int(v)) for v in cv]).alias("ca"),
            )
            for ci, cv in enumerate(cents)
        ]
    )
    best = F.array_min(
        F.transform(carr, lambda s: F.struct(_dist2(s["ca"]).alias("d"), s["c"].alias("c")))
    )
    return rows.withColumn("__b__", best).select(
        *rows.columns,
        F.col("__b__.c").alias("cluster"),
        F.col("__b__.d").alias("dist2"),
    )


def lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """``iters`` Lloyd rounds from the deterministic seed (the k smallest
    ids' vectors), then one final assign against the final centroids.
    Returns (id, cluster, dist2) for every row."""
    # one materialization feeds the iters+1 assign scans and iters update
    # aggs (lineage also stays flat across rounds)
    rows = df.select(
        F.col(id_col).alias("id"), quantize(vec_col).alias("xi")
    ).localCheckpoint(eager=True)
    seed = rows.orderBy("id").limit(k).collect()
    if not seed:
        raise ValueError("lloyd: empty input")
    cents = [[int(v) * R for v in r["xi"]] for r in seed]
    k = len(cents)  # fewer rows than requested clusters: k clamps to n
    for _ in range(iters):
        a = _assign(rows, cents)
        sums = (
            a.select("cluster", F.posexplode("xi").alias("j", "x"))
            .groupBy("cluster", "j")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_c.setdefault(r["cluster"], {})[r["j"]] = (r["s"], r["n"])
        cents = [
            [
                ((by_c[c][j][0] + OFF * by_c[c][j][1]) * R) // by_c[c][j][1] - OFF * R
                for j in range(dim)
            ]
            if c in by_c
            else cents[c]  # empty cluster keeps its previous centroid
            for c in range(k)
        ]
    return _assign(rows, cents).select(
        F.col("id").alias(id_col), "cluster", "dist2"
    )


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster size and normalized mean squared distance.  dist2 sums
    in decimal(38,0) (a BIGINT sum could overflow at 2.7e18 per row);
    the single cast-to-double + division at the end is display math."""
    denom = float(SCALE) * float(R)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum(F.col("dist2").cast("decimal(38,0)")).alias("ssq"),
        )
        .select(
            "cluster",
            "n_members",
            F.round(
                F.col("ssq").cast("double")
                / (F.col("n_members").cast("double") * F.lit(denom * denom)),
                6,
            ).alias("avg_dist2"),
        )
    )


def lloyd_state(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, list[list[int]]]:
    """`lloyd`'s loop, returning the quantized rows AND the final
    centroid grid — the round-14 clustering-validation family (silhouette
    / Davies-Bouldin / Calinski-Harabasz / Dunn) needs distances to EVERY
    centroid and the centroid vectors themselves, not just the argmin.

    Deliberately a sibling of `lloyd`, not a refactor of it: `lloyd`
    backs long-attested queries (kmeans_assign …) and stays byte-frozen;
    this function replays the identical arithmetic (same seed, grid,
    offset floor-division, empty-cluster rule), asserted equal by
    tests/test_eval_ops.py."""
    rows = df.select(
        F.col(id_col).alias("id"), quantize(vec_col).alias("xi")
    ).localCheckpoint(eager=True)
    seed = rows.orderBy("id").limit(k).collect()
    if not seed:
        raise ValueError("lloyd_state: empty input")
    cents = [[int(v) * R for v in r["xi"]] for r in seed]
    k = len(cents)
    for _ in range(iters):
        a = _assign(rows, cents)
        sums = (
            a.select("cluster", F.posexplode("xi").alias("j", "x"))
            .groupBy("cluster", "j")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_c.setdefault(r["cluster"], {})[r["j"]] = (r["s"], r["n"])
        cents = [
            [
                ((by_c[c][j][0] + OFF * by_c[c][j][1]) * R) // by_c[c][j][1] - OFF * R
                for j in range(dim)
            ]
            if c in by_c
            else cents[c]
            for c in range(k)
        ]
    return rows, cents


def assign_all(rows: DataFrame, cents: list[list[int]]) -> DataFrame:
    """rows(id, xi) → one row per (id, candidate cluster) with the exact
    BIGINT squared distance — the dense row×centroid distance frame the
    validation indices consume (the oracle's d{iters+1} CTE).  k·n rows:
    the fan-out is the bounded centroid count, never a self-join."""
    carr = F.array(
        *[
            F.struct(
                F.lit(ci).cast("int").alias("c"),
                F.array(*[F.lit(int(v)) for v in cv]).alias("ca"),
            )
            for ci, cv in enumerate(cents)
        ]
    )
    dists = F.transform(
        carr, lambda s: F.struct(s["c"].alias("c"), _dist2(s["ca"]).alias("d2"))
    )
    return rows.select("id", F.explode(dists).alias("dc")).select(
        "id", F.col("dc.c").alias("c"), F.col("dc.d2").alias("d2")
    )
