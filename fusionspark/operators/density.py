"""Density clustering (DBSCAN, Ester et al. 1996) on grid-blocked
eps-neighbor graphs — the mining family's density member beside the
centroid (k-means) and connectivity (connected components / LPA)
clusterers.

DBSCAN decomposed into the three relational primitives the engine
already owns:
1. the eps-neighbor edge set = a grid-blocked proximity self-join
   (radius-sized cells, 3×3 replication, exact INTEGER d² filter — the
   geo_neighbors plan; never a cross join);
2. core points = one degree aggregate (deg ≥ min_pts neighbors within
   eps, self excluded — a point plus min_pts neighbors forms a core);
3. clusters = connected components over CORE-CORE edges (min-label
   propagation, dedup.connected_components — converges in cluster
   diameter rounds), then border points attach to the MINIMUM adjacent
   core's cluster (deterministic, where textbook DBSCAN's border
   assignment is scan-order-dependent), everything else is noise.

The decomposition is exactly the parallel-DBSCAN literature's (e.g.
MR-DBSCAN): the only corpus-sized shuffles are the blocked join and the
degree groupBy; the CC iteration runs on core-incident edges only.
Determinism everywhere — integer coordinates, integer d², min-label,
min-cluster border ties — makes the whole clustering SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eps_neighbor_pairs(
    points: DataFrame,
    d2_max: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All pairs with squared Euclidean distance ≤ d2_max — the shared
    grid-blocked plan (joins.grid_proximity_join) with the blocking cell
    isqrt(d2_max)+1 ≥ eps, so every qualifying pair shares one of the 9
    replicated cell keys; the cell affects candidates only — the
    d² ≤ d2_max filter is exact integer arithmetic, so the PAIR SET is
    cell-size-independent (and the oracle replays a plain unblocked
    join)."""
    from math import isqrt

    from fusionspark.operators.joins import grid_proximity_join

    cell = isqrt(int(d2_max)) + 1
    return grid_proximity_join(
        points, radius=cell, id_col=id_col, x_col=x_col, y_col=y_col,
        d2_max=int(d2_max),
    )


def dbscan(
    points: DataFrame,
    d2_max: int,
    min_pts: int = 3,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """DBSCAN over integer plane coordinates: returns
    (id, role∈{core,border,noise}, cluster) where cluster is the minimum
    core id reachable through core-core eps-edges (NULL for noise).
    min_pts counts neighbors within eps EXCLUDING the point itself."""
    from fusionspark.operators.dedup import connected_components

    pairs = eps_neighbor_pairs(points, d2_max, id_col, x_col, y_col)
    sym = pairs.select(
        F.col("id_a").alias("s"), F.col("id_b").alias("d")
    ).union(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
    sym = sym.localCheckpoint(eager=True)  # pairs feed degree AND closure
    deg = sym.groupBy("s").agg(F.count("*").cast("long").alias("n"))
    cores = deg.filter(F.col("n") >= min_pts).select(F.col("s").alias("id"))
    core_edges = (
        pairs.join(cores.select(F.col("id").alias("id_a")), "id_a")
        .join(cores.select(F.col("id").alias("id_b")), "id_b")
        .select("id_a", "id_b")
    )
    # 'star' (large-star/small-star, O(log² n) rounds on ANY graph): an
    # eps-graph near the percolation density CHAINS — its diameter grows
    # with the cluster, so min-label's diameter-many rounds don't
    # converge (observed at sf0.1: the adaptive-eps core graph formed one
    # giant component deeper than 25 hops)
    clab = connected_components(
        core_edges, cores, id_col="id", algorithm="star"
    ).select(F.col("id"), F.col("component").alias("cluster"))
    border = (
        sym.join(clab.select(F.col("id").alias("d"), "cluster"), "d")
        .join(cores.select(F.col("id").alias("s")), "s", "left_anti")
        .groupBy("s")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("s").alias("id"), "cluster")
    )
    return (
        points.select(F.col(id_col).alias("id"))
        .join(clab.withColumnRenamed("cluster", "c_core"), "id", "left")
        .join(border.withColumnRenamed("cluster", "c_border"), "id", "left")
        .select(
            "id",
            F.when(F.col("c_core").isNotNull(), "core")
            .when(F.col("c_border").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("c_core", "c_border").cast("long").alias("cluster"),
        )
    )
