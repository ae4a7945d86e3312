"""Link-graph operators: PageRank for host/document quality weighting.

Not in the reference (north-star addition): crawl pipelines weight corpora
by host/document centrality (Common Crawl publishes host-level ranks;
quality-mixing stages consume them).  The implementation is the classic
synchronous PageRank as iterated DataFrame joins — the Pregel shape
expressed declaratively so Catalyst/AQE handle the shuffles:

    contrib(v) = Σ_{u→v} rank(u) / outdeg(u)
    rank'(v)   = (1 − d)/N + d · contrib(v)

Scale shape: each iteration is one equi-join (edges ⋈ ranks on src — the
edge table can be pre-partitioned/bucketed by src so the join is
co-located) plus one groupBy(dst) aggregation with map-side partial sums.
Iterations are a fixed small count (rank deltas decay geometrically by the
damping factor); lineage stays shallow, no checkpoint needed.  Dangling
nodes (outdeg 0) simply contribute nothing — their mass is the standard
"lost mass" variant, consistent on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
) -> DataFrame:
    """Synchronous PageRank; `nodes` has column `id_col`, `edges` has
    (src, dst).  Returns (id, rank) after `iters` iterations from the
    uniform start 1/N."""
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")
    base = (1.0 - damping) / n

    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    # contribution weight per edge is rank(src)/od(src); precompute od once
    ed = edges.join(outdeg, "src")

    ranks = nodes.select(F.col(id_col).alias("id"), F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contribs, F.col("id") == contribs["dst"], "left")
            .select(
                "id",
                (F.lit(base) + damping * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
        )
    return ranks
