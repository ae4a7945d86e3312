"""Top-k-per-probe vector search — the Spark-native replacement for the
reference's HNSW beam search (`/root/reference/src/core/HNSWIndex.js:245-320`).

HNSW is a sequential pointer-chasing graph; its *contract* is approximate
k-NN.  At Spark altitude the same contract is an exact top-k theta join:

    probes (small)  ×broadcast×  corpus (huge, Parquet)
        → score expression (JVM codegen, no Python)
        → per-probe top-k

Scale design (100 TB corpus, 1000 executors):
- probes are broadcast — the corpus NEVER shuffles for scoring;
- filters (tenant / metadata / TTL) are applied BEFORE scoring so they push
  down to the Parquet scan (the reference post-filters after candidate
  generation and can return < k rows — we do strictly better, SURVEY V7);
- top-k uses a two-phase reduction: a per-Spark-partition local top-k
  (mapInPandas over Arrow batches, numpy argpartition) followed by a global
  window over only `num_partitions × Q × k` rows — the shuffle carries
  kilobytes, not the corpus. `strategy="window"` keeps the single-shuffle
  window plan for small inputs / oracle checks (identical results).
- the IVF path (`ivf_assign` + probe pruning) turns the full scan into a
  `centroid IN (...)` partition-pruned scan for 10-100× less IO at scale.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions import vector as V


def score_probes(
    corpus: DataFrame,
    probes: DataFrame,
    metric: str = "cosine",
    vector_col: str = "embedding",
    probe_vector_col: str = "probe_embedding",
    pre_filter: Column | None = None,
) -> DataFrame:
    """Broadcast-join probes onto the corpus and compute distance + score."""
    if pre_filter is not None:
        corpus = corpus.filter(pre_filter)
    joined = corpus.crossJoin(F.broadcast(probes))
    dist = V.distance(metric, F.col(vector_col), F.col(probe_vector_col))
    return joined.withColumn("distance", dist).withColumn(
        "score", V.score_from_distance(metric, F.col("distance"))
    )


def knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    vector_col: str = "embedding",
    probe_vector_col: str = "probe_embedding",
    probe_id_col: str = "probe_id",
    id_col: str = "vec_id",
    pre_filter: Column | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Exact k-NN for every probe row.

    Returns (probe_id, <id_col>, distance, score, rank) with rank 1..k per
    probe, ties broken by id ASC for determinism (FIXTURES.md rule).
    """
    scored = score_probes(corpus, probes, metric, vector_col, probe_vector_col, pre_filter)
    if strategy == "partitioned":
        scored = _local_topk(scored, k, probe_id_col, id_col)
    w = Window.partitionBy(probe_id_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "distance", "score", "rank")
    )


def _local_topk(scored: DataFrame, k: int, probe_id_col: str, id_col: str) -> DataFrame:
    """Per-partition top-k pre-reduction: shrinks the window-shuffle input
    from |corpus|×|probes| rows to num_partitions×|probes|×k rows."""
    out_schema = scored.select(probe_id_col, id_col, "distance", "score").schema

    def reduce_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: list[pd.DataFrame] = []
        for pdf in batches:
            acc.append(
                pdf.sort_values(["distance", id_col])
                .groupby(probe_id_col, sort=False)
                .head(k)[[probe_id_col, id_col, "distance", "score"]]
            )
        if acc:
            merged = pd.concat(acc, ignore_index=True)
            yield (
                merged.sort_values(["distance", id_col])
                .groupby(probe_id_col, sort=False)
                .head(k)
            )

    return scored.mapInPandas(reduce_partition, schema=out_schema)


def self_probes(
    corpus: DataFrame,
    n_probes: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Deterministic probe set: first `n_probes` corpus rows by id
    (FIXTURES.md: probes come from the table itself)."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_probes)
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vector_col).alias("probe_embedding"),
        )
    )
