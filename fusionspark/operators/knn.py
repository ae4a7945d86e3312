"""Top-k-per-probe vector search — the Spark-native replacement for the
reference's HNSW beam search (`/root/reference/src/core/HNSWIndex.js:245-320`).

HNSW is a sequential pointer-chasing graph; its *contract* is approximate
k-NN.  At Spark altitude the same contract is an exact top-k theta join:

    probes (small)  ×broadcast×  corpus (huge, Parquet)
        → score expression → per-probe top-k

Scale design (100 TB corpus, 1000 executors):
- probes are broadcast — the corpus NEVER shuffles for scoring;
- filters (tenant / metadata / TTL) are applied BEFORE scoring so they push
  down to the Parquet scan (the reference post-filters after candidate
  generation and can return < k rows — we do strictly better, SURVEY V7);
- scoring has three strategies:
    * expression (default): fixed-dimension unrolled multiply-adds —
      ordinary codegen'd expressions (higher-order functions are
      CodegenFallback and run ~100× slower interpreted).  Bit-identical to
      a sequential left-to-right loop → oracle-exact.
    * numpy: Arrow-batched mapInPandas doing a float64 GEMM
      (batch × probes) per partition plus the partition-local top-k —
      the high-throughput path for large probe batches.
    * window-only fallback for unknown dimension (HOF expression).
- top-k reduces in two phases: per-partition local top-k, then a global
  window over `partitions × probes × k` rows — the shuffle carries
  kilobytes, not the corpus;
- the IVF path (operators/ann.py) turns the full scan into an
  inverted-list pruned scan for 10-100× less IO at scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions import vector as V


def vector_dim(df: DataFrame, vector_col: str) -> int | None:
    """Dimension of the (fixed-width) vector column, from one row."""
    row = df.select(F.size(vector_col).alias("d")).first()
    return None if row is None else row["d"]


def id_sql_type(df: DataFrame, col: str) -> str:
    """Declared Arrow/SQL type for an id column — derived per side (a string
    probe_id with a bigint corpus id must not inherit the corpus type)."""
    dt = dict(df.dtypes)[col]
    if dt == "string":
        return "string"
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return "long"
    raise TypeError(f"unsupported id column type {dt!r} for {col!r}")


def score_probes(
    corpus: DataFrame,
    probes: DataFrame,
    metric: str = "cosine",
    vector_col: str = "embedding",
    probe_vector_col: str = "probe_embedding",
    pre_filter: Column | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Broadcast-join probes onto the corpus and compute distance + score.
    For cosine, per-side norms are computed once per row before the join."""
    if pre_filter is not None:
        corpus = corpus.filter(pre_filter)
    if dim is None:
        dim = vector_dim(corpus, vector_col)
    if metric == "cosine" and dim is not None:
        corpus = corpus.withColumn("_nrm", V.l2_norm(vector_col, dim))
        probes = probes.withColumn("_pnrm", V.l2_norm(probe_vector_col, dim))
        joined = corpus.crossJoin(F.broadcast(probes))
        denom = F.col("_nrm") * F.col("_pnrm")
        sim = F.when(
            denom > 0,
            V.dot_product(F.col(vector_col), F.col(probe_vector_col), dim) / denom,
        ).otherwise(F.lit(0.0))
        dist = F.lit(1.0) - sim
        return (
            joined.withColumn("distance", dist)
            .withColumn("score", F.lit(1.0) - F.col("distance"))
            .drop("_nrm", "_pnrm")
        )
    joined = corpus.crossJoin(F.broadcast(probes))
    dist = V.distance(metric, F.col(vector_col), F.col(probe_vector_col), dim)
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

    strategy: "window" (score expr + one window), "partitioned" (expr +
    per-partition top-k pre-reduction), "numpy" (GEMM scoring + local top-k
    in one Arrow pass — highest throughput for many probes).
    """
    if strategy == "numpy":
        scored = _numpy_score_topk(
            corpus, probes, k, metric, vector_col, probe_vector_col,
            probe_id_col, id_col, pre_filter,
        )
    else:
        scored = score_probes(
            corpus, probes, metric, vector_col, probe_vector_col, pre_filter
        )
        # drop the vector payloads before the top-k shuffle — the window
        # exchange should carry (ids, distance), not the embeddings
        scored = scored.select(probe_id_col, id_col, "distance", "score")
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


def _numpy_score_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    metric: str,
    vector_col: str,
    probe_vector_col: str,
    probe_id_col: str,
    id_col: str,
    pre_filter: Column | None,
) -> DataFrame:
    """Score + partition-local top-k in one Arrow pass: the probe matrix is
    tiny (collected to the driver, shipped in the task closure); each
    partition computes a float64 GEMM against its batch and keeps k rows per
    probe.  Output: partitions × probes × k rows for the global window."""
    if pre_filter is not None:
        corpus = corpus.filter(pre_filter)
    probe_rows = probes.select(probe_id_col, probe_vector_col).collect()
    probe_ids = [r[probe_id_col] for r in probe_rows]
    P = np.asarray([r[probe_vector_col] for r in probe_rows], dtype=np.float64)
    if metric == "cosine":
        pn = np.linalg.norm(P, axis=1)
        pn[pn == 0] = 1.0

    src = corpus.select(F.col(id_col), F.col(vector_col).alias("_v"))
    out_schema = (
        f"{probe_id_col} {id_sql_type(probes, probe_id_col)}, "
        f"{id_col} {id_sql_type(corpus, id_col)}, distance double, score double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts: list[pd.DataFrame] = []
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            if metric == "cosine":
                en = np.linalg.norm(E, axis=1)
                en[en == 0] = 1.0
                dist = 1.0 - (E @ P.T) / en[:, None] / pn[None, :]
            elif metric == "dot":
                dist = -(E @ P.T)
            else:  # euclidean
                e2 = (E * E).sum(axis=1)[:, None]
                p2 = (P * P).sum(axis=1)[None, :]
                dist = np.sqrt(np.maximum(e2 + p2 - 2.0 * (E @ P.T), 0.0))
            ids = pdf[id_col].to_numpy()
            kk = min(k, dist.shape[0])
            # vectorized per-probe top-k: one argpartition over the whole
            # (batch × probes) distance matrix.  Boundary ties then get the
            # documented (distance, id ASC) treatment: for the (rare)
            # probes where rows tied with the kth distance fall OUTSIDE
            # the cut, every tied row joins the candidate pool — the
            # sorted head(k) below resolves by id, so a larger id can
            # never displace a smaller one (a bare argpartition cut made
            # bench results differ run to run with duplicate vectors)
            idx = np.argpartition(dist, kk - 1, axis=0)[:kk]  # (kk, Q)
            dsel = np.take_along_axis(dist, idx, axis=0)
            flat = idx.ravel(order="F")
            d = dsel.ravel(order="F")
            sel_p = list(np.repeat(np.asarray(probe_ids), kk))
            sel_i = list(ids[flat])
            sel_d = list(d)
            if kk < dist.shape[0]:
                boundary = dsel.max(axis=0)
                n_tied_total = (dist == boundary[None, :]).sum(axis=0)
                n_tied_inside = (dsel == boundary[None, :]).sum(axis=0)
                for qi in np.flatnonzero(n_tied_total > n_tied_inside):
                    tied = np.flatnonzero(dist[:, qi] == boundary[qi])
                    extra = np.setdiff1d(tied, idx[:, qi])  # not already kept
                    sel_p.extend([probe_ids[qi]] * len(extra))
                    sel_i.extend(ids[extra])
                    sel_d.extend(dist[extra, qi])
            d = np.asarray(sel_d)
            parts.append(
                pd.DataFrame(
                    {
                        probe_id_col: sel_p,
                        id_col: sel_i,
                        "distance": d,
                        "score": 1.0 - d,
                    }
                )
            )
        if parts:
            merged = pd.concat(parts, ignore_index=True)
            yield (
                merged.sort_values(["distance", id_col])
                .groupby(probe_id_col, sort=False)
                .head(k)
            )

    return src.mapInPandas(run, schema=out_schema)


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
