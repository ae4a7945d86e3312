"""Embedding quantization + semantic-dedup query family.

Three scale paths over the embeddings table, each with a bit-replayable
DuckDB oracle: 1-bit binary-quantized search (Hamming prefilter + exact
rerank), Matryoshka prefix-dimension two-stage search, and SemDedup
cluster-blocked semantic dedup (Abbas et al. 2023).  Probes follow the
FIXTURES.md determinism rule (first N corpus rows by vec_id); all floats
are DOUBLE and rounded to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import ann, dedup
from fusionspark.operators.knn import self_probes
from fusionspark.queries import query

_PROBES_CTE = """
probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_embedding
    FROM embeddings ORDER BY vec_id ASC LIMIT 5
)
"""

# packed 1-bit codes: two 32-bit halves so shifts never reach a signed
# 64-bit sign bit on either engine (ann.bq_encode packs identically)
_CODES_CTE = """
codes AS (
    SELECT vec_id,
           list_sum(list_transform(range(32),
               i -> CASE WHEN embedding[i + 1] > 0
                    THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS code_lo,
           list_sum(list_transform(range(32),
               i -> CASE WHEN embedding[i + 33] > 0
                    THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS code_hi
    FROM embeddings
)
"""


@query(
    "ann_bq",
    f"""
    WITH {_PROBES_CTE}, {_CODES_CTE},
    pcodes AS (
        SELECT p.probe_id, p.probe_embedding, c.code_lo AS plo, c.code_hi AS phi
        FROM probes p JOIN codes c ON c.vec_id = p.probe_id
    ),
    cands AS (
        SELECT probe_id, vec_id FROM (
            SELECT p.probe_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
                       bit_count(xor(c.code_lo, p.plo))
                       + bit_count(xor(c.code_hi, p.phi)) ASC,
                       c.vec_id ASC) AS rn
            FROM codes c CROSS JOIN pcodes p
        ) WHERE rn <= 40
    ),
    scored AS (
        SELECT cd.probe_id, cd.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[],
                                      p.probe_embedding::DOUBLE[]) AS sim
        FROM cands cd
        JOIN embeddings e ON e.vec_id = cd.vec_id
        JOIN probes p ON p.probe_id = cd.probe_id
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored QUALIFY rnk <= 10
    """,
)
def ann_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized search: 1-bit sign codes (32× smaller than
    float32), XOR+POPCNT Hamming top-40 candidate select, exact cosine
    rerank to top-10.  The candidate scan touches 16 bytes/row; full
    vectors are read for candidates only.  The oracle replays the packed
    codes, the Hamming cut, and the rerank bit-for-bit."""
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(corpus, 5)
    return ann.bq_knn(corpus, probes, k=10, m=40, dim=64)


@query(
    "ann_matryoshka",
    f"""
    WITH {_PROBES_CTE},
    cands AS (
        SELECT probe_id, vec_id FROM (
            SELECT p.probe_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
                       list_cosine_similarity(e.embedding[1:16]::DOUBLE[],
                                              p.probe_embedding[1:16]::DOUBLE[]) DESC,
                       e.vec_id ASC) AS rn
            FROM embeddings e CROSS JOIN probes p
        ) WHERE rn <= 50
    ),
    scored AS (
        SELECT cd.probe_id, cd.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[],
                                      p.probe_embedding::DOUBLE[]) AS sim
        FROM cands cd
        JOIN embeddings e ON e.vec_id = cd.vec_id
        JOIN probes p ON p.probe_id = cd.probe_id
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored QUALIFY rnk <= 10
    """,
)
def ann_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage search: coarse cosine on the first 16 dims
    (4× fewer mul-adds) cuts to top-50 per probe, full 64-dim rerank to
    top-10.  Same broadcast-probe plan family as ann_bq."""
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(corpus, 5)
    return ann.matryoshka_knn(corpus, probes, k=10, m=50, prefix_dim=16, dim=64)


@query(
    "semdedup",
    """
    WITH cent AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assigned AS (
        SELECT vec_id, embedding, centroid_id, ROUND(c_sim, 6) AS c_sim_r
        FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   list_cosine_similarity(e.embedding::DOUBLE[],
                                          c.centroid::DOUBLE[]) AS c_sim,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       list_cosine_similarity(e.embedding::DOUBLE[],
                                              c.centroid::DOUBLE[]) DESC,
                       c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.c_sim_r AS ca, b.c_sim_r AS cb
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.3
    ),
    removed AS (
        SELECT DISTINCT CASE WHEN cb >= ca THEN id_b ELSE id_a END AS vec_id
        FROM pairs
    )
    SELECT vec_id, c_sim_r, centroid_id
    FROM assigned
    WHERE vec_id NOT IN (SELECT vec_id FROM removed)
    """,
)
def semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup: IVF-cluster-blocked semantic dedup keeping the LEAST
    prototypical member of each duplicate pair (lowest centroid
    similarity — the paper's diversity-preserving keep rule; rounded-sim
    ties drop the higher id).  The oracle replays centroid assignment, the
    within-cluster pair cut, and the keep rule."""
    kept = dedup.semdedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.3,
        n_centroids=8,
    )
    return kept.select("vec_id", "c_sim_r", "centroid_id")


# ── resident serving index (operators/serving.py) ──
# Exact cosine top-k on the resident block cache: same result contract as
# knn_cosine (two physical plans, one oracle), but the corpus is persisted
# as per-partition numpy blocks and never re-ships JVM→Python per search —
# the serving-path peer of the reference's in-memory HNSW
# (src/core/HNSWIndex.js:126-320).
_RESIDENT_ORACLE = f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored
    QUALIFY rnk <= 10
    """


@query("ann_resident", _RESIDENT_ORACLE)
def ann_resident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN on the resident distributed block index: build persists
    (ids, pre-normalized float64 matrix) per partition once; a search is one
    GEMM + associative (distance, id) top-k merge with zero corpus
    serialization.  Result-identical to knn_cosine's expression plan at the
    6-decimal contract."""
    from fusionspark.operators.serving import ResidentIndex

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = ResidentIndex.build(e)
    try:
        out = idx.search(self_probes(e, 5), k=10)
    finally:
        idx.unpersist()
    return out.select(
        "probe_id",
        "vec_id",
        F.round("score", 6).alias("sim"),
        F.col("rank").cast("long").alias("rnk"),
    )


def _ann_ivf_oracle() -> str:
    from fusionspark.queries.pipeline_queries import ANN_IVF_ORACLE

    return ANN_IVF_ORACLE


@query("ann_ivf_resident", _ann_ivf_oracle())
def ann_ivf_resident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF on the resident list-grouped block cache: lists are
    hash-partitioned at build, probes route driver-side (same max-cosine /
    lowest-id rule as ivf_knn), and each partition GEMMs only its routed
    lists.  Same oracle as ann_ivf — a third physical plan that must agree
    row for row with the SQL routing/scoring replay."""
    from fusionspark.operators.serving import ResidentIVF

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rivf = ResidentIVF.build(e, n_centroids=8)
    try:
        out = rivf.search(self_probes(e, 5), k=10, n_probe=2)
    finally:
        rivf.unpersist()
    return out.select(
        "probe_id",
        "vec_id",
        F.round("score", 6).alias("sim"),
        F.col("rank").cast("long").alias("rnk"),
    )


@query(
    "ann_resident_filtered",
    f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id, e.label,
               list_cosine_similarity(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
        WHERE e.label IN (0, 2, 4, 6, 8)
    )
    SELECT probe_id, vec_id, label, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored
    QUALIFY rnk <= 10
    """,
)
def ann_resident_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 on the serving path: metadata pre-filter applied INSIDE each
    resident block before scoring (excluded rows never take a rank slot —
    same semantics as knn_filtered, same oracle shape), with the label
    column materialized into the blocks at build."""
    import numpy as np

    from fusionspark.operators.serving import ResidentIndex

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    idx = ResidentIndex.build(e, attr_cols=("label",))
    try:
        out = idx.search(
            self_probes(e, 5), k=10,
            pre_filter=lambda ids, attrs: np.isin(
                attrs["label"], [0, 2, 4, 6, 8]
            ),
        )
    finally:
        idx.unpersist()
    return (
        out.join(e.select("vec_id", "label"), "vec_id")
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round("score", 6).alias("sim"),
            F.col("rank").cast("long").alias("rnk"),
        )
    )
