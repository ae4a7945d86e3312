"""Vector-search operator family (SURVEY §2.3: V1-V7, S3-S5, P1-P2, F5).

Semantics from /root/reference/src/core/HNSWIndex.js:245-320 (search),
:443-479 (metrics).  Probes are the first N corpus rows by vec_id
(FIXTURES.md determinism rule); ties broken by vec_id ASC.
All floats computed in DOUBLE and rounded to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fusionspark.functions import vector as V
from fusionspark.io import load_table
from fusionspark.operators.knn import self_probes, vector_dim
from fusionspark.queries import query

N_PROBES = 5
TOP_K = 10

_PROBES_CTE = """
probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_embedding
    FROM embeddings ORDER BY vec_id ASC LIMIT 5
)
"""


def _knn_query(spark: SparkSession, sf_dir: str, sim_col, asc: bool) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    dim = vector_dim(corpus, "embedding")
    probes = self_probes(corpus, N_PROBES)
    scored = corpus.crossJoin(F.broadcast(probes)).withColumn(
        "sim", sim_col(F.col("embedding"), F.col("probe_embedding"), dim)
    )
    order = F.col("sim").asc() if asc else F.col("sim").desc()
    w = Window.partitionBy("probe_id").orderBy(order, F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "probe_id",
            "vec_id",
            F.round(F.col("sim"), 6).alias("sim"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@query(
    "knn_cosine",
    f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored
    QUALIFY rnk <= {TOP_K}
    """,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1+V2: exact cosine top-k per probe (HNSWIndex.js:245-320,443-450)."""
    return _knn_query(spark, sf_dir, V.cosine_similarity, asc=False)


@query(
    "knn_euclidean",
    f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id,
               list_distance(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim ASC, vec_id ASC) AS rnk
    FROM scored
    QUALIFY rnk <= {TOP_K}
    """,
)
def knn_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1+V3: exact euclidean top-k per probe (HNSWIndex.js:452-459)."""
    return _knn_query(spark, sf_dir, V.euclidean_distance, asc=True)


@query(
    "knn_dot",
    f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id,
               list_inner_product(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored
    QUALIFY rnk <= {TOP_K}
    """,
)
def knn_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1+V4: exact dot-product top-k per probe (HNSWIndex.js:461-466)."""
    return _knn_query(spark, sf_dir, V.dot_product, asc=False)


@query(
    "vector_normalize",
    """
    SELECT vec_id,
           ROUND(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')), 6) AS norm,
           ROUND(embedding[1]::DOUBLE / sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')), 6) AS n0
    FROM embeddings
    """,
)
def vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5: L2 normalization (HNSWIndex.js:472-479) — returns the norm and the
    first normalized component per vector (array equality is float-fragile,
    scalars hash cleanly)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(V.l2_norm("embedding"), 6).alias("norm"),
        F.round(F.element_at(V.l2_normalize("embedding"), 1), 6).alias("n0"),
    )


@query(
    "filter_eq",
    "SELECT vec_id, label FROM embeddings WHERE label = 3",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: metadata equality filter (HNSWIndex.js:283-292) — pushed to the
    Parquet scan, unlike the reference's post-search filter."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("label") == 3).select("vec_id", "label")


@query(
    "filter_in",
    "SELECT vec_id, label FROM embeddings WHERE label IN (1, 4, 7)",
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: IN-list filter (HNSWIndex.js:288)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("label").isin(1, 4, 7)).select("vec_id", "label")


@query(
    "knn_filtered",
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
    QUALIFY rnk <= {TOP_K}
    """,
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7: filtered k-NN.  The reference filters AFTER HNSW candidate
    generation (HNSWIndex.js:273-301) and may return < k rows; we filter
    BEFORE scoring (pushdown) and always return k — strictly better recall,
    semantic delta documented in SURVEY V7."""
    corpus = load_table(spark, sf_dir, "embeddings")
    dim = vector_dim(corpus, "embedding")
    probes = self_probes(corpus, N_PROBES)
    scored = (
        corpus.filter(F.col("label").isin(0, 2, 4, 6, 8))
        .crossJoin(F.broadcast(probes))
        .withColumn("sim", V.cosine_similarity(F.col("embedding"), F.col("probe_embedding"), dim))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("probe_id", "vec_id", "label", F.round("sim", 6).alias("sim"), F.col("rnk").cast("long").alias("rnk"))
    )


@query(
    "point_lookup",
    "SELECT vec_id, label, ROUND(embedding[1]::DOUBLE, 6) AS e0 FROM embeddings WHERE vec_id = 42",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: get-by-id (FusionEngine.js:225-228)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") == 42).select(
        "vec_id", "label", F.round(F.element_at(F.col("embedding").cast("array<double>"), 1), 6).alias("e0")
    )


@query(
    "collection_stats",
    """
    SELECT COUNT(*)::BIGINT AS n_vectors,
           COUNT(DISTINCT label)::BIGINT AS n_labels,
           MIN(len(embedding))::BIGINT AS dim_min,
           MAX(len(embedding))::BIGINT AS dim_max
    FROM embeddings
    """,
)
def collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6: size + stats counters (HNSWIndex.js:372-384) — also the
    dimension-consistency check the reference enforces at insert."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
        F.min(F.size("embedding")).cast("long").alias("dim_min"),
        F.max(F.size("embedding")).cast("long").alias("dim_max"),
    )


@query(
    "delete_by_id",
    """
    SELECT COUNT(*)::BIGINT AS remaining
    FROM embeddings
    WHERE vec_id NOT IN (1, 2, 3)
    """,
)
def delete_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: delete-by-id materialized as an anti-join (the Delta DELETE
    equivalent; FusionEngine.js:236-241)."""
    e = load_table(spark, sf_dir, "embeddings")
    ids = spark.createDataFrame([(1,), (2,), (3,)], "vec_id: long")
    return e.join(F.broadcast(ids), "vec_id", "left_anti").agg(F.count("*").alias("remaining"))


EF_SEARCH = 50  # reference default candidate-list size (HNSWIndex.js:64)
# the reference widens the candidate list when topK exceeds efSearch:
# ef = Math.max(efSearch, topK) (HNSWIndex.js) — replicated in BOTH engines
EF_POSTFILTER = max(EF_SEARCH, TOP_K)


@query(
    "knn_postfilter",
    f"""
    WITH {_PROBES_CTE},
    scored AS (
        SELECT p.probe_id, e.vec_id, e.label,
               list_cosine_similarity(e.embedding::DOUBLE[], p.probe_embedding::DOUBLE[]) AS sim
        FROM embeddings e CROSS JOIN probes p
    ),
    cand AS (
        SELECT * FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC)
                <= {EF_POSTFILTER}
    )
    SELECT probe_id, vec_id, label, ROUND(sim, 6) AS sim,
           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM cand
    WHERE label IN (0, 2, 4, 6, 8)
    QUALIFY rnk <= {TOP_K}
    """,
)
def knn_postfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 post-filter parity: the reference's EXACT filtered-search contract
    (HNSWIndex.js:273-301) — candidates are the top ef = max(efSearch=50,
    topK) by similarity, the metadata filter is applied AFTER candidate
    generation, and the result is the first topK survivors, which may be
    FEWER than topK when the filter is selective (reference test
    test/fusionpact.test.js:49-66 exercises this shape).  `knn_filtered`
    remains the better-recall pre-filter form; this entry closes the last
    semantic divergence a user porting off the reference would hit.
    Scale: same per-probe TakeOrdered window as knn_cosine (ef rows per
    probe cross partitions), filter is a cheap post-projection."""
    corpus = load_table(spark, sf_dir, "embeddings")
    dim = vector_dim(corpus, "embedding")
    probes = self_probes(corpus, N_PROBES)
    scored = corpus.crossJoin(F.broadcast(probes)).withColumn(
        "sim", V.cosine_similarity(F.col("embedding"), F.col("probe_embedding"), dim)
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    cand = scored.withColumn("rnk_ef", F.row_number().over(w)).filter(
        F.col("rnk_ef") <= EF_POSTFILTER
    )
    survivors = cand.filter(F.col("label").isin(0, 2, 4, 6, 8))
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round("sim", 6).alias("sim"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_CH_BINS = 20


@query(
    "cosine_histogram",
    f"""
    WITH nn AS (SELECT COUNT(*)::BIGINT AS n FROM embeddings),
    pairs AS (
        SELECT a.embedding::DOUBLE[] AS va, b.embedding::DOUBLE[] AS vb
        FROM embeddings a
        JOIN embeddings b ON b.vec_id = a.vec_id + (SELECT n // 2 FROM nn)
        WHERE a.vec_id < (SELECT n // 2 FROM nn)
    ),
    sims AS (
        SELECT list_reduce(list_prepend([0.0],
                   list_transform(generate_series(1, len(va)),
                                  i -> [va[i] * vb[i]])),
                   (acc, e) -> [acc[1] + e[1]])[1]
               / (sqrt(list_reduce(list_prepend([0.0],
                      list_transform(generate_series(1, len(va)),
                                     i -> [va[i] * va[i]])),
                      (acc, e) -> [acc[1] + e[1]])[1])
                  * sqrt(list_reduce(list_prepend([0.0],
                        list_transform(generate_series(1, len(vb)),
                                       i -> [vb[i] * vb[i]])),
                        (acc, e) -> [acc[1] + e[1]])[1])) AS sim
        FROM pairs
    )
    SELECT least({_CH_BINS - 1},
                 (CAST(ROUND(sim * 1000000) AS BIGINT) + 1000000)
                 // 100000)::BIGINT AS bin,
           ROUND((least({_CH_BINS - 1},
                        (CAST(ROUND(sim * 1000000) AS BIGINT) + 1000000)
                        // 100000) - 10)::DOUBLE / 10, 6) AS bin_lo,
           COUNT(*)::BIGINT AS n_pairs
    FROM sims GROUP BY 1, 2 ORDER BY bin
    """,
)
def cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of pairwise cosine similarity over n/2 deterministic
    embedding pairs (vec i vs vec i + n/2) — the hubness/anisotropy
    screen an ANN deployment runs before trusting recall numbers: a
    distribution piled near 1 means the space is anisotropic (every
    vector looks like every other — contrastive-embedding collapse) and
    banded LSH thresholds need re-tuning; a healthy spread validates the
    cosine contract knn/IVF assume.

    Parity: dot products and norms fold in INDEX ORDER on both engines
    (zip-multiply then ordered fold — never a shuffle-order float sum),
    so each sim is bit-identical; binning is exact integer arithmetic on
    ROUND(sim*1e6) (micro-units — the weighted_sample discipline: never
    cut on a raw double), 20 bins over [-1, 1].

    Scale: an id-keyed pair join (no all-pairs), one fold per pair, one
    groupBy(bin) with map-side combine — linear in the sample size, and
    the sample is id-derived so any corpus slice reproduces it."""
    e = load_table(spark, sf_dir, "embeddings")
    nn = e.agg(F.count("*").cast("long").alias("n"))
    ecast = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).crossJoin(F.broadcast(nn))
    a = ecast.filter(F.col("vec_id") < F.floor(F.col("n") / 2)).select(
        F.col("v").alias("va"),
        (F.col("vec_id") + F.floor(F.col("n") / 2)).alias("bk"),
    )
    b = ecast.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("bk") == F.col("b_id"))

    def fold_dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    sim = fold_dot(F.col("va"), F.col("vb")) / (
        F.sqrt(fold_dot(F.col("va"), F.col("va")))
        * F.sqrt(fold_dot(F.col("vb"), F.col("vb")))
    )
    sims = pairs.select(sim.alias("sim"))
    bin_ = F.least(
        F.lit(_CH_BINS - 1),
        F.floor(
            (F.round(F.col("sim") * 1000000).cast("long") + 1000000) / 100000
        ),
    ).cast("long")
    return (
        sims.select(
            bin_.alias("bin"),
            F.round((bin_ - 10).cast("double") / 10, 6).alias("bin_lo"),
        )
        .groupBy("bin", "bin_lo")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("bin")
    )
