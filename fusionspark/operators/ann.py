"""Approximate nearest-neighbor search — the scale path for V1.

The reference's HNSW graph (/root/reference/src/core/HNSWIndex.js) is a
single-machine pointer structure; the Spark-native equivalent at 100 TB is
IVF partition pruning:

  build:  choose centroids → assign every vector to its nearest centroid →
          write the corpus partitioned/bucketed by centroid_id
  search: score probe × centroids (tiny broadcast), keep nProbe best lists,
          scan ONLY those partitions (Catalyst partition pruning on
          `centroid_id IN (...)`), exact re-rank inside

Recall < 1 exactly like HNSW; brute-force knn (operators/knn.py) remains the
ground truth.  Centroid choice here is deterministic (first k by id —
reproducible across engines for the oracle); swap in MLlib KMeans at scale
for better cluster geometry, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions import vector as V


def deterministic_centroids(
    corpus: DataFrame, k: int, id_col: str = "vec_id", vector_col: str = "embedding"
) -> DataFrame:
    """First k vectors by id as centroids (deterministic; oracle-replicable)."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vector_col).alias("centroid"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (ties → lower
    centroid_id).  Broadcast the centroids; the corpus never shuffles."""
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "c_sim", V.cosine_similarity(F.col(vector_col), F.col("centroid"), dim)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("c_rn", F.row_number().over(w))
        .filter(F.col("c_rn") == 1)
        .drop("c_rn", "centroid")
    )


def ivf_knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vector_col: str = "probe_embedding",
) -> DataFrame:
    """IVF top-k: per probe, search only the n_probe closest inverted lists.

    Returns (probe_id, vec_id, sim, rnk).  With the corpus persisted
    partitioned-by-centroid this becomes a pruned scan; here the pruning is
    the `probe_lists` semi-join.
    """
    from fusionspark.operators.knn import vector_dim

    dim = vector_dim(corpus, vector_col)
    centroids = deterministic_centroids(corpus, n_centroids, id_col, vector_col)
    assigned = ivf_assign(corpus, centroids, id_col, vector_col, dim)

    # which lists each probe searches
    pc = probes.crossJoin(F.broadcast(centroids)).withColumn(
        "p_sim", V.cosine_similarity(F.col(probe_vector_col), F.col("centroid"), dim)
    )
    wp = Window.partitionBy(probe_id_col).orderBy(
        F.col("p_sim").desc(), F.col("centroid_id").asc()
    )
    probe_lists = (
        pc.withColumn("p_rn", F.row_number().over(wp))
        .filter(F.col("p_rn") <= n_probe)
        .select(probe_id_col, probe_vector_col, "centroid_id")
    )

    # exact re-rank inside the selected lists only
    cand = assigned.join(F.broadcast(probe_lists), "centroid_id")
    scored = cand.withColumn(
        "sim", V.cosine_similarity(F.col(vector_col), F.col(probe_vector_col), dim)
    )
    wk = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(probe_id_col, id_col, "sim", "rnk")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """MLlib-trained centroids for IVF (better cluster geometry than the
    deterministic first-k choice; the north-star's 'MLlib for embeddings'
    scale path).  Seeded, so reproducible within a Spark version — but NOT
    oracle-replicable, so query-gate code keeps deterministic_centroids.

    Returns the same (centroid_id, centroid) shape, so it drops into
    ivf_assign / ivf_knn unchanged.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col), array_to_vector(F.col(vector_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=10).fit(feats)
    spark = corpus.sparkSession
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        centers, "centroid_id: bigint, centroid: array<float>"
    )


def ivf_knn_kmeans(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    **kwargs,
) -> DataFrame:
    """IVF search over KMeans-trained lists (same plan as ivf_knn with a
    learned codebook)."""
    id_col = kwargs.get("id_col", "vec_id")
    vector_col = kwargs.get("vector_col", "embedding")
    probe_id_col = kwargs.get("probe_id_col", "probe_id")
    probe_vector_col = kwargs.get("probe_vector_col", "probe_embedding")
    from fusionspark.operators.knn import vector_dim

    dim = vector_dim(corpus, vector_col)
    centroids = kmeans_centroids(corpus, n_centroids, seed, id_col, vector_col)
    assigned = ivf_assign(corpus, centroids, id_col, vector_col, dim)
    pc = probes.crossJoin(F.broadcast(centroids)).withColumn(
        "p_sim", V.cosine_similarity(F.col(probe_vector_col), F.col("centroid"), dim)
    )
    wp = Window.partitionBy(probe_id_col).orderBy(
        F.col("p_sim").desc(), F.col("centroid_id").asc()
    )
    probe_lists = (
        pc.withColumn("p_rn", F.row_number().over(wp))
        .filter(F.col("p_rn") <= n_probe)
        .select(probe_id_col, probe_vector_col, "centroid_id")
    )
    cand = assigned.join(F.broadcast(probe_lists), "centroid_id")
    scored = cand.withColumn(
        "sim", V.cosine_similarity(F.col(vector_col), F.col(probe_vector_col), dim)
    )
    wk = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(probe_id_col, id_col, "sim", "rnk")
    )
