"""k-means query family (operators/clustering.py): Lloyd iterations with
every float removed from the loop — integer-grid vectors, floor-division
centroids on a ×1024 refined grid, exact BIGINT distances, (dist, c)
struct-min ties.  The DuckDB oracles replay the identical rounds as
MATERIALIZED CTEs (same exponential-inlining lesson as the PCA oracle),
so cluster assignments hash-match bit-for-bit, something float k-means
can never attest cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import clustering
from fusionspark.queries import query

_K = 8
_ITERS = 3

_X = """
    x AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                              e -> FLOOR(CAST(e AS DOUBLE) * 100000.0)::BIGINT) AS xi
        FROM embeddings
    ),
    dims AS (SELECT unnest(range(64))::INT AS d),
    cent0 AS MATERIALIZED (
        SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS c,
               list_transform(xi, v -> v * 1024) AS ca
        FROM (SELECT vec_id, xi FROM x ORDER BY vec_id LIMIT 8)
    )
"""


def _round_ctes(t: int, with_update: bool) -> str:
    """One Lloyd round: exact-int distances vs cent{t-1}, (d2, c) argmin,
    then (unless final) integer sums and the offset floor-division update;
    empty clusters COALESCE back to their previous centroid."""
    out = f"""d{t} AS MATERIALIZED (
        SELECT x.vec_id, ct.c,
               list_reduce(list_transform(range(64),
                   i -> (x.xi[i + 1] * 1024 - ct.ca[i + 1])
                        * (x.xi[i + 1] * 1024 - ct.ca[i + 1])),
                   (a, b) -> a + b) AS d2
        FROM x, cent{t - 1} ct
    ),
    a{t} AS MATERIALIZED (
        SELECT vec_id, c, d2 FROM (
            SELECT vec_id, c, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
            FROM d{t}
        ) WHERE rn = 1
    )"""
    if with_update:
        out += f""",
    s{t} AS MATERIALIZED (
        SELECT a.c, dd.d AS j, SUM(x.xi[dd.d + 1])::BIGINT AS s,
               COUNT(*)::BIGINT AS n
        FROM a{t} a JOIN x USING (vec_id), dims dd GROUP BY a.c, dd.d
    ),
    cent{t} AS MATERIALIZED (
        SELECT p.c, COALESCE(u.ca, p.ca) AS ca
        FROM cent{t - 1} p LEFT JOIN (
            SELECT c, list(((s + 1000000 * n) * 1024) // n - 1024000000
                           ORDER BY j) AS ca
            FROM s{t} GROUP BY c
        ) u USING (c)
    )"""
    return out


_CHAIN = (
    _X
    + ",\n    "
    + ",\n    ".join(_round_ctes(t, with_update=True) for t in range(1, _ITERS + 1))
    + ",\n    "
    + _round_ctes(_ITERS + 1, with_update=False)
)
_FINAL = f"a{_ITERS + 1}"


@query(
    "kmeans_assign",
    f"""
    WITH {_CHAIN}
    SELECT vec_id, c::INT AS cluster, d2 AS dist2 FROM {_FINAL}
    """,
)
def kmeans_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's cluster after 3 exact-integer Lloyd rounds from the
    deterministic seed (k smallest ids).  Scale: per round one
    whole-stage-codegen pass (the 8×64-long centroid literal ships in the
    plan, zero shuffle) + a (k·d)-row integer groupBy; the k·d driver
    collect per round is the bounded NB-weights contract."""
    return clustering.lloyd(
        load_table(spark, sf_dir, "embeddings"), k=_K, iters=_ITERS
    )


@query(
    "kmeans_clusters",
    f"""
    WITH {_CHAIN}
    SELECT c::INT AS cluster, COUNT(*)::BIGINT AS n_members,
           ROUND(CAST(SUM(d2) AS DOUBLE)
                 / (COUNT(*)::DOUBLE * 1.048576e16),
                 6) AS avg_dist2
    FROM {_FINAL} GROUP BY c
    """,
)
def kmeans_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sizes + normalized mean squared distance under the final
    centroids (decimal(38) sum — a BIGINT sum could overflow; one
    cast-to-double division at display)."""
    return clustering.cluster_profile(
        clustering.lloyd(load_table(spark, sf_dir, "embeddings"), k=_K, iters=_ITERS)
    )


@query(
    "cluster_balanced_sample",
    f"""
    WITH {_CHAIN},
    ranked AS (
        SELECT c, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY c
                   ORDER BY md5('cbs:' || vec_id::VARCHAR), vec_id
               ) AS rn
        FROM {_FINAL}
    )
    SELECT c::INT AS cluster, vec_id FROM ranked WHERE rn <= 30
    """,
)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-balanced sampling: 30 vectors per exact-k-means cluster,
    cut by the md5-coin rank inside each cluster (stratified_sample's
    contract, with strata DISCOVERED by clustering instead of given by a
    column) — the anti-mode-collapse subcorpus cut.  One window shuffle
    on the cluster key after the Lloyd rounds."""
    from pyspark.sql.window import Window

    assigned = clustering.lloyd(
        load_table(spark, sf_dir, "embeddings"), k=_K, iters=_ITERS
    )
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.concat(F.lit("cbs:"), F.col("vec_id").cast("string"))), "vec_id"
    )
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("cluster", "vec_id")
    )
