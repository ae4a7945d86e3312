"""URL family queries (north-star crawl-pipeline additions): the synthetic
URL is a closed-form function of (doc_id, source), dirty on purpose
(uppercase scheme/WWW, default port, utm_ params, fragment), and the
DuckDB oracle replays the CANONICAL result arithmetically — so a hash
match proves the Spark regexp chain implements the canonicalization law
exactly, not merely that two copies of the same regex agree."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import urls
from fusionspark.operators.dedup import md5_hash32
from fusionspark.queries import query

# dirty synthetic URL, mirrored in _DIRTY_URL_SQL below
_DIRTY_URL_SQL = """
urls AS (
    SELECT doc_id, source,
           'HTTPS://' || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
           || source || '.example.com'
           || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
           || '/docs/' || (doc_id % 97)::VARCHAR
           || CASE doc_id % 3
                WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 50)::VARCHAR
                            || '&utm_campaign=x'
                WHEN 1 THEN '?id=' || (doc_id % 50)::VARCHAR
                ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
    FROM documents
)
"""


def _dirty_url() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://"),
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.com"),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"), (d % 97).cast("string"),
        F.when(d % 3 == 0, F.concat(F.lit("?utm_source=feed&id="),
                                    (d % 50).cast("string"),
                                    F.lit("&utm_campaign=x")))
        .when(d % 3 == 1, F.concat(F.lit("?id="), (d % 50).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@query(
    "url_canonical",
    f"WITH {_DIRTY_URL_SQL.strip()}\n"
    """
    SELECT doc_id, url,
           'https://' || source || '.example.com/docs/' || (doc_id % 97)::VARCHAR
           || CASE WHEN doc_id % 3 IN (0, 1)
                   THEN '?id=' || (doc_id % 50)::VARCHAR ELSE '' END AS canon_url,
           source || '.example.com' AS host,
           'example.com' AS domain,
           'https' AS scheme
    FROM urls
    """,
)
def url_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/urls.py): lowercase scheme/host,
    strip www. and default ports, drop fragments and utm_ tracking params.
    Pure column expressions — JVM codegen, zero shuffle; the oracle checks
    the law's closed form, not the regex chain."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    df = docs.withColumn("url", _dirty_url())
    return df.select(
        "doc_id", "url",
        urls.canonicalize("url").alias("canon_url"),
        urls.url_host("url").alias("host"),
        urls.registered_domain(urls.url_host("url")).alias("domain"),
        urls.url_scheme("url").alias("scheme"),
    )


@query(
    "url_host_stats",
    f"WITH {_DIRTY_URL_SQL.strip()},\n"
    """
    canon AS (
        SELECT doc_id, source || '.example.com' AS host,
               'https://' || source || '.example.com/docs/' || (doc_id % 97)::VARCHAR
               || CASE WHEN doc_id % 3 IN (0, 1)
                       THEN '?id=' || (doc_id % 50)::VARCHAR ELSE '' END AS canon_url
        FROM urls
    )
    SELECT host,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT canon_url)::BIGINT AS n_urls,
           (('0x' || substr(md5(host), 1, 8))::BIGINT % 10 = 0) AS blocked
    FROM canon GROUP BY host
    """,
)
def url_host_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl stats + deterministic blocklist tag (md5-keyed, the
    portable stand-in for a broadcast blocklist join).  One shuffle on the
    canonical host — the partitioning a domain-mixing stage reuses."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    df = docs.withColumn("url", _dirty_url())
    canon = df.select(
        urls.url_host("url").alias("host"),
        urls.canonicalize("url").alias("canon_url"),
    )
    return canon.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("canon_url").alias("n_urls"),
    ).withColumn("blocked", (md5_hash32(F.col("host")) % 10) == 0)
