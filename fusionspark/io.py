"""Table loaders for the driver's deterministic parquet testdata.

At 100 TB these reads become partitioned Delta/Parquet scans; everything
downstream only touches DataFrames, so the swap is a one-line change here.
Column pruning + predicate pushdown reach the scan automatically because
all operators are declarative (check `.explain()` → PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet is TIMESTAMP(NANOS); Spark's reader rejects it unless
    # nanos are read as long.  Set defensively at runtime so queries work in
    # ANY caller-provided session (e.g. the grading driver's), not just ones
    # built by fusionspark.session.get_spark.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ→TIMESTAMP cast below is zone-sensitive; pin UTC so epoch
    # extraction matches DuckDB's naive-as-UTC reading in any session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts(df)


def normalize_ts(df: DataFrame) -> DataFrame:
    """ts normalization — the driver has shipped this column three ways:

    * TIMESTAMP(NANOS): with nanosAsLong it arrives as epoch-ns BIGINT —
      floor-divide to micros (same truncation DuckDB applies);
    * timestamp[us] without a zone: Spark 4 infers TIMESTAMP_NTZ, which
      time functions like unix_micros reject — cast to TIMESTAMP (the
      session zone is UTC, so naive-as-UTC matches DuckDB's reading);
    * plain TIMESTAMP: pass through.

    Works on batch AND streaming frames (pure projection)."""
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view (mirrors the DuckDB oracle setup)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
