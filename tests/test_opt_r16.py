"""Focused tests for the r16 optimization-round internals changes.

  * io.spread scale gate (VERDICT r15 #2): a frame that already has
    >= defaultParallelism partitions passes through UNTOUCHED (same
    object, no Exchange added) — the 100 TB multi-split case; the
    single-split bench case still round-robins to the core count.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_spread_passthrough_on_multisplit_input(spark):
    from fusionspark.io import spread

    par = spark.sparkContext.defaultParallelism
    # spark.range with explicit numPartitions >= cores: the "input already
    # arrives multi-split" case — spread must be the identity (no Exchange)
    df = spark.range(0, 1000, 1, numPartitions=par * 2)
    out = spread(df)
    assert out is df  # identity: no node added at all
    assert out.rdd.getNumPartitions() == par * 2
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_spread_still_spreads_single_split(spark):
    from fusionspark.io import spread

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, numPartitions=1).select(
        F.col("id"), (F.col("id") * 7).alias("v")
    )
    out = spread(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == par
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_spread_gate_on_scan(spark, tmp_path):
    """A one-file parquet scan (the bench shape) still gets spread; the
    row set is preserved."""
    from fusionspark.io import spread

    p = str(tmp_path / "one")
    spark.range(500).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 500
