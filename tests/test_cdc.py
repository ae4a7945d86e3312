"""CDC / merge operator tests: last-writer-wins and delete semantics,
SCD2 interval closure, MERGE action classification (including the
NULL-update-wins rule), and the one-Exchange / broadcast plan contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusionspark.operators import cdc


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _changes(spark):
    rows = [
        # key 1: insert, update, update  -> survives with v=30
        (1, 10, "I", 10.0), (1, 20, "U", 20.0), (1, 30, "U", 30.0),
        # key 2: insert then delete      -> gone
        (2, 11, "I", 5.0), (2, 21, "D", None),
        # key 3: delete then re-insert   -> survives with v=7
        (3, 12, "D", None), (3, 22, "I", 7.0),
    ]
    return spark.createDataFrame(rows, "k: long, seq: long, op: string, v: double")


def test_cdc_apply_lww_and_deletes(spark):
    state = {r["k"]: (r["seq"], r["v"])
             for r in cdc.cdc_apply(_changes(spark), ["k"], "seq").collect()}
    assert state == {1: (30, 30.0), 3: (22, 7.0)}


def test_scd2_versions_close_on_any_change(spark):
    df = _changes(spark).withColumn(
        "ts", F.timestamp_micros((F.col("seq") * 1_000_000).cast("long"))
    )
    h = cdc.scd2_history(df, ["k"], "seq").collect()
    by = {(r["k"], r["version"]): r for r in h}
    # key 1: three versions, each closed by the next, last open
    assert by[(1, 1)]["valid_to"] is not None
    assert by[(1, 2)]["valid_to"] is not None
    assert by[(1, 3)]["valid_to"] is None and by[(1, 3)]["is_current"]
    # key 2: single version CLOSED by the delete, not current
    assert by[(2, 1)]["valid_to"] is not None and not by[(2, 1)]["is_current"]
    # key 3: the delete emitted no row; the re-insert is version 1
    assert (3, 1) in by and (3, 2) not in by


def test_merge_upsert_actions_and_null_update_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k: long, name: string, v: double",
    )
    upd = spark.createDataFrame(
        [(1, 99.0), (2, None), (4, 4.0)], "k: long, v: double"
    )
    out = {r["k"]: r for r in cdc.merge_upsert(base, upd, ["k"]).collect()}
    assert out[1]["action"] == "U" and out[1]["v"] == 99.0
    # SQL MERGE: SET v = u.v even when u.v IS NULL
    assert out[2]["action"] == "U" and out[2]["v"] is None
    assert out[3]["action"] == "K" and out[3]["v"] == 3.0
    assert out[4]["action"] == "I" and out[4]["v"] == 4.0 and out[4]["name"] is None


def test_cdc_plan_shapes(spark):
    ch = _changes(spark).withColumn(
        "ts", F.timestamp_micros((F.col("seq") * 1_000_000).cast("long"))
    )
    # SCD2's lead + row_number share one key partitioning: exactly 1 Exchange
    plan = _plan(cdc.scd2_history(ch, ["k"], "seq"))
    assert plan.count("Exchange") == 1


def test_merge_over_bucketed_base_shuffles_only_updates(spark, sf_dir, tmp_path):
    """FULL OUTER can't broadcast; over a bucketed base the MERGE pays one
    Exchange — the batch-sized updates side — and the base never moves."""
    from fusionspark.io import load_table, write_bucketed

    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_bucketed(base, "cust_bucketed", "c_custkey", buckets=8)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        upd = base.limit(10).select(
            "c_custkey", (F.col("c_acctbal") + 1).alias("c_acctbal")
        )
        merged = cdc.merge_upsert(spark.table("cust_bucketed"), upd, ["c_custkey"])
        plan = _plan(merged)
        assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan
        # exactly one shuffle exchange: the updates side (base is bucketed)
        assert plan.count("Exchange hashpartitioning") == 1
        assert merged.filter(F.col("action") == "U").count() == 10
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS cust_bucketed")
