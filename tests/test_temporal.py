"""As-of join + time-bucket rollup invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fusionspark.operators.temporal import asof_join, time_bucket_rollup


def test_asof_join_matches_bruteforce(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(3), rng.randrange(1000)) for i in range(60)]
    right = [(100 + i, rng.randrange(3), rng.randrange(1000), float(i)) for i in range(40)]
    # dedupe right per (key, ts): keep max id (the documented contract)
    best = {}
    for rid, k, ts, v in right:
        cur = best.get((k, ts))
        if cur is None or rid > cur[0]:
            best[(k, ts)] = (rid, v)
    right_d = [(rid, k, ts, v) for (k, ts), (rid, v) in best.items()]

    ldf = spark.createDataFrame(left, "lid: long, key: long, ts: long")
    rdf = spark.createDataFrame(right_d, "rid: long, key: long, ts: long, v: double")
    out = {
        r["lid"]: (r["r_rid"], r["r_v"], r["r_ts"])
        for r in asof_join(ldf, rdf, on=["key"], ts_col="ts", right_cols=["rid", "v"]).collect()
    }

    for lid, k, lts in left:
        cands = [(ts, rid, v) for rid, kk, ts, v in right_d if kk == k and ts <= lts]
        expected = max(cands) if cands else None
        got = out[lid]
        if expected is None:
            assert got == (None, None, None)
        else:
            ets, erid, ev = expected
            assert got == (erid, ev, ets)


def test_time_bucket_rollup_grand_total(spark):
    rows = [(i, f"2024-01-0{1 + i % 2} 0{i % 3}:10:00", float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "event_id: long, ts_s: string, value: double")
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("ts_s"))
    out = time_bucket_rollup(df).collect()
    grand = [r for r in out if r["day"] is None and r["hour"] is None]
    assert len(grand) == 1 and grand[0]["n"] == 12
    day_rows = [r for r in out if r["day"] is not None and r["hour"] is None]
    assert sum(r["n"] for r in day_rows) == 12
    hour_rows = [r for r in out if r["hour"] is not None]
    assert sum(r["n"] for r in hour_rows) == 12


def test_range_join_matches_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    base = 1_700_000_000_000_000  # epoch micros
    left = [(i, rng.randrange(2), base + rng.randrange(0, 10**7)) for i in range(40)]
    right = [(100 + i, rng.randrange(2), base + rng.randrange(0, 10**7)) for i in range(40)]
    ldf = spark.createDataFrame(left, "lid: long, key: long, us: long").withColumn(
        "ts", F.timestamp_micros("us")
    )
    rdf = spark.createDataFrame(right, "rid: long, key: long, us: long").withColumn(
        "ts", F.timestamp_micros("us")
    )
    from fusionspark.operators.temporal import range_join

    lo, hi = -2.0, 3.0
    out = {
        (r["lid"], r["r_rid"])
        for r in range_join(ldf, rdf, on=["key"], ts_col="ts", lower_s=lo, upper_s=hi).collect()
    }
    brute = {
        (lid, rid)
        for lid, lk, lus in left
        for rid, rk, rus in right
        if lk == rk and lus + lo * 1e6 <= rus <= lus + hi * 1e6
    }
    assert out == brute and brute  # non-empty by construction


def test_range_join_no_nested_loop_plan(spark):
    import contextlib
    import io as _io

    from pyspark.sql import functions as F

    from fusionspark.operators.temporal import range_join

    ldf = spark.range(10).select(
        F.col("id").alias("lid"), (F.col("id") % 2).alias("key"),
        F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
    )
    rdf = spark.range(10).select(
        F.col("id").alias("rid"), (F.col("id") % 2).alias("key"),
        F.timestamp_micros(F.col("id") * 1500000).alias("ts"),
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(ldf, rdf, on=["key"], lower_s=-5, upper_s=5).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_null_right_attribute_stays_null(spark):
    """ADVICE r2: the matched right row's genuinely-NULL attribute must come
    through NULL — per-column ignorenulls carries would backfill it from an
    older right row (the struct carry prevents exactly that)."""
    ldf = spark.createDataFrame([(1, 0, 100)], "lid: long, key: long, ts: long")
    rdf = spark.createDataFrame(
        [(10, 0, 50, 5.0), (11, 0, 90, None)],
        "rid: long, key: long, ts: long, v: double",
    )
    row = asof_join(ldf, rdf, on=["key"], ts_col="ts", right_cols=["rid", "v"]).collect()[0]
    # matched row is rid=11 (ts=90): its NULL v must NOT be filled from rid=10
    assert row["r_rid"] == 11 and row["r_ts"] == 90
    assert row["r_v"] is None


def test_load_table_is_timezone_neutral(spark, sf_dir):
    """load_table must not mutate the caller's session timezone (ADVICE r5),
    and the NTZ→timestamp conversion must be zone-FREE: epoch micros of the
    events ts column are identical whatever zone the session is in."""
    from pyspark.sql import functions as F

    from fusionspark.io import load_table

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, sf_dir, "events")
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        ), "load_table mutated the session timezone"
        ny = df.agg(F.min(F.unix_micros("ts")).alias("m")).first()["m"]
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = load_table(spark, sf_dir, "events").agg(
            F.min(F.unix_micros("ts")).alias("m")
        ).first()["m"]
        assert ny == utc
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_gap_fill_locf(spark):
    from fusionspark.operators.temporal import gap_fill

    rows = [
        # user 1: observations in hour-buckets 0, 3 (gap 1-2), value jumps
        (1, 0, 10.0, 100),
        (1, 3 * 3600, 40.0, 101),
        # two obs in one bucket: the later event wins (seq 103)
        (1, 3 * 3600 + 60, 41.0, 103),
        # user 2: single observation -> single-row grid
        (2, 7200, 5.0, 102),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, value double, event_id long")
    df = df.select(
        "user_id",
        F.timestamp_micros((F.col("sec") * 1_000_000).cast("long")).alias("ts"),
        "value", "event_id",
    )
    out = {(r["user_id"], r["bucket"]): r
           for r in gap_fill(df, step_sec=3600).collect()}
    assert len([k for k in out if k[0] == 1]) == 4          # dense grid 0..3
    assert out[(1, 0)]["value_filled"] == 10.0 and out[(1, 0)]["observed"]
    assert out[(1, 1)]["value_filled"] == 10.0 and not out[(1, 1)]["observed"]
    assert out[(1, 2)]["value_filled"] == 10.0 and not out[(1, 2)]["observed"]
    assert out[(1, 3)]["value_filled"] == 41.0              # max_by(seq) wins
    assert out[(2, 2)]["value_filled"] == 5.0
    assert len([k for k in out if k[0] == 2]) == 1


def test_interarrival_stats(spark):
    from fusionspark.operators.temporal import interarrival_stats

    rows = [("a", 0, 1), ("a", 10, 2), ("a", 40, 3), ("b", 5, 4)]
    df = spark.createDataFrame(rows, "event_type string, sec long, event_id long")
    df = df.select(
        "event_type",
        F.timestamp_micros((F.col("sec") * 1_000_000).cast("long")).alias("ts"),
        "event_id",
    )
    out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
    assert out["a"]["n_gaps"] == 2
    assert out["a"]["avg_gap_sec"] == 20.0
    assert out["a"]["min_gap_sec"] == 10.0 and out["a"]["max_gap_sec"] == 30.0
    assert "b" not in out  # single event -> no gaps
