"""Structured-Streaming operators (SURVEY §2.12 ST1-ST6).

The reference has no real streaming — only timer loops (autosave
FusionEngine.js:340-344, consolidation RecursiveLearningEngine.js:735-744)
and lazy TTL expiry.  These are the Spark-native streaming operators the
north-star mandates over the `events` table.

Every transform below is stream-static: it accepts either a batch DataFrame
or a readStream DataFrame unchanged (the plans are identical; Spark picks
micro-batch execution when the source is streaming).  Watermarks are only
attached when the input is streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if watermark and events.isStreaming:
        return events.withWatermark("ts", watermark)
    return events


def tumbling_counts(
    events: DataFrame, duration: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """ST1/ST4: tumbling event-time window per event_type."""
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """ST2: sliding event-time window."""
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """ST3: session windows per user (gap-based)."""
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST5: stateful dedup.  Streaming: dropDuplicatesWithinWatermark on the
    key; batch analogue: first row per key in (ts, event_id) order."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return events.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def stream_events_from_parquet(spark, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's events parquet (schema inferred
    from a batch read; ts arrives as epoch-ns bigint → micros timestamp)."""
    import os
    import tempfile

    from fusionspark.io import load_table, normalize_ts

    batch = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # the file source wants a directory; expose the single file through one
    stream_dir = tempfile.mkdtemp(prefix="fusionspark-stream-")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = normalize_ts(spark.readStream.schema(raw_schema).parquet(stream_dir))
    return stream.select(*[f.name for f in batch.schema.fields])


USER_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double"
)
_STATE_SCHEMA = "n long, total double, mx double"


def user_running_stats(
    events: DataFrame, timeout_minutes: int = 30
) -> DataFrame:
    """ST-custom: arbitrary stateful aggregation via applyInPandasWithState
    — a per-user running (count, sum, max) that survives across
    micro-batches and emits its final state when the user goes idle past
    the processing-time timeout.  This is the escape hatch for operators
    the built-in window aggregates can't express (the reference's closest
    analogue is the in-memory per-agent counters it keeps in Maps).

    Batch input: falls back to an equivalent groupBy (state = whole input),
    so tests can compare the two paths.
    """
    if not events.isStreaming:
        return (
            events.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").cast("double").alias("total_value"),
                F.max("value").cast("double").alias("max_value"),
            )
            .select("user_id", "n_events", "total_value", "max_value")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, mx = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n],
                 "total_value": [total], "max_value": [mx]}
            )
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n],
             "total_value": [total], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def enriched_tumbling(
    events: DataFrame,
    customer: DataFrame,
    duration: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """ST-extension: stream-STATIC dimension enrichment, the canonical
    "join the clickstream to the customer table, then window" shape.  The
    static side broadcasts (Structured Streaming re-plans it per
    micro-batch, so a dimension refresh lands without restarting the
    query); unmatched users keep flowing as 'unknown' via the left join;
    the windowed aggregate runs AFTER the enrich so segments, not users,
    key the state store."""
    e = _with_watermark(events, watermark)
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    j = e.join(F.broadcast(dim), "user_id", "left").withColumn(
        "segment", F.coalesce("c_mktsegment", F.lit("unknown"))
    )
    return (
        j.groupBy(F.window("ts", duration).alias("w"), "segment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "segment", "n", "sum_value")
    )
