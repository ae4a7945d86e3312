"""ST7: stream-stream interval join.

The reference has no streaming at all (SURVEY §2.12 — its closest analogue
is the lazy TTL sweep); this is a north-star Spark-native operator: join two
event streams on a key within a bounded event-time interval, the shape of
click-attribution / error-context / request-response pairing jobs.

Stream-static by construction like the rest of `streaming/`: the transform
accepts batch or streaming inputs unchanged.  On streaming inputs both
sides get watermarks, and the time-range predicate (``r.ts ∈ (l.ts,
l.ts + within]``) is exactly what lets Spark bound the join state: each
side's buffered rows are evicted once the other side's watermark passes
``ts + within + watermark`` (no unbounded state — the 100 TB requirement
for any stream-stream join).

Scale shape: an equi-join on the key → hash-partitioned state on both
sides; the interval predicate is evaluated post-shuffle per key group.  No
broadcast (both sides are unbounded); skewed keys shard with AQE in batch
mode and with `spark.sql.streaming.statefulOperator...` sizing in
micro-batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "6 hours",
    watermark: str = "30 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` rows sharing ``key`` where the
    right event lands strictly after the left one and no later than
    ``within`` after it.  All non-key columns come back prefixed.

    Batch and streaming plans are identical; streaming additionally
    watermarks both sides so the state store stays bounded.
    """
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key).alias("__k__"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias("__rk__"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != key],
    )
    lts, rts = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    cond = (
        (F.col("__k__") == F.col("__rk__"))
        & (F.col(rts) > F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("__k__").alias(key),
        *[c for c in l.columns if c != "__k__"],
        *[c for c in r.columns if c != "__rk__"],
    )
