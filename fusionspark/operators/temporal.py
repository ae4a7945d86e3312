"""Temporal operators Spark lacks as built-ins: as-of join and
time-bucketed (hypertable-style) rollups.

Not in the reference (its event handling is in-memory arrays); these are
the standard time-series companions a 100 TB event store needs.  The as-of
join uses the union + per-key ordered window `last(..., ignorenulls)`
technique instead of an inequality join: one shuffle on the join key, no
range-join explosion, and the window sort is exactly the sort a bucketed
events table already has.  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    right.ts <= left.ts and equal `on` keys (backward as-of, inclusive —
    DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`).

    Mechanics: tag both sides, union, window per key ordered by
    (ts, side) with right rows sorting before left rows at equal ts, then
    ONE `last(struct-of-right-columns, ignorenulls)` carries the latest
    right row onto each left row.  Carrying a single struct (not one
    `last` per column) is what keeps a matched row's genuinely-NULL
    attributes NULL — per-column carries would backfill them from older
    right rows, diverging from ASOF JOIN semantics.  Rows with no prior
    right row keep NULLs throughout.

    The right side should be unique per (on, ts) — pre-dedupe if not
    (ties at identical timestamps are otherwise engine-defined).
    """
    from pyspark.sql.types import StructType

    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    carry = [*right_cols] + ([ts_col] if ts_col not in right_cols else [])
    l_type = StructType([left.schema[c] for c in left.columns])
    r_type = StructType([right.schema[c] for c in carry])
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(*[F.col(c) for c in carry]).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_c", F.last(F.col("_r"), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            "_l.*",
            *[F.col("_c").getField(c).alias(f"{prefix}{c}") for c in carry],
        )
    )


def time_bucket_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    agg_cols: dict | None = None,
) -> DataFrame:
    """Hypertable-style hierarchical time aggregate: ROLLUP over
    (day, hour) — per-hour rows, per-day subtotals, and a grand total in
    one pass (Spark expands the grouping sets; partial aggregation keeps
    it map-side combinable)."""
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    hour = F.hour(F.col(ts_col)).alias("hour")
    aggs = agg_cols or {
        "n": F.count("*"),
        "sum_value": F.round(F.sum("value"), 6),
    }
    return events.rollup(day, hour).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 3600.0,
    prefix: str = "r_",
) -> DataFrame:
    """Interval join: pair each left row with every right row whose
    timestamp lies in [left.ts + lower_s, left.ts + upper_s] with equal
    `on` keys.

    Spark plans a raw inequality join as a broadcast-nested-loop (O(N·M));
    here the time axis is bucketed at the interval width, each left row
    explodes to the (≤ 2) buckets its window can touch, and the join is an
    EQUI-join on (keys, bucket) with the exact range predicate verified
    after — the standard banded range-join: a hash join whose cost follows
    per-bucket cardinality, not the cross product.
    """
    # bucket width = interval width → each left window touches ≤ 2 buckets
    width = max(upper_s - lower_s, 1e-6)
    r_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{prefix}{c}") for c in r_cols],
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(width * 1e6)).alias("_bkt"),
    )
    l = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(
                    (F.unix_micros(F.col(ts_col)) + F.lit(lower_s * 1e6))
                    / F.lit(width * 1e6)
                ),
                F.floor(
                    (F.unix_micros(F.col(ts_col)) + F.lit(upper_s * 1e6))
                    / F.lit(width * 1e6)
                ),
            )
        ).alias("_bkt"),
    )
    rts = F.unix_micros(F.col(f"{prefix}{ts_col}"))
    lts = F.unix_micros(F.col(ts_col))
    return (
        l.join(r, [*on, "_bkt"])
        .filter(
            (rts >= lts + F.lit(lower_s * 1e6)) & (rts <= lts + F.lit(upper_s * 1e6))
        )
        .drop("_bkt")
    )


def gap_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_sec: int = 3600,
    seq_col: str = "event_id",
) -> DataFrame:
    """Resample an irregular series onto a regular `step_sec` grid per key
    with forward fill — the time-series densification every monitoring /
    feature-extraction pipeline needs (DuckDB/Timescale call it
    gap-filling + LOCF).

    Plan: (1) bucket each row and keep the LAST value per (key, bucket)
    (max_by on the sequence column — one hash agg); (2) per key, explode
    `sequence(min_bucket, max_bucket)` to the dense grid — rows created
    executor-side, never on the driver; (3) left-join observations onto
    the grid and forward-fill with last(value, ignorenulls) over the key
    window.  Two shuffles on the key (agg + window), grid size bounded by
    span/step per key.  The grid starts at each key's first observation,
    so there are no leading NULLs."""
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(step_sec * 1_000_000))
    obs = (
        df.select(key_col, bucket.alias("bucket"), value_col, seq_col)
        .groupBy(key_col, "bucket")
        .agg(F.max_by(value_col, seq_col).alias("v"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("bucket").alias("mnb"), F.max("bucket").alias("mxb")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("mnb", "mxb")).alias("bucket")
    )
    j = grid.join(obs, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNotNull().alias("observed"),
    )


def interarrival_stats(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival gap statistics per group: order events by
    (ts, seq), lag-diff in seconds, aggregate count/mean/min/max.  One
    shuffle (window and agg share the group partitioning)."""
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc(), F.col(seq_col).asc())
    gap = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    ) / F.lit(1e6)
    gaps = df.select(group_col, gap.alias("gap_sec")).filter(
        F.col("gap_sec").isNotNull()
    )
    return gaps.groupBy(group_col).agg(
        F.count("*").alias("n_gaps"),
        F.round(F.sum("gap_sec") / F.count("*"), 6).alias("avg_gap_sec"),
        F.round(F.min("gap_sec"), 6).alias("min_gap_sec"),
        F.round(F.max("gap_sec"), 6).alias("max_gap_sec"),
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Batch sessionization: split each key's event stream into sessions at
    inactivity gaps > `gap_sec`, assign consecutive per-key session numbers,
    and roll each session up to (n_events, start/end, duration).

    The classic web/product-analytics shape (what Spark's streaming
    `session_window` computes incrementally) expressed as two stacked
    windows over ONE key partitioning: lag-diff marks session starts,
    a running sum of the marks numbers the sessions, then one hash agg
    per (key, session).  Exactly one shuffle on the key; session length
    is never materialized driver-side, so a key with millions of events
    is just a partition-local scan."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(seq_col).asc())
    ts_s = F.unix_micros(F.col(ts_col))
    prev = F.lag(ts_col).over(w)
    is_new = (prev.isNull() | (ts_s - F.unix_micros(prev) > gap_sec * 1_000_000)).cast(
        "int"
    )
    numbered = df.select(
        key_col,
        ts_s.alias("_ts_us"),
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    return numbered.groupBy(key_col, "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.min("_ts_us") / F.lit(1_000_000)).cast("double").alias("start_s"),
        (F.max("_ts_us") / F.lit(1_000_000)).cast("double").alias("end_s"),
        ((F.max("_ts_us") - F.min("_ts_us")) / F.lit(1_000_000))
        .cast("double")
        .alias("duration_sec"),
    )


def last_touch_attribution(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most recent
    STRICTLY EARLIER non-conversion event of the same key (id + type + age).

    One window over one key shuffle: `last(..., ignorenulls=True)` over
    ROWS UNBOUNDED PRECEDING..1 PRECEDING carries the latest touch forward
    past any run of conversions — no self-join, no per-conversion re-scan
    (an as-of self-join would shuffle the table twice and skew on hot
    keys).  Conversions with no prior touch keep NULLs — attribution
    reports need the "direct" bucket, not a dropped row."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(seq_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) != conversion
    touch_id = F.last(F.when(is_touch, F.col(seq_col)), ignorenulls=True).over(w)
    touch_type = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    age = (F.unix_micros(F.col(ts_col)) - F.unix_micros(touch_ts)) / F.lit(1e6)
    return (
        df.select(
            key_col,
            F.col(seq_col).alias("conversion_id"),
            F.col(type_col).alias("_type"),
            F.col(ts_col).alias("_ts"),
            touch_id.alias("touch_id"),
            touch_type.alias("touch_type"),
            F.round(age, 6).alias("touch_age_sec"),
        )
        .filter(F.col("_type") == conversion)
        .drop("_type", "_ts")
    )


def robust_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z_cut: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly detection: modified z-score from the
    median and the MAD (median absolute deviation) — the Iglewicz-Hoaglin
    0.6745·(x−med)/MAD rule, which a single corrupted batch cannot drag
    the way it drags a mean/stddev gate.

    Two passes by construction (MAD needs the median first), each an
    exact `percentile` aggregate on the group key; the tiny per-group
    stats broadcast back onto the events, so the events table itself is
    scanned twice and shuffled ZERO times.  Groups with MAD = 0 yield
    NULL scores (flat series have no robust scale), never a division
    error."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), group_col)
    mad = dev.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad")
    )
    stats = med.join(mad, group_col)
    z = F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad")
    scored = df.join(F.broadcast(stats), group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.when(F.col("mad") > 0, F.round(z, 6)).alias("robust_z"),
        F.when(F.col("mad") > 0, F.abs(z) > F.lit(z_cut))
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )
    return scored


def winsorize(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp values to the exact [P_lo, P_hi]
    band — the standard heavy-tail guard before a metric feeds a model or
    a dashboard (clipping, unlike dropping, keeps row counts stable).

    One exact-percentile aggregate on the tiny group key, broadcast back;
    the data table itself never shuffles.  Exact `percentile` keeps the
    clamp oracle-checkable; at 100 TB swap in approx_percentile for the
    stats subtree — the clamp expression is unchanged."""
    stats = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("p_hi"),
    )
    v = F.col(value_col)
    clamped = F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    return df.join(F.broadcast(stats), group_col).select(
        F.col(id_col),
        F.col(group_col),
        v,
        F.round(clamped, 6).alias("clamped"),
        ((v < F.col("p_lo")) | (v > F.col("p_hi"))).alias("was_clipped"),
    )
