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
