"""Scale-safe ranked-design primitives.

The one anti-pattern class plan_audit's window audit polices is an
UNPARTITIONED window over raw table rows — a single-reducer global sort.
Several attested queries are ranked/quantile DESIGNS (ntile deciles,
curriculum shards, CCNet terciles) whose spec really is a global order;
their docstrings promise a value-grid substitution at 100 TB.  This
module IS that substitution, kept output-identical so the swap needs no
re-derivation:

`ntile_exact` reproduces `F.ntile(n).over(Window.orderBy(v, tiebreak))`
bit-for-bit without any unpartitioned window over the raw rows:

1. collapse to the distinct-value grid (ONE map-side-combined groupBy);
2. cumulative counts over the GRID (an unpartitioned window, but over
   the bounded grid — domain-sized, not corpus-sized);
3. join each row back to its group's `below` count (value-keyed equi
   join) and rank WITHIN its value group only (a PARTITIONED window);
4. global position i = below + within-rank, and NTILE's piecewise size
   arithmetic on exact integers gives the tile.

The only corpus-wide shuffles are the grid groupBy and the value-keyed
join/window — both parallel over the value domain.  A hot value (many
ties) is an ordinary skewed key (AQE / salting), not a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ntile_exact(
    df: DataFrame,
    n: int,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "tile",
) -> DataFrame:
    """Exact NTILE(n) OVER (ORDER BY value_col, tiebreak_col) replacement.

    Returns `df` plus `out_col` (int), bit-identical to F.ntile for a
    total (value, tiebreak) order — tiebreak must be unique within a
    value group (an id column).  NTILE semantics: with N rows, the
    first N mod n tiles get ceil(N/n) rows, the rest floor(N/n).
    """
    v = F.col(value_col)
    grid = df.groupBy(value_col).agg(F.count("*").cast("long").alias("_cnt"))
    gw = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    grid = grid.select(
        value_col,
        (F.sum("_cnt").over(gw) - F.col("_cnt")).cast("long").alias("_below"),
    )
    nn = df.agg(F.count("*").cast("long").alias("_n"))
    ww = Window.partitionBy(value_col).orderBy(tiebreak_col)
    j = (
        df.join(grid, value_col)
        .withColumn("_rk", F.row_number().over(ww).cast("long"))
        .crossJoin(F.broadcast(nn))
    )
    i = F.col("_below") + F.col("_rk")  # 1-based global position
    total = F.col("_n")
    r = total % n  # tiles that get the big size
    big = F.floor(total / n).cast("long") + 1
    small = F.floor(total / n).cast("long")
    tile = F.when(
        i <= r * big, F.floor((i - 1) / big).cast("long") + 1
    ).otherwise(r + F.floor((i - r * big - 1) / small).cast("long") + 1)
    _ = v  # documented: the grid/join key is value_col
    return j.withColumn(out_col, tile.cast("int")).drop(
        "_cnt", "_below", "_rk", "_n"
    )


def prefix_sum_exact(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum",
    bucket_width: int = 1024,
) -> DataFrame:
    """Inclusive prefix sum of `val_col` in `order_col` order WITHOUT an
    unpartitioned window over raw rows — the classic two-pass parallel
    scan: bucket rows by floor(order/width) (floor division is monotone,
    so bucket order == row order), cumulative the per-bucket totals over
    the bounded bucket grid, then add each row's bucket offset to its
    LOCAL cumulative (a bucket-PARTITIONED window).  Exact integers end
    to end; identical to SUM() OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING) for a numeric, unique order column.

    This is the documented 100 TB substitution for the ordered
    systematic designs (systematic_sample's docstring: 'per-partition
    offsets from partition totals first — two passes, same arithmetic,
    no global sort')."""
    b = F.floor(F.col(order_col) / bucket_width).cast("long")
    with_b = df.withColumn("_bkt", b)
    bt = with_b.groupBy("_bkt").agg(
        F.sum(val_col).cast("long").alias("_btot")
    )
    gw = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, 0)
    offs = bt.select(
        "_bkt",
        (F.sum("_btot").over(gw) - F.col("_btot")).cast("long").alias("_off"),
    )
    lw = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_b.join(offs, "_bkt")
        .withColumn(
            out_col,
            (F.col("_off") + F.sum(val_col).over(lw)).cast("long"),
        )
        .drop("_bkt", "_off")
    )
