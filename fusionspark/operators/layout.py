"""Multi-dimensional data layout: Z-order clustering + zone-map skipping.

A range-partitioned sort clusters ONE column; queries that filter two
independent columns (user AND time, host AND size) leave one of them
scattered across every file.  Z-ordering interleaves the bits of both
rank-quantized keys so files become axis-aligned rectangles in key space,
and a per-file [min, max] zone map then prunes every file whose rectangle
misses the predicate — the Delta OPTIMIZE ZORDER BY / ClickHouse
skipping-index idea, built from three Spark primitives:

1. quantize each column to `bits` levels (linear min/max scaling from one
   1-row aggregate that broadcasts — same shape as SQ8's range train);
2. Morton-interleave the two codes with pure bitwise column expressions
   (whole-stage codegen; no UDF);
3. repartitionByRange + sortWithinPartitions on the z-key at WRITE time,
   then per-file min/max via the `_metadata.file_path` hidden column at
   plan time, and a manual file-list prune before the read.

At 100 TB the zone map is thousands of rows (one per file) — driver-side
trivially — while the prune saves reading every file outside the query
rectangle.  Linear quantization assumes roughly uniform keys; for skewed
keys substitute a percent_rank quantizer at write time (the z-key is
write-once, so the extra sort is amortized over every later read).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantize(col: F.Column, mn: F.Column, mx: F.Column, bits: int) -> F.Column:
    """Linear [mn, mx] → [0, 2^bits-1] integer code (degenerate span → 0)."""
    span = mx - mn
    levels = (1 << bits) - 1
    q = F.floor((col.cast("double") - mn) / span * levels)
    return (
        F.when(span > 0, F.least(F.lit(levels), F.greatest(F.lit(0), q)))
        .otherwise(F.lit(0))
        .cast("long")
    )


def _morton(a: F.Column, b: F.Column, bits: int) -> F.Column:
    """Interleave bits of two `bits`-wide codes: a's bit i → 2i+1, b's → 2i.
    2·bits bitwise terms, all inside codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write `df` as `n_files` parquet files clustered by the Morton key of
    (col_a, col_b).  The quantizer ranges come from ONE 1-row aggregate
    (broadcast join); the only wide operation is the write-time range
    repartition — the standing cost that every later pruned read repays."""
    ranges = df.agg(
        F.min(F.col(col_a).cast("double")).alias("a_mn"),
        F.max(F.col(col_a).cast("double")).alias("a_mx"),
        F.min(F.col(col_b).cast("double")).alias("b_mn"),
        F.max(F.col(col_b).cast("double")).alias("b_mx"),
    )
    z = _morton(
        _quantize(F.col(col_a), F.col("a_mn"), F.col("a_mx"), bits),
        _quantize(F.col(col_b), F.col("b_mn"), F.col("b_mx"), bits),
        bits,
    )
    keyed = df.crossJoin(F.broadcast(ranges)).withColumn("__z", z)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "a_mn", "a_mx", "b_mn", "b_mx")
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap(spark: SparkSession, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file [min, max] for `cols` via the `_metadata.file_path` hidden
    column — one aggregation pass at layout time; the result is file-count
    sized (driver-trivial at any corpus scale)."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_mn"), F.max(c).alias(f"{c}_mx")]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    zones: DataFrame,
    ranges: dict[str, tuple[float, float]],
) -> tuple[DataFrame, int, int]:
    """Read only the files whose zone rectangles intersect every predicate
    range, returning (df, n_files_read, n_files_total).  The returned df
    still needs the row-level filter — zone pruning is file-granular."""
    zrows = zones.collect()
    total = len(zrows)
    keep = []
    for r in zrows:
        ok = True
        for c, (lo, hi) in ranges.items():
            if r[f"{c}_mx"] < lo or r[f"{c}_mn"] > hi:
                ok = False
                break
        if ok:
            keep.append(r["file"])
    if not keep:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema), 0, total
    df = spark.read.parquet(*keep)
    for c, (lo, hi) in ranges.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, len(keep), total


def hilbert_key_np(ax, by, bits: int):
    """Vectorized Hilbert xy→d for two `bits`-wide integer codes (numpy
    int64 arrays) — the classic Lam/Shapiro rotation walk, one vector
    pass per level.  Hilbert's curve keeps every consecutive key pair
    spatially ADJACENT (Morton jumps across the plane at power-of-two
    seams), so range-partitioned files cover tighter rectangles and the
    same zone map prunes more files for the same rectangle query.

    Computed in an Arrow kernel rather than column expressions because
    each level's (x, y) depends conditionally on the previous level's —
    inlined CASE trees grow ~4^bits terms and blow Janino's method
    limit (the round-3 cosine failure class); write-time only, so the
    kernel cost is amortized over every later pruned read."""
    import numpy as np

    x = ax.astype(np.int64).copy()
    y = by.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (bits - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: flip when rx==1 inside ry==0, then swap axes
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """zorder_write's Hilbert sibling: same 1-row quantizer ranges, same
    range-repartitioned clustered write, but the cluster key follows the
    Hilbert curve (adjacent keys are spatially adjacent — no Morton
    seam jumps), which tightens per-file zone rectangles.

    The ~15 scaffolding lines shared with zorder_write are duplicated
    DELIBERATELY: factoring them would edit zorder_write's body and
    re-queue its standing driver attestation for a cosmetic win (the
    attestation-hygiene tradeoff PROGRESS.md documents); fold them
    together the next time zorder_write changes for a real reason."""
    ranges = df.agg(
        F.min(F.col(col_a).cast("double")).alias("a_mn"),
        F.max(F.col(col_a).cast("double")).alias("a_mx"),
        F.min(F.col(col_b).cast("double")).alias("b_mn"),
        F.max(F.col(col_b).cast("double")).alias("b_mx"),
    )
    qa = _quantize(F.col(col_a), F.col("a_mn"), F.col("a_mx"), bits)
    qb = _quantize(F.col(col_b), F.col("b_mn"), F.col("b_mx"), bits)
    keyed = (
        df.crossJoin(F.broadcast(ranges))
        .withColumn("__qa", qa)
        .withColumn("__qb", qb)
        .drop("a_mn", "a_mx", "b_mn", "b_mx")
    )
    out_schema = keyed.drop("__qa", "__qb").schema.add("__h", "long")

    def add_key(batches):
        for pdf in batches:
            h = hilbert_key_np(
                pdf["__qa"].to_numpy(), pdf["__qb"].to_numpy(), bits
            )
            out = pdf.drop(columns=["__qa", "__qb"])
            out["__h"] = h
            yield out

    (
        keyed.mapInPandas(add_key, schema=out_schema)
        .repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )
