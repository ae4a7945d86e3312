"""Cardinality sketches: a deterministic HyperLogLog built on the repo's
engine-portable md5 hash.

Not in the reference (north-star addition): corpus bookkeeping at 100 TB
(distinct URLs, shingles, tokens, users) can't afford exact COUNT(DISTINCT)
— HLL registers are tiny (2^p bytes), mergeable (max is associative and
commutative, so map-side partial aggregation applies), and unionable across
shards/days.  Spark's own approx_count_distinct is a black-box HLL++ whose
register layout can't be replayed elsewhere; this one is defined entirely
by md5 (identical in Spark / DuckDB / Python), so the DuckDB oracle
reproduces every register bit-for-bit and the estimate to float equality —
the sketch itself is attestable, not just its row count.

Layout (Flajolet et al. 2007): 32-bit hash = p bucket bits (top) +
(32 − p) tail bits; register_b = max over values of (leading zeros of the
tail + 1); raw estimate α_m·m²/Σ 2^(−M_b) with the standard small-range
linear-counting correction m·ln(m/V) when E ≤ 2.5m and V > 0 registers
are empty."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fusionspark.operators.dedup import md5_hash32


def hll_rho(tail: Column, tail_bits: int) -> Column:
    """Position of the first 1-bit in the `tail_bits`-wide value (1-based;
    all-zero → tail_bits + 1), via the binary-string leading-zero count —
    the same regexp formulation the DuckDB oracle uses (no float log2,
    whose rounding at exact powers of two differs between engines)."""
    padded = F.lpad(F.bin(tail), tail_bits, "0")
    lz = F.length(F.regexp_extract(padded, "^0*", 0))
    return (lz + 1).cast("int")


def hll_registers(df: DataFrame, value: Column, p: int = 8) -> DataFrame:
    """(bucket, register) rows for the DISTINCT values of `value` — the
    mergeable sketch state.  One shuffle on the 2^p bucket ids with
    map-side partial max; empty buckets are materialized as register 0 so
    unions/merges are positional."""
    m = 1 << p
    tail_bits = 32 - p
    spark = df.sparkSession
    h = md5_hash32(value)
    regs = (
        df.select(
            (h / (1 << tail_bits)).cast("int").alias("bucket"),
            hll_rho(h % (1 << tail_bits), tail_bits).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    all_buckets = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    return all_buckets.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("register", F.lit(0)).cast("int").alias("register")
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Collapse (bucket, register) state to a 1-row estimate, with the
    small-range linear-counting correction."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("z"),
        F.sum((F.col("register") == 0).cast("long")).alias("v"),
    )
    raw = F.lit(alpha) * m * m / F.col("z")
    corrected = F.when(
        (raw <= 2.5 * m) & (F.col("v") > 0),
        F.lit(m) * F.log(F.lit(m) / F.col("v")),
    ).otherwise(raw)
    return agg.select(corrected.alias("estimate"))


def hll_distinct(df: DataFrame, value: Column, p: int = 8) -> DataFrame:
    """End-to-end: estimate the number of distinct `value`s, alongside the
    exact count (cheap at test SF; the point of the sketch is that at
    100 TB you keep ONLY the 2^p registers)."""
    est = hll_estimate(hll_registers(df, value, p), p)
    exact = df.agg(F.countDistinct(value).alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        F.round("estimate", 6).alias("hll_estimate"),
        F.round(
            F.abs(F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )
