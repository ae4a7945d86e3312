"""Weighted A-Res sampling tests (operators/sampling.py): weight bias,
determinism across partitionings, and salt independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusionspark.operators.sampling import weighted_sample


def _pop(spark, n=2000):
    # ids 0..n-1; the first 10% carry 50× the weight of the rest
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n // 10, F.lit(500.0)).otherwise(F.lit(10.0)).alias("w"),
    )


def test_weighted_sample_biases_toward_heavy_rows(spark):
    df = _pop(spark)
    got = weighted_sample(df, weight_col="w", k=200, id_col="doc_id")
    heavy = got.filter(F.col("doc_id") < 200).count()
    # heavy rows are 10% of the population but 50× the weight: expected
    # heavy share ≈ 120/200 (w/o-replacement depletion); uniform would give
    # ~20.  Assert decisively between the two.
    assert got.count() == 200
    assert heavy > 80


def test_weighted_sample_partitioning_invariant(spark):
    df = _pop(spark)
    a = weighted_sample(df.repartition(1), "w", 50).select("doc_id").collect()
    b = weighted_sample(df.repartition(16), "w", 50).select("doc_id").collect()
    assert sorted(r[0] for r in a) == sorted(r[0] for r in b)


def test_weighted_sample_salt_changes_sample(spark):
    df = _pop(spark)
    a = {r[0] for r in weighted_sample(df, "w", 50, salt="ws:").select("doc_id").collect()}
    b = {r[0] for r in weighted_sample(df, "w", 50, salt="eval:").select("doc_id").collect()}
    assert a != b
    # both still favor the heavy block
    assert sum(1 for x in a if x < 200) > 20
    assert sum(1 for x in b if x < 200) > 20


def test_weighted_sample_cut_is_ulp_stable(spark):
    """The r9 driver red row: the k-boundary must not depend on raw libm
    doubles.  The cut key is the ROUNDED ln(u)/w (6 digits) with doc_id
    tiebreak, so perturbing every raw key by ±1 ulp cannot change the
    selected id set: replaying the selection in pure Python with
    nextafter-perturbed raw keys yields the same ids as Spark."""
    import hashlib
    import math

    rows = _pop(spark, 3000).collect()
    k = 200

    def raw_key(doc_id, w):
        u = (int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:8], 16) + 1) / 2**32
        return math.log(u) / w

    for direction in (math.inf, -math.inf):
        perturbed = sorted(
            ((round(math.nextafter(raw_key(r.doc_id, r.w), direction), 6), r.doc_id)
             for r in rows),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        expect = sorted(d for _, d in perturbed)
        got = sorted(
            r[0] for r in weighted_sample(_pop(spark, 3000), "w", k)
            .select("doc_id").collect()
        )
        assert got == expect, f"cut moved under {direction:+} ulp perturbation"


def test_weighted_sample_key_is_rounded_before_cut(spark):
    """sample_key in the output equals round(raw, 6) and the output order
    is (sample_key DESC, doc_id ASC) — i.e. the rounded key IS the sort
    key, not a display-only rounding after a raw-double cut."""
    got = weighted_sample(_pop(spark), "w", 50).collect()
    keys = [(r.sample_key, r.doc_id) for r in got]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    for r in got:
        assert r.sample_key == round(r.sample_key, 6)

def test_weighted_sample_emits_no_signed_zero(spark):
    """The r10 driver red row: a tiny negative raw key (doc 269 at sf0.01,
    raw -2.41e-07) rounds to +0.0 in Spark but -0.0 in DuckDB, and since
    every A-Res key is <= 0 sorted DESC that row ranks #1 every run —
    numerically equal, driver-hash different.  Both weighted_sample
    queries now canonicalize with `+ 0.0` in BOTH engines; this scans
    every emitted float column of both queries (Spark side) AND their
    DuckDB oracles for IEEE signed zeros at all three SFs."""
    import os

    import duckdb
    import numpy as np

    import __spark_entry__ as entry_mod
    from fusionspark.io import TABLES

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in ("weighted_sample", "weighted_sample_grouped"):
            for tag, pdf in (
                ("spark", queries[name](spark, sf_dir).toPandas()),
                ("duck", con.execute(oracles[name]).fetchdf()),
            ):
                for c in pdf.columns:
                    if np.issubdtype(pdf[c].dtype, np.floating):
                        v = pdf[c].to_numpy(dtype=float)
                        sz = (v == 0.0) & np.signbit(v)
                        assert not sz.any(), f"{sf} {name}.{c} [{tag}]: -0.0 emitted"
