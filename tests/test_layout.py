"""Z-order layout tests: Morton key bit laws, zone-map pruning actually
skips files on a clustered layout (and skips NOTHING it shouldn't —
pruned result ≡ full scan), and the degenerate/empty-rectangle paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import layout


def test_morton_interleaves_bits(spark):
    df = spark.range(1).select(
        layout._morton(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"), 3)
        .alias("z")
    )
    # a=101, b=011 -> bits (a2 b2 a1 b1 a0 b0) = 1 0 0 1 1 1 = 0b100111
    assert df.first()["z"] == 0b100111


def test_quantize_clamps_and_degenerates(spark):
    df = spark.range(1).select(
        layout._quantize(F.lit(5.0), F.lit(0.0), F.lit(10.0), 8).alias("mid"),
        layout._quantize(F.lit(10.0), F.lit(0.0), F.lit(10.0), 8).alias("hi"),
        layout._quantize(F.lit(0.0), F.lit(0.0), F.lit(10.0), 8).alias("lo"),
        layout._quantize(F.lit(7.0), F.lit(7.0), F.lit(7.0), 8).alias("flat"),
    ).first()
    assert df["lo"] == 0 and df["hi"] == 255 and df["mid"] == 127
    assert df["flat"] == 0


def test_zorder_pruning_skips_files_and_loses_nothing(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "zord")
    layout.zorder_write(e, path, "user_id", "value", bits=8, n_files=16)
    zones = layout.zonemap(spark, path, ["user_id", "value"])
    ranges = {"user_id": (10, 30), "value": (5.0, 20.0)}
    pruned, n_read, n_total = layout.pruned_read(spark, path, zones, ranges)
    # a small rectangle over a z-clustered layout must SKIP files
    assert n_total >= 8 and n_read < n_total
    full = e.filter(
        (F.col("user_id") >= 10) & (F.col("user_id") <= 30)
        & (F.col("value") >= 5.0) & (F.col("value") <= 20.0)
    )
    assert sorted(r["event_id"] for r in pruned.collect()) == sorted(
        r["event_id"] for r in full.collect()
    )
    # empty rectangle -> zero files, empty frame, schema intact
    nothing, n0, _ = layout.pruned_read(
        spark, path, zones, {"user_id": (10**9, 2 * 10**9)}
    )
    assert n0 == 0 and nothing.count() == 0
    assert set(nothing.columns) == {"event_id", "user_id", "value"}


def test_zorder_beats_single_column_sort_on_secondary(spark, sf_dir, tmp_path):
    """The point of Z-order: a predicate on the SECOND column alone still
    prunes, where a primary-sorted layout scatters it across every file."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    layout.zorder_write(e, zpath, "user_id", "value", bits=8, n_files=16)
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(spath)
    )
    rect = {"value": (0.0, 10.0)}
    _, z_read, z_tot = layout.pruned_read(
        spark, zpath, layout.zonemap(spark, zpath, ["user_id", "value"]), rect
    )
    _, s_read, s_tot = layout.pruned_read(
        spark, spath, layout.zonemap(spark, spath, ["user_id", "value"]), rect
    )
    assert z_read < z_tot          # z-order prunes on the secondary column
    assert s_read == s_tot         # primary sort cannot


def test_hilbert_key_matches_reference():
    """The vectorized kernel equals the textbook scalar xy2d walk, and
    consecutive Hilbert keys are spatially adjacent (|dx|+|dy| == 1 —
    the locality property Morton lacks)."""
    import numpy as np

    from fusionspark.operators.layout import hilbert_key_np

    bits = 4
    n = 1 << bits

    def ref_xy2d(x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    got = hilbert_key_np(xs, ys, bits)
    assert list(got) == [ref_xy2d(int(x), int(y)) for x, y in zip(xs, ys)]
    # bijection over the full grid + unit-step adjacency along the curve
    order = np.argsort(got)
    assert len(set(got.tolist())) == n * n
    dx = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (dx == 1).all()


def test_hilbert_pruning_skips_files_and_loses_nothing(spark, sf_dir, tmp_path):
    from fusionspark.operators import layout

    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    path = str(tmp_path / "hl")
    layout.hilbert_write(e, path, "user_id", "value", bits=8, n_files=16)
    zones = layout.zonemap(spark, path, ["user_id", "value"])
    rect = {"user_id": (10, 30), "value": (5.0, 20.0)}
    df, n_read, n_total = layout.pruned_read(spark, path, zones, rect)
    assert n_total == 16 and n_read < n_total
    full = e.filter(
        (F.col("user_id") >= 10) & (F.col("user_id") <= 30)
        & (F.col("value") >= 5.0) & (F.col("value") <= 20.0)
    )
    got = {tuple(r) for r in df.select("event_id", "user_id", "value").collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
