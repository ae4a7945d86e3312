"""Data-layout query family (operators/layout.py): Z-order clustering +
zone-map file pruning.  The oracle is the plain relational answer over the
original table — equality proves the pruned scan loses no rows; the
pruning RATIO is asserted in tests/test_layout.py (file counts are a plan
property, not a row property)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import layout
from fusionspark.queries import query


@query(
    "zorder_pruning",
    """
    SELECT event_id, user_id, ROUND(value, 6) AS value
    FROM events
    WHERE user_id BETWEEN 10 AND 30 AND value BETWEEN 5.0 AND 20.0
    """,
)
def zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column rectangle query over a Z-ordered layout: events are
    written clustered by the Morton key of (user_id, value), the per-file
    zone map prunes files outside the rectangle, and only survivors are
    read + row-filtered.  Result ≡ the full-scan answer (the oracle); the
    file-skip ratio is the test-asserted part."""
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tmp = tempfile.mkdtemp(prefix="fusionspark-zorder-")
    try:
        layout.zorder_write(e, tmp, "user_id", "value", bits=8, n_files=16)
        zones = layout.zonemap(spark, tmp, ["user_id", "value"])
        df, _, _ = layout.pruned_read(
            spark, tmp, zones, {"user_id": (10, 30), "value": (5.0, 20.0)}
        )
        return df.select(
            "event_id", "user_id", F.round("value", 6).alias("value")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "hilbert_pruning",
    """
    SELECT event_id, user_id, ROUND(value, 6) AS value
    FROM events
    WHERE user_id BETWEEN 10 AND 30 AND value BETWEEN 5.0 AND 20.0
    """,
)
def hilbert_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zorder_pruning's Hilbert-curve sibling — the same rectangle query
    over events clustered by the Hilbert key of (user_id, value).
    Hilbert keeps consecutive keys spatially ADJACENT (Morton jumps
    across the plane at power-of-two seams), so range-partitioned files
    cover tighter rectangles and the identical zone map prunes at least
    as hard (locality comparison test-asserted; the result must equal
    the full-scan oracle — pruning loses no rows)."""
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tmp = tempfile.mkdtemp(prefix="fusionspark-hilbert-")
    try:
        layout.hilbert_write(e, tmp, "user_id", "value", bits=8, n_files=16)
        zones = layout.zonemap(spark, tmp, ["user_id", "value"])
        df, _, _ = layout.pruned_read(
            spark, tmp, zones, {"user_id": (10, 30), "value": (5.0, 20.0)}
        )
        return df.select(
            "event_id", "user_id", F.round("value", 6).alias("value")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
