"""Delta-format reader round trip: commits, time travel, tombstones,
partition-column re-attachment, checkpoint replay, and the honest
protocol gate — all without the delta-lake package (the fixture writer
emits the open _delta_log format)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fusionspark.storage.delta import (
    DeltaProtocolError,
    read_delta,
    remove_files,
    resolve_snapshot,
    write_checkpoint,
    write_delta_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t1")
    v0 = write_delta_table(spark, _df(spark, 0, 10), t)
    v1 = write_delta_table(spark, _df(spark, 10, 15), t, mode="append")
    assert (v0, v1) == (0, 1)
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == list(
        range(15)
    )
    assert sorted(
        r["id"] for r in read_delta(spark, t, version=0).collect()
    ) == list(range(10))


def test_remove_tombstones_files(spark, tmp_path):
    t = str(tmp_path / "t2")
    write_delta_table(spark, _df(spark, 0, 10), t)
    write_delta_table(spark, _df(spark, 10, 20), t, mode="append")
    snap = resolve_snapshot(spark, t)
    # tombstone every file from commit 0
    v0_files = [p for p in snap.files if p.startswith("part-00000-")]
    assert v0_files
    remove_files(t, v0_files)
    ids = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert ids == list(range(10, 20))
    # the tombstoned rows are still visible via time travel
    assert len(read_delta(spark, t, version=1).collect()) == 20


def test_partition_values_reattached_with_types(spark, tmp_path):
    t = str(tmp_path / "t3")
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).alias("bucket"), (F.col("id") * 10).alias("v")
    )
    write_delta_table(spark, df, t, partition_columns=["bucket"])
    out = read_delta(spark, t)
    # Delta stores partitionValues as strings; the reader must cast back
    assert dict(out.dtypes)["bucket"] == "bigint"
    got = {(r["id"], r["bucket"], r["v"]) for r in out.collect()}
    want = {(i, i % 3, i * 10) for i in range(12)}
    assert got == want
    # partition columns are NOT read from the data files
    snap = resolve_snapshot(spark, t)
    one = os.path.join(t, next(iter(snap.files)))
    assert "bucket" not in spark.read.parquet(one).columns


def test_checkpoint_plus_tail_replay(spark, tmp_path):
    t = str(tmp_path / "t4")
    write_delta_table(spark, _df(spark, 0, 5), t)
    write_delta_table(spark, _df(spark, 5, 10), t, mode="append")
    write_checkpoint(spark, t)  # checkpoint at version 1
    write_delta_table(spark, _df(spark, 10, 12), t, mode="append")  # v2 tail
    snap = resolve_snapshot(spark, t)
    assert snap.version == 2
    ids = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert ids == list(range(12))
    # the checkpoint alone reproduces version 1
    ids1 = sorted(r["id"] for r in read_delta(spark, t, version=1).collect())
    assert ids1 == list(range(10))


def test_protocol_gate_fails_loudly(spark, tmp_path):
    t = str(tmp_path / "t5")
    write_delta_table(spark, _df(spark, 0, 3), t)
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        # deletionVectors is implemented now (r15);
                        # v2Checkpoint is not and must still refuse
                        "readerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, t)


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))


def test_pruning_pushdown_reaches_scan(spark, tmp_path):
    """The snapshot read is an ordinary parquet relation — a filter on a
    data column must reach the scan as a pushed filter."""
    t = str(tmp_path / "t6")
    write_delta_table(spark, _df(spark, 0, 100), t)
    df = read_delta(spark, t).filter(F.col("v") > 100).select("id")
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(v), GreaterThan(v,100)]" in plan


def test_engine_attach_delta_read_only(spark, tmp_path):
    """attach_delta: search works over an external Delta table in the
    engine row shape; mutations refuse; drop detaches without deleting
    the table's files; a pinned version time-travels."""
    import pytest as _pytest

    from fusionspark.engine import FusionSparkEngine
    from fusionspark.operators.embedder import mock_embed

    t = str(tmp_path / "ext_table")
    rows = [
        (str(i), [float(x) for x in mock_embed(f"doc {i}", 64)],
         f"doc {i}", {}, None, 0, 0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "id: string, vector: array<float>, content: string, "
        "metadata: map<string,string>, tenant_id: string, ts: long, "
        "ttl_ms: long",
    )
    write_delta_table(spark, df.limit(10), t)
    write_delta_table(
        spark,
        df.filter(F.col("id").cast("int") >= 10),
        t,
        mode="append",
    )

    eng = FusionSparkEngine(spark, str(tmp_path / "root"))
    eng.attach_delta("ext", t)
    hits = eng.search("ext", query_text="doc 7", top_k=3)
    assert hits and hits[0]["id"] == "7"
    sizes = {c["name"]: c["size"] for c in eng.list_collections()}
    assert sizes["ext"] == 20

    with _pytest.raises(ValueError, match="read-only"):
        eng.insert("ext", [{"id": "x", "content": "nope"}])
    with _pytest.raises(ValueError, match="read-only"):
        eng.delete("ext", ["7"])

    # pinned time travel sees only version 0
    eng.attach_delta("ext_v0", t, version=0)
    sizes = {c["name"]: c["size"] for c in eng.list_collections()}
    assert sizes["ext_v0"] == 10

    # detach never touches the external files
    eng.drop_collection("ext")
    assert os.path.isdir(os.path.join(t, "_delta_log"))
    assert len(read_delta(spark, t).collect()) == 20


def test_mcp_tool_attach_delta(spark, tmp_path):
    """The MCP/tool surface exposes attach_delta and searches the
    attached table through the same dispatch as the other tools."""
    from fusionspark.engine import FusionSparkEngine
    from fusionspark.operators.embedder import mock_embed
    from fusionspark.server import Router

    t = str(tmp_path / "ext2")
    rows = [
        (str(i), [float(x) for x in mock_embed(f"item {i}", 64)],
         f"item {i}", {}, None, 0, 0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "id: string, vector: array<float>, content: string, "
        "metadata: map<string,string>, tenant_id: string, ts: long, "
        "ttl_ms: long",
    )
    write_delta_table(spark, df, t)
    eng = FusionSparkEngine(spark, str(tmp_path / "root2"))
    srv = Router(eng)
    manifest = srv.tool_manifest()
    names = {tl["name"] for tl in manifest["tools"]}
    assert "fusionspark_attach_delta" in names
    out = srv.call_tool("fusionspark_attach_delta", {"name": "ext2", "path": t})
    assert out["result"]["name"] == "ext2"
    hits = srv.call_tool(
        "fusionspark_search", {"collection": "ext2", "query": "item 3", "topK": 2}
    )["result"]
    assert hits and hits[0]["id"] == "3"


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    """Tombstoning every file yields an EMPTY frame with the table
    schema, not an error."""
    t = str(tmp_path / "t7")
    write_delta_table(spark, _df(spark, 0, 5), t)
    snap = resolve_snapshot(spark, t)
    remove_files(t, sorted(snap.files))
    out = read_delta(spark, t)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "v"]
