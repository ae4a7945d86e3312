"""Deletion-vector support: Z85 + roaring codec unit tests against the
public format spec, DV file round trips with checksum verification, and
the end-to-end Delta read path (minReaderVersion-3 tables whose rows
are soft-deleted behind DVs — the shape modern Delta DML writes)."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from fusionspark.storage.delta import (
    DeltaProtocolError,
    apply_deletion_vector,
    read_delta,
    resolve_snapshot,
    write_checkpoint,
    write_delta_table,
)
from fusionspark.storage.dv import (
    inline_dv_descriptor,
    read_dv,
    roaring_array_deserialize,
    roaring_array_serialize,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    """The ZeroMQ spec 32 reference vector: 0x86 0x4F 0xD2 0x6F 0xB5
    0x59 0xF7 0x5B encodes to 'HelloWorld'."""
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not a multiple of 4


@pytest.mark.parametrize(
    "indexes",
    [
        [],
        [0],
        [0, 1, 5, 100, 65535, 65536, 70000],
        list(range(5000)),  # > 4096 forces a bitmap container
        [2**32 - 1, 2**32, 2**32 + 7, 3 * 2**32 + 1],  # multi-bitmap
    ],
)
def test_roaring_roundtrip(indexes):
    data = roaring_array_serialize(indexes)
    assert roaring_array_deserialize(data) == sorted(indexes)


def test_roaring_run_container_deserializes():
    """Real writers emit run containers (cookie 12347) after compaction;
    hand-assemble one and check the deserializer expands it."""
    # one run container, key 0, runs [(10, len 3), (100, len 1)]
    cookie = 12347 | ((1 - 1) << 16)
    buf = struct.pack("<I", cookie)
    buf += bytes([0b1])  # container 0 is a run container
    buf += struct.pack("<HH", 0, 5 - 1)  # key 0, cardinality 5
    # < NO_OFFSET_THRESHOLD containers with run cookie → no offset header
    buf += struct.pack("<H", 2)  # two runs
    buf += struct.pack("<HH", 10, 2)  # 10,11,12
    buf += struct.pack("<HH", 100, 0)  # 100
    data = struct.pack("<iq", 1681511377, 1) + buf
    assert roaring_array_deserialize(data) == [10, 11, 12, 100]


def test_dv_file_roundtrip_and_checksum(tmp_path):
    t = str(tmp_path)
    idx = [0, 3, 9, 4097, 2**20]
    desc = write_dv_file(t, idx)
    assert desc["storageType"] == "u" and desc["cardinality"] == len(idx)
    assert read_dv(t, desc) == idx
    # corrupting one byte of the bitmap must fail the CRC, not return rows
    from fusionspark.storage.dv import dv_file_path

    path = dv_file_path(t, desc["pathOrInlineDv"])
    raw = bytearray(open(path, "rb").read())
    raw[10] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        read_dv(t, desc)


def test_inline_dv_roundtrip(tmp_path):
    idx = [1, 2, 3, 70000]
    desc = inline_dv_descriptor(idx)
    assert desc["storageType"] == "i"
    assert read_dv(str(tmp_path), desc) == idx


def _df(spark, lo, hi):
    # one data file per commit: DV tests need multi-row files to mask
    return spark.range(lo, hi).coalesce(1).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def _row_index_map(spark, table_path, rel):
    """(row id → parquet row index) for one data file."""
    rows = (
        spark.read.parquet(os.path.join(table_path, rel))
        .select("id", F.col("_metadata.row_index").alias("ri"))
        .collect()
    )
    return {r["id"]: r["ri"] for r in rows}


def test_dv_end_to_end(spark, tmp_path):
    """Soft-delete rows of one file behind an on-disk DV: the snapshot
    read drops exactly those rows, time travel still sees them, and the
    protocol gate accepts the v3 deletionVectors feature."""
    t = str(tmp_path / "dvt")
    write_delta_table(spark, _df(spark, 0, 10), t)          # v0
    write_delta_table(spark, _df(spark, 10, 20), t, mode="append")  # v1
    snap = resolve_snapshot(spark, t)
    rel = next(p for p in sorted(snap.files) if p.startswith("part-00000-"))
    rim = _row_index_map(spark, t, rel)
    dead_ids = [i for i in rim if i % 3 == 0]
    v2 = apply_deletion_vector(spark, t, rel, sorted(rim[i] for i in dead_ids))
    assert v2 == 2

    got = sorted(r["id"] for r in read_delta(spark, t).collect())
    want = sorted(set(range(20)) - set(dead_ids))
    assert got == want
    # values of surviving rows are intact
    assert all(
        r["v"] == r["id"] * 2 for r in read_delta(spark, t).collect()
    )
    # time travel to v1 sees every row
    assert sorted(
        r["id"] for r in read_delta(spark, t, version=1).collect()
    ) == list(range(20))
    # snapshot metadata carries the descriptor
    snap2 = resolve_snapshot(spark, t)
    assert rel in snap2.dvs and snap2.dvs[rel]["cardinality"] == len(dead_ids)


def test_dv_replaced_by_wider_dv(spark, tmp_path):
    """A second DV commit on the same file REPLACES the first (Delta
    DML rewrites the whole descriptor, it does not merge)."""
    t = str(tmp_path / "dvr")
    write_delta_table(spark, _df(spark, 0, 10), t)
    snap = resolve_snapshot(spark, t)
    rel = sorted(snap.files)[0]
    rim = _row_index_map(spark, t, rel)
    ids = sorted(rim)
    apply_deletion_vector(spark, t, rel, [rim[ids[0]]])
    apply_deletion_vector(
        spark, t, rel, sorted([rim[ids[0]], rim[ids[1]], rim[ids[2]]])
    )
    got = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert got == ids[3:]
    # and an inline DV works through the same path
    t2 = str(tmp_path / "dvi")
    write_delta_table(spark, _df(spark, 0, 8), t2)
    snap = resolve_snapshot(spark, t2)
    rel2 = sorted(snap.files)[0]
    rim2 = _row_index_map(spark, t2, rel2)
    ids2 = sorted(rim2)
    apply_deletion_vector(
        spark, t2, rel2, [rim2[ids2[0]], rim2[ids2[-1]]], inline=True
    )
    got2 = sorted(r["id"] for r in read_delta(spark, t2).collect())
    assert got2 == ids2[1:-1]


def test_dv_survives_checkpoint(spark, tmp_path):
    """Checkpoint replay must preserve the DV descriptors (a checkpoint
    that dropped them would silently resurrect deleted rows)."""
    t = str(tmp_path / "dvc")
    write_delta_table(spark, _df(spark, 0, 12), t)
    snap = resolve_snapshot(spark, t)
    rel = sorted(snap.files)[0]
    rim = _row_index_map(spark, t, rel)
    ids = sorted(rim)
    dead = ids[:2]
    apply_deletion_vector(spark, t, rel, sorted(rim[i] for i in dead))
    ckv = write_checkpoint(spark, t)
    # log-clean every JSON the checkpoint covers: the checkpoint is now
    # the only source of the adds, the protocol AND the DV
    for v in range(0, ckv + 1):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    got = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert got == [i for i in range(12) if i not in set(dead)]
    snap2 = resolve_snapshot(spark, t)
    assert rel in snap2.dvs and int(snap2.dvs[rel]["cardinality"]) == 2


def test_other_v3_features_still_refused(spark, tmp_path):
    import json

    t = str(tmp_path / "v3")
    write_delta_table(spark, _df(spark, 0, 3), t)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors", "columnMapping"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, t)
