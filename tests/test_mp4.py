"""ISO-BMFF box parser tests (operators/mp4.py): round trips through the
minimal writer, 64-bit largesize handling, version-1 time boxes, size==0
tail boxes, and loud failures on malformed trees."""

from __future__ import annotations

import struct

import pytest

from fusionspark.operators.mp4 import _box, _full, mp4_encode, mp4_parse


def _two_tracks():
    return [
        {"kind": "vide", "timescale": 30000, "duration": 90000,
         "width": 640, "height": 360, "sample_sizes": [100, 120, 140]},
        {"kind": "soun", "timescale": 48000, "duration": 96000,
         "sample_sizes": [10] * 5},
    ]


def test_round_trip_two_tracks():
    data = mp4_encode(_two_tracks(), movie_duration=3000, mdat=b"x" * 64)
    meta = mp4_parse(data)
    assert meta["brand"] == "isom"
    assert meta["timescale"] == 1000 and meta["duration_ms"] == 3000
    v, a = meta["tracks"]
    assert v["kind"] == "vide" and (v["width"], v["height"]) == (640, 360)
    assert v["duration_ms"] == 3000 and v["n_samples"] == 3
    assert v["sample_bytes"] == 360
    assert a["kind"] == "soun" and a["duration_ms"] == 2000
    assert a["n_samples"] == 5 and a["sample_bytes"] == 50


def test_largesize_mdat_branch():
    plain = mp4_parse(mp4_encode(_two_tracks()))
    large = mp4_parse(mp4_encode(_two_tracks(), use_largesize=True))
    assert plain == large


def test_version1_time_boxes():
    """mvhd/mdhd version 1 use 64-bit durations — hand-built since the
    writer emits v0."""
    mvhd_v1 = _full(
        b"mvhd", 1, 0,
        struct.pack(">QQ", 0, 0)            # creation/modification (64-bit)
        + struct.pack(">IQ", 90000, 270000)  # timescale, duration
        + b"\x00" * (4 + 2 + 10 + 36 + 24 + 4),
    )
    data = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + _box(
        b"moov", mvhd_v1
    )
    meta = mp4_parse(data)
    assert meta["timescale"] == 90000 and meta["duration_ms"] == 3000
    assert meta["tracks"] == []


def test_size_zero_extends_to_scope_end():
    """A top-level box with size 0 runs to end of stream (spec: last box)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 5000)
        + b"\x00" * (4 + 2 + 10 + 36 + 24 + 4),
    )
    moov_payload = mvhd
    moov_size_zero = struct.pack(">I", 0) + b"moov" + moov_payload
    meta = mp4_parse(ftyp + moov_size_zero)
    assert meta["duration_ms"] == 5000


def test_malformed_trees_fail_loudly():
    with pytest.raises(ValueError):
        mp4_parse(b"not a box stream at all!")
    good = mp4_encode(_two_tracks())
    with pytest.raises(ValueError):
        mp4_parse(good[:40])  # moov size overruns the truncated buffer
    # a moov but no mvhd
    data = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + _box(
        b"moov", b""
    )
    with pytest.raises(ValueError):
        mp4_parse(data)


def test_spark_mp4_metadata_matches_law(spark):
    from fusionspark.operators import multimodal as MM

    m = MM.synth_mp4_media(spark, "/root/testdata/sf0.001").limit(30)
    rows = {r["media_id"]: r for r in MM.mp4_metadata_stats(m).collect()}
    for d, r in rows.items():
        assert r["duration_ms"] == 250 * (1 + d % 240)
        assert r["n_tracks"] == (2 if d % 2 == 0 else 1)
        nv = 8 + d % 24
        assert r["video_samples"] == nv
        assert r["video_bytes"] == sum(500 + (d * 7 + 11 * k) % 1000 for k in range(nv))
        if d % 2 == 0:
            na = 16 + d % 32
            assert r["audio_samples"] == na
            assert r["audio_bytes"] == sum(64 + (d * 5 + 3 * k) % 128 for k in range(na))
        else:
            assert r["audio_samples"] == 0 and r["audio_bytes"] == 0
