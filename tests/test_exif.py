"""EXIF/TIFF IFD grammar (operators/exif.py): writer/parser round trips
in both byte orders, the four value layouts, hand-built big-endian
fixtures, malformed-table hardening, and the JPEG APP1 segment walk."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fusionspark.operators import exif
from fusionspark.operators.jpeg import jpeg_encode


def _jpeg_body():
    qb = np.zeros((1, 8, 8), dtype=np.int64)
    qb[0, 0, 0] = 1
    return jpeg_encode(None, qblocks=qb, size=(8, 8))


@pytest.mark.parametrize("endian", ["II", "MM"])
def test_roundtrip_both_endians(endian):
    payload = exif.build_exif("CamX", "M3", 6, "2026:01:05 03:04:05", endian)
    t = exif.parse_tiff_ifd0(payload[6:])
    assert t == {
        "endian": endian, "n_entries": 4, "make": "CamX", "model": "M3",
        "orientation": 6, "datetime": "2026:01:05 03:04:05",
    }


def test_hand_built_big_endian_fixture():
    """Parser vs a byte-by-byte hand assembly (not the writer): MM order,
    one SHORT inline, one ASCII offset — catches a symmetric writer/
    parser endianness bug the round trip can't."""
    make = b"Nikon\x00"
    ifd = struct.pack(">H", 2)
    ifd += struct.pack(">HHI", 0x010F, 2, len(make)) + struct.pack(">I", 38)
    ifd += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8) + ifd + make
    assert len(tiff) == 38 + len(make)
    t = exif.parse_tiff_ifd0(tiff)
    assert t["make"] == "Nikon" and t["orientation"] == 8
    assert t["endian"] == "MM" and t["n_entries"] == 2


def test_inline_vs_offset_rule():
    """<=4 bytes inline, >4 offset: a 3-byte model must appear INSIDE its
    entry, a 6-byte make must not."""
    payload = exif.build_exif("CamAB", "M1", 1, "2026:01:01 00:00:00", "II")
    tiff = payload[6:]
    (n,) = struct.unpack_from("<H", tiff, 8)
    entries = {}
    for i in range(n):
        base = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", tiff, base)
        entries[tag] = (typ, cnt, tiff[base + 8 : base + 12])
    # model 'M1\0' = 3 bytes -> inline, padded
    assert entries[exif.TAG_MODEL][2] == b"M1\x00\x00"
    # make 'CamAB\0' = 6 bytes -> the 4 bytes are an offset, not text
    assert b"Cam" not in entries[exif.TAG_MAKE][2]
    (off,) = struct.unpack("<I", entries[exif.TAG_MAKE][2])
    assert tiff[off : off + 6] == b"CamAB\x00"


def test_malformed_tables_raise():
    good = exif.build_exif("CamX", "M3", 1, "2026:01:05 03:04:05", "II")[6:]
    with pytest.raises(ValueError, match="byte-order"):
        exif.parse_tiff_ifd0(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        exif.parse_tiff_ifd0(b"II" + struct.pack("<H", 43) + good[4:])
    # entry count beyond payload
    bad = good[:8] + struct.pack("<H", 999) + good[10:]
    with pytest.raises(ValueError, match="exceeds payload"):
        exif.parse_tiff_ifd0(bad)
    # truncated: offset value points past the end
    with pytest.raises(ValueError, match="value exceeds payload"):
        exif.parse_tiff_ifd0(good[:-4])
    with pytest.raises(ValueError, match="orientation"):
        exif.build_exif("a", "b", 9, "2026:01:05 03:04:05")
    with pytest.raises(ValueError, match="DateTime"):
        exif.build_exif("a", "b", 1, "short")


def test_jpeg_segment_walk_and_decode_tolerance():
    """APP1 found after SOI; still found after ANOTHER APPn segment; the
    JPEG itself still decodes with the EXIF spliced in (T.81 readers skip
    APPn); a JPEG with no EXIF raises."""
    from fusionspark.operators.jpeg import jpeg_decode

    body = _jpeg_body()
    payload = exif.build_exif("CamX", "M3", 2, "2026:01:05 03:04:05", "MM")
    with_exif = exif.insert_app1(body, payload)
    assert exif.parse_exif_jpeg(with_exif)["orientation"] == 2
    # splice a JFIF-style APP0 BEFORE the APP1 — walker must skip it
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    shifted = body[:2] + app0 + with_exif[2:]
    assert exif.parse_exif_jpeg(shifted)["make"] == "CamX"
    # pixels unaffected by metadata segments
    assert (jpeg_decode(with_exif) == jpeg_decode(body)).all()
    with pytest.raises(ValueError, match="no EXIF"):
        exif.parse_exif_jpeg(body)


def test_spark_exif_fields_match_laws(spark):
    sf = "/root/testdata/sf0.001"
    media = exif.synth_exif_media(spark, sf)
    rows = exif.exif_fields(media).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        d = r.media_id
        assert r.endian == ("II" if d % 2 == 0 else "MM")
        assert r.n_entries == 4
        assert r.make == f"Cam{d % 5}" and r.model == f"M{d % 7}"
        assert r.orientation == 1 + d % 8
        assert r.dt == f"2026:01:{1 + d % 28:02d} 03:04:05"
