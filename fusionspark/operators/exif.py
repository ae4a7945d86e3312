"""EXIF metadata: a real TIFF 6.0 / EXIF 2.x IFD writer and parser.

Not in the reference (multimodal scale addition): image curation at
100 TB reads camera metadata (orientation, timestamp, make/model) long
before it decodes pixels — dedup by capture time, orientation-aware
resize planning, camera-source stratification.  EXIF is an APP1 segment
(`Exif\\0\\0` + an embedded TIFF file), so the parser here is a real
TIFF walker: byte-order mark (II little / MM big), magic 42, IFD entry
tables of (tag, type, count, value-or-offset) with the 4-byte
inline-vs-offset rule.

Grammar references: TIFF 6.0 §2 (image file header, IFD structure),
EXIF 2.32 §4.5 (APP1 layout).  The JPEG segment walk mirrors
operators/jpeg.py's marker loop (T.81 B.1.1.3).
"""

from __future__ import annotations

import struct

# IFD entry types we emit/parse (TIFF 6.0 §2: Types)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_NAMES = {
    TAG_MAKE: "make",
    TAG_MODEL: "model",
    TAG_ORIENTATION: "orientation",
    TAG_DATETIME: "datetime",
}


def build_exif(
    make: str,
    model: str,
    orientation: int,
    datetime_str: str,
    endian: str = "II",
) -> bytes:
    """Build an EXIF APP1 payload (`Exif\\0\\0` + TIFF) carrying IFD0 with
    Make/Model (ASCII), Orientation (SHORT, inline), DateTime (ASCII,
    20 bytes by the EXIF spec).  ASCII values longer than 4 bytes are
    placed after the IFD with their offsets recorded in the entry — the
    real TIFF layout, not a simplification."""
    if endian not in ("II", "MM"):
        raise ValueError("endian must be 'II' or 'MM'")
    e = "<" if endian == "II" else ">"
    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation is 1..8")

    entries = []  # (tag, type, count, inline_bytes | ("offset", payload))
    for tag, s in ((TAG_MAKE, make), (TAG_MODEL, model)):
        raw = s.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(raw), raw))
    entries.append((TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation)))
    dt = datetime_str.encode("ascii") + b"\x00"
    if len(dt) != 20:
        raise ValueError("DateTime must be 'YYYY:MM:DD HH:MM:SS' (19 chars)")
    entries.append((TAG_DATETIME, 2, len(dt), dt))
    entries.sort(key=lambda t: t[0])  # TIFF requires ascending tag order

    # TIFF header (8 bytes) + count (2) + entries (12 each) + next-IFD (4)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    body = bytearray()
    table = bytearray(struct.pack(e + "H", len(entries)))
    for tag, typ, cnt, raw in entries:
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(e + "I", data_off + len(body))
            body += raw
        table += struct.pack(e + "HHI", tag, typ, cnt) + val
    table += struct.pack(e + "I", 0)  # no IFD1
    tiff = (
        endian.encode("ascii")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", ifd_off)
        + bytes(table)
        + bytes(body)
    )
    return b"Exif\x00\x00" + tiff


def app1_segment(exif_payload: bytes) -> bytes:
    """Wrap an EXIF payload as a JPEG APP1 segment (marker 0xFFE1; the
    2-byte length counts itself, T.81 B.1.1.4)."""
    return b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload


def insert_app1(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Splice an APP1 EXIF segment immediately after SOI — where every
    camera writes it (EXIF 2.32 §4.5.4)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (missing SOI)")
    return jpeg[:2] + app1_segment(exif_payload) + jpeg[2:]


def parse_tiff_ifd0(tiff: bytes) -> dict:
    """Walk a TIFF header + IFD0 and return the known tags (TAG_NAMES)
    plus `endian` and `n_entries`.  Honors both byte orders, the 4-byte
    inline-vs-offset rule, ASCII NUL termination, and SHORT/LONG inline
    packing; bounds-checked so truncated tables raise instead of reading
    garbage."""
    if len(tiff) < 8:
        raise ValueError("TIFF header truncated")
    bom = tiff[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {bom!r}")
    (magic,) = struct.unpack_from(e + "H", tiff, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (want 42)")
    (ifd_off,) = struct.unpack_from(e + "I", tiff, 4)
    if ifd_off + 2 > len(tiff):
        raise ValueError("IFD0 offset beyond payload")
    (n,) = struct.unpack_from(e + "H", tiff, ifd_off)
    end = ifd_off + 2 + 12 * n + 4
    if end > len(tiff):
        raise ValueError(f"IFD0 declares {n} entries but table exceeds payload")
    out: dict = {"endian": bom.decode(), "n_entries": int(n)}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, base)
        if typ not in _TYPE_SIZES:
            continue  # unknown type: skip per TIFF reader guidance
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            raw = tiff[base + 8 : base + 8 + size]
        else:
            (off,) = struct.unpack_from(e + "I", tiff, base + 8)
            if off + size > len(tiff):
                raise ValueError(f"tag 0x{tag:04x} value exceeds payload")
            raw = tiff[off : off + size]
        if tag not in TAG_NAMES:
            continue
        name = TAG_NAMES[tag]
        if typ == 2:  # ASCII
            out[name] = raw.split(b"\x00", 1)[0].decode("ascii")
        elif typ == 3:  # SHORT
            out[name] = int(struct.unpack_from(e + "H", raw, 0)[0])
        elif typ == 4:  # LONG
            out[name] = int(struct.unpack_from(e + "I", raw, 0)[0])
    return out


def parse_exif_jpeg(jpeg: bytes) -> dict:
    """Find the APP1 `Exif\\0\\0` segment in a JPEG and parse its IFD0.
    Walks the T.81 marker stream (the jpeg_decode loop shape) so EXIF
    placed after other APPn segments is still found; raises if no EXIF
    APP1 exists."""
    data = bytes(jpeg)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no EXIF ahead
            break
        if 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            return parse_tiff_ifd0(seg[6:])
        pos += seglen
    raise ValueError("no EXIF APP1 segment found")


def synth_exif_media(spark, sf_dir: str):
    """REAL JPEG+EXIF payloads, deterministically derived from doc_id —
    the synth_jpeg_media pattern with an APP1 EXIF segment spliced after
    SOI.  The tag laws (replayed arithmetically by the SQL oracle):

        endian      = II when doc_id is even, MM when odd (both byte
                      orders are exercised every gate)
        make        = 'Cam'  || doc_id % 5     (5 bytes + NUL → OFFSET value)
        model       = 'M'    || doc_id % 7     (2 bytes + NUL → INLINE value)
        orientation = 1 + doc_id % 8           (SHORT, inline)
        datetime    = 2026:01:<1+doc_id%28> 03:04:05  (20 bytes → offset)

    so one inline-ASCII, one offset-ASCII, one SHORT, and one long-ASCII
    entry exist in every file — the four TIFF value layouts.  The JPEG
    body is one constant 8×8 block (built once per executor batch; EXIF
    is the variable part)."""
    import numpy as np
    import pandas as pd

    from fusionspark.io import load_table
    from fusionspark.operators.jpeg import jpeg_encode

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def make_batch(batches):
        qb = np.zeros((1, 8, 8), dtype=np.int64)
        qb[0, 0, 0] = 1
        body = jpeg_encode(None, qblocks=qb, size=(8, 8))
        for pdf in batches:
            out = {"media_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                exif = build_exif(
                    make=f"Cam{d % 5}",
                    model=f"M{d % 7}",
                    orientation=1 + d % 8,
                    datetime_str=f"2026:01:{1 + d % 28:02d} 03:04:05",
                    endian="II" if d % 2 == 0 else "MM",
                )
                out["media_id"].append(d)
                out["payload"].append(insert_app1(body, exif))
            yield pd.DataFrame(out)

    return docs.mapInPandas(make_batch, schema="media_id bigint, payload binary")


def exif_fields(media):
    """Parse the EXIF IFD0 of every payload (one zero-shuffle Arrow map —
    metadata only, pixels never decode) → (media_id, endian, n_entries,
    make, model, orientation, datetime)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {
                "media_id": [], "endian": [], "n_entries": [], "make": [],
                "model": [], "orientation": [], "dt": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                t = parse_exif_jpeg(bytes(payload))
                out["media_id"].append(int(mid))
                out["endian"].append(t["endian"])
                out["n_entries"].append(t["n_entries"])
                out["make"].append(t["make"])
                out["model"].append(t["model"])
                out["orientation"].append(t["orientation"])
                out["dt"].append(t["datetime"])
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        schema=(
            "media_id bigint, endian string, n_entries bigint, make string,"
            " model string, orientation bigint, dt string"
        ),
    )
