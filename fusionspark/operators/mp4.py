"""ISO-BMFF (MP4) box-level metadata — pure stdlib struct, written from the
public ISO/IEC 14496-12 box grammar.

Upgrades the video column from fully-stubbed to metadata-real: training
pipelines filter/shard video corpora on duration, track kinds, resolution,
and sample counts long before any frame is decoded, and all of that lives
in the `moov` box tree, which this module walks for real — `ftyp` brand,
`mvhd` timescale/duration, per-track `tkhd` dimensions, `mdhd`
timescale/duration, `hdlr` handler kind (vide/soun), and `stsz` sample
count/bytes.  Frame/pixel decode for AVC I_PCM streams lives in
operators/avc.py (r9) — sample extraction via the real stsd/avcC/stco
tables plus baseline H.264 decode; arbitrary CAVLC/CABAC-coded video
still wants a production codec and raises a clear NotImplementedError
there (the documented alternative: the MJPEG-in-AVI path decodes any
frame for real, and pipeline-generated AVC conformance streams decode
through avc.py).

The writer exists for the same reason png_encode/wav_encode/jpeg_encode do:
it's the only way to get real byte streams here, and round-trip tests +
closed-form oracles need deterministic inputs.  It emits a minimal valid
box tree (ftyp / moov[mvhd, trak[tkhd, mdia[mdhd, hdlr, minf[stbl[stsd,
stts, stsc, stsz, stco]]]]] / mdat), including 64-bit `largesize` handling
in the parser.

Scale shape: parsing runs inside Arrow-batched mapInPandas kernels; the
extracted metadata lands as ordinary columns that push down, and metadata
queries never touch the payload column (Parquet column pruning keeps the
blobs on disk).
"""

from __future__ import annotations

import struct

# ── writer (test-vector generator) ────────────────────────────────────────


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def mp4_encode(
    tracks: list[dict],
    movie_timescale: int = 1000,
    movie_duration: int = 0,
    brand: bytes = b"isom",
    mdat: bytes = b"",
    use_largesize: bool = False,
) -> bytes:
    """Minimal ISO-BMFF writer.  Each track dict: {kind: 'vide'|'soun',
    timescale, duration, width, height, sample_sizes: list[int]}.
    `use_largesize` wraps mdat in a size==1 + 64-bit largesize header to
    exercise that parser branch."""
    trak_boxes = b""
    for i, t in enumerate(tracks):
        ss = t.get("sample_sizes", [])
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">II", 0, 0)                  # creation/modification
            + struct.pack(">I", i + 1)                 # track_id
            + b"\x00" * 4
            + struct.pack(">I", t.get("duration", 0))
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)         # layer/altgroup/volume/rsv
            + b"\x00" * 36                             # identity matrix slot
            + struct.pack(">II", t.get("width", 0) << 16, t.get("height", 0) << 16),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">II", 0, 0)
            + struct.pack(">II", t["timescale"], t["duration"])
            + struct.pack(">HH", 0x55C4, 0),           # language 'und'
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + t["kind"].encode() + b"\x00" * 12 + b"\x00",
        )
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 0))
        stts = _full(
            b"stts", 0, 0,
            struct.pack(">III", 1, len(ss), max(1, t["duration"] // max(1, len(ss)))),
        )
        stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
        stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(ss)) + b"".join(struct.pack(">I", s) for s in ss),
        )
        stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak_boxes += _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", movie_timescale, movie_duration)
        + struct.pack(">I", 0x00010000)               # rate 1.0
        + struct.pack(">H", 0x0100)                   # volume 1.0
        + b"\x00" * 10
        + b"\x00" * 36
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    moov = _box(b"moov", mvhd + trak_boxes)
    if use_largesize:
        mdat_box = (
            struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat)) + mdat
        )
    else:
        mdat_box = _box(b"mdat", mdat)
    return ftyp + moov + mdat_box


# ── parser ────────────────────────────────────────────────────────────────

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(
                f"malformed box {typ!r} at {pos}: size {size} exceeds scope"
            )
        yield typ, body, pos + size
        pos += size


def mp4_parse(payload: bytes) -> dict:
    """Parse box-level metadata: returns {brand, timescale, duration_ms,
    tracks: [{kind, timescale, duration_ms, width, height, n_samples,
    sample_bytes}]}.  Raises ValueError on non-BMFF or malformed boxes."""
    data = bytes(payload)
    top = list(_walk(data, 0, len(data)))
    if not any(t == b"ftyp" for t, _, _ in top):
        raise ValueError("not an ISO-BMFF stream (missing ftyp)")
    out: dict = {"brand": None, "timescale": None, "duration_ms": None, "tracks": []}
    for typ, b0, b1 in top:
        if typ == b"ftyp":
            out["brand"] = data[b0 : b0 + 4].decode("ascii", "replace")
        elif typ == b"moov":
            _parse_moov(data, b0, b1, out)
    if out["timescale"] is None:
        raise ValueError("ISO-BMFF stream has no moov/mvhd")
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for typ, b0, b1 in _walk(data, start, end):
        if typ == b"mvhd":
            version = data[b0]
            if version == 1:
                ts, dur = struct.unpack(">IQ", data[b0 + 20 : b0 + 32])
            else:
                ts, dur = struct.unpack(">II", data[b0 + 12 : b0 + 20])
            out["timescale"] = ts
            out["duration_ms"] = (dur * 1000) // ts if ts else 0
        elif typ == b"trak":
            out["tracks"].append(_parse_trak(data, b0, b1))


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    t = {
        "kind": None, "timescale": None, "duration_ms": None,
        "width": 0, "height": 0, "n_samples": 0, "sample_bytes": 0,
    }
    for typ, b0, b1 in _walk(data, start, end):
        if typ == b"tkhd":
            version = data[b0]
            # width/height are the last 8 bytes, 16.16 fixed point
            w, h = struct.unpack(">II", data[b1 - 8 : b1])
            t["width"], t["height"] = w >> 16, h >> 16
        elif typ == b"mdia":
            for t2, c0, c1 in _walk(data, b0, b1):
                if t2 == b"mdhd":
                    version = data[c0]
                    if version == 1:
                        ts, dur = struct.unpack(">IQ", data[c0 + 20 : c0 + 32])
                    else:
                        ts, dur = struct.unpack(">II", data[c0 + 12 : c0 + 20])
                    t["timescale"] = ts
                    t["duration_ms"] = (dur * 1000) // ts if ts else 0
                elif t2 == b"hdlr":
                    t["kind"] = data[c0 + 8 : c0 + 12].decode("ascii", "replace")
                elif t2 == b"minf":
                    for t3, d0, d1 in _walk(data, c0, c1):
                        if t3 == b"stbl":
                            for t4, e0, e1 in _walk(data, d0, d1):
                                if t4 == b"stsz":
                                    fixed, count = struct.unpack(
                                        ">II", data[e0 + 4 : e0 + 12]
                                    )
                                    t["n_samples"] = count
                                    if fixed:
                                        t["sample_bytes"] = fixed * count
                                    else:
                                        sizes = struct.unpack(
                                            f">{count}I", data[e0 + 12 : e0 + 12 + 4 * count]
                                        )
                                        t["sample_bytes"] = sum(sizes)
    return t
