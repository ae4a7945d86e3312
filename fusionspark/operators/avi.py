"""Real AVI (RIFF) container codec for MJPEG video — stdlib only.

The reference has no video pipeline at all; this is north-star multimodal
surface for the training-data engine: video rows are opaque BINARY columns,
frame sampling walks the REAL container index, and sampled frames decode
through the REAL baseline-JPEG codec (operators/jpeg.py).  MJPEG-in-AVI is
the one mainstream video format whose frame payloads are plain baseline
JPEGs, so the full sample→seek→decode chain runs with zero external codec
libraries — unlike MP4/AVC, which stays an honestly-stubbed boundary
(operators/mp4.py parses boxes but cannot decode H.264 pixels here).

Layout written/parsed (the OpenDML-free classic AVI profile):

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' '00dc'... )
      'idx1')

Parser behavior mirrors the other binary parsers in this repo (jpeg/mp4/
warc/wav): malformed or truncated structures raise ValueError — never
silently truncate, never hang (fuzz-covered in tests/test_avi.py).
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """Classic AVI writer: one MJPG video stream, one '00dc' chunk per
    frame, idx1 index (offsets relative to the 'movi' fourcc, the
    convention virtually every muxer uses)."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    us_per_frame = 1_000_000 // fps
    max_frame = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<10I",
        us_per_frame, max_frame * fps, 0, AVIF_HASINDEX, len(frames),
        0, 1, max_frame, width, height,
    ) + struct.pack("<4I", 0, 0, 0, 0)

    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_frame, 0)
        + struct.pack("<I", 0)              # sample_size
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx = bytearray()
    for f in frames:
        # idx1 offset points at the '00dc' fourcc, relative to the 'movi'
        # fourcc position; the movi payload below starts with b"movi".
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, 4 + len(movi_payload), len(f))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [pos, end); validates sizes strictly."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header at {pos}")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns parent: {size} bytes at {pos}")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_parse(payload: bytes) -> dict:
    """Parse an AVI container; returns stream metadata plus the frame
    index as (offset, size) byte ranges into the payload, so callers can
    seek+slice individual frames without copying the rest."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns buffer")
    if data[8:12] != b"AVI ":
        raise ValueError(f"not an AVI RIFF form: {data[8:12]!r}")

    meta: dict = {"frames": [], "streams": []}
    movi_start = None
    for fourcc, p, size in _walk(data, 12, 8 + riff_size):
        if fourcc == b"LIST":
            ltype = data[p : p + 4]
            if ltype == b"hdrl":
                _parse_hdrl(data, p + 4, p + size, meta)
            elif ltype == b"movi":
                movi_start = p
                for cfcc, cp, csize in _walk(data, p + 4, p + size):
                    if cfcc[2:4] in (b"dc", b"db", b"wb"):
                        meta["frames"].append((cp, csize))
        elif fourcc == b"idx1":
            meta["idx1_entries"] = size // 16

    if "us_per_frame" not in meta:
        raise ValueError("missing avih header")
    meta["movi_offset"] = movi_start
    meta["n_frames"] = len(meta["frames"])
    return meta


def _parse_hdrl(data: bytes, pos: int, end: int, meta: dict) -> None:
    for fourcc, p, size in _walk(data, pos, end):
        if fourcc == b"avih":
            if size < 40:
                raise ValueError("avih too small")
            vals = struct.unpack_from("<10I", data, p)
            meta.update(
                us_per_frame=vals[0], total_frames=vals[4],
                n_streams=vals[6], width=vals[8], height=vals[9],
            )
        elif fourcc == b"LIST" and data[p : p + 4] == b"strl":
            stream: dict = {}
            for sfcc, sp, ssize in _walk(data, p + 4, p + size):
                if sfcc == b"strh":
                    if ssize < 48:
                        raise ValueError("strh too small")
                    stream["type"] = data[sp : sp + 4].decode("ascii")
                    stream["handler"] = data[sp + 4 : sp + 8].decode("ascii")
                    scale, rate = struct.unpack_from("<II", data, sp + 20)
                    (length,) = struct.unpack_from("<I", data, sp + 32)
                    stream.update(scale=scale, rate=rate, length=length)
                elif sfcc == b"strf" and stream.get("type") == "vids":
                    if ssize < 40:
                        raise ValueError("strf BITMAPINFOHEADER too small")
                    _, w, h = struct.unpack_from("<Iii", data, sp)
                    comp = data[sp + 16 : sp + 20]
                    stream.update(bmp_width=w, bmp_height=h, compression=comp.decode("ascii"))
            meta["streams"].append(stream)


def avi_frame(payload: bytes, meta: dict, idx: int) -> bytes:
    """Slice frame `idx` out of the container (seek, no full-file decode)."""
    off, size = meta["frames"][idx]
    return bytes(payload)[off : off + size]
