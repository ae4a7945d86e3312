"""REAL QOI codec ("Quite OK Image format", qoiformat.org spec 1.0) —
stdlib + numpy only; the NINTH real container format beside
PNG/JPEG/BMP/GIF/MP4/AVI/WAV/AVC.

Both directions are real and cover every QOI op: the encoder emits
QOI_OP_RUN (the pixel-doubling in the synthetic law guarantees runs),
QOI_OP_LUMA (the per-step channel deltas are chosen inside the luma
window: dg=5, dr-dg=-2, db-dg=7), QOI_OP_DIFF (tail padding steps by
(1,1,1)), QOI_OP_INDEX (the law wraps with period 96 so earlier pixels
recur while still seeded in the 64-slot index), and QOI_OP_RGB (the wrap
jump exceeds the luma window).  The decoder implements the full chunk
grammar, the running 64-entry index with hash (3r+5g+7b+11a) % 64, and
the 8-byte end marker check.

The reference stores opaque binary attachments but decodes nothing
(SURVEY §2: multimodal is beyond-reference).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

QOI_W, QOI_H = 24, 16

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB image as QOI (channels=3,
    colorspace=0 sRGB).  Greedy op selection in spec order:
    RUN > INDEX > DIFF > LUMA > RGB."""
    h, w, c = img.shape
    if c != 3:
        raise NotImplementedError("RGB only (channels=3)")
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, 3, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, 3)
    for r, g, b in flat.astype(int):
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        ih = _hash(r, g, b, 255)
        if index[ih] == (r, g, b, 255):
            out.append(_OP_INDEX | ih)
        else:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
            ):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((_OP_RGB, r, g, b))
        index[ih] = (r, g, b, 255)
        pr, pg, pb = r, g, b
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def qoi_decode(payload: bytes) -> np.ndarray:
    """Decode a QOI payload back to (H, W, 3) uint8 (alpha must stay 255 —
    RGBA sources raise, the honest boundary for the 3-channel pipeline)."""
    if payload[:4] != b"qoif":
        raise ValueError("not a QOI payload")
    w, h, channels, _cs = struct.unpack_from(">IIBB", payload, 4)
    if channels != 3:
        raise NotImplementedError("RGB only (channels=3)")
    if payload[-8:] != _END:
        raise ValueError("missing QOI end marker")
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    while i < n:
        byte = payload[pos]
        pos += 1
        if byte == _OP_RGB:
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            r, g, b, a = (
                payload[pos], payload[pos + 1], payload[pos + 2],
                payload[pos + 3],
            )
            pos += 4
            if a != 255:
                raise NotImplementedError("alpha != 255 in RGB pipeline")
        else:
            tag = byte & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((byte >> 4) & 0x03) - 2) % 256
                g = (g + ((byte >> 2) & 0x03) - 2) % 256
                b = (b + (byte & 0x03) - 2) % 256
            elif tag == _OP_LUMA:
                dg = (byte & 0x3F) - 32
                nxt = payload[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                out[i : i + run] = (r, g, b)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b)
        i += 1
    return out.reshape(h, w, 3)


def _law_planes(doc_id: int, n: int) -> np.ndarray:
    """The synthetic piecewise pixel law — chosen so EVERY QOI op fires:

    - k < 320: k2 = (k // 2) % 96 — pixels double (RUN), channel steps
      (3, 5, 12) per k2 sit inside the LUMA window, and the period-96
      wrap at k = 192 jumps outside it (RGB);
    - 320 <= k < 352: two pixels alternate (P, P+5) — each return to P
      is an index hit (INDEX; only one pixel intervenes, so the slot
      survives unless the two hashes collide, in which case the encoder
      lawfully falls back to LUMA);
    - 352 <= k < 384: channels step by (1, 1, 1) — inside the DIFF
      window (DIFF)."""
    ks = np.arange(n, dtype=np.int64)
    k2 = (ks // 2) % 96
    r = (doc_id * 7 + 3 * k2) % 256
    g = (doc_id * 11 + 5 * k2) % 256
    b = (doc_id * 3 + 12 * k2) % 256
    alt = 5 * (ks % 2)
    seg2 = ks >= 320
    r = np.where(seg2, (doc_id * 7 + 270 + alt) % 256, r)
    g = np.where(seg2, (doc_id * 11 + 450 + alt) % 256, g)
    b = np.where(seg2, (doc_id * 3 + 1080 + alt) % 256, b)
    seg3 = ks >= 352
    step = ks - 352
    r = np.where(seg3, (doc_id * 7 + 100 + step) % 256, r)
    g = np.where(seg3, (doc_id * 11 + 100 + step) % 256, g)
    b = np.where(seg3, (doc_id * 3 + 100 + step) % 256, b)
    return np.stack([r, g, b], axis=1).astype(np.uint8)


def synth_qoi_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL QOI payloads under the closed-form per-channel law (see
    _law_planes) over a 24x16 RGB grid."""
    import pandas as pd

    from fusionspark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    w, h = QOI_W, QOI_H

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "payload": [], "mime": [],
                "width": [], "height": [],
            }
            for doc_id in pdf["doc_id"]:
                img = _law_planes(int(doc_id), w * h).reshape(h, w, 3)
                out["media_id"].append(int(doc_id))
                out["payload"].append(qoi_encode(img))
                out["mime"].append("image/qoi")
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    # ids-only round-robin spread BEFORE the kernel (guide §4/§8): the
    # documents scan is one split at bench SFs, so without this the whole
    # per-pixel Python encode loop ran in ONE task; the shuffle moves
    # 8-byte ids, never payloads, and scales with the core count.
    return d.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        make,
        schema="media_id bigint, payload binary, mime string, width int, height int",
    )


def qoi_feature_stats(media: DataFrame) -> DataFrame:
    """Decode REAL QOI payloads; exact mean + position-weighted checksum
    over (pixel, channel) slots (the bmp feature contract: weight
    3k + c pins every byte to its slot)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "mean_intensity": [], "pix_checksum": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                flat = qoi_decode(bytes(payload)).astype(np.int64).reshape(-1)
                out["media_id"].append(mid)
                out["mean_intensity"].append(float(flat.sum()) / flat.size)
                out["pix_checksum"].append(
                    int(np.dot(flat, np.arange(flat.size, dtype=np.int64)))
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, mean_intensity double, pix_checksum bigint"
    )
