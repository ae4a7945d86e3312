"""Multimodal columns for training-data pipelines (north-star addition,
BASELINE.json): image/audio/video as opaque BINARY columns with typed
metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing — schemas, deterministic synthesis from the driver
tables, partition-friendly batch shapes, UDF signatures — is real and
tested; the actual codec work (JPEG decode, resampling, frame extraction)
needs image/audio libraries this container doesn't ship, so the decode
kernels are STUBS: a clearly-marked NotImplementedError path plus a
deterministic fake used by tests and queries.

Design rules at 100 TB:
- media bytes live in their own column (Parquet keeps them OUT of row
  groups read by metadata-only queries — column pruning means a
  `WHERE width > 512` scan never touches the payload);
- derived features (dims, duration, phash) are materialized as ordinary
  columns at ingest so downstream filters push down;
- kernels are mapInPandas over BINARY columns — one Arrow batch in,
  one out, no per-row Python calls;
- `spark.sql.files.maxPartitionBytes` (not row count) sizes the splits,
  so huge blobs don't skew partitions.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, n_channels int"
)


# ── deterministic synthetic media (no codecs needed) ──────────────────────

def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic `media` table from the driver's documents:
    payload bytes are a seeded function of doc_id, metadata columns are
    derived arithmetically — reproducible anywhere, no files, no codecs."""
    from fusionspark.io import load_table

    d = load_table(spark, sf_dir, "documents")

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms", "n_channels")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                kind = ("image", "audio", "video")[doc_id % 3]
                seed = hashlib.md5(f"media:{doc_id}".encode()).digest()
                payload = (seed * ((64 + doc_id % 129) // len(seed) + 1))[: 64 + doc_id % 129]
                rows["media_id"].append(doc_id)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["mime"].append(
                    {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind]
                )
                rows["width"].append(int(16 * (1 + doc_id % 64)) if kind != "audio" else 0)
                rows["height"].append(int(16 * (1 + doc_id % 48)) if kind != "audio" else 0)
                rows["duration_ms"].append(int(250 * (1 + doc_id % 240)) if kind != "image" else 0)
                rows["n_channels"].append(3 if kind == "image" else (2 if kind == "audio" else 3))
            yield pd.DataFrame(rows)

    return d.select("doc_id", "text").mapInPandas(make, schema=MEDIA_SCHEMA)


# ── kernels (stubbed decode, real plumbing) ───────────────────────────────

def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: tiles the payload bytes into an
    (h, w) uint8 plane.  Stands in for a JPEG/PNG decode."""
    w, h = max(4, min(width, 32)), max(4, min(height, 32))
    buf = np.frombuffer((payload * ((w * h) // max(1, len(payload)) + 1))[: w * h], dtype=np.uint8)
    return buf.reshape(h, w)


# ── real PNG codec (stdlib-only: zlib inflate + filter reconstruction) ────

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step).
# The interlaced IDAT is the concatenation of 7 independently-filtered
# reduced images; passes that are empty at the image size emit nothing.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _filter_scanlines(
    rows: list[bytes], ch: int, row_filters: list[int] | None, base: int
) -> bytearray:
    """PNG spec §9 scanline filtering over one (sub)image: each output
    scanline is 1 filter-type byte + filtered bytes; the previous-row
    state starts at zeros (fresh per reduced image, per spec)."""
    raw = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for y, row in enumerate(rows):
        # modulo: an Adam7 image emits MORE scanlines than its height
        # (each pass re-covers rows at reduced width), so the filter list
        # cycles; for the sequential path (base 0, y < h == len) this is
        # the identity and output bytes are unchanged
        t = (
            (row_filters[(base + y) % len(row_filters)] if row_filters else 0)
            % 5
        )
        raw.append(t)
        for i, x in enumerate(row):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if t == 0:
                f = x
            elif t == 1:
                f = (x - a) & 0xFF
            elif t == 2:
                f = (x - b) & 0xFF
            elif t == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _paeth(a, b, c)) & 0xFF
            raw.append(f)
        prev = row
    return raw


def png_encode(
    plane: np.ndarray,
    row_filters: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal PNG writer (8-bit greyscale / RGB / RGBA) — exists so the
    decoder has REAL byte streams to chew on in this codec-less container.
    `row_filters` picks the per-scanline filter type (0-4; for interlaced
    images it indexes scanlines in EMISSION order across the 7 passes);
    encoding with all five exercises every reconstruction branch of
    png_decode.  `interlace=True` writes Adam7 (IHDR interlace byte 1,
    seven independently-filtered reduced images) — the non-interlaced
    output is byte-identical to what this writer always produced."""
    import struct as _struct
    import zlib

    arr = np.ascontiguousarray(np.asarray(plane, dtype=np.uint8))
    if arr.ndim == 2:
        h, w = arr.shape
        ct, ch = 0, 1
    else:
        h, w, ch = arr.shape
        ct = {1: 0, 3: 2, 4: 6}[ch]
    if interlace:
        raw = bytearray()
        emitted = 0
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = [np.ascontiguousarray(sub[y]).tobytes() for y in range(sub.shape[0])]
            raw += _filter_scanlines(rows, ch, row_filters, emitted)
            emitted += len(rows)
    else:
        rows = [arr[y].tobytes() for y in range(h)]
        raw = _filter_scanlines(rows, ch, row_filters, 0)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            _struct.pack(">I", len(payload))
            + typ
            + payload
            + _struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1 if interlace else 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _unfilter_scanlines(
    raw: bytes, p: int, n_rows: int, stride: int, ch: int
) -> tuple[bytes, int]:
    """PNG spec §9 filter reconstruction over one (sub)image starting at
    offset p; returns (reconstructed bytes, new offset).  Previous-row
    state starts at zeros — fresh per reduced image, per spec."""
    out = bytearray()
    prev = bytes(stride)
    for _y in range(n_rows):
        if p >= len(raw):
            raise ValueError("PNG IDAT truncated")
        t = raw[p]
        p += 1
        row = bytearray(raw[p : p + stride])
        if len(row) != stride:
            raise ValueError("PNG IDAT truncated")
        p += stride
        if t == 1:
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif t == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif t == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif t == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif t != 0:
            raise ValueError(f"unknown PNG filter type {t}")
        out += row
        prev = bytes(row)
    return bytes(out), p


def png_decode(payload: bytes) -> np.ndarray:
    """Stdlib-only PNG decoder: chunk walk → IDAT concat → zlib inflate →
    per-scanline filter reconstruction (None/Sub/Up/Average/Paeth, PNG spec
    §9).  Supports 8-bit depth, color types 0 (grey) / 2 (RGB) / 6 (RGBA),
    both progressive orders: sequential AND Adam7 interlace (the seven
    reduced images unfilter independently and scatter back through the
    §8.2 pass grid).  Returns (h, w) uint8 for greyscale, (h, w, ch)
    otherwise."""
    import struct as _struct
    import zlib

    payload = bytes(payload)
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG byte stream")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(payload):
        (ln,) = _struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ct, _comp, _filt, inter = _struct.unpack(">IIBBBBB", data)
            if depth != 8 or inter not in (0, 1) or ct not in (0, 2, 6):
                raise NotImplementedError(
                    f"png_decode supports 8-bit grey/RGB/RGBA, interlace 0/1 "
                    f"(got depth={depth}, color_type={ct}, interlace={inter})"
                )
            meta = (w, h, {0: 1, 2: 3, 6: 4}[ct], inter)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch, inter = meta
    raw = zlib.decompress(bytes(idat))
    if inter == 1:
        img = np.zeros((h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = len(range(x0, w, dx))
            ph = len(range(y0, h, dy))
            if pw == 0 or ph == 0:
                continue
            sub_bytes, p = _unfilter_scanlines(raw, p, ph, pw * ch, ch)
            sub = np.frombuffer(sub_bytes, dtype=np.uint8)
            sub = sub.reshape((ph, pw, ch) if ch > 1 else (ph, pw))
            img[y0::dy, x0::dx] = sub
        if p != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        return img
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out, _p = _unfilter_scanlines(raw, 0, h, stride, ch)
    arr = np.frombuffer(out, dtype=np.uint8)
    return arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, ch)


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real codec entry point.  PNG decodes for real (stdlib zlib + filter
    reconstruction above — no PIL needed); JPEG/audio/video codecs are not
    in this container, so those mimes stay honestly stubbed.  Multi-channel
    images collapse to a luminance plane (integer-rounded channel mean) so
    every caller sees the same (h, w) uint8 contract as _fake_decode."""
    data = bytes(payload)
    if mime == "image/png" or data[:8] == PNG_MAGIC:
        arr = png_decode(data)
        if arr.ndim == 3:
            arr = np.round(arr[:, :, :3].astype(np.float64).mean(axis=2)).astype(np.uint8)
        return arr
    if mime == "image/jpeg" or data[:2] == b"\xff\xd8":
        from fusionspark.operators.jpeg import jpeg_decode

        arr = jpeg_decode(data)
        if arr.ndim == 3:
            arr = np.round(arr[:, :, :3].astype(np.float64).mean(axis=2)).astype(np.uint8)
        return arr
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; PNG and baseline JPEG "
        "are supported stdlib-only — swap in PIL.Image.open / "
        "soundfile.read in production for exotic formats"
    )


PNG_W, PNG_H = 24, 16  # synth_png_media plane shape (384 pixels)


def synth_png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG payloads, deterministically derived from doc_id:
    plane[k] = (doc_id·7 + 3k) mod 251 over a 24×16 grid, encoded with
    scanline filters cycling 0-4 so a full decode exercises every
    reconstruction branch.  Because the pixel law is closed-form, decode
    features are SQL-replayable — the oracle never touches PNG bytes but
    still attests the whole encode→inflate→unfilter pipeline."""
    from fusionspark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    w, h = PNG_W, PNG_H

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ks = np.arange(w * h, dtype=np.int64)
        filters = [y % 5 for y in range(h)]
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "payload": [], "mime": [], "width": [], "height": []
            }
            for doc_id in pdf["doc_id"]:
                plane = ((int(doc_id) * 7 + 3 * ks) % 251).astype(np.uint8).reshape(h, w)
                out["media_id"].append(int(doc_id))
                out["payload"].append(png_encode(plane, row_filters=filters))
                out["mime"].append("image/png")
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    # ids-only round-robin spread BEFORE the kernel (guide §4/§8): the
    # documents scan is one split at bench SFs, so without this the whole
    # per-image encode loop runs in ONE task; the shuffle moves 8-byte ids,
    # never payloads, and scales with the core count, not a constant.
    return d.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        make, schema="media_id bigint, payload binary, mime string, width int, height int"
    )


def synth_png_interlaced_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Adam7-interlaced PNG payloads (IHDR interlace byte 1, seven
    independently-filtered reduced images) with the closed-form law
    plane[k] = (doc_id·11 + 5k) mod 241 over the 24×16 grid — the law is
    defined on NATURAL positions, so a decoder that mis-scatters any pass
    breaks the position-weighted checksum even if the totals survive.
    Filters still cycle 0-4 per emitted scanline, exercising every
    reconstruction branch within the reduced images too."""
    from fusionspark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    w, h = PNG_W, PNG_H

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ks = np.arange(w * h, dtype=np.int64)
        filters = [y % 5 for y in range(h)]
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "payload": [], "mime": []}
            for doc_id in pdf["doc_id"]:
                plane = ((int(doc_id) * 11 + 5 * ks) % 241).astype(np.uint8).reshape(h, w)
                out["media_id"].append(int(doc_id))
                out["payload"].append(
                    png_encode(plane, row_filters=filters, interlace=True)
                )
                out["mime"].append("image/png")
            yield pd.DataFrame(out)

    # ids-only spread before the kernel — see synth_png_media
    return d.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        make, schema="media_id bigint, payload binary, mime string"
    )


def png_feature_stats(media: DataFrame) -> DataFrame:
    """Decode REAL PNG payloads (decode_real → png_decode) and emit
    exact-arithmetic features: mean intensity (integer sum / n, bit-exact
    in float64) and a position-weighted checksum Σ v[k]·k that pins every
    pixel to its position — any filter-reconstruction slip changes it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "mean_intensity": [], "pix_checksum": []}
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                plane = decode_real(payload, mime).astype(np.int64).reshape(-1)
                out["media_id"].append(mid)
                out["mean_intensity"].append(float(plane.sum()) / plane.size)
                out["pix_checksum"].append(
                    int(np.dot(plane, np.arange(plane.size, dtype=np.int64)))
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "mime").mapInPandas(
        run, schema="media_id bigint, mean_intensity double, pix_checksum bigint"
    )


def phash_py(plane: np.ndarray) -> int:
    """64-bit block-mean perceptual hash of a (h, w) uint8 plane: 8×8 grid
    of block sums, bit (r*8+c) set iff its block mean exceeds the global
    mean.  All-integer compare (block_sum · n_px > total_sum · block_px) so
    the value is exact — bit-replayable in SQL from a closed-form pixel
    law.  Block edges are i·h//8 (uniform when 8 | h, w — e.g. the 24×16
    synth planes give 3×2 blocks).  Returned wrapped to signed int64 (bit
    63 → negative) to match Spark LongType / DuckDB BIGINT semantics."""
    p = np.asarray(plane, dtype=np.int64)
    h, w = p.shape
    total = int(p.sum())
    n_px = h * w
    val = 0
    for r in range(8):
        y0, y1 = r * h // 8, (r + 1) * h // 8
        for c in range(8):
            x0, x1 = c * w // 8, (c + 1) * w // 8
            bs = int(p[y0:y1, x0:x1].sum())
            bpx = (y1 - y0) * (x1 - x0)
            if bs * n_px > total * bpx:
                val |= 1 << (r * 8 + c)
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64(media: DataFrame) -> DataFrame:
    """(media_id, phash): decode REAL payloads (decode_real) and compute the
    64-bit block-mean perceptual hash — one Arrow-batched map, zero
    shuffle, the image sibling of the text SimHash signature map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "phash": []}
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                out["media_id"].append(mid)
                out["phash"].append(phash_py(decode_real(payload, mime)))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "mime").mapInPandas(
        run, schema="media_id bigint, phash bigint"
    )


def phash_neardup(media: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image-level near-dup: pHash signatures → SimHash-style prefix-band
    blocking (complete by pigeonhole for ≤ max_hamming differing bits) →
    exact bit_count(xor) verify.  Candidates only ever meet inside a shared
    (band, band_val) bucket — never an all-pairs join — so the plan is the
    100 TB shape: decode+hash is a per-row map, the only shuffle keys are
    the tiny band buckets and the final pair distinct."""
    from fusionspark.operators.dedup import simhash_bands

    ph = phash64(media)
    be = simhash_bands(
        ph, max_hamming, id_col="media_id", hash_col="phash", n_bits=64
    )
    a, b = be.alias("a"), be.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
        .distinct()
    )


def image_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode (stub) → per-image features: mean/std intensity + an 8×8
    average-hash.  One Arrow batch per task; payloads never leave the JVM
    except through Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "mean_intensity": [], "std_intensity": [], "ahash": []}
            for mid, payload, mime, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                if use_real_codecs:
                    plane = decode_real(payload, mime)  # pragma: no cover
                else:
                    plane = _fake_decode(payload, w, h)
                small = plane[: 8 * (plane.shape[0] // 8) or 8, : 8 * (plane.shape[1] // 8) or 8]
                # stats from EXACT integer moments (one float division /
                # sqrt at the end): engine-replayable bit-for-bit, where
                # np.mean/np.std pairwise float sums are ulp-order-
                # dependent and no SQL oracle could reproduce them
                n = plane.size
                s1 = int(plane.sum(dtype=np.int64))
                s2 = int((plane.astype(np.int64) ** 2).sum())
                mean = s1 / n
                var = max(0.0, s2 / n - mean * mean)
                gs = small.astype(np.int64).reshape(8, -1)
                bits = [
                    (int(g.sum()) / g.size) > mean for g in gs
                ]
                ahash = int(sum(int(b) << i for i, b in enumerate(bits)))
                out["media_id"].append(mid)
                out["mean_intensity"].append(mean)
                out["std_intensity"].append(math.sqrt(var))
                out["ahash"].append(ahash)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "mime", "width", "height")
        .mapInPandas(run, schema="media_id bigint, mean_intensity double, std_intensity double, ahash bigint")
    )


def resize_images(media: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """Resize kernel (stub decode + numpy block-mean downsample — the real
    path swaps in a codec + interpolation).  Returns BINARY planes of the
    target size: the output shape contract downstream training loaders
    rely on."""
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "resized": [], "out_width": [], "out_height": []}
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]):
                plane = _fake_decode(payload, w, h).astype(np.float64)
                ph, pw = plane.shape
                ys = np.linspace(0, ph, th + 1).astype(int)
                xs = np.linspace(0, pw, tw + 1).astype(int)
                res = np.zeros((th, tw), dtype=np.uint8)
                for i in range(th):
                    for j in range(tw):
                        block = plane[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)]
                        res[i, j] = np.uint8(block.mean())
                out["media_id"].append(mid)
                out["resized"].append(res.tobytes())
                out["out_width"].append(tw)
                out["out_height"].append(th)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, schema="media_id bigint, resized binary, out_width int, out_height int")
    )


def resize_media_real(media: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """REAL-codec resize: decode (PNG/JPEG via decode_real), block-mean
    downsample to `target`, return the resized plane bytes + exact-
    arithmetic attest columns (mean of resized plane, position-weighted
    checksum).  Downsampled pixels use uint8 truncation of the block mean
    (floor for non-negative values) — replayable as floor(sum/block_px)
    in SQL when the source pixel law is closed-form."""
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "resized": [], "out_width": [], "out_height": [],
                "mean_resized": [], "res_checksum": [],
            }
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                plane = decode_real(payload, mime).astype(np.float64)
                ph, pw = plane.shape
                ys = np.linspace(0, ph, th + 1).astype(int)
                xs = np.linspace(0, pw, tw + 1).astype(int)
                res = np.zeros((th, tw), dtype=np.uint8)
                for i in range(th):
                    for j in range(tw):
                        block = plane[
                            ys[i]: max(ys[i + 1], ys[i] + 1),
                            xs[j]: max(xs[j + 1], xs[j] + 1),
                        ]
                        res[i, j] = np.uint8(block.mean())
                flat = res.astype(np.int64).reshape(-1)
                out["media_id"].append(int(mid))
                out["resized"].append(res.tobytes())
                out["out_width"].append(tw)
                out["out_height"].append(th)
                out["mean_resized"].append(float(flat.sum()) / flat.size)
                out["res_checksum"].append(
                    int(np.dot(flat, np.arange(flat.size, dtype=np.int64)))
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "mime").mapInPandas(
        run,
        schema=(
            "media_id bigint, resized binary, out_width int, out_height int, "
            "mean_resized double, res_checksum bigint"
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (the real kernel would seek+decode; the stub emits the
    timestamp grid + a deterministic frame digest)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_ts_ms": [], "frame_digest": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                for ts in range(0, int(dur), every_ms):
                    digest = hashlib.md5(bytes(payload) + struct.pack("<q", ts)).hexdigest()
                    out["media_id"].append(mid)
                    out["frame_ts_ms"].append(ts)
                    out["frame_digest"].append(digest)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(run, schema="media_id bigint, frame_ts_ms int, frame_digest string")
    )


# ── real JPEG media (baseline codec in operators/jpeg.py) ─────────────────

#: synth_jpeg_media plane shape — 3×2 grid of 8×8 blocks (384 pixels)
JPEG_W, JPEG_H = 24, 16
JPEG_BLOCKS_X = JPEG_W // 8


def synth_jpeg_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG payloads, deterministically derived from doc_id.
    Each image is 24×16 grayscale = 6 DCT blocks; block b carries only a DC
    coefficient q(d, b) = ((d·11 + 17·b) mod 255) − 127 against a flat
    qtable of 8s, so the decoded block is the constant pixel value
    q + 128 ∈ [1, 255] (DC-only IDCT: S₀₀/8 = q; no clipping) — a
    closed-form law a SQL oracle replays without touching JPEG bytes,
    while the Spark side exercises the full marker-walk → DHT → entropy
    decode → dequant → IDCT pipeline."""
    from fusionspark.io import load_table
    from fusionspark.operators.jpeg import jpeg_encode

    # single local split -> spread ids across cores (ids only shuffle;
    # see synth_avi_media)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    w, h, n_blocks = JPEG_W, JPEG_H, (JPEG_W // 8) * (JPEG_H // 8)

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "payload": [], "mime": [], "width": [], "height": []
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                qb = np.zeros((n_blocks, 8, 8), dtype=np.int64)
                for b in range(n_blocks):
                    qb[b, 0, 0] = ((d * 11 + 17 * b) % 255) - 127
                out["media_id"].append(d)
                out["payload"].append(jpeg_encode(None, qblocks=qb, size=(w, h)))
                out["mime"].append("image/jpeg")
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        make, schema="media_id bigint, payload binary, mime string, width int, height int"
    )


# ── real MP4 box-level metadata (ISO-BMFF parser in operators/mp4.py) ─────

#: synth_mp4_media laws (the oracle replays these arithmetically)
MP4_VIDEO_TS = 30000
MP4_AUDIO_TS = 48000


def synth_mp4_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF payloads, deterministically derived from doc_id:
    movie duration_ms = 250·(1 + d mod 240); a video track (w = 16·(1 +
    d mod 64), h = 16·(1 + d mod 48), n = 8 + d mod 24 samples of size
    500 + (d·7 + 11k) mod 1000) and, for even d, an audio track (n = 16 +
    d mod 32 samples of size 64 + (d·5 + 3k) mod 128).  Closed-form laws a
    SQL oracle replays, while the Spark side walks the real box tree."""
    from fusionspark.io import load_table
    from fusionspark.operators.mp4 import mp4_encode

    # single local split -> spread ids across cores (ids only shuffle;
    # see synth_avi_media)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "payload": [], "mime": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                dur_ms = 250 * (1 + d % 240)
                nv = 8 + d % 24
                tracks = [{
                    "kind": "vide", "timescale": MP4_VIDEO_TS,
                    "duration": dur_ms * (MP4_VIDEO_TS // 1000),
                    "width": 16 * (1 + d % 64), "height": 16 * (1 + d % 48),
                    "sample_sizes": [500 + (d * 7 + 11 * k) % 1000 for k in range(nv)],
                }]
                if d % 2 == 0:
                    na = 16 + d % 32
                    tracks.append({
                        "kind": "soun", "timescale": MP4_AUDIO_TS,
                        "duration": dur_ms * (MP4_AUDIO_TS // 1000),
                        "sample_sizes": [64 + (d * 5 + 3 * k) % 128 for k in range(na)],
                    })
                out["media_id"].append(d)
                # odd ids exercise the 64-bit largesize mdat branch
                out["payload"].append(
                    mp4_encode(tracks, movie_duration=dur_ms, use_largesize=bool(d % 2))
                )
                out["mime"].append("video/mp4")
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        make, schema="media_id bigint, payload binary, mime string"
    )


def mp4_metadata_stats(media: DataFrame) -> DataFrame:
    """Walk REAL ISO-BMFF box trees (mp4.mp4_parse) and emit the metadata a
    video pipeline shards on: movie duration, track count, video geometry
    and sample totals, audio sample totals (0 when no audio track)."""
    from fusionspark.operators.mp4 import mp4_parse

    out_schema = (
        "media_id bigint, brand string, duration_ms bigint, n_tracks int, "
        "video_width int, video_height int, video_samples bigint, "
        "video_bytes bigint, audio_samples bigint, audio_bytes bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "brand", "duration_ms", "n_tracks", "video_width",
                "video_height", "video_samples", "video_bytes",
                "audio_samples", "audio_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = mp4_parse(payload)
                vid = next((t for t in meta["tracks"] if t["kind"] == "vide"), None)
                aud = next((t for t in meta["tracks"] if t["kind"] == "soun"), None)
                rows["media_id"].append(int(mid))
                rows["brand"].append(meta["brand"])
                rows["duration_ms"].append(int(meta["duration_ms"]))
                rows["n_tracks"].append(len(meta["tracks"]))
                rows["video_width"].append(vid["width"] if vid else 0)
                rows["video_height"].append(vid["height"] if vid else 0)
                rows["video_samples"].append(vid["n_samples"] if vid else 0)
                rows["video_bytes"].append(vid["sample_bytes"] if vid else 0)
                rows["audio_samples"].append(aud["n_samples"] if aud else 0)
                rows["audio_bytes"].append(aud["sample_bytes"] if aud else 0)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


# ── real WAV codec (stdlib struct — no soundfile needed) ──────────────────


def wav_encode(samples: "np.ndarray", rate: int) -> bytes:
    """Minimal RIFF/WAVE writer: PCM 16-bit mono.  Counterpart test vector
    generator for wav_decode (like png_encode for png_decode)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_decode(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Real RIFF/WAVE reader: walks the chunk list, parses fmt (PCM 16-bit
    mono only — the synth contract), returns (sample_rate, int16 samples).
    Stdlib-only, mirroring the PNG path's no-dependency rule."""
    import struct

    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            # a size field overrunning the buffer is corruption — fail loudly
            # like the other malformed cases instead of silently truncating
            # the sample stream (ADVICE r5)
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (audio_fmt, n_ch, bits) != (1, 1, 16):
                raise ValueError(
                    f"wav_decode supports PCM 16-bit mono, got fmt={audio_fmt} "
                    f"channels={n_ch} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


#: synth_wav_media laws (the oracle replays these arithmetically)
WAV_BASE_SAMPLES = 300
WAV_MOD_SAMPLES = 100


def synth_wav_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL WAV payloads, one per document: sample k of doc d
    is ((d*13 + 5k) mod 4001) - 2000, n_samples = 300 + d mod 100, rate =
    8000 + (d mod 3)*4000 — closed-form laws a SQL oracle can replay, so a
    decode-and-aggregate query certifies the whole codec path."""
    from fusionspark.io import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # ids-only spread before the kernel -- see synth_png_media
        .repartition(spark.sparkContext.defaultParallelism)
    )
    out_schema = "media_id long, payload binary, mime string, sample_rate int"

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "sample_rate": []}
            for did in pdf["doc_id"]:
                d = int(did)
                n = WAV_BASE_SAMPLES + d % WAV_MOD_SAMPLES
                rate = 8000 + (d % 3) * 4000
                k = np.arange(n, dtype=np.int64)
                s = ((d * 13 + 5 * k) % 4001) - 2000
                rows["media_id"].append(d)
                rows["payload"].append(wav_encode(s.astype(np.int16), rate))
                rows["mime"].append("audio/wav")
                rows["sample_rate"].append(rate)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(make, schema=out_schema)


def wav_feature_stats(media: DataFrame) -> DataFrame:
    """Decode REAL WAV payloads (wav_decode) and emit audio features:
    sample count, header rate, peak amplitude, and a position-weighted
    amplitude checksum that pins every sample to its index."""
    out_schema = (
        "media_id long, n_samples long, sample_rate long, "
        "peak long, amp_checksum long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "n_samples", "sample_rate", "peak",
                     "amp_checksum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = wav_decode(payload)
                s64 = s.astype(np.int64)
                k = np.arange(len(s64), dtype=np.int64)
                rows["media_id"].append(int(mid))
                rows["n_samples"].append(len(s64))
                rows["sample_rate"].append(int(rate))
                rows["peak"].append(int(np.abs(s64).max()) if len(s64) else 0)
                rows["amp_checksum"].append(int((s64 * k).sum()))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


# ── real MJPEG-in-AVI video (container in operators/avi.py, frames via
#    the baseline JPEG codec in operators/jpeg.py) ─────────────────────────

#: synth_avi_media laws (the oracle replays these arithmetically)
AVI_FPS = 4                      # → 250 ms per frame
AVI_MAX_FRAMES = 12              # n_frames = 4 + doc_id % 9 ∈ [4, 12]


def synth_avi_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MJPEG-in-AVI payloads, deterministically derived from doc_id:
    n_frames = 4 + d mod 9 at 4 fps; frame f is a 24×16 DC-only baseline
    JPEG whose block b carries DC q = ((d·11 + 29·f + 17·b) mod 255) − 127
    against a flat qtable of 8s, so the decoded block is the constant pixel
    q + 128 ∈ [1, 255] — the same closed-form law as synth_jpeg_media
    extended along the time axis.  A SQL oracle replays it arithmetically
    while the Spark side runs the full container walk → frame seek →
    entropy decode → IDCT chain."""
    from fusionspark.io import load_table
    from fusionspark.operators.avi import avi_encode
    from fusionspark.operators.jpeg import jpeg_encode

    # the source parquet is a single split locally — spread the doc ids so
    # the encode+decode kernels use every core (at 100 TB the input arrives
    # already multi-split; this shuffle moves only 8-byte ids)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    w, h, n_blocks = JPEG_W, JPEG_H, (JPEG_W // 8) * (JPEG_H // 8)

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "payload": [], "mime": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = []
                for f in range(4 + d % 9):
                    qb = np.zeros((n_blocks, 8, 8), dtype=np.int64)
                    for b in range(n_blocks):
                        qb[b, 0, 0] = ((d * 11 + 29 * f + 17 * b) % 255) - 127
                    frames.append(jpeg_encode(None, qblocks=qb, size=(w, h)))
                out["media_id"].append(d)
                out["payload"].append(avi_encode(frames, fps=AVI_FPS, width=w, height=h))
                out["mime"].append("video/x-msvideo")
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        make, schema="media_id bigint, payload binary, mime string"
    )


def video_frame_features(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL video frame-sampling: walk the AVI container index
    (avi.avi_parse — no full-file scan), seek every `stride`-th frame,
    decode it through the REAL baseline-JPEG codec, and emit per-frame
    features (mean pixel + position-weighted checksum) with the container
    timestamp ts_ms = frame_idx · us_per_frame / 1000.

    Scale shape: one Arrow map over video rows — payloads never shuffle;
    only (media_id, frame_idx, ts_ms, 2 doubles) rows leave the stage.
    Sampled-frame decode cost is bounded by stride, the knob a 100 TB
    video corpus tunes (decode 1-in-N frames, not all)."""
    from fusionspark.operators.avi import avi_frame, avi_parse
    from fusionspark.operators.jpeg import jpeg_decode

    out_schema = (
        "media_id bigint, frame_idx int, ts_ms bigint, n_frames int, "
        "mean_pixel double, pix_checksum bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "frame_idx", "ts_ms", "n_frames",
                "mean_pixel", "pix_checksum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = avi_parse(payload)
                n = meta["n_frames"]
                for f in range(0, n, stride):
                    plane = jpeg_decode(avi_frame(payload, meta, f))
                    v = plane.astype(np.int64).reshape(-1)
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(f)
                    rows["ts_ms"].append(f * meta["us_per_frame"] // 1000)
                    rows["n_frames"].append(n)
                    rows["mean_pixel"].append(float(v.sum()) / v.size)
                    rows["pix_checksum"].append(
                        int(np.dot(v, np.arange(v.size, dtype=np.int64)))
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def wav_frame_features(media: DataFrame, frame_len: int = 100) -> DataFrame:
    """Frame-level audio features over REAL WAV decode (the audio sibling
    of video_frame_features): non-overlapping `frame_len`-sample frames,
    per frame the sample count, peak |amplitude|, RMS, and zero-crossing
    count — the front end of every audio-quality / VAD / silence-trim
    pipeline.  One Arrow map; payloads never shuffle; frame_len bounds
    the output rows per second of audio."""
    out_schema = (
        "media_id bigint, frame int, n int, peak bigint, "
        "rms double, zero_crossings bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "frame", "n", "peak", "rms", "zero_crossings")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, s = wav_decode(payload)
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                for f in range(0, (len(s64) + frame_len - 1) // frame_len):
                    seg = s64[f * frame_len : (f + 1) * frame_len]
                    segn = nonneg[f * frame_len : (f + 1) * frame_len]
                    zc = int((segn[1:] != segn[:-1]).sum())
                    if f > 0:  # crossing at the frame boundary counts here
                        zc += int(nonneg[f * frame_len] != nonneg[f * frame_len - 1])
                    rows["media_id"].append(int(mid))
                    rows["frame"].append(f)
                    rows["n"].append(len(seg))
                    rows["peak"].append(int(np.abs(seg).max()))
                    rows["rms"].append(
                        round(float(np.sqrt((seg.astype(np.float64) ** 2).sum() / len(seg))), 6)
                    )
                    rows["zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def synth_wav_media_grouped(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """REAL WAV payloads with PLANTED audio near-duplicates: docs in the
    same group of 10 share one base signal s_k = ((g+1)(k+7)(k+13) mod
    4001) − 2000 (g = doc_id // 10 — group-distinct energy contours, so
    only planted pairs fingerprint-match) and differ only by an amplitude scale
    (1 + doc_id mod 3) and their tail length — i.e. the same recording at
    different volumes/durations, the case an audio fingerprint must
    match.  Closed-form, so a SQL oracle replays every sample."""
    from fusionspark.io import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # ids-only spread before the kernel -- see synth_png_media
        .repartition(spark.sparkContext.defaultParallelism)
    )
    out_schema = "media_id long, payload binary, mime string, sample_rate int"

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "sample_rate": []}
            for did in pdf["doc_id"]:
                d = int(did)
                g = d // 10
                sc = 1 + d % 3
                n = WAV_BASE_SAMPLES + d % WAV_MOD_SAMPLES
                k = np.arange(n, dtype=np.int64)
                s = sc * ((((g + 1) * (k + 7) * (k + 13)) % 4001) - 2000)
                rows["media_id"].append(d)
                rows["payload"].append(wav_encode(s.astype(np.int16), 8000))
                rows["mime"].append("audio/wav")
                rows["sample_rate"].append(8000)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(make, schema=out_schema)


def wav_fingerprint_bits(media: DataFrame, frame_len: int = 10) -> DataFrame:
    """Energy-delta audio fingerprint over REAL WAV decode: frame the PCM
    stream, bit f = [energy(frame f) > energy(frame f−1)] — the sign-of-
    delta bit every Shazam/Chromaprint-family fingerprint is built from.
    AMPLITUDE-INVARIANT by construction (a volume change scales every
    energy by the same positive factor, preserving all deltas), which is
    exactly why fingerprints compare recordings where raw sample hashes
    cannot.  One Arrow map: decode → energies → bits per document, ZERO
    shuffle — payloads never leave their partition and only the tiny bit
    stream (one row per frame) flows on."""
    out_schema = "media_id bigint, frame int, bit int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame": [], "bit": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, s = wav_decode(payload)
                s64 = s.astype(np.int64)
                n_frames = len(s64) // frame_len  # full frames only
                if n_frames < 2:
                    continue
                e = (
                    s64[: n_frames * frame_len]
                    .reshape(n_frames, frame_len)
                    .astype(np.int64)
                )
                e = (e * e).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(int)
                for f, b in enumerate(bits, start=1):
                    rows["media_id"].append(int(mid))
                    rows["frame"].append(f)
                    rows["bit"].append(int(b))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def audio_fingerprint_neardup(
    media: DataFrame,
    frame_len: int = 10,
    band_bits: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Audio near-dup search: fingerprint bits → `band_bits`-bit band keys
    → bucket equi-join candidates → exact bit-agreement verify over the
    frames BOTH recordings have (inner join on frame index aligns
    different durations).  The same band-candidates/verify discipline as
    the MinHash and SimHash text paths and the pHash image path — no
    all-pairs join; per-band bucket fan-out is bounded by the 2^band_bits
    key space (salt-split degenerate buckets exactly like dedup.py's LSH
    join if a silence-heavy corpus collapses keys)."""
    bits = wav_fingerprint_bits(media, frame_len).localCheckpoint(eager=True)
    band = F.floor((F.col("frame") - 1) / band_bits).cast("int")
    bands = bits.groupBy("media_id", band.alias("band")).agg(
        F.expr(f"sum(shiftleft(bit, (frame - 1) % {band_bits}))").alias("key")
    )
    b1 = bands.select(
        F.col("media_id").alias("id_a"), "band", "key"
    )
    b2 = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("key").alias("key_b"),
    )
    cands = (
        b1.join(
            b2,
            (F.col("band") == F.col("band_b"))
            & (F.col("key") == F.col("key_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    xa = bits.select(
        F.col("media_id").alias("id_a"), "frame", F.col("bit").alias("bit_a")
    )
    xb = bits.select(
        F.col("media_id").alias("id_b"), "frame", F.col("bit").alias("bit_b")
    )
    verify = (
        cands.join(xa, "id_a")
        .join(xb, ["id_b", "frame"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum((F.col("bit_a") == F.col("bit_b")).cast("int"))
            .cast("long")
            .alias("matches"),
        )
    )
    sim = F.col("matches").cast("double") / F.col("n_common")
    return verify.filter(sim >= F.lit(threshold)).select(
        "id_a", "id_b", "n_common", F.round(sim, 6).alias("sim")
    )


def synth_mixed_media(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Mixed-format media table for ingestion-time format routing:
    doc_id % 8 picks the writer —

        0 PNG   1 JPEG   2 BMP   3 GIF   4 WAV   5 MP4 (ftyp)
        6 AVI (RIFF)   7 unknown (md5 bytes behind a \\x00\\x00 guard so
        no magic can match by accident)

    Every payload comes from the repo's REAL writers (the same encoders
    the codec queries attest), so the sniffer is tested against honest
    container bytes, and the expected mime is a pure function of doc_id
    — the synth_jpeg_media derived-corpus contract."""
    import hashlib
    import struct as _struct

    from fusionspark.io import load_table
    from fusionspark.operators.avi import avi_encode
    from fusionspark.operators.bmp import bmp_encode
    from fusionspark.operators.gif import gif_encode
    from fusionspark.operators.jpeg import jpeg_encode
    from fusionspark.operators.mp4 import _box

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        plane = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
        rgb = np.stack([plane[:2, :2]] * 3, axis=-1).astype(np.uint8)
        qb = np.zeros((1, 8, 8), dtype=np.int64)
        qb[0, 0, 0] = 1
        jpg = jpeg_encode(None, qblocks=qb, size=(8, 8))
        fixed = {
            0: png_encode(plane),
            1: jpg,
            2: bmp_encode(rgb),
            3: gif_encode(plane),
            4: wav_encode(np.arange(16), 8000),
            5: _box(b"ftyp", b"isom" + _struct.pack(">I", 0) + b"isomavc1"),
            6: avi_encode([jpg], fps=4, width=8, height=8),
        }
        for pdf in batches:
            out = {"media_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = d % 8
                payload = (
                    fixed[k]
                    if k < 7
                    else b"\x00\x00" + hashlib.md5(f"mime:{d}".encode()).digest()
                )
                out["media_id"].append(d)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return docs.mapInPandas(make, schema="media_id bigint, payload binary")


def mime_sniff_col(payload: F.Column | str) -> F.Column:
    """Magic-byte MIME detection as a PURE column expression (JVM-side,
    codegen'd — the whole point: format routing over 100 TB of blobs
    must not fork a Python worker per row).  Reads at most the first 12
    bytes via one hex() of a substring:

        89504E470D0A1A0A  PNG      FFD8FF            JPEG
        424D              BMP      474946383761/3961 GIF87a/89a
        52494646....57415645  RIFF/WAVE    ....41564920  RIFF/AVI
        ....66747970 at byte 5    ISO-BMFF ftyp (MP4 family)

    Ordering rule (ADVICE r10): every byte-1-anchored prefix test runs
    BEFORE the byte-5 ftyp test.  The prefixes are mutually disjoint at
    byte 1 (89/47/52/FF/42), so their relative order is free — but ftyp
    matches at OFFSET 5, and a JPEG whose APP0 length/identifier bytes
    happened to spell 'ftyp' there would be shadowed into video/mp4 if
    the cross-offset test ran first."""
    sig = F.hex(F.substring(payload, 1, 12))
    return (
        F.when(sig.startswith("89504E470D0A1A0A"), "image/png")
        .when(sig.startswith("474946383761") | sig.startswith("474946383961"), "image/gif")
        .when(
            sig.startswith("52494646") & (F.substring(sig, 17, 8) == "57415645"),
            "audio/wav",
        )
        .when(
            sig.startswith("52494646") & (F.substring(sig, 17, 8) == "41564920"),
            "video/avi",
        )
        .when(sig.startswith("FFD8FF"), "image/jpeg")
        .when(sig.startswith("424D"), "image/bmp")
        .when(F.substring(sig, 9, 8) == "66747970", "video/mp4")
        .otherwise("application/octet-stream")
    )
