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


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real codec entry point — requires PIL/libav, absent here."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "swap _fake_decode for PIL.Image.open / soundfile.read in production"
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
                mean = float(plane.mean())
                bits = (small.astype(np.float64).reshape(8, -1).mean(axis=1) > mean)
                ahash = int(sum(int(b) << i for i, b in enumerate(bits)))
                out["media_id"].append(mid)
                out["mean_intensity"].append(mean)
                out["std_intensity"].append(float(plane.std()))
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
