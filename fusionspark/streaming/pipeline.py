"""Streaming corpus cleaning: the training-data pipeline's dedup + quality
pass as a Structured Streaming job.

Batch cleaning (pipeline_queries.corpus_clean / corpus_funnel) is a plan
over a static corpus; a live ingestion feed needs the SAME semantics
applied per micro-batch with dedup state that spans batches.  Every
transform here is stream-static (the quality rules are pure column
expressions; exact dedup is dropDuplicates on the content hash, whose
state the streaming engine keeps), so the batch form IS the oracle — the
parity test replays the stream with availableNow and compares sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusionspark.operators import textstats


def clean_documents(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The per-row cleaning transform, shared verbatim by batch and stream:
    tag the content hash + quality score, keep rows at or above the
    quality floor.  (Exact dedup is applied by the caller — batch uses a
    groupBy/first, streaming uses stateful dropDuplicates — because that
    is the one stage whose mechanism legitimately differs.)"""
    return docs.select(
        "*",
        F.md5("text").alias("content_hash"),
        F.round(textstats.quality_score("text"), 6).alias("quality"),
    ).filter(F.col("quality") >= min_quality)


def clean_documents_stream(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    min_quality: float = 0.5,
):
    """Continuous corpus cleaning: quality-filter each micro-batch with the
    shared transform, drop exact duplicates ACROSS batches (the content
    hash is the dedup state — 16 bytes per distinct document, kept by the
    streaming state store; add a watermark against unbounded state when
    the feed carries an event time), and append survivors.  Exactly-once
    via the checkpoint.  Returns the started StreamingQuery
    (availableNow, like the other parity-tested jobs)."""
    cleaned = clean_documents(doc_stream, min_quality).dropDuplicates(
        ["content_hash"]
    )
    return (
        cleaned.writeStream.option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start(out_path, format="parquet", outputMode="append")
    )
