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

import os

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


def _index_exists(index_path: str) -> bool:
    """A band-partitioned MinHash index is present iff band=* subdirs exist
    (an empty/missing dir means 'no corpus yet' — first batch accepts all)."""
    return os.path.isdir(index_path) and any(
        name.startswith("band=") for name in os.listdir(index_path)
    )


def clean_documents_stream_neardup(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    index_path: str,
    threshold: float = 0.5,
    min_quality: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
):
    """Continuous corpus cleaning WITH cross-batch near-dup: each micro-batch
    is quality-filtered (shared transform), exact-deduped within the batch
    (min doc_id per content hash — deterministic keeper), probed against the
    PERSISTED band-partitioned MinHash index (dedup.minhash_lookup: the batch
    side broadcasts, the corpus index never reshuffles, corpus text is never
    read), and the accepted survivors are appended to BOTH the output and the
    index (persist_minhash_index mode='append' — only the batch is signed).

    Same semantics as the batch `dedup_incremental` registry query applied
    split-by-split, which is exactly what the parity test asserts
    (tests/test_streaming.py).  Within-batch NEAR-dup (beyond exact) is
    deliberately not resolved, matching dedup_incremental: two novel
    near-dups arriving in one batch are both accepted; the next batch sees
    both in the index.  Paths are any Hadoop-compatible FS; at 100 TB the
    index append lands as new partition files, never a rewrite."""
    from pyspark.sql import Window

    from fusionspark.operators import dedup

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy("content_hash").orderBy("doc_id")
        uniq = (
            clean_documents(batch_df, min_quality)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            # materialize once: feeds the lookup AND the two appends
            .localCheckpoint(eager=True)
        )
        if _index_exists(index_path):
            matches = dedup.minhash_lookup(
                spark, uniq, index_path, threshold=threshold,
                num_hashes=num_hashes, bands=bands,
            )
            rejected = matches.select(F.col("new_id").alias("doc_id")).distinct()
            accepted = uniq.join(rejected, "doc_id", "left_anti")
        else:
            accepted = uniq
        accepted = accepted.localCheckpoint(eager=True)
        dedup.persist_minhash_index(
            accepted, index_path, num_hashes=num_hashes, bands=bands,
            mode="append",
        )
        accepted.write.mode("append").parquet(out_path)

    return (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
