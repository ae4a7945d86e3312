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


def maintain_rollup_stream(
    event_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Streaming MATERIALIZED-VIEW maintenance of the per-user rollup
    (the incremental_rollup contract, run continuously): each micro-batch
    aggregates to algebraic partials (count / sum-of-micro-units / min /
    max) and full-outer-merges into the parquet state table — the base
    data is never rescanned, and because every partial is algebraic and
    the value sum is an exact BIGINT, ANY batch slicing of the stream
    converges to the batch answer bit-for-bit (the parity test's claim).

    foreachBatch + overwrite of the tiny state table; at 100 TB the
    state is key-partitioned and only touched partitions rewrite (Delta
    MERGE semantics — `storage/manifest.py` has the commit machinery).
    Exactly-once: foreachBatch alone is only AT-LEAST-once for side
    effects, so the applied batch_id rides INSIDE the state directory
    (written before the atomic rename-swap, so state and marker move
    together) and a replayed batch is recognized and skipped instead of
    double-merged."""
    spark = event_stream.sparkSession

    def partials(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "user_id",
                F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("val_u"),
                F.unix_micros("ts").alias("ts_us"),
            )
            .groupBy("user_id")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("val_u").alias("s"),
                F.min("ts_us").alias("mn"),
                F.max("ts_us").alias("mx"),
            )
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Crash recovery: a crash between the two renames of a previous
        # swap leaves state_path absent while the prior state survives in
        # .old — restore it before the marker check so the replayed batch
        # merges into real state instead of silently resetting the rollup.
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replay of an already-merged batch: skip
        delta = partials(batch_df)
        if not os.path.exists(state_path):
            merged = delta  # genuinely the first batch: no state yet
        else:
            # Any read error here is a real fault and must surface — a
            # silent fallback to `delta` would replace the accumulated
            # rollup with one batch (the exactly-once contract's failure
            # mode this function exists to prevent).
            state = spark.read.parquet(state_path)
            d = delta.select(
                "user_id",
                F.col("n").alias("n_d"),
                F.col("s").alias("s_d"),
                F.col("mn").alias("mn_d"),
                F.col("mx").alias("mx_d"),
            )
            zero = F.lit(0).cast("long")
            merged = (
                state.join(d, "user_id", "full_outer")
                .select(
                    "user_id",
                    (F.coalesce(F.col("n"), zero) + F.coalesce(F.col("n_d"), zero)).alias("n"),
                    (F.coalesce(F.col("s"), zero) + F.coalesce(F.col("s_d"), zero)).alias("s"),
                    F.least(F.col("mn"), F.col("mn_d")).alias("mn"),
                    F.greatest(F.col("mx"), F.col("mx_d")).alias("mx"),
                )
            )
        # land via rename-swap so a crash mid-write never truncates state
        tmp = state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        import shutil

        if os.path.exists(state_path):
            # A crash after the tmp→state rename of a prior swap but before
            # its rmtree leaves a completed-swap .old behind; since
            # state_path exists it is safe (and required) to clear it, or
            # the rename below fails ENOTEMPTY and wedges the stream.
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        event_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def maintain_gram_stream(
    vector_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    vec_col: str = "embedding",
    dim: int = 64,
):
    """Streaming maintenance of the exact-integer Gram state
    (operators/spectral.py::gram_int): each micro-batch maps to its
    d²+d+1-row int64 partial and full-outer-merges into the parquet state
    by plain BIGINT addition.  Every row kind of the Gram frame (Σx·x,
    Σx, n) is an algebraic sum, so ANY batch slicing of the feed
    converges to the batch Gram BIT-for-bit — covariance / spectrum /
    PCA / drift all read off the maintained state without ever rescanning
    the corpus (the continuously-fresh embedding-health dashboard).

    Same crash contract as maintain_rollup_stream: applied-batch marker
    inside the state dir, rename-swap with both crash windows covered."""
    import shutil

    from fusionspark.operators.spectral import gram_int

    spark = vector_stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replayed batch: already merged
        delta = gram_int(batch_df, vec_col=vec_col, dim=dim)
        if not os.path.exists(state_path):
            merged = delta
        else:
            state = spark.read.parquet(state_path)
            zero = F.lit(0).cast("long")
            merged = (
                state.join(
                    delta.withColumnRenamed("s", "s_d"), ["i", "j"], "full_outer"
                )
                .select(
                    "i",
                    "j",
                    (
                        F.coalesce(F.col("s"), zero) + F.coalesce(F.col("s_d"), zero)
                    ).alias("s"),
                )
            )
        tmp = state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        vector_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def maintain_histogram_stream(
    value_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    value_col: str = "value",
):
    """Streaming maintenance of the cents-grid histogram state
    (operators/sketches.py::cents_histogram): each micro-batch maps to
    its (bin, count) partial and full-outer-merges into the parquet
    state by BIGINT addition — counts are algebraic sums, so any batch
    slicing of the feed converges to the batch histogram bit-for-bit,
    and quantiles_from_bins reads continuously-fresh percentiles off the
    state without rescanning the stream history (the latency-SLO
    dashboard shape).

    Same crash contract as maintain_rollup_stream / maintain_gram_stream:
    applied-batch marker inside the state dir, rename-swap with both
    crash windows covered."""
    import shutil

    from fusionspark.operators.sketches import cents_histogram

    spark = value_stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replayed batch: already merged
        delta = cents_histogram(batch_df, value_col=value_col)
        if not os.path.exists(state_path):
            merged = delta
        else:
            state = spark.read.parquet(state_path)
            zero = F.lit(0).cast("long")
            merged = (
                state.join(delta.withColumnRenamed("c", "c_d"), "b", "full_outer")
                .select(
                    "b",
                    (
                        F.coalesce(F.col("c"), zero) + F.coalesce(F.col("c_d"), zero)
                    ).alias("c"),
                )
            )
        tmp = state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        value_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def maintain_neardup_stream(
    doc_stream: DataFrame,
    index_path: str,
    matches_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming continuous-ingestion near-dup: every micro-batch of
    documents is (1) looked up against the banded-MinHash index of all
    PREVIOUSLY ingested batches (operators/dedup.py::minhash_lookup —
    the batch side broadcasts, corpus text never shuffles) and (2) its
    own signatures are appended to the index — the "dedup the incoming
    crawl against the corpus as it lands" shape (dedup_incremental's
    materialized-view form).

    Exactly-once contract: instead of the rename-swap the merge streams
    use, BOTH outputs land at batch-deterministic locations
    (ingest=<batch_id>/ subdirs, mode=overwrite), so a replayed batch
    overwrites its own partial output and never duplicates.  A crashed
    attempt may leave a partial ingest=<id> index; the replay's lookup
    could then see the batch's own signatures, so matches are
    anti-joined against the current batch's ids — which also pins the
    semantics to "matches against PRIOR ingests only" (intra-batch dups
    are the batch's own concern; ids must be unique across the stream).

    Scale: per batch, one zero-shuffle Arrow signature pass + one
    broadcast band-bucket join against the band-partitioned index; the
    index grows append-only, no compaction of old ingests is ever
    required for correctness (band pruning still applies within each
    ingest dir)."""
    import shutil  # noqa: F401  (parity with sibling maintainers)

    from pyspark.sql.types import DoubleType, StructField, StructType

    from fusionspark.operators.dedup import (
        minhash_lookup,
        persist_minhash_index,
    )

    spark = doc_stream.sparkSession
    id_type = doc_stream.schema[id_col].dataType

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            prior = (
                [
                    d
                    for d in os.listdir(index_path)
                    if d.startswith("ingest=")
                    and int(d.split("=", 1)[1]) < batch_id
                ]
                if os.path.isdir(index_path)
                else []
            )
            if prior:
                hits = minhash_lookup(
                    spark, batch_df, index_path, threshold,
                    id_col, text_col, num_hashes, bands,
                )
                own = batch_df.select(F.col(id_col).alias("__own_id"))
                matches = hits.join(
                    F.broadcast(own),
                    hits["corpus_id"] == own["__own_id"],
                    "left_anti",
                )
            else:
                matches = spark.createDataFrame(
                    [],
                    StructType(
                        [
                            StructField("new_id", id_type),
                            StructField("corpus_id", id_type),
                            StructField("est_sim", DoubleType()),
                        ]
                    ),
                )
            matches.write.mode("overwrite").parquet(
                f"{matches_path}/ingest={batch_id}"
            )
            persist_minhash_index(
                batch_df,
                f"{index_path}/ingest={batch_id}",
                id_col=id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                mode="overwrite",
            )
        finally:
            batch_df.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def maintain_topk_stream(
    value_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    value_col: str = "event_type",
    cand_k: int = 64,
):
    """Streaming heavy-hitters maintenance: the Count-Min sketch
    (operators/sketches.py::cms_build) as streaming state plus a bounded
    candidate table — the unbounded-key-space sibling of
    maintain_rollup_stream (whose per-key state grows with the key
    count; this one is 16k cells + cand_k rows FOREVER).

    Per micro-batch: the batch's CMS cells full-outer-merge into the
    state by BIGINT addition (cellwise sums are algebraic, so any batch
    slicing converges to the batch sketch bit-for-bit); the candidate
    pool = prior candidates ∪ the batch's distinct values is re-estimated
    against the MERGED sketch and pruned back to cand_k.  The classic
    space-saving caveat applies: a value pruned from the pool re-enters
    only when it reappears in a batch — with column cardinality below
    cand_k (event_type here) the readout is exact and equals the batch
    CMS estimate for every value.

    Same crash contract as maintain_histogram_stream: applied-batch
    marker inside the state dir, rename-swap with both crash windows
    covered; the two state tables (cells/, cands/) swap atomically as
    one directory."""
    import shutil

    from fusionspark.operators.sketches import cms_build, cms_estimate

    spark = value_stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replayed batch: already merged
        val = F.col(value_col).cast("string")
        delta = cms_build(batch_df, val)
        batch_vals = batch_df.select(val.alias("v")).distinct()
        if not os.path.exists(state_path):
            merged = delta
            pool = batch_vals
        else:
            cells = spark.read.parquet(os.path.join(state_path, "cells"))
            zero = F.lit(0).cast("long")
            merged = (
                cells.join(
                    delta.withColumnRenamed("cnt", "cnt_d"), ["row", "col"], "full_outer"
                ).select(
                    "row",
                    "col",
                    (
                        F.coalesce(F.col("cnt"), zero) + F.coalesce(F.col("cnt_d"), zero)
                    ).alias("cnt"),
                )
            )
            prior = spark.read.parquet(os.path.join(state_path, "cands")).select("v")
            pool = prior.unionByName(batch_vals).distinct()
        merged = merged.localCheckpoint(eager=True)
        est = cms_estimate(merged, pool, F.col("v"), "v")
        cands = (
            est.orderBy(F.col("est_count").desc(), F.col("v").asc()).limit(cand_k)
        )
        tmp = state_path + ".next"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(os.path.join(tmp, "cells"))
        cands.write.mode("overwrite").parquet(os.path.join(tmp, "cands"))
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        value_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def topk_from_state(spark, state_path: str, k: int = 10) -> DataFrame:
    """Read the current top-k heavy hitters off maintain_topk_stream's
    state — no stream-history rescan, just the cand_k-row candidate
    table."""
    cands = spark.read.parquet(os.path.join(state_path, "cands"))
    return cands.orderBy(F.col("est_count").desc(), F.col("v").asc()).limit(k)


def maintain_funnel_stream(
    event_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Streaming maintenance of the per-user ordered-funnel state (the
    `window_funnel` contract, run continuously): state is each user's
    greedy fold vector [s1, s2, s3] (latest chain-start reaching each
    level, −2⁶² when unreached); each micro-batch folds its events — per
    user, (ts, event_id)-ordered — ON TOP of the stored vector, so the
    composition over any batch slicing equals the batch fold over the
    whole history PROVIDED the source delivers each user's events in
    event-time order across batches (the monotone-source contract; a
    true out-of-order stream needs watermarked buffering in front — the
    fold itself cannot retract).  The parity test slices one history
    three ways and asserts the final levels equal the batch query's.

    Same exactly-once machinery as maintain_rollup_stream: applied-batch
    marker INSIDE the state dir, rename-swap landing, crash-recovery of
    a half-swapped .old."""
    import shutil

    from fusionspark.queries.mining_queries import _WF_UNSET, _WF_WINDOW_US

    spark = event_stream.sparkSession
    unset = F.lit(_WF_UNSET).cast("long")

    def fold(a, x):
        t, st = F.element_at(x, 3), F.element_at(x, 4)
        s1, s2, s3 = F.element_at(a, 1), F.element_at(a, 2), F.element_at(a, 3)
        return F.array(
            F.when(st == 1, F.greatest(s1, t)).otherwise(s1),
            F.when(
                (st == 2) & (s1 > _WF_UNSET) & (t - s1 <= _WF_WINDOW_US),
                F.greatest(s2, s1),
            ).otherwise(s2),
            F.when(
                (st == 3) & (s2 > _WF_UNSET) & (t - s2 <= _WF_WINDOW_US),
                F.greatest(s3, s2),
            ).otherwise(s3),
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return
        step = (
            F.when(F.col("event_type") == "view", 1)
            .when(F.col("event_type") == "click", 2)
            .otherwise(3)
            .cast("long")
        )
        ev = (
            batch_df.filter(F.col("event_type").isin("view", "click", "purchase"))
            .select(
                "user_id",
                F.unix_micros("ts").alias("t"),
                F.col("event_id").cast("long").alias("event_id"),
                step.alias("step"),
            )
        )
        arrs = ev.groupBy("user_id").agg(
            F.array_sort(
                F.collect_list(F.array("t", "event_id", "t", "step"))
            ).alias("evs")
        )
        if os.path.exists(state_path):
            state = spark.read.parquet(state_path).select(
                "user_id", "s1", "s2", "s3"
            )
        else:
            state = spark.createDataFrame([], "user_id long, s1 long, s2 long, s3 long")
        j = arrs.join(state, "user_id", "full_outer")
        init = F.array(
            F.coalesce(F.col("s1"), unset),
            F.coalesce(F.col("s2"), unset),
            F.coalesce(F.col("s3"), unset),
        )
        folded = F.aggregate(
            F.coalesce(F.col("evs"), F.array().cast("array<array<bigint>>")),
            init,
            fold,
        )
        merged = j.select(
            "user_id",
            F.element_at(folded, 1).alias("s1"),
            F.element_at(folded, 2).alias("s2"),
            F.element_at(folded, 3).alias("s3"),
        )
        tmp = state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        event_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def funnel_levels_from_state(spark, state_path: str) -> DataFrame:
    """Read the funnel state table into (level, n_users) — the same
    output shape as the batch `window_funnel` query."""
    from fusionspark.queries.mining_queries import _WF_UNSET

    s = spark.read.parquet(state_path)
    level = (
        F.when(F.col("s3") > _WF_UNSET, 3)
        .when(F.col("s2") > _WF_UNSET, 2)
        .when(F.col("s1") > _WF_UNSET, 1)
        .otherwise(0)
    )
    return (
        s.select(level.cast("int").alias("level"))
        .groupBy("level")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def maintain_viterbi_stream(
    event_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Streaming maintenance of the per-user Viterbi DP state (the
    `viterbi_decode` contract, run continuously): state is each user's
    exact max-plus vector [v0, v1] plus the event count; each micro-batch
    folds its events — per user, (ts, event_id)-ordered — ON TOP of the
    stored vector.  Because the DP is a left fold in exact BIGINT
    max-plus algebra, composition over ANY batch slicing equals the batch
    fold over the whole history (the monotone-source contract of
    maintain_funnel_stream: per-user event-time order across batches).
    A user's FIRST event ever pays start + emission, not a transition —
    the accumulator carries the count so the fold can tell (n == 0) apart
    from (state restored from disk).

    Same exactly-once machinery as maintain_rollup_stream: applied-batch
    marker INSIDE the state dir, rename-swap landing, crash-recovery of
    a half-swapped .old."""
    import shutil

    from fusionspark.queries.analytics_queries import (
        _VIT_EMIT,
        _VIT_START,
        _VIT_T,
    )

    spark = event_stream.sparkSession
    t00, t01, t10, t11 = _VIT_T

    def fold(a, x):
        v0, v1, n = F.element_at(a, 1), F.element_at(a, 2), F.element_at(a, 3)
        e0, e1 = F.element_at(x, 3), F.element_at(x, 4)
        return F.when(
            n == 0,
            F.array(
                F.lit(_VIT_START[0]) + e0, F.lit(_VIT_START[1]) + e1, F.lit(1)
            ),
        ).otherwise(
            F.array(
                F.greatest(v0 + t00, v1 + t10) + e0,
                F.greatest(v0 + t01, v1 + t11) + e1,
                n + 1,
            )
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return
        e0 = F.lit(None).cast("long")
        e1 = F.lit(None).cast("long")
        for t, (a, b) in _VIT_EMIT.items():
            e0 = F.when(F.col("event_type") == t, F.lit(a)).otherwise(e0)
            e1 = F.when(F.col("event_type") == t, F.lit(b)).otherwise(e1)
        ev = batch_df.select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.col("event_id").cast("long").alias("event_id"),
            e0.alias("e0"),
            e1.alias("e1"),
        )
        arrs = ev.groupBy("user_id").agg(
            F.array_sort(
                F.collect_list(F.array("t", "event_id", "e0", "e1"))
            ).alias("evs")
        )
        if os.path.exists(state_path):
            state = spark.read.parquet(state_path).select(
                "user_id", "v0", "v1", "n_events"
            )
        else:
            state = spark.createDataFrame(
                [], "user_id long, v0 long, v1 long, n_events long"
            )
        j = arrs.join(state, "user_id", "full_outer")
        init = F.array(
            F.coalesce(F.col("v0"), F.lit(0)),
            F.coalesce(F.col("v1"), F.lit(0)),
            F.coalesce(F.col("n_events"), F.lit(0)),
        )
        folded = F.aggregate(
            F.coalesce(F.col("evs"), F.array().cast("array<array<bigint>>")),
            init,
            fold,
        )
        merged = j.select(
            "user_id",
            F.element_at(folded, 1).alias("v0"),
            F.element_at(folded, 2).alias("v1"),
            F.element_at(folded, 3).alias("n_events"),
        )
        tmp = state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        event_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def viterbi_from_state(spark, state_path: str) -> DataFrame:
    """Read the Viterbi state table into the batch `viterbi_decode` output
    shape: top-200 users by exact integer score."""
    s = spark.read.parquet(state_path)
    return (
        s.select(
            "user_id",
            "n_events",
            F.greatest("v0", "v1").cast("long").alias("viterbi_score"),
            F.when(F.col("v1") > F.col("v0"), 1).otherwise(0).cast("int")
            .alias("final_state"),
        )
        .orderBy(F.col("viterbi_score").desc(), F.col("user_id").asc())
        .limit(200)
    )


def maintain_kmv_stream(
    event_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
):
    """Streaming maintenance of per-group KMV distinct sketches (the
    `kmv_intersect` state, run continuously): per group, the k smallest
    distinct 32-bit 'kmv:'-salted md5 hashes of the id column — fixed
    k-row state per group FOREVER, like maintain_topk_stream's bounded
    cells.

    The merge law is a distinct MIN-UNION: new state = k smallest of
    (state UNION batch hashes).  Unlike the CMS cellwise ADDITION, this
    is idempotent as well as associative/commutative, so ANY batch
    slicing — including a replayed batch — converges to the one-shot
    batch sketch bit-for-bit; the applied-batch marker is kept for
    uniformity with the other jobs' crash contract, not for
    correctness (the parity test replays a batch and asserts the
    byte-level no-op).

    Readout: `kmv_from_state` returns the sketch rows plus the standard
    (k-1)*2^32/h_k distinct estimate (exact count below k) — and two
    sketches from this state feed the kmv_intersect union-sketch
    Jaccard without touching the raw stream history."""
    import shutil

    from fusionspark.operators.dedup import md5_hash32

    spark = event_stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        old = state_path + ".old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)
        marker = os.path.join(state_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or -1) >= batch_id:
                    return  # replayed batch: min-union would no-op anyway
        delta = batch_df.select(
            F.col(group_col).cast("string").alias("g"),
            md5_hash32(
                F.concat(F.lit("kmv:"), F.col(id_col).cast("string"))
            ).alias("h"),
        ).distinct()
        if os.path.exists(state_path):
            prior = spark.read.parquet(os.path.join(state_path, "sketch"))
            pool = prior.select("g", "h").unionByName(delta).distinct()
        else:
            pool = delta
        rn = F.row_number().over(Window.partitionBy("g").orderBy("h"))
        merged = (
            pool.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")
        ).localCheckpoint(eager=True)
        tmp = state_path + ".next"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(os.path.join(tmp, "sketch"))
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        event_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def kmv_from_state(spark, state_path: str, k: int = 64) -> DataFrame:
    """Per-group distinct-count estimates off maintain_kmv_stream's state
    — no stream-history rescan, just the <=k-row-per-group sketch table:
    exact count below k, (k-1)*2^32/h_k at the cap (the standard KMV
    estimator; one correctly-rounded division of exact integers)."""
    sk = spark.read.parquet(os.path.join(state_path, "sketch"))
    agg = sk.groupBy("g").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("h_k"),
    )
    return agg.select(
        "g",
        "n_sketch",
        F.round(
            F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
            .otherwise(
                (F.lit(k - 1) * F.lit(4294967296.0)) / F.col("h_k")
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_pairs_from_state(spark, state_path: str, k: int = 64) -> DataFrame:
    """Pairwise Jaccard estimates between ALL group sketches off
    maintain_kmv_stream's state — the kmv_intersect union-sketch law
    (rho = |U_k ^ A ^ B| / |U_k|) evaluated without touching the raw
    stream history: inputs are the <=k-row-per-group sketch table, so a
    G-group overlap matrix costs O(G^2 * k) rows regardless of stream
    length."""
    from pyspark.sql import Window

    sk = spark.read.parquet(os.path.join(state_path, "sketch"))
    gs = sk.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g1"))
        .crossJoin(gs.select(F.col("g").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    pu = (
        pairs.join(
            sk, (F.col("g") == F.col("g1")) | (F.col("g") == F.col("g2"))
        )
        .groupBy("g1", "g2", "h")
        .agg(
            F.max(F.when(F.col("g") == F.col("g1"), 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("g") == F.col("g2"), 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    urn = F.row_number().over(Window.partitionBy("g1", "g2").orderBy("h"))
    uk = pu.withColumn("rn", urn).filter(F.col("rn") <= k)
    return (
        uk.groupBy("g1", "g2")
        .agg(
            F.count("*").cast("long").alias("union_k"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
                "kmv_inter"
            ),
        )
        .select(
            "g1", "g2", "union_k", "kmv_inter",
            F.round(
                F.col("kmv_inter").cast("double") / F.col("union_k"), 6
            ).alias("est_jaccard"),
        )
    )
