"""Structured Streaming smoke tests: the stream-static operators must
produce the same results through readStream (availableNow trigger, memory
sink) as through the batch path — ST1/ST3/ST5 parity, plus watermark
attachment (ST4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.streaming import windows as W


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return W.stream_events_from_parquet(spark, sf_dir)


def test_stream_is_streaming(stream_events):
    assert stream_events.isStreaming


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_events):
    batch = W.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = _run_stream(spark, W.tumbling_counts(stream_events), "t_tumbling")
    b = sorted(map(tuple, batch.select("window_start", "event_type", "n").collect()))
    s = sorted(map(tuple, stream.select("window_start", "event_type", "n").collect()))
    assert b == s


def test_session_stream_matches_batch(spark, sf_dir, stream_events):
    batch = W.session_counts(load_table(spark, sf_dir, "events"))
    stream = _run_stream(spark, W.session_counts(stream_events), "t_session")
    b = sorted(map(tuple, batch.select("user_id", "session_start", "n").collect()))
    s = sorted(map(tuple, stream.select("user_id", "session_start", "n").collect()))
    assert b == s


def test_dedup_stream(spark, sf_dir, stream_events):
    dedup = W.dedup_events(stream_events)
    q = (
        dedup.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("t_dedup")
    # one row per (user_id, event_type) at most
    dups = out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count()
    assert dups == 0
    batch_keys = (
        W.dedup_events(load_table(spark, sf_dir, "events"))
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert out.count() == batch_keys


def test_user_running_stats_stateful(spark, sf_dir, stream_events):
    """applyInPandasWithState running per-user stats: the streaming path
    (update mode, availableNow) must end at the same per-user totals as
    the batch groupBy fallback."""
    batch = W.user_running_stats(load_table(spark, sf_dir, "events"))
    q = (
        W.user_running_stats(stream_events)
        .writeStream.format("memory")
        .queryName("t_user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per user per micro-batch; the LAST row per
    # user is the final running state
    from pyspark.sql import Window as Wnd

    emitted = spark.table("t_user_stats")
    assert emitted.count() > 0
    latest = (
        emitted.withColumn("_ord", F.monotonically_increasing_id())
        .withColumn(
            "_rn",
            F.row_number().over(
                Wnd.partitionBy("user_id").orderBy(F.col("_ord").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "total_value", "max_value")
    )
    b = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), round(r["max_value"], 6))
        for r in batch.collect()
    }
    s = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), round(r["max_value"], 6))
        for r in latest.collect()
    }
    assert b == s


def test_message_delivery_stream_matches_batch(spark, sf_dir, stream_events, tmp_path):
    """VERDICT r2 #8 (M5): the Structured Streaming delivery job
    (foreachBatch: broadcast fan-out + partitioned queue writes + embedded
    auto-remember) lands exactly the batch-routing result."""
    from fusionspark.fixtures import messages_df, messages_select
    from fusionspark.streaming.routing import (
        deliver_messages_stream,
        route_messages,
        significant_messages,
    )

    batch_msgs = messages_df(spark, sf_dir)
    agents = batch_msgs.select(F.col("from_agent").alias("agent_id")).distinct()

    q = deliver_messages_stream(
        messages_select(stream_events),
        agents,
        deliveries_path=str(tmp_path / "deliveries"),
        checkpoint_path=str(tmp_path / "ckpt"),
        memory_path=str(tmp_path / "memory"),
        dimensions=8,
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(str(tmp_path / "deliveries"))
    got = {
        (r["msg_id"], r["recipient"]) for r in streamed.select("msg_id", "recipient").collect()
    }
    want = {
        (r["msg_id"], r["recipient"])
        for r in route_messages(batch_msgs, agents).select("msg_id", "recipient").collect()
    }
    assert got == want and want

    # each agent's queue is one partition directory — a reader never scans
    # the whole log
    import os

    parts = {d for d in os.listdir(tmp_path / "deliveries") if d.startswith("recipient=")}
    assert len(parts) == agents.count()

    # auto-remember: engine-schema rows, embedded, sender-owned
    mem = spark.read.parquet(str(tmp_path / "memory"))
    n_sig = significant_messages(batch_msgs).count()
    assert mem.count() == n_sig and n_sig > 0
    row = mem.first()
    assert row["vector"] is not None and len(row["vector"]) == 8
    assert row["content"].startswith("Sent ")
    assert row["metadata"]["messageType"] in ("task", "result", "knowledge")


def test_engine_ingest_stream_matches_batch(spark, tmp_path):
    """Continuous RAG ingestion: the streaming sink lands exactly the rows
    batch ingest produces (same chunk→embed plan per micro-batch)."""
    from fusionspark.engine import FusionSparkEngine

    docs = [(f"d{i}", "alpha beta gamma delta. " * (20 + 7 * i)) for i in range(4)]
    src = tmp_path / "docs_src"
    spark.createDataFrame(docs, "doc_id string, text string").coalesce(1).write.parquet(
        str(src)
    )

    batch_eng = FusionSparkEngine(spark, str(tmp_path / "eb"))
    for d, t in docs:
        batch_eng.ingest("rag", d, t)

    stream_eng = FusionSparkEngine(spark, str(tmp_path / "es"))
    stream = spark.readStream.schema("doc_id string, text string").parquet(str(src))
    q = stream_eng.ingest_stream("rag", stream, str(tmp_path / "ck"))
    q.awaitTermination(120)

    want = {
        (r["id"], r["content"], tuple(r["vector"]))
        for r in batch_eng._load("rag").collect()
    }
    got = {
        (r["id"], r["content"], tuple(r["vector"]))
        for r in stream_eng._load("rag").collect()
    }
    assert got == want and want


def test_route_messages_null_recipient_dead_letters(spark):
    """ADVICE r3: a NULL to_agent must not vanish through three-valued
    logic — it routes to the DEAD_LETTER recipient so malformed events
    stay observable in the delivery log."""
    from fusionspark.streaming.routing import DEAD_LETTER, route_messages

    msgs = spark.createDataFrame(
        [("m1", "a1", "a2", "task", "p", 0),
         ("m2", "a1", None, "task", "p", 0),
         ("m3", "a2", "*", "task", "p", 0)],
        "msg_id string, from_agent string, to_agent string, "
        "type string, payload string, ts long",
    )
    agents = spark.createDataFrame([("a1",), ("a2",), ("a3",)], "agent_id string")
    got = {(r["msg_id"], r["recipient"])
           for r in route_messages(msgs, agents).collect()}
    assert got == {("m1", "a2"), ("m2", DEAD_LETTER),
                   ("m3", "a1"), ("m3", "a3")}


def test_clean_documents_stream_matches_batch(spark, tmp_path):
    """Streaming corpus cleaning (quality filter + cross-batch exact dedup)
    lands exactly the batch result: same kept ids per content, one row per
    distinct content hash."""
    from pyspark.sql import Window

    from fusionspark.streaming.pipeline import (
        clean_documents,
        clean_documents_stream,
    )

    rows = []
    for i in range(40):
        good = "the data and that have with be to of spark " * 8 + f"tail{i % 10}"
        bad = "x"
        rows.append((i, good if i % 3 else bad))
    src = tmp_path / "src"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(2).write.parquet(
        str(src)
    )
    docs = spark.read.parquet(str(src))

    # batch oracle: shared transform + keep one row per content hash
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    batch = (
        clean_documents(docs)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    want_hashes = {r["content_hash"] for r in batch.collect()}
    assert want_hashes  # the filter keeps something

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = clean_documents_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out")).collect()
    assert {r["content_hash"] for r in got} == want_hashes
    assert len(got) == len(want_hashes)  # exactly one row per content
    assert all(r["quality"] >= 0.5 for r in got)


def test_clean_stream_neardup_matches_batch_incremental(spark, tmp_path):
    """Streaming near-dup cleaning == the batch incremental-dedup primitives
    (persist_minhash_index + minhash_lookup + append) replayed over the same
    splits: same accepted ids, and the index ends up holding exactly the
    seed corpus + accepted docs."""
    from fusionspark.operators.dedup import minhash_lookup, persist_minhash_index
    from fusionspark.streaming.pipeline import (
        clean_documents,
        clean_documents_stream_neardup,
    )

    def doc(i: int, vocab: str) -> str:
        # passes the 0.5 quality floor: 54 words, stopwords, alphabetic
        return "the of and to " + " ".join(f"{vocab}w{j}" for j in range(50))

    seeds = [(i, doc(i, f"seed{i}")) for i in range(3)]
    # split A: near-dup of seed0 (reject), fresh (accept)
    split_a = [(10, seeds[0][1] + " extratoken"), (11, doc(11, "freshA"))]
    # split B: near-dup of seed1 (reject), fresh (accept), exact within-batch
    # dup of that fresh doc (exact-dedup keeps min id 21)
    split_b = [(20, seeds[1][1] + " othertail"), (21, doc(21, "freshB")),
               (22, doc(21, "freshB"))]

    corpus = spark.createDataFrame(seeds, "doc_id long, text string")
    idx = str(tmp_path / "ndidx")
    persist_minhash_index(corpus, idx)

    src = tmp_path / "ndsrc"
    for split in (split_a, split_b):
        spark.createDataFrame(split, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(str(src))

    # batch replay with the same primitives over the same splits
    idx2 = str(tmp_path / "ndidx2")
    persist_minhash_index(corpus, idx2)
    expect_accepted: set[int] = set()
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    for split in (split_a, split_b):
        batch = spark.createDataFrame(split, "doc_id long, text string")
        uniq = (
            clean_documents(batch)
            .withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        hits = {r["new_id"] for r in minhash_lookup(
            spark, uniq, idx2, threshold=0.5).collect()}
        accepted = uniq.filter(~F.col("doc_id").isin(list(hits) or [-1]))
        accepted = accepted.localCheckpoint(eager=True)
        persist_minhash_index(accepted, idx2, mode="append")
        expect_accepted |= {r["doc_id"] for r in accepted.collect()}
    assert expect_accepted == {11, 21}  # sanity of the scenario itself

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = clean_documents_stream_neardup(
        stream, str(tmp_path / "ndout"), str(tmp_path / "ndck"), idx,
        threshold=0.5,
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "ndout")).collect()}
    assert got == expect_accepted
    # index contents: seeds + accepted, one signature row set per doc
    idx_ids = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
    assert idx_ids == {0, 1, 2} | expect_accepted


def test_nb_stream_scoring_matches_batch(spark, tmp_path):
    """The closure-broadcast NB scorer is stateless, so the same plan runs
    a document stream: availableNow scores equal batch-form scores."""
    from fusionspark.io import load_table
    from fusionspark.operators.textstats import (
        nb_quality_scores,
        nb_score_rows,
        nb_weights,
    )

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents").limit(120).cache()
    pos = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    neg = F.col("source").isin("src15", "src16", "src17", "src18", "src19")

    w, default, prior = nb_weights(d, pos, neg)
    # closure form ≈ join form (same math, float sum order may differ)
    join_form = {r["doc_id"]: r for r in nb_quality_scores(d, pos, neg).collect()}
    row_form = {r["doc_id"]: r for r in nb_score_rows(d, w, default, prior).collect()}
    assert set(join_form) == set(row_form)
    for k in join_form:
        assert abs(join_form[k]["nb_score"] - row_form[k]["nb_score"]) < 1e-6
        assert join_form[k]["quality_pred"] == row_form[k]["quality_pred"]

    # stream the same docs through the same scorer
    src = str(tmp_path / "src")
    d.select("doc_id", "text").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = nb_score_rows(stream, w, default, prior)
    out = str(tmp_path / "out")
    q = (
        scored.writeStream.option(
            "checkpointLocation", str(tmp_path / "ck")
        ).trigger(availableNow=True).start(out, format="parquet")
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert {k: v["nb_score"] for k, v in got.items()} == {
        k: v["nb_score"] for k, v in row_form.items()
    }


def test_hll_registers_stream_matches_batch(spark, sf_dir, stream_events):
    """Streaming cardinality sketch: groupBy(bucket).max(rho) is an
    incrementally-maintainable aggregate, so the HLL register state of the
    stream equals the batch sketch exactly (ST parity for the sketch
    family)."""
    from fusionspark.operators.sketches import hll_bucket_rho, hll_registers

    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    sregs = _run_stream(
        spark,
        stream_events.select(bucket, rho).groupBy("bucket").agg(
            F.max("rho").alias("register")
        ),
        "hll_stream_regs",
    )
    batch = load_table(spark, sf_dir, "events")
    bregs = hll_registers(batch, F.col("user_id").cast("string"))
    # stream side omits empty buckets; compare on the populated ones and
    # confirm the complement is exactly the zero registers
    joined = bregs.join(
        sregs.withColumnRenamed("register", "sreg"), "bucket", "left"
    )
    mism = joined.filter(
        (F.col("register") != 0) & (F.col("register") != F.coalesce("sreg", F.lit(-1)))
    )
    assert mism.count() == 0
    assert joined.filter((F.col("register") == 0) & F.col("sreg").isNotNull()).count() == 0


def test_streaming_ivf_append_matches_batch(spark, sf_dir, tmp_path):
    """Streaming ANN ingestion: foreachBatch ivf_append per micro-batch
    must leave the SAME persisted index as one batch append (frozen
    quantizer ⇒ assignment is per-row and order-free), and searches over
    it must match."""
    from fusionspark.io import load_table
    from fusionspark.operators.ann import ivf_append, ivf_search_persisted, persist_ivf
    from fusionspark.operators.knn import self_probes

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)

    p_stream, p_batch = str(tmp_path / "ivf_s"), str(tmp_path / "ivf_b")
    for p in (p_stream, p_batch):
        persist_ivf(base, p, n_centroids=16)
    ivf_append(spark, p_batch, extra)

    src = str(tmp_path / "src")
    # two micro-batch files
    extra.filter(F.col("vec_id") % 2 == 0).write.parquet(src + "/a")
    extra.filter(F.col("vec_id") % 2 == 1).write.parquet(src + "/b")
    stream = spark.readStream.schema(extra.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _eid: ivf_append(spark, p_stream, df)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sa = spark.read.parquet(f"{p_stream}/data")
    sb = spark.read.parquet(f"{p_batch}/data")
    assert sa.count() == sb.count() == emb.count()
    # same (vec_id -> centroid) assignment everywhere
    diff = (
        sa.select("vec_id", F.col("centroid_id").alias("ca"))
        .join(sb.select("vec_id", F.col("centroid_id").alias("cb")), "vec_id")
        .filter(F.col("ca") != F.col("cb"))
    )
    assert diff.count() == 0
    probes = self_probes(emb, 20)
    ra = {(r["probe_id"], r["vec_id"])
          for r in ivf_search_persisted(spark, p_stream, probes, k=5,
                                        n_probe=4, strategy="numpy").collect()}
    rb = {(r["probe_id"], r["vec_id"])
          for r in ivf_search_persisted(spark, p_batch, probes, k=5,
                                        n_probe=4, strategy="numpy").collect()}
    assert ra == rb


def test_rollup_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Streaming materialized-view maintenance: events sliced into
    micro-batches and merged incrementally must equal the direct batch
    aggregate BIT-FOR-BIT (algebraic partials + integer micro-unit sums),
    and a replayed batch must be a no-op, not a double-merge."""
    from fusionspark.io import load_table
    from fusionspark.streaming.pipeline import maintain_rollup_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src = tmp_path / "src"
    # several files → several availableNow micro-batches
    ev.repartition(4).write.parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    q = maintain_rollup_stream(stream, state, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.parquet(state).collect()
    }
    src_batch = spark.read.parquet(str(src))
    direct = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in src_batch.select(
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
        .collect()
    }
    assert got == direct

    # replay protection: a FRESH checkpoint makes the engine re-deliver
    # every file as batches 0..k again — the in-state marker must skip
    # them all (double-merge would double every count)
    import os

    marker = os.path.join(state, "_applied_batch")
    with open(marker) as fh:
        last = int(fh.read().strip())
    before = sorted(got.items())
    q2 = maintain_rollup_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        state,
        str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    after = sorted(
        (r.user_id, (r.n, r.s, r.mn, r.mx))
        for r in spark.read.parquet(state).collect()
    )
    assert after == [(u, t) for u, t in before]
    with open(marker) as fh:
        assert int(fh.read().strip()) == last

    # crash recovery: a crash BETWEEN the two swap renames leaves
    # state_path absent with the prior state in .old — the next batch
    # must restore .old and merge into it, not reset to just the batch
    os.rename(state, state + ".old")
    # drive one more batch through a fresh source dir + checkpoint; the
    # fresh checkpoint restarts batch numbering at 0, so the recovered
    # in-state marker ALSO makes this a recognized replay and skips the
    # merge — the point under test is that the accumulated state comes
    # back from .old instead of being silently reset to one batch
    src2 = tmp_path / "src2"
    src_batch.limit(5).write.parquet(str(src2))
    q3 = maintain_rollup_stream(
        spark.readStream.schema(ev.schema).parquet(str(src2)),
        state,
        str(tmp_path / "ck3"),
    )
    q3.awaitTermination(120)
    recovered = sorted(
        (r.user_id, (r.n, r.s, r.mn, r.mx))
        for r in spark.read.parquet(state).collect()
    )
    assert recovered == before

    # second crash window: a crash AFTER the tmp→state rename but BEFORE
    # the .old cleanup leaves a stale non-empty .old while state_path
    # exists — the next merging batch must clear it before swapping
    # (pre-fix: os.rename(state_path, old) raised ENOTEMPTY and the
    # stream failed permanently)
    import shutil

    shutil.copytree(state, state + ".old")
    with open(marker, "w") as fh:
        fh.write("-1")  # make batch 0 of a fresh checkpoint a real merge
    src3 = tmp_path / "src3"
    extra = src_batch.limit(5)
    extra.write.parquet(str(src3))
    q4 = maintain_rollup_stream(
        spark.readStream.schema(ev.schema).parquet(str(src3)),
        state,
        str(tmp_path / "ck4"),
    )
    q4.awaitTermination(120)
    assert not os.path.exists(state + ".old")
    merged = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in spark.read.parquet(state).collect()
    }
    expect = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in src_batch.unionAll(extra)
        .select(
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
        .collect()
    }
    assert merged == expect


def test_interval_join_stream_matches_batch(spark, sf_dir, stream_events):
    """ST7: the stream-stream interval join emits exactly the batch pair
    set once both watermarks pass (availableNow drains the source, so the
    append-mode sink holds the complete join)."""
    from fusionspark.streaming.joins import interval_join

    def split(ev):
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", "event_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        return errors, clicks

    joined = interval_join(*split(stream_events), within="6 hours")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("t_interval_join")
    batch = interval_join(
        *split(load_table(spark, sf_dir, "events")), within="6 hours"
    )
    b = sorted(map(tuple, batch.select("user_id", "l_event_id", "r_event_id").collect()))
    s = sorted(map(tuple, out.select("user_id", "l_event_id", "r_event_id").collect()))
    assert len(b) > 0
    assert b == s


def test_gram_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """maintain_gram_stream: any micro-batch slicing of the vector feed
    converges to the batch Gram bit-for-bit (every row kind is an exact
    BIGINT sum), and the maintained state feeds covariance_from_gram."""
    import os
    import shutil

    from fusionspark.operators.spectral import covariance_from_gram, gram_int
    from fusionspark.streaming.pipeline import maintain_gram_stream

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # split the corpus into 3 files so maxFilesPerTrigger=1 forces three
    # separate micro-batch merges into the state
    src = tmp_path / "feed"
    emb.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "gram_state")
    q = maintain_gram_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = {
        (r["i"], r["j"]): r["s"] for r in spark.read.parquet(state).collect()
    }
    want = {(r["i"], r["j"]): r["s"] for r in gram_int(emb).collect()}
    assert got == want
    cov = covariance_from_gram(spark.read.parquet(state))
    batch_cov = {
        (r["i"], r["j"]): r["c_int"]
        for r in covariance_from_gram(gram_int(emb)).collect()
    }
    for r in cov.collect():
        assert batch_cov[(r["i"], r["j"])] == r["c_int"]


def test_histogram_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """maintain_histogram_stream: any micro-batch slicing of the value
    feed converges to the batch cents histogram bit-for-bit, and
    quantiles_from_bins off the state equals the batch
    histogram_quantiles readout."""
    from fusionspark.operators.sketches import cents_histogram, quantiles_from_bins
    from fusionspark.streaming.pipeline import maintain_histogram_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    src = tmp_path / "feed"
    ev.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "hist_state")
    q = maintain_histogram_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = {r["b"]: r["c"] for r in spark.read.parquet(state).collect()}
    want = {r["b"]: r["c"] for r in cents_histogram(ev).collect()}
    assert got == want
    ps = [500, 900, 990, 999]
    got_q = quantiles_from_bins(spark.read.parquet(state), ps).collect()
    want_q = quantiles_from_bins(cents_histogram(ev), ps).collect()
    assert [tuple(r) for r in got_q] == [tuple(r) for r in want_q]


def test_neardup_stream_matches_batch_replay(spark, sf_dir, tmp_path):
    """maintain_neardup_stream: each micro-batch's matches equal a direct
    minhash_lookup of that batch against the index of all PRIOR batches,
    the first batch matches nothing, and the anti-join guard strips
    self-contamination (the crash-replay window where the batch's own
    partial index is visible)."""
    from fusionspark.operators.dedup import minhash_lookup, persist_minhash_index
    from fusionspark.streaming.pipeline import maintain_neardup_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tmp_path / "feed"
    docs.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    index = str(tmp_path / "mh_index")
    matches = str(tmp_path / "mh_matches")
    q = maintain_neardup_stream(
        stream, index, matches, str(tmp_path / "ckpt"), threshold=0.4
    )
    q.awaitTermination(180)

    idx_df = spark.read.parquet(index)
    ingests = sorted(
        r.ingest for r in idx_df.select("ingest").distinct().collect()
    )
    assert len(ingests) == 3
    got_all = spark.read.parquet(matches)
    # batch 0 saw an empty index
    assert got_all.filter(F.col("ingest") == ingests[0]).count() == 0
    # every batch's matches == direct lookup against the prior index
    for k, ing in enumerate(ingests[1:], start=1):
        ids_k = [
            r.doc_id
            for r in idx_df.filter(F.col("ingest") == ing)
            .select("doc_id").distinct().collect()
        ]
        prior_ids = [
            r.doc_id
            for r in idx_df.filter(F.col("ingest").isin(ingests[:k]))
            .select("doc_id").distinct().collect()
        ]
        prior_idx = str(tmp_path / f"prior_{k}")
        persist_minhash_index(
            docs.filter(F.col("doc_id").isin(prior_ids)), prior_idx
        )
        want = {
            (r.new_id, r.corpus_id, round(r.est_sim, 6))
            for r in minhash_lookup(
                spark, docs.filter(F.col("doc_id").isin(ids_k)),
                prior_idx, threshold=0.4,
            ).collect()
        }
        got = {
            (r.new_id, r.corpus_id, round(r.est_sim, 6))
            for r in got_all.filter(F.col("ingest") == ing).collect()
        }
        assert got == want

    # anti-join guard: an index contaminated with the batch's own rows
    # (crash-replay) must not produce self/own-batch matches
    half = docs.filter(F.col("doc_id") % 2 == 0)
    cont_idx = str(tmp_path / "contaminated")
    persist_minhash_index(docs, cont_idx)  # includes the "batch" itself
    raw = minhash_lookup(spark, half, cont_idx, threshold=0.4)
    own = half.select(F.col("doc_id").alias("__own_id"))
    cleaned = raw.join(
        F.broadcast(own), raw["corpus_id"] == own["__own_id"], "left_anti"
    )
    assert raw.filter(F.col("new_id") == F.col("corpus_id")).count() > 0
    own_ids = {r.doc_id for r in half.collect()}
    assert not {
        r.corpus_id for r in cleaned.collect()
    } & own_ids


def test_topk_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """maintain_topk_stream: cellwise CMS merge makes any micro-batch
    slicing converge to the batch sketch bit-for-bit, and (cardinality
    < cand_k here) the candidate readout equals the batch CMS estimate
    for every event type."""
    from fusionspark.operators.sketches import cms_build, cms_estimate
    from fusionspark.streaming.pipeline import maintain_topk_stream, topk_from_state

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    src = tmp_path / "feed"
    ev.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "topk_state")
    q = maintain_topk_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got_cells = {
        (r["row"], r["col"]): r["cnt"]
        for r in spark.read.parquet(f"{state}/cells").collect()
    }
    want_cells = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(ev, F.col("event_type").cast("string")).collect()
    }
    assert got_cells == want_cells

    vals = ev.select(F.col("event_type").cast("string").alias("v")).distinct()
    want_est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(
            cms_build(ev, F.col("event_type").cast("string")), vals, F.col("v"), "v"
        ).collect()
    }
    got_top = {r["v"]: r["est_count"] for r in topk_from_state(spark, state).collect()}
    assert got_top == want_est  # all 5 types fit in the candidate table
    # estimates are CM upper bounds on the true counts
    true = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(
        F.count("*").alias("n")).collect()}
    for v, est in got_top.items():
        assert est >= true[v]


def test_enriched_tumbling_stream_matches_batch(spark, sf_dir, stream_events):
    cust = load_table(spark, sf_dir, "customer")
    batch = W.enriched_tumbling(load_table(spark, sf_dir, "events"), cust)
    stream = _run_stream(spark, W.enriched_tumbling(stream_events, cust), "t_enrich")
    b = sorted(map(tuple, batch.select("window_start", "segment", "n").collect()))
    s = sorted(map(tuple, stream.select("window_start", "segment", "n").collect()))
    assert b == s
    segs = {r["segment"] for r in batch.select("segment").distinct().collect()}
    assert segs  # enrichment produced real segments


def test_funnel_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Streaming ordered-funnel state: the corpus history sliced into
    three TIME-ORDERED micro-batches (the monotone-source contract) and
    folded incrementally must reproduce the batch window_funnel level
    distribution exactly, and a replayed batch must be a no-op."""
    import time as _time

    from pyspark.sql import Window as W

    from fusionspark.io import load_table
    from fusionspark.queries.mining_queries import window_funnel
    from fusionspark.streaming.pipeline import (
        funnel_levels_from_state,
        maintain_funnel_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    n = ev.count()
    ranked = ev.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    src = tmp_path / "src"
    # three time-contiguous slices written in order (mtime-ordered pickup)
    for lo, hi in ((1, n // 3), (n // 3 + 1, 2 * n // 3), (2 * n // 3 + 1, n)):
        (
            ranked.filter((F.col("rn") >= lo) & (F.col("rn") <= hi))
            .drop("rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    q = maintain_funnel_stream(stream, state, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = {
        r.level: r.n_users
        for r in funnel_levels_from_state(spark, state).collect()
    }
    expect = {r.level: r.n_users for r in window_funnel(spark, sf_dir).collect()}
    assert got == expect

    # replay: running the stream again over the same checkpoint is a no-op
    before = sorted(
        (r.user_id, r.s1, r.s2, r.s3)
        for r in spark.read.parquet(state).collect()
    )
    q2 = maintain_funnel_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        state,
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    after = sorted(
        (r.user_id, r.s1, r.s2, r.s3)
        for r in spark.read.parquet(state).collect()
    )
    assert after == before


def test_viterbi_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Streaming Viterbi DP state: the corpus history sliced into three
    TIME-ORDERED micro-batches and folded incrementally must reproduce
    the batch viterbi_decode output exactly (exact max-plus BIGINT
    algebra composes over any slicing), and a replayed batch must be a
    no-op."""
    import time as _time

    from pyspark.sql import Window as W

    from fusionspark.io import load_table
    from fusionspark.queries.analytics_queries import viterbi_decode
    from fusionspark.streaming.pipeline import (
        maintain_viterbi_stream,
        viterbi_from_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    n = ev.count()
    ranked = ev.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    src = tmp_path / "src"
    for lo, hi in ((1, n // 3), (n // 3 + 1, 2 * n // 3), (2 * n // 3 + 1, n)):
        (
            ranked.filter((F.col("rn") >= lo) & (F.col("rn") <= hi))
            .drop("rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    q = maintain_viterbi_stream(stream, state, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = [
        (r.user_id, r.n_events, r.viterbi_score, r.final_state)
        for r in viterbi_from_state(spark, state).collect()
    ]
    expect = [
        (r.user_id, r.n_events, r.viterbi_score, r.final_state)
        for r in viterbi_decode(spark, sf_dir).collect()
    ]
    assert got == expect

    before = sorted(
        (r.user_id, r.v0, r.v1, r.n_events)
        for r in spark.read.parquet(state).collect()
    )
    q2 = maintain_viterbi_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        state,
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    after = sorted(
        (r.user_id, r.v0, r.v1, r.n_events)
        for r in spark.read.parquet(state).collect()
    )
    assert after == before


def test_kmv_stream_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """maintain_kmv_stream: the distinct min-union merge makes any
    micro-batch slicing converge to the one-shot batch sketch
    bit-for-bit, and a replayed sink call is a byte-level no-op (the
    merge is idempotent, not merely marker-guarded)."""
    import os

    from fusionspark.operators.dedup import md5_hash32
    from fusionspark.streaming.pipeline import (
        kmv_from_state,
        maintain_kmv_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    src = tmp_path / "feed"
    ev.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "kmv_state")
    q = maintain_kmv_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    from pyspark.sql import Window

    want = (
        ev.select(
            F.col("event_type").cast("string").alias("g"),
            md5_hash32(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
            ).alias("h"),
        )
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("rn") <= 64)
        .drop("rn")
    )
    got = {(r["g"], r["h"]) for r in spark.read.parquet(f"{state}/sketch").collect()}
    assert got == {(r["g"], r["h"]) for r in want.collect()}

    # replay idempotence: re-applying the full feed through the MERGE
    # path (marker removed, so the min-union actually runs) must leave
    # the sketch rows identical — idempotence, not marker-guarding
    os.remove(os.path.join(state, "_applied_batch"))
    q2 = maintain_kmv_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src)),
        state,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    again = {
        (r["g"], r["h"]) for r in spark.read.parquet(f"{state}/sketch").collect()
    }
    assert again == got

    # readout: every per-type distinct user count is >= 64 at sf0.01+,
    # so the estimate is the (k-1)*2^32/h_k form and lands within 30%
    # of truth (k=64 -> sigma ~ 1/8); below-k groups would be exact
    truth = {
        r["g"]: r["n"]
        for r in ev.groupBy(F.col("event_type").alias("g"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in kmv_from_state(spark, state).collect():
        t = truth[r["g"]]
        if r["n_sketch"] < 64:
            assert r["est_distinct"] == float(t)
        else:
            assert abs(r["est_distinct"] - t) / t < 0.3


def test_kmv_pairs_from_state_matches_batch_query(spark, sf_dir, tmp_path):
    """kmv_pairs_from_state off the maintained sketch state equals the
    batch kmv_intersect estimates (same union-sketch law, no history
    rescan) — the sketches ARE sufficient state for the overlap matrix."""
    from fusionspark.queries.analytics_queries import kmv_intersect
    from fusionspark.streaming.pipeline import (
        kmv_pairs_from_state,
        maintain_kmv_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    src = tmp_path / "feed"
    ev.repartition(4).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "kmv_state")
    q = maintain_kmv_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    want = {
        (r["type_a"], r["type_b"]): (r["union_k"], r["kmv_inter"], r["est_jaccard"])
        for r in kmv_intersect(spark, sf_dir).collect()
    }
    got = {
        (r["g1"], r["g2"]): (r["union_k"], r["kmv_inter"], r["est_jaccard"])
        for r in kmv_pairs_from_state(spark, state).collect()
    }
    assert got == want
