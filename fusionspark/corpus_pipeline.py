"""End-to-end training-corpus export: the capstone composition of the
attested pipeline stages into ONE job a user actually runs.

    raw documents
      → paragraph-level boilerplate removal   (dedup.paragraph_dedup)
      → quality ensemble vote                 (gopher ∧ c4 ∧ NB ∧ LM — the
                                               quality_consensus members)
      → exact dedup (content-hash keeper)     (dedup.exact_dedup semantics)
      → MinHash near-dup (optional)           (dedup.minhash_neardup pairs →
                                               connected components → keep
                                               the min-id per cluster)
      → deterministic global shuffle          (md5 shard + in-shard order)
      → WebDataset tar shards + manifest      (packing.write_webdataset)

Every stage keeps its attested plan shape; this module only wires them.
The funnel report (stage-by-stage survivor counts) comes back with the
manifest so a run is auditable — the numbers a data card publishes.

Scale notes: stages communicate by doc_id / 16-byte digests, never by
re-reading text; the NB and LM models broadcast; the only corpus-keyed
shuffles are the stage aggregations themselves; shard count sizes the
export tasks (one whole tar per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fusionspark.operators import textstats
from fusionspark.operators.dedup import md5_hash32, paragraph_dedup


def export_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    min_consensus: int = 3,
    para_max_df: int | None = None,
    perplexity_cap: float = 30.1,
    n_shards: int = 16,
    nb_pos=None,
    nb_neg=None,
    token_shards_dir: str | None = None,
    neardup_threshold: float | None = None,
) -> dict:
    """Run the full cleaning + packaging pipeline over `docs`
    (doc_id, text, source).  Returns {"funnel": {...stage counts...},
    "manifest": [shard rows], "out_dir": out_dir}."""
    from fusionspark.operators.packing import write_webdataset

    # r15: spread the input ONCE before the funnel (guide §2.6 — a
    # single-split local scan otherwise serializes every pre-shuffle map
    # stage, and the paragraph explode runs 3× over it, in one task).  One
    # round-robin exchange of (id, text, source); r16: io.spread gates on
    # the input's actual split count, so multi-split 100 TB input passes
    # through Exchange-free.
    from fusionspark.io import spread

    # r16: count the RAW frame, then spread — the count is column-pruned
    # at the scan; counting after the spread paid a full text exchange
    # just to count rows (same value either way).
    n_raw = docs.count()
    docs = spread(docs)
    thr = para_max_df if para_max_df is not None else n_raw // 20 + 1

    # 1. sub-document boilerplate removal (keeps every doc_id; empty docs
    #    fall out at the quality vote)
    cleaned = paragraph_dedup(docs, max_df=thr).select("doc_id", "text")
    cleaned = cleaned.join(
        docs.select("doc_id", "source"), "doc_id"
    ).localCheckpoint()  # the downstream stages fan out from this frame

    # 2. quality ensemble (same members as the attested quality_consensus)
    g = textstats.gopher_metrics("text")
    c = textstats.c4_metrics("text")
    rules = cleaned.select(
        "doc_id",
        (g["passes"] == 1).cast("int").alias("gopher_pass"),
        c["passes"].cast("int").alias("c4_pass"),
    )
    pos = nb_pos if nb_pos is not None else F.col("source").isin(
        "src0", "src1", "src2", "src3", "src4"
    )
    neg = nb_neg if nb_neg is not None else F.col("source").isin(
        "src15", "src16", "src17", "src18", "src19"
    )
    nb = textstats.nb_quality_scores(cleaned, pos, neg).select(
        "doc_id", F.col("quality_pred").alias("nb_pass")
    )
    lm = textstats.lm_perplexity_scores(cleaned).select(
        "doc_id",
        (F.col("perplexity") <= perplexity_cap).cast("int").alias("lm_pass"),
    )
    voted = (
        rules.join(nb, "doc_id")
        .join(lm, "doc_id")
        .select(
            "doc_id",
            (
                F.col("gopher_pass") + F.col("c4_pass")
                + F.col("nb_pass") + F.col("lm_pass")
            ).alias("consensus"),
        )
    )
    # r16: checkpoint the survivor-id set (ids only, guide §2.4) — it is
    # consumed by the funnel count AND the exact-dedup semi-join, so the
    # whole quality vote (3 passes over `cleaned` + the NB/LM model
    # aggregations) ran TWICE, once per consumer.
    kept_q = (
        voted.filter(F.col("consensus") >= min_consensus)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    n_quality = kept_q.count()

    # 3. exact dedup on the cleaned text (16-byte digest keyed; keeper=min id)
    with_hash = cleaned.join(kept_q, "doc_id").select(
        "doc_id", "text", F.md5("text").alias("ch")
    )
    keepers = with_hash.groupBy("ch").agg(F.min("doc_id").alias("doc_id"))
    # localCheckpoint: every downstream consumer (near-dup pair-gen, the
    # left_anti drop, the shard shuffle, the funnel counts) would
    # otherwise re-run the quality-join + md5-groupBy + semi-join chain
    # per action
    deduped = with_hash.join(keepers, ["ch", "doc_id"], "left_semi").select(
        "doc_id", "text"
    ).localCheckpoint()
    n_dedup = deduped.count()

    # 3b. MinHash near-dup (optional): banded LSH pairs → connected
    #     components over EDGE-INCIDENT nodes only → keep the min-id per
    #     cluster.  Pairs and labels shuffle as ids; text never re-shuffles.
    n_neardup = n_dedup
    if neardup_threshold is not None:
        from fusionspark.operators.dedup import connected_components, minhash_neardup

        # r16: checkpoint the candidate pairs (ids only, guide §2.4) —
        # connected_components consumes them twice (the symmetric edge
        # set AND the edge-incident node set), so the banded-LSH
        # signature pass over the deduped corpus ran twice.
        pairs = (
            minhash_neardup(deduped, threshold=neardup_threshold)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        touched = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        labels = connected_components(pairs, touched)
        drop = labels.filter(F.col("component") != F.col("doc_id")).select("doc_id")
        # second fan-out point: the shard shuffle and (optionally) the
        # token-shard writer both consume the survivor set
        deduped = deduped.join(drop, "doc_id", "left_anti").localCheckpoint()
        n_neardup = deduped.count()

    # 4. deterministic global shuffle (resumable-loader contract)
    h = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    sharded = deduped.select(
        "doc_id", "text", h.alias("h"),
        F.pmod(
            md5_hash32(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    sharded = sharded.select(
        "doc_id", "text", "shard", F.row_number().over(w).cast("long").alias("pos")
    )

    # 5. tar shards + manifest
    manifest = write_webdataset(sharded, out_dir).collect()

    # 5b. optional mmap-able token shards (Megatron-style .bin/.idx):
    #     hashing-trick token ids (md5(word) mod 2^16 — vocab-free and
    #     engine-replayable; swap in bpe.bpe_encode for a trained vocab)
    token_manifest = None
    if token_shards_dir is not None:
        from fusionspark.functions.text import tokenize
        from fusionspark.operators.packing import write_token_shards

        tokens = sharded.select(
            "shard", "pos",
            F.transform(
                tokenize("text"),
                lambda w: F.pmod(md5_hash32(w), F.lit(65536)).cast("int"),
            ).alias("token_ids"),
        )
        token_manifest = write_token_shards(tokens, token_shards_dir).collect()

    result_token_manifest = token_manifest
    return {
        "token_manifest": result_token_manifest,
        "funnel": {
            "raw": n_raw,
            "after_quality": n_quality,
            "after_exact_dedup": n_dedup,
            "after_neardup": n_neardup,
            "exported": sum(m["n_samples"] for m in manifest),
        },
        "manifest": [m.asDict() for m in sorted(manifest, key=lambda m: m["shard"])],
        "out_dir": out_dir,
    }
