"""Sequence packing for training-data pipelines: group documents into
fixed token-budget packs (the pre-tokenization batching step — short docs
are concatenated up to a context-length budget so training sees full
sequences, not padding).

Not in the reference (north-star addition).  The packing here is the
STREAMING form: documents are ordered deterministically within a shard and
cut into packs by cumulative token count — one window pass, no Python, and
(unlike first-fit bin packing) a pure SQL expression, so the DuckDB oracle
replays it exactly.  First-fit packs ~equally well only when doc length
varies wildly; for web-scale corpora the streaming form's waste is small
and its plan is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions.text import tokenize
from fusionspark.operators.dedup import md5_hash32


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Assign each document a (shard, pack_id): documents are hash-sharded
    (md5 of id — deterministic and engine-portable), ordered by id within
    (group, shard), and packed greedily by running token count — pack_id =
    floor(tokens_before / budget).  Docs longer than the budget get their
    own pack (the window cut advances past them).

    Scale: the window partitions on (group, shard) — n_shards bounds the
    largest partition at corpus/n_shards regardless of group skew, so one
    giant language never serializes into one reducer; raise n_shards with
    corpus size (it only relabels packs, never changes pack contents
    within a shard)."""
    n_tokens = F.size(tokenize(F.col(text_col)))
    shard = F.pmod(md5_hash32(F.col(id_col).cast("string")), F.lit(n_shards))
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            n_tokens.alias("n_tokens"),
            shard.alias("shard"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)),
        )
        .drop("cum_tokens")
    )


def hash_sample(
    df: DataFrame,
    pct: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus sampling: keep a row iff md5(id) mod 100 < pct.
    Unlike rand()-based sampling this is reproducible across runs, engines,
    and partitionings (the sample is a pure function of the id), composes
    with incremental ingestion (a doc's in/out never flips), and supports
    stratified variants by keying the hash on (stratum, id).  Zero shuffle —
    a filter the scan absorbs."""
    bucket = F.pmod(md5_hash32(F.col(id_col).cast("string")), F.lit(100))
    return df.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < pct
    )


def domain_mix(
    df: DataFrame,
    rates: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Weighted corpus mixing: keep each group's rows at its percentage
    rate (unlisted groups drop).  The keep decision is md5(group:id) mod
    100 < rate — deterministic per row like hash_sample, so re-mixing with
    a raised rate only ADDS documents (never churns the kept set), and the
    same mix reproduces on any engine or partitioning.  This is the domain
    re-weighting step of corpus assembly (web/code/books at different
    rates).  Zero shuffle."""
    bucket = F.pmod(
        md5_hash32(
            F.concat(F.col(group_col), F.lit(":"), F.col(id_col).cast("string"))
        ),
        F.lit(100),
    )
    pairs = []
    for g, r in rates.items():
        pairs.extend([F.lit(g), F.lit(int(r))])
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(group_col)), F.lit(0)
    )
    return df.withColumn("mix_bucket", bucket).filter(F.col("mix_bucket") < rate)


def curriculum_assign_approx(
    df,
    score_col: str,
    n_shards: int = 8,
    accuracy: int = 10_000,
):
    """Scale-path curriculum sharding: ONE pass computes approx-percentile
    boundaries (a mergeable quantile sketch — no global sort), then shard
    assignment is a literal comparison chain folded into the scan — zero
    shuffle, unlike the oracle-exact ntile form (curriculum_shards), whose
    total order is unpayable at 100 TB.  Shard sizes are equal within
    sketch error (1/accuracy relative rank error).  Returns df + `shard`
    (1-based, easy→hard like ntile ASC)."""
    from pyspark.sql import functions as F

    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = df.agg(
        F.percentile_approx(score_col, qs, accuracy).alias("b")
    ).first()["b"]
    shard = F.lit(1)
    for i, b in enumerate(bounds):
        shard = F.when(F.col(score_col) > float(b), i + 2).otherwise(shard)
    return df.withColumn("shard", shard.cast("int"))


def write_webdataset(
    df,
    out_dir: str,
    key_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
    file_cols: dict | None = None,
):
    """WebDataset-style tar-shard export — the sample format streaming
    training loaders consume (one `{key}.{ext}` member per column, samples
    contiguous, shards loadable independently).  One Arrow group per
    shard writes `shard-{s:05d}.tar` with members in `pos` order and
    NORMALIZED tar metadata (mtime=0, uid/gid=0, mode 0644) so the bytes
    are reproducible run-to-run — the property that makes shard-level
    caching and resume safe.  Returns a manifest DataFrame (shard,
    n_samples, content_bytes, tar_md5).

    Scale shape: groupBy(shard) is the only shuffle; each task writes
    whole shards (shard count chosen so a shard fits a task — same rule
    as persist_ivf's list files).  At 100 TB point out_dir at the
    object store."""
    import hashlib
    import io as _io
    import os
    import tarfile

    import pandas as pd

    from pyspark.sql import functions as F

    file_cols = file_cols or {"text": "txt"}
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, pos_col] + list(file_cols)

    def write_shard(key, pdf):
        (shard,) = key
        pdf = pdf.sort_values(pos_col)
        buf = _io.BytesIO()
        content_bytes = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                for col, ext in file_cols.items():
                    data = row[col]
                    data = (
                        data.encode() if isinstance(data, str) else bytes(data)
                    )
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tar.addfile(info, _io.BytesIO(data))
                    content_bytes += len(data)
        payload = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{int(shard):05d}.tar")
        with open(path, "wb") as f:
            f.write(payload)
        return pd.DataFrame(
            {
                "shard": [int(shard)],
                "n_samples": [len(pdf)],
                "content_bytes": [content_bytes],
                "tar_md5": [hashlib.md5(payload).hexdigest()],
            }
        )

    return (
        df.select(shard_col, *cols)
        .groupBy(shard_col)
        .applyInPandas(
            write_shard,
            schema="shard int, n_samples long, content_bytes long, tar_md5 string",
        )
    )


def assign_split(
    df: DataFrame,
    weights: tuple[int, int, int] = (80, 10, 10),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: split = md5('split:'‖id)
    mod 100 against cumulative weight boundaries.  Like hash_sample, the
    assignment is a pure function of the id — reproducible across engines
    and partitionings, stable under incremental ingestion (a doc never
    migrates between splits), and independent of hash_sample's buckets
    (different hash salt).  Zero shuffle — a projection the scan absorbs."""
    train, val, test = weights
    if train + val + test != 100:
        raise ValueError("weights must sum to 100")
    bucket = F.pmod(
        md5_hash32(F.concat(F.lit("split:"), F.col(id_col).cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def write_token_shards(
    df,
    out_dir: str,
    tokens_col: str = "token_ids",
    shard_col: str = "shard",
    pos_col: str = "pos",
    dtype: str = "uint16",
):
    """Megatron-style binary token shards — the mmap-able pretraining
    format: per shard a `shard-{s:05d}.bin` of contiguous token ids
    (little-endian `dtype`) plus `shard-{s:05d}.idx` holding one u64
    START OFFSET per sequence (in tokens) and a final u64 total, so the
    loader random-accesses sequence i as tokens[idx[i]:idx[i+1]] without
    parsing.  Sequences land in `pos` order; bytes are a pure function of
    the input (no timestamps), so shard-level caching/resume is safe —
    same contract as write_webdataset.

    Scale shape: groupBy(shard) is the only shuffle; each task writes one
    whole shard.  Returns a manifest (shard, n_seqs, n_tokens, bin_md5).
    u16 covers vocabularies < 65 536 (the repo's BPE trainer default);
    pass dtype='uint32' beyond that."""
    import hashlib
    import os
    import struct

    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    np_dtype = np.dtype(dtype).newbyteorder("<")

    def write_shard(key, pdf):
        (shard,) = key
        pdf = pdf.sort_values(pos_col)
        seqs = [np.asarray(t, dtype=np_dtype) for t in pdf[tokens_col]]
        flat = (
            np.concatenate(seqs) if seqs else np.empty(0, dtype=np_dtype)
        )
        offsets = np.zeros(len(seqs) + 1, dtype="<u8")
        np.cumsum([len(s) for s in seqs], out=offsets[1:])
        bin_payload = flat.tobytes()
        base = os.path.join(out_dir, f"shard-{int(shard):05d}")
        with open(base + ".bin", "wb") as f:
            f.write(bin_payload)
        with open(base + ".idx", "wb") as f:
            f.write(struct.pack("<Q", len(seqs)))
            f.write(offsets.tobytes())
        return pd.DataFrame(
            {
                "shard": [int(shard)],
                "n_seqs": [len(seqs)],
                "n_tokens": [int(offsets[-1])],
                "bin_md5": [hashlib.md5(bin_payload).hexdigest()],
            }
        )

    return (
        df.select(shard_col, pos_col, tokens_col)
        .groupBy(shard_col)
        .applyInPandas(
            lambda key, pdf: write_shard(key, pdf),
            schema="shard long, n_seqs long, n_tokens long, bin_md5 string",
        )
    )


def read_token_shard(base_path: str, dtype: str = "uint16"):
    """Loader-side counterpart (test/verification use): returns the list
    of sequences from one shard."""
    import struct

    import numpy as np

    np_dtype = np.dtype(dtype).newbyteorder("<")
    with open(base_path + ".idx", "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        offsets = np.frombuffer(f.read(8 * (n + 1)), dtype="<u8")
    flat = np.fromfile(base_path + ".bin", dtype=np_dtype)
    return [flat[offsets[i] : offsets[i + 1]] for i in range(n)]


def fim_split(
    df: DataFrame,
    rate_pct: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022): for a
    deterministic `rate_pct`% of documents, cut the text at two
    md5-derived points and emit PSM order — <PRE> prefix <SUF> suffix
    <MID> middle — so the model learns infilling; the rest stay
    autoregressive ('ar').  Everything is column expressions (substring
    arithmetic + md5 coins), zero shuffle, and the coins are replayable
    in any engine: cut_i = md5('fim{i}:' || id) % length.

    The document-level coin (not a global sample) keeps the transform
    embarrassingly parallel and stable under repartitioning — the same
    doc always produces the same training sample, which is what makes
    packed-corpus rebuilds reproducible."""
    n = F.length(F.col(text_col))
    safe_n = F.greatest(n, F.lit(1))  # empty text stays 'ar'; avoid mod-0
    c1 = md5_hash32(F.concat(F.lit("fim1:"), F.col(id_col).cast("string"))) % safe_n
    c2 = md5_hash32(F.concat(F.lit("fim2:"), F.col(id_col).cast("string"))) % safe_n
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    coin = (
        md5_hash32(F.concat(F.lit("fimr:"), F.col(id_col).cast("string"))) % 100
    )
    prefix = F.substring(F.col(text_col), F.lit(1), lo)
    middle = F.col(text_col).substr(lo + 1, hi - lo)
    suffix = F.col(text_col).substr(hi + 1, n)
    psm = F.concat(
        F.lit(pre_tok), prefix, F.lit(suf_tok), suffix, F.lit(mid_tok), middle
    )
    is_fim = (coin < rate_pct) & (n > 0)
    return df.select(
        id_col,
        F.when(is_fim, "psm").otherwise("ar").alias("fmt"),
        F.when(is_fim, psm).otherwise(F.col(text_col)).alias("sample"),
    )


def temperature_mix(
    df: DataFrame,
    temperature: float = 0.5,
    target_frac_denom: int = 2,
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Temperature-based multinomial rebalance (the multilingual-mixing
    rule of mBERT/mT5/PaLM): group share p_g is flattened to
    q_g ∝ p_g^τ — τ<1 upsamples tail groups, τ=1 is proportional — and
    each group keeps rows at rate min(1, q_g·N_target/n_g), decided by
    the same md5(group:id) coin as domain_mix (deterministic,
    monotone-in-rate, engine-independent).

    Cross-engine float discipline: the q normalizer is a LEFT-TO-RIGHT
    fold over the group-name-sorted weight list (collect_list →
    sort_array → aggregate; DuckDB replays it with list(ORDER BY) →
    list_reduce) — a plain SUM of doubles would fold in partition order
    and can drift an ulp across engines, which is exactly the boundary
    a rate-threshold compare then amplifies into a row diff.  Group
    stats are |groups| rows; everything broadcasts; zero shuffle on the
    data table."""
    if temperature != 0.5:
        raise NotImplementedError(
            "temperature is fixed at 0.5 (sqrt) so both engines compute the "
            "identical correctly-rounded power; generalize via repeated "
            "sqrt/mul if other τ are needed"
        )
    g = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n"))
    tot = g.agg(F.sum("n").cast("long").alias("n_total"))
    w = g.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n",
        "n_total",
        F.sqrt(F.col("n").cast("double") / F.col("n_total")).alias("wt"),
    )
    norm = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(group_col, "wt"))),
            F.lit(0.0),
            lambda acc, s: acc + s["wt"],
        ).alias("z")
    )
    rates = w.crossJoin(F.broadcast(norm)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("wt") / F.col("z"))
            * F.floor(F.col("n_total") / target_frac_denom).cast("long")
            / F.col("n"),
        ).alias("rate"),
    )
    bucket = F.pmod(
        md5_hash32(
            F.concat(F.col(group_col), F.lit(":"), F.col(id_col).cast("string"))
        ),
        F.lit(10000),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("mix_bucket", bucket)
        .filter(F.col("mix_bucket") < F.col("rate") * 10000.0)
        .select(id_col, group_col, F.round("rate", 6).alias("rate"))
    )


def split_leakage(
    df: DataFrame,
    gram: int = 8,
    weights: tuple[int, int, int] = (80, 10, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/test SPLIT-LEAKAGE audit: for every TEST document, the number
    and fraction of its word n-gram shingles that also occur anywhere in
    the TRAIN split (assign_split's deterministic 80/10/10).  The
    complement of ngram_contamination: that one protects a benchmark
    holdout from the training set; this one measures how much of the test
    split is memorizable from train — the number a data-card reports
    before anyone trusts a loss curve on this corpus.

    Plan: one Arrow shingle pass over the corpus (distinct per doc), the
    train-side shingle vocabulary deduped then BROADCAST into an equi-join
    on the shingle string, per-doc counts roll up map-side.  At 100 TB the
    train vocabulary outgrows a broadcast — swap to a shuffle hash join on
    md5(shingle) (digests, not text, in flight); the operator contract is
    unchanged."""
    from fusionspark.operators.dedup import _py_shingles

    sp = assign_split(df.select(id_col, text_col), weights, id_col).filter(
        F.col("split").isin("train", "test")
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("split", StringType()), StructField("s", StringType())]
    )

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            ids, splits, sh_out = [], [], []
            for did, split, text in zip(pdf[id_col], pdf["split"], pdf[text_col]):
                for s in set(_py_shingles(text, gram)):
                    ids.append(did)
                    splits.append(split)
                    sh_out.append(s)
            yield pd.DataFrame({id_col: ids, "split": splits, "s": sh_out})

    from fusionspark.io import spread

    # r15: one-row-group local input - see io.spread
    sh = spread(sp.select(id_col, "split", text_col)).mapInPandas(
        emit, schema=schema
    )
    train_sh = sh.filter(F.col("split") == "train").select("s").distinct()
    test_sh = sh.filter(F.col("split") == "test").select(id_col, "s")
    tot = test_sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_shingles"))
    leaks = (
        test_sh.join(F.broadcast(train_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_leaked"))
    )
    from fusionspark.operators.textstats import round6_stable

    # r14: leaked/total is an integer ratio — round6_stable, not ROUND
    return (
        tot.join(leaks, id_col, "left")
        .withColumn("n_leaked", F.coalesce(F.col("n_leaked"), F.lit(0)).cast("long"))
        .withColumn(
            "leak_frac",
            round6_stable(F.col("n_leaked") / F.col("n_shingles").cast("double")),
        )
    )
