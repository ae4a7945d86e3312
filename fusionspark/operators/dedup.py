"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (its nearest analogue is the Jaccard memory merge,
/root/reference/src/learning/RecursiveLearningEngine.js:190-243); mandated
by the north-star (BASELINE.json): exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup — each designed so the pair space
never materializes globally:

- exact:      hash-groupBy on content — one shuffle on a 128-bit key.
- MinHash:    shingle → k minhashes → band keys → candidate pairs only
              within a bucket (the classic LSH bound), verify with true
              Jaccard.  Signatures are one zero-shuffle Arrow map;
              hashes are md5-derived so any engine reproduces them;
              degenerate buckets are salt-split.
- SimHash:    32-bit sign-aggregated token hashes; near-dups = hamming ≤ r
              via prefix-band blocking (r+1 bands; pigeonhole-complete)
              with an exact bit_count(xor) verify inside each bucket.
- n-gram:     word-3-gram Jaccard within cheap blocks (lang, source);
              ngram_minhash_neardup swaps in LSH candidates at scale.
- embedding:  cosine ≥ θ within blocks (label; embedding_neardup_ivf
              blocks by IVF centroid at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fusionspark.functions import vector as V
from fusionspark.functions.text import jaccard, tokenize

# ── portable hashing (identical in Spark / DuckDB / Python) ───────────────


def md5_hash32(s: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32) — engine-portable
    (DuckDB: ('0x' || substr(md5(s),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings."""
    toks = tokenize(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """k independent minhashes as one array column: h_i = min over shingles
    of md5_hash32(i || ':' || shingle).  HOF form — prefer
    minhash_signatures() (explode/groupBy) in plans: higher-order functions
    are CodegenFallback and run interpreted."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles,
                    lambda s, i=i: md5_hash32(F.concat(F.lit(f"{i}:"), s)),
                )
            )
            for i in range(num_hashes)
        ]
    )


MINHASH_MOD = 2147483647  # 2^31 - 1


def _py_shingles(text: str | None, n: int = 3) -> list[str]:
    """Python replay of word_shingles(tokenize(text)): lowercase, split on
    Java-\\s runs, drop empties, word n-grams with slice semantics
    (sequence(1, greatest(len-n+1, 1)) → at least one, possibly short,
    shingle).  Kept bit-compatible with the SQL oracle."""
    import re

    toks = [t for t in re.split("[ \t\n\x0b\f\r]+", (text or "").lower()) if t]
    m = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[i : i + n]) for i in range(m)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    drop_shingles: frozenset[str] | None = None,
) -> DataFrame:
    """(id, h0..h{k-1}): 2 md5 bases per shingle → k Carter-Wegman derived
    hashes h_i = (b1 + i·b2) mod (2^31-1) → min per document.

    Signatures are strictly per-document, so this is ONE Arrow-batched map
    over the corpus — no explode, no groupBy, zero shuffle (the round-1
    explode/groupBy form shuffled |shingles| rows; the HOF shingle
    expression was also CodegenFallback-interpreted and dominated the
    dedup bench).  Pure integer arithmetic (b1 + 15·b2 < 2^36 ≪ 2^63) and
    md5 make any engine replay it exactly.

    drop_shingles: optional boilerplate set (see top_df_shingles) removed
    before hashing — the SCALE.md document-frequency knob, off by default
    (changes signatures, so the oracle query keeps it off)."""
    import hashlib

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [df.schema[id_col]]
        + [StructField(f"h{i}", LongType()) for i in range(num_hashes)]
    )
    ks = list(range(num_hashes))

    def sign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_ids = []
            mins_rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                mins = [None] * num_hashes
                for s in _py_shingles(text):
                    if drop_shingles and s in drop_shingles:
                        continue
                    hx = hashlib.md5(s.encode("utf-8")).hexdigest()
                    b1 = int(hx[:8], 16)
                    b2 = int(
                        hashlib.md5(("x:" + s).encode("utf-8")).hexdigest()[:8], 16
                    )
                    for j in ks:
                        h = (b1 + j * b2) % MINHASH_MOD
                        mj = mins[j]
                        if mj is None or h < mj:
                            mins[j] = h
                out_ids.append(did)
                mins_rows.append(mins)
            data = {id_col: out_ids}
            for j in ks:
                data[f"h{j}"] = [m[j] for m in mins_rows]
            yield pd.DataFrame(data)

    return df.select(id_col, text_col).mapInPandas(sign, schema=out_schema)


def top_df_shingles(
    df: DataFrame,
    max_df: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[str]:
    """Shingles appearing in more than max_df of documents — boilerplate to
    drop before MinHash at scale (headers/footers/license blocks otherwise
    glue unrelated documents into one degenerate LSH bucket).  One explode
    + one map-side-combinable count."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([df.schema[id_col], StructField("s", StringType())])

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            ids, sh = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for s in set(_py_shingles(text)):
                    ids.append(did)
                    sh.append(s)
            yield pd.DataFrame({id_col: ids, "s": sh})

    n_docs = df.count()
    counts = (
        df.select(id_col, text_col)
        .mapInPandas(emit, schema=schema)
        .groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df * n_docs)
    )
    return [r["s"] for r in counts.collect()]


# ── exact dedup ───────────────────────────────────────────────────────────


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, keeper =
    min id.  At 100 TB, group on md5(text) (fixed 16 bytes shuffled, not the
    document bodies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


# ── MinHash + LSH ─────────────────────────────────────────────────────────


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, band_key) — documents sharing a band_key are LSH candidate
    pairs.  rows-per-band = num_hashes/bands; P(candidate) = 1-(1-j^r)^b.
    The signature is computed ONCE (explode/groupBy) and bands explode from
    it — never recomputed per band."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bv"))
        .select(id_col, F.col("bv.band").alias("band"), F.col("bv.band_key").alias("band_key"))
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    salt_threshold: int = 256,
    n_salts: int = 16,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from shared LSH buckets.
    The self-join is per-bucket — the shuffle key is band_key, so skew only
    arises from genuinely repeated content.

    Degenerate buckets (> salt_threshold members — e.g. a boilerplate-heavy
    corpus collapsing into one band key) are salt-split: the left side gets
    a deterministic salt in [0, n_salts), the right side replicates one row
    per salt, and the join key gains the salt — every pair still meets
    EXACTLY once (the result set is unchanged) but the quadratic bucket's
    work spreads over n_salts reducers instead of hot-spotting one.  Small
    buckets pay nothing (salt 0, no replication)."""
    from pyspark.sql import Window

    from fusionspark.io import spread

    # r15: corpus-scale caller — spread BEFORE the zero-shuffle signature
    # map (one-row-group local input, io.spread); the probe-sized
    # minhash_lookup path deliberately stays unspread.
    be = minhash_bands(spread(df), id_col, text_col, num_hashes, bands)
    # bucket size via one window pass (same shuffle key the join needs
    # anyway), then materialize ONCE via eager localCheckpoint: the table
    # feeds BOTH join sides — without it the whole signature map would be
    # recomputed per side.  localCheckpoint (not .cache()) because cached
    # plans pin blocks in the CacheManager until an explicit unpersist;
    # long-lived sessions (server, bench loops) calling this repeatedly
    # would accumulate them until executor storage fills.  Checkpoint
    # blocks are released by the ContextCleaner when the DataFrame goes
    # out of scope.  (At 100 TB: persist bands to a table — SCALE.md.)
    be = be.withColumn(
        "_bn", F.count("*").over(Window.partitionBy("band", "band_key"))
    ).localCheckpoint(eager=True)
    big = F.col("_bn") > salt_threshold
    a = be.withColumn(
        "_salt",
        F.when(big, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int"))
        .otherwise(F.lit(0)),
    ).select(id_col, "band", "band_key", "_salt")
    b = be.withColumn(
        "_salt",
        F.explode(
            F.when(big, F.sequence(F.lit(0), F.lit(n_salts - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    ).select(id_col, "band", "band_key", "_salt")
    a, b = a.alias("a"), b.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_neardup(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidates verified with true word-set Jaccard ≥ threshold."""
    cands = minhash_candidates(df, id_col, text_col, num_hashes, bands)
    words = df.select(
        F.col(id_col), F.array_distinct(tokenize(F.col(text_col))).alias("words")
    )
    return (
        cands.join(words.withColumnRenamed(id_col, "id_a").withColumnRenamed("words", "wa"), "id_a")
        .join(words.withColumnRenamed(id_col, "id_b").withColumnRenamed("words", "wb"), "id_b")
        .withColumn("sim", jaccard(F.col("wa"), F.col("wb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ── SimHash ───────────────────────────────────────────────────────────────


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash: per token a portable 32-bit hash votes ±1 on each bit
    position; the sign of each position's sum forms the fingerprint.

    Expressed distributively: explode tokens → one row per (doc, bit) vote →
    groupBy doc — all map-side combinable, no per-doc Python.
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok"))
    hashed = toks.withColumn("h", md5_hash32(F.col("tok")))
    # 32 conditional-sum aggregates in ONE groupBy — no row explosion, all
    # codegen'd, map-side combinable (the shuffle carries one 32-wide row
    # per document).  Bit b of h extracted as (h div 2^b) % 2 — shiftright()
    # needs a literal count but the div is exact (h < 2^32).
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when((F.col("h").bitwiseAND(1 << b)) != 0, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(32)
        ]
    )
    simhash = sum(
        (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0).cast("bigint")
            for b in range(1, 32)
        ),
        F.when(F.col("s0") > 0, F.lit(1)).otherwise(0).cast("bigint"),
    )
    return votes.select(F.col(id_col), simhash.alias("simhash"))


def simhash_bands(
    sh: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    n_bits: int = 32,
) -> DataFrame:
    """(id, simhash, band, band_val) — the n_bits bits split into
    max_hamming+1 contiguous bands.  Pigeonhole: a pair with ≤ r differing
    bits cannot differ in all r+1 bands, so every true near-dup pair shares
    at least one (band, band_val) key — the equi-join on that key is the
    blocking that replaces the O(N²) all-pairs join.  Works for any width
    up to 64: shiftright is arithmetic on LongType, but the mask keeps
    exactly bits [lo, lo+width) so sign-extension never leaks into a
    band value (same convention as the DuckDB `>>`+mask replay)."""
    n_bands = max_hamming + 1
    base, rem = divmod(n_bits, n_bands)
    entries, lo = [], 0
    for b in range(n_bands):
        width = base + (1 if b < rem else 0)
        # width == 64 (max_hamming=0, exact-dup banding): the full hash IS
        # the band value — (1<<64)-1 would overflow the Java long literal
        shifted = F.shiftright(F.col(hash_col), lo)
        if width < 64:
            shifted = shifted.bitwiseAND((1 << width) - 1)
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                # bits [lo, lo+width): literal shift counts per band
                shifted.alias("band_val"),
            )
        )
        lo += width
    return sh.select(
        F.col(id_col), F.col(hash_col), F.explode(F.array(*entries)).alias("bv")
    ).select(
        id_col, hash_col, F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val")
    )


def simhash_neardup(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ r, found via prefix-band
    blocking: candidates meet only inside a shared (band, band_val) bucket
    (complete by pigeonhole — see simhash_bands), then the exact
    bit_count(xor) verify keeps true pairs.  A pair sharing several bands
    appears once (distinct on the pair).  The shuffle key is the band
    bucket, so the pair space never materializes globally — the round-1
    all-pairs `a.id < b.id` theta-join was O(N²) at any scale."""
    sh = simhash32(df, id_col, text_col)
    be = simhash_bands(sh, max_hamming, id_col)
    a, b = be.alias("a"), be.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
        .distinct()
    )


# ── n-gram Jaccard (blocked) ──────────────────────────────────────────────


def ngram_jaccard_neardup(
    df: DataFrame,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Word-n-gram-shingle Jaccard within blocks.  Blocking keys bound the
    pair space; at scale replace with MinHash bucketing (same verify)."""
    from fusionspark.io import spread

    sh = spread(df).select(
        *[F.col(c) for c in block_cols],
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn("sim", jaccard(F.col("a.sh"), F.col("b.sh")))
        .filter(F.col("sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "sim",
        )
    )


def ngram_minhash_neardup(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """n-gram Jaccard near-dup with MinHash+LSH as the pair generator —
    the scale form of ngram_jaccard_neardup: instead of low-cardinality
    (lang, source) blocks (quadratic within block), candidates come from
    shared LSH buckets (recall governed by the banding curve), then the
    same exact shingle-Jaccard verify runs on candidates only."""
    # candidates feed three consumers (the id semi-join and both verify
    # joins) — materialize once; the pair table is tiny by LSH design
    cands = minhash_candidates(df, id_col, text_col, num_hashes, bands).localCheckpoint(
        eager=True
    )
    # verify shingles are computed ONLY for docs appearing in a candidate
    # pair (LSH keeps that a sliver of the corpus) and only ONCE — without
    # the semi-join + checkpoint the interpreted shingle HOF would run
    # over the full corpus twice, once per join side
    wanted = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        df.join(wanted, id_col, "leftsemi")
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sha"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "shb"), "id_b")
        .withColumn("sim", jaccard(F.col("sha"), F.col("shb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ── embedding cosine near-dup ─────────────────────────────────────────────


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Near-identical vectors: cosine ≥ θ within blocks (here `label`; at
    scale an IVF centroid id — see embedding_neardup_ivf — so each block
    fits an executor).

    One shuffle (groupBy block), then pairwise scoring INSIDE each group
    as an Arrow-batched fold — no self-join: the join form exchanged both
    sides with payloads and its 64-term cosine inside the joined stage
    blew Janino's method limit, de-codegening the whole stage (measured
    17s vs ~2s here at sf0.1).  The fold is the same left-to-right float64
    element order as the unrolled expression / DuckDB oracle — bit-exact —
    and A-row chunking bounds peak memory at chunk × block_size."""
    import numpy as np
    import pandas as pd

    from fusionspark.operators.knn import id_sql_type, vector_dim

    dim = vector_dim(df, vector_col)
    idt = id_sql_type(df, id_col)
    out_schema = f"id_a {idt}, id_b {idt}, sim double"

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        ids = pdf[id_col].to_numpy()
        E = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
        acc = np.zeros(n)
        for i in range(dim):
            acc = acc + E[:, i] * E[:, i]
        norms = np.sqrt(acc)
        out_a, out_b, out_s = [], [], []
        chunk = max(1, min(1024, (1 << 24) // max(n, 1)))  # ≤128 MB fp64 tmp
        for s in range(0, n, chunk):
            A = E[s : s + chunk]
            m = len(A)
            accm = np.zeros((m, n))
            for i in range(dim):
                accm = accm + A[:, i][:, None] * E[:, i][None, :]
            denom = norms[s : s + chunk][:, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom > 0, accm / denom, 0.0)
            ia, ib = np.nonzero(
                (sims >= threshold) & (ids[s : s + chunk][:, None] < ids[None, :])
            )
            out_a.append(ids[s + ia])
            out_b.append(ids[ib])
            out_s.append(sims[ia, ib])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return (
        df.select(block_col, id_col, vector_col)
        .groupBy(block_col)
        .applyInPandas(pairs, schema=out_schema)
    )


def embedding_neardup_ivf(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup blocked by IVF centroid id — the documented scale
    path wired: assignment is the zero-shuffle Arrow map from
    operators/ann.py, so the only join is the within-list self-join and
    block sizes follow the codebook instead of a low-cardinality label.
    Near-identical vectors share a centroid except exactly on a Voronoi
    boundary (cosine ≥ 0.95 pairs split across lists are missed — the
    standard IVF recall trade, tune n_centroids)."""
    from fusionspark.operators.ann import deterministic_centroids, ivf_assign

    cents = deterministic_centroids(df, n_centroids, id_col, vector_col)
    assigned = ivf_assign(df, cents, id_col, vector_col).drop("c_sim")
    return embedding_neardup(
        assigned, threshold, block_col="centroid_id",
        id_col=id_col, vector_col=vector_col,
    )


# ── connected components (cluster the near-dup graph) ─────────────────────


_INTEGRAL = ("tinyint", "smallint", "int", "bigint", "long")


def _require_integral_ids(df: DataFrame, col: str, what: str) -> None:
    """Component labels propagate as MIN over int64 ids; a silent
    .cast('long') on string ids would turn every label NULL.  Fail loudly
    instead (ADVICE r5)."""
    dt = dict(df.dtypes).get(col)
    if dt not in _INTEGRAL:
        raise TypeError(
            f"connected_components needs an integral {what} id column; "
            f"{col!r} is {dt!r} — map string ids to int64 (e.g. xxhash64) "
            "before clustering"
        )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Label each node with the MINIMUM id reachable through `edges`
    (undirected pairs id_a/id_b) — the step after any near-dup pass: pairs
    say "these two match", components say "this whole group is one
    document", and the canonical keeper is the component label itself.
    Reference contract: the reference deduplicates by replacing matched
    ids one pair at a time (in-memory Map); at 100 TB the pair list is a
    graph and dedup IS connected components.

    Plan (algorithm='minlabel'): min-label propagation — per round, every
    node offers its label to its neighbors (one shuffle join edges⋈labels)
    and keeps the minimum (one groupBy).  Rounds needed = graph diameter,
    and near-dup clusters are shallow (a dup cluster's diameter is small
    by construction — everything is similar to everything).  Lineage is
    cut per round with an eager localCheckpoint, and convergence is
    detected by the monotone label sum going flat (labels only ever
    decrease, so equal sum ⇒ fixed point).

    algorithm='star': alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log² n) rounds on
    ANY graph, the right choice when the match graph can chain (diameter
    ≫ log n, where min-label's diameter-many rounds would not converge
    within max_iter)."""
    _require_integral_ids(edges, "id_a", "edge")
    _require_integral_ids(edges, "id_b", "edge")
    _require_integral_ids(nodes, id_col, "node")
    if algorithm == "star":
        return _cc_two_phase(edges, nodes, id_col, max_iter)
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    sym = (
        edges.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .union(edges.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # the loop runs over edge-INCIDENT nodes only — singletons (the vast
    # majority of a deduped corpus) never enter the propagation table and
    # rejoin as their own component at the end.  At 100 TB this is the
    # difference between iterating over the match graph (small) and the
    # corpus (not).
    #
    # r15: the identity init + first propagation round are FOLDED into one
    # aggregation — sym is symmetric, so min(least(s, d)) grouped by d is
    # exactly min(N(u) ∪ {u}), the post-round-1 label table the old
    # (distinct → join → groupBy → checkpoint) pair produced.  Label
    # trajectory from round 2 on is unchanged; one shuffle, one
    # checkpoint and one convergence collect less per call.
    labels = (
        sym.groupBy(F.col("d").alias("node"))
        .agg(F.min(F.least(F.col("s"), F.col("d"))).cast("long").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iter - 1):
        msgs = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("lbl")
        )
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        # None = empty propagation table (no edges at all) — already done;
        # equal sums = fixed point (labels only ever decrease)
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            break
        prev_sum = cur_sum
    return (
        nodes.select(F.col(id_col))
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("lbl"), F.col(id_col).cast("long")).alias(
                "component"
            ),
        )
    )


def _cc_two_phase(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iter: int,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al. 2014, Algorithm 5).  Per round:

    * large-star — per node u with neighborhood N(u): m = min(N(u) ∪ {u});
      emit (v, m) for every v ∈ N(u) with v > u.
    * small-star — direct each edge toward its larger endpoint; per u with
      smaller-neighbors N: m = min(N); emit (v, m) for v ∈ N, v ≠ m, plus
      (u, m).

    Both are one groupBy + one join per round — the same shuffle shape as
    min-label propagation — but the round count is O(log² n) on ANY graph
    (each round at least halves star heights), not the graph diameter.  At
    the fixed point the edge set is exactly the star forest rooted at each
    component's minimum; labels read straight off the edges.  Convergence
    is detected by an order-insensitive edge-set fingerprint (count + sum
    of per-edge xxhash64 — a collision needs two distinct edge SETS with
    equal 64-bit sums within one run)."""
    e = (
        edges.select(
            F.col("id_a").cast("long").alias("s"),
            F.col("id_b").cast("long").alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = None
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        m_u = sym.groupBy("s").agg(F.min("d").alias("mind"))
        m_u = m_u.select("s", F.least(F.col("mind"), F.col("s")).alias("m"))
        large = (
            sym.join(m_u, "s")
            .filter(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )
        dirg = large.select(
            F.greatest("s", "d").alias("u"), F.least("s", "d").alias("v")
        ).filter(F.col("u") != F.col("v"))
        m_small = dirg.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            dirg.join(m_small, "u")
            .select(F.col("v").alias("s"), F.col("m").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .union(m_small.select(F.col("u").alias("s"), F.col("m").alias("d")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        row = e.agg(
            F.count("*").alias("n"),
            # decimal(38,0) sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64("s", "d").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        fp = (row["n"], row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    labels = e.groupBy("s").agg(F.min("d").alias("lbl")).withColumnRenamed(
        "s", "node"
    )
    return (
        nodes.select(F.col(id_col))
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("lbl"), F.col(id_col).cast("long")).alias(
                "component"
            ),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    max_df: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Sub-document (paragraph-level) dedup, the RefinedWeb/CCNet
    boilerplate-removal pass: split each document on `sep`, count how many
    DISTINCT documents each paragraph appears in across the corpus, drop
    paragraphs appearing in more than `max_df` documents (navigation bars,
    license headers, share buttons — the text exact whole-doc dedup never
    catches), and reassemble the surviving paragraphs in original order.

    Returns (id, text, n_kept, n_dropped); documents whose every paragraph
    was boilerplate survive with empty text (the caller's funnel decides
    their fate), so row count is preserved.

    Scale shape at 100 TB: the frequency aggregation groups on md5(para) —
    a 16-byte shuffle key, never paragraph bodies; the verdict rejoins on
    the same digest (paragraph text rides along only within its original
    row); reassembly is one groupBy(id) with an array_sort — no window, no
    driver collect.  Paragraphs shorter than `min_chars` (e.g. empty splits
    from ragged separators) are dropped up front."""
    parts = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("pos", "para"),
        )
        .filter(F.length("para") >= min_chars)
        .withColumn("ph", F.md5("para"))
    )
    freq = parts.groupBy("ph").agg(F.count_distinct(id_col).alias("para_df"))
    # r16 (§1.2 fewer passes): the verdict rides an inner join (freq was
    # built FROM parts, so every part row matches) and ONE groupBy(id)
    # folds totals + keeps + reassembly together — the old shape ran the
    # split/explode/md5 map three times (freq input, semi-join left,
    # totals) and paid two id-keyed exchanges plus an outer join.  The
    # kept flag rides the sort struct BEHIND (pos, para), and pos is
    # unique per doc, so the surviving-paragraph order is unchanged.
    keep = F.col("para_df") <= max_df
    return (
        parts.join(freq, "ph")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct("pos", "para", keep.alias("k"))
                            )
                        ),
                        lambda s: s["k"],
                    ),
                    lambda s: s["para"],
                ),
            ).alias(text_col),
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
            F.count("*").alias("n_paras"),
        )
        .select(
            id_col,
            text_col,
            "n_kept",
            (F.col("n_paras") - F.col("n_kept")).cast("long").alias("n_dropped"),
        )
    )


def ngram_contamination(
    df: DataFrame,
    holdout_pct: int = 5,
    gram: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/eval DECONTAMINATION: flag training documents that share at
    least one word n-gram with a held-out benchmark set (the GPT-3-style
    13-gram overlap check, n scaled to this corpus's short docs).  The
    holdout here is the deterministic md5 sample (in production: the
    benchmark suite itself).  Plan: distinct shingles per doc → the small
    holdout side broadcasts into an equi-join keyed on the shingle →
    per-doc distinct-hit count.  No all-pairs anything; cost is one
    broadcast hash join over the training shingles."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([df.schema[id_col], StructField("s", StringType())])

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            ids, sh_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for s in set(_py_shingles(text, gram)):
                    ids.append(did)
                    sh_out.append(s)
            yield pd.DataFrame({id_col: ids, "s": sh_out})

    # Arrow-batched shingle emitter (the HOF transform expression is
    # CodegenFallback-interpreted; the Python replay is bit-identical)
    from fusionspark.io import spread

    sh = spread(df.select(id_col, text_col)).mapInPandas(emit, schema=schema)
    is_holdout = F.pmod(md5_hash32(F.col(id_col).cast("string")), F.lit(100))
    sh = sh.withColumn("_b", is_holdout)
    holdout_sh = sh.filter(F.col("_b") < holdout_pct).select("s").distinct()
    train_sh = sh.filter(F.col("_b") >= holdout_pct).select(id_col, "s")
    return (
        train_sh.join(F.broadcast(holdout_sh), "s")
        .groupBy(id_col)
        .agg(F.count_distinct("s").alias("n_hits"))
    )


# ── incremental dedup (persisted LSH index) ───────────────────────────────


def persist_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's banded MinHash index: one row per (id, band)
    carrying the band_key AND the full signature (denormalized — ~4×16
    longs per doc — so a lookup needs ONE join, no second trip for the
    signature).  Partitioned by band: a probe for band b scans 1/bands of
    the index.  This is the corpus side of continuous-ingestion dedup —
    built once with mode='overwrite', then extended per accepted ingest
    batch with mode='append' (only the batch is signed; the existing
    index is never recomputed)."""
    from fusionspark.io import spread

    rows = num_hashes // bands
    sig = minhash_signatures(spread(df), id_col, text_col, num_hashes)
    hcols = [f"h{i}" for i in range(num_hashes)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    (
        sig.select(F.col(id_col), F.array(*hcols).alias("sig"), F.explode(band_structs).alias("bv"))
        .select(
            id_col, "sig",
            F.col("bv.band").alias("band"), F.col("bv.band_key").alias("band_key"),
        )
        .write.mode(mode)
        .partitionBy("band")
        .parquet(path)
    )


def minhash_lookup(
    spark,
    new_df: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    verify: str = "estimate",
    corpus_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: match a NEW batch against the persisted corpus
    index without touching corpus text.  The new batch's banded signatures
    (one zero-shuffle Arrow map) BROADCAST into a join with the index on
    (band, band_key) — the corpus side never shuffles — and similarity is
    the MinHash estimate itself: the fraction of agreeing signature
    components (E[agreement] = Jaccard), so no text verify pass is needed
    at lookup time.  Returns (new_id, corpus_id, est_sim ≥ threshold).

    The estimate has σ ≈ sqrt(J(1-J)/k) (~0.125 at k=16 near J=0.5), so a
    near-threshold pair can land on the wrong side.  `verify='jaccard'`
    re-checks candidates against TRUE word-set Jaccard, fetching text for
    the candidate ids only (tiny by LSH design — a broadcast semi-join
    prunes the `corpus_df` scan; corpus text still never shuffles).
    Returns (new_id, corpus_id, sim ≥ threshold) with exact sims."""
    rows = num_hashes // bands
    sig = minhash_signatures(new_df, id_col, text_col, num_hashes)
    hcols = [f"h{i}" for i in range(num_hashes)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    probe = (
        sig.select(
            F.col(id_col).alias("new_id"),
            F.array(*hcols).alias("new_sig"),
            F.explode(band_structs).alias("bv"),
        )
        .select(
            "new_id", "new_sig",
            F.col("bv.band").alias("band"), F.col("bv.band_key").alias("band_key"),
        )
    )
    index = spark.read.parquet(index_path)
    if verify == "jaccard":
        if corpus_df is None:
            raise ValueError("verify='jaccard' needs corpus_df (the text source)")
        cands = (
            index.join(F.broadcast(probe), ["band", "band_key"])
            .select("new_id", F.col(id_col).alias("corpus_id"))
            .distinct()
        )
        new_words = new_df.select(
            F.col(id_col).alias("new_id"),
            F.array_distinct(tokenize(F.col(text_col))).alias("wa"),
        )
        corp_words = (
            corpus_df.join(
                F.broadcast(cands.select("corpus_id").distinct()),
                corpus_df[id_col] == F.col("corpus_id"),
                "left_semi",
            )
            .select(
                F.col(id_col).alias("corpus_id"),
                F.array_distinct(tokenize(F.col(text_col))).alias("wb"),
            )
        )
        return (
            cands.join(F.broadcast(new_words), "new_id")
            .join(corp_words, "corpus_id")
            .withColumn("sim", jaccard(F.col("wa"), F.col("wb")))
            .filter(F.col("sim") >= threshold)
            .select("new_id", "corpus_id", "sim")
        )
    if verify != "estimate":
        raise ValueError(f"unknown verify mode {verify!r}")
    agree = F.size(
        F.filter(
            F.zip_with("new_sig", "sig", lambda a, b: a.eqNullSafe(b)),
            lambda x: x,
        )
    )
    return (
        index.join(F.broadcast(probe), ["band", "band_key"])
        .select(
            "new_id",
            F.col(id_col).alias("corpus_id"),
            (agree.cast("double") / F.lit(num_hashes)).alias("est_sim"),
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.max("est_sim").alias("est_sim"))
        .filter(F.col("est_sim") >= threshold)
    )


# ── window-level duplicate-span detection (substring-granular dedup) ──────


def window_dup_stats(
    df,
    w: int = 8,
    stride: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Duplicate TOKEN-WINDOW detection — the bucketed approximation of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): slide w-token windows at `stride`,
    hash each window, count window hashes corpus-wide, and report per
    document how much of it is covered by windows that occur elsewhere
    (boilerplate spans, licence blocks, templated pages — the duplication
    EXACT doc-level dedup can't see).

    Scale shape: windows leave the scan as md5 DIGESTS only (never window
    text); the frequency count groups on the digest (map-side combine) and
    the verdict is a broadcast-friendly join of the (tiny) duplicated-hash
    set back onto the digest stream.  stride trades recall for row count —
    w/stride windows per token position bound the blowup at 100 TB."""
    from fusionspark.io import spread

    df = spread(df)  # r15: the window pass runs twice over this map
    words = tokenize(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words) - (w - 1), F.lit(1)), F.lit(stride)
    )
    wins = df.select(
        id_col,
        F.explode(
            F.transform(
                starts, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, w)))
            )
        ).alias("h"),
    )
    freq = wins.groupBy("h").agg(F.count("*").alias("n"))
    dup_hashes = freq.filter(F.col("n") > 1).select("h")
    flagged = wins.join(F.broadcast(dup_hashes).withColumn("dup", F.lit(1)), "h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dup"),
        )
        .select(
            id_col,
            "n_windows",
            F.col("n_dup").cast("long").alias("n_dup"),
            F.round(F.col("n_dup") / F.col("n_windows"), 6).alias("dup_frac"),
        )
    )


def window_dedup_rewrite(
    df,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Duplicate-span REMOVAL (the transform behind window_dup_stats'
    report): cut the text into NON-OVERLAPPING w-token windows, drop every
    window whose hash occurs more than once corpus-wide, and reassemble
    the survivors in order — Lee et al. 2022's substring dedup at window
    granularity (the suffix-array exactness traded for hash-bucket
    scale).

    Scale shape: windows shuffle as (id, window_idx, digest) — the window
    TEXT rides only the explode→reassemble path inside the same rows, and
    reassembly is one groupBy(id) + in-order array join.  The duplicated-
    hash set is corpus-frequency ≥ 2 — tiny — and lands as a broadcast
    left join."""
    words = tokenize(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(w))
    wins = df.select(
        id_col,
        F.posexplode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(words, i, w)))
        ).alias("widx", "wtext"),
    ).filter(F.col("wtext") != "")
    wins = wins.withColumn("h", F.md5("wtext"))
    dup = (
        wins.groupBy("h").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1).select("h")
    )
    flagged = wins.join(F.broadcast(dup).withColumn("is_dup", F.lit(1)), "h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("is_dup").isNull(),
                                   F.struct("widx", "wtext"))
                        )
                    ),
                    lambda s: s["wtext"],
                ),
            ).alias("clean_text"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_removed"),
            F.count("*").cast("long").alias("n_windows"),
        )
    )


# ── SemDedup: semantic dedup keeping the least-prototypical example ───────


def semdedup(
    df: DataFrame,
    threshold: float = 0.3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Cluster-blocked semantic dedup (Abbas et al., "SemDedup"): k-means
    (here: deterministic IVF) clusters bound the pair space; inside a
    cluster, any pair with cosine ≥ θ is a semantic duplicate and the
    member with the HIGHER centroid similarity is dropped — keeping the
    least prototypical example preserves diversity (the paper's keep rule).
    Returns the surviving rows as (id, centroid_id, c_sim_r).

    One deterministic pass, SQL-replayable: a row survives iff no OTHER
    row in its cluster condemns it (non-cascading — a removed row still
    condemns its own duplicates, so the survivor set is join-expressible
    instead of order-dependent).  Ties on rounded centroid similarity drop
    the higher id.

    Scale shape: pair generation is the within-list Arrow GEMM fold from
    embedding_neardup (no self-join, block size bounded by the codebook);
    the pair and removed sets are near-dup-sized, so both joins back
    broadcast.  Assignment is the zero-shuffle codebook-in-closure map from
    operators/ann.py."""
    from fusionspark.operators.ann import deterministic_centroids, ivf_assign

    cents = deterministic_centroids(df, n_centroids, id_col, vector_col)
    assigned = ivf_assign(df, cents, id_col, vector_col)
    # r16: checkpoint the vector-free prototypicality table (guide §2.4) —
    # proto feeds the pair join twice AND the final anti-join, so the
    # codebook-assignment GEMM over the corpus ran 3× (plus once more
    # inside the pair generator).  (id, c_sim_r, centroid_id) is ids-only,
    # so the materialization is narrow at any scale.
    proto = assigned.select(
        F.col(id_col),
        F.round("c_sim", 6).alias("c_sim_r"),
        "centroid_id",
    ).localCheckpoint(eager=True)
    pairs = embedding_neardup(
        assigned.drop("c_sim"),
        threshold,
        block_col="centroid_id",
        id_col=id_col,
        vector_col=vector_col,
    )
    # the PAIR side broadcasts (near-dup-sized); proto is corpus-sized
    e = proto.select(F.col(id_col).alias("id_a"), F.col("c_sim_r").alias("ca")).join(
        F.broadcast(pairs.select("id_a", "id_b")), "id_a"
    )
    e = proto.select(F.col(id_col).alias("id_b"), F.col("c_sim_r").alias("cb")).join(
        F.broadcast(e), "id_b"
    )
    # id_a < id_b by construction: drop b when its (rounded) centroid
    # similarity is >= a's (tie -> higher id goes), else drop a
    removed = e.select(
        F.when(F.col("cb") >= F.col("ca"), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias(id_col)
    ).distinct()
    return proto.join(F.broadcast(removed), id_col, "left_anti")


def ngram_novelty(
    df: DataFrame,
    gram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct word
    n-grams whose corpus-wide first occurrence (minimum id) is this doc —
    "what does this document add that no earlier document already said".
    Dedup's dual: near-dup finds pairs, novelty scores each doc's marginal
    contribution (the descending-novelty order is a dedup-aware curriculum
    and a boilerplate detector: novelty ≈ 0 docs are assembled from
    already-seen phrases).

    Plan: the Arrow shingle emitter (same kernel family as
    ngram_contamination — the HOF expression would run interpreted) →
    per-gram MIN(id) agg → join back on the gram key (co-partitioned with
    the agg, so the join reuses the shuffle) → one per-doc agg.  No
    all-pairs join anywhere; cost is two gram-keyed shuffles bounded by
    corpus token count, same as the contamination check."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([df.schema[id_col], StructField("s", StringType())])

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            ids, sh_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for s in set(_py_shingles(text, gram)):
                    ids.append(did)
                    sh_out.append(s)
            yield pd.DataFrame({id_col: ids, "s": sh_out})

    from fusionspark.io import spread

    sh = spread(df.select(id_col, text_col)).mapInPandas(emit, schema=schema)
    firsts = sh.groupBy("s").agg(F.min(id_col).alias("first_doc"))
    per_doc = (
        sh.join(firsts, "s")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col(id_col)).cast("int"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
            "novelty"
        ),
    )


def containment_neardup(
    df: DataFrame,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Sub-document duplication via the OVERLAP COEFFICIENT
    |A∩B| / min(|A|, |B|) over word-shingle sets — the asymmetric member
    of the near-dup family: a short doc fully quoted inside a long one
    scores ~1 here while its Jaccard (|A∩B|/|A∪B|) stays low, so a
    Jaccard-thresholded dedup never sees it.

    Candidates come from the same MinHash band buckets as
    ngram_minhash_neardup; the verify divides by the SMALLER set instead
    of the union.  Caveat (documented, by design): MinHash banding is
    tuned to Jaccard, so extreme-containment/low-Jaccard pairs (tiny A
    inside huge B) can miss the candidate stage — production systems use
    containment-calibrated banding (LSH Ensemble, Zhu et al. VLDB'16),
    which is a band-threshold swap on this same plan, not a new plan."""
    cands = minhash_candidates(df, id_col, text_col, num_hashes, bands).localCheckpoint(
        eager=True
    )
    wanted = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        df.join(wanted, id_col, "leftsemi")
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    denom = F.least(F.size("sha"), F.size("shb"))
    return (
        cands.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sha"), "id_a"
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "shb"), "id_b"
        )
        .withColumn("containment", inter.cast("double") / denom)
        .filter((inter > 0) & (F.col("containment") >= F.lit(threshold)))
        .select("id_a", "id_b", "containment")
    )


def cdc_chunk_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    mask: int = 16,
) -> DataFrame:
    """Content-defined chunk hashes (the FastCDC/rsync family at word
    granularity) as ONE zero-shuffle Arrow map: per doc, a boundary
    falls after word i wherever the md5 window hash of words [i−w+1, i]
    is ≡ 0 (mod ``mask``); emits (id, idx, h=md5(chunk text)).

    Why a kernel and not column expressions: the boundary test is an
    md5 per (word position), and a ``filter(sequence(...), i -> md5)``
    HOF runs INTERPRETED in Spark (measured 80 s for 5,000 docs at
    sf0.1 vs 2 s here — the repetition_stats / ngram_contamination
    lesson).  The hash law is engine-portable, so the DuckDB oracle
    replays it with list lambdas bit-for-bit."""
    import hashlib
    from collections.abc import Iterator

    from fusionspark.io import spread

    df = spread(df)  # r15: one-row-group local input - see io.spread

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"_id": [], "idx": [], "h": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).lower().split(" ") if w != ""]
                if not words:
                    continue
                cuts = [0]
                for i in range(window, len(words) + 1):
                    win = " ".join(words[i - window : i])
                    if int(hashlib.md5(win.encode()).hexdigest()[:8], 16) % mask == 0:
                        cuts.append(i)
                if cuts[-1] != len(words):
                    cuts.append(len(words))
                for j in range(len(cuts) - 1):
                    chunk = " ".join(words[cuts[j] : cuts[j + 1]])
                    out["_id"].append(did)
                    out["idx"].append(j)
                    out["h"].append(hashlib.md5(chunk.encode()).hexdigest())
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col).alias(id_col), F.col(text_col))
        .mapInPandas(run, schema=f"_id bigint, idx bigint, h string")
        .withColumnRenamed("_id", id_col)
    )
