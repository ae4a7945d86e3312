"""RAG family (SURVEY §2.10 T1-T3, §2.3 V8/V9) — chunkers and the mock
embedder are bit-exact Python ports running as Arrow-batched UDFs, so they
get rows-only driver checks (pytest asserts the boundary/overlap/norm
invariants and node-parity against the reference implementation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.functions import vector as V
from fusionspark.io import load_table
from fusionspark.operators import dedup
from fusionspark.operators.chunking import chunk_documents
from fusionspark.operators.embedder import embed_texts
from fusionspark.queries import query


# T1 oracle: the separator CASCADE collapses on this corpus — documents.text
# contains no '\n\n', '\n', or '. ' at any SF (verified 3 SFs), so levels
# 1-3 of _splitRecursive are identity pass-throughs and the whole cascade
# reduces to exactly two cases the SQL replays:
#   * len(text) <= 192: ONE whole chunk — either the <=128 entry case
#     (RAGPipeline.js:261) or the single level-1 chunk that fails the
#     1.5x re-split test (:292);
#   * len(text) > 192: the level-4 word fold (separator ' ', close when
#     len(current+' '+word) > 128 with current non-empty, new current =
#     last-20-chars-of-current + ' ' + word), replayed step-for-step with
#     a recursive CTE like the T2/T3 oracles.  Unlike T2/T3 the reference
#     fold does NOT trim emitted chunks (:275 pushes `current` raw).
_CHUNKS_RECURSIVE_ORACLE = r"""
    WITH RECURSIVE base AS (
        SELECT doc_id::VARCHAR AS doc_id, COALESCE(text, '') AS text
        FROM documents
    ),
    whole AS (
        SELECT doc_id, text AS chunk_text, 0::BIGINT AS pos
        FROM base WHERE length(text) <= 192
    ),
    words AS (
        SELECT doc_id, arr[pos] AS w, pos::BIGINT AS pos, len(arr)::BIGINT AS n
        FROM (SELECT doc_id, string_split(text, ' ') AS arr
              FROM base WHERE length(text) > 192),
             LATERAL unnest(generate_series(1, len(arr))) AS g(pos)
    ),
    fold AS (
        SELECT doc_id, 0::BIGINT AS pos, MAX(n) AS n, '' AS current,
               NULL::VARCHAR AS emitted
        FROM words GROUP BY doc_id
        UNION ALL
        SELECT f.doc_id, w.pos, f.n,
               CASE WHEN f.current = '' THEN w.w
                    WHEN length(f.current || ' ' || w.w) > 128
                    THEN substr(f.current,
                                greatest(1, length(f.current) - 20 + 1))
                         || ' ' || w.w
                    ELSE f.current || ' ' || w.w
               END AS current,
               CASE WHEN f.current <> ''
                         AND length(f.current || ' ' || w.w) > 128
                    THEN f.current
               END AS emitted
        FROM fold f JOIN words w ON w.doc_id = f.doc_id AND w.pos = f.pos + 1
    ),
    closed AS (
        SELECT doc_id, pos, emitted AS chunk_text
        FROM fold WHERE emitted IS NOT NULL
        UNION ALL
        SELECT doc_id, pos + 1, current FROM fold
        WHERE pos = n AND current <> ''
        UNION ALL
        SELECT doc_id, pos, chunk_text FROM whole
    ),
    idx AS (
        SELECT doc_id, chunk_text,
               (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)::INT
                   AS chunk_index,
               COUNT(*) OVER (PARTITION BY doc_id)::INT AS total_chunks
        FROM closed
    )
    SELECT doc_id, chunk_index, total_chunks,
           length(chunk_text)::INT AS chunk_len,
           md5(chunk_text) AS chunk_md5
    FROM idx
    """


@query("chunks_recursive", _CHUNKS_RECURSIVE_ORACLE)
def chunks_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: recursive separator-cascade chunking (RAGPipeline.js:260-303);
    chunk_size=128 forces the word-separator path on the ~300-char docs.
    The oracle replays the fold (see _CHUNKS_RECURSIVE_ORACLE: the cascade
    provably collapses to whole-doc / word-fold on this corpus).  The
    attestation covers chunk CONTENT (md5), not just lengths (VERDICT
    r7 #5); the collapsed-cascade premise itself is enforced by
    tests/test_chunking.py::test_corpus_has_no_higher_separators."""
    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(d, "recursive", chunk_size=128, chunk_overlap=20)
    return ch.select(
        "doc_id", "chunk_index", "total_chunks",
        F.length("chunk_text").alias("chunk_len"),
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
    )


# T2 oracle: same recursive-CTE fold replay as chunks_paragraph, plus the
# tail overlap — the state step keeps the last 20 characters of the closed
# chunk (substr from the end == Python's current[-overlap:]) prepended to
# the opening sentence.  regexp_extract_all replays re.findall; the
# zero-match fallback keeps the whole text as one sentence like the
# Python `or [text]`.
_CHUNKS_SENTENCE_ORACLE = r"""
    WITH RECURSIVE prep AS (
        SELECT doc_id::VARCHAR AS doc_id,
               regexp_replace(text, '((?:\S+\s+){7}\S+)\s+', '\1. ', 'g') AS text
        FROM documents
    ),
    sents AS (
        SELECT doc_id, arr[pos] AS sent, pos::BIGINT AS pos, len(arr)::BIGINT AS n
        FROM (SELECT doc_id,
                     CASE WHEN len(regexp_extract_all(text, '[^.!?]+[.!?]+')) = 0
                          THEN [text]
                          ELSE regexp_extract_all(text, '[^.!?]+[.!?]+') END AS arr
              FROM prep),
             LATERAL unnest(generate_series(1, len(arr))) AS g(pos)
    ),
    fold AS (
        SELECT doc_id, 0::BIGINT AS pos, MAX(n) AS n,
               '' AS current, NULL::VARCHAR AS emitted
        FROM sents GROUP BY doc_id
        UNION ALL
        SELECT f.doc_id, s.pos, f.n,
               CASE WHEN length(f.current || s.sent) > 128 AND f.current <> ''
                    THEN substr(f.current, greatest(1, length(f.current) - 20 + 1)) || s.sent
                    ELSE f.current || s.sent
               END AS current,
               CASE WHEN length(f.current || s.sent) > 128 AND f.current <> ''
                    THEN trim(f.current, ' ' || chr(9) || chr(10) || chr(13))
               END AS emitted
        FROM fold f JOIN sents s ON s.doc_id = f.doc_id AND s.pos = f.pos + 1
    ),
    closed AS (
        SELECT doc_id, pos, emitted AS chunk_text FROM fold WHERE emitted IS NOT NULL
        UNION ALL
        SELECT doc_id, pos + 1, trim(current, ' ' || chr(9) || chr(10) || chr(13))
        FROM fold
        WHERE pos = n AND trim(current, ' ' || chr(9) || chr(10) || chr(13)) <> ''
    ),
    idx AS (
        SELECT doc_id, chunk_text,
               (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)::INT
                   AS chunk_index,
               COUNT(*) OVER (PARTITION BY doc_id)::INT AS total_chunks
        FROM closed
    )
    SELECT doc_id, chunk_index, total_chunks, length(chunk_text)::INT AS chunk_len
    FROM idx
    """


@query("chunks_sentence", _CHUNKS_SENTENCE_ORACLE)
def chunks_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: sentence-packing chunker (RAGPipeline.js:306-321) over a
    sentence-ized corpus (periods inserted every 8 words in the flat
    text).  The oracle replays the greedy fold INCLUDING the 20-char tail
    overlap with a recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    sent = d.withColumn(
        "text", F.regexp_replace(F.col("text"), r"((?:\S+\s+){7}\S+)\s+", "$1. ")
    )
    ch = chunk_documents(sent, "sentence", chunk_size=128, chunk_overlap=20)
    return ch.select(
        "doc_id", "chunk_index", "total_chunks", F.length("chunk_text").alias("chunk_len")
    )


# T3 oracle: the greedy paragraph-packing fold is replayed with a
# RECURSIVE CTE — one step per paragraph in order, carrying the current
# chunk text as state and emitting a closed chunk exactly when the Python
# fold does (len(current || blank || para) > size AND current <> ''); the
# final flush appends trim(current) like the post-loop branch.  Depth is
# bounded by paragraphs-per-doc, not SF.
_CHUNKS_PARAGRAPH_ORACLE = r"""
    WITH RECURSIVE prep AS (
        SELECT doc_id::VARCHAR AS doc_id,
               regexp_replace(text, '((?:\S+\s+){11}\S+)\s+',
                              '\1' || chr(10) || chr(10), 'g') AS text
        FROM documents
    ),
    paras AS (
        SELECT doc_id, arr[pos] AS para, pos::BIGINT AS pos, len(arr)::BIGINT AS n
        FROM (SELECT doc_id, regexp_split_to_array(text, '\n\n+') AS arr FROM prep),
             LATERAL unnest(generate_series(1, len(arr))) AS g(pos)
    ),
    fold AS (
        SELECT doc_id, 0::BIGINT AS pos, MAX(n) AS n,
               '' AS current, NULL::VARCHAR AS emitted
        FROM paras GROUP BY doc_id
        UNION ALL
        SELECT f.doc_id, p.pos, f.n,
               CASE WHEN length(f.current || chr(10)||chr(10) || p.para) > 160
                         AND f.current <> ''
                    THEN p.para
                    ELSE CASE WHEN f.current <> ''
                              THEN f.current || chr(10)||chr(10) || p.para
                              ELSE p.para END
               END AS current,
               CASE WHEN length(f.current || chr(10)||chr(10) || p.para) > 160
                         AND f.current <> ''
                    THEN trim(f.current, ' ' || chr(9) || chr(10) || chr(13))
               END AS emitted
        FROM fold f JOIN paras p ON p.doc_id = f.doc_id AND p.pos = f.pos + 1
    ),
    closed AS (
        SELECT doc_id, pos, emitted AS chunk_text FROM fold WHERE emitted IS NOT NULL
        UNION ALL
        SELECT doc_id, pos + 1, trim(current, ' ' || chr(9) || chr(10) || chr(13))
        FROM fold
        WHERE pos = n AND trim(current, ' ' || chr(9) || chr(10) || chr(13)) <> ''
    ),
    idx AS (
        SELECT doc_id, chunk_text,
               (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)::INT
                   AS chunk_index,
               COUNT(*) OVER (PARTITION BY doc_id)::INT AS total_chunks
        FROM closed
    )
    SELECT doc_id, chunk_index, total_chunks, length(chunk_text)::INT AS chunk_len
    FROM idx
    """


@query("chunks_paragraph", _CHUNKS_PARAGRAPH_ORACLE)
def chunks_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: paragraph-packing chunker (RAGPipeline.js:324-339) over a
    paragraph-ized corpus (a blank line inserted every 12 words of the
    flat text; chunk_size=160 forces multi-chunk packing).  The oracle
    replays the greedy fold with a recursive CTE, so the chunker is
    hash-attested (chunks_recursive/sentence stay rows-only: tail-overlap
    and the 1.5x re-split cascade carry non-SQL state)."""
    d = load_table(spark, sf_dir, "documents")
    para = d.withColumn(
        "text", F.regexp_replace(F.col("text"), r"((?:\S+\s+){11}\S+)\s+", "$1\n\n")
    )
    ch = chunk_documents(para, "paragraph", chunk_size=160)
    return ch.select(
        "doc_id", "chunk_index", "total_chunks", F.length("chunk_text").alias("chunk_len")
    )


# V9 oracle: the mock embedder's int32-wrapping djb2 fold is replayed in
# SQL — list_reduce over the 20-char window's code points with an explicit
# two's-complement wrap, JS-style signed remainder (DuckDB % keeps the
# dividend sign, matching the Python branch), float32 component rounding
# via ::REAL, and the float64 normalize.  Bit-exact per component (checked
# at 3 SFs); norm/e0 are computed from the normalized float32 vector like
# the Spark side.
_MOCK_EMBED_ORACLE = r"""
    WITH dims AS (SELECT unnest(range(64)) AS i),
    comp AS (
        SELECT d.doc_id, dims.i,
            CAST((
                list_reduce(
                    list_prepend(
                        5381 + dims.i,
                        list_filter(
                            list_transform(range(1, 21), j ->
                                CASE WHEN j <= length(substr(d.text,
                                         CAST(trunc((dims.i::DOUBLE / 64) * length(d.text)) AS BIGINT) + 1, 20))
                                     THEN unicode(substr(substr(d.text,
                                         CAST(trunc((dims.i::DOUBLE / 64) * length(d.text)) AS BIGINT) + 1, 20), j, 1))
                                END),
                            x -> x IS NOT NULL)),
                    (acc, c) -> ((acc * 33 + c + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648
                ) % 2000 - 1000)::DOUBLE / 1000 AS REAL) AS c
        FROM documents d CROSS JOIN dims
    ),
    raw_norms AS (
        SELECT doc_id, SQRT(SUM(c::DOUBLE * c::DOUBLE)) AS rnorm
        FROM comp GROUP BY doc_id
    ),
    normalized AS (
        SELECT c.doc_id, c.i,
               CASE WHEN n.rnorm > 0
                    THEN CAST(c.c::DOUBLE / n.rnorm AS REAL)
                    ELSE c.c END AS nc
        FROM comp c JOIN raw_norms n USING (doc_id)
    )
    SELECT doc_id, CAST(64 AS INT) AS dim,
           ROUND(SQRT(SUM(nc::DOUBLE * nc::DOUBLE)), 6) AS norm,
           ROUND(MAX(CASE WHEN i = 0 THEN nc::DOUBLE END), 6) AS e0
    FROM normalized
    GROUP BY doc_id
    """


@query("mock_embeddings", _MOCK_EMBED_ORACLE)
def mock_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9: deterministic mock embedder (providers.js:87-105) — unit-norm
    64-d vectors from the int32-wrapping hash; joined back per doc (V8
    distinct-text batching).  The oracle replays the hash fold, float32
    rounding, and normalize in SQL, so the embedder itself is
    hash-attested, not just parity-tested."""
    d = load_table(spark, sf_dir, "documents")
    emb = embed_texts(d, "text")
    return (
        d.join(F.broadcast(emb), "text")
        .select(
            "doc_id",
            F.size("embedding").alias("dim"),
            F.round(V.l2_norm("embedding"), 6).alias("norm"),
            F.round(F.element_at(F.col("embedding").cast("array<double>"), 1), 6).alias("e0"),
        )
    )


@query(
    "simhash_neardup",
    """
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
    ),
    bits AS (
        SELECT doc_id, b.b AS bit,
               CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
    ),
    agg AS (SELECT doc_id, bit, SUM(vote) AS s FROM bits GROUP BY doc_id, bit),
    sh AS (
        SELECT doc_id,
               SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM agg GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::INT AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
    """,
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming ≤ 4 on the 32-bit fingerprints
    (prefix-banded at scale; exact xor verify here)."""
    df = dedup.simhash_neardup(
        load_table(spark, sf_dir, "documents"), max_hamming=4
    )
    return df.select("id_a", "id_b", "hamming")


def _mmr_oracle_sql(k: int = 5, topn: int = 20) -> str:
    """Generated greedy-MMR replay: k unrolled MATERIALIZED pick rounds
    (the kmeans/pca oracle pattern — inlined CTEs would re-evaluate the
    chain exponentially).  All similarities come from DuckDB's native
    list_cosine_similarity, bit-compatible with the Spark fold (the
    knn_cosine parity proven every gate since r2)."""
    parts = [
        f"""cands AS MATERIALIZED (
        SELECT e.vec_id, e.embedding,
               list_cosine_similarity(e.embedding::DOUBLE[],
                                      p.embedding::DOUBLE[]) AS rel
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        ORDER BY rel DESC, e.vec_id ASC LIMIT {topn}
    )""",
        """pairs AS MATERIALIZED (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) AS sim
        FROM cands a JOIN cands b ON a.vec_id <> b.vec_id
    )""",
        """pick1 AS MATERIALIZED (
        SELECT vec_id, rel, 0.5 * rel AS mmr, 1 AS rnk FROM cands
        ORDER BY rel DESC, vec_id ASC LIMIT 1
    )""",
    ]
    for i in range(2, k + 1):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM pick{j}" for j in range(1, i)
        )
        parts.append(f"sel{i - 1} AS MATERIALIZED ({sel})")
        parts.append(
            f"""pick{i} AS MATERIALIZED (
        SELECT c.vec_id, c.rel,
               0.5 * c.rel - 0.5 * MAX(p.sim) AS mmr, {i} AS rnk
        FROM cands c
        JOIN pairs p ON p.ia = c.vec_id
                    AND p.ib IN (SELECT vec_id FROM sel{i - 1})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        GROUP BY c.vec_id, c.rel
        ORDER BY mmr DESC, c.vec_id ASC LIMIT 1
    )"""
        )
    un = " UNION ALL ".join(f"SELECT * FROM pick{j}" for j in range(1, k + 1))
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT rnk::INT AS rnk, vec_id,
           ROUND(rel, 6) AS rel, ROUND(mmr, 6) AS mmr
    FROM ({un}) ORDER BY rnk"""
    )


@query("mmr_rerank", _mmr_oracle_sql())
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) —
    the diversity-aware selection every RAG context builder wants after
    the similarity cut (the reference returns raw top-k;
    HybridRetriever.js:115-219 fuses but never diversifies — MMR is the
    standard upgrade): greedily pick 5 of the top-20 cosine candidates,
    each round maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), λ = 1/2
    (exact binary fraction), ties vec_id-asc.

    Parity: every similarity (probe-candidate and candidate-candidate)
    is the same bit-exact cosine both engines already agree on
    (knn_cosine, r2), λ is exact, MAX is order-independent, and the
    greedy comparisons run on bit-identical doubles — so the oracle's 5
    unrolled MATERIALIZED rounds pick the same ids.

    Scale shape: the candidate cut is the knn TakeOrdered plan; the
    greedy runs on the BOUNDED top-n (20 rows, 380 pair sims computed
    in one broadcast self-join) — the documented driver-bounded
    contract (k·topn scalars), like the IVF probe sets.  At scale topn
    stays the knob; the corpus never touches the MMR stage."""
    from fusionspark.operators.knn import self_probes, vector_dim

    e = load_table(spark, sf_dir, "embeddings")
    probe = self_probes(e, 1)
    dim = vector_dim(e, "embedding")
    scored = e.crossJoin(F.broadcast(probe)).withColumn(
        "rel",
        V.cosine_similarity(
            F.col("embedding"), F.col("probe_embedding"), dim
        ),
    )
    cands = (
        scored.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(20)
        .select("vec_id", "rel", "embedding")
        .localCheckpoint(eager=True)
    )
    a = cands.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = cands.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "ia", "ib",
            V.cosine_similarity(F.col("ea"), F.col("eb"), dim).alias("sim"),
        )
    )
    cand_rows = cands.select("vec_id", "rel").collect()  # bounded: topn
    sim_rows = pairs.collect()                           # bounded: topn^2
    sims: dict[tuple, float] = {(r.ia, r.ib): r.sim for r in sim_rows}
    rel = {r.vec_id: r.rel for r in cand_rows}
    selected: list[tuple] = []
    chosen: list = []
    for rnk in range(1, 6):
        best = None
        for vid in sorted(rel):
            if vid in chosen:
                continue
            if chosen:
                penalty = max(sims[(vid, s)] for s in chosen)
                mmr = 0.5 * rel[vid] - 0.5 * penalty
            else:
                mmr = 0.5 * rel[vid]
            if best is None or mmr > best[1]:
                best = (vid, mmr)
        selected.append((rnk, best[0], float(rel[best[0]]), float(best[1])))
        chosen.append(best[0])
    out = spark.createDataFrame(
        selected, "rnk int, vec_id long, rel double, mmr double"
    )
    return out.select(
        "rnk", "vec_id",
        F.round("rel", 6).alias("rel"), F.round("mmr", 6).alias("mmr"),
    ).orderBy("rnk")
