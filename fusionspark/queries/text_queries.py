"""Text retrieval + fusion family (SURVEY §2.4 K1-K3, §2.5 F1-F7/W1,
§2.7 W3, §2.6 A6) over the driver's `documents` table.

Fixed test query: "fast table scan merge join" (all terms appear in the
synthetic vocabulary, so scores are non-trivial at every scale factor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.functions.text import STOPWORDS, search_terms, tokenize
from fusionspark.io import load_table
from fusionspark.operators import fusion
from fusionspark.operators.context import pack_context
from fusionspark.operators.keyword import (
    build_keyword_index,
    extract_terms,
    keyword_overlap_search,
    keyword_search,
    keyword_search_indexed,
    tf_score,
)
from fusionspark.operators.knn import self_probes
from fusionspark.functions import vector as V
from fusionspark.queries import query

QUERY = "fast table scan merge join"
_TERMS = extract_terms(QUERY)  # == all 5 (none are stopwords, all len>2)

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

# K2 TF-saturation score as a DuckDB expression over `text`.
# NB: the saturation constants are cast ::DOUBLE — DuckDB parses bare
# float literals as DECIMAL and does exact decimal arithmetic before the
# final cast, which drifts an ulp from Spark's float64 fold and can flip
# a rank tie (observed at sf0.001: docs tied in decimal, 1 ulp apart in
# float64).  With the casts both engines run the identical IEEE fold.
_TF_SQL = (
    "("
    + " + ".join(
        f"(len(regexp_extract_all(lower(text), '{t}')) * 2.2::DOUBLE"
        f" / (len(regexp_extract_all(lower(text), '{t}')) + 1.2::DOUBLE))"
        for t in _TERMS
    )
    + f") / {len(_TERMS)}"
)

# K3 overlap score as a DuckDB expression.
_OVERLAP_SQL = (
    "("
    + " + ".join(f"CASE WHEN contains(lower(text), '{t}') THEN 1 ELSE 0 END" for t in _TERMS)
    + f")::DOUBLE / {len(_TERMS)}"
)


@query(
    "tokenize_stats",
    f"""
    SELECT doc_id,
           len(list_filter(string_split(lower(text), ' '), t -> t <> ''))::INT AS n_tokens,
           len(list_filter(string_split(lower(text), ' '),
                           t -> len(t) > 2 AND NOT list_contains({_STOP_SQL}, t)))::INT AS n_terms
    FROM documents
    """,
)
def tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: tokenize + stopword + min-length filter
    (HybridRetriever.js:366-368,409-418)."""
    d = load_table(spark, sf_dir, "documents")
    from fusionspark.functions.text import tokenize

    return d.select(
        "doc_id",
        F.size(tokenize("text")).cast("int").alias("n_tokens"),
        F.size(search_terms("text")).cast("int").alias("n_terms"),
    )


@query(
    "keyword_search",
    f"""
    SELECT doc_id, ROUND(score, 6) AS score FROM (
        SELECT doc_id, {_TF_SQL} AS score FROM documents
    ) WHERE score > 0
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def keyword_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/F5: TF-saturation keyword ranking (HybridRetriever.js:365-399)."""
    d = load_table(spark, sf_dir, "documents")
    return keyword_search(d, QUERY, top_k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )


@query(
    "keyword_index_search",
    f"""
    SELECT doc_id, ROUND(score, 6) AS score FROM (
        SELECT doc_id, {_TF_SQL} AS score FROM documents
    ) WHERE score > 0
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def keyword_index_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 via the inverted-index posting lists (build + vocabulary match +
    broadcast semi-join + pivoted score) — same oracle as the scan form,
    so equality validates the index path end to end."""
    d = load_table(spark, sf_dir, "documents")
    idx = build_keyword_index(d)
    return keyword_search_indexed(idx, QUERY, top_k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )


@query(
    "keyword_overlap",
    f"""
    SELECT doc_id, ROUND(score, 6) AS score FROM (
        SELECT doc_id, {_OVERLAP_SQL} AS score FROM documents
    ) WHERE score > 0.3
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def keyword_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: keyword-overlap relevance, threshold 0.3 like the tree fallback
    (TreeIndex.js:685-696)."""
    d = load_table(spark, sf_dir, "documents")
    return keyword_overlap_search(d, QUERY, top_k=10, threshold=0.3).select(
        "doc_id", F.round("score", 6).alias("score")
    )


_RRF_SQL = f"""
    WITH kw AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, {_TF_SQL} AS score FROM documents)
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    vec AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding::DOUBLE[], p.embedding::DOUBLE[]) AS score,
               ROW_NUMBER() OVER (ORDER BY
                   list_cosine_similarity(e.embedding::DOUBLE[], p.embedding::DOUBLE[]) DESC,
                   e.vec_id ASC) AS rank
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    tre AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, {_OVERLAP_SQL} AS score FROM documents)
        WHERE score > 0.3
        ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    unioned AS (
        SELECT doc_id, rank, 0.2 AS w FROM kw
        UNION ALL
        SELECT doc_id, rank, 0.4 AS w FROM vec
        UNION ALL
        SELECT doc_id, rank, 0.4 AS w FROM tre
    )
    SELECT doc_id, ROUND(SUM(w / (60 + rank)), 6) AS fused_score,
           COUNT(*)::BIGINT AS n_strategies, MIN(rank)::INT AS best_rank
    FROM unioned GROUP BY doc_id
    ORDER BY SUM(w / (60 + rank)) DESC, doc_id ASC LIMIT 10
"""


@query("rrf_fusion", _RRF_SQL)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4/W1/E1: full hybrid pipeline — keyword (K2) + vector (V1 cosine,
    probe = vec_id 0, ids aligned doc_id=vec_id) + tree-fallback (K3)
    branches, each over-fetched 2×k (F2), weighted RRF w/(60+rank) (F4)
    (HybridRetriever.js:115-219,308-362)."""
    # r15 note: io.spread tried on the scorer branches and REVERTED
    # (in-suite regression: codegen'd regex scorers beat the exchange)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    probe = self_probes(e, 1)

    kw = keyword_search(d, QUERY, top_k=20)
    from fusionspark.operators.knn import vector_dim

    vec = (
        e.crossJoin(F.broadcast(probe))
        .withColumn("score", V.cosine_similarity(F.col("embedding"), F.col("probe_embedding"), vector_dim(e, "embedding")))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(20)
        .select(F.col("vec_id").alias("doc_id"), "score")
    )
    tre = keyword_overlap_search(d, QUERY, top_k=20, threshold=0.3)

    fused = fusion.rrf_fuse(
        {"keyword": kw, "vector": vec, "tree": tre},
        top_k=10,
        weights={"keyword": 0.2, "vector": 0.4, "tree": 0.4},
    )
    return fused.select(
        "doc_id",
        F.round("fused_score", 6).alias("fused_score"),
        "n_strategies",
        F.col("best_rank").cast("int").alias("best_rank"),
    )


@query(
    "context_pack",
    f"""
    WITH ranked AS (
        SELECT doc_id, text, score FROM (
            SELECT doc_id, text, {_TF_SQL} AS score FROM documents
        ) WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 10
    )
    SELECT doc_id, tokens, running_tokens FROM (
        SELECT doc_id, ceil(length(text) / 4.0)::BIGINT AS tokens,
               (SUM(ceil(length(text) / 4.0)::BIGINT) OVER (
                   ORDER BY score DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS running_tokens
        FROM ranked
    ) WHERE running_tokens <= 300
    """,
)
def context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: greedy token-budget packing over the keyword ranking
    (RAGPipeline.js:219-233)."""
    d = load_table(spark, sf_dir, "documents")
    # r14 whitelist burn-down: carry text through the top-k heap instead
    # of a second corpus scan + join-back — one scan, and the GlobalLimit
    # now bounds every path under pack_context's running-sum window
    ranked = keyword_search(d, QUERY, top_k=10, keep_cols=("text",))
    packed = pack_context(ranked, max_tokens=300)
    return packed.select("doc_id", "tokens", F.col("running_tokens").cast("long").alias("running_tokens"))


@query(
    "quality_estimate",
    f"""
    WITH ranked AS (
        SELECT doc_id, text, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, text, {_TF_SQL} AS score FROM documents)
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 10
    ),
    overlap AS (
        SELECT SUM({'(' + " + ".join(f"CASE WHEN contains(lower(text), '{t}') THEN 1 ELSE 0 END" for t in _TERMS) + ')'}) AS ov
        FROM ranked WHERE rank <= 3
    )
    SELECT ROUND(least(1.0, greatest(0.0,
           (SELECT score FROM ranked WHERE rank = 1) * 0.4
           + least(1.0, (SELECT ov FROM overlap)::DOUBLE / ({len(_TERMS)} * 2)) * 0.4
           + least((SELECT COUNT(*) FROM ranked) / 5.0, 1.0) * 0.2)), 6) AS quality
    """,
)
def quality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: result-quality heuristic 0.4·topScore + 0.4·overlapScore +
    0.2·min(n/5,1), clamped (RecursiveLearningEngine.js:779-790)."""
    d = load_table(spark, sf_dir, "documents")
    # r14 whitelist burn-down: keep text in the top-k heap (one corpus
    # scan, no join-back; bounds the rank window detector-visibly)
    ranked = keyword_search(d, QUERY, top_k=10, keep_cols=("text",))
    lowered = F.lower(F.col("text"))
    ov_expr = sum(
        (F.when(lowered.contains(t), 1).otherwise(0) for t in _TERMS), F.lit(0)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = ranked.withColumn("rank", F.row_number().over(w))
    agg = ranked.agg(
        F.max(F.when(F.col("rank") == 1, F.col("score"))).alias("top_score"),
        F.sum(F.when(F.col("rank") <= 3, ov_expr)).alias("ov"),
        F.count("*").alias("n"),
    )
    quality = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.col("top_score") * 0.4
                + F.least(F.lit(1.0), F.col("ov").cast("double") / (len(_TERMS) * 2)) * 0.4
                + F.least(F.col("n") / 5.0, F.lit(1.0)) * 0.2,
            ),
        ),
        6,
    )
    return agg.select(quality.alias("quality"))


def _bm25_oracle(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    tf_defs = ",\n               ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_defs = ",\n               ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * {k1 + 1.0}) / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, len(w)::DOUBLE AS dl,
               {tf_defs}
        FROM words
    ),
    stats AS (
        SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl,
               {df_defs}
        FROM per_doc
    ),
    scored AS (
        SELECT doc_id,
               ROUND({score}, 6) AS bm25,
               ({matched})::INT AS n_terms,
               dl::BIGINT AS dl
        FROM per_doc, stats
    )
    SELECT doc_id, bm25, n_terms, dl FROM scored
    WHERE n_terms > 0
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """


@query("bm25_search", _bm25_oracle(_TERMS))
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Okapi BM25 over the corpus (operators/keyword.py::bm25_search)
    — IDF + length normalization beyond the reference's TF-saturation
    scorer.  One scan + one 1-row stats broadcast + TakeOrdered top-k."""
    from fusionspark.operators.keyword import bm25_search

    d = load_table(spark, sf_dir, "documents")
    return bm25_search(d, QUERY, top_k=10)


@query(
    "fuzzy_match",
    f"""
    WITH vocab AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w FROM documents)
        GROUP BY w HAVING COUNT(*) >= 5
    ),
    probes AS (
        SELECT unnest(['tabel', 'mrege', 'scann', 'qurey']) AS probe
    ),
    scored AS (
        SELECT p.probe, v.w, v.freq,
               levenshtein(p.probe, v.w) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY p.probe
                   ORDER BY levenshtein(p.probe, v.w), v.freq DESC, v.w
               ) AS rn
        FROM probes p CROSS JOIN vocab v
    )
    SELECT probe, w AS suggestion, dist::INT AS dist, freq, rn::INT AS rn
    FROM scored WHERE rn <= 3
    """,
)
def fuzzy_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-correction / fuzzy lookup: misspelled probes matched against
    the corpus vocabulary by Levenshtein distance (JVM builtin — exact
    integer metric, identical in DuckDB), tie-broken by frequency then
    word.  The vocabulary aggregate is corpus-wide but tiny (freq ≥ 5);
    it BROADCASTS against the probe list — the fuzzy-join shape where the
    candidate side is the small one."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 5)
    )
    probes = docs.sparkSession.createDataFrame(
        [("tabel",), ("mrege",), ("scann",), ("qurey",)], "probe string"
    )
    scored = probes.crossJoin(F.broadcast(vocab)).select(
        "probe", "w", "freq",
        F.levenshtein("probe", "w").alias("dist"),
    )
    w = Window.partitionBy("probe").orderBy("dist", F.desc("freq"), "w")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe", F.col("w").alias("suggestion"), "dist", "freq", "rn")
    )


_SNIPPET_TERMS_SQL = "['fast', 'table', 'scan', 'merge', 'join']"


@query(
    "search_snippets",
    f"""
    WITH wd AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
        FROM documents WHERE doc_id < 50
    ),
    wins AS (
        SELECT doc_id, words, i.i AS start,
               len(list_filter(words[i.i:i.i+9],
                               t -> list_contains({_SNIPPET_TERMS_SQL}, t))) AS hits
        FROM wd
        CROSS JOIN (SELECT unnest(generate_series(1, 500)) AS i) i
        WHERE i.i <= greatest(len(words) - 9, 1)
    ),
    best AS (
        SELECT doc_id, start, hits, words,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, start) AS rn
        FROM wins
    )
    SELECT doc_id, start::INT AS start, hits::INT AS hits,
           array_to_string(words[start:start+9], ' ') AS snippet
    FROM best WHERE rn = 1
    """,
)
def search_snippets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-result snippet extraction: the 10-token window with the most
    query-term hits (ties → earliest), per document.  The Spark side is
    pure array expressions over each row (argmax via max-hits +
    min-qualifying-start — no explode, no shuffle); the oracle explodes
    every window and ranks them — the hash match proves the in-row argmax
    equals the exploded plan.  Run AFTER retrieval on the top-k only (here
    a fixed 50-doc slice): snippet cost scales with results, not corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    terms = F.array(*[F.lit(t) for t in ["fast", "table", "scan", "merge", "join"]])
    words = tokenize("text")
    starts = F.sequence(F.lit(1), F.greatest(F.size(words) - 9, F.lit(1)))
    hits_at = lambda i: F.size(  # noqa: E731
        F.filter(F.slice(words, i, 10), lambda t: F.array_contains(terms, t))
    )
    wins = F.transform(starts, lambda i: F.struct(i.alias("start"), hits_at(i).alias("hits")))
    max_hits = F.array_max(F.transform(wins, lambda w: w["hits"]))
    best_start = F.array_min(
        F.transform(F.filter(wins, lambda w: w["hits"] == max_hits), lambda w: w["start"])
    )
    return docs.select(
        "doc_id",
        best_start.cast("int").alias("start"),
        max_hits.cast("int").alias("hits"),
        F.concat_ws(" ", F.slice(words, best_start, 10)).alias("snippet"),
    )


@query(
    "source_topics",
    """
    WITH tf AS (
        SELECT source, w, COUNT(*)::DOUBLE AS tf
        FROM (SELECT source,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY source, w
    ),
    df AS (SELECT w, COUNT(*)::DOUBLE AS df FROM tf GROUP BY w),
    ns AS (SELECT COUNT(DISTINCT source)::DOUBLE AS n FROM documents),
    scored AS (
        SELECT t.source, t.w,
               ROUND(t.tf * ln((SELECT n FROM ns) / d.df), 6) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY t.source
                   ORDER BY ROUND(t.tf * ln((SELECT n FROM ns) / d.df), 6) DESC, t.w
               ) AS rn
        FROM tf t JOIN df d ON d.w = t.w
    )
    SELECT source, rn::INT AS rn, w AS term, score
    FROM scored WHERE rn <= 5
    """,
)
def source_topics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source (corpus analytics): TF·IDF where IDF
    counts SOURCES containing the term — the 'what is this domain about'
    report every corpus card includes.  Two hash aggs (source×word, then
    word) + a broadcast scalar; top-5 ranked on the ROUNDED score so the
    cut is float-order-stable."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tf = (
        docs.select("source", F.explode(tokenize("text")).alias("w"))
        .groupBy("source", "w").agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast("double").alias("df"))
    ns = docs.agg(F.countDistinct("source").cast("double").alias("n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(ns))
        .select(
            "source", "w",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "w")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", F.col("rn").cast("int").alias("rn"),
                F.col("w").alias("term"), "score")
    )


@query(
    "retrieval_ndcg",
    f"""
    WITH bm AS ({_bm25_oracle(_TERMS)}),
    ranked AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bm
    ),
    rel AS (
        SELECT doc_id,
               len(list_filter(['fast', 'table', 'scan', 'merge', 'join'],
                               t -> list_contains(w[1:20], t))) AS rel
        FROM (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
              FROM documents)
    ),
    dcg AS (
        SELECT SUM((pow(2.0, rel) - 1.0) / log2(rank + 1.0)) AS dcg
        FROM ranked r JOIN rel ON rel.doc_id = r.doc_id
    ),
    ideal AS (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
        FROM rel QUALIFY rank <= 10
    ),
    idcg AS (
        SELECT SUM((pow(2.0, rel) - 1.0) / log2(rank + 1.0)) AS idcg FROM ideal
    )
    SELECT ROUND(dcg.dcg, 6) AS dcg,
           ROUND(idcg.idcg, 6) AS idcg,
           ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg_at_10
    FROM dcg, idcg
    """,
)
def retrieval_ndcg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation: nDCG@10 of the BM25 ranking against a
    deterministic term-overlap relevance label (distinct query terms
    present, 0-5) — the eval-harness member of the retrieval family.  The
    IDCG pool is the FULL corpus (best achievable ranking), so the metric
    is honest, not self-normalized to the retrieved set.  Tie order
    cannot move either sum (tied docs share a rel value)."""
    from pyspark.sql.window import Window

    from fusionspark.operators.keyword import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _TERMS])
    words = tokenize("text")
    # positional relevance (terms among the FIRST 20 words): BM25 is
    # position-blind, so ranking and label genuinely diverge and the
    # metric attests the rank-weighted math, not a trivial 1.0
    head = F.slice(words, 1, 20)
    rel = docs.select(
        "doc_id",
        F.size(F.filter(terms, lambda t: F.array_contains(head, t))).alias("rel"),
    )
    bm = bm25_search(docs, QUERY, top_k=10)
    ranked = bm.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")).alias("rank"),
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0)
    dcg = ranked.join(rel, "doc_id").agg(F.sum(gain).alias("dcg"))
    # TakeOrdered the top-10 BEFORE the global window (the single-
    # partition sort only ever sees 10 rows — same rule as vocab_coverage)
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id").limit(10)
        .select(
            "rel",
            F.row_number().over(Window.orderBy(F.desc("rel"), "doc_id")).alias("rank"),
        )
    )
    idcg = ideal.agg(F.sum(gain).alias("idcg"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    )


@query(
    "tfidf_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id AS doc,
               unnest(list_filter(string_split(lower(text), ' '),
                      t -> len(t) > 2 AND NOT list_contains({_STOP_SQL}, t)))
                   AS term
        FROM documents
    ),
    tf AS (
        SELECT doc, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc, term
    ),
    dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    kept AS (
        SELECT term, floor(100000 / df)::BIGINT AS idf_w
        FROM dfreq
        WHERE df >= 2 AND df <= greatest(3, (SELECT n FROM nn) // 10)
    ),
    wp AS (
        SELECT t.doc, t.term, (t.tf * k.idf_w)::BIGINT AS w
        FROM tf t JOIN kept k USING (term)
    ),
    norms AS (SELECT doc, SUM(w * w)::BIGINT AS n2 FROM wp GROUP BY doc),
    dots AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.w * b.w)::BIGINT AS dot
        FROM wp a JOIN wp b ON b.term = a.term AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT doc_a, doc_b,
           ROUND(dot / sqrt(na.n2::DOUBLE * nb.n2), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc = doc_a
    JOIN norms nb ON nb.doc = doc_b
    WHERE dot / sqrt(na.n2::DOUBLE * nb.n2) >= 0.3::DOUBLE
    """,
)
def tfidf_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF·IDF cosine similarity join
    (operators/keyword.py::tfidf_pairs): inverted-index postings joined
    on term with a df window [2, N/10] bounding per-term fan-out, then
    one (doc_a, doc_b) dot-product agg.  Integer weights keep every
    aggregate exact; the only floats are the final sqrt + divide."""
    from fusionspark.operators.keyword import tfidf_pairs

    return tfidf_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "edit_distance_join",
    """
    WITH vocab AS (
        SELECT DISTINCT w FROM (
            SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part
            UNION ALL SELECT lower(p_brand) FROM part
            UNION ALL SELECT lower(c_name) FROM customer
        ) WHERE length(w) >= 4
    ),
    keys AS (
        SELECT w, unnest(list_transform(range(0, length(w) + 1),
                     i -> substr(w, 1, i) || substr(w, i + 2))) AS k
        FROM vocab
    ),
    cands AS (
        SELECT DISTINCT a.w AS w1, b.w AS w2
        FROM keys a JOIN keys b ON a.k = b.k AND a.w < b.w
    )
    SELECT w1, w2 FROM cands WHERE levenshtein(w1, w2) = 1
    """,
)
def edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 similarity SELF-join via SymSpell deletion
    neighborhoods (entity resolution over near-identical identifiers):
    each string emits itself plus every single-deletion variant as join
    keys — two strings share a key iff their distance is ≤ 1 possibly
    plus transposition-like false candidates, so a cheap exact
    levenshtein VERIFY runs on candidates only.  No cross join anywhere:
    at sf0.1 the brute-force form is 15k² ≈ 225M levenshtein calls; the
    blocked form verifies ~600k candidates (375×).  The deletion-key join
    hash-partitions on the variant string; length ≥ 4 keeps degenerate
    hot keys out.  Oracle replays the same blocked plan."""
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    vocab = (
        part.select(F.explode(F.split(F.lower("p_name"), " ")).alias("w"))
        .unionAll(part.select(F.lower("p_brand").alias("w")))
        .unionAll(cust.select(F.lower("c_name").alias("w")))
        .filter(F.length("w") >= 4)
        .distinct()
    )
    keys = vocab.select(
        "w",
        F.explode(
            F.expr(
                "transform(sequence(0, length(w)), "
                "i -> concat(substring(w, 1, i), substring(w, i+2, length(w))))"
            )
        ).alias("k"),
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cands = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.w") < F.col("b.w")))
        .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .distinct()
    )
    return cands.filter(F.levenshtein("w1", "w2") == 1)


@query(
    "retrieval_eval",
    f"""
    WITH bm AS ({_bm25_oracle(_TERMS)}),
    ranked AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bm QUALIFY rank <= 10
    ),
    rel AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   len(list_filter(['fast', 'table', 'scan', 'merge', 'join'],
                                   t -> list_contains(w[1:20], t))) AS rel
            FROM (SELECT doc_id,
                         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
                  FROM documents)
        ) WHERE rel >= 2
    ),
    hits AS (SELECT r.rank FROM ranked r JOIN rel USING (doc_id)),
    agg AS (
        SELECT (SELECT MIN(rank) FROM hits) AS first_rank,
               (SELECT COUNT(*)::BIGINT FROM hits) AS hits10,
               (SELECT COUNT(*)::BIGINT FROM rel) AS n_relevant
    )
    SELECT COALESCE(first_rank, 0)::BIGINT AS first_rel_rank,
           ROUND(CASE WHEN first_rank IS NULL THEN 0.0 ELSE 1.0 / first_rank END, 6)
               AS reciprocal_rank,
           hits10, n_relevant,
           ROUND(hits10::DOUBLE / n_relevant, 6) AS recall_at_10,
           ROUND(hits10 / 10.0, 6) AS precision_at_10
    FROM agg
    """,
)
def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation beside retrieval_ndcg: reciprocal rank of the
    first relevant hit, recall@10 against the FULL relevant pool (head-20
    binary relevance, rel ≥ 2 — position-blind BM25 genuinely diverges
    from it), and precision@10.  Counts are exact integers; each ratio
    divides once."""
    from pyspark.sql.window import Window

    from fusionspark.operators.keyword import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _TERMS])
    head = F.slice(tokenize("text"), 1, 20)
    rel = docs.select(
        "doc_id",
        F.size(F.filter(terms, lambda t: F.array_contains(head, t))).alias("rel"),
    ).filter(F.col("rel") >= 2).select("doc_id")
    ranked = bm25_search(docs, QUERY, top_k=10).select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")).alias("rank"),
    )
    hits = ranked.join(rel, "doc_id")
    agg = (
        hits.agg(
            F.min("rank").alias("first_rank"),
            F.count("*").cast("long").alias("hits10"),
        )
        .crossJoin(rel.agg(F.count("*").cast("long").alias("n_relevant")))
    )
    return agg.select(
        F.coalesce(F.col("first_rank"), F.lit(0)).cast("long").alias("first_rel_rank"),
        F.round(
            F.when(F.col("first_rank").isNull(), F.lit(0.0)).otherwise(
                F.lit(1.0) / F.col("first_rank")
            ),
            6,
        ).alias("reciprocal_rank"),
        "hits10",
        "n_relevant",
        F.round(F.col("hits10").cast("double") / F.col("n_relevant"), 6).alias(
            "recall_at_10"
        ),
        F.round(F.col("hits10") / F.lit(10.0), 6).alias("precision_at_10"),
    )


@query(
    "pmi_bigrams",
    """
    WITH toks AS MATERIALIZED (
        SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
        FROM documents
    ),
    uni AS MATERIALIZED (
        SELECT w, COUNT(*)::BIGINT AS cw
        FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w
    ),
    nn AS (SELECT SUM(len(ts))::BIGINT AS n FROM toks),
    pairs AS MATERIALIZED (
        SELECT ts[r.i] AS w1, ts[r.i + 1] AS w2
        FROM toks, unnest(range(1, len(ts))) AS r(i)
    ),
    bb AS (SELECT COUNT(*)::BIGINT AS b FROM pairs),
    pc AS (
        SELECT w1, w2, COUNT(*)::BIGINT AS cxy FROM pairs GROUP BY w1, w2
    )
    SELECT w1 || ' ' || w2 AS bigram, cxy AS n_pair,
           ROUND(ln(CAST(cxy AS DOUBLE)
                    * CAST((SELECT n FROM nn) AS DOUBLE)
                    * CAST((SELECT n FROM nn) AS DOUBLE)
                    / (CAST((SELECT b FROM bb) AS DOUBLE)
                       * CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE))),
                 6) AS pmi
    FROM pc JOIN uni u1 ON u1.w = pc.w1 JOIN uni u2 ON u2.w = pc.w2
    WHERE cxy >= 5 AND len(w1) > 2 AND len(w2) > 2
    ORDER BY pmi DESC, bigram ASC
    LIMIT 20
    """,
)
def pmi_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-20 adjacent bigrams by pointwise mutual
    information, PMI = ln(c_xy·N²/(B·c_x·c_y)) — the corpus-analysis
    screen for multi-word terms (and for template/boilerplate discovery:
    impossibly high PMI at high count = repeated spans).  All counts are
    exact BIGINTs; one ln at display, ordering on the rounded value with
    a bigram tiebreak.  Scale: bigrams never materialize per doc beyond
    the explode — two groupBy shuffles on (w1,w2)/w digests, the unigram
    vocab broadcasts into the PMI join."""
    d = load_table(spark, sf_dir, "documents")
    from fusionspark.functions.text import tokenize

    t = d.select(tokenize("text").alias("ts"))
    pairs = (
        t.select(
            F.explode(
                F.expr(
                    "filter(zip_with(ts, slice(ts, 2, size(ts)), "
                    "(a, b) -> struct(a AS w1, b AS w2)), p -> p.w2 IS NOT NULL)"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    uni = t.select(F.explode("ts").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("cw")
    )
    nn = t.agg(F.sum(F.size("ts")).cast("long").alias("n"))
    bb = pairs.agg(F.count("*").cast("long").alias("b"))
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cxy"))
        .filter((F.col("cxy") >= 5) & (F.length("w1") > 2) & (F.length("w2") > 2))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    joined = (
        pc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(bb))
    )
    pmi = F.round(
        F.log(
            F.col("cxy").cast("double")
            * F.col("n").cast("double")
            * F.col("n").cast("double")
            / (
                F.col("b").cast("double")
                * F.col("cw1").cast("double")
                * F.col("cw2").cast("double")
            )
        ),
        6,
    )
    return (
        joined.select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("cxy").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(20)
    )


# ── word-frequency law fits (corpus-distribution diagnostics) ─────────────
#
# Shared determinism contract with operators/spectral.py: every float sum
# is a left-to-right fold over an explicitly ordered list on BOTH engines
# (F.aggregate over a rank-ordered array here, list_reduce(list(... ORDER
# BY ...)) in DuckDB), so the OLS inputs are bit-identical and the final
# round(…, 6) cannot flake.  Counts stay BIGINT until the single ln().

_ZIPF_RANKS = 200


def _ols_cols(pts: F.Column) -> dict[str, F.Column]:
    """Five ordered folds over an array<struct<x,y>> (already in fit
    order) + the point count — the shared OLS accumulator set."""
    fold = lambda term: F.aggregate(pts, F.lit(0.0), term)  # noqa: E731
    return {
        "np": F.size(pts).cast("double"),
        "sx": fold(lambda a, s: a + s["x"]),
        "sy": fold(lambda a, s: a + s["y"]),
        "sxy": fold(lambda a, s: a + s["x"] * s["y"]),
        "sxx": fold(lambda a, s: a + s["x"] * s["x"]),
        "syy": fold(lambda a, s: a + s["y"] * s["y"]),
    }


def _ols_select(c: dict[str, F.Column]) -> list[F.Column]:
    """slope / intercept / r2 from the accumulator set — one expression
    tree, mirrored verbatim in the SQL oracles (zero-denominator → 0.0,
    the effective_rank convention: degenerate fits alarm as numbers)."""
    dx = c["np"] * c["sxx"] - c["sx"] * c["sx"]
    dy = c["np"] * c["syy"] - c["sy"] * c["sy"]
    num = c["np"] * c["sxy"] - c["sx"] * c["sy"]
    slope = F.when(dx != 0.0, num / dx).otherwise(F.lit(0.0))
    return [
        c["np"].cast("long").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(c["np"] != 0.0, (c["sy"] - slope * c["sx"]) / c["np"]).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when((dx != 0.0) & (dy != 0.0), num * num / (dx * dy)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("r2"),
    ]


# the mirrored SQL fragments: same fold order, same guard shape
_SQL_OLS_S = """
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS np,
                 list_reduce(list(x ORDER BY k), (a, b) -> a + b) AS sx,
                 list_reduce(list(y ORDER BY k), (a, b) -> a + b) AS sy,
                 list_reduce(list(x * y ORDER BY k), (a, b) -> a + b) AS sxy,
                 list_reduce(list(x * x ORDER BY k), (a, b) -> a + b) AS sxx,
                 list_reduce(list(y * y ORDER BY k), (a, b) -> a + b) AS syy
          FROM pts),
    fit AS (SELECT np, sx, sy, sxy, sxx, syy,
                   np * sxx - sx * sx AS dx,
                   np * syy - sy * sy AS dy,
                   np * sxy - sx * sy AS num
            FROM s),
    ols AS (SELECT np::BIGINT AS n_points,
                   ROUND(CASE WHEN dx <> 0 THEN num / dx ELSE 0.0 END, 6) AS slope,
                   ROUND(CASE WHEN np <> 0
                              THEN (sy - (CASE WHEN dx <> 0 THEN num / dx
                                               ELSE 0.0 END) * sx) / np
                              ELSE 0.0 END, 6) AS intercept,
                   ROUND(CASE WHEN dx <> 0 AND dy <> 0
                              THEN num * num / (dx * dy) ELSE 0.0 END, 6) AS r2
            FROM fit)
"""


@query(
    "zipf_fit",
    f"""
    WITH toks AS MATERIALIZED (
        SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
        FROM documents
    ),
    cnt AS MATERIALIZED (
        SELECT w, COUNT(*)::BIGINT AS c
        FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w
    ),
    tot AS (SELECT COUNT(*)::BIGINT AS n_types, SUM(c)::BIGINT AS n_tokens
            FROM cnt),
    top AS MATERIALIZED (
        SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS r
        FROM cnt ORDER BY c DESC, w ASC LIMIT {_ZIPF_RANKS}
    ),
    pts AS (SELECT r AS k, ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM top),
    {_SQL_OLS_S}
    SELECT (SELECT n_types FROM tot) AS n_types,
           (SELECT n_tokens FROM tot) AS n_tokens,
           n_points, slope, intercept, r2
    FROM ols
    """,
)
def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the word-frequency distribution: OLS of
    ln(count) on ln(rank) for the top-200 words — slope ≈ −1 on natural
    text; a flat slope (templated/synthetic corpora) or a broken one
    (boilerplate head) is a corpus-generation red flag, and r² says how
    law-like the distribution is at all.  Counts are exact BIGINTs; the
    rank cut is a deterministic TakeOrdered (count DESC, word ASC); the
    five OLS sums fold rank-ascending on both engines.

    Scale shape: one groupBy(word) shuffle of word digests; the top-200
    cut is a driver-side TakeOrdered over per-partition heads; everything
    after is math on ≤200 values in one row."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(tokenize("text").alias("ts"))
    cnt = (
        t.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = cnt.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    top = cnt.orderBy(F.col("c").desc(), F.col("w").asc()).limit(_ZIPF_RANKS)
    # array_sort on (−count, word) replays the rank order inside one row
    arr = top.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("c")).alias("nc"), F.col("w").alias("w"),
                             F.col("c").alias("c"))
                )
            ),
            lambda s, i: F.struct(
                F.log((i + F.lit(1)).cast("double")).alias("x"),
                F.log(s["c"].cast("double")).alias("y"),
            ),
        ).alias("pts")
    )
    c = _ols_cols(F.col("pts"))
    return (
        arr.crossJoin(F.broadcast(tot))
        .select("n_types", "n_tokens", *_ols_select(c))
    )


_HEAPS_BUCKETS = 64


@query(
    "heaps_law",
    f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
        FROM documents
    ),
    nd AS (SELECT COUNT(*)::BIGINT AS nd FROM d),
    b AS MATERIALIZED (
        SELECT (doc_id * {_HEAPS_BUCKETS}) // (SELECT nd FROM nd) AS b, ts
        FROM d
    ),
    tok AS (SELECT b, SUM(len(ts))::BIGINT AS tok FROM b GROUP BY b),
    fst AS (SELECT w, MIN(b)::BIGINT AS fb
            FROM (SELECT b.b, unnest(ts) AS w FROM b) GROUP BY w),
    newt AS (SELECT fb AS b, COUNT(*)::BIGINT AS newt FROM fst GROUP BY fb),
    curve AS (SELECT t.b, t.tok, COALESCE(n.newt, 0)::BIGINT AS newt
              FROM tok t LEFT JOIN newt n ON n.b = t.b),
    cum AS (SELECT b,
                   SUM(tok) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS ct,
                   SUM(newt) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cv
            FROM curve),
    pts AS (SELECT b AS k, ln(ct::DOUBLE) AS x, ln(cv::DOUBLE) AS y
            FROM cum WHERE ct > 0 AND cv > 0),
    {_SQL_OLS_S}
    SELECT n_points, slope AS beta, intercept AS ln_k, r2 FROM ols
    """,
)
def heaps_law_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit — vocabulary growth V(N) ≈ K·N^β: OLS of
    ln(cumulative distinct types) on ln(cumulative tokens), sampled at 64
    doc-order checkpoints.  β ≈ 0.4–0.6 on natural text; β → 0 means the
    vocabulary has saturated (templated corpus / exhausted dedup), β ≈ 1
    means near-every-doc novelty (noise, OCR breakage) — the
    vocabulary-side twin of ngram_novelty.

    Scale shape: the curve is CHECKPOINTED, not per-doc — each word's
    first occurrence is a groupBy(word) min(bucket) (digest-sized
    shuffle), per-bucket token counts a second small groupBy, and the
    cumulative/fit stage runs on 64 rows.  No corpus-length window, no
    per-doc prefix sum — the 100 TB version shuffles words once."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("ts")
    )
    nd = d.agg(F.count("*").cast("long").alias("nd"))
    b = d.crossJoin(F.broadcast(nd)).select(
        F.expr(f"doc_id * {_HEAPS_BUCKETS} div nd").alias("b"), "ts"
    )
    tok = b.groupBy("b").agg(F.sum(F.size("ts")).cast("long").alias("tok"))
    fst = (
        b.select("b", F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.min("b").alias("fb"))
    )
    newt = fst.groupBy("fb").agg(F.count("*").cast("long").alias("newt"))
    curve = tok.join(
        newt.select(F.col("fb").alias("b"), "newt"), "b", "left"
    ).select("b", "tok", F.coalesce("newt", F.lit(0)).cast("long").alias("newt"))
    from pyspark.sql import Window

    w64 = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = curve.select(
        "b",
        F.sum("tok").over(w64).cast("long").alias("ct"),
        F.sum("newt").over(w64).cast("long").alias("cv"),
    )
    pts_arr = (
        cum.filter((F.col("ct") > 0) & (F.col("cv") > 0))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("b").alias("k"), "ct", "cv"))
                ),
                lambda s: F.struct(
                    F.log(s["ct"].cast("double")).alias("x"),
                    F.log(s["cv"].cast("double")).alias("y"),
                ),
            ).alias("pts")
        )
    )
    c = _ols_cols(F.col("pts"))
    sel = _ols_select(c)
    return pts_arr.select(
        sel[0], sel[1].alias("beta"), sel[2].alias("ln_k"), sel[3]
    )


@query(
    "doc_keywords",
    """
    WITH toks AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
        FROM documents
    ),
    tf AS MATERIALIZED (
        SELECT doc_id, w, COUNT(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(ts) AS w FROM toks) GROUP BY doc_id, w
    ),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM toks),
    dfreq AS (SELECT w, COUNT(*)::BIGINT AS df FROM tf GROUP BY w),
    scored AS (
        SELECT t.doc_id, t.w,
               ROUND(CAST(t.tf AS DOUBLE)
                     * ln(CAST((SELECT n FROM nn) AS DOUBLE)
                          / CAST(d.df AS DOUBLE)), 6) AS score
        FROM tf t JOIN dfreq d ON d.w = t.w
    ),
    ranked AS (
        SELECT doc_id, w, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, w ASC) AS rk
        FROM scored
    )
    SELECT doc_id, w AS term, score, rk FROM ranked WHERE rk <= 3
    """,
)
def doc_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf
    (idf = ln(N/df)) — the RAG-metadata / faceted-browse primitive.
    Counts are exact BIGINTs, one ln per vocab word, ranking on the
    ROUNDED score with a term tiebreak so the cut is float-order-stable
    across engines (the embedding_outliers z-membership rule).

    Scale shape: one groupBy(doc, term) shuffle of digests; the vocab
    document-frequency table is tiny and broadcasts into the scoring
    join; the top-3 window partitions BY DOCUMENT (no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokenize("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    nn = d.agg(F.count("*").cast("long").alias("n"))
    dfreq = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("w").asc())
    return (
        scored.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "score", F.col("rk").cast("long").alias("rk"))
    )


@query(
    "phrase_search",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    hits AS (
        SELECT doc_id,
               list_filter(range(1, len(ts)),
                           i -> ts[i] = 'query' AND ts[i+1] = 'value') AS ps
        FROM toks
    )
    SELECT doc_id, len(ps)::BIGINT AS n_hits, (ps[1] - 1)::INT AS first_pos
    FROM hits WHERE len(ps) > 0
    """,
)
def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query "query value" over the positional inverted index
    (operators/keyword.py::phrase_search): postings pruned to the phrase's
    terms at the scan, then one hash EQUI-join per extra term on
    (doc_id, pos − offset).  The oracle replays adjacency positionally
    with a DuckDB list lambda, so hit counts AND first positions attest
    the index path bit-for-bit.  Beyond-reference: the reference's
    retriever is bag-of-terms only (HybridRetriever.js:365-399)."""
    from fusionspark.operators.keyword import phrase_search

    d = load_table(spark, sf_dir, "documents")
    return phrase_search(d, "query value")


@query(
    "concordance",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    hits AS (
        SELECT doc_id, ts,
               unnest(list_filter(range(1, len(ts) + 1),
                                  j -> ts[j] = 'merge')) AS j
        FROM toks
    )
    SELECT doc_id, (j - 1)::INT AS pos,
           array_to_string(ts[greatest(1, j - 2):least(len(ts), j + 2)], ' ') AS ctx
    FROM hits
    """,
)
def concordance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC concordance for the term 'merge': every occurrence with its
    ±2-token context window — the corpus-linguistics readout over the
    same raw-split positions phrase_search indexes.  Expression-only
    (one scan, the explode is per-match, never per-token); the context
    strings themselves are hash-attested."""
    d = load_table(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    js = F.filter(
        F.sequence(F.lit(1), F.size(ts)), lambda j: F.element_at(ts, j) == "merge"
    )
    lo = F.greatest(F.lit(1), F.col("j") - 2)
    hi = F.least(F.size("ts"), F.col("j") + 2)
    return (
        d.select("doc_id", ts.alias("ts"), F.explode(js).alias("j"))
        .select(
            "doc_id",
            (F.col("j") - 1).cast("int").alias("pos"),
            F.concat_ws(" ", F.slice("ts", lo, hi - lo + 1)).alias("ctx"),
        )
    )


@query(
    "token_fertility",
    """
    WITH t AS (
        SELECT lang,
               len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   ::BIGINT AS ws_tokens,
               len(regexp_extract_all(
                   text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT
                   AS bpe_tokens,
               strlen(text)::BIGINT AS n_bytes,
               length(text)::BIGINT AS n_chars
        FROM documents
    )
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           SUM(ws_tokens)::BIGINT AS ws_tokens,
           SUM(bpe_tokens)::BIGINT AS bpe_tokens,
           ROUND(SUM(n_bytes)::DOUBLE / SUM(bpe_tokens), 6)
               AS bytes_per_token,
           ROUND(SUM(n_chars)::DOUBLE / SUM(bpe_tokens), 6)
               AS chars_per_token,
           ROUND(SUM(bpe_tokens)::DOUBLE / SUM(ws_tokens), 6) AS fertility
    FROM t GROUP BY lang
    """,
)
def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility and compression readout — the
    budget table a multilingual training run starts from: bytes/token
    and chars/token say how much raw corpus a token budget buys per
    language; fertility (subword tokens per whitespace word) is the
    classic tokenizer-equity metric (high-fertility languages pay more
    tokens for the same text).  Uses the same whitespace + BPE-ish
    regex tokenizers as token_counts; all sums exact BIGINTs, the three
    ratios are final closed-form doubles.

    Scale shape: pure per-document column expressions into one
    groupBy(lang) with map-side combine — |langs| output rows, one
    corpus scan, zero joins."""
    from fusionspark.operators import textstats

    d = load_table(spark, sf_dir, "documents")
    ws, bpe = textstats.token_counts("text")
    t = d.select(
        "lang",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("bpe_tokens"), 6
        ).alias("bytes_per_token"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("bpe_tokens"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("bpe_tokens").cast("double") / F.sum("ws_tokens"), 6
        ).alias("fertility"),
    )


@query(
    "ngram_diversity",
    f"""
    WITH w AS (SELECT doc_id, source, {{_WORDS_SQL}} AS words FROM documents),
    grams AS (
        SELECT source,
               array_to_string(words[i:i+2], ' ') AS g
        FROM w, unnest(generate_series(1, greatest(len(words) - 2, 1))) t(i)
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_grams,
           COUNT(DISTINCT g)::BIGINT AS n_distinct,
           ROUND(COUNT(DISTINCT g)::DOUBLE / COUNT(*), 6) AS distinct_ratio
    FROM grams GROUP BY source
    """.replace("{_WORDS_SQL}", "list_filter(string_split(lower(text), ' '), x -> x <> '')"),
)
def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-3-gram ratio (the distinct-n diversity metric
    used to audit generated/synthetic corpora for mode collapse —
    self-BLEU's cheap dual): low ratio = repetitive boilerplate source,
    exactly the slice a mixing pass should down-weight.  ngram_novelty
    is the per-doc first-seen complement; this is the per-SOURCE
    aggregate a datacard reports.

    Scale shape: one Arrow shingle pass (the dedup emitter kernel, here
    WITHOUT the per-doc distinct — diversity counts every occurrence) →
    one groupBy(source) with a distinct-count — shuffles carry
    (source, gram)-sized rows, never whole documents."""
    from pyspark.sql.types import StringType, StructField, StructType

    from fusionspark.operators.dedup import _py_shingles

    d = load_table(spark, sf_dir, "documents")
    schema = StructType(
        [d.schema["source"], StructField("s", StringType())]
    )

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            srcs, out = [], []
            for src, text in zip(pdf["source"], pdf["text"]):
                for s in _py_shingles(text, 3):
                    srcs.append(src)
                    out.append(s)
            yield pd.DataFrame({"source": srcs, "s": out})

    sh = d.select("source", "text").mapInPandas(emit, schema=schema)
    return sh.groupBy("source").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.count_distinct("s").cast("long").alias("n_distinct"),
        F.round(
            F.count_distinct("s").cast("double") / F.count("*"), 6
        ).alias("distinct_ratio"),
    )


@query(
    "rake_keywords",
    f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '')
                   AS words
        FROM documents
    ),
    toks AS (
        SELECT doc_id, i.i AS pos, words[i.i] AS w,
               (len(words[i.i]) <= 2
                OR list_contains({_STOP_SQL}, words[i.i])) AS is_stop
        FROM w, unnest(generate_series(1, len(words))) i(i)
    ),
    runs AS (
        -- the stop-count window must see EVERY token so run ids stay
        -- aligned; content rows are filtered in the next step
        SELECT doc_id, pos, w, is_stop,
               SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS run
        FROM toks
    ),
    members AS (
        SELECT doc_id, pos, w, run,
               COUNT(*) OVER (PARTITION BY doc_id, run)::BIGINT AS plen
        FROM runs WHERE NOT is_stop
    ),
    bounded AS (SELECT * FROM members WHERE plen <= 4),
    wstats AS (
        SELECT w, SUM(plen)::BIGINT AS deg, COUNT(*)::BIGINT AS freq
        FROM bounded GROUP BY w
    ),
    scored AS (
        SELECT b.doc_id, b.run,
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list(s.deg::DOUBLE / s.freq ORDER BY b.pos)),
                   (a, x) -> a + x) AS score,
               string_agg(b.w, ' ' ORDER BY b.pos) AS phrase
        FROM bounded b JOIN wstats s ON b.w = s.w
        GROUP BY b.doc_id, b.run
    )
    SELECT phrase, COUNT(*)::BIGINT AS n_occurrences,
           ROUND(MIN(score), 6) AS score
    FROM scored GROUP BY phrase
    ORDER BY MIN(score) DESC, phrase ASC LIMIT 20
    """,
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the phrase-level
    sibling of doc_keywords' single-word tf-idf: candidate phrases are
    maximal runs of content words (split at stopwords / short tokens,
    capped at 4 words), each word scores deg(w)/freq(w) over phrase
    co-membership, a phrase scores the sum of its member words, and the
    corpus reports its top-20 phrases.  Parity: deg/freq are exact
    BIGINTs, the per-word ratio is one double, and the phrase sum folds
    in POSITION order on both engines.

    Scale shape: one token explode → one (doc-partitioned) run window →
    one groupBy(word) for the stats table (vocab-sized, plain join AQE
    can broadcast) → one (doc, run) fold → a phrase groupBy +
    TakeOrdered(20).  Shuffles carry tokens and phrase strings, never
    documents."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos0", "w")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "w",
        (
            (F.length("w") <= 2)
            | F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), F.col("w"))
        ).alias("is_stop"),
    )
    wrun = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    runs = toks.withColumn(
        "run", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wrun)
    ).filter(~F.col("is_stop"))
    members = runs.withColumn(
        "plen",
        F.count("*").over(Window.partitionBy("doc_id", "run")).cast("long"),
    ).filter(F.col("plen") <= 4)
    wstats = members.groupBy("w").agg(
        F.sum("plen").cast("long").alias("deg"),
        F.count("*").cast("long").alias("freq"),
    )
    scored = (
        members.join(wstats, "w")
        .withColumn("wscore", F.col("deg").cast("double") / F.col("freq"))
        .groupBy("doc_id", "run")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "wscore"))),
                F.lit(0.0),
                lambda a, x: a + x["wscore"],
            ).alias("score"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("score").alias("raw"),
        )
        .orderBy(F.col("raw").desc(), F.col("phrase").asc())
        .limit(20)
        .select("phrase", "n_occurrences", F.round("raw", 6).alias("score"))
    )


@query(
    "vocab_gini",
    """
    WITH toks AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
              FROM documents)
    ),
    freqs AS (
        SELECT source, w, COUNT(*)::BIGINT AS f
        FROM toks GROUP BY source, w
    ),
    ranked AS (
        SELECT source, f,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY f, w)
                   ::BIGINT AS i,
               COUNT(*) OVER (PARTITION BY source)::BIGINT AS n,
               SUM(f) OVER (PARTITION BY source)::BIGINT AS tot
        FROM freqs
    )
    SELECT source, MAX(n)::BIGINT AS n_types, MAX(tot)::BIGINT AS n_tokens,
           ROUND(SUM((2 * i - n - 1) * f)::DOUBLE / (MAX(n) * MAX(tot)), 6)
               AS gini
    FROM ranked GROUP BY source
    """,
)
def vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary concentration as a Gini coefficient over
    word frequencies (the datacard's inequality readout beside zipf_fit's
    law fit and ngram_diversity's distinct ratio: gini → 1 means a few
    boilerplate tokens dominate the source).  The revenue_gini exact
    form: rank frequencies ascending with a deterministic (f, w) order,
    fold Σ(2i − n − 1)·f in BIGINT, and divide once — no float ever
    enters the aggregation.

    Scale shape: one token explode → one (source, word) groupBy →
    per-source rank windows over the VOCABULARY frame (bounded by
    distinct words, not corpus tokens) → one groupBy(source)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokenize("text")).alias("w"))
    freqs = toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("f"))
    wsrc = Window.partitionBy("source")
    ranked = freqs.select(
        "source",
        "f",
        F.row_number()
        .over(wsrc.orderBy(F.col("f").asc(), F.col("w").asc()))
        .cast("long")
        .alias("i"),
        F.count("*").over(wsrc).cast("long").alias("n"),
        F.sum("f").over(wsrc).cast("long").alias("tot"),
    )
    return ranked.groupBy("source").agg(
        F.max("n").cast("long").alias("n_types"),
        F.max("tot").cast("long").alias("n_tokens"),
        F.round(
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("f")).cast("double")
            / (F.max("n") * F.max("tot")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Round 11: pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

_PRF_FB = 10     # feedback depth: top-10 BM25 docs
_PRF_TOP = 10    # expansion terms returned
_PRF_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)


@query(
    "prf_expansion",
    f"""
    WITH fb AS (SELECT doc_id FROM ({_bm25_oracle(_TERMS)})),
    words AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        FROM documents
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
    dfs AS (
        SELECT t, COUNT(DISTINCT doc_id)::BIGINT AS df
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS t FROM words)
        GROUP BY t
    ),
    rt AS (
        SELECT t, COUNT(DISTINCT f.doc_id)::BIGINT AS r
        FROM fb f JOIN words w ON f.doc_id = w.doc_id,
             unnest(list_distinct(w.w)) AS u(t)
        GROUP BY t
    ),
    cand AS (
        SELECT rt.t, rt.r, dfs.df, n.n_docs
        FROM rt JOIN dfs USING (t), n
        WHERE dfs.df >= 2 AND length(rt.t) >= 3
          AND rt.t NOT IN ({_PRF_TERMS_SQL})
    )
    SELECT t AS term, r AS r_docs, df AS df_docs,
           ROUND(r * ln((n_docs - df + 0.5) / (df + 0.5)), 6) + 0.0 AS rsv
    FROM cand
    ORDER BY ROUND(r * ln((n_docs - df + 0.5) / (df + 0.5)), 6) DESC, t
    LIMIT {_PRF_TOP}
    """,
)
def prf_expansion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RSJ family):
    run the fixed query through BM25, take the top-10 feedback docs, and
    rank their vocabulary by the relevance-weighted selection value
    r_t · ln((N − df_t + ½)/(df_t + ½)) — feedback-frequency times
    rarity, the Robertson offer-weight shape — returning the 10 terms a
    second retrieval round would add.  Query terms, sub-3-char tokens,
    and terms in >10% of the corpus (the tfidf_pairs df cap) are
    excluded; common terms need no hard df cap — their RSV goes
    NEGATIVE once df > N/2, so rarity ordering suppresses them by
    construction (this corpus's synthetic vocabulary is ~31 words with
    median df at 78% of docs, so a TF-IDF-style df ≤ N/10 cap would
    return nothing).  The emitted rsv carries `+ 0.0` in both engines:
    negative scores can round to a signed zero (the weighted_sample r10
    lesson, applied as standing discipline).

    Parity: r_t/df_t/N are exact integers; the score is ONE ln of an
    exactly-derived argument times an integer, cut on (round(rsv, 6)
    DESC, term ASC) — the rounded-key top-k discipline.  Scale: the df
    aggregate is the corpus-wide word shuffle every keyword query
    already pays; the feedback side is 10 docs broadcast; candidates
    join keyed on the term."""
    from fusionspark.operators.keyword import bm25_search

    d = load_table(spark, sf_dir, "documents")
    fb = bm25_search(d, QUERY, top_k=_PRF_FB).select("doc_id")
    words = d.select("doc_id", tokenize(F.col("text")).alias("ws"))
    n = d.agg(F.count("*").cast("long").alias("n_docs"))
    docterms = words.select(
        "doc_id", F.explode(F.array_distinct("ws")).alias("t")
    )
    dfs = docterms.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    rt = (
        docterms.join(F.broadcast(fb), "doc_id", "left_semi")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("r"))
    )
    cand = (
        rt.join(dfs, "t")
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= 2)
            & (F.length("t") >= 3)
            & (~F.col("t").isin(list(_TERMS)))
        )
    )
    rsv = F.round(
        F.col("r")
        * F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        6,
    ) + F.lit(0.0)
    return (
        cand.select(
            F.col("t").alias("term"),
            F.col("r").alias("r_docs"),
            F.col("df").alias("df_docs"),
            rsv.alias("rsv"),
        )
        .orderBy(F.desc("rsv"), "term")
        .limit(_PRF_TOP)
    )


# TextRank fixed-point arithmetic: ranks live in integer mass units
# (total mass ~1e12) and every update is floor division, so the whole
# iteration is EXACT BIGINT arithmetic — no float ever enters, the
# strict-bitwise gate holds by construction (unlike a double PageRank,
# whose per-group summation order differs between engines).
_TR_SCALE = 10**12
_TR_ITERS = 5


def _textrank_oracle() -> str:
    head = f"""
    WITH toks AS (
        SELECT doc_id, i AS pos, lower(ws[i]) AS w
        FROM (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x <> '')
                         AS ws
              FROM documents),
             unnest(generate_series(1, len(ws))) AS t(i)
    ),
    content AS (
        SELECT doc_id, w,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS cpos
        FROM toks
        WHERE len(w) > 2 AND NOT list_contains({{stop}}, w)
    ),
    raw AS (
        SELECT a.w AS u, b.w AS v
        FROM content a JOIN content b
          ON b.doc_id = a.doc_id AND b.cpos = a.cpos + 1
        WHERE a.w <> b.w
    ),
    edges AS (
        SELECT u, v, COUNT(*)::BIGINT AS wt FROM (
            SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw
        ) GROUP BY u, v
    ),
    deg AS (SELECT u, SUM(wt)::BIGINT AS wu FROM edges GROUP BY u),
    nodes AS (SELECT DISTINCT u AS w FROM edges),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
    r0 AS (SELECT w, ({_TR_SCALE} // (SELECT n FROM nn))::BIGINT AS r
           FROM nodes)"""
    body = ""
    for i in range(1, _TR_ITERS + 1):
        body += f""",
    r{i} AS (
        SELECT nodes.w AS w,
               ((150 * ({_TR_SCALE} // (SELECT n FROM nn))) // 1000
                + (850 * COALESCE(SUM((e.wt * p.r) // deg.wu), 0)) // 1000
               )::BIGINT AS r
        FROM nodes
        LEFT JOIN edges e ON e.v = nodes.w
        LEFT JOIN r{i - 1} p ON p.w = e.u
        LEFT JOIN deg ON deg.u = e.u
        GROUP BY nodes.w
    )"""
    tail = f"""
    SELECT w AS word, r AS rank_fp
    FROM r{_TR_ITERS}
    ORDER BY r DESC, w ASC LIMIT 25
    """
    return (head + body + tail).replace("{stop}", _STOP_SQL)


@query("textrank_keywords", _textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — weighted
    PageRank over the word co-occurrence graph: content words (len > 2,
    non-stopword — the K1 token contract, HybridRetriever.js:366-368) are
    nodes, consecutive content words in a document are undirected edges
    weighted by corpus co-occurrence count, and 5 damped iterations
    (d = 0.85) rank the corpus-level keywords.  Completes the keyword
    family: doc_keywords is tf-idf (frequency), rake_keywords is
    phrase-level degree/freq, TextRank is global graph centrality.

    Parity: the entire iteration is FIXED-POINT INTEGER arithmetic —
    ranks are mass units summing to ~1e12, each contribution is
    floor((wt * r) / W_u) and the damping mix is floor-scaled by
    850/1000 — so every iterate is an exact BIGINT on both engines
    (truncating `div` == floor for positives) and the top-25 cut sorts
    exact integers with a word tiebreak.  A double-typed PageRank would
    hash-flake on per-group summation order; the fixed-point form cannot.

    Scale: one token explode + per-doc window builds edges (shuffle keys
    are words, never text); each iteration is edges JOIN ranks — a
    vocab-sized hash join with map-side combine on the contribution sum;
    5 iterations = 5 bounded shuffles.  At 100 TB the graph is
    vocab-bounded (millions of nodes), not corpus-bounded."""
    from pyspark.sql import Window

    from fusionspark.io import spread

    d = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "w")
    ).filter((F.length("w") > 2) & ~F.array_contains(stop, F.col("w")))
    content = toks.select(
        "doc_id", "w",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("cpos"),
    )
    # r15 plan cleanup, values identical:
    # * consecutive pairs via lead() over the SAME (doc_id, pos) window
    #   the cpos numbering already established — the old (doc_id, cpos)
    #   equi-self-join re-shuffled both sides on a composite key;
    # * both edge orientations via one struct explode (the unionAll
    #   duplicated the whole pair subtree);
    # * edges eagerly checkpointed: deg, nodes and all 5 rank iterations
    #   re-derived it per reference — the table is vocab-bounded (the
    #   module's 100 TB contract), so one materialization is scale-safe.
    raw = (
        content.withColumn(
            "v",
            F.lead("w").over(Window.partitionBy("doc_id").orderBy("cpos")),
        )
        .filter(F.col("v").isNotNull() & (F.col("w") != F.col("v")))
        .select(F.col("w").alias("u"), "v")
    )
    both = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    edges = (
        both.groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("wt"))
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("u").agg(F.sum("wt").cast("long").alias("wu"))
    nodes = edges.select(F.col("u").alias("w")).distinct()
    n = nodes.count()
    r0_val = _TR_SCALE // n
    base = (150 * r0_val) // 1000
    ranks = nodes.select("w", F.lit(r0_val).cast("long").alias("r"))
    ej = edges.join(deg, "u")
    for _ in range(_TR_ITERS):
        contrib = (
            ej.join(ranks.select(F.col("w").alias("u"), "r"), "u")
            .select("v", F.expr("(wt * r) div wu").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.w == contrib.v, "left")
            .select(
                "w",
                (
                    F.lit(base)
                    + F.expr("850 * coalesce(s, 0) div 1000")
                ).cast("long").alias("r"),
            )
        )
    return (
        ranks.select(F.col("w").alias("word"), F.col("r").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), F.col("word").asc())
        .limit(25)
    )


_RBO_K = 25
# (1-p)·p^(d-1) weights for p=0.9 as python-repr literals — the SAME
# decimal text parses to the SAME double in both engines (never libm pow).
_RBO_WEIGHTS = [(1, 0.09999999999999998), (2, 0.08999999999999998), (3, 0.08099999999999999), (4, 0.07289999999999999), (5, 0.06560999999999999), (6, 0.059049), (7, 0.05314409999999999), (8, 0.047829689999999994), (9, 0.043046721), (10, 0.0387420489), (11, 0.03486784401), (12, 0.031381059609), (13, 0.028242953648100005), (14, 0.025418658283290003), (15, 0.022876792454961003), (16, 0.020589113209464903), (17, 0.01853020188851841), (18, 0.016677181699666574), (19, 0.015009463529699915), (20, 0.013508517176729925), (21, 0.012157665459056933), (22, 0.010941898913151239), (23, 0.009847709021836116), (24, 0.008862938119652504), (25, 0.007976644307687254)]


@query(
    "rbo_rankings",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents
    ),
    content AS (
        SELECT doc_id, w FROM toks
        WHERE len(w) > 2 AND NOT list_contains({_STOP_SQL}, w)
    ),
    tf AS (SELECT w, COUNT(*)::BIGINT AS c FROM content GROUP BY w),
    df AS (SELECT w, COUNT(DISTINCT doc_id)::BIGINT AS c FROM content GROUP BY w),
    ra AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC)::BIGINT AS r
        FROM tf QUALIFY r <= 25
    ),
    rb AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC)::BIGINT AS r
        FROM df QUALIFY r <= 25
    ),
    joined AS (
        SELECT ra.w, greatest(ra.r, rb.r)::BIGINT AS m
        FROM ra JOIN rb ON rb.w = ra.w
    ),
    wt(d, wgt) AS (VALUES (1, 0.09999999999999998), (2, 0.08999999999999998), (3, 0.08099999999999999), (4, 0.07289999999999999), (5, 0.06560999999999999), (6, 0.059049), (7, 0.05314409999999999), (8, 0.047829689999999994), (9, 0.043046721), (10, 0.0387420489), (11, 0.03486784401), (12, 0.031381059609), (13, 0.028242953648100005), (14, 0.025418658283290003), (15, 0.022876792454961003), (16, 0.020589113209464903), (17, 0.01853020188851841), (18, 0.016677181699666574), (19, 0.015009463529699915), (20, 0.013508517176729925), (21, 0.012157665459056933), (22, 0.010941898913151239), (23, 0.009847709021836116), (24, 0.008862938119652504), (25, 0.007976644307687254)),
    xs AS (
        SELECT wt.d, wt.wgt,
               (SELECT COUNT(*) FROM joined WHERE joined.m <= wt.d)::BIGINT
                   AS x
        FROM wt
    )
    SELECT 25::BIGINT AS k,
           (SELECT x FROM xs WHERE d = 25) AS overlap_at_k,
           ROUND((SELECT x FROM xs WHERE d = 25)::DOUBLE / 25, 6)
               AS agreement_at_k,
           ROUND(list_reduce(
               list_prepend([0.0],
                   (SELECT list([wgt * x / d] ORDER BY d) FROM xs)),
               (a, e) -> [a[1] + e[1]])[1], 6) AS rbo
    """,
)
def rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    keyword rankings of the corpus — collection frequency vs document
    frequency (bursty terms rank high on tf, broad terms on df): RBO_p =
    (1-p) * sum_d p^(d-1) * X_d / d at p = 0.9 over the top-25, the
    top-weighted list-comparison metric retrieval teams use where
    Kendall/Spearman (which weight all depths equally) mislead.

    Parity: both rankings are exact integer windows with word tiebreaks;
    X_d (the depth-d intersection size) counts words whose max(rank_a,
    rank_b) <= d — exact BIGINTs; the geometric weights are PYTHON-REPR
    LITERALS (the same decimal text parses to the same double in both
    engines — libm pow never runs), and the 25 weighted terms fold in
    d-order.

    Scale: two word-keyed groupBys with map-side combine, two top-25
    windows over vocab-sized frames, and a 25-row fold — corpus-free
    after the first aggregate."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    content = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w"),
    ).filter((F.length("w") > 2) & ~F.array_contains(stop, F.col("w")))
    tf = content.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    df_ = content.groupBy("w").agg(
        F.countDistinct("doc_id").cast("long").alias("c")
    )
    ra = tf.select(
        "w",
        F.row_number().over(W.orderBy(F.col("c").desc(), F.col("w").asc()))
        .cast("long").alias("r"),
    ).filter(F.col("r") <= _RBO_K)
    rb = df_.select(
        "w",
        F.row_number().over(W.orderBy(F.col("c").desc(), F.col("w").asc()))
        .cast("long").alias("r"),
    ).filter(F.col("r") <= _RBO_K)
    joined = ra.alias("a").join(
        rb.alias("b"), F.col("a.w") == F.col("b.w")
    ).select(F.greatest("a.r", "b.r").alias("m"))
    wt = spark.createDataFrame(_RBO_WEIGHTS, "d long, wgt double")
    xs = (
        wt.crossJoin(joined)
        .groupBy("d", "wgt")
        .agg(
            F.sum(F.when(F.col("m") <= F.col("d"), 1).otherwise(0))
            .cast("long").alias("x")
        )
    )
    folded = xs.agg(
        F.element_at(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "wgt", "x"))),
                    lambda s: F.array(
                        s["wgt"] * s["x"] / s["d"].cast("double")
                    ),
                ),
                F.array(F.lit(0.0)),
                lambda a, e: F.array(F.element_at(a, 1) + F.element_at(e, 1)),
            ),
            1,
        ).alias("rbo"),
        F.max(F.when(F.col("d") == _RBO_K, F.col("x"))).cast("long")
        .alias("overlap_at_k"),
    )
    return folded.select(
        F.lit(_RBO_K).cast("long").alias("k"),
        "overlap_at_k",
        F.round(F.col("overlap_at_k").cast("double") / _RBO_K, 6)
        .alias("agreement_at_k"),
        F.round("rbo", 6).alias("rbo"),
    )
