"""Keyword (BM25-ish) search — SURVEY §2.4.

Reference: /root/reference/src/retrieval/HybridRetriever.js:365-399 — a full
scan over every entry's JSON-stringified metadata, per term a global-regex
count, TF-saturation `count*2.2/(count+1.2)`, score averaged over terms.

Spark plan: the term list is tiny (a literal array), the scan is a single
pass over the text column with one regexp_extract_all per term — all
codegen'd, no shuffle until the final top-k (TakeOrderedAndProject).
At 100 TB an inverted-index table (term → posting list) built once via
explode+groupBy would replace the scan; the scoring expression is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fusionspark.functions.text import STOPWORDS, term_count, tf_saturation


def extract_terms(query: str) -> list[str]:
    """K1 semantics in plain Python for a literal query string
    (HybridRetriever.js:366-368): lowercase, split \\s+, len>2, non-stopword."""
    stop = set(STOPWORDS)
    return [t for t in query.lower().split() if len(t) > 2 and t not in stop]


def tf_score(text_col: Column | str, terms: list[str]) -> Column:
    """K2: Σ_t tf_sat(count_t) / |terms| (HybridRetriever.js:381-390)."""
    if not terms:
        return F.lit(0.0)
    total: Column = F.lit(0.0)
    for t in terms:
        total = total + tf_saturation(term_count(text_col, F.lit(t)))
    return total / F.lit(float(len(terms)))


def keyword_search(
    documents: DataFrame,
    query: str,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K2/F5: TF-saturation ranked scan, score > 0, top-k
    (HybridRetriever.js:365-399).  Ties broken by id ASC."""
    terms = extract_terms(query)
    if not terms:
        return documents.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    scored = documents.withColumn("score", tf_score(F.col(text_col), terms))
    return (
        scored.filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
        .select(id_col, "score")
    )


def keyword_overlap_search(
    documents: DataFrame,
    query: str,
    top_k: int = 10,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K3: relevance = |terms present| / |terms| via substring containment
    (TreeIndex.js:685-696; same shape in AgentMemory.js:634-661)."""
    terms = [t for t in query.lower().split() if len(t) > 0]
    if not terms:
        return documents.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    lowered = F.lower(F.col(text_col))
    hits: Column = F.lit(0)
    for t in terms:
        hits = hits + F.when(lowered.contains(t), 1).otherwise(0)
    score = hits.cast("double") / F.lit(float(len(terms)))
    return (
        documents.withColumn("score", score)
        .filter(F.col("score") > threshold)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
        .select(id_col, "score")
    )
