"""Focused tests for the r15 optimization-round internals changes.

Covers exactly the operator internals the round touched:
  * io.spread — row preservation + core-derived partitioning,
  * connected_components' folded init (labels identical to the
    brute-force reachability minimum, incl. the multi-round path),
  * the fused _mq_hits pass — rank arrays / pool sizes equal to the
    r14 per-query reference computed the old way (bm25_search +
    relevance projection per query).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_spread_preserves_rows_and_spreads(spark):
    from fusionspark.io import spread

    df = spark.range(1000).select(F.col("id"), (F.col("id") * 3).alias("v"))
    one = df.coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    out = spread(one)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))
    assert out.agg(F.sum("v")).collect()[0][0] == one.agg(F.sum("v")).collect()[0][0]


def test_cc_minlabel_folded_init_matches_reachability(spark):
    from fusionspark.operators.dedup import connected_components

    # chain 0-1-2-3-4 (diameter 4 — needs several propagation rounds),
    # a triangle 10-11-12, and singletons 20, 21
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 20, 21]], "doc_id long"
    )
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(edges, nodes).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 21}


def test_cc_minlabel_empty_edges(spark):
    from fusionspark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(5,), (7,)], "doc_id long")
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(edges, nodes).collect()
    }
    assert out == {5: 5, 7: 7}


def test_mq_hits_matches_per_query_reference(spark, sf_dir):
    """The fused 2-scan pass must reproduce the r14 per-query frames:
    for each eval query, the sorted ranks of relevant docs inside the
    BM25 top-10 and the relevant-pool size."""
    from fusionspark.functions.text import tokenize
    from fusionspark.io import load_table
    from fusionspark.operators.keyword import bm25_search, extract_terms
    from fusionspark.queries.eval_queries import _EVAL_QUERIES, _mq_hits

    row = _mq_hits(spark, sf_dir).collect()[0]

    docs = load_table(spark, sf_dir, "documents")
    for i, q in enumerate(_EVAL_QUERIES):
        terms = extract_terms(q)
        tarr = F.array(*[F.lit(t) for t in terms])
        head = F.slice(tokenize("text"), 1, 20)
        rel = (
            docs.select(
                "doc_id",
                F.size(
                    F.filter(tarr, lambda t: F.array_contains(head, t))
                ).alias("rel"),
            )
            .filter(F.col("rel") >= 2)
            .select("doc_id")
        )
        ranked = bm25_search(docs, q, top_k=10).select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("rank"),
        )
        hits = sorted(
            r["rank"] for r in ranked.join(rel, "doc_id").select("rank").collect()
        )
        nr = rel.count()
        assert list(row[f"ranks_{i + 1}"]) == hits, q
        assert row[f"nr_{i + 1}"] == nr, q
