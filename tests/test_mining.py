"""Invariant tests for the data-mining family (queries/mining_queries.py):
market-basket pairs/rules, substring-span dedup, Kaplan-Meier survival."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fusionspark.queries.mining_queries import (
    association_rules_q,
    frequent_pairs_q,
    substring_dedup_q,
    survival_km_q,
)

SF = "/root/testdata/sf0.001"


def test_apriori_prefilter_lossless(spark):
    """The frequent-item prefilter drops no qualifying pair: recompute
    pairs WITHOUT the prune and compare."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a, c = b.alias("a"), b.alias("c")
    naive = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("x"), F.col("c.l_partkey").alias("y"))
        .agg(F.count("*").cast("long").alias("pair_sup"))
        .filter(F.col("pair_sup") >= 2)
    )
    pruned = frequent_pairs_q(spark, SF)
    n_sym_diff = (
        pruned.select("x", "y", "pair_sup")
        .exceptAll(naive)
        .unionAll(naive.exceptAll(pruned.select("x", "y", "pair_sup")))
        .count()
    )
    assert n_sym_diff == 0


def test_association_rules_bounds(spark):
    rows = association_rules_q(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
        assert r.pair_sup <= r.sup_ante


def test_substring_dedup_spans_bounded(spark):
    """Merged spans never exceed the doc, never overlap (sum of spans
    <= doc length), and every reported doc has >= 1 window."""
    out = substring_dedup_q(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("L")
    )
    j = out.join(docs, "doc_id").collect()
    assert j
    for r in j:
        assert 1 <= r.n_spans <= r.n_dup_windows
        assert 32 <= r.dup_chars <= r.L
        assert abs(r.dup_frac - round(r.dup_chars / r.L, 6)) < 1e-9


def test_substring_dedup_islands_merge(spark):
    """Two docs sharing one long run + one isolated window merge into
    exactly the expected spans."""
    shared = "x" * 64  # aligned run: windows at i=0..4 all duplicated
    tail = "q" * 8 + "y" * 32  # second duplicated window, disjoint
    a = shared + "A" * 24 + tail
    b = shared + "B" * 24 + tail
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        for t in ("documents",):
            df.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
        out = {r.doc_id: r for r in substring_dedup_q(spark, tmp).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        # the shared 64-char prefix merges into one island; "y"*32 region
        # (plus any window overlapping it that also matches) forms the rest
        assert r.n_spans >= 2
        assert r.dup_chars >= 64 + 32


def test_survival_km_monotone(spark):
    rows = sorted(survival_km_q(spark, SF).collect(), key=lambda r: r.t)
    assert rows
    n_total = rows[0].n_risk + sum(
        r.d + r.censored for r in rows[: rows.index(rows[0])]
    )
    # n_risk strictly decreases as d+c leave; surv is non-increasing in t
    prev_surv, prev_risk = 1.0 + 1e-9, n_total + 1
    at_risk = None
    for r in rows:
        if at_risk is None:
            at_risk = r.n_risk
        assert r.n_risk == at_risk
        at_risk -= r.d + r.censored
        assert r.n_risk <= prev_risk
        assert r.surv <= prev_surv + 1e-9
        prev_surv, prev_risk = r.surv, r.n_risk
    assert at_risk == 0  # timeline exhausts the cohort


def test_survival_km_numpy_replay(spark):
    """Bit-level replay of the fold on the same timeline."""
    rows = sorted(survival_km_q(spark, SF).collect(), key=lambda r: r.t)
    n = sum(r.d + r.censored for r in rows)
    at_risk, s = float(n), 1.0
    for r in rows:
        s = s * (1 - r.d / at_risk)
        at_risk = at_risk - r.d - r.censored
        assert r.surv == pytest.approx(round(s, 6), abs=1e-9)


def test_knn_graph_every_vector_covered(spark):
    """Every vector gets exactly k neighbors (blocks are larger than k),
    none of them itself, ranks 1..k, sims within [-1, 1]."""
    from fusionspark.queries.mining_queries import _KNNG_K, knn_graph_q

    out = knn_graph_q(spark, SF).collect()
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(out) == n_vec * _KNNG_K
    by_vec = {}
    for r in out:
        assert r.vec_id != r.nbr_id
        assert -1.000001 <= r.sim <= 1.000001
        by_vec.setdefault(r.vec_id, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3] for v in by_vec.values())


def test_rfm_segments_partition(spark):
    """Quintile scores in 1..5 with balanced bucket sizes; segment labels
    partition the customer set per the CASE law."""
    from fusionspark.queries.mining_queries import rfm_segments_q

    rows = rfm_segments_q(spark, SF).collect()
    n = len(rows)
    assert n == spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey"
    ).distinct().count()
    for col in ("r_score", "f_score", "m_score"):
        from collections import Counter

        c = Counter(getattr(r, col) for r in rows)
        assert set(c) == {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1  # NTILE balance law
    for r in rows:
        if r.r_score >= 4 and r.f_score >= 4:
            assert r.segment == "champions"
        elif r.f_score >= 4:
            assert r.segment == "loyal"


def test_source_divergence_metric_laws(spark):
    """JSD is symmetric by construction here (we emit a<b once), bounded
    by ln(2), zero only for identical distributions; identical sources
    replayed twice give jsd == 0."""
    import math

    from fusionspark.queries.mining_queries import source_divergence_q

    rows = source_divergence_q(spark, SF).collect()
    n_src = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0.0 <= r.jsd <= math.log(2) + 1e-9

    # clone corpus: two sources with IDENTICAL text -> jsd exactly 0
    docs = [(i, "alpha beta gamma delta", "en", "sA", 22) for i in range(5)]
    docs += [(10 + i, "alpha beta gamma delta", "en", "sB", 22) for i in range(5)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = source_divergence_q(spark, tmp).collect()
    assert len(out) == 1 and out[0].jsd == 0.0


def test_frequent_sequences_support_law(spark):
    """Session support never exceeds occurrence count, all types come from
    the corpus alphabet, and every trigram meets the floor."""
    from fusionspark.queries.mining_queries import (
        _SEQ_MINSUP,
        frequent_sequences_q,
    )

    rows = frequent_sequences_q(spark, SF).collect()
    assert rows
    types = {
        r.event_type
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    for r in rows:
        assert {r.e1, r.e2, r.e3} <= types
        assert r.n_sessions >= _SEQ_MINSUP
        assert r.n_occurrences >= r.n_sessions


def test_dedup_span_rewrite_accounting(spark):
    """Every doc appears once; removed + cleaned == original length;
    owner docs keep more than non-owners; unchanged docs hash their
    original text."""
    import hashlib

    from fusionspark.queries.mining_queries import dedup_span_rewrite_q

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = dedup_span_rewrite_q(spark, SF).collect()
    assert len(rows) == len(docs)
    n_changed = 0
    for r in rows:
        assert r.removed_chars + r.cleaned_len == len(docs[r.doc_id])
        if r.removed_chars == 0:
            assert r.cleaned_md5 == hashlib.md5(
                docs[r.doc_id].encode()
            ).hexdigest()
        else:
            n_changed += 1
    assert n_changed > 0


def test_dedup_span_rewrite_owner_election(spark):
    """Synthetic corpus: the smallest doc_id sharing a span keeps it, all
    later copies lose exactly that span."""
    import hashlib

    shared = "z" * 48  # aligned: windows i=0,1,2 duplicated
    uniq = ["A" * 40, "B" * 40, "C" * 40]
    rows = [(i + 1, shared + uniq[i]) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "length(text) AS n_chars",
    )
    import tempfile

    from fusionspark.queries.mining_queries import dedup_span_rewrite_q

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = {r.doc_id: r for r in dedup_span_rewrite_q(spark, tmp).collect()}
    assert out[1].removed_chars == 0
    assert out[1].cleaned_md5 == hashlib.md5(rows[0][1].encode()).hexdigest()
    for k in (2, 3):
        assert out[k].removed_chars == 48
        assert out[k].cleaned_md5 == hashlib.md5(
            uniq[k - 1].encode()
        ).hexdigest()


def test_link_prediction_laws(spark):
    """Predicted pairs are never existing edges, Jaccard in (0, 1],
    Adamic-Adar matches a python replay from cn/degree facts."""
    import math

    from fusionspark.queries.mining_queries import link_prediction_q

    rows = link_prediction_q(spark, SF).collect()
    assert rows
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    edges = set()
    for d in range(n):
        for m in (d * 7 + 1, d * 13 + 3, d * 29 + 7):
            e = (min(d, m % n), max(d, m % n))
            if e[0] != e[1]:
                edges.add(e)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        assert (r.u, r.v) not in edges
        assert 0.0 < r.jaccard <= 1.0
        common = nbrs[r.u] & nbrs[r.v]
        assert len(common) == r.cn >= 2
        aa = sum(1.0 / math.log(deg[w]) for w in sorted(common, key=lambda w: deg[w]))
        assert r.adamic_adar == pytest.approx(aa, abs=2e-6)
        assert r.jaccard == pytest.approx(
            r.cn / (deg[r.u] + deg[r.v] - r.cn), abs=1e-6
        )


def test_item_cf_mega_basket_cap(spark):
    """The per-customer basket cap bounds pair fan-out: a planted
    1000-item mega-basket contributes at most cap·(cap−1)/2 pairs, the
    surviving items are exactly the md5-coin sample the oracle replays,
    and a under-cap run is identical to the uncapped plan."""
    import hashlib

    from fusionspark.queries.mining_queries import item_cf_frame

    # one mega-basket customer (1000 items) + two small baskets that
    # share a pair so the output is non-empty at n_uv >= 1
    rows = [(1, p) for p in range(1000)] + [(2, 5), (2, 7), (3, 5), (3, 7)]
    o = spark.createDataFrame(
        [(c, c) for c in {c for c, _ in rows}], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    cap = 16
    out = item_cf_frame(o, li, cap=cap, k=1000).collect()
    # the expected within-basket sample for customer 1: md5("1:p") order
    sample = sorted(
        range(1000), key=lambda p: (hashlib.md5(f"1:{p}".encode()).hexdigest(), p)
    )[:cap]
    kept = set(sample) | {5, 7}
    seen_parts = {r.part for r in out} | {r.neighbor for r in out}
    assert seen_parts <= kept
    # fan-out bound: mega-basket pairs <= C(cap, 2) (+ the planted pair)
    pairs = {(min(r.part, r.neighbor), max(r.part, r.neighbor)) for r in out}
    assert len(pairs) <= cap * (cap - 1) // 2 + 1
    # under-cap parity: cap larger than every basket == uncapped semantics
    small = [(10, 1), (10, 2), (11, 1), (11, 2), (11, 3)]
    o2 = spark.createDataFrame(
        [(c, c) for c in {c for c, _ in small}], "o_orderkey long, o_custkey long"
    )
    li2 = spark.createDataFrame(small, "l_orderkey long, l_partkey long")
    capped = {tuple(r) for r in item_cf_frame(o2, li2, cap=128, k=3).collect()}
    wide = {tuple(r) for r in item_cf_frame(o2, li2, cap=10**9, k=3).collect()}
    assert capped == wide and capped
