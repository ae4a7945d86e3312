"""Invariant tests for the session-7 additions: positional phrase search
(operators/keyword.py), train/test split leakage (operators/packing.py),
and item-item CF (queries/mining_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fusionspark.operators.keyword import build_positional_index, phrase_search
from fusionspark.operators.packing import assign_split, split_leakage
from fusionspark.queries.mining_queries import item_cf_q

SF = "/root/testdata/sf0.001"


def test_phrase_search_positions_and_overlap(spark):
    """Known positions on a hand corpus; overlapping occurrences each
    count (every anchor judged independently)."""
    df = spark.createDataFrame(
        [
            (1, "x a b c a b y"),  # "a b" at 1 and 4
            (2, "a a a"),  # "a a" overlap case (not queried here)
            (3, "a b"),  # exact doc == phrase
            (4, "b a"),  # reversed: no hit
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(df, "a b").collect()
    }
    assert out == {1: (2, 1), 3: (1, 0)}
    # overlap: "a a" in "a a a" hits at 0 and 1
    out2 = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(df, "a a").collect()
    }
    assert out2 == {2: (2, 0)}


def test_phrase_search_three_terms_matches_bruteforce(spark):
    """3-term phrase over the real corpus == a per-doc Python replay."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(docs, "table value scan").collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].split(" ")
        pos = [
            i
            for i in range(len(toks) - 2)
            if toks[i : i + 3] == ["table", "value", "scan"]
        ]
        if pos:
            want[r["doc_id"]] = (len(pos), pos[0])
    assert got == want


def test_phrase_search_reuses_prebuilt_index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = build_positional_index(docs)
    direct = phrase_search(docs, "query value").collect()
    via_idx = phrase_search(docs, "query value", index=idx).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_idx))


def test_split_leakage_bounds_and_coverage(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = split_leakage(docs, gram=8)
    rows = out.collect()
    n_test = (
        assign_split(docs.select("doc_id"))
        .filter(F.col("split") == "test")
        .count()
    )
    assert len(rows) == n_test  # every test doc gets a row
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_shingles"]
        assert 0.0 <= r["leak_frac"] <= 1.0


def test_split_leakage_duplicate_of_train_doc_leaks_fully(spark):
    """A test doc whose text equals a train doc's text leaks 100%."""
    base = spark.createDataFrame(
        [(i, f"tok{i} " * 12) for i in range(40)], "doc_id: long, text: string"
    )
    sp = {r["doc_id"]: r["split"] for r in assign_split(base).collect()}
    train_id = next(i for i in sorted(sp) if sp[i] == "train")
    test_id = next(i for i in sorted(sp) if sp[i] == "test")
    txt = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [(train_id, txt), (test_id, txt)]
        + [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h u{i}i") for i in sorted(sp) if i not in (train_id, test_id)],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in split_leakage(df, gram=8).collect()}
    assert out[test_id]["leak_frac"] == 1.0
    others = [r for did, r in out.items() if did != test_id]
    assert all(r["n_leaked"] == 0 for r in others)


def test_item_cf_invariants(spark):
    out = item_cf_q(spark, SF)
    rows = out.collect()
    assert rows, "item_cf returned nothing"
    per_part = {}
    for r in rows:
        assert r["neighbor"] != r["part"]
        assert 1 <= r["rk"] <= 3
        assert 0.0 < r["cosine"] <= 1.0
        per_part.setdefault(r["part"], []).append(r)
    for part, rs in per_part.items():
        ranks = sorted(x["rk"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        by_rk = sorted(rs, key=lambda x: x["rk"])
        cosines = [x["cosine"] for x in by_rk]
        assert cosines == sorted(cosines, reverse=True)


def test_jaccard_prefix_join_matches_bruteforce(spark):
    """Prefix+length pruning is lossless: output == python all-pairs
    exact Jaccard ≥ 0.6 on the real corpus."""
    from fusionspark.operators.dedup import _py_shingles
    from fusionspark.operators.simjoin import jaccard_join_prefix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in jaccard_join_prefix(docs, t_num=3, t_den=5).collect()
    }
    sets = {
        r["doc_id"]: set(_py_shingles(r["text"], 3))
        for r in docs.select("doc_id", "text").collect()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.6:
                want[(a, b)] = round(j, 6)
    assert got == want


def test_jaccard_prefix_boundary_pairs(spark):
    """Exact-threshold pair (J = 0.6) is kept; just-below is dropped."""
    from fusionspark.operators.simjoin import jaccard_join_prefix

    # shingle sets are word-3-grams; craft docs whose shingle sets have
    # |x| = |y| = 4 with overlap 3 → J = 3/5 = 0.6 exactly
    d1 = "w1 w2 w3 w4 w5 w6"          # shingles: 123 234 345 456
    d2 = "w1 w2 w3 w4 w5 z9"          # shingles: 123 234 345 45z → overlap 3
    d3 = "a1 a2 a3 a4 a5 a6"          # disjoint
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id: long, text: string"
    )
    out = {(r["id_a"], r["id_b"]): r["sim"] for r in
           jaccard_join_prefix(df, t_num=3, t_den=5).collect()}
    assert out == {(1, 2): 0.6}


def test_target_encoding_loo_excludes_own_row(spark):
    from fusionspark.queries.pipeline_queries import target_encoding

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r for r in target_encoding(spark, SF).collect()}
    pdf = docs.select("doc_id", "source", "n_chars").toPandas()
    for src, sub in pdf.groupby("source"):
        s, c = sub["n_chars"].sum(), len(sub)
        for _, row in sub.head(3).iterrows():
            want = round((s - row["n_chars"]) / (c - 1), 6) if c > 1 else None
            assert got[row["doc_id"]]["te"] == want


def test_hashed_features_sum_law(spark):
    """Σ_dim val per doc == Σ_token sign — the hashing trick preserves the
    signed token mass."""
    from fusionspark.operators.dedup import md5_hash32
    from fusionspark.functions.text import tokenize
    from fusionspark.queries.pipeline_queries import hashed_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        hashed_features(spark, SF)
        .groupBy("doc_id")
        .agg(F.sum("val").alias("tot"))
    )
    sgn = F.when(
        F.pmod(md5_hash32(F.concat(F.lit("fs:"), F.col("w"))), F.lit(2)) == 0, 1
    ).otherwise(-1)
    want = (
        docs.select("doc_id", F.explode(tokenize("text")).alias("w"))
        .select("doc_id", sgn.alias("s"))
        .groupBy("doc_id")
        .agg(F.sum("s").alias("tot"))
    )
    diff = (
        got.withColumnRenamed("tot", "g")
        .join(want.withColumnRenamed("tot", "w2"), "doc_id")
        .filter(F.col("g") != F.col("w2"))
    )
    assert diff.count() == 0
