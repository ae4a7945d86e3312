"""Dedup family + ANN tests: LSH candidate soundness (every high-Jaccard
pair is found), SimHash locality, IVF recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import dedup
from fusionspark.operators.ann import ivf_knn
from fusionspark.operators.knn import knn, self_probes


def test_exact_dedup_finds_planted_dup(spark):
    rows = [(1, "same text here"), (2, "same text here"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["keeper"]: r["n_copies"] for r in dedup.exact_dedup(df).collect()}
    assert out[1] == 2 and out[3] == 1


def test_minhash_finds_planted_neardup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base + " extra"), (3, "completely unrelated words apple banana cherry date elderberry fig grape")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_neardup(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_locality(spark):
    base = "spark query engine with columnar execution and vectorized operators"
    rows = [(1, base), (2, base + " tweak"), (3, "zebra xylophone quartz vortex jackdaw nymph")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 5)
    exact = knn(e, probes, k=10)
    approx = ivf_knn(e, probes, k=10, n_centroids=8, n_probe=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["probe_id"], set()).add(r["vec_id"])
    recalls = [len(ex[p] & ap.get(p, set())) / len(ex[p]) for p in ex]
    # nProbe=4 of 8 lists should recover at least half the true neighbors
    assert sum(recalls) / len(recalls) >= 0.5
    # the probe itself is always found (it lives in its own best list)
    for p, s in ap.items():
        assert p in s


def test_embedding_neardup_symmetry(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = dedup.embedding_neardup(e, threshold=0.3).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert r["sim"] >= 0.3


def test_ivf_kmeans_recall(spark, sf_dir):
    from fusionspark.operators.ann import ivf_knn_kmeans

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 5)
    exact = knn(e, probes, k=10)
    approx = ivf_knn_kmeans(e, probes, k=10, n_centroids=8, n_probe=4)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        ap.setdefault(r["probe_id"], set()).add(r["vec_id"])
    recalls = [len(ex[p] & ap.get(p, set())) / len(ex[p]) for p in ex]
    # learned centroids at nProbe=4/8 should beat or match the naive split
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_persisted_matches_inflight(spark, sf_dir, tmp_path):
    """persist_ivf → ivf_search_persisted returns the same rows as the
    in-flight ivf_knn, and the data scan prunes to the wanted partitions
    (PartitionFilters on centroid_id — the 100-TB IO win)."""
    import io as _io
    import contextlib

    from fusionspark.operators.ann import ivf_search_persisted, persist_ivf

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 5)
    path = str(tmp_path / "ivf_index")
    persist_ivf(e, path, n_centroids=8)

    inflight = ivf_knn(e, probes, k=10, n_centroids=8, n_probe=2)
    persisted = ivf_search_persisted(spark, path, probes, k=10, n_probe=2)
    a = sorted(map(tuple, inflight.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        persisted.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the partition filter must actually reference the partition column
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "centroid_id" in pf.group(1)


def test_ivf_assign_no_shuffle(spark, sf_dir):
    """The assignment plan must be a pure map over the scan: no Exchange,
    no join, no window (the round-1 version shuffled corpus×k rows)."""
    import io as _io
    import contextlib

    from fusionspark.operators.ann import deterministic_centroids, ivf_assign

    e = load_table(spark, sf_dir, "embeddings")
    cents = deterministic_centroids(e, 8)
    assigned = ivf_assign(e, cents)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assigned.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_simhash_banding_matches_allpairs(spark):
    """The banded join must return exactly the all-pairs result (pigeonhole
    completeness), and its plan must not contain a cartesian product."""
    import io as _io
    import contextlib

    rows = [(i, f"shared common tokens alpha beta gamma delta {'x' * (i % 3)} {i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(df).collect()}
    brute = set()
    for a in sh:
        for b in sh:
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= 4:
                brute.add((a, b))
    banded = {(r["id_a"], r["id_b"]) for r in dedup.simhash_neardup(df, max_hamming=4).collect()}
    assert banded == brute

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup.simhash_neardup(df, max_hamming=4).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_adversarial_identical_corpus(spark):
    """1k identical docs collapse into one LSH bucket per band; the
    salt-split must spread the quadratic bucket and still return every
    pair exactly once."""
    rows = [(i, "exact same boilerplate text repeated in every document") for i in range(1000)]
    rows += [(1000 + i, f"unique document number {i} entropy {i * 7} {i * 13}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    n = dedup.minhash_candidates(df).count()
    assert n == 1000 * 999 // 2  # all identical pairs, each exactly once


def test_minhash_salt_preserves_pairs(spark):
    """With the threshold forced to 0 (everything salted), the candidate
    set must equal the unsalted one."""
    rows = [(i, f"shared prefix words alpha beta gamma {i % 4}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    salted = {(r["id_a"], r["id_b"]) for r in dedup.minhash_candidates(df, salt_threshold=0, n_salts=8).collect()}
    plain = {(r["id_a"], r["id_b"]) for r in dedup.minhash_candidates(df, salt_threshold=10**9).collect()}
    assert salted == plain and len(plain) > 0


def test_top_df_shingles_drops_boilerplate(spark):
    rows = [(i, f"common legal header for all docs :: payload {i} {i * 3}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    boiler = set(dedup.top_df_shingles(df, max_df=0.9))
    assert "common legal header" in boiler
    # signatures with boilerplate dropped differ from the plain ones
    plain = dedup.minhash_signatures(df).collect()
    dropped = dedup.minhash_signatures(df, drop_shingles=frozenset(boiler)).collect()
    assert {tuple(r) for r in plain} != {tuple(r) for r in dropped}


def test_ivf_numpy_rerank_matches_expression(spark, sf_dir, tmp_path):
    """The per-list GEMM rerank returns the same ids and ranks as the
    bit-exact expression rerank (sims may drift by ulps)."""
    from fusionspark.operators.ann import ivf_search_persisted, persist_ivf

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 8)
    path = str(tmp_path / "ivf_np")
    persist_ivf(e, path, n_centroids=8)
    expr = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"])
        for r in ivf_search_persisted(spark, path, probes, k=10, n_probe=3).collect()
    )
    np_ = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"])
        for r in ivf_search_persisted(
            spark, path, probes, k=10, n_probe=3, strategy="numpy"
        ).collect()
    )
    assert expr == np_ and len(expr) > 0


def test_ivf_distributed_matches_driver_routed(spark, sf_dir, tmp_path):
    """ivf_search_distributed (probes never collected: Arrow-map routing +
    cogroup GEMM) returns exactly the driver-routed result, with the
    partition filter still on the scan; forcing 1-row/1-probe block caps
    exercises the 2-D skew blocking without changing the answer."""
    import contextlib
    import io as _io
    import re

    from fusionspark.operators.ann import (
        _collect_centroids,
        _route_probes,
        ivf_search_distributed,
        ivf_search_persisted,
        persist_ivf,
        route_probes_mapped,
    )

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 8)
    path = str(tmp_path / "ivf_dist")
    persist_ivf(e, path, n_centroids=8)

    # routing parity: the Arrow map picks the same lists as the driver loop
    crows = _collect_centroids(spark.read.parquet(f"{path}/centroids"))
    mapped = {
        (r["probe_id"], r["centroid_id"])
        for r in route_probes_mapped(probes, crows, 3).collect()
    }
    driver = {(pid, cid) for pid, _v, cid in _route_probes(probes, crows, 3, "probe_id", "probe_embedding")}
    assert mapped == driver

    want = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"])
        for r in ivf_search_persisted(
            spark, path, probes, k=10, n_probe=3, strategy="numpy"
        ).collect()
    )
    dist = ivf_search_distributed(spark, path, probes, k=10, n_probe=3)
    got = sorted((r["probe_id"], r["vec_id"], r["rnk"]) for r in dist.collect())
    assert got == want and len(got) > 0

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        dist.explain("formatted")
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert pf and "centroid_id" in pf.group(1)

    blocked = ivf_search_distributed(
        spark, path, probes, k=10, n_probe=3,
        max_group_probes=2, max_group_rows=50,
    )
    got_blocked = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"]) for r in blocked.collect()
    )
    assert got_blocked == want


def test_ngram_minhash_neardup_finds_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "completely unrelated words apple banana cherry date elderberry fig"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.ngram_minhash_neardup(df, threshold=0.4).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_embedding_neardup_ivf_blocks(spark, sf_dir):
    """IVF-blocked near-dup finds a strict subset of the label-blocked
    result space but every returned pair really is above threshold, and
    planted duplicate vectors in the same list are found."""
    e = load_table(spark, sf_dir, "embeddings")
    out = dedup.embedding_neardup_ivf(e, threshold=0.9).collect()
    for r in out:
        assert r["id_a"] < r["id_b"] and r["sim"] >= 0.9
    # planted: duplicate an existing vector under a new id -> must pair up
    first = e.limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(999_999, first["label"], first["embedding"])],
        "vec_id: long, label: int, embedding: array<float>",
    )
    e2 = e.select("vec_id", "label", "embedding").unionByName(dup)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_ivf(e2, threshold=0.999).collect()
    }
    assert (first["vec_id"], 999_999) in pairs


def test_srp_lsh_recall(spark, sf_dir):
    """SRP-LSH bucketed search recovers most true neighbors (banding
    amplification) and always finds the probe itself (identical vectors
    share every band)."""
    from fusionspark.operators.ann import srp_knn

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 5)
    exact = knn(e, probes, k=10)
    approx = srp_knn(e, probes, k=10, n_bits=16, bands=8)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        ap.setdefault(r["probe_id"], set()).add(r["vec_id"])
    recalls = [len(ex[p] & ap.get(p, set())) / len(ex[p]) for p in ex]
    assert sum(recalls) / len(recalls) >= 0.5
    for p, s in ap.items():
        assert p in s
