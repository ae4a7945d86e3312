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


def test_pq_encode_shapes_ties_and_no_shuffle(spark, sf_dir):
    """Codes are m per vector in [0, ksub); the first ksub vectors encode
    to their own index in every subspace (distance 0 to themselves); the
    encode plan is a pure map — no exchange."""
    from fusionspark.operators.ann import pq_codebooks, pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(e, m=4, ksub=16)
    assert cbs.shape == (4, 16, 16)
    codes = pq_encode(e, cbs)
    rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for vid, cs in rows.items():
        assert len(cs) == 4 and all(0 <= c < 16 for c in cs)
    for vid in range(16):  # codebook donors must self-encode
        assert rows[vid] == [vid] * 4
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_adc_recall_and_refine(spark, sf_dir):
    """ADC top-k approximates exact cosine top-k; Lloyd codebooks beat or
    match none; exact refine over the ADC top-50 recovers most of the
    exact top-10."""
    from fusionspark.operators.ann import (
        pq_adc_topk,
        pq_codebooks_lloyd,
        pq_encode,
        pq_refine,
    )
    from fusionspark.operators.knn import knn

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 5)
    exact: dict = {}
    for r in knn(e, probes, k=10).collect():
        exact.setdefault(r["probe_id"], set()).add(r["vec_id"])

    cbs = pq_codebooks_lloyd(e, m=8, ksub=32, iters=4, sample_n=500)
    codes = pq_encode(e, cbs)
    adc50 = pq_adc_topk(codes, probes, cbs, k=50)
    refined = pq_refine(adc50, e, probes, k=10)
    hits = sum(
        1
        for r in refined.collect()
        if r["vec_id"] in exact.get(r["probe_id"], ())
    )
    denom = sum(len(s) for s in exact.values())
    assert hits / denom >= 0.6  # 8-byte codes + refine on 64-d vectors
    # every probe finds itself (distance 0 survives any quantizer)
    found = {r["probe_id"]: set() for r in refined.collect()}
    for r in refined.collect():
        found[r["probe_id"]].add(r["vec_id"])
    for p, s in found.items():
        assert p in s


def test_ivf_pq_search_runs_on_persisted_layout(spark, sf_dir, tmp_path):
    """IVF-PQ end-to-end: coarse pruning to n_probe lists + ADC + refine;
    results are a subset of the pruned lists and ranked by exact cosine."""
    from fusionspark.operators.ann import (
        ivf_pq_search,
        persist_ivf,
        pq_codebooks,
    )

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    persist_ivf(e, path, n_centroids=8)
    cbs = pq_codebooks(e, m=4, ksub=16)
    probes = self_probes(e, 3)
    out = ivf_pq_search(
        spark, path, probes, cbs, k=5, n_probe=4, refine_r=20
    ).collect()
    by_probe: dict = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for p, rs in by_probe.items():
        assert len(rs) <= 5
        sims = [r["sim"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)
        assert any(r["vec_id"] == p for r in rs)  # self found via refine


def test_pq_adc_keep_ties_widens_discrete_boundaries(spark):
    """ADC scores are discrete (shared code words tie): keep_ties=True must
    return the whole tied boundary group, row_number mode exactly k."""
    import numpy as np

    from fusionspark.operators.ann import pq_adc_topk, pq_codebooks, pq_encode

    # 12 copies of the same vector + 4 distinct ones: any k cut inside the
    # copy group is arbitrary under row_number, complete under rank
    base = [float(i % 7 + 1) for i in range(8)]
    rows = [(i, base) for i in range(12)]
    rows += [(100 + j, [float((i * (j + 2)) % 5 + 1) for i in range(8)]) for j in range(4)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cbs = pq_codebooks(e, m=2, ksub=4)
    codes = pq_encode(e, cbs)
    probes = e.limit(1).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_embedding")
    )
    strict = pq_adc_topk(codes, probes, cbs, k=5).collect()
    assert len(strict) == 5
    tied = pq_adc_topk(codes, probes, cbs, k=5, keep_ties=True).collect()
    assert len(tied) >= 12  # the whole copy group survives the cut
    top = [r for r in tied if r["rnk"] == 1]
    sims = {round(r["asim"], 9) for r in top}
    assert len(sims) == 1


def test_ivf_append_frozen_quantizer_parity(spark, sf_dir, tmp_path):
    """Appending a batch against frozen centroids yields exactly the same
    search results as a one-shot assignment of the full corpus against the
    SAME centroids; appended vectors are findable; PQ codes append too."""
    import numpy as np

    from fusionspark.operators.ann import (
        _assign_from_rows,
        _collect_centroids,
        ivf_append,
        ivf_knn,
        ivf_pq_search,
        ivf_search_persisted,
        persist_ivf,
        pq_codebooks,
        pq_encode,
    )

    e = load_table(spark, sf_dir, "embeddings")
    half1 = e.filter(F.col("vec_id") % 2 == 0)
    half2 = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_inc")
    persist_ivf(half1, path, n_centroids=8)
    cbs = pq_codebooks(half1, m=4, ksub=16)
    pq_encode(
        spark.read.parquet(f"{path}/data"), cbs, extra_cols=["centroid_id"]
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(f"{path}/codes")

    ivf_append(spark, path, half2, codebooks=cbs)

    probes = self_probes(e, 4)
    crows = _collect_centroids(spark.read.parquet(f"{path}/centroids"))
    cents = spark.createDataFrame(
        [(c, v) for c, v, _ in crows], "centroid_id long, centroid array<float>"
    )
    expected = ivf_knn(
        e, probes, k=5, n_probe=3,
        centroids=cents, assigned=_assign_from_rows(e, crows, "embedding"),
    )
    got = ivf_search_persisted(spark, path, probes, k=5, n_probe=3)
    exp = sorted((r["probe_id"], r["vec_id"], r["rnk"]) for r in expected.collect())
    act = sorted((r["probe_id"], r["vec_id"], r["rnk"]) for r in got.collect())
    assert act == exp

    # an odd (appended) probe finds itself through the appended lists
    odd_probe = self_probes(half2, 1)
    top = ivf_search_persisted(spark, path, odd_probe, k=1, n_probe=1).collect()
    assert top and top[0]["vec_id"] == top[0]["probe_id"]

    # PQ codes cover the whole corpus after the append
    n_codes = spark.read.parquet(f"{path}/codes").count()
    assert n_codes == e.count()
    pq_top = ivf_pq_search(
        spark, path, odd_probe, cbs, codes_path=f"{path}/codes",
        k=1, n_probe=1, refine_r=8,
    ).collect()
    assert pq_top and pq_top[0]["vec_id"] == pq_top[0]["probe_id"]


def test_sq8_recall_and_code_bounds(spark, sf_dir):
    """SQ8 search must stay close to exact: recall@10 ≥ 0.9 on the
    embeddings corpus (64-d uint8 grid is fine-grained), and every code
    must be a valid uint8."""
    from fusionspark.io import load_table
    from fusionspark.operators.ann import sq8_encode, sq8_knn, sq8_train
    from fusionspark.operators.knn import knn

    emb = load_table(spark, sf_dir, "embeddings")
    ranges = sq8_train(emb, dim=64)
    codes = sq8_encode(emb.select("vec_id", "embedding"), ranges, dim=64)
    bad = codes.select(
        F.explode("codes").alias("c")
    ).filter((F.col("c") < 0) | (F.col("c") > 255))
    assert bad.count() == 0

    probes = emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    approx = sq8_knn(codes, probes, k=10, dim=64)
    exact = knn(
        emb,
        probes.select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_embedding"),
        ),
        k=10, strategy="numpy",
    )
    ex = {}
    for r in exact.select("probe_id", "vec_id").collect():
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = sum(
        1 for r in approx.select("probe_id", "vec_id").collect()
        if r["vec_id"] in ex.get(r["probe_id"], ())
    )
    assert hits / sum(len(s) for s in ex.values()) >= 0.9


def test_ivf_persisted_autoswitches_to_distributed_router(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r9 #6: above ROUTE_COLLECT_MAX probes the persisted search
    must use the Arrow-map router — NO probe collect on the driver.
    _route_probes is patched to raise, the threshold lowered so the test
    stays fast; results must equal the numpy driver-routed path computed
    beforehand, and a small frame must still take the low-latency
    driver route."""
    from fusionspark.operators import ann

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 12)
    path = str(tmp_path / "ivf_auto")
    ann.persist_ivf(e, path, n_centroids=8)

    want = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"])
        for r in ann.ivf_search_persisted(
            spark, path, probes, k=5, n_probe=2, strategy="numpy"
        ).collect()
    )

    monkeypatch.setattr(ann, "ROUTE_COLLECT_MAX", 10)

    def boom(*a, **k):
        raise AssertionError(
            "driver-side probe collect in the >threshold search path"
        )

    monkeypatch.setattr(ann, "_route_probes", boom)
    got = sorted(
        (r["probe_id"], r["vec_id"], r["rnk"])
        for r in ann.ivf_search_persisted(
            spark, path, probes, k=5, n_probe=2
        ).collect()
    )
    assert got == want and len(got) == 60  # 12 probes × k=5

    # below the threshold the driver router is still the default
    small = self_probes(e, 3)
    with pytest.raises(AssertionError, match="driver-side probe collect"):
        ann.ivf_search_persisted(spark, path, small, k=5, n_probe=2).collect()


def test_ivf_persisted_autoswitch_honors_strategy(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r10: the auto-route must not SILENTLY drop an explicit
    strategy='expression' (bit-exact codegen'd cosine) — the distributed
    delegate scores with numpy GEMM, which can differ at ulp level.
    Above the threshold: strategy='numpy' delegates silently (identical
    scoring), the default/explicit 'expression' delegates WITH a warning."""
    import warnings

    from fusionspark.operators import ann

    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 12)
    path = str(tmp_path / "ivf_warn")
    ann.persist_ivf(e, path, n_centroids=8)
    monkeypatch.setattr(ann, "ROUTE_COLLECT_MAX", 10)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning becomes an error
        ann.ivf_search_persisted(
            spark, path, probes, k=5, n_probe=2, strategy="numpy"
        ).collect()

    with pytest.warns(UserWarning, match="ulp level"):
        ann.ivf_search_persisted(
            spark, path, probes, k=5, n_probe=2, strategy="expression"
        ).collect()
