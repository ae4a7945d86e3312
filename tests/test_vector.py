"""Vector operator tests mirroring the reference's HNSW/engine assertions
(/root/reference/test/fusionpact.test.js:22-136): insert/search round trip,
metric correctness, filters, tenant isolation, dimension checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fusionspark.functions import vector as V
from fusionspark.io import load_table
from fusionspark.operators.knn import knn, self_probes


def test_cosine_self_similarity_is_one(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    row = e.select(
        V.cosine_similarity("embedding", "embedding").alias("s")
    ).first()
    assert abs(row["s"] - 1.0) < 1e-9


def test_knn_returns_k_ranked(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 2)
    out = knn(e, probes, k=5).collect()
    assert len(out) == 10
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rows in by_probe.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == [1, 2, 3, 4, 5]
        # self is the nearest under cosine
        assert rows[0]["probe_id"] == pid
        top = min(rows, key=lambda r: r["rank"])
        assert top["vec_id"] == pid
        # distances non-decreasing with rank
        ds = [r["distance"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ds == sorted(ds)


def test_partitioned_topk_matches_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").repartition(8)
    probes = self_probes(e, 3)
    a = knn(e, probes, k=7, strategy="window").select("probe_id", "vec_id", "rank")
    b = knn(e, probes, k=7, strategy="partitioned").select("probe_id", "vec_id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_euclidean_manual(spark):
    df = spark.createDataFrame(
        [([0.0, 3.0], [4.0, 0.0])], "a: array<double>, b: array<double>"
    )
    r = df.select(V.euclidean_distance("a", "b").alias("d")).first()
    assert abs(r["d"] - 5.0) < 1e-12


def test_normalize_unit_norm(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    r = e.select(V.l2_norm(V.l2_normalize("embedding")).alias("n")).agg(
        F.min("n").alias("lo"), F.max("n").alias("hi")
    ).first()
    assert abs(r["lo"] - 1.0) < 1e-9 and abs(r["hi"] - 1.0) < 1e-9


def test_prefilter_better_than_postfilter(spark, sf_dir):
    """V7: pre-filtering always yields k rows; the reference's post-filter
    can return fewer (documented semantic improvement)."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = self_probes(e, 1)
    out = knn(e, probes, k=10, pre_filter=F.col("label") == 3).collect()
    n_label3 = e.filter(F.col("label") == 3).count()
    assert len(out) == min(10, n_label3)
    assert all(r["rank"] <= 10 for r in out)


def test_unknown_metric_raises(spark, sf_dir):
    with pytest.raises(ValueError):
        V.distance("manhattan", F.col("a"), F.col("b"))


def test_numpy_strategy_matches_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").repartition(4)
    probes = self_probes(e, 6)
    for metric in ("cosine", "euclidean", "dot"):
        a = knn(e, probes, k=5, metric=metric).select("probe_id", "vec_id", "rank")
        b = knn(e, probes, k=5, metric=metric, strategy="numpy").select(
            "probe_id", "vec_id", "rank"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())), metric


def test_pandas_grouped_agg_udaf_matches_builtin(spark, sf_dir):
    """SURVEY §2.13's UDAF row made concrete: a pandas_udf GROUPED_AGG
    (Arrow-batched user-defined aggregate) computing the per-label median
    embedding norm must equal the builtin exact `percentile(0.5)` — the
    escape hatch exists and agrees with the JVM path."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from fusionspark.functions.vector import l2_norm
    from fusionspark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", l2_norm("embedding", dim=64).alias("nrm")
    )

    from pyspark.sql.functions import PandasUDFType

    # explicit functionType: the file's `from __future__ import annotations`
    # turns type hints into strings, which pandas_udf can't infer from
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return float(v.median())

    via_udaf = {
        r["label"]: round(r["m"], 9)
        for r in emb.groupBy("label").agg(median_udaf("nrm").alias("m")).collect()
    }
    via_builtin = {
        r["label"]: round(r["m"], 9)
        for r in emb.groupBy("label")
        .agg(F.percentile("nrm", F.lit(0.5)).alias("m"))
        .collect()
    }
    assert via_udaf == via_builtin and len(via_udaf) == 10


def test_knn_postfilter_can_return_fewer_than_k(spark, sf_dir):
    """The reference's post-filter contract (HNSWIndex.js:273-301, test
    shape test/fusionpact.test.js:49-66): when a selective filter is
    applied AFTER the ef-candidate cut, the result may hold FEWER than
    topK rows — unlike knn_filtered's pre-filter form, which always fills
    k.  Build a corpus where only 3 of the top-50 candidates survive the
    filter and assert exactly those 3 come back."""
    from pyspark.sql import Window

    # 100 vectors on a line: vec i = [1, i/100].  Probe = vec 0.  Rare
    # label 1 on ids {7, 23, 61}; everything else label 0.
    rare = {7, 23, 61}
    rows = [(i, [1.0, i / 100.0], 1 if i in rare else 0) for i in range(100)]
    e = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, label: int")
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_embedding")
    )
    scored = e.crossJoin(F.broadcast(probe)).withColumn(
        "sim", V.cosine_similarity(F.col("embedding"), F.col("probe_embedding"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    ef, top_k = 50, 10
    cand = scored.withColumn("rnk_ef", F.row_number().over(w)).filter(F.col("rnk_ef") <= ef)
    got = (
        cand.filter(F.col("label") == 1)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .collect()
    )
    # candidates are the 50 ids nearest vec 0 (ids 0..49); only 7 and 23
    # carry the rare label inside that pool — 61 is outside ef and is
    # correctly NOT recalled (the reference's documented recall loss).
    assert sorted(r["vec_id"] for r in got) == [7, 23]
    assert len(got) < top_k
