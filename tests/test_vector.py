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
