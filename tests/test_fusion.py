"""MMR rerank properties (queries/rag_queries.py::mmr_rerank)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mmr_rerank_properties(spark):
    """Rank 1 is the plain cosine argmax, picks are 5 distinct members
    of the top-20 candidate set, and every pick's recorded mmr equals
    0.5·rel − 0.5·(max sim to earlier picks)."""
    from fusionspark.functions import vector as V
    from fusionspark.operators.knn import self_probes, vector_dim
    from fusionspark.queries.rag_queries import mmr_rerank

    sf = "/root/testdata/sf0.001"
    out = mmr_rerank(spark, sf).collect()
    assert [r.rnk for r in out] == [1, 2, 3, 4, 5]
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 5

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    probe = self_probes(e, 1)
    dim = vector_dim(e, "embedding")
    top = (
        e.crossJoin(F.broadcast(probe))
        .withColumn(
            "rel",
            V.cosine_similarity(F.col("embedding"), F.col("probe_embedding"), dim),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(20)
        .select("vec_id", "rel", "embedding")
        .collect()
    )
    top_ids = [r.vec_id for r in top]
    assert set(ids) <= set(top_ids)
    assert ids[0] == top_ids[0]  # first pick = pure relevance argmax
    import numpy as np

    emb = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in top}
    rel = {r.vec_id: r.rel for r in top}

    def cos(a, b):
        va, vb = emb[a], emb[b]
        return float(
            np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        )

    import pytest as _pytest

    for i, r in enumerate(out):
        if i == 0:
            want = 0.5 * rel[r.vec_id]
        else:
            want = 0.5 * rel[r.vec_id] - 0.5 * max(
                cos(r.vec_id, s) for s in ids[:i]
            )
        assert r.mmr == _pytest.approx(want, abs=1e-6)
