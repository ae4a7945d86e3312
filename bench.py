"""Benchmark harness — runs the headline operator suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Comparison target (BASELINE.md): the reference's single-node HNSW bench —
batch k-NN throughput is the comparable number at this scale, plus the
relational/text/dedup operators the reference executes as in-memory JS loops.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fusionspark.session import get_spark  # noqa: E402
from fusionspark.io import load_table  # noqa: E402
from fusionspark.operators.knn import knn, self_probes  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PROBES_BENCH = 64


def bench_queries(spark):
    """name → zero-arg callable returning a DataFrame to materialize."""
    from fusionspark.queries import REGISTRY, load_all

    load_all()

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()  # warm the cache before timing

    def knn_batch():
        # numpy strategy: Arrow-batched float64 GEMM + partition-local top-k
        return knn(emb, self_probes(emb, N_PROBES_BENCH), k=10, strategy="numpy")

    def knn_batch_1k():
        # BASELINE-comparable batch throughput: 1000 probes, exact top-10
        # (reference bench: 1000 random queries over the corpus, cli.js:81-90)
        return knn(emb, self_probes(emb, 1000), k=10, strategy="numpy")

    def ingest_100k():
        # BASELINE-comparable ingest: 100k 64-d vectors → parquet
        # (reference: 100k HNSW inserts in 2.8s, README.md:435).  Vectors are
        # synthesized distributively; the write is the measured work.
        import shutil
        import tempfile

        from pyspark.sql import functions as FF

        out = tempfile.mkdtemp(prefix="fusionspark-ingest-")
        df = spark.range(100_000).select(
            FF.col("id").alias("vec_id"),
            FF.transform(
                FF.sequence(FF.lit(1), FF.lit(64)),
                lambda i: FF.sin(FF.col("id") * i).cast("float"),
            ).alias("embedding"),
        )
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        shutil.rmtree(out, ignore_errors=True)
        return spark.range(n).limit(1)

    picks = [
        "knn_cosine",
        "knn_filtered",
        "ann_ivf",
        "keyword_search",
        "rrf_fusion",
        "context_pack",
        "adaptive_weights",
        "consolidation_decay",
        "merge_candidates",
        "conversation_tail",
        "stream_tumbling",
        "stream_session",
        "dedup_exact",
        "dedup_minhash",
        "simhash_values",
        "lang_id",
        "token_counts",
        "doc_fingerprint",
        "tree_parents",
        "triples_extract",
        "chunks_recursive",
        "mock_embeddings",
        "tpch_pricing_summary",
        "tpch_top_customers",
        "rollup_orders",
        "stream_sliding",
        "searchall_quota",
    ]
    out = {
        "knn_batch64": knn_batch,
        "knn_batch1000": knn_batch_1k,
        "ingest_100k": ingest_100k,
    }
    for name in picks:
        fn, _sql = REGISTRY[name]
        out[name] = (lambda f=fn: f(spark, SF_DIR))
    return out


def main() -> None:
    spark = get_spark("fusionspark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench_queries(spark)

    # JVM/codegen warmup on a tiny query (not timed)
    load_table(spark, SF_DIR, "region").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, make in qs.items():
        t0 = time.time()
        df = make()
        n = len(df.collect())
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "fusionspark_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
