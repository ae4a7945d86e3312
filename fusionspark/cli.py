"""CLI front door — mirrors the reference's bin/cli.js surface
(demo / serve / bench / help) over the Spark engine.

    python -m fusionspark.cli demo
    python -m fusionspark.cli serve --port 8080
    python -m fusionspark.cli bench --count 5000
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

BANNER = "fusionspark — PySpark-native retrieval engine (reference parity: fusionpact-vectordb)"


def _engine(root: str | None = None):
    from fusionspark.engine import FusionSparkEngine
    from fusionspark.session import get_spark

    spark = get_spark("fusionspark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return FusionSparkEngine(spark, root or tempfile.mkdtemp(prefix="fusionspark-cli-"))


def demo() -> None:
    """bin/cli.js:15-63: vector search → RAG → memory → multi-tenancy."""
    print(BANNER)
    from fusionspark.engine import CollectionConfig

    eng = _engine()

    print("--- 1. Vector search ---")
    eng.create_collection("demo", CollectionConfig(dimensions=64))
    docs = [
        ("d1", "chemical hazard communication requires safety data sheets"),
        ("d2", "protective equipment must be provided to employees"),
        ("d3", "quarterly revenue increased driven by cloud services growth"),
        ("d4", "confined space entry requires atmospheric testing"),
    ]
    eng.insert("demo", [{"id": i, "content": t} for i, t in docs])
    for r in eng.search("demo", query_text="chemical safety requirements", top_k=3):
        print(f"  [{r['score']:.3f}] {r['id']}")

    print("--- 2. RAG pipeline ---")
    n = eng.ingest("rag", "manual", "All employees must complete safety orientation. " * 20)
    ctx = eng.build_context("rag", "safety orientation requirements")
    print(f"  ingested {n} chunks; context uses {len(ctx['chunks'])} chunks")

    print("--- 3. Agent memory ---")
    eng.remember("agent-1", "user prefers detailed safety reports", importance=0.8)
    hits = eng.recall("agent-1", "safety reports")
    print(f"  recalled {len(hits)} memories")

    print("--- 4. Multi-tenancy ---")
    eng.create_collection("shared", CollectionConfig(dimensions=64))
    eng.insert("shared", [{"id": "a1", "content": "acme data"}], tenant_id="acme")
    eng.insert("shared", [{"id": "b1", "content": "globex data"}], tenant_id="globex")
    a = eng.search("shared", query_text="data", tenant_id="acme", top_k=5)
    print(f"  acme sees {len(a)} of 2 rows (tenant isolation)")
    print("demo complete")


def serve_cmd(port: int) -> None:
    from fusionspark.server import serve

    print(BANNER)
    server = serve(_engine(), port=port)
    print(f"listening on http://127.0.0.1:{port}  (GET /api/health, /mcp/tools)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def mcp_cmd() -> None:
    """bin/cli.js `mcp`: speak MCP (JSON-RPC over stdio) for Claude-Desktop
    -style clients.  All diagnostics go to stderr — stdout is the wire."""
    from fusionspark.server import mcp_stdio

    print(BANNER, file=sys.stderr)
    mcp_stdio(_engine())


def bench_cmd(count: int) -> None:
    """bin/cli.js:92-100: insert + 1000-query search timing."""
    from pyspark.sql import functions as F

    from fusionspark.operators.knn import knn, self_probes
    from fusionspark.session import get_spark

    print(BANNER)
    print(f"benchmarking {count} vectors (64D)...")
    spark = get_spark("fusionspark-cli-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="fusionspark-bench-")
    t0 = time.time()
    df = spark.range(count).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)), lambda i: F.sin(F.col("id") * i).cast("float")
        ).alias("embedding"),
    )
    df.write.mode("overwrite").parquet(out)
    insert_ms = (time.time() - t0) * 1000
    corpus = spark.read.parquet(out).cache()
    corpus.count()
    q_n = 1000
    t0 = time.time()
    knn(corpus, self_probes(corpus, q_n), k=10, strategy="numpy").count()
    search_ms = (time.time() - t0) * 1000
    print(f"insert: {insert_ms:.0f}ms ({insert_ms / count:.3f}ms/vec)")
    print(f"search: {search_ms:.0f}ms ({search_ms / q_n:.3f}ms/query)")
    print(f"qps:    ~{round(q_n / (search_ms / 1000))}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fusionspark", description=BANNER)
    sub = p.add_subparsers(dest="cmd")
    sub.add_parser("demo", help="run the end-to-end demo")
    sp = sub.add_parser("serve", help="start the HTTP + tool server")
    sp.add_argument("--port", type=int, default=8080)
    sub.add_parser("mcp", help="MCP server over stdio (for MCP clients)")
    bp = sub.add_parser("bench", help="quick insert/search benchmark")
    bp.add_argument("--count", type=int, default=5000)
    args = p.parse_args(argv)
    if args.cmd == "demo":
        demo()
    elif args.cmd == "serve":
        serve_cmd(args.port)
    elif args.cmd == "mcp":
        mcp_cmd()
    elif args.cmd == "bench":
        bench_cmd(args.count)
    else:
        p.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
