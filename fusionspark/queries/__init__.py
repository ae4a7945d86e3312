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
# how many it checks per round (the first 50).  Names listed here are moved
# to the FRONT of the registry.  Round 10 rotation (VERDICT r9 #1): the
# r9 board was fully drained (50 first-time rows in CORRECTNESS_r09), so
# this board fronts, in order:
#   (a) the 21 entries never driver-attested — the 6 r9 spills plus the
#       15 added during r9 sessions;
#   (b) the round's code-changed / new entries: geo_neighbors (re-queued
#       by r9's grid_proximity_join d2_max param), weighted_sample (r9's
#       one RED row — the k-boundary now cuts on the ROUNDED key in both
#       engines), compression_ratio (converted rows-only → oracle-backed
#       via a derived content-attested corpus), knn_postfilter (NEW:
#       reference post-filter contract parity), and ann_ivf_filtered /
#       ann_ivf_distributed (ivf_search_persisted/_distributed bodies
#       changed for the auto-routing switch — re-attested at the new
#       code state);
#   (c) oldest-attested-first refresh: all 7 remaining r1 rows and the
#       16 oldest r2 rows (8 rounds stale).
# Queries not listed keep their valid attestations; queries ADDED during
# r10 sessions go AFTER this board (they are the r11 queue).
PRIORITY: list[str] = [
    # ── (a) the 6 r9 spills ──
    "benford_digits", "degree_distribution", "cumulative_users",
    "forecast_backtest", "median_by_type", "l_diversity",
    # ── (a) the 15 r9 session additions ──
    "mp4_video_frames", "lang_id_trained", "hilbert_pruning",
    "hw_forecast", "token_fertility", "ngram_diversity", "mmr_rerank",
    "dbscan_users", "rake_keywords", "anomaly_esd", "line_dedup",
    "diff_in_diff", "propensity_match", "vocab_gini", "pettitt_test",
    # ── (b) r10 code-changed / new ──
    "geo_neighbors", "weighted_sample", "compression_ratio",
    "knn_postfilter", "ann_ivf_filtered", "ann_ivf_distributed",
    # ── (c) staleness refresh: the 7 r1 rows ──
    "token_counts", "memory_stats", "memory_ttl_filter", "memory_acl",
    "tenant_filter", "conversation_threads", "consolidation_decay",
    # ── (c) staleness refresh: the 16 oldest r2 rows ──
    "doc_fingerprint", "ann_ivf", "corpus_clean", "memory_prune",
    "orchestrator_stats", "capability_rank", "broadcast_targets",
    "query_patterns", "skill_ema", "skill_match", "reflection_context",
    "triple_edges", "graph_summary", "knn_euclidean", "knn_dot",
    "vector_normalize",
]



def load_all() -> None:
    """Import every query module (side effect: fills REGISTRY), then move
    PRIORITY names to the front of the registry (see PRIORITY docstring)."""
    from fusionspark.queries import (  # noqa: F401
        analytics_queries,
        cdc_queries,
        clustering_queries,
        composition_queries,
        embedding_queries,
        layout_queries,
        extended_queries,
        mining_queries,
        multimodal_queries,
        pipeline_queries,
        rag_queries,
        relational_queries,
        spectral_queries,
        streaming_queries,
        text_queries,
        tree_queries,
        url_queries,
        vector_queries,
    )

    ordered = [n for n in PRIORITY if n in REGISTRY] + [
        n for n in REGISTRY if n not in PRIORITY
    ]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
