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
# to the FRONT of the registry.  Round 14 rotation (VERDICT r13 #1): the
# r13 board landed 50/50 green (CORRECTNESS_r13, zero red — third
# consecutive zero-red round).  This board is the PROGRESS.md r14 handoff
# verbatim, priority order never-attested > code-changed re-attests >
# staleness refresh: the 17 r13 inference additions (the whole
# never-attested queue), the 16 rows whose code changed in the r13
# float-parity sweep / window burn-down that are not refreshed elsewhere,
# and the 17 oldest r5-stale rows.  The whole board is pre-certified at
# the r13 final HEAD: every row is inside the definitive 437/0/0 strict
# runs at BOTH sf0.01 and sf0.1 (PROGRESS.md r13 certification); the r14
# closing gate re-runs the full board at this round's final HEAD.
# Queries not listed keep their valid attestations.
PRIORITY: list[str] = [
    # the 17 r13 additions (never attested; queue order = registration)
    "ordinal_association", "jonckheere_terpstra", "wilcoxon_signed_rank",
    "cliffs_delta", "cochran_armitage", "mantel_haenszel",
    "bartlett_test", "theil_u", "cvm_two_sample", "kpss_test",
    "permutation_entropy", "bowker_symmetry", "graph_assortativity",
    "embedding_dim_stats", "morans_i", "pass_at_k", "ece_calibration",
    # 16 code-changed re-attests (r13 float-parity sweep + window
    # burn-down) not already refreshed by the r13 board or the r5 slice
    "corpus_clean", "quality_percentile", "adaptive_weights",
    "tpch_local_supplier_volume", "tpch_promo_revenue",
    "tpch_disjunctive_revenue", "tpch_nation_volume",
    "tpch_product_profit", "tpch_top_supplier", "tpch_forecast_revenue",
    "tpch_market_share", "nb_calibration", "curriculum_shards",
    "ccnet_buckets", "psi_drift", "conformal_interval",
    # 17 oldest r5-stale rows (registry order; includes the two
    # code-changed r5 rows tpch_returned_items / tpch_small_qty_revenue)
    "tokenize_stats", "keyword_search", "keyword_index_search",
    "keyword_overlap", "context_pack", "quality_estimate",
    "md_sections", "tree_parents", "tree_leaves", "citation_paths",
    "html_strip", "tree_reasoning_search", "tpch_returned_items",
    "tpch_small_qty_revenue", "tpch_large_orders", "dedup_minhash",
    "neardup_ngram",
]



# Queries whose BACKING CODE changed since their latest attestation and
# that are NOT already on the current PRIORITY board — the middle tier of
# the board-priority order (never-attested > code-changed > stalest).
# Maintained BY HAND at each round's close (git knows what changed; no
# tool can); consumed by tools/board_plan.py so its recommendation equals
# the committed handoff instead of drifting by this tier.  r14 close-out:
# the round6_stable sweep (similarity/pixel-mean/retention/percentile
# sites), the ranked-primitive div + materialization changes, and the
# range_bounds_plan guard.  All strict-green ×3 SFs at the r14 final HEAD.
CODE_CHANGED_NEXT: list[str] = [
    "systematic_sample", "range_bounds_plan", "neardup_containment",
    "neardup_prefix", "split_leakage", "conversion_latency",
    "user_retention", "png_features", "image_features", "jpeg_features",
    "video_frames", "bmp_features", "gif_features", "gif_interlaced",
    "png_interlaced", "qoi_features",
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
        eval_queries,
        inference_queries,
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
