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
# to the FRONT of the registry.  Round 15 rotation (VERDICT r14 #1): the
# r14 board landed 50/50 green (CORRECTNESS_r14, zero red — fourth
# consecutive zero-red round).  This board is the PROGRESS.md r15 handoff
# verbatim, priority order never-attested > code-changed re-attests >
# staleness refresh: the 18 r14 additions (17 eval queries +
# delta_time_travel — the whole never-attested queue), the 16 rows whose
# code changed in the r14 round6/ranking sweeps that are not refreshed
# elsewhere, and the 16 remaining r5-stale rows.  The whole board is
# pre-certified at the r14 final HEAD: every row except delta_time_travel
# is inside the definitive 455-era full strict runs at BOTH sf0.01 and
# sf0.1, and delta_time_travel was gated strict ×3 SFs on landing
# (PROGRESS.md r14 certification); the r15 closing gate re-runs the full
# board at this round's final HEAD.  Queries not listed keep their valid
# attestations.
PRIORITY: list[str] = [
    # the 18 r14 additions (never attested; queue order = registration)
    "cluster_contingency", "cluster_ari", "cluster_purity",
    "fowlkes_mallows", "cluster_nmi", "cluster_vmeasure",
    "calinski_harabasz", "davies_bouldin", "dunn_centroid",
    "silhouette_simplified", "pr_auc", "score_ks", "mcc_binary",
    "lift_gains", "brier_decomposition", "mrr_multi", "map_at10",
    "delta_time_travel",
    # 16 code-changed re-attests (r14 round6_stable sweep + ranking
    # div/materialization) not refreshed by the r14 board or the r5 slice
    "systematic_sample", "range_bounds_plan", "neardup_containment",
    "neardup_prefix", "split_leakage", "conversion_latency",
    "user_retention", "png_features", "image_features", "jpeg_features",
    "video_frames", "bmp_features", "gif_features", "gif_interlaced",
    "png_interlaced", "qoi_features",
    # 16 remaining r5-stale rows (registry order; includes the two
    # r14-code-changed rows neardup_ngram_lsh / dedup_incremental)
    "neardup_embedding", "neardup_ngram_lsh", "neardup_embedding_ivf",
    "dedup_clusters", "c4_filter", "hash_sample", "pack_sequences",
    "pii_redact", "repetition_stats", "vocab_coverage", "domain_mix",
    "contamination_check", "dedup_incremental", "messages_significant",
    "message_deliveries", "merge_candidates",
]



# Queries whose BACKING CODE changed since their latest attestation and
# that are NOT already on the current PRIORITY board — the middle tier of
# the board-priority order (never-attested > code-changed > stalest).
# Maintained BY HAND at each round's close (git knows what changed; no
# tool can); consumed by tools/board_plan.py so its recommendation equals
# the committed handoff instead of drifting by this tier.  r15 close-out:
# EMPTY — every r15 code change backs either a row ON the r15 board
# (delta.py/dv.py → delta_time_travel; the mrr_multi/map_at10 oracle @10
# cutoff) or a query registered this round (the 7 mid-round additions,
# which queue as the r16 never-attested tier), so no off-board attested
# row's code changed.  engine.py's attach-freshness change touches no
# registry query (pytest-covered).
CODE_CHANGED_NEXT: list[str] = []


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
