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
# to the FRONT of the registry.  Round 11 rotation (VERDICT r10 #2): the
# r10 board was fully drained (49 green + 1 red in CORRECTNESS_r10), so
# this board fronts, in order:
#   (a) the 34 entries never driver-attested — the r10 session additions
#       (PROGRESS.md r11 handoff queue; all local-green ×3 SFs AND
#       bit-identical in the judge's strict Spark↔DuckDB scan);
#   (b) weighted_sample — r10's one RED row, now fixed: the emitted
#       sample_key carries `+ 0.0` in BOTH engines so a tiny negative
#       raw key can no longer round to +0.0 (Spark BigDecimal HALF_UP)
#       vs -0.0 (DuckDB binary round) — numerically equal, hash
#       different (doc 269 at sf0.01 was the witness, rank #1 every
#       run).  weighted_sample_grouped shares the key family and the
#       fix, and sits in (a);
#   (c) r11 code-changed re-attests: knn_postfilter (ef now
#       max(EF_SEARCH, TOP_K) per the reference contract — identical
#       output at TOP_K=10, ADVICE r10), ann_ivf_filtered (its
#       dependency ivf_search_persisted gained a strategy-honoring
#       warning on the auto-route, ADVICE r10), and gif_features
#       (gif_decode gained the interlace de-permutation branch — the
#       non-interlaced path is untouched; re-gated strict ×3 SFs), plus
#       png_features / png_resize / phash_neardup (png_encode/png_decode
#       gained the Adam7 paths; sequential output byte-identical, all
#       re-gated strict ×3 SFs — also r6/r7-stale, so this doubles as
#       refresh);
#   (d) oldest-attested-first refresh: the 6 remaining r2 rows and the
#       3 oldest r4 rows (7 rounds stale), in attestation order.  The
#       next-stalest r4 rows (html_sections, node_summaries, title_detect
#       …) lead the r12 refresh.
# Queries not listed keep their valid attestations; queries ADDED during
# r11 sessions go AFTER this board (they are the r12 queue).
PRIORITY: list[str] = [
    # ── (a) the 34 never-attested r10 additions ──
    "spearman_corr", "kendall_tau_daily", "ks_two_sample",
    "mann_kendall", "runs_test", "cramers_v", "ewma_control",
    "shuffle_skew_report", "compaction_plan", "exif_metadata",
    "mime_sniff", "robots_rules", "isotonic_calibration",
    "entity_resolution", "weighted_sample_grouped", "dp_counts",
    "kn_perplexity", "luhn_check", "feature_mi", "burrows_delta",
    "matrix_profile_daily", "ar2_fit", "csv_parse", "sitemap_parse",
    "anomaly_shesd", "hashing_collisions", "welch_bh",
    "poisson_rate_test", "cuped_adjustment", "simpson_diversity",
    "sprt_monitor", "hill_tail_index", "mad_by_type", "theil_index",
    # ── (b) the fixed r10 red row ──
    "weighted_sample",
    # ── (c) r11 code-changed re-attests ──
    "knn_postfilter", "ann_ivf_filtered", "gif_features",
    "png_features", "png_resize", "phash_neardup",
    # ── (d) staleness refresh: the 6 remaining r2 rows ──
    "point_lookup", "collection_stats", "delete_by_id", "filter_eq",
    "filter_in", "knn_filtered",
    # ── (d) staleness refresh: the 3 oldest r4 rows ──
    "adaptive_weights", "hybrid_adaptive", "triples_extract",
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
