"""Learning-layer operators (SURVEY §2.6 A1/A6-A9/A15, §2.9 X12).

Reference: /root/reference/src/retrieval/HybridRetriever.js:263-303
(adaptive weights) and /root/reference/src/learning/RecursiveLearningEngine.js
(skills, reflection, EMA).

Everything is expressed as grouped aggregates + windows: partial aggregation
happens map-side, the shuffle carries one row per (pattern, strategy) /
(skill) — cardinality of the model, not of the feedback log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions.text import query_pattern

#: Default strategy weights (HybridRetriever.js:72-77).
DEFAULT_WEIGHTS = {"vector": 0.4, "tree": 0.4, "keyword": 0.2}
#: Feedback ring buffer size per (pattern, strategy) (HybridRetriever.js:271-272).
FEEDBACK_RING = 100
#: Skill-outcome EMA step (RecursiveLearningEngine.js:479).
EMA_ALPHA = 0.3


def adaptive_weights(feedback: DataFrame, quality_scale: int | None = None) -> DataFrame:
    """A1: per-(pattern, strategy) mean quality over the last FEEDBACK_RING
    scores, normalized to sum 1 within the pattern
    (HybridRetriever.js:263-303).

    Ring buffer = keep newest 100 per key (W2), stable order (ts, fb_id).

    quality_scale: when quality values are k/scale rationals (the fixture's
    centi-scores), pass the scale to average EXACTLY — sum the recovered
    integers and divide once.  A float AVG's partial-aggregation fold order
    is partitioning-dependent, and a mean like 9/128 sits precisely on a
    ROUND half-way boundary where one ulp of fold drift flips the 6th
    decimal against an exact-arithmetic oracle (observed at sf0.1)."""
    ring = Window.partitionBy("pattern", "strategy").orderBy(
        F.col("ts").desc(), F.col("fb_id").desc()
    )
    norm = Window.partitionBy("pattern")
    base = (
        feedback.withColumn("pattern", query_pattern("query"))
        .withColumn("rn", F.row_number().over(ring))
        .filter(F.col("rn") <= FEEDBACK_RING)
        .groupBy("pattern", "strategy")
    )
    if quality_scale:
        # r13 hardening: the weight denominator SUM(avg_quality) OVER the
        # pattern is a sum of DOUBLES whose fold order is engine- and
        # partitioning-dependent — one ulp of drift lands weight = 25/128
        # on the round boundary (observed strict-fail at sf0.1).  Quantize
        # the exact mean to micro-units FIRST (a6 = half-up of
        # sum(int)*10^6/scale/count — pure IEEE ops on <= 2^53 ints), so
        # the normalizing window sums exact BIGINTs in ANY order and the
        # weight is ONE division of identical doubles.
        qk = F.round(F.col("quality") * quality_scale).cast("long")
        if 1_000_000 % int(quality_scale) != 0:
            # ADVICE r13: a non-divisor scale would silently truncate mult
            # and quantize the mean wrong (scale=3 -> 333333).  Every
            # current caller uses a power-of-10 scale; fail loudly if not.
            raise ValueError(
                f"quality_scale={quality_scale} must divide 1_000_000 for "
                "the exact micro-unit quantization"
            )
        mult = 1_000_000 // int(quality_scale)
        a6 = F.floor(
            (F.sum(qk) * mult).cast("double") / F.count(F.lit(1)) + 0.5
        ).cast("long")
        g = base.agg(a6.alias("a6"))
        return g.select(
            "pattern",
            "strategy",
            (F.col("a6").cast("double") / 1000000.0).alias("avg_quality"),
            (F.col("a6").cast("double") / F.sum("a6").over(norm)).alias(
                "weight"
            ),
        )
    g = base.agg(F.avg("quality").alias("avg_quality"))
    return g.withColumn(
        "weight", F.col("avg_quality") / F.sum("avg_quality").over(norm)
    )


def skill_outcome_ema(
    feedback: DataFrame,
    initial_rate: float = 1.0,
    last_n: int = 20,
    success_threshold: float = 0.5,
) -> DataFrame:
    """A9/W5: successRate after folding the last N outcomes per strategy with
    rate ← α·outcome + (1-α)·rate (RecursiveLearningEngine.js:472-482).

    Closed form over the ordered tail (o_1 oldest … o_n newest):
        rate_n = (1-α)^n · rate_0 + Σ_i α·(1-α)^(n-i)·o_i
    A window + pow expression — no iterative loop, no UDF.
    """
    tail = Window.partitionBy("strategy").orderBy(F.col("ts").desc(), F.col("fb_id").desc())
    ordered = (
        feedback.withColumn("rn_desc", F.row_number().over(tail))
        .filter(F.col("rn_desc") <= last_n)
        .withColumn("outcome", (F.col("quality") > success_threshold).cast("double"))
    )
    n = Window.partitionBy("strategy")
    contrib = (
        F.lit(EMA_ALPHA)
        * F.pow(F.lit(1 - EMA_ALPHA), F.col("rn_desc") - 1)
        * F.col("outcome")
    )
    return (
        ordered.withColumn("n_outcomes", F.count("*").over(n))
        .groupBy("strategy")
        .agg(
            F.count("*").alias("n_outcomes"),
            (
                F.sum(contrib)
                + F.pow(F.lit(1 - EMA_ALPHA), F.max("rn_desc")) * F.lit(initial_rate)
            ).alias("success_rate"),
        )
    )


def find_applicable_skills(skills: DataFrame, context: str) -> DataFrame:
    """A15: matchScore = |trigger keywords contained in context| / |keywords|,
    keep matchCount > 0, rank by successRate·matchScore desc
    (RecursiveLearningEngine.js:442-464)."""
    ctx = F.lit(context.lower())
    hits = F.aggregate(
        F.col("trigger_keywords"),
        F.lit(0),
        lambda acc, kw: acc + F.when(ctx.contains(F.lower(kw)), 1).otherwise(0),
    )
    return (
        skills.withColumn("match_count", hits)
        .filter(F.col("match_count") > 0)
        .withColumn(
            "match_score", F.col("match_count").cast("double") / F.size("trigger_keywords")
        )
        .withColumn("rank_key", F.col("success_rate") * F.col("match_score"))
        .orderBy(F.col("rank_key").desc(), F.col("skill_id").asc())
    )


def reflection_context(feedback: DataFrame, last_n: int = 20, fail_threshold: float = 0.3) -> DataFrame:
    """A7: per-agent avg quality over the last N feedback rows + failed-query
    list (RecursiveLearningEngine.js:596-613)."""
    w = Window.partitionBy("agent_id").orderBy(F.col("ts").desc(), F.col("fb_id").desc())
    return (
        feedback.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= last_n)
        .groupBy("agent_id")
        .agg(
            F.count("*").alias("n_feedback"),
            F.avg("quality").alias("avg_quality"),
            F.sort_array(
                F.collect_list(F.when(F.col("quality") < fail_threshold, F.col("query")))
            ).alias("failed_queries"),
        )
    )


def graph_summary(triples: DataFrame) -> DataFrame:
    """A8: distinct entities (subjects ∪ objects) + triple count
    (RecursiveLearningEngine.js:574-584)."""
    entities = (
        triples.select(F.col("subject").alias("e"))
        .union(triples.select(F.col("object").alias("e")))
        .distinct()
    )
    return triples.agg(F.count("*").alias("n_triples")).crossJoin(
        entities.agg(F.count("*").alias("n_entities"))
    )


def adjust_strategy_weights(feedback: DataFrame, ring: int | None = None) -> DataFrame:
    """A13: per-pattern incremental weight adjustment
    (RecursiveLearningEngine.js:747-770) — an order-dependent fold
    (clamp + renormalize after EVERY feedback), so it runs as
    applyInPandas over (pattern)-grouped, ts-ordered feedback.

    Returns one row per pattern with the final (vector, tree, keyword)
    weights.  Grouping keys shard the fold across executors; each group's
    history is small (ring-buffered upstream), so state stays bounded.
    ring=N applies that bound here too: only the LAST N feedback rows per
    pattern (by ts, fb_id) enter the fold — the reference's bounded
    history — which also keeps the recursive-CTE oracle's iteration count
    SF-independent.
    """
    import pandas as pd

    fb = feedback.withColumn("pattern", query_pattern("query")).select(
        "pattern", "strategy", "quality", "ts", "fb_id"
    )
    if ring is not None:
        w = Window.partitionBy("pattern").orderBy(
            F.col("ts").desc(), F.col("fb_id").desc()
        )
        fb = (
            fb.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= ring)
            .drop("_rn")
        )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "fb_id"])
        w = {"vector": 0.4, "tree": 0.4, "keyword": 0.2}
        alpha = 0.1
        for strategy, q in zip(pdf["strategy"], pdf["quality"]):
            if q > 0.7:
                if strategy in ("vector", "hybrid"):
                    w["vector"] = min(0.8, w["vector"] + alpha * q)
                if strategy in ("tree", "hybrid"):
                    w["tree"] = min(0.8, w["tree"] + alpha * q)
                if strategy in ("keyword", "hybrid"):
                    w["keyword"] = min(0.5, w["keyword"] + alpha * q * 0.5)
            elif q < 0.3:
                if strategy == "vector":
                    w["vector"] = max(0.1, w["vector"] - alpha)
                elif strategy == "tree":
                    w["tree"] = max(0.1, w["tree"] - alpha)
                elif strategy == "keyword":
                    w["keyword"] = max(0.05, w["keyword"] - alpha)
            total = w["vector"] + w["tree"] + w["keyword"]
            if total > 0:
                w = {k: v / total for k, v in w.items()}
        return pd.DataFrame(
            {
                "pattern": [pdf["pattern"].iloc[0]],
                "w_vector": [w["vector"]],
                "w_tree": [w["tree"]],
                "w_keyword": [w["keyword"]],
                "n_feedback": [len(pdf)],
            }
        )

    return fb.groupBy("pattern").applyInPandas(
        fold,
        schema="pattern string, w_vector double, w_tree double, w_keyword double, n_feedback long",
    )
