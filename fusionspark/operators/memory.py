"""Agent-memory operators (SURVEY §2.6 A2/A4/A10-A12, §2.2 P3/P4/P6/P7,
§2.11 M1-M4) over the `memory` / `conversations` tables.

Reference: /root/reference/src/memory/AgentMemory.js and
/root/reference/src/learning/RecursiveLearningEngine.js:130-243.

Scale notes: `memory` at 100 TB partitions by (agent_id, type) — every
operator below groups or filters on that prefix, so scans prune and
aggregations are partial before the shuffle.  Consolidation
(decay/prune/merge) is a pure column transform + bounded self-join, run as a
periodic MERGE job, not an in-place mutation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fusionspark.functions.text import jaccard, word_set

DECAY_RATE = 0.02        # RecursiveLearningEngine.js:85
PRUNE_THRESHOLD = 0.05   # :86
MERGE_THRESHOLD = 0.85   # :87
MAX_MERGE_SCAN = 200     # :26
MAX_CONVERSATION = 100   # AgentMemory.js:47


def memory_stats(memory: DataFrame) -> DataFrame:
    """A2: counts per (agent, type) (AgentMemory.js:572-590)."""
    return memory.groupBy("agent_id", "type").agg(F.count("*").alias("n"))


def ttl_filter(memory: DataFrame, now: Column) -> DataFrame:
    """P4: keep if ttl_ms == 0 or age < ttl (HNSWIndex.js:295-301 — the
    reference checks lazily at read time; same predicate here, pushed to the
    scan)."""
    age_ms = (now.cast("double") - F.col("ts").cast("double")) * 1000.0
    return memory.filter((F.col("ttl_ms") == 0) | (age_ms < F.col("ttl_ms")))


def acl_filter(memory: DataFrame, agent_id: str) -> DataFrame:
    """P6: shared-memory ACL — visible if allowed_agents empty or contains
    the reader (AgentMemory.js:497-504; the reference stores but never
    enforces this — we enforce it)."""
    return memory.filter(
        (F.size("allowed_agents") == 0) | F.array_contains("allowed_agents", agent_id)
    )


def conversation_tail(conversations: DataFrame, n: int = MAX_CONVERSATION) -> DataFrame:
    """P7/W2/M4: last-N messages per thread, newest first (AgentMemory.js:
    285-311,323-336).  Ordered by (ts, msg_seq) for a stable total order."""
    w = Window.partitionBy("agent_id", "thread_id").orderBy(
        F.col("ts").desc(), F.col("msg_seq").desc()
    )
    return conversations.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def list_conversations(conversations: DataFrame) -> DataFrame:
    """A4: per-thread message count + last timestamp (AgentMemory.js:343-357)."""
    return conversations.groupBy("agent_id", "thread_id").agg(
        F.count("*").alias("message_count"),
        F.max("ts").alias("last_ts"),
    )


def consolidate_importance(memory: DataFrame, now: Column) -> DataFrame:
    """A10: decay + strengthen (RecursiveLearningEngine.js:146-165).

    ageHours     = max(0, (now - ts)/3600000)          [ms → h]
    recencyHours = lastAccessed ? (now-lastAccessed)/3.6e6 : ageHours
    accessBoost  = min(access_count*0.02, 0.3)
    netDecay     = max(0, decayRate*(recency/24) - accessBoost)
    importance  -= netDecay (floor 0);  +0.01 if access_count > 3 (cap 1)

    Applies to episodic/semantic/procedural (not shared), like the reference.
    """
    now_s = now.cast("double")
    age_h = F.greatest(F.lit(0.0), (now_s - F.col("ts").cast("double")) / 3600.0)
    rec_h = F.when(
        F.col("last_accessed").isNotNull(),
        F.greatest(F.lit(0.0), (now_s - F.col("last_accessed").cast("double")) / 3600.0),
    ).otherwise(age_h)
    boost = F.least(F.col("access_count") * 0.02, F.lit(0.3))
    net_decay = F.greatest(F.lit(0.0), F.lit(DECAY_RATE) * (rec_h / 24.0) - boost)
    decayed = F.greatest(F.lit(0.0), F.col("importance") - net_decay)
    strengthened = F.when(
        F.col("access_count") > 3, F.least(F.lit(1.0), decayed + 0.01)
    ).otherwise(decayed)
    applies = F.col("type").isin("episodic", "semantic", "procedural")
    return memory.withColumn(
        "new_importance", F.when(applies, strengthened).otherwise(F.col("importance"))
    )


def prune(memory: DataFrame, importance_col: str = "importance") -> DataFrame:
    """A11: drop entries below the prune threshold
    (RecursiveLearningEngine.js:173-178)."""
    return memory.filter(F.col(importance_col) >= PRUNE_THRESHOLD)


def merge_candidates(memory: DataFrame, threshold: float = MERGE_THRESHOLD) -> DataFrame:
    """A12/K4: similar-memory pairs within (agent, type), bounded to the
    first MAX_MERGE_SCAN entries per group like the reference's scanLimit
    (RecursiveLearningEngine.js:190-243).

    Returns (agent_id, type, mem_a, mem_b, sim, keeper) where keeper is the
    higher-importance member (ties → mem_a, matching the reference's
    `>=`).  The O(scan²) self-join is per-group and capped, so the shuffle
    is bounded regardless of table size; at real scale swap the pair
    generator for MinHashLSH bucketing (operators/dedup.py) and keep the
    same downstream semantics.
    """
    w = Window.partitionBy("agent_id", "type").orderBy("mem_id")
    bounded = (
        memory.filter(F.col("type").isin("episodic", "semantic", "procedural"))
        .withColumn("scan_rn", F.row_number().over(w))
        .filter(F.col("scan_rn") <= MAX_MERGE_SCAN)
        .select("agent_id", "type", "mem_id", "content", "importance",
                word_set("content").alias("words"))
        # persist the tokenized projection: without it Catalyst inlines
        # word_set (an interpreted HOF) into BOTH sides of the self-join and
        # re-tokenizes per PAIR (O(pairs) instead of O(rows) — 14× slower
        # measured).  bounded is ≤ MAX_MERGE_SCAN rows per (agent, type) by
        # construction, so the cache is small everywhere.
        .persist()
    )
    a = bounded.alias("a")
    b = bounded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.agent_id") == F.col("b.agent_id"))
        & (F.col("a.type") == F.col("b.type"))
        & (F.col("a.mem_id") < F.col("b.mem_id")),
    )
    sim = jaccard(F.col("a.words"), F.col("b.words"))
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") > threshold)
        .select(
            F.col("a.agent_id").alias("agent_id"),
            F.col("a.type").alias("type"),
            F.col("a.mem_id").alias("mem_a"),
            F.col("b.mem_id").alias("mem_b"),
            "sim",
            F.when(F.col("a.importance") >= F.col("b.importance"), F.col("a.mem_id"))
            .otherwise(F.col("b.mem_id"))
            .alias("keeper"),
        )
    )


def forget(memory: DataFrame, agent_id: str, mem_type: str | None = None) -> DataFrame:
    """M3: GDPR delete by agent (and optionally type) as the anti-filter
    materialization (AgentMemory.js:530-565); Delta DELETE at scale."""
    cond = F.col("agent_id") == agent_id
    if mem_type is not None:
        cond = cond & (F.col("type") == mem_type)
    return memory.filter(~cond)
