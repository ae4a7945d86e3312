"""Multi-agent orchestration operators (SURVEY §2.6 A3/A14, §2.8 E3/E5,
§2.11 M5-M8).

Reference: /root/reference/src/orchestration/AgentOrchestrator.js.
The `agents` registry is tiny → always broadcast; `messages` is an append
log partitioned by date at scale, aggregated with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orchestrator_stats(agents: DataFrame, messages: DataFrame) -> DataFrame:
    """A3: per-agent sent/received message counts joined onto the registry
    (AgentOrchestrator.js:274-286).  Aggregate first (shuffle carries one row
    per agent), then broadcast-join the 5-row registry."""
    sent = messages.groupBy(F.col("from_agent").alias("agent_id")).agg(
        F.count("*").alias("sent")
    )
    received = messages.filter(F.col("to_agent") != "*").groupBy(
        F.col("to_agent").alias("agent_id")
    ).agg(F.count("*").alias("received"))
    return (
        agents
        .join(F.broadcast(sent), "agent_id", "left")
        .join(F.broadcast(received), "agent_id", "left")
        .select(
            "agent_id",
            "name",
            F.coalesce("sent", F.lit(0)).alias("sent"),
            F.coalesce("received", F.lit(0)).alias("received"),
        )
    )


def capability_rank(agents: DataFrame, required: list[str]) -> DataFrame:
    """A14/E3: rank agents by |required ∩ capabilities|
    (AgentOrchestrator.js:305-323).  `delegate` (M6) = rank 1."""
    req = F.array(*[F.lit(c) for c in required])
    return (
        agents.withColumn("score", F.size(F.array_intersect("capabilities", req)))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("agent_id").asc())
        .select("agent_id", "name", "score")
    )


def broadcast_targets(agents: DataFrame, sender: str) -> DataFrame:
    """E5: broadcast = every agent except the sender
    (AgentOrchestrator.js:152-158)."""
    return agents.filter(F.col("agent_id") != sender).select("agent_id", "name")
