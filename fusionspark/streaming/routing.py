"""M5 streaming-native message delivery.

Reference: /root/reference/src/orchestration/AgentOrchestrator.js:143-174
(`send`: broadcast `to='*'` fans out to every registered agent except the
sender, else direct delivery; task/result/knowledge messages are
auto-remembered in the sender's episodic memory, importance 0.7 for
`result` else 0.5) and :289-302 (`_deliver` appends to per-agent queues).

Spark re-expression: the routing is a PLAN, not a handler loop —
broadcast fan-out is a broadcast join against the (tiny) agent registry,
direct delivery a pass-through, and the delivery job a Structured
Streaming `foreachBatch` sink that appends deliveries partitioned by
recipient (each agent's queue = its partition directory — a reader lists
one directory, never scans the log) plus embedded auto-remember rows to
the episodic memory collection.  Exactly-once per micro-batch via the
checkpoint; every transform is stream-static so the batch oracle and the
streaming job share one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: message types worth remembering (AgentOrchestrator.js:163)
SIGNIFICANT_TYPES = ("task", "result", "knowledge")

#: recipient for malformed (NULL-addressee) messages — they must surface in
#: the delivery log, not vanish through three-valued logic (a bare
#: `to_agent != '*'` filter silently drops NULL rows from BOTH branches)
DEAD_LETTER = "__dead_letter__"


def route_messages(messages: DataFrame, agents: DataFrame) -> DataFrame:
    """One delivery row per recipient: `to_agent='*'` broadcasts to every
    registered agent except the sender; anything else delivers directly.
    A NULL `to_agent` routes to the DEAD_LETTER recipient so malformed
    events stay observable in the log.  The registry side is broadcast (it
    is small by construction — it's the set of registered agents), so
    fan-out never shuffles the message stream."""
    is_broadcast = F.col("to_agent").eqNullSafe("*")
    recipients = F.broadcast(agents.select(F.col("agent_id").alias("recipient")))
    fanned = messages.filter(is_broadcast).join(
        recipients, F.col("recipient") != F.col("from_agent")
    )
    direct = messages.filter(~is_broadcast).withColumn(
        "recipient", F.coalesce(F.col("to_agent"), F.lit(DEAD_LETTER))
    )
    return direct.unionByName(fanned)


def significant_messages(messages: DataFrame) -> DataFrame:
    """Auto-remember rows (AgentOrchestrator.js:163-171): sender-owned
    episodic entries with the reference's content shape and importance."""
    return messages.filter(F.col("type").isin(*SIGNIFICANT_TYPES)).select(
        F.concat(F.lit("mem_"), F.col("msg_id").cast("string")).alias("id"),
        F.concat(
            F.lit("Sent "), F.col("type"), F.lit(" to "), F.col("to_agent"),
            F.lit(": "), F.substring(F.col("payload"), 1, 500),
        ).alias("content"),
        F.col("from_agent").alias("tenant_id"),
        F.when(F.col("type") == "result", F.lit(0.7)).otherwise(F.lit(0.5)).alias("importance"),
        F.create_map(
            F.lit("messageType"), F.col("type"),
            F.lit("to"), F.col("to_agent"),
        ).alias("metadata"),
        F.col("ts"),
    )


def deliver_messages_stream(
    messages_stream: DataFrame,
    agents: DataFrame,
    deliveries_path: str,
    checkpoint_path: str,
    memory_path: str | None = None,
    dimensions: int = 64,
):
    """The delivery job: per micro-batch, route (broadcast fan-out) and
    append deliveries partitioned by recipient; significant messages are
    embedded (distinct-text Arrow batch, like engine.ingest) and appended
    to the episodic memory collection in the engine row schema.  Returns
    the StreamingQuery (caller picks the trigger via .awaitTermination /
    the stream is started with availableNow semantics left to the caller's
    test or a long-lived trigger in production)."""
    from fusionspark.operators.embedder import embed_texts

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        routed = route_messages(batch_df, agents)
        (
            routed.select("msg_id", "from_agent", "recipient", "type", "payload", "ts")
            .repartition("recipient")
            .write.mode("append")
            .partitionBy("recipient")
            .parquet(deliveries_path)
        )
        if memory_path is not None:
            mem = significant_messages(batch_df)
            emb = embed_texts(mem, "content", dimensions)
            rows = mem.join(
                F.broadcast(emb), mem["content"] == emb["text"], "left"
            ).select(
                F.col("id"),
                F.col("embedding").cast("array<float>").alias("vector"),
                F.col("content"),
                F.col("metadata"),
                F.col("tenant_id"),
                F.unix_millis(F.col("ts")).alias("ts"),
                F.lit(0).cast("long").alias("ttl_ms"),
            )
            rows.write.mode("append").parquet(memory_path)

    return (
        messages_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
