"""Relational / aggregate operator family (SURVEY §2.6 A1-A15, §2.2 P3/P4/
P6/P7, §2.7 W2, §2.8 E3/E5, §2.9 X12) over the derived agent-state fixtures.

Every query pairs a DataFrame-API plan (fusionspark.operators.*) with a
DuckDB oracle that rebuilds the identical fixture from the driver parquet
(fusionspark.fixtures.*_SQL CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fusionspark import fixtures as FX
from fusionspark.functions.text import query_pattern
from fusionspark.operators import learning, memory as mem_ops, orchestration as orch
from fusionspark.queries import query

_NOW = FX.REF_NOW


@query(
    "memory_stats",
    f"WITH {FX.MEMORY_SQL.strip()}\n"
    "SELECT agent_id, type, COUNT(*)::BIGINT AS n FROM memory GROUP BY agent_id, type",
)
def memory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (AgentMemory.js:572-590)."""
    return mem_ops.memory_stats(FX.memory_df(spark, sf_dir))


@query(
    "memory_ttl_filter",
    f"WITH {FX.MEMORY_SQL.strip()}\n"
    f"""
    SELECT mem_id, agent_id, ttl_ms FROM memory
    WHERE ttl_ms = 0
       OR (epoch(TIMESTAMP '{_NOW}') - epoch(ts)) * 1000 < ttl_ms
    """,
)
def memory_ttl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: lazy TTL expiry as a read-time predicate (HNSWIndex.js:295-301)."""
    df = mem_ops.ttl_filter(FX.memory_df(spark, sf_dir), F.to_timestamp(F.lit(_NOW)))
    return df.select("mem_id", "agent_id", "ttl_ms")


@query(
    "memory_acl",
    f"WITH {FX.MEMORY_SQL.strip()}\n"
    """
    SELECT mem_id, agent_id FROM memory
    WHERE type = 'shared'
      AND (len(allowed_agents) = 0 OR list_contains(allowed_agents, 'agent-1'))
    """,
)
def memory_acl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: allowed-agents ACL, enforced (AgentMemory.js:497-504 stores it but
    never checks; we do)."""
    df = FX.memory_df(spark, sf_dir).filter(F.col("type") == "shared")
    return mem_ops.acl_filter(df, "agent-1").select("mem_id", "agent_id")


@query(
    "tenant_filter",
    f"WITH {FX.MEMORY_SQL.strip()}\n"
    "SELECT mem_id, content FROM memory WHERE agent_id = 'agent-2' AND type = 'episodic'",
)
def tenant_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: tenant isolation — memory recall scopes tenant=agentId
    (AgentMemory.js:398-401, HNSWIndex.js:276-281); partition-prunes at scale."""
    return (
        FX.memory_df(spark, sf_dir)
        .filter((F.col("agent_id") == "agent-2") & (F.col("type") == "episodic"))
        .select("mem_id", "content")
    )


@query(
    "conversation_threads",
    f"WITH {FX.CONVERSATIONS_SQL.strip()}\n"
    """
    SELECT agent_id, thread_id, COUNT(*)::BIGINT AS message_count,
           floor(epoch(MAX(ts)))::BIGINT AS last_ts_s
    FROM conversations GROUP BY agent_id, thread_id
    """,
)
def conversation_threads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: listConversations (AgentMemory.js:343-357)."""
    df = mem_ops.list_conversations(FX.conversations_df(spark, sf_dir))
    return df.select(
        "agent_id",
        "thread_id",
        "message_count",
        F.unix_timestamp("last_ts").alias("last_ts_s"),
    )


@query(
    "conversation_tail",
    f"WITH {FX.CONVERSATIONS_SQL.strip()}\n"
    """
    SELECT agent_id, thread_id, msg_seq, role, content,
           ROW_NUMBER() OVER (PARTITION BY agent_id, thread_id
                              ORDER BY ts DESC, msg_seq DESC) AS rn
    FROM conversations
    QUALIFY rn <= 3
    """,
)
def conversation_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/W2/M4: last-N per thread ring buffer (AgentMemory.js:285-311)."""
    df = mem_ops.conversation_tail(FX.conversations_df(spark, sf_dir), n=3)
    return df.select("agent_id", "thread_id", "msg_seq", "role", "content", F.col("rn").cast("long").alias("rn"))


@query(
    "consolidation_decay",
    f"WITH {FX.MEMORY_SQL.strip()},\n"
    f"""
    aug AS (
        SELECT *,
            greatest(0, (epoch(TIMESTAMP '{_NOW}') - epoch(ts)) / 3600.0) AS age_h
        FROM memory
    ),
    rec AS (
        SELECT *,
            CASE WHEN last_accessed IS NOT NULL
                 THEN greatest(0, (epoch(TIMESTAMP '{_NOW}') - epoch(last_accessed)) / 3600.0)
                 ELSE age_h END AS rec_h
        FROM aug
    ),
    dec AS (
        SELECT *,
            greatest(0, importance - greatest(0, 0.02 * (rec_h / 24.0)
                - least(access_count * 0.02, 0.3))) AS decayed
        FROM rec
    )
    SELECT mem_id,
           ROUND(CASE WHEN type IN ('episodic','semantic','procedural')
                      THEN CASE WHEN access_count > 3
                                THEN least(1.0, decayed + 0.01) ELSE decayed END
                      ELSE importance END, 6) AS new_importance
    FROM dec
    """,
)
def consolidation_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: importance decay + strengthen (RecursiveLearningEngine.js:146-165)."""
    df = mem_ops.consolidate_importance(
        FX.memory_df(spark, sf_dir), F.to_timestamp(F.lit(_NOW))
    )
    return df.select("mem_id", F.round("new_importance", 6).alias("new_importance"))


@query(
    "memory_prune",
    f"WITH {FX.MEMORY_SQL.strip()}\n"
    """
    SELECT agent_id, COUNT(*)::BIGINT AS kept FROM memory
    WHERE importance >= 0.05 GROUP BY agent_id
    """,
)
def memory_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: prune below threshold (RecursiveLearningEngine.js:173-178)."""
    return (
        mem_ops.prune(FX.memory_df(spark, sf_dir))
        .groupBy("agent_id")
        .agg(F.count("*").alias("kept"))
    )


@query(
    "merge_candidates",
    f"WITH {FX.MEMORY_SQL.strip()},\n"
    f"""
    bounded AS (
        SELECT agent_id, type, mem_id, importance,
               list_distinct(list_filter(string_split(lower(content), ' '), x -> x <> '')) AS words,
               ROW_NUMBER() OVER (PARTITION BY agent_id, type ORDER BY mem_id) AS scan_rn
        FROM memory
        WHERE type IN ('episodic','semantic','procedural')
        QUALIFY scan_rn <= {mem_ops.MAX_MERGE_SCAN}
    ),
    pairs AS (
        SELECT a.agent_id, a.type, a.mem_id AS mem_a, b.mem_id AS mem_b,
               CASE WHEN len(list_distinct(list_concat(a.words, b.words))) > 0
                    THEN len(list_intersect(a.words, b.words))::DOUBLE
                         / len(list_distinct(list_concat(a.words, b.words)))
                    ELSE 0.0 END AS sim,
               CASE WHEN a.importance >= b.importance THEN a.mem_id ELSE b.mem_id END AS keeper
        FROM bounded a JOIN bounded b
          ON a.agent_id = b.agent_id AND a.type = b.type AND a.mem_id < b.mem_id
    )
    SELECT agent_id, type, mem_a, mem_b, ROUND(sim, 6) AS sim, keeper
    FROM pairs WHERE sim > {mem_ops.MERGE_THRESHOLD}
    """,
)
def merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/K4: similar-memory merge pairs via bounded pairwise Jaccard
    (RecursiveLearningEngine.js:190-243)."""
    df = mem_ops.merge_candidates(FX.memory_df(spark, sf_dir))
    return df.select(
        "agent_id", "type", "mem_a", "mem_b", F.round("sim", 6).alias("sim"), "keeper"
    )


@query(
    "orchestrator_stats",
    f"WITH {FX.AGENTS_SQL.strip()},\n{FX.MESSAGES_SQL.strip()}\n"
    """
    SELECT a.agent_id, a.name,
           COALESCE(s.sent, 0)::BIGINT AS sent,
           COALESCE(r.received, 0)::BIGINT AS received
    FROM agents a
    LEFT JOIN (SELECT from_agent, COUNT(*) AS sent FROM messages GROUP BY from_agent) s
           ON s.from_agent = a.agent_id
    LEFT JOIN (SELECT to_agent, COUNT(*) AS received FROM messages
               WHERE to_agent <> '*' GROUP BY to_agent) r
           ON r.to_agent = a.agent_id
    """,
)
def orchestrator_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (AgentOrchestrator.js:274-286)."""
    return orch.orchestrator_stats(
        FX.agents_df(spark), FX.messages_df(spark, sf_dir)
    )


@query(
    "capability_rank",
    f"WITH {FX.AGENTS_SQL.strip()}\n"
    """
    SELECT agent_id, name,
           len(list_intersect(capabilities, ['search','analysis','safety']))::INT AS score
    FROM agents
    WHERE len(list_intersect(capabilities, ['search','analysis','safety'])) > 0
    """,
)
def capability_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14/E3/M6: capability argmax for delegation
    (AgentOrchestrator.js:305-323)."""
    return orch.capability_rank(
        FX.agents_df(spark), ["search", "analysis", "safety"]
    ).select("agent_id", "name", F.col("score").cast("int").alias("score"))


@query(
    "broadcast_targets",
    f"WITH {FX.AGENTS_SQL.strip()}\n"
    "SELECT agent_id, name FROM agents WHERE agent_id <> 'agent-3'",
)
def broadcast_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: broadcast fan-out = all agents except sender
    (AgentOrchestrator.js:152-158)."""
    return orch.broadcast_targets(FX.agents_df(spark), "agent-3")


@query(
    "adaptive_weights",
    f"WITH {FX.FEEDBACK_SQL.strip()},\n"
    f"""
    pat AS (
        SELECT *,
            array_to_string(list_sort(list_filter(string_split(lower(query), ' '),
                                                  x -> x <> ''))[1:5], '_') AS pattern,
            ROW_NUMBER() OVER (PARTITION BY
                array_to_string(list_sort(list_filter(string_split(lower(query), ' '),
                                                      x -> x <> ''))[1:5], '_'),
                strategy ORDER BY ts DESC, fb_id DESC) AS rn
        FROM feedback
        QUALIFY rn <= {learning.FEEDBACK_RING}
    ),
    avgs AS (
        -- exact centi-quality average quantized to micro-units (r13
        -- hardening): quality is k/100 by construction, so the exact mean
        -- is sum(int)*10000/count — half-up rounded to an exact BIGINT a6
        -- BEFORE the pattern-normalizing window, so that window sums
        -- exact integers in ANY fold order (a raw-double SUM drifted one
        -- ulp and landed weight = 25/128 on the round boundary at sf0.1)
        SELECT pattern, strategy,
               FLOOR((SUM((quality * 100)::BIGINT) * 10000)::DOUBLE
                     / COUNT(*) + 0.5)::BIGINT AS a6
        FROM pat GROUP BY pattern, strategy
    )
    SELECT pattern, strategy,
           a6::DOUBLE / 1000000.0 AS avg_quality,
           FLOOR((a6::DOUBLE / SUM(a6) OVER (PARTITION BY pattern))
                 * 1000000.0 + 0.5) / 1000000.0 AS weight
    FROM avgs
    """,
)
def adaptive_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W2/X12: adaptive strategy weights from the feedback ring
    (HybridRetriever.js:263-303).  Weight rounding uses the floor-form
    (textstats.round6_stable) — Spark ROUND's shortest-string HALF_UP
    disagrees with DuckDB's binary round on exact-halfway reprs."""
    from fusionspark.operators.textstats import round6_stable

    df = learning.adaptive_weights(FX.feedback_df(spark, sf_dir), quality_scale=100)
    return df.select(
        "pattern",
        "strategy",
        "avg_quality",
        round6_stable(F.col("weight")).alias("weight"),
    )


@query(
    "query_patterns",
    f"WITH {FX.FEEDBACK_SQL.strip()}\n"
    """
    SELECT DISTINCT query,
        array_to_string(list_sort(list_filter(string_split(lower(query), ' '),
                                              x -> x <> ''))[1:5], '_') AS pattern
    FROM feedback
    """,
)
def query_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: generalized query-pattern key (HybridRetriever.js:402-406)."""
    return (
        FX.feedback_df(spark, sf_dir)
        .select("query", query_pattern("query").alias("pattern"))
        .distinct()
    )


@query(
    "skill_ema",
    f"WITH {FX.FEEDBACK_SQL.strip()},\n"
    """
    tail AS (
        SELECT strategy, quality,
               ROW_NUMBER() OVER (PARTITION BY strategy ORDER BY ts DESC, fb_id DESC) AS rn
        FROM feedback QUALIFY rn <= 20
    )
    SELECT strategy, COUNT(*)::BIGINT AS n_outcomes,
           ROUND(SUM(0.3 * POWER(0.7, rn - 1)
                     * CASE WHEN quality > 0.5 THEN 1.0 ELSE 0.0 END)
                 + POWER(0.7, MAX(rn)) * 1.0, 6) AS success_rate
    FROM tail GROUP BY strategy
    """,
)
def skill_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W5: successRate EMA, closed form over the ordered outcome tail
    (RecursiveLearningEngine.js:472-482)."""
    df = learning.skill_outcome_ema(FX.feedback_df(spark, sf_dir))
    return df.select(
        "strategy", "n_outcomes", F.round("success_rate", 6).alias("success_rate")
    )


@query(
    "skill_match",
    f"WITH {FX.SKILLS_SQL.strip()},\n"
    """
    scored AS (
        SELECT skill_id, name, success_rate,
               len(list_filter(trigger_keywords,
                               kw -> contains('optimize the slow query with a fast hash join and sort the big table', kw)))::INT AS match_count,
               len(trigger_keywords) AS n_kw
        FROM skills
    )
    SELECT skill_id, name, match_count,
           ROUND(match_count::DOUBLE / n_kw, 6) AS match_score,
           ROUND(success_rate * match_count / n_kw, 6) AS rank_key
    FROM scored WHERE match_count > 0
    """,
)
def skill_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: findApplicableSkills (RecursiveLearningEngine.js:442-464)."""
    ctx = "optimize the slow query with a fast hash join and sort the big table"
    df = learning.find_applicable_skills(FX.skills_df(spark), ctx)
    return df.select(
        "skill_id",
        "name",
        F.col("match_count").cast("int").alias("match_count"),
        F.round("match_score", 6).alias("match_score"),
        F.round("rank_key", 6).alias("rank_key"),
    )


@query(
    "reflection_context",
    f"WITH {FX.FEEDBACK_SQL.strip()},\n"
    """
    tail AS (
        SELECT agent_id, query, quality,
               ROW_NUMBER() OVER (PARTITION BY agent_id ORDER BY ts DESC, fb_id DESC) AS rn
        FROM feedback QUALIFY rn <= 20
    )
    SELECT agent_id, COUNT(*)::BIGINT AS n_feedback,
           ROUND(AVG(quality), 6) AS avg_quality,
           array_to_string(list_sort(list(query) FILTER (WHERE quality < 0.3)), '|') AS failed
    FROM tail GROUP BY agent_id
    """,
)
def reflection_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: reflection inputs — recent avg quality + failed queries
    (RecursiveLearningEngine.js:596-613)."""
    df = learning.reflection_context(FX.feedback_df(spark, sf_dir))
    return df.select(
        "agent_id",
        "n_feedback",
        F.round("avg_quality", 6).alias("avg_quality"),
        F.array_join("failed_queries", "|").alias("failed"),
    )


@query(
    "triple_edges",
    f"WITH {FX.TRIPLES_SQL.strip()}\n"
    """
    SELECT subject, object, COUNT(*)::BIGINT AS n,
           ROUND(AVG(confidence), 6) AS avg_conf
    FROM triples GROUP BY subject, object
    """,
)
def triple_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (edge list) over X13-extracted triples
    (RecursiveLearningEngine.js:574-584)."""
    return (
        FX.triples_df(spark, sf_dir)
        .groupBy("subject", "object")
        .agg(F.count("*").alias("n"), F.round(F.avg("confidence"), 6).alias("avg_conf"))
    )


@query(
    "graph_summary",
    f"WITH {FX.TRIPLES_SQL.strip()}\n"
    """
    SELECT (SELECT COUNT(*) FROM triples)::BIGINT AS n_triples,
           (SELECT COUNT(*) FROM (
               SELECT subject AS e FROM triples UNION SELECT object FROM triples
           ))::BIGINT AS n_entities
    """,
)
def graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: knowledge-graph summary (RecursiveLearningEngine.js:574-584)."""
    return learning.graph_summary(FX.triples_df(spark, sf_dir))


@query(
    "chat_render",
    f"""
    WITH {{conv}}
    SELECT thread_id,
           COUNT(*)::BIGINT AS n_msgs,
           string_agg('<|' || role || '|>' || content, '' ORDER BY msg_seq) AS rendered,
           CAST(ceil(length(string_agg('<|' || role || '|>' || content, ''
                                       ORDER BY msg_seq)) / 4.0) AS BIGINT) AS est_tokens
    FROM conversations
    GROUP BY thread_id
    """.replace("{conv}", FX.CONVERSATIONS_SQL.strip()),
)
def chat_render_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering — the SFT-data assembly step: each thread's
    messages concatenated in msg_seq order with role tags
    ('<|user|>…<|assistant|>…'), plus the ceil(len/4) token estimate the
    packing stage consumes.  collect_list is UNORDERED in Spark (partition
    race), so the sort happens inside the row via array_sort on (seq,
    payload) structs — one shuffle on thread_id, deterministic output."""
    conv = FX.conversations_df(spark, sf_dir)
    rendered = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("msg_seq"),
                        F.concat(F.lit("<|"), "role", F.lit("|>"), "content").alias("piece"),
                    )
                )
            ),
            lambda s: s["piece"],
        ),
    )
    return conv.groupBy("thread_id").agg(
        F.count("*").alias("n_msgs"),
        rendered.alias("rendered"),
        F.ceil(F.length(rendered) / 4.0).cast("long").alias("est_tokens"),
    )


@query(
    "loss_mask_spans",
    f"""
    WITH {{conv}},
    pieces AS (
        SELECT thread_id, msg_seq, role,
               '<|' || role || '|>' || content AS piece
        FROM conversations
    ),
    offs AS (
        SELECT thread_id, msg_seq, role,
               COALESCE(SUM(length(piece)) OVER (
                   PARTITION BY thread_id ORDER BY msg_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS span_start,
               length(piece) AS piece_len,
               length('<|' || role || '|>') AS tag_len
        FROM pieces
    )
    SELECT thread_id, msg_seq,
           (span_start + tag_len)::BIGINT AS span_start,
           (span_start + piece_len)::BIGINT AS span_end
    FROM offs WHERE role = 'assistant'
    """.replace("{conv}", FX.CONVERSATIONS_SQL.strip()),
)
def loss_mask_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask spans for SFT — the companion of chat_render: character
    [start, end) of every ASSISTANT message body inside the rendered
    thread (role tags excluded from the trainable span).  One running-sum
    window per thread; integer-exact, so the spans index the rendered
    string byte-for-byte on any engine."""
    from pyspark.sql.window import Window

    conv = FX.conversations_df(spark, sf_dir)
    piece = F.concat(F.lit("<|"), "role", F.lit("|>"), "content")
    w = (
        Window.partitionBy("thread_id").orderBy("msg_seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = conv.select(
        "thread_id", "msg_seq", "role",
        F.coalesce(F.sum(F.length(piece)).over(w), F.lit(0)).alias("off"),
        F.length(piece).alias("piece_len"),
        F.length(F.concat(F.lit("<|"), "role", F.lit("|>"))).alias("tag_len"),
    )
    return offs.filter(F.col("role") == "assistant").select(
        "thread_id", "msg_seq",
        (F.col("off") + F.col("tag_len")).cast("long").alias("span_start"),
        (F.col("off") + F.col("piece_len")).cast("long").alias("span_end"),
    )


@query(
    "dpo_pairs",
    f"""
    WITH {{fb}},
    ranked AS (
        SELECT query, strategy, quality, fb_id,
               ROW_NUMBER() OVER (PARTITION BY query
                                  ORDER BY quality DESC, fb_id) AS rn_best,
               ROW_NUMBER() OVER (PARTITION BY query
                                  ORDER BY quality ASC, fb_id) AS rn_worst,
               COUNT(*) OVER (PARTITION BY query) AS n_fb
        FROM feedback
    ),
    best AS (SELECT query, strategy AS chosen, quality AS q_c, n_fb
             FROM ranked WHERE rn_best = 1),
    worst AS (SELECT query, strategy AS rejected, quality AS q_r
              FROM ranked WHERE rn_worst = 1)
    SELECT b.query, b.chosen, w.rejected,
           ROUND(b.q_c - w.q_r, 6) AS margin,
           b.n_fb::BIGINT AS n_fb
    FROM best b JOIN worst w ON w.query = b.query
    WHERE b.n_fb >= 2 AND b.q_c > w.q_r
    """.replace("{fb}", FX.FEEDBACK_SQL.strip()),
)
def dpo_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (DPO/RLHF): per prompt, the best- and
    worst-scored responses become (chosen, rejected) with their quality
    margin; prompts with one response or a zero margin drop.  Two window
    ranks over one shuffle on the prompt key — deterministic tie-breaks by
    feedback id.  Quality is k/100 (exact dyadic), so the margin compare
    is engine-stable."""
    from pyspark.sql.window import Window

    fb = FX.feedback_df(spark, sf_dir).select("query", "strategy", "quality", "fb_id")
    wq = Window.partitionBy("query")
    ranked = fb.select(
        "query", "strategy", "quality", "fb_id",
        F.row_number().over(wq.orderBy(F.desc("quality"), "fb_id")).alias("rn_best"),
        F.row_number().over(wq.orderBy(F.asc("quality"), "fb_id")).alias("rn_worst"),
        F.count("*").over(wq).alias("n_fb"),
    )
    best = ranked.filter(F.col("rn_best") == 1).select(
        "query", F.col("strategy").alias("chosen"), F.col("quality").alias("q_c"), "n_fb"
    )
    worst = ranked.filter(F.col("rn_worst") == 1).select(
        F.col("query").alias("query_w"), F.col("strategy").alias("rejected"),
        F.col("quality").alias("q_r"),
    )
    return (
        best.join(worst, best["query"] == worst["query_w"])
        .filter((F.col("n_fb") >= 2) & (F.col("q_c") > F.col("q_r")))
        .select(
            "query", "chosen", "rejected",
            F.round(F.col("q_c") - F.col("q_r"), 6).alias("margin"),
            F.col("n_fb").cast("long").alias("n_fb"),
        )
    )


@query(
    "chat_lint",
    f"""
    WITH {{conv}},
    x AS (
        SELECT thread_id, msg_seq, role, content,
               LAG(role) OVER (PARTITION BY thread_id ORDER BY msg_seq) AS prev_role,
               ROW_NUMBER() OVER (PARTITION BY thread_id ORDER BY msg_seq) AS rn
        FROM conversations
    )
    SELECT thread_id,
           COUNT(*)::BIGINT AS n_msgs,
           (MAX(CASE WHEN rn = 1 THEN role END) = 'user') AS starts_user,
           SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END)::BIGINT AS repeat_role_violations,
           SUM(CASE WHEN role = 'system' AND rn > 1 THEN 1 ELSE 0 END)::BIGINT AS late_system_msgs,
           SUM(CASE WHEN length(content) = 0 THEN 1 ELSE 0 END)::BIGINT AS empty_msgs
    FROM x GROUP BY thread_id
    """.replace("{conv}", FX.CONVERSATIONS_SQL.strip()),
)
def chat_lint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation linting — the validation gate before chat data enters
    SFT: per thread, does it start with a user turn, how many same-role
    repeats (broken alternation), system messages after the head, empty
    bodies.  One window pass per thread; the flags are the standard drop
    rules of chat-data curation."""
    from pyspark.sql.window import Window

    conv = FX.conversations_df(spark, sf_dir)
    w = Window.partitionBy("thread_id").orderBy("msg_seq")
    x = conv.select(
        "thread_id", "role", "content",
        F.lag("role").over(w).alias("prev_role"),
        F.row_number().over(w).alias("rn"),
    )
    return x.groupBy("thread_id").agg(
        F.count("*").alias("n_msgs"),
        (F.max(F.when(F.col("rn") == 1, F.col("role"))) == "user").alias("starts_user"),
        F.sum((F.col("role") == F.col("prev_role")).cast("int")).cast("long")
        .alias("repeat_role_violations"),
        F.sum(((F.col("role") == "system") & (F.col("rn") > 1)).cast("int")).cast("long")
        .alias("late_system_msgs"),
        F.sum((F.length("content") == 0).cast("int")).cast("long").alias("empty_msgs"),
    )
