"""Composition + residual coverage: T8 (deterministic summary fallback),
X14 (title detection), A1→F4 (adaptive weights driving the RRF fusion),
and one more multi-join relational query for breadth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import tree
from fusionspark.queries import query
from fusionspark.queries.text_queries import _OVERLAP_SQL, _TF_SQL, QUERY
from fusionspark.queries.tree_queries import TREE_SQL, md_corpus_df

def _rev_e4():
    """Lineitem revenue term in EXACT 10^-4-dollar integer units:
    cents(price) * (100 - cents(discount)) — prices and discounts are
    cents-exact in the data, so the revenue SUM folds as exact BIGINTs
    in any shuffle order (raw-double sums diverge from the oracle in
    the 6th decimal at ~1e9 magnitude; the r13 strict-gate find)."""
    return F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long") * (
        100 - F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    )



@query(
    "node_summaries",
    f"{TREE_SQL}\n"
    """
    SELECT md_doc_id, sec_idx,
           substr(coalesce(content, title), 1, 200) AS summary,
           length(substr(coalesce(content, title), 1, 200))::BIGINT AS summary_len
    FROM tree_t
    """,
)
def node_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: bottom-up summaries, deterministic fallback path = first 200
    chars of node content (TreeIndex.js:517-538 falls back to exactly this
    when no LLM is configured; the LLM path is a pluggable mapInPandas UDF)."""
    t = tree.build_tree(tree.parse_markdown_sections(md_corpus_df(spark, sf_dir)))
    summary = F.substring(F.coalesce("content", "title"), 1, 200)
    return t.select(
        "md_doc_id",
        F.col("sec_idx").cast("long").alias("sec_idx"),
        summary.alias("summary"),
        F.length(summary).cast("long").alias("summary_len"),
    )


@query(
    "title_detect",
    """
    SELECT doc_id,
           CASE WHEN length(string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]) < 200
                THEN string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]
                ELSE 'Document' END AS detected_title
    FROM documents
    """,
)
def title_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: title detection — first line if < 200 chars else 'Document'
    (TreeIndex.js:448-451); the flat corpus has no newlines, so the
    'first line' here is the first two tokens (same CASE shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    first = F.concat_ws(" ", toks.getItem(0), toks.getItem(1))
    return d.select(
        "doc_id",
        F.when(F.length(first) < 200, first).otherwise("Document").alias("detected_title"),
    )


@query(
    "hybrid_adaptive",
    f"""
    WITH kw AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, {_TF_SQL} AS score FROM documents)
        WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    tre AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, {_OVERLAP_SQL} AS score FROM documents)
        WHERE score > 0.3 ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    perf AS (
        -- A1 weights learned from the global feedback pool for the two
        -- strategies in play, normalized to sum 1
        SELECT strategy,
               (SUM(event_id % 101)::DOUBLE / COUNT(*)) / 100.0::DOUBLE AS avg_q
        FROM (
            SELECT CASE event_id % 2 WHEN 0 THEN 'keyword' ELSE 'tree' END AS strategy,
                   event_id
            FROM events
        ) GROUP BY strategy
    ),
    w AS (
        SELECT strategy, avg_q / SUM(avg_q) OVER () AS weight FROM perf
    ),
    unioned AS (
        SELECT doc_id, rank, (SELECT weight FROM w WHERE strategy = 'keyword') AS wt FROM kw
        UNION ALL
        SELECT doc_id, rank, (SELECT weight FROM w WHERE strategy = 'tree') AS wt FROM tre
    )
    SELECT doc_id, ROUND(SUM(wt / (60 + rank)), 6) AS fused_score,
           COUNT(*)::BIGINT AS n_strategies
    FROM unioned GROUP BY doc_id
    ORDER BY SUM(wt / (60 + rank)) DESC, doc_id ASC LIMIT 10
    """,
)
def hybrid_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1→F4 composition: adaptive weights learned from feedback drive the
    RRF fusion (the reference's retrieveWithCritique loop,
    RecursiveLearningEngine.js:323-371, in one declarative plan)."""
    from fusionspark.operators import fusion
    from fusionspark.operators.keyword import keyword_overlap_search, keyword_search

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "events")
    # learn weights from the feedback pool (deterministic fixture rule)
    # exact centi-quality average (sum ints, divide once) — a float AVG's
    # fold order is partitioning-dependent and can flip a ROUND half-way
    # boundary against the exact oracle (see adaptive_weights)
    perf = (
        e.select(
            F.when(F.col("event_id") % 2 == 0, "keyword").otherwise("tree").alias("strategy"),
            (F.col("event_id") % 101).cast("long").alias("qk"),
        )
        .groupBy("strategy")
        .agg(
            ((F.sum("qk").cast("double") / F.count(F.lit(1))) / 100.0).alias("avg_q")
        )
        .collect()
    )
    total = sum(r["avg_q"] for r in perf)
    weights = {r["strategy"]: r["avg_q"] / total for r in perf}

    kw = keyword_search(d, QUERY, top_k=20)
    tre = keyword_overlap_search(d, QUERY, top_k=20, threshold=0.3)
    fused = fusion.rrf_fuse({"keyword": kw, "tree": tre}, top_k=10, weights=weights)
    return fused.select(
        "doc_id", F.round("fused_score", 6).alias("fused_score"), "n_strategies"
    )


@query(
    "tpch_region_revenue",
    """
    SELECT r.r_name, n.n_name,
           ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT)
                    )::DOUBLE / 10000.0, 6) AS revenue,
           COUNT(DISTINCT c.c_custkey)::BIGINT AS n_customers
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def tpch_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table snowflake join (Q5 shape): revenue per region/nation with
    distinct-customer counts — broadcast everything but lineitem.

    Revenue folds in EXACT 10^-4-dollar integer units (prices and
    discounts are cents-exact in the data): a raw-double SUM of
    price*(1-disc) accumulates in shuffle order and diverged from the
    oracle in the 6th decimal at sf0.1 (sums ~1e9, where 1e-6 is below
    the ulp) — the r13 strict-gate find.  The exact-int sum is
    order-free, so the result is bitwise stable under ANY partitioning
    — the property that matters at 1000 executors."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    rev_e4 = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long") * (
        100 - F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(rev_e4).cast("double") / 10000.0, 6).alias("revenue"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


@query(
    "tpch_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0, 6) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — lost-revenue ranking over returned items: the returnflag
    filter pushes into the lineitem scan, everything but lineitem
    broadcasts, one agg shuffle on the customer key."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 6).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_small_qty_revenue",
    """
    WITH pa AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS lim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT)::DOUBLE
                 / 700.0, 6) AS avg_yearly,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.lim
    """,
)
def tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — the correlated scalar subquery (per-part average
    quantity) rewritten as an aggregate + equi-join, Spark's native form:
    the per-part limit table is corpus-small and broadcasts.  Quantities
    are integral doubles, so the AVG is exact and the boundary compare is
    engine-stable.  Revenue folds in exact cents (order-free — the r13
    strict-gate find; see tpch_region_revenue) and divides once by 700
    (cents x 7 years)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("lim")
    )
    return (
        li.join(F.broadcast(pa), "l_partkey")
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
                ).cast("double")
                / 700.0,
                6,
            ).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@query(
    "tpch_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           ROUND(o.o_totalprice, 6) AS o_totalprice,
           ROUND(b.total_qty, 6) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape — large-volume orders: the HAVING aggregate shrinks the
    order set before any join (aggregate-then-join, not join-then-filter);
    the surviving keys broadcast into orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(F.broadcast(o), big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            F.round("total_qty", 6).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_local_supplier_volume",
    """
    SELECT n.n_name,
           ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0, 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape — the classic 6-way join with the local-supplier twist
    (customer and supplier must share a nation): every dimension
    broadcasts, the date range pushes into the orders scan, and the
    nation-equality is part of the supplier join condition so mismatched
    pairs never reach the aggregate.  One shuffle: the final n_name agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 6).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_order_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey)::BIGINT AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — customer order-count distribution: LEFT OUTER join with
    a predicate INSIDE the join condition (so zero-order customers
    survive), then a double aggregation.  Orders side shuffles on
    o_custkey once; the second agg is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                                       * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT)
                                  ELSE 0 END)::DOUBLE
                 / SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                       * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT)), 6) AS promo_pct,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — promotion revenue share: broadcast the part dimension,
    conditional aggregation in one pass (no second scan for the
    denominator)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _rev_e4()
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(0)
                ).cast("double")
                / F.sum(rev), 6,
            ).alias("promo_pct"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@query(
    "tpch_parts_supplier_count",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 20
    """,
)
def tpch_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (lineitem standing in for partsupp — the driver schema has
    no partsupp table): distinct-supplier counts per part attribute with a
    NOT-IN exclusion list.  The exclusion set and part dimension both
    broadcast (anti-join, not a subquery re-scan); the only shuffle is the
    distinct-count agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excl = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(excl), li["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@query(
    "tpch_disjunctive_revenue",
    """
    SELECT ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0, 6) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — OR-of-ANDs across both join sides: Catalyst splits the
    disjunction, pushes the l_quantity envelope (1..30) into the lineitem
    scan and the brand/size envelope into the part scan, then re-applies
    the exact predicate post-join (verified via .explain PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    b, s, q = F.col("p_brand"), F.col("p_size"), F.col("l_quantity")
    pred = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return j.filter(pred).agg(
        F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 6).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


@query(
    "tpch_dormant_customers",
    """
    WITH cutoff AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*)::BIGINT AS numcust,
           ROUND(SUM(c.c_acctbal), 6) AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — positive-balance customers with no orders: the global
    scalar (avg positive balance) broadcasts as a 1-row cross join, the
    NOT EXISTS (here: no urgent orders, so the result is non-empty at
    every SF) is a LEFT ANTI join on the order keys.  No correlated
    re-scan anywhere."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(F.broadcast(o), c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


@query(
    "tpch_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate)::INT AS l_year,
           ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0, 6) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def tpch_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — bilateral shipping volume: TWO aliases of the nation
    dimension (supplier side and customer side) with a symmetric pair
    predicate, yearly rollup.  All dimensions broadcast; lineitem is the
    only shuffled relation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 6).alias("volume")
    )


@query(
    "tpch_product_profit",
    """
    SELECT n.n_name AS nation, year(l.l_shipdate)::INT AS o_year,
           ROUND(SUM(FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT)
                     - FLOOR(p.p_retailprice * 100.0 + 0.5)::BIGINT
                       * CAST(l.l_quantity AS BIGINT) * 50
                    )::DOUBLE / 10000.0, 6) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
)
def tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — product-line profit by supplier nation and year (cost
    term adapted: the driver schema has no partsupp, so supply cost is
    0.5·retailprice — the JOIN/AGG shape is Q9's).  The p_name LIKE filter
    prunes the part dimension BEFORE its broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    # exact 1e-4-dollar units: rev_e4 minus cost cents * qty * 50
    # (0.5 * retail * qty = retail_cents * qty * 50 in 1e-4 units)
    profit = _rev_e4() - F.floor(
        F.col("p_retailprice") * 100.0 + 0.5
    ).cast("long") * F.col("l_quantity").cast("long") * 50
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
    ).agg(
        F.round(F.sum(profit).cast("double") / 10000.0, 6).alias("profit")
    )


@query(
    "tpch_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey, ROUND(SUM(FLOOR(l_extendedprice * 100.0 + 0.5)::BIGINT
                     * (100 - FLOOR(l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0, 6) AS total_rev
        FROM lineitem
        WHERE year(l_shipdate) = 1997
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — top supplier by 1997 revenue: revenue view aggregated
    once, its scalar max broadcast back as a 1-row join (the view is never
    recomputed, unlike the naive correlated form).  Equality on the ROUNDED
    revenue so the winner set is float-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 6).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "tpch_blame_suppliers",
    """
    SELECT l1.l_suppkey AS s_suppkey, COUNT(DISTINCT l1.l_orderkey)::BIGINT AS numwait
    FROM lineitem l1
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY l1.l_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20
    """,
)
def tpch_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — the sole-blame pattern (EXISTS + NOT EXISTS against the
    same relation): suppliers whose line was returned in multi-supplier
    orders where NO other supplier's line was returned.  Both subqueries
    become semi/anti joins on the order key (aggregated per-order supplier
    sets, broadcast) — no correlated re-scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # per (order, supplier): does this supplier have a returned line?
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    # per order: supplier count and count of suppliers with returns
    per_order = per.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("has_r").alias("n_supp_r")
    )
    blamed = (
        per.join(F.broadcast(per_order), "l_orderkey")
        .filter(
            (F.col("has_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_supp_r") == 1)
        )
    )
    return (
        blamed.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


@query(
    "tpch_forecast_revenue",
    """
    SELECT ROUND(SUM(FLOOR(l_extendedprice * 100.0 + 0.5)::BIGINT
                     * FLOOR(l_discount * 100.0 + 0.5)::BIGINT
                    )::DOUBLE / 10000.0, 6) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1998
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape — the canonical pushdown microbench: a scan-only
    aggregate whose year/discount/quantity predicates ALL reach the
    Parquet reader (no join, no shuffle beyond the 1-row agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1998)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
                    * F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
                ).cast("double")
                / 10000.0,
                6,
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@query(
    "tpch_market_share",
    """
    WITH vol AS (
        SELECT year(l.l_shipdate)::INT AS o_year,
               n.n_name AS supp_nation,
               FLOOR(l.l_extendedprice * 100.0 + 0.5)::BIGINT
               * (100 - FLOOR(l.l_discount * 100.0 + 0.5)::BIGINT) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_nationkey < 13
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END)::DOUBLE
                 / SUM(v), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — a nation's market share inside a customer segment:
    conditional-sum ratio per year (one pass, no second scan for the
    denominator), dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 13)
    v = _rev_e4()
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return j.groupBy(F.year("l_shipdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", v).otherwise(0))
            .cast("double")
            / F.sum(v),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_priority_lines",
    """
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE year(l.l_shipdate) = 1997
    GROUP BY l.l_linestatus
    """,
)
def tpch_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — order-priority distribution per line status (linestatus
    standing in for shipmode): broadcast join + two conditional counts in
    one aggregate pass; the year predicate pushes into the lineitem
    scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~hi).cast("int")).cast("long").alias("low_line_count"),
        )
    )


@query(
    "tpch_excess_suppliers",
    """
    WITH red AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM red GROUP BY l_partkey),
    heavy AS (
        SELECT DISTINCT r.l_suppkey
        FROM red r JOIN tot t ON t.l_partkey = r.l_partkey
        WHERE r.q > 0.12 * t.tq
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_suppkey
    """,
)
def tpch_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — the nested semi-join chain: aggregate per
    (supplier, part) over a LIKE-pruned part set, compare against the
    per-part total (a second aggregate of the FIRST — never a re-scan),
    and semi-join the qualifying supplier keys into the supplier
    dimension.  All joins on pre-aggregated frames; lineitem is scanned
    once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    red = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    tot = red.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    heavy = (
        red.join(F.broadcast(tot), "l_partkey")
        .filter(F.col("q") > 0.12 * F.col("tq"))
        .select("l_suppkey").distinct()
    )
    return (
        s.join(F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ── derived partsupp (Q2/Q11) ─────────────────────────────────────────────
# The driver's testdata ships no partsupp table; both engines derive the
# SAME one from part × a 4-supplier assignment rule (integer arithmetic
# only, so the derivation is bit-identical — the pattern the CDC family
# uses for its changelog).  Costs are integer CENTS: Q11's Σ(cost·qty)
# stays an exact BIGINT under any fold order.
_PARTSUPP_SQL = """
    ps0 AS (
        SELECT p_partkey,
               (p_partkey * 4 + t.i) % (SELECT COUNT(*) FROM supplier) AS sk
        FROM part CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) t
    ),
    ps AS (
        SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
               (p_partkey * 31 + sk * 17) % 10000 AS ps_cost_cents,
               (p_partkey * 7 + sk * 3) % 1000 + 1 AS ps_availqty
        FROM ps0
    )
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    ns = load_table(spark, sf_dir, "supplier").count()
    ps0 = part.select(
        "p_partkey", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
    )
    sk = (F.col("p_partkey") * 4 + F.col("i")) % F.lit(ns)
    return ps0.select(
        F.col("p_partkey").alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + sk * 17) % 10000).alias("ps_cost_cents"),
        ((F.col("p_partkey") * 7 + sk * 3) % 1000 + 1).alias("ps_availqty"),
    )


@query(
    "tpch_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_SQL.strip()},
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ),
    costs AS (
        SELECT ps.ps_partkey, ps.ps_cost_cents,
               e.s_name, e.s_acctbal, e.n_name
        FROM ps JOIN eu e ON e.s_suppkey = ps.ps_suppkey
    ),
    minc AS (
        SELECT ps_partkey, MIN(ps_cost_cents) AS mc
        FROM costs GROUP BY ps_partkey
    )
    SELECT p.p_partkey, p.p_type, c.s_name, c.n_name, c.s_acctbal,
           c.ps_cost_cents AS cost_cents
    FROM costs c
    JOIN minc m ON m.ps_partkey = c.ps_partkey AND c.ps_cost_cents = m.mc
    JOIN part p ON p.p_partkey = c.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — minimum-cost supplier per part within a region: the
    correlated MIN subquery decorrelated into an aggregate of the SAME
    joined frame (one scan feeds both), equality-joined back to keep
    every min-cost supplier (ties survive, as in Q2), part-attribute
    filters applied to the broadcast part dimension, and a fully-keyed
    ORDER BY (acctbal DESC then name chain) so the LIMIT cut is
    deterministic on both engines.  Completes the 22/22 TPC-H shape set
    together with tpch_important_stock."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        _derived_partsupp(spark, sf_dir)
        .join(F.broadcast(eu), F.col("ps_suppkey") == eu["s_suppkey"])
        .select("ps_partkey", "ps_cost_cents", "s_name", "s_acctbal", "n_name")
    )
    minc = costs.groupBy("ps_partkey").agg(F.min("ps_cost_cents").alias("mc"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        costs.withColumnRenamed("ps_partkey", "k")
        .join(minc, (F.col("k") == minc["ps_partkey"]) & (F.col("ps_cost_cents") == minc["mc"]))
        .join(F.broadcast(p), F.col("k") == p["p_partkey"])
        .select(
            "p_partkey", "p_type", "s_name", "n_name", "s_acctbal",
            F.col("ps_cost_cents").alias("cost_cents"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_important_stock",
    f"""
    WITH {_PARTSUPP_SQL.strip()},
    nat AS (
        SELECT s.s_suppkey FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_15'
    ),
    v AS (
        SELECT ps.ps_partkey,
               SUM(ps.ps_cost_cents * ps.ps_availqty)::BIGINT AS value_cents
        FROM ps JOIN nat ON nat.s_suppkey = ps.ps_suppkey
        GROUP BY ps.ps_partkey
    ),
    tot AS (SELECT SUM(value_cents)::BIGINT AS t FROM v)
    SELECT v.ps_partkey, v.value_cents
    FROM v, tot
    WHERE v.value_cents * 10000 > tot.t
    """,
)
def tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — per-part stock value within one nation vs a global
    threshold: the scalar total is an aggregate OF the per-part aggregate
    (one pass over partsupp), cross-join-broadcast back.  The value
    fraction compare is cross-multiplied in BIGINTs (value·10⁴ > total) —
    no float threshold, so the boundary rows can't flip between
    engines."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_15")
    nat = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    v = (
        ps.join(F.broadcast(nat), ps["ps_suppkey"] == nat["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"))
    )
    tot = v.agg(F.sum("value_cents").alias("t"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("t"))
        .select("ps_partkey", "value_cents")
    )
