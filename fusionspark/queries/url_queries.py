"""URL family queries (north-star crawl-pipeline additions): the synthetic
URL is a closed-form function of (doc_id, source), dirty on purpose
(uppercase scheme/WWW, default port, utm_ params, fragment), and the
DuckDB oracle replays the CANONICAL result arithmetically — so a hash
match proves the Spark regexp chain implements the canonicalization law
exactly, not merely that two copies of the same regex agree."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import urls
from fusionspark.operators.dedup import md5_hash32
from fusionspark.queries import query

# dirty synthetic URL, mirrored in _DIRTY_URL_SQL below
_DIRTY_URL_SQL = """
urls AS (
    SELECT doc_id, source,
           'HTTPS://' || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
           || source || '.example.com'
           || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
           || '/docs/' || (doc_id % 97)::VARCHAR
           || CASE doc_id % 3
                WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 50)::VARCHAR
                            || '&utm_campaign=x'
                WHEN 1 THEN '?id=' || (doc_id % 50)::VARCHAR
                ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
    FROM documents
)
"""


def _dirty_url() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://"),
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.com"),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"), (d % 97).cast("string"),
        F.when(d % 3 == 0, F.concat(F.lit("?utm_source=feed&id="),
                                    (d % 50).cast("string"),
                                    F.lit("&utm_campaign=x")))
        .when(d % 3 == 1, F.concat(F.lit("?id="), (d % 50).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@query(
    "url_canonical",
    f"WITH {_DIRTY_URL_SQL.strip()}\n"
    """
    SELECT doc_id, url,
           'https://' || source || '.example.com/docs/' || (doc_id % 97)::VARCHAR
           || CASE WHEN doc_id % 3 IN (0, 1)
                   THEN '?id=' || (doc_id % 50)::VARCHAR ELSE '' END AS canon_url,
           source || '.example.com' AS host,
           'example.com' AS domain,
           'https' AS scheme
    FROM urls
    """,
)
def url_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/urls.py): lowercase scheme/host,
    strip www. and default ports, drop fragments and utm_ tracking params.
    Pure column expressions — JVM codegen, zero shuffle; the oracle checks
    the law's closed form, not the regex chain."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    df = docs.withColumn("url", _dirty_url())
    return df.select(
        "doc_id", "url",
        urls.canonicalize("url").alias("canon_url"),
        urls.url_host("url").alias("host"),
        urls.registered_domain(urls.url_host("url")).alias("domain"),
        urls.url_scheme("url").alias("scheme"),
    )


@query(
    "url_host_stats",
    f"WITH {_DIRTY_URL_SQL.strip()},\n"
    """
    canon AS (
        SELECT doc_id, source || '.example.com' AS host,
               'https://' || source || '.example.com/docs/' || (doc_id % 97)::VARCHAR
               || CASE WHEN doc_id % 3 IN (0, 1)
                       THEN '?id=' || (doc_id % 50)::VARCHAR ELSE '' END AS canon_url
        FROM urls
    )
    SELECT host,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT canon_url)::BIGINT AS n_urls,
           (('0x' || substr(md5(host), 1, 8))::BIGINT % 10 = 0) AS blocked
    FROM canon GROUP BY host
    """,
)
def url_host_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl stats + deterministic blocklist tag (md5-keyed, the
    portable stand-in for a broadcast blocklist join).  One shuffle on the
    canonical host — the partitioning a domain-mixing stage reuses."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    df = docs.withColumn("url", _dirty_url())
    canon = df.select(
        urls.url_host("url").alias("host"),
        urls.canonicalize("url").alias("canon_url"),
    )
    return canon.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("canon_url").alias("n_urls"),
    ).withColumn("blocked", (md5_hash32(F.col("host")) % 10) == 0)


def _pagerank_oracle(iters: int = 3) -> str:
    head = """
    WITH docs AS (SELECT doc_id FROM documents),
    nn AS (SELECT COUNT(*)::DOUBLE AS n FROM docs),
    edges AS (
        SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT COUNT(*) FROM docs) AS dst FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % (SELECT COUNT(*) FROM docs) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 29 + 7) % (SELECT COUNT(*) FROM docs) FROM docs
    ),
    outdeg AS (SELECT src, COUNT(*)::DOUBLE AS od FROM edges GROUP BY src),
    r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nn) AS r FROM docs)"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
    r{i} AS (
        SELECT d.doc_id AS id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(p.r / od.od), 0.0) AS r
        FROM docs d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN r{i - 1} p ON p.id = e.src
        LEFT JOIN outdeg od ON od.src = e.src
        GROUP BY d.doc_id
    )"""
    return head + body + f"""
    SELECT id AS doc_id, ROUND(r, 6) AS rank
    FROM r{iters}
    ORDER BY ROUND(r, 6) DESC, id LIMIT 20
    """


@query("pagerank_docs", _pagerank_oracle(3))
def pagerank_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/graph.py) over a deterministic 3-out link graph
    on doc ids (d → d·7+1, d·13+3, d·29+7 mod N), 3 synchronous iterations
    at damping 0.85; top-20 by rounded rank (rounded BEFORE the sort so the
    top-k cut is float-order-stable across engines).  The oracle unrolls
    the same three iterations as SQL CTEs."""
    from fusionspark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((7, 1), (13, 3), (29, 7)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    ranks = pagerank(docs, edges, iters=3, damping=0.85, id_col="doc_id")
    return (
        ranks.select("id", F.round("rank", 6).alias("rank"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(F.desc("rank"), "doc_id")
        .limit(20)
    )


@query(
    "graph_triangles",
    """
    WITH docs AS (SELECT doc_id FROM documents),
    nn AS (SELECT COUNT(*) AS n FROM docs),
    raw AS (
        SELECT doc_id AS s, (doc_id + 1) % (SELECT n FROM nn) AS d FROM docs
        UNION ALL
        SELECT doc_id, (doc_id + 2) % (SELECT n FROM nn) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 3 + 1) % (SELECT n FROM nn) FROM docs
    ),
    e AS (
        SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        FROM raw WHERE s <> d
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT unnest([x, y, z]) AS doc_id FROM tri
    ),
    tcnt AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_triangles FROM corners GROUP BY doc_id
    ),
    deg AS (
        SELECT doc_id, COUNT(*)::BIGINT AS degree FROM (
            SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e
        ) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(g.degree, 0)::BIGINT AS degree,
           COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles,
           ROUND(CASE WHEN COALESCE(g.degree, 0) >= 2
                      THEN 2.0 * COALESCE(t.n_triangles, 0)
                           / (g.degree * (g.degree - 1))
                      ELSE 0.0 END, 6) AS clustering_coeff
    FROM docs d
    LEFT JOIN deg g ON g.doc_id = d.doc_id
    LEFT JOIN tcnt t ON t.doc_id = d.doc_id
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per node
    (operators/graph.py::triangle_counts) over the deterministic link
    graph d → {d+1, d+2, 3d+1} mod N.  The id-ordered orientation emits
    each triangle once through two equi-joins (degree-ordering is the
    same plan for skewed graphs); the oracle replays the enumeration."""
    from fusionspark.operators.graph import triangle_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((1, 1), (1, 2), (3, 1)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    return triangle_counts(edges, docs, "doc_id")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled peeling oracle: `rounds` degree-filter CTE pairs.  The
    Spark side iterates to the FIXPOINT; extra unrolled rounds past it
    are no-ops, so `rounds` only needs to be ≥ the measured peel depth
    (4 at sf0.1; 10 leaves margin and the Spark operator raises loudly
    if a corpus ever needs more)."""
    sql = """
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    raw AS (
        SELECT doc_id AS s, (doc_id * 2 + 1) % (SELECT n FROM nn) AS d
        FROM documents
        UNION ALL
        SELECT doc_id, (doc_id * 3 + 2) % (SELECT n FROM nn) FROM documents
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        FROM raw WHERE s <> d
    )"""
    for i in range(rounds):
        sql += f""",
    d{i} AS MATERIALIZED (
        SELECT v, COUNT(*)::BIGINT AS deg FROM (
            SELECT a AS v FROM e{i} UNION ALL SELECT b FROM e{i}
        ) GROUP BY v
    ),
    e{i + 1} AS MATERIALIZED (
        SELECT a, b FROM e{i}
        WHERE a IN (SELECT v FROM d{i} WHERE deg >= {k})
          AND b IN (SELECT v FROM d{i} WHERE deg >= {k})
    )"""
    sql += f"""
    SELECT v AS doc_id, deg AS core_degree
    FROM d{rounds - 1} WHERE deg >= {k}
    """
    return sql


@query("kcore_docs", _kcore_oracle(k=4, rounds=10))
def kcore_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the deterministic doubling graph d → {2d+1, 3d+2} mod N
    (operators/graph.py::kcore) — iterative peeling that actually peels
    on this corpus (500 → 120 nodes over 3 rounds at sf0.01, depth 4 at
    sf0.1).  Each round is one degree agg + two semi-joins; the only
    driver value is the convergence scalar."""
    from fusionspark.operators.graph import kcore

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((2, 1), (3, 2)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    return kcore(edges, k=4, max_rounds=10)


def _lpa_oracle(rounds: int) -> str:
    """Unrolled synchronous-LPA oracle: per round, neighbor-label counts →
    per-node (count DESC, label ASC) argmax → coalesce with the previous
    labels (isolated nodes keep theirs).  Fixed rounds == exact replay of
    the operator's fixed rounds, oscillation and all."""
    sql = """
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    raw AS (
        SELECT doc_id AS s,
               (doc_id // 20) * 20 + ((doc_id % 20 + off) % 20) AS d
        FROM documents, (SELECT unnest([1, 2, 3]) AS off)
        UNION ALL
        SELECT doc_id, (doc_id + 20) % (SELECT n FROM nn)
        FROM documents WHERE doc_id % 20 = 0
    ),
    und AS MATERIALIZED (
        SELECT DISTINCT s, d FROM (
            SELECT s, d FROM raw UNION ALL SELECT d, s FROM raw
        ) WHERE s <> d AND s < (SELECT n FROM nn) AND d < (SELECT n FROM nn)
    ),
    l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)"""
    for i in range(rounds):
        sql += f""",
    c{i} AS MATERIALIZED (
        SELECT e.s AS node, l.label, COUNT(*)::BIGINT AS c
        FROM und e JOIN l{i} l ON l.node = e.d
        GROUP BY e.s, l.label
    ),
    b{i} AS (
        SELECT node, label AS new_label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM c{i}
        ) WHERE rn = 1
    ),
    l{i + 1} AS MATERIALIZED (
        SELECT l.node, COALESCE(b.new_label, l.label) AS label
        FROM l{i} l LEFT JOIN b{i} b ON b.node = l.node
    )"""
    sql += f"""
    SELECT node AS doc_id, label AS community FROM l{rounds}
    """
    return sql


@query("community_lpa", _lpa_oracle(rounds=4))
def community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (operators/graph.py::label_propagation) on a deterministic caveman
    graph: 20-node groups with 3 intra-group chords per node and one
    bridge per group — LPA recovers the groups while CC would merge
    everything through the bridges.  Fixed 4 rounds, (count DESC, label
    ASC) tie-break; oracle = 4 unrolled CTE rounds."""
    from fusionspark.operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    intra = None
    for off in (1, 2, 3):
        e = docs.select(
            d.alias("src"),
            ((d / 20).cast("long") * 20 + ((d % 20 + off) % 20)).alias("dst"),
        )
        intra = e if intra is None else intra.unionAll(e)
    bridge = docs.filter(d % 20 == 0).select(
        d.alias("src"), ((d + 20) % n).alias("dst")
    )
    edges = intra.unionAll(bridge).filter(
        (F.col("dst") < n) & (F.col("src") < n)
    )
    return label_propagation(docs, edges, rounds=4)


def _bfs_oracle(hops: int = 4) -> str:
    """Layered min-relaxation replay of the bounded BFS: with unit edge
    weights, h rounds of dist = MIN(dist, neighbor+1) equal frontier BFS
    exactly, so the (id, dist) set hash-matches the frontier-delta
    implementation (operators/graph.py::bfs)."""
    head = """
    WITH docs AS (SELECT doc_id FROM documents),
    edges AS (
        SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT COUNT(*) FROM docs) AS dst FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % (SELECT COUNT(*) FROM docs) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 29 + 7) % (SELECT COUNT(*) FROM docs) FROM docs
    ),
    r0 AS (SELECT doc_id AS id, 0 AS dist FROM docs WHERE doc_id < 10)"""
    body = ""
    for h in range(1, hops + 1):
        body += f""",
    r{h} AS MATERIALIZED (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM r{h - 1}
            UNION ALL
            SELECT e.dst AS id, r.dist + 1 AS dist
            FROM r{h - 1} r JOIN edges e ON e.src = r.id
        ) GROUP BY id
    )"""
    return head + body + f"""
    SELECT id AS doc_id, dist::INT AS dist FROM r{hops}
    """


@query("bfs_hops", _bfs_oracle(4))
def bfs_hops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 4-hop BFS from the seed set doc_id < 10 over the same
    deterministic 3-out link graph as pagerank_docs — the link-distance
    primitive of crawl-frontier scheduling and seed-proximity filtering.
    Frontier-delta rounds (only newly discovered nodes join the edge
    table); the oracle replays it as layered min-relaxation, provably
    identical with unit weights."""
    from fusionspark.operators.graph import bfs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((7, 1), (13, 3), (29, 7)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    seeds = docs.filter(d < 10)
    return bfs(seeds, edges, hops=4, id_col="doc_id")


@query(
    "degree_distribution",
    """
    WITH docs AS (SELECT doc_id FROM documents),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM docs),
    edges AS (
        SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
        FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM nn) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 29 + 7) % (SELECT n FROM nn) FROM docs
    ),
    indeg AS (
        SELECT d.doc_id, COUNT(e.src)::BIGINT AS indeg
        FROM docs d LEFT JOIN edges e ON e.dst = d.doc_id
        GROUP BY d.doc_id
    )
    SELECT indeg AS degree, COUNT(*)::BIGINT AS n_nodes
    FROM indeg GROUP BY indeg
    ORDER BY degree ASC
    """,
)
def degree_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the pagerank/bfs 3-out link graph — the
    graph-profiling readout that sizes skew BEFORE running iterative
    algorithms on it (a heavy-tailed in-degree is the salting trigger
    for pagerank's contribution groupBy; the histogram is the evidence).
    Two digest-sized shuffles (degree count, histogram); nodes with zero
    in-links are kept via the left join — a dropped mode at degree 0
    would understate skew."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((7, 1), (13, 3), (29, 7)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    indeg = (
        docs.join(edges, docs.doc_id == edges.dst, "left")
        .groupBy("doc_id")
        .agg(F.count("src").cast("long").alias("indeg"))
    )
    return (
        indeg.groupBy(F.col("indeg").alias("degree"))
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("degree")
    )


def _hits_oracle(iters: int = 2) -> str:
    head = """
    WITH docs AS (SELECT doc_id FROM documents),
    edges AS MATERIALIZED (
        SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT COUNT(*) FROM docs) AS dst FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % (SELECT COUNT(*) FROM docs) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 29 + 7) % (SELECT COUNT(*) FROM docs) FROM docs
    ),
    a0 AS MATERIALIZED (SELECT doc_id AS id, 1.0 AS v FROM docs)"""
    body = ""
    prev_a = "a0"
    for i in range(1, iters + 1):
        body += f""",
    h{i}r AS MATERIALIZED (
        SELECT e.src AS id,
               list_reduce(list_prepend(0.0, list(a.v ORDER BY e.dst)),
                           (x, y) -> x + y) AS v
        FROM edges e JOIN {prev_a} a ON a.id = e.dst GROUP BY e.src
    ),
    h{i}f AS MATERIALIZED (
        SELECT d.doc_id AS id, COALESCE(h.v, 0.0) AS v
        FROM docs d LEFT JOIN h{i}r h ON h.id = d.doc_id
    ),
    h{i} AS MATERIALIZED (
        SELECT id, CASE WHEN (SELECT MAX(v) FROM h{i}f) > 0
                        THEN v / (SELECT MAX(v) FROM h{i}f) ELSE v END AS v
        FROM h{i}f
    ),
    a{i}r AS MATERIALIZED (
        SELECT e.dst AS id,
               list_reduce(list_prepend(0.0, list(h.v ORDER BY e.src)),
                           (x, y) -> x + y) AS v
        FROM edges e JOIN h{i} h ON h.id = e.src GROUP BY e.dst
    ),
    a{i}f AS MATERIALIZED (
        SELECT d.doc_id AS id, COALESCE(a.v, 0.0) AS v
        FROM docs d LEFT JOIN a{i}r a ON a.id = d.doc_id
    ),
    a{i} AS MATERIALIZED (
        SELECT id, CASE WHEN (SELECT MAX(v) FROM a{i}f) > 0
                        THEN v / (SELECT MAX(v) FROM a{i}f) ELSE v END AS v
        FROM a{i}f
    )"""
        prev_a = f"a{i}"
    return head + body + f"""
    SELECT h.id AS doc_id, ROUND(h.v, 6) AS hub, ROUND(a.v, 6) AS authority
    FROM h{iters} h JOIN a{iters} a ON a.id = h.id
    ORDER BY ROUND(a.v, 6) DESC, doc_id ASC LIMIT 20
    """


@query("hits_docs", _hits_oracle(2))
def hits_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.py::hits) over the same
    deterministic 3-out link graph as pagerank_docs, 2 mutual-
    reinforcement iterations with max-normalized half-steps; every
    neighborhood sum is a neighbor-ordered IEEE fold so both engines
    iterate bit-identically (stronger than pagerank's plain SUM).
    Top-20 authorities, rounded BEFORE the sort for a float-order-stable
    cut."""
    from fusionspark.operators.graph import hits

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for aa, bb in ((7, 1), (13, 3), (29, 7)):
        e = docs.select(d.alias("src"), ((d * aa + bb) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    out = hits(docs, edges, iters=2, id_col="doc_id")
    return (
        out.select(
            F.col("id").alias("doc_id"),
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
        .orderBy(F.round("authority", 6).desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _sssp_oracle(rounds: int = 4) -> str:
    head = """
    WITH docs AS (SELECT doc_id FROM documents),
    edges AS (
        SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT COUNT(*) FROM docs) AS dst FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % (SELECT COUNT(*) FROM docs) FROM docs
        UNION ALL
        SELECT doc_id, (doc_id * 29 + 7) % (SELECT COUNT(*) FROM docs) FROM docs
    ),
    we AS MATERIALIZED (
        SELECT src, dst, (1 + (src + dst) % 5)::BIGINT AS w FROM edges
    ),
    r0 AS (SELECT doc_id AS id, 0::BIGINT AS dist FROM docs WHERE doc_id < 10)"""
    body = ""
    for h in range(1, rounds + 1):
        body += f""",
    r{h} AS MATERIALIZED (
        SELECT id, MIN(dist)::BIGINT AS dist FROM (
            SELECT id, dist FROM r{h - 1}
            UNION ALL
            SELECT e.dst AS id, r.dist + e.w AS dist
            FROM r{h - 1} r JOIN we e ON e.src = r.id
        ) GROUP BY id
    )"""
    return head + body + f"""
    SELECT id AS doc_id, dist FROM r{rounds}
    """


@query("sssp_hops", _sssp_oracle(4))
def sssp_hops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 4-round weighted shortest paths (operators/graph.py::sssp,
    Bellman-Ford) from the seed set doc_id < 10 over the 3-out link graph
    with deterministic integer weights w = 1 + (src+dst) mod 5 — bfs_hops'
    weighted sibling; distances are exact BIGINTs and the oracle unrolls
    the same min-relaxation rounds."""
    from fusionspark.operators.graph import sssp

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((7, 1), (13, 3), (29, 7)):
        e = docs.select(d.alias("src"), ((d * a + b) % n).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    we = edges.withColumn(
        "w", (1 + (F.col("src") + F.col("dst")) % 5).cast("long")
    )
    seeds = docs.filter(d < 10)
    return sssp(seeds, we, rounds=4, id_col="doc_id")


@query(
    "robots_rules",
    """
    WITH robots AS (
        SELECT source,
               '# crawl policy' || chr(10) || 'User-agent: *' || chr(10)
               || 'Disallow: /p' || (substr(source, 4)::BIGINT % 4)::VARCHAR
               || chr(10) || 'Allow: /p'
               || (substr(source, 4)::BIGINT % 4)::VARCHAR || '/pub'
               || chr(10) || chr(10) || 'Disallow: /admin' AS robots_txt
        FROM (SELECT DISTINCT source FROM documents)
    ),
    rules AS (
        SELECT source,
               lower(trim(regexp_extract(line, '^\\s*([A-Za-z-]+)\\s*:', 1)))
                   AS directive,
               trim(regexp_extract(line, '^[^:]+:\\s*(\\S*)', 1)) AS path
        FROM (
            SELECT source, unnest(string_split(robots_txt, chr(10))) AS line
            FROM robots
        )
        WHERE NOT starts_with(trim(line), '#')
    ),
    good AS (
        SELECT * FROM rules
        WHERE directive IN ('allow', 'disallow') AND path <> ''
    ),
    urls AS (
        SELECT doc_id, source,
               '/p' || (doc_id % 6)::VARCHAR
               || CASE WHEN doc_id % 3 = 0 THEN '/pub/d' ELSE '/d' END
               || doc_id::VARCHAR AS path
        FROM documents
    ),
    matched AS (
        SELECT u.doc_id, u.source, u.path,
               g.directive, g.path AS rule_path,
               ROW_NUMBER() OVER (
                   PARTITION BY u.doc_id
                   ORDER BY length(g.path) DESC NULLS LAST, g.directive ASC
               ) AS rn
        FROM urls u
        LEFT JOIN good g
          ON u.source = g.source AND starts_with(u.path, g.path)
    )
    SELECT doc_id, source, path,
           COALESCE(rule_path, '') AS matched_rule,
           CASE WHEN directive = 'disallow' THEN 'deny' ELSE 'allow' END
               AS decision
    FROM matched WHERE rn = 1
    """,
)
def robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots Exclusion Protocol over a crawl frontier: parse per-site
    robots.txt TEXT (comments, blank lines, case-insensitive directives
    — operators/urls.py parse_robots_rules) and decide every URL by
    longest-prefix match with the Allow tie rule (robots_decisions).
    The derived corpus plants a Disallow/Allow pair per site and URLs
    that exercise match, longer-allow override, and no-match default —
    and the ORACLE RE-PARSES THE SAME TEXT in SQL (not just the
    construction law), so both the line grammar and the match semantics
    are attested end to end.

    Scale: rules explode from KB-sized robots files (broadcast); URLs
    take one broadcast join + one per-URL window.  WARC ingest
    (warc_ingest) is the upstream that yields these files at 100 TB."""
    from fusionspark.operators.urls import parse_robots_rules, robots_decisions

    d = load_table(spark, sf_dir, "documents")
    k = (F.substring("source", 4, 10).cast("long") % 4).cast("string")
    robots = d.select("source").distinct().select(
        "source",
        F.concat(
            F.lit("# crawl policy\nUser-agent: *\nDisallow: /p"), k,
            F.lit("\nAllow: /p"), k, F.lit("/pub\n\nDisallow: /admin"),
        ).alias("robots_txt"),
    )
    urls = d.select(
        "doc_id", "source",
        F.concat(
            F.lit("/p"), (F.col("doc_id") % 6).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, "/pub/d").otherwise("/d"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    rules = parse_robots_rules(robots)
    return robots_decisions(urls, rules)
