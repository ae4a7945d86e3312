"""Link-graph operators: PageRank for host/document quality weighting.

Not in the reference (north-star addition): crawl pipelines weight corpora
by host/document centrality (Common Crawl publishes host-level ranks;
quality-mixing stages consume them).  The implementation is the classic
synchronous PageRank as iterated DataFrame joins — the Pregel shape
expressed declaratively so Catalyst/AQE handle the shuffles:

    contrib(v) = Σ_{u→v} rank(u) / outdeg(u)
    rank'(v)   = (1 − d)/N + d · contrib(v)

Scale shape: each iteration is one equi-join (edges ⋈ ranks on src — the
edge table can be pre-partitioned/bucketed by src so the join is
co-located) plus one groupBy(dst) aggregation with map-side partial sums.
Iterations are a fixed small count (rank deltas decay geometrically by the
damping factor); lineage stays shallow, no checkpoint needed.  Dangling
nodes (outdeg 0) simply contribute nothing — their mass is the standard
"lost mass" variant, consistent on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
) -> DataFrame:
    """Synchronous PageRank; `nodes` has column `id_col`, `edges` has
    (src, dst).  Returns (id, rank) after `iters` iterations from the
    uniform start 1/N."""
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")
    base = (1.0 - damping) / n

    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    # contribution weight per edge is rank(src)/od(src); precompute od once
    ed = edges.join(outdeg, "src")

    ranks = nodes.select(F.col(id_col).alias("id"), F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contribs, F.col("id") == contribs["dst"], "left")
            .select(
                "id",
                (F.lit(base) + damping * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
        )
    return ranks


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected canonical edge list: (a, b) with a < b, self-loops and
    duplicate orientations removed."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
        )
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, nodes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient
    2·t / (deg·(deg−1)).

    The id-ordered orientation (a < b everywhere) is the classic
    triangle-enumeration trick: every triangle {x<y<z} is produced exactly
    once as path x→y→z closed by edge (x, z), so the plan is two
    equi-joins over the oriented edge list — no permutation blow-up.
    Per-join fan-out is bounded by the max forward-degree; on skewed
    graphs swap id order for DEGREE order (orient low→high degree), which
    bounds it by O(√|E|) (Schank & Wagner) — same plan, different sort
    key.  Counts come from exploding each triangle's three corners into
    one groupBy."""
    e = canonical_edges(edges).cache()
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    corner = tri.select(
        F.explode(F.array("x", "y", "z")).alias(id_col)
    ).groupBy(id_col).agg(F.count("*").cast("long").alias("n_triangles"))
    deg = (
        e.select(F.col("a").alias(id_col))
        .unionAll(e.select(F.col("b").alias(id_col)))
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("degree"))
    )
    out = (
        nodes.select(id_col)
        .join(deg, id_col, "left")
        .join(corner, id_col, "left")
        .fillna(0, ["degree", "n_triangles"])
    )
    coeff = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(0.0)
    return out.select(
        id_col, "degree", "n_triangles", F.round(coeff, 6).alias("clustering_coeff")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    max_rounds: int = 8,
) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of degree
    < k until the remaining subgraph is stable; return each surviving
    node with its in-core degree — the standard dense-substructure /
    spam-farm detector on link graphs.

    Each round is one degree aggregate over the live edge list plus two
    semi-joins (keep edges whose BOTH endpoints survive) — all keyed
    shuffles, nothing driver-side except the one edge-count scalar that
    tests convergence (same contract as connected_components).  Lineage
    is cut per round with localCheckpoint so the plan doesn't deepen
    with the peel depth.  Peeling depth is the graph's degeneracy
    ordering length — shallow on real link graphs (cores erode from the
    fringe in parallel); `max_rounds` bounds the worst case LOUDLY
    (raise, never a silent wrong answer): adversarial path graphs peel
    one layer per round and want the O(log n) contraction variant
    instead."""
    e = canonical_edges(edges).localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").cast("long").alias("deg"))
        )
        live = deg.filter(F.col("deg") >= k).select("v")
        e2 = (
            e.join(live.withColumnRenamed("v", "a"), "a", "leftsemi")
            .join(live.withColumnRenamed("v", "b"), "b", "leftsemi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n2 = e2.count()
        if n2 == n_edges:
            return deg.filter(F.col("deg") >= k).select(
                F.col("v").alias(id_col), F.col("deg").alias("core_degree")
            )
        e, n_edges = e2, n2
    raise RuntimeError(
        f"kcore did not converge in {max_rounds} rounds; "
        "raise max_rounds or use a contraction-based variant"
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    id_col: str = "doc_id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection, the fourth member of the graph family (CC finds components,
    PageRank ranks, k-core finds density; LPA finds communities).

    Labels start as node ids; each round EVERY node simultaneously adopts
    the most frequent label among its undirected neighbors (ties → lowest
    label; isolated nodes keep their label).  A FIXED round count makes
    the result deterministic even where synchronous LPA oscillates — and
    makes the oracle an exact unrolled-CTE replay (same contract as
    pagerank's 3-iteration oracle).

    Scale shape: per round one hash join (edges ⋈ labels on dst) + one
    (node, label) count aggregate + one per-node argmax window + one left
    join back — all keyed shuffles on node ids; labels are (id, id)
    pairs, never payloads.  Returns (id_col, community).
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionAll(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )
    for _ in range(rounds):
        nbr = und.join(
            labels.withColumnRenamed("node", "d"), "d"
        ).select(F.col("s").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("community")
    )


def bfs(
    seeds: DataFrame,
    edges: DataFrame,
    hops: int,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-hop BFS: (id, dist) for every node reachable from ``seeds``
    in at most ``hops`` directed edge traversals, dist = first round the
    node was discovered (== its shortest hop count, all weights 1).

    Scale shape: frontier-delta iteration — each round equi-joins only the
    NEWLY discovered nodes against the edge table (not the whole visited
    set), anti-joins out already-seen nodes, and cuts lineage with a
    localCheckpoint; total work is O(edges incident to the reached set),
    the same bounded-round contract as pagerank/k-core/LPA here.  No
    per-round driver collect — the loop is bounded by ``hops``, not by a
    convergence test (exactly how the oracle replays it)."""
    # distinct: a seed set derived from a non-unique source (e.g. an edge
    # list's src column) must not emit duplicate dist-0 rows
    dist = seeds.select(F.col(id_col).alias("id"), F.lit(0).alias("dist")).distinct()
    frontier = dist
    for h in range(1, hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges[src])
            .select(F.col(dst).alias("id"), F.lit(h).alias("dist"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist.withColumnRenamed("id", id_col)


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 2,
    id_col: str = "id",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), PageRank's
    mutual-reinforcement sibling: h = Σ a(out-neighbors),
    a = Σ h(in-neighbors), each half-step normalized by the MAX score
    (max is aggregation-order-independent, unlike an L2 norm).  Every
    neighborhood sum is a NEIGHBOR-ORDERED IEEE fold (sort_array +
    aggregate — the pca_embeddings discipline), so scores are
    bit-reproducible under any partitioning; nodes with no in/out edges
    hold score 0.  Returns (id, hub, authority).

    Plan per half-step: one equi-join edges⋈scores + one groupBy fold on
    the other endpoint; the max is a scalar broadcast.  Lineage stays
    bounded because iters is a fixed small constant."""
    a = nodes.select(F.col(id_col).alias("id"), F.lit(1.0).alias("v"))
    h = None

    def _half(scores: DataFrame, key: str, other: str) -> DataFrame:
        """new score(key) = ordered fold of scores(other) over edges."""
        raw = (
            edges.join(scores, edges[other] == scores["id"])
            .groupBy(F.col(key).alias("nid"))
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct(F.col(other), F.col("v")))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"],
                ).alias("v")
            )
        )
        full = (
            nodes.select(F.col(id_col).alias("id"))
            .join(raw, F.col("id") == raw["nid"], "left")
            .select("id", F.coalesce(F.col("v"), F.lit(0.0)).alias("v"))
        )
        mx = full.agg(F.max("v").alias("mx"))
        return full.crossJoin(F.broadcast(mx)).select(
            "id",
            F.when(F.col("mx") > 0, F.col("v") / F.col("mx"))
            .otherwise(F.col("v"))
            .alias("v"),
        )

    for _ in range(iters):
        h = _half(a, "src", "dst")
        a = _half(h, "dst", "src")
    return (
        h.withColumnRenamed("v", "hub")
        .join(a.withColumnRenamed("v", "authority"), "id")
    )


def sssp(
    seeds: DataFrame,
    edges: DataFrame,
    rounds: int,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Bounded-round single-source-set shortest paths (Bellman-Ford over
    INTEGER edge weights): after k rounds, dist(v) is exact for every
    path of ≤ k edges — the weighted sibling of bfs() (whose unit-weight
    frontier delta can't early-stop here, because a later round may
    REVISIT a node through a cheaper longer path).  Each round is one
    equi-join (current dists ⋈ edges) + one min-groupBy, lineage cut per
    round; distances stay BIGINT throughout, so results are exact on any
    engine."""
    dist = seeds.select(
        F.col(id_col).alias("id"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    for _ in range(rounds):
        relax = (
            dist.join(edges, dist["id"] == edges[src])
            .select(
                F.col(dst).alias("id"),
                (F.col("dist") + F.col(w_col)).cast("long").alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relax)
            .groupBy("id")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.withColumnRenamed("id", id_col)
