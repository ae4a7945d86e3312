"""Round-14 evaluation additions: clustering-validation indices over the
exact-integer k-means (ARI / purity / NMI / V-measure / Fowlkes-Mallows /
silhouette / Davies-Bouldin / Calinski-Harabasz / Dunn / the contingency
table itself), threshold-free classifier metrics over the NB quality
scores (PR-AUC, score-KS, MCC confusion suite, decile lift/gains, Brier
decomposition), and multi-query retrieval metrics (MRR, MAP@10) — the
"did the model/clustering/index actually work" report every curation
pipeline runs after nb_quality / kmeans_* / bm25_search produce their
artifacts.

Round-15 additions (VERDICT r14 #3, the remaining eval edge): exact
tie-aware ROC AUC + the 10-point decile ROC curve, the cost-sensitive
threshold sweep, per-stratum (per-source) calibration, grid log loss,
and mean NDCG@10 over the fixed retrieval eval set.

Parity discipline (the repo-wide rules): every metric reduces to exact
BIGINT contingency/rank/confusion sums first; doubles enter in ONE
closed-form expression written with the identical tree in both engines;
sums of per-cell doubles (entropies, AP terms, bin terms) fold in FIXED
grid order via sorted-list reduction (the chi2_independence discipline),
never shuffle order; square roots are IEEE-correctly-rounded and appear
once per expression.

Scale shape: the corpus collapses in one map-side-combined pass onto a
bounded grid — the k×|labels| contingency, the distinct-score grid, the
10-bin calibration grid, the k-row centroid table — and every statistic
evaluates on that grid.  The only k·n frame (all-centroid distances for
silhouette) fans out by the centroid count k, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import clustering
from fusionspark.operators.spectral import SCALE
from fusionspark.queries import query
from fusionspark.queries.clustering_queries import _CHAIN, _FINAL, _ITERS
from fusionspark.queries.pipeline_queries import NB_QUALITY_ORACLE, _NB_POS


# ---------------------------------------------------------------------------
# shared frames
# ---------------------------------------------------------------------------

#: ×(SCALE·R) grid → original embedding units
_DENOM = float(SCALE) * float(clustering.R)

#: final-round CTE names inside _CHAIN ( clustering_queries._round_ctes )
_DALL = f"d{_ITERS + 1}"  # dense row×centroid exact distances
_CENT = f"cent{_ITERS}"  # final centroid grid

#: assignment+label frame and the k×|labels| contingency, shared by every
#: partition-comparison index below
_LAB_CTE = f"""{_CHAIN},
    lab AS (
        SELECT a.vec_id, a.c, a.d2, e.label
        FROM {_FINAL} a JOIN embeddings e USING (vec_id)
    ),
    ct AS (SELECT c, label, COUNT(*)::BIGINT AS nij FROM lab GROUP BY c, label),
    am AS (SELECT c, SUM(nij)::BIGINT AS ai FROM ct GROUP BY c),
    bm AS (SELECT label, SUM(nij)::BIGINT AS bj FROM ct GROUP BY label),
    nn AS (SELECT SUM(nij)::BIGINT AS n FROM ct)"""


def _kmeans_lab(spark: SparkSession, sf_dir: str):
    """(assignment ⋈ label) frame + the (rows, cents) state behind it."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows, cents = clustering.lloyd_state(emb)
    own = clustering._assign(rows, cents).select(
        F.col("id").alias("vec_id"), "cluster", "dist2"
    )
    lab = own.join(emb.select("vec_id", "label"), "vec_id")
    return lab, rows, cents


def _contingency(lab: DataFrame) -> DataFrame:
    return lab.groupBy("cluster", "label").agg(
        F.count("*").cast("long").alias("nij")
    )


def _ordered_fold(terms: DataFrame, order_cols: list[str], term_col: str,
                  out_name: str) -> DataFrame:
    """Σ term in FIXED (order_cols) order — sorted-struct left fold, the
    chi2_independence discipline (bit-stable under any partitioning)."""
    return terms.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(*order_cols, term_col))),
            F.lit(0.0),
            lambda acc, s: acc + s[term_col],
        ).alias(out_name)
    )


# ---------------------------------------------------------------------------
# cluster_contingency — the k×|labels| table itself
# ---------------------------------------------------------------------------


@query(
    "cluster_contingency",
    f"""
    WITH {_LAB_CTE}
    SELECT ct.c::INT AS cluster, ct.label, ct.nij AS n,
           am.ai AS cluster_size, bm.bj AS label_size
    FROM ct JOIN am USING (c) JOIN bm USING (label)
    ORDER BY cluster, label
    """,
)
def cluster_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster×label contingency table with both margins — the raw
    material every external validation index consumes, and the first
    thing anyone inspects when a clustering disagrees with its labels.

    Scale: one groupBy of the n-row assignment onto the k×|labels| grid
    (map-side combined); margins are grid-sized re-aggregations."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab)
    am = ct.groupBy("cluster").agg(F.sum("nij").cast("long").alias("cluster_size"))
    bm = ct.groupBy("label").agg(F.sum("nij").cast("long").alias("label_size"))
    return (
        ct.join(am, "cluster")
        .join(bm, "label")
        .select(
            F.col("cluster").cast("int"),
            "label",
            F.col("nij").alias("n"),
            "cluster_size",
            "label_size",
        )
        .orderBy("cluster", "label")
    )


# ---------------------------------------------------------------------------
# cluster_ari — Rand / adjusted Rand
# ---------------------------------------------------------------------------


@query(
    "cluster_ari",
    f"""
    WITH {_LAB_CTE},
    s AS (
        SELECT (SELECT SUM(nij * (nij - 1) / 2)::BIGINT FROM ct) AS sij,
               (SELECT SUM(ai * (ai - 1) / 2)::BIGINT FROM am) AS sa,
               (SELECT SUM(bj * (bj - 1) / 2)::BIGINT FROM bm) AS sb,
               (SELECT (n * (n - 1) / 2)::BIGINT FROM nn) AS t,
               (SELECT n FROM nn) AS n
    )
    SELECT n, t AS n_pairs, sij AS agree_pairs,
           ROUND((t + 2 * sij - sa - sb)::DOUBLE / t, 6) AS rand_index,
           CASE WHEN t * (sa + sb) <> 2 * sa * sb
                THEN ROUND((2.0 * (t * sij - sa * sb))
                           / (t * (sa + sb) - 2.0 * sa * sb), 6) + 0.0
           END AS ari
    FROM s
    """,
)
def cluster_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rand index and adjusted Rand index (Hubert & Arabie 1985) between
    the exact-k-means partition and the generator labels — the standard
    chance-corrected partition agreement.  ARI is rewritten over the
    common denominator T so every ingredient is an exact BIGINT pair
    count (Σ C(nij,2), margin sums, T = C(n,2)): ari =
    2(T·Σij − Sa·Sb) / (T(Sa+Sb) − 2·Sa·Sb), ONE division of exactly
    representable doubles (products ≤ T² ≈ 4e12 here; above ~3e9 pairs
    swap the BIGINT products for DECIMAL(38,0) ≡ HUGEINT — the r13
    headroom pattern).

    Scale: everything after the one corpus groupBy runs on the
    k×|labels| grid."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab).localCheckpoint(eager=True)
    sij = ct.agg(
        (F.sum(F.col("nij") * (F.col("nij") - 1)) / 2).cast("long").alias("sij")
    )
    sa = (
        ct.groupBy("cluster")
        .agg(F.sum("nij").alias("ai"))
        .agg((F.sum(F.col("ai") * (F.col("ai") - 1)) / 2).cast("long").alias("sa"))
    )
    sb = (
        ct.groupBy("label")
        .agg(F.sum("nij").alias("bj"))
        .agg((F.sum(F.col("bj") * (F.col("bj") - 1)) / 2).cast("long").alias("sb"))
    )
    nn = ct.agg(F.sum("nij").cast("long").alias("n"))
    s = (
        sij.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(nn))
        .select(
            "sij", "sa", "sb", "n",
            (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("t"),
        )
    )
    t, sa_, sb_, sij_ = F.col("t"), F.col("sa"), F.col("sb"), F.col("sij")
    return s.select(
        "n",
        t.alias("n_pairs"),
        sij_.alias("agree_pairs"),
        F.round((t + 2 * sij_ - sa_ - sb_).cast("double") / t, 6).alias(
            "rand_index"
        ),
        F.when(
            t * (sa_ + sb_) != 2 * sa_ * sb_,
            F.round(
                (2.0 * (t * sij_ - sa_ * sb_))
                / (t * (sa_ + sb_) - 2.0 * sa_ * sb_),
                6,
            )
            + 0.0,
        ).alias("ari"),
    )


# ---------------------------------------------------------------------------
# cluster_purity — purity and inverse purity
# ---------------------------------------------------------------------------


@query(
    "cluster_purity",
    f"""
    WITH {_LAB_CTE},
    pc AS (SELECT c, MAX(nij)::BIGINT AS mx FROM ct GROUP BY c),
    pl AS (SELECT label, MAX(nij)::BIGINT AS mx FROM ct GROUP BY label)
    SELECT nn.n,
           (SELECT SUM(mx)::BIGINT FROM pc) AS majority_sum,
           ROUND((SELECT SUM(mx) FROM pc)::DOUBLE / nn.n, 6) AS purity,
           ROUND((SELECT SUM(mx) FROM pl)::DOUBLE / nn.n, 6)
               AS inverse_purity
    FROM nn
    """,
)
def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity (each cluster votes its majority label) and inverse purity
    (each label votes its majority cluster) — the zeroth-order external
    index, exact integer majority sums with one division each.

    Scale: grid-only after the contingency groupBy."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab).localCheckpoint(eager=True)
    pc = ct.groupBy("cluster").agg(F.max("nij").alias("mx")).agg(
        F.sum("mx").cast("long").alias("mc")
    )
    pl = ct.groupBy("label").agg(F.max("nij").alias("mx")).agg(
        F.sum("mx").cast("long").alias("ml")
    )
    nn = ct.agg(F.sum("nij").cast("long").alias("n"))
    return (
        nn.crossJoin(F.broadcast(pc))
        .crossJoin(F.broadcast(pl))
        .select(
            "n",
            F.col("mc").alias("majority_sum"),
            F.round(F.col("mc").cast("double") / F.col("n"), 6).alias("purity"),
            F.round(F.col("ml").cast("double") / F.col("n"), 6).alias(
                "inverse_purity"
            ),
        )
    )


# ---------------------------------------------------------------------------
# fowlkes_mallows — pair-counting precision/recall geometric mean
# ---------------------------------------------------------------------------


@query(
    "fowlkes_mallows",
    f"""
    WITH {_LAB_CTE},
    s AS (
        SELECT (SELECT SUM(nij * (nij - 1) / 2)::BIGINT FROM ct) AS tp,
               (SELECT SUM(ai * (ai - 1) / 2)::BIGINT FROM am) AS sa,
               (SELECT SUM(bj * (bj - 1) / 2)::BIGINT FROM bm) AS sb
    )
    SELECT tp AS tp_pairs, (sa - tp)::BIGINT AS fp_pairs,
           (sb - tp)::BIGINT AS fn_pairs,
           CASE WHEN sa > 0 AND sb > 0
                THEN ROUND(tp / sqrt(sa::DOUBLE * sb::DOUBLE), 6) + 0.0
           END AS fowlkes_mallows
    FROM s
    """,
)
def fowlkes_mallows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fowlkes-Mallows index: TP/√((TP+FP)(TP+FN)) over co-membership
    pairs — the geometric mean of pair-precision and pair-recall, from
    the SAME exact integer pair counts as cluster_ari (different
    normalization: FM has no chance correction, so the two indices
    disagree exactly when cluster sizes are skewed).  √ of an exact
    int64→double product is IEEE-correctly-rounded — deterministic.

    Scale: grid-only after the contingency groupBy."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab).localCheckpoint(eager=True)
    sij = ct.agg(
        (F.sum(F.col("nij") * (F.col("nij") - 1)) / 2).cast("long").alias("tp")
    )
    sa = (
        ct.groupBy("cluster")
        .agg(F.sum("nij").alias("ai"))
        .agg((F.sum(F.col("ai") * (F.col("ai") - 1)) / 2).cast("long").alias("sa"))
    )
    sb = (
        ct.groupBy("label")
        .agg(F.sum("nij").alias("bj"))
        .agg((F.sum(F.col("bj") * (F.col("bj") - 1)) / 2).cast("long").alias("sb"))
    )
    s = sij.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    tp, sa_, sb_ = F.col("tp"), F.col("sa"), F.col("sb")
    return s.select(
        tp.alias("tp_pairs"),
        (sa_ - tp).cast("long").alias("fp_pairs"),
        (sb_ - tp).cast("long").alias("fn_pairs"),
        F.when(
            (sa_ > 0) & (sb_ > 0),
            F.round(tp / F.sqrt(sa_.cast("double") * sb_.cast("double")), 6)
            + 0.0,
        ).alias("fowlkes_mallows"),
    )


# ---------------------------------------------------------------------------
# cluster_nmi — mutual information / normalized MI
# ---------------------------------------------------------------------------


@query(
    "cluster_nmi",
    f"""
    WITH {_LAB_CTE},
    mt AS (
        SELECT ct.c, ct.label,
               (ct.nij::DOUBLE / nn.n)
               * ln((ct.nij * nn.n)::DOUBLE / (am.ai * bm.bj)::DOUBLE) AS term
        FROM ct JOIN am USING (c) JOIN bm USING (label) CROSS JOIN nn
    ),
    mi AS (
        SELECT list_reduce(list_prepend(0.0, list(term ORDER BY c, label)),
                           (a, x) -> a + x) AS mi
        FROM mt
    ),
    hc AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(ai::DOUBLE / nn.n) * ln(ai::DOUBLE / nn.n) ORDER BY c)),
                           (a, x) -> a + x) AS hc
        FROM am CROSS JOIN nn
    ),
    hl AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(bj::DOUBLE / nn.n) * ln(bj::DOUBLE / nn.n) ORDER BY label)),
                           (a, x) -> a + x) AS hl
        FROM bm CROSS JOIN nn
    )
    SELECT ROUND(mi.mi, 6) + 0.0 AS mutual_information,
           ROUND(hc.hc, 6) + 0.0 AS h_cluster,
           ROUND(hl.hl, 6) + 0.0 AS h_label,
           CASE WHEN hc.hc + hl.hl > 0
                THEN ROUND(2.0 * mi.mi / (hc.hc + hl.hl), 6) + 0.0
           END AS nmi
    FROM mi, hc, hl
    """,
)
def cluster_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the k-means partition and the labels,
    normalized by the arithmetic mean of the two entropies (sklearn's
    default NMI) — the information-theoretic partition agreement that,
    unlike purity, punishes shattering a label across clusters.

    Parity: each MI term is ln of ONE division of exactly representable
    integer products ((nij·n) ≤ 4e6 here), folded in fixed (c, label)
    grid order; entropies fold in margin order — bit-stable under any
    partitioning.  Scale: grid-only after the contingency groupBy."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab).localCheckpoint(eager=True)
    am = ct.groupBy("cluster").agg(F.sum("nij").cast("long").alias("ai"))
    bm = ct.groupBy("label").agg(F.sum("nij").cast("long").alias("bj"))
    nn = ct.agg(F.sum("nij").cast("long").alias("n"))
    mt = (
        ct.join(am, "cluster")
        .join(bm, "label")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("cluster").alias("c"),
            "label",
            (
                (F.col("nij").cast("double") / F.col("n"))
                * F.log(
                    (F.col("nij") * F.col("n")).cast("double")
                    / (F.col("ai") * F.col("bj")).cast("double")
                )
            ).alias("term"),
        )
    )
    mi = _ordered_fold(mt, ["c", "label"], "term", "mi")
    hc = _ordered_fold(
        am.crossJoin(F.broadcast(nn)).select(
            "cluster",
            (
                -(F.col("ai").cast("double") / F.col("n"))
                * F.log(F.col("ai").cast("double") / F.col("n"))
            ).alias("term"),
        ),
        ["cluster"],
        "term",
        "hc",
    )
    hl = _ordered_fold(
        bm.crossJoin(F.broadcast(nn)).select(
            "label",
            (
                -(F.col("bj").cast("double") / F.col("n"))
                * F.log(F.col("bj").cast("double") / F.col("n"))
            ).alias("term"),
        ),
        ["label"],
        "term",
        "hl",
    )
    s = mi.crossJoin(F.broadcast(hc)).crossJoin(F.broadcast(hl))
    return s.select(
        (F.round("mi", 6) + 0.0).alias("mutual_information"),
        (F.round("hc", 6) + 0.0).alias("h_cluster"),
        (F.round("hl", 6) + 0.0).alias("h_label"),
        F.when(
            F.col("hc") + F.col("hl") > 0,
            F.round(2.0 * F.col("mi") / (F.col("hc") + F.col("hl")), 6) + 0.0,
        ).alias("nmi"),
    )


# ---------------------------------------------------------------------------
# cluster_vmeasure — homogeneity / completeness / V
# ---------------------------------------------------------------------------


@query(
    "cluster_vmeasure",
    f"""
    WITH {_LAB_CTE},
    hlc AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(ct.nij::DOUBLE / nn.n)
                   * ln(ct.nij::DOUBLE / am.ai) ORDER BY ct.c, ct.label)),
                           (a, x) -> a + x) AS v
        FROM ct JOIN am USING (c) CROSS JOIN nn
    ),
    hcl AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(ct.nij::DOUBLE / nn.n)
                   * ln(ct.nij::DOUBLE / bm.bj) ORDER BY ct.c, ct.label)),
                           (a, x) -> a + x) AS v
        FROM ct JOIN bm USING (label) CROSS JOIN nn
    ),
    hc AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(ai::DOUBLE / nn.n) * ln(ai::DOUBLE / nn.n) ORDER BY c)),
                           (a, x) -> a + x) AS v
        FROM am CROSS JOIN nn
    ),
    hl AS (
        SELECT list_reduce(list_prepend(0.0, list(
                   -(bj::DOUBLE / nn.n) * ln(bj::DOUBLE / nn.n) ORDER BY label)),
                           (a, x) -> a + x) AS v
        FROM bm CROSS JOIN nn
    ),
    s AS (
        SELECT CASE WHEN hl.v > 0 THEN 1.0 - hlc.v / hl.v ELSE 1.0 END AS h,
               CASE WHEN hc.v > 0 THEN 1.0 - hcl.v / hc.v ELSE 1.0 END AS c
        FROM hlc, hcl, hc, hl
    )
    SELECT ROUND(h, 6) + 0.0 AS homogeneity, ROUND(c, 6) + 0.0 AS completeness,
           CASE WHEN h + c > 0 THEN ROUND(2.0 * h * c / (h + c), 6) + 0.0
                ELSE 0.0 END AS v_measure
    FROM s
    """,
)
def cluster_vmeasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homogeneity (each cluster holds one label), completeness (each
    label lives in one cluster), and their harmonic mean V
    (Rosenberg & Hirschberg 2007) — the conditional-entropy view of the
    same contingency grid as cluster_nmi, with the asymmetry NMI hides.

    Parity: conditional entropies fold in fixed (c, label) order; each
    term is ln of one exact-integer division.  Scale: grid-only."""
    lab, _, _ = _kmeans_lab(spark, sf_dir)
    ct = _contingency(lab).localCheckpoint(eager=True)
    am = ct.groupBy("cluster").agg(F.sum("nij").cast("long").alias("ai"))
    bm = ct.groupBy("label").agg(F.sum("nij").cast("long").alias("bj"))
    nn = ct.agg(F.sum("nij").cast("long").alias("n"))
    hlc = _ordered_fold(
        ct.join(am, "cluster").crossJoin(F.broadcast(nn)).select(
            F.col("cluster").alias("c"),
            "label",
            (
                -(F.col("nij").cast("double") / F.col("n"))
                * F.log(F.col("nij").cast("double") / F.col("ai"))
            ).alias("term"),
        ),
        ["c", "label"],
        "term",
        "hlc",
    )
    hcl = _ordered_fold(
        ct.join(bm, "label").crossJoin(F.broadcast(nn)).select(
            F.col("cluster").alias("c"),
            "label",
            (
                -(F.col("nij").cast("double") / F.col("n"))
                * F.log(F.col("nij").cast("double") / F.col("bj"))
            ).alias("term"),
        ),
        ["c", "label"],
        "term",
        "hcl",
    )
    hc = _ordered_fold(
        am.crossJoin(F.broadcast(nn)).select(
            "cluster",
            (
                -(F.col("ai").cast("double") / F.col("n"))
                * F.log(F.col("ai").cast("double") / F.col("n"))
            ).alias("term"),
        ),
        ["cluster"],
        "term",
        "hc",
    )
    hl = _ordered_fold(
        bm.crossJoin(F.broadcast(nn)).select(
            "label",
            (
                -(F.col("bj").cast("double") / F.col("n"))
                * F.log(F.col("bj").cast("double") / F.col("n"))
            ).alias("term"),
        ),
        ["label"],
        "term",
        "hl",
    )
    s = (
        hlc.crossJoin(F.broadcast(hcl))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            F.when(F.col("hl") > 0, 1.0 - F.col("hlc") / F.col("hl"))
            .otherwise(1.0)
            .alias("h"),
            F.when(F.col("hc") > 0, 1.0 - F.col("hcl") / F.col("hc"))
            .otherwise(1.0)
            .alias("c"),
        )
    )
    return s.select(
        (F.round("h", 6) + 0.0).alias("homogeneity"),
        (F.round("c", 6) + 0.0).alias("completeness"),
        F.when(
            F.col("h") + F.col("c") > 0,
            F.round(2.0 * F.col("h") * F.col("c") / (F.col("h") + F.col("c")), 6)
            + 0.0,
        )
        .otherwise(0.0)
        .alias("v_measure"),
    )


# ---------------------------------------------------------------------------
# internal (label-free) geometry indices over the same k-means state
# ---------------------------------------------------------------------------

#: literal constants shared with clustering_queries' oracle: the ×R
#: centroid grid in original units and its square (kmeans_clusters)
_DENR = "102400000.0"  # SCALE * R = 1e5 * 1024
_DENR2 = "1.048576e16"


def _cent_df(spark: SparkSession, cents: list[list[int]]) -> DataFrame:
    """The k-row final-centroid table from the driver-side literal (the
    bounded k·d collect contract, same as the in-plan centroid array)."""
    return spark.createDataFrame(
        [(c, [int(v) for v in cents[c]]) for c in range(len(cents))],
        schema="c int, ca array<long>",
    )


@query(
    "calinski_harabasz",
    f"""
    WITH {_CHAIN},
    sz AS (SELECT c, COUNT(*)::BIGINT AS nc FROM {_FINAL} GROUP BY c),
    nn2 AS (SELECT COUNT(*)::BIGINT AS n FROM x),
    gs AS (
        SELECT list(s ORDER BY j) AS sarr FROM (
            SELECT dd.d AS j, SUM(x.xi[dd.d + 1])::BIGINT AS s
            FROM x, dims dd GROUP BY dd.d
        )
    ),
    bt AS (
        SELECT sz.c,
               sz.nc * list_reduce(list_prepend(0.0, list_transform(range(64),
                   i -> (ct.ca[i + 1]::DOUBLE / {_DENR}
                         - gs.sarr[i + 1]::DOUBLE / (nn2.n * 100000.0))
                        * (ct.ca[i + 1]::DOUBLE / {_DENR}
                           - gs.sarr[i + 1]::DOUBLE / (nn2.n * 100000.0)))),
                   (a, xx) -> a + xx) AS term
        FROM sz JOIN {_CENT} ct USING (c), gs, nn2
    ),
    bf AS (
        SELECT list_reduce(list_prepend(0.0, list(term ORDER BY c)),
                           (a, x) -> a + x) AS b,
               COUNT(*)::BIGINT AS keff
        FROM bt
    ),
    wt AS (SELECT SUM(d2)::HUGEINT AS w FROM {_FINAL})
    SELECT nn2.n, bf.keff, bf.b AS between_ss,
           wt.w::DOUBLE / {_DENR2} AS within_ss,
           CASE WHEN bf.keff > 1 AND nn2.n > bf.keff AND wt.w > 0
                THEN (bf.b / (bf.keff - 1))
                     / ((wt.w::DOUBLE / {_DENR2}) / (nn2.n - bf.keff))
           END AS calinski_harabasz
    FROM bf, wt, nn2
    """,
)
def calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio criterion over the exact k-means
    state: between-group SS from the integer centroid grid vs the global
    integer mean, within-group SS = the exact Σ dist² the assignment
    already carries (HUGEINT ≡ DECIMAL(38,0) — a BIGINT sum could
    overflow).  Doubles appear only in the final closed forms (per-dim
    deviations fold in-row over the FIXED dim order; cluster terms fold
    in cluster order), so the index is bit-stable under any partitioning.
    Raw doubles out — identical expression trees, no rounding needed.

    Scale: one corpus pass for the 64 global sums + the grid-sized
    centroid table; k_eff counts non-empty clusters."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows, cents = clustering.lloyd_state(emb)
    own = clustering._assign(rows, cents)
    sz = own.groupBy("cluster").agg(F.count("*").cast("long").alias("nc"))
    nn2 = rows.agg(F.count("*").cast("long").alias("n"))
    gs = rows.agg(
        F.array(
            *[F.sum(F.col("xi")[i]).cast("long") for i in range(64)]
        ).alias("sarr")
    )
    cdf = _cent_df(spark, cents)
    denr = float(_DENR)
    bt = (
        sz.withColumnRenamed("cluster", "c")
        .join(cdf, "c")
        .crossJoin(F.broadcast(gs))
        .crossJoin(F.broadcast(nn2))
        .select(
            "c",
            (
                F.col("nc")
                * F.aggregate(
                    F.zip_with(
                        "ca",
                        "sarr",
                        lambda cv, sv: (
                            cv.cast("double") / denr
                            - sv.cast("double") / (F.col("n") * 100000.0)
                        )
                        * (
                            cv.cast("double") / denr
                            - sv.cast("double") / (F.col("n") * 100000.0)
                        ),
                    ),
                    F.lit(0.0),
                    lambda a, xx: a + xx,
                )
            ).alias("term"),
        )
    )
    bf = bt.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("c", "term"))),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("b"),
        F.count("*").cast("long").alias("keff"),
    )
    wt = own.agg(F.sum(F.col("dist2").cast("decimal(38,0)")).alias("w"))
    denr2 = float(_DENR2)
    out = bf.crossJoin(F.broadcast(wt)).crossJoin(F.broadcast(nn2))
    return out.select(
        "n",
        "keff",
        F.col("b").alias("between_ss"),
        (F.col("w").cast("double") / denr2).alias("within_ss"),
        F.when(
            (F.col("keff") > 1) & (F.col("n") > F.col("keff")) & (F.col("w") > 0),
            (F.col("b") / (F.col("keff") - 1))
            / ((F.col("w").cast("double") / denr2) / (F.col("n") - F.col("keff"))),
        ).alias("calinski_harabasz"),
    )


@query(
    "davies_bouldin",
    f"""
    WITH {_CHAIN},
    du AS (
        SELECT vec_id, c,
               FLOOR(sqrt(d2::DOUBLE) * 1000000.0 / {_DENR} + 0.5)::BIGINT AS du
        FROM {_FINAL}
    ),
    si AS (SELECT c, SUM(du)::BIGINT AS su, COUNT(*)::BIGINT AS nc
           FROM du GROUP BY c),
    pm AS (
        SELECT a.c AS i, b.c AS j,
               list_reduce(list_transform(range(64),
                   k -> ((a.ca[k + 1] - b.ca[k + 1])
                         * (a.ca[k + 1] - b.ca[k + 1]))::HUGEINT),
                   (x, y) -> x + y) AS m2
        FROM {_CENT} a JOIN {_CENT} b ON a.c <> b.c
    ),
    r AS (
        SELECT pm.i,
               MAX((s1.su::DOUBLE / s1.nc + s2.su::DOUBLE / s2.nc)
                   / (sqrt(pm.m2::DOUBLE) * 1000000.0 / {_DENR})) AS rmax
        FROM pm JOIN si s1 ON s1.c = pm.i JOIN si s2 ON s2.c = pm.j
    GROUP BY pm.i
    ),
    f AS (
        SELECT list_reduce(list_prepend(0.0, list(rmax ORDER BY i)),
                           (a, x) -> a + x) AS s,
               COUNT(*)::BIGINT AS keff
        FROM r
    )
    SELECT keff, s / keff AS davies_bouldin FROM f
    """,
)
def davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin index over the exact k-means state: per-cluster
    scatter S_i as the micro-unit-quantized mean member distance (exact
    BIGINT sums — fold-order free), centroid separations M_ij folded
    from the integer grid in HUGEINT ≡ DECIMAL(38,0) (the per-element
    square fits int64, the 64-term sum does not), similarity R_ij =
    (S_i+S_j)/M_ij, DB = mean over clusters of max_j R_ij (max is
    order-free; the k-term mean folds in cluster order).  Raw double
    out — identical expression trees in both engines.

    Scale: one corpus pass for the scatter sums; everything else is the
    k-row centroid grid (pairs restricted to non-empty clusters by the
    scatter join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows, cents = clustering.lloyd_state(emb)
    own = clustering._assign(rows, cents)
    denr = float(_DENR)
    du = own.select(
        "cluster",
        F.floor(F.sqrt(F.col("dist2").cast("double")) * 1000000.0 / denr + 0.5)
        .cast("long")
        .alias("du"),
    )
    si = du.groupBy("cluster").agg(
        F.sum("du").cast("long").alias("su"), F.count("*").cast("long").alias("nc")
    )
    cdf = _cent_df(spark, cents)
    a, b = cdf.alias("a"), cdf.alias("b")
    pm = (
        a.join(F.broadcast(b), F.col("a.c") != F.col("b.c"))
        .select(
            F.col("a.c").alias("i"),
            F.col("b.c").alias("j"),
            F.aggregate(
                F.zip_with(
                    "a.ca", "b.ca", lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, t: acc + t.cast("decimal(38,0)"),
            ).alias("m2"),
        )
    )
    s1 = si.withColumnRenamed("cluster", "i").withColumnRenamed(
        "su", "su1"
    ).withColumnRenamed("nc", "nc1")
    s2 = si.withColumnRenamed("cluster", "j").withColumnRenamed(
        "su", "su2"
    ).withColumnRenamed("nc", "nc2")
    r = (
        pm.join(F.broadcast(s1), "i")
        .join(F.broadcast(s2), "j")
        .groupBy("i")
        .agg(
            F.max(
                (
                    F.col("su1").cast("double") / F.col("nc1")
                    + F.col("su2").cast("double") / F.col("nc2")
                )
                / (F.sqrt(F.col("m2").cast("double")) * 1000000.0 / denr)
            ).alias("rmax")
        )
    )
    f = r.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("i", "rmax"))),
            F.lit(0.0),
            lambda acc, s: acc + s["rmax"],
        ).alias("s"),
        F.count("*").cast("long").alias("keff"),
    )
    return f.select("keff", (F.col("s") / F.col("keff")).alias("davies_bouldin"))


@query(
    "dunn_centroid",
    f"""
    WITH {_CHAIN},
    live AS (SELECT DISTINCT c FROM {_FINAL}),
    pm AS (
        SELECT list_reduce(list_transform(range(64),
                   k -> ((a.ca[k + 1] - b.ca[k + 1])
                         * (a.ca[k + 1] - b.ca[k + 1]))::HUGEINT),
                   (x, y) -> x + y) AS m2
        FROM {_CENT} a JOIN live la ON la.c = a.c
             JOIN {_CENT} b ON a.c < b.c JOIN live lb ON lb.c = b.c
    ),
    mn AS (SELECT MIN(m2) AS minm2 FROM pm),
    mr AS (SELECT MAX(d2)::BIGINT AS maxd2 FROM {_FINAL})
    SELECT sqrt(minm2::DOUBLE) / {_DENR} AS min_centroid_dist,
           sqrt(maxd2::DOUBLE) / {_DENR} AS max_radius,
           CASE WHEN maxd2 > 0
                THEN sqrt(minm2::DOUBLE) / (2.0 * sqrt(maxd2::DOUBLE))
           END AS dunn_index
    FROM mn, mr
    """,
)
def dunn_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-linkage Dunn index: minimum inter-centroid separation
    over the maximum cluster diameter proxy (2× the largest member
    distance) — the cheap-at-scale variant of Dunn's pairwise-diameter
    index (which is a blocked quadratic; this form is grid-only).  min
    and max are order-free on exact integers; √ appears once per
    operand.  Raw doubles out.

    Scale: one pass for max d2; the pair table is k²/2 rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows, cents = clustering.lloyd_state(emb)
    own = clustering._assign(rows, cents)
    live = own.select("cluster").distinct().withColumnRenamed("cluster", "c")
    cdf = _cent_df(spark, cents).join(F.broadcast(live), "c")
    a, b = cdf.alias("a"), cdf.alias("b")
    pm = a.join(F.broadcast(b), F.col("a.c") < F.col("b.c")).select(
        F.aggregate(
            F.zip_with("a.ca", "b.ca", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, t: acc + t.cast("decimal(38,0)"),
        ).alias("m2")
    )
    mn = pm.agg(F.min("m2").alias("minm2"))
    mr = own.agg(F.max("dist2").cast("long").alias("maxd2"))
    denr = float(_DENR)
    return mn.crossJoin(F.broadcast(mr)).select(
        (F.sqrt(F.col("minm2").cast("double")) / denr).alias("min_centroid_dist"),
        (F.sqrt(F.col("maxd2").cast("double")) / denr).alias("max_radius"),
        F.when(
            F.col("maxd2") > 0,
            F.sqrt(F.col("minm2").cast("double"))
            / (2.0 * F.sqrt(F.col("maxd2").cast("double"))),
        ).alias("dunn_index"),
    )


@query(
    "silhouette_simplified",
    f"""
    WITH {_CHAIN},
    b2 AS (
        SELECT d.vec_id, MIN(d.d2)::BIGINT AS bo
        FROM {_DALL} d JOIN {_FINAL} o
          ON o.vec_id = d.vec_id AND d.c <> o.c
        GROUP BY d.vec_id
    ),
    s AS (
        SELECT o.c,
               CASE WHEN GREATEST(sqrt(o.d2::DOUBLE), sqrt(b2.bo::DOUBLE)) > 0
                    THEN (sqrt(b2.bo::DOUBLE) - sqrt(o.d2::DOUBLE))
                         / GREATEST(sqrt(o.d2::DOUBLE), sqrt(b2.bo::DOUBLE))
                    ELSE 0.0 END AS sil
        FROM {_FINAL} o JOIN b2 USING (vec_id)
    ),
    q AS (
        SELECT c, SUM(FLOOR(sil * 1000000.0 + 0.5)::BIGINT)::BIGINT AS su,
               COUNT(*)::BIGINT AS nc
        FROM s GROUP BY c
    )
    SELECT c::INT AS cluster, nc AS n,
           su::DOUBLE / (nc * 1000000.0) AS silhouette
    FROM q ORDER BY cluster
    """,
)
def silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette (distance-to-centroid form,
    the O(n·k) variant that scales where exact silhouette's O(n²) pair
    walk cannot): a = own-centroid distance, b = nearest-other-centroid
    distance, s = (b−a)/max(a,b); per-row values quantize to exact
    micro-units before the mean so the per-cluster aggregate is an
    order-free BIGINT sum with ONE division.  Raw doubles out.

    Scale: the only n·k frame in the module — the all-centroid distance
    fan-out (assign_all); bounded by k, never a self-join."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows, cents = clustering.lloyd_state(emb)
    own = clustering._assign(rows, cents).select(
        F.col("id"), F.col("cluster"), F.col("dist2")
    )
    allc = clustering.assign_all(rows, cents)
    b2 = (
        allc.join(own, "id")
        .filter(F.col("c") != F.col("cluster"))
        .groupBy("id")
        .agg(F.min("d2").cast("long").alias("bo"))
    )
    av = F.sqrt(F.col("dist2").cast("double"))
    bv = F.sqrt(F.col("bo").cast("double"))
    s = own.join(b2, "id").select(
        "cluster",
        F.when(
            F.greatest(av, bv) > 0, (bv - av) / F.greatest(av, bv)
        )
        .otherwise(0.0)
        .alias("sil"),
    )
    q = s.groupBy("cluster").agg(
        F.sum(F.floor(F.col("sil") * 1000000.0 + 0.5).cast("long"))
        .cast("long")
        .alias("su"),
        F.count("*").cast("long").alias("nc"),
    )
    return q.select(
        F.col("cluster").cast("int"),
        F.col("nc").alias("n"),
        (F.col("su").cast("double") / (F.col("nc") * 1000000.0)).alias(
            "silhouette"
        ),
    ).orderBy("cluster")


# ---------------------------------------------------------------------------
# classifier metrics over the NB quality scores
# ---------------------------------------------------------------------------

from fusionspark.operators import textstats  # noqa: E402  (NB scorer)

#: the (score, label, micro-probability) frame behind every classifier
#: metric below — classifier_eval's p CTE, shared verbatim
_NBP_CTE = f"""nbq AS ({NB_QUALITY_ORACLE}),
    p AS (
        SELECT n.doc_id, n.nb_score AS s, n.quality_pred AS pred,
               CASE WHEN d.source IN {_NB_POS} THEN 1 ELSE 0 END AS y,
               FLOOR(1000000.0 / (1.0 + exp(-n.nb_score)) + 0.5)::BIGINT AS pu
        FROM nbq n JOIN documents d USING (doc_id)
    )"""


def _nb_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s, pred, y, pu) — the classifier_eval scoring frame."""
    d = load_table(spark, sf_dir, "documents")
    pos = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    neg = F.col("source").isin("src15", "src16", "src17", "src18", "src19")
    nb = textstats.nb_quality_scores(d, pos, neg)
    lab = nb.select(
        "doc_id", F.col("nb_score").alias("s"), F.col("quality_pred").alias("pred")
    ).join(d.select("doc_id", pos.cast("int").alias("y")), "doc_id")
    return lab.select(
        "doc_id",
        "s",
        "pred",
        "y",
        F.floor(1000000.0 / (1.0 + F.exp(-F.col("s"))) + 0.5)
        .cast("long")
        .alias("pu"),
    )


@query(
    "pr_auc",
    f"""
    WITH {_NBP_CTE},
    g AS (SELECT s, COUNT(*)::BIGINT AS c, SUM(y)::BIGINT AS cp
          FROM p GROUP BY s),
    w AS (
        SELECT s, c, cp,
               SUM(c) OVER (ORDER BY s DESC
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cn,
               SUM(cp) OVER (ORDER BY s DESC
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS ctp
        FROM g
    ),
    tot AS (SELECT SUM(cp)::BIGINT AS np, SUM(c)::BIGINT AS n FROM g),
    t AS (
        SELECT w.s, (w.cp * w.ctp)::DOUBLE / (tot.np * w.cn) AS term
        FROM w, tot WHERE w.cp > 0
    ),
    f AS (
        SELECT list_reduce(list_prepend(0.0, list(term ORDER BY s DESC)),
                           (a, x) -> a + x) AS ap
        FROM t
    )
    SELECT tot.n, tot.np AS n_pos,
           FLOOR(f.ap * 1000000.0 + 0.5) / 1000000.0 AS pr_auc
    FROM f, tot
    """,
)
def pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the step-curve PR-AUC, sklearn's tie-stable
    definition AP = Σ_b ΔR_b·P_b over the DISTINCT-SCORE grid) for the
    NB quality classifier — the rank metric that, unlike classifier_eval's
    ROC AUC, does not credit true negatives, so it is the one to watch
    when positives are the rare curated class.

    Parity: precision/recall ingredients are exact BIGINT cumulative
    counts on the score grid (the grid window is Aggregate-bounded, not
    a corpus sort); each block term is ONE division of exact products
    (cp·ctp ≤ 1.8e9), folded in score-DESC grid order; the final AP gets
    stable floor-rounding.  Scale: one corpus groupBy onto the distinct
    scores; above ~1e9 distinct scores the grid cumulative swaps to
    prefix_sum_exact."""
    p = _nb_frame(spark, sf_dir)
    g = p.groupBy("s").agg(
        F.count("*").cast("long").alias("c"), F.sum("y").cast("long").alias("cp")
    )
    w = (
        g.withColumn(
            "cn",
            F.sum("c")
            .over(
                Window.orderBy(F.desc("s")).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long"),
        )
        .withColumn(
            "ctp",
            F.sum("cp")
            .over(
                Window.orderBy(F.desc("s")).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long"),
        )
    )
    tot = g.agg(
        F.sum("cp").cast("long").alias("np"), F.sum("c").cast("long").alias("n")
    )
    t = (
        w.crossJoin(F.broadcast(tot))
        .filter(F.col("cp") > 0)
        .select(
            "s",
            ((F.col("cp") * F.col("ctp")).cast("double")
             / (F.col("np") * F.col("cn"))).alias("term"),
        )
    )
    f = t.agg(
        F.aggregate(
            F.reverse(F.array_sort(F.collect_list(F.struct("s", "term")))),
            F.lit(0.0),
            lambda a, st: a + st["term"],
        ).alias("ap")
    )
    return f.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("np").alias("n_pos"),
        (F.floor(F.col("ap") * 1000000.0 + 0.5) / 1000000.0).alias("pr_auc"),
    )


@query(
    "score_ks",
    f"""
    WITH {_NBP_CTE},
    g AS (SELECT s, COUNT(*)::BIGINT AS c, SUM(y)::BIGINT AS cp
          FROM p GROUP BY s),
    tot AS (SELECT SUM(cp)::BIGINT AS np, (SUM(c) - SUM(cp))::BIGINT AS nn
            FROM g),
    w AS (
        SELECT s,
               SUM(cp) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS ctp,
               SUM(c - cp) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS cfp
        FROM g
    ),
    d AS (
        SELECT w.s, ABS(w.ctp * tot.nn - w.cfp * tot.np)::BIGINT AS dn
        FROM w, tot
    ),
    best AS (SELECT s, dn FROM d ORDER BY dn DESC, s ASC LIMIT 1)
    SELECT tot.np AS n_pos, tot.nn AS n_neg, best.s AS threshold_score,
           best.dn::DOUBLE / (tot.np * tot.nn) AS ks
    FROM best, tot
    """,
)
def score_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov separation of the NB score distributions of the
    two classes — max over thresholds of |F_pos − F_neg|, the credit-
    scoring industry's standard single-number separability (and the
    threshold where it peaks is the natural operating point).  The max
    runs over exact integers |ctp·Nn − cfp·Np| (≤ 1.8e9 — no float
    compare anywhere), tie-broken to the smallest score; ONE division at
    the end.  Scale: distinct-score grid only after one corpus groupBy."""
    p = _nb_frame(spark, sf_dir)
    g = p.groupBy("s").agg(
        F.count("*").cast("long").alias("c"), F.sum("y").cast("long").alias("cp")
    )
    tot = g.agg(
        F.sum("cp").cast("long").alias("np"),
        (F.sum("c") - F.sum("cp")).cast("long").alias("nn"),
    )
    gw = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w = g.select(
        "s",
        F.sum("cp").over(gw).cast("long").alias("ctp"),
        F.sum(F.col("c") - F.col("cp")).over(gw).cast("long").alias("cfp"),
    )
    d = w.crossJoin(F.broadcast(tot)).select(
        "s",
        F.abs(F.col("ctp") * F.col("nn") - F.col("cfp") * F.col("np"))
        .cast("long")
        .alias("dn"),
    )
    best = d.orderBy(F.desc("dn"), F.asc("s")).limit(1)
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.col("s").alias("threshold_score"),
        (F.col("dn").cast("double") / (F.col("np") * F.col("nn"))).alias("ks"),
    )


@query(
    "mcc_binary",
    f"""
    WITH {_NBP_CTE},
    cm AS (
        SELECT SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
               SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
               SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
               SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS fn
        FROM p
    )
    SELECT tp, fp, tn, fn,
           CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN (2 * tp)::DOUBLE / (2 * tp + fp + fn) END AS f1,
           CASE WHEN (tp + fn) > 0 AND (tn + fp) > 0
                THEN (tp * (tn + fp) + tn * (tp + fn))::DOUBLE
                     / (2 * (tp + fn) * (tn + fp)) END AS balanced_accuracy,
           CASE WHEN (tp + fn) > 0 AND (tn + fp) > 0
                THEN (tp * (tn + fp) + tn * (tp + fn)
                      - (tp + fn) * (tn + fp))::DOUBLE
                     / ((tp + fn) * (tn + fp)) END AS youden_j,
           CASE WHEN (tp + fp) * (tp + fn) > 0 AND (tn + fp) * (tn + fn) > 0
                THEN (tp * tn - fp * fn)::DOUBLE
                     / sqrt(((tp + fp) * (tp + fn))::DOUBLE
                            * ((tn + fp) * (tn + fn))::DOUBLE) + 0.0
           END AS mcc
    FROM cm
    """,
)
def mcc_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confusion-matrix metric suite at the NB sign cut: precision,
    recall, F1, balanced accuracy, Youden's J, and Matthews correlation —
    the numbers a filtering-gate design review actually reads (accuracy
    alone is in classifier_eval).  Every metric is ONE division of exact
    BIGINT products (balanced accuracy and J rewritten over the common
    denominator (tp+fn)(tn+fp) ≤ 3.6e9 — exactly representable); MCC's
    denominator pairs the four margins into two exact int64 products
    before the single double multiply + IEEE sqrt.

    Scale: one corpus aggregate to four integers; grid-free."""
    p = _nb_frame(spark, sf_dir)
    cm = p.agg(
        F.sum(((F.col("pred") == 1) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("fp"),
        F.sum(((F.col("pred") == 0) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("tn"),
        F.sum(((F.col("pred") == 0) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("fn"),
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    return cm.select(
        "tp", "fp", "tn", "fn",
        F.when(tp + fp > 0, tp.cast("double") / (tp + fp)).alias("precision"),
        F.when(tp + fn > 0, tp.cast("double") / (tp + fn)).alias("recall"),
        F.when(
            2 * tp + fp + fn > 0, (2 * tp).cast("double") / (2 * tp + fp + fn)
        ).alias("f1"),
        F.when(
            ((tp + fn) > 0) & ((tn + fp) > 0),
            (tp * (tn + fp) + tn * (tp + fn)).cast("double")
            / (2 * (tp + fn) * (tn + fp)),
        ).alias("balanced_accuracy"),
        F.when(
            ((tp + fn) > 0) & ((tn + fp) > 0),
            (tp * (tn + fp) + tn * (tp + fn) - (tp + fn) * (tn + fp)).cast(
                "double"
            )
            / ((tp + fn) * (tn + fp)),
        ).alias("youden_j"),
        (
            F.when(
                ((tp + fp) * (tp + fn) > 0) & ((tn + fp) * (tn + fn) > 0),
                (tp * tn - fp * fn).cast("double")
                / F.sqrt(
                    ((tp + fp) * (tp + fn)).cast("double")
                    * ((tn + fp) * (tn + fn)).cast("double")
                )
                + 0.0,
            )
        ).alias("mcc"),
    )


@query(
    "lift_gains",
    f"""
    WITH {_NBP_CTE},
    r AS (
        SELECT doc_id, y,
               NTILE(10) OVER (ORDER BY -FLOOR(s * 1000000.0 + 0.5)::BIGINT,
                               doc_id) AS decile
        FROM p
    ),
    g AS (SELECT decile, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS n_pos
          FROM r GROUP BY decile),
    w AS (
        SELECT decile, n, n_pos,
               SUM(n_pos) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_pos
        FROM g
    ),
    tot AS (SELECT SUM(n)::BIGINT AS nt, SUM(n_pos)::BIGINT AS pt FROM g)
    SELECT w.decile::INT AS decile, w.n, w.n_pos, w.cum_pos,
           (w.n_pos * tot.nt)::DOUBLE / (w.n * tot.pt) AS lift,
           w.cum_pos::DOUBLE / tot.pt AS cum_gain
    FROM w, tot ORDER BY decile
    """,
)
def lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table for the NB score — the
    campaign-targeting view of ranking power ("the top decile holds
    2.1× its share of positives").  Deciles come from
    operators/ranking.py::ntile_exact on the micro-quantized score
    (bit-identical to NTILE(10), NO unpartitioned raw-row window — the
    r13 grid primitive); lift and gain are single divisions of exact
    BIGINT products.

    Scale: value-grid shuffles only; the decile table is 10 rows."""
    from fusionspark.operators.ranking import ntile_exact

    p = _nb_frame(spark, sf_dir).select(
        "doc_id",
        "y",
        (-F.floor(F.col("s") * 1000000.0 + 0.5).cast("long")).alias("ns"),
    )
    r = ntile_exact(p, 10, "ns", "doc_id", "decile")
    g = r.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w = g.withColumn(
        "cum_pos",
        F.sum("n_pos")
        .over(Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("n_pos").cast("long").alias("pt")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int"),
            "n",
            "n_pos",
            "cum_pos",
            ((F.col("n_pos") * F.col("nt")).cast("double")
             / (F.col("n") * F.col("pt"))).alias("lift"),
            (F.col("cum_pos").cast("double") / F.col("pt")).alias("cum_gain"),
        )
        .orderBy("decile")
    )


@query(
    "brier_decomposition",
    f"""
    WITH {_NBP_CTE},
    b AS (
        SELECT LEAST(pu // 100000, 9)::BIGINT AS bin, COUNT(*)::BIGINT AS nb,
               SUM(y)::BIGINT AS sy, SUM(pu)::BIGINT AS sp
        FROM p GROUP BY 1
    ),
    tot AS (SELECT SUM(nb)::BIGINT AS n, SUM(sy)::BIGINT AS sy FROM b),
    rt AS (
        SELECT bin,
               nb * (sy::DOUBLE / nb - sp::DOUBLE / (nb * 1000000.0))
                  * (sy::DOUBLE / nb - sp::DOUBLE / (nb * 1000000.0)) AS term
        FROM b
    ),
    st AS (
        SELECT b.bin,
               b.nb * (b.sy::DOUBLE / b.nb - tot.sy::DOUBLE / tot.n)
                    * (b.sy::DOUBLE / b.nb - tot.sy::DOUBLE / tot.n) AS term
        FROM b, tot
    ),
    rf AS (SELECT list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
                              (a, x) -> a + x) AS v FROM rt),
    sf AS (SELECT list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
                              (a, x) -> a + x) AS v FROM st),
    bs AS (SELECT SUM((pu - 1000000 * y) * (pu - 1000000 * y))::BIGINT AS bnum
           FROM p)
    SELECT tot.n, (SELECT COUNT(*) FROM b)::BIGINT AS n_bins,
           rf.v / tot.n AS reliability,
           sf.v / tot.n AS resolution,
           (tot.sy * (tot.n - tot.sy))::DOUBLE / (tot.n * tot.n)
               AS uncertainty,
           bs.bnum::DOUBLE / (tot.n * 1000000000000) AS brier
    FROM rf, sf, bs, tot
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over 10 probability bins:
    reliability (calibration gap), resolution (how much the bins
    separate the base rate), and uncertainty ȳ(1−ȳ) — the WHY behind
    classifier_eval's single Brier number and ece_calibration's gap.
    Bin ingredients are exact BIGINT micro-unit sums; each bin term is
    one closed-form double expression folded in bin order (≤ 10 terms);
    uncertainty and Brier are single divisions of exact integers.

    Scale: one corpus aggregate onto the 10-bin grid."""
    p = _nb_frame(spark, sf_dir)
    b = p.groupBy(
        F.least(F.expr("pu div 100000"), F.lit(9)).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("pu").cast("long").alias("sp"),
    )
    b = b.localCheckpoint(eager=True)
    tot = b.agg(
        F.sum("nb").cast("long").alias("n"), F.sum("sy").cast("long").alias("sy_t")
    )
    rel_dev = (
        F.col("sy").cast("double") / F.col("nb")
        - F.col("sp").cast("double") / (F.col("nb") * 1000000.0)
    )
    rt = b.select("bin", (F.col("nb") * rel_dev * rel_dev).alias("term"))
    res_dev = (
        F.col("sy").cast("double") / F.col("nb")
        - F.col("sy_t").cast("double") / F.col("n")
    )
    st = b.crossJoin(F.broadcast(tot)).select(
        "bin", (F.col("nb") * res_dev * res_dev).alias("term")
    )
    rf = _ordered_fold(rt, ["bin"], "term", "rel_sum")
    sf_ = _ordered_fold(st, ["bin"], "term", "res_sum")
    bs = p.agg(
        F.sum(
            (F.col("pu") - 1000000 * F.col("y"))
            * (F.col("pu") - 1000000 * F.col("y"))
        )
        .cast("long")
        .alias("bnum")
    )
    nb_cnt = b.agg(F.count("*").cast("long").alias("n_bins"))
    out = (
        rf.crossJoin(F.broadcast(sf_))
        .crossJoin(F.broadcast(bs))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb_cnt))
    )
    return out.select(
        "n",
        "n_bins",
        (F.col("rel_sum") / F.col("n")).alias("reliability"),
        (F.col("res_sum") / F.col("n")).alias("resolution"),
        ((F.col("sy_t") * (F.col("n") - F.col("sy_t"))).cast("double")
         / (F.col("n") * F.col("n"))).alias("uncertainty"),
        (F.col("bnum").cast("double") / (F.col("n") * F.lit(1000000000000)))
        .alias("brier"),
    )


# ---------------------------------------------------------------------------
# multi-query retrieval metrics (MRR / MAP@10 over a fixed query set)
# ---------------------------------------------------------------------------

from fusionspark.functions.text import tokenize  # noqa: E402
from fusionspark.operators.keyword import extract_terms  # noqa: E402
from fusionspark.queries.text_queries import _bm25_oracle  # noqa: E402

#: the fixed 5-query eval set (every term survives extract_terms);
#: relevance per query = ≥2 of ITS terms in the head-20 tokens, the
#: retrieval_eval rule generalized across queries
_EVAL_QUERIES = [
    "fast table scan",
    "merge join order",
    "hash batch row",
    "vector stream window",
    "column filter sort",
]


def _mq_ctes() -> str:
    """Per-query CTE block: top-10 BM25 ranking + relevant pool + hits.

    rk{i} keeps rank <= 10 ONLY — the implementation evaluates over
    bm25_search(top_k=10), so the oracle must apply the same @10 cutoff
    (ADVICE r14: without it a relevant doc whose first rank is > 10
    yields RR=1/rank on the oracle where the implementation yields 0)."""
    parts = []
    for i, q in enumerate(_EVAL_QUERIES):
        terms = extract_terms(q)
        tl = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
        parts.append(
            f"""bm{i} AS ({_bm25_oracle(terms)}),
    rk{i} AS (
        SELECT doc_id, rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
            FROM bm{i}
        ) WHERE rank <= 10
    ),
    rel{i} AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   len(list_filter({tl}, t -> list_contains(w[1:20], t))) AS rel
            FROM (SELECT doc_id,
                         list_filter(string_split(lower(text), ' '),
                                     x -> x <> '') AS w
                  FROM documents)
        ) WHERE rel >= 2
    ),
    h{i} AS (
        SELECT rank FROM rk{i} JOIN rel{i} USING (doc_id)
    )"""
        )
    return ",\n    ".join(parts)


def _mq_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE fused corpus pass for the whole 5-query eval set (r15, guide
    §2.3/§2.4: fewer passes beats everything else).

    The r14 shape ran bm25_search + a relevance projection + a pool-size
    aggregate PER QUERY — 15 scans of `documents` per metric, and three
    metrics each repaid all of them.  This helper computes, in one plan:

    * per-doc TF columns for all 5 queries' terms + the head-20
      relevance flags (one projection),
    * the corpus stats (N, avgdl, per-term df) AND the per-query
      relevant-pool sizes nr_i folded into ONE 1-row aggregate that
      broadcasts back (the same broadcast feeds the final row, so the
      exchange is reused, not recomputed),
    * per-query BM25 scores via a 5-struct explode → row_number over
      Window.partitionBy(qi) → rank ≤ 10 filter, which the optimizer
      collapses to a WindowGroupLimit (map-side top-10 per query —
      the per-partition heap ships ~50 rows to the exchange however
      large the corpus grows).

    Result: one row with ranks_1..ranks_5 (each the ASCENDING array of
    ranks at which relevant docs appear in that query's BM25 top-10)
    and nr_1..nr_5 (relevant-pool sizes) — exactly the inputs every
    rank-fold metric consumes.  Every scalar expression (TF filter,
    score term order, round(·,6), tie-break) is copied verbatim from
    the r14 per-query plans, so the metric outputs are bit-identical.

    Scale: two corpus scans total (stats fold + scoring pass); the
    shuffle after the explode carries ≤ 10 rows per query per map
    partition.  The docstring promise of r14 ("at 100 TB the five
    scorings fuse into one multi-query pass") is now the shipped plan."""
    docs = load_table(spark, sf_dir, "documents")
    k1, b = 1.2, 0.75
    qterms = [extract_terms(q) for q in _EVAL_QUERIES]

    # tokenize ONCE per row into a real column, then derive dl/tf/rel
    # from it: 15 independent tf expressions each re-running
    # split+lower+filter measured 1.95s over this corpus vs 0.73s with
    # the array materialized (codegen does not share the subexpression
    # across projection columns; a separate Project survives
    # CollapseProject because the array feeds many non-cheap uses).
    # Same token array, same downstream expressions → identical values.
    tokd = docs.select("doc_id", tokenize(F.col("text")).alias("w"))
    head = F.slice(F.col("w"), 1, 20)

    cols = [F.col("doc_id"), F.size(F.col("w")).alias("dl")]
    for i, terms in enumerate(qterms):
        for j, t in enumerate(terms):
            # closure, not a default-arg lambda (bm25_search's own rule)
            def _tf(t: str) -> Column:
                return F.size(F.filter(F.col("w"), lambda w: w == F.lit(t)))

            cols.append(_tf(t).alias(f"tf_{i}_{j}"))
        tarr = F.array(*[F.lit(t) for t in terms])
        cols.append(
            F.size(
                F.filter(tarr, lambda t: F.array_contains(head, t))
            ).alias(f"rel_{i}")
        )
    per_doc = tokd.select(*cols)

    aggs = [
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ]
    for i, terms in enumerate(qterms):
        for j in range(len(terms)):
            aggs.append(
                F.sum((F.col(f"tf_{i}_{j}") > 0).cast("long"))
                .cast("double")
                .alias(f"df_{i}_{j}")
            )
        aggs.append(
            F.sum((F.col(f"rel_{i}") >= 2).cast("long"))
            .cast("long")
            .alias(f"nr_{i + 1}")
        )
    stats = per_doc.agg(*aggs)

    scored = per_doc.crossJoin(F.broadcast(stats))
    structs = []
    for i, terms in enumerate(qterms):
        score: Column = F.lit(0.0)
        matched: Column = F.lit(0)
        for j in range(len(terms)):
            tf = F.col(f"tf_{i}_{j}").cast("double")
            idf = F.log(
                1.0
                + (F.col("n_docs") - F.col(f"df_{i}_{j}") + 0.5)
                / (F.col(f"df_{i}_{j}") + 0.5)
            )
            norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            score = score + idf * (tf * (k1 + 1.0)) / norm
            matched = matched + (F.col(f"tf_{i}_{j}") > 0).cast("int")
        structs.append(
            F.struct(
                F.lit(i).alias("qi"),
                F.round(score, 6).alias("bm25"),
                matched.alias("n_terms"),
                (F.col(f"rel_{i}") >= 2).alias("rel"),
            )
        )
    exploded = scored.select(
        "doc_id", F.explode(F.array(*structs)).alias("s")
    ).select("doc_id", "s.qi", "s.bm25", "s.n_terms", "s.rel")

    w = Window.partitionBy("qi").orderBy(F.desc("bm25"), F.asc("doc_id"))
    hits = (
        exploded.filter(F.col("n_terms") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .filter(F.col("rel"))
    )
    ranks = hits.agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("qi") == i, F.col("rank")))
            ).alias(f"ranks_{i + 1}")
            for i in range(5)
        ]
    )
    return ranks.crossJoin(F.broadcast(stats)).select(
        *[f"ranks_{i + 1}" for i in range(5)],
        *[f"nr_{i + 1}" for i in range(5)],
    )


@query(
    "mrr_multi",
    f"""
    WITH {_mq_ctes()},
    {", ".join(
        f"rr{i} AS (SELECT COALESCE(1.0 / MIN(rank), 0.0) AS rr FROM h{i})"
        for i in range(5)
    )}
    SELECT {", ".join(f"rr{i}.rr AS rr_{i + 1}" for i in range(5))},
           ({" + ".join(f"rr{i}.rr" for i in range(5))}) / 5.0 AS mrr
    FROM {", ".join(f"rr{i}" for i in range(5))}
    """,
)
def mrr_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the BM25 ranker over the fixed 5-query
    eval set — the multi-query generalization of retrieval_eval's single
    reciprocal rank (one query can hide a ranker regression that a set
    average exposes).  Each RR is 1/min(rank) over exact integer ranks;
    the mean sums the five values in FIXED literal order (pivoted
    columns, the inference-module discipline).

    Scale: r15 — ALL five scorings run in the one fused _mq_hits pass
    (two corpus scans total, was 15); each RR is then a scalar
    expression over that row's rank array.  1.0/min(rank) is written as
    1.0/ranks[1] (the array is rank-ascending), the same int→double
    division as the r14 F.min fold, NULL on an empty array exactly as
    the empty-frame MIN was (F.get, not element_at — get is index-safe
    on the empty array under ANSI where element_at raises)."""
    hits = _mq_hits(spark, sf_dir)
    rrs = [
        F.coalesce(
            F.lit(1.0) / F.get(F.col(f"ranks_{i + 1}"), 0),
            F.lit(0.0),
        ).alias(f"rr_{i + 1}")
        for i in range(5)
    ]
    out = hits.select(*rrs)
    mrr = None
    for i in range(5):
        c = F.col(f"rr_{i + 1}")
        mrr = c if mrr is None else mrr + c
    return out.select(
        *[f"rr_{i + 1}" for i in range(5)], (mrr / 5.0).alias("mrr")
    )


@query(
    "map_at10",
    f"""
    WITH {_mq_ctes()},
    {", ".join(
        f'''ap{i} AS (
        SELECT CASE WHEN LEAST((SELECT COUNT(*) FROM rel{i}), 10) > 0
               THEN COALESCE((SELECT list_reduce(list_prepend(0.0,
                        list_transform(range(len(l)),
                                       i2 -> (i2 + 1)::DOUBLE / l[i2 + 1])),
                        (a, x) -> a + x)
                    FROM (SELECT list(rank ORDER BY rank) AS l FROM h{i})
                    WHERE len(l) > 0), 0.0)
                    / LEAST((SELECT COUNT(*) FROM rel{i}), 10)
               ELSE 0.0 END AS ap
    )'''
        for i in range(5)
    )}
    SELECT {", ".join(f"ap{i}.ap AS ap_{i + 1}" for i in range(5))},
           ({" + ".join(f"ap{i}.ap" for i in range(5))}) / 5.0 AS map
    FROM {", ".join(f"ap{i}" for i in range(5))}
    """,
)
def map_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision at 10 over the same 5-query eval set —
    the order-sensitive companion to mrr_multi (MRR sees only the first
    hit; AP rewards packing ALL relevant docs high).  Per query AP@10 =
    Σ_hits (j / rank_j) / min(|relevant|, 10): each term is one division
    of exact integer ranks, folded in rank order (≤ 10 terms); the mean
    sums five APs in fixed literal order.

    Scale: r15 — the five per-query passes collapsed into the one
    fused _mq_hits pass (two corpus scans, was 15); the hit-index fold
    (indexed transform over the rank-ascending array, same lambda, same
    fold order) and the min(|rel|,10) division are unchanged scalar
    expressions, so the AP values are bit-identical."""
    hits = _mq_hits(spark, sf_dir)
    aps = []
    for i in range(5):
        arr = F.col(f"ranks_{i + 1}")
        nr = F.col(f"nr_{i + 1}")
        fsum = F.when(
            F.size(arr) > 0,
            F.aggregate(
                F.transform(
                    arr,
                    lambda r, i2: (i2 + 1).cast("double") / r,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        aps.append(
            F.when(
                F.least(nr, F.lit(10)) > 0,
                F.coalesce(fsum, F.lit(0.0)) / F.least(nr, F.lit(10)),
            )
            .otherwise(0.0)
            .alias(f"ap_{i + 1}")
        )
    out = hits.select(*aps)
    m = None
    for i in range(5):
        c = F.col(f"ap_{i + 1}")
        m = c if m is None else m + c
    return out.select(
        *[f"ap_{i + 1}" for i in range(5)], (m / 5.0).alias("map")
    )


# ---------------------------------------------------------------------------
# round-15 additions: the ROC/threshold/calibration edge (VERDICT r14 #3)
# ---------------------------------------------------------------------------


@query(
    "roc_auc",
    f"""
    WITH {_NBP_CTE},
    g AS (SELECT s, COUNT(*)::BIGINT AS c, SUM(y)::BIGINT AS cp
          FROM p GROUP BY s),
    w AS (
        SELECT s, cp, (c - cp)::BIGINT AS cn,
               (SUM(c - cp) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                - (c - cp))::BIGINT AS nb
        FROM g
    ),
    tot AS (SELECT SUM(cp)::BIGINT AS np, (SUM(c) - SUM(cp))::BIGINT AS nn
            FROM g),
    u AS (SELECT SUM(cp * (2 * nb + cn))::BIGINT AS u2 FROM w)
    SELECT tot.np AS n_pos, tot.nn AS n_neg,
           u.u2::DOUBLE / (2 * tot.np * tot.nn) AS roc_auc
    FROM u, tot
    """,
)
def roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ROC AUC of the NB quality scores via the Mann-Whitney
    identity AUC = U/(P·N) — the trapezoid on the distinct-score grid,
    the threshold-free companion to pr_auc (classifier_eval reports a
    per-decile approximation; this is the exact statistic).

    Parity: 2U = Σ_grid cp·(2·neg_strictly_below + neg_tied) is ONE
    order-free BIGINT sum of exact products (≤ ~1e12 per term at sf0.1);
    AUC is a single division — no float enters before it, so no rounding
    is needed (the score_ks discipline).  Scale: one corpus groupBy onto
    the distinct-score grid; the cumulative is Aggregate-bounded; above
    ~2^63/n² rows swap the sum to DECIMAL(38,0)."""
    p = _nb_frame(spark, sf_dir)
    # the grid materializes once (the _contingency/ntile_exact pattern):
    # its three consumers (w, tot, u) read the checkpointed rows instead
    # of re-running the corpus NB pass per branch
    g = p.groupBy("s").agg(
        F.count("*").cast("long").alias("c"), F.sum("y").cast("long").alias("cp")
    ).localCheckpoint(eager=True)
    gw = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w = g.select(
        "s",
        "cp",
        (F.col("c") - F.col("cp")).cast("long").alias("cn"),
        (
            F.sum(F.col("c") - F.col("cp")).over(gw)
            - (F.col("c") - F.col("cp"))
        )
        .cast("long")
        .alias("nb"),
    )
    tot = g.agg(
        F.sum("cp").cast("long").alias("np"),
        (F.sum("c") - F.sum("cp")).cast("long").alias("nn"),
    )
    u = w.agg(
        F.sum(F.col("cp") * (2 * F.col("nb") + F.col("cn")))
        .cast("long")
        .alias("u2")
    )
    return u.crossJoin(F.broadcast(tot)).select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        (F.col("u2").cast("double") / (2 * F.col("np") * F.col("nn")))
        .alias("roc_auc"),
    )


@query(
    "cost_curve",
    f"""
    WITH {_NBP_CTE},
    g AS (SELECT s, COUNT(*)::BIGINT AS c, SUM(y)::BIGINT AS cp
          FROM p GROUP BY s),
    tot AS (SELECT SUM(cp)::BIGINT AS np, (SUM(c) - SUM(cp))::BIGINT AS nn,
                   SUM(c)::BIGINT AS n FROM g),
    w AS (
        SELECT s,
               (SUM(cp) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                - cp)::BIGINT AS fn_t,
               (SUM(c - cp) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                - (c - cp))::BIGINT AS nb_t
        FROM g
    ),
    c2 AS (
        SELECT w.s, w.fn_t AS fn, (tot.nn - w.nb_t)::BIGINT AS fp,
               (1 * (tot.nn - w.nb_t) + 5 * w.fn_t)::BIGINT AS cost
        FROM w, tot
    ),
    best AS (SELECT s, fp, fn, cost FROM c2 ORDER BY cost ASC, s ASC LIMIT 1)
    SELECT best.s AS threshold_score, best.fp, best.fn, best.cost,
           best.cost::DOUBLE / tot.n AS cost_rate
    FROM best, tot
    """,
)
def cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive threshold sweep over the NB score grid with the
    asymmetric curation cost matrix c_fp=1, c_fn=5 (letting a bad doc
    into the corpus is cheap to catch later; dropping a good doc loses
    data forever) — reports the operating point score_ks's symmetric KS
    statistic does NOT pick when costs differ.  Rule at threshold t:
    keep iff score ≥ t; FP(t)/FN(t) come from the exclusive grid
    cumulatives; cost is an exact BIGINT per grid row; the argmin is an
    integer ORDER BY (cost, s) LIMIT 1 — tie to the smallest score —
    and cost_rate is the one terminal division.

    Thresholds are the observed score grid (the standard sweep; the
    degenerate keep-nothing cut is not on the curve).  Scale: one
    corpus groupBy onto the distinct-score grid, then grid-only."""
    p = _nb_frame(spark, sf_dir)
    # grid materializes once; consumers (tot, w) are grid-only
    g = p.groupBy("s").agg(
        F.count("*").cast("long").alias("c"), F.sum("y").cast("long").alias("cp")
    ).localCheckpoint(eager=True)
    tot = g.agg(
        F.sum("cp").cast("long").alias("np"),
        (F.sum("c") - F.sum("cp")).cast("long").alias("nn"),
        F.sum("c").cast("long").alias("n"),
    )
    gw = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w = g.select(
        "s",
        (F.sum("cp").over(gw) - F.col("cp")).cast("long").alias("fn_t"),
        (
            F.sum(F.col("c") - F.col("cp")).over(gw)
            - (F.col("c") - F.col("cp"))
        )
        .cast("long")
        .alias("nb_t"),
    )
    c2 = w.crossJoin(F.broadcast(tot)).select(
        "s",
        F.col("fn_t").alias("fn"),
        (F.col("nn") - F.col("nb_t")).cast("long").alias("fp"),
        (1 * (F.col("nn") - F.col("nb_t")) + 5 * F.col("fn_t"))
        .cast("long")
        .alias("cost"),
    )
    best = c2.orderBy(F.asc("cost"), F.asc("s")).limit(1)
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("threshold_score"),
        "fp",
        "fn",
        "cost",
        (F.col("cost").cast("double") / F.col("n")).alias("cost_rate"),
    )


@query(
    "roc_points",
    f"""
    WITH {_NBP_CTE},
    r AS (
        SELECT doc_id, y,
               NTILE(10) OVER (ORDER BY -FLOOR(s * 1000000.0 + 0.5)::BIGINT,
                               doc_id) AS decile
        FROM p
    ),
    g AS (SELECT decile, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS n_pos
          FROM r GROUP BY decile),
    w AS (
        SELECT decile, n, n_pos,
               SUM(n_pos) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_pos,
               SUM(n - n_pos) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_neg
        FROM g
    ),
    tot AS (SELECT SUM(n_pos)::BIGINT AS np, (SUM(n) - SUM(n_pos))::BIGINT AS nn
            FROM g)
    SELECT w.decile::INT AS decile, w.n, w.n_pos, w.cum_pos, w.cum_neg,
           w.cum_pos::DOUBLE / tot.np AS tpr,
           w.cum_neg::DOUBLE / tot.nn AS fpr
    FROM w, tot ORDER BY decile
    """,
)
def roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10-point sampled ROC curve at score-rank deciles — the
    plottable companion to the roc_auc scalar (a reviewer wants to SEE
    where the curve sags, exactly as lift_gains plots the gains chart
    for the same ranking).  Deciles from operators/ranking.py::
    ntile_exact on the micro-quantized score (bit-identical to
    NTILE(10), no unpartitioned raw-row window); TPR/FPR are single
    divisions of exact BIGINT decile cumulatives.

    Scale: value-grid shuffles only; the curve table is 10 rows."""
    from fusionspark.operators.ranking import ntile_exact

    p = _nb_frame(spark, sf_dir).select(
        "doc_id",
        "y",
        (-F.floor(F.col("s") * 1000000.0 + 0.5).cast("long")).alias("ns"),
    )
    r = ntile_exact(p, 10, "ns", "doc_id", "decile")
    g = r.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    dw = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w = g.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n_pos").over(dw).cast("long").alias("cum_pos"),
        F.sum(F.col("n") - F.col("n_pos")).over(dw).cast("long").alias("cum_neg"),
    )
    tot = g.agg(
        F.sum("n_pos").cast("long").alias("np"),
        (F.sum("n") - F.sum("n_pos")).cast("long").alias("nn"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "n_pos",
            "cum_pos",
            "cum_neg",
            (F.col("cum_pos").cast("double") / F.col("np")).alias("tpr"),
            (F.col("cum_neg").cast("double") / F.col("nn")).alias("fpr"),
        )
        .orderBy("decile")
    )


#: the classifier frame WITH the source stratum carried through (the
#: _NBP_CTE shape + d.source; _NBP_CTE itself stays byte-frozen — it
#: backs attested rows)
_NBPS_CTE = f"""nbq AS ({NB_QUALITY_ORACLE}),
    p AS (
        SELECT n.doc_id, n.nb_score AS s, d.source,
               CASE WHEN d.source IN {_NB_POS} THEN 1 ELSE 0 END AS y,
               FLOOR(1000000.0 / (1.0 + exp(-n.nb_score)) + 0.5)::BIGINT AS pu
        FROM nbq n JOIN documents d USING (doc_id)
    )"""


def _nb_frame_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, y, pu) — _nb_frame with the stratum joined on,
    so the label lists and pu quantization live in ONE place."""
    d = load_table(spark, sf_dir, "documents")
    return _nb_frame(spark, sf_dir).join(
        d.select("doc_id", "source"), "doc_id"
    ).select("doc_id", "source", "y", "pu")


@query(
    "calibration_strata",
    f"""
    WITH {_NBPS_CTE},
    b AS (
        SELECT source, y, pu, LEAST(pu // 100000, 9)::BIGINT AS bin
        FROM p
    ),
    g AS (
        SELECT source, bin, COUNT(*)::BIGINT AS nb, SUM(y)::BIGINT AS sy,
               SUM(pu)::BIGINT AS spu
        FROM b GROUP BY source, bin
    ),
    d AS (
        SELECT source, bin, nb,
               ABS(1000000 * sy - spu)::BIGINT AS dev
        FROM g
    ),
    s AS (
        SELECT source, SUM(nb)::BIGINT AS n, COUNT(*)::BIGINT AS n_bins_used,
               SUM(dev)::BIGINT AS devsum,
               MAX(dev::DOUBLE / nb) AS mxq
        FROM d GROUP BY source
    )
    SELECT source, n, n_bins_used,
           FLOOR(devsum::DOUBLE / n + 0.5) / 1000000.0 AS ece,
           FLOOR(mxq + 0.5) / 1000000.0 AS mce
    FROM s ORDER BY source
    """,
)
def calibration_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum (per-source) calibration of the NB sigmoid
    probabilities on the standard 10-bin grid — ece_calibration audits
    one global model; this is the VERDICT-r14 per-stratum edge: a
    classifier can be calibrated on average while badly mis-calibrated
    on exactly the source you are about to filter with it.

    Parity: confidences are the micro-unit integers pu; per (source,
    bin) the deviation |1e6·Σy − Σpu| is an exact BIGINT, so
    ECE_s = Σ_bins dev / (1e6·n_s) has an ORDER-FREE integer numerator
    (no double fold anywhere); MCE_s is a max over exactly-determined
    per-bin quotients.  Both are integer-ratio outputs, so they carry
    the engine-stable FLOOR(µ+0.5)/1e6 6-dp form IN MICRO-UNITS (the
    quotient is already ×1e6 — one exact-int division inside the FLOOR;
    the r14 round6_stable sweep convention: this output class lands on
    7-digit halfway reprs that plain ROUND splits across engines).
    Scale: one corpus groupBy onto the ≤ sources×10 grid; everything
    after is grid-only."""
    p = _nb_frame_src(spark, sf_dir)
    b = p.select(
        "source",
        "y",
        "pu",
        F.least(F.expr("pu div 100000"), F.lit(9)).cast("long").alias("bin"),
    )
    # the <= sources*10 grid materializes once
    g = b.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("pu").cast("long").alias("spu"),
    ).localCheckpoint(eager=True)
    d = g.select(
        "source",
        "bin",
        "nb",
        F.abs(1000000 * F.col("sy") - F.col("spu")).cast("long").alias("dev"),
    )
    s = d.groupBy("source").agg(
        F.sum("nb").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins_used"),
        F.sum("dev").cast("long").alias("devsum"),
        F.max(F.col("dev").cast("double") / F.col("nb")).alias("mxq"),
    )
    return s.select(
        "source",
        "n",
        "n_bins_used",
        (
            F.floor(F.col("devsum").cast("double") / F.col("n") + 0.5)
            / 1000000.0
        ).alias("ece"),
        (F.floor(F.col("mxq") + 0.5) / 1000000.0).alias("mce"),
    ).orderBy("source")


@query(
    "log_loss_grid",
    f"""
    WITH {_NBP_CTE},
    pc AS (
        SELECT y, LEAST(GREATEST(pu, 1), 999999)::BIGINT AS puc FROM p
    ),
    g AS (SELECT puc, COUNT(*)::BIGINT AS nb, SUM(y)::BIGINT AS sy
          FROM pc GROUP BY puc),
    t AS (
        SELECT puc,
               sy * (-ln(puc::DOUBLE / 1000000.0))
               + (nb - sy) * (-ln(1.0 - puc::DOUBLE / 1000000.0)) AS term
        FROM g
    ),
    f AS (
        SELECT list_reduce(list_prepend(0.0, list(term ORDER BY puc)),
                           (a, x) -> a + x) AS ls
        FROM t
    ),
    tot AS (SELECT SUM(nb)::BIGINT AS n FROM g)
    SELECT tot.n, ROUND(f.ls / tot.n, 6) + 0.0 AS log_loss
    FROM f, tot
    """,
)
def log_loss_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cross-entropy (log loss) of the NB sigmoid probabilities —
    the PROPER scoring rule that punishes confident mistakes brier's
    quadratic rule caps (one 99.9999%-confident wrong keep costs ~13.8
    nats here vs Brier's ≤ 1), clamped to the [1, 999999] micro-unit
    range so the boundary cells stay finite.

    Parity: probabilities are the micro-unit integer grid (≤ 1e6
    cells), each cell term is counts × ln of ONE exact division, folded
    in fixed puc order (the cluster_nmi ln discipline); the mean is one
    division with stable 6-dp rounding (transcendental output class).
    Scale: one corpus groupBy onto the micro-unit grid, then grid-only."""
    p = _nb_frame(spark, sf_dir)
    pc = p.select(
        "y",
        F.least(F.greatest(F.col("pu"), F.lit(1)), F.lit(999999))
        .cast("long")
        .alias("puc"),
    )
    # the micro-unit grid materializes once (term fold + total read it)
    g = pc.groupBy("puc").agg(
        F.count("*").cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sy"),
    ).localCheckpoint(eager=True)
    t = g.select(
        "puc",
        (
            F.col("sy") * (-F.log(F.col("puc").cast("double") / 1000000.0))
            + (F.col("nb") - F.col("sy"))
            * (-F.log(F.lit(1.0) - F.col("puc").cast("double") / 1000000.0))
        ).alias("term"),
    )
    f = _ordered_fold(t, ["puc"], "term", "ls")
    tot = g.agg(F.sum("nb").cast("long").alias("n"))
    return f.crossJoin(F.broadcast(tot)).select(
        "n",
        (F.round(F.col("ls") / F.col("n"), 6) + 0.0).alias("log_loss"),
    )


#: positional NDCG weights 1/log2(rank+1), rank 1..10, precomputed in
#: Python and emitted as shortest-repr DOUBLE literals in BOTH engines —
#: Spark's StrictMath-based log2 and DuckDB's libm log2 differ by 1 ulp
#: for several small ints, so neither engine's log runs at query time.
#: _NDCG_P[m-1] = ideal DCG for m relevant docs (prefix sums, same rule).
_NDCG_W = [1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163, 0.3562071871080222, 0.3333333333333333, 0.31546487678572877, 0.3010299956639812, 0.2890648263178879]
_NDCG_P = [1.0, 1.6309297535714575, 2.1309297535714578, 2.5616063116448506, 2.9484591188793923, 3.3046663059874146, 3.637999639320748, 3.953464516106477, 4.254494511770458, 4.543559338088346]


@query(
    "ndcg_multi",
    f"""
    WITH {_mq_ctes()},
    {", ".join(
        f'''nd{i} AS (
        SELECT CASE WHEN LEAST((SELECT COUNT(*) FROM rel{i}), 10) > 0
               THEN COALESCE((SELECT list_reduce(list_prepend(0.0,
                        list_transform(l, r -> ([1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163, 0.3562071871080222, 0.3333333333333333, 0.31546487678572877, 0.3010299956639812, 0.2890648263178879])[r])),
                        (a, x) -> a + x)
                    FROM (SELECT list(rank ORDER BY rank) AS l FROM h{i})
                    WHERE len(l) > 0), 0.0)
                    / ([1.0, 1.6309297535714575, 2.1309297535714578, 2.5616063116448506, 2.9484591188793923, 3.3046663059874146, 3.637999639320748, 3.953464516106477, 4.254494511770458, 4.543559338088346])[LEAST((SELECT COUNT(*) FROM rel{i}), 10)]
               ELSE 0.0 END AS nd
    )'''
        for i in range(5)
    )}
    SELECT {", ".join(
        f"FLOOR(nd{i}.nd * 1000000.0 + 0.5) / 1000000.0 AS ndcg_{i + 1}"
        for i in range(5)
    )},
           FLOOR(({" + ".join(f"nd{i}.nd" for i in range(5))}) / 5.0
                 * 1000000.0 + 0.5) / 1000000.0 AS ndcg
    FROM {", ".join(f"nd{i}" for i in range(5))}
    """,
)
def ndcg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean NDCG@10 (binary relevance) of the BM25 ranker over the same
    fixed 5-query eval set as mrr_multi/map_at10 — the graded-position
    metric that rewards packing hits at the very top where MAP treats
    all top-10 slots closer to evenly (retrieval_ndcg scores ONE query;
    this is the set mean a ranker regression gate needs).

    Parity: the ten 1/log2(rank+1) weights and their ideal-DCG prefix
    sums are PRECOMPUTED Python doubles emitted as shortest-repr
    literals in both engines (no engine log runs — Spark StrictMath
    log2 and DuckDB libm log2 are 1 ulp apart on small ints); DCG folds
    literal lookups in rank order over the ≤ 10 hits, one division per
    query, engine-stable FLOOR 6-dp form on the pivoted outputs (the
    deterministic-value convention — no ROUND halfway class).
    Scale: r15 — the five per-query passes collapsed into the one
    fused _mq_hits pass (two corpus scans, was 15); the literal-weight
    DCG fold and ideal-DCG division are unchanged scalar expressions
    over the same rank arrays, so the NDCG values are bit-identical."""
    hits = _mq_hits(spark, sf_dir)
    warr = F.array(*[F.lit(w) for w in _NDCG_W])
    parr = F.array(*[F.lit(x) for x in _NDCG_P])
    nds = []
    for i in range(5):
        arr = F.col(f"ranks_{i + 1}")
        nr = F.col(f"nr_{i + 1}")
        dcg = F.when(
            F.size(arr) > 0,
            F.aggregate(
                F.transform(arr, lambda r: F.element_at(warr, r)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        nds.append(
            F.when(
                F.least(nr, F.lit(10)) > 0,
                F.coalesce(dcg, F.lit(0.0))
                / F.element_at(
                    parr, F.least(nr, F.lit(10)).cast("int")
                ),
            )
            .otherwise(0.0)
            .alias(f"nd_{i + 1}")
        )
    out = hits.select(*nds)
    m = None
    for i in range(5):
        c = F.col(f"nd_{i + 1}")
        m = c if m is None else m + c
    return out.select(
        *[
            (F.floor(F.col(f"nd_{i + 1}") * 1000000.0 + 0.5) / 1000000.0)
            .alias(f"ndcg_{i + 1}")
            for i in range(5)
        ],
        (F.floor(m / 5.0 * 1000000.0 + 0.5) / 1000000.0).alias("ndcg"),
    )
