"""Round-13 statistical-inference additions: ordered-alternative and
paired rank tests, stratified categorical association, variance
homogeneity, stationarity, calibration, graph mixing, and spatial
autocorrelation — the estimator families adjacent to the r11/r12
analytics board that the registry did not yet cover.

Parity discipline (see analytics_queries.py and the repo-wide rules):
every statistic reduces to exact BIGINT (or DECIMAL(38,0) where int64
headroom runs out) conditional sums first; doubles enter only in ONE
final closed-form expression written with the identical tree in both
engines; irrational constants enter as integer-literal ratios; sums of
per-stratum doubles fold in FIXED literal order (pivoted columns),
never shuffle order.

Scale notes per query; the shared shape: the corpus collapses in one
map-side-combined groupBy onto a bounded grid (days, value grid, dow
strata, pattern ids), and the statistic evaluates on that grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.queries import query
from fusionspark.queries.analytics_queries import _DAILY_CTE, _daily_frame

#: the five event types, alphabetical — the fixed treatment order every
#: ordered-alternative statistic in this module uses
_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# ordinal_association — gamma / Somers' D on the daily (revenue, count) grid
# ---------------------------------------------------------------------------


@query(
    "ordinal_association",
    f"""
    WITH {_DAILY_CTE},
    p AS (
        SELECT CASE WHEN (a.x - b.x) * (a.c - b.c) > 0 THEN 1 ELSE 0 END::BIGINT AS con,
               CASE WHEN (a.x - b.x) * (a.c - b.c) < 0 THEN 1 ELSE 0 END::BIGINT AS dis,
               CASE WHEN a.x = b.x THEN 1 ELSE 0 END::BIGINT AS tx,
               CASE WHEN a.c = b.c THEN 1 ELSE 0 END::BIGINT AS tc
        FROM daily a JOIN daily b ON a.day < b.day
    ),
    s AS (
        SELECT SUM(con)::BIGINT AS nc, SUM(dis)::BIGINT AS nd,
               SUM(tx)::BIGINT AS n1, SUM(tc)::BIGINT AS n2,
               COUNT(*)::BIGINT AS n0
        FROM p
    )
    SELECT n0 AS n_pairs, nc AS concordant, nd AS discordant,
           CASE WHEN nc + nd > 0
                THEN ROUND((nc - nd)::DOUBLE / (nc + nd), 6) + 0.0 END AS gamma,
           CASE WHEN n0 - n1 > 0
                THEN ROUND((nc - nd)::DOUBLE / (n0 - n1), 6) + 0.0 END AS somers_d_cx,
           CASE WHEN n0 - n2 > 0
                THEN ROUND((nc - nd)::DOUBLE / (n0 - n2), 6) + 0.0 END AS somers_d_xc
    FROM s
    """,
)
def ordinal_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma and both Somers' D asymmetries between
    daily revenue and daily event count — the ordinal-association
    companions to kendall_tau_daily (same concordant/discordant pair
    counts, different tie treatments: gamma drops ALL ties, D_yx
    penalizes only ties on the independent axis), the standard readout
    trio for ordinal dashboards.

    Parity: identical exact-integer pair grid as kendall_tau_daily;
    each statistic is ONE division of exact BIGINTs guarded against an
    all-tied axis (NULL in both engines), `+ 0.0` because a tiny
    negative association rounds to a signed zero.

    Scale: corpus collapses in one groupBy(day); the O(|days|^2) pair
    grid is bounded (~450 pairs at 30 days, |days|^2 always)."""
    d = _daily_frame(spark, sf_dir).localCheckpoint(eager=True)
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"), F.col("c").alias("ca"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"), F.col("c").alias("cb"))
    p = a.join(b, F.col("da") < F.col("db")).select(
        F.when((F.col("xa") - F.col("xb")) * (F.col("ca") - F.col("cb")) > 0, 1)
        .otherwise(0).cast("long").alias("con"),
        F.when((F.col("xa") - F.col("xb")) * (F.col("ca") - F.col("cb")) < 0, 1)
        .otherwise(0).cast("long").alias("dis"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).cast("long").alias("tx"),
        F.when(F.col("ca") == F.col("cb"), 1).otherwise(0).cast("long").alias("tc"),
    )
    s = p.agg(
        F.sum("con").cast("long").alias("nc"),
        F.sum("dis").cast("long").alias("nd"),
        F.sum("tx").cast("long").alias("n1"),
        F.sum("tc").cast("long").alias("n2"),
        F.count("*").cast("long").alias("n0"),
    )
    nc, nd = F.col("nc"), F.col("nd")
    n0, n1, n2 = F.col("n0"), F.col("n1"), F.col("n2")
    return s.select(
        n0.alias("n_pairs"),
        nc.alias("concordant"),
        nd.alias("discordant"),
        F.when(
            nc + nd > 0, F.round((nc - nd).cast("double") / (nc + nd), 6) + 0.0
        ).alias("gamma"),
        F.when(
            n0 - n1 > 0, F.round((nc - nd).cast("double") / (n0 - n1), 6) + 0.0
        ).alias("somers_d_cx"),
        F.when(
            n0 - n2 > 0, F.round((nc - nd).cast("double") / (n0 - n2), 6) + 0.0
        ).alias("somers_d_xc"),
    )


# ---------------------------------------------------------------------------
# jonckheere_terpstra — ordered alternative across the 5 event types
# ---------------------------------------------------------------------------


def _jt_oracle() -> str:
    cnt_cols = ",\n               ".join(
        f"SUM(CASE WHEN g = '{t}' THEN cnt ELSE 0 END)::BIGINT AS cnt{i}"
        for i, t in enumerate(_TYPES)
    )
    cum_cols = ",\n               ".join(
        f"(SUM(SUM(CASE WHEN g = '{t}' THEN cnt ELSE 0 END))"
        f" OVER (ORDER BY v) - SUM(CASE WHEN g = '{t}' THEN cnt ELSE 0 END)"
        f")::BIGINT AS cum{i}"
        for i, t in enumerate(_TYPES)
    )
    j2 = " + ".join(
        f"cnt{j} * (2 * cum{i} + cnt{i})"
        for i in range(5)
        for j in range(5)
        if i < j
    )
    n_cols = ", ".join(f"SUM(cnt{i})::BIGINT AS n{i}" for i in range(5))
    sum_n = " + ".join(f"n{i}" for i in range(5))
    sum_n2 = " + ".join(f"n{i} * n{i}" for i in range(5))
    sum_nv = " + ".join(f"n{i} * n{i} * (2 * n{i} + 3)" for i in range(5))
    return f"""
    WITH ev AS (
        SELECT event_type AS g, FLOOR(value * 100.0 + 0.5)::BIGINT AS v,
               COUNT(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT v,
               {cnt_cols},
               {cum_cols}
        FROM ev GROUP BY v
    ),
    s AS (
        SELECT SUM({j2})::BIGINT AS j2, {n_cols}
        FROM grid
    ),
    t AS (
        SELECT j2, ({sum_n})::BIGINT AS n,
               ({sum_n2})::BIGINT AS sn2, ({sum_nv})::BIGINT AS snv
        FROM s
    )
    SELECT n AS n_obs, j2 AS j_doubled,
           (2 * j2 - (n * n - sn2))::BIGINT AS dev4,
           CASE WHEN 2 * j2 > n * n - sn2 THEN 1
                WHEN 2 * j2 = n * n - sn2 THEN 0 ELSE -1 END AS direction,
           ROUND((2 * j2 - (n * n - sn2))::DOUBLE
                 / SQRT((n * n * (2 * n + 3) - snv)::DOUBLE * 16 / 72), 6)
               + 0.0 AS z
    FROM t
    """


@query("jonckheere_terpstra", _jt_oracle())
def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative in event
    value across the five event types (alphabetical treatment order) —
    the k-sample monotone-trend companion to kruskal_wallis (which only
    asks whether the groups differ): J = sum over ordered type pairs
    a<b of the Mann-Whitney count #{x_a < x_b}, tie-corrected by the
    standard half-tie convention.

    Parity: the corpus collapses onto the (type, cents) grid; per-value
    cumulative counts cum_i(v) = #obs of type i strictly below v come
    from ONE unbounded-preceding window over the value grid minus the
    current row, so the DOUBLED statistic J2 = sum_v sum_{i<j}
    cnt_j(v) * (2*cum_i(v) + cnt_i(v)) is an exact BIGINT (2*less +
    ties).  dev4 = 2*J2 - (N^2 - sum n_i^2) = 4(J - E[J]) is exact;
    z = dev4 / sqrt(16*Var), 16*Var = (N^2(2N+3) - sum n_i^2(2n_i+3))
    * 16/72, one closed-form double (ties in the variance use the
    untied JT form; documented simplification).  Direction is an exact
    integer sign; `+ 0.0` kills the signed zero on a dead-level trend.

    Scale: one groupBy(type, cents) with map-side combine; the window
    runs over the bounded distinct-cents grid (~18k rows at sf0.1,
    value-domain-bounded at any SF), partitioned work everywhere else.
    Reference surface: extends the reference's scoring comparators
    (/root/reference/src/utils/scoring.js) to k ordered samples."""
    e = load_table(spark, sf_dir, "events")
    ev = e.groupBy(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    cnts = [
        F.sum(F.when(F.col("g") == t, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias(f"cnt{i}")
        for i, t in enumerate(_TYPES)
    ]
    grid = ev.groupBy("v").agg(*cnts)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    for i in range(5):
        grid = grid.withColumn(
            f"cum{i}",
            (F.sum(F.col(f"cnt{i}")).over(w) - F.col(f"cnt{i}")).cast("long"),
        )
    j2 = None
    for i in range(5):
        for j in range(i + 1, 5):
            t = F.col(f"cnt{j}") * (2 * F.col(f"cum{i}") + F.col(f"cnt{i}"))
            j2 = t if j2 is None else j2 + t
    aggs = [F.sum(j2).cast("long").alias("j2")] + [
        F.sum(F.col(f"cnt{i}")).cast("long").alias(f"n{i}") for i in range(5)
    ]
    s = grid.agg(*aggs)
    n = sum((F.col(f"n{i}") for i in range(1, 5)), F.col("n0"))
    sn2 = sum(
        (F.col(f"n{i}") * F.col(f"n{i}") for i in range(1, 5)),
        F.col("n0") * F.col("n0"),
    )
    snv = sum(
        (
            F.col(f"n{i}") * F.col(f"n{i}") * (2 * F.col(f"n{i}") + 3)
            for i in range(1, 5)
        ),
        F.col("n0") * F.col("n0") * (2 * F.col("n0") + 3),
    )
    jj = F.col("j2")
    dev4 = 2 * jj - (n * n - sn2)
    return s.select(
        n.cast("long").alias("n_obs"),
        jj.alias("j_doubled"),
        dev4.cast("long").alias("dev4"),
        F.when(2 * jj > n * n - sn2, 1)
        .when(2 * jj == n * n - sn2, 0)
        .otherwise(-1)
        .alias("direction"),
        (
            F.round(
                dev4.cast("double")
                / F.sqrt((n * n * (2 * n + 3) - snv).cast("double") * 16 / 72),
                6,
            )
            + 0.0
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank — paired daily purchase-vs-view revenue
# ---------------------------------------------------------------------------


@query(
    "wilcoxon_signed_rank",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN FLOOR(value * 100.0 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS xp,
               SUM(CASE WHEN event_type = 'view'
                        THEN FLOOR(value * 100.0 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS xv
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT xp - xv AS diff, abs(xp - xv)::BIGINT AS ad
        FROM daily WHERE xp <> xv
    ),
    grid AS (
        SELECT ad, COUNT(*)::BIGINT AS cnt,
               SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END)::BIGINT AS pos
        FROM d GROUP BY ad
    ),
    cum AS (
        SELECT ad, cnt, pos,
               (SUM(cnt) OVER (ORDER BY ad) - cnt)::BIGINT AS below
        FROM grid
    ),
    s AS (
        SELECT SUM(pos * (2 * below + cnt + 1))::BIGINT AS w2,
               SUM(cnt)::BIGINT AS n,
               SUM(CASE WHEN cnt > 1 THEN cnt * cnt * cnt - cnt ELSE 0 END)::BIGINT AS ties
        FROM cum
    )
    SELECT n AS n_nonzero, w2 AS w_plus_doubled,
           (2 * w2 - n * (n + 1))::BIGINT AS dev4,
           CASE WHEN 2 * w2 > n * (n + 1) THEN 1
                WHEN 2 * w2 = n * (n + 1) THEN 0 ELSE -1 END AS direction,
           ROUND((2 * w2 - n * (n + 1))::DOUBLE
                 / SQRT((2 * n * (n + 1) * (2 * n + 1) - ties)::DOUBLE / 3),
                 6) + 0.0 AS z
    FROM s
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the paired daily (purchase revenue,
    view revenue) series — the PAIRED rank companion to mann_whitney_u
    (unpaired) and tost_equivalence (parametric): does purchase revenue
    systematically exceed view revenue on the same day, distribution-
    free.  Zero differences drop (standard Wilcoxon convention);
    absolute differences rank with midranks.

    Parity: daily sums are exact cents; ranks use the doubled-average-
    rank grid (2R(v) = 2*below(v) + cnt(v) + 1), so W2 = 2*W+ is an
    exact BIGINT; dev4 = 2*W2 - n(n+1) = 4(W+ - mu); 16*Var with the
    standard tie correction = (2n(n+1)(2n+1) - sum(t^3 - t))/3, one
    closed-form double under the sqrt; direction is an exact sign,
    `+ 0.0` for the dead-even series.

    Scale: one groupBy(day) conditional aggregate collapses the corpus;
    everything after runs on the <=|days| grid."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("long")
        .alias("xp"),
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("long")
        .alias("xv"),
    )
    d = daily.filter(F.col("xp") != F.col("xv")).select(
        (F.col("xp") - F.col("xv")).alias("diff"),
        F.abs(F.col("xp") - F.col("xv")).cast("long").alias("ad"),
    )
    grid = d.groupBy("ad").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).cast("long").alias("pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.withColumn(
        "below", (F.sum("cnt").over(w) - F.col("cnt")).cast("long")
    )
    s = cum.agg(
        F.sum(F.col("pos") * (2 * F.col("below") + F.col("cnt") + 1))
        .cast("long")
        .alias("w2"),
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("cnt") > 1,
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ties"),
    )
    n, w2 = F.col("n"), F.col("w2")
    dev4 = 2 * w2 - n * (n + 1)
    return s.select(
        n.alias("n_nonzero"),
        w2.alias("w_plus_doubled"),
        dev4.cast("long").alias("dev4"),
        F.when(2 * w2 > n * (n + 1), 1)
        .when(2 * w2 == n * (n + 1), 0)
        .otherwise(-1)
        .alias("direction"),
        (
            F.round(
                dev4.cast("double")
                / F.sqrt(
                    (2 * n * (n + 1) * (2 * n + 1) - F.col("ties")).cast("double")
                    / 3
                ),
                6,
            )
            + 0.0
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# cliffs_delta — ordinal effect size purchase vs view values
# ---------------------------------------------------------------------------


@query(
    "cliffs_delta",
    """
    WITH ev AS (
        SELECT event_type AS g, FLOOR(value * 100.0 + 0.5)::BIGINT AS v,
               COUNT(*)::BIGINT AS cnt
        FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1, 2
    ),
    grid AS (
        SELECT v,
               SUM(CASE WHEN g = 'purchase' THEN cnt ELSE 0 END)::BIGINT AS cp,
               SUM(CASE WHEN g = 'view' THEN cnt ELSE 0 END)::BIGINT AS cv
        FROM ev GROUP BY v
    ),
    cum AS (
        SELECT v, cp, cv,
               (SUM(cv) OVER (ORDER BY v) - cv)::BIGINT AS v_below,
               (SUM(cp) OVER (ORDER BY v) - cp)::BIGINT AS p_below
        FROM grid
    ),
    s AS (
        SELECT SUM(cp * v_below)::BIGINT AS gt,
               SUM(cv * p_below)::BIGINT AS lt,
               SUM(cp)::BIGINT AS n, SUM(cv)::BIGINT AS m
        FROM cum
    )
    SELECT n AS n_purchase, m AS n_view, gt AS n_greater, lt AS n_less,
           ROUND((gt - lt)::DOUBLE / (n * m), 6) + 0.0 AS delta,
           CASE WHEN abs(gt - lt) * 1000 < 147 * n * m THEN 'negligible'
                WHEN abs(gt - lt) * 1000 < 330 * n * m THEN 'small'
                WHEN abs(gt - lt) * 1000 < 474 * n * m THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM s
    """,
)
def cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between purchase and view event values
    — the ordinal effect-size companion to mann_whitney_u's p-value
    (how OFTEN does a purchase value beat a view value, not just
    whether the difference is significant): delta = (#(x>y) - #(x<y))
    / nm, with Romano's magnitude bands .147/.33/.474.

    Parity: both directed dominance counts are exact BIGINTs off the
    shared (cents) value grid (cnt * strictly-below cumulative of the
    other sample); the band classification compares exact integers by
    cross-multiplication (|gt - lt| * 1000 vs band * nm), never a
    rounded double; one division for the display value, `+ 0.0` for
    the signed-zero dead heat.

    Scale: grid cumulative over distinct cents — the mann_whitney
    plan shape, corpus collapsed by one groupBy."""
    e = load_table(spark, sf_dir, "events")
    ev = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy(
            F.col("event_type").alias("g"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    grid = ev.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "purchase", F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cp"),
        F.sum(F.when(F.col("g") == "view", F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cv"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "v",
        "cp",
        "cv",
        (F.sum("cv").over(w) - F.col("cv")).cast("long").alias("v_below"),
        (F.sum("cp").over(w) - F.col("cp")).cast("long").alias("p_below"),
    )
    s = cum.agg(
        F.sum(F.col("cp") * F.col("v_below")).cast("long").alias("gt"),
        F.sum(F.col("cv") * F.col("p_below")).cast("long").alias("lt"),
        F.sum("cp").cast("long").alias("n"),
        F.sum("cv").cast("long").alias("m"),
    )
    gt, lt, n, m = F.col("gt"), F.col("lt"), F.col("n"), F.col("m")
    adiff = F.abs(gt - lt)
    return s.select(
        n.alias("n_purchase"),
        m.alias("n_view"),
        gt.alias("n_greater"),
        lt.alias("n_less"),
        (F.round((gt - lt).cast("double") / (n * m), 6) + 0.0).alias("delta"),
        F.when(adiff * 1000 < 147 * n * m, "negligible")
        .when(adiff * 1000 < 330 * n * m, "small")
        .when(adiff * 1000 < 474 * n * m, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )
