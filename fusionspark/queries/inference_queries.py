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


# ---------------------------------------------------------------------------
# cochran_armitage — trend in purchase proportion across day-of-week doses
# ---------------------------------------------------------------------------


@query(
    "cochran_armitage",
    """
    WITH s AS (
        SELECT date_part('dow', ts)::BIGINT AS w,
               COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS a
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT SUM(n)::BIGINT AS nn, SUM(a)::BIGINT AS aa,
               SUM(n * w)::BIGINT AS snw, SUM(n * w * w)::BIGINT AS snw2,
               SUM(a * w)::BIGINT AS saw, COUNT(*)::BIGINT AS k
        FROM s
    )
    SELECT nn AS n_obs, aa AS n_pos, k AS n_doses,
           (nn * saw - aa * snw)::BIGINT AS t_num,
           CASE WHEN nn * saw > aa * snw THEN 1
                WHEN nn * saw = aa * snw THEN 0 ELSE -1 END AS direction,
           CASE WHEN aa > 0 AND aa < nn AND nn * snw2 > snw * snw THEN
               ROUND((nn * saw - aa * snw)::DOUBLE
                     / SQRT((aa * (nn - aa))::DOUBLE
                            * (nn * snw2 - snw * snw)::DOUBLE / nn), 6) + 0.0
           END AS z
    FROM t
    """,
)
def cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test — is the purchase PROPORTION monotone
    in an ordered dose, here day-of-week 0..6 (the dose-response
    companion to chi2_independence, which ignores the ordering, and to
    page_trend, which tests intensity ranks rather than proportions).

    Parity: per-dose (n_i, a_i) are exact conditional counts; the score
    statistic's numerator T = N*sum(a_i w_i) - A*sum(n_i w_i) is an
    exact BIGINT, direction its exact sign; the variance denominator is
    a product of two exact-integer factors cast to double (A(N-A) and
    N*sum(n w^2) - (sum n w)^2 — each int64-safe to sf10), guarded for
    the degenerate all/none-positive and single-dose corpora (NULL in
    both engines); dow parity is DuckDB date_part('dow') = Spark
    dayofweek()-1 (the simpsons_paradox convention).

    Scale: ONE map-side-combined groupBy(dow) collapses the corpus to
    7 rows; the statistic is driver-scale arithmetic."""
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy((F.dayofweek("ts") - 1).cast("long").alias("w")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    t = s.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("a").cast("long").alias("aa"),
        F.sum(F.col("n") * F.col("w")).cast("long").alias("snw"),
        F.sum(F.col("n") * F.col("w") * F.col("w")).cast("long").alias("snw2"),
        F.sum(F.col("a") * F.col("w")).cast("long").alias("saw"),
        F.count("*").cast("long").alias("k"),
    )
    nn, aa = F.col("nn"), F.col("aa")
    snw, snw2, saw = F.col("snw"), F.col("snw2"), F.col("saw")
    tnum = nn * saw - aa * snw
    return t.select(
        nn.alias("n_obs"),
        aa.alias("n_pos"),
        F.col("k").alias("n_doses"),
        tnum.cast("long").alias("t_num"),
        F.when(nn * saw > aa * snw, 1)
        .when(nn * saw == aa * snw, 0)
        .otherwise(-1)
        .alias("direction"),
        F.when(
            (aa > 0) & (aa < nn) & (nn * snw2 > snw * snw),
            F.round(
                tnum.cast("double")
                / F.sqrt(
                    (aa * (nn - aa)).cast("double")
                    * (nn * snw2 - snw * snw).cast("double")
                    / nn
                ),
                6,
            )
            + 0.0,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# mantel_haenszel — stratified 2x2 common odds ratio + CMH test
# ---------------------------------------------------------------------------

_DOWS = list(range(7))


def _mh_oracle() -> str:
    piv = ",\n               ".join(
        f"SUM(CASE WHEN w = {i} AND grp = 1 THEN a ELSE 0 END)::BIGINT AS a{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 1 THEN n - a ELSE 0 END)::BIGINT AS b{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 0 THEN a ELSE 0 END)::BIGINT AS c{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 0 THEN n - a ELSE 0 END)::BIGINT AS d{i}"
        for i in _DOWS
    )
    nn = lambda i: f"(a{i} + b{i} + c{i} + d{i})"  # noqa: E731
    sum_ad = " + ".join(
        f"CASE WHEN {nn(i)} > 0 THEN (a{i} * d{i})::DOUBLE / {nn(i)} ELSE 0.0 END"
        for i in _DOWS
    )
    sum_bc = " + ".join(
        f"CASE WHEN {nn(i)} > 0 THEN (b{i} * c{i})::DOUBLE / {nn(i)} ELSE 0.0 END"
        for i in _DOWS
    )
    sum_a = " + ".join(f"a{i}" for i in _DOWS)
    sum_e = " + ".join(
        f"CASE WHEN {nn(i)} > 0 THEN ((a{i} + b{i}) * (a{i} + c{i}))::DOUBLE"
        f" / {nn(i)} ELSE 0.0 END"
        for i in _DOWS
    )
    sum_v = " + ".join(
        f"CASE WHEN {nn(i)} > 1 THEN ((a{i} + b{i}) * (c{i} + d{i}))::DOUBLE"
        f" * ((a{i} + c{i}) * (b{i} + d{i}))::DOUBLE"
        f" / ((({nn(i)})::DOUBLE * {nn(i)}) * ({nn(i)} - 1)) ELSE 0.0 END"
        for i in _DOWS
    )
    return f"""
    WITH s AS (
        SELECT date_part('dow', ts)::BIGINT AS w,
               user_id % 2 AS grp,
               COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS a
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT {piv}
        FROM s
    ),
    f AS (
        SELECT ({sum_ad}) AS sad, ({sum_bc}) AS sbc,
               ({sum_a})::BIGINT AS sa, ({sum_e}) AS se, ({sum_v}) AS sv
        FROM wide
    )
    SELECT sa AS sum_a, ROUND(se, 6) AS sum_e,
           CASE WHEN sbc > 0 THEN ROUND(sad / sbc, 6) + 0.0 END AS or_mh,
           CASE WHEN sv > 0
                THEN ROUND((sa - se) * (sa - se) / sv, 6) + 0.0 END AS chi2_cmh,
           CASE WHEN sa::DOUBLE > se THEN 1
                WHEN sa::DOUBLE = se THEN 0 ELSE -1 END AS direction
    FROM f
    """


@query("mantel_haenszel", _mh_oracle())
def mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio + Cochran-Mantel-Haenszel test
    across day-of-week strata (group = user parity, outcome = purchase)
    — the STRATUM-ADJUSTED effect estimate that simpsons_paradox's
    direction audit says you must read instead of the crude aggregate
    when strata confound (MH 1959; no continuity correction,
    documented).

    Parity: the 7 strata pivot to fixed columns so every per-stratum
    double term (a_i d_i / n_i, the CMH expectation and variance) sums
    in LITERAL dow order, never shuffle order; cell counts are exact
    conditional BIGINTs; the variance factors pair into two exact-int
    products cast to double before multiplying (int64-safe to sf10);
    empty strata contribute exact 0.0 in both engines; single
    guarded divisions, `+ 0.0` on both ratio outputs.

    Scale: ONE groupBy(dow, grp) collapses the corpus to 14 cells;
    everything after is a 1-row closed form."""
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("w"),
        (F.col("user_id") % 2).alias("grp"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    aggs = []
    for i in _DOWS:
        at_i = (F.col("w") == i)
        aggs += [
            F.sum(F.when(at_i & (F.col("grp") == 1), F.col("a")).otherwise(0))
            .cast("long")
            .alias(f"a{i}"),
            F.sum(
                F.when(at_i & (F.col("grp") == 1), F.col("n") - F.col("a"))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"b{i}"),
            F.sum(F.when(at_i & (F.col("grp") == 0), F.col("a")).otherwise(0))
            .cast("long")
            .alias(f"c{i}"),
            F.sum(
                F.when(at_i & (F.col("grp") == 0), F.col("n") - F.col("a"))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"d{i}"),
        ]
    wide = s.agg(*aggs)
    zero = F.lit(0.0)
    sad = sbc = se = sv = None
    sa = None
    for i in _DOWS:
        a, b = F.col(f"a{i}"), F.col(f"b{i}")
        c, d = F.col(f"c{i}"), F.col(f"d{i}")
        n_i = a + b + c + d
        t_ad = F.when(n_i > 0, (a * d).cast("double") / n_i).otherwise(zero)
        t_bc = F.when(n_i > 0, (b * c).cast("double") / n_i).otherwise(zero)
        t_e = F.when(
            n_i > 0, ((a + b) * (a + c)).cast("double") / n_i
        ).otherwise(zero)
        t_v = F.when(
            n_i > 1,
            ((a + b) * (c + d)).cast("double")
            * ((a + c) * (b + d)).cast("double")
            / ((n_i.cast("double") * n_i) * (n_i - 1)),
        ).otherwise(zero)
        sad = t_ad if sad is None else sad + t_ad
        sbc = t_bc if sbc is None else sbc + t_bc
        se = t_e if se is None else se + t_e
        sv = t_v if sv is None else sv + t_v
        sa = a if sa is None else sa + a
    f = wide.select(
        sad.alias("sad"),
        sbc.alias("sbc"),
        sa.cast("long").alias("sa"),
        se.alias("se"),
        sv.alias("sv"),
    )
    return f.select(
        F.col("sa").alias("sum_a"),
        F.round("se", 6).alias("sum_e"),
        F.when(
            F.col("sbc") > 0, F.round(F.col("sad") / F.col("sbc"), 6) + 0.0
        ).alias("or_mh"),
        F.when(
            F.col("sv") > 0,
            F.round(
                (F.col("sa") - F.col("se")) * (F.col("sa") - F.col("se"))
                / F.col("sv"),
                6,
            )
            + 0.0,
        ).alias("chi2_cmh"),
        F.when(F.col("sa").cast("double") > F.col("se"), 1)
        .when(F.col("sa").cast("double") == F.col("se"), 0)
        .otherwise(-1)
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# bartlett_test — variance homogeneity across the five event types
# ---------------------------------------------------------------------------


def _bartlett_oracle() -> str:
    piv = ",\n               ".join(
        f"SUM(CASE WHEN g = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n{i},\n"
        f"               SUM(CASE WHEN g = '{t}' THEN v ELSE 0 END)::BIGINT AS s{i},\n"
        f"               SUM(CASE WHEN g = '{t}' THEN v * v ELSE 0 END)::BIGINT AS ss{i}"
        for i, t in enumerate(_TYPES)
    )
    s2 = lambda i: (  # noqa: E731
        f"((ss{i} - s{i}::DOUBLE * s{i} / n{i}) / (n{i} - 1))"
    )
    sstot = " + ".join(f"ss{i}" for i in range(5))
    sb = " + ".join(f"(s{i}::DOUBLE * s{i} / n{i})" for i in range(5))
    nn = " + ".join(f"n{i}" for i in range(5))
    sum_ln = " + ".join(f"(n{i} - 1) * ln({s2(i)})" for i in range(5))
    sum_inv = " + ".join(f"1.0 / (n{i} - 1)" for i in range(5))
    ok = " AND ".join(
        f"n{i} > 1 AND ss{i} - s{i}::DOUBLE * s{i} / n{i} > 0" for i in range(5)
    )
    return f"""
    WITH ev AS (
        SELECT event_type AS g, FLOOR(value * 100.0 + 0.5)::BIGINT AS v
        FROM events
    ),
    wide AS (
        SELECT {piv}
        FROM ev
    ),
    f AS (
        SELECT ({nn})::BIGINT AS n, ({sstot})::BIGINT AS sstot, ({sb}) AS sb,
               CASE WHEN {ok} THEN ({sum_ln}) ELSE NULL END AS sln,
               ({sum_inv}) AS sinv,
               CASE WHEN {ok} THEN 1 ELSE 0 END AS ok
        FROM wide
    )
    SELECT n AS n_obs, 5::BIGINT AS k_groups,
           CASE WHEN ok = 1 AND sstot - sb > 0 THEN
               ROUND(((n - 5) * ln((sstot - sb) / (n - 5)) - sln)
                     / (1 + (sinv - 1.0 / (n - 5)) / 12), 6) + 0.0
           END AS chi2,
           CASE WHEN ok = 1 AND sstot - sb > 0 THEN
               ((n - 5) * ln((sstot - sb) / (n - 5)) - sln)
               / (1 + (sinv - 1.0 / (n - 5)) / 12) > 9488::DOUBLE / 1000
           END AS variances_differ
    FROM f
    """


@query("bartlett_test", _bartlett_oracle())
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the five event
    types — the PARAMETRIC companion to levene_test (more powerful
    under normality, fragile otherwise; running both is the standard
    pre-ANOVA protocol): chi2 = [(N-k) ln(sp^2) - sum (n_i-1) ln(s_i^2)]
    / C with the usual correction C, df = k-1 = 4, rejected against
    9.488 = chi2_.05(4) as an integer-literal ratio.

    Parity: per-group (n, sum v, sum v^2) are exact BIGINTs in ONE
    pivoted aggregate (fixed 5-type literal order for every cross-group
    sum); each variance is the levene-precedent S::DOUBLE*S/n form;
    ln runs on identical computed doubles in both engines (the
    weighted_sample/lm_perplexity precedent); degenerate groups
    (n_i <= 1 or zero variance) yield NULL in both engines; `+ 0.0`
    since chi2 can round to zero from above.

    Scale: one map-side-combined aggregate collapses the corpus to a
    single 15-column row; the statistic is a closed form on it."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v"),
    )
    aggs = []
    for i, t in enumerate(_TYPES):
        at = F.col("g") == t
        aggs += [
            F.sum(F.when(at, 1).otherwise(0)).cast("long").alias(f"n{i}"),
            F.sum(F.when(at, F.col("v")).otherwise(0)).cast("long").alias(f"s{i}"),
            F.sum(F.when(at, F.col("v") * F.col("v")).otherwise(0))
            .cast("long")
            .alias(f"ss{i}"),
        ]
    wide = ev.agg(*aggs)

    def s2(i: int):
        n_i, s_i, ss_i = F.col(f"n{i}"), F.col(f"s{i}"), F.col(f"ss{i}")
        return (ss_i - s_i.cast("double") * s_i / n_i) / (n_i - 1)

    n = sum((F.col(f"n{i}") for i in range(1, 5)), F.col("n0"))
    sstot = sum((F.col(f"ss{i}") for i in range(1, 5)), F.col("ss0"))
    sb = None
    sln = None
    sinv = None
    ok = None
    for i in range(5):
        n_i, s_i, ss_i = F.col(f"n{i}"), F.col(f"s{i}"), F.col(f"ss{i}")
        t_sb = s_i.cast("double") * s_i / n_i
        t_ln = (n_i - 1) * F.log(s2(i))
        t_inv = F.lit(1.0) / (n_i - 1)
        cond = (n_i > 1) & (ss_i - s_i.cast("double") * s_i / n_i > 0)
        sb = t_sb if sb is None else sb + t_sb
        sln = t_ln if sln is None else sln + t_ln
        sinv = t_inv if sinv is None else sinv + t_inv
        ok = cond if ok is None else ok & cond
    f = wide.select(
        n.cast("long").alias("n"),
        sstot.cast("long").alias("sstot"),
        sb.alias("sb"),
        F.when(ok, sln).alias("sln"),
        sinv.alias("sinv"),
        F.when(ok, 1).otherwise(0).alias("ok"),
    )
    nn = F.col("n")
    chi2 = (
        (nn - 5) * F.log((F.col("sstot") - F.col("sb")) / (nn - 5))
        - F.col("sln")
    ) / (1 + (F.col("sinv") - F.lit(1.0) / (nn - 5)) / 12)
    good = (F.col("ok") == 1) & (F.col("sstot") - F.col("sb") > 0)
    crit = F.lit(9488).cast("double") / F.lit(1000).cast("double")
    return f.select(
        nn.alias("n_obs"),
        F.lit(5).cast("long").alias("k_groups"),
        F.when(good, F.round(chi2, 6) + 0.0).alias("chi2"),
        F.when(good, chi2 > crit).alias("variances_differ"),
    )


# ---------------------------------------------------------------------------
# theil_u — uncertainty coefficient U(event_type | day-of-week)
# ---------------------------------------------------------------------------


def _theil_u_oracle() -> str:
    cells = ",\n               ".join(
        f"SUM(CASE WHEN w = {i} AND g = '{t}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS c{i}_{j}"
        for i in _DOWS
        for j, t in enumerate(_TYPES)
    )
    rows = " + ".join  # noqa: E731 — helper alias
    r = {i: " + ".join(f"c{i}_{j}" for j in range(5)) for i in _DOWS}
    k = {j: " + ".join(f"c{i}_{j}" for i in _DOWS) for j in range(5)}
    n = " + ".join(f"c{i}_{j}" for i in _DOWS for j in range(5))
    sum_k = " + ".join(
        f"CASE WHEN ({k[j]}) > 0 THEN ({k[j]}) * ln(({k[j]})::DOUBLE)"
        f" ELSE 0.0 END"
        for j in range(5)
    )
    sum_r = " + ".join(
        f"CASE WHEN ({r[i]}) > 0 THEN ({r[i]}) * ln(({r[i]})::DOUBLE)"
        f" ELSE 0.0 END"
        for i in _DOWS
    )
    sum_c = " + ".join(
        f"CASE WHEN c{i}_{j} > 0 THEN c{i}_{j} * ln(c{i}_{j}::DOUBLE)"
        f" ELSE 0.0 END"
        for i in _DOWS
        for j in range(5)
    )
    return f"""
    WITH ev AS (
        SELECT date_part('dow', ts)::BIGINT AS w, event_type AS g
        FROM events
    ),
    wide AS (
        SELECT {cells}
        FROM ev
    ),
    f AS (
        SELECT ({n})::BIGINT AS n, ({sum_k}) AS sk, ({sum_r}) AS sr,
               ({sum_c}) AS sc
        FROM wide
    )
    SELECT n AS n_obs,
           ROUND(ln(n::DOUBLE) - sk / n, 6) AS h_type,
           ROUND((sr - sc) / n, 6) AS h_type_given_dow,
           CASE WHEN ln(n::DOUBLE) - sk / n > 0 THEN
               ROUND((ln(n::DOUBLE) - sk / n - (sr - sc) / n)
                     / (ln(n::DOUBLE) - sk / n), 6) + 0.0
           END AS theil_u
    FROM f
    """


@query("theil_u", _theil_u_oracle())
def theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(event_type | day-of-week) —
    the ASYMMETRIC, chance-normalized categorical association (how much
    of the event-type entropy does knowing the weekday remove), the
    information-theoretic companion to cramers_v (symmetric, chi2-
    based): U = (H(Y) - H(Y|X)) / H(Y) in [0, 1].

    Parity: the 35 contingency cells pivot to fixed columns in ONE
    aggregate; every entropy sum (5 column totals, 7 row totals, 35
    cells) folds in FIXED literal order with c*ln(c) terms guarded at
    zero; ln runs on identical exact-integer-cast doubles in both
    engines (entropy_rate precedent); H(Y) = ln N - sum k ln k / N is
    written with the identical tree on both sides; `+ 0.0` kills the
    signed zero of an independence-exact corpus.

    Scale: one groupBy-free pivoted aggregate (map-side combine over
    35 conditions) collapses the corpus to a single row."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        (F.dayofweek("ts") - 1).cast("long").alias("w"),
        F.col("event_type").alias("g"),
    )
    aggs = [
        F.sum(F.when((F.col("w") == i) & (F.col("g") == t), 1).otherwise(0))
        .cast("long")
        .alias(f"c{i}_{j}")
        for i in _DOWS
        for j, t in enumerate(_TYPES)
    ]
    wide = ev.agg(*aggs)

    def lnterm(col):
        return F.when(col > 0, col * F.log(col.cast("double"))).otherwise(
            F.lit(0.0)
        )

    rsum = {
        i: sum((F.col(f"c{i}_{j}") for j in range(1, 5)), F.col(f"c{i}_0"))
        for i in _DOWS
    }
    ksum = {
        j: sum(
            (F.col(f"c{i}_{j}") for i in _DOWS[1:]), F.col(f"c0_{j}")
        )
        for j in range(5)
    }
    n = sum(
        (F.col(f"c{i}_{j}") for i in _DOWS for j in range(5) if (i, j) != (0, 0)),
        F.col("c0_0"),
    )
    sk = None
    for j in range(5):
        t = lnterm(ksum[j])
        sk = t if sk is None else sk + t
    sr = None
    for i in _DOWS:
        t = lnterm(rsum[i])
        sr = t if sr is None else sr + t
    sc = None
    for i in _DOWS:
        for j in range(5):
            t = lnterm(F.col(f"c{i}_{j}"))
            sc = t if sc is None else sc + t
    f = wide.select(
        n.cast("long").alias("n"), sk.alias("sk"), sr.alias("sr"), sc.alias("sc")
    )
    nn = F.col("n")
    hy = F.log(nn.cast("double")) - F.col("sk") / nn
    hyx = (F.col("sr") - F.col("sc")) / nn
    return f.select(
        nn.alias("n_obs"),
        F.round(hy, 6).alias("h_type"),
        F.round(hyx, 6).alias("h_type_given_dow"),
        F.when(hy > 0, F.round((hy - hyx) / hy, 6) + 0.0).alias("theil_u"),
    )


# ---------------------------------------------------------------------------
# cvm_two_sample — Cramér–von Mises distance purchase vs view
# ---------------------------------------------------------------------------


@query(
    "cvm_two_sample",
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
        SELECT cp, cv,
               SUM(cp) OVER (ORDER BY v)::BIGINT AS fp,
               SUM(cv) OVER (ORDER BY v)::BIGINT AS fv
        FROM grid
    ),
    tot AS (
        SELECT SUM(cp)::BIGINT AS n, SUM(cv)::BIGINT AS m FROM grid
    ),
    s AS (
        SELECT SUM((cp + cv)::HUGEINT
                   * ((t.m * c.fp - t.n * c.fv)::HUGEINT
                      * (t.m * c.fp - t.n * c.fv)::HUGEINT))::HUGEINT AS s2,
               MAX(t.n)::BIGINT AS n, MAX(t.m)::BIGINT AS m
        FROM cum c, tot t
    )
    SELECT n AS n_purchase, m AS n_view,
           ROUND(s2::DOUBLE
                 / ((n::DOUBLE * m) * ((n + m)::DOUBLE * (n + m))), 6)
               AS cvm_t
    FROM s
    """,
)
def cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between purchase and view
    event values — the INTEGRATED-distance companion to ks_two_sample
    (KS reads only the single worst ECDF gap; CvM accumulates every
    gap, so it sees broad shape drift KS misses): the tied-data ECDF
    plug-in form T = nm/N^2 * sum over all observations of
    (F_n - G_m)^2.

    Parity: per-value inclusive cumulative counts fp, fv are exact
    BIGINTs off the shared cents grid; each term (cp+cv)*(m*fp - n*fv)^2
    is exact 128-bit integer arithmetic (DuckDB HUGEINT / Spark
    DECIMAL(38,0) — int64 headroom runs out at (m*fp)^2), and the one
    division casts the SAME exact integer to double in both engines.

    Scale: one groupBy(type, cents) + one grid cumulative window over
    distinct cents; the N^2-free grid form never touches raw pairs."""
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
        "cp",
        "cv",
        F.sum("cp").over(w).cast("long").alias("fp"),
        F.sum("cv").over(w).cast("long").alias("fv"),
    )
    tot = grid.agg(
        F.sum("cp").cast("long").alias("n"), F.sum("cv").cast("long").alias("m")
    )
    c = cum.crossJoin(F.broadcast(tot))
    d = (F.col("m") * F.col("fp") - F.col("n") * F.col("fv")).cast(
        "decimal(19,0)"
    )
    term = (F.col("cp") + F.col("cv")).cast("decimal(19,0)") * (d * d)
    s = c.agg(
        F.sum(term.cast("decimal(38,0)")).alias("s2"),
        F.max("n").cast("long").alias("n"),
        F.max("m").cast("long").alias("m"),
    )
    n, m = F.col("n"), F.col("m")
    return s.select(
        n.alias("n_purchase"),
        m.alias("n_view"),
        F.round(
            F.col("s2").cast("double")
            / ((n.cast("double") * m) * ((n + m).cast("double") * (n + m))),
            6,
        ).alias("cvm_t"),
    )


# ---------------------------------------------------------------------------
# kpss_test — level stationarity of the daily revenue series
# ---------------------------------------------------------------------------


@query(
    "kpss_test",
    f"""
    WITH {_DAILY_CTE},
    tot AS (
        SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS s FROM daily
    ),
    dev AS (
        SELECT (t.n * d.x - t.s)::BIGINT AS dd, d.day
        FROM daily d, tot t
    ),
    part AS (
        SELECT dd, SUM(dd) OVER (ORDER BY day)::BIGINT AS p
        FROM dev
    ),
    s AS (
        SELECT SUM(p::HUGEINT * p::HUGEINT)::HUGEINT AS sp2,
               SUM(dd::HUGEINT * dd::HUGEINT)::HUGEINT AS sd2,
               COUNT(*)::BIGINT AS n
        FROM part
    )
    SELECT n AS n_days,
           CASE WHEN sd2 > 0 THEN
               ROUND(sp2::DOUBLE / (n::DOUBLE * sd2::DOUBLE), 6)
           END AS kpss_eta,
           CASE WHEN sd2 > 0 THEN
               sp2::DOUBLE / (n::DOUBLE * sd2::DOUBLE) > 463::DOUBLE / 1000
           END AS nonstationary
    FROM s
    """,
)
def kpss_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (lag-0) on the daily revenue series
    — the NULL-reversed companion to the trend family (mann_kendall /
    theil_sen test FOR a trend; KPSS tests AGAINST stationarity, so
    running both separates trend from random walk): eta = sum_t S_t^2
    / (n^2 * sigma^2), rejected against 0.463 = 5% level critical
    value as an integer-literal ratio.

    Parity: residuals scale by n (d_t = n*x_t - S, exact BIGINT) so
    partial sums P_t = n^2 * S_t are exact; eta folds to
    sum P^2 / (n * sum d^2) with both squares in 128-bit exact
    arithmetic (HUGEINT / DECIMAL(38,0)); ONE division of identical
    doubles; the all-constant series yields NULL in both engines.

    Scale: the corpus collapses in one groupBy(day); the cumulative
    window runs over the bounded daily frame."""
    d = _daily_frame(spark, sf_dir).localCheckpoint(eager=True)
    tot = d.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    dev = d.crossJoin(F.broadcast(tot)).select(
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("dd"),
        "day",
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    part = dev.select("dd", F.sum("dd").over(w).cast("long").alias("p"))
    pd_ = F.col("p").cast("decimal(19,0)")
    dd_ = F.col("dd").cast("decimal(19,0)")
    s = part.agg(
        F.sum((pd_ * pd_).cast("decimal(38,0)")).alias("sp2"),
        F.sum((dd_ * dd_).cast("decimal(38,0)")).alias("sd2"),
        F.count("*").cast("long").alias("n"),
    )
    n = F.col("n")
    eta = F.col("sp2").cast("double") / (
        n.cast("double") * F.col("sd2").cast("double")
    )
    good = F.col("sd2") > 0
    crit = F.lit(463).cast("double") / F.lit(1000).cast("double")
    return s.select(
        n.alias("n_days"),
        F.when(good, F.round(eta, 6)).alias("kpss_eta"),
        F.when(good, eta > crit).alias("nonstationary"),
    )


# ---------------------------------------------------------------------------
# permutation_entropy — ordinal-pattern complexity of the daily series
# ---------------------------------------------------------------------------

#: ln 6 as an integer-literal ratio (max entropy of order-3 patterns)
_LN6_NUM = 1791759469228055


def _perm_entropy_oracle() -> str:
    cells = ",\n               ".join(
        f"SUM(CASE WHEN pid = {p} THEN 1 ELSE 0 END)::BIGINT AS c{p}"
        for p in range(27)
    )
    sum_c = " + ".join(
        f"CASE WHEN c{p} > 0 THEN c{p} * ln(c{p}::DOUBLE) ELSE 0.0 END"
        for p in range(27)
    )
    n_pat = " + ".join(f"CASE WHEN c{p} > 0 THEN 1 ELSE 0 END" for p in range(27))
    nw = " + ".join(f"c{p}" for p in range(27))
    return f"""
    WITH {_DAILY_CTE},
    tri AS (
        SELECT x AS x1,
               LEAD(x, 1) OVER (ORDER BY day) AS x2,
               LEAD(x, 2) OVER (ORDER BY day) AS x3
        FROM daily
    ),
    pat AS (
        SELECT ((CASE WHEN x2 > x1 THEN 2 WHEN x2 = x1 THEN 1 ELSE 0 END) * 9
                + (CASE WHEN x3 > x1 THEN 2 WHEN x3 = x1 THEN 1 ELSE 0 END) * 3
                + (CASE WHEN x3 > x2 THEN 2 WHEN x3 = x2 THEN 1 ELSE 0 END)
               )::BIGINT AS pid
        FROM tri WHERE x3 IS NOT NULL
    ),
    wide AS (
        SELECT {cells}
        FROM pat
    ),
    f AS (
        SELECT ({nw})::BIGINT AS nw, ({sum_c}) AS sc, ({n_pat})::BIGINT AS np
        FROM wide
    )
    SELECT nw AS n_windows, np AS n_patterns,
           CASE WHEN nw > 0 THEN
               ROUND(ln(nw::DOUBLE) - sc / nw, 6) + 0.0 END AS perm_entropy,
           CASE WHEN nw > 0 THEN
               ROUND((ln(nw::DOUBLE) - sc / nw)
                     / ({_LN6_NUM}::DOUBLE / 1000000000000000), 6) + 0.0
           END AS normalized
    FROM f
    """


@query("permutation_entropy", _perm_entropy_oracle())
def permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002, order 3) of the daily
    revenue series — ordinal-pattern complexity: how unpredictable are
    the SHAPES of consecutive 3-day windows (the model-free complement
    to hurst_exponent's long-memory and entropy_rate's Markov
    predictability; ties get their own pattern class, so the id space
    is the 27 sign-triples).

    Parity: pattern ids are exact integer encodings of three sign
    comparisons on exact cents; the 27 pattern counts pivot to fixed
    columns so the entropy folds in literal order (theil_u precedent);
    ln on identical exact-int doubles; ln(6) enters as an integer-
    literal ratio; `+ 0.0` for the perfectly regular series.

    Scale: the corpus collapses in one groupBy(day); LEAD windows run
    over the bounded daily frame only."""
    d = _daily_frame(spark, sf_dir)
    w = Window.orderBy("day")
    tri = d.select(
        F.col("x").alias("x1"),
        F.lead("x", 1).over(w).alias("x2"),
        F.lead("x", 2).over(w).alias("x3"),
    ).filter(F.col("x3").isNotNull())

    def trit(hi, lo):
        return (
            F.when(hi > lo, 2).when(hi == lo, 1).otherwise(0)
        )

    pat = tri.select(
        (
            trit(F.col("x2"), F.col("x1")) * 9
            + trit(F.col("x3"), F.col("x1")) * 3
            + trit(F.col("x3"), F.col("x2"))
        )
        .cast("long")
        .alias("pid")
    )
    aggs = [
        F.sum(F.when(F.col("pid") == p, 1).otherwise(0))
        .cast("long")
        .alias(f"c{p}")
        for p in range(27)
    ]
    wide = pat.agg(*aggs)
    nw = sum((F.col(f"c{p}") for p in range(1, 27)), F.col("c0"))
    sc = None
    np_ = None
    for p in range(27):
        c = F.col(f"c{p}")
        t = F.when(c > 0, c * F.log(c.cast("double"))).otherwise(F.lit(0.0))
        sc = t if sc is None else sc + t
        one = F.when(c > 0, 1).otherwise(0)
        np_ = one if np_ is None else np_ + one
    f = wide.select(
        nw.cast("long").alias("nw"), sc.alias("sc"), np_.cast("long").alias("np")
    )
    nn = F.col("nw")
    h = F.log(nn.cast("double")) - F.col("sc") / nn
    ln6 = F.lit(_LN6_NUM).cast("double") / F.lit(10**15).cast("double")
    return f.select(
        nn.alias("n_windows"),
        F.col("np").alias("n_patterns"),
        F.when(nn > 0, F.round(h, 6) + 0.0).alias("perm_entropy"),
        F.when(nn > 0, F.round(h / ln6, 6) + 0.0).alias("normalized"),
    )


# ---------------------------------------------------------------------------
# bowker_symmetry — symmetry test of the event-type transition matrix
# ---------------------------------------------------------------------------


def _bowker_oracle() -> str:
    cells = ",\n               ".join(
        f"SUM(CASE WHEN g = '{a}' AND ng = '{b}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS c_{i}_{j}"
        for i, a in enumerate(_TYPES)
        for j, b in enumerate(_TYPES)
    )
    pairs = [(i, j) for i in range(5) for j in range(5) if i < j]
    chi2 = " + ".join(
        f"CASE WHEN c_{i}_{j} + c_{j}_{i} > 0 THEN"
        f" ((c_{i}_{j} - c_{j}_{i}) * (c_{i}_{j} - c_{j}_{i}))::DOUBLE"
        f" / (c_{i}_{j} + c_{j}_{i}) ELSE 0.0 END"
        for i, j in pairs
    )
    df = " + ".join(
        f"CASE WHEN c_{i}_{j} + c_{j}_{i} > 0 THEN 1 ELSE 0 END"
        for i, j in pairs
    )
    n = " + ".join(f"c_{i}_{j}" for i in range(5) for j in range(5))
    return f"""
    WITH seq AS (
        SELECT event_type AS g,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS ng
        FROM events
    ),
    pairs AS (SELECT g, ng FROM seq WHERE ng IS NOT NULL),
    wide AS (
        SELECT {cells}
        FROM pairs
    )
    SELECT ({n})::BIGINT AS n_transitions,
           ({df})::BIGINT AS df,
           ROUND({chi2}, 6) + 0.0 AS chi2
    FROM wide
    """


@query("bowker_symmetry", _bowker_oracle())
def bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test on the per-user event-type transition
    matrix — is the session flow DIRECTIONAL (view->purchase more
    common than purchase->view) or symmetric: the k-category McNemar
    generalization, chi2 = sum over unordered type pairs of
    (c_ij - c_ji)^2 / (c_ij + c_ji), df = #pairs observed — the
    inferential layer on top of event_transitions' raw counts and
    entropy_rate's predictability.

    Parity: the 25 transition cells are exact conditional BIGINTs in
    ONE pivoted aggregate over the same LEAD pairs as entropy_rate;
    the 10 chi2 terms (exact-integer numerator, one division each)
    sum in FIXED (i, j) literal order; empty pairs contribute exact
    0.0 and drop from df in both engines; `+ 0.0` for the perfectly
    symmetric corpus.

    Scale: one per-user window builds transitions (hash-partitioned by
    user), one aggregate collapses to a single row."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("g"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("ng"),
    ).filter(F.col("ng").isNotNull())
    aggs = [
        F.sum(F.when((F.col("g") == a) & (F.col("ng") == b), 1).otherwise(0))
        .cast("long")
        .alias(f"c_{i}_{j}")
        for i, a in enumerate(_TYPES)
        for j, b in enumerate(_TYPES)
    ]
    wide = seq.agg(*aggs)
    pairs = [(i, j) for i in range(5) for j in range(5) if i < j]
    chi2 = None
    df = None
    for i, j in pairs:
        cij, cji = F.col(f"c_{i}_{j}"), F.col(f"c_{j}_{i}")
        t = F.when(
            cij + cji > 0,
            ((cij - cji) * (cij - cji)).cast("double") / (cij + cji),
        ).otherwise(F.lit(0.0))
        chi2 = t if chi2 is None else chi2 + t
        one = F.when(cij + cji > 0, 1).otherwise(0)
        df = one if df is None else df + one
    n = None
    for i in range(5):
        for j in range(5):
            c = F.col(f"c_{i}_{j}")
            n = c if n is None else n + c
    return wide.select(
        n.cast("long").alias("n_transitions"),
        df.cast("long").alias("df"),
        (F.round(chi2, 6) + 0.0).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# graph_assortativity — degree mixing on the deterministic link graph
# ---------------------------------------------------------------------------


@query(
    "graph_assortativity",
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
    deg AS (
        SELECT doc_id, COUNT(*)::BIGINT AS dg FROM (
            SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e
        ) GROUP BY doc_id
    ),
    ed AS (
        SELECT da.dg AS j, db.dg AS k
        FROM e JOIN deg da ON da.doc_id = e.a
               JOIN deg db ON db.doc_id = e.b
    ),
    s AS (
        SELECT COUNT(*)::BIGINT AS m,
               SUM(j * k)::BIGINT AS sjk,
               SUM(j + k)::BIGINT AS sjpk,
               SUM(j * j + k * k)::BIGINT AS sj2k2
        FROM ed
    )
    SELECT m AS n_edges,
           (4 * m * sjk - sjpk * sjpk)::BIGINT AS num4,
           (2 * m * sj2k2 - sjpk * sjpk)::BIGINT AS den4,
           CASE WHEN 2 * m * sj2k2 - sjpk * sjpk > 0 THEN
               ROUND((4 * m * sjk - sjpk * sjpk)::DOUBLE
                     / (2 * m * sj2k2 - sjpk * sjpk), 6) + 0.0
           END AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    deterministic 3-out link graph d -> {d+1, d+2, 3d+1} mod N — do
    high-degree nodes link to high-degree nodes: the graph-level mixing
    readout on top of graph_triangles' local clustering and
    degree_distribution's marginals (assortative crawl/link graphs
    shard differently from disassortative hub-and-spoke ones).

    Parity: r is the Pearson correlation over edge endpoint degree
    pairs, folded to exact BIGINTs by multiplying through by 4M^2
    (num4 = 4M*sum(jk) - (sum(j+k))^2, den4 likewise with the mean of
    squares); degrees are bounded (<= 6) so every sum is int64-safe at
    any SF; ONE guarded division, `+ 0.0` for the exactly-neutral
    graph.

    Scale: the same two id-keyed equi-joins as graph_triangles (edges
    to the degree table); no window, no cartesian."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = None
    for a, b in ((1, 1), (1, 2), (3, 1)):
        e = docs.select(d.alias("s"), ((d * a + b) % n).alias("dd"))
        edges = e if edges is None else edges.unionAll(e)
    e = (
        edges.filter(F.col("s") != F.col("dd"))
        .select(
            F.least("s", "dd").alias("a"), F.greatest("s", "dd").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .unionAll(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dg"))
    )
    da = deg.select(F.col("doc_id").alias("a"), F.col("dg").alias("j"))
    db = deg.select(F.col("doc_id").alias("b"), F.col("dg").alias("k"))
    ed = e.join(da, "a").join(db, "b")
    s = ed.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("long").alias("sjk"),
        F.sum(F.col("j") + F.col("k")).cast("long").alias("sjpk"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("long")
        .alias("sj2k2"),
    )
    m, sjk = F.col("m"), F.col("sjk")
    sjpk, sj2k2 = F.col("sjpk"), F.col("sj2k2")
    num4 = 4 * m * sjk - sjpk * sjpk
    den4 = 2 * m * sj2k2 - sjpk * sjpk
    return s.select(
        m.alias("n_edges"),
        num4.cast("long").alias("num4"),
        den4.cast("long").alias("den4"),
        F.when(den4 > 0, F.round(num4.cast("double") / den4, 6) + 0.0).alias(
            "assortativity"
        ),
    )


# ---------------------------------------------------------------------------
# embedding_dim_stats — per-dimension exact moments (embedding health)
# ---------------------------------------------------------------------------


@query(
    "embedding_dim_stats",
    """
    WITH ex AS (
        -- the ::DOUBLE cast is load-bearing: FLOAT * 1000000.0 (a DECIMAL
        -- literal) does not promote to DOUBLE in DuckDB, and the float
        -- product rounds differently from Spark's float-widened double
        SELECT i - 1 AS dim,
               FLOOR(embedding[i]::DOUBLE * 1000000.0 + 0.5)::BIGINT AS q
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT dim::BIGINT AS dim, COUNT(*)::BIGINT AS n,
           MIN(q)::BIGINT AS min_micro, MAX(q)::BIGINT AS max_micro,
           SUM(q)::BIGINT AS sum_micro,
           ROUND((SUM(q)::DOUBLE / COUNT(*)) / 1000000.0, 6) + 0.0 AS mean,
           ROUND((SUM(q * q)::BIGINT - SUM(q)::DOUBLE * SUM(q) / COUNT(*))
                 / (COUNT(*) - 1) / 1000000000000.0, 6) + 0.0 AS variance
    FROM ex GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment profile of the embedding corpus — the
    vector-column health check a 100 TB embedding pipeline runs before
    trusting ANN recall (a dead dimension, a scale outlier, or a
    mean-shifted batch shows up here long before recall drops; the
    per-dimension complement to embedding_spectrum's global PCA view).

    Parity: components quantize to exact micro-units (FLOOR(v*1e6+.5)
    on the float widened to double — identical in both engines), so
    n/min/max/sum are exact BIGINTs and mean/variance are the
    levene-precedent S::DOUBLE*S/n closed forms; `+ 0.0` on both
    rounded outputs (a zero-mean dimension rounds to a signed zero).

    Scale: posexplode is a zero-shuffle per-row fan-out; ONE
    groupBy(dim) with map-side combine onto 64 rows — vectors never
    shuffle whole."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.floor(F.col("val") * 1000000.0 + 0.5).cast("long").alias("q"),
    )
    g = ex.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.min("q").cast("long").alias("min_micro"),
        F.max("q").cast("long").alias("max_micro"),
        F.sum("q").cast("long").alias("sum_micro"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ssq"),
    )
    n, sq, ssq = F.col("n"), F.col("sum_micro"), F.col("ssq")
    return g.select(
        "dim",
        "n",
        "min_micro",
        "max_micro",
        "sum_micro",
        (F.round((sq.cast("double") / n) / 1000000.0, 6) + 0.0).alias("mean"),
        (
            F.round(
                (ssq - sq.cast("double") * sq / n) / (n - 1) / 1e12, 6
            )
            + 0.0
        ).alias("variance"),
    )


# ---------------------------------------------------------------------------
# morans_i — spatial autocorrelation of user activity on the geo grid
# ---------------------------------------------------------------------------


@query(
    "morans_i",
    """
    WITH counts AS (
        SELECT user_id, COUNT(*)::BIGINT AS x FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id AS id, x,
               ('0x' || substr(md5('gx:' || user_id), 1, 8))::BIGINT % 10000 AS px,
               ('0x' || substr(md5('gy:' || user_id), 1, 8))::BIGINT % 10000 AS py
        FROM counts
    ),
    tot AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS s FROM p),
    z AS (
        SELECT p.id, (t.n * p.x - t.s)::BIGINT AS d, p.px, p.py
        FROM p, tot t
    ),
    pairs AS (
        SELECT a.d AS da, b.d AS db
        FROM z a
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
        JOIN z b ON (a.px // 100) + dx.dx = (b.px // 100)
                AND (a.py // 100) + dy.dy = (b.py // 100)
                AND a.id < b.id
        WHERE (a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) <= 10000
    ),
    s AS (
        SELECT COUNT(*)::BIGINT AS np,
               SUM(da::HUGEINT * db::HUGEINT)::HUGEINT AS se
        FROM pairs
    ),
    v AS (
        SELECT SUM(d::HUGEINT * d::HUGEINT)::HUGEINT AS sd2,
               MAX((SELECT n FROM tot))::BIGINT AS n
        FROM z
    )
    SELECT v.n AS n_users, s.np AS n_pairs,
           CASE WHEN s.np > 0 AND v.sd2 > 0 THEN
               ROUND((v.n::DOUBLE * se::DOUBLE)
                     / (s.np::DOUBLE * v.sd2::DOUBLE), 6) + 0.0
           END AS morans_i,
           ROUND(-1.0 / (v.n - 1), 6) AS expected_i
    FROM s, v
    """,
)
def morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of per-user activity on the
    deterministic geo plane (the geo_neighbors grid: md5 coordinates,
    binary weights = pairs within Euclidean radius 100) — do active
    users cluster spatially: the readout that tells a pipeline whether
    geo-partitioned serving will see hot cells (the spatial
    companion to shuffle_skew_report's key-space view).

    Parity: activity deviations scale by n (d_i = n*x_i - S, exact
    BIGINT); I folds to n * sum_pairs(d_a*d_b) / (P * sum(d^2)) with
    both sums in 128-bit exact arithmetic (HUGEINT / DECIMAL(38,0) —
    d products clear int64 at sf1) and ONE division of identical
    doubles; E[I] = -1/(n-1) is a single exact division; `+ 0.0` for
    the zero-autocorrelation plane.

    Scale: the pair set comes from the radius-sized grid blocking
    equi-join (operators/joins.py::grid_proximity_join — bounded 9x
    fan-out, never a cross join); values join the pair list on id
    keys."""
    from fusionspark.operators.dedup import md5_hash32
    from fusionspark.operators.joins import grid_proximity_join

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").cast("long").alias("x"))
    uid = F.col("user_id").cast("string")
    p = counts.select(
        F.col("user_id").alias("id"),
        "x",
        (md5_hash32(F.concat(F.lit("gx:"), uid)) % 10000).alias("x_coord"),
        (md5_hash32(F.concat(F.lit("gy:"), uid)) % 10000).alias("y_coord"),
    )
    tot = p.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    z = p.crossJoin(F.broadcast(tot)).select(
        "id",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("d"),
        F.col("x_coord").alias("x"),
        F.col("y_coord").alias("y"),
    )
    pairs = grid_proximity_join(z.select("id", "x", "y"), 100)
    dz = z.select("id", "d")
    pa = dz.select(F.col("id").alias("id_a"), F.col("d").alias("da"))
    pb = dz.select(F.col("id").alias("id_b"), F.col("d").alias("db"))
    pe = pairs.join(pa, "id_a").join(pb, "id_b")
    s = pe.agg(
        F.count("*").cast("long").alias("np"),
        F.sum(
            (
                F.col("da").cast("decimal(19,0)")
                * F.col("db").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("se"),
    )
    v = z.agg(
        F.sum(
            (
                F.col("d").cast("decimal(19,0)")
                * F.col("d").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("sd2"),
        F.count("*").cast("long").alias("n"),
    )
    f = s.crossJoin(F.broadcast(v))
    n, np_ = F.col("n"), F.col("np")
    return f.select(
        n.alias("n_users"),
        np_.alias("n_pairs"),
        F.when(
            (np_ > 0) & (F.col("sd2") > 0),
            F.round(
                (n.cast("double") * F.col("se").cast("double"))
                / (np_.cast("double") * F.col("sd2").cast("double")),
                6,
            )
            + 0.0,
        ).alias("morans_i"),
        F.round(F.lit(-1.0) / (n - 1), 6).alias("expected_i"),
    )


# ---------------------------------------------------------------------------
# pass_at_k — unbiased pass@5 estimator per user
# ---------------------------------------------------------------------------


def _pass5_sql(n: str, c: str) -> str:
    fac = " * ".join(
        f"(CASE WHEN {n} - {c} - {i} <= 0 THEN 0.0"
        f" ELSE ({n} - {c} - {i})::DOUBLE / ({n} - {i}) END)"
        for i in range(5)
    )
    return f"1.0 - {fac}"


@query(
    "pass_at_k",
    f"""
    WITH u AS (
        SELECT user_id, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS c
        FROM events GROUP BY user_id
    )
    SELECT user_id, n AS n_attempts, c AS n_correct,
           ROUND({_pass5_sql("n", "c")}, 6) AS pass_at_5
    FROM u WHERE n >= 5
    """,
)
def pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator (k=5; Chen et al. 2021, the HumanEval
    combinatorial form) per user, reading events as attempts and
    purchases as successes — the eval-suite aggregation a code/agent
    training pipeline runs per task over sampled generations:
    pass@k = 1 - C(n-c, k)/C(n, k), computed as the telescoped product
    prod_{{i<k}} (n-c-i)/(n-i) so no binomial coefficient ever
    overflows.

    Parity: n and c are exact counts; the 5 product factors are
    guarded exact-integer divisions multiplied in FIXED literal order
    (identical trees both engines — a factor hitting zero short-
    circuits the product to pass@k = 1 exactly in both).

    Scale: ONE groupBy(user) with map-side combine; per-row closed
    form after."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    n, c = F.col("n"), F.col("c")
    prod = None
    for i in range(5):
        f_i = F.when(n - c - i <= 0, F.lit(0.0)).otherwise(
            (n - c - i).cast("double") / (n - i)
        )
        prod = f_i if prod is None else prod * f_i
    return u.filter(n >= 5).select(
        "user_id",
        n.alias("n_attempts"),
        c.alias("n_correct"),
        F.round(F.lit(1.0) - prod, 6).alias("pass_at_5"),
    )


# ---------------------------------------------------------------------------
# ece_calibration — calibration of the even-user dow rate model
# ---------------------------------------------------------------------------


def _ece_oracle() -> str:
    piv = ",\n               ".join(
        f"SUM(CASE WHEN w = {i} AND grp = 0 THEN n ELSE 0 END)::BIGINT AS ne{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 0 THEN a ELSE 0 END)::BIGINT AS ae{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 1 THEN n ELSE 0 END)::BIGINT AS no{i},\n"
        f"               SUM(CASE WHEN w = {i} AND grp = 1 THEN a ELSE 0 END)::BIGINT AS ao{i}"
        for i in _DOWS
    )
    nn = " + ".join(f"no{i}" for i in _DOWS)
    gap = lambda i: (  # noqa: E731
        f"abs(ao{i}::DOUBLE / no{i} - ae{i}::DOUBLE / ne{i})"
    )
    ece = " + ".join(
        f"CASE WHEN ne{i} > 0 AND no{i} > 0 THEN"
        f" (no{i}::DOUBLE / ({nn})) * {gap(i)} ELSE 0.0 END"
        for i in _DOWS
    )
    mce = ", ".join(
        f"CASE WHEN ne{i} > 0 AND no{i} > 0 THEN {gap(i)} ELSE 0.0 END"
        for i in _DOWS
    )
    used = " + ".join(
        f"CASE WHEN ne{i} > 0 AND no{i} > 0 THEN 1 ELSE 0 END" for i in _DOWS
    )
    return f"""
    WITH s AS (
        SELECT date_part('dow', ts)::BIGINT AS w,
               user_id % 2 AS grp,
               COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS a
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT {piv}
        FROM s
    )
    SELECT ({nn})::BIGINT AS n_eval, ({used})::BIGINT AS n_bins_used,
           ROUND({ece}, 6) AS ece,
           ROUND(GREATEST({mce}), 6) AS mce
    FROM wide
    """


@query("ece_calibration", _ece_oracle())
def ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error of the frequency model
    'per-day-of-week purchase rate fit on EVEN users', evaluated on ODD
    users — the train/test calibration audit an LLM-data pipeline runs
    on every learned filter before trusting its scores as probabilities
    (the scalar summary nb_calibration's per-decile table feeds):
    ECE = sum_b (n_b/N) |acc_b - conf_b|, MCE = max_b |acc_b - conf_b|
    over the 7 dow bins.

    Parity: all bin cells are exact conditional BIGINTs in ONE pivoted
    aggregate; conf and acc are single exact-integer divisions; the 7
    weighted gaps sum in FIXED literal dow order and MCE is a GREATEST
    over the same guarded terms (empty bins contribute exact 0.0 and
    drop from n_bins_used in both engines).

    Scale: one groupBy(dow, parity) collapses the corpus to 14 cells;
    the statistic is a 1-row closed form."""
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("w"),
        (F.col("user_id") % 2).alias("grp"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    aggs = []
    for i in _DOWS:
        at_i = F.col("w") == i
        for nm, grp, col in (
            (f"ne{i}", 0, "n"),
            (f"ae{i}", 0, "a"),
            (f"no{i}", 1, "n"),
            (f"ao{i}", 1, "a"),
        ):
            aggs.append(
                F.sum(F.when(at_i & (F.col("grp") == grp), F.col(col)).otherwise(0))
                .cast("long")
                .alias(nm)
            )
    wide = s.agg(*aggs)
    nn = sum((F.col(f"no{i}") for i in _DOWS[1:]), F.col("no0"))
    ece = None
    mces = []
    used = None
    for i in _DOWS:
        ne, ae = F.col(f"ne{i}"), F.col(f"ae{i}")
        no, ao = F.col(f"no{i}"), F.col(f"ao{i}")
        ok = (ne > 0) & (no > 0)
        gap = F.abs(ao.cast("double") / no - ae.cast("double") / ne)
        t = F.when(ok, (no.cast("double") / nn) * gap).otherwise(F.lit(0.0))
        ece = t if ece is None else ece + t
        mces.append(F.when(ok, gap).otherwise(F.lit(0.0)))
        one = F.when(ok, 1).otherwise(0)
        used = one if used is None else used + one
    return wide.select(
        nn.cast("long").alias("n_eval"),
        used.cast("long").alias("n_bins_used"),
        F.round(ece, 6).alias("ece"),
        F.round(F.greatest(*mces), 6).alias("mce"),
    )
