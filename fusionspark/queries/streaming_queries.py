"""Streaming operator family (SURVEY §2.12), checked via their batch
analogues (the DataFrame plans are identical stream-static transforms;
tests/test_streaming.py runs the same operators through readStream +
availableNow and asserts parity with these batch results)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators.textstats import round6_stable
from fusionspark.queries import query
from fusionspark.streaming import windows as W


@query(
    "stream_tumbling",
    """
    SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS window_start_s,
           event_type, COUNT(*)::BIGINT AS n, ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 1h event-time window per event_type."""
    df = W.tumbling_counts(load_table(spark, sf_dir, "events"))
    return df.select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "event_type",
        "n",
        F.round("sum_value", 6).alias("sum_value"),
    )


@query(
    "stream_session",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, floor(epoch(MIN(ts)))::BIGINT AS session_start_s,
           COUNT(*)::BIGINT AS n, ROUND(SUM(value), 6) AS sum_value
    FROM islands GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: 30-minute-gap session windows per user (gaps-and-islands is the
    batch-SQL equivalent of session_window)."""
    df = W.session_counts(load_table(spark, sf_dir, "events"))
    return df.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start_s"),
        "n",
        F.round("sum_value", 6).alias("sum_value"),
    )


@query(
    "stream_dedup",
    """
    SELECT user_id, event_type, event_id AS first_event_id FROM (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5: stateful dedup on (user_id, event_type) — first arrival wins."""
    df = W.dedup_events(load_table(spark, sf_dir, "events"))
    return df.select("user_id", "event_type", F.col("event_id").alias("first_event_id"))


@query(
    "events_json_props",
    """
    SELECT event_type, ROUND(AVG(json_extract(props, '$.k')::INT), 6) AS avg_k,
           COUNT(*)::BIGINT AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: JSON metadata access (get_json_object) + aggregate."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.avg(F.get_json_object("props", "$.k").cast("int")), 6).alias("avg_k"),
        F.count("*").alias("n"),
    )


@query(
    "asof_click_view",
    """
    WITH views AS (
        SELECT user_id, ts, event_id AS v_id
        FROM events WHERE event_type = 'view'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, v.v_id AS view_id,
           ROUND(epoch(c.ts) - epoch(v.ts), 6) AS lag_sec
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click gets the most recent prior-or-equal view by
    the same user (operators/temporal.py::asof_join — union + ordered
    window, one shuffle on user_id; the oracle is DuckDB's native ASOF
    LEFT JOIN).  The view side is deduped per (user, ts) so ties are not
    engine-defined."""
    from pyspark.sql import Window as Wnd

    from fusionspark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn(
            "_rn",
            F.row_number().over(
                Wnd.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("v_id"))
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    j = asof_join(clicks, views, on=["user_id"], ts_col="ts", right_cols=["v_id"])
    lag = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))) / F.lit(1e6)
    return j.select(
        "event_id",
        "user_id",
        F.col("r_v_id").alias("view_id"),
        F.round(lag, 6).alias("lag_sec"),
    )


@query(
    "events_time_rollup",
    """
    SELECT floor(epoch(date_trunc('day', ts)))::BIGINT AS day_s,
           hour(ts)::BIGINT AS hour,
           COUNT(*)::BIGINT AS n, ROUND(SUM(value), 6) AS sum_value
    FROM events
    GROUP BY ROLLUP(date_trunc('day', ts), hour(ts))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time aggregate: per-hour rows, per-day
    subtotals, and the grand total in one grouping-sets pass
    (operators/temporal.py::time_bucket_rollup)."""
    from fusionspark.operators.temporal import time_bucket_rollup

    e = load_table(spark, sf_dir, "events")
    df = time_bucket_rollup(e)
    return df.select(
        F.unix_timestamp("day").alias("day_s"),
        F.col("hour").cast("long").alias("hour"),
        "n",
        "sum_value",
    )


@query(
    "range_error_context",
    """
    SELECT e.event_id AS error_id, e.user_id, p.event_id AS prior_id,
           ROUND(epoch(e.ts) - epoch(p.ts), 6) AS gap_sec
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id, user_id, ts FROM events) p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts - INTERVAL 60 SECOND
     AND p.ts <= e.ts
     AND p.event_id <> e.event_id
    """,
)
def range_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: every event within the 60s window preceding each error
    by the same user (operators/temporal.py::range_join — banded equi-join,
    no nested loop; the oracle is DuckDB's inequality join)."""
    from fusionspark.operators.temporal import range_join

    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    allev = e.select("event_id", "user_id", "ts")
    j = range_join(errors, allev, on=["user_id"], ts_col="ts", lower_s=-60.0, upper_s=0.0)
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))) / F.lit(1e6)
    return (
        j.filter(F.col("r_event_id") != F.col("event_id"))
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("r_event_id").alias("prior_id"),
            F.round(gap, 6).alias("gap_sec"),
        )
    )


@query(
    "events_rolling_avg",
    """
    WITH e AS (
        SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS ts_s, value
        FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_in_window,
           ROUND(AVG(value) OVER w, 6) AS rolling_avg
    FROM e
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts_s
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def events_rolling_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling aggregate: per user, the 1-hour trailing average
    (RANGE frame on epoch seconds — value-defined, so tied timestamps are
    in/out identically on both engines; a ROWS frame would be
    order-ambiguous under ties).  One shuffle on user_id; the frame scan
    is per-partition.  The time-series sibling of the tumbling windows."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    w = (
        Window.partitionBy("user_id").orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("n_in_window"),
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
    )


@query(
    "events_type_pivot",
    """
    SELECT user_id,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
           SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
           SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
    FROM events GROUP BY user_id
    """,
)
def events_type_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to a per-user event-type count matrix via groupBy().pivot()
    with an EXPLICIT value list (open-ended pivot needs a distinct-scan
    planning pass — never do that at 100 TB; pin the columns).  Compiles
    to one hash aggregate with conditional counts, exactly the oracle's
    CASE form."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").cast("long").alias("click"),
            F.col("view").cast("long").alias("view"),
            F.col("purchase").cast("long").alias("purchase"),
            F.col("error").cast("long").alias("error"),
        )
    )


@query(
    "user_retention",
    """
    WITH active AS (
        SELECT DISTINCT user_id,
               floor(epoch(date_trunc('day', ts)))::BIGINT AS day_s
        FROM events
    ),
    pairs AS (
        SELECT a.day_s,
               COUNT(*)::BIGINT AS active_users,
               SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS retained_next_day
        FROM active a
        LEFT JOIN active b
          ON b.user_id = a.user_id AND b.day_s = a.day_s + 86400
        GROUP BY a.day_s
    )
    SELECT day_s, active_users, retained_next_day,
           FLOOR((retained_next_day::DOUBLE / active_users)
                 * 1000000.0 + 0.5) / 1000000.0 AS retention
    FROM pairs
    """,
)
def user_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention — the classic product-analytics self-join:
    distinct (user, day) activity joined to itself shifted one day.
    The self-join is on (user_id, day) — co-partitioned by the first
    aggregate, so no extra shuffle beyond the distinct."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s"),
    ).distinct()
    b = active.select(
        F.col("user_id").alias("b_user"), F.col("day_s").alias("b_day")
    )
    joined = active.join(
        b,
        (F.col("b_user") == F.col("user_id"))
        & (F.col("b_day") == F.col("day_s") + 86400),
        "left",
    )
    return (
        joined.groupBy("day_s")
        .agg(
            F.count("*").alias("active_users"),
            F.sum(F.col("b_user").isNotNull().cast("int")).cast("long")
            .alias("retained_next_day"),
        )
        .select(
            "day_s", "active_users", "retained_next_day",
            # r14: retained/active is an integer ratio (audit-flagged
            # 0.8984375) — round6_stable, not ROUND
            round6_stable(
                F.col("retained_next_day").cast("double")
                / F.col("active_users")
            ).alias("retention"),
        )
    )


@query(
    "event_funnel",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*)::BIGINT AS n_users,
           SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS viewed,
           SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END)::BIGINT AS clicked_after_view,
           SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
                    THEN 1 ELSE 0 END)::BIGINT AS purchased_after_click
    FROM firsts
    """,
)
def event_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase on FIRST
    occurrences): one conditional-MIN aggregate per user, then one tiny
    rollup — no self-joins, no window over the event stream.  NULL
    comparisons drop non-converting users from each stage exactly like
    the three-valued SQL the oracle runs."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("int")).cast("long").alias("viewed"),
        F.sum(
            (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")))
            .cast("int")
        ).cast("long").alias("clicked_after_view"),
        F.sum(
            (
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click"))
            ).cast("int")
        ).cast("long").alias("purchased_after_click"),
    )


@query(
    "gap_fill",
    """
    WITH obs AS (
        SELECT user_id,
               (epoch_us(ts) // 3600000000) AS bucket,
               arg_max(value, event_id) AS v
        FROM events WHERE user_id < 10
        GROUP BY user_id, (epoch_us(ts) // 3600000000)
    ),
    spans AS (
        SELECT user_id, MIN(bucket) AS mnb, MAX(bucket) AS mxb
        FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(mnb, mxb)) AS bucket
        FROM spans
    )
    SELECT g.user_id, g.bucket,
           ROUND(last_value(o.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS value_filled,
           (o.v IS NOT NULL) AS observed
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket = g.bucket
    """,
)
def gap_fill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled + forward-filled (LOCF) series per user
    (operators/temporal.py::gap_fill): the dense grid is exploded
    executor-side from per-key spans, observations left-join on, and the
    fill is one ordered window — the time-series densification shape."""
    from fusionspark.operators.temporal import gap_fill

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    out = gap_fill(e, "user_id", "ts", "value", step_sec=3600)
    return out.select(
        "user_id", "bucket",
        F.round("value_filled", 6).alias("value_filled"), "observed",
    )


@query(
    "events_interarrival",
    """
    WITH g AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts ASC, event_id ASC))
                   / 1e6 AS gap_sec
        FROM events
    )
    SELECT event_type, COUNT(*)::BIGINT AS n_gaps,
           ROUND(SUM(gap_sec) / COUNT(*), 6) AS avg_gap_sec,
           ROUND(MIN(gap_sec), 6) AS min_gap_sec,
           ROUND(MAX(gap_sec), 6) AS max_gap_sec
    FROM g WHERE gap_sec IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap stats per event type (lag-diff + one agg; the
    window and the aggregation share one event_type partitioning)."""
    from fusionspark.operators.temporal import interarrival_stats

    return interarrival_stats(load_table(spark, sf_dir, "events"))


@query(
    "sessionize",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS prev_us
        FROM events
    ),
    n AS (
        SELECT user_id, ts_us,
               SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS session_no
        FROM e
    )
    SELECT user_id, session_no,
           COUNT(*)::BIGINT AS n_events,
           ROUND(MIN(ts_us) / 1e6, 6) AS start_s,
           ROUND(MAX(ts_us) / 1e6, 6) AS end_s,
           ROUND((MAX(ts_us) - MIN(ts_us)) / 1e6, 6) AS duration_sec
    FROM n GROUP BY user_id, session_no
    """,
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization at a 30-minute inactivity gap
    (operators/temporal.py::sessionize): lag-diff marks session starts, a
    running sum numbers them, one agg per (user, session) — all on a
    single user_id shuffle.  The batch twin of ST3's session_window."""
    from fusionspark.operators.temporal import sessionize

    out = sessionize(load_table(spark, sf_dir, "events"), gap_sec=1800)
    return out.select(
        "user_id", "session_no", "n_events",
        F.round("start_s", 6).alias("start_s"),
        F.round("end_s", 6).alias("end_s"),
        F.round("duration_sec", 6).alias("duration_sec"),
    )


@query(
    "attribution_last_touch",
    """
    WITH o AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
                          IGNORE NULLS) OVER w AS touch_id,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS) OVER w AS touch_type,
               last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
                          IGNORE NULLS) OVER w AS touch_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS conversion_id, touch_id, touch_type,
           ROUND((ts_us - touch_us) / 1e6, 6) AS touch_age_sec
    FROM o WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution
    (operators/temporal.py::last_touch_attribution): for every purchase,
    the latest strictly-earlier non-purchase event — one ignore-nulls
    window carry on one user_id shuffle, no as-of self-join.  Direct
    (touchless) conversions keep NULL touch columns."""
    from fusionspark.operators.temporal import last_touch_attribution

    return last_touch_attribution(load_table(spark, sf_dir, "events"))


@query(
    "ts_anomalies",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN s.mad > 0
                THEN ROUND((0.6745::DOUBLE * (e.value - m.med)) / s.mad, 6)
           END AS robust_z,
           CASE WHEN s.mad > 0
                THEN abs((0.6745::DOUBLE * (e.value - m.med)) / s.mad)
                     > 3.5::DOUBLE
                ELSE FALSE END AS is_outlier
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad s USING (event_type)
    """,
)
def ts_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly scores (operators/temporal.py::
    robust_outliers): Iglewicz-Hoaglin modified z from exact median +
    MAD.  Two percentile aggs over the tiny type key, stats broadcast
    back — the events table shuffles zero times."""
    from fusionspark.operators.temporal import robust_outliers

    return robust_outliers(load_table(spark, sf_dir, "events"))


@query(
    "cooccurrence_types",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tc AS (SELECT event_type, COUNT(*)::BIGINT AS n_t FROM ut GROUP BY event_type),
    nu AS (SELECT COUNT(*)::BIGINT AS n_users
           FROM (SELECT DISTINCT user_id FROM events)),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*)::BIGINT AS n_ab
        FROM ut a JOIN ut b
          ON b.user_id = a.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           ROUND((SELECT n_users FROM nu)::DOUBLE * p.n_ab
                 / (ta.n_t * tb.n_t), 6) AS lift
    FROM pairs p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b
    """,
)
def cooccurrence_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift over (user, event_type)
    baskets: distinct pairs via a self-join CO-PARTITIONED on user_id by
    the preceding distinct (no extra shuffle), per-user pair fan-out
    bounded by the type vocabulary (4 here; at 100 TB the same bound is
    whatever the item-vocab cap is — never the event count).  Type totals
    and the user count broadcast onto the pair counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    ut = ev.distinct()
    tc = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n_t"))
    nu = ut.select("user_id").distinct().agg(
        F.count("*").cast("long").alias("n_users")
    )
    b = ut.select(
        F.col("user_id"), F.col("event_type").alias("type_b")
    )
    pairs = (
        ut.withColumnRenamed("event_type", "type_a")
        .join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_t_a"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_t_b"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .join(F.broadcast(nu))
        .select(
            "type_a", "type_b", "n_ab",
            F.round(
                F.col("n_users").cast("double") * F.col("n_ab")
                / (F.col("n_t_a") * F.col("n_t_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "winsorize_values",
    """
    WITH stats AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p_lo,
               quantile_cont(value, 0.99) AS p_hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND(least(greatest(e.value, s.p_lo), s.p_hi), 6) AS clamped,
           (e.value < s.p_lo OR e.value > s.p_hi) AS was_clipped
    FROM events e JOIN stats s USING (event_type)
    """,
)
def winsorize_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type [P1, P99] winsorization (operators/temporal.py::
    winsorize): exact percentile band from one tiny group agg, broadcast
    clamp — the events table shuffles zero times."""
    from fusionspark.operators.temporal import winsorize

    return winsorize(load_table(spark, sf_dir, "events"))


@query(
    "stream_interval_join",
    """
    SELECT l.user_id,
           l.event_id AS error_id, r.event_id AS click_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS lag_us
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'error' AND r.event_type = 'click'
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
    """,
)
def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7: stream-stream interval join (streaming/joins.py) — every click
    by the same user within 6h after an error, the error-context /
    attribution pairing shape.  Batch and streaming plans are identical;
    on streams both sides carry watermarks and the interval bound is what
    lets Spark evict join state (tests/test_streaming.py runs this same
    transform through readStream and asserts parity).  Scale: equi-join
    on the key (hash-partitioned state both sides), interval predicate
    post-shuffle; no unbounded buffering."""
    from fusionspark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    pairs = interval_join(
        ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts"),
        ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts"),
        within="6 hours",
    )
    return pairs.select(
        "user_id",
        F.col("l_event_id").alias("error_id"),
        F.col("r_event_id").alias("click_id"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )


@query(
    "stream_enrich",
    """
    SELECT floor(epoch(date_trunc('hour', e.ts)))::BIGINT AS window_start_s,
           COALESCE(c.c_mktsegment, 'unknown') AS segment,
           COUNT(*)::BIGINT AS n, ROUND(SUM(e.value), 6) AS sum_value
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment + tumbling window
    (streaming/windows.py::enriched_tumbling): events join the broadcast
    customer dimension, then aggregate per (hour, market segment) —
    state keyed by the low-cardinality segment, never the user."""
    df = W.enriched_tumbling(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    return df.select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "segment",
        "n",
        F.round("sum_value", 6).alias("sum_value"),
    )
