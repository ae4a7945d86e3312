"""Unit + plan-shape tests for the round-6 session-4 analytics family:
sessionization, last-touch attribution, robust outliers, TF-IDF pair
join, co-occurrence lift, and k-core peeling."""

from __future__ import annotations

import contextlib
import io as _io
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ts(sec: int):
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


def _events(spark, rows):
    """rows: (event_id, user_id, sec, event_type, value)"""
    return spark.createDataFrame(
        [(i, u, _ts(s), t, float(v)) for i, u, s, t, v in rows],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )


def test_sessionize_gap_split(spark):
    from fusionspark.operators.temporal import sessionize

    ev = _events(
        spark,
        [
            (1, 7, 0, "view", 0),
            (2, 7, 10, "click", 0),
            (3, 7, 2000, "view", 0),   # 1990s gap > 1800 → new session
            (4, 7, 2100, "click", 0),
            (5, 8, 50, "view", 0),     # other user: own numbering
        ],
    )
    out = {
        (r.user_id, r.session_no): r
        for r in sessionize(ev, gap_sec=1800).collect()
    }
    assert set(out) == {(7, 1), (7, 2), (8, 1)}
    assert out[(7, 1)].n_events == 2 and out[(7, 1)].duration_sec == 10.0
    assert out[(7, 2)].n_events == 2 and out[(7, 2)].start_s == 2000.0
    assert out[(8, 1)].n_events == 1 and out[(8, 1)].duration_sec == 0.0


def test_last_touch_carries_past_conversions(spark):
    from fusionspark.operators.temporal import last_touch_attribution

    ev = _events(
        spark,
        [
            (1, 1, 0, "view", 0),
            (2, 1, 10, "purchase", 0),   # touch = view@0
            (3, 1, 20, "purchase", 0),   # still view@0 (carries past #2)
            (4, 1, 30, "click", 0),
            (5, 1, 40, "purchase", 0),   # touch = click@30
            (6, 2, 5, "purchase", 0),    # direct: no prior touch → NULLs
        ],
    )
    got = {
        r.conversion_id: r for r in last_touch_attribution(ev).collect()
    }
    assert got[2].touch_id == 1 and got[2].touch_type == "view"
    assert got[2].touch_age_sec == 10.0
    assert got[3].touch_id == 1 and got[3].touch_age_sec == 20.0
    assert got[5].touch_id == 4 and got[5].touch_type == "click"
    assert got[6].touch_id is None and got[6].touch_type is None


def test_robust_outliers_flags_spike_and_skips_flat_groups(spark):
    from fusionspark.operators.temporal import robust_outliers

    rows = [(i, 1, i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    rows += [(100 + i, 1, i, "flat", 5.0) for i in range(4)]
    out = robust_outliers(_events(spark, rows)).collect()
    by_id = {r.event_id: r for r in out}
    spike = by_id[9]
    assert spike.is_outlier and spike.robust_z > 100
    assert all(not by_id[i].is_outlier for i in range(9))
    # MAD = 0 → no robust scale: NULL score, never flagged, never a div error
    for i in range(100, 104):
        assert by_id[i].robust_z is None and by_id[i].is_outlier is False


def test_tfidf_pairs_identical_docs_cosine_one(spark):
    from fusionspark.operators.keyword import tfidf_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta"),
            (2, "alpha bravo charlie delta"),
            (3, "echo foxtrot golf hotel"),
            (4, "echo echo foxtrot golf hotel"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.cosine for r in
           tfidf_pairs(docs, threshold=0.1, min_df=2, max_df=10).collect()}
    assert got[(1, 2)] == 1.0
    assert (3, 4) in got and 0.8 < got[(3, 4)] < 1.0
    assert (1, 3) not in got and (2, 4) not in got


def test_tfidf_max_df_drops_boilerplate_terms(spark):
    from fusionspark.operators.keyword import tfidf_pairs

    # "common" is in every doc; with max_df=2 it cannot generate pairs
    docs = spark.createDataFrame(
        [(i, f"common unique{i} filler{i}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    assert tfidf_pairs(docs, threshold=0.01, min_df=2, max_df=2).count() == 0


def test_cooccurrence_lift_values(spark):
    # users 1,2 do {a,b}; user 3 does {a}; lift(a,b) = 3 * 2 / (3*2) = 1.0
    ev = _events(
        spark,
        [(1, 1, 0, "a", 0), (2, 1, 1, "b", 0),
         (3, 2, 0, "a", 0), (4, 2, 1, "b", 0),
         (5, 3, 0, "a", 0)],
    )
    # exercise the registered plan body on a local frame
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.withColumnRenamed("event_type", "type_a")
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .count()
    )
    got = {(r.type_a, r.type_b): r["count"] for r in pairs.collect()}
    assert got == {("a", "b"): 2}


def test_kcore_k5_plus_tail(spark):
    from fusionspark.operators.graph import kcore

    # K5 on 0..4 (degree 4 each) + pendant path 4-5-6: the tail peels,
    # the clique survives as the whole 4-core.
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.doc_id: r.core_degree for r in kcore(e, k=4, max_rounds=8).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_raises_loudly_on_deep_peel(spark):
    from fusionspark.operators.graph import kcore

    # a 12-node path peels from both ends, 2 nodes per round — with
    # max_rounds=2 the 2-core (empty) is NOT reached: loud error, never a
    # silently-wrong partial answer
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(e, k=2, max_rounds=2)
    # and with enough rounds it converges to the empty core
    assert kcore(e, k=2, max_rounds=10).count() == 0


def test_session4_plan_shapes(spark, sf_dir):
    """Plan contracts: sessionize/attribution run on ONE user_id exchange;
    robust_outliers broadcasts its stats (no sort-merge join against the
    events stream); tfidf_pairs never degenerates into a nested-loop or
    cartesian join."""
    from fusionspark.io import load_table
    from fusionspark.operators.keyword import tfidf_pairs
    from fusionspark.operators.temporal import (
        last_touch_attribution,
        robust_outliers,
        sessionize,
    )

    import re

    def _n_shuffles(p: str) -> int:
        # formatted-plan node headers, e.g. "(4) Exchange" (the tree section
        # prints "+- Exchange (4)", which this pattern deliberately skips)
        return len(re.findall(r"^\(\d+\) Exchange", p, re.M))

    ev = load_table(spark, sf_dir, "events")
    assert _n_shuffles(_plan(sessionize(ev))) == 1
    assert _n_shuffles(_plan(last_touch_attribution(ev))) == 1
    p = _plan(robust_outliers(ev))
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" in p
    d = load_table(spark, sf_dir, "documents")
    p = _plan(tfidf_pairs(d))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ngram_novelty_dup_doc_scores_zero(spark):
    from fusionspark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(docs, gram=3).collect()}
    assert got[1].novelty == 1.0 and got[1].n_grams == 2
    assert got[2].novelty == 0.0 and got[2].n_novel == 0
    assert got[3].novelty == 1.0


def test_winsorize_clamps_tails_only(spark):
    from fusionspark.operators.temporal import winsorize

    rows = [(i, 1, i, "a", float(v)) for i, v in enumerate(range(1, 101))]
    out = {r.event_id: r for r in
           winsorize(_events(spark, rows), lo=0.05, hi=0.95).collect()}
    # P5 of 1..100 (type-7) = 5.95, P95 = 95.05
    assert out[0].was_clipped and out[0].clamped == 5.95
    assert out[99].was_clipped and out[99].clamped == 95.05
    assert not out[49].was_clipped and out[49].clamped == 50.0
    assert sum(1 for r in out.values() if r.was_clipped) == 10


def test_incremental_rollup_merge_equals_direct(spark, sf_dir):
    """The maintenance invariant at the operator level: merged partials ==
    direct aggregate, row for row (the registered oracle re-checks this
    against DuckDB; here both sides are Spark so the test isolates the
    merge logic itself)."""
    from fusionspark.queries import REGISTRY, load_all
    from fusionspark.io import load_table

    load_all()
    fn, _ = REGISTRY["incremental_rollup"]
    merged = {r.user_id: r for r in fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("val_u"),
        F.unix_micros("ts").alias("ts_us"),
    )
    direct = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("val_u").alias("sum_value_micros"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for u, d in direct.items():
        m = merged[u]
        assert (m.n_events, m.sum_value_micros, m.min_ts_us, m.max_ts_us) == (
            d.n_events, d.sum_value_micros, d.min_ts_us, d.max_ts_us
        )


def test_containment_scores_subdocument_one(spark):
    """A doc fully contained in a longer doc: overlap coefficient 1.0
    while its Jaccard stays below 1 — the pair Jaccard dedup underrates."""
    from fusionspark.operators.dedup import containment_neardup, ngram_minhash_neardup

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " kilo lima mike november oscar")],
        "doc_id long, text string",
    )
    cont = {(r.id_a, r.id_b): r.containment
            for r in containment_neardup(docs).collect()}
    assert cont[(1, 2)] == 1.0
    jac = {(r.id_a, r.id_b): r.sim
           for r in ngram_minhash_neardup(docs, threshold=0.0).collect()}
    assert jac[(1, 2)] < 1.0


def test_grid_proximity_join_boundaries(spark):
    from fusionspark.operators.joins import grid_proximity_join

    pts = spark.createDataFrame(
        [
            (1, 95, 50),    # cell (0,0)
            (2, 105, 50),   # cell (1,0): 10 apart, crosses the cell edge
            (3, 95, 150),   # exactly r=100 from point 1 → included (d² = r²)
            (4, 300, 300),  # isolated
        ],
        "id long, x long, y long",
    )
    got = {(r.id_a, r.id_b): r.dist_sq
           for r in grid_proximity_join(pts, radius=100).collect()}
    assert got[(1, 2)] == 100            # found across the cell edge
    assert got[(1, 3)] == 10000          # exactly r → boundary-inclusive
    # (2,3): 10² + 100² = 10100 > r² → excluded even though cells adjoin
    assert set(got) == {(1, 2), (1, 3)}


def test_lpa_two_triangles_with_bridge(spark):
    """Two triangles joined by one bridge edge: LPA must keep them as two
    communities labeled by each triangle's min node id; the isolated node
    keeps its own label."""
    from fusionspark.operators.graph import label_propagation

    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0),      # triangle A
         (3, 4), (4, 5), (5, 3),      # triangle B
         (2, 3)],                     # bridge
        "src long, dst long",
    )
    out = {
        r["doc_id"]: r["community"]
        for r in label_propagation(nodes, edges, rounds=4).collect()
    }
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == out[4] == out[5]
    assert out[3] != 0
    assert out[6] == 6  # isolated keeps its own label


def _hw_reference(ys):
    """Textbook additive Holt-Winters (alpha 1/4, beta 1/8, gamma 1/4,
    weekly ring, classical first-week init) — the pure-Python replay of
    hw_forecast's fold."""
    l = sum(ys[:7]) / 7.0
    t = 0.0
    s = [y - l for y in ys[:7]]
    for y in ys[7:]:
        s0 = s.pop(0)
        lnew = 0.25 * (y - s0) + 0.75 * (l + t)
        t = 0.125 * (lnew - l) + 0.875 * t
        s.append(0.25 * (y - lnew) + 0.75 * s0)
        l = lnew
    return l, t, s


def test_hw_forecast_matches_reference_replay(spark):
    """hw_forecast's 9-element array fold equals the scalar textbook
    recursion on the real daily series, to rounding."""
    import pytest as _pytest

    from fusionspark.queries.analytics_queries import hw_forecast

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet")
    daily = (
        e.groupBy(F.to_date("ts").alias("day")).count().orderBy("day").collect()
    )
    ys = [float(r["count"]) for r in daily]
    assert len(ys) >= 8
    l, t, s = _hw_reference(ys)
    got = {r.h: r.forecast for r in hw_forecast(spark, sf).collect()}
    for h in range(1, 8):
        want = l + h * t + s[h - 1]
        assert got[h] == _pytest.approx(want, abs=1e-6)


def test_hw_invariant_on_perfectly_seasonal_series():
    """A zero-trend, exactly weekly-periodic series is a fixed point of
    the recursion: every horizon's forecast equals mu + seasonal."""
    pat = [10.0, -5.0, 3.0, 0.0, 7.0, -8.0, -7.0]
    mu = 100.0
    ys = [mu + pat[i % 7] for i in range(35)]
    l, t, s = _hw_reference(ys)
    assert abs(l - mu) < 1e-9 and abs(t) < 1e-9
    # the ring is aligned so the h-step forecast mu + s[h-1] reproduces
    # the pattern value due at step len(ys)+h-1
    for h in range(1, 8):
        assert abs((l + h * t + s[h - 1]) - (mu + pat[(len(ys) + h - 1) % 7])) < 1e-9


def test_token_fertility_laws(spark):
    """fertility >= 1 (the BPE-ish regex never merges across whitespace),
    bytes/token >= chars/token (UTF-8), and the sums equal token_counts'."""
    from fusionspark.queries.text_queries import token_fertility

    sf = "/root/testdata/sf0.001"
    rows = token_fertility(spark, sf).collect()
    assert rows
    total_ws = total_bpe = 0
    for r in rows:
        assert r.fertility >= 1.0
        assert r.bytes_per_token >= r.chars_per_token
        total_ws += r.ws_tokens
        total_bpe += r.bpe_tokens
    from fusionspark.queries.pipeline_queries import token_counts_q

    tc = token_counts_q(spark, sf).agg(
        F.sum("ws_tokens").alias("ws"), F.sum("bpe_tokens").alias("bpe")
    ).collect()[0]
    assert (total_ws, total_bpe) == (tc.ws, tc.bpe)


def test_dbscan_planted_blobs(spark):
    """Two tight well-separated blobs + far-flung noise: DBSCAN must
    recover exactly two clusters (labels = each blob's min id), blob
    members are cores (tight blob: everyone has >= 3 eps-neighbors),
    and the isolated points come back as noise with NULL cluster."""
    from fusionspark.operators.density import dbscan

    rows = []
    # blob A around (100, 100), ids 0..5; blob B around (5000, 5000),
    # ids 10..15; noise ids 100..102 far from everything
    for i in range(6):
        rows.append((i, 100 + i * 3, 100 + (i % 2) * 4))
        rows.append((10 + i, 5000 + i * 3, 5000 + (i % 3) * 3))
    rows += [(100, 9000, 200), (101, 200, 9000), (102, 9500, 9500)]
    pts = spark.createDataFrame(rows, "id long, x long, y long")
    out = {r.id: (r.role, r.cluster) for r in dbscan(pts, d2_max=900, min_pts=3).collect()}
    assert len(out) == len(rows)
    for i in range(6):
        assert out[i] == ("core", 0)
        assert out[10 + i] == ("core", 10)
    for nid in (100, 101, 102):
        assert out[nid] == ("noise", None)
