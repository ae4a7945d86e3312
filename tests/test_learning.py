"""Learning-operator semantics: the A13 incremental weight fold against a
hand-computed trace (RecursiveLearningEngine.js:747-770), and adaptive
weights normalization."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fusionspark.operators import learning


def _fb_rows(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, "agent-0", "alpha beta gamma delta", strategy, q,
         base + datetime.timedelta(minutes=i))
        for i, (strategy, q) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "fb_id: long, agent_id: string, query: string, strategy: string, "
              "quality: double, ts: timestamp"
    )


def test_weight_adjustment_trace(spark):
    # hand-computed: start (0.4, 0.4, 0.2)
    # fb1: vector q=0.8 (>0.7): vector = min(0.8, 0.4+0.08)=0.48 → norm
    #      totals 1.08 → (0.444444, 0.370370, 0.185185)
    # fb2: keyword q=0.1 (<0.3): keyword = max(0.05, 0.185185-0.1)=0.085185
    #      totals 0.9 → (0.493827, 0.411523, 0.094650)
    fb = _fb_rows(spark, [("vector", 0.8), ("keyword", 0.1)])
    out = learning.adjust_strategy_weights(fb).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["w_vector"] - 0.4938271604938271) < 1e-9
    assert abs(r["w_tree"] - 0.4115226337448559) < 1e-9
    assert abs(r["w_keyword"] - 0.0946502057613169) < 1e-9
    assert r["n_feedback"] == 2


def test_weight_adjustment_hybrid_boosts_all(spark):
    fb = _fb_rows(spark, [("hybrid", 1.0)])
    r = learning.adjust_strategy_weights(fb).collect()[0]
    # vector=0.5, tree=0.5, keyword=0.25 → normalized
    assert abs(r["w_vector"] - 0.5 / 1.25) < 1e-9
    assert abs(r["w_tree"] - 0.5 / 1.25) < 1e-9
    assert abs(r["w_keyword"] - 0.25 / 1.25) < 1e-9


def test_mid_quality_leaves_weights_untouched(spark):
    fb = _fb_rows(spark, [("vector", 0.5)])
    r = learning.adjust_strategy_weights(fb).collect()[0]
    assert abs(r["w_vector"] - 0.4) < 1e-9
    assert abs(r["w_tree"] - 0.4) < 1e-9
    assert abs(r["w_keyword"] - 0.2) < 1e-9


def test_adaptive_weights_sum_to_one(spark, sf_dir):
    from fusionspark import fixtures as FX

    df = learning.adaptive_weights(FX.feedback_df(spark, sf_dir))
    sums = df.groupBy("pattern").agg(F.sum("weight").alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


def test_unbounded_fold_replays_full_history(spark):
    """ring=None is the parity escape hatch for the reference's UNBOUNDED
    fold (RecursiveLearningEngine.js:747-770 iterates every stored
    feedback): on a 150-row history it must equal a pure-Python replay of
    all 150 rows and differ from the FEEDBACK_RING(100)-bounded fold,
    which by construction replays only the last 100 (VERDICT r7 #7 /
    COVERAGE.md A13)."""
    import itertools

    seq = [
        ("vector", 0.8), ("keyword", 0.1), ("tree", 0.9), ("hybrid", 0.75),
        ("vector", 0.2), ("keyword", 0.95),
    ]
    rows = list(itertools.islice(itertools.cycle(seq), 150))
    fb = _fb_rows(spark, rows)

    def replay(history):
        w = {"vector": 0.4, "tree": 0.4, "keyword": 0.2}
        alpha = 0.1
        for strategy, q in history:
            if q > 0.7:
                if strategy in ("vector", "hybrid"):
                    w["vector"] = min(0.8, w["vector"] + alpha * q)
                if strategy in ("tree", "hybrid"):
                    w["tree"] = min(0.8, w["tree"] + alpha * q)
                if strategy in ("keyword", "hybrid"):
                    w["keyword"] = min(0.5, w["keyword"] + alpha * q * 0.5)
            elif q < 0.3:
                if strategy == "vector":
                    w["vector"] = max(0.1, w["vector"] - alpha)
                elif strategy == "tree":
                    w["tree"] = max(0.1, w["tree"] - alpha)
                elif strategy == "keyword":
                    w["keyword"] = max(0.05, w["keyword"] - alpha)
            total = w["vector"] + w["tree"] + w["keyword"]
            if total > 0:
                w = {k: v / total for k, v in w.items()}
        return w

    unbounded = learning.adjust_strategy_weights(fb).collect()[0]
    expect_all = replay(rows)
    for key, col in (("vector", "w_vector"), ("tree", "w_tree"),
                     ("keyword", "w_keyword")):
        assert abs(unbounded[col] - expect_all[key]) < 1e-9
    assert unbounded["n_feedback"] == 150

    ringed = learning.adjust_strategy_weights(
        fb, ring=learning.FEEDBACK_RING
    ).collect()[0]
    expect_ring = replay(rows[-learning.FEEDBACK_RING:])
    for key, col in (("vector", "w_vector"), ("tree", "w_tree"),
                     ("keyword", "w_keyword")):
        assert abs(ringed[col] - expect_ring[key]) < 1e-9
    assert ringed["n_feedback"] == learning.FEEDBACK_RING
    assert any(
        abs(unbounded[c] - ringed[c]) > 1e-12
        for c in ("w_vector", "w_tree", "w_keyword")
    )
