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
