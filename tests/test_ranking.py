"""ntile_exact must reproduce F.ntile bit-for-bit for a total
(value, tiebreak) order — the window-whitelist burn-down primitive
(operators/ranking.py) used by nb_calibration and curriculum_shards."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from fusionspark.operators.ranking import ntile_exact


def test_ntile_exact_matches_builtin(spark):
    """Across edge shapes: N not divisible by n, N < n, all-tied values,
    unique values, heavy ties — identical assignment to F.ntile over
    the same (value, tiebreak) total order."""
    random.seed(7)
    cases = [
        (97, 10, 5),    # uneven tiles, tied groups
        (100, 10, 1),   # exact division, all values tied
        (7, 10, 3),     # N < n (small=0 branch must never evaluate)
        (200, 8, 50),   # many distinct values
        (64, 3, 64),    # unique values
        (23, 4, 23),    # unique values, uneven
    ]
    for rows, n, dup in cases:
        data = [(i, random.randrange(dup)) for i in range(rows)]
        df = spark.createDataFrame(data, "id long, v long")
        want = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(n).over(Window.orderBy("v", "id"))
            ).collect()
        }
        got = {
            r["id"]: r["t"]
            for r in ntile_exact(df, n, "v", "id", "t").collect()
        }
        assert got == want, (rows, n, dup)


def test_ntile_exact_plan_has_no_unpartitioned_raw_window(spark):
    """The point of the rewrite: every Window in the optimized plan is
    either PARTITIONED (the within-value rank) or runs over the bounded
    value grid (below an Aggregate)."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("v")
    )
    out = ntile_exact(df, 10, "v", "id", "t")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Window ["):
            # partitioned windows print 3 top-level bracket groups;
            # the only 2-group (unpartitioned, ordered) window allowed
            # is the grid cumulative, which sits above an Aggregate —
            # assert it by checking the window's sort key is the grid
            # value column, not the raw rank order
            groups = 0
            lvl = 0
            for ch in s:
                if ch == "[":
                    if lvl == 0:
                        groups += 1
                    lvl += 1
                elif ch == "]":
                    lvl -= 1
            if groups == 2:
                assert "v#" in s  # the grid cumulative, keyed on value
