"""Vector distance / similarity expressions.

Semantics from the reference's scalar JS loops
(`/root/reference/src/core/HNSWIndex.js:443-479`):
  cosine   : vectors L2-normalized, distance = 1 - Σ a_i·b_i, score = 1 - dist
  euclidean: sqrt(Σ (a_i - b_i)^2)
  dot      : -Σ a_i·b_i  (negated so lower = closer)
  l2 norm  : v / sqrt(Σ v_i^2)

Re-expressed as native Spark SQL higher-order functions (zip_with /
aggregate / transform) so the whole expression stays inside whole-stage
codegen — no Python, no UDF, vectorized over the Parquet columnar scan.
All arithmetic is promoted to DOUBLE for engine-portable results (float32
elements are exactly representable in float64, and both Spark and DuckDB
then fold left-to-right in float64 → bit-identical sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (JVM codegen, no shuffle)."""
    a, b = _to_double(a), _to_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    v = _to_double(v)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(v: Column | str) -> Column:
    """v / ||v||; zero vectors pass through unchanged (HNSWIndex.js:477)."""
    v = _to_double(v)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a||·||b||) — the reference normalizes at insert time and
    then takes a plain dot product; dividing by both norms is the same value
    without requiring pre-normalized storage."""
    a, b = _to_double(a), _to_double(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _to_double(a), _to_double(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def dot_distance(a: Column | str, b: Column | str) -> Column:
    """Negated dot product — lower = better (HNSWIndex.js:461-466)."""
    return -dot_product(a, b)


METRICS = {
    "cosine": cosine_distance,
    "euclidean": euclidean_distance,
    "dot": dot_distance,
}


def distance(metric: str, a: Column | str, b: Column | str) -> Column:
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(METRICS)}")


def score_from_distance(metric: str, dist: Column) -> Column:
    """The reference reports score = 1 - distance for every metric
    (HNSWIndex.js:307)."""
    return F.lit(1.0) - dist
