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


def dot_product(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ a_i·b_i.

    With `dim` known, unrolls into element_at multiply-adds — ordinary
    expressions that DO whole-stage-codegen (higher-order functions are
    CodegenFallback in Spark and run interpreted, ~100× slower in the
    128k-pair profile).  The fold is left-to-right either way, so both
    forms (and the DuckDB oracle) produce bit-identical doubles."""
    a_raw = F.col(a) if isinstance(a, str) else a
    b_raw = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        # cast per ELEMENT, not per array — casting the whole array inside
        # each element_at term re-materializes it dim× per row
        def t(i: int) -> Column:
            return F.element_at(a_raw, i).cast("double") * F.element_at(b_raw, i).cast("double")

        total: Column = t(1)
        for i in range(2, dim + 1):
            total = total + t(i)
        return total
    a, b = _to_double(a_raw), _to_double(b_raw)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str, dim: int | None = None) -> Column:
    v_raw = F.col(v) if isinstance(v, str) else v
    if dim is not None:
        def sq(i: int) -> Column:
            e = F.element_at(v_raw, i).cast("double")
            return e * e

        total: Column = sq(1)
        for i in range(2, dim + 1):
            total = total + sq(i)
        return F.sqrt(total)
    v = _to_double(v_raw)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(v: Column | str) -> Column:
    """v / ||v||; zero vectors pass through unchanged (HNSWIndex.js:477)."""
    v = _to_double(v)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def cosine_similarity(
    a: Column | str,
    b: Column | str,
    dim: int | None = None,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """dot(a,b) / (||a||·||b||) — the reference normalizes at insert time and
    then takes a plain dot product; dividing by both norms is the same value
    without requiring pre-normalized storage.  Pass precomputed per-side
    norms in join plans so each is evaluated once per row, not once per
    pair."""
    a, b = _to_double(a), _to_double(b)
    na = a_norm if a_norm is not None else l2_norm(a, dim)
    nb = b_norm if b_norm is not None else l2_norm(b, dim)
    denom = na * nb
    return F.when(denom > 0, dot_product(a, b, dim) / denom).otherwise(F.lit(0.0))


def cosine_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b, dim)


def euclidean_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    a_raw = F.col(a) if isinstance(a, str) else a
    b_raw = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        def sqd(i: int) -> Column:
            di = F.element_at(a_raw, i).cast("double") - F.element_at(b_raw, i).cast("double")
            return di * di

        total: Column = sqd(1)
        for i in range(2, dim + 1):
            total = total + sqd(i)
        return F.sqrt(total)
    a, b = _to_double(a_raw), _to_double(b_raw)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def dot_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Negated dot product — lower = better (HNSWIndex.js:461-466)."""
    return -dot_product(a, b, dim)


METRICS = {
    "cosine": cosine_distance,
    "euclidean": euclidean_distance,
    "dot": dot_distance,
}


def distance(metric: str, a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    try:
        return METRICS[metric](a, b, dim)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(METRICS)}")


def score_from_distance(metric: str, dist: Column) -> Column:
    """The reference reports score = 1 - distance for every metric
    (HNSWIndex.js:307)."""
    return F.lit(1.0) - dist
