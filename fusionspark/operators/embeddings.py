"""Embedding-column analytics: per-label centroids and norm-outlier
detection.

Not in the reference (north-star additions): corpus curation over an
embedding column needs per-group centroids (topic/domain summaries, the
E-step primitive SemDedup-style semantic dedup and IVF coarse training
share) and distribution-level outlier flags (broken encoder outputs, empty
documents, adversarial inputs show up as norm outliers before anything
else does).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fusionspark.functions.vector import l2_norm


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector in LONG format (label, dim — 1-based, mean).

    Scale shape: an Arrow map emits PER-PARTITION partial (label, dim,
    s=Σx, c=n) rows — vectors never shuffle; only partitions × labels ×
    dim tiny partials do — then one groupBy(label, dim) finishes
    Σs/Σc.  The naive posexplode→groupBy plan would shuffle every vector
    element in the corpus (dim × corpus rows)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {"label": [], "dim": [], "s": [], "c": []}
            for lab, grp in pdf.groupby(label_col):
                m = np.stack([np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
                sums = m.sum(axis=0)
                for d in range(m.shape[1]):
                    out["label"].append(lab)
                    out["dim"].append(d + 1)
                    out["s"].append(float(sums[d]))
                    out["c"].append(len(grp))
            yield pd.DataFrame(out)

    part = df.select(label_col, vec_col).mapInPandas(
        partials, schema="label int, dim int, s double, c long"
    )
    return part.groupBy("label", "dim").agg(
        (F.sum("s") / F.sum("c")).alias("mean")
    )


def norm_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    z_threshold: float = 1.5,
) -> DataFrame:
    """Rows whose vector L2 norm is a z-score outlier.  The corpus-level
    mean/std reduce to ONE 1-row aggregate (explicit Σ/Σx² closed form —
    identical expression on both engines, unlike the engines' internal
    stddev algorithms) that cross-join-broadcasts back; the filter compares
    the ROUNDED z so outlier membership is float-order-stable."""
    norms = df.select(id_col, l2_norm(vec_col, dim=dim).alias("nrm"))
    stats = norms.agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("nrm").alias("s1"),
        F.sum(F.col("nrm") * F.col("nrm")).alias("s2"),
    ).select(
        (F.col("s1") / F.col("cnt")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("cnt"))
            / (F.col("cnt") - 1.0)
        ).alias("sigma"),
        "cnt",
    )
    z: Column = F.round((F.col("nrm") - F.col("mu")) / F.col("sigma"), 6)
    return (
        norms.crossJoin(F.broadcast(stats))
        .select(id_col, F.round("nrm", 6).alias("norm"), z.alias("z"))
        .filter(F.abs(F.col("z")) > z_threshold)
    )


def centroid_similarity(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cosine-style dot product of every vector against its group's mean
    vector (for unit-normalized corpora this IS the prototypicality
    score SemDedup ranks by).  Centroids are tiny (labels × dim) and
    BROADCAST; vectors never shuffle."""
    from fusionspark.functions.vector import dot_product

    cent_long = label_centroids(df, label_col=label_col, vec_col=vec_col)
    cent = cent_long.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("centroid")
    )
    joined = df.select(id_col, label_col, vec_col).join(
        F.broadcast(cent), on=df[label_col] == cent["label"]
    )
    return joined.select(
        id_col,
        df[label_col].alias(label_col),
        dot_product(vec_col, "centroid", dim=dim).alias("sim"),
    )


def centroid_outliers(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    z_threshold: float = 1.5,
) -> DataFrame:
    """Rows whose similarity to their group centroid is a z-score outlier
    (low side = off-topic/noise candidates, high side = near-duplicates of
    the group prototype).  Same 1-row closed-form stats broadcast and
    rounded-z membership cut as norm_outliers."""
    sims = centroid_similarity(df, label_col, id_col, vec_col, dim)
    stats = sims.agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("sim").alias("s1"),
        F.sum(F.col("sim") * F.col("sim")).alias("s2"),
    ).select(
        (F.col("s1") / F.col("cnt")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("cnt"))
            / (F.col("cnt") - 1.0)
        ).alias("sigma"),
    )
    z = F.round((F.col("sim") - F.col("mu")) / F.col("sigma"), 6)
    return (
        sims.crossJoin(F.broadcast(stats))
        .select(id_col, label_col, F.round("sim", 6).alias("sim"), z.alias("z"))
        .filter(F.abs(F.col("z")) > z_threshold)
    )
