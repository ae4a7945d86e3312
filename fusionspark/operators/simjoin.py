"""Exact set-similarity join with LOSSLESS prefix filtering (the
PPJoin/AllPairs family, Bayardo et al. 2007 / Xiao et al. 2008) over word
n-gram shingle sets.

This is the third member of the near-dup join family and the only EXACT
scale path: neardup_ngram blocks on (lang, source) and is quadratic
inside blocks; neardup_ngram_lsh prunes with MinHash bands and is
probabilistic (banding-curve recall < 1).  Prefix filtering prunes
candidates with ZERO recall loss: order every set by global token
frequency (rarest first), keep each set's first |x| − ⌈t·|x|⌉ + 1
tokens, and any pair with Jaccard ≥ t provably shares a token in both
prefixes — so the candidate join touches only rare-token postings and
the exact verify runs on candidates alone.  The registered query's
oracle is the UNPRUNED all-pairs ground truth, so every gate run
re-proves the pruning lossless on real data.

Scale shape: one Arrow shingle pass; the rarest-first order is the
COMPOSITE KEY (df, s) — each doc's postings join the document-frequency
table on the shingle (a plain shuffle equi-join AQE can size-threshold)
and rank per-doc with a Window.partitionBy(doc) over (df, s), so no
global sort and no vocabulary-sized broadcast exists anywhere in the
plan; the candidate join keys on the shingle string itself, touching
only rare-shingle postings (df ≤ a few), so its fan-out follows the
prefix df distribution, not |docs|²; the verify joins postings for
candidate docs only.  Thresholds are exact rationals (num/den), so
prefix lengths are integer arithmetic on both engines.  (An earlier
form densified the order into a global row_number over the whole
vocabulary and broadcast it — a single-task sort plus an O(vocab)
broadcast that dies at corpus scale; the (df, s) composite key induces
the IDENTICAL total order, so the pair set is unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingle_postings(
    df: DataFrame, gram: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) postings, DISTINCT per doc, via the Arrow shingle
    emitter (bit-compatible with dedup._py_shingles / the _SHINGLES SQL
    macro: at least one, possibly short, shingle per doc)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from fusionspark.operators.dedup import _py_shingles

    schema = StructType([df.schema[id_col], StructField("s", StringType())])

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            ids, out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for s in set(_py_shingles(text, gram)):
                    ids.append(did)
                    out.append(s)
            yield pd.DataFrame({id_col: ids, "s": out})

    return df.select(id_col, text_col).mapInPandas(emit, schema=schema)


def jaccard_join_prefix(
    df: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    gram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ t_num/t_den, found via
    prefix + length filtering and verified exactly.  Returns
    (id_a, id_b, sim) with id_a < id_b."""
    # r15 note: a postings localCheckpoint was tried here (the frame feeds
    # five consumers) and REVERTED — same-window A/B showed no win (AQE
    # already reuses the post-emitter exchanges) and materializing a
    # corpus-token-sized table is the wrong trade at 100 TB.
    post = shingle_postings(df, gram, id_col, text_col)
    sizes = post.groupBy(id_col).agg(F.count("*").cast("long").alias("sz"))
    dfreq = post.groupBy("s").agg(F.count("*").cast("long").alias("df"))
    # Rarest-first order = the composite key (df, s): joining each doc's
    # postings to the df table (plain shuffle equi-join — AQE broadcasts
    # it only while it fits) and ranking per-doc over (df, s) induces the
    # same total order a global dense index would, with no unpartitioned
    # window and no vocabulary broadcast.
    ranked = (
        post.join(dfreq, "s")
        .join(sizes, id_col)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("df").asc(), F.col("s").asc()
                )
            ),
        )
    )
    # prefix length p = sz − ⌈t·sz⌉ + 1, exact integer ceil
    ceil_t = F.expr(f"({t_num} * sz + {t_den} - 1) div {t_den}")
    prefix = ranked.filter(F.col("rn") <= F.col("sz") - ceil_t + 1).select(
        F.col(id_col), F.col("s"), F.col("sz")
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("s"), F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("s"), F.col("sz").alias("sz_b")
    )
    cand = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: J ≥ t ⇒ t·max(|x|,|y|) ≤ min(|x|,|y|)
        .filter(
            F.lit(t_num) * F.greatest("sz_a", "sz_b")
            <= F.lit(t_den) * F.least("sz_a", "sz_b")
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )
    p1 = post.select(F.col(id_col).alias("id_a"), "s")
    p2 = post.select(F.col(id_col).alias("id_b"), "s")
    overlap = (
        cand.join(p1, "id_a")
        .join(p2, ["id_b", "s"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").cast("long").alias("o"))
    )
    sim = F.col("o").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("o")
    ).cast("double")
    from fusionspark.operators.textstats import round6_stable

    # r14: integer-ratio Jaccard — round6_stable, not ROUND (the
    # shortest-string halfway class; oracle uses the same FLOOR form)
    return (
        overlap.filter(sim >= F.lit(t_num) / F.lit(float(t_den)))
        .select("id_a", "id_b", round6_stable(sim).alias("sim"))
    )
