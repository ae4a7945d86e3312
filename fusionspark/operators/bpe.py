"""Distributed BPE (byte-pair encoding) tokenizer induction — the
vocabulary-training step of an LLM data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The scale insight: BPE statistics live on the WORD-FREQUENCY table, not
the corpus.  One corpus-sized aggregation (word → count) reduces 100 TB of
text to a vocabulary-sized weighted table; every merge round then operates
on that table — adjacent-pair counts via explode + hash agg (weighted by
word count), one argmax scalar to the driver per round (the merge list is
inherently sequential — same single-scalar-per-round contract as
connected_components), and a vocabulary-sized Arrow map applies the merge.
Corpus text is read exactly once, ever.

Encoding (`bpe_encode`) broadcasts the learned merge ranks (KB-sized) and
re-segments documents in one zero-shuffle Arrow map, greedily applying the
lowest-rank merge first — the standard BPE inference order.

No DuckDB oracle: the merge sequence is an iterated argmax (each round's
input depends on the previous round's merge), which SQL cannot replay
non-recursively — registered rows-only with a bit-exact pure-Python
reference parity test (tests/test_bpe.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (distinguishes "est" in "highest" from "estimate")
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): THE corpus-sized reduction — everything after this is
    vocabulary-scale."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _chars_with_eow(w: str) -> list[str]:
    return list(w) + [EOW]


def _merge_seq(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right single-pair merge (the reference BPE semantics)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to `n_merges` BPE merges; returns [(left, right, count)]
    in merge order.  Ties break lexicographically on (left, right) so the
    result is deterministic under any partitioning.  Each round: pair
    explode + weighted hash agg over the VOCAB table, one argmax row to
    the driver, one Arrow map to apply the merge; lineage cut per round
    with localCheckpoint (the connected_components pattern)."""
    import pandas as pd

    vocab = (
        word_frequencies(df, text_col)
        .select(
            "cnt",
            F.concat(
                F.split(F.col("w"), "(?!$)"), F.array(F.lit(EOW))
            ).alias("syms"),
        )
        # vocabulary scale: even a 10M-type vocab fits a handful of
        # partitions; 32-task rounds over a 50-row table are pure overhead
        .coalesce(8)
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        sz = F.size("syms")
        pairs = vocab.filter(sz >= 2).select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, sz - 1).alias("a"),
                    F.slice(F.col("syms"), 2, sz - 1).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if best is None or best["total"] < min_pair_count:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b, int(best["total"])))

        def apply(batches, a=a, b=b):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_seq(list(s), a, b) for s in pdf["syms"]
                ]
                yield pdf

        vocab = vocab.mapInPandas(
            apply, schema="cnt long, syms array<string>"
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, tokens): re-segment documents under the learned
    merges, lowest-rank-first (standard BPE inference).  The rank table
    broadcasts in the kernel closure; one zero-shuffle Arrow map."""
    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _cnt) in enumerate(merges)}

    def seg(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = _chars_with_eow(word)
        while len(syms) >= 2:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms = _merge_seq(syms, syms[best_i], syms[best_i + 1])
        cache[word] = syms
        return syms

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            ids, ntok, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in str(text).lower().split(" "):
                    if w:
                        out.extend(seg(w, cache))
                ids.append(did)
                ntok.append(len(out))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "n_tokens": ntok, "tokens": toks})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_tokens long, tokens array<string>"
    )
