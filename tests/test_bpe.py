"""BPE trainer/encoder tests: bit-exact parity with an independent
pure-Python reference (the oracle for this non-SQL-expressible iterated
argmax), determinism, and plan shape."""

from __future__ import annotations

from collections import Counter

from fusionspark.io import load_table
from fusionspark.operators.bpe import EOW, bpe_encode, bpe_train


def _reference_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Independent in-memory BPE (Sennrich alg. 1): word freqs → iterated
    weighted pair argmax with (left, right) lexicographic tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                vocab[w] += 1
    segs = {w: tuple(list(w) + [EOW]) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in segs.items():
            cnt = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), total = best
        if total < min_count:
            break
        merges.append((a, b, total))
        new_segs = {}
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_segs[w] = tuple(out)
        segs = new_segs
    return merges


def test_bpe_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _reference_bpe(texts, n_merges=12)
    got = bpe_train(docs, n_merges=12)
    assert got == expected


def test_bpe_classic_example(spark):
    corpus = "low low low low low lower lower newest newest newest " \
             "newest newest newest widest widest widest"
    df = spark.createDataFrame([(corpus,)], "text string")
    merges = bpe_train(df, n_merges=4)
    # the Sennrich walk-through: es, est, est</w>, lo
    assert [(a, b) for a, b, _ in merges] == [
        ("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")
    ]


def test_bpe_encode_greedy_rank_order(spark):
    corpus = "ab ab ab abc abc"
    df = spark.createDataFrame([(corpus,)], "text string")
    merges = bpe_train(df, n_merges=3, min_pair_count=1)
    enc = bpe_encode(
        spark.createDataFrame([(1, "ab abc abd")], "doc_id long, text string"),
        merges,
    ).first()
    toks = enc["tokens"]
    assert enc["n_tokens"] == len(toks)
    # 'ab' merges appear; unseen 'abd' falls back to finer units
    joined = "".join(toks)
    assert joined == "ab" + EOW + "abc" + EOW + "abd" + EOW
    # re-encoding is deterministic
    again = bpe_encode(
        spark.createDataFrame([(1, "ab abc abd")], "doc_id long, text string"),
        merges,
    ).first()
    assert again["tokens"] == toks


def test_bpe_encode_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    merges = [("a", EOW, 2)]
    plan = bpe_encode(df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
