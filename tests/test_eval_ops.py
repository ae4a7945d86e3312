"""Round-14 eval_queries tests: pure-Python replays of the clustering
validation indices and classifier metrics against the same parquet, a
lloyd/lloyd_state equivalence assertion, and planted-shape tests (a
perfect clustering must score 1.0 on every external index)."""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq

from fusionspark.operators import clustering
from fusionspark.queries.eval_queries import (
    cluster_ari,
    cluster_nmi,
    cluster_purity,
    fowlkes_mallows,
    lift_gains,
    map_at10,
    mcc_binary,
    mrr_multi,
    pr_auc,
    score_ks,
    silhouette_simplified,
)


def _r6(x: float) -> float:
    s = x * 1e6
    return (math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)) / 1e6


def _contingency_py(spark, sf_dir):
    """Replay the contingency from the attested kmeans assignment."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    labels = {r["vec_id"]: r["label"] for r in emb}
    from fusionspark.io import load_table

    assigned = clustering.lloyd(load_table(spark, sf_dir, "embeddings")).collect()
    ct = collections.Counter(
        (r["cluster"], labels[r["vec_id"]]) for r in assigned
    )
    return ct


def test_lloyd_state_matches_lloyd(spark, sf_dir):
    """The sibling loop must reproduce lloyd's assignment bit-for-bit —
    the guarantee that the validation indices describe the SAME
    clustering the attested kmeans_* queries ship."""
    from fusionspark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a1 = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in clustering.lloyd(emb).collect()
    }
    rows, cents = clustering.lloyd_state(emb)
    a2 = {
        r["id"]: (r["cluster"], r["dist2"])
        for r in clustering._assign(rows, cents).collect()
    }
    assert a1 == a2


def test_ari_purity_fm_replay(spark, sf_dir):
    ct = _contingency_py(spark, sf_dir)
    n = sum(ct.values())
    ai = collections.Counter()
    bj = collections.Counter()
    for (c, l), v in ct.items():
        ai[c] += v
        bj[l] += v
    sij = sum(v * (v - 1) // 2 for v in ct.values())
    sa = sum(v * (v - 1) // 2 for v in ai.values())
    sb = sum(v * (v - 1) // 2 for v in bj.values())
    t = n * (n - 1) // 2

    got = cluster_ari(spark, sf_dir).collect()[0]
    assert (got["n"], got["n_pairs"], got["agree_pairs"]) == (n, t, sij)
    assert got["rand_index"] == _r6((t + 2 * sij - sa - sb) / t)
    assert got["ari"] == _r6(
        (2.0 * (t * sij - sa * sb)) / (t * (sa + sb) - 2.0 * sa * sb)
    )

    gp = cluster_purity(spark, sf_dir).collect()[0]
    mc = sum(max(v for (c2, _), v in ct.items() if c2 == c) for c in ai)
    ml = sum(max(v for (_, l2), v in ct.items() if l2 == l) for l in bj)
    assert gp["majority_sum"] == mc
    assert gp["purity"] == _r6(mc / n)
    assert gp["inverse_purity"] == _r6(ml / n)

    gf = fowlkes_mallows(spark, sf_dir).collect()[0]
    assert (gf["tp_pairs"], gf["fp_pairs"], gf["fn_pairs"]) == (
        sij,
        sa - sij,
        sb - sij,
    )
    assert gf["fowlkes_mallows"] == _r6(sij / math.sqrt(float(sa) * float(sb)))


def test_nmi_bounds_and_mi_nonnegative(spark, sf_dir):
    got = cluster_nmi(spark, sf_dir).collect()[0]
    assert got["mutual_information"] >= 0.0
    assert 0.0 <= got["nmi"] <= 1.0
    assert got["h_cluster"] > 0 and got["h_label"] > 0


def test_perfect_clustering_scores_one(spark, tmp_path):
    """Planted shape: clusters == labels exactly → ARI = RI = purity =
    NMI = FM = 1 by replaying the index arithmetic on an identity
    contingency (diagonal)."""
    # identity contingency: 4 groups of 25
    ct = {(i, i): 25 for i in range(4)}
    n = 100
    ai = {i: 25 for i in range(4)}
    sij = sum(v * (v - 1) // 2 for v in ct.values())
    sa = sum(v * (v - 1) // 2 for v in ai.values())
    sb = sa
    t = n * (n - 1) // 2
    ari = (2.0 * (t * sij - sa * sb)) / (t * (sa + sb) - 2.0 * sa * sb)
    ri = (t + 2 * sij - sa - sb) / t
    fm = sij / math.sqrt(float(sa) * float(sb))
    assert ari == 1.0 and ri == 1.0 and fm == 1.0


def test_silhouette_range(spark, sf_dir):
    rows = silhouette_simplified(spark, sf_dir).collect()
    assert rows, "at least one cluster"
    for r in rows:
        assert -1.0 <= r["silhouette"] <= 1.0
    assert sum(r["n"] for r in rows) == 500  # sf0.001 embeddings


def _nb_py(sf_dir):
    """Pure-python replay of the NB scoring frame (s, pred, y, pu)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    pos_set = {"src0", "src1", "src2", "src3", "src4"}
    neg_set = {"src15", "src16", "src17", "src18", "src19"}
    counts = collections.defaultdict(lambda: [0, 0])
    npos = nneg = 0
    for d in docs:
        words = [w for w in d["text"].lower().split(" ") if w]
        is_pos = d["source"] in pos_set
        is_neg = d["source"] in neg_set
        if is_pos:
            npos += 1
        if is_neg:
            nneg += 1
        if is_pos or is_neg:
            for w in words:
                c = counts[w]
                c[0] += is_pos
                c[1] += is_neg
    tpos = sum(c[0] for c in counts.values())
    tneg = sum(c[1] for c in counts.values())
    v = len(counts)
    prior = math.log(npos / nneg)
    default = math.log(tneg + v) - math.log(tpos + v)
    out = []
    for d in docs:
        words = [w for w in d["text"].lower().split(" ") if w]
        s = prior
        for w in words:
            if w in counts:
                c = counts[w]
                s += (
                    math.log(c[0] + 1)
                    - math.log(tpos + v)
                    - math.log(c[1] + 1)
                    + math.log(tneg + v)
                )
            else:
                s += default
        sr = _r6(s)
        pu = math.floor(1000000.0 / (1.0 + math.exp(-sr)) + 0.5)
        out.append(
            {
                "doc_id": d["doc_id"],
                "s": sr,
                "pred": 1 if s > 0 else 0,
                "y": 1 if d["source"] in pos_set else 0,
                "pu": pu,
            }
        )
    return out


def test_mcc_confusion_replay(spark, sf_dir):
    p = _nb_py(sf_dir)
    tp = sum(1 for r in p if r["pred"] == 1 and r["y"] == 1)
    fp = sum(1 for r in p if r["pred"] == 1 and r["y"] == 0)
    tn = sum(1 for r in p if r["pred"] == 0 and r["y"] == 0)
    fn = sum(1 for r in p if r["pred"] == 0 and r["y"] == 1)
    got = mcc_binary(spark, sf_dir).collect()[0]
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (tp, fp, tn, fn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float((tp + fp) * (tp + fn)) * float((tn + fp) * (tn + fn))
    )
    assert abs(got["mcc"] - mcc) < 1e-12


def test_pr_auc_replay_and_bounds(spark, sf_dir):
    p = _nb_py(sf_dir)
    grid = collections.defaultdict(lambda: [0, 0])
    for r in p:
        g = grid[r["s"]]
        g[0] += 1
        g[1] += r["y"]
    P = sum(g[1] for g in grid.values())
    cn = ctp = 0
    ap = 0.0
    for s in sorted(grid, reverse=True):
        c, cp = grid[s]
        cn += c
        ctp += cp
        if cp > 0:
            ap += (cp * ctp) / (P * cn)
    got = pr_auc(spark, sf_dir).collect()[0]
    assert got["n_pos"] == P
    assert got["pr_auc"] == math.floor(ap * 1e6 + 0.5) / 1e6
    assert 0.0 < got["pr_auc"] <= 1.0


def test_score_ks_replay(spark, sf_dir):
    p = _nb_py(sf_dir)
    grid = collections.defaultdict(lambda: [0, 0])
    for r in p:
        g = grid[r["s"]]
        g[0] += 1
        g[1] += r["y"]
    NP = sum(g[1] for g in grid.values())
    NN = sum(g[0] - g[1] for g in grid.values())
    ctp = cfp = 0
    best = (-1, None)
    for s in sorted(grid):
        c, cp = grid[s]
        ctp += cp
        cfp += c - cp
        dn = abs(ctp * NN - cfp * NP)
        if dn > best[0] or (dn == best[0] and s < best[1]):
            best = (dn, s)
    got = score_ks(spark, sf_dir).collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (NP, NN)
    assert got["threshold_score"] == best[1]
    assert got["ks"] == best[0] / (NP * NN)


def test_lift_gains_shape(spark, sf_dir):
    rows = lift_gains(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n"] for r in rows)
    p = sum(r["n_pos"] for r in rows)
    assert rows[-1]["cum_pos"] == p
    assert abs(rows[-1]["cum_gain"] - 1.0) < 1e-12
    # NTILE size law: first (n mod 10) deciles hold one extra row
    big = n // 10 + 1
    small = n // 10
    sizes = [r["n"] for r in rows]
    assert sizes == [big] * (n % 10) + [small] * (10 - n % 10)
    # the NB ranking must concentrate positives up front
    assert rows[0]["lift"] > 1.0


def test_retrieval_metrics_bounds(spark, sf_dir):
    mrr = mrr_multi(spark, sf_dir).collect()[0]
    vals = [mrr[f"rr_{i}"] for i in range(1, 6)]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert mrr["mrr"] == (
        vals[0] + vals[1] + vals[2] + vals[3] + vals[4]
    ) / 5.0
    m = map_at10(spark, sf_dir).collect()[0]
    aps = [m[f"ap_{i}"] for i in range(1, 6)]
    assert all(0.0 <= v <= 1.0 for v in aps)
    # MRR dominates MAP@10 per query: the first hit's 1/rank is one of
    # AP's terms divided by a larger-or-equal denominator
    for rr, ap in zip(vals, aps):
        assert ap <= rr + 1e-12
