"""Resident distributed vector index — the serving-path peer of the
reference's in-memory HNSW (reference src/core/HNSWIndex.js:126-320 keeps
the whole graph in process memory; search never touches storage).

The batch `knn(strategy="numpy")` path re-ships the corpus from the JVM to
Python workers on EVERY search (~0.35 s of Arrow conversion per call for
100k x 64-d locally — measured, see BENCH_DETAIL).  A serving engine builds
once and searches many: here each partition's vectors are materialized ONCE
into a numpy block (ids + row-major float64 matrix, pre-normalized for
cosine) and persisted as Python objects, so a search stage is exactly one
GEMM + one top-k per block with zero serialization of corpus data.

Scale shape (1000 executors, 100 TB):
  * blocks live WHERE the data lives — each executor holds its partitions'
    blocks in memory; nothing reshuffles between searches;
  * the probe batch ships once per stage in the task binary (chunk batches
    beyond ~10k probes);
  * per-partition candidates are fixed-width (n_probes x k) id/distance
    matrices; the merge is associative, so it runs either as one driver
    reduction (interactive batches) or as `treeReduce` partial merges on
    executors (`merge="tree"`) — the same shape Spark's own TakeOrdered
    uses.  At 1000 partitions x 1000 probes x k=10 the driver form moves
    160 MB; the tree form cuts that by the fan-in per level.

Exactness: float64 GEMM over the same vectors — identical semantics to
`knn(strategy="numpy")` up to ulp-level reassociation (cosine is computed
as 1 - normalized-rows GEMM instead of GEMM / |e| / |p|); ranks use the
same documented (distance, id ASC) total order, with boundary ties resolved
by an exact per-row re-selection.  Parity is pytest-attested against the
attested knn kernel (tests/test_serving.py).

Ids ride in an int64 candidate matrix.  String ids (the reference's ids ARE
strings, HNSWIndex.js:27-35) are dict-encoded at build: surrogate =
xxhash64(id), with a one-pass countDistinct collision check that fails
loudly (p(collision) ~ n²/2⁶⁵ — vanishing below billions of ids), and a
lazily-recomputable (surrogate, id) mapping joined back against the tiny
(Q×k) broadcast result at search time to restore the original ids.  One
documented deviation for string corpora: exact-distance boundary ties break
on the surrogate (hash) order, not lexicographically on the original id.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ResidentIndex", "ResidentIVF"]

_METRICS = ("cosine", "dot", "euclidean")


# merge="auto" switches to executor-side treeReduce above this many blocks:
# at 1000 partitions the driver fold would pull 1000 × (Q×k) candidate
# matrices through one process; below it the single vectorized driver merge
# is faster than an extra distributed stage.
AUTO_TREE_PARTITIONS = 64

# Corpus rows per GEMM strip in the search kernel.  Bounds a task's
# transient allocations at Q×TILE_ROWS float64 (~32 MB for 1000 probes)
# regardless of block size: measured at 1M×64 on this host, the un-tiled
# (Q, n) kernel paid an 80s first-search page-fault storm (32 tasks
# first-touching ~24 GB) vs 1.5s warm, while 4096-row strips run ~0.43s
# per 31k-row block steady-state with no cold spike — faster than the
# single shot even warm (better cache locality for the top-k pass).
TILE_ROWS = 4096

#: probe-matrix rows the build-time warm pass sizes its fake transients
#: for — the common serving batch shape; larger real batches only fault
#: the difference.
WARM_Q = 1000


def _warm_kernel(it):
    """Build-time pre-fault of the search kernel's transient allocations
    in each Python worker: allocate-and-touch the same strip-shaped
    arrays (scores, distances, argpartition output) a WARM_Q-probe search
    would, so the FIRST real search runs at steady-state latency instead
    of paying the allocator/page-fault cost (measured 6.3s vs 1.7s at
    1M×64 even tiled; 80-108s before tiling).  The reference pays its
    memory setup during insert, so pricing it into build keeps the
    build/search split honest.  Also serves as the materializing action
    for the block cache."""
    n_blocks = 0
    for _ids, M, _extra in it:
        n_blocks += 1
        strip = min(TILE_ROWS, M.shape[0])
        S = np.zeros((WARM_Q, strip))
        D = S + 1.0
        kk = min(10, strip)
        idx = np.argpartition(D, kk - 1, axis=1)
        dsel = np.take_along_axis(D, idx[:, :kk], axis=1)
        _ = D == dsel.max(axis=1)[:, None]  # tie-check booleans
    yield n_blocks


def _id_kind(df: DataFrame, id_col: str) -> str:
    t = dict(df.dtypes)[id_col]
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t == "string":
        return "string"
    raise ValueError(
        f"resident index needs an integral or string id column; {id_col!r} is {t}"
    )


def _encode_string_ids(corpus: DataFrame, id_col: str):
    """Dict-encode a string id column to int64 surrogates: surrogate =
    xxhash64(id) (content-deterministic, so append()-built blocks stay
    consistent with earlier ones without shared state).  One aggregation
    pass proves injectivity on THIS corpus and fails loudly otherwise.
    Returns (encoded_df_with___rid64, mapping_df(surrogate, id))."""
    enc = corpus.withColumn("__rid64", F.xxhash64(F.col(id_col)))
    stats = enc.agg(
        F.countDistinct(id_col).alias("n_ids"),
        F.countDistinct("__rid64").alias("n_codes"),
    ).first()
    if stats["n_ids"] != stats["n_codes"]:
        raise ValueError(
            f"xxhash64 collision among {stats['n_ids']} string ids in "
            f"{id_col!r}; resident serving cannot dict-encode this corpus"
        )
    # distinct: duplicate ids are legal corpus rows (e.g. the engine's
    # per-tenant id namespaces) and must not multiply decode-join results
    return enc, enc.select("__rid64", id_col).distinct()


def _block_of(rows: list, id_name: str, vec_name: str, metric: str,
              attr_names: tuple = ()):
    """(ids int64, M float64, extra) where M is pre-normalized for cosine;
    for euclidean the squared row norms ride in extra[None]; attr columns
    (for pre-filtered serving) ride as numpy arrays in extra."""
    ids = np.asarray([r[id_name] for r in rows], dtype=np.int64)
    V = np.asarray([r[vec_name] for r in rows], dtype=np.float64)
    extra = {a: np.asarray([r[a] for r in rows]) for a in attr_names}
    if metric == "cosine":
        n = np.linalg.norm(V, axis=1)
        n[n == 0] = 1.0
        return ids, V / n[:, None], extra or None
    if metric == "euclidean":
        extra["__sqnorm__"] = (V * V).sum(axis=1)
        return ids, V, extra
    return ids, V, extra or None


def _row_topk(D: np.ndarray, ids: np.ndarray, k: int):
    """Exact per-row top-k of (distance ASC, id ASC): argpartition cut, then
    an exact re-selection for the (rare) rows whose kth distance ties with
    rows outside the cut — so membership is the documented total order, not
    argpartition's arbitrary boundary pick."""
    n = D.shape[1]
    kk = min(k, n)
    idx = np.argpartition(D, kk - 1, axis=1)[:, :kk] if kk < n else (
        np.broadcast_to(np.arange(n), D.shape).copy()
    )
    dsel = np.take_along_axis(D, idx, axis=1)
    isel = ids[idx]
    if kk < n:
        boundary = dsel.max(axis=1)
        n_tot = (D == boundary[:, None]).sum(axis=1)
        n_in = (dsel == boundary[:, None]).sum(axis=1)
        for qi in np.flatnonzero(n_tot > n_in):
            cand = np.flatnonzero(D[qi] <= boundary[qi])
            order = np.lexsort((ids[cand], D[qi, cand]))
            pick = cand[order[:kk]]
            dsel[qi] = D[qi, pick]
            isel[qi] = ids[pick]
    return dsel, isel


def _merge_candidates(parts: Iterable[tuple], k: int):
    """Associative merge of (D (Q,m), I (Q,m)) candidate sets: concatenate,
    then one structured sort per row by (distance, id) — the exact total
    order.  Works for the driver fold and for treeReduce partials alike."""
    parts = list(parts)
    D = np.concatenate([p[0] for p in parts], axis=1)
    I = np.concatenate([p[1] for p in parts], axis=1)
    m = D.shape[1]
    kk = min(k, m)
    if m > 2 * kk:
        # argpartition prefilter by distance (cheap) before the exact
        # structured sort; rows whose kth distance ties with dropped
        # columns get an exact (d, id) re-selection so the cut stays exact
        idx = np.argpartition(D, kk - 1, axis=1)[:, :kk]
        dsel = np.take_along_axis(D, idx, axis=1)
        isel = np.take_along_axis(I, idx, axis=1)
        boundary = dsel.max(axis=1)
        n_tot = (D == boundary[:, None]).sum(axis=1)
        n_in = (dsel == boundary[:, None]).sum(axis=1)
        for qi in np.flatnonzero(n_tot > n_in):
            cand = np.flatnonzero(D[qi] <= boundary[qi])
            order = np.lexsort((I[qi, cand], D[qi, cand]))
            pick = cand[order[:kk]]
            dsel[qi] = D[qi, pick]
            isel[qi] = I[qi, pick]
        D, I = dsel, isel
    arr = np.empty(D.shape, dtype=[("d", "f8"), ("i", "i8")])
    arr["d"] = D
    arr["i"] = I
    arr.sort(axis=1, order=["d", "i"])
    return arr["d"][:, :kk], arr["i"][:, :kk]


def _result_df(
    spark: SparkSession,
    probe_ids: list,
    Dk: np.ndarray,
    Ik: np.ndarray,
    probe_id_col: str,
    id_col: str,
    probe_sql_type: str,
    id_sql_type: str,
) -> DataFrame:
    import pandas as pd

    Q, kk = Dk.shape
    keep = np.isfinite(Dk)  # IVF: probes not routed to a partition pad with +inf
    reps = keep.sum(axis=1)
    pdf = pd.DataFrame(
        {
            probe_id_col: np.repeat(np.asarray(probe_ids), reps),
            id_col: Ik[keep],
            "distance": Dk[keep],
        }
    )
    pdf["score"] = 1.0 - pdf["distance"]
    ranks = np.concatenate([np.arange(1, r + 1) for r in reps]) if Q else np.array([], dtype=np.int64)
    pdf["rank"] = ranks.astype(np.int64)
    schema = (
        f"{probe_id_col} {probe_sql_type}, {id_col} {id_sql_type}, "
        "distance double, score double, rank int"
    )
    return spark.createDataFrame(pdf, schema=schema)


class ResidentIndex:
    """Exact-search resident block index.  Build once, search many;
    append() adds new blocks without touching existing ones (the
    incremental-insert story — the reference inserts into its in-memory
    graph one vector at a time, HNSWIndex.js:126-180).  Deletes rebuild,
    like the IVF layouts."""

    def __init__(self, spark, parts, metric, id_col, vector_col, id_sql_type,
                 attr_cols=(), decode=None):
        self.spark = spark
        self._parts = parts if isinstance(parts, list) else [parts]
        self.metric = metric
        self.id_col = id_col
        self.vector_col = vector_col
        self.id_sql_type = id_sql_type
        self.attr_cols = tuple(attr_cols)
        # (surrogate, id) mapping DataFrame for string-keyed corpora
        self._decode = decode

    @property
    def rdd(self):
        if len(self._parts) == 1:
            return self._parts[0]
        return self.spark.sparkContext.union(self._parts)

    def append(self, new_rows: DataFrame) -> "ResidentIndex":
        """Blocks for the new rows only — existing blocks are shared, not
        recomputed or re-persisted.  Ids must be disjoint from the resident
        set (an upsert is delete+rebuild, as with the parquet IVF layouts).
        Returns a NEW index; the old one stays valid (functional append,
        the manifest-table model)."""
        fresh = ResidentIndex.build(
            new_rows, id_col=self.id_col, vector_col=self.vector_col,
            metric=self.metric, attr_cols=self.attr_cols,
        )
        decode = self._decode
        if decode is not None or fresh._decode is not None:
            if decode is None or fresh._decode is None:
                raise ValueError("append() cannot mix string and integral ids")
            combined = decode.union(fresh._decode)
            stats = combined.agg(
                F.countDistinct(self.id_col).alias("n_ids"),
                F.countDistinct("__rid64").alias("n_codes"),
            ).first()
            if stats["n_ids"] != stats["n_codes"]:
                raise ValueError(
                    "xxhash64 collision between resident and appended string "
                    "ids; rebuild with integral ids"
                )
            decode = combined
        return ResidentIndex(
            self.spark, self._parts + fresh._parts, self.metric,
            self.id_col, self.vector_col, self.id_sql_type, self.attr_cols,
            decode,
        )

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        metric: str = "cosine",
        attr_cols: tuple | list = (),
    ) -> "ResidentIndex":
        """attr_cols — metadata columns materialized into the blocks so
        searches can pre-filter server-side (see search(pre_filter=...))."""
        if metric not in _METRICS:
            raise ValueError(f"metric must be one of {_METRICS}")
        kind = _id_kind(corpus, id_col)
        from fusionspark.operators.knn import id_sql_type

        id_t = id_sql_type(corpus, id_col)
        attrs = tuple(attr_cols)
        decode = None
        block_id = id_col
        if kind == "string":
            enc, decode = _encode_string_ids(corpus, id_col)
            block_id = "__rid64"
            # original string ids ride in each block under __orig_id__ so
            # pre_filter callbacks see the REAL ids, never the int64
            # xxhash64 surrogates (which would silently match nothing)
            src = enc.select(
                block_id, vector_col, F.col(id_col).alias("__orig_id__"),
                *attrs,
            )
            block_attrs = attrs + ("__orig_id__",)
        else:
            src = corpus.select(id_col, vector_col, *attrs)
            block_attrs = attrs

        def to_blocks(it: Iterator) -> Iterator[tuple]:
            rows = list(it)
            if rows:
                yield _block_of(rows, block_id, vector_col, metric,
                                block_attrs)

        rdd = src.rdd.mapPartitions(to_blocks).persist(StorageLevel.MEMORY_ONLY)
        rdd.mapPartitions(_warm_kernel).count()  # materialize + pre-fault
        return cls(
            corpus.sparkSession, rdd, metric, id_col, vector_col, id_t, attrs,
            decode,
        )

    def search(
        self,
        probes: DataFrame,
        k: int = 10,
        probe_id_col: str = "probe_id",
        probe_vector_col: str = "probe_embedding",
        merge: str = "auto",
        probe_batch: tuple | None = None,
        pre_filter=None,
    ) -> DataFrame:
        """(probe_id, id, distance, score, rank) — same shape and tie rule
        as knn().  merge="tree" runs treeReduce partial merges (the
        1000-executor form); "driver" collects per-partition candidates and
        merges in one vectorized fold (interactive form); "auto" (default)
        picks tree when the index spans more than AUTO_TREE_PARTITIONS
        blocks and no pre_filter is set, driver otherwise.  merge="tree"
        with pre_filter raises: the filter can empty every block, which
        treeReduce cannot represent, and candidates must come to the driver
        anyway — ask for merge="driver" explicitly.  probe_batch —
        an optional pre-collected (probe_ids, P float64 matrix,
        probe_sql_type) triple so a serving loop pays the probe collect
        once, like the reference's in-process query arrays.  pre_filter —
        a callable (ids, attrs) -> bool mask applied INSIDE each block
        before scoring (V7 pre-filter semantics: excluded rows never take
        a rank slot); attrs is the dict of build(attr_cols=...) arrays.
        For string-keyed corpora `ids` is the array of ORIGINAL string
        ids (the blocks carry them under attrs["__orig_id__"]), never the
        int64 surrogates used internally for ranking."""
        from fusionspark.operators.knn import id_sql_type

        if merge == "tree" and pre_filter is not None:
            raise ValueError(
                "merge='tree' is incompatible with pre_filter (a filter can "
                "empty every block); use merge='driver'"
            )
        if merge == "auto":
            n_blocks = sum(p.getNumPartitions() for p in self._parts)
            merge = (
                "tree"
                if pre_filter is None and n_blocks > AUTO_TREE_PARTITIONS
                else "driver"
            )

        if probe_batch is not None:
            probe_ids, P, probe_t = probe_batch
            P = np.asarray(P, dtype=np.float64)
        else:
            rows = probes.select(probe_id_col, probe_vector_col).collect()
            probe_ids = [r[probe_id_col] for r in rows]
            P = np.asarray([r[probe_vector_col] for r in rows], dtype=np.float64)
            probe_t = id_sql_type(probes, probe_id_col)
        metric = self.metric
        if metric == "cosine":
            pn = np.linalg.norm(P, axis=1)
            pn[pn == 0] = 1.0
            P = P / pn[:, None]
        p2 = (P * P).sum(axis=1)[:, None] if metric == "euclidean" else None

        def kernel(it: Iterator[tuple]) -> Iterator[tuple]:
            for ids, M, extra in it:
                if pre_filter is not None:
                    ex = extra or {}
                    mask = np.asarray(
                        pre_filter(ex.get("__orig_id__", ids), ex),
                        dtype=bool,
                    )
                    if not mask.any():
                        continue
                    ids, M = ids[mask], M[mask]
                    if extra and "__sqnorm__" in extra:
                        extra = dict(extra)
                        extra["__sqnorm__"] = extra["__sqnorm__"][mask]
                # GEMM over corpus-row STRIPS with a running exact top-k
                # merge, never the full (Q, n) distance matrix: at 1M rows
                # a single-shot kernel allocates ~750 MB of transients per
                # task, and 32 tasks first-touching ~24 GB of fresh pages
                # cost a measured 80s on this host's first search (vs 1.5s
                # warm).  Strips keep the task's transient at Q×TILE_ROWS
                # (~32 MB) — measured faster than the single shot even
                # warm, with NO cold-start spike, and the exact
                # (distance ASC, id ASC) order is preserved because a
                # global top-k element is always in its strip's top-k.
                acc = None
                for s in range(0, M.shape[0], TILE_ROWS):
                    Ms = M[s:s + TILE_ROWS]
                    S = P @ Ms.T  # (Q, strip)
                    if metric == "cosine":
                        D = 1.0 - S
                    elif metric == "dot":
                        D = -S
                    else:
                        v2 = extra["__sqnorm__"][s:s + TILE_ROWS]
                        D = np.sqrt(
                            np.maximum(p2 + v2[None, :] - 2.0 * S, 0.0)
                        )
                    part = _row_topk(D, ids[s:s + TILE_ROWS], k)
                    acc = part if acc is None else _merge_candidates(
                        [acc, part], k
                    )
                yield acc

        Q = len(probe_ids)
        cands = self.rdd.mapPartitions(kernel)
        if merge == "tree":
            Dk, Ik = cands.treeReduce(
                lambda a, b: _merge_candidates([a, b], k), depth=2
            )
        else:
            parts = cands.collect()
            if not parts:  # pre_filter can empty every block
                Dk = np.full((Q, 0), np.inf)
                Ik = np.full((Q, 0), -1, dtype=np.int64)
            else:
                Dk, Ik = _merge_candidates(parts, k)
        res = _result_df(
            self.spark, probe_ids, Dk, Ik, probe_id_col, self.id_col,
            probe_t, "long" if self._decode is not None else self.id_sql_type,
        )
        if self._decode is not None:
            # restore string ids: the (Q×k) result broadcasts; the mapping
            # scans once, distributed — never collected
            res = (
                self._decode.join(
                    F.broadcast(res.withColumnRenamed(self.id_col, "__rid64")),
                    "__rid64",
                )
                .select(probe_id_col, self.id_col, "distance", "score", "rank")
            )
        return res

    def unpersist(self) -> None:
        for p in self._parts:
            p.unpersist()


class ResidentIVF:
    """Resident IVF: blocks are grouped by centroid list (hash-partitioned
    on centroid_id at build), and a search computes GEMMs only for the
    lists its probes route to — the resident sibling of
    ivf_search_persisted's partition-pruned parquet scan.  Routing and
    assignment reuse the attested IVF rules (deterministic_centroids +
    max-cosine / lowest-id ties), so results match ivf_knn for the same
    (n_centroids, n_probe)."""

    def __init__(self, spark, rdd, crows, id_col, vector_col, id_sql_type,
                 decode=None):
        self.spark = spark
        self.rdd = rdd
        self.crows = crows
        self.id_col = id_col
        self.vector_col = vector_col
        self.id_sql_type = id_sql_type
        self._decode = decode

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        n_centroids: int = 64,
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        n_partitions: int | None = None,
    ) -> "ResidentIVF":
        kind = _id_kind(corpus, id_col)
        from fusionspark.operators.ann import (
            _assign_from_rows,
            _collect_centroids,
            deterministic_centroids,
        )
        from fusionspark.operators.knn import id_sql_type

        id_t = id_sql_type(corpus, id_col)
        decode = None
        block_id = id_col
        if kind == "string":
            # centroid selection + assignment key on the int64 surrogates
            # for string-keyed corpora (deterministic: xxhash64 of content)
            corpus, decode = _encode_string_ids(corpus, id_col)
            block_id = "__rid64"
        crows = _collect_centroids(
            deterministic_centroids(corpus, n_centroids, block_id, vector_col)
        )
        assigned = _assign_from_rows(
            corpus.select(block_id, vector_col), crows, vector_col
        )
        n_parts = n_partitions or min(
            n_centroids, corpus.sparkSession.sparkContext.defaultParallelism
        )
        # hash-partition whole lists together so a probe's n_probe lists
        # touch at most n_probe partitions
        placed = assigned.repartition(n_parts, "centroid_id")

        def to_blocks(it: Iterator) -> Iterator[dict]:
            by_cid: dict[int, list] = {}
            for r in it:
                by_cid.setdefault(r["centroid_id"], []).append(r)
            if by_cid:
                yield {
                    cid: _block_of(rows, block_id, vector_col, "cosine")
                    for cid, rows in by_cid.items()
                }

        rdd = placed.rdd.mapPartitions(to_blocks).persist(
            StorageLevel.MEMORY_ONLY
        )
        rdd.count()
        return cls(
            corpus.sparkSession, rdd, crows, id_col, vector_col, id_t, decode
        )

    def search(
        self,
        probes: DataFrame,
        k: int = 10,
        n_probe: int = 8,
        probe_id_col: str = "probe_id",
        probe_vector_col: str = "probe_embedding",
    ) -> DataFrame:
        """Probes route to their n_probe max-cosine lists (driver-side,
        same fold as _route_probes); each partition scores only its routed
        lists.  Unrouted (probe, partition) slots pad with +inf distance, so
        the merge is the same rectangular fold as the exact index."""
        from fusionspark.operators.knn import id_sql_type

        rows = probes.select(probe_id_col, probe_vector_col).collect()
        probe_ids = [r[probe_id_col] for r in rows]
        probe_t = id_sql_type(probes, probe_id_col)
        P = np.asarray([r[probe_vector_col] for r in rows], dtype=np.float64)
        pn = np.linalg.norm(P, axis=1)
        pn[pn == 0] = 1.0
        Pn = P / pn[:, None]
        Q = len(probe_ids)

        # driver-side routing: same scoring rule as _route_probes (max
        # cosine, ties to lower centroid_id), vectorized across probes with
        # the SAME left-to-right float64 fold per element — `acc = acc +
        # P[:,i]*c_i` is elementwise, so each probe sees the identical
        # operation sequence as the per-probe Python fold
        n_c = len(self.crows)
        cids = np.asarray([c[0] for c in self.crows], dtype=np.int64)
        cnorms = np.asarray([c[2] for c in self.crows])
        d = P.shape[1]
        acc = np.zeros(Q)
        for i in range(d):
            acc = acc + P[:, i] * P[:, i]
        pnorm = np.sqrt(acc)
        sims = np.empty((Q, n_c))
        for j, (_cid, cvec, _cn) in enumerate(self.crows):
            accj = np.zeros(Q)
            for i in range(d):
                accj = accj + P[:, i] * cvec[i]
            denom = pnorm * cnorms[j]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims[:, j] = np.where(denom > 0, accj / denom, 0.0)
        arr = np.empty((Q, n_c), dtype=[("s", "f8"), ("c", "i8")])
        arr["s"] = -sims
        arr["c"] = cids
        arr.sort(axis=1, order=["s", "c"])
        best = arr["c"][:, : min(n_probe, n_c)]
        routing: dict[int, list[int]] = {}
        for qi in range(Q):
            for cid in best[qi]:
                routing.setdefault(int(cid), []).append(qi)
        routing = {cid: np.asarray(qis) for cid, qis in routing.items()}

        def kernel(it: Iterator[dict]) -> Iterator[tuple]:
            for blocks in it:
                Dk = np.full((Q, k), np.inf)
                Ik = np.full((Q, k), -1, dtype=np.int64)
                touched = False
                for cid, (ids, Vn, _) in blocks.items():
                    qis = routing.get(cid)
                    if qis is None:
                        continue
                    touched = True
                    D = 1.0 - Pn[qis] @ Vn.T
                    dsel, isel = _row_topk(D, ids, k)
                    kk = dsel.shape[1]
                    sub_d = np.concatenate([Dk[qis], dsel], axis=1)
                    sub_i = np.concatenate([Ik[qis], isel], axis=1)
                    arr = np.empty(sub_d.shape, dtype=[("d", "f8"), ("i", "i8")])
                    arr["d"] = sub_d
                    arr["i"] = sub_i
                    arr.sort(axis=1, order=["d", "i"])
                    Dk[qis] = arr["d"][:, :k]
                    Ik[qis] = arr["i"][:, :k]
                if touched:
                    yield Dk, Ik

        parts = self.rdd.mapPartitions(kernel).collect()
        if not parts:
            Dk = np.full((Q, k), np.inf)
            Ik = np.full((Q, k), -1, dtype=np.int64)
        else:
            Dk, Ik = _merge_candidates(parts, k)
        res = _result_df(
            self.spark, probe_ids, Dk, Ik, probe_id_col, self.id_col,
            probe_t, "long" if self._decode is not None else self.id_sql_type,
        )
        if self._decode is not None:
            res = (
                self._decode.join(
                    F.broadcast(res.withColumnRenamed(self.id_col, "__rid64")),
                    "__rid64",
                )
                .select(probe_id_col, self.id_col, "distance", "score", "rank")
            )
        return res

    def unpersist(self) -> None:
        self.rdd.unpersist()
