"""Manifest-commit table (storage/manifest.py): snapshot isolation,
concurrent writers, copy-on-write deletes, time travel, vacuum — the
VERDICT r2 'ACID table semantics' item."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from fusionspark.storage import ManifestTable

SCHEMA = "id string, v long"


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("id"), F.col("id").alias("v")
    )


def test_append_read_history_timetravel(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    assert t.version() == 0 and t.read().count() == 0

    v1 = t.append(_rows(spark, 0, 10))
    v2 = t.append(_rows(spark, 10, 30))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 30
    # time travel: each snapshot stays readable as committed
    assert t.read(version=1).count() == 10
    assert t.read(version=0).count() == 0

    ops = [h["op"] for h in t.history()]
    assert ops == ["create", "append", "append"]


def test_concurrent_appends_no_lost_updates(spark, tmp_path):
    """Racing writers: every append must land exactly once (losers of the
    atomic manifest-create retry on top of the winner's snapshot)."""
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    n_writers, per = 6, 5
    errs = []

    def write(i):
        try:
            ManifestTable(spark, str(tmp_path / "t")).append(
                _rows(spark, i * per, (i + 1) * per)
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=write, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errs
    assert t.version() == n_writers
    got = sorted(int(r["id"]) for r in t.read().collect())
    assert got == list(range(n_writers * per))


def test_delete_where_is_file_level_cow(spark, tmp_path):
    """A selective delete rewrites ONLY the files containing hits; the
    other appends' files carry over by reference (same relative paths)."""
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(4):
        t.append(_rows(spark, i * 100, (i + 1) * 100))
    before = set(t._manifest(t.version())["files"])

    t.delete_where(F.col("v") < 100)  # hits only the first append's files
    after = set(t._manifest(t.version())["files"])

    assert t.read().count() == 300
    assert sorted(int(r["v"]) for r in t.read().collect()) == list(range(100, 400))
    carried = before & after
    # 3 of 4 appends untouched: their files survive by reference
    assert len(carried) >= len(before) * 3 // 4
    # no-hit delete commits a no-op version without touching files
    v = t.delete_where(F.col("v") > 10_000)
    assert set(t._manifest(v)["files"]) == after


def test_overwrite_and_vacuum(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_rows(spark, 0, 50))
    t.overwrite(_rows(spark, 1000, 1010))
    assert sorted(int(r["v"]) for r in t.read().collect()) == list(range(1000, 1010))

    # default retention spares the just-written (unreferenced but YOUNG)
    # files — they could belong to an in-flight writer about to commit
    assert t.vacuum(keep_versions=1) == 0
    removed = t.vacuum(keep_versions=1, retain_seconds=0)
    assert removed > 0  # the overwritten append's files are unreferenced
    assert t.read().count() == 10  # latest snapshot intact


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE keeps every row the predicate is NOT TRUE for: a row where
    the predicate evaluates to NULL must survive even when it lives in a
    file that is rewritten for co-located true-matching rows (ADVICE r3:
    filter(~predicate) alone drops NULL rows from the survivors)."""
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 200)], "id string, v long"
    ).coalesce(1)  # one file → the NULL row is co-located with the hit
    t.append(df)

    t.delete_where(F.col("v") < 100)  # NULL < 100 is NULL, not a hit

    kept = sorted(r["id"] for r in t.read().collect())
    assert kept == ["b", "c"]


def test_upsert_is_one_atomic_commit(spark, tmp_path):
    """upsert = copy-on-write removal + append in ONE manifest version: no
    window where the id is missing, and the history shows a single 'upsert'
    op rather than delete+append."""
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_rows(spark, 0, 10))
    v_before = t.version()

    new = spark.createDataFrame([("5", 500), ("99", 99)], SCHEMA)
    v = t.upsert(new, F.col("id").isin(["5", "99"]))

    assert v == v_before + 1  # exactly one commit
    assert t.history()[-1]["op"] == "upsert"
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got["5"] == 500 and got["99"] == 99
    assert len(got) == 11  # 10 originals − 1 replaced + 1 new


def test_engine_manifest_storage_end_to_end(spark, tmp_path):
    """FusionSparkEngine(storage='manifest'): insert / search / delete /
    forget work unchanged, deletes commit new versions instead of renaming
    directories."""
    from fusionspark.engine import CollectionConfig, FusionSparkEngine

    eng = FusionSparkEngine(
        spark, str(tmp_path / "eng"), storage="manifest"
    )
    eng.create_collection("docs", CollectionConfig(dimensions=8))
    eng.insert(
        "docs",
        [
            {"id": f"d{i}", "vector": [float(i)] * 8, "content": f"doc {i}",
             "tenant_id": "a" if i % 2 else "b"}
            for i in range(10)
        ],
    )
    assert eng._load("docs").count() == 10

    hits = eng.search("docs", query_vector=[1.0] * 8, top_k=3)
    assert len(hits) == 3

    eng.delete("docs", ["d0", "d1"])
    assert eng._load("docs").count() == 8
    # tenant-scoped delete keeps the other tenant's row with a listed id
    eng.delete("docs", ["d2", "d3"], tenant_id="a")
    ids = {r["id"] for r in eng._load("docs").collect()}
    assert "d3" not in ids and "d2" in ids

    eng.remember("agent-1", "likes spark", importance=0.9)
    eng.remember("agent-2", "likes duckdb", importance=0.9)
    eng.forget("agent-1")
    mem = eng._load("_memory_episodic")
    assert mem.filter(F.col("tenant_id") == "agent-1").count() == 0
    assert mem.filter(F.col("tenant_id") == "agent-2").count() == 1

    t = eng._table("docs")
    assert [h["op"] for h in t.history()][0] == "create"
    assert t.version() >= 3
    # engine-level maintenance passthroughs
    assert eng.history("docs") == t.history()
    assert eng.vacuum("docs", keep_versions=1) >= 0
    assert eng._load("docs").count() == 7  # latest snapshot intact post-vacuum


def test_manifest_random_op_sequences_match_model(spark, tmp_path):
    """Model check: any sequence of append/overwrite/delete_where/vacuum
    leaves the table equal to a plain in-memory model of the same ops."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 3)),
            st.tuples(st.just("overwrite"), st.integers(0, 3)),
            st.tuples(st.just("delete_lt"), st.integers(0, 400)),
            st.tuples(st.just("vacuum"), st.just(0)),
        ),
        min_size=1, max_size=5,
    )
    counter = {"n": 0}

    @given(seq=ops)
    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(seq):
        counter["n"] += 1
        path = str(tmp_path / f"t{counter['n']}")
        t = ManifestTable.create(spark, path, SCHEMA)
        model: set[int] = set()
        block = 0
        for op, arg in seq:
            if op == "append":
                lo = 1000 * block + 100 * arg
                t.append(_rows(spark, lo, lo + 20))
                model |= set(range(lo, lo + 20))
                block += 1
            elif op == "overwrite":
                lo = 1000 * block + 100 * arg
                t.overwrite(_rows(spark, lo, lo + 20))
                model = set(range(lo, lo + 20))
                block += 1
            elif op == "delete_lt":
                t.delete_where(F.col("v") < arg)
                model = {v for v in model if not v < arg}
            else:
                t.vacuum(keep_versions=1)
        assert {int(r["v"]) for r in t.read().collect()} == model

    run()


def test_compact_collapses_small_files(spark, tmp_path):
    """OPTIMIZE: many per-transaction small files → one right-sized file,
    same rows, committed as a version; vacuum then reclaims the olds."""
    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(5):
        t.append(_rows(spark, i * 10, (i + 1) * 10))
    n_before = len(t._manifest(t.version())["files"])
    assert n_before >= 5

    v = t.compact(target_file_rows=1000)
    m = t._manifest(v)
    assert m["op"] == "compact" and m["rows"] == 50
    assert len(m["files"]) == 1
    assert sorted(int(r["v"]) for r in t.read().collect()) == list(range(50))
    assert t.vacuum(keep_versions=1, retain_seconds=0) >= n_before


def test_compact_cluster_by_gives_file_skipping_ranges(spark, tmp_path):
    """Range-clustered compaction: each output file covers a disjoint value
    range (parquet min/max stats skip files on point/range filters)."""
    import pyarrow.parquet as pq

    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    # interleaved appends so pre-compact files all span the full range
    for i in range(4):
        t.append(_rows(spark, i, 400 + i).filter((F.col("v") % 4) == i))
    v = t.compact(target_file_rows=100, cluster_by=["v"])
    m = t._manifest(v)
    assert m["op"] == "compact" and len(m["files"]) >= 3

    ranges = []
    for rel in m["files"]:
        md = pq.read_metadata(f"{t.path}/{rel}")
        vi = [c for c in range(md.num_columns)
              if md.schema.column(c).name == "v"][0]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(vi).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # disjoint, ordered coverage: every file's max < next file's min
    assert all(a_max < b_min for (_, a_max), (b_min, _) in zip(ranges, ranges[1:]))
    assert t.read().count() == 400


def test_compact_racing_appends_lose_no_rows(spark, tmp_path):
    """The compact docstring's race claim, exercised: appends running
    concurrently with a compaction all survive — whichever commit wins a
    version, the loser retries onto the winner's snapshot."""
    import threading

    t = ManifestTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(4):
        t.append(_rows(spark, i * 10, (i + 1) * 10))
    errs = []

    def appender(i):
        try:
            ManifestTable(spark, str(tmp_path / "t")).append(
                _rows(spark, 1000 + i * 10, 1000 + (i + 1) * 10)
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def compactor():
        try:
            ManifestTable(spark, str(tmp_path / "t")).compact(target_file_rows=1000)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=compactor))
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errs
    got = sorted(int(r["v"]) for r in t.read().collect())
    assert got == list(range(40)) + list(range(1000, 1030))
    assert "compact" in [h["op"] for h in t.history()]
