"""CDC / lakehouse-merge query family (operators/cdc.py).

The changelog is derived deterministically from the events table
(signup → I, error → D, everything else → U; sequence = event_id, which
the generator assigns in timestamp order), so both engines replay the
identical I/U/D stream.  The merge batch is derived from the customer
table by a fixed modulus rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import cdc
from fusionspark.queries import query

_CHANGELOG_SQL = """
ch AS (
    SELECT user_id, event_id AS seq, ts,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error' THEN 'D'
                           ELSE 'U' END AS op,
           value
    FROM events
)
"""


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    return e.select(
        "user_id",
        F.col("event_id").alias("seq"),
        "ts",
        op.alias("op"),
        "value",
    )


@query(
    "cdc_apply",
    f"""
    WITH {_CHANGELOG_SQL},
    latest AS (
        SELECT user_id, seq, op, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
        FROM ch
    )
    SELECT user_id, seq AS last_seq, ROUND(value, 6) AS last_value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state: last-writer-wins per key, keys whose
    latest op is a delete vanish (the Hudi/Delta snapshot-read
    compaction).  One shuffle on the key."""
    state = cdc.cdc_apply(_changelog(spark, sf_dir), ["user_id"], "seq")
    return state.select(
        "user_id",
        F.col("seq").alias("last_seq"),
        F.round("value", 6).alias("last_value"),
    )


@query(
    "scd2_history",
    f"""
    WITH {_CHANGELOG_SQL},
    h AS (
        SELECT user_id, seq, op, value,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY seq ASC) AS valid_to
        FROM ch
    )
    SELECT user_id, seq, ROUND(value, 6) AS value,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(valid_to) AS valid_to_us,
           (valid_to IS NULL) AS is_current,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq ASC) AS version
    FROM h WHERE op <> 'D'
    """,
)
def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 unfold of the same changelog: every surviving change is
    a version row [valid_from, valid_to); deletes close the prior version
    but emit nothing.  Both windows share one Exchange + sort."""
    h = cdc.scd2_history(_changelog(spark, sf_dir), ["user_id"], "seq")
    return h.select(
        "user_id",
        "seq",
        F.round("value", 6).alias("value"),
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
        "version",
    )


@query(
    "merge_upsert",
    """
    WITH upd AS (
        SELECT c_custkey, ROUND(c_acctbal + 100.0, 6) AS c_acctbal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000 AS c_custkey, 0.0 AS c_acctbal
        FROM customer WHERE c_custkey % 97 = 3
    )
    SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
           COALESCE(b.c_name, 'NEW') AS c_name,
           ROUND(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                      ELSE b.c_acctbal END, 6) AS c_acctbal,
           CASE WHEN u.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL THEN 'U'
                WHEN b.c_custkey IS NULL THEN 'I'
                ELSE 'K' END AS action
    FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer USING a derived update batch: +100 to every
    7th account, brand-new keys for every 97th — matched rows update,
    new keys insert, the rest carry through.  FULL OUTER can't broadcast,
    so at scale the base is bucketed and only the batch side shuffles
    (plan-asserted in test_cdc)."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    upd = base.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.round(F.col("c_acctbal") + 100.0, 6).alias("c_acctbal")
    )
    ins = base.filter(F.col("c_custkey") % 97 == 3).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
    )
    merged = cdc.merge_upsert(base, upd.unionAll(ins), ["c_custkey"])
    return merged.select(
        "c_custkey",
        F.coalesce("c_name", F.lit("NEW")).alias("c_name"),
        F.round("c_acctbal", 6).alias("c_acctbal"),
        "action",
    )


@query(
    "incremental_rollup",
    """
    SELECT user_id, COUNT(*)::BIGINT AS n_events,
           SUM(floor(value * 1e6)::BIGINT)::BIGINT AS sum_value_micros,
           MIN(epoch_us(ts))::BIGINT AS min_ts_us,
           MAX(epoch_us(ts))::BIGINT AS max_ts_us
    FROM events GROUP BY user_id
    """,
)
def incremental_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-user rollup is
    kept as ALGEBRAIC partials (count / sum / min / max), so a delta
    batch folds in with a merge of two small aggregate tables — the base
    events are NEVER rescanned.  Here the events split 80/20 into
    base + delta by a deterministic rule, each side aggregates
    independently, and the full-outer coalescing merge must equal the
    oracle's direct aggregate over everything — the maintenance
    invariant itself is what's attested.

    Values fold as floor(value·1e6) BIGINT micro-units: exact under ANY
    aggregation order or batch split (a double SUM would drift ulps
    between fold orders and engines — the same order-dependence that
    makes floats unmergeable for exactly-once maintenance).  At 100 TB
    the merge is a tiny agg⋈agg join keyed on the group key; only the
    delta shuffles."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("val_u"),
        F.unix_micros("ts").alias("ts_us"),
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("val_u").alias("s"),
            F.min("ts_us").alias("mn"),
            F.max("ts_us").alias("mx"),
        )

    base = agg(ev.filter(F.col("event_id") % 10 < 8))
    delta = agg(ev.filter(F.col("event_id") % 10 >= 8)).select(
        "user_id",
        F.col("n").alias("n_d"),
        F.col("s").alias("s_d"),
        F.col("mn").alias("mn_d"),
        F.col("mx").alias("mx_d"),
    )
    merged = base.join(delta, "user_id", "full_outer")
    zero = F.lit(0).cast("long")
    return merged.select(
        "user_id",
        (F.coalesce(F.col("n"), zero) + F.coalesce(F.col("n_d"), zero)).alias(
            "n_events"
        ),
        (F.coalesce(F.col("s"), zero) + F.coalesce(F.col("s_d"), zero)).alias(
            "sum_value_micros"
        ),
        F.least(F.col("mn"), F.col("mn_d")).alias("min_ts_us"),
        F.greatest(F.col("mx"), F.col("mx_d")).alias("max_ts_us"),
    )


@query(
    "delta_time_travel",
    """
    WITH base AS (
        SELECT o_orderstatus AS st, o_orderkey % 2 AS odd,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    v0 AS (
        SELECT 0::BIGINT AS version, st AS o_orderstatus,
               COUNT(*)::BIGINT AS n_orders, SUM(cents)::BIGINT AS revenue_cents
        FROM base WHERE odd = 0 GROUP BY st
    ),
    v1 AS (
        SELECT 1::BIGINT, st, COUNT(*)::BIGINT, SUM(cents)::BIGINT
        FROM base GROUP BY st
    ),
    v2 AS (
        SELECT 2::BIGINT, st, COUNT(*)::BIGINT, SUM(cents)::BIGINT
        FROM base WHERE st <> 'F' GROUP BY st
    )
    SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2
    ORDER BY version, o_orderstatus
    """,
)
def delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-format snapshot/time-travel read, oracle-attested end to end
    (storage/delta.py — the r14 interop stretch): commit the even-key
    orders as version 0 of a REAL _delta_log table partitioned by
    o_orderstatus, append the odd keys as version 1, tombstone every
    status-'F' file as version 2, checkpoint the final state, then read
    ALL THREE versions back through the snapshot resolver and aggregate
    exact cent revenue per (version, status).  The oracle predicts each
    snapshot arithmetically from `orders` alone, so a hash match
    certifies commit replay, time travel, file tombstones, partition-
    value re-attachment (the status column is NOT in the data files),
    and checkpoint-state reads (version 2 resolves from the parquet
    checkpoint, versions 0-1 from JSON replay).

    Determinism: one data file per status per commit (hash-repartition
    on the partition column before the partitioned write), so the
    tombstoned CONTENT is exactly the 'F' rows regardless of task
    scheduling; revenue folds exact BIGINT cents.

    Scale: the log replay touches metadata only; each snapshot read is
    an ordinary pruned parquet scan (one relation per partition group).
    The temp-table write is the test fixture, not the measured path —
    same contract as dedup_incremental's persisted index."""
    import shutil
    import tempfile

    from fusionspark.storage.delta import (
        read_delta,
        remove_files,
        resolve_snapshot,
        write_checkpoint,
        write_delta_table,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="fusionspark-delta-")
    t = f"{root}/orders_delta"
    try:
        write_delta_table(
            spark,
            o.filter(F.col("o_orderkey") % 2 == 0).repartition("o_orderstatus"),
            t,
            partition_columns=["o_orderstatus"],
        )
        write_delta_table(
            spark,
            o.filter(F.col("o_orderkey") % 2 == 1).repartition("o_orderstatus"),
            t,
            partition_columns=["o_orderstatus"],
            mode="append",
        )
        snap = resolve_snapshot(spark, t)
        remove_files(
            t,
            sorted(
                p
                for p, pv in snap.files.items()
                if pv.get("o_orderstatus") == "F"
            ),
        )
        write_checkpoint(spark, t)  # version 2 then resolves from parquet
        frames = []
        for v in (0, 1, 2):
            frames.append(
                read_delta(spark, t, version=v)
                .groupBy("o_orderstatus")
                .agg(
                    F.count("*").cast("long").alias("n_orders"),
                    F.sum("cents").cast("long").alias("revenue_cents"),
                )
                .select(
                    F.lit(v).cast("long").alias("version"),
                    "o_orderstatus",
                    "n_orders",
                    "revenue_cents",
                )
            )
        out = frames[0].unionByName(frames[1]).unionByName(frames[2])
        return out.orderBy("version", "o_orderstatus").localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_deletion_vectors",
    """
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    v1 AS (
        SELECT 1::BIGINT AS version, (k % 3)::BIGINT AS grp,
               COUNT(*)::BIGINT AS n_orders, SUM(cents)::BIGINT AS revenue_cents
        FROM base GROUP BY k % 3
    ),
    v3 AS (
        SELECT 3::BIGINT, (k % 3)::BIGINT, COUNT(*)::BIGINT, SUM(cents)::BIGINT
        FROM base WHERE k % 7 <> 0 GROUP BY k % 3
    ),
    v4 AS (
        SELECT 4::BIGINT, (k % 3)::BIGINT, COUNT(*)::BIGINT, SUM(cents)::BIGINT
        FROM base
        WHERE NOT ((k % 2 = 0 AND (k % 7 = 0 OR k % 11 = 0))
                   OR (k % 2 = 1 AND k % 7 = 0))
        GROUP BY k % 3
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v3 UNION ALL SELECT * FROM v4
    ORDER BY version, grp
    """,
)
def delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta deletion-vector reads, oracle-attested end to end
    (storage/dv.py + delta.py — the r15 protocol stretch): commit the
    even-key orders as one data file (version 0) and the odd keys as a
    second (version 1), then soft-delete BY PREDICATE exactly the way
    real DML does — scan the file's native parquet row index for the
    matching rows, write their indexes as a roaring-bitmap deletion
    vector, and commit the remove+add pair (on-disk 'u' DV for the even
    file at version 2, inline 'i' DV for the odd file at version 3,
    then a WIDER replacement DV on the even file at version 4), finally
    checkpointing so version 4 resolves from checkpoint state.  Reading
    versions 1 / 3 / 4 and aggregating exact cent revenue per
    (version, k % 3) matches an oracle that predicts every snapshot
    arithmetically from `orders` alone — certifying the bitmap codec,
    the Z85 path and inline storage forms, descriptor replacement
    semantics, time travel across DV commits, checkpointed DV survival,
    and the broadcast row-index anti-join, none of which the oracle
    shares any code with.

    Determinism: each commit is ONE file sorted by o_orderkey
    (repartition(1) + sortWithinPartitions), but no step depends on the
    order — deletion targets come from a predicate via the row-index
    scan, so the masked CONTENT is exactly the predicate rows under any
    layout.  Scale: DV decode is metadata-sized; the snapshot read
    stays one pruned relation per file group with a broadcast anti-join
    (storage/delta.py::_read_with_dvs).  The temp-table write is the
    fixture, not the measured path — the delta_time_travel contract."""
    import shutil
    import tempfile

    from fusionspark.storage.delta import (
        apply_deletion_vector,
        read_delta,
        resolve_snapshot,
        write_checkpoint,
        write_delta_table,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="fusionspark-delta-dv-")
    t = f"{root}/orders_dv"

    def _mask(rel: str, pred):
        """Real DML shape: row indexes of the predicate rows in `rel`."""
        import os as _os

        rows = (
            spark.read.parquet(_os.path.join(t, rel))
            .select("k", F.col("_metadata.row_index").alias("ri"))
            .filter(pred)
            .collect()
        )
        return sorted(r["ri"] for r in rows)

    try:
        write_delta_table(
            spark,
            o.filter(F.col("k") % 2 == 0)
            .repartition(1)
            .sortWithinPartitions("k"),
            t,
        )
        write_delta_table(
            spark,
            o.filter(F.col("k") % 2 == 1)
            .repartition(1)
            .sortWithinPartitions("k"),
            t,
            mode="append",
        )
        snap = resolve_snapshot(spark, t)
        even_f = next(p for p in sorted(snap.files) if p.startswith("part-00000-"))
        odd_f = next(p for p in sorted(snap.files) if p.startswith("part-00001-"))
        apply_deletion_vector(
            spark, t, even_f, _mask(even_f, F.col("k") % 7 == 0)
        )  # v2
        apply_deletion_vector(
            spark, t, odd_f, _mask(odd_f, F.col("k") % 7 == 0), inline=True
        )  # v3
        apply_deletion_vector(
            spark,
            t,
            even_f,
            _mask(even_f, (F.col("k") % 7 == 0) | (F.col("k") % 11 == 0)),
        )  # v4: REPLACES v2's narrower DV
        write_checkpoint(spark, t)  # v4 then resolves from checkpoint
        frames = []
        for v in (1, 3, 4):
            frames.append(
                read_delta(spark, t, version=v)
                .groupBy((F.col("k") % 3).cast("long").alias("grp"))
                .agg(
                    F.count("*").cast("long").alias("n_orders"),
                    F.sum("cents").cast("long").alias("revenue_cents"),
                )
                .select(
                    F.lit(v).cast("long").alias("version"),
                    "grp",
                    "n_orders",
                    "revenue_cents",
                )
            )
        out = frames[0].unionByName(frames[1]).unionByName(frames[2])
        return out.orderBy("version", "grp").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
