"""Change-data-capture / lakehouse-merge operators.

The reference mutates collections in place one call at a time
(`HNSWIndex.js:196` Map.set, `engine delete`); at 100 TB the same
semantics arrive as CHANGE STREAMS — ordered I/U/D records that must be
compacted into current state (CDC apply / MERGE INTO) or unfolded into
queryable history (SCD type 2).  These are the declarative forms:

- `cdc_latest` / `cdc_apply`: last-writer-wins compaction of a changelog
  (one shuffle on the key, ROW_NUMBER over the sequence — the Hudi/Delta
  "latest snapshot" read path).
- `scd2_history`: slowly-changing-dimension type 2 — every change opens a
  version, the next change (including a delete) closes it; `lead()` over
  the same key partitioning, so Catalyst reuses one sort for both windows.
- `merge_upsert`: MERGE INTO base USING updates — update matched, insert
  unmatched — as a full-outer join.  A FULL OUTER join cannot broadcast
  (every partition must see both sides' unmatched rows), so the scale
  layout is a bucketed base (io.write_bucketed): then only the
  batch-sized updates side shuffles and the base never moves — the
  Delta/Hudi MERGE write path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Latest change record per key (last-writer-wins by the sequence
    column, which must be totally ordered per key — a commit LSN, a
    Kafka offset, an event id)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact a changelog into final state: keep each key's latest
    record, drop keys whose latest op is a delete.  Equivalent to
    replaying the log through the reference's per-call Map.set/delete —
    in one shuffle."""
    latest = cdc_latest(changes, key_cols, seq_col)
    return latest.filter(F.col(op_col) != delete_op)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """SCD type-2 unfold: each non-delete change opens a version valid
    from its timestamp until the NEXT change of the same key (deletes
    close the prior version but emit no row); the final open version is
    `is_current`.  Version numbers count surviving rows per key.

    Both windows share the key partitioning + sequence sort, so the plan
    pays ONE Exchange and one sort."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    h = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .filter(F.col(op_col) != delete_op)
        .withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return h.drop(ts_col)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """MERGE INTO base USING updates ON keys: matched rows take every
    shared non-key column from `updates` (SET c = u.c — an explicit NULL
    in the update wins, like SQL MERGE), unmatched update rows insert,
    unmatched base rows carry through.  Adds an `action` column
    ('U' updated / 'I' inserted / 'K' kept).

    Plan shape: FULL OUTER is never broadcastable, so this is a key
    shuffle join — over a bucketed base only the updates side exchanges
    (asserted in test_cdc); co-partitioning is the merge story at scale."""
    keys = list(key_cols)
    non_key = [c for c in base.columns if c not in keys]
    u_cols = [c for c in updates.columns if c not in keys]
    # side markers, NOT value-column null probes: a legitimately-NULL
    # attribute must not flip the action classification
    b = base.withColumn("__b", F.lit(1))
    u = updates.withColumn("__u", F.lit(1))
    merged = b.alias("b").join(u.alias("u"), keys, "full_outer")
    out_cols = [F.col(c) for c in keys]
    for c in non_key:
        if c in u_cols:
            out_cols.append(
                F.when(F.col("u.__u").isNotNull(), F.col(f"u.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"b.{c}").alias(c))
    action = (
        F.when(F.col("u.__u").isNotNull() & F.col("b.__b").isNotNull(), "U")
        .when(F.col("b.__b").isNull(), "I")
        .otherwise("K")
    )
    return merged.select(*out_cols, action.alias("action"))
