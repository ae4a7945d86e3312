"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB (same parquet views), then compares row count, column names,
and order-insensitive values.  Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from fusionspark.session import get_spark  # noqa: E402
from fusionspark.io import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            col = col.apply(
                lambda v: tuple(np.round(np.asarray(v, dtype=float), 6))
                if isinstance(v, (list, np.ndarray))
                else v
            )
        elif np.issubdtype(col.dtype, np.floating):
            # +0.0 collapses IEEE -0.0 (Spark round() emits +0.0 where
            # DuckDB keeps -0.0; bitwise-different, numerically equal)
            col = col.round(6) + 0.0
        elif np.issubdtype(col.dtype, np.datetime64):
            col = col.astype("datetime64[us]")
        out[c] = col
    ndf = pd.DataFrame(out)
    return ndf.sort_values(by=list(ndf.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns {sc} vs {dc}")
        return problems
    for c in sc:
        a, b = spark_pdf[c].dtype, duck_pdf[c].dtype
        if str(a) != str(b):
            problems.append(f"dtype {c}: {a} vs {b}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(a[c].dtype, np.floating):
                bad = ~(np.isclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True))
            else:
                bad = ~(pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv)))
                bad = np.asarray(bad)
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(f"col {c}: {int(bad.sum())} mismatches, first at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]
    spark = get_spark("fusionspark-check")
    con = duck_connection(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
