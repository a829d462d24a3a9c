"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry in Spark AND its oracle_sql() twin in DuckDB
on the same parquet tables, then compare row count, schema, and values
(column-name-sorted, row-sorted, exact-or-1e-9).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
       python tools/check_contract.py [sf_dir] --window
           replay exactly the driver's verified window (the first 50
           registered rows, contract._PRIORITY) — the pre-round gate.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources.catalog import TABLES


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].map(_canon_cell)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Canonical dtype class mirroring the driver's dtype-sensitive hash:
    integer vs float vs bool vs other. A Spark int64 column whose oracle
    twin comes back float64 (e.g. DuckDB HUGEINT from sum(BIGINT) OVER ())
    hash-mismatches at the driver even when values are numerically equal,
    so the local gate must treat it as FAIL, not 1e-9-close."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"row count {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    s, o = normalize(sdf), normalize(odf)
    for col in s.columns:
        a, b = s[col], o[col]
        ca, cb = _dtype_class(a), _dtype_class(b)
        if ca != cb:
            return False, (
                f"col {col} DTYPE MISMATCH: spark {a.dtype} ({ca}) vs "
                f"oracle {b.dtype} ({cb}) — driver hash would differ"
            )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            an = a.astype(float).to_numpy()
            bn = b.astype(float).to_numpy()
            both_nan = np.isnan(an) & np.isnan(bn)
            close = np.isclose(an, bn, rtol=0, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                return False, f"col {col} value diff at row {i}: {an[i]!r} vs {bn[i]!r}"
            exact = (an == bn) | both_nan
            if not exact.all():
                i = int(np.argmin(exact))
                return True, f"NONEXACT col {col} row {i}: {an[i]!r} vs {bn[i]!r} (within 1e-9)"
        else:
            av = a.astype(object).where(pd.notna(a), None).tolist()
            bv = b.astype(object).where(pd.notna(b), None).tolist()
            if av != bv:
                for i, (x, y) in enumerate(zip(av, bv)):
                    if x != y:
                        return False, f"col {col} row {i}: {x!r} vs {y!r} (dtypes {a.dtype}/{b.dtype})"
    return True, "exact"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if "--window" in sys.argv[2:]:
        from rclip_server_spark.contract import _PRIORITY

        only = set(_PRIORITY)
    else:
        only = set(sys.argv[2:])
    spark = get_spark(cpus=16)
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows, schema {list(sdf.columns)} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, odf)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        print(f"{status} {name}: {len(sdf)} rows, {msg} ({time.time()-t0:.1f}s)")
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(only) if only else len(qs)} in {time.time()-t_all:.0f}s"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
