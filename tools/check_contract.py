"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count + sorted
column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from trajlib_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"row count {len(sdf)} vs oracle {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        return errs
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                # Byte-exact, like the driver's value hash: -0.0 != +0.0 and
                # NaN payloads must match bit-for-bit.  `==` would hide both.
                af = av.astype(np.float64)
                bf = bv.astype(np.float64)
                eq = af.view("u8") == bf.view("u8")
                nan_note = np.isnan(af) & np.isnan(bf) & ~eq
                if nan_note.any():
                    errs.append(f"column {c}: {int(nan_note.sum())} NaN bit-pattern mismatches")
            else:
                eq = av == bv
            bad = int((~eq).sum())
            if bad:
                k = int(np.flatnonzero(~eq)[0])
                errs.append(f"column {c}: {bad} value mismatches (byte-exact), first at row {k}: {av[k]!r} vs {bv[k]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import os
    os.environ.setdefault(
        "SPARK_GRAFT_ORACLE_SF", sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows): " + "; ".join(errs))
        else:
            print(f"OK   {name}: {len(sdf)} rows match  ({time.time()-t0:.1f}s)")
    # entry smoke
    if not only:
        n = E.entry(spark).count()
        print(f"entry(): {n} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
