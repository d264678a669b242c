"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB over the same parquet tables; compare row count, column names,
and order-insensitive values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from minhash_rs_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) | (abs(av - bv) < 1e-9)).all()
        else:
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            i = bad[bad].index[0]
            return (f"VALUES col={c} first diff row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return "MATCH"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", master="local[16]", shuffle_partitions=16)
    con = duck_conn(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK ERROR: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows, "
                  f"cols={list(sdf.columns)} ({dt:.1f}s)")
            if len(sdf) == 0:
                print(f"{name:28s} WARNING: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        print(f"{name:28s} {verdict} ({len(sdf)} rows, {dt:.1f}s)")
        if verdict != "MATCH":
            failures += 1
    spark.stop()
    print(f"\n{'ALL MATCH' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
