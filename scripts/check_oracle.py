#!/usr/bin/env python
"""Local mirror of the driver's t2 gate: run every __spark_entry__
query AND its DuckDB oracle, compare row count / schema / values
(order-insensitive).  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from mondrian_rest_spark.sources.registry import TABLES, build_session  # noqa: E402


def duck_frame(con, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    issues = []
    if len(sdf) != len(ddf):
        issues.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        issues.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return issues
    a, b = canon(sdf), canon(ddf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    neq = ~((av.isna() & bv.isna()) |
                            ((av - bv).abs() <= 1e-12 + 1e-9 * bv.abs()))
                else:
                    neq = ~((av.isna() & bv.isna()) | (av == bv))
            except Exception as e:  # dtype mismatch etc.
                issues.append(f"col {c}: compare error {e} "
                              f"(spark {av.dtype} vs duck {bv.dtype})")
                continue
            n = int(neq.sum())
            if n:
                i = neq.idxmax()
                issues.append(f"col {c}: {n} mismatches, e.g. row {i}: "
                              f"spark={av[i]!r} duck={bv[i]!r}")
            elif str(av.dtype) != str(bv.dtype):
                issues.append(f"col {c}: dtype spark={av.dtype} duck={bv.dtype} "
                              f"(values equal)")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} ({spark_t:.1f}s) [rows-only, no oracle]")
            continue
        t0 = time.time()
        try:
            ddf = duck_frame(con, oracles[name])
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        issues = compare(name, sdf, ddf)
        if issues:
            failed.append(name)
            print(f"FAIL {name}: rows={len(sdf)}  " + " | ".join(issues))
        else:
            print(f"PASS {name}: rows={len(sdf)} "
                  f"(spark {spark_t:.1f}s, duck {time.time() - t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
