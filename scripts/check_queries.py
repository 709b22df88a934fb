"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables; compare row count, column names, and order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from feapder_spark.session import get_spark

    spark = get_spark("check_queries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time() - t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            continue
        s, d = normalize(sdf), normalize(ddf)
        status = "OK"
        if list(s.columns) != list(d.columns):
            status = f"COLS spark={list(s.columns)} duck={list(d.columns)}"
        elif len(s) != len(d):
            status = f"ROWS spark={len(s)} duck={len(d)}"
        elif not s.equals(d):
            neq = (s != d) & ~(s.isna() & d.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            status = f"VALUES differ in {bad_cols}"
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                status += f" | {c}[{i}]: spark={s[c][i]!r} duck={d[c][i]!r}"
        tag = "ok   " if status == "OK" else "FAIL "
        if status != "OK":
            failures.append(name)
        print(f"{tag}{name}: {len(s)} rows  ({time.time() - t0:.1f}s)  {'' if status == 'OK' else status}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match" if not only else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
