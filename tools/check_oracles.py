"""Local replica of the driver's correctness gate: run each __spark_entry__
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the same sf dir,
compare row count, schema shape, and an order-insensitive value hash with columns
sorted by name. Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from lmw_tree_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf):6d} rows  {time.time()-t0:5.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} DUCKDB ERROR: {str(e)[:200]}")
            continue
        a, b = norm(sdf), norm(odf)
        status = []
        if len(a) != len(b):
            status.append(f"ROWS {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"COLS {list(a.columns)} vs {list(b.columns)}")
        if not status:
            if a.equals(b):
                status = ["OK"]
            else:
                neq = (a != b).any(axis=1)
                status = [f"VALUES differ in {int(neq.sum())}/{len(a)} rows"]
                ex = a[neq].head(2), b[neq].head(2)
                print("  spark:", ex[0].to_dict("records"))
                print("  duck :", ex[1].to_dict("records"))
        ok = status == ["OK"]
        if not ok:
            failures.append(name)
        print(f"{name:24s} {'; '.join(status):40s} {len(a):6d} rows  {time.time()-t0:5.1f}s")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
