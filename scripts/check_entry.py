"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on
the same sf dir, compare row count, column names, and order-insensitive
values (doubles rounded to 9 before hashing, mirroring a tolerant
value-hash).

Usage: python scripts/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from invertedindexbuilder_spark.session import get_spark

    spark = get_spark(app_name="check-entry", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    t_sweep = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0]}")
            failures.append(name)
            continue
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"schema {list(g.columns)} != {list(w.columns)}")
        if not status:
            if not g.equals(w):
                neq = (g != w).any(axis=1)
                ex = pd.concat(
                    [g[neq].head(3).add_prefix("g_"), w[neq].head(3).add_prefix("w_")],
                    axis=1,
                )
                status.append(f"values differ on {int(neq.sum())} rows\n{ex}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(g)} rows ({time.time()-t0:.1f}s)")

    print()
    print(f"sweep wall time: {time.time() - t_sweep:.1f}s "
          f"({len([n for n in qs if not only or n in only])} gates)")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all entries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
