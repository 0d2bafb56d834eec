"""Run a subset of queries() entries against their oracles — fast inner
loop while developing a new operator (driver_sim runs the whole surface).

Usage: python tools/quick_check.py [--sf SF_DIR] name [name ...]
       python tools/quick_check.py --prefix ml_
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import frame_tokens


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--prefix", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from pyspark.sql import SparkSession
    from rtdl_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    names = list(args.names)
    if args.prefix:
        names += [n for n in sorted(queries) if n.startswith(args.prefix)]
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("quick_check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')")

    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            if name not in oracles:
                print(f"  ~ {name}: no oracle, rows={len(sdf)} "
                      f"({time.perf_counter() - t0:.2f}s)")
                continue
            ddf = con.sql(oracles[name]).fetchdf()
            ok_rows = len(sdf) == len(ddf)
            ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
            s = frame_tokens(list(sdf.columns),
                             list(sdf.itertuples(index=False, name=None)))
            d = frame_tokens(list(ddf.columns),
                             list(ddf.itertuples(index=False, name=None)))
            ok = ok_rows and ok_cols and s == d
            print(f"  {'✓' if ok else '✗'} {name}: rows={len(sdf)} "
                  f"({time.perf_counter() - t0:.2f}s)"
                  + ("" if ok else f"  ROWS_OK={ok_rows} COLS_OK={ok_cols}"))
            if not ok:
                n_fail += 1
                if ok_rows and ok_cols:
                    diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                    for a, b in diff:
                        print(f"      spark={a}\n      duck ={b}")
                else:
                    print(f"      spark cols={sorted(sdf.columns)}")
                    print(f"      duck  cols={sorted(ddf.columns)}")
        except Exception as ex:
            print(f"  ✗ {name}: EXC {type(ex).__name__}: {ex}")
            n_fail += 1
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
