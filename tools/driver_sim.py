"""Driver simulation — exercises the exact external surface the verify
driver uses: import __spark_entry__, build a *plain* SparkSession (none of
our engine confs), run entry() at sf0.001, then every queries() entry at
sf0.01 compared against oracle_sql() via DuckDB.

Usage: python tools/driver_sim.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import frame_tokens  # same canonicalization as pytest


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows  sample={rows[0] if rows else None}")
    assert len(rows) > 0

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{name}.parquet')")

    queries, oracles = e.queries(), e.oracle_sql()
    if only is not None:
        missing = only - set(queries)
        if missing:
            print(f"--only names not in registry: {sorted(missing)}")
            return 1
        queries = {n: q for n, q in queries.items() if n in only}
    n_pass = n_fail = 0
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  ~ {name}: no oracle, rows={len(sdf)} "
                      f"({time.perf_counter()-t0:.2f}s)")
                n_pass += 1
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
                  f"({time.perf_counter()-t0:.2f}s)"
                  + ("" if ok else f"  ROWS_OK={ok_rows} COLS_OK={ok_cols}"))
            n_pass += ok
            n_fail += not ok
        except Exception as ex:
            print(f"  ✗ {name}: EXception {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"driver_sim: {n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
