"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row counts, column names, and
order-insensitive values. Usage: python scripts/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sparkgraph.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        got = fn(spark, sf_dir).toPandas()
        t_spark = time.monotonic() - t0
        if name not in osql:
            print(f"  {name:32s} rows-only: {len(got):6d} rows   ({t_spark:.1f}s spark)")
            continue
        t0 = time.monotonic()
        want = con.execute(osql[name]).df()
        t_duck = time.monotonic() - t0
        g, w = normalize(got), normalize(want)
        status, detail = "OK", ""
        if list(g.columns) != list(w.columns):
            status, detail = "SCHEMA-MISMATCH", f"spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(g)} duck={len(w)}"
        else:
            for c in g.columns:
                gv, wv = g[c].to_numpy(), w[c].to_numpy()
                if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                    if not np.allclose(gv.astype(float), wv.astype(float), atol=0, rtol=0, equal_nan=True):
                        md = float(np.nanmax(np.abs(gv.astype(float) - wv.astype(float))))
                        status, detail = "VALUE-MISMATCH", f"col={c} maxdiff={md:g}"
                        break
                elif not (gv == wv).all():
                    n_bad = int((gv != wv).sum())
                    status, detail = "VALUE-MISMATCH", f"col={c} bad={n_bad}"
                    break
        if status != "OK":
            failures += 1
        print(f"  {name:32s} {status:18s} {len(g):6d} rows  ({t_spark:.1f}s spark / {t_duck:.1f}s duck) {detail}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:] or None))
