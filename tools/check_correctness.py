"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized to strings).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from gis_shapefile_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            df[c] = s.map(lambda v: f"{v:.9g}")
        else:
            df[c] = s.astype(str)
    rows = ["\x1f".join(r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g", "spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        ns, cs, hs = canon(sdf)
        no, co, ho = canon(odf)
        ok = (ns == no) and (cs == co) and (hs == ho)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status}  {name}: spark {ns} rows / oracle {no} rows, "
              f"cols {'=' if cs == co else f'{cs} vs {co}'}, "
              f"hash {'=' if hs == ho else f'{hs} vs {ho}'} [{t_spark:.1f}s]")
        if not ok and ns and no:
            scols = sorted(sdf.columns)
            a = sdf[scols].sort_values(scols).head(3)
            b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).head(3)
            print("  spark head:", a.to_dict("records"))
            print("  oracle head:", b.to_dict("records"))
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
