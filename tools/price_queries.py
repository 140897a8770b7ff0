"""Measure per-query warm-min wall time at a given SF (bench-pricing
helper for BENCH/BASELINE.md's measured-ranges tables).

Usage: python tools/price_queries.py [sf_dir] query [query ...]

Runs each named ``__spark_entry__.queries()`` entry once cold (warm-up;
this sandbox's first-touch page faults are ~25x slower) then reports the
min of 3 warm reps — the same estimator bench.py's entries use. Keep the
host QUIET (CLAUDE.md): every number here measures whatever else runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from gis_shapefile_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        print("usage: price_queries.py [sf_dir] query [query ...]")
        return 2
    spark = get_spark(
        extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = E.queries()
    print(f"# sf_dir={sf_dir} loadavg_start={os.getloadavg()}")
    for name in names:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).count()
            reps.append(time.time() - t0)
        print(
            f"{name}: warm_min={min(reps):.2f}s cold={cold:.2f}s "
            f"reps={[f'{t:.2f}' for t in reps]} loadavg={os.getloadavg()}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
