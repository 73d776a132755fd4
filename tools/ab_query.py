"""Targeted per-query timing for optimization A/Bs (guide §1).

Times the named catalog queries min-of-N under the SAME serving state
bench.py uses for the given SF (AQE policy, post-shuffle width, cached
tables, narrowed dims), constructing the DataFrame inside the timed
region each pass (the bench's honesty rule) and consuming with
count(). Prints one line per query.

Usage:
    python tools/ab_query.py [--sf-dir DIR] [--passes N] [--noop] q1 q2 ...

`--noop` times `.write.format("noop")` instead of count() (guide §1.4)
— use to check that count()'s column pruning is not hiding work.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--width", default=None, help="override post-shuffle width")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import re

    m = re.search(r"sf([0-9.]+)$", os.path.basename(args.sf_dir.rstrip("/")))
    sf_guess = float(m.group(1)) if m else 1.0
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from flumedb_spark.session import get_spark
    import __spark_entry__ as entry
    from bench import _narrow_dims

    spark = get_spark("ab_query", cpus=cpus)
    # bench.py serving state per SF
    if sf_guess <= 0.2:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        width = args.width or "8"
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        width = args.width or ("8" if sf_guess <= 2 else str(min(cpus, 32)))
    qs = entry.queries()
    qs["o7_since"](spark, args.sf_dir).collect()
    from flumedb_spark.catalog import TABLES

    _narrow_dims(spark)
    for t in TABLES:
        spark.catalog.cacheTable(t)
        spark.table(t).count()
    spark.conf.set("spark.sql.shuffle.partitions", width)

    def consume(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"ab:{name} warm")
        consume(qs[name](spark, args.sf_dir))  # warm codegen
        best = float("inf")
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"ab:{name} pass{p}")
            t0 = time.perf_counter()
            consume(qs[name](spark, args.sf_dir))
            best = min(best, time.perf_counter() - t0)
        print(f"AB {name}: {best:.4f}s (min of {args.passes}, width={width}, sf={sf_guess})")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
