"""Split per-query time into CONSTRUCT (building the DataFrame —
parse/analyze + any eager construction jobs) vs EXECUTE (count()) under
bench.py's benched-SF serving state (guide §1: measure first; VERDICT-
r10 #3/#5 ask for exactly this split on the TPC-H sweep and the extras
outliers).

Usage: python tools/profile_construct.py [--sf-dir DIR] [--width W]
           [--passes N] [--cold] q1 q2 ...

--cold: warm each query at sf0.001 only (the driver's load-phase shape)
        and report the FIRST sf-dir pass separately from the best of
        the remaining passes — isolates first-pass codegen cost.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--width", default="1")
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from flumedb_spark.session import get_spark
    import __spark_entry__ as entry
    from bench import _narrow_dims

    spark = get_spark("profile_construct", cpus=cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entry.queries()
    # load-phase analogue: warm every target at sf0.001
    for name in args.queries:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
    qs["o7_since"](spark, args.sf_dir).collect()
    from flumedb_spark.catalog import TABLES

    _narrow_dims(spark)
    for t in TABLES:
        spark.catalog.cacheTable(t)
        spark.table(t).count()
    spark.conf.set("spark.sql.shuffle.partitions", args.width)

    for name in args.queries:
        cons: list[float] = []
        ex: list[float] = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            ex.append(t2 - t1)
        if args.cold:
            rest_c = min(cons[1:]) if len(cons) > 1 else float("nan")
            rest_e = min(ex[1:]) if len(ex) > 1 else float("nan")
            print(
                f"{name}: first construct={cons[0]:.3f} exec={ex[0]:.3f} | "
                f"warm construct={rest_c:.3f} exec={rest_e:.3f}"
            )
        else:
            print(
                f"{name}: construct={min(cons):.3f} exec={min(ex):.3f} "
                f"(all c={['%.3f' % c for c in cons]} e={['%.3f' % e for e in ex]})"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
