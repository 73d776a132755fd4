"""Replicate bench.py's _batched_interleaved for a section (default:
the TPC-H sweep) so the batched ratio can be profiled and A/B'd outside
a full bench run (guide §1; VERDICT-r10 #3).

Usage: python tools/ab_batched.py [--sf-dir DIR] [--passes N]
           [--threads N] [--section tpch|headline] [--width W]
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
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--section", default="tpch")
    ap.add_argument("--width", default="1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from flumedb_spark.session import get_spark
    import __spark_entry__ as entry
    import bench as B

    names = {"tpch": B.TPCH, "headline": B.HEADLINE, "extras": B.EXTRAS}[args.section]

    spark = get_spark("ab_batched", cpus=cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entry.queries()
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    qs["o7_since"](spark, args.sf_dir).collect()
    from flumedb_spark.catalog import TABLES

    B._narrow_dims(spark)
    for t in TABLES:
        spark.catalog.cacheTable(t)
        spark.table(t).count()
    spark.conf.set("spark.sql.shuffle.partitions", args.width)

    con, ducks = B._duck_connect(args.sf_dir, cpus, names)
    usable = [n for n in names if n in ducks]
    res = B._batched_interleaved(
        lambda name: qs[name](spark, args.sf_dir), usable, con,
        passes=args.passes, threads=args.threads,
    )
    print(f"spark passes:  {res.get('spark')}")
    print(f"duck seq:      {res.get('duckdb')}")
    print(f"duck conc:     {res.get('duckdb_concurrent')}")
    print(f"ratios:        {res.get('ratio')}  median={res.get('ratio_median')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
