"""Interleaved A/B of post-shuffle width at a scale decade.

Evidence behind the r5 width policy (docs/SCALING.md): sf<=0.2 runs
width 1 (tens-of-MB shuffles / 100-200MB rule), sf10 runs width 32
(q21 10.7s->5.9s vs width 8; 64 regresses on task overhead). Interleaved
tags + min-of-2 per (query, width) make the comparison valid on a host
whose throughput swings ~40% on minute timescales.

Usage: PYTHONPATH=/root/repo python tools/ab_width.py  (needs the sf10
dataset at /tmp/flumedb_testdata_sf10 — tools/make_scale_data.py)
"""

import time, os
os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"
from flumedb_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark("ab_width_sf10", cpus=32)
spark.conf.set("spark.sql.adaptive.enabled", "true")
qs = entry.queries()
sf10 = "/tmp/flumedb_testdata_sf10"
qs["o7_since"](spark, sf10).collect()
from flumedb_spark.catalog import TABLES
for t in TABLES:
    spark.catalog.cacheTable(t); spark.table(t).count()

NAMES = ["q3_top_revenue_orders", "q5_region_revenue", "q9_product_profit", "q21_waiting_suppliers"]
res = {}
for tag in ("8", "32", "64", "8", "32", "64"):
    spark.conf.set("spark.sql.shuffle.partitions", tag)
    prep = {n: qs[n](spark, sf10) for n in NAMES}
    for n in NAMES:
        t0 = time.perf_counter(); prep[n].count()
        dt = time.perf_counter() - t0
        res[(n, tag)] = min(res.get((n, tag), float("inf")), dt)
for n in NAMES:
    print(n, {tag: round(res[(n, tag)], 2) for tag in ("8", "32", "64")})
