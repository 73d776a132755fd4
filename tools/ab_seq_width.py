"""Interleaved A/B: post-shuffle width for the sf0.1 SEQUENTIAL pass
and the TPC-H BATCHED DAG (VERDICT-r5 #3/#4 attribution).

Round-5 context: the bench runs width 1 at sf<=0.2 — A/B'd to favor the
batched DAG (-30%) with heavy sequential queries flat-or-faster. The r5
driver artifact then showed the sequential ratio drifting 3.01->3.24
while batched improved, with near-uniform per-query drift — consistent
with host noise OR with the width-1 policy taxing the sequential shape.
This tool attributes it the only valid way on this host (~40% CPU
swings on minute timescales): same-process, interleaved width sweeps,
min per (query, width).

Usage: PYTHONPATH=/root/repo python tools/ab_seq_width.py
"""

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flumedb_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from bench import HEADLINE, TPCH, _batched_submission, _narrow_dims  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDTHS = ("1", "8")
ROUNDS = 3

spark = get_spark("ab_seq_width", cpus=32)
spark.conf.set("spark.sql.adaptive.enabled", "false")
qs = entry.queries()

# load exactly like bench.py: ingest, narrow dims, cache
qs["o7_since"](spark, SF_DIR).collect()
from flumedb_spark.catalog import TABLES  # noqa: E402

_narrow_dims(spark)
for t in TABLES:
    spark.catalog.cacheTable(t)
    spark.table(t).count()

seq: dict = {}
tpch_batched: dict = {}
for r in range(ROUNDS):
    for w in WIDTHS:
        spark.conf.set("spark.sql.shuffle.partitions", w)
        # re-create plans so the width is baked into fresh physical plans
        prep = {n: qs[n](spark, SF_DIR) for n in HEADLINE}
        for n in HEADLINE:
            if r == 0:
                prep[n].count()  # warm codegen for this width's shape
            t0 = time.perf_counter()
            prep[n].count()
            dt = time.perf_counter() - t0
            seq[(n, w)] = min(seq.get((n, w), float("inf")), dt)
        tprep = {n: qs[n](spark, SF_DIR) for n in TPCH}
        b = _batched_submission(tprep, TPCH)
        if b is not None:
            tpch_batched[w] = min(tpch_batched.get(w, float("inf")), b)
    print(f"# round {r} done", file=sys.stderr)

print("== sequential per-query (min of %d interleaved) ==" % ROUNDS)
tot = {w: 0.0 for w in WIDTHS}
for n in HEADLINE:
    row = {w: round(seq[(n, w)], 4) for w in WIDTHS}
    for w in WIDTHS:
        tot[w] += seq[(n, w)]
    delta = (seq[(n, "8")] - seq[(n, "1")]) / seq[(n, "1")] * 100
    print(f"{n:32s} {row}  w8 vs w1: {delta:+.0f}%")
print("TOTALS:", {w: round(tot[w], 3) for w in WIDTHS})
print("== tpch batched DAG ==", {w: round(v, 3) for w, v in tpch_batched.items()})
