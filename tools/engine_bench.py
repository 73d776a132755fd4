"""Engine-level throughput bench — the reference's actual operation
profile (append / view fold / gated read / range scan / rebuild), which
is what "matches-or-beats the reference's single-node throughput" means
for a log+views engine.

Prints one JSON line with rows/sec + latency metrics. Not the driver's
BENCH (that's bench.py); this is supplementary evidence.

Usage: python tools/engine_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = 10_000

    from flumedb_spark import Flume, NativeStats, get_spark
    from flumedb_spark.views.hashtable import Hashtable
    from flumedb_spark.views.level import Level

    spark = get_spark("engine_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32)
    root = tempfile.mkdtemp(prefix="flume_bench_")
    db = Flume(os.path.join(root, "db"), spark=spark)

    # ---- append throughput (driver-side commit path, no Spark job) ----
    rows = [{"k": i % 500, "v": float(i % 1000) / 7.0} for i in range(batch)]
    t0 = time.perf_counter()
    for _ in range(n_rows // batch):
        db.append(rows)
    append_s = time.perf_counter() - t0
    assert db.since == n_rows - 1

    # ---- view backfill (late registration => full fold) ---------------
    t0 = time.perf_counter()
    db.use("stats", NativeStats(1, field="v"))
    db.stats.ready()
    stats_backfill_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    db.use("idx", Level(1, key_expr="array(get_json_object(value, '$.k'))", key_type="long"))
    db.idx.ready()
    index_backfill_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    db.use("latest", Hashtable(1, key_expr="get_json_object(value, '$.k')", key_type="long"))
    db.latest.ready()
    ht_backfill_s = time.perf_counter() - t0

    # ---- read latencies ----------------------------------------------
    t0 = time.perf_counter()
    db.append({"k": 1, "v": 2.0})
    _ = db.stats.get()  # gated: includes the incremental fold
    append_read_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = db.get(n_rows // 2)
    point_get_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scan = db.stream_df(gt=n_rows // 4, lte=n_rows // 4 + 50_000).count()
    range_scan_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    hits = db.idx.get(123)
    idx_get_s = time.perf_counter() - t0

    # ---- full rebuild (all views, concurrent backfills) ---------------
    t0 = time.perf_counter()
    db.rebuild()
    rebuild_s = time.perf_counter() - t0

    # ---- distributed bulk append (executors write, 1 manifest commit) -
    from pyspark.sql import functions as F

    from flumedb_spark.sources.readers import append_df_to_log

    bulk_df = spark.range(n_rows).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
    )
    t0 = time.perf_counter()
    append_df_to_log(db.log, bulk_df, order_by="k")
    bulk_s = time.perf_counter() - t0

    # ---- custom streaming source catch-up (Arrow-batch reads) ---------
    from flumedb_spark.sources.flumelog_source import stream_log_custom

    src_counts: list[int] = []
    t0 = time.perf_counter()
    q = (
        stream_log_custom(spark, db.log)
        .writeStream.option("checkpointLocation", os.path.join(root, "ckpt_src"))
        .foreachBatch(lambda b, _e: src_counts.append(b.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src_s = time.perf_counter() - t0

    # ---- maintenance: compact the commit files + vacuum tombstones ----
    n_files_before = len(db.log._load_meta()["files"])
    t0 = time.perf_counter()
    n_files_after = db.log.compact(spark)
    compact_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_vacuumed = db.log.vacuum(older_than_seconds=0)
    vacuum_s = time.perf_counter() - t0
    total_rows = db.since + 1

    # ---- OCC commit overhead: VersionedLog vs the flock'd base path ---
    from flumedb_spark.log import VersionedLog

    vlog = VersionedLog(os.path.join(root, "vlog"))
    occ_batches = max(1, n_rows // batch // 2)
    t0 = time.perf_counter()
    for _ in range(occ_batches):
        vlog.append(rows)
    occ_s = time.perf_counter() - t0
    assert vlog.since == occ_batches * batch - 1

    db.close()
    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "append_rows_per_sec": round(n_rows / append_s),
                "stats_backfill_sec": round(stats_backfill_s, 3),
                "index_backfill_sec": round(index_backfill_s, 3),
                "hashtable_backfill_sec": round(ht_backfill_s, 3),
                "append_plus_gated_read_sec": round(append_read_s, 3),
                "point_get_sec": round(point_get_s, 3),
                "range_scan_50k_sec": round(range_scan_s, 3),
                "range_scan_rows": scan,
                "index_point_get_sec": round(idx_get_s, 3),
                "index_hits": len(hits),
                "rebuild_all_views_sec": round(rebuild_s, 3),
                "bulk_append_rows_per_sec": round(n_rows / bulk_s),
                "stream_source_rows_per_sec": round(sum(src_counts) / src_s),
                "stream_source_rows": sum(src_counts),
                "compact_rows_per_sec": round(total_rows / compact_s),
                "compact_files": [n_files_before, n_files_after],
                "vacuum_files_per_sec": round(n_vacuumed / vacuum_s)
                if n_vacuumed
                else 0,
                "occ_append_rows_per_sec": round(occ_batches * batch / occ_s),
            }
        )
    )


if __name__ == "__main__":
    main()
