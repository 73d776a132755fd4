"""Late-data semantics: watermarks actually drop too-late events in
append mode (the prompt's 'watermarks + windowed aggs for late data' —
exercised with controlled event times, not wall clock)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_batch(dir_, name, rows):
    # rows: list[(event_time_epoch_s, v)]
    table = pa.Table.from_pydict(
        {
            "ts": pa.array(
                [int(t * 1_000_000) for t, _ in rows], pa.timestamp("us", tz="UTC")
            ),
            "v": pa.array([v for _, v in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dir_, name))


def test_watermark_drops_late_rows(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    base = 1_699_999_980  # minute-aligned epoch: windows start at base + 60k

    # batch 1: events in windows [0,60) and [60,120) relative to base
    _write_batch(src_dir, "b1.parquet", [(base + 10, 1), (base + 70, 2), (base + 500, 3)])

    stream = (
        spark.readStream.schema("ts timestamp, v long").option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .select(F.unix_timestamp("w.start").alias("start_s"), "n", "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is now base+500 - 120 = base+380: windows before it are closed
        # batch 2: one on-time row (recent) and one LATE row in the long-closed first window
        _write_batch(src_dir, "b2.parquet", [(base + 560, 10), (base + 15, 99)])
        q.processAllAvailable()
        # flush: advance event time far ahead so every window closes
        _write_batch(src_dir, "b3.parquet", [(base + 10_000, 0)])
        q.processAllAvailable()
        rows = {r.start_s - base: (r.n, r.s) for r in spark.sql("SELECT * FROM wm_out").collect()}
        # the late v=99 row must NOT appear: window [0,60) emitted with only v=1
        assert rows[0] == (1, 1)
        assert rows[60] == (1, 2)
        assert rows[480] == (1, 3)
        assert rows[540] == (1, 10)  # on-time row counted
    finally:
        q.stop()
