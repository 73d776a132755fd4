"""Distributed bulk append (`ParquetLog.bulk_append_df`) — the scale
write path: executors write seq-assigned parquet, the driver commits the
manifest ONCE. O1/O2 semantics (append visibility, atomic batch,
README.md:142-149) must hold identically to the driver-side appender.
"""

import json

import pytest
from pyspark.sql import functions as F

from flumedb_spark.log import OffsetLog, ParquetLog
from flumedb_spark.sources.readers import append_df_to_log


def test_bulk_million_rows_dense(spark, tmp_path):
    """>=1M rows through a Spark job: dense contiguous seqs, since
    reflects the batch on return, no row touched the driver."""
    log = ParquetLog(str(tmp_path / "log"))
    df = spark.range(1_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    last = append_df_to_log(log, df, order_by="k")
    assert last == 999_999  # dense seqs 0..N-1
    assert log.since == last  # O1: visible by return time
    out = log.df(spark)
    assert out.count() == 1_000_000
    # dense + gap-free: count == max-min+1 and distinct == count
    agg = out.agg(
        F.min("seq").alias("lo"), F.max("seq").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.n) == (0, 999_999, 1_000_000)
    # order_by contract: seq order == key order
    mism = out.select(
        "seq", F.get_json_object("value", "$.k").cast("long").alias("k")
    ).where(F.col("seq") != F.col("k"))
    assert mism.count() == 0


def test_bulk_order_and_values_roundtrip(spark, tmp_path):
    log = ParquetLog(str(tmp_path / "log"))
    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], "k int, s string"
    )
    append_df_to_log(log, df, order_by="k")
    rows = log.df(spark).orderBy("seq").collect()
    assert [json.loads(r.value)["s"] for r in rows] == ["a", "b", "c"]
    # a second bulk batch continues the seq sequence
    append_df_to_log(log, spark.createDataFrame([(9, "z")], "k int, s string"))
    assert log.since == 3
    assert log.get(spark, 3)["value"]["s"] == "z"


def test_bulk_offset_log_frame_arithmetic(spark, tmp_path):
    """OffsetLog bulk path: seq deltas must equal frame sizes
    (16 + utf8 len), exactly as the driver-side appender assigns them —
    and mixing bulk and driver appends keeps offsets contiguous."""
    log = OffsetLog(str(tmp_path / "log"))
    vals = [{"s": "x" * n} for n in (1, 5, 2)]
    df = spark.createDataFrame([(json.dumps(v, sort_keys=True),) for v in vals], "value string")
    log.bulk_append_df(df)
    rows = log.df(spark).orderBy("seq").collect()
    seqs = [r.seq for r in rows]
    assert seqs[0] == 0
    for i in range(len(rows) - 1):
        frame = len(rows[i].value.encode("utf-8")) + OffsetLog.FRAME_OVERHEAD
        assert seqs[i + 1] - seqs[i] == frame
    # driver-side append after a bulk batch: next offset is contiguous
    prev_last_frame = len(rows[-1].value.encode("utf-8")) + OffsetLog.FRAME_OVERHEAD
    next_seq = log.append({"s": "tail"})
    assert next_seq == seqs[-1] + prev_last_frame


def test_bulk_empty_and_atomic_visibility(spark, tmp_path):
    log = ParquetLog(str(tmp_path / "log"))
    empty = spark.createDataFrame([], "value string")
    assert log.bulk_append_df(empty) == -1
    assert log.since == -1
    # all-or-nothing: after one bulk commit every row is visible at once
    log.bulk_append_df(spark.createDataFrame([("a",), ("b",)], "value string"))
    assert log.since == 1
    assert log.df(spark).count() == 2


def test_bulk_then_compact_then_append(spark, tmp_path):
    """Compaction rewrites bulk-written files like any manifest entries;
    subsequent appends stay contiguous and reads see one consistent
    log."""
    log = ParquetLog(str(tmp_path / "log"))
    log.bulk_append_df(
        spark.range(500).select(F.to_json(F.struct("id")).alias("value"))
    )
    log.append([{"id": 9000 + i} for i in range(5)])
    n_files = log.compact(spark, target_rows_per_file=200)
    assert n_files >= 3  # 505 rows / 200-per-file target
    assert log.since == 504
    out = log.df(spark)
    assert out.count() == 505
    # post-compaction append continues the dense sequence
    assert log.append({"id": 1}) == 505
    assert log.df(spark).count() == 506


def test_bulk_and_driver_writers_equivalent(spark, tmp_path):
    """The distributed bulk path and the driver-side appender produce
    IDENTICAL log contents for the same input order (same seqs, same
    stored values) — the writers are interchangeable."""
    vals = [{"k": i, "s": f"v{i}"} for i in range(200)]
    a = ParquetLog(str(tmp_path / "a"))
    a.append(vals)
    b = ParquetLog(str(tmp_path / "b"))
    encoded = [(b.codec.encode(v),) for v in vals]
    b.bulk_append_df(spark.createDataFrame(encoded, "value string"))
    ra = [(r.seq, r.value) for r in a.df(spark).orderBy("seq").collect()]
    rb = [(r.seq, r.value) for r in b.df(spark).orderBy("seq").collect()]
    assert ra == rb
    assert a.since == b.since


@pytest.mark.parametrize("cls", [ParquetLog, OffsetLog], ids=["dense", "offset"])
def test_bulk_then_stream_range(spark, tmp_path, cls):
    """stream_df over a bulk-written log: range/reverse/limit semantics
    are backend-independent (the bulk files are ordinary manifest
    entries)."""
    log = cls(str(tmp_path / "log"))
    df = spark.range(100).select(F.to_json(F.struct("id")).alias("value"))
    log.bulk_append_df(df)
    seqs = [r.seq for r in log.df(spark).orderBy("seq").collect()]
    got = log.stream_df(spark, gt=seqs[9], lte=seqs[19], seqs=True, values=False)
    assert [r.seq for r in got.collect()] == seqs[10:20]
    top3 = log.stream_df(spark, reverse=True, limit=3).collect()
    assert [r.seq for r in top3] == seqs[-1:-4:-1]
