"""OffsetLog — byte-offset seq backend parity (`flumelog-offset`,
`test/offset.js:1-12`). The reference proves backend-agnosticism by
re-running its whole memlog suite over the offset log; this suite runs
the same engine behaviors (append/gate/stream/views/rebuild/reopen)
over OffsetLog seqs."""

import json

from flumedb_spark.engine import Flume
from flumedb_spark.log import OffsetLog
from flumedb_spark.views.level import Level
from flumedb_spark.views.reduce import Reduce


def sum_foo(a, i):
    return (a or 0) + i["foo"]


def test_offsets_are_frame_arithmetic(tmp_log_dir):
    log = OffsetLog(tmp_log_dir + "/log")
    values = [{"foo": 1}, {"foo": 22, "pad": "x" * 50}, {"foo": 3}]
    seqs = [log.append(v) for v in values]
    assert seqs[0] == 0  # first frame starts at byte 0
    for i in range(1, 3):
        framed = len(json.dumps(values[i - 1], sort_keys=True).encode()) + OffsetLog.FRAME_OVERHEAD
        assert seqs[i] - seqs[i - 1] == framed
    assert log.since == seqs[-1]


def test_offsets_contiguous_across_reopen(tmp_log_dir):
    log = OffsetLog(tmp_log_dir + "/log")
    s0 = log.append({"a": 1})
    s1 = log.append({"a": 2})
    log2 = OffsetLog(tmp_log_dir + "/log")
    s2 = log2.append({"a": 3})
    # same value encoding as record 1 -> same frame delta, no gap/overlap
    assert s2 - s1 == s1 - s0
    assert log2.ready_since() == s2


def test_engine_suite_runs_on_offset_backend(spark, tmp_log_dir):
    """The full append -> gated read -> stream -> rebuild cycle must be
    seq-format agnostic (README.md:138-140: format is backend-defined)."""
    db = Flume(OffsetLog(tmp_log_dir + "/log"), spark=spark)
    db.use("sum", Reduce(1, sum_foo))
    db.use("idx", Level(1, key_fn=lambda v: [v["k"]]))

    seqs = [db.append({"foo": i, "k": f"k{i}"}) for i in range(5)]
    assert seqs == sorted(seqs) and len(set(seqs)) == 5
    assert db.sum.get() == 10  # gated read catches up over offset seqs

    # point get addresses by byte offset
    assert db.get(seqs[2])["foo"] == 2
    # range stream between offsets
    mid = [r["value"]["foo"] for r in db.stream(gt=seqs[0], lte=seqs[3])]
    assert mid == [1, 2, 3]
    # per-item meter stays exact without dense-seq arithmetic
    assert db.idx.get("k0")[0]["value"]["foo"] == 0
    assert db.idx.meta["items"] == 5

    db.rebuild()
    assert db.sum.get() == 10
    assert db.idx.meta["items"] == 10  # re-delivery re-counted
    db.close()

    # reopen-resume on the same backend
    db2 = Flume(OffsetLog(tmp_log_dir + "/log"), spark=spark)
    db2.use("sum", Reduce(1, sum_foo))
    assert db2.sum.get() == 10
    db2.close()
