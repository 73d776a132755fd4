"""Live-tail option composition + since observables (VERDICT r2 item 6).

Reference contracts: `stream` options `lt/gt/lte/gte/reverse/live/limit`
compose (README.md:133: a live stream emits the existing range, then
keeps emitting new appends); `db.since` / `flumeview.since` are
OBSERVABLES consumers subscribe to (index.js:142, README.md:135-140,
README.md:220-223) — not just polled properties.
"""

import threading
import time

import pytest

from flumedb_spark.engine import Flume
from flumedb_spark.views.reduce import NativeStats


@pytest.fixture()
def db(spark, tmp_log_dir):
    d = Flume(tmp_log_dir + "/log", spark=spark)
    yield d
    if not d.closed:
        d.close()


def test_live_gte_prefix_then_tail(db):
    db.append([{"foo": i} for i in range(5)])
    gen = db.stream(live=True, gte=2)
    # bounded prefix: existing records in [2..4] arrive first, in order
    prefix = [next(gen) for _ in range(3)]
    assert [p["value"]["foo"] for p in prefix] == [2, 3, 4]
    # then the tail: a later append flows through the SAME stream
    db.append({"foo": 99})
    nxt = next(gen)
    assert nxt["value"]["foo"] == 99 and nxt["seq"] == 5


def test_live_upper_bound_with_concurrent_appends(db):
    db.append([{"foo": i} for i in range(3)])  # seqs 0,1,2

    def writer():
        time.sleep(0.2)
        db.append([{"foo": 10}, {"foo": 11}, {"foo": 12}])  # seqs 3,4,5

    t = threading.Thread(target=writer)
    t.start()
    items = list(db.stream(live=True, gt=0, lte=4, poll_interval=0.01))
    t.join()
    # prefix (1,2) + tail (3,4); 5 is beyond the bound and never emitted
    assert [i["seq"] for i in items] == [1, 2, 3, 4]


def test_live_limit_truncates(db):
    db.append([{"foo": i} for i in range(10)])
    items = list(db.stream(live=True, limit=4, poll_interval=0.01))
    assert [i["seq"] for i in items] == [0, 1, 2, 3]


def test_live_reverse_still_raises(db):
    with pytest.raises(ValueError):
        db.stream(live=True, reverse=True)


def test_log_since_observable(db):
    seen: list[int] = []
    db.append({"foo": 0})
    unsub = db.on_since(seen.append)
    assert seen == [0]  # immediate fire with the current value
    db.append({"foo": 1})
    db.append([{"foo": 2}, {"foo": 3}])
    assert seen == [0, 1, 3]  # one fire per committed append
    unsub()
    db.append({"foo": 4})
    assert seen == [0, 1, 3]  # unsubscribed: no further fires


def test_bulk_append_fires_since_observable(db, spark):
    from pyspark.sql import functions as F

    from flumedb_spark.sources.readers import append_df_to_log

    seen: list[int] = []
    db.on_since(seen.append, immediate=False)
    df = spark.range(10).select(F.col("id").alias("k"))
    append_df_to_log(db.log, df, order_by="k")
    assert seen == [9]  # exactly one fire for the atomic bulk commit


def test_view_since_observable(db):
    db.use("stats", NativeStats(1, field="foo"))
    seen: list[int] = []
    db.stats.on_since(seen.append)
    start = list(seen)
    db.append({"foo": 1})
    db.stats.get()  # gated read forces the fold
    assert seen[-1] == db.since and len(seen) > len(start)


def test_commit_before_publish_invariant(tmp_log_dir):
    """The in-memory watermark must never run ahead of the durable
    manifest: at the moment _commit_meta writes, `since` still reads the
    last COMMITTED value. (The violated form of this invariant let a
    bounded live tail observe head=N, scan the stale manifest, and
    terminate without the rows.)"""
    from flumedb_spark.log import ParquetLog

    log = ParquetLog(tmp_log_dir + "/log")
    log.append({"a": 1})  # since=0 committed
    seen = {}
    orig = ParquetLog._commit_meta

    def spy(self, meta=None):
        seen["since_at_commit"] = self.since
        orig(self, meta)

    log._commit_meta = spy.__get__(log)
    log.append({"a": 2})
    assert seen["since_at_commit"] == 0  # not yet published at commit time
    assert log.since == 1  # published after the durable write


def test_refresh_since_sees_other_instances(tmp_log_dir):
    """Cross-process visibility: a second log handle's snapshot is
    stale until refresh_since reloads the committed manifest — the hook
    the live tail polls."""
    from flumedb_spark.log import ParquetLog

    a = ParquetLog(tmp_log_dir + "/log")
    b = ParquetLog(tmp_log_dir + "/log")
    a.append({"x": 0})
    assert b.ready_since() == 0
    a.append({"x": 1})
    assert b.ready_since() == 0  # committed snapshot, not live
    assert b.refresh_since() == 1
