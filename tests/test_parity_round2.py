"""Round-2 parity gaps: since undefined-vs-empty (README.md:197-201),
per-item meta counters (wrap.js:67,74-76), multimodal codec probe."""

from flumedb_spark.engine import Flume
from flumedb_spark.log import ParquetLog
from flumedb_spark.views.level import Level


def test_log_since_undefined_until_loaded(tmp_log_dir):
    """Reference: since is undefined until the log loads its state, -1
    once loaded-and-empty (index.js:151-155 defers reads on the init
    barrier; README.md:197-201)."""
    log = ParquetLog(tmp_log_dir + "/log")
    assert log.since is None  # uninitialized == the reference's undefined
    assert log.ready_since() == -1  # init barrier: loaded, empty
    assert log.since == -1
    log.append({"a": 1})
    assert log.since == 0
    # a second instance over the same dir: undefined again until its own
    # first operation, then the persisted watermark
    log2 = ParquetLog(tmp_log_dir + "/log")
    assert log2.since is None
    assert log2.ready_since() == 0


def test_flume_since_mirrors_init_state(spark, tmp_log_dir):
    db = Flume(tmp_log_dir, spark=spark)
    assert db.since is None  # init race window, visible pre-first-op
    db.append({"x": 1})
    assert db.since == 0
    db.close()


def test_per_item_meters_through_rebuild(spark, tmp_log_dir):
    """View feeds meter delivered ITEMS, not just calls; a rebuild
    re-delivers and re-counts (mirrors test/rebuild.js:21-23 where the
    level view sees all 7 messages again)."""
    db = Flume(tmp_log_dir, spark=spark)
    db.use("idx", Level(1, key_fn=lambda v: [v["k"]]))
    for i in range(7):
        db.append({"k": f"k{i}"})
    db.idx.get("k0")  # gated read folds all 7 through the feed
    assert db.idx.meta["items"] == 7
    db.rebuild()
    assert db.idx.meta["items"] == 14
    db.close()


def test_stream_meters_calls_plus_items(spark, tmp_log_dir):
    """wrap.js bumps the same counter once per call and once per
    delivered item."""
    db = Flume(tmp_log_dir, spark=spark)
    for i in range(5):
        db.append({"x": i})
    before = db.meta["stream"]
    items = db.stream(gt=0)
    assert len(items) == 4
    assert db.meta["stream"] == before + 1 + 4
    db.close()


def test_source_method_meters_calls_plus_items_across_rebuild(spark, tmp_log_dir):
    """O20 on SOURCE-typed view methods (wrap.js:73-77): the reference
    bumps the method's counter once per call AND once per item delivered
    through the returned stream — the last §2.A contract line previously
    covered only on the engine's own feed paths. The returned DataFrame
    is the stream; materializing it delivers the items."""
    db = Flume(tmp_log_dir, spark=spark)
    db.use("idx", Level(1, key_fn=lambda v: [v["k"]]))
    for i in range(5):
        db.append({"k": f"k{i}"})
    rows = db.idx.read(gte="k0").collect()  # source method: Level.read
    assert len(rows) == 5
    assert db.idx.meta["read"] == 1 + 5  # one call + five delivered items
    # lazy transforms delegate; only materializations of the returned
    # frame count (a second consumption re-delivers and re-counts)
    assert db.idx.read(lte="k1").count() == 2
    assert db.idx.meta["read"] == 6 + 1 + 2
    # per-item counts survive a rebuild: the view state is rebuilt, the
    # handle's counters keep accumulating (wrap.js meta lives on the
    # wrapper, not the view)
    db.rebuild()
    assert db.idx.read(gte="k4").collect()[0].key == "k4"
    assert db.idx.meta["read"] == 9 + 1 + 1
    db.close()


# ---------------------------------------------------------------------
# late-round-3 reference-parity review fixes
# ---------------------------------------------------------------------


def test_since_minus_one_bypasses_ready_switch(spark, tmp_path):
    """wrap.js:30-41: the since=-1 branch returns current view state
    immediately and never consults isReady — it must not block on a
    not-yet-ready engine."""
    from flumedb_spark import Flume, Reduce

    db = Flume(str(tmp_path / "db"), is_ready=False, spark=spark)
    db.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    db.append({"v": 5})
    # engine not ready: the opt-out read returns (stale) state NOW
    assert db.sum.get(since=-1) is None  # view has folded nothing yet
    db.set_ready(True)
    assert db.sum.get() == 5
    db.close()


def test_close_during_pending_gated_read_raises(spark, tmp_path):
    """wrap.js:98-112: close() drains waiting readers with an error —
    a blocked gated read must RAISE, never run its catch-up on the
    closed engine and return success."""
    import threading
    import time

    from flumedb_spark import ClosedError, Flume, Reduce

    db = Flume(str(tmp_path / "db2"), is_ready=False, spark=spark)
    db.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    db.append({"v": 1})
    result = {}

    def reader():
        try:
            result["value"] = db.sum.get()
        except ClosedError:
            result["raised"] = True

    t = threading.Thread(target=reader)
    t.start()
    time.sleep(0.3)  # reader is blocked on the ready switch
    db.close()
    t.join(timeout=30)
    assert not t.is_alive()
    assert result.get("raised") and "value" not in result


def test_view_ahead_destroyed_at_use_time(spark, tmp_path):
    """index.js:36-37 runs the view-ahead check in buildView at use():
    a view whose persisted since exceeds the (truncated/replaced) log
    head must be destroyed at registration — since=-1 reads and the
    since property must never expose phantom state."""
    import json
    import os

    from flumedb_spark import Flume, Reduce

    root = str(tmp_path / "db3")
    db = Flume(root, spark=spark)
    db.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    db.append([{"v": 1}, {"v": 2}])
    assert db.sum.get() == 3
    db.close()
    # forge a view that claims to be far ahead of the log
    meta_path = os.path.join(root, "views", "sum", "meta.json")
    meta = json.load(open(meta_path))
    meta["since"] = 100
    json.dump(meta, open(meta_path, "w"))
    db2 = Flume(root, spark=spark)
    db2.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    # destroyed AT USE: the phantom watermark is gone before any read
    assert db2.sum.since == -1
    assert db2.sum.get(since=-1) is None  # no phantom accumulator
    assert db2.sum.get() == 3  # gated read rebuilds from the log
    db2.close()


def test_since_zero_is_full_gate(spark, tmp_path):
    """wrap.js:42 treats after=0 as falsy: since=0 falls through to the
    full head gate (there is no wait-for-seq-0 in the reference API)."""
    from flumedb_spark import Flume, Reduce

    db = Flume(str(tmp_path / "db4"), spark=spark)
    db.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    db.append([{"v": 1}, {"v": 2}, {"v": 3}])
    assert db.sum.get(since=0) == 6  # full gate, not fold-to-seq-0
    db.close()


def test_live_stream_throws_on_closed(spark, tmp_path):
    """index.js:149-151: stream (live included) throws after close."""
    import pytest as _pytest

    from flumedb_spark import ClosedError, Flume

    db = Flume(str(tmp_path / "db5"), spark=spark)
    db.append({"v": 1})
    db.close()
    with _pytest.raises(ClosedError):
        db.stream(live=True)


def test_view_meta_preinitialized_and_nested(spark, tmp_path):
    """wrap.js:135 + index.js:185: every method counter is 0 before the
    first call and the view's meta is linked into the engine's."""
    from flumedb_spark import Flume, Reduce

    db = Flume(str(tmp_path / "db6"), spark=spark)
    db.use("sum", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    assert db.sum.meta["get"] == 0  # pre-initialized, no KeyError
    assert db.meta["sum"] is db.sum.meta  # linked (index.js:185)
    db.append({"v": 2})
    assert db.sum.get() == 2
    assert db.meta["sum"]["get"] == 1
    db.close()


def test_per_view_close(spark, tmp_path):
    """wrap.js:107-115: a single view can be closed while the engine
    stays open; subsequent calls on that handle raise."""
    import pytest as _pytest

    from flumedb_spark import ClosedError, Flume, Reduce

    db = Flume(str(tmp_path / "db7"), spark=spark)
    db.use("a", Reduce(1, lambda a, i: (a or 0) + i["v"]))
    db.use("b", Reduce(1, lambda a, i: (a or 0) + i["v"] * 10))
    db.append({"v": 3})
    assert db.a.get() == 3 and db.b.get() == 30
    db.a.close()
    with _pytest.raises(ClosedError):
        db.a.get()
    with _pytest.raises(ClosedError):
        db.a.ready()
    assert db.b.get() == 30  # the engine and other views stay live
    db.append({"v": 1})
    assert db.b.get() == 40
    db.close()
