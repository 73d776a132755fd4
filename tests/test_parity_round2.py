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
