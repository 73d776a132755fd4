"""Cross-process writer safety: concurrent appends from separate OS
processes must serialize through the flock'd critical section — dense
gap-free seqs, no lost commits, every value present exactly once.

(The reference is single-process and has no concurrency control at all;
this is the single-host form of the Delta-transaction upgrade the log's
docstring maps to at cluster scale.)
"""

import json
import multiprocessing as mp
import os

from flumedb_spark.log import OffsetLog, ParquetLog


def _writer(path, writer_id, n_batches, batch_size):
    # fresh log handle per process — no shared in-memory state
    log = ParquetLog(path)
    for b in range(n_batches):
        log.append(
            [{"w": writer_id, "b": b, "i": i} for i in range(batch_size)]
        )


def _offset_writer(path, writer_id, n_batches):
    log = OffsetLog(path)
    for b in range(n_batches):
        log.append([{"w": writer_id, "b": b, "pad": "x" * (writer_id + b)}])


def test_concurrent_process_appends_dense(spark, tmp_path):
    path = str(tmp_path / "log")
    ParquetLog(path).ready_since()  # init the dir
    n_writers, n_batches, batch_size = 4, 5, 10
    procs = [
        mp.Process(target=_writer, args=(path, w, n_batches, batch_size))
        for w in range(n_writers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    log = ParquetLog(path)
    total = n_writers * n_batches * batch_size
    assert log.ready_since() == total - 1  # dense: max seq == N-1
    rows = log.df(spark).collect()
    assert len(rows) == total
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(total))  # gap-free, no collisions
    # every (writer, batch, i) value appended exactly once
    vals = {(d["w"], d["b"], d["i"]) for d in (json.loads(r.value) for r in rows)}
    assert len(vals) == total


def test_concurrent_process_appends_offset_frames(spark, tmp_path):
    """OffsetLog under concurrent writers: byte offsets stay contiguous
    (every consecutive seq delta equals the previous record's frame)."""
    path = str(tmp_path / "log")
    OffsetLog(path).ready_since()
    procs = [
        mp.Process(target=_offset_writer, args=(path, w, 4)) for w in range(3)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    log = OffsetLog(path)
    rows = log.df(spark).orderBy("seq").collect()
    assert len(rows) == 12
    assert rows[0].seq == 0
    for i in range(len(rows) - 1):
        frame = len(rows[i].value.encode("utf-8")) + OffsetLog.FRAME_OVERHEAD
        assert rows[i + 1].seq - rows[i].seq == frame


def test_lock_file_not_in_manifest(tmp_path):
    log = ParquetLog(str(tmp_path / "log"))
    log.append({"a": 1})
    assert os.path.exists(os.path.join(log.path, ".lock"))
    meta = json.load(open(log.meta_path))
    assert all(f.endswith(".parquet") for f in meta["files"])


def test_compaction_concurrent_with_writer_processes(spark, tmp_path):
    """OPTIMIZE/VACUUM under cross-process write load: a maintenance
    loop (compact-when-due + immediate vacuum) interleaves with three
    appender processes; the final log must still be dense, gap-free,
    and exactly-once — the flock'd manifest swap and the tombstone
    protocol may not lose or duplicate a commit."""
    import time as _t

    path = str(tmp_path / "log")
    ParquetLog(path).ready_since()  # init the dir
    n_writers, n_batches, batch_size = 3, 6, 5
    procs = [
        mp.Process(target=_writer, args=(path, w, n_batches, batch_size))
        for w in range(n_writers)
    ]
    for p in procs:
        p.start()
    log = ParquetLog(path)
    for _ in range(8):  # maintenance racing the writers
        log.maybe_compact(spark, max_files=4)
        log.vacuum(older_than_seconds=0)
        _t.sleep(0.05)
    for p in procs:
        p.join()
        assert p.exitcode == 0
    log.maybe_compact(spark, max_files=4)
    log.vacuum(older_than_seconds=0)

    total = n_writers * n_batches * batch_size
    fresh = ParquetLog(path)  # re-read from disk, no cached state
    assert fresh.ready_since() == total - 1
    rows = fresh.df(spark).collect()
    assert sorted(r.seq for r in rows) == list(range(total))
    vals = {(d["w"], d["b"], d["i"]) for d in (json.loads(r.value) for r in rows)}
    assert len(vals) == total
    # maintenance actually did something: file count bounded well below
    # the 18 commit files the writers produced
    assert len(fresh._load_meta()["files"]) < 18
