"""VersionedLog — cross-host optimistic-concurrency commit protocol
(roadmap #1: the Delta-protocol shape without connector jars).

What flock can't give (it is per-host), the versioned manifest must:
writers on ANY host racing through put-if-absent version claims, losers
replaying their transaction against the winner's state. These tests
drive the protocol itself; the full behavioral contract runs via the
backend-parametrized suite (test_log_contract.py, backends
versioned-occ / versioned-occ-bulk).
"""

import json
import multiprocessing as mp
import os
import threading

from flumedb_spark.log import CommitConflict, VersionedLog


def test_versioned_basic_roundtrip(tmp_path):
    log = VersionedLog(str(tmp_path / "log"))
    assert log.ready_since() == -1
    log.append({"a": 1})
    log.append([{"a": 2}, {"a": 3}])
    assert log.since == 2
    # manifest is versioned: one immutable file per commit
    versions = sorted(os.listdir(log.txn_dir))
    assert [int(v.split(".")[0]) for v in versions] == [0, 1]
    # reopen from the versioned manifest alone
    log2 = VersionedLog(str(tmp_path / "log"))
    assert log2.ready_since() == 2


def test_conflict_replays_stage(tmp_path):
    """A commit race loser must REPLAY its stage against the winner's
    state: seqs reassigned, no overwrite, both records present."""
    path = str(tmp_path / "log")
    a, b = VersionedLog(path), VersionedLog(path)
    a.append({"who": "init"})  # since=0

    calls = {"n": 0}
    orig_commit = VersionedLog._commit_meta

    def racing_commit(self, meta=None):
        # first attempt: sneak b's append in AFTER a's stage read the
        # manifest — a's claim of the next version must then conflict
        if calls["n"] == 0:
            calls["n"] += 1
            b.append({"who": "b"})
        orig_commit(self, meta)

    a._commit_meta = racing_commit.__get__(a)
    last = a.append({"who": "a"})
    assert last == 2  # replayed: assigned AFTER b's record
    rows = {}
    import pyarrow.parquet as pq

    meta = a._load_meta()
    for f in meta["files"]:
        t = pq.read_table(os.path.join(a.data_dir, f))
        for seq, val in zip(t.column("seq").to_pylist(), t.column("value").to_pylist()):
            if seq <= meta["since"]:
                # duplicate seqs across manifest files = a broken replay
                # left stale staged data committed (setdefault would
                # silently mask it behind manifest order)
                assert seq not in rows, f"duplicate committed seq {seq}"
                rows[seq] = json.loads(val)
    assert {s: v["who"] for s, v in rows.items()} == {
        0: "init", 1: "b", 2: "a",
    }


def test_occ_threads_interleaved_no_lock(tmp_path):
    """4 writer threads on 4 SEPARATE handles (no shared in-memory
    state, no flock serialization in the versioned protocol): dense
    gap-free seqs, every value exactly once."""
    path = str(tmp_path / "log")
    VersionedLog(path).ready_since()
    n_writers, n_appends = 4, 8

    errs = []

    def writer(w):
        try:
            log = VersionedLog(path)
            for i in range(n_appends):
                log.append({"w": w, "i": i})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    log = VersionedLog(path)
    total = n_writers * n_appends
    assert log.ready_since() == total - 1
    meta = log._load_meta()
    assert meta["commits"] == total
    import pyarrow.parquet as pq

    seen = {}
    for f in meta["files"]:
        t = pq.read_table(os.path.join(log.data_dir, f))
        for seq, val in zip(t.column("seq").to_pylist(), t.column("value").to_pylist()):
            assert seq not in seen, "seq collision"
            seen[seq] = json.loads(val)
    assert sorted(seen) == list(range(total))
    assert len({(v["w"], v["i"]) for v in seen.values()}) == total


def _proc_writer(path, writer_id, n_appends):
    log = VersionedLog(path)
    for i in range(n_appends):
        log.append({"w": writer_id, "i": i})


def _looping_occ_writer(path, writer_id, stop_flag, counter_dir):
    import time as _time

    log = VersionedLog(path)
    i = 0
    while not os.path.exists(stop_flag) and i < 2000:
        _time.sleep(0.02)
        log.append({"w": writer_id, "i": i})
        i += 1
    with open(os.path.join(counter_dir, f"w{writer_id}"), "w") as f:
        f.write(str(i))


def test_occ_processes_dense(spark, tmp_path):
    """Separate OS processes racing through the put-if-absent version
    claim — the cross-host scenario (no flock is taken anywhere in the
    versioned write path)."""
    path = str(tmp_path / "log")
    VersionedLog(path).ready_since()
    n_writers, n_appends = 3, 6
    procs = [
        mp.Process(target=_proc_writer, args=(path, w, n_appends))
        for w in range(n_writers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    log = VersionedLog(path)
    total = n_writers * n_appends
    assert log.ready_since() == total - 1
    rows = log.df(spark).collect()
    assert sorted(r.seq for r in rows) == list(range(total))
    vals = {(d["w"], d["i"]) for d in (json.loads(r.value) for r in rows)}
    assert len(vals) == total


def test_version_pruning_bounds_manifest_dir(tmp_path):
    log = VersionedLog(str(tmp_path / "log"))
    for i in range(log.keep_versions + 10):
        log.append({"i": i})
    versions = sorted(os.listdir(log.txn_dir))
    assert len(versions) <= log.keep_versions
    # the head version is always present and readable
    head = int(versions[-1].split(".")[0])
    assert head == log.keep_versions + 10 - 1
    assert log.ready_since() == log.keep_versions + 10 - 1


def test_commit_conflict_exception_surface(tmp_path):
    """Direct CAS semantics: claiming an already-committed version
    raises CommitConflict and leaves the winner's state intact."""
    path = str(tmp_path / "log")
    a, b = VersionedLog(path), VersionedLog(path)
    a.append({"x": 1})
    meta_stale = b._load_meta()
    a.append({"x": 2})  # takes the version meta_stale targets
    meta_stale["since"] = 99
    try:
        b._commit_meta(meta_stale)
        raise AssertionError("expected CommitConflict")
    except CommitConflict:
        pass
    assert VersionedLog(path).ready_since() == 1  # winner intact


def test_compaction_and_vacuum_on_versioned(spark, tmp_path):
    """OPTIMIZE/VACUUM run through the same optimistic transactions."""
    log = VersionedLog(str(tmp_path / "log"))
    for i in range(12):
        log.append({"i": i})
    n_files = log.maybe_compact(spark, max_files=4)
    assert n_files is not None and n_files < 12
    assert log.ready_since() == 11
    assert log.vacuum(older_than_seconds=0.0) > 0
    rows = log.df(spark).orderBy("seq").collect()
    assert [json.loads(r.value)["i"] for r in rows] == list(range(12))


def test_maintenance_races_occ_writers(spark, tmp_path):
    """OPTIMIZE/VACUUM through optimistic transactions racing appender
    PROCESSES (no locks anywhere): dense, gap-free, exactly-once, file
    count bounded — the versioned analogue of the flock'd
    test_compaction_concurrent_with_writer_processes."""
    import time as _t

    path = str(tmp_path / "log")
    VersionedLog(path).ready_since()
    stop_flag = str(tmp_path / "stop")
    counter_dir = str(tmp_path / "counts")
    os.makedirs(counter_dir)
    procs = [
        mp.Process(
            target=_looping_occ_writer, args=(path, w, stop_flag, counter_dir)
        )
        for w in range(3)
    ]
    for p in procs:
        p.start()
    # writers loop until the flag: every compaction completed before it
    # is PROVABLY concurrent with live OCC writers (the old fixed loop
    # could run entirely against a quiesced log and still pass)
    log = VersionedLog(path)
    live_compactions = 0
    deadline = _t.monotonic() + 180
    while live_compactions < 2 and _t.monotonic() < deadline:
        did = log.maybe_compact(spark, max_files=4) is not None
        # count ONLY compactions that completed while a writer was
        # still alive — that is the overlap evidence, independent of
        # how loaded the host is
        if did and any(pr.is_alive() for pr in procs):
            live_compactions += 1
        log.vacuum(older_than_seconds=0)
        if not any(pr.is_alive() for pr in procs):
            break  # writers hit their safety cap: no more overlap possible
        _t.sleep(0.02)
    open(stop_flag, "w").write("stop")
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert live_compactions >= 1, "maintenance never overlapped live writers"
    log.maybe_compact(spark, max_files=4)
    log.vacuum(older_than_seconds=0)

    per_writer = {
        w: int(open(os.path.join(counter_dir, f"w{w}")).read()) for w in range(3)
    }
    total = sum(per_writer.values())
    assert total > 0
    fresh = VersionedLog(path)
    assert fresh.ready_since() == total - 1
    rows = fresh.df(spark).collect()
    assert sorted(r.seq for r in rows) == list(range(total))
    vals = {(d["w"], d["i"]) for d in (json.loads(r.value) for r in rows)}
    assert len(vals) == total
    assert len(fresh._load_meta()["files"]) < total


def test_live_tail_follows_occ_process_appends(spark, tmp_path):
    """A bounded live tail on a VersionedLog-backed engine observes
    appends committed by ANOTHER process (refresh_since reloads the
    versioned manifest on idle polls)."""
    from flumedb_spark.engine import Flume

    import queue
    import threading

    path = str(tmp_path / "log")
    db = Flume(VersionedLog(path), spark=spark)
    db.append([{"w": -1, "i": i} for i in range(2)])  # seqs 0,1
    # start the tail and consume the EXISTING prefix FIRST, so the
    # remaining items can only arrive through the cross-process
    # refresh_since path (the old ordering let a fast child commit
    # everything before the tail's first scan, serving the whole range
    # from the initial snapshot and never exercising refresh at all)
    gen = db.stream(live=True, gt=0, lte=3, poll_interval=0.05)
    first = next(gen)
    assert first["seq"] == 1
    p = mp.Process(target=_proc_writer, args=(path, 7, 3))  # seqs 2,3,4
    p.start()
    out: "queue.Queue" = queue.Queue()

    def drain():
        try:
            out.put(("ok", [i["seq"] for i in gen]))
        except Exception as exc:  # pragma: no cover - failure path
            out.put(("err", exc))

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    t.join(timeout=120)  # a broken refresh_since HANGS the tail: fail, don't freeze
    assert not t.is_alive(), "cross-process tail never observed the child's commits"
    kind, rest = out.get()
    assert kind == "ok" and rest == [2, 3]
    p.join()
    assert p.exitcode == 0
    db.close()
