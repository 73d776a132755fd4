"""Cross-host multi-writer over one log — the VersionedLog protocol.

The reference is single-process with no concurrency control at all
(`/root/reference/index.js` — one in-memory engine per process). This
example runs THREE writer processes racing into one log directory with
no locks anywhere: every commit is an `os.link` put-if-absent claim of
the next manifest version (the Delta-protocol shape), and losers replay
their append against the winner's state. On a shared filesystem the
same three processes could be three hosts.

Run: PYTHONPATH=/root/repo python examples/versioned_multiwriter.py
"""

import json
import multiprocessing as mp
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import flumedb_spark as fs


def writer(path: str, who: int, n: int) -> None:
    log = fs.VersionedLog(path)  # fresh handle: no shared memory state
    for i in range(n):
        log.append({"who": who, "i": i})


def main() -> None:
    path = tempfile.mkdtemp(prefix="flume_versioned_") + "/log"
    fs.VersionedLog(path).ready_since()

    procs = [mp.Process(target=writer, args=(path, w, 20)) for w in range(3)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0

    spark = fs.get_spark("versioned_example", cpus=8)
    db = fs.Flume(fs.VersionedLog(path), spark=spark)
    db.use("count", fs.Reduce(1, lambda a, i: (a or 0) + 1))

    total = db.count.get()  # gated read folds the full log
    assert total == 60, total
    assert db.log.ready_since() == 59  # dense, gap-free despite the races

    rows = db.stream()
    by_writer = {}
    for r in rows:
        by_writer.setdefault(r["value"]["who"], []).append(r["value"]["i"])
    # every writer's appends are all present, in ITS OWN order
    # (interleaving across writers is whatever the race produced)
    assert all(v == sorted(v) and len(v) == 20 for v in by_writer.values())

    meta = db.log._load_meta()
    print(
        json.dumps(
            {
                "records": total,
                "since": db.log.ready_since(),
                "commits": meta["commits"],
                "manifest_version": meta["txn_version"],
                "per_writer_in_order": {k: len(v) for k, v in by_writer.items()},
            }
        )
    )
    db.close()


if __name__ == "__main__":
    main()
