"""Delta transaction-log export conformance (roadmap #1 / VERDICT r4 #6).

No Delta reader is installable in this container (duckdb's delta
extension needs a network download — asserted nowhere, relied on
never), so conformance is pinned two ways against the published
protocol (delta-io PROTOCOL.md):

1. golden field-level checks: version file naming, NDJSON framing,
   required fields of protocol/metaData/add/remove/commitInfo actions;
2. a replay reader (the same snapshot construction an external reader
   performs) whose reconstructed file set is verified ROW-FOR-ROW
   against the log's own read path via Spark.
"""

import json
import os

import pytest

from flumedb_spark.log import ParquetLog, VersionedLog
from flumedb_spark.sources.delta_export import (
    export_delta_log,
    read_delta_snapshot,
)


def _append(log, values):
    for v in values:
        log.append({"v": v})


def _actions(table_root, version):
    path = os.path.join(table_root, "_delta_log", f"{version:020d}.json")
    assert os.path.exists(path), f"missing delta version file {path}"
    with open(path) as f:
        raw = f.read()
    assert raw.endswith("\n")
    return [json.loads(line) for line in raw.strip().split("\n")]


def test_version0_carries_protocol_and_metadata(tmp_path):
    log = VersionedLog(str(tmp_path / "dlog"))
    _append(log, [1, 2, 3])
    v = export_delta_log(log)
    assert v == 0

    actions = _actions(log.path, 0)
    # PROTOCOL.md: first commit = protocol + metaData + adds (+ commitInfo)
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 1
    assert proto["minWriterVersion"] == 2

    meta = next(a["metaData"] for a in actions if "metaData" in a)
    for field in ("id", "format", "schemaString", "partitionColumns", "configuration"):
        assert field in meta, f"metaData missing required field {field}"
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["seq", "ts", "value"]

    adds = [a["add"] for a in actions if "add" in a]
    assert adds, "version 0 must add the committed files"
    for add in adds:
        assert add["path"].startswith("data/")
        fs = os.path.join(log.path, add["path"])
        assert os.path.exists(fs)
        assert add["size"] == os.path.getsize(fs)
        assert add["partitionValues"] == {}
        assert add["dataChange"] is True
        assert isinstance(add["modificationTime"], int)

    ci = next(a["commitInfo"] for a in actions if "commitInfo" in a)
    assert "timestamp" in ci and "operation" in ci


def test_incremental_commits_and_idempotency(tmp_path):
    log = VersionedLog(str(tmp_path / "dlog"))
    _append(log, [1])
    assert export_delta_log(log) == 0
    assert export_delta_log(log) == 0  # no change -> no new version

    _append(log, [2, 3])
    v = export_delta_log(log)
    assert v == 1
    actions = _actions(log.path, 1)
    assert not any("protocol" in a or "metaData" in a for a in actions)
    assert [a for a in actions if "add" in a], "new files must be added"

    # contiguous %020d naming — external readers require no version gaps
    names = sorted(os.listdir(os.path.join(log.path, "_delta_log")))
    assert names == ["00000000000000000000.json", "00000000000000000001.json"]


def test_compaction_emits_remove_actions(tmp_path, spark):
    log = VersionedLog(str(tmp_path / "dlog"))
    _append(log, list(range(8)))
    export_delta_log(log)
    before = read_delta_snapshot(log.path)

    n_after = log.compact(spark)
    assert n_after is not None
    v = export_delta_log(log, operation="OPTIMIZE")
    actions = _actions(log.path, v)
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    assert removed, "compaction must remove the replaced per-commit files"
    assert removed <= before["files"]
    for a in actions:
        if "remove" in a:
            assert "deletionTimestamp" in a["remove"]
            assert a["remove"]["dataChange"] is True


def test_replay_snapshot_matches_log_rows(tmp_path, spark):
    """The reconstruction an external Delta reader performs (replay
    adds/removes in version order) must yield exactly the log's
    committed rows — including across a compaction rewrite."""
    log = VersionedLog(str(tmp_path / "dlog"))
    _append(log, list(range(10)))
    export_delta_log(log)
    log.compact(spark)
    _append(log, [10, 11])
    export_delta_log(log)

    snap = read_delta_snapshot(log.path)
    assert snap["files"] == {f"data/{n}" for n in log._meta["files"]}
    paths = [os.path.join(log.path, p) for p in sorted(snap["files"])]
    from flumedb_spark.log import LOG_SCHEMA

    via_delta = spark.read.schema(LOG_SCHEMA).parquet(*paths)
    own = log.df(spark)
    assert via_delta.count() == own.count() == 12
    assert {r.seq for r in via_delta.select("seq").collect()} == set(range(12))


def test_plain_parquet_log_exports_too(tmp_path):
    # the exporter only needs a committed-files manifest — every backend
    # has one, so single-host ParquetLog tables get the interop for free
    log = ParquetLog(str(tmp_path / "plain"))
    _append(log, [1, 2])
    assert export_delta_log(log) == 0
    snap = read_delta_snapshot(log.path)
    assert snap["protocol"] is not None
    assert snap["files"] == {f"data/{n}" for n in log._meta["files"]}


def test_empty_log_exports_nothing(tmp_path):
    log = VersionedLog(str(tmp_path / "empty"))
    assert export_delta_log(log) == -1
    assert _no_versions(log.path)


def _no_versions(root):
    d = os.path.join(root, "_delta_log")
    return not os.path.exists(d) or not [
        f for f in os.listdir(d) if f.endswith(".json") and not f.startswith(".")
    ]


def test_maintain_export_delta_flag(tmp_path, spark):
    # engine integration: maintain(export_delta=True) refreshes the
    # external Delta log after compaction/vacuum
    from flumedb_spark import Flume

    db = Flume(str(tmp_path / "eng"), spark=spark)
    db.append([{"v": i} for i in range(4)])
    out = db.maintain(export_delta=True)
    assert out["delta_version"] >= 0
    snap = read_delta_snapshot(db.log.path)
    assert snap["files"] == {f"data/{n}" for n in db.log._meta["files"]}
    db.close()


# ---------------------------------------------------------------------
# round-6: parquet checkpoints + _last_checkpoint (VERDICT-r5 #6)
# ---------------------------------------------------------------------


def test_checkpoint_written_at_interval_and_hint_shape(tmp_path):
    import pyarrow.parquet as pq

    log = VersionedLog(str(tmp_path / "dlog"))
    for batch in range(13):  # versions 0..12 -> checkpoints at 5, 10
        _append(log, [batch])
        export_delta_log(log, checkpoint_interval=5)
    delta_dir = os.path.join(log.path, "_delta_log")
    names = os.listdir(delta_dir)
    assert "00000000000000000005.checkpoint.parquet" in names
    assert "00000000000000000010.checkpoint.parquet" in names
    hint = json.loads(open(os.path.join(delta_dir, "_last_checkpoint")).read())
    assert hint["version"] == 10
    t = pq.read_table(os.path.join(delta_dir, "00000000000000000010.checkpoint.parquet"))
    assert hint["size"] == t.num_rows
    # classic checkpoint shape: struct action columns, one action/row
    assert {"protocol", "metaData", "add"} <= set(t.column_names)
    rows = t.to_pylist()
    protos = [r for r in rows if r["protocol"] and r["protocol"]["minReaderVersion"] is not None]
    metas = [r for r in rows if r["metaData"] and r["metaData"]["id"]]
    adds = [r["add"] for r in rows if r["add"] and r["add"]["path"]]
    assert len(protos) == 1 and len(metas) == 1
    assert protos[0]["protocol"]["minReaderVersion"] == 1
    assert json.loads(metas[0]["metaData"]["schemaString"])["type"] == "struct"
    # checkpoint restates the live file set AS OF ITS VERSION (10):
    # replay the JSON actions 0..10 and compare
    expected = set()
    for v in range(10 + 1):
        for a in _actions(log.path, v):
            if "add" in a:
                expected.add(a["add"]["path"])
            elif "remove" in a:
                expected.discard(a["remove"]["path"])
    assert {a["path"] for a in adds} == expected
    for a in adds:
        assert a["size"] == os.path.getsize(os.path.join(log.path, a["path"]))


def test_snapshot_from_checkpoint_equals_full_replay(tmp_path):
    log = VersionedLog(str(tmp_path / "dlog"))
    for batch in range(12):
        _append(log, [batch, batch + 100])
        export_delta_log(log, checkpoint_interval=4)
    with_ckpt = read_delta_snapshot(log.path)
    # remove the hint -> reader falls back to the full JSON replay
    os.remove(os.path.join(log.path, "_delta_log", "_last_checkpoint"))
    full = read_delta_snapshot(log.path)
    assert with_ckpt["files"] == full["files"]
    assert with_ckpt["version"] == full["version"]
    assert with_ckpt["protocol"] == full["protocol"]
    assert {k: v for k, v in (with_ckpt["metaData"] or {}).items() if k != "format"} == {
        k: v for k, v in (full["metaData"] or {}).items() if k != "format"
    }


def test_snapshot_survives_pre_checkpoint_json_retention(tmp_path):
    """PROTOCOL.md log cleanup may delete JSON files covered by a
    checkpoint; the reader AND the next export must not need them —
    the executable proof of O(commits-since-checkpoint)."""
    log = VersionedLog(str(tmp_path / "dlog"))
    for batch in range(11):  # versions 0..10, checkpoint at 10
        _append(log, [batch])
        export_delta_log(log, checkpoint_interval=5)
    delta_dir = os.path.join(log.path, "_delta_log")
    expected = read_delta_snapshot(log.path)
    # retention: drop every JSON file covered by the checkpoint
    for v in range(10 + 1):
        os.remove(os.path.join(delta_dir, f"{v:020d}.json"))
    snap = read_delta_snapshot(log.path)
    assert snap["files"] == expected["files"]
    assert snap["version"] == 10
    assert snap["protocol"] is not None and snap["metaData"] is not None
    # the next incremental export still works (no pre-checkpoint reads)
    _append(log, [999])
    v = export_delta_log(log, checkpoint_interval=5)
    assert v == 11
    snap2 = read_delta_snapshot(log.path)
    assert snap2["files"] == {f"data/{n}" for n in log._meta["files"]}
    # and the NEXT checkpoint builds from the previous one + tail alone
    for _ in range(4):
        _append(log, [1000])
        export_delta_log(log, checkpoint_interval=5)
    assert json.loads(
        open(os.path.join(delta_dir, "_last_checkpoint")).read()
    )["version"] == 15
    snap3 = read_delta_snapshot(log.path)
    assert snap3["files"] == {f"data/{n}" for n in log._meta["files"]}


def test_checkpoint_covers_compaction_removes(tmp_path, spark):
    """A checkpoint taken after OPTIMIZE restates only live files —
    removed (compacted-away) paths must not resurface via the
    checkpoint path."""
    from flumedb_spark.sources.delta_export import write_delta_checkpoint

    log = VersionedLog(str(tmp_path / "dlog"))
    _append(log, list(range(6)))
    export_delta_log(log, checkpoint_interval=None)
    log.compact(spark)
    export_delta_log(log, operation="OPTIMIZE", checkpoint_interval=None)
    v = write_delta_checkpoint(log.path)
    assert v >= 1
    snap = read_delta_snapshot(log.path)
    assert snap["files"] == {f"data/{n}" for n in log._meta["files"]}


def test_clean_delta_log_retention(tmp_path, spark):
    """PROTOCOL log cleanup: pre-checkpoint JSONs outside the retention
    window die; the snapshot still reconstructs from the checkpoint +
    tail, row-for-row."""
    from flumedb_spark.sources.delta_export import (
        clean_delta_log,
        write_delta_checkpoint,
    )

    log = VersionedLog(str(tmp_path / "dlog"))
    for i in range(12):
        _append(log, [i])
        export_delta_log(log, checkpoint_interval=None)
    head = write_delta_checkpoint(log.path)
    assert head == 11

    # nothing to delete inside the window
    assert clean_delta_log(log.path, keep_versions=20)["deleted"] == 0
    out = clean_delta_log(log.path, keep_versions=4)
    assert out["deleted"] == 8 and out["kept_from"] == 8
    delta_dir = os.path.join(log.path, "_delta_log")
    remaining = sorted(
        int(n[:-5]) for n in os.listdir(delta_dir)
        if n.endswith(".json") and not n.startswith(".")
    )
    assert remaining == [8, 9, 10, 11]

    # snapshot still exact: checkpoint covers the cleaned prefix
    snap = read_delta_snapshot(log.path)
    assert snap["version"] == 11
    from flumedb_spark.log import LOG_SCHEMA

    paths = [os.path.join(log.path, p) for p in sorted(snap["files"])]
    via = spark.read.schema(LOG_SCHEMA).parquet(*paths)
    assert sorted(via.collect()) == sorted(log.df(spark).collect())
    # cleaned versions no longer time-travel (documented Delta behavior)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_delta_snapshot(log.path, at_version=3)
    # versions below the checkpoint can no longer reconstruct either:
    # the checkpoint cannot be rolled back and the pre-checkpoint JSONs
    # are gone, so a replay over commits 8..9 alone would silently
    # return a 2-file "snapshot" missing everything added in 0..7 —
    # the hoisted gapped-log guard refuses instead (ADVICE r7)
    with _pytest.raises(OSError):
        read_delta_snapshot(log.path, at_version=9)
    # the checkpoint version itself still time-travels exactly
    assert read_delta_snapshot(log.path, at_version=11)["version"] == 11
