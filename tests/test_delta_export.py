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
