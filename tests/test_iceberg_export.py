"""Iceberg v2 table-metadata export conformance.

No Iceberg reader is installable in this container (pyiceberg / Spark's
iceberg-runtime jar need a network download), so — exactly like the
Delta export — conformance is pinned two ways against the published
table spec (iceberg.apache.org/spec):

1. golden field-level checks: metadata.json required fields, manifest
   and manifest-list Avro schemas carrying the spec's REQUIRED
   field-ids, the file-metadata keys manifests must set;
2. a replay reader (the walk an external HadoopCatalog reader performs:
   version-hint -> metadata.json -> manifest list -> manifests) whose
   reconstructed file set is verified ROW-FOR-ROW against the log's own
   read path via Spark — including across a compaction rewrite.
"""

import json
import os

from flumedb_spark.log import ParquetLog, VersionedLog
from flumedb_spark.operators.archives import avro_meta, avro_records
from flumedb_spark.sources.iceberg_export import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_LIST_SCHEMA,
    export_iceberg_metadata,
    read_iceberg_snapshot,
)


def _append(log, values):
    for v in values:
        log.append({"v": v})


def _md(table_root, version):
    path = os.path.join(table_root, "metadata", f"v{version}.metadata.json")
    assert os.path.exists(path), f"missing {path}"
    with open(path) as f:
        return json.load(f)


def test_first_export_writes_v1_metadata(tmp_path):
    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1, 2, 3])
    assert export_iceberg_metadata(log) == 1

    md = _md(log.path, 1)
    # spec "Table Metadata fields" — v2 required fields
    for field in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "last-partition-id",
        "default-sort-order-id", "sort-orders", "current-snapshot-id",
        "snapshots", "snapshot-log",
    ):
        assert field in md, f"metadata.json missing required field {field}"
    assert md["format-version"] == 2
    assert md["last-column-id"] == 3
    schema = md["schemas"][0]
    assert [f["name"] for f in schema["fields"]] == ["seq", "ts", "value"]
    assert [f["id"] for f in schema["fields"]] == [1, 2, 3]
    assert schema["fields"][0]["required"] is True

    with open(os.path.join(log.path, "metadata", "version-hint.text")) as f:
        assert f.read().strip() == "1"

    snap = md["snapshots"][0]
    assert snap["snapshot-id"] == md["current-snapshot-id"]
    assert snap["summary"]["operation"] == "append"
    assert os.path.exists(snap["manifest-list"])


def test_manifest_files_carry_spec_field_ids(tmp_path):
    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1, 2])
    export_iceberg_metadata(log)
    md = _md(log.path, 1)
    list_path = md["snapshots"][0]["manifest-list"]
    with open(list_path, "rb") as f:
        raw = f.read()

    # manifest-list schema: REQUIRED v2 field-ids from "Manifest Lists"
    m = avro_meta(raw)
    assert m["schema_name"] == "manifest_file"
    assert m["codec"] == "deflate"
    want_ids = {
        "manifest_path": 500, "manifest_length": 501, "partition_spec_id": 502,
        "content": 517, "sequence_number": 515, "min_sequence_number": 516,
        "added_snapshot_id": 503, "added_files_count": 504,
        "existing_files_count": 505, "deleted_files_count": 506,
        "added_rows_count": 512, "existing_rows_count": 513,
        "deleted_rows_count": 514,
    }
    got = {f["name"]: f["field-id"] for f in MANIFEST_LIST_SCHEMA["fields"]}
    assert got == want_ids

    (mf,) = avro_records(raw)
    assert mf["content"] == 0 and mf["partition_spec_id"] == 0
    assert mf["added_files_count"] >= 1

    # manifest entry schema: field-ids from "Manifests"
    entry_ids = {f["name"]: f["field-id"] for f in MANIFEST_ENTRY_SCHEMA["fields"]}
    assert entry_ids == {
        "status": 0, "snapshot_id": 1, "sequence_number": 3,
        "file_sequence_number": 4, "data_file": 2,
    }
    df_fields = {
        f["name"]: f["field-id"]
        for f in MANIFEST_ENTRY_SCHEMA["fields"][-1]["type"]["fields"]
    }
    assert df_fields == {
        "content": 134, "file_path": 100, "file_format": 101,
        "partition": 102, "record_count": 103, "file_size_in_bytes": 104,
        "lower_bounds": 125, "upper_bounds": 128,
    }

    # the written manifest carries the spec's required file-metadata keys
    with open(mf["manifest_path"], "rb") as f:
        man_raw = f.read()
    # re-walk the OCF header to get metadata entries verbatim
    import flumedb_spark.operators.archives as ar

    pos = 4
    meta = {}
    while True:
        count, pos = ar._avro_varint(man_raw, pos)
        if count == 0:
            break
        if count < 0:
            _, pos = ar._avro_varint(man_raw, pos)
            count = -count
        for _ in range(count):
            klen, pos = ar._avro_varint(man_raw, pos)
            k = man_raw[pos : pos + klen].decode()
            pos += klen
            vlen, pos = ar._avro_varint(man_raw, pos)
            meta[k] = man_raw[pos : pos + vlen]
            pos += vlen
    for key in ("schema", "schema-id", "partition-spec", "partition-spec-id",
                "format-version", "content"):
        assert key in meta, f"manifest missing required metadata key {key}"
    assert meta["format-version"] == b"2"
    assert meta["content"] == b"data"
    assert json.loads(meta["schema"])["fields"][0]["id"] == 1

    entries = avro_records(man_raw)
    for e in entries:
        assert e["status"] == 1  # first snapshot: everything ADDED
        assert e["data_file"]["file_format"] == "PARQUET"
        assert e["data_file"]["record_count"] >= 1
        assert os.path.exists(e["data_file"]["file_path"])


def test_incremental_export_and_idempotence(tmp_path):
    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1, 2])
    assert export_iceberg_metadata(log) == 1
    before = sorted(os.listdir(os.path.join(log.path, "metadata")))
    assert export_iceberg_metadata(log) == 1  # no change, no new files
    assert sorted(os.listdir(os.path.join(log.path, "metadata"))) == before

    _append(log, [3])
    assert export_iceberg_metadata(log) == 2
    md = _md(log.path, 2)
    snap2 = md["snapshots"][-1]
    assert snap2["parent-snapshot-id"] == 1
    assert snap2["sequence-number"] == 2
    assert len(md["snapshot-log"]) == 2
    assert md["metadata-log"][-1]["metadata-file"].endswith("v1.metadata.json")
    # the new manifest restates prior files as EXISTING with their
    # original sequence number, new ones as ADDED with the current one
    with open(snap2["manifest-list"], "rb") as f:
        (mf,) = avro_records(f.read())
    with open(mf["manifest_path"], "rb") as f:
        entries = avro_records(f.read())
    by_status = {0: [], 1: []}
    for e in entries:
        by_status[e["status"]].append(e)
    assert len(by_status[0]) >= 1 and len(by_status[1]) >= 1
    assert all(e["sequence_number"] == 1 for e in by_status[0])
    assert all(e["sequence_number"] == 2 for e in by_status[1])


def test_replay_matches_log_rows_across_compaction(tmp_path, spark):
    """The interop claim: an external reader resolving the metadata
    tree reads exactly the committed rows — including after compaction
    rewrites the file set (operation becomes overwrite)."""
    log = ParquetLog(str(tmp_path / "ilog"))
    _append(log, range(10))
    export_iceberg_metadata(log)
    log.compact(spark)
    _append(log, range(10, 13))
    v = export_iceberg_metadata(log)
    assert v == 2

    md = _md(log.path, v)
    assert md["snapshots"][-1]["summary"]["operation"] == "overwrite"

    snap = read_iceberg_snapshot(log.path)
    assert snap["version"] == 2 and snap["snapshot_id"] == 2
    paths = sorted(snap["files"])
    assert paths, "snapshot must reference data files"
    # record counts in the manifest equal the actual parquet row counts
    total = sum(rc for rc, *_ in snap["files"].values())
    assert total == 13

    from flumedb_spark.log import LOG_SCHEMA

    via_iceberg = spark.read.schema(LOG_SCHEMA).parquet(*paths)
    own = log.df(spark)
    assert sorted(via_iceberg.collect()) == sorted(own.collect())


def test_empty_log_exports_nothing(tmp_path):
    log = VersionedLog(str(tmp_path / "ilog"))
    assert export_iceberg_metadata(log) == 0
    assert not os.path.exists(
        os.path.join(log.path, "metadata", "v1.metadata.json")
    )
    snap = read_iceberg_snapshot(log.path)
    assert snap["version"] == 0 and snap["files"] == {}


def test_version_hint_is_a_hint(tmp_path):
    """HadoopCatalog semantics: a stale or missing hint falls back to
    listing v*.metadata.json."""
    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1])
    export_iceberg_metadata(log)
    _append(log, [2])
    export_iceberg_metadata(log)
    hint = os.path.join(log.path, "metadata", "version-hint.text")
    os.remove(hint)
    assert read_iceberg_snapshot(log.path)["version"] == 2
    with open(hint, "w") as f:
        f.write("1")  # stale
    assert read_iceberg_snapshot(log.path)["version"] == 2


def test_maintain_export_iceberg_flag(tmp_path, spark):
    from flumedb_spark import Flume

    db = Flume(str(tmp_path / "eng"), spark=spark)
    for i in range(6):
        db.append({"v": i})
    out = db.maintain(export_iceberg=True, export_delta=True)
    assert out["iceberg_version"] >= 1
    snap = read_iceberg_snapshot(db.log.path)
    total = sum(rc for rc, *_ in snap["files"].values())
    assert total == 6
    db.close()


def test_existing_entries_keep_original_add_sequence(tmp_path):
    """Three exports: a file added at sequence 1 must still carry
    sequence_number 1 in the v3 manifest (spec: existing entries
    preserve the data sequence number they were added at — NOT the
    previous snapshot's head sequence)."""
    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1])
    assert export_iceberg_metadata(log) == 1
    _append(log, [2])
    assert export_iceberg_metadata(log) == 2
    _append(log, [3])
    assert export_iceberg_metadata(log) == 3

    md = _md(log.path, 3)
    with open(md["snapshots"][-1]["manifest-list"], "rb") as f:
        (mf,) = avro_records(f.read())
    with open(mf["manifest_path"], "rb") as f:
        entries = avro_records(f.read())
    seqs = sorted(e["sequence_number"] for e in entries)
    assert seqs == [1, 2, 3], seqs
    assert mf["min_sequence_number"] == 1


def test_time_travel_and_table_readers(tmp_path, spark):
    """read_delta_table / read_iceberg_table resolve live AND
    historical snapshots with the exported schema — both formats, no
    connector jars."""
    from flumedb_spark.sources.delta_export import export_delta_log
    from flumedb_spark.sources.readers import read_any

    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1, 2, 3])
    dv1 = export_delta_log(log)
    iv1 = export_iceberg_metadata(log)
    _append(log, [4, 5])
    dv2 = export_delta_log(log)
    iv2 = export_iceberg_metadata(log)
    assert (dv2, iv2) == (dv1 + 1, iv1 + 1)

    # live reads: both formats, schema from their own metadata
    d_live = read_any(spark, log.path, "delta")
    i_live = read_any(spark, log.path, "iceberg")
    assert d_live.count() == i_live.count() == 5
    assert [f.name for f in d_live.schema.fields] == ["seq", "ts", "value"]
    assert [f.name for f in i_live.schema.fields] == ["seq", "ts", "value"]
    assert i_live.schema["seq"].dataType.typeName() == "long"
    assert sorted(d_live.collect()) == sorted(i_live.collect())

    # time travel to the first snapshot
    d_old = read_any(spark, log.path, "delta", version=dv1)
    i_old = read_any(spark, log.path, "iceberg", snapshot_id=1)
    assert d_old.count() == i_old.count() == 3
    assert sorted(d_old.collect()) == sorted(i_old.collect())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_any(spark, log.path, "delta", version=99)
    with _pytest.raises(ValueError):
        read_any(spark, log.path, "iceberg", snapshot_id=99)


def test_iceberg_schema_ddl_mapping():
    from flumedb_spark.sources.readers import iceberg_schema_to_ddl

    sch = {
        "type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "a", "required": True, "type": "long"},
            {"id": 2, "name": "b", "required": False, "type": "decimal(9, 2)"},
            {"id": 3, "name": "c", "required": False, "type": "timestamptz"},
            {"id": 4, "name": "d", "required": False,
             "type": {"type": "list", "element-id": 5, "element": "string",
                      "element-required": False}},
            {"id": 6, "name": "e", "required": False,
             "type": {"type": "struct", "fields": [
                 {"id": 7, "name": "x", "required": False, "type": "int"}]}},
            {"id": 8, "name": "f", "required": False,
             "type": {"type": "map", "key-id": 9, "key": "string",
                      "value-id": 10, "value": "double",
                      "value-required": False}},
        ],
    }
    ddl = iceberg_schema_to_ddl(sch)
    assert ddl == (
        "`a` long, `b` decimal(9, 2), `c` timestamp, `d` array<string>, "
        "`e` struct<`x`: int>, `f` map<string, double>"
    )


def test_concurrent_exporters_race_cleanly(tmp_path):
    """Two exporters racing on the same log: the put-if-absent claim
    serializes them; versions stay dense, the final snapshot matches
    the log, and the loser's orphaned avro files are cleaned up."""
    import threading

    log = VersionedLog(str(tmp_path / "ilog"))
    _append(log, [1, 2])
    results = []
    barrier = threading.Barrier(2)

    def race():
        l2 = VersionedLog(log.path)  # fresh handle, like a second host
        barrier.wait()
        results.append(export_iceberg_metadata(l2))

    ts = [threading.Thread(target=race) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results)[0] >= 1  # both landed on a committed version
    snap = read_iceberg_snapshot(log.path)
    assert sum(rc for rc, *_ in snap["files"].values()) == 2
    # every manifest/list file on disk is reachable from some metadata
    # version (losers cleaned their orphans)
    meta_dir = os.path.join(log.path, "metadata")
    reachable = set()
    for n in os.listdir(meta_dir):
        if n.endswith(".metadata.json"):
            with open(os.path.join(meta_dir, n)) as f:
                md = json.load(f)
            for s in md.get("snapshots", []):
                reachable.add(os.path.basename(s["manifest-list"]))
                with open(s["manifest-list"], "rb") as f:
                    for mf in avro_records(f.read()):
                        reachable.add(os.path.basename(mf["manifest_path"]))
    on_disk = {n for n in os.listdir(meta_dir) if n.endswith(".avro")}
    assert on_disk <= reachable, on_disk - reachable


def test_expire_snapshots_bounds_metadata(tmp_path, spark):
    log = ParquetLog(str(tmp_path / "ilog"))
    for batch in ([1, 2], [3], [4], [5]):
        _append(log, batch)
        export_iceberg_metadata(log)
    from flumedb_spark.sources.iceberg_export import expire_snapshots

    meta_dir = os.path.join(log.path, "metadata")
    n_avro_before = sum(1 for n in os.listdir(meta_dir) if n.endswith(".avro"))
    out = expire_snapshots(log.path, keep_last=2)
    assert out["version"] == 5 and out["expired"] == [1, 2]
    assert out["deleted"] >= 2  # expired lists + their unshared manifests

    md = _md(log.path, 5)
    assert [s["snapshot-id"] for s in md["snapshots"]] == [3, 4]
    assert md["current-snapshot-id"] == 4
    assert all(e["snapshot-id"] in (3, 4) for e in md["snapshot-log"])
    n_avro_after = sum(1 for n in os.listdir(meta_dir) if n.endswith(".avro"))
    assert n_avro_after < n_avro_before

    # the current snapshot still reads row-for-row
    snap = read_iceberg_snapshot(log.path)
    assert snap["version"] == 5 and snap["snapshot_id"] == 4
    assert sum(rc for rc, *_ in snap["files"].values()) == 5
    # kept history still time-travels; expired does not
    assert read_iceberg_snapshot(log.path, snapshot_id=3)["files"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_iceberg_snapshot(log.path, snapshot_id=1)
    # idempotent when nothing to expire
    assert expire_snapshots(log.path, keep_last=2)["expired"] == []
    # exports continue cleanly on the new metadata head
    _append(log, [6])
    assert export_iceberg_metadata(log) == 6
    snap = read_iceberg_snapshot(log.path)
    assert sum(rc for rc, *_ in snap["files"].values()) == 6


def test_column_bounds_and_manifest_pruning(tmp_path, spark):
    """Exported manifests carry seq lower/upper bounds (spec ids
    125-130, little-endian longs), and read_iceberg_table prunes
    provably-disjoint files at the MANIFEST level — fewer files handed
    to Spark, identical rows."""
    from flumedb_spark.sources.readers import read_iceberg_table

    log = ParquetLog(str(tmp_path / "ilog"))
    # three batch appends -> three data files with disjoint seq ranges
    for batch in (range(0, 10), range(10, 20), range(20, 30)):
        log.append([{"v": v} for v in batch])
        export_iceberg_metadata(log)

    snap = read_iceberg_snapshot(log.path)
    assert len(snap["files"]) == 3
    for rc, size, seq, bounds, add_snap in snap["files"].values():
        assert bounds is not None and 1 in bounds
        lo = int.from_bytes(bounds[1][0], "little", signed=True)
        hi = int.from_bytes(bounds[1][1], "little", signed=True)
        assert 0 <= lo <= hi <= 29 and hi - lo == 9

    # raw manifest carries the spec shape (array-of-kv "map")
    md = _md(log.path, 3)
    with open(md["snapshots"][-1]["manifest-list"], "rb") as f:
        (mf,) = avro_records(f.read())
    with open(mf["manifest_path"], "rb") as f:
        entries = avro_records(f.read())
    e = entries[0]["data_file"]
    assert e["lower_bounds"][0]["key"] == 1
    assert len(e["lower_bounds"][0]["value"]) == 8  # 8-byte LE long

    # pruned read: seq range [12, 17] must touch exactly one file
    df = read_iceberg_table(spark, log.path, seq_min=12, seq_max=17)
    assert df.inputFiles() is not None and len(df.inputFiles()) == 1
    assert sorted(r.seq for r in df.collect()) == list(range(12, 18))
    # boundary: range covering two files
    df2 = read_iceberg_table(spark, log.path, seq_min=9, seq_max=10)
    assert len(df2.inputFiles()) == 2
    assert sorted(r.seq for r in df2.collect()) == [9, 10]
    # provably-empty range: zero rows, zero files, schema intact
    df3 = read_iceberg_table(spark, log.path, seq_min=100)
    assert df3.count() == 0 and [f.name for f in df3.schema.fields] == [
        "seq", "ts", "value"
    ]
    # bounds survive restating as EXISTING entries in later snapshots
    log.append([{"v": 99}])
    export_iceberg_metadata(log)
    df4 = read_iceberg_table(spark, log.path, seq_min=0, seq_max=5)
    assert len(df4.inputFiles()) == 1
