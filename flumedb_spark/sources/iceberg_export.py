"""Export a log's committed state as Apache Iceberg (v2) table metadata.

``export_iceberg_metadata(log)`` maintains a ``metadata/`` directory
under the log root in the published Iceberg table-spec format
(https://iceberg.apache.org/spec/): ``v{N}.metadata.json`` table
metadata, one Avro manifest list per snapshot
(``snap-{snapshot-id}-1-{uuid}.avro``), Avro manifest files
(``{uuid}-m0.avro``), and the ``version-hint.text`` a HadoopCatalog
reader starts from. Data files are the log's own parquet files under
``data/`` referenced by absolute path, so an external Iceberg reader
pointed at ``log.path`` resolves exactly the committed rows — the same
interop contract ``delta_export`` provides for the Delta protocol.

The export is a SYNC, not a second commit path (same design as
delta_export): each call diffs the committed file set against the
current snapshot's live files and appends ONE new snapshot when they
differ. Manifest Avro files are written with this package's own
spec-encoder (``operators.archives.encode_avro_ocf`` — nested records,
required field-id attributes, deflate blocks); no Avro library exists
in this container, which is exactly why the encoder exists.

Spec subset (documented boundary, mirrored by the conformance tests):
unpartitioned spec-0 only, data manifests only (no delete files —
the log is append+compact, it never needs equality/position deletes),
required data_file columns only (content/file_path/file_format/
partition/record_count/file_size_in_bytes; per-column stats are an
optional-feature omission readers must tolerate per the spec's
"optional" field rules). Snapshot ids and sequence numbers are the
monotone export version. Conformance is pinned by
tests/test_iceberg_export.py: field-id golden checks against the spec
tables plus a replay reader that walks hint -> metadata -> manifest
list -> manifests and verifies the snapshot row-for-row via Spark.

Scale shape: each sync writes one manifest restating live files —
O(live files), which compaction keeps bounded (the same property the
Delta export leans on); reads are O(1 hint + 1 metadata + manifests of
the current snapshot) regardless of history length. At 100 TB the
manifest-per-snapshot granularity is the thing a real table service
would shard (Iceberg's manifest merge); this writer keeps the log's
compaction as that mechanism.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from ..operators.archives import avro_records, encode_avro_ocf

# --------------------------------------------------------------------
# Spec constants: schemas with the REQUIRED field-ids from the Iceberg
# table spec ("Manifests" and "Manifest Lists" tables).
# --------------------------------------------------------------------

#: Iceberg schema of the log table (seq/ts/value — log.py LOG_SCHEMA).
ICEBERG_TABLE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "seq", "required": True, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "timestamptz"},
        {"id": 3, "name": "value", "required": False, "type": "string"},
    ],
}
LAST_COLUMN_ID = 3

#: manifest_entry Avro schema (v2): spec "Manifests", required fields.
MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        # unpartitioned: empty partition struct (spec-0)
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    # per-column bounds (spec ids 125-130): the fields
                    # manifest-level file PRUNING runs on. Iceberg
                    # serializes int-keyed maps as arrays of key/value
                    # records with logicalType "map".
                    {
                        "name": "lower_bounds",
                        "field-id": 125,
                        "default": None,
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "logicalType": "map",
                                "items": {
                                    "type": "record",
                                    "name": "k126_v127",
                                    "fields": [
                                        {"name": "key", "type": "int", "field-id": 126},
                                        {"name": "value", "type": "bytes", "field-id": 127},
                                    ],
                                },
                            },
                        ],
                    },
                    {
                        "name": "upper_bounds",
                        "field-id": 128,
                        "default": None,
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "logicalType": "map",
                                "items": {
                                    "type": "record",
                                    "name": "k129_v130",
                                    "fields": [
                                        {"name": "key", "type": "int", "field-id": 129},
                                        {"name": "value", "type": "bytes", "field-id": 130},
                                    ],
                                },
                            },
                        ],
                    },
                ],
            },
        },
    ],
}

#: manifest_file Avro schema (v2): spec "Manifest Lists", required fields.
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_ENTRY_EXISTING = 0
_ENTRY_ADDED = 1


def _metadata_dir(table_root: str) -> str:
    return os.path.join(table_root, "metadata")


def _metadata_path(table_root: str, version: int) -> str:
    return os.path.join(_metadata_dir(table_root), f"v{version}.metadata.json")


def _read_version_hint(table_root: str) -> int:
    """``version-hint.text`` is a HINT (HadoopCatalog semantics): when
    missing or stale, fall back to listing ``v*.metadata.json``."""
    best = 0
    try:
        with open(os.path.join(_metadata_dir(table_root), "version-hint.text")) as f:
            best = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pass
    try:
        for n in os.listdir(_metadata_dir(table_root)):
            if n.startswith("v") and n.endswith(".metadata.json"):
                try:
                    best = max(best, int(n[1 : -len(".metadata.json")]))
                except ValueError:
                    pass
    except FileNotFoundError:
        pass
    return best  # 0 = no metadata yet


def _load_metadata(table_root: str, version: int) -> dict | None:
    try:
        with open(_metadata_path(table_root, version)) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return None


def _current_schema(md: dict) -> dict | None:
    """The schema whose schema-id equals the table's current-schema-id
    (spec: `schemas` is a LIST across evolution; index 0 is only the
    oldest). Falls back to schemas[0] for writers that omit the id —
    ADVICE r6: foreign tables with schema evolution resolved the wrong
    schema before this."""
    schemas = md.get("schemas") or [None]
    cur = md.get("current-schema-id")
    if cur is not None:
        for s in schemas:
            if isinstance(s, dict) and s.get("schema-id") == cur:
                return s
    return schemas[0]


def read_iceberg_snapshot(table_root: str, snapshot_id: int | None = None) -> dict:
    """Replay reader (the conformance half): walk version-hint ->
    metadata.json -> current snapshot -> manifest list (Avro) ->
    manifests (Avro) and return ``{"version", "snapshot_id",
    "sequence_number", "files": {path: (record_count, size,
    data_sequence_number, bounds)}, "schema"}`` for the live snapshot
    (``bounds`` = {field_id: (lower, upper)} single-value-serialized
    bytes, or None). Empty table -> version 0.

    ``snapshot_id`` = time travel: resolve that historical snapshot
    from the current metadata's snapshot list (Iceberg's VERSION AS OF
    rule — history lives in one metadata file, not a replay)."""
    version = _read_version_hint(table_root)
    if version <= 0:
        return {"version": 0, "snapshot_id": None, "sequence_number": 0,
                "files": {}, "schema": None}
    md = _load_metadata(table_root, version)
    if md is None:
        raise ValueError(f"iceberg: missing v{version}.metadata.json")
    snap_id = snapshot_id if snapshot_id is not None else md.get("current-snapshot-id")
    files: dict[str, tuple[int, int, int]] = {}
    if snap_id in (None, -1):
        return {"version": version, "snapshot_id": None,
                "sequence_number": md.get("last-sequence-number", 0),
                "files": files, "schema": _current_schema(md)}
    try:
        snap = next(s for s in md["snapshots"] if s["snapshot-id"] == snap_id)
    except StopIteration:
        raise ValueError(
            f"iceberg: snapshot {snap_id} not in table history "
            f"({[s['snapshot-id'] for s in md.get('snapshots', [])]})"
        ) from None
    with open(snap["manifest-list"], "rb") as f:
        manifest_list = avro_records(f.read())
    for mf in manifest_list:
        with open(mf["manifest_path"], "rb") as f:
            entries = avro_records(f.read())
        for e in entries:
            if e["status"] in (_ENTRY_EXISTING, _ENTRY_ADDED):
                d = e["data_file"]
                # explicit data sequence numbers (this writer never
                # relies on v2 inheritance); fall back to the
                # manifest's own seq for foreign inherited entries
                seq = e.get("sequence_number")
                if seq is None:
                    seq = mf["sequence_number"]
                # the snapshot a file was ADDED at (spec: entry
                # snapshot_id is the adding snapshot, preserved on
                # EXISTING restatements); inherit from the manifest's
                # added_snapshot_id when a foreign writer nulled it
                add_snap = e.get("snapshot_id")
                if add_snap is None:
                    add_snap = mf.get("added_snapshot_id", snap_id)
                files[d["file_path"]] = (
                    d["record_count"], d["file_size_in_bytes"], seq,
                    _bounds_maps(d), add_snap,
                )
    return {
        "version": version,
        "snapshot_id": snap_id,
        # the SNAPSHOT's sequence number (== head for the current
        # snapshot; differs under time travel)
        "sequence_number": snap.get(
            "sequence-number", md.get("last-sequence-number", 0)
        ),
        "files": files,
        "schema": _current_schema(md),
    }


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _long_bound(v: int) -> bytes:
    """Spec Appendix D single-value serialization for long: 8-byte
    little-endian (signed)."""
    return int(v).to_bytes(8, "little", signed=True)


def _parquet_seq_bounds(path: str) -> tuple[int, int] | None:
    """min/max of the ``seq`` column from parquet row-group statistics
    (footer-only — no data pages read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    try:
        idx = md.schema.names.index("seq")
    except ValueError:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (int(lo), int(hi))


def _bounds_maps(e_df: dict) -> dict[int, tuple[bytes, bytes]] | None:
    """data_file entry -> {field_id: (lower, upper)} byte bounds."""
    lows = e_df.get("lower_bounds")
    highs = e_df.get("upper_bounds")
    if not lows or not highs:
        return None
    lo = {kv["key"]: bytes(kv["value"]) for kv in lows}
    hi = {kv["key"]: bytes(kv["value"]) for kv in highs}
    return {k: (lo[k], hi[k]) for k in lo.keys() & hi.keys()}


def _atomic_claim(tmp: str, target: str) -> bool:
    """put-if-absent via os.link — the same CAS the VersionedLog commit
    and delta_export use; False when another exporter won the race."""
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _write_hint(table_root: str, version: int) -> None:
    tmp = os.path.join(_metadata_dir(table_root), f".tmphint.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(_metadata_dir(table_root), "version-hint.text"))


def export_iceberg_metadata(log) -> int:
    """Sync the log's committed manifest into ``<log.path>/metadata``
    as Iceberg v2 table metadata. Returns the metadata version now at
    the head (0 for an empty log with nothing to export). Idempotent:
    a no-change call writes nothing. Concurrent exporters race on the
    put-if-absent metadata.json link and retry against the winner."""
    refresh = getattr(log, "refresh_since", None)
    if refresh is not None:
        refresh()
    committed = list((log._meta or {}).get("files", []))
    root = log.path
    meta_dir = _metadata_dir(root)
    os.makedirs(meta_dir, exist_ok=True)

    for _ in range(64):
        snap = read_iceberg_snapshot(root)
        current = {os.path.join(root, "data", name) for name in committed}
        prev_files = snap["files"]
        adds = sorted(current - set(prev_files))
        removes = sorted(set(prev_files) - current)
        if not adds and not removes and snap["version"] > 0:
            return snap["version"]
        if not current and snap["version"] == 0:
            return 0  # empty log: no v1 metadata worth writing

        version = snap["version"] + 1
        seq_num = version  # monotone per spec; export version works
        snapshot_id = version
        now_ms = int(time.time() * 1000)

        # ---- one manifest restating the live file set --------------
        entries = []
        stats = {}
        for path in sorted(current):
            if path in prev_files:
                # an EXISTING entry keeps BOTH the data sequence number
                # and the snapshot_id it was ADDED at (spec: existing
                # entries preserve their adding snapshot, so external
                # incremental scans / metadata tables attribute files
                # correctly — ADVICE r6), carried through the replay
                # read — NOT the new snapshot's head values
                rc, size, add_seq, bounds, add_snap = prev_files[path]
                status = _ENTRY_EXISTING
            else:
                rc = _parquet_row_count(path)
                size = os.path.getsize(path)
                add_seq = seq_num
                add_snap = snapshot_id
                status = _ENTRY_ADDED
                # seq min/max from the parquet footer -> manifest-level
                # file pruning for range scans (field-id 1 == seq)
                sb = _parquet_seq_bounds(path)
                bounds = (
                    {1: (_long_bound(sb[0]), _long_bound(sb[1]))} if sb else None
                )
            stats[path] = (rc, size, status)
            data_file = {
                "content": 0,  # 0 = data (spec)
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": rc,
                "file_size_in_bytes": size,
                "lower_bounds": None,
                "upper_bounds": None,
            }
            if bounds:
                data_file["lower_bounds"] = [
                    {"key": k, "value": lo} for k, (lo, _) in sorted(bounds.items())
                ]
                data_file["upper_bounds"] = [
                    {"key": k, "value": hi} for k, (_, hi) in sorted(bounds.items())
                ]
            entries.append(
                {
                    "status": status,
                    "snapshot_id": add_snap,
                    "sequence_number": add_seq,
                    "file_sequence_number": None,
                    "data_file": data_file,
                }
            )
        manifest_name = f"{uuid.uuid4().hex}-m0.avro"
        manifest_path = os.path.join(meta_dir, manifest_name)
        manifest_bytes = encode_avro_ocf(
            MANIFEST_ENTRY_SCHEMA,
            entries,
            codec="deflate",
            extra_meta={
                # spec: manifests must carry these file-metadata keys
                "schema": json.dumps(ICEBERG_TABLE_SCHEMA),
                "schema-id": "0",
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            },
        )
        with open(manifest_path, "wb") as f:
            f.write(manifest_bytes)

        # ---- manifest list for the new snapshot --------------------
        added = [p for p in current if stats[p][2] == _ENTRY_ADDED]
        existing = [p for p in current if stats[p][2] == _ENTRY_EXISTING]
        min_seq = min(
            [e["sequence_number"] for e in entries if e["sequence_number"]],
            default=seq_num,
        )
        manifest_list_rec = {
            "manifest_path": manifest_path,
            "manifest_length": len(manifest_bytes),
            "partition_spec_id": 0,
            "content": 0,  # 0 = data manifests
            "sequence_number": seq_num,
            "min_sequence_number": min_seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(added),
            "existing_files_count": len(existing),
            "deleted_files_count": 0,
            "added_rows_count": sum(stats[p][0] for p in added),
            "existing_rows_count": sum(stats[p][0] for p in existing),
            "deleted_rows_count": 0,
        }
        list_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro"
        list_path = os.path.join(meta_dir, list_name)
        with open(list_path, "wb") as f:
            f.write(
                encode_avro_ocf(
                    MANIFEST_LIST_SCHEMA,
                    [manifest_list_rec],
                    codec="deflate",
                    extra_meta={
                        "snapshot-id": str(snapshot_id),
                        "parent-snapshot-id": str(snap["snapshot_id"] or "null"),
                        "sequence-number": str(seq_num),
                        "format-version": "2",
                    },
                )
            )

        # ---- table metadata json ------------------------------------
        prev_md = _load_metadata(root, snap["version"]) if snap["version"] else None
        operation = "overwrite" if removes else "append"
        snapshot = {
            "snapshot-id": snapshot_id,
            "sequence-number": seq_num,
            "timestamp-ms": now_ms,
            "manifest-list": list_path,
            "schema-id": 0,
            "summary": {
                "operation": operation,
                "added-data-files": str(len(adds)),
                "removed-data-files": str(len(removes)),
                "total-data-files": str(len(current)),
                "total-records": str(sum(stats[p][0] for p in current)),
            },
        }
        if snap["snapshot_id"] is not None:
            snapshot["parent-snapshot-id"] = snap["snapshot_id"]
        snapshots = (prev_md or {}).get("snapshots", []) + [snapshot]
        snapshot_log = (prev_md or {}).get("snapshot-log", []) + [
            {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
        ]
        metadata_log = (prev_md or {}).get("metadata-log", [])
        if prev_md is not None:
            metadata_log = metadata_log + [
                {
                    "timestamp-ms": prev_md["last-updated-ms"],
                    "metadata-file": _metadata_path(root, snap["version"]),
                }
            ]
        md = {
            "format-version": 2,
            "table-uuid": (prev_md or {}).get("table-uuid", str(uuid.uuid4())),
            "location": root,
            "last-sequence-number": seq_num,
            "last-updated-ms": now_ms,
            "last-column-id": LAST_COLUMN_ID,
            "current-schema-id": 0,
            "schemas": [ICEBERG_TABLE_SCHEMA],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,  # spec floor when no partition fields
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": snapshot_id,
            "snapshots": snapshots,
            "snapshot-log": snapshot_log,
            "metadata-log": metadata_log,
        }
        tmp = os.path.join(meta_dir, f".tmpmd.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(md, f)
            f.flush()
            os.fsync(f.fileno())
        if _atomic_claim(tmp, _metadata_path(root, version)):
            _write_hint(root, version)
            return version
        # lost the race: clean our orphaned avro files and retry
        for orphan in (manifest_path, list_path):
            try:
                os.remove(orphan)
            except OSError:
                pass
    raise RuntimeError("iceberg export: exhausted OCC retries")


def expire_snapshots(table_root: str, keep_last: int = 3) -> dict:
    """Iceberg snapshot-expiration maintenance (the spec's
    expireSnapshots): write a new metadata version whose snapshot list
    keeps only the most recent ``keep_last`` snapshots (always
    including the current one), then delete manifest-list and manifest
    files reachable ONLY from expired snapshots. Data files are never
    touched — the log owns data retention (vacuum), mirroring how this
    package splits Delta OPTIMIZE from VACUUM.

    Keeps time travel bounded: without expiration every export
    accumulates one manifest restating the live set, so metadata grows
    O(exports); with it, metadata is O(keep_last). Returns
    ``{"version", "expired": [ids], "deleted": n_files}``."""
    version = _read_version_hint(table_root)
    if version <= 0:
        return {"version": 0, "expired": [], "deleted": 0}
    md = _load_metadata(table_root, version)
    if md is None:
        raise ValueError(f"iceberg: missing v{version}.metadata.json")
    snaps = sorted(md.get("snapshots", []), key=lambda s: s["sequence-number"])
    if len(snaps) <= keep_last:
        return {"version": version, "expired": [], "deleted": 0}
    kept, expired = snaps[-keep_last:], snaps[:-keep_last]
    cur = md.get("current-snapshot-id")
    if cur is not None and cur not in {s["snapshot-id"] for s in kept}:
        raise ValueError("iceberg: refusing to expire the current snapshot")

    def reachable(snapshots) -> set[str]:
        out: set[str] = set()
        for s in snapshots:
            out.add(s["manifest-list"])
            try:
                with open(s["manifest-list"], "rb") as f:
                    for mf in avro_records(f.read()):
                        out.add(mf["manifest_path"])
            except (OSError, ValueError):
                continue  # already-missing list: nothing more to free
        return out

    keep_ids = {s["snapshot-id"] for s in kept}
    new_version = version + 1
    now_ms = int(time.time() * 1000)
    new_md = dict(md)
    new_md["snapshots"] = kept
    new_md["snapshot-log"] = [
        e for e in md.get("snapshot-log", []) if e["snapshot-id"] in keep_ids
    ]
    new_md["metadata-log"] = md.get("metadata-log", []) + [
        {"timestamp-ms": md["last-updated-ms"],
         "metadata-file": _metadata_path(table_root, version)}
    ]
    new_md["last-updated-ms"] = now_ms
    meta_dir = _metadata_dir(table_root)
    tmp = os.path.join(meta_dir, f".tmpmd.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(new_md, f)
        f.flush()
        os.fsync(f.fileno())
    if not _atomic_claim(tmp, _metadata_path(table_root, new_version)):
        raise RuntimeError(
            "iceberg expire: lost the version race; re-run after the "
            "concurrent exporter settles"
        )
    _write_hint(table_root, new_version)
    # deletion AFTER the commit: only files unreachable from any kept
    # snapshot die; a crash between commit and deletion leaves
    # harmless orphans a later expire re-collects
    doomed = reachable(expired) - reachable(kept)
    deleted = 0
    for path in doomed:
        try:
            os.remove(path)
            deleted += 1
        except OSError:
            pass
    return {
        "version": new_version,
        "expired": [s["snapshot-id"] for s in expired],
        "deleted": deleted,
    }
