"""Export a log's committed state as a real Delta-Lake transaction log.

``export_delta_log(log)`` maintains a ``_delta_log/`` directory under
the log root containing newline-delimited JSON action files in the
published Delta protocol format (delta-io PROTOCOL.md: one
``{version:020d}.json`` per commit; ``protocol`` + ``metaData`` actions
at version 0; ``add``/``remove`` + ``commitInfo`` actions per change).
Data files are the log's own parquet files referenced by table-root-
relative paths (``data/<name>``), so an external Delta reader
(delta-rs, Spark's delta connector, DuckDB's delta extension) pointed
at ``log.path`` reads exactly the committed rows — the integration
surface the reference ecosystem gets from flumedb's append-only log
being a plain directory (README.md:30-44: "just a log" interop).

The export is a SYNC, not a second commit path: the log's own manifest
stays authoritative, and each call diffs the committed file set against
what ``_delta_log`` already reflects, appending one new version when
they differ. Crash between a log commit and an export loses nothing —
the next export folds the difference into one Delta commit (Delta
permits multi-file commits; per-log-commit granularity is not promised).

Scale shape: action files are O(changed files) and snapshot replay is
O(total actions) — at 100 TB the log's compaction keeps the live file
count (and so the replay cost) bounded, exactly the job Delta
checkpoints do; ``keep_versions``-style pruning is deliberately NOT
applied here because external readers own the retention contract on
``_delta_log`` (VACUUM semantics), not this writer.

Container caveat (tested): no Delta reader is installable offline
(duckdb's delta extension needs a download), so conformance is pinned
by tests/test_delta_export.py against the protocol spec — field-level
golden checks plus a replay reader that reconstructs the snapshot and
verifies it row-for-row against the log.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _schema_string() -> str:
    """The log table's Delta schemaString (Spark StructType JSON — the
    format Delta's metaData action specifies)."""
    from ..log import LOG_SCHEMA

    return LOG_SCHEMA.json()


def _version_path(delta_dir: str, version: int) -> str:
    return os.path.join(delta_dir, f"{version:020d}.json")


def _existing_versions(delta_dir: str) -> list[int]:
    try:
        names = os.listdir(delta_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.endswith(".json") and not n.startswith("."):
            try:
                out.append(int(n[: -len(".json")]))
            except ValueError:
                pass
    return sorted(out)


def _read_last_checkpoint(delta_dir: str) -> dict | None:
    """The ``_last_checkpoint`` hint file (PROTOCOL.md: readers start
    snapshot construction from it instead of listing every version)."""
    try:
        with open(os.path.join(delta_dir, "_last_checkpoint")) as f:
            return json.loads(f.read())
    except (FileNotFoundError, ValueError):
        return None


def _checkpoint_path(delta_dir: str, version: int) -> str:
    return os.path.join(delta_dir, f"{version:020d}.checkpoint.parquet")


def read_delta_snapshot(table_root: str, at_version: int | None = None) -> dict:
    """Minimal Delta-log reader: load the latest checkpoint (when one
    exists — via the ``_last_checkpoint`` hint, exactly where an
    external reader starts) and replay only the NEWER action files in
    version order; return ``{"files": set[str], "metaData": dict |
    None, "protocol": dict | None, "version": int}``. This keeps every
    sync O(commits since last checkpoint), not O(table history) —
    the property Delta checkpoints exist to provide. The conformance
    tests prove the exported log round-trips both from the checkpoint
    and from a full JSON replay.

    ``at_version`` = time travel: reconstruct the snapshot as of that
    commit (the checkpoint is used only when it is not newer than the
    requested version — Delta's own VERSION AS OF rule)."""
    delta_dir = os.path.join(table_root, "_delta_log")
    versions = _existing_versions(delta_dir)
    if at_version is not None:
        if at_version not in versions:
            raise ValueError(
                f"delta: version {at_version} not present (have {versions[:3]}...{versions[-3:]})"
            )
        versions = [v for v in versions if v <= at_version]
    files: set[str] = set()
    meta = proto = None
    from_checkpoint = False
    replay_exc: Exception | None = None
    ckpt = _read_last_checkpoint(delta_dir)
    if ckpt is not None and at_version is not None and int(ckpt.get("version", -1)) > at_version:
        ckpt = None  # checkpoint is newer than the requested snapshot
    if ckpt is not None:
        try:
            cv = int(ckpt["version"])
            files, meta, proto = _load_checkpoint(_checkpoint_path(delta_dir, cv))
            versions = [v for v in versions if v > cv]
            from_checkpoint = True
            if not versions:
                return {
                    "files": files, "metaData": meta, "protocol": proto,
                    "version": cv,
                }
        except (KeyError, ValueError, OSError) as exc:
            files, meta, proto = set(), None, None
            versions = _existing_versions(delta_dir)
            if at_version is not None:
                versions = [v for v in versions if v <= at_version]
            replay_exc = exc
    if not from_checkpoint:
        # contiguity guard for EVERY full-replay path that does not start
        # from a readable checkpoint (ADVICE r7 hoist — previously only
        # the unreadable-checkpoint except branch checked): a missing or
        # corrupt ``_last_checkpoint`` hint, a time travel below the
        # checkpoint version, and a dead checkpoint all fall through to a
        # from-scratch JSON replay — and after clean_delta_log has
        # removed the commits a checkpoint covers, that replay would
        # silently return an incomplete file set (wrong data). A gapped
        # log without a readable checkpoint is unreadable; the honest
        # answer is an error. An empty log dir with no checkpoint
        # artifacts stays a legal empty table (version -1).
        gapped = bool(versions) and versions != list(range(0, versions[-1] + 1))
        if gapped or (not versions and replay_exc is not None):
            raise OSError(
                f"delta: no readable checkpoint in {delta_dir} and the "
                f"JSON log is gapped (earliest surviving commit "
                f"{versions[0] if versions else None}); refusing a "
                "replay that would return an incomplete snapshot"
            ) from replay_exc
    for v in versions:
        with open(_version_path(delta_dir, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    files.add(action["add"]["path"])
                elif "remove" in action:
                    files.discard(action["remove"]["path"])
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
    return {
        "files": files,
        "metaData": meta,
        "protocol": proto,
        "version": versions[-1] if versions else -1,
    }


def _load_checkpoint_full(
    path: str,
) -> tuple[set, dict | None, dict | None, dict]:
    """Read a classic single-file parquet checkpoint: one action per
    row in (protocol | metaData | add) struct columns. Returns
    (files, metaData, protocol, {path: (size, modificationTime)})."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    files: set[str] = set()
    meta = proto = None
    sizes: dict[str, tuple[int, int]] = {}
    cols = t.column_names
    rows = t.to_pylist()
    for r in rows:
        if "add" in cols and r.get("add") and r["add"].get("path"):
            a = r["add"]
            files.add(a["path"])
            sizes[a["path"]] = (a.get("size") or 0, a.get("modificationTime") or 0)
        elif "metaData" in cols and r.get("metaData") and r["metaData"].get("id"):
            meta = {k: v for k, v in r["metaData"].items() if v is not None}
            # parquet map fields come back as key/value tuple lists;
            # normalize to the dict shape the JSON actions carry so the
            # snapshot is identical whichever path produced it
            if "configuration" in meta:
                meta["configuration"] = dict(meta["configuration"] or [])
            if isinstance(meta.get("format"), dict):
                fmt = dict(meta["format"])
                fmt["options"] = dict(fmt.get("options") or [])
                meta["format"] = fmt
        elif "protocol" in cols and r.get("protocol") and (
            r["protocol"].get("minReaderVersion") is not None
        ):
            proto = r["protocol"]
    return files, meta, proto, sizes


def _load_checkpoint(path: str) -> tuple[set, dict | None, dict | None]:
    files, meta, proto, _ = _load_checkpoint_full(path)
    return files, meta, proto


def write_delta_checkpoint(table_root: str) -> int:
    """Write a classic single-file parquet checkpoint of the current
    snapshot at the head version, plus the ``_last_checkpoint`` hint.

    PROTOCOL.md checkpoint shape: one row per action, struct columns
    ``protocol`` / ``metaData`` / ``add`` (remove tombstones are only
    needed for VACUUM retention, which external readers own — this
    writer checkpoints live state, documented behavior). The parquet
    file is staged and atomically linked like the JSON commits;
    ``_last_checkpoint`` is a plain overwrite (it is a HINT — spec
    allows a stale or missing hint, readers fall back to listing).

    Returns the checkpointed version (-1 when there is nothing to
    checkpoint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    delta_dir = os.path.join(table_root, "_delta_log")
    versions = _existing_versions(delta_dir)
    if not versions:
        return -1
    snap_files: set[str] = set()
    meta = proto = None
    sizes: dict[str, tuple[int, int]] = {}
    # start from the previous checkpoint when one exists (O(tail), and
    # correct even after external retention removed pre-checkpoint JSON
    # files — the only files PROTOCOL.md's log cleanup may remove)
    prev = _read_last_checkpoint(delta_dir)
    if prev is not None:
        try:
            pv = int(prev["version"])
            snap_files, meta, proto, sizes = _load_checkpoint_full(
                _checkpoint_path(delta_dir, pv)
            )
            versions = [v for v in versions if v > pv]
            if not versions:
                return pv  # nothing newer to checkpoint
        except (KeyError, ValueError, OSError):
            snap_files, meta, proto, sizes = set(), None, None, {}
            versions = _existing_versions(delta_dir)
    for v in versions:
        with open(_version_path(delta_dir, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    snap_files.add(a["path"])
                    sizes[a["path"]] = (a.get("size", 0), a.get("modificationTime", 0))
                elif "remove" in action:
                    snap_files.discard(action["remove"]["path"])
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
    head = versions[-1]
    if proto is None or meta is None:
        raise ValueError("delta checkpoint: log has no protocol/metaData actions")

    map_t = pa.map_(pa.string(), pa.string())
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("format", pa.struct([("provider", pa.string()), ("options", map_t)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_t),
            ("createdTime", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    n = 2 + len(snap_files)
    proto_col: list = [None] * n
    meta_col: list = [None] * n
    add_col: list = [None] * n
    def _map_items(v) -> list:
        # metaData read back from a parquet checkpoint carries map
        # fields as key/value tuple lists; from JSON commits, as dicts
        if not v:
            return []
        return list(v.items()) if isinstance(v, dict) else list(v)

    proto_col[0] = proto
    meta_col[1] = {
        "id": meta.get("id"),
        "name": meta.get("name"),
        "format": {
            "provider": (meta.get("format") or {}).get("provider", "parquet"),
            "options": _map_items((meta.get("format") or {}).get("options")),
        },
        "schemaString": meta.get("schemaString"),
        "partitionColumns": meta.get("partitionColumns", []),
        "configuration": _map_items(meta.get("configuration")),
        "createdTime": meta.get("createdTime"),
    }
    for i, path in enumerate(sorted(snap_files)):
        size, mtime = sizes.get(path, (0, 0))
        add_col[2 + i] = {
            "path": path,
            "partitionValues": [],
            "size": size,
            "modificationTime": mtime,
            "dataChange": False,  # checkpoint rows restate, not change
        }
    table = pa.table(
        {
            "protocol": pa.array(proto_col, type=proto_t),
            "metaData": pa.array(meta_col, type=meta_t),
            "add": pa.array(add_col, type=add_t),
        }
    )
    tmp = os.path.join(delta_dir, f".tmpckpt.{uuid.uuid4().hex}")
    pq.write_table(table, tmp)
    target = _checkpoint_path(delta_dir, head)
    try:
        os.link(tmp, target)
    except FileExistsError:
        pass  # an identical-version checkpoint already exists; keep it
    finally:
        os.remove(tmp)
    hint = json.dumps({"version": head, "size": n})
    hint_tmp = os.path.join(delta_dir, f".tmphint.{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(hint)
        f.flush()
        os.fsync(f.fileno())
    os.replace(hint_tmp, os.path.join(delta_dir, "_last_checkpoint"))
    return head


def export_delta_log(
    log, operation: str = "WRITE", checkpoint_interval: int | None = 10
) -> int:
    """Sync the log's committed manifest into ``<log.path>/_delta_log``.

    Returns the Delta version now at the head (-1 for an empty log with
    nothing to export yet). Idempotent: a no-change call writes nothing.
    Concurrent exporters race on the same put-if-absent link the
    VersionedLog commit uses, so a lost race is retried against the
    winner's state rather than corrupting the version sequence.

    Every ``checkpoint_interval`` versions a parquet checkpoint +
    ``_last_checkpoint`` hint is written, so both this sync's own
    snapshot read and any external reader stay O(commits since last
    checkpoint) — a 1000-commit table costs one checkpoint load plus
    at most ``interval`` JSON files, never a 1000-file replay.
    """
    refresh = getattr(log, "refresh_since", None)
    if refresh is not None:
        refresh()
    committed = list((log._meta or {}).get("files", []))
    delta_dir = os.path.join(log.path, "_delta_log")
    os.makedirs(delta_dir, exist_ok=True)

    for _ in range(64):  # OCC retry against concurrent exporters
        snap = read_delta_snapshot(log.path)
        current = {f"data/{name}" for name in committed}
        adds = sorted(current - snap["files"])
        removes = sorted(snap["files"] - current)
        if not adds and not removes and snap["version"] >= 0:
            return snap["version"]
        if not current and snap["version"] < 0:
            return -1  # empty log, nothing worth a version-0 commit

        version = snap["version"] + 1
        now_ms = int(time.time() * 1000)
        lines: list[str] = []
        if version == 0:
            # PROTOCOL.md: the first commit must carry protocol +
            # metaData. minReaderVersion 1 / minWriterVersion 2 is the
            # baseline feature set this table needs (plain parquet,
            # no deletion vectors / column mapping).
            lines.append(
                json.dumps(
                    {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                )
            )
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": str(uuid.uuid4()),
                            "name": os.path.basename(log.path.rstrip("/")),
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": _schema_string(),
                            "partitionColumns": [],
                            "configuration": {},
                            "createdTime": now_ms,
                        }
                    }
                )
            )
        for path in removes:
            lines.append(
                json.dumps(
                    {
                        "remove": {
                            "path": path,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                        }
                    }
                )
            )
        for path in adds:
            fs_path = os.path.join(log.path, path)
            try:
                st = os.stat(fs_path)
                size, mtime_ms = st.st_size, int(st.st_mtime * 1000)
            except OSError:
                # manifest lists a file vacuumed between refresh and here;
                # retry against a fresh snapshot
                size = None
            if size is None:
                break
            lines.append(
                json.dumps(
                    {
                        "add": {
                            "path": path,
                            "partitionValues": {},
                            "size": size,
                            "modificationTime": mtime_ms,
                            "dataChange": True,
                        }
                    }
                )
            )
        else:
            lines.append(
                json.dumps(
                    {
                        "commitInfo": {
                            "timestamp": now_ms,
                            "operation": operation,
                            "operationParameters": {},
                            "engineInfo": "flumedb_spark delta-export",
                        }
                    }
                )
            )
            tmp = os.path.join(delta_dir, f".tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write("\n".join(lines) + "\n")
                f.flush()
                os.fsync(f.fileno())
            target = _version_path(delta_dir, version)
            try:
                os.link(tmp, target)  # atomic put-if-absent (the CAS)
                if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
                    write_delta_checkpoint(log.path)
                return version
            except FileExistsError:
                continue  # lost the race: replay against winner's state
            finally:
                os.remove(tmp)
        refresh() if refresh is not None else None
        committed = list((log._meta or {}).get("files", []))
    raise RuntimeError("delta export: put-if-absent contention exhausted retries")


def clean_delta_log(table_root: str, keep_versions: int = 10) -> dict:
    """Delta metadata retention (PROTOCOL.md "log cleanup"): delete
    JSON commit files that are BOTH covered by the latest checkpoint
    AND older than the newest ``keep_versions`` commits. Only files a
    checkpoint restates may be removed — a reader starting from
    ``_last_checkpoint`` never needs them; time travel to cleaned
    versions stops working, exactly as in Delta itself. Checkpoint
    parquet files for cleaned versions are also pruned (the latest one
    always stays). Returns ``{"deleted": n, "kept_from": version}``."""
    delta_dir = os.path.join(table_root, "_delta_log")
    ckpt = _read_last_checkpoint(delta_dir)
    if ckpt is None:
        return {"deleted": 0, "kept_from": None}  # nothing is covered yet
    try:
        cv = int(ckpt["version"])
    except (KeyError, ValueError):
        return {"deleted": 0, "kept_from": None}
    versions = _existing_versions(delta_dir)
    if not versions:
        return {"deleted": 0, "kept_from": None}
    keep_floor = versions[-1] - keep_versions + 1
    deleted = 0
    for v in versions:
        # v <= cv: restated by the checkpoint; v < keep_floor: out of
        # the retention window. BOTH must hold.
        if v <= cv and v < keep_floor:
            try:
                os.remove(_version_path(delta_dir, v))
                deleted += 1
            except OSError:
                pass
            old_ckpt = _checkpoint_path(delta_dir, v)
            if v < cv and os.path.exists(old_ckpt):
                try:
                    os.remove(old_ckpt)
                    deleted += 1
                except OSError:
                    pass
    return {"deleted": deleted, "kept_from": max(keep_floor, 0)}
