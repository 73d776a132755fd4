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


def read_delta_snapshot(table_root: str) -> dict:
    """Minimal Delta-log reader: replay every action file in version
    order and return ``{"files": set[str], "metaData": dict | None,
    "protocol": dict | None, "version": int}``. This is the same
    replay an external reader performs; the conformance tests use it to
    prove the exported log round-trips."""
    delta_dir = os.path.join(table_root, "_delta_log")
    versions = _existing_versions(delta_dir)
    files: set[str] = set()
    meta = proto = None
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


def export_delta_log(log, operation: str = "WRITE") -> int:
    """Sync the log's committed manifest into ``<log.path>/_delta_log``.

    Returns the Delta version now at the head (-1 for an empty log with
    nothing to export yet). Idempotent: a no-change call writes nothing.
    Concurrent exporters race on the same put-if-absent link the
    VersionedLog commit uses, so a lost race is retried against the
    winner's state rather than corrupting the version sequence.
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
                return version
            except FileExistsError:
                continue  # lost the race: replay against winner's state
            finally:
                os.remove(tmp)
        refresh() if refresh is not None else None
        committed = list((log._meta or {}).get("files", []))
    raise RuntimeError("delta export: put-if-absent contention exhausted retries")
