"""Distributed tar-shard sink — WebDataset-convention sample delivery
(Aizman et al. 2019, "High Performance I/O For Large Scale Deep
Learning"; the tar layout popularized by the webdataset library): each
sample is a group of adjacent tar members sharing a key —
``<key>.<ext>`` per field — and a dataset is a directory of tar shards
streamed sequentially by training loaders.

This is the OUTPUT stage of the curation pipeline: after filter /
dedup / decontaminate / select / pack, training wants shards, not a
warehouse table. One shard per non-empty partition, written
executor-side (shared storage in a cluster — the same assumption the
Avro sink and ParquetLog's bulk writer make); the driver collects only
the per-shard manifest.

Determinism: members are emitted in sorted-key order with pinned tar
metadata (USTAR, mtime=0, uid/gid=0, mode 0644), so a shard's bytes
are a pure function of its row set — rerun-stable, diffable, and
attestable: the round-trip row (``src_tar_roundtrip``) reads shards
back through the package's OWN archive extraction
(`operators/archives.archive_extract`) and checks content-exact
aggregates against the source table's DuckDB oracle.

Column -> member mapping: binary columns pass through; strings are
UTF-8; anything else is ``json.dumps``'d (sorted keys). At 100 TB the
shard size is governed by partitioning upstream (repartition to the
target shard record count); each executor streams its tar straight to
storage — no per-shard driver involvement, no second pass.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _jsonable(v):
    """Arrow/pandas hand arrays over as numpy objects — normalize to
    plain python containers before json.dumps (default=str would
    stringify a whole numpy array as one token otherwise)."""
    if hasattr(v, "tolist"):
        return v.tolist()
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _member_bytes(value, dt: T.DataType) -> bytes:
    if value is None:
        return b""
    if isinstance(dt, T.BinaryType):
        return bytes(value)
    if isinstance(dt, T.StringType):
        return str(value).encode("utf-8")
    return json.dumps(
        _jsonable(value), sort_keys=True, default=str
    ).encode("utf-8")


def write_tar_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str] | None = None,
) -> list[dict]:
    """Write ``df`` as WebDataset-style tar shards under ``path``.

    ``members`` maps column name -> member extension (default: every
    non-key column under its own name). Sample keys are the string
    form of ``key_col``, zero-padded when integral so lexicographic
    member order == key order. Returns the shard manifest
    ``[{"file", "n_samples", "n_members", "n_bytes"}, ...]``.
    """
    import pandas as pd

    schema = df.schema
    if members is None:
        members = {f.name: f.name for f in schema.fields if f.name != key_col}
    missing = [c for c in members if c not in schema.fieldNames()]
    if missing:
        raise ValueError(f"tar sink: unknown member columns {missing}")
    dtypes = {f.name: f.dataType for f in schema.fields}
    key_dt = dtypes[key_col]
    pad = isinstance(
        key_dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    cols = sorted(members)
    os.makedirs(path, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        if not rows:
            yield pd.DataFrame(
                {"file": [], "n_samples": [], "n_members": [], "n_bytes": []}
            )
            return
        rows.sort(key=lambda r: r[key_col])
        buf = io.BytesIO()
        n_members = 0
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for r in rows:
                key = (
                    f"{int(r[key_col]):012d}" if pad else str(r[key_col])
                )
                for c in cols:
                    data = _member_bytes(r.get(c), dtypes[c])
                    info = tarfile.TarInfo(name=f"{key}.{members[c]}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tf.addfile(info, io.BytesIO(data))
                    n_members += 1
        payload = buf.getvalue()
        fname = f"shard-{os.getpid()}-{uuid.uuid4().hex}.tar"
        tmp = os.path.join(path, f".tmp.{fname}")
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(path, fname))
        yield pd.DataFrame(
            {
                "file": [fname],
                "n_samples": [len(rows)],
                "n_members": [n_members],
                "n_bytes": [len(payload)],
            }
        )

    manifest = df.mapInPandas(
        run, "file string, n_samples long, n_members long, n_bytes long"
    ).collect()
    return [
        {
            "file": r.file,
            "n_samples": r.n_samples,
            "n_members": r.n_members,
            "n_bytes": r.n_bytes,
        }
        for r in manifest
        if r.file is not None
    ]


def read_tar_shards(spark, path: str) -> DataFrame:
    """Shards back as (shard, member, content, size, truncated) — the
    package's own distributed archive extraction over a binaryFile
    scan; training loaders stream the tars directly instead."""
    from pyspark.sql import functions as F

    from ..operators.archives import archive_extract

    payloads = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.tar"))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("shard"),
            F.col("content").alias("payload"),
        )
    )
    # archive_extract keys payloads by a LONG doc_id; hash the shard
    # name into one and join the name back after extraction
    keyed = payloads.select(
        F.xxhash64("shard").alias("doc_id"), "payload"
    )
    names = payloads.select(F.xxhash64("shard").alias("doc_id"), "shard")
    return (
        archive_extract(keyed)
        .join(F.broadcast(names), "doc_id")
        .select("shard", "member", "content", "size", "truncated", "ok")
    )
