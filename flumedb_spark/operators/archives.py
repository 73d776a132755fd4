"""Archive enumeration for document corpora: list zip/tar members from
binary payloads WITHOUT extraction — the triage pass a crawl-dump or
corpus-drop pipeline runs before deciding what to decompress.

Parsing is stdlib (``zipfile``/``tarfile`` over BytesIO — real,
battle-tested central-directory/header walks; no temp files, no
extraction I/O). The Spark surface is the usual Arrow-batched
``mapInPandas`` kernel, EXPLODED one row per member, with the shared
corrupt-blob contract: an unreadable archive yields a single
``ok=False`` row, never a partition failure.

At 100 TB: member listings are tiny next to payloads — run this first,
filter on name/size/method columns, and only route the surviving
(payload, member) pairs to an extraction stage.
"""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LISTING_SCHEMA = (
    "doc_id long, member string, size_u long, size_c long, "
    "method string, ok boolean"
)

# The corrupt-blob contract is "never a partition failure": a
# pathological payload can drive stdlib zipfile/tarfile/gzip into error
# types beyond ValueError (odd struct.errors, MemoryError from a
# decompression bomb, IndexError from short slices) — all of them must
# become an ok=False row, same as mmcodec's _malformed_raises_valueerror.
_MALFORMED = (ValueError, struct.error, IndexError, OverflowError, MemoryError)

# Per-payload decompression ceiling: a 100 TB ingest must not let one
# crafted gzip member OOM an executor (WARC gzip bombs are real inputs
# on crawl data). 1 GiB decompressed is far above any sane WARC shard.
MAX_DECOMPRESSED = 1 << 30

_ZIP_METHODS = {0: "stored", 8: "deflated", 12: "bzip2", 14: "lzma"}


def zip_listing(payload: bytes) -> list[dict]:
    """Central-directory member listing of a zip payload."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            return [
                {
                    "member": i.filename,
                    "size_u": i.file_size,
                    "size_c": i.compress_size,
                    "method": _ZIP_METHODS.get(i.compress_type, str(i.compress_type)),
                }
                for i in zf.infolist()
            ]
    except (zipfile.BadZipFile, OSError, ValueError, EOFError) as exc:
        raise ValueError(f"zip: unreadable archive: {exc}") from exc


def tar_listing(payload: bytes) -> list[dict]:
    """Member listing of a tar payload (plain or gz/bz2/xz via r:*)."""
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
            return [
                {
                    "member": m.name,
                    "size_u": m.size,
                    "size_c": m.size,  # tar stores members uncompressed
                    "method": "tar",
                }
                for m in tf.getmembers()
                if m.isfile()
            ]
    except (tarfile.TarError, OSError, ValueError, EOFError) as exc:
        raise ValueError(f"tar: unreadable archive: {exc}") from exc


def list_members(payload: bytes) -> list[dict]:
    """Magic-sniffed dispatch: zip (PK..) else tar. ValueError if
    neither parses."""
    if payload[:2] == b"PK":
        return zip_listing(payload)
    return tar_listing(payload)


def archive_listing(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) -> one row per archive member (exploded), with
    the corrupt-blob contract (unreadable -> single ok=False row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "member", "size_u", "size_c", "method", "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    members = list_members(bytes(p))
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["member"].append(None)
                    out["size_u"].append(0)
                    out["size_c"].append(0)
                    out["method"].append(None)
                    out["ok"].append(False)
                    continue
                for m in members:
                    out["doc_id"].append(doc_id)
                    out["member"].append(m["member"])
                    out["size_u"].append(m["size_u"])
                    out["size_c"].append(m["size_c"])
                    out["method"].append(m["method"])
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, LISTING_SCHEMA)


def synth_zip(doc_id: int) -> bytes:
    """Deterministic zip: 1 + doc_id % 5 stored members, member i named
    ``f<i>.txt`` with 10 + (doc_id*7 + i*13) % 90 bytes (the formulas a
    SQL oracle replays). Fixed timestamps keep the bytes reproducible."""
    d = int(doc_id)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for i in range(1 + d % 5):
            info = zipfile.ZipInfo(f"f{i}.txt", date_time=(2020, 1, 1, 0, 0, 0))
            zf.writestr(info, b"x" * (10 + (d * 7 + i * 13) % 90))
    return buf.getvalue()


def with_synthetic_zip_payload(docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [synth_zip(int(x)) for x in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


# ---------------------------------------------------------------------
# WARC — web-crawl records (ISO 28500), the container LLM text
# pipelines actually ingest (Common Crawl ships WARC/WAT/WET)
# ---------------------------------------------------------------------


def gunzip_capped(payload: bytes, what: str = "gzip", cap: int = MAX_DECOMPRESSED) -> bytes:
    """Decompress a gzip payload with a hard output-size ceiling.

    GzipFile reads CONCATENATED members, so per-record-gzipped crawl
    files decompress to one contiguous stream; the chunked read keeps a
    decompression bomb from materializing past ``cap`` bytes before we
    notice (a plain .read() would).
    """
    import gzip

    try:
        gz = gzip.GzipFile(fileobj=io.BytesIO(payload))
        chunks: list[bytes] = []
        total = 0
        while True:
            chunk = gz.read(1 << 22)
            if not chunk:
                break
            total += len(chunk)
            if total > cap:
                raise ValueError(f"{what}: decompressed size exceeds {cap}-byte cap")
            chunks.append(chunk)
        return b"".join(chunks)
    except (OSError, EOFError, zlib.error) as exc:
        # zlib.error: GzipFile surfaces raw inflate errors (e.g.
        # "invalid distance too far back") on mangled deflate bytes
        # without wrapping them (fuzz finding, r6)
        raise ValueError(f"{what}: bad gzip stream: {exc}") from exc


def warc_records(payload: bytes, with_bodies: bool = False) -> list[dict]:
    """Enumerate records of a WARC payload (plain or gzip, including
    the per-record-member gzip Common Crawl uses): record type, target
    URI, record id, and content length. With ``with_bodies`` each dict
    also carries the raw record block bytes under ``body``. ValueError
    on malformed input (the shared drop-the-row contract)."""
    if payload[:2] == b"\x1f\x8b":
        payload = gunzip_capped(payload, what="warc")
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and payload[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            raise ValueError(f"warc: expected version line at byte {pos}")
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("warc: unterminated header block")
        headers = {}
        lines = payload[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("warc: missing/bad Content-Length") from exc
        body_start = hdr_end + 4
        if length < 0 or body_start + length > n:
            # negative lengths would walk pos BACKWARDS and loop forever
            raise ValueError("warc: bad record body length")
        rec = {
            "record_type": headers.get(b"warc-type", b"").decode("ascii", "replace"),
            "target_uri": (
                headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
                or None
            ),
            "record_id": headers.get(b"warc-record-id", b"").decode("ascii", "replace"),
            "content_length": length,
        }
        if with_bodies:
            rec["body"] = payload[body_start : body_start + length]
        out.append(rec)
        pos = body_start + length
    if not out:
        raise ValueError("warc: no records")
    return out


def synth_warc(doc_id: int, gzipped: bool = False) -> bytes:
    """Deterministic WARC: a warcinfo record followed by doc_id % 4 + 1
    response records; response i targets http://ex.test/<doc_id>/<i>
    with a body of 20 + (doc_id*11 + i*17) % 180 bytes."""
    d = int(doc_id)

    def record(rtype: str, uri: str | None, rid: str, body: bytes) -> bytes:
        h = f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Record-ID: {rid}\r\n"
        if uri:
            h += f"WARC-Target-URI: {uri}\r\n"
        h += f"Content-Length: {len(body)}\r\n\r\n"
        return h.encode("ascii") + body + b"\r\n\r\n"

    out = record("warcinfo", None, f"<urn:test:{d}:info>", b"software: synth\r\n")
    for i in range(1 + d % 4):
        body = b"y" * (20 + (d * 11 + i * 17) % 180)
        out += record(
            "response", f"http://ex.test/{d}/{i}", f"<urn:test:{d}:{i}>", body
        )
    if gzipped:
        import gzip

        return gzip.compress(out, mtime=0)
    return out


def warc_listing(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) -> one row per WARC record (exploded), with
    the corrupt-blob ok=False contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("record_type", "target_uri", "record_id", "content_length")
        for pdf in batches:
            out = {k: [] for k in ("doc_id", *cols, "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    recs = warc_records(bytes(p))
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    for c in ("record_type", "target_uri", "record_id"):
                        out[c].append(None)
                    out["content_length"].append(0)
                    out["ok"].append(False)
                    continue
                for r in recs:
                    out["doc_id"].append(doc_id)
                    for c in cols:
                        out[c].append(r[c])
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, record_type string, target_uri string, "
        "record_id string, content_length long, ok boolean",
    )


def with_synthetic_warc_payload(docs: DataFrame, gzipped: bool = True) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        synth_warc(int(x), gzipped=gzipped) for x in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


# ---------------------------------------------------------------------
# data-file triage: Avro OCF headers + Parquet footers from payloads
# ---------------------------------------------------------------------
# The registry pass over a drop directory of unknown data files: schema
# name/width, codec, row counts — without loading any of them as a
# table. Avro is parsed from the public OCF spec (stdlib only); Parquet
# uses pyarrow's footer reader over BytesIO (no temp files).


def _avro_varint(payload: bytes, pos: int) -> tuple[int, int]:
    """Zigzag varint (Avro long) at ``pos`` -> (value, next_pos)."""
    shift = acc = 0
    while True:
        if pos >= len(payload):
            raise ValueError("avro: truncated varint")
        b = payload[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("avro: varint overflow")
    return (acc >> 1) ^ -(acc & 1), pos


def avro_meta(payload: bytes) -> dict:
    """Object-container-file metadata: schema name/type/field count,
    codec, block and record counts (block walk, no deserialization)."""
    import json as _json

    if payload[:4] != b"Obj\x01":
        raise ValueError("avro: no OCF magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _avro_varint(payload, pos)
        if count == 0:
            break
        if count < 0:  # negative block count: size follows (spec)
            _, pos = _avro_varint(payload, pos)
            count = -count
        if count > 1_000_000:
            raise ValueError("avro: implausible metadata count")
        for _ in range(count):
            klen, pos = _avro_varint(payload, pos)
            # negative/oversized lengths from corrupt bytes must raise,
            # not walk pos backwards into an infinite loop (fuzz finding)
            if klen < 0 or pos + klen > len(payload):
                raise ValueError("avro: bad metadata key length")
            key = payload[pos : pos + klen].decode("utf-8", "replace")
            pos += klen
            vlen, pos = _avro_varint(payload, pos)
            if vlen < 0 or pos + vlen > len(payload):
                raise ValueError("avro: bad metadata value length")
            meta[key] = payload[pos : pos + vlen]
            pos += vlen
    sync = payload[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("avro: truncated sync marker")
    pos += 16
    try:
        schema = _json.loads(meta["avro.schema"])
    except (KeyError, ValueError) as exc:
        raise ValueError(f"avro: bad or missing schema: {exc}") from exc
    n_blocks = n_records = 0
    while pos < len(payload):
        cnt, pos = _avro_varint(payload, pos)
        size, pos = _avro_varint(payload, pos)
        if cnt < 0 or size < 0 or pos + size + 16 > len(payload):
            raise ValueError("avro: truncated data block")
        if payload[pos + size : pos + size + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        n_blocks += 1
        n_records += cnt
        pos += size + 16
    if isinstance(schema, dict):
        name = schema.get("name")
        stype = schema.get("type")
        n_fields = len(schema.get("fields", []))
    else:
        name, stype, n_fields = None, str(schema), 0
    return {
        "schema_name": name,
        "schema_type": stype,
        "n_fields": n_fields,
        "codec": meta.get("avro.codec", b"null").decode("ascii", "replace"),
        "n_blocks": n_blocks,
        "n_records": n_records,
    }


def encode_avro_skeleton(
    schema_name: str = "rec",
    n_fields: int = 3,
    block_counts: tuple[int, ...] = (5, 7),
    codec: str = "null",
) -> bytes:
    """OCF with a real header and empty-bodied data blocks (counts are
    real; record bytes are opaque to the header walk) — the synthesizer
    twin of ``avro_meta``."""
    import json as _json

    def zz(v: int) -> bytes:
        u = (v << 1) ^ (v >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = _json.dumps(
        {
            "type": "record",
            "name": schema_name,
            "fields": [{"name": f"c{i}", "type": "long"} for i in range(n_fields)],
        }
    ).encode()
    sync = bytes(range(16))
    out = bytearray(b"Obj\x01")
    out += zz(2)  # two metadata entries
    for k, v in ((b"avro.schema", schema), (b"avro.codec", codec.encode())):
        out += zz(len(k)) + k + zz(len(v)) + v
    out += zz(0) + sync
    for cnt in block_counts:
        body = b"\x00" * cnt  # opaque to the header walk
        out += zz(cnt) + zz(len(body)) + body + sync
    return bytes(out)


def parquet_meta(payload: bytes) -> dict:
    """Footer metadata of a parquet payload via pyarrow (no temp
    files): rows, row groups, columns, writer, first-column codec."""
    import pyarrow.parquet as pq

    try:
        pf = pq.ParquetFile(io.BytesIO(payload))
        md = pf.metadata
        codec = (
            md.row_group(0).column(0).compression.lower()
            if md.num_row_groups
            else None
        )
        return {
            "n_rows": md.num_rows,
            "n_row_groups": md.num_row_groups,
            "n_columns": md.num_columns,
            "created_by": md.created_by,
            "codec": codec,
        }
    except Exception as exc:  # pyarrow raises a zoo of types on bad footers
        raise ValueError(f"parquet: unreadable footer: {exc}") from exc


def datafile_meta(payload: bytes) -> dict:
    """Magic-sniffed dispatch over data-file payloads: parquet (PAR1),
    avro (Obj\\x01) — the registry pass a lakehouse drop-directory
    pipeline runs before loading anything as a table."""
    if payload[:4] == b"PAR1":
        m = parquet_meta(payload)
        return {"format": "parquet", **m}
    if payload[:4] == b"Obj\x01":
        m = avro_meta(payload)
        return {
            "format": "avro",
            "n_rows": m["n_records"],
            "n_row_groups": m["n_blocks"],
            "n_columns": m["n_fields"],
            "created_by": m["schema_name"],
            "codec": m["codec"],
        }
    raise ValueError("datafile: neither parquet nor avro magic")


DATAFILE_SCHEMA = (
    "doc_id long, format string, n_rows long, n_row_groups long, "
    "n_columns long, codec string, created_by string, ok boolean"
)


def datafile_meta_df(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) -> one datafile-registry row per payload
    (format, rows, row groups, columns, codec) with the corrupt-blob
    ok=False contract. The triage pass a lakehouse drop-directory
    pipeline runs before loading anything as a table; at 100 TB the
    footer/header walk reads tail/head bytes only, never row data."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("format", "n_rows", "n_row_groups", "n_columns", "codec", "created_by")
        for pdf in batches:
            out = {k: [] for k in ("doc_id", *cols, "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    m = datafile_meta(bytes(p))
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["format"].append(None)
                    for c in ("n_rows", "n_row_groups", "n_columns"):
                        out[c].append(0)
                    out["codec"].append(None)
                    out["created_by"].append(None)
                    out["ok"].append(False)
                    continue
                out["doc_id"].append(doc_id)
                for c in cols:
                    out[c].append(m[c])
                out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, DATAFILE_SCHEMA)


def synth_datafile(doc_id: int) -> bytes:
    """Deterministic data-file payload: even doc_ids get a REAL parquet
    file (pyarrow-written: 1 + d%10 rows, 1 + d%3 long columns,
    row_group_size 4, snappy unless d%4==0), odd get a REAL Avro OCF
    (1 + d%4 fields, blocks of 1+d%5 and 1+d%3 records, deflate header
    when d%3==0) — formulas a SQL oracle replays arithmetically."""
    d = int(doc_id)
    if d % 2 == 0:
        import pyarrow as pa
        import pyarrow.parquet as pq

        n_rows = 1 + d % 10
        n_cols = 1 + d % 3
        table = pa.table(
            {f"c{i}": list(range(n_rows)) for i in range(n_cols)},
            schema=pa.schema([(f"c{i}", pa.int64()) for i in range(n_cols)]),
        )
        buf = io.BytesIO()
        pq.write_table(
            table,
            buf,
            row_group_size=4,
            compression="NONE" if d % 4 == 0 else "snappy",
        )
        return buf.getvalue()
    return encode_avro_skeleton(
        schema_name="rec",
        n_fields=1 + d % 4,
        block_counts=(1 + d % 5, 1 + d % 3),
        codec="deflate" if d % 3 == 0 else "null",
    )


def with_synthetic_datafile_payload(docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [synth_datafile(int(x)) for x in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


# ---------------------------------------------------------------------
# extraction stage: member bytes / WARC response bodies as rows
# ---------------------------------------------------------------------
# The second stage the listing pass routes into (module docstring
# contract): given archive payloads, emit the surviving members'
# CONTENT as rows. Per-member size is hard-capped so one pathological
# member (zip bomb, multi-GB crawl body) cannot OOM an executor: bytes
# past the cap are dropped and the row is flagged truncated=true, which
# lets a 100 TB pipeline keep its memory ceiling per-task deterministic
# (cap x rows-in-flight) regardless of input.

MAX_MEMBER_BYTES = 1 << 26  # 64 MiB per member/body — far above web-doc p99

EXTRACT_SCHEMA = (
    "doc_id long, member string, content binary, size long, "
    "truncated boolean, ok boolean"
)


def extract_members(
    payload: bytes,
    member_pattern: str | None = None,
    cap: int = MAX_MEMBER_BYTES,
) -> list[dict]:
    """Extract file members of a zip/tar payload (magic-sniffed like
    ``list_members``): (member, content, size, truncated). ``size`` is
    the member's TRUE uncompressed size even when content is capped.
    ``member_pattern`` filters member names kernel-side (regex search)
    so unneeded members are never decompressed at all."""
    import re

    pat = re.compile(member_pattern) if member_pattern else None
    out = []
    if payload[:2] == b"PK":
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for i in zf.infolist():
                    if i.is_dir() or (pat and not pat.search(i.filename)):
                        continue
                    with zf.open(i) as f:
                        content = f.read(cap + 1)
                    out.append(
                        {
                            "member": i.filename,
                            "content": content[:cap],
                            "size": i.file_size,
                            "truncated": len(content) > cap,
                        }
                    )
        except (
            zipfile.BadZipFile, OSError, ValueError, EOFError,
            # fuzz finding (r6): a corrupt compression-method byte makes
            # stdlib zipfile raise NotImplementedError ("method not
            # supported") or RuntimeError from zf.open(), and a mangled
            # deflate stream can surface zlib.error — all must become
            # the drop-the-row ValueError, never a partition failure
            NotImplementedError, RuntimeError, zlib.error,
        ) as exc:
            raise ValueError(f"zip: unreadable archive: {exc}") from exc
        return out
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
            for m in tf.getmembers():
                if not m.isfile() or (pat and not pat.search(m.name)):
                    continue
                f = tf.extractfile(m)
                content = f.read(cap + 1) if f is not None else b""
                out.append(
                    {
                        "member": m.name,
                        "content": content[:cap],
                        "size": m.size,
                        "truncated": len(content) > cap,
                    }
                )
    except (
        tarfile.TarError, OSError, ValueError, EOFError,
        NotImplementedError, RuntimeError, zlib.error,
    ) as exc:
        raise ValueError(f"tar: unreadable archive: {exc}") from exc
    return out


def archive_extract(
    payloads: DataFrame,
    member_pattern: str | None = None,
    cap: int = MAX_MEMBER_BYTES,
) -> DataFrame:
    """(doc_id, payload) -> one row per extracted member with its
    content bytes (exploded), corrupt-blob ok=False contract. Filter on
    a listing pass first when most members are unwanted — but when the
    filter is a name pattern, ``member_pattern`` pushes it into the
    kernel so skipped members are never decompressed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "member", "content", "size", "truncated", "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    members = extract_members(bytes(p), member_pattern, cap)
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["member"].append(None)
                    out["content"].append(None)
                    out["size"].append(0)
                    out["truncated"].append(False)
                    out["ok"].append(False)
                    continue
                for m in members:
                    out["doc_id"].append(doc_id)
                    out["member"].append(m["member"])
                    out["content"].append(m["content"])
                    out["size"].append(m["size"])
                    out["truncated"].append(m["truncated"])
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, EXTRACT_SCHEMA)


def strip_http_payload(body: bytes) -> bytes:
    """WARC response blocks hold the full HTTP message; the corpus text
    lives after the header/payload boundary. Returns the HTTP payload
    when the block starts with a status line, else the block verbatim
    (WET conversions ship bare text)."""
    if body[:5] in (b"HTTP/", b"http/"):
        sep = body.find(b"\r\n\r\n")
        if sep >= 0:
            return body[sep + 4 :]
    return body


WARC_BODIES_SCHEMA = (
    "doc_id long, record_id string, target_uri string, body binary, "
    "content_length long, truncated boolean, ok boolean"
)


def warc_bodies(
    payloads: DataFrame,
    record_types: tuple[str, ...] = ("response",),
    strip_http: bool = True,
    cap: int = MAX_MEMBER_BYTES,
) -> DataFrame:
    """(doc_id, payload) -> one row per WARC record of the requested
    types with its body bytes — the Common Crawl ingest stage proper
    (response bodies, not listings). HTTP headers are stripped from
    response blocks by default; bodies past ``cap`` are truncated and
    flagged. Corrupt payloads yield the usual single ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "record_id", "target_uri", "body",
                    "content_length", "truncated", "ok",
                )
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    recs = warc_records(bytes(p), with_bodies=True)
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["record_id"].append(None)
                    out["target_uri"].append(None)
                    out["body"].append(None)
                    out["content_length"].append(0)
                    out["truncated"].append(False)
                    out["ok"].append(False)
                    continue
                for r in recs:
                    if record_types and r["record_type"] not in record_types:
                        continue
                    body = r["body"]
                    if strip_http:
                        body = strip_http_payload(body)
                    out["doc_id"].append(doc_id)
                    out["record_id"].append(r["record_id"])
                    out["target_uri"].append(r["target_uri"])
                    out["body"].append(body[:cap])
                    out["content_length"].append(r["content_length"])
                    out["truncated"].append(len(body) > cap)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, WARC_BODIES_SCHEMA)


# ---------------------------------------------------------------------
# Avro record DECODING: OCF data blocks -> rows
# ---------------------------------------------------------------------
# The triage pass above (avro_meta / datafile_meta) reads headers only;
# this is the ingest stage proper: decode the data blocks' records per
# the Avro 1.11 binary encoding (public spec, "Binary Encoding"
# section) so an OCF drop becomes queryable rows without fastavro.
# Codecs: null and deflate (raw DEFLATE, the two the spec requires).
# Container decodes are item-capped so a crafted count varint (an
# array-of-null claims 2^60 items in 0 bytes) raises instead of
# looping; block decompression is byte-capped like the WARC path.

_MAX_CONTAINER_ITEMS = 1_000_000


def _avro_zz(v: int) -> bytes:
    """Zigzag-varint encode a long (encoder twin of _avro_varint)."""
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_take(buf: bytes, pos: int, n: int, what: str) -> tuple[bytes, int]:
    if n < 0 or pos + n > len(buf):
        raise ValueError(f"avro: truncated {what}")
    return buf[pos : pos + n], pos + n


def _register_named(schema, names: dict) -> None:
    """Walk a schema JSON and register named types (record/enum/fixed)
    by name and fullname so later string references resolve."""
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    name = schema.get("name")
    if name and t in ("record", "enum", "fixed"):
        names[name] = schema
        ns = schema.get("namespace")
        if ns:
            names[f"{ns}.{name}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register_named(f.get("type"), names)
    elif t == "array":
        _register_named(schema.get("items"), names)
    elif t == "map":
        _register_named(schema.get("values"), names)


def _decode_avro_value(buf: bytes, pos: int, schema, names: dict):
    """Decode one value of ``schema`` at ``pos`` -> (value, next_pos).
    Supports the full primitive set plus record/enum/array/map/union/
    fixed and named-type references."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None, pos
        if t == "boolean":
            raw, pos = _avro_take(buf, pos, 1, "boolean")
            if raw[0] not in (0, 1):
                raise ValueError("avro: bad boolean byte")
            return bool(raw[0]), pos
        if t in ("int", "long"):
            return _avro_varint(buf, pos)
        if t == "float":
            raw, pos = _avro_take(buf, pos, 4, "float")
            return struct.unpack("<f", raw)[0], pos
        if t == "double":
            raw, pos = _avro_take(buf, pos, 8, "double")
            return struct.unpack("<d", raw)[0], pos
        if t in ("bytes", "string"):
            n, pos = _avro_varint(buf, pos)
            raw, pos = _avro_take(buf, pos, n, t)
            return (raw.decode("utf-8") if t == "string" else raw), pos
        if t in names:
            return _decode_avro_value(buf, pos, names[t], names)
        raise ValueError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):  # union: long index then value
        idx, pos = _avro_varint(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError("avro: union index out of range")
        return _decode_avro_value(buf, pos, schema[idx], names)
    if not isinstance(schema, dict):
        raise ValueError("avro: malformed schema node")
    t = schema.get("type")
    if t == "record":
        out = {}
        for f in schema.get("fields", []):
            out[f["name"]], pos = _decode_avro_value(buf, pos, f.get("type"), names)
        return out, pos
    if t == "enum":
        idx, pos = _avro_varint(buf, pos)
        symbols = schema.get("symbols", [])
        if not 0 <= idx < len(symbols):
            raise ValueError("avro: enum index out of range")
        return symbols[idx], pos
    if t == "fixed":
        raw, pos = _avro_take(buf, pos, int(schema.get("size", -1)), "fixed")
        return raw, pos
    if t == "array":
        items = []
        while True:
            cnt, pos = _avro_varint(buf, pos)
            if cnt == 0:
                return items, pos
            if cnt < 0:  # negative count: byte size follows (spec)
                _, pos = _avro_varint(buf, pos)
                cnt = -cnt
            if cnt + len(items) > _MAX_CONTAINER_ITEMS:
                raise ValueError("avro: implausible array count")
            for _ in range(cnt):
                v, pos = _decode_avro_value(buf, pos, schema.get("items"), names)
                items.append(v)
    if t == "map":
        entries = {}
        while True:
            cnt, pos = _avro_varint(buf, pos)
            if cnt == 0:
                return entries, pos
            if cnt < 0:
                _, pos = _avro_varint(buf, pos)
                cnt = -cnt
            if cnt + len(entries) > _MAX_CONTAINER_ITEMS:
                raise ValueError("avro: implausible map count")
            for _ in range(cnt):
                klen, pos = _avro_varint(buf, pos)
                kraw, pos = _avro_take(buf, pos, klen, "map key")
                entries[kraw.decode("utf-8")], pos = _decode_avro_value(
                    buf, pos, schema.get("values"), names
                )
    # {"type": "long", ...} wrapper form of a primitive/named ref
    if isinstance(t, (str, list, dict)):
        return _decode_avro_value(buf, pos, t, names)
    raise ValueError(f"avro: unknown complex type {t!r}")


def _avro_decompress_block(data: bytes, codec: str) -> bytes:
    if codec in ("null", ""):
        return data
    if codec == "deflate":
        try:
            d = zlib.decompressobj(-15)
            out = d.decompress(data, MAX_DECOMPRESSED + 1)
        except zlib.error as exc:
            raise ValueError(f"avro: bad deflate block: {exc}") from exc
        if len(out) > MAX_DECOMPRESSED:
            raise ValueError("avro: deflate block exceeds decompression cap")
        return out
    if codec == "snappy":  # compressed bytes + 4-byte BE CRC32 (spec)
        from . import snappycodec

        return snappycodec.avro_block_decompress(data, MAX_DECOMPRESSED)
    raise ValueError(f"avro: unsupported codec {codec!r}")


def avro_records(payload: bytes, max_records: int = _MAX_CONTAINER_ITEMS) -> list[dict]:
    """Decode ALL records of an Avro OCF payload -> list of dicts (one
    per record, top-level record schema required). Strict: every block
    must decode exactly its declared record count and consume exactly
    its declared bytes, and the sync marker must match."""
    import json as _json

    if payload[:4] != b"Obj\x01":
        raise ValueError("avro: no OCF magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _avro_varint(payload, pos)
        if count == 0:
            break
        if count < 0:
            _, pos = _avro_varint(payload, pos)
            count = -count
        if count > 1_000_000:
            raise ValueError("avro: implausible metadata count")
        for _ in range(count):
            klen, pos = _avro_varint(payload, pos)
            kraw, pos = _avro_take(payload, pos, klen, "metadata key")
            vlen, pos = _avro_varint(payload, pos)
            vraw, pos = _avro_take(payload, pos, vlen, "metadata value")
            meta[kraw.decode("utf-8", "replace")] = vraw
    sync, pos = _avro_take(payload, pos, 16, "sync marker")
    try:
        schema = _json.loads(meta["avro.schema"])
    except (KeyError, ValueError) as exc:
        raise ValueError(f"avro: bad or missing schema: {exc}") from exc
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro: top-level schema is not a record")
    codec = meta.get("avro.codec", b"null").decode("ascii", "replace")
    # The schema is untrusted JSON: arbitrary shapes surface as
    # KeyError/TypeError/AttributeError deep in the decode walk — all
    # must become the contract ValueError, never a partition failure
    # (fuzz finding: a bitflipped field dict losing its "name" key).
    _SCHEMA_SHAPE = (KeyError, TypeError, AttributeError, UnicodeDecodeError)
    names: dict = {}
    try:
        _register_named(schema, names)
    except _SCHEMA_SHAPE as exc:
        raise ValueError(f"avro: malformed schema: {exc!r}") from exc
    records: list[dict] = []
    while pos < len(payload):
        cnt, pos = _avro_varint(payload, pos)
        size, pos = _avro_varint(payload, pos)
        raw, pos = _avro_take(payload, pos, size, "data block")
        marker, pos = _avro_take(payload, pos, 16, "block sync")
        if marker != sync:
            raise ValueError("avro: sync marker mismatch")
        if cnt < 0 or cnt + len(records) > max_records:
            raise ValueError("avro: implausible record count")
        block = _avro_decompress_block(raw, codec)
        bpos = 0
        for _ in range(cnt):
            try:
                rec, bpos = _decode_avro_value(block, bpos, schema, names)
            except _SCHEMA_SHAPE as exc:
                raise ValueError(f"avro: undecodable record: {exc!r}") from exc
            records.append(rec)
        if bpos != len(block):
            raise ValueError("avro: data block has trailing bytes")
    return records


def encode_avro_records(
    rows: list[dict],
    fields: list[tuple[str, str]],
    codec: str = "null",
    block_records: int = 4,
    schema_name: str = "rec",
) -> bytes:
    """Write a REAL Avro OCF: flat record schema over ``fields``
    (name, type) with type in long/int/string/double/boolean/bytes,
    records from ``rows``, ``block_records`` per data block — the
    encoder twin of :func:`avro_records`."""
    import json as _json

    def enc(v, t: str) -> bytes:
        if t in ("long", "int"):
            return _avro_zz(int(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("string", "bytes"):
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            return _avro_zz(len(raw)) + raw
        raise ValueError(f"avro encode: unsupported type {t!r}")

    schema = _json.dumps(
        {
            "type": "record",
            "name": schema_name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    ).encode()
    sync = bytes((i * 7 + 3) % 256 for i in range(16))
    out = bytearray(b"Obj\x01")
    out += _avro_zz(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", codec.encode())):
        out += _avro_zz(len(k)) + k + _avro_zz(len(v)) + v
    out += _avro_zz(0) + sync
    for start in range(0, len(rows), block_records):
        chunk = rows[start : start + block_records]
        body = b"".join(enc(r[n], t) for r in chunk for n, t in fields)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = c.compress(body) + c.flush()
        elif codec == "snappy":
            from . import snappycodec

            body = snappycodec.avro_block_compress(body)
        elif codec != "null":
            raise ValueError(f"avro encode: unsupported codec {codec!r}")
        out += _avro_zz(len(chunk)) + _avro_zz(len(body)) + body + sync
    return bytes(out)


def avro_records_df(payloads: DataFrame, fields: str) -> DataFrame:
    """(doc_id, payload) -> one row per decoded Avro record, projecting
    the declared top-level ``fields`` (Spark DDL, e.g. ``"c0 long,
    c1 string, c2 double"``; a field absent from a record is null).
    Corrupt payloads yield the usual single ok=False row. At 100 TB
    this is the load stage after :func:`datafile_meta_df` triage: the
    kernel is per-payload and Arrow-batched, so throughput scales with
    executors and the decompression/item caps bound per-task memory."""
    names = [c.strip().split()[0] for c in fields.split(",")]
    schema = f"doc_id long, rec_idx long, {fields}, ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "rec_idx", *names, "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    recs = avro_records(bytes(p))
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(0)
                    for n in names:
                        out[n].append(None)
                    out["ok"].append(False)
                    continue
                for i, rec in enumerate(recs):
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(i)
                    for n in names:
                        out[n].append(rec.get(n))
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, schema)


def synth_avro_records(doc_id: int) -> bytes:
    """Deterministic record-bearing OCF: 1 + d%6 records of
    (c0 long = d*100+i, c1 string = 'a' * (1+(d+i)%7),
    c2 double = (d*3+i)/4.0 — exact dyadic), codec cycling through all
    three the spec names (deflate/snappy/null by d%3), block size 4 —
    field formulas a SQL oracle replays arithmetically (the oracle sees
    values only, so every codec path is attested through them)."""
    d = int(doc_id)
    rows = [
        {"c0": d * 100 + i, "c1": "a" * (1 + (d + i) % 7), "c2": (d * 3 + i) / 4.0}
        for i in range(1 + d % 6)
    ]
    return encode_avro_records(
        rows,
        [("c0", "long"), ("c1", "string"), ("c2", "double")],
        codec=("deflate", "snappy", "null")[d % 3],
        block_records=4,
    )


def with_synthetic_avro_payload(docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [synth_avro_records(int(x)) for x in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


# ---------------------------------------------------------------------
# Generic Avro encoding (nested schemas) — the symmetric encoder twin
# of _decode_avro_value, used by sources/iceberg_export.py to write
# spec-shaped manifest files and by tests to synthesize arbitrary OCFs.
# ---------------------------------------------------------------------

_AVRO_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string")
)


def _union_branch(v, branches: list, names: dict) -> int:
    """Pick the union branch index for a Python value (type-directed:
    None->null, bool->boolean, int->int/long, float->float/double,
    str->string/enum, bytes->bytes/fixed, dict->record/map,
    list->array)."""

    def kind(s):
        if isinstance(s, str):
            s = names.get(s, s)
        if isinstance(s, dict):
            t = s.get("type")
            return t if isinstance(t, str) else None
        return s if isinstance(s, str) else None

    def matches(s) -> bool:
        k = kind(s)
        if v is None:
            return k == "null"
        if isinstance(v, bool):
            return k == "boolean"
        if isinstance(v, int):
            return k in ("int", "long")
        if isinstance(v, float):
            return k in ("float", "double")
        if isinstance(v, str):
            return k in ("string", "enum")
        if isinstance(v, (bytes, bytearray)):
            return k in ("bytes", "fixed")
        if isinstance(v, dict):
            return k in ("record", "map")
        if isinstance(v, (list, tuple)):
            return k == "array"
        return False

    for i, s in enumerate(branches):
        if matches(s):
            return i
    raise ValueError(f"avro encode: no union branch for {type(v).__name__}")


def _encode_avro_value(v, schema, names: dict) -> bytes:
    if isinstance(schema, str):
        t = schema
        if t not in _AVRO_PRIMITIVES and t in names:
            return _encode_avro_value(v, names[t], names)
        if t == "null":
            if v is not None:
                raise ValueError("avro encode: non-None for null type")
            return b""
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("int", "long"):
            return _avro_zz(int(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "bytes":
            raw = bytes(v)
            return _avro_zz(len(raw)) + raw
        if t == "string":
            raw = str(v).encode("utf-8")
            return _avro_zz(len(raw)) + raw
        raise ValueError(f"avro encode: unknown type {t!r}")
    if isinstance(schema, list):
        idx = _union_branch(v, schema, names)
        return _avro_zz(idx) + _encode_avro_value(v, schema[idx], names)
    if not isinstance(schema, dict):
        raise ValueError("avro encode: malformed schema node")
    t = schema.get("type")
    if t == "record":
        if schema.get("name"):
            names.setdefault(schema["name"], schema)
        out = bytearray()
        for f in schema.get("fields", []):
            out += _encode_avro_value(v.get(f["name"]), f["type"], names)
        return bytes(out)
    if t == "enum":
        return _avro_zz(schema["symbols"].index(v))
    if t == "fixed":
        raw = bytes(v)
        if len(raw) != int(schema.get("size", -1)):
            raise ValueError("avro encode: fixed size mismatch")
        return raw
    if t == "array":
        if not v:
            return _avro_zz(0)
        out = bytearray(_avro_zz(len(v)))
        for item in v:
            out += _encode_avro_value(item, schema.get("items"), names)
        return bytes(out + _avro_zz(0))
    if t == "map":
        if not v:
            return _avro_zz(0)
        out = bytearray(_avro_zz(len(v)))
        for k, item in v.items():
            kraw = str(k).encode("utf-8")
            out += _avro_zz(len(kraw)) + kraw
            out += _encode_avro_value(item, schema.get("values"), names)
        return bytes(out + _avro_zz(0))
    if isinstance(t, (str, list, dict)):  # wrapper form
        return _encode_avro_value(v, t, names)
    raise ValueError(f"avro encode: unknown complex type {t!r}")


def encode_avro_ocf(
    schema: dict,
    records: list,
    codec: str = "null",
    block_records: int = 100,
    extra_meta: dict | None = None,
) -> bytes:
    """Write a full OCF for an arbitrary (possibly nested) record
    schema — the generic encoder twin of :func:`avro_records`.
    ``extra_meta`` adds file-metadata entries (str or bytes values) —
    how Iceberg manifests carry their "schema"/"format-version" keys."""
    import json as _json

    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro encode: top-level schema must be a record")
    names: dict = {}
    _register_named(schema, names)
    meta_entries: list[tuple[bytes, bytes]] = [
        (b"avro.schema", _json.dumps(schema).encode()),
        (b"avro.codec", codec.encode()),
    ]
    for k, v in (extra_meta or {}).items():
        meta_entries.append(
            (k.encode(), v if isinstance(v, (bytes, bytearray)) else str(v).encode())
        )
    sync = bytes((i * 11 + 5) % 256 for i in range(16))
    out = bytearray(b"Obj\x01")
    out += _avro_zz(len(meta_entries))
    for k, v in meta_entries:
        out += _avro_zz(len(k)) + k + _avro_zz(len(v)) + v
    out += _avro_zz(0) + sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        body = b"".join(_encode_avro_value(r, schema, names) for r in chunk)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = c.compress(body) + c.flush()
        elif codec == "snappy":
            from . import snappycodec

            body = snappycodec.avro_block_compress(body)
        elif codec != "null":
            raise ValueError(f"avro encode: unsupported codec {codec!r}")
        out += _avro_zz(len(chunk)) + _avro_zz(len(body)) + body + sync
    return bytes(out)


def parquet_records(payload: bytes, columns: list[str] | None = None) -> list[dict]:
    """Decode a parquet PAYLOAD's rows via pyarrow (no temp files) —
    the parquet twin of :func:`avro_records`, for parquet bytes that
    arrive as values (archive members, WARC attachments, log blobs)
    rather than as scannable files. Column projection pushes into the
    pyarrow read so unneeded columns are never decompressed."""
    import pyarrow.parquet as pq

    try:
        t = pq.read_table(io.BytesIO(payload), columns=columns)
        return t.to_pylist()
    except Exception as exc:  # pyarrow raises a zoo of types on bad bytes
        raise ValueError(f"parquet: unreadable payload: {exc}") from exc


def parquet_records_df(payloads: DataFrame, fields: str) -> DataFrame:
    """(doc_id, payload) -> one row per decoded parquet record,
    projecting the declared ``fields`` (Spark DDL). Corrupt payloads
    yield the usual single ok=False row. Use :func:`datafile_meta_df`
    first to triage; use ``spark.read.parquet`` for parquet that lives
    as FILES — this operator is for parquet embedded in a binary
    column, where a filesystem round-trip would serialize the scan
    through the driver."""
    names = [c.strip().split()[0] for c in fields.split(",")]
    schema = f"doc_id long, rec_idx long, {fields}, ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "rec_idx", *names, "ok")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    recs = parquet_records(bytes(p))
                except _MALFORMED:
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(0)
                    for n in names:
                        out[n].append(None)
                    out["ok"].append(False)
                    continue
                for i, rec in enumerate(recs):
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(i)
                    for n in names:
                        out[n].append(rec.get(n))
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, schema)


def synth_parquet_records(doc_id: int) -> bytes:
    """Deterministic record-bearing parquet payload: 1 + d%7 rows of
    (c0 long = d*1000 + 2*i, c1 string = 'b' * (1+(d+i)%5)), snappy on
    odd doc_ids — formulas a SQL oracle replays arithmetically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = int(doc_id)
    n = 1 + d % 7
    table = pa.table(
        {
            "c0": pa.array([d * 1000 + 2 * i for i in range(n)], pa.int64()),
            "c1": pa.array(["b" * (1 + (d + i) % 5) for i in range(n)], pa.string()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="snappy" if d % 2 else "NONE")
    return buf.getvalue()


def with_synthetic_parquet_payload(docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [synth_parquet_records(int(x)) for x in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


# ---------------------------------------------------------------------
# Avro logical types (spec "Logical Types"): annotate-on-top-of-base
# interpretation applied after base decode. Unknown logical types fall
# back to the base value, exactly as the spec instructs readers to do.
# ---------------------------------------------------------------------


def _apply_logical(value, schema):
    import datetime
    import decimal

    if value is None or not isinstance(schema, dict):
        return value
    lt = schema.get("logicalType")
    if lt is None:
        return value
    if lt == "decimal":
        scale = int(schema.get("scale", 0))
        unscaled = int.from_bytes(bytes(value), "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    if lt == "date":  # int: days since epoch
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=value)
    if lt == "time-millis":
        return (datetime.datetime.min + datetime.timedelta(milliseconds=value)).time()
    if lt == "time-micros":
        return (datetime.datetime.min + datetime.timedelta(microseconds=value)).time()
    if lt == "timestamp-millis":
        return datetime.datetime.fromtimestamp(value / 1000, datetime.timezone.utc)
    if lt == "timestamp-micros":
        return datetime.datetime.fromtimestamp(0, datetime.timezone.utc) + (
            datetime.timedelta(microseconds=value)
        )
    if lt == "uuid":
        return value  # already a string per spec
    return value  # unknown logical type: base value (spec rule)


def _apply_logical_record(rec: dict, schema: dict, names: dict) -> dict:
    """Apply logical-type interpretation to a decoded top-level record
    (one level deep over fields; nested records/arrays/maps recurse)."""

    def conv(v, s):
        if isinstance(s, str):
            s = names.get(s, s)
        if isinstance(s, list):  # union: logical types sit on branches
            for branch in s:
                b = names.get(branch, branch) if isinstance(branch, str) else branch
                if v is None:
                    if b == "null":
                        return None
                    continue
                if isinstance(b, dict) and b.get("logicalType"):
                    return _apply_logical(v, b)
            return v
        if not isinstance(s, dict):
            return v
        t = s.get("type")
        if s.get("logicalType"):
            return _apply_logical(v, s)
        if t == "record" and isinstance(v, dict):
            return _apply_logical_record(v, s, names)
        if t == "array" and isinstance(v, list):
            return [conv(x, s.get("items")) for x in v]
        if t == "map" and isinstance(v, dict):
            return {k: conv(x, s.get("values")) for k, x in v.items()}
        return v

    return {
        f["name"]: conv(rec.get(f["name"]), f.get("type"))
        for f in schema.get("fields", [])
    }


def avro_records_logical(payload: bytes, max_records: int = _MAX_CONTAINER_ITEMS) -> list[dict]:
    """:func:`avro_records` + logical-type interpretation: decimal ->
    Decimal, date -> datetime.date, time-millis/micros -> time,
    timestamp-millis/micros -> tz-aware datetime (UTC), uuid -> str;
    unknown logical types fall back to the base value per the spec."""
    import json as _json

    recs = avro_records(payload, max_records)
    if not recs:
        return recs
    # re-walk the header (cheap vs the full decode) for the schema JSON
    pos = 4
    raw_meta: dict[str, bytes] = {}
    while True:
        count, pos = _avro_varint(payload, pos)
        if count == 0:
            break
        if count < 0:
            _, pos = _avro_varint(payload, pos)
            count = -count
        for _ in range(count):
            klen, pos = _avro_varint(payload, pos)
            k = payload[pos : pos + klen].decode("utf-8", "replace")
            pos += klen
            vlen, pos = _avro_varint(payload, pos)
            raw_meta[k] = payload[pos : pos + vlen]
            pos += vlen
    schema = _json.loads(raw_meta["avro.schema"])
    if "logicalType" not in raw_meta["avro.schema"].decode("utf-8", "replace"):
        return recs  # fast path: nothing to interpret
    names: dict = {}
    _register_named(schema, names)
    try:
        return [_apply_logical_record(r, schema, names) for r in recs]
    except (KeyError, TypeError, AttributeError, OverflowError, ValueError) as exc:
        raise ValueError(f"avro: bad logical-type value: {exc!r}") from exc
