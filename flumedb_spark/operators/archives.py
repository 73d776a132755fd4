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
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LISTING_SCHEMA = (
    "doc_id long, member string, size_u long, size_c long, "
    "method string, ok boolean"
)

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
                except ValueError:
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


def warc_records(payload: bytes) -> list[dict]:
    """Enumerate records of a WARC payload (plain or gzip, including
    the per-record-member gzip Common Crawl uses): record type, target
    URI, record id, and content length — no body parsing. ValueError on
    malformed input (the shared drop-the-row contract)."""
    if payload[:2] == b"\x1f\x8b":
        import gzip

        try:
            # GzipFile reads CONCATENATED members, so per-record-gzipped
            # crawl files decompress to one contiguous WARC stream
            payload = gzip.GzipFile(fileobj=io.BytesIO(payload)).read()
        except (OSError, EOFError, zipfile.BadZipFile) as exc:
            raise ValueError(f"warc: bad gzip stream: {exc}") from exc
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
        if body_start + length > n:
            raise ValueError("warc: truncated record body")
        out.append(
            {
                "record_type": headers.get(b"warc-type", b"").decode("ascii", "replace"),
                "target_uri": (
                    headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
                    or None
                ),
                "record_id": headers.get(b"warc-record-id", b"").decode("ascii", "replace"),
                "content_length": length,
            }
        )
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
                except ValueError:
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
