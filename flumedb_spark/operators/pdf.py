"""PDF text extraction — the most common real-world training-data
source the crawl stack could not read (VERDICT-r8 #4).

Stays inside the stdlib-codec pattern that carried JPEG/Avro/WARC
(operators/jpegcodec.py, archives.py): a REAL encoder
(:func:`synth_pdf` — objects, FlateDecode content streams via zlib,
xref table, trailer; a structurally valid PDF 1.4 any viewer opens)
and a REAL decoder (:func:`decode_pdf_text` — startxref → xref walk →
catalog → page tree → per-page content streams → FlateDecode →
``Tj``/``TJ`` text operators with full string-escape handling), per
ISO 32000-1 (the public PDF spec; §7.5 file structure, §7.3.4 string
objects, §9.4.3 text-showing operators). No third-party PDF library
is imported anywhere.

Operator shape (:func:`pdf_text_pages`): one Arrow-batched
``mapInPandas`` pass, per-blob work, linear, no shuffle — the
multimodal.py contract: a corrupt or unsupported blob yields an
``ok=False`` row (page_idx -1) and never fails the partition, so a
100 TB crawl with malformed PDFs streams through.

The ``ns_pdf_text`` catalog row synthesizes per-doc PDFs whose page
texts are slices of the documents corpus (1 + doc_id % 3 pages, 60
chars each, split across one ``Tj`` and one two-string ``TJ`` per
page), so the DuckDB oracle replays extraction as pure ``substr``
arithmetic — a parser offset, filter, or unescaping bug breaks the
hash match.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_pdf",
    "decode_pdf_text",
    "with_synthetic_pdf_payload",
    "pdf_text_pages",
    "pdf_text_oracle_sql",
]

# catalog-row page geometry: page p shows text[60p : 60p+60], split
# 30/15/15 across Tj + TJ (exercises both text-showing operators)
PAGE_CHARS = 60
_SPLITS = (30, 45)


def _esc(s: str) -> bytes:
    """PDF literal-string escaping (ISO 32000-1 §7.3.4.2)."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", errors="replace")


def synth_pdf(texts: list[str]) -> bytes:
    """One page per entry of ``texts`` -> real PDF 1.4 bytes.

    Layout: catalog(1) -> pages(2) -> font(3) -> per page: page object
    + FlateDecode content stream. Offsets are exact; the xref table and
    trailer are real, so the decoder's startxref walk is exercised end
    to end (and external viewers open the file).
    """
    objs: list[bytes] = []  # 1-indexed object bodies

    n = len(texts)
    kids = " ".join(f"{4 + 2 * p} 0 R" for p in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for p, t in enumerate(texts):
        a, b, c = t[: _SPLITS[0]], t[_SPLITS[0] : _SPLITS[1]], t[_SPLITS[1] :]
        content = (
            b"BT /F1 12 Tf 72 720 Td ("
            + _esc(a)
            + b") Tj [("
            + _esc(b)
            + b") -250 ("
            + _esc(c)
            + b")] TJ ET"
        )
        comp = zlib.compress(content)
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * p} 0 R >>"
            ).encode()
        )
        objs.append(
            f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
            + comp
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------

_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _xref_offsets(buf: bytes) -> dict[int, int]:
    """startxref -> classic xref table -> {obj_num: byte offset}."""
    tail = buf[-256:]
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF", tail)
    if not m:
        raise ValueError("pdf: no startxref")
    pos = int(m.group(1))
    if buf[pos : pos + 4] != b"xref":
        raise ValueError("pdf: xref table not at startxref offset")
    offsets: dict[int, int] = {}
    cur = pos + 4
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*", buf[cur : cur + 64])
        if not m:
            break  # trailer reached
        start, count = int(m.group(1)), int(m.group(2))
        cur += m.end()
        for i in range(count):
            ent = buf[cur : cur + 20]
            if len(ent) < 18:
                raise ValueError("pdf: truncated xref entry")
            if ent[17:18] == b"n":
                offsets[start + i] = int(ent[:10])
            cur += 20
    if not offsets:
        raise ValueError("pdf: empty xref")
    return offsets


def _trailer_root(buf: bytes) -> int:
    m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", buf[-2048:])
    if not m:
        raise ValueError("pdf: trailer has no /Root")
    return int(m.group(1))


def _obj_body(buf: bytes, off: int, num: int) -> bytes:
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", buf[off : off + 32])
    if not m or int(m.group(1)) != num:
        raise ValueError(f"pdf: object {num} not at xref offset")
    start = off + m.end()
    end = buf.find(b"endobj", start)
    if end < 0:
        raise ValueError(f"pdf: object {num} unterminated")
    sm = re.compile(rb"stream\r?\n").search(buf, start, end)
    if sm is not None:
        # stream object: bound the data by the declared /Length, never
        # by a byte scan — FlateDecode bytes are arbitrary and can
        # contain "endobj" by chance (ADVICE r9), which would truncate
        # the stream short and fail an otherwise-valid page
        lm = re.search(rb"/Length\s+(\d+)", buf[start : sm.start()])
        if lm:
            end = buf.find(b"endobj", sm.end() + int(lm.group(1)))
            if end < 0:
                raise ValueError(f"pdf: object {num} unterminated")
    return buf[start:end]


def _dict_of(body: bytes) -> bytes:
    """The object's top-level << ... >> dict (balanced)."""
    start = body.find(b"<<")
    if start < 0:
        raise ValueError("pdf: object has no dict")
    depth, i = 0, start
    while i < len(body) - 1:
        pair = body[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    raise ValueError("pdf: unbalanced dict")


def _stream_data(body: bytes, d: bytes) -> bytes:
    m = re.search(rb"stream\r?\n", body)
    if m is None:
        raise ValueError("pdf: contents object has no stream")
    lm = re.search(rb"/Length\s+(\d+)", d)
    if not lm:
        raise ValueError("pdf: stream without /Length")
    raw = body[m.end() : m.end() + int(lm.group(1))]
    if re.search(rb"/Filter\s*/FlateDecode", d):
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"pdf: FlateDecode failed: {e}") from e
    return raw


_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _content_text(content: bytes) -> str:
    """Concatenate every string shown by Tj / ' / " / TJ, in stream
    order (ISO 32000-1 §9.4.3; TJ's interleaved numbers are kerning
    and carry no characters)."""
    out: list[bytes] = []
    i, n = 0, len(content)
    strings: list[bytes] = []  # literal strings seen since last operator
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            depth, i = 1, i + 1
            cur = bytearray()
            while i < n and depth:
                ch = content[i : i + 1]
                if ch == b"\\":
                    nxt = content[i + 1 : i + 2]
                    if nxt in _STR_ESCAPES:
                        cur += _STR_ESCAPES[nxt]
                        i += 2
                    elif nxt.isdigit():  # octal \ddd
                        j = i + 1
                        while j < min(i + 4, n) and content[j : j + 1].isdigit():
                            j += 1
                        cur.append(int(content[i + 1 : j], 8) & 0xFF)
                        i = j
                    else:
                        i += 1  # line continuation / unknown: drop '\'
                elif ch == b"(":
                    depth += 1
                    cur += ch
                    i += 1
                elif ch == b")":
                    depth -= 1
                    if depth:
                        cur += ch
                    i += 1
                else:
                    cur += ch
                    i += 1
            strings.append(bytes(cur))
        elif content[i : i + 2] == b"TJ" or content[i : i + 2] == b"Tj":
            out.extend(strings)
            strings = []
            i += 2
        elif c in (b"'", b'"'):
            out.extend(strings)
            strings = []
            i += 1
        elif c.isalpha():  # any other operator flushes pending strings
            j = i
            while j < n and content[j : j + 1].isalpha():
                j += 1
            strings = []
            i = j
        else:
            i += 1
    return b"".join(out).decode("latin-1")


def decode_pdf_text(payload: bytes) -> list[str]:
    """REAL parse: xref walk -> catalog -> page tree -> per-page
    content streams -> text. Returns one string per page, in page-tree
    order; raises ValueError on malformed input."""
    buf = bytes(payload)
    if not buf.startswith(b"%PDF-"):
        raise ValueError("pdf: bad magic")
    offsets = _xref_offsets(buf)
    root = _trailer_root(buf)
    cat = _dict_of(_obj_body(buf, offsets[root], root))
    m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", cat)
    if not m:
        raise ValueError("pdf: catalog has no /Pages")
    pages_num = int(m.group(1))
    pages = _dict_of(_obj_body(buf, offsets[pages_num], pages_num))
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", pages)
    if not km:
        raise ValueError("pdf: pages node has no /Kids")
    texts: list[str] = []
    for pm in _REF_RE.finditer(km.group(1)):
        pnum = int(pm.group(1))
        pdict = _dict_of(_obj_body(buf, offsets[pnum], pnum))
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", pdict)
        if not cm:
            texts.append("")
            continue
        cnum = int(cm.group(1))
        cbody = _obj_body(buf, offsets[cnum], cnum)
        texts.append(_content_text(_stream_data(cbody, _dict_of(cbody))))
    return texts


# ---------------------------------------------------------------------
# Spark plumbing + catalog-row synthesis
# ---------------------------------------------------------------------


def n_pages_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 3


def with_synthetic_pdf_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real multi-page PDF bytes: page p of doc d shows
    ``text[60p : 60p+60]`` across one Tj and one two-string TJ."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                pages = [
                    t[PAGE_CHARS * p : PAGE_CHARS * (p + 1)]
                    for p in range(n_pages_for(int(d)))
                ]
                payloads.append(synth_pdf(pages))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def pdf_text_pages(payloads: DataFrame) -> DataFrame:
    """REAL PDF parse -> per-page rows (doc_id, page_idx, page_text,
    ok). A malformed blob yields ONE ok=False row (page_idx -1, empty
    text) and never fails the partition — the multimodal contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "page_idx": [], "page_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    pages = decode_pdf_text(bytes(p))
                except (ValueError, KeyError, IndexError):
                    out["doc_id"].append(doc_id)
                    out["page_idx"].append(-1)
                    out["page_text"].append("")
                    out["ok"].append(False)
                    continue
                for idx, t in enumerate(pages):
                    out["doc_id"].append(doc_id)
                    out["page_idx"].append(idx)
                    out["page_text"].append(t)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run, "doc_id long, page_idx int, page_text string, ok boolean"
    )


def pdf_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: page p of doc d extracts substr(text, 60p+1, 60)
    — encode->decode is the identity on the page text."""
    return f"""
    SELECT d.doc_id, CAST(s.p AS INT) AS page_idx,
      coalesce(substr(d.text, {PAGE_CHARS} * s.p + 1, {PAGE_CHARS}), '')
        AS page_text,
      true AS ok
    FROM {table} d, generate_series(0, 2) s(p)
    WHERE s.p < 1 + d.doc_id % 3
    ORDER BY d.doc_id, page_idx
    """
