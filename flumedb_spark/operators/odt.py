"""ODT text extraction — the OpenDocument leg of the office ingest
stack (ECMA-376 covers DOCX/XLSX/PPTX in ``docx.py``/``xlsx.py``/
``pptx.py``; OASIS OpenDocument — ISO/IEC 26300 — is the other office
container web crawls carry, produced by LibreOffice/OpenOffice).

An .odt file is a ZIP container holding ``content.xml`` (the
``office:document-content`` tree) plus a ``mimetype`` member that the
spec requires to be the FIRST entry, STORED uncompressed — magic
sniffers identify ODF by reading bytes 30..38 of the file. Both
directions are stdlib-only:

- :func:`synth_odt` — a REAL minimal package: the stored-first
  ``mimetype`` member, ``META-INF/manifest.xml``, and a namespaced
  ``content.xml`` with one ``text:p`` per paragraph, each split across
  a styled ``text:span`` and a bare tail (span flattening + style
  skipping exercised on every doc). LibreOffice opens the output.
- :func:`decode_odt_text` — real parse: zip (mimetype verified when
  present) -> ``content.xml`` (size-capped, DTD-rejected) ->
  ``office:body/office:text`` walk collecting ``text:p`` paragraphs in
  order, flattening nested spans/links via itertext semantics,
  mapping ``text:tab`` -> \\t, ``text:line-break`` -> \\n and
  ``text:s text:c="n"`` -> n spaces (the ODF whitespace model, ODF
  1.2 §6.1.2-6.1.3).

Operator shape (:func:`odt_text_paragraphs`): one Arrow-batched
``mapInPandas`` pass, linear, no shuffle; corrupt blob -> one
``ok=False`` sentinel row.

The ``ns_odt_text`` catalog row synthesizes per-doc packages whose
paragraphs are 45-char slices of the documents corpus, so the DuckDB
oracle replays extraction as substr arithmetic.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_odt",
    "decode_odt_text",
    "with_synthetic_odt_payload",
    "odt_text_paragraphs",
    "odt_text_oracle_sql",
]

_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_MANIFEST = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"

PARA_CHARS = 45
_SPAN_SPLIT = 20  # chars inside the styled span of each paragraph

MAX_PART_XML = 16 * 1024 * 1024

MIMETYPE = "application/vnd.oasis.opendocument.text"

_MANIFEST_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<manifest:manifest xmlns:manifest="{_MANIFEST}" manifest:version="1.2">'
    f'<manifest:file-entry manifest:full-path="/" manifest:media-type="{MIMETYPE}"/>'
    '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
)


def synth_odt(paragraphs: list[str]) -> bytes:
    """Real minimal .odt bytes: the spec-mandated stored-first
    ``mimetype`` member, a manifest, and one ``text:p`` per entry with
    the first 20 chars wrapped in a styled span (span flattening is
    exercised on every doc)."""
    body = []
    for t in paragraphs:
        a, b = t[:_SPAN_SPLIT], t[_SPAN_SPLIT:]
        body.append(
            f'<text:p><text:span text:style-name="T1">{escape(a)}</text:span>'
            f"{escape(b)}</text:p>"
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_OFFICE}" '
        f'xmlns:text="{_TEXT}" office:version="1.2">'
        "<office:body><office:text>"
        + "".join(body)
        + "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        # ODF 1.2 §3.3: mimetype first, uncompressed
        z.writestr(
            zipfile.ZipInfo("mimetype"), MIMETYPE, zipfile.ZIP_STORED
        )
        z.writestr("META-INF/manifest.xml", _MANIFEST_XML)
        z.writestr("content.xml", content)
    return buf.getvalue()


def _odf_paragraph_text(p: ET.Element) -> str:
    """Flatten a text:p per the ODF whitespace model: spans/links
    contribute their text, text:tab -> \\t, text:line-break -> \\n,
    text:s -> text:c spaces (default 1)."""
    parts: list[str] = []

    def walk(node: ET.Element) -> None:
        if node.tag == f"{{{_TEXT}}}tab":
            parts.append("\t")
        elif node.tag == f"{{{_TEXT}}}line-break":
            parts.append("\n")
        elif node.tag == f"{{{_TEXT}}}s":
            parts.append(" " * int(node.get(f"{{{_TEXT}}}c", "1")))
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    if p.text:
        parts.append(p.text)
    for child in p:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def decode_odt_text(payload: bytes) -> list[str]:
    """REAL parse: ODF zip -> content.xml -> office:text paragraph
    texts in document order. Raises ValueError on a malformed
    package."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"odt: not a zip package: {e}") from e
    names = z.namelist()
    if "mimetype" in names:
        mt = z.read("mimetype")[:100].decode("latin-1", "replace")
        if not mt.startswith("application/vnd.oasis.opendocument"):
            raise ValueError(f"odt: foreign mimetype {mt!r}")
    try:
        info = z.getinfo("content.xml")
    except KeyError:
        raise ValueError("odt: package has no content.xml") from None
    if info.file_size > MAX_PART_XML:
        raise ValueError(f"odt: content.xml {info.file_size} bytes exceeds cap")
    data = z.read(info)
    if b"<!DOCTYPE" in data[:4096] or b"<!ENTITY" in data[:4096]:
        raise ValueError("odt: content.xml declares a DTD (rejected)")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"odt: bad content.xml: {e}") from e
    if root.tag != f"{{{_OFFICE}}}document-content":
        raise ValueError(f"odt: unexpected root element {root.tag}")
    body = root.find(f"{{{_OFFICE}}}body")
    text_el = body.find(f"{{{_OFFICE}}}text") if body is not None else None
    if text_el is None:
        raise ValueError("odt: document has no office:text body")
    return [
        _odf_paragraph_text(p) for p in text_el.iter(f"{{{_TEXT}}}p")
    ]


def n_paragraphs_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 4


def with_synthetic_odt_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real .odt bytes: paragraph p of doc d carries
    ``text[45p : 45p+45]``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                paras = [
                    t[PARA_CHARS * p : PARA_CHARS * (p + 1)]
                    for p in range(n_paragraphs_for(int(d)))
                ]
                payloads.append(synth_odt(paras))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def odt_text_paragraphs(payloads: DataFrame) -> DataFrame:
    """REAL ODF parse -> per-paragraph rows (doc_id, para_idx,
    para_text, ok); malformed blob -> ONE ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "para_idx": [], "para_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    paras = decode_odt_text(bytes(p))
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["para_idx"].append(-1)
                    out["para_text"].append("")
                    out["ok"].append(False)
                    continue
                for idx, t in enumerate(paras):
                    out["doc_id"].append(doc_id)
                    out["para_idx"].append(idx)
                    out["para_text"].append(t)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run, "doc_id long, para_idx int, para_text string, ok boolean"
    )


def odt_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: paragraph p of doc d extracts
    substr(text, 45p+1, 45) — encode->decode is the identity."""
    return f"""
    SELECT d.doc_id, CAST(s.p AS INT) AS para_idx,
      coalesce(substr(d.text, {PARA_CHARS} * s.p + 1, {PARA_CHARS}), '')
        AS para_text,
      true AS ok
    FROM {table} d, generate_series(0, 3) s(p)
    WHERE s.p < 1 + d.doc_id % 4
    ORDER BY d.doc_id, para_idx
    """
