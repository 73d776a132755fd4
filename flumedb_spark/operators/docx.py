"""DOCX text extraction — the office-document leg of the ingest stack
(beside HTML in ``operators/html.py`` and PDF in ``operators/pdf.py``).

A .docx file is a ZIP container (ECMA-376 / ISO 29500 Open Packaging
Conventions) holding ``word/document.xml`` (WordprocessingML). Both
directions are stdlib-only, the pattern every codec in this repo
follows:

- :func:`synth_docx` — a REAL minimal package: ``[Content_Types].xml``,
  ``_rels/.rels``, and a namespaced ``word/document.xml`` with one
  ``w:p`` per paragraph, each split across two styled runs (so the
  extractor must concatenate runs and skip ``w:rPr`` formatting
  nodes). Word/LibreOffice open the output.
- :func:`decode_docx_text` — real parse: zipfile -> ``word/document.xml``
  (size-capped before inflate: a zip-bomb or XML-bomb blob costs at
  most the cap) -> ElementTree walk of ``w:body/w:p`` collecting
  ``w:t`` text in document order (``w:tab``/``w:br`` map to tab /
  newline per the spec's text semantics).

Operator shape (:func:`docx_text_paragraphs`): one Arrow-batched
``mapInPandas`` pass, per-blob work, linear, no shuffle; a corrupt or
non-docx blob yields an ``ok=False`` sentinel row (para_idx -1) and
never fails the partition — the multimodal.py contract.

The ``ns_docx_text`` catalog row synthesizes per-doc packages whose
paragraph texts are 40-char slices of the documents corpus
(1 + doc_id % 4 paragraphs), so the DuckDB oracle replays extraction
as substr arithmetic — a zip-offset, namespace, or run-concatenation
bug breaks the hash match.
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
    "synth_docx",
    "decode_docx_text",
    "with_synthetic_docx_payload",
    "docx_text_paragraphs",
    "docx_text_oracle_sql",
]

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
PARA_CHARS = 40
_RUN_SPLIT = 25  # chars in the first (bold) run of each paragraph

# inflate cap for word/document.xml — bounds zip-bomb/XML-bomb cost
MAX_DOCUMENT_XML = 16 * 1024 * 1024

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


def synth_docx(paragraphs: list[str]) -> bytes:
    """Real minimal .docx bytes with one ``w:p`` per entry; each
    paragraph split across a bold run and a plain run (run
    concatenation + ``w:rPr`` skipping are exercised on every doc).
    ``xml:space='preserve'`` keeps leading/trailing spaces intact."""
    body = []
    for t in paragraphs:
        a, b = t[:_RUN_SPLIT], t[_RUN_SPLIT:]
        body.append(
            "<w:p>"
            f'<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">{escape(a)}</w:t></w:r>'
            f'<w:r><w:t xml:space="preserve">{escape(b)}</w:t></w:r>'
            "</w:p>"
        )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(body)
        + "<w:sectPr/></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", document)
    return buf.getvalue()


def decode_docx_text(payload: bytes) -> list[str]:
    """REAL parse: OPC zip -> word/document.xml -> paragraph texts in
    document order (runs concatenated; ``w:tab`` -> \\t, ``w:br`` ->
    \\n; formatting nodes contribute nothing). Raises ValueError on a
    malformed package."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"docx: not a zip package: {e}") from e
    try:
        info = z.getinfo("word/document.xml")
    except KeyError:
        raise ValueError("docx: package has no word/document.xml") from None
    if info.file_size > MAX_DOCUMENT_XML:
        raise ValueError(
            f"docx: document.xml {info.file_size} bytes exceeds cap"
        )
    data = z.read(info)
    # reject DTDs before expat sees them: the size cap bounds zip
    # inflation but NOT entity expansion — a sub-cap document.xml with
    # nested entities (billion laughs) can expand far beyond it on
    # hosts with expat < 2.4 (ADVICE r9). WordprocessingML never
    # carries a DTD, so this rejects no legitimate document.
    if b"<!DOCTYPE" in data[:4096] or b"<!ENTITY" in data[:4096]:
        raise ValueError("docx: document.xml declares a DTD (rejected)")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"docx: bad document.xml: {e}") from e
    if root.tag != f"{{{_W}}}document":
        raise ValueError(f"docx: unexpected root element {root.tag}")
    body = root.find(f"{{{_W}}}body")
    if body is None:
        raise ValueError("docx: document has no body")
    paras: list[str] = []
    for p in body.iter(f"{{{_W}}}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{{{_W}}}t":
                parts.append(node.text or "")
            elif node.tag == f"{{{_W}}}tab":
                parts.append("\t")
            elif node.tag == f"{{{_W}}}br":
                parts.append("\n")
        paras.append("".join(parts))
    return paras


def n_paragraphs_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 4


def with_synthetic_docx_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real .docx bytes: paragraph p of doc d carries
    ``text[40p : 40p+40]``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                paras = [
                    t[PARA_CHARS * p : PARA_CHARS * (p + 1)]
                    for p in range(n_paragraphs_for(int(d)))
                ]
                payloads.append(synth_docx(paras))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def docx_text_paragraphs(payloads: DataFrame) -> DataFrame:
    """REAL OPC/WordprocessingML parse -> per-paragraph rows (doc_id,
    para_idx, para_text, ok); malformed blob -> ONE ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "para_idx": [], "para_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    paras = decode_docx_text(bytes(p))
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


def docx_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: paragraph p of doc d extracts
    substr(text, 40p+1, 40) — encode->decode is the identity."""
    return f"""
    SELECT d.doc_id, CAST(s.p AS INT) AS para_idx,
      coalesce(substr(d.text, {PARA_CHARS} * s.p + 1, {PARA_CHARS}), '')
        AS para_text,
      true AS ok
    FROM {table} d, generate_series(0, 3) s(p)
    WHERE s.p < 1 + d.doc_id % 4
    ORDER BY d.doc_id, para_idx
    """
