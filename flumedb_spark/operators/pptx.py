"""PPTX text extraction — the fourth office-document ingest leg (PDF
``operators/pdf.py``, DOCX ``operators/docx.py``, XLSX
``operators/xlsx.py``; presentations are the remaining OPC container a
web crawl routinely carries).

A .pptx file is a ZIP container (ECMA-376 / ISO 29500 Open Packaging
Conventions) holding PresentationML parts whose text lives in
DrawingML runs. Both directions are stdlib-only, the repo's codec
pattern:

- :func:`synth_pptx` — a REAL minimal deck: ``[Content_Types].xml``,
  ``_rels/.rels``, ``ppt/presentation.xml`` (``p:sldIdLst`` in slide
  order, each entry an ``r:id``), ``ppt/_rels/presentation.xml.rels``
  (r:id -> slide part), and one ``ppt/slides/slideN.xml`` per slide
  with TWO shapes (title + body), each a ``p:txBody`` whose paragraph
  splits across two styled ``a:r`` runs (so the extractor must
  concatenate runs and skip ``a:rPr`` formatting). PowerPoint/
  LibreOffice open the output.
- :func:`decode_pptx_text` — real parse: zip -> presentation.xml
  sldIdLst (deck order, NOT zip order) -> rels -> each slide part ->
  ``p:sp`` shapes in tree order -> ``a:p`` paragraphs concatenating
  ``a:t`` runs (``a:br`` maps to newline). Every XML part is
  size-capped before inflate and rejected if it declares a DOCTYPE
  (the r10 office hardening).

Operator shape (:func:`pptx_slide_texts`): one Arrow-batched
``mapInPandas`` pass, per-blob work, linear, no shuffle; corrupt or
non-pptx blobs yield one ``ok=False`` sentinel row.

The ``ns_pptx_text`` catalog row synthesizes per-doc decks whose shape
texts are 25-char slices of the documents corpus (slide s carries
chars [50s, 50s+25) as its title and [50s+25, 50s+50) as its body), so
the DuckDB oracle replays extraction as substr arithmetic — a zip,
rels, slide-order, shape-order, or run-concatenation bug breaks the
hash match.
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
    "synth_pptx",
    "decode_pptx_text",
    "with_synthetic_pptx_payload",
    "pptx_slide_texts",
    "pptx_text_oracle_sql",
]

_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"

SHAPE_CHARS = 25  # chars of corpus text per shape
SLIDE_CHARS = 2 * SHAPE_CHARS  # title + body per slide
_RUN_SPLIT = 11  # chars in the first (bold) run of each shape text

MAX_PART_XML = 16 * 1024 * 1024


def _content_types(n_slides: int) -> str:
    overrides = "".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        for i in range(n_slides)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        + overrides
        + "</Types>"
    )


_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_PKG_REL}">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="ppt/presentation.xml"/>'
    "</Relationships>"
)


def _shape_xml(text: str) -> str:
    """One p:sp with a txBody paragraph split across two runs (bold +
    plain) — run concatenation and a:rPr skipping exercised on every
    shape."""
    a, b = text[:_RUN_SPLIT], text[_RUN_SPLIT:]
    return (
        "<p:sp><p:txBody>"
        f"<a:p>"
        f'<a:r><a:rPr b="1"/><a:t>{escape(a)}</a:t></a:r>'
        f"<a:r><a:t>{escape(b)}</a:t></a:r>"
        f"</a:p>"
        "</p:txBody></p:sp>"
    )


def synth_pptx(slides: list[tuple[str, str]]) -> bytes:
    """Real minimal .pptx bytes: one slide per (title, body) entry,
    two shapes each. Slide parts are written to the zip in REVERSE so
    deck order genuinely comes from sldIdLst, not zip order."""
    n = len(slides)
    slide_rels = "".join(
        f'<Relationship Id="rId{i + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" '
        f'Target="slides/slide{i + 1}.xml"/>'
        for i in range(n)
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">' + slide_rels + "</Relationships>"
    )
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(n)
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{_P}" xmlns:r="{_R}">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _content_types(n))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("ppt/presentation.xml", presentation)
        z.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i in range(n - 1, -1, -1):  # reverse zip order (see doc)
            title, body = slides[i]
            slide = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
                + _shape_xml(title)
                + _shape_xml(body)
                + "</p:spTree></p:cSld></p:sld>"
            )
            z.writestr(f"ppt/slides/slide{i + 1}.xml", slide)
    return buf.getvalue()


def _read_xml(z: zipfile.ZipFile, name: str) -> ET.Element:
    """Size-capped, DOCTYPE-rejecting XML part read (the xlsx device)."""
    try:
        info = z.getinfo(name)
    except KeyError:
        raise ValueError(f"pptx: package has no {name}") from None
    if info.file_size > MAX_PART_XML:
        raise ValueError(f"pptx: {name} {info.file_size} bytes exceeds cap")
    data = z.read(info)
    if b"<!DOCTYPE" in data[:4096] or b"<!ENTITY" in data[:4096]:
        raise ValueError(f"pptx: {name} declares a DTD (rejected)")
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"pptx: bad {name}: {e}") from e


def decode_pptx_text(payload: bytes) -> list[list[str]]:
    """REAL parse: OPC zip -> presentation.xml sldIdLst -> rels -> each
    slide's shapes in tree order. Returns one list of shape texts per
    slide, in DECK order (runs concatenated; ``a:br`` -> newline;
    formatting nodes contribute nothing). Raises ValueError on a
    malformed package."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"pptx: not a zip package: {e}") from e
    pres = _read_xml(z, "ppt/presentation.xml")
    if pres.tag != f"{{{_P}}}presentation":
        raise ValueError(f"pptx: unexpected root element {pres.tag}")
    rels = _read_xml(z, "ppt/_rels/presentation.xml.rels")
    rel_map: dict[str, str] = {}
    for rel in rels.iter(f"{{{_NS_PKG_REL}}}Relationship"):
        target = rel.get("Target", "")
        if not target.startswith("/"):
            target = "ppt/" + target
        rel_map[rel.get("Id", "")] = target.lstrip("/")
    lst = pres.find(f"{{{_P}}}sldIdLst")
    if lst is None:
        raise ValueError("pptx: presentation has no sldIdLst")
    slides: list[list[str]] = []
    for sld_id in lst.iter(f"{{{_P}}}sldId"):
        rid = sld_id.get(f"{{{_R}}}id", "")
        part = rel_map.get(rid)
        if part is None:
            raise ValueError(f"pptx: slide rel {rid!r} unresolved")
        sld = _read_xml(z, part)
        shapes: list[str] = []
        for sp in sld.iter(f"{{{_P}}}sp"):
            parts: list[str] = []
            for node in sp.iter():
                if node.tag == f"{{{_A}}}t":
                    parts.append(node.text or "")
                elif node.tag == f"{{{_A}}}br":
                    parts.append("\n")
            shapes.append("".join(parts))
        slides.append(shapes)
    return slides


def n_slides_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 3


def with_synthetic_pptx_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real .pptx bytes: slide s of doc d carries
    ``text[50s : 50s+25]`` as its title shape and ``text[50s+25 :
    50s+50]`` as its body shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                slides = [
                    (
                        t[SLIDE_CHARS * s : SLIDE_CHARS * s + SHAPE_CHARS],
                        t[
                            SLIDE_CHARS * s + SHAPE_CHARS
                            : SLIDE_CHARS * (s + 1)
                        ],
                    )
                    for s in range(n_slides_for(int(d)))
                ]
                payloads.append(synth_pptx(slides))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def pptx_slide_texts(payloads: DataFrame) -> DataFrame:
    """REAL OPC/PresentationML parse -> one row per shape (doc_id,
    slide_idx, shape_idx, shape_text, ok); malformed blob -> ONE
    ok=False sentinel row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "slide_idx": [], "shape_idx": [],
                "shape_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    slides = decode_pptx_text(bytes(p))
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["slide_idx"].append(-1)
                    out["shape_idx"].append(-1)
                    out["shape_text"].append("")
                    out["ok"].append(False)
                    continue
                for s, shapes in enumerate(slides):
                    for j, txt in enumerate(shapes):
                        out["doc_id"].append(doc_id)
                        out["slide_idx"].append(s)
                        out["shape_idx"].append(j)
                        out["shape_text"].append(txt)
                        out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, slide_idx int, shape_idx int, shape_text string, "
        "ok boolean",
    )


def pptx_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: slide s shape 0 extracts substr(text, 50s+1, 25),
    shape 1 substr(text, 50s+26, 25) — encode->decode is the
    identity."""
    return f"""
    SELECT d.doc_id, CAST(s.s AS INT) AS slide_idx,
      CAST(sh.j AS INT) AS shape_idx,
      coalesce(substr(d.text,
        {SLIDE_CHARS} * s.s + {SHAPE_CHARS} * sh.j + 1, {SHAPE_CHARS}), '')
        AS shape_text,
      true AS ok
    FROM {table} d, generate_series(0, 2) s(s), generate_series(0, 1) sh(j)
    WHERE s.s < 1 + d.doc_id % 3
    ORDER BY d.doc_id, slide_idx, shape_idx
    """
