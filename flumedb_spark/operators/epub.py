"""EPUB text extraction — the e-book leg of the ingest stack. EPUB is
the packaging web crawls see for books: an OCF zip (mimetype stored
first, ``application/epub+zip``) holding ``META-INF/container.xml``
(pointer to the package document), an OPF package (manifest of parts +
the SPINE, which defines reading order), and XHTML content documents
(IDPF EPUB 3 / ISO/IEC TS 22424 — public specs). Both directions are
stdlib-only:

- :func:`synth_epub` — a REAL minimal book: stored-first mimetype,
  container.xml, ``OEBPS/content.opf`` with manifest + spine, and one
  XHTML chapter per entry whose paragraph splits across an ``<em>``
  span (tag flattening exercised on every chapter). Chapter parts are
  zip-stored in REVERSE so reading order genuinely comes from the
  spine, not zip order.
- :func:`decode_epub_text` — real parse: zip -> mimetype check ->
  container.xml rootfile -> OPF manifest (id -> href, resolved
  relative to the OPF directory) -> spine itemrefs in order -> each
  chapter's XHTML body text via itertext (``script``/``style``
  subtrees dropped). Every XML part is size-capped and DTD-rejected
  before parse (EPUB XHTML commonly declares a DOCTYPE in the wild,
  so chapters get a narrow exemption: the bare ``<!DOCTYPE html>``
  form with no internal subset is allowed and stripped; any DTD WITH
  an internal subset — the entity-bomb vector — is still rejected).

Operator shape (:func:`epub_chapter_texts`): one Arrow-batched
``mapInPandas`` pass, linear, no shuffle; corrupt blob -> one
``ok=False`` sentinel row.

The ``ns_epub_text`` catalog row synthesizes per-doc books whose
chapter paragraphs are 55-char slices of the documents corpus, so the
DuckDB oracle replays extraction as substr arithmetic — a container,
manifest-resolution, spine-order, or flattening bug breaks the hash.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_epub",
    "decode_epub_text",
    "with_synthetic_epub_payload",
    "epub_chapter_texts",
    "epub_text_oracle_sql",
]

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_XHTML_NS = "http://www.w3.org/1999/xhtml"

CHAPTER_CHARS = 55
_EM_SPLIT = 23  # chars inside the <em> of each chapter paragraph

MAX_PART_XML = 16 * 1024 * 1024

MIMETYPE = "application/epub+zip"

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<container version="1.0" xmlns="{_CONTAINER_NS}">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)

# the benign DOCTYPE real EPUB chapters carry; an internal subset
# ("[" ... "]") is the entity-expansion vector and stays rejected
_BARE_DOCTYPE = re.compile(rb"<!DOCTYPE\s+html\s*(?:SYSTEM\s+\"[^\"\[\]]*\")?\s*>", re.I)


def synth_epub(chapters: list[str], title: str = "t") -> bytes:
    """Real minimal .epub bytes: one XHTML chapter per entry; chapter
    parts zip-stored in REVERSE of spine order (see module doc)."""
    n = len(chapters)
    items = "".join(
        f'<item id="c{i}" href="text/ch{i + 1}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(n)
    )
    refs = "".join(f'<itemref idref="c{i}"/>' for i in range(n))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" unique-identifier="id">'
        f"<metadata><dc:title xmlns:dc=\"http://purl.org/dc/elements/1.1/\">"
        f"{escape(title)}</dc:title></metadata>"
        f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(zipfile.ZipInfo("mimetype"), MIMETYPE, zipfile.ZIP_STORED)
        z.writestr("META-INF/container.xml", _CONTAINER)
        z.writestr("OEBPS/content.opf", opf)
        for i in range(n - 1, -1, -1):  # reverse zip order
            t = chapters[i]
            a, b = t[:_EM_SPLIT], t[_EM_SPLIT:]
            xhtml = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                "<!DOCTYPE html>"
                f'<html xmlns="{_XHTML_NS}"><head><title>c</title>'
                "<style>p{margin:0}</style></head>"
                f"<body><p><em>{escape(a)}</em>{escape(b)}</p></body></html>"
            )
            z.writestr(f"OEBPS/text/ch{i + 1}.xhtml", xhtml)
    return buf.getvalue()


def _read_xml(z: zipfile.ZipFile, name: str, allow_bare_doctype: bool = False) -> ET.Element:
    try:
        info = z.getinfo(name)
    except KeyError:
        raise ValueError(f"epub: package has no {name}") from None
    if info.file_size > MAX_PART_XML:
        raise ValueError(f"epub: {name} {info.file_size} bytes exceeds cap")
    data = z.read(info)
    head = data[:4096]
    if allow_bare_doctype:
        head = _BARE_DOCTYPE.sub(b"", head, count=1)
        data = _BARE_DOCTYPE.sub(b"", data, count=1)
    if b"<!DOCTYPE" in head or b"<!ENTITY" in head:
        raise ValueError(f"epub: {name} declares a DTD (rejected)")
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"epub: bad {name}: {e}") from e


def _body_text(root: ET.Element) -> str:
    """XHTML body text: itertext over <body> with script/style
    subtrees dropped (the html.py extraction semantics, spec-namespaced)."""
    body = root.find(f"{{{_XHTML_NS}}}body")
    if body is None:
        raise ValueError("epub: chapter has no body")
    drop = {f"{{{_XHTML_NS}}}script", f"{{{_XHTML_NS}}}style"}
    parts: list[str] = []

    def walk(node: ET.Element) -> None:
        if node.tag in drop:
            return
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(body)
    return "".join(parts)


def decode_epub_text(payload: bytes) -> list[str]:
    """REAL parse: OCF zip -> container.xml -> OPF manifest + spine ->
    chapter body texts in READING order. Raises ValueError on a
    malformed package."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"epub: not a zip package: {e}") from e
    names = set(z.namelist())
    if "mimetype" in names:
        mt = z.read("mimetype")[:60].decode("latin-1", "replace")
        if not mt.startswith("application/epub+zip"):
            raise ValueError(f"epub: foreign mimetype {mt!r}")
    container = _read_xml(z, "META-INF/container.xml")
    rf = container.find(
        f"{{{_CONTAINER_NS}}}rootfiles/{{{_CONTAINER_NS}}}rootfile"
    )
    if rf is None or not rf.get("full-path"):
        raise ValueError("epub: container.xml has no rootfile")
    opf_path = rf.get("full-path")
    opf = _read_xml(z, opf_path)
    if opf.tag != f"{{{_OPF_NS}}}package":
        raise ValueError(f"epub: unexpected package root {opf.tag}")
    opf_dir = posixpath.dirname(opf_path)
    manifest: dict[str, str] = {}
    for item in opf.iter(f"{{{_OPF_NS}}}item"):
        href = item.get("href", "")
        manifest[item.get("id", "")] = posixpath.normpath(
            posixpath.join(opf_dir, href) if opf_dir else href
        )
    spine = opf.find(f"{{{_OPF_NS}}}spine")
    if spine is None:
        raise ValueError("epub: package has no spine")
    chapters: list[str] = []
    for ref in spine.iter(f"{{{_OPF_NS}}}itemref"):
        part = manifest.get(ref.get("idref", ""))
        if part is None:
            raise ValueError(f"epub: spine idref {ref.get('idref')!r} unresolved")
        chapters.append(
            _body_text(_read_xml(z, part, allow_bare_doctype=True))
        )
    return chapters


def n_chapters_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 3


def with_synthetic_epub_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real .epub bytes: chapter c of doc d carries
    ``text[55c : 55c+55]``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                chapters = [
                    t[CHAPTER_CHARS * c : CHAPTER_CHARS * (c + 1)]
                    for c in range(n_chapters_for(int(d)))
                ]
                payloads.append(synth_epub(chapters))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def epub_chapter_texts(payloads: DataFrame) -> DataFrame:
    """REAL OCF/OPF/XHTML parse -> per-chapter rows (doc_id,
    chapter_idx, chapter_text, ok); malformed blob -> ONE ok=False
    row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "chapter_idx": [], "chapter_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    chapters = decode_epub_text(bytes(p))
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["chapter_idx"].append(-1)
                    out["chapter_text"].append("")
                    out["ok"].append(False)
                    continue
                for idx, t in enumerate(chapters):
                    out["doc_id"].append(doc_id)
                    out["chapter_idx"].append(idx)
                    out["chapter_text"].append(t)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run, "doc_id long, chapter_idx int, chapter_text string, ok boolean"
    )


def epub_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: chapter c of doc d extracts
    substr(text, 55c+1, 55) — encode->decode is the identity."""
    return f"""
    SELECT d.doc_id, CAST(s.c AS INT) AS chapter_idx,
      coalesce(substr(d.text, {CHAPTER_CHARS} * s.c + 1, {CHAPTER_CHARS}), '')
        AS chapter_text,
      true AS ok
    FROM {table} d, generate_series(0, 2) s(c)
    WHERE s.c < 1 + d.doc_id % 3
    ORDER BY d.doc_id, chapter_idx
    """
