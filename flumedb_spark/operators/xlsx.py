"""XLSX cell extraction — completes the office-document ingest family
(PDF in ``operators/pdf.py``, DOCX in ``operators/docx.py``; VERDICT-r9
#4: XLSX is the third most common document container in web crawls).

A .xlsx file is a ZIP container (ECMA-376 / ISO 29500 Open Packaging
Conventions) holding SpreadsheetML parts. Both directions are
stdlib-only, the repo's codec pattern:

- :func:`synth_xlsx` — a REAL minimal workbook: ``[Content_Types].xml``,
  ``_rels/.rels``, ``xl/workbook.xml`` (sheet name + r:id),
  ``xl/_rels/workbook.xml.rels`` (r:id -> worksheet part),
  ``xl/sharedStrings.xml`` and one worksheet. Cells exercise the four
  value encodings a real extractor must handle: shared string
  (``t="s"``, index into sharedStrings), number (no ``t``), boolean
  (``t="b"``, 0/1 wire value), and a formula cell whose cached ``<v>``
  is the value. Excel/LibreOffice open the output.
- :func:`decode_xlsx_cells` — real parse: zip -> workbook.xml sheet
  list -> workbook rels -> each worksheet part -> ``sheetData`` row/
  cell walk, resolving shared-string indices, mapping booleans to
  TRUE/FALSE, taking a formula's cached value, and decoding ``A1``
  references to (row, col) numbers. Every XML part is size-capped
  before inflate AND rejected if it declares a DOCTYPE (entity-
  expansion bombs — the ADVICE-r9 docx hardening, applied here from
  the start).

Operator shape (:func:`xlsx_cells`): one Arrow-batched ``mapInPandas``
pass, per-blob work, linear, no shuffle; corrupt/non-xlsx blobs yield
one ``ok=False`` sentinel row, never a partition failure.

The ``ns_xlsx_cells`` catalog row synthesizes per-doc workbooks whose
string cells are 30-char slices of the documents corpus and whose
numeric/boolean/formula cells are doc_id arithmetic, so the DuckDB
oracle replays extraction closed-form — a zip-offset, shared-string,
reference-decode, or type-mapping bug breaks the hash match.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_xlsx",
    "decode_xlsx_cells",
    "with_synthetic_xlsx_payload",
    "xlsx_cells",
    "xlsx_cells_oracle_sql",
]

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"

CELL_CHARS = 30  # chars of corpus text per string cell

# inflate cap per XML part — bounds zip-bomb cost (and DOCTYPE is
# rejected outright, so expat entity expansion never runs on untrusted
# input regardless of expat version)
MAX_PART_XML = 16 * 1024 * 1024

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_PKG_REL}">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_PKG_REL}">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
    'Target="sharedStrings.xml"/>'
    "</Relationships>"
)


def col_letters(col_num: int) -> str:
    """1-based column number -> A1-style letters (1->A, 27->AA)."""
    s = ""
    n = int(col_num)
    while n > 0:
        n, r = divmod(n - 1, 26)
        s = chr(ord("A") + r) + s
    return s


_REF_RE = re.compile(r"^([A-Z]+)([0-9]+)$")


def ref_to_row_col(ref: str) -> tuple[int, int]:
    """A1-style reference -> (row_num, col_num), both 1-based."""
    m = _REF_RE.match(ref)
    if not m:
        raise ValueError(f"xlsx: bad cell reference {ref!r}")
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return int(m.group(2)), col


def synth_xlsx(
    sheet_name: str, string_rows: list[str], doc_id: int
) -> bytes:
    """Real minimal .xlsx bytes: one sheet, one row per entry of
    ``string_rows``, four cells per row — A: shared string (the entry),
    B: number ``doc_id*31 + r*7``, C: boolean ``(doc_id+r) % 2``,
    D: formula ``B*2`` with its cached value."""
    shared = list(string_rows)
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS_MAIN}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{escape(s)}</t></si>' for s in shared
        )
        + "</sst>"
    )
    rows_xml = []
    for r, _s in enumerate(string_rows):
        rn = r + 1
        num = int(doc_id) * 31 + r * 7
        rows_xml.append(
            f'<row r="{rn}">'
            f'<c r="A{rn}" t="s"><v>{r}</v></c>'
            f'<c r="B{rn}"><v>{num}</v></c>'
            f'<c r="C{rn}" t="b"><v>{(int(doc_id) + r) % 2}</v></c>'
            f'<c r="D{rn}"><f>B{rn}*2</f><v>{2 * num}</v></c>'
            "</row>"
        )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _read_xml(z: zipfile.ZipFile, name: str) -> ET.Element:
    """Size-capped, DOCTYPE-rejecting XML part read."""
    try:
        info = z.getinfo(name)
    except KeyError:
        raise ValueError(f"xlsx: package has no {name}") from None
    if info.file_size > MAX_PART_XML:
        raise ValueError(f"xlsx: {name} {info.file_size} bytes exceeds cap")
    data = z.read(info)
    # reject DTDs before expat sees them: a sub-cap part with nested
    # entities can expand far beyond the cap (billion laughs)
    if b"<!DOCTYPE" in data[:4096] or b"<!ENTITY" in data[:4096]:
        raise ValueError(f"xlsx: {name} declares a DTD (rejected)")
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"xlsx: bad {name}: {e}") from e


def decode_xlsx_cells(
    payload: bytes,
) -> list[tuple[str, str, int, int, str, str]]:
    """REAL parse: OPC zip -> workbook sheet list -> rels -> worksheet
    sheetData walk. Returns one tuple per cell:
    (sheet_name, cell_ref, row_num, col_num, cell_type, value) where
    cell_type is the resolved value class ('s' shared/inline string,
    'n' number incl. cached formula values, 'b' boolean) and value is
    the resolved text (shared strings dereferenced, booleans mapped to
    TRUE/FALSE). Raises ValueError on a malformed package."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"xlsx: not a zip package: {e}") from e
    wb = _read_xml(z, "xl/workbook.xml")
    if wb.tag != f"{{{_NS_MAIN}}}workbook":
        raise ValueError(f"xlsx: unexpected workbook root {wb.tag}")
    # r:id -> part path (workbook-relative targets live under xl/)
    rel_map: dict[str, str] = {}
    try:
        rels = _read_xml(z, "xl/_rels/workbook.xml.rels")
    except ValueError:
        rels = None
    if rels is not None:
        for rel in rels.iter(f"{{{_NS_PKG_REL}}}Relationship"):
            target = rel.get("Target", "")
            if not target.startswith("/"):
                target = "xl/" + target
            rel_map[rel.get("Id", "")] = target.lstrip("/")
    # shared strings: si -> concatenated t descendants (rich-text runs)
    shared: list[str] = []
    if any(i.filename == "xl/sharedStrings.xml" for i in z.infolist()):
        sst = _read_xml(z, "xl/sharedStrings.xml")
        for si in sst.iter(f"{{{_NS_MAIN}}}si"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t"))
            )
    out: list[tuple[str, str, int, int, str, str]] = []
    sheets = wb.find(f"{{{_NS_MAIN}}}sheets")
    if sheets is None:
        raise ValueError("xlsx: workbook has no sheets element")
    for sh in sheets.iter(f"{{{_NS_MAIN}}}sheet"):
        name = sh.get("name", "")
        rid = sh.get(f"{{{_NS_REL}}}id", "")
        part = rel_map.get(rid)
        if part is None:
            raise ValueError(f"xlsx: sheet {name!r} has no rel target")
        ws = _read_xml(z, part)
        for c in ws.iter(f"{{{_NS_MAIN}}}c"):
            ref = c.get("r", "")
            row_num, col_num = ref_to_row_col(ref)
            t = c.get("t", "n")
            v = c.find(f"{{{_NS_MAIN}}}v")
            raw = v.text or "" if v is not None else ""
            if t == "s":
                idx = int(raw)
                if idx < 0 or idx >= len(shared):
                    raise ValueError(f"xlsx: shared-string index {idx} OOB")
                out.append((name, ref, row_num, col_num, "s", shared[idx]))
            elif t == "inlineStr":
                is_el = c.find(f"{{{_NS_MAIN}}}is")
                txt = (
                    "".join(
                        t_el.text or ""
                        for t_el in is_el.iter(f"{{{_NS_MAIN}}}t")
                    )
                    if is_el is not None
                    else ""
                )
                out.append((name, ref, row_num, col_num, "s", txt))
            elif t == "b":
                out.append(
                    (name, ref, row_num, col_num, "b",
                     "TRUE" if raw.strip() == "1" else "FALSE")
                )
            elif t == "str":  # formula cached string
                out.append((name, ref, row_num, col_num, "s", raw))
            else:  # 'n' numbers, incl. cached formula values
                out.append((name, ref, row_num, col_num, "n", raw))
    return out


def n_rows_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 3


def with_synthetic_xlsx_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real .xlsx bytes: sheet ``S{doc_id % 5}`` with
    ``1 + doc_id % 3`` rows; row r's string cell carries
    ``text[30r : 30r+30]``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                d = int(d)
                t = t or ""
                rows = [
                    t[CELL_CHARS * r : CELL_CHARS * (r + 1)]
                    for r in range(n_rows_for(d))
                ]
                payloads.append(synth_xlsx(f"S{d % 5}", rows, d))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


XLSX_CELLS_SCHEMA = (
    "doc_id long, sheet string, cell string, row_num int, col_num int, "
    "cell_type string, value string, ok boolean"
)


def xlsx_cells(payloads: DataFrame) -> DataFrame:
    """REAL OPC/SpreadsheetML parse -> one row per cell; malformed blob
    -> ONE ok=False sentinel row (the multimodal.py contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "sheet": [], "cell": [], "row_num": [],
                "col_num": [], "cell_type": [], "value": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    cells = decode_xlsx_cells(bytes(p))
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["sheet"].append("")
                    out["cell"].append("")
                    out["row_num"].append(-1)
                    out["col_num"].append(-1)
                    out["cell_type"].append("")
                    out["value"].append("")
                    out["ok"].append(False)
                    continue
                for name, ref, rn, cn, t, v in cells:
                    out["doc_id"].append(doc_id)
                    out["sheet"].append(name)
                    out["cell"].append(ref)
                    out["row_num"].append(rn)
                    out["col_num"].append(cn)
                    out["cell_type"].append(t)
                    out["value"].append(v)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, XLSX_CELLS_SCHEMA)


def xlsx_cells_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of synth -> full parse: cell values are substr /
    doc_id arithmetic; encode->decode is the identity."""
    return f"""
    WITH rows AS (
      SELECT d.doc_id, d.text, s.r
      FROM {table} d, generate_series(0, 2) s(r)
      WHERE s.r < 1 + d.doc_id % 3
    ),
    cells AS (
      SELECT doc_id, 'S' || CAST(doc_id % 5 AS VARCHAR) AS sheet,
        'A' || CAST(r + 1 AS VARCHAR) AS cell,
        CAST(r + 1 AS INT) AS row_num, CAST(1 AS INT) AS col_num,
        's' AS cell_type,
        coalesce(substr(text, {CELL_CHARS} * r + 1, {CELL_CHARS}), '')
          AS value
      FROM rows
      UNION ALL
      SELECT doc_id, 'S' || CAST(doc_id % 5 AS VARCHAR),
        'B' || CAST(r + 1 AS VARCHAR), CAST(r + 1 AS INT), CAST(2 AS INT),
        'n', CAST(doc_id * 31 + r * 7 AS VARCHAR)
      FROM rows
      UNION ALL
      SELECT doc_id, 'S' || CAST(doc_id % 5 AS VARCHAR),
        'C' || CAST(r + 1 AS VARCHAR), CAST(r + 1 AS INT), CAST(3 AS INT),
        'b', CASE WHEN (doc_id + r) % 2 = 1 THEN 'TRUE' ELSE 'FALSE' END
      FROM rows
      UNION ALL
      SELECT doc_id, 'S' || CAST(doc_id % 5 AS VARCHAR),
        'D' || CAST(r + 1 AS VARCHAR), CAST(r + 1 AS INT), CAST(4 AS INT),
        'n', CAST(2 * (doc_id * 31 + r * 7) AS VARCHAR)
      FROM rows
    )
    SELECT doc_id, sheet, cell, row_num, col_num, cell_type, value,
      true AS ok
    FROM cells ORDER BY doc_id, row_num, col_num
    """
