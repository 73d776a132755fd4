"""RTF text extraction — the legacy-office leg of the ingest stack.
RTF (Microsoft Rich Text Format, public spec v1.9.1) is still common
in mail attachments and old document dumps. Both directions are
stdlib-only:

- :func:`synth_rtf` — a REAL minimal document: ``{\\rtf1\\ansi`` header
  with a font table and color table (skip destinations the reader must
  ignore), an ``{\\*\\generator}`` ignorable destination, and one
  paragraph per entry whose text is split across a ``{\\b ...}`` group,
  with a deterministic subset of characters written as ``\\'xx`` hex
  escapes and as ``\\uN?`` unicode escapes — so every document
  exercises the group stack, destination skipping, both escape
  decoders, and the ``\\uc`` fallback-skip rule.
- :func:`decode_rtf_text` — a real tokenizer over the spec's four
  token classes (group open/close, control word with optional signed
  numeric parameter, control symbol, plain text): maintains the group
  state stack (current ``\\uc`` count, destination-skip depth), skips
  ``{\\*`` ignorable destinations and the known binary/metadata
  destinations, honors ``\\binN`` raw-byte skips, maps ``\\par`` /
  ``\\line`` / ``\\tab`` to text, decodes ``\\'xx`` as cp1252 and
  ``\\uN`` as the BMP code point (negative-N 16-bit wraparound), and
  drops raw CR/LF per spec.

Operator shape (:func:`rtf_paragraphs`): one Arrow-batched
``mapInPandas`` pass, linear, no shuffle; corrupt blob -> ONE
``ok=False`` sentinel row.

The ``ns_rtf_text`` catalog row synthesizes per-doc RTF whose
paragraph p carries chars [40p, 40p+40) of the documents corpus, so
the DuckDB oracle replays extraction as substr arithmetic — a group
stack, destination skip, escape decode, or uc-skip bug breaks the
hash.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_rtf",
    "decode_rtf_text",
    "with_synthetic_rtf_payload",
    "rtf_paragraphs",
    "rtf_text_oracle_sql",
]

PARA_CHARS = 40
_B_START, _B_END = 12, 25  # the {\b ...} span inside each paragraph

MAX_RTF = 64 * 1024 * 1024


def _is_ascii_alpha(b: int) -> bool:
    return 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A


def _is_ascii_digit(b: int) -> bool:
    return 0x30 <= b <= 0x39

# destinations whose content is data, not document text (spec §
# "Destinations"); readers must skip the whole group
_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "annotation", "field", "themedata",
    "datastore", "xmlnstbl", "listtable", "listoverridetable",
    "generator", "operator", "filetbl", "revtbl",
}

_HEADER = (
    r"{\rtf1\ansi\ansicpg1252\deff0\uc1"
    r"{\fonttbl{\f0\froman Times New Roman;}{\f1\fswiss Arial;}}"
    r"{\colortbl;\red255\green0\blue0;\red0\green0\blue255;}"
    r"{\*\generator flumedb_spark synth 1.0;}"
)


def _enc(text: str, hex_stride: int = 5, uni_stride: int = 11) -> str:
    """Encode paragraph text: every ``hex_stride``-th char as \\'xx,
    every ``uni_stride``-th as \\uN? (with the \\uc1 single-char
    fallback), specials escaped — both escape decoders exercised on
    ordinary ASCII so the oracle stays substr arithmetic."""
    out: list[str] = []
    for i, ch in enumerate(text):
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o > 255:
            n = o if o < 32768 else o - 65536
            out.append(f"\\u{n}?")
        elif i % uni_stride == uni_stride - 1:
            out.append(f"\\u{o}?")
        elif i % hex_stride == hex_stride - 1 or o > 127:
            out.append(f"\\'{o:02x}")
        else:
            out.append(ch)
    return "".join(out)


def synth_rtf(paragraphs: list[str]) -> bytes:
    """Real minimal .rtf bytes: one \\par-terminated paragraph per
    entry, text split across a {\\b ...} group (see module doc)."""
    body: list[str] = []
    for t in paragraphs:
        a, b, c = t[:_B_START], t[_B_START:_B_END], t[_B_END:]
        body.append(
            r"\pard\plain\f0\fs24 "
            + _enc(a)
            + r"{\b\cf1 " + _enc(b) + "}"
            + _enc(c)
            + r"\par"
        )
    return ("".join([_HEADER, *body, "}"])).encode("cp1252")


def decode_rtf_text(payload: bytes) -> list[str]:
    """REAL tokenizer -> paragraph texts (split on \\par). Raises
    ValueError on malformed input (unbalanced groups, truncated
    escapes, missing header)."""
    buf = bytes(payload)
    if len(buf) > MAX_RTF:
        raise ValueError(f"rtf: {len(buf)} bytes exceeds cap")
    if not buf.startswith(b"{\\rtf"):
        raise ValueError("rtf: missing {\\rtf header")
    text: list[str] = []
    paragraphs: list[str] = []
    # group state: (uc_count, skipping)
    stack: list[tuple[int, bool]] = []
    uc, skipping = 1, False
    pending_uc_skip = 0  # fallback chars to swallow after \uN
    i, n = 0, len(buf)

    def flush_para() -> None:
        paragraphs.append("".join(text))
        text.clear()

    def emit(s: str) -> None:
        nonlocal pending_uc_skip
        if pending_uc_skip > 0:
            pending_uc_skip -= 1
            return
        if not skipping:
            text.append(s)

    while i < n:
        c = buf[i]
        if c == 0x7B:  # {
            stack.append((uc, skipping))
            i += 1
        elif c == 0x7D:  # }
            if not stack:
                raise ValueError("rtf: unbalanced closing brace")
            uc, skipping = stack.pop()
            i += 1
        elif c == 0x5C:  # backslash
            if i + 1 >= n:
                raise ValueError("rtf: dangling backslash")
            nxt = buf[i + 1]
            if nxt == 0x27:  # \'xx
                if i + 3 >= n:
                    raise ValueError("rtf: truncated \\'xx escape")
                try:
                    emit(bytes([int(buf[i + 2 : i + 4], 16)]).decode("cp1252"))
                except ValueError as e:
                    raise ValueError(f"rtf: bad hex escape: {e}") from e
                i += 4
            elif nxt == 0x2A:  # \* ignorable destination
                skipping = True
                i += 2
            elif _is_ascii_alpha(nxt):
                j = i + 1
                while j < n and _is_ascii_alpha(buf[j]):
                    j += 1
                word = buf[i + 1 : j].decode("ascii")
                k = j
                if k < n and (buf[k] == 0x2D or _is_ascii_digit(buf[k])):
                    k += 1
                    while k < n and _is_ascii_digit(buf[k]):
                        k += 1
                param = int(buf[j:k]) if k > j else None
                if k < n and buf[k] == 0x20:  # space delimiter consumed
                    k += 1
                i = k
                if word == "u":
                    if param is None:
                        raise ValueError("rtf: \\u without code point")
                    cp = param + 65536 if param < 0 else param
                    if skipping:
                        pass
                    else:
                        if pending_uc_skip > 0:
                            pending_uc_skip -= 1
                        else:
                            text.append(chr(cp))
                            pending_uc_skip = uc
                elif word == "uc":
                    uc = param if param is not None else 1
                elif word == "bin":
                    i += max(param or 0, 0)  # raw bytes, not tokens
                elif word == "par" or word == "line":
                    if not skipping and pending_uc_skip == 0:
                        if word == "par":
                            flush_para()
                        else:
                            text.append("\n")
                elif word == "tab":
                    emit("\t")
                elif word in _SKIP_DESTINATIONS:
                    skipping = True
                # all other control words are formatting: ignored
            else:  # control symbol: \\ \{ \} \~ \- etc.
                sym = chr(nxt)
                if sym in "\\{}":
                    emit(sym)
                elif sym == "~":
                    emit(" ")
                i += 2
        elif c in (0x0D, 0x0A):  # raw CR/LF ignored per spec
            i += 1
        else:
            emit(chr(c) if c < 128 else bytes([c]).decode("cp1252"))
            i += 1
    if stack:
        raise ValueError("rtf: unbalanced opening brace")
    if text:
        flush_para()
    return paragraphs


def n_paragraphs_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 3


def with_synthetic_rtf_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> real .rtf bytes: paragraph p of doc d carries
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
                payloads.append(synth_rtf(paras))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def rtf_paragraphs(payloads: DataFrame) -> DataFrame:
    """REAL RTF parse -> per-paragraph rows (doc_id, para_idx,
    para_text, ok); malformed blob -> ONE ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "para_idx": [], "para_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    paras = decode_rtf_text(bytes(p))
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


def rtf_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: paragraph p of doc d extracts
    substr(text, 40p+1, 40) — encode->decode is the identity."""
    return f"""
    SELECT d.doc_id, CAST(s.p AS INT) AS para_idx,
      coalesce(substr(d.text, {PARA_CHARS} * s.p + 1, {PARA_CHARS}), '')
        AS para_text,
      true AS ok
    FROM {table} d, generate_series(0, 2) s(p)
    WHERE s.p < 1 + d.doc_id % 3
    ORDER BY d.doc_id, para_idx
    """
