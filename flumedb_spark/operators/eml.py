"""Email (EML / MBOX) text extraction — the mail leg of the ingest
stack. Mail archives are a major crawl corpus type (public mailing
lists, support forums, the classic research corpora); the wire format
is RFC 5322 (headers) + MIME (RFC 2045/2046 multipart bodies, RFC 2047
encoded-word headers). Both directions are stdlib-only:

- :func:`synth_eml` — a REAL minimal message: RFC 5322 headers with an
  RFC 2047 base64 encoded-word Subject, ``multipart/alternative`` body
  whose ``text/plain`` part is quoted-printable and whose ``text/html``
  part is base64 over an XHTML-ish wrapper with the text split across
  a ``<b>`` span (so every message exercises the encoded-word decoder,
  both transfer decoders, and HTML tag flattening).
- :func:`decode_eml` — real parse via the stdlib :mod:`email` package
  (``message_from_bytes`` + ``policy.default``): header decode, MIME
  part walk, per-part charset + transfer decode, tag strip for HTML
  parts.
- :func:`mbox_bytes` / :func:`split_mbox` — the RFC 4155 mbox framing
  (``From `` separator lines, ``>From `` body quoting) so mailbox
  archives split into messages without a driver loop.

Operator shape (:func:`eml_part_texts`, :func:`mbox_messages`): one
Arrow-batched ``mapInPandas`` pass per blob column, linear, no
shuffle; a corrupt blob degrades to ONE ``ok=False`` sentinel row and
never fails the partition — the 100 TB posture for untrusted mail
archives.

Catalog rows synthesize messages whose subject/part texts are fixed
slices of the documents corpus, so the DuckDB oracle replays
extraction as substr arithmetic — a header-decode, boundary-walk,
transfer-decode, or mbox-framing bug breaks the hash.

Reference parity note: the reference engine (flumedb) exposes raw
log-record ingestion only; this module is part of the
training-data-pipeline surface the build brief layers on top.
"""

from __future__ import annotations

import base64
import quopri
import re
from email import message_from_bytes, policy
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_eml",
    "decode_eml",
    "mbox_bytes",
    "split_mbox",
    "with_synthetic_eml_payload",
    "with_synthetic_mbox_payload",
    "eml_part_texts",
    "mbox_messages",
    "eml_text_oracle_sql",
    "mbox_messages_oracle_sql",
]

SUBJECT_CHARS = 20
PLAIN_CHARS = 60
HTML_CHARS = 60
_B_SPLIT = 25  # chars inside the <b> span of the HTML part

# mbox row geometry: message m of doc d
MBOX_SUBJ_OFF = 10  # subject of message m starts at 10*m
MBOX_BODY_OFF = 25  # body of message m starts at 25*m + 20
MBOX_BODY_CHARS = 40

MAX_MESSAGE = 64 * 1024 * 1024  # refuse pathological single messages

_CRLF = "\r\n"


def _qp(text: str) -> str:
    """Quoted-printable body encoding (RFC 2045 §6.7)."""
    return quopri.encodestring(text.encode("utf-8")).decode("ascii")


def _b64_lines(raw: bytes) -> str:
    """Base64 body folded at the RFC-mandated 76 columns."""
    b = base64.b64encode(raw).decode("ascii")
    return _CRLF.join(b[i : i + 76] for i in range(0, len(b), 76))


def _html_wrap(text: str) -> str:
    """The HTML part body: text split across a <b> span so tag
    flattening is exercised on every message."""
    a, b = text[:_B_SPLIT], text[_B_SPLIT:]
    esc = lambda s: s.replace("&", "&amp;").replace("<", "&lt;")
    return (
        "<html><head><style>p{margin:0}</style></head>"
        f"<body><p><b>{esc(a)}</b>{esc(b)}</p></body></html>"
    )


def synth_eml(subject: str, plain: str, html_text: str, msg_id: int = 0) -> bytes:
    """Real minimal RFC 5322 + MIME message bytes (see module doc)."""
    boundary = f"=_b{int(msg_id)}_flume"
    subj_b64 = base64.b64encode(subject.encode("utf-8")).decode("ascii")
    lines = [
        "From: sender@corp.test",
        "To: archive@corp.test",
        "Date: Mon, 01 Jan 2024 00:00:00 +0000",
        f"Message-ID: <m{int(msg_id)}@corp.test>",
        f"Subject: =?utf-8?B?{subj_b64}?=",
        "MIME-Version: 1.0",
        f'Content-Type: multipart/alternative; boundary="{boundary}"',
        "",
        "preamble is ignored by MIME consumers",
        f"--{boundary}",
        'Content-Type: text/plain; charset="utf-8"',
        "Content-Transfer-Encoding: quoted-printable",
        "",
        _qp(plain).replace("\n", _CRLF).rstrip(_CRLF),
        f"--{boundary}",
        'Content-Type: text/html; charset="utf-8"',
        "Content-Transfer-Encoding: base64",
        "",
        _b64_lines(_html_wrap(html_text).encode("utf-8")),
        f"--{boundary}--",
        "",
    ]
    return _CRLF.join(lines).encode("utf-8")


class _TextExtractor(HTMLParser):
    """Flatten an HTML part to text, dropping script/style subtrees —
    the html.py extraction semantics."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def _strip_html(html: str) -> str:
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return "".join(p.parts)


def decode_eml(payload: bytes) -> tuple[str, list[tuple[str, str]]]:
    """REAL parse: (decoded subject, [(mime_type, part_text), ...]) in
    MIME walk order, leaf text/* parts only; HTML parts are
    tag-flattened. Raises ValueError on a malformed message."""
    payload = bytes(payload)
    if not payload:
        raise ValueError("eml: empty payload")
    if len(payload) > MAX_MESSAGE:
        raise ValueError(f"eml: message {len(payload)} bytes exceeds cap")
    try:
        msg = message_from_bytes(payload, policy=policy.default)
    except Exception as e:  # email surfaces varied exception types
        raise ValueError(f"eml: unparseable message: {e}") from e
    if msg.defects:
        names = ",".join(type(d).__name__ for d in msg.defects)
        raise ValueError(f"eml: message has defects: {names}")
    subject = str(msg.get("subject", "") or "")
    parts: list[tuple[str, str]] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if not ctype.startswith("text/"):
            continue
        try:
            content = part.get_content()
        except Exception as e:
            raise ValueError(f"eml: undecodable {ctype} part: {e}") from e
        if ctype == "text/html":
            content = _strip_html(content)
        else:
            # message framing appends a trailing newline to the body
            content = content[:-1] if content.endswith("\n") else content
        parts.append((ctype, content))
    if not parts:
        raise ValueError("eml: no text parts")
    return subject, parts


# ---------------------------------------------------------------------
# mbox framing (RFC 4155)
# ---------------------------------------------------------------------

_FROM_QUOTE = re.compile(rb"(?m)^(>*)From ")


def mbox_bytes(messages: list[bytes]) -> bytes:
    """RFC 4155 mbox: each message preceded by a ``From `` separator
    line; body lines matching ``^>*From `` gain one ``>`` (the
    reversible mboxrd quoting)."""
    out = []
    for m in messages:
        body = _FROM_QUOTE.sub(rb">\1From ", m)
        out.append(b"From archive@corp.test Mon Jan  1 00:00:00 2024\n")
        out.append(body)
        if not body.endswith(b"\n"):
            out.append(b"\n")
        out.append(b"\n")
    return b"".join(out)


_UNQUOTE = re.compile(rb"(?m)^>(>*From )")


def split_mbox(blob: bytes) -> list[bytes]:
    """Split an mbox blob into raw message bytes, reversing the mboxrd
    quoting. Raises ValueError if the blob does not start with a
    ``From `` line."""
    blob = bytes(blob)
    if not blob.startswith(b"From "):
        raise ValueError("mbox: missing leading From line")
    messages: list[bytes] = []
    # split on separator lines only (line start, unquoted "From ")
    starts = [m.start() for m in re.finditer(rb"(?m)^From .*$", blob)]
    for i, s in enumerate(starts):
        body_start = blob.index(b"\n", s) + 1
        end = starts[i + 1] if i + 1 < len(starts) else len(blob)
        body = blob[body_start:end].rstrip(b"\r\n")
        messages.append(_UNQUOTE.sub(rb"\1", body))
    return messages


# ---------------------------------------------------------------------
# synthesis from the documents corpus (oracle-replayable)
# ---------------------------------------------------------------------


def with_synthetic_eml_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> real .eml bytes: subject = text[0:20], plain part =
    text[20:80], html part = text[80:140]."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                payloads.append(
                    synth_eml(
                        t[:SUBJECT_CHARS],
                        t[SUBJECT_CHARS : SUBJECT_CHARS + PLAIN_CHARS],
                        t[
                            SUBJECT_CHARS + PLAIN_CHARS :
                            SUBJECT_CHARS + PLAIN_CHARS + HTML_CHARS
                        ],
                        msg_id=int(d),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def n_mbox_messages_for(doc_id: int) -> int:
    return 1 + int(doc_id) % 2


def with_synthetic_mbox_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> real mbox bytes holding 1 + doc_id % 2 messages:
    message m's subject = text[10m : 10m+20], plain body =
    text[25m+20 : 25m+60]. The plain body deliberately starts with
    ``From the corpus:`` when m is odd so the mboxrd quoting path is
    exercised by real separators-in-body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                msgs = []
                for m in range(n_mbox_messages_for(int(d))):
                    subj = t[MBOX_SUBJ_OFF * m : MBOX_SUBJ_OFF * m + SUBJECT_CHARS]
                    body = t[
                        MBOX_BODY_OFF * m + SUBJECT_CHARS :
                        MBOX_BODY_OFF * m + SUBJECT_CHARS + MBOX_BODY_CHARS
                    ]
                    prefix = "From the corpus: " if m % 2 else ""
                    msgs.append(
                        synth_eml(subj, prefix + body, "", msg_id=int(d) * 10 + m)
                    )
                payloads.append(mbox_bytes(msgs))
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


# ---------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------


def eml_part_texts(payloads: DataFrame) -> DataFrame:
    """REAL RFC 5322/MIME parse -> per-part rows (doc_id, subject,
    part_idx, mime_type, part_text, ok); malformed blob -> ONE
    ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "subject": [], "part_idx": [],
                "mime_type": [], "part_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    subject, parts = decode_eml(p)
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["subject"].append("")
                    out["part_idx"].append(-1)
                    out["mime_type"].append("")
                    out["part_text"].append("")
                    out["ok"].append(False)
                    continue
                for idx, (ctype, text) in enumerate(parts):
                    out["doc_id"].append(doc_id)
                    out["subject"].append(subject)
                    out["part_idx"].append(idx)
                    out["mime_type"].append(ctype)
                    out["part_text"].append(text)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, subject string, part_idx int, "
        "mime_type string, part_text string, ok boolean",
    )


def mbox_messages(payloads: DataFrame) -> DataFrame:
    """REAL mbox split + per-message parse -> rows (doc_id, msg_idx,
    subject, body_text, ok); malformed blob -> ONE ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "msg_idx": [], "subject": [],
                "body_text": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    msgs = split_mbox(p)
                    decoded = [decode_eml(m) for m in msgs]
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["msg_idx"].append(-1)
                    out["subject"].append("")
                    out["body_text"].append("")
                    out["ok"].append(False)
                    continue
                for idx, (subject, parts) in enumerate(decoded):
                    plain = next(
                        (t for c, t in parts if c == "text/plain"), ""
                    )
                    out["doc_id"].append(doc_id)
                    out["msg_idx"].append(idx)
                    out["subject"].append(subject)
                    out["body_text"].append(plain)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, msg_idx int, subject string, body_text string, ok boolean",
    )


# ---------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------


def eml_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: encode->decode is the identity, so part 0 is
    text[20:80] and part 1 is text[80:140]; subject is text[0:20]."""
    return f"""
    SELECT d.doc_id,
      coalesce(substr(d.text, 1, {SUBJECT_CHARS}), '') AS subject,
      CAST(p.i AS INT) AS part_idx,
      CASE p.i WHEN 0 THEN 'text/plain' ELSE 'text/html' END AS mime_type,
      CASE p.i
        WHEN 0 THEN coalesce(substr(d.text, {SUBJECT_CHARS + 1}, {PLAIN_CHARS}), '')
        ELSE coalesce(substr(d.text, {SUBJECT_CHARS + PLAIN_CHARS + 1}, {HTML_CHARS}), '')
      END AS part_text,
      true AS ok
    FROM {table} d, generate_series(0, 1) p(i)
    ORDER BY d.doc_id, part_idx
    """


def mbox_messages_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of the mbox geometry: message m's subject is
    text[10m : 10m+20]; its body is text[25m+20 : 25m+60] with the
    odd-message ``From the corpus: `` prefix."""
    return f"""
    SELECT d.doc_id, CAST(s.m AS INT) AS msg_idx,
      coalesce(substr(d.text, {MBOX_SUBJ_OFF} * s.m + 1, {SUBJECT_CHARS}), '')
        AS subject,
      CASE WHEN s.m % 2 = 1 THEN 'From the corpus: ' ELSE '' END ||
      coalesce(substr(d.text, {MBOX_BODY_OFF} * s.m + {SUBJECT_CHARS} + 1,
                      {MBOX_BODY_CHARS}), '') AS body_text,
      true AS ok
    FROM {table} d, generate_series(0, 1) s(m)
    WHERE s.m < 1 + d.doc_id % 2
    ORDER BY d.doc_id, msg_idx
    """


# ---------------------------------------------------------------------
# attachments (multipart/mixed -> binary parts -> media triage)
# ---------------------------------------------------------------------

ATT_FILENAME = "scan.bmp"


def synth_eml_with_attachment(
    subject: str, plain: str, attachment: bytes, msg_id: int = 0
) -> bytes:
    """Real multipart/mixed message: a quoted-printable text/plain
    body plus a base64 ``image/bmp`` attachment with a
    Content-Disposition filename — the shape mail archives actually
    carry binary media in."""
    boundary = f"=_m{int(msg_id)}_flume"
    subj_b64 = base64.b64encode(subject.encode("utf-8")).decode("ascii")
    lines = [
        "From: sender@corp.test",
        "To: archive@corp.test",
        "Date: Mon, 01 Jan 2024 00:00:00 +0000",
        f"Message-ID: <a{int(msg_id)}@corp.test>",
        f"Subject: =?utf-8?B?{subj_b64}?=",
        "MIME-Version: 1.0",
        f'Content-Type: multipart/mixed; boundary="{boundary}"',
        "",
        f"--{boundary}",
        'Content-Type: text/plain; charset="utf-8"',
        "Content-Transfer-Encoding: quoted-printable",
        "",
        _qp(plain).replace("\n", _CRLF).rstrip(_CRLF),
        f"--{boundary}",
        "Content-Type: image/bmp",
        "Content-Transfer-Encoding: base64",
        f'Content-Disposition: attachment; filename="{ATT_FILENAME}"',
        "",
        _b64_lines(attachment),
        f"--{boundary}--",
        "",
    ]
    return _CRLF.join(lines).encode("utf-8")


def decode_eml_attachments(payload: bytes) -> list[tuple[str, str, bytes]]:
    """REAL parse -> [(filename, mime_type, raw bytes), ...] for every
    non-text leaf part. Raises ValueError on a malformed message."""
    payload = bytes(payload)
    if not payload:
        raise ValueError("eml: empty payload")
    if len(payload) > MAX_MESSAGE:
        raise ValueError(f"eml: message {len(payload)} bytes exceeds cap")
    try:
        msg = message_from_bytes(payload, policy=policy.default)
    except Exception as e:
        raise ValueError(f"eml: unparseable message: {e}") from e
    if msg.defects:
        names = ",".join(type(d).__name__ for d in msg.defects)
        raise ValueError(f"eml: message has defects: {names}")
    out: list[tuple[str, str, bytes]] = []
    for part in msg.walk():
        if part.is_multipart() or part.get_content_type().startswith("text/"):
            continue
        try:
            blob = part.get_content()
        except Exception as e:
            raise ValueError(f"eml: undecodable attachment: {e}") from e
        if not isinstance(blob, (bytes, bytearray)):
            raise ValueError("eml: attachment decoded to non-bytes")
        out.append(
            (part.get_filename() or "", part.get_content_type(), bytes(blob))
        )
    return out


def attachment_dims_for(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    """(width, height, rgb) of doc d's synthetic BMP attachment."""
    d = int(doc_id)
    w, h = 8 + d % 8, 4 + d % 4
    rgb = ((2 * d + 1) % 256, (4 * d + 3) % 256, (6 * d + 5) % 256)
    return w, h, rgb


def with_synthetic_eml_attachment_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> real multipart/mixed .eml bytes whose attachment is a
    constant-color BMP with doc-arithmetic dims/color (encode via
    mmcodec.encode_bmp — the real writer)."""
    import numpy as np

    from . import mmcodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d, t in zip(pdf_b["doc_id"], pdf_b[text_col]):
                t = t or ""
                w, h, rgb = attachment_dims_for(int(d))
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[:, :] = rgb
                payloads.append(
                    synth_eml_with_attachment(
                        t[:SUBJECT_CHARS],
                        t[SUBJECT_CHARS : SUBJECT_CHARS + PLAIN_CHARS],
                        mmcodec.encode_bmp(arr),
                        msg_id=int(d),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, payload binary"
    )


def eml_attachment_stats(payloads: DataFrame) -> DataFrame:
    """REAL chain: MIME walk -> base64 attachment bytes -> BMP decode
    -> (doc_id, filename, mime_type, n_bytes, width, height,
    pixel_sum, ok). The email-archive form of the media-triage
    contract: malformed message OR undecodable image -> ONE ok=False
    row, never a failed partition."""
    import numpy as np

    from . import mmcodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "filename": [], "mime_type": [], "n_bytes": [],
                "width": [], "height": [], "pixel_sum": [], "ok": [],
            }

            def emit(doc_id, fn, mt, nb, w, h, ps, ok):
                out["doc_id"].append(doc_id)
                out["filename"].append(fn)
                out["mime_type"].append(mt)
                out["n_bytes"].append(nb)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(ps)
                out["ok"].append(ok)

            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    atts = decode_eml_attachments(p)
                    if not atts:
                        raise ValueError("eml: no attachments")
                    for fn, mt, blob in atts:
                        arr = mmcodec.decode_bmp(blob)
                        emit(
                            doc_id, fn, mt, len(blob),
                            arr.shape[1], arr.shape[0],
                            int(arr.sum(dtype=np.int64)), True,
                        )
                except ValueError:
                    emit(doc_id, "", "", 0, 0, 0, 0, False)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, filename string, mime_type string, n_bytes long, "
        "width int, height int, pixel_sum long, ok boolean",
    )


def eml_attachment_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: dims/color are doc arithmetic; BMP size is
    54 + h * pad4(3w); pixel_sum = w*h*(r+g+b)."""
    return f"""
    SELECT d.doc_id,
      '{ATT_FILENAME}' AS filename,
      'image/bmp' AS mime_type,
      CAST(54 + (4 + d.doc_id % 4) *
           ((3 * (8 + d.doc_id % 8) + 3) // 4 * 4) AS BIGINT) AS n_bytes,
      CAST(8 + d.doc_id % 8 AS INT) AS width,
      CAST(4 + d.doc_id % 4 AS INT) AS height,
      CAST((8 + d.doc_id % 8) * (4 + d.doc_id % 4) *
           ((2*d.doc_id+1) % 256 + (4*d.doc_id+3) % 256 + (6*d.doc_id+5) % 256)
           AS BIGINT) AS pixel_sum,
      true AS ok
    FROM {table} d ORDER BY d.doc_id
    """
