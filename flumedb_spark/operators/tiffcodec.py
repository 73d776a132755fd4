"""TIFF codec — the scanned-document/scientific-image leg of the
multimodal stack (TIFF 6.0, a public Adobe/ISO spec). Scans, faxes,
and GIS corpora arrive as TIFF; triage + decode must handle the two
spec-legal byte orders, the IFD tag walk (with the inline-vs-offset
value rule), multi-strip images, and the PackBits RLE compression.
Both directions are stdlib+numpy only:

- :func:`encode_tiff` — a REAL writer: ``II``/``MM`` header, strip
  data (optionally PackBits-compressed), then a spec-complete IFD
  (width, length, bits-per-sample array, compression, photometric,
  strip offsets/counts, samples-per-pixel, rows-per-strip).
- :func:`decode_tiff` — a REAL reader: byte-order + magic-42 check,
  IFD entry walk honoring the left-justified inline-value rule
  (values <= 4 bytes live inside the entry, in the file's byte order),
  strip assembly, PackBits expansion.
- :func:`packbits_encode` / :func:`packbits_decode` — the Apple RLE
  from the spec's §9 (literal runs, repeat runs, the 0x80 noop).

Operator shape (:func:`tiff_decode_stats`): one Arrow-batched
``mapInPandas`` pass, linear, no shuffle; corrupt blob -> ONE
``ok=False`` row.

The ``ns_tiff_decode`` catalog row synthesizes constant-color images
with doc_id-determined dims/colors, alternating endianness by doc
parity and PackBits every third doc, so the DuckDB oracle replays
width/height/strip-count/pixel-sum arithmetically — an IFD-offset,
endianness, inline-value, or RLE bug breaks the hash.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "packbits_encode",
    "packbits_decode",
    "encode_tiff",
    "decode_tiff",
    "synth_tiff_params",
    "with_synthetic_tiff_payload",
    "tiff_decode_stats",
    "tiff_decode_oracle_sql",
]

MAX_TIFF = 256 * 1024 * 1024
ROWS_PER_STRIP = 4

# IFD tags (TIFF 6.0 §8)
_T_WIDTH, _T_LENGTH, _T_BITS, _T_COMPRESSION = 256, 257, 258, 259
_T_PHOTOMETRIC, _T_STRIP_OFFSETS, _T_SAMPLES = 262, 273, 277
_T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 278, 279

_TYPE_SHORT, _TYPE_LONG = 3, 4
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

COMPRESSION_NONE, COMPRESSION_PACKBITS = 1, 32773


def packbits_encode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): repeat runs of >= 2 become
    (257-n, byte); literals are chunked at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length of identical bytes
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: scan until a run of >= 3 starts (2-byte runs inside a
        # literal are cheaper left literal) or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Expand PackBits to exactly ``expected`` bytes; raises on
    truncation or overrun."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h == 128:  # noop
            continue
        if h < 128:  # literal of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("packbits: truncated literal run")
            out.extend(data[i : i + h + 1])
            i += h + 1
        else:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("packbits: truncated repeat run")
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"packbits: expanded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def encode_tiff(
    arr: np.ndarray,
    big_endian: bool = False,
    compression: int = COMPRESSION_NONE,
    rows_per_strip: int = ROWS_PER_STRIP,
) -> bytes:
    """Real TIFF 6.0 writer: RGB8, strip-organized (see module doc)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_tiff: expects HxWx3 uint8")
    h, w, _ = arr.shape
    e = ">" if big_endian else "<"
    raw = arr.tobytes()
    row_bytes = w * 3
    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        chunk = raw[y0 * row_bytes : min(y0 + rows_per_strip, h) * row_bytes]
        if compression == COMPRESSION_PACKBITS:
            chunk = packbits_encode(chunk)
        strips.append(chunk)
    n_strips = len(strips)

    # layout: header(8) | strip data | bits array(6) | strip offsets |
    #         strip counts | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bits_off = pos
    pos += 6
    # offset arrays only needed when count > 1 (else inline)
    so_off = pos
    if n_strips > 1:
        pos += 4 * n_strips
    sc_off = pos
    if n_strips > 1:
        pos += 4 * n_strips
    ifd_off = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # inline values are LEFT-JUSTIFIED in the 4-byte field
        if typ == _TYPE_SHORT and count == 1:
            return struct.pack(f"{e}HHI", tag, typ, count) + struct.pack(
                f"{e}H", value
            ) + b"\x00\x00"
        return struct.pack(f"{e}HHII", tag, typ, count, value)

    entries = [
        entry(_T_WIDTH, _TYPE_LONG, 1, w),
        entry(_T_LENGTH, _TYPE_LONG, 1, h),
        entry(_T_BITS, _TYPE_SHORT, 3, bits_off),
        entry(_T_COMPRESSION, _TYPE_SHORT, 1, compression),
        entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 2),  # RGB
        entry(
            _T_STRIP_OFFSETS, _TYPE_LONG, n_strips,
            strip_offsets[0] if n_strips == 1 else so_off,
        ),
        entry(_T_SAMPLES, _TYPE_SHORT, 1, 3),
        entry(_T_ROWS_PER_STRIP, _TYPE_LONG, 1, rows_per_strip),
        entry(
            _T_STRIP_COUNTS, _TYPE_LONG, n_strips,
            len(strips[0]) if n_strips == 1 else sc_off,
        ),
    ]

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, ifd_off)
    for s in strips:
        out += s
    out += struct.pack(f"{e}3H", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"{e}{n_strips}I", *strip_offsets)
        out += struct.pack(f"{e}{n_strips}I", *(len(s) for s in strips))
    out += struct.pack(f"{e}H", len(entries))
    for en in entries:
        out += en
    out += struct.pack(f"{e}I", 0)  # next-IFD terminator
    return bytes(out)


def _read_values(buf: bytes, e: str, typ: int, count: int, field: bytes) -> list[int]:
    """IFD entry values: inline when total size <= 4 (left-justified),
    else at the offset in the value field."""
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError(f"tiff: unsupported IFD type {typ}")
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise ValueError(f"tiff: unsupported value type {typ}")
    total = size * count
    if total <= 4:
        data = field[:total]
    else:
        (off,) = struct.unpack(f"{e}I", field)
        if off + total > len(buf):
            raise ValueError("tiff: value offset past EOF")
        data = buf[off : off + total]
    return list(struct.unpack(f"{e}{count}{fmt}", data))


def decode_tiff(payload: bytes) -> tuple[np.ndarray, dict]:
    """REAL reader -> (HxWx3 uint8, meta dict with endianness,
    compression, n_strips). Raises ValueError on malformed input."""
    buf = bytes(payload)
    if len(buf) > MAX_TIFF:
        raise ValueError(f"tiff: {len(buf)} bytes exceeds cap")
    if len(buf) < 8:
        raise ValueError("tiff: truncated header")
    order = buf[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"tiff: bad byte-order mark {order!r}")
    magic, ifd_off = struct.unpack(f"{e}HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    if ifd_off + 2 > len(buf):
        raise ValueError("tiff: IFD offset past EOF")
    (n_entries,) = struct.unpack(f"{e}H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(buf):
            raise ValueError("tiff: truncated IFD")
        tag, typ, count = struct.unpack(f"{e}HHI", buf[off : off + 8])
        tags[tag] = _read_values(buf, e, typ, count, buf[off + 8 : off + 12])
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_LENGTH][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
        rps = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    except KeyError as k:
        raise ValueError(f"tiff: missing required tag {k}") from None
    compression = tags.get(_T_COMPRESSION, [COMPRESSION_NONE])[0]
    samples = tags.get(_T_SAMPLES, [1])[0]
    bits = tags.get(_T_BITS, [8])
    if samples != 3 or any(b != 8 for b in bits):
        raise ValueError(f"tiff: unsupported samples={samples} bits={bits}")
    if compression not in (COMPRESSION_NONE, COMPRESSION_PACKBITS):
        raise ValueError(f"tiff: unsupported compression {compression}")
    if len(offsets) != len(counts):
        raise ValueError("tiff: strip offsets/counts length mismatch")
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError(f"tiff: implausible dims {w}x{h}")
    row_bytes = w * 3
    raw = bytearray()
    for i, (so, sc) in enumerate(zip(offsets, counts)):
        if so + sc > len(buf):
            raise ValueError("tiff: strip past EOF")
        chunk = buf[so : so + sc]
        n_rows = min(rps, h - i * rps)
        if n_rows <= 0:
            raise ValueError("tiff: more strips than rows")
        if compression == COMPRESSION_PACKBITS:
            chunk = packbits_decode(chunk, n_rows * row_bytes)
        elif len(chunk) != n_rows * row_bytes:
            raise ValueError("tiff: strip size mismatch")
        raw += chunk
    if len(raw) != h * row_bytes:
        raise ValueError("tiff: assembled size mismatch")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, 3)
    meta = {
        "endianness": "big" if e == ">" else "little",
        "compression": int(compression),
        "n_strips": len(offsets),
    }
    return arr, meta


# ---------------------------------------------------------------------
# synthesis + operator (oracle-replayable)
# ---------------------------------------------------------------------


def synth_tiff_params(doc_id: int) -> tuple[int, int, tuple[int, int, int], bool, int]:
    """(width, height, rgb, big_endian, compression) for doc d —
    the closed-form the oracle replays."""
    d = int(doc_id)
    w = 16 + d % 32
    h = 8 + d % 16
    rgb = ((3 * d) % 256, (5 * d) % 256, (7 * d) % 256)
    big = d % 2 == 1
    comp = COMPRESSION_PACKBITS if d % 3 == 0 else COMPRESSION_NONE
    return w, h, rgb, big, comp


def with_synthetic_tiff_payload(docs: DataFrame) -> DataFrame:
    """doc_id -> real .tif bytes (constant color, parity endianness,
    every-third-doc PackBits)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            payloads = []
            for d in pdf_b["doc_id"]:
                w, h, rgb, big, comp = synth_tiff_params(int(d))
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[:, :] = rgb
                payloads.append(
                    encode_tiff(arr, big_endian=big, compression=comp)
                )
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


def tiff_decode_stats(payloads: DataFrame) -> DataFrame:
    """REAL decode -> (doc_id, width, height, endianness, compression,
    n_strips, pixel_sum, ok); malformed blob -> ONE ok=False row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "endianness": [],
                "compression": [], "n_strips": [], "pixel_sum": [], "ok": [],
            }
            for doc_id, p in zip(pdf_b["doc_id"], pdf_b["payload"]):
                try:
                    arr, meta = decode_tiff(bytes(p))
                except ValueError:
                    for k, v in (
                        ("doc_id", doc_id), ("width", 0), ("height", 0),
                        ("endianness", ""), ("compression", 0),
                        ("n_strips", 0), ("pixel_sum", 0), ("ok", False),
                    ):
                        out[k].append(v)
                    continue
                out["doc_id"].append(doc_id)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["endianness"].append(meta["endianness"])
                out["compression"].append(meta["compression"])
                out["n_strips"].append(meta["n_strips"])
                out["pixel_sum"].append(int(arr.sum(dtype=np.int64)))
                out["ok"].append(True)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, width int, height int, endianness string, "
        "compression int, n_strips int, pixel_sum long, ok boolean",
    )


def tiff_decode_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of synth_tiff_params: w=16+d%32, h=8+d%16,
    pixel_sum = w*h*(3d%256 + 5d%256 + 7d%256), strips = ceil(h/4)."""
    return f"""
    SELECT d.doc_id,
      CAST(16 + d.doc_id % 32 AS INT) AS width,
      CAST(8 + d.doc_id % 16 AS INT) AS height,
      CASE WHEN d.doc_id % 2 = 1 THEN 'big' ELSE 'little' END AS endianness,
      CAST(CASE WHEN d.doc_id % 3 = 0 THEN {COMPRESSION_PACKBITS}
                ELSE {COMPRESSION_NONE} END AS INT) AS compression,
      CAST(((8 + d.doc_id % 16) + {ROWS_PER_STRIP} - 1)
           // {ROWS_PER_STRIP} AS INT) AS n_strips,
      CAST((16 + d.doc_id % 32) * (8 + d.doc_id % 16) *
           ((3 * d.doc_id) % 256 + (5 * d.doc_id) % 256 + (7 * d.doc_id) % 256)
           AS BIGINT) AS pixel_sum,
      true AS ok
    FROM {table} d ORDER BY d.doc_id
    """
