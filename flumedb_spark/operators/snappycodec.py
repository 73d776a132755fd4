"""Pure-Python Snappy block-format codec (no python-snappy in this
environment).

Implements the public Snappy format description
(google/snappy ``format_description.txt``): a little-endian varint
preamble with the uncompressed length, then a stream of elements —
literals (tag&3==0, 6-bit or 1-4-extra-byte lengths) and LZ77 copies
with 1/2/4-byte offsets (tag&3==1/2/3), overlapping copies included.

``compress`` emits spec-legal all-literal streams (every decoder must
accept them; compression ratio is 1.0 — the goal is interop, not
ratio). ``decompress`` is a full decoder for streams any real snappy
encoder produces. The Avro OCF "snappy" codec wraps a block with a
4-byte big-endian CRC32 of the UNCOMPRESSED bytes (Avro spec, object
container files section) — helpers for that framing live here too.
"""

from __future__ import annotations

import zlib

#: decompression ceiling — same rationale as archives.MAX_DECOMPRESSED:
#: one crafted preamble must not OOM an executor.
MAX_OUT = 1 << 30


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Unsigned LEB128 varint (the preamble) -> (value, next_pos)."""
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint overflow")


def decompress(buf: bytes, max_out: int = MAX_OUT) -> bytes:
    n, pos = _uvarint(buf, 0)
    if n > max_out:
        raise ValueError("snappy: declared size exceeds decompression cap")
    out = bytearray()
    ln = len(buf)
    while pos < ln:
        tag = buf[pos]
        pos += 1
        typ = tag & 3
        if typ == 0:  # literal
            l6 = tag >> 2
            if l6 < 60:
                length = l6 + 1
            else:
                nb = l6 - 59  # 60..63 -> 1..4 extra length bytes
                if pos + nb > ln:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(buf[pos : pos + nb], "little") + 1
                pos += nb
            if pos + length > ln:
                raise ValueError("snappy: truncated literal body")
            out += buf[pos : pos + length]
            pos += length
        else:  # copy
            if typ == 1:
                length = ((tag >> 2) & 7) + 4
                if pos >= ln:
                    raise ValueError("snappy: truncated copy-1 offset")
                offset = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif typ == 2:
                length = (tag >> 2) + 1
                if pos + 2 > ln:
                    raise ValueError("snappy: truncated copy-2 offset")
                offset = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                length = (tag >> 2) + 1
                if pos + 4 > ln:
                    raise ValueError("snappy: truncated copy-4 offset")
                offset = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy: copy offset out of range")
            if len(out) + length > n:
                raise ValueError("snappy: output overruns declared size")
            start = len(out) - offset
            if offset >= length:
                out += out[start : start + length]
            else:  # overlapping copy: the offset-sized tail repeats
                seg = out[start:]
                out += (seg * (length // offset + 1))[:length]
    if len(out) != n:
        raise ValueError("snappy: output size mismatch")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Spec-legal all-literal snappy stream (interop encoder twin)."""
    out = bytearray()
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        pos += len(chunk)
        lm1 = len(chunk) - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        else:
            nb = max(1, (lm1.bit_length() + 7) // 8)
            out.append((59 + nb) << 2)
            out += lm1.to_bytes(nb, "little")
        out += chunk
    return bytes(out)


def avro_block_compress(raw: bytes) -> bytes:
    """Avro OCF snappy codec framing: compressed bytes + CRC32(raw) BE."""
    return compress(raw) + zlib.crc32(raw).to_bytes(4, "big")


def avro_block_decompress(block: bytes, max_out: int = MAX_OUT) -> bytes:
    if len(block) < 4:
        raise ValueError("snappy: avro block shorter than its CRC")
    raw = decompress(block[:-4], max_out)
    if zlib.crc32(raw).to_bytes(4, "big") != block[-4:]:
        raise ValueError("snappy: avro block CRC mismatch")
    return raw
