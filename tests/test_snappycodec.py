"""Pure-Python Snappy block codec (operators/snappycodec.py): format
conformance against hand-built streams from the public format
description, round-trips, Avro OCF framing, and the fuzz contract."""

import random
import zlib

import pytest

from flumedb_spark.operators import archives as ar
from flumedb_spark.operators import snappycodec as sn


def test_roundtrip_all_literal_sizes():
    for n in (0, 1, 59, 60, 61, 255, 256, 65535, 65536, 200_000):
        data = bytes((i * 31 + 7) % 256 for i in range(n))
        assert sn.decompress(sn.compress(data)) == data


def _uv(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def test_copy_elements_all_offset_widths():
    # literal "abcd", then copy-1 (len 4, off 4) -> "abcdabcd",
    # copy-2 (len 5, off 3), copy-4 (len 4, off 8)
    lit = bytes([3 << 2]) + b"abcd"
    c1 = bytes([((4 - 4) << 2) | (0 << 5) | 1, 4])
    c2 = bytes([((5 - 1) << 2) | 2]) + (3).to_bytes(2, "little")
    c4 = bytes([((4 - 1) << 2) | 3]) + (8).to_bytes(4, "little")
    # after lit+c1: "abcdabcd"; c2 copies 5 from off 3: "dab" repeating -> "dabda"
    # -> "abcdabcddabda"; c4 copies 4 from off 8: "cdda"... compute directly:
    out = bytearray(b"abcdabcd")
    start = len(out) - 3
    out += (out[start:] * 3)[:5]
    out += out[len(out) - 8 : len(out) - 8 + 4]
    expect = bytes(out)
    stream = _uv(len(expect)) + lit + c1 + c2 + c4
    assert sn.decompress(stream) == expect


def test_overlapping_copy_rle():
    # classic snappy RLE: 1-byte literal + overlapping copy offset 1
    stream = _uv(11) + bytes([0 << 2]) + b"x" + bytes(
        [((10 - 4) << 2) | 1, 1]
    )
    assert sn.decompress(stream) == b"x" * 11


def test_corrupt_streams_raise_valueerror():
    good = sn.compress(b"hello world" * 10)
    for bad in (
        b"",                          # no preamble
        b"\xff\xff\xff\xff\xff\xff",  # varint overflow
        _uv(1 << 62),                 # exceeds cap
        _uv(5) + bytes([3 << 2]) + b"ab",       # truncated literal
        _uv(5) + bytes([0 << 2 | 1]),           # truncated copy-1
        _uv(4) + bytes([(3 << 2) | 1, 9]),      # offset beyond output
        _uv(3) + bytes([2 << 2]) + b"abc" + bytes([0]) + b"q",  # overrun
        good[:-3],                    # size mismatch
    ):
        with pytest.raises(ValueError):
            sn.decompress(bad)


def test_fuzz_never_hangs_or_escapes():
    rng = random.Random(31)
    good = sn.compress(bytes(rng.randrange(256) for _ in range(500)))
    for cut in range(0, len(good), 7):
        try:
            sn.decompress(good[:cut])
        except ValueError:
            pass
    for _ in range(400):
        b = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            sn.decompress(bytes(b))
        except ValueError:
            pass
    for _ in range(200):  # pure-random streams
        try:
            sn.decompress(bytes(rng.randrange(256) for _ in range(rng.randint(0, 60))))
        except ValueError:
            pass


def test_avro_framing_crc():
    raw = b"record bytes" * 9
    block = sn.avro_block_compress(raw)
    assert sn.avro_block_decompress(block) == raw
    bad = block[:-1] + bytes([block[-1] ^ 1])
    with pytest.raises(ValueError):
        sn.avro_block_decompress(bad)


def test_avro_records_snappy_codec_roundtrip():
    rows = [{"c0": i, "c1": f"s{i}"} for i in range(9)]
    p = ar.encode_avro_records(
        rows, [("c0", "long"), ("c1", "string")], codec="snappy", block_records=4
    )
    assert ar.avro_records(p) == rows
    assert ar.avro_meta(p)["codec"] == "snappy"
    # synth now cycles deflate/snappy/null by doc_id%3 — all decode
    for d in (0, 1, 2, 7, 11):
        recs = ar.avro_records(ar.synth_avro_records(d))
        assert len(recs) == 1 + d % 6
        assert recs[0]["c0"] == d * 100


def test_crc_is_of_uncompressed_bytes():
    # pin the framing detail against the Avro spec: CRC32 of RAW bytes
    raw = b"\x01\x02\x03"
    block = sn.avro_block_compress(raw)
    assert block[-4:] == zlib.crc32(raw).to_bytes(4, "big")
