"""Pure-stdlib multimodal codec tests (operators/mmcodec.py).

Strategy: (1) encode->decode round-trips for every format and every PNG
filter type; (2) GOLDEN byte fixtures hand-assembled from the public
format specs — independent of the module's own encoder, so a matched
encoder+decoder bug cannot cancel out; (3) a scalar reference PNG
unfilter implementation cross-checked against the vectorized decoder on
random data; (4) the Spark-side operators decoding real bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flumedb_spark.operators import mmcodec as mc
from flumedb_spark.operators import multimodal


# ---------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------


def test_bmp_ppm_roundtrip():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (13, 16)]:  # odd widths exercise BMP row padding
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
        assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)


def test_png_roundtrip_all_filters_and_colortypes():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (7, 6), dtype=np.uint8)
    rgba = rng.randint(0, 256, (5, 4, 4), dtype=np.uint8)
    for ft in range(5):
        assert np.array_equal(mc.decode_png(mc.encode_png(rgb, ft)), rgb), ft
        assert np.array_equal(mc.decode_png(mc.encode_png(gray, ft))[:, :, 0], gray), ft
        assert np.array_equal(mc.decode_png(mc.encode_png(rgba, ft)), rgba), ft


def test_wav_roundtrip():
    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32768, 777).astype(np.int16)
    dec, rate = mc.decode_wav(mc.encode_wav(s, 44100))
    assert rate == 44100
    assert np.array_equal(dec, s)


# ---------------------------------------------------------------------
# golden fixtures — hand-assembled from the specs, NOT via the encoder
# ---------------------------------------------------------------------


def test_bmp_golden_bytes():
    # 2x1 24-bit BI_RGB, pixels (RGB): (1,2,3), (4,5,6).
    # One bottom-up row, BGR order, padded to 8 bytes (4-byte alignment).
    pixel_row = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    header = struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8, 2835, 2835, 0, 0)
    img = mc.decode_bmp(header + info + pixel_row)
    assert np.array_equal(img, np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8))


def test_bmp_topdown_golden_bytes():
    # 1x2 top-down (negative height): first stored row is the TOP row.
    rows = bytes([3, 2, 1, 0]) + bytes([6, 5, 4, 0])  # stride 4 for w=1
    header = struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, 8, 2835, 2835, 0, 0)
    img = mc.decode_bmp(header + info + rows)
    assert np.array_equal(img, np.array([[[1, 2, 3]], [[4, 5, 6]]], dtype=np.uint8))


def test_ppm_golden_bytes_with_comment():
    payload = b"P6\n# a comment\n2 1\n255\n" + bytes([9, 8, 7, 6, 5, 4])
    img = mc.decode_ppm(payload)
    assert np.array_equal(img, np.array([[[9, 8, 7], [6, 5, 4]]], dtype=np.uint8))


def test_pgm_golden_bytes():
    img = mc.decode_ppm(b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255]))
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[:, :, 0], np.array([[0, 64], [128, 255]], np.uint8))
    assert np.array_equal(img[:, :, 0], img[:, :, 2])  # gray expanded


def _png_chunks(w, h, color, raw):
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_golden_up_filter():
    # 2x2 grayscale, rows filtered with Up (type 2):
    # row0 raw = [10, 20] (prev row = 0), row1 raw = [5, 7]
    # recon row0 = [10, 20]; recon row1 = [15, 27]
    raw = bytes([2, 10, 20]) + bytes([2, 5, 7])
    img = mc.decode_png(_png_chunks(2, 2, 0, raw))
    assert np.array_equal(img[:, :, 0], np.array([[10, 20], [15, 27]], np.uint8))


def test_png_golden_sub_and_paeth():
    # 1x3 RGB row with Sub (type 1): raw deltas add left-neighbor per channel
    raw = bytes([1, 10, 20, 30, 5, 5, 5, 250, 0, 0])
    img = mc.decode_png(_png_chunks(3, 1, 2, raw))
    # recon: (10,20,30), (15,25,35), then (15+250)%256=9 -> (9,25,35)
    assert np.array_equal(
        img, np.array([[[10, 20, 30], [15, 25, 35], [9, 25, 35]]], np.uint8)
    )
    # Paeth (type 4) on the first row degenerates to Sub (b = c = 0 -> pred = a)
    raw4 = bytes([4, 10, 20, 30, 5, 5, 5, 1, 1, 1])
    img4 = mc.decode_png(_png_chunks(3, 1, 2, raw4))
    assert np.array_equal(
        img4, np.array([[[10, 20, 30], [15, 25, 35], [16, 26, 36]]], np.uint8)
    )


def _reference_unfilter(raw, w, h, ch):
    """Scalar textbook unfilter (RFC 2083 §6), independent of the
    vectorized decoder's cumsum/broadcast tricks."""
    stride = w * ch
    out = []
    prev = [0] * stride
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        line = list(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[x] = (line[x] + pred) & 0xFF
        out.append(cur)
        prev = cur
    return np.array(out, dtype=np.uint8).reshape(h, w, ch)


def test_png_decoder_matches_scalar_reference():
    rng = np.random.RandomState(17)
    w, h, ch = 6, 5, 3
    for _ in range(8):
        # random filter type per row, random filtered bytes: decode both ways
        raw = b"".join(
            bytes([rng.randint(0, 5)]) + rng.randint(0, 256, w * ch).astype(np.uint8).tobytes()
            for _ in range(h)
        )
        expect = _reference_unfilter(raw, w, h, ch)
        got = mc.decode_png(_png_chunks(w, h, 2, raw))
        assert np.array_equal(got, expect)


def test_wav_golden_bytes():
    # hand-assembled RIFF: mono, 16-bit, 8000 Hz, samples [100, -2]
    data = struct.pack("<hh", 100, -2)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = mc.decode_wav(payload)
    assert rate == 8000 and samples.tolist() == [100, -2]


# ---------------------------------------------------------------------
# corrupt / unsupported payloads
# ---------------------------------------------------------------------


def test_corrupt_payloads_raise_valueerror():
    good_bmp = mc.encode_bmp(np.zeros((4, 4, 3), np.uint8))
    good_png = mc.encode_png(np.zeros((4, 4, 3), np.uint8))
    for bad in (
        b"",
        b"garbage bytes",
        b"BM\x00\x01",  # truncated BMP
        good_bmp[:40],  # cut mid-header
        good_bmp[:60],  # cut mid-pixel-data
        b"P6\n4 4\n255\n\x00\x01",  # truncated PPM body
        b"\x89PNG\r\n\x1a\n",  # signature only, no chunks
        good_png[: len(good_png) // 2],  # truncated IDAT stream
        # complete chunk structure, garbage DEFLATE body -> ValueError
        # (zlib.error must not leak out of the kernel)
        _png_chunks(2, 2, 0, b"")[:33] + b"\x00\x00\x00\x03IDAT\xff\xfe\xfd"
        + struct.pack(">I", zlib.crc32(b"IDAT\xff\xfe\xfd") & 0xFFFFFFFF)
        + _png_chunks(2, 2, 0, b"")[-12:],
    ):
        with pytest.raises(ValueError):
            mc.decode_image_pure(bad)
    with pytest.raises(ValueError):
        mc.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_resize_nn_floor_mapping():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (10, 14, 3), dtype=np.uint8)
    out = mc.resize_nn(img, 4, 3)
    assert out.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert np.array_equal(out[y, x], img[(y * 10) // 3, (x * 14) // 4])
    # upscale works too
    up = mc.resize_nn(img, 28, 20)
    assert up.shape == (20, 28, 3)
    assert np.array_equal(up[::2, ::2], img)


def test_decode_image_meta_dict():
    img = mc.synth_image(7)
    meta = multimodal.decode_image(mc.encode_bmp(img))
    assert meta["ok"] and meta["format"] == "bmp"
    assert (meta["width"], meta["height"]) == (img.shape[1], img.shape[0])
    meta = multimodal.decode_image(mc.encode_png(img))
    assert meta["ok"] and meta["format"] == "png"
    meta = multimodal.decode_image(b"\x89PNG")  # truncated magic only
    assert not meta["ok"] and meta["format"] == "undecodable"


# ---------------------------------------------------------------------
# Spark-side: real decode through mapInPandas
# ---------------------------------------------------------------------


def test_spark_real_decode_mixed_formats(spark):
    """extract_metadata's real path over a mix of BMP/PNG/PPM payloads
    plus one corrupt blob — per-format dims right, corrupt -> ok=False,
    no task failure."""
    import pandas as pd

    rows = []
    for doc_id, fmt in [(0, "bmp"), (1, "png"), (2, "ppm"), (3, "bad")]:
        img = mc.synth_image(doc_id)
        payload = {
            "bmp": mc.encode_bmp,
            "png": mc.encode_png,
            "ppm": mc.encode_ppm,
            "bad": lambda a: b"\xde\xad\xbe\xef",
        }[fmt](img)
        rows.append((doc_id, bytearray(payload)))
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in multimodal.extract_metadata(payloads).collect()}
    for doc_id, fmt in [(0, "bmp"), (1, "png"), (2, "ppm")]:
        w, h = mc.synth_image_dims(doc_id)
        r = out[doc_id]
        assert r.ok and r.format == fmt and (r.width, r.height) == (w, h)
    assert not out[3].ok and out[3].format == "undecodable"


def test_spark_real_resize_kernel(spark):
    """resize_images(use_fake=False): decode -> NN resample -> PPM
    re-encode, verified pixel-exact against the local kernel."""
    ids = [4, 5, 6]
    rows = [(d, bytearray(mc.encode_bmp(mc.synth_image(d)))) for d in ids]
    rows.append((99, bytearray(b"not an image")))
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in multimodal.resize_images(
            payloads, width=5, height=4, use_fake=False
        ).collect()
    }
    for d in ids:
        r = out[d]
        assert r.ok
        got = mc.decode_ppm(bytes(r.payload))
        assert np.array_equal(got, mc.resize_nn(mc.synth_image(d), 5, 4))
    assert not out[99].ok and bytes(out[99].payload) == b""


def test_spark_audio_meta(spark):
    rows = [(d, bytearray(mc.encode_wav(*mc.synth_audio(d)))) for d in (0, 3, 11)]
    rows.append((99, bytearray(b"RIFFxxxxWAVEbroken")))
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in multimodal.extract_audio_meta(payloads).collect()}
    for d in (0, 3, 11):
        samples, rate = mc.synth_audio(d)
        r = out[d]
        assert r.ok and r.sample_rate == rate and r.n_samples == len(samples)
        assert r.sum_samples == int(samples.astype("int64").sum())
    assert not out[99].ok


def test_short_ihdr_raises_valueerror_not_struct_error():
    """Regression: a PNG whose IHDR body is shorter than 13 bytes used
    to leak struct.error past the ValueError-only catches — which would
    fail a whole partition instead of yielding ok=False."""
    short_ihdr = struct.pack(">I", 4) + b"IHDR" + b"\x00\x00\x00\x02"
    short_ihdr += struct.pack(">I", zlib.crc32(b"IHDR\x00\x00\x00\x02") & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + short_ihdr)
    meta = multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + short_ihdr)
    assert not meta["ok"] and meta["format"] == "undecodable"


# ---------------------------------------------------------------------
# GIF — multi-frame LZW (the real frame-sampling kernel)
# ---------------------------------------------------------------------


def _palette_frames(rng, n_frames, h, w, n_colors=4):
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [10, 20, 200]], np.uint8
    )[:n_colors]
    return [
        np.take(palette, rng.randint(0, n_colors, (h, w)), axis=0)
        for _ in range(n_frames)
    ]


def test_gif_roundtrip_multiframe():
    rng = np.random.RandomState(9)
    frames = _palette_frames(rng, 5, 11, 14)
    dec = mc.decode_gif(mc.encode_gif(frames))
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    # single frame, near-max palette
    g = np.repeat(np.arange(250, dtype=np.uint8).reshape(10, 25)[:, :, None], 3, axis=2)
    assert np.array_equal(mc.decode_gif(mc.encode_gif([g]))[0], g)


def test_gif_lzw_roundtrip_and_kwkwk():
    # the KwKwK case (code == next_code) must decode: 'abababab...'
    idx = [0, 1] * 40 + [0] * 30  # repetition drives table growth + KwKwK
    assert mc._lzw_decode(2, mc._lzw_encode(2, idx)) == idx
    rng = np.random.RandomState(4)
    for _ in range(5):
        seq = rng.randint(0, 4, rng.randint(1, 400)).tolist()
        assert mc._lzw_decode(2, mc._lzw_encode(2, seq)) == seq


def test_gif_golden_hand_built_frame():
    """Hand-assembled 2x1 GIF (spec-derived, independent of the
    encoder): global color table [red, blue], LZW-encoded pixel indices
    [0, 1] with min code size 2."""
    # header + LSD: 2x1, GCT flag set, 2 entries (size field 0)
    gif = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    gif += bytes([255, 0, 0, 0, 0, 255])  # GCT: red, blue
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)  # image descriptor
    # LZW min code 2: codes CLEAR=4(100b) 0(000b) 1(001b) EOI=5(101b),
    # 3-bit codes LSB-packed: 100 000 001 101 -> bytes 0b01000100=0x44,
    # 0b00000101=0x05... compute programmatically to avoid hand error:
    data = mc._lzw_encode(2, [0, 1])
    gif += bytes([2, len(data)]) + data + b"\x00\x3b"
    frames = mc.decode_gif(gif)
    assert len(frames) == 1
    assert np.array_equal(
        frames[0], np.array([[[255, 0, 0], [0, 0, 255]]], np.uint8)
    )


def test_gif_transparency_and_disposal():
    """Frame 2 has a transparent index: the composited frame must show
    frame 1's pixels through the holes (draw-over disposal)."""
    # frame 1: all red (index 0); frame 2: index 1 = green over the left
    # pixel, index 0 declared TRANSPARENT via a GCE
    gif = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    gif += bytes([255, 0, 0, 0, 255, 0])  # GCT: red, green
    # frame 1: pixels [0, 0]
    d1 = mc._lzw_encode(2, [0, 0])
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0) + bytes([2, len(d1)]) + d1 + b"\x00"
    # GCE: transparent flag set, transparent index 0
    gif += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    # frame 2: pixels [1, 0] — the 0 is transparent -> red shows through
    d2 = mc._lzw_encode(2, [1, 0])
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0) + bytes([2, len(d2)]) + d2 + b"\x00"
    gif += b"\x3b"
    frames = mc.decode_gif(gif)
    assert len(frames) == 2
    assert np.array_equal(frames[0], np.array([[[255, 0, 0], [255, 0, 0]]], np.uint8))
    assert np.array_equal(frames[1], np.array([[[0, 255, 0], [255, 0, 0]]], np.uint8))


def test_gif_corrupt_raises_valueerror():
    good = mc.encode_gif(_palette_frames(np.random.RandomState(1), 2, 4, 4))
    for bad in (b"GIF89a", good[:20], good[:-5], b"GIF89a" + b"\xff" * 30):
        with pytest.raises(ValueError):
            mc.decode_gif(bad)
    assert mc.sniff_format(good) == "gif"


def test_spark_real_frame_sampling_from_gif(spark):
    """sample_frames(use_fake=False): REAL animated-GIF decode on
    executors — every 2nd composited frame re-encoded as PPM, corrupt
    payloads drop their rows without failing the task."""
    rng = np.random.RandomState(21)
    frame_sets = {d: _palette_frames(rng, 6, 7, 9) for d in (1, 2)}
    rows = [(d, bytearray(mc.encode_gif(fs))) for d, fs in frame_sets.items()]
    rows.append((99, bytearray(b"not a gif")))
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = multimodal.sample_frames(
        payloads, use_fake=False, every_n_frames=2, max_frames=8
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 99 not in by_doc  # corrupt blob dropped, task survived
    for d, fs in frame_sets.items():
        rows_d = sorted(by_doc[d], key=lambda r: r.frame_idx)
        assert len(rows_d) == 3  # 6 frames sampled every 2nd
        assert all(r.n_frames == 3 for r in rows_d)
        for j, r in enumerate(rows_d):
            got = mc.decode_ppm(bytes(r.frame_payload))
            assert np.array_equal(got, fs[j * 2])


def test_gif_disposal_restore_previous():
    """Disposal 3 (restore-to-previous): the frame following a
    disposal-3 frame composites onto the PRE-frame canvas, not onto the
    disposal-3 frame's pixels (GIF89a spec section 23)."""
    gif = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    gif += bytes([255, 0, 0, 0, 255, 0])  # GCT: red, green
    # frame 1: all red, no GCE (disposal 0)
    d1 = mc._lzw_encode(2, [0, 0])
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0) + bytes([2, len(d1)]) + d1 + b"\x00"
    # GCE: disposal 3 (bits 2-4 = 011), no transparency
    gif += bytes([0x21, 0xF9, 4, 0x03 << 2, 0, 0, 0, 0])
    # frame 2: all green, 1x1 sub-rect at left=1 — draws over the right pixel
    d2 = mc._lzw_encode(2, [1])
    gif += struct.pack("<BHHHHB", 0x2C, 1, 0, 1, 1, 0) + bytes([2, len(d2)]) + d2 + b"\x00"
    # GCE: transparent index 1, draw-over — green pixels of frame 3 are
    # holes; what shows through must be frame 1's RED (restored canvas),
    # not frame 2's green
    gif += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])
    d3 = mc._lzw_encode(2, [1, 1])
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0) + bytes([2, len(d3)]) + d3 + b"\x00"
    gif += b"\x3b"
    frames = mc.decode_gif(gif)
    assert len(frames) == 3
    red, green = [255, 0, 0], [0, 255, 0]
    assert np.array_equal(frames[0], np.array([[red, red]], np.uint8))
    assert np.array_equal(frames[1], np.array([[red, green]], np.uint8))
    # disposal 3 restored the right pixel to red before frame 3 drew
    assert np.array_equal(frames[2], np.array([[red, red]], np.uint8))


def test_video_container_probe_and_boundary(spark):
    """True video containers (mp4/webm/avi) are identified by magic and
    routed through ffmpeg WHERE PRESENT; where absent the boundary is a
    clearly-marked NotImplementedError — never silent fake frames."""
    # magic sniffing (public specs: ISO BMFF ftyp / EBML / RIFF-AVI)
    mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    webm = b"\x1aE\xdf\xa3" + b"\x00" * 64
    avi = b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 64
    assert multimodal.sniff_video_container(mp4) == "mp4"
    assert multimodal.sniff_video_container(webm) == "webm"
    assert multimodal.sniff_video_container(avi) == "avi"
    assert multimodal.sniff_video_container(b"GIF89a" + b"\x00" * 32) is None
    # driver-side: no ffmpeg binary -> explicit capability error
    if multimodal.ffmpeg_path() is None:
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            multimodal.ffmpeg_sample_frames(mp4)
        # executor-side: a recognized container fails the job loudly
        # (GIFs in the same batch would still decode; corrupt blobs
        # still drop) rather than producing fake frames
        payloads = spark.createDataFrame(
            [(1, bytearray(mp4))], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
            multimodal.sample_frames(payloads, use_fake=False).collect()


def test_ffmpeg_plumbing_with_stub_binary(tmp_path):
    """Drives the REAL ffmpeg subprocess plumbing (invocation, bounded
    -frames:v, PPM stream parsing, every-Nth sampling) against a stub
    binary that emits a known P6 stream — the decode step itself is the
    only thing faked, per the container-libs-absent environment."""
    rng = np.random.RandomState(5)
    frames = _palette_frames(rng, 4, 5, 6)
    stream = b"".join(mc.encode_ppm(f) for f in frames)
    fixture = tmp_path / "frames.ppmstream"
    fixture.write_bytes(stream)
    stub = tmp_path / "ffmpeg"
    stub.write_text(f"#!/bin/sh\ncat > /dev/null\ncat {fixture}\n")
    stub.chmod(0o755)
    got = multimodal.ffmpeg_sample_frames(
        b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32,
        every_n_frames=2,
        max_frames=8,
        ffmpeg_bin=str(stub),
    )
    assert len(got) == 2  # 4 frames sampled every 2nd
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[2])
    # split_ppm_stream rejects garbage between frames
    with pytest.raises(ValueError):
        multimodal.split_ppm_stream(stream + b"junk")


# ---------------------------------------------------------------------
# ISO BMFF (mp4) container metadata — parse without decode
# ---------------------------------------------------------------------


def test_mp4_meta_roundtrip_all_field_paths():
    # every parser-read field comes from a real box field of the
    # synthesized skeleton; exercise v0 mvhd, both codec cycles, and
    # the video-only (no soun trak) shape
    for doc_id in (0, 1, 2, 5, 59, 137, 9999):
        p = mc.synth_video_params(doc_id)
        m = mc.decode_mp4_meta(mc.synth_video(doc_id))
        assert m["brand"] == p["brand"]
        assert m["duration"] == p["duration"]
        assert m["timescale"] == p["timescale"]
        assert m["width"] == p["width"]
        assert m["height"] == p["height"]
        assert m["video_codec"] == p["video_codec"]
        assert m["audio_codec"] == p["audio_codec"]
        assert m["n_tracks"] == (1 if doc_id % 5 == 0 else 2)


def test_mp4_meta_v1_mvhd_and_largesize():
    import struct

    # hand-build a v1 mvhd (64-bit duration) inside a largesize moov
    body = struct.pack(">QQIQ", 0, 0, 90000, 2**33)  # creation, mod, timescale, duration
    mvhd = struct.pack(">I", 8 + 4 + len(body)) + b"mvhd" + struct.pack(">I", 1 << 24) + body
    moov_body = mvhd
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body)) + moov_body
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"iso5" + struct.pack(">I", 0)
    m = mc.decode_mp4_meta(ftyp + moov)
    assert m["timescale"] == 90000
    assert m["duration"] == 2**33  # survives >32-bit
    assert m["brand"] == "iso5"
    assert m["n_tracks"] == 0


def test_mp4_meta_corrupt_raises_valueerror():
    good = mc.synth_video(7)
    for bad in (
        b"",
        b"notamp4atall",
        good[:20],                      # truncated inside moov
        good[:4] + b"xxxx" + good[8:],  # ftyp magic destroyed
    ):
        with pytest.raises(ValueError):
            mc.decode_mp4_meta(bad)


def test_spark_video_meta_corrupt_payload_is_row_not_failure(spark):
    # corrupt blob -> ok=False ROW; the partition (and the other rows)
    # survive — the 100 TB contract shared by every multimodal kernel
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3]}))
    payloads = multimodal.with_synthetic_video_payload(docs).toPandas()
    payloads.loc[payloads["doc_id"] == 2, "payload"] = b"garbage-not-a-container"
    pdf = multimodal.extract_video_meta(
        spark.createDataFrame(payloads)
    ).orderBy("doc_id").toPandas()
    assert list(pdf["ok"]) == [True, False, True]
    assert pdf.loc[pdf["doc_id"] == 2, "duration_ms"].item() == 0
    assert pdf.loc[pdf["doc_id"] == 1, "video_codec"].item() == "hev1"


# ---------------------------------------------------------------------
# baseline JPEG (pure-Python codec, jpegcodec.py)
# ---------------------------------------------------------------------


def _jfif_headers_gray():
    """Shared hand-assembled header segments for the golden tests:
    SOI + DQT(Annex-K luma, zigzag wire order) + SOF0(8x8 gray) +
    DHT(DC+AC luma)."""
    import struct as st

    from flumedb_spark.operators import jpegcodec as jc

    out = bytearray(b"\xff\xd8")
    qwire = bytes(int(v) for v in jc.QT_LUMA[jc.ZIGZAG])
    out += b"\xff\xdb" + st.pack(">H", 2 + 65) + b"\x00" + qwire
    sof = st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    for tcth, (bits, vals) in ((0x00, jc.HT_DC_LUMA), (0x10, jc.HT_AC_LUMA)):
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + st.pack(">H", 2 + len(body)) + body
    out += b"\xff\xda" + st.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    return out


def test_jpeg_golden_dc_only_from_spec_arithmetic():
    """A hand-assembled DC-only 8x8 JPEG whose expected pixels come from
    T.81 arithmetic done BY HAND — independent of the encoder, so a
    matched encoder+decoder bug cannot cancel here.

    Entropy data: DC category 6 (Annex-K DC-luma code '1110'),
    magnitude bits '101000' (= +40), AC EOB ('1010'), 1-padded to two
    bytes -> 0xEA 0x2B. Decoded pixel = round(idct_dc) + 128 where
    idct_dc = (1/8) * DIFF * q00 = 0.125 * 40 * 16 = 80 -> all 208."""
    from flumedb_spark.operators.jpegcodec import decode_jpeg

    payload = bytes(_jfif_headers_gray()) + b"\xea\x2b" + b"\xff\xd9"
    arr = decode_jpeg(payload)
    assert arr.shape == (8, 8, 3)
    assert (arr == 208).all()


def test_jpeg_golden_single_ac_coefficient():
    """DC=0 plus one AC coefficient: run/size 0x01 (AC-luma code '00'),
    magnitude bit '1' (= +1) lands at zigzag index 1 = natural (0,1);
    then EOB. Expected pixels: idct of coef[0,1] = q[0,1] * 1 = 11 ->
    pixel(x) = 0.5*sqrt(1/8)... computed here with the same separable
    basis the spec defines, NOT with the codec's own encode path."""
    import numpy as np

    from flumedb_spark.operators.jpegcodec import decode_jpeg

    # DC cat 0 ('00'), AC (0,1)->'00' + bit '1', EOB '1010' => 00 00 1 1010 + pad
    # bits: 0000110 10 + 1111111 pad -> assemble: '000011010' + '1111111' = 16 bits
    bits = "00" + "00" + "1" + "1010"
    bits += "1" * (16 - len(bits))
    ent = int(bits, 2).to_bytes(2, "big")
    payload = bytes(_jfif_headers_gray()) + ent + b"\xff\xd9"
    arr = decode_jpeg(payload)

    coef = np.zeros((8, 8))
    coef[0, 1] = 11.0  # q[0,1] (Annex K) * value 1
    c = np.zeros((8, 8))
    for k in range(8):
        s = np.sqrt(0.125) if k == 0 else 0.5
        for n_ in range(8):
            c[k, n_] = s * np.cos((2 * n_ + 1) * k * np.pi / 16.0)
    expect = np.clip(np.round(c.T @ coef @ c + 128.0), 0, 255).astype(np.uint8)
    assert (arr[:, :, 0] == expect).all()


def test_jpeg_roundtrip_within_quantization_error():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(xx * 255 // 55), (yy * 255 // 39), ((xx + yy) * 255 // 94)], axis=-1
    ).astype(np.uint8)
    from flumedb_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    for sub in ("4:4:4", "4:2:0"):
        for q in (95, 75):
            dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            bound = 4 if (sub, q) == ("4:4:4", 95) else 12
            assert err.mean() < bound, (sub, q, err.mean())


def test_jpeg_restart_markers_roundtrip():
    from flumedb_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )
    enc = encode_jpeg(img, quality=92, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI present
    dec = decode_jpeg(enc)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 20  # checker-ish content, just bounded


def test_jpeg_grayscale_and_odd_dims():
    from flumedb_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    g = (np.mgrid[0:13, 0:19][0] * 17 % 256).astype(np.uint8)  # non-multiple-of-8
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (13, 19, 3)
    err = np.abs(dec[:, :, 0].astype(int) - g.astype(int))
    assert err.mean() < 8


def test_jpeg_rejects_arithmetic_and_corrupt():
    from flumedb_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = bytes(enc).find(b"\xff\xc0")
    # SOF9 (arithmetic sequential) must be rejected loudly
    arith = bytes(enc[:i]) + b"\xff\xc9" + bytes(enc[i + 2 :])
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(arith)
    # a SOF2 swap alone makes an INVALID stream (a baseline scan header
    # is not a legal progressive band) — must raise, not misdecode
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2 :])
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    for bad in (b"", b"\xff\xd8\xff\xd9", bytes(enc)[:30]):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_jpeg_dispatches_through_image_pure_path():
    # the shared dispatch (sniff -> decode) and the Spark-side decode
    # operator both pick JPEG up with no PIL in the container
    from flumedb_spark.operators.jpegcodec import encode_jpeg

    img = (np.mgrid[0:16, 0:16][0] * 16).astype(np.uint8)
    payload = encode_jpeg(np.stack([img] * 3, axis=-1), quality=95)
    assert mc.sniff_format(payload) == "jpeg"
    arr, fmt = mc.decode_image_pure(payload)
    assert fmt == "jpeg" and arr.shape == (16, 16, 3)
    meta = multimodal.decode_image(payload)
    assert meta["ok"] and meta["width"] == 16 and meta["height"] == 16
    assert meta["format"] == "jpeg"


# ---------------------------------------------------------------------
# EBML (webm/mkv) container metadata
# ---------------------------------------------------------------------


def test_webm_meta_roundtrip():
    b = mc.encode_webm_skeleton(
        12345.0, timescale=1_000_000, width=1920, height=1080,
        video_codec="V_VP9", audio_codec="A_OPUS",
    )
    assert multimodal.sniff_video_container(b) == "webm"
    m = mc.decode_webm_meta(b)
    assert m["doc_type"] == "webm"
    assert m["duration"] == 12345.0 and m["timescale"] == 1_000_000
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_tracks"] == 2
    assert m["video_codec"] == "V_VP9" and m["audio_codec"] == "A_OPUS"

    # video-only matroska
    m2 = mc.decode_webm_meta(
        mc.encode_webm_skeleton(7.5, width=320, height=240,
                                video_codec="V_AV1", audio_codec=None,
                                doc_type="matroska")
    )
    assert m2["doc_type"] == "matroska"
    assert m2["n_tracks"] == 1 and m2["audio_codec"] is None


def test_webm_meta_corrupt_raises():
    good = mc.encode_webm_skeleton(5.0)
    for bad in (b"", b"not ebml", good[:12], b"\x1aE\xdf\xa3\xff"):
        with pytest.raises(ValueError):
            mc.decode_webm_meta(bad)


# ---------------------------------------------------------------------
# progressive JPEG (T.81 Annex G)
# ---------------------------------------------------------------------


def test_jpeg_progressive_equals_baseline_decode():
    """Spectral-selection progressive (DC scan + per-component AC scans)
    encodes IDENTICAL quantized coefficients to baseline, so the decoder
    must reconstruct bit-identical pixels — a strong cross-path check of
    the whole progressive machinery (interleaved DC, non-interleaved AC
    geometry, EOBRUN/ZRL) against the already-golden baseline path."""
    from flumedb_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(xx * 255 // 55), (yy * 255 // 39), ((xx + yy) * 255 // 94)], axis=-1
    ).astype(np.uint8)
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    gray = (np.mgrid[0:13, 0:19][0] * 17 % 256).astype(np.uint8)
    for im, sub, q in (
        (img, "4:4:4", 90),
        (img, "4:2:0", 90),
        (noise, "4:4:4", 95),
        (gray, "4:4:4", 85),
    ):
        prog = decode_jpeg(encode_jpeg_progressive(im, quality=q, subsampling=sub))
        base = decode_jpeg(encode_jpeg(im, quality=q, subsampling=sub))
        assert np.array_equal(prog, base), (sub, q)


def _sos_gray(ss, se, ah, al):
    import struct as st

    body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
    return b"\xff\xda" + st.pack(">H", 2 + len(body)) + body


def test_jpeg_progressive_successive_approximation_golden():
    """Hand-assembled 8x8 gray progressive stream exercising the
    successive-approximation paths the spectral-only encoder never
    emits — expected pixels computed from T.81 arithmetic by hand:

    scan1 DC (Ah=0, Al=1): diff 0 (cat 0 = '00')            -> 0x3F
    scan2 DC refine (Ah=1, Al=0): one 0 bit                 -> 0x7F
    scan3 AC 1-63 (Ah=0, Al=1): (r0,s1)='00'+bit 1, EOB     -> 0x35
        => coef[zigzag 1] = +1 << 1 = 2
    scan4 AC refine (Ah=1, Al=0): EOB '1010' + corr bit 1   -> 0xAF
        => |2| & 1 == 0, coef += 1 -> 3
    final: natural (0,1) coefficient = 3 * q01(=11) = 33."""
    import struct as st

    from flumedb_spark.operators import jpegcodec as jc
    from flumedb_spark.operators.jpegcodec import decode_jpeg

    hdr = bytearray(b"\xff\xd8")
    qwire = bytes(int(v) for v in jc.QT_LUMA[jc.ZIGZAG])
    hdr += b"\xff\xdb" + st.pack(">H", 2 + 65) + b"\x00" + qwire
    sof = st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    hdr += b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tcth, (bits, vals) in ((0x00, jc.HT_DC_LUMA), (0x10, jc.HT_AC_LUMA)):
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        hdr += b"\xff\xc4" + st.pack(">H", 2 + len(body)) + body

    stream = (
        bytes(hdr)
        + _sos_gray(0, 0, 0, 1) + b"\x3f"
        + _sos_gray(0, 0, 1, 0) + b"\x7f"
        + _sos_gray(1, 63, 0, 1) + b"\x35"
        + _sos_gray(1, 63, 1, 0) + b"\xaf"
        + b"\xff\xd9"
    )
    arr = decode_jpeg(stream)

    coef = np.zeros((8, 8))
    coef[0, 1] = 33.0
    c = np.zeros((8, 8))
    for k in range(8):
        s = np.sqrt(0.125) if k == 0 else 0.5
        for n_ in range(8):
            c[k, n_] = s * np.cos((2 * n_ + 1) * k * np.pi / 16.0)
    expect = np.clip(np.round(c.T @ coef @ c + 128.0), 0, 255).astype(np.uint8)
    assert (arr[:, :, 0] == expect).all()


def test_jpeg_progressive_rejects_malformed_scans():
    from flumedb_spark.operators.jpegcodec import decode_jpeg, encode_jpeg_progressive

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    enc = encode_jpeg_progressive(img, quality=90)
    # truncation inside the scan chain must raise, not loop or return junk
    with pytest.raises(ValueError):
        decode_jpeg(enc[:-20])


# ---------------------------------------------------------------------
# FLAC / MP3 / AVI metadata + unified media triage
# ---------------------------------------------------------------------


def test_flac_streaminfo_roundtrip():
    m = mc.decode_flac_meta(mc.encode_flac_skeleton(48000, 2, 24, 1234567))
    assert m == {
        "sample_rate": 48000, "channels": 2,
        "bits_per_sample": 24, "total_samples": 1234567,
    }
    for bad in (b"", b"fLaX", b"fLaC\x00\x00\x00\x22" + b"\x00" * 10):
        with pytest.raises(ValueError):
            mc.decode_flac_meta(bad)


def test_mp3_frame_header_and_id3_skip():
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 1000  # MPEG-1 L3 128kbps 44100
    m = mc.decode_mp3_meta(frame)
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    assert m["duration_ms_est"] == len(frame) * 8 // 128
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + frame
    assert mc.decode_mp3_meta(id3)["bitrate_kbps"] == 128
    with pytest.raises(ValueError):
        mc.decode_mp3_meta(b"\x00" * 100)


def test_avi_header_roundtrip():
    avi = mc.encode_avi_skeleton(40000, 250, 720, 576, "xvid")
    assert multimodal.sniff_video_container(avi) == "avi"
    m = mc.decode_avi_meta(avi)
    assert m["usec_per_frame"] == 40000 and m["total_frames"] == 250
    assert (m["width"], m["height"]) == (720, 576)
    assert m["video_handler"] == "xvid" and m["n_streams"] == 2
    for bad in (b"RIFFxxxxWAVE", avi[:40]):
        with pytest.raises(ValueError):
            mc.decode_avi_meta(bad)


def test_spark_mixed_media_triage(spark):
    # one pass over a MIXED corpus: each format parsed by its real
    # parser, corrupt rows -> ok=False, partition survives
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(10))}))
    payloads = multimodal.with_synthetic_media_payload(docs).toPandas()
    payloads.loc[payloads["doc_id"] == 7, "payload"] = b"garbage"
    pdf = (
        multimodal.extract_media_meta(spark.createDataFrame(payloads))
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(pdf["format"][:7] if len(pdf) >= 7 else pdf["format"]) == [
        "mp4", "webm", "avi", "flac", "mp3", "webp", "ogg"
    ][: len(pdf)]
    assert not pdf.loc[pdf["doc_id"] == 7, "ok"].item()
    ok = pdf[pdf["ok"]]
    for _, row in ok.iterrows():
        p = multimodal.media_synth_params(int(row["doc_id"]))
        assert row["format"] == p["format"] and row["duration_ms"] == p["duration_ms"]


def test_tiff_ifd_roundtrip_both_endians_and_multipage():
    for be in (False, True):
        m = mc.decode_tiff_meta(
            mc.encode_tiff_skeleton(1920, 1080, 16, 1, 5, n_pages=3, big_endian=be)
        )
        assert m == {
            "width": 1920, "height": 1080, "bits_per_sample": 16,
            "samples_per_pixel": 1, "compression": 5, "n_ifds": 3,
        }
    for bad in (b"", b"II*\x01", b"II*\x00\xff\xff\xff\xff", b"MM\x00*\x00\x00\x00\x08"):
        with pytest.raises(ValueError):
            mc.decode_tiff_meta(bad)
    # IFD self-loop must raise, not hang
    loop = mc.encode_tiff_skeleton(n_pages=1)
    looped = loop[:-4] + loop[4:8]  # next-IFD -> first IFD offset
    with pytest.raises(ValueError):
        mc.decode_tiff_meta(looped)


def test_metadata_parsers_never_crash_on_corruption():
    """The drop-the-row contract, fuzzed: every truncation and random
    byte-flip of a valid payload either parses or raises ValueError —
    never struct.error/IndexError (which would fail a whole partition
    instead of one row)."""
    import random

    rng = random.Random(11)
    cases = {
        mc.decode_mp4_meta: mc.synth_video(7),
        mc.decode_webm_meta: mc.encode_webm_skeleton(5.0),
        mc.decode_avi_meta: mc.encode_avi_skeleton(),
        mc.decode_flac_meta: mc.encode_flac_skeleton(),
        mc.decode_tiff_meta: mc.encode_tiff_skeleton(),
        mc.decode_mp3_meta: b"\xff\xfb\x90\x00" + b"\x00" * 100,
    }
    for fn, p in cases.items():
        for cut in range(len(p)):  # every prefix truncation
            try:
                fn(p[:cut])
            except ValueError:
                pass
        for _ in range(400):  # random byte flips
            b = bytearray(p)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                fn(bytes(b))
            except ValueError:
                pass


def test_jpeg_decoder_never_crashes_on_corruption():
    """Same fuzz contract for the JPEG decoder: truncations and byte
    flips of valid baseline AND progressive streams either decode or
    raise ValueError (the unguarded walk could surface StopIteration/
    KeyError/IndexError/ZeroDivisionError from mutated segments)."""
    import random

    from flumedb_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = (np.mgrid[0:16, 0:24][0] * 11 % 256).astype(np.uint8)
    rgb = np.stack([img] * 3, -1)
    rng = random.Random(5)
    for p in (
        encode_jpeg(rgb, quality=85, subsampling="4:2:0"),
        encode_jpeg_progressive(rgb, quality=85),
    ):
        for cut in range(0, len(p), 7):
            try:
                decode_jpeg(p[:cut])
            except ValueError:
                pass
        for _ in range(600):
            b = bytearray(p)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_jpeg(bytes(b))
            except ValueError:
                pass


def test_png_adam7_roundtrip_all_filters_and_shapes():
    rng = np.random.RandomState(9)
    for shape in [(9, 11, 3), (7, 6), (5, 4, 4), (1, 1, 3), (13, 3, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        want = img if img.ndim == 3 else img[:, :, None]
        for ft in range(5):
            dec = mc.decode_png(mc.encode_png(img, ft, interlace=1))
            assert np.array_equal(dec, want), (shape, ft)


def test_png_adam7_golden_pass_order():
    """Hand-assembled 2x2 grayscale Adam7 stream (independent of the
    encoder): non-empty passes are 1 (pixel 0,0), 6 (pixel 1,0), and
    7 (row y=1) — each its own filtered sub-image. Values chosen
    distinct so a pass-order or origin/stride bug misplaces them."""
    raw = bytes([0, 10]) + bytes([0, 20]) + bytes([0, 30, 40])
    img = mc.decode_png(_png_chunks_i(2, 2, 0, raw, interlace=1))
    assert np.array_equal(img[:, :, 0], np.array([[10, 20], [30, 40]], np.uint8))


def _png_chunks_i(w, h, color, raw, interlace=0):
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_webp_meta_all_variants():
    for v in ("vp8", "vp8l", "vp8x"):
        m = mc.decode_webp_meta(mc.encode_webp_skeleton(1024, 768, v))
        assert m == {"variant": v, "width": 1024, "height": 768}
    with pytest.raises(ValueError):
        mc.decode_webp_meta(b"RIFF\x04\x00\x00\x00WAVE")


def test_ogg_meta_opus_and_vorbis():
    m = mc.decode_ogg_meta(mc.encode_ogg_skeleton("opus", 2, 44100))
    assert m["codec"] == "opus" and m["channels"] == 2
    assert m["sample_rate"] == 48000  # RFC 7845: Opus decodes at 48 kHz
    assert m["input_sample_rate"] == 44100
    v = mc.decode_ogg_meta(mc.encode_ogg_skeleton("vorbis", 6, 96000))
    assert v["codec"] == "vorbis" and v["channels"] == 6 and v["sample_rate"] == 96000
    with pytest.raises(ValueError):
        mc.decode_ogg_meta(b"OggS" + b"\x00" * 23 + b"\x01\x05hello")


def test_webp_ogg_fuzz_never_crash():
    import random

    rng = random.Random(3)
    for fn, p in (
        (mc.decode_webp_meta, mc.encode_webp_skeleton(33, 44)),
        (mc.decode_ogg_meta, mc.encode_ogg_skeleton()),
    ):
        for cut in range(len(p)):
            try:
                fn(p[:cut])
            except ValueError:
                pass
        for _ in range(500):
            b = bytearray(p)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                fn(bytes(b))
            except ValueError:
                pass


# ---------------------------------------------------------------------
# round-6: MJPEG-in-AVI frame decode without ffmpeg
# ---------------------------------------------------------------------


def test_avi_mjpeg_roundtrip_exact_and_tableless():
    import numpy as np

    from flumedb_spark.operators import mmcodec as mm

    frames = [np.full((16, 24, 3), 2 * v, dtype=np.uint8) for v in (10, 60, 99)]
    for strip in (False, True):
        avi = mm.encode_avi_mjpeg(frames, quality=50, strip_dht=strip)
        assert mm.sniff_avi_mjpeg(avi)
        meta = mm.decode_avi_meta(avi)
        assert meta["video_handler"].lower() == "mjpg"
        assert meta["total_frames"] == 3
        assert (meta["width"], meta["height"]) == (24, 16)
        out = mm.decode_avi_mjpeg_frames(avi)
        assert len(out) == 3
        for got, exp in zip(out, frames):
            assert got.shape == exp.shape and (got == exp).all()
    # table-less frames really lack DHT (the injection path is exercised)
    avi = mm.encode_avi_mjpeg(frames, strip_dht=True)
    _, chunks = mm.avi_video_frame_chunks(avi)
    for c in chunks:
        assert not any(m == 0xC4 for m, _s, _e in mm._jpeg_segments(c))


def test_avi_mjpeg_sampling_and_bounds():
    import numpy as np

    from flumedb_spark.operators import mmcodec as mm

    avi = mm.encode_avi_mjpeg(
        [np.full((8, 8, 3), 2 * v, dtype=np.uint8) for v in range(12)]
    )
    out = mm.decode_avi_mjpeg_frames(avi, max_frames=3, every_n_frames=2)
    assert [int(f[0, 0, 0]) for f in out] == [0, 4, 8]


def test_avi_mjpeg_refuses_interframe_codecs_and_corruption():
    import numpy as np
    import pytest as _pytest

    from flumedb_spark.operators import mmcodec as mm

    skel = mm.encode_avi_skeleton(video_handler="h264")
    assert not mm.sniff_avi_mjpeg(skel)
    with _pytest.raises(ValueError, match="not MJPEG"):
        mm.decode_avi_mjpeg_frames(skel)
    # corrupt movi chunk -> ValueError (drop-the-row contract)
    avi = bytearray(mm.encode_avi_mjpeg([np.zeros((8, 8, 3), dtype=np.uint8)]))
    i = bytes(avi).find(b"00dc") + 8
    avi[i : i + 2] = b"XX"  # destroy the SOI of the frame payload
    with _pytest.raises(ValueError):
        mm.decode_avi_mjpeg_frames(bytes(avi))
    assert not mm.sniff_avi_mjpeg(b"RIFFxxxxAVI garbage")


def test_mjpeg_huffman_strip_inject_inverse():
    import numpy as np

    from flumedb_spark.operators import jpegcodec, mmcodec as mm

    img = (np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3) * 3) % 256
    j = jpegcodec.encode_jpeg(img.astype("uint8"), quality=80)
    stripped = mm.mjpeg_strip_huffman(j)
    assert len(stripped) < len(j)
    fixed = mm.mjpeg_ensure_huffman(stripped)
    # encoder uses the same Annex-K tables the injector supplies, so
    # the decode result is bit-identical either way
    a = jpegcodec.decode_jpeg(j)
    b = jpegcodec.decode_jpeg(fixed)
    assert (a == b).all()
    # already-tabled frames pass through untouched
    assert mm.mjpeg_ensure_huffman(j) == j


def test_avi_mjpeg_fuzz_truncation_and_byteflips():
    """Truncation/byte-flip fuzz for the r6 paths: the AVI frame walk +
    MJPEG decode and the Huffman splice must either succeed or raise
    ValueError — never hang, never leak another exception type (the
    drop-the-row contract)."""
    import random

    import numpy as np

    from flumedb_spark.operators import mmcodec as mm

    good = mm.encode_avi_mjpeg(
        [np.full((8, 8, 3), 2 * v, dtype=np.uint8) for v in (5, 50)],
        strip_dht=True,
    )
    for cut in range(0, len(good), 7):
        try:
            mm.decode_avi_mjpeg_frames(good[:cut])
        except ValueError:
            pass
    rng = random.Random(11)
    for _ in range(300):
        b = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            mm.decode_avi_mjpeg_frames(bytes(b))
        except ValueError:
            pass
        mm.sniff_avi_mjpeg(bytes(b))  # must never raise at all
