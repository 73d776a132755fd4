"""Pure-stdlib multimodal codecs: real image decode/encode for BMP,
binary PPM/PGM, and non-interlaced 8-bit PNG (numpy + zlib), plus WAV
PCM audio via the stdlib ``wave`` module — no PIL/ffmpeg required.

These are the REAL kernels behind ``operators/multimodal.py`` (roadmap
item 4): this container has no image/audio libraries, but the formats
above are fully specified and decodable with nothing beyond numpy and
the Python standard library. PIL, when present, still wins for the
formats it covers (JPEG etc.); these decoders make the common
uncompressed/DEFLATE formats first-class everywhere.

Scale note: every function here is a per-blob kernel invoked inside
Arrow-batched ``mapInPandas`` — no state, no driver involvement, so the
operators scale with partition count. A corrupt blob raises ValueError,
which the callers in multimodal.py convert to ``ok=False`` rows (a bad
byte string must never fail a 100 TB partition).

Format references (public specs): BMP = BITMAPFILEHEADER +
BITMAPINFOHEADER (Windows GDI docs); PPM/PGM = netpbm P6/P5; PNG =
RFC 2083 (chunk layout, DEFLATE, filter types 0-4); WAV = RIFF PCM;
GIF = GIF87a/89a (LZW with variable code width, CLEAR/EOI, graphics
control extensions for transparency/disposal).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes; None when unrecognized."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm" if payload[:2] == b"P6" else "pgm"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"  # SOI + first marker byte
    return None


# ---------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), the baseline Windows bitmap
# ---------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores BGR, bottom-up
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixel_bytes = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_bytes), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB array. Handles
    bottom-up (positive height) and top-down (negative height) rows."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if w <= 0 or h == 0 or len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------
# netpbm — binary PPM (P6, RGB) and PGM (P5, gray)
# ---------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary P6 PPM bytes (maxval 255)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the PNM text header (magic already checked): returns
    (width, height, maxval, data_offset), honoring '#' comments."""
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        fields.append(int(payload[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # one whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 (RGB) or P5 (gray, expanded to RGB) -> (H, W, 3) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    w, h, maxval, off = _pnm_header(payload)
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported PNM (need maxval 255)")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(payload) < off + need:
        raise ValueError("truncated PNM payload")
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if ch == 1:
        return np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    return arr.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------
# PNG — 8-bit gray / RGB / RGBA, non-interlaced (RFC 2083)
# ---------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0, interlace: int = 0) -> bytes:
    """uint8 array -> PNG bytes. (H, W) -> grayscale; (H, W, 3) -> RGB;
    (H, W, 4) -> RGBA. ``filter_type`` applies one PNG filter to every
    scanline (0..4) — non-zero values exist to exercise the decoder's
    unfiltering paths in tests; 0 (None) is the fast default.
    ``interlace=1`` emits Adam7: seven independently-filtered
    sub-images in pass order (the decoder's round-trip twin)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color = 2 if arr.shape[2] == 3 else 6
        ch = arr.shape[2]
        flat = arr
    else:
        raise ValueError("encode_png expects (H,W), (H,W,3) or (H,W,4) uint8")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    if interlace not in (0, 1):
        raise ValueError("interlace must be 0 or 1")
    h, w = flat.shape[:2]
    if interlace == 0:
        body = _png_filter_image(flat, ch, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = flat[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_png_filter_image(sub, ch, filter_type))
        body = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    idat = zlib.compress(body, 6)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def _png_filter_image(flat: np.ndarray, ch: int, filter_type: int) -> bytes:
    """Filter one (sub-)image's scanlines (previous-row state local to
    the image, per the spec's per-pass filtering)."""
    h, w = flat.shape[:2]
    raw = flat.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up_left = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            enc = cur - _paeth_predict(left, prev, up_left)
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6) over int16 lanes."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 (C = 1/2/3/4 by color type).
    Supports bit depth 8, color types 0/2/4/6, interlace 0; all five
    scanline filters are unfiltered (Sub via per-lane cumsum, Up
    vectorized, Avg/Paeth per-pixel as the spec's recurrences demand)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    h = bit_depth = color = interlace = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated PNG IHDR")
            w, h, bit_depth, color, _comp, _filt, interlace = struct.unpack_from(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or color not in _PNG_CHANNELS or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # corrupt DEFLATE must surface as ValueError
        raise ValueError(f"corrupt PNG image data: {exc}") from exc
    if interlace == 0:
        out, _ = _png_unfilter_image(raw, 0, w, h, ch)
        return out.reshape(h, w, ch)
    # Adam7 (RFC 2083 §2.6): seven sequential sub-images, each filtered
    # independently (the previous-row state resets per pass), scattered
    # onto the final grid at the standard origins/strides
    full = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub, off = _png_unfilter_image(raw, off, pw, ph, ch)
        full[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
    return full


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter_image(raw: bytes, offset: int, w: int, h: int, ch: int):
    """Unfilter one (sub-)image of ``h`` scanlines of ``w`` pixels
    starting at ``offset`` in the decompressed stream; returns the
    (h, w*ch) uint8 array and the next stream offset."""
    stride = w * ch
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("truncated PNG image data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = offset + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).astype(
            np.int32
        )
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-ch] -> cumsum per lane
            cur = line.reshape(-1, ch).cumsum(axis=0).reshape(-1) & 0xFF
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (3, 4):  # Average / Paeth: left-dependent recurrence
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ft == 3:
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + h * (stride + 1)


# ---------------------------------------------------------------------
# WAV — 16-bit PCM via the stdlib wave module
# ---------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (samples int16 array [n_frames, channels]
    squeezed to 1-D for mono, sample_rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, width, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as exc:
        raise ValueError(f"not a decodable WAV payload: {exc}") from exc
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(frames, dtype="<i2")
    if nch > 1:
        arr = arr.reshape(-1, nch)
    return arr, rate


# ---------------------------------------------------------------------
# kernels over decoded arrays
# ---------------------------------------------------------------------


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize any decoded image array to (H, W, 3) RGB: grayscale
    and gray+alpha replicate the luminance channel; RGBA drops alpha.
    Decoders return their native channel count (PNG color types 0/4/6),
    but RGB-only consumers (PPM re-encode, pixel statistics over three
    channels) need the canonical shape."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    ch = arr.shape[2]
    if ch == 3:
        return arr
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if ch == 4:  # RGBA
        return arr[:, :, :3]
    raise ValueError(f"unsupported channel count {ch}")


def resize_nn(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with floor source mapping:
    src_x = floor(dst_x * W / width) — the standard integer NN kernel,
    reproducible in plain SQL (the oracle recomputes it)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def decode_image_pure(payload: bytes) -> tuple[np.ndarray, str]:
    """Dispatch on magic bytes -> (RGB-ish uint8 array, format name).
    Raises ValueError for unrecognized or corrupt payloads."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload), "bmp"
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload), fmt
    if fmt == "png":
        return decode_png(payload), "png"
    if fmt == "jpeg":
        # baseline JFIF via the pure-Python codec (jpegcodec.py) — the
        # last common format that used to require PIL
        from .jpegcodec import decode_jpeg

        return decode_jpeg(payload), "jpeg"
    raise ValueError("unrecognized image payload")


# ---------------------------------------------------------------------
# deterministic synthetic payloads (cross-engine-checkable fixtures)
# ---------------------------------------------------------------------
#
# These generative formulas are the contract between the Spark decode
# path and the DuckDB oracle: Spark ENCODES real format bytes from them
# worker-side, then DECODES those bytes with the real codecs above; the
# oracle recomputes the same statistics arithmetically from doc_id. A
# decode (or encode) bug on either dimension breaks the hash match —
# only a perfectly matched encoder+decoder defect could cancel out, and
# the golden-byte fixtures in tests/test_mmcodec.py pin that down.


def synth_image_dims(doc_id: int) -> tuple[int, int]:
    """(width, height) of the synthetic image for a doc_id."""
    return 16 + doc_id % 13, 8 + doc_id % 7


def synth_image(doc_id: int) -> np.ndarray:
    """Deterministic RGB image: pixel(y, x, c) = (doc_id + 3x + 5y + 7c) % 256."""
    w, h = synth_image_dims(doc_id)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((doc_id + 3 * x + 5 * y + 7 * c) % 256).astype(np.uint8)


def synth_audio(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic PCM samples: sample(i) = ((doc_id*31 + i*7) % 65536)
    - 32768, n = 200 + doc_id % 31, rate = 8000 + 100*(doc_id % 5)."""
    n = 200 + doc_id % 31
    i = np.arange(n)
    samples = (((doc_id * 31 + i * 7) % 65536) - 32768).astype(np.int16)
    return samples, 8000 + 100 * (doc_id % 5)


# ---------------------------------------------------------------------
# GIF — multi-frame images via pure-Python LZW (GIF87a/89a spec).
# The REAL kernel behind frame sampling: a video-lite format this
# container can genuinely decode (no ffmpeg needed).
# ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-flavor LZW: variable code width, CLEAR/EOI codes, MSB-last
    bit packing (LSB-first within the byte stream)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = reset()
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    next_code = eoi + 1
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width = reset()
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """GIF-flavor LZW encoder (string-table build mirrors the decoder)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset (keeps width bounded)
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """List of (H, W, 3) uint8 frames (same dims) -> animated GIF bytes.

    Each frame is quantized to its own 256-color local palette (frames
    here are synthetic/test fixtures with few distinct colors; raises
    if a frame exceeds 256)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)  # no global color table
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        flat = f.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif supports <=256 colors per frame")
        # local color table size: power of two >= len(colors), min 2
        bits_needed = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
        table_n = 1 << bits_needed
        palette = np.zeros((table_n, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | (bits_needed - 1))
        out += palette.tobytes()
        min_code = max(2, bits_needed)
        lzw = _lzw_encode(min_code, inverse.astype(int).tolist())
        out.append(min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of (H, W, 3) uint8 RGB frames (composited
    draw-over onto the logical screen; disposal 2 restores background,
    disposal 3 restores the pre-frame canvas; transparency honored via
    the GCE transparent index)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    try:
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = payload[pos]
                pos += 1
                if label == 0xF9:  # graphics control
                    size = payload[pos]
                    gflags = payload[pos + 1]
                    disposal = (gflags >> 2) & 0x07
                    transparent = payload[pos + 4] if (gflags & 1) else None
                    pos += size + 1
                while payload[pos] != 0:  # skip (remaining) sub-blocks
                    pos += payload[pos] + 1
                pos += 1
            elif block == 0x2C:  # image descriptor
                left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
                pos += 9
                if iflags & 0x40:
                    raise ValueError("interlaced GIF not supported")
                table = gct
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                    pos += n * 3
                if table is None:
                    raise ValueError("GIF frame with no color table")
                min_code = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    data += payload[pos + 1 : pos + 1 + ln]
                    pos += ln + 1
                pos += 1
                idx = np.array(_lzw_decode(min_code, bytes(data)), dtype=np.int32)
                if idx.size < fw * fh:
                    raise ValueError("truncated GIF frame data")
                idx = idx[: fw * fh].reshape(fh, fw)
                # disposal 3 (restore-to-previous): snapshot the region
                # BEFORE this frame draws, restore it after the frame is
                # emitted (GIF89a spec §23, disposal method 3)
                prev_region = (
                    canvas[top : top + fh, left : left + fw].copy()
                    if disposal == 3
                    else None
                )
                region = canvas[top : top + fh, left : left + fw]
                rgb = table[np.clip(idx, 0, len(table) - 1)]
                if transparent is not None:
                    mask = (idx != transparent)[:, :, None]
                    region[:] = np.where(mask, rgb, region)
                else:
                    region[:] = rgb
                frames.append(canvas.copy())
                if disposal == 2:  # restore background (black) in the region
                    canvas[top : top + fh, left : left + fw] = 0
                elif disposal == 3:  # restore canvas to pre-frame state
                    canvas[top : top + fh, left : left + fw] = prev_region
                transparent = None
                disposal = 0
            else:
                raise ValueError(f"bad GIF block 0x{block:02x}")
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF payload: {exc}") from exc
    if not frames:
        raise ValueError("GIF contains no frames")
    return frames


# ---------------------------------------------------------------------
# ISO BMFF (mp4/mov) container metadata — parse, no decode
# ---------------------------------------------------------------------
# Box layout per the public ISO/IEC 14496-12 spec: [u32 size][4cc type]
# (size==1 -> u64 largesize follows; size==0 -> box runs to EOF).
# Frame DECODE still requires ffmpeg (multimodal.ffmpeg_sample_frames);
# this parser makes container METADATA (duration, track layout, codec
# fourccs, display dims) first-class without any system library — the
# fields a 100 TB video-corpus pipeline filters and buckets on before
# it ever pays for a decode.


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in buf[start:end]."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise ValueError(f"mp4: box {btype!r} overruns container")
        yield btype, body, pos + size
        pos += size


def _find_box(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def _malformed_raises_valueerror(fn):
    """Entry-point guard for the metadata parsers: ANY low-level error a
    malformed payload can provoke (short struct slices, bad indexes,
    huge declared sizes) must surface as ValueError — the drop-the-row
    contract every mapInPandas caller relies on. Without this, a payload
    whose declared box/segment size admits a truncated body raises
    struct.error and fails the whole 100 TB partition."""
    import functools

    @functools.wraps(fn)
    def wrapped(payload: bytes) -> dict:
        try:
            return fn(payload)
        except (struct.error, IndexError, OverflowError, MemoryError) as exc:
            raise ValueError(f"{fn.__name__}: malformed payload: {exc}") from exc

    return wrapped


@_malformed_raises_valueerror
def decode_mp4_meta(payload: bytes) -> dict:
    """Container metadata from an ISO BMFF (mp4/mov) payload.

    Returns ``{brand, timescale, duration, n_tracks, width, height,
    video_codec, audio_codec}`` — duration in mvhd timescale units
    (exact ints; seconds = duration/timescale is the caller's float).
    Raises ValueError on malformed boxes (callers drop the row)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: no ftyp box")
    brand = payload[8:12].decode("ascii", "replace")
    moov = _find_box(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    ms, me = moov

    mvhd = _find_box(payload, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: no mvhd box")
    vs, _ve = mvhd
    version = payload[vs]
    if version == 1:
        timescale = struct.unpack(">I", payload[vs + 4 + 16 : vs + 4 + 20])[0]
        duration = struct.unpack(">Q", payload[vs + 4 + 20 : vs + 4 + 28])[0]
    else:
        timescale = struct.unpack(">I", payload[vs + 4 + 8 : vs + 4 + 12])[0]
        duration = struct.unpack(">I", payload[vs + 4 + 12 : vs + 4 + 16])[0]

    n_tracks = 0
    width = height = 0
    video_codec = audio_codec = None
    for t, ts_, te in _iter_boxes(payload, ms, me):
        if t != b"trak":
            continue
        n_tracks += 1
        handler = None
        mdia = _find_box(payload, ts_, te, b"mdia")
        if mdia is not None:
            hdlr = _find_box(payload, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                hs = hdlr[0]
                handler = payload[hs + 8 : hs + 12]  # after version/flags + pre_defined
            codec = None
            minf = _find_box(payload, mdia[0], mdia[1], b"minf")
            if minf is not None:
                stbl = _find_box(payload, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    stsd = _find_box(payload, stbl[0], stbl[1], b"stsd")
                    if stsd is not None:
                        ss = stsd[0] + 8  # version/flags + entry_count
                        if ss + 8 <= stsd[1]:
                            codec = payload[ss + 4 : ss + 8].decode("ascii", "replace")
            if handler == b"vide":
                video_codec = video_codec or codec
                tkhd = _find_box(payload, ts_, te, b"tkhd")
                if tkhd is not None:
                    ks = tkhd[0]
                    body = ks + 4  # after version/flags
                    off = body + (84 if payload[ks] == 1 else 72)
                    # 16.16 fixed-point display dimensions
                    width = struct.unpack(">I", payload[off : off + 4])[0] >> 16
                    height = struct.unpack(">I", payload[off + 4 : off + 8])[0] >> 16
            elif handler == b"soun":
                audio_codec = audio_codec or codec
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration": int(duration),
        "n_tracks": n_tracks,
        "width": int(width),
        "height": int(height),
        "video_codec": video_codec,
        "audio_codec": audio_codec,
    }


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full_box(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_skeleton(
    duration: int,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "avc1",
    audio_codec: str | None = "mp4a",
    brand: str = "isom",
) -> bytes:
    """A structurally-valid ISO BMFF skeleton (ftyp + moov with real
    mvhd/trak/tkhd/mdia/hdlr/stsd boxes, no media data) — the
    synthesizer twin of ``decode_mp4_meta`` for tests and the synthetic
    corpus: every field the parser reads is a real box field here."""

    def _trak(handler: bytes, codec: str, w: int, h: int) -> bytes:
        tkhd = _full_box(
            b"tkhd",
            0,
            7,
            struct.pack(">II", 0, 0)          # creation/modification
            + struct.pack(">II", 1, 0)        # track id + reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8                     # reserved
            + struct.pack(">hhhh", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16)
        )
        sample_entry = _box(codec.encode("ascii"), b"\x00" * 8)
        stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
        mdhd = _full_box(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    ftyp = _box(b"ftyp", brand.encode("ascii") + struct.pack(">I", 0x200) + b"isommp41")
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),  # next track id
    )
    traks = _trak(b"vide", video_codec, width, height)
    if audio_codec:
        traks += _trak(b"soun", audio_codec, 0, 0)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov


def synth_video_params(doc_id: int) -> dict:
    """Deterministic mp4 container params (the arithmetic an SQL oracle
    replays): duration_ms = 1000 + (doc_id*37) % 240000 at timescale
    1000; width = 160 + 16*(doc_id % 60); height = 90 + 9*(doc_id % 60);
    video codec cycles avc1/hev1/vp09 by doc_id % 3; every 5th doc is
    video-only (no audio track); brand mp42 for odd doc_ids else isom."""
    return {
        "duration": 1000 + (doc_id * 37) % 240000,
        "timescale": 1000,
        "width": 160 + 16 * (doc_id % 60),
        "height": 90 + 9 * (doc_id % 60),
        "video_codec": ("avc1", "hev1", "vp09")[doc_id % 3],
        "audio_codec": None if doc_id % 5 == 0 else "mp4a",
        "brand": "mp42" if doc_id % 2 else "isom",
    }


def synth_video(doc_id: int) -> bytes:
    p = synth_video_params(doc_id)
    return encode_mp4_skeleton(
        duration=p["duration"],
        timescale=p["timescale"],
        width=p["width"],
        height=p["height"],
        video_codec=p["video_codec"],
        audio_codec=p["audio_codec"],
        brand=p["brand"],
    )


# ---------------------------------------------------------------------
# EBML (Matroska/WebM) container metadata — parse, no decode
# ---------------------------------------------------------------------
# Element layout per the public RFC 8794 (EBML) + Matroska spec: each
# element is [vint id][vint size][body]. Like decode_mp4_meta, this
# surfaces the filter/bucket fields (duration, track layout, codec ids,
# display dims) without any system library; frame decode stays behind
# the explicit ffmpeg boundary.

_EBML_HEADER = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_AUDIO = 0xE1
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_TIMESCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_DOCTYPE = 0x4282
_MKV_SAMPLEFREQ = 0xB5


def _ebml_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Read one EBML variable-length integer at ``pos``. Element IDs
    keep the length-marker bit (matching the spec's ID constants);
    sizes strip it. Returns (value, next_pos)."""
    if pos >= len(buf):
        raise ValueError("ebml: truncated vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint lead byte")
    length = 9 - first.bit_length()
    if pos + length > len(buf):
        raise ValueError("ebml: truncated vint body")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    return v, pos + length


def _ebml_children(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, p1 = _ebml_vint(buf, pos, keep_marker=True)
        size, p2 = _ebml_vint(buf, p1, keep_marker=False)
        # unknown-size: VINT_DATA all ones at ANY vint length (0xFF,
        # 0x7F 0xFF, ... through the 8-byte form), common on
        # live-streamed/unfinalized Matroska Segments
        body_end = end if size == (1 << (7 * (p2 - p1))) - 1 else p2 + size
        if body_end > end:
            raise ValueError("ebml: element overruns parent")
        yield eid, p2, body_end
        pos = body_end


def _ebml_uint(buf: bytes, start: int, end: int) -> int:
    v = 0
    for i in range(start, end):
        v = (v << 8) | buf[i]
    return v


@_malformed_raises_valueerror
def decode_webm_meta(payload: bytes) -> dict:
    """Container metadata from an EBML (webm/mkv) payload: doc_type,
    timescale (ns/tick), duration (float ticks), track count, first
    video dims + codec id, first audio codec id. ValueError on
    malformed input (callers drop the row)."""
    if payload[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("ebml: no EBML header")
    doc_type = None
    timescale = 1_000_000  # matroska default: 1ms ticks
    duration = 0.0
    n_tracks = 0
    width = height = 0
    video_codec = audio_codec = None
    top = list(_ebml_children(payload, 0, len(payload)))
    for eid, bs, be in top:
        if eid == _EBML_HEADER:
            for hid, hs, he in _ebml_children(payload, bs, be):
                if hid == _MKV_DOCTYPE:
                    doc_type = payload[hs:he].split(b"\x00")[0].decode("ascii", "replace")
        elif eid == _MKV_SEGMENT:
            for sid, ss, se in _ebml_children(payload, bs, be):
                if sid == _MKV_INFO:
                    for iid, is_, ie in _ebml_children(payload, ss, se):
                        if iid == _MKV_TIMESCALE:
                            timescale = _ebml_uint(payload, is_, ie)
                        elif iid == _MKV_DURATION:
                            raw = payload[is_:ie]
                            duration = struct.unpack(
                                ">f" if len(raw) == 4 else ">d", raw
                            )[0]
                elif sid == _MKV_TRACKS:
                    for tid, ts, te in _ebml_children(payload, ss, se):
                        if tid != _MKV_TRACKENTRY:
                            continue
                        n_tracks += 1
                        ttype = 0
                        codec = None
                        vw = vh = 0
                        for fid, fs, fe in _ebml_children(payload, ts, te):
                            if fid == _MKV_TRACKTYPE:
                                ttype = _ebml_uint(payload, fs, fe)
                            elif fid == _MKV_CODECID:
                                codec = payload[fs:fe].decode("ascii", "replace")
                            elif fid == _MKV_VIDEO:
                                for vid_, vs, ve in _ebml_children(payload, fs, fe):
                                    if vid_ == _MKV_PIXELW:
                                        vw = _ebml_uint(payload, vs, ve)
                                    elif vid_ == _MKV_PIXELH:
                                        vh = _ebml_uint(payload, vs, ve)
                        if ttype == 1 and video_codec is None:
                            video_codec, width, height = codec, vw, vh
                        elif ttype == 2 and audio_codec is None:
                            audio_codec = codec
    if doc_type is None:
        raise ValueError("ebml: no DocType")
    return {
        "doc_type": doc_type,
        "timescale": int(timescale),
        "duration": float(duration),
        "n_tracks": n_tracks,
        "width": int(width),
        "height": int(height),
        "video_codec": video_codec,
        "audio_codec": audio_codec,
    }


def _ebml_encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_encode_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (8 - length)) << (8 * (length - 1)) | n).to_bytes(
                length, "big"
            )
    raise ValueError("ebml: size too large")


def _ebml_elem(eid: int, body: bytes) -> bytes:
    return _ebml_encode_id(eid) + _ebml_encode_size(len(body)) + body


def _ebml_uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_webm_skeleton(
    duration_ticks: float,
    timescale: int = 1_000_000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "V_VP9",
    audio_codec: str | None = "A_OPUS",
    doc_type: str = "webm",
) -> bytes:
    """A structurally-valid EBML/webm skeleton (header + Segment with
    real Info and Tracks elements, no clusters) — the synthesizer twin
    of ``decode_webm_meta``."""
    header = _ebml_elem(
        _EBML_HEADER,
        _ebml_elem(0x4286, b"\x01")          # EBMLVersion
        + _ebml_elem(0x42F7, b"\x01")        # EBMLReadVersion
        + _ebml_elem(_MKV_DOCTYPE, doc_type.encode("ascii"))
        + _ebml_elem(0x4287, b"\x04")        # DocTypeVersion
        + _ebml_elem(0x4285, b"\x02"),       # DocTypeReadVersion
    )
    info = _ebml_elem(
        _MKV_INFO,
        _ebml_elem(_MKV_TIMESCALE, _ebml_uint_body(timescale))
        + _ebml_elem(_MKV_DURATION, struct.pack(">d", float(duration_ticks))),
    )
    vtrack = _ebml_elem(
        _MKV_TRACKENTRY,
        _ebml_elem(0xD7, b"\x01")            # TrackNumber
        + _ebml_elem(_MKV_TRACKTYPE, b"\x01")
        + _ebml_elem(_MKV_CODECID, video_codec.encode("ascii"))
        + _ebml_elem(
            _MKV_VIDEO,
            _ebml_elem(_MKV_PIXELW, _ebml_uint_body(width))
            + _ebml_elem(_MKV_PIXELH, _ebml_uint_body(height)),
        ),
    )
    tracks = vtrack
    if audio_codec:
        tracks += _ebml_elem(
            _MKV_TRACKENTRY,
            _ebml_elem(0xD7, b"\x02")
            + _ebml_elem(_MKV_TRACKTYPE, b"\x02")
            + _ebml_elem(_MKV_CODECID, audio_codec.encode("ascii"))
            + _ebml_elem(_MKV_AUDIO, _ebml_elem(_MKV_SAMPLEFREQ, struct.pack(">f", 48000.0))),
        )
    segment = _ebml_elem(_MKV_SEGMENT, info + _ebml_elem(_MKV_TRACKS, tracks))
    return header + segment


# ---------------------------------------------------------------------
# FLAC / MP3 audio metadata + RIFF/AVI container metadata (parse only)
# ---------------------------------------------------------------------
# Public specs: FLAC format docs (xiph), MPEG-1/2 audio frame headers
# (ISO/IEC 11172-3 / 13818-3), OpenDML AVI (MainAVIHeader/AVIStreamHeader).
# Same contract as every parser here: metadata without system libraries,
# ValueError on malformed payloads (callers drop the row); SAMPLE decode
# for these compressed codecs stays out of scope (ffmpeg boundary).


@_malformed_raises_valueerror
def decode_flac_meta(payload: bytes) -> dict:
    """STREAMINFO fields from a FLAC payload: sample_rate, channels,
    bits_per_sample, total_samples."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: no fLaC magic")
    pos = 4
    while pos + 4 <= len(payload):
        head = payload[pos]
        btype = head & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("flac: truncated STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            return {
                "sample_rate": (packed >> 44) & 0xFFFFF,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
            }
        if head & 0x80:  # last block and no STREAMINFO seen
            break
        pos += 4 + blen
    raise ValueError("flac: no STREAMINFO block")


def encode_flac_skeleton(
    sample_rate: int = 44100,
    channels: int = 2,
    bits_per_sample: int = 16,
    total_samples: int = 0,
) -> bytes:
    """STREAMINFO-only FLAC skeleton — the synthesizer twin."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body = (
        (4096).to_bytes(2, "big") * 2          # min/max blocksize
        + b"\x00\x00\x00" * 2                   # min/max framesize (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                          # md5 of raw samples (unset)
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


@_malformed_raises_valueerror
def decode_mp3_meta(payload: bytes) -> dict:
    """First-frame header fields of an MPEG-1 Layer III payload (ID3v2
    tags skipped): bitrate_kbps, sample_rate, and a CBR duration
    estimate in milliseconds."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:  # syncsafe
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    end = min(len(payload) - 3, pos + 4096)
    while pos <= end:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            h1 = payload[pos + 1]
            version = (h1 >> 3) & 0x3   # 3 = MPEG-1
            layer = (h1 >> 1) & 0x3     # 1 = Layer III
            if version == 3 and layer == 1:
                h2 = payload[pos + 2]
                br_idx, sr_idx = h2 >> 4, (h2 >> 2) & 0x3
                if 0 < br_idx < 15 and sr_idx in _MP3_RATES:
                    kbps = _MP3_BITRATES_V1L3[br_idx]
                    rate = _MP3_RATES[sr_idx]
                    audio_bytes = len(payload) - pos
                    return {
                        "bitrate_kbps": kbps,
                        "sample_rate": rate,
                        "duration_ms_est": audio_bytes * 8 // kbps,
                    }
        pos += 1
    raise ValueError("mp3: no MPEG-1 Layer III frame sync found")


@_malformed_raises_valueerror
def decode_avi_meta(payload: bytes) -> dict:
    """MainAVIHeader + stream types from a RIFF/AVI payload: frame
    period (us), total frames, dims, stream count, video/audio handler
    fourccs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI payload")

    def chunks(start, end):
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            if pos + 8 + size > end:
                raise ValueError("avi: chunk overruns container")
            yield cid, pos + 8, pos + 8 + size
            pos += 8 + size + (size & 1)  # word-aligned

    out = {
        "usec_per_frame": 0, "total_frames": 0, "width": 0, "height": 0,
        "n_streams": 0, "video_handler": None, "audio_handler": None,
    }
    seen_avih = False
    for cid, bs, be in chunks(12, len(payload)):
        if cid != b"LIST" or payload[bs : bs + 4] != b"hdrl":
            continue
        for hid, hs, he in chunks(bs + 4, be):
            if hid == b"avih":
                if he - hs < 40:
                    raise ValueError("avi: truncated avih")
                vals = struct.unpack("<10I", payload[hs : hs + 40])
                out["usec_per_frame"] = vals[0]
                out["total_frames"] = vals[4]
                out["n_streams"] = vals[6]
                out["width"], out["height"] = vals[8], vals[9]
                seen_avih = True
            elif hid == b"LIST" and payload[hs : hs + 4] == b"strl":
                ftype = handler = None
                for sid, ss, se in chunks(hs + 4, he):
                    if sid == b"strh" and se - ss >= 8:
                        ftype = payload[ss : ss + 4]
                        handler = payload[ss + 4 : ss + 8].decode("ascii", "replace")
                if ftype == b"vids" and out["video_handler"] is None:
                    out["video_handler"] = handler
                elif ftype == b"auds" and out["audio_handler"] is None:
                    out["audio_handler"] = handler
    if not seen_avih:
        raise ValueError("avi: no avih header")
    return out


def encode_avi_skeleton(
    usec_per_frame: int = 33333,
    total_frames: int = 100,
    width: int = 640,
    height: int = 480,
    video_handler: str = "mjpg",
    audio_handler: str | None = "\x01\x00\x00\x00",
) -> bytes:
    """Header-only RIFF/AVI skeleton — the synthesizer twin."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = chunk(
        b"avih",
        struct.pack(
            "<10I", usec_per_frame, 0, 0, 0, total_frames, 0,
            2 if audio_handler else 1, 0, width, height,
        ) + b"\x00" * 16,
    )
    vstrh = chunk(b"strh", b"vids" + video_handler.encode("latin1")[:4].ljust(4, b"\x00") + b"\x00" * 48)
    strls = chunk(b"LIST", b"strl" + vstrh)
    if audio_handler:
        astrh = chunk(b"strh", b"auds" + audio_handler.encode("latin1")[:4].ljust(4, b"\x00") + b"\x00" * 48)
        strls += chunk(b"LIST", b"strl" + astrh)
    hdrl = chunk(b"LIST", b"hdrl" + avih + strls)
    movi = chunk(b"LIST", b"movi")
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------
# TIFF metadata — IFD walk (TIFF 6.0 spec), parse only
# ---------------------------------------------------------------------

_TIFF_TYPES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # byte width per field type


@_malformed_raises_valueerror
def decode_tiff_meta(payload: bytes) -> dict:
    """First-IFD fields of a TIFF payload: width, height,
    bits_per_sample, samples_per_pixel, compression, n_ifds (page
    count). Both byte orders (II/MM). ValueError on malformed input."""
    if payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("tiff: bad byte-order/magic header")
    bo = "<" if payload[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", payload[4:8])[0]
    out = {"width": 0, "height": 0, "bits_per_sample": 1,
           "samples_per_pixel": 1, "compression": 1, "n_ifds": 0}
    first = True
    seen = set()
    while off:
        if off in seen or off + 2 > len(payload):
            raise ValueError("tiff: bad IFD offset")
        seen.add(off)
        n = struct.unpack(bo + "H", payload[off : off + 2])[0]
        end = off + 2 + n * 12
        if end + 4 > len(payload):
            raise ValueError("tiff: truncated IFD")
        if first:
            for i in range(n):
                e = off + 2 + i * 12
                tag, ftype, count = struct.unpack(bo + "HHI", payload[e : e + 8])
                width = _TIFF_TYPES.get(ftype)
                fmt = {1: "B", 3: "H", 4: "I"}.get(ftype)
                if width is None or fmt is None or count == 0:
                    continue  # exotic type: not needed for these tags
                if width * count <= 4:
                    src = e + 8  # value(s) inline in the entry
                else:
                    # value field holds an offset to the array (TIFF 6.0
                    # §2): real RGB files store BitsPerSample as a
                    # count-3 SHORT array out-of-line — follow it rather
                    # than silently reporting the default
                    src = struct.unpack(bo + "I", payload[e + 8 : e + 12])[0]
                    if src + width * count > len(payload):
                        raise ValueError("tiff: field value offset out of range")
                # first element is representative for the per-sample
                # arrays these tags allow (e.g. 8,8,8 BitsPerSample)
                val = struct.unpack(bo + fmt, payload[src : src + width])[0]
                if tag == 256:
                    out["width"] = val
                elif tag == 257:
                    out["height"] = val
                elif tag == 258:
                    out["bits_per_sample"] = val
                elif tag == 259:
                    out["compression"] = val
                elif tag == 277:
                    out["samples_per_pixel"] = val
            first = False
        out["n_ifds"] += 1
        off = struct.unpack(bo + "I", payload[end : end + 4])[0]
    if out["n_ifds"] == 0:
        raise ValueError("tiff: no IFD")
    return out


def encode_tiff_skeleton(
    width: int = 640,
    height: int = 480,
    bits_per_sample: int = 8,
    samples_per_pixel: int = 3,
    compression: int = 1,
    n_pages: int = 1,
    big_endian: bool = False,
    bps_as_array: bool = False,
) -> bytes:
    """Header+IFD-only TIFF skeleton (no strip data) — the synthesizer
    twin of ``decode_tiff_meta``; supports multi-page chains and both
    byte orders. ``bps_as_array`` writes BitsPerSample the way real RGB
    files do: a count-``samples_per_pixel`` SHORT array stored
    out-of-line behind a value offset (exercises the offset-follow
    path)."""
    bo = ">" if big_endian else "<"
    entries = [
        (256, 3, 1, width), (257, 3, 1, height), (258, 3, 1, bits_per_sample),
        (259, 3, 1, compression), (277, 3, 1, samples_per_pixel),
    ]
    bps_n = samples_per_pixel if bps_as_array else 1

    def ifd(next_off: int, arr_off: int) -> bytes:
        body = struct.pack(bo + "H", len(entries))
        for tag, ftype, count, val in entries:
            if tag == 258 and bps_as_array and bps_n * 2 > 4:
                body += struct.pack(bo + "HHI", tag, ftype, bps_n)
                body += struct.pack(bo + "I", arr_off)
            else:
                body += struct.pack(bo + "HHI", tag, ftype, count)
                body += struct.pack(bo + "H", val) + b"\x00\x00"
        return body + struct.pack(bo + "I", next_off)

    ifd_len = 2 + len(entries) * 12 + 4
    out = (b"MM\x00*" if big_endian else b"II*\x00")
    offsets = [8 + i * ifd_len for i in range(n_pages)]
    arr_off = 8 + n_pages * ifd_len  # per-sample array lives after the IFDs
    out += struct.pack(bo + "I", offsets[0])
    for i in range(n_pages):
        nxt = offsets[i + 1] if i + 1 < n_pages else 0
        out += ifd(nxt, arr_off)
    if bps_as_array and bps_n * 2 > 4:
        out += struct.pack(bo + f"{bps_n}H", *([bits_per_sample] * bps_n))
    return out


# ---------------------------------------------------------------------
# WebP image metadata + Ogg (Opus/Vorbis) audio metadata (parse only)
# ---------------------------------------------------------------------
# Public specs: WebP container + VP8/VP8L bitstream headers (RFC 6386,
# WebP lossless spec), Ogg framing (RFC 3533), OpusHead (RFC 7845),
# Vorbis I identification header.


@_malformed_raises_valueerror
def decode_webp_meta(payload: bytes) -> dict:
    """Dims + variant from a WebP payload (lossy VP8, lossless VP8L, or
    extended VP8X)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: truncated chunk")
        if cid == b"VP8 ":
            # frame tag (3) + start code 9d 01 2a + 16-bit w/h (14 bits + 2 scale)
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("webp: bad VP8 start code")
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return {"variant": "vp8", "width": w, "height": h}
        if cid == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("webp: bad VP8L signature")
            bits = struct.unpack("<I", body[1:5])[0]
            return {
                "variant": "vp8l",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
            }
        if cid == b"VP8X":
            if len(body) < 10:
                raise ValueError("webp: truncated VP8X")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"variant": "vp8x", "width": w, "height": h}
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8/VP8L/VP8X chunk")


def encode_webp_skeleton(width: int, height: int, variant: str = "vp8l") -> bytes:
    """Header-only WebP skeleton for the parser's round-trip twin."""
    if variant == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    elif variant == "vp8":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif variant == "vp8x":
        body = b"\x00" * 4 + (width - 1).to_bytes(3, "little") + (height - 1).to_bytes(3, "little")
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    else:
        raise ValueError(f"webp: unknown variant {variant}")
    if len(chunk) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


@_malformed_raises_valueerror
def decode_ogg_meta(payload: bytes) -> dict:
    """First-page identification header of an Ogg stream: codec
    (opus/vorbis), channels, sample_rate (Opus: the 48 kHz decode rate
    with the original input rate alongside; Vorbis: the stream rate)."""
    if payload[:4] != b"OggS":
        raise ValueError("ogg: no OggS capture pattern")
    if len(payload) < 27:
        raise ValueError("ogg: truncated page header")
    nsegs = payload[26]
    seg_table = payload[27 : 27 + nsegs]
    if len(seg_table) < nsegs:
        raise ValueError("ogg: truncated segment table")
    body_len = sum(seg_table)
    if len(payload) < 27 + nsegs + body_len:
        # a truncated page must not yield a short body that still
        # happens to pass the id-header prefix/length checks
        raise ValueError("ogg: page body shorter than segment table claims")
    # first packet = lacing values up to and including the first <255
    # (RFC 3533 §6); a trailing 255 means the packet continues on the
    # NEXT page — refuse rather than parse a partial id header
    first_len = 0
    for s in seg_table:
        first_len += s
        if s < 255:
            break
    else:
        raise ValueError("ogg: id-header packet spans pages (unsupported)")
    body = payload[27 + nsegs : 27 + nsegs + first_len]
    if body[:8] == b"OpusHead":
        if len(body) < 19:
            raise ValueError("ogg: truncated OpusHead")
        return {
            "codec": "opus",
            "channels": body[9],
            "pre_skip": struct.unpack("<H", body[10:12])[0],
            "sample_rate": 48000,  # Opus always decodes at 48 kHz (RFC 7845)
            "input_sample_rate": struct.unpack("<I", body[12:16])[0],
        }
    if body[:7] == b"\x01vorbis":
        if len(body) < 16:
            raise ValueError("ogg: truncated vorbis id header")
        return {
            "codec": "vorbis",
            "channels": body[11],
            "pre_skip": 0,
            "sample_rate": struct.unpack("<I", body[12:16])[0],
            "input_sample_rate": struct.unpack("<I", body[12:16])[0],
        }
    raise ValueError("ogg: first packet is neither OpusHead nor vorbis id")


def encode_ogg_skeleton(
    codec: str = "opus", channels: int = 2, sample_rate: int = 44100
) -> bytes:
    """First-page-only Ogg skeleton (BOS page with the id header)."""
    if codec == "opus":
        pkt = (
            b"OpusHead" + bytes([1, channels]) + struct.pack("<H", 312)
            + struct.pack("<I", sample_rate) + struct.pack("<h", 0) + b"\x00"
        )
    elif codec == "vorbis":
        pkt = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", sample_rate) + b"\x00" * 12 + b"\x01"
        )
    else:
        raise ValueError(f"ogg: unknown codec {codec}")
    head = (
        b"OggS" + b"\x00" + b"\x02"          # version, header-type BOS
        + b"\x00" * 8                         # granule
        + struct.pack("<I", 1)                # serial
        + struct.pack("<I", 0)                # page seq
        + b"\x00" * 4                         # crc (unchecked by parser)
        + bytes([1, len(pkt)])                # one segment
    )
    return head + pkt


# ---------------------------------------------------------------------
# MJPEG-in-AVI frame decode — pure Python, NO ffmpeg (OpenDML AVI +
# ITU-T T.81 via operators/jpegcodec). This closes the most common
# "video frame decode" case lib-free: MJPG is the one mainstream video
# codec that is just concatenated JPEGs, so the container walk (RIFF
# movi chunks) plus our own JPEG entropy decoder covers it end-to-end.
# mp4/webm (H.264/VP9) remain behind the explicit ffmpeg boundary.
# ---------------------------------------------------------------------


def _dht_segment() -> bytes:
    """A DHT marker segment carrying the four T.81 Annex-K standard
    tables — what MJPEG decoders must supply when frames omit DHT
    (the OpenDML MJPG convention allows table-less frames)."""
    from .jpegcodec import HT_AC_CHROMA, HT_AC_LUMA, HT_DC_CHROMA, HT_DC_LUMA

    body = b""
    for tc_th, (bits, vals) in (
        (0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA),
        (0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA),
    ):
        body += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _jpeg_segments(jpeg: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment from
    SOI up to and including SOS (entropy data not walked)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("mjpeg: no SOI")
    pos = 2
    n = len(jpeg)
    while pos + 2 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError(f"mjpeg: expected marker at {pos}")
        marker = jpeg[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            yield marker, pos, pos + 2
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("mjpeg: truncated segment header")
        seglen = struct.unpack(">H", jpeg[pos + 2 : pos + 4])[0]
        yield marker, pos, pos + 2 + seglen
        if marker == 0xDA:
            return  # SOS: entropy-coded data follows
        pos += 2 + seglen


def mjpeg_ensure_huffman(jpeg: bytes) -> bytes:
    """Return ``jpeg`` with the standard Annex-K Huffman tables spliced
    in before SOS when the frame carries no DHT segment (common in MJPG
    AVIs); frames that already carry tables pass through unchanged."""
    sos_start = None
    for marker, s, _e in _jpeg_segments(jpeg):
        if marker == 0xC4:
            return jpeg
        if marker == 0xDA:
            sos_start = s
            break
    if sos_start is None:
        raise ValueError("mjpeg: no SOS marker")
    return jpeg[:sos_start] + _dht_segment() + jpeg[sos_start:]


def mjpeg_strip_huffman(jpeg: bytes) -> bytes:
    """Remove every DHT segment (the inverse of ``mjpeg_ensure_huffman``
    — produces the table-less frames real MJPG muxers emit)."""
    spans = [(s, e) for m, s, e in _jpeg_segments(jpeg) if m == 0xC4]
    out = jpeg
    for s, e in reversed(spans):
        out = out[:s] + out[e:]
    return out


def _avi_chunks(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError("avi: chunk overruns container")
        yield cid, pos + 8, pos + 8 + size
        pos += 8 + size + (size & 1)


def avi_video_frame_chunks(
    payload: bytes, max_frames: int = 8, every_n_frames: int = 1
) -> tuple[str, list[bytes]]:
    """(video handler fourcc, sampled raw frame chunks) from a RIFF/AVI
    payload: finds the first ``vids`` stream's index by strl order,
    then walks ``movi`` (including nested ``rec `` lists) collecting
    its ``##dc``/``##db`` data chunks. Bounded: stops after
    ``max_frames * every_n_frames`` chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI payload")
    handler = None
    stream_idx = -1
    n_streams = 0
    want = max_frames * every_n_frames
    chunks: list[bytes] = []

    def walk_movi(bs: int, be: int) -> None:
        for cid, cs, ce in _avi_chunks(payload, bs, be):
            if len(chunks) >= want:
                return
            if cid == b"LIST" and payload[cs : cs + 4] == b"rec ":
                walk_movi(cs + 4, ce)
            elif (
                cid[:2].isdigit()
                and int(cid[:2]) == stream_idx
                and cid[2:4] in (b"dc", b"db")
            ):
                chunks.append(payload[cs:ce])

    for cid, bs, be in _avi_chunks(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        ltype = payload[bs : bs + 4]
        if ltype == b"hdrl":
            for hid, hs, he in _avi_chunks(payload, bs + 4, be):
                if hid == b"LIST" and payload[hs : hs + 4] == b"strl":
                    this_idx = n_streams
                    n_streams += 1
                    for sid, ss, se in _avi_chunks(payload, hs + 4, he):
                        if sid == b"strh" and se - ss >= 8:
                            if payload[ss : ss + 4] == b"vids" and handler is None:
                                handler = payload[ss + 4 : ss + 8].decode(
                                    "ascii", "replace"
                                )
                                stream_idx = this_idx
        elif ltype == b"movi":
            if stream_idx < 0:
                raise ValueError("avi: movi before any vids stream header")
            walk_movi(bs + 4, be)
    if handler is None:
        raise ValueError("avi: no vids stream")
    return handler, chunks[::every_n_frames][:max_frames]


_MJPG_FOURCCS = {"mjpg", "dmb1"}  # OpenDML MJPG + QuickTime variant


def sniff_avi_mjpeg(payload: bytes) -> bool:
    """True when the payload is a RIFF/AVI whose first video stream is
    MJPEG — the routing test between the in-process decode path and the
    ffmpeg boundary (corrupt headers -> False, never an exception)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return False
    try:
        meta = decode_avi_meta(payload)
    except ValueError:
        return False
    handler = (meta.get("video_handler") or "").lower().strip("\x00 ")
    return handler in _MJPG_FOURCCS


def decode_avi_mjpeg_frames(
    payload: bytes, max_frames: int = 8, every_n_frames: int = 1
) -> list[np.ndarray]:
    """Decode sampled video frames of an MJPEG AVI to (H, W, 3) uint8
    RGB arrays — entirely in-process (RIFF walk + jpegcodec; missing
    per-frame Huffman tables are supplied per the MJPG convention).
    ValueError on malformed input or a non-MJPEG video stream (the
    ffmpeg boundary stays explicit for real inter-frame codecs)."""
    from .jpegcodec import decode_jpeg

    handler, chunks = avi_video_frame_chunks(payload, max_frames, every_n_frames)
    if handler.lower().strip("\x00 ") not in _MJPG_FOURCCS:
        raise ValueError(
            f"avi: video handler {handler!r} is not MJPEG — frame decode "
            "for inter-frame codecs requires ffmpeg (explicit boundary)"
        )
    return [decode_jpeg(mjpeg_ensure_huffman(c)) for c in chunks]


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    quality: int = 50,
    usec_per_frame: int = 33333,
    strip_dht: bool = False,
) -> bytes:
    """A REAL playable MJPEG AVI from RGB frames: proper avih/strh/strf
    (BITMAPINFOHEADER, biCompression='MJPG') headers and one ``00dc``
    JPEG chunk per frame — the synthesizer twin of
    ``decode_avi_mjpeg_frames``. ``strip_dht`` emits the table-less
    frames real muxers produce (exercises the Annex-K injection path)."""
    from .jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    jpegs = []
    for f in frames:
        j = encode_jpeg(f, quality=quality)
        jpegs.append(mjpeg_strip_huffman(j) if strip_dht else j)
    avih = chunk(
        b"avih",
        struct.pack(
            "<10I", usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h
        )
        + b"\x00" * 16,
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1_000_000 // max(usec_per_frame, 1) or 1,
                      1_000_000, 0, len(frames), 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h),
    )
    # BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = chunk(
        b"strf",
        struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG"
        + struct.pack("<IiiII", w * h * 3, 0, 0, 0, 0),
    )
    hdrl = chunk(b"LIST", b"hdrl" + avih + chunk(b"LIST", b"strl" + strh + strf))
    movi_body = b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
