"""Pure-numpy media codecs (PNG / BMP / PPM / WAV).

The container has no PIL/ffmpeg, but these formats need only stdlib
zlib + header parsing + numpy, so the `decoder="real"` path of
``multimodal.decode_features`` can exercise a genuine bytes→pixels→
features pipeline instead of the deterministic fake (r4 verdict ask #4;
PNG per r5 ask #4).  JPEG/MP4 still raise at the documented seam.

Formats:
- PNG: 8-bit truecolor RGB/RGBA, non-interlaced, all 5 scanline filters
  (zlib inflate + numpy unfilter — the one compressed format every
  training-data pipeline meets).
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up, uncompressed
  (BI_RGB) 24/32-bit; rows padded to 4 bytes.
- PPM: binary P6, maxval 255, `#` comments allowed in the header.
- WAV: RIFF/WAVE, PCM (format 1) 16-bit, any channel count.

Encoders exist so tests can round-trip byte-exactly.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------------- BMP
def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up rows,
    BGR byte order, 4-byte row padding)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + data_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    bgr = img[:, :, ::-1]                      # RGB → BGR
    zeros = b"\x00" * pad
    for y in range(h - 1, -1, -1):             # bottom-up
        body += bgr[y].tobytes() + zeros
    return header + info + bytes(body)


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB.  Supports BITMAPINFOHEADER(+),
    uncompressed 24/32-bit, bottom-up or top-down."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _fsize, _r1, _r2, offset) = struct.unpack_from("<2sIHHI", buf, 0)
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h, _planes, bpp, compression = struct.unpack_from("<iiHHI", buf, 18)
    if compression not in (0, 3):   # BI_RGB / BI_BITFIELDS with default masks
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP (only 24/32 uncompressed)")
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    px = np.frombuffer(buf, dtype=np.uint8, offset=offset,
                       count=stride * h).reshape(h, stride)
    px = px[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, 2::-1]                      # BGR(A) → RGB, alpha dropped
    return np.ascontiguousarray(rgb)


# ----------------------------------------------------------------------- PPM
def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary P6 PPM."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def _ppm_tokens(buf: bytes, n: int, start: int):
    """Read n whitespace-separated header tokens, skipping # comments.
    Returns (tokens, offset_after_single_whitespace_past_last_token)."""
    toks, i = [], start
    while len(toks) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(buf[i:j])
        i = j
    return toks, i + 1   # exactly ONE whitespace byte separates header/raster


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → (h, w, 3) uint8 RGB (maxval 255 only)."""
    buf = bytes(buf)
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (wtok, htok, mtok), off = _ppm_tokens(buf, 3, 2)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPMs supported")
    return np.frombuffer(buf, dtype=np.uint8, offset=off,
                         count=w * h * 3).reshape(h, w, 3).copy()


# ----------------------------------------------------------------------- PNG
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3|4) uint8 → 8-bit truecolor PNG (non-interlaced).

    ``filter_type`` selects the per-row filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) so decoder round-trip tests can exercise every
    unfilter path; any conformant reader accepts all five."""
    import zlib
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_png expects (h, w, 3) RGB or (h, w, 4) RGBA")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("PNG filter type must be 0..4")
    h, w, ch = img.shape
    bpp = ch
    color = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = img.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        prev = rows[y - 1] if y else zero
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:    # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - left
        elif filter_type == 2:    # Up
            filt = cur - prev
        elif filter_type == 3:    # Average
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - (left + prev) // 2
        else:                     # Paeth
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, ul)),
                dtype=np.int16, count=w * ch)
            filt = cur - pred
        out += bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes()
    idat = zlib.compress(bytes(out), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8.  8-bit truecolor (color type 2/6),
    non-interlaced; all five scanline filters (None/Sub/Up/Average/Paeth).
    Pure stdlib zlib inflate + numpy unfilter — no codec libraries.

    Sub uses the modular-cumsum identity (recon = cumsum of deltas per
    byte lane, mod 256) and Up is a plain vector add; Average and Paeth
    have a true left-to-right dependency, so they walk pixels within the
    row (rows are short; whole-image work stays O(h·w·ch))."""
    import zlib
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, w = 8, None
    idat = bytearray()
    while i + 8 <= len(buf):
        size = struct.unpack_from(">I", buf, i)[0]
        tag = buf[i + 4 : i + 8]
        body = buf[i + 8 : i + 8 + size]
        if tag == b"IHDR":
            w, h, depth, color, comp, filt_method, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6):
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} (8-bit RGB/RGBA only)")
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG")
            if comp != 0 or filt_method != 0:
                raise ValueError("invalid PNG compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + size
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        prev = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur.astype(np.uint8)
        elif f == 1:      # Sub: per-lane modular cumsum
            lanes = cur.reshape(w, ch).astype(np.uint64)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF).astype(
                np.uint8).reshape(stride)
        elif f == 2:      # Up
            out[y] = ((cur + prev) & 0xFF).astype(np.uint8)
        elif f == 3:      # Average
            row = out[y]
            p16 = prev.astype(np.int16)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (cur[s] + (left + p16[s]) // 2) & 0xFF
                row[s] = left.astype(np.uint8)
        elif f == 4:      # Paeth
            row = out[y]
            p16 = prev.astype(np.int16)
            left = np.zeros(ch, dtype=np.int16)
            ul = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                pred = np.fromiter(
                    (_paeth(int(a), int(b), int(c))
                     for a, b, c in zip(left, p16[s], ul)),
                    dtype=np.int16, count=ch)
                left = (cur[s] + pred) & 0xFF
                row[s] = left.astype(np.uint8)
                ul = p16[s]
        else:
            raise ValueError(f"invalid PNG filter {f}")
    return out.reshape(h, w, ch)


# ----------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF/WAVE bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


def decode_wav(buf: bytes):
    """RIFF/WAVE bytes → (sample_rate, (n, channels) int16 array).
    PCM 16-bit only; walks chunks so extra chunks (LIST etc.) are fine."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, ch, bits, data = 12, None, None, None, None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        size = struct.unpack_from("<I", buf, i + 4)[0]
        body = buf[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1:
                raise NotImplementedError(f"non-PCM WAV (format {fmt_tag})")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)   # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV (only 16-bit PCM)")
    arr = np.frombuffer(data, dtype="<i2")
    return rate, arr.reshape(-1, ch).copy()


# ------------------------------------------------------------------- dispatch
def sniff_format(buf: bytes) -> str:
    """Identify a payload by magic bytes: png|bmp|ppm|wav|fake|unknown."""
    head = bytes(buf[:12])
    if head[:8] == _PNG_SIG:
        return "png"
    if head[:2] == b"BM":
        return "bmp"
    if head[:2] == b"P6":
        return "ppm"
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    if head[:4] == b"FAKE":
        return "fake"
    return "unknown"


def decode_any(buf: bytes):
    """Payload bytes → (kind, value):
    ('image', (h,w,3|4) uint8) for png/bmp/ppm, ('audio', (rate, samples))
    for wav.  Raises on compressed-with-no-codec/unknown formats — the
    codec seam."""
    fmt = sniff_format(buf)
    if fmt == "png":
        return "image", decode_png(buf)
    if fmt == "bmp":
        return "image", decode_bmp(buf)
    if fmt == "ppm":
        return "image", decode_ppm(buf)
    if fmt == "wav":
        return "audio", decode_wav(buf)
    raise NotImplementedError(
        "real decode supports PNG (stdlib zlib + numpy unfilter) and "
        "uncompressed BMP/PPM/WAV natively; JPEG/MP4 need PIL/ffmpeg — "
        "plug the codec in here")
