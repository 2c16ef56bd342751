"""Pure-stdlib image codec for the multimodal pipeline's decode hook.

The sandbox has no PIL/libvips, but three real formats are fully
expressible with the standard library, which is enough to run the
blob → decode → resize → feature path on REAL bytes instead of the
deterministic fake:

- **PPM (P6, maxval 255)**: header tokens separated by whitespace with
  ``#`` comments, then raw RGB triplets.
- **BMP (Windows, BITMAPINFOHEADER, 24-bit BI_RGB)**: bottom-up rows,
  BGR byte order, rows padded to 4 bytes.
- **PNG (8-bit truecolor, color type 2, non-interlaced)**: IHDR/IDAT/
  IEND chunks, zlib-compressed scanlines, all five filter types
  (None/Sub/Up/Average/Paeth — RFC 2083 §6) undone on decode.

The in-memory representation is ``(width, height, pixels)`` with
``pixels`` = top-down RGB bytes (3·w·h). Encoders exist for all three
formats so every decoder is pinned by an exact round-trip (the PNG
encoder can apply any per-row filter, so decode's unfilter branches
are all exercised on real streams).

This module is plain Python by design: it runs inside the Arrow-batch
UDFs of ``operators/multimodal.py`` (the codec IS the slow path there,
same posture as the extraction engine's DOM parse) and in tests/
oracles row-wise. A production deployment swaps PIL/libvips into the
same ``decode_image`` seam for JPEG/WebP.
"""

from __future__ import annotations

import struct
import zlib

Image = tuple  # (width: int, height: int, pixels: bytes — top-down RGB)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(blob: bytes) -> str | None:
    """Format name for supported payloads, None otherwise."""
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:8] == PNG_MAGIC:
        return "png"
    return None


# -- PPM ---------------------------------------------------------------------

def _ppm_tokens(blob: bytes, n: int):
    """First ``n`` header tokens (whitespace-separated, ``#`` comments
    run to end-of-line), plus the offset just past the single
    whitespace byte that terminates the last token."""
    toks = []
    pos = 0
    while len(toks) < n:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            eol = blob.find(b"\n", pos)
            pos = len(blob) if eol < 0 else eol + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("ppm: truncated header")
        toks.append(blob[start:pos])
    return toks, pos + 1


def decode_ppm(blob: bytes) -> Image:
    toks, off = _ppm_tokens(blob, 4)
    if toks[0] != b"P6":
        raise ValueError("ppm: not P6")
    w, h, maxval = (int(t) for t in toks[1:])
    if maxval != 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    need = 3 * w * h
    px = blob[off:off + need]
    if len(px) < need:
        raise ValueError("ppm: truncated pixel data")
    return (w, h, bytes(px))


def encode_ppm(img: Image) -> bytes:
    w, h, px = img
    return b"P6\n%d %d\n255\n" % (w, h) + px


# -- BMP (24-bit BI_RGB) ------------------------------------------------------

def decode_bmp(blob: bytes) -> Image:
    if blob[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER not supported")
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24-bit BI_RGB (got bpp={bpp}, "
                         f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    out = bytearray(3 * w * h)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = data_off + src_row * stride
        line = blob[base:base + 3 * w]
        if len(line) < 3 * w:
            raise ValueError("bmp: truncated pixel data")
        dst = 3 * w * row
        # BGR -> RGB
        out[dst:dst + 3 * w:3] = line[2::3]
        out[dst + 1:dst + 1 + 3 * w:3] = line[1::3]
        out[dst + 2:dst + 2 + 3 * w:3] = line[0::3]
    return (w, h, bytes(out))


def encode_bmp(img: Image) -> bytes:
    w, h, px = img
    stride = (3 * w + 3) & ~3
    pad = b"\x00" * (stride - 3 * w)
    rows = []
    for row in range(h - 1, -1, -1):   # bottom-up
        line = bytearray(px[3 * w * row:3 * w * (row + 1)])
        line[0::3], line[2::3] = line[2::3], line[0::3]   # RGB -> BGR
        rows.append(bytes(line) + pad)
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0,
                       14 + 40)
    return head + info + body


# -- PNG (8-bit RGB, color type 2) ---------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> Image:
    if blob[:8] != PNG_MAGIC:
        raise ValueError("png: bad magic")
    pos = 8
    w = h = None
    idat = []
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8:pos + 8 + length]
        pos += 12 + length   # length + type + crc (crc not verified)
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "png: only 8-bit truecolor non-interlaced (got "
                    f"depth={depth} color={color} interlace={interlace})")
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("png: no IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = 3 * w
    if len(raw) < h * (stride + 1):
        raise ValueError("png: truncated scanlines")
    out = bytearray(stride * h)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ftype == 1:      # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"png: unknown filter {ftype}")
        out[row * stride:(row + 1) * stride] = line
        prev = line
    return (w, h, bytes(out))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(img: Image, filters=None) -> bytes:
    """``filters``: optional per-row filter types (cycled); applying
    real filter math on encode is what lets the decoder's unfilter
    branches be round-trip-tested on genuine streams."""
    w, h, px = img
    stride = 3 * w
    filters = filters or [0]
    lines = []
    prev = bytearray(stride)
    for row in range(h):
        cur = bytearray(px[row * stride:(row + 1) * stride])
        ftype = filters[row % len(filters)]
        enc = bytearray(cur)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (enc[i] - cur[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                enc[i] = (enc[i] - _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"png: unknown filter {ftype}")
        lines.append(bytes([ftype]) + bytes(enc))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


# -- dispatch + transforms -----------------------------------------------------

def decode_image(blob: bytes) -> Image:
    """(width, height, top-down RGB bytes) for any supported format."""
    kind = sniff(blob)
    if kind == "ppm":
        return decode_ppm(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    if kind == "png":
        return decode_png(blob)
    raise ValueError(
        "unsupported image payload (stdlib codec handles PPM-P6, "
        "24-bit BMP, 8-bit RGB PNG; swap PIL/libvips into this seam "
        "for JPEG/WebP)")


def resize_nearest(img: Image, out_w: int, out_h: int) -> Image:
    """Nearest-neighbor resample (floor mapping) — deterministic,
    dependency-free."""
    w, h, px = img
    out = bytearray(3 * out_w * out_h)
    for y in range(out_h):
        sy = min(h - 1, (y * h) // out_h)
        src_base = 3 * w * sy
        dst_base = 3 * out_w * y
        for x in range(out_w):
            sx = min(w - 1, (x * w) // out_w)
            s = src_base + 3 * sx
            d = dst_base + 3 * x
            out[d:d + 3] = px[s:s + 3]
    return (out_w, out_h, bytes(out))


def pixel_features(img: Image, dim: int = 8) -> list:
    """Deterministic ``dim``-component descriptor of real pixels:
    per-channel mean and second moment (6), aspect ratio, log-scale
    size — the shape a learned encoder's output occupies, computed
    without one."""
    import math
    w, h, px = img
    n = w * h
    feats = []
    for c in range(3):
        ch = px[c::3]
        s = sum(ch)
        s2 = sum(b * b for b in ch)
        feats.append(s / (255.0 * n))
        feats.append(s2 / (255.0 * 255.0 * n))
    feats.append(w / float(w + h))
    feats.append(min(1.0, math.log1p(n) / 20.0))
    return (feats + [0.0] * dim)[:dim]
