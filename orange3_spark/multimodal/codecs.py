"""Pure-Python image codecs: uncompressed 24-bit BMP and binary PPM (P6).

The container has no Pillow/libjpeg, so the decode stage of the multimodal
pipeline would otherwise never produce a checked pixel.  BMP and PPM are
fully specified, compression-free formats decodable with stdlib ``struct``
+ numpy — enough to make ``decode_image`` REAL end-to-end (header parse,
row padding, bottom-up row order, BGR→RGB) while JPEG/PNG stay behind the
Pillow gate.  No counterpart in the reference (tabular only); formats per
the public BMP file format (BITMAPINFOHEADER) and netpbm P6 specs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_bmp", "encode_bmp", "decode_ppm", "encode_ppm",
           "decode_any"]


def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP bytes (rows stored
    bottom-up, BGR, 4-byte padded — the format's canonical layout)."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):           # bottom-up
        row = px[y, :, ::-1].tobytes()        # RGB → BGR
        body += row + pad
    return head + dib + bytes(body)


def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8 RGB."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    off = struct.unpack_from("<I", blob, 10)[0]
    dib_size = struct.unpack_from("<I", blob, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: compression={comp} bpp={bpp}")
    flip = h > 0                              # positive height = bottom-up
    h = abs(h)
    step = bpp // 8
    row_len = (w * step + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8,
                         count=row_len * h, offset=off)
    rows = rows.reshape(h, row_len)[:, :w * step].reshape(h, w, step)
    rgb = rows[:, :, 2::-1]                   # BGR(A) → RGB
    if flip:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_ppm(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_ppm expects (H, W, 3) RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 RGB.  Header
    tokens may be separated by any whitespace/comments per the spec."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1                                   # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def decode_any(blob: bytes) -> np.ndarray:
    """Dispatch on magic bytes: BMP and PPM decode here; anything else
    raises (callers fall back to Pillow or the honest gate)."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    raise ValueError("no pure-Python decoder for this format")
