"""Pure-Python GIF codec (stdlib + numpy — no Pillow/giflib).

Decode scope: GIF87a/GIF89a — ``decode_gif`` returns the first frame
(training pipelines treat a GIF as one image), ``decode_gif_frames``
returns COMPOSITED animation frames with GIF89a graphic-control
semantics (transparency masking, disposal modes 0-3), bounded by
``max_frames``.  Logical screen descriptor, global/local color
tables, variable-width LZW decompression (clear/EOI codes, dictionary
growth to 12 bits), 4-pass interlacing.  A malformed stream raises
ValueError, never a silent fake.

Encode scope: single-frame GIF89a (``encode_gif``, power-of-two
palette built from the image, ≤256 distinct colors, optional
interlacing) and multi-frame animations (``encode_gif_animation``,
sub-rectangle patches + transparency + disposal — the test harness
for the frame decoder), real LZW compression.

Public spec: the GIF89a specification (CompuServe, 1990) and the
standard LZW variable-code-width procedure it defines.  No
counterpart in the reference (tabular only) — this extends the
project-brief multimodal surface (media.py), shrinking the Pillow
gate to TIFF/WebP and the exotic JPEG frame types.

Exactness: GIF is lossless over palette indices, so
``decode_gif(encode_gif(img))`` is pixel-exact whenever the image has
≤256 distinct colors — the q_media_decode_gif oracle recomputes the
synthetic palette raster from doc_id alone (same construction as the
PNG/BMP queries).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif", "decode_gif_frames",
           "encode_gif_animation"]


# ------------------------------------------------------------------- decoder

class _LZWReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def code(self, width: int):
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None                       # truncated stream
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW → palette indices (uint8)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LZWReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev = None
    while n_out < n_pixels:
        c = rd.code(width)
        if c is None or c == eoi:
            break
        if c == clear:
            table, width = reset()
            prev = None
            continue
        if c < len(table):
            entry = table[c]
        elif c == len(table) and prev is not None:
            entry = prev + prev[:1]               # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {c} beyond "
                             f"table of {len(table)})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError(f"LZW stream ended at {n_out}/{n_pixels} pixels")
    return out


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo the GIF 4-pass row interleave."""
    img = idx.reshape(h, w)
    out = np.empty_like(img)
    rows = (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))
    for src, dst in enumerate(rows):
        out[dst] = img[src]
    return out


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF87a/89a → (H, W, 3) uint8 RGB (first frame, composited onto
    the logical screen's background when smaller)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, bg, _ = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(blob):
        b = blob[pos]
        pos += 1
        if b == 0x3B:                             # trailer
            break
        if b == 0x21:                             # extension
            label = blob[pos]
            pos += 1
            # graphic control: honor the transparent index so the first
            # frame matches decode_gif_frames (and Pillow) on real
            # transparent GIFs instead of rendering the palette color
            if label == 0xF9 and blob[pos] >= 4:
                gflags = blob[pos + 1]
                transparent = blob[pos + 4] if gflags & 1 else None
            while blob[pos]:
                pos += 1 + blob[pos]              # sub-blocks
            pos += 1                              # terminator
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:                         # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = blob[pos]
        pos += 1
        chunks = []
        while blob[pos]:
            ln = blob[pos]
            chunks.append(blob[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, h * w)
        img = (_deinterlace(idx, h, w) if iflags & 0x40
               else idx.reshape(h, w))
        if int(img.max()) >= len(ct):
            raise ValueError("palette index out of range")
        frame = ct[img]                           # (h, w, 3)
        bg_rgb = ct[min(bg, len(ct) - 1)]
        if transparent is not None:
            frame = frame.copy()
            frame[img == transparent] = bg_rgb    # composite onto background
        if (left, top, w, h) == (0, 0, sw, sh):
            return frame
        screen = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
        screen[top:top + h, left:left + w] = frame
        return screen
    raise ValueError("GIF contains no image data")


# ------------------------------------------------------------------- encoder

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-width LZW over palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        return {bytes([i]): i for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for v in indices.tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # widen when the NEXT code to assign no longer fits
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, width = reset()
            next_code = eoi + 1
        run = bytes([v])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px: np.ndarray, *, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB with ≤256 distinct colors → GIF89a bytes."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors — GIF needs a "
                         "≤256-color palette (quantize first)")
    depth = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2)))
        idx = idx[rows]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    min_code = max(2, depth)
    out += bytes([min_code])
    data = _lzw_encode(idx.reshape(-1), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif_frames(blob: bytes, max_frames: int = 64):
    """GIF87a/89a animation → list of composited (H, W, 3) uint8 RGB
    frames (GIF89a §23: graphic-control disposal + transparency).

    Compositing semantics per frame: the image block's rectangle is
    drawn onto the current canvas, skipping pixels equal to the GCE's
    transparent index; after a frame is EMITTED, disposal runs —
    0/1 leave the canvas, 2 restores the frame rectangle to the
    background color, 3 restores the canvas as it was before the
    frame.  Frames beyond ``max_frames`` are ignored (bounded work —
    animations can carry thousands)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, bg, _ = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (gct[min(bg, len(gct) - 1)] if gct is not None
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames = []
    transparent = None
    disposal = 0
    while pos < len(blob):
        b = blob[pos]
        pos += 1
        if b == 0x3B:                             # trailer
            break
        if b == 0x21:                             # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:                     # graphic control
                sz = blob[pos]
                gflags = blob[pos + 1]
                disposal = (gflags >> 2) & 0x7
                transparent = blob[pos + 4] if gflags & 1 else None
                pos += 1 + sz
            else:
                while blob[pos]:
                    pos += 1 + blob[pos]
            pos += 1                              # terminator
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = blob[pos]
        pos += 1
        chunks = []
        while blob[pos]:
            ln = blob[pos]
            chunks.append(blob[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        if len(frames) >= max_frames:
            transparent, disposal = None, 0
            continue                              # walk on, don't decode
        idx = _lzw_decode(b"".join(chunks), min_code, h * w)
        img = (_deinterlace(idx, h, w) if iflags & 0x40
               else idx.reshape(h, w))
        if int(img.max()) >= len(ct):
            raise ValueError("palette index out of range")
        before = canvas[top:top + h, left:left + w].copy()
        region = ct[img]
        if transparent is not None:
            keep = img == transparent
            region = np.where(keep[:, :, None], before, region)
        canvas[top:top + h, left:left + w] = region
        frames.append(canvas.copy())
        if disposal == 2:                         # restore background
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:                       # restore previous
            canvas[top:top + h, left:left + w] = before
        transparent, disposal = None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def encode_gif_animation(frames, *, rects=None, transparents=None,
                         disposals=None) -> bytes:
    """Full-canvas first frame + optional sub-rect update frames →
    GIF89a animation bytes (test harness for decode_gif_frames).

    ``frames``: list of (H, W, 3) arrays — frame 0 sets the canvas
    size; later entries may be smaller patches placed via ``rects``
    [(left, top), ...].  ``transparents``: per-frame palette VALUE
    (an (r, g, b) tuple) to mark transparent, or None.  All frames
    share one global palette built from every pixel plus the
    background."""
    base = frames[0]
    sh, sw = base.shape[:2]
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, _ = np.unique(allpx, axis=0, return_inverse=True)
    if len(colors) > 255:
        raise ValueError("animation needs a ≤255-color global palette")
    lut = {tuple(int(x) for x in c): i for i, c in enumerate(colors)}
    depth = max(1, int(len(colors)).bit_length())  # reserve one extra slot
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, depth)
    for fi, f in enumerate(frames):
        left, top = (0, 0) if rects is None or rects[fi] is None \
            else rects[fi]
        h, w = f.shape[:2]
        tr = None if transparents is None else transparents[fi]
        disp = 0 if disposals is None else disposals[fi]
        if tr is not None or disp:
            t_idx = lut[tuple(int(x) for x in tr)] if tr is not None else 0
            gflags = (disp & 0x7) << 2 | (1 if tr is not None else 0)
            out += bytes([0x21, 0xF9, 4, gflags, 0, 0, t_idx, 0])
        out += b"\x2C" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([min_code])
        idx = np.vectorize(lambda r, g, b: lut[(int(r), int(g), int(b))],
                           otypes=[np.uint8])(f[..., 0], f[..., 1],
                                              f[..., 2])
        data = _lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
