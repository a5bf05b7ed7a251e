"""Pure-Python baseline TIFF codec (stdlib + numpy — no libtiff/Pillow).

Decode scope: baseline TIFF 6.0 still images, both byte orders (II and
MM) — 8-bit grayscale / RGB / RGBA (alpha dropped) / palette-color,
strip-based storage, Compression 1 (none), 5 (TIFF-LZW: MSB-first
packing, 9→12-bit codes with the spec's EARLY code-width change) and
32773 (PackBits RLE), horizontal-differencing Predictor (tag 317 = 2),
multiple strips, white-is-zero inversion.  The FIRST IFD only (a
multi-page TIFF decodes its first page — same convention as the GIF
first-frame rule).  Tiled TIFFs, 16-bit samples, planar configuration
2, and JPEG-in-TIFF raise with a clear message.

Encode scope: single-strip or multi-strip 8-bit RGB/gray, either byte
order, none/LZW/PackBits compression, optional horizontal predictor —
a test harness proving the decoder without Pillow (TIFF is lossless,
so round-trips are pixel-exact).

Public spec: the TIFF 6.0 specification (Adobe, 1992) — IFD layout
from §2, PackBits from §9, LZW incl. early change from §13, predictor
from §14.  No counterpart in the reference (tabular only); extends the
project-brief multimodal surface, leaving only WebP and the exotic
JPEG frame types behind the Pillow gate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tiff", "decode_tiff"]

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP = 262, 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR, _PREDICTOR = 278, 279, 284, 317
_COLORMAP, _EXTRA = 320, 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}   # BYTE ASCII SHORT LONG RATIONAL


# ------------------------------------------------------------------ LZW

def _lzw_decode_tiff(data: bytes, n_bytes: int) -> bytes:
    """TIFF-LZW (§13): MSB-first bit order, Clear=256, EOI=257, code
    width grows at table size 2^w - 1 (the 'early change')."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0

    def code(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        v = (acc >> nbits) & ((1 << width) - 1)
        return v

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = reset()
    prev = None
    while len(out) < n_bytes:
        c = code(width)
        if c is None or c == EOI:
            break
        if c == CLEAR:
            table, width = reset()
            prev = None
            continue
        if c < len(table):
            entry = table[c]
        elif c == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change: widen one code EARLIER than GIF would
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    if len(out) < n_bytes:
        raise ValueError(f"TIFF LZW ended at {len(out)}/{n_bytes} bytes")
    return bytes(out[:n_bytes])


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def reset():
        return {bytes([i]): i for i in range(256)}, 9

    table, width = reset()
    next_code = EOI + 1
    emit(CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # mirror the decoder's early change: the decoder widens when
        # ITS table (one entry behind) reaches 2^w - 1, i.e. when the
        # encoder's next free code reaches 2^w
        if next_code == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                table, width = reset()
                next_code = EOI + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits

def _packbits_decode(data: bytes, n_bytes: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_bytes and i < len(data):
        n = data[i]
        i += 1
        if n < 128:                       # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                     # repeat next byte 257-n times
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < n_bytes:
        raise ValueError("PackBits stream short")
    return bytes(out[:n_bytes])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:                         # a run of equal bytes
            out += bytes([257 - (j - i + 1) & 0xFF, data[i]])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and (j + 2 >= n or data[j + 1] != data[j + 2])
               and j - i < 127):
            j += 1
        out += bytes([j - i]) + data[i:j + 1]
        i = j + 1
    return bytes(out)


# ------------------------------------------------------------------ decode

def decode_tiff(blob: bytes) -> np.ndarray:
    """Baseline TIFF → (H, W, 3) uint8 RGB (first IFD; gray replicated,
    palette applied, alpha dropped)."""
    if blob[:2] == b"II":
        e = "<"
    elif blob[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(e + "HI", blob, 2)
    if magic != 42:
        raise ValueError(f"not a TIFF (magic {magic}, BigTIFF unsupported)")

    n_entries = struct.unpack_from(e + "H", blob, ifd_off)[0]
    tags: dict = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", blob, off)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        voff = off + 8 if size <= 4 else \
            struct.unpack_from(e + "I", blob, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue                       # ASCII/RATIONAL: not needed
        tags[tag] = list(struct.unpack_from(e + fmt * cnt, blob, voff))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(_WIDTH), one(_LENGTH)
    spp = one(_SPP, 1)
    bits = tags.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"{bits}-bit TIFF unsupported (8-bit only)")
    comp = one(_COMPRESSION, 1)
    photo = one(_PHOTOMETRIC)
    if one(_PLANAR, 1) != 1:
        raise ValueError("planar-configuration TIFF unsupported")
    if comp not in (1, 5, 32773):
        kind = {6: "JPEG-in-TIFF", 7: "JPEG-in-TIFF",
                2: "CCITT", 3: "CCITT", 4: "CCITT",
                8: "Deflate", 32946: "Deflate"}.get(comp, f"compression {comp}")
        raise ValueError(f"{kind} TIFF unsupported (none/LZW/PackBits only)")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strips only)")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags.get(_STRIP_COUNTS, [len(blob) - offsets[0]])
    rps = one(_ROWS_PER_STRIP, h)
    row_bytes = w * spp
    raster = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        want = rows * row_bytes
        raw = blob[so:so + sc]
        if comp == 1:
            strip = raw[:want]
            if len(strip) < want:
                raise ValueError("TIFF strip short")
        elif comp == 5:
            strip = _lzw_decode_tiff(raw, want)
        else:
            strip = _packbits_decode(raw, want)
        raster += strip
    arr = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, spp)
    if one(_PREDICTOR, 1) == 2:            # horizontal differencing
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 3:                         # palette
        cm = tags.get(_COLORMAP)
        if cm is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cm) // 3
        pal = (np.array(cm, dtype=np.uint32).reshape(3, n).T // 257) \
            .astype(np.uint8)              # 16-bit colormap → 8-bit
        return pal[arr[:, :, 0]]
    if photo in (0, 1):
        g = arr[:, :, 0]
        if photo == 0:                     # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(arr[:, :, :3])  # drop alpha/extra
    raise ValueError(f"photometric {photo} TIFF unsupported")


# ------------------------------------------------------------------ encode

def encode_tiff(px: np.ndarray, *, compression: str = "none",
                byte_order: str = "II", predictor: bool = False,
                rows_per_strip: int | None = None,
                grayscale: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → baseline TIFF bytes.  ``compression`` in
    none/lzw/packbits; ``predictor`` applies horizontal differencing
    (lzw/packbits paths); multi-strip when ``rows_per_strip`` is set."""
    if compression not in ("none", "lzw", "packbits"):
        raise ValueError(f"unknown compression {compression!r}")
    e = {"II": "<", "MM": ">"}[byte_order]
    h, w = px.shape[:2]
    if grayscale:
        data = np.round(0.299 * px[..., 0] + 0.587 * px[..., 1]
                        + 0.114 * px[..., 2]).astype(np.uint8)[:, :, None]
        spp, photo = 1, 1
    else:
        data, spp, photo = px, 3, 2
    if predictor:
        d = data.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d % 256).astype(np.uint8)
    rps = rows_per_strip or h
    strips = []
    for r0 in range(0, h, rps):
        raw = data[r0:r0 + rps].tobytes()
        strips.append(raw if compression == "none"
                      else _lzw_encode_tiff(raw) if compression == "lzw"
                      else _packbits_encode(raw))

    entries = []                           # (tag, type, count, value-int)

    def ent(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    ent(_WIDTH, 4, 1, w)
    ent(_LENGTH, 4, 1, h)
    ent(_COMPRESSION, 3, 1, comp_id)
    ent(_PHOTOMETRIC, 3, 1, photo)
    ent(_SPP, 3, 1, spp)
    ent(_ROWS_PER_STRIP, 4, 1, rps)
    if predictor:
        ent(_PREDICTOR, 3, 1, 2)

    # layout: header(8) + IFD + overflow area + strip data
    n_fix = len(entries) + 3               # + BITS + offsets + counts
    ifd_size = 2 + 12 * n_fix + 4
    over = bytearray()
    over_base = 8 + ifd_size

    def overflow(fmt_vals: bytes) -> int:
        off = over_base + len(over)
        over.extend(fmt_vals)
        return off

    if spp == 3:
        bits_off = overflow(struct.pack(e + "HHH", 8, 8, 8))
        ent(_BITS, 3, 3, bits_off)
    else:
        ent(_BITS, 3, 1, 8)
    n_strips = len(strips)
    if n_strips == 1:
        off_entry = (_STRIP_OFFSETS, 4, 1, None)   # patched below
        cnt_entry = (_STRIP_COUNTS, 4, 1, len(strips[0]))
        entries.append(off_entry)
        entries.append(cnt_entry)
        strip_table_off = None
    else:
        strip_table_off = overflow(bytes(4 * n_strips))   # placeholder
        cnt_off = overflow(struct.pack(e + "I" * n_strips,
                                       *[len(s) for s in strips]))
        ent(_STRIP_OFFSETS, 4, n_strips, strip_table_off)
        ent(_STRIP_COUNTS, 4, n_strips, cnt_off)

    data_base = over_base + len(over)
    strip_offs = []
    p = data_base
    for s in strips:
        strip_offs.append(p)
        p += len(s)
    if n_strips == 1:
        entries = [(t, ty, c, strip_offs[0] if t == _STRIP_OFFSETS else v)
                   for t, ty, c, v in entries]
    else:
        struct.pack_into(e + "I" * n_strips, over,
                         strip_table_off - over_base, *strip_offs)

    out = bytearray(byte_order.encode())
    out += struct.pack(e + "HI", 42, 8)
    out += struct.pack(e + "H", n_fix)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(e + "HH", val, 0)
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)         # no next IFD
    out += over
    for s in strips:
        out += s
    return bytes(out)
