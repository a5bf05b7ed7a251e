"""Pure-Python baseline TIFF codec (stdlib + numpy — no libtiff/Pillow).

Decode scope: baseline + extension TIFF 6.0 still images, both byte
orders (II and MM) — 8-bit AND 16-bit grayscale / RGB / RGBA (alpha
dropped) / palette-color, strip-based AND tiled storage (tags 322-325,
edge tiles cropped per §15), Compression 1 (none), 5 (TIFF-LZW:
MSB-first packing, 9→12-bit codes with the spec's EARLY code-width
change), 8 / 32946 (Adobe/legacy Deflate via stdlib zlib) and 32773
(PackBits RLE), horizontal-differencing Predictor (tag 317 = 2, applied
per independently-compressed segment, 8- or 16-bit arithmetic),
multiple strips, white-is-zero inversion.  16-bit rasters fold to the
8-bit RGB output contract via the high byte (``>> 8``) — the exact
inverse of the encoder's ``v * 257`` widening, so 16-bit round-trips
stay pixel-exact.  Planar configuration 2 (plane-major strip table,
one sample per strip pixel) decodes for strip storage.  The FIRST IFD
only (a multi-page TIFF decodes its first page — same convention as
the GIF first-frame rule).  Tiled-planar and JPEG-in-TIFF raise with
a clear message.

Encode scope: single-strip / multi-strip / tiled / planar 8- or 16-bit
RGB/gray, either byte order, none/LZW/Deflate/PackBits compression,
optional horizontal predictor — a test harness proving the decoder
without Pillow (TIFF is lossless, so round-trips are pixel-exact;
16-bit mode widens 8-bit input by ``v * 257`` so decode's ``>> 8``
restores it).

Public spec: the TIFF 6.0 specification (Adobe, 1992) — IFD layout
from §2, PackBits from §9, LZW incl. early change from §13, predictor
from §14, tiles from §15 — plus the Adobe PageMaker TIFF tech notes
for Deflate compression codes 8/32946.  No counterpart in the
reference (tabular only); extends the project-brief multimodal
surface, leaving only lossy-VP8 WebP and the exotic JPEG frame types
behind the Pillow gate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_tiff", "decode_tiff"]

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP = 262, 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR, _PREDICTOR = 278, 279, 284, 317
_COLORMAP, _EXTRA = 320, 338
_TILE_W, _TILE_L, _TILE_OFFSETS, _TILE_COUNTS = 322, 323, 324, 325

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
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise ValueError(f"{bits}-bit TIFF unsupported (8/16-bit only)")
    bps = bits[0]
    comp = one(_COMPRESSION, 1)
    photo = one(_PHOTOMETRIC)
    pred = one(_PREDICTOR, 1)
    planar = one(_PLANAR, 1)
    if planar not in (1, 2):
        raise ValueError(f"planar configuration {planar} invalid")
    if comp not in (1, 5, 8, 32946, 32773):
        kind = {6: "JPEG-in-TIFF", 7: "JPEG-in-TIFF",
                2: "CCITT", 3: "CCITT", 4: "CCITT"}.get(
                    comp, f"compression {comp}")
        raise ValueError(
            f"{kind} TIFF unsupported (none/LZW/Deflate/PackBits only)")

    # sample dtype follows the file byte order; predictor arithmetic is
    # modulo 2^bps per the spec (§14 extends verbatim to 16-bit samples)
    dt = np.dtype(e + ("u2" if bps == 16 else "u1"))
    native = np.uint16 if bps == 16 else np.uint8

    def segment(raw: bytes, rows: int, cols: int,
                ncomp: int = spp) -> np.ndarray:
        """One independently-compressed strip/tile → (rows, cols,
        ncomp) — ncomp is 1 for planar-configuration-2 strips, which
        carry a single sample per pixel."""
        want = rows * cols * ncomp * (bps // 8)
        if comp == 1:
            s = raw[:want]
            if len(s) < want:
                raise ValueError("TIFF segment short")
        elif comp == 5:
            s = _lzw_decode_tiff(raw, want)
        elif comp in (8, 32946):
            s = zlib.decompress(raw)
            if len(s) < want:
                raise ValueError("TIFF Deflate segment short")
            s = s[:want]
        else:
            s = _packbits_decode(raw, want)
        a = np.frombuffer(s, dtype=dt).reshape(rows, cols, ncomp)
        if pred == 2:                      # horizontal differencing
            a = (np.cumsum(a.astype(np.int64), axis=1)
                 & ((1 << bps) - 1)).astype(native)
        return a.astype(native)

    if planar == 2:                        # one plane per sample (§ "Planar
        if _TILE_OFFSETS in tags:          # Configuration"): strip table is
            raise ValueError(              # plane-major, 1 sample/strip-px
                "tiled planar-configuration TIFF unsupported")
        offsets = tags.get(_STRIP_OFFSETS)
        counts = tags.get(_STRIP_COUNTS)
        if offsets is None or counts is None:
            raise ValueError("planar TIFF missing strip tables")
        rps = one(_ROWS_PER_STRIP, h)
        spl = -(-h // rps)                 # strips per plane
        if len(offsets) < spl * spp or len(counts) < spl * spp:
            raise ValueError("planar TIFF strip table short")
        pl = []
        for pi in range(spp):
            parts = []
            for si in range(spl):
                k = pi * spl + si
                rows = min(rps, h - si * rps)
                parts.append(segment(blob[offsets[k]:offsets[k] + counts[k]],
                                     rows, w, 1))
            pl.append(np.concatenate(parts, axis=0) if len(parts) > 1
                      else parts[0])
        arr = np.concatenate(pl, axis=2)
    elif _TILE_OFFSETS in tags:            # tiled storage (§15)
        tw, tl = one(_TILE_W), one(_TILE_L)
        offsets = tags[_TILE_OFFSETS]
        counts = tags.get(_TILE_COUNTS)
        if counts is None:
            raise ValueError("tiled TIFF missing TileByteCounts")
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) < across * down or len(counts) < across * down:
            raise ValueError("TIFF tile table short")
        arr = np.zeros((h, w, spp), dtype=native)
        for ti in range(down):
            for tj in range(across):
                k = ti * across + tj
                t = segment(blob[offsets[k]:offsets[k] + counts[k]], tl, tw)
                rr = min(tl, h - ti * tl)  # edge tiles: decode full
                cc = min(tw, w - tj * tw)  # tile, crop the padding
                arr[ti * tl:ti * tl + rr,
                    tj * tw:tj * tw + cc] = t[:rr, :cc]
    else:
        offsets = tags.get(_STRIP_OFFSETS)
        if offsets is None:
            raise ValueError("TIFF missing StripOffsets")
        counts = tags.get(_STRIP_COUNTS, [len(blob) - offsets[0]])
        rps = one(_ROWS_PER_STRIP, h)
        parts = []
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - si * rps)
            parts.append(segment(blob[so:so + sc], rows, w))
        arr = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        if arr.shape[0] != h:              # strip table shorter than the
            raise ValueError("TIFF strip data short")   # image: fail loud

    def fold8(a: np.ndarray) -> np.ndarray:
        # 16-bit → 8-bit via the high byte: exact inverse of the
        # encoder's v*257 widening (257*v >> 8 == v for v in 0..255)
        return (a >> 8).astype(np.uint8) if bps == 16 else a.astype(np.uint8)

    if photo == 3:                         # palette
        if bps != 8:
            raise ValueError("16-bit palette TIFF unsupported")
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
            g = ((1 << bps) - 1) - g
        g = fold8(g)
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(fold8(arr[:, :, :3]))  # drop alpha
    raise ValueError(f"photometric {photo} TIFF unsupported")


# ------------------------------------------------------------------ encode

def encode_tiff(px: np.ndarray, *, compression: str = "none",
                byte_order: str = "II", predictor: bool = False,
                rows_per_strip: int | None = None,
                grayscale: bool = False, bits: int = 8,
                tile: tuple[int, int] | None = None,
                planar: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → TIFF bytes.  ``compression`` in
    none/lzw/deflate/packbits; ``predictor`` applies horizontal
    differencing per independently-compressed segment; multi-strip when
    ``rows_per_strip`` is set; ``tile=(tw, tl)`` switches to tiled
    storage (§15 — dimensions should be multiples of 16, edge tiles
    zero-padded); ``bits=16`` widens samples by ``v * 257`` so the
    decoder's high-byte fold restores the input exactly; ``planar``
    writes PlanarConfiguration 2 (plane-major strips, one sample per
    strip pixel — strip storage only)."""
    if compression not in ("none", "lzw", "deflate", "packbits"):
        raise ValueError(f"unknown compression {compression!r}")
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    if tile is not None and rows_per_strip is not None:
        raise ValueError("tile and rows_per_strip are exclusive")
    if planar and tile is not None:
        raise ValueError("planar and tile are exclusive")
    e = {"II": "<", "MM": ">"}[byte_order]
    h, w = px.shape[:2]
    if grayscale:
        data = np.round(0.299 * px[..., 0] + 0.587 * px[..., 1]
                        + 0.114 * px[..., 2]).astype(np.uint8)[:, :, None]
        spp, photo = 1, 1
    else:
        data, spp, photo = px, 3, 2
    if bits == 16:
        data = data.astype(np.uint16) * 257    # 0xAB -> 0xABAB
    sample_dt = np.dtype(e + ("u2" if bits == 16 else "u1"))

    def pack_segment(seg: np.ndarray) -> bytes:
        """Predictor + serialization + compression for ONE segment —
        predictor state must not leak across strip/tile boundaries."""
        if predictor:
            d = seg.astype(np.int64)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            seg = (d & ((1 << bits) - 1)).astype(
                np.uint16 if bits == 16 else np.uint8)
        raw = seg.astype(sample_dt).tobytes()
        if compression == "none":
            return raw
        if compression == "lzw":
            return _lzw_encode_tiff(raw)
        if compression == "deflate":
            return zlib.compress(raw, 6)
        return _packbits_encode(raw)

    segments = []
    if tile is not None:
        tw, tl = tile
        for r0 in range(0, h, tl):
            for c0 in range(0, w, tw):
                t = np.zeros((tl, tw, spp), data.dtype)
                blk = data[r0:r0 + tl, c0:c0 + tw]
                t[:blk.shape[0], :blk.shape[1]] = blk
                segments.append(pack_segment(t))
    elif planar and spp > 1:
        rps = rows_per_strip or h
        for pi in range(spp):                  # plane-major strip order
            plane = data[:, :, pi:pi + 1]
            for r0 in range(0, h, rps):
                segments.append(pack_segment(plane[r0:r0 + rps]))
    else:
        rps = rows_per_strip or h
        for r0 in range(0, h, rps):
            segments.append(pack_segment(data[r0:r0 + rps]))

    entries = []                           # (tag, type, count, value-int)

    def ent(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    comp_id = {"none": 1, "lzw": 5, "deflate": 8,
               "packbits": 32773}[compression]
    ent(_WIDTH, 4, 1, w)
    ent(_LENGTH, 4, 1, h)
    ent(_COMPRESSION, 3, 1, comp_id)
    ent(_PHOTOMETRIC, 3, 1, photo)
    ent(_SPP, 3, 1, spp)
    if tile is not None:
        ent(_TILE_W, 4, 1, tile[0])
        ent(_TILE_L, 4, 1, tile[1])
        off_tag, cnt_tag = _TILE_OFFSETS, _TILE_COUNTS
    else:
        ent(_ROWS_PER_STRIP, 4, 1, rows_per_strip or h)
        off_tag, cnt_tag = _STRIP_OFFSETS, _STRIP_COUNTS
    if planar and spp > 1:
        ent(_PLANAR, 3, 1, 2)
    if predictor:
        ent(_PREDICTOR, 3, 1, 2)

    # layout: header(8) + IFD + overflow area + segment data
    n_fix = len(entries) + 3               # + BITS + offsets + counts
    ifd_size = 2 + 12 * n_fix + 4
    over = bytearray()
    over_base = 8 + ifd_size

    def overflow(fmt_vals: bytes) -> int:
        off = over_base + len(over)
        over.extend(fmt_vals)
        return off

    if spp == 3:
        bits_off = overflow(struct.pack(e + "HHH", bits, bits, bits))
        ent(_BITS, 3, 3, bits_off)
    else:
        ent(_BITS, 3, 1, bits)
    n_seg = len(segments)
    if n_seg == 1:
        entries.append((off_tag, 4, 1, None))      # patched below
        entries.append((cnt_tag, 4, 1, len(segments[0])))
        seg_table_off = None
    else:
        seg_table_off = overflow(bytes(4 * n_seg))   # placeholder
        cnt_off = overflow(struct.pack(e + "I" * n_seg,
                                       *[len(s) for s in segments]))
        ent(off_tag, 4, n_seg, seg_table_off)
        ent(cnt_tag, 4, n_seg, cnt_off)

    data_base = over_base + len(over)
    seg_offs = []
    p = data_base
    for s in segments:
        seg_offs.append(p)
        p += len(s)
    if n_seg == 1:
        entries = [(t, ty, c, seg_offs[0] if t == off_tag else v)
                   for t, ty, c, v in entries]
    else:
        struct.pack_into(e + "I" * n_seg, over,
                         seg_table_off - over_base, *seg_offs)

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
    for s in segments:
        out += s
    return bytes(out)
