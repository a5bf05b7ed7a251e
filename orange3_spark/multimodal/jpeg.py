"""Pure-Python JPEG codec (stdlib + numpy — no libjpeg/Pillow).

Decode scope (round 8 — the r7 "baseline-only" gate is gone; round 10
adds LOSSLESS): 8-bit huffman DCT JPEG in ALL its common shapes —
baseline/extended sequential (SOF0/SOF1) and PROGRESSIVE (SOF2) scans,
any integer chroma sampling factors (4:4:4, 4:2:2, 4:2:0, 4:1:1 ...),
restart intervals, spectral selection + successive approximation per
T.81 Annex G, 8-bit AND 12-BIT sample precision (extended sequential
SOF1 / progressive SOF2 with 16-bit DQT entries, level shift 2^11,
high-bit fold to the 8-bit output contract) — plus LOSSLESS (SOF3)
frames per Annex H: huffman-coded prediction differences, all seven
predictors, point transform, 2-16 bit precision (the DNG/medical-
imaging shape).  What stays gated (loud ValueError, never a silent
fake): arithmetic coding (needs the QM-coder Qe table, unavailable
offline — the VP8-tables rationale), hierarchical frames, CMYK
(4-component) — genuinely exotic in web corpora, unlike
progressive/4:2:0 which dominate real crawls.

Encode scope: grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling, baseline or progressive (the standard 4-kind scan
script: DC first, per-component AC first, DC refine, AC refine),
optional restart intervals.  The encoder exists so the decoder is
testable WITHOUT Pillow in this container: progressive encode of the
same quantized coefficients must decode bit-identically to the
baseline encode (pytest-pinned coefficient round-trips), and the
DC-only exactness constructions below make decoded pixels integers a
SQL oracle recomputes from ids alone.

Public spec: ITU-T T.81 — quantization/huffman tables from Annex K,
progressive coding procedures from Annex G (the successive-
approximation control flow mirrors the spec's flowcharts, which
libjpeg also implements), the libjpeg quality→scale convention for
tables, JFIF YCbCr equations.  Chroma upsampling is pixel
replication (nearest), the JFIF default.  No counterpart in the
reference (tabular only).

Exactness notes for the oracle-checked queries:

* q_media_decode_jpeg (baseline, gray): a block whose ONLY nonzero
  frequency is DC decodes to a mathematically flat block —
  pixel = DC·q₀/8 + 128 — an exact integer when DC·q₀ ≡ 0 (mod 8).
* q_media_decode_jpeg_prog: the same DC-only coefficients shipped
  through the full progressive scan script (DC Al=1 first scan +
  refine, AC scans as pure EOB runs) must land on the same integers.
* q_media_decode_jpeg420: at quality 76 both Annex-K q₀ scale to
  exactly 8, so a gray image flat per 8×8 block survives
  RGB→YCbCr→box-downsample→DCT→quantize→decode EXACTLY (chroma DC
  quantizes to 0, luma DC to v−128), pinning MCU interleave order,
  per-component DC prediction, restart resets, and 2×2 upsampling.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "jpeg_sof"]

# ---------------------------------------------------------- constant tables

#: zigzag scan order (T.81 Figure 5): zigzag index -> raster index
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

#: Annex K base quantization tables
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

#: Annex K huffman specs: (BITS count-per-length 1..16, HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

#: AC huffman table for progressive scans: Annex K's sequential tables
#: lack the EOBn symbols (r<<4, r=1..14) Annex G scans emit, so the
#: encoder ships a complete flat table — all 176 possible progressive
#: AC symbols at 8 bits (Kraft sum 176/256 < 1, a valid canonical
#: code).  Bigger output than an optimized table, but decode-exact.
PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
           [(r << 4) | s for r in range(16) for s in range(11)])

#: Flat tables for 12-bit encode (correctness over compression, same
#: rationale as PROG_AC): every legal 12-bit DC category (0..15) at 5
#: bits (Kraft 16/32), every legal AC (run, size) symbol — sizes 0..14,
#: the size-0 row covering EOBn/ZRL — at 9 bits (Kraft 240/512).  The
#: slack guarantees no all-ones canonical code.
DC12 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        list(range(16)))
AC12 = ([0, 0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0],
        sorted((r << 4) | s for r in range(16) for s in range(15)))

_SUBSAMPLING = {            # name -> (Y_h, Y_v); chroma is always 1x1
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
    "411": (4, 1),
}


def _dct_matrix() -> np.ndarray:
    """8×8 orthonormal DCT-II matrix C: dct(x) = C @ x, idct(F) = Cᵀ @ F."""
    C = np.zeros((8, 8))
    for k in range(8):
        for x in range(8):
            C[k, x] = np.cos((2 * x + 1) * k * np.pi / 16)
    C *= np.sqrt(2.0 / 8.0)
    C[0] *= 1.0 / np.sqrt(2.0)
    return C

_C = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: 1..100 → scaled Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255)


def _build_huffman(bits, vals):
    """Canonical huffman per T.81 Annex C → {symbol: (code, length)}."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(mincode, maxcode, valptr) decode tables per T.81 F.2.2.3."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:                      # byte stuffing
                self.out.append(0x00)

    def restart(self, m: int) -> None:
        """1-pad to a byte boundary, then an unstuffed RSTm marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF   # pad past the end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0x00
                if nxt == 0x00:
                    self.pos += 1              # unstuff
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside an "
                        "entropy chunk")
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


def _magnitude(v: int):
    """(category, raw bits) for a DC diff / AC value (T.81 F.1.2.1)."""
    size, a = 0, abs(v)
    while a:
        size += 1
        a >>= 1
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ geometry

def _geometry(h: int, w: int, factors):
    """MCU/block geometry for components with sampling ``factors``
    [(hi, vi), ...]: full (MCU-padded) block grid and the USED block
    grid non-interleaved scans cover (T.81 A.2.2/A.2.3)."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    for hi, vi in factors:
        if hmax % hi or vmax % vi:
            raise ValueError(
                f"non-integer sampling ratio {hi}x{vi} vs {hmax}x{vmax} "
                "unsupported")
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    comps = []
    for hi, vi in factors:
        cw = -(-(w * hi) // hmax)          # used pixel dims of this plane
        ch = -(-(h * vi) // vmax)
        comps.append({"h": hi, "v": vi, "bw": mx * hi, "bh": my * vi,
                      "ubw": -(-cw // 8), "ubh": -(-ch // 8),
                      "cw": cw, "ch": ch})
    return hmax, vmax, mx, my, comps


def _split_entropy(blob: bytes, pos: int):
    """Entropy-coded bytes from ``pos`` split at RSTn markers.
    Returns (chunks, offset-of-next-true-marker)."""
    chunks, start, i, n = [], pos, pos, len(blob)
    while i < n:
        if blob[i] != 0xFF:
            i += 1
            continue
        nxt = blob[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            i += 2                         # stuffed data byte
        elif 0xD0 <= nxt <= 0xD7:
            chunks.append(blob[start:i])   # restart boundary
            i += 2
            start = i
        else:
            break                          # a real marker ends the scan
    chunks.append(blob[start:i])
    return chunks, i


# ------------------------------------------------------------------- encoder

class _SeqWriter:
    """Baseline sequential block writer (DC diff + AC run-length)."""

    def __init__(self, bw, dc_codes, ac_codes):
        self.bw, self.dc, self.ac = bw, dc_codes, ac_codes

    def block(self, zz, tid: int, pred: int) -> int:
        bw = self.bw
        diff = int(zz[0]) - pred
        size, raw = _magnitude(diff)
        code, ln = self.dc[tid][size]
        bw.write(code, ln)
        if size:
            bw.write(raw, size)
        run = 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = self.ac[tid][0xF0]                 # ZRL
                bw.write(code, ln)
                run -= 16
            size, raw = _magnitude(v)
            code, ln = self.ac[tid][(run << 4) | size]
            bw.write(code, ln)
            bw.write(raw, size)
            run = 0
        if run:
            code, ln = self.ac[tid][0x00]                     # EOB
            bw.write(code, ln)
        return int(zz[0])


class _ACFirstWriter:
    """Progressive AC first scan (Ah=0) with EOB-run coding
    (T.81 G.1.2.2)."""

    def __init__(self, bw, codes, ss, se, al):
        self.bw, self.codes = bw, codes
        self.ss, self.se, self.al = ss, se, al
        self.eobrun = 0

    def _sym(self, s):
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def _flush_eobrun(self):
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self._sym(nb << 4)
            if nb:
                self.bw.write(self.eobrun & ((1 << nb) - 1), nb)
            self.eobrun = 0

    def block(self, zz):
        r = 0
        for k in range(self.ss, self.se + 1):
            v = int(zz[k])
            a = abs(v) >> self.al
            if a == 0:
                r += 1
                continue
            while r > 15:
                self._flush_eobrun()
                self._sym(0xF0)                               # ZRL
                r -= 16
            self._flush_eobrun()
            size, raw = _magnitude(a if v > 0 else -a)
            self._sym((r << 4) | size)
            self.bw.write(raw, size)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eobrun()

    def finish(self):
        self._flush_eobrun()


class _ACRefineWriter:
    """Progressive AC refinement scan (Ah=Al+1) — newly-significant
    coefficients run-length coded, history coefficients as buffered
    correction bits that ride with the pending EOB run
    (T.81 G.1.2.3)."""

    def __init__(self, bw, codes, ss, se, al):
        self.bw, self.codes = bw, codes
        self.ss, self.se, self.al = ss, se, al
        self.eobrun = 0
        self.be_bits: list = []            # correction bits of the EOB run

    def _sym(self, s):
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def _drain(self, bits):
        for b in bits:
            self.bw.write(b, 1)
        bits.clear()

    def _flush_eobrun(self):
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self._sym(nb << 4)
            if nb:
                self.bw.write(self.eobrun & ((1 << nb) - 1), nb)
            self.eobrun = 0
        self._drain(self.be_bits)

    def block(self, zz):
        ss, se, al = self.ss, self.se, self.al
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        eob = -1                           # last newly-significant index
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        br: list = []                      # this block's correction bits
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self._flush_eobrun()
                self._sym(0xF0)                               # ZRL
                r -= 16
                self._drain(br)
            if t > 1:                      # history coefficient
                br.append(t & 1)
                continue
            self._flush_eobrun()           # newly significant
            self._sym((r << 4) | 1)
            self.bw.write(0 if vals[i] < 0 else 1, 1)
            self._drain(br)
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be_bits.extend(br)
            if self.eobrun == 0x7FFF or len(self.be_bits) > 900:
                self._flush_eobrun()

    def finish(self):
        self._flush_eobrun()


def _planes_to_zz(planes, qts, geom, level: float = 128.0):
    """Pad each plane to its full block grid, batched DCT + quantize,
    return per-component zigzag-ordered int32 (bh, bw, 64) arrays.
    ``level`` is the A.3.1 shift — 2^(P-1) for P-bit frames."""
    _, _, _, _, comps = geom
    out = []
    for plane, qt, c in zip(planes, qts, comps):
        ph, pw = c["bh"] * 8, c["bw"] * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        b = p.reshape(c["bh"], 8, c["bw"], 8).transpose(0, 2, 1, 3) - level
        Fq = np.einsum("ab,yxbc,cd->yxad", _C, b, _C.T)
        q = np.round(Fq / qt.reshape(8, 8)).astype(np.int32)
        out.append(q.reshape(c["bh"], c["bw"], 64)[..., ZIGZAG])
    return out


def _box_down(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """fx×fy box-mean downsample with edge padding to full boxes."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    H2, W2 = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, H2 - h), (0, W2 - w)), mode="edge")
    return p.reshape(H2 // fy, fy, W2 // fx, fx).mean(axis=(1, 3))


def encode_jpeg(px: np.ndarray, quality: int = 90, *,
                grayscale: bool = False,
                coeffs: "np.ndarray | None" = None,
                subsampling: str = "444",
                progressive: bool = False,
                restart_interval: int = 0,
                precision: int = 8) -> bytes:
    """(H, W, 3) uint8 RGB → JFIF bytes.

    ``grayscale=True`` encodes one luminance component.
    ``subsampling`` is one of 444/422/420/411 (chroma box-mean
    downsample; ignored for grayscale).  ``progressive=True`` emits a
    SOF2 frame with the standard successive-approximation scan script
    (DC first Al=1 → per-component AC first Al=1 → DC refine → AC
    refine), exercising every Annex-G scan kind.  ``restart_interval``
    inserts RSTn markers every n MCUs (baseline only).  ``coeffs``
    (test/oracle hook) bypasses the forward DCT: an (n_blocks_y,
    n_blocks_x, 8, 8) int array of ALREADY-QUANTIZED luminance
    coefficients to entropy-code directly (grayscale only) — this is
    how the DC-only exactness constructions of q_media_decode_jpeg and
    q_media_decode_jpeg_prog build blobs whose decode is
    integer-predictable.

    ``precision=12`` writes a 12-bit frame (extended sequential SOF1,
    or SOF2 when progressive): 8-bit input widens by ``v * 16``
    (decode folds by ``>> 4``), quant tables ship as 16-bit DQT
    entries, and the flat DC12/AC12 tables cover the wider category
    range.  ``coeffs`` are interpreted against the 12-bit dequant/
    level-shift when set."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError("restart intervals supported for baseline "
                         "encode only")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)

    if coeffs is not None:
        grayscale = True
        by, bx = coeffs.shape[:2]
        h, w = by * 8, bx * 8
        factors = [(1, 1)]
        geom = _geometry(h, w, factors)
        raster = coeffs.reshape(by, bx, 64)
        zzs = [raster[..., ZIGZAG].astype(np.int32)]
    else:
        h, w = px.shape[:2]
        if grayscale:
            factors = [(1, 1)]
        else:
            yh, yv = _SUBSAMPLING[subsampling]
            factors = [(yh, yv), (1, 1), (1, 1)]
        geom = _geometry(h, w, factors)
        ycc = _rgb_to_ycbcr(px)
        if precision == 12:               # widen to the 12-bit domain
            ycc = ycc * 16.0
        if grayscale:
            planes = [ycc[..., 0]]
            qts = [qlum]
        else:
            yh, yv = factors[0]
            planes = [ycc[..., 0],
                      _box_down(ycc[..., 1], yh, yv),
                      _box_down(ycc[..., 2], yh, yv)]
            qts = [qlum, qchrom, qchrom]
        zzs = _planes_to_zz(planes, qts, geom,
                            level=float(1 << (precision - 1)))
    ncomp = len(factors)
    hmax, vmax, mx, my, comps = geom

    out = bytearray(b"\xFF\xD8")                              # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    if precision == 12:                    # Pq=1: 16-bit DQT entries
        out += b"\xFF\xDB" + struct.pack(">H", 131) + bytes([0x10]) \
            + b"".join(struct.pack(">H", int(qlum[z])) for z in ZIGZAG)
        if ncomp == 3:
            out += b"\xFF\xDB" + struct.pack(">H", 131) + bytes([0x11]) \
                + b"".join(struct.pack(">H", int(qchrom[z]))
                           for z in ZIGZAG)
    else:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) \
            + bytes(int(qlum[z]) for z in ZIGZAG)             # DQT 0
        if ncomp == 3:
            out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([1]) \
                + bytes(int(qchrom[z]) for z in ZIGZAG)       # DQT 1
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hv = (factors[ci][0] << 4) | factors[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    # 12-bit sequential must be EXTENDED sequential (SOF1) — baseline
    # SOF0 is 8-bit by definition (T.81 table B.2)
    sof_marker = (b"\xFF\xC2" if progressive else
                  b"\xFF\xC1" if precision == 12 else b"\xFF\xC0")
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    if precision == 12:
        dc_t, ac_t = (DC12, DC12), (AC12, AC12)
    else:
        dc_t, ac_t = (DC_LUM, DC_CHROM), (AC_LUM, AC_CHROM)
    tables = [(0, 0, dc_t[0]), (1, 0, ac_t[0])]
    if ncomp == 3:
        tables += [(0, 1, dc_t[1]), (1, 1, ac_t[1])]
    if progressive:
        # EOBn-capable AC table (AC12 already covers the size-0 row)
        tables.append((1, 2, AC12 if precision == 12 else PROG_AC))
    for cls, tid, (bits, vals) in tables:
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    dc_codes = [_build_huffman(*dc_t[0]), _build_huffman(*dc_t[1])]
    ac_codes = [_build_huffman(*ac_t[0]), _build_huffman(*ac_t[1])]
    tid_of = [0 if ci == 0 else 1 for ci in range(ncomp)]

    def sos(members, ss, se, ah, al):
        seg = bytes([len(members)])
        for ci in members:
            td = tid_of[ci] if (ss == 0 and ah == 0) else 0
            ta = (2 if progressive else tid_of[ci]) if se > 0 else 0
            seg += bytes([ci + 1, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + struct.pack(">H", len(seg) + 2) + seg

    if not progressive:
        out += sos(list(range(ncomp)), 0, 63, 0, 0)
        bw = _BitWriter()
        seq = _SeqWriter(bw, dc_codes, ac_codes)
        preds = [0] * ncomp
        rst = 0
        mcu = 0
        for myi in range(my):
            for mxi in range(mx):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    bw.restart(rst)
                    rst = (rst + 1) & 7
                    preds = [0] * ncomp
                for ci, c in enumerate(comps):
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            zz = zzs[ci][myi * c["v"] + byi,
                                         mxi * c["h"] + bxi]
                            preds[ci] = seq.block(zz, tid_of[ci], preds[ci])
                mcu += 1
        out += bw.flush()
        out += b"\xFF\xD9"                                    # EOI
        return bytes(out)

    # ---- progressive scan script --------------------------------------
    prog_ac = _build_huffman(*(AC12 if precision == 12 else PROG_AC))
    AL = 1                                   # one successive-approx level
    # 1) DC first scan, interleaved
    out += sos(list(range(ncomp)), 0, 0, 0, AL)
    bw = _BitWriter()
    preds = [0] * ncomp
    for myi in range(my):
        for mxi in range(mx):
            for ci, c in enumerate(comps):
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        dc = int(zzs[ci][myi * c["v"] + byi,
                                         mxi * c["h"] + bxi, 0]) >> AL
                        size, raw = _magnitude(dc - preds[ci])
                        code, ln = dc_codes[tid_of[ci]][size]
                        bw.write(code, ln)
                        if size:
                            bw.write(raw, size)
                        preds[ci] = dc
    out += bw.flush()
    # 2) AC first scans, one component each
    for ci, c in enumerate(comps):
        out += sos([ci], 1, 63, 0, AL)
        bw = _BitWriter()
        acw = _ACFirstWriter(bw, prog_ac, 1, 63, AL)
        for byi in range(c["ubh"]):
            for bxi in range(c["ubw"]):
                acw.block(zzs[ci][byi, bxi])
        acw.finish()
        out += bw.flush()
    # 3) DC refinement scan, interleaved (raw bits, no huffman)
    out += sos(list(range(ncomp)), 0, 0, AL, 0)
    bw = _BitWriter()
    for myi in range(my):
        for mxi in range(mx):
            for ci, c in enumerate(comps):
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        dc = int(zzs[ci][myi * c["v"] + byi,
                                         mxi * c["h"] + bxi, 0])
                        bw.write(dc & 1, 1)
    out += bw.flush()
    # 4) AC refinement scans, one component each
    for ci, c in enumerate(comps):
        out += sos([ci], 1, 63, AL, 0)
        bw = _BitWriter()
        acw = _ACRefineWriter(bw, prog_ac, 1, 63, 0)
        for byi in range(c["ubh"]):
            for bxi in range(c["ubw"]):
                acw.block(zzs[ci][byi, bxi])
        acw.finish()
        out += bw.flush()
    out += b"\xFF\xD9"                                        # EOI
    return bytes(out)


# ------------------------------------------------------------------- decoder

def _huff(br: _BitReader, tables) -> int:
    mincode, maxcode, valptr, vals = tables
    code = br.bit()
    ln = 1
    while code > maxcode[ln]:
        if ln >= 16:
            raise ValueError("corrupt huffman stream")
        code = (code << 1) | br.bit()
        ln += 1
    return vals[valptr[ln] + code - mincode[ln]]


def _block_first(br, blk, dcd, acd, ss, se, al, pred, eobrun):
    """First-pass block decode (T.81 F.2.2 / G.2): baseline is the
    ss=0, se=63, al=0 special case; progressive DC-first is se=0;
    progressive AC-first is ss>0 with EOB-run coding."""
    k = ss
    if ss == 0:
        size = _huff(br, dcd)
        # 12-bit frames admit DC category 16: DIFF is 32768 with NO
        # appended bits (T.81 F.1.2.1.1 / F.2.2.1) — reading 16 bits
        # here would desync the entropy stream
        diff = (32768 if size == 16 else
                _extend(br.bits(size), size) if size else 0)
        pred += diff
        blk[0] = pred << al
        k = 1
    if se < k:
        return pred, eobrun
    if eobrun:
        return pred, eobrun - 1
    while k <= se:
        rs = _huff(br, acd)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                                       # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1                             # EOBn
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overrun")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return pred, eobrun


def _block_refine(br, blk, acd, ss, se, al, eobrun):
    """Successive-approximation refinement (T.81 G.2, the control flow
    every conformant decoder shares): DC refine is one raw bit;
    AC refine run-length codes newly-significant coefficients over
    ZERO-history positions while reading one correction bit per
    nonzero-history coefficient passed, including inside EOB runs."""
    p1 = 1 << al
    m1 = -1 << al
    if ss == 0:
        if br.bit():
            blk[0] = int(blk[0]) | p1
        return eobrun
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff(br, acd)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                s = 0                                         # ZRL
            else:
                if s != 1:
                    raise ValueError("corrupt AC refinement scan")
                s = p1 if br.bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s:
                blk[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Huffman JPEG → (H, W, 3) uint8 RGB (grayscale replicated).
    Handles baseline/extended sequential and progressive DCT frames
    (any integer sampling factors, restart intervals, 8- or 12-bit
    samples) AND lossless SOF3 frames (predictors 1..7, point
    transform, 2-16 bit).  Arithmetic coding, hierarchical frames, and
    4-component (CMYK) images raise with a clear message."""
    if jpeg_sof(blob) == 3:
        return _decode_lossless(blob)
    frame, geom, coefs, qtables = _parse_jpeg(blob)
    return _reconstruct(frame, geom, coefs, qtables)


def _parse_jpeg(blob: bytes):
    """Marker walk + entropy decode → (frame, geom, per-component
    zigzag coefficient arrays, quant tables).  Exposed separately so
    tests can pin the ENTROPY layer exactly: progressive and baseline
    encodes of the same quantized coefficients must parse back to
    identical arrays (the lossless part of JPEG)."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict = {}
    dc_dec: dict = {}
    ac_dec: dict = {}
    frame = None
    ri = 0
    coefs: dict = {}            # cid -> (bh, bw, 64) int32 zigzag coeffs
    geom = None
    n = len(blob)
    while pos + 1 < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        if marker == 0xFF:          # fill byte before a marker (T.81
            pos += 1                # B.1.1.2 allows any number of 0xFF)
            continue
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                                    # EOI
            break
        ln = struct.unpack_from(">H", blob, pos)[0]
        seg = blob[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                                    # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"DQT precision {pq} invalid")
                t = np.zeros(64, dtype=np.int64)
                if pq:                     # 16-bit entries (12-bit frames)
                    t[ZIGZAG] = np.frombuffer(seg[s + 1:s + 129],
                                              dtype=">u2").astype(np.int64)
                    s += 129
                else:
                    t[ZIGZAG] = np.frombuffer(seg[s + 1:s + 65],
                                              dtype=np.uint8)
                    s += 65
                qtables[tq] = t
        elif marker == 0xC4:                                  # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                nv = sum(bits)
                vals = list(seg[s + 17:s + 17 + nv])
                (dc_dec if cls == 0 else ac_dec)[tid] = \
                    _build_decoder(bits, vals)
                s += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):        # SOF0/1 (seq), SOF2 (prog)
            prec, h, w = seg[0], *struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            # baseline (SOF0) is 8-bit by definition; extended
            # sequential and progressive also admit 12 (T.81 table B.2)
            if prec != 8 and not (prec == 12 and marker != 0xC0):
                raise ValueError(
                    f"{prec}-bit JPEG unsupported for SOF{marker - 0xC0}")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported "
                                 "(CMYK etc.)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            geom = _geometry(h, w, [(hi, vi) for _, hi, vi, _ in comps])
            frame = (h, w, comps, marker == 0xC2, prec)
            for (cid, _, _, _), c in zip(comps, geom[4]):
                coefs[cid] = np.zeros((c["bh"], c["bw"], 64),
                                      dtype=np.int32)
        elif marker == 0xC3:       # decode_jpeg dispatches SOF3 earlier
            raise ValueError("lossless JPEG reached the DCT parser — "
                             "use decode_jpeg (it dispatches SOF3)")
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = ("arithmetic-coded" if marker >= 0xC9 else
                    "hierarchical/differential")
            raise ValueError(
                f"{kind} JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:                                  # DRI
            ri = struct.unpack(">H", seg)[0]
        elif marker == 0xDA:                                  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            chunks, pos = _split_entropy(blob, pos)
            _decode_scan(seg, chunks, frame, geom, coefs,
                         dc_dec, ac_dec, ri)
        # APPn/COM and others: skipped
    if frame is None:
        raise ValueError("JPEG missing SOF")
    return frame, geom, coefs, qtables


def _decode_scan(seg, chunks, frame, geom, coefs, dc_dec, ac_dec, ri):
    h, w, fcomps, progressive, _prec = frame
    hmax, vmax, mx, my, gcomps = geom
    ns = seg[0]
    scan = []
    order = [cid for cid, _, _, _ in fcomps]
    for i in range(ns):
        cid = seg[1 + 2 * i]
        td, ta = seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF
        scan.append((cid, td, ta, gcomps[order.index(cid)]))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    if progressive and ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    if len(chunks) > 1 and not ri:
        raise ValueError("restart markers without a DRI interval")

    interleaved = ns > 1
    if interleaved:
        total = mx * my
    else:
        c = scan[0][3]
        total = c["ubw"] * c["ubh"]
    preds = {cid: 0 for cid, _, _, _ in scan}
    eobrun = 0
    br = _BitReader(chunks[0])
    chunk_i = 0
    for m in range(total):
        if ri and m and m % ri == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise ValueError("missing restart chunk")
            br = _BitReader(chunks[chunk_i])
            preds = {cid: 0 for cid in preds}
            eobrun = 0
        if interleaved:
            myi, mxi = divmod(m, mx)
            for cid, td, ta, c in scan:
                arr = coefs[cid]
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        blk = arr[myi * c["v"] + byi, mxi * c["h"] + bxi]
                        if ah == 0:
                            preds[cid], eobrun = _block_first(
                                br, blk, dc_dec.get(td), ac_dec.get(ta),
                                ss, se, al, preds[cid], eobrun)
                        else:
                            eobrun = _block_refine(
                                br, blk, ac_dec.get(ta), ss, se, al,
                                eobrun)
        else:
            cid, td, ta, c = scan[0]
            byi, bxi = divmod(m, c["ubw"])
            blk = coefs[cid][byi, bxi]
            if ah == 0:
                preds[cid], eobrun = _block_first(
                    br, blk, dc_dec.get(td), ac_dec.get(ta),
                    ss, se, al, preds[cid], eobrun)
            else:
                eobrun = _block_refine(
                    br, blk, ac_dec.get(ta), ss, se, al, eobrun)


def _reconstruct(frame, geom, coefs, qtables):
    h, w, fcomps, _, prec = frame
    hmax, vmax, _, _, gcomps = geom
    mid = float(1 << (prec - 1))           # level shift 2^(P-1) (A.3.1)
    maxv = (1 << prec) - 1
    shift = prec - 8                       # fold to the 8-bit contract
    planes = []
    for (cid, hi, vi, tq), c in zip(fcomps, gcomps):
        zz = coefs[cid].reshape(-1, 64).astype(np.float64)
        qz = qtables[tq][ZIGZAG].astype(np.float64)
        Fr = np.zeros_like(zz)
        Fr[:, ZIGZAG] = zz * qz
        blocks = Fr.reshape(c["bh"], c["bw"], 8, 8)
        px = np.einsum("ab,yxbc,cd->yxad", _C.T, blocks, _C) + mid
        plane = px.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        plane = plane[:c["ch"], :c["cw"]]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:                # nearest (replicate) upsample
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, maxv).astype(np.int64)
        g = (g >> shift).astype(np.uint8) if shift else g.astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if shift:                              # scale to the 8-bit YCbCr
        planes = [p / (1 << shift) for p in planes]   # domain (linear)
    return _ycbcr_to_rgb(*planes)


# ------------------------------------------------------- lossless (SOF3)

# Fixed DHT for the lossless encoder: diff categories 0..16, lengths
# 3,3,3,3,3,3,4,5,...,14 — Kraft sum 0.875 < 1, so the canonical
# assignment never produces an all-ones code and any category decodes.
_LL_BITS = [0, 0, 6, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
_LL_VALS = list(range(17))


def _ll_predict(p: np.ndarray, y: int, x: int, sel: int,
                default: int) -> int:
    """T.81 H.2: Px for sample (y, x) — scan-start default, first-line
    Ra, first-column Rb, else the selected predictor 1..7."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(p[0, x - 1])
    if x == 0:
        return int(p[y - 1, 0])
    a, b, c = int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1


def encode_jpeg_lossless(px: np.ndarray, *, predictor: int = 1,
                         bits: int = 8, point_transform: int = 0,
                         grayscale: bool = False,
                         interleaved: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB → lossless JPEG (SOF3, T.81 Annex H).
    3-component images are stored as RGB with NO color transform (the
    DNG/ITU convention for lossless — there is no JFIF YCbCr mandate
    outside DCT frames), so ``point_transform=0`` round-trips
    pixel-exact.  ``bits=16`` widens samples by ``v * 257`` (high-byte
    fold on decode restores the input exactly); ``point_transform=Pt``
    drops the Pt low bits per H.1 — decode returns ``(v >> Pt) << Pt``.
    ``interleaved=False`` writes one scan per component instead of a
    single interleaved scan."""
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    pt = point_transform
    if not 0 <= pt < bits:
        raise ValueError("point transform out of range")
    h, w = px.shape[:2]
    if grayscale:
        lum = np.round(0.299 * px[..., 0] + 0.587 * px[..., 1]
                       + 0.114 * px[..., 2]).astype(np.int64)
        planes = [lum]
    else:
        planes = [px[..., i].astype(np.int64) for i in range(3)]
    if bits == 16:
        planes = [p * 257 for p in planes]
    planes = [p >> pt for p in planes]
    default = 1 << (bits - pt - 1)
    codes = _build_huffman(_LL_BITS, _LL_VALS)
    nc = len(planes)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xC4" + struct.pack(">H", 2 + 1 + 16 + len(_LL_VALS))
    out += bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS)
    out += b"\xFF\xC3" + struct.pack(">HBHHB", 8 + 3 * nc, bits, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0])        # cid, 1x1 sampling, Tq=0

    def emit_scan(members: list[int]) -> bytes:
        sos = bytearray(b"\xFF\xDA")
        sos += struct.pack(">HB", 6 + 2 * len(members), len(members))
        for ci in members:
            sos += bytes([ci + 1, 0x00])       # DC table 0, AC unused
        sos += bytes([predictor, 0, pt])       # Ss=predictor, Se=0, Al=Pt
        bw = _BitWriter()
        for y in range(h):
            for x in range(w):
                for ci in members:
                    p = planes[ci]
                    d = (int(p[y, x])
                         - _ll_predict(p, y, x, predictor, default)) \
                        & 0xFFFF               # mod 2^16 per H.2.1
                    if d == 32768:             # SSSS=16: no extra bits
                        c, ln = codes[16]
                        bw.write(c, ln)
                        continue
                    if d > 32768:
                        d -= 65536
                    size, raw = _magnitude(d)
                    c, ln = codes[size]
                    bw.write(c, ln)
                    if size:
                        bw.write(raw, size)
        return bytes(sos) + bw.flush()

    if interleaved or nc == 1:
        out += emit_scan(list(range(nc)))
    else:
        for ci in range(nc):
            out += emit_scan([ci])
    out += b"\xFF\xD9"
    return bytes(out)


def _decode_lossless(blob: bytes) -> np.ndarray:
    """SOF3 lossless JPEG → (H, W, 3) uint8 RGB (T.81 Annex H:
    huffman-coded prediction differences, predictors 1..7, point
    transform, interleaved or per-component scans, 2-16 bit precision
    folded to 8 via the high bits).  3-component = RGB (no color
    transform — the DNG convention); restart intervals and subsampled
    lossless frames raise."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(blob)
    dc_dec: dict = {}
    frame = None
    ri = 0
    prec = 0
    planes: dict = {}
    pts: dict = {}
    while pos + 1 < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        if marker == 0xFF:                     # fill byte (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                                    # EOI
            break
        ln = struct.unpack_from(">H", blob, pos)[0]
        seg = blob[pos + 2:pos + ln]
        pos += ln
        if marker == 0xC4:                                    # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bl = list(seg[s + 1:s + 17])
                nv = sum(bl)
                if cls == 0:
                    dc_dec[tid] = _build_decoder(
                        bl, list(seg[s + 17:s + 17 + nv]))
                s += 17 + nv
        elif marker == 0xC3:                                  # SOF3
            prec, h, w = seg[0], *struct.unpack_from(">HH", seg, 1)
            if not 2 <= prec <= 16:
                raise ValueError(f"{prec}-bit lossless JPEG out of range")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported "
                                 "(CMYK etc.)")
            comps = []
            for ci in range(nc):
                cid, hv, _tq = seg[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled lossless JPEG unsupported")
                comps.append(cid)
                planes[cid] = np.zeros((h, w), dtype=np.int64)
            frame = (h, w, comps)
        elif marker == 0xDD:                                  # DRI
            ri = struct.unpack(">H", seg)[0]
        elif marker == 0xDA:                                  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if ri:
                raise ValueError(
                    "restart intervals in lossless JPEG unsupported")
            h, w, comps = frame
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                td = seg[2 + 2 * i] >> 4
                if td not in dc_dec or cid not in planes:
                    raise ValueError("lossless scan references an "
                                     "undefined table or component")
                scan.append((cid, dc_dec[td], planes[cid]))
            sel = seg[1 + 2 * ns]              # Ss = predictor selector
            pt = seg[3 + 2 * ns] & 0xF         # Al = point transform
            if not 1 <= sel <= 7:
                raise ValueError(f"lossless predictor {sel} invalid")
            for cid, _, _ in scan:
                pts[cid] = pt
            default = 1 << (prec - pt - 1)
            chunks, pos = _split_entropy(blob, pos)
            if len(chunks) > 1:
                raise ValueError(
                    "restart markers in lossless JPEG unsupported")
            br = _BitReader(chunks[0])
            for y in range(h):
                for x in range(w):
                    for cid, tab, p in scan:
                        s = _huff(br, tab)
                        d = 32768 if s == 16 else _extend(br.bits(s), s)
                        pv = _ll_predict(p, y, x, sel, default)
                        p[y, x] = (pv + d) & 0xFFFF    # mod 2^16
    if frame is None:
        raise ValueError("JPEG missing SOF")
    h, w, comps = frame
    outs = []
    for cid in comps:
        v = planes[cid] << pts.get(cid, 0)
        if prec > 8:
            v = v >> (prec - 8)
        elif prec < 8:
            v = v << (8 - prec)
        outs.append(np.clip(v, 0, 255).astype(np.uint8))
    if len(outs) == 1:
        return np.repeat(outs[0][:, :, None], 3, axis=2)
    return np.stack(outs, axis=-1)


def jpeg_lossless_native(blob: bytes) -> bool:
    """True when an SOF3 blob is inside the native lossless decode
    scope: no restart interval (DRI=0) and every component 1x1 —
    restarted or subsampled lossless frames are legal T.81 but raise
    in :func:`_decode_lossless`, so the decodability classifier must
    not report them native (their prediction-reset semantics differ
    between real-world decoders; guessing would decode without error
    and emit wrong pixels)."""
    b = bytes(blob)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return False
    i = 2
    dri = 0
    sof3_plain = None
    while i + 3 < len(b):
        if b[i] != 0xFF:
            return False
        marker = b[i + 1]
        if marker in (0xD9, 0xDA):               # EOI / first scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = (b[i + 2] << 8) | b[i + 3]
        if seglen < 2:
            return False
        seg = b[i + 2:i + 2 + seglen]
        if marker == 0xDD and len(seg) >= 4:
            dri = (seg[2] << 8) | seg[3]
        elif marker == 0xC3:
            if len(seg) < 8:
                return False
            nc = seg[7]
            if len(seg) < 8 + 3 * nc:
                return False
            sof3_plain = all(seg[8 + 3 * ci + 1] == 0x11
                             for ci in range(nc))
        i += 2 + seglen
    return bool(sof3_plain) and dri == 0


def jpeg_sof(blob: bytes):
    """Frame type of a JPEG: walk the marker segments (the same walk
    :func:`decode_jpeg` does, without entropy decode) and return the
    first SOFn's ``n`` — 0/1/2 = sequential or progressive huffman DCT,
    3 = lossless (all natively decodable here), other values = the
    remaining T.81 frame types (arithmetic/hierarchical —
    Pillow-gated).  ``None``
    when the blob is not a JPEG or carries no SOF before SOS/EOI —
    callers treat that as undecodable."""
    b = bytes(blob)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 3 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:                       # EOI: no frame seen
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2                               # standalone markers
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker - 0xC0                 # SOFn (C4/C8/CC aren't)
        if marker == 0xDA:                       # SOS before any SOF
            return None
        seglen = (b[i + 2] << 8) | b[i + 3]
        if seglen < 2:
            return None
        i += 2 + seglen
    return None
