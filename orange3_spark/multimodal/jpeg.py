"""Pure-Python baseline JPEG codec (stdlib + numpy — no libjpeg/Pillow).

Scope: baseline sequential DCT (SOF0), huffman entropy coding, 8-bit
samples, grayscale or 4:4:4 YCbCr (no chroma subsampling), no restart
markers, no progressive scans — unsupported shapes raise with a clear
message (a gate, never a silent fake).  That scope is exactly what the
:mod:`multimodal.codecs` encoder below emits, so the training-pipeline
plumbing (decode → feature → resize) runs REAL JPEG entropy decode,
dequantization, and IDCT end to end in this container.

Public spec: ITU-T T.81 (the JPEG standard) — quantization/huffman
tables from Annex K, the libjpeg quality→scale convention for tables,
JFIF YCbCr equations.  No counterpart in the reference (tabular only).

Exactness note for the oracle-checked query (q_media_decode_jpeg):
encoding is lossy in general, but a block whose ONLY nonzero frequency
is DC decodes to a mathematically flat block — pixel = DC·q₀/8 + 128 —
so synthesizing DC-only blocks with DC·q₀ divisible by 8 makes decoded
pixels exact integers the SQL oracle recomputes from the id alone.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

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
                        f"unexpected marker 0xFF{nxt:02X} in entropy "
                        "stream (restart markers unsupported)")
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


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


def encode_jpeg(px: np.ndarray, quality: int = 90, *,
                grayscale: bool = False,
                coeffs: "np.ndarray | None" = None) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, no subsampling).

    ``grayscale=True`` encodes one luminance component.  ``coeffs``
    (test/oracle hook) bypasses the forward DCT: an (n_blocks_y,
    n_blocks_x, 8, 8) int array of ALREADY-QUANTIZED luminance
    coefficients to entropy-code directly (grayscale only) — this is
    how the DC-only exactness construction of q_media_decode_jpeg
    builds blobs whose decode is integer-predictable."""
    if coeffs is not None:
        grayscale = True
        by, bx = coeffs.shape[:2]
        h, w = by * 8, bx * 8
    else:
        h, w = px.shape[:2]
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    ncomp = 1 if grayscale else 3

    out = bytearray(b"\xFF\xD8")                              # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(qlum[z]) for z in ZIGZAG)                 # DQT 0
    if ncomp == 3:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([1]) \
            + bytes(int(qchrom[z]) for z in ZIGZAG)           # DQT 1
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, tid, (bits, vals) in ((0, 0, DC_LUM), (1, 0, AC_LUM),
                                   (0, 1, DC_CHROM), (1, 1, AC_CHROM)):
        if ncomp == 1 and tid == 1:
            continue
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_build_huffman(*DC_LUM), _build_huffman(*DC_CHROM)]
    ac_codes = [_build_huffman(*AC_LUM), _build_huffman(*AC_CHROM)]
    bw = _BitWriter()

    def write_block(q: np.ndarray, tid: int, pred: int) -> int:
        zz = q.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred
        size, raw = _magnitude(diff)
        code, ln = dc_codes[tid][size]
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
                code, ln = ac_codes[tid][0xF0]                # ZRL
                bw.write(code, ln)
                run -= 16
            size, raw = _magnitude(v)
            code, ln = ac_codes[tid][(run << 4) | size]
            bw.write(code, ln)
            bw.write(raw, size)
            run = 0
        if run:
            code, ln = ac_codes[tid][0x00]                    # EOB
            bw.write(code, ln)
        return int(zz[0])

    by, bx = (h + 7) // 8, (w + 7) // 8
    if coeffs is not None:
        pred = 0
        for y in range(by):
            for x in range(bx):
                pred = write_block(coeffs[y, x], 0, pred)
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = ([ycc[..., 0]] if grayscale
                  else list(np.moveaxis(ycc, -1, 0)))
        qt = [qlum] + [qchrom] * 2
        # edge-replicate to full blocks (the common padding convention)
        pady, padx = by * 8 - h, bx * 8 - w
        planes = [np.pad(p, ((0, pady), (0, padx)), mode="edge")
                  for p in planes]
        preds = [0] * ncomp
        for y in range(by):
            for x in range(bx):
                for ci in range(ncomp):
                    blk = planes[ci][y * 8:y * 8 + 8,
                                     x * 8:x * 8 + 8] - 128.0
                    F = _C @ blk @ _C.T
                    q = np.round(F / qt[ci].reshape(8, 8)
                                 ).astype(np.int32)
                    tid = 0 if ci == 0 else 1
                    preds[ci] = write_block(q, tid, preds[ci])
    out += bw.flush()
    out += b"\xFF\xD9"                                        # EOI
    return bytes(out)


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF → (H, W, 3) uint8 RGB (grayscale replicated).
    Progressive scans, chroma subsampling, 12-bit samples, arithmetic
    coding, and restart intervals raise with a clear message."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict = {}
    dc_dec: dict = {}
    ac_dec: dict = {}
    frame = None
    scan = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        ln = struct.unpack_from(">H", blob, pos)[0]
        seg = blob[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                                    # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = np.frombuffer(seg[s + 1:s + 65],
                                          dtype=np.uint8)
                qtables[tq] = t
                s += 65
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
        elif marker == 0xC0:                                  # SOF0
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), \
                seg[5]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "chroma-subsampled JPEG unsupported (4:4:4 or "
                        "grayscale only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:                                  # DRI
            if struct.unpack(">H", seg)[0]:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:                                  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                     seg[2 + 2 * i] & 0xF) for i in range(ns)]
            break                       # entropy data follows
        # APPn/COM and others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    data_end = blob.rfind(b"\xFF\xD9")
    br = _BitReader(blob[pos:data_end if data_end > 0 else len(blob)])

    def huff_decode(tables) -> int:
        mincode, maxcode, valptr, vals = tables
        code = br.bit()
        ln = 1
        while code > maxcode[ln]:
            if ln >= 16:
                raise ValueError("corrupt huffman stream")
            code = (code << 1) | br.bit()
            ln += 1
        return vals[valptr[ln] + code - mincode[ln]]

    by, bx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((by * 8, bx * 8)) for _ in comps]
    tq_of = {cid: tq for cid, tq in comps}
    preds = {cid: 0 for cid, _ in comps}
    for y in range(by):
        for x in range(bx):
            for cid, td, ta in scan:
                size = huff_decode(dc_dec[td])
                diff = _extend(br.bits(size), size)
                preds[cid] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = preds[cid]
                i = 1
                while i < 64:
                    rs = huff_decode(ac_dec[ta])
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:                            # EOB
                        break
                    if rs == 0xF0:                            # ZRL
                        i += 16
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("AC index overrun")
                    zz[i] = _extend(br.bits(size), size)
                    i += 1
                F = np.zeros(64)
                F[ZIGZAG] = zz * qtables[tq_of[cid]][ZIGZAG]
                blk = _C.T @ F.reshape(8, 8) @ _C + 128.0
                ci = [c for c, _ in comps].index(cid)
                planes[ci][y * 8:y * 8 + 8, x * 8:x * 8 + 8] = blk
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    return _ycbcr_to_rgb(*planes)


def jpeg_sof(blob: bytes):
    """Frame type of a JPEG: walk the marker segments (the same walk
    :func:`decode_jpeg` does, without entropy decode) and return the
    first SOFn's ``n`` — 0 = baseline sequential (natively decodable
    here), 2 = progressive (Pillow-gated), other values = the remaining
    T.81 frame types.  ``None`` when the blob is not a JPEG or carries
    no SOF before SOS/EOI — callers treat that as undecodable."""
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
