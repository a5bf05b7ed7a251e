"""Multimodal plumbing: magic sniff, metadata, stub decode, histograms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orange3_spark.multimodal import media as M

PNG = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]) + b"\x00" * 24
JPEG = bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"JFIF" + b"\x00" * 16
WAV = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVEfmt "
RAW = b"just some bytes, not a known container"


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPEG), (3, WAV), (4, RAW), (5, PNG)],
        "media_id long, content binary")


def test_sniff_and_metadata(media):
    out = M.media_metadata(media).orderBy("media_id").collect()
    assert [r.media_format for r in out] == \
        ["png", "jpeg", "wav", "unknown", "png"]
    assert out[0].media_bytes == len(PNG)
    assert out[0].media_hash == out[4].media_hash   # identical blobs
    assert out[0].media_hash != out[1].media_hash


def test_dedup_media(media):
    out = M.dedup_media_exact(media)
    assert out.count() == 4   # the two PNGs collapse
    survivors = {r.media_id for r in out.collect()}
    assert 1 in survivors and 5 not in survivors


def test_stub_decode_shapes_and_determinism(media):
    d1 = M.decode_image(media, height=4, width=6).orderBy("media_id").collect()
    d2 = M.decode_image(media, height=4, width=6).orderBy("media_id").collect()
    assert len(d1) == 5
    for r in d1:
        assert (r.height, r.width, r.channels) == (4, 6, 3)
        assert len(r.pixels) == 4 * 6 * 3
        assert all(0.0 <= p <= 1.0 for p in r.pixels)
    # deterministic fake: same blob -> same pixels, across runs and rows
    assert d1[0].pixels == d2[0].pixels
    assert d1[0].pixels == d1[4].pixels   # identical PNG blobs
    assert d1[0].pixels != d1[1].pixels


def test_real_decode_branches_on_pillow(media):
    """stub=False really decodes when Pillow is importable; without it the
    gate raises up front instead of silently faking."""
    try:
        import PIL.Image  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            M.decode_image(media, stub=False)
        return
    out = (M.decode_image(media, height=4, width=6, stub=False)
           .orderBy("media_id").collect())
    assert all(r.height == 4 and r.width == 6 and r.channels == 3
               for r in out)
    assert all(len(r.pixels) == 4 * 6 * 3 for r in out)
    assert all(0.0 <= p <= 1.0 for p in out[0].pixels)
    # the fixture's first and fifth blobs are identical PNGs
    assert out[0].pixels == out[4].pixels


def test_image_stats(media):
    stats = M.image_stats(M.decode_image(media)).collect()
    assert all(0.0 < r.mean_px < 1.0 for r in stats)


def test_byte_histogram(spark):
    df = spark.createDataFrame(
        [(1, bytes([0, 0, 255, 255])), (2, bytes([7] * 100))],
        "media_id long, content binary")
    out = {r.media_id: r for r in M.byte_histogram(df).collect()}
    assert out[1].histogram[0] == 2 and out[1].histogram[255] == 2
    assert abs(out[1].entropy - 1.0) < 1e-12    # two equally likely symbols
    assert out[2].entropy == 0.0                # constant byte
    assert abs(out[1].mean_byte - 127.5) < 1e-9


def test_sample_frames(spark):
    blob = bytes(range(256)) * 20   # 5120 bytes
    df = spark.createDataFrame([(1, blob)], "media_id long, content binary")
    frames = M.sample_frames(df, every_n_bytes=1024, frame_bytes=32).collect()
    assert len(frames) == 6   # offsets 0..5120//1024
    assert frames[0].frame_no == 0
    assert bytes(frames[0].frame) == blob[:32]
    assert bytes(frames[1].frame) == blob[1024:1056]


def test_resize_image_matches_literal_numpy(spark):
    """Distributed nearest-neighbor resize equals literal numpy indexing,
    and composes with decode_image's schema."""
    import numpy as np
    from orange3_spark.multimodal.media import decode_image, resize_image

    blobs = [(i, bytes(range(i, i + 32))) for i in range(4)]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    decoded = decode_image(df, height=8, width=6)
    resized = resize_image(decoded, 4, 3)
    rows = {r.media_id: r for r in resized.collect()}
    dec = {r.media_id: r for r in decoded.collect()}
    for mid, r in rows.items():
        assert (r.height, r.width, r.channels) == (4, 3, 3)
        a = np.asarray(dec[mid].pixels, dtype=np.float32).reshape(8, 6, 3)
        ys = np.minimum((np.arange(4) + 0.5) * 8 / 4, 7).astype(int)
        xs = np.minimum((np.arange(3) + 0.5) * 6 / 3, 5).astype(int)
        expect = a[ys][:, xs].ravel()
        assert np.allclose(np.asarray(r.pixels, dtype=np.float32), expect)


def test_bmp_roundtrip_with_padding():
    """Width 7 → 3 pad bytes per row; bottom-up + BGR must invert
    losslessly."""
    import numpy as np

    from orange3_spark.multimodal.codecs import decode_bmp, encode_bmp

    px = (np.arange(8 * 7 * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8).reshape(8, 7, 3)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert np.array_equal(decode_bmp(blob), px)


def test_ppm_roundtrip_and_comment():
    import numpy as np

    from orange3_spark.multimodal.codecs import decode_ppm, encode_ppm

    px = (np.arange(4 * 5 * 3) % 251).astype(np.uint8).reshape(4, 5, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # spec allows comments inside the header
    noisy = b"P6\n# a comment\n5 4\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(noisy), px)


def test_decode_image_native_and_resize(spark):
    import numpy as np

    from orange3_spark.multimodal.codecs import encode_bmp, encode_ppm
    from orange3_spark.multimodal.media import decode_image

    px = (np.arange(8 * 8 * 3) % 256).astype(np.uint8).reshape(8, 8, 3)
    rows = [(1, bytearray(encode_bmp(px))), (2, bytearray(encode_ppm(px)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r
           for r in decode_image(df, height=8, width=8,
                                 decoder="native").collect()}
    want = (px.astype(np.float32) / 255.0).ravel()
    for mid in (1, 2):
        assert np.allclose(out[mid]["pixels"], want)
    # nearest-neighbor downsample is deterministic
    small = decode_image(df, height=4, width=4, decoder="native").collect()
    assert all(len(r["pixels"]) == 4 * 4 * 3 for r in small)


def test_decode_image_pillow_gate(spark):
    import pytest

    from orange3_spark.multimodal.media import decode_image

    df = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xffjunk"))],
                               "media_id long, content binary")
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(df, decoder="pillow").collect()


def test_wav_roundtrip_exact():
    """encode_wav → decode_wav is bit-exact for int16 mono PCM."""
    import numpy as np

    from orange3_spark.multimodal.audio import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    blob = encode_wav(s, rate=16000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    back, rate = decode_wav(blob)
    assert rate == 16000
    assert np.array_equal(back, s)


def test_wav_decode_rejects_stereo():
    import io
    import wave

    import numpy as np
    import pytest

    from orange3_spark.multimodal.audio import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(64, dtype="<i2").tobytes())
    with pytest.raises(ValueError, match="mono"):
        decode_wav(buf.getvalue())


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def test_png_roundtrip_and_unfiltering():
    """encode_png→decode_png is lossless; filters 1-4 (Sub/Up/Avg/Paeth)
    unfilter to a reference-encoded raster; gray + palette map to RGB."""
    import struct
    import zlib

    import numpy as np

    from orange3_spark.multimodal.codecs import (decode_any, decode_png,
                                                 encode_png)

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)
    assert np.array_equal(decode_any(encode_png(px)), px)

    # hand-encode one row per filter type 1-4 (RFC 2083 reference logic)
    w, h = 5, 4
    rows = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y, f in zip(range(h), (1, 2, 3, 4)):
        cur = rows[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * 3, dtype=np.int32)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            enc[x] = (cur[x] - pred) & 0xFF
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), rows)

    g = rng.integers(0, 256, (3, 4, 1), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    png_g = (b"\x89PNG\r\n\x1a\n"
             + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0,
                                               0, 0, 0))
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
    dg = decode_png(png_g)
    assert dg.shape == (3, 4, 3) and np.array_equal(dg[:, :, 0],
                                                    g[:, :, 0])

    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (2, 3, 1), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png_p = (b"\x89PNG\r\n\x1a\n"
             + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3,
                                               0, 0, 0))
             + _png_chunk(b"PLTE", pal.tobytes())
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png_p), pal[idx[:, :, 0]])


def test_png_unsupported_shapes_raise():
    import struct

    import numpy as np
    import pytest

    from orange3_spark.multimodal.codecs import decode_png

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n"
                   + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1,
                                                     16, 2, 0, 0, 0)))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(b"\x89PNG\r\n\x1a\n"
                   + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1,
                                                     8, 2, 0, 0, 1)))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF....")


def test_decode_image_native_png(spark):
    """decode_image(decoder='native') handles PNG blobs end to end,
    including the deterministic nearest-neighbor resize."""
    import numpy as np
    import pandas as pd

    from orange3_spark.multimodal.codecs import encode_png
    from orange3_spark.multimodal.media import decode_image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = encode_png(px)
    df = spark.createDataFrame(pd.DataFrame(
        {"media_id": [1], "content": [blob]}))
    out = decode_image(df, height=4, width=4, decoder="native").first()
    assert (out["height"], out["width"], out["channels"]) == (4, 4, 3)
    want = px[(np.arange(4) * 8) // 4][:, (np.arange(4) * 8) // 4]
    got = np.array(out["pixels"], dtype=np.float32).reshape(4, 4, 3)
    assert np.allclose(got, want.astype(np.float32) / 255.0)


def test_jpeg_roundtrip_fidelity_and_gates():
    """Baseline JPEG: smooth images round-trip within quantization
    tolerance at q95 (color AND grayscale), DC-only blocks decode to
    EXACT flat integers, and non-baseline shapes raise clearly."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.jpeg import (QUANT_LUM, _scaled_quant,
                                               decode_jpeg, encode_jpeg)

    yy, xx = np.mgrid[0:24, 0:16]
    px = np.stack([(np.sin(yy / 5.0) * 60 + 120),
                   (np.cos(xx / 7.0) * 60 + 120),
                   ((yy + xx) % 97 + 60)], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert dec.shape == (24, 16, 3)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 6

    decg = decode_jpeg(encode_jpeg(px, quality=95, grayscale=True))
    lum = (0.299 * px[..., 0] + 0.587 * px[..., 1]
           + 0.114 * px[..., 2])
    assert int(np.abs(decg[:, :, 0].astype(int)
                      - np.round(lum).astype(int)).max()) <= 4
    assert np.array_equal(decg[:, :, 0], decg[:, :, 1])

    # DC-only exactness (the q_media_decode_jpeg construction)
    q0 = int(_scaled_quant(QUANT_LUM, 50)[0])
    assert q0 == 16
    coeffs = np.zeros((2, 3, 8, 8), dtype=np.int64)
    vals = [[5, -3, 10], [0, 7, -8]]
    for y in range(2):
        for x in range(3):
            coeffs[y, x, 0, 0] = vals[y][x]
    dec2 = decode_jpeg(encode_jpeg(None, quality=50, coeffs=coeffs))
    for y in range(2):
        for x in range(3):
            expect = vals[y][x] * q0 // 8 + 128
            assert (dec2[y * 8:(y + 1) * 8, x * 8:(x + 1) * 8]
                    == expect).all()

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG1234")
    # gates that REMAIN after round 8 (progressive/subsampling are
    # native now): arithmetic coding, lossless frames, 12-bit samples
    blob = bytearray(encode_jpeg(px, quality=80))
    sof = blob.find(b"\xFF\xC0")
    blob[sof + 1] = 0xC9                      # SOF9: arithmetic
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(blob))
    blob[sof + 1] = 0xC3                      # SOF3: lossless
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(bytes(blob))
    blob[sof + 1] = 0xC0
    blob[sof + 4] = 12                        # precision byte
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(bytes(blob))


def test_decode_image_native_jpeg(spark):
    """decode_image(decoder='native') handles baseline JPEG end to end
    — magic-byte dispatch through decode_any."""
    import numpy as np
    import pandas as pd

    from orange3_spark.multimodal.jpeg import encode_jpeg
    from orange3_spark.multimodal.media import decode_image

    yy = np.mgrid[0:8, 0:8][0]
    px = (yy * 8 + 64).astype(np.uint8)[:, :, None].repeat(3, 2)
    df = spark.createDataFrame(pd.DataFrame(
        {"media_id": [1], "content": [encode_jpeg(px, quality=95)]}))
    out = decode_image(df, height=8, width=8, decoder="native").first()
    assert (out["height"], out["width"], out["channels"]) == (8, 8, 3)
    got = np.round(np.array(out["pixels"]) * 255).reshape(8, 8, 3)
    assert int(np.abs(got - px).max()) <= 6


def test_jpeg_sof_marker_walk():
    """Frame typing walks segments, never pattern-matches raw bytes: a
    0xFFC2 byte pair INSIDE a segment payload must not read as SOF2."""
    from orange3_spark.multimodal.jpeg import jpeg_sof

    def seg(marker, payload):
        ln = len(payload) + 2
        return bytes([0xFF, marker, ln >> 8, ln & 0xFF]) + payload

    sof0 = seg(0xC0, bytes([8, 0, 16, 0, 16, 1, 1, 0x11, 0]))
    sof2 = seg(0xC2, bytes([8, 0, 16, 0, 16, 1, 1, 0x11, 0]))
    soi, eoi = b"\xff\xd8", b"\xff\xd9"
    # payload containing a fake SOF2 marker byte-pair
    trap = seg(0xE0, b"\xff\xc2junk")
    assert jpeg_sof(soi + trap + sof0 + eoi) == 0
    assert jpeg_sof(soi + trap + sof2 + eoi) == 2
    assert jpeg_sof(soi + seg(0xC7, bytes(9)) + eoi) == 7
    assert jpeg_sof(soi + eoi) is None                 # no frame
    assert jpeg_sof(b"GIF87a") is None                 # not a JPEG
    assert jpeg_sof(soi + seg(0xDA, bytes(4))) is None  # SOS before SOF
    # standalone RST/TEM markers are skipped without a length field
    assert jpeg_sof(soi + b"\xff\x01" + b"\xff\xd0" + sof0 + eoi) == 0
    # real encoder output is baseline
    import numpy as np
    from orange3_spark.multimodal.jpeg import encode_jpeg
    coeffs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    assert jpeg_sof(encode_jpeg(None, quality=50, coeffs=coeffs)) == 0


def test_classify_decodability_paths(spark):
    from orange3_spark.multimodal.media import classify_decodability

    # progressive (SOF2) classifies NATIVE since round 8; the gated
    # JPEG class is arithmetic-coded (SOF9)
    prog = bytes([0xFF, 0xD8, 0xFF, 0xC2, 0x00, 0x0B,
                  8, 0, 16, 0, 16, 1, 1, 0x11, 0, 0xFF, 0xD9])
    arith = bytes([0xFF, 0xD8, 0xFF, 0xC9, 0x00, 0x0B,
                   8, 0, 16, 0, 16, 1, 1, 0x11, 0, 0xFF, 0xD9])
    rows = [(0, prog), (1, b"GIF87a" + bytes(4)),
            (2, b"P6\n1 1\n255\n" + bytes(3)), (3, b"\x00junk"),
            (4, arith), (5, b"II*\x00" + bytes(8)),
            (6, b"MM\x00*" + bytes(8)),
            (7, b"RIFF" + bytes(4) + b"WEBPVP8 "),
            (8, b"RIFF" + bytes(4) + b"WAVEfmt ")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: (r["format"], r["decode_path"])
           for r in classify_decodability(df).collect()}
    assert got[0] == ("jpeg", "native")
    assert got[4] == ("jpeg", "pillow-gated")
    assert got[1] == ("gif", "native")
    assert got[2] == ("ppm", "native")
    assert got[3] == ("unknown", "unknown")
    assert got[5] == ("tiff", "native")
    assert got[6] == ("tiff", "native")
    assert got[7] == ("webp", "pillow-gated")   # lossy VP8
    # a real VP8L webp classifies native
    import numpy as np
    from orange3_spark.multimodal.webp import encode_webp_lossless
    vp8l = encode_webp_lossless(np.zeros((2, 2, 3), dtype=np.uint8))
    # SOF3 lossless: native inside the implemented scope, gated when a
    # restart interval appears (prediction-reset semantics differ
    # between real decoders — honest gate, not a guess)
    from orange3_spark.multimodal.jpeg import encode_jpeg_lossless
    sof3 = encode_jpeg_lossless(np.zeros((2, 2, 3), dtype=np.uint8))
    i = sof3.find(b"\xFF\xDA")
    sof3_dri = sof3[:i] + b"\xFF\xDD\x00\x04\x00\x08" + sof3[i:]
    df2 = spark.createDataFrame(
        [(9, vp8l), (10, sof3), (11, sof3_dri)],
        "media_id long, content binary")
    got2 = {r["media_id"]: (r["format"], r["decode_path"])
            for r in classify_decodability(df2).collect()}
    assert got2[9] == ("webp", "native")
    assert got2[10] == ("jpeg", "native")
    assert got2[11] == ("jpeg", "pillow-gated")
    assert got[8] == ("wav", "unknown")


def test_jpeg_subsampled_decode_matches_reference_pipeline():
    """4:2:0 / 4:2:2 / 4:1:1 decode equals an INDEPENDENTLY composed
    numpy reference of the documented pipeline (RGB→YCbCr → box-mean
    chroma downsample → per-block DCT/quantize → dequantize/IDCT →
    replicate-upsample → YCbCr→RGB), with nonzero chroma and AC
    energy — pinning MCU interleave, plane geometry, and upsampling
    beyond what the flat-block oracle query can see."""
    import numpy as np

    from orange3_spark.multimodal.jpeg import (QUANT_CHROM, QUANT_LUM, _C,
                                               _SUBSAMPLING, _box_down,
                                               _rgb_to_ycbcr, _scaled_quant,
                                               _ycbcr_to_rgb, decode_jpeg,
                                               encode_jpeg)

    yy, xx = np.mgrid[0:24, 0:21]
    img = np.stack([(yy * 9 + 30) % 200 + 20, (xx * 13 + 60) % 200 + 20,
                    ((yy * xx) % 130 + 60)], axis=-1).astype(np.uint8)

    def ref_plane(plane, qt, h_used, w_used, bh8, bw8):
        p = np.pad(plane, ((0, bh8 - plane.shape[0]),
                           (0, bw8 - plane.shape[1])), mode="edge")
        b = p.reshape(bh8 // 8, 8, bw8 // 8, 8).transpose(0, 2, 1, 3) - 128.0
        Fq = np.einsum("ab,yxbc,cd->yxad", _C, b, _C.T)
        q = np.round(Fq / qt.reshape(8, 8))
        Fd = q * qt.reshape(8, 8)
        r = np.einsum("ab,yxbc,cd->yxad", _C.T, Fd, _C) + 128.0
        out = r.transpose(0, 2, 1, 3).reshape(bh8, bw8)
        return out[:h_used, :w_used]

    h, w = img.shape[:2]
    for sub in ("420", "422", "411"):
        fx, fy = _SUBSAMPLING[sub]
        q = 85
        qlum = _scaled_quant(QUANT_LUM, q).astype(float)
        qch = _scaled_quant(QUANT_CHROM, q).astype(float)
        mx = -(-w // (8 * fx))
        my = -(-h // (8 * fy))
        ycc = _rgb_to_ycbcr(img)
        ypl = ref_plane(ycc[..., 0], qlum, h, w, my * fy * 8, mx * fx * 8)
        ch, cw = -(-h // fy), -(-w // fx)
        planes = [ypl]
        for c in (1, 2):
            d = _box_down(ycc[..., c], fx, fy)
            r = ref_plane(d, qch, ch, cw, my * 8, mx * 8)
            up = np.repeat(np.repeat(r, fy, axis=0), fx, axis=1)[:h, :w]
            planes.append(up)
        want = _ycbcr_to_rgb(*planes)
        got = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert np.array_equal(got, want), f"{sub} mismatch"
        # and it is a faithful lossy round-trip, not a scramble (the
        # test image is deliberately chroma-hostile; a block/channel
        # scramble lands near 60, honest subsampling loss near 15)
        err = np.abs(got.astype(int) - img.astype(int)).mean()
        assert err < 25.0, f"{sub} mean abs err {err}"


def test_jpeg_progressive_equals_baseline():
    """Progressive encode of the same image must decode to EXACTLY the
    pixels of the baseline encode (the quantized coefficients are
    identical; only the entropy layout differs) — grayscale, 4:4:4, and
    4:2:0, including odd (non-MCU-aligned) dimensions."""
    import numpy as np

    from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:19, 0:26]
    img = np.stack([(yy * 11 + 3) % 256, (xx * 7 + 90) % 256,
                    ((yy + 2 * xx) * 5) % 256], axis=-1).astype(np.uint8)
    for kw in ({"grayscale": True}, {"subsampling": "444"},
               {"subsampling": "420"}):
        b0 = encode_jpeg(img, quality=88, **kw)
        b2 = encode_jpeg(img, quality=88, progressive=True, **kw)
        assert np.array_equal(decode_jpeg(b0), decode_jpeg(b2)), kw


def test_jpeg_restart_intervals():
    """RSTn markers: decode equals the no-restart encode (predictor
    resets and byte alignment are invisible in pixels), for several
    interval lengths including one that divides the MCU count and one
    that doesn't."""
    import numpy as np

    from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:32, 0:40]
    img = np.stack([(yy * 6) % 256, (xx * 6) % 256, ((yy ^ xx) * 3) % 256],
                   axis=-1).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    for ri in (1, 2, 3):
        blob = encode_jpeg(img, quality=90, subsampling="420",
                           restart_interval=ri)
        assert np.array_equal(decode_jpeg(blob), base), f"ri={ri}"


def test_jpeg_progressive_coefficient_roundtrip_stress():
    """The entropy layer is lossless: random quantized coefficient
    arrays (dense and sparse, negatives, magnitudes to ±255) encoded
    progressively must parse back EXACTLY — this is the pin on the
    Annex-G successive-approximation algebra (AC refinement correction
    bits, EOB-run buffering, ZRL-in-refine), which the flat-block
    oracle query cannot reach."""
    import numpy as np

    from orange3_spark.multimodal.jpeg import ZIGZAG, _parse_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for trial in range(25):
        by, bx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        c = np.zeros((by, bx, 8, 8), dtype=np.int64)
        density = rng.choice([0.05, 0.4, 0.95])
        mask = rng.random((by, bx, 8, 8)) < density
        c[mask] = rng.integers(-255, 256, size=int(mask.sum()))
        for prog in (False, True):
            blob = encode_jpeg(None, quality=50, coeffs=c, progressive=prog)
            _, _, coefs, _ = _parse_jpeg(blob)
            zz = coefs[1]
            raster = np.zeros((by, bx, 64), dtype=np.int64)
            raster[..., ZIGZAG] = zz
            assert np.array_equal(raster.reshape(by, bx, 8, 8), c), \
                (trial, prog)


def test_gif_roundtrip_lzw_and_interlace():
    """GIF is lossless over palette indices: round-trips are
    pixel-exact — tiny 2-color, full 256-color with LZW width growth,
    noise that forces dictionary CLEAR resets at 4096 entries, and the
    4-pass interlace layout; >256-color input raises."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.gif import decode_gif, encode_gif

    img = np.zeros((5, 7, 3), dtype=np.uint8)
    img[::2, ::3] = 255
    assert np.array_equal(decode_gif(encode_gif(img)), img)

    yy, xx = np.mgrid[0:60, 0:90]
    v = ((yy * 31 + xx * 17) % 256).astype(np.uint8)
    img = np.stack([v, (v * 2) % 256, (v * 3 + 7) % 256],
                   axis=-1).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(130, 130), dtype=np.uint8)
    noise = np.stack([g, g, g], axis=-1)
    blob = encode_gif(np.ascontiguousarray(noise))
    assert np.array_equal(decode_gif(blob), noise)

    # GIF87a signature accepted; junk rejected
    b = bytearray(encode_gif(img))
    b[4] = ord("7")
    assert np.array_equal(decode_gif(bytes(b)), img)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError, match="palette"):
        encode_gif(rng.integers(0, 256, size=(40, 40, 3)).astype(np.uint8))


def test_gif_extension_blocks_and_subrect():
    """GIF89a extension blocks (graphic control etc.) are skipped, and
    a frame smaller than the logical screen composites onto the
    background color."""
    import struct

    import numpy as np

    from orange3_spark.multimodal.gif import decode_gif, encode_gif

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    blob = bytearray(encode_gif(img))
    # splice a graphic-control extension right before the image block
    at = blob.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    blob[at:at] = gce
    assert np.array_equal(decode_gif(bytes(blob)), img)

    # hand-build a 4x4 screen with a 2x2 frame at (1,1): palette
    # {0: black (background), 1: white}
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
    pal = bytes([0, 0, 0, 255, 255, 255])
    desc = b"\x2C" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    # LZW: min code 2, codes: CLEAR(4) 1 1 1 1 EOI(5), width 3
    from orange3_spark.multimodal.gif import _lzw_encode
    data = _lzw_encode(np.array([1, 1, 1, 1], dtype=np.uint8), 2)
    body = bytes([2]) + bytes([len(data)]) + data + b"\x00\x3B"
    out = decode_gif(hdr + pal + desc + body)
    want = np.zeros((4, 4, 3), dtype=np.uint8)
    want[1:3, 1:3] = 255
    assert np.array_equal(out, want)


def test_tiff_roundtrip_matrix():
    """TIFF is lossless: the full codec matrix — byte order II/MM x
    none/LZW/PackBits x predictor x single/multi-strip — round-trips
    pixel-exact on structured AND random rasters; LZW crosses the
    12-bit ceiling with CLEAR resets on a large random image; the
    early code-width change is pinned by any of these (an off-by-one
    desynchronizes widths and corrupts immediately)."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.tiff import decode_tiff, encode_tiff

    yy, xx = np.mgrid[0:21, 0:17]
    img = np.stack([(yy * 13 + 5) % 256, (xx * 7 + 99) % 256,
                    ((yy ^ xx) * 11) % 256], axis=-1).astype(np.uint8)
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(30, 25, 3), dtype=np.uint8)
    for bo in ("II", "MM"):
        for comp in ("none", "lzw", "packbits"):
            for pred in (False, True):
                for rps in (None, 4):
                    for im in (img, noise):
                        blob = encode_tiff(im, compression=comp,
                                           byte_order=bo, predictor=pred,
                                           rows_per_strip=rps)
                        assert np.array_equal(decode_tiff(blob), im), \
                            (bo, comp, pred, rps)
    big = rng.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(big, compression="lzw")),
                          big)
    # grayscale photometric + predictor
    g = encode_tiff(img, compression="lzw", grayscale=True, predictor=True)
    d = decode_tiff(g)
    lum = np.round(0.299 * img[..., 0] + 0.587 * img[..., 1]
                   + 0.114 * img[..., 2]).astype(np.uint8)
    assert np.array_equal(d[:, :, 0], lum)
    assert np.array_equal(d[:, :, 0], d[:, :, 1])
    # gates
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x2a\x00junk")
    with pytest.raises(ValueError, match="BigTIFF"):
        decode_tiff(b"II\x2b\x00\x08\x00\x00\x00")
    b = bytearray(encode_tiff(img))
    i = bytes(b).find(bytes([8, 0, 8, 0, 8, 0]))
    b[i:i + 2] = bytes([16, 0])                # mixed [16, 8, 8]
    with pytest.raises(ValueError, match="8/16-bit only"):
        decode_tiff(bytes(b))
    b[i:i + 6] = bytes([12, 0, 12, 0, 12, 0])  # uniform but unsupported
    with pytest.raises(ValueError, match="8/16-bit only"):
        decode_tiff(bytes(b))


def test_tiff_tiled_16bit_deflate():
    """Round-10 TIFF extensions: tiled storage (§15) with edge-tile
    cropping on BOTH axes, 16-bit samples (v*257 widening, high-byte
    fold), Deflate strips/tiles, and the 16-bit predictor's mod-65536
    arithmetic — all lossless, all pixel-exact, both byte orders.
    A 33x17 image under 16x16 tiles forces a 3x2 tile grid whose right
    and bottom tiles are mostly padding; a desynced tile walk, a
    row-major/tile-major mixup, or folding before the predictor
    cumsum all shift pixels and fail the exact compare."""
    import struct

    import numpy as np
    import pytest

    from orange3_spark.multimodal.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(7, 45, 3), dtype=np.uint8)]
    for im in imgs:
        for bo in ("II", "MM"):
            for comp in ("none", "lzw", "deflate", "packbits"):
                for pred in (False, True):
                    for bits in (8, 16):
                        blob = encode_tiff(im, byte_order=bo,
                                           compression=comp,
                                           predictor=pred, bits=bits,
                                           tile=(16, 16))
                        assert np.array_equal(decode_tiff(blob), im), \
                            (im.shape, bo, comp, pred, bits)
    # 16-bit strips (multi + single) and Deflate strips
    im = imgs[0]
    for kw in ({"rows_per_strip": 4}, {}):
        blob = encode_tiff(im, compression="deflate", bits=16,
                           predictor=True, byte_order="MM", **kw)
        assert np.array_equal(decode_tiff(blob), im)
    # 16-bit grayscale keeps the luma exactly (257*v >> 8 == v)
    g = encode_tiff(im, grayscale=True, bits=16, compression="deflate",
                    tile=(16, 16), predictor=True)
    lum = np.round(0.299 * im[..., 0] + 0.587 * im[..., 1]
                   + 0.114 * im[..., 2]).astype(np.uint8)
    assert np.array_equal(decode_tiff(g)[:, :, 0], lum)
    # legacy Deflate code 32946 decodes identically to code 8
    blob = bytearray(encode_tiff(im, compression="deflate"))
    i = bytes(blob).find(struct.pack("<HHIHH", 259, 3, 1, 8, 0))
    assert i > 0
    blob[i:i + 12] = struct.pack("<HHII", 259, 4, 1, 32946)
    assert np.array_equal(decode_tiff(bytes(blob)), im)
    # exclusive storage options
    with pytest.raises(ValueError, match="exclusive"):
        encode_tiff(im, tile=(16, 16), rows_per_strip=4)
    # planar configuration 2: plane-major strip table, single-sample
    # strips — predictor and 16-bit arithmetic apply per plane
    for comp in ("none", "lzw", "deflate", "packbits"):
        for bits in (8, 16):
            blob = encode_tiff(im, compression=comp, bits=bits,
                               predictor=True, rows_per_strip=4,
                               byte_order="MM", planar=True)
            assert np.array_equal(decode_tiff(blob), im), (comp, bits)
    with pytest.raises(ValueError, match="planar and tile"):
        encode_tiff(im, tile=(16, 16), planar=True)


def test_jpeg_12bit_decode():
    """12-bit DCT JPEG (T.81 extended sequential SOF1 / progressive
    SOF2): 16-bit DQT entries parse, the 2^11 level shift and 4095
    clip apply, and the high-bit fold lands on the 8-bit contract.
    DC-only constructions decode to exact integers ((2*DC + 2048) >> 4
    at q0=16); natural-image 4:4:4 at quality 95 decodes with ZERO
    mean error against the source (the 12-bit domain absorbs the
    quantization the 8-bit path rounds); baseline SOF0 stays 8-bit by
    definition and a 12-bit SOF0 raises."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.jpeg import (decode_jpeg, encode_jpeg,
                                               jpeg_sof)

    coeffs = np.zeros((2, 2, 8, 8), dtype=np.int64)
    vals = [10, -20, 30, -5]
    for i, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        coeffs[by, bx, 0, 0] = vals[i]
    for prog in (False, True):
        blob = encode_jpeg(None, quality=50, coeffs=coeffs,
                           precision=12, progressive=prog)
        assert jpeg_sof(blob) == (2 if prog else 1)
        out = decode_jpeg(blob)
        for i, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            want = (2 * vals[i] + 2048) >> 4
            assert out[by * 8 + 1, bx * 8 + 1, 0] == want, (prog, i)
    # natural image: 4:4:4 q95 in 12-bit decodes exactly; 4:2:0 close
    yy, xx = np.mgrid[0:24, 0:24]
    img = np.stack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                    (yy * 7) % 256], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, precision=12))
    assert np.array_equal(out, img)
    out = decode_jpeg(encode_jpeg(img, quality=95, precision=12,
                                  subsampling="420", progressive=True))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4
    # grayscale 12-bit
    g = decode_jpeg(encode_jpeg(img, quality=95, precision=12,
                                grayscale=True))
    lum = np.round(0.299 * img[..., 0] + 0.587 * img[..., 1]
                   + 0.114 * img[..., 2])
    assert np.abs(g[:, :, 0].astype(float) - lum).mean() < 1.0
    # gates: 12-bit baseline SOF0 is illegal; precision range enforced
    blob = bytearray(encode_jpeg(img, quality=90))
    i = bytes(blob).find(b"\xFF\xC0")
    assert blob[i + 4] == 8
    blob[i + 4] = 12
    with pytest.raises(ValueError, match="12-bit JPEG unsupported"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(img, precision=10)


def test_jpeg_lossless_roundtrip_matrix():
    """Lossless JPEG (SOF3, T.81 Annex H) round-trips pixel-exact
    through all seven predictors x 8/16-bit precision x interleaved /
    per-component scans, on structured and random rasters.  The
    16-bit black-corner image forces the SSSS=16 special category
    (diff exactly 32768 against the 2^15 scan-start default — no
    appended bits per H.1.2.2); point transform Pt drops exactly the
    Pt low bits; decode_jpeg dispatches on jpeg_sof()==3."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.jpeg import (decode_jpeg,
                                               encode_jpeg_lossless,
                                               jpeg_sof)

    yy, xx = np.mgrid[0:14, 0:11]
    img = np.stack([(yy * 31 + 7) % 256, (xx * 17 + 3) % 256,
                    ((yy * xx) + 199) % 256], axis=-1).astype(np.uint8)
    rng = np.random.default_rng(23)
    noise = rng.integers(0, 256, size=(9, 21, 3), dtype=np.uint8)
    for im in (img, noise):
        for pred in range(1, 8):
            for bits in (8, 16):
                for inter in (True, False):
                    blob = encode_jpeg_lossless(im, predictor=pred,
                                                bits=bits,
                                                interleaved=inter)
                    assert jpeg_sof(blob) == 3
                    assert np.array_equal(decode_jpeg(blob), im), \
                        (pred, bits, inter)
    # SSSS=16: a zero top-left sample in 16-bit mode diffs by exactly
    # 32768 from the scan-start default predictor
    corner = img.copy()
    corner[0, 0] = 0
    blob = encode_jpeg_lossless(corner, predictor=1, bits=16)
    assert np.array_equal(decode_jpeg(blob), corner)
    # point transform: decode returns (v >> Pt) << Pt
    for pt in (1, 3):
        blob = encode_jpeg_lossless(img, predictor=5, point_transform=pt)
        assert np.array_equal(decode_jpeg(blob), (img >> pt) << pt)
    # grayscale photometric
    g = decode_jpeg(encode_jpeg_lossless(img, grayscale=True, predictor=7))
    lum = np.round(0.299 * img[..., 0] + 0.587 * img[..., 1]
                   + 0.114 * img[..., 2]).astype(np.uint8)
    assert np.array_equal(g[:, :, 0], lum)
    assert np.array_equal(g[:, :, 0], g[:, :, 2])
    # gates: predictor range, restart intervals
    with pytest.raises(ValueError, match="1..7"):
        encode_jpeg_lossless(img, predictor=0)
    blob = bytearray(encode_jpeg_lossless(img))
    i = bytes(blob).find(b"\xFF\xDA")
    dri = b"\xFF\xDD\x00\x04\x00\x08"
    with pytest.raises(ValueError, match="restart intervals"):
        decode_jpeg(bytes(blob[:i]) + dri + bytes(blob[i:]))


def test_webp_vp8l_roundtrip_matrix():
    """VP8L is lossless: every decoder path round-trips pixel-exact —
    the 32-combo feature matrix (color cache x LZ77 x subtract-green x
    14-mode predictor x color transform) on structured, random, and
    run-heavy images, plus palette color-indexing at all three packing
    widths.  Validation is by construction (no libwebp/Pillow in this
    container) — the bit format follows the public VP8L specification;
    the caveat is documented in the module docstring."""
    from itertools import product

    import numpy as np
    import pytest

    from orange3_spark.multimodal.webp import (decode_webp,
                                               encode_webp_lossless)

    yy, xx = np.mgrid[0:21, 0:17]
    img = np.stack([(yy * 13 + 5) % 256, (xx * 7 + 99) % 256,
                    ((yy ^ xx) * 11) % 256], axis=-1).astype(np.uint8)
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
    runs = img.copy()
    runs[5:12] = 77
    for cache, lz, sg, pred, ct in product((False, True), repeat=5):
        for im in (img, noise, runs):
            blob = encode_webp_lossless(
                im, use_cache=cache, use_lz77=lz, subtract_green=sg,
                predictor=pred, color_transform=ct)
            assert np.array_equal(decode_webp(blob), im), \
                (cache, lz, sg, pred, ct)
    for ncol, shape in ((2, (13, 29)), (4, (10, 18)), (13, (9, 33))):
        vals = (np.arange(ncol) * 17 + 30).astype(np.uint8)
        pidx = rng.integers(0, ncol, size=shape)
        im = np.stack([vals[pidx], vals[pidx] // 2, 255 - vals[pidx]],
                      axis=-1).astype(np.uint8)
        for cache, lz in product((False, True), repeat=2):
            blob = encode_webp_lossless(im, palette=True,
                                        use_cache=cache, use_lz77=lz)
            assert np.array_equal(decode_webp(blob), im), (ncol, cache, lz)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"RIFX" + bytes(20))
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(b"RIFF" + bytes(4) + b"WEBP" + b"VP8 " + bytes(8))


def test_gif_animation_frames_compositing():
    """Multi-frame GIF decode: composited frames honor transparency
    (a transparent patch row shows the PREVIOUS frame's pixels) and
    disposal modes 2 (restore background) and 3 (restore previous);
    max_frames bounds work."""
    import numpy as np

    from orange3_spark.multimodal.gif import (decode_gif_frames,
                                              encode_gif_animation)

    base = np.full((6, 8, 3), 10, dtype=np.uint8)
    p1 = np.full((2, 3, 3), 10, dtype=np.uint8)
    p1[0] = 99
    p2 = np.full((2, 2, 3), 200, dtype=np.uint8)
    blob = encode_gif_animation(
        [base, p1, p2], rects=[None, (1, 2), (5, 0)],
        transparents=[None, (10, 10, 10), None])
    f0, f1, f2 = decode_gif_frames(blob)
    assert (f0 == 10).all()
    exp1 = f0.copy()
    exp1[2, 1:4] = 99                      # drawn row; transparent row kept
    assert np.array_equal(f1, exp1)
    exp2 = exp1.copy()
    exp2[0:2, 5:7] = 200
    assert np.array_equal(f2, exp2)

    blob = encode_gif_animation(
        [base, p2, p2, p2], rects=[None, (0, 0), (3, 2), (6, 0)],
        disposals=[0, 2, 3, 0])
    fr = decode_gif_frames(blob)
    assert len(fr) == 4
    assert (fr[1][0:2, 0:2, 0] == 200).all()
    # disposal 2 wiped frame-1's rect back to background before frame 2
    assert (fr[2][0:2, 0:2, 0] == 10).all()
    assert (fr[2][2:4, 3:5, 0] == 200).all()
    # disposal 3 restored frame-2's rect before frame 3
    assert (fr[3][2:4, 3:5, 0] == 10).all()
    assert (fr[3][0:2, 6:8, 0] == 200).all()
    # frame cap
    assert len(decode_gif_frames(blob, max_frames=2)) == 2


def test_sample_gif_frames_distributed(spark):
    """sample_gif_frames: Arrow-batched long-form frames with the
    decode_image pixel convention."""
    import numpy as np

    from orange3_spark.multimodal.gif import encode_gif_animation
    from orange3_spark.multimodal.media import sample_gif_frames

    base = np.full((4, 4, 3), 30, dtype=np.uint8)
    p = np.full((2, 2, 3), 90, dtype=np.uint8)
    blob = encode_gif_animation([base, p], rects=[None, (1, 1)])
    df = spark.createDataFrame([(7, blob)], "media_id long, content binary")
    rows = {r["frame_no"]: r for r in sample_gif_frames(df).collect()}
    assert sorted(rows) == [0, 1]
    f1 = np.round(np.array(rows[1]["pixels"]) * 255).reshape(4, 4, 3)
    assert (f1[1:3, 1:3] == 90).all() and f1[0, 0, 0] == 30


def test_clamp_add_sub_half_truncates_toward_zero():
    """libwebp's AddSubtractComponentHalf uses C `/ 2` (truncation toward
    zero); Python floor division diverges by 1 whenever a < b with odd
    difference — real libwebp files hit that under predictor mode 13."""
    from orange3_spark.multimodal.webp import _clamp_add_sub_half

    assert _clamp_add_sub_half(10, 15) == 8     # floor semantics gave 7
    assert _clamp_add_sub_half(15, 10) == 17
    assert _clamp_add_sub_half(0, 255) == 0
    assert _clamp_add_sub_half(255, 0) == 255
    for a in range(0, 256, 7):
        for b in range(0, 256, 5):
            d = a - b
            want = max(0, min(255, a + (abs(d) // 2 if d >= 0 else
                                        -(abs(d) // 2))))
            assert _clamp_add_sub_half(a, b) == want, (a, b)


def test_webp_color_transform_numpy2_safe():
    """The color-transform coefficient bytes must not go through an
    out-of-range np.int8(...) literal conversion (OverflowError under
    NumPy >= 2, DeprecationWarning on 1.26)."""
    import warnings

    import numpy as np

    from orange3_spark.multimodal.webp import (decode_webp,
                                               encode_webp_lossless)

    yy, xx = np.mgrid[0:9, 0:11]
    img = np.stack([(yy * 31) % 256, (xx * 53) % 256,
                    ((yy + xx) * 29) % 256], axis=-1).astype(np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        blob = encode_webp_lossless(img, color_transform=True)
    assert np.array_equal(decode_webp(blob), img)


def test_gif_first_frame_transparency_matches_frames_decoder():
    """A GIF89a graphic-control transparent index on the FIRST frame:
    decode_gif (single-frame entry point) must composite onto the
    background exactly like decode_gif_frames — the two native entry
    points previously disagreed on the same real-world file."""
    import numpy as np

    from orange3_spark.multimodal.gif import (decode_gif,
                                              decode_gif_frames,
                                              encode_gif_animation)

    f0 = np.full((6, 8, 3), 40, dtype=np.uint8)
    f0[2:4, 3:6] = (200, 10, 10)          # the transparent marker color
    blob = encode_gif_animation([f0], transparents=[(200, 10, 10)])
    single = decode_gif(blob)
    framed = decode_gif_frames(blob)[0]
    assert np.array_equal(single, framed)
    # the transparent rectangle shows the background, not the palette color
    assert not np.array_equal(single[2, 3], np.array([200, 10, 10]))


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: a marker may be preceded by any number of 0xFF fill
    bytes — both in the header segment walk and at the end of an entropy
    scan.  Decode of a padded file must be byte-identical to the clean
    decode."""
    import numpy as np

    from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:17]
    img = np.stack([(yy * 11) % 256, (xx * 7) % 256,
                    ((yy * xx) % 251)], axis=-1).astype(np.uint8)
    blob = encode_jpeg(img, quality=85)
    want = decode_jpeg(blob)

    # pad the DQT marker (header walk) and the EOI marker (entropy end)
    padded = bytearray(blob)
    assert padded[-2:] == b"\xFF\xD9"
    padded[-2:-2] = b"\xFF\xFF\xFF"        # fills before EOI
    at = bytes(padded).index(b"\xFF\xDB")  # first DQT
    padded[at:at] = b"\xFF"                # fill before DQT
    got = decode_jpeg(bytes(padded))
    assert np.array_equal(got, want)


def test_avi_mjpeg_keyframe_roundtrip():
    """MJPEG-in-AVI: container round-trip, idx1 keyframe selection (a
    delta-marked frame is skipped, never decoded), offset-convention
    tolerance, and exact DC-only pixel values through the r8 JPEG
    decoder."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.avi import (decode_avi_mjpeg_frames,
                                              encode_avi_mjpeg)
    from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    def dc_jpeg(dcvals):
        coeffs = np.zeros((2, 2, 8, 8), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                coeffs[by, bx, 0, 0] = dcvals[2 * by + bx]
        return encode_jpeg(None, quality=50, coeffs=coeffs)

    jp = [dc_jpeg([1, 2, 3, 4]), dc_jpeg([9, 9, 9, 9]),
          dc_jpeg([-5, 0, 5, 10])]
    blob = encode_avi_mjpeg(jpegs=jp, size=(16, 16),
                            keyframe_flags=[True, False, True])
    fr = decode_avi_mjpeg_frames(blob)
    assert len(fr) == 2                       # delta frame skipped
    assert np.array_equal(fr[0], decode_jpeg(jp[0]))
    assert np.array_equal(fr[1], decode_jpeg(jp[2]))
    assert int(fr[0][0, 0, 0]) == 2 * 1 + 128      # flat DC-only value
    assert int(fr[1][15, 15, 0]) == 2 * 10 + 128
    assert len(decode_avi_mjpeg_frames(blob, keyframes_only=False)) == 3
    assert len(decode_avi_mjpeg_frames(blob, max_frames=1)) == 1

    # pixel-frame encode path: lossy but shape/count exact
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    fr2 = decode_avi_mjpeg_frames(encode_avi_mjpeg([f, f], quality=85))
    assert len(fr2) == 2 and fr2[0].shape == (24, 32, 3)

    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg_frames(b"RIFX" + bytes(32))
    with pytest.raises(ValueError, match="keyframes"):
        # all frames delta-marked: keyframe sampling finds nothing
        decode_avi_mjpeg_frames(encode_avi_mjpeg(
            jpegs=jp, size=(16, 16),
            keyframe_flags=[False, False, False]))


def test_sample_video_frames_dispatch(spark):
    """sample_video_frames: AVI goes through the native MJPEG keyframe
    path, MP4 through the ISO-BMFF sample tables, GIF through the
    animation decoder, unknown containers raise."""
    import numpy as np

    from orange3_spark.multimodal.avi import encode_avi_mjpeg
    from orange3_spark.multimodal.gif import encode_gif_animation
    from orange3_spark.multimodal.jpeg import encode_jpeg
    from orange3_spark.multimodal.mp4 import encode_mp4_mjpeg

    f0 = np.full((6, 8, 3), 30, dtype=np.uint8)
    f1 = np.full((6, 8, 3), 200, dtype=np.uint8)
    avi = encode_avi_mjpeg([f0, f1], quality=95)
    gif = encode_gif_animation([f0, f1])
    mp4 = encode_mp4_mjpeg([encode_jpeg(f, quality=95) for f in (f0, f1)],
                           (6, 8))
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(gif)), (4, bytearray(mp4))],
        "media_id long, content binary")
    rows = M.sample_video_frames(df).collect()
    got = {(r.media_id, r.frame_no): (r.height, r.width) for r in rows}
    assert set(got) == {(1, 0), (1, 1), (2, 0), (2, 1), (4, 0), (4, 1)}
    assert all(v == (6, 8) for v in got.values())

    bad = spark.createDataFrame([(3, bytearray(b"\x00" * 64))],
                                "media_id long, content binary")
    import pytest
    with pytest.raises(Exception, match="native keyframe"):
        M.sample_video_frames(bad).collect()


def test_vp8_header_layer():
    """Lossy-VP8 frame-header parsing (pixels stay gated — round-9
    decision note in webp.py): header stub round-trip, segmentation /
    loop-filter-adjustment skipping, non-keyframe tag, truncation."""
    import pytest

    from orange3_spark.multimodal.webp import (_VP8BoolWriter,
                                               encode_vp8_header_stub,
                                               vp8_frame_header, webp_kind)

    blob = encode_vp8_header_stub(width=640, height=360, filter_level=23,
                                  sharpness=2, y_ac_qi=61,
                                  n_token_partitions=4)
    assert webp_kind(blob) == "lossy"
    h = vp8_frame_header(blob)
    assert h["keyframe"] and h["show_frame"] == 1
    assert (h["width"], h["height"]) == (640, 360)
    assert h["filter_level"] == 23 and h["sharpness"] == 2
    assert h["y_ac_qi"] == 61 and h["n_token_partitions"] == 4
    assert h["y_dc_delta"] == 0 and h["uv_ac_delta"] == 0

    # hand-build a header WITH segmentation + filter adjustments + quant
    # deltas so the parser's skip paths are exercised
    bw = _VP8BoolWriter()
    bw.write_bool(0); bw.write_bool(0)            # colorspace, clamping
    bw.write_bool(1)                              # segmentation on
    bw.write_bool(1)                              # update map
    bw.write_bool(1)                              # update data
    bw.write_bool(0)                              # delta mode
    for i in range(4):                            # quantizer seg deltas
        bw.write_bool(1); bw.write_signed(5 + i, 7)
    for _ in range(4):                            # lf seg deltas absent
        bw.write_bool(0)
    for _ in range(3):                            # segment tree probs
        bw.write_bool(1); bw.write_literal(200, 8)
    bw.write_bool(1)                              # filter type simple
    bw.write_literal(11, 6); bw.write_literal(7, 3)
    bw.write_bool(1)                              # lf adjustments enabled
    bw.write_bool(1)                              # delta update
    for i in range(8):
        bw.write_bool(1); bw.write_signed(-3, 6)
    bw.write_literal(1, 2)                        # 2 token partitions
    bw.write_literal(99, 7)                       # y_ac_qi
    bw.write_bool(1); bw.write_signed(-7, 4)      # y_dc_delta
    for _ in range(4):
        bw.write_bool(0)
    part0 = bw.finish()
    tag = (0) | (1 << 4) | (len(part0) << 5)
    payload = (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
               + b"\x9d\x01\x2a" + b"\x40\x01\xf0\x00" + part0)  # 320x240
    h2 = vp8_frame_header(payload)                # bare payload path
    assert h2["segmentation_enabled"] == 1
    assert h2["filter_type"] == 1 and h2["filter_level"] == 11
    assert h2["sharpness"] == 7
    assert h2["n_token_partitions"] == 2
    assert h2["y_ac_qi"] == 99 and h2["y_dc_delta"] == -7
    assert (h2["width"], h2["height"]) == (320, 240)

    # non-keyframe: tag bit 0 set — no start code / dimensions
    nk_tag = 1 | (1 << 4) | (8 << 5)
    nk = bytes([nk_tag & 0xFF, (nk_tag >> 8) & 0xFF,
                (nk_tag >> 16) & 0xFF]) + bytes(16)
    h3 = vp8_frame_header(nk)
    assert not h3["keyframe"] and "width" not in h3

    with pytest.raises(ValueError, match="start code"):
        vp8_frame_header(bytes([0, 0, 0]) + b"XXX" + bytes(8))
    with pytest.raises(ValueError, match="too short"):
        vp8_frame_header(b"\x00\x00")


def test_mp4_mjpeg_keyframe_roundtrip():
    """ISO-BMFF: box-tree walk, stss sync selection (a non-sync sample
    is skipped, never decoded), the absent-stss "all sync" spec
    default, metadata parse, and exact DC-only pixels through the r8
    JPEG decoder."""
    import numpy as np
    import pytest

    from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from orange3_spark.multimodal.mp4 import (decode_mp4_mjpeg_frames,
                                              encode_mp4_mjpeg,
                                              extract_mp4_keyframes,
                                              parse_mp4)

    def dc_jpeg(dcvals):
        coeffs = np.zeros((2, 2, 8, 8), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                coeffs[by, bx, 0, 0] = dcvals[2 * by + bx]
        return encode_jpeg(None, quality=50, coeffs=coeffs)

    jp = [dc_jpeg([1, 2, 3, 4]), dc_jpeg([9, 9, 9, 9]),
          dc_jpeg([-5, 0, 5, 10])]
    blob = encode_mp4_mjpeg(jp, (16, 16), sync_flags=[True, False, True])
    m = parse_mp4(blob)
    assert (m["brand"], m["codec"]) == ("isom", "jpeg")
    assert (m["width"], m["height"]) == (16, 16)
    assert (m["n_samples"], m["n_sync"]) == (3, 2)

    fr = decode_mp4_mjpeg_frames(blob)
    assert len(fr) == 2                       # non-sync sample skipped
    assert np.array_equal(fr[0], decode_jpeg(jp[0]))
    assert np.array_equal(fr[1], decode_jpeg(jp[2]))
    assert int(fr[0][0, 0, 0]) == 2 * 1 + 128
    assert int(fr[1][15, 15, 0]) == 2 * 10 + 128

    # no stss box written when every sample is sync — and the reader's
    # spec default then selects ALL samples
    allsync = encode_mp4_mjpeg(jp, (16, 16))
    assert b"stss" not in allsync
    assert parse_mp4(allsync)["n_sync"] == 3
    assert len(decode_mp4_mjpeg_frames(allsync)) == 3
    assert len(decode_mp4_mjpeg_frames(allsync, max_frames=1)) == 1

    # inter-coded fourcc: metadata parses, pixel decode gates loudly
    gated = encode_mp4_mjpeg(jp, (16, 16), codec=b"avc1")
    assert parse_mp4(gated)["codec"] == "avc1"
    with pytest.raises(ValueError, match="no native pixel decoder"):
        decode_mp4_mjpeg_frames(gated)

    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00\x00\x00\x08free" + bytes(16))


def test_mp4_sample_table_runmap_and_co64():
    """The sample-table paths the harness encoder doesn't produce:
    a multi-entry stsc run-map (3 chunks holding 2+2+1 samples) and
    64-bit co64 chunk offsets — hand-built stbl, decoded through the
    public reader."""
    import struct

    from orange3_spark.multimodal.mp4 import (_box, _full,
                                              extract_mp4_keyframes)

    payloads = [bytes([0xFF, 0xD8, i]) + bytes(4 + i) for i in range(5)]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = _box(b"mdat", b"".join(payloads))
    base = len(ftyp) + 8
    sizes = [len(p) for p in payloads]
    # chunks: [s0 s1] [s2 s3] [s4]  — stsc runs (1,2,1) then (3,1,1)
    chunk_offs = [base,
                  base + sizes[0] + sizes[1],
                  base + sum(sizes[:4])]
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
                 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", 8, 8) + b"\x00" * 46)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 5, 100))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">III", 1, 2, 1)
                 + struct.pack(">III", 3, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 5)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    co64 = _full(b"co64", 0, 0, struct.pack(">I", 3)
                 + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    stss = _full(b"stss", 0, 0, struct.pack(">II", 2, 2)
                 + struct.pack(">I", 5))          # samples 2 and 5 sync
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + co64)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"h\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 500,
                                            0x55C4, 0))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 500)
                 + bytes(80))
    moov = _box(b"moov", mvhd + _box(b"trak", mdia))
    blob = ftyp + mdat + moov

    codec, picks = extract_mp4_keyframes(blob)
    assert codec == b"jpeg"
    assert picks == [payloads[1], payloads[4]]    # run-map + co64 exact
    _, allp = extract_mp4_keyframes(blob, keyframes_only=False)
    assert allp == payloads


def test_webm_ebml_parse_and_keyframe_extraction():
    """WebM/EBML: vint/element walk, doctype + track metadata, keyframe
    flag selection, payload extraction bit-exactness, and the compose
    with the VP8 header layer; unknown-size Segment tolerated."""
    import pytest

    from orange3_spark.multimodal.webm import (SEGMENT, _read_vint,
                                               _vint, encode_webm_vp8,
                                               extract_webm_keyframes,
                                               parse_webm)
    from orange3_spark.multimodal.webp import (encode_vp8_header_stub,
                                               vp8_frame_header)

    # vint round-trip across length boundaries
    for n in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2 ** 35):
        enc = _vint(n)
        val, ln, unk = _read_vint(enc, 0)
        assert (val, ln, unk) == (n, len(enc), False)

    stubs = [encode_vp8_header_stub(width=320, height=240,
                                    filter_level=f, y_ac_qi=9 + f,
                                    n_token_partitions=1)
             for f in range(3)]
    blob = encode_webm_vp8(stubs, 320, 240,
                           keyframe_flags=[True, False, True])
    m = parse_webm(blob)
    assert (m["doctype"], m["codec"]) == ("webm", "V_VP8")
    assert (m["width"], m["height"]) == (320, 240)
    assert (m["n_blocks"], m["n_key"]) == (3, 2)
    assert m["duration_ms"] == 1000.0

    codec, kf = extract_webm_keyframes(blob)
    assert codec == "V_VP8" and len(kf) == 2
    assert kf[0] == stubs[0] and kf[1] == stubs[2]      # bit-exact
    h = vp8_frame_header(kf[1])
    assert (h["width"], h["filter_level"], h["y_ac_qi"]) == (320, 2, 11)

    # non-VP8 codec id and matroska doctype surface verbatim
    mkv = encode_webm_vp8(stubs[:1], 64, 48, codec=b"V_VP9",
                          doctype=b"matroska")
    m2 = parse_webm(mkv)
    assert (m2["doctype"], m2["codec"]) == ("matroska", "V_VP9")

    # unknown-size Segment (live-stream muxing) still walks
    i = blob.index(SEGMENT) + len(SEGMENT)
    val, ln, unk = _read_vint(blob, i)
    assert not unk
    hacked = blob[:i] + b"\xff" + blob[i + ln:]
    assert parse_webm(hacked)["n_key"] == 2

    with pytest.raises(ValueError, match="EBML"):
        parse_webm(b"\x00\x00\x00\x00" + bytes(16))


def test_mpegts_parse_and_rai_counting():
    """MPEG-TS: sync walk, PAT->PMT stream-type resolution, adaptation
    field RAI counting, continuity tracking, garbage resync, truncated
    tail tolerance."""
    import pytest

    from orange3_spark.multimodal.ts import TS_PACKET, encode_ts, parse_ts

    blob = encode_ts({0x101: 0x1B, 0x102: 0x0F},
                     n_packets_per_pid={0x101: 10, 0x102: 4},
                     rai_every=3)
    m = parse_ts(blob)
    assert m["n_packets"] == 2 + 10 + 4
    assert m["programs"] == {0x101: "h264", 0x102: "aac"}
    assert (m["video_pid"], m["n_video_packets"]) == (0x101, 10)
    assert m["n_rai"] == 4                       # i = 0, 3, 6, 9
    assert m["continuity_errors"] == 0
    assert m["n_pids"] == 4                      # PAT, PMT, two ES pids
    assert len(blob) % TS_PACKET == 0

    # leading garbage resyncs; a truncated final packet is ignored
    noisy = b"\x00garbage\x47more" + blob + blob[:97]
    m2 = parse_ts(noisy)
    assert m2["n_packets"] == m["n_packets"]
    assert m2["n_rai"] == 4

    # a dropped video packet shows as exactly one continuity error
    pkts = [blob[i:i + TS_PACKET] for i in range(0, len(blob), TS_PACKET)]
    vid = [i for i, p in enumerate(pkts)
           if ((p[1] & 0x1F) << 8 | p[2]) == 0x101]
    dropped = b"".join(p for i, p in enumerate(pkts) if i != vid[4])
    assert parse_ts(dropped)["continuity_errors"] == 1

    # hevc stream type resolves; unknown types surface as hex
    m3 = parse_ts(encode_ts({0x200: 0x24, 0x201: 0x42},
                            n_packets_per_pid={0x200: 2, 0x201: 1}))
    assert m3["programs"][0x200] == "hevc"
    assert m3["programs"][0x201] == "0x42"

    with pytest.raises(ValueError, match="sync"):
        parse_ts(b"\x00" * 400)


def test_webm_multitrack_counts_only_video_blocks():
    """r9 advisor: on an audio+video WebM, block/keyframe counts and
    keyframe extraction must cover ONLY the selected video track —
    audio SimpleBlocks always set the keyframe bit and must never be
    handed to the VP8 header parser."""
    from orange3_spark.multimodal.webm import (encode_webm_vp8,
                                               extract_webm_keyframes,
                                               parse_webm)
    from orange3_spark.multimodal.webp import (encode_vp8_header_stub,
                                               vp8_frame_header)

    stubs = [encode_vp8_header_stub(width=160, height=120,
                                    filter_level=1, y_ac_qi=10,
                                    n_token_partitions=1)
             for _ in range(3)]
    # audio payloads are NOT valid VP8 frames — if the walk ever picks
    # one, vp8_frame_header raises and the compose breaks
    audio = [b"\x01vorbis-ish" + bytes([i]) * 20 for i in range(3)]
    blob = encode_webm_vp8(stubs, 160, 120,
                           keyframe_flags=[True, False, True],
                           audio_frames=audio)
    m = parse_webm(blob)
    assert m["video_track"] == 1
    # 3 video + 3 audio SimpleBlocks in the cluster; counts see video only
    assert (m["n_blocks"], m["n_key"]) == (3, 2)

    codec, kf = extract_webm_keyframes(blob)
    assert codec == "V_VP8" and len(kf) == 2
    assert kf[0] == stubs[0] and kf[1] == stubs[2]
    h = vp8_frame_header(kf[0])
    assert (h["width"], h["height"]) == (160, 120)


def test_mpegts_duplicate_packet_is_legal():
    """ISO 13818-1 §2.4.3.3: ONE repetition of a packet (same
    continuity counter) is legal and must not count as a continuity
    error; a second repetition or any other non-increment still does."""
    from orange3_spark.multimodal.ts import TS_PACKET, encode_ts, parse_ts

    blob = encode_ts({0x101: 0x1B}, n_packets_per_pid={0x101: 6})
    pkts = [blob[i:i + TS_PACKET] for i in range(0, len(blob), TS_PACKET)]
    vid = [i for i, p in enumerate(pkts)
           if ((p[1] & 0x1F) << 8 | p[2]) == 0x101]

    # duplicate one video packet once: legal, zero errors
    dup_once = pkts[:]
    dup_once.insert(vid[2] + 1, pkts[vid[2]])
    m = parse_ts(b"".join(dup_once))
    assert m["continuity_errors"] == 0
    assert m["n_packets"] == len(pkts) + 1

    # the SAME packet three times in a row: the second repetition is
    # the error
    dup_twice = pkts[:]
    dup_twice.insert(vid[2] + 1, pkts[vid[2]])
    dup_twice.insert(vid[2] + 2, pkts[vid[2]])
    assert parse_ts(b"".join(dup_twice))["continuity_errors"] == 1

    # a dup followed by a dropped packet is still exactly one error
    drop_after_dup = pkts[:]
    drop_after_dup.insert(vid[2] + 1, pkts[vid[2]])
    del drop_after_dup[vid[3] + 1]          # drops original vid[3]
    assert parse_ts(b"".join(drop_after_dup))["continuity_errors"] == 1

    # stuck CC (a real capture failure mode): N copies of one packet =
    # N-2 errors — one dup is legal, every later repetition counts (a
    # flag that resets after each counted error would halve this)
    stuck = pkts[:]
    for _ in range(5):
        stuck.insert(vid[2] + 1, pkts[vid[2]])
    assert parse_ts(b"".join(stuck))["continuity_errors"] == 4
