"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No equivalent in the reference (tabular only) — this is the project-brief
extension for training-data pipelines.  Design:

  * a media column is ``binary`` plus a sibling metadata struct
    (``format``, ``byte_len``, ``content_hash``) kept in ordinary columns so
    filters/joins/dedup prune WITHOUT touching the blobs;
  * cheap metadata (magic-byte sniff, length, hash) is pure Column
    expressions — codegen, pushdown-friendly;
  * heavy per-item work (decode, resize, frame-sample, feature-extract) runs
    as Arrow-batched ``mapInPandas`` so blobs stream through Python in
    columnar batches, never row-at-a-time;
  * the actual pixel/sample decoding is STUBBED (Pillow/ffmpeg are not in
    this container): ``decode_image(..., stub=True)`` produces a
    deterministic fake decode so the Spark-side plumbing — schema,
    partitioning, batch shape — is real and tested; ``stub=False`` raises
    ``NotImplementedError`` where the real library call belongs.

Scale notes: blobs ride in parquet binary columns; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs fits in
executor memory, and project metadata columns FIRST so Catalyst prunes the
binary column out of scans that don't need it.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (format, ((offset, magic-bytes), ...)) — sniffed via substring compares
# on the binary col.  RIFF is a CONTAINER: WAV and WebP share the RIFF
# prefix and split on the form type at offset 8.
MAGIC = (
    ("png", ((0, bytes([0x89, 0x50, 0x4E, 0x47])),)),
    ("jpeg", ((0, bytes([0xFF, 0xD8, 0xFF])),)),
    ("gif", ((0, b"GIF8"),)),
    ("tiff", ((0, b"II*\x00"),)),
    ("tiff", ((0, b"MM\x00*"),)),
    ("bmp", ((0, b"BM"),)),
    ("ppm", ((0, b"P6"),)),
    ("webp", ((0, b"RIFF"), (8, b"WEBP"))),
    ("avi", ((0, b"RIFF"), (8, b"AVI "))),
    ("wav", ((0, b"RIFF"),)),
    ("mp4", ((4, b"ftyp"),)),
    ("webm", ((0, bytes([0x1A, 0x45, 0xDF, 0xA3])),)),
    ("mpegts", ((0, b"\x47"), (188, b"\x47"))),
    ("mp3", ((0, b"ID3"),)),
    ("pdf", ((0, b"%PDF"),)),
)


def sniff_format(col: Column) -> Column:
    """Container format from magic bytes — a chain of codegen'd
    substring compares, no UDF.  Multi-part rules (RIFF form types)
    AND their compares; order matters (webp before the bare-RIFF wav
    fallback)."""
    expr = None
    for name, parts in MAGIC:
        cond = None
        for off, magic in parts:
            c = F.substring(col, off + 1, len(magic)) == F.lit(bytearray(magic))
            cond = c if cond is None else cond & c
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit("unknown"))


def media_metadata(df: DataFrame, binary_col: str = "content",
                   prefix: str = "media_") -> DataFrame:
    """Attach format/length/hash metadata columns (blob untouched)."""
    c = F.col(binary_col)
    return (df.withColumn(f"{prefix}format", sniff_format(c))
              .withColumn(f"{prefix}bytes", F.octet_length(c).cast("long"))
              .withColumn(f"{prefix}hash", F.md5(c)))


def dedup_media_exact(df: DataFrame, binary_col: str = "content",
                      id_col: str = "media_id") -> DataFrame:
    """Exact blob dedup on content hash — same shape as text dedup_exact."""
    return (df.withColumn("_h", F.md5(F.col(binary_col)))
              .groupBy("_h")
              .agg(F.min(id_col).alias(id_col),
                   F.count(F.lit(1)).alias("n_copies"))
              .drop("_h"))


# ------------------------------------------------------------ decode plumbing

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("pixels", T.ArrayType(T.FloatType())),
])


def decode_image(df: DataFrame, binary_col: str = "content",
                 id_col: str = "media_id", *, height: int = 8, width: int = 8,
                 stub: bool = True, decoder: Optional[str] = None) -> DataFrame:
    """Decode blobs to (H, W, C) pixel arrays via Arrow-batched mapInPandas.

    Decoder modes (``decoder`` overrides the legacy ``stub`` flag):

    * ``"stub"`` (default): a deterministic fake — pixels are a seeded
      function of the blob bytes, so tests are exact and the plumbing
      (batching, schema, memory shape) matches the real decode.
    * ``"native"``: REAL pure-Python decode of uncompressed BMP, binary
      PPM, 8-bit PNG, GIF87a/89a first frames (variable-width LZW,
      interlacing), TIFF (none/LZW/Deflate/PackBits, strips AND tiles,
      8- and 16-bit samples, predictor, both byte orders), lossless
      WebP (the full VP8L bitstream), and
      huffman JPEG in all its common shapes —
      baseline/extended sequential AND progressive scans at 8 or 12
      bits, LOSSLESS (SOF3), any chroma
      subsampling, restart intervals (``multimodal/codecs.py`` +
      ``multimodal/jpeg.py`` — header parse, row padding, bottom-up
      order, BGR→RGB, zlib inflate, Paeth unfiltering, palette
      application, huffman entropy decode incl. T.81 Annex G
      successive approximation, dequant, IDCT; no optional deps), with
      deterministic nearest-neighbor resize to ``width×height``.
    * ``"pillow"``: Pillow for the exotic rest (arithmetic-coded /
      hierarchical JPEG, CMYK, lossy VP8 WebP,
      CCITT/JPEG-in-TIFF);
      without Pillow this
      raises NotImplementedError up front — an honest gate, not a
      silent fake.
    * ``"auto"``: native for BMP/PPM/PNG/GIF/TIFF/JPEG magic bytes, Pillow
      otherwise (the gate applies only if a non-native format actually
      appears).
    """
    if decoder is None:
        decoder = "stub" if stub else "pillow"
    if decoder not in ("stub", "native", "pillow", "auto"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pillow":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "exotic formats (arithmetic/hierarchical JPEG, "
                "CMYK, lossy VP8 WebP, CCITT/JPEG-in-TIFF) need Pillow — "
                "not installed in this container; decoder='native' handles "
                "BMP/PPM/PNG/GIF/TIFF(strips+tiles, 8/16-bit)/VP8L-WebP and "
                "huffman JPEG (baseline, progressive, lossless, 8/12-bit, "
                "subsampled, restart markers), decoder='stub' is the "
                "deterministic fake") from exc

    def run(pdf_iter):
        import numpy as np
        import pandas as pd

        from orange3_spark.multimodal.codecs import decode_any

        def _real(blob: bytes) -> "np.ndarray":
            if decoder != "pillow":
                try:
                    return decode_any(blob)
                except ValueError:
                    if decoder == "native":
                        raise
            try:
                import io

                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "blob is not BMP/PPM/PNG/huffman-JPEG and Pillow is "
                    "unavailable") from exc
            img = Image.open(io.BytesIO(blob)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                if decoder == "stub":
                    data = np.frombuffer(bytes(blob), dtype=np.uint8)
                    seed = int(data[:8].sum()) if data.size else 0
                    rng = np.random.default_rng(seed)
                    px = rng.random(height * width * 3, dtype=np.float32)
                else:
                    arr = _real(bytes(blob))
                    h0, w0 = arr.shape[:2]
                    if (h0, w0) != (height, width):
                        # deterministic nearest-neighbor resample
                        yi = (np.arange(height) * h0) // height
                        xi = (np.arange(width) * w0) // width
                        arr = arr[yi][:, xi]
                    px = (arr.astype(np.float32) / 255.0).ravel()
                out.append((mid, height, width, 3, px.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "height", "width", "channels",
                              "pixels"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=IMAGE_SCHEMA)


def image_stats(decoded: DataFrame) -> DataFrame:
    """Per-image channel means over the decoded pixel array — array aggs on
    the long-form pixels (no Python)."""
    px = F.col("pixels")
    n = F.size(px)
    return decoded.select(
        "media_id", "height", "width", "channels",
        (F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / n).alias("mean_px"))


def byte_histogram(df: DataFrame, binary_col: str = "content",
                   id_col: str = "media_id") -> DataFrame:
    """256-bin byte histogram + entropy per blob (real computation, works on
    any binary payload) — Arrow-batched numpy bincount."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ])

    def run(pdf_iter):
        import numpy as np
        import pandas as pd
        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                data = np.frombuffer(bytes(blob), dtype=np.uint8)
                if data.size:
                    hist = np.bincount(data, minlength=256)
                    p = hist[hist > 0] / data.size
                    ent = float(-(p * np.log2(p)).sum())
                    mean = float(data.mean())
                else:
                    hist, ent, mean = np.zeros(256, dtype=np.int64), 0.0, 0.0
                out.append((mid, ent, mean, hist.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "entropy", "mean_byte", "histogram"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, binary_col: str = "content",
                  id_col: str = "media_id", *, every_n_bytes: int = 1024,
                  frame_bytes: int = 64, max_frames: int = 16) -> DataFrame:
    """Byte-offset frame-sampling PLUMBING — retired (round 9) to blobs
    whose container has no native path: AVI/MJPEG goes through
    :func:`sample_video_frames` and GIF through :func:`sample_gif_frames`,
    both decoding REAL frames; this deterministic slice remains only as
    the schema-stable stand-in for containers this environment cannot
    decode (MP4/WebM — no ffmpeg here).  Output is long-form
    (media_id, frame_no, frame_bytes)."""
    offsets = F.sequence(
        F.lit(0),
        F.least(F.lit(max_frames - 1),
                F.floor(F.octet_length(binary_col) / every_n_bytes).cast("int")))
    return (df.select(
        F.col(id_col),
        F.posexplode(F.transform(
            offsets,
            lambda i: F.substring(F.col(binary_col),
                                  (i * every_n_bytes + 1).cast("int"),
                                  frame_bytes)))
        .alias("frame_no", "frame")))


def resize_image(decoded: DataFrame, out_height: int, out_width: int,
                 *, id_col: str = "media_id") -> DataFrame:
    """Nearest-neighbor resize over decoded pixel arrays — Arrow-batched
    numpy (no codec needed, so unlike the decode stub this is the real
    operation).  Index map: ``src = floor((dst + 0.5) * in/out)`` per axis
    (pixel-center convention).  Input/output schema matches
    ``decode_image`` so the operators compose."""
    def run(pdf_iter):
        import numpy as np
        import pandas as pd
        for pdf in pdf_iter:
            out = []
            for mid, h, w, c, px in zip(pdf[id_col], pdf["height"],
                                        pdf["width"], pdf["channels"],
                                        pdf["pixels"]):
                a = np.asarray(px, dtype=np.float32).reshape(h, w, c)
                ys = np.minimum((np.arange(out_height) + 0.5)
                                * h / out_height, h - 1).astype(np.int64)
                xs = np.minimum((np.arange(out_width) + 0.5)
                                * w / out_width, w - 1).astype(np.int64)
                r = a[ys][:, xs]
                out.append((mid, out_height, out_width, int(c),
                            r.ravel().tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "height", "width", "channels",
                              "pixels"])

    return decoded.select(id_col, "height", "width", "channels", "pixels") \
                  .mapInPandas(run, schema=IMAGE_SCHEMA)


def classify_decodability(df: DataFrame, binary_col: str = "content",
                          id_col: str = "media_id") -> DataFrame:
    """Per-blob decode-path classification — the measurement behind the
    Pillow gate (media.py decode_image): which fraction of a corpus the
    native codecs handle vs what needs the gated exotic path.  Round 10:
    sequential, progressive AND lossless huffman JPEG (SOF0/1/2/3),
    GIF, TIFF (strips/tiles, 8/16-bit), and LOSSLESS WebP (VP8L) are
    all native now — the gate covers only arithmetic/hierarchical JPEG
    frames (SOF5+) and lossy (VP8) WebP.

    JPEG frame typing needs a marker-segment walk (the SOF position
    varies), which is not expressible as a fixed-offset prefix compare —
    one Arrow-batched mapInPandas, never per-row Python.  Returns
    ``(id, format, decode_path)`` with decode_path in
    {'native', 'pillow-gated', 'unknown'}."""
    import pandas as pd

    from orange3_spark.multimodal.jpeg import (jpeg_lossless_native,
                                               jpeg_sof)
    from orange3_spark.multimodal.webp import webp_kind

    def run(pdf_iter):
        for pdf in pdf_iter:
            fmts, paths = [], []
            for blob in pdf[binary_col]:
                b = bytes(blob)
                fmt = next(
                    (n for n, parts in MAGIC
                     if all(b[off:off + len(mg)] == mg for off, mg in parts)),
                    "unknown")
                if fmt == "jpeg":
                    sof = jpeg_sof(b)
                    # SOF3 is native only inside the implemented scope
                    # (no DRI, 1x1 factors) — restarted/subsampled
                    # lossless frames stay honestly gated
                    path = ("native" if sof in (0, 1, 2)
                            or (sof == 3 and jpeg_lossless_native(b)) else
                            "pillow-gated" if sof is not None else
                            "unknown")
                elif fmt in ("bmp", "ppm", "png", "gif", "tiff"):
                    path = "native"
                elif fmt == "webp":
                    kind = webp_kind(b)
                    path = ("native" if kind == "lossless" else
                            "pillow-gated" if kind == "lossy" else
                            "unknown")
                else:
                    path = "unknown"
                fmts.append(fmt)
                paths.append(path)
            yield pd.DataFrame({id_col: pdf[id_col], "format": fmts,
                                "decode_path": paths})

    return (df.select(id_col, binary_col)
            .mapInPandas(run, f"{id_col} long, format string, "
                              "decode_path string"))


def sample_gif_frames(df: DataFrame, binary_col: str = "content",
                      id_col: str = "media_id", *,
                      max_frames: int = 16) -> DataFrame:
    """REAL animation frame sampling for GIF blobs (round 8 — the
    byte-offset ``sample_frames`` stub stays for formats without a
    native decoder): decodes up to ``max_frames`` COMPOSITED frames
    per blob (GIF89a disposal + transparency semantics,
    multimodal/gif.decode_gif_frames) in one Arrow-batched
    mapInPandas, long-form ``(id, frame_no, height, width, pixels)``
    matching decode_image's pixel convention so downstream resize /
    stats compose."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ])

    def run(pdf_iter):
        import numpy as np
        import pandas as pd

        from orange3_spark.multimodal.gif import decode_gif_frames

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                frames = decode_gif_frames(bytes(blob),
                                           max_frames=max_frames)
                for fno, f in enumerate(frames):
                    out.append((int(mid), fno, f.shape[0], f.shape[1],
                                (f.astype(np.float32) / 255.0)
                                .ravel().tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "height", "width",
                              "pixels"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def sample_video_frames(df: DataFrame, binary_col: str = "content",
                        id_col: str = "media_id", *,
                        max_frames: int = 16) -> DataFrame:
    """REAL video keyframe extraction (round 9): MJPEG-in-AVI blobs are
    parsed natively (multimodal/avi.py — idx1 AVIIF_KEYFRAME selection),
    MP4 blobs through the ISO-BMFF sample tables (multimodal/mp4.py —
    stss sync-sample selection; JPEG-coded tracks only, inter-coded
    codecs raise to the gate), each I-frame decoded by the round-8 JPEG
    decoder, and GIF blobs go
    through the composited-animation decoder; one Arrow-batched
    mapInPandas, long-form ``(id, frame_no, height, width, pixels)``
    matching decode_image's convention so resize / stats compose.
    ``frame_no`` numbers the SELECTED keyframes — delta frames a
    container marks non-key are skipped, never decoded.  Unknown
    containers raise loudly (the byte-slice ``sample_frames`` stub is
    the schema-stable stand-in for those)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ])

    def run(pdf_iter):
        import numpy as np
        import pandas as pd

        from orange3_spark.multimodal.avi import decode_avi_mjpeg_frames
        from orange3_spark.multimodal.gif import decode_gif_frames
        from orange3_spark.multimodal.mp4 import decode_mp4_mjpeg_frames

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                    frames = decode_avi_mjpeg_frames(blob,
                                                     max_frames=max_frames)
                elif blob[4:8] == b"ftyp":
                    frames = decode_mp4_mjpeg_frames(blob,
                                                     max_frames=max_frames)
                elif blob[:6] in (b"GIF87a", b"GIF89a"):
                    frames = decode_gif_frames(blob, max_frames=max_frames)
                else:
                    raise ValueError(
                        "no native keyframe decoder for this container "
                        "(use sample_frames for the byte-slice stand-in)")
                for fno, f in enumerate(frames):
                    out.append((int(mid), fno, f.shape[0], f.shape[1],
                                (f.astype(np.float32) / 255.0)
                                .ravel().tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "height", "width",
                              "pixels"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def vp8_metadata(df: DataFrame, binary_col: str = "content",
                 id_col: str = "media_id") -> DataFrame:
    """Lossy-VP8 header metadata per blob (round 9): dimensions, loop
    filter level, quantizer index, token partition count — parsed
    natively from the uniform-probability boolean header layer
    (multimodal/webp.vp8_frame_header), no pixel decode, no Pillow.
    This is the corpus-triage surface for the one image format whose
    PIXELS stay behind the gate (see webp.py's round-9 decision note):
    resolution/quality histograms over 100 TB of crawl WebPs without
    decoding one macroblock.  One Arrow-batched mapInPandas."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("filter_level", T.IntegerType()),
        T.StructField("y_ac_qi", T.IntegerType()),
        T.StructField("n_token_partitions", T.IntegerType()),
    ])

    def run(pdf_iter):
        import pandas as pd

        from orange3_spark.multimodal.webp import vp8_frame_header

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                h = vp8_frame_header(bytes(blob))
                out.append((int(mid), h.get("width", -1),
                            h.get("height", -1), h["filter_level"],
                            h["y_ac_qi"], h["n_token_partitions"]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height",
                              "filter_level", "y_ac_qi",
                              "n_token_partitions"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def mp4_metadata(df: DataFrame, binary_col: str = "content",
                 id_col: str = "media_id") -> DataFrame:
    """ISO-BMFF track metadata per blob (round 9, multimodal/mp4.py):
    brand, video codec fourcc, dimensions, movie duration (media
    timescale units), sample and sync-sample counts — parsed from the
    box/sample tables with no pixel decode.  The corpus-triage surface
    for inter-coded MP4s (avc1 & co), the video analogue of
    :func:`vp8_metadata`: duration/resolution/codec histograms over
    100 TB of crawl video without decoding one frame.  One
    Arrow-batched mapInPandas."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_sync", T.IntegerType()),
    ])

    def run(pdf_iter):
        import pandas as pd

        from orange3_spark.multimodal.mp4 import parse_mp4

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                m = parse_mp4(bytes(blob))
                out.append((int(mid), m["brand"], m["codec"] or "????",
                            m["width"] or -1, m["height"] or -1,
                            int(m["duration"] or -1), m["n_samples"],
                            m["n_sync"]))
            yield pd.DataFrame(
                out, columns=["media_id", "brand", "codec", "width",
                              "height", "duration", "n_samples",
                              "n_sync"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def webm_metadata(df: DataFrame, binary_col: str = "content",
                  id_col: str = "media_id") -> DataFrame:
    """WebM/Matroska metadata per blob (round 9, multimodal/webm.py):
    doctype, video codec id, declared dimensions, duration, block and
    keyframe counts from the EBML tree — PLUS the first extracted VP8
    keyframe's own header fields (width/filter level/quantizer) via
    ``webp.vp8_frame_header``, the two native layers composed.  No
    macroblock is decoded; the VP8/VP9 pixel gate stands (decision
    note in webp.py).  One Arrow-batched mapInPandas."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("doctype", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_key", T.IntegerType()),
        T.StructField("kf_filter_level", T.IntegerType()),
        T.StructField("kf_y_ac_qi", T.IntegerType()),
    ])

    def run(pdf_iter):
        import pandas as pd

        from orange3_spark.multimodal.webm import (extract_webm_keyframes,
                                                   parse_webm)
        from orange3_spark.multimodal.webp import vp8_frame_header

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                m = parse_webm(blob)
                fl = qi = -1
                if m["codec"] == "V_VP8" and m["n_key"]:
                    _, kf = extract_webm_keyframes(blob, max_frames=1)
                    if kf:
                        h = vp8_frame_header(kf[0])
                        fl = h.get("filter_level", -1)
                        qi = h.get("y_ac_qi", -1)
                out.append((int(mid), m["doctype"] or "?",
                            m["codec"] or "?", m["width"] or -1,
                            m["height"] or -1, m["n_blocks"],
                            m["n_key"], fl, qi))
            yield pd.DataFrame(
                out, columns=["media_id", "doctype", "codec", "width",
                              "height", "n_blocks", "n_key",
                              "kf_filter_level", "kf_y_ac_qi"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)


def ts_metadata(df: DataFrame, binary_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """MPEG-TS metadata per blob (round 9, multimodal/ts.py): packet
    and PID counts, PAT→PMT stream types, the video PID's packet count
    and random-access-point count (the transport-layer keyframe
    marker), continuity errors — broadcast/capture triage with no
    elementary-stream decode, completing the MP4/WebM/TS container
    trio.  One Arrow-batched mapInPandas."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_packets", T.IntegerType()),
        T.StructField("n_pids", T.IntegerType()),
        T.StructField("video_pid", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("n_video_packets", T.IntegerType()),
        T.StructField("n_rai", T.IntegerType()),
        T.StructField("continuity_errors", T.IntegerType()),
    ])

    def run(pdf_iter):
        import pandas as pd

        from orange3_spark.multimodal.ts import parse_ts

        for pdf in pdf_iter:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                m = parse_ts(bytes(blob))
                vp = m["video_pid"]
                out.append((int(mid), m["n_packets"], m["n_pids"],
                            vp if vp is not None else -1,
                            m["programs"].get(vp, "?"),
                            m["n_video_packets"], m["n_rai"],
                            m["continuity_errors"]))
            yield pd.DataFrame(
                out, columns=["media_id", "n_packets", "n_pids",
                              "video_pid", "video_codec",
                              "n_video_packets", "n_rai",
                              "continuity_errors"])

    return df.select(F.col(id_col), F.col(binary_col)) \
             .mapInPandas(run, schema=schema)
