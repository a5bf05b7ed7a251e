"""MJPEG-in-AVI: native video keyframe extraction (round 9).

The reference (biolab/orange3) has no video surface at all — this module
closes the LLM-pipeline gap flagged in the r8 verdict: ``sample_frames``
was a byte-offset stub for every non-GIF container, so real corpora
(screen recordings, dataset videos) silently degraded to fake bytes.
MJPEG-in-AVI is the simplest real-world container whose frames are
independently decodable JPEGs, which means the round-8 baseline JPEG
decoder (multimodal/jpeg.py) is reused as-is and every extracted frame
is verifiable to the pixel.

Format notes (public RIFF/AVI spec, msdn AVIMAINHEADER et al.):

* ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  00dc...) idx1)`` — chunk sizes exclude the 8-byte header; chunk data
  is padded to EVEN length (the pad byte is not counted in the size).
* frame chunks are ``##dc``/``##db`` (compressed / uncompressed DIB of
  stream ##); for MJPEG each carries one complete JFIF stream.
* ``idx1`` entries carry AVIIF_KEYFRAME (0x10).  In MJPEG every frame
  is intra-coded, so every frame is a keyframe — but the reader honors
  the flags so a container marking delta frames samples I-frames only,
  which is the semantics "keyframe extraction" promises.

Like the other native codecs, the encoder exists as the test/corpus
harness (this container has no ffmpeg here): pytest proves
encode → decode round-trips against the JPEG decoder's output, and the
oracle recomputes frame checksums from the construction alone.
"""

from __future__ import annotations

import struct

import numpy as np

from orange3_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(frames=None, *, jpegs=None, size=None, fps: int = 10,
                     quality: int = 90, keyframe_flags=None) -> bytes:
    """(H, W, 3) uint8 frames → MJPEG-in-AVI bytes.

    ``jpegs`` + ``size=(h, w)``: pass pre-encoded JPEG payloads instead
    of pixel frames (the exactness corpora inject DC-only coefficient
    frames the way q_media_decode_jpeg does).  ``keyframe_flags``:
    optional per-frame bools for the idx1 AVIIF_KEYFRAME bit (default:
    every frame, the MJPEG truth) — lets tests construct containers
    where only SOME frames are marked keyframes to pin the reader's
    I-frame selection."""
    if jpegs is not None:
        if not jpegs or size is None:
            raise ValueError("jpegs= needs at least one payload and size=")
        h, w = size
        jpegs = list(jpegs)
    else:
        if not frames:
            raise ValueError("need at least one frame")
        h, w = frames[0].shape[:2]
        if any(f.shape[:2] != (h, w) for f in frames):
            raise ValueError("all frames must share one size")
        jpegs = [encode_jpeg(np.ascontiguousarray(f), quality=quality)
                 for f in frames]
    if keyframe_flags is None:
        keyframe_flags = [True] * len(jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),            # dwMicroSecPerFrame
        sum(map(len, jpegs)) * max(1, fps),  # dwMaxBytesPerSec (loose)
        0,                                   # padding granularity
        0x10,                                # AVIF_HASINDEX
        len(jpegs), 0, 1,                    # totalFrames, initial, streams
        max(map(len, jpegs)),                # suggested buffer
        w, h, 0, 0, 0, 0)                    # width, height, reserved[4]
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                          1, max(1, fps),     # scale, rate
                          0, len(jpegs),      # start, length
                          max(map(len, jpegs)), 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    # movi chunk stream + idx1 (offsets relative to the start of the
    # 'movi' fourcc, the common idx1 convention)
    parts = []
    idx = []
    off = 4                                  # past the 'movi' fourcc
    for jp, kf in zip(jpegs, keyframe_flags):
        ck = _chunk(b"00dc", jp)
        idx.append(struct.pack("<4sIII", b"00dc",
                               AVIIF_KEYFRAME if kf else 0, off, len(jp)))
        parts.append(ck)
        off += len(ck)
    movi = _list(b"movi", b"".join(parts))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) within [pos, end)."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def decode_avi_mjpeg_frames(blob: bytes, max_frames: int = 16,
                            *, keyframes_only: bool = True) -> list:
    """AVI bytes → list of (H, W, 3) uint8 RGB keyframes.

    Honors idx1 AVIIF_KEYFRAME when the index is present (I-frame
    sampling semantics); without an index every ``##dc``/``##db`` chunk
    that starts with a JPEG SOI is treated as a keyframe (the MJPEG
    ground truth).  Bounded by ``max_frames``."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    movi_start = movi_end = None
    idx_entries = None
    for fourcc, p, ln in _walk_chunks(blob, 12, len(blob)):
        if fourcc == b"LIST" and blob[p:p + 4] == b"movi":
            movi_start, movi_end = p, p + ln
        elif fourcc == b"idx1":
            idx_entries = [struct.unpack_from("<4sIII", blob, p + i)
                           for i in range(0, ln - ln % 16, 16)]
    if movi_start is None:
        raise ValueError("AVI without a movi list")

    def is_frame_chunk(cc: bytes) -> bool:
        return len(cc) == 4 and cc[2:4] in (b"dc", b"db") \
            and cc[:2].isdigit()

    frames = []
    if idx_entries is not None and keyframes_only:
        for cc, flags, off, size in idx_entries:
            if len(frames) >= max_frames:
                break
            if not is_frame_chunk(cc) or not flags & AVIIF_KEYFRAME:
                continue
            # offset convention: relative to 'movi' fourcc (common) or
            # absolute (some muxers) — disambiguate by checking the ckid
            base = movi_start + off
            if blob[base:base + 4] != cc:
                base = off
            payload = blob[base + 8:base + 8 + size]
            if payload[:2] == b"\xFF\xD8":
                frames.append(decode_jpeg(payload))
    else:
        for cc, p, ln in _walk_chunks(blob, movi_start + 4, movi_end):
            if len(frames) >= max_frames:
                break
            if is_frame_chunk(cc) and blob[p:p + 2] == b"\xFF\xD8":
                frames.append(decode_jpeg(blob[p:p + ln]))
    if not frames:
        raise ValueError("AVI contains no decodable MJPEG keyframes")
    return frames
