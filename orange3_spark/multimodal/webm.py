"""WebM / Matroska (EBML): native container parse + keyframe extraction.

Closes the second half of the r8 verdict's "a real corpus is MP4/WebM":
with ISO-BMFF handled by multimodal/mp4.py, this module walks the EBML
element tree (RFC 8794 + the public Matroska element registry) —
doctype, segment info, the first video track's codec/dimensions, and
SimpleBlock keyframe extraction from clusters.

WebM video is VP8/VP9/AV1 — inter-frame codecs whose full pixel decode
stays gated by the same decision note as lossy VP8 (webp.py: the
entropy layers are defined against spec probability tables not
available offline).  What composes natively TODAY: an extracted VP8
keyframe payload is exactly the frame layout ``webp.vp8_frame_header``
parses, so corpus triage gets per-KEYFRAME dimensions/filter/quantizer
on top of the container metadata — two proven native layers stacked,
zero macroblocks decoded.

Like the other native codecs the encoder exists as the test/corpus
harness: pytest proves encode → parse/extract round-trips bit-exactly,
and oracles recompute every surfaced field from the construction.
"""

from __future__ import annotations

import struct

# EBML / Matroska element ids (raw bytes, as they appear in the stream)
EBML = b"\x1a\x45\xdf\xa3"
DOCTYPE = b"\x42\x82"
SEGMENT = b"\x18\x53\x80\x67"
INFO = b"\x15\x49\xa9\x66"
TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
DURATION = b"\x44\x89"
TRACKS = b"\x16\x54\xae\x6b"
TRACK_ENTRY = b"\xae"
TRACK_NUMBER = b"\xd7"
TRACK_TYPE = b"\x83"
CODEC_ID = b"\x86"
VIDEO = b"\xe0"
PIXEL_WIDTH = b"\xb0"
PIXEL_HEIGHT = b"\xba"
CLUSTER = b"\x1f\x43\xb6\x75"
CLUSTER_TS = b"\xe7"
SIMPLE_BLOCK = b"\xa3"


def _vint(n: int) -> bytes:
    """EBML size encoding: length marker bit + value."""
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:          # all-ones means "unknown"
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError("vint too large")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint(len(payload)) + payload


def _uint(n: int) -> bytes:
    out = n.to_bytes((max(n, 1).bit_length() + 7) // 8, "big")
    return out or b"\x00"


def _read_vint(buf: bytes, pos: int):
    """(value, n_bytes, is_unknown) of the size vint at ``pos``."""
    if pos >= len(buf):
        raise ValueError("webm: truncated vint")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("webm: vint length > 8")
    ln = 9 - b0.bit_length()
    if pos + ln > len(buf):
        raise ValueError("webm: truncated vint body")
    val = b0 & ((1 << (8 - ln)) - 1)
    for i in range(1, ln):
        val = (val << 8) | buf[pos + i]
    unknown = val == (1 << (7 * ln)) - 1
    return val, ln, unknown


def _read_id(buf: bytes, pos: int) -> bytes:
    """Element ids keep their marker bit — returned as raw bytes."""
    if pos >= len(buf):
        raise ValueError("webm: truncated id")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("webm: id length > 4")
    ln = 9 - b0.bit_length()
    if ln > 4 or pos + ln > len(buf):
        raise ValueError("webm: bad element id")
    return buf[pos:pos + ln]


def _walk(buf: bytes, pos: int, end: int):
    """Yield (id_bytes, payload_start, payload_end) in [pos, end);
    unknown-size elements (legal for Segment/Cluster in live streams)
    extend to the end of their enclosure."""
    while pos < end:
        eid = _read_id(buf, pos)
        pos += len(eid)
        size, ln, unknown = _read_vint(buf, pos)
        pos += ln
        pe = end if unknown else pos + size
        if pe > end:
            raise ValueError("webm: element overruns its container")
        yield eid, pos, pe
        pos = pe


def _child(buf, pos, end, eid):
    for t, b, e in _walk(buf, pos, end):
        if t == eid:
            return b, e
    return None


def _u(buf, b, e) -> int:
    return int.from_bytes(buf[b:e], "big")


def encode_webm_vp8(frames, width: int, height: int, *,
                    keyframe_flags=None, codec: bytes = b"V_VP8",
                    doctype: bytes = b"webm",
                    duration_ms: float = 1000.0,
                    audio_frames=None) -> bytes:
    """Frame payloads → WebM bytes (test harness): one video track,
    one cluster, one SimpleBlock per frame (no lacing), keyframe bit
    from ``keyframe_flags`` (default all-key).  ``audio_frames`` adds
    an audio TrackEntry (track 2, A_VORBIS) whose SimpleBlocks carry
    the keyframe bit ALWAYS SET — the real-world shape that forced the
    per-track block filter in :func:`parse_webm`."""
    if not frames:
        raise ValueError("need at least one frame")
    if keyframe_flags is None:
        keyframe_flags = [True] * len(frames)

    header = _elem(EBML, _elem(b"\x42\x86", b"\x01")        # EBMLVersion
                   + _elem(b"\x42\xf7", b"\x01")            # ReadVersion
                   + _elem(b"\x42\xf2", b"\x04")            # MaxIDLength
                   + _elem(b"\x42\xf3", b"\x08")            # MaxSizeLength
                   + _elem(DOCTYPE, doctype)
                   + _elem(b"\x42\x87", b"\x02")            # DocTypeVersion
                   + _elem(b"\x42\x85", b"\x02"))
    info = _elem(INFO, _elem(TIMESTAMP_SCALE, _uint(1_000_000))
                 + _elem(DURATION, struct.pack(">d", duration_ms)))
    video = _elem(VIDEO, _elem(PIXEL_WIDTH, _uint(width))
                  + _elem(PIXEL_HEIGHT, _uint(height)))
    track = _elem(TRACK_ENTRY, _elem(TRACK_NUMBER, b"\x01")
                  + _elem(b"\x73\xc5", b"\x01")              # TrackUID
                  + _elem(TRACK_TYPE, b"\x01")               # video
                  + _elem(CODEC_ID, codec) + video)
    tracks = track
    if audio_frames:
        tracks += _elem(TRACK_ENTRY, _elem(TRACK_NUMBER, b"\x02")
                        + _elem(b"\x73\xc5", b"\x02")        # TrackUID
                        + _elem(TRACK_TYPE, b"\x02")         # audio
                        + _elem(CODEC_ID, b"A_VORBIS"))
    blocks = b""
    for i, (fr, kf) in enumerate(zip(frames, keyframe_flags)):
        head = (_vint(1)                                     # track number
                + struct.pack(">h", i * 33)                  # rel. timestamp
                + bytes([0x80 if kf else 0x00]))             # flags
        blocks += _elem(SIMPLE_BLOCK, head + fr)
        # interleave audio after each video block, muxer-style
        if audio_frames and i < len(audio_frames):
            ahead = (_vint(2)
                     + struct.pack(">h", i * 33 + 10)
                     + bytes([0x80]))        # audio blocks: key bit SET
            blocks += _elem(SIMPLE_BLOCK, ahead + audio_frames[i])
    cluster = _elem(CLUSTER, _elem(CLUSTER_TS, _uint(0)) + blocks)
    return header + _elem(SEGMENT, info + _elem(TRACKS, tracks) + cluster)


def parse_webm(blob: bytes) -> dict:
    """Container metadata without touching a pixel: doctype, duration
    (ms at the declared timestamp scale), first video track's codec id
    and dimensions, block and keyframe counts — the WebM analogue of
    :func:`orange3_spark.multimodal.mp4.parse_mp4`."""
    if blob[:4] != EBML:
        raise ValueError("not an EBML/WebM file")
    out = {"doctype": None, "timescale": 1_000_000, "duration_ms": None,
           "codec": None, "width": None, "height": None,
           "video_track": None, "n_blocks": 0, "n_key": 0}
    segment = None
    for eid, b, e in _walk(blob, 0, len(blob)):
        if eid == EBML:
            dt = _child(blob, b, e, DOCTYPE)
            if dt:
                out["doctype"] = blob[dt[0]:dt[1]].decode("latin-1")
        elif eid == SEGMENT:
            segment = (b, e)
    if segment is None:
        raise ValueError("webm: no Segment element")
    # Two passes over the Segment: Tracks must be resolved BEFORE block
    # counting so n_blocks/n_key cover ONLY the selected video track —
    # on a multi-track file (audio+video) audio SimpleBlocks always set
    # the keyframe bit and would otherwise inflate both counts (r9
    # advisor finding).
    for eid, b, e in _walk(blob, *segment):
        if eid == INFO:
            ts = _child(blob, b, e, TIMESTAMP_SCALE)
            if ts:
                out["timescale"] = _u(blob, *ts)
            du = _child(blob, b, e, DURATION)
            if du:
                raw = blob[du[0]:du[1]]
                val = struct.unpack(">f" if len(raw) == 4 else ">d",
                                    raw)[0]
                # Duration is in timestamp-scale units; normalize to ms
                out["duration_ms"] = val * out["timescale"] / 1e6
        elif eid == TRACKS and out["codec"] is None:
            for tid, tb, te in _walk(blob, b, e):
                if tid != TRACK_ENTRY:
                    continue
                tt = _child(blob, tb, te, TRACK_TYPE)
                if tt is None or _u(blob, *tt) != 1:
                    continue
                tn = _child(blob, tb, te, TRACK_NUMBER)
                if tn:
                    out["video_track"] = _u(blob, *tn)
                ci = _child(blob, tb, te, CODEC_ID)
                if ci:
                    out["codec"] = blob[ci[0]:ci[1]].decode("latin-1")
                vi = _child(blob, tb, te, VIDEO)
                if vi:
                    pw = _child(blob, *vi, PIXEL_WIDTH)
                    ph = _child(blob, *vi, PIXEL_HEIGHT)
                    out["width"] = _u(blob, *pw) if pw else None
                    out["height"] = _u(blob, *ph) if ph else None
                break
    vtrack = out["video_track"]
    for eid, b, e in _walk(blob, *segment):
        if eid != CLUSTER:
            continue
        for cid, cb, ce in _walk(blob, b, e):
            if cid != SIMPLE_BLOCK:
                continue
            tn, ln, _unk = _read_vint(blob, cb)
            if vtrack is not None and tn != vtrack:
                continue                     # audio / other-track block
            out["n_blocks"] += 1
            if blob[cb + ln + 2] & 0x80:
                out["n_key"] += 1
    return out


def extract_webm_keyframes(blob: bytes, max_frames: int = 16):
    """(codec_id, [frame payload bytes]) of keyframe-flagged
    SimpleBlocks on the first video track (no-lacing blocks; laced
    blocks are skipped — the harness never produces them and real
    intra frames are not laced in practice)."""
    meta_needed = parse_webm(blob)          # validates + finds codec/track
    codec = meta_needed["codec"] or "?"
    vtrack = meta_needed["video_track"]
    segment = None
    for eid, b, e in _walk(blob, 0, len(blob)):
        if eid == SEGMENT:
            segment = (b, e)
    picks = []
    for eid, b, e in _walk(blob, *segment):
        if eid != CLUSTER:
            continue
        for cid, cb, ce in _walk(blob, b, e):
            if cid != SIMPLE_BLOCK or len(picks) >= max_frames:
                continue
            tn, ln, _unk = _read_vint(blob, cb)
            if vtrack is not None and tn != vtrack:
                continue    # never hand an audio payload to the VP8 parser
            flags = blob[cb + ln + 2]
            if flags & 0x80 and not flags & 0x06:     # key, not laced
                picks.append(blob[cb + ln + 3:ce])
    return codec, picks
