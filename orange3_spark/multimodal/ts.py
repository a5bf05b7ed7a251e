"""MPEG transport stream (ISO/IEC 13818-1): native metadata triage.

The last common video container after ISO-BMFF (mp4.py) and Matroska
(webm.py).  TS carries inter-coded elementary streams (H.262/H.264/
HEVC), so pixels stay gated by the standing decision note (webp.py) —
but the container layer is exactly specified and parses natively:

* 188-byte packets (0x47 sync), PID demux, continuity counters,
* PAT (PID 0) → program map PID, PMT → per-PID ``stream_type``
  (0x02 MPEG-2 video, 0x1B H.264, 0x24 HEVC, 0x03/0x0F audio …),
* random-access points via the adaptation-field
  ``random_access_indicator`` — the transport-layer keyframe marker —
  counted per video PID, which is the triage signal a sampling
  pipeline needs (how many seekable I-frames does this capture hold?).

Per the usual contract the encoder is the test/corpus harness
(pytest round-trips bit-exactly; oracles recompute every field from
the construction), and the reader tolerates real-world noise: leading
garbage before first sync, truncated tails, PIDs with no PMT entry.
"""

from __future__ import annotations

import struct

TS_PACKET = 188
SYNC = 0x47

#: ISO/IEC 13818-1 table 2-34 (+ AVC/HEVC registrations)
STREAM_TYPES = {
    0x01: "mpeg1-video", 0x02: "mpeg2-video", 0x03: "mpeg1-audio",
    0x04: "mpeg2-audio", 0x0F: "aac", 0x1B: "h264", 0x24: "hevc",
}
_VIDEO_TYPES = {0x01, 0x02, 0x1B, 0x24}


def _packet(pid: int, payload: bytes, *, cc: int, pusi: bool = False,
            rai: bool = False) -> bytes:
    """One 188-byte packet; ``rai`` writes an adaptation field with the
    random_access_indicator bit."""
    adapt = b""
    afc = 0x1
    if rai:
        afc = 0x3
        adapt = bytes([1, 0x40])        # af_length=1, RAI bit
    room = TS_PACKET - 4 - len(adapt)
    if len(payload) > room:
        raise ValueError("payload exceeds one TS packet")
    pad = b""
    if len(payload) < room:
        if afc == 0x1:                  # stuff via adaptation field
            afc = 0x3
            stuff = room - len(payload) - 2
            if stuff >= 0:
                adapt = bytes([1 + stuff, 0x40 if rai else 0x00]) \
                    + b"\xff" * stuff
            else:                       # exactly one spare byte
                adapt = bytes([0])
        else:
            stuff = room - len(payload)
            adapt = bytes([adapt[0] + stuff]) + adapt[1:] + b"\xff" * stuff
    hdr = struct.pack(">BHB", SYNC,
                      (0x4000 if pusi else 0) | (pid & 0x1FFF),
                      (afc << 4) | (cc & 0x0F))
    pkt = hdr + adapt + payload + pad
    if len(pkt) != TS_PACKET:
        raise AssertionError("internal: packet size")
    return pkt


def _psi(table_id: int, body: bytes) -> bytes:
    """Pointer field + section header + body + CRC placeholder (the
    reader does not verify CRC32/MPEG — real capture tools often
    regenerate it; field presence is what the walk needs)."""
    sec = struct.pack(">BHHBBB", table_id,
                      0xB000 | (len(body) + 9), 1, 0xC1, 0, 0) + body \
        + b"\x00\x00\x00\x00"
    return b"\x00" + sec


def encode_ts(pids: dict, *, n_packets_per_pid: dict,
              rai_every: int = 0, pmt_pid: int = 0x100) -> bytes:
    """Test-harness TS writer.  ``pids``: {pid: stream_type} for the
    PMT; ``n_packets_per_pid``: payload packets to emit per pid;
    ``rai_every``: mark every Nth packet of each VIDEO pid as a random
    access point (0 = only the first)."""
    out = []
    pat_body = struct.pack(">HH", 1, 0xE000 | pmt_pid)
    out.append(_packet(0, _psi(0x00, pat_body), cc=0, pusi=True))
    pmt_body = struct.pack(">HH", 0xE000 | min(pids), 0xF000)
    for pid, st in sorted(pids.items()):
        pmt_body += struct.pack(">BHH", st, 0xE000 | pid, 0xF000)
    out.append(_packet(pmt_pid, _psi(0x02, pmt_body), cc=0, pusi=True))
    for pid, st in sorted(pids.items()):
        n = n_packets_per_pid.get(pid, 0)
        for i in range(n):
            is_video = st in _VIDEO_TYPES
            rai = is_video and (i == 0 or (rai_every and i % rai_every == 0))
            payload = bytes([pid & 0xFF, i & 0xFF]) * 8
            out.append(_packet(pid, payload, cc=i, pusi=(i == 0), rai=rai))
    return b"".join(out)


def parse_ts(blob: bytes) -> dict:
    """Packet/PID/PSI walk → ``{n_packets, n_pids, programs:
    {pid: stream_type_name}, video_pid, n_video_packets, n_rai,
    continuity_errors}``.  Resyncs past leading garbage; a truncated
    final packet is ignored (capture-file reality)."""
    start = blob.find(bytes([SYNC]))
    while start >= 0:
        nxt = start + TS_PACKET
        if nxt >= len(blob) or blob[nxt] == SYNC:
            break
        start = blob.find(bytes([SYNC]), start + 1)
    if start < 0:
        raise ValueError("ts: no sync byte found")

    out = {"n_packets": 0, "n_pids": 0, "programs": {},
           "video_pid": None, "n_video_packets": 0, "n_rai": 0,
           "continuity_errors": 0}
    pmt_pids = set()
    stream_types = {}
    last_cc: dict = {}
    seen_pids = set()

    for pos in range(start, len(blob) - TS_PACKET + 1, TS_PACKET):
        pkt = blob[pos:pos + TS_PACKET]
        if pkt[0] != SYNC:
            continue
        out["n_packets"] += 1
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        pusi = bool(pkt[1] & 0x40)
        afc = (pkt[3] >> 4) & 0x3
        cc = pkt[3] & 0x0F
        seen_pids.add(pid)

        rai = False
        off = 4
        if afc & 0x2:                       # adaptation field present
            af_len = pkt[4]
            if af_len > 0 and len(pkt) > 5:
                rai = bool(pkt[5] & 0x40)
            off = 5 + af_len
        has_payload = bool(afc & 0x1)

        if has_payload and pid != 0x1FFF:
            prev = last_cc.get(pid)
            if prev is None:
                last_cc[pid] = (cc, False)
            elif cc == prev[0]:
                # ONE repetition of the same packet is LEGAL per ISO
                # 13818-1 §2.4.3.3 — broadcast captures duplicate
                # packets routinely; the second and EVERY further
                # repetition is its own continuity error (the dup flag
                # stays set so a stuck-CC stream counts N-2 errors,
                # not an alternating half of them).
                if prev[1]:
                    out["continuity_errors"] += 1
                last_cc[pid] = (cc, True)
            else:
                if (prev[0] + 1) & 0x0F != cc:
                    out["continuity_errors"] += 1
                last_cc[pid] = (cc, False)

        if pid == 0 and pusi and has_payload and off < TS_PACKET:
            body = pkt[off:]
            ptr = body[0]
            sec = body[1 + ptr:]
            if len(sec) >= 8 and sec[0] == 0x00:
                slen = ((sec[1] & 0x0F) << 8) | sec[2]
                data = sec[8:3 + slen - 4]
                for i in range(0, len(data) - 3, 4):
                    pnum, ppid = struct.unpack_from(">HH", data, i)
                    if pnum != 0:           # 0 = network PID
                        pmt_pids.add(ppid & 0x1FFF)
        elif pid in pmt_pids and pusi and has_payload and off < TS_PACKET:
            body = pkt[off:]
            ptr = body[0]
            sec = body[1 + ptr:]
            if len(sec) >= 12 and sec[0] == 0x02:
                slen = ((sec[1] & 0x0F) << 8) | sec[2]
                pi_len = ((sec[10] & 0x0F) << 8) | sec[11]
                data = sec[12 + pi_len:3 + slen - 4]
                i = 0
                while i + 5 <= len(data):
                    st = data[i]
                    epid = ((data[i + 1] & 0x1F) << 8) | data[i + 2]
                    es_len = ((data[i + 3] & 0x0F) << 8) | data[i + 4]
                    stream_types[epid] = st
                    i += 5 + es_len
        elif pid in stream_types:
            if stream_types[pid] in _VIDEO_TYPES:
                if out["video_pid"] is None:
                    out["video_pid"] = pid
                out["n_video_packets"] += 1
                if rai:
                    out["n_rai"] += 1

    out["n_pids"] = len(seen_pids)
    out["programs"] = {pid: STREAM_TYPES.get(st, f"0x{st:02x}")
                       for pid, st in sorted(stream_types.items())}
    return out
