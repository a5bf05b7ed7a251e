"""Audio columns: REAL WAV (RIFF/PCM) encode/decode + feature extraction.

No equivalent in the reference (tabular only) — training-data-pipeline
extension.  Unlike image JPEG/PNG (gated on Pillow, absent here), WAV is
fully decodable with the stdlib ``wave`` module, so the audio path is a
real codec, not a stub: blobs are genuine RIFF containers, the decoder
parses them back, and the features are integer-exact so the whole
encode→decode→extract pipeline is SQL-oracle-checkable
(``q_media_audio``).

Scale shape: blobs stream through Arrow-batched ``mapInPandas`` (columnar
batches of bytes, never row-at-a-time); features are per-item integers so
the downstream aggregation is ordinary exact-sum relational work.
"""

from __future__ import annotations

import io
import wave

import pandas as pd
from pyspark.sql import DataFrame


def encode_wav(samples, rate: int = 8000) -> bytes:
    """int16 mono PCM → RIFF/WAV bytes (stdlib ``wave`` writer)."""
    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes):
    """RIFF/WAV bytes → (int16 numpy samples, rate).  Mono 16-bit only —
    loud error otherwise (honest gate, not a silent downmix)."""
    import numpy as np

    with wave.open(io.BytesIO(blob), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"decode_wav: expected mono 16-bit PCM, got "
                f"{w.getnchannels()} ch × {w.getsampwidth()} bytes")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2"), rate


def audio_feature_table(df: DataFrame, binary_col: str = "content",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-blob integer audio features in ONE Arrow-batched scan:
    ``n_samples``, ``sample_rate``, ``duration_ms`` (floor),
    ``energy`` (Σs², exact — the fixed-point form of RMS) and
    ``zero_crossings`` (sign changes).  All integers, so the features
    are bit-exact under any partitioning and replayable by the oracle."""
    import numpy as np

    def run(it):
        for pdf in it:
            ids, ns, rates, durs, eng, zc = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[binary_col]):
                s, rate = decode_wav(bytes(blob))
                n = int(len(s))
                s64 = s.astype(np.int64)
                ids.append(i)
                ns.append(n)
                rates.append(int(rate))
                durs.append(n * 1000 // rate)
                eng.append(int((s64 * s64).sum()))
                zc.append(int(((s64[:-1] * s64[1:]) < 0).sum())
                          if n > 1 else 0)
            yield pd.DataFrame({id_col: ids, "n_samples": ns,
                                "sample_rate": rates, "duration_ms": durs,
                                "energy": eng, "zero_crossings": zc})

    return df.select(id_col, binary_col).mapInPandas(
        run, f"{id_col} long, n_samples long, sample_rate long, "
             f"duration_ms long, energy long, zero_crossings long")
