"""Multimodal (binary) column plumbing — driver north-star requirement.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partition flow, partition sizing — is real and tested. IMAGE decode is
STUBBED (Pillow is not in this container): ``decode_image_meta`` parses a
deterministic fake header and raises ``NotImplementedError`` for payloads
that don't carry it. AUDIO decode is REAL for RIFF/WAVE PCM — a pure-python
chunk parser + numpy PCM stats (``audio_features``); compressed codecs
raise NotImplementedError where torchaudio/librosa would plug in.

At scale: binary payloads dominate row size, so ops here set
``maxRecordsPerBatch`` guidance (docstring) and never shuffle the payload —
derive metadata first, drop/offload bytes, then shuffle the small columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKEIMG1"
META_SCHEMA = "doc_id long, n_bytes int, format string, width int, height int"


def attach_fake_image(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary 'image' payload per row: an 8-byte
    magic, width and height as 8-byte zero-padded ASCII ints (derived from
    the row), then the utf-8 text as fake pixel bytes. Stands in for real
    image bytes so every downstream op exercises true binary-column
    plumbing (24-byte header + payload)."""
    w = (F.length(text_col) * 7919 + 13) % 1920 + 1
    h = (F.length(text_col) * 104729 + 17) % 1080 + 1
    header = F.concat(
        F.lit(FAKE_MAGIC),
        F.encode(F.lpad(w.cast("string"), 8, "0"), "utf-8"),
        F.encode(F.lpad(h.cast("string"), 8, "0"), "utf-8"),
        F.encode(F.col(text_col), "utf-8"),
    )
    return df.withColumn("image", header)


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "image") -> DataFrame:
    """Extract (n_bytes, format, width, height) from the binary column via
    mapInPandas — Arrow-batched, per-partition, no shuffle.

    Real decoders (Pillow / torchaudio / pyav) slot into ``_decode_one``;
    unknown formats raise NotImplementedError, exactly where a real decode
    error surfaces.
    """

    def _decode_one(payload: bytes) -> tuple[int, str, int, int]:
        if payload[:8] == FAKE_MAGIC:
            w = int(payload[8:16])
            h = int(payload[16:24])
            return len(payload), "fakeimg", w, h
        raise NotImplementedError(
            "real image decode requires Pillow/libjpeg — not in this container"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[bin_col].map(_decode_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [m[0] for m in meta],
                    "format": [m[1] for m in meta],
                    "width": [m[2] for m in meta],
                    "height": [m[3] for m in meta],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(_batches, META_SCHEMA)


RESIZED_SCHEMA = "doc_id long, image binary, width int, height int"


def resize_image(df: DataFrame, max_side: int = 256, id_col: str = "doc_id", bin_col: str = "image") -> DataFrame:
    """'Resize' the fake image payloads: rewrite the header dims to fit
    within max_side (aspect-preserving integer scaling) and truncate the
    payload proportionally. A real implementation swaps `_resize_one` for
    Pillow; the Spark shape — mapInPandas, binary in/out, no shuffle — is
    exactly what production resize looks like.
    """

    def _resize_one(payload: bytes) -> tuple[bytes, int, int]:
        if payload[:8] != FAKE_MAGIC:
            raise NotImplementedError("real image resize requires Pillow")
        w, h = int(payload[8:16]), int(payload[16:24])
        scale = min(1.0, max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        body = payload[24:]
        keep = max(1, int(len(body) * scale))
        out = FAKE_MAGIC + b"%08d" % nw + b"%08d" % nh + body[:keep]
        return out, nw, nh

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf[bin_col].map(_resize_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "image": [r[0] for r in res],
                    "width": [r[1] for r in res],
                    "height": [r[2] for r in res],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, ts_ms long"


def sample_frames(
    df: DataFrame, n_frames: int = 4, fps: float = 1.0, id_col: str = "doc_id", bin_col: str = "video"
) -> DataFrame:
    """Frame sampling for video columns: one input row → n_frames output
    rows (the 1→N mapInPandas shape). The fake 'container' is any binary
    payload; frames are deterministic slices standing in for decoded
    frames. Real impl: pyav keyframe iteration in `_frames_one`."""

    def _frames_one(doc_id: int, payload: bytes):
        body = payload if payload[:8] != FAKE_MAGIC else payload[24:]
        step = max(1, len(body) // n_frames)
        for i in range(min(n_frames, len(body))):
            yield doc_id, i, body[i * step : i * step + step], int(i * 1000 / fps)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                r
                for doc_id, payload in zip(pdf[id_col], pdf[bin_col])
                for r in _frames_one(doc_id, payload)
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame", "ts_ms"])

    return df.select(id_col, F.col(bin_col)).mapInPandas(_batches, FRAME_SCHEMA)


def synth_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    duration_ms: int = 250,
) -> DataFrame:
    """Attach a deterministic PCM16 mono WAV payload per row (RIFF/WAVE
    container, real header + real samples): a sine whose frequency and
    amplitude derive from the row id. Stands in for ingested audio so the
    decode path below runs end-to-end on genuine WAV bytes."""
    import struct

    import numpy as np

    def _wav_bytes(doc_id: int) -> bytes:
        n = sample_rate * duration_ms // 1000
        freq = 100.0 + (doc_id * 37) % 900
        amp = 0.2 + ((doc_id * 13) % 7) / 10.0
        t = np.arange(n, dtype=np.float64) / sample_rate
        pcm = (np.sin(2 * np.pi * freq * t) * amp * 32767.0).astype("<i2")
        data = pcm.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        fmt = b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["audio"] = [_wav_bytes(int(i)) for i in pdf[id_col]]
            yield out

    import pyspark.sql.types as ty

    schema = ty.StructType(
        df.select(id_col).schema.fields + [ty.StructField("audio", ty.BinaryType())]
    )
    return df.select(id_col).mapInPandas(_batches, schema)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bits int, n_samples long, "
    "duration_ms long, rms double, peak double, zcr double"
)


def audio_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "audio") -> DataFrame:
    """Audio feature extraction over binary WAV columns — a real pure-python
    RIFF/WAVE parser (chunk walk → fmt/data) + numpy PCM stats, no external
    audio libs. Features per row: sample_rate, channels, bit depth, sample
    count, duration, RMS, peak, zero-crossing rate (all channels mixed to
    mono for the signal stats; PCM16/PCM8 supported). Non-WAV payloads and
    compressed codecs raise NotImplementedError — the slot where
    torchaudio/librosa plug in for MFCCs.

    Scale shape: mapInPandas, Arrow-batched, payload never shuffled — the
    binary column is dropped after feature extraction, so only the small
    numeric features move."""
    import struct

    import numpy as np

    def _decode_one(doc_id: int, payload: bytes):
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError(
                "non-WAV audio payload: compressed codecs need torchaudio/librosa"
            )
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (csize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + csize]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise NotImplementedError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if audio_fmt != 1 or bits not in (8, 16):
            raise NotImplementedError(
                f"only PCM8/PCM16 WAV decoded here (fmt={audio_fmt}, bits={bits})"
            )
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        else:  # PCM8 is unsigned, midpoint 128
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        if n_ch > 1:
            x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
        n = len(x)
        if n == 0:
            rms = peak = zcr = 0.0
        else:
            rms = float(np.sqrt(np.mean(x * x)))
            peak = float(np.max(np.abs(x)))
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
        return (
            doc_id, rate, n_ch, bits, n, int(n * 1000 / rate) if rate else 0,
            round(rms, 6), round(peak, 6), round(zcr, 6),
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "sample_rate", "n_channels", "bits", "n_samples",
            "duration_ms", "rms", "peak", "zcr",
        ]
        for pdf in it:
            rows = [
                _decode_one(int(i), bytes(p))
                for i, p in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_batches, AUDIO_SCHEMA)
