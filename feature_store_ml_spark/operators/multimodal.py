"""Multimodal (binary) column plumbing — driver north-star requirement.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partition flow, partition sizing — is real and tested; the actual
image/audio decode is STUBBED (the decode libs are not in this container):
``decode_image_meta`` parses a deterministic fake header instead of calling
Pillow, and raises ``NotImplementedError`` for payloads that don't carry it.

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


def audio_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "audio") -> DataFrame:
    """Audio feature extraction stub: the real path (torchaudio/librosa
    MFCCs) is not in this container — raises NotImplementedError at decode,
    with the batch plumbing in place."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "audio decode requires torchaudio/librosa — not in this container"
            )
            yield pdf  # pragma: no cover

    return df.select(id_col, bin_col).mapInPandas(
        _batches, "doc_id long, n_samples int, mfcc array<double>"
    )
