"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with a
typed metadata struct. The Spark-side machinery here is real and tested —
schema, partition-preserving ``mapInPandas`` decode, Arrow batch shapes,
deterministic feature extraction. The codec step is import-gated per kind:
``image`` decodes via PIL when installed (grayscale 4x4 thumbnail features),
``audio`` decodes RIFF/WAV via the stdlib ``wave`` module (energy-envelope
bins — exercised for real in this container's tests), and anything that
fails to decode falls back to a clearly-marked deterministic stub feature
vector derived from the payload bytes (the ``decoder`` output column says
which path ran). Swapping in further decoders changes one function, not the
plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("decoder", T.StringType(), False),  # 'real' | 'stub'
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def synthesize_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from a documents table: the text
    bytes become the payload (so tests need no external assets)."""
    return documents.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.length("text") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("application/x-fake").alias("mime"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes, dim: int = FEATURE_DIM):
    """Real image decode via PIL (import-gated; absent in this container).

    Decodes the payload, converts to grayscale, resizes to a 4x4 thumbnail
    (sqrt(dim) x sqrt(dim)) and returns the pixel intensities in [0, 1) —
    a real, deterministic feature of the actual image content. Returns
    ``(features, "real:PIL")`` or ``None`` when PIL is missing or the bytes
    are not a decodable image (caller falls back to the stub).
    """
    try:  # pragma: no cover - PIL absent in the sandbox
        import io

        from PIL import Image
    except ImportError:
        return None
    try:  # pragma: no cover - PIL absent in the sandbox
        side = int(dim**0.5)
        img = Image.open(io.BytesIO(payload)).convert("L").resize((side, side))
        arr = np.asarray(img, dtype=np.float64).reshape(-1) / 256.0
        if arr.size < dim:
            arr = np.pad(arr, (0, dim - arr.size))
        return arr[:dim], "real:PIL"
    except Exception:
        return None


def _decode_audio_real(payload: bytes, dim: int = FEATURE_DIM):
    """Real audio decode via the stdlib ``wave`` module (always available).

    Parses a RIFF/WAV payload and computes ``dim`` mean-absolute-amplitude
    bins across the sample stream, normalized by the format's full scale —
    a real energy-envelope feature of the actual audio. Returns
    ``(features, "real:wave")`` or ``None`` when the bytes are not a valid
    WAV (caller falls back to the stub).
    """
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None or not frames:
            return None
        samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
        if width == 1:  # 8-bit WAV is unsigned, centered at 128
            samples = samples - 128.0
        full_scale = float(2 ** (8 * width - 1))
        mag = np.abs(samples) / full_scale
        # dim equal-width bins over the sample stream (tail bin may be short)
        bins = np.array_split(mag, dim)
        feats = np.array([b.mean() if b.size else 0.0 for b in bins])
        return feats, "real:wave"
    except Exception:
        return None


def _stub_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake embedding: sha256 -> dim floats in [0, 1).

    Clearly NOT a semantic feature — a placeholder that keeps the distributed
    plumbing honest (stable across runs/partitions, derived only from bytes).
    """
    h = hashlib.sha256(payload or b"").digest()
    reps = (dim * 4 + len(h) - 1) // len(h)
    buf = (h * reps)[: dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return (arr % 10_000) / 10_000.0


def decode_media(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas decode/feature-extract. Partition-preserving (no shuffle);
    each Arrow batch is processed vectorized; per-payload hashing is the only
    per-element work (inherent to decoding)."""

    real_decoders = {"image": _decode_image_real, "audio": _decode_audio_real}

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            kinds = pdf["kind"].tolist()
            feats, shas, decoders, sizes = [], [], [], []
            for payload, kind in zip(payloads, kinds):
                b = bytes(payload) if payload is not None else b""
                decode = real_decoders.get(kind)
                decoded = decode(b) if decode is not None else None
                if decoded is not None:
                    arr, dec_name = decoded
                else:
                    arr, dec_name = _stub_features(b), "stub"
                feats.append(arr.astype(np.float32))
                shas.append(hashlib.sha256(b).hexdigest())
                decoders.append(dec_name)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "sha256": shas,
                    "decoder": decoders,
                    "features": feats,
                }
            )

    return media.mapInPandas(process, schema=FEATURES_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Per-kind byte stats over decoded media (plain aggregation)."""
    return features.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("n_bytes").alias("avg_bytes"),
        F.count_distinct("sha256").alias("distinct_payloads"),
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, k: int = 4, frame_chars: int = 100
) -> DataFrame:
    """Uniform frame sampling for video-ish payloads: k frame indices evenly
    spaced across the payload's frame grid (endpoints included), each frame a
    fixed-width window of the payload, identified by its sha256.

    Same honesty contract as :func:`decode_media`: the real frame extractor
    (pyav/ffmpeg) is absent in this container, so a "frame" is a
    deterministic window of the payload's string form — but the distributed
    plumbing (mapInPandas batch iterator, schema, per-row fan-out to k
    output rows, partition preservation) is exactly what a real extractor
    plugs into, and every output is engine-independent (replayed by the
    DuckDB oracle via the same index arithmetic + sha256).
    """
    if k < 2:
        raise ValueError("k must be >= 2 (endpoints included)")

    def process(batches):
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "n_frames": [], "frame_sha": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                nf = max(len(text) // frame_chars, 1)
                seen = set()
                for j in range(k):
                    idx = (j * (nf - 1)) // (k - 1)
                    if idx in seen:
                        continue
                    seen.add(idx)
                    frame = text[idx * frame_chars : (idx + 1) * frame_chars]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(nf)
                    rows["frame_sha"].append(
                        hashlib.sha256(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        process, schema=FRAMES_SCHEMA
    )
