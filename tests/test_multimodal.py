"""Multimodal plumbing tests: the decode is a deterministic stub, but
schema, Arrow batching, and partition shape are the real thing."""

import pytest

from sparkml_som_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    media_dedup_by_content,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"imgpayload-aaaa", "image/png", 64, 64, None),
        (2, "image", b"imgpayload-bbbb", "image/png", 32, 32, None),
        (3, "image", b"imgpayload-aaaa", "image/png", 64, 64, None),  # dup of 1
        (4, "video", b"vid-xyz", "video/mp4", 640, 480, 3500),
        (5, "audio", b"aud-123", "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_image_feature_extraction(spark, media_df):
    feats = extract_image_features(media_df).collect()
    assert len(feats) == 3  # only images
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["sha256"] == by_id[3]["sha256"]  # same payload, same hash
    assert by_id[1]["embedding"] == by_id[3]["embedding"]  # deterministic stub
    assert by_id[1]["embedding"] != by_id[2]["embedding"]
    assert all(len(r["embedding"]) == 16 for r in feats)
    assert by_id[1]["n_bytes"] == len(b"imgpayload-aaaa")


def test_video_frame_sampling(spark, media_df):
    frames = sample_video_frames(media_df, every_ms=1000).collect()
    # 3500ms video sampled at 1000ms -> frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_media_dedup(spark, media_df):
    groups = media_dedup_by_content(media_df).collect()
    dup_group = [g for g in groups if g["n_copies"] == 2]
    assert len(dup_group) == 1
    assert dup_group[0]["canonical_id"] == 1


def test_audio_feature_extraction(spark, media_df):
    import hashlib

    import numpy as np

    from sparkml_som_spark.operators.multimodal import (
        _decode_audio_stub,
        extract_audio_features,
    )

    feats = extract_audio_features(media_df).collect()
    assert len(feats) == 1  # only audio rows
    row = feats[0]
    assert row["media_id"] == 5
    assert row["sha256"] == hashlib.sha256(b"aud-123").hexdigest()
    assert row["n_bytes"] == len(b"aud-123")
    # exact replay of the deterministic stub waveform statistics
    wav = _decode_audio_stub(b"aud-123")
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(wav * wav))), rel=1e-6)
    assert row["zero_crossings"] == int(
        np.sum(np.signbit(wav[1:]) != np.signbit(wav[:-1]))
    )


def test_audio_chunk_plan_laws(spark, media_df):
    from sparkml_som_spark.operators.multimodal import plan_audio_chunks

    chunks = sorted(
        plan_audio_chunks(media_df, chunk_ms=2000, hop_ms=1500).collect(),
        key=lambda r: r["chunk_start_ms"],
    )
    # 2000ms clip, 1500ms hop -> starts at 0 and 1500; second clips to 2000
    assert [(r["chunk_start_ms"], r["chunk_end_ms"]) for r in chunks] == [
        (0, 2000),
        (1500, 2000),
    ]
    # overlap coverage law: with hop <= chunk the union covers the clip
    covered = set()
    for r in chunks:
        covered.update(range(r["chunk_start_ms"], r["chunk_end_ms"]))
    assert covered == set(range(2000))
