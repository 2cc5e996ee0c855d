"""Multimodal plumbing: binary payload schemas, Arrow batch shapes,
deterministic stub codecs, 1-to-N frame sampling, stub gating."""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc"), (3, "x" * 300)],
        "doc_id long, text string",
    )
    return M.attach_payloads(docs)


def test_payload_schema_and_bytes(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "meta": "struct<format:string,n_bytes:int>",
    }
    r = {x.media_id: x for x in media.collect()}
    assert bytes(r[2].payload) == b"abc"
    assert r[3].meta.n_bytes == 300


def test_decode_image_features_deterministic(spark, media):
    feats = {r.media_id: r for r in M.decode_image_features(media).collect()}
    b0, b1 = ord("h"), ord("e")
    assert feats[1].width == 16 + (b0 % 16) * 8
    assert feats[1].height == 16 + (b1 % 16) * 8
    assert feats[1].channels == 1 + 11 % 3
    assert feats[1].mean_luma == ((b0 * 31 + b1 * 7) % 256) / 255.0
    # stable across runs
    again = {r.media_id: r for r in M.decode_image_features(media).collect()}
    assert feats[1] == again[1]


def test_audio_features_shapes(media):
    feats = {r.media_id: r for r in M.extract_audio_features(media).collect()}
    assert feats[2].n_samples == 1  # 3 bytes // 2
    assert feats[2].sample_rate == 16_000
    assert feats[3].rms == pytest.approx(ord("x"), abs=1e-9)  # constant byte


def test_frame_sampling_one_to_many(media):
    frames = M.sample_frames(media, every_n_bytes=64, max_frames=8)
    by_id = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    n = {r.media_id: r.n for r in by_id}
    assert n[1] == 1 and n[2] == 1  # short payloads -> single frame
    assert n[3] == 4  # 300 // 64
    offs = [r.byte_offset for r in frames.where(F.col("media_id") == 3).orderBy("frame_idx").collect()]
    assert offs == [0, 64, 128, 192]


def test_resize_is_gated_stub(media):
    with pytest.raises(NotImplementedError):
        M.resize_images(media, 224, 224)
