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


def test_bmp_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd width -> row padding
    payload = M.encode_bmp(img)
    assert payload[:2] == b"BM"
    back = M.decode_bmp(payload)
    assert back.shape == img.shape
    assert (back == img).all()


def test_nn_resize_semantics():
    import numpy as np

    # 2x2 quadrant image upscaled 2x: each quadrant becomes a 2x2 block
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
    )
    up = M.nn_resize(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0, 0] == img[0, 0]).all() and (up[1, 1] == img[0, 0]).all()
    assert (up[3, 3] == img[1, 1]).all()


def test_resize_images_end_to_end(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(8 * i, 6 * i, 3), dtype=np.uint8) for i in (1, 2, 3)}
    rows = [(i, M.encode_bmp(img), ("bmp", 0)) for i, img in imgs.items()]
    rows.append((9, None, ("bmp", 0)))  # NULL payload passes through
    media = spark.createDataFrame(rows, M.RESIZED_SCHEMA)
    out = {r.media_id: r for r in M.resize_images(media, 12, 10).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[9].payload is None and out[9].meta.n_bytes == 0
    for i in (1, 2, 3):
        img = M.decode_bmp(bytes(out[i].payload))
        assert img.shape == (10, 12, 3)
        assert out[i].meta.n_bytes == len(bytes(out[i].payload))
        assert (img == M.nn_resize(imgs[i], 12, 10)).all()
