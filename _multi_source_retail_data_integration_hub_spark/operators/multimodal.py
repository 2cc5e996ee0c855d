"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The Spark-side machinery here — schemas, partitioning, UDF signatures,
batch shapes — is real and tested. The *codec* layer is STUBBED with
deterministic fakes (marked ``STUB``) because image/audio libraries
(PIL, torchaudio, ffmpeg) are not in this container; each stub
documents the real call it stands in for and is a single function swap
away from production.

Scale notes: payloads never pass through Python row-at-a-time — they
arrive in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so
batch_rows x avg_payload_bytes fits executor memory (e.g. 256 rows of
4 MB images ≈ 1 GB — lower it for video). Feature extraction is a
narrow map (no shuffle); downstream joins happen on the small feature
output, never on payload bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = "media_id long, width int, height int, channels int, mean_luma double"
AUDIO_FEATURE_SCHEMA = "media_id long, n_samples long, sample_rate int, rms double"
FRAME_SCHEMA = "media_id long, frame_idx int, byte_offset long"


def attach_payloads(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table (id, payload BINARY, meta STRUCT) from docs.

    Stands in for reading image/audio blobs; payload = utf-8 bytes of
    the text column so every byte is deterministic and test-checkable.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake-img").alias("format"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """STUB image decode — deterministic fake.

    Real implementation: ``img = PIL.Image.open(io.BytesIO(payload))``
    then ``img.size``, ``len(img.getbands())``, luma mean. The fake
    derives the same-shaped outputs from the first payload bytes so
    the full pipeline (schema, batching, joins) is exercised end-to-end.
    """
    b0 = payload[0] if len(payload) > 0 else 0
    b1 = payload[1] if len(payload) > 1 else 0
    width = 16 + (b0 % 16) * 8
    height = 16 + (b1 % 16) * 8
    channels = 1 + len(payload) % 3
    mean_luma = ((b0 * 31 + b1 * 7) % 256) / 255.0
    return width, height, channels, mean_luma


def decode_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL payloads behave as empty (same contract as audio)
            feats = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


def extract_audio_features(media: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """STUB audio featurizer (real: torchaudio.load + rms over PCM).

    n_samples is derived from payload length as if payload were 16-bit
    mono PCM; rms is a deterministic byte-level stand-in.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL payloads behave as empty (0 samples, rms 0.0)
            payloads = pdf["payload"].map(lambda p: p if p is not None else b"")
            lens = payloads.map(len).astype("int64")
            rms = payloads.map(
                lambda p: float(np.sqrt(np.mean(np.frombuffer(p, dtype=np.uint8).astype(np.float64) ** 2)))
                if len(p)
                else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_samples": lens // 2,
                    "sample_rate": sample_rate,
                    "rms": rms,
                }
            )

    return media.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """STUB video frame sampler (real: ffmpeg keyframe extraction).

    Emits one row per sampled "frame" — byte offsets at fixed stride,
    capped — demonstrating the 1-to-N explode shape a real sampler has.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int]] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    payload = b""  # NULL payloads behave as empty
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                rows.extend((int(mid), i, i * every_n_bytes) for i in range(n))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "byte_offset"])

    return media.mapInPandas(sample, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — NOT IMPLEMENTED in this container.

    Real implementation: mapInPandas batch of
    ``PIL.Image.open(...).resize((width, height))`` re-encoded to the
    payload column; the signature and schema are final.
    """
    raise NotImplementedError(
        "resize_images requires an image codec (PIL) not present in this "
        "container; plumbing contract: (media_id, payload, meta) -> same "
        "schema with resized payload"
    )
