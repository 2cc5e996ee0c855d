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

import struct
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


# ---------------------------------------------------------------------------
# Real (pure-numpy) BMP codec + resize — no PIL required. 24-bit
# uncompressed BITMAPINFOHEADER BMPs only: the container has no image
# library, and BMP is the one mainstream format fully decodable with
# struct + numpy. A production deployment swaps encode/decode for
# PIL/turbojpeg; ``resize_images``'s Spark plumbing is final either way.
# ---------------------------------------------------------------------------

_BMP_DATA_OFFSET = 54  # 14-byte file header + 40-byte info header


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects an HxWx3 uint8 RGB array")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    # BMP stores rows bottom-up in BGR with 4-byte row padding
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixels = rows.tobytes()
    file_header = struct.pack(
        "<2sIHHI", b"BM", _BMP_DATA_OFFSET + len(pixels), 0, 0, _BMP_DATA_OFFSET
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an HxWx3 uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("decode_bmp: payload lacks the BM magic")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"decode_bmp: unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)
    img = rows[:, :row_bytes].reshape(h, w, 3)[:, :, ::-1]
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def dhash_bits(img: np.ndarray) -> int:
    """Difference hash (dHash) of an HxWx3 RGB array, packed LSB-first.

    The perceptual-hash scheme of image-dedup services (Krawetz,
    "Kind of Like That", hackerfactor 2013): grayscale each pixel with
    integer ``(r+g+b) // 3``, then set bit ``y*(W-1) + x`` iff
    ``gray[y, x+1] > gray[y, x]`` (strict horizontal-gradient sign).
    H*(W-1) bits total — the classic 9x8 form yields 64; the q165
    pipeline's 8x6 source yields 42. Pure numpy/int math so a crafted
    bitmap with hand-known gradient signs pins the exact packed value
    (tests/test_literature_fixtures.py).

    Storage caveat: the return value is an unsigned Python int. Forms
    with >= 64 bits (the classic 9x8 included) can set bit 63 and
    exceed int64 — q165's ``dhash long`` Arrow schema fits only
    because its 42-bit form tops out at 2^42. A pipeline adopting the
    64-bit form must reinterpret to signed (``v - (1 << 64)`` when bit
    63 is set) or store as decimal before shipping through a Spark
    ``long`` column."""
    gray = img.astype(np.int64).sum(axis=2) // 3
    h = 0
    height, width = gray.shape
    for y in range(height):
        for x in range(width - 1):
            if gray[y, x + 1] > gray[y, x]:
                h |= 1 << (y * (width - 1) + x)
    return h


def nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center sampling) via fancy
    indexing — one gather, no Python pixel loops."""
    in_h, in_w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * in_h / height), in_h - 1).astype(np.int64)
    xs = np.minimum(((np.arange(width) + 0.5) * in_w / width), in_w - 1).astype(np.int64)
    return img[ys][:, xs]


RESIZED_SCHEMA = "media_id long, payload binary, meta struct<format:string,n_bytes:int>"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize BMP payloads to ``width`` x ``height`` (nearest-neighbor).

    Arrow-batched narrow map: (media_id, payload, meta) -> same shape
    with the payload re-encoded at the target size and meta.n_bytes
    updated. NULL/empty payloads pass through as NULL with n_bytes=0
    (same contract as the audio featurizer). Non-BMP payloads raise —
    decode errors should fail the task loudly, not silently drop media.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            payloads: list[bytes | None] = []
            metas: list[dict] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                if payload is None or len(payload) == 0:
                    payloads.append(None)
                    metas.append({"format": "bmp", "n_bytes": 0})
                    continue
                resized = encode_bmp(nn_resize(decode_bmp(bytes(payload)), width, height))
                payloads.append(resized)
                metas.append({"format": "bmp", "n_bytes": len(resized)})
            yield pd.DataFrame({"media_id": ids, "payload": payloads, "meta": metas})

    return media.mapInPandas(work, RESIZED_SCHEMA)
