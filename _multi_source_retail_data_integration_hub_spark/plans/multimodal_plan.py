"""Multimodal query surface: binary payload -> feature extraction.

q32 runs the full multimodal plumbing (attach binary payloads ->
Arrow-batched mapInPandas decode -> feature table). The decode is the
deterministic STUB from operators/multimodal.py, which makes it
oracle-checkable: payload bytes are the utf-8 text, so DuckDB can
recompute the same features from ``ascii(substr(text, ...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..sources.testdata import fan_out, load_table
from .registry import query

# Python-stage pipelines (mapInPandas) amortize Arrow round trips best
# on FEWER, larger partitions: 8-way fan-out measured ~2.5x faster than
# 32-way for the chained encode->resize->decode path at bench scale
# (per-partition worker overhead dominates tiny batches). At production
# scale the scan's natural splits set the parallelism instead.
_PY_FAN = 8


@query(
    "q32_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 + (ascii(substr(text, 1, 1)) % 16) * 8 AS INT) AS width,
           CAST(16 + (ascii(substr(text, 2, 1)) % 16) * 8 AS INT) AS height,
           CAST(1 + length(text) % 3 AS INT) AS channels,
           ((ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, 2, 1)) * 7) % 256) / 255.0
             AS mean_luma
    FROM documents
    """,
)
def q32_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), _PY_FAN)
    media = M.attach_payloads(docs)
    return M.decode_image_features(media)


# ---------------------------------------------------------------------------
# q59 — audio feature plumbing: payload bytes -> (n_samples, rms).
# The fake-PCM interpretation is deterministic byte math, so DuckDB can
# replay it: per-byte squares sum exactly in integers (and float64 sums
# of ints < 2^53 are order-independent), then ONE division + sqrt.
# Texts are pure ASCII (asserted by the pipeline), so char positions ==
# byte offsets in the oracle.
# ---------------------------------------------------------------------------
@query(
    "q59_audio_features",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS b
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(b * b) AS DOUBLE) AS ss, COUNT(*) AS n
      FROM bytes GROUP BY 1
    )
    -- LEFT JOIN from documents so zero-length payloads keep their row
    -- (rms 0.0), matching the operator's output exactly.
    SELECT d.doc_id AS media_id,
           CAST(length(d.text) // 2 AS BIGINT) AS n_samples,
           CAST(16000 AS INT) AS sample_rate,
           CASE WHEN a.n IS NULL THEN 0.0 ELSE sqrt(a.ss / a.n) END AS rms
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q59_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), _PY_FAN)
    return M.extract_audio_features(M.attach_payloads(docs))


# ---------------------------------------------------------------------------
# q60 — frame-sampling plumbing: 1-to-N explode of byte offsets at a
# fixed stride, capped — the shape of keyframe extraction without the
# codec. Pure length arithmetic, replayed exactly by the oracle.
# ---------------------------------------------------------------------------
@query(
    "q60_frame_samples",
    oracle="""
    WITH n AS (
      SELECT doc_id, LEAST(8, GREATEST(1, length(text) // 64)) AS n_frames
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * 64 AS BIGINT) AS byte_offset
    FROM n, unnest(range(0, n_frames)) AS t(i)
    """,
)
def q60_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), _PY_FAN)
    return M.sample_frames(M.attach_payloads(docs))


# ---------------------------------------------------------------------------
# q78 — REAL image codec end-to-end: synthesize an 8x6 RGB BMP per
# document from its utf-8 bytes (deterministic), resize to 32x24 with
# the pure-numpy nearest-neighbor path, decode the result, and report
# dimensions + payload size. The whole encode->resize->decode loop runs
# through operators/multimodal.py's Arrow-batched stages — no stubs —
# and the oracle replays the output analytically: resized dims are the
# target constants and a 24-bit 32x24 BMP is exactly 54 + 24*96 = 2358
# bytes (96 % 4 == 0, no row padding), while mean_red checks actual
# pixel CONTENT survived the round trip (nearest-neighbor at integer
# upscale factors replicates pixels, so the mean over the 4x-replicated
# grid equals the source mean; the source mean is recomputable in SQL
# from the same utf-8 bytes the Spark side encoded).
# ---------------------------------------------------------------------------
_SRC_H, _SRC_W = 6, 8  # source 8x6; 8*6*3 = 144 bytes per image
_OUT_W, _OUT_H = 32, 24  # integer 4x upscale in both axes
_OUT_BYTES = 54 + _OUT_H * _OUT_W * 3  # 96-byte rows, 4-byte aligned


@query(
    "q78_image_resize",
    oracle=f"""
    WITH px AS (
      -- the byte-for-char contract is ASSERTED, not assumed: non-ASCII
      -- docs are excluded identically on both sides
      SELECT doc_id, text, unnest(range(0, {_SRC_H * _SRC_W})) AS i
      FROM documents
      WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
    ),
    reds AS (
      -- red channel of pixel i comes from byte 3*i of the repeated text
      -- (documents are ASCII-only, so char indexing == byte indexing)
      SELECT doc_id,
             ascii(substr(repeat(text, CAST(ceil({_SRC_H * _SRC_W * 3.0}
                                              / length(text)) AS INT)),
                          CAST(3 * i + 1 AS INT), 1)) AS red
      FROM px
    )
    SELECT doc_id AS media_id,
           CAST({_OUT_W} AS INT) AS width,
           CAST({_OUT_H} AS INT) AS height,
           CAST({_OUT_BYTES} AS INT) AS n_bytes,
           AVG(red) AS mean_red
    FROM reds
    GROUP BY 1
    """,
)
def q78_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    # char-indexing (oracle) == byte-indexing (encode) only holds for
    # ASCII text — enforce the contract instead of assuming it
    docs = fan_out(load_table(spark, sf_dir, "documents"), _PY_FAN).where(
        (F.length("text") > 0) & (F.octet_length("text") == F.length("text"))
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")
                need = _SRC_H * _SRC_W * 3
                reps = -(-need // len(raw))
                buf = (raw * reps)[:need]
                img = np.frombuffer(buf, dtype=np.uint8).reshape(_SRC_H, _SRC_W, 3)
                payloads.append(M.encode_bmp(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "meta": [{"format": "bmp", "n_bytes": len(p)} for p in payloads],
                }
            )

    media = docs.mapInPandas(encode, M.RESIZED_SCHEMA)
    resized = M.resize_images(media, _OUT_W, _OUT_H)

    def stats(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = M.decode_bmp(bytes(payload))
                rows.append(
                    (
                        int(mid),
                        img.shape[1],
                        img.shape[0],
                        len(bytes(payload)),
                        float(np.mean(img[:, :, 0].astype(np.float64))),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_red"]
            )

    return resized.mapInPandas(
        stats, "media_id long, width int, height int, n_bytes int, mean_red double"
    )


# ---------------------------------------------------------------------------
# q165 — perceptual image near-dup (dHash + banded Hamming join): the
# image twin of the text SimHash pipeline (q147/q151). Each document's
# deterministic 8x6 BMP goes through the REAL codec (encode -> decode,
# Arrow-batched), is grayscaled with integer (r+g+b) DIV 3, and hashed
# by horizontal gradient sign — 7x6 = 42 bits packed into a BIGINT
# (the classic dHash of image-dedup services). Candidate pairs come
# from a 3x14-bit banded equi-join (pigeonhole: Hamming <= 2 cannot
# miss all three bands), verified exactly with bit_count(xor) — never
# an all-pairs scan. The oracle replays the pixel math analytically
# from the same utf-8 bytes (q78's scheme: ASCII contract asserted on
# both sides).
#
# Scale shape: one Python stage per image for codec+hash (Arrow-
# batched, corpus-linear), then JVM-side banding/join — identical plan
# family as the production SimHash join, with the same hot-bucket
# behavior at corpus scale.
# ---------------------------------------------------------------------------
_DH_SRC_H, _DH_SRC_W = 6, 8
_DH_BITS = (_DH_SRC_W - 1) * _DH_SRC_H  # 42
_DH_BAND_BITS = 14
_DH_N_BANDS = 3
_DH_HAM_MAX = 2  # < n_bands: pigeonhole recall guarantee


@query(
    "q165_image_dhash_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             repeat(text, CAST(ceil({_DH_SRC_H * _DH_SRC_W * 3}.0
                                    / length(text)) AS INT)) AS rep
      FROM documents
      WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
    ),
    px AS (
      SELECT doc_id, rep, unnest(range(0, {_DH_SRC_H * _DH_SRC_W})) AS i
      FROM base
    ),
    gray AS (
      SELECT doc_id, i,
             (ascii(substr(rep, CAST(3 * i + 1 AS INT), 1))
              + ascii(substr(rep, CAST(3 * i + 2 AS INT), 1))
              + ascii(substr(rep, CAST(3 * i + 3 AS INT), 1))) // 3 AS g
      FROM px
    ),
    bits AS (
      SELECT a.doc_id,
             (a.i // {_DH_SRC_W}) * {_DH_SRC_W - 1} + (a.i % {_DH_SRC_W})
               AS bitpos,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
      FROM gray a
      JOIN gray b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.i % {_DH_SRC_W} <= {_DH_SRC_W - 2}
    ),
    dh AS (
      SELECT doc_id,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(bitpos AS INT)))
                  AS BIGINT) AS dhash
      FROM bits GROUP BY 1
    ),
    mb AS (
      SELECT doc_id, t.b AS band_id,
             (dhash >> CAST({_DH_BAND_BITS} * t.b AS INT))
               & {(1 << _DH_BAND_BITS) - 1} AS band_val
      FROM dh CROSS JOIN (SELECT unnest(range(0, {_DH_N_BANDS})) AS b) t
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      FROM mb a
      JOIN mb b2 ON b2.band_id = a.band_id AND b2.band_val = a.band_val
                AND a.doc_id < b2.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN dh x ON x.doc_id = c.id_a
    JOIN dh y ON y.doc_id = c.id_b
    WHERE bit_count(xor(x.dhash, y.dhash)) <= {_DH_HAM_MAX}
    ORDER BY c.id_a, c.id_b
    """,
)
def q165_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = fan_out(load_table(spark, sf_dir, "documents"), _PY_FAN).where(
        (F.length("text") > 0) & (F.octet_length("text") == F.length("text"))
    )

    def dhash(batches):
        need = _DH_SRC_H * _DH_SRC_W * 3
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_ids, out_hashes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                reps = -(-need // len(raw))
                buf = (raw * reps)[:need]
                img = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _DH_SRC_H, _DH_SRC_W, 3
                )
                # through the REAL codec: encode -> decode round trip
                decoded = M.decode_bmp(M.encode_bmp(img))
                out_ids.append(int(doc_id))
                out_hashes.append(M.dhash_bits(decoded))
            yield pd.DataFrame({"doc_id": out_ids, "dhash": out_hashes})

    dh = docs.mapInPandas(dhash, "doc_id long, dhash long")
    mask = (1 << _DH_BAND_BITS) - 1
    mb = dh.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(f"shiftright(dhash, {_DH_BAND_BITS * b}) & {mask}").alias(
                            "band_val"
                        ),
                    )
                    for b in range(_DH_N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "dhash", F.col("bb.band_id"), F.col("bb.band_val"))
    a = mb.select(
        F.col("doc_id").alias("id_a"), F.col("dhash").alias("dh_a"),
        "band_id", "band_val",
    )
    b = mb.select(
        F.col("doc_id").alias("id_b"), F.col("dhash").alias("dh_b"),
        "band_id", "band_val",
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("bit_count(dh_a ^ dh_b)").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= _DH_HAM_MAX)
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
        .orderBy("id_a", "id_b")
    )
