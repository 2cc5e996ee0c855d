"""Multimodal query surface: binary payload -> feature extraction.

q32 runs the full multimodal plumbing (attach binary payloads ->
Arrow-batched mapInPandas decode -> feature table). The decode is the
deterministic STUB from operators/multimodal.py, which makes it
oracle-checkable: payload bytes are the utf-8 text, so DuckDB can
recompute the same features from ``ascii(substr(text, ...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as M
from ..sources.testdata import fan_out, load_table
from .registry import query


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
    docs = fan_out(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return M.sample_frames(M.attach_payloads(docs))
