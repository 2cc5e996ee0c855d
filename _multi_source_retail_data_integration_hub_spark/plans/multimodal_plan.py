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
from ..sources.testdata import load_table
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
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_payloads(docs)
    return M.decode_image_features(media)
