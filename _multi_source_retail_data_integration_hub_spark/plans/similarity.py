"""Similarity-search query surface over the ``embeddings`` table
(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT):

- q26: brute-force exact cosine top-k (the correctness baseline)
- q27: random-hyperplane LSH bucket assignment (scale path, stage 1)
- q28: LSH-bucketed ANN top-k with exact re-rank (scale path, stage 2)

Query set = every 25th vector, standing in for "embed the incoming
batch, find its neighbors in the corpus". See operators/similarity.py
for the quantization scheme that makes Spark and DuckDB agree
bit-for-bit on float-free integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.testdata import load_table
from .registry import query

QUERY_STRIDE = 25

_QUANT_LIST = "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

_BASE_SQL = f"""
    e AS (SELECT vec_id, {_QUANT_LIST} AS qe FROM embeddings),
    n AS (SELECT vec_id, qe, CAST(list_dot_product(qe, qe) AS BIGINT) AS nsq FROM e)
"""


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") % QUERY_STRIDE == 0)


# ---------------------------------------------------------------------------
# q26 — exact brute-force cosine top-5 per query vector
# ---------------------------------------------------------------------------
@query(
    "q26_cosine_topk",
    oracle=f"""
    WITH {_BASE_SQL},
    q AS (SELECT vec_id AS query_id, qe, nsq AS qn FROM n WHERE vec_id % {QUERY_STRIDE} = 0),
    sims AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.qe, c.qe) AS BIGINT) AS dot,
             q.qn, c.nsq AS cn
      FROM q JOIN n c ON c.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) DESC, neighbor_id
             ) AS knn_rank
      FROM sims
    )
    SELECT query_id, knn_rank, neighbor_id, cos_sim FROM ranked WHERE knn_rank <= 5
    """,
)
def q26_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(corpus, _queries_df(spark, sf_dir), k=5)
    return out.withColumnRenamed("rank", "knn_rank")


# ---------------------------------------------------------------------------
# q27 — LSH bucket assignment for every vector (8 hyperplanes, 256 buckets)
# ---------------------------------------------------------------------------
def _bucket_sql(vec_expr: str = "qe") -> str:
    planes = S.hyperplane_weights()
    terms = []
    for p, w in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in w) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {arr}) >= 0 THEN {2**p} ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "q27_lsh_buckets",
    oracle=f"""
    WITH {_BASE_SQL}
    SELECT vec_id, {_bucket_sql()} AS bucket FROM n
    """,
)
def q27_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_buckets(emb, "embedding", "vec_id").select("vec_id", "bucket")


# ---------------------------------------------------------------------------
# q28 — ANN top-3 via LSH bucket equi-join + exact cosine re-rank
# ---------------------------------------------------------------------------
@query(
    "q28_ann_lsh_topk",
    oracle=f"""
    WITH {_BASE_SQL},
    b AS (SELECT vec_id, qe, nsq, {_bucket_sql()} AS bucket FROM n),
    q AS (SELECT vec_id AS query_id, qe, nsq AS qn, bucket FROM b
          WHERE vec_id % {QUERY_STRIDE} = 0),
    sims AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, q.bucket,
             CAST(list_dot_product(q.qe, c.qe) AS BIGINT) AS dot,
             q.qn, c.nsq AS cn
      FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, bucket,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) DESC, neighbor_id
             ) AS knn_rank
      FROM sims
    )
    SELECT query_id, knn_rank, neighbor_id, bucket, cos_sim
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q28_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    out = S.lsh_topk(corpus, _queries_df(spark, sf_dir), k=3)
    return out.withColumnRenamed("rank", "knn_rank")
