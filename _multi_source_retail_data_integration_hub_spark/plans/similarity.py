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
from ..operators.graph import connected_components
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


# ---------------------------------------------------------------------------
# q41/q42 — IVF coarse quantization: the second classic ANN scale path.
# Centroids = deterministic corpus sample (vec_id % stride == 3) where
# stride = max(C_STRIDE, ceil(n / MAX_NLIST)) caps the centroid count at
# ~MAX_NLIST regardless of corpus size (operators/similarity.ivf_stride);
# assignment and probing rank centroids by (cosine desc, centroid id
# asc), all in the same exact-integer scheme, so DuckDB replays them
# bit-for-bit — including the stride, via a COUNT(*) scalar subquery.
# ---------------------------------------------------------------------------
_IVF_STRIDE_SQL = (
    f"(SELECT GREATEST({S.C_STRIDE}, CAST(CEIL(COUNT(*) / {S.MAX_NLIST}.0) AS BIGINT)) "
    "FROM embeddings)"
)

_IVF_RANKED_ASSIGN = f"""
    cents AS (SELECT vec_id AS cid, qe AS cqe, nsq AS ccn FROM n
              WHERE vec_id % {_IVF_STRIDE_SQL} = {S.CENTROID_RESIDUE}),
    ranked_assign AS (
      SELECT n.vec_id, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY n.vec_id
               ORDER BY CAST(CAST(list_dot_product(n.qe, c.cqe) AS BIGINT) AS DOUBLE)
                        / sqrt(CAST(n.nsq * c.ccn AS DOUBLE)) DESC, c.cid
             ) AS crank
      FROM n CROSS JOIN cents c
    )
"""


@query(
    "q41_ivf_assign",
    oracle=f"""
    WITH {_BASE_SQL},
    {_IVF_RANKED_ASSIGN}
    SELECT vec_id, cid AS list_id FROM ranked_assign WHERE crank = 1
    """,
)
def q41_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_assign(emb, "vec_id", "embedding")


@query(
    "q42_ann_ivf_topk",
    oracle=f"""
    WITH {_BASE_SQL},
    {_IVF_RANKED_ASSIGN},
    members AS (SELECT vec_id, cid AS list_id FROM ranked_assign WHERE crank = 1),
    probes AS (SELECT vec_id AS query_id, cid AS list_id FROM ranked_assign
               WHERE crank <= 2 AND vec_id % {QUERY_STRIDE} = 0),
    sims AS (
      SELECT p.query_id, m.vec_id AS neighbor_id, p.list_id,
             CAST(list_dot_product(qv.qe, mv.qe) AS BIGINT) AS dot,
             qv.nsq AS qn, mv.nsq AS cn
      FROM probes p
      JOIN members m ON m.list_id = p.list_id AND m.vec_id != p.query_id
      JOIN n qv ON qv.vec_id = p.query_id
      JOIN n mv ON mv.vec_id = m.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, list_id,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn * cn AS DOUBLE)) DESC, neighbor_id
             ) AS knn_rank
      FROM sims
    )
    SELECT query_id, knn_rank, neighbor_id, list_id, cos_sim
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q42_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    out = S.ivf_topk(corpus, _queries_df(spark, sf_dir), k=3, nprobe=2)
    return out.withColumnRenamed("rank", "knn_rank")


# ---------------------------------------------------------------------------
# q37 — embedding-cosine near-duplicate detection (dedup family)
# The sf corpus has no near-identical vectors, so the query augments it
# with deterministic perturbations (last 8 dims zeroed, id + 100000):
# cos(orig, mutant) = ||e[:56]|| / ||e|| ~= 0.94. Candidates come from
# the LSH bucket equi-join (small perturbations mostly preserve
# hyperplane signs), hot buckets subsplit past EMB_LSH_MAX_BUCKET
# members (inactive at test SFs; see _bucket_pair_cands_uncached);
# pairs with exact cosine >= 0.9 are near-dups.
# At 100 TB this is the standard embedding-dedup shape: bucket ->
# within-bucket exact verify -> keep min-id canonical.
# ---------------------------------------------------------------------------
NEARDUP_OFFSET = 100_000
NEARDUP_THRESHOLD = 0.9

# mutant ids must never collide with real vec_ids: beyond 100k vectors
# the offset grows with the corpus (GREATEST keeps small-SF results
# byte-identical). The oracle computes the same offset with a scalar
# subquery; the Spark side mirrors it with one tiny max() action.
_OFFSET_SQL = f"GREATEST({NEARDUP_OFFSET}, (SELECT MAX(vec_id) + 1 FROM embeddings))"


def _augmented_sql() -> str:
    zeros = ", ".join(["CAST(0.0 AS FLOAT)"] * 8)
    return f"""
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_OFFSET_SQL} AS vec_id,
             list_concat(list_slice(embedding, 1, 56), [{zeros}]) AS embedding
      FROM embeddings
    """


_NEARDUP_CTES = f"""
    aug AS ({_augmented_sql()}),
    e AS (SELECT vec_id, {_QUANT_LIST} AS qe FROM aug),
    n AS (SELECT vec_id, qe, CAST(list_dot_product(qe, qe) AS BIGINT) AS nsq FROM e),
    b AS (SELECT vec_id, qe, nsq, {_bucket_sql()} AS bucket FROM n),
    bcnt AS (SELECT bucket, COUNT(*) AS bucket_size FROM b GROUP BY 1),
    bs AS (
      SELECT b.vec_id, b.qe, b.nsq, b.bucket,
             CAST('0x' || substr(md5('0:' || CAST(b.vec_id AS VARCHAR)), 1, 8)
                  AS BIGINT)
               % GREATEST(1, CAST(CEIL(bcnt.bucket_size /
                                       {S.EMB_LSH_MAX_BUCKET})
                                  AS BIGINT)) AS salt
      FROM b JOIN bcnt USING (bucket)
    ),
    allpairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             CAST(list_dot_product(a.qe, b2.qe) AS BIGINT) AS dot,
             a.nsq AS na, b2.nsq AS nb
      FROM bs a JOIN bs b2 ON a.bucket = b2.bucket AND a.salt = b2.salt
                          AND a.vec_id < b2.vec_id
    ),
    neardup AS (
      SELECT id_a, id_b,
             CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) AS cos_sim
      FROM allpairs
      WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) >= {NEARDUP_THRESHOLD}
    )
"""


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base corpus + deterministic near-dup mutants (the q37 data
    augmentation), shared by the near-dup pair stage and q158's
    negative-pair embedding lookups. The lazy PLAN is session-cached
    (keyed like every other shared stage) because building it costs a
    driver action — the max(vec_id) offset probe — that repeated
    callers (q158 touches this once directly and once via the pair
    stage; bench runs twice) should not re-pay. The frame itself stays
    unmaterialized: it is a cheap projection both consumers fold into
    their own pipelines."""
    from .training_data import _SIG_CACHE, _sig_cache_key

    key = _sig_cache_key(spark, sf_dir, "aug")
    cached = _SIG_CACHE.get(key)
    if cached is not None:
        return cached
    emb = load_table(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0] or 0
    offset = max(NEARDUP_OFFSET, max_id + 1)
    zeros = F.array(*[F.lit(0.0).cast("float")] * 8)
    mutants = emb.select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.concat(F.slice("embedding", 1, 56), zeros).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(mutants)
    _SIG_CACHE[key] = aug
    return aug


def _bucket_pair_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, cos_sim) for every LSH bucket-mate pair (PRE
    near-dup threshold) over the augmented corpus — the shared stage
    behind q37/q53/q158 (the >= threshold side) and q164 (the hard
    negatives just BELOW it). Session-cached under training_data's
    _SIG_CACHE discipline (one eviction point,
    plans/training_data.py::clear_session_caches): in a real pipeline
    this is the persisted candidate-pair table every downstream
    consumer filters its own way. Function-level import — q157 imports
    this module at module level, so the reverse import must stay
    deferred. The uncached pipeline stays snapshot in PLANS.md via
    tools/dump_plans.py's EXTRA_PLANS."""
    from .training_data import _SIG_CACHE, _sig_cache_key

    key = _sig_cache_key(spark, sf_dir, "embcand")
    cached = _SIG_CACHE.get(key)
    if cached is None:
        cached = _bucket_pair_cands_uncached(spark, sf_dir).localCheckpoint()
        _SIG_CACHE[key] = cached
    return cached


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The >= NEARDUP_THRESHOLD filter over the cached candidate
    stage: q37 (pairs), q53 (clusters), q158 (contrastive
    positives)."""
    return _bucket_pair_cands(spark, sf_dir).where(
        F.col("cos_sim") >= NEARDUP_THRESHOLD
    )


def _bucket_pair_cands_uncached(
    spark: SparkSession,
    sf_dir: str,
    max_bucket_size: int | None = S.EMB_LSH_MAX_BUCKET,
) -> DataFrame:
    # Hot-bucket subsplit BEFORE the self-join (r11 x64 rehearsal
    # finding): the 8-plane bucket space is fixed at 256 buckets, so an
    # uncapped within-bucket join grows quadratically with the corpus
    # and its hottest bucket is one m² task — at x64 those tasks OOMed
    # the executor heap. The cap (inactive at test SFs; sf0.1 max
    # bucket = 48) is replayed exactly by every consumer's oracle via
    # _NEARDUP_CTES, so the pair sample stays engine-identical where
    # it does engage.
    aug = _augmented(spark, sf_dir)
    b = S.subsplit_hot_buckets(
        S.lsh_buckets(aug, "embedding", "vec_id"),
        "vec_id",
        "bucket",
        max_bucket_size,
    )
    keys = ["bucket", "salt"]
    a_side = b.select(F.col("vec_id").alias("id_a"), F.col("qe").alias("qa"), F.col("nsq").alias("na"), *keys)
    b_side = b.select(F.col("vec_id").alias("id_b"), F.col("qe").alias("qb"), F.col("nsq").alias("nb"), *keys)
    pairs = (
        a_side.join(b_side, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", S.dot_long(F.col("qa"), F.col("qb")))
        .withColumn("cos_sim", S.cosine_from_ints(F.col("dot"), F.col("na"), F.col("nb")))
    )
    return pairs.select(
        "id_a", "id_b", "cos_sim"
    )


@query(
    "q37_cosine_neardup",
    oracle=f"""
    WITH {_NEARDUP_CTES}
    SELECT id_a, id_b, cos_sim FROM neardup
    """,
)
def q37_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _neardup_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# q53 — duplicate CLUSTERS: connected components over the near-dup pair
# graph (operators/graph.py, iterative min-label propagation). This is
# the step that turns pairwise similarity into dedup decisions — keep
# one canonical doc (the min id) per cluster. The DuckDB twin replays
# the fixpoint with a recursive CTE (expressible because test
# components are small chains; Spark's loop is the 100 TB path).
# ---------------------------------------------------------------------------
@query(
    "q53_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_CTES},
    nodes AS (SELECT id_a AS node FROM neardup UNION SELECT id_b FROM neardup),
    edges AS (SELECT id_a AS a, id_b AS b FROM neardup
              UNION SELECT id_b, id_a FROM neardup),
    walk AS (
      SELECT node, node AS reach FROM nodes
      UNION
      SELECT w.node, e.b AS reach FROM walk w JOIN edges e ON e.a = w.reach
    )
    SELECT node AS vec_id, MIN(reach) AS cluster_id
    FROM walk GROUP BY 1
    """,
)
def q53_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _neardup_pairs(spark, sf_dir)
    # assume_distinct: each vector lives in exactly ONE (bucket, salt)
    # group, and the candidate join keeps id_a < id_b — a pair can't
    # appear twice, so the operator skips its dedup shuffle (r13 s3)
    comps = connected_components(
        pairs, src="id_a", dst="id_b", assume_distinct=True
    )
    return comps.select(F.col("node").alias("vec_id"), "cluster_id")


# ---------------------------------------------------------------------------
# q73 — higher-order array functions over embeddings, fully JVM-side:
# transform/aggregate/filter on ARRAY<FLOAT> compute per-vector stats
# with NO Python in the plan (the quantize-to-int scheme keeps every
# number exact, so the DuckDB list_* twins agree bit-for-bit). This is
# the "vector column math without a UDF" baseline the brief calls for —
# at 100 TB it whole-stage-codegens into the scan projection.
# ---------------------------------------------------------------------------
@query(
    "q73_embedding_stats",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_QUANT_LIST} AS qe FROM embeddings)
    SELECT vec_id, label,
           CAST(len(qe) AS INT) AS dim,
           CAST(list_dot_product(qe, qe) AS BIGINT) AS sq_norm_q,
           CAST(list_aggregate(list_transform(qe, x -> abs(x)), 'sum') AS BIGINT)
             AS l1_norm_q,
           CAST(list_aggregate(qe, 'max') AS BIGINT) AS max_q,
           CAST(list_aggregate(qe, 'min') AS BIGINT) AS min_q,
           CAST(len(list_filter(qe, x -> x > 0)) AS BIGINT) AS n_positive
    FROM e
    """,
)
def q73_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE definition of the quantization convention (operators.similarity)
    qe = S.quantized(F.col("embedding"))
    zero = F.lit(0).cast("bigint")
    stats = emb.select(
        "vec_id",
        "label",
        qe.alias("qe"),
    ).select(
        "vec_id",
        "label",
        F.size("qe").cast("int").alias("dim"),
        F.aggregate("qe", zero, lambda a, x: a + x * x).alias("sq_norm_q"),
        F.aggregate("qe", zero, lambda a, x: a + F.abs(x)).alias("l1_norm_q"),
        F.array_max("qe").cast("bigint").alias("max_q"),
        F.array_min("qe").cast("bigint").alias("min_q"),
        F.size(F.filter("qe", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )
    return stats


# ---------------------------------------------------------------------------
# q104 — ANN recall audit: IVF top-k vs brute-force ground truth.
# Completes the accuracy-contract family (q35 HLL, q49 approx
# percentile, q80 MinHash, q81 count-min): every approximate operator
# ships with an exact-anchored measurement of how approximate it is.
# Per query vector: |IVF top-k ∩ exact top-k| / k. The exact side is
# the q26 baseline (query-set broadcast, corpus never shuffled); the
# audit's cost is the baseline's cost by construction, so it runs at
# the same scale the ANN path does — on a sampled query set, never
# all-pairs over the corpus.
#
# Measured on this corpus: mean recall@5 ~= 0.34 at nprobe=2 — the
# synthetic embeddings are uniform (no cluster structure), so IVF
# probing 2 of ~100 lists sees ~2% of the corpus and recall is
# correspondingly low. That is the measurement working as intended:
# on real clustered embeddings recall rises with cluster purity, and
# a pipeline tunes nprobe against THIS number, not against hope.
# ---------------------------------------------------------------------------
RECALL_K = 5


@query(
    "q104_ann_recall",
    oracle=f"""
    WITH {_BASE_SQL},
    q AS (SELECT vec_id AS query_id, qe, nsq AS qn FROM n
          WHERE vec_id % {QUERY_STRIDE} = 0),
    exact_ranked AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY CAST(CAST(list_dot_product(q.qe, c.qe) AS BIGINT) AS DOUBLE)
                        / sqrt(CAST(q.qn * c.nsq AS DOUBLE)) DESC, c.vec_id
             ) AS r
      FROM q JOIN n c ON c.vec_id != q.query_id
    ),
    exact_topk AS (SELECT query_id, neighbor_id FROM exact_ranked
                   WHERE r <= {RECALL_K}),
    {_IVF_RANKED_ASSIGN},
    members AS (SELECT vec_id, cid AS list_id FROM ranked_assign WHERE crank = 1),
    probes AS (SELECT vec_id AS query_id, cid AS list_id FROM ranked_assign
               WHERE crank <= 2 AND vec_id % {QUERY_STRIDE} = 0),
    ann_ranked AS (
      SELECT p.query_id, m.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY CAST(CAST(list_dot_product(qv.qe, mv.qe) AS BIGINT) AS DOUBLE)
                        / sqrt(CAST(qv.nsq * mv.nsq AS DOUBLE)) DESC, m.vec_id
             ) AS r
      FROM probes p
      JOIN members m ON m.list_id = p.list_id AND m.vec_id != p.query_id
      JOIN n qv ON qv.vec_id = p.query_id
      JOIN n mv ON mv.vec_id = m.vec_id
    ),
    ann_topk AS (SELECT query_id, neighbor_id FROM ann_ranked
                 WHERE r <= {RECALL_K}),
    hits AS (
      SELECT e.query_id, COUNT(a.neighbor_id) AS n_hits
      FROM exact_topk e
      LEFT JOIN ann_topk a ON a.query_id = e.query_id
                          AND a.neighbor_id = e.neighbor_id
      GROUP BY 1
    )
    SELECT query_id, n_hits,
           CAST(n_hits AS DOUBLE) / {RECALL_K} AS recall_at_k
    FROM hits ORDER BY query_id
    """,
)
def q104_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = _queries_df(spark, sf_dir)
    exact = S.brute_force_topk(corpus, queries, k=RECALL_K).select(
        "query_id", "neighbor_id"
    )
    ann = S.ivf_topk(corpus, queries, k=RECALL_K, nprobe=2).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    hits = (
        exact.join(
            ann,
            (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("an").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        (F.col("n_hits").cast("double") / RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# q105 — int8 scalar quantization with a reconstruction-error contract.
# Capability class: embedding compression for 100 TB vector stores —
# float32 -> 8-bit codes is the first 4x storage/IO win before any
# recall-sensitive machinery (PQ/OPQ). Exact-anchored like the sketch
# contracts (q35/q49/q81): every vector's reconstruction error is
# computed against the uncompressed original and asserted against the
# scale/2 bound IN the result, so a quantizer regression turns into a
# red oracle row, not silent recall loss downstream. Entirely per-row
# map work — the only Exchange in the plan is the final presentation
# ORDER BY (the operator itself is plan-asserted shuffle-free in
# tests/test_similarity.py).
# ---------------------------------------------------------------------------
@query(
    "q105_embedding_quantization",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
      FROM embeddings WHERE embedding IS NOT NULL
    ), s AS (
      SELECT vec_id, dv,
             list_aggregate(dv, 'min') AS mn,
             (list_aggregate(dv, 'max') - list_aggregate(dv, 'min')) / 255.0
               AS scale
      FROM e
    ), c AS (
      SELECT vec_id, dv, mn, scale,
             CASE WHEN scale = 0
                  THEN list_transform(dv, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(dv,
                       x -> CAST(floor((x - mn) / scale + 0.5) AS BIGINT))
             END AS codes
      FROM s
    ), err AS (
      SELECT vec_id, len(dv) AS n_dims, scale,
             len(list_distinct(codes)) AS n_distinct_codes,
             list_aggregate(
               list_transform(range(1, len(dv) + 1),
                              i -> abs(dv[i] - (mn + codes[i] * scale))),
               'max') AS max_abs_err
      FROM c
    )
    SELECT vec_id, n_dims, scale, n_distinct_codes, max_abs_err,
           max_abs_err <= scale / 2 + 1e-12 AS within_bound
    FROM err ORDER BY vec_id
    """,
)
def q105_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = S.scalar_quantize(emb, "embedding", "vec_id", bits=8)
    return S.dequantize_error(q).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q158 — contrastive training-pair mining: turn the near-dup pair graph
# into a labeled dataset for embedding/reranker training (SimCSE /
# sentence-transformers data-prep class). Positives are the exact-
# verified near-dup pairs (the q37 stage, shared); each positive anchor
# gets one deterministic pseudo-random negative partner from the base
# corpus (md5-derived index, anti-joined against the near-dup set in
# both orientations so no true near-dup leaks into the negatives), and
# both classes carry their exact cosine so downstream training can
# margin-filter.
#
# Scale shape: anchors are bounded by the positive set; the negative
# partner is computed arithmetically (no sampling shuffle) and the
# embedding lookups are id-keyed equi-joins — nothing quadratic. The
# corpus-size scalar is the allowlisted 1-row cross-join.
# ---------------------------------------------------------------------------
@query(
    "q158_contrastive_pairs",
    oracle=f"""
    WITH {_NEARDUP_CTES},
    nn AS (SELECT COUNT(*) AS n_base FROM embeddings),
    anchors AS (SELECT DISTINCT id_a FROM neardup),
    negc AS (
      SELECT a.id_a,
             (a.id_a + 1
              + (CAST('0x' || substr(md5(CAST(a.id_a AS VARCHAR)), 1, 8)
                      AS BIGINT) % (nn.n_base - 1))) % nn.n_base AS id_b
      FROM anchors a CROSS JOIN nn
    ),
    negf AS (
      SELECT c.id_a, c.id_b FROM negc c
      WHERE c.id_a != c.id_b
        AND NOT EXISTS (SELECT 1 FROM neardup d
                        WHERE (d.id_a = c.id_a AND d.id_b = c.id_b)
                           OR (d.id_a = c.id_b AND d.id_b = c.id_a))
    ),
    negs AS (
      SELECT f.id_a, f.id_b,
             CAST(list_dot_product(x.qe, y.qe) AS BIGINT) AS dot,
             x.nsq AS na, y.nsq AS nb
      FROM negf f
      JOIN n x ON x.vec_id = f.id_a
      JOIN n y ON y.vec_id = f.id_b
    )
    SELECT 1 AS label, id_a, id_b, cos_sim FROM neardup
    UNION ALL
    SELECT 0 AS label, id_a, id_b,
           CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) AS cos_sim
    FROM negs
    ORDER BY label DESC, id_a, id_b
    """,
)
def q158_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = _neardup_pairs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.agg(F.count("*").alias("n_base"))
    anchors = pos.select("id_a").distinct()
    h = F.conv(
        F.md5(F.col("id_a").cast("string")).substr(1, 8), 16, 10
    ).cast("bigint")
    negc = anchors.crossJoin(F.broadcast(n)).select(
        "id_a",
        F.pmod(
            F.col("id_a") + 1 + F.pmod(h, F.col("n_base") - 1), F.col("n_base")
        ).alias("id_b"),
    )
    sym = pos.select("id_a", "id_b").union(
        pos.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    neg = negc.where(F.col("id_a") != F.col("id_b")).join(
        sym, ["id_a", "id_b"], "left_anti"
    )
    q = S.with_quantized(_augmented(spark, sf_dir), "embedding", "vec_id")
    a_side = q.select(
        F.col("vec_id").alias("id_a"), F.col("qe").alias("qa"), F.col("nsq").alias("na")
    )
    b_side = q.select(
        F.col("vec_id").alias("id_b"), F.col("qe").alias("qb"), F.col("nsq").alias("nb")
    )
    negs = (
        neg.join(a_side, "id_a")
        .join(b_side, "id_b")
        .withColumn("dot", S.dot_long(F.col("qa"), F.col("qb")))
        .withColumn(
            "cos_sim", S.cosine_from_ints(F.col("dot"), F.col("na"), F.col("nb"))
        )
        .select("id_a", "id_b", "cos_sim")
    )
    out = pos.withColumn("label", F.lit(1)).unionByName(
        negs.withColumn("label", F.lit(0))
    )
    return out.select(
        F.col("label").cast("int").alias("label"), "id_a", "id_b", "cos_sim"
    ).orderBy(F.desc("label"), "id_a", "id_b")


# ---------------------------------------------------------------------------
# q164 — hard-negative mining: for every vector, its closest LSH
# bucket-mate that is NOT a near-duplicate (cos < threshold) — the
# "hard" negatives contrastive training actually needs (random
# negatives like q158's are trivially separable; the pairs just below
# the dup threshold are where the margin is learned). Shares the
# cached candidate-pair stage with q37/q53/q158; the per-anchor top-1
# is a hash-partitioned WindowGroupLimit (per-partition heaps, anchors
# parallelize). Cosines are bit-identical across engines (one integer
# dot, one sqrt, one division), so ordering and the driver hash agree.
# ---------------------------------------------------------------------------
@query(
    "q164_hard_negatives",
    oracle=f"""
    WITH {_NEARDUP_CTES},
    cand AS (
      SELECT id_a, id_b,
             CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) AS cos_sim
      FROM allpairs
      WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE))
            < {NEARDUP_THRESHOLD}
    ),
    symc AS (
      SELECT id_a AS anchor, id_b AS partner, cos_sim FROM cand
      UNION ALL
      SELECT id_b AS anchor, id_a AS partner, cos_sim FROM cand
    ),
    ranked AS (
      SELECT anchor, partner, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY anchor
                                ORDER BY cos_sim DESC, partner) AS rn
      FROM symc
    )
    SELECT anchor, partner, cos_sim FROM ranked WHERE rn = 1 ORDER BY anchor
    """,
)
def q164_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import grouped_topk

    cand = _bucket_pair_cands(spark, sf_dir).where(
        F.col("cos_sim") < NEARDUP_THRESHOLD
    )
    symc = cand.select(
        F.col("id_a").alias("anchor"), F.col("id_b").alias("partner"), "cos_sim"
    ).unionAll(
        cand.select(
            F.col("id_b").alias("anchor"), F.col("id_a").alias("partner"), "cos_sim"
        )
    )
    return (
        grouped_topk(symc, ["anchor"], [F.desc("cos_sim"), F.asc("partner")], 1)
        .select("anchor", "partner", "cos_sim")
        .orderBy("anchor")
    )


# ---------------------------------------------------------------------------
# q167 — SemDeDup-style cluster-scoped semantic dedup (Abbas et al.
# 2023): assign every vector to an IVF coarse cluster, verify exact
# cosine ONLY within each cluster, and drop every vector that has a
# lower-id cluster-mate above the threshold (deterministic min-id
# representative; the paper keeps the vector farthest from the
# centroid — any total order works, ours is replayable in SQL).
# Completes the embedding-dedup family: q37/q53 find near-dups via LSH
# bucket recall; SemDeDup scopes the quadratic verify to k-means-style
# clusters instead, the shape used for LAION/web-scale corpus pruning.
#
# Scale shape: centroid set is bounded by ivf_stride (<= ~MAX_NLIST
# collect + broadcast); assignment is one Arrow matmul pass, no
# shuffle; the within-cluster self-join is an equi-join on list_id
# whose cost is sum(cluster_size^2) — bounded by nlist sizing exactly
# like the LSH hot-bucket caps (at 100 TB the assignment table is
# persisted bucketed by list_id via write_members_bucketed, making the
# verify join exchange-free). Runs over the q37 augmented corpus so
# real near-dup structure exists at test scale.
# ---------------------------------------------------------------------------
_SEMDEDUP_ASSIGN_SQL = f"""
    aug AS ({{aug}}),
    e AS (SELECT vec_id, {_QUANT_LIST} AS qe FROM aug),
    n AS (SELECT vec_id, qe,
                 CAST(list_dot_product(qe, qe) AS BIGINT) AS nsq FROM e),
    st AS (SELECT GREATEST({S.C_STRIDE},
                           CAST(CEIL(COUNT(*) / {S.MAX_NLIST}.0) AS BIGINT))
                    AS stride FROM aug),
    cents AS (SELECT vec_id AS cid, qe AS cqe, nsq AS ccn
              FROM n CROSS JOIN st
              WHERE vec_id % st.stride = {S.CENTROID_RESIDUE}),
    ranked_assign AS (
      SELECT n.vec_id, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY n.vec_id
               ORDER BY CAST(CAST(list_dot_product(n.qe, c.cqe) AS BIGINT)
                             AS DOUBLE)
                        / sqrt(CAST(n.nsq * c.ccn AS DOUBLE)) DESC, c.cid
             ) AS crank
      FROM n CROSS JOIN cents c
    ),
    members AS (SELECT vec_id, cid AS list_id FROM ranked_assign
                WHERE crank = 1)
"""


def _semdedup_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized IVF assignment of the augmented corpus
    (vec_id, qe, nsq, list_id) — the SemDeDup verify stage self-joins
    it and the flag join reads it again, so it is checkpointed once
    per session under training_data's _SIG_CACHE discipline (single
    eviction point, clear_session_caches). In production this is the
    persisted assignment table, written bucketed by list_id via
    write_members_bucketed so the verify join needs no Exchange."""
    from ..operators.checkpointing import materialize
    from .training_data import _SIG_CACHE, _sig_cache_key

    key = _sig_cache_key(spark, sf_dir, "semassign")
    cached = _SIG_CACHE.get(key)
    if cached is None:
        aug = _augmented(spark, sf_dir)
        cq = S.with_quantized(aug, "embedding", "vec_id")
        cents = S.ivf_centroid_matrix(cq, "vec_id")
        cached = materialize(S.ivf_probes(cq, cents, 1, "vec_id"))
        _SIG_CACHE[key] = cached
    return cached


@query(
    "q167_semdedup",
    oracle=f"""
    WITH {_SEMDEDUP_ASSIGN_SQL.format(aug=_augmented_sql())},
    mv AS (SELECT m.vec_id, m.list_id, n.qe, n.nsq
           FROM members m JOIN n USING (vec_id)),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS dot,
             a.nsq AS na, b.nsq AS nb
      FROM mv a JOIN mv b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
      WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE))
            >= {NEARDUP_THRESHOLD}
    )
    SELECT m.vec_id, m.list_id,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS kept
    FROM members m LEFT JOIN dropped d USING (vec_id)
    ORDER BY m.vec_id
    """,
)
def q167_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.semdedup(
        threshold=NEARDUP_THRESHOLD,
        assigned=_semdedup_assigned(spark, sf_dir),
    ).orderBy("vec_id")


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, pos, s, c): exact integer per-label centroid sums plus
    contribution counts, materialized once per session (_SIG_CACHE
    discipline) — |labels| x dim rows, so the checkpoint is tiny and
    every q173 consumer (global centroid, vector counts, dot products)
    reads it instead of re-scanning the corpus. Without this the
    physical plan recomputes the posexplode subtree once per consumer
    (three corpus scans at 100 TB)."""
    from ..operators.checkpointing import materialize
    from .training_data import _SIG_CACHE, _sig_cache_key

    key = _sig_cache_key(spark, sf_dir, "labelcent")
    cached = _SIG_CACHE.get(key)
    if cached is None:
        emb = load_table(spark, sf_dir, "embeddings")
        p = emb.select(
            "label", F.posexplode(S.quantized(F.col("embedding"))).alias("pos0", "v")
        ).select("label", (F.col("pos0") + 1).alias("pos"), "v")
        cached = materialize(
            p.groupBy("label", "pos").agg(
                F.sum("v").cast("bigint").alias("s"),
                F.count("*").cast("bigint").alias("c"),
            )
        )
        _SIG_CACHE[key] = cached
    return cached


# ---------------------------------------------------------------------------
# q173 — embedding centroid drift: per-label centroid cosine against
# the global centroid — the embedding-space twin of q170's token-KL
# drift audit (a label/source/snapshot whose centroid swings away
# from the mix signals upstream distribution change before any
# downstream metric moves). Cosine is scale-invariant, so the exact
# integer SUM vectors stand in for the mean centroids bit-for-bit:
# cos(sum_l, sum_g) == cos(mean_l, mean_g) mathematically, and the
# integer sums make both engines agree exactly. (At true 100 TB the
# int64 raw-sum dot would overflow; the production path divides by
# counts in double first — same cosine by scale invariance, only the
# oracle-exact convention changes.)
#
# Scale shape: posexplode -> (label, pos) hash agg with map-side
# partials (64 rows per label), the global centroid re-aggregated
# from the per-label sums (|labels| x 64 rows, NOT a second corpus
# scan), then all cosine arithmetic on the tiny centroid tables.
# ---------------------------------------------------------------------------
@query(
    "q173_centroid_drift",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_QUANT_LIST} AS qe FROM embeddings),
    p AS (
      SELECT label,
             unnest(range(1, len(qe) + 1)) AS pos,
             unnest(qe) AS v
      FROM e
    ),
    lc AS (
      SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
      FROM p GROUP BY 1, 2
    ),
    gc AS (SELECT pos, CAST(SUM(s) AS BIGINT) AS g FROM lc GROUP BY 1),
    nv AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
           FROM p WHERE pos = 1 GROUP BY 1),
    dots AS (
      SELECT l.label,
             CAST(SUM(l.s * g.g) AS BIGINT) AS dot,
             CAST(SUM(l.s * l.s) AS BIGINT) AS nl,
             CAST(SUM(g.g * g.g) AS BIGINT) AS ng
      FROM lc l JOIN gc g USING (pos)
      GROUP BY 1
    )
    SELECT d.label, nv.n_vecs,
           CAST(d.dot AS DOUBLE)
             / sqrt(CAST(d.nl AS DOUBLE) * CAST(d.ng AS DOUBLE))
             AS cos_to_global
    FROM dots d JOIN nv USING (label)
    ORDER BY d.label
    """,
)
def q173_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    lc = _label_centroids(spark, sf_dir)  # label, pos, s, c — ONE scan
    gc = lc.groupBy("pos").agg(F.sum("s").cast("bigint").alias("g"))
    # every vector contributes one element at every pos (uniform dim),
    # so any single pos's contribution count IS the label's vector count
    nv = lc.where(F.col("pos") == 1).select(
        "label", F.col("c").alias("n_vecs")
    )
    dots = (
        lc.join(gc, "pos")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("g")).cast("bigint").alias("dot"),
            F.sum(F.col("s") * F.col("s")).cast("bigint").alias("nl"),
            F.sum(F.col("g") * F.col("g")).cast("bigint").alias("ng"),
        )
    )
    return (
        dots.join(nv, "label")
        .select(
            "label",
            "n_vecs",
            (
                F.col("dot").cast("double")
                / F.sqrt(F.col("nl").cast("double") * F.col("ng").cast("double"))
            ).alias("cos_to_global"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q178 — incremental SemDeDup probe: dedup an ARRIVING batch against
# the already-clustered corpus WITHOUT moving the clusters — the
# ingest-time twin of q167 (as q125 is to the LSH near-dup family).
# Centroids derive from the CORPUS ONLY, so batch arrivals never
# reshape existing assignments; each batch vector is assigned to its
# nearest existing cluster and exact-verified against that cluster's
# members only. The synthetic batch makes both outcomes real: mutants
# with the last 8 dims zeroed stay ~0.94 cosine to their source
# (dropped), mutants with the first 32 dims zeroed fall to ~0.71
# (kept). Registered in r9 after that round's window budget closed and
# deferred; the deferral was resolved in r10 (q174-q178 led the r10
# window and all five are driver-green in CORRECTNESS_r10).
#
# Scale shape: the batch is the small side by contract — one Arrow
# matmul pass against the O(MAX_NLIST) broadcast centroid matrix,
# then an equi-join on list_id against the persisted (bucketed)
# members table. Corpus-side work is one-time per session: the
# raw-corpus assignment is materialized under _SIG_CACHE
# ("semassign_base" — distinct from q167's augmented-corpus
# "semassign") and the centroid broadcast handle is shared by the
# member and batch probe stages.
# ---------------------------------------------------------------------------
_PROBE_OFFSET_SQL = (
    "GREATEST(200000, 2 * (SELECT MAX(vec_id) + 1 FROM embeddings))"
)


def _probe_batch_sql() -> str:
    zeros8 = ", ".join(["CAST(0.0 AS FLOAT)"] * 8)
    zeros32 = ", ".join(["CAST(0.0 AS FLOAT)"] * 32)
    return f"""
      SELECT vec_id + {_PROBE_OFFSET_SQL} AS batch_id,
             list_concat(list_slice(embedding, 1, 56), [{zeros8}])
               AS embedding
      FROM embeddings WHERE vec_id % 20 = 1
      UNION ALL
      SELECT vec_id + {_PROBE_OFFSET_SQL} AS batch_id,
             list_concat([{zeros32}],
                         list_slice(embedding, 33, 64)) AS embedding
      FROM embeddings WHERE vec_id % 20 = 11
    """


def _semdedup_base_assigned(spark: SparkSession, sf_dir: str):
    """(materialized raw-corpus IVF assignment, Broadcast centroid
    handle) for the ingest path. Distinct from q167's "semassign"
    cache, which assigns the AUGMENTED corpus; the ingest contract is
    that arriving batches join the REAL corpus's clusters. Cached
    under the shared _SIG_CACHE discipline so repeated probes (bench
    RUNS=2, multiple batches per session) re-pay neither the corpus
    assignment nor the centroid broadcast; both probe stages share
    the ONE broadcast handle per ivf_probes' own guidance."""
    from ..operators.checkpointing import materialize
    from .training_data import _SIG_CACHE, _sig_cache_key

    key = _sig_cache_key(spark, sf_dir, "semassign_base")
    cached = _SIG_CACHE.get(key)
    if cached is None:
        emb = load_table(spark, sf_dir, "embeddings")
        cq = S.with_quantized(emb, "embedding", "vec_id")
        cents = S.ivf_centroid_matrix(cq, "vec_id")
        bc = spark.sparkContext.broadcast(cents)
        assigned = materialize(S.ivf_probes(cq, bc, 1, "vec_id"))
        cached = (assigned, bc)
        _SIG_CACHE[key] = cached
    return cached


@query(
    "q178_semdedup_probe",
    oracle=f"""
    WITH {_SEMDEDUP_ASSIGN_SQL.format(aug="SELECT vec_id, embedding FROM embeddings")},
    mv AS (SELECT m.vec_id, m.list_id, n.qe, n.nsq
           FROM members m JOIN n USING (vec_id)),
    batch AS ({_probe_batch_sql()}),
    bn AS (
      SELECT batch_id, {_QUANT_LIST} AS qe FROM batch
    ),
    bq AS (SELECT batch_id, qe,
                  CAST(list_dot_product(qe, qe) AS BIGINT) AS nsq FROM bn),
    bassign AS (
      SELECT batch_id, cid AS list_id FROM (
        SELECT b.batch_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY b.batch_id
                 ORDER BY CAST(CAST(list_dot_product(b.qe, c.cqe) AS BIGINT)
                               AS DOUBLE)
                          / sqrt(CAST(b.nsq * c.ccn AS DOUBLE)) DESC, c.cid
               ) AS crank
        FROM bq b CROSS JOIN cents c
      ) WHERE crank = 1
    ),
    hits AS (
      SELECT DISTINCT a.batch_id
      FROM bassign a
      JOIN mv ON mv.list_id = a.list_id
      JOIN bq ON bq.batch_id = a.batch_id
      WHERE CAST(CAST(list_dot_product(bq.qe, mv.qe) AS BIGINT) AS DOUBLE)
            / sqrt(CAST(bq.nsq * mv.nsq AS DOUBLE)) >= {NEARDUP_THRESHOLD}
    )
    SELECT a.batch_id, a.list_id,
           CAST(CASE WHEN h.batch_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS kept
    FROM bassign a LEFT JOIN hits h USING (batch_id)
    ORDER BY a.batch_id
    """,
)
def q178_semdedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0] or 0
    offset = max(200_000, 2 * (max_id + 1))
    zeros8 = F.array(*[F.lit(0.0).cast("float")] * 8)
    zeros32 = F.array(*[F.lit(0.0).cast("float")] * 32)
    near = emb.where(F.col("vec_id") % 20 == 1).select(
        (F.col("vec_id") + offset).alias("batch_id"),
        F.concat(F.slice("embedding", 1, 56), zeros8).alias("embedding"),
    )
    far = emb.where(F.col("vec_id") % 20 == 11).select(
        (F.col("vec_id") + offset).alias("batch_id"),
        F.concat(zeros32, F.slice("embedding", 33, 32)).alias("embedding"),
    )
    batch = near.unionByName(far)

    assigned, bc = _semdedup_base_assigned(spark, sf_dir)
    members = assigned.select(
        F.col("qe").alias("me"), F.col("nsq").alias("mn"), "list_id"
    )
    bq = S.with_quantized(batch, "embedding", "batch_id")
    bassign = S.ivf_probes(bq, bc, 1, "batch_id").select(
        "batch_id", "qe", "nsq", "list_id"
    )
    hits = (
        bassign.join(members, "list_id")
        .withColumn("dot", S.dot_long(F.col("qe"), F.col("me")))
        .withColumn(
            "cos_sim", S.cosine_from_ints(F.col("dot"), F.col("nsq"), F.col("mn"))
        )
        .where(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        .select("batch_id")
        .distinct()
        .withColumn("is_hit", F.lit(1))
    )
    return (
        bassign.select("batch_id", "list_id")
        .join(hits, "batch_id", "left")
        .select(
            "batch_id",
            "list_id",
            F.when(F.col("is_hit").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("kept"),
        )
        .orderBy("batch_id")
    )


# ---------------------------------------------------------------------------
# q184 — the IVF members table under the differential gate: the last
# member of the persisted-bucketed family (bands/tokens/winnow/simhash
# landed in q179/q180/q182/q183) to get a write->read driver row. The
# members table (neighbor_id, quantized embedding, squared norm,
# list_id) is written bucketed by list_id; the probe join reads it
# back with the members side Exchange-free and unprobed buckets
# prunable at scan time (tests/test_bucketing.py asserts both). The
# centroid matrix is re-derived from the corpus at probe time — the
# derivation is deterministic, so it is byte-identical to the matrix
# that assigned the members (in production both are artifacts of the
# same ingest job). Oracle shared by reference with q42.
# ---------------------------------------------------------------------------
@query("q184_persisted_ivf_topk", oracle=None)
def q184_persisted_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import _persisted_table

    corpus = load_table(spark, sf_dir, "embeddings")
    cq = S.with_quantized(corpus, "embedding", "vec_id")
    bc = spark.sparkContext.broadcast(S.ivf_centroid_matrix(cq, "vec_id"))
    table = _persisted_table(
        spark,
        sf_dir,
        "ivf",
        lambda t: S.write_members_bucketed(S.ivf_members(cq, bc, "vec_id"), t),
    )
    out = S.ivf_topk_from_members(
        spark.table(table), _queries_df(spark, sf_dir), bc, k=3, nprobe=2
    )
    return out.withColumnRenamed("rank", "knn_rank")


from .registry import ORACLE as _ORACLE  # noqa: E402

_ORACLE["q184_persisted_ivf_topk"] = _ORACLE["q42_ann_ivf_topk"]
