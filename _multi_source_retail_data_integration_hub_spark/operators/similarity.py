"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (the 100 TB scale path).

Numeric determinism: float embeddings are quantized to integers
(``floor(x * 1000)`` — floor, not round, so there are no tie-break
semantics to match across engines). Dot products and squared norms are
then *exact* 64-bit integer arithmetic (|q| <= ~3000, 64 dims =>
dot <= ~5.9e8, norm product <= ~3.5e14 < 2^53, so even a DOUBLE carries
them exactly). Cosine = dot / sqrt(na*nb) is one deterministic IEEE
division — Spark, numpy, and the DuckDB oracle agree bit-for-bit.

Physical strategy:
- norms/dots: in-JVM higher-order array folds (``dot_long`` /
  ``sq_norm_long``) — interpreted, not codegen'd, but measured ~4x
  faster than the Arrow pandas-UDF twin they replaced in r13 (the UDF
  paid array serialization both ways), and they keep the plan free of
  ArrowEvalPython nodes.
- brute-force top-k: ``mapInPandas`` over corpus partitions with the
  small query matrix shipped to executors; each partition computes an
  int64 matmul and keeps only its local top-k per query, so the global
  shuffle carries k rows per (query, partition) instead of the full
  |corpus| x |queries| similarity matrix. This is exactly the shape
  that survives a 1000-executor scale-up.
- LSH: bucket assignment via the same vectorized projections; candidate
  generation is an equi-join on (band, bucket) — never all-pairs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

QUANT = 1000
N_PLANES = 8


def quantized(emb: Column) -> Column:
    """float array -> exact bigint array (floor(x*1000))."""
    return F.transform(emb, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def dot_long(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two bigint arrays, entirely in-JVM
    higher-order functions — every pairwise re-rank site uses this.

    r13 (guide §4.1): this REPLACED an Arrow pandas-UDF twin
    (dot_long_vec). The UDF paid array serialization both ways per
    batch; the native fold stays inside the JVM and measured ~4x
    faster at every volume tried (2e3..2e5 rows), value-identical.
    The UDF's fail-loud contract is kept: a dimension mismatch between
    the two corpora must error, never silently dot a common prefix and
    rank garbage against full-length norms (zip_with alone would pad
    the shorter side with NULLs and yield a silent NULL dot)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(a) == F.size(b), dot).otherwise(
        F.raise_error(
            F.concat(
                F.lit("embedding dimension mismatch: "),
                F.size(a).cast("string"),
                F.lit(" vs "),
                F.size(b).cast("string"),
            )
        )
    )


def sq_norm_long(arr: Column) -> Column:
    """Exact int64 squared norm of a bigint array — the self-dot
    special case of ``dot_long`` without the zip (same formula q73's
    sq_norm_q column pins against the DuckDB oracle)."""
    return F.aggregate(
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )


def cosine_from_ints(dot: Column, na: Column, nb: Column) -> Column:
    """cosine given exact int dot + squared norms; one IEEE division."""
    return dot.cast("double") / F.sqrt((na * nb).cast("double"))


def with_quantized(df: DataFrame, emb_col: str, id_col: str) -> DataFrame:
    """id, qe (quantized embedding), nsq (exact squared norm).

    Pure per-row JVM map work (r13): nsq was an Arrow pandas-UDF pass
    (one ArrowEvalPython node per call site, corpus-sized row traffic
    through the Python worker) for a value the native fold computes
    in-plan, exactly."""
    q = quantized(F.col(emb_col))
    return df.select(F.col(id_col), q.alias("qe")).withColumn(
        "nsq", sq_norm_long(F.col("qe"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query set is collected to the driver (it is the small side by
    contract — "embed the incoming batch, search the corpus") and
    shipped inside the ``mapInPandas`` closure; the corpus streams
    through map tasks with NO shuffle of embeddings. Each partition
    emits only its local top-k per query (selected by the same
    (cos desc, id asc) order as the final ranking), then a tiny global
    window takes the true top-k of <= k * n_partitions candidates.
    """
    # collect only (id, qe) and derive the query norms in numpy on the
    # driver (r13, guide §4): the nsq pandas-UDF column cost one
    # ArrowEvalPython round-trip over the query set for a value one
    # exact int64 matmul reproduces from qe. Same math, same values.
    q = queries.select(
        F.col(id_col), quantized(F.col(emb_col)).alias("qe")
    ).collect()
    if not q:
        raise ValueError("empty query set")
    q_ids = np.array([r[0] for r in q], dtype=np.int64)
    Qm = np.stack([np.asarray(r["qe"], dtype=np.int64) for r in q])  # (nq, dim)
    q_norms = (Qm * Qm).sum(axis=1)

    out_schema = "query_id long, neighbor_id long, dot long, cn long, qn long"

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["qe"].to_numpy()).astype(np.int64, copy=False)  # (nc, dim)
            c_ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            c_norms = (C * C).sum(axis=1)
            dots = C @ Qm.T  # (nc, nq) exact int64
            cos = dots / np.sqrt((c_norms[:, None] * q_norms[None, :]).astype(np.float64))
            rows = []
            for j in range(len(q_ids)):
                mask = c_ids != q_ids[j]
                idx = np.nonzero(mask)[0]
                if idx.size == 0:
                    continue
                # order by (cos desc, neighbor_id asc); lexsort last key primary
                order = np.lexsort((c_ids[idx], -cos[idx, j]))[:k]
                sel = idx[order]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": c_ids[sel],
                            "dot": dots[sel, j],
                            "cn": c_norms[sel],
                            "qn": q_norms[j],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    # pass ONLY (id, qe) into the opaque mapInPandas (r13, guide §4.1/
    # §2.3: Spark cannot see which columns the function touches, so
    # every input column is computed and shipped). The previous
    # with_quantized input also carried nsq — a full ArrowEvalPython
    # pass over the corpus whose value local_topk recomputes as
    # c_norms anyway. One Python crossing per corpus row, not two.
    candidates = corpus.select(
        F.col(id_col), quantized(F.col(emb_col)).alias("qe")
    ).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        candidates.withColumn(
            "cos_sim", cosine_from_ints(F.col("dot"), F.col("qn"), F.col("cn"))
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization — the other classic ANN scale
# path next to LSH. Coarse centroids are a deterministic corpus sample
# (vec_id % C_STRIDE == CENTROID_RESIDUE, ~n/31 lists ≈ sqrt-ish nlist at
# test scales); every vector is assigned to its nearest centroid by
# cosine (exact int dot + one IEEE division, so Spark and the DuckDB
# oracle agree bit-for-bit); a query probes its ``nprobe`` nearest lists
# and exact-re-ranks only those lists' members. At 100 TB the members
# table is written bucketed by list_id, so probe joins touch only the
# probed buckets — cost scales with nprobe/nlist of the corpus, not all
# of it.
# --------------------------------------------------------------------------
C_STRIDE = 31  # minimum stride (test-scale nlist ~ n/31)
CENTROID_RESIDUE = 3
MAX_NLIST = 4096  # hard cap on centroid count, independent of corpus size


def ivf_stride(n_rows: int) -> int:
    """Sampling stride that bounds nlist to ~MAX_NLIST at any corpus size.

    ``max(C_STRIDE, ceil(n / MAX_NLIST))``: at test scales this is the
    fixed C_STRIDE (stable small-SF results); at 100 TB the stride grows
    linearly with the corpus so the centroid sample stays <= ~MAX_NLIST
    rows — the driver collect and the per-executor broadcast matrix are
    O(MAX_NLIST * dim), never O(corpus). The SQL oracle mirrors the same
    formula with a scalar subquery over COUNT(*).
    """
    return max(C_STRIDE, -(-n_rows // MAX_NLIST))


def ivf_centroid_matrix(corpus_qn: DataFrame, id_col: str):
    """Collect the deterministic centroid sample as numpy matrices.

    ``corpus_qn`` is ``with_quantized`` output (id, qe, nsq). The
    centroid set is bounded by ``ivf_stride`` (<= ~MAX_NLIST rows), so
    the collect is a broadcast-dim-sized transfer at any corpus size.

    Two actions run here (stride count + centroid collect), and
    NEITHER touches the full quantized corpus (r13, guide §5/§6): the
    count prunes every computed column away (count(1) over the
    underlying scan), and the collect pushes the ``id % stride``
    predicate below the quantization projection, so only ~1/stride of
    rows ever compute qe/nsq. The previous form persisted the ENTIRE
    quantized corpus for the duration of the two actions — a
    corpus-sized cache at 100 TB bought nothing the pruned actions
    don't get for free.
    """
    stride = ivf_stride(corpus_qn.count())
    rows = corpus_qn.where((F.col(id_col) % stride) == CENTROID_RESIDUE).collect()
    if not rows:
        raise ValueError("no IVF centroids (corpus too small for C_STRIDE)")
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    Cm = np.stack([np.asarray(r["qe"], dtype=np.int64) for r in rows])
    cn = np.array([r["nsq"] for r in rows], dtype=np.int64)
    return cids, Cm, cn


def ivf_probes(
    qn_df: DataFrame, cents, nprobe: int, id_col: str = "vec_id"
) -> DataFrame:
    """(id, qe, nsq, list_id, probe_rank<=nprobe): nearest coarse lists.

    One local matmul per Arrow batch against the centroid matrix, which
    is shipped via ``SparkContext.broadcast`` (one torrent transfer per
    executor, not a copy in every task closure); no shuffle, no per-pair
    row explosion. ``cents`` may be the raw matrix tuple or an existing
    ``Broadcast`` of one — callers building several probe stages (e.g.
    ivf_topk's members + probes) broadcast once and pass the handle.
    Ordering is (cos desc, centroid_id asc) — the same ranking the SQL
    oracle's ROW_NUMBER expresses.
    """
    from pyspark.broadcast import Broadcast

    if isinstance(cents, Broadcast):
        bc = cents
        n_take = min(nprobe, len(bc.value[0]))
    else:
        bc = qn_df.sparkSession.sparkContext.broadcast(cents)
        n_take = min(nprobe, len(cents[0]))
    out_schema = f"{id_col} long, qe array<bigint>, nsq long, list_id long, probe_rank int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, Cm, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["qe"].to_numpy()).astype(np.int64, copy=False)
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            vn = pdf["nsq"].to_numpy(dtype=np.int64)
            dots = V @ Cm.T  # (nv, nlist) exact int64
            cos = dots / np.sqrt((vn[:, None] * cn[None, :]).astype(np.float64))
            take = np.empty((len(vids), n_take), dtype=np.int64)
            for i in range(len(vids)):
                take[i] = cids[np.lexsort((cids, -cos[i]))[:n_take]]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(vids, n_take),
                    "qe": [e for e in pdf["qe"].to_numpy() for _ in range(n_take)],
                    "nsq": np.repeat(vn, n_take),
                    "list_id": take.ravel(),
                    "probe_rank": np.tile(np.arange(1, n_take + 1, dtype=np.int32), len(vids)),
                }
            )

    return qn_df.mapInPandas(assign, out_schema)


def ivf_assign(
    corpus: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Assign every corpus vector to its IVF list: (id, list_id)."""
    cq = with_quantized(corpus, emb_col, id_col)
    cents = ivf_centroid_matrix(cq, id_col)
    return ivf_probes(cq, cents, 1, id_col).select(id_col, "list_id")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF: probe ``nprobe`` lists, exact re-rank members.

    Each (query, member) candidate pair occurs at most once — members
    belong to exactly one list and a query's probed lists are distinct —
    so no dedup step is needed before ranking. Recall < 1 by design;
    nprobe = nlist recovers exact brute force.
    """
    cq = with_quantized(corpus, emb_col, id_col)
    cents = ivf_centroid_matrix(cq, id_col)
    # one broadcast shared by the member-assignment and probe stages
    bc = corpus.sparkSession.sparkContext.broadcast(cents)
    members = ivf_members(cq, bc, id_col)
    return ivf_topk_from_members(members, queries, bc, k, nprobe, id_col, emb_col)


def ivf_members(cq: DataFrame, cents_bc, id_col: str = "vec_id") -> DataFrame:
    """The IVF members table ``(neighbor_id, ce, cn, list_id)`` — each
    corpus vector assigned to its nearest centroid, quantized embedding
    and squared norm carried so probe-time re-ranking never joins back
    to the corpus. This is the frame ``write_members_bucketed``
    persists at ingest in the 100 TB layout."""
    return ivf_probes(cq, cents_bc, 1, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qe").alias("ce"),
        F.col("nsq").alias("cn"),
        "list_id",
    )


def ivf_topk_from_members(
    members: DataFrame,
    queries: DataFrame,
    cents_bc,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Probe/re-rank stage against an already-built members table —
    the persisted-table twin of ``ivf_topk`` (a thin wrapper over
    this). ``cents_bc`` must broadcast the SAME centroid matrix that
    assigned the members (in production both are written by the same
    ingest job; centroid derivation is deterministic, so recomputing
    from the corpus yields the identical matrix)."""
    probes = ivf_probes(
        with_quantized(queries, emb_col, id_col), cents_bc, nprobe, id_col
    ).select(
        F.col(id_col).alias("query_id"), "qe", F.col("nsq").alias("qn"), "list_id"
    )
    sims = (
        probes.join(members, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", dot_long(F.col("qe"), F.col("ce")))
        .withColumn("cos_sim", cosine_from_ints(F.col("dot"), F.col("qn"), F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "list_id", "cos_sim")
    )


def write_members_bucketed(
    members: DataFrame, table: str, n_buckets: int = 8, sort_cols: tuple[str, ...] = ("list_id",)
) -> None:
    """Persist an IVF members table bucketed (and sorted) by list_id.

    This is the physical layout the IVF docstring promises at 100 TB:
    probe joins against a bucketed members table need no Exchange on the
    members side (bucket count = join partitioning), and a filter on
    probed list_ids prunes unprobed buckets at scan time
    (SelectedBucketsCount in the plan). tests/test_bucketing.py asserts
    both plan properties.
    """
    (
        members.write.mode("overwrite")
        .bucketBy(n_buckets, "list_id")
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def hyperplane_weights(n_planes: int = N_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes in [-8, 7].

    Weight (p, i) = first hex digit of md5("p:i") - 8. Pure data —
    identical constants are inlined into the SQL oracle.
    """
    return [
        [int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) - 8 for i in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket(qe: Column, planes: list[list[int]]) -> Column:
    """Signed-projection bucket id in [0, 2^n_planes), as ONE
    Arrow-vectorized call: the whole (batch x dim) @ (dim x n_planes)
    projection plus sign-packing happens in a single numpy matmul —
    not one dot-UDF per plane, which costs n_planes Arrow round trips
    per batch (round 3 measured ~3x on the bucket-join queries).

    The hyperplane constants are sliced to the vector's dimension — an
    EXPLICIT projection onto the leading dims for smaller embeddings.
    Embeddings WIDER than the hyperplanes raise with a message naming
    the limit (instead of a generic dimension error downstream).

    The UDF is marked non-deterministic (r13, guide §4.4) although its
    math is fully deterministic: every consumer equi-joins on the
    bucket column, Catalyst infers ``isnotnull(bucket)`` from the join
    and pushes it below the projection, and the push DUPLICATES the
    UDF — the q28/q37-family plans carried two ArrowEvalPython nodes
    per side (one feeding only the pushed null-filter, one recomputed
    for the real column), i.e. every corpus row crossed the Python
    boundary twice per bucketing. The flag forbids the copy; the
    null-filter simply runs above the single evaluation — identical
    rows, identical results, half the Python crossings."""
    P = np.array(planes, dtype=np.int64)
    weights = 1 << np.arange(P.shape[0], dtype=np.int64)

    def _dim_check(d: int) -> None:
        if d > P.shape[1]:
            raise ValueError(
                f"lsh_bucket: embedding dim {d} exceeds the "
                f"{P.shape[1]}-dim hyperplane constants; pass "
                f"planes=hyperplane_weights(dim=<embedding dim>)"
            )

    def _bucket_impl(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        vals = col.to_numpy()
        lens = np.fromiter(
            (-1 if v is None else len(v) for v in vals), np.int64, len(vals)
        )
        lmin, lmax = lens.min(), lens.max()
        if lmin == lmax and lmin >= 0:
            # fast path — the dominant case (uniform dims, no NULLs):
            # one stack + one matmul, plain int64 out, no fancy indexing
            _dim_check(int(lmin))
            Q = np.stack(vals).astype(np.int64, copy=False)
            dots = Q @ P[:, : Q.shape[1]].T  # exact int64
            return pd.Series(((dots >= 0).astype(np.int64) * weights).sum(axis=1))
        # slow path: NULLs -> NULL bucket, one matmul per distinct dim —
        # mixed-width batches (and NULLs) must not crash np.stack (the
        # old Column form handled both)
        out = pd.array([None] * len(col), dtype="Int64")
        for d in np.unique(lens[lens >= 0]):
            _dim_check(int(d))
            idx = np.nonzero(lens == d)[0]
            Q = np.stack(vals[idx]).astype(np.int64, copy=False)
            dots = Q @ P[:, : int(d)].T
            out[idx] = ((dots >= 0).astype(np.int64) * weights).sum(axis=1)
        return pd.Series(out)

    return pandas_udf(_bucket_impl, "bigint").asNondeterministic()(qe)


def lsh_buckets(
    df: DataFrame, emb_col: str, id_col: str, planes: list[list[int]] | None = None
) -> DataFrame:
    planes = planes or hyperplane_weights()
    q = with_quantized(df, emb_col, id_col)
    return q.select(
        F.col(id_col), F.col("qe"), F.col("nsq"), lsh_bucket(F.col("qe"), planes).alias("bucket")
    )


#: default hot-bucket cap for the embedding-LSH within-bucket pair
#: join (the q37/q53/q158/q164 candidate stage). The 8-plane bucket
#: space is FIXED at 256 buckets, so without a cap the within-bucket
#: pair count grows quadratically with the corpus and one hot bucket
#: becomes a single m² join task — exactly the failure the round-11
#: x64 rehearsal produced (executor heap OOM on the hot-bucket tasks).
#: Sized like text.LSH_MAX_BUCKET_SIZE: far above any bucket at the
#: test SFs (sf0.1 max augmented bucket = 48), so registered results
#: are byte-identical there; the registered oracles replay the SAME
#: cap so the differential gate stays aligned on corpora where it
#: does engage.
EMB_LSH_MAX_BUCKET = 1000


def subsplit_hot_buckets(
    bucketed: DataFrame,
    id_col: str = "vec_id",
    bucket_col: str = "bucket",
    max_bucket_size: int | None = EMB_LSH_MAX_BUCKET,
) -> DataFrame:
    """Salt members of oversized LSH buckets into ``ceil(size / cap)``
    deterministic groups (md5 of ``'0:' || id`` — the same engine-
    portable seeded-md5 family as text.lsh_candidate_pairs's subsplit
    mode), appending a ``salt`` column to join on alongside the
    bucket. A size-m bucket's pair cost falls from m² to ~m * cap
    (linear in m), at the price of sampling ~1/groups of its pairs —
    the embedding twin of the MinHash hot-bucket guard, with the same
    rationale: hot embedding-LSH buckets are dense regions that DO
    hold real near-dups, so partial recall (subsplit) beats none
    (drop). ``max_bucket_size=None`` disables the guard (salt 0 for
    every row — audits that must see the uncapped universe). The salt
    formula is operators/text.py::subsplit_salt — the ONE Spark-side
    source both subsplit guards share and every subsplit oracle
    replays.
    """
    if max_bucket_size is None:
        return bucketed.withColumn("salt", F.lit(0).cast("bigint"))
    from .text import subsplit_salt  # noqa: PLC0415 — sibling operator module

    counts = bucketed.groupBy(bucket_col).agg(F.count("*").alias("bucket_size"))
    # LEFT join + coalesce: NULL-bucket rows (NULL embeddings) never
    # equi-join to their count group, but they must survive the guard
    # exactly as they survive the cap-None path — the two paths expose
    # the same row universe to any row-wise consumer (pair joins are
    # unaffected either way: a NULL bucket never equi-joins).
    n_groups = F.greatest(
        F.lit(1),
        F.ceil(F.coalesce(F.col("bucket_size"), F.lit(1)) / F.lit(max_bucket_size)),
    ).cast("bigint")
    return (
        bucketed.join(counts, bucket_col, "left")
        .withColumn("salt", subsplit_salt(F.col(id_col), n_groups))
        .drop("bucket_size")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket, exact re-rank within.

    Recall < 1 by design (the scale/accuracy trade); the equi-join on
    bucket replaces the all-pairs comparison, so cost is
    sum(bucket_size * queries_in_bucket). The re-rank dot products run
    as in-JVM array folds on candidate pairs only.
    """
    c = lsh_buckets(corpus, emb_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qe").alias("ce"), F.col("nsq").alias("cn"), "bucket"
    )
    q = lsh_buckets(queries, emb_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qe"), F.col("nsq").alias("qn"), "bucket"
    )
    sims = (
        c.join(q, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", dot_long(F.col("qe"), F.col("ce")))
        .withColumn("cos_sim", cosine_from_ints(F.col("dot"), F.col("qn"), F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "bucket", "cos_sim")
    )


def scalar_quantize(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector scalar (min/max) quantization: float32 -> ``bits``-bit
    codes, the standard 4x-32x storage/IO reduction for embedding
    corpora (a 100 TB float32 embedding store becomes 25 TB at 8 bits
    before touching recall-sensitive machinery like PQ).

    Returns ``id_col, dv (double array), mn, scale, codes (int array)``.
    Codes are ``floor((x - mn)/scale + 0.5)`` — written as floor(+0.5)
    rather than round() so Spark and any oracle share one rounding
    definition with no half-even/half-up ambiguity. A constant vector
    (scale == 0) maps to all-zero codes. Everything is per-row map work
    (JVM higher-order functions): no shuffle, embarrassingly parallel,
    and the reconstruction error is bounded by scale/2 by construction
    — audited, not assumed, by q105.
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    levels = float((1 << bits) - 1)
    dv = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    out = df.where(F.col(emb_col).isNotNull()).select(
        F.col(id_col), dv.alias("dv")
    )
    mn = F.array_min(F.col("dv"))
    scale = (F.array_max(F.col("dv")) - mn) / F.lit(levels)
    out = out.withColumn("mn", mn).withColumn("scale", scale)
    codes = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col("dv"), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            F.col("dv"),
            lambda x: F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5)),
        )
    )
    return out.withColumn("codes", codes)


def dequantize_error(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Reconstruction-error columns for a ``scalar_quantize`` frame:
    per-element ``|x - (mn + code*scale)|``, reduced with order-
    independent max (never a float sum, per the registry's determinism
    convention) plus the in-plan accuracy contract
    ``max_abs_err <= scale/2 + 1e-12``."""
    errs = F.zip_with(
        F.col("dv"),
        F.col("codes"),
        lambda x, c: F.abs(x - (F.col("mn") + c.cast("double") * F.col("scale"))),
    )
    return (
        df.withColumn("errs", errs)
        .select(
            id_col,
            F.size(F.col("dv")).alias("n_dims"),
            F.col("scale"),
            F.size(F.array_distinct(F.col("codes"))).alias("n_distinct_codes"),
            F.array_max(F.col("errs")).alias("max_abs_err"),
            (F.array_max(F.col("errs")) <= F.col("scale") / 2 + F.lit(1e-12)).alias(
                "within_bound"
            ),
        )
    )


def semdedup(
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup.

    Assign every vector to its IVF coarse cluster, exact-verify cosine
    ONLY within clusters, and drop any vector with a lower-id
    cluster-mate at/above ``threshold``. The drop rule is PAIRWISE,
    not transitive-group: a vector survives unless some lower-id mate
    is directly similar to it, and a dropped vector still acts as a
    dropper. For mates where 1~3 and 2~3 are similar but 1~2 is not,
    this keeps {1, 2} where connected-component semantics would keep
    only {1} — deliberately NOT the paper's one-representative-per-
    duplicate-group scheme (the paper keeps the vector farthest from
    the centroid within each group); the pairwise rule replays
    exactly in SQL and needs no iterative closure. Returns
    (id, list_id, kept 0/1) for every input vector.

    ``assigned`` short-circuits the assignment stage with a
    pre-materialized (id, qe, nsq, list_id) frame — production keeps
    that table persisted bucketed by list_id (write_members_bucketed),
    making the verify self-join exchange-free. When built here it is
    localCheckpointed once: three sub-plans read it, and the quadratic
    stage must never recompute the Arrow assignment pass.

    Scale: sum(cluster_size^2) work bounded by nlist sizing (stride
    keeps nlist <= ~MAX_NLIST; real deployments size nlist ~ sqrt(n)
    so clusters stay ~sqrt(n)); everything else is one Arrow matmul
    pass plus id-keyed equi-joins.
    """
    from .checkpointing import materialize

    if assigned is None:
        if corpus is None:
            raise ValueError("semdedup needs a corpus or an assigned frame")
        cq = with_quantized(corpus, emb_col, id_col)
        cents = ivf_centroid_matrix(cq, id_col)
        assigned = materialize(ivf_probes(cq, cents, 1, id_col))
    a_side = assigned.select(
        F.col(id_col).alias("id_a"), F.col("qe").alias("qa"),
        F.col("nsq").alias("na"), "list_id",
    )
    b_side = assigned.select(
        F.col(id_col).alias("id_b"), F.col("qe").alias("qb"),
        F.col("nsq").alias("nb"), "list_id",
    )
    dropped = (
        a_side.join(b_side, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", dot_long(F.col("qa"), F.col("qb")))
        .withColumn(
            "cos_sim", cosine_from_ints(F.col("dot"), F.col("na"), F.col("nb"))
        )
        .where(F.col("cos_sim") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        assigned.select(id_col, "list_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "list_id",
            F.when(F.col("is_dropped").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("kept"),
        )
    )
