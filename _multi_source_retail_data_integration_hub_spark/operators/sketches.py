"""Count-min sketch: sublinear-memory frequency estimation for
heavy-hitter (top-k frequent item) surfaces at corpus scale.

Reference analogue: the retail dashboards' top-k surfaces
(/root/reference/streamlit_app.py:1787, sql/analytical_queries.sql:107)
compute exact top products/categories — fine at warehouse scale, but a
top-k over 100 TB of token/shingle occurrences cannot afford an exact
(item -> count) table per ad-hoc slice. A count-min sketch compresses
the frequency table to ``depth x width`` counters (here 4 x 1024 =
4 Ki cells regardless of vocabulary size) at the cost of a bounded
OVERestimate: estimate >= true count always (each counter only ever
adds colliding items), and estimate <= true + eps*N with probability
1 - (1/2)^depth, where eps = e/width and N = total occurrences
(Cormode & Muthukrishnan 2005).

Spark-first construction — the sketch IS a DataFrame:

- ``cms_counters``: one row per (row_id, bucket) cell. Each distinct
  item is hashed ``depth`` ways (melt-explode, the exact shape of
  ``lsh_candidate_pairs``'s band melt) and its weight summed into the
  cell — ONE partial-aggregating shuffle of at most depth*width rows
  out per partition. Hash family: md5("cms<i>:" || item), the same
  seeded-md5 trick as MinHash, so every value is reproducible in any
  engine with md5 (the DuckDB oracle recomputes the sketch
  bit-for-bit; contrast approx_count_distinct whose HLL is
  engine-internal).
- ``cms_estimates``: point queries as a JOIN — melt the queried items
  the same ``depth`` ways, equi-join the counter table on
  (row_id, bucket), take MIN over the item's depth cells. The counter
  table is at most depth*width rows by construction, so Catalyst
  broadcasts it and the probe never shuffles the query side.

At 100 TB the counter table is mergeable state: shards sketch their
partition of the corpus independently and the cell-wise SUM of shards
equals the sketch of the union — the groupBy already expresses that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(item: Column, row_id: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of ``item`` in hash row ``row_id``: the md5 family member
    md5('cms<row_id>:' || item), first 32 bits, mod width."""
    h = F.md5(F.concat(F.lit(f"cms{row_id}:"), item))
    return F.pmod(
        F.conv(h.substr(1, 8), 16, 10).cast("bigint"), F.lit(width)
    ).alias("bucket")


def _melt(df: DataFrame, item_col: str, depth: int, width: int) -> DataFrame:
    """One row per (item row, hash row): item, __cms_row_id, __cms_bucket.

    Working columns are double-underscore-prefixed so an input frame
    that legitimately carries ``row_id``/``bucket`` columns (the public
    names of the counter table) cannot collide with them.
    """
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        cms_bucket(F.col(item_col), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__cms_rb"),
    ).select(
        "*",
        F.col("__cms_rb.r").alias("__cms_row_id"),
        F.col("__cms_rb.b").alias("__cms_bucket"),
    ).drop("__cms_rb")


def cms_counters(
    items: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (row_id, bucket, counter), <= depth*width rows.

    ``items`` is one row per item occurrence (weight 1), or pass
    ``weight_col`` for pre-aggregated (item, count) input — inserting
    an item with weight w is identical to inserting it w times.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    melted = _melt(items.select(item_col, *( [weight_col] if weight_col else [] )),
                   item_col, depth, width)
    return (
        melted.groupBy(
            F.col("__cms_row_id").alias("row_id"),
            F.col("__cms_bucket").alias("bucket"),
        )
        .agg(F.sum(w).cast("bigint").alias("counter"))
    )


def cms_estimates(
    queries: DataFrame,
    item_col: str,
    counters: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: input rows + ``cms_count`` column.

    MIN over the item's ``depth`` cells. Inner join is safe for items
    that were inserted (their cells exist); items never inserted would
    estimate >= 0 from whatever shares their cells — standard CMS
    semantics — but naturally only inserted items are audited here.
    """
    melted = _melt(queries, item_col, depth, width)
    others = [c for c in queries.columns if c != item_col]
    cells = counters.select(
        F.col("row_id").alias("__cms_row_id"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("counter").alias("__cms_counter"),
    )
    return (
        melted.join(F.broadcast(cells), ["__cms_row_id", "__cms_bucket"])
        .groupBy(item_col, *others)
        .agg(F.min("__cms_counter").alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# Bloom filter: sublinear-memory SET MEMBERSHIP, the third member of
# the deterministic-sketch family (count-min = frequency, bloom =
# membership). Use case at 100 TB: "is this incoming document's
# fingerprint already in the N-billion-row historical corpus?" — an
# exact semi-join must shuffle the probe side against the full
# historical fingerprint table; the bloom compresses the historical
# set to BF_BITS bits (a few KB, broadcastable to every executor) at
# the cost of a bounded false-POSITIVE rate. False negatives are
# impossible (the theorem: every inserted item set all k of its bits),
# so "bloom says no" safely skips the expensive exact check and
# "bloom says maybe" falls through to it on a tiny fraction of rows.
#
# Same seeded-md5 construction as the CMS above: every bit index is
# md5('bf<i>:' || item) — fully deterministic, so the DuckDB oracle
# rebuilds the filter word-for-word and the probe verdicts themselves
# are value-hash-compared (contrast engine-internal bloom builders
# whose bit layout is opaque).
#
# Layout: BF_BITS bits packed into 32-bit masks stored in BIGINT words
# (32, not 64, so the set-bit shift never touches the sign bit and the
# mask arithmetic is portable across engines). The words table is at
# most BF_BITS/32 rows by construction — broadcast at any corpus size.
# Build is one partial-aggregating shuffle of <= BF_BITS/32 rows out
# per partition (bit_or partials combine map-side, and the cell-wise
# OR of per-shard filters equals the filter of the union — mergeable
# state, same as the CMS).
# ---------------------------------------------------------------------------
BF_BITS = 16_384
BF_HASHES = 4
BF_WORD_BITS = 32


def bf_bit(item: Column, hash_id: int, bits: int = BF_BITS) -> Column:
    """Bit index of ``item`` under hash ``hash_id``: seeded-md5 family
    member md5('bf<hash_id>:' || item), first 32 bits, mod ``bits``."""
    h = F.md5(F.concat(F.lit(f"bf{hash_id}:"), item))
    return F.pmod(F.conv(h.substr(1, 8), 16, 10).cast("bigint"), F.lit(bits))


def _bf_melt(df: DataFrame, item_col: str, hashes: int, bits: int) -> DataFrame:
    """One row per (input row, hash): adds __bf_word_idx + __bf_mask.

    Working columns are double-underscore-prefixed so probe frames that
    legitimately carry ``word_idx``/``word``/``mask``/``bit`` columns
    cannot collide with them.
    """
    bit = F.explode(
        F.array(*[bf_bit(F.col(item_col), i, bits) for i in range(hashes)])
    ).alias("__bf_bit")
    return df.select("*", bit).select(
        "*",
        F.expr(f"__bf_bit div {BF_WORD_BITS}").alias("__bf_word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__bf_bit % {BF_WORD_BITS} AS INT))"
        ).alias("__bf_mask"),
    )


def bloom_words(
    items: DataFrame,
    item_col: str,
    hashes: int = BF_HASHES,
    bits: int = BF_BITS,
) -> DataFrame:
    """Build the filter: (word_idx, word), <= bits/32 rows.

    Words with no bits set are simply absent (probe treats a missing
    word as 0). Duplicate items are harmless — OR is idempotent.
    """
    melted = _bf_melt(items.select(item_col), item_col, hashes, bits)
    return melted.groupBy(
        F.col("__bf_word_idx").alias("word_idx")
    ).agg(F.bit_or("__bf_mask").alias("word"))


def bloom_probe(
    queries: DataFrame,
    item_col: str,
    words: DataFrame,
    hashes: int = BF_HASHES,
    bits: int = BF_BITS,
) -> DataFrame:
    """Probe: input rows + ``might_contain`` (1 = all k bits set).

    LEFT join against the broadcast words table — a word row that was
    never written means those 32 bits are all zero, which must read as
    a miss, not a dropped probe row. The probe side never shuffles:
    broadcast join + per-item min aggregation re-using the probe-side
    partitioning.
    """
    melted = _bf_melt(queries, item_col, hashes, bits)
    others = [c for c in queries.columns if c != item_col]
    wtab = words.select(
        F.col("word_idx").alias("__bf_word_idx"),
        F.col("word").alias("__bf_word"),
    )
    hit = (
        F.coalesce(F.col("__bf_word"), F.lit(0)).bitwiseAND(F.col("__bf_mask"))
        != 0
    ).cast("bigint")
    return (
        melted.join(F.broadcast(wtab), "__bf_word_idx", "left")
        .select(item_col, *others, hit.alias("__bf_hit"))
        .groupBy(item_col, *others)
        .agg(F.min("__bf_hit").alias("might_contain"))
    )
