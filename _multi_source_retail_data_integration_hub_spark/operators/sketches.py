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
    """One row per (item row, hash row): item, row_id, bucket."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        cms_bucket(F.col(item_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", "rb.row_id", "rb.bucket").drop("rb")


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
        melted.groupBy("row_id", "bucket")
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
    return (
        melted.join(F.broadcast(counters), ["row_id", "bucket"])
        .groupBy(item_col, *others)
        .agg(F.min("counter").alias("cms_count"))
    )
