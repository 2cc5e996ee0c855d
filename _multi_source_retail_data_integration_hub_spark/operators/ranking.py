"""Ranked top-k: the scalable idiom for "the k best rows with a dense
1..k rank column".

``row_number() OVER (ORDER BY ...)`` before a limit forces an Exchange
SinglePartition + global sort of the ENTIRE input — a one-task
straggler at corpus scale. The correct order is top-k FIRST
(TakeOrderedAndProject: parallel per-partition heaps, merged on the
driver side of the exchange), THEN the ranking window over the <= k
survivors, where the single partition is bounded by k. Shared by the
BM25 retrieval (q122) and PageRank (q123) result surfaces so the fix
can never drift per-site (round-7 review finding).

The ordering must be a TOTAL order (tie-broken to uniqueness) or the
assigned ranks — like any competition ranking — are not reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Return the top ``k`` rows of ``df`` under ``order_cols`` (a total
    order) with a BIGINT ``rank_col`` numbered 1..k, without ever
    sorting the full input on one task."""
    topk = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return (
        topk.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .orderBy(rank_col)
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """The per-group generalization: top ``k`` rows WITHIN each group
    under ``order_cols`` (a total order within the group), ranked 1..k.

    Unlike the global case, the partitioned window is already the
    scalable plan — one hash-partitioned exchange on ``group_cols``,
    then per-partition sorts that parallelize across groups; no
    SinglePartition anywhere. The rank filter is pushed into the
    window via WindowGroupLimit (Spark >= 3.5 inserts a per-partition
    top-k heap below the exchange when it sees rank <= k), so a
    billion-row group never fully sorts either. Feed this
    post-aggregate frames (entity-grain, not fact-grain) and the
    exchange stays proportional to entities.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .where(F.col(rank_col) <= k)
    )
