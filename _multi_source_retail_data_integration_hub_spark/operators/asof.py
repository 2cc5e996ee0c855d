"""Distributed as-of (temporal nearest-predecessor) join.

Spark has no native as-of join. The classic distributed construction
used here: tag both sides, union, hash-partition by the equality key,
sort within partition by (time, side-tag), and carry the right side's
columns forward with ``last_value(..., ignoreNulls=True)`` — every left
row then holds the most recent right row at-or-before its timestamp.

Cost: ONE shuffle of |L| + |R| rows on the by-key (the same price as a
plain equi-join), no range-explosion, no per-group pandas. This is the
shape that survives 100 TB: both sides partition by the key; skewed
keys can additionally be salted upstream.

Semantics (== DuckDB ``ASOF LEFT JOIN ... ON l.by = r.by AND
l.ts >= r.ts``):
- backward direction, exact matches allowed (right.ts == left.ts wins);
- if several right rows share the winning timestamp the one with the
  greatest tie-break column wins (callers should pre-aggregate the
  right side to one row per (by, ts) for fully defined results);
- left rows with no predecessor get NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left.``on`` within the same ``by`` group.

    ``value_cols``: right-side columns to carry (default: all except
    ``on``/``by``). The right ``on`` itself is always carried as
    ``{on}{suffix}``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    carried = [f"{on}{suffix}", *[f"{c}{suffix}" for c in value_cols]]

    l_tag = left.withColumn("_side", F.lit(1))
    for src, dst in zip([on, *value_cols], carried):
        l_tag = l_tag.withColumn(dst, F.lit(None).cast(dict(right.dtypes)[src]))

    r_tag = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(carried[0]),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    # align schemas: right rows carry NULL for left-only columns
    left_only = [c for c in l_tag.columns if c not in r_tag.columns]
    for c in left_only:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    unioned = r_tag.select(*l_tag.columns).unionByName(l_tag)

    # Right rows sort BEFORE left rows at equal ts (_side 0 < 1), so an
    # exact-timestamp right row is visible to the same-timestamp left row.
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in l_tag.columns if c not in carried and c != "_side"],
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
