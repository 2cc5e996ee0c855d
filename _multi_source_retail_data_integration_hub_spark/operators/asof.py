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
- the nearest-predecessor right row is attached ATOMICALLY: all carried
  columns come from one right row (they travel as a single struct), so
  a NULL field in the winning row stays NULL rather than being
  back-filled from an older row;
- if several right rows share the winning timestamp, which one wins is
  unspecified (callers should pre-aggregate the right side to one row
  per (by, ts) for fully defined results);
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

    # The right row travels as ONE struct so the nearest predecessor is
    # attached atomically — last(ignorenulls) over per-column carries
    # would mix fields from different right rows when values are NULL.
    r_fields = [on, *value_cols]
    r_dt = dict(right.dtypes)
    # backquoted field names: column names with spaces/dots must survive
    # the DDL round-trip and the getField unpack below
    struct_ddl = "struct<" + ",".join(f"`{c}`:{r_dt[c]}" for c in r_fields) + ">"

    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_ddl)
    )
    r_tag = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        # backquoted references resolve names exactly (a bare "a.b"
        # string would parse as a nested-field path)
        F.struct(*[F.col(f"`{c}`") for c in r_fields]).alias("_r"),
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
        *[c for c in l_tag.columns if c not in ("_side", "_r")],
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    kept = filled.where(F.col("_side") == 1)
    return kept.select(
        *[c for c in kept.columns if c not in ("_side", "_r")],
        F.col("_r").getField(on).alias(f"{on}{suffix}"),
        *[F.col("_r").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
