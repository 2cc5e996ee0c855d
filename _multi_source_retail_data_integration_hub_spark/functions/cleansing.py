"""Cleansing / conforming column expressions (reference §2.2).

All native Column expressions — no UDFs — so Catalyst keeps predicate
pushdown and whole-stage codegen through every cleaning step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_column_names(df: DataFrame) -> DataFrame:
    """``strip().lower().replace(' ', '_')`` on every column name.

    Mirrors /root/reference/etl/transform.py:37-39,106-108 (P1)
    byte-for-byte: each space becomes one underscore (runs are NOT
    collapsed) and tabs/newlines are left alone, exactly like the
    reference's ``str.replace``.
    """
    return df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])


def std_text(col: Column | str) -> Column:
    """Trim + title-case a string column (P6).

    The reference uses pandas ``str.title()`` which upper-cases after
    every non-letter (``"men's clothing"`` -> ``"Men'S Clothing"``).
    We deliberately use ``initcap`` semantics (word = whitespace-
    delimited), documented deviation per SURVEY.md §7.4.1 — saner and
    SQL-portable.
    """
    return F.initcap(F.trim(col))


def pandas_title(col: Column | str) -> Column:
    """Byte-faithful pandas ``str.title()`` for parity testing: upper-case
    any letter that follows a non-letter (apostrophes included).

    Native-expression implementation: split on the boundary positions via
    regexp, then initcap each fragment. Used only in parity tests; the
    engine default is :func:`std_text`.
    """
    c = F.col(col) if isinstance(col, str) else col
    # 1. Hide original spaces behind a NUL placeholder, 2. insert a real
    # space after every non-letter run so initcap treats what follows as
    # a new word, 3. initcap, 4. drop the inserted spaces, 5. restore the
    # original spaces. Pure expression chain - stays in codegen.
    hidden = F.regexp_replace(c, " ", "\x00")
    marked = F.regexp_replace(hidden, r"([^A-Za-z]+)", r"$1 ")
    capped = F.initcap(F.lower(marked))
    return F.regexp_replace(F.regexp_replace(capped, " ", ""), "\x00", " ")


def clip(col: Column | str, lo=None, hi=None) -> Column:
    """``Series.clip(lo, hi)`` (P7): range-clamp with nulls passing through."""
    c = F.col(col) if isinstance(col, str) else col
    clamped = c
    if lo is not None:
        clamped = F.greatest(clamped, F.lit(lo))
    if hi is not None:
        clamped = F.least(clamped, F.lit(hi))
    # greatest/least skip NULL and order NaN above all values; pandas
    # clip propagates both — keep the pandas semantics. NaN is tested
    # via isnan over a double cast (type-safe for integer columns, and
    # Spark's NaN = NaN equality makes the usual c != c trick useless).
    return F.when(c.isNull() | F.isnan(c.cast("double")), c).otherwise(clamped)


def truncate(col: Column | str, n: int) -> Column:
    """``str[:n]`` (P8)."""
    return F.substring(col, 1, n)
