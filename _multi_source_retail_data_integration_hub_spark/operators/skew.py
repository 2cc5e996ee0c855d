"""Skew-mitigation operators: salted aggregation and salted broadcast
join — the hand-rolled fallbacks for when AQE's skew handling isn't
enough (extreme heavy-hitter keys at 100 TB).

Both are *result-identical* to their unsalted forms (sums/counts
decompose over salt partitions; DECIMAL partials stay exact), so every
salted query can be oracle-checked against the plain SQL equivalent.

When to use which:
- AQE skew-join splitting (on by default in session.py) handles most
  skew at runtime by splitting oversized partitions.
- ``salted_agg`` helps when ONE group key holds a large share of all
  rows: stage 1 spreads that key over ``n_salts`` reducers, stage 2
  combines the tiny per-salt partials. Cost: one extra (small) shuffle.
- ``replicated_join`` helps a skewed large-side equi-join against a
  small dimension: the dimension is replicated n_salts times so the
  hot key's rows fan over n_salts tasks. Only worthwhile when the
  dimension is broadcast-sized anyway but the *post-join* work is the
  bottleneck; otherwise plain broadcast join already avoids the skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt(salt_source: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a high-cardinality column."""
    return F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict,
    salt_source: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage decomposable aggregation: (keys, salt) then (keys).

    ``aggs`` maps output name -> either
    - a SUM/COUNT-style column expression, whose per-salt partials
      recombine by summing (the common case), or
    - a ``(partial_expr, recombine_fn)`` pair for other decomposable
      aggregates, e.g. ``(F.min("x"), F.min)`` for MIN or
      ``(F.max("x"), F.max)`` for MAX. Non-decomposable aggregates
      (avg, percentiles) don't fit — derive ratios after the final
      stage from summed parts.

    ``salt_source`` is any high-cardinality column (row id) used to
    spread hot keys.
    """
    partials: dict[str, Column] = {}
    finals: dict = {}
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            partials[name], finals[name] = spec
        else:
            partials[name], finals[name] = spec, F.sum
    stage1 = df.withColumn("_salt", _salt(F.col(salt_source), n_salts)).groupBy(
        *key_cols, "_salt"
    )
    partial = stage1.agg(*[c.alias(f"_p_{name}") for name, c in partials.items()])
    return partial.groupBy(*key_cols).agg(
        *[finals[name](f"_p_{name}").alias(name) for name in aggs]
    )


def replicated_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    big gains ``_salt`` from a row-unique column; small is exploded
    n_salts times with every salt value; the join key becomes
    (key, _salt) so one hot key spreads over n_salts tasks.
    """
    b = big.withColumn("_salt", _salt(F.col(salt_source), n_salts))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    joined = b.join(s, [key, "_salt"], how)
    return joined.drop("_salt")
