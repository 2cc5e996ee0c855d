"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-dependent per partition-split and not
reproducible across engines or re-partitions, so data pipelines that
need auditable subsets (eval holdouts, per-source mixing rates) key the
decision off a stable row id instead: a row is in the sample iff
``key % denom < rate*denom``. The decision is a pure projection — no
shuffle, fully pushdown-friendly — and any engine (or the DuckDB
oracle) reproduces it bit-for-bit.

At 100 TB the same construction gives consistent train/eval splits
across reruns and across systems, and ``stratified_sample`` implements
per-stratum mixing rates (e.g. downsample crawl data, keep all curated
text) in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 100


def in_sample(key: Column, pct: Column | int, denom: int = DENOM) -> Column:
    """True iff the row's stable key falls inside the sampling window."""
    return F.pmod(key, F.lit(denom)) < pct


def deterministic_sample(
    df: DataFrame, key_col: str, pct: int, denom: int = DENOM
) -> DataFrame:
    """Keep ~pct/denom of rows, decided purely by ``key_col % denom``."""
    return df.where(in_sample(F.col(key_col), F.lit(pct), denom))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    key_col: str,
    default_pct: int = 0,
    denom: int = DENOM,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates_pct`` maps stratum
    value -> integer percentage of rows to keep (0..denom). Strata not
    listed keep ``default_pct``. One pass, no shuffle."""
    pct: Column = F.lit(default_pct)
    for value, p in rates_pct.items():
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.where(in_sample(F.col(key_col), pct, denom))
