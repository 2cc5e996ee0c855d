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


def mixture_sampling_rates(
    totals: DataFrame,
    strata_col: str,
    tokens_col: str,
    weights_pct: dict[str, int],
    budget_pct: int,
    denom: int = DENOM,
) -> DataFrame:
    """Turn a target domain mixture into per-stratum sampling rates.

    ``totals`` has one row per stratum with its token count. The token
    budget is ``budget_pct`` percent of the corpus total; each stratum's
    share of that budget is ``weights_pct[stratum]`` percent (training
    mixtures a la "50% web, 30% wiki, 20% books"). The emitted
    ``rate_pct`` (0..denom, capped at denom when a stratum is too small
    to fill its target) plugs straight into ``stratified_sample`` /
    ``in_sample``, keeping the actual row selection a deterministic,
    pushdown-friendly projection.

    Scale shape: ``totals`` is a per-stratum aggregate (map-side
    combined, a handful of rows at any corpus size), the grand total is
    an unpartitioned window over those few rows, and the result is
    broadcast back to the fact side — the corpus itself is never
    shuffled.
    """
    from pyspark.sql import Window

    w_pct: Column = F.lit(None).cast("int")
    for value, p in weights_pct.items():
        w_pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(w_pct)
    return (
        # grand total BEFORE dropping unweighted strata: the budget is a
        # corpus-wide token fraction, not a weighted-subset fraction
        totals.withColumn(
            "_total", F.sum(tokens_col).over(Window.partitionBy())
        )
        .withColumn("_w_pct", w_pct)
        .where(F.col("_w_pct").isNotNull())
        .withColumn(
            "target_tokens",
            F.floor(
                F.col("_total") * (F.col("_w_pct") * budget_pct) / F.lit(float(denom * denom))
            ),
        )
        .drop("_total")
        .withColumn(
            "rate_pct",
            F.least(
                F.lit(denom).cast("bigint"),
                F.floor(F.col("target_tokens") * F.lit(float(denom)) / F.col(tokens_col)),
            ).cast("int"),
        )
        .drop("_w_pct")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield-Lund-Thorup): top-k rows by priority = weight / u, with
    u a seeded uniform derived from the row's stable key.

    Rows are included with probability ~proportional to weight —  the
    primitive behind weighted corpus mixing ("sample 10M docs, long
    docs proportionally more often") — and, unlike A-ES exponential
    jittering (u^(1/w)), needs NO transcendental functions: u is an
    exact dyadic rational (first 32 md5 bits / 2^32) and priority is
    one IEEE division, so every engine computes bit-identical
    priorities and the sample is reproducible across engines, reruns
    and repartitions (same property as ``deterministic_sample``).

    Scale shape: priority is a pure projection; top-k is Spark's
    TakeOrderedAndProject (per-partition heads, never a global sort).
    Ties cannot occur across distinct keys (md5 collisions aside) —
    ordering is total and deterministic.
    """
    # +1 keeps u in (0, 1]: the all-zero hash word would otherwise
    # divide by zero (expected once per ~4e9 rows — a real event at
    # corpus scale). Still an exact dyadic rational.
    u = (
        F.conv(F.md5(F.col(key_col).cast("string")).substr(1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32))
    pri = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("priority", pri)
        .orderBy(F.desc("priority"), key_col)
        .limit(k)
    )


def temperature_weights(
    totals: DataFrame,
    strata_col: str,
    tokens_col: str,
) -> DataFrame:
    """Temperature-rebalanced mixture weights at T=2 (the multilingual
    sampling knob of mT5/XLM-R: w_i ∝ share_i^(1/T), flattening the
    head so low-resource strata are not starved). T=2 is computed as
    ``floor(sqrt(n_i))`` — hardware sqrt is IEEE correctly-rounded, so
    both engines produce bit-identical doubles and the floor/ratio
    arithmetic stays integer-exact (general T needs ``pow``, whose
    last-ulp is libm-dependent; production would accept that float,
    the oracle-checked surface pins the exact T=2 case).

    Emits per stratum: raw token count, natural share (ppm),
    temperature weight (ppm), and the boost delta — the numbers a
    mixture config is written from. Scale shape: input is the
    per-stratum aggregate (bounded by |strata|); the only window/cross
    join runs over that bounded table and the 1-row totals scalar.
    """
    from pyspark.sql import functions as F

    s = totals.select(
        F.col(strata_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        F.floor(F.sqrt(F.col(tokens_col))).cast("bigint").alias("_s"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("bigint").alias("_big_n"),
        F.sum("_s").cast("bigint").alias("_big_s"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            "n_tokens",
            F.expr("n_tokens * 1000000 DIV _big_n")
            .cast("bigint")
            .alias("share_ppm"),
            F.expr("_s * 1000000 DIV _big_s")
            .cast("bigint")
            .alias("temp_weight_ppm"),
            F.expr("_s * 1000000 DIV _big_s - n_tokens * 1000000 DIV _big_n")
            .cast("bigint")
            .alias("boost_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle + shard assignment: the data-ordering
# contract of a large training run. Every (example, epoch) gets a
# content-derived md5 sort key, a shard by key prefix, and a position
# within its shard — so any worker can reproduce its exact read order
# from (seed, epoch, shard) alone, resume mid-epoch by position, and
# every epoch is an independent permutation. This is the standard
# "global shuffle without a global sort" layout: at 100 TB the output
# is written hash-partitioned by shard and sorted WITHIN each shard
# (repartition(shard) + sortWithinPartitions — exactly what the
# per-shard window compiles to), never one total-order sort of the
# corpus.
# ---------------------------------------------------------------------------
EPOCH_SHUFFLE_SHARDS = 8


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epochs: tuple[int, ...] = (1, 2),
    n_shards: int = EPOCH_SHUFFLE_SHARDS,
    seed: str = "epoch",
) -> DataFrame:
    """(epoch, id, sort_key, shard_id, shard_pos) for every epoch.

    md5 of "seed:epoch:id" is the permutation key — engine-portable
    (identical text in the DuckDB twin) and uniform enough that shard
    sizes balance to sampling error. shard_pos is a per-(epoch, shard)
    ROW_NUMBER — hash-partitioned work, parallel across shards.
    """
    from pyspark.sql import Window

    epoch = F.explode(
        F.array(*[F.lit(e).cast("bigint") for e in epochs])
    ).alias("epoch")
    keyed = df.select(F.col(id_col), epoch).select(
        "epoch",
        id_col,
        F.md5(
            F.concat_ws(
                ":",
                F.lit(seed),
                F.col("epoch").cast("string"),
                F.col(id_col).cast("string"),
            )
        ).alias("sort_key"),
    )
    keyed = keyed.withColumn(
        "shard_id",
        F.pmod(
            F.conv(F.col("sort_key").substr(1, 8), 16, 10).cast("bigint"),
            F.lit(n_shards),
        ).cast("bigint"),
    )
    w = Window.partitionBy("epoch", "shard_id").orderBy("sort_key", id_col)
    return keyed.withColumn(
        "shard_pos", F.row_number().over(w).cast("bigint")
    )
