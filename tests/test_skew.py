"""Salted aggregation / replicated join are result-identical to their
plain forms (the whole point: skew mitigation must not change answers)."""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" holds 90% of rows
    rows = [(i, "hot" if i % 10 else "cold", float(i % 7)) for i in range(1, 2001)]
    return spark.createDataFrame(rows, "row_id long, key string, v double")


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r.key: (r.n, r.s)
        for r in skewed.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    salted = {
        r.key: (r.n, r.s)
        for r in skew.salted_agg(
            skewed,
            key_cols=["key"],
            aggs={"n": F.count("*"), "s": F.sum(F.col("v").cast("decimal(18,2)"))},
            salt_source="row_id",
        ).collect()
    }
    assert plain == salted


def test_replicated_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "key string, label string")
    plain = sorted((r.row_id, r.label) for r in skewed.join(dim, "key").collect())
    salted = sorted(
        (r.row_id, r.label)
        for r in skew.replicated_join(skewed, dim, "key", salt_source="row_id").collect()
    )
    assert plain == salted


def test_replicated_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "key string, label string")
    out = skew.replicated_join(skewed, dim, "key", salt_source="row_id", how="left")
    rows = out.collect()
    assert len(rows) == 2000
    assert {r.label for r in rows if r.key == "cold"} == {None}


def test_salted_agg_min_max_via_recombine_pairs(spark, skewed):
    plain = {
        r.key: (r.lo, r.hi, r.n)
        for r in skewed.groupBy("key")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r.key: (r.lo, r.hi, r.n)
        for r in skew.salted_agg(
            skewed,
            key_cols=["key"],
            aggs={
                "lo": (F.min("v"), F.min),
                "hi": (F.max("v"), F.max),
                "n": F.count("*"),
            },
            salt_source="row_id",
        ).collect()
    }
    assert plain == salted


def test_aqe_splits_skewed_join_partitions(spark):
    """The engine's first-line skew answer at scale is AQE's runtime
    skew-join split (salting in operators/skew.py is the manual path
    for aggregations and pre-AQE planners). This pins that the session
    config actually lets AQE engage: a sort-merge join with one hot key
    gets its oversized partition split (the final plan marks the join
    ``skew=true``) — and results are identical either way."""
    confs = {
        # shrink AQE's size thresholds so bench-scale data LOOKS skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # force SMJ: broadcast would dodge the skew machinery entirely
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # incompressible pad: shuffle partition sizes are COMPRESSED
        # bytes, so a repetitive pad would deflate the hot partition
        # below the skew threshold and nothing would trigger
        pad = F.concat(
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
                for i in range(4)
            ]
        )
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))  # 90% of rows on key 0
            .otherwise(F.col("id"))
            .alias("k"),
            pad.alias("pad"),
        )
        # distinct BY CONSTRUCTION (multiples of 10, incl. the hot 0):
        # a .distinct() would plant a HashAggregate between the right
        # Sort and its shuffle stage, and OptimizeSkewedJoin only
        # matches SMJ(Sort(stage), Sort(stage)) — it cannot split a
        # side whose partitioning feeds an intervening aggregate
        right = spark.range(0, 5_000).select((F.col("id") * 10).alias("k"))
        joined = left.join(right, "k")
        # collect() on THIS DataFrame: count()/write() build separate
        # QueryExecutions and the adaptive final plan would never
        # appear on `joined`
        assert len(joined.collect()) == 185_000  # semantics unchanged
        plan = (
            joined._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "skewed" in plan  # the AQEShuffleRead marks the split side
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
