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
