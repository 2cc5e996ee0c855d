"""operators/quantiles.py — histogram-cutpoint bucketing must agree
with NTILE exactly when bins are unique and the population divides
evenly, degrade to whole-bin ties otherwise, and never sort the full
input on one task."""

import pyspark.sql.functions as F

from _multi_source_retail_data_integration_hub_spark.operators.quantiles import (
    histogram_bucket,
    histogram_bucket_map,
)


def test_matches_ntile_on_unique_bins(spark):
    # 100 distinct bins, k=5: every bin holds one row, 100 % 5 == 0,
    # so the histogram bucketing and NTILE agree row-for-row
    from pyspark.sql import Window

    df = spark.range(100).select((F.col("id") * 7 % 997).alias("v"))
    got = {
        r["v"]: r["b"]
        for r in histogram_bucket(df, "v", 5, "b").collect()
    }
    want = {
        r["v"]: r["nt"]
        for r in df.withColumn(
            "nt", F.ntile(5).over(Window.orderBy("v"))
        ).collect()
    }
    assert got == want


def test_heavy_bin_keeps_ties_together(spark):
    # one bin holds 60% of rows: it must land in ONE bucket (bucket 1),
    # and the remaining rows spread over the upper buckets
    df = spark.createDataFrame(
        [(0,)] * 60 + [(i,) for i in range(1, 41)], "v int"
    )
    rows = histogram_bucket(df, "v", 5, "b").collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["v"], set()).add(r["b"])
    assert by_bin[0] == {1}
    assert all(len(s) == 1 for s in by_bin.values())
    # monotone: higher bin -> same or higher bucket
    assign = sorted((v, next(iter(s))) for v, s in by_bin.items())
    buckets = [b for _, b in assign]
    assert buckets == sorted(buckets)
    assert max(buckets) == 5


def test_bucket_map_is_bin_sized_and_plan_has_no_input_sort(spark):
    df = spark.range(10_000).select((F.col("id") % 37).alias("v"))
    m = histogram_bucket_map(df, "v", 10, "b")
    assert m.count() == 37
    plan = (
        histogram_bucket(df, "v", 10, "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # assignment is a broadcast hash join of the tiny map, and the only
    # SinglePartition exchange feeds the bin-histogram windows, sitting
    # ABOVE the groupBy(bin) aggregate — never over the raw input
    assert "BroadcastHashJoin" in plan
    sp = plan.index("Exchange SinglePartition")
    assert "HashAggregate" in plan[sp:], "window exchange must sit over the histogram"
