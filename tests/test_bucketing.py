"""Bucketing: co-located joins without a shuffle (SURVEY §4.2 physical
hygiene; the 100 TB answer to repeated large-table equi-joins)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _cleanup(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_db")
    yield
    spark.sql("DROP DATABASE IF EXISTS bkt_db CASCADE")


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("v2")
    )
    for name, df in [("bl", left), ("br", right)]:
        df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(f"bkt_db.{name}")

    # disable auto-broadcast: we want to see the shuffle (or its absence),
    # not a BroadcastExchange that hides it at this toy size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_db.bl").join(spark.table("bkt_db.br"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan[:2000]}"
        assert joined.count() == 5_000

        # sanity: the same join on plain parquet tables DOES shuffle
        left.write.mode("overwrite").saveAsTable("bkt_db.pl")
        right.write.mode("overwrite").saveAsTable("bkt_db.pr")
        plain = spark.table("bkt_db.pl").join(spark.table("bkt_db.pr"), "k")
        plan_plain = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
