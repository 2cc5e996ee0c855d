"""Real RDBMS round-trip for S7/S8 using Spark's embedded Derby.

The plan-level option tests (test_jdbc_plan.py) pin batching and
partitioning parameters; these tests exercise the actual JDBC write +
bounded partitioned read paths end-to-end against
``jdbc:derby:`` (the Derby jars ship inside pyspark), upgrading S7/S8
from plan-verified to round-trip-verified. Reference analogue:
/root/reference/etl/mysql_staging.py:46-200 (DDL + row-loop insert +
SELECT * read-back), replaced here by Spark's batched JDBC writer and
range-partitioned reader.
"""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.sources import sinks


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "stagedb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.range(0, 500).select(
        F.col("id").alias("sale_id"),
        (F.col("id") % 7).cast("double").alias("amount"),
        F.concat(F.lit("c"), (F.col("id") % 13).cast("string")).alias("customer"),
    )
    sinks.jdbc_write(df, derby_url, "staging_sales", mode="overwrite")

    back = sinks.jdbc_read(spark, derby_url, "staging_sales")
    assert back.count() == 500
    assert dict(back.dtypes) == {
        "SALE_ID": "bigint",
        "AMOUNT": "double",
        "CUSTOMER": "string",
    } or dict(back.dtypes) == {
        "sale_id": "bigint",
        "amount": "double",
        "customer": "string",
    }
    got = sorted(
        (r[0], r[1], r[2]) for r in back.collect()
    )
    want = sorted((r.sale_id, r.amount, r.customer) for r in df.collect())
    assert got == want


def test_jdbc_partitioned_read_bounds_probe(spark, derby_url):
    df = spark.range(100, 600).select(
        F.col("id").alias("sale_id"), (F.col("id") * 2).cast("double").alias("amount")
    )
    sinks.jdbc_write(df, derby_url, "staging_part", mode="overwrite")

    back = sinks.jdbc_read(
        spark, derby_url, "staging_part", partition_column="sale_id", num_partitions=4
    )
    # the MIN/MAX probe seeded real bounds and the scan is split 4 ways
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "numPartitions=4" in plan
    assert back.count() == 500
    assert back.agg(F.min("sale_id"), F.max("sale_id")).first() == (100, 599)


def test_jdbc_partitioned_read_empty_table_falls_back(spark, derby_url):
    empty = spark.range(0).select(
        F.col("id").alias("sale_id"), F.lit(0.0).alias("amount")
    )
    sinks.jdbc_write(empty, derby_url, "staging_empty", mode="overwrite")
    back = sinks.jdbc_read(
        spark, derby_url, "staging_empty", partition_column="sale_id", num_partitions=4
    )
    assert back.count() == 0


def test_jdbc_append_mode_accumulates(spark, derby_url):
    df = spark.range(0, 10).select(F.col("id").alias("sale_id"))
    sinks.jdbc_write(df, derby_url, "staging_append", mode="overwrite")
    sinks.jdbc_write(df, derby_url, "staging_append", mode="append")
    assert sinks.jdbc_read(spark, derby_url, "staging_append").count() == 20
