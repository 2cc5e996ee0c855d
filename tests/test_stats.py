"""Catalog statistics + CBO: ANALYZE TABLE feeds real row/column stats
into the optimizer — the input Catalyst's cost-based join reordering
and broadcast decisions consume at warehouse scale (the Spark analogue
of the reference warehouse's automatic table statistics)."""

import shutil

import pyspark.sql.functions as F

from _multi_source_retail_data_integration_hub_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_analyze_table_feeds_optimizer_stats(spark):
    spark.sql("DROP TABLE IF EXISTS stats_orders_t")
    shutil.rmtree("spark-warehouse/stats_orders_t", ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders")
    orders.write.saveAsTable("stats_orders_t")
    n = orders.count()

    spark.sql("ANALYZE TABLE stats_orders_t COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE stats_orders_t COMPUTE STATISTICS "
        "FOR COLUMNS o_orderkey, o_orderstatus"
    )

    # column-level stats are exact on this data
    desc = {
        r.info_name: r.info_value
        for r in spark.sql(
            "DESCRIBE EXTENDED stats_orders_t o_orderstatus"
        ).collect()
    }
    assert int(desc["num_nulls"]) == 0
    assert int(desc["distinct_count"]) == orders.select(
        "o_orderstatus"
    ).distinct().count()

    # with CBO on, the optimizer sees the analyzed row count
    prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("stats_orders_t")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().get() == n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
