"""End-to-end pipeline driver: gates, warehouse writes, audit log
(SURVEY §3.1-3.2). Reuses the fixture corpus from test_warehouse."""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.plans import pipeline
from _multi_source_retail_data_integration_hub_spark.sources.retail import (
    categories_from_list,
    products_from_records,
)
from tests.test_warehouse import API_CATEGORIES, PRODUCTS, RAW_COLS, RAW_ROWS, RUN_TS

# fixture-sized thresholds (prod defaults assume the 1,000-row CSV)
THRESHOLDS = {"stg_retail_sales": 10, "dim_customer": 3, "dim_date": 365, "fact_sales": 10}


@pytest.fixture(scope="module")
def raw(spark):
    raw_sales = (
        spark.createDataFrame(RAW_ROWS, RAW_COLS)
        .withColumn("_extracted_at", F.lit(RUN_TS).cast("timestamp"))
        .withColumn("_source", F.lit("kaggle_retail_sales"))
    )
    return raw_sales, products_from_records(spark, PRODUCTS, extracted_at=RUN_TS), categories_from_list(
        spark, API_CATEGORIES
    )


@pytest.fixture(scope="module", autouse=True)
def _cleanup_test_db(spark):
    yield
    spark.sql("DROP DATABASE IF EXISTS test_dw CASCADE")


def test_full_run_loads_and_logs(spark, raw):
    raw_sales, raw_products, cats = raw
    res = pipeline.run_pipeline(
        spark, raw_sales, raw_products, cats, database="test_dw",
        run_ts=RUN_TS, thresholds=THRESHOLDS,
    )
    assert res.status == "success"
    assert res.counts["fact_sales"] == 12
    assert spark.table("test_dw.fact_sales").count() == 12
    # fact is partitioned by date_key (pruning at scale)
    parts = spark.sql("SHOW PARTITIONS test_dw.fact_sales").collect()
    assert len(parts) == 12 and parts[0].partition.startswith("date_key=")
    log = spark.table("test_dw.etl_run_log")
    assert log.count() == 1
    row = log.first()
    assert row.status == "success" and row.rows_extracted == len(RAW_ROWS)


def test_transform_gate_trips(spark, raw):
    raw_sales, raw_products, cats = raw
    with pytest.raises(pipeline.PipelineGateError, match="transform gate"):
        pipeline.run_pipeline(
            spark, raw_sales, raw_products, cats, database="test_dw",
            run_ts=RUN_TS, thresholds={"fact_sales": 10_000}, skip_load=True,
        )


def test_extract_gate_trips(spark, raw):
    raw_sales, raw_products, cats = raw
    with pytest.raises(pipeline.PipelineGateError, match="extract gate"):
        pipeline.run_pipeline(
            spark, raw_sales.limit(0), raw_products, cats, database="test_dw",
            run_ts=RUN_TS, thresholds=THRESHOLDS, skip_load=True,
        )


def test_skip_load_writes_nothing(spark, raw):
    raw_sales, raw_products, cats = raw
    spark.sql("DROP TABLE IF EXISTS test_dw.etl_run_log")
    res = pipeline.run_pipeline(
        spark, raw_sales, raw_products, cats, database="test_dw",
        run_ts=RUN_TS, thresholds=THRESHOLDS, skip_load=True,
    )
    assert "load" not in res.durations
    assert not spark.catalog.tableExists("test_dw.etl_run_log")
