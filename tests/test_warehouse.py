"""Golden/invariant tests for the retail warehouse build (SURVEY §5.2).

Fixture rows are crafted per FIXTURES.md: malformed dates (P3), zero
quantities (P4), corrupted totals (P5), stray casing/whitespace (P6),
out-of-range ages (P7), bin-edge values (D6/D7), multi-transaction
customers for segment coverage.
"""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.plans import retail
from _multi_source_retail_data_integration_hub_spark.sources.retail import (
    categories_from_list,
    products_from_records,
)

RUN_TS = "2024-06-01 00:00:00"

RAW_COLS = [
    "Transaction ID", "Date", "Customer ID", "Gender", "Age",
    "Product Category", "Quantity", "Price per Unit", "Total Amount",
]

RAW_ROWS = [
    # tid, date, customer, gender, age, category, qty, price, total
    (1, "2023-01-15", "CUST001", "Male", 34, "Beauty", 3, 50.0, 150.0),
    (2, "2023-02-20", "CUST002", "female ", 26, "Clothing", 2, 500.0, 999.0),  # corrupted total
    (3, "not-a-date", "CUST003", "Male", 50, "Electronics", 1, 30.0, 30.0),   # dropped (P3)
    (4, "2023-03-05", "CUST004", " MALE", 150, "Electronics", 4, 25.0, 100.0),  # age clip
    (5, "2023-04-10", "CUST005", "Female", 15, "Beauty", 0, 50.0, 0.0),       # dropped (P4)
    (6, "2023-05-11", "CUST001", "Male", 34, "Clothing", 1, 300.0, 300.0),
    (7, "2023-06-12", "CUST001", "Male", 34, "Beauty", 2, 25.0, 50.0),        # CUST001: 3 tx
    (8, "2023-07-13", "CUST006", "Female", 25, "Electronics", 1, 500.0, 500.0),  # age bin edge
    (9, "2023-08-14", "CUST006", "Female", 25, "Clothing", 2, 30.0, 60.0),
    (10, "2023-09-15", "CUST006", "Female", 25, "Beauty", 1, 25.0, 25.0),
    (11, "2023-10-16", "CUST006", "Female", 25, "Electronics", 3, 50.0, 150.0),
    (12, "2023-11-17", "CUST006", "Female", 25, "Clothing", 4, 25.0, 100.0),
    (13, "2023-12-18", "CUST006", "Female", 25, "Beauty", 1, 300.0, 300.0),   # CUST006: 6 tx
    (14, "2024-01-01", "CUST007", "Male", 64, "Electronics", 2, 300.0, 600.0),
]

PRODUCTS = [
    {"id": 1, "title": "  Laptop Pro ", "price": 999.99, "description": "d" * 600,
     "image": "http://x/1.png", "category": "electronics", "rating": {"rate": 4.5, "count": 120}},
    {"id": 2, "title": "Gold Ring", "price": 168.0, "description": "shiny",
     "image": "http://x/2.png", "category": "jewelery", "rating": {"rate": 5.9, "count": -3}},
    {"id": 3, "title": "Mens Jacket", "price": 55.99, "description": "warm",
     "image": "http://x/3.png", "category": "men's clothing", "rating": {"rate": 3.1, "count": 45}},
]

API_CATEGORIES = ["electronics", "jewelery", "men's clothing", "women's clothing"]


@pytest.fixture(scope="module")
def warehouse(spark):
    raw_sales = spark.createDataFrame(RAW_ROWS, RAW_COLS).withColumn(
        "_extracted_at", F.lit(RUN_TS).cast("timestamp")
    ).withColumn("_source", F.lit("kaggle_retail_sales"))
    raw_products = products_from_records(spark, PRODUCTS, extracted_at=RUN_TS)
    cats = categories_from_list(spark, API_CATEGORIES)
    tables = retail.build_warehouse(raw_sales, raw_products, cats, run_ts=RUN_TS)
    return {k: v.cache() for k, v in tables.items()}


def test_cleaning_gates(warehouse):
    stg = warehouse["stg_retail_sales"]
    rows = {r.transaction_id: r for r in stg.collect()}
    assert set(rows) == {1, 2, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14}  # 3 and 5 dropped
    assert rows[2].total_amount == 1000.0  # repaired (P5)
    assert rows[2].gender == "Female" and rows[4].gender == "Male"  # P6
    assert rows[4].age == 100  # clipped (P7)


def test_dim_date_full_years(warehouse):
    dd = warehouse["dim_date"]
    assert dd.count() == 731  # 2023 + 2024 (leap)
    first, last = dd.agg(F.min("full_date"), F.max("full_date")).collect()[0]
    assert str(first) == "2023-01-01" and str(last) == "2024-12-31"
    # spot-check calendar attrs on a known day
    oct1 = dd.filter(F.col("date_key") == 20231001).collect()[0]
    assert (oct1.day_name, oct1.is_weekend, oct1.fiscal_year, oct1.fiscal_quarter) == (
        "Sunday", True, 2024, 1,
    )


def test_dim_customer_segments_and_keys(warehouse):
    dc = warehouse["dim_customer"]
    rows = {r.customer_id: r for r in dc.collect()}
    assert rows["CUST001"].total_transactions == 3
    assert rows["CUST001"].customer_segment == "Occasional"
    assert rows["CUST006"].total_transactions == 6
    assert rows["CUST006"].customer_segment == "Loyal"
    assert rows["CUST002"].customer_segment == "New"
    assert rows["CUST006"].age_group == "18-25"  # bin edge 25 right-closed
    assert rows["CUST007"].age_group == "56-65"  # 64
    # surrogate keys dense 1..N in business-key order
    keys = [r.customer_key for r in dc.orderBy("customer_id").collect()]
    assert keys == list(range(1, len(keys) + 1))
    assert all(r.is_current and r.version == 1 for r in rows.values())


def test_dim_customer_row_hash_matches_pandas(warehouse):
    import hashlib

    r = {x.customer_id: x for x in warehouse["dim_customer"].collect()}["CUST004"]
    expected = hashlib.md5(f"CUST004_{r.gender}_{r.age}".encode()).hexdigest()
    assert r.row_hash == expected


def test_dim_category(warehouse):
    cats = {r.category_name: r for r in warehouse["dim_product_category"].collect()}
    # retail: Beauty, Clothing, Electronics; api: Electronics, Jewelery,
    # Men's Clothing, Women's Clothing (std_text initcap semantics)
    assert cats["Electronics"].category_source == "both"
    assert cats["Beauty"].category_source == "retail"
    assert cats["Jewelery"].category_source == "api"
    assert cats["Electronics"].category_group == "Electronics"
    assert cats["Men's Clothing"].category_group == "Fashion & Apparel"
    assert cats["Jewelery"].category_group == "Beauty & Accessories"
    assert cats["Beauty"].category_group == "Beauty & Accessories"
    keys = sorted(r.category_key for r in cats.values())
    assert keys == list(range(1, len(cats) + 1))


def test_dim_product(warehouse):
    dp = warehouse["stg_api_products"]
    rows = {r.id: r for r in dp.collect()}
    assert len(rows[1].description) == 500  # truncated
    assert rows[2].rating_rate == 5.0 and rows[2].rating_count == 0  # clipped
    assert rows[1].title == "Laptop Pro"  # trimmed
    prod = {r.api_product_id: r for r in warehouse["dim_product"].collect()}
    assert prod[1].product_key == 1 and prod[3].product_key == 3


def test_fact_fk_resolution_and_revenue(warehouse):
    fact = warehouse["fact_sales"]
    assert fact.filter(
        F.col("customer_key").isNull()
        | F.col("category_key").isNull()
        | F.col("date_key").isNull()
    ).count() == 0
    # revenue conservation: fact total == sum of repaired line totals
    expected = 150 + 1000 + 100 + 300 + 50 + 500 + 60 + 25 + 150 + 100 + 300 + 600
    assert fact.agg(F.sum("total_amount")).collect()[0][0] == expected


def test_marts_conserve_revenue_and_shares(warehouse):
    fact_total = warehouse["fact_sales"].agg(F.sum("total_amount")).collect()[0][0]
    monthly = warehouse["mart_sales_performance"]
    assert monthly.agg(F.sum("total_revenue")).collect()[0][0] == fact_total
    cat = warehouse["mart_category_analysis"]
    assert cat.agg(F.sum("total_revenue")).collect()[0][0] == fact_total
    share_sum = cat.agg(F.sum("revenue_share_pct")).collect()[0][0]
    assert abs(share_sum - 100.0) < 0.05  # rounded to 2dp per category
    rows = {r.product_category: r for r in cat.collect()}
    for r in rows.values():
        assert abs(r.female_revenue_pct + r.male_revenue_pct - 100.0) < 1e-9
    assert rows["Electronics"].category_group == "Electronics"


def test_mart_monthly_growth(warehouse):
    rows = warehouse["mart_sales_performance"].orderBy("year", "month").collect()
    assert rows[0].revenue_prev_month is None
    # feb revenue=1000 (repaired), jan=150 -> growth 566.67
    feb = [r for r in rows if r.month == 2][0]
    assert feb.revenue_prev_month == 150.0
    assert feb.revenue_growth_pct == round((1000 - 150) / 150 * 100, 2)
