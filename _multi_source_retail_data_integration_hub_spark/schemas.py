"""Explicit StructType schemas for sources and warehouse tables.

The reference declares three parallel schema authorities (BigQuery
SchemaField lists at etl/load.py:59-188, BigQuery DDL, MySQL DDL); here
there is exactly one, and production reads never infer
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw retail sales CSV (header names as shipped; conformed by
# functions.cleansing.normalize_column_names). etl/extract.py:32-34.
RETAIL_SALES_CSV = T.StructType(
    [
        T.StructField("Transaction ID", T.LongType()),
        T.StructField("Date", T.StringType()),  # parsed with null-on-error cast (P2)
        T.StructField("Customer ID", T.StringType()),
        T.StructField("Gender", T.StringType()),
        T.StructField("Age", T.LongType()),
        T.StructField("Product Category", T.StringType()),
        T.StructField("Quantity", T.LongType()),
        T.StructField("Price per Unit", T.DoubleType()),
        T.StructField("Total Amount", T.DoubleType()),
    ]
)

# Raw API product JSON with the nested rating struct kept intact — Spark
# models it natively; flattening happens in the source reader
# (etl/extract.py:80-83 flattens at extract).
API_PRODUCTS_JSON = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("description", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField(
            "rating",
            T.StructType(
                [
                    T.StructField("rate", T.DoubleType()),
                    T.StructField("count", T.LongType()),
                ]
            ),
        ),
    ]
)

STG_RETAIL_SALES = T.StructType(
    [
        T.StructField("transaction_id", T.LongType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("product_category", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price_per_unit", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("row_hash", T.StringType()),
        T.StructField("_extracted_at", T.TimestampType()),
        T.StructField("_source", T.StringType()),
    ]
)

DIM_DATE = T.StructType(
    [
        T.StructField("date_key", T.IntegerType()),
        T.StructField("full_date", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("quarter", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("month_name", T.StringType()),
        T.StructField("week_of_year", T.IntegerType()),
        T.StructField("day_of_month", T.IntegerType()),
        T.StructField("day_of_week", T.IntegerType()),
        T.StructField("day_name", T.StringType()),
        T.StructField("is_weekend", T.BooleanType()),
        T.StructField("fiscal_year", T.IntegerType()),
        T.StructField("fiscal_quarter", T.IntegerType()),
    ]
)
