"""Hierarchical rollup query surface (engine extension: the reference
has no grouping sets — SURVEY §2.5 — but any warehouse serving its
dashboards wants subtotal pyramids computed in one pass).

q38: revenue by (year, quarter) with quarter and grand subtotals via
ROLLUP — one shuffle for all three grains instead of three queries.
``grouping()`` flags disambiguate real NULLs from subtotal rows in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import query

DEC = "decimal(18,2)"


@query(
    "q38_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(quarter(o_orderdate) AS BIGINT) AS quarter,
           CAST(GROUPING(year(o_orderdate)) AS INT) AS is_year_total,
           CAST(GROUPING(quarter(o_orderdate)) AS INT) AS is_quarter_total,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders
    GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate))
    """,
)
def q38_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("year"),
        F.quarter("o_orderdate").cast("long").alias("quarter"),
        "o_totalprice",
    )
    return (
        orders.rollup("year", "quarter")
        .agg(
            F.grouping(F.col("year")).cast("int").alias("is_year_total"),
            F.grouping(F.col("quarter")).cast("int").alias("is_quarter_total"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_revenue"),
        )
        .select(
            "year", "quarter", "is_year_total", "is_quarter_total", "n_orders", "total_revenue"
        )
    )
