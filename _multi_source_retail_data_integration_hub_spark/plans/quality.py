"""Data-quality audit surface: declarative expectations over the
warehouse tables (operators/expectations.py), Deequ/dbt-test class.

q115 runs a realistic rule set over orders + lineitem: presence,
domain, range, uniqueness, and referential integrity — ONE
aggregation job per table plus one anti-join, never one job per rule.
The DuckDB twin recomputes every counter as scalar subqueries, so the
driver's hash compare audits the whole rule engine end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import expectations as E
from ..sources.testdata import load_table
from .registry import query

_STATUS = ["O", "F", "P"]


@query(
    "q115_data_expectations",
    oracle=f"""
    WITH o AS (SELECT COUNT(*) AS n FROM orders),
    l AS (SELECT COUNT(*) AS n FROM lineitem),
    rules AS (
      SELECT 'o_orderkey_not_null' AS rule, o.n AS n_rows,
             (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)
               AS n_violations FROM o
      UNION ALL
      SELECT 'o_orderkey_unique', o.n,
             (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
              FROM orders) FROM o
      UNION ALL
      SELECT 'o_orderstatus_accepted_values', o.n,
             (SELECT COUNT(*) FROM orders
              WHERE o_orderstatus NOT IN ('O', 'F', 'P')
                 OR o_orderstatus IS NULL) FROM o
      UNION ALL
      SELECT 'o_totalprice_positive', o.n,
             (SELECT COUNT(*) FROM orders
              WHERE o_totalprice <= 0 OR o_totalprice IS NULL) FROM o
      UNION ALL
      SELECT 'l_quantity_in_range', l.n,
             (SELECT COUNT(*) FROM lineitem
              WHERE l_quantity NOT BETWEEN 1 AND 50
                 OR l_quantity IS NULL) FROM l
      UNION ALL
      SELECT 'l_shipdate_not_null', l.n,
             (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL) FROM l
      UNION ALL
      SELECT 'l_discount_in_range', l.n,
             (SELECT COUNT(*) FROM lineitem
              WHERE l_discount NOT BETWEEN 0.0 AND 0.1
                 OR l_discount IS NULL) FROM l
      UNION ALL
      SELECT 'l_orderkey_references_o_orderkey', l.n,
             (SELECT COUNT(*) FROM lineitem li LEFT JOIN orders od
              ON od.o_orderkey = li.l_orderkey
              WHERE od.o_orderkey IS NULL) FROM l
    )
    SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_violations = 0 AS BIGINT) AS passed
    FROM rules ORDER BY rule
    """,
)
def q115_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    order_rules = E.expect_summary(
        orders,
        rules=[
            E.not_null("o_orderkey"),
            E.accepted_values("o_orderstatus", _STATUS),
            E.positive("o_totalprice"),
        ],
        unique_cols=["o_orderkey"],
    )
    line_rules = E.expect_summary(
        lineitem,
        rules=[
            E.in_range("l_quantity", 1, 50),
            E.not_null("l_shipdate"),
            E.in_range("l_discount", 0.0, 0.1),
        ],
    )
    ref = E.expect_references(lineitem, "l_orderkey", orders, "o_orderkey")
    return order_rules.unionByName(line_rules).unionByName(ref).orderBy("rule")
