"""Incremental mart maintenance: merge(partial(base), partial(delta))
must equal aggregate(base ∪ delta) — the view-maintenance identity the
q111 oracle also proves differentially at corpus scale."""

import datetime as dt

import pyspark.sql.functions as F

from _multi_source_retail_data_integration_hub_spark.plans.incremental import (
    merge_order_mart,
    partial_order_mart,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderdate date, o_orderstatus string, o_totalprice double"
    )


def test_partial_merge_equals_full(spark):
    d = dt.date
    base_rows = [
        (d(1995, 3, 1), "F", 10.0),
        (d(1995, 3, 9), "F", 20.5),
        (d(1995, 4, 2), "O", 7.25),
    ]
    delta_rows = [
        (d(1995, 3, 30), "F", 1.0),   # merges into an existing group
        (d(1995, 5, 1), "P", 99.99),  # group only in the delta
    ]
    base = _orders(spark, base_rows)
    delta = _orders(spark, delta_rows)
    merged = merge_order_mart(partial_order_mart(base), partial_order_mart(delta))
    full = partial_order_mart(_orders(spark, base_rows + delta_rows))
    key = lambda r: (r.order_month, r.order_status)  # noqa: E731
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # base-only groups pass through unchanged
    apr = {key(r): r for r in merged.collect()}[("1995-04", "O")]
    assert apr.n_orders == 1 and float(apr.sum_price) == 7.25


def test_merge_min_max_partials(spark):
    d = dt.date
    base = _orders(spark, [(d(1995, 3, 1), "F", 50.0)])
    delta = _orders(spark, [(d(1995, 3, 2), "F", 10.0), (d(1995, 3, 3), "F", 90.0)])
    row = merge_order_mart(
        partial_order_mart(base), partial_order_mart(delta)
    ).collect()[0]
    assert float(row.min_price) == 10.0
    assert float(row.max_price) == 90.0
    assert row.n_orders == 3
