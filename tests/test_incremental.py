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


def test_cdc_merge_delete_update_batches(spark):
    """cdc_merge_partials with explicit delete/update batches (r4
    verdict ask #5): signed weights absorb deletes and cross-group
    moves into counts/sums; extrema re-base only for touched groups;
    a group emptied by deletes drops out; untouched groups keep their
    stored state byte-for-byte."""
    from _multi_source_retail_data_integration_hub_spark.plans.incremental import (
        cdc_merge_partials,
    )

    d = dt.date
    base_rows = [
        (d(1995, 3, 1), "F", 10.0),
        (d(1995, 3, 9), "F", 20.5),
        (d(1995, 4, 2), "O", 7.25),   # untouched group
        (d(1995, 5, 1), "P", 99.99),  # will be emptied by a delete
    ]
    base = partial_order_mart(_orders(spark, base_rows))
    sum_cols, ex_cols = ["n_orders", "sum_price"], ["min_price", "max_price"]
    keys = ["order_month", "order_status"]

    # CDC batch: delete the 1995-05 P order; update the 10.0 F order
    # to 40.0 AND move it to status O (cross-group move)
    def signed(rows):
        df = spark.createDataFrame(
            rows,
            "order_month string, order_status string, w int, price double",
        )
        return df.groupBy(*keys).agg(
            F.sum("w").cast("bigint").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)") * F.col("w"))
            .cast("decimal(28,2)")
            .alias("sum_price"),
        )

    delta = signed(
        [
            ("1995-05", "P", -1, 99.99),  # delete
            ("1995-03", "F", -1, 10.0),   # update: out of old group
            ("1995-03", "O", 1, 40.0),    # update: into new group
        ]
    )
    # post-CDC fact rows of the touched groups only
    post_touched = partial_order_mart(
        _orders(spark, [(d(1995, 3, 9), "F", 20.5), (d(1995, 3, 15), "O", 40.0)])
    ).select(*keys, *ex_cols)

    merged = cdc_merge_partials(
        base.select(*keys, "n_orders",
                    F.col("sum_price").cast("decimal(28,2)").alias("sum_price"),
                    *ex_cols),
        delta, post_touched, keys, sum_cols, ex_cols,
    )
    got = {(r.order_month, r.order_status): r for r in merged.collect()}
    # emptied group gone
    assert ("1995-05", "P") not in got and len(got) == 3
    # old group: one order left, extrema rebased (10.0 is gone)
    f = got[("1995-03", "F")]
    assert f.n_orders == 1 and float(f.sum_price) == 20.5
    assert float(f.min_price) == 20.5 and float(f.max_price) == 20.5
    # new group created by the move
    o = got[("1995-03", "O")]
    assert o.n_orders == 1 and float(o.sum_price) == 40.0
    assert float(o.min_price) == 40.0 and float(o.max_price) == 40.0
    # untouched group: stored state untouched
    u = got[("1995-04", "O")]
    assert u.n_orders == 1 and float(u.sum_price) == 7.25
    assert float(u.min_price) == 7.25 and float(u.max_price) == 7.25
