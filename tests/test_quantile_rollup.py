"""q143 (plans/scale_ops.py): mergeable histogram-quantile rollup.

The oracle gate proves Spark == DuckDB on the same plan; these tests pin
the two properties the plan's determinism cannot express by itself:
the bin-granularity ACCURACY contract against the exact percentile, and
that the per-day partials really are mergeable (day-merged == computed
directly from the facts).
"""

import datetime as dt

from _multi_source_retail_data_integration_hub_spark.plans.scale_ops import (
    QR_BIN_USD,
    q143_quantile_rollup,
)


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        [
            (i, ck, amt, day)
            for i, (ck, amt, day) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date",
    ).write.parquet(path + "/orders.parquet")


def test_quantile_rollup_anchors_to_exact_percentile(spark, tmp_path):
    # 200 orders over two years with distinct price distributions
    rows = []
    for k in range(100):
        rows.append((k, 1000.0 + 1500.0 * k, dt.date(2024, 1 + k % 12, 1 + k % 28)))
    for k in range(100):
        rows.append((k, 500.0 + 300.0 * k, dt.date(2025, 1 + k % 12, 1 + k % 28)))
    d = str(tmp_path)
    _write_orders(spark, d, rows)
    out = {r["order_year"]: r for r in q143_quantile_rollup(spark, d).collect()}
    assert set(out) == {2024, 2025}
    import numpy as np

    for year, prices in (
        (2024, [1000.0 + 1500.0 * k for k in range(100)]),
        (2025, [500.0 + 300.0 * k for k in range(100)]),
    ):
        assert out[year]["n_orders"] == 100
        for p in (50, 90, 99):
            est = out[year][f"p{p}_lower_usd"]
            # lower-edge convention: the exact p-th percentile (lowest
            # value v with 100*rank(v) >= p*n) falls inside [est, est+bin)
            exact = float(np.sort(prices)[int(np.ceil(p / 100 * 100)) - 1])
            assert est <= exact < est + QR_BIN_USD, (year, p, est, exact)


def test_quantile_rollup_day_partials_are_mergeable(spark, tmp_path):
    # the same orders split across many days must give the identical
    # rollup as if they all landed on one day: bins sum, order-free
    rows_spread = [
        (k % 7, 1000.0 * k, dt.date(2024, 1 + k % 12, 1 + k % 28))
        for k in range(60)
    ]
    rows_oneday = [(ck, amt, dt.date(2024, 6, 15)) for ck, amt, _ in rows_spread]
    d1, d2 = str(tmp_path / "spread"), str(tmp_path / "oneday")
    _write_orders(spark, d1, rows_spread)
    _write_orders(spark, d2, rows_oneday)
    got1 = [tuple(r) for r in q143_quantile_rollup(spark, d1).collect()]
    got2 = [tuple(r) for r in q143_quantile_rollup(spark, d2).collect()]
    assert got1 == got2
