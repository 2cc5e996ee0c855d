"""As-of join semantics (operators/asof.py). q36's DuckDB ASOF JOIN
oracle proves value parity on real data; these tests pin the edge cases
the oracle data doesn't exercise — NULL fields in the winning right row
and no-predecessor left rows."""

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators.asof import asof_join


def test_asof_attaches_whole_row_atomically(spark):
    # the winning right row (ts=20) has a NULL in column `a`; that NULL
    # must NOT be back-filled from the older row (ts=10, a=1.0).
    left = spark.createDataFrame([(1, 30)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, None), (1, 20, None, 2.0)],
        "k long, ts long, a double, b double",
    )
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row["ts_right"] == 20
    assert row["a_right"] is None
    assert row["b_right"] == 2.0


def test_asof_backward_with_exact_match_and_no_predecessor(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 9), (2, 7)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 6, 60.0), (1, 10, 100.0), (2, 8, 80.0)],
        "k long, ts long, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert out[(1, 5)] == (None, None)  # no predecessor
    assert out[(1, 9)] == (6, 60.0)  # strictly before
    assert out[(1, 10)] == (10, 100.0)  # exact timestamp wins
    assert out[(2, 7)] == (None, None)  # other key's rows invisible


def test_asof_carries_columns_with_awkward_names(spark):
    # names with spaces and dots must survive the struct DDL round-trip
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 1.5, 2.5)], "k long, ts long, `view value` double, `a.b` double"
    )
    row = asof_join(
        left, right, on="ts", by="k", value_cols=["view value", "a.b"]
    ).collect()[0]
    assert row["ts_right"] == 5
    assert row["view value_right"] == 1.5
    assert row["a.b_right"] == 2.5
