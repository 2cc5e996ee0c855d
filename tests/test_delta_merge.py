"""Equivalence tests for the transactional (Delta Lake) MERGE twins.

Skipped in environments without the public ``delta-spark`` package
(this container): the operators are the in-place upgrade path for
deployments with a lakehouse catalog, and their contract is
result-identity with the storage-agnostic defaults they twin
(operators/scd2.py, plans/incremental.py). Where Delta IS importable,
these tests build a Delta-enabled session and assert row-for-row
equality between MERGE INTO and the pure-DataFrame implementations.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from _multi_source_retail_data_integration_hub_spark.operators import (  # noqa: E402
    delta_merge,
    scd2,
)
from _multi_source_retail_data_integration_hub_spark.plans import (  # noqa: E402
    incremental,
)

EFF1 = "2024-01-01 00:00:00"
EFF2 = "2024-02-01 00:00:00"


@pytest.fixture(scope="module")
def dspark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("delta_wh")
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", str(wh))
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def _snap(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _incoming(spark, rows):
    df = spark.createDataFrame(
        rows, "customer_id int, segment string, city string"
    )
    return df.withColumn(
        "row_hash", F.md5(F.concat_ws("|", "segment", "city"))
    )


def test_scd2_delta_matches_dataframe_merge(dspark):
    t = "dim_customer_delta_t"
    dspark.sql(f"DROP TABLE IF EXISTS {t}")
    snap1 = _incoming(
        dspark, [(1, "retail", "lyon"), (2, "corp", "nice"), (3, "retail", "metz")]
    )
    # batch 2: key 1 changes, key 2 unchanged (re-sent), key 4 is new
    snap2 = _incoming(
        dspark, [(1, "corp", "lyon"), (2, "corp", "nice"), (4, "retail", "brest")]
    )

    delta_merge.scd2_initial_delta(t, snap1, EFF1)
    delta_merge.scd2_merge_delta(dspark, t, snap2, "customer_id", EFF2)
    got = dspark.table(t)

    want = scd2.scd2_merge(
        scd2.scd2_initial(snap1, EFF1), snap2, "customer_id", EFF2
    )
    cols = [
        "customer_id", "segment", "city",
        "effective_start_date", "effective_end_date", "is_current", "version",
    ]
    assert _snap(got.select(*cols), cols) == _snap(want.select(*cols), cols)
    # invariants: exactly one current row per key; contiguous timeline
    cur = got.filter("is_current").groupBy("customer_id").count()
    assert cur.filter("count != 1").count() == 0


def test_mart_merge_delta_matches_merge_partials(dspark):
    t = "mart_orders_delta_t"
    dspark.sql(f"DROP TABLE IF EXISTS {t}")
    base = dspark.createDataFrame(
        [
            ("2024-01", "F", 2, 100.0, 40.0, 60.0),
            ("2024-01", "O", 1, 30.0, 30.0, 30.0),
        ],
        "order_month string, order_status string, n_orders long,"
        " sum_price double, min_price double, max_price double",
    )
    dlt = dspark.createDataFrame(
        [
            ("2024-01", "F", 1, 10.0, 10.0, 10.0),   # existing group
            ("2024-02", "O", 3, 90.0, 20.0, 50.0),   # new group
        ],
        base.schema,
    )
    base.write.format("delta").mode("overwrite").saveAsTable(t)
    delta_merge.merge_mart_delta(
        dspark, t, dlt, incremental.ORDER_MART_KEYS, incremental.ORDER_MART_MERGES
    )
    got = dspark.table(t)
    want = incremental.merge_partials(
        base, dlt, incremental.ORDER_MART_KEYS, incremental.ORDER_MART_MERGES
    )
    cols = list(base.columns)
    assert _snap(got, cols) == _snap(want, cols)


def test_merge_mart_delta_rejects_unmergeable_op(dspark):
    with pytest.raises(ValueError, match="unknown combine op"):
        delta_merge.merge_mart_delta(
            dspark, "whatever", dspark.range(1), ["id"], {"id": "avg"}
        )
