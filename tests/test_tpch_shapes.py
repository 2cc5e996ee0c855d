"""Physical-plan and semantic checks for the classic decision-support
shapes in plans/tpch_shapes.py (q88-q99). Correctness is owned by the
DuckDB differential gate; these tests pin the *plan* properties the
module's docstrings promise — the ones that matter at 100 TB and that
a future refactor could silently lose."""

import pytest
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.plans.tpch_shapes import (
    q88_best_price_supplier,
    q91_custdist,
    q94_small_order_drain,
    q96_disjunctive_revenue,
    q98_sole_failing_supplier,
    q99_dormant_customers,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q96_disjunction_stays_a_hash_join(spark):
    """The OR-of-conjunctions must ride as a residual on the partkey
    equi-join — if the disjunction leaks into the join condition the
    plan degrades to BroadcastNestedLoopJoin (O(n*m) at scale)."""
    plan = _plan(q96_disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "NestedLoop" not in plan, plan[:2000]


def test_q88_decorrelates_to_single_offers_scan(spark):
    """The groupwise-min correlated subquery must not rescan lineitem:
    exactly one parquet scan of lineitem in the plan (the offers
    aggregate feeds both sides of the min-equality via a window)."""
    plan = _plan(q88_best_price_supplier(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan[:3000]
    assert "Window" in plan


def test_q98_single_pass_no_self_joins(spark):
    """Both EXISTS conditions collapse into one aggregation per order:
    one lineitem scan, no lineitem self-join."""
    plan = _plan(q98_sole_failing_supplier(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan[:3000]


def test_q91_zero_order_customers_survive(spark):
    """Q13's crux: customers with no qualifying orders appear in the
    c_count=0 bucket (the filter is a join condition, not a WHERE)."""
    dist = {r["c_count"]: r["custdist"] for r in q91_custdist(spark, SF).collect()}
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(dist.values()) == n_customers  # every customer lands in a bucket


def test_q94_small_order_threshold_is_strict(spark):
    """Rows counted are strictly below half the per-part average —
    recompute the count independently with a window."""
    row = q94_small_order_drain(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet").where(
        F.col("p_brand") == "Brand#1"
    )
    pl = li.join(part, li.l_partkey == part.p_partkey)
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    expected = (
        pl.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .count()
    )
    assert row["n_small_lines"] == expected


def test_q99_dormancy_is_anti_join_not_filter(spark):
    """A customer with ONLY old/non-urgent orders still counts as
    dormant; one with a recent urgent order never does."""
    df = q99_dormant_customers(spark, SF)
    plan = _plan(df)
    # the NOT EXISTS must plan as an anti join (broadcast or shuffled)
    assert "LeftAnti" in plan or "left_anti" in plan.lower(), plan[:2000]
    rows = df.collect()
    assert all(r["n_custs"] > 0 for r in rows)


@pytest.mark.parametrize(
    "fn",
    [q88_best_price_supplier, q91_custdist, q94_small_order_drain,
     q96_disjunctive_revenue, q98_sole_failing_supplier, q99_dormant_customers],
)
def test_shapes_run_at_smoke_scale(spark, fn):
    assert fn(spark, SF).count() >= 0
