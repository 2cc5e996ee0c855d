"""Incremental materialized-view maintenance: refresh an aggregate
mart from a delta batch WITHOUT rescanning history.

Reference analogue: the warehouse marts (mart_sales_performance etc.,
/root/reference/etl/load.py and sql/analytical_queries.sql) are rebuilt
from the full fact table on every ETL run — fine at warehouse scale,
unaffordable when the fact table is 100 TB and a daily delta is a few
GB. The scalable pattern is the classic mergeable-partial-aggregate
view maintenance: store the mart as PARTIAL aggregate state
(count / decimal-exact sum / min / max per group — every one a
commutative monoid), then each refresh aggregates ONLY the delta batch
and merges it cell-wise into the stored state:

    merged.count = base.count + delta.count
    merged.sum   = base.sum   + delta.sum
    merged.min   = LEAST(base.min, delta.min)
    merged.max   = GREATEST(base.max, delta.max)

Derived measures (avg = sum/count) are computed AT READ TIME from the
partials — never stored — because avg is not mergeable but its
numerator and denominator are. Deletions/updates would arrive as CDC
rows with signed weights (see q62_cdc_apply) against the sum/count
partials; min/max then need a periodic re-base, which is why real
systems store them per finer-grained partition and re-min over
partitions.

q111 demonstrates the refresh end-to-end and its oracle IS the full
recompute over base ∪ delta — proving merge(partial(base),
partial(delta)) == aggregate(base ∪ delta) row for row. The base
partial is materialized first (simulating the stored mart state), so
the merge plan the driver executes rescans only the delta rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.checkpointing import materialize
from ..sources.testdata import load_table
from .registry import query

DEC = "decimal(18,2)"
CUTOFF = "1997-01-01"  # orders before this date are the "stored history"


def partial_order_mart(orders: DataFrame) -> DataFrame:
    """Partial (mergeable) aggregate state of the monthly order mart:
    one row per (month, status) with count / sum / min / max partials."""
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.col("o_orderstatus").alias("order_status"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("sum_price"),
        F.min(F.col("o_totalprice").cast(DEC)).alias("min_price"),
        F.max(F.col("o_totalprice").cast(DEC)).alias("max_price"),
    )


#: combine function per partial-state column kind (every one a
#: commutative monoid, which is what makes the state mergeable)
_COMBINE = {"sum": F.sum, "min": F.min, "max": F.max}


def merge_partials(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Cell-wise merge of two partial aggregate states (full outer
    union-merge: groups present only in one side pass through
    unchanged). ``merges`` maps each partial column to its combine
    op: counts and sums merge with 'sum', extrema with 'min'/'max'.
    Shared by the batch refresh (q111) and the streaming
    foreachBatch mart sink (streaming/jobs.py::foreach_batch_mart_merge).
    """
    unknown = [op for op in merges.values() if op not in _COMBINE]
    if unknown:
        raise ValueError(
            f"merge_partials: unknown combine op(s) {unknown}; supported: "
            f"{sorted(_COMBINE)} (avg is not mergeable — store sum+count "
            "partials and derive it at read time)"
        )
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(*[_COMBINE[op](c).alias(c) for c, op in merges.items()])
    )


ORDER_MART_KEYS = ["order_month", "order_status"]
ORDER_MART_MERGES = {
    "n_orders": "sum",
    "sum_price": "sum",
    "min_price": "min",
    "max_price": "max",
}


def merge_order_mart(base: DataFrame, delta: DataFrame) -> DataFrame:
    return merge_partials(base, delta, ORDER_MART_KEYS, ORDER_MART_MERGES)


@query(
    "q111_incremental_mart",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderstatus AS order_status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS max_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q111_incremental_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh == full recompute, proven differentially.

    The oracle aggregates ALL orders in one pass; this plan aggregates
    history and delta separately and merges partials — the driver's
    hash compare is the maintenance-correctness proof.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(CUTOFF).cast("date")
    # stored mart state: materialized once; the refresh below never
    # rescans these rows (at 100 TB this is the difference between a
    # delta-sized job and a full-history job)
    base_state = materialize(partial_order_mart(orders.where(F.col("o_orderdate") < cutoff)))
    delta_state = partial_order_mart(orders.where(F.col("o_orderdate") >= cutoff))
    merged = merge_order_mart(base_state, delta_state)
    return merged.select(
        "order_month",
        "order_status",
        "n_orders",
        F.col("sum_price").cast("double").alias("total_price"),
        (F.col("sum_price").cast("double") / F.col("n_orders"))
        .cast("double")
        .alias("avg_price"),
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    ).orderBy("order_month", "order_status")
