"""Scale-pattern query surface: semi-structured JSON extraction,
salted (skew-proof) aggregation, and sketch-based approximate
aggregates over the ``events`` table.

- q33: JSON path extraction from the ``props`` column (the engine's
  generalization of the reference's nested ``rating`` struct flatten,
  etl/extract.py:80-83) — native get_json_object, no UDF.
- q34: two-stage salted aggregation; result-identical to the plain
  GROUP BY, which IS its oracle — demonstrating that the skew
  mitigation is semantics-preserving.
- q35: HLL approx_count_distinct anchored to the exact count — the
  sketch's 3*rsd accuracy contract is asserted in-plan and the verdict
  column is hash-checked against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling, skew
from ..sources.testdata import load_table
from .registry import query

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# q33 — JSON property extraction + aggregation
# ---------------------------------------------------------------------------
@query(
    "q33_json_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q33_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q34 — salted two-stage aggregation over skewed keys
# event_type has ~5 values over the whole table: the canonical
# heavy-hitter shape. The oracle is the PLAIN group-by — proving the
# salted plan is result-identical.
# ---------------------------------------------------------------------------
@query(
    "q34_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q34_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = skew.salted_agg(
        events,
        key_cols=["event_type"],
        aggs={
            "n_events": F.count("*"),
            "total_value_dec": F.sum(F.col("value").cast(DEC)),
        },
        salt_source="event_id",
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value_dec").cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q35 — sketch vs exact distinct counting. The HLL estimate itself is
# engine-specific, so it cannot be a hash-compared column; instead the
# Spark plan asserts the sketch's accuracy contract (rel_error <= 3*rsd)
# and emits the verdict as a column the oracle pins to 1. exact_users is
# compared value-exactly. A drifting sketch flips within_3rsd to 0 and
# fails the driver's hash gate — a real correctness anchor, not rows-only.
# ---------------------------------------------------------------------------
APPROX_RSD = 0.02


@query(
    "q35_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS BIGINT) AS within_3rsd
    FROM events
    GROUP BY 1
    """,
)
def q35_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=APPROX_RSD).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_error = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type",
        "exact_users",
        (rel_error <= 3 * APPROX_RSD).cast("bigint").alias("within_3rsd"),
    )


# ---------------------------------------------------------------------------
# q45 — deterministic stratified sampling (operators/sampling.py).
# Per-stratum mixing rates keyed off event_id % 100 — the reproducible,
# engine-independent alternative to df.sample() that training-data
# pipelines need for auditable subsets. The oracle replays the exact
# same decision, proving the sample is deterministic, not just "about
# the right size".
# ---------------------------------------------------------------------------
SAMPLE_RATES = {"purchase": 100, "signup": 50, "error": 20, "click": 10, "view": 10}


@query(
    "q45_stratified_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT event_type, value
      FROM events
      WHERE event_id % 100 < CASE event_type
          WHEN 'purchase' THEN 100 WHEN 'signup' THEN 50
          WHEN 'error' THEN 20 WHEN 'click' THEN 10 WHEN 'view' THEN 10
          ELSE 0 END
    )
    SELECT event_type,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sampled_value
    FROM sampled
    GROUP BY 1
    """,
)
def q45_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sampled = sampling.stratified_sample(
        events, strata_col="event_type", rates_pct=SAMPLE_RATES, key_col="event_id"
    )
    return sampled.groupBy("event_type").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sampled_value"),
    )


# ---------------------------------------------------------------------------
# q49 — approximate median with an exact-anchored accuracy contract.
# percentile_approx's nominal rank error is 1/accuracy; the observed GK
# error runs a small constant factor above that, so the asserted window
# is 10/accuracy (= +-1% rank at accuracy=1000 — still a real anchor:
# a broken sketch is tens of percent off). The verdict column is
# hash-checked (same pattern as q35): a drifting sketch fails the
# driver gate.
# ---------------------------------------------------------------------------
APPROX_ACC = 1000
RANK_SLACK = 10.0  # multiples of 1/accuracy the estimate may deviate


@query(
    "q49_approx_median",
    oracle="""
    SELECT event_type,
           MEDIAN(CAST(value AS DOUBLE)) AS exact_median,
           CAST(1 AS BIGINT) AS within_rank_bound
    FROM events
    GROUP BY 1
    """,
)
def q49_approx_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, APPROX_ACC).alias("approx_median"),
        F.percentile("value", F.lit(0.5)).alias("exact_median"),
        F.percentile("value", F.lit(0.5 - RANK_SLACK / APPROX_ACC)).alias("lo"),
        F.percentile("value", F.lit(0.5 + RANK_SLACK / APPROX_ACC)).alias("hi"),
    )
    within = (F.col("approx_median") >= F.col("lo")) & (
        F.col("approx_median") <= F.col("hi")
    )
    return agg.select(
        "event_type",
        "exact_median",
        within.cast("bigint").alias("within_rank_bound"),
    )
