"""Temporal-join query surface.

q36: as-of join — for every click event, the most recent view event of
the same user at-or-before it (operators/asof.py's union-sort-carry
construction). The DuckDB oracle uses its native ASOF LEFT JOIN, so
this differentially proves the distributed construction implements the
canonical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.testdata import load_table
from .registry import query


@query(
    "q36_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (  -- one row per (user, ts): defined tie-break
      SELECT user_id, ts, MAX(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.ts,
           v.ts AS view_ts, v.view_value,
           (epoch_us(c.ts) - epoch_us(v.ts)) / 1000000.0 AS gap_secs
    FROM clicks c
    ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q36_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    joined = asof_join(clicks, views, on="ts", by="user_id", value_cols=["view_value"])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("view_ts"),
        F.col("view_value_right").alias("view_value"),
        ((F.unix_micros("ts") - F.unix_micros("ts_right")) / 1_000_000.0).alias("gap_secs"),
    )
