"""Grouped-map (applyInPandas) and explicit window-frame surfaces.

q39: per-user inter-event gap statistics via applyInPandas — the
grouped-map UDF class (pandas DataFrame in, DataFrame out, one group
per call). Exact numpy median matches DuckDB's interpolating median,
so even this Python-side operator stays oracle-checkable.

q40: 7-row trailing moving average over daily revenue with an explicit
ROWS BETWEEN frame — the frame-spec window class the reference never
uses (SURVEY §2.6) but any trend dashboard wants.

Scale notes: q39 shuffles once on user_id and each group is one
user's events (bounded); q40's window runs on the tiny post-aggregate
daily table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import query

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# q39 — per-user gap statistics (applyInPandas grouped map)
# ---------------------------------------------------------------------------
@query(
    "q39_user_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               / 1000000.0 AS gap_secs
      FROM events
    )
    SELECT user_id,
           COUNT(gap_secs) AS n_gaps,
           MIN(gap_secs) AS min_gap_secs,
           MEDIAN(gap_secs) AS median_gap_secs,
           MAX(gap_secs) AS max_gap_secs
    FROM gaps
    WHERE gap_secs IS NOT NULL
    GROUP BY 1
    """,
)
def q39_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )

    out_schema = (
        "user_id long, n_gaps long, min_gap_secs double, "
        "median_gap_secs double, max_gap_secs double"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        gaps = np.diff(pdf["ts_us"].to_numpy()) / 1_000_000.0
        if len(gaps) == 0:
            return pd.DataFrame(
                {"user_id": pdf["user_id"].iloc[:1], "n_gaps": [0],
                 "min_gap_secs": [None], "median_gap_secs": [None], "max_gap_secs": [None]}
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(gaps)],
                "min_gap_secs": [float(np.min(gaps))],
                "median_gap_secs": [float(np.median(gaps))],
                "max_gap_secs": [float(np.max(gaps))],
            }
        )

    return events.groupBy("user_id").applyInPandas(stats, out_schema)


# ---------------------------------------------------------------------------
# q40 — trailing 7-row moving average with explicit ROWS BETWEEN frame
# ---------------------------------------------------------------------------
@query(
    "q40_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS rev_dec
      FROM events GROUP BY 1
    )
    SELECT day,
           CAST(rev_dec AS DOUBLE) AS daily_value,
           CAST(SUM(rev_dec) OVER (
                  ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                ) AS DOUBLE)
             / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS ma7
    FROM daily
    """,
)
def q40_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.col("value").cast(DEC)).alias("rev_dec")
    )
    # post-aggregate table is tiny (#days); single-task window is fine
    # at any input scale.
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("daily_value"),
        (F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w)).alias("ma7"),
    )
