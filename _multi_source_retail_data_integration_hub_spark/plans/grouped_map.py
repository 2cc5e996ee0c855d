"""Grouped-map (applyInPandas) and explicit window-frame surfaces.

q39: per-user inter-event gap statistics. The registered query is a
fully JVM-side plan — LAG window for the gaps, then a grouped
min/max/count/percentile(0.5) — no Python in the hot path (Spark's
exact percentile interpolation is bit-identical to DuckDB MEDIAN and
numpy, verified empirically). ``user_gap_stats_grouped_map`` keeps the
equivalent applyInPandas construction as the grouped-map UDF exercise
(pandas DataFrame in, DataFrame out, one group per call);
tests/test_functions.py proves the two agree row-for-row.

q40: 7-row trailing moving average over daily revenue with an explicit
ROWS BETWEEN frame — the frame-spec window class the reference never
uses (SURVEY §2.6) but any trend dashboard wants.

Scale notes: q39 shuffles once on user_id (the window partition key
and the grouping key — one Exchange reused for both); q40's window
runs on the tiny post-aggregate daily table.
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
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = events.select(
        "user_id",
        ((F.col("ts_us") - F.lag("ts_us").over(w)) / 1_000_000.0).alias("gap_secs"),
    ).where(F.col("gap_secs").isNotNull())
    # users with a single event have no gaps and (like the SQL's WHERE)
    # produce no row at all.
    return gaps.groupBy("user_id").agg(
        F.count("gap_secs").alias("n_gaps"),
        F.min("gap_secs").alias("min_gap_secs"),
        F.percentile("gap_secs", F.lit(0.5)).alias("median_gap_secs"),
        F.max("gap_secs").alias("max_gap_secs"),
    )


def weighted_avg_grouped_agg(df: DataFrame, group_col: str, val_col: str, w_col: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF exercise: weight-averaged value per group.

    The UDAF class (pandas Series in, scalar out, usable in groupBy.agg
    and over windows) — kept as the API reference; production plans use
    the JVM twin ``sum(v*w)/sum(w)`` (two codegen'd aggregates, partial
    map-side combine), which tests/test_functions.py proves equal.
    """
    import pandas as pd  # noqa: PLC0415  (workers pickle this closure)
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return df.groupBy(group_col).agg(
        wavg(F.col(val_col), F.col(w_col)).alias("weighted_avg")
    )


def user_gap_stats_grouped_map(events: DataFrame) -> DataFrame:
    """applyInPandas twin of q39 (grouped-map UDF exercise).

    ``events`` needs columns (user_id, event_id, ts_us). Semantics match
    the native plan exactly, including dropping single-event users (no
    gaps => no output row, the HAVING-equivalent the SQL's WHERE
    expresses). Kept as the grouped-map reference implementation; the
    registered q39 is the JVM-native plan (~2x faster, no per-group
    pandas allocation).
    """
    out_schema = (
        "user_id long, n_gaps long, min_gap_secs double, "
        "median_gap_secs double, max_gap_secs double"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        gaps = np.diff(pdf["ts_us"].to_numpy()) / 1_000_000.0
        if len(gaps) == 0:
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "min_gap_secs": [],
                 "median_gap_secs": [], "max_gap_secs": []}
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


# ---------------------------------------------------------------------------
# q61 — purchase→error attribution. The REGISTERED plan is fully
# JVM-native: one shuffle on user_id feeds (a) a range-frame window that
# finds the latest purchase strictly before each error and (b) the
# per-user type counts; a hit is an error whose nearest preceding
# purchase is within the window (if the nearest is too far, every
# earlier one is farther — so the single running max suffices, no e⋈p
# range join, no quadratic blow-up). ``cogroup_timelines_grouped`` keeps
# the cogroup().applyInPandas construction as the cogrouped-map API
# exercise; tests/test_functions.py proves the two agree row-for-row
# (same treatment as q39's grouped-map twin).
# ---------------------------------------------------------------------------
ERR_WINDOW_US = 3600 * 1_000_000  # errors within 1 h after a purchase


@query(
    "q61_cogroup_timelines",
    oracle=f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'error'
    ),
    hits AS (
      SELECT e.user_id, e.ts_us
      FROM e JOIN p ON p.user_id = e.user_id
       AND e.ts_us > p.ts_us AND e.ts_us - p.ts_us <= {ERR_WINDOW_US}
      GROUP BY 1, 2
    ),
    base AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
      FROM events GROUP BY 1
    )
    SELECT b.user_id, b.n_purchases, b.n_errors,
           (SELECT COUNT(*) FROM hits h WHERE h.user_id = b.user_id)
             AS n_errors_after_purchase
    FROM base b
    WHERE b.n_purchases > 0 OR b.n_errors > 0
    """,
)
def q61_cogroup_timelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    tagged = events.where(F.col("event_type").isin("purchase", "error")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    # latest purchase STRICTLY before each row (rangeBetween end = -1 on
    # the microsecond axis excludes same-instant purchases, matching the
    # oracle's e.ts_us > p.ts_us)
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(
        Window.unboundedPreceding, -1
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    ).over(w)

    hits = (
        tagged.select("user_id", "event_type", "ts_us", last_purchase.alias("lp_us"))
        .where(
            (F.col("event_type") == "error")
            & F.col("lp_us").isNotNull()
            & (F.col("ts_us") - F.col("lp_us") <= ERR_WINDOW_US)
        )
        # hits are DISTINCT error instants (duplicate ts collapse), like
        # the oracle's GROUP BY user_id, ts_us
        .groupBy("user_id")
        .agg(F.count_distinct("ts_us").alias("n_errors_after_purchase"))
    )

    base = tagged.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    return base.join(hits, "user_id", "left").select(
        "user_id",
        "n_purchases",
        "n_errors",
        F.coalesce("n_errors_after_purchase", F.lit(0)).alias(
            "n_errors_after_purchase"
        ),
    )


def cogroup_timelines_grouped(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """cogroup().applyInPandas twin of q61 (cogrouped-map API exercise).

    ``purchases`` / ``errors`` need columns (user_id, ts_us). One pandas
    call per user aligns the two timelines with numpy searchsorted.
    Kept as the cogrouped-map reference implementation; the registered
    q61 is the JVM-native window plan (no Python in the hot path).
    tests/test_functions.py proves the pair agree row-for-row.
    """
    out_schema = (
        "user_id long, n_purchases long, n_errors long, "
        "n_errors_after_purchase long"
    )

    def compare(key, p_pdf: pd.DataFrame, e_pdf: pd.DataFrame) -> pd.DataFrame:
        p = np.sort(p_pdf["ts_us"].to_numpy(dtype=np.int64))
        e = np.unique(e_pdf["ts_us"].to_numpy(dtype=np.int64))
        if len(p) and len(e):
            # an error counts if ANY purchase precedes it within the window;
            # searchsorted finds the nearest purchase strictly before each error
            idx = np.searchsorted(p, e, side="left") - 1
            ok = idx >= 0
            hits = int(np.count_nonzero(ok & (e - p[np.clip(idx, 0, None)] <= ERR_WINDOW_US)))
        else:
            hits = 0
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(p)],
                "n_errors": [len(e_pdf)],
                "n_errors_after_purchase": [hits],
            }
        )

    return purchases.groupBy("user_id").cogroup(errors.groupBy("user_id")).applyInPandas(
        compare, out_schema
    )


def word_positions_udtf():
    """Python UDTF exercise (Spark 4 API class: one input row -> many
    typed output rows, usable from both DataFrame code and
    ``spark.sql`` after ``spark.udtf.register``). Completes the Python
    API matrix alongside scalar pandas UDF / grouped map / cogrouped
    map / grouped agg / map_in_pandas / stateful.

    NOT a hot-path operator: tokenization stays on the JVM everywhere
    it matters (operators/text.py's posexplode+split plan) — the test
    proves this UDTF is row-for-row equivalent to that native plan,
    the same treatment as the other API exercises in this module.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class WordPositions:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    return WordPositions
