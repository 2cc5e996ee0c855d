"""The engine is drivable through plain ``spark.sql`` over the
registered testdata views (sources/testdata.py::register_views), not
just the DataFrame API — a user porting ANSI-SQL workloads needs the
SQL-string path to produce identical results and identical plans."""

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
    register_views,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sql_string_matches_dataframe_plan(spark):
    register_views(spark, SF_DIR)
    sql_result = spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_revenue
        FROM orders
        GROUP BY 1 ORDER BY 1
        """
    ).collect()
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    df_result = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("year")
        .collect()
    )
    assert [r.asDict() for r in sql_result] == [r.asDict() for r in df_result]


def test_sql_joins_and_windows_over_views(spark):
    register_views(spark, SF_DIR)
    rows = spark.sql(
        """
        WITH monthly AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                 CAST(month(o_orderdate) AS BIGINT) AS month,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        )
        SELECT year, month, rev,
               LAG(rev) OVER (ORDER BY year, month) AS prev_rev
        FROM monthly ORDER BY year, month
        """
    ).collect()
    assert len(rows) > 0
    # the LAG chain is consistent: row N's prev_rev == row N-1's rev
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_rev"] == prev["rev"]


def test_pipe_syntax_matches_dataframe_plan(spark):
    """Spark 4 SQL pipe syntax (FROM ... |> WHERE ... |> AGGREGATE)
    produces exactly the classic plan's results."""
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders_pipe_v")
    piped = spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    ).collect()
    import pyspark.sql.functions as F

    want = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [tuple(r) for r in piped] == [tuple(r) for r in want]


def test_q119_streak_depth_guard(spark, tmp_path):
    """max_depth guards the recursive-CTE streak query: the recursion
    runs one job per level with depth = longest streak, so a
    pathological corpus (a 10k-day streak) must fail fast after ONE
    window pass instead of launching 10k jobs. Within the cap the
    result is unchanged."""
    import datetime as dt

    import pytest

    from _multi_source_retail_data_integration_hub_spark.plans.events_ts import (
        q119_purchase_streaks,
    )

    rows = []
    # user 1: a 6-day streak; user 2: two singleton days
    for i in range(6):
        rows.append((1, dt.datetime(2024, 1, 1 + i, 12, 0), "purchase", i, 1.0))
    rows.append((2, dt.datetime(2024, 1, 1, 9, 0), "purchase", 100, 1.0))
    rows.append((2, dt.datetime(2024, 1, 5, 9, 0), "purchase", 101, 1.0))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long, value double"
    )
    sf = str(tmp_path / "sf")
    events.write.mode("overwrite").parquet(sf + "/events.parquet")

    # over the cap: refuses before any recursive job
    with pytest.raises(ValueError, match="longest streak is 6"):
        q119_purchase_streaks(spark, sf, max_depth=3)
    # within the cap: identical to the guard-skipped (max_depth=None) run
    got = {r.user_id: r for r in q119_purchase_streaks(spark, sf, max_depth=10).collect()}
    assert got[1].longest_streak == 6 and got[1].n_streaks == 1
    assert got[2].longest_streak == 1 and got[2].n_streaks == 2
    unguarded = {
        r.user_id: r
        for r in q119_purchase_streaks(spark, sf, max_depth=None).collect()
    }
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in unguarded.items()
    }

    # the DRIVER path (default args — exactly how the registry invokes
    # it) must be guarded (r10 verdict): a synthetic 500-day streak
    # trips the default effective cap — min(max_depth=400, engine
    # recursion limit - 1), i.e. 99 under the stock limit of 100 —
    # after ONE islands-window pass, never launching the ~500
    # sequential recursive jobs
    bot = spark.createDataFrame(
        [
            (3, dt.datetime(2023, 1, 1, 8, 0) + dt.timedelta(days=i), "purchase", 1000 + i, 1.0)
            for i in range(500)
        ],
        "user_id long, ts timestamp, event_type string, event_id long, value double",
    )
    sf_bot = str(tmp_path / "sf_bot")
    bot.write.mode("overwrite").parquet(sf_bot + "/events.parquet")
    with pytest.raises(ValueError, match="longest streak is 500"):
        q119_purchase_streaks(spark, sf_bot)
    # even a generous max_depth must not escape into the engine's own
    # recursion-level error: the guard enforces the tighter of
    # max_depth and the live spark.sql.cteRecursionLevelLimit
    with pytest.raises(ValueError, match="cteRecursionLevelLimit"):
        q119_purchase_streaks(spark, sf_bot, max_depth=10_000)
