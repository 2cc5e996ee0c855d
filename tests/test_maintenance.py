"""Storage maintenance (operators/maintenance.py): compaction reduces
file counts without changing contents; sorted writes produce disjoint
per-file key ranges that enable rowgroup pruning."""

import glob
import os

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators import maintenance


def _parquet_files(path):
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small_files")
    # simulate a streaming sink's many tiny files
    spark.range(0, 10_000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(src)
    assert len(_parquet_files(src)) == 40

    out = str(tmp_path / "compacted")
    n = maintenance.compact_parquet(spark, src, out, target_mb=128)
    assert n == 1  # tiny input -> one target-sized file
    assert len(_parquet_files(out)) == 1
    before = spark.read.parquet(src)
    after = spark.read.parquet(out)
    assert after.count() == 10_000
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_sorted_write_gives_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "sorted")
    df = spark.range(0, 10_000).select(
        (F.xxhash64("id") % 10_000).alias("key"), F.col("id").alias("v")
    )
    maintenance.sorted_write(df, out, ["key"], num_files=8)
    files = _parquet_files(out)
    assert len(files) == 8
    # per-file [min, max] ranges must not overlap (range partitioning)
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).agg(
            F.min("key").alias("lo"), F.max("key").alias("hi")
        ).collect()[0]
        if pdf["lo"] is not None:
            ranges.append((pdf["lo"], pdf["hi"]))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next
    # contents preserved
    assert spark.read.parquet(out).count() == 10_000


def test_prune_run_log_retention(spark):
    from datetime import datetime, timedelta

    from _multi_source_retail_data_integration_hub_spark.sources.sinks import (
        RUN_LOG_SCHEMA,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS prune_dw")
    spark.sql("DROP TABLE IF EXISTS prune_dw.etl_run_log")
    now = datetime(2026, 8, 14, 12, 0, 0)
    rows = [
        ("old1", "success", 10, 10, 1.0, now - timedelta(days=40)),
        ("old2", "failed", 10, 0, 1.0, now - timedelta(days=31)),
        ("new1", "success", 10, 10, 1.0, now - timedelta(days=5)),
        ("edge", "success", 10, 10, 1.0, now - timedelta(days=30)),  # at cutoff: kept
    ]
    spark.createDataFrame(rows, RUN_LOG_SCHEMA).write.mode("overwrite").saveAsTable(
        "prune_dw.etl_run_log"
    )
    deleted = maintenance.prune_run_log(
        spark, older_than_days=30, database="prune_dw", now=now
    )
    assert deleted == 2
    left = {r.run_id for r in spark.table("prune_dw.etl_run_log").collect()}
    assert left == {"new1", "edge"}
    # idempotent when nothing is out of retention
    assert (
        maintenance.prune_run_log(spark, older_than_days=30, database="prune_dw", now=now)
        == 0
    )
    spark.sql("DROP TABLE prune_dw.etl_run_log")
    spark.sql("DROP DATABASE prune_dw")


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order must give per-file locality on BOTH cluster columns; a
    single-key sort gives locality only on its leading key (the
    trailing column spans ~the whole domain in every file)."""
    zdir, sdir = str(tmp_path / "zorder"), str(tmp_path / "single")
    # two independent uniform dimensions
    df = spark.range(0, 20_000).select(
        (F.xxhash64("id") % 1_000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1_000).alias("y"),
        F.col("id").alias("payload"),
    )
    maintenance.zorder_write(df, zdir, ["x", "y"], num_files=16)
    maintenance.sorted_write(df, sdir, ["x"], num_files=16)

    def mean_span(path: str, col: str) -> float:
        spans = []
        for f in _parquet_files(path):
            r = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            if r["lo"] is not None:
                spans.append((r["hi"] - r["lo"]) / 2_000.0)  # domain ~[-1000, 1000)
        return sum(spans) / len(spans)

    # z-order: each file covers a modest fraction of each dimension
    assert mean_span(zdir, "x") < 0.6
    assert mean_span(zdir, "y") < 0.6
    # single-key sort: trailing dimension is unclustered (~full span)
    assert mean_span(sdir, "y") > 0.8
    # contents and schema round-trip (synthetic columns dropped)
    z = spark.read.parquet(zdir)
    assert set(z.columns) == {"x", "y", "payload"}
    assert z.count() == 20_000
    assert z.agg(F.sum("payload")).first()[0] == sum(range(20_000))


def test_prune_run_log_keeps_unstamped_rows(spark):
    """NULL completed_at = in-flight/failed-run rows of unknown age:
    retention must never delete them."""
    import datetime as dt

    import pyspark.sql.functions as F

    from _multi_source_retail_data_integration_hub_spark.operators.maintenance import (
        prune_run_log,
    )
    from _multi_source_retail_data_integration_hub_spark.sources.sinks import (
        RUN_LOG_SCHEMA,
    )

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS prune_null_db")
    spark.sql("DROP TABLE IF EXISTS prune_null_db.etl_run_log")
    # catalog entries die with the session but warehouse dirs persist:
    # a leftover location blocks saveAsTable on a fresh session
    shutil.rmtree("spark-warehouse/prune_null_db.db/etl_run_log", ignore_errors=True)
    now = dt.datetime(2026, 8, 14, 12, 0, 0)
    rows = [
        ("old", "success", 1, 1, 1.0, now - dt.timedelta(days=40)),
        ("new", "success", 1, 1, 1.0, now - dt.timedelta(days=1)),
        ("inflight", "running", 0, 0, 0.0, None),
    ]
    spark.createDataFrame(rows, RUN_LOG_SCHEMA).write.mode("overwrite").saveAsTable(
        "prune_null_db.etl_run_log"
    )
    deleted = prune_run_log(
        spark, older_than_days=30, database="prune_null_db", now=now
    )
    assert deleted == 1  # only the 40-day-old stamped row
    left = {r.run_id for r in spark.table("prune_null_db.etl_run_log").collect()}
    assert left == {"new", "inflight"}


def test_zorder_write_many_dims_and_degenerate_inputs(spark, tmp_path):
    """4+ cluster columns must not overflow the 63-bit Morton code
    (z-values stay non-negative, resolution auto-reduces), and empty /
    all-NULL inputs must not crash."""
    import pyspark.sql.functions as F

    from _multi_source_retail_data_integration_hub_spark.operators.maintenance import (
        _zvalue,
        zorder_write,
    )

    df = spark.range(0, 2_000).select(
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 11).alias("b"),
        (F.col("id") % 13).alias("c"),
        (F.col("id") % 17).alias("d"),
        F.col("id").alias("payload"),
    )
    out4 = str(tmp_path / "z4")
    zorder_write(df, out4, ["a", "b", "c", "d"], num_files=4)
    back = spark.read.parquet(out4)
    assert back.count() == 2_000
    assert set(back.columns) == {"a", "b", "c", "d", "payload"}
    # the interleaved code itself never goes negative at reduced bits
    z = df.select(
        *[
            F.least(F.lit((1 << 15) - 1), F.col(c).cast("int")).alias(f"__z_{c}")
            for c in ("a", "b", "c", "d")
        ]
    ).select(_zvalue(["__z_a", "__z_b", "__z_c", "__z_d"], 63 // 4).alias("z"))
    assert z.where(F.col("z") < 0).count() == 0

    # empty input: no crash, empty output dir readable
    empty = df.where(F.lit(False))
    out_e = str(tmp_path / "ze")
    zorder_write(empty, out_e, ["a", "b"], num_files=2)
    assert spark.read.parquet(out_e).count() == 0

    # all-NULL cluster column: rows survive, single rank
    nulls = spark.range(0, 10).select(
        F.lit(None).cast("double").alias("a"), F.col("id").alias("payload")
    )
    out_n = str(tmp_path / "zn")
    zorder_write(nulls, out_n, ["a"], num_files=2)
    assert spark.read.parquet(out_n).count() == 10


def test_content_checksum_null_and_order_semantics(spark):
    """The equality-primitive contract: (a) identical content under any
    row order / partitioning gives identical checksums; (b) NULL
    fields are position-distinct (('a',NULL,'b') != ('a','b',NULL));
    (c) the value matches DuckDB computing the same rendering — the
    cross-engine property q129's oracle relies on."""
    import duckdb

    from _multi_source_retail_data_integration_hub_spark.operators.maintenance import (
        CHECKSUM_MOD,
        CHECKSUM_NULL,
        content_checksum,
    )

    rows = [(1, "a", None), (2, None, "b"), (3, "x", "y")]
    df = spark.createDataFrame(rows, "k int, u string, v string")
    fields = ["CAST(k AS STRING)", "u", "v"]
    a = content_checksum(df, fields).first()
    b = content_checksum(df.repartition(7).orderBy("v"), fields).first()
    assert (a.n_rows, a.checksum) == (b.n_rows, b.checksum) == (3, a.checksum)

    # position sensitivity: swapping which field is NULL changes the sum
    swapped = spark.createDataFrame(
        [(1, None, "a"), (2, "b", None), (3, "x", "y")], "k int, u string, v string"
    )
    c = content_checksum(swapped, fields).first()
    assert c.checksum != a.checksum

    def duck_render(c):
        return (
            f"COALESCE(CAST(length({c}) AS VARCHAR) || ':' || {c}, "
            f"'{CHECKSUM_NULL}')"
        )

    want = duckdb.connect().execute(
        f"""
        SELECT COUNT(*), SUM(CAST('0x' || substr(md5(
                 {duck_render("CAST(k AS VARCHAR)")} || '|' ||
                 {duck_render('u')} || '|' ||
                 {duck_render('v')}), 1, 8) AS BIGINT) % {CHECKSUM_MOD})
        FROM (VALUES (1,'a',NULL), (2,NULL,'b'), (3,'x','y')) t(k,u,v)
        """
    ).fetchone()
    assert (a.n_rows, a.checksum) == want

    # injection resistance: separator inside a value, and a literal
    # NULL-marker string, must NOT alias differently-shaped content
    inj1 = spark.createDataFrame([(1, "a|b", "c")], "k int, u string, v string")
    inj2 = spark.createDataFrame([(1, "a", "b|c")], "k int, u string, v string")
    assert (
        content_checksum(inj1, fields).first().checksum
        != content_checksum(inj2, fields).first().checksum
    )
    litN = spark.createDataFrame([(1, "N", "x")], "k int, u string, v string")
    realN = spark.createDataFrame([(1, None, "x")], "k int, u string, v string")
    assert (
        content_checksum(litN, fields).first().checksum
        != content_checksum(realN, fields).first().checksum
    )
