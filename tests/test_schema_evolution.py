"""Ingestion robustness: schema evolution across parquet batches.

At 100 TB a table's files span months of producer versions; the engine
must read old+new batches together (mergeSchema) with missing columns
null-filled, and explicit-schema reads must stay stable when producers
ADD columns the pipeline doesn't know yet."""

from pyspark.sql import functions as F


def test_merge_schema_unions_columns(spark, tmp_path):
    base = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None  # old batch null-fills the new column
    assert rows[2]["score"] == 9.5


def test_explicit_schema_ignores_added_columns(spark, tmp_path):
    # a pipeline pinned to an explicit schema keeps working when the
    # producer adds columns: extra columns are simply not read
    path = str(tmp_path / "wide")
    spark.createDataFrame(
        [(1, "a", "surprise")], "id long, name string, extra string"
    ).write.parquet(path)
    df = spark.read.schema("id long, name string").parquet(path)
    assert df.columns == ["id", "name"]
    assert df.collect() == [(1, "a")]
    # and the scan only reads the pinned columns (pruning)
    plan = df.select("id").where(F.col("id") > 0)._jdf.queryExecution()
    assert "extra" not in plan.executedPlan().toString()
