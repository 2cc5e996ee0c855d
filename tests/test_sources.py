

def test_events_ts_unit_rejects_unknown_encoding(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        events_parquet_ts_unit,
    )

    p = tmp_path / "events_ms.parquet"
    tbl = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ms"))})
    pq.write_table(tbl, p)
    with pytest.raises(ValueError, match="unsupported encoding"):
        events_parquet_ts_unit(str(p))

    # directory whose parts disagree on the unit must raise
    d = tmp_path / "events.parquet"
    d.mkdir()
    pq.write_table(pa.table({"ts": pa.array([1], type=pa.timestamp("us"))}), d / "a.parquet")
    pq.write_table(pa.table({"ts": pa.array([1], type=pa.timestamp("ns"))}), d / "b.parquet")
    with pytest.raises(ValueError, match="disagree"):
        events_parquet_ts_unit(str(d))


def test_file_format_round_trips(spark, tmp_path):
    """Every supported file format round-trips the same table: columnar
    (parquet/ORC) byte-faithfully with schema from the footer; JSON/CSV
    via explicit schema on the read side (the production contract)."""
    from _multi_source_retail_data_integration_hub_spark.sources import sinks

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        "id long, s string, v double",
    )
    want = sorted(map(tuple, df.collect()))
    for fmt in sinks.FILE_FORMATS:
        path = str(tmp_path / fmt)
        sinks.write_files(df, path, fmt)
        back = sinks.read_files(spark, path, fmt, schema=df.schema)
        assert back.schema == df.schema, fmt
        assert sorted(map(tuple, back.collect())) == want, fmt
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sinks.write_files(df, str(tmp_path / "x"), "avro")
