

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
