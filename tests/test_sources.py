

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


def test_observed_write_collects_metrics_in_one_pass(spark, tmp_path):
    """observed_write: the run-log numbers come from the write job
    itself (Observation API) — values match a separate aggregation but
    cost zero extra scans."""
    import pyspark.sql.functions as F

    from _multi_source_retail_data_integration_hub_spark.sources import sinks

    df = spark.range(0, 1_000).select(
        "id", (F.col("id") % 5).cast("double").alias("v")
    )
    out = str(tmp_path / "obs")
    got = sinks.observed_write(
        df,
        out,
        metrics={
            "n_rows": F.count(F.lit(1)),
            "sum_v": F.sum(F.col("v").cast("decimal(18,2)")).cast("double"),
            "n_null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
        },
    )
    assert got["n_rows"] == 1_000
    assert got["sum_v"] == 2_000.0  # 0+1+2+3+4 repeated 200x
    assert got["n_null_v"] == 0
    assert spark.read.parquet(out).count() == 1_000


def test_file_metadata_lineage_columns(spark, tmp_path):
    """with_file_lineage surfaces the scan's hidden _metadata struct:
    every row knows its input file — split-file writes must yield
    exactly the file set on disk, and re-written rows re-resolve."""
    import pyspark.sql.functions as F

    from _multi_source_retail_data_integration_hub_spark.sources.retail import (
        with_file_lineage,
    )

    p = str(tmp_path / "in")
    spark.range(0, 100).repartition(3).write.parquet(p)
    df = with_file_lineage(spark.read.parquet(p))
    files = {r._source_file for r in df.select("_source_file").distinct().collect()}
    import os

    on_disk = {
        "file:" + os.path.join(p, f)
        for f in os.listdir(p)
        if f.endswith(".parquet")
    }
    assert files == on_disk
    assert df.where(F.col("_source_mtime").isNull()).count() == 0


def test_json_scan_captures_corrupt_records(spark, tmp_path):
    """Ingestion robustness: malformed JSON lines land in the
    _corrupt_record column (PERMISSIVE mode) instead of failing the
    scan or being silently dropped — the dead-letter contract for a
    100 TB crawl ingest where some fraction of lines is always garbage."""
    import os

    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": "ok"}\n')
        f.write('{"id": 2, "v": "also ok"}\n')
        f.write('{"id": 3, "v": BROKEN\n')  # malformed line
    schema = "id long, v string, _corrupt_record string"
    df = spark.read.schema(schema).json(p)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and "BROKEN" in bad[0]._corrupt_record
    # FAILFAST is the strict alternative: same file must raise
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.schema("id long, v string").option("mode", "FAILFAST").json(
            p
        ).collect()


# ---------------------------------------------------------------------------
# sources/corpus.py — JSONL document-corpus interchange
# ---------------------------------------------------------------------------


def test_documents_jsonl_roundtrip_real_corpus(spark, tmp_path):
    from _multi_source_retail_data_integration_hub_spark.sources import corpus
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_jsonl")
    corpus.write_documents_jsonl(docs, out, compression="gzip", num_shards=4)
    back = corpus.clean_documents(corpus.read_documents_jsonl(spark, out))
    assert back.schema.simpleString() == docs.schema.simpleString()
    a = sorted(docs.collect(), key=lambda r: r.doc_id)
    b = sorted(back.collect(), key=lambda r: r.doc_id)
    assert a == b
    # gzip is not splittable: the writer must have sharded
    import glob

    assert len(glob.glob(out + "/part-*.json.gz")) == 4


def test_documents_jsonl_corrupt_quarantine(spark, tmp_path):
    from _multi_source_retail_data_integration_hub_spark.sources import corpus

    p = str(tmp_path / "dump.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("{TRUNCATED GARBAGE\n")
        f.write('{"doc_id": 2, "text": "fine", "lang": "de", "source": "s", "n_chars": 4}\n')
    df = corpus.read_documents_jsonl(spark, p)
    clean = corpus.clean_documents(df)
    bad = corpus.corrupt_documents(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "TRUNCATED" in bad_rows[0].raw_line
    assert bad_rows[0].doc_id is None  # declared cols ride along, null


def test_documents_jsonl_streaming_ingest_matches_batch(spark, tmp_path):
    """Streaming JSONL ingest (availableNow drain) produces exactly the
    batch reader's clean rows, and quarantines the same corrupt lines —
    one cleansing contract across both execution modes."""
    from _multi_source_retail_data_integration_hub_spark.sources import corpus
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )
    from _multi_source_retail_data_integration_hub_spark.streaming.jobs import (
        run_available_now,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    landing = str(tmp_path / "landing")
    corpus.write_documents_jsonl(docs, landing, compression="gzip", num_shards=3)
    # drop one malformed shard into the landing dir
    with open(landing + "/extra-malformed.json", "w") as f:
        f.write('{"doc_id": 900001, "text": "late arrival", "lang": "en", '
                '"source": "s", "n_chars": 12}\n')
        f.write("%%% NOT JSON %%%\n")
    stream = corpus.read_documents_jsonl_stream(
        spark, landing, max_files_per_trigger=2
    )
    assert stream.isStreaming
    run_available_now(stream, "jsonl_ingest", output_mode="append")
    got = spark.table("jsonl_ingest")
    clean = corpus.clean_documents(got)
    bad = corpus.corrupt_documents(got)
    batch = corpus.clean_documents(
        corpus.read_documents_jsonl(spark, landing)
    )
    assert sorted(clean.collect()) == sorted(batch.collect())
    assert clean.count() == docs.count() + 1  # the late-arrival row
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "NOT JSON" in bad_rows[0].raw_line


def test_streaming_gopher_gate_matches_batch(spark, tmp_path):
    """The Gopher quality gate (operators/text.py::gopher_rules) is a
    pure stateless projection, so it applies UNCHANGED to the
    streaming JSONL ingest — the "filter crawl dumps as they land"
    shape. An availableNow drain of the gated stream must produce
    exactly the batch gate's flag table: one quality contract across
    both execution modes."""
    from _multi_source_retail_data_integration_hub_spark.operators import text as T
    from _multi_source_retail_data_integration_hub_spark.sources import corpus
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )
    from _multi_source_retail_data_integration_hub_spark.streaming.jobs import (
        run_available_now,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    landing = str(tmp_path / "landing")
    corpus.write_documents_jsonl(docs, landing, compression=None, num_shards=2)

    stream = corpus.clean_documents(
        corpus.read_documents_jsonl_stream(spark, landing)
    )
    gated = T.gopher_rules(stream, "text", "doc_id")
    assert gated.isStreaming  # projection-only: no state, no watermark
    run_available_now(gated, "gopher_stream", output_mode="append")

    batch = T.gopher_rules(docs, "text", "doc_id")
    got = sorted(map(tuple, spark.table("gopher_stream").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) == docs.count()
