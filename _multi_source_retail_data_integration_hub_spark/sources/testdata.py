"""Readers for the driver-provided TPC-H-ish parquet testdata.

Tables (one parquet each, per /root/repo/TESTDATA.md):
``region nation customer supplier part orders lineitem events
documents embeddings``.

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; at cluster scale the same code reads partitioned table roots.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet stores ts as TIMESTAMP(NANOS); under
# spark.sql.legacy.parquet.nanosAsLong the column reads as bigint
# nanos. This schema + converter pair is THE single definition of that
# convention — batch (load_table) and streaming (streaming/jobs.py)
# readers both use it so they can never drift apart.
EVENTS_NANOS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_ts_from_nanos(df: DataFrame) -> DataFrame:
    """bigint-nanos ts -> TIMESTAMP via exact integer truncation to
    micros (``div``, not ``/`` — the double path loses precision at
    1e18 magnitudes). DuckDB performs the same nanos->micros
    truncation, keeping the oracles in lockstep."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # TIMESTAMP(NANOS) parquet, rejected by Spark's vectorized
        # reader — read nanos-as-long and convert (see EVENTS_NANOS_SCHEMA).
        # NOTE: this conf is session-wide and stays set (restoring it
        # mid-plan could break the deferred executor-side reads of this
        # very DataFrame); other nanos-timestamp parquet reads in the
        # same session will also see bigint nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = events_ts_from_nanos(df)
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
