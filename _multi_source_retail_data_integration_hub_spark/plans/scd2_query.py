"""Oracle-checked SCD Type 2 merge (SURVEY §2.9 — the reference's one
nontrivial composite operator, /root/reference/etl/load.py:259-299).

The pytest scenario suite + hypothesis state machine cover the operator
edge cases; this query puts the WHOLE merge under the driver's DuckDB
differential gate as well: two deterministic snapshots are derived from
the ``customer`` table (balance bump for every 10th key, brand-new keys
for every 100th), merged with literal effective timestamps so every
output column — versions, currency flags, validity intervals — is
bit-reproducible, and the oracle replays the expected final dimension
state declaratively (unchanged keep v1-current; changed split into an
expired v1 with a contiguous end date and a current v2; new keys arrive
as v1-current at the second load date).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd2 import scd2_initial, scd2_merge
from ..sources.testdata import load_table
from .registry import query

T1 = "2024-01-01 00:00:00"
T2 = "2024-06-01 00:00:00"
EOT = "9999-12-31 00:00:00"


def _hash(bal) -> F.Column:
    # equality-only token: exact integer cents, never a float rendering
    return (bal * 100).cast("bigint").cast("string")


@query(
    "q77_scd2_merge",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer
    )
    SELECT c_custkey,
           CAST(bal AS DOUBLE) AS acctbal,
           CAST(1 AS INT) AS version, TRUE AS is_current,
           '{T1}' AS valid_from,
           '{EOT}' AS valid_to
    FROM c WHERE c_custkey % 10 != 0
    UNION ALL
    SELECT c_custkey, CAST(bal AS DOUBLE), CAST(1 AS INT), FALSE,
           '{T1}', '{T2}'
    FROM c WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, CAST(bal + 100 AS DOUBLE), CAST(2 AS INT), TRUE,
           '{T2}', '{EOT}'
    FROM c WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey + 1000000, CAST(0.00 AS DOUBLE), CAST(1 AS INT), TRUE,
           '{T2}', '{EOT}'
    FROM c WHERE c_custkey % 100 = 0
    """,
)
def q77_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    snap1 = cust.withColumn("row_hash", _hash(F.col("bal")))
    # materialize both merge inputs (r13 s3, guide §2.4): scd2_merge
    # references ``current`` 3x and ``incoming`` 2x (active alone 4x),
    # and with both derived from transforms here the executed plan
    # scanned customer 13 TIMES. In production they are stored tables;
    # the two checkpoints make that contract true in-process — the
    # merge's joins then read materialized blocks, and customer is
    # scanned 3x total (dim once, snap2's bump+arrivals legs).
    dim = scd2_initial(snap1, T1).localCheckpoint()

    bumped = cust.withColumn(
        "bal",
        F.when(F.col("c_custkey") % 10 == 0, F.col("bal") + 100)
        .otherwise(F.col("bal"))
        .cast("decimal(18,2)"),
    )
    arrivals = cust.where(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.lit(0).cast("decimal(18,2)").alias("bal"),
    )
    snap2 = bumped.unionByName(arrivals).withColumn(
        "row_hash", _hash(F.col("bal"))
    ).localCheckpoint()

    merged = scd2_merge(dim, snap2, "c_custkey", T2)
    # validity bounds as formatted strings: the 9999-12-31 open-end
    # sentinel overflows pandas' ns timestamps in the comparison harness
    fmt = "yyyy-MM-dd HH:mm:ss"
    return merged.select(
        "c_custkey",
        F.col("bal").cast("double").alias("acctbal"),
        F.col("version").cast("int").alias("version"),
        "is_current",
        F.date_format("effective_start_date", fmt).alias("valid_from"),
        F.date_format("effective_end_date", fmt).alias("valid_to"),
    )
