"""Storage-maintenance operators: small-file compaction and
range-sorted ("poor man's Z-order") rewrites.

At 100 TB the table you READ is only as good as the files someone
WROTE: thousands of kilobyte-sized files from a streaming sink destroy
scan throughput (per-file open cost, tiny rowgroups, no effective
min/max pruning), and unsorted rowgroups make predicate pushdown
useless because every rowgroup's [min, max] spans the whole key domain.
These two rewrites are the standard maintenance passes:

- ``compact_parquet``: coalesce a directory into ~``target_mb`` files.
- ``sorted_write``: repartitionByRange + sortWithinPartitions on a key,
  so each output file covers a narrow, (mostly) disjoint key range and
  parquet rowgroup min/max statistics actually prune scans with
  ``WHERE key = ...`` / range predicates.

Both write to a NEW directory — at cluster scale the swap is a
transactional metadata operation (Delta/Iceberg replace, Hive partition
repoint); on a plain filesystem callers rename after validation.
Contents are preserved row-for-row (tests assert exact equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite ``in_path`` into ~``target_mb``-sized files at
    ``out_path``; returns the number of output partitions chosen.

    Partition count = ceil(input_bytes / target). Uses coalesce-free
    ``repartition`` so output files are evenly sized even when input
    files are wildly skewed (coalesce would just glue neighbors).
    """
    total = _dir_bytes(spark, in_path)
    n = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return n


def sorted_write(
    df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    num_files: int,
) -> None:
    """Range-partition on ``sort_cols`` and sort within each partition
    before writing: every output file then covers a narrow key range,
    so parquet min/max rowgroup stats prune point/range scans — the
    vanilla-Spark approximation of clustering/Z-ordering on one key
    dimension."""
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
