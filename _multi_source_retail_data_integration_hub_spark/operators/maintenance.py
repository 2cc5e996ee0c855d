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

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def prune_run_log(
    spark: SparkSession,
    older_than_days: int = 30,
    database: str = "retail_dw",
    table: str = "etl_run_log",
    now: datetime | None = None,
) -> int:
    """S10 retention: drop run-log rows older than ``older_than_days``.

    Completes the audit-log lifecycle that ``sources.sinks
    .append_run_log`` starts — the analogue of the reference's
    scheduled ``cleanup_old_logs`` task
    (/root/reference/dags/retail_etl_dag.py:637-645), which deletes
    ``etl_run_log`` rows past a retention window so the audit table
    doesn't grow forever. Returns the number of rows removed.

    Implementation is a filter-rewrite (read survivors, checkpoint,
    overwrite): the plain-filesystem equivalent of the transactional
    ``DELETE WHERE completed_at < cutoff`` this becomes on a
    Delta/Iceberg warehouse. The checkpoint materializes the survivor
    set BEFORE the overwrite truncates the table being read — the same
    self-overwrite guard as ``plans.pipeline``'s SCD2 merge. Run logs
    are one row per pipeline run, so the rewrite is trivially small at
    any corpus scale. ``now`` pins the clock for deterministic tests.
    """
    full = f"{database}.{table}"
    cutoff = (now or datetime.now()) - timedelta(days=older_than_days)
    log = spark.table(full)
    total = log.count()
    # NULL completed_at = in-flight / failed-run rows with no finish
    # stamp: age unknown, so retention must NOT delete them (a bare
    # `>= cutoff` filter silently drops NULLs regardless of age)
    kept = log.where(
        (F.col("completed_at") >= F.lit(cutoff))
        | F.col("completed_at").isNull()
    ).localCheckpoint(eager=True)
    n_kept = kept.count()
    if n_kept < total:
        kept.write.mode("overwrite").saveAsTable(full)
    return total - n_kept


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


def _zvalue(cols: list[str], bits: int = 16) -> F.Column:
    """Interleaved-bits Morton code over pre-scaled integer columns
    (each already in [0, 2^bits)). Pure native Column arithmetic — the
    ~bits x dims term expression stays inside whole-stage codegen."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(F.col(c), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * n + d))
    return z


def zorder_write(
    df: DataFrame,
    out_path: str,
    cluster_cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustering rewrite: scale each cluster column
    to a ``bits``-wide integer rank, interleave the bits into a Morton
    (Z-order) value, then range-partition + sort on it. Each output
    file then covers a small hyper-rectangle of the cluster-key space,
    so parquet min/max statistics prune scans filtered on ANY of the
    cluster columns — where ``sorted_write`` only prunes its leading
    key. This is the standard lakehouse OPTIMIZE ZORDER BY pass,
    expressed in vanilla Spark.

    Column scaling is min-max (one aggregate pass over the input).
    Skewed columns cluster less evenly than a rank/quantile scaling
    would — acceptable for a maintenance rewrite whose worst case is
    weaker pruning, never wrong results. Timestamps and numerics are
    cast to double before scaling; the synthetic columns are dropped
    before write, so contents round-trip row-for-row.
    """
    if not cluster_cols:
        raise ValueError("zorder_write needs at least one cluster column")
    # the interleaved code must fit in 63 bits (bit 63 is the sign bit
    # and Spark's shiftleft wraps mod 64, which would corrupt the
    # ordering silently): with many dimensions, trade per-dimension
    # resolution for correctness
    bits = min(bits, 63 // len(cluster_cols))
    scaled_names: list[str] = []
    scaled = df
    bounds = df.agg(
        *[
            f
            for c in cluster_cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    ).first()
    top = (1 << bits) - 1
    for c in cluster_cols:
        lo, hi = bounds[f"__min_{c}"], bounds[f"__max_{c}"]
        if lo is None:  # empty input or all-NULL column: rank everything 0
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        name = f"__z_{c}"
        scaled_names.append(name)
        scaled = scaled.withColumn(
            name,
            F.least(
                F.lit(top),
                F.floor(
                    # NULL values rank 0 (lowest) instead of poisoning
                    # the Morton code to NULL and piling into one range
                    # partition
                    (F.coalesce(F.col(c).cast("double"), F.lit(lo)) - F.lit(lo))
                    / F.lit(span)
                    * top
                ).cast("int"),
            ),
        )
    scaled = scaled.withColumn("__zval", _zvalue(scaled_names, bits))
    (
        scaled.repartitionByRange(num_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval", *scaled_names)
        .write.mode("overwrite")
        .parquet(out_path)
    )


CHECKSUM_MOD = 2**31
CHECKSUM_NULL = "N"  # NULL marker; cannot collide with the length-prefixed form


def checksum_field_sql(field: str) -> str:
    """Canonical UNAMBIGUOUS rendering of one field for content
    checksums, valid in both Spark SQL and DuckDB:
    ``<length>:<value>`` for non-null values, the bare marker ``N``
    for NULL. The length prefix makes the rendering injection-proof —
    ('a|b','c') vs ('a','b|c') or a literal "N" vs a real NULL encode
    differently — where a plain separator-join would checksum-equal
    (r5 re-review finding). Ambiguity would need a value whose prefix
    mimics 'digits:'+itself, impossible since the digits are the
    EXACT length of what follows to the end of the field."""
    return (
        f"coalesce(concat(cast(length({field}) as string), ':', {field}), "
        f"'{CHECKSUM_NULL}')"
    )


def content_checksum(df: "DataFrame", fields: list[str]) -> "DataFrame":
    """Order-independent content fingerprint: one row with (n_rows,
    checksum), where checksum = SUM over rows of the first 32 md5 bits
    of a canonical rendering, mod 2^31 per term. Commutative +
    associative, so any partitioning / engine / row order yields the
    same number WITHOUT a global sort — snapshot, migration and
    replication equality checks at 100 TB cost one scan and a scalar
    per side (q129 is the registered multi-table surface).

    ``fields`` are SQL expressions producing STRINGS (cast integers,
    date_format dates; do NOT render raw floats — float-to-string is
    engine-specific). Each field renders length-prefixed via
    ``checksum_field_sql`` so separators, NULL markers or any other
    content inside values cannot alias a different row (NULL itself is
    position-distinct). BIGINT sum headroom holds past 1e9 rows; shard
    into k modular lanes beyond that.
    """
    rendered = "concat(" + ", '|', ".join(
        checksum_field_sql(f) for f in fields
    ) + ")"
    row_hash = F.pmod(
        F.conv(F.md5(F.expr(rendered)).substr(1, 8), 16, 10).cast("bigint"),
        F.lit(CHECKSUM_MOD),
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(row_hash).alias("checksum")
    )
