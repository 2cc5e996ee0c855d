"""Transactional (Delta Lake) twins of the pure-DataFrame SCD2 merge
and the incremental-mart refresh — the in-place upgrade path when a
deployment has a lakehouse catalog.

The engine's default implementations are storage-agnostic
stage-then-swap (operators/scd2.py, plans/incremental.py,
streaming/jobs.py::apply_mart_batch) because this container has no
transactional table format. On a real cluster with Delta available,
the SAME logical operations become single ``MERGE INTO`` statements
with optimistic-concurrency commit — the direct analogue of the
reference's two BigQuery statements (/root/reference/etl/load.py:
277-308: an UPDATE end-dating changed current rows + an INSERT guarded
by NOT EXISTS), collapsed into one atomic command per batch.

Everything here is import-gated: ``require_delta()`` raises a clear
error when the ``delta-spark`` package (public PyPI) is absent, and
the test module skips via ``pytest.importorskip("delta")``. The
session must be built with the standard public Delta wiring::

    from delta import configure_spark_with_delta_pip
    builder = (SparkSession.builder
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    spark = configure_spark_with_delta_pip(builder).getOrCreate()

Scale notes (why MERGE is the right physical shape at 100 TB):

- Both merges shuffle on the business/mart key only; Delta's file
  skipping + dynamic file pruning means a daily-churn staging batch
  touches only the files holding matched keys, not the whole
  dimension/mart.
- The SCD2 merge uses the classic dual-row staging trick so ONE pass
  both expires and inserts — no second scan of the dimension.
- The mart merge's UPDATE arithmetic is the identical commutative-
  monoid cell combine as plans/incremental.py::merge_partials, so the
  Delta path and the stage-then-swap path are result-identical by
  construction (the equivalence test asserts it where Delta exists).
- Exactly-once for streaming callers comes from Delta's
  txnAppId/txnVersion commit properties — the model that
  streaming/jobs.py::apply_mart_batch reimplements on plain tables
  with staging-rename + table properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scd2 import END_OF_TIME, SCD2_COLS


def delta_available() -> bool:
    try:
        import delta  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def require_delta():
    """Return the ``delta`` module or raise with install guidance."""
    try:
        import delta  # noqa: PLC0415

        return delta
    except ImportError as exc:  # pragma: no cover - exercised off-container
        raise ImportError(
            "delta-spark is not installed; the transactional MERGE twins "
            "need it (pip install delta-spark) plus a Delta-enabled "
            "SparkSession. Use operators/scd2.py / plans/incremental.py "
            "(the storage-agnostic defaults) otherwise."
        ) from exc


def scd2_initial_delta(
    table: str,
    incoming: DataFrame,
    effective_ts,
    start_col: str | None = None,
) -> None:
    """First-load fast path: write the stamped snapshot as a Delta table
    (same bookkeeping as operators/scd2.py::scd2_initial)."""
    require_delta()
    from .scd2 import scd2_initial  # noqa: PLC0415

    scd2_initial(incoming, effective_ts, start_col).write.format("delta").mode(
        "overwrite"
    ).saveAsTable(table)


def scd2_merge_staging(
    current: DataFrame,
    incoming: DataFrame,
    business_key: str,
    hash_col: str = "row_hash",
) -> DataFrame:
    """The dual-row staging frame feeding the SCD2 ``MERGE INTO``
    (pure DataFrame logic — testable without Delta installed):

    - one EXPIRE-leg row per incoming row (``_merge_key`` = key,
      ``_new_version`` NULL) — matches the active row; the MATCHED
      branch expires it only when the hash differs;
    - one INSERT-leg row per changed-or-new key (``_merge_key`` NULL,
      ``_new_version`` = max(prior)+1) — never matches, so the
      NOT MATCHED branch inserts the new version. Re-sent identical
      rows produce no insert leg (the reference's NOT EXISTS guard,
      /root/reference/etl/load.py:291-298).
    """
    attr_cols = list(incoming.columns)
    active = current.filter(F.col("is_current"))
    to_insert = incoming.join(
        active.select(business_key, hash_col), [business_key, hash_col], "left_anti"
    )
    prev_version = current.groupBy(business_key).agg(
        F.max("version").alias("_prev_version")
    )
    to_insert = to_insert.join(prev_version, business_key, "left").withColumn(
        "_new_version", F.coalesce(F.col("_prev_version"), F.lit(0)) + 1
    )
    return (
        incoming.select(
            F.col(business_key).alias("_merge_key"),
            *[F.col(c) for c in attr_cols],
            F.lit(None).cast("int").alias("_new_version"),
        )
    ).unionByName(
        to_insert.select(
            F.lit(None).cast(dict(incoming.dtypes)[business_key]).alias("_merge_key"),
            *[F.col(c) for c in attr_cols],
            F.col("_new_version").cast("int"),
        )
    )


def scd2_merge_sql(
    table: str,
    view: str,
    business_key: str,
    effective_ts,
    attr_cols: list[str],
    hash_col: str = "row_hash",
) -> str:
    """The MERGE statement paired with ``scd2_merge_staging`` (string
    builder — testable without Delta installed)."""
    eff = "CAST('{0}' AS TIMESTAMP)".format(effective_ts)
    insert_cols = ", ".join([*attr_cols, *SCD2_COLS])
    insert_vals = ", ".join(
        [f"s.{c}" for c in attr_cols]
        + [eff, f"CAST('{END_OF_TIME}' AS TIMESTAMP)", "true", "s._new_version"]
    )
    return f"""
        MERGE INTO {table} t
        USING {view} s
        ON t.{business_key} = s._merge_key AND t.is_current
        WHEN MATCHED AND t.{hash_col} <> s.{hash_col} THEN UPDATE SET
            t.effective_end_date = {eff},
            t.is_current = false
        WHEN NOT MATCHED AND s._new_version IS NOT NULL
            THEN INSERT ({insert_cols}) VALUES ({insert_vals})
        """


def scd2_merge_delta(
    spark: SparkSession,
    table: str,
    incoming: DataFrame,
    business_key: str,
    effective_ts,
    hash_col: str = "row_hash",
) -> None:
    """SCD2 expire + insert as ONE ``MERGE INTO`` on a Delta table.

    Semantics are identical to operators/scd2.py::scd2_merge (version
    increments per key; changed rows expire AT the new version's
    effective timestamp, contiguous timeline) — asserted equivalent by
    tests/test_delta_merge.py where Delta is importable.

    The dual-row staging trick: each staging row appears twice —

    - ``_merge_key = business_key``: matches the current row; if the
      hash differs, the MATCHED branch expires it in place.
    - ``_merge_key = NULL`` (only for changed/new keys): matches
      nothing, so the NOT MATCHED branch inserts the new version.

    One command, one dimension scan, atomic commit; concurrent writers
    serialize via Delta's optimistic concurrency instead of this
    module's plain-table staging-rename protocol.
    """
    require_delta()
    staged = scd2_merge_staging(spark.table(table), incoming, business_key, hash_col)
    view = f"_scd2_staged_{table.replace('.', '_')}"
    staged.createOrReplaceTempView(view)
    try:
        spark.sql(
            scd2_merge_sql(
                table, view, business_key, effective_ts,
                list(incoming.columns), hash_col,
            )
        )
    finally:
        spark.catalog.dropTempView(view)


def merge_mart_delta(
    spark: SparkSession,
    table: str,
    delta_partials: DataFrame,
    keys: list[str],
    merges: dict[str, str],
) -> None:
    """Incremental-mart refresh as ``MERGE INTO``: cell-wise combine of
    partial aggregate state (plans/incremental.py::merge_partials
    semantics — counts/sums add, extrema take LEAST/GREATEST; groups
    new to the delta insert). Each refresh costs O(|delta| + matched
    files), never a history rescan."""
    require_delta()
    combine = {
        "sum": "t.{c} + s.{c}",
        "min": "LEAST(t.{c}, s.{c})",
        "max": "GREATEST(t.{c}, s.{c})",
    }
    unknown = [op for op in merges.values() if op not in combine]
    if unknown:
        raise ValueError(
            f"merge_mart_delta: unknown combine op(s) {unknown}; supported: "
            f"{sorted(combine)} (avg is not mergeable — store sum+count)"
        )
    view = f"_mart_delta_{table.replace('.', '_')}"
    delta_partials.createOrReplaceTempView(view)
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    updates = ", ".join(
        f"t.{c} = {combine[op].format(c=c)}" for c, op in merges.items()
    )
    cols = ", ".join([*keys, *merges])
    vals = ", ".join(f"s.{c}" for c in [*keys, *merges])
    try:
        spark.sql(
            f"""
            MERGE INTO {table} t
            USING {view} s
            ON {on}
            WHEN MATCHED THEN UPDATE SET {updates}
            WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})
            """
        )
    finally:
        spark.catalog.dropTempView(view)
