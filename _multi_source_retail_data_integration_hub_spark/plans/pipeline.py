"""Lazy E->T->L pipeline driver with the reference's validation gates.

Mirror of etl/pipeline.py:48-157 (stage orchestration + stats) and the
Airflow DAG's quality gates (dags/retail_etl_dag.py:251-437), with one
structural upgrade: stages hand each other *unevaluated DataFrames*
(Catalyst plans), so nothing is computed twice — the reference's DAG
re-runs extract+transform inside every task because pandas frames can't
cross task boundaries (dags/retail_etl_dag.py:290-297,369-377).

Gate thresholds are the DAG's own (dags/retail_etl_dag.py:327-332):
stg_retail_sales >= 100, dim_customer >= 10, dim_date >= 365,
fact_sales >= 100 — configurable for test fixtures. Counts for the
gates come from ONE pass: the tables are persisted before counting so
the subsequent writes reuse the gate computation instead of rebuilding
the lineage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd2 import SCD2_COLS, scd2_merge
from ..sources import sinks
from . import retail

# dimension -> (business key, surrogate key) for incremental SCD2 loads
SCD2_DIMS = {
    "dim_customer": ("customer_id", "customer_key"),
    "dim_product": ("api_product_id", "product_key"),
}


class PipelineGateError(RuntimeError):
    """A validation gate failed (AirflowFailException analogue)."""


# Airflow default_args analogue (dags/retail_etl_dag.py:74-76): each
# load task retries transient failures before failing the run.
RETRY_POLICY = {"retries": 2, "retry_delay_seconds": 0.0}


def with_retries(
    fn,
    retries: int = 2,
    retry_delay_seconds: float = 0.0,
    on_retry=None,
):
    """Run ``fn()`` under the DAG's task retry policy.

    Gate failures (PipelineGateError) are deterministic data-quality
    verdicts — retrying cannot change them, so they propagate
    immediately, exactly as AirflowFailException bypasses retries.
    Everything else (transient sink/executor errors) retries up to
    ``retries`` times with ``retry_delay_seconds`` between attempts.
    """
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except PipelineGateError:
            raise
        except Exception as exc:  # noqa: BLE001 - the retry boundary
            last = exc
            if attempt < retries:
                if on_retry is not None:
                    on_retry(attempt + 1, exc)
                time.sleep(retry_delay_seconds)
    assert last is not None
    raise last


DEFAULT_THRESHOLDS = {
    "stg_retail_sales": 100,
    "dim_customer": 10,
    "dim_date": 365,
    "fact_sales": 100,
}


@dataclass
class PipelineResult:
    counts: dict[str, int] = field(default_factory=dict)
    durations: dict[str, float] = field(default_factory=dict)
    status: str = "success"
    run_id: str = ""


def validate_extract(raw_sales: DataFrame) -> int:
    """Extract gate: retail rows > 0 hard-fails (retail_etl_dag.py:271-274)."""
    n = raw_sales.count()
    if n == 0:
        raise PipelineGateError("extract gate: retail source returned 0 rows")
    return n


def validate_transform(tables: dict[str, DataFrame], thresholds: dict[str, int]) -> dict[str, int]:
    """Transform gate: minimum row counts (retail_etl_dag.py:327-332)."""
    counts = {name: df.count() for name, df in tables.items()}
    failures = [
        f"{name}: {counts.get(name, 0)} < {min_rows}"
        for name, min_rows in thresholds.items()
        if counts.get(name, 0) < min_rows
    ]
    if failures:
        raise PipelineGateError("transform gate failed: " + "; ".join(failures))
    return counts


def validate_load(spark: SparkSession, database: str, tables: list[str]) -> None:
    """Load gate: every table non-empty post-write (retail_etl_dag.py:428-432)."""
    empty = [t for t in tables if spark.table(f"{database}.{t}").limit(1).count() == 0]
    if empty:
        raise PipelineGateError(f"load gate failed: empty tables {empty}")


def _scd2_merged_dim(
    spark: SparkSession, snapshot: DataFrame, name: str, database: str, run_ts: str
) -> DataFrame:
    """Merge a freshly-built dim snapshot into the stored SCD2 table.

    The snapshot arrives fully stamped (scd2_initial + surrogate keys
    from the build); the merge wants bare attributes, so bookkeeping and
    surrogate columns are stripped and reassigned by the operator.
    ``localCheckpoint`` materializes the merge before the overwrite —
    Spark refuses to overwrite a table that is still being read (at
    cluster scale: Delta MERGE or a temp-table swap instead).
    """
    business_key, surrogate_key = SCD2_DIMS[name]
    current = spark.table(f"{database}.{name}")
    incoming = snapshot.drop(*SCD2_COLS).drop(surrogate_key)
    merged = scd2_merge(
        current, incoming, business_key, run_ts, surrogate_key=surrogate_key
    )
    return merged.localCheckpoint(eager=True)


def run_pipeline(
    spark: SparkSession,
    raw_sales: DataFrame,
    raw_products: DataFrame,
    api_categories: DataFrame,
    database: str = "retail_dw",
    run_ts: str = "2024-01-01 00:00:00",
    thresholds: dict[str, int] | None = None,
    skip_load: bool = False,
    incremental: bool = False,
    log_retention_days: int | None = None,
) -> PipelineResult:
    """Extract -> transform -> gate -> load -> gate -> audit log.

    ``log_retention_days`` opts into the run-log retention post-stage:
    after the run's own audit row is appended, run-log rows older than
    the window are pruned (operators.maintenance.prune_run_log) — the
    analogue of the reference DAG's every-run ``cleanup_old_logs``
    task (/root/reference/dags/retail_etl_dag.py:637-645). Pruned
    count lands in ``result.counts['run_log_pruned']``.

    With ``incremental=True``, SCD2 dimensions that already exist in the
    warehouse are merged (expire/carry/insert, versions increment,
    surrogate keys preserved) instead of truncate-loaded — covering BOTH
    dim_customer and dim_product, where the reference only merges
    customer and silently truncates product (etl/load.py:376-379,
    SURVEY §2.9's flagged gap).
    """
    thresholds = DEFAULT_THRESHOLDS if thresholds is None else thresholds
    result = PipelineResult(run_id=sinks.current_run_id())
    t0 = time.perf_counter()

    rows_extracted = validate_extract(raw_sales)
    result.durations["extract"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    tables = retail.build_warehouse(raw_sales, raw_products, api_categories, run_ts=run_ts)

    if incremental and not skip_load:
        # Merge SCD2 dims BEFORE building the final fact/marts: the
        # merge preserves stored surrogate keys, so the snapshot-built
        # fact (whose row_number keys need not match) must be rebuilt
        # against the merged dims' CURRENT rows or its FKs would point
        # at wrong/expired dim versions.
        merged = False
        for name in SCD2_DIMS:
            if spark.catalog.tableExists(f"{database}.{name}"):
                tables[name] = _scd2_merged_dim(spark, tables[name], name, database, run_ts)
                merged = True
        if merged:
            from pyspark.sql import functions as F

            current_customer = tables["dim_customer"].where(F.col("is_current"))
            tables["fact_sales"] = retail.build_fact_sales(
                tables["stg_retail_sales"],
                current_customer,
                tables["dim_product_category"],
                run_ts,
            )
            tables["mart_sales_performance"] = retail.build_mart_sales_performance(
                tables["fact_sales"], tables["dim_date"], run_ts
            )
            tables["mart_category_analysis"] = retail.build_mart_category_analysis(
                tables["fact_sales"], tables["dim_product_category"], run_ts
            )

    # Persist before the gate counts so the writes below reuse the same
    # computed partitions instead of rebuilding each table's lineage.
    # Gate counts are taken on the tables actually written (post-merge).
    for df in tables.values():
        df.persist()
    try:
        result.counts = validate_transform(tables, thresholds)
        result.durations["transform"] = time.perf_counter() - t1

        if not skip_load:
            t2 = time.perf_counter()
            sinks.bootstrap_warehouse(spark, database)
            for name, df in tables.items():
                # each table write is one "task": transient failures
                # retry under the DAG policy, gate errors never do
                with_retries(
                    lambda df=df, name=name: sinks.write_warehouse_table(
                        df, name, database=database
                    ),
                    **RETRY_POLICY,
                )
            validate_load(spark, database, list(tables))
            sinks.append_run_log(
                spark,
                run_id=result.run_id,
                status="success",
                rows_extracted=rows_extracted,
                rows_loaded=sum(result.counts.values()),
                duration_seconds=time.perf_counter() - t0,
                database=database,
            )
            if log_retention_days is not None:
                from ..operators.maintenance import prune_run_log

                result.counts["run_log_pruned"] = prune_run_log(
                    spark, older_than_days=log_retention_days, database=database
                )
            result.durations["load"] = time.perf_counter() - t2
    finally:
        # release caches even when a gate or write fails — a retrying
        # driver would otherwise accumulate stale cached lineages
        for df in tables.values():
            df.unpersist()
    result.durations["total"] = time.perf_counter() - t0
    return result
