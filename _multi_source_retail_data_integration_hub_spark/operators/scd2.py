"""Generic pure-DataFrame SCD Type 2 merge (SURVEY §2.9).

The reference implements expire/insert as two BigQuery SQL statements
(etl/load.py:277-299): an UPDATE that end-dates changed current rows and
an INSERT guarded by NOT EXISTS on (business_key, row_hash, is_current).
Here the same semantics are a single declarative union of three branches
— no mutable table required, works on any storage:

    merged = history (already-expired rows, untouched)
           ∪ current ∖ changed            (still-current rows)
           ∪ expire(current ∩ changed)    (end-dated versions)
           ∪ new versions from staging    (changed + brand-new keys)

Improvements over the reference, both flagged in SURVEY §2.9:
- ``version`` increments per key (reference hardcodes 1).
- changed rows are expired AT the new version's effective timestamp so
  the validity timeline is contiguous (reference stamps
  CURRENT_TIMESTAMP() leaving gaps/overlaps).

Scale notes: all joins key on the business key, so the shuffle
partitioning from the first join is reused; the changed-keys set is
tiny relative to the dimension and Catalyst/AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "9999-12-31 00:00:00"

SCD2_COLS = ("effective_start_date", "effective_end_date", "is_current", "version")


def scd2_initial(incoming: DataFrame, effective_ts, start_col: str | None = None) -> DataFrame:
    """First-load fast path (etl/load.py:259-270): stamp SCD2 bookkeeping
    columns on a fresh dimension snapshot. ``start_col`` optionally names
    a column to use as effective start (the reference uses
    first_purchase_date for customers, etl/transform.py:193)."""
    # cast start_col too: a DATE-typed source column would make
    # effective_start_date DateType on first load but TimestampType
    # after the first merge stamps inserts — silent schema drift
    start = (
        F.col(start_col).cast("timestamp")
        if start_col
        else F.lit(effective_ts).cast("timestamp")
    )
    return (
        incoming.withColumn("effective_start_date", start)
        .withColumn("effective_end_date", F.lit(END_OF_TIME).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .withColumn("version", F.lit(1))
    )


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    business_key: str,
    effective_ts,
    hash_col: str = "row_hash",
    surrogate_key: str | None = None,
) -> DataFrame:
    """Merge a staging snapshot into an SCD2 dimension.

    ``current`` must carry SCD2_COLS + ``hash_col``; ``incoming`` carries
    the business columns + ``hash_col`` (one row per business key).
    Returns the full new dimension contents.

    With ``surrogate_key``, existing rows keep their key and inserted
    versions get max(existing)+row_number — new keys per version, unlike
    the reference, whose regenerated range(1,n+1) keys collide across
    versions (etl/transform.py:192 + etl/load.py:291-298).
    """
    eff = F.lit(effective_ts).cast("timestamp")
    attr_cols = [c for c in incoming.columns]

    history = current.filter(~F.col("is_current"))
    active = current.filter(F.col("is_current"))

    # Keys whose attributes changed: equi-join on business key, residual
    # hash inequality (etl/load.py:279-288, J9).
    changed_keys = (
        incoming.alias("s")
        .join(active.alias("t"), business_key)
        .filter(F.col(f"s.{hash_col}") != F.col(f"t.{hash_col}"))
        .select(business_key)
    )

    # Expire: end-date the changed active rows at the new version's start
    # (contiguous timeline — deviation from reference documented above).
    expired = (
        active.join(changed_keys, business_key, "left_semi")
        .withColumn("effective_end_date", eff)
        .withColumn("is_current", F.lit(False))
    )
    still_active = active.join(changed_keys, business_key, "left_anti")

    # New versions: staging rows with no active twin on (key, hash) —
    # the NOT EXISTS guard (etl/load.py:291-298, J8). Covers both changed
    # keys and brand-new keys; re-sent identical rows are dropped.
    prev_version = current.groupBy(business_key).agg(F.max("version").alias("_prev_version"))
    inserts = (
        incoming.join(
            active.select(business_key, hash_col),
            [business_key, hash_col],
            "left_anti",
        )
        .join(prev_version, business_key, "left")
        .select(
            *attr_cols,
            eff.alias("effective_start_date"),
            F.lit(END_OF_TIME).cast("timestamp").alias("effective_end_date"),
            F.lit(True).alias("is_current"),
            (F.coalesce(F.col("_prev_version"), F.lit(0)) + 1).alias("version"),
        )
    )

    ordered = [*attr_cols, *SCD2_COLS]
    if surrogate_key is None:
        return (
            history.select(*ordered)
            .unionByName(still_active.select(*ordered))
            .unionByName(expired.select(*ordered))
            .unionByName(inserts.select(*ordered))
        )

    from pyspark.sql import Window

    ordered_sk = [surrogate_key, *ordered]
    base = current.agg(F.coalesce(F.max(surrogate_key), F.lit(0)).alias("_base"))
    # Dense deterministic keys require a global row_number — a single-
    # task window over the INSERT set only (changed + new keys per
    # batch), never the whole dimension. That bounds the funnel to the
    # day's churn; a dimension whose daily churn itself overwhelms one
    # task needs a different key contract (e.g. hash keys), not SCD2
    # row numbering.
    inserts_sk = inserts.crossJoin(F.broadcast(base)).withColumn(
        surrogate_key,
        (
            F.col("_base")
            + F.row_number().over(Window.partitionBy(F.lit(1)).orderBy(business_key))
        ).cast(dict(current.dtypes)[surrogate_key]),
    ).drop("_base")
    return (
        history.select(*ordered_sk)
        .unionByName(still_active.select(*ordered_sk))
        .unionByName(expired.select(*ordered_sk))
        .unionByName(inserts_sk.select(*ordered_sk))
    )
