"""SCD2 merge scenario tests (SURVEY §5.2.3 / FIXTURES.md §4):
run-1 initial load, run-2 with unchanged + changed + new business keys;
assert expire/insert/version/anti-join-guard behavior, then a run-3
re-send of identical data must be a no-op.
"""

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.functions.derived import row_hash
from _multi_source_retail_data_integration_hub_spark.operators.scd2 import (
    END_OF_TIME,
    scd2_initial,
    scd2_merge,
)

T1 = "2024-01-01 00:00:00"
T2 = "2024-02-01 00:00:00"
T3 = "2024-03-01 00:00:00"


def snap(spark, rows):
    df = spark.createDataFrame(rows, "customer_id string, gender string, age long")
    return df.withColumn(
        "row_hash", row_hash(F.col("customer_id"), F.col("gender"), F.col("age").cast("string"))
    )


def test_scd2_full_lifecycle(spark):
    run1 = snap(spark, [("C1", "Male", 30), ("C2", "Female", 40), ("C3", "Male", 50)])
    dim1 = scd2_initial(run1, T1)
    assert dim1.filter(F.col("is_current")).count() == 3

    # run 2: C1 unchanged, C2 changed (age 40->41), C4 new, C3 absent
    run2 = snap(spark, [("C1", "Male", 30), ("C2", "Female", 41), ("C4", "Female", 22)])
    dim2 = scd2_merge(dim1, run2, "customer_id", T2)
    rows = {(r.customer_id, r.version): r for r in dim2.collect()}
    assert len(rows) == 5  # 3 originals + C2v2 + C4v1

    # unchanged key untouched (anti-join guard dropped the re-send)
    c1 = rows[("C1", 1)]
    assert c1.is_current and str(c1.effective_end_date).startswith("9999")

    # changed key: old version expired AT the new version's start
    c2v1, c2v2 = rows[("C2", 1)], rows[("C2", 2)]
    assert not c2v1.is_current and str(c2v1.effective_end_date) == T2
    assert c2v2.is_current and c2v2.age == 41
    assert str(c2v2.effective_start_date) == T2
    assert str(c2v2.effective_end_date) == END_OF_TIME.replace(" 00:00:00", " 00:00:00")

    # absent key stays current (dimension never forgets)
    assert rows[("C3", 1)].is_current

    # brand-new key
    c4 = rows[("C4", 1)]
    assert c4.is_current and c4.version == 1

    # run 3: identical re-send of run2 -> strict no-op
    dim3 = scd2_merge(dim2, run2, "customer_id", T3)
    assert dim3.count() == 5
    assert dim3.filter(F.col("is_current")).count() == 4
    assert dim3.filter(F.col("effective_start_date") == F.lit(T3).cast("timestamp")).count() == 0


def test_scd2_version_increments_beyond_two(spark):
    dim = scd2_initial(snap(spark, [("C1", "Male", 30)]), T1)
    dim = scd2_merge(dim, snap(spark, [("C1", "Male", 31)]), "customer_id", T2)
    dim = scd2_merge(dim, snap(spark, [("C1", "Male", 32)]), "customer_id", T3)
    rows = sorted(dim.collect(), key=lambda r: r.version)
    assert [r.version for r in rows] == [1, 2, 3]
    assert [r.is_current for r in rows] == [False, False, True]
    # contiguous timeline: each end == next start
    assert rows[0].effective_end_date == rows[1].effective_start_date
    assert rows[1].effective_end_date == rows[2].effective_start_date


def test_delta_merge_staging_legs(spark):
    """The Delta MERGE twin's staging frame (operators/delta_merge.py,
    pure-DataFrame logic so it is testable without delta installed):
    one expire-leg row per incoming row, one insert-leg row per
    changed-or-new key with version = max(prior)+1, no insert leg for
    re-sent identical rows."""
    from _multi_source_retail_data_integration_hub_spark.operators.delta_merge import (
        scd2_merge_sql,
        scd2_merge_staging,
    )

    run1 = snap(spark, [("C1", "Male", 30), ("C2", "Female", 40)])
    dim1 = scd2_initial(run1, T1)
    # C1 re-sent identical, C2 changed, C4 new
    run2 = snap(spark, [("C1", "Male", 30), ("C2", "Female", 41), ("C4", "Female", 22)])
    staged = scd2_merge_staging(dim1, run2, "customer_id")

    expire = {r.customer_id: r for r in staged.filter("_merge_key IS NOT NULL").collect()}
    inserts = {r.customer_id: r for r in staged.filter("_merge_key IS NULL").collect()}
    # expire leg: every incoming row, keyed
    assert set(expire) == {"C1", "C2", "C4"}
    assert all(r._merge_key == r.customer_id for r in expire.values())
    assert all(r._new_version is None for r in expire.values())
    # insert leg: changed + new only (C1's identical re-send dropped),
    # versions increment from the stored max
    assert set(inserts) == {"C2", "C4"}
    assert inserts["C2"]._new_version == 2 and inserts["C2"].age == 41
    assert inserts["C4"]._new_version == 1

    stmt = scd2_merge_sql("dim_t", "v", "customer_id", T2, list(run2.columns))
    # the NOT MATCHED branch must be guarded on the insert leg, or a
    # brand-new key's expire-leg row would also insert (NULL version)
    assert "WHEN NOT MATCHED AND s._new_version IS NOT NULL" in stmt
    assert "t.customer_id = s._merge_key AND t.is_current" in stmt
