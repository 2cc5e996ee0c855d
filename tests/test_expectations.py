"""Declarative expectations engine: violation counting over synthetic
dirty data (the sf tables are clean, so q115's oracle mostly proves
the zero-violation side; these tests prove the counting side)."""

import pyspark.sql.functions as F

from _multi_source_retail_data_integration_hub_spark.operators import (
    expectations as E,
)


def _summary_map(df):
    return {r.rule: (r.n_rows, r.n_violations, r.passed) for r in df.collect()}


def test_single_pass_rule_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", -5.0),   # positivity violation
            (2, "X", 0.0),    # dup id + bad status + positivity violation
            (None, "P", None),  # null id + null price
        ],
        "id int, status string, price double",
    )
    out = E.expect_summary(
        df,
        rules=[
            E.not_null("id"),
            E.accepted_values("status", ["O", "F", "P"]),
            E.positive("price"),
        ],
        unique_cols=["id"],
    )
    got = _summary_map(out)
    assert got["id_not_null"] == (4, 1, 0)
    assert got["status_accepted_values"] == (4, 1, 0)
    assert got["price_positive"] == (4, 3, 0)  # -5, 0, NULL
    assert got["id_unique"] == (4, 1, 0)  # one surplus duplicate
    # ONE aggregation job over ONE scan — no per-rule scan. The AQE
    # string repeats the plan under "== Initial Plan ==", so only the
    # final section is counted.
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Scan ExistingRDD") == 1


def test_in_range_and_matches(spark):
    df = spark.createDataFrame(
        [(0.05, "a1"), (0.2, "b!"), (None, None)], "d double, s string"
    )
    got = _summary_map(
        E.expect_summary(
            df, rules=[E.in_range("d", 0.0, 0.1), E.matches("s", r"^[a-z]\d$")]
        )
    )
    assert got["d_in_range"] == (3, 2, 0)  # 0.2 out, NULL counts
    assert got["s_matches"] == (3, 2, 0)
    # all-clean data passes
    clean = spark.createDataFrame([(0.05, "a1")], "d double, s string")
    got2 = _summary_map(
        E.expect_summary(clean, rules=[E.in_range("d", 0.0, 0.1)])
    )
    assert got2["d_in_range"] == (1, 0, 1)


def test_referential_integrity(spark):
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame(
        [(1,), (1,), (3,), (None,)], "fk int"
    )  # one orphan + one NULL
    row = E.expect_references(child, "fk", parent, "k").collect()[0]
    assert row.n_rows == 4
    assert row.n_violations == 2  # orphan 3 + NULL fk
    assert row.passed == 0


def test_edge_cases_empty_rules_empty_input_weird_names(spark):
    """ADVICE r4 pins: (a) no rules at all must raise a clear error,
    not emit invalid ``stack(0, )`` SQL; (b) an EMPTY input table
    violates nothing — counts 0, passed 1, never NULL; (c) rule names
    containing quotes/backticks are data, not SQL (the melt uses the
    Column API)."""
    import pytest

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="no rules"):
        E.expect_summary(df, rules=[])
    with pytest.raises(ValueError, match="duplicate rule names"):
        E.expect_summary(df, rules=[E.not_null("id"), E.not_null("id")])

    empty = spark.createDataFrame([], "id int, price double")
    got = _summary_map(
        E.expect_summary(
            empty, rules=[E.not_null("id"), E.positive("price")], unique_cols=["id"]
        )
    )
    assert got["id_not_null"] == (0, 0, 1)
    assert got["price_positive"] == (0, 0, 1)
    assert got["id_unique"] == (0, 0, 1)

    weird = "has'quote `backtick` -- comment"
    out = E.expect_summary(
        spark.createDataFrame([(None,)], "id int"),
        rules=[(weird, F.col("id").isNull())],
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].rule == weird and rows[0].n_violations == 1 and rows[0].passed == 0
