"""Declarative data-quality expectations evaluated in ONE pass.

Reference analogue: the ETL's inline validation (null filters,
positivity checks, range clamps in /root/reference/etl/transform.py)
enforces quality by silently DROPPING rows. A production pipeline also
needs the audit side — "how many rows violate each rule?" — computed
without one job per rule (Deequ / dbt-test class of tooling). At
100 TB, N rules must not mean N scans.

Design: every single-table rule is a *violation predicate* (a boolean
Column); the summary aggregates all of them in one job —
``SUM(CASE WHEN violated THEN 1 END)`` per rule plus the row count —
then melts the 1-row result to (rule, n_rows, n_violations, passed)
with ``stack`` (no shuffle: the melt happens on a single row).
Uniqueness folds into the same pass as COUNT(col) - COUNT(DISTINCT
col). Referential integrity is the one rule class that genuinely
needs a second input, expressed as a broadcast-or-shuffle anti-join
count, unioned into the same summary schema.

Everything stays JVM-side; the summary is O(#rules) rows regardless
of table size, and partial aggregation means each executor emits one
row of counters per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUMMARY_COLS = ["rule", "n_rows", "n_violations", "passed"]


def not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNull())


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"{col}_accepted_values",
        ~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violated when outside [lo, hi] or NULL (range implies presence)."""
    c = F.col(col)
    return (f"{col}_in_range", ~c.between(F.lit(lo), F.lit(hi)) | c.isNull())


def positive(col: str) -> tuple[str, Column]:
    c = F.col(col)
    return (f"{col}_positive", (c <= 0) | c.isNull())


def matches(col: str, regex: str) -> tuple[str, Column]:
    c = F.col(col)
    return (f"{col}_matches", ~c.rlike(regex) | c.isNull())


def expect_summary(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate all rules over ``df`` in one aggregation job.

    ``rules``: (rule_name, violation_predicate) pairs — predicate TRUE
    means the row violates the rule. ``unique_cols``: column sets whose
    non-null values must be unique; violations = COUNT(col) -
    COUNT(DISTINCT col) (the number of surplus duplicate rows), folded
    into the same single pass.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    names: list[str] = []
    for name, pred in rules:
        names.append(name)
        aggs.append(
            # coalesce: SUM over an EMPTY table is NULL; an empty table
            # violates nothing, so the count must read 0 (passed=1)
            F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            # positional alias: the rule NAME is emitted only as a
            # string literal (a quote/backtick in it is data, not an
            # attribute name Spark would have to parse)
            .alias(f"_r{len(names) - 1}")
        )
    for col in unique_cols or []:
        names.append(f"{col}_unique")
        aggs.append(
            (F.count(col) - F.count_distinct(F.col(col)))
            .cast("bigint")
            .alias(f"_r{len(names) - 1}")
        )
    if not names:
        raise ValueError(
            "expect_summary: no rules given (rules=[] and no unique_cols) — "
            "pass at least one rule or column set"
        )
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"expect_summary: duplicate rule names {dupes}")
    row = df.agg(*aggs)
    # Column-API stack (no SQL-string interpolation): rule names with
    # quotes/backticks are plain string literals, never parsed as SQL.
    stack_args: list[Column] = []
    for i, n in enumerate(names):
        stack_args.append(F.lit(n))
        stack_args.append(row[f"_r{i}"])
    melted = row.select(
        "_n",
        F.stack(F.lit(len(names)), *stack_args).alias("rule", "n_violations"),
    )
    return melted.select(
        "rule",
        F.col("_n").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).cast("bigint").alias("passed"),
    )


def expect_references(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential-integrity rule: child keys must exist in the parent.

    One anti-join (Catalyst broadcasts a small parent; a 100 TB child
    against a large parent becomes a shuffled semi/anti join on the
    key — both correct, both single-pass over the child). NULL child
    keys count as violations (a dangling fact row either way); the
    same convention in the SQL twin is ``p.key IS NULL`` after a left
    join.
    """
    name = rule or f"{child_col}_references_{parent_col}"
    totals = child.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        child.select(F.col(child_col))
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            [child_col],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return (
        totals.crossJoin(orphans)  # 1 row x 1 row scalar combine
        .select(
            F.lit(name).alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).cast("bigint").alias("passed"),
        )
    )
