"""Driver-contract invariants: the registry must stay fully
oracle-checked (a new query silently registered without a DuckDB twin
downgrades the correctness gate to rows-only — fail here instead)."""

import re

import __spark_entry__ as entry
from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
    TESTDATA_TABLES,
)


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"queries without DuckDB twins: {missing}"
    stale = sorted(set(oracles) - set(qs))
    assert not stale, f"oracles without queries: {stale}"


def test_query_names_follow_convention():
    # optional single letter suffix: the per-table generation-fingerprint
    # guards (q00d/q00e/q00l/q00o) key on the guarded table's initial
    pat = re.compile(r"^q\d{2,3}[a-z]?_[a-z0-9_]+$")
    bad = [n for n in entry.queries() if not pat.match(n)]
    assert not bad, bad
    nums = [n.split("_", 1)[0] for n in entry.queries()]
    assert len(nums) == len(set(nums)), "duplicate query numbers"


def test_oracles_reference_only_registered_tables():
    # every FROM/JOIN target must be a testdata view or a CTE defined in
    # the same oracle (the driver registers only TESTDATA_TABLES)
    ident = r"[a-zA-Z_][a-zA-Z0-9_]*"
    for name, sql in entry.oracle_sql().items():
        sql = re.sub(r"--[^\n]*", "", sql)  # strip SQL comments
        # EXTRACT(year FROM expr) is not a relation reference
        sql = re.sub(r"EXTRACT\s*\([^()]*\)", "", sql, flags=re.IGNORECASE)
        ctes = set(re.findall(rf"({ident})\s+AS\s*\(", sql))
        targets = re.findall(
            rf"(?:FROM|JOIN)\s+({ident})\b(?!\s*\.)", sql, flags=re.IGNORECASE
        )
        for t in targets:
            assert (
                t.lower() in TESTDATA_TABLES or t in ctes or t.lower() in ("unnest",)
            ), f"{name}: unknown relation {t!r}"
