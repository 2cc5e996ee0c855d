"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value
comparison (columns sorted by name, rows sorted by all columns).

Usage:
    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from _multi_source_retail_data_integration_hub_spark.session import get_spark  # noqa: E402
from _multi_source_retail_data_integration_hub_spark.sources.testdata import (  # noqa: E402
    TESTDATA_TABLES,
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for col in s.columns:
        a, b = s[col], d[col]
        # The driver's value hash is DTYPE-sensitive: an int64 Spark
        # column vs a float64 oracle column (DuckDB HUGEINT -> fetchdf
        # float64, the r4-r7 chronic-red root cause) hash-mismatches on
        # exactly-equal values. The tolerant comparisons below would
        # mask that, so surface ANY dtype-KIND divergence (signed vs
        # unsigned, int vs float, object vs numeric, ...) as its own
        # failure first — r8 advice: the original {int64, float64}-only
        # gate let an unsigned-vs-signed pair through.
        # Known-benign pair: a Spark DATE comes back as object
        # (datetime.date) while DuckDB renders it datetime64 — pandas
        # has no date dtype. The driver's hash handles it (q09 has a
        # full_date column and is driver-green r8), and the str()
        # comparison below still checks the values.
        benign_date = {a.dtype.kind, b.dtype.kind} == {"O", "M"}
        if a.dtype.kind != b.dtype.kind and not benign_date:
            problems.append(
                f"DTYPE-MISMATCH col={col}: spark={a.dtype} duck={b.dtype} "
                "(driver hash fails on this even when values are equal; "
                "CAST the oracle output to the Spark-side type)"
            )
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                av = a.astype("float64").to_numpy()
                bv = b.astype("float64").to_numpy()
                both_nan = np.isnan(av) & np.isnan(bv)
                exact = (av == bv) | both_nan
                if not exact.all():
                    close = np.isclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True)
                    n_bad = int((~exact).sum())
                    worst = np.nanmax(np.abs(av - bv))
                    tag = "CLOSE-BUT-NOT-EXACT" if close.all() else "VALUE-MISMATCH"
                    problems.append(f"{tag} col={col}: {n_bad} rows differ, max abs diff {worst:.3e}")
            else:
                aa = a.astype(str).to_numpy()
                bb = b.astype(str).to_numpy()
                if not (aa == bb).all():
                    n_bad = int((aa != bb).sum())
                    idx = int(np.argmax(aa != bb))
                    problems.append(
                        f"VALUE-MISMATCH col={col}: {n_bad} rows, first at row {idx}: "
                        f"spark={aa[idx]!r} duck={bb[idx]!r}"
                    )
        except Exception as e:  # dtype clash etc.
            problems.append(f"compare error col={col}: {e}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — spark rows={len(spark_pdf)}")
            n_pass += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s, {len(spark_pdf)} rows):")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({dt:.1f}s, {len(spark_pdf)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
