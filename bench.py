"""Benchmark harness: run the headline query surface at a given scale
factor and print ONE JSON line the driver records as BENCH_r{N}.json.

Usage:
    python bench.py                       # $SPARK_GRAFT_SF_DIR or sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py

Per query we force FULL execution with a ``noop``-format write: unlike
``count()`` (which lets Catalyst prune projection columns, so a
map-only query's computed columns would never run), the noop sink
materializes every output column and discards it — the honest
benchmark action. The first query pays parquet-footer/codegen warmup,
so we run a tiny warmup scan first and report per-query seconds plus
the summed total.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from _multi_source_retail_data_integration_hub_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    spark = get_spark("bench")
    # Warmup: trigger JVM/codegen/parquet-reader/noop-sink init outside
    # the timings (first-query overhead is ~2 s otherwise and would be
    # misattributed to whichever query runs first).
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1000)
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    queries = entrymod.queries()
    per_query: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_num if sf_num is not None else sf,
        "n_queries": len(per_query),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
