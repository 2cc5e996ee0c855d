"""Concurrent query execution in one SparkSession: the shared-session /
multi-tenant usage pattern (a BI layer firing queries in parallel).
Spark schedules jobs from multiple driver threads FIFO by default;
results must be identical to serial execution."""

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

NAMES = [
    "q01_monthly_sales_trend",
    "q03_customer_segments",
    "q11_kpi_summary",
    "q33_json_extract",
    "q64_revenue_by_nation",
    "q110_bloom_membership",
    "q118_lateral_topk",  # SQL-surface query: per-call temp views under concurrency
]


def test_parallel_queries_match_serial(spark):
    qs = entrymod.queries()

    def run(name):
        return name, [tuple(r) for r in qs[name](spark, SF_DIR).collect()]

    serial = dict(run(n) for n in NAMES)
    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        parallel = dict(pool.map(run, NAMES))
    for n in NAMES:
        assert parallel[n] == serial[n], n
