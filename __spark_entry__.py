"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the package
``_multi_source_retail_data_integration_hub_spark``; this module only
exposes its query registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from _multi_source_retail_data_integration_hub_spark.plans import (  # noqa: E402
    ORACLE,
    QUERIES,
)
from _multi_source_retail_data_integration_hub_spark.plans import (  # noqa: E402,F401
    analytics,  # registers q01..q08, q52, q54-q55, q57-q58, q64-q65
    dashboard,  # registers q09..q16, q50 (incl. unpivot)
    events_ts,  # registers q29..q31, q48, q51, q62-q63 (windows, sessions, funnel, CDC, impute)
    grouped_map,  # registers q39..q40, q61 (grouped map, frame windows, cogroup)
    multimodal_plan,  # registers q32, q59-q60 (binary payload features, frames)
    rollups,  # registers q38, q46 (rollup, cube)
    scale_ops,  # registers q33..q35, q45, q49 (JSON, salted agg, sketches, sampling)
    temporal,  # registers q36 (as-of join), q44 (interval join)
    similarity,  # registers q26..q28, q37, q41-q42, q53 (embedding ANN, dedup)
    training_data,  # registers q17..q25, q47, q56 (dedup, text analysis, curation)
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (monthly sales trend with MoM growth) on sf0.001."""
    return QUERIES["q01_monthly_sales_trend"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
