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
    analytics,  # registers q01..q08, q52, q54-q55, q57-q58, q64-q65, q76, q82-q87, q127, q130-q132
    dashboard,  # registers q09..q16, q50 (incl. unpivot)
    events_ts,  # registers q29..q31, q48, q51, q62-q63, q113, q118-q119, q126 (windows, sessions, CDC, lateral/recursive SQL, streaming-vs-batch)
    grouped_map,  # registers q39..q40, q61 (grouped map, frame windows, cogroup)
    incremental,  # registers q111, q121 (mergeable-partial + CDC-aware mart refresh)
    multimodal_plan,  # registers q32, q59-q60 (binary payload features, frames)
    quality,  # registers q115 (declarative data-quality expectations)
    rollups,  # registers q38, q46 (rollup, cube)
    scale_ops,  # registers q33..q35, q45, q49, q81, q110, q123, q128-q129 (JSON, salting, sketches, pagerank, skew/checksum audits)
    scd2_query,  # registers q77 (oracle-checked SCD2 merge)
    temporal,  # registers q36 (as-of join), q44 (interval join)
    tpch_shapes,  # registers q88..q99 (Q2/Q9/Q11/Q13/Q15-Q22 shapes)
    similarity,  # registers q26..q28, q37, q41-q42, q53 (embedding ANN, dedup)
    training_data,  # registers q17..q25, q47, q56, q100-q109, q112, q114, q116, q120, q122, q124-q125 (dedup, text analysis, curation, BM25, sampling)
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Round-5 window (the driver records the first ~50 registered queries per
# round, against freshly regenerated testdata).  Priorities, in order:
#   1. q81_heavy_hitters — red in CORRECTNESS_r04.json (hash mismatch that
#      does not reproduce on current data; see CORRECTNESS_NOTES.md), so it
#      goes first until a driver-green row lands.
#   2. The 20 queries that overflowed every prior window and have never had
#      a driver row: q82-q84, q86-q99, q102-q103, q109.
#   3. Queries NEW this round (no prior driver row possible) — picked up
#      automatically by _ordered()'s is-new check.
#   4. Backfill: the oldest remaining rows, whose latest driver rows date
#      from the round-3 generation (q01-q13, q17-q25, q37, q41-q42, q47,
#      q52-q54 here; the rest of the r3 set rotates in next round).
# All 120+ registered queries are green via ``tools/check_oracle.py`` on
# current sf0.01 data (full sweep ~10 min).
_PRIORITY = [
    "q81_heavy_hitters",
    "q82_volume_shipping",
    "q83_returned_top_customers",
    "q84_local_supplier_volume",
    "q86_promo_share",
    "q87_market_share",
    "q88_best_price_supplier",
    "q89_product_profit",
    "q90_important_parts",
    "q91_custdist",
    "q92_top_supplier",
    "q93_supplier_diversity",
    "q94_small_order_drain",
    "q95_large_orders",
    "q96_disjunctive_revenue",
    "q97_excess_shipments",
    "q98_sole_failing_supplier",
    "q99_dormant_customers",
    "q102_forecast_revenue",
    "q103_priority_mix",
    "q109_vocab_coverage",
]

# Backfill order once the never-verified + new blocks are exhausted.
_BACKFILL = [
    "q01_monthly_sales_trend",
    "q02_category_share",
    "q03_customer_segments",
    "q04_segment_status_pivot",
    "q05_weekday_analysis",
    "q06_top_customers",
    "q07_catalog_stats",
    "q08_quarterly_yoy",
    "q09_calendar_dim",
    "q10_row_hash",
    "q11_kpi_summary",
    "q12_heatmap",
    "q13_histogram",
    "q17_exact_dedup",
    "q18_token_stats",
    "q19_quality_score",
    "q20_lang_id_confusion",
    "q21_fingerprint_dedup",
    "q22_ngram_jaccard",
    "q23_minhash_signatures",
    "q24_lsh_candidates",
    "q25_simhash",
    "q37_cosine_neardup",
    "q41_ivf_assign",
    "q42_ann_ivf_topk",
    "q47_top_terms",
    "q52_customers_no_orders",
    "q53_dup_clusters",
    "q54_spend_deciles",
]


def _ordered(mapping: dict) -> dict:
    head = [k for k in _PRIORITY if k in mapping]
    # Queries NEW this round (q121+) have no prior driver row; they slot in
    # right after the never-verified block so their first row lands now.
    covered_prior = {f"q{i:02d}" for i in range(1, 100)} | {
        f"q{i}" for i in range(100, 121)
    }

    def _is_covered(name: str) -> bool:
        return name.split("_", 1)[0] in covered_prior

    placed = set(head)
    new = sorted(k for k in mapping if k not in placed and not _is_covered(k))
    placed.update(new)
    backfill = [k for k in _BACKFILL if k in mapping and k not in placed]
    placed.update(backfill)
    tail = [k for k in mapping if k not in placed]
    return {k: mapping[k] for k in head + new + backfill + tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (monthly sales trend with MoM growth) on sf0.001."""
    return QUERIES["q01_monthly_sales_trend"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLE)
