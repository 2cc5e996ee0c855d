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

# Round-6 window (the driver records the first ~50 registered queries per
# round, against freshly regenerated testdata).  Priorities, in order:
#   1. q000_generation_fingerprint — per-table row counts + key-set
#      checksums, registered FIRST so each CORRECTNESS_rN.json
#      self-documents which data generation each engine compared (red rows
#      become attributable: q000 red => generation mismatch, q000 green =>
#      code-side; see CORRECTNESS_NOTES.md).
#   2. The four r5 driver-red rows (q81, q103, q128, q129) — all
#      hash_match=false with rows+schema green, none reproducible locally;
#      q128/q129 are integer-exact input fingerprints, so their next row is
#      diagnostic alongside q000. q129's one real divergence mechanism
#      (double->bigint cast rules) is pinned via floor() this round.
#   3. Queries NEW this round (q134+, no prior driver row possible) —
#      picked up automatically by _ordered()'s is-new check.
#   4. Backfill: the 34 queries whose newest driver rows still date from
#      the round-3 generation, then the oldest round-4 rows.
# All registered queries are green via ``tools/check_oracle.py`` on
# current sf0.01 data (full sweep; see SCALE.md for the r6 run).
_PRIORITY = [
    "q000_generation_fingerprint",
    "q81_heavy_hitters",
    "q103_priority_mix",
    "q128_key_skew_audit",
    "q129_table_checksum",
]

# Backfill order once the never-verified + new blocks are exhausted:
# first the r3-generation remainder, then the oldest r4 rows.
_BACKFILL = [
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
    "q55_profile",
    "q56_corpus_pipeline",
    "q57_set_ops",
    "q58_above_nation_avg",
    "q64_revenue_by_nation",
    "q65_shipping_priority",
    "q66_pricing_summary",
    "q67_grouping_sets",
    "q68_forward_fill",
    "q69_session_window_batch",
    "q70_pii_scrub",
    "q71_fuzzy_part_match",
    "q72_lang_reservoir",
    "q73_embedding_stats",
    "q74_doc_chunking",
    "q75_late_orders_semi",
    "q76_spend_percentiles",
    "q77_scd2_merge",
    "q78_image_resize",
    "q79_retention_cohorts",
    "q80_minhash_accuracy",
    # oldest r4-generation rows rotate in behind the r3 remainder
    "q14_quantiles",
    "q15_name_union",
    "q16_pareto",
    "q26_cosine_topk",
    "q27_lsh_buckets",
    "q28_ann_lsh_topk",
    "q29_tumbling_daily",
    "q30_sessionization",
    "q31_sliding_weekly",
    "q32_multimodal_features",
    "q33_json_extract",
    "q34_salted_agg",
]


def _ordered(mapping: dict) -> dict:
    head = [k for k in _PRIORITY if k in mapping]
    # Queries NEW this round (q134+) have no prior driver row; they slot in
    # right after the priority block so their first row lands now.
    covered_prior = {"q000"} | {f"q{i:02d}" for i in range(1, 100)} | {
        f"q{i}" for i in range(100, 134)
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
