"""Scan efficiency contracts: predicate pushdown, column pruning, and
partition pruning must actually reach the parquet scan — at 100 TB a
scan that reads every column (or every partition) for a 2-column
filtered projection is a wrong plan even if the answer is right."""

import os

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _scan_node(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, f"no parquet scan in plan:\n{plan}"
    return "\n".join(scans)


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    scan = _scan_node(df)
    assert "PushedFilters" in scan
    assert "o_orderstatus" in scan.split("PushedFilters")[1]


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    scan = _scan_node(df)
    read_schema = scan.split("ReadSchema:")[1]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_comment" not in read_schema  # widest column must be pruned


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    path = os.path.join(str(tmp_path), "orders_part")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    orders.write.partitionBy("status").parquet(path)
    df = spark.read.parquet(path).where(F.col("status") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the status predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1].split("]")[0]
    assert "status" in part
    assert df.count() == orders.where("o_orderstatus = 'F'").count()


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering: a selective filter on one join side
    should inject a bloom filter onto the fact-side scan, so shuffle
    volume shrinks before the join — at 100 TB this is the difference
    between shuffling the whole fact table and shuffling the ~matching
    slice. Thresholds are lowered to trigger at test scale; production
    keeps the defaults (the optimizer sizes the filter from stats)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the runtime filter has a shuffle to prune
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        lineitem = load_table(spark, SF_DIR, "lineitem")
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).agg(F.count("*"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:3000]
        assert joined.first()[0] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_probe_plan_broadcasts_filter(spark):
    """q110's scale contract: the bloom words table broadcasts and the
    probe side joins it without a shuffle of the probe rows."""
    from _multi_source_retail_data_integration_hub_spark.plans.scale_ops import (
        q110_bloom_membership,
    )

    df = q110_bloom_membership(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # LEFT outer: a missing word row must read as bit=0, not drop rows
    assert "LeftOuter" in plan


def test_bpe_pairs_plan_is_topk_not_global_sort(spark):
    """q112's scale contract: pair formation happens inside the array
    column (no shuffle before the frequency aggregate) and the top-k is
    TakeOrderedAndProject, never a global sort of the pair vocabulary."""
    from _multi_source_retail_data_integration_hub_spark.plans.training_data import (
        q112_bpe_pairs,
    )

    df = q112_bpe_pairs(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # exactly two exchanges: the fan-out repartition + the frequency
    # aggregate's partial->final shuffle; a third would mean the pair
    # formation itself shuffled
    assert plan.count("Exchange") <= 2


def test_dynamic_partition_pruning_on_fact_dim_join(spark, tmp_path):
    """DPP: when the dim-side filter is only known at runtime, the fact
    scan must still prune partitions — Catalyst plants a dynamic-pruning
    subquery on the fact's partition column (the flagship star-schema
    scan optimization at 100 TB: a month-filtered dim prunes years of
    fact partitions before any fact bytes are read)."""
    fact_path = str(tmp_path / "fact")
    spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 20).alias("date_key"),
        (F.col("id") % 7).cast("double").alias("amount"),
    ).write.partitionBy("date_key").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(0, 20).select(
        F.col("id").alias("date_key"), (F.col("id") % 4).alias("month")
    )
    joined = fact.join(F.broadcast(dim), "date_key").where(F.col("month") == 2)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the answer matches the statically-filtered equivalent
    keys = [r.date_key for r in dim.where(F.col("month") == 2).collect()]
    want = fact.where(F.col("date_key").isin(keys)).count()
    assert joined.count() == want


def test_winnow_selection_scan_filter_stays_cheap(spark):
    """q149/q150's scale contract: the pre-explode length guard is
    derived from size(split(...)), so InferFiltersFromGenerate must NOT
    end up re-evaluating the interpreted shingle transform() inside the
    scan-side Filter (the repetition_signals pathology — measured 2x+
    on the whole query when it regresses)."""
    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        winnow_selection,
    )
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = winnow_selection(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Filter" in line and "transform(" in line:
            raise AssertionError(
                f"shingle transform leaked into a filter: {line.strip()[:200]}"
            )


def test_bigram_surprisal_planner_owns_unigram_join(spark):
    """q148's scale contract, REVISED in round 9: the unigram table is
    VOCABULARY-cardinality (1e8-1e9 distinct tokens at web scale), so
    it must never be hint-broadcast (the r8 verdict scale-killer). At
    tiny sf the planner still picks a broadcast from size statistics —
    asserted here as the small-scale behavior — but the analyzed plan
    must carry NO join-strategy hint, so the same code shuffle-joins
    once the vocab outgrows the ceiling (the companion hint-free test
    lives in test_training_ops.py)."""
    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        bigram_surprisal,
    )
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = bigram_surprisal(df, "text", "doc_id")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()


def test_simhash_pairs_no_cartesian(spark):
    """q147's scale contract: candidates come from the banded bucket
    equi-join — never a cross join of the corpus."""
    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        simhash,
        simhash_pairs,
    )
    from _multi_source_retail_data_integration_hub_spark.sources.testdata import (
        load_table,
    )

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig = simhash(df, "text", "doc_id", bits=16)
    plan = (
        simhash_pairs(sig, "doc_id", bits=16, n_bands=2, hamming_max=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_parquet_aggregate_pushdown_reads_footers_only(spark):
    """100 TB scale feature: with the DSv2 parquet reader,
    MIN/MAX/COUNT global aggregates are answered from parquet footer
    statistics — the scan's output schema IS the aggregate and no data
    pages are decoded. (Timestamp min/max is not a supported pushdown
    type and silently falls back to a normal scan, so the contract is
    pinned on numeric columns.)"""
    import pyspark.sql.functions as F

    path = "/root/testdata/sf0.001/orders.parquet"
    baseline = (
        spark.read.parquet(path)
        .agg(F.min("o_orderkey"), F.max("o_orderkey"), F.count("*"))
        .collect()[0]
    )
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = spark.read.parquet(path).agg(
            F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan_lines = [l for l in plan.splitlines() if "BatchScan" in l]
        assert scan_lines and "min(o_orderkey)" in scan_lines[0], scan_lines
        assert df.collect()[0] == baseline
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        if old_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
