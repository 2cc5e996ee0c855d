"""Deterministic sampling (operators/sampling.py): reproducibility and
per-stratum rates. q45's oracle proves engine parity; these pin the
operator contract on controlled data."""

from _multi_source_retail_data_integration_hub_spark.operators import sampling


def _df(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(1000)]
    return spark.createDataFrame(rows, "id long, stratum string")


def test_deterministic_sample_is_reproducible_and_sized(spark):
    df = _df(spark)
    s1 = {r["id"] for r in sampling.deterministic_sample(df, "id", 20).collect()}
    s2 = {r["id"] for r in sampling.deterministic_sample(df, "id", 20).collect()}
    assert s1 == s2  # same rows every run, not just the same count
    assert len(s1) == 200  # ids are uniform mod 100 -> exactly 20%
    assert all(i % 100 < 20 for i in s1)


def test_stratified_rates_and_default(spark):
    df = _df(spark)
    out = sampling.stratified_sample(
        df, "stratum", {"a": 100, "b": 10}, key_col="id"
    ).collect()
    by = {"a": 0, "b": 0}
    for r in out:
        by[r["stratum"]] += 1
    assert by == {"a": 500, "b": 50}
    # unlisted strata keep default_pct (0 -> dropped entirely)
    none = sampling.stratified_sample(df, "stratum", {"a": 50}, key_col="id")
    assert none.where("stratum = 'b'").count() == 0


def test_mixture_rates_hit_targets_and_cap(spark):
    totals = spark.createDataFrame(
        [("web", 8000), ("wiki", 1500), ("books", 500)],
        "stratum string, tokens long",
    )
    rates = {
        r["stratum"]: r
        for r in sampling.mixture_sampling_rates(
            totals, "stratum", "tokens", {"web": 50, "wiki": 30, "books": 20},
            budget_pct=50,
        ).collect()
    }
    # budget = 5000 tokens; web target 2500 of 8000 -> 31%
    assert rates["web"]["target_tokens"] == 2500
    assert rates["web"]["rate_pct"] == 31
    # wiki target 1500 of 1500 -> exactly 100%
    assert rates["wiki"]["rate_pct"] == 100
    # books target 1000 > available 500 -> capped at 100, never >100
    assert rates["books"]["target_tokens"] == 1000
    assert rates["books"]["rate_pct"] == 100


def test_mixture_rates_drop_unweighted_strata(spark):
    totals = spark.createDataFrame(
        [("web", 100), ("junk", 900)], "stratum string, tokens long"
    )
    out = sampling.mixture_sampling_rates(
        totals, "stratum", "tokens", {"web": 100}, budget_pct=10
    ).collect()
    assert [r["stratum"] for r in out] == ["web"]
    # total includes ALL strata (the budget is corpus-wide): 10% of 1000
    assert out[0]["target_tokens"] == 100


def test_mixture_sample_corpus_side_never_shuffles_rows(spark):
    """q106's scale claim, pinned: the corpus joins the per-stratum
    rates via broadcast — no SortMergeJoin / no shuffle of corpus rows
    on the stratum key (the only Exchanges are the tiny per-stratum
    aggregate's partials and the final 5-row agg)."""
    from pyspark.sql import functions as F

    corpus = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
        (F.col("id") % 50 + 1).alias("n_toks"),
    )
    totals = corpus.groupBy("stratum").agg(F.sum("n_toks").alias("tokens"))
    rates = sampling.mixture_sampling_rates(
        totals, "stratum", "tokens", {"0": 50, "1": 30, "2": 20}, budget_pct=40
    )
    kept = corpus.join(
        F.broadcast(rates.select("stratum", "rate_pct")), "stratum"
    ).where(sampling.in_sample(F.col("doc_id"), F.col("rate_pct")))
    kept.write.format("noop").mode("overwrite").save()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_priority_sample_weight_bias_and_determinism(spark):
    """Priority sampling: reruns give the identical sample; heavy rows
    are overrepresented vs light rows at equal population counts."""
    rows = [(i, 1000 if i % 2 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = sampling.priority_sample(df, "w", "doc_id", 100).collect()
    s2 = sampling.priority_sample(df, "w", "doc_id", 100).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    heavy = sum(1 for r in s1 if r.w == 1000)
    assert heavy > 90  # 1000x weight -> overwhelmingly heavy rows
    # priorities are exact and positive; ordering is total
    pris = [r.priority for r in s1]
    assert pris == sorted(pris, reverse=True) and pris[-1] > 0


def test_priority_sample_invariant_to_partitioning(spark):
    """Same sample (same priorities, same order) whatever the physical
    layout — the reproducibility contract."""
    from pyspark.sql import functions as F

    rows = [(i, (i * 37) % 100 + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = [tuple(r) for r in sampling.priority_sample(df, "w", "doc_id", 50).collect()]
    b = [
        tuple(r)
        for r in sampling.priority_sample(
            df.repartition(17).sortWithinPartitions(F.desc("doc_id")), "w", "doc_id", 50
        ).collect()
    ]
    assert a == b


def test_epoch_shuffle_contract(spark):
    df = _df(spark).select("id")
    out1 = sampling.epoch_shuffle(df, "id", epochs=(1, 2), n_shards=4).collect()
    out2 = sampling.epoch_shuffle(
        df.repartition(13), "id", epochs=(1, 2), n_shards=4
    ).collect()
    # deterministic and partition-invariant
    key = lambda r: (r.epoch, r.shard_id, r.shard_pos)  # noqa: E731
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert len(out1) == 2000  # every (id, epoch)
    # shard_pos is 1..n contiguous within each (epoch, shard)
    groups: dict[tuple, list] = {}
    for r in out1:
        groups.setdefault((r.epoch, r.shard_id), []).append(r.shard_pos)
    for pos in groups.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))
    # epochs are DIFFERENT permutations: same shard+pos rarely the same id
    by_ep = {
        e: {(r.shard_id, r.shard_pos): r.id for r in out1 if r.epoch == e}
        for e in (1, 2)
    }
    same = sum(
        1 for k, v in by_ep[1].items() if by_ep[2].get(k) == v
    )
    assert same < 100  # ~1/1000 coincidence rate, not a repeated order
    # shards balance to sampling error (uniform md5 prefix)
    sizes = [len(v) for k, v in groups.items()]
    assert max(sizes) - min(sizes) < 200


def test_epoch_shuffle_write_layout(spark, tmp_path):
    """The production layout q169's docstring promises: hash-partition
    by (epoch, shard), sort WITHIN each shard file by sort_key — no
    global sort — and any worker reproduces its read order from the
    file alone."""
    df = _df(spark).select("id")
    out = sampling.epoch_shuffle(df, "id", epochs=(1,), n_shards=4)
    dest = str(tmp_path / "shards")
    (
        out.repartition("epoch", "shard_id")
        .sortWithinPartitions("sort_key")
        .write.partitionBy("epoch", "shard_id")
        .parquet(dest)
    )
    back = spark.read.parquet(dest)
    assert back.count() == 1000
    # per shard: the file order (shard_pos written alongside) must be
    # the sort_key order — i.e. reading a shard front-to-back replays
    # positions 1..n without any global sort having run
    import pandas as pd

    pdf = back.toPandas()
    for (_, _), grp in pdf.groupby(["epoch", "shard_id"]):
        g = grp.sort_values("sort_key")
        assert list(g["shard_pos"]) == list(range(1, len(g) + 1))
    # partition pruning: the shard filter must land in PartitionFilters
    # (directory-level pruning), not just a row-level Filter — and the
    # pruned read returns exactly that shard
    one = spark.read.parquet(dest).where("epoch = 1 AND shard_id = 2")
    plan = one._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert pf and "shard_id" in pf.group(1) and "epoch" in pf.group(1), plan[
        :1500
    ]
    assert one.count() == len(pdf[pdf.shard_id == 2])
