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
