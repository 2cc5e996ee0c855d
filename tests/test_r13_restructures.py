"""Differential regression tests for the r13 optimization
restructures: each operator whose INTERNALS changed this round is
checked against an inline re-implementation of its PRE-r13 shape on
the same input, so a semantic drift introduced by the faster plan
turns into a red test, not a silent oracle surprise next round.

(The oracle gate already covers the registered-query grain at both
SFs; these pin the operator grain, including inputs the bench corpora
never produce — boundary-first-token chunking, span-free docs,
single-item baskets.)
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators import text as T
from _multi_source_retail_data_integration_hub_spark.sources.testdata import fan_out


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# cdc_chunks: per-row array formulation vs the pre-r13
# posexplode + cumulative-window + collect_list reference
# ---------------------------------------------------------------------------
def _cdc_chunks_reference(df, text_col, id_col, mod):
    toks = df.select(
        F.col(id_col), F.posexplode(T.tokens(F.col(text_col))).alias("pos", "tok")
    )
    h = F.conv(F.md5(F.col("tok")).substr(1, 8), 16, 10).cast("bigint")
    marked = toks.withColumn(
        "is_b", F.when(F.pmod(h, F.lit(mod)) == 0, F.lit(1)).otherwise(F.lit(0))
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = marked.withColumn("chunk_id", F.sum("is_b").over(w).cast("bigint"))
    per_chunk = chunked.groupBy(id_col, "chunk_id").agg(
        F.min("pos").cast("bigint").alias("chunk_start"),
        F.count("*").cast("bigint").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.getField("tok"),
                ),
            )
        ).alias("chunk_md5"),
    )
    counts = per_chunk.groupBy("chunk_md5").agg(
        F.count("*").cast("bigint").alias("chunk_df")
    )
    return per_chunk.join(counts, "chunk_md5").select(
        id_col, "chunk_id", "chunk_start", "n_tokens", "chunk_md5", "chunk_df"
    )


def test_cdc_chunks_matches_window_reference(spark):
    # mod=2 makes roughly half the tokens boundaries, exercising
    # boundary-first-token, boundary-last-token and no-boundary docs
    # far more densely than the default mod=64 ever would
    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "repeat repeat repeat repeat"),
        (5, "x"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    cols = ["doc_id", "chunk_id", "chunk_start", "n_tokens", "chunk_md5", "chunk_df"]
    for mod in (2, 3, 64):
        got = _rows(T.cdc_chunks(df, "text", "doc_id", mod=mod), cols)
        want = _rows(_cdc_chunks_reference(df, "text", "doc_id", mod), cols)
        assert got == want, f"cdc_chunks drifted from window reference at mod={mod}"


def test_cdc_chunks_empty_text_emits_no_rows(spark):
    df = spark.createDataFrame([(1, ""), (2, "only doc")], ["doc_id", "text"])
    out = T.cdc_chunks(df, "text", "doc_id").collect()
    assert {r["doc_id"] for r in out} == {2}


# ---------------------------------------------------------------------------
# per-order basket pair enumeration (q131 shape) vs the pre-r13
# distinct + self-join reference
# ---------------------------------------------------------------------------
def test_basket_pairs_match_self_join(spark):
    li = spark.createDataFrame(
        [
            (1, 10), (1, 20), (1, 30), (1, 10),  # dup item in one order
            (2, 20),                              # single-item basket: no pairs
            (3, 30), (3, 10),
            (4, 40), (4, 40),                     # all-dup basket: no pairs
        ],
        ["l_orderkey", "l_partkey"],
    )
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    want = _rows(
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_cnt")),
        ["part_a", "part_b", "pair_cnt"],
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    got = _rows(
        baskets.select(F.explode(pair_structs).alias("_p"))
        .select("_p.part_a", "_p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_cnt")),
        ["part_a", "part_b", "pair_cnt"],
    )
    assert got == want


# ---------------------------------------------------------------------------
# fan_out conditional: the repartition is skipped exactly when the
# input already plans to >= n splits, and applied otherwise
# ---------------------------------------------------------------------------
def test_fan_out_skips_when_already_parallel(spark):
    wide = spark.range(0, 1000, 1, 8)
    assert fan_out(wide, min_partitions=4) is wide  # no Exchange at all
    narrow = spark.range(0, 1000, 1, 2)
    fanned = fan_out(narrow, min_partitions=4)
    assert fanned is not narrow
    assert fanned.rdd.getNumPartitions() == 4
    # values survive either path
    assert fanned.agg(F.sum("id")).first()[0] == wide.agg(F.sum("id")).first()[0]


# ---------------------------------------------------------------------------
# BPE merge application: per-row fold (_bpe_merge_syms) vs the pre-r13
# windowed gaps-and-islands/run-parity form — the formulation the
# DuckDB oracle twins (q137/q141/q174) replay CTE-for-CTE. The
# property tests already pin fold == pure-Python sequential encoder;
# this pins fold == windowed on the adversarial shapes: equal-symbol
# runs of every parity, runs interrupted mid-word, rules whose left
# side is itself a product of an earlier merge, and multi-char rule
# sides that overlap lexically.
# ---------------------------------------------------------------------------
def _bpe_apply_windowed_reference(state, rules):
    """Verbatim pre-r13 _bpe_merge_pair loop (carry=())."""
    for a, b in rules:
        e = state.select(
            "word", F.posexplode(F.split("syms", " ")).alias("pos0", "sym")
        ).withColumn("pos", F.col("pos0") + 1)
        w_word = Window.partitionBy("word").orderBy("pos")
        w_sym = Window.partitionBy("word", "sym").orderBy("pos")
        e = e.select(
            "word", "pos", "sym",
            F.lead("sym").over(w_word).alias("nxt"),
            (F.col("pos") - F.row_number().over(w_sym)).alias("grp"),
        )
        e = e.withColumn(
            "run_start",
            F.min("pos").over(Window.partitionBy("word", "sym", "grp")),
        )
        mstart = (
            (F.col("sym") == F.lit(a))
            & (F.col("nxt") == F.lit(b))
            & (F.lit(a != b) | ((F.col("pos") - F.col("run_start")) % 2 == 0))
        )
        e = e.withColumn("mstart", mstart).withColumn(
            "consumed", F.coalesce(F.lag("mstart").over(w_word), F.lit(False))
        )
        state = (
            e.where(~F.col("consumed"))
            .withColumn(
                "new_sym",
                F.when(F.col("mstart"), F.lit(a + b)).otherwise(F.col("sym")),
            )
            .groupBy("word")
            .agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "new_sym"))),
                        lambda x: x["new_sym"],
                    ),
                ).alias("syms")
            )
        )
    return state


def test_bpe_fold_matches_windowed_reference(spark):
    words = [
        "aaaa", "aaaaa", "aa", "a",            # run parity, both parities
        "baaab", "aabaa", "ababab", "abba",    # interrupted runs, a!=b chains
        "cabbage", "bbbbbb", "abcabc",
    ]
    rule_sets = [
        [("a", "a")],                          # pure run-parity
        [("a", "a"), ("aa", "aa")],            # merged symbol feeds next rule
        [("a", "b"), ("ab", "ab")],            # left side from earlier merge
        [("a", "b"), ("ab", "c"), ("b", "a")],
        [("b", "b"), ("a", "bb")],             # multi-char right side
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    for rules in rule_sets:
        got = {
            r["word"]: r["syms"]
            for r in T.bpe_apply_merges(df, rules).collect()
        }
        want = {
            r["word"]: r["syms"]
            for r in _bpe_apply_windowed_reference(
                T.bpe_symbolize(df).select("word", "syms"), rules
            ).collect()
        }
        assert got == want, rules


# ---------------------------------------------------------------------------
# pagerank_fixed_point: the assume_distinct/assume_symmetric fast path
# (r13 session 3) vs the default dedup + src-union-dst node derivation
# on the same symmetrized edge list — identical exact fixed-point ranks
# ---------------------------------------------------------------------------
def test_pagerank_assume_flags_match_default(spark):
    from _multi_source_retail_data_integration_hub_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # a deliberately lumpy little graph: a hub, a chain, a triangle,
    # an isolated pair — symmetrize and dedup exactly like q123 does
    raw = [
        ("c1", "s1"), ("c2", "s1"), ("c3", "s1"), ("c4", "s1"),  # hub s1
        ("c1", "s2"), ("c2", "s2"),                              # shared
        ("c5", "s3"), ("c5", "s4"),                              # chain
        ("c6", "s5"),                                            # leaf pair
        ("c1", "s1"),                                            # dup row
    ]
    pairs = spark.createDataFrame(raw, "c string, s string").distinct()
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))

    for iters in (1, 3):
        want = _rows(
            pagerank_fixed_point(edges, iterations=iters), ["node", "rank_fp"]
        )
        got = _rows(
            pagerank_fixed_point(
                edges,
                iterations=iters,
                assume_distinct=True,
                assume_symmetric=True,
            ),
            ["node", "rank_fp"],
        )
        assert got == want, iters


def test_connected_components_assume_distinct_matches_default(spark):
    from _multi_source_retail_data_integration_hub_spark.operators.graph import (
        connected_components,
    )

    # canonical a < b pairs: two chained components + an isolated edge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (4, 5), (7, 8)], "id_a long, id_b long"
    )
    want = _rows(connected_components(pairs), ["node", "cluster_id"])
    got = _rows(
        connected_components(pairs, assume_distinct=True),
        ["node", "cluster_id"],
    )
    assert got == want
