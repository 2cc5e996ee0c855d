"""Property-based tests (hypothesis): the distributed as-of join vs
pandas merge_asof, derived-column functions vs Python reference
implementations, and dedup invariants on random corpora.

Hypothesis drives the INPUT GENERATION; each example runs a real
(local) Spark job, so examples are capped low and deadlines disabled.
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators import text as T
from _multi_source_retail_data_integration_hub_spark.operators.asof import asof_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# as-of join == pandas merge_asof on random event tables
# ---------------------------------------------------------------------------
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # by-key
        st.integers(min_value=0, max_value=10_000),  # ts (seconds)
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)


@given(left_rows=events_strategy, right_rows=events_strategy)
@settings(**SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # dedupe right to one row per (key, ts): defined tie-break (max v)
    rdict = {}
    for k, ts, v in right_rows:
        rdict[(k, ts)] = max(v, rdict.get((k, ts), -math.inf))
    right_rows = [(k, ts, v) for (k, ts), v in rdict.items()]
    left_rows = [(i, k, ts) for i, (k, ts, _) in enumerate(left_rows)]

    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double")
    got = {
        r.lid: (r.ts_right, r.v_right)
        for r in asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["lid", "k", "ts"]).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="mergesort")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_r"))
    for row in merged.itertuples():
        want_ts = None if pd.isna(row.v) else int(rp[(rp.k == row.k) & (rp.ts <= row.ts)].ts.max())
        want_v = None if pd.isna(row.v) else float(row.v)
        assert got[row.lid] == (want_ts, want_v)


# ---------------------------------------------------------------------------
# dedup invariants on random corpora
# ---------------------------------------------------------------------------
corpus_strategy = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=40).filter(lambda s: s.strip()),
    min_size=1,
    max_size=15,
)


@given(texts=corpus_strategy)
@settings(**SETTINGS)
def test_exact_dedup_partitions_the_corpus(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    clusters = T.exact_dup_clusters(df, "text", "doc_id").collect()
    # clusters partition the corpus: sizes sum to n, canonicals distinct
    assert sum(r.n_docs for r in clusters) == len(texts)
    assert len({r.canonical_id for r in clusters}) == len(clusters)
    assert len(clusters) == len(set(texts))


@given(texts=corpus_strategy)
@settings(**SETTINGS)
def test_simhash_in_range_and_dup_invariant(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {r.doc_id: r.simhash for r in T.simhash(df, "text", "doc_id").collect()}
    assert all(0 <= v < 2**16 for v in out.values())
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(" ".join(t.split()), set()).add(out[i])
    # identical token sequences must have identical simhash
    for sims in by_text.values():
        assert len(sims) == 1


# ---------------------------------------------------------------------------
# derived functions vs Python reference semantics (SURVEY §7.4.2/8)
# ---------------------------------------------------------------------------
# domain is the post-clip range [18, 100] (P7 runs before binning);
# outside it pd.cut yields NaN while the engine's total CASE chain
# saturates — by design (SURVEY §7.4.2).
@given(ages=st.lists(st.integers(min_value=18, max_value=100), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_age_group_matches_pandas_cut_semantics(spark, ages):
    from _multi_source_retail_data_integration_hub_spark.functions.derived import age_group

    def ref(age):  # pd.cut(bins=[0,25,35,45,55,65,100], right=True)
        for hi, label in [(25, "18-25"), (35, "26-35"), (45, "36-45"),
                          (55, "46-55"), (65, "56-65"), (100, "65+")]:
            if age <= hi:
                return label
        return None

    df = spark.createDataFrame([(a,) for a in ages], "age int")
    got = [r[0] for r in df.select(age_group("age")).collect()]
    assert got == [ref(a) for a in ages]


@given(months=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_fiscal_quarter_matches_python_floor_mod(spark, months):
    from _multi_source_retail_data_integration_hub_spark.functions.derived import fiscal_quarter

    df = spark.createDataFrame([(f"2023-{m:02d}-15",) for m in months], "d string")
    got = [r[0] for r in df.select(fiscal_quarter(F.col("d").cast("date"))).collect()]
    assert got == [((m - 10) % 12) // 3 + 1 for m in months]


# ---------------------------------------------------------------------------
# interval join == naive all-pairs filter on random intervals/points
# ---------------------------------------------------------------------------
intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key
        st.integers(min_value=0, max_value=5_000),  # start (seconds)
        st.integers(min_value=0, max_value=3_000),  # length
    ),
    min_size=1,
    max_size=15,
)
points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=9_000),
    ),
    min_size=1,
    max_size=25,
)


@given(ivs=intervals_strategy, pts=points_strategy)
@settings(**SETTINGS)
def test_interval_join_matches_naive_filter(spark, ivs, pts):
    import datetime as dt

    from _multi_source_retail_data_integration_hub_spark.operators.ranges import (
        interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    iv_rows = [
        (k, i, ts(s), ts(s + ln)) for i, (k, s, ln) in enumerate(ivs)
    ]
    pt_rows = [(k, j, ts(s)) for j, (k, s) in enumerate(pts)]
    intervals = spark.createDataFrame(
        iv_rows, "key long, iv_id long, start_ts timestamp, end_ts timestamp"
    )
    points = spark.createDataFrame(pt_rows, "key long, pt_id long, ts timestamp")
    # bucket width must be >= max interval length for the fan-out bound
    got = {
        (r["iv_id"], r["pt_id"])
        for r in interval_join(
            intervals, points, on=["key"], bucket_seconds=3_000
        ).collect()
    }
    want = {
        (i, j)
        for i, (k1, s1, ln) in enumerate(ivs)
        for j, (k2, s2) in enumerate(pts)
        if k1 == k2 and s1 <= s2 < s1 + ln
    }
    assert got == want


# ---------------------------------------------------------------------------
# connected components == Python union-find on random edge lists
# ---------------------------------------------------------------------------
edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=25,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    from _multi_source_retail_data_integration_hub_spark.operators.graph import (
        connected_components,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 merge == in-memory reference over random snapshot sequences
# ---------------------------------------------------------------------------
snapshots_strategy = st.lists(  # 2-4 successive snapshots of up to 5 keys
    st.dictionaries(
        st.integers(min_value=1, max_value=5),  # business key
        st.integers(min_value=0, max_value=3),  # attribute value
        min_size=1,
        max_size=5,
    ),
    min_size=2,
    max_size=4,
)


@given(snaps=snapshots_strategy)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_scd2_merge_matches_reference_state_machine(spark, snaps):
    from _multi_source_retail_data_integration_hub_spark.operators.scd2 import (
        scd2_initial,
        scd2_merge,
    )

    def df_of(snap, ts):
        rows = [(k, v, f"h{v}") for k, v in sorted(snap.items())]
        return spark.createDataFrame(rows, "bk long, attr long, row_hash string")

    ts0 = "2024-01-01 00:00:00"
    dim = scd2_initial(df_of(snaps[0], ts0), ts0)

    # reference state machine: per key, list of (attr, start, end, current)
    ref: dict[int, list] = {
        k: [[v, ts0, None, True]] for k, v in snaps[0].items()
    }
    for i, snap in enumerate(snaps[1:], start=2):
        ts = f"2024-01-0{i} 00:00:00"
        dim = scd2_merge(dim, df_of(snap, ts), "bk", ts)
        for k, v in snap.items():
            if k not in ref:
                ref[k] = [[v, ts, None, True]]
            elif ref[k][-1][0] != v:
                ref[k][-1][2] = ts  # expire old current
                ref[k][-1][3] = False
                ref[k].append([v, ts, None, True])
            # unchanged or absent keys carry forward untouched

    got: dict[int, list] = {}
    for r in dim.orderBy("bk", "version").collect():
        got.setdefault(r["bk"], []).append(
            [r["attr"], str(r["effective_start_date"]), r["is_current"], r["version"]]
        )
    for k, versions in ref.items():
        assert len(got[k]) == len(versions), (k, got.get(k), versions)
        for vi, (attr, start, _end, current) in enumerate(versions, start=1):
            g_attr, g_start, g_current, g_version = got[k][vi - 1]
            assert (g_attr, g_start, g_current, g_version) == (
                attr, start, current, vi,
            ), (k, got[k], versions)


# ---------------------------------------------------------------------------
# BMP codec: encode/decode is the identity on random images (all widths
# exercise the 4-byte row padding), and nn_resize matches a naive
# per-pixel Python implementation.
# ---------------------------------------------------------------------------
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    out_h=st.integers(min_value=1, max_value=9),
    out_w=st.integers(min_value=1, max_value=9),
)
@settings(**SETTINGS)
def test_bmp_roundtrip_and_resize_properties(h, w, seed, out_h, out_w):
    import numpy as np

    from _multi_source_retail_data_integration_hub_spark.operators import (
        multimodal as M,
    )

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_bmp(M.encode_bmp(img)) == img).all()

    up = M.nn_resize(img, out_w, out_h)
    assert up.shape == (out_h, out_w, 3)
    for y in range(out_h):
        for x in range(out_w):
            sy = min(int((y + 0.5) * h / out_h), h - 1)
            sx = min(int((x + 0.5) * w / out_w), w - 1)
            assert (up[y, x] == img[sy, sx]).all()


# ---------------------------------------------------------------------------
# Chunking invariants on random token counts: chunks tile the document
# with the declared stride, the last chunk reaches the final token, and
# consecutive chunks overlap by exactly CHUNK_OVERLAP (when full-size).
# ---------------------------------------------------------------------------
@given(n_tokens=st.integers(min_value=1, max_value=400))
@settings(**SETTINGS)
def test_chunking_covers_document(spark, n_tokens):
    from _multi_source_retail_data_integration_hub_spark.plans.training_data import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        _STEP,
    )

    text = " ".join(f"t{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = T.tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).withColumn("n", F.size("toks"))
    n_chunks_col = F.when(F.col("n") <= CHUNK_TOKENS, F.lit(1)).otherwise(
        (1 + F.ceil((F.col("n") - CHUNK_TOKENS) / F.lit(float(_STEP)))).cast("int")
    )
    rows = (
        base.select(
            F.explode(F.sequence(F.lit(0), n_chunks_col - 1)).alias("k"),
            F.size(F.slice("toks", F.col("k") * _STEP + 1, CHUNK_TOKENS)).alias("len"),
        )
        .orderBy("k")
        .collect()
    )
    starts = [r.k * _STEP + 1 for r in rows]
    lens = [r.len for r in rows]
    # last chunk reaches the final token, no chunk is empty
    assert starts[-1] + lens[-1] - 1 == n_tokens
    assert all(ln > 0 for ln in lens)
    # consecutive full chunks overlap by exactly CHUNK_OVERLAP tokens
    for i in range(len(starts) - 1):
        assert starts[i + 1] - starts[i] == _STEP
        if lens[i] == CHUNK_TOKENS:
            assert starts[i] + CHUNK_TOKENS - starts[i + 1] == CHUNK_OVERLAP


# ---------------------------------------------------------------------------
# Bloom filter: no false negatives on ANY member set; outsiders only
# ever false-positive (never dropped). merge_partials: any split of
# the rows into base/delta merges to the full aggregate.
# ---------------------------------------------------------------------------
items_strategy = st.lists(
    st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=12),
    min_size=1,
    max_size=40,
)


@given(members=items_strategy, probes=items_strategy)
@settings(**SETTINGS)
def test_bloom_never_false_negative(spark, members, probes):
    from _multi_source_retail_data_integration_hub_spark.operators import (
        sketches as SK,
    )

    mdf = spark.createDataFrame([(m,) for m in members], "item string")
    words = SK.bloom_words(mdf, "item")
    out = SK.bloom_probe(
        spark.createDataFrame([(p,) for p in set(members) | set(probes)], "item string"),
        "item",
        words,
    )
    got = {r.item: r.might_contain for r in out.collect()}
    # every probe row surfaced, and every true member says "maybe"
    assert set(got) == set(members) | set(probes)
    assert all(got[m] == 1 for m in members)


sales_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=59),  # day offset within 2 months
        st.sampled_from(["O", "F", "P"]),
        st.floats(min_value=0.01, max_value=9999, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=sales_strategy, split=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_merge_partials_equals_full_on_any_split(spark, rows, split):
    import datetime as dt

    from _multi_source_retail_data_integration_hub_spark.plans.incremental import (
        merge_order_mart,
        partial_order_mart,
    )

    def df(rws):
        return spark.createDataFrame(
            [
                (dt.date(1995, 1, 1) + dt.timedelta(days=d), s, round(p, 2))
                for d, s, p in rws
            ],
            "o_orderdate date, o_orderstatus string, o_totalprice double",
        )

    base, delta = rows[:split], rows[split:]
    full = partial_order_mart(df(rows))
    # an empty side must be a clean no-op of the merge (df([]) with an
    # explicit schema gives empty partials, not a special case)
    merged = merge_order_mart(
        partial_order_mart(df(base)), partial_order_mart(df(delta))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


# ---------------------------------------------------------------------------
# Expectations engine: violation counts on ANY random dirty table must
# equal a pure-Python recount.
# ---------------------------------------------------------------------------
dirty_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),   # id
        st.one_of(st.none(), st.sampled_from(["O", "F", "P", "X", "y"])),
        st.one_of(
            st.none(),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=dirty_rows)
@settings(**SETTINGS)
def test_expect_summary_matches_python_recount(spark, rows):
    from _multi_source_retail_data_integration_hub_spark.operators import (
        expectations as E,
    )

    df = spark.createDataFrame(rows, "id int, status string, price double")
    out = {
        r.rule: r
        for r in E.expect_summary(
            df,
            rules=[
                E.not_null("id"),
                E.accepted_values("status", ["O", "F", "P"]),
                E.positive("price"),
                E.in_range("price", -5, 5),
            ],
            unique_cols=["id"],
        ).collect()
    }
    n = len(rows)
    want = {
        "id_not_null": sum(1 for r in rows if r[0] is None),
        "status_accepted_values": sum(
            1 for r in rows if r[1] is None or r[1] not in ("O", "F", "P")
        ),
        "price_positive": sum(1 for r in rows if r[2] is None or r[2] <= 0),
        "price_in_range": sum(
            1 for r in rows if r[2] is None or not (-5 <= r[2] <= 5)
        ),
        "id_unique": (lambda ids: len(ids) - len(set(ids)))(
            [r[0] for r in rows if r[0] is not None]
        ),
    }
    for rule, expect in want.items():
        got = out[rule]
        assert got.n_rows == n, rule
        assert got.n_violations == expect, rule
        assert got.passed == (1 if expect == 0 else 0), rule


# ---------------------------------------------------------------------------
# CDC mart maintenance == full recompute on random delete/update batches
# ---------------------------------------------------------------------------
cdc_strategy = st.tuples(
    # base fact rows: (group 0-2, price cents 1..10000)
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 10_000)),
        min_size=1,
        max_size=25,
    ),
    # per-row CDC ops drawn independently: 0=keep, 1=delete, 2=update
    st.lists(st.integers(0, 2), min_size=25, max_size=25),
    # update target group + price delta
    st.integers(0, 2),
    st.integers(1, 500),
)


@given(args=cdc_strategy)
@settings(**SETTINGS)
def test_cdc_merge_equals_recompute(spark, args):
    """cdc_merge_partials(base_state, signed_delta, rebase) must equal
    aggregating the post-CDC fact from scratch, for ANY mix of keeps /
    deletes / cross-group updates — the maintenance identity q121
    proves at corpus scale, here on adversarial random batches."""
    import pyspark.sql.functions as F  # noqa: PLC0415

    from _multi_source_retail_data_integration_hub_spark.plans.incremental import (
        cdc_merge_partials,
    )

    base_rows, ops, upd_group, upd_delta = args
    rows = [
        (i, g, p, ops[i]) for i, (g, p) in enumerate(base_rows)
    ]  # (row id, group, price, op)
    post = [
        (i, upd_group if op == 2 else g, p + upd_delta if op == 2 else p)
        for i, g, p, op in rows
        if op != 1
    ]

    def state(data, cols="g int, p long"):
        df = spark.createDataFrame([tuple(r) for r in data] or [(0, 0)], cols)
        if not data:
            df = df.limit(0)
        return df.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("p").cast("bigint").alias("s"),
            F.min("p").alias("mn"),
            F.max("p").alias("mx"),
        )

    base_state = state([(g, p) for _, g, p, _ in rows])
    # signed delta from the CDC batch
    signed_rows = []
    for i, g, p, op in rows:
        if op == 1:
            signed_rows.append((g, -1, -p))
        elif op == 2:
            signed_rows.append((g, -1, -p))
            signed_rows.append((upd_group, 1, p + upd_delta))
    if signed_rows:
        delta = spark.createDataFrame(signed_rows, "g int, w long, wp long").groupBy(
            "g"
        ).agg(F.sum("w").alias("n"), F.sum("wp").alias("s"))
    else:
        delta = base_state.select("g", "n", "s").limit(0)
    touched = [r.g for r in delta.select("g").distinct().collect()]
    rebase = state([(g, p) for _, g, p in post if g in touched]).select(
        "g", "mn", "mx"
    )
    got = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in cdc_merge_partials(
            base_state, delta, rebase, ["g"], ["n", "s"], ["mn", "mx"]
        ).collect()
    }
    want = {
        r.g: (r.n, r.s, r.mn, r.mx) for r in state([(g, p) for _, g, p in post]).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# BPE merge learning vs an independent pure-Python reference
# (Sennrich-style get_stats + leftmost-non-overlapping merge_word)
# on random weighted vocabularies — including adversarial runs of
# repeated characters (the run-parity case).
# ---------------------------------------------------------------------------
def _ref_bpe(words: list[tuple[str, int]], n_merges: int):
    state = {w: list(w) for w, _ in words}
    freqs = dict(words)
    out = []
    for rank in range(1, n_merges + 1):
        stats: dict = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + freqs[w]
        if not stats:
            break
        # argmax: count desc, pair asc (lexicographic)
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2  # leftmost non-overlapping
                else:
                    merged.append(syms[i])
                    i += 1
            state[w] = merged
        n_after = sum(freqs[w] * len(s) for w, s in state.items())
        out.append((rank, a, b, cnt, n_after))
    return out


vocab_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abc", min_size=2, max_size=8),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(vocab=vocab_strategy)
@settings(**SETTINGS)
def test_bpe_learn_merges_matches_reference(spark, vocab):
    got = [
        (r.merge_rank, r.pair_a, r.pair_b, r.pair_count, r.n_symbols_after)
        for r in T.bpe_learn_merges(
            spark.createDataFrame(vocab, "word string, freq long"), 2
        ).collect()
    ]
    assert got == _ref_bpe(vocab, 2)


def _ref_apply(word: str, rules: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in rules:
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2  # leftmost non-overlapping
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


@given(vocab=vocab_strategy)
@settings(**SETTINGS)
def test_bpe_apply_merges_matches_reference(spark, vocab):
    """Applying a FIXED learned rule list (operators/text.py::
    bpe_apply_merges) must reproduce the pure-Python leftmost-non-
    overlapping encoder on every word — including words the rules were
    not learned from (the corpus-wide application path of q141)."""
    rules = [(a, b) for _, a, b, _, _ in _ref_bpe(vocab, 2)]
    words = [w for w, _ in vocab] + ["cabbage", "aaaa"]
    got = {
        r["word"]: r["syms"].split(" ")
        for r in T.bpe_apply_merges(
            spark.createDataFrame([(w,) for w in set(words)], "word string"),
            rules,
        ).collect()
    }
    for w in set(words):
        assert got[w] == _ref_apply(w, rules), (w, rules)


# ---------------------------------------------------------------------------
# content_checksum: invariant under partitioning/row order (its whole
# contract), sensitive to any single-row mutation
# ---------------------------------------------------------------------------
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6),
                  st.text(alphabet="abc|:N", max_size=6)),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_content_checksum_order_and_partition_invariant(spark, rows, parts):
    from _multi_source_retail_data_integration_hub_spark.operators.maintenance import (
        content_checksum,
    )

    df = spark.createDataFrame(rows, "id long, payload string")
    fields = ["CAST(id AS STRING)", "payload"]
    base = content_checksum(df, fields).first()
    shuffled = content_checksum(
        df.repartition(parts, "payload").sortWithinPartitions("payload"), fields
    ).first()
    assert (base.n_rows, base.checksum) == (shuffled.n_rows, shuffled.checksum)
    # sensitivity: mutate one row's payload -> checksum moves
    mutated = spark.createDataFrame(
        [(rows[0][0], rows[0][1] + "x"), *rows[1:]], "id long, payload string"
    )
    got = content_checksum(mutated, fields).first()
    assert got.checksum != base.checksum


# ---------------------------------------------------------------------------
# cluster split leak-freedom: for ANY pair graph, both endpoints of
# every edge land in the same split (the q135 contract, end-to-end
# through connected_components + the keyed-hash assignment)
# ---------------------------------------------------------------------------
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=40),
                  st.integers(min_value=0, max_value=40)),
        min_size=1, max_size=25,
    ).map(lambda es: [(a, b) for a, b in es if a != b]),
)
@settings(**SETTINGS)
def test_cluster_split_never_separates_linked_docs(spark, edges):
    from _multi_source_retail_data_integration_hub_spark.operators.graph import (
        connected_components,
    )

    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = connected_components(pairs, "id_a", "id_b")
    bucket = F.pmod(
        F.conv(
            F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
                  ).substr(1, 8), 16, 10
        ).cast("bigint"),
        F.lit(10),
    )
    split = labels.select(
        "node",
        F.when(bucket < 8, "train").when(bucket == 8, "val")
        .otherwise("test").alias("split"),
    )
    a = split.withColumnRenamed("node", "id_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("node", "id_b").withColumnRenamed("split", "sb")
    leaked = (
        pairs.join(a, "id_a").join(b, "id_b").where("sa != sb").count()
    )
    assert leaked == 0


# ---------------------------------------------------------------------------
# cdc_chunks == pure-Python CDC reference on random corpora
# ---------------------------------------------------------------------------
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(40)]),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


def _cdc_py(tok_lists, mod):
    import hashlib

    out = {}
    for doc_id, toks in enumerate(tok_lists):
        chunks, cur = [], []
        for tok in toks:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            if h % mod == 0 and cur:
                chunks.append(cur)
                cur = []
            cur.append(tok)
        if cur:
            chunks.append(cur)
        out[doc_id] = chunks
    return out


@given(tok_lists=corpus_strategy)
@settings(**SETTINGS)
def test_cdc_chunks_match_python_reference(spark, tok_lists):
    import hashlib

    mod = T.CDC_CHUNK_MOD
    rows = [(i, " ".join(toks)) for i, toks in enumerate(tok_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in T.cdc_chunks(df, "text", "doc_id").collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, r.n_tokens, r.chunk_md5)
        )
    expected = _cdc_py(tok_lists, mod)
    for doc_id, toks in enumerate(tok_lists):
        chunks = expected.get(doc_id, [])
        g = sorted(got.get(doc_id, []))
        assert len(g) == len(chunks), f"doc {doc_id}: chunk count"
        pos = 0
        first_is_boundary = bool(toks) and (
            int(hashlib.md5(toks[0].encode()).hexdigest()[:8], 16) % mod == 0
        )
        base_id = 1 if first_is_boundary else 0
        for i, chunk in enumerate(chunks):
            cid, start, n, h = g[i]
            assert cid == base_id + i
            assert start == pos
            assert n == len(chunk)
            assert h == hashlib.md5(" ".join(chunk).encode()).hexdigest()
            pos += len(chunk)


# ---------------------------------------------------------------------------
# dsir_importance == pure-Python reference on random labeled corpora
# ---------------------------------------------------------------------------
labeled_corpus_strategy = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from([f"t{i}" for i in range(25)]),
            min_size=0,
            max_size=20,
        ),
        st.booleans(),  # target membership
    ),
    min_size=1,
    max_size=10,
)


@given(docs=labeled_corpus_strategy)
@settings(**SETTINGS)
def test_dsir_importance_matches_python_reference_random(spark, docs):
    from tests.test_training_ops import _dsir_py

    rows = [
        (i, " ".join(toks), "en" if is_t else "de")
        for i, (toks, is_t) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.n_feats, r.n_tgt_feats, r.score_bits)
        for r in T.dsir_importance(
            df, "text", "doc_id", F.col("lang") == "en"
        ).collect()
    }
    expected = _dsir_py(
        {i: t for i, t, _ in rows}, {i for i, _, lang in rows if lang == "en"}
    )
    assert got == expected
