"""Literature-anchored fixtures for the spec-derived operator families
(r9 verdict ask #3).

Oracle parity cannot catch shared-spec bugs: both the Spark plan and
its DuckDB twin are derived from the SAME reading of the paper, so a
misread lands green on both sides (round 9's q168 case-variant
stopword bug survived a green driver row exactly this way). These
tests pin EXACT output rows computed BY HAND from the published rule
definitions — Gopher's appendix A1 thresholds (Rae et al. 2021), the
DSIR importance-weight formula (Xie et al. 2023), plain cosine
geometry for SemDeDup (Abbas et al. 2023), winnowing validated
against Schleimer et al.'s own SIGMOD 2003 worked example, RRF
reciprocal ranks at k=60 (Cormack et al. 2009), dHash gradient
bits from crafted bitmaps, fixed-point PageRank rounds on the classic
3-page graph (Page et al. 1999), SimHash per-bit votes (Charikar
2002), MinHash affine-family mins from printed md5 digests (Broder
1997), count-min cell sums with a hand-found all-rows collision
(Cormode & Muthukrishnan 2005), and Bloom bit layout with a
hand-found false positive (Bloom 1970) — values derived outside both
engines, written here as literals.
"""

import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ---------------------------------------------------------------------------
# Gopher rule bundle (Rae et al. 2021, appendix A1) — every threshold
# boundary exercised by a crafted document that fails EXACTLY one rule
# (so a regression in any single rule flips exactly one expected row).
# ---------------------------------------------------------------------------

_GOPHER_DOCS = [
    # 1: passes every rule AT its boundary: exactly 50 words (min),
    #    2 distinct stopwords (min), mean word length 3.02 (just over
    #    the 3.00 floor). Leading "The" is capitalized on purpose — the
    #    r9 bug was stopword matching missing case variants.
    (1, " ".join(["The"] + ["the"] * 48 + ["that"])),
    # 2: 49 words — one short of the 50-word floor; all else passes
    (2, " ".join(["the"] * 47 + ["that", "have"])),
    # 3: mean word length 2.00 < 3.00 ("to"/"of" are both stopwords,
    #    so only the length rule fails)
    (3, " ".join(["to"] * 25 + ["of"] * 25)),
    # 4: mean word length 11.66 > 10.00
    (4, " ".join(["abcdefghijkl"] * 48 + ["the", "that"])),
    # 5: 11 of 50 words have no alphabetic character: 78% < 80% floor
    (5, " ".join(["the"] * 37 + ["have"] * 2 + ["1234"] * 11)),
    # 6: 6 '#' symbols over 50 words: 0.12 > 0.10 symbol-ratio cap
    #    ("cc#" keeps every word alphabetic so only the symbol rule fails)
    (6, " ".join(["cc#"] * 6 + ["the"] * 42 + ["that", "have"])),
    # 7: 10 of 10 lines bullet-led: 100% > 90% cap (the "-" tokens
    #    leave 50/60 words alphabetic, still >= the 80% floor)
    (7, "\n".join(["- the that brown foxes jumped"] * 10)),
    # 8: 4 of 10 lines ellipsis-ended: 40% > 30% cap (4 ellipses over
    #    60 words keep the symbol ratio at 0.066, inside its cap)
    (
        8,
        "\n".join(
            ["the that brown foxes jumped here..."] * 4
            + ["the that brown foxes jumped here"] * 6
        ),
    ),
    # 9: only one distinct stopword ("the") — below the 2 floor
    (9, " ".join(["brown"] * 49 + ["the"])),
    # 10: empty document — NULL ratio metrics must FAIL their rules,
    #     not pass vacuously
    (10, ""),
    # 11: stopwords present ONLY as case variants ("THE"/"That") —
    #     the exact r9 q168 regression shape; must pass the stopword rule
    (11, " ".join(["THE"] * 25 + ["That"] * 25)),
]

# (id, n_words, mwl_x100, alpha_ppm, symbol_x1000, bullet_ppm,
#  ellipsis_ppm, n_stopwords, f_word_count, f_mean_word_len, f_alpha,
#  f_symbol, f_bullet, f_ellipsis, f_stop, passes_gopher) — every value
# computed by hand from the texts above and the A1 thresholds
# (50 <= words <= 100k; 3 <= mean word len <= 10; >= 80% alphabetic
# words; symbol ratio <= 0.1; <= 90% bullet lines; <= 30% ellipsis
# lines; >= 2 distinct stopwords), using truncating integer division
# for the scaled ratios.
_GOPHER_EXPECTED = [
    (1, 50, 302, 1_000_000, 0, 0, 0, 2, 1, 1, 1, 1, 1, 1, 1, 1),
    (2, 49, 304, 1_000_000, 0, 0, 0, 3, 0, 1, 1, 1, 1, 1, 1, 0),
    (3, 50, 200, 1_000_000, 0, 0, 0, 2, 1, 0, 1, 1, 1, 1, 1, 0),
    (4, 50, 1166, 1_000_000, 0, 0, 0, 2, 1, 0, 1, 1, 1, 1, 1, 0),
    (5, 50, 326, 780_000, 0, 0, 0, 2, 1, 1, 0, 1, 1, 1, 1, 0),
    (6, 50, 304, 1_000_000, 120, 0, 0, 3, 1, 1, 1, 0, 1, 1, 1, 0),
    (7, 60, 400, 833_333, 0, 1_000_000, 0, 2, 1, 1, 1, 1, 0, 1, 1, 0),
    (8, 60, 470, 1_000_000, 66, 0, 400_000, 2, 1, 1, 1, 1, 1, 0, 1, 0),
    (9, 50, 496, 1_000_000, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0),
    (10, 0, None, None, None, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0),
    (11, 50, 350, 1_000_000, 0, 0, 0, 2, 1, 1, 1, 1, 1, 1, 1, 1),
]


def test_gopher_rules_match_hand_computed_a1_values(spark):
    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        gopher_rules,
    )

    df = spark.createDataFrame(_GOPHER_DOCS, "doc_id long, text string")
    got = _rows(
        gopher_rules(df, "text", "doc_id"),
        "doc_id",
        "n_words",
        "mwl_x100",
        "alpha_ppm",
        "symbol_x1000",
        "bullet_ppm",
        "ellipsis_ppm",
        "n_stopwords",
        "f_word_count",
        "f_mean_word_len",
        "f_alpha",
        "f_symbol",
        "f_bullet",
        "f_ellipsis",
        "f_stop",
        "passes_gopher",
    )
    assert got == _GOPHER_EXPECTED


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023) — 4-document corpus whose
# hashed-bigram counts are small enough to enumerate by hand.
# ---------------------------------------------------------------------------

_DSIR_DOCS = [
    (1, "x y x y"),  # target; bigrams {x y: 2, y x: 1}
    (2, "x y z"),  # target; bigrams {x y: 1, y z: 1}
    (3, "p q p q p"),  # raw; bigrams {p q: 2, q p: 2}
    (4, "x y q"),  # raw; bigrams {x y: 1, y q: 1}
]

# Hand-derived model (target = docs 1-2):
#   c_raw: x y=4, y x=1, y z=1, p q=2, q p=2, y q=1   (raw_total=11)
#   c_tgt: x y=3, y x=1, y z=1                        (tgt_total=5)
# score_bits = sum_f cnt*(bitlen(c_tgt+1) - bitlen(c_raw+1))
#              + n_feats*(bitlen(raw_total+1) - bitlen(tgt_total+1))
# doc 1: 2*(bl(4)-bl(5)) + 1*(bl(2)-bl(2)) + 3*(bl(12)-bl(6)) = 0+0+3 = 3
# doc 2: 0 + 0 + 2*1 = 2
# doc 3: 2*(bl(1)-bl(3)) + 2*(bl(1)-bl(3)) + 4*1 = -2-2+4 = 0
# doc 4: 0 + 1*(bl(1)-bl(2)) + 2*1 = -1+2 = 1
_DSIR_EXPECTED = [
    (1, True, 3, 3, 3),
    (2, True, 2, 2, 2),
    (3, False, 4, 0, 0),
    (4, False, 2, 1, 1),
]


def test_dsir_importance_matches_hand_computed_weights(spark):
    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        DSIR_BUCKETS,
        dsir_importance,
    )

    # the hand derivation assumes the six bigrams occupy six DISTINCT
    # hash buckets — verify with an independent third implementation
    # (Python's hashlib, the same md5 recipe) so a future bucket-count
    # change can't silently invalidate the expected literals
    grams = ["x y", "y x", "y z", "p q", "q p", "y q"]
    buckets = {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS
        for g in grams
    }
    assert len(buckets) == len(grams)

    df = spark.createDataFrame(_DSIR_DOCS, "doc_id long, text string")
    got = _rows(
        dsir_importance(df, "text", "doc_id", F.col("doc_id") <= 2),
        "doc_id",
        "is_target",
        "n_feats",
        "n_tgt_feats",
        "score_bits",
    )
    assert got == _DSIR_EXPECTED


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023) — three vectors with hand-known cosines
# exercising the documented PAIRWISE drop rule where it diverges from
# connected-component semantics.
# ---------------------------------------------------------------------------


def test_semdedup_matches_hand_computed_cosines(spark):
    """cos(1,2) = 0.800, cos(1,3) ~= 0.9488, cos(2,3) ~= 0.9486
    (plain 2-D geometry: v3 sits on the bisector of v1 and v2, which
    are 36.87 degrees apart). At threshold 0.9 the similarity edges
    are (1,3) and (2,3): the pairwise rule keeps {1, 2} and drops 3
    (no lower-id mate is directly similar to 2), where one-per-
    transitive-group semantics would keep only {1}. The cosines sit
    ~0.05 from the threshold, far beyond the <= ~0.002 wiggle of the
    floor(x*1000) quantization. Id 3 is the fixture's single IVF
    centroid (3 % 31 == 3), so all vectors share list_id 3 and every
    pair is compared."""
    from _multi_source_retail_data_integration_hub_spark.operators.similarity import (
        semdedup,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.8, 0.6]),
            (3, [0.949, 0.316]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = _rows(semdedup(df, "vec_id", "embedding", 0.9), "vec_id", "list_id", "kept")
    assert got == [(1, 3, 1), (2, 3, 1), (3, 3, 0)]


# ---------------------------------------------------------------------------
# Okapi BM25 (Robertson & Zaragoza 2009; k1=1.2, b=0.75) — a 4-document
# corpus whose term statistics reduce to hand-derived fractions.
# ---------------------------------------------------------------------------


def test_bm25_matches_hand_computed_okapi_scores(spark, tmp_path):
    """Corpus: doc 1 "spark spark vector" (dl=3), doc 2 "spark merge"
    (dl=2), doc 3 no query terms (dl=4), doc 4 "vector" (dl=1);
    N=4, avgdl=10/4=2.5. Hand-derived statistics for the fixed
    benchmark query [spark, vector, merge]:
      df(spark)=df(vector)=2 -> idf = ln((4-2+0.5)/(2+0.5)+1) = ln 2
      df(merge)=1            -> idf = ln((3.5/1.5)+1)        = ln 10/3
      saturation tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)):
        tf=2, dl=3: 4.4/3.38    tf=1, dl=3: 2.2/2.38
        tf=1, dl=2: 2.2/2.02    tf=1, dl=1: 2.2/1.66
    Expected ranking: doc 2 (rare 'merge' dominates) > doc 1 > doc 4;
    doc 3 matches nothing and must be absent. Scores are asserted to
    the operator's 9-decimal rounding contract with 2e-9 slack (the
    hand fractions and the plan may differ in the last ulp)."""
    from _multi_source_retail_data_integration_hub_spark.plans.training_data import (
        BM25_TERMS,
        q122_bm25_search,
    )

    assert BM25_TERMS == ["spark", "vector", "merge"]  # anchors the math below
    docs = [
        (1, "spark spark vector"),
        (2, "spark merge"),
        (3, "alpha beta gamma delta"),
        (4, "vector"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "fixture", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    ln2, lnm = math.log(2.0), math.log(10.0 / 3.0)
    expected = [
        (1, 2, 2, ln2 * (2.2 / 2.02) + lnm * (2.2 / 2.02)),  # doc 2
        (2, 1, 2, ln2 * (4.4 / 3.38) + ln2 * (2.2 / 2.38)),  # doc 1
        (3, 4, 1, ln2 * (2.2 / 1.66)),  # doc 4
    ]
    got = _rows(
        q122_bm25_search(spark, str(tmp_path)), "rank", "doc_id", "n_matched", "score"
    )
    assert [(r, d, n) for r, d, n, _ in got] == [
        (r, d, n) for r, d, n, _ in expected
    ]
    for (_, _, _, got_score), (_, _, _, want) in zip(got, expected):
        assert got_score == pytest.approx(round(want, 9), abs=2e-9)


# ---------------------------------------------------------------------------
# Temperature-rebalanced mixture weights (mT5 / XLM-R, T=2: w_i
# proportional to share_i^(1/2)) — three strata whose square roots are
# exact integers, so every output is hand-derivable.
# ---------------------------------------------------------------------------


def test_temperature_weights_match_hand_computed_t2(spark):
    """Strata token counts 10000 / 100 / 400 -> sqrt 100 / 10 / 20;
    totals 10500 and 130. Hand-derived ppm outputs (truncating
    division): shares 952380 / 9523 / 38095; T=2 weights 769230 /
    76923 / 153846. The published property this anchors: the head
    stratum is boosted DOWN (-183150 ppm) and both tails UP (+67400,
    +115751) — temperature flattening, with weights still ordered by
    size."""
    from _multi_source_retail_data_integration_hub_spark.operators.sampling import (
        temperature_weights,
    )

    totals = spark.createDataFrame(
        [("head", 10_000), ("tail_b", 100), ("tail_c", 400)],
        "lang string, n_tokens long",
    )
    got = _rows(
        temperature_weights(totals, "lang", "n_tokens"),
        "lang",
        "n_tokens",
        "share_ppm",
        "temp_weight_ppm",
        "boost_ppm",
    )
    assert got == [
        ("head", 10_000, 952_380, 769_230, -183_150),
        ("tail_b", 100, 9_523, 76_923, 67_400),
        ("tail_c", 400, 38_095, 153_846, 115_751),
    ]


# ---------------------------------------------------------------------------
# Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003) — r10 verdict
# ask #6. The reference implementation below is the paper's Figure-5
# procedure (select each w-window's minimum gram hash, rightmost on
# ties) written directly from the paper's definition; it is first
# validated against the paper's OWN worked example (its published hash
# sequence and published fingerprint set), then applied — with
# hashlib.md5, outside both engines — to a crafted token corpus whose
# resulting summary rows are pinned as literals for the Spark operator.
# ---------------------------------------------------------------------------

_WINNOW_POS_SPACE = 1 << 22  # packing contract of operators/text.py


def _winnow_reference(hashes, w):
    """The paper's winnowing selection over a gram-hash sequence:
    {(hash, pos)} with min-per-window, rightmost tie-break — expressed
    through the same packed key the engines use (smaller hash wins;
    equal hashes -> larger pos wins because pos is stored inverted)."""
    keys = [
        h * _WINNOW_POS_SPACE + (_WINNOW_POS_SPACE - 1 - p)
        for p, h in enumerate(hashes)
    ]
    sel = set()
    for s in range(len(keys) - w + 1):
        sel.add(min(keys[s : s + w]))
    return sel


def _unpack(key):
    return key // _WINNOW_POS_SPACE, _WINNOW_POS_SPACE - 1 - key % _WINNOW_POS_SPACE


def test_winnow_reference_reproduces_papers_worked_example():
    """Schleimer et al. Figure 5: hashes of the 5-grams of
    'adorunrunrunadorunrun' are published as
    77 74 42 17 98 50 17 98 8 88 67 39 77 74 42 17 98 and the
    winnowed fingerprint set (w=4) as [17,3] [17,6] [8,8] [39,11]
    [17,15]. The reference implementation must reproduce it exactly,
    including both tie-break selections of hash 17."""
    paper_hashes = [77, 74, 42, 17, 98, 50, 17, 98, 8, 88, 67, 39, 77, 74, 42, 17, 98]
    got = sorted(_unpack(k) for k in _winnow_reference(paper_hashes, w=4))
    assert got == [(8, 8), (17, 3), (17, 6), (17, 15), (39, 11)]


def test_winnowing_fingerprints_match_reference_selection(spark):
    """The Spark operator's per-doc summary vs literals derived by
    running the paper-validated reference over hashlib.md5 gram hashes
    (operators/text.py's engine-portable first-8-md5-hex-digits
    family). Docs exercise: a repeated-passage text (d1), a
    tie-break-heavy alternating text whose grams repeat within single
    windows (d2), a text sharing a >= w+k-1 = 6-token run with d1
    (d3 — the paper's match guarantee), and a 5-token text with no
    full window (d4 — excluded by contract)."""
    import hashlib as _hl

    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        winnowing_fingerprints,
        winnowing_matches,
    )

    docs = [
        (1, "do run run run a do run run do run run run a do"),
        (2, "a b a b a b a b a b"),
        (3, "x y z do run run run a do q r s"),
        (4, "too short for one window"),
    ]
    k, w = 3, 4

    # reference selection, computed outside both engines
    expected = {}
    for doc_id, text in docs:
        toks = text.split()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(grams) < w:
            continue
        hashes = [
            int(_hl.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        sel = _winnow_reference(hashes, w)
        expected[doc_id] = (
            len(grams),
            len(grams) - w + 1,
            len(sel),
            sum(key % 1_000_000_007 for key in sel),
        )
    # pin the derived values as literals so a drift in the reference
    # itself (or in md5 slicing) cannot silently move the target
    assert expected == {
        1: (12, 9, 4, 1706037155),
        2: (8, 5, 3, 2239333698),
        3: (10, 7, 3, 1260152706),
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_windows, r.n_fingerprints, r.fp_set_checksum)
        for r in winnowing_fingerprints(df, "text", "doc_id", k=k, w=w).collect()
    }
    assert got == expected  # d4 absent on both sides

    # the paper's guarantee: d1 and d3 share the 6-token run
    # 'do run run run a do' (= exactly w+k-1 tokens), so they MUST
    # share at least one fingerprint hash
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_matches(
            df, "text", "doc_id", k=k, w=w, min_shared=1
        ).collect()
    }
    assert pairs.get((1, 3), 0) >= 1


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion (Cormack, Clarke, Büttcher, SIGIR 2009) —
# r10 verdict ask #6: a 3-doc-per-leg, 2-ranker case with every fused
# score computed by hand from the paper's 1/(k+rank) formula at the
# standard k=60, scaled integer-exact as 1000000 DIV (60 + rank):
#   rank 1 -> 1000000 // 61 = 16393   (61 * 16393 = 999973)
#   rank 2 -> 1000000 // 62 = 16129   (62 * 16129 = 999998)
#   rank 3 -> 1000000 // 63 = 15873   (63 * 15873 = 999999)
# ---------------------------------------------------------------------------


def test_rrf_fusion_matches_hand_computed_reciprocal_ranks(spark):
    from _multi_source_retail_data_integration_hub_spark.plans.training_data import (
        rrf_fuse,
    )

    bm = spark.createDataFrame(
        [(101, 1), (202, 2), (303, 3)], "doc_id long, bm25_rank long"
    )
    ann = spark.createDataFrame(
        [(202, 1), (101, 2), (404, 3)], "doc_id long, ann_rank long"
    )
    got = _rows(
        rrf_fuse(bm, ann, k=60, topk=10),
        "rank",
        "doc_id",
        "bm25_rank",
        "ann_rank",
        "rrf_milli",
    )
    # 101: 16393 + 16129 = 32522; 202: 16129 + 16393 = 32522 (exact
    # tie -> doc_id ascending orders 101 first); 303/404 appear in one
    # leg only, the absent leg contributes 0 and reports the 0
    # sentinel; their 15873 tie again breaks by doc_id.
    assert got == [
        (1, 101, 1, 2, 32522),
        (2, 202, 2, 1, 32522),
        (3, 303, 3, 0, 15873),
        (4, 404, 0, 3, 15873),
    ]


# ---------------------------------------------------------------------------
# dHash (Krawetz's difference hash, the perceptual-hash scheme of
# image-dedup services) — r10 verdict ask #6: crafted bitmaps whose
# horizontal gradient signs are known BY HAND pin the exact packed
# value, through the same BMP encode -> decode round trip the q165
# pipeline runs.
# ---------------------------------------------------------------------------


def test_dhash_matches_hand_derived_gradient_bits():
    import numpy as np

    from _multi_source_retail_data_integration_hub_spark.operators.multimodal import (
        decode_bmp,
        dhash_bits,
        encode_bmp,
    )

    # classic 9-wide x 8-tall form, 8x8 = 64 bits: a strictly
    # increasing row gradient sets EVERY bit; its mirror sets none
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    img_inc = np.repeat(inc[:, :, None], 3, axis=2).astype(np.uint8)
    assert dhash_bits(img_inc) == (1 << 64) - 1
    assert dhash_bits(img_inc[:, ::-1]) == 0

    # q165's 8-wide x 6-tall source (7x6 = 42 bits), each pixel triple
    # one ASCII char so gray == the char code exactly; per row:
    #   row 0  a b c d e f g h   increasing        -> bits 0..6
    #   row 1  m m m m m m m m   constant (strict >) -> none
    #   row 2  h g f e d c b a   decreasing        -> none
    #   row 3  a z a z a z a z   up/down alternate -> bits 21,23,25,27
    #   row 4  a a b b c c d d   pairwise steps    -> bits 29,31,33
    #   row 5  z a a a a a a a   single drop       -> none
    # value = (2^7 - 1) + 2^21 + 2^23 + 2^25 + 2^27 + 2^29 + 2^31 + 2^33
    #       = 11_452_547_199
    rows = ["abcdefgh", "mmmmmmmm", "hgfedcba", "azazazaz", "aabbccdd", "zaaaaaaa"]
    img = np.array(
        [[[ord(c)] * 3 for c in row] for row in rows], dtype=np.uint8
    )
    expected = (1 << 7) - 1
    for b in (21, 23, 25, 27, 29, 31, 33):
        expected |= 1 << b
    assert expected == 11_452_547_199
    assert dhash_bits(img) == expected
    # through the REAL codec, exactly as q165 computes it
    assert dhash_bits(decode_bmp(encode_bmp(img))) == expected


# ---------------------------------------------------------------------------
# PageRank (Page, Brin, Motwani, Winograd 1999) — the classic 3-page
# example graph (A->B, A->C, B->C, C->A) through the engine's exact
# fixed-point integer arithmetic, every round computed BY HAND from
# the update rule rank' = base + (85 * sum(rank div outdeg)) div 100
# with base = 150_000 and start rank = 1_000_000:
#   iter1: A = 150000 + 850000            = 1_000_000
#          B = 150000 + 85*500000 div 100 =   575_000
#          C = 150000 + 85*(500000+1000000) div 100 = 1_425_000
#   iter2: A = 150000 + 85*1425000 div 100 = 1_361_250
#          B = 150000 + 85*500000  div 100 =   575_000
#          C = 150000 + 85*(500000+575000) div 100 = 1_063_750
#   iter3: A = 150000 + 85*1063750 div 100 = 1_054_187  (trunc div)
#          B = 150000 + 85*680625  div 100 =   728_531  (trunc div)
#          C = 150000 + 85*(680625+575000) div 100 = 1_217_281
# The truncating divisions (1361250 div 2 = 680625; 90418750 div 100 =
# 904187; 57853125 div 100 = 578531; 106728125 div 100 = 1067281) are
# exactly where a float implementation would diverge — the fixture
# pins them.
# ---------------------------------------------------------------------------


def test_pagerank_matches_hand_computed_fixed_point_rounds():
    from pyspark.sql import SparkSession

    from _multi_source_retail_data_integration_hub_spark.operators.graph import (
        pagerank_fixed_point,
    )

    spark = SparkSession.getActiveSession()
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")],
        "src string, dst string",
    )
    after1 = {
        r.node: r.rank_fp for r in pagerank_fixed_point(edges, iterations=1).collect()
    }
    assert after1 == {"A": 1_000_000, "B": 575_000, "C": 1_425_000}
    after3 = {
        r.node: r.rank_fp for r in pagerank_fixed_point(edges, iterations=3).collect()
    }
    assert after3 == {"A": 1_054_187, "B": 728_531, "C": 1_217_281}


# ---------------------------------------------------------------------------
# SimHash (Charikar, STOC 2002, the per-feature-vote form) — r11
# extension of the fixture family: the engine's projection is "token
# votes +1 on bit i iff hex digit i of md5(token) >= 8; doc bit i set
# iff 2*ones >= n (ties SET); bits pack little-endian". Two of the
# pinned values are fully hand-derivable from the printed digests;
# the multi-token value comes from the same rule applied via
# hashlib.md5 outside both engines.
# ---------------------------------------------------------------------------


def test_simhash_matches_hand_derived_votes(spark):
    import hashlib as _hl

    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        simhash,
    )

    # md5("single") = dd5c07036f2975ff... — digits 1..16 are
    # d d 5 c 0 7 0 3 6 f 2 9 7 5 f f; >= 8 at i = 1,2,4,10,12,15,16
    # -> 1 + 2 + 8 + 512 + 2048 + 16384 + 32768 = 51_723
    # md5("a") = 0cc175b9c0f1b6a8..., md5("b") = 92eb5ffee6ae2fec...:
    # with n=2 a bit is set iff EITHER digit >= 8 (the 2*ones >= n tie
    # rule) — unset only at i=5 (7,5) and i=10 (0,6)
    # -> 65535 - 16 - 512 = 65_007
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a b"),
        (4, "single"),
    ]

    def ref(text, bits=16):
        toks = text.split()
        n = len(toks)
        h = 0
        for i in range(1, bits + 1):
            ones = sum(
                1
                for t in toks
                if int(_hl.md5(t.encode()).hexdigest()[i - 1], 16) >= 8
            )
            if 2 * ones >= n:
                h |= 1 << (i - 1)
        return h

    expected = {doc_id: ref(text) for doc_id, text in docs}
    assert expected[4] == 51_723  # hand-derived above
    assert expected[3] == 65_007  # hand-derived above
    assert expected[1] == expected[2] == 53_222  # identical text, same hash

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# MinHash (Broder 1997, via the Carter-Wegman affine family over one
# md5 per shingle) — r11 extension: the property/oracle tests check
# permutation-min INVARIANTS, but the hash spec itself (which digest
# substring becomes (a, b), the modulus, the band concat) is shared
# with the DuckDB twin by construction. This fixture re-derives every
# value from hashlib.md5 OUTSIDE both engines. "the cat sat on the
# mat" has exactly 4 distinct 3-token shingles; their printed digests:
#   md5("the cat sat") = f52864162b55874e... a=4113064982 b=727025486
#   md5("cat sat on")  = abf43089e03714fc... a=2884907145 b=3761706236
#   md5("sat on the")  = 53c08de1c082feb3... a=1405128161 b=3229810355
#   md5("on the mat")  = 9afe7a76c8c2518e... a=2600368758 b=3368178062
# mh_s = min over shingles of (a + s*b) mod 4294967291; e.g. mh00 =
# min(a) = 1405128161 and mh01 = min(545123177, 2351645 + P ...) —
# the 16 mins below are computed by the `ref` closure from those
# digests, and band0 = md5("mh00|mh01|mh02|mh03" as decimal strings).
# ---------------------------------------------------------------------------


def test_minhash_signature_matches_hashlib_derivation(spark):
    import hashlib as _hl

    from _multi_source_retail_data_integration_hub_spark.operators.text import (
        MINHASH_P,
        minhash_signatures,
    )

    text = "the cat sat on the mat"
    toks = text.split()
    shingle_set = []
    for i in range(len(toks) - 2):
        s = " ".join(toks[i : i + 3])
        if s not in shingle_set:
            shingle_set.append(s)
    assert len(shingle_set) == 4

    ab = []
    for s in shingle_set:
        h = _hl.md5(s.encode()).hexdigest()
        ab.append((int(h[0:8], 16), int(h[8:16], 16)))
    assert ab[0] == (4113064982, 727025486)  # printed digest above

    expected_mh = [
        min((a + s * b) % MINHASH_P for a, b in ab) for s in range(16)
    ]
    # spot-pin the two ends as literals so a drift in the ref closure
    # itself (not just the engine) is caught:
    assert expected_mh[0] == 1_405_128_161  # = min ha, s=0 is identity
    assert expected_mh[15] == 1_583_432_196
    expected_bands = [
        _hl.md5(
            "|".join(str(expected_mh[b * 4 + j]) for j in range(4)).encode()
        ).hexdigest()
        for b in range(4)
    ]
    assert expected_bands[0] == "fad1d7bb952c18f13eee0b54d5565d8c"

    df = spark.createDataFrame(
        [(1, text), (2, "the cat sat on the mat extra")],
        "doc_id long, text string",
    )
    row = {
        r.doc_id: r for r in minhash_signatures(df, "text", "doc_id").collect()
    }
    got_mh = [row[1][f"mh{s:02d}"] for s in range(16)]
    assert got_mh == expected_mh
    got_bands = [row[1][f"band{b}"] for b in range(4)]
    assert got_bands == expected_bands
    # doc 2 is a superset (one extra shingle): every mh component must
    # be <= doc 1's (adding a set element can only lower a min)
    assert all(
        row[2][f"mh{s:02d}"] <= expected_mh[s] for s in range(16)
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the cell layout
# under the seeded-md5 family md5('cms<row>:' || item), first 32 bits
# mod width, re-derived via hashlib at depth 4 x width 4 on the corpus
# {alpha:3, beta:2, gamma:1, delta:5, tok0:1}. At width 4 the rows
# collide heavily (row 0 buckets: alpha->2, beta->2, delta->0,
# gamma->3, tok0->3), every cell below is the hand-summed collision
# total, and the MIN over rows recovers the exact count for all items
# EXCEPT tok0, which shares a cell with some other item in ALL FOUR
# rows (gamma in row 0, heavier items in rows 1-3) — the canonical
# CMS one-sided error (estimate 2 > true 1, never under).
# ---------------------------------------------------------------------------


def test_cms_cells_and_estimates_match_hashlib_derivation(spark):
    import hashlib as _hl

    from _multi_source_retail_data_integration_hub_spark.operators import (
        sketches as SK,
    )

    corpus = [("alpha", 3), ("beta", 2), ("gamma", 1), ("delta", 5), ("tok0", 1)]
    depth, width = 4, 4

    def bucket(item, r):
        return int(_hl.md5(f"cms{r}:{item}".encode()).hexdigest()[0:8], 16) % width

    expected_cells: dict = {}
    for item, w in corpus:
        for r in range(depth):
            k = (r, bucket(item, r))
            expected_cells[k] = expected_cells.get(k, 0) + w
    # spot-pin two cells as literals (row 3 bucket 2 collects alpha +
    # gamma + delta + tok0 = 10; row 1 bucket 3 collects gamma + delta
    # + tok0 = 7) so the derivation itself is anchored:
    assert expected_cells[(3, 2)] == 10
    assert expected_cells[(1, 3)] == 7

    items = spark.createDataFrame(corpus, "token string, cnt long")
    counters = SK.cms_counters(
        items, "token", weight_col="cnt", depth=depth, width=width
    )
    got_cells = {
        (r.row_id, r.bucket): r.counter for r in counters.collect()
    }
    assert got_cells == expected_cells

    est = {
        r.token: r.cms_count
        for r in SK.cms_estimates(
            items, "token", counters, depth=depth, width=width
        ).collect()
    }
    truth = dict(corpus)
    expected_est = {
        item: min(expected_cells[(r, bucket(item, r))] for r in range(depth))
        for item, _ in corpus
    }
    assert est == expected_est
    # CMS guarantee: never under; and tok0 IS the strict over-estimate
    assert all(est[i] >= truth[i] for i in truth)
    assert est["tok0"] == 2 and truth["tok0"] == 1
    assert all(est[i] == truth[i] for i in truth if i != "tok0")


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — bit layout under the seeded-md5 family
# md5('bf<hash>:' || item) mod bits, re-derived via hashlib at 32 bits
# x 4 hashes for members {alpha, beta}: alpha sets bits {20,12,6,11},
# beta sets {8,19,9,26}, so word 0 = 0b...0100000110010000110101001
# 1000000 = 68_688_704 and no other word row exists. "w45" hashes to
# bits [11,19,19,9] — ALL already set by the members — making it a
# hand-found FALSE POSITIVE; "gamma" hashes to [28,6,29,11] where bit
# 28 is unset (true negative). False negatives are impossible by the
# theorem; both probe verdicts below are pinned from the hashlib
# filter, not from the engine.
# ---------------------------------------------------------------------------


def test_bloom_words_and_probe_match_hashlib_derivation(spark):
    import hashlib as _hl

    from _multi_source_retail_data_integration_hub_spark.operators import (
        sketches as SK,
    )

    bits, hashes = 32, 4
    members = ["alpha", "beta"]

    def bit(item, i):
        return int(_hl.md5(f"bf{i}:{item}".encode()).hexdigest()[0:8], 16) % bits

    assert [bit("alpha", i) for i in range(hashes)] == [20, 44 % 32, 6, 11]
    expected_word = 0
    for m in members:
        for i in range(hashes):
            expected_word |= 1 << (bit(m, i) % 32)
    assert expected_word == 68_688_704  # hand-ORed above

    mdf = spark.createDataFrame([(m,) for m in members], "item string")
    words = SK.bloom_words(mdf, "item", hashes=hashes, bits=bits)
    got = {(r.word_idx, r.word) for r in words.collect()}
    assert got == {(0, expected_word)}

    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("w45",), ("gamma",)], "item string"
    )
    verdicts = {
        r.item: r.might_contain
        for r in SK.bloom_probe(
            probes, "item", words, hashes=hashes, bits=bits
        ).collect()
    }
    # w45: hashlib bits [11, 19, 19, 9] all set -> false positive;
    # gamma: bit 28 unset -> negative. Members always hit (no false
    # negatives, Bloom's theorem).
    assert [bit("w45", i) for i in range(hashes)] == [11, 19, 19, 9]
    assert bit("gamma", 0) == 28 and not (expected_word >> 28) & 1
    assert verdicts == {"alpha": 1, "beta": 1, "w45": 1, "gamma": 0}


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007; engine side is
# Spark's Apache DataSketches HLL behind hll_sketch_agg /
# hll_union_agg) — family 15, closing the last sketch family that was
# only Spark-vs-DuckDB checked (q140/q145/q175). The sketch's internal
# hash is not hashlib-reproducible, so the anchor is the OTHER form the
# spec fixes exactly: (a) below the coupon-promotion threshold the
# sketch is a set, so estimates are EXACT integers for hand-listed
# domains; (b) union must be set-union, not concatenation — pinned with
# hand-overlapping days where sum-of-days (12) differs from the true
# union (9); (c) the q140/q145/q175 error contract must equal the
# paper's 1.04/sqrt(m) relative standard error, not a lookalike; and
# (d) dense-mode accuracy at 50k distinct must sit inside 3 RSE.
# ---------------------------------------------------------------------------


def test_hll_small_domain_exact_and_union_is_set_union(spark):
    # day 1 sees users 1..6, day 2 sees users 4..9: per-day distinct is
    # 6 and 6, the TRUE union is 9. A sketch "union" that concatenates
    # or sums partials would report 12 here.
    rows = [("d1", u) for u in range(1, 7)] + [("d2", u) for u in range(4, 10)]
    df = spark.createDataFrame(rows, "day string, user_id long")
    daily = df.groupBy("day").agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    per_day = {
        r.day: r.est
        for r in daily.select(
            "day", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    # coupon phase (n << 2^14 registers): the sketch IS a set -> exact
    assert per_day == {"d1": 6, "d2": 6}
    [union_est] = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est")
    ).collect()
    assert union_est.est == 9  # set union, exactly

    # mergeability (Flajolet et al. §4: registers combine by max, so
    # rolling up partials must equal sketching the whole): the one-shot
    # sketch over all rows and the union-of-days agree exactly
    [oneshot] = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est")
    ).collect()
    assert oneshot.est == union_est.est == 9


def test_hll_error_contract_matches_paper_rse():
    # the q140/q145/q175 verdict columns gate on HLL_UNION_SLACK
    # multiples of the paper's relative standard error 1.04/sqrt(m),
    # m = 2^lgk registers. Pin the code's literal against the formula
    # computed here from the paper's constants — a drive-by edit that
    # divides by lgk (or sqrt(lgk)) instead of sqrt(2^lgk) lands ~59x
    # looser and every verdict would stay green while the contract
    # silently stopped meaning anything.
    from _multi_source_retail_data_integration_hub_spark.plans.scale_ops import (
        HLL_LGK,
        HLL_UNION_SLACK,
    )

    m = 2**HLL_LGK
    paper_rse = 1.04 / math.sqrt(m)
    code_bound = HLL_UNION_SLACK * 1.04 / (2 ** (HLL_LGK / 2))
    assert HLL_LGK == 14 and m == 16384
    assert abs(code_bound - HLL_UNION_SLACK * paper_rse) < 1e-12
    assert abs(paper_rse - 0.008125) < 1e-6  # 1.04/128, by hand


def test_hll_dense_mode_accuracy_within_3_rse(spark):
    # 50_000 distinct longs >> the ~2^14/4 coupon-promotion threshold,
    # so the sketch runs in genuine dense HLL mode; the estimate is
    # deterministic (fixed internal hash) and must sit within 3 RSE of
    # the true cardinality — the regime the paper's error analysis
    # actually describes (coupon-phase exactness above says nothing
    # about it).
    n = 50_000
    [r] = (
        spark.range(n)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("id", F.lit(14))).alias("est"))
        .collect()
    )
    rse = 1.04 / math.sqrt(2**14)
    assert abs(r.est - n) / n <= 3 * rse, f"est {r.est} vs {n}"
