"""Round-4 continuation operators: repetition stats, duplicate n-gram
spans (with the hot-gram cap), weighted sampling, per-group capping,
and the char-bigram LM scorer."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from res2df_spark.functions.textan import (
    dup_shingle_fraction,
    tokens,
    top_shingle_fraction,
)
from res2df_spark.llm.curation import cap_per_group, weighted_sample
from res2df_spark.llm.dedup import duplicate_ngram_spans
from res2df_spark.llm.lm import char_ngrams, lm_quality_score, train_char_lm


def _ref_shingle_stats(text, k):
    toks = text.lower().split()
    sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not sh:
        return 0.0, 0.0
    c = Counter(sh)
    dup = (len(sh) - len(c)) / len(sh)
    top = max(c.values()) / len(sh)
    return dup, top


@pytest.mark.parametrize(
    "text",
    [
        "a b a b a b c",
        "one two three four",
        "x x x x x x x x",
        "solo",
        "",
        "p q p q r p q",
    ],
)
def test_repetition_stats_match_reference(spark, text):
    df = spark.createDataFrame([(1, text)], "id int, text string")
    t = tokens("text")
    row = df.select(
        dup_shingle_fraction(t, 3).alias("d"), top_shingle_fraction(t, 2).alias("t2")
    ).collect()[0]
    ref_d, _ = _ref_shingle_stats(text, 3)
    _, ref_t = _ref_shingle_stats(text, 2)
    assert row.d == pytest.approx(ref_d)
    assert row.t2 == pytest.approx(ref_t)


def test_duplicate_ngram_spans_reference(spark):
    docs = [
        (1, "a b c d e"),  # abc bcd cde
        (2, "a b c x y"),  # abc shared with 1 and 4
        (3, "q r"),  # too short: 0 grams
        (4, "a b c d q"),  # abc, bcd shared
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_span_frac)
        for r in duplicate_ngram_spans(df, k=3).collect()
    }
    assert got[1] == (3, 2, round(2 / 3, 6))
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (3, 2, round(2 / 3, 6))


def test_duplicate_ngram_spans_within_doc_repeats_count(spark):
    # a phrase repeated inside ONE document is a duplicate span too
    df = spark.createDataFrame(
        [(1, "a b c z a b c"), (2, "u v w")], "doc_id int, text string"
    )
    got = {r.doc_id: r.n_dup_grams for r in duplicate_ngram_spans(df, k=3).collect()}
    assert got[1] == 2  # both "a b c" occurrences
    assert got[2] == 0


def test_duplicate_ngram_spans_hot_gram_cap(spark):
    # pathological corpus: one gram occurs in every doc; the cap drops
    # it from the join so the per-gram fan-in stays bounded
    df = spark.createDataFrame(
        [(i, "same old phrase") for i in range(20)], "doc_id int, text string"
    )
    uncapped = duplicate_ngram_spans(df, k=3)
    assert all(r.n_dup_grams == 1 for r in uncapped.collect())
    capped = duplicate_ngram_spans(df, k=3, max_gram_df=10)
    rows = capped.collect()
    assert len(rows) == 20
    assert all(r.n_dup_grams == 0 for r in rows)  # hot gram excluded
    assert all(r.n_grams == 1 for r in rows)  # ...but still counted


def test_weighted_sample_is_deterministic_and_weight_sensitive(spark):
    df = spark.createDataFrame(
        [(i, 1000 if i < 10 else 1) for i in range(200)], "doc_id int, w int"
    )
    a = sorted(r.doc_id for r in weighted_sample(df, "w", 20).collect())
    b = sorted(
        r.doc_id for r in weighted_sample(df.repartition(7), "w", 20).collect()
    )
    assert a == b  # partitioning-independent
    # the 10 heavy rows (1000x weight) should essentially all be chosen
    assert sum(1 for i in a if i < 10) >= 9


def test_weighted_sample_nonpositive_weights_lose(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 10), (5, 10)],
        "doc_id int, w int",
    )
    got = sorted(r.doc_id for r in weighted_sample(df, "w", 2).collect())
    assert got == [4, 5]


def test_cap_per_group(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], "doc_id int, source string"
    )
    out = cap_per_group(df, "source", 3)
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {f"s{i}": 3 for i in range(4)}
    again = sorted(r.doc_id for r in cap_per_group(df.repartition(5), "source", 3).collect())
    assert again == sorted(r.doc_id for r in out.collect())


def test_char_ngrams_and_lm_score(spark):
    df = spark.createDataFrame(
        [(1, "the table row"), (2, "zzq qzx vvv"), (3, "a")],
        "doc_id int, text string",
    )
    grams = df.filter("doc_id = 1").select(char_ngrams("text").alias("g")).collect()[0].g
    assert grams[:3] == ["th", "he", "e "]
    assert len(grams) == len("the table row") - 1

    model = train_char_lm(df.filter("doc_id = 1"))
    assert model["total"] == len("the table row") - 1
    scored = {r.doc_id: r.lm_score for r in lm_quality_score(df, model).collect()}
    assert scored[3] is None  # shorter than the n-gram order
    assert scored[1] > scored[2]  # in-distribution text scores higher


def test_lm_score_matches_python_reference(spark):
    train_txt = ["abcabc", "bcabca"]
    score_txt = "cabz"
    df_train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_txt)], "doc_id int, text string"
    )
    model = train_char_lm(df_train)
    counts = Counter()
    for t in train_txt:
        for i in range(len(t) - 1):
            counts[t[i : i + 2]] += 1
    assert model["counts"] == dict(counts)
    import math

    denom = sum(counts.values()) + len(counts) + 1
    ref = sum(
        math.log((counts.get(score_txt[i : i + 2], 0) + 1) / denom)
        for i in range(len(score_txt) - 1)
    ) / (len(score_txt) - 1)
    df = spark.createDataFrame([(9, score_txt)], "doc_id int, text string")
    got = lm_quality_score(df, model).collect()[0].lm_score
    assert got == pytest.approx(round(ref, 4), abs=1e-9)


# ---------------------------------------------------------------------------
# Property tests: random corpora vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["a", "b", "c", "d", "e"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_text, min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_duplicate_ngram_spans_property(spark, texts):
    k = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in duplicate_ngram_spans(df, k=k).collect()
    }
    all_grams = Counter()
    per_doc = {}
    for i, t in enumerate(texts):
        toks = t.split()
        grams = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        per_doc[i] = grams
        all_grams.update(grams)
    for i, grams in per_doc.items():
        n_dup = sum(1 for g in grams if all_grams[g] >= 2)
        assert got[i] == (len(grams), n_dup), (i, texts)


@given(st.lists(_text, min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_repetition_stats_property(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    t = tokens("text")
    got = {
        r.doc_id: (r.d, r.t2)
        for r in df.select(
            "doc_id",
            dup_shingle_fraction(t, 3).alias("d"),
            top_shingle_fraction(t, 2).alias("t2"),
        ).collect()
    }
    for i, text in enumerate(texts):
        ref_d, _ = _ref_shingle_stats(text, 3)
        _, ref_t = _ref_shingle_stats(text, 2)
        assert got[i][0] == pytest.approx(ref_d), (i, text)
        assert got[i][1] == pytest.approx(ref_t), (i, text)


@given(st.lists(_text, min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_with_repetition_stats_matches_expression_form(spark, texts):
    from res2df_spark.functions.textan import with_repetition_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.dup_frac, r.top_frac)
        for r in with_repetition_stats(df).collect()
    }
    for i, text in enumerate(texts):
        ref_d, _ = _ref_shingle_stats(text, 3)
        _, ref_t = _ref_shingle_stats(text, 2)
        assert got[i][0] == pytest.approx(ref_d), (i, text)
        assert got[i][1] == pytest.approx(ref_t), (i, text)


def test_profile_table_generic(spark):
    from res2df_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 6.0), (None, None, None)],
        "id int, s string, v double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 1
    assert got["id"].n_distinct == 3
    assert got["s"].n_distinct == 2 and got["s"].min_str == "a"
    assert got["v"].n_nulls == 2
    # extremes are computed on the NATIVE type, then rendered: a
    # string-cast-first min would report lexicographic extremes
    # (min of [5.0, 6.0] stays '5.0', but min of [9, 10] must be '9')
    wide = spark.createDataFrame([(9,), (10,)], "n int")
    prof = {r.column: r for r in profile_table(wide).collect()}
    assert prof["n"].min_str == "9" and prof["n"].max_str == "10"
    # approximate path returns the same shape
    approx = {r.column: r.n_distinct for r in profile_table(df, exact_distinct=False).collect()}
    assert set(approx) == {"id", "s", "v"}


def test_blocked_fuzzy_pairs_semantics(spark):
    from res2df_spark.operators.linkage import blocked_fuzzy_pairs

    rows = [
        (1, "smith john", "x"), (2, "smith jonh", "x"),  # dist 2, same block
        (3, "smith john", "y"),                          # same name, other block
        (4, "totally different", "x"),
        (5, "smith john", "x"),                          # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "id int, name string, blk string")
    got = {
        (r.id1, r.id2): r.edit_dist
        for r in blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2).collect()
    }
    assert got == {(1, 2): 2, (1, 5): 0, (2, 5): 2}
    # block-size cap drops the degenerate block entirely
    capped = blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2, max_block_size=3)
    assert capped.count() == 0  # block 'x' has 4 members > cap
