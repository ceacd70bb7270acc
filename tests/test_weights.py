"""Behavioral + plan tests for the document-reweighting family
(llm/weights.py): SoftDeDup-style weights, DSIR importance weights,
Naive-Bayes quality scores."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from res2df_spark.llm.weights import (
    dsir_weights,
    nb_quality_score,
    soft_dedup_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=g, source=s) for i, (t, g, s) in enumerate(rows)]
    )


# ---------------------------------------------------------------------------
# soft_dedup_weights


def test_soft_dedup_exact_groups_split_weight(spark):
    docs = _docs(
        spark,
        [
            ("alpha beta gamma delta", "en", "a"),
            ("alpha beta gamma delta", "en", "a"),  # exact dup
            ("unique words entirely here", "en", "b"),
        ],
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(docs).collect()}
    assert out[0]["group_size"] == 2 and out[1]["group_size"] == 2
    assert out[0]["w_exact"] == pytest.approx(0.5)
    assert out[2]["group_size"] == 1 and out[2]["w_exact"] == pytest.approx(1.0)


def test_soft_dedup_commonness_downweights_boilerplate(spark):
    # doc 0 and 1 share their entire shingle set (df=2 shingles); doc 2
    # is unique (df=1 -> ln 1 = 0 -> weight 1.0)
    docs = _docs(
        spark,
        [
            ("the same boiler plate text", "en", "a"),
            ("the same boiler plate text extra", "en", "a"),
            ("totally different words over here", "en", "b"),
        ],
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(docs).collect()}
    assert out[0]["mean_log_df"] > 0
    assert out[2]["mean_log_df"] == pytest.approx(0.0)
    assert out[2]["w_soft"] == pytest.approx(1.0)
    assert out[0]["w_soft"] < 1.0


def test_soft_dedup_short_and_null_texts(spark):
    # < k tokens -> no shingles -> commonness 0; NULL text excluded
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="two words"), Row(doc_id=1, text=None)]
    )
    rows = soft_dedup_weights(docs).collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["mean_log_df"] == pytest.approx(0.0)
    assert rows[0]["w_soft"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# dsir_weights


def test_dsir_target_like_docs_score_higher(spark):
    target = [("aa bb cc dd aa bb", "en", "s")] * 3
    raw = [("xx yy zz ww xx yy", "de", "s")] * 3
    probe = [
        ("aa bb cc", "xx", "s"),  # target-like features, NOT in target slice
        ("xx yy zz", "xx", "s"),  # raw-like features
    ]
    docs = _docs(spark, target + raw + probe)
    out = {r["doc_id"]: r["log_weight"] for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    assert out[6] > out[7]  # target-like doc outranks raw-like doc


def test_dsir_feature_counts_include_bigrams(spark):
    docs = _docs(spark, [("a b c", "en", "s")])
    row = dsir_weights(docs, F.col("lang") == "en").collect()[0]
    # 3 unigrams + 2 bigrams
    assert row["n_feats"] == 5


def test_dsir_model_is_256_rows_broadcast(spark):
    docs = _docs(spark, [("a b c d e f", "en", "s"), ("g h i", "de", "s")])
    plan = (
        dsir_weights(docs, F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the lambda table must arrive as a broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# nb_quality_score


def test_nb_separates_classes_on_held_in_tokens(spark):
    pos = [("good clean prose text", "en", "wiki")] * 4
    neg = [("spam junk noise garbage", "en", "crawl")] * 4
    docs = _docs(spark, pos + neg)
    out = {r["doc_id"]: r for r in nb_quality_score(docs, F.col("source") == "wiki").collect()}
    assert all(out[i]["predicted_pos"] for i in range(4))
    assert not any(out[i]["predicted_pos"] for i in range(4, 8))
    assert out[0]["nb_score"] > 0 > out[4]["nb_score"]


def test_nb_score_matches_hand_computation(spark):
    # 1 pos doc "a a", 1 neg doc "b": V={a,b}, Np=2, Nn=1
    docs = _docs(spark, [("a a", "en", "p"), ("b", "en", "n")])
    out = {r["doc_id"]: r["nb_score"] for r in nb_quality_score(docs, F.col("source") == "p").collect()}
    prior = math.log(1 / 1)
    llr_a = math.log((2 + 1) / (2 + 2)) - math.log((0 + 1) / (1 + 2))
    llr_b = math.log((0 + 1) / (2 + 2)) - math.log((1 + 1) / (1 + 2))
    assert out[0] == pytest.approx(round(prior + 2 * llr_a, 6), abs=1e-6)
    assert out[1] == pytest.approx(round(prior + llr_b, 6), abs=1e-6)


def test_nb_multiplicity_counts(spark):
    # multinomial: repeating a token must change the score
    docs = _docs(
        spark,
        [("a", "en", "p"), ("b b b", "en", "n"), ("a a a a", "xx", "n")],
    )
    out = {r["doc_id"]: r["nb_score"] for r in nb_quality_score(docs, F.col("source") == "p").collect()}
    # doc 2 is all-'a' (the positive token): 4 repeats push it positive
    # beyond doc 0's single-occurrence score minus prior differences
    assert out[2] > out[1]


def test_weight_models_materialized_not_rescan(spark):
    """The model tables (DSIR 256-bucket counts, NB class counts) are
    checkpointed, so the FINAL plan re-runs the corpus explode at most
    once for the per-doc side + one explode-free scan for priors —
    regression guard against the naive form that exploded the corpus
    once per model consumer."""
    from pyspark.sql import functions as F

    docs = _docs(
        spark,
        [("aa bb cc dd", "en", "s"), ("xx yy zz", "de", "t")] * 3,
    )
    for fn, flt in (
        (dsir_weights, F.col("lang") == "en"),
        (nb_quality_score, F.col("source") == "s"),
    ):
        plan = (
            fn(docs, flt)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Generate") <= 1, fn.__name__


def test_dsir_raw_includes_target_and_zero_token_rows(spark):
    """DSIR's denominator is the FULL corpus (target included): with
    every document in the target slice, t_b == r_b for every bucket so
    all weights are ~0 (not uniformly positive, which the
    complement-denominator bug produced).  Zero-token docs still get a
    row with log_weight 0 / n_feats 0."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="aa bb cc", lang="en"),
            Row(doc_id=1, text="aa bb dd", lang="en"),
            Row(doc_id=2, text="   ", lang="en"),
        ]
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    assert set(out) == {0, 1, 2}
    # t_b == r_b -> lambda = ln((t+1)/(T+256)) - ln((t+1)/(T+256)) = 0
    assert out[0]["log_weight"] == pytest.approx(0.0, abs=1e-6)
    assert out[2]["log_weight"] == 0.0 and out[2]["n_feats"] == 0


def test_nb_zero_token_doc_scores_at_prior(spark):
    docs = _docs(
        spark,
        [("good text here", "en", "p")] * 3
        + [("bad junk words", "en", "n")]
        + [("   ", "en", "n")],
    )
    out = {r["doc_id"]: r for r in nb_quality_score(docs, F.col("source") == "p").collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    import math

    prior = round(math.log(3 / 2), 6)
    assert out[4]["nb_score"] == pytest.approx(prior, abs=1e-6)
    assert out[4]["predicted_pos"] == (prior > 0)
