"""Round-5 operators: BM25 retrieval, corpus token statistics,
matryoshka embedding truncation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import rows


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark engine spark"),
            (2, "spark catalyst"),
            (3, "tungsten codegen engine"),
            (4, "plain words only here"),
        ],
        "doc_id long, text string",
    )


def test_bm25_formula_and_ranking(spark):
    from res2df_spark.llm.vocab import bm25_topk

    docs = _docs(spark)
    q = spark.createDataFrame([("q0", "spark")], "query_id string, term string")
    got = rows(
        bm25_topk(docs, q, k=10), "query_id", "doc_id", "bm25", "n_matched", "rnk"
    )
    # hand check: N=4, df(spark)=2, idf = ln(1 + 2.5/2.5) = ln 2
    # doc 1: tf=2, dl=3, avgdl=(3+2+3+4)/4=3 → tf_part=2*2.2/(2+1.2*1.0)
    idf = math.log(2.0)
    d1 = idf * 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 3.0))
    d2 = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 3.0))
    by_doc = {r[1]: r for r in got}
    assert set(by_doc) == {1, 2}
    assert abs(by_doc[1][2] - round(d1, 6)) < 1e-9
    assert abs(by_doc[2][2] - round(d2, 6)) < 1e-9
    assert by_doc[1][4] == 1 and by_doc[2][4] == 2  # tf=2 outranks tf=1
    assert by_doc[1][3] == 1  # one matched term


def test_bm25_multi_term_sums_and_counts(spark):
    from res2df_spark.llm.vocab import bm25_topk

    docs = _docs(spark)
    q = spark.createDataFrame(
        [("q0", "spark"), ("q0", "engine")], "query_id string, term string"
    )
    got = {r[1]: r for r in rows(
        bm25_topk(docs, q, k=10), "query_id", "doc_id", "bm25", "n_matched", "rnk"
    )}
    assert got[1][3] == 2  # doc 1 matches both terms
    assert got[3][3] == 1  # doc 3 matches only 'engine'
    assert set(got) == {1, 2, 3}


def test_bm25_broadcasts_query_side(spark):
    from res2df_spark.llm.vocab import bm25_topk

    docs = _docs(spark)
    q = spark.createDataFrame([("q0", "spark")], "query_id string, term string")
    plan = (
        bm25_topk(docs, q)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # postings ⋈ broadcast query terms


def test_corpus_token_stats_entropy(spark):
    from res2df_spark.llm.vocab import corpus_token_stats

    # 4 a's, 2 b's, 2 c's → H = -(0.5 ln 0.5 + 0.25 ln 0.25 × 2) = 1.5 ln 2
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b c")], "doc_id long, text string"
    )
    r = corpus_token_stats(docs).collect()[0]
    assert r["n_tokens"] == 8 and r["n_types"] == 3
    assert abs(r["entropy"] - round(1.5 * math.log(2.0), 6)) < 1e-9
    assert r["top_token"] == "a"
    assert abs(r["top_frac"] - 0.5) < 1e-9


def test_corpus_token_stats_top_tie_is_lexical(spark):
    from res2df_spark.llm.vocab import corpus_token_stats

    docs = spark.createDataFrame([(1, "z y z y")], "doc_id long, text string")
    assert corpus_token_stats(docs).collect()[0]["top_token"] == "y"


def test_truncate_embeddings_renorm_and_zero(spark):
    from res2df_spark.llm.similarity import truncate_embeddings

    emb = spark.createDataFrame(
        [
            (0, [3.0, 4.0, 99.0, 99.0]),  # prefix (3,4): norm 5
            (1, [0.0, 0.0, 7.0, 7.0]),    # zero prefix: passthrough
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r[0]: r for r in rows(
        truncate_embeddings(emb, dims=2), "vec_id", "truncated", "prefix_norm"
    )}
    assert got[0][1] == [0.6, 0.8] and got[0][2] == 5.0
    assert got[1][1] == [0.0, 0.0] and got[1][2] == 0.0
    # renormalize=False keeps raw prefixes
    raw = {r[0]: r[1] for r in rows(
        truncate_embeddings(emb, dims=2, renormalize=False),
        "vec_id", "truncated",
    )}
    assert raw[0] == [3.0, 4.0]


def test_truncate_embeddings_is_map_only(spark):
    from res2df_spark.llm.similarity import truncate_embeddings

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        truncate_embeddings(emb, dims=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
