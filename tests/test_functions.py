"""Scalar/array function families (SURVEY §2.8, LLM text primitives)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from res2df_spark.functions.strings import (
    matches_template,
    pair_key,
    well_template_to_regex,
)
from res2df_spark.functions.textan import shingles, token_count, tokens
from res2df_spark.functions.vectors import cosine_similarity, dot, l2_norm
from tests.conftest import rows


def test_well_template_to_regex():
    assert well_template_to_regex("OP*") == "^OP.*$"
    assert well_template_to_regex("OP?") == "^OP.$"
    # a leading backslash PERMITS a leading wildcard; the reference
    # strips it and still expands (common.py:973-980)
    assert well_template_to_regex("\\*X") == "^.*X$"
    assert well_template_to_regex("A.B") == "^A\\.B$"


def test_matches_template(spark):
    df = spark.createDataFrame(
        [("OP_1",), ("OP_22",), ("WI_1",), ("*X",)], "well string"
    )
    got = rows(df.filter(matches_template("well", "OP*")), "well")
    assert got == [("OP_1",), ("OP_22",)]
    got = rows(df.filter(matches_template("well", "\\*X")), "well")
    # '\*X' = wildcard template: matches every well ending in X
    assert got == [("*X",)]


def test_pair_key(spark):
    df = spark.createDataFrame([(3, 1), (1, 3), (2, 2)], "a int, b int")
    got = rows(df.select(pair_key("a", "b").alias("p")), "p")
    assert got == [("1-3",), ("1-3",), ("2-2",)]


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("  The quick  brown fox ",), ("",), ("one two",)], "t string")
    out = df.select(
        tokens("t").alias("toks"),
        token_count("t").alias("n"),
        shingles(tokens("t"), 3).alias("sh"),
    )
    got = out.collect()
    assert got[0].toks == ["the", "quick", "brown", "fox"]
    assert got[0].n == 4
    assert got[0].sh == ["the quick brown", "quick brown fox"]
    assert got[1].toks == [] and got[1].n == 0 and got[1].sh == []
    assert got[2].sh == []  # shorter than k → no shingles


def test_vector_functions(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], "a array<double>, b array<double>")
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_norm(F.col("a")).alias("na"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
    ).collect()[0]
    assert got.d == pytest.approx(18.0)
    assert got.na == pytest.approx(3.0)
    assert got.cos == pytest.approx(1.0)


def test_cosine_orthogonal(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 5.0])], "a array<double>, b array<double>")
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]
    assert got.c == pytest.approx(0.0)
