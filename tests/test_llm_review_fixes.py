"""Regression tests for the round-8 llm/ review findings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_sample_frames_string_ids(spark):
    """Non-integral ids (uuids, 'img-001') must flow through frame
    sampling instead of dying in int() mid-corpus, and the output keeps
    the string id type."""
    from res2df_spark.llm.multimodal import sample_frames

    df = spark.createDataFrame(
        [("img-001", bytearray(b"x" * 130)), ("img-002", None)],
        "doc_id string, payload binary",
    )
    rows = sample_frames(df, frame_size=64, every_n=1).collect()
    assert {r["doc_id"] for r in rows} == {"img-001"}
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]


def test_multimodal_output_keeps_caller_id_col(spark):
    """extract_features/sample_frames name the output id field after the
    CALLER'S id column so downstream joins on the original key resolve
    (they hardcoded 'doc_id' before)."""
    from res2df_spark.llm.multimodal import extract_features, sample_frames

    df = spark.createDataFrame(
        [(7, bytearray(b"abc"))], "image_id long, payload binary"
    )
    feats = extract_features(df, id_col="image_id")
    assert feats.columns[0] == "image_id"
    assert feats.join(df, "image_id").count() == 1
    frames = sample_frames(df, id_col="image_id", frame_size=2, every_n=1)
    assert frames.columns[0] == "image_id"
    assert frames.join(df, "image_id").count() == 2


def test_pq_topk_null_query_excluded(spark):
    """A NULL query embedding is excluded (the module-wide scorer
    contract), not a driver TypeError."""
    from res2df_spark.llm.similarity import pq_encode, pq_topk, pq_train

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(emb, m=2, k=2, iters=2)
    codes = pq_encode(emb, books)
    q = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)],
        "query_id long, query_vec array<double>",
    )
    out = pq_topk(q, codes, books, k=3)
    assert {r["query_id"] for r in out.collect()} == {0}


def test_pq_topk_short_query_raises(spark):
    """A query shorter than m*dsub raises loudly instead of silently
    zip-truncating into wrong distance tables."""
    from res2df_spark.llm.similarity import pq_encode, pq_topk, pq_train

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(emb, m=2, k=2, iters=2)
    codes = pq_encode(emb, books)
    q = spark.createDataFrame(
        [(0, [9.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="dims"):
        pq_topk(q, codes, books, k=3)


def test_quantize_null_element_in_constant_vector(spark):
    """A NULL element codes NULL even when the vector's span is 0
    (array_min/max skip NULLs, so lo == hi) — the span==0 branch must
    not fabricate a 0 that dequantizes to lo."""
    from res2df_spark.llm.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(1, [5.0, None, 5.0]), (2, [1.0, None, 3.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["codes"] for r in quantize_embeddings(emb).collect()}
    assert got[1] == [0, None, 0]
    assert got[2] == [0, None, 255]


def test_train_char_lm_empty_model_raises(spark):
    """An empty model (probability 1 for everything) is a training-time
    error, not a silent perfect-scorer."""
    from res2df_spark.llm.lm import train_char_lm

    df = spark.createDataFrame([(1, None), (2, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="EMPTY model"):
        train_char_lm(df)  # every row NULL or shorter than n=2


def test_export_tar_shards_atomic_commit(spark, tmp_path):
    """Shards land under their final names with no temp files left
    behind (write-temp-then-rename commit protocol)."""
    from res2df_spark.llm.multimodal import export_tar_shards

    df = spark.createDataFrame(
        [(i, bytearray(b"p" * 10)) for i in range(20)],
        "doc_id long, payload binary",
    )
    out_dir = str(tmp_path / "shards")
    manifest = export_tar_shards(df, out_dir, n_shards=4)
    assert manifest.agg(F.sum("n_samples")).first()[0] == 20
    names = sorted(os.listdir(out_dir))
    assert all(n.startswith("shard-") and n.endswith(".tar") for n in names)
    assert not any(".tmp-" in n for n in names)
