"""Multimodal binary-column plumbing (north-star extension)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from res2df_spark.llm.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    attach_binary_metadata,
    chunk_bytes,
    extract_features,
    sample_frames,
)


def _payloads(spark):
    rows = [(1, bytearray(b"\x89PNG fake image bytes")), (2, bytearray(b"RIFF fake wav")), (3, bytearray(b""))]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_binary_metadata(spark):
    out = attach_binary_metadata(_payloads(spark), mime="image/png")
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].n_bytes == 21
    assert got[1].mime == "image/png"
    assert got[1].content_md5 == hashlib.md5(b"\x89PNG fake image bytes").hexdigest()
    assert got[3].n_bytes == 0


def test_extract_features_deterministic(spark):
    out = extract_features(_payloads(spark))
    assert out.schema == FEATURE_SCHEMA
    got = {r.doc_id: r for r in out.collect()}
    assert got[2].n_bytes == 13
    assert got[2].content_md5 == hashlib.md5(b"RIFF fake wav").hexdigest()
    # fake features are md5-derived → reproducible across runs
    h = hashlib.md5(b"RIFF fake wav").digest()
    assert got[2].n_features == 2
    assert got[2].features[0] == pytest.approx(int.from_bytes(h[0:4], "big") / 2**32)
    assert got[2].features[1] == pytest.approx(int.from_bytes(h[4:8], "big") / 2**32)


def test_extract_features_custom_decoder(spark):
    out = extract_features(_payloads(spark), decoder=lambda b: (float(len(b)), 0.5))
    got = {r.doc_id: r.features[0] for r in out.collect()}
    assert got[1] == 21.0 and got[3] == 0.0


def test_extract_features_16dim_decoder(spark):
    """A 16-dim fake embedder plugs in via decoder=/n_features= with no
    schema edit — the arity travels as data."""
    def embed(b: bytes):
        return tuple(float((len(b) * (i + 1)) % 7) for i in range(16))

    out = extract_features(_payloads(spark), decoder=embed, n_features=16)
    assert out.schema == FEATURE_SCHEMA  # schema is arity-independent
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].n_features == 16
    assert got[1].features == [float((21 * (i + 1)) % 7) for i in range(16)]
    # default fake decoder honours the requested arity too (chained
    # md5 blocks past feature 4)
    fake = {r.doc_id: r for r in extract_features(_payloads(spark), n_features=6).collect()}
    assert fake[1].n_features == 6
    assert all(0.0 <= v < 1.0 for v in fake[1].features)
    h0 = hashlib.md5(b"\x89PNG fake image bytes").hexdigest()
    h1 = hashlib.md5((h0 + "1").encode()).hexdigest()
    assert fake[1].features[4] == pytest.approx(int(h1[0:8], 16) / 2**32)


def test_extract_features_arity_mismatch_raises(spark):
    from py4j.protocol import Py4JJavaError

    out = extract_features(
        _payloads(spark), decoder=lambda b: (1.0, 2.0, 3.0), n_features=2
    )
    with pytest.raises((Py4JJavaError, Exception), match="decoder returned 3"):
        out.collect()


def test_chunk_bytes():
    assert chunk_bytes(b"abcdefg", 3) == [b"abc", b"def", b"g"]
    assert chunk_bytes(b"", 3) == []


def test_sample_frames(spark):
    # 21-byte payload, frame_size=4 → 6 frames; every_n=2 keeps 0,2,4
    out = sample_frames(_payloads(spark), frame_size=4, every_n=2)
    assert out.schema == FRAME_SCHEMA
    rows = {(r.doc_id, r.frame_idx): r for r in out.collect()}
    p1 = b"\x89PNG fake image bytes"
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 2), (1, 4)}
    assert rows[(1, 0)].n_frames == 6
    assert rows[(1, 4)].frame_bytes == 4
    assert rows[(1, 2)].frame_md5 == hashlib.md5(p1[8:12]).hexdigest()
    # ragged last frame of doc 2 (13 bytes → frames 0..3, keep 0 and 2)
    assert rows[(2, 2)].frame_bytes == 4
    # empty payload → no rows
    assert not any(k[0] == 3 for k in rows)


def test_sample_frames_custom_splitter(spark):
    out = sample_frames(
        _payloads(spark), every_n=1, splitter=lambda p: [p] if p else []
    )
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].n_frames == 1 and got[1].frame_bytes == 21
    assert 3 not in got


def test_null_ids_survive(spark):
    """NULL doc ids must not abort the Arrow worker: extract_features
    keeps the row (NULL id, features computed), sample_frames skips it
    (frames without an owning doc are unjoinable)."""
    rows = [(None, bytearray(b"abcdefgh")), (7, bytearray(b"abcdefgh")), (8, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = extract_features(df).collect()
    assert len(feats) == 3
    by_id = {r.doc_id: r for r in feats}
    assert by_id[None].n_bytes == 8
    assert by_id[7].content_md5 == by_id[None].content_md5
    assert by_id[8].n_bytes is None

    frames = sample_frames(df, frame_size=4, every_n=1).collect()
    assert {r.doc_id for r in frames} == {7}
    assert len(frames) == 2


def test_large_ids_stay_exact_with_nulls(spark):
    """A NULL-bearing batch must not float-degrade ids above 2^53."""
    big = (1 << 53) + 1
    rows = [(None, bytearray(b"abcd")), (big, bytearray(b"abcd"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {r.doc_id for r in extract_features(df).collect()}
    assert big in feats
    frames = {r.doc_id for r in sample_frames(df, frame_size=4).collect()}
    assert frames == {big}
