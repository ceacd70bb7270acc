"""Product quantization: encode determinism and ADC recall against the
exact L2 ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from res2df_spark.catalog import Catalog
from res2df_spark.llm.similarity import ivfpq_build, pq_encode, pq_topk, pq_train

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pq(spark):
    embs = Catalog(spark, SF).embeddings
    books = pq_train(embs, m=4, k=8, iters=2)
    codes = pq_encode(embs, books)
    return embs, books, codes


def test_codebook_shape_and_code_range(pq):
    embs, books, codes = pq
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 16
    rows = codes.collect()
    assert len(rows) == embs.count()
    for r in rows:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)


def test_encode_is_partitioning_independent(spark, pq):
    embs, books, _ = pq
    a = {r.vec_id: list(r.codes) for r in pq_encode(embs, books).collect()}
    b = {
        r.vec_id: list(r.codes)
        for r in pq_encode(embs.repartition(7), books).collect()
    }
    assert a == b


def test_adc_recall_against_exact(spark, pq):
    embs, books, codes = pq
    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embs.collect()}
    q_ids = sorted(data)[:10]
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in data[i]]) for i in q_ids],
        "query_id long, query_vec array<double>",
    )
    from res2df_spark.llm.similarity import pq_topk_rerank

    ids = np.array(sorted(data))
    mat = np.stack([data[i] for i in ids])

    def recall(result_df):
        approx = {}
        for r in result_df.collect():
            approx.setdefault(r.query_id, set()).add(r.vec_id)
        hits = 0
        for qid in q_ids:
            d = ((mat - data[qid]) ** 2).sum(axis=1)
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            hits += len(exact & approx[qid])
        return hits / (10 * len(q_ids))

    # raw ADC: coarse 4x8 codebooks on 64-dim near-random vectors — far
    # above the 2% chance floor, but modest by design
    raw = recall(pq_topk(queries, codes, books, k=10))
    assert raw >= 0.15, raw
    # shortlist-100 + exact rerank: the production pattern buys recall
    # with shortlist size, not codebook size
    rr = recall(pq_topk_rerank(queries, codes, embs, books, k=10, shortlist=100))
    assert rr >= 0.6, rr
    assert rr > raw


def test_adc_distance_matches_table_reconstruction(spark, pq):
    embs, books, codes = pq
    # the reported pq_dist must equal the sum of per-subspace distances
    # between the query subvector and the ASSIGNED centroid
    r0 = embs.orderBy("vec_id").first()
    queries = spark.createDataFrame(
        [(0, [float(x) for x in r0.embedding])], "query_id long, query_vec array<double>"
    )
    row = (
        pq_topk(queries, codes, books, k=500)
        .filter(F.col("vec_id") == r0.vec_id)
        .collect()[0]
    )
    code = {c.vec_id: c.codes for c in codes.collect()}[r0.vec_id]
    dsub = len(books[0][0])
    want = 0.0
    for j, c in enumerate(code):
        sub = [float(x) for x in r0.embedding[j * dsub : (j + 1) * dsub]]
        want += sum((a - b) ** 2 for a, b in zip(sub, books[j][c]))
    assert row.pq_dist == pytest.approx(round(want, 6), abs=1e-6)


@pytest.fixture(scope="module")
def ivfpq(spark):
    embs = Catalog(spark, SF).embeddings
    coarse, books, idx = ivfpq_build(embs, n_lists=8, m=4, k=8, iters=2)
    return embs, coarse, books, idx.localCheckpoint()


def test_ivfpq_index_shape(ivfpq):
    embs, coarse, books, idx = ivfpq
    assert len(coarse) == 8 and len(coarse[0]) == 64
    rows = idx.collect()
    assert len(rows) == embs.count()
    assert all(0 <= r.list_id < 8 and len(r.codes) == 4 for r in rows)


def test_ivfpq_probes_reduce_candidates(spark, ivfpq):
    embs, coarse, books, idx = ivfpq
    from res2df_spark.llm.similarity import ivfpq_topk

    r0 = embs.orderBy("vec_id").first()
    queries = spark.createDataFrame(
        [(0, [float(x) for x in r0.embedding])],
        "query_id long, query_vec array<double>",
    )
    full = ivfpq_topk(queries, coarse, books, idx, k=10_000, nprobe=8)
    probed = ivfpq_topk(queries, coarse, books, idx, k=10_000, nprobe=2)
    n_full, n_probed = full.count(), probed.count()
    assert n_full == embs.count()  # all lists probed = whole corpus scored
    assert n_probed < n_full  # fewer probes = strictly fewer candidates
    # the query's own vector lives in its nearest list: rank 1 either way
    assert probed.filter("vec_id = 0 AND rnk = 1").count() == 1


def test_ivfpq_recall_beats_chance_and_tracks_probes(spark, ivfpq):
    embs, coarse, books, idx = ivfpq
    from res2df_spark.llm.similarity import ivfpq_topk

    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embs.collect()}
    ids = np.array(sorted(data))
    mat = np.stack([data[i] for i in ids])
    q_ids = sorted(data)[:10]
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in data[i]]) for i in q_ids],
        "query_id long, query_vec array<double>",
    )

    def recall(nprobe):
        approx = {}
        for r in ivfpq_topk(queries, coarse, books, idx, k=10, nprobe=nprobe).collect():
            approx.setdefault(r.query_id, set()).add(r.vec_id)
        hits = 0
        for qid in q_ids:
            d = ((mat - data[qid]) ** 2).sum(axis=1)
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            hits += len(exact & approx.get(qid, set()))
        return hits / (10 * len(q_ids))

    r4, r8 = recall(4), recall(8)
    assert r4 >= 0.2, r4  # chance is 2%
    assert r8 >= r4  # probing every list can only help


def test_pq_recall_query_meets_bar(spark):
    """The oracle-checked pq_recall suite query must clear a minimum
    quality bar — recall@10 ≥ 0.5 on average with zero-iteration
    codebooks and a 50-deep shortlist (measured ~0.68; trained
    codebooks score higher in the tests above)."""
    from res2df_spark.suite import QUERIES

    got = QUERIES["pq_recall"](spark, "/root/testdata/sf0.001").collect()
    assert len(got) == 5
    avg = sum(r["recall"] for r in got) / len(got)
    assert avg >= 0.5, avg
