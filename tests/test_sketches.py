"""Sketch-based distinct counting — the 100 TB cardinality tool.

``hll_sketch_agg`` builds a mergeable HyperLogLog sketch per group /
partition; ``hll_union_agg`` merges sketches, which is what makes the
estimate distributable (partial sketches combine associatively across
partitions and across precomputed slices — no exact-distinct shuffle of
the raw keys).  Approximate ops have no bit-exact SQL oracle, so the
contract here is an error bound against the exact answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ids(spark):
    # 50k rows, 10k distinct, skewed across 4 groups
    return spark.range(50_000).select(
        (F.col("id") % 10_000).alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
    )


def test_hll_estimate_within_bound(spark, ids):
    est = ids.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("est")
    ).collect()[0].est
    assert abs(est - 10_000) / 10_000 < 0.03


def test_hll_sketches_merge_like_partial_aggregates(spark, ids):
    # build per-group sketches, then union them — the distributed shape:
    # map-side sketches, one tiny merge — and compare to the global one
    per_group = ids.groupBy("g").agg(F.hll_sketch_agg("k").alias("sk"))
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    assert abs(merged - 10_000) / 10_000 < 0.03


def test_hll_union_handles_disjoint_slices(spark):
    a = spark.range(0, 8_000).agg(F.hll_sketch_agg("id").alias("sk"))
    b = spark.range(8_000, 10_000).agg(F.hll_sketch_agg("id").alias("sk"))
    merged = (
        a.unionByName(b)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert abs(merged - 10_000) / 10_000 < 0.03


class TestHeavyHittersMG:
    """Misra-Gries guarantee: every token with true frequency above
    N/(k+1) must survive, and counts never overestimate."""

    def _corpus(self, spark):
        rows = []
        for i in range(200):
            # 'alpha' in every doc (200), 'beta' in half (100),
            # long tail of uniques
            text = "alpha " + ("beta " if i % 2 == 0 else "") + f"tail{i} u{i % 37}"
            rows.append((i, text))
        return spark.createDataFrame(rows, "doc_id int, text string").repartition(6)

    def test_guarantee_and_underestimate(self, spark):
        from res2df_spark.llm.vocab import heavy_hitters_mg

        df = self._corpus(spark)
        got = {r.token: r.mg_count for r in heavy_hitters_mg(df, k=20).collect()}
        # true frequencies
        truth = {"alpha": 200, "beta": 100}
        for tok, freq in truth.items():
            assert tok in got, tok
            assert got[tok] <= freq  # MG never overestimates
            # error bound: N * n_summaries / (k+1); generous check
            assert got[tok] >= freq - (600 * 6) / 21

    def test_only_k_rows_leave_each_partition(self, spark):
        from res2df_spark.llm.vocab import heavy_hitters_mg

        df = self._corpus(spark)
        # the sketch's shuffle input is bounded: <= k tokens per summary
        # regardless of vocabulary size (here vocab >> k)
        out = heavy_hitters_mg(df, k=5).collect()
        assert len(out) <= 5 * 6  # k per partition is the hard cap


def test_approx_percentile_merges_and_bounds(spark):
    """approx_percentile is the mergeable quantile sketch: partial
    sketches combine across partitions, and the estimate respects the
    requested accuracy bound."""
    df = spark.range(100_000).select((F.col("id") % 10_000).alias("v"))
    est = df.repartition(16).agg(
        F.approx_percentile("v", F.lit(0.5), F.lit(1000)).alias("p50"),
        F.approx_percentile("v", F.lit(0.99), F.lit(1000)).alias("p99"),
    ).collect()[0]
    # accuracy=1000 -> rank error <= n/1000 = 100 ranks = 10 values here
    assert abs(est.p50 - 5000) <= 100
    assert abs(est.p99 - 9900) <= 100


def test_pq_incremental_indexing(spark):
    """New vectors encode against a FIXED codebook map-side and union
    into the existing index — the incremental-ingest contract (codebooks
    are retrained on drift, not per batch)."""
    from res2df_spark.catalog import Catalog
    from res2df_spark.llm.similarity import pq_encode, pq_train

    embs = Catalog(spark, "/root/testdata/sf0.001").embeddings
    old = embs.filter("vec_id < 250")
    new = embs.filter("vec_id >= 250")
    books = pq_train(old, m=4, k=8, iters=2)
    index = pq_encode(old, books)
    increment = pq_encode(new, books)
    full = index.unionByName(increment)
    assert full.count() == embs.count()
    # codes for the OLD vectors are unchanged by the increment
    before = {r.vec_id: list(r.codes) for r in index.collect()}
    after = {
        r.vec_id: list(r.codes)
        for r in full.filter("vec_id < 250").collect()
    }
    assert before == after
