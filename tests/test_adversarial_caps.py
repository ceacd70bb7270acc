"""Adversarial corpus shapes for the capped operator families.

Every quadratic-in-waiting operator (LSH banding, SimHash chunk
buckets, record-linkage blocks, semantic clusters) carries a cap that
exists for exactly one corpus shape: a degenerate key under which the
within-bucket pair count explodes.  The plan-pinning tests verify the
caps' SHAPE; these tests feed each operator that corpus — all-identical
documents / vectors / blocking keys — and assert the cap actually
bounds the pair count to zero while the drop accounting reports what
was sacrificed (a silent cap that reads as "no duplicates found" would
be worse than no cap)."""

from __future__ import annotations

from pyspark.sql import functions as F


N_HOT = 400  # uncapped all-pairs would be C(400,2) = 79 800 pairs


def _hot_docs(spark):
    """All-identical texts (one global near-dup group) plus a control
    document that must never pair with them."""
    rows = [(i, "the same boilerplate text repeated everywhere forever")
            for i in range(N_HOT)]
    rows.append((N_HOT, "a genuinely unique document about something else"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_bounds_hot_bucket_and_accounts_drops(spark):
    from res2df_spark.llm.dedup import (
        minhash_lsh_bucket_stats,
        minhash_lsh_candidates,
    )

    docs = _hot_docs(spark)
    capped = minhash_lsh_candidates(docs, max_bucket_size=16)
    assert capped.count() == 0  # the hot bucket never builds its pairs
    # drop accounting: the observability half of the same cap reports
    # every band bucket the cap sacrificed, with its size
    stats = minhash_lsh_bucket_stats(docs, max_bucket_size=16)
    dropped = stats.filter(F.col("dropped")).collect()
    assert len(dropped) > 0
    assert all(r["bucket_size"] == N_HOT for r in dropped)
    # an UNcapped run on a small slice confirms the pairs the cap
    # suppressed are real (shape sanity, kept small on purpose)
    small = docs.filter(F.col("doc_id") < 10)
    assert minhash_lsh_candidates(small).count() == 45  # C(10,2)


def test_simhash_cap_bounds_identical_corpus(spark):
    from res2df_spark.llm.dedup import simhash_near_pairs

    docs = _hot_docs(spark)
    assert simhash_near_pairs(docs, max_bucket_size=16).count() == 0
    small = docs.filter(F.col("doc_id") < 10)
    assert simhash_near_pairs(small).count() == 45


def test_linkage_cap_bounds_degenerate_block(spark):
    from res2df_spark.operators.linkage import blocked_fuzzy_pairs

    recs = spark.createDataFrame(
        [(i, "John Smith", "X") for i in range(N_HOT)],
        "rec_id long, name string, blk string",
    )
    capped = blocked_fuzzy_pairs(
        recs, "rec_id", "name", ["blk"],
        max_edit_distance=2, max_block_size=16,
    )
    assert capped.count() == 0
    small = recs.filter(F.col("rec_id") < 10)
    assert blocked_fuzzy_pairs(
        small, "rec_id", "name", ["blk"], max_edit_distance=2,
    ).count() == 45


def test_semantic_cap_bounds_one_hot_cluster(spark):
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(N_HOT)],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [100.0, 0.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>",
    )
    capped = semantic_dedup_pairs(
        emb, cents, threshold=0.5, max_cluster_size=16,
    )
    assert capped.count() == 0
    small = emb.filter(F.col("vec_id") < 10)
    assert semantic_dedup_pairs(small, cents, threshold=0.5).count() == 45


def test_simhash_bucket_stats_measures_drops(spark):
    """The SimHash observability twin: over-cap chunk buckets are
    reported with their sizes, mirroring minhash_lsh_bucket_stats."""
    from res2df_spark.llm.dedup import simhash_bucket_stats

    docs = _hot_docs(spark)
    stats = simhash_bucket_stats(docs, max_bucket_size=16)
    dropped = stats.filter(F.col("dropped")).collect()
    assert len(dropped) > 0
    assert all(r["bucket_size"] == N_HOT for r in dropped)
    # without a cap nothing is marked dropped
    assert simhash_bucket_stats(docs).filter(F.col("dropped")).count() == 0


def test_containment_stop_shingle_cap_bounds_hot_corpus(spark):
    """All-identical texts: every shingle's df equals the corpus size,
    so the max_token_df stop-shingle cap removes them ALL before the
    inverted-index join — zero candidate pairs instead of C(n,2); the
    unique control document keeps its (now index-absent) shingles from
    pairing with anything."""
    from res2df_spark.llm.dedup import containment_pairs

    docs = _hot_docs(spark)
    capped = containment_pairs(
        docs, threshold=0.5, shingle_k=3, max_token_df=16
    )
    assert capped.count() == 0
    # uncapped on a small slice: identical docs fully contain each other
    small = docs.filter(F.col("doc_id") < 6)
    pairs = containment_pairs(small, threshold=0.99, shingle_k=3).collect()
    assert len(pairs) == 15  # C(6,2)
    assert all(r["c1"] == 1.0 and r["c2"] == 1.0 for r in pairs)
