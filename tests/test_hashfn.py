"""xxhash64 hash backend for the dedup hot paths (round 7).

md5 stays the default so every oracle row can recompute the index in
ANSI SQL; ``hash_fn="xxhash64"`` is the production backend (integer
keys, no crypto rounds, no hex strings).  Invariants pinned here:

* hash-INVARIANT operators (inverted-index Jaccard/containment,
  duplicate-span stats, shingle-df stats) must return IDENTICAL rows
  under both backends — set sizes/overlaps survive any injective map;
* hash-DEPENDENT operators (minhash, simhash) get schema parity and
  the invariants that hold for any valid hash family: identical texts
  collide (Hamming 0 / all bands equal), disjoint-token texts do not
  produce near-pairs at strict thresholds.
"""

from __future__ import annotations

import pytest

from res2df_spark.llm.dedup import (
    containment_pairs,
    duplicate_ngram_spans,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingle_df_stats,
    simhash_near_pairs,
    simhash_signatures,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near a river bend"),
    (3, "entirely different words compose this unrelated tiny document body"),
    (4, "a short doc"),
    (5, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jaccard_pairs_hash_invariant(docs):
    a = _rows(ngram_jaccard_pairs(docs, threshold=0.3, shingle_k=2))
    b = _rows(
        ngram_jaccard_pairs(docs, threshold=0.3, shingle_k=2, hash_fn="xxhash64")
    )
    assert a == b and len(a) >= 2  # the 0/1 exact pair plus 0/2-family


def test_containment_pairs_hash_invariant(docs):
    a = _rows(containment_pairs(docs, threshold=0.5, shingle_k=2))
    b = _rows(
        containment_pairs(docs, threshold=0.5, shingle_k=2, hash_fn="xxhash64")
    )
    assert a == b and a


def test_containment_cap_applies_on_hashed_index(spark):
    # 30 identical docs: every shingle has df=30 > cap -> empty index
    docs = spark.createDataFrame(
        [(i, "same boilerplate text everywhere again") for i in range(30)],
        "doc_id long, text string",
    )
    out = containment_pairs(
        docs, threshold=0.5, shingle_k=2, max_token_df=10, hash_fn="xxhash64"
    )
    assert out.count() == 0


def test_dup_spans_hash_invariant(docs):
    a = _rows(duplicate_ngram_spans(docs, k=2))
    b = _rows(duplicate_ngram_spans(docs, k=2, hash_fn="xxhash64"))
    assert a == b


def test_shingle_df_stats_hash_invariant(docs):
    a = _rows(shingle_df_stats(docs, shingle_k=2, max_token_df=2))
    b = _rows(shingle_df_stats(docs, shingle_k=2, max_token_df=2, hash_fn="xxhash64"))
    assert a == b


def test_simhash_xx_signatures_and_pairs(docs):
    sigs = {
        r.doc_id: r.simhash
        for r in simhash_signatures(docs, hash_fn="xxhash64").collect()
    }
    assert sigs[0] == sigs[1]  # identical texts, identical signatures
    assert sigs[0] != sigs[3]  # disjoint token sets diverge
    md5_pairs = simhash_near_pairs(docs, max_hamming=3)
    xx_pairs = simhash_near_pairs(docs, max_hamming=3, hash_fn="xxhash64")
    assert dict(md5_pairs.dtypes) == dict(xx_pairs.dtypes)
    got = {(r.d1, r.d2): r.hamming for r in xx_pairs.collect()}
    assert got[(0, 1)] == 0  # exact duplicates at Hamming 0 under any hash
    assert (0, 3) not in got and (1, 3) not in got


def test_minhash_xx_bands_and_candidates(docs):
    md5_c = minhash_lsh_candidates(docs, num_hashes=16, band_size=4, shingle_k=2)
    xx_c = minhash_lsh_candidates(
        docs, num_hashes=16, band_size=4, shingle_k=2, hash_fn="xxhash64"
    )
    assert dict(md5_c.dtypes) == dict(xx_c.dtypes)
    got = {(r.d1, r.d2): r.n_bands for r in xx_c.collect()}
    # identical shingle sets -> identical signatures -> ALL bands match
    assert got[(0, 1)] == 4
    assert (0, 3) not in got


def test_segment_dedup_hash_invariant(docs):
    from res2df_spark.llm.dedup import cross_doc_segment_dedup

    a = _rows(cross_doc_segment_dedup(docs, window=4))
    b = _rows(cross_doc_segment_dedup(docs, window=4, hash_fn="xxhash64"))
    assert a == b and a


def test_verified_pairs_xx_runs_with_exact_jaccard(docs):
    """Bands differ between hash families, but the verification half is
    the exact shingle Jaccard — an exact duplicate pair must come out
    verified with jaccard 1.0 under either backend."""
    from res2df_spark.llm.dedup import minhash_verified_pairs

    out = {
        (r.d1, r.d2): r
        for r in minhash_verified_pairs(
            docs, num_hashes=16, band_size=4, shingle_k=2, hash_fn="xxhash64"
        ).collect()
    }
    r = out[(0, 1)]
    assert r.is_dup and abs(r.jaccard - 1.0) < 1e-9 and r.n_bands == 4


def test_bad_hash_fn_rejected(docs):
    with pytest.raises(ValueError, match="hash_fn"):
        ngram_jaccard_pairs(docs, hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        simhash_signatures(docs, hash_fn="crc32")


def test_xx_suite_rows_match_md5_semantics(spark):
    """The registered dedup_containment_xx row must equal the md5 row
    (they share one oracle); the RAW xx pair frame must keep the md5
    row's schema, and the registered dedup_simhash_pairs_xx invariant
    row (round 9: hash-oracled summary replacing the rows-only
    registration) must report zero violations."""
    from res2df_spark import suite
    from res2df_spark.catalog import Catalog
    from res2df_spark.llm.dedup import simhash_near_pairs

    sf_dir = "/root/testdata/sf0.001"
    a = _rows(suite.QUERIES["dedup_containment"](spark, sf_dir))
    b = _rows(suite.QUERIES["dedup_containment_xx"](spark, sf_dir))
    assert a == b
    md5_df = suite.QUERIES["dedup_simhash_pairs"](spark, sf_dir)
    raw_xx = simhash_near_pairs(
        Catalog(spark, sf_dir).documents, max_hamming=3, hash_fn="xxhash64"
    )
    assert dict(md5_df.dtypes) == dict(raw_xx.dtypes)
    inv = suite.QUERIES["dedup_simhash_pairs_xx"](spark, sf_dir).first()
    assert inv.n_exact_missing == 0
    assert inv.n_bound_violations == 0
    assert inv.n_noncanonical == 0
    assert inv.n_duplicate_rows == 0
    assert inv.n_exact_pairs >= 0


def test_exact_duplicates_hash_invariant(docs):
    """Round 8: the pipeline passthrough — keeper/size identical under
    both backends (group-key column renames to stay honest)."""
    from res2df_spark.llm.dedup import exact_duplicates

    a = _rows(exact_duplicates(docs).select("keeper_id", "n_docs"))
    b = _rows(
        exact_duplicates(docs, hash_fn="xxhash64").select("keeper_id", "n_docs")
    )
    assert a == b
    assert "text_md5" in exact_duplicates(docs).columns
    assert "text_xx64" in exact_duplicates(docs, hash_fn="xxhash64").columns
    with pytest.raises(ValueError, match="hash_fn"):
        exact_duplicates(docs, hash_fn="sha1")


def test_soft_dedup_weights_hash_invariant(docs):
    """Round 8: group sizes and shingle document frequencies — hence
    every weight — survive the injective hash map."""
    from res2df_spark.llm.weights import soft_dedup_weights

    a = _rows(soft_dedup_weights(docs, shingle_k=2))
    b = _rows(soft_dedup_weights(docs, shingle_k=2, hash_fn="xxhash64"))
    assert a == b and a
    with pytest.raises(ValueError, match="hash_fn"):
        soft_dedup_weights(docs, hash_fn="blake3")


def test_simhash_xx_exact_pairs_suite_row(spark):
    """The round-8 A/B completeness row: every identical-token-set pair
    appears at Hamming 0 under BOTH backends, and the row count equals
    the hash-free ground truth (the containment property the oracle
    pins)."""
    from res2df_spark import suite
    from res2df_spark.functions.textan import tokens
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    out = suite.QUERIES["dedup_simhash_xx_exact_pairs"](spark, sf_dir)
    rows = out.collect()
    assert rows and all(r.ham_xx == 0 and r.ham_md5 == 0 for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ts = F.array_sort(F.array_distinct(tokens(F.col("text"))))
    truth_n = (
        docs.filter(F.col("text").isNotNull())
        .select(ts.alias("t")).filter(F.size("t") > 0)
        .groupBy("t").count().filter(F.col("count") > 1)
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("n"))
        .collect()[0]["n"]
    )
    assert len(rows) == int(truth_n)
