"""Behavioral + plan tests for containment pairing and cross-document
segment (line) dedup (llm/dedup.py round-5 additions)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from res2df_spark.llm.dedup import (
    containment_pairs,
    cross_doc_segment_dedup,
    ngram_jaccard_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---------------------------------------------------------------------------
# containment_pairs


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    short = "q w e r t y u"  # 5 3-gram shingles
    long = short + " " + " ".join(f"tok{i}" for i in range(60))
    docs = _docs(spark, [short, long])
    cont = containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["d1"], row["d2"]) == (0, 1)
    assert row["c1"] == pytest.approx(1.0)  # short fully contained
    assert row["c2"] < 0.2
    # Jaccard at the same bar finds nothing
    assert ngram_jaccard_pairs(docs, threshold=0.9, shingle_k=3).count() == 0


def test_containment_direction_ratios(spark):
    # A has 4 shingles, B has 8, sharing exactly A's 4
    a = "a b c d e f"
    b = a + " g h i j"
    docs = _docs(spark, [a, b])
    row = containment_pairs(docs, threshold=0.5).collect()[0]
    assert row["size1"] == 4 and row["size2"] == 8
    assert row["c1"] == pytest.approx(1.0)
    assert row["c2"] == pytest.approx(0.5)


def test_containment_below_threshold_empty(spark):
    docs = _docs(spark, ["a b c d", "x y z w"])
    assert containment_pairs(docs, threshold=0.1).count() == 0


# ---------------------------------------------------------------------------
# cross_doc_segment_dedup


def test_line_dedup_cuts_shared_boilerplate_keeps_order(spark):
    boiler = " ".join(f"b{i}" for i in range(8))  # one full shared segment
    u1 = " ".join(f"u{i}" for i in range(8))
    u2 = " ".join(f"v{i}" for i in range(8))
    docs = _docs(spark, [f"{u1} {boiler}", f"{boiler} {u2}", "solo text"])
    out = {r["doc_id"]: r for r in cross_doc_segment_dedup(docs, window=8).collect()}
    assert out[0]["n_segments"] == 2 and out[0]["n_kept"] == 1
    assert out[0]["kept_text"] == u1
    assert out[1]["kept_text"] == u2  # order preserved after the cut
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == "solo text"


def test_line_dedup_intra_doc_repeat_counts_one_doc(spark):
    # a segment repeated INSIDE one doc has df=1 -> kept (both copies)
    seg = " ".join(f"s{i}" for i in range(8))
    docs = _docs(spark, [f"{seg} {seg}"])
    row = cross_doc_segment_dedup(docs, window=8).collect()[0]
    assert row["n_segments"] == 2 and row["n_kept"] == 2


def test_line_dedup_fully_duplicated_doc_empties(spark):
    seg = " ".join(f"d{i}" for i in range(8))
    docs = _docs(spark, [seg, seg])
    rows = cross_doc_segment_dedup(docs, window=8).collect()
    assert all(r["n_kept"] == 0 and r["kept_text"] == "" for r in rows)


def test_line_dedup_max_df_loosens_cut(spark):
    seg = " ".join(f"m{i}" for i in range(8))
    docs = _docs(spark, [seg, seg])
    rows = cross_doc_segment_dedup(docs, window=8, max_df=2).collect()
    assert all(r["n_kept"] == 1 for r in rows)


def test_line_dedup_short_tail_segment(spark):
    # 10 tokens -> segments of 8 + 2
    docs = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
    row = cross_doc_segment_dedup(docs, window=8).collect()[0]
    assert row["n_segments"] == 2
    assert row["kept_text"].split() == [f"t{i}" for i in range(10)]


def test_no_cartesian_in_plans(spark):
    docs = _docs(spark, ["a b c d e", "a b c d f"])
    for df in (
        containment_pairs(docs, threshold=0.5),
        cross_doc_segment_dedup(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# minhash_verified_pairs (candidates -> verify -> threshold)


def test_minhash_verified_separates_true_and_false_candidates(spark):
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"  # ~0.87 jaccard sets
    far = " ".join(f"x{i}" for i in range(30))
    docs = _docs(spark, [base, near, far])
    from res2df_spark.llm.dedup import minhash_verified_pairs

    rows = minhash_verified_pairs(
        docs, num_hashes=16, band_size=4, shingle_k=3, threshold=0.7
    ).collect()
    got = {(r["d1"], r["d2"]): r for r in rows}
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["is_dup"] and r["jaccard"] >= 0.7 and r["n_bands"] >= 1
    # the unrelated doc never becomes a verified duplicate
    assert all(not r["is_dup"] for (a, b), r in got.items() if 2 in (a, b))


def test_minhash_verified_agrees_with_exact_jaccard(spark):
    docs = _docs(
        spark,
        [
            "p q r s t u v w",
            "p q r s t u v y",
            "p q r s a b c d",
        ],
    )
    from res2df_spark.llm.dedup import minhash_verified_pairs

    verified = {
        (r["d1"], r["d2"]): (r["n_shared"], r["jaccard"])
        for r in minhash_verified_pairs(
            docs, shingle_k=3, threshold=0.5
        ).collect()
    }
    exact = {
        (r["d1"], r["d2"]): (r["n_shared"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(docs, threshold=0.0, shingle_k=3).collect()
    }
    # every candidate's jaccard equals the exact all-pairs number
    for pair, (n, j) in verified.items():
        if n > 0:
            assert exact[pair] == (n, j), pair
