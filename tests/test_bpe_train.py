"""Distributed BPE training vs an independent single-machine reference
implementation of the Sennrich et al. (2016) algorithm."""

from __future__ import annotations

from collections import Counter

import pytest

from res2df_spark.llm.vocab import bpe_segment, bpe_train


def _ref_bpe(texts, n_merges, min_pair_count=2, eow="</w>"):
    """Reference: word-frequency BPE with leftmost-greedy merging and
    (count desc, left, right) tie-breaking."""
    words = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) + [eow] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "lowest wider wide wide wide low new",
]


@pytest.mark.parametrize("n_merges", [1, 5, 12])
def test_bpe_train_matches_reference(spark, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges, words = bpe_train(df, n_merges)
    ref_merges, ref_vocab = _ref_bpe(CORPUS, n_merges)
    assert merges == ref_merges
    got_vocab = {r.word: list(r.syms) for r in words.collect()}
    assert got_vocab == ref_vocab


def test_bpe_train_stops_when_pairs_run_dry(spark):
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id int, text string")
    merges, _ = bpe_train(df, 100, min_pair_count=2)
    ref_merges, _ = _ref_bpe(["ab ab cd"], 100)
    assert merges == ref_merges
    assert len(merges) < 100  # early stop, not the full budget


def test_bpe_segment_counts_and_oov_fallback(spark):
    train = spark.createDataFrame([(1, "aa aa aa bb")], "doc_id int, text string")
    merges, words = bpe_train(train, 3)
    test = spark.createDataFrame(
        [(9, "aa zz")], "doc_id int, text string"  # zz is out-of-vocabulary
    )
    row = bpe_segment(test, words).collect()[0]
    ref_merges, ref_vocab = _ref_bpe(["aa aa aa bb"], 3)
    expected_aa = len(ref_vocab["aa"])
    assert row.n_words == 2
    assert row.n_pieces == expected_aa + 3  # zz falls back to z,z,</w>
