"""Training-data curation operators (llm/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from res2df_spark.llm.curation import (
    doc_chunks,
    hash_split,
    pack_sequences,
    pii_scrub,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "mail me at bob.smith+x@example.org or call 12345678 now"),
        (3, ""),
        (4, "x" * 450),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_split_deterministic(spark):
    a = {r.doc_id: r.split for r in hash_split(_docs(spark)).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(_docs(spark).repartition(7)).collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}


def test_hash_split_ratio(spark):
    big = spark.range(20000).withColumnRenamed("id", "doc_id")
    counts = {
        r.split: r["count"]
        for r in hash_split(big, id_col="doc_id").groupBy("split").count().collect()
    }
    assert abs(counts["train"] / 20000 - 230 / 256) < 0.02
    assert abs(counts.get("val", 0) / 20000 - 13 / 256) < 0.02


def test_doc_chunks_windows(spark):
    out = doc_chunks(_docs(spark), chunk_chars=200, overlap=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # empty doc yields nothing
    assert 3 not in by_doc
    # 450 chars, step 150 → starts 1, 151, 301 → 3 chunks of 200/200/150
    d4 = sorted(by_doc[4], key=lambda r: r.chunk_idx)
    assert [r.chunk_chars for r in d4] == [200, 200, 150]
    assert d4[1].chunk_text == "x" * 200
    # overlap: chunk 0 tail == chunk 1 head (50 chars)
    assert d4[0].chunk_text[-50:] == d4[1].chunk_text[:50]


def test_doc_chunks_bad_overlap(spark):
    with pytest.raises(ValueError):
        doc_chunks(_docs(spark), chunk_chars=50, overlap=50)


def test_pii_scrub(spark):
    got = {r.doc_id: r for r in pii_scrub(_docs(spark)).collect()}
    assert got[2].n_emails == 1 and got[2].n_longnums == 1
    assert "<EMAIL>" in got[2].scrubbed and "<NUM>" in got[2].scrubbed
    assert "example.org" not in got[2].scrubbed
    assert got[1].n_emails == 0 and got[1].scrubbed == "alpha beta gamma delta"


def test_pack_sequences_contiguous(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.repeat(F.lit("w "), 9)).alias("text"),  # 10 tokens
    )
    out = pack_sequences(docs, target_tokens=25, n_shards=4).collect()
    # within a shard, bin_id is non-decreasing in doc_id and the token
    # count BEFORE each doc determines its bin
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        before = 0
        for r in rows:
            assert r.bin_id == before // 25
            before += r.n_tokens
    assert set(r.shard for r in out) <= set(range(4))


def test_pack_sequences_bad_shards(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark), n_shards=7)


def test_pack_sequences_null_text(spark):
    from res2df_spark.llm.curation import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in pack_sequences(docs, target_tokens=4).collect()}
    assert out[2].n_tokens == 0  # NULL text must not decrement totals
    assert all(r.n_tokens >= 0 and r.bin_id >= 0 for r in out.values())


def test_doc_chunks_no_redundant_tail(spark):
    from res2df_spark.llm.curation import doc_chunks

    # 160 chars, chunk 200, overlap 50: a start at 151 would emit a
    # chunk fully contained in chunk 0 — must not be emitted
    docs = spark.createDataFrame([(1, "y" * 160)], "doc_id long, text string")
    out = doc_chunks(docs, chunk_chars=200, overlap=50).collect()
    assert len(out) == 1 and out[0].chunk_chars == 160


def test_deterministic_sample(spark):
    from res2df_spark.llm.curation import deterministic_sample

    big = spark.range(10000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in deterministic_sample(big, fraction=0.1).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(big.repartition(13), fraction=0.1).collect()
    }
    assert a == b  # partition-independent
    assert abs(len(a) / 10000 - 26 / 256) < 0.02
    assert deterministic_sample(big, fraction=0.0).count() == 0
    assert deterministic_sample(big, fraction=1.0).count() == 10000
    with pytest.raises(ValueError):
        deterministic_sample(big, fraction=1.5)


def test_stratified_sample(spark):
    from res2df_spark.llm.curation import md5_bucket256, stratified_sample

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 0.25, "de": 1.0})
    got = {r.doc_id: r.lang for r in out.collect()}
    # de kept whole, en thinned to ~1/4
    assert sum(1 for v in got.values() if v == "de") == 100
    n_en = sum(1 for v in got.values() if v == "en")
    assert 10 < n_en < 45
    # membership is a pure function of (id, stratum): recompute one row
    b = df.select(md5_bucket256(F.col("doc_id"), "strat").alias("b"),
                  "doc_id", "lang").collect()
    for r in b:
        expected = r.b < (64 if r.lang == "en" else 256)
        assert (r.doc_id in got) == expected


def test_stratified_sample_drops_unknown_strata(spark):
    from res2df_spark.llm.curation import stratified_sample

    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], "doc_id long, lang string"
    )
    out = stratified_sample(df, "lang", {"en": 1.0})
    assert [r.doc_id for r in out.collect()] == [1]


def test_stratified_sample_bad_fraction(spark):
    import pytest

    from res2df_spark.llm.curation import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})


def test_contamination_check(spark):
    from res2df_spark.llm.curation import contamination_check

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris obviously")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark answer verbatim -> high overlap
            (1, "quiz answer the capital of france is paris obviously yes"),
            # no 3-gram in common
            (2, "completely unrelated text about spark engines and joins"),
            (3, "ab"),  # too short for a 3-shingle: no row
        ],
        "doc_id long, text string",
    )
    out = contamination_check(docs, bench, shingle_k=3, threshold=0.5)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1].is_contaminated and got[1].n_contaminated == 5
    assert not got[2].is_contaminated and got[2].n_contaminated == 0
    assert 0.0 <= got[2].contamination < got[1].contamination <= 1.0


def test_quality_filter(spark):
    from res2df_spark.llm.curation import quality_filter

    long_good = " ".join(
        f"word{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(60)
    )
    repetitive = " ".join(["spam"] * 60)
    short = "tiny doc"
    digits = " ".join(["123456"] * 60)
    docs = spark.createDataFrame(
        [(1, long_good), (2, repetitive), (3, short), (4, ""), (5, digits)],
        "doc_id long, text string",
    )
    out = quality_filter(docs, min_tokens=50, max_dup_token_frac=0.5,
                         min_alpha_ratio=0.6)
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].keep and got[1].reject_mask == 0
    assert not got[2].keep and got[2].reject_mask & 4      # repetition
    assert not got[3].keep and got[3].reject_mask & 1      # too short
    # empty doc: short + no alpha, NULL metrics where undefined
    assert got[4].reject_mask & 1 and got[4].reject_mask & 8
    assert got[4].mean_token_len is None and got[4].alpha_ratio is None
    assert not got[5].keep and got[5].reject_mask & 8      # digits only


def test_quality_report(spark):
    from res2df_spark.llm.curation import quality_report

    docs = spark.createDataFrame(
        [
            (1, "srcA", " ".join(f"w{chr(97 + i % 26)}{chr(97 + i // 26)}"
                                 for i in range(60))),
            (2, "srcA", "short"),
            (3, "srcB", " ".join(["dup"] * 60)),
        ],
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in quality_report(
        docs, min_tokens=50, max_dup_token_frac=0.5, min_alpha_ratio=0.6
    ).collect()}
    assert got["srcA"].n_docs == 2 and got["srcA"].n_keep == 1
    assert got["srcA"].n_reject_len == 1
    assert got["srcB"].n_reject_rep == 1 and got["srcB"].n_keep == 0


def test_contamination_pairs(spark):
    from res2df_spark.llm.curation import contamination_pairs

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris obviously"),
         (200, "completely separate benchmark question here today")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "quiz answer the capital of france is paris obviously yes"),
         (2, "nothing in common with either benchmark item at all")],
        "doc_id long, text string",
    )
    out = contamination_pairs(docs, bench, shingle_k=3, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.bench_id, r.n_shared) == (1, 100, 5)
    assert r.overlap_frac == pytest.approx(5 / r.doc_shingles)


def test_pack_texts(spark):
    from res2df_spark.llm.curation import pack_sequences, pack_texts

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(40)],
        "doc_id long, text string",
    )
    bins = pack_sequences(docs, target_tokens=25, n_shards=4)
    packed = pack_texts(docs, target_tokens=25, n_shards=4, sep=" | ")
    assignment = {(r.shard, r.bin_id) for r in bins.collect()}
    got = {(r.shard, r.bin_id): r for r in packed.collect()}
    assert set(got) == assignment  # one output row per assigned bin
    for r in got.values():
        # concat in id order: first_id's text leads the packed string
        assert r.packed_text.startswith("w")
        assert r.n_docs == r.packed_text.count(" | ") + 1
        assert r.total_tokens == 10 * r.n_docs
    # deterministic under repartitioning
    again = {(r.shard, r.bin_id): r.packed_text
             for r in pack_texts(docs.repartition(13), target_tokens=25,
                                 n_shards=4, sep=" | ").collect()}
    assert again == {k: v.packed_text for k, v in got.items()}


def test_normalize_text(spark):
    from res2df_spark.functions.textan import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello\tWORLD​  spark\x01engine  ")],
        "doc_id long, text string",
    )
    got = df.select(normalize_text("text").alias("t")).collect()[0].t
    assert got == "hello world spark engine"


def test_pack_sequences_shuffled(spark):
    from res2df_spark.llm.curation import pack_sequences, pack_texts

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(60)],
        "doc_id long, text string",
    )
    plain = {r.doc_id: (r.shard, r.bin_id)
             for r in pack_sequences(docs, target_tokens=25, n_shards=4).collect()}
    shuf = {r.doc_id: (r.shard, r.bin_id)
            for r in pack_sequences(docs, target_tokens=25, n_shards=4,
                                    shuffle_salt="e0").collect()}
    # shards are salt('pack')-determined, identical; bin order differs
    assert all(plain[d][0] == shuf[d][0] for d in plain)
    assert any(plain[d][1] != shuf[d][1] for d in plain)
    # deterministic: same salt → same assignment on any partitioning
    again = {r.doc_id: (r.shard, r.bin_id)
             for r in pack_sequences(docs.repartition(11), target_tokens=25,
                                     n_shards=4, shuffle_salt="e0").collect()}
    assert again == shuf
    # a different epoch salt reshuffles
    e1 = {r.doc_id: (r.shard, r.bin_id)
          for r in pack_sequences(docs, target_tokens=25, n_shards=4,
                                  shuffle_salt="e1").collect()}
    assert e1 != shuf
    # pack_texts concat order follows the same shuffled order
    packed = pack_texts(docs, target_tokens=25, n_shards=4, sep="|",
                        shuffle_salt="e0")
    by_bin = {(r.shard, r.bin_id): r.n_docs for r in packed.collect()}
    from collections import Counter
    want = Counter(shuf.values())
    assert by_bin == dict(want)
