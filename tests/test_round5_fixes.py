"""Round-5 regression tests for the ADVICE findings: NULL-text handling
in the curate CLI's dedup-exact, byte-suffix conf parsing in spread(),
mixed Eclipse/OPM date families in PRT parsing, pq_train's empty-corpus
guard, and the curate CLI's --source-col validation."""

from __future__ import annotations

import pytest

from tests.conftest import rows


# --- fipreports: mixed Eclipse/OPM date families -------------------------

MIXED_PRT = """\
 NOISE
  REPORT   0     1 JAN 2020   *  RUN
                     : FIPNUM  REPORT REGION    1    :
 :CURRENTLY IN PLACE       :        1000.5           20.    1020.5:      500. :       10.        90.       100.:
Starting time step 5, stepsize 30 days, at day 31/366, date = 01-Feb-2020
                     : FIPNUM  REPORT REGION    1    :
 :CURRENTLY IN PLACE       :         900.0           20.     920.0:      400. :       10.        80.        90.:
  REPORT   2     1 MAR 2020   *  RUN
                     : FIPNUM  REPORT REGION    1    :
 :CURRENTLY IN PLACE       :         800.0           20.     820.0:      300. :       10.        70.        80.:
"""


def test_fipreports_mixed_date_families(spark, tmp_path):
    """Whichever date family appeared LAST before a balance line wins —
    a bare coalesce would stamp the OPM-dated middle block with the
    stale January Eclipse date."""
    from datetime import date as _date

    from res2df_spark.modules import fipreports

    p = tmp_path / "MIXED.PRT"
    p.write_text(MIXED_PRT)
    got = rows(fipreports.df(spark, str(p)), "DATE", "STOIIP_OIL")
    assert (_date(2020, 1, 1), 1000.5) in got
    assert (_date(2020, 2, 1), 900.0) in got  # OPM line is the newest here
    assert (_date(2020, 3, 1), 800.0) in got  # Eclipse wins again after


# --- curate CLI: dedup-exact must not pool NULL texts ---------------------


def test_curate_dedup_exact_null_texts(spark, tmp_path):
    import duckdb

    from res2df_spark.cli import curate_main

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    ).write.parquet(src)
    assert curate_main(["dedup-exact", src, "-o", out]) == 0
    kept = sorted(
        r[0]
        for r in duckdb.sql(f"SELECT doc_id FROM '{out}/*.parquet'").fetchall()
    )
    # both NULL-text docs survive; the 'same' pair dedups to its lowest id
    assert kept == [1, 3, 4, 5]


# --- curate CLI: --source-col validation ----------------------------------


def test_curate_stats_source_col(spark, tmp_path):
    import duckdb

    from res2df_spark.cli import curate_main

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a b c", "web"), (2, "d e", "book")],
        "doc_id long, text string, origin string",
    ).write.parquet(src)
    out = str(tmp_path / "stats")
    assert curate_main(
        ["stats", src, "-o", out, "--source-col", "origin"]
    ) == 0
    got = duckdb.sql(f"SELECT origin, n_docs FROM '{out}/*.parquet'").fetchall()
    assert sorted(got) == [("book", 1), ("web", 1)]
    # a corpus without the column fails loudly, not with an opaque
    # analysis error
    with pytest.raises(SystemExit, match="source"):
        curate_main(["stats", src, "-o", out])


def test_curate_lm_score_empty_train_slice(spark, tmp_path):
    from res2df_spark.cli import curate_main

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "hello world", "web")], "doc_id long, text string, source string"
    ).write.parquet(src)
    with pytest.raises(SystemExit, match="matches no"):
        curate_main(
            ["lm-score", src, "-o", str(tmp_path / "o"),
             "--train-source", "nonexistent"]
        )


# --- session: byte-suffixed conf values ------------------------------------


def test_parse_byte_conf_units():
    from res2df_spark.session import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 128 * 1024**2
    assert _parse_byte_conf("128m") == 128 * 1024**2
    assert _parse_byte_conf("128MB") == 128 * 1024**2
    assert _parse_byte_conf("1g") == 1024**3
    assert _parse_byte_conf("512kb") == 512 * 1024
    with pytest.raises(ValueError):
        _parse_byte_conf("12.5g")


def test_spread_with_suffixed_conf(spark, tmp_path):
    """spread() must not crash when the session carries a unit-suffixed
    maxPartitionBytes (legal external configuration)."""
    from res2df_spark.session import spread

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        assert spread(spark.read.parquet(p)).count() == 100
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# --- pq_train: empty-corpus guard ------------------------------------------


def test_pq_train_empty_corpus(spark):
    from res2df_spark.llm.similarity import pq_train

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty, m=2, k=2)


# ---------------------------------------------------------------------------
# Second round-5 review pass (similarity + streaming)


def test_semantic_novelty_string_ids(spark):
    """match_id must survive non-numeric id types (the max(struct(cos,
    -id)) form coerced/crashed on strings)."""
    from pyspark.sql import Row, functions as F

    from res2df_spark.llm.similarity import semantic_novelty

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id int, centroid array<double>",
    )
    index = spark.createDataFrame(
        [
            Row(vec_id="doc-a", centroid_id=0, embedding=[1.0, 0.0]),
            Row(vec_id="doc-b", centroid_id=0, embedding=[0.9, 0.1]),
        ]
    )
    new = spark.createDataFrame(
        [Row(vec_id="doc-new", embedding=[1.0, 0.05])]
    )
    row = semantic_novelty(new, index, cents, threshold=0.9).collect()[0]
    assert row["match_id"] == "doc-a"  # best cosine, string id intact
    assert not row["is_novel"]
    # tie-break goes to the LOWER id
    tied = spark.createDataFrame(
        [
            Row(vec_id="z-high", centroid_id=0, embedding=[1.0, 0.0]),
            Row(vec_id="a-low", centroid_id=0, embedding=[1.0, 0.0]),
        ]
    )
    row = semantic_novelty(
        spark.createDataFrame([Row(vec_id="q", embedding=[1.0, 0.0])]),
        tied,
        cents,
        threshold=0.9,
    ).collect()[0]
    assert row["match_id"] == "a-low"


def test_near_dup_verdicts_null_text_is_null_verdict(spark):
    from pyspark.sql import Row

    from res2df_spark.streaming.ops import near_dup_verdicts

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="real words here"),
            Row(doc_id=1, text=None),
            Row(doc_id=2, text="   "),
        ]
    )
    claims = spark.createDataFrame([Row(doc_id=0, band_idx=0, band_key="k")])
    out = {r["doc_id"]: r for r in near_dup_verdicts(docs, claims).collect()}
    assert out[0]["is_near_dup_candidate"] is False
    assert out[1]["is_near_dup_candidate"] is None  # NULL text
    assert out[2]["is_near_dup_candidate"] is None  # whitespace-only


def test_quantize_and_truncate_plans_materialize_aggregates(spark):
    """The per-vector min/max/norm must appear ONCE as projected
    columns, not re-evaluated inside the element lambda (O(d^2))."""
    from pyspark.sql import Row

    from res2df_spark.llm.similarity import (
        quantize_embeddings,
        truncate_embeddings,
    )

    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[float(i) for i in range(8)])]
    )
    qplan = (
        quantize_embeddings(emb)._jdf.queryExecution().optimizedPlan().toString()
    )
    # one array_min/array_max each in the projection, not one per element
    assert qplan.count("array_min") == 1 and qplan.count("array_max") == 1
    tplan = (
        truncate_embeddings(emb, dims=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert tplan.lower().count("aggregate(") <= 2  # norm computed once


# --- deck parser: INCLUDE record semantics + flag-run restriction --------


def _write(p, text):
    p.write_text(text)
    return str(p)


def test_include_on_keyword_line(tmp_path):
    """``INCLUDE 'file' /`` on ONE line is legal Eclipse and must
    splice (finding: the line-based scan only looked at FOLLOWING
    lines)."""
    from res2df_spark.sources.deck import read_deck

    _write(tmp_path / "inc.inc", "WELSPECS\n 'W1' 'G' 1 1 100 OIL /\n/\n")
    deck = _write(tmp_path / "D.DATA", "INCLUDE 'inc.inc' /\nEND\n")
    assert "WELSPECS" in read_deck(deck)


def test_include_glued_terminator_and_slash_path(tmp_path):
    """Unquoted paths keep interior slashes; a GLUED trailing '/' is
    the record terminator, not part of the path."""
    from res2df_spark.sources.deck import read_deck

    sub = tmp_path / "sub"
    sub.mkdir()
    _write(sub / "w.inc", "-- spliced\n")
    deck = _write(tmp_path / "D.DATA", "INCLUDE\n sub/w.inc/\nEND\n")
    assert "spliced" in read_deck(deck)


def test_include_missing_terminator_raises(tmp_path):
    """Deck text after an unterminated INCLUDE must not be silently
    swallowed while scanning for '/'."""
    from res2df_spark.sources.deck import read_deck

    _write(tmp_path / "inc.inc", "--x\n")
    deck = _write(
        tmp_path / "D.DATA", "INCLUDE\n 'inc.inc'\nWELSPECS\n 'W' G 1 1 /\n/\n"
    )
    with pytest.raises(ValueError, match="terminator"):
        read_deck(deck)


def test_include_comment_in_quoted_path(tmp_path):
    """'--' inside a QUOTED filename is path text, not a comment."""
    from res2df_spark.sources.deck import read_deck

    _write(tmp_path / "A--12.inc", "-- ok\n")
    deck = _write(tmp_path / "D.DATA", "INCLUDE\n 'A--12.inc' /\nEND\n")
    assert "ok" in read_deck(deck)


def test_skipped_mnemonics_do_not_resume_parse():
    """A skipped keyword whose PAYLOAD mnemonics collide with
    registered keyword names (RPTSCHED ... WELSPECS ...) must not
    resume the parse mid-payload as a phantom record; a genuine flag
    chain (OIL WATER METRIC) must still hold the boundary so the
    keyword after it is seen."""
    from res2df_spark.sources.deck import parse_deck

    recs = parse_deck(
        "RPTSCHED\n FIP WELSPECS CPU /\n"
        "OIL\nWATER\nMETRIC\n"
        "START\n 1 JAN 2020 /\n"
    )
    kws = [r["KEYWORD"] for r in recs]
    assert kws == ["START"]


# --- case facade: column_keys string, loud missing UNRST -----------------


def test_case_summary_string_column_keys():
    """A bare string is one wildcard pattern, not an iterable of
    single-character patterns."""
    import os

    from pyspark.sql import SparkSession

    from res2df_spark.case import ResdataCase

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[4]").config("spark.ui.enabled", "false").getOrCreate()
    root = "/root/reference/tests/data/eightcells/EIGHTCELLS"
    if not os.path.isfile(root + ".SMSPEC"):
        pytest.skip("eightcells SMSPEC not present")
    case = ResdataCase(spark, root + ".DATA")
    wide = case.summary(column_keys="FOPR*")
    data_cols = [c for c in wide.columns if c != "DATE"]
    assert data_cols and all(c.startswith("FOPR") for c in data_cols)


def test_case_grid_missing_unrst_raises(tmp_path):
    """rstdates on a case without UNRST must fail loudly, not return a
    silently restart-less frame."""
    import shutil

    from pyspark.sql import SparkSession

    from res2df_spark.case import ResdataCase

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[4]").config("spark.ui.enabled", "false").getOrCreate()
    src = "/root/reference/tests/data/eightcells/EIGHTCELLS"
    import os

    if not os.path.isfile(src + ".EGRID"):
        pytest.skip("eightcells fixtures not present")
    for ext in (".DATA", ".EGRID", ".INIT"):
        shutil.copy(src + ext, tmp_path / ("CASE" + ext))
    case = ResdataCase(spark, str(tmp_path / "CASE.DATA"))
    with pytest.raises(FileNotFoundError, match="UNRST"):
        case.grid(rstdates="last")
    assert case.grid() is not None  # static-only path still fine


def test_include_tab_and_double_quoted_comment_path(tmp_path):
    """INCLUDE followed by a TAB must splice; a DOUBLE-quoted filename
    containing '--' must survive comment stripping."""
    from res2df_spark.sources.deck import read_deck

    (tmp_path / "A--12.inc").write_text("-- dq ok\n")
    (tmp_path / "t.inc").write_text("-- tab ok\n")
    deck = tmp_path / "D.DATA"
    deck.write_text('INCLUDE\t\'t.inc\' /\nINCLUDE\n "A--12.inc" /\nEND\n')
    text = read_deck(str(deck))
    assert "tab ok" in text and "dq ok" in text


def test_includex_is_not_include(tmp_path):
    """A keyword merely PREFIXED with INCLUDE is not an include."""
    from res2df_spark.sources.deck import read_deck

    deck = tmp_path / "D.DATA"
    deck.write_text("INCLUDEX\n 1 /\nEND\n")
    assert "INCLUDEX" in read_deck(str(deck))


def test_lm_map_literal_fallback_path(spark):
    """n != 2 (and non-latin1 models) take the map-literal path — it
    must still run after the dense-path rework (regression: NameError
    on the deleted grams/k bindings)."""
    from res2df_spark.llm.lm import lm_quality_score, train_char_lm

    docs = spark.createDataFrame(
        [(1, "hello hello"), (2, None), (3, "h")],
        "doc_id int, text string",
    )
    model = train_char_lm(docs.filter("doc_id = 1"), n=3)
    out = {r["doc_id"]: r for r in
           lm_quality_score(docs, model, n=3).collect()}
    assert out[1]["lm_score"] is not None and out[1]["n_grams"] == 9
    assert out[2]["lm_score"] is None and out[3]["lm_score"] is None

    # CJK text forces dense_ok=False even at n=2
    cjk = spark.createDataFrame(
        [(1, "你好你好"), (2, "你好")], "doc_id int, text string")
    m2 = train_char_lm(cjk.filter("doc_id = 1"))
    got = {r["doc_id"]: r["lm_score"]
           for r in lm_quality_score(cjk, m2).collect()}
    assert got[1] is not None and got[2] is not None


def test_flag_keywords_dualporo_boundary():
    """Model-option flags (DUALPORO etc.) after a skipped keyword must
    keep the boundary so the next registered keyword is seen."""
    from res2df_spark.sources.deck import parse_deck

    recs = parse_deck(
        "WELLDIMS\n 10 20 /\nDUALPORO\nAPI\nSTART\n 1 JAN 2020 /\n"
    )
    assert [r["KEYWORD"] for r in recs] == ["START"]


# ---------------------------------------------------------------------------
# Third round-5 review pass (weights / vocab / linkage / textan)


def test_nb_quality_degenerate_slices(spark):
    """An all-positive or all-negative filter must raise, not
    DIVIDE_BY_ZERO (ANSI) or return all-NULL scores."""
    from pyspark.sql import functions as F

    from res2df_spark.llm.weights import nb_quality_score

    docs = spark.createDataFrame(
        [(1, "good text", "en"), (2, "more text", "en")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="negative"):
        nb_quality_score(docs, F.col("lang") == "en").collect()
    with pytest.raises(ValueError, match="positive"):
        nb_quality_score(docs, F.col("lang") == "xx").collect()


def test_heavy_hitters_ignores_null_text(spark):
    """NULL-text rows must not surface as the literal token 'none'."""
    from res2df_spark.llm.vocab import heavy_hitters_mg

    docs = spark.createDataFrame(
        [(i, None) for i in range(5)] + [(9, "real token real")],
        "doc_id long, text string",
    )
    got = {r["token"]: r["mg_count"] for r in heavy_hitters_mg(docs, k=8).collect()}
    assert "none" not in got and "nan" not in got
    assert got.get("real", 0) >= 1


def test_linkage_null_blocks_do_not_eat_cap(spark):
    """NULL blocking values never join — they must be dropped before
    the cap window instead of pooling into one phantom block."""
    from res2df_spark.operators.linkage import blocked_fuzzy_pairs

    rows = [(i, "smith", None) for i in range(50)] + [
        (100, "jones", "z1"), (101, "jones", "z1")]
    df = spark.createDataFrame(rows, "rid long, name string, zip string")
    got = blocked_fuzzy_pairs(
        df, "rid", "name", ["zip"], max_edit_distance=1, max_block_size=10
    ).collect()
    # the real z1 pair survives; the 50 NULL-zip rows produce nothing
    assert [(r["id1"], r["id2"]) for r in got] == [(100, 101)]


def test_bm25_tfidf_null_text_corpus_stats(spark):
    """N/avgdl (bm25) and N (tfidf) describe the scoreable corpus —
    NULL-text rows must not inflate idf."""
    import math

    from res2df_spark.llm.vocab import bm25_topk, tfidf_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    # 'alpha' is in EVERY scoreable doc -> idf must be 0 -> tfidf 0
    out = {(r["doc_id"], r["term"]): r["tfidf"]
           for r in tfidf_topk(docs, k=5).collect()}
    assert out[(1, "alpha")] == 0.0
    q = spark.createDataFrame([("q0", "alpha")], "query_id string, term string")
    got = bm25_topk(docs, q, k=5).collect()
    # idf = ln(1 + (2 - 2 + .5)/(2 + .5)) with N = 2 scoreable docs
    idf = math.log(1 + 0.5 / 2.5)
    tfp = 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
    assert got and abs(got[0]["bm25"] - round(idf * tfp, 6)) < 1e-6


# ---------------------------------------------------------------------------
# Fourth round-5 review pass (curation + dedup)


def test_weighted_sample_never_returns_nonpositive_weights(spark):
    from res2df_spark.llm.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 1.0), (3, 0.0), (4, None), (5, -1.0)],
        "doc_id long, w double",
    )
    got = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=5).collect())
    assert got == [1, 2]  # zero/NULL/negative weights never fill slots


def test_split_leakage_ignores_null_texts(spark):
    from res2df_spark.llm.curation import hash_split, split_leakage

    df = hash_split(spark.createDataFrame(
        [(i, None) for i in range(40)] + [(100, "dup"), (101, "dup")],
        "doc_id long, text string",
    ))
    got = split_leakage(df).collect()
    # no phantom NULL-md5 leak row; the real dup pair may or may not
    # split across buckets but any reported row must have a real hash
    assert all(r["text_md5"] is not None for r in got)


def test_temperature_mix_keeps_null_source_group(spark):
    from res2df_spark.llm.curation import temperature_mix

    rows = [(i, "t", None) for i in range(20)] + [
        (100 + i, "t", "web") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = temperature_mix(df, alpha=1.0)
    # alpha=1 is the documented no-op: every row survives, NULL source
    # included
    assert out.count() == 40


def test_hash_split_validates_cumulative_bounds(spark):
    from res2df_spark.llm.curation import hash_split

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="cumulative"):
        hash_split(df, train=230, val=13)


def test_simhash_pairs_rejects_hamming_zero(spark):
    from res2df_spark.llm.dedup import simhash_near_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exact"):
        simhash_near_pairs(docs, max_hamming=0)


def test_minhash_band_size_valueerror(spark):
    from res2df_spark.llm.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(docs, num_hashes=30, band_size=4).collect()


# ---------------------------------------------------------------------------
# Fifth round-5 review pass (module layer: compdat / rft / grid / resample)


_LUMP_DECK = """
DATES
 1 JAN 2020 /
/
WELSPECS
 'OP1' 'G' 1 1 1000 OIL /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP1' 1 2 1 1 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
 'OP1' 1 2 1 1 1 /
/
"""


def test_welopen_partial_coords_ignored_on_lump(spark):
    """Reference gates the I/J/K restriction on ALL THREE being set —
    a partially-defaulted coordinate set is ignored entirely."""
    from res2df_spark.modules import compdat

    deck = _LUMP_DECK + "WELOPEN\n 'OP1' 'SHUT' 1 2* 1 1 /\n/\n"
    out = compdat.df(spark, deck).collect()
    last = {(r["I"], r["J"]): r["OP_SH"] for r in out}
    # J/K defaulted -> coordinate filter ignored -> BOTH lump-1 conns shut
    assert last == {(1, 1): "SHUT", (1, 2): "SHUT"}


def test_welopen_lump_zero_and_negative_rejected(spark):
    from res2df_spark.modules import compdat

    for c1c2 in ("0 1", "-1 1"):
        deck = _LUMP_DECK + f"WELOPEN\n 'OP1' 'SHUT' 3* {c1c2} /\n/\n"
        with pytest.raises(ValueError, match="C1"):
            compdat.df(spark, deck)


def test_welopen_wlist_member_without_connections_raises(spark):
    """A WLIST member with zero connections must be reported even when
    a sibling member of the same expanded record matches."""
    from res2df_spark.modules import compdat

    deck = """
DATES
 1 JAN 2020 /
/
WELSPECS
 'OP1' 'G' 1 1 1000 OIL /
 'OP9' 'G' 2 2 1000 OIL /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WLIST
 '*OP' NEW OP1 OP9 /
/
WELOPEN
 '*OP' 'SHUT' /
/
"""
    with pytest.raises(ValueError, match="not acting"):
        compdat.df(spark, deck)


def test_icd_chain_latest_welsegs_wins(spark):
    """Re-specified WELSEGS under a later DATE must not fan out the
    connection rows — the latest declaration wins."""
    from res2df_spark.modules.compdat import icd_chain

    deck = """
DATES
 1 JAN 2020 /
/
WELSEGS
 'OP1' 2000 2000 1* ABS /
 2 2 1 1 2050 2000 0.15 /
/
COMPSEGS
 'OP1' /
 1 1 1 1 0 100 1* 1* 1* 1* 2 /
/
DATES
 1 FEB 2020 /
/
WELSEGS
 'OP1' 2000 2000 1* ABS /
 2 2 1 1 2060 2000 0.15 /
/
"""
    rows_ = icd_chain(spark, deck).collect()
    assert len(rows_) == 1
    assert rows_[0]["SEGMENT_MD"] == 2060.0  # latest geometry


def test_resample_invalid_freq_is_valueerror(spark):
    from res2df_spark.operators.resample import spine_from_observations

    obs = spark.createDataFrame([("2020-01-01",)], "d string").select(
        F_col("d").cast("date").alias("DATE")
    ) if False else spark.sql("SELECT DATE '2020-01-01' AS DATE")
    with pytest.raises(ValueError, match="quarterly"):
        spine_from_observations(obs, "DATE", freq="quarterly")


def test_pillar_stats_no_aggregatable_columns(spark):
    from res2df_spark.modules.grid import pillar_stats

    grid = spark.createDataFrame([(1, 1, 1)], "I int, J int, K int")
    with pytest.raises(ValueError, match="aggregatable"):
        pillar_stats(grid)


# ---------------------------------------------------------------------------
# Sixth round-5 review pass (wcon defaults, table naming, equil phases,
# faults/vfp/wellconnstatus edge behavior)


def test_wcon_defaults_fill_like_opm(spark):
    """Defaulted WCON* items carry the opm schema defaults the
    reference emits, not NULLs."""
    from res2df_spark.modules import wcon

    deck = """
START
  1 JAN 2020 /
WCONPROD
  'OP1' 1* 'ORAT' 100.0 /
/
WCONINJH
  'WI1' 'WATER' 'OPEN' 2500.0 /
/
"""
    out = {r["KEYWORD"]: r for r in wcon.df(spark, deck).collect()}
    prod = out["WCONPROD"]
    assert prod["STATUS"] == "OPEN" and prod["WRAT"] == 0.0
    assert prod["BHP"] == 1.01325 and prod["VFP_TABLE"] == 0
    inj = out["WCONINJH"]
    assert inj["CMODE"] == "RATE" and inj["VFP_TABLE"] == 0


def test_satfunc_pc_naming_matches_reference(spark):
    """Water-oil tables carry PCOW, gas-oil tables PCOG — separate
    columns like the reference RENAMERS, not one shared PC."""
    from res2df_spark.modules.tables import satfunc_df

    deck = """
SWOF
 0.1 0.0 1.0 3.0
 0.9 1.0 0.0 0.5 /
/
SGOF
 0.0 0.0 1.0 0.0
 1.0 1.0 0.0 1.5 /
/
"""
    out = satfunc_df(spark, deck)
    assert "PCOW" in out.columns and "PCOG" in out.columns
    assert "PC" not in out.columns
    swof = out.filter("KEYWORD = 'SWOF' AND ROW_IDX = 0").first()
    assert swof["PCOW"] == 3.0 and swof["PCOG"] is None


def test_pvtg_ogr_naming(spark):
    from res2df_spark.modules.tables import pvt_df

    deck = """
PVTG
 50.0 0.0001 0.024 0.0125
      0.0   0.023 0.0120 /
 100.0 0.0002 0.021 0.0135
       0.0   0.020 0.0130 /
/
"""
    out = pvt_df(spark, deck)
    assert "OGR" in out.columns and "RV" not in out.columns
    first = out.filter("PRESSURE = 50.0 AND ROW_IDX = 0").first()
    assert first["OGR"] == 0.0001


def test_equil_gas_water_phase_naming(spark):
    """A gas-water deck's EQUIL contact is GWC/PCGWC and the unused
    oil-pair slots are dropped (reference PHASE_RENAMERS)."""
    from res2df_spark.modules.tables import equil_df

    deck = """
WATER
GAS
EQUIL
 2000.0 200.0 2200.0 0.5 1* 1* /
/
"""
    out = equil_df(spark, deck)
    assert "GWC" in out.columns and "PCGWC" in out.columns
    assert "OWC" not in out.columns and "GOC" not in out.columns
    r = out.first()
    assert r["GWC"] == 2200.0 and r["PCGWC"] == 0.5


def test_faults_inverted_box_yields_zero_rows(spark):
    """Reference range() semantics: an inverted index box contributes
    no cells and extraction continues."""
    from res2df_spark.modules import faults

    deck = """
FAULTS
 'F1' 5 4 1 1 1 1 'X' /
 'F2' 1 2 1 1 1 1 'Y' /
/
"""
    got = faults.df(spark, deck).collect()
    assert {r["NAME"] for r in got} == {"F2"}
    assert len(got) == 2


def test_vfp_value_length_mismatch_raises(spark):
    from res2df_spark.modules.vfp import df_inj

    deck = """
VFPINJ
 1 2000.0 /
 100.0 200.0 /
 50.0 /
 1 10.0 20.0 30.0 /
"""
    with pytest.raises(ValueError, match="BHP values"):
        df_inj(spark, deck)


def test_wellconnstatus_rejects_malformed_cpi(spark):
    from res2df_spark.modules.wellconnstatus import from_summary

    long = spark.createDataFrame(
        [("CPI:OP1:1,1,1", "2020-01-01", 1.0),
         ("CPI:OP1", "2020-01-01", 1.0),          # no ijk part
         ("CPI:OP1:14,26", "2020-01-01", 1.0)],   # 2-tuple
        "VECTOR string, DATE string, VALUE double",
    ).withColumn("DATE", F_col("DATE").cast("date")) if False else (
        spark.sql("""
            SELECT * FROM VALUES
             ('CPI:OP1:1,1,1', DATE '2020-01-01', 1.0),
             ('CPI:OP1',       DATE '2020-01-01', 1.0),
             ('CPI:OP1:14,26', DATE '2020-01-01', 1.0)
            AS t(VECTOR, DATE, VALUE)
        """))
    got = from_summary(long).collect()
    assert all(r["I"] == 1 and r["J"] == 1 and r["K"] == 1 for r in got)


# ---------------------------------------------------------------------------
# Seventh round-5 review pass (writers / aux sources)


def test_fmt_value_nan_is_default_token(spark):
    from res2df_spark.sinks.writers import df_to_include

    df = spark.createDataFrame(
        [("OP1", float("nan"), 2.0)], "WELL string, KH double, SKIN double"
    )
    text = df_to_include(df, "COMPDAT")
    assert "nan" not in text
    assert "1*" in text


def test_empty_record_never_emitted(spark):
    """A fully-defaulted row renders '1* /', never a bare '/' (which
    would terminate the keyword and swallow later rows)."""
    from res2df_spark.sinks.writers import df_to_include

    df = spark.createDataFrame(
        [(None, None), ("OP2", 5.0)], "WELL string, KH double"
    )
    text = df_to_include(df, "TESTKW")
    recs = [ln.strip() for ln in text.splitlines() if ln.startswith("  ")]
    assert recs[0] == "1* /"
    assert recs[1].startswith("'OP2'")


def test_write_dataframe_mode_on_single_csv(spark, tmp_path):
    from res2df_spark.sinks.writers import write_dataframe

    p = str(tmp_path / "out.csv")
    df = spark.createDataFrame([(1,)], "a int")
    write_dataframe(df, p)
    with pytest.raises(FileExistsError):
        write_dataframe(df, p, mode="error")
    write_dataframe(df, p, mode="ignore")  # no-op, no raise
    with pytest.raises(ValueError, match="stdout"):
        write_dataframe(df, "-", fmt="parquet")


def test_df2res_equil_gas_water_roundtrip(spark):
    """A phase-renamed (GWC/PCGWC) equil frame writes its contact into
    the correct EQUIL slots and round-trips."""
    from res2df_spark.modules.tables import equil_df
    from res2df_spark.sinks.df2res import df2res_equil

    deck = """
WATER
GAS
EQUIL
 2000.0 200.0 2200.0 0.5 /
/
"""
    out = equil_df(spark, deck)
    text = df2res_equil(out)
    again = equil_df(spark, "WATER\nGAS\n" + text)
    a, b = out.first(), again.first()
    assert b["GWC"] == a["GWC"] == 2200.0
    assert b["PCGWC"] == a["PCGWC"] == 0.5


def test_df2res_vfpprod_rejects_incomplete_frame(spark):
    from res2df_spark.sinks.df2res import df2res_vfpprod

    # 2 THP values but only one (THP,...) combo present
    df = spark.createDataFrame(
        [(1, 100.0, 10.0, 0.0, 0.0, 0.0, 1.0, 50.0),
         (1, 100.0, 10.0, 0.0, 0.0, 0.0, 2.0, 60.0),
         (1, 100.0, 20.0, 0.0, 0.0, 0.0, 1.0, 55.0)],
        "TABLE int, DATUM double, THP double, WFR double, GFR double, "
        "ALQ double, RATE double, BHP double",
    )
    with pytest.raises(ValueError, match="axis combinations|flow axis"):
        df2res_vfpprod(df)


def test_parameterstxt_nan_token_stays_string():
    from res2df_spark.sources.aux import _parse_parameterstxt

    got = _parse_parameterstxt("A 1.5\nB NaN\n")
    assert got["B"] == "NaN" and got["A"] == "1.5"
    got2 = _parse_parameterstxt("A 1.5\nB 2.5\n")
    assert got2["A"] == 1.5 and got2["B"] == 2.5


# ---------------------------------------------------------------------------
# Eighth round-5 review pass (multimodal / profile / sessionize / spread)


def test_export_tar_shards_skips_null_ids(spark, tmp_path):
    from res2df_spark.llm.multimodal import export_tar_shards

    df = spark.createDataFrame(
        [(1, b"abc"), (None, b"xyz"), (2, b"def")],
        "doc_id long, payload binary",
    )
    manifest = export_tar_shards(df, str(tmp_path / "shards"), n_shards=2)
    assert sum(r["n_samples"] for r in manifest.collect()) == 2


def test_export_tar_shards_numeric_meta_stays_numeric(spark, tmp_path):
    import glob
    import json as _json
    import tarfile

    from res2df_spark.llm.multimodal import export_tar_shards

    df = spark.createDataFrame(
        [(1, b"abc", 512)], "doc_id long, payload binary, n_tokens long"
    )
    export_tar_shards(
        df, str(tmp_path / "s"), n_shards=1, meta_cols=("n_tokens",)
    ).collect()
    tar = glob.glob(str(tmp_path / "s" / "*.tar"))[0]
    with tarfile.open(tar) as t:
        meta = _json.load(t.extractfile("1.json"))
    assert meta["n_tokens"] == 512  # int, not "512"


def test_extract_features_decoder_arity_checked(spark):
    from res2df_spark.llm.multimodal import extract_features

    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    with pytest.raises(Exception, match="n_features=2"):
        extract_features(df, decoder=lambda b: (1.0,)).collect()


def test_sample_frames_validates_args(spark):
    from res2df_spark.llm.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(df, every_n=0)
    with pytest.raises(ValueError, match="frame_size"):
        sample_frames(df, frame_size=0)


def test_profile_table_dotted_column(spark):
    from res2df_spark.operators.profile import profile_table

    df = spark.range(3).selectExpr("id AS `a.b`")
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["a.b"]["n_rows"] == 3 and got["a.b"]["n_distinct"] == 3


def test_session_stats_drops_null_ts_phantom_session(spark):
    from res2df_spark.operators.sessionize import session_stats

    df = spark.sql("""
        SELECT * FROM VALUES
         ('u1', TIMESTAMP '2020-01-01 00:00:00', 1.0),
         ('u1', CAST(NULL AS TIMESTAMP), 2.0)
        AS t(user_id, ts, v)
    """)
    got = session_stats(df, "ts", ["user_id"], 60, value_col="v").collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 1 and got[0]["total_value"] == 1.0


# ---------------------------------------------------------------------------
# Ninth round-5 review pass (anomaly NaN, pagerank edge hygiene)


def test_value_anomalies_nan_value_does_not_flood(spark):
    """One NaN reading must not flag the key's entire history (NaN
    variance passes `> 0` in Spark's total order)."""
    from res2df_spark.operators.eventanalytics import value_anomalies

    rows_ = [(i, "u1", 10.0) for i in range(9)] + [(99, "u1", float("nan"))]
    df = spark.createDataFrame(rows_, "event_id long, user_id string, value double")
    assert value_anomalies(df).count() == 0
    # and a genuine outlier still flags
    rows_ = [(i, "u1", 10.0 + (i % 3) * 0.1) for i in range(9)] + [(99, "u1", 1000.0)]
    df = spark.createDataFrame(rows_, "event_id long, user_id string, value double")
    got = value_anomalies(df).collect()
    assert [r["event_id"] for r in got] == [99]


def test_pagerank_nan_weight_and_null_endpoint(spark):
    from res2df_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", float("nan")), ("b", "c", 1.0), (None, "b", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["node"]: r["rank"] for r in
           pagerank(edges, weight_col="w", iterations=3).collect()}
    assert None not in got
    assert all(v == v for v in got.values())  # no NaN ranks
