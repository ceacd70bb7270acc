"""Round-6 ADVICE fixes: INCLUDE record-boundary matching, parameters
bool inference, cluster_mean ragged-vector contract, compdat CLI
reference shape + csv2res round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# read_deck: INCLUDE as record data must pass through


def test_include_token_inside_open_record_passes_through(tmp_path):
    """A line starting with INCLUDE inside an unregistered keyword's
    multi-line record is DATA, not a directive (ADVICE r5: it used to
    raise FileNotFoundError)."""
    from res2df_spark.sources.deck import read_deck

    deck = tmp_path / "T.DATA"
    deck.write_text(
        "SOMEKW\n"
        "  1 2 3\n"
        "  INCLUDE 4 5\n"   # continuation of the open record
        "  6 /\n"
        "/\n"
    )
    text = read_deck(str(deck))
    assert "INCLUDE 4 5" in text


def test_include_after_terminator_and_flags_still_splices(tmp_path):
    from res2df_spark.sources.deck import read_deck

    inc = tmp_path / "part.inc"
    inc.write_text("WATER\n")
    deck = tmp_path / "T.DATA"
    deck.write_text(
        "RUNSPEC\n"
        "OIL\n"                      # flag keyword keeps the boundary
        "DIMENS\n  5 5 1 /\n"        # '/' restores the boundary
        "INCLUDE\n  'part.inc' /\n"  # genuine directive
        "SCHEDULE\n"
    )
    text = read_deck(str(deck))
    assert "WATER" in text and "INCLUDE" not in text


def test_include_missing_file_still_raises_loudly(tmp_path):
    from res2df_spark.sources.deck import read_deck

    deck = tmp_path / "T.DATA"
    deck.write_text("INCLUDE\n  'nope.inc' /\n")
    with pytest.raises(FileNotFoundError):
        read_deck(str(deck))


# ---------------------------------------------------------------------------
# parameters.txt bool inference (pandas token set)


def test_parameterstxt_bool_tokens_case_variants():
    from res2df_spark.sources.aux import _parse_parameterstxt

    assert _parse_parameterstxt("A TRUE\nB FALSE\n") == {"A": True, "B": False}
    assert _parse_parameterstxt("A true\nB false\n") == {"A": True, "B": False}
    assert _parse_parameterstxt("A True\nB FALSE\n") == {"A": True, "B": False}
    # non-pandas spellings stay strings
    assert _parse_parameterstxt("A tRuE\nB FALSE\n") == {"A": "tRuE", "B": "FALSE"}
    # mixed bool/other stays strings
    assert _parse_parameterstxt("A TRUE\nB x\n") == {"A": "TRUE", "B": "x"}


# ---------------------------------------------------------------------------
# cluster_mean on ragged vectors matches mean_pool's NULL contract


def test_cluster_mean_ragged_dims_nulled(spark):
    from res2df_spark.llm.similarity import cluster_mean, mean_pool

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (0, [3.0, 4.0]),        # short vector: dim 2 missing
            (1, [5.0, 6.0]),
        ],
        "centroid_id int, embedding array<double>",
    )
    cm = {
        r["centroid_id"]: (r["pooled"], r["n_vecs"])
        for r in cluster_mean(df).collect()
    }
    mp = {
        r["centroid_id"]: (r["pooled"], r["n_vecs"])
        for r in mean_pool(df, group_col="centroid_id", vec_col="embedding").collect()
    }
    assert cm[0][0] == [2.0, 3.0, None] == mp[0][0]
    assert cm[0][1] == 2 == mp[0][1]
    assert cm[1][0] == [5.0, 6.0]
    # NULL elements still poison only their dimension
    df2 = spark.createDataFrame(
        [(0, [1.0, None]), (0, [3.0, 4.0])],
        "centroid_id int, embedding array<double>",
    )
    got = cluster_mean(df2).collect()[0]
    assert got["pooled"] == [2.0, None]


# ---------------------------------------------------------------------------
# compdat CLI reference shape + csv2res round-trip


def test_cli_compdat_csv2res_roundtrip(spark, tmp_path, capsys):
    from res2df_spark import cli

    deck = tmp_path / "T.DATA"
    deck.write_text(
        "DATES\n 1 JAN 2020 /\n/\n"
        "COMPDAT\n  'OP1' 3 4 1 2 'OPEN' /\n/\n"
    )
    csv_path = tmp_path / "c.csv"
    assert cli.main(["compdat", str(deck), "-o", str(csv_path)]) == 0
    header = csv_path.read_text().splitlines()[0]
    assert "K1" in header and "OP/SH" in header and "OP_SH" not in header

    # csv2res must consume its own res2csv output (reference shape)
    out_inc = tmp_path / "c.inc"
    assert cli.csv2res_main(
        ["compdat", str(csv_path), "-o", str(out_inc)]
    ) == 0
    text = out_inc.read_text()
    assert text.splitlines()[0] == "COMPDAT"
    assert "'OP1' 3 4 1 1 'OPEN'" in text
    assert "'OP1' 3 4 2 2 'OPEN'" in text


def test_df2res_compdat_accepts_both_shapes(spark):
    from res2df_spark.sinks.df2res import df2res_compdat

    internal = spark.createDataFrame(
        [("OP1", 1, 2, 3, "OPEN")], "WELL string, I int, J int, K int, OP_SH string"
    )
    ref = spark.createDataFrame(
        [("OP1", 1, 2, 3, 3, "OPEN")],
        "WELL string, I int, J int, K1 int, K2 int, `OP/SH` string",
    )
    a = df2res_compdat(internal)
    b = df2res_compdat(ref)
    assert a == b
    assert "'OP1' 1 2 3 3 'OPEN'" in a


# ---------------------------------------------------------------------------
# value_histogram (round-6 threshold-calibration surface)


def test_value_histogram_counts_and_edges(spark):
    from res2df_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 5, 5, 10]] + [(None,), (float("nan"),)],
        "x double",
    )
    rows = {r["bin"]: r for r in value_histogram(df, "x", n_bins=5).collect()}
    # lo=0, hi=10, width=2: bins [0,2) [2,4) [4,6) [6,8) [8,10]
    assert sum(r["n"] for r in rows.values()) == 9  # NULL/NaN excluded
    assert rows[0]["n"] == 2 and rows[1]["n"] == 2 and rows[2]["n"] == 4
    assert 3 not in rows  # empty bin emits no row
    assert rows[4]["n"] == 1  # hi value lands in the LAST bin
    assert rows[0]["bin_lo"] == 0.0 and rows[0]["bin_hi"] == 2.0
    assert rows[4]["bin_hi"] == 10.0


def test_value_histogram_explicit_bounds_clamp(spark):
    from res2df_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.0,)], "x double"
    )
    rows = {r["bin"]: r["n"] for r in value_histogram(df, "x", 2, lo=0.0, hi=1.0).collect()}
    # out-of-range values clamp into edge bins, never dropped: -5 → bin
    # 0, 99 → bin 1; 0.5 sits ON the bin-1 boundary (half-open bins)
    assert rows == {0: 1, 1: 2}


def test_value_histogram_degenerate_and_validation(spark):
    import pytest as _pytest

    from res2df_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = value_histogram(df, "x", 4).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 2
    with _pytest.raises(ValueError, match="n_bins"):
        value_histogram(df, "x", 0)
    with _pytest.raises(ValueError, match="hi"):
        value_histogram(df, "x", 4, lo=1.0, hi=0.0)


def test_curate_cli_histogram(spark, tmp_path):
    from res2df_spark.cli import curate_main

    src = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "event_id long, value double"
    ).write.parquet(src)
    out = str(tmp_path / "hist.parquet")
    assert curate_main(
        ["histogram", src, "-o", out, "--value-col", "value", "--n-bins", "5"]
    ) == 0
    rows = {r["bin"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert sum(rows.values()) == 100
    # validation: missing column exits loudly
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="value-col"):
        curate_main(["histogram", src, "-o", out, "--value-col", "nope"])


def test_rrf_fuse_hand_computed(spark):
    from res2df_spark.llm.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "q_id int, vec_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 13, 3)], "q_id int, vec_id int, rank int"
    )
    got = {r["vec_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 10: 1/61 + 1/62; doc 11: 1/62 + 1/61 (tie); 12: 1/63; 13: 1/63
    assert got[10]["rrf_score"] == got[11]["rrf_score"] == round(1/61 + 1/62, 6)
    assert got[10]["n_systems"] == 2
    assert got[12]["rrf_score"] == got[13]["rrf_score"] == round(1/63, 6)
    assert got[12]["n_systems"] == 1  # absent from system A contributes nothing
    # tie-break by doc id: 10 before 11, 12 before 13
    assert got[10]["fused_rank"] == 1 and got[11]["fused_rank"] == 2
    assert got[12]["fused_rank"] == 3 and got[13]["fused_rank"] == 4
    # topk cut
    assert rrf_fuse([a, b], k=60, topk=2).count() == 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="k must"):
        rrf_fuse([a], k=0)
