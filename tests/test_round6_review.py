"""Regression tests for the round-6 code-review findings (all verified
live before fixing): NULL-key sessionize_chunked, comment-after-slash
INCLUDE boundary, histogram infinities + half-specified bounds,
checkpoint-dir uuid churn, NULL-ts rolling parity, string-id feature
extraction."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def test_sessionize_chunked_keeps_null_key_rows(spark):
    from res2df_spark.operators.sessionize import sessionize, sessionize_chunked

    rows = [
        (0, None, datetime(2024, 1, 1, 0, 0), 1.0),
        (1, None, datetime(2024, 1, 1, 3, 0), 1.0),
        (2, 7, datetime(2024, 1, 1, 0, 0), 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    plain = sorted(
        (r["event_id"], r["session_id"])
        for r in sessionize(ev, "ts", ["user_id"], 3600, tiebreak=["event_id"]).collect()
    )
    chunked = sorted(
        (r["event_id"], r["session_id"])
        for r in sessionize_chunked(
            ev, "ts", ["user_id"], 3600, chunk_seconds=7200, tiebreak=["event_id"]
        ).collect()
    )
    assert chunked == plain
    assert len(chunked) == 3  # NULL-key rows present
    # NULL keys form their own partition: two sessions 3h apart
    assert dict(chunked)[0] == 1 and dict(chunked)[1] == 2


def test_include_after_slash_comment_still_splices(tmp_path):
    """'0 1 / output control' closes the record — the trailing text is
    Eclipse comment, so a following INCLUDE is a directive."""
    from res2df_spark.sources.deck import read_deck

    inc = tmp_path / "grid.inc"
    inc.write_text("WATER\n")
    deck = tmp_path / "T.DATA"
    deck.write_text(
        "GRIDFILE\n 0 1 / output control\nINCLUDE\n 'grid.inc' /\n"
    )
    text = read_deck(str(deck))
    assert "WATER" in text and "INCLUDE" not in text


def test_histogram_excludes_infinities(spark):
    from res2df_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("inf"),), (float("-inf"),), (5.0,)], "x double"
    )
    rows = {r["bin"]: r for r in value_histogram(df, "x", n_bins=4).collect()}
    assert sum(r["n"] for r in rows.values()) == 3  # infinities excluded
    assert rows[0]["bin_lo"] == 1.0  # bounds derived from FINITE values
    assert max(r["bin_hi"] for r in rows.values()) == 5.0


def test_histogram_half_specified_bounds_honoured(spark):
    from res2df_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(1.0,), (2.0,), (5.0,)], "x double")
    rows = sorted(
        value_histogram(df, "x", n_bins=5, lo=0.0).collect(),
        key=lambda r: r["bin"],
    )
    # explicit lo anchors at 0.0, hi derived from data (5.0): width 1.0
    # — value 1.0 lands in bin 1 = [1,2) (with data-derived lo=1 it
    # would land in bin 0), and empty bin 0 emits no row
    assert rows[0]["bin"] == 1 and rows[0]["bin_lo"] == 1.0
    assert rows[-1]["bin_hi"] == 5.0
    # explicit hi=9 with derived lo=1: width (9-1)/4 = 2, so value 5
    # lands in bin 2 = [5,7) — with data-derived hi=5 the width would
    # be 1 and 5 would land in the last bin
    rows_hi = {r["bin"]: r for r in value_histogram(df, "x", n_bins=4, hi=9.0).collect()}
    assert rows_hi[2]["bin_lo"] == 5.0 and rows_hi[2]["bin_hi"] == 7.0


def test_checkpoint_dir_not_repointed_per_call(spark, tmp_path):
    """getCheckpointDir returns <dir>/<uuid>; the sync check must
    compare the parent, or every truncation mkdirs a fresh uuid dir."""
    import os

    from res2df_spark.session import CHECKPOINT_DIR_CONF, truncate_lineage

    ckdir = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckdir)
    try:
        df = spark.range(3)
        truncate_lineage(df)
        first = spark.sparkContext.getCheckpointDir()
        truncate_lineage(df)
        truncate_lineage(df)
        assert spark.sparkContext.getCheckpointDir() == first
        # exactly one uuid subdirectory was created
        assert len(os.listdir(ckdir)) == 1
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_rolling_chunked_null_ts_matches_plain(spark):
    from res2df_spark.operators.eventanalytics import rolling_agg, rolling_agg_chunked

    rows = [
        (0, 1, datetime(2024, 1, 1, 0, 0), 10.0),
        (1, 1, None, 3.0),
        (2, 1, None, 4.0),
        (3, 2, None, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    cols = ["event_id", "n_window", "sum_window"]
    plain = sorted(
        tuple(r) for r in rolling_agg(ev, "ts", ["user_id"], "value", 3600)
        .select(*cols).collect()
    )
    chunked = sorted(
        tuple(r)
        for r in rolling_agg_chunked(
            ev, "ts", ["user_id"], "value", 3600, chunk_seconds=7200
        ).select(*cols).collect()
    )
    assert chunked == plain
    # and the NULL peer group is per key: user 1's null rows see n=2
    got = {r[0]: r for r in chunked}
    assert got[1][1] == 2 and got[1][2] == 7.0
    assert got[3][1] == 1 and got[3][2] == 7.0


def test_extract_features_string_ids(spark):
    from res2df_spark.llm.multimodal import extract_features, feature_schema
    from pyspark.sql.types import StringType

    df = spark.createDataFrame(
        [("doc-a", bytearray(b"xy")), ("doc-b", None)],
        "doc_id string, payload binary",
    )
    out = extract_features(df)
    assert out.schema == feature_schema(StringType())
    got = {r.doc_id: r for r in out.collect()}
    assert got["doc-a"].n_bytes == 2
    assert got["doc-b"].features is None


def test_pair_key_null_endpoint_yields_null(spark):
    from res2df_spark.functions.strings import pair_key

    df = spark.createDataFrame(
        [(5, None), (None, None), (5, 5), (7, 3)], "a int, b int"
    )
    got = [r[0] for r in df.select(pair_key("a", "b")).collect()]
    # (5, NULL) must NOT collapse into the genuine '5-5' group
    assert got == [None, None, "5-5", "3-7"]


def test_funnel_stream_skips_null_ts(spark, tmp_path):
    from datetime import datetime as dt

    from res2df_spark.streaming.ops import funnel_stream, run_available_now

    rows = [
        ("u1", None, "view"),            # NaT must not record step 1
        ("u1", dt(2024, 1, 1, 1), "view"),
        ("u1", dt(2024, 1, 1, 2), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    src = spark.readStream.schema(ev.schema).parquet(path)
    out = run_available_now(
        funnel_stream(src, "ts", "user_id", "event_type", ["view", "click"]),
        name="t_funnel_nat",
        output_mode="append",
    ).collect()
    got = {(r["step"]): r["ts"] for r in out}
    assert got == {1: dt(2024, 1, 1, 1), 2: dt(2024, 1, 1, 2)}
    assert all(r["ts"] is not None for r in out)


def test_status_change_stream_null_ts_orders_first(spark, tmp_path):
    from datetime import datetime as dt

    from res2df_spark.operators.windows import status_changes
    from res2df_spark.streaming.ops import run_available_now, status_change_stream

    rows = [
        ("w1", dt(2024, 1, 1, 1), "SHUT"),
        ("w1", None, "OPEN"),  # NULL ts: batch lag orders it FIRST
    ]
    ev = spark.createDataFrame(rows, "well string, ts timestamp, st string")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    static = spark.read.parquet(path)
    batch = sorted(
        ((r["well"], r["ts"], r["st"]) for r in
         status_changes(static, "st", order_by=["ts"],
                        partition_by=["well"]).collect()),
        key=str,
    )
    src = spark.readStream.schema(static.schema).parquet(path)
    stream = sorted(
        ((r["well"], r["ts"], r["new_status"]) for r in run_available_now(
            status_change_stream(src, ["well"], "st", "ts"),
            name="t_status_nat",
            output_mode="append",
        ).collect()),
        key=str,
    )
    assert stream == batch


def test_status_change_stream_int_state_col(spark, tmp_path):
    from datetime import datetime as dt

    from res2df_spark.streaming.ops import run_available_now, status_change_stream

    rows = [("w1", dt(2024, 1, 1, 1), 1), ("w1", dt(2024, 1, 1, 2), 2)]
    ev = spark.createDataFrame(rows, "well string, ts timestamp, code int")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    src = spark.readStream.schema(ev.schema).parquet(path)
    out = run_available_now(
        status_change_stream(src, ["well"], "code", "ts"),
        name="t_status_int",
        output_mode="append",
    ).collect()
    assert [(r["new_status"]) for r in sorted(out, key=lambda r: r["ts"])] == ["1", "2"]


def test_realization_tag_component_anchored(spark, tmp_path):
    """'montreal-2' must not hijack the realization tag and
    'Realization-5' (capitalized) must match."""
    import re

    def tag(local):
        real = None
        for part in local.replace("\\", "/").split("/"):
            pm = re.fullmatch(r"real(?:ization)?[-_]?(\d+)", part, re.IGNORECASE)
            if pm:
                real = pm.group(1)
        return real

    assert tag("/data/montreal-2/realization-7/CASE.UNSMRY") == "7"
    assert tag("/ens/Realization-5/CASE.UNSMRY") == "5"
    assert tag("/ens/real-3/CASE.UNSMRY") == "3"
    assert tag("/plain/CASE.UNSMRY") is None


def test_asof_null_right_time_excluded(spark):
    """A NULL observation time must not become a phantom match for
    early left rows (merge_asof raises on NaT; we exclude)."""
    from datetime import datetime as dt

    from res2df_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", dt(2024, 1, 1)), ("k", dt(2024, 1, 5))], "k string, lt timestamp"
    )
    right = spark.createDataFrame(
        [("k", None, 99.0), ("k", dt(2024, 1, 3), 1.0)],
        "k string, rt timestamp, v double",
    )
    got = {
        r["lt"]: r["v"]
        for r in asof_join(left, right, on=["k"], left_time="lt",
                           right_time="rt").collect()
    }
    assert got[dt(2024, 1, 1)] is None  # no phantom 99.0
    assert got[dt(2024, 1, 5)] == 1.0


def test_write_summary_all_digit_well_roundtrips(tmp_path):
    """A well literally named '12' must round-trip as a WGNAME, not be
    eaten as a NUMS payload."""
    import pandas as pd

    from res2df_spark.sources.eclbin import summary_long_pandas, write_summary

    wide = pd.DataFrame(
        {"WOPR:12": [1.0, 2.0], "RPR:3": [7.0, 8.0]},
        index=pd.to_datetime(["2020-01-01", "2020-02-01"]),
    )
    p = tmp_path / "T.SMSPEC"
    write_summary(str(p), wide.index[0].to_pydatetime(), wide)
    with open(p, "rb") as f:
        sbuf = f.read()
    with open(tmp_path / "T.UNSMRY", "rb") as f:
        ubuf = f.read()
    out = summary_long_pandas(sbuf, ubuf)
    vecs = set(out["VECTOR"])
    assert "WOPR:12" in vecs      # well name survived
    assert "RPR:3" in vecs        # region NUMS still works


def test_unrst_rstdates_list(tmp_path):
    """case.grid(rstdates=[...]) reaches unrst_vectors_pandas as a list
    and selects all matching steps."""
    import io

    from res2df_spark.sources.eclbin import unrst_vectors_pandas, write_keyword

    buf = io.BytesIO()
    for seq, (d, m, y) in enumerate([(1, 1, 2020), (1, 2, 2020), (1, 3, 2020)]):
        write_keyword(buf, "SEQNUM", "INTE", [seq])
        ih = [0] * 67
        ih[64], ih[65], ih[66] = d, m, y
        write_keyword(buf, "INTEHEAD", "INTE", ih)
        write_keyword(buf, "PRESSURE", "REAL", [float(seq), float(seq)])
    raw = buf.getvalue()
    out = unrst_vectors_pandas(raw, 2, dates=["2020-01-01", "2020-03-01"])
    assert sorted(out["DATE"].dt.month.unique()) == [1, 3]
    one = unrst_vectors_pandas(raw, 2, dates="2020-02-01")
    assert list(one["DATE"].dt.month.unique()) == [2]


def test_melt_validates_output_names(spark):
    from res2df_spark.operators.reshape import melt

    df = spark.createDataFrame([(1, 2.0)], "id int, a double")
    with pytest.raises(ValueError, match="output names"):
        melt(df, ["id"], ["a"], var_name="x`y")
    with pytest.raises(ValueError, match="value_type"):
        melt(df, ["id"], ["a"], value_type="double) as x --")


def test_wlist_reference_parity_sorted_and_literal_add(spark):
    """Reference expand_wlist semantics: every list stays alphabetically
    sorted; ADD resolves only the INCOMING wells, so a literal '*X'
    token stored by MOV stays literal."""
    from res2df_spark.modules.wlist import _apply_action

    st = {}
    _apply_action(st, {"NAME": "*A", "ACTION": "NEW", "WELLS": ["OP2", "OP1"]})
    assert st["*A"] == ["OP1", "OP2"]  # sorted like the reference
    # MOV stores the literal token '*A' (reference resolves only ADD/NEW)
    _apply_action(st, {"NAME": "*B", "ACTION": "MOV", "WELLS": ["*A", "OP9"]})
    assert st["*B"] == ["*A", "OP9"]
    # ADD must NOT re-resolve the stored '*A'
    _apply_action(st, {"NAME": "*B", "ACTION": "ADD", "WELLS": ["OP3"]})
    assert st["*B"] == ["*A", "OP3", "OP9"]
    # and incoming recursion still expands
    _apply_action(st, {"NAME": "*C", "ACTION": "NEW", "WELLS": ["*A"]})
    assert st["*C"] == ["OP1", "OP2"]


def test_fipreports_date_lines_anchored(spark, tmp_path):
    """An echoed-deck line merely CONTAINING the date text must not
    forward-fill a bogus report date (reference uses re.match)."""
    from res2df_spark.modules import fipreports

    prt = tmp_path / "CASE.PRT"
    prt.write_text(
        "--echo  REPORT   1     1 JAN 1990 from the input deck\n"
        "  REPORT   0     1 JAN 2000\n"
        " FIPNUM  REPORT REGION    1\n"
        " ============================\n"  # 28 '=' closes the block
        " :CURRENTLY IN PLACE : 1.0 2.0 3.0 : 4.0 : 5.0 6.0 7.0 :\n"
        " FIPNUM  REPORT REGION    2\n"
        " :CURRENTLY IN PLACE : 1.0 2.0 3.0 : 4.0 : 5.0 6.0 7.0 :\n"
    )
    rows = fipreports.df(spark, str(prt)).collect()
    # the row after the terminator but before region 2's header is
    # dropped; region 2's row keeps the REAL date, not 1990
    assert len(rows) == 1
    assert rows[0]["REGION"] == 2
    assert str(rows[0]["DATE"]) == "2000-01-01"


def test_fipreports_short_separator_keeps_block(spark, tmp_path):
    """A narrower '=' rule (under 28) inside a region block must NOT
    close it (reference requires the full 28-char terminator)."""
    from res2df_spark.modules import fipreports

    prt = tmp_path / "CASE.PRT"
    prt.write_text(
        "  REPORT   0     1 JAN 2000\n"
        " FIPNUM  REPORT REGION    3\n"
        " =============\n"  # only 13 '=': a table rule, not a terminator
        " :CURRENTLY IN PLACE : 1.0 2.0 3.0 : 4.0 : 5.0 6.0 7.0 :\n"
    )
    rows = fipreports.df(spark, str(prt)).collect()
    assert len(rows) == 1 and rows[0]["REGION"] == 3


def test_load_parameters_content_sniffs(tmp_path):
    """A bare 'parameters' file holding JSON parses as JSON (reference
    load() sniffs yaml->json->txt), and a YAML mapping in
    parameters.txt parses as YAML — never junk txt pairs."""
    from res2df_spark.sources.aux import load_parameters

    (tmp_path / "parameters").write_text('{"RMS_SEED": 42, "CASE": "a"}')
    got = load_parameters(str(tmp_path), search_parents=0)
    assert got == {"RMS_SEED": 42, "CASE": "a"}
    (tmp_path / "parameters").unlink()
    (tmp_path / "parameters.txt").write_text("A: 1\nB: two\n")
    got = load_parameters(str(tmp_path), search_parents=0)
    assert got == {"A": 1, "B": "two"}


def test_parameterstxt_strict_numeric_forms():
    from res2df_spark.sources.aux import _parse_parameterstxt

    # python-only literals stay strings (pandas would not infer them)
    assert _parse_parameterstxt("A -nan\nB 1\n") == {"A": "-nan", "B": "1"}
    assert _parse_parameterstxt("A +infinity\n") == {"A": "+infinity"}
    assert _parse_parameterstxt("A 1_000\n") == {"A": "1_000"}
    # normal numerics still infer
    assert _parse_parameterstxt("A 1\nB -2\n") == {"A": 1, "B": -2}
    assert _parse_parameterstxt("A 1.5\nB 2e3\n") == {"A": 1.5, "B": 2000.0}


def test_quantize_nonfinite_codes_null_not_abort(spark):
    from res2df_spark.llm.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0]), (2, [0.0, float("nan"), 2.0]),
         (3, [0.0, float("inf"), 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["codes"] == [0, 128, 255]           # clean vector unchanged
    assert got[2]["codes"][1] is None                  # NaN element -> NULL code
    assert all(c is None for c in got[3]["codes"])     # inf poisons min/max span


def test_topk_operators_exclude_null_vectors(spark):
    from res2df_spark.llm.similarity import brute_force_topk, lsh_bucketed_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, None)], "vec_id long, embedding array<double>"
    )
    bf = brute_force_topk(corpus, queries, k=5)
    assert {r["q_id"] for r in bf.collect()} == {10}       # NULL query gone
    assert {r["vec_id"] for r in bf.collect()} == {1, 2}    # NULL corpus row gone
    lsh = lsh_bucketed_topk(corpus, queries, k=5, n_planes=2)
    assert 11 not in {r["q_id"] for r in lsh.collect()}
    assert 3 not in {r["vec_id"] for r in lsh.collect()}


def test_pq_encode_skips_short_and_null_vectors(spark):
    from res2df_spark.llm.similarity import pq_encode

    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]  # m=2, dsub=2
    df = spark.createDataFrame(
        [(1, [1.0, 1.0, 0.0, 0.0]), (2, [1.0, 1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = pq_encode(df, books).collect()   # must not ANSI-abort
    assert {r["vec_id"] for r in got} == {1}
    assert got[0]["codes"] == [1, 0]


def test_semantic_novelty_null_embedding_gets_verdict_row(spark):
    from res2df_spark.llm.similarity import semantic_novelty

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "centroid_id int, centroid array<double>",
    )
    index = spark.createDataFrame(
        [(100, 0, [0.1, 0.1])],
        "vec_id long, centroid_id int, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(200, [0.1, 0.1]), (201, None)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r for r in semantic_novelty(new, index, cents).collect()}
    assert set(got) == {200, 201}            # NULL-embedding row not dropped
    assert got[201]["is_novel"] is None and got[201]["match_id"] is None
    assert got[200]["is_novel"] is False and got[200]["match_id"] == 100


def test_cluster_mean_empty_vector_counts_and_nulls(spark):
    from res2df_spark.llm.similarity import cluster_mean, mean_pool

    df = spark.createDataFrame(
        [(0, []), (0, [3.0, 5.0])], "centroid_id int, embedding array<double>"
    )
    cm = cluster_mean(df).collect()[0]
    mp = mean_pool(df, group_col="centroid_id", vec_col="embedding").collect()[0]
    assert cm["n_vecs"] == 2 == mp["n_vecs"]   # empty vector still counts
    assert cm["pooled"] == [None, None] == mp["pooled"]
