"""Regression tests for the round-5 binary-layer review findings:
positional-slot preservation in the table writers, digit-leading well
names in the summary writer, NaN-axis guards in the VFP writers, the
header-only ``iter_keywords(want=...)`` scan, multi-file block-context
isolation, realization-id path matching, and the NTZ boundary margin in
``to_pandas_datesafe``."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from res2df_spark.sources import eclbin


def test_write_summary_digit_leading_well_name(tmp_path):
    """'WOPR:1AH' — a digit-LEADING (but not all-digit) well name must
    round-trip as the WGNAME, not degrade to the dummy ':+:+:+:+'."""
    start = datetime.datetime(2020, 1, 1)
    idx = pd.to_datetime(["2020-01-01", "2020-02-01"])
    wide = pd.DataFrame(
        {"WOPR:1AH": [1.0, 2.0], "RPR:3": [7.0, 8.0], "BPR:1,1,1": [5.0, 6.0]},
        index=idx,
    )
    smspec = str(tmp_path / "CASE.SMSPEC")
    eclbin.write_summary(smspec, start, wide)
    with open(smspec, "rb") as f:
        sbuf = f.read()
    with open(str(tmp_path / "CASE.UNSMRY"), "rb") as f:
        ubuf = f.read()
    long = eclbin.summary_long_pandas(sbuf, ubuf)
    piv = long.pivot(index="DATE", columns="VECTOR", values="VALUE")
    assert sorted(piv.columns) == sorted(wide.columns)
    np.testing.assert_allclose(
        piv["WOPR:1AH"].to_numpy(), wide["WOPR:1AH"].to_numpy(), rtol=1e-6
    )


def test_iter_keywords_want_filter():
    """want= decodes only the requested keywords; the skipped blocks'
    records are walked but never yielded."""
    import io

    out = io.BytesIO()
    eclbin.write_keyword(out, "GRIDHEAD", "INTE", [1, 2, 3, 4])
    eclbin.write_keyword(out, "ZCORN", "REAL", list(np.arange(2500.0)))
    eclbin.write_keyword(out, "ACTNUM", "INTE", [1, 0, 1])
    buf = out.getvalue()
    got = list(eclbin.iter_keywords(buf, want={"GRIDHEAD", "ACTNUM"}))
    assert [k for k, _t, _v in got] == ["GRIDHEAD", "ACTNUM"]
    assert got[1][2].tolist() == [1, 0, 1]
    # unfiltered scan still sees everything, including the skipped block
    assert [k for k, _t, _v in eclbin.iter_keywords(buf)] == [
        "GRIDHEAD", "ZCORN", "ACTNUM",
    ]


def test_realization_id_needs_segment_boundary(tmp_path):
    """'montreal-7' must NOT parse as realization 7 — the run falls back
    to the file stem; a true 'realization-3' path still matches."""
    import io
    import re

    # exercise the regex exactly as summary_long_many applies it
    pat = r"(?:^|[^A-Za-z0-9])real(?:ization)?[-_]?(\d+)"
    assert re.search(pat, "/data/montreal-5/CASE.SMSPEC") is None
    assert re.search(pat, "/e/boreal3/CASE.SMSPEC") is None
    m = re.search(pat, "/scratch/realization-3/iter-0/CASE.SMSPEC")
    assert m and m.group(1) == "3"
    m = re.search(pat, "/scratch/real-12/CASE.SMSPEC")
    assert m and m.group(1) == "12"


def test_df2res_satfunc_absent_column_keeps_slot(spark):
    """A SWOF frame without KROW renders '1*' in the KROW slot — PC must
    not shift left into it."""
    from res2df_spark.sinks.df2res import df2res_satfunc

    df = spark.createDataFrame(
        [("SWOF", 1, 0, 0.1, 0.0, 3.5), ("SWOF", 1, 1, 0.9, 0.8, 0.1)],
        "KEYWORD string, SATNUM int, ROW_IDX int, SW double, KRW double, "
        "PCOW double",
    )
    text = df2res_satfunc(df)
    data = [ln.split() for ln in text.splitlines() if ln.startswith("  ")]
    assert data[0] == ["0.1", "0.0", "1*", "3.5"]
    assert data[1] == ["0.9", "0.8", "1*", "0.1"]


def test_df2res_pvt_absent_column_keeps_slot(spark):
    from res2df_spark.sinks.df2res import df2res_pvt

    df = spark.createDataFrame(
        [("PVDO", 1, 0, 100.0, 1.2), ("PVDO", 1, 1, 200.0, 1.1)],
        "KEYWORD string, PVTNUM int, ROW_IDX int, PRESSURE double, VOLUMEFACTOR double",
    )
    text = df2res_pvt(df)
    data = [ln.split() for ln in text.splitlines() if ln.startswith("  ")]
    # VISCOSITY absent → trailing '1*', slots preserved
    assert data[0] == ["100.0", "1.2", "1*"]


def test_df2res_vfpprod_all_nan_alq_defaults_to_zero(spark):
    from res2df_spark.sinks.df2res import df2res_vfpprod

    rows = [
        (1, 100.0, 10.0, 0.0, 0.0, None, 50.0, 200.0),
        (1, 100.0, 10.0, 0.0, 0.0, None, 60.0, 210.0),
    ]
    df = spark.createDataFrame(
        rows,
        "TABLE int, DATUM double, THP double, WFR double, GFR double, "
        "ALQ double, RATE double, BHP double",
    )
    text = df2res_vfpprod(df)
    lines = text.splitlines()
    # axis lines: flow, THP, WFR, GFR, ALQ — ALQ axis is the default 0.0
    assert lines[6].split() == ["0.0", "/"]
    # and the value record exists (would be absent if NaN keys dropped)
    assert any(ln.strip().startswith("1 1 1 1 ") for ln in lines)


def test_df2res_vfp_nan_axis_raises(spark):
    from res2df_spark.sinks.df2res import df2res_vfpinj, df2res_vfpprod

    rows = [
        (1, 100.0, 10.0, 0.0, 0.0, 0.0, 50.0, 200.0),
        (1, 100.0, None, 0.0, 0.0, 0.0, 60.0, 210.0),  # NaN THP
    ]
    df = spark.createDataFrame(
        rows,
        "TABLE int, DATUM double, THP double, WFR double, GFR double, "
        "ALQ double, RATE double, BHP double",
    )
    with pytest.raises(ValueError, match="THP"):
        df2res_vfpprod(df)
    inj = spark.createDataFrame(
        [(1, 100.0, 10.0, 50.0, 200.0), (1, 100.0, None, 60.0, 210.0)],
        "TABLE int, DATUM double, THP double, RATE double, BHP double",
    )
    with pytest.raises(ValueError, match="THP"):
        df2res_vfpinj(inj)
    # RATE too: a NaN flow value would vanish from the flow axis while
    # its BHP still rendered, misaligning every value record
    prod_rate = spark.createDataFrame(
        [
            (1, 100.0, 10.0, 0.0, 0.0, 0.0, 50.0, 200.0),
            (1, 100.0, 10.0, 0.0, 0.0, 0.0, None, 210.0),
        ],
        "TABLE int, DATUM double, THP double, WFR double, GFR double, "
        "ALQ double, RATE double, BHP double",
    )
    with pytest.raises(ValueError, match="RATE"):
        df2res_vfpprod(prod_rate)
    inj_rate = spark.createDataFrame(
        [(1, 100.0, 10.0, 50.0, 200.0), (1, 100.0, 10.0, None, 210.0)],
        "TABLE int, DATUM double, THP double, RATE double, BHP double",
    )
    with pytest.raises(ValueError, match="RATE"):
        df2res_vfpinj(inj_rate)


def test_df2res_grid_property_empty_raises(spark):
    from res2df_spark.sinks.df2res import df2res_grid_property

    empty = spark.createDataFrame([], "GLOBAL_INDEX long, PERMX double")
    with pytest.raises(ValueError, match="global_size"):
        df2res_grid_property(empty, "PERMX")
    # with an explicit size the empty frame renders an all-fill block
    text = df2res_grid_property(empty, "PERMX", global_size=4, fill=0)
    assert "4*0.0" in text


def test_block_context_does_not_leak_across_files(spark, tmp_path):
    """Head lines of the second file (before its first block start) must
    carry NULL context, not the first file's last block."""
    from res2df_spark.sources.textreport import numbered_lines, with_block_context

    (tmp_path / "a.PRT").write_text(
        "REPORT REGION 1\n  data a1\n  data a2\n"
    )
    (tmp_path / "b.PRT").write_text(
        "  orphan line\nREPORT REGION 2\n  data b1\n"
    )
    lines = numbered_lines(spark, str(tmp_path / "*.PRT"))
    ctx = with_block_context(lines, r"REPORT REGION (\d+)", {"REGION": 1})
    rows = {r["line"]: r["REGION"] for r in ctx.collect()}
    assert rows["  data a1"] == "1"
    assert rows["  data b1"] == "2"
    # the orphan head line of b.PRT must NOT inherit region 1 from a.PRT
    assert rows["  orphan line"] in (None, "")


def test_to_pandas_datesafe_ntz_past_boundary(spark):
    """A timestamp_ntz column past pandas' ns max takes the object-dtype
    fallback (the margin guarantees the probe flags it in any session
    timezone)."""
    from pyspark.sql import functions as F

    from res2df_spark.sinks.writers import to_pandas_datesafe

    df = spark.range(1).select(
        F.lit("2400-01-01T00:00:00").cast("timestamp_ntz").alias("T")
    )
    pdf = to_pandas_datesafe(df)
    v = pdf["T"].iloc[0]
    assert v.year == 2400 and v.month == 1 and v.day == 1
