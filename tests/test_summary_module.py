"""Summary module: wildcard select, rate/total resampling, pivot."""

from __future__ import annotations

from datetime import date

import pytest

from res2df_spark.modules import summary
from tests.conftest import rows


def _fixture(spark):
    long = spark.createDataFrame(
        [
            # FOPT: cumulative (linear interpolation)
            ("FOPT", date(2020, 1, 1), 0.0),
            ("FOPT", date(2020, 3, 1), 60.0),
            # FOPR: rate (valid backwards → bfill)
            ("FOPR", date(2020, 1, 1), 100.0),
            ("FOPR", date(2020, 3, 1), 50.0),
            # WBHP:OP_1: neither → ffill
            ("WBHP:OP_1", date(2020, 1, 1), 250.0),
            ("WBHP:OP_1", date(2020, 3, 1), 240.0),
        ],
        "VECTOR string, DATE date, VALUE double",
    )
    meta = spark.createDataFrame(
        [
            ("FOPT", True, False),
            ("FOPR", False, True),
            ("WBHP:OP_1", False, False),
        ],
        "VECTOR string, IS_TOTAL boolean, IS_RATE boolean",
    )
    return long, meta


def test_select_vectors_glob(spark):
    long, _ = _fixture(spark)
    sel = summary.select_vectors(long, ["F*"])
    assert set(r[0] for r in rows(sel, "VECTOR")) == {"FOPT", "FOPR"}
    sel2 = summary.select_vectors(long, ["WBHP:*", "FOPT"])
    assert set(r[0] for r in rows(sel2, "VECTOR")) == {"WBHP:OP_1", "FOPT"}


def test_resample_semantics(spark):
    long, meta = _fixture(spark)
    res = summary.resample(long, meta, freq="monthly")
    got = {(r[0], r[1]): r[2] for r in rows(res, "VECTOR", "DATE", "VALUE")}
    feb = date(2020, 2, 1)
    # cumulative: linear in time (31 of 60 days elapsed)
    assert got[("FOPT", feb)] == pytest.approx(60.0 * 31 / 60)
    # rate: next observation's value
    assert got[("FOPR", feb)] == 50.0
    # plain (pressure): reference linearly interpolates all non-rates
    assert got[("WBHP:OP_1", feb)] == pytest.approx(250.0 - 10.0 * 31 / 60)


def test_resample_null_flags_not_dropped(spark):
    """A vector whose meta row has IS_TOTAL=false, IS_RATE=null must
    still appear in the output (three-valued-logic regression)."""
    long, _ = _fixture(spark)
    meta = spark.createDataFrame(
        [("FOPT", True, False), ("FOPR", False, True), ("WBHP:OP_1", False, None)],
        "VECTOR string, IS_TOTAL boolean, IS_RATE boolean",
    )
    res = summary.resample(long, meta, freq="monthly")
    vecs = {r[0] for r in rows(res, "VECTOR")}
    assert "WBHP:OP_1" in vecs
    # a vector missing from the meta dim entirely also survives (left join)
    res2 = summary.resample(long, meta.filter("VECTOR <> 'WBHP:OP_1'"), freq="monthly")
    assert "WBHP:OP_1" in {r[0] for r in rows(res2, "VECTOR")}


def test_meta_ratio_keywords_are_rates(spark):
    long = spark.createDataFrame(
        [("WWCT:OP_1",), ("FGOR",), ("FOPT",), ("WOPR:OP_1",), ("BPR:1,1,1",)],
        "VECTOR string",
    )
    m = {r[0]: (r[1], r[2]) for r in rows(summary.meta_from_vectors(long), "VECTOR", "IS_TOTAL", "IS_RATE")}
    assert m["WWCT:OP_1"] == (False, True)   # ratio → rate, NOT total
    assert m["FGOR"] == (False, True)
    assert m["FOPT"] == (True, False)
    assert m["WOPR:OP_1"] == (False, True)
    assert m["BPR:1,1,1"] == (False, False)  # pressure → linear default


def test_meta_from_units(spark):
    vectors = ["TIME", "FOPR", "FOPT", "WBHP:OP_1", "WWCT:OP_1"]
    units = ["DAYS", "SM3/DAY", "SM3", "BARSA", ""]
    m = {
        r[0]: (r[1], r[2])
        for r in rows(
            summary.meta_from_units(spark, vectors, units), "VECTOR", "IS_TOTAL", "IS_RATE"
        )
    }
    assert "TIME" not in m
    assert m["FOPR"] == (False, True)       # /DAY unit ⇒ rate
    assert m["FOPT"] == (True, False)
    assert m["WBHP:OP_1"] == (False, False)
    assert m["WWCT:OP_1"] == (False, True)  # ratio keyword ⇒ rate despite unit


def test_df_wide_shape(spark):
    long, meta = _fixture(spark)
    out = summary.df(long, meta, time_index="monthly", column_keys=["F*"])
    assert set(out.columns) == {"DATE", "FOPT", "FOPR"}
    first = out.orderBy("DATE").first()
    assert first["FOPT"] == 0.0 and first["FOPR"] == 100.0


def test_date_mnemonics(spark):
    long, meta = _fixture(spark)
    raw = summary.df(long, meta, time_index="raw", column_keys=["F*"])
    assert raw.count() == 2  # both report dates kept

    first = summary.df(long, meta, time_index="first", column_keys=["F*"])
    r = first.collect()
    assert len(r) == 1 and r[0]["DATE"] == date(2020, 1, 1)
    assert r[0]["FOPT"] == 0.0

    last = summary.df(long, meta, time_index="last", column_keys=["FOPT"])
    r = last.collect()
    assert len(r) == 1 and r[0]["DATE"] == date(2020, 3, 1)
    assert r[0]["FOPT"] == 60.0


def test_wide_to_long_roundtrip(spark):
    long, meta = _fixture(spark)
    wide = summary.pivot_wide(long)
    back = summary.wide_to_long(wide)
    assert rows(back.filter("VALUE IS NOT NULL"), "VECTOR", "DATE", "VALUE") == rows(
        long, "VECTOR", "DATE", "VALUE"
    )


def test_explicit_date_time_index(spark):
    """time_index as an explicit date → interpolated point-in-time
    lookup (reference summary.py:125-127 datetime form)."""
    long, meta = _fixture(spark)
    for ti in ("2020-01-31", date(2020, 1, 31)):
        out = summary.df(long, meta, time_index=ti)
        r = out.collect()
        assert len(r) == 1 and r[0]["DATE"] == date(2020, 1, 31)
        # FOPT linear: 30/60 of the way through Jan 1 → Mar 1 (60 days)
        assert r[0]["FOPT"] == pytest.approx(30.0)
        # FOPR rate → value of next observation
        assert r[0]["FOPR"] == 50.0
        # WBHP neither → linear too (reference interpolates non-rates)
        assert r[0]["WBHP:OP_1"] == pytest.approx(245.0)


def test_explicit_date_rejects_impossible_date(spark):
    long, meta = _fixture(spark)
    with pytest.raises(ValueError, match="2020-02-31"):
        summary.df(long, meta, time_index="2020-02-31")


def test_explicit_datetime_interpolates_at_time_of_day(spark):
    """A time-of-day component interpolates at the full datetime
    (reference summary.py:125-127), not the truncated date."""
    from datetime import datetime

    long, meta = _fixture(spark)
    for ti in (datetime(2020, 1, 31, 12, 0), "2020-01-31 12:00:00"):
        r = summary.df(long, meta, time_index=ti).collect()
        assert len(r) == 1 and r[0]["DATE"] == datetime(2020, 1, 31, 12, 0)
        # FOPT linear, 1 unit/day Jan 1 → Mar 1: half a day past 30.0
        assert r[0]["FOPT"] == pytest.approx(30.5)
