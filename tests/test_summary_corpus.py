"""Portable cases from the reference's summary test corpus
(/root/reference/tests/test_summary.py, 1322 lines) over the
eightcells fixture: date-grid normalization, rate/cumulative
extrapolation, point-in-time lookup, and mnemonic crops.  The
REEK-only and resdata-internal cases (Summary object plumbing,
pandas-attrs metadata) are covered by the arrow-metadata sweep and the
binary writer round-trips elsewhere.
"""
import datetime
import os

import pytest

_EIGHT = "/root/reference/tests/data/eightcells"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_EIGHT), reason="fixtures not present"
)


@pytest.fixture
def case(spark):
    from res2df_spark.case import ResdataCase

    return ResdataCase(spark, f"{_EIGHT}/EIGHTCELLS")


def _dates(df):
    return [r["DATE"] for r in df.orderBy("DATE").select("DATE").collect()]


def test_datenormalization(case):
    """Dates land on date-grid boundaries: daily keeps the run's last
    date, monthly/yearly roll the end FORWARD to the next boundary
    (reference test_datenormalization; eightcells ends 2000-01-03)."""
    daily = _dates(case.summary(time_index="daily", column_keys=["FOPT"]))
    assert str(daily[-1])[:10] == "2000-01-03"
    monthly = _dates(case.summary(time_index="monthly",
                                  column_keys=["FOPT"]))
    assert str(monthly[-1])[:10] == "2000-02-01"
    yearly = _dates(case.summary(time_index="yearly", column_keys=["FOPT"]))
    assert str(yearly[-1])[:10] == "2001-01-01"


def test_extrapolation(case):
    """Beyond the last report step rates are ZERO and cumulatives
    constant (reference test_extrapolation, pinned at the maximal
    datetime64[ns] date)."""
    last = case.summary(time_index="last", column_keys=["FOPT"])
    lastfopt = last.first()["FOPT"]
    out = case.summary(time_index="2262-04-11",
                       column_keys=["FOPT", "FOPR"])
    row = out.first()
    assert row["FOPT"] == lastfopt
    assert row["FOPR"] == 0.0
    assert str(row["DATE"])[:10] == "2262-04-11"


def test_rate_zero_on_rolled_forward_boundary(case):
    """The monthly end boundary past the run's last date is itself an
    extrapolation point — the rate there is zero, not the carried last
    rate."""
    out = case.summary(time_index="monthly", column_keys=["FOPR"])
    rows = out.orderBy("DATE").collect()
    assert str(rows[-1]["DATE"])[:10] == "2000-02-01"
    assert rows[-1]["FOPR"] == 0.0


def test_first_last_mnemonics(case):
    first = case.summary(time_index="first", column_keys=["FOPT"])
    last = case.summary(time_index="last", column_keys=["FOPT"])
    assert first.count() == 1
    assert last.count() == 1
    assert str(first.first()["DATE"])[:10] == "2000-01-01"
    assert str(last.first()["DATE"])[:10] == "2000-01-03"


def test_point_in_time_interpolates_cumulative(case):
    """An explicit date between report steps linearly interpolates
    cumulative vectors (the reference's time_index=datetime form)."""
    raw = case.summary(column_keys=["FOPT"]).orderBy("DATE").collect()
    d0, d1 = raw[0], raw[1]
    # eightcells report steps are daily at midnight; the midpoint is a
    # DATETIME between them (the reference's time_index=datetime form)
    out = case.summary(time_index="2000-01-01 12:00:00",
                       column_keys=["FOPT"])
    got = out.first()["FOPT"]
    expect = (d0["FOPT"] + d1["FOPT"]) / 2
    assert got == pytest.approx(expect, rel=1e-6)


def test_column_keys_wildcard(case):
    """column_keys as a wildcard template selects matching vectors
    only (reference test_df_column_keys)."""
    out = case.summary(column_keys=["F*"])
    assert all(c == "DATE" or c.startswith("F") for c in out.columns)
    assert any(c.startswith("FOP") for c in out.columns)
    woprs = case.summary(column_keys=["WOPR:*"])
    assert any(c.startswith("WOPR:") for c in woprs.columns)
    assert all(c == "DATE" or c.startswith("WOPR:") for c in woprs.columns)


def test_datetime_index_type(case):
    """Raw summary dates carry time-of-day (report steps are
    timestamps); normalized grids are day-precision dates."""
    raw = case.summary(column_keys=["FOPT"])
    assert dict(raw.dtypes)["DATE"] == "timestamp"
    daily = case.summary(time_index="daily", column_keys=["FOPT"])
    assert dict(daily.dtypes)["DATE"] == "date"


def test_start_end_date_crop(case):
    out = case.summary(column_keys=["FOPT"],
                       start_date=datetime.date(2000, 1, 2),
                       end_date=datetime.date(2000, 1, 2))
    dates = _dates(out)
    assert dates
    assert all(str(d)[:10] == "2000-01-02" for d in dates)


# --- date_range matrix (reference test_date_range, beyond-2262 spans) --------
# The reference's date_range CLAMPS raw endpoints into the list; the
# engine's date_spine ROLLS (start back, end forward) because the
# resample layer handles exact endpoints separately — the boundary-
# aligned cases below are contract-identical, and far-future dates
# (past the pandas datetime64[ns] limit) must work natively.


@pytest.mark.parametrize(
    "start, end, freq, expected",
    [
        ("3000-01-01", "3002-01-01", "yearly",
         ["3000-01-01", "3001-01-01", "3002-01-01"]),
        ("2999-11-01", "3000-02-01", "monthly",
         ["2999-11-01", "2999-12-01", "3000-01-01", "3000-02-01"]),
        ("2260-01-01", "2263-01-01", "yearly",  # crossing the ns limit
         ["2260-01-01", "2261-01-01", "2262-01-01", "2263-01-01"]),
        ("3000-01-01", "3000-01-01", "yearly", ["3000-01-01"]),
        ("2000-01-01", "2000-01-01", "yearly", ["2000-01-01"]),
        ("2000-01-01", "1000-01-01", "yearly", []),  # inverted → empty
        ("3000-01-01", "2000-01-01", "yearly", []),
        ("2304-05-06", "2302-03-01", "yearly", []),
    ],
)
def test_date_spine_far_future(spark, start, end, freq, expected):
    from res2df_spark.operators.resample import date_spine

    out = date_spine(spark, start, end, freq=freq)
    assert [str(r["DATE"]) for r in out.orderBy("DATE").collect()] == expected


def test_date_spine_unsupported_freq_raises(spark):
    from res2df_spark.operators.resample import date_spine

    with pytest.raises(ValueError, match="unsupported frequency"):
        date_spine(spark, "2000-01-01", "2001-01-01", freq="fortnightly")
