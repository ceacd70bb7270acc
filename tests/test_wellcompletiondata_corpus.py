"""The reference's wellcompletiondata end-to-end corpus over the
eightcells fixture, ported
(/root/reference/tests/test_wellcompletiondata.py): both
use_wellconnstatus variants pinned to the exact expected frame, empty
and out-of-range zonemaps, and default zonemap discovery (zones.lyr
next to the DATA file).  The merge quirks themselves are pinned by
tests/test_round10_fixes.py and the Hypothesis differential model."""
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


def _rows(df):
    # the connstatus path keys on summary timestamps, the schedule path
    # on deck dates — normalize both to date (the reference's frame
    # carries datetimes; the calendar day is the semantic content)
    def _d(v):
        return v.date() if isinstance(v, datetime.datetime) else v

    return [
        (r["WELL"], r["ZONE"], _d(r["DATE"]), r["KH"], r["OP/SH"])
        for r in df.select("WELL", "ZONE", "DATE", "KH", "OP/SH").collect()
    ]


def test_eightcells_with_wellconnstatus(case):
    """CPI-derived status timeline: one row, OPEN at the first CPI>0
    date (2000-01-02), KH -1 (defaulted in the deck)."""
    out = case.wellcompletiondata(use_wellconnstatus=True)
    assert _rows(out) == [
        ("OP1", "Upper", datetime.date(2000, 1, 2), -1.0, "OPEN")
    ]


def test_eightcells_without_wellconnstatus(case):
    """Schedule-file timeline: one row, OPEN at the COMPDAT date
    (2000-01-01)."""
    out = case.wellcompletiondata(use_wellconnstatus=False)
    assert _rows(out) == [
        ("OP1", "Upper", datetime.date(2000, 1, 1), -1.0, "OPEN")
    ]


def test_empty_zonemap(case, spark):
    empty = spark.createDataFrame([], "K int, ZONE string")
    out = case.wellcompletiondata(zonemap=empty)
    assert out.count() == 0


def test_out_of_range_zonemap(case, spark):
    zmap = spark.createDataFrame(
        [(1000, "ZONE1"), (-1, "ZONE1")], "K int, ZONE string"
    )
    out = case.wellcompletiondata(zonemap=zmap)
    assert out.count() == 0


def test_default_zonemap_discovery(case):
    """zones.lyr next to the DATA file is picked up when no zonemap is
    passed (reference test_zonemap_with_no_input)."""
    out = case.wellcompletiondata()
    assert out.count() > 0
    assert {r["ZONE"] for r in out.select("ZONE").collect()} <= {
        "Upper", "Lower"}


def test_kh_metadata_attached(case):
    out = case.wellcompletiondata()
    meta = {f.name: f.metadata for f in out.schema}
    assert meta["KH"] == {"unit": "mDm"}  # METRIC deck
