"""The reference's wellconnstatus corpus, ported
(/root/reference/tests/test_wellconnstatus.py): CPI vector-name
filtering (malformed CPI:OP1:123 and non-CPI vectors ignored),
zero-crossing event extraction (first event per connection is its
first OPEN; never-opened connections emit nothing), intra-day
timestamps, and the eightcells end-to-end frame.

One documented divergence: the reference's _extract_status_changes
walks the summary frame in INPUT ROW ORDER, so a non-chronological
frame produces order-dependent events; this engine orders by time
(real summary data is always chronological, and a distributed scan has
no meaningful input order), so the intra-day case here feeds the same
observations and expects the time-ordered events."""
import datetime
import os

import pytest

from res2df_spark.modules import wellconnstatus

_EIGHT = "/root/reference/tests/data/eightcells"


def _long(spark, rows):
    return spark.createDataFrame(
        [(datetime.datetime.fromisoformat(d), v, float(x))
         for d, v, x in rows],
        "DATE timestamp, VECTOR string, VALUE double",
    )


def _events(df):
    return sorted(
        (str(r["DATE"]), r["WELL"], r["I"], r["J"], r["K"], r["OP/SH"])
        for r in df.collect()
    )


def test_simple_open_and_vector_filtering(spark):
    """Malformed CPI:OP1:123 and FOPT are ignored; the one valid
    connection opens at its first CPI>0 date."""
    long = _long(spark, [
        ("2000-01-01", "CPI:OP1:1,1,1", 0), ("2000-01-02", "CPI:OP1:1,1,1", 1.1),
        ("2000-01-01", "CPI:OP1:123", 0), ("2000-01-02", "CPI:OP1:123", 1),
        ("2000-01-01", "FOPT", 0), ("2000-01-02", "FOPT", 1000),
    ])
    out = wellconnstatus.from_summary(long)
    assert _events(out) == [
        ("2000-01-02 00:00:00", "OP1", 1, 1, 1, "OPEN"),
    ]


def test_never_opened_connection_emits_nothing(spark):
    long = _long(spark, [
        ("2000-01-01", "CPI:OP1:1,1,1", 0), ("2000-01-02", "CPI:OP1:1,1,1", 0),
        ("2000-01-01", "CPI:OP1:1,1,2", 1), ("2000-01-02", "CPI:OP1:1,1,2", 0),
    ])
    out = wellconnstatus.from_summary(long)
    assert _events(out) == [
        ("2000-01-01 00:00:00", "OP1", 1, 1, 2, "OPEN"),
        ("2000-01-02 00:00:00", "OP1", 1, 1, 2, "SHUT"),
    ]


def test_intraday_timestamps_time_ordered(spark):
    """Hours in the DATE column: events follow TIME order (see module
    docstring for the input-row-order divergence)."""
    long = _long(spark, [
        ("2000-01-01 00:00:00", "CPI:OP1:1,1,1", 1),
        ("2000-01-02 00:00:00", "CPI:OP1:1,1,1", 0),
        ("2000-01-02 12:00:00", "CPI:OP1:1,1,1", 1),
        ("2000-01-01 00:00:00", "CPI:OP2:1,1,1", 0),
        ("2000-01-02 00:00:00", "CPI:OP2:1,1,1", 1),
        ("2000-01-02 12:00:00", "CPI:OP2:1,1,1", 1),
    ])
    out = wellconnstatus.from_summary(long)
    assert _events(out) == [
        ("2000-01-01 00:00:00", "OP1", 1, 1, 1, "OPEN"),
        ("2000-01-02 00:00:00", "OP1", 1, 1, 1, "SHUT"),
        ("2000-01-02 00:00:00", "OP2", 1, 1, 1, "OPEN"),
        ("2000-01-02 12:00:00", "OP1", 1, 1, 1, "OPEN"),
    ]


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_eightcells_dataset(spark):
    from res2df_spark.case import ResdataCase

    out = ResdataCase(spark, f"{_EIGHT}/EIGHTCELLS").wellconnstatus()
    got = _events(out)
    assert got == [("2000-01-02 00:00:00", "OP1", 1, 1, 1, "OPEN")]
