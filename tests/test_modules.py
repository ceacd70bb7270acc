"""Engine-layer datatype modules: gruptree (W7), wellconnstatus (W3)."""

from __future__ import annotations

from datetime import date, datetime

from res2df_spark.modules import gruptree, wellconnstatus
from tests.conftest import rows

GRUPTREE_DECK = """
START
  1 JAN 2020 /
GRUPTREE
  'OP_GRP' 'PLATA' /
  'PLATA' 'FIELD' /
/
DATES
  1 MAR 2020 /
/
GRUPTREE
  'OP_GRP' 'PLATB' /
  'PLATB' 'FIELD' /
/
"""


def test_gruptree_snapshots(spark):
    out = gruptree.df(spark, GRUPTREE_DECK)
    got = rows(out, "DATE", "CHILD", "PARENT")
    jan, mar = date(2020, 1, 1), date(2020, 3, 1)
    # January: OP_GRP under PLATA; FIELD is the synthesized root
    assert (jan, "OP_GRP", "PLATA") in got
    assert (jan, "PLATA", "FIELD") in got
    assert (jan, "FIELD", None) in got
    # March: OP_GRP re-parented to PLATB; PLATA edge still latest-known
    assert (mar, "OP_GRP", "PLATB") in got
    assert (mar, "PLATB", "FIELD") in got
    assert (mar, "PLATA", "FIELD") in got
    assert (mar, "FIELD", None) in got


def test_gruptree_default_parent_is_field(spark):
    deck = """
START
  1 JAN 2020 /
GRUPTREE
  'G1' /
/
"""
    out = gruptree.df(spark, deck)
    got = rows(out, "CHILD", "PARENT")
    assert ("G1", "FIELD") in got
    assert ("FIELD", None) in got


def test_wellconnstatus(spark):
    d = datetime
    obs = spark.createDataFrame(
        [
            ("OP1", 1, 1, 1, d(2020, 1, 1), 0.0),
            ("OP1", 1, 1, 1, d(2020, 2, 1), 5.0),
            ("OP1", 1, 1, 1, d(2020, 3, 1), 4.0),
            ("OP1", 1, 1, 1, d(2020, 4, 1), 0.0),
            ("OP2", 2, 2, 1, d(2020, 1, 1), 3.0),
        ],
        "WELL string, I int, J int, K int, DATE timestamp, VALUE double",
    )
    out = wellconnstatus.df(obs)
    got = rows(out, "WELL", "DATE", "OP/SH")
    assert got == [
        ("OP1", d(2020, 1, 1), "SHUT"),
        ("OP1", d(2020, 2, 1), "OPEN"),
        ("OP1", d(2020, 4, 1), "SHUT"),
        ("OP2", d(2020, 1, 1), "OPEN"),
    ]
