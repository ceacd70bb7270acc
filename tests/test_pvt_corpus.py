"""The reference's PVT test corpus, ported
(/root/reference/tests/test_pvt.py, 701 lines): PVTO nested records
(with and without TABDIMS sizing), PVDG/PVDO flat tables, the E100
manual's PVTG example with null-record table termination, DENSITY /
PVTW / ROCK records with NTPVT guessing, writer round-trips, and the
"No data" empty-frame markers.

REEK-binary cases (test_pvt_reek, test_df over REEK) exercise the same
pvt_df through file input and are covered by CLI tests on the
eightcells fixture.
"""
import pytest

from res2df_spark.modules.tables import pvt_df
from res2df_spark.sinks.df2res import df2res_equil, df2res_pvt, df2res_satfunc

PVTO_ONE_TABLE = """PVTO
0      1 1.0001 1
     200 1.000  1.001 /
18    25 1.14  0.59 /
/  -- One table (pvtnum=1), two records (two gor's)
"""

PVTO_TWO_TABLES = """
PVTO
0      1 1.0001 1
     200 1.000  1.001 /
18    25 1.14  0.59 /
/
1      2 1.0001 1
     333 1.000  1.001 /
19    30 1.14  0.59 /
/
"""


def _distinct(df, col):
    return {r[col] for r in df.select(col).distinct().collect()}


def test_pvto_one_table(spark):
    out = pvt_df(spark, PVTO_ONE_TABLE)
    for c in ("PVTNUM", "RS", "PRESSURE", "VISCOSITY", "VOLUMEFACTOR"):
        assert c in out.columns
    assert out.count() == 3
    assert len(_distinct(out, "RS")) == 2
    assert len(_distinct(out, "PRESSURE")) == 3
    assert _distinct(out, "PVTNUM") == {1}
    assert max(_distinct(out, "PRESSURE")) == 200.0


def test_pvto_two_tables_with_tabdims(spark):
    out = pvt_df(spark, "TABDIMS\n 1 2 /\n" + PVTO_TWO_TABLES)
    assert out.count() == 6
    assert _distinct(out, "PVTNUM") == {1, 2}
    assert len(_distinct(out, "RS")) == 4
    assert len(_distinct(out, "PRESSURE")) == 6
    assert len(_distinct(out, "VOLUMEFACTOR")) == 3


def test_pvto_two_tables_inferred(spark):
    # same deck without TABDIMS: NTPVT inferred from the lone-slash
    # table terminators
    out = pvt_df(spark, PVTO_TWO_TABLES)
    assert out.count() == 6
    assert _distinct(out, "PVTNUM") == {1, 2}


def test_pvto_writer_roundtrip(spark):
    out = pvt_df(spark, PVTO_TWO_TABLES)
    text = df2res_pvt(out)
    again = pvt_df(spark, text)
    key = ["PVTNUM", "RS", "PRESSURE", "VOLUMEFACTOR", "VISCOSITY"]
    assert sorted(map(tuple, out.select(*key).collect())) == \
        sorted(map(tuple, again.select(*key).collect()))


def test_pvdg_two_regions(spark):
    out = pvt_df(spark, """
PVDG
400 6 0.01
600 3 0.012
1000 1.3 0.15 /
200 8 0.013
300 4 0.014
8000 1.8 0.16 /
""")
    assert out.count() == 6
    assert _distinct(out, "PVTNUM") == {1, 2}
    for c in ("PRESSURE", "VOLUMEFACTOR", "VISCOSITY"):
        assert c in out.columns


def test_pvdo_values(spark):
    out = pvt_df(spark, """
PVDO
400 6 0.01
1000 1.3 0.15 /
200 8 0.013
8000 1.8 0.16 /
""")
    got = sorted(
        tuple(r) for r in
        out.select("PRESSURE", "VOLUMEFACTOR", "VISCOSITY", "PVTNUM").collect()
    )
    assert got == [
        (200.0, 8.0, 0.013, 2), (400.0, 6.0, 0.01, 1),
        (1000.0, 1.3, 0.15, 1), (8000.0, 1.8, 0.16, 2),
    ]


PVTG_E100 = """
PVTG
30 0.00014    0.0523 0.0234
   0          0.0521 0.0238 /
90 0.00012    0.0132 0.0252
   0          0.0131 0.0253 /
150 0.00015   0.00877 0.0281
   0          0.00861 0.0275 /
210 0.00019   0.00554 0.0318
    0         0.00555 0.0302 /
270 0.00029   0.00417 0.0355
    0         0.00421 0.0330 /
330 0.00049   0.00357 0.0392
    0         0.00361 0.0358 /
530 0.00060   0.00356 0.0393
    0         0.00360 0.0359 /
/ null record to terminate table 1
60 0.00014    0.0523 0.0234 /
120 0.00012   0.0132 0.0252 /
180 0.00015   0.00877 0.0281 /
240 0.00019   0.00554 0.0318 /
300 0.00029   0.00417 0.0355 /
360 0.00049   0.00357 0.0392 /
560 0.00060   0.00356 0.0393
    0         0.00360 0.0359 / undersaturated data for Pg=560
/ null record to terminate table 2
"""


def test_pvtg_e100_manual_example(spark):
    out = pvt_df(spark, PVTG_E100)
    for c in ("PRESSURE", "OGR", "PVTNUM", "VOLUMEFACTOR", "VISCOSITY"):
        assert c in out.columns
    assert _distinct(out, "PVTNUM") == {1, 2}
    assert len(_distinct(out, "PRESSURE")) == 14
    assert max(_distinct(out, "VOLUMEFACTOR")) == 0.0523
    assert max(_distinct(out, "VISCOSITY")) == 0.0393


def test_pvtg_simple_values(spark):
    out = pvt_df(spark, """
PVTG
30 0.00014    0.0523 0.0234
    0         0.00360 0.0359 /
/
60 0.00014    0.0523 0.0234 /
/
""")
    got = sorted(
        tuple(r) for r in
        out.select("OGR", "VOLUMEFACTOR", "VISCOSITY", "PRESSURE",
                   "PVTNUM").collect()
    )
    assert got == [
        (0.0, 0.0036, 0.0359, 30.0, 1),
        (0.00014, 0.0523, 0.0234, 30.0, 1),
        (0.00014, 0.0523, 0.0234, 60.0, 2),
    ]


def test_density_two_pvtnum(spark):
    out = pvt_df(spark, "DENSITY\n 860 999.04 1.1427 /\n 800 950 1.05\n/\n")
    assert _distinct(out, "PVTNUM") == {1, 2}
    got = sorted(
        tuple(r) for r in
        out.select("OILDENSITY", "WATERDENSITY", "GASDENSITY",
                   "PVTNUM").collect()
    )
    assert got == [(800.0, 950.0, 1.05, 2), (860.0, 999.04, 1.1427, 1)]


def test_density_writer_roundtrip(spark):
    out = pvt_df(spark, "DENSITY\n 860 999.04 1.1427 /\n 800 950 1.05 /\n")
    again = pvt_df(spark, df2res_pvt(out))
    key = ["PVTNUM", "OILDENSITY", "WATERDENSITY", "GASDENSITY"]
    assert sorted(map(tuple, out.select(*key).collect())) == \
        sorted(map(tuple, again.select(*key).collect()))


def test_pvtw_values(spark):
    out = pvt_df(
        spark, "PVTW\n 327.3 1.03 4.51E-005 0.25 0 /"
    )
    got = [tuple(r) for r in out.select(
        "PRESSURE", "VOLUMEFACTOR", "COMPRESSIBILITY", "VISCOSITY",
        "VISCOSIBILITY", "PVTNUM").collect()]
    assert got == [(327.3, 1.03, 4.51e-05, 0.25, 0.0, 1)]


def test_pvtw_two_records(spark):
    out = pvt_df(
        spark,
        "PVTW\n 327.3 1.03 4.51E-005 0.25 0 /\n 300 1 0.0001 0.2 /",
    )
    assert out.filter("KEYWORD = 'PVTW'").count() == 2


def test_rock_roundtrip(spark):
    out = pvt_df(spark, "ROCK\n 100 1.1 /")
    r = out.first()
    assert r["PRESSURE"] == 100.0 and r["COMPRESSIBILITY"] == 1.1
    again = pvt_df(spark, df2res_pvt(out))
    assert [tuple(x) for x in again.select(
        "PRESSURE", "COMPRESSIBILITY", "PVTNUM").collect()] == \
        [(100.0, 1.1, 1)]


def test_aggregate_df_keywords(spark):
    deck = (PVTO_ONE_TABLE
            + "PVDG\n 400 6 0.01 /\n"
            + "DENSITY\n 860 999.04 1.1427 /\n"
            + "ROCK\n 100 1.1 /\n"
            + "PVTW\n 327.3 1.03 4.51E-005 0.25 0 /\n")
    out = pvt_df(spark, deck)
    assert _distinct(out, "KEYWORD") == {
        "PVTO", "PVDG", "DENSITY", "ROCK", "PVTW"}
    for c in ("PVTNUM", "PRESSURE", "RS", "COMPRESSIBILITY", "VISCOSITY"):
        assert c in out.columns
    assert _distinct(out, "PVTNUM") == {1}


@pytest.mark.parametrize("writer", [df2res_pvt, df2res_satfunc, df2res_equil])
def test_no_data_marker(spark, writer):
    """Empty frames render the reference's explicit marker
    (pvt.py:365, equil.py:410) and reparse to nothing."""
    empty = spark.createDataFrame(
        [], "KEYWORD string, PVTNUM int, EQLNUM int, SATNUM int"
    )
    inc = writer(empty)
    assert "No data" in inc
    again = pvt_df(spark, inc)
    assert again is None or again.count() == 0
