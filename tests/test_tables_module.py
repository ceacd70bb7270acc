"""Table-keyword family: satfunc/pvt/equil (R9/R10/P11)."""

from __future__ import annotations

import pytest

from res2df_spark.modules.tables import equil_df, pvt_df, satfunc_df
from tests.conftest import rows

SATFUNC_DECK = """
SWOF
  0.1 0.0  1.0  0.0
  0.5 1*   0.5  0.0
  0.9 1.0  0.0  0.0
/
  0.2 0.0  1.0  0.0
  0.8 1.0  0.0  0.0
/

SGOF
  0.0 0.0 1.0 0.0
  1.0 1.0 0.0 0.0
/
"""


def test_satfunc_regions_and_union(spark):
    out = satfunc_df(spark, SATFUNC_DECK, interpolate_defaults=False)
    got = rows(out, "KEYWORD", "SATNUM", "ROW_IDX", "SW")
    # two SWOF regions from two records; SGOF tagged separately
    assert ("SWOF", 1, 0, 0.1) in got
    assert ("SWOF", 2, 0, 0.2) in got
    assert out.filter("KEYWORD = 'SGOF'").count() == 2
    # SGOF rows carry SG, not SW
    sg = out.filter("KEYWORD = 'SGOF'").select("SG").collect()
    assert sorted(r[0] for r in sg) == [0.0, 1.0]


def test_satfunc_default_interpolation(spark):
    out = satfunc_df(spark, SATFUNC_DECK, interpolate_defaults=True)
    r = out.filter("KEYWORD = 'SWOF' AND SATNUM = 1 AND ROW_IDX = 1").first()
    # KRW defaulted at SW=0.5 → linear between (0.1, 0.0) and (0.9, 1.0)
    assert r["KRW"] == pytest.approx(0.5)
    assert r["KROW"] == 0.5  # explicit values untouched


def test_pvt_tables(spark):
    deck = """
PVDG
  50  0.03 0.01
  100 0.02 0.012
/
DENSITY
  800 1000 1.2 /
"""
    out = pvt_df(spark, deck)
    assert out.filter("KEYWORD = 'PVDG'").count() == 2
    d = out.filter("KEYWORD = 'DENSITY'").first()
    assert d["OILDENSITY"] == 800.0 and d["PVTNUM"] == 1


def test_equil(spark):
    deck = """
EQUIL
  2000 300 2100 0.0 1900 0.0 1 0 20 /
  2500 320 2600 0.0 2400 0.0 1 0 20 /
"""
    out = equil_df(spark, deck)
    got = rows(out, "EQLNUM", "Z", "OWC")
    assert got == [(1, 2000.0, 2100.0), (2, 2500.0, 2600.0)]


def test_pvto_nested_records(spark):
    deck = """
PVTO
  20  50  1.2 1.0
      100 1.1 1.1
      150 1.0 1.2 /
  40  80  1.3 0.9 /
/
  30  60  1.25 1.05 /
/
"""
    out = pvt_df(spark, deck)
    pvto = out.filter("KEYWORD = 'PVTO'")
    got = rows(pvto, "PVTNUM", "RS", "ROW_IDX", "PRESSURE", "VOLUMEFACTOR")
    # region 1: RS=20 with 3-point undersaturated branch, RS=40 single
    assert (1, 20.0, 0, 50.0, 1.2) in got
    assert (1, 20.0, 1, 100.0, 1.1) in got
    assert (1, 20.0, 2, 150.0, 1.0) in got
    assert (1, 40.0, 0, 80.0, 1.3) in got
    # region 2 after the lone '/'
    assert (2, 30.0, 0, 60.0, 1.25) in got
    assert pvto.count() == 5


def test_sgwfn(spark):
    deck = """
SGWFN
  0.0 0.0 1.0 0.0
  0.5 0.4 0.3 0.1
  1.0 1.0 0.0 0.2
/
  0.0 0.0 1.0 0.0
  1.0 1.0 0.0 0.0
/
"""
    out = satfunc_df(spark, deck, interpolate_defaults=False)
    assert out.filter("KEYWORD = 'SGWFN'").count() == 5
    r = out.filter("KEYWORD = 'SGWFN' AND SATNUM = 1 AND ROW_IDX = 1").first()
    assert r["SG"] == 0.5 and r["KRG"] == 0.4 and r["KRW"] == 0.3 and r["PCGW"] == 0.1


def test_pvtw(spark):
    deck = """
PVTW
  327.3 1.03 4.51E-005 0.25 0.0 /
  350.0 1.04 4.60E-005 0.30 /
"""
    out = pvt_df(spark, deck)
    w = out.filter("KEYWORD = 'PVTW'").orderBy("PVTNUM").collect()
    assert len(w) == 2
    assert w[0]["PVTNUM"] == 1 and w[0]["PRESSURE"] == 327.3
    assert w[0]["COMPRESSIBILITY"] == 4.51e-05
    assert w[1]["PVTNUM"] == 2 and w[1]["VISCOSITY"] == 0.30
    assert w[1]["VISCOSIBILITY"] is None  # trailing default


EQUIL_SOLUTION_DECK = """
EQUIL
  2000 200 2200 /

RSVD
  1500 184.0
  4000 184.0
/
  1500 180.0
  4000 180.0
/

RVVD
  1500 0.001
  4000 0.0014
/
"""


def test_equil_solution_tables(spark):
    out = equil_df(spark, EQUIL_SOLUTION_DECK)
    kws = {r[0] for r in rows(out, "KEYWORD")}
    assert kws == {"EQUIL", "RSVD", "RVVD"}
    rs = out.filter("KEYWORD = 'RSVD'")
    assert rs.count() == 4
    r = rs.filter("EQLNUM = 2 AND Z = 1500").first()
    assert r["RS"] == 180.0
    rv = out.filter("KEYWORD = 'RVVD' AND EQLNUM = 1 AND Z = 4000").first()
    assert rv["RV"] == 0.0014
    # EQUIL row intact
    eq = out.filter("KEYWORD = 'EQUIL'").first()
    assert eq["Z"] == 2000.0 and eq["PRESSURE"] == 200.0 and eq["OWC"] == 2200.0


def test_equil_solution_roundtrip(spark):
    from res2df_spark.sinks.df2res import df2res_equil

    out = equil_df(spark, EQUIL_SOLUTION_DECK)
    text = df2res_equil(out)
    again = equil_df(spark, text)
    a = sorted(rows(out, "KEYWORD", "EQLNUM", "Z", "RS", "RV"))
    b = sorted(rows(again, "KEYWORD", "EQLNUM", "Z", "RS", "RV"))
    assert a == b


def test_pvtw_sgwfn_roundtrip(spark):
    from res2df_spark.sinks.df2res import df2res_pvt, df2res_satfunc

    deck = """
PVTW
  327.3 1.03 4.51E-005 0.25 0.0 /
SGWFN
  0.0 0.0 1.0 0.0
  1.0 1.0 0.0 0.25
/
"""
    p = pvt_df(spark, deck)
    p2 = pvt_df(spark, df2res_pvt(p))
    assert sorted(rows(p, "KEYWORD", "PVTNUM", "PRESSURE")) == sorted(
        rows(p2, "KEYWORD", "PVTNUM", "PRESSURE")
    )
    s = satfunc_df(spark, deck, interpolate_defaults=False)
    s2 = satfunc_df(spark, df2res_satfunc(s), interpolate_defaults=False)
    assert sorted(rows(s, "KEYWORD", "SATNUM", "ROW_IDX", "SG", "PCGW")) == sorted(
        rows(s2, "KEYWORD", "SATNUM", "ROW_IDX", "SG", "PCGW")
    )


def test_satfunc_nan_saturation_raises(spark):
    """Reference satfunc.py:146-147: a defaulted (1*) saturation value
    raises — it is the interpolation axis."""
    import pytest as _pytest

    deck = """
SWOF
  1* 0.5 0.5 0.0
  0.9 0.8 0.0 0.0 /
"""
    from res2df_spark.modules.tables import satfunc_df

    with _pytest.raises(ValueError, match="saturation column"):
        satfunc_df(spark, deck)
