"""Round-trip tests (reference layer 3, SURVEY §5): df → include text →
re-parse → identical df."""

from __future__ import annotations

from res2df_spark.modules import compdat
from res2df_spark.modules.tables import equil_df, satfunc_df
from res2df_spark.sinks.df2res import df2res_compdat, df2res_equil, df2res_satfunc
from tests.conftest import rows

DECK = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 3 4 1000.0 'OIL' /
/
COMPDAT
  'OP1' 2* 1 3 'OPEN' /
/
"""


def test_compdat_roundtrip(spark):
    df1 = compdat.df(spark, DECK)
    text = df2res_compdat(df1)
    assert text.startswith("COMPDAT")
    # re-parse the rendered text (needs a date context for the pipeline)
    deck2 = "START\n  1 JAN 2020 /\n" + text
    df2 = compdat.df(spark, deck2)
    key = ["WELL", "I", "J", "K", "OP_SH"]
    assert rows(df1, *key) == rows(df2, *key)


SATFUNC_DECK = """
SWOF
  0.1 0 1 0
  0.9 1 0 0
/
  0.2 0 1 0
  0.8 1 0 0
/
SGOF
  0 0 1 0
  1 1 0 0
/
"""


def test_satfunc_roundtrip(spark):
    df1 = satfunc_df(spark, SATFUNC_DECK, interpolate_defaults=False)
    text = df2res_satfunc(df1)
    df2 = satfunc_df(spark, text, interpolate_defaults=False)
    key = ["KEYWORD", "SATNUM", "ROW_IDX", "SW", "KRW", "KROW", "SG", "KRG", "KROG", "PCOW", "PCOG"]
    assert rows(df1, *key) == rows(df2, *key)


EQUIL_DECK = """
EQUIL
  2000 300 2100 0.0 1900 0.0 1 0 20 /
  2500 320 2600 0.0 2400 0.0 1 0 20 /
"""


def test_equil_roundtrip(spark):
    df1 = equil_df(spark, EQUIL_DECK)
    text = df2res_equil(df1)
    df2 = equil_df(spark, text)
    key = ["EQLNUM", "Z", "PRESSURE", "OWC", "GOC"]
    assert rows(df1, *key) == rows(df2, *key)


PVT_DECK = """
PVTO
  50.0 100.0 1.2 0.9 150.0 1.19 0.95 /
  80.0 200.0 1.3 0.8 /
/
  60.0 120.0 1.25 0.85 /
/
DENSITY
  800.0 1000.0 1.05 /
  820.0 1010.0 1.06 /
ROCK
  300.0 4.0e-5 /
PVDG
  100.0 0.01 0.02
  200.0 0.005 0.025
/
"""


def test_pvt_roundtrip(spark):
    from res2df_spark.modules.tables import pvt_df
    from res2df_spark.sinks.df2res import df2res_pvt

    df1 = pvt_df(spark, PVT_DECK)
    text = df2res_pvt(df1)
    df2 = pvt_df(spark, text)
    key = ["KEYWORD", "PVTNUM", "ROW_IDX", "RS", "PRESSURE", "VOLUMEFACTOR",
           "VISCOSITY", "OILDENSITY", "WATERDENSITY", "GASDENSITY",
           "COMPRESSIBILITY"]
    assert rows(df1, *key) == rows(df2, *key)


def test_editnnc_roundtrip(spark):
    from res2df_spark.sinks.df2res import df2res_editnnc
    from res2df_spark.sources.deck import deck_records

    nnc = spark.createDataFrame(
        [(1, 1, 1, 1, 1, 4, 0.5, "NNC"), (2, 2, 3, 2, 2, 7, 0.1, "NNC"),
         (9, 9, 9, 9, 9, 10, 0.9, "X")],
        "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRANM double, DIR string",
    )
    text = df2res_editnnc(nnc)
    assert text.startswith("EDITNNC")
    back = deck_records(spark, text, "EDITNNC")
    got = rows(back, "I1", "J1", "K1", "I2", "J2", "K2", "TRANM")
    # the DIR != 'NNC' row must have been excluded
    assert got == [(1, 1, 1, 1, 1, 4, 0.5), (2, 2, 3, 2, 2, 7, 0.1)]


VFP_DECK = """
VFPPROD
  1 2000.0 /
  100.0 500.0 /
  10.0 20.0 /
  0.0 /
  0.0 /
  0.0 /
  1 1 1 1 1500.0 1600.0 /
  2 1 1 1 1700.0 1800.0 /
"""


def test_vfpprod_roundtrip(spark):
    from res2df_spark.modules.vfp import df_prod
    from res2df_spark.sinks.df2res import df2res_vfpprod

    df1 = df_prod(spark, VFP_DECK)
    text = df2res_vfpprod(df1)
    df2 = df_prod(spark, text)
    key = ["TABLE", "DATUM", "THP", "WFR", "GFR", "ALQ", "RATE", "BHP"]
    assert rows(df1, *key) == rows(df2, *key)


VFPINJ_DECK = """
VFPINJ
  2 1500.0 /
  50.0 150.0 250.0 /
  5.0 15.0 /
  1 900.0 950.0 1000.0 /
  2 1100.0 1150.0 1200.0 /
"""


def test_vfpinj_roundtrip(spark):
    from res2df_spark.modules.vfp import df_inj
    from res2df_spark.sinks.df2res import df2res_vfpinj

    df1 = df_inj(spark, VFPINJ_DECK)
    text = df2res_vfpinj(df1)
    df2 = df_inj(spark, text)
    key = ["TABLE", "DATUM", "THP", "RATE", "BHP"]
    assert rows(df1, *key) == rows(df2, *key)
