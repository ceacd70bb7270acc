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
    key = ["KEYWORD", "SATNUM", "ROW_IDX", "SW", "KRW", "KROW", "SG", "KRG", "KROG", "PC"]
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
