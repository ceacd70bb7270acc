"""The reference's WCON corpus, ported
(/root/reference/tests/test_wcon.py, 228 lines): per-keyword default
values for WCONHIST / WCONINJH / WCONINJE / WCONPROD over minimal
records, and TSTEP date-stepping.  The engine folds all four keywords
into ONE union frame (KEYWORD column), so absent-family columns are
NULL instead of absent — values per keyword match the reference."""
import pytest

from res2df_spark.modules import wcon


def _one(spark, kw):
    out = wcon.df(spark, f"{kw}\n  'FOO' 0 1 /\n /\n")
    return out.first()


def test_wconhist(spark):
    r = _one(spark, "WCONHIST")
    assert r["WELL"] == "FOO"
    assert r["STATUS"] == "0" and r["CMODE"] == "1"
    for c in ("ORAT", "WRAT", "GRAT", "ALQ", "THP", "BHP", "NGLRAT"):
        assert r[c] == 0.0, c
    assert r["VFP_TABLE"] == 0
    assert r["DATE"] is None
    assert r["KEYWORD"] == "WCONHIST"


def test_wconinjh(spark):
    r = _one(spark, "WCONINJH")
    assert r["TYPE"] == "0" and r["STATUS"] == "1"
    assert r["RATE"] is None and r["BHP"] is None and r["THP"] is None
    assert r["VFP_TABLE"] == 0
    assert r["VAPOIL_C"] == 0.0
    for c in ("SURFACE_OIL_FRACTION", "SURFACE_WATER_FRACTION",
              "SURFACE_GAS_FRACTION"):
        assert r[c] == 0.0, c
    # the one string default: control mode RATE
    assert r["CMODE"] == "RATE"


def test_wconinje(spark):
    r = _one(spark, "WCONINJE")
    assert r["TYPE"] == "0" and r["STATUS"] == "1"
    assert r["CMODE"] is None
    assert r["RATE"] is None and r["RESV"] is None
    assert r["BHP"] == 6895.0  # the Eclipse default injector BHP limit
    assert r["THP"] is None
    assert r["VFP_TABLE"] == 0
    for c in ("VAPOIL_C", "GAS_STEAM_RATIO", "SURFACE_OIL_FRACTION",
              "SURFACE_WATER_FRACTION", "SURFACE_GAS_FRACTION",
              "OIL_STEAM_RATIO"):
        assert r[c] == 0.0, c


def test_wconprod(spark):
    r = _one(spark, "WCONPROD")
    assert r["STATUS"] == "0" and r["CMODE"] == "1"
    for c in ("ORAT", "WRAT", "GRAT", "LRAT", "RESV", "THP", "ALQ"):
        assert r[c] == 0.0, c
    assert r["BHP"] == pytest.approx(1.01325)  # atmospheric default
    assert r["VFP_TABLE"] == 0


def test_tstep(spark):
    schstr = """
DATES
   1 MAY 2001 /
/

WCONHIST
 'OP1' 1000  /
/

TSTEP
  1 /

WCONHIST
 'OP1' 2000 /
/

TSTEP
  2 3 /

WCONHIST
  'OP1' 3000 /
/
"""
    out = wcon.df(spark, schstr)
    dates = {str(r["DATE"]) for r in out.select("DATE").distinct().collect()}
    assert dates == {"2001-05-01", "2001-05-02", "2001-05-07"}
