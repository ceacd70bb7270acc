"""The reference's fipreports PRT corpus, ported
(/root/reference/tests/test_fipreports.py, 575 lines): the
fully-pinned Eclipse report block, the two-phase gas-water and dry-gas
layouts (empty OIL columns), the rogue ``****`` material-balance line,
and OPM Flow's report format (lower-case row labels, d-Mon-YYYY
dates).  The REEK/eightcells PRT file cases run through the same
parser via the CLI tests."""
import datetime
import os

import pytest

from res2df_spark.modules import fipreports


def _df(spark, tmp_path, prtstring):
    p = tmp_path / "FOO.PRT"
    p.write_text(prtstring, encoding="utf8")
    return fipreports.df(spark, str(p))


def _rows(df, *cols):
    cols = cols or df.columns
    return [tuple(r[c] for c in cols) for r in df.collect()]


GASWATER_PRT = """
                                              =================================
                                                : FIPNUM  REPORT REGION    2    :
                                                :     PAV =       4045.00  BARSA:
                                                :     PORV=     27000000.   RM3 :
                           :--------------- OIL    SM3  ---------------:-- WAT    SM3  -:--------------- GAS    SM3  ---------------:
                           :     LIQUID         VAPOUR         TOTAL   :       TOTAL    :       FREE      DISSOLVED         TOTAL   :
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :CURRENTLY IN PLACE       :                                           :      19135648. :      8457278.                     8457278.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :OUTFLOW TO OTHER REGIONS :                                           :             0. :            0.                           0.:
 :OUTFLOW THROUGH WELLS    :                                           :             0. :                                         0.:
 :MATERIAL BALANCE ERROR.  :                                           :             0. :                                         0.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :ORIGINALLY IN PLACE      :                                           :      19135648. :      8457278.                     8457278.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 ====================================================================================================================================
"""  # noqa: E501


def test_gaswater_report(spark, tmp_path):
    out = _df(spark, tmp_path, GASWATER_PRT)
    got = {
        r["DATATYPE"]: (r["STOIIP_OIL"], r["WIIP_TOTAL"], r["GIIP_GAS"],
                        r["GIIP_TOTAL"])
        for r in out.collect()
    }
    assert {r["REGION"] for r in out.select("REGION").collect()} == {2}
    assert got["CURRENTLY IN PLACE"] == (None, 19135648.0, 8457278.0,
                                         8457278.0)
    assert got["OUTFLOW TO OTHER REGIONS"] == (None, 0.0, 0.0, 0.0)
    assert got["OUTFLOW THROUGH WELLS"] == (None, 0.0, None, 0.0)
    assert got["MATERIAL BALANCE ERROR."] == (None, 0.0, None, 0.0)
    assert got["ORIGINALLY IN PLACE"] == (None, 19135648.0, 8457278.0,
                                          8457278.0)


DRYGAS_PRT = """
                                                =================================
                                                : FIPNUM  REPORT REGION    2    :
                                                :     PAV =        909.34  BARSA:
                                                :     PORV=    150001895.   RM3 :
                           :--------------- OIL    SM3  ---------------:-- WAT    SM3  -:--------------- GAS    SM3  ---------------:
                           :     LIQUID         VAPOUR         TOTAL   :       TOTAL    :       FREE      DISSOLVED         TOTAL   :
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :CURRENTLY IN PLACE       :            0.                           0.:      10476036. :   1815774165.                  1815774165.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :OUTFLOW TO OTHER REGIONS :            0.                           0.:             0. :            0.                           0.:
 :OUTFLOW THROUGH WELLS    :                                         0.:             0. :                                         0.:
 :MATERIAL BALANCE ERROR.  :                                        -0.:             0. :                                         0.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :ORIGINALLY IN PLACE      :            0.                           0.:      10476036. :   1815774165.                  1815774165.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 ====================================================================================================================================
"""  # noqa: E501


def test_drygas_report(spark, tmp_path):
    out = _df(spark, tmp_path, DRYGAS_PRT)
    got = {
        r["DATATYPE"]: (r["STOIIP_OIL"], r["STOIIP_TOTAL"], r["WIIP_TOTAL"],
                        r["GIIP_GAS"], r["GIIP_TOTAL"])
        for r in out.collect()
    }
    assert got["CURRENTLY IN PLACE"] == (0.0, 0.0, 10476036.0,
                                         1815774165.0, 1815774165.0)
    assert got["OUTFLOW THROUGH WELLS"] == (None, 0.0, 0.0, None, 0.0)
    assert got["MATERIAL BALANCE ERROR."] == (None, -0.0, 0.0, None, 0.0)
    assert got["ORIGINALLY IN PLACE"] == (0.0, 0.0, 10476036.0,
                                          1815774165.0, 1815774165.0)


ROGUE_PRT = """
                                                =================================
                                                : FIPNUM  REPORT REGION  120    :
                                                :     PAV =        298.89  BARSA:
                                                :     PORV=      4502843.   RM3 :
                           :--------------- OIL    SM3  ---------------:-- WAT    SM3  -:--------------- GAS    SM3  ---------------:
                           :     LIQUID         VAPOUR         TOTAL   :       TOTAL    :       FREE      DISSOLVED         TOTAL   :
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :CURRENTLY IN PLACE       :     -2703242.        10451.      -2692791.:       2568336. :     59233087. 190842667352.  190901900439.:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
 :OUTFLOW TO OTHER REGIONS :       294586.         6362.        300947.:       1235671. :     39452538.     51855907.      91308445.:
 :OUTFLOW THROUGH WELLS    :                                     65430.:      -1818966. :                                 -85526625.:
 :MATERIAL BALANCE ERROR.  :                                   3419391.:        671761. :                              *************:
 :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
"""  # noqa: E501


def test_rogue_eclipse_output(spark, tmp_path):
    """Stars in the material-balance line (observed in real output)
    must become NULL, not crash the float parse."""
    out = _df(spark, tmp_path, ROGUE_PRT)
    mbe = out.filter("DATATYPE = 'MATERIAL BALANCE ERROR.'").first()
    assert mbe["GIIP_TOTAL"] is None
    assert mbe["STOIIP_TOTAL"] == 3419391.0
    cur = out.filter("DATATYPE = 'CURRENTLY IN PLACE'").first()
    assert cur["REGION"] == 120
    assert cur["ASSOCIATEDGAS_OIL"] == 190842667352.0


OPMFLOW_PRT = """
Starting time step 3, stepsize 19.6 days, at day 11.4/31, date = 12-Jan-2000

                                                  ===================================================
                                                  :        FIPNUM report region   1                 :
                                                  :      PAV  =       306.192 BARSA                 :
                                                  :      PORV =      78804306   RM3                 :
                         :--------------- Oil    SM3 ---------------:-- Wat    SM3 --:--------------- Gas    SM3 ---------------:
                         :      Liquid        Vapour        Total   :      Total     :      Free        Dissolved       Total   :
:------------------------:------------------------------------------:----------------:------------------------------------------:
:Currently   in place    :      16528782             0      16528782:     60416351   :             0             0             0:
:------------------------:------------------------------------------:----------------:------------------------------------------:
:Originally  in place    :      16530271             0      16530271:     60415965   :             0             0             0:
:========================:==========================================:================:==========================================:
"""  # noqa: E501


def test_prtstring_opmflow(spark, tmp_path):
    out = _df(spark, tmp_path, OPMFLOW_PRT)
    rows = sorted(_rows(out), key=str)
    assert rows == sorted([
        (datetime.date(2000, 1, 12), "FIPNUM", 1, "CURRENTLY IN PLACE",
         None, 16528782.0, 0.0, 16528782.0, 60416351.0, 0.0, 0.0, 0.0),
        (datetime.date(2000, 1, 12), "FIPNUM", 1, "ORIGINALLY IN PLACE",
         None, 16530271.0, 0.0, 16530271.0, 60415965.0, 0.0, 0.0, 0.0),
    ], key=str)
