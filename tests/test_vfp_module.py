"""VFP module: VFPPROD/VFPINJ parse + melt (S10/R7)."""

from __future__ import annotations

from res2df_spark.modules import vfp
from tests.conftest import rows

VFP_DECK = """
VFPPROD
  1 3000.0 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'METRIC' 'BHP' /
  100 200 300 /
  10 20 /
  0.0 0.5 /
  0.0 /
  0.0 /
  1 1 1 1  500 450 400 /
  2 1 1 1  600 550 500 /
  1 2 1 1  510 460 410 /
  2 2 1 1  610 560 510 /

VFPINJ
  2 2500.0 'WAT' 'THP' 'METRIC' 'BHP' /
  50 150 /
  5 15 /
  1  300 280 /
  2  350 330 /
"""


def test_vfpprod_melt(spark):
    out = vfp.df_prod(spark, VFP_DECK)
    got = rows(out, "TABLE", "THP", "WFR", "RATE", "BHP")
    assert len(got) == 12  # 2 thp × 2 wfr × 3 rates
    assert (1, 10.0, 0.0, 100.0, 500.0) in got
    assert (1, 20.0, 0.0, 300.0, 500.0) in got
    assert (1, 10.0, 0.5, 200.0, 460.0) in got
    assert (1, 20.0, 0.5, 100.0, 610.0) in got
    # axes metadata
    assert out.select("DATUM").distinct().first()[0] == 3000.0


def test_vfpinj_melt(spark):
    out = vfp.df_inj(spark, VFP_DECK)
    got = rows(out, "TABLE", "THP", "RATE", "BHP")
    assert got == [
        (2, 5.0, 50.0, 300.0),
        (2, 5.0, 150.0, 280.0),
        (2, 15.0, 50.0, 350.0),
        (2, 15.0, 150.0, 330.0),
    ]


def test_vfpinj_out_of_range_index_raises(spark):
    import pytest as _pytest

    from res2df_spark.modules.vfp import df_inj

    deck = """
VFPINJ
  1 3000.0 /
  100.0 200.0 /
  40.0 80.0 /
  0 1500.0 1600.0 /
"""
    with _pytest.raises(ValueError, match="THP index 0"):
        df_inj(spark, deck)
