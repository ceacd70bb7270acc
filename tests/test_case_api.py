"""User API: ResdataCase — the reference's test_userapi.py pattern
(one case object, every datatype frame derives from it) against the
EIGHTCELLS fixture case."""

from __future__ import annotations

import os

import pytest

from res2df_spark.case import ResdataCase

_EIGHT = "/root/reference/tests/data/eightcells"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_EIGHT), reason="fixtures not present"
)


@pytest.fixture(scope="module")
def case(spark):
    return ResdataCase(spark, f"{_EIGHT}/EIGHTCELLS.DATA")


def test_userapi_deck_frames(case):
    compdat = case.compdat()
    assert compdat.count() > 0
    assert {"WELL", "I", "J", "K1", "K2", "OP/SH"} <= set(compdat.columns)
    sat = case.satfunc()
    assert sat is not None and sat.count() > 0
    pvt = case.pvt()
    assert pvt is not None and pvt.count() > 0
    eq = case.equil()
    assert eq is not None and eq.count() > 0


def test_userapi_binary_frames(case):
    grid = case.grid()
    assert grid.count() == 8  # 2x2x2, all active
    assert "PORO" in grid.columns
    grst = case.grid(rstdates="last")
    # restart vectors stacked on (the eightcells UNRST carries SWAT/SGAS)
    assert grst.count() >= 8
    smry = case.summary()
    assert smry.count() > 0 and "DATE" in smry.columns
    rft = case.rft()
    assert rft.count() > 0


def test_userapi_zonemap_and_aggregate(case):
    zmap = case.get_zonemap()  # zones.lyr ships with the fixture
    assert zmap.count() > 0
    wcd = case.wellcompletiondata()
    assert {"WELL", "ZONE", "DATE", "OP/SH", "KH"} <= set(wcd.columns)
    with pytest.raises(FileNotFoundError):
        case.get_zonemap("no_such.lyr")


def test_userapi_hcpv_pattern(case):
    """The reference's showcase calculation: per-region pore-volume
    arithmetic straight on the frame (test_userapi.py:42-47)."""
    from pyspark.sql import functions as F

    grst = case.grid(rstdates="last")
    if "SWAT" not in grst.columns or "PORV" not in grst.columns:
        pytest.skip("fixture lacks SWAT/PORV")
    hcpv = grst.withColumn(
        "HCPV", (1 - F.col("SWAT")) * F.col("PORV")
    ).agg(F.sum("HCPV").alias("t")).first()["t"]
    assert hcpv is not None and hcpv > 0


_REEK = "/root/reference/tests/data/reek/eclipse/model/2_R001_REEK-0.DATA"


@pytest.mark.skipif(not os.path.isfile(_REEK), reason="fixtures not present")
def test_userapi_reek_parity(spark):
    """Full-field case through the facade, pinned to the reference's
    own reek expectations: grid.df == 35817 active cells
    (test_grid.py:364), satfunc.df == 76 rows (test_satfunc.py:42);
    the deck resolves through five INCLUDE files."""
    case = ResdataCase(spark, _REEK)
    assert case.grid().count() == 35817
    sat = case.satfunc()
    assert sat is not None and sat.count() == 76
    assert case.compdat().count() > 0
    assert case.gruptree().count() > 0
    zmap = case.get_zonemap()  # zones.lyr ships with the reek model
    assert zmap.count() > 0


@pytest.mark.skipif(not os.path.isfile(_REEK), reason="fixtures not present")
def test_userapi_reek_prt_parity(spark):
    """The real Eclipse and OPM flow PRT files, pinned to the
    reference's own expectations (test_fipreports.py:18-40): Eclipse
    PRT → 6 regions, 1 date, 5 datatypes; the OPM file → 530 rows over
    38 dates and regions {1..6}."""
    from res2df_spark.modules import fipreports

    case = ResdataCase(spark, _REEK)
    fip = case.fipreports()
    assert fip.select("REGION").distinct().count() == 6
    assert fip.select("DATE").distinct().count() == 1
    assert fip.select("DATATYPE").distinct().count() == 5
    opm = fipreports.df(
        spark, os.path.join(os.path.dirname(_REEK), "2_R001_REEK-0-OPMFLOW.PRT")
    )
    assert opm.count() == 530
    assert opm.select("DATE").distinct().count() == 38
    assert {r[0] for r in opm.select("REGION").distinct().collect()} == set(
        range(1, 7)
    )


@pytest.mark.skipif(not os.path.isfile(_REEK), reason="fixtures not present")
def test_userapi_reek_pillars_parity(spark):
    """Pillar statistics over the 40x64 reek grid: 2560 pillars, the
    reference's exact count (test_pillars.py:30)."""
    case = ResdataCase(spark, _REEK)
    assert case.pillars().count() == 2560


def test_userapi_porv_invariant(case):
    """The reference's PORV sanity invariant (test_grid.py:191-197):
    our 6-tetrahedron cell VOLUME times INIT PORO must reproduce the
    simulator's own PORV within 1e-5 relative — an independent check
    of the corner-point geometry decode."""
    from pyspark.sql import functions as F

    g = case.grid()
    rel = g.agg(
        (
            F.abs(F.sum(F.col("PORO") * F.col("VOLUME") - F.col("PORV")))
            / F.sum("PORV")
        ).alias("rel")
    ).first()["rel"]
    assert rel < 1e-5


@pytest.mark.skipif(not os.path.isfile(_REEK), reason="fixtures not present")
def test_userapi_reek_gruptree_parity(spark):
    """Reference test_gruptree.py:36-50 on reek: 5 snapshot dates,
    11 distinct children, 3 distinct parents."""
    from pyspark.sql import functions as F

    case = ResdataCase(spark, _REEK)
    g = case.gruptree()
    assert g.select("DATE").distinct().count() == 5
    assert g.select("CHILD").distinct().count() == 11
    assert (
        g.filter(F.col("PARENT").isNotNull())
        .select("PARENT").distinct().count() == 3
    )
