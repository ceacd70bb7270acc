"""Grid family: neighbour pairs, trans/interface agg, NNC, pillars."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from res2df_spark.modules.grid import (
    boundary_filter,
    contact_estimate,
    interface_aggregate,
    merge_initvectors,
    neighbor_pairs,
    nnc_coordinates,
    pillar_stats,
    vertical_nnc_filter,
)
from tests.conftest import rows


def _grid(spark):
    # 2×1×2 grid with FIPNUM split along I
    cells = [
        (1, 1, 1, 1, 10.0, 100.0, 0.2),
        (1, 1, 2, 1, 20.0, 110.0, 0.3),
        (2, 1, 1, 2, 10.5, 120.0, 0.6),
        (2, 1, 2, 2, 20.5, 130.0, 0.7),
    ]
    return spark.createDataFrame(
        cells, "I int, J int, K int, FIPNUM int, Z double, VOLUME double, SWAT double"
    )


def test_merge_initvectors(spark):
    grid = _grid(spark)
    init = spark.createDataFrame(
        [(1, 1, 1, 500.0), (2, 1, 2, 700.0)], "I int, J int, K int, PERMX double"
    )
    out = merge_initvectors(grid, init)
    assert out.count() == 2
    assert {r.PERMX for r in out.collect()} == {500.0, 700.0}


def test_neighbor_pairs_directions(spark):
    grid = _grid(spark)
    pairs = neighbor_pairs(grid.select("I", "J", "K", "FIPNUM"), directions="IK")
    got = rows(pairs, "DIR", "I1", "K1", "I2", "K2")
    # I-direction: (1,*,k)→(2,*,k); K-direction: (i,*,1)→(i,*,2)
    assert ("I", 1, 1, 2, 1) in got
    assert ("I", 1, 2, 2, 2) in got
    assert ("K", 1, 1, 1, 2) in got
    assert ("K", 2, 1, 2, 2) in got
    assert len(got) == 4


def test_boundary_and_interface(spark):
    grid = _grid(spark)
    pairs = neighbor_pairs(
        grid.select("I", "J", "K", "FIPNUM").withColumn("TRAN", F.lit(2.0)),
        directions="IK",
    )
    cross = boundary_filter(pairs, "FIPNUM")
    assert cross.count() == 2  # only the two I-direction pairs cross 1|2
    agg = interface_aggregate(cross, "FIPNUM", "TRAN1")
    got = rows(agg, "INTERFACE", "SUM_TRAN1", "N_PAIRS")
    assert got == [("1-2", 4.0, 2)]


def test_nnc_coordinates_midpoint(spark):
    geom = spark.createDataFrame(
        [(1, 1, 1, 100.0), (5, 5, 5, 300.0)], "I int, J int, K int, Z double"
    )
    nnc = spark.createDataFrame(
        [(1, 1, 1, 5, 5, 5, 0.1), (1, 1, 1, 9, 9, 9, 0.2)],
        "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRAN double",
    )
    out = nnc_coordinates(nnc, geom, coord_cols=("Z",))
    got = {(r.I2): r.Z_MID for r in out.collect()}
    assert got[5] == pytest.approx(200.0)  # midpoint
    assert got[9] == pytest.approx(100.0)  # one side missing → coalesce


def test_vertical_nnc_filter(spark):
    nnc = spark.createDataFrame(
        [(1, 1, 1, 1, 1, 3), (1, 1, 1, 2, 1, 1)],
        "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int",
    )
    assert vertical_nnc_filter(nnc).count() == 1


def test_pillar_stats(spark):
    grid = _grid(spark).withColumn("PORV", F.col("VOLUME") * 0.25)
    out = pillar_stats(grid)
    got = {r.PILLAR: r for r in out.collect()}
    assert got["1-1"].VOLUME_SUM == pytest.approx(210.0)
    assert got["1-1"].Z_AVG == pytest.approx(15.0)
    assert got["1-1"].PORO_WMEAN == pytest.approx(0.25)


def test_contact_estimate(spark):
    out = contact_estimate(_grid(spark), sat_col="SWAT", cutoff=0.5)
    got = rows(out, "PILLAR", "CONTACT_Z", "N_CELLS")
    # only pillar 2-1 has SWAT>0.5; the reference contact is the
    # DEEPEST such cell (max Z, pillars.py:260-281)
    assert got == [("2-1", 20.5, 2)]


def test_trans_df_emits_absent_neighbor_faces(spark):
    """Reference trans.py:106-135 synthesizes the neighbour address —
    a TRANX>0 cell emits its face row even when (I+1,J,K) is not in
    the grid frame (inactive neighbour)."""
    from res2df_spark.modules.grid import trans_df

    grid = spark.createDataFrame(
        [(1, 1, 1, 2.5, 0.0, None)],
        "I int, J int, K int, TRANX double, TRANY double, TRANZ double",
    )
    got = trans_df(grid).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["I1"], r["I2"], r["DIR"], r["TRAN"]) == (1, 2, "I", 2.5)
