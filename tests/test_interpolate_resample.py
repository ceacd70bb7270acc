"""Interpolation (P11/A8) and time resampling (W8)."""

from __future__ import annotations

from datetime import date

import pytest

from res2df_spark.operators.interpolate import interpolate_linear
from res2df_spark.operators.resample import (
    date_spine,
    resample_asof,
    spine_from_observations,
)
from tests.conftest import rows


def test_interpolate_inside_only(spark):
    df = spark.createDataFrame(
        [
            ("s", 0.0, None),   # leading NULL stays NULL
            ("s", 1.0, 10.0),
            ("s", 2.0, None),   # inside → interpolated
            ("s", 3.0, None),
            ("s", 4.0, 40.0),
            ("s", 5.0, None),   # trailing NULL stays NULL
        ],
        "k string, x double, y double",
    )
    out = interpolate_linear(df, "x", "y", partition_by=["k"], out_col="f")
    got = dict((r[0], r[1]) for r in rows(out, "x", "f"))
    assert got[0.0] is None and got[5.0] is None
    assert got[1.0] == 10.0 and got[4.0] == 40.0
    assert got[2.0] == pytest.approx(20.0)
    assert got[3.0] == pytest.approx(30.0)


def test_interpolate_irregular_x(spark):
    df = spark.createDataFrame(
        [("s", 0.0, 0.0), ("s", 10.0, 100.0), ("s", 2.5, None)],
        "k string, x double, y double",
    )
    out = interpolate_linear(df, "x", "y", partition_by=["k"], out_col="f")
    got = dict((r[0], r[1]) for r in rows(out, "x", "f"))
    assert got[2.5] == pytest.approx(25.0)


def test_date_spine(spark):
    out = date_spine(spark, "2020-01-15", "2020-04-02", freq="monthly")
    got = [r[0] for r in rows(out, "DATE")]
    assert got == [
        date(2020, 1, 1),
        date(2020, 2, 1),
        date(2020, 3, 1),
        date(2020, 4, 1),
        date(2020, 5, 1),  # end rolled forward one period
    ]


def _obs(spark):
    # cumulative-style observations for one vector
    return spark.createDataFrame(
        [
            ("FOPT", date(2020, 1, 1), 0.0),
            ("FOPT", date(2020, 3, 1), 60.0),
            ("FOPT", date(2020, 5, 1), 100.0),
        ],
        "vec string, DATE date, val double",
    )


def test_resample_linear(spark):
    # linear-in-time: 2020-02-01 sits 31/60 of the way 1 Jan → 1 Mar
    obs = _obs(spark)
    spine = date_spine(spark, "2020-01-01", "2020-04-01", freq="monthly")
    out = resample_asof(obs, spine, keys=["vec"], date_col="DATE", value_col="val", how="linear")
    got = dict((r[0], r[1]) for r in rows(out, "DATE", "val"))
    assert got[date(2020, 1, 1)] == 0.0
    assert got[date(2020, 2, 1)] == pytest.approx(60.0 * 31 / 60)
    assert got[date(2020, 3, 1)] == 60.0
    assert got[date(2020, 4, 1)] == pytest.approx(60 + 40 * 31 / 61)
    # the requested range ENDS 2020-04-01 (on the boundary): rollforward
    # keeps it — no extrapolated May row beyond the asked-for spine
    assert date(2020, 5, 1) not in got


def test_resample_bfill_rate_semantics(spark):
    # rate vectors take the next observation's value (valid backwards)
    obs = _obs(spark)
    spine = date_spine(spark, "2020-01-01", "2020-04-01", freq="monthly")
    out = resample_asof(obs, spine, keys=["vec"], date_col="DATE", value_col="val", how="bfill")
    got = dict((r[0], r[1]) for r in rows(out, "DATE", "val"))
    assert got[date(2020, 2, 1)] == 60.0
    assert got[date(2020, 4, 1)] == 100.0
    assert got[date(2020, 1, 1)] == 0.0  # exact hit takes the observation


def test_spine_from_observations(spark):
    obs = _obs(spark)
    spine = spine_from_observations(obs, "DATE", freq="monthly")
    got = [r[0] for r in rows(spine, "DATE")]
    assert got[0] == date(2020, 1, 1)
    # max obs 2020-05-01 is ON the month boundary: rollforward keeps it
    # (the reference's offset.rollforward), no fabricated June row
    assert got[-1] == date(2020, 5, 1)


def test_resample_asof_null_date_observation_ignored(spark):
    """A NULL-date observation must contribute neither value nor x —
    the desynchronized (prev_y, prev_x) pair used to emit its value
    verbatim at spine dates."""
    from res2df_spark.operators.resample import resample_asof

    obs = spark.createDataFrame(
        [("k", None, 99.0), ("k", "2020-02-01", 5.0)],
        "k string, DATE string, v double",
    ).selectExpr("k", "cast(DATE as timestamp) as DATE", "v")
    spine = spark.createDataFrame([("2020-01-01",)], "DATE string").selectExpr(
        "cast(DATE as timestamp) as DATE"
    )
    out = resample_asof(obs, spine, keys=["k"], date_col="DATE", value_col="v")
    assert [r["v"] for r in out.collect()] == [5.0]  # not the phantom 99


def test_interpolate_linear_null_x_row_keeps_own_value(spark):
    from pyspark.sql import functions as F

    from res2df_spark.operators.interpolate import interpolate_linear

    df = spark.createDataFrame(
        [("p", 1.0, 10.0), ("p", None, 99.0), ("p", 3.0, 30.0), ("p", 2.0, None)],
        "p string, x double, y double",
    )
    out = {r["x"]: r["y"] for r in interpolate_linear(
        df, x_col="x", y_col="y", partition_by=["p"]
    ).collect()}
    assert out[2.0] == 20.0   # interpolated from (1,10)-(3,30), not via 99
    assert out[None] == 99.0  # NULL-x row keeps its own value
