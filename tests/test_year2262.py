"""Long-horizon simulations past pandas' datetime64[ns] year-2262 limit.

The reference degrades such frames to object dtype
(/root/reference/src/res2df/summary.py:130-192,626-639 — fallback date
rolls/ranges plus object-dtype columns).  The Spark engine is µs-based
(dates to year 9999), so the in-engine paths need no fallback; the one
hard boundary is Arrow→pandas at the driver, covered by
``to_pandas_datesafe``.
"""

from __future__ import annotations

import datetime as dt
from datetime import date

import pandas as pd
from pyspark.sql import functions as F

from res2df_spark.operators.resample import resample_asof, spine_from_observations
from res2df_spark.sinks.writers import to_pandas_datesafe
from res2df_spark.sources.deck import parse_deck


def test_deck_tstep_past_2262():
    """The date cursor is plain datetime arithmetic — a TSTEP run that
    crosses 2262 keeps exact dates (reference needs _fallback_date_roll
    for this)."""
    deck = """
START
  1 JAN 2260 /
TSTEP
  365 365 365 365 /
"""
    recs = parse_deck(deck)
    assert recs[-1]["DATE"] == date(2260, 1, 1) + dt.timedelta(days=4 * 365)
    assert recs[-1]["DATE"].year == 2263


def test_resample_linear_past_2262(spark):
    obs = spark.createDataFrame(
        [("FOPT", date(2260, 1, 1), 0.0), ("FOPT", date(2300, 1, 1), 14610.0)],
        "VECTOR string, DATE date, VALUE double",
    )
    spine = spine_from_observations(obs, "DATE", freq="yearly")
    out = resample_asof(obs, spine, ["VECTOR"], "DATE", "VALUE", how="linear")
    rows = {r["DATE"].year: r["VALUE"] for r in out.collect()}
    assert max(rows) >= 2300
    # linear in time: midpoint of the 40-year ramp
    assert abs(rows[2280] - 7305.0) < 1e-6
    # collecting the (date-typed) result degrades to object dtype, like
    # the reference's fallback frames
    pdf = out.toPandas()
    assert pdf["DATE"].dtype == object
    assert isinstance(pdf["DATE"].iloc[0], date)


def test_to_pandas_datesafe_out_of_range(spark):
    df = spark.sql(
        "SELECT * FROM VALUES "
        "(1, to_timestamp('2500-06-01 12:00:00')), "
        "(2, to_timestamp('2260-01-01 00:00:00')), "
        "(3, NULL) AS t(id, ts)"
    )
    pdf = to_pandas_datesafe(df).sort_values("id")
    assert pdf["ts"].dtype == object
    assert pdf["ts"].iloc[0] == dt.datetime(2500, 6, 1, 12)
    assert pdf["ts"].iloc[2] is None or pd.isna(pdf["ts"].iloc[2])


def test_to_pandas_datesafe_in_range_passthrough(spark):
    df = spark.sql("SELECT to_timestamp('2020-06-01 12:00:00') AS ts")
    pdf = to_pandas_datesafe(df)
    assert str(pdf["ts"].dtype).startswith("datetime64")
