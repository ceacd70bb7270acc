"""Equivalence tests for the skew-safe chunked variants (round 6):
sessionize_chunked / rolling_agg_chunked must equal their plain-window
forms row-for-row on any input, including chunk-boundary and NULL-ts
edge cases, and dedup_keep_agg must equal dedup_keep on totally-ordered
keys."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from res2df_spark.operators.eventanalytics import rolling_agg, rolling_agg_chunked
from res2df_spark.operators.sessionize import sessionize, sessionize_chunked
from res2df_spark.operators.windows import dedup_keep, dedup_keep_agg


def _events(spark, n=500, n_users=7, seed=11, with_nulls=True):
    rng = random.Random(seed)
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        # clustered gaps so sessions actually split, plus exact-boundary
        # and equal-timestamp collisions
        step = rng.choice([1, 5, 30, 600, 3600, 3600, 7200, 0])
        base = base + timedelta(seconds=step)
        ts = base if not (with_nulls and rng.random() < 0.02) else None
        rows.append((i, rng.randrange(n_users), ts, float(rng.randrange(100))))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _collect(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sessionize_chunked_equals_plain(spark):
    ev = _events(spark)
    cols = ["event_id", "session_id"]
    plain = sessionize(ev, "ts", ["user_id"], 3600, tiebreak=["event_id"])
    for chunk_s in (3600, 5000, 7200, 10**7):  # incl. chunk == gap and one-chunk
        chunked = sessionize_chunked(
            ev, "ts", ["user_id"], 3600, chunk_seconds=chunk_s,
            tiebreak=["event_id"],
        )
        assert _collect(chunked, cols) == _collect(plain, cols), chunk_s


def test_sessionize_chunked_null_ts_and_validation(spark):
    ev = _events(spark, with_nulls=True)
    out = sessionize_chunked(
        ev, "ts", ["user_id"], 3600, chunk_seconds=7200, tiebreak=["event_id"]
    )
    null_ids = [r["session_id"] for r in out.filter(F.col("ts").isNull()).collect()]
    assert null_ids and all(v is None for v in null_ids)
    assert out.count() == ev.count()
    with pytest.raises(ValueError, match="chunk_seconds"):
        sessionize_chunked(ev, "ts", ["user_id"], 3600, chunk_seconds=1800)


def test_rolling_chunked_equals_plain(spark):
    ev = _events(spark)
    cols = ["event_id", "n_window", "sum_window"]
    plain = rolling_agg(
        ev.filter(F.col("ts").isNotNull()), "ts", ["user_id"], "value", 1800,
        round_digits=2,
    )
    for chunk_s in (1800, 2500, 3600, 10**7):
        chunked = rolling_agg_chunked(
            ev.filter(F.col("ts").isNotNull()), "ts", ["user_id"], "value",
            1800, chunk_seconds=chunk_s, round_digits=2,
        )
        assert _collect(chunked, cols) == _collect(plain, cols), chunk_s


def test_rolling_chunked_null_ts_and_validation(spark):
    ev = _events(spark, with_nulls=True)
    out = rolling_agg_chunked(
        ev, "ts", ["user_id"], "value", 1800, chunk_seconds=3600
    )
    # NULL-ts rows aggregate over the key's NULL peer group — the plain
    # form's RANGE-window semantics (row-identical, see
    # test_round6_review.test_rolling_chunked_null_ts_matches_plain)
    nulls = out.filter(F.col("ts").isNull()).collect()
    assert nulls and all(r["n_window"] >= 1 for r in nulls)
    assert out.count() == ev.count()
    plain = rolling_agg(ev, "ts", ["user_id"], "value", 1800)
    cols = ["event_id", "n_window", "sum_window"]
    assert _collect(out, cols) == _collect(plain, cols)
    with pytest.raises(ValueError, match="chunk_seconds"):
        rolling_agg_chunked(ev, "ts", ["user_id"], "value", 3600, chunk_seconds=60)


def test_rolling_chunked_exact_boundary_halo(spark):
    """A frame anchored at a chunk start must still see a row exactly
    window_seconds back (the halo's inclusive edge)."""
    rows = [
        (0, 1, datetime(2024, 1, 1, 0, 59, 0), 10.0),   # chunk 0, in halo
        (1, 1, datetime(2024, 1, 1, 1, 0, 0), 5.0),     # chunk 1 start
        (2, 1, datetime(2024, 1, 1, 1, 58, 59), 2.0),   # reaches only #1
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["n_window"], r["sum_window"])
        for r in rolling_agg_chunked(
            ev, "ts", ["user_id"], "value", 3600, chunk_seconds=3600
        ).collect()
    }
    assert got[1] == (2, 15.0)  # halo row visible across the boundary
    assert got[2] == (3, 17.0)  # 3599s back is still inside the frame


def test_dedup_keep_agg_equals_window(spark):
    ev = _events(spark, with_nulls=False)
    cols = ev.columns
    for keep in ("first", "last"):
        w = dedup_keep(ev, ["user_id"], ["ts", "event_id"], keep=keep)
        a = dedup_keep_agg(ev, ["user_id"], ["ts", "event_id"], keep=keep)
        assert _collect(a, cols) == _collect(w, cols), keep
    with pytest.raises(ValueError, match="keep"):
        dedup_keep_agg(ev, ["user_id"], ["ts"], keep="middle")
