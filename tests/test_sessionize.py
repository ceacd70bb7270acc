"""Sessionization: batch gap-sessionizer vs a pandas reference, the
exact boundary contract, agreement with native session_window streaming,
and the single-exchange plan shape."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from res2df_spark.operators.sessionize import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(i), k, T0 + dt.timedelta(seconds=s), float(v)) for i, (k, s, v) in enumerate(rows)],
        "event_id long, user string, ts timestamp, value double",
    )


def _pandas_sessions(rows, gap):
    """Reference: per key, sorted by (ts, event_id); new session when
    the gap is >= the threshold (session_window overlap semantics)."""
    df = pd.DataFrame(
        [(i, k, T0 + dt.timedelta(seconds=s), v) for i, (k, s, v) in enumerate(rows)],
        columns=["event_id", "user", "ts", "value"],
    )
    out = {}
    for k, g in df.sort_values(["ts", "event_id"]).groupby("user"):
        sid, prev = 0, None
        for _, r in g.iterrows():
            if prev is None or (r.ts - prev).total_seconds() >= gap:
                sid += 1
            prev = r.ts
            out[r.event_id] = (k, sid)
    return out


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=50_000),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([60, 3600, 7200]),
)
@settings(max_examples=12, deadline=None)
def test_sessionize_matches_pandas_reference(spark, rows_in, gap):
    df = _mk(spark, rows_in)
    got = {
        r.event_id: (r.user, r.session_id)
        for r in sessionize(df, "ts", ["user"], gap, tiebreak=["event_id"]).collect()
    }
    assert got == _pandas_sessions(rows_in, gap)


def test_boundary_is_exclusive_of_gap(spark):
    # second event exactly gap later -> NEW session; 1 us under -> same
    df = _mk(spark, [("u", 0, 1), ("u", 3600, 1), ("u", 3600 + 3599, 1)])
    s = sessionize(df, "ts", ["user"], 3600, tiebreak=["event_id"])
    got = {r.event_id: r.session_id for r in s.collect()}
    assert got == {0: 1, 1: 2, 2: 2}


def test_session_stats_rollup(spark):
    df = _mk(spark, [("u", 0, 1.0), ("u", 100, 2.0), ("u", 9000, 4.0), ("v", 0, 8.0)])
    out = {
        (r.user, r.session_id): (r.n_events, r.total_value)
        for r in session_stats(df, "ts", ["user"], 3600, value_col="value").collect()
    }
    assert out == {("u", 1): (2, 3.0), ("u", 2): (1, 4.0), ("v", 1): (1, 8.0)}


def test_batch_and_streaming_sessions_agree(spark, tmp_path):
    from res2df_spark.streaming.ops import run_available_now, session_rollup_stream

    rows = [("u", s, 1.0) for s in (0, 100, 4000, 20_000, 20_050)] + [
        ("v", s, 2.0) for s in (0, 5000, 5001)
    ]
    df = _mk(spark, rows)
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    stream = run_available_now(
        session_rollup_stream(src, "ts", ["user"], "value", gap="1 hour", watermark="1 day"),
        name="t_sessions",
    )
    got = sorted(
        (r.user, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in stream.collect()
    )
    batch = session_stats(df, "ts", ["user"], 3600, value_col="value", tiebreak=["event_id"])
    want = sorted(
        (
            r.user,
            r.session_start,
            r.session_end + dt.timedelta(hours=1),
            r.n_events,
            r.total_value,
        )
        for r in batch.collect()
    )
    assert got == want


def test_session_stats_single_exchange(spark):
    df = _mk(spark, [("u", 0, 1.0), ("u", 100, 2.0)])
    plan = (
        session_stats(df, "ts", ["user"], 3600, value_col="value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle: the lag/sum window and the groupBy share the
    # hash-partitioning on the session key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sessionize_null_timestamps_get_null_session(spark):
    from res2df_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [("u", None, 1), ("u", None, 2), ("u", "2020-01-01 00:00:00", 3),
         ("u", "2020-01-01 10:00:00", 4)],
        "u string, ts string, eid int",
    ).selectExpr("u", "cast(ts as timestamp) as ts", "eid")
    out = {r["eid"]: r["session_id"] for r in sessionize(
        df, ts_col="ts", keys=["u"], gap_seconds=1800,
        session_col="session_id", tiebreak=["eid"],
    ).collect()}
    assert out[1] is None and out[2] is None
    assert out[3] == 1 and out[4] == 2  # real sessions start at 1
