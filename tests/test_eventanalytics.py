"""Event analytics: rolling windows vs a pandas reference, funnel
ordering semantics, retention cohort grid."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from res2df_spark.operators.eventanalytics import (
    funnel_counts,
    funnel_steps,
    retention_cohorts,
    rolling_agg,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (int(i), u, T0 + dt.timedelta(seconds=s), ty, float(v))
            for i, (u, s, ty, v) in enumerate(rows)
        ],
        "event_id long, user string, ts timestamp, type string, value double",
    )


def test_rolling_agg_matches_pandas(spark):
    rows = [("u", s, "x", s) for s in (0, 10, 3600, 3610, 3611, 7300)] + [
        ("v", 5, "x", 1.0)
    ]
    df = _events(spark, rows)
    got = {
        r.event_id: (r.n_window, r.sum_window)
        for r in rolling_agg(df, "ts", ["user"], "value", 3600).collect()
    }
    pdf = pd.DataFrame(
        [(i, u, s, v) for i, (u, s, _, v) in enumerate(rows)],
        columns=["event_id", "user", "s", "value"],
    )
    for _, r in pdf.iterrows():
        frame = pdf[
            (pdf.user == r.user) & (pdf.s >= r.s - 3600) & (pdf.s <= r.s)
        ]
        assert got[r.event_id] == (len(frame), round(frame.value.sum(), 2)), r.event_id


def test_rolling_window_boundary_inclusive(spark):
    # event exactly window_seconds earlier IS in the frame
    df = _events(spark, [("u", 0, "x", 1.0), ("u", 3600, "x", 2.0)])
    got = {r.event_id: r.n_window for r in rolling_agg(df, "ts", ["user"], "value", 3600).collect()}
    assert got == {0: 1, 1: 2}


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes in order
        ("u1", 0, "view", 0), ("u1", 10, "click", 0), ("u1", 20, "purchase", 0),
        # u2 clicked BEFORE viewing: chain breaks at click
        ("u2", 50, "view", 0), ("u2", 10, "click", 0),
        # u3 views only
        ("u3", 0, "view", 0),
        # u4 purchase without view: not even step 1
        ("u4", 0, "purchase", 0),
    ]
    df = _events(spark, rows)
    per_user = {
        r.user: r.n_steps
        for r in funnel_steps(df, "ts", "user", "type", ["view", "click", "purchase"]).collect()
    }
    assert per_user == {"u1": 3, "u2": 1, "u3": 1}
    counts = {
        r.step: r.n_users
        for r in funnel_counts(df, "ts", "user", "type", ["view", "click", "purchase"]).collect()
    }
    assert counts == {1: 3, 2: 1, 3: 1}


def test_funnel_uses_earliest_valid_chain(spark):
    # click before the first view must be ignored; the later click counts
    rows = [
        ("u", 100, "view", 0),
        ("u", 50, "click", 0),   # too early
        ("u", 200, "click", 0),  # valid
    ]
    df = _events(spark, rows)
    row = funnel_steps(df, "ts", "user", "type", ["view", "click"]).collect()[0]
    assert row.t_1 == T0 + dt.timedelta(seconds=200)


def test_retention_cohorts(spark):
    day = 86_400
    rows = [
        ("a", 0, "x", 0), ("a", day + 5, "x", 0), ("a", 3 * day, "x", 0),
        ("b", day, "x", 0), ("b", day + 100, "x", 0),
    ]
    df = _events(spark, rows)
    got = {
        (r.cohort_day, r.day_offset): r.n_active
        for r in retention_cohorts(df, "ts", "user").collect()
    }
    d0 = T0
    d1 = T0 + dt.timedelta(days=1)
    assert got == {(d0, 0): 1, (d0, 1): 1, (d0, 3): 1, (d1, 0): 1}


def test_funnel_accumulator_reuses_partitioning(spark):
    df = _events(spark, [("u", 0, "view", 0), ("u", 1, "click", 0)])
    plan = (
        funnel_steps(df, "ts", "user", "type", ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # 3 steps: one exchange per filtered event slice (3) is allowed,
    # but the accumulating side must not re-shuffle per step on top of
    # that — cap the total well below the naive 2-per-round shape
    assert plan.count("Exchange hashpartitioning") <= 4, plan
