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


def test_funnel_stream_matches_batch_across_microbatches(spark, tmp_path):
    from res2df_spark.streaming.ops import funnel_stream, run_available_now

    # split the events into two files; maxFilesPerTrigger=1 forces TWO
    # micro-batches, so the funnel state must survive the batch boundary
    early = [("u", 0, "view", 0), ("u", 10, "click", 0), ("v", 5, "view", 0)]
    late = [("u", 20, "purchase", 0), ("v", 2, "click", 0), ("v", 30, "click", 0)]
    d1, d2 = _events(spark, early), _events(spark, late)
    path = str(tmp_path / "ev")
    d1.coalesce(1).write.parquet(path)
    d2.coalesce(1).write.mode("append").parquet(path)
    src = (
        spark.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_available_now(
        funnel_stream(src, "ts", "user", "type", ["view", "click", "purchase"]),
        name="t_funnel_stream",
        output_mode="append",
    )
    got = sorted((r.user, r.step, r.ts) for r in out.collect())
    # batch reference over the union
    batch = funnel_steps(
        d1.unionByName(d2), "ts", "user", "type", ["view", "click", "purchase"]
    )
    want = []
    for r in batch.collect():
        for i in range(3):
            t = r[f"t_{i}"]
            if t is not None:
                want.append((r.user, i + 1, t))
    assert got == sorted(want)
    # v's click at ts=2 precedes v's view -> v must stop at step 1...
    # unless file ordering delivered view first; assert against batch
    # semantics only (above), and that u fully converted:
    assert ("u", 3, T0 + dt.timedelta(seconds=20)) in got
