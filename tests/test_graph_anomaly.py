"""Behavioral tests for PageRank (operators/graph.py) and per-user
value anomalies (operators/eventanalytics.value_anomalies)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

from res2df_spark.operators.eventanalytics import value_anomalies
from res2df_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_pagerank_matches_hand_power_iteration(spark):
    # a -> b, a -> c, b -> c : N=3
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")]),
            damping=0.85,
            iterations=2,
        ).collect()
    }
    n = 3.0
    r = {v: 1 / n for v in "abc"}
    for _ in range(2):
        nxt = {}
        for v in "abc":
            m = 0.0
            if v == "b":
                m = r["a"] / 2
            if v == "c":
                m = r["a"] / 2 + r["b"] / 1
            nxt[v] = (1 - 0.85) / n + 0.85 * m
        r = nxt
    for v in "abc":
        assert got[v] == pytest.approx(round(r[v], 6), abs=1e-6)
    # sink collects the most mass, source the least
    assert got["c"] > got["b"] > got["a"]


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a->b->c->a : every node keeps exactly 1/N at every iteration
    got = pagerank(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), iterations=4
    ).collect()
    for r in got:
        assert r["rank"] == pytest.approx(round(1 / 3, 6), abs=1e-6)


def test_pagerank_dangling_mass_drops(spark):
    # a -> b only: total mass shrinks (simplified PR, documented)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, [("a", "b")]), iterations=1).collect()
    }
    assert got["b"] == pytest.approx(round(0.15 / 2 + 0.85 * 0.5, 6), abs=1e-6)
    assert got["a"] == pytest.approx(round(0.15 / 2, 6), abs=1e-6)


def test_pagerank_plan_is_lineage_truncated(spark):
    # after localCheckpoint rounds the final plan must NOT contain the
    # full iteration history (scan appears once per final-round read,
    # not once per iteration of lineage)
    df = pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iterations=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 3  # checkpointed inputs only


# ---------------------------------------------------------------------------
# value_anomalies


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, user_id=u, value=float(v), ts=datetime(2024, 1, 1))
            for i, (u, v) in enumerate(rows)
        ]
    )


def test_anomaly_flags_only_outlier(spark):
    rows = [("u1", 10.0)] * 9 + [("u1", 1000.0)]
    out = value_anomalies(_events(spark, rows), z_threshold=2.5).collect()
    assert len(out) == 1
    assert out[0]["value"] == 1000.0
    assert out[0]["z"] > 2.5
    assert out[0]["n_user_events"] == 10


def test_anomaly_min_events_gate(spark):
    rows = [("u1", 1.0), ("u1", 1.0), ("u1", 100.0)]  # only 3 events
    assert value_anomalies(_events(spark, rows), min_events=5).count() == 0


def test_anomaly_zero_variance_skipped(spark):
    rows = [("u1", 5.0)] * 8
    assert value_anomalies(_events(spark, rows)).count() == 0


def test_anomaly_per_user_isolation(spark):
    # u2's values would be outliers under u1's distribution but are
    # normal under its own
    rows = [("u1", 1.0)] * 6 + [("u2", 500.0)] * 6
    assert value_anomalies(_events(spark, rows)).count() == 0


def test_anomaly_stream_matches_batch(spark, tmp_path):
    """The stream-static anomaly scorer replayed over the training
    events equals the batch operator row-for-row."""
    from res2df_spark.operators.eventanalytics import user_value_stats
    from res2df_spark.streaming.ops import anomaly_stream, run_available_now

    rows = [("u1", 10.0)] * 9 + [("u1", 500.0)] + [("u2", 3.0)] * 6
    ev = _events(spark, rows)
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    static = spark.read.parquet(path)
    batch = sorted(
        value_anomalies(static).collect(), key=lambda r: r["event_id"]
    )
    src = spark.readStream.schema(static.schema).parquet(path)
    out = run_available_now(
        anomaly_stream(src, user_value_stats(static)),
        name="t_anomaly_stream",
        output_mode="append",
    )
    got = sorted(out.collect(), key=lambda r: r["event_id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert len(got) == 1 and got[0]["value"] == 500.0


def test_weighted_pagerank_matches_reference_and_reduces_to_unweighted(spark):
    from res2df_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0)],
        "src string, dst string, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight_col="w", iterations=2).collect()
    }
    n = 3.0
    r = {v: 1 / n for v in "abc"}
    outw = {"a": 4.0, "b": 2.0}
    for _ in range(2):
        nxt = {v: 0.15 / n for v in "abc"}
        nxt["b"] += 0.85 * r["a"] * 3.0 / outw["a"]
        nxt["c"] += 0.85 * (r["a"] * 1.0 / outw["a"] + r["b"] * 2.0 / outw["b"])
        r = nxt
    for v in "abc":
        assert got[v] == pytest.approx(round(r[v], 6), abs=1e-6)
    # b gets 3x a->b's share vs 1x a->c: weighted b outranks where
    # unweighted they tie on a's out-edges
    uw = {
        row["node"]: row["rank"]
        for row in pagerank(e.select("src", "dst"), iterations=2).collect()
    }
    assert got["b"] > uw["b"]
    # all-equal weights reduce to the unweighted result exactly
    eq = spark.createDataFrame(
        [("a", "b", 7.0), ("a", "c", 7.0), ("b", "c", 7.0)],
        "src string, dst string, w double",
    )
    got_eq = {
        r["node"]: r["rank"]
        for r in pagerank(eq, weight_col="w", iterations=2).collect()
    }
    assert got_eq == uw


def test_anomaly_large_mean_no_cancellation(spark):
    """Byte-counter-style values (mean ~1e9, std ~1): the naive
    E[v2]-E[v]2 variance is rounding noise at that magnitude; the
    shifted-moment form must still flag exactly the real outlier."""
    base = 1_234_567_890.0
    deltas = (0.0, 1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 0.75, -0.75)
    rows = [("u1", base + d) for d in deltas]
    rows.append(("u1", base + 50.0))  # the outlier
    out = value_anomalies(_events(spark, rows), z_threshold=2.5).collect()
    assert len(out) == 1
    assert out[0]["value"] == base + 50.0
    assert out[0]["z"] > 2.5


def test_pagerank_drops_null_and_nonpositive_weights(spark):
    from res2df_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", None), ("b", "c", -2.0), ("b", "a", 0.0)],
        "src string, dst string, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight_col="w", iterations=1).collect()
    }
    # only a->b survives: b gets a's full mass, a only the teleport
    # term, and c (reachable only via dropped edges) disappears from
    # the node set entirely
    assert set(got) == {"a", "b"}
    assert got["b"] > got["a"]
