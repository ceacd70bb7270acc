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


def test_pagerank_reliable_checkpoint_switch(spark, tmp_path):
    """With spark.res2df.checkpointDir set, every per-round truncation
    is a RELIABLE checkpoint(): files land in the directory (so an
    executor loss replays from durable storage) and results are
    bit-identical to the localCheckpoint fallback."""
    import os

    from res2df_spark.session import CHECKPOINT_DIR_CONF

    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    baseline = sorted(pagerank(edges, iterations=3).collect())
    ckdir = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckdir)
    try:
        got = pagerank(edges, iterations=3)
        rows = sorted(got.collect())
        # the reliable path really ran: checkpoint files exist on disk
        found = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckdir)
            for f in files
        ]
        assert found, "no checkpoint files written despite conf set"
        # and the plan carries no lineage above the checkpoint scans
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan ExistingRDD") <= 3
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    assert rows == baseline


def test_iterative_ops_respect_checkpoint_dir(spark, tmp_path):
    """The shared truncate_lineage switch reaches all four iterative
    operators: each writes reliable checkpoints when the conf is set."""
    import os

    from pyspark.sql import functions as F

    from res2df_spark.llm.dedup import connected_components
    from res2df_spark.llm.similarity import kmeans_fit
    from res2df_spark.llm.vocab import bpe_train
    from res2df_spark.session import CHECKPOINT_DIR_CONF

    def n_files(d):
        return sum(len(fs) for _, _, fs in os.walk(d))

    ckdir = str(tmp_path / "ck_all")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckdir)
    try:
        edges = spark.createDataFrame([(1, 2), (2, 3)], "d1 long, d2 long")
        nodes = spark.range(5).select(F.col("id").alias("doc_id"))
        cc = connected_components(edges, nodes)
        assert cc.count() == 5
        before = n_files(ckdir)
        assert before > 0

        vecs = spark.createDataFrame(
            [(i, [float(i), float(i % 3)]) for i in range(12)],
            "vec_id long, embedding array<double>",
        )
        assert kmeans_fit(vecs, k=2, iters=2).count() == 2
        after_kmeans = n_files(ckdir)
        assert after_kmeans > before

        docs = spark.createDataFrame(
            [(1, "low low lower"), (2, "low lowest")], "doc_id long, text string"
        )
        merges, _ = bpe_train(docs, n_merges=2)
        assert merges
        assert n_files(ckdir) > after_kmeans
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    # a -> b, 1 iteration, N=2, dangling={b}, dm=0.5:
    #   r1[a] = 0.15/2 + 0.85*(0   + 0.5/2) = 0.2875
    #   r1[b] = 0.15/2 + 0.85*(0.5 + 0.5/2) = 0.7125
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, [("a", "b")]),
            iterations=1,
            redistribute_dangling=True,
        ).collect()
    }
    assert got["a"] == pytest.approx(0.2875, abs=1e-6)
    assert got["b"] == pytest.approx(0.7125, abs=1e-6)
    # total mass conserved (the defect redistribution exists to fix)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)
    # and stays conserved after more rounds
    more = pagerank(
        _edges(spark, [("a", "b"), ("c", "b")]),
        iterations=4,
        redistribute_dangling=True,
    ).collect()
    assert sum(r["rank"] for r in more) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_convergence_deltas(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    ranks, deltas = pagerank(
        edges, iterations=6, redistribute_dangling=True, return_deltas=True
    )
    assert len(deltas) == 6
    # power iteration on a strongly-connected graph: monotone-ish decay;
    # assert the robust property (later rounds move less than round 1)
    assert deltas[-1] < deltas[0]
    assert all(d >= 0 for d in deltas)
    # tol stops early once the L1 delta falls under it
    ranks2, deltas2 = pagerank(
        edges,
        iterations=50,
        redistribute_dangling=True,
        return_deltas=True,
        tol=1e-3,
    )
    assert len(deltas2) < 50
    assert deltas2[-1] < 1e-3
    assert ranks2.count() == 3


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
