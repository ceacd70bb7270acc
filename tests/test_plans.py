"""Physical-plan audits: pin the plan shapes that matter at 100 TB
(pushdown, pruning, no cartesian blowups).  These are the properties
SCALE.md claims; this file makes them regression-checked."""

from __future__ import annotations

import pytest

from res2df_spark import suite

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return suite.QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["j4_region_revenue", "q3_top_orders", "a3_pair_aggregation", "j9_asof_join",
     "j8_chain_anti", "j5_neighbor_shift"],
)
def test_no_cartesian_or_nested_loop_on_fact_side(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    # BroadcastNestedLoopJoin is acceptable only against a broadcast
    # fixture side (r3/r5 style), never in these equi-join queries
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "j3_multikey_join")
    assert "PushedFilters" in plan
    assert "p_size" in plan  # the dim filter reaches the parquet scan


def test_column_pruning(spark):
    # a1 touches 7 of lineitem's 11 columns; the scan must not read more
    plan = _plan(spark, "a1_pricing_summary")
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert scan_lines, "no lineitem scan found"
    assert "l_orderkey" not in scan_lines[0]  # unused key column pruned
    assert "l_partkey" not in scan_lines[0]


def test_partial_aggregation_present(spark):
    # groupBy must partial-aggregate map-side (two HashAggregate levels)
    plan = _plan(spark, "a1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_explode_stays_shuffle_free(spark):
    plan = _plan(spark, "r1_unroll_range")
    # project+generate over the scan; the only exchange allowed is none
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Shuffle-placement operators (operators/colocate.py): bucketed joins
# must be exchange-free; salted joins must keep results identical.
# ---------------------------------------------------------------------------


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from res2df_spark.operators.colocate import (
        bucketed, colocated_join, write_bucketed,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    left = df.withColumn("a", df.k * 2)
    right = df.withColumn("b", df.k % 7)
    write_bucketed(left, "t_bkt_left", ["k"], n_buckets=8,
                   path=str(tmp_path / "l"))
    write_bucketed(right, "t_bkt_right", ["k"], n_buckets=8,
                   path=str(tmp_path / "r"))
    # at test scale the planner would broadcast instead (also shuffle-
    # free, but not the path under test) — disable to expose the
    # bucketed sort-merge join
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            bucketed(spark, "t_bkt_left"), bucketed(spark, "t_bkt_right"), ["k"]
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_bucketed_agg_has_no_exchange(spark, tmp_path):
    from pyspark.sql import functions as F

    from res2df_spark.operators.colocate import bucketed, write_bucketed

    df = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_bkt_agg", ["k"], n_buckets=8,
                   path=str(tmp_path / "a"))
    try:
        agg = bucketed(spark, "t_bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_agg")


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from res2df_spark.operators.colocate import salted_join

    # one hot key (90% of rows) + a tail
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, 0).otherwise(F.col("id") % 37).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 37).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = fact.join(dim, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    salted = salted_join(fact, dim, ["k"], n_salt=8).groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_join_splits_hot_key(spark):
    from pyspark.sql import functions as F

    from res2df_spark.operators.colocate import salted_join

    fact = spark.range(0, 1000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 1).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    out = salted_join(fact, dim, ["k"], n_salt=8)
    # the physical join key must include the salt column
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "__salt" in plan
    assert out.count() == 1000


def test_snapshot_latest_single_exchange(spark):
    """snapshot_latest is ONE shuffle on the keys: no range join, no
    extra exchange beyond the window's hash partitioning."""
    from datetime import date

    from res2df_spark.operators.windows import snapshot_latest

    log = spark.createDataFrame(
        [("A", date(2020, 1, 1), 1, 10.0), ("A", date(2020, 3, 1), 2, 20.0)],
        "K string, DATE date, ORD int, V double",
    )
    grid = spark.createDataFrame(
        [("A", date(2020, 2, 1)), ("A", date(2020, 4, 1))], "K string, SD date"
    )
    out = snapshot_latest(
        log, grid, keys=["K"], snap_col="SD", time_col="DATE",
        order_by=["ORD"], payload_cols=["V"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    got = {(r["K"], str(r["SD"])): r["V"] for r in out.collect()}
    assert got == {("A", "2020-02-01"): 10.0, ("A", "2020-04-01"): 20.0}


def _count_exchanges(plan: str) -> int:
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "reuse" not in line.lower())


def test_curation_map_only_plans(spark):
    """Hash split / PII scrub / chunking are map-only: zero exchanges."""
    for name in ("pii_scrub", "doc_chunk_overlap"):
        plan = _plan(spark, name)
        assert _count_exchanges(plan) == 0, name


def test_pack_sequences_single_exchange(spark):
    """Packing shuffles once (the shard window partitioning) — the
    sequential cumsum never becomes a global single-partition sort."""
    plan = _plan(spark, "pack_sequences")
    assert _count_exchanges(plan) == 1, plan
    assert "SinglePartition" not in plan


def test_asof_tolerance_adds_no_exchange(spark):
    base = _count_exchanges(_plan(spark, "j9_asof_join"))
    tol = _count_exchanges(_plan(spark, "j9_asof_tolerance"))
    assert tol == base == 1


def test_frame_sample_is_arrow_batched(spark):
    plan = _plan(spark, "mm_frame_sample")
    assert "MapInPandas" in plan
    # no per-row Python UDF nodes
    assert "BatchEvalPython" not in plan


def test_round4_map_only_plans(spark):
    """Segment dedup / quantization / stratified sampling are pure
    scan-rewrites: zero exchanges."""
    for name in ("dedup_segments", "emb_quantize", "curation_stratified"):
        plan = _plan(spark, name)
        assert _count_exchanges(plan) == 0, name


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set broadcasts; the corpus side must not
    shuffle on the shingle (only the final doc-id aggregation may)."""
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_capped_same_exchanges_as_uncapped(spark):
    base = _count_exchanges(_plan(spark, "dedup_minhash_lsh"))
    capped = _count_exchanges(_plan(spark, "dedup_minhash_capped"))
    assert capped == base


def test_bucketed_band_index_novelty_join(spark, tmp_path):
    """SCALE.md claim: persist the minhash band index bucketed by its
    key and the incremental novelty join needs NO exchange on the
    index side — the daily-ingest join is co-located."""
    from res2df_spark.llm.dedup import minhash_band_index, minhash_novelty
    from res2df_spark.operators.colocate import bucketed, write_bucketed

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared words appear here too {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    idx = minhash_band_index(docs, num_hashes=8, band_size=4)
    write_bucketed(idx, "t_band_idx", ["band_idx", "band_key"], n_buckets=8,
                   path=str(tmp_path / "bands"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new = spark.createDataFrame(
            [(100, "tok1 shared words appear here too 1"),
             (101, "entirely novel content never indexed")],
            "doc_id long, text string",
        )
        out = minhash_novelty(new, bucketed(spark, "t_band_idx"),
                              num_hashes=8, band_size=4)
        # relative assertion: the same join against a plain (unbucketed)
        # parquet index needs exactly one more Exchange — the one the
        # bucketed scan's HashPartitioning metadata eliminates
        idx.write.mode("overwrite").parquet(str(tmp_path / "plain"))
        plain = minhash_novelty(
            new, spark.read.parquet(str(tmp_path / "plain")),
            num_hashes=8, band_size=4,
        )
        n_bucketed = _count_exchanges(
            out._jdf.queryExecution().executedPlan().toString()
        )
        n_plain = _count_exchanges(
            plain._jdf.queryExecution().executedPlan().toString()
        )
        assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)
        got = {r.doc_id: r.is_novel for r in out.collect()}
        assert got[100] is False and got[101] is True
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_band_idx")


def test_vocab_topk_is_take_ordered(spark):
    # the global vocabulary cut must be distributed TakeOrdered, never
    # a full global sort of the term table
    plan = _plan(spark, "vocab_topk")
    assert "TakeOrderedAndProject" in plan
    plan_b = _plan(spark, "bpe_pairs")
    assert "TakeOrderedAndProject" in plan_b


def test_boilerplate_hot_set_broadcasts(spark):
    # the hot-shingle set joins back via broadcast: the corpus side
    # must not shuffle on the shingle key for the scoring join
    plan = _plan(spark, "boilerplate_score")
    assert "BroadcastHashJoin" in plan


def test_temperature_mix_broadcasts_rates(spark):
    # per-source thresholds are kilobyte-sized and broadcast; the
    # corpus itself is filtered map-side
    plan = _plan(spark, "temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assign_broadcasts_centroids(spark):
    # the centroid fan-out is a broadcast nested-loop against k rows
    # (intentional: model-sized side), and the argmin partial-aggregates
    plan = _plan(spark, "kmeans_assign")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # struct-min argmin isn't hash-aggregable: SortAggregate, but still
    # partial (map-side combine collapses the k candidates per vector
    # before the exchange)
    assert "partial_min" in plan


def test_semantic_dedup_equality_join_no_cartesian(spark):
    # within-cluster pairing must be an equality join on the cluster
    # id — never a cartesian/all-pairs product of the corpus
    plan = _plan(spark, "semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 1


def test_rep_ngram_stats_is_map_only(spark):
    # within-doc repetition metrics: pure array expressions — no data
    # shuffle (the only exchange is spread()'s round-robin widening of
    # the tiny test file, which disappears on real multi-split inputs)
    plan = _plan(spark, "rep_ngram_stats")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_lm_quality_scoring_path_has_no_data_shuffle(spark):
    # training does its (bounded) groupBy at train time; the SCORING
    # plan ships the dense log-prob table as a one-row BROADCAST
    # dimension (allowed) but must never shuffle the corpus itself
    plan = _plan(spark, "lm_quality")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_weighted_sample_uses_topk_not_global_sort(spark):
    # Efraimidis-Spirakis selection must compile to TakeOrderedAndProject
    # (per-partition top-k + driver merge), never a full-sort exchange
    plan = _plan(spark, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_sessionize_events_single_exchange(spark):
    # lag-flag window + running sum + per-session groupBy all reuse one
    # hash partitioning on user_id
    plan = _plan(spark, "sessionize_events")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dedup_keep_agg_is_aggregate_not_window(spark):
    # the skew-safe form must plan as a partial-aggregatable max_by —
    # no Window operator (whose partition AQE cannot split), exactly
    # one hash exchange on the dedup keys
    plan = _plan(spark, "a5_dedup_keep_agg")
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan.lower(), plan  # map-side combine present


def test_rolling_chunked_partitions_on_time_chunk(spark):
    # the chunked window must partition on (user, chunk) — the hot-key
    # mitigation — with ONE data exchange total (round 12): the union
    # of main + halo reuses the same partitioning, and NULL-ts rows
    # ride the NULL-chunk cell of that same exchange (their peer-group
    # aggregates gate on isnull(__us) inside the one window pass)
    # instead of a re-scanned, separately-exchanged side branch
    plan = _plan(spark, "rolling_chunked")
    assert "__chunk" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "isnull" in plan, plan  # the NULL-peer-group gate


def test_plan_audit_extraction(spark):
    """tools/plan_audit.py's regexes must keep parsing Spark's formatted
    explain (operator headers, Exchange Arguments lines, parquet scan
    details) — this pins the extraction against Spark version drift."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.plan_audit import audit_one

    from res2df_spark import suite

    rec = audit_one(spark, "j4_region_revenue", suite.QUERIES["j4_region_revenue"])
    assert not rec["cartesian"] and not rec["python_row_udf"]
    assert rec["broadcast_exchanges"] >= 1      # dim-chain broadcasts
    assert rec["scans"], "parquet scan details must parse"
    assert any(s["read_columns"] for s in rec["scans"])
    rec2 = audit_one(
        spark, "dedup_minhash_lsh", suite.QUERIES["dedup_minhash_lsh"]
    )
    total_ex = (
        rec2["exchanges_hash"]
        + rec2["exchanges_range"]
        + rec2["exchanges_single"]
        + rec2["exchanges_roundrobin"]
    )
    assert total_ex >= 2, rec2   # banding aggregates genuinely shuffle
