"""Structured Streaming extension tests (memory source/sink)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from res2df_spark.streaming.ops import status_change_stream, windowed_rollup_stream


def _run_stream(df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()


def test_status_change_stream(spark):
    rows = [
        ("c1", datetime(2020, 1, 1, 0, 0), "OPEN"),
        ("c1", datetime(2020, 1, 1, 1, 0), "OPEN"),
        ("c1", datetime(2020, 1, 1, 2, 0), "SHUT"),
        ("c2", datetime(2020, 1, 1, 0, 30), "SHUT"),
        ("c1", datetime(2020, 1, 1, 3, 0), "OPEN"),
    ]
    src = spark.createDataFrame(rows, "conn string, ts timestamp, st string")
    path = "/tmp/res2df_stream_src"
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = status_change_stream(stream, key_cols=["conn"], state_col="st", ts_col="ts")
    _run_stream(out, "status_sink")
    got = sorted(
        tuple(r) for r in spark.sql("SELECT conn, ts, new_status FROM status_sink").collect()
    )
    assert got == [
        ("c1", datetime(2020, 1, 1, 0, 0), "OPEN"),
        ("c1", datetime(2020, 1, 1, 2, 0), "SHUT"),
        ("c1", datetime(2020, 1, 1, 3, 0), "OPEN"),
        ("c2", datetime(2020, 1, 1, 0, 30), "SHUT"),
    ]


def test_windowed_rollup_stream(spark):
    rows = [
        ("a", datetime(2020, 1, 1, 0, 10), 1.0),
        ("a", datetime(2020, 1, 1, 0, 50), 2.0),
        ("a", datetime(2020, 1, 1, 1, 10), 4.0),
        ("b", datetime(2020, 1, 1, 0, 20), 8.0),
    ]
    src = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    path = "/tmp/res2df_stream_src2"
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = windowed_rollup_stream(stream, ts_col="ts", key_cols=["k"], value_col="v")
    # complete-mode-ish check via update-less append: with a bounded file
    # source the watermark never passes, so use the aggregation in a
    # batch read instead to validate semantics, and just assert the
    # streaming query starts and produces a valid plan.
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # semantics checked batch-side (same expression tree; watermark is a
    # no-op on a bounded input):
    got = sorted(
        tuple(r)
        for r in windowed_rollup_stream(src, ts_col="ts", key_cols=["k"], value_col="v")
        .select("window_start", "k", "n", "total")
        .collect()
    )
    assert got == [
        (datetime(2020, 1, 1, 0, 0), "a", 2, 3.0),
        (datetime(2020, 1, 1, 0, 0), "b", 1, 8.0),
        (datetime(2020, 1, 1, 1, 0), "a", 1, 4.0),
    ]


def test_dedup_stream(spark):
    rows_in = [
        ("a", datetime(2020, 1, 1, 0, 0), 1.0),
        ("a", datetime(2020, 1, 1, 0, 5), 2.0),   # duplicate key
        ("b", datetime(2020, 1, 1, 0, 1), 3.0),
    ]
    src = spark.createDataFrame(rows_in, "k string, ts timestamp, v double")
    path = "/tmp/res2df_stream_src3"
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    from res2df_spark.streaming.ops import dedup_stream

    out = dedup_stream(stream, key_cols=["k"], ts_col="ts")
    q = out.writeStream.format("memory").queryName("dedup_sink").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = sorted(r.k for r in spark.sql("SELECT k FROM dedup_sink").collect())
    assert got == ["a", "b"]  # one row per key


def test_summary_ingest_stream(spark, tmp_path):
    """Two realizations land in the watch dir; availableNow processes
    both exactly once, rows tagged by REAL."""
    import datetime

    import pandas as pd

    from res2df_spark.sources.eclbin import write_summary
    from res2df_spark.streaming.ops import summary_ingest_stream

    watch = tmp_path / "ens"
    for real, fopt in ((0, [1.0, 2.0]), (1, [3.0, 4.0])):
        d = watch / f"realization-{real}"
        d.mkdir(parents=True)
        wide = pd.DataFrame(
            {"FOPT": fopt},
            index=pd.to_datetime(["2020-01-01", "2020-02-01"]),
        )
        write_summary(str(d / "RUN.SMSPEC"), datetime.datetime(2020, 1, 1), wide)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = summary_ingest_stream(spark, str(watch / "*"))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    rows = {
        (r["REAL"], str(r["DATE"].date()), r["VECTOR"]): r["VALUE"]
        for r in got.collect()
        if r["VECTOR"] == "FOPT"
    }
    assert rows[("0", "2020-01-01", "FOPT")] == 1.0
    assert rows[("1", "2020-02-01", "FOPT")] == 4.0
    assert len(rows) == 4


def test_run_available_now_complete(spark, tmp_path):
    from res2df_spark.streaming.ops import run_available_now

    rows = [
        ("a", datetime(2020, 1, 1, 0, 10), 1.0),
        ("a", datetime(2020, 1, 1, 0, 50), 2.0),
        ("b", datetime(2020, 1, 1, 0, 20), 8.0),
    ]
    src = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    path = str(tmp_path / "avail_now_src")
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    agg = windowed_rollup_stream(stream, ts_col="ts", key_cols=["k"], value_col="v")
    out = run_available_now(agg, name="t_avail_now")
    got = sorted(tuple(r) for r in out.select("k", "n", "total").collect())
    assert got == [("a", 2, 3.0), ("b", 1, 8.0)]


def test_catalog_stream_table(spark):
    from res2df_spark.catalog import Catalog
    from res2df_spark.streaming.ops import run_available_now

    cat = Catalog(spark, "/root/testdata/sf0.001")
    stream = cat.stream_table("events")
    assert stream.isStreaming
    # ts is normalized to TIMESTAMP exactly like the batch scan
    assert dict(stream.dtypes)["ts"] == dict(cat.events.dtypes)["ts"] == "timestamp"
    out = run_available_now(
        stream.select("event_id"), name="t_cat_stream", output_mode="append"
    )
    assert out.count() == cat.events.count()


def test_near_dedup_stream(spark, tmp_path):
    from res2df_spark.functions.textan import minhash_signature, tokens as _toks
    from res2df_spark.streaming.ops import near_dedup_stream, run_available_now
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", datetime(2020, 1, 1, 0, 0)),
        (2, "pack my box with five dozen liquor jugs", datetime(2020, 1, 1, 0, 1)),
        # exact duplicate of doc 1, arriving later
        (3, "the quick brown fox jumps over the lazy dog", datetime(2020, 1, 1, 0, 2)),
        (4, "", datetime(2020, 1, 1, 0, 3)),  # empty: no claims either way
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    path = str(tmp_path / "near_dedup_src")
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    claims = near_dedup_stream(stream, watermark="1 hour")
    out = run_available_now(claims, name="t_near_dedup", output_mode="append")
    got = out.collect()
    claimed_by = {}
    for r in got:
        claimed_by.setdefault(r.doc_id, set()).add((r.band_idx, r.band_key))
    # unique docs hold claims; the exact duplicate holds none
    assert 1 in claimed_by and 2 in claimed_by
    assert 3 not in claimed_by  # every band already claimed by doc 1
    assert 4 not in claimed_by  # empty doc produces no claims
    # each band key claimed at most once
    all_claims = [(r.band_idx, r.band_key) for r in got]
    assert len(all_claims) == len(set(all_claims))
    # doc 3's bands (batch-computed) are all covered by surviving claims
    bands3 = (
        src.filter("doc_id = 3")
        .select(F.posexplode(minhash_signature(_toks(F.col("text")))).alias("i", "h"))
        .collect()
    )
    assert bands3  # sanity: signature exists
    claimed_keys = {(r.band_idx, r.band_key) for r in got}
    n_bands = 32 // 4
    # reconstruct doc3's band keys the operator's way
    sig3 = [r.h for r in sorted(bands3, key=lambda r: r.i)]
    keys3 = {
        (b, "|".join(sig3[b * 4 : (b + 1) * 4])) for b in range(n_bands)
    }
    assert keys3 <= claimed_keys


def test_near_dup_verdicts(spark, tmp_path):
    """Doc-level consumer: claims → per-doc is_near_dup_candidate."""
    from res2df_spark.streaming.ops import (
        near_dedup_stream,
        near_dup_verdicts,
        run_available_now,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", datetime(2020, 1, 1, 0, 0)),
        (2, "pack my box with five dozen liquor jugs", datetime(2020, 1, 1, 0, 1)),
        (3, "the quick brown fox jumps over the lazy dog", datetime(2020, 1, 1, 0, 2)),
        (4, "", datetime(2020, 1, 1, 0, 3)),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    path = str(tmp_path / "verdict_src")
    src.coalesce(1).write.mode("overwrite").parquet(path)

    def replay():
        stream = spark.readStream.schema(src.schema).parquet(path)
        claims = near_dedup_stream(stream, watermark="1 hour")
        out = run_available_now(claims, name="t_verdicts", output_mode="append")
        return near_dup_verdicts(src, out)

    got = {r.doc_id: (r.bands_won, r.is_near_dup_candidate) for r in replay().collect()}
    assert got[1][1] is False and got[1][0] > 0  # first arrival wins bands
    assert got[2][1] is False
    assert got[3] == (0, True)       # exact dup of doc 1: zero bands won
    assert got[4] == (0, None)       # empty doc: no verdict, not candidate

    # AvailableNow replay is deterministic: a second replay over the
    # same files yields identical verdicts
    got2 = {r.doc_id: (r.bands_won, r.is_near_dup_candidate) for r in replay().collect()}
    assert got2 == got


def test_dedup_watermark_contract_across_batches(spark, tmp_path):
    """Pin the dropDuplicatesWithinWatermark contract the docstrings
    document: a duplicate arriving WITHIN the watermark in a later
    micro-batch is suppressed; one arriving beyond it may legitimately
    re-emit (the documented streaming-dedup approximation)."""
    import datetime as dt

    from res2df_spark.streaming.ops import dedup_stream, run_available_now

    t0 = dt.datetime(2024, 1, 1)
    rows1 = [(1, "k1", t0), (2, "k2", t0 + dt.timedelta(minutes=1))]
    # batch 2: k1 again within the watermark; k2 again far in the future
    # (watermark has advanced past the original k2 by then)
    rows2 = [
        (3, "k1", t0 + dt.timedelta(minutes=2)),
        (4, "k2", t0 + dt.timedelta(days=30)),
    ]
    schema = "event_id long, k string, ts timestamp"
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(path)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(path)
    src = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = run_available_now(
        dedup_stream(src, ["k"], "ts", watermark="10 minutes"),
        name="t_dedup_wm",
        output_mode="append",
    )
    counts = {r.k: r.n for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert counts["k1"] == 1  # within-watermark duplicate suppressed
    assert 1 <= counts["k2"] <= 2  # beyond-watermark repeat MAY re-emit


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """Stateless streaming decontamination must emit exactly the batch
    check's rows (same overlap counts, same short-doc exclusion)."""
    from res2df_spark.llm.curation import contamination_check
    from res2df_spark.streaming.ops import (
        decontaminate_stream,
        run_available_now,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all"),
            (3, "too short"),  # < shingle_k tokens → no row
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox ate lunch")], "doc_id long, text string"
    )
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    stream = spark.readStream.schema("doc_id long, text string").parquet(p)
    got = {
        r["doc_id"]: r
        for r in run_available_now(
            decontaminate_stream(stream, bench), output_mode="append"
        ).collect()
    }
    want = {
        r["doc_id"]: r for r in contamination_check(docs, bench).collect()
    }
    assert set(got) == set(want) == {1, 2}
    for d in got:
        assert got[d]["n_shingles"] == want[d]["n_shingles"]
        assert got[d]["n_contaminated"] == want[d]["n_contaminated"]
        assert got[d]["is_contaminated"] == want[d]["is_contaminated"]
    assert got[1]["n_contaminated"] == 2  # 'the quick brown', 'quick brown fox'
    # explicit low threshold flips doc 1
    flagged = {
        r["doc_id"]: r["is_contaminated"]
        for r in run_available_now(
            decontaminate_stream(stream, bench, threshold=0.05),
            output_mode="append",
        ).collect()
    }
    assert flagged == {1: True, 2: False}
    assert got[2]["n_contaminated"] == 0


def test_semantic_claims_stream_matches_batch_novelty(spark, tmp_path):
    """The stateless streaming claims must agree with the batch
    incremental path: every non-novel batch verdict has a stream claim
    for its best match, and novel ids produce no claims."""
    from pyspark.sql import Window

    from res2df_spark.llm.similarity import semantic_novelty, two_level_assign
    from res2df_spark.streaming.ops import (
        run_available_now,
        semantic_claims_stream,
    )

    old = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.99, 0.01, 0.0]),
         (12, [0.0, 0.0, 10.0])],
        "vec_id long, embedding array<float>",
    )
    cents = old.orderBy("vec_id").limit(2).select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    index = two_level_assign(old, cents).select(
        "vec_id", "centroid_id", F.col("__v").alias("embedding")
    )
    new = spark.createDataFrame(
        [(100, [1.0, 0.001, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    p = str(tmp_path / "new")
    new.write.parquet(p)
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(p)
    claims = run_available_now(
        semantic_claims_stream(stream, index, cents, threshold=0.9),
        output_mode="append",
    ).collect()
    batch = {r["vec_id"]: r for r in semantic_novelty(
        new, index, cents, threshold=0.9
    ).collect()}
    claimed = {(r["vec_id"], r["match_id"]) for r in claims}
    # 11 seeded centroid 1, so it sits in a different cluster than 100
    # (which lands on centroid 0 with index member 10): cluster-scoped
    # matching — the SemDeDup trade — yields exactly the one claim
    assert claimed == {(100, 10)}
    assert not batch[100]["is_novel"] and batch[101]["is_novel"]
    best = {r["vec_id"]: (r["match_id"], r["cos_sim"]) for r in claims}
    # stream cosines equal the batch best-match cosine for the best pair
    stream_best = max(
        (r for r in claims if r["vec_id"] == 100),
        key=lambda r: (r["cos_sim"], -r["match_id"]),
    )
    assert stream_best["match_id"] == batch[100]["match_id"]
    assert stream_best["cos_sim"] == batch[100]["cos_sim"]


def test_asof_enrich_stream_matches_batch_asof(spark, tmp_path):
    """Streaming point-in-time enrichment (round 9): the available-now
    replay over a finite source must equal the batch asof_join on the
    same rows — equal-time inclusion, duplicate-obs tiebreak, NULL-time
    probes with NULL payload, keys never observed."""
    from datetime import datetime as dt

    from res2df_spark.operators.asof import asof_join
    from res2df_spark.streaming.ops import asof_enrich_stream

    rows = [
        # (user, ts, probe?, payload value, payload id)
        (1, dt(2020, 1, 1, 0), False, 10.0, 100),
        (1, dt(2020, 1, 1, 2), False, 20.0, 200),
        (1, dt(2020, 1, 1, 2), False, 30.0, 300),   # equal-ts dup obs
        (1, dt(2020, 1, 1, 1), True, None, None),    # between obs
        (1, dt(2020, 1, 1, 2), True, None, None),    # AT obs time
        (1, dt(2020, 1, 1, 5), True, None, None),    # after everything
        (2, dt(2020, 1, 1, 1), True, None, None),    # never-observed key
        (3, None, True, None, None),                 # NULL-time probe
        (3, dt(2020, 1, 1, 0), False, 7.0, 700),
    ]
    src = spark.createDataFrame(
        rows, "user_id int, ts timestamp, probe boolean, v double, vid long"
    )
    path = str(tmp_path / "asof_src")
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = asof_enrich_stream(
        stream, ["user_id"], "ts", "probe", ["v", "vid"]
    )
    _run_stream(out, "asof_enrich_sink")
    got = sorted(
        ((r.user_id, r.ts, r.v, r.vid)
         for r in spark.sql("SELECT * FROM asof_enrich_sink").collect()),
        key=lambda t: (t[0], t[1] or dt.min),
    )

    probes = src.filter("probe").select("user_id", F.col("ts").alias("pts"))
    obs = src.filter("NOT probe").select("user_id", "ts", "v", "vid")
    want = sorted(
        ((r.user_id, r.pts, r.v, r.vid)
         for r in asof_join(
             probes, obs, ["user_id"], "pts", "ts",
             value_cols=["v", "vid"], skew_safe=False,
         ).collect()),
        key=lambda t: (t[0], t[1] or dt.min),
    )
    assert got == want
    # spot-check the semantics directly
    by = {(u, t): (v, vid) for u, t, v, vid in got}
    assert by[(1, dt(2020, 1, 1, 1))] == (10.0, 100)
    assert by[(1, dt(2020, 1, 1, 2))] == (30.0, 300)  # at-time, max payload
    assert by[(1, dt(2020, 1, 1, 5))] == (30.0, 300)
    assert by[(2, dt(2020, 1, 1, 1))] == (None, None)
    assert by[(3, None)] == (None, None)


def test_asof_enrich_stream_cross_batch_semantics(spark, tmp_path):
    """Round-9 review fixes, multi-batch (maxFilesPerTrigger=1 — one
    parquet file per micro-batch): NULL-time probes get NULL payload
    even with state present; a probe older than the state's observation
    never takes that FUTURE observation (conservative NULL); an
    equal-time duplicate observation arriving in a LATER batch cannot
    displace a higher-sorting payload by arrival order."""
    import os
    import time
    from datetime import datetime as dt

    from res2df_spark.streaming.ops import asof_enrich_stream

    schema = "user_id int, ts timestamp, probe boolean, v double, vid long"
    d = tmp_path / "src"
    d.mkdir()
    batches = [
        # b1: obs for k1 and the HIGH-sorting equal-ts obs for k2
        [(1, dt(2020, 1, 1, 10, 0), False, 5.0, 500),
         (2, dt(2020, 1, 1, 10, 0), False, 9.0, 900)],
        # b2: newer obs for k1; LOW-sorting equal-ts duplicate for k2
        [(1, dt(2020, 1, 1, 10, 5), False, 7.0, 700),
         (2, dt(2020, 1, 1, 10, 0), False, 3.0, 300)],
        # b3: probes — NULL-ts, late (before state's obs), current
        [(1, None, True, None, None),
         (1, dt(2020, 1, 1, 10, 2), True, None, None),
         (1, dt(2020, 1, 1, 10, 6), True, None, None),
         (2, dt(2020, 1, 1, 10, 1), True, None, None)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"b{i}"))
        # distinct mtimes → deterministic file-source batch order
        t = time.time() + i
        for root, _, files in os.walk(d / f"b{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    out = asof_enrich_stream(stream, ["user_id"], "ts", "probe", ["v", "vid"])
    _run_stream(out, "asof_cross_batch_sink")
    got = {
        (r.user_id, r.ts): (r.v, r.vid)
        for r in spark.sql("SELECT * FROM asof_cross_batch_sink").collect()
    }
    assert got[(1, None)] == (None, None)  # NULL-ts probe: never matches
    # late probe: state holds 10:05 > probe 10:02 — never a future match
    assert got[(1, dt(2020, 1, 1, 10, 2))] == (None, None)
    assert got[(1, dt(2020, 1, 1, 10, 6))] == (7.0, 700)
    # equal-ts duplicate from a later batch must NOT displace (9.0, 900)
    assert got[(2, dt(2020, 1, 1, 10, 1))] == (9.0, 900)
