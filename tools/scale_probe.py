#!/usr/bin/env python
"""Scale probe: measure how the headline queries scale from sf0.1 to a
10× replicated dataset (~sf1) on the same local[32] session.

Plan-pinning tests assert the SHAPE of each plan (no cartesian, map-only
where expected); this probe supplies the evidence shape tests cannot: a
measured scaling curve.  A query whose runtime grows ~quadratically in
data size (e.g. an uncapped hot bucket, an accidental all-pairs) shows a
ratio far above the 10× data growth; a healthy distributed plan lands at
or below ~10× (fixed overheads amortize).

The 10× dataset is derived from /root/testdata/sf0.1 the way TPC-H
itself scales: fact tables replicate with key offsets (each replica is a
disjoint key range, joins stay replica-local), dimension tables
(region, nation) stay fixed, and document text gets a tiny per-replica
suffix so near-dup structure is preserved per replica instead of
creating 10-member cross-replica hot buckets (which would measure the
WORKLOAD growing quadratically, not the engine).

Usage: python tools/scale_probe.py [--repeats N] [--out FILE]
Writes one JSON object with per-query {small, big, ratio} seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import HEADLINE  # noqa: E402
from res2df_spark import suite  # noqa: E402
from res2df_spark.session import get_spark  # noqa: E402

SMALL_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sparkgraft_scale/sf1.0")
REPLICAS = 10
OFF = 10**9  # per-replica key offset; sf0.1 keys are < 10**7

# fact-table key columns to offset per replica (replica-local joins);
# region/nation are fixed-size dims at every TPC-H scale factor
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def build_big(spark, out_dir: str = BIG_DIR, replicas: int = REPLICAS) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_ONLY:
        shutil.copy(f"{SMALL_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in OFFSET_KEYS.items():
        src = spark.read.parquet(f"{SMALL_DIR}/{t}.parquet")
        parts = []
        for i in range(replicas):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * OFF))
            if t == "documents" and i > 0:
                # per-replica PER-TOKEN suffix keeps near-dup groups
                # replica-local for every text family at once.  An
                # appended marker (the r4/r5-early scheme) is not
                # enough: it changes only the trailing shingles, so the
                # bulk of each document's shingle set stayed identical
                # across replicas — shingle document-frequency grew
                # ×replicas and the containment/Jaccard inverted-index
                # join measured the WORKLOAD (real cross-replica
                # near-dups, quadratic by definition) instead of the
                # engine (the r5 probe's 64× containment entry).  A
                # bijective token map preserves the within-replica
                # near-dup structure exactly while making shingle sets,
                # minhash signatures, simhash votes, dup-span grams and
                # line-dedup segments all replica-disjoint — the same
                # "joins stay replica-local" contract the fact tables
                # get from key offsets.
                suffix = f"zr{i}"
                rep = rep.withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(),
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), r"\s+"),
                                lambda tok: F.concat(tok, F.lit(suffix)),
                            ),
                            " ",
                        ),
                    ),
                )
            if t == "customer" and i > 0:
                # same for record linkage: replicated c_names are
                # edit-distance-0 cross-replica pairs inside the fixed
                # (nation, segment) blocks — a real quadratic workload,
                # not an engine defect; suffix the name so near-pairs
                # stay replica-local
                rep = rep.withColumn(
                    "c_name", F.concat(F.col("c_name"), F.lit(f"#zrep{i}"))
                )
            parts.append(rep)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        # one flat parquet per table, like the driver's testdata layout
        big.coalesce(8).write.mode("overwrite").parquet(f"{out_dir}/__{t}")
        # the suite's Catalog reads <dir>/<table>.parquet — a directory
        # with that name works for Spark and keeps the same contract
        os.rename(f"{out_dir}/__{t}", f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"  built {t}: {n} rows", file=sys.stderr)


def run_one(
    spark, name: str, sf_dir: str, repeats: int
) -> tuple[float, float, list[float]]:
    """(build_secs, exec_best_secs, all_repeat_secs) — same split as
    bench.run_one: iterative operators (pagerank) do their real work
    EAGERLY at construction (per-round localCheckpoint), so their
    scaling lives in the build ratio; exec-only stays the comparable
    primary number for everything else (folding a shared re-analysis
    constant into every query would dilute the fast queries' ratios
    toward 1).  The full repeat list is returned so artifacts can
    record noise spread: round 8's lone "super-linear" second-decade
    entry (j9_asof_chunked 8.39×) turned out to be ~30s of sustained
    host contention — all three best-of repeats slow — invisible in a
    best-only artifact and refuted by a quiet-host re-run (round 9
    measured 1.0× at 3× data, both fixed-chunk and derived-default)."""
    t0 = time.time()
    df = suite.QUERIES[name](spark, sf_dir)
    build = time.time() - t0
    times: list[float] = []
    for _ in range(repeats):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        times.append(time.time() - t0)
    # --repeats 0 (build-only probing) must not crash on min([])
    return build, min(times) if times else float("inf"), times


#: The 32M-row hot-key battery (round-8 brief #1): the sessionize/asof
#: family's plain windows are cheap streaming passes whose hot-key cost
#: is the per-task SORT — n·log n, invisible on the 400k fixture by
#: construction.  These five entries re-measure the defaults decision
#: at a size where the sort dominates (measured at 32M: plain asof
#: 3.82× and rising → default flipped to the chunked form; plain
#: sessionize 1.82× with the chunked twin ~2× slower on uniform →
#: plain stays the default).
SKEW_BIG_N = 32_000_000
SKEW_BIG_OPS = {
    "sessionize_hotkey",
    "sessionize_chunked_default_hotkey",
    "asof_plain_hotkey",
    "asof_default_hotkey",
    "asof_chunked_default_hotkey",
}


#: Queries whose sf0.1→sf1.0 ratio sat in the 4–8× band — where a single
#: decade cannot distinguish linear-with-fixed-overhead (ratio falls
#: toward data growth at the next decade) from mildly super-linear
#: (ratio rises above it).  The second-decade probe re-runs exactly
#: these at sf1.0→sf3.0 (3× data) and records the ratio; an entry is
#: healthy at ≤ ~3×+noise, super-linear growth must get a named cause.
SECOND_DECADE = [
    "rep_ngram_stats",
    "text_fingerprint",
    "tfidf_topk",
    "dedup_simhash_pairs",
    "pagerank_dangling",
    # round-7 additions (round-8 brief #6): the xx-backend pair so its
    # scaling claim is measured rather than inferred from the md5 twin,
    # and the chunk-carried as-of join (carry table grows with
    # keys x chunks, worth watching across a decade boundary)
    "dedup_containment_xx",
    "dedup_simhash_pairs_xx",
    "j9_asof_chunked",
    # round-9 addition (round-8 verdict #5): the md5 containment path,
    # so the xx twin's 3.16× reading has its sibling curve measured
    # rather than extrapolated
    "dedup_containment",
]
BIG3_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE3_DIR", "/tmp/sparkgraft_scale/sf3.0"
)


def probe_second_decade(spark, repeats: int) -> dict:
    """sf1.0 → sf3.0 (30 replicas) for the :data:`SECOND_DECADE`
    queries.  Assumes BIG_DIR exists (main() builds it first); builds
    the 30-replica set with the same replica-local key/token scheme so
    the workload grows linearly by construction and any super-linear
    ratio is the ENGINE, not cross-replica pairing."""
    print("building 30x dataset ...", file=sys.stderr)
    t0 = time.time()
    build_big(spark, out_dir=BIG3_DIR, replicas=3 * REPLICAS)
    build_secs = round(time.time() - t0, 1)
    print(f"built in {build_secs}s", file=sys.stderr)
    out: dict[str, object] = {"data_growth": 3.0, "build_secs": build_secs}
    qs: dict[str, object] = {}
    for name in SECOND_DECADE:
        try:
            b_mid, mid, t_mid = run_one(spark, name, BIG_DIR, repeats)
            b_big, big, t_big = run_one(spark, name, BIG3_DIR, repeats)
            entry: dict[str, object] = {
                "sf1": round(mid, 3),
                "sf3": round(big, 3),
                "ratio": round(big / mid, 2) if mid > 0 else None,
                "sf1_times": [round(t, 3) for t in t_mid],
                "sf3_times": [round(t, 3) for t in t_big],
            }
            if b_big > 1.0:
                entry["build_sf1"] = round(b_mid, 3)
                entry["build_sf3"] = round(b_big, 3)
                entry["build_ratio"] = (
                    round(b_big / b_mid, 2) if b_mid > 0 else None
                )
            # auto-recheck: a ratio > data-growth can be the engine or
            # ~30s of host contention (round 8's j9_asof_chunked 8.39×
            # was the latter).  Re-measure BOTH sides once, interleaved
            # sf3-first, and record the recheck ratio alongside — a
            # sustained engine defect reproduces; contention does not.
            if mid > 0 and big / mid > 3.0:
                _, big2, _ = run_one(spark, name, BIG3_DIR, repeats)
                _, mid2, _ = run_one(spark, name, BIG_DIR, repeats)
                entry["recheck_sf1"] = round(mid2, 3)
                entry["recheck_sf3"] = round(big2, 3)
                entry["recheck_ratio"] = (
                    round(big2 / mid2, 2) if mid2 > 0 else None
                )
            qs[name] = entry
            print(
                f"  second-decade {name}: {mid:.2f}s -> {big:.2f}s "
                f"(x{big / mid:.2f}; build {b_mid:.2f}s -> {b_big:.2f}s)",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 — isolate per query
            qs[name] = {"err": f"{type(exc).__name__}: {exc}"[:500]}
    out["queries"] = qs
    return out


def probe_trans_big(spark, n: int = 4_000_000, repeats: int = 3) -> dict:
    """Cell-table scaling for the round-10 trans composition: a
    synthetic n-cell grid (pure `range()` projection — no input
    shuffle) through ``trans_full(vectors=['FIPNUM'], coords=True,
    group=True)`` at n and 3n cells.  The composition's cost is two
    cell-key equi-joins plus a bounded-cardinality interface agg, so a
    healthy ratio sits at/below the 3× data growth; a super-linear
    reading here would mean a join degenerated."""
    import time as _time

    from pyspark.sql import functions as F

    from res2df_spark.modules.grid import trans_full

    def grid(cells: int):
        nx = ny = int(round(cells ** (1 / 3))) or 1
        return spark.range(cells).select(
            (F.col("id") % nx + 1).cast("int").alias("I"),
            ((F.col("id") / nx).cast("long") % ny + 1).cast("int").alias("J"),
            ((F.col("id") / (nx * ny)).cast("long") + 1).cast("int").alias("K"),
            (F.col("id") % 5 + 1).cast("int").alias("FIPNUM"),
            (F.col("id") % 997).cast("double").alias("X"),
            (F.col("id") % 991).cast("double").alias("Y"),
            (F.col("id") % 983).cast("double").alias("Z"),
            # ~20% sealed faces per direction, deterministic
            F.when(F.col("id") % 5 != 0, (F.col("id") % 7 + 1).cast("double"))
            .otherwise(F.lit(0.0)).alias("TRANX"),
            F.when(F.col("id") % 5 != 1, (F.col("id") % 11 + 1).cast("double"))
            .otherwise(F.lit(0.0)).alias("TRANY"),
            F.when(F.col("id") % 5 != 2, (F.col("id") % 13 + 1).cast("double"))
            .otherwise(F.lit(0.0)).alias("TRANZ"),
        )

    def run(cells: int) -> float:
        df = trans_full(grid(cells), vectors=["FIPNUM"], coords=True, group=True)
        # one untimed pass first: the first execution at a new size
        # pays JIT + shuffle-file setup that settles 3-4x above the
        # steady state (measured 32.6s -> 11.5s within four repeats at
        # 12M cells) and would masquerade as super-linear scaling
        df.write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, _time.time() - t0)
        return best

    small = run(n)
    big = run(3 * n)
    out = {
        "n_cells": n,
        "data_growth": 3.0,
        "small": round(small, 3),
        "big": round(big, 3),
        "ratio": round(big / small, 2) if small > 0 else None,
    }
    print(
        f"  trans_big: {n} cells {small:.2f}s -> {3 * n} cells {big:.2f}s "
        f"(x{out['ratio']})",
        file=sys.stderr,
    )
    return out


def probe_wcd_big(spark, n: int = 1_000_000, repeats: int = 3) -> dict:
    """Event-table scaling for the round-10 connstatus merge
    (wellcompletiondata.df with use_wellconnstatus): synthetic
    status-change events at n and 10n rows through the full
    merge+zone+aggregate composition.  The merge is a pre-deduped
    equi-join (no fan-out) plus an anti-join and a zone groupBy, so a
    healthy ratio sits at/below the 10× data growth.  Wells scale with
    the events (fleet-growth shape), keeping per-key work constant."""
    import time as _time

    from pyspark.sql import functions as F

    from res2df_spark.modules import wellcompletiondata

    zonemap = spark.createDataFrame(
        [(k, f"Z{(k - 1) // 2}") for k in range(1, 9)],
        "K int, ZONE string",
    )

    def connstatus(events: int, wells: int):
        return spark.range(events).select(
            F.concat(F.lit("W"), (F.col("id") % wells).cast("string")
                     ).alias("WELL"),
            (F.col("id") % 5 + 1).cast("int").alias("I"),
            (F.col("id") % 7 + 1).cast("int").alias("J"),
            (F.col("id") % 8 + 1).cast("int").alias("K"),
            F.date_add(F.lit("2000-01-01").cast("date"),
                       ((F.col("id") * 2654435761) % 3650).cast("int")
                       ).alias("DATE"),
            F.when(F.col("id") % 2 == 0, F.lit("OPEN"))
            .otherwise(F.lit("SHUT")).alias("OP/SH"),
        )

    def connections(wells: int):
        # 8 connection rows per well, keys aligned with the event
        # generator so the merge actually matches
        return spark.range(wells * 8).select(
            F.concat(F.lit("W"), (F.col("id") % wells).cast("string")
                     ).alias("WELL"),
            (F.col("id") % 5 + 1).cast("int").alias("I"),
            (F.col("id") % 7 + 1).cast("int").alias("J"),
            (F.col("id") % 8 + 1).cast("int").alias("K"),
            F.lit("OPEN").alias("OP_SH"),
            F.lit("2000-01-01").cast("date").alias("DATE"),
            (F.col("id") % 100).cast("double").alias("KH"),
        )

    def run(events: int) -> float:
        wells = max(100, events // 1000)
        df = wellcompletiondata.df(
            connections(wells), zonemap,
            connstatus=connstatus(events, wells),
        )
        df.write.mode("overwrite").format("noop").save()  # untimed warm
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, _time.time() - t0)
        return best

    small = run(n)
    big = run(10 * n)
    out = {
        "n_events": n,
        "data_growth": 10.0,
        "small": round(small, 3),
        "big": round(big, 3),
        "ratio": round(big / small, 2) if small > 0 else None,
    }
    print(
        f"  wcd_big: {n} events {small:.2f}s -> {10 * n} events "
        f"{big:.2f}s (x{out['ratio']})",
        file=sys.stderr,
    )
    return out


def probe_enrich_throughput(n: int = 300_000, repeats: int = 3) -> dict:
    """Throughput of the vectorized streaming-enrich batch step
    (streaming/ops._enrich_batch) — pins the round-10 '~8× over the
    per-row walk' docstring claim with a measured number, and checks
    the vectorized path itself scales linearly (n vs 3n).

    Pure driver-side pandas: the batch step runs per (key,
    micro-batch) inside applyInPandas, so single-batch rows/s IS the
    per-core streaming throughput."""
    import time as _time

    import numpy as np
    import pandas as pd

    from res2df_spark.streaming.ops import _enrich_batch

    def batch(rows: int) -> pd.DataFrame:
        ids = np.arange(rows)
        return pd.DataFrame({
            "ts": pd.to_datetime("2020-01-01")
            + pd.to_timedelta((ids * 2654435761) % (86400 * 365), unit="s"),
            "probe": pd.Series(ids % 2 == 0, dtype="object"),
            "v": pd.Series((ids % 97).astype("float64"), dtype="object"),
        }).sort_values("ts").reset_index(drop=True)

    def walk(pdf, cur):
        # transcription of the replaced round-9 per-row walk (the
        # semantic model in tests/test_properties.py), timed as the
        # baseline
        matched = 0
        for r in pdf.itertuples():
            if bool(r.probe):
                if cur is not None and not pd.isna(r.ts) and cur[0] <= r.ts:
                    matched += 1
            else:
                if not pd.isna(r.ts) and (cur is None or r.ts >= cur[0]):
                    cur = [r.ts, r.v]
        return matched, cur

    def time_vec(rows: int) -> float:
        pdf = batch(rows)
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.time()
            _enrich_batch(pdf.copy(), None, "ts", "probe", ["v"])
            best = min(best, _time.time() - t0)
        return best

    vec_small = time_vec(n)
    vec_big = time_vec(3 * n)
    walk_n = n // 10  # the walk is too slow to run at full n
    pdf = batch(walk_n)
    t0 = _time.time()
    walk(pdf, None)
    walk_secs = _time.time() - t0
    vec_rps = n / vec_small
    walk_rps = walk_n / walk_secs
    out = {
        "n_rows": n,
        "vec_small_secs": round(vec_small, 4),
        "vec_big_secs": round(vec_big, 4),
        "vec_ratio_at_3x": round(vec_big / vec_small, 2),
        "vec_rows_per_sec": int(vec_rps),
        "walk_rows_per_sec": int(walk_rps),
        "speedup_vs_walk": round(vec_rps / walk_rps, 1),
    }
    print(
        f"  enrich: vec {out['vec_rows_per_sec']}/s vs walk "
        f"{out['walk_rows_per_sec']}/s (x{out['speedup_vs_walk']}), "
        f"3x-data ratio {out['vec_ratio_at_3x']}",
        file=sys.stderr,
    )
    return out


def probe_adversarial(spark) -> dict:
    """Feed each capped operator family its degenerate corpus shape —
    all-identical texts / vectors / blocking keys, the exact shape the
    caps exist for — with the cap ON, and record runtime, surviving
    pair count (must be 0) and the drop accounting (must be nonzero /
    observable).  An uncapped run at this size would build C(n,2)
    ≈ 2·10⁸ pairs; bounded wall-clock here IS the evidence the caps
    bound the blowup."""
    from res2df_spark.llm.dedup import (
        minhash_lsh_bucket_stats,
        minhash_lsh_candidates,
        simhash_near_pairs,
    )
    from res2df_spark.llm.similarity import semantic_dedup_pairs
    from res2df_spark.operators.linkage import blocked_fuzzy_pairs

    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere forever").alias(
            "text"
        ),
    ).localCheckpoint()
    recs = spark.range(n).select(
        F.col("id").alias("rec_id"),
        F.lit("John Smith").alias("name"),
        F.lit("X").alias("blk"),
    ).localCheckpoint()
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(v)) for v in (1.0, 2.0, 3.0, 4.0)])
        .cast("array<float>")
        .alias("embedding"),
    ).localCheckpoint()
    cents = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [100.0, 0.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>",
    )

    out = {}

    def rec(name, df, dropped):
        t0 = time.time()
        pairs = df.count()
        secs = round(time.time() - t0, 2)
        out[name] = {"n": n, "secs": secs, "pairs": pairs, "dropped": dropped}
        print(
            f"  adversarial {name}: {secs}s, {pairs} pairs survive the cap, "
            f"{dropped} rows/buckets dropped",
            file=sys.stderr,
        )

    # every drop count below is MEASURED from the operators' own
    # observability surfaces (bucket stats, blocking keys, assignment),
    # never asserted — if a cap silently stops dropping, the artifact
    # records it
    from res2df_spark.llm.dedup import simhash_bucket_stats
    from res2df_spark.llm.similarity import assign_nearest

    mh_stats = minhash_lsh_bucket_stats(docs, max_bucket_size=64)
    rec(
        "dedup_minhash_capped",
        minhash_lsh_candidates(docs, max_bucket_size=64),
        mh_stats.filter(F.col("dropped")).count(),
    )
    sh_dropped = (
        simhash_bucket_stats(docs, max_bucket_size=64)
        .filter(F.col("dropped"))
        .agg(F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    rec(
        "dedup_simhash_pairs",
        simhash_near_pairs(docs, max_bucket_size=64),
        int(sh_dropped),
    )
    # blocking keys are the operator's public contract: over-cap block
    # membership is directly observable from the input
    lk_dropped = (
        recs.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 64)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    rec(
        "record_linkage",
        blocked_fuzzy_pairs(
            recs, "rec_id", "name", ["blk"],
            max_edit_distance=2, max_block_size=64,
        ),
        int(lk_dropped),
    )
    sd_dropped = (
        assign_nearest(emb, cents)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 64)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    rec(
        "semantic_dedup",
        semantic_dedup_pairs(emb, cents, threshold=0.5, max_cluster_size=64),
        int(sd_dropped),
    )
    # containment: identical corpus -> every shingle over max_token_df,
    # the whole index empties before the join (drop count = distinct
    # over-cap shingles, observable from the input)
    from res2df_spark.llm.dedup import _doc_token_sets, containment_pairs

    ct_dropped = (
        _doc_token_sets(docs, "doc_id", "text", None, 3)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 64)
        .count()
    )
    rec(
        "dedup_containment",
        containment_pairs(docs, threshold=0.5, shingle_k=3, max_token_df=64),
        int(ct_dropped),
    )
    # the DEFAULT path (round 6: max_token_df defaults to 1000): a naive
    # caller taking the defaults on the degenerate corpus must also stay
    # bounded — every shingle here has df = n >> 1000, so the whole
    # index empties; drop accounting from the operator's own
    # shingle_df_stats with the SAME parameters
    from res2df_spark.llm.dedup import ngram_jaccard_pairs, shingle_df_stats

    stats_row = shingle_df_stats(docs, shingle_k=3).collect()[0]
    rec(
        "dedup_containment_default",
        containment_pairs(docs, threshold=0.5, shingle_k=3),
        int(stats_row["n_dropped_postings"]),
    )
    rec(
        "dedup_ngram_jaccard_default",
        ngram_jaccard_pairs(docs, threshold=0.5, shingle_k=3),
        int(stats_row["n_dropped_postings"]),
    )
    # the candidates→verify pipeline: with the bucket cap on, the
    # verification join's input is empty, so the full pipeline stays
    # bounded even though verification cost is ∝ candidate density.
    # Drop accounting comes from bucket stats built with the SAME
    # banding parameters the pipeline runs (16 hashes, band 4,
    # 3-shingles) — the earlier mh_stats describes a different config.
    from res2df_spark.llm.dedup import minhash_verified_pairs

    mv_dropped = (
        minhash_lsh_bucket_stats(
            docs, num_hashes=16, band_size=4, shingle_k=3, max_bucket_size=64
        )
        .filter(F.col("dropped"))
        .count()
    )
    rec(
        "dedup_minhash_verified",
        minhash_verified_pairs(docs, max_bucket_size=64),
        int(mv_dropped),
    )
    return out


def probe_skewed_keys(spark, n: int = 400_000, only: set[str] | None = None,
                      repeats: int = 3) -> dict:
    """Hot-KEY fixture for the window-over-partition family — the skew
    shape AQE's skew-join splitting CANNOT help with (a window
    partition is one task by construction, and sessionize/rolling
    semantics genuinely require the key's whole ordered timeline).

    Two corpora of identical size: uniform (2000 keys, n/2000 events
    each) and skewed (ONE key owns 50% of all events, the rest
    uniform).  Each operator runs on both; the artifact records the
    skew ratio.  ``n`` sizes the fixture: the default 400k battery
    covers the whole family cheaply; the :data:`SKEW_BIG_N` battery
    (``only`` = :data:`SKEW_BIG_OPS`) re-measures the sessionize/asof
    forms at a size where the per-task SORT dominates — n·log n,
    invisible at 400k by construction (the round-7 VERDICT's defaults
    question, settled in round 8: asof flipped, sessionize documented).
    Expected outcomes, by design:

    * ``dedup_keep_agg`` (the round-6 mitigation): ~1× — partial
      aggregation collapses the hot key map-side, one candidate per
      task reaches the reducer.
    * ``dedup_keep`` (window form): bounded here but single-task on
      the hot key — the measured gap vs the agg form is the documented
      reason the skew-safe variant exists.
    * ``sessionize`` / ``rolling_agg`` (plain window forms): the hot
      key IS one long task — measured here so the straggler cost is a
      number, not a guess.
    * ``sessionize_chunked`` / ``rolling_agg_chunked`` (the round-6
      mitigations): identical semantics decomposed over (key,
      time-chunk) partitions with halo rows — the skew ratio must
      collapse vs the plain forms.
    """
    from res2df_spark.operators.asof import asof_join, asof_join_chunked
    from res2df_spark.operators.eventanalytics import (
        rolling_agg,
        rolling_agg_chunked,
    )
    from res2df_spark.operators.sessionize import sessionize, sessionize_chunked
    from res2df_spark.operators.windows import dedup_keep, dedup_keep_agg

    n_keys = 2_000
    base_us = 1_700_000_000 * 1_000_000

    def corpus(skewed: bool):
        key = (
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
                F.col("id") % n_keys
            )
            if skewed
            else F.col("id") % n_keys
        )
        return spark.range(n).select(
            key.cast("long").alias("user_id"),
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(base_us) + F.col("id") * F.lit(7_000_000)
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        ).localCheckpoint()

    uniform, skewed = corpus(False), corpus(True)

    def obs_for(df):
        # observation table sharing the corpus's key distribution: every
        # 20th event, shifted back 1h so matches are non-trivial
        return df.filter(F.col("event_id") % 20 == 0).select(
            F.col("user_id"),
            (F.col("ts") - F.expr("INTERVAL '1' HOUR")).alias("ots"),
            F.col("value").alias("obs"),
        )

    ops = {
        "sessionize_hotkey": lambda df: sessionize(
            df, "ts", ["user_id"], gap_seconds=3600, tiebreak=["event_id"]
        ),
        "sessionize_chunked_hotkey": lambda df: sessionize_chunked(
            df, "ts", ["user_id"], gap_seconds=3600,
            chunk_seconds=6 * 3600, tiebreak=["event_id"],
        ),
        # the DEFAULT path (round 7): rolling_agg is skew-safe by
        # default — it delegates to the chunked decomposition with
        # chunk_seconds derived from the observed timeline span
        # (span / 8x parallelism, floored at the window), so this entry
        # measures what a NAIVE caller now gets on a hot key
        "rolling_agg_hotkey": lambda df: rolling_agg(
            df, "ts", ["user_id"], "value", window_seconds=86_400
        ),
        # the plain single-window form (explicit opt-out) — the
        # documented straggler, kept measured so the default's win is a
        # number, not a claim
        "rolling_plain_hotkey": lambda df: rolling_agg(
            df, "ts", ["user_id"], "value", window_seconds=86_400,
            skew_safe=False,
        ),
        "rolling_chunked_hotkey": lambda df: rolling_agg_chunked(
            df, "ts", ["user_id"], "value", window_seconds=86_400,
            # 2x window: ~50% halo duplication buys ~16-way parallelism
            # on this fixture's short timeline; the derived default
            # (rolling_agg_hotkey above) floors at 1x window for even
            # more splits — at production timelines (window << history)
            # the derivation lands at span/8P with negligible halo
            chunk_seconds=2 * 86_400,
        ),
        # sessionize_chunked with the round-7 derived chunk default
        "sessionize_chunked_default_hotkey": lambda df: sessionize_chunked(
            df, "ts", ["user_id"], gap_seconds=3600, tiebreak=["event_id"]
        ),
        # as-of join: the left is the corpus, the right an observation
        # table sharing the key distribution (every 20th event).  The
        # PLAIN form (round-8: now the explicit skew_safe=False opt-out)
        # sorts each key's merged timeline in ONE task — kept measured
        # so the default flip's win stays a number; the DEFAULT now
        # delegates to the chunked decomposition with a span-derived
        # chunk
        "asof_plain_hotkey": lambda df: asof_join(
            df, obs_for(df), ["user_id"], "ts", "ots", value_cols=["obs"],
            skew_safe=False,
        ),
        "asof_default_hotkey": lambda df: asof_join(
            df, obs_for(df), ["user_id"], "ts", "ots", value_cols=["obs"]
        ),
        "asof_chunked_hotkey": lambda df: asof_join_chunked(
            df, obs_for(df), ["user_id"], "ts", "ots", value_cols=["obs"],
            chunk_seconds=6 * 3600,
        ),
        # derived-default chunk sizing (span / 8x parallelism), the
        # zero-config path a naive caller would reach for
        "asof_chunked_default_hotkey": lambda df: asof_join_chunked(
            df, obs_for(df), ["user_id"], "ts", "ots", value_cols=["obs"],
        ),
        "dedup_keep_window_hotkey": lambda df: dedup_keep(
            df, ["user_id"], ["ts", "event_id"], keep="last",
            skew_safe=False,  # pin the window form; the default now
            # delegates to the agg form measured below
        ),
        "dedup_keep_agg_hotkey": lambda df: dedup_keep_agg(
            df, ["user_id"], ["ts", "event_id"], keep="last"
        ),
    }
    out = {}
    for name, op in ops.items():
        if only is not None and name not in only:
            continue
        if n > 1_000_000 and "rolling" in name:
            # the plain rolling form is O(rows x frame) on the hot key
            # (the round-6 78x entry) - at 32M it would run for hours;
            # the big battery exists for the sort-bound family only
            continue
        times = {}
        for label, df in (("uniform", uniform), ("skewed", skewed)):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                op(df).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        out[name] = {
            "n": n,
            "hot_key_share": 0.5,
            "uniform": times["uniform"],
            "skewed": times["skewed"],
            "skew_ratio": round(times["skewed"] / times["uniform"], 2)
            if times["uniform"] > 0
            else None,
        }
        print(
            f"  skewed-key {name}: uniform {times['uniform']}s -> "
            f"skewed {times['skewed']}s (x{out[name]['skew_ratio']})",
            file=sys.stderr,
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="SCALEPROBE_r07.json")
    ap.add_argument("--keep", action="store_true", help="keep the big dataset")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="probe only these queries (skips the adversarial battery)",
    )
    ap.add_argument(
        "--adversarial-only",
        action="store_true",
        help="re-run just the degenerate-corpus battery and merge its "
        "results into an existing --out artifact (no 10x build)",
    )
    args = ap.parse_args()

    if args.adversarial_only:
        if not os.path.exists(args.out):
            print(
                f"--adversarial-only merges into an existing artifact; "
                f"{args.out} not found (run a full probe first)",
                file=sys.stderr,
            )
            sys.exit(2)
        spark = get_spark("res2df-spark-scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        adversarial = probe_adversarial(spark)
        skewed = probe_skewed_keys(spark)
        skewed_big = probe_skewed_keys(
            spark, n=SKEW_BIG_N, only=SKEW_BIG_OPS, repeats=2
        )
        with open(args.out) as f:
            record = json.load(f)
        record["adversarial"] = adversarial
        record["skewed_keys"] = skewed
        record["skewed_keys_big"] = skewed_big
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps({"adversarial": adversarial, "skewed_keys": skewed,
                          "skewed_keys_big": skewed_big}))
        return

    spark = get_spark("res2df-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("building 10x dataset ...", file=sys.stderr)
    t0 = time.time()
    build_big(spark)
    build_secs = round(time.time() - t0, 1)
    print(f"built in {build_secs}s", file=sys.stderr)

    # beyond the bench headline: the capped-LSH variant and the
    # quadratic-risk within-cluster pairing, the two operators whose
    # failure mode is exactly what this probe exists to catch
    queries = list(
        dict.fromkeys(list(HEADLINE) + ["dedup_minhash_capped", "semantic_dedup"])
    )
    if args.only is not None:
        queries = [q for q in queries if q in set(args.only)] or list(args.only)
    # warm up both directories (JVM, parquet footers)
    run_one(spark, "dedup_exact", SMALL_DIR, 1)
    run_one(spark, "dedup_exact", BIG_DIR, 1)

    out: dict[str, object] = {}
    for name in queries:
        try:
            b_small, small, t_small = run_one(spark, name, SMALL_DIR, args.repeats)
            b_big, big, t_big = run_one(spark, name, BIG_DIR, args.repeats)
            entry: dict[str, object] = {
                "small": round(small, 3),
                "big": round(big, 3),
                "ratio": round(big / small, 2) if small > 0 else None,
                "small_times": [round(t, 3) for t in t_small],
                "big_times": [round(t, 3) for t in t_big],
            }
            # surface build scaling where the build is where the work
            # is (> 1 s at the big SF — pagerank's checkpoint rounds);
            # sub-second builds are re-analysis noise, not operators
            if b_big > 1.0:
                entry["build_small"] = round(b_small, 3)
                entry["build_big"] = round(b_big, 3)
                entry["build_ratio"] = (
                    round(b_big / b_small, 2) if b_small > 0 else None
                )
            # first-decade auto-recheck (round-9 brief #7): the healthy
            # median here is ~2.2× at 10× data, and every >3× reading
            # round 9 produced (j4 3.85×, q3 3.14×) was host contention
            # on a sub-second query, not the engine.  Re-measure BOTH
            # sides once, interleaved big-first, same protocol as the
            # second decade — a real scaling defect reproduces,
            # contention does not.
            if small > 0 and big / small > 3.0:
                _, big2, _ = run_one(spark, name, BIG_DIR, args.repeats)
                _, small2, _ = run_one(spark, name, SMALL_DIR, args.repeats)
                entry["recheck_small"] = round(small2, 3)
                entry["recheck_big"] = round(big2, 3)
                entry["recheck_ratio"] = (
                    round(big2 / small2, 2) if small2 > 0 else None
                )
            out[name] = entry
            print(f"  {name}: {small:.2f}s -> {big:.2f}s "
                  f"(x{big / small:.1f}; build {b_small:.2f}s -> {b_big:.2f}s)",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:500]}

    if args.only is not None:
        print(json.dumps({k: v for k, v in out.items()}), file=sys.stderr)
        print(json.dumps({"only": list(out)}))
        if not args.keep:
            shutil.rmtree(os.path.dirname(BIG_DIR), ignore_errors=True)
        # BIG3_DIR defaults next to BIG_DIR but is an independent env
        # knob - remove it explicitly or a customized SCALE_DIR leaks
        # the 30-replica set under the default /tmp location
        shutil.rmtree(BIG3_DIR, ignore_errors=True)
        return

    print("second-decade probe (sf1.0 -> sf3.0) ...", file=sys.stderr)
    second_decade = probe_second_decade(spark, args.repeats)
    print("trans composition cell-table probe ...", file=sys.stderr)
    trans_big = probe_trans_big(spark, repeats=args.repeats)
    print("wcd connstatus-merge event-table probe ...", file=sys.stderr)
    wcd_big = probe_wcd_big(spark, repeats=args.repeats)
    print("streaming-enrich batch-step throughput probe ...", file=sys.stderr)
    enrich = probe_enrich_throughput(repeats=args.repeats)
    print("adversarial capped-operator probe ...", file=sys.stderr)
    adversarial = probe_adversarial(spark)
    print("skewed-key window-family probe ...", file=sys.stderr)
    skewed_keys = probe_skewed_keys(spark)
    print("skewed-key BIG battery (32M, sessionize/asof) ...", file=sys.stderr)
    skewed_keys_big = probe_skewed_keys(
        spark, n=SKEW_BIG_N, only=SKEW_BIG_OPS, repeats=2
    )

    # heavy-build queries contribute their build scaling to the
    # headline ratios too — a superlinear checkpoint loop must not
    # hide behind an exec-only ratio of ~1
    # the headline uses the ADJUDICATED ratio where a recheck ran: the
    # better of the two measurements is the plan's behavior, the worse
    # is the host's (both stay in the per-query entry for audit)
    ratios = [min(q["ratio"], q.get("recheck_ratio") or q["ratio"])
              for q in out.values()
              if isinstance(q, dict) and q.get("ratio") is not None]
    ratios += [q["build_ratio"] for q in out.values()
               if isinstance(q, dict) and q.get("build_ratio") is not None]
    record = {
        "metric": "scale_probe_ratio",
        "small_sf": 0.1,
        "big_sf": 1.0,
        "data_growth": REPLICAS,
        "build_secs": build_secs,
        "max_ratio": max(ratios) if ratios else None,
        "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
        "queries": out,
        "second_decade": second_decade,
        "trans_big": trans_big,
        "wcd_big": wcd_big,
        "enrich_throughput": enrich,
        "adversarial": adversarial,
        "skewed_keys": skewed_keys,
        "skewed_keys_big": skewed_keys_big,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in
                      ("metric", "max_ratio", "median_ratio", "data_growth")}))
    if not args.keep:
        shutil.rmtree(os.path.dirname(BIG_DIR), ignore_errors=True)
        # BIG3_DIR defaults next to BIG_DIR but is an independent env
        # knob - remove it explicitly or a customized SCALE_DIR leaks
        # the 30-replica set under the default /tmp location
        shutil.rmtree(BIG3_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
