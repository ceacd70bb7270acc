#!/usr/bin/env python
"""Benchmark harness: run the headline suite queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"name": sec, ...}, "sf": 0.1}

Each query is forced to full execution with the ``noop`` sink (all
partitions computed, nothing collected to the driver), which is the
closest local analogue of a cluster write.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from res2df_spark import suite  # noqa: E402
from res2df_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries — one per operator family that matters at scale.
HEADLINE = [
    "a1_pricing_summary",      # groupBy agg, partial aggregation
    "a3_pair_aggregation",     # 4-way join + pair-key agg
    "a5_dedup_keep_last",      # window dedup (shuffle on keys)
    "j4_region_revenue",       # broadcast dim-chain join (TPC-H Q5 shape)
    "j9_asof_join",            # union-window as-of join
    "q3_top_orders",           # filtered join + top-k
    "w8_resample_monthly",     # date spine + cumulative window
    "r1_unroll_range",         # explode(sequence())
    "p11_interpolate",         # windowed linear interpolation
    "dedup_exact",             # hash groupBy
    "dedup_minhash_lsh",       # minhash + LSH banding
    "dedup_minhash_capped",    # LSH with hot-bucket cap (round 4)
    "dedup_simhash",           # relational simhash
    "ann_cosine_topk",         # brute-force cosine top-k
    "text_stats",              # array-native text metrics
    "text_fingerprint",        # min-hash fingerprint
    "mm_frame_sample",         # mapInPandas frame fan-out (round 3)
    "doc_chunk_overlap",       # sequence+explode chunking (round 3)
    "pack_sequences",          # sharded packing window (round 3)
    "decontaminate",           # broadcast benchmark-shingle join (round 4)
    "quality_gate",            # map-only rule bitmask (round 4)
    "emb_quantize",            # map-only uint8 codes (round 4)
    "dedup_incremental",       # novelty vs persisted band index (round 4)
    "tfidf_topk",              # tf ⋈ df + ranking window (round 4)
    "kmeans_assign",           # broadcast centroids, map-side argmin (round 4)
    "sessionize_events",       # gap sessionization, single exchange (round 4)
    "rep_ngram_stats",         # map-only repetition filters (round 4)
    "dup_spans",               # cross-corpus duplicate n-gram spans (round 4)
    "lm_quality",              # char-bigram LM scoring, map-only (round 4)
    "rolling_window",          # RANGE frame trailing aggregates (round 4)
    "funnel_conversion",       # sequential-pattern min-ts chain (round 4)
    "retention_grid",          # cohort grid, user-key-only shuffles (round 4)
    "curation_pipeline2",      # gate → cap → weighted sample composition (round 4)
    "semantic_dedup",          # two-level assignment + in-cluster pairs (round 5)
    "dedup_simhash_pairs",     # pigeonhole chunk buckets, capped (round 5)
    "record_linkage",          # blocked fuzzy pairs (round 5)
    "table_profile",           # one-pass column profiler (round 5)
    "stream_funnel",           # stateful streaming funnel replay (round 5)
    "stream_asof_enrich",      # streaming point-in-time enrich (round 9)
    "pq_recall",               # PQ encode+ADC+rerank vs exact recall (round 5)
    "bm25_topk",               # lexical retrieval, broadcast query postings (round 5)
    "corpus_entropy",          # dataset-card unigram stats (round 5)
    "emb_truncate",            # matryoshka prefix + renorm, map-only (round 5)
    "dedup_simhash_capped",    # simhash with the hot-bucket cap on (round 5)
    "soft_dedup_weights",      # SoftDeDup 1/group + commonness weights (round 5)
    "dsir_weights",            # hashed-n-gram importance weights (round 5)
    "nb_quality_score",        # Naive-Bayes quality log-odds (round 5)
    "dedup_containment",       # asymmetric containment pairs (round 5)
    "dedup_containment_capped",  # same with the stop-shingle cap on (round 5)
    "line_dedup",              # cross-doc segment dedup + rebuild (round 5)
    "pagerank_entities",       # 3-iteration graph rank, lineage-truncated (round 5)
    "value_anomalies",         # per-key z-score outliers (round 5)
    "dedup_minhash_verified",  # candidates -> exact-Jaccard verify (round 5)
    "minhash_recall",          # LSH recall vs exact-Jaccard truth (round 5)
    "curation_pipeline3",      # dedup -> soft weights -> top-k chain (round 5)
    "pagerank_dangling",       # mass-conserving PR, per-round scalar (round 6)
    "sessionize_chunked",      # skew-safe chunked sessionization (round 6)
    "rolling_chunked",         # skew-safe halo'd trailing window (round 6)
    "a5_dedup_keep_agg",       # partial-agg max_by keep-last (round 6)
    "dedup_shingle_df_stats",  # stop-shingle-cap drop accounting (round 6)
    "mm_features_arity",       # parametric-arity feature extract (round 6)
    "value_histogram",         # exact equal-width histogram (round 6)
    "hybrid_rrf",              # reciprocal-rank retrieval fusion (round 6)
    "dedup_simhash_pairs_xx",  # simhash pairing on xxhash64 (round 7)
    "dedup_containment_xx",    # integer-keyed inverted index (round 7)
    "j9_asof_chunked",         # skew-safe chunk-carried as-of join (round 7)
    "curation_pipeline3_xx",   # composed pipeline, xxhash64 profile (round 8)
    "j9_asof_nearest",         # nearest-direction chunked as-of join (round 8)
]


def infer_sf(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def run_one(spark, name: str, repeats: int = 5) -> float:
    """Best-of-N execution time: the environment shows intermittent
    host-level CPU noise (identical hot plans oscillating 1s ↔ 10s —
    BENCH_r01 recorded 21 s for a query that measures 0.9 s quiet), so
    a single sample is dominated by scheduler luck; min-of-5 measures
    the plan.

    Returns ``(build_secs, exec_best_secs)``.  Construction is timed
    SEPARATELY because the two costs mean different things: iterative
    operators (pagerank, connected components) materialize their
    per-round ``localCheckpoint`` eagerly at build time — execution-only
    timing would hide that work entirely (measured: pagerank_entities
    reads 0.025 s exec-only vs ~3.7 s of real per-run cost) — while
    folding construction into every repeat inflates all 50 queries by a
    ~0.3-0.5 s re-analysis constant that would read as a fake
    regression against earlier rounds' exec-only numbers.  So
    ``queries`` stays exec-only best-of-N (round-comparable) and
    ``build`` carries each query's one-shot construction cost; read
    BOTH for operators whose docstrings note eager materialization.

    Returns ``(build_secs, samples)`` — ALL repeat timings, so the
    artifact can carry median/stdev next to the best: three sub-second
    queries drifted 1.2-1.4× between rounds 4 and 5 on identical code,
    and without per-query variance the artifact could not show that was
    host noise rather than a regression."""
    t0 = time.time()
    df = suite.QUERIES[name](spark, SF_DIR)
    build = time.time() - t0
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
    return build, samples


def _load_prev() -> dict[str, float]:
    """Previous round's per-query timings for mover adjudication:
    ``$SPARK_GRAFT_BENCH_PREV`` (a bench JSON path) or the newest
    ``BENCH_r*.json`` the driver left in the repo dir.  Only float
    entries are comparable."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    env = os.environ.get("SPARK_GRAFT_BENCH_PREV")
    def _round_no(p: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1  # digit-less stragglers sort first

    cands = (
        [env]
        if env
        else sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), key=_round_no)
    )
    for path in reversed(cands):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        queries = (rec.get("parsed") or rec).get("queries") or {}
        floats = {k: v for k, v in queries.items() if isinstance(v, (int, float))}
        if floats:
            return floats
    return {}


def _isolated_rerun(name: str) -> float | None:
    """Fresh-JVM best-of-3 for one query — the manual adjudication
    protocol for >2× movers (rounds 8-9 both burned analysis time on
    phantom regressions that a quiet-host rerun dissolved), promoted
    into the artifact itself.  A separate process = separate JVM, so
    the rerun sees none of the main session's heap/GC state."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True, timeout=600,
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001 — adjudication is best-effort
        return None


def _only(name: str) -> None:
    """--only NAME: time one query in this (fresh) session, print the
    best-of-3 exec seconds as the last stdout line."""
    spark = get_spark("res2df-spark-bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        run_one(spark, "dedup_exact", repeats=2)  # warm footers/JVM
    except Exception:  # noqa: BLE001
        pass
    # more repeats than the main loop: a fresh JVM JITs as it goes, so
    # early samples read high — min-of-7 lets codegen settle
    _, samples = run_one(spark, name, repeats=7)
    print(round(min(samples), 3))


def main() -> None:
    spark = get_spark("res2df-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch overhead
    try:
        run_one(spark, "dedup_exact", repeats=1)
    except Exception as exc:  # noqa: BLE001 — warmup failure is non-fatal
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Per-query error isolation: one failing query must never zero out the
    # whole artifact — record its error string and keep timing the rest.
    timings: dict[str, object] = {}
    builds: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        try:
            build, samples = run_one(spark, name)
            best = min(samples)
            srt = sorted(samples)
            n = len(srt)
            median = (
                srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) / 2
            )
            mean = sum(samples) / n
            stdev = (sum((s - mean) ** 2 for s in samples) / n) ** 0.5
            timings[name] = round(best, 3)
            builds[name] = round(build, 3)
            stats[name] = {
                "best": round(best, 3),
                "median": round(median, 3),
                "stdev": round(stdev, 3),
            }
        except Exception as exc:  # noqa: BLE001
            timings[name] = {"err": f"{type(exc).__name__}: {exc}"[:500]}
    errors = [n for n, t in timings.items() if not isinstance(t, float)]
    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)

    # Self-adjudication of >2× movers vs the previous round: re-time
    # each suspect in a FRESH process (new JVM).  If the isolated
    # number lands back within 1.5× of the previous round, the mover
    # is host noise ("suspect": "host") — the code did not regress;
    # if it stays slow, it is flagged "confirmed" for human attention.
    prev = _load_prev()
    movers = [
        n for n, t in timings.items()
        if isinstance(t, float)
        and isinstance(prev.get(n), (int, float))
        and prev[n] >= 0.05
        and t > 2.0 * prev[n]
    ]
    recheck: dict[str, dict[str, object]] = {}
    for n in movers[:8]:  # bound the fresh-JVM cost
        iso = _isolated_rerun(n)
        recheck[n] = {
            "prev": prev[n],
            "main": timings[n],
            "isolated": iso,
            # three-band verdict: back near prev → host noise; still
            # >2× on a fresh JVM → a real regression; the band between
            # is inconclusive (fresh-JVM JIT can inflate sub-second
            # queries ~1.5-2× even with the settle repeats)
            "suspect": (
                "unknown" if iso is None
                else "host" if iso <= 1.5 * prev[n]
                else "confirmed" if iso > 2.0 * prev[n]
                else "inconclusive"
            ),
        }
    if len(movers) > 8:
        for n in movers[8:]:
            recheck[n] = {"prev": prev[n], "main": timings[n],
                          "isolated": None, "suspect": "unchecked"}
    record = {
        "metric": "headline_suite_total",
        # a partial total would read as a speedup; flag it instead
        "value": total if not errors else None,
        "unit": "sec",
        "queries": timings,
        # one-shot construction cost per query; this is where eagerly
        # materialized work (pagerank's checkpoint rounds, model
        # collects) shows up — see run_one's docstring
        "build": builds,
        "build_total": round(sum(builds.values()), 3),
        # per-query {best, median, stdev} over the N repeats: a future
        # drift in `queries` is distinguishable from host noise by
        # whether the medians moved beyond their own stdev bands
        "stats": stats,
        "sf": infer_sf(SF_DIR),
    }
    if errors:
        record["errors"] = errors
        record["partial_total"] = total
    if recheck:
        record["recheck"] = recheck

    # The FULL record (build + per-query variance stats) outgrew the
    # driver's stdout tail capture — BENCH_r06/r07 both recorded
    # "parsed": null with a truncated tail.  So the full record goes to
    # a sidecar file and stdout carries exactly ONE compact line (the
    # LAST line): totals, best-only per-query timings, sf, query count,
    # and the sidecar path.  The compact line is self-sufficient for
    # round-over-round comparison; the sidecar adds variance/build.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_full_stats.json"),
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(record, fh)
            fh.write("\n")
    except OSError as exc:
        print(f"could not write full stats to {full_path}: {exc}", file=sys.stderr)
        full_path = None
    compact = {
        "metric": "headline_suite_total",
        "value": record["value"],
        "unit": "sec",
        "queries": timings,
        "sf": record["sf"],
        "n_queries": len(HEADLINE),
        "build_total": record["build_total"],
        "full_stats": full_path,
    }
    if errors:
        compact["errors"] = errors
        compact["partial_total"] = total
    if recheck:
        # compact form: name → suspect tag (+ isolated secs when run)
        compact["recheck"] = {
            n: (
                f"{r['suspect']}:{r['isolated']}"
                if r.get("isolated") is not None
                else r["suspect"]
            )
            for n, r in recheck.items()
        }
    print(json.dumps(compact))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--only":
        _only(sys.argv[2])
    else:
        main()
