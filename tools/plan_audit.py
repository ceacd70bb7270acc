"""Fleet-wide physical-plan audit over the whole query registry.

For every ``suite.QUERIES`` entry this builds the DataFrame (lazy — no
job runs for batch queries) against ``SPARK_GRAFT_CHECK_SF`` and
inspects the FORMATTED physical plan for the anti-patterns that matter
at 100 TB:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins;
- ``BatchEvalPython`` — row-at-a-time Python UDF in the hot path (the
  Arrow-batched forms ``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas`` are counted separately and are fine);
- shuffle pressure: every ``Exchange hashpartitioning`` / ``range`` /
  ``SinglePartition`` (a SinglePartition exchange over big data is a
  serialization point);
- scan hygiene: per-parquet-scan ``PushedFilters`` and ``ReadSchema``
  width (a scan reading every column for a 2-column projection means
  pruning failed);
- ``WholeStageCodegen`` span count (JVM codegen coverage).

Usage: python tools/plan_audit.py [--json FILE] [query ...]

Exit 1 if any query's plan contains a CartesianProduct or a
row-at-a-time Python UDF; everything else is recorded, not judged —
``SinglePartition`` exchanges, for instance, are correct for bounded
model artifacts (codebooks, centroid tables) and the JSON keeps enough
context to tell.

Streaming-replay queries (``stream_*``) EXECUTE during build (their
queries() callables run an AvailableNow stream and return the result);
their recorded plan describes the materialized result read, so they are
marked ``"kind": "materialized"`` and their plan features are not
meaningful for the streaming half — test_plans.py pins those shapes
instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

#: BroadcastNestedLoopJoin is the CORRECT plan for two families this
#: engine uses deliberately; anything else containing one is flagged.
#: (a) a one-row / bounded model or stats table joined with no key —
#:     codebooks, centroid tables, char-LM LUTs, corpus-level stats,
#:     mixture weights: broadcast of a bounded artifact, corpus-side
#:     map-only;
#: (b) a non-equi join whose broadcast side is a small dim — wildcard
#:     pattern match, date-range bracketing, K-range lumping, or a
#:     broadcast query/probe set against the corpus (brute-force ANN /
#:     shortlist rerank by design).
BNLJ_INTENTIONAL = {
    "ann_cosine_topk": "broadcast query set x corpus: brute-force ANN by design",
    "ann_lsh_bucketed": "broadcast probe set; bucket join bounds the corpus side",
    "ann_lsh_multiprobe": "broadcast probe set; bucket join bounds the corpus side",
    "ann_ivf_topk": "broadcast query+centroid tables; probed-list join",
    "pq_recall": "broadcast codebook + query tables (bounded artifacts)",
    "kmeans_assign": "broadcast centroid table, map-side argmin",
    "semantic_dedup": "broadcast coarse+fine centroid tables (two-level)",
    "semantic_novelty": "broadcast persisted cluster index stats",
    "dedup_embedding_cosine": "broadcast query embeddings x corpus by design",
    "lm_quality": "broadcast one-row char-LM LUT (alphabet-bounded)",
    "tfidf_topk": "broadcast one-row corpus df table (vocab-bounded)",
    "vocab_topk": "broadcast one-row totals table",
    "bm25_topk": "broadcast one-row corpus stats (N, avgdl)",
    "dsir_weights": "broadcast one-row source/target LM tables (bounded)",
    "nb_quality_score": "broadcast one-row NB model table (bounded)",
    "temperature_mix": "broadcast one-row mixture-weight table",
    "mix_plan": "broadcast one-row plan table",
    "decayed_user_value": "broadcast one-row reference-time table",
    "value_histogram": "broadcast one-row min/max bounds table",
    "hybrid_rrf": "broadcast query set x corpus: exact retrieval inputs by design",
    "r3_wildcard_expand": "non-equi rlike join; broadcast side = pattern list",
    "w7_tree_snapshot": "non-equi date-range join; broadcast side = snapshot dates",
    "w8_resample_linear": "non-equi bracketing join; broadcast side = date spine",
    "compdat_pipeline": "non-equi K-range COMPLUMP join; broadcast side = lump table",
}


def explain_string(spark, df, mode: str) -> str:
    qe = df._jdf.queryExecution()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(jmode)


def scan_features(plan: str) -> list[dict]:
    """Per-scan PushedFilters / ReadSchema width from the formatted
    plan's operator-detail section.  Each `(N) OpName` detail block is
    isolated FIRST so a block missing its ReadSchema line (format
    drift, truncated output) can never bleed the lazy search into the
    next scan's details."""
    scans = []
    # split the detail section into per-operator blocks at each
    # column-0 '(N) ' header; keep header with its block body
    blocks = re.split(r"(?m)^(?=\(\d+\) )", plan)
    for block in blocks:
        if not re.match(r"\(\d+\) Scan parquet", block):
            continue
        pf_m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        rs_m = re.search(r"ReadSchema: (.*)", block)
        pf = (pf_m.group(1) if pf_m else "").strip()
        rs = rs_m.group(1) if rs_m else ""
        ncols = rs.count(":") if rs.startswith("struct<") else None
        scans.append(
            {
                "pushed_filters": [f.strip() for f in pf.split(",") if f.strip()],
                "read_columns": ncols,
            }
        )
    return scans


def audit_one(spark, name: str, fn) -> dict:
    t0 = time.time()
    df = fn(spark, SF_DIR)
    plan = explain_string(spark, df, "formatted")
    simple = explain_string(spark, df, "simple")
    # the formatted detail section lists each operator exactly once as
    # '(N) OpName' at column 0 (tree lines are indented / 'Name (N)')
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    # an Exchange's partitioning lives on its 'Arguments:' detail line
    # (an 'Input [...]' line sits between the op header and Arguments)
    ex_args = re.findall(
        r"^\(\d+\) Exchange\n(?:Input[^\n]*\n)?Arguments: ([^\n]+)", plan, re.M
    )
    rec = {
        "kind": "materialized" if name.startswith("stream_") else "batch",
        "cartesian": "CartesianProduct" in ops,
        "nested_loop_join": "BroadcastNestedLoopJoin" in ops,
        "python_row_udf": "BatchEvalPython" in ops,
        "arrow_python_ops": sum(
            ops.count(o)
            for o in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "FlatMapGroupsInPandasWithState",
                "MapInArrow",
            )
        ),
        "exchanges_hash": sum("hashpartitioning" in a for a in ex_args),
        "exchanges_range": sum("rangepartitioning" in a for a in ex_args),
        "exchanges_single": sum("SinglePartition" in a for a in ex_args),
        "exchanges_roundrobin": sum(
            "RoundRobinPartitioning" in a for a in ex_args
        ),
        "broadcast_exchanges": ops.count("BroadcastExchange"),
        "sort_merge_joins": ops.count("SortMergeJoin"),
        "broadcast_hash_joins": ops.count("BroadcastHashJoin"),
        # distinct whole-stage-codegen spans from the simple plan's
        # '*(id)' markers — formatted mode hides codegen ids
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "scans": scan_features(plan),
        "build_s": round(time.time() - t0, 2),
    }
    return rec


def main() -> int:
    from res2df_spark import suite
    from res2df_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: plan_audit.py [--json FILE] [query ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    unknown = only - set(suite.QUERIES)
    if unknown:
        # a typo'd name must not produce a green zero-query audit
        print(f"unknown quer{'y' if len(unknown) == 1 else 'ies'}: "
              f"{sorted(unknown)}")
        return 2

    spark = get_spark("plan-audit")
    # AQE wraps every plan in AdaptiveSparkPlan, which hides whole-stage
    # codegen ids until execution; the audit wants the static plan's
    # codegen spans (scan hygiene / operator choice are identical)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    records: dict[str, dict] = {}
    for name, fn in suite.QUERIES.items():
        if only and name not in only:
            continue
        try:
            rec = audit_one(spark, name, fn)
        except Exception as e:  # noqa: BLE001
            records[name] = {"err": str(e)[:300]}
            print(f"ERR  {name}: {e}")
            continue
        flags = []
        if rec["cartesian"]:
            flags.append("CARTESIAN")
        if rec["python_row_udf"]:
            flags.append("ROW_UDF")
        if rec["nested_loop_join"]:
            if name in BNLJ_INTENTIONAL:
                rec["bnlj_reason"] = BNLJ_INTENTIONAL[name]
            else:
                flags.append("BNLJ_UNEXPLAINED")
        records[name] = rec
        shuffles = (
            rec["exchanges_hash"]
            + rec["exchanges_range"]
            + rec["exchanges_single"]
            + rec["exchanges_roundrobin"]
        )
        print(
            f"{'FLAG' if flags else 'ok  '} {name}: "
            f"{shuffles} shuffle(s), {rec['broadcast_exchanges']} bcast, "
            f"{rec['codegen_spans']} codegen, {rec['arrow_python_ops']} arrow-py"
            + (f"  [{','.join(flags)}]" if flags else "")
        )
    n_flagged = sum(
        1
        for name, r in records.items()
        if r.get("kind") == "batch"
        and (
            r.get("cartesian")
            or r.get("python_row_udf")
            or (r.get("nested_loop_join") and name not in BNLJ_INTENTIONAL)
        )
    )
    summary = {
        "queries": len(records),
        "flagged": n_flagged,
        "errors": sum(1 for r in records.values() if "err" in r),
        "sf_dir": SF_DIR,
    }
    print(json.dumps(summary))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "plans": records}, f, indent=1, sort_keys=True)
    return 1 if (summary["flagged"] or summary["errors"]) else 0


if __name__ == "__main__":
    sys.exit(main())
