"""Round-12 optimization pins.

The word-level (``shingle_k=None``) stop-token cap in
``llm/dedup._doc_token_sets`` is a broadcast anti-join of
partial-aggregated cap VIOLATORS, never a window count over the raw
token key: a unigram stop word appears in ~every document, and a window
count would funnel its entire postings list into one un-splittable
window task (no partial aggregation; AQE cannot split window
partitions).  Shingle-keyed callers keep the window form (k-word keys
dilute hot-key mass, and the cap discards the keys it counts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from res2df_spark.llm.dedup import _doc_token_sets, ngram_jaccard_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 'the' is in every document (the stop-word hot key);
        # 'alpha beta' pairs overlap across the first three docs
        (1, "the alpha beta gamma"),
        (2, "the alpha beta delta"),
        (3, "the alpha beta gamma delta"),
        (4, "the epsilon zeta"),
        (5, "the epsilon zeta eta"),
        (6, "the theta"),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_cap_matches_window_recount(spark, docs):
    """Anti-join cap form == the window-count definition of the cap."""
    got = sorted(
        tuple(r)
        for r in _doc_token_sets(docs, "doc_id", "text", 5, None).collect()
    )
    from res2df_spark.functions.textan import tokens

    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("token"),
    )
    want = sorted(
        tuple(r)
        for r in toks.withColumn(
            "__tdf", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
        .filter(F.col("__tdf") <= 5)
        .drop("__tdf")
        .collect()
    )
    assert got == want
    # the cap actually fired: 'the' (df 6 > 5) is gone
    assert all(t != "the" for _, t in got)


def test_word_cap_plan_has_no_window(docs):
    """The word-level capped postings plan must carry NO window over the
    raw token key — the cap is a broadcast anti-join of violators."""
    plan = (
        _doc_token_sets(docs, "doc_id", "text", 5, None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "LeftAnti" in plan


def test_shingle_cap_keeps_window_form(docs):
    """Shingle-keyed callers keep the single-pass window cap."""
    plan = (
        _doc_token_sets(docs, "doc_id", "text", 5, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan


def test_tfidf_single_scan_reuse(spark, docs):
    """tfidf_topk's df and N branches ride the one (doc, term) exchange
    (ReuseExchange) instead of re-running the tf lineage — and the df
    values still equal an independent recount."""
    from res2df_spark.llm.vocab import tfidf_topk

    # AQE wraps the static plan (reuse then happens per-stage at
    # runtime); disable it for the assertion so ReusedExchange is
    # visible in the compiled plan, like tools/dump_plans.py does
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = tfidf_topk(docs, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("ReusedExchange") >= 2
    rows = out.collect()
    assert rows
    from res2df_spark.functions.textan import tokens

    df_re = {
        r["term"]: r["df"]
        for r in docs.select(
            "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    assert all(r["df"] == df_re[r["term"]] for r in rows)


def test_minhash_bands_tag_roundtrip(spark, docs):
    """``_minhash_bands(tag=...)`` carries min(tag) through the
    signature aggregate without changing any (id, band_idx, band_key)
    row — the branch-after-aggregate contract dedup_incremental's
    single tokenize pass relies on."""
    from res2df_spark.llm.dedup import _minhash_bands

    plain = sorted(
        tuple(r)
        for r in _minhash_bands(docs, "doc_id", "text", 8, 4, None).collect()
    )
    tagged = _minhash_bands(
        docs, "doc_id", "text", 8, 4, None, tag=F.col("doc_id") % 2
    )
    assert tagged.columns == ["doc_id", "band_idx", "band_key", "__tag"]
    rows = tagged.collect()
    assert sorted((r[0], r[1], r[2]) for r in rows) == plain
    assert all(r["__tag"] == r["doc_id"] % 2 for r in rows)


def test_sessionize_chunked_offsets_share_scan(spark):
    """With a pre-projected input, sessionize_chunked's chunk-grain
    offsets branch rides the body branch's union exchange
    (ReuseExchange) instead of re-running the scan + halo pipeline —
    and ids still equal the plain form's."""
    from res2df_spark.operators.sessionize import (
        sessionize,
        sessionize_chunked,
    )

    rows = []
    for u in range(4):
        for e in range(12):
            rows.append((u * 100 + e, f"2024-01-01 {e:02d}:{u:02d}:00", u))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kwargs = dict(
        ts_col="ts", keys=["user_id"], gap_seconds=3600,
        tiebreak=["event_id"],
    )
    chunked = sessionize_chunked(df, chunk_seconds=7200, **kwargs)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = chunked._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan
    got = sorted(
        tuple(r) for r in chunked.select("event_id", "session_id").collect()
    )
    want = sorted(
        tuple(r)
        for r in sessionize(df, **kwargs)
        .select("event_id", "session_id")
        .collect()
    )
    assert got == want


def test_semantic_pairs_arrow_matches_fold(spark):
    """The per-cluster Arrow pair scorer must reproduce the JVM dot-fold
    form exactly — including zero-norm vectors (sim 0.0, never a
    division error) and ragged dims (NULL-poisoned sim → dropped)."""
    from res2df_spark.functions.vectors import dot
    from res2df_spark.llm.similarity import (
        seed_centroids,
        semantic_dedup_pairs,
        two_level_assign,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),   # zero norm: pairs score 0.0
        (5, [1.0, 0.0, 0.0]),        # ragged: NULL sim vs 4-dim peers
        (6, [0.5, 0.5, 0.5, 0.5]),
        (7, [0.45, 0.55, 0.5, 0.5]),
        (8, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = seed_centroids(emb, 2)
    got = sorted(
        tuple(r)
        for r in semantic_dedup_pairs(emb, cents, threshold=0.1).collect()
    )
    # independent recount: the pre-round-12 join + fold form
    sides = two_level_assign(emb, cents)
    a = sides.select(
        "centroid_id", F.col("vec_id").alias("id_1"),
        F.col("__v").alias("__v1"), F.col("__n").alias("__n1"),
    )
    b = sides.select(
        "centroid_id", F.col("vec_id").alias("id_2"),
        F.col("__v").alias("__v2"), F.col("__n").alias("__n2"),
    )
    denom = F.col("__n1") * F.col("__n2")
    sim = F.when(
        denom > 0, dot(F.col("__v1"), F.col("__v2")) / denom
    ).otherwise(F.lit(0.0))
    want = sorted(
        tuple(r)
        for r in a.join(b, "centroid_id")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= 0.1)
        .select(
            "id_1", "id_2", "centroid_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .collect()
    )
    assert got == want
    assert got  # the fixture must actually produce pairs


def test_word_capped_jaccard_pairs(docs):
    """End-to-end word-level capped pairing: 'the' contributes no
    pairs, rare-token overlap survives, sizes are post-cap."""
    out = {
        (r["d1"], r["d2"]): r
        for r in ngram_jaccard_pairs(
            docs, threshold=0.4, max_token_df=5, shingle_k=None
        ).collect()
    }
    # docs 1/2/3 share {alpha, beta} (+gamma/delta variants); post-cap
    # sizes exclude 'the' (doc1 -> {alpha,beta,gamma} = 3)
    assert (1, 3) in out
    assert out[(1, 3)]["size1"] == 3
    # docs 4/5 share {epsilon, zeta}: jaccard 2/3
    assert (4, 5) in out
    assert abs(out[(4, 5)]["jaccard"] - 2 / 3) < 1e-9
    # doc 6 shares only 'the' with everyone: no pair survives
    assert not any(6 in p for p in out)


def test_asof_chunked_null_times_ride_the_union_window(spark):
    """Round 12: asof_join_chunked no longer re-scans the left table to
    re-attach NULL-time rows — they ride the main union-window with a
    NULL chunk (their (keys, NULL) partition holds no observation, and
    the window form guarantees NULL payload in every direction).  Pins
    (a) the semantics: NULL-time left rows keep their row with NULL
    payload while their key still cross-chunk-matches normally, and
    (b) the plan: ONE Union (the carries), not two — the second was
    the NULL-time re-attach branch."""
    import datetime as dt

    from res2df_spark.operators.asof import asof_join, asof_join_chunked

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [
            ("k", None, 0),                              # NULL time
            ("k", base + dt.timedelta(days=20), 1),      # cross-chunk carry
            (None, None, 2),                             # NULL key + NULL time
            (None, base + dt.timedelta(days=20), 3),     # NULL key carry
        ],
        "k string, t timestamp, qid long",
    )
    rdf = spark.createDataFrame(
        [("k", base, 1.0), (None, base, 2.0)], "k string, t timestamp, v double"
    )
    for direction in ("backward", "forward", "nearest"):
        kw = dict(
            on=["k"], left_time="t", right_time="t",
            value_cols=["v"], direction=direction,
        )
        chunked = asof_join_chunked(ldf, rdf, chunk_seconds=86400 * 7, **kw)
        got = {r["qid"]: r["v"] for r in chunked.collect()}
        want = {
            r["qid"]: r["v"]
            for r in asof_join(ldf, rdf, skew_safe=False, **kw).collect()
        }
        assert got == want
        assert got[0] is None and got[2] is None  # NULL-time rows kept, NULL payload
        if direction != "forward":
            assert got[1] == 1.0 and got[3] == 2.0  # carries still work
        plan = chunked._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Union") == 1, plan


def test_sessionize_chunked_null_ts_single_pass(spark):
    """Round 12: NULL-ts rows ride sessionize_chunked's main pipeline
    in the __chunk = -1 cell (no re-attach filter-scan + union).  Pins
    the semantics — NULL ids for NULL-ts rows, real ids UNSHIFTED by
    their presence (the -1 cell must add 0 to every chunk offset) —
    and the plan: ONE Union (the halo), not two."""
    from res2df_spark.operators.sessionize import sessionize, sessionize_chunked

    rows = []
    for u in (1, 2, None):
        rows.append((hash((u, -1)) % 10_000 + 20_000, None, u))
        for e in range(8):
            rows.append((
                (0 if u is None else u) * 100 + e,
                f"2024-01-01 {e:02d}:00:00",
                u,
            ))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kwargs = dict(
        ts_col="ts", keys=["user_id"], gap_seconds=3600,
        tiebreak=["event_id"],
    )
    chunked = sessionize_chunked(df, chunk_seconds=7200, **kwargs)
    # physical plan FIRST (before any action caches the AQE-final
    # QueryExecution; AQE off like the shared-scan test): the halo
    # union only — the NULL-ts re-attach union is gone — and the
    # offsets branch still rides the body's exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = chunked._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("Union") == 1, plan
    assert "ReusedExchange" in plan
    got = {r["event_id"]: r["session_id"] for r in chunked.collect()}
    want = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, **kwargs).collect()
    }
    assert got == want
    assert len(got) == len(rows)
    assert sum(v is None for v in got.values()) == 3  # the NULL-ts rows


def test_rolling_chunked_null_ts_single_pass(spark):
    """Round 12: rolling_agg_chunked's NULL-ts rows ride the main
    pipeline in the NULL-chunk cell instead of a re-attach filter-scan
    + union.  The recompute engine's RANGE frame natively collapses to
    the NULL peer group there; the prefix engine's difference reads 0
    and gates to aggregates over its own (unbounded, current) spec.
    Pins both engines against the plain form on a fixture with NULL-ts
    rows (including an all-NULL-value group and a NaN), and the plan:
    ONE Union (the halo), not two."""
    from res2df_spark.operators.eventanalytics import (
        rolling_agg,
        rolling_agg_chunked,
    )

    rows = []
    eid = 0
    for u in (1, 2, None):
        for v in (1.5, None, float("nan")) if u == 1 else (None, None):
            rows.append((eid, None, u, v)); eid += 1
        for e in range(6):
            rows.append((eid, f"2024-01-01 00:{e * 9:02d}:00", u, float(e)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cols = ["event_id", "n_window", "sum_window"]

    def _collect(df):
        out = []
        for r in sorted(df.select(*cols).collect(), key=lambda r: r[0]):
            s = r["sum_window"]
            out.append((r[0], r[1], "nan" if s is not None and s != s else s))
        return out

    plain = _collect(rolling_agg(ev, "ts", ["user_id"], "value", 1800))
    for method in ("prefix", "recompute"):
        chunked = rolling_agg_chunked(
            ev, "ts", ["user_id"], "value", 1800,
            chunk_seconds=3600, method=method,
        )
        plan = chunked._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Union") == 1, (method, plan)
        assert _collect(chunked) == plain, method
