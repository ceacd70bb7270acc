"""Corpus-statistics operators (llm/vocab.py), temperature mixing
(llm/curation.temperature_mix) and distributed k-means
(llm/similarity.assign_nearest / kmeans_fit)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from res2df_spark.llm.curation import temperature_mix
from res2df_spark.llm.similarity import assign_nearest, kmeans_fit
from res2df_spark.llm.vocab import (
    boilerplate_score,
    bpe_pair_counts,
    build_vocab,
    tfidf_topk,
)
from tests.conftest import rows


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark catalyst engine"),
            (2, "spark engine tungsten codegen"),
            (3, "catalyst optimizer rewrites plans"),
            (4, "engine engine room"),
            (5, ""),
        ],
        "doc_id int, text string",
    )


def test_tfidf_scores_and_ranking(spark):
    out = tfidf_topk(_docs(spark), k=2)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in rows(out, "doc_id", "term", "tf", "df", "tfidf", "rnk")
    }
    # doc 1: 'spark' tf=3 df=2 → 3·ln(4/2); 'catalyst' tf=1 df=2 → ln(2)
    # N counts documents CONTRIBUTING terms — the empty doc 5 has no
    # postings and must not inflate idf
    n = 4
    assert got[(1, "spark")][0] == 3 and got[(1, "spark")][1] == 2
    assert got[(1, "spark")][2] == pytest.approx(
        round(3 * math.log(n / 2), 6)
    )
    assert got[(1, "spark")][3] == 1
    # k=2 → no doc has more than 2 rows; empty doc has none
    per_doc = {}
    for (d, _t), _v in got.items():
        per_doc[d] = per_doc.get(d, 0) + 1
    assert max(per_doc.values()) <= 2 and 5 not in per_doc


def test_tfidf_tie_break_by_term(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c")], "doc_id int, text string"
    )
    out = tfidf_topk(df, k=1)
    # in docs 1 and 2, terms a and b tie exactly (tf=1, df=2):
    # deterministic winner is the lexicographically smaller term
    got = {r[0]: r[1] for r in rows(out, "doc_id", "term")}
    assert got[1] == "a" and got[2] == "a"


def test_build_vocab_ranks_and_coverage(spark):
    out = build_vocab(_docs(spark), vocab_size=3)
    got = rows(out, "rank", "term", "n", "cum_coverage")
    # counts: spark 4, engine 4, catalyst 2, ... ties break by term
    assert got[0][:3] == (1, "engine", 4)
    assert got[1][:3] == (2, "spark", 4)
    assert got[2][:3] == (3, "catalyst", 2)
    total = 16  # total token occurrences
    assert got[0][3] == pytest.approx(round(4 / total, 6))
    assert got[2][3] == pytest.approx(round(10 / total, 6))


def test_bpe_pair_counts(spark):
    out = bpe_pair_counts(_docs(spark), top_k=2)
    got = set(rows(out, "left", "right", "pair_count"))
    # 'spark spark' appears twice (doc 1); every other pair once →
    # second place is the lexicographically smallest of the count-1 ties
    assert ("spark", "spark", 2) in got
    assert ("catalyst", "engine", 1) in got
    assert len(got) == 2


def test_boilerplate_score(spark):
    # the shingle "x y z" appears in 3 docs; hot_df=2 flags it
    df = spark.createDataFrame(
        [
            (1, "x y z a"),
            (2, "x y z b"),
            (3, "x y z"),
            (4, "p q r"),
        ],
        "doc_id int, text string",
    )
    out = boilerplate_score(df, shingle_k=3, hot_df=2)
    got = {r[0]: r[1:] for r in rows(out, "doc_id", "n_shingles", "n_hot", "boilerplate_frac")}
    assert got[1] == (2, 1, 0.5)  # 'x y z' hot, 'y z a' not
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_temperature_mix_alpha1_noop_and_flattening(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 240, "en").otherwise("fr").alias("source"),
    )
    # alpha=1 → every threshold is 256 → no row dropped
    assert temperature_mix(df, alpha=1.0).count() == 300
    out = temperature_mix(df, alpha=0.5)
    kept = {r[0]: r[1] for r in rows(out.groupBy("source").count(), "source", "count")}
    # rarest source keeps everything; majority thinned toward sqrt mix:
    # rate_en = (240^-.5)/(60^-.5) = 0.5 → threshold 128 ≈ half kept
    assert kept["fr"] == 60
    assert 90 <= kept["en"] <= 150
    # determinism: same rows on re-run
    again = {r[0] for r in rows(temperature_mix(df, alpha=0.5), "doc_id")}
    assert {r[0] for r in rows(out, "doc_id")} == again


def test_temperature_mix_rejects_bad_alpha(spark):
    df = spark.range(2).select(F.col("id").alias("doc_id"), F.lit("s").alias("source"))
    with pytest.raises(ValueError):
        temperature_mix(df, alpha=0.0)


def _vecs(spark):
    # two tight clusters around (0,0) and (10,10), plus one outlier
    pts = [
        (0, [0.0, 0.1]), (1, [0.1, 0.0]), (2, [0.0, -0.1]),
        (3, [10.0, 10.1]), (4, [10.1, 10.0]), (5, [9.9, 10.0]),
        (6, [100.0, 100.0]),
    ]
    return spark.createDataFrame(pts, "vec_id int, embedding array<float>")


def test_assign_nearest_argmin_and_ties(spark):
    emb = _vecs(spark)
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "centroid_id int, centroid array<double>",
    )
    out = {r[0]: r[1] for r in rows(assign_nearest(emb, cents), "vec_id", "centroid_id")}
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] == 1 and out[4] == 1 and out[5] == 1
    assert out[6] == 1  # outlier goes to the nearer centroid
    # exact tie → lower centroid id wins
    tie = spark.createDataFrame([(9, [5.0, 5.0])], "vec_id int, embedding array<float>")
    assert rows(assign_nearest(tie, cents), "centroid_id")[0][0] == 0


def _inertia(emb, cents):
    return (
        assign_nearest(emb, cents)
        .agg(F.sum("sq_dist").alias("s"))
        .collect()[0]["s"]
    )


def test_kmeans_fit_converges_and_is_deterministic(spark):
    emb = _vecs(spark)
    c1 = kmeans_fit(emb, k=2, iters=1)
    c3 = kmeans_fit(emb, k=2, iters=3)
    # Lloyd's never increases inertia
    assert _inertia(emb, c3) <= _inertia(emb, c1) + 1e-9
    # deterministic: identical centroids on re-run
    a = sorted(rows(kmeans_fit(emb, k=2, iters=3), "centroid_id", "centroid"))
    b = sorted(rows(kmeans_fit(emb, k=2, iters=3), "centroid_id", "centroid"))
    assert a == b
    # with both lowest-id init centroids inside the near cluster,
    # Lloyd's deterministically converges to the local optimum that
    # isolates the far outlier: {0..5} together, {6} alone
    assign = {
        r[0]: r[1]
        for r in rows(assign_nearest(emb, c3), "vec_id", "centroid_id")
    }
    assert len({assign[i] for i in range(6)}) == 1
    assert assign[6] != assign[0]


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over 3 identical points: clusters 1/2 go empty after the
    # first assignment (all points tie to centroid 0) but must survive
    emb = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    out = rows(kmeans_fit(emb, k=3, iters=2), "centroid_id", "n_members")
    assert sorted(r[0] for r in out) == [0, 1, 2]
    members = {r[0]: r[1] for r in out}
    assert members[0] == 3 and members[1] == 0 and members[2] == 0


def test_semantic_dedup_pairs_within_cluster_only(spark):
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = spark.createDataFrame(
        [
            # cluster 0: two near-identical + one orthogonal-ish
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),
            (2, [0.0, 0.2, 0.0]),
            # cluster 1: a near-dup pair far from cluster 0
            (3, [0.0, 0.0, 10.0]),
            (4, [0.0, 0.01, 10.0]),
            # cross-cluster near-dup that must NOT be compared: close to
            # id 0 in direction but assigned to centroid 1 by L2
            (5, [6.0, 0.0, 9.0]),
        ],
        "vec_id int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 10.0])],
        "centroid_id int, centroid array<double>",
    )
    out = rows(
        semantic_dedup_pairs(emb, cents, threshold=0.95),
        "id_1", "id_2", "centroid_id",
    )
    assert (0, 1, 0) in out
    assert (3, 4, 1) in out
    # ids 0 and 5 have cosine ~0.55 anyway, but even a high-cosine
    # cross-cluster pair would be invisible: no pair spans clusters
    assigned = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    for i1, i2, _c in out:
        assert assigned[i1] == assigned[i2]


def test_semantic_dedup_cluster_cap_drops_hot_cluster(spark):
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    # 5 identical vectors = one hot cluster of 5; cap at 4 → no pairs
    emb = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(5)],
        "vec_id int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0])], "centroid_id int, centroid array<double>"
    )
    assert (
        semantic_dedup_pairs(emb, cents, threshold=0.5, max_cluster_size=4).count()
        == 0
    )
    assert (
        semantic_dedup_pairs(emb, cents, threshold=0.5, max_cluster_size=5).count()
        == 10
    )


def test_mixture_plan_shares_and_budget(spark):
    from res2df_spark.llm.curation import mixture_plan

    df = spark.createDataFrame(
        [(0, "a b c d", "en"), (1, "a b c d", "en"), (2, "x y", "fr")],
        "doc_id int, text string, source string",
    )
    out = {r[0]: r[1:] for r in rows(
        mixture_plan(df, alpha=0.5, budget_tokens=1000),
        "source", "n_docs", "n_tokens", "share", "target_share", "planned_tokens",
    )}
    # en: 8 of 10 tokens; fr: 2 of 10
    assert out["en"][:3] == (2, 8, 0.8)
    assert out["fr"][:3] == (1, 2, 0.2)
    # alpha=0.5: weights sqrt(.8), sqrt(.2) → targets ≈ .6667/.3333
    assert out["en"][3] == pytest.approx(0.666667, abs=1e-6)
    assert out["fr"][3] == pytest.approx(0.333333, abs=1e-6)
    assert out["en"][4] + out["fr"][4] in (999, 1000, 1001)  # rounding
    # alpha=1 reproduces the raw shares
    raw = {r[0]: r[4] for r in rows(
        mixture_plan(df, alpha=1.0, budget_tokens=1000),
        "source", "n_docs", "n_tokens", "share", "target_share",
    )}
    assert raw["en"] == pytest.approx(0.8) and raw["fr"] == pytest.approx(0.2)


def test_split_leakage_flags_cross_split_duplicates(spark):
    from res2df_spark.llm.curation import split_leakage

    df = spark.createDataFrame(
        [
            (1, "same text", "train"),
            (2, "same text", "test"),     # leaks
            (3, "same text", "train"),
            (4, "other text", "train"),
            (5, "other text", "train"),   # duplicate but same split: fine
            (6, "unique", "val"),
        ],
        "doc_id int, text string, split string",
    )
    out = rows(split_leakage(df), "n_docs", "n_splits", "splits")
    assert out == [(3, 2, "test,train")]


def test_cluster_mean_matches_mean_pool(spark):
    """cluster_mean (partial-agg, bounded buffers) must compute the same
    per-group means as mean_pool's collect_list fold (up to fp order)."""
    from res2df_spark.llm.similarity import cluster_mean, mean_pool

    emb = spark.createDataFrame(
        [
            (0, 0, [1.0, 2.0, 3.0]),
            (1, 0, [3.0, 2.0, 1.0]),
            (2, 1, [10.0, 0.0, 0.0]),
            (3, 1, None),  # NULL vectors are excluded in both
        ],
        "vec_id int, grp int, embedding array<float>",
    )
    a = {
        r[0]: (tuple(round(x, 9) for x in r[1]), r[2])
        for r in rows(cluster_mean(emb, "grp"), "grp", "pooled", "n_vecs")
    }
    b = {
        r[0]: (tuple(round(x, 9) for x in r[1]), r[2])
        for r in rows(mean_pool(emb, "grp"), "grp", "pooled", "n_vecs")
    }
    assert a == b
    assert a[0] == ((2.0, 2.0, 2.0), 2)
    assert a[1] == ((10.0, 0.0, 0.0), 1)


def test_cluster_mean_bounded_state_plan(spark):
    """The cluster-mean aggregation must be partial-aggregatable
    (map-side combine → per-task state is k·dim rows), NEVER a
    collect_list over the whole group: a cluster is ≈N/k vectors and a
    single list buffer holding one would OOM an executor at 100 TB."""
    from res2df_spark.llm.similarity import cluster_mean

    emb = spark.createDataFrame(
        [(i, i % 2, [float(i), 1.0]) for i in range(16)],
        "vec_id int, grp int, embedding array<float>",
    )
    plan = (
        cluster_mean(emb, "grp")._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-sized aggregation (group, dim) is a partial sum/count:
    # map-side combine collapses each task to ≤ k·dim pre-summed rows
    assert "partial_sum(cast(__x" in plan, plan
    # the only collect_list runs over the (group, dim) MEANS — dim rows
    # per group, model-sized — never over raw vectors
    assert "collect_list(embedding" not in plan, plan
    assert "collect_list(struct(p, __pos" in plan, plan


def test_kmeans_fit_uses_bounded_cluster_mean(spark):
    """kmeans_fit's docstring promises the bounded-buffer contract; pin
    the centroid-update plan to the partial-agg form."""
    emb = spark.createDataFrame(
        [(i, [float(i % 4), float(i % 3)]) for i in range(12)],
        "vec_id int, embedding array<float>",
    )
    out = kmeans_fit(emb, k=2, iters=1)
    # correctness of the bounded path: members split 6/6 between the two
    # parity clusters of this lattice after one Lloyd round
    assert sum(r["n_members"] for r in out.collect()) == 12


def test_semantic_dedup_two_level_matches_flat_when_coarse_is_all(spark):
    """n_coarse = k degenerates the two-level assignment to the exact
    flat argmin (every fine centroid is its own coarse list)."""
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),
            (2, [0.0, 0.2, 0.0]),
            (3, [0.0, 0.0, 10.0]),
            (4, [0.0, 0.01, 10.0]),
            (5, [6.0, 0.0, 9.0]),
        ],
        "vec_id int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 10.0])],
        "centroid_id int, centroid array<double>",
    )
    auto = sorted(rows(
        semantic_dedup_pairs(emb, cents, threshold=0.9),
        "id_1", "id_2", "centroid_id",
    ))
    flat = sorted(rows(
        semantic_dedup_pairs(emb, cents, threshold=0.9, n_coarse=2),
        "id_1", "id_2", "centroid_id",
    ))
    # k=2 → auto n_coarse=ceil(sqrt(2))=2 → identical to flat here
    assert auto == flat
    assert (0, 1, 0) in flat and (3, 4, 1) in flat


def test_semantic_dedup_two_level_probes_coarse_list(spark):
    """With n_coarse < k, a vector reaches only fine centroids mapped to
    its coarse list — the deliberate IVF-style trade; tie-breaks at
    every level go to the lower id."""
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    # fine centroids: 0 and 1 near the origin (both map to coarse 0),
    # 2 far away on the z axis (k=3, n_coarse=2 → coarse = {0, 1})
    cents = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),
            (1, [2.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 50.0]),
        ],
        "centroid_id int, centroid array<double>",
    )
    emb = spark.createDataFrame(
        [
            # both nearest fine centroid 1 via coarse 1
            (0, [2.0, 0.1, 0.0]),
            (1, [2.0, 0.11, 0.0]),
            # nearest coarse is 1 (d=2304 vs 2500 to coarse 0); fine
            # centroid 2 maps to coarse 1? no — fine 2 at z=50 is nearer
            # coarse 1 (x=2) than coarse 0 by 4: both pairs compared
            (2, [0.0, 0.0, 48.0]),
            (3, [0.0, 0.0, 48.1]),
        ],
        "vec_id int, embedding array<float>",
    )
    got = sorted(rows(
        semantic_dedup_pairs(emb, cents, threshold=0.99, n_coarse=2),
        "id_1", "id_2", "centroid_id",
    ))
    assert (0, 1, 1) in got
    assert (2, 3, 2) in got


def test_semantic_dedup_non_dense_centroid_ids(spark):
    """Centroid tables need not be dense 0-based: the coarse set is the
    n_coarse LOWEST ids (orderBy/limit), never an id-value filter — an
    id-value filter would pick an empty coarse set for ids starting at
    10 and silently drop every vector."""
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(6)],
        "vec_id int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 1.0]), (11, [50.0, 50.0])],
        "centroid_id int, centroid array<double>",
    )
    got = rows(
        semantic_dedup_pairs(emb, cents, threshold=0.5),
        "id_1", "id_2", "centroid_id",
    )
    assert len(got) == 15  # C(6,2), all in cluster 10
    assert all(c == 10 for _, _, c in got)


def test_cluster_mean_null_elements_match_mean_pool(spark):
    """A NULL array ELEMENT poisons its dimension's mean in mean_pool
    (zip_with fold); cluster_mean must match — and never dilute the
    denominator with the NULL row."""
    from res2df_spark.llm.similarity import cluster_mean, mean_pool

    emb = spark.createDataFrame(
        [(0, 0, [1.0, None, 3.0]), (1, 0, [3.0, 2.0, 1.0])],
        "vec_id int, grp int, embedding array<double>",
    )
    a = rows(cluster_mean(emb, "grp"), "grp", "pooled", "n_vecs")
    b = rows(mean_pool(emb, "grp"), "grp", "pooled", "n_vecs")
    assert a == b == [(0, [2.0, None, 2.0], 2)]


def test_semantic_novelty_incremental(spark):
    """Incremental SemDeDup: new vectors score only against indexed
    vectors in their cluster; best match ties to the lower id; a new
    vector in an empty cluster is novel with NULL match."""
    from res2df_spark.llm.similarity import semantic_novelty, two_level_assign

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 10.0])],
        "centroid_id int, centroid array<double>",
    )
    old = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.99, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    index = two_level_assign(old, cents).select(
        "vec_id", "centroid_id", F.col("__v").alias("embedding")
    )
    new = spark.createDataFrame(
        [
            (100, [1.0, 0.001, 0.0]),   # dup of 10/11 (cluster 0)
            (101, [0.0, 1.0, 0.0]),     # cluster 0 but orthogonal → novel
            (102, [0.0, 0.0, 9.0]),     # cluster 1 — no indexed members
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in semantic_novelty(
        new, index, cents, threshold=0.9
    ).collect()}
    assert not got[100]["is_novel"]
    assert got[100]["match_id"] == 10  # ties/ordering → lower id wins
    assert got[100]["cos_sim"] > 0.99
    assert got[101]["is_novel"] and got[101]["match_id"] in (10, 11)
    assert got[102]["is_novel"]
    assert got[102]["match_id"] is None and got[102]["cos_sim"] is None
