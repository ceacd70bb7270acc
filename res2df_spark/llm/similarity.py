"""Similarity search over an embedding column (``array<float>``).

* ``brute_force_topk`` — exact: broadcast the (small) query set against
  the corpus; one pass over the corpus, per-partition top-k via window.
  At 100 TB corpus scale this is a map-side broadcast join (queries are
  broadcast, corpus never shuffles) followed by a top-k aggregation —
  the heavy shuffle is only k·|queries| rows.
* ``lsh_bucketed_topk`` — approximate: random-hyperplane signs bucket
  the corpus; queries probe only their own bucket.  The bucketing is a
  deterministic projection (md5-derived pseudo-random hyperplanes), so
  results are reproducible without a fitted model.  Multi-probe and
  multi-table are the recall levers.
* ``ivf_topk`` — approximate: inverted-file index over trained k-means
  centroids (``train_ivf_centroids``); each query probes its n_probe
  nearest lists.  Data-adaptive where LSH is oblivious — the standard
  production trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar
    corpus vectors (excluding itself when ids collide)."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    )
    scored = corpus.crossJoin(broadcast(q)).filter(
        F.col(query_id_col) != F.col(id_col)
    ).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qv"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 — no RNG
    state, reproducible across engines and runs."""
    import hashlib

    vals = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for off in range(0, 16, 4):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[off : off + 4], "big")
            vals.append((u / 2**31) - 1.0)  # ~uniform in [-1, 1)
        i += 1
    return vals


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 0,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Corpus and queries get an ``n_planes``-bit sign bucket per hash
    table; candidates are same-bucket pairs (an equality join — shuffle
    on bucket key, no cross join).  Two recall levers, composable:

    * ``n_probes`` > 0 — multi-probe: each query also probes the
      buckets at Hamming distance 1 obtained by flipping its first
      ``n_probes`` sign bits (the standard fix for vectors falling near
      a hyperplane).  Only the tiny query side fans out.
    * ``n_tables`` > 1 — multi-table: L independent plane sets; a pair
      is a candidate if it collides in ANY table
      (P = 1 − (1 − p^b)^L).  The corpus fans out L× — the classic
      LSH memory-for-recall trade; at 100 TB this is the lever you
      budget explicitly.

    Candidate pairs can collide in several tables, so pairs are
    deduplicated before scoring (shuffle on (query, id) — bounded by
    candidate count, not corpus size).

    ``max_bucket_size`` drops corpus rows in buckets larger than the cap
    before the candidate join (window count on the bucket key — the
    join reuses that partitioning, so the cap adds no exchange).  At
    corpus scale a degenerate bucket (e.g. a hyperplane slicing a dense
    cluster) would otherwise fan every query probing it into millions
    of candidates; dropping it trades bounded recall loss for a bounded
    join, the same contract as ``dedup.minhash_lsh_candidates``."""
    dim = len(corpus.select(vec_col).first()[0])

    def bucket_bits(vc, table):
        bits = []
        for s in range(n_planes):
            p = _hyperplane(dim, table * n_planes + s)
            arr = F.array(*[F.lit(x) for x in p])
            proj = F.aggregate(
                F.zip_with(vc, arr, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        return bits

    def flip(bit):
        return F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))

    c_buckets, q_buckets = [], []
    for t in range(n_tables):
        prefix = F.lit(f"{t}:")
        c_buckets.append(F.concat(prefix, *bucket_bits(F.col(vec_col), t)))
        qbits = bucket_bits(F.col("__qv"), t)
        q_buckets.append(F.concat(prefix, *qbits))
        for j in range(min(n_probes, n_planes)):
            q_buckets.append(
                F.concat(prefix, *qbits[:j], flip(qbits[j]), *qbits[j + 1:])
            )

    c = corpus.withColumn("__bucket", F.explode(F.array(*c_buckets)))
    if max_bucket_size is not None:
        csize = F.count(F.lit(1)).over(Window.partitionBy("__bucket"))
        c = c.withColumn("__bsz", csize).filter(
            F.col("__bsz") <= max_bucket_size
        ).drop("__bsz")
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qv"),
    ).withColumn("__bucket", F.explode(F.array(*q_buckets)))
    cand = c.join(q, "__bucket").filter(F.col(query_id_col) != F.col(id_col))
    if n_tables > 1:
        # only multi-table can produce the same pair twice (per-table
        # probe buckets are pairwise distinct)
        cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qv"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_ivf_centroids(sample, n_centroids: int = 16, iters: int = 10):
    """Deterministic Lloyd k-means on a driver-side sample (numpy):
    init = first ``n_centroids`` sample vectors, fixed iteration count,
    no RNG — the same sample always yields the same centroids, which is
    what lets an external oracle replicate the assignment.  At corpus
    scale the sample is a bounded head (k-means needs thousands of
    points, not the corpus) and training cost is centroids × sample ×
    iters — driver-trivial."""
    import numpy as np

    x = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    cent = x[:n_centroids].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return [c.tolist() for c in cent]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is coarsely
    quantized to its nearest trained centroid (ONE list per vector, an
    equality-join key); each query probes its ``n_probe`` nearest
    lists.  The classic accuracy/cost dial: recall grows with n_probe,
    scanned fraction ≈ n_probe / n_centroids.

    All distances are JVM higher-order-function folds — no UDF; the
    corpus shuffles once on the list id, queries fan out n_probe×."""
    n_centroids = len(centroids)

    def dist2(vc, cent):
        arr = F.array(*[F.lit(x) for x in cent])
        return F.aggregate(
            F.zip_with(vc, arr, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def nearest_lists(vc, n):
        pairs = F.array(*[
            F.struct(dist2(vc, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ])
        return F.slice(F.array_sort(pairs), 1, n)

    c = corpus.withColumn(
        "__list", nearest_lists(F.col(vec_col), 1).getItem(0).getField("i")
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    ).withColumn(
        "__probe", F.explode(nearest_lists(F.col("__qv"), min(n_probe, n_centroids)))
    ).select(query_id_col, "__qv", F.col("__probe.i").alias("__list"))
    scored = c.join(q, "__list").filter(F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qv"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 10,
    q_col: str = "q_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact one: |approx∩exact| / |exact| over each query's top-k sets.

    The quality dial every ANN deployment needs: measure recall on a
    sampled query set, then trade probes/tables/lists against it.  Two
    semi-joined aggregates — runs at any scale the top-k frames exist.
    """
    a = approx.filter(F.col(rank_col) <= k).select(q_col, id_col)
    e = exact.filter(F.col(rank_col) <= k).select(q_col, id_col)
    totals = e.groupBy(q_col).agg(F.count(F.lit(1)).alias("__n_exact"))
    hits = (
        e.join(a, [q_col, id_col], "left_semi")
        .groupBy(q_col)
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    return totals.join(hits, q_col, "left").select(
        q_col,
        (
            F.coalesce(F.col("__n_hit"), F.lit(0)) / F.col("__n_exact")
        ).alias("recall"),
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector min-max scalar quantization to uint8 codes — the
    memory lever for ANN at corpus scale (float32 → 1 byte/dim = 4×
    smaller index; recall cost is measurable with ``recall_at_k``).

    code_i = floor((x_i − lo) · 255 / (hi − lo) + 0.5), lo/hi the
    vector's own min/max (stored alongside for dequantization:
    x ≈ lo + code · (hi − lo)/255).  Constant vectors (hi = lo) map to
    all-zero codes.  Everything is double arithmetic on deliberately
    cast inputs so any engine reproduces the exact codes; floor(·+0.5)
    rounding avoids engine-specific round-half semantics.

    Map-only built-ins (array_min/array_max/transform) — no shuffle,
    no Python; at 100 TB this runs as a pure scan-rewrite alongside
    ingest.  Codes return as array<int> plus (lo, hi) doubles.
    """
    x = F.col(vec_col)
    lo = F.array_min(x).cast("double")
    hi = F.array_max(x).cast("double")
    span = hi - lo
    code = lambda v: F.when(  # noqa: E731
        span == 0, F.lit(0)
    ).otherwise(
        F.floor((v.cast("double") - lo) * F.lit(255.0) / span + F.lit(0.5))
    ).cast("int")
    return emb.select(
        F.col(id_col),
        F.transform(x, code).alias("codes"),
        lo.alias("lo"),
        hi.alias("hi"),
    )


def mean_pool(
    df: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of embeddings per group — chunk→document
    pooling (the standard way chunk embeddings become a document
    embedding) or label→centroid aggregation.

    One shuffle on the group key: ``collect_list`` gathers the group's
    vectors (groups are chunks-of-one-document — small by
    construction), then a single JVM ``aggregate``/``zip_with`` chain
    reduces them element-wise; no per-dimension explode, no second
    shuffle, no Python.  NULL vectors are excluded; groups with none
    left produce no row.  Returns (group, pooled array<double>, n_vecs).
    """
    lst = F.collect_list(F.col(vec_col))
    zeros = F.transform(F.element_at(F.col("__vs"), 1), lambda _: F.lit(0.0))
    summed = F.aggregate(
        F.col("__vs"),
        zeros,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
    )
    return (
        df.filter(F.col(vec_col).isNotNull())
        .groupBy(group_col)
        .agg(lst.alias("__vs"))
        .select(
            group_col,
            F.transform(summed, lambda x: x / F.size("__vs")).alias("pooled"),
            F.size("__vs").cast("long").alias("n_vecs"),
        )
    )
