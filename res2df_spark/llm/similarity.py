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

from res2df_spark.functions.vectors import cosine_similarity, dot, l2_norm
from res2df_spark.session import truncate_lineage


def _cosine_with_norms(a, b, na, nb):
    """``cosine_similarity`` with the two norms supplied as columns —
    the pair-scorer form: norms are per-ROW invariants, so the callers
    compute them once per corpus/query row before the pair join instead
    of twice per pair.  Same guard chain and same ``na * nb`` multiply
    order as ``cosine_similarity``, so scores are bit-identical."""
    denom = na * nb
    return F.when(denom > 0, dot(a, b) / denom).when(
        a.isNotNull() & b.isNotNull(), F.lit(0.0)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar
    corpus vectors (excluding itself when ids collide).

    NULL-embedding rows are excluded on BOTH sides: cosine_similarity
    maps a NULL/zero norm to 0.0, so an unfiltered NULL query would be
    handed k arbitrary ids all "scoring" 0.0 as if they were real
    neighbors, and NULL corpus rows could occupy top-k slots whenever
    a query has fewer than k positive-similarity candidates.

    Norms are computed ONCE PER ROW before the cross join (same
    expressions, same multiply order as ``cosine_similarity``, so the
    scores are bit-identical) — inside the pair loop they cost two full
    vector passes per PAIR, i.e. 2·|corpus|·|queries| norm folds where
    |corpus| + |queries| suffice."""
    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    corpus = corpus.filter(F.col(vec_col).isNotNull()).withColumn(
        "__cn", l2_norm(F.col(vec_col))
    )
    scored = corpus.crossJoin(broadcast(q)).filter(
        F.col(query_id_col) != F.col(id_col)
    ).select(
        query_id_col,
        id_col,
        _cosine_with_norms(
            F.col("__qv"), F.col(vec_col), F.col("__qn"), F.col("__cn")
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    query_col: str = "q_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of N retrieval
    rankings — the standard hybrid-search combiner (lexical BM25 +
    embedding ANN, or multi-vector ensembles): a document's fused score
    is ``Σ_systems 1/(k + rank)``, which rewards agreement between
    systems without needing their scores to be commensurable.

    Inputs are (query, doc, rank) frames — exactly the output shape of
    :func:`brute_force_topk` / ``lsh_bucketed_topk`` / ``bm25_topk``
    (after aliasing).  A document absent from a system simply
    contributes no term (the standard convention).  Returns (query,
    doc, rrf_score, n_systems, fused_rank) with the fused ranking
    deterministic on any engine: the score is rounded to 6 dp before
    ranking (the sum of ≥3 doubles is partition-order-sensitive in the
    last ulp) and ties break by doc id.

    Scale shape: one union, one partial-aggregated groupBy on (query,
    doc) — per-group size is bounded by the SYSTEM count, and the
    per-query top-k window sees at most systems×k rows per query
    because the inputs are already top-k'd upstream.  Nothing here
    touches the corpus.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            F.col(rank_col).cast("double").alias("__r"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__r"))), 6).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    )
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= topk)
    return out


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
    # skip NULL vectors when probing dimensionality: .first() returns
    # an arbitrary (partition-order-dependent) row, and a corpus whose
    # first-scanned row happens to be NULL must not silently yield zero
    # neighbors for every query
    first = corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    spark = corpus.sparkSession
    if first is None:
        # corpus with no non-NULL vectors: empty result, not a crash
        qt = queries.schema[id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{query_id_col} {qt}, {id_col} {it}, cosine double, rank int"
        )
    dim = len(first[0])
    # hyperplanes ride as a ONE-ROW broadcast dimension, not inline
    # literals: dim × n_planes × n_tables literal children would be
    # re-analyzed by the driver on every action (the giant-literal cost
    # measured in llm/lm.py), twice — corpus and query side
    planes = [
        [_hyperplane(dim, t * n_planes + s) for s in range(n_planes)]
        for t in range(n_tables)
    ]
    planes_df = spark.createDataFrame(
        [(planes,)], "__planes: array<array<array<double>>>"
    )

    def bucket_bits(vc, table):
        bits = []
        for s in range(n_planes):
            arr = F.col("__planes")[table][s]
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

    # NULL vectors never bucket or score: cosine maps a NULL norm to
    # 0.0, so an unfiltered NULL would land in the all-'0' bucket and
    # surface as a fake 0.0-similarity neighbor (same contract as
    # brute_force_topk)
    # per-row norms BEFORE the bucket explode and candidate join: the
    # pair scorer reads them instead of re-folding both vectors per
    # candidate pair (bit-identical scores — see _cosine_with_norms)
    c = corpus.filter(F.col(vec_col).isNotNull()).withColumn(
        "__cn", l2_norm(F.col(vec_col))
    ).crossJoin(
        F.broadcast(planes_df)
    ).withColumn(
        "__bucket", F.explode(F.array(*c_buckets))
    ).drop("__planes")
    if max_bucket_size is not None:
        csize = F.count(F.lit(1)).over(Window.partitionBy("__bucket"))
        c = c.withColumn("__bsz", csize).filter(
            F.col("__bsz") <= max_bucket_size
        ).drop("__bsz")
    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("__qv"),
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
        .crossJoin(F.broadcast(planes_df))
        .withColumn("__bucket", F.explode(F.array(*q_buckets)))
        .drop("__planes")
    )
    cand = c.join(q, "__bucket").filter(F.col(query_id_col) != F.col(id_col))
    if n_tables > 1:
        # only multi-table can produce the same pair twice (per-table
        # probe buckets are pairwise distinct)
        cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        query_id_col,
        id_col,
        _cosine_with_norms(
            F.col("__qv"), F.col(vec_col), F.col("__qn"), F.col("__cn")
        ).alias("cosine"),
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
    corpus shuffles once on the list id, queries fan out n_probe×.
    Centroids ride as a ONE-ROW broadcast dimension (not inline
    literals, whose n_centroids × dim expression children the driver
    would re-analyze per action — the giant-literal cost measured in
    llm/lm.py)."""
    n_centroids = len(centroids)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [([list(map(float, c)) for c in centroids],)],
        "__cents: array<array<double>>",
    )

    def dist2(vc, i):
        arr = F.col("__cents")[i]
        return F.aggregate(
            F.zip_with(vc, arr, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def nearest_lists(vc, n):
        pairs = F.array(*[
            F.struct(dist2(vc, i).alias("d"), F.lit(i).alias("i"))
            for i in range(n_centroids)
        ])
        return F.slice(F.array_sort(pairs), 1, n)

    # NULL vectors never list or score (NULL distances would sort
    # arbitrarily into list 0 and fake 0.0-cosine neighbors downstream
    # — same contract as brute_force_topk)
    c = corpus.filter(F.col(vec_col).isNotNull()).withColumn(
        "__cn", l2_norm(F.col(vec_col))
    ).crossJoin(
        F.broadcast(cent_df)
    ).withColumn(
        "__list", nearest_lists(F.col(vec_col), 1).getItem(0).getField("i")
    ).drop("__cents")
    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
        .crossJoin(F.broadcast(cent_df))
        .withColumn(
            "__probe",
            F.explode(nearest_lists(F.col("__qv"), min(n_probe, n_centroids))),
        )
        .select(query_id_col, "__qv", "__qn", F.col("__probe.i").alias("__list"))
    )
    scored = c.join(q, "__list").filter(F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        _cosine_with_norms(
            F.col("__qv"), F.col(vec_col), F.col("__qn"), F.col("__cn")
        ).alias("cosine"),
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
    # Explicit broadcasts: every frame here is ≤ k·|queries| rows BY
    # CONSTRUCTION (rank ≤ k filters), so the build sides are bounded
    # by the sampled query set, never the corpus.  The hints matter
    # because the caller's query set often reaches this point as a
    # local relation (createDataFrame) whose size statistics are
    # unknown — the planner then falls back to sort-merge and pays two
    # exchange+sort stages per join on frames of a few dozen rows.
    hits = (
        e.join(F.broadcast(a), [q_col, id_col], "left_semi")
        .groupBy(q_col)
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    return totals.join(F.broadcast(hits), q_col, "left").select(
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
    Non-finite elements (NaN/±Inf — and every element of a vector whose
    min/max they poison) code as NULL rather than ANSI-aborting the
    whole scan.
    """
    x = F.col(vec_col)
    # lo/hi/span materialize as columns BEFORE the transform: a
    # lambda-captured aggregate expression is re-evaluated per array
    # element, which would turn the per-vector cost from O(d) into
    # O(d²) (the HOF-capture pitfall measured at 93× in this repo)
    base = emb.select(F.col(id_col), x.alias("__x")).select(
        id_col,
        "__x",
        F.array_min(F.col("__x")).cast("double").alias("__lo"),
        F.array_max(F.col("__x")).cast("double").alias("__hi"),
    ).withColumn("__span", F.col("__hi") - F.col("__lo"))

    def _finite(c):
        return (
            c.isNotNull()
            & ~F.isnan(c)
            & (c != float("inf"))
            & (c != float("-inf"))
        )

    # non-finite elements (or a span poisoned by one — array_max
    # propagates NaN/Inf) yield NULL codes instead of an ANSI abort:
    # floor(NaN).cast(int) would otherwise kill the corpus-scale
    # scan-rewrite on one bad telemetry row.  The per-element check
    # runs FIRST: a NULL element in a constant vector (array_min/max
    # skip NULLs, so lo = hi and span = 0) must still code NULL, not
    # fabricate a 0 that dequantizes to lo
    code = lambda v: F.when(  # noqa: E731
        ~_finite(v.cast("double")), F.lit(None)
    ).when(
        F.col("__span") == 0, F.lit(0)
    ).when(
        _finite(F.col("__span")),
        F.floor(
            (v.cast("double") - F.col("__lo")) * F.lit(255.0) / F.col("__span")
            + F.lit(0.5)
        ),
    ).cast("int")
    return base.select(
        F.col(id_col),
        F.transform(F.col("__x"), code).alias("codes"),
        F.col("__lo").alias("lo"),
        F.col("__hi").alias("hi"),
    )


def mean_pool(
    df: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    order_col: str | None = None,
) -> DataFrame:
    """Element-wise mean of embeddings per group — chunk→document
    pooling (the standard way chunk embeddings become a document
    embedding) or label→centroid aggregation.

    One shuffle on the group key: ``collect_list`` gathers the group's
    vectors, then a single JVM ``aggregate``/``zip_with`` chain reduces
    them element-wise; no per-dimension explode, no second shuffle, no
    Python.  NULL vectors are excluded; groups with none left produce
    no row.  Returns (group, pooled array<double>, n_vecs).

    SCALE CONTRACT: groups must be small by construction
    (chunks-of-one-document) — ``collect_list`` holds the whole group
    in ONE aggregation buffer.  For corpus-sized groups (k-means
    clusters, per-label centroids) use :func:`cluster_mean`, whose
    partial-aggregatable formulation bounds per-task state at k·dim.

    ``collect_list`` order is partition-arrival order, so the
    IEEE-double sum can wobble in the last ulp between runs — harmless
    for pooling (consumers compare rounded values), but pass
    ``order_col`` to sort each group's vectors by that key before the
    fold and make the result bit-exactly run-deterministic (k-means
    needs this: a last-ulp wobble in a centroid can flip a
    near-boundary assignment next round).
    """
    if order_col is not None:
        lst = F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("k"), F.col(vec_col).alias("v"))
                )
            ),
            lambda s: s["v"],
        )
    else:
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


def cluster_mean(
    df: DataFrame,
    group_col: str = "centroid_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of embeddings per group with BOUNDED
    aggregation buffers — the large-group companion to
    :func:`mean_pool`, for groups that are whole clusters (≈N/k
    vectors) rather than chunks-of-one-document.

    ``mean_pool``'s ``collect_list`` holds an ENTIRE group in one
    aggregation buffer; for a cluster that is N/k vectors — billions of
    doubles at corpus scale — that buffer OOMs the executor.  Here the
    sum is fully partial-aggregatable instead: ``posexplode`` to
    (group, dim, value), then ``sum``/``count`` per (group, dim) —
    map-side combine collapses each task's output to at most
    k·dim pre-summed rows before the exchange, so per-task state is the
    model size, never the group size.  The final per-group re-assembly
    collects exactly ``dim`` (pos, mean) structs per group — bounded by
    the embedding dimensionality, not the cluster population.

    Determinism caveat: the per-(group, dim) double sum runs in
    partition order, so results can wobble in the last ulp between runs
    on a cluster (consumers compare rounded values; k-means assignment
    flips only for points exactly equidistant to two centroids).
    NULL vectors are excluded; groups with none left produce no row.
    Ragged input (vectors of unequal length in one group) matches
    ``mean_pool``'s contract: a dimension some vectors lack is NULLed
    (a short vector contributes no rows for its missing dims, so a
    silent mean-over-a-subset would otherwise differ from the zip_with
    fold, and k-means would drift on malformed input instead of
    surfacing it).  ``n_vecs`` is the full group size either way.
    Returns (group, pooled array<double>, n_vecs) like ``mean_pool``.
    """
    nonnull = df.filter(F.col(vec_col).isNotNull())
    # the TRUE group size comes from the input rows, never from per-dim
    # explode counts: an empty-array vector emits no (dim, value) rows,
    # so max(per-dim count) would undercount the group, let the ragged
    # guard below pass, and silently average over the subset — where
    # mean_pool's zip_with pads the short vector and NULLs the dims
    sizes = nonnull.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    dims = (
        nonnull.select(
            F.col(group_col),
            F.posexplode(F.col(vec_col)).alias("__pos", "__x"),
        )
        .groupBy(group_col, "__pos")
        .agg(
            F.sum(F.col("__x").cast("double")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
            F.count("__x").alias("__nn"),
        )
    )
    # NULL array elements poison their dimension's mean (sum skips NULLs
    # but mean_pool's zip_with fold yields NULL there — match it), and
    # the denominator is the ROW count, never the non-null count
    mean = F.when(
        F.col("__nn") == F.col("__n"), F.col("__s") / F.col("__n")
    )
    agged = dims.groupBy(group_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__pos").alias("p"),
                    mean.alias("m"),
                    F.col("__n").alias("n"),
                )
            )
        ).alias("__dims"),
    )
    # ragged guard: a dim whose row count is below the group size was
    # missing from some vectors — NULL it (mean_pool parity), never
    # average over the subset that happened to carry it.  A group of
    # only empty arrays has no dims rows at all → pooled [] (mean_pool's
    # empty fold yields [] too).
    return sizes.join(agged, group_col, "left").select(
        group_col,
        F.coalesce(
            F.transform(
                "__dims",
                lambda s: F.when(s["n"] == F.col("n_vecs"), s["m"]),
            ),
            F.array().cast("array<double>"),
        ).alias("pooled"),
        "n_vecs",
    )


def _sq_dist(a, b):
    """Squared Euclidean distance between two array columns — a JVM
    zip_with/aggregate fold (left-to-right, so the summation order is
    the array order on any engine)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared Euclidean).

    The centroid table is model-sized (k rows) and BROADCASTS; the
    corpus never shuffles — the k-way fan-out and the per-vector argmin
    both happen map-side (``min(struct(dist, id))`` under partial
    aggregation collapses the k candidate rows per vector before the
    exchange on the uniform vector id).  Ties break toward the lower
    centroid id, so assignment is a pure function of (vector,
    centroids) on any engine.  Returns (id, centroid_id, sq_dist).
    """
    c = broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__cid"),
            F.col(centroid_vec_col).alias("__cv"),
        )
    )
    d = _sq_dist(F.col(vec_col), F.col("__cv"))
    best = F.min(F.struct(F.col("__d").alias("d"), F.col("__cid").alias("c")))
    return (
        # a NULL vector has NULL distance to every centroid; the
        # min(struct) would then "assign" it to centroid 0 (NULL struct
        # fields sort first) and downstream indexes would carry a
        # phantom member — exclude it like every other scorer
        df.filter(F.col(vec_col).isNotNull())
        .crossJoin(c)
        .withColumn("__d", d)
        .groupBy(id_col)
        .agg(best.alias("__best"))
        .select(
            id_col,
            F.col("__best.c").alias(centroid_id_col),
            F.col("__best.d").alias("sq_dist"),
        )
    )


def seed_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cast_double: bool = False,
) -> DataFrame:
    """Deterministic first-``k``-by-id centroid seeding: the ``k``
    lowest-id vectors become ``(centroid_id 0..k-1, centroid)`` — the
    ONE shared seeding rule for k-means/SemDeDup/IVF initialization (a
    DuckDB oracle re-derives it with ``ORDER BY id LIMIT k``), kept in
    one place so the rule cannot drift between the suite, the CLI and
    :func:`kmeans_fit`.  The global ranking Window runs AFTER
    ``limit(k)``, so its single partition holds ``k`` rows, never the
    corpus."""
    vec = (
        F.transform(vec_col, lambda x: x.cast("double"))
        if cast_double
        else F.col(vec_col)
    )
    return (
        df.orderBy(id_col)
        .limit(int(k))
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias(
                "centroid_id"
            ),
            vec.alias("centroid"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column: initial
    centroids are the ``k`` vectors with the lowest ids (no RNG), every
    iteration is one broadcast assignment (:func:`assign_nearest`) plus
    one element-wise mean per cluster (:func:`cluster_mean`) — the
    model never rides through the driver except as the k-row centroid
    frame, unlike :func:`train_ivf_centroids`'s sampled driver-side
    variant.

    Scale / bounded-buffer contract: per iteration, one broadcast join
    (map-side) and the cluster-mean's partial-aggregated shuffles —
    per-task aggregation state is at most k·dim pre-summed rows (the
    model size), NEVER a whole cluster's membership: clusters are ≈N/k
    vectors and :func:`cluster_mean` was chosen over :func:`mean_pool`
    precisely so no buffer ever holds one.  ``session.truncate_lineage``
    truncates the lineage each round so the plan stays O(1) deep across
    iterations (reliable ``checkpoint()`` when
    ``spark.res2df.checkpointDir`` is set — k·dim doubles, so the write
    is model-sized); the model is all that persists.  Empty
    clusters keep their previous centroid.  Determinism: runs on the
    same partitioning reproduce exactly; across different partitionings
    the per-dimension double sums can wobble in the last ulp (see
    ``cluster_mean``), which flips an assignment only for points
    exactly equidistant to two centroids.  Returns (centroid_id,
    centroid, n_members) after ``iters`` rounds.
    """
    vecs = df.select(F.col(id_col), F.col(vec_col)).filter(
        F.col(vec_col).isNotNull()
    )
    centroids = seed_centroids(
        vecs, k, id_col=id_col, vec_col=vec_col, cast_double=True
    ).withColumn("n_members", F.lit(0).cast("long"))
    centroids = truncate_lineage(centroids)
    for _ in range(iters):
        assigned = assign_nearest(
            vecs, centroids, id_col=id_col, vec_col=vec_col
        )
        pooled = cluster_mean(
            vecs.join(assigned.select(id_col, "centroid_id"), id_col),
            group_col="centroid_id",
            vec_col=vec_col,
        ).select(
            "centroid_id", F.col("pooled").alias("centroid"), "n_vecs"
        )
        # empty clusters keep their previous centroid
        centroids = truncate_lineage(
            centroids.select("centroid_id", F.col("centroid").alias("__old"))
            .join(pooled, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("centroid", "__old").alias("centroid"),
                F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_members"),
            )
        )
    return centroids


def two_level_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_coarse: int | None = None,
) -> DataFrame:
    """Hierarchical coarse→fine nearest-centroid assignment — the
    shared scale engine of :func:`semantic_dedup_pairs` and
    :func:`semantic_novelty`.  With k ∝ N centroids a flat argmin is
    O(N·k) with an O(N) broadcast; this is O(N·√k) with nothing
    broadcast beyond ``n_coarse`` (default ⌈√k⌉) rows: the n_coarse
    LOWEST-id centroids act as coarse lists, each fine centroid maps to
    its nearest coarse, each vector finds its nearest coarse (broadcast
    crossJoin + map-side partial argmin) and then its nearest fine
    centroid among those mapped to that list (equality join on the
    coarse id).  Every tie-break goes to the LOWER id, so the
    assignment is a pure function of (vectors, centroids) on any
    engine; ``n_coarse`` = k recovers the exact flat argmin.

    Returns (id, centroid_id, __v double-cast vector, __n L2 norm) —
    the vector and its norm ride through the argmin aggregations so
    downstream cosine consumers never re-join the corpus.
    """
    from res2df_spark.functions.vectors import l2_norm

    fine, coarse, fc = _coarse_fine_model(centroids, n_coarse)
    coarse = broadcast(coarse)
    best_coarse = F.min(
        F.struct(F.col("__d").alias("d"), F.col("__coid").alias("c"))
    )
    # vector → coarse list (broadcast n_coarse rows; argmin
    # partial-aggregates map-side before the exchange on the vector id)
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vc = (
        df.select(F.col(id_col), vecd.alias("__vd"))
        .filter(F.col("__vd").isNotNull())
        .crossJoin(coarse)
        .withColumn("__d", _sq_dist(F.col("__vd"), F.col("__cov")))
        .groupBy(id_col)
        .agg(best_coarse.alias("__b"), F.first("__vd").alias("__v"))
        .select(F.col(id_col), F.col("__b.c").alias("__coid"), F.col("__v"))
    )
    # vector → nearest FINE centroid within its coarse list: equality
    # join on the coarse id (never all-pairs; fine side is k rows)
    best_fine = F.min(
        F.struct(F.col("__d").alias("d"), F.col("centroid_id").alias("c"))
    )
    return (
        vc.join(fc, "__coid")
        .withColumn("__d", _sq_dist(F.col("__v"), F.col("__fv")))
        .groupBy(id_col)
        .agg(best_fine.alias("__b"), F.first("__v").alias("__v"))
        .select(
            F.col(id_col),
            F.col("__b.c").alias("centroid_id"),
            F.col("__v"),
            l2_norm(F.col("__v")).alias("__n"),
        )
    )


def _coarse_fine_model(centroids: DataFrame, n_coarse: int | None):
    """(fine, coarse, fc) model frames shared by
    :func:`two_level_assign` (batch) and
    ``streaming/ops.semantic_claims_stream`` — ONE construction so the
    two paths cannot drift on tie-break or coarse-selection semantics:

    * ``fine``: (centroid_id, __fv double-cast vector);
    * ``coarse``: the ``n_coarse`` (default ⌈√k⌉) LOWEST-id centroids
      as (__coid, __cov) — orderBy/limit, not an id-value filter, so
      sparse/offset centroid ids still select a non-empty coarse set;
    * ``fc``: fine → nearest coarse (min(struct(d, id)) — ties to the
      lower id), computed at model size (k·n_coarse).
    """
    import math

    fine = centroids.select(
        F.col("centroid_id"),
        F.transform("centroid", lambda x: x.cast("double")).alias("__fv"),
    )
    if n_coarse is None:
        # the centroid frame is model-sized; counting it is a k-row job
        n_coarse = max(int(math.ceil(math.sqrt(fine.count()))), 1)
    coarse = (
        fine.orderBy("centroid_id")
        .limit(n_coarse)
        .select(
            F.col("centroid_id").alias("__coid"), F.col("__fv").alias("__cov")
        )
    )
    best_coarse = F.min(
        F.struct(F.col("__d").alias("d"), F.col("__coid").alias("c"))
    )
    fc = (
        fine.crossJoin(broadcast(coarse))
        .withColumn("__d", _sq_dist(F.col("__fv"), F.col("__cov")))
        .groupBy("centroid_id")
        .agg(best_coarse.alias("__b"), F.first("__fv").alias("__fv"))
        .select("centroid_id", F.col("__b.c").alias("__coid"), "__fv")
    )
    return fine, coarse, fc


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
    n_coarse: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairing (Abbas et al.
    2023 lineage): assign every embedding to a centroid, then enumerate
    cosine-similar pairs ONLY within each cluster — two documents in
    different clusters are never compared, which is what makes semantic
    dedup tractable at corpus scale: pairwise cost is Σ|cluster|², not
    N².

    The cluster count is the scale lever — at 100 TB you fit k ∝
    N/target_cluster_size centroids so the per-cluster quadratic stays
    bounded.  But a FLAT nearest-of-k assignment is then O(N·k) = O(N²/
    target) with an O(N) broadcast centroid table — itself superlinear
    (measured: the one >10× entry in SCALEPROBE_r04).  So the
    assignment is TWO-LEVEL, the same coarse→fine composition as
    :func:`ivfpq_build`: the ``n_coarse`` lowest-id centroids (default
    ⌈√k⌉) act as coarse lists; each fine centroid maps to its nearest
    coarse (k·√k work, model-sized); each vector finds its nearest
    coarse (N·√k, coarse table broadcast — √k rows, bounded) and then
    its nearest FINE centroid among those mapped to that coarse list
    (equality join on the coarse id, ~N·√k average work, AQE splits a
    skewed coarse list).  Total assignment cost O(N·√k) instead of
    O(N·k), and nothing broadcast is larger than √k rows.  Like every
    IVF-style probe, a vector near a coarse boundary can land in a
    different fine cluster than the flat argmin would give — the
    SemDeDup trade, bought deliberately; set ``n_coarse`` = k to
    recover exact flat assignment.  All tie-breaks (vector→coarse,
    fine→coarse, vector→fine) go to the LOWER id, so the assignment is
    a pure function of (vectors, centroids) on any engine.

    ``max_cluster_size`` is the same safety valve as the LSH hot-bucket
    cap (llm/dedup.py): clusters over the cap are dropped from pairing
    rather than allowed to blow up a task (drop accounting via the
    assignment + a count — the cluster ids survive in the assignment).

    Returns (id_1, id_2, centroid_id, cos_sim) with id_1 < id_2 and
    cos_sim ≥ ``threshold``.  The self-join is an equality join on the
    cluster id — one shuffle each side, never all-pairs.

    Inner-loop economics: the vector rides THROUGH the argmin
    aggregations (``first`` on the grouped constant) instead of being
    re-joined afterwards, and each vector's L2 norm is computed once
    per SIDE, not once per pair.

    Round 12 — per-cluster Arrow pair scoring (guide §4.2/§8).  The
    previous cluster-id self-join streamed every pair through an
    INTERPRETED 64-step dot fold (HOFs get no codegen; measured
    ~0.9 s of the query's 1.4 s at sf0.1), and a post-join
    ``mapInArrow`` scorer was tried and REJECTED: it ships both
    vectors once PER PAIR across the Python boundary (~114 MB at
    sf0.1; measured 1.94 s vs 1.77 s — slower).  Instead the cluster
    groups into one members array and each vector crosses the boundary
    ONCE PER CLUSTER; all within-cluster pair dots are NumPy
    outer-product accumulations in the SAME left-to-right dimension
    order as the fold (bit-identical sims — verified 663/663 pairs
    equal at sf0.1, oracle green at two SFs).  Measured 1.43 → 0.87 s.
    Memory note: the pair stage holds an N_c² float64 block per
    cluster task — the same quadratic task exposure the self-join had
    in rows, now explicit; cluster sizes are bounded by construction
    (k ∝ N/target_cluster_size) and ``max_cluster_size`` still drops
    oversized clusters BEFORE their members array is built.
    """
    sides = two_level_assign(
        df, centroids, id_col=id_col, vec_col=vec_col, n_coarse=n_coarse
    )
    if max_cluster_size is not None:
        ok = (
            sides.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("__csz"))
            .filter(F.col("__csz") <= max_cluster_size)
            .select("centroid_id")
        )
        sides = sides.join(broadcast(ok), "centroid_id")
    id_type = sides.schema[id_col].dataType.simpleString()
    cid_type = sides.schema["centroid_id"].dataType.simpleString()
    clusters = sides.groupBy("centroid_id").agg(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("i"),
                F.col("__v").alias("v"),
                F.col("__n").alias("n"),
            )
        ).alias("__ms")
    )

    def _score(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for bt in batches:
            if bt.num_rows == 0:
                continue
            cid_col = bt.column(0)
            ms_col = bt.column(1)
            # vectorized unpack: flatten the members list into one
            # struct array; per-cluster slices come from the offsets
            members = ms_col.flatten()
            m_ids = members.field("i").to_numpy(zero_copy_only=False)
            m_norms = members.field("n").to_numpy(zero_copy_only=False)
            vlist = members.field("v")
            vflat = np.asarray(
                vlist.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
            )
            vlens = pc.list_value_length(vlist).to_numpy(
                zero_copy_only=False
            )
            vlens = np.where(np.isnan(vlens.astype(np.float64)), -1, vlens).astype(np.int64)
            vstarts = np.zeros(len(vlens), dtype=np.int64)
            np.cumsum(np.maximum(vlens[:-1], 0), out=vstarts[1:])
            c_lens = pc.list_value_length(ms_col).to_numpy(zero_copy_only=False).astype(np.int64)
            c_starts = np.zeros(len(c_lens), dtype=np.int64)
            np.cumsum(c_lens[:-1], out=c_starts[1:])
            out_i: list = []
            out_j: list = []
            out_c: list = []
            out_s: list = []
            for r in range(bt.num_rows):
                lo, nm = c_starts[r], c_lens[r]
                if nm < 2:
                    continue
                sl = slice(lo, lo + nm)
                order = np.argsort(m_ids[sl], kind="stable")
                ids = m_ids[sl][order]
                norms = np.asarray(m_norms[sl][order], dtype=np.float64)
                lens = vlens[sl][order]
                starts = vstarts[sl][order]
                iu, ju = np.triu_indices(nm, k=1)
                den = norms[iu] * norms[ju]
                ok_den = den > 0
                if lens.min() == lens.max() and lens.min() >= 0:
                    dim = int(lens[0])
                    x = vflat[starts[:, None] + np.arange(dim)[None, :]]
                    dots = np.zeros((nm, nm), dtype=np.float64)
                    for t in range(dim):  # left-to-right: the fold's order
                        c = x[:, t]
                        dots += c[:, None] * c[None, :]
                    sims = np.where(
                        ok_den, dots[iu, ju] / np.where(ok_den, den, 1.0), 0.0
                    )
                    mask = np.zeros(len(iu), dtype=bool)
                else:
                    # ragged/NULL vectors: replicate the fold's NULL
                    # poisoning (length mismatch → NULL sim when the
                    # norms are positive; zero/NULL norm → 0.0)
                    sims = np.zeros(len(iu), dtype=np.float64)
                    mask = np.zeros(len(iu), dtype=bool)
                    for e, (p, q) in enumerate(zip(iu, ju)):
                        if not ok_den[e]:
                            continue
                        if lens[p] != lens[q] or lens[p] < 0:
                            mask[e] = True
                            continue
                        acc = 0.0
                        vp = vflat[starts[p] : starts[p] + lens[p]]
                        vq = vflat[starts[q] : starts[q] + lens[q]]
                        for t in range(int(lens[p])):
                            acc += vp[t] * vq[t]
                        sims[e] = acc / den[e]
                out_i.append(ids[iu])
                out_j.append(ids[ju])
                out_c.append(np.repeat(r, len(iu)))
                out_s.append(np.where(mask, np.nan, sims))
            if not out_i:
                continue
            rows_idx = np.concatenate(out_c)
            sims_all = np.concatenate(out_s)
            ida_type = members.field("i").type
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_i), type=ida_type),
                    pa.array(np.concatenate(out_j), type=ida_type),
                    cid_col.take(pa.array(rows_idx, type=pa.int64())),
                    pa.array(
                        sims_all, type=pa.float64(), mask=np.isnan(sims_all)
                    ),
                ],
                names=["id_1", "id_2", "centroid_id", "cos_sim"],
            )

    scored = clusters.mapInArrow(
        _score,
        schema=(
            f"id_1 {id_type}, id_2 {id_type}, "
            f"centroid_id {cid_type}, cos_sim double"
        ),
    )
    return scored.filter(F.col("cos_sim") >= threshold).select(
        "id_1", "id_2", "centroid_id", F.round("cos_sim", 6).alias("cos_sim")
    )


def semantic_novelty(
    new: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
    n_coarse: int | None = None,
) -> DataFrame:
    """Incremental SemDeDup — the embedding twin of
    ``dedup.minhash_novelty``: score a NEW batch of embeddings against
    a PERSISTED cluster-assigned index without rescanning the corpus,
    the daily-ingest shape.  ``index`` is (id, cluster, vector) — the
    assignment a previous :func:`two_level_assign` run wrote out; store
    it partitioned by the cluster column and the equality join below
    becomes a partition-pruned read touching only the new batch's
    clusters, so ingest cost is O(|new|·√k + |new|·cluster_size),
    independent of corpus size.

    Each new vector is assigned with the SAME two-level rule as the
    index was, then compared (cosine) against indexed vectors in its
    cluster only.  Returns one row per new ROW — including rows whose
    embedding is NULL (unassignable: is_novel/match_id/cos_sim all
    NULL, the same honest vanish-proof contract as
    ``dedup.minhash_novelty`` gives token-less docs; silently dropping
    them would lose documents from an ingest keyed on this verdict
    table).  For assignable vectors: (id, is_novel, match_id, cos_sim)
    where match is the best indexed candidate (highest cosine, tie →
    lower id; NULL when the cluster has no indexed members) and
    ``is_novel`` = no candidate reaches ``threshold``.  Like all
    cluster-scoped dedup, a near-dup whose twin landed in a different
    cluster is missed — the SemDeDup trade.
    """
    from res2df_spark.functions.vectors import dot, l2_norm

    assigned = two_level_assign(
        new, centroids, id_col=id_col, vec_col=vec_col, n_coarse=n_coarse
    )
    idx = index.select(
        F.col(cluster_col).alias("centroid_id"),
        F.col(id_col).alias("__mid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__iv"),
    ).withColumn("__in", l2_norm(F.col("__iv")))
    denom = F.col("__n") * F.col("__in")
    # a cluster with no indexed members leaves one unmatched left-join
    # row per new id: its cosine must stay NULL (not the zero-norm 0.0)
    # so (is_novel, match_id, cos_sim) come out (true, NULL, NULL)
    sim = F.when(
        F.col("__mid").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.when(denom > 0, dot(F.col("__v"), F.col("__iv")) / denom).otherwise(
            F.lit(0.0)
        )
    )
    # min over (−cos, id): highest cosine wins, ties go to the LOWER
    # id, and the id rides through the struct untouched — no numeric
    # negation of the id, so string/any-type ids survive with their
    # input type (max(struct(cos, −id)) broke both properties)
    best = F.min(
        F.struct((-F.col("__cos")).alias("nc"), F.col("__mid").alias("m"))
    )
    scored = (
        assigned.join(idx, "centroid_id", "left")
        .withColumn("__cos", sim)
        .groupBy(id_col)
        .agg(best.alias("__b"))
        .select(
            F.col(id_col),
            (
                F.col("__b.nc").isNull() | (-F.col("__b.nc") < threshold)
            ).alias("is_novel"),
            F.col("__b.m").alias("match_id"),
            F.round(-F.col("__b.nc"), 6).alias("cos_sim"),
        )
    )
    # NULL-embedding rows never reach two_level_assign (it filters
    # them); re-join so they surface with a NULL verdict instead of
    # vanishing from the output
    return (
        new.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            "is_novel",
            "match_id",
            "cos_sim",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory side of
# large-scale ANN: vectors compress to m small codes, distances are
# looked up from per-query tables (ADC) instead of computed on floats.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train per-subspace codebooks: split each vector into ``m``
    contiguous subvectors and run the deterministic :func:`kmeans_fit`
    on each slice.  Returns ``codebooks[m][k][d/m]`` as plain lists —
    the model is m·k·(d/m) = k·d doubles, bounded like the IVF
    centroids, so holding it driver-side is metadata-scale.

    Scale: training cost is m independent k-means runs over the SAME
    data (each one broadcast-assignment + k-key partial-agg shuffle per
    iteration); at 100 TB train on a deterministic sample
    (``llm.curation.deterministic_sample``) — codebooks converge on
    samples long before full passes pay off.
    """
    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        # same contract as lsh_bucketed_topk's guard: an empty corpus (or
        # a leading NULL vector) must not crash the dimensionality probe
        raise ValueError(
            "pq_train: corpus is empty or its first vector is NULL — "
            "cannot infer dimensionality"
        )
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col),
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                j * dsub + 1,
                dsub,
            ).alias("__sub"),
        )
        cents = kmeans_fit(sliced, k=k, iters=iters, id_col=id_col, vec_col="__sub")
        rows = {r["centroid_id"]: list(r["centroid"]) for r in cents.collect()}
        books.append([rows[c] for c in sorted(rows)])
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to ``m`` centroid indices (argmin L2 per
    subspace).  Entirely map-side; no shuffle.

    Round 12: Arrow-vectorized (guide §4.2).  The previous
    higher-order-fold form evaluated an INTERPRETED lambda tree of
    m·k·dsub pow/element_at steps per vector (HOFs get no whole-stage
    codegen) and measured 1.05 s for 2,000 × 64-dim vectors at sf0.1 —
    ~0.5 ms/vector of pure expression-interpreter overhead; this
    ``mapInArrow`` encoder runs the same arithmetic as NumPy batch ops
    and measures 0.23 s (4.6×), with BIT-IDENTICAL codes: float64
    accumulation in the same left-to-right dimension order, strict
    ``<`` comparison so ties keep the LOWER code, exactly like the
    fold (0/2000 code mismatches verified, and the DuckDB oracle pins
    the same argmin).  Only (id, vec) cross the Python boundary —
    column pruning is explicit because Spark cannot see inside the
    function (guide §4.1) — and the codebook is a task-local NumPy
    constant.
    """
    import numpy as np

    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    # NULL or too-short vectors cannot be encoded — exclude them (the
    # same skip-corrupt-rows contract as functions/vectors.dot's NULL
    # pad); longer vectors encode their first m*dsub dims, like the
    # fold's element_at(1..dsub) reads did
    df = df.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) >= m * dsub)
    )
    sel = df.select(F.col(id_col), F.col(vec_col))
    id_type = df.schema[id_col].dataType.simpleString()
    cb_plain = [[list(map(float, c)) for c in book] for book in codebooks]

    def _encode(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        cb = np.asarray(cb_plain, dtype=np.float64)  # (m, k, dsub)
        width = m * dsub
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0)
            embs = b.column(1)
            flat = np.asarray(
                embs.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
            )
            lengths = pc.list_value_length(embs).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            starts = np.zeros(len(lengths), dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            x = flat[starts[:, None] + np.arange(width)[None, :]]  # (N, m*dsub)
            n = b.num_rows
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                best = None
                besti = None
                for c in range(k):
                    cent = cb[j, c]
                    acc = np.zeros(n, dtype=np.float64)
                    for i in range(dsub):  # left-to-right, like the fold
                        d = sub[:, i] - cent[i]
                        acc += d * d
                    if best is None:
                        best, besti = acc, np.zeros(n, dtype=np.int32)
                    else:
                        better = acc < best  # strict: ties keep lower code
                        best = np.where(better, acc, best)
                        besti = np.where(better, np.int32(c), besti)
                codes[:, j] = besti
            yield pa.record_batch(
                [ids, pa.array(list(codes), type=pa.list_(pa.int32()))],
                names=[id_col, "codes"],
            )

    return sel.mapInArrow(
        _encode, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, precompute the m×|codebook|
    table of squared L2 distances from the query's subvectors to every
    centroid (driver-side numpy over the BOUNDED query set — the same
    broadcast-queries contract as :func:`brute_force_topk`), then score
    every encoded corpus vector by m table lookups and keep the k
    smallest per query.

    Scale: the corpus never shuffles — scoring is map-side lookups on
    the broadcast tables; the only shuffle is the final per-query
    ranking window over corpus·|queries| candidate rows, identical in
    shape to brute-force but with O(m) integer lookups per pair instead
    of O(d) float multiplies, over codes that are m bytes instead of
    d floats (the memory win that lets 100 TB of vectors fit a
    cluster's RAM).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # NULL query embeddings are excluded like every other scorer in the
    # module (brute_force/lsh/ivf): one bad row must not TypeError the
    # whole ANN search on the driver
    q_rows = (
        queries.filter(F.col(query_vec).isNotNull())
        .select(query_id, query_vec)
        .collect()
    )
    spark = codes.sparkSession
    qid_type = queries.schema[query_id].dataType.simpleString()
    if not q_rows:
        # sequence(0, -1) DESCENDS in Spark; guard the empty query set
        # (id type derived from the codes frame, not hardcoded)
        id_type = codes.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{query_id} {qid_type}, {id_col} {id_type}, pq_dist double, rnk int"
        )
    q_ids = [r[0] for r in q_rows]
    tables = []
    for r in q_rows:
        qv = [float(x) for x in r[1]]
        if len(qv) < m * dsub:
            # a short query would zip-truncate into silently WRONG
            # distance tables (and an empty subvector folds to Python
            # int 0, crashing createDataFrame with an unrelated error)
            raise ValueError(
                f"query {r[0]!r} has {len(qv)} dims but the codebooks "
                f"encode {m}x{dsub} = {m * dsub} - pad or re-train"
            )
        t_j = []
        for j in range(m):
            sub = qv[j * dsub : (j + 1) * dsub]
            t_j.append(
                [
                    sum((a - b) ** 2 for a, b in zip(sub, cent))
                    for cent in codebooks[j]
                ]
            )
        tables.append(t_j)
    lut = spark.createDataFrame(
        [(q_ids, tables)],
        f"__qids: array<{qid_type}>, __tabs: array<array<array<double>>>",
    )
    crossed = codes.crossJoin(F.broadcast(lut)).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(len(q_ids) - 1))).alias("__qi"),
        F.col("codes"),
        F.col("__qids"),
        F.col("__tabs"),
    )
    tab_q = F.col("__tabs")[F.col("__qi")]
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(tab_q[j], F.element_at("codes", j + 1) + 1),
    )
    scored = crossed.select(
        F.col("__qids")[F.col("__qi")].alias(query_id),
        F.col(id_col),
        dist.alias("pq_dist"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("pq_dist").asc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, id_col, F.round("pq_dist", 6).alias("pq_dist"), "rnk")
    )


def pq_topk_rerank(
    queries: DataFrame,
    codes: DataFrame,
    vectors: DataFrame,
    codebooks,
    k: int = 10,
    shortlist: int = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN, the production PQ pattern: ADC over compressed
    codes builds a per-query ``shortlist``, then ONLY the shortlisted
    vectors are re-scored with exact L2 and the true top-``k`` of the
    shortlist is returned.  Final recall equals the shortlist's
    coverage of the exact neighbours — tune ``shortlist`` (not the
    codebooks) to buy recall.

    Scale: the shortlist is |queries|·``shortlist`` rows → BROADCAST
    back against the float vectors, so the corpus is never shuffled for
    the refine step; exact distances are computed for the shortlist
    only, which is the entire point of compressing the corpus.
    """
    cand = pq_topk(
        queries, codes, codebooks, k=shortlist,
        query_id=query_id, query_vec=query_vec, id_col=id_col,
    ).select(query_id, id_col)
    qv = queries.select(
        F.col(query_id), F.col(query_vec).alias("__qv")
    )
    dim = len(codebooks) * len(codebooks[0][0])
    joined = (
        # a NULL/short shortlisted vector would ANSI-abort the exact-L2
        # fold's element_at(1..dim) — exclude, like pq_encode
        vectors.filter(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) >= dim)
        )
        .select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id)
    )
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.pow(
            F.element_at(F.col(vec_col), i).cast("double")
            - F.element_at("__qv", i),
            2,
        ),
    )
    scored = joined.select(
        F.col(query_id), F.col(id_col), dist.alias("l2_dist")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("l2_dist").asc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, id_col, F.round("l2_dist", 6).alias("l2_dist"), "rnk")
    )


def ivfpq_build(
    df: DataFrame,
    n_lists: int = 16,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build an IVF-PQ index (the FAISS-style production composition):
    a coarse k-means partitions vectors into ``n_lists`` inverted lists,
    and product quantization encodes each vector's RESIDUAL against its
    coarse centroid (residuals are what PQ compresses well — they're
    centered and small).

    Returns ``(coarse, codebooks, index_df)`` where ``coarse`` is the
    n_lists×d centroid table (driver-side, bounded), ``codebooks`` the
    PQ model, and ``index_df`` the (id, list_id, codes) index — the
    only corpus-sized artifact, at m small ints per vector.
    """
    cents = kmeans_fit(df, k=n_lists, iters=iters, id_col=id_col, vec_col=vec_col)
    coarse_rows = {r["centroid_id"]: list(r["centroid"]) for r in cents.collect()}
    coarse = [coarse_rows[c] for c in sorted(coarse_rows)]
    assigned = assign_nearest(df, cents, id_col=id_col, vec_col=vec_col).select(
        id_col, F.col("centroid_id").alias("list_id")
    )
    spark = df.sparkSession
    coarse_df = spark.createDataFrame(
        [(coarse,)], "__coarse: array<array<double>>"
    )
    dim = len(coarse[0])
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    with_res = (
        df.select(F.col(id_col), vecd.alias("__v"))
        .join(assigned, id_col)
        .crossJoin(F.broadcast(coarse_df))
        .select(
            F.col(id_col),
            "list_id",
            F.zip_with(
                F.col("__v"),
                F.col("__coarse")[F.col("list_id")],
                lambda a, b: a - b,
            ).alias("__residual"),
        )
        # materialize once: pq_train re-reads this m·(iters+1) times (one
        # per k-means assignment round per subspace) plus pq_encode and
        # the index join — without the checkpoint the corpus-wide
        # assignment join re-executes on every read
        .localCheckpoint()
    )
    books = pq_train(
        with_res.select(id_col, "__residual"), m=m, k=k, iters=iters,
        id_col=id_col, vec_col="__residual",
    )
    codes = pq_encode(with_res, books, id_col=id_col, vec_col="__residual")
    index_df = codes.join(with_res.select(id_col, "list_id"), id_col)
    return coarse, books, index_df


def ivfpq_topk(
    queries: DataFrame,
    coarse,
    codebooks,
    index_df: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search: per query, probe the ``nprobe`` nearest coarse
    lists and ADC-score ONLY vectors in those lists against per-(query,
    list) residual tables.

    The candidate reduction is the IVF win (nprobe/n_lists of the
    corpus is scored per query instead of all of it); the tables are
    computed driver-side over the BOUNDED query set and shipped as a
    broadcast (query, list, table) relation, so the corpus side is one
    broadcast equality join on list_id plus map-side lookups — never
    shuffled.
    """
    # NULL query embeddings excluded, short queries rejected — the same
    # driver-side contract as pq_topk (one bad row must not crash or
    # silently mis-rank the whole search)
    q_rows = (
        queries.filter(F.col(query_vec).isNotNull())
        .select(query_id, query_vec)
        .collect()
    )
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    pair_rows = []
    for r in q_rows:
        qv = [float(x) for x in r[1]]
        if len(qv) < m * dsub:
            raise ValueError(
                f"query {r[0]!r} has {len(qv)} dims but the codebooks "
                f"encode {m}x{dsub} = {m * dsub} - pad or re-train"
            )
        d_coarse = [
            sum((a - b) ** 2 for a, b in zip(qv, cent)) for cent in coarse
        ]
        probed = sorted(range(len(coarse)), key=lambda i: (d_coarse[i], i))[:nprobe]
        for li in probed:
            resid = [a - b for a, b in zip(qv, coarse[li])]
            tab = [
                [
                    sum(
                        (a - b) ** 2
                        for a, b in zip(resid[j * dsub : (j + 1) * dsub], cent)
                    )
                    for cent in codebooks[j]
                ]
                for j in range(m)
            ]
            pair_rows.append((r[0], li, tab))
    spark = index_df.sparkSession
    qid_type = queries.schema[query_id].dataType.simpleString()
    pairs = spark.createDataFrame(
        pair_rows,
        f"{query_id} {qid_type}, list_id int, __tab array<array<double>>",
    )
    joined = index_df.join(F.broadcast(pairs), "list_id")
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.col("__tab")[j], F.element_at("codes", j + 1) + 1),
    )
    scored = joined.select(F.col(query_id), F.col(id_col), dist.alias("pq_dist"))
    w = Window.partitionBy(query_id).orderBy(F.col("pq_dist").asc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, id_col, F.round("pq_dist", 6).alias("pq_dist"), "rnk")
    )


def truncate_embeddings(
    emb: DataFrame,
    dims: int = 16,
    renormalize: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style embedding truncation: keep the first ``dims``
    dimensions and (optionally) L2-renormalize — the serving-cost lever
    for MRL-trained embedding models (Kusupati et al. 2022), where
    prefixes of the vector are themselves valid embeddings at lower
    fidelity.  Pairs with :func:`quantize_embeddings` as the two
    standard index-shrinking moves (fewer dims × fewer bits).

    Map-only built-ins (slice/aggregate/transform) — no shuffle, no
    Python; at 100 TB this is a pure scan-rewrite alongside ingest.
    Zero-norm prefixes are passed through unnormalized (direction-less;
    renormalizing would divide by zero).  Returns (id, truncated
    array<double>, prefix_norm).
    """
    # prefix and norm materialize as columns BEFORE the renormalizing
    # transform — a lambda-captured aggregate re-evaluates per element,
    # turning O(dims) into O(dims²) per vector otherwise
    base = emb.select(
        F.col(id_col),
        F.slice(
            F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dims
        ).alias("__pre"),
    ).withColumn(
        "__norm",
        F.sqrt(
            F.aggregate(F.col("__pre"), F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    out = F.when(
        F.lit(renormalize) & (F.col("__norm") > 0),
        F.transform(F.col("__pre"), lambda x: x / F.col("__norm")),
    ).otherwise(F.col("__pre"))
    return base.select(
        F.col(id_col),
        out.alias("truncated"),
        F.col("__norm").alias("prefix_norm"),
    )
