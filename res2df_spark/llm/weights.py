"""Document reweighting and selection scores for training-data
curation: instead of the hard keep/drop decisions in
:mod:`res2df_spark.llm.dedup` and :mod:`res2df_spark.llm.curation`,
these operators assign each document a SAMPLING WEIGHT or a
classifier-style quality score, the way modern pretraining pipelines
mix "soft" signals (SoftDeDup-style frequency down-weighting, DSIR
hashed-n-gram importance resampling, CCNet/GPT-3-style linear quality
classifiers) rather than discarding data outright.

Scale notes (design target: a 100 TB corpus):

* every operator is a composition of token/shingle long-form explodes,
  partial-aggregated groupBys on uniform md5-derived keys, and joins
  whose small side is either provably tiny (the 256-bucket DSIR ratio
  table — a broadcast) or vocabulary-sized (the NB token-ratio table —
  a plain shuffle join that AQE broadcasts when it fits);
* corpus-level scalars (class token totals, vocabulary size, document
  counts) ride along as broadcast single-row cross joins — no
  driver-side ``.count()`` in any plan;
* all hashing is md5-based so the DuckDB oracle reproduces every score
  bit-for-bit (see functions/textan.py module docstring).

Reference analogue: the reference engine (equinor/res2df) has no
document-scoring surface; this family is north-star scope for the
LLM-pipeline goals in BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.session import spread
from res2df_spark.functions.textan import shingles, tokens
from res2df_spark.llm.curation import md5_bucket256


def _grams_long(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int | None,
    distinct: bool,
) -> DataFrame:
    """(id, gram) long form: words when ``shingle_k`` is None, k-word
    shingles otherwise.  ``distinct=False`` keeps multiplicity (needed
    by multinomial models).

    The token array is materialized into a column BEFORE the shingle
    transform: a lambda-captured expression is re-evaluated per array
    element, so passing the raw split into ``shingles`` would re-run
    the tokenization once per shingle index (the HOF-capture pitfall
    measured at 93× elsewhere in this project)."""
    base = spread(docs.filter(F.col(text_col).isNotNull())).withColumn(
        "__toks", tokens(text_col)
    )
    toks = F.col("__toks")
    grams = toks if shingle_k is None else shingles(toks, shingle_k)
    if distinct:
        # per-doc set semantics map-side: a document's grams all live in
        # its one row, so array_distinct before the explode replaces the
        # old post-explode .distinct() and its (id, gram) hash-aggregate
        # exchange (see functions.textan.doc_tokens_long)
        return base.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
        )
    return base.select(F.col(id_col), F.explode(grams).alias("gram"))


def soft_dedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """SoftDeDup-style sampling weights: down-weight repeated content
    instead of deleting it (He et al. 2024, "SoftDedup"; the soft
    counterpart of :func:`res2df_spark.llm.dedup.exact_duplicates`).

    Two signals per document:

    * ``group_size`` — exact-duplicate group size (md5(text) groups);
      ``w_exact = 1 / group_size`` splits one epoch's worth of
      gradient signal evenly across byte-identical copies.
    * ``mean_log_df`` — the document's "commonness": the mean over its
      DISTINCT k-word shingles of ln(number of documents containing
      that shingle).  Boilerplate-heavy documents score high even when
      no single byte-identical copy exists; ``w_soft = 1 / (1 +
      mean_log_df)`` is the smooth down-weight.  Documents with fewer
      than k tokens have no shingles and take commonness 0 (weight 1).

    Plan shape: one window count on the text hash (group sizes), one
    shingle explode pass with a window count on the gram key (document
    frequencies), one per-doc mean — two exchanges and ONE evaluation
    of the shingle pipeline.  No driver scalars; the window groups are
    bounded in bytes (ids + fixed-width keys) and spill-backed.
    NULL texts are excluded for the same phantom-group reason as
    ``exact_duplicates``.

    ``hash_fn="xxhash64"`` (the production backend — see
    ``llm.dedup._check_hash_fn``) replaces the md5 group key and the
    multi-word shingle STRING join key with 64-bit integer hashes: the
    df groupBy and the df join then shuffle 8-byte longs.  Group sizes
    and shingle document frequencies — hence every output weight — are
    IDENTICAL up to 64-bit collisions, so both backends share one
    oracle; ``"md5"`` stays the default for cross-engine replay.
    """
    from res2df_spark.llm.dedup import _check_hash_fn, _hash_col

    from pyspark.sql import Window

    _check_hash_fn(hash_fn)
    base = spread(docs.filter(F.col(text_col).isNotNull()))
    grp = base.select(F.col(id_col), _hash_col(hash_fn, text_col).alias("__h"))
    # group size as a window count over the text-hash key: the old
    # groupBy + join-back scanned and hashed the corpus twice (two
    # parquet scans, one broadcast build); the window pays ONE exchange
    # on __h and one pass.  A giant exact-dup group counts in one window
    # task (count only, spill-backed buffer) — the rows are (id, hash),
    # 24 bytes each, so even a million-copy group is ~24 MB in that task.
    by_doc = grp.withColumn(
        "group_size", F.count(F.lit(1)).over(Window.partitionBy("__h"))
    ).select(id_col, "group_size")

    sh = _grams_long(docs, id_col, text_col, shingle_k, distinct=True)
    if hash_fn == "xxhash64":
        # injective-up-to-collision: df counts and the per-doc mean are
        # preserved while the join key shrinks to a long
        sh = sh.select(id_col, F.xxhash64("gram").alias("gram"))
    # shingle document frequency as a window count over the gram key:
    # the old groupBy + join-back evaluated the whole tokenize→shingle→
    # explode→distinct pipeline a SECOND time for the df side (no
    # cross-branch plan reuse — two Generate branches in the physical
    # plan) and built a vocabulary-sized broadcast.  The window needs
    # one exchange on gram and one pipeline pass; per-gram counts are
    # identical, so mean_log_df is unchanged.  Same bounded skew
    # exposure as the _cap_buckets formulation (boilerplate gram rows
    # count in one spill-backed window task).
    commonness = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .groupBy(id_col)
        .agg(F.avg(F.log(F.col("__df"))).alias("mean_log_df"))
    )
    out = by_doc.join(commonness, id_col, "left").select(
        id_col,
        F.col("group_size").cast("long").alias("group_size"),
        F.round(F.coalesce(F.col("mean_log_df"), F.lit(0.0)), 6).alias(
            "mean_log_df"
        ),
        F.round(F.lit(1.0) / F.col("group_size"), 6).alias("w_exact"),
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.coalesce(F.col("mean_log_df"), F.lit(0.0))),
            6,
        ).alias("w_soft"),
    )
    return out


def dsir_weights(
    docs: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed n-gram features are under a
    TARGET distribution than under the RAW corpus distribution.

    Features are unigrams + bigrams hashed into ``n_buckets`` buckets
    (md5-derived, engine-portable; collisions are the point — the model
    stays 256 numbers regardless of vocabulary size).  With Laplace
    smoothing, ``lambda(b) = ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))``
    where ``t_b`` counts the feature in the target slice, ``r_b`` in
    the FULL raw corpus (target included — DSIR's denominator is the
    whole pool being resampled, not its complement), and ``T``/``R``
    are their totals; a document's ``log_weight`` is the
    feature-count-weighted sum of lambda over its buckets.  Resampling
    then keeps documents proportionally to ``exp(log_weight)`` — pair
    with :func:`res2df_spark.llm.curation.weighted_sample`.

    ``target_filter``: a boolean Column over ``docs`` rows selecting
    the target slice (e.g. ``F.col("lang") == "en"``).

    Every non-NULL-text document gets an output row: zero-token
    documents carry ``log_weight 0.0`` / ``n_feats 0`` instead of
    silently vanishing (a downstream weights⋈corpus join must not
    drop them).

    Plan shape: one gram explode (multiplicity kept), one
    (bucket)-keyed conditional aggregate producing the 2×256 count
    table, the lambda table broadcast back onto per-doc bucket counts,
    one per-doc sum.  The model is 256 rows BY CONSTRUCTION — the
    broadcast never grows with the corpus, the explicit fix for the
    k∝N anti-pattern.  Totals ride as a broadcast one-row cross join.
    """
    if n_buckets != 256:
        raise ValueError("md5_bucket256-backed DSIR supports n_buckets=256")
    nonnull = docs.filter(F.col(text_col).isNotNull())
    base = spread(nonnull).withColumn(
        "__is_t", target_filter
    ).withColumn("__toks", tokens(text_col))
    # token array materialized before the bigram transform — the HOF
    # lambda would re-run the tokenization per shingle index otherwise
    toks = F.col("__toks")
    grams = F.concat(toks, shingles(toks, 2))
    feat = base.select(
        F.col(id_col), "__is_t", F.explode(grams).alias("gram")
    ).withColumn("bucket", md5_bucket256(F.col("gram"), salt))
    # The 256-row count table is MATERIALIZED once (localCheckpoint):
    # its three consumers (totals, lambda, and totals again inside
    # lambda) would otherwise each re-run the corpus explode — column
    # pruning makes the branches canonically different, so Spark's
    # exchange reuse cannot deduplicate them.  Two corpus passes total
    # (counts + per-doc buckets), and the checkpoint is 256 rows by
    # construction.
    counts = (
        feat.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("t_b"),
            F.count(F.lit(1)).alias("r_b"),
        )
        .localCheckpoint(eager=True)
    )
    doc_buckets = feat.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("t_b").alias("__T"), F.sum("r_b").alias("__R")
    )
    lam = counts.crossJoin(broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_b") + 1) / (F.col("__T") + F.lit(n_buckets)))
            - F.log((F.col("r_b") + 1) / (F.col("__R") + F.lit(n_buckets)))
        ).alias("lam"),
    )
    scored = (
        doc_buckets.join(broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("n") * F.col("lam")), 6).alias("log_weight"),
            F.sum("n").cast("long").alias("n_feats"),
        )
    )
    # zero-token docs have no feature rows — restore them with the
    # empty-product weight (log 0.0) so the output covers every
    # non-NULL-text document.  The restore side reads the PRE-spread
    # frame: it does no per-row CPU, and the spread()'d lineage made it
    # pay a round-robin shuffle of the full row immediately followed by
    # the join's own hash exchange (two stacked exchanges in the plan).
    return nonnull.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
    )


def nb_quality_score(
    docs: DataFrame,
    positive_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet/GPT-3-style quality classifier score: a multinomial Naive
    Bayes log-odds of "looks like the positive slice" vs "looks like
    the rest", trained and applied in one declarative plan (the
    classic pretraining quality filter: train on a trusted corpus as
    positives, the raw crawl as negatives, keep documents whose score
    clears a bar — Brown et al. 2020 §A; Wenzek et al. 2020).

    With Laplace smoothing over the shared vocabulary ``V``:
    ``P(tok|c) = (cnt_c(tok)+1) / (N_c + |V|)`` and
    ``score(d) = ln(D_pos/D_neg) + Σ_tok cnt_d(tok) ·
    (ln P(tok|pos) − ln P(tok|neg))``; ``predicted_pos = score > 0``.

    Unlike :func:`dsir_weights` this is a per-TOKEN model with a class
    prior — the ratio table is vocabulary-sized, not fixed-size, so it
    joins on the token key (a plain shuffle join; AQE broadcasts it
    when the vocabulary fits, and at 100 TB a vocabulary table is
    still MBs — Heaps' law, not corpus-linear).  Token multiplicity
    counts (multinomial, not Bernoulli).  Scalars (class token totals,
    |V|, document counts) ride as one broadcast one-row cross join.

    Every non-NULL-text document gets an output row: zero-token
    documents score at the bare class prior instead of silently
    vanishing from the output.
    """
    nonnull = docs.filter(F.col(text_col).isNotNull())
    base = spread(nonnull).withColumn("__pos", positive_filter)
    tok = base.select(
        F.col(id_col), "__pos", F.explode(tokens(text_col)).alias("token")
    )
    # The vocabulary-sized class-count table is MATERIALIZED once
    # (localCheckpoint — bounded by Heaps' law, MBs even at 100 TB):
    # its consumers (scalars + ratio) would otherwise each re-run the
    # corpus explode, and column pruning defeats exchange reuse across
    # the branches.  Two corpus explode passes total (cls + doc_tok)
    # plus one explode-free column scan for the document prior.
    cls = (
        tok.groupBy("token")
        .agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
        )
        .localCheckpoint(eager=True)
    )
    doc_tok = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("n"))
    # Materialized like cls: scalars feeds BOTH the ratio table and the
    # zero-token prior row, and the two consumers prune to canonically
    # different plans (no exchange reuse) — without the checkpoint the
    # corpus-wide document-prior scan would run once per consumer.
    # Eager materialization also makes the degenerate-slice validation
    # below free.
    scalars = (
        cls.agg(
            F.sum("c_pos").alias("__np"),
            F.sum("c_neg").alias("__nn"),
            F.count(F.lit(1)).alias("__v"),
        )
        .crossJoin(
            broadcast(
                base.agg(
                    F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("__dp"),
                    F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("__dn"),
                )
            )
        )
        .localCheckpoint(eager=True)
    )
    counts = scalars.select("__dp", "__dn").first()
    if counts is None or not counts["__dp"] or not counts["__dn"]:
        # an empty class makes ln(D_pos/D_neg) a DIVIDE_BY_ZERO (ANSI)
        # or ln(0) = NULL-everything — fail loudly like the lm-score
        # CLI's empty-train-slice guard
        raise ValueError(
            "nb_quality_score: positive_filter matches "
            f"{0 if counts is None else counts['__dp']} positive and "
            f"{0 if counts is None else counts['__dn']} negative "
            "documents — both classes need at least one document"
        )
    ratio = cls.crossJoin(broadcast(scalars)).select(
        "token",
        (
            F.log((F.col("c_pos") + 1) / (F.col("__np") + F.col("__v")))
            - F.log((F.col("c_neg") + 1) / (F.col("__nn") + F.col("__v")))
        ).alias("llr"),
        (F.log(F.col("__dp") / F.col("__dn"))).alias("prior"),
    )
    scored = (
        doc_tok.join(ratio, "token")
        .groupBy(id_col)
        .agg(
            F.round(
                F.first("prior") + F.sum(F.col("n") * F.col("llr")), 6
            ).alias("nb_score"),
            (F.first("prior") + F.sum(F.col("n") * F.col("llr")) > 0).alias(
                "predicted_pos"
            ),
        )
    )
    # zero-token docs have no token rows — their NB score is the bare
    # class prior, not a silently missing row
    prior_row = scalars.select(
        (F.log(F.col("__dp") / F.col("__dn"))).alias("__prior")
    )
    # restore side off the PRE-spread frame — see dsir_weights: the
    # no-CPU branch must not pay a round-robin shuffle stacked under
    # the join's hash exchange
    return (
        nonnull.select(id_col)
        .crossJoin(broadcast(prior_row))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("nb_score"), F.round(F.col("__prior"), 6)).alias(
                "nb_score"
            ),
            F.coalesce(
                F.col("predicted_pos"), F.col("__prior") > 0
            ).alias("predicted_pos"),
        )
    )
