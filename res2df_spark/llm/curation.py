"""Training-data curation operators (north-star extension).

The pieces a large-scale training-data pipeline needs between "raw
corpus" and "training shards", kept strictly JVM-side (built-in
expressions only — no Python in the hot path):

* ``hash_split`` — deterministic train/val/test assignment by content
  hash: reproducible across runs/engines, no RNG state, stable under
  re-partitioning, and any engine (or DuckDB oracle) can re-derive it.
* ``doc_chunks`` — overlapping character windows per document (the
  chunking step before embedding): ``sequence`` + ``explode``, pure
  codegen.
* ``pii_scrub`` — regex redaction of email addresses and long digit
  runs, with per-document match counts for audit.
* ``pack_sequences`` — deterministic contiguous packing of documents
  into ~``target_tokens`` bins, sharded so no global ordering exists:
  each shard packs independently inside one window partition.
* ``deterministic_sample`` — hash-membership sampling: the same rows on
  every run, partitioning and engine, join-stable across tables.

100 TB notes: every operator here is embarrassingly parallel except
packing, which is the one genuinely order-dependent step — hence the
shard design: a hash shard is the unit of sequentiality, the window
never sees more than one shard, and shard count scales with the
cluster (vs a single global cumulative sum, which would serialize the
job through one partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from res2df_spark.functions.textan import token_count, tokens

#: Hex alphabet position trick shared with the DuckDB oracles.
_HEX = "0123456789abcdef"


def md5_bucket256(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 256): value of the first two hex
    nibbles of ``md5(salt || value)``.  Uniform (md5), engine-portable
    (DuckDB: two strpos lookups on the same digest), and independent of
    partitioning — the property RNG-based splits lack."""
    digest = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(digest, 1, 2), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 230,
    val: int = 243,
    salt: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by hash bucket: bucket < train
    → 'train', < val → 'val', else 'test' (defaults ≈ 90/5/5 of 256).
    Deterministic per id: re-running, re-partitioning, or growing the
    corpus never moves an existing document across splits."""
    if not 0 <= train <= val <= 256:
        # train/val are CUMULATIVE bucket bounds, not per-split sizes —
        # e.g. train=230, val=243 means 13 val buckets; reject the
        # per-split misreading (train=230, val=13) that would silently
        # empty the val split
        raise ValueError(
            f"need 0 <= train ({train}) <= val ({val}) <= 256 — the "
            "bounds are cumulative bucket thresholds"
        )
    b = md5_bucket256(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train, "train").when(b < val, "val").otherwise("test"),
    )


def doc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Overlapping character windows per document: chunk ``i`` covers
    ``[i*(chunk_chars-overlap), …+chunk_chars)``.  Empty/NULL documents
    yield no chunks.  ``sequence``+``explode`` keeps the fan-out inside
    whole-stage codegen — no UDF, no driver loop."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    text = F.col(text_col)
    # Start bound length-overlap (not length): a start inside the final
    # overlap region would yield a chunk fully contained in its
    # predecessor — pure duplicate text.  Coverage is preserved: the
    # last kept start is > length-chunk_chars, so its chunk reaches the
    # end of the document.
    out = (
        df.filter(text.isNotNull() & (F.length(text) > 0))
        .select(
            F.col(id_col),
            text.alias("__text"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length(text) - overlap, F.lit(1)),
                    F.lit(step),
                )
            ).alias("__start"),
        )
        .select(
            id_col,
            ((F.col("__start") - 1) / step).cast("long").alias("chunk_idx"),
            F.substring(
                F.col("__text"), F.col("__start").cast("int"), chunk_chars
            ).alias("chunk_text"),
        )
    )
    return out.withColumn("chunk_chars", F.length("chunk_text"))


#: Simple, engine-portable redaction patterns (kept free of perl-style
#: classes so Java regex and DuckDB RE2 agree).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
LONGNUM_RE = "[0-9][0-9]{6,}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and 7+ digit runs, recording per-document counts.

    Counts first, then replacement, both as built-in regexp expressions
    (JVM, codegen).  The two patterns are deliberately conservative —
    curation pipelines tune the pattern set; the operator shape (count →
    replace → audit columns) is the stable part."""
    text = F.col(text_col)
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    scrub = F.regexp_replace(no_email, LONGNUM_RE, "<NUM>")
    return df.select(
        id_col,
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        # counted on the email-scrubbed text: digit runs inside an email
        # were consumed by <EMAIL> and are NOT <NUM> redactions — the
        # audit count must equal the substitutions actually performed
        F.regexp_count(no_email, F.lit(LONGNUM_RE)).cast("long").alias("n_longnums"),
        scrub.alias("scrubbed"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_tokens: int = 512,
    n_shards: int = 8,
    salt: str = "pack",
    passthrough: Sequence[str] = (),
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Deterministic contiguous packing: documents are hashed into
    ``n_shards`` independent shards; inside a shard (ordered by id) a
    document's bin is ``floor(tokens_before_it / target_tokens)``.

    ``shuffle_salt`` replaces the within-shard id ordering with a
    deterministic pseudo-random one (order by ``md5(shuffle_salt ||
    id)``): the scalable global shuffle training pipelines run before
    packing, so neighbouring source documents stop landing in the same
    bin.  Still a pure function of (id, salts) — same permutation on
    any partitioning or engine; re-salt to re-shuffle between epochs.

    Packing contract: this is floor-of-running-total assignment, NOT
    first-fit — a document whose tokens straddle a multiple of
    ``target_tokens`` is assigned to the bin its FIRST token falls in,
    so bins can exceed ``target_tokens`` by up to one document (the
    consumer truncates or spills at sequence-build time, as packed
    pretraining loaders do).  Greedy first-fit would make every bin
    assignment depend on every earlier fit decision; the floor contract
    keeps assignment a pure function of the prefix-sum, which is what
    lets the sequential dependency be confined to one shard = one
    window partition — shard count, not corpus size, bounds the serial
    work.  256 % n_shards must be 0 for uniform shards (powers of two
    up to 256)."""
    if 256 % n_shards != 0:
        raise ValueError("n_shards must divide 256 for uniform sharding")
    # NULL text = 0 tokens (size(NULL) is -1 under legacy sizeOfNull —
    # it must not decrement the running total)
    toks = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(token_count(F.col(text_col)))
    shard = (md5_bucket256(F.col(id_col), salt) % n_shards).alias("shard")
    order = (
        F.col(id_col)
        if shuffle_salt is None
        else F.md5(F.concat(F.lit(shuffle_salt), F.col(id_col).cast("string")))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in passthrough],
            toks.alias("n_tokens"),
            shard,
        )
        .withColumn("__before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            *passthrough,
            "n_tokens",
            "shard",
            F.floor(F.col("__before") / target_tokens).cast("long").alias("bin_id"),
        )
    )


def pack_texts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_tokens: int = 512,
    n_shards: int = 8,
    salt: str = "pack",
    sep: str = "\n\n",
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Materialize the packed training sequences: after
    :func:`pack_sequences` assigns (shard, bin), concatenate each bin's
    documents in id order with ``sep`` between them — one row per bin
    with the packed text, document count and token total.  The
    order-deterministic concat is array_sort over (id, text) structs,
    so the output is a pure function of the corpus (same rows on any
    partitioning or engine; the oracle re-derives it with
    string_agg ORDER BY id).  One window (shard-confined prefix sum) +
    one aggregation; bin payloads are ~``target_tokens`` tokens, so no
    aggregate buffer ever holds more than a couple of documents."""
    bins = pack_sequences(
        df, id_col, text_col, target_tokens, n_shards, salt,
        passthrough=(text_col,), shuffle_salt=shuffle_salt,
    )
    key = (
        F.col(id_col)
        if shuffle_salt is None
        else F.md5(F.concat(F.lit(shuffle_salt), F.col(id_col).cast("string")))
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    key.alias("k"),
                    F.col(id_col).alias("i"),
                    F.col(text_col).alias("t"),
                )
            )
        ),
        lambda s: s["t"],
    )
    return bins.groupBy("shard", "bin_id").agg(
        F.array_join(ordered, sep).alias("packed_text"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(id_col).alias("first_id"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", fraction: float = 0.1, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by content hash:
    row kept iff its md5 bucket < round(256·fraction).

    Unlike ``df.sample`` (seeded RNG over partition contents), the
    decision depends only on the id — the same rows are sampled on
    every run, on any partitioning, on any engine, and membership is
    join-stable across derived tables keyed by the same id.  Within any
    stratum the hash is uniform, so per-group fractions track the
    global fraction (deterministic stratified sampling for free).
    Granularity is 1/256; fraction resolves to the nearest bucket edge.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be within [0, 1]")
    threshold = int(round(256 * fraction))
    return df.filter(md5_bucket256(F.col(id_col), salt) < threshold)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling toward a target mix: each
    stratum value keeps its own ``fractions[stratum]`` share of rows
    (hash membership, same guarantees as :func:`deterministic_sample`
    — run/partitioning/engine-stable, join-stable by id).  Strata
    missing from ``fractions`` are dropped, which is the decision a
    domain-mixing recipe wants made explicitly.

    This is the domain/language re-weighting step of a training-data
    pipeline (e.g. downsample boilerplate-heavy web domains, upsample
    under-represented languages to their target proportion ≤ 1.0).
    Map-only: a literal-map lookup and one integer compare per row —
    no shuffle, no RNG state, and an external engine can re-derive
    membership from (id, stratum) alone.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be within [0, 1]")
    thresholds = F.create_map(
        *[
            lit
            for s, f in sorted(fractions.items())
            for lit in (F.lit(s), F.lit(int(round(256 * f))))
        ]
    )
    thr = thresholds[F.col(strata_col)]
    return df.filter(md5_bucket256(F.col(id_col), salt) < F.coalesce(thr, F.lit(0)))


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based source re-mixing: downsample each source so
    the output mix follows ``p_s^alpha`` (renormalized) instead of the
    raw corpus shares ``p_s`` — the multinomial temperature sampling
    multilingual/multi-domain training recipes use (alpha < 1 flattens
    the mix toward uniform; alpha = 1 is a no-op).

    Acceptance rate per source is ``count_s^(alpha-1)`` scaled so the
    rarest source keeps everything (rate 1.0) — no source is ever
    upsampled, only the over-represented ones are thinned toward the
    target ratio.  Membership is deterministic hash acceptance
    (:func:`deterministic_sample` semantics, 1/256 granularity): the
    same rows survive on every run, partitioning and engine.

    Plan shape: one tiny per-source count aggregate, rates derived on
    that kilobyte-sized table and BROADCAST back, then a map-only
    filter — the corpus itself never shuffles.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    # materialized: scale and the rates projection are two consumers of
    # this kilobyte table, and column pruning would otherwise re-run
    # the corpus-wide count aggregate once per consumer
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    ratio = F.pow(F.col("__n").cast("double"), F.lit(alpha - 1.0))
    scale = counts.select(F.max(ratio).alias("__max_ratio"))
    rates = (
        counts.crossJoin(F.broadcast(scale))
        .select(
            F.col(source_col).alias("__mix_src"),
            F.round(F.lit(256) * ratio / F.col("__max_ratio"))
            .cast("long")
            .alias("__threshold"),
        )
    )
    # null-safe join: a NULL source is a legitimate group (counts
    # aggregates it like any other); a plain equi-join would silently
    # drop those rows even at alpha=1, the documented no-op
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__mix_src")),
        )
        .filter(md5_bucket256(F.col(id_col), salt) < F.col("__threshold"))
        .drop("__mix_src", "__threshold")
    )


def split_leakage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split leakage audit: identical texts that landed in more
    than one split.  :func:`hash_split` is deterministic per id, so two
    EXACT-DUPLICATE documents with different ids can legitimately land
    in different splits — which silently leaks training text into eval.
    The fix is dedup-before-split; this audit is how you notice.

    One hash-aggregation on md5(text) (the exact-dedup shuffle shape):
    returns one row per leaking text — (text_md5, n_docs, n_splits,
    splits as a sorted csv) for every text seen in ≥ 2 splits.
    NULL texts are exempt: md5(NULL) is NULL and groupBy pools NULL
    keys, so without the filter every NULL-text document would fuse
    into one phantom "leak" (the exact_duplicates pitfall).
    """
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col(split_col)).alias("n_splits"),
            F.array_join(
                F.array_sort(F.collect_set(F.col(split_col))), ","
            ).alias("splits"),
        )
        .filter(F.col("n_splits") >= 2)
    )


def mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    budget_tokens: int = 1_000_000,
    text_col: str = "text",
) -> DataFrame:
    """The planning side of :func:`temperature_mix`: per source, the
    corpus token share, the temperature-flattened target share
    (``share^alpha`` renormalized) and the planned token allocation out
    of ``budget_tokens`` — the table a training-mixture recipe is
    reviewed against before any data moves.

    One partial-aggregated groupBy on the (low-cardinality) source key
    plus a broadcast single-row total — at 100 TB this is a scan and a
    kilobyte of aggregate state.  Returns (source, n_docs, n_tokens,
    share, target_share, planned_tokens) with shares rounded to 6 dp.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    toks = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        token_count(F.col(text_col))
    )
    # materialized: totals, wsum and the final select are three
    # consumers of this few-row table — without the checkpoint the
    # corpus-wide token aggregate would run once per consumer
    per_src = (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    share = F.when(
        F.col("__total") > 0, F.col("n_tokens") / F.col("__total")
    ).otherwise(F.lit(0.0))
    weight = F.pow(share, F.lit(alpha))
    totals = per_src.agg(F.sum("n_tokens").alias("__total"))
    weighted = per_src.crossJoin(F.broadcast(totals)).withColumn(
        "__w", weight
    )
    wsum = weighted.agg(F.sum("__w").alias("__wsum"))
    target = F.when(
        F.col("__wsum") > 0, F.col("__w") / F.col("__wsum")
    ).otherwise(F.lit(0.0))
    return (
        weighted.crossJoin(F.broadcast(wsum))
        .select(
            source_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(share, 6).alias("share"),
            F.round(target, 6).alias("target_share"),
            F.round(target * budget_tokens)
            .cast("long")
            .alias("planned_tokens"),
        )
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-document n-gram overlap against an
    evaluation set.  A training corpus must not contain eval data; the
    standard check (GPT-3 appendix C lineage) flags any document whose
    ``shingle_k``-gram set overlaps the benchmark's beyond a threshold.

    Returns one row per document with ≥ 1 shingle: (id, n_shingles,
    n_contaminated, contamination ∈ [0, 1], is_contaminated).  Documents
    too short to form a shingle produce no row — they cannot carry a
    benchmark answer of ``shingle_k`` tokens.

    Scale: the benchmark shingle set is DISTINCT over eval suites —
    thousands of documents, a few million shingles — and broadcasts
    (``broadcast_benchmark``); the corpus side then never shuffles on
    the shingle: one broadcast-hash left join + one aggregation on the
    (uniform) doc id.  Set ``broadcast_benchmark=False`` to fall back
    to a shuffle join for benchmark sets beyond broadcast size.
    """
    from res2df_spark.llm.dedup import _doc_token_sets

    doc_sh = _doc_token_sets(docs, id_col, text_col, None, shingle_k)
    bench_sh = (
        _doc_token_sets(benchmark, id_col, text_col, None, shingle_k)
        .select("token")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    contamination = F.round(
        F.col("n_contaminated") / F.col("n_shingles"), 6
    ).alias("contamination")
    return (
        doc_sh.join(bench_sh, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            contamination,
            (F.col("n_contaminated") / F.col("n_shingles") >= threshold).alias(
                "is_contaminated"
            ),
        )
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 10.0,
    max_dup_token_frac: float = 0.5,
    min_alpha_ratio: float = 0.6,
    passthrough: "Sequence[str]" = (),
) -> DataFrame:
    """Heuristic document quality gate (Gopher/C4-rule lineage): length,
    mean token length, token repetition, and alphabetic-ratio checks
    composed into one verdict with a per-rule reason bitmask —
    bit 0: token count outside [min_tokens, max_tokens];
    bit 1: mean token length outside [min, max];
    bit 2: duplicate-token fraction above the cap;
    bit 3: alphabetic character ratio below the floor.
    ``keep`` is true iff the bitmask is 0.  The bitmask (rather than a
    bare boolean) is what a corpus-audit dashboard aggregates: which
    rule rejects how much of which source.

    All metrics derive from integer counts (token/char lengths), so the
    double arithmetic is bit-identical on any engine — thresholds never
    flip across engines.  Map-only built-ins: zero shuffles at any
    corpus size; empty documents fail rules 0 and 3 with NULL metrics
    where undefined.
    """
    # bind the token array once — tokens() is a filter(split(...)) HOF
    # that gets no common-subexpression elimination, and it feeds three
    # metrics below
    docs = docs.withColumn("__qf_toks", tokens(F.col(text_col)))
    toks = F.col("__qf_toks")
    # NULL text => size() is NULL under ANSI; a NULL document has ZERO
    # tokens, so it must trip the length rule (bit 0) like any short doc
    n = F.coalesce(F.size(toks), F.lit(0))
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n,
    )
    dup_frac = F.when(n > 0, (n - F.size(F.array_distinct(toks))).cast("double") / n)
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    alpha = F.when(
        F.length(text_col) > 0, n_alpha.cast("double") / F.length(text_col)
    )
    r0 = (n < min_tokens) | (n > max_tokens)
    r1 = mean_len.isNull() | (mean_len < min_mean_token_len) | (mean_len > max_mean_token_len)
    r2 = F.coalesce(dup_frac > max_dup_token_frac, F.lit(False))
    r3 = alpha.isNull() | (alpha < min_alpha_ratio)
    mask = sum(
        F.when(r, F.lit(1 << b)).otherwise(F.lit(0))
        for b, r in enumerate((r0, r1, r2, r3))
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(alpha, 6).alias("alpha_ratio"),
        mask.cast("int").alias("reject_mask"),
        (mask == 0).alias("keep"),
    )


def quality_report(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Corpus audit rollup over :func:`quality_filter`: per
    ``group_col`` (source/domain/language), how many documents each
    rule rejects and the overall keep rate — the dashboard aggregation
    a curation run is tuned against.  One partial-aggregated groupBy on
    the (low-cardinality) group key after the map-only gate; at 100 TB
    this is a scan plus a kilobyte-sized aggregate."""
    gated = quality_filter(
        docs, id_col=id_col, text_col=text_col,
        passthrough=(group_col,), **thresholds
    )
    bit = lambda b: F.sum(  # noqa: E731
        F.when(F.col("reject_mask").bitwiseAND(1 << b) != 0, 1).otherwise(0)
    )
    return gated.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        bit(0).alias("n_reject_len"),
        bit(1).alias("n_reject_meanlen"),
        bit(2).alias("n_reject_rep"),
        bit(3).alias("n_reject_alpha"),
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    min_shared: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The audit trail behind :func:`contamination_check`: which
    benchmark document a flagged corpus document actually overlaps —
    (doc, bench_doc, n_shared, doc_shingles, overlap_frac) for every
    pair sharing ≥ ``min_shared`` shingles.  Decontamination reviews
    need the matched eval item, not just a per-doc flag.

    Same scale shape as the check: benchmark shingles broadcast
    (``broadcast_benchmark``), corpus side never shuffles on the
    shingle; the pair aggregation shuffles only rows that matched at
    all — bounded by true contamination, not corpus size.
    """
    from res2df_spark.llm.dedup import _doc_token_sets

    doc_sh = _doc_token_sets(docs, id_col, text_col, None, shingle_k)
    sizes = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("doc_shingles"))
    bench_sh = _doc_token_sets(benchmark, id_col, text_col, None, shingle_k).select(
        F.col(id_col).alias("bench_id"), "token"
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    pairs = (
        doc_sh.join(bench_sh, "token")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.join(sizes, id_col).select(
        id_col,
        "bench_id",
        "n_shared",
        "doc_shingles",
        F.round(F.col("n_shared") / F.col("doc_shingles"), 6).alias("overlap_frac"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 exponential-jitter form): each row draws a
    hash-derived uniform u ∈ (0,1) and the k rows with the smallest
    ``-ln(u) / weight`` win — inclusion probability is proportional to
    weight, and because u comes from md5(salt‖id) rather than an RNG the
    selection is run-, partitioning- and engine-stable (same guarantees
    as :func:`deterministic_sample`, which this generalizes to
    non-uniform weights — e.g. sample documents proportional to token
    count so the SAMPLE's token mass mirrors the corpus).

    Non-positive/NULL weights are filtered out (never sampled, even
    when ``k`` exceeds the positive-weight row count).  Scale shape: the
    key is map-side arithmetic; selection is a global top-k, which Spark
    executes as per-partition top-k + a k-row driver merge
    (TakeOrderedAndProject) — no full sort, no shuffle of the corpus.
    """
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    w = F.col(weight_col).cast("double")
    # filtered OUT, not just sorted last: when k exceeds the number of
    # positive-weight rows, +inf-key rows would otherwise fill the
    # remaining slots with probability-zero selections
    return (
        df.filter(w > 0)
        .withColumn("__es_key", -F.log(u) / w)
        .orderBy(F.col("__es_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__es_key")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` rows per group, chosen by
    deterministic hash priority (md5(salt‖id) lexicographic order, id
    tie-break) — i.e. a uniform random-but-reproducible subset of each
    group, independent of row order and partitioning.

    The per-domain cap of web-corpus curation (no single site may
    dominate the training mix).  One shuffle on ``group_col``;
    ``row_number`` needs each group's rows in one task, so a
    pathologically hot group is a skew task — acceptable because the
    window does no buffering beyond the sort, and at 100 TB the
    group key (domain/source) has enough cardinality for AQE to
    balance the rest.
    """
    pri = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
