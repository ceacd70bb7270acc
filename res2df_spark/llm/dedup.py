"""Deduplication operators over a documents table.

Scale notes (the design target is a 100 TB corpus):

* ``exact_duplicates`` — one hash-aggregate on md5(text): a single
  shuffle on a uniformly distributed 128-bit key; no skew by
  construction.
* ``ngram_jaccard_pairs`` — all-pairs verification is O(n²); it is
  gated behind candidate generation (shared-token inverted index or
  MinHash-LSH).  Hot tokens are capped (``max_token_df``) exactly like a
  production inverted index drops stop-shingles, bounding the blowup of
  the token-join.
* ``minhash_lsh_candidates`` — the scalable near-dup path: signature is
  a per-doc aggregate (partition-local after one explode), banding turns
  O(n²) into equality joins on band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from res2df_spark.session import spread, truncate_lineage
from res2df_spark.functions.textan import (
    doc_tokens_long,
    shingles,
    tokens,
)


def exact_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Group identical texts by content hash; returns one row per text
    group (singletons included) with the keeper (min id) and the group
    size.  NULL texts are EXCLUDED — hash(NULL) is NULL and groupBy
    would pool every null-text document into one phantom "duplicate"
    group whose keeper-join consumers would then delete all but one of
    them.

    ``hash_fn="xxhash64"`` (see :func:`_check_hash_fn`) groups on the
    64-bit integer hash instead of the md5 hex string — an 8-byte
    shuffle key, no crypto rounds; group membership (hence keeper and
    size) is identical up to 64-bit collisions.  The group-key column
    is named ``text_md5``/``text_xx64`` accordingly."""
    _check_hash_fn(hash_fn)
    key = _hash_col(hash_fn, text_col).alias(
        "text_md5" if hash_fn == "md5" else "text_xx64"
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), key)
        .groupBy("text_md5" if hash_fn == "md5" else "text_xx64")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _check_hash_fn(hash_fn: str) -> None:
    """The pairing/signature builders accept two element-hash backends:
    ``"md5"`` (default — hex strings, reproducible in ANSI SQL so every
    oracle row can recompute it) and ``"xxhash64"`` (Spark's built-in
    non-cryptographic 64-bit hash — an integer key, no hex-string
    materialization, measured several× cheaper through the signature
    hot loops; the production choice at 100 TB where hash CPU is real
    money and cross-engine reproducibility is not needed)."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}"
        )


def _hash_col(hash_fn: str, col):
    """The two-backend element hash as ONE shared expression builder —
    every two-branch backend selection in the dedup/weights family goes
    through here so a backend change (seeding, casting, a third
    backend) lands everywhere at once instead of desynchronizing the
    sites the round-8 invariance oracles compare.  Accepts a Column or
    a column name; see :func:`_check_hash_fn` for the backend
    contract."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c) if hash_fn == "md5" else F.xxhash64(c)


def _doc_token_arrays(docs: DataFrame, text_col: str, shingle_k: int | None):
    """(docs', __arr-expression) where ``__arr`` is the DISTINCT
    token/shingle array computed whole inside each document row — the
    shared front of :func:`_doc_token_sets` (which explodes it) and of
    the map-side set-size shortcut (``size(__arr)`` is the per-doc set
    size with ZERO shuffle, exactly because the distinct happens inside
    the row).

    Returned as an EXPRESSION over ``docs'``, never a projected column:
    ``explode()`` over a projected alias invites
    InferFiltersFromGenerate to add ``size(attr) > 0`` below the
    Generate, which predicate pushdown then re-expands through the
    alias into a full duplicate of the tokenize→shingle→distinct
    pipeline inside a non-codegen Filter under the exchange — measured
    3-4× on every shingle-family query (decontaminate 1.2 → 3.6 s
    interleaved).  Inline in the Generate, the rule's
    expensive-expression guard skips it."""
    docs = spread(docs)
    if shingle_k:
        # materialize the token array before the shingle transform: a
        # lambda-captured expression re-evaluates per array element, so
        # the raw split would re-run once per shingle index.
        return docs.withColumn("__toks", tokens(text_col)), F.array_distinct(
            shingles(F.col("__toks"), shingle_k)
        )
    return docs, F.array_distinct(tokens(text_col))


def _doc_token_sets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_token_df: int | None,
    shingle_k: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, token) long form; ``shingle_k`` switches the set elements from
    words to k-word shingles (much more selective — the scale path).

    ``hash_fn="xxhash64"`` replaces each raw token/shingle STRING with
    its 64-bit hash before the distinct: the inverted-index join then
    shuffles 8-byte longs instead of multi-word shingle strings, and
    set sizes / overlaps — hence Jaccard and containment — are
    IDENTICAL up to 64-bit collisions (``"md5"`` keeps raw strings; the
    oracle rows use that form so DuckDB can rebuild the same index).

    Per-doc set semantics via array_distinct BEFORE the explode — the
    shingles of one document live in its one row, so the old
    post-explode .distinct() paid an (id, token) hash-aggregate
    exchange for nothing (see doc_tokens_long).
    """
    _check_hash_fn(hash_fn)
    base, arr = _doc_token_arrays(docs, text_col, shingle_k)
    toks = base.select(F.col(id_col), F.explode(arr).alias("token"))
    if hash_fn == "xxhash64":
        # injective-up-to-collision map: distinctness, set sizes and
        # intersections are preserved; the join key shrinks to a long
        toks = toks.select(id_col, F.xxhash64("token").alias("token"))
    if max_token_df is not None:
        if shingle_k:
            # SHINGLE keys: stop-shingle cap as a WINDOW count over the
            # token key instead of a groupBy + join-back: the old form
            # re-evaluated the whole tokenize→shingle→explode pipeline a
            # second time to build the document-frequency side (no
            # cross-branch plan reuse), then joined it back.  The window
            # needs ONE exchange on the token key — which the
            # inverted-index self-join downstream wants anyway (same
            # key, exchange reused) — and one pipeline pass.  Skew note:
            # a k-word shingle key DILUTES hot-key mass (no single
            # shingle owns a corpus-scale share the way a stop word
            # does), so the one-window-task exposure is bounded;
            # WindowExec spills its per-group buffer, and hot shingles
            # are precisely the rows this filter then discards.
            from pyspark.sql import Window

            toks = (
                toks.withColumn(
                    "__tdf", F.count(F.lit(1)).over(Window.partitionBy("token"))
                )
                .filter(F.col("__tdf") <= max_token_df)
                .drop("__tdf")
            )
        else:
            # WORD keys (round 12): a unigram stop word appears in
            # ~every document, and a window count over the raw token
            # key would funnel its ENTIRE postings list into one
            # un-splittable window task (no partial aggregation, and
            # AQE cannot split window partitions) — an O(corpus)
            # straggler at 100 TB, the same adjudication that reverted
            # tfidf's window-df (llm/vocab.py).  Hot keys are exactly
            # what partial aggregation collapses: compute the cap
            # VIOLATORS with a map-side-combined groupBy (output is
            # only the tokens with df > cap — tiny by definition) and
            # broadcast them back as an anti-filter.  Costs a second
            # pipeline pass for the df branch; buys a postings table
            # whose downstream token-key exchange never carries a hot
            # key at all.
            hot = (
                toks.groupBy("token")
                .agg(F.count(F.lit(1)).alias("__tdf"))
                .filter(F.col("__tdf") > max_token_df)
                .select("token")
            )
            # re-select to keep the (id, token) column order the join
            # key reordering would otherwise break
            toks = toks.join(F.broadcast(hot), "token", "anti").select(
                id_col, "token"
            )
    return toks


def _pair_overlap(
    toks: DataFrame, id_col: str, sizes: DataFrame | None = None
) -> DataFrame:
    """Inverted-index pair overlap: from (id, token) long form, every
    pair of docs sharing ≥1 token with (d1, d2, n_shared, size1, size2)
    and d1 < d2 — the shared candidate-generation block behind the
    Jaccard and containment pairings (one code path, so a skew guard or
    cap change lands everywhere at once).

    Bucket-enumeration form: the postings group into a sorted per-token
    membership array on the SAME token-key partitioning the cap window
    already established (the aggregation adds no exchange), and (i < j)
    pairs stream out of the shared chained-Generate combinatorics
    (:func:`_bucket_pairs`) instead of the old t1 ⋈ t2 self-join, which
    re-read the postings exchange on two more branches, re-SORTED each
    of them for its window, and broadcast one whole postings side as the
    join build (measured 1.35 → 0.98 s on the sf0.1 capped
    containment; the postings exchange is runtime-reused across the
    remaining consumers by AQE stage reuse / ReuseExchange).  Bucket
    arrays are bounded by the callers' ``max_token_df`` window cap,
    which filters hot tokens BEFORE this aggregation; explicitly
    uncapped calibration paths materialize df-sized arrays — the same
    quadratic exposure their self-join form already accepted.

    ``sizes`` (id, set_size): optional pre-computed per-doc set sizes —
    uncapped callers pass the zero-shuffle ``size(__arr)`` form (the
    set size is knowable map-side per document row); capped callers
    leave it None and the post-cap sizes derive from the buckets
    themselves."""
    buckets = toks.groupBy("token").agg(
        F.sort_array(F.collect_list(id_col)).alias("__ids")
    )
    if sizes is None:
        # post-cap sizes straight off the capped postings: counting
        # each id's surviving postings is the same number as exploding
        # the bucket membership arrays back out, but the count form
        # re-executes only the (reused) token exchange + cap window —
        # the bucket-derived form re-ran the whole Sort + collect_list
        # aggregation and paid a Generate just to undo it (plan diff on
        # dedup_containment: second ObjectHashAggregate pair + Sort +
        # Generate replaced by one partial-agg count)
        sizes = toks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("set_size")
        )
    shared = (
        _bucket_pairs(buckets.filter(F.size("__ids") > 1), "__ids")
        .select(F.col("a").alias("d1"), F.col("b").alias("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("set_size").alias("size1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("set_size").alias("size2"))
    return shared.join(s1, "d1").join(s2, "d2")


def _map_side_sizes(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_token_df: int | None,
    shingle_k: int | None,
) -> DataFrame | None:
    """Per-doc set sizes with ZERO shuffle for the UNCAPPED pairing
    paths: the distinct token array lives whole in each document row, so
    its size is one map-side expression.  Returns None when a
    ``max_token_df`` cap is active — post-cap sizes must count only the
    surviving postings, which the capped :func:`_pair_overlap` derives
    from its buckets.  (Docs with empty token sets get a (id, 0) row the
    long-form groupBy never produced; pair ids always hold ≥1 shared
    token, so the inner size joins drop those rows identically.)"""
    if max_token_df is not None:
        return None
    base, arr = _doc_token_arrays(docs, text_col, shingle_k)
    # cast matches the count()-derived long of the capped path, so the
    # output schema does not depend on which sizes form a caller gets
    return base.select(
        F.col(id_col), F.size(arr).cast("long").alias("set_size")
    )


#: Default stop-shingle cap for the inverted-index pairing family.  A
#: token/shingle shared by d documents fans out d² candidate rows in the
#: pair join; 1000 bounds any single key's contribution to ≤10⁶ rows (a
#: task-sized unit) while in natural corpora only boilerplate shingles
#: ever reach that document frequency — and a shingle in >1000 documents
#: carries ~no similarity signal anyway (the classic stop-word argument,
#: applied to shingles).  Pass ``max_token_df=None`` to opt out
#: explicitly (exact-truth calibration paths do).
DEFAULT_MAX_TOKEN_DF = 1000


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_token_df: int | None = DEFAULT_MAX_TOKEN_DF,
    shingle_k: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Pairs of docs with token-set Jaccard ≥ threshold.

    Candidate pairs come from the shared inverted-index block
    (:func:`_pair_overlap`); the Jaccard is |∩| / (|A|+|B|−|∩|) from
    the shared-token count and per-doc set sizes.

    The stop-shingle cap is ON by default (``max_token_df`` =
    :data:`DEFAULT_MAX_TOKEN_DF`): without it one boilerplate shingle
    shared by d documents costs O(d²) in the pair join — the quadratic
    blowup a naive caller must not get from the defaults.  Capped
    tokens leave the index BEFORE sizes are counted, so both |∩| and
    the set sizes are consistently "rare-shingle" quantities.  Drop
    accounting: :func:`shingle_df_stats` reports, for the same
    (``shingle_k``, ``max_token_df``), how many distinct shingles and
    index postings the cap removes.  ``max_token_df=None`` opts out
    explicitly (exact-truth calibration — :func:`minhash_recall` —
    does; production corpora should not).
    """
    toks = _doc_token_sets(docs, id_col, text_col, max_token_df, shingle_k, hash_fn)
    out = (
        _pair_overlap(toks, id_col, _map_side_sizes(docs, id_col, text_col, max_token_df, shingle_k))
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("size1") + F.col("size2") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    return out.select("d1", "d2", "n_shared", "size1", "size2", "jaccard")


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Window-count bucket cap shared by the MinHash and SimHash
    pairing families: drop singleton and over-cap rows BEFORE any
    membership array materializes.  The window's shuffle partitions on
    the bucket keys and the following groupBy on the SAME keys reuses
    that exchange — the cap adds no extra shuffle (a count-aggregate +
    semi-join formulation is NOT exchange-reusable: partial aggregation
    changes the canonical child plan, and the signature pipeline would
    evaluate twice; verified via executedPlan).  ONE home for the
    formulation so the families cannot drift."""
    if max_bucket_size is None:
        return df
    from pyspark.sql import Window

    wincount = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    return (
        df.withColumn("__bsz", wincount)
        .filter((F.col("__bsz") > 1) & (F.col("__bsz") <= max_bucket_size))
        .drop("__bsz")
    )


def _bucket_pairs(buckets: DataFrame, members_col: str) -> DataFrame:
    """(i < j) pair enumeration over a sorted per-bucket membership
    array — the no-self-join combinatorics the MinHash and SimHash
    families share (a self-join would evaluate the whole signature
    pipeline twice and add a shuffle).  Returns columns ``a`` and ``b``
    with the original member payloads.

    Two CHAINED Generates (posexplode the members, then explode each
    position's tail slice) instead of one explode over a flattened
    nested-transform array: the flatten form materializes all C(n, 2)
    pair structs of a bucket as ONE in-memory array value before the
    explode — a 1,639-member bucket builds a 1.3M-struct array in a
    single allocation (measured 4.1s → 1.7s on the sf0.1 uncapped
    simhash pairing, and an OOM risk at corpus scale) — while the
    chained form keeps only the O(n) members array live per row and
    streams pairs through whole-stage codegen."""
    pos = buckets.select(
        F.col(members_col).alias("__ms"),
        F.posexplode(F.col(members_col)).alias("__i", "a"),
    )
    return pos.select(
        "a",
        F.explode(
            F.slice(F.col("__ms"), F.col("__i") + F.lit(2), F.size("__ms"))
        ).alias("b"),
    )


def _minhash_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    band_size: int,
    shingle_k: int | None,
    hash_fn: str = "md5",
    tag=None,
) -> DataFrame:
    """(id, band_idx, band_key) long form — the shared LSH front half of
    ``minhash_lsh_candidates`` and ``minhash_lsh_bucket_stats``.

    ``tag`` (round 12): an optional Column over the input rows (a pure
    function of ``id_col``, e.g. a batch parity) carried THROUGH the
    signature aggregate as ``min(tag) AS __tag``.  Consumers that split
    one corpus into branches (index vs probe) must filter on ``__tag``,
    never on a raw ``id_col`` predicate: a deterministic filter on the
    grouping key is pushed below the aggregate by Catalyst, which
    splits the branches into two full tokenize→digest lineages — while
    a filter on the aggregate OUTPUT stays above it, so both branches
    share one scan and one signature exchange (ReuseExchange).

    ``hash_fn="xxhash64"`` swaps the seeded md5 digests for seeded
    ``xxhash64`` calls (two 32-bit signature lanes per 64-bit hash, vs
    four per md5): no cryptographic rounds, no hex-string
    materialization, integer mins instead of substring mins — the
    production hash for corpora where signature CPU dominates.  The
    hash families are different, so signatures (and hence candidate
    pairs near the similarity threshold) differ between backends; both
    are valid MinHash estimators with the same collision theory."""
    _check_hash_fn(hash_fn)
    if num_hashes % band_size:
        # a ValueError, not an assert: asserts vanish under -O and the
        # truncated trailing hashes would silently change recall
        raise ValueError(
            f"band_size ({band_size}) must divide num_hashes "
            f"({num_hashes})"
        )
    # signature hashing is CPU-bound per row — make sure the scan isn't a
    # single small-file partition pinning the stage to one core
    docs = spread(docs).withColumn("__toks", tokens(text_col))
    # token array materialized first — see _doc_token_sets for why
    elems = (
        F.col("__toks")
        if not shingle_k
        else shingles(F.col("__toks"), shingle_k)
    )
    # Relational signature: explode the element set, compute the seeded
    # digests ONCE per (doc, element) row, then one min() per signature
    # position.  The array-expression form (functions.textan.
    # minhash_signature) re-evaluates the md5 transform per position —
    # higher-order lambdas get no common-subexpression elimination — so
    # this explode+agg form is ~num_hashes× cheaper, at the cost of one
    # narrow shuffle on the (uniform) doc id.
    # distinct elements only: min() is idempotent under repetition, so
    # hashing 'the' 500 times per document is pure wasted digest CPU —
    # array_distinct is map-side and free relative to the digests
    tag_in = [] if tag is None else [tag.alias("__tagin")]
    tag_keep = [] if tag is None else ["__tagin"]
    tag_agg = [] if tag is None else [F.min("__tagin").alias("__tag")]
    tag_out = [] if tag is None else ["__tag"]
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(elems)).alias("__tok"), *tag_in
    )
    if hash_fn == "xxhash64":
        # two independent 32-bit lanes per seeded 64-bit hash; integer
        # min-aggregation, no strings anywhere in the signature path
        n_xx = -(-num_hashes // 2)
        lanes: list = []
        for s in range(n_xx):
            h = F.xxhash64(F.lit(s), F.col("__tok"))
            lanes.append(F.shiftrightunsigned(h, 32).alias(f"__h{2 * s}"))
            lanes.append(
                h.bitwiseAND(F.lit(0xFFFFFFFF)).alias(f"__h{2 * s + 1}")
            )
        exploded = exploded.select(id_col, *lanes[:num_hashes], *tag_keep)
        sig = exploded.groupBy(id_col).agg(
            F.array(
                *[F.min(f"__h{i}") for i in range(num_hashes)]
            ).alias("sig"),
            *tag_agg,
        )
    else:
        n_md5 = -(-num_hashes // 4)
        # Aggregate the lanes as LONGS, not hex substrings: min(string)
        # has no fixed-width buffer, so Spark plans SortAggregate — two
        # extra sorts of the exploded (doc, element) rows.  Each lane is
        # a fixed-width lowercase-hex slice, where lexicographic order
        # equals numeric order, so min-as-long is min-as-string; the hex
        # string is rebuilt after the (Hash)aggregation, one row per doc.
        digests = exploded.select(
            id_col,
            *[
                F.md5(F.concat(F.lit(f"{s}:"), F.col("__tok"))).alias(f"__d{s}")
                for s in range(n_md5)
            ],
            *tag_keep,
        )
        lanes = digests.select(
            id_col,
            *[
                F.conv(
                    F.substring(F.col(f"__d{i // 4}"), 1 + 8 * (i % 4), 8), 16, 10
                )
                .cast("long")
                .alias(f"__h{i}")
                for i in range(num_hashes)
            ],
            *tag_keep,
        )
        sig = lanes.groupBy(id_col).agg(
            F.array(
                *[
                    F.lower(F.lpad(F.hex(F.min(f"__h{i}")), 8, "0"))
                    for i in range(num_hashes)
                ]
            ).alias("sig"),
            *tag_agg,
        )
    n_bands = num_hashes // band_size
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "|", *[F.col("sig").getItem(b * band_size + j) for j in range(band_size)]
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
        *tag_out,
    ).select(id_col, "band.band_idx", "band.band_key", *tag_out)


def minhash_lsh_bucket_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    band_size: int = 4,
    shingle_k: int | None = None,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-bucket accounting for the LSH cap: (band_idx, band_key,
    bucket_size, dropped) for every multi-member bucket.  ``dropped``
    marks buckets ``minhash_lsh_candidates`` would exclude under the
    same ``max_bucket_size`` — run this alongside a capped dedup job to
    log how much pairing signal the cap discards (the observability
    half of the hot-bucket cap; one count aggregation, no arrays)."""
    bands = _minhash_bands(
        docs, id_col, text_col, num_hashes, band_size, shingle_k, hash_fn
    )
    sizes = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > 1)
    )
    dropped = (
        F.lit(False)
        if max_bucket_size is None
        else (F.col("bucket_size") > max_bucket_size)
    )
    return sizes.select("band_idx", "band_key", "bucket_size", dropped.alias("dropped"))


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    band_size: int = 4,
    shingle_k: int | None = None,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash + LSH banding: candidate near-duplicate pairs.

    signature[i] = min over tokens of md5(i || ':' || token) (see
    functions.textan.minhash_signature); bands of ``band_size`` hashes
    are concatenated into a band key; docs sharing any (band_idx,
    band_key) become a candidate pair.  Returns distinct (d1 < d2) pairs
    with the number of matching bands.

    ``max_bucket_size`` caps the per-bucket pair blowup: buckets whose
    membership exceeds the cap are DROPPED from pair enumeration (the
    band-key analogue of ``max_token_df`` stop-shingle dropping).  At
    100 TB corpus scale, boilerplate-heavy text makes some band keys
    collide millions of documents; without the cap the per-bucket
    quadratic expansion is unbounded.  Dropping is semantically
    justified exactly like stop-shingles: a band key shared by a huge
    crowd carries no pairing information — such groups are better
    resolved by exact dedup upstream.  Use ``minhash_lsh_bucket_stats``
    (same parameters) to observe bucket-size distribution and how many
    buckets a given cap would drop.

    Docs with an empty element set are excluded (their signature would be
    all-NULL and would spuriously collide).
    """
    bands = _minhash_bands(
        docs, id_col, text_col, num_hashes, band_size, shingle_k, hash_fn
    )
    # Candidate pairs per bucket WITHOUT a self-join: a self-join would
    # evaluate the whole signature pipeline twice (no cross-branch plan
    # reuse) and add a shuffle.  Instead, group docs per (band_idx,
    # band_key) and enumerate the (i < j) pairs with array combinatorics
    # — one aggregation, signature computed once.  Bucket sizes are
    # small by LSH construction (that is the point of banding); a
    # pathological corpus (boilerplate band keys shared by huge crowds)
    # is bounded by ``max_bucket_size``.
    #
    # The cap is enforced BEFORE materializing the membership array
    # (shared _cap_buckets: window count on the band key, exchange
    # reused by the groupBy below — a hot bucket never builds its
    # possibly multi-million-element id array at all).
    bands = _cap_buckets(bands, ["band_idx", "band_key"], max_bucket_size)
    buckets = bands.groupBy("band_idx", "band_key").agg(
        F.sort_array(F.collect_set(id_col)).alias("ids")
    )
    return (
        _bucket_pairs(buckets.filter(F.size("ids") > 1), "ids")
        .select(F.col("a").alias("d1"), F.col("b").alias("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash signature per document as a bigint.

    Bit *b* of the signature is the sign of Σ_tokens (2·bit_b(md5(tok))−1).
    Implemented relationally: explode tokens → explode bit positions via
    hex-nibble arithmetic → per-(doc, bit) vote sum → recombine.  All
    built-ins; the same arithmetic is expressible in the SQL oracle.
    """
    _check_hash_fn(hash_fn)
    if bits != 64:
        raise ValueError("64-bit-hash-backed simhash supports up to 64 bits; use 64")
    toks = doc_tokens_long(spread(docs), id_col, text_col, distinct=True)
    # Wide-column evaluation: NO row fan-out — each (doc, token) row
    # yields 64 integer bit-votes summed in ONE groupBy(doc).
    #
    # md5 backend: the first 16 md5 hex chars convert into TWO 32-bit
    # integers (one conv each; 8 hex chars always fit a bigint, so the
    # cast never overflows under ANSI).  Signature bit b lives at hex
    # char p = b//4 + 1, position j = b%4 (big-endian within the
    # nibble), i.e. bit (8-p)*4 + 3-j of c1 for p ≤ 8 and bit
    # (16-p)*4 + 3-j of c2 otherwise — bit-identical to the earlier
    # one-conv-per-nibble form but ~2× cheaper through the extraction
    # (2 string convs per row instead of 16; measured md5+convs
    # 1.19s → 0.65s on the sf0.1 token set).
    #
    # xxhash64 backend (round 7): ONE 64-bit integer hash per token —
    # no hex strings, no conv; bit b is shiftright(h, b) & 1 directly.
    if hash_fn == "xxhash64":
        halves = toks.select(id_col, F.xxhash64("token").alias("c1"))
        bit_expr = {b: f"shiftright(c1, {b}) & 1" for b in range(bits)}
    else:
        halves = toks.select(id_col, F.md5(F.col("token")).alias("h")).select(
            id_col,
            F.expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)").alias("c1"),
            F.expr("cast(conv(substring(h, 9, 8), 16, 10) as bigint)").alias("c2"),
        )
        bit_expr = {}
        for b in range(bits):
            p, j = b // 4 + 1, b % 4
            src = "c1" if p <= 8 else "c2"
            shift = ((8 - p) * 4 if p <= 8 else (16 - p) * 4) + (3 - j)
            bit_expr[b] = f"shiftright({src}, {shift}) & 1"
    # branch-free votes: sum the raw bit per position plus one token
    # count; the ±1 vote sum is 2·set_bits − n, so "votes > 0" is
    # "2·s_b > n" — 64 unconditional integer sums beat 64 CASE
    # aggregates through the partial-agg hot loop
    vote_aggs = [F.count(F.lit(1)).alias("n")]
    for b in range(bits):
        vote_aggs.append(F.sum(F.expr(bit_expr[b])).alias(f"s{b}"))
    per_doc = halves.groupBy(id_col).agg(*vote_aggs)
    return per_doc.select(
        id_col,
        sum(
            F.when(
                F.col(f"s{b}") * 2 > F.col("n"),
                F.expr(f"shiftleft(cast(1 as bigint), {b})"),
            ).otherwise(F.lit(0).cast("bigint"))
            for b in range(bits)
        ).alias("simhash"),
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve duplicate-pair edges into clusters: every node gets the
    minimum reachable node id as its cluster label (the standard
    dedup-cluster step after candidate verification).

    Iterative min-label propagation with pointer jumping: each round a
    node's label becomes min(own, neighbours' labels), then labels are
    compressed one hop (label := label's label), so a diameter-D chain
    converges in O(log D) rounds instead of O(D).  The loop stops at
    fixpoint (no label changed).

    Every round ends in ``session.truncate_lineage`` — iterative
    plans MUST truncate lineage, otherwise each round's logical plan
    embeds the whole history and Catalyst analysis time grows
    exponentially (observed: 1s/round → 8s/round by round 6 on a
    12-node chain).  On a real cluster with unreliable executors set
    ``spark.res2df.checkpointDir`` to make each truncation a RELIABLE
    ``checkpoint()``; the plan shape (two key-partitioned shuffles per
    round) is unchanged.

    ``edges``: (d1, d2) undirected pairs; ``nodes``: one row per id
    (singletons label themselves).
    """
    bidir = truncate_lineage(
        edges.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .unionByName(edges.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
    )
    labels = truncate_lineage(
        nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    )
    for _ in range(max_iterations):
        nbr = (
            bidir.join(labels, bidir["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        # min over self + neighbours, carrying the previous label for
        # the fixpoint test
        mid = labels.join(nbr, labels["node"] == nbr["a"], "left").select(
            "node",
            F.col("label").alias("__old"),
            F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias(
                "__mid"
            ),
        )
        # pointer jumping: follow the label one hop (labels are node
        # ids, so the hop is a self-join node==label)
        parents = mid.select(F.col("node").alias("__p"), F.col("__mid").alias("__plabel"))
        new_labels = truncate_lineage(
            mid.join(parents, mid["__mid"] == parents["__p"], "left")
            .select(
                "node",
                F.least(F.col("__mid"), F.coalesce(F.col("__plabel"), F.col("__mid"))).alias(
                    "label"
                ),
                (F.col("__mid") < F.col("__old")).alias("__changed"),
            )
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def remove_repeated_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Intra-document repetition removal: drop exact repeats of a
    segment (line/paragraph/sentence — ``sep``-delimited), keeping the
    FIRST occurrence in order.  The standard pretraining-corpus cleanup
    for boilerplate that repeats inside one document (navigation rows,
    chorus lines, template footers) — cross-document dedup never sees
    it.

    Entirely map-only built-ins (split → array_distinct → array_join);
    ``array_distinct`` keeps first-occurrence order, which the oracle
    verifies against an explicit min-position formulation.  Documents
    with no non-empty segment are dropped (nothing to keep).  Returns
    (id, n_segments, n_unique, dedup_text).
    """
    import re as _re

    segs = F.filter(
        F.split(F.col(text_col), _re.escape(sep)), lambda x: x != F.lit("")
    )
    uniq = F.array_distinct(segs)
    return (
        docs.select(
            F.col(id_col),
            F.size(segs).cast("long").alias("n_segments"),
            F.size(uniq).cast("long").alias("n_unique"),
            F.array_join(uniq, sep).alias("dedup_text"),
        )
        .filter(F.col("n_segments") > 0)
    )


def minhash_band_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    band_size: int = 4,
    shingle_k: int | None = None,
) -> DataFrame:
    """Distinct (band_idx, band_key) set of a corpus — the persisted
    index an INCREMENTAL dedup checks new batches against (write it
    once per corpus snapshot, bucketed by band_key at 100 TB so the
    novelty join is co-located)."""
    return (
        _minhash_bands(docs, id_col, text_col, num_hashes, band_size, shingle_k)
        .select("band_idx", "band_key")
        .distinct()
    )


def minhash_novelty(
    new_docs: DataFrame,
    band_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    band_size: int = 4,
    shingle_k: int | None = None,
) -> DataFrame:
    """Incremental near-dup: score a NEW batch of documents against an
    existing corpus' :func:`minhash_band_index` without touching the
    corpus itself — the batch analogue of the streaming claim model
    (``streaming.ops.near_dedup_stream``): a new document whose every
    band already exists in the index is a near-dup candidate of
    something already ingested.

    Returns (id, bands_total, bands_hit, is_novel): ``is_novel`` means
    at least one band key was never seen.  Cost is one join of the new
    batch's bands against the index (equality on band key — bucketed
    index makes it co-located at scale) + one aggregation on the
    (uniform) new-doc id.  The corpus is never rescanned — THE property
    that makes daily-ingest dedup feasible at 100 TB.
    """
    bands = _minhash_bands(new_docs, id_col, text_col, num_hashes, band_size, shingle_k)
    return _novelty_score(new_docs.select(id_col), bands, band_index, id_col)


def _novelty_score(
    new_ids: DataFrame, bands: DataFrame, band_index: DataFrame, id_col: str
) -> DataFrame:
    """Score precomputed new-batch ``bands`` against ``band_index`` —
    the back half of :func:`minhash_novelty`, split out (round 12) so a
    caller holding bands for BOTH halves of one corpus (see
    ``_minhash_bands``'s ``tag``) can branch index/probe after the
    shared signature aggregate instead of running two full
    tokenize→digest lineages."""
    hits = band_index.select("band_idx", "band_key").withColumn("__hit", F.lit(1))
    scored = (
        bands.select(id_col, "band_idx", "band_key")
        .join(hits, ["band_idx", "band_key"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("bands_total"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("bands_hit"),
        )
    )
    # docs with no tokens produce no bands and would otherwise vanish
    # from the output entirely; emit them with a NULL verdict (the same
    # honest contract as the streaming twin near_dup_verdicts)
    return (
        new_ids
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("bands_total"), F.lit(0)).cast("long").alias("bands_total"),
            F.coalesce(F.col("bands_hit"), F.lit(0)).cast("long").alias("bands_hit"),
            F.when(
                F.col("bands_total").isNotNull(),
                F.col("bands_hit") < F.col("bands_total"),
            ).alias("is_novel"),
        )
    )


def _simhash_chunks(
    docs: DataFrame, id_col: str, text_col: str, max_hamming: int,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, simhash, chunk_idx, chunk_val) — the pigeonhole bucket keys
    shared by :func:`simhash_near_pairs` (pairing) and
    :func:`simhash_bucket_stats` (observability)."""
    bits = 64
    n_chunks = max_hamming + 1
    if max_hamming < 1 or bits % n_chunks:
        # max_hamming=0 passes the divisibility test but needs a
        # 64-bit all-ones mask that overflows the long literal — and
        # hamming-0 "near"-dup is exact dup; route those to exact_
        # duplicates instead
        raise ValueError(
            "max_hamming + 1 must divide 64 with max_hamming >= 1 "
            "(1, 3, 7, 15, 31 or 63 — above 15 the chunks are so short "
            "that buckets stop being selective); for hamming distance 0 "
            "use exact dedup"
        )
    cb = bits // n_chunks
    mask = (1 << cb) - 1
    sig = simhash_signatures(docs, id_col, text_col, hash_fn=hash_fn)
    return sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * cb)
                        .bitwiseAND(F.lit(mask))
                        .cast("long")
                        .alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk_val")


def simhash_bucket_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Pigeonhole chunk-bucket size distribution — the observability
    twin of :func:`minhash_lsh_bucket_stats` for the SimHash family:
    (chunk_idx, chunk_val, bucket_size, dropped) for every multi-member
    bucket, where ``dropped`` marks buckets :func:`simhash_near_pairs`
    would sacrifice under the same ``max_bucket_size``.  Run alongside
    a capped pairing job so the drop accounting is MEASURED, not
    assumed."""
    sizes = (
        _simhash_chunks(docs, id_col, text_col, max_hamming, hash_fn)
        .groupBy("chunk_idx", "chunk_val")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > 1)
    )
    dropped = (
        F.lit(False)
        if max_bucket_size is None
        else (F.col("bucket_size") > max_bucket_size)
    )
    return sizes.select(
        "chunk_idx", "chunk_val", "bucket_size", dropped.alias("dropped")
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-duplicate pairs: documents whose 64-bit signatures
    differ in ≤ ``max_hamming`` bits — the candidate-generation half
    that makes :func:`simhash_signatures` usable at corpus scale.

    Pigeonhole bucketing: the signature splits into ``max_hamming + 1``
    equal chunks; any pair within the Hamming budget must agree on at
    least one whole chunk, so candidates come from equality joins on
    (chunk_idx, chunk_value) — never an all-pairs comparison.  Exact
    Hamming distance (``bit_count(xor)``) then verifies each candidate.
    ``max_hamming + 1`` must divide 64 (budgets 1, 3, 7, 15, and the
    technically-valid 31/63, whose 2-/1-bit chunks are so unselective
    that buckets approach all-pairs — stay ≤ 15 in practice).

    Same bucket mechanics as the MinHash path: pair enumeration is
    per-bucket array combinatorics (no self-join — the signature
    aggregation is evaluated once), and ``max_bucket_size`` drops
    degenerate buckets (e.g. the all-zero chunk of near-empty docs)
    with the same window-count formulation that adds no exchange.
    Returns (d1, d2, hamming) with d1 < d2.
    """
    chunks = _simhash_chunks(docs, id_col, text_col, max_hamming, hash_fn)
    chunks = _cap_buckets(chunks, ["chunk_idx", "chunk_val"], max_bucket_size)
    buckets = chunks.groupBy("chunk_idx", "chunk_val").agg(
        F.sort_array(
            F.collect_set(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")))
        ).alias("ms")
    )
    hamming = F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s")))
    return (
        _bucket_pairs(buckets.filter(F.size("ms") > 1), "ms")
        .select(
            F.col("a.i").alias("d1"),
            F.col("b.i").alias("d2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("d1", "d2")
        .agg(F.min("hamming").cast("long").alias("hamming"))
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    max_gram_df: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cross-corpus duplicate-span accounting, the aggregate form of
    exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every k-token gram is
    hashed, grams occurring ``min_count``-or-more times ANYWHERE in the
    corpus are duplicate spans, and each document reports how much of it
    is covered by such spans.

    Returns (id, n_grams, n_dup_grams, dup_span_frac): ``n_dup_grams``
    counts the document's gram POSITIONS that participate in a
    corpus-wide duplicate (position-weighted, so a phrase repeated inside
    one document counts every occurrence), ``dup_span_frac`` is that over
    ``n_grams`` (0.0 for docs shorter than k).

    Scale shape: explode to (gram_hash, id) — one shuffle to count grams
    (partial-agg combines map-side; the key is a uniform md5 so the agg
    is balanced), one shuffle-join back on gram_hash (AQE skew-join
    splits hot grams — boilerplate at 100 TB), one final agg on the id.
    ``max_gram_df`` drops grams hotter than the cap from the JOIN (they
    still count toward ``n_grams``), the same stop-shingle bound as
    ``max_token_df`` above — with it, the join fan-in per gram is
    bounded and the whole pipeline is linear in corpus size.
    """
    _check_hash_fn(hash_fn)
    base = spread(docs).withColumn("__toks", tokens(F.col(text_col))).select(
        F.col(id_col), shingles(F.col("__toks"), k).alias("__sh")
    )
    # the HOF wrapper rejects *cols-variadic builtins as bare
    # callables - bind the backend through the shared helper
    def gram_h(x):
        return _hash_col(hash_fn, x)
    grams = base.select(
        F.col(id_col),
        F.size("__sh").alias("__n"),
        F.explode_outer(F.transform("__sh", gram_h)).alias("__g"),
    )
    # Corpus-wide gram count as a WINDOW over the gram hash instead of
    # a groupBy + join-back: the old two-branch form re-evaluated the
    # whole tokenize→shingle→digest pipeline (and its parquet scan)
    # once per branch — exchange reuse cannot merge them because column
    # pruning and the partial aggregation give each branch a different
    # canonical subtree (verified: the plan carried two Scan→Generate
    # subtrees).  The window needs ONE exchange on the md5-uniform gram
    # key and one pipeline pass; a boilerplate gram's rows count inside
    # one window task, the same bounded exposure the stop-shingle cap
    # window (_doc_token_sets) already accepts, and ``max_gram_df``
    # discards precisely those rows afterwards.  Short docs explode to
    # one NULL-gram row each; they key by their OWN id (the "\\0" tag
    # cannot collide with a hex digest / decimal hash) so a corpus of
    # mostly-short documents does not funnel into a single NULL
    # partition.
    from pyspark.sql import Window

    wkey = F.coalesce(
        F.col("__g").cast("string"),
        F.concat(F.lit("\0"), F.col(id_col).cast("string")),
    )
    cnt = F.count(F.col("__g")).over(Window.partitionBy(wkey))
    is_dup = F.col("__g").isNotNull() & (F.col("__c") >= min_count)
    if max_gram_df is not None:
        is_dup = is_dup & (F.col("__c") <= max_gram_df)
    hits = (
        grams.withColumn("__c", cnt)
        .groupBy(id_col)
        .agg(
            F.max("__n").cast("long").alias("n_grams"),
            F.coalesce(
                F.sum(F.when(is_dup, 1)), F.lit(0)
            ).cast("long").alias("n_dup_grams"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_dup_grams").cast("double") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return hits.select(
        id_col, "n_grams", "n_dup_grams", F.round(frac, 6).alias("dup_span_frac")
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_token_df: int | None = DEFAULT_MAX_TOKEN_DF,
    shingle_k: int | None = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle-set CONTAINMENT
    (Broder 1997): ``c1 = |A∩B| / |A|`` and ``c2 = |A∩B| / |B|`` —
    the measure Jaccard misses when a short document is wholly embedded
    in a long one (quote farms, wrapper boilerplate, page-of-pages).
    A 50-shingle doc inside a 5000-shingle doc has Jaccard ≤ 0.01 but
    containment 1.0; dedup pipelines drop or trim the CONTAINED side.

    Pairs where ``max(c1, c2) ≥ threshold``, from the same inverted-
    index candidate join as :func:`ngram_jaccard_pairs` (shared-token
    equality join — never all-pairs), with the same ``max_token_df``
    stop-shingle cap bounding hot-token fan-in at corpus scale — ON by
    default (:data:`DEFAULT_MAX_TOKEN_DF`; ``None`` opts out
    explicitly; drop accounting via :func:`shingle_df_stats`).
    Returns (d1, d2, n_shared, size1, size2, c1, c2) with d1 < d2.
    """
    toks = _doc_token_sets(docs, id_col, text_col, max_token_df, shingle_k, hash_fn)
    out = (
        _pair_overlap(toks, id_col, _map_side_sizes(docs, id_col, text_col, max_token_df, shingle_k))
        .withColumn("c1", F.col("n_shared") / F.col("size1"))
        .withColumn("c2", F.col("n_shared") / F.col("size2"))
        .filter(F.greatest(F.col("c1"), F.col("c2")) >= F.lit(threshold))
    )
    return out.select(
        "d1", "d2", "n_shared", "size1", "size2",
        F.round("c1", 6).alias("c1"), F.round("c2", 6).alias("c2"),
    )


def shingle_df_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_df: int | None = DEFAULT_MAX_TOKEN_DF,
    shingle_k: int | None = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Drop accounting for the inverted-index stop-shingle cap: ONE row
    describing what ``max_token_df`` removes from the index that
    :func:`ngram_jaccard_pairs` / :func:`containment_pairs` join on —
    (n_tokens, n_dropped_tokens, n_postings, n_dropped_postings,
    max_df).  Run it with the SAME (``shingle_k``, ``max_token_df``) as
    the pairing call: a capped production run should ship this row next
    to its output, the same observability contract as
    ``minhash_lsh_bucket_stats`` for the banding family.

    Scale shape: the per-token document frequency is one
    partial-aggregated groupBy on the (uniform) token key; the summary
    is a second full aggregate over the vocabulary-sized df table —
    never touches pairs.  ``max_token_df=None`` reports the uncapped
    index (all drop counts zero).
    """
    toks = _doc_token_sets(docs, id_col, text_col, None, shingle_k, hash_fn)
    df_tbl = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    hot = (
        F.col("__df") > F.lit(max_token_df)
        if max_token_df is not None
        else F.lit(False)
    )
    return df_tbl.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.when(hot, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_dropped_tokens"),
        F.coalesce(F.sum("__df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(F.sum(F.when(hot, F.col("__df")).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_dropped_postings"),
        F.max("__df").cast("long").alias("max_df"),
    )


def cross_doc_segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    max_df: int = 1,
    hash_fn: str = "md5",
) -> DataFrame:
    """CCNet-style cross-document line dedup (Wenzek et al. 2020 §3.1)
    generalized to unlined corpora: text splits into NON-overlapping
    ``window``-token segments (the "lines"), a segment is dropped from
    every document when it occurs in more than ``max_df`` DISTINCT
    documents, and the per-document survivor text is rebuilt in
    original order.  This removes shared headers/footers/boilerplate
    *surgically* while document-level dedup would keep or kill whole
    docs.

    Per doc: (n_segments, n_kept, kept_text).  A short tail segment
    (< window tokens) participates like any other.  Scale shape: one
    map-side segment explode, one md5 hash-aggregate for segment df
    (uniform 128-bit key), one join back on the hash, one per-doc
    ordered rebuild whose state is the document itself (bounded by doc
    length, never by corpus size).  Documents with no tokens — NULL,
    empty or whitespace-only text — have no segments and are excluded
    from the output (filter them beforehand if a verdict row per doc
    is needed, as :func:`minhash_novelty` does).

    ``hash_fn="xxhash64"`` keys the segment-df aggregate and join on a
    64-bit integer instead of an md5 hex string; df counts — hence
    keep/drop verdicts and the rebuilt text — are invariant under the
    injective map, so the output is identical up to collisions.
    """
    _check_hash_fn(hash_fn)
    # materialize the token array BEFORE the higher-order transform:
    # a lambda-captured expression is re-evaluated per array element
    # (the split would run n_segments times per row otherwise)
    base = spread(docs.filter(F.col(text_col).isNotNull())).withColumn(
        "__toks", tokens(text_col)
    )
    toks = F.col("__toks")
    n_seg = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    seg_idx = F.sequence(F.lit(0), F.greatest(n_seg - 1, F.lit(0)))
    segs = base.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(toks) > 0,
                F.transform(
                    seg_idx,
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i * window + 1, window)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("seg_idx", "seg"),
    ).withColumn("seg_h", _hash_col(hash_fn, "seg"))
    # Segment document-frequency as two WINDOW passes over ONE exchange
    # on the segment hash, instead of distinct → groupBy → join-back:
    # that form re-ran the segmentation Generate (posexplode + per-
    # segment digest) once per branch — the spread exchange was reused
    # but the Generate above it was not — and paid two aggregate
    # exchanges plus a broadcast.  Here the partition sorts by doc id,
    # a lag() flags each segment's FIRST row per doc, and an unbounded
    # sum of the flags is exactly count(DISTINCT doc) per segment.  One
    # pipeline pass, one md5/xx-uniform exchange; a boilerplate
    # segment's occurrences sort in one window task — the same bounded
    # exposure as the stop-shingle cap window, and those are precisely
    # the segments ``max_df`` then cuts.
    from pyspark.sql import Window

    wp = Window.partitionBy("seg_h")
    first_in_doc = F.when(
        F.lag(id_col).over(wp.orderBy(id_col)).isNull()
        | (F.lag(id_col).over(wp.orderBy(id_col)) != F.col(id_col)),
        1,
    ).otherwise(0)
    marked = (
        segs.withColumn("__new", first_in_doc)
        .withColumn("__df", F.sum("__new").over(wp))
        .withColumn("__keep", F.col("__df") <= F.lit(max_df))
    )
    rebuilt = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("seg_idx"), F.col("seg")),
                        )
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return rebuilt


def minhash_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int | None = 3,
    threshold: float = 0.7,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """The full production near-dup pipeline in one operator:
    MinHash-LSH candidate generation followed by EXACT shingle-Jaccard
    verification of only the candidate pairs — banding keeps recall,
    verification kills the false positives banding admits (the
    candidates→verify→threshold chain of Lee et al. 2022 /
    SlimPajama-class pipelines).

    Returns every candidate pair with its band count, exact Jaccard
    and the ``is_dup`` verdict (``jaccard ≥ threshold``); downstream,
    verified edges feed :func:`connected_components`.  A candidate
    pair sharing NO shingles (a pure minhash collision) is kept with
    jaccard 0 rather than silently dropped — the false-positive rate
    is observable from the output.

    Scale shape: the verification join touches only candidate pairs
    (∝ near-dup density, not C(n,2)); per-pair cost is the shared-token
    count via the inverted index restricted to candidate members —
    never array materialization.  The ``max_bucket_size`` cap bounds
    the candidate count itself under boilerplate band keys.
    """
    # the candidate table is MATERIALIZED once (localCheckpoint): its
    # two consumers (the shared-token count and the final left join)
    # prune different columns, so exchange reuse cannot deduplicate
    # them and the whole signature+banding pipeline would execute
    # twice; the checkpoint is pair-density-sized, not corpus-sized
    cand = minhash_lsh_candidates(
        docs,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
        hash_fn=hash_fn,
    ).localCheckpoint(eager=True)
    toks = _doc_token_sets(docs, id_col, text_col, None, shingle_k, hash_fn)
    # uncapped path: the per-doc set size is one map-side expression
    # over the packed distinct array — no explode, no exchange (the old
    # groupBy re-evaluated the whole tokenize→shingle pipeline a third
    # time just to count rows)
    sizes = _map_side_sizes(docs, id_col, text_col, None, shingle_k).select(
        id_col, F.col("set_size").alias("__sz")
    )
    t1 = toks.select(F.col(id_col).alias("d1"), "token")
    t2 = toks.select(F.col(id_col).alias("d2"), "token")
    shared = (
        cand.join(t1, "d1")
        .join(t2, ["d2", "token"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("__sz").alias("__sz1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("__sz").alias("__sz2"))
    jac = F.coalesce(F.col("__shared"), F.lit(0)) / (
        F.col("__sz1") + F.col("__sz2") - F.coalesce(F.col("__shared"), F.lit(0))
    )
    return (
        cand.join(shared, ["d1", "d2"], "left")
        .join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "n_bands",
            F.coalesce(F.col("__shared"), F.lit(0))
            .cast("long")
            .alias("n_shared"),
            F.round(jac, 6).alias("jaccard"),
            (jac >= F.lit(threshold)).alias("is_dup"),
        )
    )


def minhash_recall(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int | None = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Measured recall of MinHash-LSH candidate generation against the
    EXACT Jaccard truth — the quality gate for the banding parameters
    (the minhash analogue of similarity.recall_at_k for PQ): one row
    (n_true, n_caught, recall) where truth = pairs with shingle-set
    Jaccard ≥ ``threshold`` from the inverted-index join and caught =
    truth pairs that LSH banding also proposed.

    This is an OFFLINE calibration operator: the exact truth side costs
    the full inverted-index pair join, so it runs on a sample or a
    validation slice, never the production corpus — its output is the
    evidence that (num_hashes, band_size) meet the recall bar before a
    capped production run (:func:`minhash_verified_pairs`).

    Round 12, ATTEMPTED AND REJECTED (measured): sharing the identical
    distinct-shingle explode between the truth and LSH lanes through an
    explicit ``repartition("token")`` exchange does give one Generate
    lineage (plan verified: Generates 7→6, LSH lane on a
    ReusedExchange), but the shared exchange ships the full exploded
    corpus — raw shingle strings per (id, token) row — where the old
    LSH lane shuffled only partial-aggregated per-doc signature minima
    (one narrow row per doc per map partition) and the truth lane's
    postings exchange carries each token string once per (partition,
    token) inside collect_list partials.  Interleaved fresh-JVM A/B at
    sf0.1: shared 1.89/2.03/2.06 s vs two-lineage 1.38/1.46/1.82 s —
    more shuffle bytes to save one tokenize pass, the wrong side of
    guide §2.3 at any scale.  The two-lineage form stays.
    """
    truth = ngram_jaccard_pairs(
        docs,
        id_col,
        text_col,
        threshold=threshold,
        # calibration wants the EXACT truth: explicit cap opt-out (the
        # sample/validation-slice sizing above is what bounds this)
        max_token_df=None,
        shingle_k=shingle_k,
    ).select("d1", "d2")
    cand = (
        minhash_lsh_candidates(
            docs,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            band_size=band_size,
            shingle_k=shingle_k,
        )
        .select("d1", "d2", F.lit(1).alias("__hit"))
    )
    joined = truth.join(cand, ["d1", "d2"], "left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_caught"),
    ).select(
        "n_true",
        "n_caught",
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("n_caught") / F.col("n_true"), 6),
        ).alias("recall"),
    )
