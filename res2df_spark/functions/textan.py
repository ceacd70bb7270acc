"""Text-analysis primitives for the LLM-data-pipeline operators
(BASELINE.json north star): tokenization, shingling, hashing.

Everything is built-in-function composition (codegen'd, no Python UDF):
the hash family is md5-based so the DuckDB oracle can reproduce results
bit-for-bit (Spark's ``hash``/``xxhash64`` have no DuckDB equivalent).
md5-hex strings of fixed length compare lexicographically exactly like
the underlying 128-bit integers, so ``min(md5(...))`` is a valid uniform
min-hash without any integer conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization → array<string>.  Empty/blank text yields
    an empty array (``split('')`` would yield ``['']``; filtered)."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    arr = F.split(F.trim(c), r"\s+")
    return F.filter(arr, lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


#: GPT-2-style pretokenizer shape: contractions, letter runs, digit
#: runs, punctuation runs, whitespace-attached words.  A regex
#: approximation of BPE pretokenization — the token COUNT tracks real
#: BPE token counts closely enough for data curation budgeting.
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+"


def bpe_ish_tokens(text: Column | str, lowercase: bool = True) -> Column:
    """BPE-ish regex tokenization → array<string> (north-star token
    counting).  regexp_extract_all is codegen'd JVM-side — no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.regexp_extract_all(c, F.lit(_BPE_ISH), 0)


def shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a token array → array<string> (joined by a
    single space).  Uses a transform over indices — partition-local."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(-1)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array()
    )


#: hex chars per derived hash: 8 hex = 32 bits — ample for min-hashing
#: (collision odds over ~1e6 set elements are negligible), and 4 hashes
#: come out of every md5 digest.
_CHUNK = 8
_CHUNKS_PER_MD5 = 32 // _CHUNK


def minhash_signature(toks: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<string> of length ``num_hashes``:
    element *i* = min over tokens of an 8-hex-char slice of a seeded md5,
    ``substr(md5((i div 4) || ':' || token), 1 + 8*(i mod 4), 8)``.

    Each md5 digest yields four independent 32-bit hash values, so a
    16-hash signature costs 4 digests per token instead of 16.  Fixed-
    width hex slices compare lexicographically exactly like the
    underlying integers, and the same expression is ANSI SQL so the
    DuckDB oracle matches bit-for-bit.
    """
    n_md5 = -(-num_hashes // _CHUNKS_PER_MD5)

    # HOF lambdas get no common-subexpression elimination: embedding the
    # digest transform inside num_hashes array_min expressions (the old
    # form) re-ran every md5 once per signature position (~num_hashes×
    # the necessary hashing — the measured HOF-recapture pitfall).  Two
    # tricks keep each md5 to exactly ONE evaluation per token:
    #   1. the concatenated digest is LET-BOUND via a one-element
    #      transform — a lambda argument is materialized per element,
    #      so the substrings below read the bound value;
    #   2. the per-position min is a single aggregate fold with a
    #      zip_with(least) combiner — one pass over the token array.
    def per_token(t: Column) -> Column:
        h = F.concat(*[F.md5(F.concat(F.lit(f"{s}:"), t)) for s in range(n_md5)])
        return F.element_at(
            F.transform(
                F.array(h),
                lambda hh: F.array(
                    *[
                        F.substring(hh, 1 + _CHUNK * i, _CHUNK)
                        for i in range(num_hashes)
                    ]
                ),
            ),
            1,
        )

    vectors = F.transform(toks, per_token)
    init = F.array_repeat(F.lit(None).cast("string"), num_hashes)
    # least(NULL, x) = x, so the NULL-filled init is the identity and an
    # empty token array yields all-NULL — same as the old array_min form
    return F.aggregate(
        vectors,
        init,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: F.least(a, b)),
    )


def doc_tokens_long(df: DataFrame, id_col: str, text_col: str, distinct: bool = True) -> DataFrame:
    """Explode documents to (id, token) long form — the substrate for
    set-similarity joins.  Distinct per doc by default (set semantics).

    The distinct is ``array_distinct`` BEFORE the explode — a document's
    tokens all live in its one input row, so per-doc set semantics needs
    no cross-row work: the old ``.distinct()`` after the explode paid a
    full (id, token) hash-aggregate EXCHANGE for a dedup the row already
    contains (and left downstream per-doc aggregations partial-agg-
    hostile: post-shuffle, every doc's tokens were scattered across all
    partitions).  Contract: ``id_col`` identifies one row per document —
    callers feeding duplicate ids would previously get cross-row set
    union and now get per-row sets (every caller in this package reads a
    unique-keyed documents table)."""
    if distinct:
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        )
    return df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))


def normalize_text(text: Column | str) -> Column:
    """Corpus text normalization (the pre-tokenization cleanup step):
    lowercase, control characters and zero-width/BOM marks stripped,
    all whitespace runs collapsed to single spaces, ends trimmed.
    Pure built-in regexp chain — map-only, engine-portable patterns
    (the character classes below mean the same thing to Java regex and
    RE2, so an external engine reproduces the output exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    # control chars (C0 + DEL) and zero-width marks/BOM
    c = F.regexp_replace(c, "[\\x00-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def dup_shingle_fraction(toks: Column, k: int = 3) -> Column:
    """Gopher-style duplicate n-gram fraction: the share of a document's
    k-word shingles that are repeats of an earlier shingle in the SAME
    document — ``(n - n_distinct) / n``, 0.0 for docs shorter than k.

    Pure array expressions (``array_distinct`` inside codegen): map-only,
    zero shuffles at any corpus size — the within-document counterpart
    of the cross-corpus dedup family in llm/dedup.py.
    """
    sh = shingles(toks, k)
    n = F.size(sh)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(sh))).cast("double") / n
    ).otherwise(F.lit(0.0))


def top_shingle_fraction(toks: Column, k: int = 2) -> Column:
    """Gopher-style top n-gram fraction: the multiplicity of the MOST
    frequent k-word shingle divided by the shingle count (how much of
    the document one repeated phrase covers), 0.0 for docs shorter
    than k.

    Computed map-side without any per-doc groupBy: sort the shingle
    array, then a single ``aggregate`` pass tracks the longest run of
    equal neighbours (struct state: previous value, current run, best
    run).  O(n log n) per document inside the executor, zero shuffles.
    """
    sh = F.array_sort(shingles(toks, k))
    n = F.size(sh)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(sh, init, step, lambda acc: acc["best"])
    return F.when(n > 0, best.cast("double") / n).otherwise(F.lit(0.0))


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    dup_k: int = 3,
    top_k: int = 2,
    dup_name: str = "dup_frac",
    top_name: str = "top_frac",
) -> DataFrame:
    """DataFrame-level repetition stats: adds the duplicate-``dup_k``-gram
    fraction and top-``top_k``-gram coverage columns.

    Why a df-transform and not a Column like :func:`top_shingle_fraction`:
    HOF lambdas RE-EVALUATE captured expressions per element access, so
    any multi-pass formulation must read BOUND COLUMN references — which
    requires materializing the sorted shingle array in its own
    projection first.  With that in place, the longest-equal-run scan is
    a boundary filter + ``zip_with`` over small integer arrays, ~20×
    cheaper per row than the struct-state fold (no per-element struct
    allocation).  Still map-only: two stacked projections, zero
    shuffles.
    """
    # bind the token array BEFORE it is captured by the shingle
    # lambdas — the raw tokens() expression would re-tokenize per
    # element access (the plan embedded 15 copies of the split chain
    # before this bind)
    step0 = df.withColumn("__toks", tokens(F.col(text_col)))
    toks = F.col("__toks")
    step1 = step0.withColumn(dup_name, dup_shingle_fraction(toks, dup_k)).withColumn(
        "__sh_sorted", F.array_sort(shingles(toks, top_k))
    )
    sh = F.col("__sh_sorted")
    n = F.size(sh)
    # guard n == 0: sequence(1, 0) DESCENDS in Spark and would index 0
    starts = F.when(
        n >= 1,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(sh, i) != F.element_at(sh, i - 1)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    step2 = step1.withColumn("__n", n).withColumn("__starts", starts)
    st = F.col("__starts")
    nxt = F.concat(F.slice(st, 2, F.size(st)), F.array(F.col("__n") + 1))
    best = F.array_max(F.zip_with(st, nxt, lambda a, b: b - a))
    top = F.when(
        F.col("__n") > 0, best.cast("double") / F.col("__n")
    ).otherwise(F.lit(0.0))
    return step2.withColumn(top_name, top).drop(
        "__toks", "__sh_sorted", "__n", "__starts"
    )
