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


def shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a token array → array<string> (joined by a
    single space).  Uses a transform over indices — partition-local."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(-1)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array()
    )


def minhash_signature(toks: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<string> of length ``num_hashes``:
    element *i* = min over tokens of ``md5(i || ':' || token)``.

    Seeded-md5 min-hashing: each seed acts as an independent uniform hash
    of the token set; identical definition is expressible in ANSI SQL so
    the DuckDB oracle matches exactly.
    """
    return F.array(
        *[
            F.array_min(F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{i}:"), t))))
            for i in range(num_hashes)
        ]
    )


def doc_tokens_long(df: DataFrame, id_col: str, text_col: str, distinct: bool = True) -> DataFrame:
    """Explode documents to (id, token) long form — the substrate for
    set-similarity joins.  Distinct per doc by default (set semantics)."""
    out = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return out.distinct() if distinct else out
