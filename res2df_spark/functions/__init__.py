"""Scalar function families (SURVEY.md §2.8) — built-in-function
compositions only; everything here stays inside whole-stage codegen."""

from res2df_spark.functions.strings import well_template_to_regex, pair_key  # noqa: F401
from res2df_spark.functions.textan import (  # noqa: F401
    tokens,
    token_count,
    shingles,
    minhash_signature,
)
from res2df_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
