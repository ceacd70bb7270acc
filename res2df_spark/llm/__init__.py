"""LLM-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal plumbing — first-class
engine components designed for 100 TB corpora."""

from res2df_spark.llm.dedup import (  # noqa: F401
    exact_duplicates,
    ngram_jaccard_pairs,
    minhash_lsh_candidates,
    simhash_signatures,
)
from res2df_spark.llm.similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
