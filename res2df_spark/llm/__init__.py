"""LLM-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal plumbing — first-class
engine components designed for 100 TB corpora."""

from res2df_spark.llm.dedup import (  # noqa: F401
    exact_duplicates,
    ngram_jaccard_pairs,
    minhash_lsh_candidates,
    shingle_df_stats,
    simhash_signatures,
)
from res2df_spark.llm.similarity import (  # noqa: F401
    brute_force_topk,
    lsh_bucketed_topk,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    pq_train,
    rrf_fuse,
)
from res2df_spark.llm.lm import lm_quality_score, train_char_lm  # noqa: F401
from res2df_spark.llm.weights import (  # noqa: F401
    dsir_weights,
    nb_quality_score,
    soft_dedup_weights,
)
