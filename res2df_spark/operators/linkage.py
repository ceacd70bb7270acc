"""Record linkage / entity resolution: blocked fuzzy matching.

The classic data-cleaning operator the LLM-corpus dedup family doesn't
cover: STRUCTURED records that refer to the same entity with slightly
different spellings.  All-pairs edit distance is O(n²); production
linkage bounds it with BLOCKING — only records sharing a (cheap,
high-recall) blocking key are compared.  Same shape as the LSH band
trick for documents: the quadratic work is confined to within-block
pairs, and a block-size cap handles degenerate keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_edit_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate duplicate pairs: records sharing every ``block_cols``
    value whose ``name_col`` Levenshtein distance is at most
    ``max_edit_distance``.  Returns (id1, id2, name1, name2, edit_dist)
    with id1 < id2 (each unordered pair once).

    Plan: a self equi-join on the blocking key (one shuffle per side;
    AQE splits skewed blocks), edit distance evaluated map-side on the
    joined rows.  ``max_block_size`` drops over-cap blocks BEFORE the
    join via a window count that reuses the block shuffle — the same
    guard as the LSH ``max_bucket_size``, because a degenerate blocking
    value shared by many records otherwise yields a quadratic block.

    NULL-block contract: a record with NULL in ANY blocking column can
    never equi-join, so such records are dropped up front — explicitly,
    not as a join side effect, and before the cap window (they would
    otherwise pool into one giant NULL partition that serves only to
    trip the cap).  Callers wanting NULL-tolerant blocking should
    coalesce to a sentinel in ``block_cols`` expressions first.
    """
    blocks = [F.col(c) for c in block_cols]
    side = df.select(
        F.col(id_col), F.col(name_col), *blocks
    )
    for c in block_cols:
        side = side.filter(F.col(c).isNotNull())
    if max_block_size is not None:
        w = Window.partitionBy(*block_cols)
        side = (
            side.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsz") <= max_block_size)
            .drop("__bsz")
        )
    a = side.select(
        F.col(id_col).alias("id1"), F.col(name_col).alias("name1"), *blocks
    )
    b = side.select(
        F.col(id_col).alias("id2"), F.col(name_col).alias("name2"), *blocks
    )
    # the threshold form early-exits the DP once the distance is proven
    # above the bound — per-pair cost O(k·min(|a|,|b|)) instead of
    # O(|a|·|b|); pairs above the bound return -1
    dist = F.levenshtein(F.col("name1"), F.col("name2"), max_edit_distance)
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", dist.cast("long"))
        .filter(
            (F.col("edit_dist") >= 0)
            & (F.col("edit_dist") <= max_edit_distance)
        )
        .select("id1", "id2", "name1", "name2", "edit_dist")
    )
