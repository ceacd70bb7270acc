"""FAULTS keyword → per-cell fault table (SURVEY.md §2 R2 box explode).

The reference unrolls each FAULTS record's (IX1–IX2, IY1–IY2, IZ1–IZ2)
index box into one row per (I, J, K) with an itertools.product loop on
the driver (/root/reference/src/res2df/faults.py:40-60).  Here the box
explode is the R2 operator — nested ``explode(sequence(...))`` inside
one codegen stage, partition-local, no shuffle — so a deck with many
large fault boxes fans out on the executors, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from res2df_spark.operators.reshape import box_explode
from res2df_spark.sources.deck import deck_records

#: face values the reference accepts (faults.py:25).
ALLOWED_FACES = [
    "X", "Y", "Z", "I", "J", "K", "X-", "Y-", "Z-", "I-", "J-", "K-",
]

COLUMNS = ["NAME", "I", "J", "K", "FACE"]


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → one row per fault cell: (NAME, I, J, K, FACE).

    FAULTS may appear any number of times in the deck; all instances
    are concatenated (the record stream already is the concatenation).
    """
    recs = deck_records(spark, deck_text, "FAULTS")
    # inverted index boxes contribute ZERO cells in the reference
    # (faults.py:52-57 builds range(X1, X2+1) — empty when X2 < X1);
    # box_explode deliberately raises on inverted bounds (a grid-box
    # user error), so filter the empty-range records out first
    recs = recs.filter(
        (F.col("IX2") >= F.col("IX1"))
        & (F.col("IY2") >= F.col("IY1"))
        & (F.col("IZ2") >= F.col("IZ1"))
    )
    cells = box_explode(
        recs,
        {"I": ("IX1", "IX2"), "J": ("IY1", "IY2"), "K": ("IZ1", "IZ2")},
    )
    return cells.select(
        "NAME", "I", "J", "K", F.upper(F.col("FACE")).alias("FACE")
    )
