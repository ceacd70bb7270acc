"""WCON* keywords → dated well-control table (SURVEY.md §2 W1 + R9).

The reference walks the deck as a state machine — DATES/START/TSTEP
advance a date cursor, every WCONHIST/WCONINJE/WCONINJH/WCONPROD record
is stamped with the cursor and tagged with its keyword
(/root/reference/src/res2df/wcon.py:26-64).  Here the cursor is the
parse-layer ``fill_dates`` pass (deck text is driver-bounded by
nature, so the stamping is free at parse time — the same route every
other deck module takes) and the four record streams are an R9 tagged
``unionByName(allowMissingColumns)``.  The previous formulation ran
the cursor as a Spark ffill under an UNPARTITIONED window — a
single-task sort of the whole record union that contradicted the
module's own scalability claim; the distributed W1 ffill remains the
path for genuinely distributed logs (PRT, summary), exercised by
``w1_ffill_cursor``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from res2df_spark.sources.deck import (
    KEYWORD_ITEMS,
    deck_records,
    fill_dates,
    parse_deck,
)

#: keywords this module extracts (wcon.py:22).
WCONKEYS = ["WCONHIST", "WCONINJE", "WCONINJH", "WCONPROD"]


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → (DATE, KEYWORD, WELL, STATUS, CMODE, rates…).

    Columns are the union of the four keyword schemas; a record carries
    NULL for items its keyword lacks (e.g. WCONPROD has no TYPE).
    """
    # ONE driver-side parse, dated at the parse layer, shared by all
    # four keyword frames (each deck_records call would otherwise
    # re-tokenize the full deck text)
    recs = fill_dates(parse_deck(deck_text))
    frames = [
        deck_records(spark, deck_text, kw, records=recs) for kw in WCONKEYS
    ]
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f, allowMissingColumns=True)

    value_cols: list[str] = []
    for kw in WCONKEYS:
        for name, _ in KEYWORD_ITEMS[kw]:
            if name not in value_cols:
                value_cols.append(name)
    return u.select("DATE", "KEYWORD", *value_cols)
