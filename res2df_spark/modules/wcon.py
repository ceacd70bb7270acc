"""WCON* keywords → dated well-control table (SURVEY.md §2 W1 + R9).

The reference walks the deck as a state machine — DATES/START/TSTEP
advance a date cursor, every WCONHIST/WCONINJE/WCONINJH/WCONPROD record
is stamped with the cursor and tagged with its keyword
(/root/reference/src/res2df/wcon.py:26-64).  Here the cursor is the W1
ffill window over deck order and the four record streams are an R9
tagged ``unionByName(allowMissingColumns)`` — one window, no driver
loop, so a schedule with millions of control records distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from res2df_spark.modules.compdat import _with_dates
from res2df_spark.sources.deck import KEYWORD_ITEMS, deck_records, schedule_events

#: keywords this module extracts (wcon.py:22).
WCONKEYS = ["WCONHIST", "WCONINJE", "WCONINJH", "WCONPROD"]


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → (DATE, KEYWORD, WELL, STATUS, CMODE, rates…).

    Columns are the union of the four keyword schemas; a record carries
    NULL for items its keyword lacks (e.g. WCONPROD has no TYPE).
    """
    # ONE driver-side parse shared by the event frame and all four
    # keyword frames (each deck_records call would otherwise re-tokenize
    # the full deck text)
    from res2df_spark.sources.deck import parse_deck

    recs = parse_deck(deck_text)
    events = schedule_events(spark, deck_text, records=recs)
    frames = [
        deck_records(spark, deck_text, kw, records=recs) for kw in WCONKEYS
    ]
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f, allowMissingColumns=True)
    dated = _with_dates(u, events)

    value_cols: list[str] = []
    for kw in WCONKEYS:
        for name, _ in KEYWORD_ITEMS[kw]:
            if name not in value_cols:
                value_cols.append(name)
    return dated.select("DATE", "KEYWORD", *value_cols)
