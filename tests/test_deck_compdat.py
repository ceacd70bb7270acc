"""Deck parser (S1) + compdat pipeline (W1/W2/R1/R3/R4/J10) tests.

Deck strings are written fresh for this engine; semantics follow the
reference's documented behavior (see res2df_spark/modules/compdat.py
docstring for the file:line map)."""

from __future__ import annotations

from datetime import date

from res2df_spark.modules import compdat
from res2df_spark.sources.deck import deck_records, parse_deck, schedule_events
from tests.conftest import rows

BASIC_DECK = """
START
  1 JAN 2020 /

WELSPECS
  'OP1' 'G1' 3 4 1000.0 'OIL' /
/

COMPDAT
  'OP1' 1 1 1 3 'OPEN' 1* 100.5 /
/

DATES
  1 FEB 2020 /
/

COMPDAT
  'OP1' 2 2 1 1 'SHUT' /
/
"""


def test_parse_deck_basic():
    recs = parse_deck(BASIC_DECK)
    kws = [r["KEYWORD"] for r in recs]
    assert kws == ["START", "WELSPECS", "COMPDAT", "DATES", "COMPDAT"]
    assert recs[0]["DATE"] == date(2020, 1, 1)
    c = recs[2]
    assert c["WELL"] == "OP1" and c["K1"] == 1 and c["K2"] == 3
    assert c["SATN"] is None  # 1* default
    assert c["TRAN"] == 100.5


def test_parse_tstep_and_repeats():
    deck = """
START
  1 JAN 2020 /
TSTEP
  10 2*5 /
"""
    recs = parse_deck(deck)
    assert recs[-1]["DATE"] == date(2020, 1, 21)  # 10 + 5 + 5 days


def test_parse_month_alias():
    recs = parse_deck("START\n 1 'JLY' 2020 /\n")
    assert recs[0]["DATE"] == date(2020, 7, 1)


def test_deck_records_schema(spark):
    df = deck_records(spark, BASIC_DECK, "COMPDAT")
    assert df.count() == 2
    assert "K1" in df.columns and "OP/SH" in df.columns


def test_compdat_dates_and_unroll(spark):
    out = compdat.df(spark, BASIC_DECK)
    got = rows(out, "WELL", "I", "J", "K", "OP_SH", "DATE")
    assert got == [
        ("OP1", 1, 1, 1, "OPEN", date(2020, 1, 1)),
        ("OP1", 1, 1, 2, "OPEN", date(2020, 1, 1)),
        ("OP1", 1, 1, 3, "OPEN", date(2020, 1, 1)),
        ("OP1", 2, 2, 1, "SHUT", date(2020, 2, 1)),
    ]


def test_compdat_welspecs_default_fill(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 7 8 1000.0 'OIL' /
/
COMPDAT
  'OP1' 2* 1 1 'OPEN' /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out, "WELL", "I", "J", "K")
    assert got == [("OP1", 7, 8, 1)]  # defaulted I/J from WELSPECS head


def test_welopen_shut_all(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 2 'OPEN' /
/
DATES
  1 MAR 2020 /
/
WELOPEN
  'OP1' 'SHUT' /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out, "WELL", "K", "OP_SH", "DATE")
    assert got == [
        ("OP1", 1, "OPEN", date(2020, 1, 1)),
        ("OP1", 1, "SHUT", date(2020, 3, 1)),
        ("OP1", 2, "OPEN", date(2020, 1, 1)),
        ("OP1", 2, "SHUT", date(2020, 3, 1)),
    ]


def test_welopen_specific_connection(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 2 'OPEN' /
/
DATES
  1 MAR 2020 /
/
WELOPEN
  'OP1' 'SHUT' 1 1 2 /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out, "K", "OP_SH", "DATE")
    # only K=2 shut; K=1 untouched
    assert got == [
        (1, "OPEN", date(2020, 1, 1)),
        (2, "OPEN", date(2020, 1, 1)),
        (2, "SHUT", date(2020, 3, 1)),
    ]


def test_welopen_wildcard_and_stop(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
  'OP2' 'G1' 2 2 1000.0 'OIL' /
  'WI1' 'G1' 3 3 1000.0 'WAT' /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
  'OP2' 2 2 1 1 'OPEN' /
  'WI1' 3 3 1 1 'OPEN' /
/
DATES
  1 JUN 2020 /
/
WELOPEN
  'OP*' 'STOP' /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out.filter("DATE = DATE'2020-06-01'"), "WELL", "OP_SH")
    # STOP maps to SHUT at connection level; wildcard hits OP1/OP2 only
    assert got == [("OP1", "SHUT"), ("OP2", "SHUT")]


def test_welopen_reopen_sequence(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
DATES
  1 FEB 2020 /
/
WELOPEN
  'OP1' 'SHUT' /
/
DATES
  1 MAR 2020 /
/
WELOPEN
  'OP1' 'OPEN' /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out, "OP_SH", "DATE")
    assert got == [
        ("OPEN", date(2020, 1, 1)),
        ("OPEN", date(2020, 3, 1)),
        ("SHUT", date(2020, 2, 1)),
    ]


def test_welopen_defaulted_k_only(spark):
    # R4: I/J defaulted (0), K set → matches that K on every column
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 2 'OPEN' /
  'OP1' 2 2 1 1 'OPEN' /
/
DATES
  1 MAY 2020 /
/
WELOPEN
  'OP1' 'SHUT' 0 0 1 /
/
"""
    out = compdat.df(spark, deck)
    shut = rows(out.filter("OP_SH = 'SHUT'"), "I", "J", "K")
    # both K=1 connections shut (at I=1 and I=2); K=2 untouched
    assert shut == [(1, 1, 1), (2, 2, 1)]


def test_welopen_before_any_compdat_is_noop(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
WELOPEN
  'OP1' 'SHUT' /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
"""
    out = compdat.df(spark, deck)
    # the action precedes every connection (KEYWORD_IDX) → matches none
    assert rows(out, "OP_SH") == [("OPEN",)]


def test_multiple_wells_same_deck(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
  'OP2' 'G1' 2 2 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
  'OP2' 2 2 5 6 'SHUT' /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out, "WELL", "K", "OP_SH")
    assert got == [("OP1", 1, "OPEN"), ("OP2", 5, "SHUT"), ("OP2", 6, "SHUT")]
