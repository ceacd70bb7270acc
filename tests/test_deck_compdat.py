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
    # 1* takes the opm schema default (SAT_TABLE 0, opmkeywords/COMPDAT),
    # matching the reference's parse_opmio_deckrecord behavior
    assert c["SATN"] == 0
    assert c["KH"] == -1.0 and c["SKIN"] == 0.0  # Kh/SKIN schema defaults
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
    # STOP on the WHOLE well (no coords) closes the well but keeps the
    # connections OPEN (reference compdat.py:904-910, test case
    # welopen-stop-on-well); wildcard hits OP1/OP2 only
    assert got == [("OP1", "OPEN"), ("OP2", "OPEN")]


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


def test_welopen_before_any_compdat_raises(spark):
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
    # the action precedes every connection (KEYWORD_IDX) → matches none;
    # the reference raises for this (compdat.py:891 "not acting on any
    # existing connection") rather than silently no-opping
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not acting on any existing"):
        compdat.df(spark, deck)


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


# ---------------------------------------------------------------------------
# Segment keywords (WELSEGS/COMPSEGS/WSEG*) — cases modeled on the
# reference's tests/test_compdat.py::test_str2df / test_unrollwelsegs.
# ---------------------------------------------------------------------------

SEGMENT_DECK = """
WELSPECS
 'OP1' 'OPWEST' 41 125 1759.74 'OIL' /
/

COMPDAT
 'OP1' 33 110 31 31 'OPEN' 0 6467.31299 0.216 506642.25  0.0 0.0 'Y' /
/

WELSEGS
  'OP1' 1689 1923 1.0E-5 'ABS' 'HFA' 'HO' / comment without -- identifier
-- foo bar
   2 2 1 1 1923.9 1689.000 0.1172 0.000015  /
/

COMPSEGS
  'OP1' / -- Yet a comment
  -- comment
  41 125 29  5 2577.0 2616.298 / icd on branch 1 in segment 17
/

WSEGVALV
  'OP1'   166   1   7.4294683E-06  0 / icd on segment 17, cell 41 125 29
/
"""


def test_welsegs_header_and_abs_md(spark):
    ws = compdat.welsegs_df(spark, SEGMENT_DECK)
    r = ws.collect()
    assert len(r) == 1  # header record merged, not emitted
    row = r[0]
    assert row["WELL"] == "OP1"
    assert row["DEPTH"] == 1689.0
    assert row["INFO_TYPE"] == "ABS"
    # ABS info type adds SEGMENT_MD = SEGMENT_LENGTH
    assert row["SEGMENT_MD"] == 1923.9
    assert row["SEGMENT1"] == 2 and row["SEGMENT2"] == 2


def test_welsegs_unroll(spark):
    deck = """
WELSEGS
  'OP1' 1689 1923 1.0E-5 'ABS' 'HFA' 'HO' /
   2 3 1 1 1923.9 1689.000 0.1172 0.000015  /
/
"""
    df = compdat.welsegs_df(spark, deck)
    got = sorted(r["SEGMENT1"] for r in df.collect())
    assert got == [2, 3]
    assert all(r["SEGMENT1"] == r["SEGMENT2"] for r in df.collect())
    assert compdat.welsegs_df(spark, deck, unroll=False).count() == 1


def test_compsegs_header_well(spark):
    cs = compdat.compsegs_df(spark, SEGMENT_DECK)
    r = cs.collect()
    assert len(r) == 1
    assert r[0]["WELL"] == "OP1"
    assert r[0]["I"] == 41 and r[0]["J"] == 125 and r[0]["K"] == 29
    assert r[0]["BRANCH"] == 5
    assert r[0]["DISTANCE_START"] == 2577.0


def test_wsegvalv_and_defaults(spark):
    v = compdat.wsegvalv_df(spark, SEGMENT_DECK)
    r = v.collect()
    assert len(r) == 1
    assert r[0]["WELL"] == "OP1"
    assert r[0]["SEGMENT_NUMBER"] == 166
    assert r[0]["CV"] == 1.0
    assert r[0]["AREA"] == 7.4294683e-06
    assert r[0]["STATUS"] == "OPEN"  # schema default applied


def test_wsegsicd_defaults_and_unroll(spark):
    deck = """
DATES
  1 MAY 2001 /
/
WSEGSICD
  'OP1' 5 7 0.001 /
/
"""
    d = compdat.wsegsicd_df(spark, deck)
    r = sorted(d.collect(), key=lambda x: x["SEGMENT1"])
    assert [x["SEGMENT1"] for x in r] == [5, 6, 7]
    assert all(x["LENGTH"] == 12.0 for x in r)       # opm default
    assert all(x["DENSITY_CALI"] == 1000.25 for x in r)
    assert all(x["STATUS"] == "OPEN" for x in r)
    assert all(str(x["DATE"]) == "2001-05-01" for x in r)


def test_icd_chain_from_deck(spark):
    deck = """
WELSEGS
  'OP1' 1689 1923 1.0E-5 'ABS' 'HFA' 'HO' /
   17 17 1 1 2600.0 1689.0 0.1172 0.000015  /
/
COMPSEGS
  'OP1' /
  41 125 29  1 2577.0 2616.298 4* 17 /
/
WSEGVALV
  'OP1' 17 0.85 7.43e-06 /
/
"""
    chain = compdat.icd_chain(spark, deck)
    r = chain.collect()
    assert len(r) == 1
    row = r[0]
    assert row["WELL"] == "OP1" and row["SEGMENT_NUMBER"] == 17
    assert row["SEGMENT_MD"] == 2600.0       # joined from WELSEGS
    assert row["VALVE_CV"] == 0.85           # joined from WSEGVALV
    assert row["ICD_STRENGTH"] is None       # no WSEGSICD in deck


def test_vfp_block_stops_at_next_keyword(spark):
    """A non-VFP keyword following a VFP table must not be swallowed
    into the value records (ADVICE r1)."""
    from res2df_spark.modules import vfp

    deck = """
VFPINJ
  1 3000.0 'WAT' 'THP' 'METRIC' 'BHP' /
  100 200 /
  10 20 /
  1 2000 2100 /
  2 2200 2300 /

WELSPECS
  'OP1' 'G1' 3 4 1000.0 'OIL' /
/
"""
    df = vfp.df_inj(spark, deck)
    assert df.count() == 4  # 2 THP × 2 rates — WELSPECS not consumed
    recs = deck_records(spark, deck, "WELSPECS")
    assert recs.count() == 1


# ---------------------------------------------------------------------------
# Ported reference WELOPEN cases (tests/test_welopen.py ids in comments)
# ---------------------------------------------------------------------------


def _welopen_case(spark, schedule: str):
    deck = "START\n  1 JAN 2000 /\n" + schedule
    out = compdat.df(spark, deck)
    return rows(out, "DATE", "WELL", "I", "J", "K", "OP_SH")


def test_welopen_stop_on_connection_is_shut(spark):
    """id=welopen-stop-on-connection-is-shut: STOP with coordinates
    given acts on the connection and means SHUT."""
    got = _welopen_case(spark, """
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'STOP' 1 1 1 /
/
""")
    assert got == [(date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT")]


def test_welopen_popn_on_connection_is_open(spark):
    """id=welopen-popn-on-connection-is-open."""
    got = _welopen_case(spark, """
COMPDAT
 'OP1' 1 1 1 1 'SHUT' /
/
WELOPEN
 'OP1' 'POPN' 1 1 1 /
/
""")
    assert got == [(date(2000, 1, 1), "OP1", 1, 1, 1, "OPEN")]


def test_welopen_negative_and_zero_defaults(spark):
    """ids=zero-values/negative-values: 0 and -1 coordinates mean
    'all connections', same as 1*."""
    for coords in ("0 0 0", "-1 -1 -1"):
        got = _welopen_case(spark, f"""
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' {coords} /
/
""")
        assert got == [(date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT")], coords


def test_welopen_stop_on_well_explicit_defaults(spark):
    """id=welopen-stop-on-well-explicit-defaults: 1*/0/-1 coordinate
    forms all act on the well — STOP leaves connections OPEN."""
    got = _welopen_case(spark, """
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
 'OP3' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'STOP' 1* 1* 1* /
 'OP2' 'STOP' 0  0  0  /
 'OP3' 'STOP' -1 -1 -1 /
/
""")
    assert got == [
        (date(2000, 1, 1), "OP1", 1, 1, 1, "OPEN"),
        (date(2000, 1, 1), "OP2", 1, 1, 1, "OPEN"),
        (date(2000, 1, 1), "OP3", 1, 1, 1, "OPEN"),
    ]


def test_welopen_shut_then_stop_reopens_connections(spark):
    """id=welopen-shut-then-stop-on-well: a later STOP on the well
    rewrites previously SHUT connections back to OPEN."""
    got = _welopen_case(spark, """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' /
/
DATES
 1 FEB 2000 /
/
WELOPEN
 'OP1' 'STOP' /
/
""")
    assert (date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT") in got
    assert (date(2000, 2, 1), "OP1", 1, 1, 1, "OPEN") in got


def test_welopen_self_overwriting_records(spark):
    """id=self-overwriting-records: two actions in ONE keyword at the
    same date — the last wins."""
    got = _welopen_case(spark, """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN'  /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0 /
 'OP1' 'SHUT' 0 0 0 /
/
""")
    assert got == [(date(2001, 5, 1), "OP1", 1, 1, 1, "SHUT")]


def test_welopen_multiple_connections_same_cell(spark):
    """id=multiple-connnections-same-cell: two wells completed in the
    same cell are tracked independently."""
    got = _welopen_case(spark, """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 0 0 0 /
 'OP2' 'OPEN' 0 0 0 /
/
""")
    assert got == [
        (date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT"),
        (date(2000, 1, 1), "OP2", 1, 1, 1, "OPEN"),
    ]


def test_welopen_wildcards_do_not_apply_to_future_wells(spark):
    """id=wildcards-do-not-apply-to-future-wells: 'OP*' matches only
    wells defined at or before the action's date."""
    got = _welopen_case(spark, """
DATES
  1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 2 2 2 2 'OPEN' /
 'WI1' 3 3 3 3 'OPEN' /
/
WELOPEN
 'OP*' 'SHUT' 0 0 0 /
/
DATES
  1 FEB 2000 /
/
COMPDAT
  'OP3' 4 4 4 4 'OPEN' /
/
""")
    assert sorted(got) == [
        (date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT"),
        (date(2000, 1, 1), "OP2", 2, 2, 2, "SHUT"),
        (date(2000, 1, 1), "WI1", 3, 3, 3, "OPEN"),
        (date(2000, 2, 1), "OP3", 4, 4, 4, "OPEN"),
    ]


def test_welopen_wlist_expansion(spark):
    """id=redefined_wlist: '*OP' in WELOPEN expands to the list state
    at the action's deck position — the redefined list wins."""
    got = _welopen_case(spark, """
DATES
  1 JAN 1999/
/
WLIST
  '*OP' NEW OP9 /
/
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP1 /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
""")
    assert got == [(date(2000, 1, 1), "OP1", 1, 1, 1, "SHUT")]


def test_welopen_future_wlist_raises(spark):
    """id=futurewlist: referencing a list defined only later raises."""
    import pytest

    deck = """
START
  1 JAN 2000 /
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
DATES
  2 JAN 2000/
/
WLIST
  '*OP' NEW OP2 /
/
"""
    with pytest.raises(ValueError, match="not defined"):
        compdat.df(spark, deck)


def test_unknown_keyword_terminates_table_block():
    """An unregistered keyword after a table keyword must END the table,
    not crash on float coercion or absorb numeric payload as phantom
    rows."""
    from res2df_spark.sources.deck import parse_deck

    recs = parse_deck(
        "SWOF\n 0.1 0 1 0 /\n 1.0 1 0 0 /\nPMAX\n 414.7 1* /\n"
    )
    swof = [r for r in recs if r["KEYWORD"] == "SWOF"]
    assert len(swof) == 2
    assert not any(r["KEYWORD"] == "PMAX" for r in recs)
    # numeric payload of the unknown keyword must NOT appear as SWOF rows
    assert all(abs(r["SW"] - 414.7) > 1 for r in swof)


def test_comment_marker_inside_quotes_preserved():
    from res2df_spark.sources.deck import _tokenize

    assert _tokenize("'A--12' 'FIELD' 5 / -- real comment") == [
        "'A--12'", "'FIELD'", "5", "/",
    ]
    assert _tokenize("COMPDAT -- header comment\n 'W1' 1 2 3 4 /") == [
        "COMPDAT", "'W1'", "1", "2", "3", "4", "/",
    ]


WELOPEN_LUMP_DECK = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 74 135 7 7 'OPEN' /
  'OP1' 74 136 8 8 'OPEN' /
/
COMPLUMP
  'OP1' 2* 7 7 1 /
  'OP1' 2* 8 8 1 /
/
DATES
  1 FEB 2020 /
/
WELOPEN
  'OP1' 'SHUT' 74 135 7 1 1 /
/
"""


def test_welopen_lump_with_coords_restricts(spark):
    # reference ANDs the coordinate filter with the lump range: only the
    # (74,135,7) cell of lump 1 is shut, not every lump-1 member
    out = compdat.df(spark, WELOPEN_LUMP_DECK)
    shut = rows(out.filter("OP_SH = 'SHUT'"), "I", "J", "K")
    assert shut == [(74, 135, 7)]


def test_welopen_half_defaulted_lump_raises(spark):
    import pytest as _pytest

    deck = WELOPEN_LUMP_DECK.replace("74 135 7 1 1 /", "3* 1 1* /")
    with _pytest.raises(ValueError, match="Both or none"):
        compdat.df(spark, deck)


def test_complump_fully_defaulted_is_wildcard(spark):
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 2 'OPEN' /
/
COMPLUMP
  'OP1' 2* 2* 1 /
/
DATES
  1 FEB 2020 /
/
WELOPEN
  'OP1' 'SHUT' 3* 1 1 /
/
"""
    out = compdat.df(spark, deck)
    shut = rows(out.filter("OP_SH = 'SHUT'"), "K")
    assert shut == [(1,), (2,)]  # defaulted K range lumps BOTH cells


def test_compdat_defaults_follow_opm_schema(spark):
    """Reference parity: defaulted COMPDAT state is 'OPEN' (opm schema
    default), and a bare 'WELOPEN well /' record means STATUS='OPEN'."""
    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 33 44 1000.0 'OIL' /
/
COMPDAT
  'OP1' 33 44 10 10 /
/
"""
    out = compdat.df(spark, deck)
    r = out.collect()[0]
    assert r["OP_SH"] == "OPEN" and r["SATN"] == 0
    assert r["KH"] == -1.0 and r["SKIN"] == 0.0
    # bare WELOPEN record: STATUS defaults to OPEN and acts on the well
    deck2 = deck + "WELOPEN\n  'OP1' /\n/\n"
    out2 = compdat.df(spark, deck2)
    assert {r["OP_SH"] for r in out2.collect()} == {"OPEN"}


def test_compdat_defaulted_coords_require_welspecs(spark):
    import pytest as _pytest

    deck = """
START
  1 JAN 2020 /
COMPDAT
  'OP1' 2* 1 1 'OPEN' /
/
"""
    with _pytest.raises(ValueError, match="WELSPECS must be provided"):
        compdat.df(spark, deck)


def test_welopen_invalid_status_coerces_to_shut(spark):
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
  'OP1' 'XXXX' /
/
"""
    out = compdat.df(spark, deck)
    feb = [r for r in out.collect() if str(r["DATE"]) == "2020-02-01"]
    assert feb and all(r["OP_SH"] == "SHUT" for r in feb)


def test_welopen_wildcard_prefix_semantics(spark):
    """Reference common.py:980 uses bare re.match (no $): 'OP*1' also
    matches OP213 (prefix); leading-wildcard templates raise."""
    import pytest as _pytest

    base = """
START
  1 JAN 2020 /
WELSPECS
  'OP11' 'G1' 1 1 1000.0 'OIL' /
  'OP213' 'G1' 2 2 1000.0 'OIL' /
/
COMPDAT
  'OP11' 1 1 1 1 'OPEN' /
  'OP213' 2 2 1 1 'OPEN' /
/
DATES
  1 FEB 2020 /
/
"""
    out = compdat.df(spark, base + "WELOPEN\n  'OP*1' 'SHUT' /\n/\n")
    shut = {r["WELL"] for r in out.collect() if r["OP_SH"] == "SHUT"}
    assert shut == {"OP11", "OP213"}
    with _pytest.raises(ValueError, match="wildcard"):
        compdat.df(spark, base + "WELOPEN\n  '?P11' 'SHUT' /\n/\n")


def test_complump_validation_raises(spark):
    import pytest as _pytest

    base = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 2 'OPEN' /
/
"""
    with _pytest.raises(ValueError, match="Negative"):
        compdat.df(spark, base + "COMPLUMP\n  'OP1' -1 1 1 2 1 /\n/\n")
    with _pytest.raises(ValueError, match="K2 must be"):
        compdat.df(spark, base + "COMPLUMP\n  'OP1' 1 1 2 1 1 /\n/\n")


def test_runspec_dims_single_record_and_flag_chain():
    """RUNSPEC parity: EQLDIMS/TABDIMS are single-record (REGDIMS right
    after must not be swallowed as a phantom record), and a chain of
    zero-payload flag keywords (OIL WATER ...) must not hide the
    following START from the skip logic."""
    from res2df_spark.sources.deck import parse_deck

    recs = parse_deck(
        """RUNSPEC
DIMENS
  2 2 2 /
OIL
WATER
UNIFOUT
START
  1 JAN 2020 /
TABDIMS
  1 1 50 24 6 20 /
EQLDIMS
  2 100 20 /
REGDIMS
  6 1 0 3 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
"""
    )
    kws = [r["KEYWORD"] for r in recs]
    assert "START" in kws and "WELSPECS" in kws
    eqldims = [r for r in recs if r["KEYWORD"] == "EQLDIMS"]
    assert len(eqldims) == 1 and eqldims[0]["NTEQUL"] == 2
    import datetime

    assert [r for r in recs if r["KEYWORD"] == "START"][0]["DATE"] == (
        datetime.date(2020, 1, 1)
    )


def test_read_deck_include_splicing(tmp_path):
    """read_deck splices INCLUDE files recursively, resolving relative
    paths against the INCLUDING file's directory; missing files raise."""
    import pytest

    from res2df_spark.sources.deck import parse_deck, read_deck

    inc_dir = tmp_path / "include"
    inc_dir.mkdir()
    (inc_dir / "wells.inc").write_text(
        "WELSPECS\n  'OP1' 'G1' 1 1 1000.0 'OIL' /\n/\n"
        "INCLUDE\n  'nested.inc' /\n"
    )
    (inc_dir / "nested.inc").write_text(
        "COMPDAT\n  'OP1' 1 1 1 1 'OPEN' /\n/\n"
    )
    deck = tmp_path / "CASE.DATA"
    deck.write_text(
        "START\n  1 JAN 2020 /\n"
        "INCLUDE\n  'include/wells.inc' /  -- comment after\n"
    )
    text = read_deck(str(deck))
    kws = {r["KEYWORD"] for r in parse_deck(text)}
    assert kws == {"START", "WELSPECS", "COMPDAT"}

    bad = tmp_path / "BAD.DATA"
    bad.write_text("INCLUDE\n  'missing.inc' /\n")
    with pytest.raises(FileNotFoundError, match="missing.inc"):
        read_deck(str(bad))
