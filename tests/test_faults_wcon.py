"""faults (R2 box explode) and wcon (W1 cursor + R9 tagged union)
modules — reference semantics: faults.py:40-60, wcon.py:26-64."""

from datetime import date

from res2df_spark.modules import faults, wcon

_DECK = """
START
  1 JAN 2020 /
FAULTS
  'FA' 1 1 1 2 1 1 'X' /
/
WCONPROD
  'OP1' 'OPEN' 'ORAT' 100.0 /
/
TSTEP
  10 20 /
WCONINJE
  'WI1' 'WATER' 'OPEN' 'RATE' 500.0 2* 400.0 /
/
WCONINJH
  'WI2' 'GAS' 'SHUT' 9000.0 /
/
WCONHIST
  'OP1' 'OPEN' 'ORAT' 120.0 1.0 2.0 /
/
"""


def test_faults_unrolls_boxes(spark):
    out = faults.df(spark, _DECK).orderBy("I", "J", "K").collect()
    assert [(r["NAME"], r["I"], r["J"], r["K"], r["FACE"]) for r in out] == [
        ("FA", 1, 1, 1, "X"),
        ("FA", 1, 2, 1, "X"),
    ]


def test_faults_lowercase_face_normalized(spark):
    deck = "FAULTS\n 'F' 2 2 2 2 3 3 'y-' /\n/\n"
    assert faults.df(spark, deck).collect()[0]["FACE"] == "Y-"


def test_faults_empty_deck(spark):
    assert faults.df(spark, "WELSPECS\n 'W' 'G' 1 1 /\n/\n").count() == 0


def test_wcon_dates_and_tags(spark):
    rows = {
        (r["KEYWORD"], r["WELL"]): r for r in wcon.df(spark, _DECK).collect()
    }
    assert len(rows) == 4
    # WCONPROD at START date; the rest after TSTEP 10+20 days
    assert rows[("WCONPROD", "OP1")]["DATE"] == date(2020, 1, 1)
    assert rows[("WCONINJE", "WI1")]["DATE"] == date(2020, 1, 31)
    assert rows[("WCONHIST", "OP1")]["DATE"] == date(2020, 1, 31)


def test_wcon_schema_union(spark):
    rows = {(r["KEYWORD"], r["WELL"]): r for r in wcon.df(spark, _DECK).collect()}
    inje = rows[("WCONINJE", "WI1")]
    assert inje["TYPE"] == "WATER" and inje["RATE"] == 500.0 and inje["THP"] == 400.0
    # columns absent from a keyword's schema are NULL
    assert inje["ORAT"] is None
    prod = rows[("WCONPROD", "OP1")]
    assert prod["TYPE"] is None and prod["ORAT"] == 100.0
    injh = rows[("WCONINJH", "WI2")]
    assert injh["STATUS"] == "SHUT" and injh["RATE"] == 9000.0


def test_wcon_cli(spark, tmp_path, capsys):
    from res2df_spark.cli import main

    deckfile = tmp_path / "X.DATA"
    deckfile.write_text(_DECK)
    assert main(["wcon", str(deckfile), "-o", "-"]) == 0
    head = capsys.readouterr().out.splitlines()[0]
    assert "KEYWORD" in head and "WELL" in head


def test_wconprod_full_record_positional_order(spark):
    """Item order must match the opm schema: GRAT is followed by LRAT
    and RESV — a full record must land BHP/THP/VFP_TABLE/ALQ in the
    right columns (regression for the mis-ordered round-1 schema)."""
    deck = """
WCONPROD
  'OP1' 'OPEN' 'ORAT' 100.0 10.0 5000.0 120.0 0.0 75.0 30.0 8 0.5 /
/
"""
    r = wcon.df(spark, deck).collect()[0]
    assert r["ORAT"] == 100.0 and r["WRAT"] == 10.0 and r["GRAT"] == 5000.0
    assert r["LRAT"] == 120.0 and r["RESV"] == 0.0
    assert r["BHP"] == 75.0 and r["THP"] == 30.0
    assert r["VFP_TABLE"] == 8 and r["ALQ"] == 0.5


def test_welspecs_full_item_list(spark):
    from res2df_spark.sources.deck import deck_records

    deck = """
WELSPECS
 'OP1' 'OPWEST' 41 125 1759.74 'OIL' 0.0 'STD' 'SHUT' 'YES' 0 'SEG' /
/
"""
    r = deck_records(spark, deck, "WELSPECS").collect()[0]
    assert r["DRAIN_RADIUS"] == 0.0
    assert r["INFLOW_EQ"] == "STD"
    assert r["AUTO_SHUTIN"] == "SHUT"
    assert r["CROSSFLOW"] == "YES"
    assert r["P_TABLE"] == 0
    assert r["DENSITY_CALC"] == "SEG"
