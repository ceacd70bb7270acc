"""Portable cases from the reference's core compdat corpus
(/root/reference/tests/test_compdat.py, 703 lines) not already pinned
by tests/test_deck_compdat.py: full optional-item parsing (TRAN, WBDIA,
DFACT, DIR, PEQVR now carried through the pipeline), defaulted-status
unroll, and the reference CSV column vocabulary."""
import pytest

from res2df_spark.modules import compdat


def test_str_compdat_full_items(spark):
    """All fourteen COMPDAT items reach the frame (reference
    test_str_compdat: SATN 0, DFACT empty, DIR 'Y')."""
    out = compdat.df(spark, """
COMPDAT
 'OP1' 33 110 31 31 'OPEN' 1* 6467.31299 0.216 506642.25  0 1* 'Y' 7.18 /
-- comments.
/
""")
    r = out.first()
    # SATN defaulted (1*) — the reference's opm default is 0
    assert r["SATN"] in (0, None)
    assert r["TRAN"] == 6467.31299
    assert r["WBDIA"] == 0.216
    assert r["KH"] == 506642.25
    assert r["SKIN"] == 0.0
    assert r["DFACT"] is None
    assert r["DIR"] == "Y"
    assert r["PEQVR"] == 7.18


def test_str_compdat_defaulted_tail(spark):
    """'FOO' 303 1010 031 39: nine unrolled rows, optional items all
    empty, leading-zero integers parsed."""
    out = compdat.df(spark, "COMPDAT\n 'FOO' 303 1010 031 39  /\n/\n")
    rows = out.orderBy("K").collect()
    assert len(rows) == 9
    assert [r["K"] for r in rows] == list(range(31, 40))
    assert rows[0]["I"] == 303 and rows[0]["J"] == 1010
    assert rows[0]["DFACT"] is None
    assert rows[0]["TRAN"] is None


def test_reference_csv_vocabulary(spark):
    """to_reference_shape carries the reference CSV columns — short
    names (TRAN, not opm's CONNECTION_TRANSMISSIBILITY_FACTOR),
    upper-case KH, quotes stripped from OP/SH."""
    out = compdat.to_reference_shape(compdat.df(spark, """
COMPDAT
 'OP1' 33 110 31 31 'OPEN' 0 6467.31299 0.216 506642.25  0.0 0.0 'Y' 7.18 /
/
"""))
    assert "CONNECTION_TRANSMISSIBILITY_FACTOR" not in out.columns
    assert "TRAN" in out.columns
    assert "Kh" not in out.columns and "KH" in out.columns
    assert {"K1", "K2", "OP/SH"} <= set(out.columns)
    assert out.first()["OP/SH"] == "OPEN"


def test_welopen_rewrite_preserves_item_payload(spark):
    """A WELOPEN rewrite row keeps the connection's full item payload
    (the reference copies whole rows into new_state)."""
    out = compdat.df(spark, """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' 0 6467.31299 0.216 506642.25 0.0 0.0 'Y' 7.18 /
/
DATES
 1 FEB 2000 /
/
WELOPEN
 'OP1' 'SHUT' /
/
""")
    import datetime

    shut = out.filter("OP_SH = 'SHUT'").first()
    assert shut["DATE"] == datetime.date(2000, 2, 1)
    assert shut["TRAN"] == 6467.31299
    assert shut["DIR"] == "Y"
    assert shut["PEQVR"] == 7.18


def test_samecellperf(spark):
    out = compdat.df(
        spark, "COMPDAT\n  'OP1' 1 1 1 1 /\n  'OP2' 1 1 1 1 /\n/\n"
    )
    assert out.count() == 2


def test_unroll_range_eleven_rows(spark):
    out = compdat.df(spark, "COMPDAT\n  'OP1' 33 44 10 20  /\n/\n")
    rows = out.orderBy("K").collect()
    assert len(rows) == 11
    assert {r["I"] for r in rows} == {33}
    assert {r["J"] for r in rows} == {44}
    assert [r["K"] for r in rows] == list(range(10, 21))
