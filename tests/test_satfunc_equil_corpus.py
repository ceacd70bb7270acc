"""The reference's satfunc and equil test corpora, ported
(/root/reference/tests/test_satfunc.py, 707 lines;
test_equil.py, 629 lines): the str2df matrix for every saturation
keyword family, the eight defaulted-value interpolation cases, the
phase-dependent EQUIL column naming, RSVD/RVVD/PBVD/PDVD region
tables, NTEQUL record counting, phases_from_deck/columns, and the
Eclipse float-noise rounding rule.

REEK/eightcells binary cases and CLI mocker cases are covered by the
existing test_cli.py suite; `satfunc.interpolate_defaults` direct-call
frames are internal to the reference's pandas layout (the semantics
run deck-level here).
"""
import pytest

from res2df_spark.modules.tables import (
    equil_df,
    pbvd_df,
    pdvd_df,
    phases_from_columns,
    phases_from_deck,
    rsvd_df,
    rvvd_df,
    satfunc_df,
)


def _vals(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


# --- satfunc str2df matrix ---------------------------------------------------


def test_str2df_empty(spark):
    out = satfunc_df(spark, "")
    assert out is None or out.count() == 0


def test_str2df_swof_basic(spark):
    out = satfunc_df(spark, "SWOF\n  0 0 1 1\n  1 1 0 0\n/\n")
    assert _vals(out, "SW", "KRW", "KROW", "PCOW", "SATNUM", "KEYWORD") == [
        (0.0, 0.0, 1.0, 1.0, 1, "SWOF"),
        (1.0, 1.0, 0.0, 0.0, 1, "SWOF"),
    ]


def test_str2df_tabdims_two_regions(spark):
    deck = """
RUNSPEC

TABDIMS
  2/

PROPS

SWOF
  0 0 1 1
  1 1 0 0
/
  0 0 1 1
  0.5 0.5 0.5 0.5
  1 1 0 0
/
"""
    out = satfunc_df(spark, deck)
    assert _vals(out, "SW", "KRW", "SATNUM") == [
        (0.0, 0.0, 1), (0.0, 0.0, 2), (0.5, 0.5, 2),
        (1.0, 1.0, 1), (1.0, 1.0, 2),
    ]


def test_str2df_unknown_keyword_empty(spark):
    out = satfunc_df(spark, "SWRF\n0 / \n")
    assert out is None or out.count() == 0


def test_str2df_bogus_keyword_before_swof(spark):
    out = satfunc_df(spark, "FOO\n\nSWOF\n 0 0 1 1\n 1 1  0 0\n/\n")
    assert _vals(out, "SW", "KRW", "KROW", "PCOW") == [
        (0.0, 0.0, 1.0, 1.0), (1.0, 1.0, 0.0, 0.0),
    ]


def test_str2df_slgof(spark):
    out = satfunc_df(spark, "SLGOF\n  0 1 1 0\n  1 0 0 0\n/\n")
    assert _vals(out, "SL", "KRG", "KRO", "PCOG", "SATNUM", "KEYWORD") == [
        (0.0, 1.0, 1.0, 0.0, 1, "SLGOF"),
        (1.0, 0.0, 0.0, 0.0, 1, "SLGOF"),
    ]


def test_str2df_sof2(spark):
    out = satfunc_df(spark, "SOF2\n  0 1\n  1 0\n/\n")
    assert _vals(out, "SO", "KRO", "SATNUM", "KEYWORD") == [
        (0.0, 1.0, 1, "SOF2"), (1.0, 0.0, 1, "SOF2"),
    ]


def test_str2df_sof3(spark):
    out = satfunc_df(spark, "SOF3\n  0 1 1\n  1 0 0\n/\n")
    assert _vals(out, "SO", "KROW", "KROG", "SATNUM", "KEYWORD") == [
        (0.0, 1.0, 1.0, 1, "SOF3"), (1.0, 0.0, 0.0, 1, "SOF3"),
    ]


def test_str2df_sgfn_two_regions(spark):
    out = satfunc_df(spark, "SGFN\n  0 1 0\n  1 0 0\n/\n  0 1 0\n  1 0.1 1\n/\n")
    assert _vals(out, "SG", "KRG", "PCOG", "SATNUM", "KEYWORD") == [
        (0.0, 1.0, 0.0, 1, "SGFN"), (0.0, 1.0, 0.0, 2, "SGFN"),
        (1.0, 0.0, 0.0, 1, "SGFN"), (1.0, 0.1, 1.0, 2, "SGFN"),
    ]


def test_str2df_sgwfn(spark):
    out = satfunc_df(spark, "SGWFN\n  0 1 1 0\n  1 0 0 0\n /\n")
    assert _vals(out, "SG", "KRG", "KRW", "PCGW", "SATNUM", "KEYWORD") == [
        (0.0, 1.0, 1.0, 0.0, 1, "SGWFN"),
        (1.0, 0.0, 0.0, 0.0, 1, "SGWFN"),
    ]


def test_multiple_keywords_family2(spark):
    out = satfunc_df(spark, """
SWFN
-- Sw           Krw           Pcow
  0 0 2
  1.   1.000   0.00000e+00
/

SOF3
   0.00000e+00   0.00000e+00   0.00000e+00
   0.581051658   1.000000000   1.000000000
/

SGFN
  0.000  0.00000  0.000
  0.800  1.00000  0.000
/
""")
    assert {r["SATNUM"] for r in out.select("SATNUM").collect()} == {1}
    assert {r["KEYWORD"] for r in out.select("KEYWORD").collect()} == {
        "SWFN", "SOF3", "SGFN"}
    assert out.count() == 6


# --- the eight defaulted-value interpolation cases --------------------------


def _interp(spark, deck, *cols):
    out = satfunc_df(spark, deck, interpolate_defaults=True)
    return {
        c: [r[c] for r in
            out.orderBy("SATNUM", "ROW_IDX").select(c).collect()]
        for c in cols
    }


def test_defaulted_swof_values(spark):
    got = _interp(spark, "SWOF\n0 0 1 1\n0.5 1* 1* 1*\n1 1 0 0\n/\n",
                  "PCOW", "KROW", "KRW")
    assert got["PCOW"] == pytest.approx([1, 0.5, 0])
    assert got["KROW"] == pytest.approx([1, 0.5, 0])
    assert got["KRW"] == pytest.approx([0, 0.5, 1])


def test_defaulted_sgof_values(spark):
    got = _interp(
        spark,
        "SGOF\n0 0 1 1\n0.5 1* 1* 1*\n1 1 0 0\n/\n"
        "0 0 1 1\n0.2 1* 1* 1*\n1 1 0 0\n/\n",
        "PCOG", "KROG", "KRG",
    )
    assert got["PCOG"] == pytest.approx([1, 0.5, 0, 1, 0.8, 0])
    assert got["KROG"] == pytest.approx([1, 0.5, 0, 1, 0.8, 0])
    assert got["KRG"] == pytest.approx([0, 0.5, 1, 0, 0.2, 1])


def test_defaulted_swfn_values(spark):
    got = _interp(spark, "SWFN\n0 0 1\n0.1 1* 1*\n0.9 1* 1*\n1 1 0\n/\n",
                  "PCOW", "KRW")
    assert got["PCOW"] == pytest.approx([1, 0.9, 0.1, 0])
    assert got["KRW"] == pytest.approx([0, 0.1, 0.9, 1])


def test_defaulted_sof3_values(spark):
    got = _interp(spark, "SOF3\n0 0 1\n0.1 1* 1*\n0.9 1* 1*\n1 1 0\n/\n",
                  "KROG", "KROW")
    assert got["KROG"] == pytest.approx([1, 0.9, 0.1, 0])
    assert got["KROW"] == pytest.approx([0, 0.1, 0.9, 1])


def test_defaulted_sof2_values(spark):
    got = _interp(spark, "SOF2\n0 0\n0.1 1*\n0.9 1*\n1 1\n/\n", "KRO")
    assert got["KRO"] == pytest.approx([0, 0.1, 0.9, 1])


def test_defaulted_sgfn_values(spark):
    # the third row defaults TWO items via 2*
    got = _interp(spark, "SGFN\n0 0 1\n0.1 1* 1*\n0.9 2*\n1 1 0\n/\n",
                  "PCOG", "KRG")
    assert got["PCOG"] == pytest.approx([1, 0.9, 0.1, 0])
    assert got["KRG"] == pytest.approx([0, 0.1, 0.9, 1])


def test_defaulted_sgwfn_values(spark):
    got = _interp(spark, "SGWFN\n0 0 1 1\n0.5 3*\n1 1 0 0\n/\n",
                  "PCGW", "KRG", "KRW")
    assert got["PCGW"] == pytest.approx([1, 0.5, 0])
    assert got["KRG"] == pytest.approx([0, 0.5, 1])
    assert got["KRW"] == pytest.approx([1, 0.5, 0])


def test_defaulted_slgof_values(spark):
    got = _interp(spark, "SLGOF\n0 0 1 1\n0.5 3*\n1 1 0 0\n/\n",
                  "PCOG", "KRG", "KRO")
    assert got["PCOG"] == pytest.approx([1, 0.5, 0])
    assert got["KRG"] == pytest.approx([0, 0.5, 1])
    assert got["KRO"] == pytest.approx([1, 0.5, 0])


def test_defaulted_edge_value_stays_nan(spark):
    """A default at the table EDGE has no left neighbour — inside-only
    interpolation leaves it NULL (reference: 'this will probably crash
    Eclipse' but the frame carries NaN)."""
    out = satfunc_df(spark, "SWFN\n0 0 1*\n1 1 0\n/\n",
                     interpolate_defaults=True)
    rows = out.orderBy("ROW_IDX").select("PCOW", "KRW").collect()
    assert rows[0]["PCOW"] is None
    assert rows[1]["PCOW"] == 0.0
    assert [r["KRW"] for r in rows] == [0.0, 1.0]


# --- equil: phase-dependent column naming ------------------------------------


def test_equil_owg(spark):
    out = equil_df(spark, "OIL\nWATER\nGAS\n\nEQUIL\n 2000 200 2200 /\n")
    r = out.first()
    assert r["OWC"] == 2200.0
    assert out.count() == 1
    assert r["EQLNUM"] == 1
    assert "IGNORE1" not in out.columns


def test_equil_oil_water(spark):
    out = equil_df(spark, "OIL\nWATER\n\nEQUIL\n 2000 200 2200 /\n")
    assert out.first()["OWC"] == 2200.0
    assert "GOC" not in out.columns


def test_equil_gas_water(spark):
    out = equil_df(spark, "GAS\nWATER\n\nEQUIL\n 2000 200 2200 /\n")
    assert out.first()["GWC"] == 2200.0
    assert "OWC" not in out.columns
    assert "IGNORE2" not in out.columns


def test_equil_gas_oil(spark):
    out = equil_df(spark, "GAS\nOIL\n\nEQUIL\n 2000 200 2200 1 2100 3 /\n")
    r = out.first()
    assert r["GOC"] == 2100.0
    assert "GWC" not in out.columns
    assert "OWC" not in out.columns


def test_equil_two_records(spark):
    deck = """
OIL
WATER
GAS

EQUIL
 2469.0     382.4  1700.0    0.0  0.0    0.0     1     0      20  /
 2469.0     382.4  1000.0    0.0  0.0    0.0     2     0      20  /
"""
    out = equil_df(spark, deck)
    assert out.count() == 2
    assert {r["GOC"] for r in out.select("GOC").collect()} == {0.0}
    assert {r["OWC"] for r in out.select("OWC").collect()} == {1700.0, 1000.0}


def test_ntequl_inferred_from_records(spark):
    deck = "GAS\nOIL\n\nEQUIL\n 2000 200 2200 1 2100 3 /\n" \
           " 3000 200 2200 1 2100 3 /\n"
    out = equil_df(spark, deck)
    assert out.count() == 2
    nums = sorted(r["EQLNUM"] for r in out.select("EQLNUM").collect())
    assert nums == [1, 2]


def test_ntequl_with_eqldims(spark):
    deck = "GAS\nOIL\n\nEQLDIMS\n 2 /\n\nEQUIL\n" \
           " 2000 200 2200 1 2100 3 /\n 3000 200 2200 1 2100 3 /\n"
    out = equil_df(spark, deck)
    assert out.count() == 2
    assert {r["GOC"] for r in out.select("GOC").collect()} == {2100.0}


# --- solution depth tables ----------------------------------------------------


def test_rsvd(spark):
    out = rsvd_df(spark, "RSVD\n 10 100 /\n 30 400 /\n 50 100 /")
    assert max(r["EQLNUM"] for r in out.select("EQLNUM").collect()) == 3
    assert {r["Z"] for r in out.select("Z").collect()} == {10.0, 30.0, 50.0}
    assert {r["RS"] for r in out.select("RS").collect()} == {100.0, 400.0}


def test_rsvd_multirow_records(spark):
    out = rsvd_df(spark, "RSVD\n 10 100\n 30 400 /\n 50 100\n 60 1000 /")
    assert out.count() == 4
    assert max(r["EQLNUM"] for r in out.select("EQLNUM").collect()) == 2
    assert {r["Z"] for r in out.select("Z").collect()} == {
        10.0, 30.0, 50.0, 60.0}


def test_equil_keyword_filter_excludes_solution(spark):
    out = equil_df(spark, "RSVD\n 10 100 /\n 30 400 /\n", keywords=["EQUIL"])
    assert out is None or out.count() == 0


@pytest.mark.parametrize(
    "kw,fn,col",
    [("RVVD", rvvd_df, "RV"), ("PBVD", pbvd_df, "PB"),
     ("PDVD", pdvd_df, "PD")],
)
def test_other_solution_tables(spark, kw, fn, col):
    # one (Z, value) row per record; each record is its own region
    out = fn(spark, f"{kw}\n 10 100 /\n 30 400 /")
    assert out.count() == 2
    assert max(r["EQLNUM"] for r in out.select("EQLNUM").collect()) == 2
    assert col in out.columns


# --- phases ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "deckstring, expected",
    [
        ("WATER\nOIL", "oil-water"),
        ("WATER", ""),
        ("GAS", ""),
        ("WATER\nGAS", "gas-water"),
        ("GAS\nWATER", "gas-water"),
        ("OIL\nWATER\nGAS", "oil-water-gas"),
    ],
)
def test_phases_from_deck(deckstring, expected):
    assert phases_from_deck(deckstring) == expected


@pytest.mark.parametrize(
    "stringlist, expected",
    [
        ([""], ""),
        (["OWC"], "oil-water"),
        (["GWC"], "gas-water"),
        (["GOC"], "oil-gas"),
        (["OWC", "GOC"], "oil-water-gas"),
        (["OWC", "GWC"], ""),  # meaningless mixes are inconclusive
        (["GOC", "GWC"], ""),
        (["WOC"], ""),  # common typo
    ],
)
def test_phases_from_columns(stringlist, expected):
    assert phases_from_columns(stringlist) == expected


# --- Eclipse float-noise rounding (writer) ------------------------------------


@pytest.mark.parametrize(
    "noisy, rendered",
    [
        (1000.00000000000000000005, "1000.0"),
        (1000.0000000000003, "1000.0"),
        (1000.0000003, "1000.0"),
        (1000.000003, "1000.000003"),  # legitimate precision survives
    ],
)
def test_eclipse_rounding(noisy, rendered):
    """Float-arithmetic noise must not reach include files (observed to
    crash Eclipse — reference test_eclipse_rounding); legitimate
    precision and tiny values must survive."""
    from res2df_spark.sinks.writers import _fmt_value

    assert _fmt_value(noisy) == rendered


def test_tiny_values_survive_rounding():
    from res2df_spark.sinks.writers import _fmt_value

    assert _fmt_value(1e-12) == "1e-12"
    assert _fmt_value(3e-07) == "3e-07"
    assert _fmt_value(0.581051658) == "0.581051658"
