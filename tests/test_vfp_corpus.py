"""The reference's VFP test corpus, ported
(/root/reference/tests/test_vfp.py, 1374 lines): single-table VFPPROD /
VFPINJ parses with full and defaulted meta records, multi-table decks,
table-number selection (plain, single, int-list range with the
endpoints-only quirk), writer round-trips, and pyarrow round-trips.

Expected frames are constructed clean-room from the deck semantics
(axis vectors × value records) in the reference's vfp.df() column
vocabulary.  Comparisons are order-insensitive multisets of full row
tuples: the reference's row order is an artifact of its numpy stacking
loop, not semantic content.

The reference's basic-data internal checks (_check_basic_data key /
dimension errors) map onto this engine's parse-time ValueError guards,
exercised in the dimension/validation tests at the bottom.
"""
import pytest

from res2df_spark.modules import vfp

# --- VFPPROD case 1: full meta, 3x2x2x2x1 grid ---------------------------

VFPPROD_FULL = """
VFPPROD

-- Table  Datum Depth  Rate Type  WFR Type  GFR Type  THP Type  ALQ Type  UNITS   TAB Type
       1       3000.0        GAS       WGR       GOR       THP        ''  METRIC       BHP /

     50000     500000      5e+06  /
        40        100  /
         0      1e-05  /
       500       4000  /
         0  /

 1  1  1  1    160.11     130.21     180.31
/
 1  1  2  1    140.12     110.22     160.32
/
 1  2  1  1    165.13     135.23     185.33
/
 1  2  2  1    145.14     115.24     165.34
/
 2  1  1  1    240.15     210.25     260.35
/
 2  1  2  1    220.16     190.26     240.36
/
 2  2  1  1    245.17     215.27     265.37
/
 2  2  2  1    225.18     195.28     245.38
/
"""

_RATES = [50000.0, 500000.0, 5e6]
_THPS = [40.0, 100.0]
_WGRS = [0.0, 1e-05]
_GORS = [500.0, 4000.0]
_BHPS = {
    (1, 1, 1, 1): [160.11, 130.21, 180.31],
    (1, 1, 2, 1): [140.12, 110.22, 160.32],
    (1, 2, 1, 1): [165.13, 135.23, 185.33],
    (1, 2, 2, 1): [145.14, 115.24, 165.34],
    (2, 1, 1, 1): [240.15, 210.25, 260.35],
    (2, 1, 2, 1): [220.16, 190.26, 240.36],
    (2, 2, 1, 1): [245.17, 215.27, 265.37],
    (2, 2, 2, 1): [225.18, 195.28, 245.38],
}


def _prod_expected(table=1, datum=3000.0, types=None):
    types = types or ("GAS", "WGR", "GOR", "''", "THP", "BHP", "METRIC")
    rows = set()
    for (it, iw, ig, ia), bhps in _BHPS.items():
        for rate, tab in zip(_RATES, bhps):
            rows.add((
                rate, _THPS[it - 1], _WGRS[iw - 1], _GORS[ig - 1], 0.0,
                tab, "VFPPROD", table, datum, *types,
            ))
    return rows


def _collect(df):
    return {tuple(r) for r in df.collect()}


def test_res2df_vfpprod_full(spark):
    out = vfp.df(spark, VFPPROD_FULL, "VFPPROD")
    assert out.columns == [
        "RATE", "PRESSURE", "WFR", "GFR", "ALQ", "TAB", "VFP_TYPE",
        "TABLE_NUMBER", "DATUM", "RATE_TYPE", "WFR_TYPE", "GFR_TYPE",
        "ALQ_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE",
    ]
    assert _collect(out) == _prod_expected()


# --- VFPPROD case 2: everything after datum defaulted ---------------------

VFPPROD_DEFAULTED = """
VFPPROD
       2       3000.0 /
     50000 /
        40 /
         0 /
       500 /
         0 /
 1  1  1  1    160.11
/
"""


def test_res2df_vfpprod_defaulted_meta(spark):
    out = vfp.df(spark, VFPPROD_DEFAULTED, "VFPPROD")
    assert _collect(out) == {(
        50000.0, 40.0, 0.0, 500.0, 0.0, 160.11, "VFPPROD", 2, 3000.0,
        "GAS", "WCT", "GOR", "''", "THP", "BHP", "DEFAULT",
    )}


# --- VFPINJ cases ----------------------------------------------------------

VFPINJ_FULL = """
VFPINJ

-- Table  Datum Depth  Rate Type  THP Type  UNITS     TAB Type
       3       3200.0        GAS       THP    METRIC       BHP /

     50000     500000      5e+06  /
       100        200  /

 1    180.11     170.21     150.31
/
 2    270.12     260.22     240.32
/
"""


def _inj_expected():
    rows = set()
    for thp, bhps in ((100.0, [180.11, 170.21, 150.31]),
                      (200.0, [270.12, 260.22, 240.32])):
        for rate, tab in zip(_RATES, bhps):
            rows.add((rate, thp, tab, "VFPINJ", 3, 3200.0,
                      "GAS", "THP", "BHP", "METRIC"))
    return rows


def test_res2df_vfpinj_full(spark):
    out = vfp.df(spark, VFPINJ_FULL, "VFPINJ")
    assert out.columns == [
        "RATE", "PRESSURE", "TAB", "VFP_TYPE", "TABLE_NUMBER", "DATUM",
        "RATE_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE",
    ]
    assert _collect(out) == _inj_expected()


VFPINJ_DEFAULTED = """
VFPINJ
       4       3200.0 /
     50000 /
       100 /
 1    180.11
/
"""


def test_res2df_vfpinj_defaulted_meta(spark):
    out = vfp.df(spark, VFPINJ_DEFAULTED, "VFPINJ")
    assert _collect(out) == {(
        50000.0, 100.0, 180.11, "VFPINJ", 4, 3200.0,
        "GAS", "THP", "BHP", "DEFAULT",
    )}


# --- multi-table deck: two VFPPROD + two VFPINJ ---------------------------

MULTI_DECK = """
VFPPROD
       1       3000.0        GAS       WGR       GOR       THP        ''  METRIC       BHP /
     50000 /
        40 /
         0 /
       500 /
         0 /
 1  1  1  1    100.0
/

VFPPROD
       2       4000.0        GAS       WGR       GOR       THP        ''  METRIC       BHP /
     10000 /
        10 /
         0 /
        50 /
         0 /
 1  1  1  1    200.0
/

VFPINJ
       3       3200.0        GAS       THP    METRIC       BHP /
     50000 /
       100.0 /
 1    200.0
/

VFPINJ
       4       3200.0        GAS       THP    METRIC       BHP /
     50000 /
       100.0 /
 1    200.0
/
"""

_MULTI_EXPECTED = {
    1: {(50000.0, 40.0, 0.0, 500.0, 0.0, 100.0, "VFPPROD", 1, 3000.0,
         "GAS", "WGR", "GOR", "''", "THP", "BHP", "METRIC")},
    2: {(10000.0, 10.0, 0.0, 50.0, 0.0, 200.0, "VFPPROD", 2, 4000.0,
         "GAS", "WGR", "GOR", "''", "THP", "BHP", "METRIC")},
    3: {(50000.0, 100.0, 200.0, "VFPINJ", 3, 3200.0,
         "GAS", "THP", "BHP", "METRIC")},
    4: {(50000.0, 100.0, 200.0, "VFPINJ", 4, 3200.0,
         "GAS", "THP", "BHP", "METRIC")},
}


def test_res2df_vfpprods_multi(spark):
    frames = vfp.dfs(spark, MULTI_DECK, "VFPPROD")
    assert len(frames) == 2
    assert _collect(frames[0]) == _MULTI_EXPECTED[1]
    assert _collect(frames[1]) == _MULTI_EXPECTED[2]


def test_res2df_vfpinjs_multi(spark):
    frames = vfp.dfs(spark, MULTI_DECK, "VFPINJ")
    assert len(frames) == 2
    assert _collect(frames[0]) == _MULTI_EXPECTED[3]
    assert _collect(frames[1]) == _MULTI_EXPECTED[4]


def test_res2df_vfpprod_number_selection(spark):
    frames = vfp.dfs(spark, MULTI_DECK, "VFPPROD", "2")
    assert len(frames) == 1
    assert _collect(frames[0]) == _MULTI_EXPECTED[2]


def test_res2df_vfpinj_number_selection(spark):
    frames = vfp.dfs(spark, MULTI_DECK, "VFPINJ", "4")
    assert len(frames) == 1
    assert _collect(frames[0]) == _MULTI_EXPECTED[4]


def test_res2df_vfpprods_number_range(spark):
    # "[1:2]" — the endpoints 1 and 2, which here IS the full range
    frames = vfp.dfs(spark, MULTI_DECK, "VFPPROD", "[1:2]")
    assert len(frames) == 2
    assert _collect(frames[0]) == _MULTI_EXPECTED[1]
    assert _collect(frames[1]) == _MULTI_EXPECTED[2]


def test_res2df_vfpinjs_number_range(spark):
    frames = vfp.dfs(spark, MULTI_DECK, "VFPINJ", "[3:4]")
    assert len(frames) == 2
    assert _collect(frames[0]) == _MULTI_EXPECTED[3]
    assert _collect(frames[1]) == _MULTI_EXPECTED[4]


def test_df_single_keyword_filter(spark):
    prod = vfp.df(spark, MULTI_DECK, "VFPPROD", "2")
    assert _collect(prod) == _MULTI_EXPECTED[2]
    inj = vfp.df(spark, MULTI_DECK, "VFPINJ")
    assert _collect(inj) == _MULTI_EXPECTED[3] | _MULTI_EXPECTED[4]


# --- writer round-trips (df2res analogue): re-parse equality ---------------
# The reference asserts BYTE equality against its own pretty-printed
# text; this engine's writer has its own layout, so the portable
# contract is: write → re-parse → identical reference-shape frame,
# INCLUDING the meta types (the writer emits them; DEFAULT units render
# as 1* and undefined ALQ as '').


def test_df2res_vfpprod_roundtrip(spark):
    from res2df_spark.sinks.df2res import df2res_vfpprod

    out = vfp.df_prod(spark, VFPPROD_FULL)
    text = df2res_vfpprod(out)
    again = vfp.df(spark, text, "VFPPROD")
    assert _collect(again) == _prod_expected()


def test_df2res_vfpprod_roundtrip_defaulted(spark):
    from res2df_spark.sinks.df2res import df2res_vfpprod

    out = vfp.df_prod(spark, VFPPROD_DEFAULTED)
    text = df2res_vfpprod(out)
    assert "1*" in text  # DEFAULT unit system renders as a default item
    again = vfp.df(spark, text, "VFPPROD")
    assert _collect(again) == _collect(vfp.df(spark, VFPPROD_DEFAULTED,
                                              "VFPPROD"))


def test_df2res_vfpinj_roundtrip(spark):
    from res2df_spark.sinks.df2res import df2res_vfpinj

    out = vfp.df_inj(spark, VFPINJ_FULL)
    text = df2res_vfpinj(out)
    again = vfp.df(spark, text, "VFPINJ")
    assert _collect(again) == _inj_expected()


def test_df2res_vfpinj_roundtrip_defaulted(spark):
    from res2df_spark.sinks.df2res import df2res_vfpinj

    out = vfp.df_inj(spark, VFPINJ_DEFAULTED)
    text = df2res_vfpinj(out)
    again = vfp.df(spark, text, "VFPINJ")
    assert _collect(again) == _collect(vfp.df(spark, VFPINJ_DEFAULTED,
                                              "VFPINJ"))


# --- pyarrow round-trips ----------------------------------------------------


def test_pyarrow_roundtrip_vfpprod(spark):
    from res2df_spark.sinks.writers import to_arrow_table

    out = vfp.df(spark, VFPPROD_FULL, "VFPPROD")
    table = to_arrow_table(out)
    back = spark.createDataFrame(table.to_pandas())
    assert _collect(back.select(*out.columns)) == _prod_expected()


def test_pyarrow_roundtrip_vfpinj(spark):
    from res2df_spark.sinks.writers import to_arrow_table

    out = vfp.df(spark, VFPINJ_FULL, "VFPINJ")
    table = to_arrow_table(out)
    back = spark.createDataFrame(table.to_pandas())
    assert _collect(back.select(*out.columns)) == _inj_expected()


# --- validation: the reference's _check_basic_data dimension errors map
# onto parse-time guards here ------------------------------------------------


def test_invalid_rate_type_raises(spark):
    deck = VFPINJ_DEFAULTED.replace("3200.0 /", "3200.0 'XXX' /")
    with pytest.raises(ValueError, match="invalid rate type"):
        vfp.df_inj(spark, deck)


def test_invalid_unit_type_raises(spark):
    deck = """
VFPINJ
  1 3000.0 'WAT' 'THP' 'BHP' /
  100 /
  10 /
  1 2000 /
"""
    # BHP in the UNITS slot: positional items make this a unit-type
    # error, exactly what opm would reject
    with pytest.raises(ValueError, match="invalid unit type"):
        vfp.df_inj(spark, deck)


def test_short_value_record_raises(spark):
    deck = VFPINJ_FULL.replace("270.12     260.22     240.32",
                               "270.12     260.22")
    with pytest.raises(ValueError, match="BHP values"):
        vfp.df_inj(spark, deck)


def test_out_of_range_axis_index_raises(spark):
    deck = VFPINJ_FULL.replace("\n 2    270.12", "\n 3    270.12")
    with pytest.raises(ValueError, match="THP index 3"):
        vfp.df_inj(spark, deck)
