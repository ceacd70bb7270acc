"""The reference's gruptree test corpus, ported
(/root/reference/tests/test_gruptree.py, 793 lines): string-deck
frames with/without startdate, GRUPNET terminal pressures (root /
ignored-node / multiple-root cases), the full tree_from_dict
pretty-print matrix, edge_dataframe2dict multiple roots, TSTEP
date-stepping, the three BRANPROP/NODEPROP snapshot cases, and the
multi-date GRUPTREE+BRANPROP prettyprint.

REEK-binary-backed cases (test_gruptree2df, test_main*) exercise the
same df() through the CLI and are covered by the existing eightcells
CLI tests; the deprecated dict2treelib shim is reference-internal.
"""
import datetime

import pytest

from res2df_spark.modules import gruptree

D = datetime.date


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]


# --- test_str2df: startdate semantics ---------------------------------------

STR2DF_DECK = """
GRUPTREE
 'OPWEST' 'OP' /
 'OP' 'FIELD' /
 'FIELD' 'AREA' /
 'AREA' 'NORTHSEA' /
/

WELSPECS
 'OP1' 'OPWEST' 41 125 1759.74 'OIL' 0.0 'STD' 'SHUT' 'YES'  0  'SEG' /
/
"""


def test_str2df_no_dates_gives_null_date(spark):
    out = gruptree.df(spark, STR2DF_DECK)
    dates = {r["DATE"] for r in out.select("DATE").distinct().collect()}
    assert dates == {None}
    # TERMINAL_PRESSURE only materializes when GRUPNET/NODEPROP present
    assert "TERMINAL_PRESSURE" not in out.columns or all(
        r["TERMINAL_PRESSURE"] is None
        for r in out.select("TERMINAL_PRESSURE").collect()
    )


def test_str2df_with_startdate(spark):
    out = gruptree.df(spark, STR2DF_DECK, startdate=D(2019, 1, 1))
    rows = _rows(out, "DATE", "CHILD", "PARENT")
    assert all(r[0] == D(2019, 1, 1) for r in rows)
    # 4 GRUPTREE edges + synthesized NORTHSEA root + 1 WELSPECS edge
    assert len(rows) == 6


# --- test_grupnet_rst_docs: the nested documentation tree -------------------


def test_grupnet_rst_docs_tree(spark):
    schstr = """
START
 01 'JAN' 2000 /

SCHEDULE

GRUPTREE
 'OPEAST' 'OP' /
 'OPWEST' 'OP' /
 'INJEAST' 'WI' /
 'OP' 'FIELD' /
 'WI' 'FIELD' /
 'FIELD' 'AREA' /
 'AREA' 'NORTHSEA' /
/

GRUPNET
  'FIELD' 90 /
  'OPWEST' 100 /
/

WELSPECS
 'OP1'  'OPWEST'  41 125 1759.74 'OIL' 0.0 'STD' 'SHUT' 'YES'  0  'SEG' /
 'OP2'  'OPEAST'  43 122 1776.01 'OIL' 0.0 'STD' 'SHUT' 'YES'  0  'SEG' /
 'INJ1' 'INJEAST' 33 115 1960.21 'OIL' 0.0 'STD' 'SHUT' 'YES'  0  'SEG' /
/
"""
    grupdf = gruptree.df(spark, schstr).toPandas()
    grup_dict = gruptree.edge_dataframe2dict(grupdf)
    assert gruptree.tree_from_dict(grup_dict[0]).strip() == """
NORTHSEA
└── AREA
    └── FIELD
        ├── OP
        │   ├── OPEAST
        │   │   └── OP2
        │   └── OPWEST
        │       └── OP1
        └── WI
            └── INJEAST
                └── INJ1
""".strip()


# --- test_grupnetdf ----------------------------------------------------------


def test_grupnetdf(spark):
    schstr = """
GRUPTREE
 'OPWEST' 'OP' /
 'OP' 'FIELD' /
 'WI' 'FIELD' /
 'FIELD' 'AREA' /
 'AREA' 'NORTHSEA' /
/

GRUPNET
  'FIELD' 90 /
  'OPWEST' 100 /
/
"""
    out = gruptree.df(spark, schstr, startdate=D(2000, 1, 1))
    assert "TERMINAL_PRESSURE" in out.columns
    vals = {r["TERMINAL_PRESSURE"]
            for r in out.select("TERMINAL_PRESSURE").collect()}
    assert 90.0 in vals and 100.0 in vals


# --- test_tree_from_dict: the full pretty-print matrix -----------------------


@pytest.mark.parametrize(
    "dicttree, expected_str",
    [
        ({}, ""),
        ({"foo": {}}, "foo"),
        ({"foo": {"bar": {}}}, "foo\n└── bar"),
        ({"foo": {"bar": {}, "com": {}}}, "foo\n├── bar\n└── com"),
        ({"foo": {"com": {}, "bar": {}}}, "foo\n├── bar\n└── com"),
        (
            {"foo": {"bar": {}, "com": {"fjooo": {}}}},
            "foo\n├── bar\n└── com\n    └── fjooo",
        ),
        ({1: {2: {}}}, "1\n└── 2"),
        (
            {
                "foo": {
                    "bar": {},
                    "com": {"fjooo": {}},
                    "bart": {},
                    "comt": {"fjooot": {}},
                }
            },
            "foo\n├── bar\n├── bart\n├── com\n│   └── fjooo\n"
            "└── comt\n    └── fjooot",
        ),
    ],
)
def test_tree_from_dict(dicttree, expected_str):
    assert gruptree.tree_from_dict(dicttree).strip() == expected_str.strip()


# --- test_grupnetroot: three cases -------------------------------------------


@pytest.mark.parametrize(
    "schstr, expected, expected_tree",
    [
        (
            """
GRUPTREE
 'OP' 'FIELD'/
/

GRUPNET
  'FIELD' 90 /
  'OP' 100 /
/
""",
            {("FIELD", None, 90.0), ("OP", "FIELD", 100.0)},
            "FIELD\n└── OP\n",
        ),
        (
            """
GRUPTREE
 'OP' 'FIELDA'/
/

GRUPNET
  'FIELDA' 90 /
  'OP' 100 /
  'FIELDB' 80 /   -- This is ignored when it is not in the GRUPTREE!
/
""",
            {("FIELDA", None, 90.0), ("OP", "FIELDA", 100.0)},
            "FIELDA\n└── OP\n",
        ),
        (
            """
GRUPTREE
 'OP' 'FIELDA'/
 'OPX' 'FIELDB' /
/

GRUPNET
  'FIELDA' 90 /
  'OP' 100 /
  'FIELDB' 80 /
/
""",
            {("FIELDB", None, 80.0), ("FIELDA", None, 90.0),
             ("OP", "FIELDA", 100.0), ("OPX", "FIELDB", None)},
            "FIELDA\n└── OP\nFIELDB\n└── OPX\n",
        ),
    ],
)
def test_grupnetroot(spark, schstr, expected, expected_tree):
    out = gruptree.df(spark, schstr, startdate=D(2000, 1, 1))
    got = set(_rows(out, "CHILD", "PARENT", "TERMINAL_PRESSURE"))
    assert got == expected
    trees = gruptree.edge_dataframe2dict(out.toPandas())
    rendered = sorted(gruptree.tree_from_dict(t) for t in trees)
    assert "".join(rendered).strip() == expected_tree.strip()


# --- test_multiple_roots ------------------------------------------------------


def test_multiple_roots_edge_dict():
    import pandas as pd

    edges = pd.DataFrame(
        [
            {"CHILD": "FIELDA", "PARENT": None},
            {"CHILD": "FIELDB", "PARENT": None},
            {"CHILD": "PLATA", "PARENT": "FIELDA"},
            {"CHILD": "PLATB", "PARENT": "FIELDB"},
        ]
    )
    assert gruptree.edge_dataframe2dict(edges) == [
        {"FIELDA": {"PLATA": {}}},
        {"FIELDB": {"PLATB": {}}},
    ]


# --- test_emptytree_strdeck ----------------------------------------------------


def test_emptytree_strdeck(spark):
    out = gruptree.df(spark, "")
    assert out.count() == 0


# --- test_tstep ------------------------------------------------------------------


def test_tstep_two_dates(spark):
    """Undated GRUPTREE followed by TSTEP: the mid-deck flush takes the
    1900-01-01 fallback and TSTEP advances a day — two distinct
    dates."""
    schstr = """
GRUPTREE
 'OPWEST' 'OP' /
 'OP' 'FIELD' /
 'FIELD' 'AREA' /
 'AREA' 'NORTHSEA' /
/

TSTEP
  1 /

WELSPECS
 'OP1' 'OPWEST' 41 125 1759.74 'OIL' 0.0 'STD' 'SHUT' 'YES'  0  'SEG' /
/
"""
    out = gruptree.df(spark, schstr)
    dates = {r["DATE"] for r in out.select("DATE").distinct().collect()}
    assert len(dates) == 2
    assert None not in dates


# --- test_branprop_nodeprop: the three snapshot cases ---------------------------


def test_branprop_changing_edges_snapshot(spark):
    schstr = """
DATES
  1 JAN 2000 /
/
GRUPTREE
 'TMPL_A' 'FIELD'/
/
BRANPROP
  'NODE_A'  'FIELD'  1 /
  'TMPL_A'  'NODE_A' 2 /
/
NODEPROP
  'FIELD'  20 /
  'TMPL_A'  2*  YES /
/
DATES
  1 FEB 2000 /
/
BRANPROP
  'NODE_B'  'FIELD'  3 /
  'TMPL_A'  'NODE_B' 4 /
/
"""
    out = gruptree.df(spark, schstr)
    got = set(_rows(out, "DATE", "CHILD", "KEYWORD", "PARENT",
                    "VFP_TABLE", "TERMINAL_PRESSURE"))
    jan, feb = D(2000, 1, 1), D(2000, 2, 1)
    assert got == {
        (jan, "FIELD", "GRUPTREE", None, None, None),
        (jan, "TMPL_A", "GRUPTREE", "FIELD", None, None),
        (jan, "FIELD", "BRANPROP", None, None, 20.0),
        (jan, "NODE_A", "BRANPROP", "FIELD", 1, None),
        (jan, "TMPL_A", "BRANPROP", "NODE_A", 2, None),
        (feb, "FIELD", "BRANPROP", None, None, 20.0),
        (feb, "NODE_A", "BRANPROP", "FIELD", 1, None),
        (feb, "NODE_B", "BRANPROP", "FIELD", 3, None),
        (feb, "TMPL_A", "BRANPROP", "NODE_B", 4, None),
    }


def test_branprop_changing_nodeprop_snapshot(spark):
    schstr = """
DATES
  1 JAN 2000 /
/
GRUPTREE
 'TMPL_A' 'FIELD'/
/
BRANPROP
  'NODE_A'  'FIELD'  /
  'TMPL_A'  'NODE_A'  /
/
NODEPROP
  'FIELD'  20 /
  'TMPL_A'  2*  YES /
/
DATES
  1 FEB 2000 /
/
NODEPROP
  'FIELD'  22  1* YES /
/
"""
    out = gruptree.df(spark, schstr)
    got = set(_rows(out, "DATE", "CHILD", "KEYWORD", "PARENT",
                    "TERMINAL_PRESSURE", "ADD_GAS_LIFT_GAS"))
    jan, feb = D(2000, 1, 1), D(2000, 2, 1)
    assert got == {
        (jan, "FIELD", "GRUPTREE", None, None, None),
        (jan, "TMPL_A", "GRUPTREE", "FIELD", None, None),
        (jan, "FIELD", "BRANPROP", None, 20.0, "NO"),
        (jan, "NODE_A", "BRANPROP", "FIELD", None, None),
        (jan, "TMPL_A", "BRANPROP", "NODE_A", None, "YES"),
        (feb, "FIELD", "BRANPROP", None, 22.0, "YES"),
        (feb, "NODE_A", "BRANPROP", "FIELD", None, None),
        (feb, "TMPL_A", "BRANPROP", "NODE_A", None, "YES"),
    }


def test_branprop_welspecs_synthetic_gruptree_edge(spark):
    """A WELSPECS group outside every tree gets a synthetic GRUPTREE
    edge to FIELD; TMPL_A's WELSPECS edge repeats per family tree but
    dedups per (DATE, CHILD, KEYWORD)."""
    schstr = """
DATES
  1 JAN 2000 /
/
GRUPTREE
 'TMPL_A' 'FIELD'/
/
BRANPROP
  'NODE_A'  'FIELD'  /
  'TMPL_A'  'NODE_A'  /
/
NODEPROP
  'FIELD'  20 /
  'TMPL_A'  2*  YES /
/
WELSPECS
  'WELL_1'  'TMPL_A' 1 1 1 OIL /
  'WELL_2'  'TMPL_B' 1 1 1 OIL /
/
DATES
  1 FEB 2000 /
/
NODEPROP
  'FIELD' 22 /
/
"""
    out = gruptree.df(spark, schstr)
    got = set(_rows(out, "DATE", "CHILD", "KEYWORD", "PARENT"))
    jan, feb = D(2000, 1, 1), D(2000, 2, 1)
    assert got == {
        (jan, "FIELD", "GRUPTREE", None),
        (jan, "TMPL_A", "GRUPTREE", "FIELD"),
        (jan, "WELL_2", "WELSPECS", "TMPL_B"),
        (jan, "TMPL_B", "GRUPTREE", "FIELD"),
        (jan, "FIELD", "BRANPROP", None),
        (jan, "NODE_A", "BRANPROP", "FIELD"),
        (jan, "TMPL_A", "BRANPROP", "NODE_A"),
        (jan, "WELL_1", "WELSPECS", "TMPL_A"),
        (feb, "FIELD", "BRANPROP", None),
        (feb, "NODE_A", "BRANPROP", "FIELD"),
        (feb, "TMPL_A", "BRANPROP", "NODE_A"),
        (feb, "WELL_1", "WELSPECS", "TMPL_A"),
    }


# --- test_prettyprint -------------------------------------------------------------


def test_prettyprint_multidate_both_families(spark):
    schstr = """
DATES
  1 JAN 2000 /
/
GRUPTREE
 'TMPL_A' 'FIELD'/
/
BRANPROP
  'NODE_A'  'FIELD'  /
  'TMPL_A'  'NODE_A'  /
/
NODEPROP
  'FIELD'  20 /
  'TMPL_A'  2*  YES /
/
WELSPECS
  'WELL_1'  'TMPL_A' 1 1 1 OIL /
  'WELL_2'  'TMPL_B' 1 1 1 OIL /
/
DATES
  1 FEB 2000 /
/
NODEPROP
  'FIELD' 22 /
/
"""
    expected = """
Date: 2000-01-01
GRUPTREE trees:
FIELD
├── TMPL_A
│   └── WELL_1
└── TMPL_B
    └── WELL_2

BRANPROP trees:
FIELD
└── NODE_A
    └── TMPL_A
        └── WELL_1


Date: 2000-02-01
BRANPROP trees:
FIELD
└── NODE_A
    └── TMPL_A
        └── WELL_1
"""
    dframe = gruptree.df(spark, schstr).toPandas()
    assert gruptree.prettyprint(dframe).strip() == expected.strip()
