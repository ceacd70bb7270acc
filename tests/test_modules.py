"""Engine-layer datatype modules: gruptree (W7), wellconnstatus (W3)."""

from __future__ import annotations

from datetime import date, datetime

from res2df_spark.modules import gruptree, wellconnstatus
from tests.conftest import rows

GRUPTREE_DECK = """
START
  1 JAN 2020 /
GRUPTREE
  'OP_GRP' 'PLATA' /
  'PLATA' 'FIELD' /
/
DATES
  1 MAR 2020 /
/
GRUPTREE
  'OP_GRP' 'PLATB' /
  'PLATB' 'FIELD' /
/
"""


def test_gruptree_snapshots(spark):
    out = gruptree.df(spark, GRUPTREE_DECK)
    got = rows(out, "DATE", "CHILD", "PARENT")
    jan, mar = date(2020, 1, 1), date(2020, 3, 1)
    # January: OP_GRP under PLATA; FIELD is the synthesized root
    assert (jan, "OP_GRP", "PLATA") in got
    assert (jan, "PLATA", "FIELD") in got
    assert (jan, "FIELD", None) in got
    # March: OP_GRP re-parented to PLATB; PLATA edge still latest-known
    assert (mar, "OP_GRP", "PLATB") in got
    assert (mar, "PLATB", "FIELD") in got
    assert (mar, "PLATA", "FIELD") in got
    assert (mar, "FIELD", None) in got


def test_gruptree_default_parent_is_field(spark):
    deck = """
START
  1 JAN 2020 /
GRUPTREE
  'G1' /
/
"""
    out = gruptree.df(spark, deck)
    got = rows(out, "CHILD", "PARENT")
    assert ("G1", "FIELD") in got
    assert ("FIELD", None) in got


def test_wellconnstatus(spark):
    d = datetime
    obs = spark.createDataFrame(
        [
            ("OP1", 1, 1, 1, d(2020, 1, 1), 0.0),
            ("OP1", 1, 1, 1, d(2020, 2, 1), 5.0),
            ("OP1", 1, 1, 1, d(2020, 3, 1), 4.0),
            ("OP1", 1, 1, 1, d(2020, 4, 1), 0.0),
            ("OP2", 2, 2, 1, d(2020, 1, 1), 3.0),
        ],
        "WELL string, I int, J int, K int, DATE timestamp, VALUE double",
    )
    out = wellconnstatus.df(obs)
    got = rows(out, "WELL", "DATE", "OP/SH")
    # reference baseline is SHUT (prev_value=0): a connection starting
    # at CPI=0 emits no leading SHUT row (wellconnstatus.py:60-66)
    assert got == [
        ("OP1", d(2020, 2, 1), "OPEN"),
        ("OP1", d(2020, 4, 1), "SHUT"),
        ("OP2", d(2020, 1, 1), "OPEN"),
    ]


WLIST_DECK = """
START
  1 JAN 2020 /
WLIST
  '*L1' 'NEW' 'OP1' 'OP2' /
/
DATES
  1 FEB 2020 /
/
WLIST
  '*L2' 'NEW' '*L1' 'WI1' /
  '*L1' 'DEL' 'OP2' /
/
DATES
  1 MAR 2020 /
/
WLIST
  '*L2' 'MOV' 'OP9' /
/
"""


def test_wlist_fold(spark):
    from res2df_spark.modules import wlist

    out = wlist.df(spark, WLIST_DECK)
    jan, feb, mar = date(2020, 1, 1), date(2020, 2, 1), date(2020, 3, 1)
    got = set(rows(out, "DATE", "NAME", "WELL"))
    # NEW (NAME is stripped of the Eclipse asterisk, reference
    # compdat.py:218-220)
    assert (jan, "L1", "OP1") in got and (jan, "L1", "OP2") in got
    # recursive NEW resolves *L1's membership at definition time
    assert (feb, "L2", "OP1") in got and (feb, "L2", "OP2") in got
    assert (feb, "L2", "WI1") in got
    # DEL removes from L1 only
    l1_feb = {w for d, n, w in got if d == feb and n == "L1"}
    assert l1_feb == {"OP1"}
    # MOV adds to L2
    l2_mar = {w for d, n, w in got if d == mar and n == "L2"}
    assert "OP9" in l2_mar


def test_compdat_complump_welopen(spark):
    from res2df_spark.modules import compdat

    deck = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 1 1 1000.0 'OIL' /
/
COMPDAT
  'OP1' 1 1 1 4 'OPEN' /
/
COMPLUMP
  'OP1' 2* 1 2 7 /
  'OP1' 2* 3 4 8 /
/
DATES
  1 APR 2020 /
/
WELOPEN
  'OP1' 'SHUT' 3* 8 8 /
/
"""
    out = compdat.df(spark, deck)
    got = rows(out.filter("DATE = DATE'2020-04-01'"), "K", "OP_SH")
    # lump 8 covers K 3-4 only
    assert got == [(3, "SHUT"), (4, "SHUT")]


def test_wellcompletiondata(spark):
    from res2df_spark.modules import wellcompletiondata

    conns = spark.createDataFrame(
        [
            ("OP1", 1, 1, 1, "OPEN", date(2020, 1, 1), 10.0),
            ("OP1", 1, 1, 2, "SHUT", date(2020, 1, 1), 20.0),
            ("OP1", 1, 1, 3, "SHUT", date(2020, 1, 1), 30.0),
            ("A1", 1, 1, 1, "OPEN", date(2020, 1, 1), 5.0),
        ],
        "WELL string, I int, J int, K int, OP_SH string, DATE date, KH double",
    )
    zonemap = spark.createDataFrame(
        [(1, "UPPER"), (2, "UPPER"), (3, "LOWER")], "K int, ZONE string"
    )
    out = wellcompletiondata.df(conns, zonemap, excl_well_prefix="A")
    got = rows(out, "WELL", "ZONE", "OP/SH", "KH")
    # UPPER has one open conn → open, KH only from the open one;
    # LOWER all shut → closed, KH 0; well A1 excluded by prefix
    assert got == [
        ("OP1", "LOWER", "SHUT", 0.0),
        ("OP1", "UPPER", "OPEN", 10.0),
    ]


def test_rft_seg_topology(spark):
    from res2df_spark.modules.rft import seg_topology

    d = date(2020, 1, 1)
    seg = spark.createDataFrame(
        [
            # tubing: 1←2, branch: 1←3; leaf segs 2,3; junction at 1
            ("OP1", d, 1, None, 1000.0),
            ("OP1", d, 2, 1, 1010.0),
            ("OP1", d, 3, 1, 1020.0),
            # lonely segment in another well
            ("OP2", d, 7, None, 900.0),
        ],
        "WELL string, DATE date, SEGIDX int, SEGNXT int, DEPTH double",
    )
    out = seg_topology(seg)
    got = {r.SEGIDX: r for r in out.filter("WELL = 'OP1'").collect()}
    assert got[2].LEAF and got[3].LEAF and not got[1].LEAF
    assert got[1].JUNCTION and not got[2].JUNCTION
    assert got[2].NXT_DEPTH == 1000.0  # next-segment payload attached
    lonely = out.filter("WELL = 'OP2'").first()
    assert lonely.LONELY


# ---------------------------------------------------------------------------
# BRANPROP / NODEPROP / GRUPNET / WELSPECS tree families — cases modeled
# on the reference's tests/test_gruptree.py::test_branprop_nodeprop and
# test_grupnetdf.
# ---------------------------------------------------------------------------


def test_gruptree_keyword_column_and_welspecs(spark):
    deck = """
START
  1 JAN 2000 /
GRUPTREE
 'OPS' 'FIELD' /
/
WELSPECS
 'OP1' 'OPS' 1 1 1000.0 'OIL' /
/
"""
    out = gruptree.df(spark, deck)
    got = set(rows(out, "CHILD", "KEYWORD", "PARENT"))
    assert ("FIELD", "GRUPTREE", None) in got
    assert ("OP1", "WELSPECS", "OPS") in got
    assert ("OPS", "GRUPTREE", "FIELD") in got
    assert len(got) == 3


def test_grupnet_terminal_pressure(spark):
    deck = """
START
  1 JAN 2000 /
GRUPTREE
 'OPWEST' 'OP' /
 'OP' 'FIELD' /
 'FIELD' 'AREA' /
/
GRUPNET
  'FIELD' 90 /
  'OPWEST' 100 /
/
"""
    out = gruptree.df(spark, deck)
    tp = {r[0]: r[1] for r in rows(out, "CHILD", "TERMINAL_PRESSURE")}
    assert tp["FIELD"] == 90.0
    assert tp["OPWEST"] == 100.0
    assert tp["OP"] is None


def test_branprop_changing_edges(spark):
    deck = """
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
    out = gruptree.df(spark, deck)
    got = set(rows(out, "DATE", "CHILD", "KEYWORD", "PARENT", "VFP_TABLE",
                   "TERMINAL_PRESSURE"))
    jan, feb = date(2000, 1, 1), date(2000, 2, 1)
    expected = {
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
    assert got == expected


def test_nodeprop_update_and_defaults(spark):
    deck = """
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
    out = gruptree.df(spark, deck)
    jan, feb = date(2000, 1, 1), date(2000, 2, 1)
    got = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in rows(out, "DATE", "CHILD", "KEYWORD", "TERMINAL_PRESSURE",
                      "ADD_GAS_LIFT_GAS")
    }
    assert got[(jan, "FIELD", "BRANPROP")] == (20.0, "NO")   # schema default
    assert got[(jan, "TMPL_A", "BRANPROP")] == (None, "YES")
    assert got[(feb, "FIELD", "BRANPROP")] == (22.0, "YES")  # latest record wins
    assert got[(feb, "TMPL_A", "BRANPROP")] == (None, "YES")
    # only the BRANPROP family re-dumps in February
    assert (feb, "TMPL_A", "GRUPTREE") not in got


def test_welspecs_both_trees_and_field_graft(spark):
    deck = """
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
  'WELL_1'  'TMPL_A' 1 1 1 'OIL' /
  'WELL_2'  'TMPL_B' 1 1 1 'OIL' /
/
DATES
  1 FEB 2000 /
/
NODEPROP
  'FIELD' 22 /
/
"""
    out = gruptree.df(spark, deck)
    jan, feb = date(2000, 1, 1), date(2000, 2, 1)
    got = set(rows(out, "DATE", "CHILD", "KEYWORD", "PARENT"))
    expected = {
        (jan, "FIELD", "GRUPTREE", None),
        (jan, "TMPL_A", "GRUPTREE", "FIELD"),
        (jan, "WELL_2", "WELSPECS", "TMPL_B"),
        (jan, "TMPL_B", "GRUPTREE", "FIELD"),   # graft: parent not in tree
        (jan, "FIELD", "BRANPROP", None),
        (jan, "NODE_A", "BRANPROP", "FIELD"),
        (jan, "TMPL_A", "BRANPROP", "NODE_A"),
        (jan, "WELL_1", "WELSPECS", "TMPL_A"),  # deduped across families
        (feb, "FIELD", "BRANPROP", None),
        (feb, "NODE_A", "BRANPROP", "FIELD"),
        (feb, "TMPL_A", "BRANPROP", "NODE_A"),
        (feb, "WELL_1", "WELSPECS", "TMPL_A"),
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Ported reference cases: tests/test_gruptree.py::test_grupnetroot,
# test_multiple_roots, test_tstep, test_edge_dataframe2dict,
# test_prettyprint (ASCII rendering without treelib).
# ---------------------------------------------------------------------------


def test_grupnet_root_pressure(spark):
    """Root node carries its GRUPNET terminal pressure with NULL parent
    (reference test_grupnetroot case 1)."""
    deck = """
GRUPTREE
 'OP' 'FIELD'/
/

GRUPNET
  'FIELD' 90 /
  'OP' 100 /
/
"""
    out = gruptree.df(spark, deck, startdate=date(2000, 1, 1))
    got = {
        (r["CHILD"], r["PARENT"]): r["TERMINAL_PRESSURE"]
        for r in out.collect()
    }
    assert got[("FIELD", None)] == 90.0
    assert got[("OP", "FIELD")] == 100.0


def test_grupnet_pressure_outside_tree_ignored(spark):
    """GRUPNET entries for nodes not in the GRUPTREE are dropped
    (reference test_grupnetroot case 2: 'FIELDB' 80 ignored)."""
    deck = """
GRUPTREE
 'OP' 'FIELDA'/
/

GRUPNET
  'FIELDA' 90 /
  'OP' 100 /
  'FIELDB' 80 /
/
"""
    out = gruptree.df(spark, deck, startdate=date(2000, 1, 1))
    got = {r["CHILD"]: (r["PARENT"], r["TERMINAL_PRESSURE"]) for r in out.collect()}
    assert "FIELDB" not in got
    assert got["FIELDA"] == (None, 90.0)
    assert got["OP"] == ("FIELDA", 100.0)


def test_grupnet_multiple_roots(spark):
    """Two disjoint trees; each root carries its own pressure
    (reference test_grupnetroot case 3)."""
    deck = """
GRUPTREE
 'OP' 'FIELDA'/
 'OPX' 'FIELDB' /
/

GRUPNET
  'FIELDA' 90 /
  'OP' 100 /
  'FIELDB' 80 /
/
"""
    out = gruptree.df(spark, deck, startdate=date(2000, 1, 1))
    got = {r["CHILD"]: (r["PARENT"], r["TERMINAL_PRESSURE"]) for r in out.collect()}
    assert got["FIELDA"] == (None, 90.0)
    assert got["FIELDB"] == (None, 80.0)
    assert got["OP"] == ("FIELDA", 100.0)
    assert got["OPX"] == ("FIELDB", None)


def test_gruptree_tstep_before_dates(spark):
    """TSTEP with no prior START starts the clock at the reference's
    1900-01-01 fallback — two distinct dates in the output (reference
    test_tstep)."""
    deck = """
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
    out = gruptree.df(spark, deck, startdate=date(1900, 1, 1))
    dates = {r["DATE"] for r in out.select("DATE").distinct().collect()}
    assert dates == {date(1900, 1, 1), date(1900, 1, 2)}


def test_edge_dataframe2dict():
    import pandas as pd

    edges = pd.DataFrame(
        [
            {"CHILD": "FIELDA", "PARENT": None},
            {"CHILD": "FIELDB", "PARENT": None},
            {"CHILD": "PLATA", "PARENT": "FIELDA"},
            {"CHILD": "PLATB", "PARENT": "FIELDB"},
        ]
    )
    answer = [{"FIELDA": {"PLATA": {}}}, {"FIELDB": {"PLATB": {}}}]
    assert gruptree.edge_dataframe2dict(edges) == answer
    # roots may be omitted; order must not matter
    assert gruptree.edge_dataframe2dict(edges.iloc[[3, 2]]) == answer
    assert gruptree.edge_dataframe2dict(pd.DataFrame()) == [{}]
    # chains nest
    chain = pd.DataFrame(
        [{"PARENT": "A", "CHILD": "B"}, {"PARENT": "B", "CHILD": "C"}]
    )
    assert gruptree.edge_dataframe2dict(chain) == [{"A": {"B": {"C": {}}}}]
    # multiple dates rejected
    import pytest

    two_dates = pd.DataFrame(
        [
            {"PARENT": "A", "CHILD": "B", "DATE": "2000-01-01"},
            {"PARENT": "A", "CHILD": "B", "DATE": "2040-01-01"},
        ]
    )
    with pytest.raises(ValueError):
        gruptree.edge_dataframe2dict(two_dates)


def test_tree_from_dict_render():
    import pytest

    assert gruptree.tree_from_dict({}) == ""
    assert gruptree.tree_from_dict({"FIELD": {"OP": {}}}) == "FIELD\n└── OP\n"
    got = gruptree.tree_from_dict({"FIELD": {"OP": {"OP_1": {}}, "WI": {}}})
    assert got == "FIELD\n├── OP\n│   └── OP_1\n└── WI\n"
    with pytest.raises(ValueError, match="single tree"):
        gruptree.tree_from_dict({"foo": {}, "bar": {}})


def test_prettyprint(spark):
    out = gruptree.df(spark, GRUPTREE_DECK).toPandas()
    text = gruptree.prettyprint(out)
    assert "Date: 2020-01-01" in text
    assert "Date: 2020-03-01" in text
    assert "GRUPTREE trees:" in text
    assert "FIELD" in text and "└── " in text


# ---------------------------------------------------------------------------
# RFT binary-layer ICD split / CON⋈ICD⋈SEG merge (reference rft.py:196-460)
# ---------------------------------------------------------------------------


def _multiseg_fixture(spark):
    from datetime import date as _d

    # tubing branch 1: 3 ← 2 ← 1 (wellhead); ICD branches 2 and 3 are
    # single leaf segments feeding tubing segs 3 and 2 respectively
    seg = spark.createDataFrame(
        [
            ("OP1", _d(2020, 1, 1), 1, None, 1, 1500.0),
            ("OP1", _d(2020, 1, 1), 2, 1, 1, 1550.0),
            ("OP1", _d(2020, 1, 1), 3, 2, 1, 1600.0),
            ("OP1", _d(2020, 1, 1), 10, 3, 2, 1601.0),
            ("OP1", _d(2020, 1, 1), 11, 2, 3, 1551.0),
        ],
        "WELL string, DATE date, SEGIDX int, SEGNXT int, SEGBRNO int, SEGDEPTH double",
    )
    con = spark.createDataFrame(
        [
            ("OP1", _d(2020, 1, 1), 10, 250.0),
            ("OP1", _d(2020, 1, 1), 11, 240.0),
        ],
        "WELL string, DATE date, CONSEGNO int, CONPRES double",
    )
    return seg, con


def test_split_seg_icd(spark):
    from res2df_spark.modules import rft

    seg, _ = _multiseg_fixture(spark)
    tubing, icd = rft.split_seg_icd(seg)
    assert sorted(r.SEGIDX for r in tubing.collect()) == [1, 2, 3]
    got_icd = {r.ICD_SEGIDX: r for r in icd.collect()}
    assert set(got_icd) == {10, 11}
    assert got_icd[10].ICD_SEGNXT == 3 and got_icd[11].ICD_SEGNXT == 2
    assert all(c.startswith("ICD_") or c in ("WELL", "DATE") for c in icd.columns)


def test_split_seg_icd_no_icd(spark):
    from res2df_spark.modules import rft

    seg, _ = _multiseg_fixture(spark)
    plain = seg.filter("SEGIDX < 10")
    tubing, icd = rft.split_seg_icd(plain)
    assert tubing.count() == 3 and icd.count() == 0


def test_merge_icd_seg_conseg(spark):
    from res2df_spark.modules import rft

    seg, con = _multiseg_fixture(spark)
    tubing, icd = rft.split_seg_icd(seg)
    out = rft.merge_icd_seg_conseg(con, tubing, icd)
    got = {r.CONSEGNO: r for r in out.collect()}
    # each connection carries its ICD segment and the tubing segment fed
    assert got[10].ICD_SEGIDX == 10 and got[10].SEGIDX == 3
    assert got[11].ICD_SEGIDX == 11 and got[11].SEGIDX == 2
    assert got[10].SEGDEPTH == 1600.0 and got[10].ICD_SEGDEPTH == 1601.0


def test_merge_conseg_without_icd(spark):
    from res2df_spark.modules import rft

    seg, _ = _multiseg_fixture(spark)
    from datetime import date as _d

    plain_seg = seg.filter("SEGIDX < 10")
    tubing, icd = rft.split_seg_icd(plain_seg)
    con = spark.createDataFrame(
        [("OP1", _d(2020, 1, 1), 3, 250.0)],
        "WELL string, DATE date, CONSEGNO int, CONPRES double",
    )
    out = rft.merge_icd_seg_conseg(con, tubing, icd)
    rows_ = out.collect()
    assert len(rows_) == 1 and rows_[0].SEGIDX == 3
    # non-multiseg well: pass-through
    assert rft.merge_icd_seg_conseg(con, None, None) is con


def test_seg2dicttree_and_pretty_print(spark):
    from res2df_spark.modules import rft

    seg, _ = _multiseg_fixture(spark)
    tree = rft.seg2dicttree(seg.collect())
    assert tree == {1: {2: {3: {10: {}}, 11: {}}}}
    txt = rft.pretty_print_well(seg.collect())
    assert txt.splitlines()[0] == "1"
    assert "└── 11" in txt or "├── 11" in txt
    # single segment, no edges
    one = [r for r in seg.collect() if r.SEGIDX == 1]
    assert rft.seg2dicttree(one) == {1: {}}
    assert rft.seg2dicttree([]) == {}


def test_seg_topology_upstream_orientation(spark):
    """attach='upstream' reproduces the reference's merge orientation:
    one row per upstream partner, junctions fan out."""
    from datetime import date as _d

    from res2df_spark.modules import rft

    d = _d(2020, 1, 1)
    seg = spark.createDataFrame(
        [("W", d, 1, None, 1000.0), ("W", d, 2, 1, 1010.0),
         ("W", d, 3, 1, 1020.0), ("W", d, 4, 2, 1030.0)],
        "WELL string, DATE date, SEGIDX int, SEGNXT int, DEPTH double",
    )
    out = rft.seg_topology(seg, attach="upstream").collect()
    # segment 1 is a junction (2 and 3 point at it) → two rows
    ones = sorted(r.UPSTREAM_SEGIDX for r in out if r.SEGIDX == 1)
    assert ones == [2, 3]
    assert len(out) == 5  # 4 segments + 1 junction fan-out row
    got4 = [r for r in out if r.SEGIDX == 4][0]
    assert got4.UPSTREAM_SEGIDX is None and got4.LEAF


def test_seg2dicttree_multiple_edgeless_roots(spark):
    """r8 parity fix: with NO edges the reference returns ONE root —
    the lowest SEGIDX (rft.py:300-302, sorted seg_data's first row) —
    not one root per segment (the pre-r8 behavior this test used to
    pin)."""
    from res2df_spark.modules import rft

    rows_ = [{"SEGIDX": 1, "SEGNXT": None}, {"SEGIDX": 2, "SEGNXT": None}]
    import pandas as pd

    assert rft.seg2dicttree(pd.DataFrame(rows_)) == {1: {}}


def test_gruptree_reparent_keeps_abandoned_parent_as_root(spark):
    """Reference parity (gruptree.py:73-79,135,182): edges accumulate by
    (child, parent) pair, so after a reparent the abandoned parent stays
    in the tree as a root row; only the child's own row dedups to the
    latest parent."""
    deck = """
START
  1 JAN 2020 /
GRUPTREE
  'G1' 'PLATA' /
/
DATES
  1 MAR 2020 /
/
GRUPTREE
  'G1' 'PLATB' /
/
"""
    out = gruptree.df(spark, deck)
    got = rows(out, "DATE", "CHILD", "PARENT")
    mar = date(2020, 3, 1)
    assert (mar, "G1", "PLATB") in got       # latest declaration wins
    assert (mar, "G1", "PLATA") not in got   # per-child dedup
    assert (mar, "PLATA", None) in got       # abandoned parent stays a root
    assert (mar, "PLATB", None) in got


def test_wlist_del_treats_starred_arg_as_literal(spark):
    """Reference parity (compdat.py:584-602): recursive *LIST arguments
    expand only for NEW/ADD; a '*B' token in DEL is a literal that
    matches no well — a no-op, not an expansion or an error."""
    from res2df_spark.modules import wlist

    deck = """
START
  1 JAN 2020 /
WLIST
  '*A' 'NEW' 'W1' 'W2' 'W3' /
  '*B' 'NEW' 'W3' /
  '*A' 'DEL' '*B' /
  '*C' 'DEL' '*UNDEF' /
/
"""
    # '*C' DEL on an undefined LIST NAME still raises (ADD/DEL need the
    # target list) — but the starred ARGUMENT must not
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not exist"):
        wlist.df(spark, deck).collect()
    deck_ok = deck.replace("  '*C' 'DEL' '*UNDEF' /\n", "")
    out = wlist.df(spark, deck_ok)
    a = {r["WELL"] for r in out.collect() if r["NAME"] == "A"}
    assert a == {"W1", "W2", "W3"}  # W3 NOT removed: '*B' was literal
