"""The reference's RFT segment-topology corpus, ported
(/root/reference/tests/test_rft.py:65-470): minimal and branched
wells, the four ICD-untangling layouts (including the documented
topological ambiguity of a single-segment tubing with one ICD), the
seg2dicttree matrix, and the add_extras matrix.

The reference operates on per-well pandas frames; this engine's
functions take keyed Spark frames (J7/J8), so each fixture carries a
constant WELL key and ``keys=("WELL",)``.  Binary RFT file cases run
through sources/eclbin's survey grouping elsewhere."""
import pytest

from res2df_spark.modules import rft


def _seg(spark, segidx, segnxt, segbrno):
    rows = [("A", i, n, b) for i, n, b in zip(segidx, segnxt, segbrno)]
    return spark.createDataFrame(
        rows, "WELL string, SEGIDX int, SEGNXT int, SEGBRNO int"
    )


def _con(spark, consegno, pressure, conpres):
    rows = [("A", c, float(p), float(cp))
            for c, p, cp in zip(consegno, pressure, conpres)]
    return spark.createDataFrame(
        rows, "WELL string, CONSEGNO int, PRESSURE double, CONPRES double"
    )


KEYS = ("WELL",)


def test_minimal_well(spark):
    one_seg = _seg(spark, [1], [None], [1]).withColumn(
        "SEGPRES", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(195.8)
    )
    topo = rft.seg_topology(one_seg, keys=KEYS)
    rows = topo.collect()
    assert len(rows) == 1
    assert rows[0]["LEAF"]
    tubing, icd = rft.split_seg_icd(one_seg, keys=KEYS)
    assert icd.count() == 0
    con = _con(spark, [1], [200.1], [196.0])
    con_seg = rft.merge_icd_seg_conseg(con, tubing, keys=KEYS)
    assert con_seg.count() == 1
    assert "CONSEGNO" in con_seg.columns and "SEGIDX" in con_seg.columns
    out = rft.add_extras(con_seg).first()
    assert out["COMPLETION_DP"] == pytest.approx(196.0 - 195.8)
    assert out["DRAWDOWN"] == pytest.approx(200.1 - 196.0)
    assert rft.seg2dicttree(one_seg.toPandas()) == {1: {}}


def test_minimal_branched_well(spark):
    two_branch = _seg(spark, [1, 2, 3], [None, 1, 1], [1, 1, 2])
    topo = rft.seg_topology(two_branch, keys=KEYS, attach="upstream")
    rows = topo.collect()
    # one extra row: the junction fans out per upstream segment
    assert len(rows) == 4
    assert sum(1 for r in rows if r["LEAF"]) == 2
    ups = {r["UPSTREAM_SEGIDX"] for r in rows if r["SEGIDX"] == 1}
    assert ups == {2, 3}
    assert rft.seg2dicttree(two_branch.toPandas()) == {1: {2: {}, 3: {}}}
    con = _con(spark, [2, 3], [301, 302], [291, 292])
    tubing, icd = rft.split_seg_icd(two_branch, keys=KEYS)
    con_seg = rft.merge_icd_seg_conseg(con, tubing, icd, keys=KEYS)
    # the junction segment has no reservoir connection: not in merge
    assert con_seg.count() == 2


def test_single_branch_icd(spark):
    wellseg = _seg(spark, [1, 2, 3, 4, 5], [None, 1, 2, 2, 3],
                   [1, 1, 1, 2, 3])
    con = _con(spark, [4, 5], [301, 302], [291, 292])
    tubing, icd = rft.split_seg_icd(wellseg, keys=KEYS)
    got = icd.orderBy("ICD_SEGIDX").collect()
    assert len(got) == 2
    assert [r["ICD_SEGIDX"] for r in got] == [4, 5]
    assert [r["ICD_SEGBRNO"] for r in got] == [2, 3]
    con_seg = rft.merge_icd_seg_conseg(con, tubing, icd, keys=KEYS)
    assert con_seg.count() == 2
    out = rft.add_extras(con_seg)
    assert [r["DRAWDOWN"] for r in out.collect()] == [10.0, 10.0]


def test_single_branch_partly_icd(spark):
    """One ICD on one of two connections is topologically identical to
    a two-branch well — the documented ambiguity resolves to NO ICDs
    (the tubing-of-one-segment assumption)."""
    wellseg = _seg(spark, [1, 2, 3, 4], [None, 1, 2, 2], [1, 1, 1, 2])
    con = _con(spark, [4, 3], [301, 302], [291, 292])
    tubing, icd = rft.split_seg_icd(wellseg, keys=KEYS)
    assert icd.count() == 0
    con_seg = rft.merge_icd_seg_conseg(con, tubing, icd, keys=KEYS)
    assert con_seg.count() == 2
    out = rft.add_extras(con_seg)
    assert sorted(r["DRAWDOWN"] for r in out.collect()) == [10.0, 10.0]


def test_branched_icd_well(spark):
    wellseg = _seg(spark, [1, 2, 3, 4, 5], [None, 1, 1, 2, 3],
                   [1, 1, 2, 3, 4])
    con = _con(spark, [4, 5], [301, 302], [291, 292])
    tubing, icd = rft.split_seg_icd(wellseg, keys=KEYS)
    got = icd.orderBy("ICD_SEGIDX").collect()
    assert len(got) == 2
    assert [r["ICD_SEGIDX"] for r in got] == [4, 5]
    assert [r["ICD_SEGBRNO"] for r in got] == [3, 4]
    con_seg = rft.merge_icd_seg_conseg(con, tubing, icd, keys=KEYS)
    assert con_seg.count() == 2
    out = rft.add_extras(con_seg)
    assert [r["DRAWDOWN"] for r in out.collect()] == [10.0, 10.0]


def test_longer_branched_icd_well(spark):
    """Two laterals, two connections each, one ICD per connection; the
    segment row order is shuffled (must not matter)."""
    segidx = [5, 9, 1, 4, 7, 2, 8, 3, 6]
    by_idx = {1: (None, 1), 2: (1, 1), 3: (2, 1), 4: (2, 3), 5: (3, 4),
              6: (1, 2), 7: (6, 2), 8: (6, 5), 9: (7, 6)}
    wellseg = _seg(
        spark, segidx,
        [by_idx[i][0] for i in segidx],
        [by_idx[i][1] for i in segidx],
    )
    topo = rft.seg_topology(wellseg, keys=KEYS)
    rows = topo.collect()
    assert sum(1 for r in rows if r["LEAF"]) == 4
    tubing, icd = rft.split_seg_icd(wellseg, keys=KEYS)
    got = icd.collect()
    assert len(got) == 4
    assert {r["ICD_SEGIDX"] for r in got} == {4, 5, 8, 9}
    assert {r["ICD_SEGBRNO"] for r in got} == {3, 4, 5, 6}
    con = _con(spark, [4, 5, 8, 9], [301, 302, 401, 402],
               [291, 292, 392, 393])
    con_seg = rft.merge_icd_seg_conseg(con, tubing, icd, keys=KEYS)
    assert con_seg.count() == 4
    out = rft.add_extras(con_seg)
    drawdowns = sorted(r["DRAWDOWN"] for r in out.collect())
    assert drawdowns == [9.0, 9.0, 10.0, 10.0]


# --- seg2dicttree matrix ------------------------------------------------------


def test_seg2dicttree_matrix():
    import pandas as pd

    assert rft.seg2dicttree(pd.DataFrame()) == {}
    assert rft.seg2dicttree(
        pd.DataFrame({"SEGIDX": [1], "SEGNXT": [None], "SEGBRNO": [1]})
    ) == {1: {}}
    assert rft.seg2dicttree(
        pd.DataFrame(
            {"SEGIDX": [1, 2, 3], "SEGNXT": [None, 1, 1],
             "SEGBRNO": [1, 1, 2]}
        )
    ) == {1: {2: {}, 3: {}}}


# --- add_extras matrix --------------------------------------------------------


def _extras(spark, schema, row):
    df = spark.createDataFrame([row], schema)
    return rft.add_extras(df).first()


def test_add_extras_completion_dp(spark):
    r = _extras(spark, "CONPRES double, SEGPRES double", (30.0, 20.0))
    assert r["COMPLETION_DP"] == 10.0
    assert r["DRAWDOWN"] == 0.0


def test_add_extras_drawdown_conbpres(spark):
    r = _extras(spark, "CONPRES double, PRESSURE double", (30.0, 40.0))
    assert r["DRAWDOWN"] == 10.0
    assert r["CONBPRES"] == 40.0


def test_add_extras_conmd_length(spark):
    r = _extras(spark, "CONLENEN double, CONLENST double", (4.0, 3.0))
    assert r["CONMD"] == 3.5
    assert r["CONLENTH"] == 1.0
    assert r["DRAWDOWN"] == 0.0


@pytest.mark.parametrize("rate", ["CONORAT", "CONWRAT", "CONGRAT"])
def test_add_extras_scaled_rates(spark, rate):
    # a PRE-EXISTING CONLENTH column also triggers the scaling
    r = _extras(spark, f"{rate} double, CONLENTH double", (400.0, 2.0))
    assert r[rate + "S"] == 200.0
    assert r["DRAWDOWN"] == 0.0
