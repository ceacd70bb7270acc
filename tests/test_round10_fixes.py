"""Round-10 additions: J11 use_wellconnstatus merge, KH unit metadata,
trans composition (addnnc/coords/group), and CLI thin flags.

Merge semantics mirror the reference's _merge_compdat_and_connstatus
(/root/reference/src/res2df/wellcompletiondata.py:168-215)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


D1, D2 = date(2020, 1, 1), date(2020, 2, 1)


def _conns(spark):
    return spark.createDataFrame(
        [("OP1", 1, 1, 1, "SHUT", D1, 10.0), ("OP1", 1, 1, 1, "OPEN", D2, 12.0),
         ("OP1", 1, 1, 2, "OPEN", D1, 20.0), ("OP2", 2, 2, 1, "OPEN", D1, 7.0),
         ("OP3", 3, 3, 1, "OPEN", D1, 9.0)],
        "WELL string, I int, J int, K int, OP_SH string, DATE date, KH double",
    )


def _connstatus(spark):
    return spark.createDataFrame(
        [("OP1", 1, 1, 1, D1, "OPEN"), ("OP1", 1, 1, 1, D2, "SHUT"),
         ("OP1", 1, 1, 2, D2, "OPEN"), ("OP3", 3, 3, 2, D1, "OPEN")],
        "WELL string, I int, J int, K int, DATE date, `OP/SH` string",
    )


def _zmap(spark):
    return spark.createDataFrame([(1, "UPPER"), (2, "LOWER")], "K int, ZONE string")


class TestMergeConnstatus:
    def test_keep_first_compdat_match(self, spark):
        """Several compdat rows for one connection: the FIRST (earliest
        DATE) wins for every status event — reference drop_duplicates
        keep='first' (wellcompletiondata.py:204-207)."""
        from res2df_spark.modules.wellcompletiondata import merge_connstatus

        zoned = _conns(spark).join(_zmap(spark), "K", "left")
        out = merge_connstatus(_connstatus(spark), zoned)
        op1 = {
            (r["DATE"], r["K"]): r["KH"]
            for r in out.filter(F.col("WELL") == "OP1").collect()
        }
        # both OP1 (1,1,1) events carry the 2020-01 row's KH=10, not 12
        assert op1[(D1, 1)] == 10.0 and op1[(D2, 1)] == 10.0

    def test_fallback_and_ignore_quirks(self, spark):
        """OP2 (absent from connstatus) keeps compdat rows; OP3's
        compdat rows are IGNORED because OP3 has connstatus rows;
        unmatched connstatus conn gets KH=0 (fillna)."""
        from res2df_spark.modules.wellcompletiondata import merge_connstatus

        zoned = _conns(spark).join(_zmap(spark), "K", "left")
        out = merge_connstatus(_connstatus(spark), zoned).collect()
        by_well = {}
        for r in out:
            by_well.setdefault(r["WELL"], []).append(r)
        assert len(by_well["OP2"]) == 1 and by_well["OP2"][0]["KH"] == 7.0
        # OP3: only the connstatus conn (3,3,2) — compdat (3,3,1) ignored
        assert [(r["I"], r["J"], r["K"]) for r in by_well["OP3"]] == [(3, 3, 2)]
        assert by_well["OP3"][0]["KH"] == 0.0 and by_well["OP3"][0]["ZONE"] is None

    def test_df_connstatus_aggregation(self, spark):
        """End-to-end df(connstatus=…): NULL-ZONE rows dropped like
        pandas groupby NaN keys; zone OPEN iff any conn open."""
        from res2df_spark.modules import wellcompletiondata

        out = wellcompletiondata.df(
            _conns(spark), _zmap(spark), connstatus=_connstatus(spark)
        )
        got = rows(out, "WELL", "ZONE", "DATE", "OP/SH", "KH")
        assert got == sorted([
            ("OP1", "UPPER", D1, "OPEN", 10.0),
            ("OP1", "UPPER", D2, "SHUT", 0.0),
            ("OP1", "LOWER", D2, "OPEN", 20.0),
            ("OP2", "UPPER", D1, "OPEN", 7.0),
        ])

    def test_plain_path_unchanged(self, spark):
        from res2df_spark.modules import wellcompletiondata

        out = wellcompletiondata.df(_conns(spark), _zmap(spark))
        assert out.filter(
            (F.col("WELL") == "OP1") & (F.col("ZONE") == "UPPER")
            & (F.col("DATE") == F.lit(str(D1)))
        ).first()["OP/SH"] == "SHUT"


class TestKhUnitMetadata:
    @pytest.mark.parametrize(
        "kw,unit",
        [("METRIC", "mDm"), ("FIELD", "mDft"), ("LAB", "mDcm"),
         ("PVT-M", "mDm")],
    )
    def test_detect_unit_system(self, kw, unit):
        from res2df_spark.modules.wellcompletiondata import (
            KH_UNITS, detect_unit_system,
        )

        deck = f"RUNSPEC\n{kw}\nSCHEDULE\n"
        assert KH_UNITS[detect_unit_system(deck)] == unit

    def test_default_is_metric(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        assert detect_unit_system("RUNSPEC\nTITLE\n 'FIELD CASE' /\n") == "METRIC"

    def test_metadata_attached(self, spark):
        from res2df_spark.modules import wellcompletiondata

        out = wellcompletiondata.df(_conns(spark), _zmap(spark))
        out = wellcompletiondata.attach_kh_metadata(out, "FIELD")
        meta = {f.name: f.metadata for f in out.schema}
        assert meta["KH"] == {"unit": "mDft"}

    def test_arrow_table_carries_metadata(self, spark):
        from res2df_spark.modules import wellcompletiondata
        from res2df_spark.sinks.writers import to_arrow_table

        out = wellcompletiondata.attach_kh_metadata(
            wellcompletiondata.df(_conns(spark), _zmap(spark)), "METRIC"
        )
        table = to_arrow_table(out)
        assert table.schema.field("KH").metadata == {b"unit": b"mDm"}


class TestTransFull:
    def _grid(self, spark):
        return spark.createDataFrame(
            [(1, 1, 1, 100.0, 200.0, 10.0, 1, 5.0, 0.0, 2.0),
             (2, 1, 1, 200.0, 200.0, 10.0, 2, 0.0, 0.0, 3.0),
             (1, 1, 2, 100.0, 200.0, 20.0, 1, 4.0, None, 0.0),
             (2, 1, 2, 200.0, 200.0, 22.0, 2, 0.0, 0.0, 0.0)],
            "I int, J int, K int, X double, Y double, Z double, FIPNUM int, "
            "TRANX double, TRANY double, TRANZ double",
        )

    def _nnc(self, spark):
        return spark.createDataFrame(
            [(1, 1, 1, 2, 1, 2, 0.7)],
            "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRAN double",
        )

    def test_onlyk_onlyij(self, spark):
        from res2df_spark.modules.grid import trans_full

        g = self._grid(spark)
        only_k = trans_full(g, onlykdir=True)
        assert {r["DIR"] for r in only_k.collect()} == {"K"}
        only_ij = trans_full(g, onlyijdir=True)
        assert {r["DIR"] for r in only_ij.collect()} == {"I"}
        with pytest.warns(RuntimeWarning):
            both = trans_full(g, onlykdir=True, onlyijdir=True)
        assert both.count() == 0

    def test_nnc_union_dir_tag(self, spark):
        from res2df_spark.modules.grid import trans_full

        out = trans_full(self._grid(spark), nnc=self._nnc(spark))
        dirs = [r["DIR"] for r in out.collect()]
        assert dirs.count("NNC") == 1 and len(dirs) == 5

    def test_boundaryfilter_needs_one_vector(self, spark):
        from res2df_spark.modules.grid import trans_full

        with pytest.raises(ValueError):
            trans_full(self._grid(spark), boundaryfilter=True)
        with pytest.raises(ValueError):
            trans_full(self._grid(spark), group=True,
                       vectors=["FIPNUM", "EQLNUM"])

    def test_missing_vector_warns(self, spark):
        from res2df_spark.modules.grid import trans_full

        with pytest.warns(RuntimeWarning):
            out = trans_full(self._grid(spark), vectors=["NOSUCH", "FIPNUM"])
        assert "FIPNUM1" in out.columns and "NOSUCH1" not in out.columns

    def test_group_reinstates_sorted_strings(self, spark):
        from res2df_spark.modules.grid import trans_full

        out = trans_full(
            self._grid(spark), vectors=["FIPNUM"], group=True,
            nnc=self._nnc(spark),
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["FIPNUMPAIR"] == "1-2"
        assert (r["FIPNUM1"], r["FIPNUM2"]) == ("1", "2")
        assert abs(r["TRAN"] - 9.7) < 1e-9

    def test_coords_midpoint_and_distance(self, spark):
        from res2df_spark.modules.grid import trans_full

        out = trans_full(self._grid(spark), coords=True, onlykdir=True)
        r = {(x["I1"], x["K1"]): x for x in out.collect()}
        assert r[(1, 1)]["Z"] == 15.0 and r[(1, 1)]["DZ"] == 10.0
        assert r[(2, 1)]["DX"] == 0.0


import os

_EIGHT = "/root/reference/tests/data/eightcells"


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
class TestRound10Cli:
    def test_trans_composition_flags(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["trans", f"{_EIGHT}/EIGHTCELLS", "--nnc", "--coords",
                     "--vectors", "PORO", "-o", "-"]) == 0
        header = capsys.readouterr().out.splitlines()[0].split(",")
        assert {"DIR", "TRAN", "PORO1", "PORO2", "X", "DX"} <= set(header)

    def test_trans_group_flag(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["trans", f"{_EIGHT}/EIGHTCELLS", "--group",
                     "--vectors", "FIPNUM", "-o", "-"]) == 0
        lines = capsys.readouterr().out.splitlines()
        assert "FIPNUMPAIR" in lines[0].split(",")

    def test_trans_onlyk(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["trans", f"{_EIGHT}/EIGHTCELLS", "--onlyk", "-o", "-"]) == 0
        lines = capsys.readouterr().out.splitlines()
        dir_idx = lines[0].split(",").index("DIR")
        assert {ln.split(",")[dir_idx] for ln in lines[1:]} == {"K"}

    def test_nnc_coords_pillars_flags(self, spark, capsys):
        from res2df_spark.cli import main

        # eightcells has no NNCs — the flags must still compose cleanly
        assert main(["nnc", f"{_EIGHT}/EIGHTCELLS", "-c", "-p", "-o", "-"]) == 0
        header = capsys.readouterr().out.splitlines()[0].split(",")
        assert {"I1", "TRAN", "X", "Y", "Z"} <= set(header)

    def test_compdat_initvectors(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["compdat", f"{_EIGHT}/EIGHTCELLS.DATA",
                     "--initvectors", "PORO", "-o", "-"]) == 0
        header = capsys.readouterr().out.splitlines()[0].split(",")
        assert "PORO" in header and "WELL" in header

    def test_compdat_initvectors_missing_raises(self, spark):
        from res2df_spark.cli import main

        with pytest.raises(SystemExit):
            main(["compdat", f"{_EIGHT}/EIGHTCELLS.DATA",
                  "--initvectors", "NOSUCHVEC", "-o", "-"])

    def test_wcd_use_wellconnstatus(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["wellcompletiondata", f"{_EIGHT}/EIGHTCELLS.DATA",
                     "--zonemap", f"{_EIGHT}/zones.lyr",
                     "--use_wellconnstatus", "-o", "-"]) == 0
        lines = capsys.readouterr().out.splitlines()
        assert {"WELL", "ZONE", "DATE", "OP/SH", "KH"} <= set(lines[0].split(","))
        assert len(lines) > 1

    def test_verbose_flag_accepted(self, spark, capsys):
        from res2df_spark.cli import main

        assert main(["trans", f"{_EIGHT}/EIGHTCELLS", "-v", "-o", "-"]) == 0
        capsys.readouterr()


def test_vfpnumbers_filter(spark, capsys):
    from res2df_spark.cli import main

    deck = """VFPPROD
1 100.0 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'METRIC' 'BHP' /
1.0 2.0 /
10.0 /
0.0 /
0.0 /
0.0 /
1 1 1 1 20.0 30.0 /
/
VFPPROD
2 100.0 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'METRIC' 'BHP' /
1.0 2.0 /
10.0 /
0.0 /
0.0 /
0.0 /
1 1 1 1 40.0 50.0 /
/
"""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".DATA", delete=False) as f:
        f.write(deck)
        path = f.name
    assert main(["vfpprod", path, "--vfpnumbers", "[2]", "-o", "-"]) == 0
    lines = capsys.readouterr().out.splitlines()
    t_idx = lines[0].split(",").index("TABLE")
    tables = {ln.split(",")[t_idx] for ln in lines[1:]}
    assert tables == {"2"}
    os.unlink(path)


def test_string_to_intlist_reference_quirk():
    from res2df_spark.functions.strings import string_to_intlist

    assert string_to_intlist("[1,2,6:9]") == [1, 2, 6, 9]
    assert string_to_intlist("") == []
    assert string_to_intlist("4") == [4]


# ---------------------------------------------------------------------------
# Registry-breadth insurance (round-9 brief #8): the trickiest WELOPEN/
# COMPLUMP interaction cases from the reference's matrix
# (/root/reference/tests/test_welopen.py:1179-1544), exercised through
# the deck pipeline.
# ---------------------------------------------------------------------------

_WELOPEN_CASES = [
    # a WELOPEN completion RANGE spanning several lumps: lumps 1 and 2
    # (K 1-4) shut, lump 3 (K 5) stays open
    (
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 5 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 2 1 /
 'OP1' 1 1 3 4 2 /
 'OP1' 1 1 5 5 3 /
/
WELOPEN
 'OP1' 'SHUT' 3* 1 2 /
/
""",
        [("OP1", 1, "SHUT"), ("OP1", 2, "SHUT"), ("OP1", 3, "SHUT"),
         ("OP1", 4, "SHUT"), ("OP1", 5, "OPEN")],
    ),
    # explicit (I,J,K) indices AND a completion range must BOTH match:
    # the second WELOPEN record names completion 2 at cell (1,1,1)
    # where completion 2 does not live — ignored
    (
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP1' 1 1 2 2 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
 'OP1' 1 1 2 2 2 /
/
WELOPEN
 'OP1' 'SHUT' 1 1 1 1 1 /
 'OP1' 'SHUT' 1 1 1 2 2 /
/
""",
        [("OP1", 1, "SHUT"), ("OP1", 2, "OPEN")],
    ),
    # wildcard well + STOP + lump range simultaneously: STOP with a
    # completion range acts on CONNECTIONS (→ SHUT, reference
    # compdat.py:904-911), lump membership selects which
    (
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 2 'OPEN' /
 'OP2' 1 2 1 2 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
 'OP1' 1 1 2 2 2 /
 'OP2' 1 2 1 2 1 /
/
WELOPEN
 'OP*' 'STOP' 3* 1 1 /
/
""",
        [("OP1", 1, "SHUT"), ("OP1", 2, "OPEN"),
         ("OP2", 1, "SHUT"), ("OP2", 2, "SHUT")],
    ),
]


@pytest.mark.parametrize("deck,expected", _WELOPEN_CASES)
def test_welopen_complump_matrix(spark, deck, expected):
    from res2df_spark.modules import compdat

    out = compdat.to_reference_shape(compdat.df(spark, deck))
    got = sorted(
        (r["WELL"], r["K1"], r["OP/SH"])
        for r in out.select("WELL", "K1", "OP/SH").collect()
    )
    assert got == sorted(expected)


_WELOPEN_ERROR_CASES = [
    ("COMPLUMP\n 'OP1' 1 1 2 1 1 /\n/\nWELOPEN\n 'OP1' 'SHUT' 3* 1 1 /\n/\n",
     "K2 must be equal to or greater than K1"),
    ("COMPLUMP\n 'OP1' 1 1 1 1 1 /\n 'OP1' 1 1 2 2 2 /\n/\n"
     "WELOPEN\n 'OP1' 'SHUT' 3* 2 1 /\n/\n",
     "C2 must be equal or greater than C1"),
    ("COMPLUMP\n 'OP1' -1 -1 -1 -1 1 /\n/\nWELOPEN\n 'OP1' 'SHUT' 3* 1 1 /\n/\n",
     "Negative values for COMPLUMP coordinates"),
    ("COMPLUMP\n 'OP1' 1 1 1 1 1 /\n/\nWELOPEN\n 'OP1' 'SHUT' 3* 1 /\n/\n",
     "Both or none of the completion numbers"),
    ("COMPLUMP\n 'OP1' 1 1 1 1 1 /\n/\nWELOPEN\n 'OP1' 'SHUT' 3* -1 -1 /\n/\n",
     "Negative values for C1/C2"),
]


@pytest.mark.parametrize("tail,match", _WELOPEN_ERROR_CASES)
def test_welopen_complump_validation(spark, tail, match):
    """Validation parity with the reference's raise matrix
    (test_welopen.py:1296-1418)."""
    from res2df_spark.modules import compdat

    deck = "COMPDAT\n 'OP1' 1 1 1 2 'OPEN' /\n/\n" + tail
    with pytest.raises(ValueError, match=match):
        compdat.df(spark, deck)


# ---------------------------------------------------------------------------
# Round-9 ADVICE regressions
# ---------------------------------------------------------------------------


def test_paramfile_relative_extension_candidates(tmp_path):
    """A relative --paramfile/filebase without extension must find
    filebase+'.json'/'.yml'/'.txt' like the reference's
    find_parameter_files (parameters.py:44-48), json winning."""
    from res2df_spark.sources.aux import load_parameters

    (tmp_path / "CASE.DATA").write_text("RUNSPEC\n")
    (tmp_path / "myparams.txt").write_text("A 1\nB 2\n")
    got = load_parameters(str(tmp_path / "CASE.DATA"), filebase="myparams")
    assert got == {"A": 1, "B": 2}
    # json beats txt for the same filebase
    (tmp_path / "myparams.json").write_text('{"A": 9}')
    got = load_parameters(str(tmp_path / "CASE.DATA"), filebase="myparams")
    assert got["A"] == 9 and got["B"] == 2


def test_dates_to_headers_timestamp_collision_warns(spark):
    """Two distinct timestamps on one calendar day must NOT silently
    produce duplicate '<name>@<date>' headers — colliding dates keep
    full-timestamp tags (round-9 ADVICE)."""
    from datetime import datetime

    from res2df_spark.operators.reshape import dates_to_headers

    df = spark.createDataFrame(
        [(1, datetime(2020, 1, 1, 0, 0), 10.0),
         (1, datetime(2020, 1, 1, 12, 0), 11.0),
         (1, datetime(2020, 2, 1, 0, 0), 12.0)],
        "ID int, DATE timestamp, V double",
    )
    with pytest.warns(RuntimeWarning, match="share the calendar date"):
        out = dates_to_headers(df, ["ID"])
    cols = set(out.columns)
    assert len(cols) == len(out.columns)  # no duplicate names
    # the unambiguous date keeps the date-only tag; colliders keep time
    assert "V@2020-02-01" in cols
    assert sum(c.startswith("V@2020-01-01") for c in cols) == 2


def test_stream_asof_null_probe_flag_dropped(spark, tmp_path):
    """A NULL probe flag is neither probe nor observation — the row is
    dropped (round 9 emitted it as a probe because bool(nan) is True)."""
    import time as _time

    from res2df_spark.streaming.ops import asof_enrich_stream

    src = tmp_path / "in"
    src.mkdir()
    chk = tmp_path / "chk"
    out_dir = tmp_path / "out"
    import json as _json

    rows_in = [
        {"k": "a", "ts": "2020-01-01T00:00:00", "probe": False, "v": 1.0},
        {"k": "a", "ts": "2020-01-01T01:00:00", "probe": None, "v": None},
        {"k": "a", "ts": "2020-01-01T02:00:00", "probe": True, "v": None},
    ]
    (src / "batch.json").write_text(
        "\n".join(_json.dumps(r) for r in rows_in)
    )
    stream = (
        spark.readStream.schema("k string, ts timestamp, probe boolean, v double")
        .json(str(src))
    )
    q = (
        asof_enrich_stream(stream, ["k"], "ts", "probe", ["v"])
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir)).collect()
    # exactly ONE output row (the true probe), enriched from the obs;
    # the NULL-flag row is gone
    assert len(got) == 1
    assert got[0]["v"] == 1.0


def test_region_graph_edges_and_networkx(spark):
    """make_nx_graph parity (reference trans.py:222-232): region
    interface edges weighted by summed TRAN."""
    from res2df_spark.modules.grid import region_graph_edges, to_networkx

    grid = spark.createDataFrame(
        [(1, 1, 1, 100.0, 200.0, 10.0, 1, 5.0, 0.0, 2.0),
         (2, 1, 1, 200.0, 200.0, 10.0, 2, 0.0, 0.0, 3.0),
         (1, 1, 2, 100.0, 200.0, 20.0, 1, 4.0, None, 0.0),
         (2, 1, 2, 200.0, 200.0, 22.0, 2, 0.0, 0.0, 0.0)],
        "I int, J int, K int, X double, Y double, Z double, FIPNUM int, "
        "TRANX double, TRANY double, TRANZ double",
    )
    edges = region_graph_edges(grid, "FIPNUM")
    got = edges.collect()
    assert len(got) == 1
    assert (got[0]["FIPNUM1"], got[0]["FIPNUM2"]) == ("1", "2")
    assert abs(got[0]["TRAN"] - 9.0) < 1e-9  # the two I faces, 5+4
    try:
        import networkx  # noqa: F401
    except ImportError:
        pytest.skip("networkx not installed")
    g = to_networkx(edges)
    assert g.number_of_edges() == 1
    assert abs(g["1"]["2"]["weight"] - 9.0) < 1e-9


def test_trans_full_directions_passthrough(spark):
    """case.trans(directions='K', coords=True) must honor directions
    even when a composition flag routes through trans_full (review
    finding: it was silently rebuilt as IJK)."""
    from res2df_spark.modules.grid import trans_full

    grid = spark.createDataFrame(
        [(1, 1, 1, 100.0, 200.0, 10.0, 1, 5.0, 0.0, 2.0),
         (2, 1, 1, 200.0, 200.0, 10.0, 2, 0.0, 0.0, 3.0),
         (1, 1, 2, 100.0, 200.0, 20.0, 1, 4.0, None, 0.0),
         (2, 1, 2, 200.0, 200.0, 22.0, 2, 0.0, 0.0, 0.0)],
        "I int, J int, K int, X double, Y double, Z double, FIPNUM int, "
        "TRANX double, TRANY double, TRANZ double",
    )
    out = trans_full(grid, coords=True, directions="K")
    assert {r["DIR"] for r in out.collect()} == {"K"}


def test_detect_unit_system_stops_at_sections():
    """Unit keywords are RUNSPEC-only; an unquoted FIELD data token in
    SCHEDULE (the root group name) must not flip the unit system."""
    from res2df_spark.modules.wellcompletiondata import detect_unit_system

    deck = (
        "RUNSPEC\nOIL\nWATER\nSCHEDULE\n"
        "GCONPROD\n  FIELD 'ORAT' 10000 /\n/\n"
    )
    assert detect_unit_system(deck) == "METRIC"


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_compdat_initvectors_inner_join(spark, capsys):
    """--initvectors drops connections addressing cells absent from
    the grid frame — the reference's inner merge (grid.py:365-408)."""
    from res2df_spark.cli import main

    assert main(["compdat", f"{_EIGHT}/EIGHTCELLS.DATA",
                 "--initvectors", "PORO", "-o", "-"]) == 0
    lines = capsys.readouterr().out.splitlines()
    idx = lines[0].split(",").index("PORO")
    # inner join: every surviving row has a non-empty PORO
    assert all(ln.split(",")[idx] != "" for ln in lines[1:])


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_wcd_arrow_feather_carries_kh_unit(spark, tmp_path):
    """End-to-end --arrow: the feather file's KH field carries the
    unit metadata, like the reference's _df2pyarrow export."""
    import pyarrow.feather as feather

    from res2df_spark.cli import main

    out = tmp_path / "wcd.feather"
    assert main(["wellcompletiondata", f"{_EIGHT}/EIGHTCELLS.DATA",
                 "--zonemap", f"{_EIGHT}/zones.lyr",
                 "--arrow", "-o", str(out)]) == 0
    table = feather.read_table(str(out))
    assert table.schema.field("KH").metadata == {b"unit": b"mDm"}
    assert table.num_rows > 0


# ---------------------------------------------------------------------------
# P9 keyword want-list (reference handle_wanted_keywords /
# satfunc/pvt/equil --keywords) and the fipreports --fipname flag
# ---------------------------------------------------------------------------


def test_wanted_keywords_semantics():
    from res2df_spark.modules.tables import wanted_keywords

    sup = ("SWOF", "SGOF", "SWFN")
    assert wanted_keywords(None, sup) == list(sup)
    assert wanted_keywords([None], sup) == list(sup)
    assert wanted_keywords("SGOF", sup) == ["SGOF"]
    with pytest.warns(RuntimeWarning, match="not supported"):
        got = wanted_keywords(["SGOF", "NOSUCH"], sup, "satfunc")
    assert got == ["SGOF"]
    # supported order preserved regardless of wanted order
    assert wanted_keywords(["SWFN", "SWOF"], sup) == ["SWOF", "SWFN"]


def test_satfunc_keywords_filter(spark):
    from res2df_spark.modules.tables import satfunc_df

    deck = """SWOF
0.1 0.0 1.0 0.0
0.9 1.0 0.0 0.0 /
/
SGOF
0.0 0.0 1.0 0.0
0.8 1.0 0.0 0.0 /
/
"""
    both = satfunc_df(spark, deck)
    assert {r["KEYWORD"] for r in both.select("KEYWORD").distinct().collect()} == {
        "SWOF", "SGOF"
    }
    only = satfunc_df(spark, deck, keywords=["SGOF"])
    assert {r["KEYWORD"] for r in only.select("KEYWORD").distinct().collect()} == {
        "SGOF"
    }


def test_equil_keywords_filter(spark):
    from res2df_spark.modules.tables import equil_df

    deck = """EQUIL
2000 250 2100 0.0 1500 0.0 /
RSVD
2000 100.0
2200 150.0 /
/
"""
    full = equil_df(spark, deck)
    kws = {r["KEYWORD"] for r in full.select("KEYWORD").distinct().collect()}
    assert kws == {"EQUIL", "RSVD"}
    rsvd_only = equil_df(spark, deck, keywords=["RSVD"])
    kws = {r["KEYWORD"] for r in rsvd_only.select("KEYWORD").distinct().collect()}
    assert kws == {"RSVD"}


def test_cli_satfunc_keywords(spark, tmp_path, capsys):
    from res2df_spark.cli import main

    deck = tmp_path / "T.DATA"
    deck.write_text(
        "SWOF\n0.1 0.0 1.0 0.0\n0.9 1.0 0.0 0.0 /\n/\n"
        "SGOF\n0.0 0.0 1.0 0.0\n0.8 1.0 0.0 0.0 /\n/\n"
    )
    assert main(["satfunc", str(deck), "-k", "SWOF", "-o", "-"]) == 0
    out = capsys.readouterr().out
    assert "SWOF" in out and "SGOF" not in out


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_fipreports_fipname(spark, capsys):
    from res2df_spark.cli import main

    # the flag is threaded through: FIPNAME appears in the header and
    # the run exits cleanly (the eightcells PRT carries no FIP balance
    # blocks — populated parsing is pinned by the fipreports_prt
    # oracle row; this exercises the CLI plumbing + empty path)
    assert main(["fipreports", f"{_EIGHT}/EIGHTCELLS", "--fipname",
                 "FIPNUM", "-o", "-"]) == 0
    default_lines = capsys.readouterr().out.splitlines()
    assert "FIPNAME" in default_lines[0]
    # a fipname with no matching PRT blocks yields an empty but
    # well-formed frame (header at most), never a crash
    assert main(["fipreports", f"{_EIGHT}/EIGHTCELLS", "--fipname",
                 "FIPZON", "-o", "-"]) == 0
    absent_lines = capsys.readouterr().out.splitlines()
    assert len(absent_lines) <= 1


def test_fipreports_fipname_validation(spark):
    from res2df_spark.modules import fipreports

    with pytest.raises(ValueError, match="alphanumeric"):
        fipreports.df(spark, "/nonexistent.PRT", fipname="FIP(A")


def test_csv2res_keywords_filter(spark, tmp_path, capsys):
    """csv2res -k/--keywords writes back only the named keyword tables
    (reference common.fill_reverse_parser)."""
    from res2df_spark.cli import csv2res_main, main

    deck = tmp_path / "T.DATA"
    deck.write_text(
        "SWOF\n0.1 0.0 1.0 0.0\n0.9 1.0 0.0 0.0 /\n/\n"
        "SGOF\n0.0 0.0 1.0 0.0\n0.8 1.0 0.0 0.0 /\n/\n"
    )
    csv_path = tmp_path / "satfunc.csv"
    assert main(["satfunc", str(deck), "-o", str(csv_path)]) == 0
    assert csv2res_main([
        "satfunc", str(csv_path), "-k", "SWOF", "-o", "-",
    ]) == 0
    out = capsys.readouterr().out
    assert "SWOF" in out and "SGOF" not in out


def test_wanted_keywords_none_mixed():
    """A stray None mixed with an unsupported name warns, not crashes."""
    from res2df_spark.modules.tables import wanted_keywords

    with pytest.warns(RuntimeWarning, match="not supported"):
        got = wanted_keywords(["SWOF", None, "TYPO"], ("SWOF", "SGOF"))
    assert got == ["SWOF"]


def test_csv2res_keywords_typo_warns(spark, tmp_path, capsys):
    from res2df_spark.cli import csv2res_main, main

    deck = tmp_path / "T.DATA"
    deck.write_text("SWOF\n0.1 0.0 1.0 0.0\n0.9 1.0 0.0 0.0 /\n/\n")
    csv_path = tmp_path / "satfunc.csv"
    assert main(["satfunc", str(deck), "-o", str(csv_path)]) == 0
    capsys.readouterr()
    with pytest.warns(RuntimeWarning, match="not in"):
        assert csv2res_main([
            "satfunc", str(csv_path), "-k", "SWFO", "-o", "-",
        ]) == 0
