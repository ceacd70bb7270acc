"""Round-11 regression tests for the three ADVICE items + the vfp `-n`
short alias (the last CLI-parity residue from the round-10 verdict)."""
import os

import pandas as pd
import pytest

_EIGHT = "/root/reference/tests/data/eightcells"

_VFP_DECK = """VFPPROD
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


class TestDetectUnitSystemTitleGuard:
    """ADVICE #1: TITLE's free-text record must never match a unit
    keyword — the reference iterates PARSED keywords so record payloads
    can't collide (_get_unit_system, wellcompletiondata.py:100-111)."""

    def test_unquoted_title_starting_with_field(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        deck = "RUNSPEC\nTITLE\nFIELD DEVELOPMENT STUDY\nSCHEDULE\n"
        assert detect_unit_system(deck) == "METRIC"

    def test_title_record_is_exactly_a_unit_token(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        # worst case: the title is literally the single word FIELD
        deck = "RUNSPEC\nTITLE\nFIELD\nSCHEDULE\n"
        assert detect_unit_system(deck) == "METRIC"

    def test_real_unit_after_title_still_found(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        deck = "RUNSPEC\nTITLE\nLAB EXPERIMENT\nFIELD\nSCHEDULE\n"
        assert detect_unit_system(deck) == "FIELD"

    def test_multi_token_line_is_data_not_keyword(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        # a unit word followed by more tokens is a data record, never
        # the zero-payload unit flag
        deck = "RUNSPEC\nFIELD 3 4 /\nSCHEDULE\n"
        assert detect_unit_system(deck) == "METRIC"

    def test_plain_units_unaffected(self):
        from res2df_spark.modules.wellcompletiondata import detect_unit_system

        for kw, want in [("METRIC", "METRIC"), ("FIELD", "FIELD"),
                         ("LAB", "LAB"), ("PVT-M", "PVT-M"),
                         ("PVTM", "PVT-M")]:
            assert detect_unit_system(f"RUNSPEC\n{kw}\nGRID\n") == want


class TestEnrichBatchNumericTs:
    """ADVICE #2: the carried state time must not be coerced through
    pd.Timestamp for non-datetime as-of keys (an int would be misread
    as nanoseconds across batch boundaries)."""

    def _run(self, batches, ts_dtype):
        from res2df_spark.streaming.ops import _enrich_batch

        cur = None
        outs = []
        for rows in batches:
            pdf = pd.DataFrame(rows, columns=["ts", "probe", "v"])
            pdf["ts"] = pdf["ts"].astype(ts_dtype)
            pdf["probe"] = pdf["probe"].astype("object")
            pdf["v"] = pdf["v"].astype("object")
            out, cur = _enrich_batch(pdf, cur, "ts", "probe", ["v"])
            if out is not None:
                outs.append(out)
        return outs, cur

    def test_int_ts_state_threads_across_batches(self):
        # batch 1: one observation at t=100; batch 2: probe at t=250
        outs, cur = self._run(
            [[(100, False, "a")], [(250, True, None)]], "int64"
        )
        assert cur[0] == 250 or cur[0] == 100  # state time stays an int
        assert not isinstance(cur[0], pd.Timestamp)
        assert len(outs) == 1
        assert list(outs[0]["v"]) == ["a"]

    def test_int_ts_probe_before_state_gets_null(self):
        outs, _ = self._run(
            [[(100, False, "a")], [(50, True, "junk")]], "int64"
        )
        assert len(outs) == 1
        assert list(outs[0]["v"]) == [None]

    def test_float_ts(self):
        outs, cur = self._run(
            [[(1.5, False, "x")], [(2.5, True, None), (3.5, False, "y")]],
            "float64",
        )
        assert list(outs[0]["v"]) == ["x"]
        assert cur == [3.5, "y"]

    def test_datetime_ts_still_coerced(self):
        from res2df_spark.streaming.ops import _enrich_batch

        t0 = pd.Timestamp("2020-01-01")
        b1 = pd.DataFrame({
            "ts": pd.Series([t0], dtype="datetime64[ns]"),
            "probe": pd.Series([False], dtype="object"),
            "v": pd.Series(["a"], dtype="object"),
        })
        out, cur = _enrich_batch(b1, None, "ts", "probe", ["v"])
        assert out is None
        # simulate the list round-trip decaying Timestamp → datetime
        cur = [cur[0].to_pydatetime(), cur[1]]
        b2 = pd.DataFrame({
            "ts": pd.Series([t0 + pd.Timedelta(hours=1)],
                            dtype="datetime64[ns]"),
            "probe": pd.Series([True], dtype="object"),
            "v": pd.Series([None], dtype="object"),
        })
        out, _ = _enrich_batch(b2, cur, "ts", "probe", ["v"])
        assert list(out["v"]) == ["a"]


def test_vfp_n_short_alias(spark, tmp_path, capsys):
    """Reference _vfp.py fill_parser registers -n as the short form of
    --vfpnumbers (/root/reference/src/res2df/vfp/_vfp.py:467)."""
    from res2df_spark.cli import main

    path = tmp_path / "vfp.DATA"
    path.write_text(_VFP_DECK)
    assert main(["vfpprod", str(path), "-n", "[2]", "-o", "-"]) == 0
    lines = capsys.readouterr().out.splitlines()
    t_idx = lines[0].split(",").index("TABLE")
    assert {ln.split(",")[t_idx] for ln in lines[1:]} == {"2"}


# ---------------------------------------------------------------------------
# Round-11 brief #8: unit-metadata sweep across the --arrow export
# families.  Reference parity: summary stamps smry_meta fields
# (summary.py:567-599 via _df2pyarrow:486-521), wellcompletiondata
# stamps the KH unit (wellcompletiondata.py:218-246), grid/vfp attach
# NO field metadata (grid.py:126-147 builds plain fields).
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
class TestArrowMetadataSweep:
    def _case(self, spark):
        from res2df_spark.case import ResdataCase

        return ResdataCase(spark, f"{_EIGHT}/EIGHTCELLS")

    def test_summary_field_metadata(self, spark):
        out = self._case(spark).summary()
        meta = {f.name: f.metadata for f in out.schema}
        assert meta["FOPT"] == {
            "unit": "SM3", "is_total": "True", "is_rate": "False",
            "is_historical": "False", "keyword": "FOPT",
            "wgname": "None",
        }
        assert meta["WOPR:OP1"]["is_rate"] == "True"
        assert meta["WOPR:OP1"]["wgname"] == "OP1"
        assert meta["WOPR:OP1"]["unit"] == "SM3/DAY"
        # completion vector: wgname is the well segment only
        cpi = [c for c in meta if c.startswith("CPI:")][0]
        assert meta[cpi]["wgname"] == "OP1"
        assert meta["DATE"] == {}

    def test_summary_arrow_export_carries_metadata(self, spark):
        from res2df_spark.sinks.writers import to_arrow_table

        out = self._case(spark).summary()
        table = to_arrow_table(out)
        f = table.schema.field("FOPT")
        assert f.metadata[b"unit"] == b"SM3"
        assert f.metadata[b"is_total"] == b"True"
        assert f.metadata[b"keyword"] == b"FOPT"

    def test_grid_fields_carry_no_spurious_metadata(self, spark):
        # reference grid._df2pyarrow attaches no field metadata
        out = self._case(spark).grid()
        assert all(not f.metadata for f in out.schema)

    def test_vfp_fields_carry_no_spurious_metadata(self, spark):
        from res2df_spark.modules import vfp

        deck = (
            "VFPINJ\n  1 3000.0 'WAT' 'THP' 'METRIC' 'BHP' /\n"
            "  100 200 /\n  10 20 /\n  1 2000 2100 /\n  2 2200 2300 /\n"
        )
        out = vfp.df_inj(spark, deck)
        assert all(not f.metadata for f in out.schema)

    def test_wcd_kh_metadata_still_attached(self, spark):
        from res2df_spark.modules import wellcompletiondata

        frame = spark.createDataFrame(
            [("OP1", "Z1", 1.0)], "WELL string, ZONE string, KH double"
        )
        out = wellcompletiondata.attach_kh_metadata(frame, "METRIC")
        meta = {f.name: f.metadata for f in out.schema}
        assert meta["KH"] == {"unit": "mDm"}


# ---------------------------------------------------------------------------
# Round-11 /code-review findings
# ---------------------------------------------------------------------------


def test_vfp_meta_multicount_default(spark):
    """A 2* covering FLO and WFR must not shift GOR into the WFR slot
    (whole-record expansion before positional reads)."""
    from res2df_spark.modules import vfp

    deck = ("VFPPROD\n 1 3000.0 2* 'GOR' /\n 100 /\n 10 /\n 0 /\n 0 /\n"
            " 0 /\n 1 1 1 1 500 /\n")
    out = vfp.df(spark, deck, "VFPPROD").first()
    assert out["RATE_TYPE"] == "GAS"   # defaulted
    assert out["WFR_TYPE"] == "WCT"    # defaulted
    assert out["GFR_TYPE"] == "GOR"    # the explicit item, in ITS slot


def test_vfp_dfs_redefined_table_number(spark):
    """dfs() separates frames by keyword instance: a redefined table
    number yields two clean frames, never a merged one."""
    from res2df_spark.modules import vfp

    deck = (
        "VFPINJ\n 1 1000.0 'WAT' 'THP' 'METRIC' 'BHP' /\n 100 /\n 10 /\n"
        " 1 2000 /\n"
        "VFPINJ\n 1 2000.0 'WAT' 'THP' 'METRIC' 'BHP' /\n 100 /\n 10 /\n"
        " 1 3000 /\n"
    )
    frames = vfp.dfs(spark, deck, "VFPINJ")
    assert len(frames) == 2
    a, b = (f.collect() for f in frames)
    assert len(a) == 1 and len(b) == 1
    assert a[0]["DATUM"] == 1000.0 and a[0]["TAB"] == 2000.0
    assert b[0]["DATUM"] == 2000.0 and b[0]["TAB"] == 3000.0
    assert "BI" not in frames[0].columns


def test_summary_wgname_only_for_named_families(spark):
    """Region/block vectors carry a numeric node id, not a well name —
    wgname must stay 'None' for them."""
    from res2df_spark.modules.summary import attach_summary_metadata

    meta = spark.createDataFrame(
        [("RPR:3", "BARSA", False, False),
         ("BPR:1,1,1", "BARSA", False, False),
         ("WOPR:OP1", "SM3/DAY", False, True),
         ("GOPR:GRP1", "SM3/DAY", False, True)],
        "VECTOR string, UNIT string, IS_TOTAL boolean, IS_RATE boolean",
    )
    wide = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0)],
        "`RPR:3` double, `BPR:1,1,1` double, `WOPR:OP1` double, "
        "`GOPR:GRP1` double",
    )
    out = attach_summary_metadata(wide, meta)
    m = {f.name: f.metadata for f in out.schema}
    assert m["RPR:3"]["wgname"] == "None"
    assert m["BPR:1,1,1"]["wgname"] == "None"
    assert m["WOPR:OP1"]["wgname"] == "OP1"
    assert m["GOPR:GRP1"]["wgname"] == "GRP1"


# ---------------------------------------------------------------------------
# Reference _df2pyarrow dtype contract (summary.py:486-521 +
# test_df2pyarrow_* matrix): --arrow summary/grid exports downcast to
# int32 / float32 / timestamp[ms]; strings pass through; field
# metadata coexists with the downcast.
# ---------------------------------------------------------------------------


class TestArrowDowncast:
    def test_ints_and_floats(self, spark):
        import pyarrow as pa

        from res2df_spark.sinks.writers import to_arrow_table

        df = spark.createDataFrame(
            [(1, 2.2, "hei")], "FOO long, BAR double, BAZ string"
        )
        t = to_arrow_table(df, downcast32=True)
        assert t.schema.field("FOO").type == pa.int32()
        assert t.schema.field("BAR").type == pa.float32()
        assert t.schema.field("BAZ").type == pa.string()
        back = t.to_pandas()
        assert back["FOO"][0] == 1
        assert abs(back["BAR"][0] - 2.2) < 1e-6
        assert back["BAZ"][0] == "hei"

    def test_timestamp_ms(self, spark):
        import datetime

        import pyarrow as pa

        from res2df_spark.sinks.writers import to_arrow_table

        df = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1),)], "DATE timestamp"
        )
        t = to_arrow_table(df, downcast32=True)
        assert t.schema.field("DATE").type == pa.timestamp("ms")

    def test_metadata_survives_downcast(self, spark):
        from pyspark.sql import functions as F

        from res2df_spark.sinks.writers import to_arrow_table

        df = spark.createDataFrame([(1.0,)], "FOO double").select(
            F.col("FOO").alias("FOO", metadata={"unit": "barf"})
        )
        t = to_arrow_table(df, downcast32=True)
        f = t.schema.field("FOO")
        assert f.metadata[b"unit"] == b"barf"
        assert str(f.type) == "float"  # float32

    def test_default_keeps_64bit(self, spark):
        import pyarrow as pa

        from res2df_spark.sinks.writers import to_arrow_table

        df = spark.createDataFrame([(1, 2.2)], "FOO long, BAR double")
        t = to_arrow_table(df)
        assert t.schema.field("FOO").type == pa.int64()
        assert t.schema.field("BAR").type == pa.float64()
