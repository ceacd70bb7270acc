"""Round-9 fixes, each pinned by the round-8 verdict/ADVICE:

* timeline_span memo (verdict #4): composing several skew-safe
  operators over the same frame pays the eager min/max scan ONCE —
  asserted via executed-job counts, not wall-clock.
* empty-grid dtype parity (ADVICE eclbin.py:593): the nz==0 branch of
  grid_geometry_pandas must produce the same integer dtypes as the
  populated path.
* orphaned tar-shard temp sweep (ADVICE multimodal.py:360): a
  hard-killed attempt's ``.shard-NNNNN.tar.tmp-<uuid>`` leftovers are
  swept by the next attempt committing that shard.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import rows  # noqa: F401  (shared helper import path)


def _jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


@pytest.fixture()
def events_df(spark):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i % 7, base + dt.timedelta(hours=i), float(i))
        for i in range(200)
    ]
    return spark.createDataFrame(data, "user_id int, ts timestamp, value double")


def test_span_memo_second_call_runs_no_job(spark, events_df):
    from res2df_spark.operators import timechunk

    timechunk.clear_span_cache()
    before = _jobs(spark)
    span1 = timechunk.timeline_span(events_df, "ts")
    after_first = _jobs(spark)
    assert after_first > before  # the one real scan
    span2 = timechunk.timeline_span(events_df, "ts")
    assert _jobs(spark) == after_first  # memo hit: zero new jobs
    assert span1 == span2 and span1 is not None


def test_span_memo_hits_across_recreated_identical_plan(spark, events_df):
    """A semantically identical frame built twice (the Catalog.table
    pattern: same scan, same projection) shares the memo entry."""
    from pyspark.sql import functions as F

    from res2df_spark.operators import timechunk

    timechunk.clear_span_cache()
    a = events_df.filter(F.col("value") >= 0).select("user_id", "ts")
    b = events_df.filter(F.col("value") >= 0).select("user_id", "ts")
    assert a is not b
    timechunk.timeline_span(a, "ts")
    before = _jobs(spark)
    timechunk.timeline_span(b, "ts")
    assert _jobs(spark) == before


def test_span_memo_respects_column_and_opt_out(spark):
    from res2df_spark.operators import timechunk

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2025, 1, 1))], "a timestamp, b timestamp"
    )
    timechunk.clear_span_cache()
    timechunk.timeline_span(df, "a")
    before = _jobs(spark)
    timechunk.timeline_span(df, "b")  # different column: real scan
    mid = _jobs(spark)
    assert mid > before
    timechunk.timeline_span(df, "a", use_cache=False)  # forced re-scan
    assert _jobs(spark) > mid


def test_asof_default_construction_reuses_span(spark, events_df):
    """Two default skew-safe asof_join constructions over the same left
    frame: the second must trigger NO new Spark job (the span scan is
    the only eager step in plan construction)."""
    from pyspark.sql import functions as F

    from res2df_spark.operators import timechunk
    from res2df_spark.operators.asof import asof_join

    timechunk.clear_span_cache()
    left = events_df.select("user_id", F.col("ts").alias("lts"))
    right = events_df.select("user_id", F.col("ts").alias("rts"), "value")
    asof_join(left, right, ["user_id"], "lts", "rts")
    before = _jobs(spark)
    df2 = asof_join(left, right, ["user_id"], "lts", "rts")
    assert _jobs(spark) == before
    # and the memoized plan still answers correctly
    assert df2.filter(F.col("value").isNull()).count() == 0


def test_span_memo_results_unchanged(spark, events_df):
    """Memoized and fresh spans drive identical asof results (chunk
    sizing is perf-only; this pins that the memo wiring didn't leak
    into semantics)."""
    from pyspark.sql import functions as F

    from res2df_spark.operators import timechunk
    from res2df_spark.operators.asof import asof_join

    left = events_df.select("user_id", F.col("ts").alias("lts")).filter(
        F.col("user_id") < 5
    )
    right = events_df.select("user_id", F.col("ts").alias("rts"), "value")
    timechunk.clear_span_cache()
    fresh = asof_join(left, right, ["user_id"], "lts", "rts").collect()
    memo = asof_join(left, right, ["user_id"], "lts", "rts").collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, memo))


def test_tar_shard_stale_temp_sweep(spark, tmp_path):
    """ADVICE multimodal.py:360: orphaned .tar.tmp files from a
    hard-killed attempt are swept when the shard commits — but only
    STALE ones (a fresh temp could be a live speculative twin)."""
    import os
    import time

    from res2df_spark.llm.multimodal import export_tar_shards

    out = tmp_path / "shards"
    out.mkdir()
    stale = out / ".shard-00000.tar.tmp-deadbeefdeadbeef"
    fresh = out / ".shard-00001.tar.tmp-cafecafecafecafe"
    stale.write_bytes(b"orphan from a SIGKILLed attempt")
    fresh.write_bytes(b"live speculative twin, still writing")
    old = time.time() - 2 * 3600
    os.utime(stale, (old, old))

    df = spark.createDataFrame(
        [(i, bytes([i % 256] * 8), "k") for i in range(40)],
        "doc_id long, payload binary, kind string",
    )
    export_tar_shards(df, str(out), n_shards=2, meta_cols=["kind"])

    assert not stale.exists(), "stale orphan should be swept at commit"
    assert fresh.exists(), "fresh temp (live twin) must not be touched"
    assert (out / "shard-00000.tar").exists()
    assert (out / "shard-00001.tar").exists()


def test_empty_grid_geometry_dtypes():
    """ADVICE eclbin.py:593: the nz==0 / degenerate branch must emit
    the same dtypes as the populated path (int64 I/J/K/GLOBAL_INDEX,
    float64 geometry), not all-float64."""
    import numpy as np

    from res2df_spark.sources.eclbin import grid_geometry_pandas
    from tests.test_eclbin import _simple_grid_bufs

    empty = grid_geometry_pandas(_simple_grid_bufs(nz=0))
    populated = grid_geometry_pandas(_simple_grid_bufs())
    assert len(empty) == 0 and len(populated) > 0
    assert list(empty.columns) == list(populated.columns)
    for c in populated.columns:
        assert empty[c].dtype == populated[c].dtype, (c, empty[c].dtype)


def test_pillar_contacts_gwc_two_phase(spark):
    """Reference compute_pillar_contacts parity (pillars.py:281-307):
    with NO SOIL column the gas branch computes GWC (deepest
    SGAS-above-cutoff cell on water pillars); with SOIL present it
    computes GOC gated by the epsilon oil saturation."""
    from pyspark.sql import functions as F

    from res2df_spark.modules.grid import pillar_contacts

    rows = [
        # pillar 1-1: water at depth, gas on top -> GWC candidate
        (1, 1, 1, 10.0, 0.1, 0.9),
        (1, 1, 2, 20.0, 0.2, 0.8),
        (1, 1, 3, 30.0, 0.9, 0.0),
        # pillar 2-1: gas but NO water cell -> excluded by the gate
        (2, 1, 1, 10.0, 0.1, 0.9),
    ]
    gw = spark.createDataFrame(
        rows, "I int, J int, K int, Z double, SWAT double, SGAS double"
    )
    out = pillar_contacts(gw, sgascutoff=0.5, swatcutoff=0.5)
    got = {r.PILLAR: r.GWC for r in out.collect()}
    assert got == {"1-1": 20.0}
    assert "GWC" in out.columns and "GOC" not in out.columns

    # same frame with a pre-computed SOIL column takes the GOC branch
    three = gw.withColumn("SOIL", F.lit(1.0) - F.col("SWAT") - F.col("SGAS"))
    out3 = pillar_contacts(three, soilcutoff=0.0, sgascutoff=0.5,
                           swatcutoff=0.5)
    assert "GOC" in out3.columns and "GWC" not in out3.columns


def test_pillars_df_module_layer(spark):
    """pillars_df (module layer, round 9 review) — composition
    reachable without a case fixture; unknown region raises there
    (the facade warns instead)."""
    import pytest as _pytest

    from res2df_spark.modules.grid import pillars_df

    grid = spark.createDataFrame(
        [
            (1, 1, 1, 10.0, 100.0, 20.0, 0.25),
            (1, 1, 2, 20.0, 100.0, 30.0, 0.75),
            (2, 1, 1, 10.0, 100.0, 40.0, 0.5),
        ],
        "I int, J int, K int, Z double, VOLUME double, PORV double, SWAT double",
    )
    out = pillars_df(grid)
    rows = {r.PILLAR: r for r in out.collect()}
    assert rows["1-1"].VOLUME_SUM == 200.0
    assert abs(rows["1-1"].PORO_WMEAN - 50.0 / 200.0) < 1e-9
    grouped = pillars_df(grid, group=True).collect()
    assert len(grouped) == 1 and "PILLAR" not in grouped[0].asDict()
    with _pytest.raises(ValueError, match="region column"):
        pillars_df(grid, region_col="NOPE")


def test_summary_include_restart_chain(spark, tmp_path):
    """Reference summary include_restart (summary.py:299, resdata
    restart loading): the SMSPEC RESTART keyword names the parent case;
    its history STRICTLY BEFORE the child's first date is prepended,
    recursively up the chain."""
    import pandas as pd

    from res2df_spark.sources import eclbin

    def write_case(name, dates, fopt, restart=None):
        wide = pd.DataFrame({"FOPT": fopt}, index=pd.to_datetime(dates))
        smspec = str(tmp_path / f"{name}.SMSPEC")
        eclbin.write_summary(smspec, pd.Timestamp(dates[0]), wide)
        if restart:
            with open(smspec, "ab") as f:
                chunks = [restart[i:i + 8] for i in range(0, len(restart), 8)]
                eclbin.write_keyword(f, "RESTART", "CHAR", chunks)
        return smspec

    write_case("GRANDPA", ["2019-01-01", "2019-06-01", "2020-06-01"],
               [0.0, 10.0, 99.0])
    write_case("PARENT", ["2019-06-01", "2019-12-01", "2020-03-01"],
               [10.0, 20.0, 98.0], restart="GRANDPA")
    child = write_case("CHILD", ["2020-01-01", "2020-02-01"],
                       [30.0, 40.0], restart="PARENT")

    plain = eclbin.summary_long(spark, child).filter("VECTOR = 'FOPT'")
    assert plain.count() == 2

    out = (
        eclbin.summary_long(spark, child, include_restart=True)
        .filter("VECTOR = 'FOPT'")
        .orderBy("DATE")
        .collect()
    )
    got = [(r.DATE.date().isoformat(), r.VALUE) for r in out]
    # grandpa < parent's start, parent < child's start, child whole —
    # the parents' post-restart rows (99.0 / 98.0) are excluded
    assert got == [
        ("2019-01-01", 0.0),
        ("2019-06-01", 10.0),
        ("2019-12-01", 20.0),
        ("2020-01-01", 30.0),
        ("2020-02-01", 40.0),
    ]


def test_summary_include_restart_missing_parent_warns(spark, tmp_path):
    import pandas as pd
    import pytest as _pytest

    from res2df_spark.sources import eclbin

    wide = pd.DataFrame({"FOPT": [1.0]}, index=pd.to_datetime(["2020-01-01"]))
    smspec = str(tmp_path / "ORPHAN.SMSPEC")
    eclbin.write_summary(smspec, pd.Timestamp("2020-01-01"), wide)
    with open(smspec, "ab") as f:
        eclbin.write_keyword(f, "RESTART", "CHAR", ["NOSUCHPA", "RENT"])
    with _pytest.warns(RuntimeWarning, match="no SMSPEC"):
        out = eclbin.summary_long(spark, smspec, include_restart=True)
    assert out.filter("VECTOR = 'FOPT'").count() == 1


def test_load_parameters_filebase(tmp_path):
    """--paramfile contract (reference summary.py:531-556): absolute
    path loads that exact file; relative name replaces the default
    candidates in the nearest-dir-first search."""
    from res2df_spark.sources.aux import load_parameters

    case_dir = tmp_path / "real0"
    case_dir.mkdir()
    (case_dir / "parameters.txt").write_text("DEFAULT 1\n")
    (case_dir / "myparams.txt").write_text("CUSTOM 2\n")
    (tmp_path / "myparams.txt").write_text("CUSTOM 9\nUPPER 3\n")
    abs_file = tmp_path / "explicit.txt"
    abs_file.write_text("ONLY 4\n")

    case = str(case_dir / "CASE.DATA")
    assert load_parameters(case)["DEFAULT"] == 1
    rel = load_parameters(case, filebase="myparams.txt")
    assert rel["CUSTOM"] == 2  # nearest dir wins
    assert rel["UPPER"] == 3   # parent contributes missing keys
    assert "DEFAULT" not in rel
    assert load_parameters(case, filebase=str(abs_file)) == {"ONLY": 4}
