"""Round-8 fixes, each pinned by the r7 ADVICE/VERDICT item it closes:

* asof_join_chunked must carry NULL-key observations across chunks
  (ADVICE medium — equi-joins in the carry grid never matched NULL keys
  while the plain form's window partitioning groups them);
* dedup_keep with keys=[] on an EMPTY DataFrame returns zero rows on
  both engines (the agg form's global aggregate used to emit one
  all-NULL phantom row);
* _same_ck_dir's scheme-less tolerance is bounded by fs.defaultFS
  (conf flipping from s3a://bkt/ckpt to /ckpt must re-point);
* span_hint threads one timeline_span scan through every skew-safe
  default instead of one eager min/max job per operator call.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from res2df_spark.operators import timechunk
from res2df_spark.operators.asof import asof_join, asof_join_chunked
from res2df_spark.operators.eventanalytics import rolling_agg
from res2df_spark.operators.sessionize import sessionize_chunked
from res2df_spark.operators.windows import dedup_keep, dedup_keep_agg
from res2df_spark.session import _same_ck_dir


BASE = datetime(2024, 1, 1)


def test_asof_chunked_null_key_carry(spark):
    """The ADVICE repro: a NULL-key left row 30 days after a NULL-key
    observation must match it (plain form semantics), which requires
    the chunk-grain carry to join null-safe."""
    ldf = spark.createDataFrame(
        [(0, None, BASE + timedelta(days=30)), (1, 7, BASE + timedelta(days=30))],
        "lid long, user_id long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(0, None, BASE, 42.0), (1, 7, BASE, 9.0)],
        "rid long, user_id long, rts timestamp, obs double",
    )
    kwargs = dict(on=["user_id"], left_time="lts", right_time="rts",
                  value_cols=["obs"])
    plain = {r["lid"]: r["obs"] for r in asof_join(ldf, rdf, **kwargs).collect()}
    chunked = {
        r["lid"]: r["obs"]
        for r in asof_join_chunked(ldf, rdf, chunk_seconds=3600, **kwargs).collect()
    }
    assert plain == {0: 42.0, 1: 9.0}
    assert chunked == plain


def test_asof_chunked_null_composite_key(spark):
    """Null-safe carry must hold per-column on multi-key joins (a row
    with one NULL and one real key component is its own group)."""
    ldf = spark.createDataFrame(
        [(0, None, "a", BASE + timedelta(days=30)),
         (1, 5, None, BASE + timedelta(days=30))],
        "lid long, k1 long, k2 string, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(0, None, "a", BASE, 1.5), (1, 5, None, BASE, 2.5)],
        "rid long, k1 long, k2 string, rts timestamp, obs double",
    )
    kwargs = dict(on=["k1", "k2"], left_time="lts", right_time="rts",
                  value_cols=["obs"])
    plain = sorted(
        (r["lid"], r["obs"]) for r in asof_join(ldf, rdf, **kwargs).collect()
    )
    chunked = sorted(
        (r["lid"], r["obs"])
        for r in asof_join_chunked(ldf, rdf, chunk_seconds=3600, **kwargs).collect()
    )
    assert plain == [(0, 1.5), (1, 2.5)]
    assert chunked == plain


def test_dedup_keep_empty_keys_empty_df(spark):
    """keys=[] on an empty DataFrame: zero rows from BOTH engines (the
    agg form's groupBy().agg() emits one all-NULL row that must be
    filtered, the window form never had the phantom)."""
    empty = spark.createDataFrame([], "a long, b string")
    assert dedup_keep(empty, [], ["a"]).count() == 0                       # default agg
    assert dedup_keep_agg(empty, [], ["a"]).count() == 0
    assert dedup_keep(empty, [], ["a"], skew_safe=False).count() == 0      # window
    # non-empty global dedup still picks exactly one row
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    got = dedup_keep(df, [], ["a"], keep="last").collect()
    assert [(r["a"], r["b"]) for r in got] == [(2, "y")]
    # and empty input with real keys stays empty too
    assert dedup_keep(empty, ["a"], ["b"]).count() == 0


def test_same_ck_dir_scheme_less_bounded_by_default_fs():
    # scheme-less conf qualifies to the default FS: matches it...
    assert _same_ck_dir("/ckpt", "hdfs://nn:8020/ckpt", "hdfs://nn:8020")
    # ...and a scheme-less have (both qualify the same way)...
    assert _same_ck_dir("/ckpt", "/ckpt", "hdfs://nn:8020")
    # ...and explicit-local have exactly when the default FS is local...
    assert _same_ck_dir("/ckpt", "file:///ckpt", "file:///")
    assert _same_ck_dir("/ckpt", "file:/ckpt", None)  # unknown → tolerant
    # ...but NOT a local have when the default FS is remote (the conf
    # would qualify to HDFS: stale local checkpoints must re-point)...
    assert not _same_ck_dir("/ckpt", "file:///ckpt", "hdfs://nn:8020")
    # ...and NOT an unrelated remote authority (the s3a→local flip from
    # the r7 ADVICE: checkpoints must re-point, not keep landing on the
    # bucket)
    assert not _same_ck_dir("/ckpt", "s3a://bkt/ckpt", "hdfs://nn:8020")
    assert not _same_ck_dir("/ckpt", "s3a://bkt/ckpt", "file:///")
    # default FS unknown → tolerant (avoid per-call re-point churn)
    assert not _same_ck_dir("/ckpt", "s3a://bkt/other", None)  # path differs
    assert _same_ck_dir("/ckpt", "s3a://bkt/ckpt", None)
    # lazy callable form resolves only when needed
    assert _same_ck_dir("/ckpt", "hdfs://nn:8020/ckpt", lambda: "hdfs://nn:8020")
    assert not _same_ck_dir("/ckpt", "s3a://bkt/ckpt", lambda: "hdfs://nn:8020")
    # explicit schemes still demand authority equality
    assert not _same_ck_dir("s3a://bkt/ckpt", "hdfs://nn:8020/ckpt", "hdfs://nn:8020")
    assert _same_ck_dir("s3a://bkt/ckpt", "s3a://bkt/ckpt", "hdfs://nn:8020")
    assert _same_ck_dir("file:/ckpt", "file:///ckpt", "hdfs://nn:8020")
    assert not _same_ck_dir("file:/ckpt", "hdfs://nn:8020/ckpt", "hdfs://nn:8020")


def _spans_scanned(monkeypatch):
    calls = []
    real = timechunk.timeline_span

    def counting(df, ts_col):
        calls.append(ts_col)
        return real(df, ts_col)

    monkeypatch.setattr(timechunk, "timeline_span", counting)
    return calls


def test_span_hint_skips_the_derivation_scan(spark, monkeypatch):
    rows = [
        (i, i % 3, BASE + timedelta(seconds=37 * i), float(i % 11))
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    span = timechunk.timeline_span(ev, "ts")  # the ONE shared scan
    assert span is not None and span[0] < span[1]
    calls = _spans_scanned(monkeypatch)
    # two skew-safe operators over the same frame, one hint: no rescans
    r = rolling_agg(ev, "ts", ["user_id"], "value", 600, span_hint=span)
    s = sessionize_chunked(ev, "ts", ["user_id"], 600, span_hint=span,
                           tiebreak=["event_id"])
    assert r.count() == 400 and s.count() == 400
    assert calls == []
    # without the hint each default-path call scans once
    rolling_agg(ev, "ts", ["user_id"], "value", 600).count()
    sessionize_chunked(ev, "ts", ["user_id"], 600, tiebreak=["event_id"]).count()
    assert len(calls) == 2
    # hinted output is identical to the derived-default output
    cols = ["event_id", "n_window", "sum_window"]
    hinted = sorted(tuple(x) for x in r.select(*cols).collect())
    derived = sorted(
        tuple(x)
        for x in rolling_agg(ev, "ts", ["user_id"], "value", 600)
        .select(*cols).collect()
    )
    assert hinted == derived


def test_span_hint_asof_chunked(spark, monkeypatch):
    ldf = spark.createDataFrame(
        [(i, i % 2, BASE + timedelta(hours=i)) for i in range(50)],
        "lid long, user_id long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(j, j % 2, BASE + timedelta(hours=j, minutes=7), float(j)) for j in range(20)],
        "rid long, user_id long, rts timestamp, obs double",
    )
    span = timechunk.timeline_span(ldf, "lts")
    calls = _spans_scanned(monkeypatch)
    out = asof_join_chunked(
        ldf, rdf, on=["user_id"], left_time="lts", right_time="rts",
        value_cols=["obs"], span_hint=span,
    )
    assert out.count() == 50
    assert calls == []


def test_rolling_agg_span_hint_conflicts_with_skew_safe_false(spark):
    ev = spark.createDataFrame(
        [(1, 1, BASE, 1.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="span_hint"):
        rolling_agg(ev, "ts", ["user_id"], "value", 60,
                    skew_safe=False, span_hint=(0, 10))


# ---------------------------------------------------------------------------
# Round-8 writer-layer review fixes (sinks/ re-review, first since r5)
# ---------------------------------------------------------------------------


def test_write_dataframe_single_file_append(spark, tmp_path):
    from res2df_spark.sinks.writers import write_dataframe

    p = str(tmp_path / "out.csv")
    df1 = spark.createDataFrame([(1, "a")], "i long, s string")
    df2 = spark.createDataFrame([(2, "b")], "i long, s string")
    write_dataframe(df1, p)
    write_dataframe(df2, p, mode="append")
    with open(p) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    assert lines == ["i,s", "1,a", "2,b"]  # one header, both rows


def test_df2res_satfunc_rejects_nonconsecutive_regions(spark):
    from res2df_spark.sinks.df2res import df2res_satfunc

    df = spark.createDataFrame(
        [("SWOF", 2, 1, 0.1, 0.0, 1.0, 0.0)],
        "KEYWORD string, SATNUM long, ROW_IDX long, SW double, "
        "KRW double, KROW double, PCOW double",
    )
    with pytest.raises(ValueError, match="consecutive"):
        df2res_satfunc(df)


def test_df2res_compdat_writes_dfact_dir_peqvr(spark):
    from res2df_spark.sinks.df2res import df2res_compdat

    df = spark.createDataFrame(
        [("OP1", 1, 2, 3, 3, "OPEN", 0.02, "X", 1.5)],
        "WELL string, I long, J long, K1 long, K2 long, `OP/SH` string, "
        "DFACT double, DIR string, PEQVR double",
    )
    text = df2res_compdat(df)
    # DFACT/DIR/PEQVR land in their positional slots (SATN..SKIN pad 1*)
    assert "0.02 'X' 1.5" in text and "1* 1* 1* 1* 1* 0.02" in text


def test_df2res_vfpinj_rejects_incomplete_thp_record(spark):
    from res2df_spark.sinks.df2res import df2res_vfpinj

    rows = [
        (1, 100.0, 10.0, 50.0, 200.0),
        (1, 100.0, 10.0, 60.0, 210.0),
        (1, 100.0, 20.0, 50.0, 300.0),  # THP=20 misses RATE=60
    ]
    df = spark.createDataFrame(
        rows, "TABLE long, DATUM double, THP double, RATE double, BHP double"
    )
    with pytest.raises(ValueError, match="flow axis"):
        df2res_vfpinj(df)


def test_df2res_vfpprod_rejects_duplicate_plus_missing_rate(spark):
    from res2df_spark.sinks.df2res import df2res_vfpprod

    # combo rates [50, 50, 70] vs flow axis [50, 60, 70]: counts match,
    # the values do not — the old len() check let this through
    base = dict(TABLE=1, DATUM=100.0, THP=10.0, WFR=0.0, GFR=0.0, ALQ=0.0)
    rows = [
        {**base, "RATE": 50.0, "BHP": 1.0},
        {**base, "RATE": 50.0, "BHP": 2.0},
        {**base, "RATE": 70.0, "BHP": 3.0},
        # second THP covers the axis properly so the flow axis is [50,60,70]
        {**base, "THP": 20.0, "RATE": 50.0, "BHP": 4.0},
        {**base, "THP": 20.0, "RATE": 60.0, "BHP": 5.0},
        {**base, "THP": 20.0, "RATE": 70.0, "BHP": 6.0},
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows))
    with pytest.raises(ValueError):
        df2res_vfpprod(df)


def test_df2res_grid_property_nan_and_inference_warning(spark):
    import warnings

    from res2df_spark.sinks.df2res import df2res_grid_property

    g = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (2, 3.0)],
        "GLOBAL_INDEX long, PERMX double",
    )
    with pytest.raises(ValueError, match="NaN"):
        df2res_grid_property(g, "PERMX", global_size=4)
    ok = spark.createDataFrame([(0, 1.0), (1, 2.0)], "GLOBAL_INDEX long, PERMX double")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        text = df2res_grid_property(ok, "PERMX")  # inferred size
    assert any("UNDERCOUNTS" in str(x.message) for x in w)
    assert "PERMX" in text


# ---------------------------------------------------------------------------
# Round-8 module-layer review fixes (modules/ re-review, first since r5)
# ---------------------------------------------------------------------------


def test_unroll_range_drops_inverted_bounds(spark):
    """Reference unrolldf (compdat.py:455-465): start==end passes
    through, start<end unrolls, start>end iterates an EMPTY range — the
    row is dropped, never emitted as a phantom single-K row."""
    from res2df_spark.operators.reshape import unroll_range

    df = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 5), (3, 7, 6), (4, None, 9)],
        "rid long, k1 int, k2 int",
    )
    got = sorted(
        (r["rid"], r["k"]) for r in unroll_range(df, "k1", "k2", "k").collect()
    )
    assert got == [(1, 2), (2, 3), (2, 4), (2, 5), (4, None)]


def test_compdat_inverted_k_range_emits_no_connection(spark):
    from res2df_spark.modules import compdat

    deck = """
DATES
 1 JAN 2020 /
/
COMPDAT
 'OP1' 33 44 11 10 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
/
"""
    out = compdat.df(spark, deck).collect()
    wells = {r["WELL"] for r in out}
    assert wells == {"OP2"}  # the inverted-range row vanishes


def test_welopen_lump_no_match_is_silently_dropped(spark):
    """Reference expand_complump_in_welopen_df (compdat.py:699-752): a
    lump-addressed WELOPEN matching no COMPLUMP rows expands to zero
    rows — the deck is accepted, the action ignored.  Coordinate
    actions that match nothing still raise."""
    from res2df_spark.modules import compdat

    deck = """
DATES
 1 JAN 2020 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
/
WELOPEN
 'OP1' 'SHUT' 3* 2 2 /
/
"""
    out = compdat.df(spark, deck).collect()
    assert [(r["WELL"], r["OP_SH"]) for r in out] == [("OP1", "OPEN")]
    bad_coords = deck.replace("'OP1' 'SHUT' 3* 2 2 /", "'OP1' 'SHUT' 9 9 9 /")
    with pytest.raises(ValueError, match="not acting"):
        compdat.df(spark, bad_coords).collect()


def test_icd_chain_same_date_redeclaration_keeps_last(spark):
    """Two WELSEGS declarations of one segment under ONE date: the
    LAST declaration wins deterministically (declaration-order
    tie-breakers, the engine-wide convention)."""
    from res2df_spark.modules.compdat import icd_chain

    deck = """
DATES
 1 JAN 2020 /
/
WELSEGS
 'OP1' 100.0 50.0 1* 'ABS' /
 2 2 1 1 110.0 60.0 0.1 /
/
WELSEGS
 'OP1' 100.0 50.0 1* 'ABS' /
 2 2 1 1 120.0 70.0 0.2 /
/
COMPSEGS
 'OP1' /
 1 1 1 1 100.0 110.0 4* 2 /
/
"""
    for _ in range(3):  # nondeterminism would flip across runs
        rows = icd_chain(spark, deck).collect()
        assert len(rows) == 1 and rows[0]["DIAMETER"] == 0.2


def test_seg2dicttree_dangling_and_no_edge(spark):
    """Dangling SEGNXT edges vanish (the reference's self-merge finds
    no upstream row); the no-edge fallback is ONE root, the lowest
    SEGIDX (reference rft.py:300-302)."""
    import pandas as pd

    from res2df_spark.modules.rft import seg2dicttree

    assert seg2dicttree(pd.DataFrame(columns=["SEGIDX", "SEGNXT"])) == {}
    dangling = pd.DataFrame([{"SEGIDX": 2, "SEGNXT": 1}])
    assert seg2dicttree(dangling) == {2: {}}
    no_edges = pd.DataFrame(
        [{"SEGIDX": 1, "SEGNXT": 0}, {"SEGIDX": 2, "SEGNXT": 0}]
    )
    assert seg2dicttree(no_edges) == {1: {}}
    real = pd.DataFrame(
        [
            {"SEGIDX": 1, "SEGNXT": None},
            {"SEGIDX": 2, "SEGNXT": 1},
            {"SEGIDX": 3, "SEGNXT": 2},
        ]
    )
    assert seg2dicttree(real) == {1: {2: {3: {}}}}


def test_gruptree_schema_stable_without_tree_keywords(spark):
    from res2df_spark.modules import gruptree

    deck = """
DATES
 1 JAN 2020 /
/
GRUPTREE
 'G1' 'FIELD' /
/
"""
    full = gruptree.df(spark, deck)
    empty = gruptree.df(spark, "RUNSPEC\nTITLE\nfoo\n")
    assert empty.dtypes == full.dtypes
    assert empty.count() == 0


def test_wcon_dates_without_global_window(spark):
    from res2df_spark.modules import wcon

    deck = """
DATES
 2 FEB 2021 /
/
WCONHIST
 'OP1' 'OPEN' 'ORAT' 100.0 10.0 1000.0 /
/
DATES
 3 FEB 2021 /
/
WCONPROD
 'OP1' 'OPEN' 'ORAT' 90.0 /
/
"""
    rows = {r["KEYWORD"]: r for r in wcon.df(spark, deck).collect()}
    assert str(rows["WCONHIST"]["DATE"]) == "2021-02-02"
    assert str(rows["WCONPROD"]["DATE"]) == "2021-02-03"
    # and the plan carries no unpartitioned window (the old ffill route)
    plan = wcon.df(spark, deck)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_require_consecutive_none_region_gets_value_error():
    """A Python None region value must hit the crafted NaN/NULL
    ValueError, not a TypeError from sorted() comparing None to int
    (code-review: the None guard ran after the sort)."""
    from res2df_spark.sinks.df2res import _require_consecutive

    with pytest.raises(ValueError, match="NaN/NULL"):
        _require_consecutive([1, None, 2], "SATNUM", "SWOF")
