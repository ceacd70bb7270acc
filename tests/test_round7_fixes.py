"""Round-7 fixes from the round-6 verdict brief:

* the ``truncate_lineage`` checkpoint-dir sync must use normalized-path
  EQUALITY of the parent, not ``endswith`` (a conf change to a directory
  whose path is a suffix of the old one was silently skipped);
* ``rolling_agg`` is skew-safe by default (delegates to the chunked
  decomposition with a timeline-span-derived ``chunk_seconds``);
* ``sessionize_chunked``'s ``chunk_seconds`` defaults to the same
  span derivation (zero-config skew safety).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from res2df_spark.operators.eventanalytics import rolling_agg
from res2df_spark.operators.sessionize import sessionize, sessionize_chunked
from res2df_spark.operators.timechunk import derive_chunk_seconds
from res2df_spark.session import _ck_parts, _same_ck_dir


def test_ck_dir_comparison_rules():
    # local forms: one plain absolute path; bare (scheme-less) and
    # explicit file: stay DISTINGUISHABLE (r8 — a bare conf qualifies
    # to fs.defaultFS, which need not be local)
    assert _ck_parts("/a/b") == ("", "/a/b")
    assert _ck_parts("/a/b/") == ("", "/a/b")
    assert _ck_parts("file:/a/b") == ("file:", "/a/b")
    assert _ck_parts("file:///a/b") == ("file:", "/a/b")
    assert _ck_parts("/a//b/./c") == ("", "/a/b/c")
    # remote URIs keep scheme://authority, normalize the path
    assert _ck_parts("hdfs://nn:8020/a/b/") == ("hdfs://nn:8020", "/a/b")
    assert _ck_parts("s3a://bkt/a//b") == ("s3a://bkt", "/a/b")
    assert _ck_parts(None) is None and _ck_parts("") is None
    # equality: never a suffix match
    assert _same_ck_dir("/a/ck", "/a/ck")
    assert not _same_ck_dir("/ck", "/data/ck")
    assert not _same_ck_dir("/data/ck", "/ck")
    # a SCHEME-LESS conf must match the default-FS-qualified form
    # getCheckpointDir returns on an HDFS/S3 cluster — demanding
    # authority equality would re-point every truncation
    assert _same_ck_dir("/ckpt", "hdfs://nn:8020/ckpt")
    assert _same_ck_dir("file:/ckpt", "file:///ckpt")
    # but DIFFERENT paths, or an explicit conf authority that does not
    # match, are different directories
    assert not _same_ck_dir("/other", "hdfs://nn:8020/ckpt")
    assert not _same_ck_dir("hdfs://nn2/ckpt", "hdfs://nn:8020/ckpt")
    assert not _same_ck_dir("hdfs://nn/ckpt", "/ckpt")


def test_checkpoint_dir_repointed_on_suffix_conf_change(spark, tmp_path):
    """Flip the conf between two dirs where the new one's path is a
    string SUFFIX of the old parent: the round-6 ``endswith`` check
    skipped the re-point and silently kept checkpointing to the old
    directory."""
    from res2df_spark.session import CHECKPOINT_DIR_CONF, truncate_lineage

    short = str(tmp_path / "ck")
    # a directory whose absolute path ENDS WITH `short`'s path
    long = str(tmp_path / "outer") + short
    spark.conf.set(CHECKPOINT_DIR_CONF, long)
    try:
        truncate_lineage(spark.range(3))
        cur = spark.sparkContext.getCheckpointDir()
        # compare PATHS (the context qualifies the dir with file:)
        assert _ck_parts(cur.rsplit("/", 1)[0])[1] == _ck_parts(long)[1]
        # conf change to the suffix dir: must RE-POINT
        spark.conf.set(CHECKPOINT_DIR_CONF, short)
        truncate_lineage(spark.range(3))
        cur = spark.sparkContext.getCheckpointDir()
        assert _ck_parts(cur.rsplit("/", 1)[0])[1] == _ck_parts(short)[1]
        # and stays pinned (no fresh uuid dir per truncation)
        truncate_lineage(spark.range(3))
        assert spark.sparkContext.getCheckpointDir() == cur
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _fixture(spark, n=600, n_keys=7, step_s=311):
    base = datetime(2024, 1, 1)
    rows = [
        (i, i % n_keys, base + timedelta(seconds=i * step_s), float(i % 13))
        for i in range(n)
    ]
    rows.append((n, 1, None, 5.0))  # NULL-ts row exercises the peer group
    return _events(spark, rows)


def test_derive_chunk_seconds_span_and_floor(spark):
    ev = _fixture(spark, n=600, step_s=311)
    # span = 599*311 s; target 10 chunks -> ceil(span/10), above floor
    span = 599 * 311
    got = derive_chunk_seconds(ev, "ts", 60, target_chunks=10)
    assert got == -(-span // 10)
    # floor wins when span/target < floor
    assert derive_chunk_seconds(ev, "ts", 10**9, target_chunks=10) == 10**9
    # all-NULL timestamps -> None (nothing to chunk)
    nulls = _events(spark, [(0, 1, None, 1.0)])
    assert derive_chunk_seconds(nulls, "ts", 60) is None
    # default target = 8x parallelism
    dflt = derive_chunk_seconds(ev, "ts", 1)
    par = spark.sparkContext.defaultParallelism
    assert dflt == max(1, -(-span // (8 * par)))


def test_rolling_agg_default_is_skew_safe_and_exact(spark):
    ev = _fixture(spark)
    cols = ["event_id", "n_window", "sum_window"]
    plain = sorted(
        tuple(r)
        for r in rolling_agg(
            ev, "ts", ["user_id"], "value", 3600, skew_safe=False
        ).select(*cols).collect()
    )
    dflt = rolling_agg(ev, "ts", ["user_id"], "value", 3600)
    assert sorted(tuple(r) for r in dflt.select(*cols).collect()) == plain
    # the default plan is the chunked decomposition (partitions carry
    # the derived __chunk key), not one window per key
    plan = dflt._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan
    # explicit opt-out is the single-window plan
    off = rolling_agg(ev, "ts", ["user_id"], "value", 3600, skew_safe=False)
    assert "__chunk" not in off._jdf.queryExecution().executedPlan().toString()


def test_rolling_agg_all_null_ts_falls_back_to_plain(spark):
    ev = _events(spark, [(0, 1, None, 1.0), (1, 1, None, 2.0), (2, 2, None, 3.0)])
    got = {
        r.event_id: (r.n_window, r.sum_window)
        for r in rolling_agg(ev, "ts", ["user_id"], "value", 3600).collect()
    }
    # NULL peer group per key, same as the plain window's semantics
    assert got[0] == (2, 3.0) and got[1] == (2, 3.0) and got[2] == (1, 3.0)


def test_rolling_agg_explicit_chunk_skips_derivation(spark):
    ev = _fixture(spark, n=50)
    cols = ["event_id", "n_window", "sum_window"]
    a = sorted(
        tuple(r)
        for r in rolling_agg(
            ev, "ts", ["user_id"], "value", 3600, chunk_seconds=7200
        ).select(*cols).collect()
    )
    b = sorted(
        tuple(r)
        for r in rolling_agg(
            ev, "ts", ["user_id"], "value", 3600, skew_safe=False
        ).select(*cols).collect()
    )
    assert a == b


def test_sessionize_chunked_default_chunk_is_derived_and_exact(spark):
    ev = _fixture(spark, n=400, step_s=977)
    plain = sorted(
        tuple(r)
        for r in sessionize(
            ev, "ts", ["user_id"], 3600, tiebreak=["event_id"]
        ).select("event_id", "session_id").collect()
    )
    dflt = sorted(
        tuple(r)
        for r in sessionize_chunked(
            ev, "ts", ["user_id"], 3600, tiebreak=["event_id"]
        ).select("event_id", "session_id").collect()
    )
    assert dflt == plain


def _cmp_methods(spark, ev, window_s, chunk_s):
    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    cols = ["event_id", "n_window", "sum_window"]
    outs = {}
    for m in ("prefix", "recompute"):
        outs[m] = sorted(
            tuple(r)
            for r in rolling_agg_chunked(
                ev, "ts", ["user_id"], "value", window_s,
                chunk_seconds=chunk_s, method=m,
            ).select(*cols).collect()
        )
    return outs


def test_prefix_engine_matches_recompute_on_dense_fixture(spark):
    ev = _fixture(spark, n=500, n_keys=3, step_s=97)
    outs = _cmp_methods(spark, ev, window_s=3600, chunk_s=7200)
    # float sums: compare with a tolerance for FP reordering, counts exact
    for (ea, na, sa), (eb, nb, sb) in zip(outs["prefix"], outs["recompute"]):
        assert (ea, na) == (eb, nb)
        if sa is None or sb is None:
            assert sa == sb
        else:
            assert abs(sa - sb) < 1e-9


def test_prefix_engine_ieee_semantics(spark):
    """NaN/±Inf must poison only frames they are IN — a plain running
    sum would stay NaN forever after the value leaves the window."""
    base = datetime(2024, 1, 1)
    nan, inf = float("nan"), float("inf")
    rows = [
        # user 1: a NaN at t=0 leaves the 1h frame by t=2h
        (0, 1, base, nan),
        (1, 1, base + timedelta(minutes=30), 1.0),
        (2, 1, base + timedelta(hours=3), 2.0),
        # user 2: +inf then -inf in one frame -> NaN; later frames clean
        (3, 2, base, inf),
        (4, 2, base + timedelta(minutes=10), -inf),
        (5, 2, base + timedelta(hours=5), 7.0),
        # user 3: inf alone -> inf while in frame
        (6, 3, base, inf),
        (7, 3, base + timedelta(minutes=5), 3.0),
        (8, 3, base + timedelta(hours=6), 4.0),
        # user 4: all-NULL values -> NULL sums, exact counts
        (9, 4, base, None),
        (10, 4, base + timedelta(minutes=1), None),
    ]
    ev = _events(spark, rows)
    outs = _cmp_methods(spark, ev, window_s=3600, chunk_s=3600)

    def norm(t):
        e, n, s = t
        if s is not None and s != s:
            s = "nan"
        return (e, n, s)

    assert [norm(t) for t in outs["prefix"]] == [
        norm(t) for t in outs["recompute"]
    ]
    got = {e: (n, s) for e, n, s in outs["prefix"]}
    assert got[1][1] != got[1][1]  # NaN still in frame
    assert got[2] == (1, 2.0)  # NaN left the frame
    assert got[4][1] != got[4][1]  # +inf + -inf = NaN
    assert got[5] == (1, 7.0)
    assert got[7] == (2, inf)
    assert got[8] == (1, 4.0)
    assert got[9] == (1, None) and got[10] == (2, None)


def test_prefix_engine_integer_sums_exact(spark):
    ev = spark.createDataFrame(
        [
            (i, i % 2, datetime(2024, 1, 1) + timedelta(seconds=i * 171), (i % 11) - 5)
            for i in range(300)
        ],
        "event_id long, user_id long, ts timestamp, value long",
    )
    outs = _cmp_methods(spark, ev, window_s=1800, chunk_s=3600)
    assert outs["prefix"] == outs["recompute"]
    # schema parity: sum of bigint stays bigint under the prefix engine
    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    t = dict(
        rolling_agg_chunked(
            ev, "ts", ["user_id"], "value", 1800, chunk_seconds=3600
        ).dtypes
    )
    assert t["sum_window"] == "bigint" and t["n_window"] == "bigint"


def test_prefix_engine_matches_bruteforce_randomized(spark):
    """Property check: the prefix-difference chunked engine equals a
    per-row brute-force frame computation on randomized timelines —
    duplicate timestamps (peers), clustered bursts, negative values,
    NULL values, several chunk widths."""
    from hypothesis import given, settings, strategies as st

    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    @settings(max_examples=12, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),          # key
                st.integers(min_value=0, max_value=20_000),     # seconds
                st.one_of(
                    st.none(),
                    st.floats(
                        min_value=-50, max_value=50,
                        allow_nan=False, allow_infinity=False,
                    ),
                ),
            ),
            min_size=1,
            max_size=40,
        ),
        window_s=st.sampled_from([60, 900, 3600]),
        chunk_mult=st.sampled_from([1, 2, 7]),
    )
    def check(rows, window_s, chunk_mult):
        data = [
            (i, k, datetime(2024, 1, 1) + timedelta(seconds=s), v)
            for i, (k, s, v) in enumerate(rows)
        ]
        ev = _events(spark, data)
        got = {
            r.event_id: (r.n_window, r.sum_window)
            for r in rolling_agg_chunked(
                ev, "ts", ["user_id"], "value", window_s,
                chunk_seconds=chunk_mult * window_s,
            ).collect()
        }
        for i, (k, s, _v) in enumerate(rows):
            frame = [
                (k2, s2, v2)
                for (k2, s2, v2) in rows
                if k2 == k and s - window_s <= s2 <= s
            ]
            vals = [v for (_, _, v) in frame if v is not None]
            want_n = len(frame)
            want_s = sum(vals) if vals else None
            n, sm = got[i]
            assert n == want_n, (i, rows, window_s, chunk_mult)
            if want_s is None:
                assert sm is None, (i, rows)
            else:
                assert sm is not None and abs(sm - want_s) < 1e-9, (i, rows)

    check()


def test_dedup_keep_default_is_agg_and_equal(spark):
    """dedup_keep now delegates to the partial-agg form by default
    (same policy as rolling_agg); skew_safe=False pins the window."""
    from res2df_spark.operators.windows import dedup_keep

    rows = [
        (0, "w1", 1, 10.0),
        (1, "w1", 3, 11.0),
        (2, "w1", 2, 12.0),
        (3, "w2", 1, 13.0),
        (4, None, 2, 14.0),   # NULL key is a real group in both forms
        (5, None, 1, 15.0),
    ]
    df = spark.createDataFrame(rows, "rid long, well string, idx long, v double")
    for keep in ("first", "last"):
        agg = sorted(
            tuple(r)
            for r in dedup_keep(df, ["well"], ["idx", "rid"], keep=keep).collect()
        )
        win = sorted(
            tuple(r)
            for r in dedup_keep(
                df, ["well"], ["idx", "rid"], keep=keep, skew_safe=False
            ).collect()
        )
        assert agg == win and len(agg) == 3
    # the default plans as an aggregate, not a window
    plan = (
        dedup_keep(df, ["well"], ["idx"], keep="last")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    # empty keys: global keep-last — one row, via a global aggregate
    # (the window form would be a single-partition global window)
    top = dedup_keep(df, [], ["idx", "rid"], keep="last").collect()
    assert len(top) == 1 and top[0].rid == 1


def test_prefix_engine_float_and_decimal_types(spark):
    """Schema + value parity for the remaining numeric dtypes: FLOAT
    sums widen to double (Spark's rule) and DECIMAL sums stay exact
    decimal under the native-decimal prefix path."""
    from pyspark.sql import functions as F

    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    base = spark.createDataFrame(
        [
            (i, i % 2, datetime(2024, 1, 1) + timedelta(seconds=i * 313), f"{(i % 7) - 3}.25")
            for i in range(120)
        ],
        "event_id long, user_id long, ts timestamp, raw string",
    )
    for typ in ("float", "decimal(10,2)"):
        ev = base.withColumn("value", F.col("raw").cast(typ)).drop("raw")
        outs = {}
        for m in ("prefix", "recompute"):
            df = rolling_agg_chunked(
                ev, "ts", ["user_id"], "value", 1800,
                chunk_seconds=3600, method=m,
            )
            outs[m] = sorted(
                tuple(r) for r in df.select("event_id", "n_window", "sum_window").collect()
            )
            outs[m + "_t"] = dict(df.dtypes)["sum_window"]
        assert outs["prefix_t"] == outs["recompute_t"], typ
        for (ea, na, sa), (eb, nb, sb) in zip(outs["prefix"], outs["recompute"]):
            assert (ea, na) == (eb, nb), typ
            if typ.startswith("decimal"):
                assert sa == sb, (typ, ea)
            else:
                assert (sa is None) == (sb is None) and (
                    sa is None or abs(sa - sb) < 1e-6
                ), (typ, ea)


def _asof_fixture(spark, n_left=120, n_right=90, seed=7):
    import random

    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    left = [
        (i, i % 5, base + timedelta(seconds=rng.randrange(0, 500_000)))
        for i in range(n_left)
    ]
    left += [(n_left, 1, None), (n_left + 1, 99, base)]  # NULL time; keyless-match
    # NULL join keys are one group to the window form (r8 ADVICE: the
    # chunked carry must join null-safe or cross-chunk NULL-key matches
    # vanish) — one obs early, one left row a day later, one left row
    # far later (cross-chunk carry), one left row before any obs
    left += [
        (n_left + 2, None, base + timedelta(days=1)),
        (n_left + 3, None, base + timedelta(days=30)),
        (n_left + 4, None, base - timedelta(days=1)),
    ]
    right = [
        (
            j,
            j % 5,
            base + timedelta(seconds=rng.randrange(0, 500_000)),
            float(j % 13),
        )
        for j in range(n_right)
    ]
    # duplicate observation timestamps on one key (tiebreak coverage)
    right += [(n_right, 2, right[0][2], 77.0), (n_right + 1, 2, right[0][2], 88.0)]
    right += [(n_right + 2, None, base, 42.0)]  # NULL-key observation
    ldf = spark.createDataFrame(left, "lid long, user_id long, lts timestamp")
    rdf = spark.createDataFrame(
        right, "rid long, user_id long, rts timestamp, obs double"
    )
    return ldf, rdf


@pytest.mark.parametrize(
    "strict,tol", [(False, None), (True, None), (False, "INTERVAL '1' DAY")]
)
def test_asof_chunked_equals_plain(spark, strict, tol):
    from res2df_spark.operators.asof import asof_join, asof_join_chunked

    ldf, rdf = _asof_fixture(spark)
    kwargs = dict(
        on=["user_id"], left_time="lts", right_time="rts",
        value_cols=["obs", "rid"], tolerance_expr=tol, strict=strict,
        suffix="_m",
    )
    plain = sorted(repr(tuple(r)) for r in asof_join(ldf, rdf, **kwargs).collect())
    for chunk_s in (3600, 50_000, None):  # None = derived default
        chunked = sorted(
            repr(tuple(r))
            for r in asof_join_chunked(
                ldf, rdf, chunk_seconds=chunk_s, **kwargs
            ).collect()
        )
        assert chunked == plain, (strict, tol, chunk_s)


def test_asof_chunked_carry_crosses_empty_chunks(spark):
    """A left row whose nearest observation is many chunks back must
    still match it — the chunk-grain carry ffills across gaps."""
    from res2df_spark.operators.asof import asof_join_chunked

    base = datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(0, 1, base + timedelta(days=30))], "lid long, user_id long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        [(0, 1, base, 42.0)], "rid long, user_id long, rts timestamp, obs double"
    )
    got = asof_join_chunked(
        ldf, rdf, on=["user_id"], left_time="lts", right_time="rts",
        value_cols=["obs"], chunk_seconds=3600,
    ).collect()
    assert len(got) == 1 and got[0].obs == 42.0


def test_asof_chunked_rejects_numeric_axis(spark):
    from res2df_spark.operators.asof import asof_join_chunked

    ldf = spark.createDataFrame([(1, 1.0)], "user_id long, lts double")
    rdf = spark.createDataFrame([(1, 0.5, 9.0)], "user_id long, rts double, obs double")
    with pytest.raises(ValueError, match="timestamp"):
        asof_join_chunked(
            ldf, rdf, on=["user_id"], left_time="lts", right_time="rts"
        )


def test_rolling_agg_chunked_validation_still_applies(spark):
    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    ev = _fixture(spark, n=20)
    with pytest.raises(ValueError, match="chunk_seconds"):
        rolling_agg_chunked(
            ev, "ts", ["user_id"], "value", 3600, chunk_seconds=60
        )
