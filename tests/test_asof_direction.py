"""merge_asof direction family (forward / nearest) — round 8.

Plain-form equivalence to ``pandas.merge_asof`` on randomized inputs
(the same property layer as tests/test_properties.py's backward rows),
plus the chunked-equals-plain matrix across (direction, strict,
tolerance) including NULL keys and NULL left times.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from res2df_spark.operators.asof import asof_join, asof_join_chunked

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_right_lists = st.lists(
    st.tuples(st.integers(0, 100), st.floats(-10, 10, allow_nan=False)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


def _run(spark, left, right, **kw):
    ldf = spark.createDataFrame(
        [("k", t, i) for i, t in enumerate(left)], "k string, t long, qid long"
    )
    rdf = spark.createDataFrame(
        [("k", t, v) for t, v in right], "k string, t long, v double"
    )
    return {
        r["qid"]: r["v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            value_cols=["v"], **kw,
        ).collect()
    }


def _pandas(left, right, direction, strict=False, tol=None):
    lp = pd.DataFrame({"t": left, "qid": range(len(left))}).sort_values(
        "t", kind="mergesort"
    )
    rp = pd.DataFrame(right, columns=["t", "v"]).sort_values("t", kind="mergesort")
    return pd.merge_asof(
        lp, rp, on="t", direction=direction,
        allow_exact_matches=not strict, tolerance=tol,
    )


def _assert_matches(got, exp):
    for _, row in exp.iterrows():
        g = got[row["qid"]]
        if pd.isna(row["v"]):
            assert g is None, (row["qid"], row["t"], g)
        else:
            assert g == row["v"], (row["qid"], row["t"], row["v"], g)


@given(left=st.lists(st.integers(0, 100), min_size=1, max_size=20), right=_right_lists)
@_slow
def test_asof_forward_matches_pandas(spark, left, right):
    """asof_join(direction='forward') ≡ merge_asof(direction='forward')."""
    _assert_matches(
        _run(spark, left, right, direction="forward"),
        _pandas(left, right, "forward"),
    )


@given(left=st.lists(st.integers(0, 100), min_size=1, max_size=20), right=_right_lists)
@_slow
def test_asof_nearest_matches_pandas(spark, left, right):
    """asof_join(direction='nearest') ≡ merge_asof(direction='nearest'),
    equidistant ties resolving backward like pandas."""
    _assert_matches(
        _run(spark, left, right, direction="nearest"),
        _pandas(left, right, "nearest"),
    )


@given(
    left=st.lists(st.integers(0, 100), min_size=1, max_size=15),
    right=_right_lists,
    tol=st.integers(0, 20),
)
@_slow
def test_asof_nearest_tolerance_matches_pandas(spark, left, right, tol):
    """nearest + tolerance bounds each side's gap independently."""
    _assert_matches(
        _run(spark, left, right, direction="nearest", tolerance_expr=str(tol)),
        _pandas(left, right, "nearest", tol=tol),
    )


def test_asof_forward_strict_excludes_equal_time(spark):
    """strict forward (allow_exact_matches=False) skips the equal-time
    observation and takes the next one."""
    got = _run(
        spark, [10], [(10, 1.0), (12, 2.0)], direction="forward", strict=True
    )
    assert got == {0: 2.0}
    got = _run(spark, [10], [(10, 1.0)], direction="forward", strict=True)
    assert got == {0: None}


def test_asof_nearest_tie_resolves_backward(spark):
    """Equidistant backward/forward candidates pick the backward one."""
    got = _run(spark, [10], [(8, 1.0), (12, 2.0)], direction="nearest")
    assert got == {0: 1.0}


def test_asof_direction_validation(spark):
    ldf = spark.createDataFrame([("k", 1, 0)], "k string, t long, qid long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, ldf, on=["k"], left_time="t", right_time="t",
                  direction="sideways")


def _ts_fixture(spark):
    random.seed(11)
    base = dt.datetime(2024, 1, 1)
    rows_l, rows_r = [], []
    for i in range(150):
        k = random.choice(["a", "b", None])
        ts = (
            None
            if random.random() < 0.07
            else base + dt.timedelta(seconds=random.randint(0, 86400 * 90))
        )
        rows_l.append((k, ts, i))
    for j in range(120):
        k = random.choice(["a", "b", None])
        ts = base + dt.timedelta(seconds=random.randint(0, 86400 * 90))
        rows_r.append((k, ts, float(j)))
    ldf = spark.createDataFrame(rows_l, "k string, t timestamp, qid long")
    rdf = spark.createDataFrame(rows_r, "k string, t timestamp, v double")
    return ldf, rdf


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tol", [None, "INTERVAL '10' DAY"])
def test_chunked_equals_plain_direction_matrix(spark, direction, strict, tol):
    """asof_join_chunked ≡ plain asof_join for every direction, with
    NULL keys (null-safe carry grid) and NULL left times in play."""
    ldf, rdf = _ts_fixture(spark)
    kw = dict(
        on=["k"], left_time="t", right_time="t", value_cols=["v"],
        direction=direction, strict=strict, tolerance_expr=tol,
    )
    plain = asof_join(ldf, rdf, skew_safe=False, **kw)
    chunked = asof_join_chunked(ldf, rdf, chunk_seconds=86400 * 7, **kw)
    key = lambda r: (r["qid"],)  # noqa: E731
    assert sorted(plain.collect(), key=key) == sorted(chunked.collect(), key=key)


def test_forward_delegates_to_chunked_on_timestamp_axis(spark):
    """The skew-safe default covers every direction: a timestamp-axis
    forward/nearest call plans the chunked decomposition."""
    ldf, rdf = _ts_fixture(spark)
    for direction in ("forward", "nearest"):
        df = asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            value_cols=["v"], direction=direction, chunk_seconds=86400 * 7,
        )
        # the chunked path unions the carry rows into the observation
        # side - visible as a Union in the plan; the plain form has none
        # on the right side of its single window
        assert "Union" in df._jdf.queryExecution().optimizedPlan().toString()


def test_forward_null_left_time_gets_null_payload(spark):
    """A NULL left time must not match the earliest observation through
    the FOLLOWING frame (NULLS FIRST would put every observation in its
    frame) - it gets NULL payload like the backward form."""
    ldf = spark.createDataFrame(
        [("k", None, 0), ("k", 5, 1)], "k string, t long, qid long"
    )
    rdf = spark.createDataFrame([("k", 7, 42.0)], "k string, t long, v double")
    for direction in ("forward", "nearest"):
        got = {
            r["qid"]: r["v"]
            for r in asof_join(
                ldf, rdf, on=["k"], left_time="t", right_time="t",
                value_cols=["v"], direction=direction,
            ).collect()
        }
        assert got == {0: None, 1: 42.0}


def test_asof_date_axis_skew_safe_default(spark):
    """DATE-typed axes must survive the skew-safe default: timeline_span
    casts to timestamp before unix_micros (code-review regression — the
    pre-flip plain form handled dates, so the default must too)."""
    ldf = spark.createDataFrame(
        [("k", dt.date(2024, 1, 10), 0), ("k", dt.date(2024, 2, 1), 1)],
        "k string, t date, qid long",
    )
    rdf = spark.createDataFrame(
        [("k", dt.date(2024, 1, 5), 7.0)], "k string, t date, v double"
    )
    got = {
        r["qid"]: r["v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t", value_cols=["v"]
        ).collect()
    }
    assert got == {0: 7.0, 1: 7.0}


def test_asof_numeric_axis_rejects_chunk_params(spark):
    """Explicit chunk parameters on a numeric axis raise loudly instead
    of silently running the single-window form (mirror of the
    skew_safe=False conflict error)."""
    ldf = spark.createDataFrame([("k", 1, 0)], "k string, t long, qid long")
    with pytest.raises(ValueError, match="time axis is long"):
        asof_join(ldf, ldf, on=["k"], left_time="t", right_time="t",
                  value_cols=[], chunk_seconds=3600)
