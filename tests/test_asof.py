"""As-of join (SURVEY §2.4 J9/J10) — union-window construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from res2df_spark.operators.asof import asof_join
from tests.conftest import rows


def _frames(spark):
    left = spark.createDataFrame(
        [("w", 10, "q1"), ("w", 20, "q2"), ("w", 5, "q0"), ("x", 15, "q3")],
        "k string, t int, qid string",
    )
    right = spark.createDataFrame(
        [("w", 8, 1.0), ("w", 10, 2.0), ("w", 18, 3.0), ("y", 1, 9.0)],
        "k string, t int, v double",
    )
    return left, right


def test_asof_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"])
    assert rows(out, "k", "t", "qid", "v") == [
        ("w", 5, "q0", None),   # no observation at or before t=5
        ("w", 10, "q1", 2.0),   # equal-time observation visible
        ("w", 20, "q2", 3.0),
        ("x", 15, "q3", None),  # key with no observations at all
    ]


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"], strict=True
    )
    got = dict(((r[0], r[1]), r[3]) for r in rows(out, "k", "t", "qid", "v"))
    # strict: the t=10 observation is NOT visible to the t=10 query
    assert got[("w", 10)] == 1.0
    assert got[("w", 20)] == 3.0
    assert got[("w", 5)] is None


def test_asof_single_shuffle(spark):
    # Core scale property: ONE exchange (on the key), no broadcast nested
    # loop, no range-join explosion.
    left = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("t"), F.lit("q").alias("qid")
    )
    right = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("t"), F.rand(1).alias("v")
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def test_asof_row_wise_null_payload(spark):
    """merge_asof takes the matched row WHOLE: a NULL field in the
    nearest observation stays NULL instead of falling back to an older
    row (and with a tolerance, an older row must never leak in)."""
    from res2df_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10, 1)], "k string, t long, qid long")
    right = spark.createDataFrame(
        [("k", 1, 5.0), ("k", 10, None)], "k string, t long, v double"
    )
    plain = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
    ).collect()
    assert plain[0]["v"] is None
    tol = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        value_cols=["v"], tolerance_expr="3",
    ).collect()
    assert tol[0]["v"] is None
