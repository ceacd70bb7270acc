"""Order-dependent operators (SURVEY §2.6: W1/W3/W4/W5, A5)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from res2df_spark.operators.windows import (
    dedup_keep,
    ffill,
    repair_duplicate_timestamps,
    status_changes,
)
from tests.conftest import rows


def test_ffill_date_cursor(spark):
    # W1: DATES rows set the cursor; following records inherit it.
    df = spark.createDataFrame(
        [(1, "2020-01-01"), (2, None), (3, None), (4, "2020-02-01"), (5, None)],
        "idx int, d string",
    )
    out = ffill(df, cols=["d"], order_by=["idx"], out_names=["eff"])
    assert rows(out, "idx", "eff") == [
        (1, "2020-01-01"),
        (2, "2020-01-01"),
        (3, "2020-01-01"),
        (4, "2020-02-01"),
        (5, "2020-02-01"),
    ]


def test_ffill_partitioned(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None), ("b", 1, None), ("b", 2, 20), ("b", 3, None)],
        "k string, idx int, v int",
    )
    out = ffill(df, cols=["v"], order_by=["idx"], partition_by=["k"])
    assert rows(out, "k", "idx", "v") == [
        ("a", 1, 10),
        ("a", 2, 10),
        ("b", 1, None),
        ("b", 2, 20),
        ("b", 3, 20),
    ]


def test_dedup_keep_last_and_first(spark):
    df = spark.createDataFrame(
        [("w", 1, "OPEN"), ("w", 2, "SHUT"), ("w", 3, "OPEN"), ("x", 1, "SHUT")],
        "well string, idx int, st string",
    )
    last = dedup_keep(df, keys=["well"], order_by=["idx"], keep="last")
    assert rows(last, "well", "idx", "st") == [("w", 3, "OPEN"), ("x", 1, "SHUT")]
    first = dedup_keep(df, keys=["well"], order_by=["idx"], keep="first")
    assert rows(first, "well", "idx", "st") == [("w", 1, "OPEN"), ("x", 1, "SHUT")]


def test_status_changes(spark):
    # W3: emit first row and every state flip.
    df = spark.createDataFrame(
        [
            ("c1", 1, "OPEN"),
            ("c1", 2, "OPEN"),
            ("c1", 3, "SHUT"),
            ("c1", 4, "SHUT"),
            ("c1", 5, "OPEN"),
            ("c2", 1, "SHUT"),
        ],
        "conn string, idx int, st string",
    )
    out = status_changes(df, "st", order_by=["idx"], partition_by=["conn"])
    assert rows(out, "conn", "idx", "st") == [
        ("c1", 1, "OPEN"),
        ("c1", 3, "SHUT"),
        ("c1", 5, "OPEN"),
        ("c2", 1, "SHUT"),
    ]


def test_repair_duplicate_timestamps(spark):
    # W5: k-th duplicate gets ts + (k-1) units.
    t = datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [("u", t, 1), ("u", t, 2), ("u", t, 3), ("v", t, 1)],
        "k string, ts timestamp, tie int",
    )
    out = repair_duplicate_timestamps(
        df, ts_col="ts", partition_by=["k"], tiebreak=["tie"], unit="SECOND", out_col="fixed"
    )
    got = rows(out, "k", "tie", "fixed")
    assert got == [
        ("u", 1, datetime(2020, 1, 1, 0, 0, 0)),
        ("u", 2, datetime(2020, 1, 1, 0, 0, 1)),
        ("u", 3, datetime(2020, 1, 1, 0, 0, 2)),
        ("v", 1, datetime(2020, 1, 1, 0, 0, 0)),
    ]


def test_window_plan_single_shuffle(spark):
    # The ffill plan must contain exactly one Exchange (the window's).
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("idx"), F.col("id").alias("v")
    )
    out = ffill(df, cols=["v"], order_by=["idx"], partition_by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
