"""Reshape operators (SURVEY §2.7: R1/R2/R6)."""

from __future__ import annotations

from datetime import date

from res2df_spark.operators.reshape import (
    box_explode,
    melt,
    stack_dated_columns,
    unroll_range,
)
from tests.conftest import rows


def test_unroll_range(spark):
    df = spark.createDataFrame(
        [("OP1", 1, 3), ("OP2", 2, 2), ("OP3", 5, 4), ("OP4", None, 7)],
        "well string, k1 int, k2 int",
    )
    out = unroll_range(df, "k1", "k2", "k")
    assert rows(out, "well", "k") == [
        ("OP1", 1),
        ("OP1", 2),
        ("OP1", 3),
        ("OP2", 2),
        # OP3 (5, 4): inverted bounds emit NO row, like the reference's
        # empty range(K1, K2+1) (compdat.py:460-463)
        ("OP4", None),  # null bound → pass-through
    ]


def test_unroll_keep_bounds(spark):
    df = spark.createDataFrame([("w", 1, 2)], "well string, k1 int, k2 int")
    out = unroll_range(df, "k1", "k2", "k", keep_bounds=True)
    assert set(out.columns) == {"well", "k1", "k2", "k"}


def test_box_explode(spark):
    df = spark.createDataFrame([("F1", 1, 2, 10, 11)], "f string, i1 int, i2 int, j1 int, j2 int")
    out = box_explode(df, {"i": ("i1", "i2"), "j": ("j1", "j2")})
    assert rows(out, "f", "i", "j") == [
        ("F1", 1, 10),
        ("F1", 1, 11),
        ("F1", 2, 10),
        ("F1", 2, 11),
    ]


def test_melt(spark):
    df = spark.createDataFrame([(1, 10, 1.5), (2, 20, 2.5)], "id int, a int, b double")
    out = melt(df, id_cols=["id"], value_cols=["a", "b"], var_name="var", value_name="val")
    assert rows(out, "id", "var", "val") == [
        (1, "a", 10.0),
        (1, "b", 1.5),
        (2, "a", 20.0),
        (2, "b", 2.5),
    ]


def test_stack_dated_columns(spark):
    df = spark.createDataFrame(
        [(1, 100.0, 200.0)],
        ["pillar", "OWC@2000-01-01", "OWC@2001-01-01"],
    )
    out = stack_dated_columns(
        df, id_cols=["pillar"], dated_cols=["OWC@2000-01-01", "OWC@2001-01-01"]
    )
    assert rows(out, "pillar", "VARIABLE", "DATE", "VALUE") == [
        (1, "OWC", date(2000, 1, 1), 100.0),
        (1, "OWC", date(2001, 1, 1), 200.0),
    ]


def test_explode_no_shuffle(spark):
    df = spark.createDataFrame([("w", 1, 100)], "well string, k1 int, k2 int")
    out = unroll_range(df, "k1", "k2", "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # explode is partition-local
