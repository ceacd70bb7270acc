"""Sink/writer family (SURVEY §2.2 K1–K5)."""

from __future__ import annotations

import os

from res2df_spark.sinks.writers import (
    df_to_include,
    rle_encode,
    rle_encode_distributed,
    write_dataframe,
    write_parquet_with_metadata,
)
from tests.conftest import rows


def test_df_to_include_defaults_and_quoting(spark):
    df = spark.createDataFrame(
        [("OP1", 1, 1.5, "OPEN"), ("OP2", 2, None, None)],
        "well string, i int, kh double, st string",
    )
    text = df_to_include(df.orderBy("well"), "COMPDAT", ["well", "i", "kh", "st"])
    lines = text.splitlines()
    assert lines[0] == "COMPDAT"
    assert lines[1] == "  'OP1' 1 1.5 'OPEN' /"
    assert lines[2] == "  'OP2' 2 /"  # trailing 1* defaults dropped
    assert lines[3] == "/"


def test_df_to_include_inner_default_kept(spark):
    df = spark.createDataFrame([("OP1", None, "OPEN")], "well string, i int, st string")
    text = df_to_include(df, "TEST", ["well", "i", "st"])
    assert "  'OP1' 1* 'OPEN' /" in text


def test_rle_encode():
    assert rle_encode([2, 2, 2, 5]) == "3*2 5"
    assert rle_encode([]) == ""
    assert rle_encode([1]) == "1"
    assert rle_encode([7, 7]) == "2*7"


def test_rle_encode_distributed(spark):
    vals = [1, 1, 1, 2, 2, 3, 1]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx int, v int"
    )
    out = rle_encode_distributed(df, "idx", "v")
    assert rows(out, "start_idx", "run_length", "value") == [
        (0, 3, 1),
        (3, 2, 2),
        (5, 1, 3),
        (6, 1, 1),
    ]
    # driver-side render from collapsed runs matches the full-vector RLE
    runs = out.orderBy("start_idx").collect()
    text = " ".join(
        f"{r.run_length}*{r.value}" if r.run_length > 1 else str(r.value) for r in runs
    )
    assert text == rle_encode(vals)


def test_write_csv_and_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    p = str(tmp_path / "out_csv")
    write_dataframe(df, p, fmt="csv")
    back = spark.read.option("header", True).csv(p)
    assert back.count() == 2

    p2 = str(tmp_path / "out_parquet")
    write_parquet_with_metadata(
        df, p2, {"id": {"unit": "SM3", "is_total": True}}
    )
    back2 = spark.read.parquet(p2)
    assert back2.schema["id"].metadata["unit"] == "SM3"
    assert back2.schema["id"].metadata["is_total"] is True


def test_write_stdout(spark, capsys):
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    write_dataframe(df, "-")
    out = capsys.readouterr().out
    assert "id,s" in out and "1,x" in out
