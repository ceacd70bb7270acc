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


def test_df2res_grid_property(spark):
    from res2df_spark.sinks.df2res import df2res_grid_property

    # active cells 0,1,2,5 in a 10-cell global grid
    g = spark.createDataFrame(
        [(0, 100.0), (1, 100.0), (2, 200.0), (5, 300.0)],
        "GLOBAL_INDEX long, PERMX double",
    )
    text = df2res_grid_property(g, "PERMX", global_size=10)
    body = " ".join(text.splitlines()[1:-1]).split()
    # decode N*V back to the dense vector
    dense = []
    for tok in body:
        if "*" in tok:
            n, v = tok.split("*")
            dense.extend([float(v)] * int(n))
        else:
            dense.append(float(tok))
    assert dense == [100.0, 100.0, 200.0, 0.0, 0.0, 300.0, 0.0, 0.0, 0.0, 0.0]
    assert text.startswith("PERMX") and text.rstrip().endswith("/")


def test_df2res_grid_property_int(spark):
    from res2df_spark.sinks.df2res import df2res_grid_property

    g = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 4)], "GLOBAL_INDEX long, FIPNUM int"
    )
    text = df2res_grid_property(g, "FIPNUM", int_dtype=True)
    assert "3*1" in text and "4" in text and "." not in text.split("\n", 1)[1]
