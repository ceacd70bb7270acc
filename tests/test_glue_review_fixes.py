"""Regression tests for the round-8 glue-layer review findings
(cli.py / case.py / functions/vectors.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_DECK = """
START
 1 'JAN' 2000 /

WELSPECS
 'OP1' 'G1' 10 10 1000.0 'OIL' /
/

COMPDAT
 'OP1' 10 10 1 2 'OPEN' /
/
"""


def test_case_accepts_lowercase_data_path(spark, tmp_path):
    """ResdataCase('mycase.data') must read THAT file back on a
    case-sensitive filesystem instead of rebuilding '<root>.DATA'."""
    from res2df_spark.case import ResdataCase

    p = tmp_path / "mycase.data"
    p.write_text(_DECK)
    case = ResdataCase(spark, str(p))
    assert "WELSPECS" in case.deck_text
    assert case.compdat().count() == 2
    # the uppercase spelling still resolves normally
    p2 = tmp_path / "UPPER.DATA"
    p2.write_text(_DECK)
    assert "COMPDAT" in ResdataCase(spark, str(p2)).deck_text


def test_curate_dedup_exact_null_id_never_keeper(spark, tmp_path):
    """In a duplicate group [NULL, 5] the real id wins keeper — the
    ascending window's NULLS-FIRST default kept the anonymous row."""
    import duckdb

    from res2df_spark.cli import curate_main

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(None, "same text"), (5, "same text"), (7, "other")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "deduped")
    assert curate_main(["dedup-exact", src, "-o", out]) == 0
    ids = {
        r[0]
        for r in duckdb.sql(f"SELECT doc_id FROM '{out}/*.parquet'").fetchall()
    }
    assert 5 in ids and 7 in ids


_EIGHT = "/root/reference/tests/data/eightcells"


@pytest.mark.skipif(
    not __import__("os").path.isdir(_EIGHT), reason="fixtures not present"
)
def test_summary_column_keys_whitespace_stripped(capsys):
    """'FOPT, W*' must match the W-vectors — the unstripped ' W*' glob
    anchored to a leading space and silently matched nothing."""
    from res2df_spark.cli import main

    rc = main(
        [
            "summary", f"{_EIGHT}/EIGHTCELLS", "-o", "-",
            "--column_keys", "FOPT, W*",
        ]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    header = captured.splitlines()[0]
    assert "FOPT" in header
    assert any(h.startswith("W") for h in header.split(","))


def test_cosine_similarity_null_vector_is_null(spark):
    """A NULL vector yields NULL similarity (skip-corrupt-rows), not a
    fabricated 0.0; zero-norm non-null vectors still score 0.0."""
    from res2df_spark.functions.vectors import cosine_similarity

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
            (3, [0.0, 0.0], [1.0, 0.0]),
        ],
        "i long, a array<double>, b array<double>",
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", cosine_similarity(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert got[1] == pytest.approx(1.0)
    assert got[2] is None
    assert got[3] == 0.0


def test_seed_centroids_shared_rule(spark):
    """The extracted seeding helper: first-k-by-id, ids 0..k-1."""
    from res2df_spark.llm.similarity import seed_centroids

    emb = spark.createDataFrame(
        [(i, [float(i)]) for i in (5, 3, 9, 1)],
        "vec_id long, embedding array<double>",
    )
    rows = seed_centroids(emb, 2).orderBy("centroid_id").collect()
    assert [(r["centroid_id"], r["centroid"]) for r in rows] == [
        (0, [1.0]),
        (1, [3.0]),
    ]


def test_csv2res_summary_empty_csv_clear_error(tmp_path):
    """A header-only CSV exits with the crafted message, not a raw
    IndexError."""
    from res2df_spark.cli import csv2res_main

    p = tmp_path / "empty.csv"
    p.write_text("DATE,FOPT\n")
    with pytest.raises(SystemExit, match="no data rows"):
        csv2res_main(["summary", str(p), "-o", str(tmp_path / "OUT.SMSPEC")])
