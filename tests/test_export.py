"""Training-data export surfaces: WebDataset-style tar shards and
JSONL interchange (Spark's json writer IS line-delimited JSON —
cross-checked by reading it back with DuckDB)."""

from __future__ import annotations

import glob
import json
import tarfile

import duckdb
import pytest
from pyspark.sql import functions as F

from res2df_spark.llm.multimodal import export_tar_shards


@pytest.fixture()
def samples(spark):
    return spark.createDataFrame(
        [(i, bytes([i % 256] * (10 + i)), f"kind{i % 3}") for i in range(40)],
        "doc_id long, payload binary, kind string",
    )


def test_tar_shards_complete_and_deterministic(spark, samples, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_tar_shards(samples, out1, n_shards=4, meta_cols=["kind"])
    assert m1.agg(F.sum("n_samples")).collect()[0][0] == 40
    # same samples land in the same shards regardless of partitioning
    export_tar_shards(samples.repartition(7), out2, n_shards=4, meta_cols=["kind"])
    for f1 in sorted(glob.glob(out1 + "/*.tar")):
        f2 = out2 + "/" + f1.split("/")[-1]
        with tarfile.open(f1) as t1, tarfile.open(f2) as t2:
            assert t1.getnames() == t2.getnames()


def test_tar_members_roundtrip(spark, samples, tmp_path):
    out = str(tmp_path / "t")
    export_tar_shards(samples, out, n_shards=2, meta_cols=["kind"])
    want = {str(r.doc_id): (bytes(r.payload), r.kind) for r in samples.collect()}
    got = {}
    for f in glob.glob(out + "/*.tar"):
        with tarfile.open(f) as t:
            bins = {n[:-4]: t.extractfile(n).read() for n in t.getnames() if n.endswith(".bin")}
            metas = {
                n[:-5]: json.load(t.extractfile(n))
                for n in t.getnames()
                if n.endswith(".json")
            }
            for k, payload in bins.items():
                got[k] = (payload, metas[k]["kind"])
    assert got == want


def test_jsonl_roundtrip_spark_and_duckdb(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha text", 7.5), (2, 'quote " and \\ backslash', -1.0)],
        "doc_id long, text string, score double",
    )
    path = str(tmp_path / "docs_jsonl")
    df.coalesce(1).write.json(path)
    # Spark reads its own output back
    back = spark.read.json(path)
    assert sorted(tuple(r) for r in back.select("doc_id", "text", "score").collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # ...and so does DuckDB (interchange contract, not just self-consistency)
    part = glob.glob(path + "/part-*.json")[0]
    rows = duckdb.sql(
        f"SELECT doc_id, text, score FROM read_json_auto('{part}') ORDER BY doc_id"
    ).fetchall()
    assert rows == sorted(tuple(r) for r in df.collect())
