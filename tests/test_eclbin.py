"""Eclipse binary format layer: writer↔reader round-trips plus decode
of the reference repo's real fixture files (eightcells / reek), gated
on their presence."""

from __future__ import annotations

import datetime
import io
import os

import numpy as np
import pandas as pd
import pytest

from res2df_spark.sources import eclbin

EIGHT = "/root/reference/tests/data/eightcells"
REEK = "/root/reference/tests/data/reek/eclipse/model"

needs_eight = pytest.mark.skipif(
    not os.path.isdir(EIGHT), reason="reference fixtures not present"
)
needs_reek = pytest.mark.skipif(
    not os.path.isdir(REEK), reason="reference fixtures not present"
)


def roundtrip(kw, typ, values):
    buf = io.BytesIO()
    eclbin.write_keyword(buf, kw, typ, values)
    [(k, t, v)] = list(eclbin.iter_keywords(buf.getvalue()))
    assert (k, t) == (kw, typ)
    return v


def test_roundtrip_numeric_types():
    assert roundtrip("INTS", "INTE", [1, -2, 3]).tolist() == [1, -2, 3]
    np.testing.assert_allclose(roundtrip("R", "REAL", [1.5, -2.25]), [1.5, -2.25])
    np.testing.assert_allclose(roundtrip("D", "DOUB", [1e-300, 3.14]), [1e-300, 3.14])
    assert roundtrip("L", "LOGI", [True, False, True]).tolist() == [True, False, True]


def test_roundtrip_char_and_blocking():
    vals = [f"W{i}" for i in range(250)]  # crosses the 105-string block limit
    assert roundtrip("WELLS", "CHAR", vals).tolist() == vals
    nums = list(range(2500))  # crosses the 1000-element block limit
    assert roundtrip("NUMS", "INTE", nums).tolist() == nums
    long = roundtrip("LONGSTR", "C016", ["abcdefghijklmnop"])
    assert long.tolist() == ["abcdefghijklmnop"]


def test_summary_write_read_roundtrip(tmp_path):
    start = datetime.datetime(2020, 1, 1)
    idx = pd.to_datetime(["2020-01-01", "2020-02-01", "2020-03-01"])
    wide = pd.DataFrame(
        {"FOPT": [0.0, 100.0, 250.0], "WOPR:OP_1": [10.0, 20.0, 30.0], "BPR:1,1,1": [5.0, 6.0, 7.0]},
        index=idx,
    )
    smspec = str(tmp_path / "CASE.SMSPEC")
    eclbin.write_summary(smspec, start, wide)
    with open(smspec, "rb") as f:
        sbuf = f.read()
    with open(str(tmp_path / "CASE.UNSMRY"), "rb") as f:
        ubuf = f.read()
    long = eclbin.summary_long_pandas(sbuf, ubuf)
    piv = long.pivot(index="DATE", columns="VECTOR", values="VALUE")
    assert sorted(piv.columns) == sorted(wide.columns)
    np.testing.assert_allclose(piv["FOPT"].to_numpy(), wide["FOPT"].to_numpy(), rtol=1e-6)
    assert list(piv.index) == list(idx)


def test_vector_naming_rules():
    names = eclbin.smspec_vector_names(
        np.array(["TIME", "FOPT", "WOPR", "GGPR", "BPR", "RPR", "CWIR", "SOFR", "WBHP"]),
        np.array(["", "", "OP_1", "G1", "", "", "OP_2", "OP_3", ":+:+:+:+"]),
        np.array([0, 0, 0, 0, 7, 3, 2, 5, 0]),
        nx=2, ny=2,
    )
    assert names == [
        "TIME", "FOPT", "WOPR:OP_1", "GGPR:G1", "BPR:1,2,2", "RPR:3",
        "CWIR:OP_2:2,1,1", "SOFR:OP_3:5", None,
    ]


def _simple_grid_bufs(nx=2, ny=1, nz=1, dx=100.0, dy=50.0, dz=10.0, actnum=None):
    """Rectangular corner-point grid written with our own writer."""
    buf = io.BytesIO()
    coord = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            coord += [i * dx, j * dy, 0.0, i * dx, j * dy, dz * nz]
    zcorn = []
    for k2 in range(2 * nz):
        z = dz * ((k2 + 1) // 2)
        zcorn += [z] * (4 * nx * ny)
    eclbin.write_keyword(buf, "FILEHEAD", "INTE", [3, 2007, 0, 0, 0, 0, 0])
    eclbin.write_keyword(buf, "GRIDHEAD", "INTE", [1, nx, ny, nz] + [0] * 96)
    eclbin.write_keyword(buf, "COORD", "REAL", coord)
    eclbin.write_keyword(buf, "ZCORN", "REAL", zcorn)
    eclbin.write_keyword(buf, "ACTNUM", "INTE", actnum if actnum else [1] * (nx * ny * nz))
    eclbin.write_keyword(buf, "ENDGRID", "INTE", [])
    return buf.getvalue()


def test_grid_geometry_rectangular():
    pdf = eclbin.grid_geometry_pandas(_simple_grid_bufs())
    assert len(pdf) == 2
    np.testing.assert_allclose(pdf["VOLUME"], [100.0 * 50 * 10] * 2)
    np.testing.assert_allclose(pdf["X"], [50.0, 150.0])
    np.testing.assert_allclose(pdf["Y"], [25.0, 25.0])
    np.testing.assert_allclose(pdf["Z"], [5.0, 5.0])
    np.testing.assert_allclose(pdf["Z_MIN"], [0.0, 0.0])
    np.testing.assert_allclose(pdf["Z_MAX"], [10.0, 10.0])
    assert pdf["GLOBAL_INDEX"].tolist() == [0, 1]
    assert pdf["ACTIVE_INDEX"].tolist() == [0, 1]
    assert pdf[["I", "J", "K"]].values.tolist() == [[1, 1, 1], [2, 1, 1]]


def test_grid_geometry_inactive_cells():
    pdf = eclbin.grid_geometry_pandas(_simple_grid_bufs(nx=3, actnum=[1, 0, 1]))
    assert pdf["GLOBAL_INDEX"].tolist() == [0, 2]
    assert pdf["ACTIVE_INDEX"].tolist() == [0, 1]
    assert pdf["I"].tolist() == [1, 3]


def test_init_vectors_length_filter_and_porv():
    buf = io.BytesIO()
    eclbin.write_keyword(buf, "INTEHEAD", "INTE", [0] * 95)
    eclbin.write_keyword(buf, "PORO", "REAL", [0.25, 0.30])
    eclbin.write_keyword(buf, "PORV", "REAL", [10.0, 0.0, 20.0])  # global length
    eclbin.write_keyword(buf, "WRONGLEN", "REAL", [1.0, 2.0, 3.0, 4.0])
    pdf = eclbin.init_vectors_pandas(
        buf.getvalue(), nactive=2, nglobal=3, actnum=np.array([1, 0, 1])
    )
    assert sorted(pdf.columns) == ["ACTIVE_INDEX", "PORO", "PORV"]
    np.testing.assert_allclose(pdf["PORV"], [10.0, 20.0])


def test_unrst_date_mnemonics():
    buf = io.BytesIO()
    for seq, (d, m, y), p in [(0, (1, 1, 2020), [1.0, 2.0]), (5, (1, 6, 2020), [3.0, 4.0])]:
        eclbin.write_keyword(buf, "SEQNUM", "INTE", [seq])
        head = [0] * 95
        head[64], head[65], head[66] = d, m, y
        eclbin.write_keyword(buf, "INTEHEAD", "INTE", head)
        eclbin.write_keyword(buf, "PRESSURE", "REAL", p)
    raw = buf.getvalue()
    first = eclbin.unrst_vectors_pandas(raw, 2, dates="first")
    last = eclbin.unrst_vectors_pandas(raw, 2, dates="last")
    byiso = eclbin.unrst_vectors_pandas(raw, 2, dates="2020-06-01")
    allsteps = eclbin.unrst_vectors_pandas(raw, 2, dates="all")
    np.testing.assert_allclose(first["PRESSURE"], [1.0, 2.0])
    np.testing.assert_allclose(last["PRESSURE"], [3.0, 4.0])
    np.testing.assert_allclose(byiso["PRESSURE"], [3.0, 4.0])
    assert len(allsteps) == 4 and set(allsteps["ACTIVE_INDEX"]) == {0, 1}


@needs_eight
def test_eightcells_family_decodes():
    kws = eclbin.read_keywords(f"{EIGHT}/EIGHTCELLS.EGRID")
    names = [k for k, _, _ in kws]
    assert "GRIDHEAD" in names and "ZCORN" in names
    geo = eclbin.grid_geometry_pandas(open(f"{EIGHT}/EIGHTCELLS.EGRID", "rb").read())
    assert len(geo) == 8  # 2x2x2, all active
    assert set(geo["I"]) == {1, 2} and geo["VOLUME"].min() > 0
    ini = eclbin.init_vectors_pandas(
        open(f"{EIGHT}/EIGHTCELLS.INIT", "rb").read(), nactive=8, nglobal=8,
        actnum=np.ones(8),
    )
    assert "PORO" in ini.columns and len(ini) == 8
    rst = eclbin.unrst_vectors_pandas(
        open(f"{EIGHT}/EIGHTCELLS.UNRST", "rb").read(), nactive=8, dates="first"
    )
    assert "PRESSURE" in rst.columns and len(rst) == 8


@needs_eight
def test_eightcells_summary_long():
    long = eclbin.summary_long_pandas(
        open(f"{EIGHT}/EIGHTCELLS.SMSPEC", "rb").read(),
        open(f"{EIGHT}/EIGHTCELLS.UNSMRY", "rb").read(),
    )
    assert {"DATE", "VECTOR", "VALUE"} == set(long.columns)
    assert (long.groupby("VECTOR").size() > 0).all()
    assert "FOPR" in set(long["VECTOR"])
    # dates strictly nondecreasing within a vector
    fopr = long[long["VECTOR"] == "FOPR"].sort_values("DATE")
    assert fopr["DATE"].is_monotonic_increasing


@needs_eight
def test_eightcells_duplicated_vectors_keep_first():
    d = f"{EIGHT}/eightcells_duplicated_summary_vector"
    long = eclbin.summary_long_pandas(
        open(f"{d}/EIGHTCELLS_DUPES.SMSPEC", "rb").read(),
        open(f"{d}/EIGHTCELLS_DUPES.UNSMRY", "rb").read(),
    )
    per_date = long.groupby(["VECTOR", "DATE"]).size()
    assert (per_date == 1).all()


@needs_reek
def test_reek_egrid_and_rft():
    geo = eclbin.grid_geometry_pandas(open(f"{REEK}/2_R001_REEK-0.EGRID", "rb").read())
    assert len(geo) > 1000 and (geo["VOLUME"] > 0).all()
    assert geo["ACTIVE_INDEX"].is_monotonic_increasing
    rft = eclbin.rft_pandas(open(f"{REEK}/2_R001_REEK-0.RFT", "rb").read())
    assert {"WELL", "DATE", "PRESSURE"} <= set(rft.columns)
    assert len(rft) > 0


@needs_eight
def test_spark_grid_table_and_summary(spark, tmp_path):
    df = eclbin.grid_table(
        spark, f"{EIGHT}/EIGHTCELLS.EGRID", init_path=f"{EIGHT}/EIGHTCELLS.INIT",
        unrst_path=f"{EIGHT}/EIGHTCELLS.UNRST", rstdates="first",
    )
    rows = df.orderBy("ACTIVE_INDEX").collect()
    assert len(rows) == 8 and rows[0]["PORO"] is not None and rows[0]["PRESSURE"] is not None
    sdf = eclbin.summary_long(spark, f"{EIGHT}/EIGHTCELLS.SMSPEC")
    assert sdf.filter("VECTOR = 'FOPR'").count() > 0


@needs_eight
def test_spark_summary_long_many_distributed(spark, tmp_path):
    import shutil

    for real in (0, 1):
        d = tmp_path / f"realization-{real}"
        d.mkdir()
        shutil.copy(f"{EIGHT}/EIGHTCELLS.SMSPEC", d / "CASE.SMSPEC")
        shutil.copy(f"{EIGHT}/EIGHTCELLS.UNSMRY", d / "CASE.UNSMRY")
    df = eclbin.summary_long_many(spark, str(tmp_path / "*" / "*"))
    per_real = {r["REAL"]: r["n"] for r in df.groupBy("REAL").count().withColumnRenamed("count", "n").collect()}
    assert set(per_real) == {"0", "1"} and per_real["0"] == per_real["1"] > 0


def test_corrupt_buffers_raise_valueerror():
    """Structure errors in binary input surface as EclFormatError
    (a ValueError) — never struct.error/UnicodeDecodeError/KeyError."""
    import io
    import random

    from res2df_spark.sources.eclbin import (
        iter_keywords,
        parse_smspec,
        write_keyword,
    )

    buf = io.BytesIO()
    write_keyword(buf, "DIMENS", "INTE", [2, 5, 5, 1, 0, 0])
    write_keyword(buf, "STARTDAT", "INTE", [1, 1, 2020])
    write_keyword(buf, "KEYWORDS", "CHAR", ["FOPT", "WOPR"])
    write_keyword(buf, "WGNAMES", "CHAR", ["", "OP1"])
    write_keyword(buf, "NUMS", "INTE", [0, 0])
    write_keyword(buf, "UNITS", "CHAR", ["SM3", "SM3/DAY"])
    valid = buf.getvalue()
    # the intact buffer parses
    assert parse_smspec(valid)["vectors"] == ["FOPT", "WOPR:OP1"]

    rng = random.Random(11)
    for case in (
        [valid[:cut] for cut in range(0, len(valid), 5)]
        + [bytes(rng.randbytes(n)) for n in (1, 9, 100)]
    ):
        for fn in (lambda b: list(iter_keywords(b)), parse_smspec):
            try:
                fn(case)
            except ValueError:
                pass  # EclFormatError or a plain ValueError is the contract
