"""Regression tests for the round-8 sources/ review findings."""

from __future__ import annotations

import datetime

import pytest

from res2df_spark.sources.deck import deck_records, parse_deck, read_deck


def test_include_after_quoted_glued_terminator(tmp_path):
    """A '/' glued to a CLOSED quoted token ('OIL'/) ends the record, so
    a following INCLUDE is a directive — it used to pass through as
    deck text and the include file silently vanished."""
    inc = tmp_path / "wells.inc"
    inc.write_text("COMPDAT\n 'OP1' 1 1 1 1 'OPEN' /\n/\n")
    deck = tmp_path / "CASE.DATA"
    deck.write_text(
        "WELSPECS\n 'OP1' 'G1' 1 2 3* 'OIL'/\n/\n"
        "INCLUDE\n 'wells.inc' /\n"
    )
    text = read_deck(str(deck))
    assert "COMPDAT" in text
    recs = parse_deck(text)
    assert any(r["KEYWORD"] == "COMPDAT" for r in recs)


def test_include_quoted_path_with_slashes_not_terminator(tmp_path):
    """A quoted token whose quote is still open at a '/' (path chars)
    does NOT close the record."""
    sub = tmp_path / "sub"
    sub.mkdir()
    inc = sub / "w.inc"
    inc.write_text("COMPDAT\n 'OP2' 1 1 1 1 'OPEN' /\n/\n")
    deck = tmp_path / "CASE.DATA"
    deck.write_text(f"INCLUDE\n '{sub}/w.inc' /\n")
    assert "COMPDAT" in read_deck(str(deck))


def test_welspecs_opm_defaults(spark):
    """Defaulted WELSPECS items surface with the opm schema defaults
    (reference parse_opmio_deckrecord), not NULL."""
    r = deck_records(
        spark, "WELSPECS\n 'OP1' 'G1' 10 10 2000 'OIL' /\n/\n", "WELSPECS"
    ).collect()[0]
    assert r["DRAIN_RADIUS"] == 0.0
    assert r["INFLOW_EQ"] == "STD"
    assert r["AUTO_SHUTIN"] == "SHUT"
    assert r["CROSSFLOW"] == "YES"
    assert r["P_TABLE"] == 0
    assert r["DENSITY_CALC"] == "SEG"
    assert r["FIP_REGION"] == 0
    assert r["WELL_MODEL"] == "STD"
    assert r["POLYMER_TABLE"] == 0


def test_tabdims_eqldims_opm_defaults(spark):
    """'TABDIMS\\n 1* 2 /' yields NTSFUN 1 (the opm default), not NULL —
    the region count satfunc sizing reads."""
    r = deck_records(spark, "TABDIMS\n 1* 2 /\n", "TABDIMS").collect()[0]
    assert r["NTSFUN"] == 1 and r["NTPVT"] == 2 and r["NSSFUN"] == 20
    r = deck_records(spark, "EQLDIMS\n/\n", "EQLDIMS").collect()[0]
    assert r["NTEQUL"] == 1


def test_table_non_multiple_payload_raises():
    """A multi-row table payload that is not a multiple of the column
    count is corrupt (a dropped value shifts every later column) — it
    must raise, not emit a shifted phantom row."""
    with pytest.raises(ValueError, match="not a multiple"):
        parse_deck("SWOF\n 0.1 0.0 1.0 0.0  0.2 0.1 0.9 0.0  0.3 0.2 /\n")
    # single short row (EQUIL-style defaults) still pads
    recs = parse_deck("EQUIL\n 2000 200 2100 /\n")
    assert len([r for r in recs if r["KEYWORD"] == "EQUIL"]) == 1


def test_unrst_missing_date_raises_clearly():
    """Requesting a date no restart step carries raises the reference's
    explicit error, not pandas' 'No objects to concatenate'; a datetime
    argument matches its date."""
    import io

    from res2df_spark.sources.eclbin import (
        unrst_vectors_pandas,
        write_keyword,
    )

    buf = io.BytesIO()
    write_keyword(buf, "SEQNUM", "INTE", [1])
    intehead = [0] * 95
    intehead[64], intehead[65], intehead[66] = 3, 2, 2001  # day, month, year
    write_keyword(buf, "INTEHEAD", "INTE", intehead)
    write_keyword(buf, "PRESSURE", "REAL", [250.0, 251.0])
    raw = buf.getvalue()
    with pytest.raises(ValueError, match="not found in UNRST"):
        unrst_vectors_pandas(raw, 2, dates="1999-01-01")
    # datetime.datetime with the right date part matches
    out = unrst_vectors_pandas(raw, 2, dates=datetime.datetime(2001, 2, 3))
    assert len(out) == 2


def test_grid_geometry_slab_equivalence(monkeypatch):
    """K-slab processing is arithmetic-identical to the one-shot form:
    force 1-layer slabs and compare against the all-in-one-slab
    result."""
    import io

    import numpy as np

    from res2df_spark.sources import eclbin
    from res2df_spark.sources.eclbin import write_keyword

    nx, ny, nz = 2, 2, 3
    buf = io.BytesIO()
    write_keyword(buf, "GRIDHEAD", "INTE", [1, nx, ny, nz])
    coord = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            coord += [i * 100.0, j * 100.0, 1000.0, i * 100.0 + 5, j * 100.0, 2000.0]
    write_keyword(buf, "COORD", "REAL", coord)
    rng = np.random.RandomState(3)
    zcorn = (1000 + rng.rand(8 * nx * ny * nz) * 100).tolist()
    write_keyword(buf, "ZCORN", "REAL", zcorn)
    write_keyword(buf, "ACTNUM", "INTE", [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1])
    raw = buf.getvalue()

    one_shot = eclbin.grid_geometry_pandas(raw)  # one slab covers nz
    monkeypatch.setattr(eclbin, "_GEOM_SLAB_CELLS", 1)  # 1 layer/slab
    sliced = eclbin.grid_geometry_pandas(raw)
    assert one_shot.equals(sliced)
    assert list(one_shot.columns) == [
        "I", "J", "K", "X", "Y", "Z", "Z_MIN", "Z_MAX", "VOLUME",
        "GLOBAL_INDEX", "ACTIVE_INDEX",
    ]
    assert (one_shot["GLOBAL_INDEX"].diff().dropna() > 0).all()
    assert len(one_shot) == 10  # 12 cells, 2 inactive
