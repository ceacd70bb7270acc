"""Auxiliary sources: zonemap (S8), parameters (S9), fipreports (S7)."""

from __future__ import annotations

from res2df_spark.modules import fipreports
from res2df_spark.sources.aux import (
    attach_parameters,
    load_parameters,
    parse_zonemap,
    zonemap_df,
)
from tests.conftest import rows


def test_parse_zonemap():
    # Reference semantics (common.py:859-952): a bare number is a SPAN
    # resolved against the previous entry's end layer (to = from + span),
    # ranges are absolute, a trailing color token is dropped, and later
    # entries overwrite earlier ones per layer.
    text = """
-- layer to zone
'Upper Zone' 1-3
Middle 4
'Lower' 5 - 6  #FF0000
"""
    got = parse_zonemap(text)
    assert ("Upper Zone", 1) in got and ("Upper Zone", 3) in got
    # Middle spans 4..4+4=8; layers 5-6 then overwritten by 'Lower'
    assert ("Middle", 4) in got and ("Middle", 7) in got and ("Middle", 8) in got
    assert ("Lower", 5) in got and ("Lower", 6) in got
    assert len(got) == 8


def test_zonemap_df(spark):
    # 'B' 3 is a span: layers 3..3+3=6, per the reference arithmetic
    df = zonemap_df(spark, "'A' 1-2\n'B' 3\n")
    assert rows(df, "K", "ZONE") == [
        (1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B"), (6, "B"),
    ]


def test_parameters_discovery(tmp_path):
    case = tmp_path / "real0" / "model"
    case.mkdir(parents=True)
    (tmp_path / "real0" / "parameters.txt").write_text("PORO_MEAN 0.25\nCASE base\n")
    (case / "parameters.json").write_text('{"SEED": 42}')
    params = load_parameters(str(case / "CASE.DATA"))
    assert params == {"PORO_MEAN": "0.25", "CASE": "base", "SEED": 42}


def test_attach_parameters(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    out = attach_parameters(df, {"CASE": "base", "SEED": 42})
    got = rows(out, "x", "CASE", "SEED")
    assert got == [(1, "base", 42), (2, "base", 42)]


# real Eclipse PRT shape: REPORT date lines, FIPNUM REPORT REGION block
# headers, positional colon-separated balance rows
PRT = """\
 NOISE
  REPORT   0     1 JAN 2020   *  RUN
                     : FIPNUM  REPORT REGION    1    :
 :CURRENTLY IN PLACE       :        1000.5           20.    1020.5:      500. :       10.        90.       100.:
 :OUTFLOW TO OTHER REGIONS :           2.5                     2.5:        0. :        0.         0.         0.:
  REPORT   1     1 FEB 2020   *  RUN
                     : FIPNUM  REPORT REGION    2    :
 :CURRENTLY IN PLACE       :                                   0. :        0. :                         9750.0:
"""


def test_fipreports(spark, tmp_path):
    p = tmp_path / "CASE.PRT"
    p.write_text(PRT)
    from datetime import date as _date

    out = fipreports.df(spark, str(p))
    got = rows(
        out, "DATE", "REGION", "DATATYPE",
        "STOIIP_OIL", "STOIIP_TOTAL", "WIIP_TOTAL", "GIIP_TOTAL",
    )
    assert (
        _date(2020, 1, 1), 1, "CURRENTLY IN PLACE", 1000.5, 1020.5, 500.0, 100.0
    ) in got
    assert (
        _date(2020, 1, 1), 1, "OUTFLOW TO OTHER REGIONS", 2.5, 2.5, 0.0, 0.0
    ) in got
    assert (
        _date(2020, 2, 1), 2, "CURRENTLY IN PLACE", None, 0.0, 0.0, 9750.0
    ) in got
    assert out.count() == 3


def test_parameters_yml(tmp_path):
    from res2df_spark.sources.aux import load_parameters

    (tmp_path / "parameters.yml").write_text("RMS_SEED: 422\nFWL: 1700.5\nLABEL: base\n")
    params = load_parameters(str(tmp_path / "CASE.DATA"))
    assert params["RMS_SEED"] == 422
    assert params["FWL"] == 1700.5
    assert params["LABEL"] == "base"


def test_parameters_yml_overrides_txt(tmp_path):
    # Reference load_all (parameters.py:89-115): first occurrence wins,
    # and find_parameter_files lists json before yml before txt.
    from res2df_spark.sources.aux import load_parameters

    (tmp_path / "parameters.yml").write_text("A: 1\nB: 2\n")
    (tmp_path / "parameters.txt").write_text("B 3\nC 4\n")
    params = load_parameters(str(tmp_path / "CASE.DATA"))
    assert params["A"] == 1
    assert params["B"] == 2  # yml beats txt in the same dir
    assert params["C"] == 4  # txt all-int column → ints (pandas inference)


def test_parameters_txt_comments_and_inference(tmp_path):
    from res2df_spark.sources.aux import load_parameters

    (tmp_path / "parameters.txt").write_text(
        "# full-line comment\nA 1.5  # trailing comment\nB 2\n"
    )
    params = load_parameters(str(tmp_path / "CASE.DATA"))
    # mixed int/float column → float for every value, as pandas infers
    assert params == {"A": 1.5, "B": 2.0}


def test_reversed_lyr_range_raises():
    import pytest

    from res2df_spark.sources.aux import parse_zonemap

    with pytest.raises(ValueError, match="bad lyr line"):
        parse_zonemap("'UpperReek' 5-3\n")


def test_fipreports_block_terminator_resets_region(spark, tmp_path):
    """Reference parity (fipreports.py:164-166): a '====' line closes
    the region block, so a later field-level balance sheet must NOT be
    stamped with the stale region."""
    prt = (
        " NOISE\n"
        "  REPORT   0     1 JAN 2020   *  RUN\n"
        "                     : FIPNUM  REPORT REGION    2    :\n"
        " :CURRENTLY IN PLACE       :        1000.5           20.    1020.5:      500. :       10.        90.       100.:\n"
        " ============================\n"
        " :CURRENTLY IN PLACE       :        9999.0            0.    9999.0:        0. :        0.         0.         0.:\n"
    )
    p = tmp_path / "TERM.PRT"
    p.write_text(prt)
    out = fipreports.df(spark, str(p))
    got = rows(out, "REGION", "STOIIP_OIL")
    assert got == [(2, 1000.5)]  # the post-terminator line is dropped


def test_fipreports_jly_month(spark, tmp_path):
    """Eclipse writes July as JLY; the date must parse, not go NULL."""
    from datetime import date as _date

    prt = (
        "  REPORT   7     1 JLY 2000   *  RUN\n"
        "                     : FIPNUM  REPORT REGION    1    :\n"
        " :CURRENTLY IN PLACE       :        1000.5           20.    1020.5:      500. :       10.        90.       100.:\n"
    )
    p = tmp_path / "JLY.PRT"
    p.write_text(prt)
    out = fipreports.df(spark, str(p))
    got = rows(out, "DATE", "REGION")
    assert got == [(_date(2000, 7, 1), 1)]


def test_fipreports_colon_repair(spark, tmp_path):
    """Reference parity (fipreports.py:176-186): some Eclipse versions
    omit the leading colon (and the one near column 27); the parser
    inserts them at fixed positions before splitting."""
    # leading colon missing; the second colon is present at position 27
    # of the STRIPPED line, as in the reference's fixture format
    prt = (
        "  REPORT   0     1 JAN 2020   *  RUN\n"
        "                     : FIPNUM  REPORT REGION    3    :\n"
        " CURRENTLY IN PLACE       :        1000.5           20.    1020.5:      500. :       10.        90.       100.:\n"
    )
    p = tmp_path / "NOCOLON.PRT"
    p.write_text(prt)
    out = fipreports.df(spark, str(p))
    got = rows(out, "REGION", "STOIIP_OIL", "STOIIP_TOTAL", "WIIP_TOTAL")
    assert got == [(3, 1000.5, 1020.5, 500.0)]
