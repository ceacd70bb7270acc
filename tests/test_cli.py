"""CLI integration (SURVEY §3.1 / §5 layer 4)."""

from __future__ import annotations

from res2df_spark import cli

DECK = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 3 4 1000.0 'OIL' /
/
COMPDAT
  'OP1' 2* 1 2 'OPEN' /
/
SWOF
  0.1 0.0 1.0 0.0
  0.9 1.0 0.0 0.0
/
"""


def test_cli_compdat_stdout(spark, tmp_path, capsys):
    deck = tmp_path / "T.DATA"
    deck.write_text(DECK)
    assert cli.main(["compdat", str(deck), "-o", "-"]) == 0
    out = capsys.readouterr().out
    assert "WELL,I,J,K,OP_SH" in out
    assert "OP1,3,4,1,OPEN,2020-01-01" in out


def test_cli_satfunc(spark, tmp_path, capsys):
    deck = tmp_path / "T.DATA"
    deck.write_text(DECK)
    assert cli.main(["satfunc", str(deck), "-o", "-"]) == 0
    out = capsys.readouterr().out
    assert "SWOF" in out and "SATNUM" in out


def test_cli_no_matching_keywords(spark, tmp_path, capsys):
    deck = tmp_path / "T.DATA"
    deck.write_text("START\n 1 JAN 2020 /\n")
    # table families return None when the deck has no matching keywords
    assert cli.main(["pvt", str(deck), "-o", "-"]) == 1


import os

import pytest

_EIGHT = "/root/reference/tests/data/eightcells"


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_summary_binary(capsys):
    from res2df_spark.cli import main

    assert main(["summary", f"{_EIGHT}/EIGHTCELLS", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].split(",")[:3] == ["DATE", "VECTOR", "VALUE"]
    assert any("FOPT" in line for line in out[1:])


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_grid_binary(capsys):
    from res2df_spark.cli import main

    assert main(["grid", f"{_EIGHT}/EIGHTCELLS.DATA", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    header = out[0].split(",")
    assert {"I", "J", "K", "ACTIVE_INDEX"} <= set(header)
    assert len(out) == 9  # 8 cells + header


_REEK = "/root/reference/tests/data/reek/eclipse/model"


@pytest.mark.skipif(not os.path.isdir(_REEK), reason="fixtures not present")
def test_cli_nnc_binary(capsys):
    from res2df_spark.cli import main

    assert main(["nnc", f"{_REEK}/2_R001_REEK-0", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].split(",")[:6] == ["I1", "J1", "K1", "I2", "J2", "K2"]
    assert len(out) == 3287  # 3286 NNCs + header


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_trans_binary(capsys):
    from res2df_spark.cli import main

    assert main(["trans", f"{_EIGHT}/EIGHTCELLS", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    # 2x2x2 grid: 4 face-pairs per direction
    assert len(out) == 13
    assert "DIR" in out[0].split(",") and "TRAN" in out[0].split(",")


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_pillars_binary(capsys):
    from res2df_spark.cli import main

    assert main(["pillars", f"{_EIGHT}/EIGHTCELLS", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 5  # 2x2 pillars + header
    assert "PILLAR" in out[0].split(",")


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_wellconnstatus_binary(capsys):
    from res2df_spark.cli import main

    assert main(["wellconnstatus", f"{_EIGHT}/EIGHTCELLS", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].split(",")[:4] == ["WELL", "I", "J", "K"]
    assert any("OP1" in line for line in out[1:])


@pytest.mark.skipif(not os.path.isdir(_REEK), reason="fixtures not present")
def test_cli_fipreports_binary(capsys):
    from res2df_spark.cli import main

    assert main(["fipreports", f"{_REEK}/2_R001_REEK-0.PRT", "-o", "-"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) > 1


@pytest.mark.skipif(not os.path.isdir(_EIGHT), reason="fixtures not present")
def test_cli_summary_resampled_wide(capsys):
    from res2df_spark.cli import main

    assert main([
        "summary", f"{_EIGHT}/EIGHTCELLS",
        "--time_index", "monthly", "--column_keys", "FOPT,FOPR", "-o", "-",
    ]) == 0
    out = capsys.readouterr().out.splitlines()
    header = out[0].split(",")
    assert header[0] == "DATE" and set(header[1:]) == {"FOPT", "FOPR"}
    assert len(out) > 2  # one row per monthly spine point
