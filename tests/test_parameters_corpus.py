"""The reference's parameters corpus, ported
(/root/reference/tests/test_parameters.py, 201 lines): txt/yml/json
discovery in the case dir and parents, grouped-json key dropping,
json-over-txt precedence, and the colon-namespaced keys.  All pure
driver-side file I/O — no Spark session needed."""
import json
import os

from res2df_spark.sources.aux import load_parameters


def _case(tmp_path):
    model = tmp_path / "realization-0" / "iter-0" / "eclipse" / "model"
    model.mkdir(parents=True)
    data = model / "MYCASE.DATA"
    data.write_text("RUNSPEC\n")
    return data


def test_parameters_txt_in_casedir(tmp_path):
    data = _case(tmp_path)
    (data.parent / "parameters.txt").write_text("FOO 1\nBAR 3")
    got = load_parameters(str(data))
    assert got["FOO"] == 1
    assert got["BAR"] == 3


def test_parameters_txt_in_parent_with_namespaced_key(tmp_path):
    data = _case(tmp_path)
    (data.parent.parent / "parameters.txt").write_text(
        "FOO 1\nBAR 3\nCONTACT:BARF 2700"
    )
    got = load_parameters(str(data))
    assert got["BAR"] == 3
    assert got["CONTACT:BARF"] == 2700


def test_parameters_json_drops_grouped_keys(tmp_path):
    data = _case(tmp_path)
    dump_me = {"FOO": 1, "BAR": "com", "CONTACT:BARF": 2700,
               "CONTACT": {"BARF": 2700}}
    (data.parent / "parameters.json").write_text(json.dumps(dump_me))
    got = load_parameters(str(data))
    assert got["FOO"] == 1
    assert got["BAR"] == "com"
    assert got["CONTACT:BARF"] == 2700
    # the grouped duplicate is dropped, exactly like the reference's
    # load() (parameters.py:178-183)
    assert "CONTACT" not in got


def test_parameters_yml(tmp_path):
    data = _case(tmp_path)
    (data.parent / "parameters.yml").write_text(
        "FOO: 1\nBAR: com\n'CONTACT:BARF': 2700\n"
    )
    got = load_parameters(str(data))
    assert got["BAR"] == "com"
    assert got["CONTACT:BARF"] == 2700


def test_multiple_parameters_json_beats_txt(tmp_path):
    """json in the case dir has precedence over txt in the parent; the
    merged dict carries all three keys (reference
    test_multiple_parameters)."""
    data = _case(tmp_path)
    (data.parent.parent / "parameters.txt").write_text("FOO 1\nBAR 4")
    (data.parent / "parameters.json").write_text(
        json.dumps({"BAR": 5, "COM": 6})
    )
    got = load_parameters(str(data))
    assert len(got) == 3
    assert got["BAR"] == 5
    assert got["FOO"] == 1
    assert got["COM"] == 6


def test_no_parameter_files(tmp_path):
    data = _case(tmp_path)
    assert load_parameters(str(data)) == {}


def test_vertical_placement_nearest_wins(tmp_path):
    """Nearest directory beats parents (reference
    test_find_parameter_files_verticalplacement)."""
    data = _case(tmp_path)
    (data.parent / "parameters.txt").write_text("X 1")
    (data.parent.parent / "parameters.txt").write_text("X 2\nY 9")
    got = load_parameters(str(data))
    assert got["X"] == 1  # nearest dir wins
    assert got["Y"] == 9  # parents still contribute new keys
