"""ERT forward-model step hooks: command templates and placeholder
validation must work without ert installed (the dummy-shell path)."""

from __future__ import annotations

import pytest

from res2df_spark.hooks.forward_model_steps import (
    Csv2ResSpark,
    CurateSpark,
    ForwardModelStepValidationError,
    Res2CsvSpark,
    installable_forward_model_steps,
)


def test_installable_steps_registry():
    steps = installable_forward_model_steps()
    assert [s().name for s in steps] == [
        "RES2CSV_SPARK", "CSV2RES_SPARK", "RES2DF_CURATE_SPARK",
    ]


def test_res2csv_command_template_and_validation():
    step = Res2CsvSpark()
    assert "<SUBCOMMAND>" in step.command and "<OUTPUT>" in step.command
    assert step.default_mapping["<XARG1>"] == ""
    # argList mirrors the command minus the executable, post-substitution
    ok = {"argList": ["equil", "--output", "equil.csv"] + [""] * 10}
    step.validate_pre_experiment(ok)
    with pytest.raises(ForwardModelStepValidationError, match="SUBCOMMAND"):
        step.validate_pre_experiment(
            {"argList": ["<SUBCOMMAND>", "--output", "out.csv"]}
        )
    with pytest.raises(ForwardModelStepValidationError, match="OUTPUT"):
        step.validate_pre_experiment(
            {"argList": ["equil", "--output", "<OUTPUT>"]}
        )


def test_csv2res_validation():
    step = Csv2ResSpark()
    step.validate_pre_experiment(
        {"argList": ["equil", "--output", "equil.inc", "equil.csv"]}
    )
    with pytest.raises(ForwardModelStepValidationError, match="CSVFILE"):
        step.validate_pre_experiment(
            {"argList": ["equil", "--output", "equil.inc", "<CSVFILE>"]}
        )


def test_curate_validation():
    step = CurateSpark()
    step.validate_pre_experiment(
        {"argList": ["quality", "docs", "--output", "kept"]}
    )
    for bad, slot in (
        (["<OP>", "docs", "--output", "kept"], "OP"),
        (["quality", "<INPUT>", "--output", "kept"], "INPUT"),
        (["quality", "docs", "--output", "<OUTPUT>"], "OUTPUT"),
    ):
        with pytest.raises(ForwardModelStepValidationError, match=slot):
            step.validate_pre_experiment({"argList": bad})


def test_documentation_present():
    for cls in installable_forward_model_steps():
        doc = cls.documentation()
        assert doc is not None
