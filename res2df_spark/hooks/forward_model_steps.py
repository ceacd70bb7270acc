"""ERT forward-model step registration for the engine's CLIs — the
equivalent of the reference's workflow-tool hook surface
(/root/reference/src/res2df/hook_implementations/forward_model_steps.py:36-141).

A "forward model step" is a declarative command template an ensemble
workflow tool (ERT) can schedule per realization: a command line with
``<PLACEHOLDER>`` slots the workflow config substitutes, plus
pre-experiment validation that the required slots were actually filled.
There are no dataflow semantics here — the steps simply register the
``res2csv-spark`` / ``csv2res-spark`` / ``res2df-curate-spark`` CLI
invocations so an ERT config can call them like the reference's
RES2CSV/CSV2RES.

Like the reference, everything degrades gracefully when ``ert`` is not
installed: the plugin decorator becomes transparent and the base
classes become empty shells, so the command templates and the
validation logic stay importable and unit-testable in any environment
(this container has no ert).
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any

try:  # pragma: no cover - ert is not installed in the test container
    from ert import (
        ForwardModelStepDocumentation,
        ForwardModelStepJSON,
        ForwardModelStepPlugin,
        ForwardModelStepValidationError,
    )
    from ert import plugin as ert_plugin

    HAVE_ERT = True
except ModuleNotFoundError:
    HAVE_ERT = False

    def ert_plugin(name: str = "") -> Callable:  # type: ignore[no-redef]
        def decorator(func: Callable) -> Callable:
            return func

        return decorator

    class ForwardModelStepDocumentation(dict):  # type: ignore[no-redef]
        def __init__(self, **kw: Any) -> None:
            super().__init__(**kw)

    ForwardModelStepJSON = dict  # type: ignore[misc,assignment]

    class ForwardModelStepPlugin:  # type: ignore[no-redef]
        """Shell base: records the command template like ert's real
        plugin class so validation logic is testable without ert."""

        def __init__(self, name: str, command: list, default_mapping=None):
            self.name = name
            self.command = command
            self.default_mapping = default_mapping or {}

    class ForwardModelStepValidationError(ValueError):  # type: ignore[no-redef]
        pass


class Res2CsvSpark(ForwardModelStepPlugin):
    """FORWARD_MODEL RES2CSV_SPARK(<SUBCOMMAND>=..., <OUTPUT>=...) —
    the reference's RES2CSV template over this engine's CLI; ten
    optional ``<XARGn>`` slots pass subcommand options through."""

    def __init__(self) -> None:
        super().__init__(
            name="RES2CSV_SPARK",
            command=[
                shutil.which("res2csv-spark") or "res2csv-spark",
                "<SUBCOMMAND>",
                "--output",
                "<OUTPUT>",
                *[f"<XARG{num + 1}>" for num in range(10)],
                "--",
                "<ECLBASE>",
            ],
            default_mapping={f"<XARG{num + 1}>": "" for num in range(10)},
        )

    def validate_pre_experiment(self, fm_json) -> None:
        if fm_json["argList"][0] == "<SUBCOMMAND>":
            raise ForwardModelStepValidationError(
                "You must supply a value for SUBCOMMAND to RES2CSV_SPARK"
            )
        if fm_json["argList"][2] == "<OUTPUT>":
            raise ForwardModelStepValidationError(
                "You must supply a value for OUTPUT to RES2CSV_SPARK"
            )

    @staticmethod
    def documentation():
        return ForwardModelStepDocumentation(
            description=(
                "Convert reservoir simulator input and output files into "
                "CSV files with the res2csv-spark CLI (Spark-engine "
                "equivalent of res2csv). Run res2csv-spark --help for the "
                "supported subcommands; pass subcommand options through "
                "<XARG1>..<XARG10>."
            ),
            category="utility.eclipse",
            examples=(
                "FORWARD_MODEL RES2CSV_SPARK(<SUBCOMMAND>=equil, "
                "<OUTPUT>=equil.csv)"
            ),
        )


class Csv2ResSpark(ForwardModelStepPlugin):
    """FORWARD_MODEL CSV2RES_SPARK(<SUBCOMMAND>=..., <CSVFILE>=...,
    <OUTPUT>=...) — the reference's CSV2RES template over this
    engine's include-file/summary writers."""

    def __init__(self) -> None:
        super().__init__(
            name="CSV2RES_SPARK",
            command=[
                shutil.which("csv2res-spark") or "csv2res-spark",
                "<SUBCOMMAND>",
                "--output",
                "<OUTPUT>",
                "<CSVFILE>",
            ],
        )

    def validate_pre_experiment(self, fm_json) -> None:
        if fm_json["argList"][0] == "<SUBCOMMAND>":
            raise ForwardModelStepValidationError(
                "You must supply a value for SUBCOMMAND to CSV2RES_SPARK"
            )
        if fm_json["argList"][2] == "<OUTPUT>":
            raise ForwardModelStepValidationError(
                "You must supply a value for OUTPUT to CSV2RES_SPARK"
            )
        if fm_json["argList"][3] == "<CSVFILE>":
            raise ForwardModelStepValidationError(
                "You must supply a value for CSVFILE to CSV2RES_SPARK"
            )

    @staticmethod
    def documentation():
        return ForwardModelStepDocumentation(
            description=(
                "Convert CSV files into simulator include files (or "
                "synthetic binary summaries) with the csv2res-spark CLI."
            ),
            category="utility.eclipse",
            examples=(
                "FORWARD_MODEL CSV2RES_SPARK(<SUBCOMMAND>=equil, "
                "<CSVFILE>=equil.csv, <OUTPUT>=include/equil.inc)"
            ),
        )


class CurateSpark(ForwardModelStepPlugin):
    """FORWARD_MODEL RES2DF_CURATE_SPARK(<OP>=..., <INPUT>=...,
    <OUTPUT>=...) — schedules a curation stage (quality gate, dedup,
    sample, split, scrub, chunk, lm-score, stats, export-tar) as a
    workflow step; beyond the reference's surface, matching this
    engine's curation CLI."""

    def __init__(self) -> None:
        super().__init__(
            name="RES2DF_CURATE_SPARK",
            command=[
                shutil.which("res2df-curate-spark") or "res2df-curate-spark",
                "<OP>",
                "<INPUT>",
                "--output",
                "<OUTPUT>",
                *[f"<XARG{num + 1}>" for num in range(10)],
            ],
            default_mapping={f"<XARG{num + 1}>": "" for num in range(10)},
        )

    def validate_pre_experiment(self, fm_json) -> None:
        for idx, slot in ((0, "OP"), (1, "INPUT"), (3, "OUTPUT")):
            if fm_json["argList"][idx] == f"<{slot}>":
                raise ForwardModelStepValidationError(
                    f"You must supply a value for {slot} to "
                    "RES2DF_CURATE_SPARK"
                )

    @staticmethod
    def documentation():
        return ForwardModelStepDocumentation(
            description=(
                "Run one training-data curation stage over a parquet "
                "corpus with the res2df-curate-spark CLI; stages chain by "
                "feeding one step's OUTPUT to the next step's INPUT."
            ),
            category="utility.templating",
            examples=(
                "FORWARD_MODEL RES2DF_CURATE_SPARK(<OP>=quality, "
                '<INPUT>=docs, <OUTPUT>=kept, <XARG1>="--keep-only")'
            ),
        )


@ert_plugin(name="RES2CSV_SPARK")
def installable_forward_model_steps() -> list[type]:
    """The ert plugin entry point (reference parity: the same shape as
    ``res2df.hook_implementations.forward_model_steps``)."""
    return [Res2CsvSpark, Csv2ResSpark, CurateSpark]
