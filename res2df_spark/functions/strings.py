"""String functions.

``well_template_to_regex`` reimplements the reference's well-pattern
matcher semantics (/root/reference/src/res2df/common.py:955-980): ``*``
and ``?`` are glob wildcards; a leading ``\\`` PERMITS a template that
starts with a wildcard (the reference strips the backslash and still
expands wildcards — it does NOT turn the template into a literal).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def well_template_to_regex(
    template: str, anchored_end: bool = True, reject_leading_wildcard: bool = False
) -> str:
    """Glob well template → regex string (driver-side, templates are
    query constants).

    ``anchored_end=False`` reproduces the reference well matcher's
    PREFIX semantics (common.py:980 uses bare ``re.match`` with no
    ``$``: 'OP*1' matches OP213 because 'OP.*1' prefix-matches it) —
    the WELOPEN/WLIST well-matching path needs that form; summary
    column-key matching stays fully anchored (resdata fnmatch
    semantics).  ``reject_leading_wildcard=True`` raises the
    reference's ValueError for templates starting with ``*``/``?``
    unless escaped with a leading backslash (common.py:973-977)."""
    if reject_leading_wildcard and template.startswith(("*", "?")):
        raise ValueError(
            "Well template not allowed to start with a wildcard character: "
            f"Must be preceded with a \\: {template}"
        )
    # the reference strips a leading backslash and STILL expands
    # wildcards ('\*P1' matches every well ending in P1); it exists
    # only because a BARE leading wildcard means a well list elsewhere
    template = template.removeprefix("\\")
    out = []
    for ch in template:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + ("$" if anchored_end else "")


def matches_template(col: Column | str, template: str) -> Column:
    """Column predicate: well name matches glob template."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(well_template_to_regex(template))


def pair_key(a: Column | str, b: Column | str, sep: str = "-") -> Column:
    """Unordered pair key ``min-max`` (A3:
    /root/reference/src/res2df/trans.py:195-200) via least/greatest —
    makes (a,b) and (b,a) group together.

    A NULL endpoint yields a NULL key: least/greatest skip NULLs and
    concat_ws drops them, so without the guard ``(NULL, 'B')`` would
    silently collapse to ``'B-B'`` and corrupt the genuine (B, B)
    group's aggregates — NULL-endpoint rows group under NULL instead,
    where a consumer can see (and filter or investigate) them."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.when(
        ca.isNotNull() & cb.isNotNull(),
        F.concat_ws(sep, F.least(ca, cb), F.greatest(ca, cb)),
    )


def string_to_intlist(list_def_str: str) -> list[int]:
    """P10: ``"[1,2,6:9]"`` int-list syntax → list of ints — the
    reference's ``_string2intlist``
    (/root/reference/src/res2df/vfp/_vfpcommon.py:26-44), used to
    filter VFP tables by number (_vfpprod.py:95-98).

    Faithful to the reference's CODE, including its quirk: a ``a:b``
    item contributes the ENDPOINTS only (``"6:9"`` → ``[6, 9]``),
    although the reference docstring claims the full range — callers
    filtering with ``isin`` get reference-identical selections."""
    out: list[int] = []
    list_def = list_def_str.strip().strip("[").strip("]")
    if not list_def.strip():
        return out
    for item in list_def.split(","):
        if ":" in item:
            out.extend(int(v) for v in item.split(":"))
        else:
            out.append(int(item))
    return out


def get_wells_matching_template(template: str, wells: list[str]) -> list[str]:
    """Wells matching a wildcard template, input order preserved — the
    reference's ``get_wells_matching_template`` (common.py:955-980):
    prefix ``re.match`` semantics, ``*``/``?`` wildcards, a LEADING
    wildcard only when escaped with a backslash (a bare leading ``*``
    means a well list elsewhere in the deck grammar and raises)."""
    rx = re.compile(
        well_template_to_regex(
            template, anchored_end=False, reject_leading_wildcard=True
        )
    )
    return [w for w in wells if rx.match(w)]


def runlength_compress(astring: str, sep: str = "  ") -> str:
    """Eclipse-style run-length compression of a whitespace-separated
    value string (the reference's ``runlength_compress``,
    common.py:983-1010, used for grid-property export): consecutive
    equal tokens collapse to ``N*V``; distinct values join on ``sep``
    (two spaces by default, for readable include files).  The
    DISTRIBUTED twin for billion-cell vectors is
    ``sinks.writers.rle_encode_distributed`` (K5); this is the bounded
    string form shared by small writers and tests."""
    tokens = astring.split()
    out = []
    i = 0
    while i < len(tokens):
        j = i
        while j < len(tokens) and tokens[j] == tokens[i]:
            j += 1
        n = j - i
        out.append(f"{n}*{tokens[i]}" if n > 1 else tokens[i])
        i = j
    return sep.join(out)


def datetime_to_ecldate(timestamp) -> str:
    """Python/ISO date-ish → Eclipse DATES-record syntax — the
    reference's ``datetime_to_ecldate`` (common.py:1013-1038):
    ``1 'FEB' 2021`` with a trailing ``HH:MM:SS`` only when the time
    of day is nonzero; sub-second precision is dropped; a non-ISO
    string raises."""
    import datetime as _dt

    _MONTHS = ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
               "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]
    if isinstance(timestamp, str):
        try:
            timestamp = _dt.datetime.fromisoformat(timestamp)
        except ValueError:
            # tolerate the reference's "YYYY-MM-DD HHMMSS" compact form
            try:
                timestamp = _dt.datetime.strptime(
                    timestamp, "%Y-%m-%d %H%M%S"
                )
            except ValueError as err:
                raise ValueError(
                    f"Use ISO format for dates: {timestamp}"
                ) from err
    if isinstance(timestamp, _dt.datetime):
        string = (
            f"{timestamp.day} '{_MONTHS[timestamp.month - 1]}' "
            f"{timestamp.year}"
        )
        if (timestamp.hour, timestamp.minute, timestamp.second) != (0, 0, 0):
            string += (
                f" {timestamp.hour:02d}:{timestamp.minute:02d}"
                f":{timestamp.second:02d}"
            )
        return string
    if isinstance(timestamp, _dt.date):
        return (
            f"{timestamp.day} '{_MONTHS[timestamp.month - 1]}' "
            f"{timestamp.year}"
        )
    raise ValueError(f"Use ISO format for dates: {timestamp!r}")
