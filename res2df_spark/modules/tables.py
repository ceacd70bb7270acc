"""Lookup-table keyword family: engine-layer equivalents of the
reference's ``satfunc.df()`` / ``pvt.df()`` / ``equil.df()``
(/root/reference/src/res2df/satfunc.py:63-157, pvt.py:199-242,
equil.py:81-136).

Shape contract (reference §1.1): ONE long DataFrame per family, tagged
with a KEYWORD column (R9 union) and the region counter (SATNUM /
PVTNUM / EQLNUM).  Records parse via the R10 reshape in sources/deck.py;
defaulted saturation-function values interpolate per region (P11)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from res2df_spark.operators.interpolate import interpolate_linear
from res2df_spark.sources.deck import TABLE_KEYWORDS, deck_records

SATFUNC_KEYWORDS = ("SWOF", "SGOF", "SLGOF", "SWFN", "SGFN", "SGWFN", "SOF2", "SOF3")
PVT_KEYWORDS = ("PVDG", "PVDO", "PVTO", "PVTG", "PVTW", "DENSITY", "ROCK")
#: equil solution family: depth tables for dissolved/vaporized ratios
#: and bubble/dew points (reference equil.py:30-35,86-206)
EQUIL_SOLUTION_KEYWORDS = ("RSVD", "RVVD", "PBVD", "PDVD")


def wanted_keywords(
    wanted, supported: Sequence[str], modulename: str = ""
) -> list[str]:
    """P9 keyword want-list reduction — the reference's
    ``handle_wanted_keywords`` (common.py:259-296): ``None`` (or a
    ``[None]`` singleton) selects every supported keyword; a bare
    string becomes a singleton; wanted keywords outside the supported
    set WARN and drop.  Supported order is preserved so the family
    union's frame order never depends on user argument order."""
    if wanted is None:
        return list(supported)
    if isinstance(wanted, str):
        wanted = [wanted]
    if len(wanted) == 1 and wanted[0] is None:
        return list(supported)
    unsupported = set(wanted) - set(supported)
    if unsupported:
        import warnings

        # key=str: a stray None mixed into the want-list must warn,
        # not crash sorted() on a None<str compare
        warnings.warn(
            f"Requested keyword(s) not supported by {modulename}: "
            f"{sorted(unsupported, key=str)}",
            RuntimeWarning,
            stacklevel=2,
        )
    keep = set(wanted) - unsupported
    return [k for k in supported if k in keep]


def _family_df(
    spark: SparkSession, deck_text: str, keywords: Sequence[str], records=None
) -> DataFrame | None:
    # ONE driver-side parse shared across the whole family (the old
    # form re-tokenized the deck AND ran an eager take(1) job per
    # keyword); presence comes for free from the record list
    from res2df_spark.sources.deck import fill_dates, parse_deck

    recs = fill_dates(parse_deck(deck_text)) if records is None else records
    present = {r["KEYWORD"] for r in recs}
    frames = []
    for kw in keywords:
        if kw not in present:
            continue
        f = deck_records(spark, deck_text, kw, records=recs)
        frames.append(f.drop("KEYWORD_IDX", "RECORD_IDX", "DATE"))
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)  # R9 tagged union
    return out


def satfunc_df(
    spark: SparkSession, deck_text: str, interpolate_defaults: bool = True,
    keywords=None,
) -> DataFrame | None:
    """Saturation-function tables → long frame (KEYWORD, SATNUM, ROW_IDX,
    value columns).  Defaulted (1*) values interpolate linearly against
    the saturation column inside each (KEYWORD, SATNUM) table — the
    reference's per-SATNUM pandas interpolate (satfunc.py:132-157).
    ``keywords`` is the P9 want-list (reference satfunc --keywords)."""
    from res2df_spark.sources.deck import fill_dates, parse_deck

    wanted = wanted_keywords(keywords, SATFUNC_KEYWORDS, "satfunc")
    recs = fill_dates(parse_deck(deck_text))
    # reference satfunc.py:146-147: a defaulted (1*) SATURATION value is
    # not interpolatable (it is the interpolation axis) and raises; a
    # silent NULL would sort first in the interpolation windows and
    # corrupt the whole table
    for r in recs:
        if r["KEYWORD"] in wanted:
            sat_col = TABLE_KEYWORDS[r["KEYWORD"]][0][0]
            if r.get(sat_col) is None:
                raise ValueError("nan in saturation column is not allowed")
    out = _family_df(spark, deck_text, wanted, records=recs)
    if out is None or not interpolate_defaults:
        return out
    sat_col = F.coalesce(*[F.col(c) for c in ("SW", "SG", "SL", "SO") if c in out.columns])
    out = out.withColumn("__x", sat_col)
    value_cols = [
        c for c in out.columns
        if c not in ("KEYWORD", "SATNUM", "ROW_IDX", "__x")
        and not c.startswith(("SW", "SG", "SL", "SO"))
    ]
    for c in value_cols:
        out = interpolate_linear(
            out, x_col="__x", y_col=c, partition_by=["KEYWORD", "SATNUM"], out_col=c
        )
    return out.drop("__x")


def pvt_df(
    spark: SparkSession, deck_text: str, keywords=None
) -> DataFrame | None:
    """Dead-oil/dry-gas PVT + rock/density tables → long tagged frame.
    ``keywords`` is the P9 want-list (reference pvt --keywords)."""
    return _family_df(
        spark, deck_text, wanted_keywords(keywords, PVT_KEYWORDS, "pvt")
    )


def phases_from_deck(deck_text: str) -> str:
    """Phase configuration from the RUNSPEC flag keywords — the
    reference's ``phases_from_deck`` (equil.py:207-227): plain
    substring membership on the deck text, '' when inconclusive."""
    oil = "OIL" in deck_text
    gas = "GAS" in deck_text
    water = "WATER" in deck_text
    if oil and gas and water:
        return "oil-water-gas"
    if not oil and gas and water:
        return "gas-water"
    if oil and not gas and water:
        return "oil-water"
    if oil and gas and not water:
        return "oil-gas"
    return ""


#: how the fixed EQUIL item slots read under each phase configuration
#: (reference equil.py PHASE_RENAMERS:37-78).  Keys = the raw slot
#: names from TABLE_KEYWORDS["EQUIL"]; absent = keep; None = drop
#: (the reference's IGNORE* columns).
def phases_from_columns(columns) -> str:
    """Phase configuration from an equil frame's column names —
    reference ``equil.phases_from_columns`` (equil.py:229-251):
    OWC+GOC → oil-water-gas; GWC alone → gas-water; OWC alone →
    oil-water; GOC alone → oil-gas; anything else (incl. the
    meaningless OWC+GWC / GOC+GWC mixes) → "" (inconclusive)."""
    cols = set(columns)
    if "OWC" in cols and "GOC" in cols:
        return "oil-water-gas"
    if "GWC" in cols and not cols & {"OWC", "GOC"}:
        return "gas-water"
    if "OWC" in cols and not cols & {"GOC", "GWC"}:
        return "oil-water"
    if "GOC" in cols and not cols & {"OWC", "GWC"}:
        return "oil-gas"
    return ""


_EQUIL_PHASE_RENAMES: dict[str, dict[str, str | None]] = {
    "oil-water-gas": {},
    "gas-water": {"OWC": "GWC", "PCOWC": "PCGWC", "GOC": None,
                  "PCGOC": None, "INITRS": None, "INITRV": None},
    "oil-water": {"GOC": None, "PCGOC": None, "INITRS": None,
                  "INITRV": None},
    "oil-gas": {"OWC": None, "PCOWC": None, "INITRS": None,
                "INITRV": None},
}


def equil_df(
    spark: SparkSession, deck_text: str, solution_tables: bool = True,
    keywords=None,
) -> DataFrame | None:
    """EQUIL initial-condition records (one row per EQLNUM region),
    plus the RSVD/RVVD/PBVD/PDVD solution depth tables as a tagged
    union (KEYWORD column) the way the reference's ``equil.df`` folds
    all five keywords into one frame (equil.py:86-136).

    How the fixed EQUIL item slots are NAMED depends on the deck's
    phase configuration (reference equil.py:269-276 + PHASE_RENAMERS):
    a gas-water deck's contact is GWC/PCGWC, and the slots the
    configuration does not use are dropped.  An inconclusive phase set
    falls back to the full oil-water-gas naming rather than raising —
    EQUIL is often extracted from schedule-section fragments that carry
    no RUNSPEC at all."""
    from res2df_spark.sources.deck import fill_dates, parse_deck

    # ONE driver-side parse shared by the EQUIL frame and the solution
    # tables (presence comes from the record list — no eager take(1))
    wanted = wanted_keywords(
        keywords, ("EQUIL", *EQUIL_SOLUTION_KEYWORDS), "equil"
    )
    recs = fill_dates(parse_deck(deck_text))
    eq = None
    if "EQUIL" in wanted and any(r["KEYWORD"] == "EQUIL" for r in recs):
        eq = deck_records(spark, deck_text, "EQUIL", records=recs).drop(
            "KEYWORD_IDX", "RECORD_IDX", "DATE", "ROW_IDX"
        )
        phases = phases_from_deck(deck_text)
        for raw, new in _EQUIL_PHASE_RENAMES.get(phases, {}).items():
            if raw not in eq.columns:
                continue
            eq = eq.drop(raw) if new is None else eq.withColumnRenamed(raw, new)
    if not solution_tables:
        return eq
    sol_wanted = [k for k in EQUIL_SOLUTION_KEYWORDS if k in wanted]
    sol = _family_df(spark, deck_text, sol_wanted, records=recs)
    if sol is None:
        return eq
    sol = sol.drop("ROW_IDX")
    if eq is None:
        return sol
    return eq.unionByName(sol, allowMissingColumns=True)


def rsvd_df(spark: SparkSession, deck_text: str) -> DataFrame | None:
    """RSVD depth table (reference equil.py:142-155)."""
    return _family_df(spark, deck_text, ("RSVD",))


def rvvd_df(spark: SparkSession, deck_text: str) -> DataFrame | None:
    """RVVD depth table (reference equil.py:159-172)."""
    return _family_df(spark, deck_text, ("RVVD",))


def pbvd_df(spark: SparkSession, deck_text: str) -> DataFrame | None:
    """PBVD depth table (reference equil.py:176-189)."""
    return _family_df(spark, deck_text, ("PBVD",))


def pdvd_df(spark: SparkSession, deck_text: str) -> DataFrame | None:
    """PDVD depth table (reference equil.py:193-206)."""
    return _family_df(spark, deck_text, ("PDVD",))


__all__ = [
    "satfunc_df", "pvt_df", "equil_df", "rsvd_df", "rvvd_df", "pbvd_df",
    "pdvd_df", "TABLE_KEYWORDS",
]
