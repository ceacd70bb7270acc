"""Connection-table pipeline: the engine-layer equivalent of the
reference's ``compdat.df()`` (/root/reference/src/res2df/compdat.py),
rebuilt as pure DataFrame composition over deck records:

1. **Date cursor** (W1, compdat.py:99-114): every record inherits the
   latest DATES/START/TSTEP date — ``ffill`` over KEYWORD_IDX.
2. **WELSPECS default fill** (W2, compdat.py:115-143): COMPDAT I/J of
   0/NULL take the latest prior WELSPECS head location per well.
3. **K-range unroll** (R1, compdat.py:415-470): one row per K in K1–K2.
4. **WELOPEN application** (J9/J10/R3/R4, compdat.py:283-412,791-924):
   wildcard wells expand via regex match, defaulted coordinates fan out
   to all of the well's connections as of the action date, matching
   connections get a rewritten-status row at the action date; final
   state is keep-last per (WELL, I, J, K, DATE).

Everything distributes: windows partition by WELL (high-cardinality at
scale), the deck is parsed once driver-side (decks are tiny next to the
data they describe).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.functions.strings import well_template_to_regex
from res2df_spark.operators.reshape import unroll_range
from res2df_spark.operators.windows import dedup_keep, ffill
from res2df_spark.sources.deck import (
    deck_records,
    fill_dates,
    parse_deck,
)

_logger = logging.getLogger(__name__)


def df(spark: SparkSession, deck_text: str, records=None) -> DataFrame:
    """Deck text → connection table
    (WELL, I, J, K, OP_SH, DATE, SATN, TRAN, WBDIA, KH, SKIN, DFACT,
    DIR, PEQVR).

    ``records``: pre-parsed ``fill_dates(parse_deck(...))`` output —
    lets :func:`dfs` parse the deck once for every frame family."""
    from res2df_spark.modules.wlist import expand_welopen_wlists

    # ONE driver-side parse: dates stamped at the parse layer (W1 over
    # deck-bounded text) and ``*LIST`` well references in WELOPEN
    # expanded against the running WLIST state at each record's deck
    # position (reference compdat.py:769-801).
    if records is None:
        records = fill_dates(parse_deck(deck_text))
    dated = expand_welopen_wlists(records)
    # defaulted COMPDAT I/J require a WELSPECS seen EARLIER in the deck
    # to fill from — the reference raises, never emits NULL coordinates
    # (compdat.py:132-143)
    seen_wells: set = set()
    for r in dated:
        if r["KEYWORD"] == "WELSPECS":
            seen_wells.add(r["WELL"])
        elif r["KEYWORD"] == "COMPDAT":
            for coord in ("I", "J"):
                if r[coord] in (None, 0) and r["WELL"] not in seen_wells:
                    raise ValueError(
                        f"WELSPECS must be provided when {coord} is "
                        "defaulted in COMPDAT"
                    )
        elif r["KEYWORD"] == "COMPLUMP":
            # reference unroll_complump validation (compdat.py:499-513):
            # negative coordinates and inverted K ranges raise.
            # DEFAULTED (0/None) coordinates are a documented EXTENSION:
            # the reference refuses them outright ("Defaulted COMPLUMP
            # coordinates are not supported in res2df") while this
            # engine implements the simulator's wildcard semantics — a
            # defaulted coordinate matches every connection (see the
            # lump join below and tests/test_deck_compdat.py::
            # test_complump_fully_defaulted_is_wildcard).
            coords = [r[c] for c in ("I", "J", "K1", "K2")]
            if any(v is not None and v < 0 for v in coords):
                raise ValueError(
                    "Negative values for COMPLUMP coordinates are not "
                    f"allowed: {r}"
                )
            if (
                r["K1"] is not None
                and r["K2"] is not None
                and r["K2"] < r["K1"]
            ):
                raise ValueError(f"K2 must be equal to or greater than K1: {r}")
    compdat = deck_records(spark, deck_text, "COMPDAT", records=dated)
    welspecs = deck_records(spark, deck_text, "WELSPECS", records=dated)
    wo_recs = [r for r in dated if r["KEYWORD"] == "WELOPEN"]
    # The reference's C1/C2 validations all live inside
    # expand_complump_in_welopen_df (compdat.py:691-717), which
    # EARLY-RETURNS when the deck has no COMPLUMP at all — so with no
    # COMPLUMP the numbers are never validated: the row reaches
    # applywelopen, where all-defaulted coordinates take the whole-well
    # branch (C1/C2 silently ignored, reference :855-860 — test ids
    # zero-values / negative-values pass '0 0 0 0 0' decks) and any
    # explicit coordinate falls through to the could-not-be-parsed
    # raise (:886-889, test id complump_missing).
    has_complump = any(r["KEYWORD"] == "COMPLUMP" for r in dated)
    if not has_complump:
        fixed = []
        for r in wo_recs:
            if r["C1"] is not None or r["C2"] is not None:
                if all(
                    r[c] is None or r[c] <= 0 for c in ("I", "J", "K")
                ):
                    r = {**r, "C1": None, "C2": None}
                else:
                    raise ValueError(
                        "A WELOPEN keyword contains data that could not "
                        f"be parsed (well {r['WELL']!r}: completion "
                        "numbers without any COMPLUMP in the deck)"
                    )
            fixed.append(r)
        wo_recs = fixed
    for r in wo_recs:
        if has_complump and (r["C1"] is None) != (r["C2"] is None):
            # reference compdat.py expand_complump_in_welopen_df
            raise ValueError(
                "Both or none of the completion numbers C1/C2 in WELOPEN "
                f"must be defined (well {r['WELL']!r})"
            )
        if has_complump and r["C1"] is not None and r["C2"] is not None:
            # reference expand_complump_in_welopen_df:710-717: zero and
            # negative completion numbers are rejected, not wildcards —
            # C1=0 would otherwise silently match every lump
            if r["C1"] < 0 or r["C2"] < 0:
                raise ValueError(
                    "Negative values for C1/C2 is not allowed "
                    f"(well {r['WELL']!r})"
                )
            if r["C1"] == 0 or r["C2"] == 0:
                raise ValueError(
                    f"Zeros for C1/C2 is not implemented (well {r['WELL']!r})"
                )
            if r["C2"] < r["C1"]:
                raise ValueError(
                    "C2 must be equal or greater than C1 "
                    f"(well {r['WELL']!r})"
                )
        if r["STATUS"] not in ("OPEN", "SHUT", "STOP", "AUTO", "POPN"):
            # reference compdat.py:180-188 coerces invalid statuses to
            # SHUT with a warning instead of emitting an unknown OP/SH
            _logger.warning(
                "WELOPEN status %s is not a valid COMPDAT state. "
                "Using 'SHUT' instead.",
                r["STATUS"],
            )
    wo_recs = [
        {**r, "STATUS": "SHUT"}
        if r["STATUS"] not in ("OPEN", "SHUT", "STOP", "AUTO", "POPN")
        else r
        for r in wo_recs
    ]

    # W2: WELSPECS head-location fill.  Union the header rows, ffill the
    # head coords per well over deck order, apply to defaulted I/J.
    heads = welspecs.select(
        "KEYWORD_IDX", "RECORD_IDX", "WELL",
        F.col("I").alias("__head_i"), F.col("J").alias("__head_j"),
    )
    tagged = compdat.unionByName(
        heads.select(
            "KEYWORD_IDX", "RECORD_IDX", "WELL", "__head_i", "__head_j"
        ),
        allowMissingColumns=True,
    )
    filled = ffill(
        tagged,
        cols=["__head_i", "__head_j"],
        order_by=["KEYWORD_IDX", "RECORD_IDX"],
        partition_by=["WELL"],
        out_names=["head_i", "head_j"],
    )
    compdat = (
        filled.filter(F.col("KEYWORD") == "COMPDAT")
        .withColumn(
            "I",
            F.when(F.col("I").isNull() | (F.col("I") == 0), F.col("head_i")).otherwise(F.col("I")),
        )
        .withColumn(
            "J",
            F.when(F.col("J").isNull() | (F.col("J") == 0), F.col("head_j")).otherwise(F.col("J")),
        )
        .drop("__head_i", "__head_j", "head_i", "head_j")
    )

    # R1: K-range unroll.  RECORD_IDX rides along so two records inside
    # ONE keyword instance (same KEYWORD_IDX) still have a total order —
    # the reference's last-record-wins (test id self-overwriting-records).
    conns = unroll_range(compdat, "K1", "K2", "K").select(
        "WELL", "I", "J", "K",
        F.col("OP/SH").alias("OP_SH"), "DATE", "KEYWORD_IDX", "RECORD_IDX",
        "SATN", "TRAN", "WBDIA", "KH", "SKIN", "DFACT", "DIR", "PEQVR",
    )

    if not wo_recs:
        return dedup_keep(
            conns, keys=["WELL", "I", "J", "K", "DATE"],
            order_by=["KEYWORD_IDX", "RECORD_IDX"], keep="last",
        ).select("WELL", "I", "J", "K", "OP_SH", "DATE", "SATN", "TRAN",
                 "WBDIA", "KH", "SKIN", "DFACT", "DIR", "PEQVR")

    # COMPLUMP (R5, compdat.py:656-754): lump-number assignments per
    # connection; WELOPEN actions carrying C1–C2 match by lump range
    # instead of coordinates.
    complump = deck_records(spark, deck_text, "COMPLUMP", records=dated)
    if has_complump:
        lumps = unroll_range(complump, "K1", "K2", "K").select(
            F.col("WELL").alias("L_WELL"),
            F.col("I").alias("L_I"), F.col("J").alias("L_J"),
            F.col("K").alias("L_K"), F.col("N").alias("LUMP"),
            F.col("DATE").alias("L_DATE"),
        )
        conns = conns.join(
            broadcast(lumps),
            (F.col("WELL") == F.col("L_WELL"))
            & (F.col("L_I").isNull() | (F.col("L_I") == 0) | (F.col("L_I") == F.col("I")))
            & (F.col("L_J").isNull() | (F.col("L_J") == 0) | (F.col("L_J") == F.col("J")))
            # defaulted K is a wildcard exactly like I/J — strict equality
            # would make a fully-defaulted COMPLUMP assign no lumps and
            # lump-addressed WELOPENs silently no-op
            & (F.col("L_K").isNull() | (F.col("L_K") == 0) | (F.col("L_K") == F.col("K"))),
            "left",
        ).drop("L_WELL", "L_I", "L_J", "L_K")
    else:
        conns = conns.withColumn("LUMP", F.lit(None).cast("int")).withColumn(
            "L_DATE", F.lit(None).cast("date")
        )

    # R3: wildcard wells expand against wells defined at <= action date.
    # Records are already driver-side, so the glob→regex translation
    # happens in place — no collect round trip.
    # wildcard templates use the reference matcher's PREFIX semantics
    # (bare re.match, no $ — common.py:980: 'OP*1' matches OP213) and
    # reject a leading wildcard; exact names stay fully anchored
    def _wo_regex(well: str) -> str:
        if "*" in well or "?" in well:
            return well_template_to_regex(
                well, anchored_end=False, reject_leading_wildcard=True
            )
        return well_template_to_regex(well)

    actions = spark.createDataFrame(
        [
            (
                r["WELL"], _wo_regex(r["WELL"]), r["STATUS"],
                r["I"], r["J"], r["K"], r["C1"], r["C2"],
                r["DATE"], r["KEYWORD_IDX"], r["RECORD_IDX"],
            )
            for r in wo_recs
        ],
        "TEMPLATE string, RX string, STATUS string, I int, J int, K int, "
        "C1 int, C2 int, A_DATE date, A_IDX long, A_RIDX long",
    )

    # J9/J10/R4: match each action to the latest prior state of each
    # connection of its well(s); defaulted coords (NULL, zero or
    # negative — reference compdat.py:855-860) match all.
    a = broadcast(actions)
    by_lump = F.col("a.C1").isNotNull() & F.col("a.C2").isNotNull()
    coord_match = (
        (F.col("a.I").isNull() | (F.col("a.I") <= 0) | (F.col("a.I") == F.col("c.I")))
        & (F.col("a.J").isNull() | (F.col("a.J") <= 0) | (F.col("a.J") == F.col("c.J")))
        & (F.col("a.K").isNull() | (F.col("a.K") <= 0) | (F.col("a.K") == F.col("c.K")))
    )
    lump_match = (
        F.col("c.LUMP").between(F.col("a.C1"), F.col("a.C2"))
        # retroactivity guard: a COMPLUMP defined after the action must
        # not be visible to it (reference: complump DATE <= action DATE)
        & (
            F.coalesce(F.col("c.L_DATE"), F.lit("1900-01-01").cast("date"))
            <= F.coalesce(F.col("a.A_DATE"), F.lit("2999-12-31").cast("date"))
        )
        # explicit coordinates on a lump-addressed action further
        # RESTRICT the selection only when I, J and K are ALL set
        # (reference :728-744 gates the i,j,k filter on
        # `row["I"] and row["J"] and row["K"]` — a partially-defaulted
        # coordinate set is ignored entirely, not applied per-axis)
        & F.when(
            F.col("a.I").isNotNull() & (F.col("a.I") > 0)
            & F.col("a.J").isNotNull() & (F.col("a.J") > 0)
            & F.col("a.K").isNotNull() & (F.col("a.K") > 0),
            (F.col("a.I") == F.col("c.I"))
            & (F.col("a.J") == F.col("c.J"))
            & (F.col("a.K") == F.col("c.K")),
        ).otherwise(F.lit(True))
    )
    matched = conns.alias("c").join(
        a.alias("a"),
        F.expr("c.WELL rlike a.RX")
        & (F.col("c.KEYWORD_IDX") < F.col("a.A_IDX"))
        & F.when(by_lump, lump_match).otherwise(coord_match),
    )
    # reference applywelopen raises when an action matches NO existing
    # connection (typo'd well, wrong coords) — a silent no-op would leave
    # the well OPEN with no signal.  One tiny distinct-pairs job; decks
    # are driver-side text, so the extra pass is bounded by deck size.
    # keyed on (idx, ridx, WELL): WLIST-expanded members share one
    # (KEYWORD_IDX, RECORD_IDX), so a pair-level key would let one
    # matching member mask a typo'd sibling with zero connections
    hit_pairs = {
        (r["A_IDX"], r["A_RIDX"], r["TEMPLATE"])
        for r in matched.select(
            "A_IDX", "A_RIDX", F.col("a.TEMPLATE").alias("TEMPLATE")
        ).distinct().collect()
    }
    # ...but ONLY for coordinate/whole-well actions: the reference's
    # expand_complump_in_welopen_df (compdat.py:699-752) expands a
    # lump-addressed record (C1/C2 set) to zero rows when no COMPLUMP
    # row is in range — applywelopen never sees it, so the deck is
    # accepted and the action silently ignored; raising there would
    # hard-fail decks the reference processes.
    unmatched = [
        r for r in wo_recs
        if (r["KEYWORD_IDX"], r["RECORD_IDX"], r["WELL"]) not in hit_pairs
        and not (r["C1"] is not None and r["C2"] is not None)
    ]
    if unmatched:
        u = unmatched[0]
        raise ValueError(
            f"WELOPEN record (well {u['WELL']!r}, status {u['STATUS']!r}) "
            "is not acting on any existing connection"
        )
    latest = dedup_keep(
        matched,
        keys=["c.WELL", "c.I", "c.J", "c.K", "A_IDX", "A_RIDX"],
        order_by=[F.col("c.KEYWORD_IDX"), F.col("c.RECORD_IDX")],
        keep="last",
    )
    # STOP on the WHOLE well (all coords defaulted) closes the well but
    # leaves — indeed rewrites — the connections OPEN; STOP on selected
    # connections equals SHUT; POPN is OPEN (reference
    # compdat.py:902-910 + tests welopen-stop-on-well*).
    acts_on_well = (
        (F.col("a.I").isNull() | (F.col("a.I") <= 0))
        & (F.col("a.J").isNull() | (F.col("a.J") <= 0))
        & (F.col("a.K").isNull() | (F.col("a.K") <= 0))
        & ~by_lump
    )
    status_expr = (
        F.when(F.col("STATUS") == "POPN", F.lit("OPEN"))
        .when((F.col("STATUS") == "STOP") & acts_on_well, F.lit("OPEN"))
        .when(F.col("STATUS") == "STOP", F.lit("SHUT"))
        .otherwise(F.col("STATUS"))
    )
    rewritten = latest.select(
        F.col("c.WELL").alias("WELL"), F.col("c.I").alias("I"),
        F.col("c.J").alias("J"), F.col("c.K").alias("K"),
        status_expr.alias("OP_SH"), F.col("A_DATE").alias("DATE"),
        F.col("A_IDX").alias("KEYWORD_IDX"),
        F.col("A_RIDX").alias("RECORD_IDX"),
        F.col("c.SATN").alias("SATN"), F.col("c.TRAN").alias("TRAN"),
        F.col("c.WBDIA").alias("WBDIA"), F.col("c.KH").alias("KH"),
        F.col("c.SKIN").alias("SKIN"), F.col("c.DFACT").alias("DFACT"),
        F.col("c.DIR").alias("DIR"), F.col("c.PEQVR").alias("PEQVR"),
    )

    all_rows = conns.drop("LUMP", "L_DATE").unionByName(rewritten)
    final = dedup_keep(
        all_rows, keys=["WELL", "I", "J", "K", "DATE"],
        order_by=["KEYWORD_IDX", "RECORD_IDX"], keep="last",
    )
    return final.select(
        "WELL", "I", "J", "K", "OP_SH", "DATE", "SATN", "TRAN", "WBDIA",
        "KH", "SKIN", "DFACT", "DIR", "PEQVR",
    )


# ---------------------------------------------------------------------------
# Segment keywords (reference compdat.py:145-212,246-263): WELSEGS /
# COMPSEGS carry a well-header record inherited by every data row;
# WSEGSICD / WSEGAICD / WSEGVALV are per-segment device records.  All are
# date-stamped by the same W1 cursor as COMPDAT; WELSEGS and the ICD
# keywords unroll their SEGMENT1–SEGMENT2 ranges like COMPDAT K1–K2.
# ---------------------------------------------------------------------------


def to_reference_shape(out: DataFrame) -> DataFrame:
    """Engine-internal connection shape → the reference's compdat CSV
    contract (compdat.py df: unrolled K rows presented as K1 == K2,
    status column named ``OP/SH``).  Shared by ResdataCase.compdat()
    and the res2csv CLI so both user surfaces emit the SAME shape; the
    single-K internal form stays for the downstream joins."""
    from pyspark.sql import functions as F

    return out.select(
        *[c for c in out.columns if c not in ("K", "OP_SH")],
        F.col("K").alias("K1"),
        F.col("K").alias("K2"),
        F.col("OP_SH").alias("OP/SH"),
    )


def _dated(
    spark: SparkSession, deck_text: str, keyword: str, records=None
) -> DataFrame:
    """``records`` lets dfs()/icd_chain() parse the deck ONCE and share
    the dated record list across every keyword frame — without it each
    frame re-tokenizes the full deck text."""
    if records is None:
        records = fill_dates(parse_deck(deck_text))
    return deck_records(spark, deck_text, keyword, records=records)


def _unroll_segments(df: DataFrame) -> DataFrame:
    """SEGMENT1–SEGMENT2 range → one row per segment with
    SEGMENT1 == SEGMENT2, the reference's unrolldf shape
    (compdat.py:415-470)."""
    out = unroll_range(df, "SEGMENT1", "SEGMENT2", "__SEG")
    return (
        out.withColumn("SEGMENT1", F.col("__SEG"))
        .withColumn("SEGMENT2", F.col("__SEG"))
        .drop("__SEG")
    )


def welsegs_df(
    spark: SparkSession, deck_text: str, unroll: bool = True, records=None,
    keep_idx: bool = False,
) -> DataFrame:
    """WELSEGS → one row per segment, well-header items inherited;
    INFO_TYPE == 'ABS' adds SEGMENT_MD = SEGMENT_LENGTH (reference
    compdat.py:190-212).  ``keep_idx`` keeps KEYWORD_IDX/RECORD_IDX for
    callers that need a total declaration order (same-date
    re-specifications tie on DATE alone)."""
    ws = _dated(spark, deck_text, "WELSEGS", records)
    ws = ws.withColumn(
        "SEGMENT_MD",
        F.when(F.col("INFO_TYPE") == "ABS", F.col("SEGMENT_LENGTH")),
    )
    out = (_unroll_segments(ws) if unroll else ws).drop("KEYWORD")
    return out if keep_idx else out.drop("KEYWORD_IDX", "RECORD_IDX")


def compsegs_df(spark: SparkSession, deck_text: str, records=None) -> DataFrame:
    """COMPSEGS → one row per (I, J, K) connection with its branch and
    measured-depth interval; WELL from the header record (reference
    compdat.py:164-176)."""
    return _dated(spark, deck_text, "COMPSEGS", records).drop(
        "KEYWORD", "KEYWORD_IDX", "RECORD_IDX"
    )


def wsegsicd_df(
    spark: SparkSession, deck_text: str, unroll: bool = True, records=None,
    keep_idx: bool = False,
) -> DataFrame:
    """WSEGSICD spiral-ICD device rows (reference compdat.py:145-151)."""
    d = _dated(spark, deck_text, "WSEGSICD", records)
    out = (_unroll_segments(d) if unroll else d).drop("KEYWORD")
    return out if keep_idx else out.drop("KEYWORD_IDX", "RECORD_IDX")


def wsegaicd_df(
    spark: SparkSession, deck_text: str, unroll: bool = True, records=None
) -> DataFrame:
    """WSEGAICD autonomous-ICD device rows (reference compdat.py:152-157)."""
    d = _dated(spark, deck_text, "WSEGAICD", records)
    return (_unroll_segments(d) if unroll else d).drop(
        "KEYWORD", "KEYWORD_IDX", "RECORD_IDX"
    )


def wsegvalv_df(
    spark: SparkSession, deck_text: str, records=None, keep_idx: bool = False
) -> DataFrame:
    """WSEGVALV valve device rows (reference compdat.py:158-163)."""
    out = _dated(spark, deck_text, "WSEGVALV", records).drop("KEYWORD")
    return out if keep_idx else out.drop("KEYWORD_IDX", "RECORD_IDX")


def dfs(spark: SparkSession, deck_text: str, unroll: bool = True) -> dict[str, DataFrame]:
    """The reference's ``deck2dfs`` surface (compdat.py:66-283): every
    connection/segment frame the schedule section defines."""
    recs = fill_dates(parse_deck(deck_text))
    return {
        "COMPDAT": df(spark, deck_text, records=recs),
        "WELSEGS": welsegs_df(spark, deck_text, unroll=unroll, records=recs),
        "COMPSEGS": compsegs_df(spark, deck_text, records=recs),
        "WSEGSICD": wsegsicd_df(spark, deck_text, unroll=unroll, records=recs),
        "WSEGAICD": wsegaicd_df(spark, deck_text, unroll=unroll, records=recs),
        "WSEGVALV": wsegvalv_df(spark, deck_text, records=recs),
    }


def icd_chain(spark: SparkSession, deck_text: str) -> DataFrame:
    """J8 from a real deck: connection → segment → ICD/valve device.

    COMPSEGS maps each (I, J, K) connection to a SEGMENT_NUMBER;
    WELSEGS supplies the segment geometry; the device keywords attach
    per-segment equipment.  Devices and segments are deck-bounded →
    broadcast; the connection side stays unshuffled."""
    recs = fill_dates(parse_deck(deck_text))
    con = compsegs_df(spark, deck_text, records=recs).select(
        "WELL", "I", "J", "K", "BRANCH", "DISTANCE_START", "DISTANCE_END",
        "SEGMENT_NUMBER", "DATE",
    )
    # each lookup side dedups to the LATEST declaration per segment:
    # WELSEGS/WSEGVALV/WSEGSICD re-specified under a later DATE would
    # otherwise fan every connection row out once per declaration
    # (half of them with stale geometry).  KEYWORD_IDX/RECORD_IDX join
    # the ordering (engine-wide unique-tie-breaker convention): two
    # declarations under ONE date — or a schedule fragment with no
    # DATES at all — tie on DATE alone, and the reference
    # deterministically keeps the LAST declaration.
    _decl_order = ["DATE", "KEYWORD_IDX", "RECORD_IDX"]
    seg = dedup_keep(
        welsegs_df(spark, deck_text, records=recs, keep_idx=True),
        keys=["WELL", "SEGMENT1"], order_by=_decl_order, keep="last",
    ).select(
        F.col("WELL").alias("S_WELL"), F.col("SEGMENT1").alias("SEGMENT"),
        "SEGMENT_LENGTH", "DEPTH_CHANGE", "DIAMETER", "SEGMENT_MD",
    )
    valv = dedup_keep(
        wsegvalv_df(spark, deck_text, records=recs, keep_idx=True),
        keys=["WELL", "SEGMENT_NUMBER"],
        order_by=_decl_order, keep="last",
    ).select(
        F.col("WELL").alias("V_WELL"), F.col("SEGMENT_NUMBER").alias("V_SEG"),
        F.col("CV").alias("VALVE_CV"), F.col("AREA").alias("VALVE_AREA"),
    )
    sicd = dedup_keep(
        wsegsicd_df(spark, deck_text, records=recs, keep_idx=True),
        keys=["WELL", "SEGMENT1"],
        order_by=_decl_order, keep="last",
    ).select(
        F.col("WELL").alias("D_WELL"), F.col("SEGMENT1").alias("D_SEG"),
        F.col("STRENGTH").alias("ICD_STRENGTH"),
    )
    out = (
        con.join(
            broadcast(seg),
            (F.col("WELL") == F.col("S_WELL"))
            & (F.col("SEGMENT_NUMBER") == F.col("SEGMENT")),
            "left",
        )
        .join(
            broadcast(valv),
            (F.col("WELL") == F.col("V_WELL"))
            & (F.col("SEGMENT_NUMBER") == F.col("V_SEG")),
            "left",
        )
        .join(
            broadcast(sicd),
            (F.col("WELL") == F.col("D_WELL"))
            & (F.col("SEGMENT_NUMBER") == F.col("D_SEG")),
            "left",
        )
        .drop("S_WELL", "SEGMENT", "V_WELL", "V_SEG", "D_WELL", "D_SEG")
    )
    return out
