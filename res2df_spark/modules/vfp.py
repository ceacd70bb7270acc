"""VFP lift-curve tables: engine-layer equivalent of the reference's
``vfp.df()`` (/root/reference/src/res2df/vfp/_vfpprod.py:74-299,
_vfpcommon.py:26-167).

VFPPROD is a 5-D interpolation table (FLOW × THP × WFR × GFR × ALQ →
BHP) stored as axis vectors plus one BHP record per (THP, WFR, GFR,
ALQ) index tuple; VFPINJ is the 2-D analogue.  The reference melts with
numpy loops; here the axis lookup is a broadcast index join and the
FLOW unroll is ``explode(arrays_zip(...))`` (R7) — partition-local, no
shuffle on the value rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.sources.deck import _coerce, _expand, _tokenize, known_keywords


# Meta-record vocabularies (Eclipse keyword items 3-9, the reference's
# _vfpdefs.py enums) with the reference's defaults for omitted items:
# RATE GAS / WFR WCT / GFR GOR / THP THP / ALQ "''" (undefined) /
# UNITS DEFAULT / TAB BHP (_vfpprod.py:100-120, _vfpinj.py equivalents).
_VFPPROD_FLO = {"OIL", "LIQ", "GAS", "WG", "TM"}
_VFPINJ_FLO = {"OIL", "WAT", "GAS", "WG", "TM"}
_WFR_TYPES = {"WOR", "WCT", "WGR", "WWR", "WTF"}
_GFR_TYPES = {"GOR", "GLR", "OGR", "MMW"}
_ALQ_TYPES = {"GRAT", "IGLR", "TGLR", "PUMP", "COMP", "DENO", "DENG", "BEAN"}
_UNIT_TYPES = {"METRIC", "FIELD", "LAB", "PVT-M"}
_THP_TYPES = {"THP"}
_TAB_PROD = {"BHP", "TEMP", "THT"}
_TAB_INJ = {"BHP"}


def _meta_item(meta: list, i: int) -> str | None:
    """Item ``i`` of an ALREADY-EXPANDED meta record as a bare string,
    or None when absent / defaulted / quoted-empty (``''``, ``' '``).
    The record must be ``_expand``-ed ONCE as a whole before positional
    reads — expanding tokens individually would mis-align items when a
    deck defaults several at once (``2*`` covering FLO and WFR would
    otherwise shift GOR into the WFR slot)."""
    if i >= len(meta):
        return None
    v = meta[i]
    if v is None:
        return None
    s = str(v).strip("'").strip()
    return s or None


def _typed(meta: list, i: int, valid: set, default: str, what: str,
           table: int) -> str:
    v = _meta_item(meta, i)
    if v is None:
        return default
    if v == "THT":
        v = "TEMP"  # the reference's enum renders THT as TEMP
    if v not in valid:
        raise ValueError(
            f"VFP table {table}: invalid {what} {v!r} "
            f"(must be one of {sorted(valid)})"
        )
    return v


def _parse_meta_types(meta: list, keyword: str, table: int) -> dict:
    """Items 3+ of the meta record → the reference's *_TYPE values."""
    if keyword == "VFPPROD":
        return {
            "RATE_TYPE": _typed(meta, 2, _VFPPROD_FLO, "GAS",
                                "rate type", table),
            "WFR_TYPE": _typed(meta, 3, _WFR_TYPES, "WCT",
                               "WFR type", table),
            "GFR_TYPE": _typed(meta, 4, _GFR_TYPES, "GOR",
                               "GFR type", table),
            "PRESSURE_TYPE": _typed(meta, 5, _THP_TYPES, "THP",
                                    "pressure type", table),
            # undefined artificial lift renders as the literal "''"
            # (reference ALQ.UNDEFINED)
            "ALQ_TYPE": _typed(meta, 6, _ALQ_TYPES, "''",
                               "ALQ type", table),
            "UNIT_TYPE": _typed(meta, 7, _UNIT_TYPES, "DEFAULT",
                                "unit type", table),
            "TAB_TYPE": _typed(meta, 8, _TAB_PROD, "BHP",
                               "tab type", table),
        }
    return {
        "RATE_TYPE": _typed(meta, 2, _VFPINJ_FLO, "GAS",
                            "rate type", table),
        "PRESSURE_TYPE": _typed(meta, 3, _THP_TYPES, "THP",
                                "pressure type", table),
        "UNIT_TYPE": _typed(meta, 4, _UNIT_TYPES, "DEFAULT",
                            "unit type", table),
        "TAB_TYPE": _typed(meta, 5, _TAB_INJ, "BHP", "tab type", table),
    }


def _parse_blocks(text: str, keyword: str) -> list[dict]:
    """Extract raw VFP blocks: meta record, axis records, value records."""
    toks = _tokenize(text)
    blocks = []
    i = 0
    # stop collection at ANY known keyword, not just the next VFP one —
    # otherwise a WELSPECS following a VFP table is swallowed into the
    # value records and its string items crash the float coercion.
    stop = known_keywords()
    while i < len(toks):
        if toks[i] != keyword:
            i += 1
            continue
        i += 1
        recs: list[list] = []
        # records until the next keyword or EOF; VFP tables have no
        # lone-slash terminator.  After the meta record (which may carry
        # bare uppercase unit/flag tokens like LIQ/THP/METRIC), any
        # UNKNOWN keyword-shaped token also terminates the block — the
        # axis/value records are purely numeric, so a bare word there
        # can only be the next (unregistered) keyword; without this a
        # following WELLDIMS/UDQ crashes the float coercion (the SAME
        # boundary rule as the deck parser's table keywords — shared
        # helper so the two scanners cannot drift)
        from res2df_spark.sources.deck import looks_like_keyword

        while i < len(toks) and toks[i] not in stop and not (
            recs and looks_like_keyword(toks[i])
        ):
            rec = []
            while i < len(toks) and toks[i] != "/":
                rec.append(toks[i])
                i += 1
            i += 1
            if rec:
                recs.append(rec)
            else:
                break
        if recs:
            blocks.append(recs)
    out = []
    for recs in blocks:
        meta = recs[0]
        n_axes = 5 if keyword == "VFPPROD" else 2
        axes = [
            [_coerce(v, "float") for v in _expand(r)] for r in recs[1 : 1 + n_axes]
        ]
        values = []
        n_idx = 4 if keyword == "VFPPROD" else 1
        for r in recs[1 + n_axes :]:
            vals = [_coerce(v, "float") for v in _expand(r)]
            values.append((
                [int(v) for v in vals[:n_idx]],
                vals[n_idx:],
            ))
        # ONE whole-record expansion so n* default tokens keep the
        # positional alignment (a 2* covers two item slots)
        meta = _expand(meta)
        table = int(_coerce(meta[0], "int"))
        out.append({
            "table": table,
            "datum": _coerce(meta[1], "float"),
            "types": _parse_meta_types(meta, keyword, table),
            "axes": axes,
            "values": values,
        })
    return out


def df_prod(spark: SparkSession, deck_text: str,
            keep_block_index: bool = False) -> DataFrame | None:
    """VFPPROD → long rows (TABLE, DATUM, THP, WFR, GFR, ALQ, RATE, BHP)."""
    blocks = _parse_blocks(deck_text, "VFPPROD")
    if not blocks:
        return None
    rows = []
    axis_rows = []
    # BI = block (keyword-instance) index: a deck may legally REDEFINE a
    # table number later in SCHEDULE; joining on TABLE alone would
    # cross-match axes from both definitions
    for bi, b in enumerate(blocks):
        flow, thp, wfr, gfr, alq = b["axes"]
        for (ithp, iwfr, igfr, ialq), vals in b["values"]:
            # out-of-range indices would silently vanish in the inner
            # axis join below — raise with deck context instead
            for axn, idx, axv in (
                ("THP", ithp, thp), ("WFR", iwfr, wfr),
                ("GFR", igfr, gfr), ("ALQ", ialq, alq),
            ):
                if not 1 <= idx <= len(axv):
                    raise ValueError(
                        f"VFPPROD table {b['table']}: {axn} index {idx} "
                        f"outside the {len(axv)}-value axis"
                    )
            # same invariant for the value vector: arrays_zip would
            # silently NULL-pad a length mismatch into phantom rows
            if len(vals) != len(flow):
                raise ValueError(
                    f"VFPPROD table {b['table']}: value record at "
                    f"(THP={ithp}, WFR={iwfr}, GFR={igfr}, ALQ={ialq}) "
                    f"has {len(vals)} BHP values for a {len(flow)}-value "
                    "FLOW axis"
                )
            t = b["types"]
            rows.append((
                bi, b["table"], b["datum"], ithp, iwfr, igfr, ialq,
                flow, vals, t["RATE_TYPE"], t["WFR_TYPE"], t["GFR_TYPE"],
                t["ALQ_TYPE"], t["PRESSURE_TYPE"], t["TAB_TYPE"],
                t["UNIT_TYPE"],
            ))
        for name, ax in (("THP", thp), ("WFR", wfr), ("GFR", gfr), ("ALQ", alq)):
            axis_rows.extend((bi, b["table"], name, i + 1, v) for i, v in enumerate(ax))
    recs = spark.createDataFrame(
        rows,
        "BI int, TABLE int, DATUM double, ITHP int, IWFR int, IGFR int, IALQ int, "
        "FLOW array<double>, BHP array<double>, RATE_TYPE string, "
        "WFR_TYPE string, GFR_TYPE string, ALQ_TYPE string, "
        "PRESSURE_TYPE string, TAB_TYPE string, UNIT_TYPE string",
    )
    axes = spark.createDataFrame(
        axis_rows, "BI int, TABLE int, AXIS string, IDX int, VAL double"
    )

    def ax(name, idx_col):
        a = axes.filter(F.col("AXIS") == name).select(
            F.col("BI").alias("B2"), F.col("IDX").alias("I2"), F.col("VAL").alias(name)
        )
        return broadcast(a), (F.col("BI") == F.col("B2")) & (F.col(idx_col) == F.col("I2"))

    out = recs
    for name, idx_col in (("THP", "ITHP"), ("WFR", "IWFR"), ("GFR", "IGFR"), ("ALQ", "IALQ")):
        a, cond = ax(name, idx_col)
        out = out.join(a, cond).drop("B2", "I2")
    types = ["RATE_TYPE", "WFR_TYPE", "GFR_TYPE", "ALQ_TYPE",
             "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE"]
    extra = ["BI"] if keep_block_index else []
    melted = out.select(
        *extra, "TABLE", "DATUM", "THP", "WFR", "GFR", "ALQ",
        F.explode(F.arrays_zip(F.col("FLOW").alias("RATE"), F.col("BHP").alias("BHP"))).alias("z"),
        *types,
    )
    return melted.select(
        *extra, "TABLE", "DATUM", "THP", "WFR", "GFR", "ALQ",
        F.col("z.RATE").alias("RATE"), F.col("z.BHP").alias("BHP"),
        *types,
    )


def df_inj(spark: SparkSession, deck_text: str,
           keep_block_index: bool = False) -> DataFrame | None:
    """VFPINJ → long rows (TABLE, DATUM, THP, RATE, BHP)."""
    blocks = _parse_blocks(deck_text, "VFPINJ")
    if not blocks:
        return None
    rows = []
    for bi, b in enumerate(blocks):
        flow, thp = b["axes"]
        for (ithp,), vals in b["values"]:
            # explicit bounds check: ithp=0 in a corrupt deck would
            # silently wrap (Python negative indexing) to the LAST THP
            if not 1 <= ithp <= len(thp):
                raise ValueError(
                    f"VFPINJ table {b['table']}: THP index {ithp} outside "
                    f"the {len(thp)}-value THP axis"
                )
            if len(vals) != len(flow):
                raise ValueError(
                    f"VFPINJ table {b['table']}: value record at THP="
                    f"{ithp} has {len(vals)} BHP values for a "
                    f"{len(flow)}-value FLOW axis"
                )
            t = b["types"]
            rows.append((
                bi, b["table"], b["datum"], thp[ithp - 1], flow, vals,
                t["RATE_TYPE"], t["PRESSURE_TYPE"], t["TAB_TYPE"],
                t["UNIT_TYPE"],
            ))
    recs = spark.createDataFrame(
        rows,
        "BI int, TABLE int, DATUM double, THP double, "
        "FLOW array<double>, BHP array<double>, RATE_TYPE string, "
        "PRESSURE_TYPE string, TAB_TYPE string, UNIT_TYPE string",
    )
    types = ["RATE_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE"]
    extra = ["BI"] if keep_block_index else []
    melted = recs.select(
        *extra, "TABLE", "DATUM", "THP",
        F.explode(F.arrays_zip(F.col("FLOW").alias("RATE"), F.col("BHP").alias("BHP"))).alias("z"),
        *types,
    )
    return melted.select(
        *extra, "TABLE", "DATUM", "THP", F.col("z.RATE").alias("RATE"),
        F.col("z.BHP").alias("BHP"), *types,
    )


# ---------------------------------------------------------------------------
# Reference-vocabulary accessors (vfp/_vfp.py df()/dfs(): column names
# RATE/PRESSURE/WFR/GFR/ALQ/TAB + VFP_TYPE/TABLE_NUMBER/DATUM/*_TYPE,
# one frame per table in deck order, int-list table selection).
# ---------------------------------------------------------------------------

_PROD_REF_COLS = [
    "RATE", "PRESSURE", "WFR", "GFR", "ALQ", "TAB", "VFP_TYPE",
    "TABLE_NUMBER", "DATUM", "RATE_TYPE", "WFR_TYPE", "GFR_TYPE",
    "ALQ_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE",
]
_INJ_REF_COLS = [
    "RATE", "PRESSURE", "TAB", "VFP_TYPE", "TABLE_NUMBER", "DATUM",
    "RATE_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE",
]


def _to_reference_shape(out: DataFrame, keyword: str) -> DataFrame:
    """Engine melt shape → the reference's vfp.df() column vocabulary
    (TABLE→TABLE_NUMBER, THP→PRESSURE, BHP→TAB, + VFP_TYPE literal)."""
    out = (
        out.withColumnRenamed("TABLE", "TABLE_NUMBER")
        .withColumnRenamed("THP", "PRESSURE")
        .withColumnRenamed("BHP", "TAB")
        .withColumn("VFP_TYPE", F.lit(keyword))
    )
    cols = _PROD_REF_COLS if keyword == "VFPPROD" else _INJ_REF_COLS
    return out.select(*cols)


def df(spark: SparkSession, deck_text: str, keyword: str = "VFPPROD",
       vfpnumbers_str: str | None = None) -> DataFrame | None:
    """All tables of one VFP keyword family in the reference's column
    vocabulary (reference vfp.df, _vfp.py:244-284), optionally reduced
    to an int-list of table numbers (endpoints-only ``a:b`` quirk of
    ``string_to_intlist`` preserved)."""
    out = (df_prod if keyword == "VFPPROD" else df_inj)(spark, deck_text)
    if out is None:
        return None
    if vfpnumbers_str:
        from res2df_spark.functions.strings import string_to_intlist

        out = out.filter(
            F.col("TABLE").isin(string_to_intlist(vfpnumbers_str))
        )
    return _to_reference_shape(out, keyword)


def dfs(spark: SparkSession, deck_text: str, keyword: str = "VFPPROD",
        vfpnumbers_str: str | None = None) -> list[DataFrame]:
    """One reference-shape frame PER KEYWORD INSTANCE, in deck order
    (reference vfp.dfs, _vfp.py:287-320).  Frames are separated by the
    block index, not the table number — a deck may legally REDEFINE a
    table number later in SCHEDULE, and a TABLE_NUMBER filter would
    merge both definitions into every returned frame."""
    wanted = None
    if vfpnumbers_str:
        from res2df_spark.functions.strings import string_to_intlist

        wanted = set(string_to_intlist(vfpnumbers_str))
    fn = df_prod if keyword == "VFPPROD" else df_inj
    full = fn(spark, deck_text, keep_block_index=True)
    if full is None:
        return []
    blocks = _parse_blocks(deck_text, keyword)
    out = []
    for bi, b in enumerate(blocks):
        if wanted is not None and b["table"] not in wanted:
            continue
        out.append(
            _to_reference_shape(
                full.filter(F.col("BI") == bi).drop("BI"), keyword
            )
        )
    return out
