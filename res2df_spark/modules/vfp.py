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
        out.append({
            "table": int(_coerce(meta[0], "int")),
            "datum": _coerce(meta[1], "float"),
            "axes": axes,
            "values": values,
        })
    return out


def df_prod(spark: SparkSession, deck_text: str) -> DataFrame | None:
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
            rows.append((bi, b["table"], b["datum"], ithp, iwfr, igfr, ialq, flow, vals))
        for name, ax in (("THP", thp), ("WFR", wfr), ("GFR", gfr), ("ALQ", alq)):
            axis_rows.extend((bi, b["table"], name, i + 1, v) for i, v in enumerate(ax))
    recs = spark.createDataFrame(
        rows,
        "BI int, TABLE int, DATUM double, ITHP int, IWFR int, IGFR int, IALQ int, "
        "FLOW array<double>, BHP array<double>",
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
    melted = out.select(
        "TABLE", "DATUM", "THP", "WFR", "GFR", "ALQ",
        F.explode(F.arrays_zip(F.col("FLOW").alias("RATE"), F.col("BHP").alias("BHP"))).alias("z"),
    )
    return melted.select(
        "TABLE", "DATUM", "THP", "WFR", "GFR", "ALQ",
        F.col("z.RATE").alias("RATE"), F.col("z.BHP").alias("BHP"),
    )


def df_inj(spark: SparkSession, deck_text: str) -> DataFrame | None:
    """VFPINJ → long rows (TABLE, DATUM, THP, RATE, BHP)."""
    blocks = _parse_blocks(deck_text, "VFPINJ")
    if not blocks:
        return None
    rows = []
    for b in blocks:
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
            rows.append((b["table"], b["datum"], thp[ithp - 1], flow, vals))
    recs = spark.createDataFrame(
        rows, "TABLE int, DATUM double, THP double, FLOW array<double>, BHP array<double>"
    )
    melted = recs.select(
        "TABLE", "DATUM", "THP",
        F.explode(F.arrays_zip(F.col("FLOW").alias("RATE"), F.col("BHP").alias("BHP"))).alias("z"),
    )
    return melted.select(
        "TABLE", "DATUM", "THP", F.col("z.RATE").alias("RATE"), F.col("z.BHP").alias("BHP")
    )
