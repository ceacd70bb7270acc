"""Per-keyword include-file writers (K8 — the ``csv2res`` reverse flow,
/root/reference/src/res2df/satfunc.py:272-383, pvt.py:357-645,
equil.py:402-523, compdat's df2res at common.py:508-625).

Each writer renders a datatype DataFrame back to simulator input text.
Result tables are small by nature (they are input-deck text); rendering
collects and templates driver-side, matching the reference's split.
The correctness spine is the round-trip property: text → df → text →
df must be a fixed point (reference test layer 3, SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from res2df_spark.sinks.writers import _fmt_value as _fmt
from res2df_spark.sinks.writers import trim_trailing_defaults
from res2df_spark.sources.deck import (
    KEYWORD_ITEMS,
    NESTED_TABLE_KEYWORDS,
    TABLE_KEYWORDS,
)


def _require_consecutive(values, region_col: str, kw: str) -> list:
    """The reference's region-number contract (common.py:546-559,
    ``consecutive=``): SATNUM/PVTNUM/EQLNUM must be exactly 1..N in the
    frame being written, because the written blocks are POSITIONAL —
    the parser re-assigns region = block counter, so writing a frame
    filtered to SATNUM==2 would silently re-parse as SATNUM 1 (relperm
    applied to the wrong region), and a NaN region row would just
    vanish via dropna().  Raise instead, exactly like the reference.
    Returns the sorted region list."""
    import math

    # None check BEFORE the sort: sorted({None, 1}) is a TypeError, which
    # would preempt the crafted message for object-dtype frames
    uniq = set(values)
    if any(
        v is None or (isinstance(v, float) and math.isnan(v)) for v in uniq
    ):
        raise ValueError(f"{kw}: NaN/NULL {region_col} rows cannot be written")
    vals = sorted(uniq)
    if not vals or vals[0] != 1 or len(vals) != int(vals[-1]):
        raise ValueError(
            f"{kw}: {region_col} must be consecutive from 1, got {vals} — "
            "the written blocks are positional, so a gap would silently "
            "renumber every later region on re-parse"
        )
    return vals


def df2res_compdat(df: DataFrame) -> str:
    """Connection rows → COMPDAT keyword text.  Unrolled K rows are
    re-emitted as K1=K2=K (the reference does the same after unrolldf).

    Accepts BOTH connection shapes: the engine-internal one (single K,
    OP_SH) and the reference/CLI one (K1 == K2, ``OP/SH``) — the CLI
    now emits the latter (round 6), so the csv2res round-trip must
    read its own res2csv output."""
    ref_shape = "K1" in df.columns and "K" not in df.columns
    k_lo, k_hi = ("K1", "K2") if ref_shape else ("K", "K")
    status = "OP/SH" if "OP/SH" in df.columns else "OP_SH"
    # DATE joins the sort so multi-date histories render in date
    # order (deterministic; on re-parse the LATEST record for a cell
    # wins, which is the simulator's own within-keyword override rule)
    order = ["WELL", "I", "J", k_lo] + (["DATE"] if "DATE" in df.columns else [])
    rows = df.orderBy(*order).collect()
    lines = ["COMPDAT"]
    for r in rows:
        items = [
            _fmt(r["WELL"]), _fmt(r["I"]), _fmt(r["J"]),
            _fmt(r[k_lo]), _fmt(r[k_hi]), _fmt(r[status]),
        ]
        # absent optional columns MUST still occupy their positional
        # slot as '1*' — skipping them would shift later values (a
        # KH-only frame would land KH in the TRAN slot on re-parse);
        # the trailing-default trim below then drops unneeded tails.
        # The slot list is DERIVED from the parser's item schema, so a
        # frame carrying DFACT/DIR/PEQVR (the reference CSV shape) is
        # written whole instead of silently re-defaulting those items.
        for opt, _typ in KEYWORD_ITEMS["COMPDAT"][6:]:
            items.append(_fmt(r[opt]) if opt in df.columns else "1*")
        trim_trailing_defaults(items)
        lines.append("  " + " ".join(items) + " /")
    lines.append("/")
    return "\n".join(lines) + "\n"


def df2res_satfunc(df: DataFrame) -> str:
    """Saturation-table rows → per-keyword per-region blocks
    (satfunc.py:272-383 nested-loop renderer)."""
    out = []
    pdf = df.toPandas()
    if pdf.empty:
        # reference parity: every keyword writer renders an explicit
        # marker for an empty frame (equil.py:410, pvt.py:365, ...),
        # keeping the include file self-describing; a reparse is empty
        return "-- No data!\n"
    for kw in sorted(pdf["KEYWORD"].unique()):
        cols, region_col = TABLE_KEYWORDS[kw]
        sub = pdf[pdf["KEYWORD"] == kw]
        out.append(kw)
        # reference parity (common.py consecutive="SATNUM"): positional
        # blocks demand consecutive region numbers — raise, never
        # renumber or drop NaN-region rows
        for region in _require_consecutive(sub[region_col], region_col, kw):
            tbl = sub[sub[region_col] == region].sort_values("ROW_IDX")
            for _, r in tbl.iterrows():
                # absent optional columns keep their positional slot as
                # '1*' (same contract as df2res_compdat above) — skipping
                # them would shift later values into earlier slots
                vals = [
                    None if c not in tbl.columns else r[c] for c in cols
                ]
                out.append("  " + " ".join(_fmt(None if v is None or v != v else float(v)) for v in vals))
            out.append("/")
        out.append("")
    return "\n".join(out)


_SOLUTION_KEYWORDS = ("RSVD", "RVVD", "PBVD", "PDVD")


def df2res_equil(df: DataFrame) -> str:
    """EQUIL rows → keyword text, one record per EQLNUM; a tagged frame
    (KEYWORD column, the ``equil_df`` union) also renders its
    RSVD/RVVD/PBVD/PDVD depth tables as per-region blocks (reference
    equil.py:402-523 df2res dispatch)."""
    cols, _ = TABLE_KEYWORDS["EQUIL"]
    has_kw = "KEYWORD" in df.columns
    pdf = df.toPandas()
    if pdf.empty:
        return "-- No data!\n"  # reference equil.py:410
    eq = pdf[pdf["KEYWORD"] == "EQUIL"] if has_kw else pdf
    # phase-configuration frames rename the contact slots
    # (modules/tables._EQUIL_PHASE_RENAMES: gas-water → GWC/PCGWC) —
    # resolve each raw slot to whichever column the frame actually
    # carries, the reference's phases_from_columns round trip
    slot_src = {"OWC": ("OWC", "GWC"), "PCOWC": ("PCOWC", "PCGWC")}
    lines = []
    if len(eq):
        lines.append("EQUIL")
        if "EQLNUM" in eq.columns:
            # EQUIL records are positional per EQLNUM too (reference
            # equil.py df2res, consecutive="EQLNUM")
            _require_consecutive(eq["EQLNUM"], "EQLNUM", "EQUIL")
            eq = eq.sort_values("EQLNUM")

        def _slot(r, c):
            for src in slot_src.get(c, (c,)):
                if src in eq.columns and r[src] is not None and r[src] == r[src]:
                    return float(r[src])
            return None

        for _, r in eq.iterrows():
            items = [_fmt(_slot(r, c)) for c in cols]
            trim_trailing_defaults(items)
            lines.append("  " + " ".join(items) + " /")
    if has_kw:
        for kw in _SOLUTION_KEYWORDS:
            sub = pdf[pdf["KEYWORD"] == kw]
            if not len(sub):
                continue
            tcols, region_col = TABLE_KEYWORDS[kw]
            lines.append(kw)
            # reference parity (equil.py df2res, consecutive="EQLNUM")
            for region in _require_consecutive(sub[region_col], region_col, kw):
                tbl = sub[sub[region_col] == region].sort_values("Z")
                for _, r in tbl.iterrows():
                    lines.append(
                        "  " + " ".join(
                            _fmt(None if r[c] is None or r[c] != r[c] else float(r[c])) for c in tcols
                        )
                    )
                lines.append("/")
    return "\n".join(lines) + "\n"


def df2res_welspecs(df: DataFrame) -> str:
    order = ["WELL"] + (["DATE"] if "DATE" in df.columns else [])
    rows = df.orderBy(*order).collect()
    lines = ["WELSPECS"]
    for r in rows:
        items = [_fmt(r[name] if name in df.columns else None)
                 for name, _ in KEYWORD_ITEMS["WELSPECS"]]
        trim_trailing_defaults(items)
        lines.append("  " + " ".join(items) + " /")
    lines.append("/")
    return "\n".join(lines) + "\n"


def df2res_editnnc(df: DataFrame) -> str:
    """NNC rows → EDITNNC keyword text (nnc.py:206-260): one record
    ``I1 J1 K1 I2 J2 K2 TRANM`` per connection.  If a DIR column is
    present only rows with DIR == 'NNC' are written (the reference's
    convention for frames that mix neighbour and non-neighbour
    connections)."""
    if "DIR" in df.columns:
        df = df.filter(df["DIR"] == "NNC")
    rows = df.orderBy("I1", "J1", "K1", "I2", "J2", "K2").collect()
    lines = ["EDITNNC"]
    for r in rows:
        lines.append(
            "  " + " ".join(
                _fmt(r[c]) for c in ("I1", "J1", "K1", "I2", "J2", "K2", "TRANM")
            ) + " /"
        )
    lines.append("/")
    return "\n".join(lines) + "\n"


#: nested PVT keywords: (outer column, inner columns) — derived from the
#: parser's schema so writer and reader can never disagree (pvt.py:44-56).
_NESTED_PVT = {
    kw: (outer, inner)
    for kw, (outer, inner, _region) in NESTED_TABLE_KEYWORDS.items()
}


def df2res_pvt(df: DataFrame) -> str:
    """Long tagged PVT frame → per-keyword include text
    (pvt.py:329-645's df2res dispatch).  Flat tables (PVDG/PVDO/
    DENSITY/ROCK) render one block per PVTNUM like the satfunc writer;
    nested PVTO/PVTG render one record per outer value (RS / PRESSURE)
    holding its undersaturated inner rows, a lone ``/`` closing each
    PVTNUM — the reference's _pvto_pvtnum/_pvto_pvtnum_rs nesting."""
    out = []
    pdf = df.toPandas()
    if pdf.empty:
        return "-- No data!\n"  # reference pvt.py:365
    for kw in sorted(pdf["KEYWORD"].unique()):
        sub = pdf[pdf["KEYWORD"] == kw]
        out.append(kw)
        if kw in _NESTED_PVT:
            outer_col, inner_cols = _NESTED_PVT[kw]
            # reference parity (pvt.py df2res, consecutive="PVTNUM")
            for region in _require_consecutive(sub["PVTNUM"], "PVTNUM", kw):
                tbl = sub[sub["PVTNUM"] == region]
                for outer in sorted(tbl[outer_col].dropna().unique()):
                    recs = tbl[tbl[outer_col] == outer].sort_values("ROW_IDX")
                    vals = [_fmt(float(outer))]
                    for _, r in recs.iterrows():
                        vals.extend(
                            _fmt(None if r[c] is None or r[c] != r[c] else float(r[c]))
                            for c in inner_cols
                        )
                    out.append("  " + " ".join(vals) + " /")
                out.append("/")
        else:
            cols, region_col = TABLE_KEYWORDS[kw]
            for region in _require_consecutive(sub[region_col], region_col, kw):
                tbl = sub[sub[region_col] == region].sort_values("ROW_IDX")
                for _, r in tbl.iterrows():
                    # absent columns keep their positional slot as '1*'
                    # (same contract as df2res_compdat / df2res_satfunc)
                    vals = [
                        None if c not in tbl.columns else r[c] for c in cols
                    ]
                    out.append(
                        "  " + " ".join(
                            _fmt(None if v is None or v != v else float(v)) for v in vals
                        )
                    )
                out.append("/")
        out.append("")
    return "\n".join(out)


def _vfp_meta_line(tbl, table, datum, type_cols) -> str:
    """Render a VFP meta record.  When the frame carries the *_TYPE
    columns (reference vfp.df vocabulary), the type items are written
    so a re-parse recovers them — UNIT_TYPE DEFAULT renders as ``1*``
    (the units item was omitted) and ALQ_TYPE ``''`` as the literal
    quoted-empty item; frames without type columns keep the minimal
    ``table datum /`` meta (all types default on re-parse)."""
    items = [str(int(table)), _fmt(datum)]
    if all(c in tbl.columns for c in type_cols):
        for c in type_cols:
            v = str(tbl[c].iloc[0])
            if c == "UNIT_TYPE" and v == "DEFAULT":
                items.append("1*")
            elif v == "''":
                items.append("''")
            else:
                items.append(f"'{v}'")
    return "  " + " ".join(items) + " /"


def df2res_vfpprod(df: DataFrame) -> str:
    """Melted VFPPROD rows (TABLE, DATUM, THP, WFR, GFR, ALQ, RATE,
    BHP) → VFPPROD keyword text (vfp/_vfpprod.py's df2res): the axis
    vectors are the sorted distinct values per table, value records
    re-assemble BHP in flow order under their 4-axis index prefix."""
    pdf = df.toPandas()
    out = []
    for table in sorted(pdf["TABLE"].unique()):
        tbl = pdf[pdf["TABLE"] == table].copy()
        datum = float(tbl["DATUM"].iloc[0])
        # ALQ is the one axis a deck commonly defaults: an all-NaN ALQ
        # column means "no artificial lift axis" and renders as the
        # single value 0.0 (the simulator's default).  NaN in any other
        # axis — or a *partially* NaN ALQ — is corrupt input; pandas
        # groupby would silently drop those rows, so raise instead.
        if tbl["ALQ"].isna().all():
            tbl["ALQ"] = 0.0
        # RATE included: a NaN flow value would drop from the flow-axis
        # vector while its BHP still rendered into the value record —
        # a silently misaligned table
        for name in ("THP", "WFR", "GFR", "ALQ", "RATE"):
            if tbl[name].isna().any():
                raise ValueError(
                    f"VFPPROD table {table}: NaN in axis column {name}"
                )
        axes = {
            name: sorted(tbl[name].dropna().unique())
            for name in ("THP", "WFR", "GFR", "ALQ")
        }
        flow = sorted(tbl["RATE"].dropna().unique())
        out.append("VFPPROD")
        out.append(_vfp_meta_line(
            tbl, table, datum,
            ["RATE_TYPE", "WFR_TYPE", "GFR_TYPE", "PRESSURE_TYPE",
             "ALQ_TYPE", "UNIT_TYPE", "TAB_TYPE"],
        ))
        out.append("  " + " ".join(_fmt(float(v)) for v in flow) + " /")
        for name in ("THP", "WFR", "GFR", "ALQ"):
            out.append("  " + " ".join(_fmt(float(v)) for v in axes[name]) + " /")
        idx = {
            name: {v: i + 1 for i, v in enumerate(axes[name])}
            for name in ("THP", "WFR", "GFR", "ALQ")
        }
        grouped = tbl.sort_values("RATE").groupby(["THP", "WFR", "GFR", "ALQ"])
        recs = sorted(
            (
                (idx["THP"][t], idx["WFR"][w], idx["GFR"][g], idx["ALQ"][a], grp)
                for (t, w, g, a), grp in grouped
            ),
            key=lambda x: x[:4],
        )
        # completeness invariant (the parser enforces it on read): one
        # BHP per flow point per combo.  A redefined TABLE number
        # melted into one frame, or a partially-covered axis grid,
        # would otherwise render silently corrupt records (duplicate
        # rate rows / short BHP vectors).
        n_combos = 1
        for name in ("THP", "WFR", "GFR", "ALQ"):
            n_combos *= len(axes[name])
        if len(recs) != n_combos:
            raise ValueError(
                f"VFPPROD table {table}: {len(recs)} value records for "
                f"{n_combos} axis combinations — incomplete or merged "
                "(redefined table number?) frame"
            )
        for it, iw, ig, ia, grp in recs:
            # compare the RATE LIST, not just its length: a duplicated
            # rate plus a missing one has the right count but would
            # write BHPs positionally misaligned against the flow axis
            if list(grp["RATE"]) != flow:
                raise ValueError(
                    f"VFPPROD table {table}: combo (THP={it}, WFR={iw}, "
                    f"GFR={ig}, ALQ={ia}) covers rates "
                    f"{sorted(set(grp['RATE']))} but the flow axis is "
                    f"{flow} — duplicate or missing flow points"
                )
            bhps = " ".join(_fmt(float(v)) for v in grp["BHP"])
            out.append(f"  {it} {iw} {ig} {ia} {bhps} /")
    return "\n".join(out) + "\n"


def df2res_grid_property(
    grid_df: DataFrame,
    keyword: str,
    global_size: int | None = None,
    fill=0,
    int_dtype: bool = False,
) -> str:
    """Grid property rows → GRID-section keyword text (grid.py:623-760):
    one value per GLOBAL cell (inactive cells get ``fill``), run-length
    compressed to the ``N*V`` form.

    The reference scatters into a driver-side numpy vector of
    global_size; at billion-cell scale that vector never fits, so here
    the dense vector is a ``spark.range(global_size)`` spine left-joined
    to the active rows on GLOBAL_INDEX and the RLE collapse
    (K5, sinks/writers.rle_encode_distributed) runs distributed — only
    the collapsed (start, length, value) runs reach the driver."""
    from pyspark.sql import functions as F

    from res2df_spark.sinks.writers import rle_encode_distributed

    spark = grid_df.sparkSession
    if "GLOBAL_INDEX" not in grid_df.columns:
        raise ValueError("grid_df needs a GLOBAL_INDEX column")
    if keyword not in grid_df.columns:
        raise ValueError(f"Keyword {keyword} not found in grid dataframe")
    if global_size is None:
        max_idx = grid_df.agg(F.max("GLOBAL_INDEX").cast("long")).first()[0]
        if max_idx is None:
            raise ValueError(
                "grid_df has no rows; pass global_size explicitly to "
                "render an all-fill keyword block"
            )
        global_size = max_idx + 1
        # grid frames carry ACTIVE cells only, so max(GLOBAL_INDEX)+1
        # UNDERCOUNTS whenever the grid's trailing global cells are
        # inactive (edge/corner cells — common) and the keyword block
        # comes out shorter than the NX*NY*NZ the simulator requires.
        # The full size is not derivable from an active-only frame;
        # warn so the caller passes the grid's real dimensions.
        import warnings

        warnings.warn(
            f"df2res_grid_property({keyword}): global_size inferred as "
            f"max(GLOBAL_INDEX)+1 = {global_size}; if the grid's trailing "
            "global cells are inactive this UNDERCOUNTS — pass "
            "global_size=NX*NY*NZ explicitly",
            stacklevel=2,
        )
    spine = spark.range(global_size).withColumnRenamed("id", "GLOBAL_INDEX")
    cast_t = "long" if int_dtype else "double"
    dense = spine.join(
        grid_df.select(
            F.col("GLOBAL_INDEX").cast("long").alias("GLOBAL_INDEX"),
            F.col(keyword).cast(cast_t).alias("__v"),
        ),
        "GLOBAL_INDEX",
        "left",
    ).select(
        "GLOBAL_INDEX", F.coalesce("__v", F.lit(fill).cast(cast_t)).alias("__v")
    )
    runs = rle_encode_distributed(dense, "GLOBAL_INDEX", "__v").collect()
    parts = []
    for r in runs:
        if not int_dtype and r["value"] != r["value"]:
            # repr(nan) is 'nan' — an invalid deck token the simulator
            # rejects (coalesce above replaces NULL, never NaN, and
            # Spark's NaN=NaN groups NaN cells into one run).  A NaN
            # ACTIVE cell is corrupt input for a grid array: raise with
            # guidance rather than write a broken block.
            raise ValueError(
                f"df2res_grid_property({keyword}): NaN property values "
                "in the active cells — fill or drop them before writing "
                "(nan is not a valid deck token)"
            )
        # repr: shortest round-tripping form — '%g' (6 sig figs) would
        # silently truncate PERMX/TRAN values (same rule as _fmt above)
        v = int(r["value"]) if int_dtype else repr(float(r["value"]))
        parts.append(f"{r['run_length']}*{v}" if r["run_length"] > 1 else str(v))
    lines = [keyword]
    for i in range(0, len(parts), 8):
        lines.append("  " + " ".join(parts[i : i + 8]))
    lines.append("/")
    return "\n".join(lines) + "\n"


def df2res_vfpinj(df: DataFrame) -> str:
    """Melted VFPINJ rows (TABLE, DATUM, THP, RATE, BHP) → VFPINJ
    keyword text (vfp/_vfpinj.py's df2res) — the 2-axis case of the
    VFPPROD re-assembly: FLOW + THP axes, one value record per THP
    index."""
    pdf = df.toPandas()
    out = []
    for table in sorted(pdf["TABLE"].unique()):
        tbl = pdf[pdf["TABLE"] == table]
        datum = float(tbl["DATUM"].iloc[0])
        for name in ("THP", "RATE"):
            # pandas groupby/filter-by-equality would silently drop
            # NaN-THP rows (and a NaN RATE would misalign BHP against
            # the flow axis), emitting a corrupt table
            if tbl[name].isna().any():
                raise ValueError(f"VFPINJ table {table}: NaN in {name} axis")
        thps = sorted(tbl["THP"].dropna().unique())
        flow = sorted(tbl["RATE"].dropna().unique())
        out.append("VFPINJ")
        out.append(_vfp_meta_line(
            tbl, table, datum,
            ["RATE_TYPE", "PRESSURE_TYPE", "UNIT_TYPE", "TAB_TYPE"],
        ))
        out.append("  " + " ".join(_fmt(float(v)) for v in flow) + " /")
        out.append("  " + " ".join(_fmt(float(v)) for v in thps) + " /")
        for i, t in enumerate(thps, start=1):
            grp = tbl[tbl["THP"] == t].sort_values("RATE")
            # the same completeness invariant df2res_vfpprod enforces:
            # every THP record must cover the flow axis exactly, or the
            # BHPs render positionally misaligned (a redefined TABLE
            # number melted into one frame collapses here too — VFPINJ
            # has no BI column to keep the definitions apart)
            if list(grp["RATE"]) != flow:
                raise ValueError(
                    f"VFPINJ table {table}: THP={t} covers rates "
                    f"{sorted(set(grp['RATE']))} but the flow axis is "
                    f"{flow} — incomplete, duplicated, or merged "
                    "(redefined table number?) frame"
                )
            bhps = " ".join(_fmt(float(v)) for v in grp["BHP"])
            out.append(f"  {i} {bhps} /")
    return "\n".join(out) + "\n"
