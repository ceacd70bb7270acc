"""Grid-family operators: engine-layer equivalents of the reference's
``grid.merge_initvectors`` (J3, /root/reference/src/res2df/grid.py:365-408),
``trans.df()`` (J5/P5/A3, trans.py:104-219), ``nnc.df()`` (J6/P6,
nnc.py:112-169) and ``pillars.df()`` (A1/A2, pillars.py:18-318).

The grid table contract (SURVEY §1.1): one row per active cell with
explicit I/J/K (+ GLOBAL_INDEX) columns — row order is never relied on;
every positional join of the reference becomes an equi-join on the index
columns.  Cell tables are THE big tables at 100 TB, so every operator
here is shuffle-minimal: neighbour pairing shuffles once on the join
key, pillar stats shuffle once on the pillar key, and all derived
columns are codegen'd arithmetic.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from res2df_spark.functions.strings import pair_key


def merge_initvectors(
    grid: DataFrame, init: DataFrame, on: Sequence[str] = ("I", "J", "K")
) -> DataFrame:
    """J3: attach per-cell INIT vectors by (I, J, K) equi-join."""
    return grid.join(init, list(on))


def neighbor_pairs(
    grid: DataFrame,
    directions: str = "IJK",
    cell_cols: Sequence[str] = ("I", "J", "K"),
) -> DataFrame:
    """J5: build cell-neighbour pairs by index shift, tagged with DIR.

    For each direction d, pair (c1, c2) where c2 = c1 shifted +1 along
    d.  Implemented as projection + union of per-direction equi-joins —
    both sides shuffle on the same (I, J, K) key, so Catalyst co-locates
    them; no cartesian anything."""
    ci, cj, ck = cell_cols
    sides = []
    for d in directions:
        shift = {
            "I": (F.col(ci) + 1, F.col(cj), F.col(ck)),
            "J": (F.col(ci), F.col(cj) + 1, F.col(ck)),
            "K": (F.col(ci), F.col(cj), F.col(ck) + 1),
        }[d]
        a = grid.select(
            F.col(ci).alias("I1"), F.col(cj).alias("J1"), F.col(ck).alias("K1"),
            *[F.col(c).alias(f"{c}1") for c in grid.columns if c not in cell_cols],
            shift[0].alias("__ni"), shift[1].alias("__nj"), shift[2].alias("__nk"),
        )
        b = grid.select(
            F.col(ci).alias("__ni"), F.col(cj).alias("__nj"), F.col(ck).alias("__nk"),
            F.col(ci).alias("I2"), F.col(cj).alias("J2"), F.col(ck).alias("K2"),
            *[F.col(c).alias(f"{c}2") for c in grid.columns if c not in cell_cols],
        )
        sides.append(
            a.join(b, ["__ni", "__nj", "__nk"]).drop("__ni", "__nj", "__nk")
            .withColumn("DIR", F.lit(d))
        )
    out = sides[0]
    for s in sides[1:]:
        out = out.unionByName(s)
    return out


def boundary_filter(pairs: DataFrame, region_col: str) -> DataFrame:
    """P5: keep pairs crossing a region boundary
    (``FIPNUM1 != FIPNUM2``, trans.py:179-187)."""
    return pairs.filter(F.col(f"{region_col}1") != F.col(f"{region_col}2"))


def interface_aggregate(
    pairs: DataFrame, region_col: str, value_col: str
) -> DataFrame:
    """A3: aggregate pair values per unordered region interface
    (``min-max`` pair key, trans.py:189-219)."""
    key = pair_key(F.col(f"{region_col}1"), F.col(f"{region_col}2"))
    return pairs.groupBy(key.alias("INTERFACE")).agg(
        F.sum(value_col).alias(f"SUM_{value_col}"),
        F.count(F.lit(1)).alias("N_PAIRS"),
    )


def nnc_coordinates(
    nnc: DataFrame, geometry: DataFrame, coord_cols: Sequence[str] = ("X", "Y", "Z")
) -> DataFrame:
    """J6: attach both cells' coordinates to NNC pairs (two left joins)
    and compute the interface midpoint as the per-pair mean ignoring
    NULLs (nnc.py:112-147)."""
    g1 = geometry.select(
        F.col("I").alias("I1"), F.col("J").alias("J1"), F.col("K").alias("K1"),
        *[F.col(c).alias(f"{c}1") for c in coord_cols],
    )
    g2 = geometry.select(
        F.col("I").alias("I2"), F.col("J").alias("J2"), F.col("K").alias("K2"),
        *[F.col(c).alias(f"{c}2") for c in coord_cols],
    )
    out = nnc.join(g1, ["I1", "J1", "K1"], "left").join(g2, ["I2", "J2", "K2"], "left")
    for c in coord_cols:
        a, b = F.col(f"{c}1"), F.col(f"{c}2")
        both = a.isNotNull() & b.isNotNull()
        out = out.withColumn(
            f"{c}_MID", F.when(both, (a + b) / 2).otherwise(F.coalesce(a, b))
        )
    return out


def vertical_nnc_filter(nnc: DataFrame) -> DataFrame:
    """P6: vertical connections only (``I1==I2 & J1==J2``, nnc.py:150-169)."""
    return nnc.filter((F.col("I1") == F.col("I2")) & (F.col("J1") == F.col("J2")))


#: A1 aggregator map — the full pillars AGGREGATORS set
#: (pillars.py:18-35): bulk/pore/phase volumes sum, everything else
#: unweighted mean.  PORO avg is an engine extra (the reference derives
#: PORO only post-agg; we emit both PORO_AVG and the porevolume-weighted
#: PORO_WMEAN).  Missing columns are skipped, so extending the map never
#: changes output for frames that lack the new columns.
PILLAR_AGGREGATORS: Mapping[str, str] = {
    "VOLUME": "sum",
    "PORV": "sum",
    "WATVOL": "sum",
    "GASVOL": "sum",
    "OILVOL": "sum",
    "GASVOLSURF": "sum",
    "OILVOLSURF": "sum",
    "PERMX": "avg",
    "PERMY": "avg",
    "PERMZ": "avg",
    "PORO": "avg",
    "X": "avg",
    "Y": "avg",
    "Z": "avg",
}


def pillar_stats(
    grid: DataFrame,
    region_col: str | None = None,
    aggregators: Mapping[str, str] = PILLAR_AGGREGATORS,
    extra_group_cols: Sequence[str] = (),
) -> DataFrame:
    """A1: per-pillar statistics.  PILLAR = 'I-J'; one shuffle on the
    pillar (+region) key; derived PORO = PORV/VOLUME after aggregation
    (pillars.py:110-121).  ``extra_group_cols`` adds grouping keys —
    the stacked-restart caller groups by DATE so static sums are not
    multiplied by the number of stacked dates (the reference avoids
    the same double-count with per-date ``@date`` column names)."""
    pillar = F.concat_ws("-", F.col("I"), F.col("J"))
    keys = (
        [pillar.alias("PILLAR")]
        + ([F.col(region_col)] if region_col else [])
        + [F.col(c) for c in extra_group_cols]
    )
    aggs = [
        getattr(F, how)(c).alias(f"{c}_{how.upper()}")
        for c, how in aggregators.items()
        if c in grid.columns
    ]
    if not aggs:
        # agg() with zero expressions is a generic PySpark assertion —
        # name the actual problem instead
        raise ValueError(
            "pillar_stats: the grid frame has none of the aggregatable "
            f"columns {sorted(aggregators)} (got {sorted(grid.columns)})"
        )
    out = grid.groupBy(*keys).agg(*aggs)
    if "PORV_SUM" in out.columns and "VOLUME_SUM" in out.columns:
        out = out.withColumn(
            "PORO_WMEAN",
            F.when(F.col("VOLUME_SUM") > 0, F.col("PORV_SUM") / F.col("VOLUME_SUM")),
        )
    return out


def contact_estimate(
    grid: DataFrame,
    sat_col: str = "SWAT",
    z_col: str = "Z",
    cutoff: float = 0.5,
    region_col: str | None = None,
    water_col: str | None = None,
    water_cutoff: float = 0.0,
) -> DataFrame:
    """A2: contact depth per pillar — the DEEPEST cell (max Z) whose
    saturation exceeds the cutoff, matching the reference's OWC/GOC
    construction (pillars.py:260-281: ``agg({'Z': 'max'})`` over the
    above-cutoff cells).  ``water_col`` adds the reference's
    water-presence gate: pillars with no ``water_col > water_cutoff``
    cell are excluded (an OWC only makes sense where there IS water)."""
    pillar = F.concat_ws("-", F.col("I"), F.col("J"))
    keys = [pillar.alias("PILLAR")] + ([F.col(region_col)] if region_col else [])
    key_names = ["PILLAR"] + ([region_col] if region_col else [])
    out = (
        grid.filter(F.col(sat_col) > cutoff)
        .groupBy(*keys)
        .agg(
            F.max(z_col).alias("CONTACT_Z"),
            F.count(F.lit(1)).alias("N_CELLS"),
        )
    )
    if water_col is not None:
        waterpillars = (
            grid.filter(F.col(water_col) > water_cutoff)
            .select(*keys)
            .distinct()
        )
        out = out.join(waterpillars, key_names, "left_semi")
    return out


#: GOC cells must hold a minute oil saturation so gas injected into the
#: water phase is not read as a gas cap (pillars.py:237-241).
_EPSILON_SOIL = 0.01


def pillar_contacts(
    grid: DataFrame,
    region_col: str | None = None,
    soilcutoff: float = 0.2,
    sgascutoff: float = 0.7,
    swatcutoff: float = 0.7,
) -> DataFrame | None:
    """OWC/GOC/GWC per pillar — the reference's
    ``compute_pillar_contacts`` (pillars.py:192-318) over the STACKED
    grid frame (a DATE column, when present, is an extra grouping key;
    the reference achieves per-date separation with ``@date`` column
    names instead).

    * OWC: deepest (max Z) cell with SOIL > soilcutoff, on pillars
      holding water (some cell with SWAT > swatcutoff).
    * GOC (SOIL column present): deepest cell with SGAS > sgascutoff
      AND SOIL > 0.01, on pillars with any SOIL > 0.01 cell.
    * GWC (no SOIL column — two-phase gas-water): deepest cell with
      SGAS > sgascutoff, on water pillars.

    Exactly like the reference, the SOIL COLUMN's presence selects the
    GOC-vs-GWC branch and SOIL is NEVER derived here ("SOIL should be
    pre-computed in three-phase runs before calling this",
    pillars.py:204) — :meth:`res2df_spark.case.ResdataCase.pillars`
    adds the phase-closure SOIL (the reference's ``compute_volumes``
    step) before calling, so the composed path matches ``pillars.df``
    and a direct call on a SOIL-less gas-water frame reaches GWC.

    When BOTH an OWC and a GOC/GWC frame exist they inner-join
    (pillars.py:318 ``owc.merge(goc)``) — pillars with only one contact
    drop, exactly like the reference.  Returns None when SWAT is absent
    or every cutoff is falsy (the reference returns an empty frame and
    skips the merge).

    Scale: three filter→groupBy passes and two pillar-key SEMI joins —
    all shuffle on the (pillar, region, date) key, no collect, no
    windows.  (Kin of :func:`contact_estimate` — that is the single-
    contact A2 primitive; this mirrors the reference's three-contact
    composite with its per-cell GOC conjunction and inner merge, which
    the primitive cannot express.)
    """
    cols = set(grid.columns)
    if "SWAT" not in cols:
        return None
    keys = [F.concat_ws("-", F.col("I"), F.col("J")).alias("PILLAR")]
    key_names = ["PILLAR"]
    if region_col:
        keys.append(F.col(region_col))
        key_names.append(region_col)
    if "DATE" in cols:
        keys.append(F.col("DATE"))
        key_names.append("DATE")

    # pillars holding water — left_semi gates need no distinct()
    waterpillars = grid.filter(F.col("SWAT") > swatcutoff).select(*keys)
    owc = goc = None
    if soilcutoff and "SOIL" in cols:
        owc = (
            grid.filter(F.col("SOIL") > soilcutoff)
            .groupBy(*keys)
            .agg(F.max("Z").alias("OWC"))
            .join(waterpillars, key_names, "left_semi")
        )
    if sgascutoff and "SGAS" in cols:
        if "SOIL" in cols:
            gocpillars = grid.filter(F.col("SOIL") > _EPSILON_SOIL).select(*keys)
            goc = (
                grid.filter(
                    (F.col("SGAS") > sgascutoff)
                    & (F.col("SOIL") > _EPSILON_SOIL)
                )
                .groupBy(*keys)
                .agg(F.max("Z").alias("GOC"))
                .join(gocpillars, key_names, "left_semi")
            )
        else:
            goc = (
                grid.filter(F.col("SGAS") > sgascutoff)
                .groupBy(*keys)
                .agg(F.max("Z").alias("GWC"))
                .join(waterpillars, key_names, "left_semi")
            )
    if owc is None and goc is None:
        return None
    if goc is None:
        return owc
    if owc is None:
        return goc
    # the reference merges by EMPTINESS, not column presence
    # (pillars.py:312-318): an empty GOC frame yields the OWC frame
    # alone — an unconditional inner join would wrongly drop every OWC
    # row whenever no pillar clears the gas cutoff.  The contact
    # frames are bounded by pillars × regions × dates (never
    # cell-count-sized), so localCheckpoint materializes them ONCE —
    # the emptiness probes and the downstream join then reuse the
    # checkpointed rows instead of re-running the grid-scan groupBys.
    owc = owc.localCheckpoint(eager=True)
    goc = goc.localCheckpoint(eager=True)
    owc_empty = owc.isEmpty()
    goc_empty = goc.isEmpty()
    if owc_empty and goc_empty:
        return owc.join(goc, key_names, "inner")  # empty, right schema
    if goc_empty:
        return owc
    if owc_empty:
        return goc
    return owc.join(goc, key_names, "inner")


def pillars_df(
    grid: DataFrame,
    region_col: str | None = None,
    soilcutoff: float = 0.2,
    sgascutoff: float = 0.7,
    swatcutoff: float = 0.7,
    group: bool = False,
    stackdates: bool = False,
) -> DataFrame:
    """The full pillars composition over a (possibly DATE-stacked) grid
    frame — the reference's ``pillars.df`` + ``pillars_main``
    (pillars.py:38-142, 409-438): phase volumes (compute_volumes,
    pillars.py:144-190), per-pillar aggregation, OWC/GOC/GWC contacts
    per the three cutoffs, optional ``group`` aggregation over pillars
    (per region and/or DATE when present; the plain global mean
    otherwise — including the reference's mean-of-sums quirk) with
    re-derived PORO_WMEAN, and the wide ``NAME@date`` pivot when
    ``stackdates`` is False.  :meth:`res2df_spark.case.ResdataCase.
    pillars` is the thin facade over this; library callers compose it
    directly with any grid frame.

    One shape divergence from the reference: the engine aggregates the
    STACKED frame, so in the wide form every aggregate carries the date
    tag (``VOLUME_SUM@d``) while the reference leaves static aggregates
    undated — values are identical, static ones merely repeat per
    date."""
    cols = set(grid.columns)
    has_dates = "DATE" in cols
    if region_col and region_col not in cols:
        raise ValueError(
            f"pillars_df: region column {region_col!r} not in the grid "
            f"frame (the case facade warns and drops it instead)"
        )
    if has_dates and "SWAT" in cols:
        # phase volumes (pillars.py:144-190): SOIL by three-phase
        # closure (or 1-SWAT two-phase), *VOL = sat × PORV,
        # *VOLSURF via the reciprocal formation volume factors
        soil = (
            F.lit(1.0) - F.col("SWAT") - F.col("SGAS")
            if "SGAS" in cols
            else F.lit(1.0) - F.col("SWAT")
        )
        if "SOIL" not in cols:
            grid = grid.withColumn("SOIL", soil)
        if "PORV" in cols:
            grid = grid.withColumn(
                "WATVOL", F.col("SWAT") * F.col("PORV")
            ).withColumn("OILVOL", F.col("SOIL") * F.col("PORV"))
            if "SGAS" in cols:
                grid = grid.withColumn("GASVOL", F.col("SGAS") * F.col("PORV"))
            if "1OVERBO" in cols:
                grid = grid.withColumn(
                    "OILVOLSURF", F.col("OILVOL") * F.col("1OVERBO")
                )
            if "1OVERBG" in cols and "SGAS" in cols:
                grid = grid.withColumn(
                    "GASVOLSURF", F.col("GASVOL") * F.col("1OVERBG")
                )
    extra = ["DATE"] if has_dates else []
    out = pillar_stats(grid, region_col=region_col, extra_group_cols=extra)
    key_names = ["PILLAR"] + ([region_col] if region_col else []) + extra
    contacts = pillar_contacts(
        grid, region_col=region_col, soilcutoff=soilcutoff,
        sgascutoff=sgascutoff, swatcutoff=swatcutoff,
    ) if "SWAT" in grid.columns else None
    if contacts is not None:
        out = out.join(contacts, key_names, "left")
    if group:
        gb = ([region_col] if region_col else []) + extra
        num = [c for c in out.columns if c not in key_names]
        if gb:
            # pillars_main:429-434 — sum the *_SUM columns, mean the
            # rest (reference AGGREGATORS by base name)
            aggs = [
                (F.sum(c) if c.endswith("_SUM") else F.avg(c)).alias(c)
                for c in num
            ]
            out = out.groupBy(*gb).agg(*aggs)
        else:
            # pillars_main:435-436 — drop PILLAR, plain mean of
            # EVERYTHING (the reference quirk: even the sums)
            out = out.agg(*[F.avg(c).alias(c) for c in num])
        if "PORV_SUM" in out.columns and "VOLUME_SUM" in out.columns:
            # pillars_main:437 re-derives PORO after grouping
            out = out.withColumn(
                "PORO_WMEAN",
                F.when(F.col("VOLUME_SUM") > 0,
                       F.col("PORV_SUM") / F.col("VOLUME_SUM")),
            )
    if has_dates and not stackdates and "DATE" in out.columns:
        from res2df_spark.operators.reshape import dates_to_headers

        ids = [c for c in ("PILLAR", region_col) if c and c in out.columns]
        out = dates_to_headers(out, ids)
    return out


def drop_constant_columns(
    df: DataFrame, alwayskeep: Sequence[str] | str | None = None
) -> DataFrame:
    """P4 as an engine function — the reference's
    ``grid.drop_constant_columns`` (grid.py:590-620): delete columns
    with exactly ONE distinct value, where NULL counts as a value
    (pandas ``.unique()`` semantics: an all-NULL column is constant and
    drops; one value plus NULLs is two values and stays).

    One eager map-side min/max+null-presence aggregation, one collected
    row — constant ⇔ ``min <=> max`` (null-safe) and not a NULL/value
    mix.  No countDistinct, so no Expand blow-up on wide frames at
    100 TB.  Columns whose types are not orderable (arrays, maps) are
    kept unprobed; an empty frame is returned unchanged (reference
    grid.py:610-611)."""
    keep = {alwayskeep} if isinstance(alwayskeep, str) else set(alwayskeep or ())
    orderable = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        not in ("array", "map", "struct", "binary", "variant")
    }
    cand = [c for c in df.columns if c not in keep and c in orderable]
    if not cand:
        return df
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cand):
        aggs.append(
            (
                F.min(c).eqNullSafe(F.max(c))
                & ~(
                    (F.max(F.col(c).isNull().cast("int")) == 1)
                    & (F.max(F.col(c).isNotNull().cast("int")) == 1)
                )
            ).alias(f"__c{i}")
        )
    row = df.agg(*aggs).first()
    if not row["__n"]:
        return df
    drop = [c for i, c in enumerate(cand) if row[f"__c{i}"]]
    return df.drop(*drop) if drop else df


def trans_df(grid: DataFrame, directions: str = "IJK") -> DataFrame:
    """Neighbour transmissibilities (reference trans.py:106-135): one
    row per cell face with ``TRAN* > 0``, the neighbour address
    SYNTHESIZED as (I+1, J, K)/(I, J+1, K)/(I, J, K+1) — the reference
    never requires the neighbour cell to be present in the grid frame
    (a cell with nonzero TRANX whose +I neighbour is inactive still
    emits its row; consumers that merge cell-2 properties drop such
    rows in their own inner join, exactly like the reference's
    vectors/coords path, trans.py:153-168).  Sealing faults
    (``TRAN == 0``) and absent directional vectors (NULL) yield NO row.

    Plan: three filtered projections unioned — map-only, no self-join,
    no shuffle (the previous neighbour-join form both shuffled twice
    and silently dropped absent-neighbour faces)."""
    parts = []
    for d, vec, (di, dj, dk) in (
        ("I", "TRANX", (1, 0, 0)),
        ("J", "TRANY", (0, 1, 0)),
        ("K", "TRANZ", (0, 0, 1)),
    ):
        if d not in directions.upper() or vec not in grid.columns:
            continue
        parts.append(
            grid.filter(F.col(vec) > 0).select(
                F.col("I").alias("I1"), F.col("J").alias("J1"),
                F.col("K").alias("K1"),
                (F.col("I") + di).alias("I2"), (F.col("J") + dj).alias("J2"),
                (F.col("K") + dk).alias("K2"),
                F.lit(d).alias("DIR"), F.col(vec).alias("TRAN"),
            )
        )
    if not parts:
        spark = grid.sparkSession
        return spark.createDataFrame(
            [],
            "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, "
            "DIR string, TRAN double",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def trans_full(
    grid: DataFrame,
    vectors: Sequence[str] | str | None = None,
    boundaryfilter: bool = False,
    group: bool = False,
    coords: bool = False,
    onlykdir: bool = False,
    onlyijdir: bool = False,
    nnc: DataFrame | None = None,
    directions: str | None = None,
) -> DataFrame:
    """The full trans composition — the reference's ``trans.df()``
    option surface (/root/reference/src/res2df/trans.py:21-219) over
    the engine's map-only :func:`trans_df` core:

    * ``nnc`` (the reference's ``addnnc``): union the NNC pair table
      (I1..K2, TRAN) tagged ``DIR='NNC'`` (trans.py:137-142).
    * ``vectors``: per-cell INIT vectors merged for BOTH cells as
      ``<VEC>1``/``<VEC>2`` — two equi-joins on the (I, J, K) cell key
      (trans.py:144-168); unknown vectors warn and are skipped.  Like
      the reference's inner merge, a face whose neighbour cell is not
      in the grid frame drops here.
    * ``coords``: connection midpoint (X, Y, Z) and cell-centre
      distance (DX, DY, DZ) (trans.py:170-177).
    * ``boundaryfilter`` (implied by ``group``): keep pairs crossing a
      region boundary — exactly one integer vector required; the
      reference logs an error + returns empty (trans.py:83-91), the
      engine raises (module-layer loud-failure convention).
    * ``group``: sum TRAN (mean coords) per unordered region interface,
      keyed ``str(min)-str(max)`` in ``<VEC>PAIR``, with ``<VEC>1`` /
      ``<VEC>2`` reinstated as sorted STRINGS — the reference splits
      the pair key back (trans.py:189-219).

    Plan shape at scale: union is map-only; the two vector merges
    shuffle both sides on the same cell key (Catalyst reuses the
    exchange for the second join); the group aggregation is a
    partial-aggregatable hash agg on a low-cardinality interface key.
    """
    import warnings

    if vectors is None:
        vectors = []
    elif isinstance(vectors, str):
        vectors = [vectors]
    vectors = list(vectors)
    if group:
        boundaryfilter = True  # grouping implies boundaryfilter (trans.py:79-81)
    if boundaryfilter and len(vectors) != 1:
        raise ValueError(
            "boundaryfilter/group needs exactly one INIT vector "
            f"(got {vectors!r}) — reference trans.py:83-91"
        )
    if onlykdir and onlyijdir:
        warnings.warn(
            "Filtering to both k and to ij simultaneously results in "
            "empty dataframe",
            RuntimeWarning,
            stacklevel=2,
        )
        directions = ""
    elif onlykdir:
        directions = "K"
    elif onlyijdir:
        directions = "IJ"
    elif directions is None:
        # engine extra: an explicit directions string passes through
        # when neither reference-style only* flag is set
        directions = "IJK"
    out = trans_df(grid, directions=directions)
    if nnc is not None:
        out = out.unionByName(
            nnc.select(
                "I1", "J1", "K1", "I2", "J2", "K2",
                F.lit("NNC").alias("DIR"), "TRAN",
            )
        )
    missing = [v for v in vectors if v not in grid.columns]
    if missing:
        warnings.warn(
            f"Vectors {missing} not found, skipping", RuntimeWarning, stacklevel=2
        )
        vectors = [v for v in vectors if v in grid.columns]
        if boundaryfilter and not vectors:
            raise ValueError(
                "boundaryfilter/group vector not present in the grid frame"
            )
    vectorscoords = list(vectors)
    if coords:
        vectorscoords += [c for c in ("X", "Y", "Z") if c not in vectorscoords]
    if vectorscoords:
        g1 = grid.select(
            F.col("I").alias("I1"), F.col("J").alias("J1"), F.col("K").alias("K1"),
            *[F.col(v).alias(f"{v}1") for v in vectorscoords],
        )
        g2 = grid.select(
            F.col("I").alias("I2"), F.col("J").alias("J2"), F.col("K").alias("K2"),
            *[F.col(v).alias(f"{v}2") for v in vectorscoords],
        )
        out = out.join(g1, ["I1", "J1", "K1"]).join(g2, ["I2", "J2", "K2"])
    if coords:
        for c in ("X", "Y", "Z"):
            out = out.withColumn(c, (F.col(f"{c}1") + F.col(f"{c}2")) / 2.0)
            out = out.withColumn(f"D{c}", F.abs(F.col(f"{c}1") - F.col(f"{c}2")))
        out = out.drop("X1", "X2", "Y1", "Y2", "Z1", "Z2")
    if boundaryfilter:
        out = boundary_filter(out, vectors[0])
    if group:
        vec = vectors[0]
        pairname = f"{vec}PAIR"
        key = pair_key(F.col(f"{vec}1"), F.col(f"{vec}2"))
        aggs = [
            F.avg(c).alias(c)
            for c in ("X", "Y", "Z", "DX", "DY", "DZ")
            if c in out.columns
        ] + [F.sum("TRAN").alias("TRAN")]
        out = out.groupBy(key.alias(pairname)).agg(*aggs)
        split = F.split(F.col(pairname), "-")
        out = out.withColumn(f"{vec}1", split.getItem(0)).withColumn(
            f"{vec}2", split.getItem(1)
        )
    return out


def region_graph_edges(grid: DataFrame, region: str = "FIPNUM") -> DataFrame:
    """Region-connectivity edge table — the reference's
    ``trans.make_nx_graph`` (/root/reference/src/res2df/trans.py:222-232)
    minus the driver-side graph object: one row per region interface
    with the summed transmissibility as the edge weight, i.e.
    ``trans.df(vectors=[region], coords=True, group=True)`` projected
    to (``<region>1``, ``<region>2``, TRAN).

    The edge table IS the scalable artifact (the interface count is
    bounded by region-pair cardinality, not cell count); feed it to
    :func:`to_networkx` for an in-driver ``networkx.Graph`` when the
    library is present."""
    edges = trans_full(grid, vectors=[region], coords=True, group=True)
    return edges.select(f"{region}1", f"{region}2", "TRAN")


def to_networkx(edges: DataFrame):
    """Collect a (bounded) region edge table into a ``networkx.Graph``
    with TRAN edge weights, like the reference's ``make_nx_graph``
    return value.  Gated behind an import-try: the engine never
    requires networkx."""
    try:
        import networkx as nx
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "networkx is required for to_networkx(); install it or use "
            "the region_graph_edges DataFrame directly"
        ) from exc
    cols = edges.columns
    graph = nx.Graph()
    graph.add_weighted_edges_from(
        (r[cols[0]], r[cols[1]], r["TRAN"]) for r in edges.collect()
    )
    return graph
