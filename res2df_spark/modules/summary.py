"""Summary time-series pipeline: engine-layer equivalent of the
reference's ``summary.df()`` (/root/reference/src/res2df/summary.py:293-432).

Data model (FIXTURES.md §1-2): observations live in a LONG table
(DATE, VECTOR, VALUE) with a vector-metadata dim (VECTOR, IS_RATE,
IS_TOTAL, UNIT, …).  The reference's native reader interpolates on
read (summary.py:398); here the semantics are explicit window
arithmetic (docs/usage/summary.rst:31-45):

* **rate vectors** are valid backwards — a resampled point takes the
  value of the *next* observation (bfill);
* **all non-rate vectors** (cumulative totals, pressures, ratios-
  turned-state, untagged) interpolate linearly in time, matching the
  reference's ``summary.pandas_frame`` which linearly interpolates
  every non-rate vector.

Rate-ness comes from the SMSPEC UNITS array when available (a unit
containing ``/DAY`` ⇒ rate, resdata's rule) plus the explicit ratio
keywords WCT/GOR/OGR/WGR/GLR which resdata also classifies as rates;
the pure name heuristic is the fallback for unit-less inputs.

Pipeline: wildcard select (P1) → per-vector resample onto the requested
spine (W8, one shuffle keyed by VECTOR) → optional pivot to the wide
frame the reference returns.  At 100 TB the long layout is the scan-
friendly one (predicate pushdown on VECTOR, date partition pruning);
the wide pivot is a presentation step for bounded vector sets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.functions.strings import well_template_to_regex
from res2df_spark.operators.resample import resample_asof, spine_from_observations


def select_vectors(long: DataFrame, column_keys: Sequence[str], vector_col: str = "VECTOR") -> DataFrame:
    """P1 wildcard vector selection: keep rows whose VECTOR matches any
    glob in ``column_keys`` (reference summary.py:347-398).  A bare
    string is one pattern (str is a Sequence[str] — iterating it would
    turn 'W*' into the match-everything ['W', '*'])."""
    if isinstance(column_keys, str):
        column_keys = [column_keys]
    if not column_keys:
        return long
    pred = None
    for key in column_keys:
        m = F.col(vector_col).rlike(well_template_to_regex(key))
        pred = m if pred is None else (pred | m)
    return long.filter(pred)


def resample(
    long: DataFrame,
    meta: DataFrame,
    freq: str = "monthly",
    date_col: str = "DATE",
    vector_col: str = "VECTOR",
    value_col: str = "VALUE",
    spine: DataFrame | None = None,
) -> DataFrame:
    """Resample every vector onto the ``freq`` spine with per-vector
    interpolation semantics from the metadata dim (broadcast join —
    the dim is one row per vector name).  An explicit ``spine``
    (DataFrame of ``date_col``) overrides the generated one — used for
    point-in-time lookups."""
    if spine is None:
        spine = spine_from_observations(long, date_col, freq=freq)
    tagged = long.join(
        broadcast(meta.select(vector_col, "IS_RATE", "IS_TOTAL")), vector_col, "left"
    )
    # Null-safe complement split: rates bfill, EVERYTHING else linear
    # (the reference linearly interpolates all non-rate vectors).  The
    # two conditions partition every null combination — a vector can
    # never be silently dropped.  At spine dates PAST the last
    # observation (the rolled-forward month/year boundary) a rate has
    # no next sample; resample_asof's bfill extrapolates it to ZERO
    # there while linear holds cumulatives constant — the simulator's
    # extrapolation contract ("rates should be zero, cumulatives
    # should be constant").
    is_rate = F.coalesce(F.col("IS_RATE"), F.lit(False)) & ~F.coalesce(
        F.col("IS_TOTAL"), F.lit(False)
    )
    parts = []
    for how, cond in (
        ("linear", ~is_rate),
        ("bfill", is_rate),
    ):
        sub = tagged.filter(cond).select(vector_col, date_col, value_col)
        parts.append(
            resample_asof(
                sub, spine, keys=[vector_col], date_col=date_col,
                value_col=value_col, how=how,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pivot_wide(
    long: DataFrame,
    date_col: str = "DATE",
    vector_col: str = "VECTOR",
    value_col: str = "VALUE",
    vectors: Sequence[str] | None = None,
) -> DataFrame:
    """Long → wide (one column per vector), the reference's return shape.
    Passing ``vectors`` skips the extra distinct-values job and pins
    column order."""
    g = long.groupBy(date_col)
    p = g.pivot(vector_col, list(vectors)) if vectors else g.pivot(vector_col)
    return p.agg(F.first(value_col)).orderBy(date_col)


def wide_to_long(
    wide: DataFrame,
    date_col: str = "DATE",
    vector_col: str = "VECTOR",
    value_col: str = "VALUE",
) -> DataFrame:
    """Ingest direction (S2): a reference-shaped wide summary frame
    (DATE + one column per vector) → the engine's long layout.  stack()
    generator: partition-local, no shuffle; the long layout is what
    scan pruning and per-vector resampling key on."""
    from res2df_spark.operators.reshape import melt

    vectors = [c for c in wide.columns if c != date_col]
    return melt(
        wide, id_cols=[date_col], value_cols=vectors,
        var_name=vector_col, value_name=value_col,
    )


def crop_mnemonic(
    long: DataFrame, time_index: str, date_col: str = "DATE"
) -> DataFrame:
    """Date mnemonics (summary.py:88-127): ``raw`` keeps every report
    step; ``first``/``last`` keep only the first/last observed date —
    computed as a 1-row aggregate broadcast back as a semi-join, no
    collect."""
    if time_index == "raw":
        return long
    agg = F.min(date_col) if time_index == "first" else F.max(date_col)
    bound = long.agg(agg.alias("__d"))
    return long.join(
        F.broadcast(bound), F.col(date_col) == F.col("__d")
    ).drop("__d")


def df(
    long: DataFrame,
    meta: DataFrame,
    time_index: str | None = None,
    column_keys: Sequence[str] = (),
    wide: bool = True,
) -> DataFrame:
    """The reference's ``summary.df(resdatafiles, time_index,
    column_keys)`` equivalent over the long table + metadata dim.

    ``time_index``: ``None`` (the default — raw report steps, matching
    the reference's ``time_index=None`` default, summary.py:293-295), a
    frequency (daily/weekly/monthly/yearly → resample with
    rate/total-aware interpolation), a mnemonic (raw/first/last →
    crop, no interpolation), or an explicit ISO date / ``datetime.date``
    → interpolated point-in-time lookup at exactly that date (the
    reference's ``time_index=datetime`` form, summary.py:125-127).

    The resampling spine and the first/last dates resolve from the FULL
    summary date range, not the ``column_keys``-filtered subset — the
    reference always derives its time index from ``summary.dates``
    (summary.py:360-375), so a vector first observed mid-run still
    reads back to the run's global first date."""
    import datetime as _dt
    import re as _re

    # a bare string is a single pattern, not an iterable of 1-char
    # globs (column_keys='W*' would otherwise expand to ['W', '*'],
    # where '*' matches EVERYTHING)
    if isinstance(column_keys, str):
        column_keys = [column_keys]
    sel = select_vectors(long, column_keys)
    explicit = None
    if isinstance(time_index, _dt.datetime):
        explicit = time_index
    elif isinstance(time_index, _dt.date):
        explicit = _dt.datetime.combine(time_index, _dt.time())
    elif isinstance(time_index, str) and _re.fullmatch(
        r"\d{4}-\d{2}-\d{2}([T ].*)?", time_index
    ):
        # validate BEFORE building the spine: '2020-02-31' would cast to
        # NULL (non-ANSI) and silently produce a NULL-date spine
        try:
            explicit = _dt.datetime.fromisoformat(time_index)
        except ValueError as err:
            raise ValueError(
                f"time_index {time_index!r} is not a valid ISO date/datetime"
            ) from err
    if explicit is not None:
        # date-only lookups keep a DATE-typed spine (and DATE-typed
        # output); a time-of-day component interpolates at the full
        # datetime, as the reference does (summary.py:125-127)
        if explicit.time() == _dt.time() and not isinstance(time_index, _dt.datetime):
            one = F.lit(explicit.date()).cast("date")
        else:
            one = F.lit(explicit).cast("timestamp")
        spine = long.sparkSession.range(1).select(one.alias("DATE"))
        res = resample(sel, meta, spine=spine)
    elif time_index is None or time_index == "raw":
        res = crop_mnemonic(sel, "raw")
    elif time_index in ("first", "last"):
        # a one-date spine + resample, NOT a date filter: a vector with
        # no observation exactly at the global min/max date must still
        # appear, interpolated/filled at that date (the reference
        # resolves first/last to a one-date index and reads every
        # vector there, summary.py:88-127).  The date comes from the
        # UNFILTERED long table (summary.dates in the reference).
        agg = F.min("DATE") if time_index == "first" else F.max("DATE")
        spine = long.agg(agg.alias("DATE"))
        res = resample(sel, meta, spine=spine)
    else:
        # spine over the FULL summary range, applied to the selection
        spine = spine_from_observations(long, "DATE", freq=time_index)
        res = resample(sel, meta, spine=spine)
    return pivot_wide(res) if wide else res


# Ratio vectors (watercut, gas-oil ratio, …) are classified as RATES by
# resdata even though their names end in T/R-ambiguous ways — WWCT would
# otherwise match the cumulative-total regex.
_RATIO_RE = "^[FWGC](WCT|GOR|OGR|WGR|GLR)H?$"
_TOTAL_RE = "^[FWGC][OWGLVEJ][A-Z]*TH?$"
_RATE_RE = "^[FWGC][OWGLVEJ][A-Z]*RH?$"


def meta_from_vectors(long: DataFrame, vector_col: str = "VECTOR") -> DataFrame:
    """Heuristic metadata dim from vector names alone, for inputs that
    carry no SMSPEC unit block (the reference reads UNITS from the
    SMSPEC, summary.py:567-599; the naming convention encodes the same
    split): keyword = category letter (F/W/G/C) + phase letter +
    ``...T[H]`` for cumulative totals / ``...R[H]`` for rates, with the
    ratio keywords (WCT/GOR/OGR/WGR/GLR) forced into the rate class the
    way resdata classifies them.  State samples like BPR/FPR (pressures)
    are neither — they get the linear default in :func:`resample`.  One
    row per distinct vector — always broadcastable."""
    kw = F.split(F.col(vector_col), ":").getItem(0)
    is_ratio = kw.rlike(_RATIO_RE)
    return (
        long.select(vector_col).distinct()
        .select(
            F.col(vector_col),
            (kw.rlike(_TOTAL_RE) & ~is_ratio).alias("IS_TOTAL"),
            (kw.rlike(_RATE_RE) | is_ratio).alias("IS_RATE"),
        )
    )


def meta_from_units(spark, vectors, units, vector_col: str = "VECTOR") -> DataFrame:
    """Metadata dim from the SMSPEC UNITS array (the authoritative
    source — reference summary.py:567-599 reads units for metadata and
    resdata decides rate-ness from them): a unit containing ``/DAY`` is
    a rate; the ratio keywords are rates regardless of unit; cumulative
    totals keep the name rule.  ``vectors``/``units`` are the parallel
    lists from ``eclbin.parse_smspec`` — bounded by SMSPEC width, so a
    driver-side build is correct and the dim is always broadcastable."""
    import re as _re

    rows = []
    seen = set()
    for v, u in zip(vectors, units):
        if v is None or v == "TIME" or v in seen:
            continue
        seen.add(v)
        kw = str(v).split(":")[0]
        is_ratio = bool(_re.match(_RATIO_RE, kw))
        is_rate = "/DAY" in str(u).upper() or is_ratio
        is_total = bool(_re.match(_TOTAL_RE, kw)) and not is_ratio
        rows.append((v, str(u).strip(), is_total and not is_rate, is_rate))
    return spark.createDataFrame(
        rows, f"{vector_col} string, UNIT string, IS_TOTAL boolean, IS_RATE boolean"
    )


def attach_summary_metadata(out: DataFrame, meta: DataFrame) -> DataFrame:
    """Stamp every vector column with the reference's ``smry_meta``
    fields (summary.py:567-599, exported as Arrow field metadata by
    ``_df2pyarrow``:486-521): unit, is_total, is_rate, is_historical,
    keyword, wgname — carried here via ``StructField.metadata`` (the K2
    typed-writer channel), which ``sinks.writers.to_arrow_table``
    re-attaches on ``--arrow`` export.

    Values are stringified exactly like the reference (``bytes(str(v))``
    makes booleans "True"/"False" and a missing well-or-group name
    "None").  ``is_historical`` follows the public summary-vector
    convention the reference reads from resdata: the keyword of an
    observed-history vector ends with ``H`` (FOPTH, WOPRH, ...).

    The meta dim is bounded by SMSPEC width, so the driver-side collect
    is a bounded lookup, not a distributed fold."""
    rows = {r["VECTOR"]: r for r in meta.collect()}
    cols = []
    for c in out.columns:
        r = rows.get(c)
        if r is None:
            cols.append(F.col(c))
            continue
        parts = c.split(":")
        kw = parts[0]
        # wgname exists only for vector families addressed by a well
        # or group name (W* well, G* group, C* completion, S* segment)
        # — region/block/aquifer vectors (RPR:3, BPR:1,1,1) carry a
        # numeric node id the reference exposes as get_num with
        # wgname None; stamping the number as wgname would hand
        # consumers phantom well names
        named_family = kw[:1] in ("W", "G", "C", "S")
        m = {
            "unit": r["UNIT"],
            "is_total": str(bool(r["IS_TOTAL"])),
            "is_rate": str(bool(r["IS_RATE"])),
            "is_historical": str(kw.endswith("H")),
            "keyword": kw,
            # the well-or-group segment only: a completion vector
            # CPI:OP1:1,1,1 has wgname OP1 (the cell address is the
            # node's num, which the reference adds as get_num only
            # when resdata resolves it — omitted here)
            "wgname": parts[1]
            if named_family and len(parts) > 1 else "None",
        }
        cols.append(F.col(c).alias(c, metadata=m))
    return out.select(*cols)
