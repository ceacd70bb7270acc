"""Column-level table profiling — the ANALYZE-style data-quality audit
(row count, null count, exact distinct count, min/max rendered to
strings) for any DataFrame, one output row per column.

Plan shape: ONE aggregation pass computes every column's null count and
min/max (all partial-aggregated); exact distinct counts are per-column
``count_distinct`` in the same aggregate — Spark plans multi-distinct
aggregates with an expand + two-stage agg, still a single scan of the
input.  For 100 TB profiling swap ``approx_count_distinct`` in via
``exact_distinct=False`` (HLL, one pass, no expand).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: every column): returns one row per
    column with (column, n_rows, n_nulls, n_distinct, min_str,
    max_str).  min/max are rendered with ``CAST AS STRING`` so the
    output schema is column-type-agnostic (and engine-portable: both
    engines render integers/strings identically; avoid float columns in
    oracle-checked profiles, their string forms differ)."""
    cols = list(cols or df.columns)

    # backtick-quoted references + positional aliases: a column name
    # containing a dot would otherwise parse as a struct-field path
    # and fail resolution
    def _qcol(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    distinct = (
        (lambda c: F.count_distinct(_qcol(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(_qcol(c)))
    )
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(F.when(_qcol(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            distinct(c).alias(f"__nd_{i}"),
            # min/max on the NATIVE type, rendered to string afterwards —
            # casting first would make numeric extremes lexicographic
            # (min of [9, 10] = '10')
            F.min(_qcol(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_qcol(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{i}").cast("long").alias("n_rows"),
                F.col(f"__nn_{i}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{i}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_str"),
                F.col(f"__mx_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def value_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Exact equal-width histogram of a numeric column — the
    threshold-calibration surface for quality/similarity scores (pick a
    quality-gate cutoff from the score distribution, document a dataset
    card) without collecting values to the driver.

    Returns one row per OCCUPIED bin: (bin, bin_lo, bin_hi, n), with
    ``bin`` 0-based and values equal to ``hi`` counted into the last
    bin (half-open bins elsewhere, the numpy/matplotlib convention).
    Explicit ``lo``/``hi`` bound the plan to one aggregate; a missing
    bound (either or both) is derived from the data via a min/max
    aggregate riding as a one-row broadcast cross join — still
    in-plan, no driver action.  NULL, NaN and ±Infinity values are
    excluded (they have no bin — one unfiltered infinity would
    otherwise make the derived width infinite and collapse every
    finite value's bin to NaN); values outside explicit bounds are
    clamped into the edge bins so the histogram accounts for every
    finite value.

    Scale shape: one partial-aggregated groupBy on the bin id — at most
    ``n_bins`` rows reach the reducer per map task regardless of data
    size; with bounds given, the whole plan is one map-side expression
    plus that aggregate.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if lo is not None and hi is not None and not float(hi) >= float(lo):
        raise ValueError(f"hi ({hi}) must be >= lo ({lo})")
    x = F.col(col).cast("double")
    vals = df.filter(
        x.isNotNull()
        & ~F.isnan(x)
        & (x != float("inf"))
        & (x != float("-inf"))
    ).select(x.alias("__x"))
    if lo is None or hi is None:
        # derive only the MISSING bound(s) — a half-specified range
        # keeps the caller's explicit anchor
        bounds = vals.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        vals = vals.crossJoin(F.broadcast(bounds))
        lo_c = F.lit(float(lo)) if lo is not None else F.col("__lo")
        hi_c = F.lit(float(hi)) if hi is not None else F.col("__hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    # clamp, don't filter: out-of-range values land in the edge bins so
    # the histogram accounts for every finite value (a no-op for
    # data-derived bounds)
    vals = vals.withColumn(
        "__x", F.least(F.greatest(F.col("__x"), lo_c), hi_c)
    )
    width = (hi_c - lo_c) / F.lit(float(n_bins))
    # degenerate lo == hi (constant column): everything lands in bin 0
    bin_ = F.when(width > 0, F.least(
        F.floor((F.col("__x") - lo_c) / width), F.lit(n_bins - 1)
    )).otherwise(F.lit(0)).cast("long")
    return (
        vals.withColumn("__bin", bin_)
        .withColumn("__lo2", lo_c)
        .withColumn("__w", width)
        .groupBy("__bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__lo2").alias("__l"),
            F.min("__w").alias("__ww"),
        )
        .select(
            F.col("__bin").alias("bin"),
            F.round(F.col("__l") + F.col("__bin") * F.col("__ww"), 6).alias("bin_lo"),
            F.round(F.col("__l") + (F.col("__bin") + 1) * F.col("__ww"), 6).alias("bin_hi"),
            "n",
        )
    )
