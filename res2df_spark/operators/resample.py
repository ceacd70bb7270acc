"""Time resampling (W8) — date spines and as-of resampling with
rate/total-aware interpolation.

The reference resolves a frequency mnemonic to a pandas date_range and
lets the native summary reader interpolate
(/root/reference/src/res2df/summary.py:195-290,398; semantics in
docs/usage/summary.rst:31-45: *cumulative* vectors interpolate linearly
in time, *rate* vectors take the value of the next report step —
backward fill).  Here the spine is ``explode(sequence(...))`` and the
interpolation is window arithmetic over a union — one shuffle per key,
no UDF, no driver loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_FREQ_INTERVAL = {
    "daily": "interval 1 day",
    "weekly": "interval 1 week",
    "monthly": "interval 1 month",
    "yearly": "interval 1 year",
}
_FREQ_TRUNC = {"daily": "day", "weekly": "week", "monthly": "month", "yearly": "year"}


def _spine_sql(freq: str, start_expr: str, end_expr: str) -> str:
    """The shared spine generator: ``sequence(rollback(start),
    rollforward(end), interval)`` with the reference's rollforward rule
    (an end already ON a period boundary stays put — advancing it would
    fabricate an extrapolated row past the end of the run).  ONE home
    for the boundary-equality test so date_spine and
    spine_from_observations can never drift."""
    if freq not in _FREQ_INTERVAL:
        raise ValueError(
            f"unsupported frequency {freq!r}: expected one of "
            f"{sorted(_FREQ_INTERVAL)}"
        )
    interval, unit = _FREQ_INTERVAL[freq], _FREQ_TRUNC[freq]
    # start_expr/end_expr must already be timestamp-typed expressions
    roll_end = (
        f"CASE WHEN date_trunc('{unit}', {end_expr}) = {end_expr} "
        f"THEN {end_expr} "
        f"ELSE date_trunc('{unit}', {end_expr}) + {interval} END"
    )
    return f"sequence(date_trunc('{unit}', {start_expr}), {roll_end}, {interval})"


def date_spine(
    spark: SparkSession,
    start,
    end,
    freq: str = "monthly",
    date_col: str = "DATE",
) -> DataFrame:
    """DataFrame of one DATE per period boundary in [start, end].

    Mirrors ``resample_smry_dates`` normalization
    (/root/reference/src/res2df/summary.py:195-290): start is rolled back
    to the period start, end rolled FORWARD — but, like the reference's
    ``offset.rollforward``, an end already ON a period boundary stays
    put (advancing it would fabricate an extrapolated row past the end
    of the run).

    An INVERTED range (start > end) yields an empty spine like the
    reference's ``date_range`` — Spark's ``sequence`` would otherwise
    abort the job with a raw "Illegal sequence boundaries" error.
    """
    seq = F.when(
        F.expr(f"to_timestamp('{start}') <= to_timestamp('{end}')"),
        F.expr(
            _spine_sql(
                freq, f"to_timestamp('{start}')", f"to_timestamp('{end}')"
            )
        ),
    ).otherwise(F.expr("array()").cast("array<timestamp>"))
    return (
        spark.range(1)
        .select(F.explode(seq).alias(date_col))
        .select(F.col(date_col).cast("date").alias(date_col))
    )


def spine_from_observations(
    obs: DataFrame, date_col: str, freq: str = "monthly"
) -> DataFrame:
    """Date spine spanning the observed min/max of ``date_col``.

    Computed without collecting to the driver: a single-row aggregate
    cross-joined (broadcast, 1 row) with the generated sequence.
    """
    bounds = obs.agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    return bounds.select(
        F.explode(
            F.expr(_spine_sql(freq, "to_timestamp(__lo)", "to_timestamp(__hi)"))
        ).alias(date_col)
    ).select(F.col(date_col).cast("date").alias(date_col))


def resample_asof(
    obs: DataFrame,
    spine: DataFrame,
    keys: Sequence[str],
    date_col: str,
    value_col: str,
    how: str = "linear",
) -> DataFrame:
    """Resample (keys, date, value) observations onto spine dates.

    ``how='linear'`` — linear interpolation in time (the reference's
    semantics for cumulative/total vectors); ``how='bfill'`` — value of
    the next observation (rate vectors, which are valid backwards in
    time, docs/usage/summary.rst:31-45); ``how='ffill'`` — previous
    observation.

    Implemented as union + two windows: one shuffle on ``keys``.
    """
    keys = list(keys)
    spine_keys = obs.select(*keys).distinct().crossJoin(spine.select(date_col))
    tagged_obs = obs.select(
        *keys,
        F.col(date_col).cast("timestamp").alias("__t"),
        F.col(value_col).cast("double").alias("__y"),
        F.lit(0).alias("__is_spine"),
    )
    tagged_spine = spine_keys.select(
        *keys,
        F.col(date_col).cast("timestamp").alias("__t"),
        F.lit(None).cast("double").alias("__y"),
        F.lit(1).alias("__is_spine"),
    )
    u = tagged_obs.unionByName(tagged_spine)
    # integer microseconds, never float seconds: double epoch-seconds
    # lose sub-second exactness at large epochs (ULP > 1µs past ~2100 —
    # the engine-wide unix_micros boundary convention), which would
    # collapse or wildly extrapolate the frac below for close
    # observations; the frac RATIO itself is unchanged (µs numerator
    # and denominator are the second-based ones scaled exactly by 1e6)
    x = F.unix_micros(F.col("__t"))
    # a NULL-date observation must contribute NEITHER its value nor an
    # x: gating only y_x would desynchronize the (prev_y, prev_x) pair
    # and emit the phantom value verbatim at spine dates
    y = F.when(x.isNotNull(), F.col("__y"))
    y_x = F.when(y.isNotNull(), x)
    # observation sorts before the spine row at equal time → exact hits
    # take the observed value; __y as the final sort makes duplicate
    # same-date observations resolve deterministically instead of by
    # partition layout
    wp = (
        Window.partitionBy(*keys)
        .orderBy(x.asc(), F.col("__is_spine").asc(), F.col("__y").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy(x.asc(), F.col("__is_spine").desc(), F.col("__y").asc_nulls_first())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_y = F.last(y, ignorenulls=True).over(wp)
    prev_x = F.last(y_x, ignorenulls=True).over(wp)
    next_y = F.first(y, ignorenulls=True).over(wn)
    next_x = F.first(y_x, ignorenulls=True).over(wn)
    if how == "linear":
        frac = F.when(next_x != prev_x, (x - prev_x) / (next_x - prev_x)).otherwise(F.lit(0.0))
        val = (
            F.when(prev_y.isNotNull() & next_y.isNotNull(), prev_y + (next_y - prev_y) * frac)
            .otherwise(F.coalesce(prev_y, next_y))
        )
    elif how == "bfill":
        # bfill is the RATE rule: a rate is valid backwards to the
        # previous report step, so within the observed range the next
        # observation's value applies.  PAST the last observation a
        # rate extrapolates to ZERO, never carries forward — the
        # reference's extrapolation contract ("rates should be zero,
        # cumulatives should be constant", test_summary.py
        # test_extrapolation; resdata gives 0 for rates beyond end).
        # A key with no observations at all stays NULL.
        val = F.coalesce(
            next_y, F.when(prev_y.isNotNull(), F.lit(0.0))
        )
    elif how == "ffill":
        val = F.coalesce(prev_y, next_y)
    else:
        raise ValueError(how)
    # Evaluate the windows BEFORE dropping observation rows — filtering
    # first would leave the windows nothing but NULL-payload spine rows.
    # Output dates keep the spine's own type: a DATE spine yields DATE,
    # a TIMESTAMP spine (explicit point-in-time lookup with a
    # time-of-day component) keeps the full datetime.
    out_type = spine.schema[date_col].dataType.simpleString()
    return (
        u.withColumn("__val", val)
        .filter(F.col("__is_spine") == 1)
        .select(
            *keys,
            F.col("__t").cast(out_type).alias(date_col),
            F.col("__val").alias(value_col),
        )
    )
