"""Gap-based sessionization (event-stream analytics).

Splits each key's event sequence into sessions whenever the gap between
consecutive events exceeds a threshold — the batch counterpart of
Spark's native ``session_window`` (streaming/ops.py:session_rollup_stream
uses that form; this one yields ordinal session ids usable as join keys).

Scale shape: ONE exchange (hash-partition by the session keys).  The
``lag`` flag and the running ``sum`` share the same window spec, so
Catalyst plans a single sort under a single exchange; the follow-up
``groupBy(keys + session_id)`` re-uses the same hash partitioning (the
partition keys are a subset of the grouping keys) — no second shuffle.
Key cardinality (users, wells) is high at 100 TB so the shuffle is
balanced; AQE splits any residual skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak: Sequence[str | Column] = (),
) -> DataFrame:
    """Assign a 1-based ordinal session id per key: a new session starts
    when the previous event for the same key is ``gap_seconds`` or more
    older.  The boundary is EXCLUSIVE of the gap itself — an event
    exactly ``gap`` after its predecessor opens a new session — matching
    ``session_window``, which merges only OVERLAPPING windows
    ``[t, t+gap)``.  The comparison is integer microseconds
    (``unix_micros``), never float seconds, so the boundary decision is
    exact and engine-portable.

    ``tiebreak`` disambiguates equal timestamps so the running count is
    deterministic (convention: every window ordering carries a unique
    tie-breaker).
    """
    order = [F.col(ts_col), *[F.col(c) if isinstance(c, str) else c for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    # NULL-timestamp events have no place on the time axis: they get a
    # NULL session id and never open a session — without the gate every
    # NULL-ts row would fire is_new (prev_us is NULL for each) and
    # inflate the ordinal ids of all real sessions in the partition
    is_new = (
        F.when(us.isNull(), F.lit(0))
        .when(
            prev_us.isNull() | (us - prev_us >= F.lit(int(gap_seconds) * 1_000_000)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    running = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(
        session_col, F.when(us.isNotNull(), running).cast("long")
    )


def session_stats(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int,
    value_col: str | None = None,
    tiebreak: Sequence[str | Column] = (),
    round_digits: int | None = None,
) -> DataFrame:
    """Per-session rollup: event count, first/last timestamp, optional
    value sum (full precision unless ``round_digits`` is given — a
    generic operator must not silently truncate small aggregates).
    Single-shuffle plan (see module docstring)."""
    s = sessionize(df, ts_col, keys, gap_seconds, tiebreak=tiebreak)
    # sessionize keeps NULL-timestamp rows off the time axis (NULL
    # session_id); rolling them up would report a phantom "session"
    # whose n_events/total_value read as real activity
    s = s.filter(F.col("session_id").isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        total = F.sum(value_col)
        if round_digits is not None:
            total = F.round(total, round_digits)
        aggs.append(total.alias("total_value"))
    return s.groupBy(*keys, "session_id").agg(*aggs)
