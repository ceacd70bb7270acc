"""Timeline-derived chunk sizing for the skew-safe window family.

The halo'd (key, time-chunk) decompositions (``rolling_agg_chunked``,
``sessionize_chunked``) need a ``chunk_seconds``: too large and a hot
key still collapses to a few straggler tasks; too small and the halo
duplication dominates.  The right value depends on the CORPUS — its
timeline span — not on the operator, so this helper derives it once
from the observed span and both operators share it as their default.
This is what makes the skew-safe forms zero-config: a naive caller on
a short-timeline fixture and a production job over years of events
both get a chunk that spreads a hot key over the whole cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def derive_chunk_seconds(
    df: DataFrame,
    ts_col: str,
    floor_seconds: int,
    target_chunks: int | None = None,
) -> int | None:
    """Pick ``chunk_seconds`` from the OBSERVED timeline span:
    ``ceil(span / target_chunks)``, floored at ``floor_seconds`` (a
    frame/halo may reach at most one chunk back, so the chunk can never
    be narrower than the window/gap).  Returns None when the column has
    no non-NULL timestamps — nothing to chunk, callers fall back to
    their static default or the plain form.

    ``target_chunks`` defaults to 8× the cluster's default parallelism:
    enough chunks that a 50%-hot key spreads over every core with slack
    for stragglers, few enough that the chunk-grain bookkeeping pass
    stays trivial.  Halo duplication is ``floor/chunk`` ≤ 1, paid only
    when the span is shorter than ``target_chunks × floor_seconds`` —
    exactly the short-timeline corpora where maximal splitting is the
    right trade (the duplication is bounded; the straggler is not).

    Cost: ONE eager min/max aggregation over ``ts_col`` — map-side
    partial agg emitting one row per partition, a tiny fraction of the
    window shuffle that follows.  Callers that cannot afford the extra
    scan (or want plan-identical reruns regardless of data) pass an
    explicit ``chunk_seconds`` instead.
    """
    spark = df.sparkSession
    if target_chunks is None:
        target_chunks = 8 * spark.sparkContext.defaultParallelism
    us = F.unix_micros(F.col(ts_col))
    lo, hi = df.agg(F.min(us), F.max(us)).first()
    if lo is None or hi is None:
        return None
    span_s = (int(hi) - int(lo)) // 1_000_000
    return max(int(floor_seconds), 1, -(-span_s // max(int(target_chunks), 1)))
