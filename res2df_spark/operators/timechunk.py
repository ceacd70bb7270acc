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

#: Span memo keyed on (applicationId, analyzed-plan semanticHash, col):
#: the skew-safe operators (asof_join, rolling_agg_chunked,
#: sessionize_chunked) each derive chunk_seconds from the SAME frame's
#: timeline span, so a composed pipeline without an explicit
#: ``span_hint`` would pay one min/max Spark job PER OPERATOR CALL.
#: Chunk sizing is performance-only — any chunk width yields identical
#: results (the carry/halo constructions are width-agnostic and
#: oracle-verified) — so a memoized span is always SAFE: a semanticHash
#: collision or data changing under an identical plan can only mis-size
#: chunks, never change an answer.  Bounded and clearable for long
#: sessions; streaming frames never reach here (their callers must pass
#: chunk_seconds / span_hint explicitly).
_SPAN_CACHE: dict[tuple[str, int, str], tuple[int, int] | None] = {}
_SPAN_CACHE_MAX = 256


def clear_span_cache() -> None:
    """Drop every memoized timeline span (use after overwriting a table
    in place within one session, where the identical scan plan would
    otherwise reuse the stale span — mis-sized chunks, not wrong
    answers, but worth refreshing for a long-lived service)."""
    _SPAN_CACHE.clear()


def timeline_span(
    df: DataFrame, ts_col: str, use_cache: bool = True
) -> tuple[int, int] | None:
    """(min, max) of ``ts_col`` in unix MICROSECONDS — the one eager
    scan behind :func:`derive_chunk_seconds`, exposed so a pipeline
    composing several skew-safe operators over the SAME frame computes
    it once and passes it to each as ``span_hint`` instead of paying a
    min/max job per operator call.  Returns None when the column has no
    non-NULL timestamps.

    This runs ONE Spark job eagerly (map-side partial min/max, one row
    per partition) — it re-executes the input lineage, so cache or
    checkpoint upstream heavy work first, and it cannot run on a
    streaming DataFrame (pass an explicit ``chunk_seconds`` there).

    Memoized per (application, analyzed plan, column) — repeat calls on
    a semantically identical frame (the common "several skew-safe
    operators over one table" pipeline) run NO new job.  Pass
    ``use_cache=False`` to force a re-scan (e.g. after rewriting the
    table in place), or :func:`clear_span_cache` to flush everything."""
    key: tuple[str, int, str] | None = None
    if use_cache:
        try:
            key = (
                df.sparkSession.sparkContext.applicationId,
                df.semanticHash(),
                ts_col,
            )
        except Exception:  # noqa: BLE001 — memo is best-effort
            key = None
        if key is not None and key in _SPAN_CACHE:
            return _SPAN_CACHE[key]
    # cast first: the skew-safe operators accept DATE axes (their chunk
    # expressions cast the same way), and unix_micros on a raw DATE
    # column is an AnalysisException
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lo, hi = df.agg(F.min(us), F.max(us)).first()
    span = None if lo is None or hi is None else (int(lo), int(hi))
    if key is not None:
        if len(_SPAN_CACHE) >= _SPAN_CACHE_MAX:
            _SPAN_CACHE.clear()
        _SPAN_CACHE[key] = span
    return span


def derive_chunk_seconds(
    df: DataFrame,
    ts_col: str,
    floor_seconds: int,
    target_chunks: int | None = None,
    span_hint: tuple[int, int] | None = None,
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

    Cost: ONE eager min/max aggregation over ``ts_col`` at CALL time
    (i.e. at plan-construction time for the operators that default to
    this) — map-side partial agg emitting one row per partition, a tiny
    fraction of the window shuffle that follows, but it re-executes the
    input lineage and fails on streaming inputs.  The scan is memoized
    per (application, analyzed plan, column) — see
    :func:`timeline_span` — so composing several skew-safe operators
    over the SAME frame pays it once even without ``span_hint``.
    Callers that cannot afford any scan at all (streaming inputs) or
    want plan-identical reruns regardless of data pass an explicit
    ``chunk_seconds``; ``span_hint`` remains the explicit sharing lever
    across DIFFERENT derived frames of one table.
    """
    spark = df.sparkSession
    if target_chunks is None:
        target_chunks = 8 * spark.sparkContext.defaultParallelism
    span = span_hint if span_hint is not None else timeline_span(df, ts_col)
    if span is None:
        return None
    lo, hi = span
    span_s = (int(hi) - int(lo)) // 1_000_000
    return max(int(floor_seconds), 1, -(-span_s // max(int(target_chunks), 1)))
