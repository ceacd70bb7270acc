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

    DEFAULT STAYS THE PLAIN WINDOW (round-8 decision, measured): unlike
    ``rolling_agg``/``dedup_keep``/``asof_join``, whose hot-key
    stragglers measured 78×/3.8× and rising, sessionize's window is a
    lag + running-sum STREAMING pass — the 50%-hot-key battery measured
    the plain form at 1.15×/2.64×/1.82× (400k/8M/32M rows) while
    :func:`sessionize_chunked`'s three extra exchanges (halo union,
    chunk-grain offsets, null-safe offsets join) cost ~2× the UNIFORM
    runtime and only matched the plain form's absolute time even on the
    adversarial corpus (14.0s vs 14.9s at 32M).  The decomposition
    overhead exceeds the straggler at every measured size, so the
    skew-safe twin stays opt-in for corpora with a dominant key AND a
    long per-key timeline where the single-task n·log n sort finally
    wins (SCALEPROBE ``skewed_keys_big`` re-measures this per round).
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


def sessionize_chunked(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int,
    session_col: str = "session_id",
    chunk_seconds: int | None = None,
    tiebreak: Sequence[str | Column] = (),
    span_hint: tuple[int, int] | None = None,
) -> DataFrame:
    """Skew-safe :func:`sessionize`: identical 1-based ordinal session
    ids, computed without putting a hot key's whole timeline in one
    window task.

    Sessionization looks inherently sequential (every id is a running
    count over the key's ordered history), but the recurrence
    decomposes: cut the timeline into ``chunk_seconds`` chunks and

    1. carry a one-row HALO (the previous chunk's last event time) into
       each chunk, so the chunk's first ``is_new`` decision sees its
       true predecessor;
    2. compute ``is_new`` and the WITHIN-chunk running count under a
       window on (keys, chunk) — the hot key now spreads over
       timeline/chunk tasks;
    3. aggregate per-chunk session-start counts (partial-aggregatable,
       chunk-grain — thousands of rows per key, not billions) and
       prefix-sum them with a window on the chunk-grain table;
    4. add the chunk's offset to the within-chunk count.

    A chunk with no events needs no special case: the halo hops one
    chunk, and an empty predecessor means the time gap already exceeds
    ``chunk_seconds >= gap_seconds``, so "no halo row" and "new
    session" coincide — which is why ``chunk_seconds`` must be
    ≥ ``gap_seconds``.  ``chunk_seconds`` defaults (round 7) to the
    timeline-span derivation of :func:`~res2df_spark.operators.
    timechunk.derive_chunk_seconds` — span / 8×parallelism, floored at
    the gap — so the skew-safe form is zero-config on short fixtures
    and long production timelines alike.  NOTE the derivation runs one
    EAGER min/max Spark job at plan-construction time (re-executes the
    input lineage; fails on streaming inputs) — pass ``chunk_seconds``
    explicitly, or share one :func:`~res2df_spark.operators.timechunk.
    timeline_span` result via ``span_hint`` when composing several
    skew-safe operators over the same frame.  A corpus with no real
    timestamps falls back to 1024 × gap.
    NULL-timestamp rows get a NULL session id, exactly like
    :func:`sessionize`.
    """
    gap_us = int(gap_seconds) * 1_000_000
    if chunk_seconds is None:
        from res2df_spark.operators.timechunk import derive_chunk_seconds

        chunk_seconds = derive_chunk_seconds(
            df, ts_col, gap_seconds, span_hint=span_hint
        )
    chunk_us = (
        int(chunk_seconds) * 1_000_000 if chunk_seconds is not None
        else 1024 * gap_us
    )
    if chunk_us < gap_us:
        raise ValueError(
            f"chunk_seconds ({chunk_us // 1_000_000}) must be >= "
            f"gap_seconds ({gap_seconds}): the halo carries exactly one "
            "chunk of history"
        )
    tb = [F.col(c) if isinstance(c, str) else c for c in tiebreak]
    us = F.unix_micros(F.col(ts_col))
    with_us = df.withColumn("__us", us)
    # The coalesce does double duty.  (1) NULL-timestamp rows ride the
    # main pipeline in their own __chunk = -1 cell (round 12: a
    # separate filter-scan + union just to hand them a NULL session id
    # was a second full pass over the input); every decision below
    # gates on __us IS NULL so they start no session, add 0 to every
    # chunk offset, and surface with a NULL id.  (2) Catalyst types the
    # cast chain nullable, and the offsets join then INFERS
    # isnotnull(__chunk) filters that push into the BODY branch's scan
    # only (the offsets side stops at its aggregate), making the two
    # copies of the union → exchange subtree canonically unequal —
    # which blocks the ReuseExchange this operator's round-12 sharing
    # relies on.  Marking the expression non-nullable removes the
    # inference source.
    chunk = F.coalesce(
        (
            (F.col("__us") - F.pmod(F.col("__us"), F.lit(chunk_us)))
            / F.lit(chunk_us)
        ).cast("long"),
        F.lit(-1).cast("long"),
    )
    real = (
        with_us.withColumn("__chunk", chunk)
        .withColumn("__halo", F.lit(False))
    )
    # the halo is ONE row per (key, chunk): only its timestamp matters
    # (it sorts strictly before every real row of the next chunk, so
    # tiebreak columns are irrelevant), and it never emits output.
    # The NULL-ts cell (__chunk -1) also emits a halo row into chunk 0
    # — its __us is max-of-NULLs = NULL, so it sorts first there and
    # chunk 0's first real row still sees a NULL predecessor, exactly
    # as when no chunk -1 existed.
    halo = (
        real.groupBy(*keys, "__chunk")
        .agg(F.max("__us").alias("__us"))
        .withColumn("__chunk", F.col("__chunk") + 1)
        .withColumn("__halo", F.lit(True))
    )
    both = real.unionByName(halo, allowMissingColumns=True)
    w = Window.partitionBy(*keys, "__chunk").orderBy(F.col("__us"), *tb)
    prev_us = F.lag("__us").over(w)
    is_new = (
        F.when(F.col("__halo"), F.lit(0))
        # NULL-timestamp rows never open a session (same gate as the
        # plain form) — without it every NULL-ts row fires the
        # prev_us-is-NULL test and its count leaks into the offsets
        .when(F.col("__us").isNull(), F.lit(0))
        .when(
            prev_us.isNull() | (F.col("__us") - prev_us >= F.lit(gap_us)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    within = both.withColumn("__new", is_new).withColumn(
        "__within",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # chunk-grain offsets: starts per (key, chunk), prefix-summed over
    # the key's chunks — the only per-key-global pass, and it runs on
    # #chunks rows, not #events.
    #
    # Round 12: the summed __new rides inside a CASE WHEN that
    # references every column this branch does not otherwise need
    # (both branches yield __new, so the value is unchanged) — without
    # it, column pruning drops those columns from this branch's copy
    # of the union → exchange subtree, the two copies stop being
    # canonically equal, and the offsets branch re-runs the whole
    # scan + halo-aggregate + union pipeline instead of riding the
    # body branch's exchange via ReuseExchange (measured: parquet
    # scans 5 → 3; the exchange carries the full column set for the
    # body branch anyway, so the shared shuffle adds no bytes).
    cnt_cols = {*(str(k) for k in keys), "__chunk", "__new", "__us"}
    missing = [c for c in with_us.columns if c not in cnt_cols]
    starts_src = F.col("__new")
    if missing:
        # hash() is non-nullable and accepts any type, and
        # `pmod(hash(...), 1)` is exactly 0 on every row but opaque to
        # the simplifier (an identical-branch CASE WHEN and `hash()*0`
        # were tried first; both got simplified away and pruning
        # returned)
        starts_src = starts_src + F.pmod(F.hash(*missing), F.lit(1))
    cnt = within.groupBy(*keys, "__chunk").agg(
        F.sum(starts_src).alias("__starts")
    )
    off_w = (
        Window.partitionBy(*keys)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL keys are real groups to every window/groupBy above (and to
    # the plain sessionize) — the offsets join must be NULL-SAFE or
    # NULL-key rows silently vanish from the output
    offsets = cnt.withColumn(
        "__off", F.coalesce(F.sum("__starts").over(off_w), F.lit(0))
    ).select(
        *[F.col(k).alias(f"__ok{i}") for i, k in enumerate(keys)],
        F.col("__chunk").alias("__oc"),
        "__off",
    )
    body = within.filter(~F.col("__halo"))
    cond = [body[k].eqNullSafe(offsets[f"__ok{i}"]) for i, k in enumerate(keys)]
    cond.append(body["__chunk"] == offsets["__oc"])
    # NULL-ts rows (chunk -1, __within 0, __off 0) surface here with a
    # NULL id — the plain form's semantics, with no re-attach pass
    out_cols = [*df.columns, F.when(
        F.col("__us").isNotNull(), F.col("__off") + F.col("__within")
    ).cast("long").alias(session_col)]
    return body.join(offsets, cond).select(*out_cols)


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
