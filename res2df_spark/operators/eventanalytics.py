"""Event-stream analytics: trailing time windows, funnel conversion,
retention cohorts.

These are the standard product-analytics operators over an event table
(ts, user, type, value) — the same shapes a training-data pipeline uses
for telemetry over ingest/curation events.  All are expressed so the
per-user work rides ONE hash partitioning on the user key:

* ``rolling_agg``: a RANGE window frame over integer microseconds —
  one exchange, the frame is evaluated streamingly within the sort.
* ``funnel_steps``: per-step conditional min-timestamp chain; each
  round is a groupBy/join on the SAME user key, so Catalyst reuses the
  partitioning instead of re-shuffling (plan-checked in tests).
* ``retention_cohorts``: first-touch cohort + per-day activity, two
  partial-agg groupBys ending in the small (cohort, offset) grid.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def rolling_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    window_seconds: int,
    count_name: str = "n_window",
    sum_name: str = "sum_window",
    round_digits: int | None = None,
    skew_safe: bool = True,
    chunk_seconds: int | None = None,
    target_chunks: int | None = None,
    span_hint: tuple[int, int] | None = None,
) -> DataFrame:
    """Trailing time-window aggregates per key: for every event, the
    count and value-sum of the key's events in ``[ts - window, ts]``
    (inclusive on both ends; equal timestamps are frame peers).

    The frame is a RANGE window over ``unix_micros`` — integer
    microsecond bounds, so window membership is exact on any engine.
    ``round_digits`` optionally rounds the sum (for cross-engine
    comparison); by default the aggregate is emitted at full precision
    — a generic operator must not silently truncate small-magnitude
    values.

    SKEW-SAFE BY DEFAULT (round 7): a plain ``PARTITION BY keys``
    window puts a key's whole timeline in ONE task — the scale probe
    measured a 50%-hot key at ~78× the uniform runtime, and AQE cannot
    split a window partition.  So by default this delegates to
    :func:`rolling_agg_chunked` with ``chunk_seconds`` derived from the
    observed timeline span via
    :func:`~res2df_spark.operators.timechunk.derive_chunk_seconds`
    (span / ``target_chunks``, floored at ``window_seconds``).  NOTE
    the derivation runs ONE EAGER min/max Spark job at plan-BUILD time
    (it re-executes the input lineage and cannot run on a streaming
    DataFrame) — pass an explicit ``chunk_seconds`` (or a ``span_hint``
    from :func:`~res2df_spark.operators.timechunk.timeline_span`,
    computed once and shared across operators) for streaming or
    plan-latency-sensitive callers.  Output parity with the plain
    window form: row counts, frame COUNTS, and integer/decimal sums
    are exact; FLOAT/DOUBLE sums are computed by the prefix-difference
    engine and may differ from direct frame summation by
    floating-point REORDERING error (bounded by the chunk span — see
    :func:`_prefix_frame_aggs`), so a hashed/exact comparison on a
    rounding boundary can flip.  For bit-exact float parity with the
    plain form use ``skew_safe=False`` or delegate explicitly to
    :func:`rolling_agg_chunked` with ``method="recompute"``.
    ``skew_safe=False`` opts into the single-window form (no extra
    scan, one exchange — fine when keys are known-uniform).  A corpus
    with no non-NULL timestamps also falls back to the single-window
    form (every row is in the NULL peer group; there is no timeline to
    chunk).
    """
    if not skew_safe and (
        chunk_seconds is not None or target_chunks is not None or span_hint is not None
    ):
        raise ValueError(
            "chunk_seconds/target_chunks/span_hint request the chunked "
            "decomposition but skew_safe=False pins the single-window form "
            "- drop one side of the conflict"
        )
    if skew_safe:
        cs = chunk_seconds
        if cs is None:
            from res2df_spark.operators.timechunk import derive_chunk_seconds

            cs = derive_chunk_seconds(
                df, ts_col, window_seconds, target_chunks, span_hint=span_hint
            )
        if cs is not None:
            return rolling_agg_chunked(
                df,
                ts_col,
                keys,
                value_col,
                window_seconds,
                chunk_seconds=cs,
                count_name=count_name,
                sum_name=sum_name,
                round_digits=round_digits,
            )
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(us)
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    total = F.sum(value_col).over(w)
    if round_digits is not None:
        total = F.round(total, round_digits)
    return df.withColumn(
        count_name, F.count(F.lit(1)).over(w).cast("long")
    ).withColumn(sum_name, total)


def _prefix_frame_aggs(df, part_cols, us_col, value_col, window_us):
    """Trailing-frame ``(count, sum)`` over ``[t − window, t]`` as
    DIFFERENCES of two add-only prefix frames — ``agg OVER (UNBOUNDED
    PRECEDING, CURRENT ROW)`` minus ``agg OVER (UNBOUNDED PRECEDING,
    window+1µs PRECEDING)`` — sharing one sort on ``part_cols``.

    Why: Spark's bounded-lower-bound RANGE frame re-aggregates its whole
    buffer every time a row EXITS the frame (SlidingWindowFunctionFrame
    has no retract path), making a dense hot key O(rows × frame-size);
    unbounded-preceding frames only ever ADD rows — O(rows).  The two
    prefixes differ by exactly the frame ``[t − window, t]`` (the upper
    bound ``−window−1`` µs excludes the frame's inclusive left edge;
    timestamps are integer µs so off-by-one is exact).

    Exactness bookkeeping, matching direct IEEE frame summation:

    * count: integer prefix difference — exact.
    * integer sums: prefixes in ``decimal(38,0)`` (a 64-bit prefix could
      overflow where the frame sum would not), difference cast back to
      Spark's native sum type.
    * float/double sums: NaN / +Inf / −Inf occurrences are COUNTED in
      separate integer prefixes (an Inf or NaN entering a plain running
      sum would poison every later frame, even after it leaves), and the
      frame result is rebuilt by IEEE rules: any NaN or (+Inf and −Inf)
      → NaN; +Inf → +Inf; −Inf → −Inf; else the finite-part difference,
      which may differ from direct frame summation only by FP
      REORDERING error (bounded by the partition's span — callers chunk
      the timeline, so prefixes never cross a chunk).
    * all-NULL (or empty) frames yield NULL, like ``sum`` over a frame
      with no non-NULL input.
    """
    order = F.col(us_col)
    w_le = (
        Window.partitionBy(*part_cols)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_lt = (
        Window.partitionBy(*part_cols)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, -int(window_us) - 1)
    )
    v = F.col(value_col)
    # Spark's result type for sum(value) — match it exactly so the
    # prefix engine is schema-identical to the recompute engine
    sum_type = df.select(F.sum(v).alias("_s")).schema[0].dataType.simpleString()

    def pdiff(agg, zero):
        # agg over the w_lt frame is NULL when the frame is empty (or
        # all-NULL); the subtrahend must then be the typed zero
        return agg.over(w_le) - F.coalesce(agg.over(w_lt), zero)

    n_expr = F.count(F.lit(1)).over(w_le) - F.count(F.lit(1)).over(w_lt)
    n_vals = F.count(v).over(w_le) - F.count(v).over(w_lt)
    vt = dict(df.dtypes)[value_col]
    if vt in ("double", "float"):
        pinf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
        fin = F.when(~F.isnan(v) & (v != pinf) & (v != ninf), v)
        fin_sum = pdiff(F.sum(fin), F.lit(0.0))
        n_nan = pdiff(F.sum(F.when(F.isnan(v), 1).otherwise(0)), F.lit(0))
        n_pinf = pdiff(F.sum(F.when(v == pinf, 1).otherwise(0)), F.lit(0))
        n_ninf = pdiff(F.sum(F.when(v == ninf, 1).otherwise(0)), F.lit(0))
        s_expr = (
            F.when(n_vals == 0, F.lit(None))
            .when(
                (n_nan > 0) | ((n_pinf > 0) & (n_ninf > 0)),
                F.lit(float("nan")),
            )
            .when(n_pinf > 0, pinf)
            .when(n_ninf > 0, ninf)
            .otherwise(F.coalesce(fin_sum, F.lit(0.0)))
        ).cast(sum_type)
    elif vt in ("bigint", "int", "smallint", "tinyint"):
        sv = F.sum(v.cast("decimal(38,0)"))
        s_expr = (
            F.when(n_vals == 0, F.lit(None)).otherwise(
                pdiff(sv, F.lit(0).cast("decimal(38,0)"))
            )
        ).cast(sum_type)
    else:
        # decimals: native decimal prefixes — exact arithmetic; a
        # prefix overflowing decimal(38) errors loudly under ANSI
        # rather than returning a wrong frame sum
        s_expr = (
            F.when(n_vals == 0, F.lit(None)).otherwise(
                pdiff(F.sum(v), F.lit(0))
            )
        ).cast(sum_type)
    return n_expr, s_expr


def rolling_agg_chunked(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    window_seconds: int,
    chunk_seconds: int | None = None,
    count_name: str = "n_window",
    sum_name: str = "sum_window",
    round_digits: int | None = None,
    method: str = "prefix",
    span_hint: tuple[int, int] | None = None,
) -> DataFrame:
    """Skew-safe :func:`rolling_agg`: identical trailing-window
    semantics, but the hot key no longer becomes one straggler task.

    A window ``PARTITION BY keys`` puts a key's whole timeline in ONE
    task; a key owning half the corpus makes that task the job (the
    scale probe measures ~50× on a 50%-hot-key fixture) and AQE cannot
    split a window partition.  Here the timeline is cut into
    ``chunk_seconds`` chunks and the partition key becomes
    (keys, chunk), so a hot key spreads over timeline/chunk tasks.
    Exactness is preserved with a HALO: every row in the last
    ``window_seconds`` of a chunk is duplicated into the next chunk
    (flagged, contributing to frames but emitting no output row), which
    is precisely the set of rows a frame near a chunk start can reach
    back to.  ``chunk_seconds`` defaults (round 7) to the
    timeline-span derivation of :func:`~res2df_spark.operators.
    timechunk.derive_chunk_seconds` — span / 8×parallelism, floored at
    the window, one extra min/max scan — so short-timeline corpora
    split maximally while long timelines keep halo duplication
    negligible; a corpus with no real timestamps falls back to 64× the
    window (~1.6% duplication).  It must be ≥ ``window_seconds`` (a
    frame may never need rows two chunks back).

    ``method`` picks the frame engine (round 7):

    * ``"prefix"`` (default): each trailing aggregate is the DIFFERENCE
      of two ADD-ONLY prefix frames — ``agg OVER (UNBOUNDED PRECEDING,
      CURRENT ROW)`` minus ``agg OVER (UNBOUNDED PRECEDING, window+1µs
      PRECEDING)``.  Spark evaluates unbounded-preceding frames
      incrementally (one add per row), but a BOUNDED lower bound makes
      it re-aggregate the whole buffer every time a row leaves the
      frame — O(rows × frame) per task, which the skew probe measured
      at 33 s for a single hot key whose frames hold ~6 k rows.  The
      prefix difference is O(rows) per task.  Count results are exact
      (integer / overflow-proof decimal prefixes); float sums carry
      explicit NaN / ±Inf / all-NULL bookkeeping so IEEE frame
      semantics are preserved, and the finite part may differ from
      direct frame summation only by floating-point REORDERING error,
      bounded by the chunk span (prefixes never cross a chunk).
    * ``"recompute"``: the plain bounded RANGE frame (Spark's sliding
      buffer) — direct frame summation, kept as the A/B reference.

    Rows with NULL ``ts_col`` aggregate over the key's NULL-timestamp
    PEER GROUP (count/sum of that key's NULL-ts rows) — exactly what
    :func:`rolling_agg`'s RANGE window does with NULL ordering values,
    so the two forms stay row-identical on any input.  Chunk ids come
    from exact integer floor-division of microseconds, so chunk
    assignment — like frame membership — is engine-portable.
    """
    if method not in ("prefix", "recompute"):
        raise ValueError(f"method must be 'prefix' or 'recompute', got {method!r}")
    window_us = int(window_seconds) * 1_000_000
    if chunk_seconds is None:
        from res2df_spark.operators.timechunk import derive_chunk_seconds

        chunk_seconds = derive_chunk_seconds(
            df, ts_col, window_seconds, span_hint=span_hint
        )
    chunk_us = (
        int(chunk_seconds) * 1_000_000 if chunk_seconds is not None
        else 64 * window_us
    )
    if chunk_us < window_us:
        raise ValueError(
            f"chunk_seconds ({chunk_us // 1_000_000}) must be >= "
            f"window_seconds ({window_seconds}): a frame may reach at "
            "most one chunk back"
        )
    us = F.unix_micros(F.col(ts_col))
    with_us = df.withColumn("__us", us)
    # exact integer floor division (pmod keeps negatives correct)
    chunk = (
        (F.col("__us") - F.pmod(F.col("__us"), F.lit(chunk_us)))
        / F.lit(chunk_us)
    ).cast("long")
    # NULL-ts rows ride the main pipeline in their own NULL-chunk cell
    # (round 12: a separate filter-scan + union just to aggregate the
    # NULL peer group was a second full pass over the input); their
    # frame values are gated below, and the halo filter's NULL pmod
    # already excludes them from halo duplication
    main = (
        with_us.withColumn("__chunk", chunk)
        .withColumn("__halo", F.lit(False))
    )
    halo = (
        main.filter(
            F.pmod(F.col("__us"), F.lit(chunk_us))
            >= F.lit(chunk_us - window_us)
        )
        .withColumn("__chunk", F.col("__chunk") + 1)
        .withColumn("__halo", F.lit(True))
    )
    both = main.unionByName(halo)
    if method == "prefix":
        n_col, s_col = _prefix_frame_aggs(
            both, [*keys, "__chunk"], "__us", value_col, window_us
        )
    else:
        w = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy("__us")
            .rangeBetween(-window_us, 0)
        )
        n_col, s_col = F.count(F.lit(1)).over(w), F.sum(value_col).over(w)
    if round_digits is not None:
        s_col = F.round(s_col, round_digits)
    # NULL-ts rows: the plain form's RANGE frame puts them in the key's
    # NULL peer group (count/sum over the key's NULL-ts rows).  They
    # all live in the NULL-chunk cell, so the peer group IS their
    # (keys, __chunk) partition.  The recompute engine's offset frame
    # collapses to exactly that peer group on NULL ordering values
    # (Spark RANGE-frame null-group semantics — the same rule the
    # plain form relies on), so it needs no gate.  The prefix engine's
    # DIFFERENCE of two offset frames reads 0 there (both prefixes see
    # the whole null group), so its NULL rows gate to aggregates over
    # the engine's own (unbounded, current-row) spec — byte-identical
    # to w_le inside _prefix_frame_aggs, so Catalyst merges them into
    # the one existing Window pass: no extra sort, exchange or window
    # node, and no re-scan of the input for a NULL re-attach union.
    if method == "prefix":
        w_le = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy(F.col("__us"))
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        null_total = F.sum(value_col).over(w_le)
        if round_digits is not None:
            null_total = F.round(null_total, round_digits)
        is_null_ts = F.col("__us").isNull()
        n_col = F.when(is_null_ts, F.count(F.lit(1)).over(w_le)).otherwise(n_col)
        s_col = F.when(is_null_ts, null_total).otherwise(s_col)
    return (
        both.withColumn(count_name, n_col.cast("long"))
        .withColumn(sum_name, s_col)
        .filter(~F.col("__halo"))
        .drop("__us", "__chunk", "__halo")
    )


def funnel_steps(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: per user, the earliest time each step can be
    completed given the previous step's completion time (strictly
    later).  Returns one row per user who completed step 1, with a
    ``t_<i>`` timestamp per completed step (NULL once the chain
    breaks) and ``n_steps`` = how deep the user got.

    The classic sequential-pattern query: step i is
    ``min(ts WHERE type = steps[i] AND ts > t_{i-1})``.  Every round
    joins and re-aggregates on the SAME user key, so the accumulating
    side keeps its hash partitioning; each step additionally ships only
    its own filtered event slice, never the whole table again.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        prev = f"t_{i - 1}"
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *[f"t_{j}" for j in range(i)])
            .agg(
                F.min(
                    F.when(F.col("__ts") > F.col(prev), F.col("__ts"))
                ).alias(f"t_{i}")
            )
        )
    depth = sum(
        F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0) for i in range(len(steps))
    )
    return cur.withColumn("n_steps", depth.cast("long"))


def funnel_counts(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel rollup: (step, step_name, n_users) — how many users
    reached each step in order.  ONE aggregation over
    :func:`funnel_steps` (``count(t_i)`` counts non-null step times),
    then the single counts row explodes to per-step rows — the whole
    funnel chain executes once, not once per step."""
    per_user = funnel_steps(events, ts_col, user_col, type_col, steps)
    counts = per_user.agg(
        *[F.count(F.col(f"t_{i}")).alias(f"c_{i}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"c_{i}").cast("long").alias("n_users"),
            )
            for i, name in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def retention_cohorts(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    max_offset_days: int | None = None,
) -> DataFrame:
    """Cohort retention grid: users are cohorted by the DAY of their
    first event; for each (cohort_day, day_offset) the count of
    cohort users active that day.

    One partial-agg groupBy (distinct activity days per user), a
    first-touch window over the user key on its day-grained output, and
    the collapse into the tiny (days × offsets) grid — ONE scan of the
    corpus, and the corpus-sized data is only ever hashed on user_id.
    (The former first-touch groupBy + join-back planned a second full
    scan and a broadcast; the window computes the same min over the
    distinct-days frame — min over distinct days IS min over all days —
    for one extra user-keyed exchange of the already-day-grained rows.)
    NULL users are filtered explicitly, matching the inner user-key
    join they used to fall out of.
    """
    day = F.date_trunc("day", F.col(ts_col))
    active = (
        events.filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), day.alias("active_day"))
        .distinct()
    )
    grid = (
        active.withColumn(
            "cohort_day", F.min("active_day").over(Window.partitionBy(user_col))
        )
        .withColumn("day_offset", F.datediff("active_day", "cohort_day").cast("long"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    if max_offset_days is not None:
        grid = grid.filter(F.col("day_offset") <= max_offset_days)
    return grid


def user_value_stats(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key SHIFTED first/second moments + count — the tiny "model"
    side of :func:`value_anomalies`, exposed separately so a STREAMING
    scorer can train it on history and join it stream-static (the same
    train-on-batch / score-on-stream split as llm/lm.py).

    Moments are computed about a per-key anchor (the key's minimum
    value) rather than about zero: the naive ``E[v²] − E[v]²`` form
    suffers catastrophic cancellation when |mean| ≫ std (byte counters,
    epoch-like values: mean ≈ 1e9, std ≈ 1 puts E[v²] ≈ 1e18 where a
    double's ULP is ~128 — the computed variance is rounding noise).
    Shifting by min(v) keeps the squared terms near the actual spread.
    Two passes on the SAME key (anchor, then moments) — both explicit
    arithmetic, so any engine reproduces the numbers bit-for-bit.

    Returns (key, __mean, __var, __n) with ``__mean = anchor + E[v−a]``
    and ``__var = E[(v−a)²] − E[v−a]²``.
    """
    # nanvl: a NaN reading behaves like a missing one — otherwise a
    # single NaN poisons both moments and (NaN > 0 in Spark's total
    # order) sails through the downstream variance gate, flagging the
    # key's ENTIRE history as anomalous
    v = F.nanvl(F.col(value_col).cast("double"), F.lit(None).cast("double"))
    anchor = events.groupBy(user_col).agg(F.min(v).alias("__a"))
    return (
        events.join(anchor, user_col)
        .groupBy(user_col)
        .agg(
            F.avg(v - F.col("__a")).alias("__m1"),
            F.avg((v - F.col("__a")) * (v - F.col("__a"))).alias("__m2s"),
            F.min(F.col("__a")).alias("__a"),
            # non-NULL count: the min_events robustness gate must see
            # the number of values the moments were computed FROM
            F.count(v).alias("__n"),
        )
        .select(
            user_col,
            (F.col("__a") + F.col("__m1")).alias("__mean"),
            (F.col("__m2s") - F.col("__m1") * F.col("__m1")).alias("__var"),
            "__n",
        )
    )


def score_value_anomalies(
    events: DataFrame,
    stats: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    min_events: int = 5,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Score ``events`` against a per-key moment table from
    :func:`user_value_stats`: emit rows where |z| ≥ ``z_threshold``
    (keys with fewer than ``min_events`` events or zero variance are
    skipped).  The SINGLE scoring path shared by the batch operator
    (:func:`value_anomalies`) and the streaming one
    (``streaming/ops.anomaly_stream``) — their row-for-row parity is a
    stated oracle contract, so the arithmetic lives in exactly one
    place.  Stateless: one equi-join on the key plus map-side
    filters, which is why the same code runs under Structured
    Streaming unchanged."""
    # nanvl: a NaN event value would give z = NaN, and NaN >= threshold
    # is TRUE in Spark's total order — the row must drop, not flag
    v = F.nanvl(F.col(value_col).cast("double"), F.lit(None).cast("double"))
    z = (v - F.col("__mean")) / F.sqrt(F.col("__var"))
    return (
        events.join(stats, user_col)
        .filter((F.col("__n") >= min_events) & (F.col("__var") > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select(
            id_col,
            user_col,
            v.alias(value_col),
            F.round("z", 6).alias("z"),
            F.col("__n").cast("long").alias("n_user_events"),
        )
    )


def value_anomalies(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    min_events: int = 5,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Per-key z-score outliers: events whose value deviates from the
    key's own mean by ≥ ``z_threshold`` population standard deviations
    — the telemetry-anomaly shape a curation pipeline runs over ingest
    metrics (bytes/doc, docs/shard, latency per source).  Exactly
    ``score_value_anomalies(events, user_value_stats(events))``; see
    those two for the cancellation-safe variance and the plan shape
    (key-partitioned groupBys + one join, partitioning reused, no
    unbounded state)."""
    stats = user_value_stats(events, user_col=user_col, value_col=value_col)
    return score_value_anomalies(
        events,
        stats,
        user_col=user_col,
        value_col=value_col,
        id_col=id_col,
        min_events=min_events,
        z_threshold=z_threshold,
    )
