"""As-of (point-in-time) join, the J9/J10 family of SURVEY.md §2.4.

The reference implements point-in-time lookups as per-action pandas
filters (``date <= action_date`` then keep-last —
/root/reference/src/res2df/compdat.py:326-345,791-924).  A naive Spark
translation is a non-equi join (range join → broadcast nested loop) that
explodes at scale.  The scalable construction used here is the
**union-window** as-of join:

    1. tag left rows (queries) and right rows (observations),
    2. union them on aligned schemas,
    3. one window per key, ordered by (time, right-before-left tiebreak),
       forward-fills the observation payload,
    4. keep the left rows.

Cost: ONE shuffle on the join keys (same as any equi-join), no row
explosion, no range-join blowup — this is the standard trick used by
large-scale timeseries stores.  Skewed keys are handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str] | None = None,
    tolerance_expr: str | None = None,
    suffix: str = "",
    strict: bool = False,
    skew_safe: bool = True,
    chunk_seconds: int | None = None,
    target_chunks: int | None = None,
    span_hint: tuple[int, int] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_time <= left_time`` (``<`` if ``strict``) and equal keys.

    ``direction`` — the full ``pandas.merge_asof`` family (round 8):

    * ``"backward"`` (default) — latest observation at-or-before the
      left time; duplicate observations at the matched time resolve to
      the one whose (time, *value_cols) payload struct sorts LAST.
    * ``"forward"`` — earliest observation at-or-after (strictly-after
      if ``strict``) the left time; equal-time duplicates resolve to
      the payload struct sorting FIRST (the mirror tiebreak — pandas
      keeps the first positional duplicate going forward, the last
      going backward).
    * ``"nearest"`` — whichever of the two is closer in time;
      equidistant candidates resolve BACKWARD (pandas semantics).
      ``tolerance_expr`` bounds each side's gap independently, so a
      left row whose backward match is too old can still take a
      forward match within the bound.

    ``strict`` (pandas ``allow_exact_matches=False``) excludes
    equal-time observations in every direction.

    ``value_cols`` — right columns to carry (default: all non-key,
    non-time columns).  Ties on ``right_time`` resolve to the right row
    that sorts last under the right DataFrame's remaining columns
    (deterministic given unique (keys, time) on the right; pass a
    pre-deduped right otherwise).

    ``tolerance_expr`` — optional SQL expression bounding the match gap,
    like ``pandas.merge_asof(tolerance=...)``: the matched observation is
    kept only when ``left_time - matched_right_time <= tolerance``.  Use
    ``"INTERVAL '30' DAY"`` for timestamp axes or a plain numeric literal
    for numeric axes.  Left rows whose nearest observation is too old
    keep their row but get NULL payload (pandas semantics).

    Matching is row-wise, exactly as ``merge_asof``: the latest visible
    right row is taken whole — a NULL field in it stays NULL rather than
    falling back to an older observation.  Right rows with a NULL
    ``right_time`` are EXCLUDED (``merge_asof`` raises on NaT keys; a
    timeless observation cannot be "as of" anything).

    SKEW-SAFE BY DEFAULT (round 8, same policy as ``rolling_agg`` /
    ``dedup_keep``): the union-window form sorts a key's whole merged
    timeline in ONE task, and the 32M-row hot-key battery measured a
    50%-hot key at 3.8× the uniform runtime and RISING with data size
    (0.85× at 400k, 1.79× at 8M — the per-task sort of the payload
    structs is the straggler).  So on a timestamp/date axis this
    delegates to :func:`asof_join_chunked` (identical matches —
    oracle-verified hash-identical, no float reordering anywhere) with
    ``chunk_seconds`` derived from the LEFT timeline span, which costs
    one eager min/max scan at plan-build time — pass ``chunk_seconds``
    or ``span_hint`` to skip it (streaming/lazy callers), or
    ``skew_safe=False`` to pin the single-window form (no extra scan,
    one exchange — the cheaper plan for known-uniform keys; its
    UNIFORM-corpus runtime measured ~1.9× below the chunked form's at
    32M, so the opt-out is a real lever, not a legacy).  NUMERIC axes
    always use the single-window form (the chunk grid needs a
    timestamp), as do frames with no non-NULL left timestamps.

    (``sessionize`` deliberately keeps the opposite default: its plain
    window is a lag/running-sum streaming pass whose hot-key penalty
    measured only 1.8-2.6× across 400k/8M/32M fixtures while its
    chunked twin's three extra exchanges cost ~2× uniform runtime —
    there the straggler never beats the decomposition overhead at any
    measured size; see ``sessionize_chunked`` for the opt-in.)
    """
    on = list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if not skew_safe and (
        chunk_seconds is not None or target_chunks is not None or span_hint is not None
    ):
        raise ValueError(
            "chunk_seconds/target_chunks/span_hint request the chunked "
            "decomposition but skew_safe=False pins the single-window form "
            "- drop one side of the conflict"
        )
    if skew_safe:
        lt_type = left.schema[left_time].dataType.typeName()
        if lt_type in ("timestamp", "timestamp_ntz", "date"):
            return asof_join_chunked(
                left, right, on, left_time, right_time,
                value_cols=value_cols, tolerance_expr=tolerance_expr,
                suffix=suffix, strict=strict, chunk_seconds=chunk_seconds,
                target_chunks=target_chunks, span_hint=span_hint,
                direction=direction,
            )
        if (
            chunk_seconds is not None
            or target_chunks is not None
            or span_hint is not None
        ):
            # the chunk grid needs a timestamp axis; silently running
            # the single-window form would drop the caller's explicit
            # skew treatment with no signal (the skew_safe=False
            # conflict above raises for the same reason)
            raise ValueError(
                "chunk_seconds/target_chunks/span_hint request the chunked "
                f"decomposition but the time axis is {lt_type} - the chunk "
                "grid needs a timestamp/date axis, so only the "
                "single-window form can run here; drop the chunk "
                "parameters (or convert the axis)"
            )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_time]
    value_cols = list(value_cols)
    clash = [c for c in value_cols if (c + suffix) in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output columns {clash} collide with left columns; "
            "pass a non-empty suffix (pandas.merge_asof suffixes overlaps "
            "automatically — here the collision would silently produce a "
            "duplicate column name)"
        )

    lt = F.col("__t")
    # Align schemas: left rows carry NULL payload; right rows carry NULL
    # for left-only columns.
    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.filter(
        # a NULL observation time has no place on the as-of axis: it
        # would sort FIRST (ASC NULLS FIRST) with a non-null payload
        # struct and become a phantom match for every left row before
        # the first real observation.  pandas merge_asof REJECTS NaT
        # keys; excluding the rows is the streaming-friendly equivalent
        # (same gate as resample.py / interpolate.py).
        F.col(right_time).isNotNull()
    ).select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Row-wise fill (merge_asof semantics): the matched observation is
    # the latest visible right ROW — its values are taken as-is, NULL
    # fields included, never skipped past to an older row the way
    # per-column ffill would.  One struct column, one window pass.
    payload = F.when(
        F.col("__is_left") == 0,
        F.struct(
            lt.alias("__rt"),
            *[F.col(f"__v_{c}").alias(f"v_{c}") for c in value_cols],
        ),
    )
    # Ordering at equal time decides VISIBILITY of equal-time
    # observations.  Backward fills from a preceding frame, so a right
    # row is visible iff it sorts BEFORE the left row (non-strict);
    # forward fills from a following frame, so visibility flips: the
    # right row must sort AFTER the left row (non-strict).  The payload
    # struct is the FINAL sort key, making the documented tiebreak
    # real: duplicate right rows at equal (keys, right_time) resolve by
    # the right row's remaining columns (LAST under backward's
    # last()-fill, FIRST under forward's first()-fill), not by
    # partition layout.
    def _order(right_first_at_tie: bool):
        tie = (
            F.col("__is_left").asc()
            if right_first_at_tie
            else F.col("__is_left").desc()
        )
        return [lt.asc(), tie, payload.asc_nulls_first()]

    # (strict mode needs no post-fill fixup in either direction: the
    # tie ordering alone puts equal-time observations outside the
    # frame.)
    def _fill(dir_):
        if dir_ == "backward":
            w = (
                Window.partitionBy(*on)
                .orderBy(*_order(not strict))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            return F.last(payload, ignorenulls=True).over(w)
        w = (
            Window.partitionBy(*on)
            .orderBy(*_order(strict))
            .rowsBetween(0, Window.unboundedFollowing)
        )
        # a NULL left time sorts NULLS FIRST, so its FOLLOWING frame
        # would contain every observation — gate it to the backward
        # form's semantics (timeless rows get NULL payload)
        return F.when(lt.isNotNull(), F.first(payload, ignorenulls=True).over(w))

    if direction == "nearest":
        filled = unioned.withColumn("__mb", _fill("backward")).withColumn(
            "__mf", _fill("forward")
        )
        out = filled.filter(F.col("__is_left") == 1)
        b_gap = F.col("__t") - F.col("__mb.__rt")
        f_gap = F.col("__mf.__rt") - F.col("__t")
        b_ok = F.col("__mb").isNotNull()
        f_ok = F.col("__mf").isNotNull()
        if tolerance_expr is not None:
            tol = F.expr(tolerance_expr)
            b_ok = b_ok & (b_gap <= tol)
            f_ok = f_ok & (f_gap <= tol)
        # equidistant candidates resolve backward (pandas nearest);
        # interval/numeric subtraction is exact (µs-integer intervals on
        # time axes), so the tie test cannot wobble
        pick_b = b_ok & (~f_ok | (b_gap <= f_gap))
        out = out.withColumn(
            "__m", F.when(pick_b, F.col("__mb")).when(f_ok, F.col("__mf"))
        )
        matched = F.col("__m").isNotNull()
    else:
        filled = unioned.withColumn("__m", _fill(direction))
        out = filled.filter(F.col("__is_left") == 1)
        matched = F.col("__m").isNotNull()
        if tolerance_expr is not None:
            # merge_asof(tolerance=...): a match farther than the bound
            # is dropped (payload → NULL), the left row itself is kept.
            gap = (
                F.col("__t") - F.col("__m.__rt")
                if direction == "backward"
                else F.col("__m.__rt") - F.col("__t")
            )
            matched = matched & (gap <= F.expr(tolerance_expr))
    for c in value_cols:
        out = out.withColumn(f"__v_{c}", F.when(matched, F.col(f"__m.v_{c}")))
    renames = {f"__v_{c}": (c + suffix) for c in value_cols}
    out = out.select(
        *on,
        F.col("__t").alias(left_time),
        *[F.col(c) for c in left_cols if c not in on and c != left_time],
        *[F.col(src).alias(dst) for src, dst in renames.items()],
    )
    return out


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str] | None = None,
    tolerance_expr: str | None = None,
    suffix: str = "",
    strict: bool = False,
    chunk_seconds: int | None = None,
    target_chunks: int | None = None,
    span_hint: tuple[int, int] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Skew-safe :func:`asof_join`: identical point-in-time semantics,
    partitioned on (keys, time-chunk) instead of the keys alone, so a
    hot join key (one well/user owning half the rows) spreads over
    timeline/chunk tasks instead of becoming one straggler sort.

    Unlike the rolling window, an as-of lookback is UNBOUNDED — a left
    row at a chunk start may match an observation arbitrarily far back
    — so a fixed-width halo cannot work.  Instead the carry is computed
    at CHUNK GRAIN: per (keys, chunk) the latest observation (same
    time-then-payload tiebreak as the window form), forward-filled
    across each key's chunk sequence (a window over #chunks rows per
    key — thousands, never billions), and injected into each chunk as
    ONE synthetic observation row carrying its TRUE time.  Carried
    observations are strictly older than the chunk start, so they can
    never tie an in-chunk row, ``strict`` needs no special case, and
    ``tolerance_expr`` sees the real observation age.  Per left row the
    visible candidate set is exactly the window form's: in-chunk
    observations at-or-before (or strictly-before) it, plus the one
    pre-chunk observation that could win.

    ``chunk_seconds`` defaults to the timeline-span derivation of
    :func:`~res2df_spark.operators.timechunk.derive_chunk_seconds`
    over the LEFT time column — NOTE that runs one EAGER min/max Spark
    job at plan-construction time (re-executes the left lineage; fails
    on streaming inputs): pass ``chunk_seconds`` explicitly, or share
    one :func:`~res2df_spark.operators.timechunk.timeline_span` result
    via ``span_hint`` when composing several skew-safe operators over
    the same frame.  The time axis must be a timestamp type (the plain
    :func:`asof_join` also supports numeric axes).  Left rows with a
    NULL time keep their row with NULL payload, exactly like the plain
    form.  NULL join KEYS are one group, exactly like the plain form's
    window partitioning — the carry grid joins null-safe.

    ``direction`` mirrors the plain form.  ``"forward"`` carries the
    EARLIEST observation per (keys, chunk) BACKWARD across the chunk
    sequence (the exact mirror of the backward carry); ``"nearest"``
    injects both carries, so per left row the candidate set is the
    in-chunk observations plus the one pre-chunk and one post-chunk
    observation that could win — exactly the candidates the plain
    nearest evaluates.

    SCALING (round-9 diagnosis of SCALEPROBE_r08's 8.39× second-decade
    reading): every piece of the decomposition is linear in the data —
    the carry grid is ``#distinct(keys) × #chunks`` with ``#chunks``
    bounded (fixed ``chunk_seconds`` over a fixed span, or
    ``target_chunks ≈ 8×parallelism`` when derived), the grid window
    sorts ``#chunks`` rows per key, and the final union-window
    partitions on (keys, chunk) whose group count grows with keys.
    Quiet-host re-measurement at the same probe shapes (1M→3M events,
    30-day span, 5 chunks @7d): fixed-chunk 1.65s→1.30s and
    derived-default 1.56s→1.58s at 3× data — ~1.0×, sub-linear with
    warm-up amortized.  The r08 artifact's 8.39× was ~30s of sustained
    host contention (all best-of-3 repeats slow); the probe now records
    per-repeat times and auto-rechecks ratios >3× so contention cannot
    masquerade as an engine defect again (tools/scale_probe.py).
    """
    on = list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    lt_type = left.schema[left_time].dataType.typeName()
    if lt_type not in ("timestamp", "timestamp_ntz", "date"):
        raise ValueError(
            f"asof_join_chunked needs a timestamp/date axis, got {lt_type}; "
            "use asof_join for numeric axes"
        )
    if chunk_seconds is None:
        from res2df_spark.operators.timechunk import derive_chunk_seconds

        chunk_seconds = derive_chunk_seconds(
            left, left_time, 1, target_chunks, span_hint=span_hint
        )
    if chunk_seconds is None:
        # no real left timestamps: every left row gets NULL payload and
        # the plain form handles that shape in one cheap pass
        # (skew_safe=False or asof_join would delegate right back here)
        return asof_join(
            left, right, on, left_time, right_time,
            value_cols=value_cols, tolerance_expr=tolerance_expr,
            suffix=suffix, strict=strict, skew_safe=False,
            direction=direction,
        )
    chunk_us = int(chunk_seconds) * 1_000_000

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_time]
    value_cols = list(value_cols)

    def chunk_of(col):
        us = F.unix_micros(F.col(col).cast("timestamp"))
        return ((us - F.pmod(us, F.lit(chunk_us))) / F.lit(chunk_us)).cast("long")

    # --- chunk-grain carry: the boundary observation per (keys, chunk),
    # filled across the key's chunk sequence.  Backward carries the
    # LATEST observation forward; forward carries the EARLIEST backward;
    # nearest needs both ------------------------------------------------
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    r_real = right.filter(F.col(right_time).isNotNull())
    # the same time-then-payload tiebreak as the window form: at equal
    # times the payload struct sorting LAST wins going backward, the
    # one sorting FIRST going forward — max/min of the same struct
    obs_struct = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(f"v_{c}") for c in value_cols],
    )
    aggs = []
    if need_b:
        aggs.append(F.max(obs_struct).alias("__obs_b"))
    if need_f:
        aggs.append(F.min(obs_struct).alias("__obs_f"))
    obs_last = (
        r_real.withColumn("__chunk", chunk_of(right_time))
        .groupBy(*on, "__chunk")
        .agg(*aggs)
    )
    l_real = left.filter(F.col(left_time).isNotNull())
    left_chunks = (
        l_real.withColumn("__chunk", chunk_of(left_time))
        .select(*on, "__chunk")
        .distinct()
    )
    # NULL join keys are real groups to the window form (partitionBy
    # groups NULLs like groupBy), so the carry grid MUST join null-safe
    # — a plain equi-join never matches NULL keys and would silently
    # drop cross-chunk matches for NULL-key rows.  eqNullSafe (<=>) is
    # still equi-join-extractable, so the plan stays a hash join.
    # One full-outer join replaces the former full+left+left_semi trio:
    # __has_left records whether the (keys, chunk) cell holds left rows
    # (obs-only chunks would synthesize carry rows no one reads).
    lc, ob = left_chunks.alias("__lc"), obs_last.alias("__ob")
    cond = F.col("__lc.__chunk") == F.col("__ob.__chunk")
    for k in on:
        cond = cond & F.col(f"__lc.{k}").eqNullSafe(F.col(f"__ob.{k}"))
    grid = lc.join(ob, cond, "full").select(
        # matched rows have null-safely EQUAL keys (coalesce is only
        # deciding which side is populated, never mixing values)
        *[F.coalesce(F.col(f"__lc.{k}"), F.col(f"__ob.{k}")).alias(k) for k in on],
        F.coalesce(F.col("__lc.__chunk"), F.col("__ob.__chunk")).alias("__chunk"),
        *(["__obs_b"] if need_b else []),
        *(["__obs_f"] if need_f else []),
        F.col("__lc.__chunk").isNotNull().alias("__has_left"),
    )

    def _carry_rows(obs_col: str, frame) -> DataFrame:
        w = Window.partitionBy(*on).orderBy("__chunk").rowsBetween(*frame)
        fill = (
            F.last(obs_col, ignorenulls=True)
            if frame[1] == -1
            else F.first(obs_col, ignorenulls=True)
        )
        return (
            grid.withColumn("__carry", fill.over(w))
            .filter(F.col("__carry").isNotNull() & F.col("__has_left"))
            .select(
                *on,
                "__chunk",
                F.col("__carry.__rt").alias(right_time),
                *[F.col(f"__carry.v_{c}").alias(c) for c in value_cols],
            )
        )

    # both carry windows share the grid's (keys, chunk-asc) sort — two
    # frames over one exchange+sort when nearest needs both
    parts = []
    if need_b:
        parts.append(_carry_rows("__obs_b", (Window.unboundedPreceding, -1)))
    if need_f:
        parts.append(_carry_rows("__obs_f", (1, Window.unboundedFollowing)))
    carries = parts[0]
    for p in parts[1:]:
        carries = carries.unionByName(p)

    # --- the plain union-window construction, with (keys, chunk) as the
    # partition key and the carries unioned in as observations
    # (skew_safe=False: the chunked grain IS the skew treatment here —
    # delegating again would recurse).  NULL-time left rows ride this
    # same pass with a NULL chunk: their (keys, NULL) partition holds no
    # observation (r_real excludes NULL times; carries come from
    # l_real's non-NULL cells) and the window form independently
    # guarantees them NULL payload in every direction (NULL __t sorts
    # first, so the backward frame is empty and the forward fill is
    # gated on a non-NULL time) — a separate filter-scan + union of the
    # left table just to re-attach them was a third full left pass.
    return asof_join(
        left.withColumn("__chunk", chunk_of(left_time)),
        r_real.select(*on, right_time, *value_cols)
        .withColumn("__chunk", chunk_of(right_time))
        .unionByName(carries),
        [*on, "__chunk"],
        left_time,
        right_time,
        value_cols=value_cols,
        tolerance_expr=tolerance_expr,
        suffix=suffix,
        strict=strict,
        skew_safe=False,
        direction=direction,
    ).drop("__chunk")
