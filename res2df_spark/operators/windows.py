"""Order-dependent operators (SURVEY.md §2.6), reconstructed as Spark
window functions.

The reference implements these as stateful pandas scans that depend on
row order; Spark has no row order, so every operator here takes explicit
ordering columns.  All of them compile to a single window exchange
(hash-partition by the partition keys) — at 100 TB the partition keys
(well, user, connection) are high-cardinality so the shuffle is balanced,
and AQE splits any skewed key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _window(partition_by: Sequence[str | Column], order_by: Sequence[str | Column]):
    if partition_by:
        return Window.partitionBy(*partition_by).orderBy(*order_by)
    return Window.partitionBy().orderBy(*order_by)


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Forward-fill: propagate the last non-null value of each column over
    an explicit ordering.

    Reconstruction of the reference's date-cursor state machine (W1:
    /root/reference/src/res2df/compdat.py:99-114, wcon.py:36-50) and RFT
    record grouping (W4: rft.py:86-94): flatten to rows carrying a
    monotone index, then ``last(col, ignorenulls=True)`` over
    ``ROWS UNBOUNDED PRECEDING``.
    """
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    out_names = list(out_names or cols)
    if len(out_names) != len(cols):
        # zip would silently truncate, skipping fills with no error
        raise ValueError(
            f"out_names ({len(out_names)}) must match cols ({len(cols)})"
        )
    for col, out in zip(cols, out_names):
        df = df.withColumn(out, F.last(F.col(col), ignorenulls=True).over(w))
    return df


def dedup_keep(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: str = "last",
    skew_safe: bool = True,
) -> DataFrame:
    """Keep-first/keep-last deduplication over explicit ordering.

    pandas ``drop_duplicates(subset, keep="last")`` after a stable sort
    (A5: /root/reference/src/res2df/compdat.py:917-922, gruptree.py:181,
    wellcompletiondata.py:207).

    SKEW-SAFE BY DEFAULT (round 7, same policy as ``rolling_agg``): by
    default this delegates to :func:`dedup_keep_agg` — one
    partial-aggregatable ``max_by``/``min_by``, so a hot key collapses
    map-side to one candidate per task (and an EMPTY ``keys`` becomes a
    global aggregate rather than a single-partition window).  The two
    forms pick the same winner row for row (both use Spark's total
    order on the ordering columns; ties are arbitrary in both — pass a
    unique tie-breaker, the engine-wide convention).

    ``skew_safe=False`` keeps the ``row_number() OVER (PARTITION BY
    keys ORDER BY ord DESC) = 1`` window form — use it when the dedup
    shares its sort/exchange with adjacent per-row window computations
    (the one case where the window plan is cheaper).

    A DataFrame with DUPLICATE column names (a join that kept both
    sides of a key — compared case-insensitively, matching Spark's
    default resolution) routes to the window form automatically: the
    agg form must rebuild the payload struct by column NAME, which is
    ambiguous there, while ``row_number`` + filter never names payload
    columns.  Two agg-form caveats for qualifier-sensitive callers:
    the rebuilt columns lose their alias QUALIFIERS (a downstream
    ``select("c.WELL")`` against the output will not resolve — select
    unqualified names, or pass ``skew_safe=False``), and every output
    column is nullable (struct ``getField`` erases non-null flags).
    """
    names = [c.lower() for c in df.columns]
    if skew_safe and len(set(names)) == len(names):
        return dedup_keep_agg(df, keys, order_by, keep=keep)
    ordering = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if keep == "last":
        ordering = [c.desc() for c in ordering]
    elif keep != "first":
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    w = _window(keys, ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: str = "last",
) -> DataFrame:
    """Skew-immune keep-first/keep-last dedup: the same contract as
    :func:`dedup_keep`, expressed as one ``max_by``/``min_by``
    aggregate instead of a ``row_number`` window.

    Why it exists: a window over ``PARTITION BY keys`` puts a key's
    ENTIRE row set in one task — a hot key owning half the corpus makes
    that task the job, and AQE's skew-join splitting cannot split a
    window partition.  An aggregate is partial-aggregatable: every map
    task reduces its slice of the hot key to ONE candidate row before
    the exchange, so the reducer sees one row per (key, map task)
    regardless of skew.  Use this variant when the key distribution is
    unknown or skewed and only the surviving row is needed; use
    ``dedup_keep`` when the window is fused with other per-row window
    computations anyway.

    Ties on ``order_by`` pick an arbitrary winner (same as the window
    form, where partition order decides) — pass a unique tie-breaker
    (the engine-wide convention) for determinism.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    ordering = F.struct(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    payload = F.struct(*[F.col(c) for c in df.columns])
    pick = F.max_by(payload, ordering) if keep == "last" else F.min_by(
        payload, ordering
    )
    agged = df.groupBy(*[F.col(k) for k in keys]).agg(pick.alias("__row"))
    if not keys:
        # a GLOBAL aggregate over zero rows still emits one row with a
        # NULL aggregate; the window form (and dedup on any non-empty
        # key list) returns zero rows there — drop the phantom.  The
        # payload struct is never NULL for a real row, so the filter
        # only fires on the empty-input case.
        agged = agged.filter(F.col("__row").isNotNull())
    return agged.select(*[F.col("__row").getField(c).alias(c) for c in df.columns])


def snapshot_latest(
    log: DataFrame,
    grid: DataFrame,
    keys: Sequence[str],
    snap_col: str,
    time_col: str,
    order_by: Sequence[str],
    payload_cols: Sequence[str],
    carry_cols: Sequence[str] = (),
    payload_prefix: str = "",
) -> DataFrame:
    """W7 snapshotting: for every ``grid`` row (snapshot date × key),
    the latest WHOLE ``log`` record with ``time_col <= snap_col`` and
    equal keys — the "emit the entire current tree at every change
    date" semantics of the reference's gruptree accumulator
    (/root/reference/src/res2df/gruptree.py:94-287).

    Construction is the union-window as-of join (operators/asof.py), but
    the payload travels as ONE struct so a record whose fields are
    legitimately NULL is carried whole — per-column ffill would stitch
    fields from different records.  Cost: one shuffle on ``keys``; no
    inequality join, no grid×log blowup — scale-safe where a
    snapshot-grid range join is quadratic.

    Grid rows with no record as of their date keep NULL payload fields
    (filter on any mandatory payload field for inner semantics).

    ``carry_cols`` — extra ``grid`` columns carried through to the
    output unchanged, letting an already-shaped frame act as its own
    marker set (the "attach latest node data onto every tree row"
    merge) without a grid-distinct + join-back round trip.
    """
    keys = list(keys)
    carry_cols = list(carry_cols)
    fields = list(dict.fromkeys([*order_by, *payload_cols]))
    payload = F.struct(*[F.col(c) for c in fields])
    l_ = log.select(
        *keys, F.col(time_col).alias("__t"), F.lit(0).alias("__m"),
        payload.alias("__p"),
        *[F.lit(None).cast(grid.schema[c].dataType).alias(c) for c in carry_cols],
    )
    ptype = l_.schema["__p"].dataType
    m_ = grid.select(
        *keys, F.col(snap_col).alias("__t"), F.lit(1).alias("__m"),
        F.lit(None).cast(ptype).alias("__p"),
        *carry_cols,
    )
    # log rows sort before the marker at equal time (inclusive as-of);
    # equal-time log records resolve by deck order inside the struct?
    # no — by explicit order_by columns in the sort, so last() sees the
    # latest record directly under the frame.
    u = l_.unionByName(m_)
    w = (
        _window(keys, ["__t", "__m", *[F.col("__p").getField(c) for c in order_by]])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__latest", F.last("__p", ignorenulls=True).over(w))
    return filled.filter(F.col("__m") == 1).select(
        *keys,
        F.col("__t").alias(snap_col),
        *carry_cols,
        *[F.col("__latest").getField(c).alias(payload_prefix + c)
          for c in payload_cols],
    )


def repair_duplicate_timestamps(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    tiebreak: Sequence[str | Column],
    unit: str = "SECOND",
    out_col: str | None = None,
) -> DataFrame:
    """Separate duplicated timestamps by adding ``(k-1)`` units to the
    k-th duplicate (W5: /root/reference/src/res2df/summary.py:435-483,
    which adds TIMESTEP to duplicated DATE index entries).

    Single-pass like the reference: a repaired timestamp CAN collide
    with a distinct later observation one unit ahead (two rows at
    10:00:00 plus one at 10:00:01 → two rows at 10:00:01) — the same
    contract as the reference's index repair, which also never
    re-checks.  Callers needing global uniqueness should repair with a
    unit finer than their minimum observation spacing."""
    w = _window([*partition_by, ts_col], tiebreak)
    rn = F.row_number().over(w)
    out_col = out_col or ts_col
    return df.withColumn(out_col, F.timestamp_add(unit, rn - F.lit(1), F.col(ts_col)))


def status_changes(
    df: DataFrame,
    state_col: str | Column,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str],
) -> DataFrame:
    """Emit only the rows where ``state_col`` differs from its previous
    value within the partition (first row always emitted).

    Reconstruction of W3 (/root/reference/src/res2df/wellconnstatus.py:34-86):
    per-connection CPI series → status events at sign changes; the lag
    comparison is `lag() OVER` + filter, one window exchange.
    """
    w = _window(partition_by, order_by)
    state = F.col(state_col) if isinstance(state_col, str) else state_col
    # NULL-safe: `state != prev` is NULL (filtered out) when either side
    # is NULL, losing transitions TO a NULL state; and prev.isNull()
    # conflates "first row" with "previous state was NULL" — the
    # explicit row_number marker plus eqNullSafe handles both
    return (
        df.withColumn("__prev", F.lag(state).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | ~state.eqNullSafe(F.col("__prev")))
        .drop("__prev", "__rn")
    )
