"""Text-report scan (SURVEY.md §2.1 S7): the reference's PRT FIP-report
extraction (/root/reference/src/res2df/fipreports.py:100-191) is a regex
state machine over a report file — a block-start line opens a context
(region number, date) that applies to the data lines under it.

Relational reconstruction over ``spark.read.text``:

1. global line numbers via the DISTRIBUTED two-pass form: a local rank
   inside each (file, split) partition plus broadcast per-split offsets
   — never a single-partition global sort;
2. block-start lines matched with ``regexp_extract``;
3. block context forward-filled with the same two-pass scan shape:
   within-split ffill + the carry from preceding splits broadcast back;
4. data rows parsed field-by-field with regex groups.

PRT files can be GBs on long runs — every step is distributed and
codegen'd; nothing drops to the RDD layer, and no window ever moves the
whole file into one task (the only single-partition work is over the
split-level summary table, whose size is the number of file splits).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def numbered_lines(
    spark: SparkSession, path: str, keep_splits: bool = True
) -> DataFrame:
    """(line_no, line) with a GLOBAL, order-preserving line number —
    unique across every matched file (files ordered by path, splits by
    byte offset), built distributively: a local rank inside each
    (file, split) window plus broadcast running offsets from the split
    summary table (one row per split — the ONLY single-partition window
    runs over that tiny table, never the data).  ``spark.read.text``
    assigns a line spanning a split boundary to the earlier split, so
    per-split counts partition each file exactly.

    ``keep_splits=True`` (the default) additionally returns the
    ``__fp``/``__blk`` columns — :func:`parse_report_blocks` dispatches
    on them to run its forward fill as the same two-pass distributed
    scan, partitioned so block context never crosses a file boundary.
    Pass ``keep_splits=False`` only for single-file input where the
    bare 2-column frame is wanted: without the file column the
    downstream forward fill must fall back to one global serial window,
    which would leak context across files in a multi-file glob."""
    df = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.file_block_start").alias("__blk"),
        F.monotonically_increasing_id().alias("__mid"),
        "value",
    )
    counts = df.groupBy("__fp", "__blk").agg(F.count(F.lit(1)).alias("__cnt"))
    # cumulative offsets across ALL files (path order) — a global window,
    # but over the split-count table, whose size is the split count
    w_off = Window.orderBy("__fp", "__blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__fp",
        "__blk",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_loc = Window.partitionBy("__fp", "__blk").orderBy("__mid")
    out = df.join(F.broadcast(offsets), ["__fp", "__blk"]).select(
        "__fp",
        "__blk",
        (F.row_number().over(w_loc) - 1 + F.col("__off"))
        .cast("long")
        .alias("line_no"),
        F.col("value").alias("line"),
    )
    return out if keep_splits else out.select("line_no", "line")


def parse_report_blocks(
    lines: DataFrame,
    start_pattern: str,
    context_fields: Mapping[str, int],
    row_pattern: str,
    row_fields: Mapping[str, int],
) -> DataFrame:
    """Extract data rows grouped under block-start lines.

    ``start_pattern`` — regex marking a block start; ``context_fields``
    maps context column → regex group index (extracted from the start
    line, forward-filled onto following rows).  ``row_pattern`` /
    ``row_fields`` parse the data lines.  Returns one row per data line
    with block context attached.

    The forward fill is the two-pass distributed scan when the input
    still carries its (file, split) columns (output of
    ``numbered_lines(..., keep_splits=True)``): within-split ffill +
    per-split carry, broadcast back — no single-partition window over
    the data.  Context never crosses a file boundary (the carry window
    partitions by file).  A bare (line_no, line) input falls back to
    the global-window form — correct only for SINGLE-file input (with
    no file column the serial window cannot stop context at a file
    boundary), and serial."""
    ctx = with_block_context(lines, start_pattern, context_fields)
    rows = ctx.filter(F.col("line").rlike(row_pattern)).select(
        "line_no",
        *context_fields.keys(),
        *[
            F.regexp_extract("line", row_pattern, g).alias(name)
            for name, g in row_fields.items()
        ],
    )
    return rows


def with_block_context(
    lines: DataFrame,
    start_pattern: str,
    context_fields: Mapping[str, int],
    line_no_as: str | None = None,
) -> DataFrame:
    """Forward-fill block context (regex groups from ``start_pattern``
    lines) onto every following line — the reusable half of
    :func:`parse_report_blocks`, for parsers whose data rows need more
    than a single regex (e.g. positional column splitting).

    ``line_no_as`` additionally forward-fills the start line's global
    ``line_no`` under that column name — consumers stacking several
    context families (e.g. two date formats) can then resolve which
    family appeared LAST before a given row.  Consumers that need
    SEVERAL families should call :func:`with_block_contexts` once
    instead of stacking this call: the multi-family form shares one
    window pass, one per-split aggregate and one carry join across all
    families (stacked calls interleave aggregates, so Catalyst cannot
    collapse their identical window specs — measured 3 full sorts of a
    multi-GB PRT for fipreports' 3 families)."""
    return with_block_contexts(
        lines, [(start_pattern, context_fields, line_no_as)]
    )


def with_block_contexts(
    lines: DataFrame,
    families: list[tuple[str, Mapping[str, int], str | None]],
) -> DataFrame:
    """Forward-fill SEVERAL context families in one distributed pass:
    each family is (start_pattern, {column: regex group}, line_no_as or
    None).  All families share the same two-pass scan — one
    within-split window (Catalyst fuses same-spec window functions into
    one physical Window/sort), one split-summary aggregate, one
    broadcast carry join — so adding a family costs expression work,
    never another sort of the data."""
    has_splits = "__fp" in lines.columns and "__blk" in lines.columns
    part = ["__fp", "__blk"] if has_splits else []
    context_fields: dict[str, int] = {}
    start_values: dict = {}
    for start_pattern, fields, line_no_as in families:
        is_start = F.col("line").rlike(start_pattern)
        for name, g in fields.items():
            if name in start_values:
                raise ValueError(f"duplicate context column {name!r}")
            context_fields[name] = g
            start_values[name] = F.when(
                is_start, F.regexp_extract("line", start_pattern, g)
            )
        if line_no_as is not None:
            if line_no_as in start_values:
                raise ValueError(f"duplicate context column {line_no_as!r}")
            start_values[line_no_as] = F.when(is_start, F.col("line_no"))
            context_fields[line_no_as] = -1  # ffilled like the rest below
    # preserve EVERY input column (stacked with_block_context calls add
    # one context family at a time)
    ctx = lines.select(
        *lines.columns,
        *[v.alias(f"__ctx_{name}") for name, v in start_values.items()],
    )
    if has_splits:
        w_in = (
            Window.partitionBy(*part)
            .orderBy("line_no")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # pass 1: ffill within each split
        for name in context_fields:
            ctx = ctx.withColumn(
                f"__in_{name}",
                F.last(F.col(f"__ctx_{name}"), ignorenulls=True).over(w_in),
            )
        # pass 2: each split's LAST context value, forward-filled across
        # splits (tiny table: one row per split) and broadcast back as
        # the carry for rows before the split's first context line
        lasts = ctx.groupBy(*part).agg(
            *[
                F.max_by(F.col(f"__in_{name}"), F.col("line_no")).alias(f"__last_{name}")
                for name in context_fields
            ]
        )
        w_carry = (
            Window.partitionBy("__fp")
            .orderBy("__blk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = lasts.select(
            *part,
            *[
                F.last(F.col(f"__last_{name}"), ignorenulls=True)
                .over(w_carry)
                .alias(f"__carry_{name}")
                for name in context_fields
            ],
        )
        ctx = ctx.join(F.broadcast(carries), part)
        for name in context_fields:
            ctx = ctx.withColumn(
                name, F.coalesce(F.col(f"__in_{name}"), F.col(f"__carry_{name}"))
            )
    else:
        w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
        for name in context_fields:
            ctx = ctx.withColumn(
                name, F.last(F.col(f"__ctx_{name}"), ignorenulls=True).over(w)
            )
    drop = [c for c in ctx.columns if c.startswith("__ctx_") or c.startswith("__in_") or c.startswith("__carry_")]
    return ctx.drop(*drop)
