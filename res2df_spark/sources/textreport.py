"""Text-report scan (SURVEY.md §2.1 S7): the reference's PRT FIP-report
extraction (/root/reference/src/res2df/fipreports.py:100-191) is a regex
state machine over a report file — a block-start line opens a context
(region number, date) that applies to the data lines under it.

Relational reconstruction over ``spark.read.text``:

1. global line numbers from the scan's ``_metadata`` columns — rows
   sort by (file, split offset, within-partition id), all JVM-side;
2. block-start lines matched with ``regexp_extract``;
3. block context forward-filled onto data lines (W1 ffill over line_no);
4. data rows parsed field-by-field with regex groups.

PRT files can be GBs on long runs — every step is distributed and
codegen'd; nothing drops to the RDD layer.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    """(line_no, line) with a global, order-preserving line number.

    File order is reconstructed without leaving Tungsten: the scan's
    hidden ``_metadata.file_block_start`` gives each split's byte
    offset, and ``monotonically_increasing_id`` preserves read order
    within a partition (splits are bin-packed, so partition id alone is
    NOT offset-ordered).  The global sort matches the downstream ffill
    window's ordering, so Catalyst reuses one exchange instead of
    paying an extra Python zipWithIndex job + serialization pass."""
    df = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.file_block_start").alias("__blk"),
        F.monotonically_increasing_id().alias("__mid"),
        "value",
    )
    w = Window.orderBy("__fp", "__blk", "__mid")
    return df.select(
        (F.row_number().over(w) - 1).cast("long").alias("line_no"),
        F.col("value").alias("line"),
    )


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
    with block context attached."""
    is_start = F.col("line").rlike(start_pattern)
    ctx = lines.select(
        "line_no",
        "line",
        *[
            F.when(is_start, F.regexp_extract("line", start_pattern, g)).alias(f"__ctx_{name}")
            for name, g in context_fields.items()
        ],
    )
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    for name in context_fields:
        ctx = ctx.withColumn(
            name, F.last(F.col(f"__ctx_{name}"), ignorenulls=True).over(w)
        )
    rows = ctx.filter(F.col("line").rlike(row_pattern)).select(
        "line_no",
        *context_fields.keys(),
        *[
            F.regexp_extract("line", row_pattern, g).alias(name)
            for name, g in row_fields.items()
        ],
    )
    return rows
