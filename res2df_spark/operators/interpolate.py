"""Linear interpolation of NULL gaps in ordered series (P11/A8).

The reference interpolates defaulted saturation-function values with
``pandas.interpolate(limit_area="inside")`` per SATNUM
(/root/reference/src/res2df/satfunc.py:132-157).  The Spark
reconstruction is windowed: previous/next non-null value and x-position
via ``last(ignorenulls)`` / ``first(ignorenulls)`` over
preceding/following frames, then straight-line arithmetic — two window
passes over one shuffle, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def interpolate_linear(
    df: DataFrame,
    x_col: str,
    y_col: str,
    partition_by: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``y_col`` by linear interpolation against ``x_col``
    within each partition, *inside only* (leading/trailing NULLs stay
    NULL, matching ``limit_area="inside"``)."""
    out_col = out_col or y_col
    x = F.col(x_col).cast("double")
    y_raw = F.col(y_col).cast("double")
    # a NULL-x row contributes neither its y nor an x to the windows —
    # gating only y_x would pair its y with a neighbour's x and emit
    # the phantom value into the interpolation; the row itself still
    # keeps its own y via the y_raw pass-through below
    y = F.when(x.isNotNull(), y_raw)
    y_x = F.when(y.isNotNull(), x)

    # y as the secondary sort: duplicate-x rows with different y would
    # otherwise resolve by partition layout (run-to-run nondeterminism);
    # equal (x, y) ties are outcome-identical in any order
    wp = (
        Window.partitionBy(*partition_by)
        .orderBy(x.asc(), y_raw.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*partition_by)
        .orderBy(x.asc(), y_raw.asc_nulls_first())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_y = F.last(y, ignorenulls=True).over(wp)
    prev_x = F.last(y_x, ignorenulls=True).over(wp)
    next_y = F.first(y, ignorenulls=True).over(wn)
    next_x = F.first(y_x, ignorenulls=True).over(wn)

    frac = F.when(next_x != prev_x, (x - prev_x) / (next_x - prev_x)).otherwise(F.lit(0.0))
    interp = prev_y + (next_y - prev_y) * frac
    filled = F.when(y_raw.isNotNull(), y_raw).when(
        prev_y.isNotNull() & next_y.isNotNull(), interp
    )
    return df.withColumn(out_col, filled)
