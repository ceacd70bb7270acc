"""Column-level table profiling — the ANALYZE-style data-quality audit
(row count, null count, exact distinct count, min/max rendered to
strings) for any DataFrame, one output row per column.

Plan shape: ONE aggregation pass computes every column's null count and
min/max (all partial-aggregated); exact distinct counts are per-column
``count_distinct`` in the same aggregate — Spark plans multi-distinct
aggregates with an expand + two-stage agg, still a single scan of the
input.  For 100 TB profiling swap ``approx_count_distinct`` in via
``exact_distinct=False`` (HLL, one pass, no expand).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: every column): returns one row per
    column with (column, n_rows, n_nulls, n_distinct, min_str,
    max_str).  min/max are rendered with ``CAST AS STRING`` so the
    output schema is column-type-agnostic (and engine-portable: both
    engines render integers/strings identically; avoid float columns in
    oracle-checked profiles, their string forms differ)."""
    cols = list(cols or df.columns)

    # backtick-quoted references + positional aliases: a column name
    # containing a dot would otherwise parse as a struct-field path
    # and fail resolution
    def _qcol(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    distinct = (
        (lambda c: F.count_distinct(_qcol(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(_qcol(c)))
    )
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(F.when(_qcol(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            distinct(c).alias(f"__nd_{i}"),
            # min/max on the NATIVE type, rendered to string afterwards —
            # casting first would make numeric extremes lexicographic
            # (min of [9, 10] = '10')
            F.min(_qcol(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_qcol(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{i}").cast("long").alias("n_rows"),
                F.col(f"__nn_{i}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{i}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_str"),
                F.col(f"__mx_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
