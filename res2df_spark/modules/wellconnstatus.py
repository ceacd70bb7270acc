"""Connection-status events from per-connection time series: the
engine-layer equivalent of the reference's ``wellconnstatus.df()``
(/root/reference/src/res2df/wellconnstatus.py:34-86).

The reference scans CPI:* summary vectors per connection and emits an
event whenever the value crosses zero (first event is always OPEN).
Relationally: derive the OPEN/SHUT state per observation, then W3
status-change extraction (lag window) — one shuffle on the connection
key.  The streaming variant is streaming.ops.status_change_stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from res2df_spark.operators.windows import status_changes


def df(cpi_long: DataFrame,
       well_col: str = "WELL",
       conn_cols: tuple[str, ...] = ("I", "J", "K"),
       date_col: str = "DATE",
       value_col: str = "VALUE") -> DataFrame:
    """(WELL, I, J, K, DATE, VALUE) CPI observations → status-change
    events (WELL, I, J, K, DATE, OP/SH)."""
    keys = [well_col, *conn_cols]
    state = (
        F.when(F.col(value_col) > 0, F.lit("OPEN")).otherwise(F.lit("SHUT")).alias("__st")
    )
    staged = cpi_long.withColumn("__st", state)
    out = status_changes(staged, "__st", order_by=[date_col], partition_by=keys)
    # reference baseline is prev_value = 0 (SHUT): the first emitted
    # event per connection is always its first OPEN — a connection that
    # starts (or stays) at CPI=0 emits no leading SHUT row, and an
    # always-shut connection is excluded entirely
    # (/root/reference/src/res2df/wellconnstatus.py:60-66)
    w_first = F.row_number().over(Window.partitionBy(*keys).orderBy(date_col))
    out = (
        out.withColumn("__rn", w_first)
        .filter(~((F.col("__rn") == 1) & (F.col("__st") == "SHUT")))
        .drop("__rn")
    )
    return out.select(*keys, date_col, F.col("__st").alias("OP/SH"))


def from_summary(summary_long: DataFrame) -> DataFrame:
    """Derive connection status changes from a long summary table's
    ``CPI:WELL:I,J,K`` vectors (the reference's wellconnstatus.df over
    the CPI summary data, wellconnstatus.py:22-68): split the vector
    name, then run the W3 status-change scan per connection."""
    # the reference's strict pattern (wellconnstatus.py:38-42): a bare
    # prefix test would let malformed vectors (CPI:OP1, CPI:OP1:14,26)
    # through as phantom (WELL, NULL, NULL, NULL) connections
    cpi = summary_long.filter(
        F.col("VECTOR").rlike(r"^CPI:[A-Z0-9_\-]{1,8}:[0-9]+,[0-9]+,[0-9]+$")
    )
    parts = F.split(F.col("VECTOR"), ":")
    ijk = F.split(parts.getItem(2), ",")
    staged = cpi.select(
        parts.getItem(1).alias("WELL"),
        ijk.getItem(0).cast("int").alias("I"),
        ijk.getItem(1).cast("int").alias("J"),
        ijk.getItem(2).cast("int").alias("K"),
        "DATE", "VALUE",
    )
    return df(staged)
