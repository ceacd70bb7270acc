"""Zone-aggregated completion data: engine-layer equivalent of the
reference's ``wellcompletiondata.df()``
(/root/reference/src/res2df/wellcompletiondata.py:129-215).

Pipeline: connection table (modules/compdat) ⋈ zonemap (J4 broadcast
lookup on K) → A4 conditional zone aggregation: a zone is OPEN at a
date if ANY of its connections is OPEN; KH is summed over open
connections only (else 0).  Well-prefix exclusion is P8."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def df(
    connections: DataFrame,
    zonemap: DataFrame,
    excl_well_prefix: str | None = None,
) -> DataFrame:
    """``connections``: (WELL, I, J, K, OP_SH, DATE, KH, …) from
    modules/compdat; ``zonemap``: (K, ZONE) dim table.
    Returns (WELL, ZONE, DATE, OP/SH, KH) — ``OP/SH`` carries
    OPEN/SHUT like the reference's _aggregate_layer_to_zone
    (wellcompletiondata.py:155-164; a zone is OPEN if ANY of its
    connections is)."""
    if excl_well_prefix:
        # P8 (wellcompletiondata.py:129-138)
        connections = connections.filter(~F.col("WELL").startswith(excl_well_prefix))
    j = connections.join(broadcast(zonemap), "K")  # J4 zone lookup
    is_open = F.col("OP_SH") == "OPEN"
    return j.groupBy("WELL", "ZONE", "DATE").agg(
        F.when(F.max(F.when(is_open, 1).otherwise(0)) == 1, F.lit("OPEN"))
        .otherwise(F.lit("SHUT"))
        .alias("OP/SH"),
        F.coalesce(
            F.sum(F.when(is_open, F.col("KH"))), F.lit(0.0)
        ).alias("KH"),
    )
