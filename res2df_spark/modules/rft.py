"""Well-segment topology: engine-layer equivalent of the reference's
RFT segment processing (/root/reference/src/res2df/rft.py:219-276,
376-460).

Segments form a self-referencing table (SEGIDX → SEGNXT points toward
the wellhead).  The reference joins the table to itself to attach each
segment's upstream neighbour and flags leaves (no segment points here)
and junctions (more than one does) — a one-hop traversal, J7."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def seg_topology(seg: DataFrame, keys=("WELL", "DATE")) -> DataFrame:
    """Attach upstream-segment columns plus LEAF / JUNCTION / LONELY
    flags (rft.py:219-276).

    ``seg``: one row per segment with SEGIDX, SEGNXT (+ key columns).
    The self-join and the incoming-edge count both shuffle on the same
    (keys, segment) hash — Catalyst co-locates them."""
    keys = list(keys)
    payload = [c for c in seg.columns if c not in keys and c not in ("SEGIDX", "SEGNXT")]
    up = seg.select(
        *[F.col(c).alias(f"__k_{c}") for c in keys],
        F.col("SEGIDX").alias("__up_idx"),
        *[F.col(c).alias(f"UP_{c}") for c in payload],
    )
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys] + [
        F.col("SEGNXT") == F.col("__up_idx")
    ]
    out = seg.join(up, cond, "left").drop(*[f"__k_{k}" for k in keys], "__up_idx")

    # incoming-edge count per segment: how many segments point at me
    incoming = seg.groupBy(*keys, F.col("SEGNXT").alias("SEGIDX")).agg(
        F.count(F.lit(1)).alias("__n_in")
    )
    out = out.join(incoming, [*keys, "SEGIDX"], "left").withColumn(
        "__n_in", F.coalesce(F.col("__n_in"), F.lit(0))
    )
    return (
        out.withColumn("LEAF", F.col("__n_in") == 0)
        .withColumn("JUNCTION", F.col("__n_in") > 1)
        .withColumn("LONELY", (F.col("__n_in") == 0) & F.col("SEGNXT").isNull())
        .drop("__n_in")
    )
