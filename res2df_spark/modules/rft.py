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


def add_extras(df: DataFrame) -> DataFrame:
    """Derived nice-to-have columns (reference rft.py:463-508
    ``add_extras``), each guarded on its source columns being present:

    * COMPLETION_DP — CONPRES − SEGPRES where both are > 0, else 0;
    * DRAWDOWN — PRESSURE − CONPRES where CONPRES > 0, else 0;
    * CONBPRES — alias of PRESSURE;
    * CONMD / CONLENTH — midpoint and length of the connection's
      measured-depth interval CONLENST–CONLENEN;
    * CON{O,W,G}RATS — per-length scaled rates (rate / CONLENTH).

    Pure column arithmetic: partition-local, codegen'd, no shuffle."""
    cols = set(df.columns)
    if {"CONPRES", "SEGPRES"} <= cols:
        df = df.withColumn(
            "COMPLETION_DP",
            F.when(
                (F.col("CONPRES") > 0) & (F.col("SEGPRES") > 0),
                F.col("CONPRES") - F.col("SEGPRES"),
            ).otherwise(F.lit(0.0)),
        )
    if {"CONPRES", "PRESSURE"} <= cols:
        df = df.withColumn(
            "DRAWDOWN",
            F.when(
                F.col("CONPRES") > 0, F.col("PRESSURE") - F.col("CONPRES")
            ).otherwise(F.lit(0.0)),
        )
    else:
        df = df.withColumn("DRAWDOWN", F.lit(0.0))
    if "PRESSURE" in cols:
        df = df.withColumn("CONBPRES", F.col("PRESSURE"))
    if {"CONLENEN", "CONLENST"} <= cols:
        df = df.withColumn(
            "CONMD", 0.5 * (F.col("CONLENST") + F.col("CONLENEN"))
        ).withColumn("CONLENTH", F.col("CONLENEN") - F.col("CONLENST"))
        for rate in ("CONORAT", "CONWRAT", "CONGRAT"):
            if rate in cols:
                df = df.withColumn(rate + "S", F.col(rate) / F.col("CONLENTH"))
    return df
