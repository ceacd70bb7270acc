"""Group-tree pipeline: engine-layer equivalent of the reference's
``gruptree.df()`` (/root/reference/src/res2df/gruptree.py:94-287).

The reference accumulates GRUPTREE edge changes while scanning the deck
and, at every date with changes, emits the ENTIRE current tree.  The
relational reconstruction: stamp each edge record with the date cursor
(W1), then snapshot = "latest edge per CHILD as of each snapshot date"
(W7) — a (snapshot × child) grid joined against the edge log with a
keep-last window.  Roots are synthesized as parents that never appear
as children (gruptree.py:215-287)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.operators.windows import dedup_keep, ffill
from res2df_spark.sources.deck import deck_records, schedule_events


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → one row per (DATE, CHILD) with its PARENT as of that
    date; root groups appear as CHILD rows with NULL PARENT."""
    events = schedule_events(spark, deck_text)
    edges = deck_records(spark, deck_text, "GRUPTREE")

    # W1: date cursor onto edge records
    dated = events.filter(F.col("DATE").isNotNull()).select(
        "KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE",
        F.lit(None).cast("string").alias("CHILD"),
        F.lit(None).cast("string").alias("PARENT"),
    )
    u = edges.unionByName(dated)
    filled = ffill(u, cols=["DATE"], order_by=["KEYWORD_IDX", "RECORD_IDX"], out_names=["D"])
    edges = (
        filled.filter(F.col("KEYWORD") == "GRUPTREE")
        .select(F.col("D").alias("d"), "CHILD",
                F.coalesce(F.col("PARENT"), F.lit("FIELD")).alias("PARENT"),
                "KEYWORD_IDX", "RECORD_IDX")
    )

    # W7: snapshots at every date with edge changes
    snaps = edges.select(F.col("d").alias("sd")).distinct()
    children = edges.select("CHILD").distinct()
    pairs = snaps.crossJoin(broadcast(children))
    e2 = edges.select(
        F.col("d").alias("e_d"), F.col("CHILD").alias("e_child"), F.col("PARENT"),
        "KEYWORD_IDX", "RECORD_IDX",
    )
    j = pairs.join(
        broadcast(e2),
        (F.col("e_child") == F.col("CHILD")) & (F.col("e_d") <= F.col("sd")),
    )
    latest = dedup_keep(
        j, keys=["sd", "CHILD"], order_by=["KEYWORD_IDX", "RECORD_IDX"], keep="last"
    ).select(F.col("sd").alias("DATE"), "CHILD", "PARENT")

    # roots: parents that are nobody's child, one row per snapshot where
    # they are referenced (NULL parent, gruptree.py:215-287)
    roots = (
        latest.select("DATE", F.col("PARENT").alias("CHILD"))
        .distinct()
        .join(children, "CHILD", "left_anti")
        .withColumn("PARENT", F.lit(None).cast("string"))
    )
    return latest.unionByName(roots).select("DATE", "CHILD", "PARENT")
