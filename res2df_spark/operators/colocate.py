"""Shuffle-placement operators for the 100 TB path: bucketed co-located
joins and deterministic skew salting.

The reference never needs these (single-node pandas), but they are what
makes its query shapes survive a 1000-executor cluster:

* **Bucketing** — the big recurring joins in this engine (grid ⋈ INIT
  on ACTIVE_INDEX, compdat ⋈ connstatus on (WELL,I,J,K), summary long
  table keyed by VECTOR) hit the same keys query after query.  Writing
  both sides bucketed by the join key lets every subsequent join run
  with ZERO exchanges — the scan itself is the shuffle, paid once at
  write time.
* **Salting** — a deterministic fact-side salt + dim-side replication
  turns one hot key (the FIELD well group, the dominant VECTOR) into
  ``n_salt`` evenly-sized keys.  AQE's skew-join split handles sort-
  merge skew at runtime; explicit salting is the portable form that
  also covers aggregations and works when AQE is disabled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``keys``.

    Bucket metadata lives in the session catalog, so later scans expose
    ``HashPartitioning(keys, n_buckets)`` to the planner and equi-joins
    or aggregations on ``keys`` skip their exchange.  ``n_buckets``
    should match across tables that join together (bucket-count
    mismatch falls back to shuffling the smaller side).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table (plain ``spark.table`` — named for intent)."""
    return spark.table(table)


def colocated_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join that is exchange-free when both sides are bucketed on
    ``keys`` with equal bucket counts; otherwise it degrades to a normal
    shuffle join (correctness never depends on the bucketing)."""
    return left.join(right, list(keys), how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a deterministic
    per-row salt in ``[0, n_salt)``; the dim side is replicated
    ``n_salt``× via ``explode(sequence(...))``; the join key becomes
    (keys…, salt), splitting any hot key across ``n_salt`` reducers.

    Cost model: dim grows ``n_salt``× (use on bounded dims only — at
    that size Spark may well broadcast it anyway, which is why this
    operator earns its keep on MEDIUM dims too big to broadcast but
    small enough to replicate).  Row-count of the output is identical
    to the plain join for the SUPPORTED join types: inner/left/semi/
    anti (fact-preserving).  right/full outer are rejected — an
    unmatched dim key would survive once per salt replica, inflating
    the outer side ``n_salt``×.  The per-row salt is arbitrary (any
    distribution is correct since every salt matches a dim replica);
    it is NOT stable across task retries and must not be relied on.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "leftsemi",
               "left_semi", "semi", "leftanti", "left_anti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got {how!r} "
            "(an outer dim side would duplicate unmatched keys per salt)"
        )
    keys = list(keys)
    salt = F.pmod(F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(n_salt))
    fact_s = fact.withColumn("__salt", salt.cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return fact_s.join(dim_s, [*keys, "__salt"], how).drop("__salt")


# NOTE deliberately absent: a "salted groupBy" — for algebraic
# aggregates Spark's map-side partial aggregation already collapses a
# hot key to one row per map task, so salting the shuffle adds a stage
# for nothing; for distinct aggregates Catalyst's Expand-based rewrite
# is the same two-phase split.  Salting earns its keep only on joins
# and on window functions (where dedup_keep's partition key can be
# widened by the caller).
