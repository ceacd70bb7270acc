"""Distributed graph ranking over an edge table.

Training-data curation uses graph centrality to rate SOURCES, not just
documents: Common Crawl curation ranks registered domains by (harmonic/
PageRank) centrality of the link graph and keeps crawls from
high-centrality domains.  The engine-level operator is: edges in, one
score per node out.

Scale shape (the Pregel-lite standard): each PageRank iteration is one
shuffle join of the edge table against the current rank vector on the
source key plus one partial-aggregated groupBy on the destination key —
linear in |E| per round, with map-side combine absorbing hub in-degree
skew (a billion-in-link node arrives at the reducer as one partial sum
per map task, not a billion rows).  Iterative plans MUST truncate
lineage (``localCheckpoint`` per round, same contract as
``llm.dedup.connected_components``); on a real cluster swap for
``checkpoint()`` with a checkpoint dir.  The node count rides as a
broadcast one-row cross join — no driver-side ``.count()``.

Related work: the composition mirrors GraphX/Pregel PageRank
re-expressed as DataFrame joins so Catalyst handles partitioning reuse
and AQE handles skew, rather than a hand-scheduled RDD loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Simplified (dangling mass dropped) power iteration with uniform
    init::

        r_0(v)     = 1 / N
        r_{t+1}(v) = (1 - d) / N + d * Σ_{u→v} r_t(u) / outdeg(u)

    With ``weight_col`` set, each out-edge carries its weight's share
    of the source's mass instead of 1/outdeg (weighted PageRank —
    production link/trade graphs are weighted); the unweighted form is
    the weighted form with all weights 1.  Edges whose weight is NULL
    or non-positive are DROPPED before iteration (a NULL/zero weight
    would otherwise poison the source's out-degree sum and silently
    delete its whole mass); the CLI validates and raises instead.

    Nodes with no out-edges contribute nothing (their mass leaves the
    system — the standard "simplified PageRank" taught alongside the
    full dangling-redistribution variant; deterministic and
    oracle-replicable, which the redistribution variant also is but
    with one more corpus-level scalar per round).  Multi-edges should
    be deduplicated by the caller if they are not meaningful.

    ``iterations`` is fixed, not convergence-tested: a bounded plan the
    oracle can unroll; production runs pick 10-20.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src_col).alias("__src"),
            F.col(dst_col).alias("__dst"),
            w.alias("__w"),
        )
        # NULL endpoints never equi-join — kept, they become phantom
        # nodes that inflate N (deflating every rank) and leak a NULL
        # output row
        .filter(F.col("__src").isNotNull() & F.col("__dst").isNotNull())
        # NaN > 0 and Infinity > 0 are both TRUE in Spark's total
        # order; either poisons the out-degree sum and spreads through
        # the whole rank vector — only FINITE positive weights count
        .filter(
            F.col("__w").isNotNull()
            & ~F.isnan(F.col("__w"))
            & (F.col("__w") > 0)
            & (F.col("__w") != float("inf"))
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    base = nodes.crossJoin(broadcast(n_row)).localCheckpoint(eager=True)
    # per-edge mass share (__w / outdeg-sum) is iteration-invariant:
    # materialize it ONCE instead of re-running the out-degree join +
    # aggregate inside every round — each iteration is then exactly one
    # join on the rank vector plus one partial-aggregated groupBy
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
    shares = (
        e.join(outdeg, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__deg")).alias("__share"))
        .localCheckpoint(eager=True)
    )

    ranks = base.select("node", (F.lit(1.0) / F.col("__n")).alias("rank"))
    for _ in range(iterations):
        contrib = (
            shares.join(ranks, shares["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__share")).alias("__m"))
        )
        ranks = (
            base.join(contrib, base["node"] == contrib["__dst"], "left")
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__m"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
