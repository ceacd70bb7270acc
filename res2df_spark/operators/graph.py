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
lineage per round (``session.truncate_lineage``, same contract as
``llm.dedup.connected_components``); set ``spark.res2df.checkpointDir``
to make every truncation a RELIABLE ``checkpoint()`` that survives
executor loss on a real cluster.  The node count rides as a broadcast
one-row cross join — no driver-side ``.count()``.

Related work: the composition mirrors GraphX/Pregel PageRank
re-expressed as DataFrame joins so Catalyst handles partitioning reuse
and AQE handles skew, rather than a hand-scheduled RDD loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.session import truncate_lineage


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    weight_col: str | None = None,
    redistribute_dangling: bool = False,
    return_deltas: bool = False,
    tol: float | None = None,
):
    """PageRank over a directed edge list; returns (node, rank).

    Power iteration with uniform init::

        r_0(v)     = 1 / N
        r_{t+1}(v) = (1 - d) / N + d * (Σ_{u→v} r_t(u) / outdeg(u) [+ D_t / N])

    where ``D_t`` is the total rank sitting on DANGLING nodes (no
    out-edges) at round ``t``, included only with
    ``redistribute_dangling=True``.  The default (False) is the
    simplified variant that lets dangling mass leave the system —
    cheaper by one corpus-level scalar aggregate per round, but on real
    link graphs sinks are a large fraction of nodes and every rank
    deflates systematically; turn redistribution ON for rankings whose
    absolute values matter (mixture weights, thresholds), leave it off
    when only the ORDER is consumed.  The redistribution is one extra
    one-row aggregate per round riding as a broadcast cross join — no
    driver-side action, still oracle-replicable.

    With ``weight_col`` set, each out-edge carries its weight's share
    of the source's mass instead of 1/outdeg (weighted PageRank —
    production link/trade graphs are weighted); the unweighted form is
    the weighted form with all weights 1.  Edges whose weight is NULL
    or non-positive are DROPPED before iteration (a NULL/zero weight
    would otherwise poison the source's out-degree sum and silently
    delete its whole mass); the CLI validates and raises instead.
    Multi-edges should be deduplicated by the caller if they are not
    meaningful.

    Convergence: ``return_deltas=True`` returns ``(ranks, deltas)``
    where ``deltas[t]`` is the L1 distance ‖r_{t+1} − r_t‖₁ after round
    ``t`` — the standard power-iteration convergence metric (each delta
    is ONE scalar aggregate; the rank vector never leaves the
    executors).  ``tol`` stops early once the delta falls below it
    (requires computing deltas, so each round gains that scalar
    aggregate; with both unset no per-round action runs at all).
    ``iterations`` stays a fixed bound either way — a bounded plan the
    oracle can unroll; production runs pick 10-20 with ``tol=1e-6``.
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
    )
    e = truncate_lineage(e)
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    base = truncate_lineage(nodes.crossJoin(broadcast(n_row)))
    # per-edge mass share (__w / outdeg-sum) is iteration-invariant:
    # materialize it ONCE instead of re-running the out-degree join +
    # aggregate inside every round — each iteration is then exactly one
    # join on the rank vector plus one partial-aggregated groupBy
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
    shares = truncate_lineage(
        e.join(outdeg, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__deg")).alias("__share"))
    )
    if redistribute_dangling:
        # dangling = nodes with no (surviving) out-edge; iteration-
        # invariant set, so materialize once like the shares
        dangling = truncate_lineage(
            base.select("node").join(
                e.select(F.col("__src").alias("node")).distinct(),
                "node",
                "left_anti",
            )
        )

    ranks = base.select("node", (F.lit(1.0) / F.col("__n")).alias("rank"))
    deltas: list[float] = []
    for _ in range(iterations):
        contrib = (
            shares.join(ranks, shares["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__share")).alias("__m"))
        )
        new = base.join(contrib, base["node"] == contrib["__dst"], "left")
        if redistribute_dangling:
            # one-row corpus scalar: total rank on dangling nodes this
            # round, shared out uniformly — rides as a broadcast cross
            # join exactly like the node count
            dm_row = (
                ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
            )
            new = new.crossJoin(broadcast(dm_row))
            inflow = (
                F.coalesce(F.col("__m"), F.lit(0.0))
                + F.col("__dm") / F.col("__n")
            )
        else:
            inflow = F.coalesce(F.col("__m"), F.lit(0.0))
        new = truncate_lineage(
            new.select(
                "node",
                (
                    (1.0 - damping) / F.col("__n") + damping * inflow
                ).alias("rank"),
            )
        )
        if return_deltas or tol is not None:
            delta = (
                new.join(
                    ranks.select("node", F.col("rank").alias("__prev")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                .collect()[0]["d"]
            )
            deltas.append(float(delta))
            ranks = new
            if tol is not None and delta < tol:
                break
        else:
            ranks = new
    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return (out, deltas) if return_deltas else out
