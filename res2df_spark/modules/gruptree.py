"""Group-tree pipeline: engine-layer equivalent of the reference's
``gruptree.df()`` (/root/reference/src/res2df/gruptree.py:94-287).

The reference accumulates network-keyword state while scanning the deck
and, at every date where any of a tree family's keywords changed, emits
the ENTIRE current tree:

* **GRUPTREE family** — GRUPTREE edges + GRUPNET node data + WELSPECS
  well→group edges (gruptree.py:196-206 ``_write_edgerecords``);
* **BRANPROP family** — BRANPROP edges (DOWNTREE/UPTREE renamed to
  CHILD/PARENT, gruptree.py:125-137) + NODEPROP node data (PRESSURE →
  TERMINAL_PRESSURE) + WELSPECS edges restricted to parents present in
  the BRANPROP tree (gruptree.py:246-258).

Relational reconstruction: stamp each record with the date cursor (W1),
then snapshot = "latest state per key as of each snapshot date" (W7) —
a (snapshot × key) grid joined against the record log with a keep-last
window.  Roots are parents that never appear as children, emitted with
NULL PARENT and their node data (gruptree.py:262-287); WELSPECS parents
missing from the GRUPTREE edge set are grafted onto FIELD
(gruptree.py:253-260).  Every side is deck-bounded → broadcast joins,
no large shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.operators.windows import dedup_keep, ffill
from res2df_spark.sources.deck import deck_records, schedule_events

#: node-data columns carried through from GRUPNET / NODEPROP (NODEPROP
#: PRESSURE arrives renamed to TERMINAL_PRESSURE, gruptree.py:147-149).
_NODE_COLS = [
    "TERMINAL_PRESSURE", "VFP_TABLE", "ALQ", "SUB_SEA_MANIFOLD",
    "LIFT_GAS_FLOW_THROUGH", "ALQ_SURFACE_EQV", "AS_CHOKE",
    "ADD_GAS_LIFT_GAS", "CHOKE_GROUP", "SOURCE_SINK_GROUP",
    "NETWORK_VALUE_TYPE",
]
#: edge-data columns carried on BRANPROP edges (opmkeywords/BRANPROP).
_EDGE_COLS = ["VFP_TABLE", "ALQ", "ALQ_SURFACE_DENSITY"]

_NODE_TYPES = {"string": ["SUB_SEA_MANIFOLD", "LIFT_GAS_FLOW_THROUGH",
                          "ALQ_SURFACE_EQV", "AS_CHOKE", "ADD_GAS_LIFT_GAS",
                          "CHOKE_GROUP", "SOURCE_SINK_GROUP",
                          "NETWORK_VALUE_TYPE"],
               "double": ["TERMINAL_PRESSURE", "ALQ"],
               "int": ["VFP_TABLE"]}


def _dated(records: DataFrame, events: DataFrame, keep: str) -> DataFrame:
    """W1 date cursor onto one keyword's records; ORD = deck position."""
    cols = records.columns
    dated = events.filter(F.col("DATE").isNotNull()).select(
        "KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE",
        *[F.lit(None).cast(records.schema[c].dataType).alias(c)
          for c in cols if c not in ("KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE")],
    )
    filled = ffill(
        records.unionByName(dated),
        cols=["DATE"], order_by=["KEYWORD_IDX", "RECORD_IDX"], out_names=["D"],
    )
    return filled.filter(F.col("KEYWORD") == keep).drop("DATE").withColumnRenamed("D", "DATE")


def _null_node_cols():
    out = []
    for c in _NODE_COLS:
        kind = next(k for k, cs in _NODE_TYPES.items() if c in cs)
        out.append(F.lit(None).cast(kind).alias(c))
    return out


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → one row per (DATE, CHILD, KEYWORD) edge snapshot:
    KEYWORD ∈ {GRUPTREE, BRANPROP, WELSPECS}; roots carry NULL PARENT;
    GRUPNET/NODEPROP node data merged onto the CHILD node."""
    events = schedule_events(spark, deck_text)

    def recs(kw):
        return deck_records(spark, deck_text, kw)

    gruptree = _dated(recs("GRUPTREE"), events, "GRUPTREE")
    branprop = _dated(recs("BRANPROP"), events, "BRANPROP")
    welspecs = _dated(recs("WELSPECS"), events, "WELSPECS")
    grupnet = _dated(recs("GRUPNET"), events, "GRUPNET")
    nodeprop = _dated(recs("NODEPROP"), events, "NODEPROP")

    # Normalized edge logs: (DATE, CHILD, PARENT, ORD, edge fields)
    g_edges = gruptree.select(
        "DATE", "CHILD", F.coalesce("PARENT", F.lit("FIELD")).alias("PARENT"),
        "KEYWORD_IDX", "RECORD_IDX",
        *[F.lit(None).cast("int" if c == "VFP_TABLE" else
                           "double" if c == "ALQ" else "string").alias(c)
          for c in _EDGE_COLS],
    )
    b_edges = branprop.select(
        "DATE", F.col("DOWNTREE_NODE").alias("CHILD"),
        F.col("UPTREE_NODE").alias("PARENT"), "KEYWORD_IDX", "RECORD_IDX",
        *_EDGE_COLS,
    )
    w_edges = welspecs.select(
        "DATE", F.col("WELL").alias("CHILD"), F.col("GROUP").alias("PARENT"),
        "KEYWORD_IDX", "RECORD_IDX",
    )

    # Normalized node log (NAME, DATE, ORD, node fields); NODEPROP
    # PRESSURE → TERMINAL_PRESSURE (gruptree.py:147-149).
    gn = grupnet.select(
        "NAME", "DATE", "KEYWORD_IDX", "RECORD_IDX",
        "TERMINAL_PRESSURE", "VFP_TABLE", "ALQ", "SUB_SEA_MANIFOLD",
        "LIFT_GAS_FLOW_THROUGH", "ALQ_SURFACE_EQV",
        F.lit(None).cast("string").alias("AS_CHOKE"),
        F.lit(None).cast("string").alias("ADD_GAS_LIFT_GAS"),
        F.lit(None).cast("string").alias("CHOKE_GROUP"),
        F.lit(None).cast("string").alias("SOURCE_SINK_GROUP"),
        F.lit(None).cast("string").alias("NETWORK_VALUE_TYPE"),
    ).select("NAME", "DATE", "KEYWORD_IDX", "RECORD_IDX", *_NODE_COLS)
    np_ = nodeprop.select(
        "NAME", "DATE", "KEYWORD_IDX", "RECORD_IDX",
        F.col("PRESSURE").alias("TERMINAL_PRESSURE"),
        F.lit(None).cast("int").alias("VFP_TABLE"),
        F.lit(None).cast("double").alias("ALQ"),
        F.lit(None).cast("string").alias("SUB_SEA_MANIFOLD"),
        F.lit(None).cast("string").alias("LIFT_GAS_FLOW_THROUGH"),
        F.lit(None).cast("string").alias("ALQ_SURFACE_EQV"),
        "AS_CHOKE", "ADD_GAS_LIFT_GAS", "CHOKE_GROUP", "SOURCE_SINK_GROUP",
        "NETWORK_VALUE_TYPE",
    ).select("NAME", "DATE", "KEYWORD_IDX", "RECORD_IDX", *_NODE_COLS)
    nodes = gn.unionByName(np_)

    parts = []
    for treetype, edges, node_log in (
        ("GRUPTREE", g_edges, gn),
        ("BRANPROP", b_edges, np_),
    ):
        # snapshot dates: any date where this family's keywords occurred
        snaps = (
            edges.select("DATE")
            .unionByName(node_log.select("DATE"))
            .unionByName(w_edges.select("DATE"))
            .distinct()
        )
        if treetype == "BRANPROP":
            # the BRANPROP tree only exists once its own keywords have
            # appeared; WELSPECS-only snapshots before that emit nothing
            # anyway (no tree children → all well edges filtered out)
            if not (edges.take(1) or node_log.take(1)):
                continue
        elif not (edges.take(1) or node_log.take(1) or w_edges.take(1)):
            continue
        snaps = snaps.select(F.col("DATE").alias("SD"))

        # latest tree edge per CHILD as of each snapshot (W7 keep-last)
        grid = snaps.crossJoin(broadcast(edges.select("CHILD").distinct()))
        j = grid.join(
            broadcast(
                edges.select(
                    F.col("DATE").alias("ED"), F.col("CHILD").alias("EC"),
                    "PARENT", "KEYWORD_IDX", "RECORD_IDX", *_EDGE_COLS,
                )
            ),
            (F.col("EC") == F.col("CHILD"))
            & (F.coalesce(F.col("ED"), F.to_date(F.lit("1900-01-01")))
               <= F.coalesce(F.col("SD"), F.to_date(F.lit("2999-12-31")))),
        )
        tree = dedup_keep(
            j, keys=["SD", "CHILD"], order_by=["KEYWORD_IDX", "RECORD_IDX"], keep="last"
        ).select("SD", "CHILD", "PARENT", F.lit(treetype).alias("KEYWORD"), *_EDGE_COLS)

        # latest WELSPECS group per well as of each snapshot
        wgrid = snaps.crossJoin(broadcast(w_edges.select(F.col("CHILD")).distinct()))
        wj = wgrid.join(
            broadcast(
                w_edges.select(
                    F.col("DATE").alias("ED"), F.col("CHILD").alias("EC"),
                    "PARENT", "KEYWORD_IDX", "RECORD_IDX",
                )
            ),
            (F.col("EC") == F.col("CHILD"))
            & (F.coalesce(F.col("ED"), F.to_date(F.lit("1900-01-01")))
               <= F.coalesce(F.col("SD"), F.to_date(F.lit("2999-12-31")))),
        )
        wells = dedup_keep(
            wj, keys=["SD", "CHILD"], order_by=["KEYWORD_IDX", "RECORD_IDX"], keep="last"
        ).select(
            "SD", "CHILD", "PARENT", F.lit("WELSPECS").alias("KEYWORD"),
            *[F.lit(None).cast(tree.schema[c].dataType).alias(c) for c in _EDGE_COLS],
        )
        if treetype == "BRANPROP":
            # only wells whose group is a child in the BRANPROP tree
            wells = wells.join(
                broadcast(
                    tree.select(F.col("SD").alias("TS"), F.col("CHILD").alias("TC"))
                ),
                (F.col("TS").eqNullSafe(F.col("SD"))) & (F.col("TC") == F.col("PARENT")),
                "left_semi",
            )
        else:
            # graft WELSPECS parents missing from the tree onto FIELD
            missing = (
                wells.select("SD", F.col("PARENT").alias("CHILD")).distinct()
                .join(
                    broadcast(
                        tree.select(F.col("SD").alias("TS"), F.col("CHILD").alias("TC"))
                    ),
                    (F.col("TS").eqNullSafe(F.col("SD"))) & (F.col("TC") == F.col("CHILD")),
                    "left_anti",
                )
                .select(
                    "SD", "CHILD", F.lit("FIELD").alias("PARENT"),
                    F.lit(treetype).alias("KEYWORD"),
                    *[F.lit(None).cast(tree.schema[c].dataType).alias(c)
                      for c in _EDGE_COLS],
                )
            )
            tree = tree.unionByName(missing)

        fam = tree.unionByName(wells)

        # roots: parents of this family's tree edges that are nobody's
        # child → NULL-parent rows (gruptree.py:262-287)
        tree_children = tree.select("SD", "CHILD")
        roots = (
            tree.select("SD", F.col("PARENT").alias("CHILD")).distinct()
            .join(
                tree_children.select(F.col("SD").alias("CS"), F.col("CHILD").alias("CC")),
                (F.col("CS").eqNullSafe(F.col("SD"))) & (F.col("CC") == F.col("CHILD")),
                "left_anti",
            )
            .select(
                "SD", "CHILD", F.lit(None).cast("string").alias("PARENT"),
                F.lit(treetype).alias("KEYWORD"),
                *[F.lit(None).cast(tree.schema[c].dataType).alias(c) for c in _EDGE_COLS],
            )
        )
        fam = fam.unionByName(roots)

        # node data: latest GRUPNET/NODEPROP record per NAME as of SD,
        # merged onto CHILD (node fields override edge fields on clash,
        # matching rec_dict.update(node data) in gruptree.py:225-231)
        ngrid = fam.select("SD", "CHILD").distinct()
        nj = ngrid.join(
            broadcast(
                node_log.select(
                    F.col("DATE").alias("ND"), F.col("NAME").alias("NC"),
                    F.col("KEYWORD_IDX").alias("NKI"), F.col("RECORD_IDX").alias("NRI"),
                    *[F.col(c).alias(f"N_{c}") for c in _NODE_COLS],
                )
            ),
            (F.col("NC") == F.col("CHILD"))
            & (F.coalesce(F.col("ND"), F.to_date(F.lit("1900-01-01")))
               <= F.coalesce(F.col("SD"), F.to_date(F.lit("2999-12-31")))),
            "left",
        )
        # a group either has only the one NULL row from the left join or
        # only matched rows — NULL ordering never mixes within a group
        ndata = dedup_keep(
            nj, keys=["SD", "CHILD"], order_by=["NKI", "NRI"], keep="last"
        ).select("SD", "CHILD", *[f"N_{c}" for c in _NODE_COLS])
        fam = fam.join(ndata, ["SD", "CHILD"], "left")
        merged_cols = []
        for c in _NODE_COLS:
            if c in _EDGE_COLS:
                merged_cols.append(F.coalesce(F.col(f"N_{c}"), F.col(c)).alias(c))
            else:
                merged_cols.append(F.col(f"N_{c}").alias(c))
        extra_edge = [F.col(c).alias(c) for c in _EDGE_COLS if c not in _NODE_COLS]
        parts.append(
            fam.select(
                F.col("SD").alias("DATE"), "CHILD", "PARENT", "KEYWORD",
                *merged_cols, *extra_edge,
                F.lit(len(parts)).alias("__FAM"),
            )
        )

    if not parts:
        return spark.createDataFrame(
            [], "DATE date, CHILD string, PARENT string, KEYWORD string",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    # duplicate (DATE, CHILD, KEYWORD) rows keep the last family's row
    # (WELSPECS rows present under both trees — reference keep='last',
    # gruptree.py:178-182)
    return dedup_keep(
        out, keys=["DATE", "CHILD", "KEYWORD"], order_by=["__FAM"], keep="last"
    ).drop("__FAM")
