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

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.operators.windows import dedup_keep, snapshot_latest
from res2df_spark.sources.deck import deck_records, fill_dates, parse_deck

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

def df(
    spark: SparkSession,
    deck_text: str,
    startdate=None,
    welspecs: bool = True,
) -> DataFrame:
    """Deck text → one row per (DATE, CHILD, KEYWORD) edge snapshot:
    KEYWORD ∈ {GRUPTREE, BRANPROP, WELSPECS}; roots carry NULL PARENT;
    GRUPNET/NODEPROP node data merged onto the CHILD node.

    ``startdate`` stamps tree records occurring before any START/DATES
    (reference gruptree.py:29-62 — only relevant when the deck carries
    no date; the reference's no-date fallback is 1900-01-01).
    ``welspecs=False`` drops the well→group edges (same flag upstream).
    """
    # ONE driver-side parse with the date cursor stamped at the parse
    # layer (deck text is bounded by nature): every keyword frame below
    # is a shallow createDataFrame local — no union+window subtree for
    # Catalyst to re-analyze at each of its many downstream references,
    # and keyword presence is known for free (no eager probe jobs).
    dated = fill_dates(parse_deck(deck_text))
    if startdate is None:
        # reference gruptree.py:95-105: the 1900-01-01 fallback fires
        # ONLY when a DATES/START/TSTEP keyword follows undated tree
        # data (the mid-deck flush needs a date key); a deck with no
        # date keyword at all flushes once at EOF with date=None, so
        # the frame keeps a NULL DATE (reference test_str2df asserts
        # exactly this)
        if any(
            r["KEYWORD"] in ("DATES", "START", "TSTEP") for r in dated
        ):
            startdate = _dt.date(1900, 1, 1)
    if startdate is not None:
        dated = [
            dict(r, DATE=startdate) if r["DATE"] is None else r
            for r in dated
        ]
    present = {r["KEYWORD"] for r in dated}

    def recs(kw):
        return deck_records(spark, deck_text, kw, records=dated)

    gruptree = recs("GRUPTREE")
    branprop = recs("BRANPROP")
    welspecs_recs = recs("WELSPECS")
    grupnet = recs("GRUPNET")
    nodeprop = recs("NODEPROP")

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
    w_edges = welspecs_recs.select(
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

    # Families present in the deck: GRUPTREE family (tag 0) if any of
    # its keywords occur, BRANPROP family (tag 1) only once its own
    # keywords appear (WELSPECS alone never instantiates the network
    # tree).  Both families then flow through ONE tagged snapshot pass
    # keyed by (FAM, KIND, CHILD) — a Python loop here would duplicate
    # every window and join into twice the stages for no benefit.
    fams: list[tuple[int, str]] = []
    gt_kws = {"GRUPTREE", "GRUPNET"} | ({"WELSPECS"} if welspecs else set())
    if gt_kws & present:
        fams.append((0, "GRUPTREE"))
    if {"BRANPROP", "NODEPROP"} & present:
        fams.append((1, "BRANPROP"))
    if not fams:
        # the SAME schema the populated path returns — output columns
        # must not depend on deck content, or downstream selects crash
        # with AnalysisException on tree-less decks
        return spark.createDataFrame(
            [],
            "DATE date, CHILD string, PARENT string, KEYWORD string, "
            "TERMINAL_PRESSURE double, VFP_TABLE int, ALQ double, "
            "SUB_SEA_MANIFOLD string, LIFT_GAS_FLOW_THROUGH string, "
            "ALQ_SURFACE_EQV string, AS_CHOKE string, "
            "ADD_GAS_LIFT_GAS string, CHOKE_GROUP string, "
            "SOURCE_SINK_GROUP string, NETWORK_VALUE_TYPE string, "
            "ALQ_SURFACE_DENSITY string",
        )
    treetype_col = F.when(F.col("FAM") == 0, "GRUPTREE").otherwise("BRANPROP")

    edge_logs, well_logs, node_logs, snap_srcs = [], [], [], []
    for fam_tag, treetype in fams:
        e = g_edges if treetype == "GRUPTREE" else b_edges
        n = gn if treetype == "GRUPTREE" else np_
        tag = F.lit(fam_tag).alias("FAM")
        edge_logs.append(e.select(
            tag, F.lit("E").alias("KIND"), F.lit(treetype).alias("KEYWORD"), "*",
        ))
        if welspecs:
            well_logs.append(w_edges.select(
                tag, F.lit("W").alias("KIND"), F.lit("WELSPECS").alias("KEYWORD"),
                "*",
            ))
        node_logs.append(n.select(tag, "*"))
        for src in (e, n) + ((w_edges,) if welspecs else ()):
            snap_srcs.append(src.select(tag, "DATE"))

    log = edge_logs[0]
    for part in edge_logs[1:] + well_logs:
        log = log.unionByName(part, allowMissingColumns=True)
    # fill well-log edge fields missing from the union with typed NULLs
    # (allowMissingColumns already did), order columns
    snaps = snap_srcs[0]
    for s in snap_srcs[1:]:
        snaps = snaps.unionByName(s)
    snaps = snaps.distinct().select("FAM", F.col("DATE").alias("SD"))

    # snapshot grid: every family snapshot date × every (KIND, CHILD,
    # PARENT) EDGE the family's logs ever mention — keyed by the edge
    # pair, not the child, because the reference ACCUMULATES edges in a
    # dict indexed by (child, parent) (gruptree.py:73-79,135): after a
    # reparent the abandoned parent's edge stays in the tree (and the
    # abandoned parent keeps its root row); only the final per-(DATE,
    # CHILD, KEYWORD) dedup below picks one surviving row per child.
    # Equality join on FAM, both sides deck-bounded.
    children = log.select("FAM", "KIND", "CHILD", "PARENT").distinct()
    grid = snaps.join(broadcast(children), "FAM")

    # ONE union-window as-of pass: latest whole record per
    # (FAM, KIND, CHILD) as of each snapshot — one shuffle, no
    # inequality join, no per-family loop (the previous construction —
    # snapshot-grid × log range join + keep-last window, twice per
    # family — was quadratic in snapshots and dominated wall time)
    snap = snapshot_latest(
        log, grid, keys=["FAM", "KIND", "CHILD", "PARENT"], snap_col="SD",
        time_col="DATE", order_by=["KEYWORD_IDX", "RECORD_IDX"],
        payload_cols=["KEYWORD_IDX", "KEYWORD", *_EDGE_COLS],
    ).filter(F.col("KEYWORD_IDX").isNotNull())
    # `snap` fans out to tree/wells/tkeys/roots — Spark re-executes a
    # referenced subtree per reference (no cross-reference reuse), so
    # materialize the one window ONCE; the frame is deck-bounded.
    snap = snap.localCheckpoint(eager=True)

    tree = snap.filter(F.col("KIND") == "E").select(
        "FAM", "SD", "CHILD", "PARENT", "KEYWORD",
        F.col("KEYWORD_IDX").alias("__IDX"), *_EDGE_COLS,
    )
    wells = snap.filter(F.col("KIND") == "W").select(
        "FAM", "SD", "CHILD", "PARENT", "KEYWORD",
        F.col("KEYWORD_IDX").alias("__IDX"),
        *[F.lit(None).cast(snap.schema[c].dataType).alias(c) for c in _EDGE_COLS],
    )
    tkeys = broadcast(
        tree.select(
            F.col("FAM").alias("TF"), F.col("SD").alias("TS"),
            F.col("CHILD").alias("TC"),
        )
    )

    # BRANPROP wells: only those whose group is a child in the network
    # tree; GRUPTREE wells always kept (missing parents grafted below)
    wells = wells.filter(F.col("FAM") == 0).unionByName(
        wells.filter(F.col("FAM") == 1).join(
            tkeys,
            (F.col("TF") == F.col("FAM")) & F.col("TS").eqNullSafe(F.col("SD"))
            & (F.col("TC") == F.col("PARENT")),
            "left_semi",
        )
    )

    # graft GRUPTREE WELSPECS parents missing from the tree onto FIELD;
    # FIELD itself is excluded — grafting it would create a FIELD->FIELD
    # self-edge that suppresses the NULL-parent root row
    missing = (
        wells.filter(F.col("FAM") == 0)
        .select("FAM", "SD", F.col("PARENT").alias("CHILD")).distinct()
        .filter(F.col("CHILD") != "FIELD")
        .join(
            tkeys,
            (F.col("TF") == F.col("FAM")) & F.col("TS").eqNullSafe(F.col("SD"))
            & (F.col("TC") == F.col("CHILD")),
            "left_anti",
        )
        .select(
            "FAM", "SD", "CHILD", F.lit("FIELD").alias("PARENT"),
            treetype_col.alias("KEYWORD"),
            F.lit(None).cast("long").alias("__IDX"),
            *[F.lit(None).cast(snap.schema[c].dataType).alias(c)
              for c in _EDGE_COLS],
        )
    )
    tree = tree.unionByName(missing)

    # roots: parents that are nobody's child in their family's tree →
    # NULL-parent rows (gruptree.py:262-287)
    roots = (
        tree.select("FAM", "SD", F.col("PARENT").alias("CHILD")).distinct()
        .join(
            tree.select(
                F.col("FAM").alias("CF"), F.col("SD").alias("CS"),
                F.col("CHILD").alias("CC"),
            ),
            (F.col("CF") == F.col("FAM")) & F.col("CS").eqNullSafe(F.col("SD"))
            & (F.col("CC") == F.col("CHILD")),
            "left_anti",
        )
        .select(
            "FAM", "SD", "CHILD", F.lit(None).cast("string").alias("PARENT"),
            treetype_col.alias("KEYWORD"),
            F.lit(None).cast("long").alias("__IDX"),
            *[F.lit(None).cast(snap.schema[c].dataType).alias(c)
              for c in _EDGE_COLS],
        )
    )
    fam = tree.unionByName(wells).unionByName(roots)

    # node data: latest GRUPNET/NODEPROP record per NAME as of SD,
    # merged onto CHILD (node fields override edge fields on clash,
    # matching rec_dict.update(node data) in gruptree.py:225-231).
    # Same single union-window as-of; nodes without a record keep NULLs.
    node_log = node_logs[0]
    for n in node_logs[1:]:
        node_log = node_log.unionByName(n)
    # fam rows act as their own markers (carry_cols) — the node merge is
    # part of the same window pass, no grid-distinct + join-back.
    fam = snapshot_latest(
        node_log.withColumnRenamed("NAME", "CHILD"),
        fam, keys=["FAM", "CHILD"], snap_col="SD", time_col="DATE",
        order_by=["KEYWORD_IDX", "RECORD_IDX"],
        payload_cols=_NODE_COLS,
        carry_cols=["PARENT", "KEYWORD", "__IDX", *_EDGE_COLS],
        payload_prefix="N_",
    )
    merged_cols = []
    for c in _NODE_COLS:
        if c in _EDGE_COLS:
            merged_cols.append(F.coalesce(F.col(f"N_{c}"), F.col(c)).alias(c))
        else:
            merged_cols.append(F.col(f"N_{c}").alias(c))
    extra_edge = [F.col(c).alias(c) for c in _EDGE_COLS if c not in _NODE_COLS]
    out = fam.select(
        F.col("SD").alias("DATE"), "CHILD", "PARENT", "KEYWORD",
        *merged_cols, *extra_edge, F.col("FAM").alias("__FAM"), "__IDX",
    )
    # duplicate (DATE, CHILD, KEYWORD) rows keep the last family's row
    # (WELSPECS present under both trees) and, within a family, the
    # child's LATEST-declared edge — the reference's final
    # drop_duplicates(["DATE","CHILD","KEYWORD"], keep="last")
    # (gruptree.py:178-182; its comment names both the WELSPECS and the
    # reparent case).  Deliberate divergence from one reference quirk:
    # the reference's record order is dict-INSERTION order, so an edge
    # pair re-declared after a reparent keeps its ORIGINAL position and
    # loses the dedup to the stale edge; here the latest declaration
    # (KEYWORD_IDX) wins.  Root/graft rows carry NULL __IDX and never
    # collide on these keys.
    return dedup_keep(
        out, keys=["DATE", "CHILD", "KEYWORD"], order_by=["__FAM", "__IDX"],
        keep="last",
    ).drop("__FAM", "__IDX")


# ---------------------------------------------------------------------------
# Presentation helpers (reference gruptree.py:290-456): nested-dict tree
# building and ASCII pretty-printing.  Driver-side by design — they
# format one date's tree for a terminal, the frame is already collected.
# ---------------------------------------------------------------------------


def edge_dataframe2dict(dframe) -> list[dict]:
    """List of edges (pandas frame with CHILD/PARENT) → nested dicts,
    one per root, sorted by root name; leaves are empty dicts.

    Same output contract as the reference (gruptree.py:290-330) but an
    independent formulation: build a parent→children adjacency map, find
    the roots (parents that never appear as a child), and materialize
    each root's subtree with a recursive comprehension.
    """
    import pandas as pd

    if dframe.empty:
        return [{}]
    if "DATE" in dframe and dframe["DATE"].nunique(dropna=False) > 1:
        raise ValueError("Can only handle one date at a time")

    adjacency: dict[str, dict[str, None]] = {}
    has_parent: set[str] = set()
    for row in dframe.itertuples(index=False):
        if pd.isna(row.PARENT):
            continue
        # dict-as-ordered-set: duplicate edges collapse, insertion kept
        adjacency.setdefault(row.PARENT, {})[row.CHILD] = None
        has_parent.add(row.CHILD)
    if not adjacency:
        return [{}]

    def grow(node: str) -> dict:
        return {kid: grow(kid) for kid in adjacency.get(node, ())}

    roots = sorted(name for name in adjacency if name not in has_parent)
    return [{name: grow(name)} for name in roots]


def _render_children(subtree: dict, prefix: str) -> list[str]:
    items = sorted(subtree.items())
    lines = []
    for i, (name, sub) in enumerate(items):
        last = i == len(items) - 1
        # str(): node names may be non-string (the reference's treelib
        # renders integer node ids)
        lines.append(prefix + ("└── " if last else "├── ") + str(name))
        lines.extend(_render_children(sub, prefix + ("    " if last else "│   ")))
    return lines


def tree_from_dict(nested_dict: dict) -> str:
    """One nested dict → ASCII tree string (same rendering the reference
    gets from treelib, gruptree.py:341-380): root line, box-drawing
    branches, children sorted, trailing newline.  Empty dict → ``""``."""
    if not nested_dict:
        return ""
    if len(nested_dict) > 1:
        raise ValueError(
            "The tree_from_dict function should be called with a single tree"
        )
    root = next(iter(nested_dict))
    return "\n".join(
        [str(root), *_render_children(nested_dict[root], "")]
    ) + "\n"


def prettyprint(dframe) -> str:
    """Multi-date, multi-family frame → ASCII trees per date
    (reference gruptree.py:430-456)."""
    import pandas as pd

    output = ""
    for date_ in dframe["DATE"].dropna().unique():
        df_date = dframe[dframe["DATE"] == date_]
        output += "Date: " + pd.to_datetime(date_).strftime("%Y-%m-%d") + "\n"
        for treetype in ["GRUPTREE", "BRANPROP"]:
            if treetype in df_date["KEYWORD"].unique():
                df_tt = df_date[df_date["KEYWORD"].isin([treetype, "WELSPECS"])]
                if treetype == "BRANPROP":
                    # edges whose parent is not a child in the network
                    # tree print under the GRUPTREE tree instead
                    df_tt = df_tt[df_tt.PARENT.isin(df_tt.CHILD.unique())]
                output += f"{treetype} trees:\n"
                for tree in edge_dataframe2dict(df_tt):
                    output += tree_from_dict(tree)
                    output += "\n"
        output += "\n"
    return output
