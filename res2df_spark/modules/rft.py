"""Well-segment topology: engine-layer equivalent of the reference's
RFT segment processing (/root/reference/src/res2df/rft.py:219-276,
376-460).

Segments form a self-referencing table (SEGIDX → SEGNXT points toward
the wellhead).  The reference joins the table to itself to attach each
segment's upstream neighbour and flags leaves (no segment points here)
and junctions (more than one does) — a one-hop traversal, J7."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def seg_topology(
    seg: DataFrame, keys=("WELL", "DATE"), attach: str = "next"
) -> DataFrame:
    """Attach neighbour-segment columns plus LEAF / JUNCTION / LONELY
    flags (rft.py:219-276).

    ``seg``: one row per segment with SEGIDX, SEGNXT (+ key columns).

    ``attach='next'`` (default) joins each segment's *next* segment —
    the one SEGNXT points to, downstream toward the wellhead — as
    ``NXT_*`` columns: at most one partner, no row fan-out.
    ``attach='upstream'`` reproduces the reference's orientation
    (process_seg_topology merges on ``SEGIDX == SEGNXT``): partners are
    the segments pointing *at* me, as ``UPSTREAM_*`` columns, one output
    row per upstream segment — junctions fan out exactly like the
    reference's frame.

    The self-join and the incoming-edge count both shuffle on the same
    (keys, segment) hash — Catalyst co-locates them."""
    if attach not in ("next", "upstream"):
        raise ValueError("attach must be 'next' or 'upstream'")
    keys = list(keys)
    payload = [c for c in seg.columns if c not in keys and c not in ("SEGIDX", "SEGNXT")]
    prefix = "NXT_" if attach == "next" else "UPSTREAM_"
    partner_payload = payload if attach == "next" else ["SEGIDX", *payload]
    up = seg.select(
        *[F.col(c).alias(f"__k_{c}") for c in keys],
        F.col("SEGIDX" if attach == "next" else "SEGNXT").alias("__p_idx"),
        *[F.col(c).alias(f"{prefix}{c}") for c in partner_payload],
    )
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys] + [
        F.col("SEGNXT" if attach == "next" else "SEGIDX") == F.col("__p_idx")
    ]
    out = seg.join(up, cond, "left").drop(*[f"__k_{k}" for k in keys], "__p_idx")

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
        .withColumn(
            "LONELY",
            (F.col("__n_in") == 0)
            # 0 is the common RFT encoding for "no next segment" (the
            # reference reader maps None to 0; seg2dicttree below skips
            # nxt <= 0 the same way)
            & (F.col("SEGNXT").isNull() | (F.col("SEGNXT") <= 0)),
        )
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
    if "CONLENTH" in df.columns:
        # scale whenever a connection length exists — derived above OR
        # already present on the frame (the reference's add_extras
        # gates each rate on CONLENTH alone, rft.py:463-508)
        for rate in ("CONORAT", "CONWRAT", "CONGRAT"):
            if rate in cols:
                # zero-length connections (defaulted MD interval) must
                # not ANSI-abort the job; NULL marks the undefined rate
                df = df.withColumn(
                    rate + "S",
                    F.when(
                        F.col("CONLENTH") != 0,
                        F.col(rate) / F.col("CONLENTH"),
                    ),
                )
    return df


def seg_branch_flags(seg: DataFrame, keys=("WELL", "DATE")) -> DataFrame:
    """Topology plus branch-level flags needed for ICD detection
    (reference rft.py:196-276): LONELYSEG (only segment on its branch)
    and DOWNSTREAM_JUNCTION (the segment this one points at is a
    junction).  All grouped aggregates / equi-joins on the (keys,
    segment) hash — no driver loop, no per-group pandas."""
    from pyspark.sql import Window

    keys = list(keys)
    topo = seg_topology(seg, keys=keys)
    wb = Window.partitionBy(*keys, "SEGBRNO")
    topo = topo.withColumn("LONELYSEG", F.count(F.lit(1)).over(wb) == 1)
    junctions = topo.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("SEGIDX").alias("__t_idx"),
        F.col("JUNCTION").alias("__t_junction"),
    )
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys] + [
        F.col("SEGNXT") == F.col("__t_idx")
    ]
    return (
        topo.join(junctions, cond, "left")
        .withColumn(
            "DOWNSTREAM_JUNCTION", F.coalesce(F.col("__t_junction"), F.lit(False))
        )
        .drop(*[f"__k_{k}" for k in keys], "__t_idx", "__t_junction")
    )


def split_seg_icd(
    seg: DataFrame, keys=("WELL", "DATE")
) -> tuple[DataFrame, DataFrame]:
    """Split segments into (tubing, ICD) frames (reference
    rft.py:326-374).  A group has ICDs when its max branch number
    exceeds its true well-branch count (branches counted over non-leaf
    or junction-feeding segments, rft.py:196-217); within such a group
    the ICD segments are the leaves that sit alone on their branch.
    ICD columns come back prefixed ``ICD_``.  The per-group decision is
    a grouped aggregate broadcast back — never a collect."""
    keys = list(keys)
    flagged = seg_branch_flags(seg, keys=keys)
    per_group = (
        flagged.groupBy(*keys)
        .agg(
            F.max("SEGBRNO").alias("__max_brno"),
            F.greatest(
                F.lit(1),
                F.count_distinct(
                    F.when(
                        ~F.col("LEAF") | F.col("DOWNSTREAM_JUNCTION"),
                        F.col("SEGBRNO"),
                    )
                ),
            ).alias("__n_branches"),
        )
        .withColumn("__icd_present", F.col("__max_brno") > F.col("__n_branches"))
        .select(*keys, "__icd_present")
    )
    flagged = flagged.join(F.broadcast(per_group), keys, "left")
    # null-safe: a row with a NULL key column gets NULL __icd_present
    # from the left join, and without the coalesce it would fail BOTH
    # filters below and silently vanish from tubing AND icd
    is_icd = F.coalesce(
        F.col("__icd_present") & F.col("LEAF") & F.col("LONELYSEG"),
        F.lit(False),
    )
    tubing = flagged.filter(~is_icd).drop("__icd_present")
    icd = flagged.filter(is_icd).drop("__icd_present")
    icd = icd.select(
        *keys, *[F.col(c).alias(f"ICD_{c}") for c in icd.columns if c not in keys]
    )
    return tubing, icd


def merge_icd_seg_conseg(
    con: DataFrame,
    seg: DataFrame | None = None,
    icd: DataFrame | None = None,
    keys=("WELL", "DATE"),
) -> DataFrame:
    """Connection-centric CON ⋈ ICD ⋈ SEG merge (reference
    rft.py:376-460): a connection attached to an ICD carries the ICD's
    columns and the tubing segment the ICD feeds (``ICD_SEGNXT`` →
    ``SEGIDX``); a connection attached directly to tubing joins its
    segment straight off ``CONSEGNO``.  Non-multiseg wells (no segment
    frame) pass through untouched.

    Unlike the reference's pandas flow there is no post-filter on
    upstream indices: each chain hop is an equi-join keyed by exactly
    one segment, so junction fan-out never duplicates rows.  Three
    equi-joins + an anti-join, all hashed on (keys, segment)."""
    keys = list(keys)
    if seg is None or not seg.columns:
        return con
    # materialize the deck-bounded segment frame ONCE: the emptiness
    # probe (pass-through contract for non-multiseg wells) and the
    # three joins below would otherwise each re-execute the whole
    # upstream split_seg_icd window/join pipeline
    seg = seg.localCheckpoint(eager=True)
    if not seg.take(1):
        return con
    with_icd = None
    if icd is not None and icd.columns:
        with_icd = con.alias("c").join(
            icd.alias("i"),
            [F.col(f"c.{k}") == F.col(f"i.{k}") for k in keys]
            + [F.col("c.CONSEGNO") == F.col("i.ICD_SEGIDX")],
            "inner",
        ).select(
            "c.*", *[F.col(f"i.{c}") for c in icd.columns if c not in keys]
        )
        with_icd = with_icd.alias("ci").join(
            seg.alias("s"),
            [F.col(f"ci.{k}") == F.col(f"s.{k}") for k in keys]
            + [F.col("ci.ICD_SEGNXT") == F.col("s.SEGIDX")],
            "left",
        ).select("ci.*", *[F.col(f"s.{c}") for c in seg.columns if c not in keys])
        no_icd_con = con.alias("c").join(
            icd.alias("i"),
            [F.col(f"c.{k}") == F.col(f"i.{k}") for k in keys]
            + [F.col("c.CONSEGNO") == F.col("i.ICD_SEGIDX")],
            "left_anti",
        )
    else:
        no_icd_con = con
    direct = no_icd_con.alias("c").join(
        seg.alias("s"),
        [F.col(f"c.{k}") == F.col(f"s.{k}") for k in keys]
        + [F.col("c.CONSEGNO") == F.col("s.SEGIDX")],
        "inner",
    ).select("c.*", *[F.col(f"s.{c}") for c in seg.columns if c not in keys])
    if with_icd is None:
        return direct
    return with_icd.unionByName(direct, allowMissingColumns=True)


def seg2dicttree(seg) -> dict:
    """Collected segment frame (SEGIDX/SEGNXT pandas frame or list of
    Rows) → nested dict keyed by segment index, wellhead at the root
    (reference rft.py:279-310).  Driver-side presentation: the frame is
    one well's topology, already collected.  Independently formulated
    via the same adjacency-map + recursive build as the gruptree
    renderer."""
    rows = (
        seg.to_dict("records") if hasattr(seg, "to_dict") else [r.asDict() for r in seg]
    )
    if not rows:
        return {}
    ids = {int(r["SEGIDX"]) for r in rows if r.get("SEGIDX") is not None}
    kids: dict[int, dict[int, None]] = {}
    has_parent: set[int] = set()
    for r in rows:
        nxt = r.get("SEGNXT")
        if nxt is None or (isinstance(nxt, float) and nxt != nxt) or nxt <= 0:
            continue
        if int(nxt) not in ids:
            # dangling pointer: the reference's self-merge on
            # SEGIDX == SEGNXT (rft.py:247-253) produces no upstream row
            # for a SEGNXT with no SEGIDX row, so the edge vanishes —
            # fabricating the missing node here would render a phantom
            # root segment
            continue
        kids.setdefault(int(nxt), {})[int(r["SEGIDX"])] = None
        has_parent.add(int(r["SEGIDX"]))
    if not kids:
        # no edges: ONE root, the lowest SEGIDX (reference
        # rft.py:300-302 returns {sorted seg_data's first SEGIDX: {}})
        return {min(ids): {}}

    def grow(node: int) -> dict:
        return {k: grow(k) for k in kids.get(node, ())}

    return {root: grow(root) for root in sorted(kids) if root not in has_parent}


def pretty_print_well(seg) -> str:
    """ASCII tree of one well's segment structure (reference
    rft.py:312-324), using the shared renderer."""
    from res2df_spark.modules.gruptree import tree_from_dict

    tree = _stringify(seg2dicttree(seg))
    return "".join(tree_from_dict({k: tree[k]}) for k in sorted(tree))


def _stringify(tree: dict) -> dict:
    return {str(k): _stringify(v) for k, v in tree.items()}
