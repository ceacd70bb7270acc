"""Oracle-checked query suite, part 2 — the remaining SURVEY.md §2
operator families: chained/anti joins (J8), state rewrite (J10),
wildcard expansion (R3), range-predicate join (R5), N-D table melt
(R7), default fill (W2), tree snapshots (W7), constant-column probes
(P4), and rate/total-aware resampling (W8 full semantics).

Registered into ``suite.QUERIES`` / ``suite.ORACLES`` on import (the
bottom of ``suite.py`` imports this module).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.catalog import Catalog
from res2df_spark.functions.strings import well_template_to_regex
from res2df_spark.llm.similarity import seed_centroids
from res2df_spark.operators.resample import resample_asof, spine_from_observations
from res2df_spark.operators.reshape import melt
from res2df_spark.operators.windows import dedup_keep, ffill
from res2df_spark.suite import _TOKS_SQL, _q


# ---------------------------------------------------------------------------
# J8 — chained equi-joins + anti-join branch (rft.py:376-460: CON⋈ICD⋈SEG,
# with non-ICD connections anti-joined then joined directly)
# ---------------------------------------------------------------------------


@_q(
    "j8_chain_anti",
    """
    WITH icd AS (SELECT p_partkey FROM part WHERE p_size <= 5),
    via AS (
        SELECT s.s_nationkey, l.l_quantity
        FROM lineitem l JOIN icd ON l.l_partkey = icd.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    direct AS (
        SELECT s.s_nationkey, l.l_quantity
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE NOT EXISTS (SELECT 1 FROM icd WHERE icd.p_partkey = l.l_partkey)),
    u AS (
        SELECT 'ICD' AS branch, * FROM via
        UNION ALL SELECT 'DIRECT' AS branch, * FROM direct)
    SELECT branch, CAST(s_nationkey AS BIGINT) AS nationkey,
           count(*) AS n_items, CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
    FROM u GROUP BY branch, s_nationkey
    """,
)
def j8_chain_anti(spark, sf_dir):
    """Chained equi-joins with an anti-join fallback branch (J8 —
    rft.py:376-460: ICD connections go through the ICD⋈SEG chain,
    the rest are anti-joined then joined directly).  The ICD dim is
    broadcast on both the semi and anti side — no extra fact shuffle."""
    cat = Catalog(spark, sf_dir)
    icd = cat.part.filter(F.col("p_size") <= 5).select("p_partkey")
    li = cat.lineitem.select("l_partkey", "l_suppkey", "l_quantity")
    sup = cat.supplier.select("s_suppkey", "s_nationkey")
    # part/supplier scale with SF: no forced broadcast — Catalyst picks
    # BHJ locally from stats and degrades to SMJ at cluster scale.
    via = (
        li.join(icd, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.lit("ICD").alias("branch"), "s_nationkey", "l_quantity")
    )
    direct = (
        li.join(icd, F.col("l_partkey") == F.col("p_partkey"), "left_anti")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.lit("DIRECT").alias("branch"), "s_nationkey", "l_quantity")
    )
    return (
        via.unionByName(direct)
        .groupBy("branch", F.col("s_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# J10 — per-action state rewrite (applywelopen, compdat.py:791-924)
# ---------------------------------------------------------------------------

_STATE_ROWS = [
    # (well, k, idx, status) — COMPDAT-defined connection states
    ("OP1", 1, 10, "OPEN"),
    ("OP1", 2, 10, "OPEN"),
    ("OP1", 1, 40, "OPEN"),
    ("OP2", 1, 20, "SHUT"),
    ("OP2", 2, 20, "OPEN"),
]
_ACTION_ROWS = [
    # (well, idx, newstatus) — WELOPEN actions rewriting the latest state
    ("OP1", 30, "SHUT"),
    ("OP2", 50, "AUTO"),
]
_J10_SQL = """
    WITH state(well, k, idx, status) AS (VALUES
        ('OP1', 1, 10, 'OPEN'), ('OP1', 2, 10, 'OPEN'), ('OP1', 1, 40, 'OPEN'),
        ('OP2', 1, 20, 'SHUT'), ('OP2', 2, 20, 'OPEN')),
    act(well, idx, newstatus) AS (VALUES ('OP1', 30, 'SHUT'), ('OP2', 50, 'AUTO')),
    expanded AS (
        SELECT s.well, s.k, a.idx, a.newstatus AS status,
               row_number() OVER (PARTITION BY a.well, a.idx, s.k
                                  ORDER BY s.idx DESC) AS rn
        FROM act a JOIN state s ON s.well = a.well AND s.idx < a.idx),
    unioned AS (
        SELECT well, k, idx, status FROM state
        UNION ALL SELECT well, k, idx, status FROM expanded WHERE rn = 1),
    final AS (
        SELECT *, row_number() OVER (PARTITION BY well, k ORDER BY idx DESC) AS rn
        FROM unioned)
    SELECT well, CAST(k AS BIGINT) AS k, CAST(idx AS BIGINT) AS idx, status
    FROM final WHERE rn = 1
"""


@_q("j10_state_rewrite", _J10_SQL)
def j10_state_rewrite(spark, sf_dir):
    """WELOPEN-style state rewrite (J10 — compdat.py:791-924): each
    action joins the latest prior connection rows of its well
    (idx < action idx, keep-last per connection), rewrites the status,
    appends; final state is keep-last per connection."""
    state = spark.createDataFrame(_STATE_ROWS, "well string, k long, idx long, status string")
    act = spark.createDataFrame(_ACTION_ROWS, "well string, idx long, newstatus string")
    a = act.select(
        F.col("well"), F.col("idx").alias("a_idx"), F.col("newstatus")
    )
    joined = state.alias("s").join(broadcast(a).alias("a"), "well").filter(
        F.col("s.idx") < F.col("a_idx")
    )
    latest = dedup_keep(
        joined, keys=["well", "a_idx", "k"], order_by=[F.col("s.idx")], keep="last"
    ).select("well", "k", F.col("a_idx").alias("idx"), F.col("newstatus").alias("status"))
    unioned = state.unionByName(latest)
    final = dedup_keep(unioned, keys=["well", "k"], order_by=["idx"], keep="last")
    return final.select("well", "k", "idx", "status")


# ---------------------------------------------------------------------------
# R3 — wildcard template expansion via broadcast regex join
# (compdat.py:366-412 + common.py:955-980)
# ---------------------------------------------------------------------------

_WELL_ROWS = [
    ("OP1", date(2020, 1, 1)),
    ("OP2", date(2020, 2, 1)),
    ("OPX", date(2020, 6, 1)),
    ("WI1", date(2020, 1, 15)),
    ("*X", date(2020, 1, 1)),
]
_TEMPLATE_ROWS = [
    # (template, action_date, action)
    ("OP*", date(2020, 3, 1), "SHUT"),
    ("?I1", date(2020, 3, 1), "OPEN"),
    ("\\*X", date(2020, 3, 1), "STOP"),
]


@_q(
    "r3_wildcard_expand",
    """
    WITH wells(well, def_date) AS (VALUES
        ('OP1', DATE '2020-01-01'), ('OP2', DATE '2020-02-01'),
        ('OPX', DATE '2020-06-01'), ('WI1', DATE '2020-01-15'),
        ('*X', DATE '2020-01-01')),
    tmpl(template, rx, act_date, action) AS (VALUES
        ('OP*', '^OP.*$', DATE '2020-03-01', 'SHUT'),
        ('?I1', '^.I1$', DATE '2020-03-01', 'OPEN'),
        ('\\*X', '^\\*X$', DATE '2020-03-01', 'STOP'))
    SELECT t.template, w.well, CAST(t.act_date AS TIMESTAMP) AS act_date, t.action
    FROM tmpl t JOIN wells w
      ON regexp_matches(w.well, t.rx) AND w.def_date <= t.act_date
    """,
)
def r3_wildcard_expand(spark, sf_dir):
    """Wildcard well expansion (R3 — WELOPEN 'OP*' fans out to every
    matching well defined at or before the action date).  Glob→regex
    translation driver-side (templates are tiny), then a broadcast
    rlike join — the fact side never shuffles."""
    wells = spark.createDataFrame(_WELL_ROWS, "well string, def_date date")
    tmpl = spark.createDataFrame(
        [(t, well_template_to_regex(t), d, a) for t, d, a in _TEMPLATE_ROWS],
        "template string, rx string, act_date date, action string",
    )
    out = wells.join(
        broadcast(tmpl),
        F.expr("well rlike rx") & (F.col("def_date") <= F.col("act_date")),
    )
    return out.select(
        "template", "well", F.col("act_date").cast("timestamp").alias("act_date"), "action"
    )


# ---------------------------------------------------------------------------
# R5 — range-predicate join (COMPLUMP C1–C2 membership, compdat.py:656-754)
# ---------------------------------------------------------------------------


@_q(
    "r5_range_join",
    """
    WITH lumps(well, c1, c2, lump) AS (VALUES
        ('OP1', 1, 2, 10), ('OP1', 3, 5, 20), ('OP2', 1, 9, 30)),
    conns AS (
        SELECT 'OP' || CAST(1 + l_orderkey % 2 AS VARCHAR) AS well,
               CAST(1 + l_linenumber % 5 AS INT) AS k,
               count(*) AS n_conns
        FROM lineitem GROUP BY 1, 2)
    SELECT c.well, CAST(c.k AS BIGINT) AS k, CAST(l.lump AS BIGINT) AS lump,
           CAST(c.n_conns AS BIGINT) AS n_conns
    FROM conns c JOIN lumps l ON c.well = l.well AND c.k BETWEEN l.c1 AND l.c2
    """,
)
def r5_range_join(spark, sf_dir):
    """Range-membership join (R5 — COMPLUMP lump ranges pick up member
    connections via N BETWEEN C1 AND C2).  The lump table is tiny →
    broadcast; the non-equi BETWEEN predicate runs map-side, so the
    fact side still never shuffles (checked: BroadcastNestedLoopJoin
    over a broadcast dim is the intended plan at any corpus scale)."""
    li = Catalog(spark, sf_dir).lineitem
    conns = li.groupBy(
        F.concat(F.lit("OP"), (F.lit(1) + F.col("l_orderkey") % 2).cast("string")).alias("well"),
        (F.lit(1) + F.col("l_linenumber") % 5).cast("int").alias("k"),
    ).agg(F.count(F.lit(1)).alias("n_conns"))
    lumps = spark.createDataFrame(
        [("OP1", 1, 2, 10), ("OP1", 3, 5, 20), ("OP2", 1, 9, 30)],
        "lwell string, c1 int, c2 int, lump int",
    )
    out = conns.join(
        broadcast(lumps),
        (F.col("well") == F.col("lwell")) & F.col("k").between(F.col("c1"), F.col("c2")),
    )
    return out.select(
        "well",
        F.col("k").cast("long").alias("k"),
        F.col("lump").cast("long").alias("lump"),
        F.col("n_conns").cast("long").alias("n_conns"),
    )


# ---------------------------------------------------------------------------
# R7 — N-D interpolation-table melt (VFP BHP matrix → long rows,
# vfp/_vfpcommon.py:89-167, _vfpprod.py:201-299)
# ---------------------------------------------------------------------------

_VFP_ROWS = [
    (1, [100.0, 200.0, 300.0], [10.0, 20.0], [[500.0, 450.0, 400.0], [600.0, 550.0, 500.0]]),
    (2, [50.0, 150.0], [5.0], [[300.0, 280.0]]),
]


@_q(
    "r7_vfp_melt",
    """
    WITH v(tab, flow, thp, bhp) AS (VALUES
        (1, [100.0, 200.0, 300.0], [10.0, 20.0],
         [[500.0, 450.0, 400.0], [600.0, 550.0, 500.0]]),
        (2, [50.0, 150.0], [5.0], [[300.0, 280.0]])),
    ti AS (SELECT tab, flow, thp, bhp, unnest(generate_series(1, len(thp))) AS i FROM v),
    fi AS (SELECT tab, thp[i] AS thp_val, bhp[i] AS bhp_row, flow,
                  unnest(generate_series(1, len(flow))) AS j FROM ti)
    SELECT CAST(tab AS BIGINT) AS tab, thp_val AS thp, flow[j] AS rate,
           bhp_row[j] AS bhp
    FROM fi
    """,
)
def r7_vfp_melt(spark, sf_dir):
    """VFP-table melt (R7 — the BHP matrix with axis vectors becomes one
    row per (THP, RATE) point): posexplode the THP axis, index into the
    matrix, then explode arrays_zip(flow, bhp_row).  Pure generators —
    partition-local, no shuffle."""
    src = spark.createDataFrame(
        _VFP_ROWS, "tab long, flow array<double>, thp array<double>, bhp array<array<double>>"
    )
    by_thp = src.select(
        "tab", "flow", "bhp", F.posexplode("thp").alias("ti", "thp_val")
    ).select("tab", "flow", F.col("thp_val"), F.col("bhp").getItem(F.col("ti")).alias("bhp_row"))
    zipped = by_thp.select(
        "tab",
        "thp_val",
        F.explode(F.arrays_zip(F.col("flow"), F.col("bhp_row"))).alias("z"),
    )
    return zipped.select(
        "tab",
        F.col("thp_val").alias("thp"),
        F.col("z.flow").alias("rate"),
        F.col("z.bhp_row").alias("bhp"),
    )


# ---------------------------------------------------------------------------
# W2 — defaulted-value fill from latest prior header record
# (WELSPECS I/J defaults into COMPDAT, compdat.py:115-143)
# ---------------------------------------------------------------------------

_DECK_ROWS = [
    # (idx, kind, well, i, j)
    (1, "WELSPECS", "OP1", 5, 7),
    (2, "COMPDAT", "OP1", 0, 0),
    (3, "COMPDAT", "OP1", 9, 9),
    (4, "WELSPECS", "OP1", 6, 8),
    (5, "COMPDAT", "OP1", 0, 0),
    (6, "COMPDAT", "OP2", 0, 0),
]


@_q(
    "w2_default_fill",
    """
    WITH deck(idx, kind, well, i, j) AS (VALUES
        (1, 'WELSPECS', 'OP1', 5, 7), (2, 'COMPDAT', 'OP1', 0, 0),
        (3, 'COMPDAT', 'OP1', 9, 9), (4, 'WELSPECS', 'OP1', 6, 8),
        (5, 'COMPDAT', 'OP1', 0, 0), (6, 'COMPDAT', 'OP2', 0, 0)),
    f AS (
        SELECT *,
            last_value(CASE WHEN kind = 'WELSPECS' THEN i END IGNORE NULLS)
                OVER (PARTITION BY well ORDER BY idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS head_i,
            last_value(CASE WHEN kind = 'WELSPECS' THEN j END IGNORE NULLS)
                OVER (PARTITION BY well ORDER BY idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS head_j
        FROM deck)
    SELECT CAST(idx AS BIGINT) AS idx, well,
           CAST(CASE WHEN i = 0 THEN head_i ELSE i END AS BIGINT) AS eff_i,
           CAST(CASE WHEN j = 0 THEN head_j ELSE j END AS BIGINT) AS eff_j
    FROM f WHERE kind = 'COMPDAT'
    """,
)
def w2_default_fill(spark, sf_dir):
    """Defaulted-coordinate fill (W2 — COMPDAT I/J=0 replaced by the
    latest prior WELSPECS head location per well): forward-fill of the
    header values over the deck order, then a conditional swap."""
    deck = spark.createDataFrame(_DECK_ROWS, "idx long, kind string, well string, i int, j int")
    marked = deck.withColumn(
        "__hi", F.when(F.col("kind") == "WELSPECS", F.col("i"))
    ).withColumn("__hj", F.when(F.col("kind") == "WELSPECS", F.col("j")))
    filled = ffill(
        marked,
        cols=["__hi", "__hj"],
        order_by=["idx"],
        partition_by=["well"],
        out_names=["head_i", "head_j"],
    )
    return filled.filter(F.col("kind") == "COMPDAT").select(
        "idx",
        "well",
        F.when(F.col("i") == 0, F.col("head_i")).otherwise(F.col("i")).cast("long").alias("eff_i"),
        F.when(F.col("j") == 0, F.col("head_j")).otherwise(F.col("j")).cast("long").alias("eff_j"),
    )


# ---------------------------------------------------------------------------
# W7 — tree snapshots: latest edge per child as of each snapshot date
# (gruptree.py:94-182,215-287)
# ---------------------------------------------------------------------------

_EDGE_ROWS = [
    (date(2020, 1, 1), "OP1", "PLATA"),
    (date(2020, 1, 1), "PLATA", "FIELD"),
    (date(2020, 3, 1), "OP1", "PLATB"),  # re-parent
    (date(2020, 3, 1), "PLATB", "FIELD"),
]


@_q(
    "w7_tree_snapshot",
    """
    WITH e(d, child, parent) AS (VALUES
        (DATE '2020-01-01', 'OP1', 'PLATA'), (DATE '2020-01-01', 'PLATA', 'FIELD'),
        (DATE '2020-03-01', 'OP1', 'PLATB'), (DATE '2020-03-01', 'PLATB', 'FIELD')),
    snaps(sd) AS (SELECT DISTINCT d FROM e),
    pairs AS (SELECT s.sd, c.child FROM snaps s CROSS JOIN (SELECT DISTINCT child FROM e) c),
    ranked AS (
        SELECT p.sd, p.child, e.parent,
               row_number() OVER (PARTITION BY p.sd, p.child ORDER BY e.d DESC) AS rn
        FROM pairs p JOIN e ON e.child = p.child AND e.d <= p.sd)
    SELECT CAST(sd AS TIMESTAMP) AS snapshot_date, child, parent
    FROM ranked WHERE rn = 1
    """,
)
def w7_tree_snapshot(spark, sf_dir):
    """Group-tree snapshotting (W7 — gruptree accumulates edge changes
    and emits the ENTIRE current tree at each date with changes): the
    snapshot is 'latest edge per child as of date', an as-of join of
    (snapshot-date × child) against the edge log."""
    edges = spark.createDataFrame(_EDGE_ROWS, "d date, child string, parent string")
    snaps = edges.select(F.col("d").alias("sd")).distinct()
    children = edges.select("child").distinct()
    pairs = snaps.crossJoin(broadcast(children))
    e2 = edges.select(
        F.col("d").alias("e_d"), F.col("child").alias("e_child"), F.col("parent")
    )
    j = pairs.join(
        broadcast(e2), (F.col("e_child") == F.col("child")) & (F.col("e_d") <= F.col("sd"))
    ).select("sd", "child", "parent", "e_d")
    latest = dedup_keep(j, keys=["sd", "child"], order_by=["e_d"], keep="last")
    return latest.select(
        F.col("sd").cast("timestamp").alias("snapshot_date"), "child", "parent"
    )


# ---------------------------------------------------------------------------
# P4 — constant-column probe (grid.py:590-620: drop single-valued columns)
# ---------------------------------------------------------------------------


@_q(
    "p4_constant_probe",
    """
    SELECT 'l_returnflag' AS col_name, count(DISTINCT l_returnflag) AS n_distinct,
           CAST(count(DISTINCT l_returnflag) > 1 AS BIGINT) AS keep FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(DISTINCT l_linestatus),
           CAST(count(DISTINCT l_linestatus) > 1 AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(DISTINCT l_tax),
           CAST(count(DISTINCT l_tax) > 1 AS BIGINT) FROM lineitem
    """,
)
def p4_constant_probe(spark, sf_dir):
    """Constant-column detection probe (P4 — grid.py:590-620 deletes
    columns with one unique value).  One pass, all countDistincts in a
    single aggregate, melted to (column, n_distinct, keep)."""
    li = Catalog(spark, sf_dir).lineitem
    cols = ["l_returnflag", "l_linestatus", "l_tax"]
    agg = li.agg(*[F.countDistinct(c).alias(c) for c in cols])
    long = melt(agg, id_cols=[], value_cols=cols, var_name="col_name", value_name="nd", value_type="bigint")
    return long.select(
        "col_name",
        F.col("nd").alias("n_distinct"),
        (F.col("nd") > 1).cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# W8 full semantics — rate/total-aware resampling via resample_asof
# ---------------------------------------------------------------------------


@_q(
    "w8_resample_linear",
    """
    WITH obs AS (
        SELECT event_type, date_trunc('week', CAST(ts AS DATE)) AS wk,
               round(sum(value), 2) AS y
        FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(wk) AS lo, max(wk) AS hi FROM obs),
    days AS (
        -- rollforward: daily bounds are always ON the day boundary, so
        -- the spine ends AT hi (no fabricated post-end day)
        SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds),
    spine AS (
        SELECT k.event_type, days.d
        FROM days CROSS JOIN (SELECT DISTINCT event_type FROM obs) k),
    f AS (
        SELECT s.event_type, s.d,
               CAST(epoch(CAST(s.d AS TIMESTAMP)) AS DOUBLE) AS x, o.y,
               last_value(o.y IGNORE NULLS) OVER w_prev AS py,
               last_value(CASE WHEN o.y IS NOT NULL
                               THEN CAST(epoch(CAST(s.d AS TIMESTAMP)) AS DOUBLE) END
                          IGNORE NULLS) OVER w_prev AS px,
               first_value(o.y IGNORE NULLS) OVER w_next AS ny,
               first_value(CASE WHEN o.y IS NOT NULL
                                THEN CAST(epoch(CAST(s.d AS TIMESTAMP)) AS DOUBLE) END
                           IGNORE NULLS) OVER w_next AS nx
        FROM spine s LEFT JOIN obs o ON o.event_type = s.event_type AND o.wk = s.d
        WINDOW
            w_prev AS (PARTITION BY s.event_type ORDER BY s.d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY s.event_type ORDER BY s.d
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, CAST(d AS TIMESTAMP) AS d,
           CAST(round(CASE
               WHEN py IS NOT NULL AND ny IS NOT NULL THEN
                   py + (ny - py) * (CASE WHEN nx <> px THEN (x - px) / (nx - px) ELSE 0 END)
               ELSE coalesce(py, ny) END, 4) AS DOUBLE) AS val
    FROM f
    """,
)
def w8_resample_linear(spark, sf_dir):
    """Full W8 semantics: weekly observations resampled onto a daily
    spine with linear-in-time interpolation (the reference's cumulative-
    vector rule, docs/usage/summary.rst:31-45) via resample_asof —
    union + two windows, one shuffle on the series key."""
    ev = Catalog(spark, sf_dir).events
    obs = (
        ev.groupBy(
            "event_type", F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("d")
        )
        .agg(F.round(F.sum("value"), 2).alias("y"))
    )
    spine = spine_from_observations(obs, "d", freq="daily")
    out = resample_asof(obs, spine, keys=["event_type"], date_col="d", value_col="y", how="linear")
    return out.select(
        "event_type", F.col("d").cast("timestamp").alias("d"), F.round("y", 4).alias("val")
    )


# ---------------------------------------------------------------------------
# Multimodal feature extraction — Pandas-UDF (mapInPandas) path with a full
# oracle: the deterministic fake decoder derives features from md5 bytes,
# which ANSI SQL can reproduce nibble-by-nibble.
# ---------------------------------------------------------------------------


def _mm_feats_csv(out):
    """Engine-side features → rounded CSV for engine-neutral compare
    (the same convention as emb_truncate)."""
    return out.select(
        "doc_id",
        "n_bytes",
        "content_md5",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x, 6).cast("decimal(20,6)").cast("string"),
            ),
            ",",
        ).alias("feats_csv"),
        "n_features",
    )


@_q(
    "mm_extract_features",
    """
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                      md5(text) AS h FROM documents),
    u AS (SELECT doc_id, n_bytes, h, unnest(generate_series(1, 16)) AS i FROM m),
    v AS (SELECT doc_id, n_bytes, h,
                 sum(CASE WHEN i <= 8 THEN (strpos('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1)
                          * power(16.0, 8 - i) ELSE 0 END) AS w0,
                 sum(CASE WHEN i > 8 THEN (strpos('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1)
                          * power(16.0, 16 - i) ELSE 0 END) AS w1
          FROM u GROUP BY 1, 2, 3)
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, h AS content_md5,
           CAST(CAST(round(w0 / 4294967296.0, 6) AS DECIMAL(20, 6)) AS VARCHAR)
               || ',' ||
           CAST(CAST(round(w1 / 4294967296.0, 6) AS DECIMAL(20, 6)) AS VARCHAR)
               AS feats_csv,
           CASE WHEN h IS NULL THEN NULL
                ELSE CAST(2 AS BIGINT) END AS n_features
    FROM v
    """,
)
def mm_extract_features(spark, sf_dir):
    """Multimodal decode/feature-extract over mapInPandas (north star):
    payloads stream through the Python worker as Arrow batches; the
    deterministic fake decoder (md5-derived doubles) stands in for a
    real image/audio codec, so the WHOLE path — binary cast, batch
    iteration, arity-parametric feature schema (round 6:
    features array<double>, not hardcoded columns) — is
    oracle-verified."""
    from res2df_spark.llm.multimodal import extract_features

    docs = Catalog(spark, sf_dir).documents
    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return _mm_feats_csv(extract_features(src))




# ---------------------------------------------------------------------------
# ANN scale path — random-hyperplane LSH bucketing (llm/similarity.py)
# ---------------------------------------------------------------------------


def _planes_sql(dim: int = 64, n_planes: int = 8) -> str:
    from res2df_spark.llm.similarity import _hyperplane

    rows = []
    for s in range(n_planes):
        vals = ", ".join(repr(x) for x in _hyperplane(dim, s))
        rows.append(f"({s}, [{vals}])")
    return ",\n        ".join(rows)


_ANN_LSH_SQL = f"""
    WITH planes(pi, pv) AS (VALUES
        {_planes_sql()}),
    b AS (
        SELECT e.vec_id,
               string_agg(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p.pi) AS bucket
        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
    q AS (SELECT e.vec_id AS q_id, e.embedding AS qv, b.bucket
          FROM embeddings e JOIN b ON b.vec_id = e.vec_id WHERE e.vec_id < 8),
    cand AS (
        SELECT q.q_id, cb.vec_id, q.qv, e.embedding AS ev
        FROM q JOIN b cb ON cb.bucket = q.bucket
        JOIN embeddings e ON e.vec_id = cb.vec_id
        WHERE cb.vec_id <> q.q_id),
    expl AS (SELECT q_id, vec_id, qv, ev, unnest(generate_series(1, 64)) AS i FROM cand),
    dots AS (SELECT q_id, vec_id,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                    sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
             FROM expl GROUP BY 1, 2),
    ranked AS (SELECT q_id, vec_id, dot / (sqrt(nq) * sqrt(ne)) AS cosine,
                      row_number() OVER (PARTITION BY q_id
                          ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
               FROM dots)
    SELECT q_id, vec_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
"""


@_q("ann_lsh_bucketed", _ANN_LSH_SQL)
def ann_lsh_bucketed(spark, sf_dir):
    """Approximate cosine top-k via random-hyperplane LSH buckets
    (llm/similarity.py lsh_bucketed_topk) — the O(n)·probe scale path
    next to the brute-force baseline.  Deterministic md5-derived
    hyperplanes make the bucketing reproducible in the SQL oracle."""
    from res2df_spark.llm.similarity import lsh_bucketed_topk

    emb = Catalog(spark, sf_dir).embeddings
    out = lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 8), k=10, n_planes=8)
    return out.select(
        "q_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Full schedule pipeline — deck text → connection table
# (modules/compdat.py: W1 date cursor + W2 head fill + R1 unroll +
# R3/R4/J10 WELOPEN application), checked against a hand-derived
# expected table, the reference's own test style (tests/test_welopen.py).
# ---------------------------------------------------------------------------

_PIPE_DECK = """
START
  1 JAN 2020 /
WELSPECS
  'OP1' 'G1' 3 4 1000.0 'OIL' /
  'OP2' 'G1' 5 6 1000.0 'OIL' /
/
COMPDAT
  'OP1' 2* 1 2 'OPEN' /
  'OP2' 5 6 1 1 'OPEN' /
/
DATES
  1 FEB 2020 /
/
COMPDAT
  'OP2' 5 6 2 2 'OPEN' /
/
DATES
  1 MAR 2020 /
/
WELOPEN
  'OP*' 'SHUT' /
/
"""


@_q(
    "compdat_pipeline",
    """
    WITH expected(well, i, j, k, op_sh, d) AS (VALUES
        ('OP1', 3, 4, 1, 'OPEN', DATE '2020-01-01'),
        ('OP1', 3, 4, 2, 'OPEN', DATE '2020-01-01'),
        ('OP2', 5, 6, 1, 'OPEN', DATE '2020-01-01'),
        ('OP2', 5, 6, 2, 'OPEN', DATE '2020-02-01'),
        ('OP1', 3, 4, 1, 'SHUT', DATE '2020-03-01'),
        ('OP1', 3, 4, 2, 'SHUT', DATE '2020-03-01'),
        ('OP2', 5, 6, 1, 'SHUT', DATE '2020-03-01'),
        ('OP2', 5, 6, 2, 'SHUT', DATE '2020-03-01'))
    SELECT well, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(k AS BIGINT) AS k, op_sh, CAST(d AS TIMESTAMP) AS d
    FROM expected
    """,
)
def compdat_pipeline(spark, sf_dir):
    """End-to-end schedule pipeline on an embedded deck: date cursor,
    WELSPECS default fill (OP1's defaulted I/J → 3/4), K-range unroll,
    wildcard WELOPEN SHUT of both wells at the final date.  The oracle
    is the hand-derived expected connection table."""
    from res2df_spark.modules import compdat

    out = compdat.df(spark, _PIPE_DECK)
    return out.select(
        F.col("WELL").alias("well"),
        F.col("I").cast("long").alias("i"),
        F.col("J").cast("long").alias("j"),
        F.col("K").cast("long").alias("k"),
        F.col("OP_SH").alias("op_sh"),
        F.col("DATE").cast("timestamp").alias("d"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (north star dedup family)
# ---------------------------------------------------------------------------


@_q(
    "dedup_embedding_cosine",
    """
    WITH pairs AS (
        SELECT a.vec_id AS v1, b.vec_id AS v2,
               a.embedding AS ea, b.embedding AS eb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
    expl AS (SELECT v1, v2, ea, eb, unnest(generate_series(1, 64)) AS i FROM pairs),
    dots AS (SELECT v1, v2,
                    sum(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS dot,
                    sum(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)) AS na,
                    sum(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS nb
             FROM expl GROUP BY 1, 2)
    SELECT v1, v2,
           CAST(round(dot / (sqrt(na) * sqrt(nb)), 6) AS DOUBLE) AS cosine
    FROM dots WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (exact, threshold 0.4).

    Exact all-pairs is the verification baseline; at corpus scale the
    same predicate runs over LSH-bucket candidates (ann_lsh_bucketed /
    llm.similarity.lsh_bucketed_topk) so the self-join is bucket-local
    instead of O(n²).  JVM-side fold for the dot products, no UDF."""
    from res2df_spark.functions.vectors import l2_norm
    from res2df_spark.llm.similarity import _cosine_with_norms

    emb = Catalog(spark, sf_dir).embeddings
    # norms once per row, not twice per pair (bit-identical — see
    # _cosine_with_norms)
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("ea")
    ).withColumn("__na", l2_norm(F.col("ea")))
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("eb")
    ).withColumn("__nb", l2_norm(F.col("eb")))
    pairs = a.join(b, F.col("v1") < F.col("v2"))
    cos = _cosine_with_norms(
        F.col("ea"), F.col("eb"), F.col("__na"), F.col("__nb")
    )
    return (
        pairs.select("v1", "v2", cos.alias("__c"))
        .filter(F.col("__c") >= 0.4)
        .select("v1", "v2", F.round("__c", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Table-keyword pipeline — deck text → tagged long table with per-region
# interpolation of defaulted values (modules/tables.py: R9 + R10 + P11)
# ---------------------------------------------------------------------------

_SATFUNC_DECK = """
SWOF
  0.1 0.0  1.0  0.0
  0.5 1*   0.5  0.0
  0.9 1.0  0.0  0.0
/
  0.2 0.0  1.0  0.0
  0.8 1.0  0.0  0.0
/
SGOF
  0.0 0.0 1.0 0.0
  1.0 1.0 0.0 0.0
/
"""


@_q(
    "satfunc_pipeline",
    """
    WITH expected(keyword, satnum, row_idx, sat, krw, kro, pc) AS (VALUES
        ('SWOF', 1, 0, 0.1, 0.0, 1.0, 0.0),
        ('SWOF', 1, 1, 0.5, 0.5, 0.5, 0.0),
        ('SWOF', 1, 2, 0.9, 1.0, 0.0, 0.0),
        ('SWOF', 2, 0, 0.2, 0.0, 1.0, 0.0),
        ('SWOF', 2, 1, 0.8, 1.0, 0.0, 0.0),
        ('SGOF', 1, 0, 0.0, 0.0, 1.0, 0.0),
        ('SGOF', 1, 1, 1.0, 1.0, 0.0, 0.0))
    SELECT keyword, CAST(satnum AS BIGINT) AS satnum,
           CAST(row_idx AS BIGINT) AS row_idx, sat, krw, kro, pc
    FROM expected
    """,
)
def satfunc_pipeline(spark, sf_dir):
    """Saturation-table family end-to-end: R10 record reshape (regions =
    record counter), R9 tagged union of SWOF+SGOF, P11 interpolation of
    the defaulted KRW at SW=0.5 (→ 0.5, linear between neighbours).
    Oracle = hand-derived expected table, reference test style."""
    from res2df_spark.modules.tables import satfunc_df

    out = satfunc_df(spark, _SATFUNC_DECK, interpolate_defaults=True)
    sat = F.coalesce(F.col("SW"), F.col("SG"))
    kr = F.coalesce(F.col("KRW"), F.col("KRG"))
    kro = F.coalesce(F.col("KROW"), F.col("KROG"))
    return out.select(
        F.col("KEYWORD").alias("keyword"),
        F.col("SATNUM").cast("long").alias("satnum"),
        F.col("ROW_IDX").cast("long").alias("row_idx"),
        sat.alias("sat"),
        kr.alias("krw"),
        kro.alias("kro"),
        F.coalesce(F.col("PCOW"), F.col("PCOG")).alias("pc"),
    )


# ---------------------------------------------------------------------------
# Grid / RFT module paths under oracle check (J6, J5+P5+A3, J7, A4/J11)
# ---------------------------------------------------------------------------


@_q(
    "j6_coord_midpoint",
    """
    WITH geom(i, j, k, z) AS (VALUES (1, 1, 1, 100.0), (5, 5, 5, 300.0)),
    nnc(i1, j1, k1, i2, j2, k2, tran) AS (VALUES
        (1, 1, 1, 5, 5, 5, 0.1), (1, 1, 1, 9, 9, 9, 0.2)),
    j AS (
        SELECT n.*, g1.z AS z1, g2.z AS z2
        FROM nnc n
        LEFT JOIN geom g1 ON g1.i = n.i1 AND g1.j = n.j1 AND g1.k = n.k1
        LEFT JOIN geom g2 ON g2.i = n.i2 AND g2.j = n.j2 AND g2.k = n.k2)
    SELECT CAST(i2 AS BIGINT) AS i2, tran,
           CASE WHEN z1 IS NOT NULL AND z2 IS NOT NULL THEN (z1 + z2) / 2
                ELSE coalesce(z1, z2) END AS z_mid
    FROM j
    """,
)
def j6_coord_midpoint(spark, sf_dir):
    """NNC coordinate join + NULL-tolerant midpoint (J6 —
    modules/grid.nnc_coordinates; nnc.py:112-147)."""
    from res2df_spark.modules.grid import nnc_coordinates

    geom = spark.createDataFrame(
        [(1, 1, 1, 100.0), (5, 5, 5, 300.0)], "I int, J int, K int, Z double"
    )
    nnc = spark.createDataFrame(
        [(1, 1, 1, 5, 5, 5, 0.1), (1, 1, 1, 9, 9, 9, 0.2)],
        "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRAN double",
    )
    out = nnc_coordinates(nnc, geom, coord_cols=("Z",))
    return out.select(
        F.col("I2").cast("long").alias("i2"),
        F.col("TRAN").alias("tran"),
        F.col("Z_MID").alias("z_mid"),
    )


@_q(
    "trans_interface",
    """
    WITH grid(i, j, k, fipnum, tran) AS (VALUES
        (1, 1, 1, 1, 2.0), (1, 1, 2, 1, 2.0),
        (2, 1, 1, 2, 2.0), (2, 1, 2, 2, 2.0),
        (3, 1, 1, 3, 2.0)),
    pairs AS (
        SELECT a.fipnum AS f1, b.fipnum AS f2, a.tran
        FROM grid a JOIN grid b
          ON b.i = a.i + 1 AND b.j = a.j AND b.k = a.k
        UNION ALL
        SELECT a.fipnum, b.fipnum, a.tran
        FROM grid a JOIN grid b
          ON b.i = a.i AND b.j = a.j AND b.k = a.k + 1),
    cross_pairs AS (SELECT * FROM pairs WHERE f1 <> f2)
    SELECT CAST(least(f1, f2) AS VARCHAR) || '-' ||
           CAST(greatest(f1, f2) AS VARCHAR) AS interface,
           CAST(round(sum(tran), 2) AS DOUBLE) AS sum_tran,
           count(*) AS n_pairs
    FROM cross_pairs GROUP BY 1
    """,
)
def trans_interface(spark, sf_dir):
    """Transmissibility interface pipeline (J5 neighbour shift + P5
    boundary filter + A3 pair-key aggregation — modules/grid;
    trans.py:104-219)."""
    from res2df_spark.modules.grid import (
        boundary_filter,
        interface_aggregate,
        neighbor_pairs,
    )

    grid = spark.createDataFrame(
        [
            (1, 1, 1, 1, 2.0), (1, 1, 2, 1, 2.0),
            (2, 1, 1, 2, 2.0), (2, 1, 2, 2, 2.0),
            (3, 1, 1, 3, 2.0),
        ],
        "I int, J int, K int, FIPNUM int, TRAN double",
    )
    pairs = neighbor_pairs(grid, directions="IK")
    cross = boundary_filter(pairs, "FIPNUM")
    agg = interface_aggregate(cross, "FIPNUM", "TRAN1")
    return agg.select(
        F.col("INTERFACE").alias("interface"),
        F.round("SUM_TRAN1", 2).alias("sum_tran"),
        F.col("N_PAIRS").alias("n_pairs"),
    )


@_q(
    "rft_seg_topology",
    """
    WITH seg(segidx, segnxt, depth) AS (VALUES
        (1, CAST(NULL AS INT), 1000.0), (2, 1, 1010.0), (3, 1, 1020.0), (4, 2, 1030.0)),
    up AS (
        SELECT s.*, u.depth AS up_depth
        FROM seg s LEFT JOIN seg u ON s.segnxt = u.segidx),
    inc AS (SELECT segnxt AS segidx, count(*) AS n_in FROM seg
            WHERE segnxt IS NOT NULL GROUP BY 1)
    SELECT CAST(up.segidx AS BIGINT) AS segidx, up.depth, up.up_depth,
           CAST(coalesce(inc.n_in, 0) = 0 AS BIGINT) AS leaf,
           CAST(coalesce(inc.n_in, 0) > 1 AS BIGINT) AS junction
    FROM up LEFT JOIN inc ON up.segidx = inc.segidx
    """,
)
def rft_seg_topology(spark, sf_dir):
    """Segment topology self-join with leaf/junction flags (J7 —
    modules/rft.seg_topology; rft.py:219-276)."""
    from datetime import date as _d

    from res2df_spark.modules.rft import seg_topology

    d = _d(2020, 1, 1)
    seg = spark.createDataFrame(
        [("W", d, 1, None, 1000.0), ("W", d, 2, 1, 1010.0),
         ("W", d, 3, 1, 1020.0), ("W", d, 4, 2, 1030.0)],
        "WELL string, DATE date, SEGIDX int, SEGNXT int, DEPTH double",
    )
    out = seg_topology(seg)
    return out.select(
        F.col("SEGIDX").cast("long").alias("segidx"),
        F.col("DEPTH").alias("depth"),
        F.col("NXT_DEPTH").alias("up_depth"),
        F.col("LEAF").cast("long").alias("leaf"),
        F.col("JUNCTION").cast("long").alias("junction"),
    )


@_q(
    "wcd_zone_agg",
    """
    WITH conns(well, k, op_sh, kh) AS (VALUES
        ('OP1', 1, 'OPEN', 10.0), ('OP1', 2, 'SHUT', 20.0),
        ('OP1', 3, 'SHUT', 30.0), ('AQ1', 1, 'OPEN', 5.0)),
    zmap(k, zone) AS (VALUES (1, 'UPPER'), (2, 'UPPER'), (3, 'LOWER'))
    SELECT c.well, z.zone,
           CAST(max(CASE WHEN c.op_sh = 'OPEN' THEN 1 ELSE 0 END) AS BIGINT) AS zone_open,
           CAST(round(coalesce(sum(CASE WHEN c.op_sh = 'OPEN' THEN c.kh END), 0.0), 2) AS DOUBLE) AS kh
    FROM conns c JOIN zmap z ON c.k = z.k
    WHERE c.well NOT LIKE 'AQ%'
    GROUP BY 1, 2
    """,
)
def wcd_zone_agg(spark, sf_dir):
    """Zone-aggregated completions (A4/J11/P8 —
    modules/wellcompletiondata; wellcompletiondata.py:129-215)."""
    from datetime import date as _d

    from res2df_spark.modules import wellcompletiondata

    d = _d(2020, 1, 1)
    conns = spark.createDataFrame(
        [("OP1", 1, 1, 1, "OPEN", d, 10.0), ("OP1", 1, 1, 2, "SHUT", d, 20.0),
         ("OP1", 1, 1, 3, "SHUT", d, 30.0), ("AQ1", 1, 1, 1, "OPEN", d, 5.0)],
        "WELL string, I int, J int, K int, OP_SH string, DATE date, KH double",
    )
    zonemap = spark.createDataFrame(
        [(1, "UPPER"), (2, "UPPER"), (3, "LOWER")], "K int, ZONE string"
    )
    out = wellcompletiondata.df(conns, zonemap, excl_well_prefix="AQ")
    return out.select(
        F.col("WELL").alias("well"),
        F.col("ZONE").alias("zone"),
        (F.col("`OP/SH`") == "OPEN").cast("long").alias("zone_open"),
        F.round("KH", 2).alias("kh"),
    )


_TRANS_GRID_SQL = """(VALUES
        (1, 1, 1, 100.0, 200.0, 10.0, 1, 5.0, 0.0, 2.0),
        (2, 1, 1, 200.0, 200.0, 10.0, 2, 0.0, 0.0, 3.0),
        (1, 1, 2, 100.0, 200.0, 20.0, 1, 4.0, CAST(NULL AS DOUBLE), 0.0),
        (2, 1, 2, 200.0, 200.0, 22.0, 2, 0.0, 0.0, 0.0))"""

_TRANS_FACES_SQL = """
    faces AS (
        SELECT i AS i1, j AS j1, k AS k1, i + 1 AS i2, j AS j2, k AS k2,
               'I' AS dir, tranx AS tran FROM grid WHERE tranx > 0
        UNION ALL
        SELECT i, j, k, i, j + 1, k, 'J', trany FROM grid WHERE trany > 0
        UNION ALL
        SELECT i, j, k, i, j, k + 1, 'K', tranz FROM grid WHERE tranz > 0
        UNION ALL
        SELECT * FROM (VALUES (1, 1, 1, 2, 1, 2, 'NNC', 0.7))),
    m AS (
        SELECT f.*, g1.fipnum AS fipnum1, g1.x AS x1, g1.y AS y1, g1.z AS z1,
               g2.fipnum AS fipnum2, g2.x AS x2, g2.y AS y2, g2.z AS z2
        FROM faces f
        JOIN grid g1 ON f.i1 = g1.i AND f.j1 = g1.j AND f.k1 = g1.k
        JOIN grid g2 ON f.i2 = g2.i AND f.j2 = g2.j AND f.k2 = g2.k)"""


def _trans_fixture(spark):
    grid = spark.createDataFrame(
        [(1, 1, 1, 100.0, 200.0, 10.0, 1, 5.0, 0.0, 2.0),
         (2, 1, 1, 200.0, 200.0, 10.0, 2, 0.0, 0.0, 3.0),
         (1, 1, 2, 100.0, 200.0, 20.0, 1, 4.0, None, 0.0),
         (2, 1, 2, 200.0, 200.0, 22.0, 2, 0.0, 0.0, 0.0)],
        "I int, J int, K int, X double, Y double, Z double, FIPNUM int, "
        "TRANX double, TRANY double, TRANZ double",
    )
    nnc = spark.createDataFrame(
        [(1, 1, 1, 2, 1, 2, 0.7)],
        "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRAN double",
    )
    return grid, nnc


@_q(
    "trans_nnc_union",
    f"""
    WITH grid(i, j, k, x, y, z, fipnum, tranx, trany, tranz) AS
        {_TRANS_GRID_SQL},
    {_TRANS_FACES_SQL}
    SELECT i1, j1, k1, i2, j2, k2, dir,
           CAST(round(tran, 3) AS DOUBLE) AS tran, fipnum1, fipnum2,
           CAST(round((x1 + x2) / 2, 3) AS DOUBLE) AS x,
           CAST(round((y1 + y2) / 2, 3) AS DOUBLE) AS y,
           CAST(round((z1 + z2) / 2, 3) AS DOUBLE) AS z,
           CAST(round(abs(x1 - x2), 3) AS DOUBLE) AS dx,
           CAST(round(abs(y1 - y2), 3) AS DOUBLE) AS dy,
           CAST(round(abs(z1 - z2), 3) AS DOUBLE) AS dz
    FROM m
    """,
)
def trans_nnc_union(spark, sf_dir):
    """Full trans composition with NNC union, vector merge and
    midpoint coords (modules/grid.trans_full; reference
    trans.df(addnnc=True, vectors=['FIPNUM'], coords=True),
    trans.py:104-177)."""
    from res2df_spark.modules.grid import trans_full

    grid, nnc = _trans_fixture(spark)
    out = trans_full(grid, vectors=["FIPNUM"], coords=True, nnc=nnc)
    return out.select(
        F.col("I1").alias("i1"), F.col("J1").alias("j1"),
        F.col("K1").alias("k1"), F.col("I2").alias("i2"),
        F.col("J2").alias("j2"), F.col("K2").alias("k2"),
        F.col("DIR").alias("dir"), F.round("TRAN", 3).alias("tran"),
        F.col("FIPNUM1").alias("fipnum1"), F.col("FIPNUM2").alias("fipnum2"),
        F.round("X", 3).alias("x"), F.round("Y", 3).alias("y"),
        F.round("Z", 3).alias("z"), F.round("DX", 3).alias("dx"),
        F.round("DY", 3).alias("dy"), F.round("DZ", 3).alias("dz"),
    )


@_q(
    "trans_group_nnc",
    f"""
    WITH grid(i, j, k, x, y, z, fipnum, tranx, trany, tranz) AS
        {_TRANS_GRID_SQL},
    {_TRANS_FACES_SQL}
    SELECT CAST(least(fipnum1, fipnum2) AS VARCHAR) || '-' ||
               CAST(greatest(fipnum1, fipnum2) AS VARCHAR) AS fipnumpair,
           CAST(round(sum(tran), 3) AS DOUBLE) AS tran,
           CAST(least(fipnum1, fipnum2) AS VARCHAR) AS fipnum1,
           CAST(greatest(fipnum1, fipnum2) AS VARCHAR) AS fipnum2
    FROM m WHERE fipnum1 <> fipnum2
    GROUP BY 1, 3, 4
    """,
)
def trans_group_nnc(spark, sf_dir):
    """Interface grouping over the composed trans frame — boundary
    filter + unordered-pair aggregation with the region pair
    reinstated as sorted strings (reference trans.py:179-219)."""
    from res2df_spark.modules.grid import trans_full

    grid, nnc = _trans_fixture(spark)
    out = trans_full(grid, vectors=["FIPNUM"], group=True, nnc=nnc)
    return out.select(
        F.col("FIPNUMPAIR").alias("fipnumpair"),
        F.round("TRAN", 3).alias("tran"),
        F.col("FIPNUM1").alias("fipnum1"), F.col("FIPNUM2").alias("fipnum2"),
    )


@_q(
    "wcd_connstatus_merge",
    """
    WITH compdat(well, i, j, k, op_sh, date_, kh) AS (VALUES
        ('OP1', 1, 1, 1, 'SHUT', DATE '2020-01-01', 10.0),
        ('OP1', 1, 1, 1, 'OPEN', DATE '2020-02-01', 12.0),
        ('OP1', 1, 1, 2, 'OPEN', DATE '2020-01-01', 20.0),
        ('OP2', 2, 2, 1, 'OPEN', DATE '2020-01-01', 7.0),
        ('OP3', 3, 3, 1, 'OPEN', DATE '2020-01-01', 9.0)),
    zmap(k, zone) AS (VALUES (1, 'UPPER'), (2, 'LOWER')),
    czoned AS (
        SELECT c.*, z.zone FROM compdat c LEFT JOIN zmap z ON c.k = z.k),
    cfirst AS (
        SELECT well, i, j, k, kh, zone FROM (
            SELECT *, row_number() OVER (
                PARTITION BY well, i, j, k ORDER BY date_, op_sh, kh) AS rn
            FROM czoned) WHERE rn = 1),
    conn(well, i, j, k, date_, op_sh) AS (VALUES
        ('OP1', 1, 1, 1, DATE '2020-01-01', 'OPEN'),
        ('OP1', 1, 1, 1, DATE '2020-02-01', 'SHUT'),
        ('OP1', 1, 1, 2, DATE '2020-02-01', 'OPEN'),
        ('OP3', 3, 3, 2, DATE '2020-01-01', 'OPEN')),
    merged AS (
        SELECT cs.well, cs.date_, cs.op_sh, cf.kh, cf.zone
        FROM conn cs LEFT JOIN cfirst cf
          ON cs.well = cf.well AND cs.i = cf.i AND cs.j = cf.j AND cs.k = cf.k
        UNION ALL
        SELECT well, date_, op_sh, kh, zone FROM czoned
        WHERE well NOT IN (SELECT DISTINCT well FROM conn)),
    filled AS (
        SELECT well, zone, date_, op_sh, coalesce(kh, 0.0) AS kh
        FROM merged WHERE zone IS NOT NULL)
    SELECT well, zone, date_ AS date,
           CAST(max(CASE WHEN op_sh = 'OPEN' THEN 1 ELSE 0 END) AS BIGINT)
               AS zone_open,
           CAST(round(coalesce(
               sum(CASE WHEN op_sh = 'OPEN' THEN kh END), 0.0), 2) AS DOUBLE)
               AS kh
    FROM filled GROUP BY 1, 2, 3
    """,
)
def wcd_connstatus_merge(spark, sf_dir):
    """J11 use_wellconnstatus merge (modules/wellcompletiondata.
    merge_connstatus; reference wellcompletiondata.py:168-215).  The
    fixture exercises every documented quirk: keep-FIRST compdat match
    (OP1 conn (1,1,1) has two compdat rows — the 2020-01 SHUT row's
    KH=10 wins for BOTH status events), anti-join fallback (OP2 absent
    from connstatus keeps its compdat rows), compdat-ignored-when-
    connstatus-exists (OP3's compdat conn (3,3,1) vanishes because OP3
    HAS connstatus rows), KH fillna(0) + NULL-ZONE drop (OP3's
    connstatus conn (3,3,2) has no compdat match)."""
    from datetime import date as _d

    from res2df_spark.modules import wellcompletiondata

    d1, d2 = _d(2020, 1, 1), _d(2020, 2, 1)
    conns = spark.createDataFrame(
        [("OP1", 1, 1, 1, "SHUT", d1, 10.0), ("OP1", 1, 1, 1, "OPEN", d2, 12.0),
         ("OP1", 1, 1, 2, "OPEN", d1, 20.0), ("OP2", 2, 2, 1, "OPEN", d1, 7.0),
         ("OP3", 3, 3, 1, "OPEN", d1, 9.0)],
        "WELL string, I int, J int, K int, OP_SH string, DATE date, KH double",
    )
    connstatus = spark.createDataFrame(
        [("OP1", 1, 1, 1, d1, "OPEN"), ("OP1", 1, 1, 1, d2, "SHUT"),
         ("OP1", 1, 1, 2, d2, "OPEN"), ("OP3", 3, 3, 2, d1, "OPEN")],
        "WELL string, I int, J int, K int, DATE date, `OP/SH` string",
    )
    zonemap = spark.createDataFrame(
        [(1, "UPPER"), (2, "LOWER")], "K int, ZONE string"
    )
    out = wellcompletiondata.df(conns, zonemap, connstatus=connstatus)
    return out.select(
        F.col("WELL").alias("well"),
        F.col("ZONE").alias("zone"),
        F.col("DATE").cast("timestamp").alias("date"),
        (F.col("`OP/SH`") == "OPEN").cast("long").alias("zone_open"),
        F.round("KH", 2).alias("kh"),
    )


# ---------------------------------------------------------------------------
# A9 — hierarchical rollup (free from Spark/Catalyst; the reference has no
# grouping sets — SURVEY §2.5 note — so this is engine surplus the oracle
# still verifies)
# ---------------------------------------------------------------------------


@_q(
    "a9_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a9_rollup(spark, sf_dir):
    """Hierarchical ROLLUP aggregation — subtotals + grand total in one
    pass (Spark `rollup()`; partial aggregation applies at every level)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Pillar statistics + contact estimation under oracle check (A1/A2)
# ---------------------------------------------------------------------------

_GRID_ROWS = [
    # (i, j, k, fipnum, z, volume, porv, swat)
    (1, 1, 1, 1, 10.0, 100.0, 25.0, 0.2),
    (1, 1, 2, 1, 20.0, 110.0, 22.0, 0.3),
    (2, 1, 1, 2, 10.5, 120.0, 30.0, 0.6),
    (2, 1, 2, 2, 20.5, 130.0, 39.0, 0.7),
]
_GRID_SQL_VALUES = """(VALUES
        (1, 1, 1, 1, 10.0, 100.0, 25.0, 0.2),
        (1, 1, 2, 1, 20.0, 110.0, 22.0, 0.3),
        (2, 1, 1, 2, 10.5, 120.0, 30.0, 0.6),
        (2, 1, 2, 2, 20.5, 130.0, 39.0, 0.7))"""


def _grid_fixture(spark):
    return spark.createDataFrame(
        _GRID_ROWS,
        "I int, J int, K int, FIPNUM int, Z double, VOLUME double, PORV double, SWAT double",
    )


@_q(
    "pillar_stats",
    f"""
    WITH grid(i, j, k, fipnum, z, volume, porv, swat) AS {_GRID_SQL_VALUES}
    SELECT CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS pillar,
           CAST(round(sum(volume), 2) AS DOUBLE) AS volume_sum,
           CAST(round(sum(porv), 2) AS DOUBLE) AS porv_sum,
           CAST(round(avg(z), 4) AS DOUBLE) AS z_avg,
           CAST(round(sum(porv) / sum(volume), 6) AS DOUBLE) AS poro_wmean
    FROM grid GROUP BY 1
    """,
)
def pillar_stats(spark, sf_dir):
    """Per-pillar statistics with the AGGREGATORS map + volume-weighted
    porosity (A1 — modules/grid.pillar_stats; pillars.py:18-121)."""
    from res2df_spark.modules.grid import pillar_stats as _ps

    out = _ps(_grid_fixture(spark))
    return out.select(
        F.col("PILLAR").alias("pillar"),
        F.round("VOLUME_SUM", 2).alias("volume_sum"),
        F.round("PORV_SUM", 2).alias("porv_sum"),
        F.round("Z_AVG", 4).alias("z_avg"),
        F.round("PORO_WMEAN", 6).alias("poro_wmean"),
    )


@_q(
    "contact_estimate",
    f"""
    WITH grid(i, j, k, fipnum, z, volume, porv, swat) AS {_GRID_SQL_VALUES}
    SELECT CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS pillar,
           max(z) AS contact_z, count(*) AS n_cells
    FROM grid WHERE swat > 0.5 GROUP BY 1
    """,
)
def contact_estimate(spark, sf_dir):
    """Contact-depth estimation: DEEPEST cell above the saturation
    cutoff per pillar (the reference's max-Z contact construction,
    pillars.py:260-281), gated to pillars with any such cell (A2 —
    modules/grid.contact_estimate)."""
    from res2df_spark.modules.grid import contact_estimate as _ce

    out = _ce(_grid_fixture(spark), sat_col="SWAT", cutoff=0.5)
    return out.select(
        F.col("PILLAR").alias("pillar"),
        F.col("CONTACT_Z").alias("contact_z"),
        F.col("N_CELLS").alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting (north-star token budgeting)
# ---------------------------------------------------------------------------


@_q(
    "text_bpe_tokens",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                '''(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                x -> x <> '')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_tokens(spark, sf_dir):
    """BPE-ish regex token counts next to whitespace counts (north-star
    token budgeting; functions/textan.bpe_ish_tokens — GPT-2-style
    pretokenizer regex, codegen'd, no UDF)."""
    from res2df_spark.functions.textan import bpe_ish_tokens, tokens

    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.size(bpe_ish_tokens("text")).cast("long").alias("n_bpe_tokens"),
        F.size(tokens("text")).cast("long").alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# Composite curation pipeline: quality filter → exact dedup → near-dup
# removal — the end-to-end LLM-data-curation flow as ONE oracle-checked
# dataflow (each stage is individually verified elsewhere).
# ---------------------------------------------------------------------------

_TOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@_q(
    "curation_pipeline",
    f"""
    WITH scored AS (
        SELECT doc_id, text, len({_TOKS}) AS n_tokens,
               length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                   / CAST(length(text) AS DOUBLE) AS alpha_ratio
        FROM documents WHERE length(text) > 0),
    quality AS (
        SELECT doc_id, text FROM scored
        WHERE n_tokens >= 5 AND alpha_ratio >= 0.5),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    kept AS (
        SELECT q.doc_id, q.text FROM quality q
        JOIN exact_kept e ON q.doc_id = e.doc_id),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM kept),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh0 AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM sh s1 JOIN sh s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2),
    neardup_losers AS (
        SELECT DISTINCT d2 AS doc_id FROM shared
        JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
        WHERE n_shared / CAST(z1.sz + z2.sz - n_shared AS DOUBLE) >= 0.6)
    SELECT k.doc_id FROM kept k
    WHERE k.doc_id NOT IN (SELECT doc_id FROM neardup_losers)
    """,
)
def curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation: quality gate (≥5 tokens, ≥50% alpha)
    → exact dedup (md5 groups keep min id) → near-dup removal (3-gram
    Jaccard ≥ 0.6, higher doc_id loses).  One dataflow chaining the
    individually-verified operators; returns surviving doc ids."""
    from res2df_spark.functions.textan import tokens
    from res2df_spark.llm.dedup import exact_duplicates, ngram_jaccard_pairs

    docs = Catalog(spark, sf_dir).documents.filter(F.length("text") > 0)
    n_alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    quality = docs.filter(
        (F.size(tokens("text")) >= 5)
        & (n_alpha / F.length("text").cast("double") >= 0.5)
    ).select("doc_id", "text")
    keepers = exact_duplicates(quality).select(F.col("keeper_id").alias("doc_id"))
    kept = quality.join(keepers, "doc_id")
    losers = (
        ngram_jaccard_pairs(kept, threshold=0.6, shingle_k=3)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )
    return kept.join(losers, "doc_id", "left_anti").select("doc_id")


# ---------------------------------------------------------------------------
# Dedup cluster resolution: near-dup pairs → connected components
# ---------------------------------------------------------------------------


@_q(
    "dedup_clusters",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh0 AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM sh s1 JOIN sh s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2),
    e AS (SELECT d1, d2 FROM shared
          JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
          WHERE n_shared / CAST(z1.sz + z2.sz - n_shared AS DOUBLE) >= 0.6),
    bidir AS (SELECT d1 AS a, d2 AS b FROM e UNION SELECT d2, d1 FROM e),
    reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT a, b FROM bidir
            UNION
            SELECT r.a, bd.b FROM r JOIN bidir bd ON r.b = bd.a)
        SELECT * FROM r)
    SELECT d.doc_id,
           CAST(least(d.doc_id, coalesce(min(reach.b), d.doc_id)) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN reach ON reach.a = d.doc_id
    GROUP BY d.doc_id
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup pairs (3-gram Jaccard ≥ 0.6) resolved into clusters via
    iterative min-label propagation (llm/dedup.connected_components);
    every doc gets the min doc_id of its duplicate component
    (singletons label themselves).  Oracle: recursive-CTE reachability."""
    from res2df_spark.llm.dedup import connected_components, ngram_jaccard_pairs

    docs = Catalog(spark, sf_dir).documents
    pairs = ngram_jaccard_pairs(docs, threshold=0.6, shingle_k=3).select("d1", "d2")
    out = connected_components(pairs, docs.select("doc_id"))
    return out.select("doc_id", F.col("cluster_id").cast("long").alias("cluster_id"))


# ---------------------------------------------------------------------------
# FAULTS box explode (modules/faults.py: R2 over the deck parser)
# ---------------------------------------------------------------------------

_FAULTS_DECK = """
FAULTS
  'F1' 1 2 1 1 1 3 'X' /
  'F2' 4 4 2 3 1 1 'Y-' /
/
FAULTS
  'F1' 7 7 7 7 1 2 'Z' /
/
"""


@_q(
    "faults_unroll",
    """
    WITH expected(name, i, j, k, face) AS (VALUES
        ('F1', 1, 1, 1, 'X'), ('F1', 1, 1, 2, 'X'), ('F1', 1, 1, 3, 'X'),
        ('F1', 2, 1, 1, 'X'), ('F1', 2, 1, 2, 'X'), ('F1', 2, 1, 3, 'X'),
        ('F2', 4, 2, 1, 'Y-'), ('F2', 4, 3, 1, 'Y-'),
        ('F1', 7, 7, 1, 'Z'), ('F1', 7, 7, 2, 'Z'))
    SELECT name, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(k AS INT) AS k, face
    FROM expected
    """,
)
def faults_unroll(spark, sf_dir):
    """FAULTS records (two keyword instances, concatenated like the
    reference's multi-keyword loop) unrolled to per-cell rows through
    the R2 nested explode(sequence) — no shuffle, no driver product
    loop.  Oracle: hand-derived expected cell table."""
    from res2df_spark.modules import faults

    out = faults.df(spark, _FAULTS_DECK)
    return out.select(
        F.col("NAME").alias("name"), F.col("I").alias("i"),
        F.col("J").alias("j"), F.col("K").alias("k"),
        F.col("FACE").alias("face"),
    )


# ---------------------------------------------------------------------------
# WCON* state machine (modules/wcon.py: W1 date cursor + R9 tagged union)
# ---------------------------------------------------------------------------

_WCON_DECK = """
START
  1 JAN 2020 /
WCONPROD
  'OP1' 'OPEN' 'ORAT' 1000.0 2* 5 /
/
DATES
  1 FEB 2020 /
/
WCONHIST
  'OP1' 'OPEN' 'ORAT' 1200.0 50.0 /
/
WCONINJE
  'WI1' 'WATER' 'OPEN' 'RATE' 3000.0 /
/
TSTEP
  28 /
WCONINJH
  'WI2' 'WATER' 'OPEN' 2500.0 250.0 /
/
"""


@_q(
    "wcon_pipeline",
    """
    -- defaulted control items carry the opm schema defaults
    -- (WCONPROD BHP 1.01325, WCONHIST BHP 0, WCONINJE BHP 6895,
    -- WCONINJH CMODE 'RATE'), exactly like the reference via opm
    WITH expected(d, keyword, well, status, cmode, orat, rate, bhp) AS (VALUES
        (DATE '2020-01-01', 'WCONPROD', 'OP1', 'OPEN', 'ORAT',
         1000.0, NULL, 1.01325),
        (DATE '2020-02-01', 'WCONHIST', 'OP1', 'OPEN', 'ORAT',
         1200.0, NULL, 0.0),
        (DATE '2020-02-01', 'WCONINJE', 'WI1', 'OPEN', 'RATE',
         NULL, 3000.0, 6895.0),
        (DATE '2020-02-29', 'WCONINJH', 'WI2', 'OPEN', 'RATE',
         NULL, 2500.0, 250.0))
    SELECT CAST(d AS TIMESTAMP) AS d, keyword, well, status, cmode,
           CAST(orat AS DOUBLE) AS orat, CAST(rate AS DOUBLE) AS rate,
           CAST(bhp AS DOUBLE) AS bhp
    FROM expected
    """,
)
def wcon_pipeline(spark, sf_dir):
    """WCONHIST/WCONINJE/WCONINJH/WCONPROD records stamped with the
    running date cursor (START + DATES + a TSTEP advance, leap-year
    2020-02-01+28d = 2020-02-29) and tagged by keyword — the reference's
    driver-side state machine (wcon.py:26-64) as one ffill window over
    an R9 union.  Oracle: hand-derived expected control table."""
    from res2df_spark.modules import wcon

    out = wcon.df(spark, _WCON_DECK)
    return out.select(
        F.col("DATE").cast("timestamp").alias("d"),
        F.col("KEYWORD").alias("keyword"), F.col("WELL").alias("well"),
        F.col("STATUS").alias("status"), F.col("CMODE").alias("cmode"),
        F.col("ORAT").alias("orat"), F.col("RATE").alias("rate"),
        F.col("BHP").alias("bhp"),
    )


# ---------------------------------------------------------------------------
# Binary Eclipse summary round-trip (sources/eclbin.py: S2 + K7).
# The wide frame is DERIVED FROM THE orders PARQUET (a deterministic
# monthly aggregate), so although DuckDB cannot read SMSPEC/UNSMRY, it
# CAN recompute what the round-trip must return: write→re-read is the
# identity up to float32 (PARAMS are REAL records), which plain SQL
# expresses as CAST(... AS REAL) over the same aggregate.
# ---------------------------------------------------------------------------


@_q(
    "eclbin_summary_roundtrip",
    """
    WITH agg AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(count(*) AS DOUBLE) AS fopt,
               max(o_totalprice) AS wopr
        FROM orders GROUP BY 1 ORDER BY m LIMIT 4)
    SELECT CAST(m AS TIMESTAMP) AS d, 'FOPT' AS vector,
           CAST(CAST(fopt AS REAL) AS DOUBLE) AS value FROM agg
    UNION ALL
    SELECT CAST(m AS TIMESTAMP) AS d, 'WOPR:OP1' AS vector,
           CAST(CAST(wopr AS REAL) AS DOUBLE) AS value FROM agg
    """,
)
def eclbin_summary_roundtrip(spark, sf_dir):
    """K7 write → S2 read fixed point on the pure-numpy binary layer:
    a deterministic monthly aggregate of ``orders`` (order count as a
    cumulative-style vector, max o_totalprice as a rate-style vector)
    is written as SMSPEC+UNSMRY (Fortran-blocked REAL records, colon
    vector naming) and read back to the long model.  The oracle
    recomputes the same aggregate in SQL with a float32 cast — green
    means the binary write→read is the identity on (DATE, VECTOR,
    VALUE), not merely that rows came back."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from res2df_spark.sources.eclbin import summary_long, write_summary

    months = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("fopt"),
            F.max("o_totalprice").alias("wopr"),
        )
        .orderBy("m")
        .limit(4)
        .collect()  # 4 rows — driver-side writer boundary, like all K* sinks
    )
    wide = pd.DataFrame(
        {
            "FOPT": [r["fopt"] for r in months],
            "WOPR:OP1": [r["wopr"] for r in months],
        },
        index=pd.to_datetime([r["m"] for r in months]),
    )
    d = tempfile.mkdtemp(prefix="eclbin_rt_")
    path = os.path.join(d, "CASE.SMSPEC")
    start = wide.index[0].to_pydatetime()
    write_summary(path, datetime.datetime(start.year, start.month, start.day), wide)
    out = summary_long(spark, path)
    return out.select(
        F.col("DATE").alias("d"), F.col("VECTOR").alias("vector"),
        F.col("VALUE").alias("value"),
    ).orderBy("d", "vector")


# ---------------------------------------------------------------------------
# RFT derived columns (reference rft.py:463-508 add_extras) — guarded
# column arithmetic over a distributed frame, no shuffle.
# ---------------------------------------------------------------------------


@_q(
    "rft_extras",
    """
    WITH src AS (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / 1000.0 AS conpres,
               l_discount * 100.0 AS segpres,
               l_tax * 1000.0 AS pressure,
               l_quantity AS conlenst,
               l_quantity + l_linenumber AS conlenen,
               l_extendedprice AS conorat
        FROM lineitem)
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(CASE WHEN conpres > 0 AND segpres > 0
                     THEN conpres - segpres ELSE 0 END AS DOUBLE)
               AS completion_dp,
           CAST(CASE WHEN conpres > 0 THEN pressure - conpres
                     ELSE 0 END AS DOUBLE) AS drawdown,
           CAST(0.5 * (conlenst + conlenen) AS DOUBLE) AS conmd,
           CAST(conlenen - conlenst AS DOUBLE) AS conlenth,
           CAST(CASE WHEN conlenen - conlenst <> 0
                     THEN conorat / (conlenen - conlenst) END AS DOUBLE)
               AS conorats
    FROM src
    """,
)
def rft_extras(spark, sf_dir):
    """RFT derived columns (reference rft.py:463-508): COMPLETION_DP /
    DRAWDOWN / CONMD / CONLENTH / per-length scaled rates as guarded
    column arithmetic — partition-local, fully codegen'd, zero
    shuffles; the synthetic frame maps lineitem columns onto the RFT
    vector names so the oracle can replicate the arithmetic exactly."""
    from res2df_spark.modules.rft import add_extras

    li = Catalog(spark, sf_dir).lineitem
    src = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") / 1000.0).alias("CONPRES"),
        (F.col("l_discount") * 100.0).alias("SEGPRES"),
        (F.col("l_tax") * 1000.0).alias("PRESSURE"),
        F.col("l_quantity").alias("CONLENST"),
        (F.col("l_quantity") + F.col("l_linenumber")).alias("CONLENEN"),
        F.col("l_extendedprice").alias("CONORAT"),
    )
    out = add_extras(src)
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("COMPLETION_DP").alias("completion_dp"),
        F.col("DRAWDOWN").alias("drawdown"),
        F.col("CONMD").alias("conmd"),
        F.col("CONLENTH").alias("conlenth"),
        F.col("CONORATS").alias("conorats"),
    )


# ---------------------------------------------------------------------------
# Segment keywords from a real deck (S1 extension — WELSEGS/COMPSEGS/
# WSEG* wired through compdat, reference compdat.py:145-212)
# ---------------------------------------------------------------------------

_SEG_DECK = """
DATES
  1 JAN 2020 /
/
WELSEGS
  'OP1' 1689.0 1923.0 1.0E-5 'ABS' 'HFA' 'HO' /
   2 3 1 1 1923.9 1689.0 0.1172 0.000015 /
   17 17 1 2 2600.0 1700.0 0.1172 0.000015 /
/
COMPSEGS
  'OP1' /
  41 125 29 1 2577.0 2616.298 4* 17 /
  42 125 29 1 2616.298 2630.0 4* 2 /
/
WSEGVALV
  'OP1' 17 0.85 7.43e-06 /
/
WSEGSICD
  'OP1' 2 2 0.001 /
/
"""


@_q(
    "compdat_segments",
    """
    WITH expected(well, i, j, k, segment_number, segment_md, valve_cv,
                  icd_strength, d) AS (VALUES
        ('OP1', 41, 125, 29, 17, 2600.0, 0.85, CAST(NULL AS DOUBLE),
         DATE '2020-01-01'),
        ('OP1', 42, 125, 29, 2, 1923.9, CAST(NULL AS DOUBLE), 0.001,
         DATE '2020-01-01'))
    SELECT well, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(k AS BIGINT) AS k,
           CAST(segment_number AS BIGINT) AS segment_number,
           segment_md, valve_cv, icd_strength, CAST(d AS TIMESTAMP) AS d
    FROM expected
    """,
)
def compdat_segments(spark, sf_dir):
    """Segment keywords end-to-end from an embedded deck (S1/J8):
    WELSEGS header merge + ABS measured depth + SEGMENT1–SEGMENT2
    unroll, COMPSEGS header-well inheritance, WSEGVALV/WSEGSICD device
    joins — the reference's deck2dfs frames chained into connection →
    segment → device rows (compdat.py:66-283, rft.py:376-460)."""
    from res2df_spark.modules import compdat

    out = compdat.icd_chain(spark, _SEG_DECK)
    return out.select(
        F.col("WELL").alias("well"),
        F.col("I").cast("long").alias("i"),
        F.col("J").cast("long").alias("j"),
        F.col("K").cast("long").alias("k"),
        F.col("SEGMENT_NUMBER").cast("long").alias("segment_number"),
        F.col("SEGMENT_MD").alias("segment_md"),
        F.col("VALVE_CV").alias("valve_cv"),
        F.col("ICD_STRENGTH").alias("icd_strength"),
        F.col("DATE").cast("timestamp").alias("d"),
    )


# ---------------------------------------------------------------------------
# Network trees (W7 extension — BRANPROP/NODEPROP families,
# reference gruptree.py:73-287)
# ---------------------------------------------------------------------------

_NET_DECK = """
DATES
  1 JAN 2000 /
/
GRUPTREE
 'TMPL_A' 'FIELD'/
/
BRANPROP
  'NODE_A'  'FIELD'  1 /
  'TMPL_A'  'NODE_A' 2 /
/
NODEPROP
  'FIELD'  20 /
  'TMPL_A'  2*  YES /
/
DATES
  1 FEB 2000 /
/
BRANPROP
  'NODE_B'  'FIELD'  3 /
  'TMPL_A'  'NODE_B' 4 /
/
"""


@_q(
    "gruptree_network",
    """
    WITH expected(d, child, keyword, parent, vfp_table, terminal_pressure)
    AS (VALUES
        (DATE '2000-01-01', 'FIELD', 'GRUPTREE', CAST(NULL AS VARCHAR),
         CAST(NULL AS INT), CAST(NULL AS DOUBLE)),
        (DATE '2000-01-01', 'TMPL_A', 'GRUPTREE', 'FIELD', NULL, NULL),
        (DATE '2000-01-01', 'FIELD', 'BRANPROP', NULL, NULL, 20.0),
        (DATE '2000-01-01', 'NODE_A', 'BRANPROP', 'FIELD', 1, NULL),
        (DATE '2000-01-01', 'TMPL_A', 'BRANPROP', 'NODE_A', 2, NULL),
        (DATE '2000-02-01', 'FIELD', 'BRANPROP', NULL, NULL, 20.0),
        (DATE '2000-02-01', 'NODE_A', 'BRANPROP', 'FIELD', 1, NULL),
        (DATE '2000-02-01', 'NODE_B', 'BRANPROP', 'FIELD', 3, NULL),
        (DATE '2000-02-01', 'TMPL_A', 'BRANPROP', 'NODE_B', 4, NULL))
    SELECT CAST(d AS TIMESTAMP) AS d, child, keyword, parent,
           CAST(vfp_table AS BIGINT) AS vfp_table, terminal_pressure
    FROM expected
    """,
)
def gruptree_network(spark, sf_dir):
    """Network-tree snapshots from an embedded deck (W7 full surface):
    both tree families with per-family snapshot dates, BRANPROP edge
    data (VFP_TABLE), NODEPROP node data (TERMINAL_PRESSURE) merged
    onto children, per-family roots — reference gruptree.py:73-287
    semantics, oracle = the hand-derived expected frame (identical to
    the reference's own test expectation)."""
    from res2df_spark.modules import gruptree

    out = gruptree.df(spark, _NET_DECK)
    return out.select(
        F.col("DATE").cast("timestamp").alias("d"),
        F.col("CHILD").alias("child"),
        F.col("KEYWORD").alias("keyword"),
        F.col("PARENT").alias("parent"),
        F.col("VFP_TABLE").cast("long").alias("vfp_table"),
        F.col("TERMINAL_PRESSURE").alias("terminal_pressure"),
    )


# ---------------------------------------------------------------------------
# ANN multi-probe LSH (recall fix for single-probe's near-hyperplane
# misses): each query also probes the Hamming-distance-1 buckets.
# ---------------------------------------------------------------------------

_ANN_MULTIPROBE_SQL = f"""
    WITH planes(pi, pv) AS (VALUES
        {_planes_sql()}),
    b AS (
        SELECT e.vec_id,
               string_agg(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p.pi) AS bucket
        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
    q0 AS (SELECT e.vec_id AS q_id, e.embedding AS qv, b.bucket
           FROM embeddings e JOIN b ON b.vec_id = e.vec_id WHERE e.vec_id < 8),
    q AS (
        SELECT q_id, qv,
               CASE WHEN j = 0 THEN bucket
                    ELSE substr(bucket, 1, j - 1)
                         || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
                         || substr(bucket, j + 1) END AS bucket
        FROM q0 CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS j)),
    cand AS (
        SELECT q.q_id, cb.vec_id, q.qv, e.embedding AS ev
        FROM q JOIN b cb ON cb.bucket = q.bucket
        JOIN embeddings e ON e.vec_id = cb.vec_id
        WHERE cb.vec_id <> q.q_id),
    expl AS (SELECT q_id, vec_id, qv, ev, unnest(generate_series(1, 64)) AS i FROM cand),
    dots AS (SELECT q_id, vec_id,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                    sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
             FROM expl GROUP BY 1, 2),
    ranked AS (SELECT q_id, vec_id, dot / (sqrt(nq) * sqrt(ne)) AS cosine,
                      row_number() OVER (PARTITION BY q_id
                          ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
               FROM dots)
    SELECT q_id, vec_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
"""


@_q("ann_lsh_multiprobe", _ANN_MULTIPROBE_SQL)
def ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-k (llm/similarity.py lsh_bucketed_topk with
    n_probes=8): queries probe their own bucket plus all 8 Hamming-1
    neighbours, fixing the single-probe recall cliff for vectors near a
    hyperplane; the corpus keeps one bucket per vector so the candidate
    join stays an equality join — only the 8-row query side fans out
    9×."""
    from res2df_spark.llm.similarity import lsh_bucketed_topk

    emb = Catalog(spark, sf_dir).embeddings
    out = lsh_bucketed_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=10, n_planes=8, n_probes=8
    )
    return out.select(
        "q_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# IVF approximate nearest neighbour — the data-adaptive scale path next
# to LSH: corpus quantized to trained k-means lists, queries probe their
# n_probe nearest lists.
# ---------------------------------------------------------------------------


def _ivf_centroids():
    """Centroids trained once at import on the sf0.01 sample (the scale
    the driver's correctness gate runs at) — deterministic Lloyd
    iterations, so the SQL oracle can embed them as literals."""
    import os

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        return None
    import pandas as pd

    from res2df_spark.llm.similarity import train_ivf_centroids

    df = pd.read_parquet(path).sort_values("vec_id")
    return train_ivf_centroids(df["embedding"].head(256).tolist(), n_centroids=16)


_IVF_CENTROIDS = _ivf_centroids()

if _IVF_CENTROIDS is not None:
    _CENT_SQL = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(_IVF_CENTROIDS)
    )

    _IVF_SQL = f"""
    WITH cents(ci, cv) AS (VALUES
        {_CENT_SQL}),
    dim(i) AS (SELECT unnest(generate_series(1, 64))),
    cd AS (
        SELECT e.vec_id, c.ci,
               sum((CAST(e.embedding[d.i] AS DOUBLE) - c.cv[d.i]) ^ 2) AS dist
        FROM embeddings e CROSS JOIN cents c CROSS JOIN dim d
        GROUP BY 1, 2),
    ranked_lists AS (
        SELECT vec_id, ci,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, ci) AS rn
        FROM cd),
    assign AS (SELECT vec_id, ci FROM ranked_lists WHERE rn = 1),
    probes AS (SELECT vec_id AS q_id, ci FROM ranked_lists
               WHERE rn <= 4 AND vec_id < 8),
    cand AS (
        SELECT p.q_id, a.vec_id, qe.embedding AS qv, e.embedding AS ev
        FROM probes p
        JOIN assign a ON a.ci = p.ci
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.q_id
        WHERE a.vec_id <> p.q_id),
    expl AS (SELECT q_id, vec_id, qv, ev, unnest(generate_series(1, 64)) AS i FROM cand),
    dots AS (SELECT q_id, vec_id,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                    sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
             FROM expl GROUP BY 1, 2),
    ranked AS (SELECT q_id, vec_id, dot / (sqrt(nq) * sqrt(ne)) AS cosine,
                      row_number() OVER (PARTITION BY q_id
                          ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
               FROM dots)
    SELECT q_id, vec_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
"""

    @_q("ann_ivf_topk", _IVF_SQL)
    def ann_ivf_topk(spark, sf_dir):
        """IVF approximate top-k (llm/similarity.py ivf_topk): corpus
        quantized to 16 trained k-means lists (deterministic Lloyd on
        the sf0.01 head — train_ivf_centroids), queries probe their 4
        nearest lists; scanned fraction ≈ 4/16 of the corpus vs LSH's
        oblivious buckets.  Distances and cosines are JVM
        higher-order-function folds; the oracle replicates list
        assignment from the same centroid literals."""
        from res2df_spark.llm.similarity import ivf_topk

        emb = Catalog(spark, sf_dir).embeddings
        out = ivf_topk(
            emb, emb.filter(F.col("vec_id") < 8), _IVF_CENTROIDS, k=10, n_probe=4
        )
        return out.select(
            "q_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rnk"),
        )


# ---------------------------------------------------------------------------
# Multimodal frame sampling (llm/multimodal.py sample_frames)
# ---------------------------------------------------------------------------

_FRAME_SQL = """
    WITH m AS (SELECT doc_id, text, length(text) AS n_chars FROM documents
               WHERE text IS NOT NULL AND length(text) > 0),
    f AS (SELECT doc_id, text,
                 CAST(ceil(n_chars / 32.0) AS BIGINT) AS n_frames FROM m),
    u AS (SELECT doc_id, text, n_frames,
                 unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
          FROM f)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, n_frames,
           CAST(octet_length(encode(substr(text, CAST(frame_idx * 32 + 1 AS BIGINT), 32))) AS BIGINT)
               AS frame_bytes,
           md5(substr(text, CAST(frame_idx * 32 + 1 AS BIGINT), 32)) AS frame_md5
    FROM u
"""


@_q("mm_frame_sample", _FRAME_SQL)
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling (north star): each payload splits into
    frames, every 4th is kept — one input row fans out to n rows inside
    ``mapInPandas`` (Arrow-batched, no giant array column).  The fake
    codec here frames on 32-char boundaries of the UTF-8 text so DuckDB
    (which cannot slice blobs) can replicate it with substr+md5; the
    byte-chunking default and a real demuxer share the same hook."""
    from res2df_spark.llm.multimodal import sample_frames

    def char_frames(payload: bytes) -> list[bytes]:
        s = payload.decode("utf-8")
        return [s[i : i + 32].encode("utf-8") for i in range(0, len(s), 32)]

    docs = Catalog(spark, sf_dir).documents
    src = docs.filter(F.col("text").isNotNull() & (F.length("text") > 0)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return sample_frames(src, every_n=4, splitter=char_frames)


# ---------------------------------------------------------------------------
# Structured Streaming operators, oracle-checked via AvailableNow replay
# (streaming/ops.py run_available_now): the streaming plan runs to
# completion on the finite table, so watermarked stateful semantics are
# comparable against plain SQL over the same file.
# ---------------------------------------------------------------------------

_STREAM_ROLLUP_SQL = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""


@_q("stream_windowed_rollup", _STREAM_ROLLUP_SQL)
def stream_windowed_rollup(spark, sf_dir):
    """Watermarked tumbling-window rollup (streaming A1 shape) replayed
    with Trigger.AvailableNow: identical plan a cluster would run
    unbounded — partial agg per micro-batch, per-(window,key) state,
    1-day tumbling windows aligned to UTC midnight = date_trunc."""
    from res2df_spark.streaming.ops import run_available_now, windowed_rollup_stream

    src = Catalog(spark, sf_dir).stream_table("events")
    agg = windowed_rollup_stream(
        src, "ts", ["event_type"], "value", window="1 day", watermark="1 day"
    )
    out = run_available_now(agg, name="stream_windowed_rollup")
    return out.select(
        F.col("window_start").alias("day"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total", 2).alias("sum_value"),
    )


_STREAM_DEDUP_SQL = """
    SELECT DISTINCT user_id FROM events
"""


@_q("stream_dedup", _STREAM_DEDUP_SQL)
def stream_dedup(spark, sf_dir):
    """Streaming exact dedup at ingest (dropDuplicatesWithinWatermark,
    llm-pipeline shape): state bounded by the watermark; replayed over
    the finite table the kept-key set equals DISTINCT.  Projecting to
    the key column makes the check deterministic regardless of which
    duplicate row the stream kept.

    Equivalence to DISTINCT holds only while every duplicate arrives
    within the watermark of the first occurrence — with a multi-file
    source replayed as several micro-batches, a key recurring beyond
    the watermark is LEGITIMATELY re-emitted (state for it has been
    evicted).  The watermark is therefore set above the events table's
    full time span (~7 years of order dates), making the oracle exact
    for any replay batching."""
    from res2df_spark.streaming.ops import dedup_stream, run_available_now

    src = Catalog(spark, sf_dir).stream_table("events").select("user_id", "ts")
    ded = dedup_stream(src, ["user_id"], "ts", watermark="10 years")
    out = run_available_now(ded, name="stream_dedup", output_mode="append")
    # no trailing distinct: if the streaming dedup ever emitted a
    # duplicate key, the extra row must FAIL the comparison
    return out.select(F.col("user_id").cast("long").alias("user_id"))


# ---------------------------------------------------------------------------
# Training-data curation operators (llm/curation.py)
# ---------------------------------------------------------------------------

#: DuckDB scalar for llm.curation.md5_bucket256: value of the first two
#: hex nibbles of md5(salt || id).
def _bucket256_sql(salt: str, id_expr: str = "doc_id") -> str:
    digest = f"md5('{salt}' || CAST({id_expr} AS VARCHAR))"
    nib = "strpos('0123456789abcdef', substr({d}, {i}, 1)) - 1"
    return (
        f"(({nib.format(d=digest, i=1)}) * 16 + ({nib.format(d=digest, i=2)}))"
    )


_SPLIT_SQL = f"""
    WITH b AS (SELECT doc_id, {_bucket256_sql('split')} AS bucket FROM documents)
    SELECT CASE WHEN bucket < 230 THEN 'train'
                WHEN bucket < 243 THEN 'val' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM b GROUP BY 1
"""


@_q("curation_split", _SPLIT_SQL)
def curation_split(spark, sf_dir):
    """Deterministic hash-based train/val/test split (llm/curation.py
    hash_split): content-hash bucketing, so assignment is reproducible
    across engines/runs/partitionings — verified by DuckDB re-deriving
    every bucket from the same md5."""
    from res2df_spark.llm.curation import hash_split

    docs = Catalog(spark, sf_dir).documents
    return (
        hash_split(docs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
    )


_CHUNK_SQL = """
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE text IS NOT NULL AND length(text) > 0),
    u AS (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 50, 1), 150)) AS s
          FROM d)
    SELECT doc_id, CAST((s - 1) / 150 AS BIGINT) AS chunk_idx,
           substr(text, CAST(s AS BIGINT), 200) AS chunk_text,
           CAST(length(substr(text, CAST(s AS BIGINT), 200)) AS BIGINT) AS chunk_chars
    FROM u
"""


@_q("doc_chunk_overlap", _CHUNK_SQL)
def doc_chunk_overlap(spark, sf_dir):
    """Overlapping document chunking for embedding pipelines
    (llm/curation.py doc_chunks): 200-char windows, 50-char overlap,
    sequence+explode entirely inside codegen."""
    from res2df_spark.llm.curation import doc_chunks

    docs = Catalog(spark, sf_dir).documents
    return doc_chunks(docs, chunk_chars=200, overlap=50)


_PII_SQL = """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                   '<EMAIL>', 'g'),
               '[0-9][0-9]{6,}')) AS BIGINT) AS n_longnums,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9][0-9]{6,}', '<NUM>', 'g') AS scrubbed
    FROM documents
"""


@_q("pii_scrub", _PII_SQL)
def pii_scrub_q(spark, sf_dir):
    """PII redaction with audit counts (llm/curation.py pii_scrub):
    regexp_count + nested regexp_replace, JVM codegen; patterns kept in
    the RE2∩Java-regex dialect so both engines agree."""
    from res2df_spark.llm.curation import pii_scrub

    docs = Catalog(spark, sf_dir).documents
    return pii_scrub(docs)


_PACK_SQL = f"""
    WITH t AS (SELECT doc_id,
                      coalesce(len({_TOKS_SQL}), 0) AS n_tokens,
                      {_bucket256_sql('pack')} % 8 AS shard
               FROM documents),
    w AS (SELECT doc_id, n_tokens, shard,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(shard AS BIGINT) AS shard,
           CAST(floor(before / 512.0) AS BIGINT) AS bin_id
    FROM w
"""


@_q("pack_sequences", _PACK_SQL)
def pack_sequences_q(spark, sf_dir):
    """Sharded deterministic sequence packing (llm/curation.py
    pack_sequences): the running token total — the one sequential
    dependency in curation — is confined to hash shards, each one
    window partition, so shard count bounds the serial work at 100 TB
    instead of a single global cumulative sum."""
    from res2df_spark.llm.curation import pack_sequences

    docs = Catalog(spark, sf_dir).documents
    return pack_sequences(docs, target_tokens=512, n_shards=8)


# ---------------------------------------------------------------------------
# RFT binary-layer ICD detection + CON⋈ICD⋈SEG merge (modules/rft.py,
# reference rft.py:196-460) — the oracle re-derives the topology, the
# ICD split and the chain merge in SQL from the same fixture.
# ---------------------------------------------------------------------------

_ICD_FIXTURE_SEG = [
    # tubing branch 1: 3 ← 2 ← 1 (wellhead); branches 2/3 are single
    # leaf ICD segments feeding tubing segments 3 and 2
    (1, None, 1, 1500.0),
    (2, 1, 1, 1550.0),
    (3, 2, 1, 1600.0),
    (10, 3, 2, 1601.0),
    (11, 2, 3, 1551.0),
]
_ICD_FIXTURE_CON = [(10, 250.0), (11, 240.0), (1, 230.0)]

_ICD_SQL = f"""
    WITH seg(segidx, segnxt, segbrno, segdepth) AS (VALUES
        {", ".join(f"({i}, {'NULL' if n is None else n}, {b}, {d})" for i, n, b, d in _ICD_FIXTURE_SEG)}),
    con(consegno, conpres) AS (VALUES
        {", ".join(f"({c}, {p})" for c, p in _ICD_FIXTURE_CON)}),
    incoming AS (SELECT s.segidx, count(t.segidx) AS n_in
                 FROM seg s LEFT JOIN seg t ON t.segnxt = s.segidx GROUP BY 1),
    topo AS (SELECT s.*, i.n_in = 0 AS leaf, i.n_in > 1 AS junction
             FROM seg s JOIN incoming i USING (segidx)),
    lonely AS (SELECT segbrno, count(*) = 1 AS lonelyseg FROM seg GROUP BY 1),
    dj AS (SELECT s.segidx, coalesce(t.junction, false) AS downstream_junction
           FROM topo s LEFT JOIN topo t ON s.segnxt = t.segidx),
    flags AS (SELECT topo.*, l.lonelyseg, dj.downstream_junction
              FROM topo JOIN lonely l USING (segbrno) JOIN dj USING (segidx)),
    grp AS (SELECT max(segbrno) > greatest(1, count(DISTINCT
                CASE WHEN NOT leaf OR downstream_junction THEN segbrno END))
            AS icd_present FROM flags),
    icd AS (SELECT f.* FROM flags f, grp
            WHERE grp.icd_present AND f.leaf AND f.lonelyseg),
    tub AS (SELECT f.* FROM flags f, grp
            WHERE NOT (grp.icd_present AND f.leaf AND f.lonelyseg)),
    with_icd AS (
        SELECT c.consegno, c.conpres, i.segidx AS icd_segidx,
               i.segdepth AS icd_segdepth, t.segidx AS segidx, t.segdepth
        FROM con c JOIN icd i ON c.consegno = i.segidx
        LEFT JOIN tub t ON i.segnxt = t.segidx),
    direct AS (
        SELECT c.consegno, c.conpres, NULL AS icd_segidx,
               NULL AS icd_segdepth, t.segidx, t.segdepth
        FROM con c JOIN tub t ON c.consegno = t.segidx
        WHERE c.consegno NOT IN (SELECT segidx FROM icd))
    SELECT CAST(consegno AS BIGINT) AS consegno,
           CAST(conpres AS DOUBLE) AS conpres,
           CAST(icd_segidx AS BIGINT) AS icd_segidx,
           CAST(icd_segdepth AS DOUBLE) AS icd_segdepth,
           CAST(segidx AS BIGINT) AS segidx,
           CAST(segdepth AS DOUBLE) AS segdepth
    FROM (SELECT * FROM with_icd UNION ALL SELECT * FROM direct)
"""


@_q("rft_icd_chain", _ICD_SQL)
def rft_icd_chain(spark, sf_dir):
    """ICD detection + connection-centric merge over RFT-shaped segment
    frames (modules/rft.py split_seg_icd/merge_icd_seg_conseg): branch
    counting decides ICD presence, lonely-leaf segments become ICDs,
    connections chain CON→ICD→tubing; the DuckDB oracle re-derives the
    whole flow relationally from the identical fixture."""
    from datetime import date as _d

    from res2df_spark.modules import rft

    seg = spark.createDataFrame(
        [("OP1", _d(2020, 1, 1), i, n, b, d) for i, n, b, d in _ICD_FIXTURE_SEG],
        "WELL string, DATE date, SEGIDX int, SEGNXT int, SEGBRNO int, SEGDEPTH double",
    )
    con = spark.createDataFrame(
        [("OP1", _d(2020, 1, 1), c, p) for c, p in _ICD_FIXTURE_CON],
        "WELL string, DATE date, CONSEGNO int, CONPRES double",
    )
    tubing, icd = rft.split_seg_icd(seg)
    out = rft.merge_icd_seg_conseg(con, tubing, icd)
    return out.select(
        F.col("CONSEGNO").cast("long").alias("consegno"),
        F.col("CONPRES").alias("conpres"),
        F.col("ICD_SEGIDX").cast("long").alias("icd_segidx"),
        F.col("ICD_SEGDEPTH").alias("icd_segdepth"),
        F.col("SEGIDX").cast("long").alias("segidx"),
        F.col("SEGDEPTH").alias("segdepth"),
    )


_SAMPLE_SQL = f"""
    SELECT doc_id FROM documents
    WHERE {_bucket256_sql('sample')} < 26
"""


@_q("curation_sample", _SAMPLE_SQL)
def curation_sample(spark, sf_dir):
    """Deterministic ~10% sample by content hash (llm/curation.py
    deterministic_sample): membership depends only on the id — stable
    across runs/partitionings/engines, verified by DuckDB re-deriving
    the exact member set."""
    from res2df_spark.llm.curation import deterministic_sample

    docs = Catalog(spark, sf_dir).documents
    return deterministic_sample(docs, fraction=0.1).select("doc_id")


_NEAR_DEDUP_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t WHERE len(toks) > 0),
    sig AS (SELECT doc_id, g.s AS s,
                   min(substr(md5(CAST(g.s // 4 AS VARCHAR) || ':' || token),
                              CAST(1 + 8 * (g.s % 4) AS INT), 8)) AS mh
            FROM tok, generate_series(0, 31) g(s) GROUP BY 1, 2),
    bands AS (SELECT doc_id, s // 4 AS band_idx, string_agg(mh, '|' ORDER BY s) AS band_key
              FROM sig GROUP BY 1, 2)
    SELECT DISTINCT CAST(band_idx AS BIGINT) AS band_idx, band_key FROM bands
"""


@_q("stream_near_dedup", _NEAR_DEDUP_SQL)
def stream_near_dedup(spark, sf_dir):
    """Streaming MinHash near-dup detection replayed with AvailableNow
    (streaming/ops.near_dedup_stream): the surviving band-claim KEY SET
    is order-independent (whichever doc claims a band first, the set of
    claimed keys is the distinct band keys of the corpus), so DuckDB
    re-derives it exactly from the same signature arithmetic."""
    from res2df_spark.streaming.ops import near_dedup_stream, run_available_now

    docs = Catalog(spark, sf_dir).stream_table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        # synthetic deterministic event time for the watermark
        F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id")).alias("ts"),
    )
    claims = near_dedup_stream(docs, watermark="10 years")
    out = run_available_now(claims, name="stream_near_dedup", output_mode="append")
    # no defensive distinct: the operator must emit each band key exactly
    # once — a duplicate claim should FAIL the comparison
    return out.select(F.col("band_idx").cast("long").alias("band_idx"), "band_key")


# ---------------------------------------------------------------------------
# Round-4 curation additions: benchmark decontamination, stratified
# sampling, intra-doc repetition removal, embedding quantization,
# incremental near-dup (llm/curation.py, llm/dedup.py, llm/similarity.py).
# ---------------------------------------------------------------------------

_SHINGLE_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx)
"""


@_q(
    "decontaminate",
    _SHINGLE_SQL
    + """
    , bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    docsh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS contamination,
           sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE) >= 0.05 AS is_contaminated
    FROM docsh d LEFT JOIN bench b ON d.shingle = b.shingle
    GROUP BY d.doc_id
    """,
)
def decontaminate(spark, sf_dir):
    """Benchmark decontamination (llm/curation.contamination_check):
    3-gram overlap of every corpus document against a held-out
    benchmark subset (doc_id % 97 == 0), benchmark shingle set
    broadcast, flagged at 5% overlap.  The training-corpus hygiene
    check every eval-trustworthy pipeline runs before training."""
    from res2df_spark.llm.curation import contamination_check

    docs = Catalog(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    rest = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_check(rest, bench, shingle_k=3, threshold=0.05)


@_q(
    "curation_stratified",
    """
    SELECT doc_id, lang FROM documents
    WHERE (strpos('0123456789abcdef', substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5('strat' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
          < CASE lang WHEN 'en' THEN 64 WHEN 'de' THEN 256
                      WHEN 'fr' THEN 128 WHEN 'zh' THEN 179 ELSE 0 END
    """,
)
def curation_stratified(spark, sf_dir):
    """Stratified deterministic sampling toward a target language mix
    (llm/curation.stratified_sample): en downsampled to 25%, fr to
    50%, zh to ~70%, de kept whole, es (absent from the recipe)
    dropped.  Membership is a pure function of (doc_id, lang) — the
    oracle re-derives the identical sample from the same md5 bucket
    arithmetic."""
    from res2df_spark.llm.curation import stratified_sample

    docs = Catalog(spark, sf_dir).documents
    out = stratified_sample(
        docs, "lang", {"en": 0.25, "de": 1.0, "fr": 0.5, "zh": 0.7}
    )
    return out.select("doc_id", "lang")


@_q(
    "dedup_segments",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS segs FROM documents),
    idx AS (SELECT doc_id, segs, unnest(generate_series(1, len(segs))) AS i FROM t),
    e AS (SELECT doc_id, segs[i] AS seg, i FROM idx),
    firsts AS (SELECT doc_id, seg, min(i) AS fi, count(*) AS n
               FROM e GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_segments,
           CAST(count(*) AS BIGINT) AS n_unique,
           string_agg(seg, ' ' ORDER BY fi) AS dedup_text
    FROM firsts GROUP BY doc_id
    """,
)
def dedup_segments(spark, sf_dir):
    """Intra-document repetition removal
    (llm/dedup.remove_repeated_segments): exact repeated segments
    (whitespace-delimited here; lines/paragraphs in a real corpus)
    dropped keeping the FIRST occurrence in order — map-only
    split → array_distinct → array_join.  The oracle rebuilds the
    first-occurrence ordering explicitly (min position per segment),
    pinning array_distinct's order-preservation."""
    from res2df_spark.llm.dedup import remove_repeated_segments

    docs = Catalog(spark, sf_dir).documents
    # the documents corpus is whitespace-delimited word soup: segment
    # on single spaces to exercise real repeats at sf0.01
    return remove_repeated_segments(docs, sep=" ")


@_q(
    "emb_quantize",
    """
    WITH b AS (SELECT vec_id, embedding,
                      CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS lo,
                      CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS hi
               FROM embeddings)
    SELECT vec_id,
           array_to_string(
               list_transform(embedding,
                   x -> CASE WHEN x IS NULL
                               OR NOT isfinite(CAST(x AS DOUBLE)) THEN NULL
                             WHEN hi = lo THEN 0
                             WHEN NOT isfinite(hi - lo) THEN NULL
                             ELSE CAST(floor((CAST(x AS DOUBLE) - lo) * 255.0
                                             / (hi - lo) + 0.5) AS INT) END),
               ',') AS codes_csv,
           lo, hi
    FROM b
    """,
)
def emb_quantize(spark, sf_dir):
    """Per-vector min-max uint8 quantization
    (llm/similarity.quantize_embeddings): the 4x index-memory lever for
    ANN at corpus scale, map-only, engine-portable double arithmetic —
    the oracle reproduces the exact codes.  Codes compared as a CSV
    string (unambiguous across engines' array renderings)."""
    from res2df_spark.llm.similarity import quantize_embeddings

    emb = Catalog(spark, sf_dir).embeddings
    out = quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.array_join(F.col("codes"), ",").alias("codes_csv"),
        "lo",
        "hi",
    )


_BANDS16_ALL_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    sig AS (SELECT doc_id, g.s AS s,
                   min(substr(md5(CAST(g.s // 4 AS VARCHAR) || ':' || shingle),
                              CAST(1 + 8 * (g.s % 4) AS INT), 8)) AS mh
            FROM sh, generate_series(0, 15) g(s) GROUP BY 1, 2),
    bands AS (SELECT doc_id, s // 4 AS band_idx, string_agg(mh, '|' ORDER BY s) AS band_key
              FROM sig GROUP BY 1, 2)
"""


@_q(
    "dedup_incremental",
    _BANDS16_ALL_SQL
    + """
    , index_keys AS (SELECT DISTINCT band_idx, band_key FROM bands
                     WHERE doc_id % 2 = 0),
    newb AS (SELECT doc_id, band_idx, band_key FROM bands WHERE doc_id % 2 = 1),
    scored AS (
        SELECT n.doc_id,
               CAST(count(*) AS BIGINT) AS bands_total,
               CAST(sum(CASE WHEN k.band_key IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS bands_hit
        FROM newb n LEFT JOIN index_keys k
             ON n.band_idx = k.band_idx AND n.band_key = k.band_key
        GROUP BY n.doc_id)
    SELECT d.doc_id,
           coalesce(s.bands_total, 0) AS bands_total,
           coalesce(s.bands_hit, 0) AS bands_hit,
           CASE WHEN s.bands_total IS NOT NULL
                THEN s.bands_hit < s.bands_total END AS is_novel
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN scored s USING (doc_id)
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental near-dup (llm/dedup.minhash_novelty): odd doc_ids
    arrive as a new batch and are scored against the persisted band
    index of the even-id corpus — the corpus is never rescanned, the
    property that makes daily-ingest dedup feasible at 100 TB.  Batch
    analogue of the streaming claim model.

    Round 12: both halves live in ONE table here, so the signature is
    computed in ONE tokenize→digest pass over all documents, tagged
    with the batch parity carried THROUGH the signature aggregate
    (min(doc_id%2) — branch-side doc_id%2 filters would be pushed
    below the aggregate by Catalyst / inferred into the scans by the
    restore join's constraint, re-splitting the plan into two full
    lineages: measured on the first attempt, whose index branch ended
    up signing the WHOLE corpus).  Instead of splitting bands into
    index/probe frames at all, ONE tagged-union aggregate per
    (band_idx, band_key) computes `has_even` (max over the parity tag)
    and collects the odd members — the same pattern as
    dedup_simhash_pairs_xx's invariant lane, and the same per-band-key
    membership-array exposure minhash_lsh_candidates' bucket
    enumeration already accepts for this data family.  This also
    removes the CORPUS-SIZED BroadcastExchange of the distinct band
    index that the two-frame form built (a broadcast that grows with
    the corpus — the retention_grid class of scale hazard); per-doc
    scoring is row-identical because a band row hits iff its exact
    (band_idx, band_key) exists among even docs' bands — exactly the
    oracle's join."""
    from res2df_spark.llm.dedup import _minhash_bands

    docs = Catalog(spark, sf_dir).documents
    bands = _minhash_bands(
        docs, "doc_id", "text", 16, 4, 3, tag=F.col("doc_id") % 2,
    )
    per_key = bands.groupBy("band_idx", "band_key").agg(
        F.max(F.when(F.col("__tag") == 0, 1).otherwise(0)).alias("__hit"),
        F.collect_list(
            F.when(F.col("__tag") == 1, F.col("doc_id"))
        ).alias("__odds"),
    )
    scored = (
        per_key.select(F.explode("__odds").alias("doc_id"), "__hit")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("bands_total"),
            F.sum("__hit").cast("long").alias("bands_hit"),
        )
    )
    new_ids = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    return new_ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("bands_total"), F.lit(0)).cast("long").alias("bands_total"),
        F.coalesce(F.col("bands_hit"), F.lit(0)).cast("long").alias("bands_hit"),
        F.when(
            F.col("bands_total").isNotNull(),
            F.col("bands_hit") < F.col("bands_total"),
        ).alias("is_novel"),
    )


@_q(
    "quality_gate",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    m AS (SELECT doc_id,
                 len(toks) AS n,
                 CASE WHEN len(toks) > 0
                      THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                           / len(toks) END AS mean_len,
                 CASE WHEN len(toks) > 0
                      THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                           / len(toks) END AS dup_frac,
                 CASE WHEN length(text) > 0
                      THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                                AS DOUBLE) / length(text) END AS alpha
          FROM t),
    r AS (SELECT doc_id, n, mean_len, dup_frac, alpha,
                 CASE WHEN n < 30 OR n > 100000 THEN 1 ELSE 0 END
               + CASE WHEN mean_len IS NULL OR mean_len < 2.0 OR mean_len > 10.0
                      THEN 2 ELSE 0 END
               + CASE WHEN coalesce(dup_frac > 0.6, FALSE) THEN 4 ELSE 0 END
               + CASE WHEN alpha IS NULL OR alpha < 0.6 THEN 8 ELSE 0 END AS mask
          FROM m)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(round(mean_len, 6) AS DOUBLE) AS mean_token_len,
           CAST(round(dup_frac, 6) AS DOUBLE) AS dup_token_frac,
           CAST(round(alpha, 6) AS DOUBLE) AS alpha_ratio,
           CAST(mask AS INT) AS reject_mask, mask = 0 AS keep
    FROM r
    """,
)
def quality_gate(spark, sf_dir):
    """Document quality gate (llm/curation.quality_filter,
    Gopher/C4-rule lineage): token count, mean token length, token
    repetition and alphabetic ratio composed into a per-rule reject
    bitmask — the corpus-audit primitive (which rule rejects how much
    of which source).  Thresholds tuned so this corpus trips the
    repetition rule on real rows.  Map-only; metrics derive from
    integer counts so the oracle reproduces them bit-exactly."""
    from res2df_spark.llm.curation import quality_filter

    docs = Catalog(spark, sf_dir).documents
    return quality_filter(
        docs, min_tokens=30, max_dup_token_frac=0.6, min_alpha_ratio=0.6
    )


@_q(
    "quality_report",
    f"""
    WITH t AS (SELECT doc_id, source, text, {_TOKS_SQL} AS toks FROM documents),
    m AS (SELECT doc_id, source,
                 len(toks) AS n,
                 CASE WHEN len(toks) > 0
                      THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                           / len(toks) END AS mean_len,
                 CASE WHEN len(toks) > 0
                      THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                           / len(toks) END AS dup_frac,
                 CASE WHEN length(text) > 0
                      THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                                AS DOUBLE) / length(text) END AS alpha
          FROM t),
    r AS (SELECT source,
                 CASE WHEN n < 30 OR n > 100000 THEN 1 ELSE 0 END AS b0,
                 CASE WHEN mean_len IS NULL OR mean_len < 2.0 OR mean_len > 10.0
                      THEN 1 ELSE 0 END AS b1,
                 CASE WHEN coalesce(dup_frac > 0.6, FALSE) THEN 1 ELSE 0 END AS b2,
                 CASE WHEN alpha IS NULL OR alpha < 0.6 THEN 1 ELSE 0 END AS b3
          FROM m)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN b0 + b1 + b2 + b3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(b0) AS BIGINT) AS n_reject_len,
           CAST(sum(b1) AS BIGINT) AS n_reject_meanlen,
           CAST(sum(b2) AS BIGINT) AS n_reject_rep,
           CAST(sum(b3) AS BIGINT) AS n_reject_alpha
    FROM r GROUP BY source
    """,
)
def quality_report(spark, sf_dir):
    """Corpus audit rollup (llm/curation.quality_report): per source,
    how many documents each quality rule rejects and the keep count —
    the dashboard a curation run is tuned against.  Map-only gate +
    one partial-aggregated groupBy on the low-cardinality source key."""
    from res2df_spark.llm.curation import quality_report as qr

    docs = Catalog(spark, sf_dir).documents
    return qr(docs, group_col="source",
              min_tokens=30, max_dup_token_frac=0.6, min_alpha_ratio=0.6)


@_q(
    "decontaminate_pairs",
    _SHINGLE_SQL
    + """
    , bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
    docsh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    sizes AS (SELECT doc_id, count(*) AS doc_shingles FROM docsh GROUP BY 1),
    pairs AS (SELECT d.doc_id, b.bench_id, count(*) AS n_shared
              FROM docsh d JOIN bench b USING (shingle)
              GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT p.doc_id, p.bench_id, CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST(s.doc_shingles AS BIGINT) AS doc_shingles,
           CAST(round(p.n_shared / CAST(s.doc_shingles AS DOUBLE), 6) AS DOUBLE)
               AS overlap_frac
    FROM pairs p JOIN sizes s USING (doc_id)
    """,
)
def decontaminate_pairs(spark, sf_dir):
    """Decontamination audit trail (llm/curation.contamination_pairs):
    per flagged corpus document, WHICH benchmark document it overlaps
    and by how much — benchmark shingles broadcast, pair aggregation
    bounded by true contamination, not corpus size."""
    from res2df_spark.llm.curation import contamination_pairs

    docs = Catalog(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    rest = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_pairs(rest, bench, shingle_k=3, min_shared=2)


@_q(
    "pack_texts",
    f"""
    WITH t AS (SELECT doc_id, text,
                      coalesce(len({_TOKS_SQL}), 0) AS n_tokens,
                      {_bucket256_sql('pack')} % 8 AS shard
               FROM documents),
    w AS (SELECT doc_id, text, n_tokens, shard,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM t)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(floor(before / 512.0) AS BIGINT) AS bin_id,
           string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS packed_text,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_id
    FROM w GROUP BY 1, 2
    """,
)
def pack_texts_q(spark, sf_dir):
    """Packed-sequence materialization (llm/curation.pack_texts): each
    (shard, bin) concatenates its documents in id order — the actual
    training sequences behind pack_sequences' bin assignment,
    order-deterministic on any partitioning or engine."""
    from res2df_spark.llm.curation import pack_texts

    docs = Catalog(spark, sf_dir).documents
    return pack_texts(docs, target_tokens=512, n_shards=8, sep="\n\n")


_SIMHASH_SIG_SQL = f"""
    WITH toks AS (SELECT DISTINCT doc_id,
                         unnest({_TOKS_SQL}) AS token FROM documents),
    votes AS (
        SELECT doc_id, g.b AS bit,
               CASE WHEN ((strpos('0123456789abcdef',
                                  substr(md5(token), CAST(g.b // 4 AS INT) + 1, 1)) - 1)
                          >> (3 - (g.b % 4))) & 1 = 1
                    THEN 1 ELSE -1 END AS vote
        FROM toks, generate_series(0, 63) g(b)),
    bitsum AS (SELECT doc_id, bit, sum(vote) AS votes FROM votes GROUP BY 1, 2),
    sigs AS (SELECT doc_id,
                    CAST(sum(CASE WHEN votes > 0
                             THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
             FROM bitsum GROUP BY doc_id)
"""


@_q(
    "dedup_simhash_pairs",
    _SIMHASH_SIG_SQL
    + """
    , u AS (SELECT doc_id, simhash,
                   CAST(simhash AS HUGEINT)
                   + CASE WHEN simhash < 0
                          THEN CAST('18446744073709551616' AS HUGEINT)
                          ELSE 0 END AS us
            FROM sigs),
    chunks AS (SELECT doc_id, simhash, d.i AS chunk_idx,
                      CAST((us // d.dv) % 65536 AS BIGINT) AS chunk_val
               FROM u, (VALUES (0, CAST(1 AS HUGEINT)),
                               (1, CAST(65536 AS HUGEINT)),
                               (2, CAST(4294967296 AS HUGEINT)),
                               (3, CAST(281474976710656 AS HUGEINT))) d(i, dv)),
    cand AS (SELECT c1.doc_id AS d1, c2.doc_id AS d2,
                    c1.simhash AS s1, c2.simhash AS s2
             FROM chunks c1 JOIN chunks c2 USING (chunk_idx, chunk_val)
             WHERE c1.doc_id < c2.doc_id GROUP BY 1, 2, 3, 4)
    SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairing (llm/dedup.simhash_near_pairs): 4-chunk
    pigeonhole buckets on the 64-bit signature — a pair within Hamming
    ≤ 3 must share a whole 16-bit chunk, so candidates are equality
    joins verified by bit_count(xor), never all-pairs."""
    from res2df_spark.llm.dedup import simhash_near_pairs

    docs = Catalog(spark, sf_dir).documents
    return simhash_near_pairs(docs, max_hamming=3)


@_q(
    "pack_shuffled",
    f"""
    WITH t AS (SELECT doc_id,
                      coalesce(len({_TOKS_SQL}), 0) AS n_tokens,
                      {_bucket256_sql('pack')} % 8 AS shard,
                      md5('epoch0' || CAST(doc_id AS VARCHAR)) AS ok
               FROM documents),
    w AS (SELECT doc_id, n_tokens, shard,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY ok, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(shard AS BIGINT) AS shard,
           CAST(floor(before / 512.0) AS BIGINT) AS bin_id
    FROM w
    """,
)
def pack_shuffled(spark, sf_dir):
    """Shuffled deterministic packing (llm/curation.pack_sequences with
    shuffle_salt): within-shard order is md5('epoch0' || id) — the
    scalable global shuffle before packing, so neighbouring source
    documents stop sharing bins; still a pure function of (id, salts)
    re-derivable by any engine, re-salted per epoch."""
    from res2df_spark.llm.curation import pack_sequences

    docs = Catalog(spark, sf_dir).documents
    return pack_sequences(docs, target_tokens=512, n_shards=8,
                          shuffle_salt="epoch0")


@_q(
    "emb_mean_pool",
    """
    WITH e AS (SELECT label, embedding FROM embeddings),
    idx AS (SELECT label, embedding,
                   unnest(generate_series(1, len(embedding))) AS pos FROM e),
    dims AS (SELECT label, pos, CAST(embedding[pos] AS DOUBLE) AS v FROM idx),
    -- a NULL element poisons its dimension (cluster_mean / mean_pool
    -- contract) and the denominator is the ROW count, so the oracle
    -- must not silently avg() past NULLs
    pooled AS (SELECT label, pos,
                      CASE WHEN count(v) = count(*)
                           THEN sum(v) / count(*) END AS m,
                      count(*) AS n
               FROM dims GROUP BY 1, 2)
    SELECT CAST(label AS BIGINT) AS label,
           string_agg(CAST(CAST(round(m, 6) AS DECIMAL(20, 6)) AS VARCHAR),
                      ',' ORDER BY pos) AS pooled_csv,
           CAST(min(n) AS BIGINT) AS n_vecs
    FROM pooled GROUP BY label
    """,
)
def emb_mean_pool(spark, sf_dir):
    """Element-wise mean pooling (llm/similarity.cluster_mean): per-label
    centroid of the embeddings table.  Label groups are corpus-sized
    (N/|labels| vectors), so this uses the partial-aggregatable
    cluster mean — per-task aggregation state is bounded at
    |labels|·dim pre-summed rows, never a whole group (mean_pool's
    collect_list form is reserved for chunks-of-one-document groups).
    Values rounded to 6dp and CSV-joined for engine-neutral
    comparison."""
    from res2df_spark.llm.similarity import cluster_mean

    emb = Catalog(spark, sf_dir).embeddings
    out = cluster_mean(emb, group_col="label")
    return out.select(
        F.col("label").cast("long").alias("label"),
        F.array_join(
            F.transform(
                "pooled",
                lambda x: F.round(x, 6).cast("decimal(20,6)").cast("string"),
            ),
            ",",
        ).alias("pooled_csv"),
        "n_vecs",
    )


# ---------------------------------------------------------------------------
# Round-4 (cont.) corpus-statistics and model-adjacent operators:
# tokenizer-building counts, TF-IDF keywords, boilerplate scoring,
# temperature source mixing, distributed k-means (llm/vocab.py,
# llm/curation.py, llm/similarity.py).
# ---------------------------------------------------------------------------

_TF_SQL = f"""
    WITH tf AS (SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
                GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
"""


@_q(
    "tfidf_topk",
    _TF_SQL
    + """
    , scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                        round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
                 FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (SELECT doc_id, term, tf, df, tfidf,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rnk
               FROM scored)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(tfidf AS DOUBLE) AS tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_topk(spark, sf_dir):
    """Per-document TF-IDF top-k keywords (llm/vocab.tfidf_topk): tf
    per (doc, term), df per term, score tf·ln(N/df), deterministic
    tie-break by term.  The relevance/keyword primitive for topic-mix
    audits; N rides as a broadcast single-row cross join, never a
    driver-side count."""
    from res2df_spark.llm.vocab import tfidf_topk as op

    docs = Catalog(spark, sf_dir).documents
    return op(docs, k=3)


@_q(
    "vocab_topk",
    f"""
    WITH c AS (SELECT term, count(*) AS n
               FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
               GROUP BY 1),
    total AS (SELECT sum(n) AS t FROM c),
    top AS (SELECT term, n FROM c ORDER BY n DESC, term LIMIT 20)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rank,
           term, CAST(n AS BIGINT) AS n,
           CAST(round(sum(n) OVER (ORDER BY n DESC, term
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      / (SELECT t FROM total), 6) AS DOUBLE) AS cum_coverage
    FROM top
    """,
)
def vocab_topk(spark, sf_dir):
    """Frequency-ranked vocabulary with cumulative coverage
    (llm/vocab.build_vocab): the tokenizer-budget curve.  The global
    cut is Spark's distributed TakeOrdered (never a full sort); only
    the 20 survivors see the ranking window."""
    from res2df_spark.llm.vocab import build_vocab

    docs = Catalog(spark, sf_dir).documents
    return build_vocab(docs, vocab_size=20)


@_q(
    "bpe_pairs",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
            FROM t WHERE len(toks) >= 2),
    p AS (SELECT toks[i] AS lft, toks[i+1] AS rgt FROM idx)
    SELECT lft AS left, rgt AS right, CAST(count(*) AS BIGINT) AS pair_count
    FROM p GROUP BY 1, 2
    ORDER BY pair_count DESC, lft, rgt LIMIT 100
    """,
)
def bpe_pairs(spark, sf_dir):
    """Adjacent-token-pair statistics (llm/vocab.bpe_pair_counts): one
    iteration of the BPE merge loop — the inner counting kernel of
    tokenizer training.  Pair fan-out inside codegen (transform over an
    index sequence), partial-aggregated groupBy, TakeOrdered cut with
    deterministic (count, left, right) tie-break."""
    from res2df_spark.llm.vocab import bpe_pair_counts

    docs = Catalog(spark, sf_dir).documents
    return bpe_pair_counts(docs, top_k=100)


@_q(
    "boilerplate_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 3)
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
           CAST(round(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS boilerplate_frac
    FROM sh s LEFT JOIN hot h ON s.shingle = h.shingle
    GROUP BY s.doc_id
    """,
)
def boilerplate_score(spark, sf_dir):
    """Per-document boilerplate fraction (llm/vocab.boilerplate_score):
    share of a document's 3-gram shingles that are corpus-hot (df > 3
    at this scale) — the RefinedWeb/CCNet template-text quality signal.
    The hot set is small by construction and broadcasts; the corpus
    never shuffles on the shingle for the scoring join."""
    from res2df_spark.llm.vocab import boilerplate_score as op

    docs = Catalog(spark, sf_dir).documents
    return op(docs, shingle_k=3, hot_df=3)


@_q(
    "temperature_mix",
    f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    r AS (SELECT lang, power(CAST(n AS DOUBLE), -0.5) AS ratio FROM c),
    thr AS (SELECT lang, CAST(round(256 * ratio / (SELECT max(ratio) FROM r))
                          AS BIGINT) AS threshold FROM r)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr USING (lang)
    WHERE {_bucket256_sql('mix')} < thr.threshold
    """,
)
def temperature_mix(spark, sf_dir):
    """Temperature-based source re-mixing
    (llm/curation.temperature_mix, alpha = 0.5): the multinomial
    temperature sampling of multilingual training recipes — the 'en'
    majority is thinned toward the flattened p^0.5 mix while the
    rarest language keeps everything.  Per-source rates derive from a
    kilobyte-sized count table broadcast back; membership is
    deterministic hash acceptance, re-derived bit-for-bit by the
    oracle."""
    from res2df_spark.llm.curation import temperature_mix as op

    docs = Catalog(spark, sf_dir).documents
    return op(docs, source_col="lang", alpha=0.5).select("doc_id", "lang")


@_q(
    "kmeans_assign",
    """
    WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
                      embedding AS cv
               FROM embeddings ORDER BY vec_id LIMIT 8),
    d AS (SELECT e.vec_id, c.centroid_id,
                 list_sum(list_transform(generate_series(1, len(e.embedding)),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))
                 AS sq_dist
          FROM embeddings e CROSS JOIN c),
    ranked AS (SELECT vec_id, centroid_id, sq_dist,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sq_dist, centroid_id) AS rn
               FROM d)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(centroid_id AS BIGINT) AS centroid_id,
           CAST(round(sq_dist, 6) AS DOUBLE) AS sq_dist
    FROM ranked WHERE rn = 1
    """,
)
def kmeans_assign(spark, sf_dir):
    """Nearest-centroid assignment (llm/similarity.assign_nearest), the
    inner step of distributed k-means (llm/similarity.kmeans_fit):
    centroids are the 8 lowest-id vectors (deterministic init),
    broadcast; squared-L2 argmin happens map-side with ties toward the
    lower centroid id.  The corpus never shuffles; the iterative fit
    (assignment + mean_pool per cluster, lineage-truncated per round)
    is pytest-verified for determinism and non-increasing inertia."""
    from res2df_spark.llm.similarity import assign_nearest

    emb = Catalog(spark, sf_dir).embeddings
    centroids = seed_centroids(emb, 8)
    out = assign_nearest(emb, centroids)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.round("sq_dist", 6).alias("sq_dist"),
    )


@_q(
    "semantic_dedup",
    """
    WITH stats AS (SELECT greatest(count(*) // 64, 8) AS k,
                          greatest(CAST(ceiling(sqrt(CAST(greatest(count(*) // 64, 8)
                                                          AS DOUBLE))) AS BIGINT),
                                   1) AS kc
                   FROM embeddings),
    ranked_c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
                        embedding AS cv
                 FROM embeddings),
    c AS (SELECT centroid_id, cv FROM ranked_c
          WHERE centroid_id < (SELECT k FROM stats)),
    coarse AS (SELECT centroid_id AS coarse_id, cv AS ccv FROM c
               WHERE centroid_id < (SELECT kc FROM stats)),
    fc_d AS (SELECT f.centroid_id, co.coarse_id,
                    list_sum(list_transform(generate_series(1, len(f.cv)),
                        i -> (CAST(f.cv[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))
                           * (CAST(f.cv[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))))
                    AS sq
             FROM c f CROSS JOIN coarse co),
    fc AS (SELECT centroid_id, coarse_id FROM (
             SELECT centroid_id, coarse_id,
                    row_number() OVER (PARTITION BY centroid_id
                                       ORDER BY sq, coarse_id) AS rn
             FROM fc_d) WHERE rn = 1),
    vc_d AS (SELECT e.vec_id, co.coarse_id,
                    list_sum(list_transform(generate_series(1, len(e.embedding)),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))
                           * (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))))
                    AS sq
             FROM embeddings e CROSS JOIN coarse co),
    vc AS (SELECT vec_id, coarse_id FROM (
             SELECT vec_id, coarse_id,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sq, coarse_id) AS rn
             FROM vc_d) WHERE rn = 1),
    vf_d AS (SELECT e.vec_id, f.centroid_id,
                    list_sum(list_transform(generate_series(1, len(e.embedding)),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))
                           * (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))))
                    AS sq
             FROM embeddings e
             JOIN vc ON vc.vec_id = e.vec_id
             JOIN fc ON fc.coarse_id = vc.coarse_id
             JOIN c f ON f.centroid_id = fc.centroid_id),
    a AS (SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sq, centroid_id) AS rn
            FROM vf_d) WHERE rn = 1),
    s AS (SELECT a.vec_id, a.centroid_id, e.embedding
          FROM a JOIN embeddings e USING (vec_id)),
    p AS (SELECT s1.centroid_id, s1.vec_id AS id_1, s2.vec_id AS id_2,
                 list_sum(list_transform(generate_series(1, len(s1.embedding)),
                     i -> CAST(s1.embedding[i] AS DOUBLE) * CAST(s2.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(generate_series(1, len(s1.embedding)),
                        i -> CAST(s1.embedding[i] AS DOUBLE) * CAST(s1.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(generate_series(1, len(s2.embedding)),
                        i -> CAST(s2.embedding[i] AS DOUBLE) * CAST(s2.embedding[i] AS DOUBLE)))))
                 AS cos
          FROM s s1 JOIN s s2 ON s1.centroid_id = s2.centroid_id
                             AND s1.vec_id < s2.vec_id)
    SELECT CAST(id_1 AS BIGINT) AS id_1, CAST(id_2 AS BIGINT) AS id_2,
           CAST(centroid_id AS BIGINT) AS centroid_id,
           CAST(round(cos, 6) AS DOUBLE) AS cos_sim
    FROM p WHERE cos >= 0.35
    """,
)
def semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic near-dup pairing
    (llm/similarity.semantic_dedup_pairs): embeddings are assigned to
    a centroid (lowest-id init vectors — deterministic), then
    cosine-similar pairs are enumerated ONLY within a cluster — an
    equality self-join on the cluster id, never all-pairs.  The cluster
    count scales with the corpus (k = max(N/64, 8), target cluster ~64)
    so pairwise cost is Σ|cluster|² ≈ N·64 — LINEAR in N.  The
    assignment is TWO-LEVEL (coarse ⌈√k⌉ lists, then fine within the
    probed list — the ivfpq_build composition) so assignment cost is
    O(N·√k) and nothing broadcast exceeds √k rows; a flat nearest-of-k
    scan would be O(N·k) = O(N²/64) with an O(N) broadcast — the one
    superlinear entry in SCALEPROBE_r04, now removed.  The oracle
    replicates the two-level semantics exactly (same lower-id
    tie-breaks at every level)."""
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = Catalog(spark, sf_dir).embeddings
    k = max(emb.count() // 64, 8)
    centroids = seed_centroids(emb, k)
    out = semantic_dedup_pairs(emb, centroids, threshold=0.35)
    return out.select(
        F.col("id_1").cast("long").alias("id_1"),
        F.col("id_2").cast("long").alias("id_2"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        "cos_sim",
    )


@_q(
    "mix_plan",
    f"""
    WITH per AS (SELECT lang, count(*) AS n_docs,
                        sum(coalesce(len({_TOKS_SQL}), 0)) AS n_tokens
                 FROM documents GROUP BY 1),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    w AS (SELECT lang, n_docs, n_tokens,
                 n_tokens / (SELECT t FROM tot) AS share,
                 power(n_tokens / (SELECT t FROM tot), 0.5) AS wgt
          FROM per),
    ws AS (SELECT sum(wgt) AS s FROM w)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(round(share, 6) AS DOUBLE) AS share,
           CAST(round(wgt / (SELECT s FROM ws), 6) AS DOUBLE) AS target_share,
           CAST(round(wgt / (SELECT s FROM ws) * 100000) AS BIGINT)
               AS planned_tokens
    FROM w
    """,
)
def mix_plan(spark, sf_dir):
    """Training-mixture planning table (llm/curation.mixture_plan,
    alpha = 0.5): per language, corpus token share, the
    temperature-flattened target share and the planned token
    allocation out of a 100k budget — the review artifact before
    temperature_mix moves any data.  One tiny groupBy + broadcast
    totals; kilobyte-sized at any corpus scale."""
    from res2df_spark.llm.curation import mixture_plan

    docs = Catalog(spark, sf_dir).documents
    return mixture_plan(docs, source_col="lang", alpha=0.5,
                        budget_tokens=100_000)


@_q(
    "split_leakage",
    f"""
    WITH u AS (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000 AS doc_id, text FROM documents
               WHERE doc_id % 10 = 0),
    b AS (SELECT doc_id, text, {_bucket256_sql('split')} AS bucket FROM u),
    s AS (SELECT doc_id, text,
                 CASE WHEN bucket < 230 THEN 'train'
                      WHEN bucket < 243 THEN 'val' ELSE 'test' END AS split
          FROM b)
    SELECT md5(text) AS text_md5,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
           string_agg(DISTINCT split, ',' ORDER BY split) AS splits
    FROM s GROUP BY md5(text) HAVING count(DISTINCT split) >= 2
    """,
)
def split_leakage(spark, sf_dir):
    """Cross-split leakage audit (llm/curation.split_leakage over
    hash_split): exact-duplicate texts whose different doc_ids hashed
    into different splits — training text silently leaking into eval.
    The corpus has no exact duplicates at this scale, so the query
    plants them (a re-keyed copy of every 10th document — the
    constructed-fixture pattern `decontaminate` also uses) and the
    audit must flag exactly the planted texts that crossed splits.
    One exact-dedup-shaped hash aggregation."""
    from res2df_spark.llm.curation import hash_split, split_leakage as op

    docs = Catalog(spark, sf_dir).documents
    dupes = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.select("doc_id", "text").unionByName(
        dupes.select("doc_id", "text")
    )
    return op(hash_split(corpus))


from res2df_spark.suite import ORACLES as _ORACLES  # noqa: E402  (reuse the batch gate's oracle verbatim)


@_q("stream_quality_gate", _ORACLES["quality_gate"])
def stream_quality_gate(spark, sf_dir):
    """The quality gate running AS A STREAM (streaming/ops.curate_stream
    over quality_gate's exact operator): map-only rule expressions are
    trigger-agnostic, so the identical bitmask logic curates documents
    at ingest — zero state, append mode, replayed with AvailableNow and
    checked against the SAME oracle SQL as the batch `quality_gate`
    query.  The streaming half of the ingest-then-curate pipeline."""
    from res2df_spark.streaming.ops import curate_stream, run_available_now

    src = Catalog(spark, sf_dir).stream_table("documents")
    gated = curate_stream(
        src, min_tokens=30, max_dup_token_frac=0.6, min_alpha_ratio=0.6
    )
    return run_available_now(
        gated, name="stream_quality_gate", output_mode="append"
    )


# ---------------------------------------------------------------------------
# Sessionization — gap-based batch (operators/sessionize.py) and native
# session_window streaming (streaming/ops.session_rollup_stream)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 6 * 3600

_SESSIONIZE_SQL = f"""
    WITH e AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= {_SESSION_GAP_S * 1_000_000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM e
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, session_id
"""


@_q("sessionize_events", _SESSIONIZE_SQL)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (inactivity timeout 6 h) + per-session
    rollup: lag flag → running sum → groupBy, all under ONE exchange on
    user_id (the groupBy reuses the window's hash partitioning).  The
    boundary compares integer microseconds, so the split decision is
    exact on any engine."""
    from res2df_spark.operators.sessionize import session_stats

    ev = Catalog(spark, sf_dir).events
    return session_stats(
        ev, "ts", ["user_id"], _SESSION_GAP_S,
        value_col="value", tiebreak=["event_id"], round_digits=2,
    )


_SESSIONIZE_CHUNKED_SQL = f"""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= {_SESSION_GAP_S * 1_000_000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
    FROM e
"""


@_q("sessionize_chunked", _SESSIONIZE_CHUNKED_SQL)
def sessionize_chunked_q(spark, sf_dir):
    """Skew-safe chunked sessionization (operators/sessionize.
    sessionize_chunked, round 6): the per-key running session count
    decomposed into (key, time-chunk) windows + a one-row halo + a
    chunk-grain prefix sum, so one hot key spreads over timeline/chunk
    tasks instead of pinning one window task.  chunk_seconds=12h (2×
    the 6h gap) forces MANY chunks and live halos at sf0.01; the oracle
    is the plain single-window recurrence — identical ids prove the
    decomposition exact."""
    from res2df_spark.operators.sessionize import sessionize_chunked

    ev = Catalog(spark, sf_dir).events
    # project FIRST (guide §2.3): with the input pre-narrowed to the
    # columns this query returns, the operator's chunk-grain offsets
    # branch references the full input column set and its union →
    # exchange subtree becomes canonically equal to the body branch's,
    # so ReuseExchange shares ONE scan + halo union between them
    # (scans 5 → 3 — see plans/r12/sessionize_chunked_after.txt)
    return sessionize_chunked(
        ev.select("user_id", "event_id", "ts"),
        "ts", ["user_id"], _SESSION_GAP_S,
        chunk_seconds=12 * 3600, tiebreak=["event_id"],
    ).select("user_id", "event_id", "ts", "session_id")


_STREAM_SESSIONS_SQL = f"""
    WITH e AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= {_SESSION_GAP_S * 1_000_000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM e
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 6 HOUR AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
"""


@_q("stream_sessions", _STREAM_SESSIONS_SQL)
def stream_sessions(spark, sf_dir):
    """Native session windows (``F.session_window``) under AvailableNow
    replay: per-user sessions with a 6 h inactivity gap; the emitted
    window is [first_ts, last_ts + gap).  The oracle re-derives the same
    sessions with batch gap-sessionization SQL — membership agrees
    because only overlapping [t, t+gap) windows merge (a gap of exactly
    6 h splits on both sides).  Single-parquet source replays as one
    micro-batch; complete output mode emits every closed session."""
    from res2df_spark.streaming.ops import run_available_now, session_rollup_stream

    src = Catalog(spark, sf_dir).stream_table("events")
    agg = session_rollup_stream(
        src, "ts", ["user_id"], "value", gap="6 hours", watermark="90 days"
    )
    return run_available_now(agg, name="stream_sessions")


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher filters) + cross-corpus duplicate
# n-gram spans (Lee et al. 2021 exact-substring accounting)
# ---------------------------------------------------------------------------

_REP_NGRAM_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    g3 AS (SELECT doc_id, toks,
                  unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
           FROM t),
    s3 AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
           FROM g3),
    d3 AS (SELECT doc_id, count(*) AS n, count(DISTINCT s) AS nd
           FROM s3 GROUP BY doc_id),
    g2 AS (SELECT doc_id, toks,
                  unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
           FROM t),
    s2 AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS s FROM g2),
    t2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS n
           FROM (SELECT doc_id, s, count(*) AS c FROM s2 GROUP BY doc_id, s)
           GROUP BY doc_id)
    SELECT d.doc_id,
           round(coalesce((d3.n - d3.nd) * 1.0 / d3.n, 0.0), 6) AS dup3_frac,
           round(coalesce(t2.mx * 1.0 / t2.n, 0.0), 6) AS top2_frac
    FROM documents d
    LEFT JOIN d3 USING (doc_id) LEFT JOIN t2 USING (doc_id)
"""


@_q("rep_ngram_stats", _REP_NGRAM_SQL)
def rep_ngram_stats(spark, sf_dir):
    """Gopher-style within-document repetition filters: duplicate
    3-gram fraction and top-2-gram coverage, both computed MAP-SIDE from
    the token array (array_distinct / sorted-run aggregate) — zero
    shuffles at any corpus size, where the naive formulation is an
    explode + per-doc groupBy.  The oracle IS that naive formulation."""
    from res2df_spark.functions.textan import with_repetition_stats
    from res2df_spark.session import spread

    docs = spread(Catalog(spark, sf_dir).documents)
    out = with_repetition_stats(
        docs, dup_k=3, top_k=2, dup_name="__dup", top_name="__top"
    )
    return out.select(
        "doc_id",
        F.round("__dup", 6).alias("dup3_frac"),
        F.round("__top", 6).alias("top2_frac"),
    )


_DUP_SPANS_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ng AS (SELECT doc_id, greatest(len(toks) - 2, 0) AS n_grams FROM t),
    g AS (SELECT doc_id, toks,
                 unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
          FROM t),
    sh AS (SELECT doc_id,
                  md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS h
           FROM g),
    c AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
    dup AS (SELECT h FROM c WHERE c >= 2 AND c <= 40),
    hit AS (SELECT sh.doc_id, count(*) AS ndup
            FROM sh JOIN dup USING (h) GROUP BY sh.doc_id)
    SELECT ng.doc_id,
           CAST(ng.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(hit.ndup, 0) AS BIGINT) AS n_dup_grams,
           round(CASE WHEN ng.n_grams > 0
                      THEN coalesce(hit.ndup, 0) * 1.0 / ng.n_grams
                      ELSE 0.0 END, 6) AS dup_span_frac
    FROM ng LEFT JOIN hit USING (doc_id)
"""


@_q("dup_spans", _DUP_SPANS_SQL)
def dup_spans(spark, sf_dir):
    """Cross-corpus duplicate 3-gram span accounting (exact-substring
    dedup aggregate, llm/dedup.duplicate_ngram_spans) with the hot-gram
    cap engaged (max_gram_df=40): grams repeated corpus-wide mark every
    position they cover; each doc reports its covered fraction."""
    from res2df_spark.llm.dedup import duplicate_ngram_spans

    docs = Catalog(spark, sf_dir).documents
    return duplicate_ngram_spans(docs, k=3, min_count=2, max_gram_df=40)


# ---------------------------------------------------------------------------
# Weighted deterministic sampling + per-group frequency capping
# (llm/curation.py round-4 additions)
# ---------------------------------------------------------------------------

_WEIGHTED_SAMPLE_SQL = """
    WITH t AS (
        SELECT doc_id, n_chars,
               (('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                + 0.5) / 4294967296.0 AS u
        FROM documents
    )
    SELECT doc_id, n_chars FROM t
    ORDER BY (CASE WHEN n_chars > 0 THEN -ln(u) / n_chars ELSE 9e99 END) ASC,
             doc_id ASC
    LIMIT 50
"""


@_q("weighted_sample_topk", _WEIGHTED_SAMPLE_SQL)
def weighted_sample_topk(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential keys over md5-derived uniforms): 50 docs with
    inclusion probability ∝ n_chars.  Map-side keys + TakeOrdered top-k,
    no corpus shuffle; DuckDB re-derives the EXACT member set because
    the uniforms are hash-built, not RNG-drawn."""
    from res2df_spark.llm.curation import weighted_sample

    docs = Catalog(spark, sf_dir).documents
    return weighted_sample(docs, "n_chars", 50).select("doc_id", "n_chars")


_SOURCE_CAP_SQL = """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 15
"""


@_q("source_cap", _SOURCE_CAP_SQL)
def source_cap(spark, sf_dir):
    """Per-source frequency capping (web-curation domain cap): keep at
    most 15 docs per source by deterministic hash priority — one shuffle
    on source, engine-stable member set."""
    from res2df_spark.llm.curation import cap_per_group

    docs = Catalog(spark, sf_dir).documents
    return cap_per_group(docs, "source", 15).select("doc_id", "source")


# ---------------------------------------------------------------------------
# Reference-corpus LM quality score (CCNet lineage, llm/lm.py)
# ---------------------------------------------------------------------------

_LM_QUALITY_SQL = """
    WITH tr AS (SELECT lower(text) AS t FROM documents WHERE source = 'src0'),
    tgi AS (SELECT t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
            FROM tr),
    m AS (SELECT substr(t, CAST(i AS INT), 2) AS g, count(*) AS c
          FROM tgi GROUP BY 1),
    tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM m),
    dt AS (SELECT doc_id, lower(text) AS t FROM documents),
    dgi AS (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
            FROM dt),
    dg AS (SELECT doc_id, substr(t, CAST(i AS INT), 2) AS g FROM dgi),
    sc AS (SELECT doc_id, count(*) AS n_grams,
                  avg(ln((coalesce(m.c, 0) + 1.0) / (tot.total + tot.vocab + 1)))
                  AS s
           FROM dg LEFT JOIN m USING (g) CROSS JOIN tot
           GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams,
           round(sc.s, 4) AS lm_score
    FROM documents d LEFT JOIN sc USING (doc_id)
"""


@_q("lm_quality", _LM_QUALITY_SQL)
def lm_quality(spark, sf_dir):
    """Char-bigram LM quality scoring (llm/lm.py): train add-one-
    smoothed counts on the trusted slice (source='src0'), score every
    doc by mean log-prob — training collapses the corpus into an
    alphabet-bounded table, scoring is ONE map-side expression (map
    literal + left-fold aggregate), zero shuffles and zero joins on the
    scoring path.  The oracle re-trains and re-scores in pure SQL."""
    from res2df_spark.llm.lm import lm_quality_score, train_char_lm
    from res2df_spark.session import spread

    docs = Catalog(spark, sf_dir).documents
    model = train_char_lm(docs.filter(F.col("source") == "src0"))
    return lm_quality_score(spread(docs), model)


# ---------------------------------------------------------------------------
# Event analytics — trailing windows, funnels, retention cohorts
# (operators/eventanalytics.py)
# ---------------------------------------------------------------------------

_ROLLING_SQL = """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_window,
           round(sum(value) OVER w, 2) AS sum_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@_q("rolling_window", _ROLLING_SQL)
def rolling_window(spark, sf_dir):
    """Trailing 1-hour per-user count/sum for every event, integer-µs
    exact boundaries.  Round 7: rolling_agg is skew-safe by default —
    this plans as the chunked decomposition (partition keys carry the
    derived __chunk, main+halo union) with the O(n) prefix-difference
    frame engine; the oracle SQL stays the plain RANGE window, proving
    the decomposition row-identical."""
    from res2df_spark.operators.eventanalytics import rolling_agg

    ev = Catalog(spark, sf_dir).events
    return rolling_agg(
        ev, "ts", ["user_id"], "value", 3600, round_digits=2
    ).select(
        "event_id", "user_id", "ts", "n_window", "sum_window"
    )


@_q("rolling_chunked", _ROLLING_SQL)
def rolling_chunked_q(spark, sf_dir):
    """Skew-safe chunked trailing window (operators/eventanalytics.
    rolling_agg_chunked, round 6): same RANGE-frame semantics as
    rolling_window, partitioned on (user, 2h time chunk) with a
    window-width halo duplicated across chunk boundaries — the hot-key
    mitigation the skew probe measures (~50× straggler on the plain
    window at a 50% hot key, ~1× chunked).  Same oracle SQL as
    rolling_window: identical output proves the halo decomposition
    exact."""
    from res2df_spark.operators.eventanalytics import rolling_agg_chunked

    ev = Catalog(spark, sf_dir).events
    return rolling_agg_chunked(
        ev, "ts", ["user_id"], "value", 3600,
        chunk_seconds=7200, round_digits=2,
    ).select(
        "event_id", "user_id", "ts", "n_window", "sum_window"
    )


_FUNNEL_SQL = """
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
           JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           CAST(count(*) AS BIGINT) AS n_users FROM s0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
"""


@_q("funnel_conversion", _FUNNEL_SQL)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel view → click → purchase: per-user conditional
    min-timestamp chain (step i strictly after step i-1), rolled up to
    users-reached per step.  The accumulating side rides one hash
    partitioning on user_id; each step ships only its filtered slice."""
    from res2df_spark.operators.eventanalytics import funnel_counts

    ev = Catalog(spark, sf_dir).events
    return funnel_counts(ev, "ts", "user_id", "event_type", ["view", "click", "purchase"])


_RETENTION_SQL = """
    WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
          FROM events)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT)
               AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
"""


@_q("retention_grid", _RETENTION_SQL)
def retention_grid(spark, sf_dir):
    """Cohort retention: first-touch day per user × distinct activity
    days → (cohort_day, day_offset, n_active) grid.  Corpus-sized data
    is hashed only on user_id; the output is the tiny days×offsets
    grid."""
    from res2df_spark.operators.eventanalytics import retention_cohorts

    ev = Catalog(spark, sf_dir).events
    return retention_cohorts(ev, "ts", "user_id")


# ---------------------------------------------------------------------------
# Corpus audit: exact length percentiles per source; time-decayed value
# ---------------------------------------------------------------------------

_LENGTH_PROFILE_SQL = f"""
    WITH t AS (SELECT source, CAST(len({_TOKS_SQL}) AS DOUBLE) AS n_tok
               FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
           round(quantile_cont(n_tok, 0.99), 4) AS p99_tokens,
           round(avg(n_tok), 4) AS mean_tokens
    FROM t GROUP BY source
"""


@_q("length_profile", _LENGTH_PROFILE_SQL)
def length_profile(spark, sf_dir):
    """Per-source document-length distribution (the corpus-audit table
    behind packing/chunking decisions): EXACT interpolated percentiles
    (``F.percentile``), which DuckDB's ``quantile_cont`` reproduces
    bit-for-bit — one partial-aggregated groupBy on the source key.
    At 100 TB swap to ``approx_percentile`` for a one-pass sketch; the
    exact form is the verifiable contract."""
    from res2df_spark.functions.textan import token_count

    docs = Catalog(spark, sf_dir).documents
    n_tok = token_count(F.col("text")).cast("double")
    return (
        docs.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.percentile("n_tok", 0.5), 4).alias("p50_tokens"),
            F.round(F.percentile("n_tok", 0.9), 4).alias("p90_tokens"),
            F.round(F.percentile("n_tok", 0.99), 4).alias("p99_tokens"),
            F.round(F.avg("n_tok"), 4).alias("mean_tokens"),
        )
    )


_DECAYED_SQL = """
    WITH m AS (SELECT max(ts) AS now FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value * exp(-(epoch_us(m.now) - epoch_us(ts))
                                 / 86400000000.0)), 4) AS decayed_value
    FROM events CROSS JOIN m
    GROUP BY user_id
"""


@_q("decayed_user_value", _DECAYED_SQL)
def decayed_user_value(spark, sf_dir):
    """Exponentially time-decayed per-user value (recency-weighted
    engagement, 1-day e-folding): the decay weight is map-side
    arithmetic off an integer-microsecond age, so the whole query is
    one partial-aggregated groupBy on user_id; 'now' is the corpus
    max timestamp via a broadcast 1-row aggregate."""
    ev = Catalog(spark, sf_dir).events
    now = ev.agg(F.max("ts").alias("__now"))
    age_us = F.unix_micros(F.col("__now")) - F.unix_micros(F.col("ts"))
    w = F.exp(-age_us / F.lit(86_400_000_000.0))
    return (
        ev.crossJoin(F.broadcast(now))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col("value") * w), 4).alias("decayed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Composed round-4 curation chain: quality gate → per-source cap →
# weighted sample (every stage individually oracle-checked above; this
# query checks their COMPOSITION end-to-end)
# ---------------------------------------------------------------------------

_PIPELINE2_SQL = f"""
    WITH t AS (SELECT doc_id, source, n_chars, text, {_TOKS_SQL} AS toks
               FROM documents),
    m AS (SELECT doc_id, source, n_chars,
                 len(toks) AS n,
                 CASE WHEN len(toks) > 0
                      THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                           / len(toks) END AS mean_len,
                 CASE WHEN len(toks) > 0
                      THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                           / len(toks) END AS dup_frac,
                 CASE WHEN length(text) > 0
                      THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                                AS DOUBLE) / length(text) END AS alpha
          FROM t),
    kept AS (SELECT doc_id, source, n_chars FROM m
             WHERE NOT (n < 30 OR n > 100000)
               AND NOT (mean_len IS NULL OR mean_len < 2.0 OR mean_len > 10.0)
               AND NOT coalesce(dup_frac > 0.6, FALSE)
               AND NOT (alpha IS NULL OR alpha < 0.6)),
    capped AS (SELECT doc_id, source, n_chars FROM (
                   SELECT kept.*, row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn FROM kept) WHERE rn <= 15),
    u AS (SELECT doc_id, source, n_chars,
                 (('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  + 0.5) / 4294967296.0 AS u
          FROM capped)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM u
    ORDER BY CASE WHEN n_chars > 0 THEN -ln(u) / n_chars ELSE 9e99 END ASC,
             doc_id ASC
    LIMIT 40
"""


@_q("curation_pipeline2", _PIPELINE2_SQL)
def curation_pipeline2(spark, sf_dir):
    """The round-4 curation chain composed end-to-end: Gopher-rule
    quality gate (integer-exact metrics) → per-source frequency cap
    (hash-priority row_number) → Efraimidis–Spirakis weighted sample of
    40 docs by n_chars.  Membership at every stage is hash-derived, so
    DuckDB re-derives the exact final sample; plan-wise the chain is
    map-only → one source-key exchange → TakeOrdered."""
    from res2df_spark.llm.curation import (
        cap_per_group,
        quality_filter,
        weighted_sample,
    )

    docs = Catalog(spark, sf_dir).documents
    kept = (
        quality_filter(
            docs,
            min_tokens=30,
            max_dup_token_frac=0.6,
            min_alpha_ratio=0.6,
            passthrough=("source", "n_chars"),
        )
        .filter(F.col("keep"))
        .select("doc_id", "source", "n_chars")
    )
    capped = cap_per_group(kept, "source", 15)
    return weighted_sample(capped, "n_chars", 40).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


_STREAM_FUNNEL_SQL = """
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
           JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
    SELECT user_id, CAST(1 AS BIGINT) AS step, t0 AS ts FROM s0
    UNION ALL SELECT user_id, CAST(2 AS BIGINT), t1 FROM s1
    UNION ALL SELECT user_id, CAST(3 AS BIGINT), t2 FROM s2
"""


@_q("stream_funnel", _STREAM_FUNNEL_SQL)
def stream_funnel(spark, sf_dir):
    """Custom stateful streaming funnel (applyInPandasWithState): per
    user the state is one timestamp per step; each advancement emits an
    append-only (user, step, ts) event.  The greedy in-order scan
    equals the batch conditional-min chain, so the replayed advancement
    set matches plain SQL — a full oracle for a custom stateful
    operator.  State is len(steps) timestamps per user, bounded
    regardless of volume."""
    from res2df_spark.streaming.ops import funnel_stream, run_available_now

    src = Catalog(spark, sf_dir).stream_table("events")
    out = funnel_stream(
        src, "ts", "user_id", "event_type", ["view", "click", "purchase"],
        watermark="90 days",
    )
    return run_available_now(out, name="stream_funnel", output_mode="append")


_STREAM_SLIDING_SQL = """
    WITH g AS (
        SELECT e.event_type, e.value,
               TIMESTAMP '1970-01-01 00:00:00'
                   + ((CAST(floor(epoch(e.ts) / 900) AS BIGINT) - s.k) * 900)
                     * INTERVAL 1 SECOND AS window_start
        FROM events e, generate_series(0, 3) s(k)
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM g
    GROUP BY window_start, event_type
"""


@_q("stream_sliding_rollup", _STREAM_SLIDING_SQL)
def stream_sliding_rollup(spark, sf_dir):
    """Sliding-window streaming rollup: 1-hour windows sliding every
    15 minutes (each event lands in 4 overlapping windows), per
    event_type, replayed AvailableNow.  The oracle re-derives the
    window assignment arithmetically: an event at t belongs to windows
    starting at floor(t/slide)·slide − k·slide for k in 0..3 — exactly
    Spark's epoch-aligned sliding-window definition."""
    from res2df_spark.streaming.ops import run_available_now

    src = Catalog(spark, sf_dir).stream_table("events")
    agg = (
        src.withWatermark("ts", "90 days")
        .groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sum_value",
        )
    )
    return run_available_now(agg, name="stream_sliding_rollup")


_PROFILE_SQL = """
    SELECT 'doc_id' AS column, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_str,
           CAST(max(doc_id) AS VARCHAR) AS max_str
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           min(lang), max(lang)
    FROM documents
"""


@_q("table_profile", _PROFILE_SQL)
def table_profile(spark, sf_dir):
    """ANALYZE-style column profile (operators/profile.profile_table):
    null/distinct/min/max per column in ONE aggregation pass over the
    table; the oracle recomputes each column independently in SQL."""
    from res2df_spark.operators.profile import profile_table

    docs = Catalog(spark, sf_dir).documents
    return profile_table(docs, ["doc_id", "source", "lang"])


_HISTOGRAM_SQL = """
    WITH v AS (SELECT CAST(value AS DOUBLE) AS x FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    b AS (SELECT min(x) AS lo, max(x) AS hi FROM v),
    binned AS (SELECT CASE WHEN hi > lo
                           THEN least(CAST(floor((x - lo) / ((hi - lo) / 20.0))
                                           AS BIGINT), 19)
                           ELSE 0 END AS bin, lo, hi
               FROM v CROSS JOIN b)
    SELECT bin,
           CAST(round(lo + bin * (hi - lo) / 20.0, 6) AS DOUBLE) AS bin_lo,
           CAST(round(lo + (bin + 1) * (hi - lo) / 20.0, 6) AS DOUBLE) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, lo, hi
"""


@_q("value_histogram", _HISTOGRAM_SQL)
def value_histogram_q(spark, sf_dir):
    """Exact equal-width histogram (operators/profile.value_histogram,
    round 6): the threshold-calibration surface for quality/similarity
    scores — one partial-aggregated groupBy on the bin id (≤ n_bins
    rows per map task reach the reducer), bounds from a one-row
    broadcast min/max when not given.  The oracle replicates the IEEE
    bin arithmetic term by term."""
    from res2df_spark.operators.profile import value_histogram

    ev = Catalog(spark, sf_dir).events
    return value_histogram(ev, "value", n_bins=20)


_LINKAGE_SQL = """
    WITH s AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                      c_custkey // 512 AS c_kblock
               FROM customer)
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           a.c_name AS name1, b.c_name AS name2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM s a JOIN s b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_kblock = b.c_kblock
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


@_q("record_linkage", _LINKAGE_SQL)
def record_linkage(spark, sf_dir):
    """Blocked fuzzy record linkage (operators/linkage.py): customers
    sharing (nation, market segment, key-range) compared by name edit
    distance — blocking confines the quadratic pair work to
    within-block pairs, the structured-records sibling of LSH banding.
    The key-range component (c_custkey // 512, sorted-neighborhood
    blocking — TPC-H names embed the key, so near-names have near
    keys) is the piece that SCALES: (nation, segment) alone is a
    FIXED-cardinality blocking whose block sizes — and Σ|block|² work —
    grow quadratically with the corpus (measured 24× at 10× data
    before this component).  Block count now grows with N and sizes
    stay ≤ 512; the standard blocking trade applies (a near-pair
    spanning a range boundary is missed — recall for bounded work).
    Levenshtein is the same DP on both engines, so distances match
    exactly."""
    from res2df_spark.operators.linkage import blocked_fuzzy_pairs

    cust = Catalog(spark, sf_dir).customer.withColumn(
        "c_kblock", F.floor(F.col("c_custkey") / 512)
    )
    return blocked_fuzzy_pairs(
        cust, "c_custkey", "c_name",
        ["c_nationkey", "c_mktsegment", "c_kblock"], max_edit_distance=2,
    ).select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "name1", "name2", "edit_dist",
    )


# ---------------------------------------------------------------------------
# Round-5: externally-verified ANN QUALITY — recall@k of the PQ
# ADC+rerank pipeline against exact L2 top-k, with the full PQ encode /
# ADC / shortlist / rerank chain replicated in the oracle.  Codebooks are
# closed-form (subvectors of the 8 lowest-id vectors — kmeans_fit with
# zero iterations), which is what makes the whole pipeline expressible
# as plain SQL; training-quality recall bars live in tests/test_pq.py.
# ---------------------------------------------------------------------------

_PQ_RECALL_SQL = """
    WITH init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci,
                         embedding AS v
                  FROM embeddings ORDER BY vec_id LIMIT 8),
    js AS (SELECT unnest(generate_series(0, 3)) AS j),
    cb AS (SELECT js.j, init.ci,
                  list_transform(generate_series(js.j*16 + 1, js.j*16 + 16),
                                 i -> CAST(init.v[i] AS DOUBLE)) AS cent
           FROM init CROSS JOIN js),
    enc_d AS (SELECT e.vec_id, cb.j, cb.ci,
                     list_sum(list_transform(generate_series(1, 16),
                         t -> (CAST(e.embedding[cb.j*16 + t] AS DOUBLE) - cb.cent[t])
                            * (CAST(e.embedding[cb.j*16 + t] AS DOUBLE) - cb.cent[t])))
                     AS sq
              FROM embeddings e CROSS JOIN cb),
    enc AS (SELECT vec_id, j, ci FROM (
              SELECT vec_id, j, ci,
                     row_number() OVER (PARTITION BY vec_id, j
                                        ORDER BY sq, ci) AS rn
              FROM enc_d) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings ORDER BY vec_id LIMIT 5),
    adc_j AS (SELECT q.query_id, enc.vec_id, enc.j,
                     list_sum(list_transform(generate_series(1, 16),
                         t -> (CAST(q.qv[enc.j*16 + t] AS DOUBLE) - cb.cent[t])
                            * (CAST(q.qv[enc.j*16 + t] AS DOUBLE) - cb.cent[t])))
                     AS sq
              FROM q CROSS JOIN enc
              JOIN cb ON cb.j = enc.j AND cb.ci = enc.ci),
    adc AS (SELECT query_id, vec_id,
                   list_sum(list(sq ORDER BY j)) AS pq_dist
            FROM adc_j GROUP BY 1, 2),
    short AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY pq_dist, vec_id) AS rn
                FROM adc) WHERE rn <= 50),
    rer AS (SELECT s.query_id, s.vec_id,
                   list_sum(list_transform(generate_series(1, 64),
                       t -> (CAST(q.qv[t] AS DOUBLE) - CAST(e.embedding[t] AS DOUBLE))
                          * (CAST(q.qv[t] AS DOUBLE) - CAST(e.embedding[t] AS DOUBLE))))
                   AS l2
            FROM short s JOIN q USING (query_id)
            JOIN embeddings e USING (vec_id)),
    approx AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY l2, vec_id) AS rn
                 FROM rer) WHERE rn <= 10),
    ex_d AS (SELECT q.query_id, e.vec_id,
                    list_sum(list_transform(generate_series(1, 64),
                        t -> (CAST(q.qv[t] AS DOUBLE) - CAST(e.embedding[t] AS DOUBLE))
                           * (CAST(q.qv[t] AS DOUBLE) - CAST(e.embedding[t] AS DOUBLE))))
                    AS l2
             FROM q CROSS JOIN embeddings e),
    exact AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY l2, vec_id) AS rn
                FROM ex_d) WHERE rn <= 10)
    SELECT CAST(x.query_id AS BIGINT) AS query_id,
           CAST(round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS recall
    FROM exact x LEFT JOIN approx a
      ON a.query_id = x.query_id AND a.vec_id = x.vec_id
    GROUP BY x.query_id
"""


@_q("pq_recall", _PQ_RECALL_SQL)
def pq_recall(spark, sf_dir):
    """Recall@10 of the PQ ADC+rerank pipeline
    (llm/similarity.pq_encode / pq_topk_rerank / recall_at_k) against
    exact L2 top-10 — the ANN QUALITY dial, externally verified: the
    oracle replicates encode (argmin per subspace, tie to the lower
    code), ADC (per-query distance tables, summed in subspace order),
    the 50-deep shortlist and the exact-L2 rerank, then computes the
    same per-query recall.  Codebooks are closed-form (m=4 subvectors
    of the 8 lowest-id vectors — zero k-means iterations) so both
    engines derive the identical model; trained-codebook recall bars
    are pytest-verified in tests/test_pq.py.  Scale shape: codes are
    m small ints per vector (the corpus-memory win), the corpus never
    shuffles for ADC (broadcast tables + map-side lookups), and the
    rerank touches only |queries|·shortlist rows."""
    from res2df_spark.llm.similarity import (
        _sq_dist,
        pq_encode,
        pq_topk_rerank,
        recall_at_k,
    )

    emb = Catalog(spark, sf_dir).embeddings
    base = emb.select("vec_id", "embedding")
    init = sorted(
        base.orderBy("vec_id").limit(8).collect(), key=lambda r: r["vec_id"]
    )
    vecs = [[float(x) for x in r["embedding"]] for r in init]
    m, dsub = 4, len(vecs[0]) // 4
    books = [[v[j * dsub:(j + 1) * dsub] for v in vecs] for j in range(m)]
    # The probe set is the first 5 of the same 8 rows ALREADY collected
    # for the codebooks — rebuild it from LITERALS instead of an
    # orderBy().limit(5) subtree: the queries frame feeds four
    # consumers (ADC distance tables, the rerank's __qv side, the exact
    # crossJoin, recall_at_k), and each consumer re-planned a full scan
    # + TakeOrdered of the corpus (14 parquet scans in the plan).  The
    # literal form matters: spark.createDataFrame was tried first and
    # REGRESSED — its Scan ExistingRDD keeps the rows in a pickled
    # Python RDD, so every one of the four consumers spun Python
    # workers just to deserialize 5 rows (measured 1.7 → 2.4 s), and
    # its unknown size statistics flipped downstream joins to
    # sort-merge.  explode(array(struct-literals)) stays entirely in
    # the JVM; float32 values survive the collect → double-literal →
    # float cast round-trip bit-exactly.
    qrows = [
        F.struct(
            F.lit(int(r["vec_id"])).cast("long").alias("query_id"),
            F.array(
                *[F.lit(float(x)).cast("float") for x in r["embedding"]]
            ).alias("query_vec"),
        )
        for r in init[:5]
    ]
    queries = (
        spark.range(1)
        .select(F.explode(F.array(*qrows)).alias("__q"))
        .select("__q.query_id", "__q.query_vec")
    )
    codes = pq_encode(base, books)
    approx = pq_topk_rerank(
        queries, codes, base, books, k=10, shortlist=50,
    )
    qv = queries.select(
        "query_id",
        F.transform("query_vec", lambda x: x.cast("double")).alias("__qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col("vec_id"))
    exact = (
        base.crossJoin(F.broadcast(qv))
        .select(
            "query_id", "vec_id",
            _sq_dist(F.col("embedding"), F.col("__qv")).alias("l2"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "vec_id", "rnk")
    )
    rec = recall_at_k(
        approx, exact, k=10, q_col="query_id", id_col="vec_id", rank_col="rnk"
    )
    return rec.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.round("recall", 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Round-5 (cont.): lexical retrieval (BM25), dataset-card corpus
# statistics, and matryoshka embedding truncation (llm/vocab.py,
# llm/similarity.py).
# ---------------------------------------------------------------------------

_BM25_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
           WHERE t IS NOT NULL),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    q AS (SELECT 'q0' AS query_id, term FROM (
            SELECT term, count(*) AS c
            FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
            WHERE length(term) >= 4
            GROUP BY term ORDER BY c DESC, term LIMIT 3)),
    per AS (SELECT q.query_id, tf.doc_id, tf.term,
                   ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
            FROM tf JOIN q USING (term) JOIN dft d USING (term)
            JOIN dl USING (doc_id) CROSS JOIN stats s),
    summed AS (SELECT query_id, doc_id,
                      list_sum(list(sc ORDER BY term)) AS bm25,
                      CAST(count(*) AS BIGINT) AS n_matched
               FROM per GROUP BY 1, 2),
    ranked AS (SELECT query_id, doc_id, bm25, n_matched,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY bm25 DESC, doc_id) AS rnk
               FROM summed)
    SELECT query_id, doc_id, CAST(round(bm25, 6) AS DOUBLE) AS bm25,
           n_matched, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
"""


@_q("bm25_topk", _BM25_SQL)
def bm25_topk(spark, sf_dir):
    """BM25 top-10 retrieval (llm/vocab.bm25_topk) for a deterministic
    query (the corpus's 3 most frequent tokens of length ≥ 4, tie →
    lexical).  The query side broadcasts onto the tf postings so only
    query-term postings survive into scoring; N/avgdl ride as a one-row
    broadcast; the per-(query, doc) sum folds term scores in sorted
    order so both engines add in the same IEEE order.  Reference has no
    IR scoring — north-star scope for retrieval-based decontamination /
    hard-negative mining."""
    from res2df_spark.functions.textan import tokens
    from res2df_spark.llm.vocab import bm25_topk as op

    docs = Catalog(spark, sf_dir).documents
    terms = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .filter(F.length("term") >= 4)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(3)
        .select(F.lit("q0").alias("query_id"), "term")
    )
    return op(docs, terms, k=10)


@_q(
    "corpus_entropy",
    f"""
    WITH c AS (SELECT term, CAST(count(*) AS DOUBLE) AS c
               FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
               GROUP BY 1),
    t AS (SELECT sum(c) AS tot FROM c)
    SELECT CAST(t.tot AS BIGINT) AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_types,
           CAST(round(ln(t.tot) - (SELECT sum(c * ln(c)) FROM c) / t.tot, 6)
                AS DOUBLE) AS entropy,
           (SELECT term FROM c ORDER BY c DESC, term LIMIT 1) AS top_token,
           CAST(round((SELECT max(c) FROM c) / t.tot, 6) AS DOUBLE) AS top_frac
    FROM t
    """,
)
def corpus_entropy(spark, sf_dir):
    """One-row dataset-card statistics (llm/vocab.corpus_token_stats):
    token/type counts, Shannon entropy of the unigram distribution
    (nats) and the Zipf head (top token + corpus share).  One
    vocabulary-sized partial-agg groupBy, then a single aggregate over
    the vocabulary table — corpus rows are touched exactly once."""
    from res2df_spark.llm.vocab import corpus_token_stats

    docs = Catalog(spark, sf_dir).documents
    return corpus_token_stats(docs)


@_q(
    "emb_truncate",
    """
    WITH pre AS (SELECT vec_id,
                        list_transform(generate_series(1, 16),
                                       i -> CAST(embedding[i] AS DOUBLE)) AS p
                 FROM embeddings),
    n AS (SELECT vec_id, p,
                 sqrt(list_sum(list_transform(p, x -> x * x))) AS norm
          FROM pre),
    longf AS (SELECT vec_id, norm,
                     unnest(generate_series(1, 16)) AS pos FROM n),
    vals AS (SELECT l.vec_id, l.norm, l.pos,
                    CASE WHEN l.norm > 0 THEN n.p[l.pos] / l.norm
                         ELSE n.p[l.pos] END AS v
             FROM longf l JOIN n USING (vec_id))
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           string_agg(CAST(CAST(round(v, 6) AS DECIMAL(20, 6)) AS VARCHAR),
                      ',' ORDER BY pos) AS trunc_csv,
           CAST(round(min(norm), 6) AS DOUBLE) AS prefix_norm
    FROM vals GROUP BY vec_id
    """,
)
def emb_truncate(spark, sf_dir):
    """Matryoshka truncation (llm/similarity.truncate_embeddings):
    first-16-dims prefix, L2-renormalized — the MRL serving-cost lever,
    pairing with emb_quantize as the two standard index shrinkers.
    Map-only scan rewrite (slice + fold + transform), no shuffle, no
    Python; values rounded to 6dp and CSV-joined for engine-neutral
    comparison."""
    from res2df_spark.llm.similarity import truncate_embeddings

    emb = Catalog(spark, sf_dir).embeddings
    out = truncate_embeddings(emb, dims=16)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.array_join(
            F.transform(
                "truncated",
                lambda x: F.round(x, 6).cast("decimal(20,6)").cast("string"),
            ),
            ",",
        ).alias("trunc_csv"),
        F.round("prefix_norm", 6).alias("prefix_norm"),
    )


@_q("stream_decontaminate", _ORACLES["decontaminate"])
def stream_decontaminate(spark, sf_dir):
    """Benchmark decontamination AS A STREAM
    (streaming/ops.decontaminate_stream): the batch check's per-doc
    aggregation becomes row-local array arithmetic against a one-row
    broadcast benchmark shingle set (stream-static cross join —
    stateless, append mode, no watermark), so eval-set hygiene runs at
    ingest.  Replayed with AvailableNow and checked against the SAME
    oracle SQL as the batch `decontaminate` query."""
    from res2df_spark.streaming.ops import (
        decontaminate_stream,
        run_available_now,
    )

    bench = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") % 97 == 0)
    src = Catalog(spark, sf_dir).stream_table("documents").filter(
        F.col("doc_id") % 97 != 0
    )
    out = decontaminate_stream(src, bench, shingle_k=3, threshold=0.05)
    return run_available_now(
        out, name="stream_decontaminate", output_mode="append"
    )


@_q(
    "semantic_keepers",
    """
    WITH pairs AS (
    """
    + _ORACLES["semantic_dedup"]
    + """
    ),
    bidir AS (SELECT id_1 AS a, id_2 AS b FROM pairs
              UNION SELECT id_2, id_1 FROM pairs),
    reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT a, b FROM bidir
            UNION
            SELECT r.a, bd.b FROM r JOIN bidir bd ON r.b = bd.a)
        SELECT * FROM r),
    labels AS (SELECT e.vec_id,
                      CAST(least(e.vec_id, coalesce(min(reach.b), e.vec_id))
                           AS BIGINT) AS cluster_id
               FROM embeddings e LEFT JOIN reach ON reach.a = e.vec_id
               GROUP BY e.vec_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id, cluster_id,
           vec_id = cluster_id AS keep
    FROM labels
    """,
)
def semantic_keepers(spark, sf_dir):
    """End-to-end SemDeDup decision: the two-level semantic near-dup
    pairs resolved into components (llm/dedup.connected_components —
    pointer-jumping min-label, O(log D) rounds, lineage-truncated) and
    ONE keeper per component (the minimum vec_id — keep = doc survives
    dedup).  This is the row-level output a curation pipeline consumes;
    the oracle nests the full two-level pair SQL inside recursive-CTE
    reachability."""
    from res2df_spark.llm.dedup import connected_components
    from res2df_spark.llm.similarity import semantic_dedup_pairs

    emb = Catalog(spark, sf_dir).embeddings
    k = max(emb.count() // 64, 8)
    centroids = seed_centroids(emb, k)
    pairs = semantic_dedup_pairs(emb, centroids, threshold=0.35).select(
        F.col("id_1").alias("d1"), F.col("id_2").alias("d2")
    )
    nodes = emb.select(F.col("vec_id").alias("doc_id"))
    labels = connected_components(pairs, nodes)
    return labels.select(
        F.col("doc_id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


@_q(
    "dedup_simhash_capped",
    _SIMHASH_SIG_SQL
    + """
    , u AS (SELECT doc_id, simhash,
                   CAST(simhash AS HUGEINT)
                   + CASE WHEN simhash < 0
                          THEN CAST('18446744073709551616' AS HUGEINT)
                          ELSE 0 END AS us
            FROM sigs),
    chunks AS (SELECT doc_id, simhash, d.i AS chunk_idx,
                      CAST((us // d.dv) % 65536 AS BIGINT) AS chunk_val
               FROM u, (VALUES (0, CAST(1 AS HUGEINT)),
                               (1, CAST(65536 AS HUGEINT)),
                               (2, CAST(4294967296 AS HUGEINT)),
                               (3, CAST(281474976710656 AS HUGEINT))) d(i, dv)),
    ok AS (SELECT chunk_idx, chunk_val FROM chunks
           GROUP BY 1, 2 HAVING count(*) <= 24),
    kept AS (SELECT c.* FROM chunks c JOIN ok USING (chunk_idx, chunk_val)),
    cand AS (SELECT c1.doc_id AS d1, c2.doc_id AS d2,
                    c1.simhash AS s1, c2.simhash AS s2
             FROM kept c1 JOIN kept c2 USING (chunk_idx, chunk_val)
             WHERE c1.doc_id < c2.doc_id GROUP BY 1, 2, 3, 4)
    SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= 3
    """,
)
def dedup_simhash_capped(spark, sf_dir):
    """SimHash pairing with the hot-bucket cap ON (max_bucket_size=24)
    — the 100 TB configuration: a degenerate chunk bucket (boilerplate
    signatures, the all-zero chunk of near-empty docs) is dropped
    before its pair combinatorics materialize, the simhash twin of
    `dedup_minhash_capped`; `simhash_bucket_stats` is the drop
    accounting.  The oracle replicates the cap as a HAVING filter on
    the chunk-bucket size."""
    from res2df_spark.llm.dedup import simhash_near_pairs

    docs = Catalog(spark, sf_dir).documents
    return simhash_near_pairs(docs, max_hamming=3, max_bucket_size=24)


_SEM_NOVELTY_SQL = """
    WITH old AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 0),
    newb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
    stats AS (SELECT greatest(count(*) // 64, 8) AS k,
                     greatest(CAST(ceiling(sqrt(CAST(greatest(count(*) // 64, 8)
                                                     AS DOUBLE))) AS BIGINT),
                              1) AS kc
              FROM old),
    ranked_c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
                        embedding AS cv
                 FROM old),
    c AS (SELECT centroid_id, cv FROM ranked_c
          WHERE centroid_id < (SELECT k FROM stats)),
    coarse AS (SELECT centroid_id AS coarse_id, cv AS ccv FROM c
               WHERE centroid_id < (SELECT kc FROM stats)),
    fc_d AS (SELECT f.centroid_id, co.coarse_id,
                    list_sum(list_transform(generate_series(1, len(f.cv)),
                        i -> (CAST(f.cv[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))
                           * (CAST(f.cv[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))))
                    AS sq
             FROM c f CROSS JOIN coarse co),
    fc AS (SELECT centroid_id, coarse_id FROM (
             SELECT centroid_id, coarse_id,
                    row_number() OVER (PARTITION BY centroid_id
                                       ORDER BY sq, coarse_id) AS rn
             FROM fc_d) WHERE rn = 1),
    vco_d AS (SELECT e.vec_id, co.coarse_id,
                     list_sum(list_transform(generate_series(1, len(e.embedding)),
                         i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))
                            * (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))))
                     AS sq
              FROM old e CROSS JOIN coarse co),
    vco AS (SELECT vec_id, coarse_id FROM (
              SELECT vec_id, coarse_id,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sq, coarse_id) AS rn
              FROM vco_d) WHERE rn = 1),
    vfo_d AS (SELECT e.vec_id, f.centroid_id,
                     list_sum(list_transform(generate_series(1, len(e.embedding)),
                         i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))
                            * (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))))
                     AS sq
              FROM old e
              JOIN vco ON vco.vec_id = e.vec_id
              JOIN fc ON fc.coarse_id = vco.coarse_id
              JOIN c f ON f.centroid_id = fc.centroid_id),
    a_old AS (SELECT vec_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sq, centroid_id) AS rn
                FROM vfo_d) WHERE rn = 1),
    vcn_d AS (SELECT e.vec_id, co.coarse_id,
                     list_sum(list_transform(generate_series(1, len(e.embedding)),
                         i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))
                            * (CAST(e.embedding[i] AS DOUBLE) - CAST(co.ccv[i] AS DOUBLE))))
                     AS sq
              FROM newb e CROSS JOIN coarse co),
    vcn AS (SELECT vec_id, coarse_id FROM (
              SELECT vec_id, coarse_id,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sq, coarse_id) AS rn
              FROM vcn_d) WHERE rn = 1),
    vfn_d AS (SELECT e.vec_id, f.centroid_id,
                     list_sum(list_transform(generate_series(1, len(e.embedding)),
                         i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))
                            * (CAST(e.embedding[i] AS DOUBLE) - CAST(f.cv[i] AS DOUBLE))))
                     AS sq
              FROM newb e
              JOIN vcn ON vcn.vec_id = e.vec_id
              JOIN fc ON fc.coarse_id = vcn.coarse_id
              JOIN c f ON f.centroid_id = fc.centroid_id),
    a_new AS (SELECT vec_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sq, centroid_id) AS rn
                FROM vfn_d) WHERE rn = 1),
    idx AS (SELECT a.vec_id AS mid, a.centroid_id, o.embedding AS iv
            FROM a_old a JOIN old o USING (vec_id)),
    nn AS (SELECT a.vec_id, a.centroid_id, n.embedding AS nv
           FROM a_new a JOIN newb n USING (vec_id)),
    cand AS (SELECT nn.vec_id, idx.mid,
                    CASE WHEN idx.mid IS NULL THEN NULL
                         WHEN sqrt(list_sum(list_transform(generate_series(1, len(nn.nv)),
                                  i -> CAST(nn.nv[i] AS DOUBLE) * CAST(nn.nv[i] AS DOUBLE))))
                            * sqrt(list_sum(list_transform(generate_series(1, len(idx.iv)),
                                  i -> CAST(idx.iv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))) > 0
                         THEN list_sum(list_transform(generate_series(1, len(nn.nv)),
                                  i -> CAST(nn.nv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))
                            / (sqrt(list_sum(list_transform(generate_series(1, len(nn.nv)),
                                  i -> CAST(nn.nv[i] AS DOUBLE) * CAST(nn.nv[i] AS DOUBLE))))
                             * sqrt(list_sum(list_transform(generate_series(1, len(idx.iv)),
                                  i -> CAST(idx.iv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))))
                         ELSE 0.0 END AS cos
             FROM nn LEFT JOIN idx USING (centroid_id)),
    best AS (SELECT vec_id, mid, cos,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, mid) AS rn
             FROM cand)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           (cos IS NULL OR cos < 0.35) AS is_novel,
           CAST(mid AS BIGINT) AS match_id,
           CAST(round(cos, 6) AS DOUBLE) AS cos_sim
    FROM best WHERE rn = 1
"""


@_q("semantic_novelty", _SEM_NOVELTY_SQL)
def semantic_novelty(spark, sf_dir):
    """Incremental SemDeDup (llm/similarity.semantic_novelty): a NEW
    batch (vec_id % 7 == 0) scored against a persisted cluster-assigned
    index of the rest of the corpus — the embedding twin of
    `dedup_incremental`: the index never rescans, new vectors assign
    with the same two-level rule the index was built with, and the
    cluster-equality join is a partition-pruned read when the index is
    stored partitioned by cluster.  Best match per new vector (highest
    cosine, tie → lower id), is_novel below the 0.35 threshold; the
    oracle replicates both two-level assignments and the left-join
    best-match semantics."""
    from res2df_spark.llm.similarity import semantic_novelty as op
    from res2df_spark.llm.similarity import two_level_assign

    emb = Catalog(spark, sf_dir).embeddings
    old = emb.filter(F.col("vec_id") % 7 != 0)
    new = emb.filter(F.col("vec_id") % 7 == 0)
    k = max(old.count() // 64, 8)
    centroids = seed_centroids(old, k)
    index = two_level_assign(old, centroids).select(
        "vec_id", "centroid_id", F.col("__v").alias("embedding")
    )
    return op(new, index, centroids, threshold=0.35).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "is_novel",
        "match_id",
        "cos_sim",
    )


# the claims oracle shares the two-level assignment CTEs with
# semantic_novelty verbatim; only the final pair selection differs
_SEM_CLAIMS_SQL = _SEM_NOVELTY_SQL.split("\n    cand AS (")[0] + """
    cand AS (SELECT nn.vec_id, idx.mid, nn.centroid_id,
                    CASE WHEN sqrt(list_sum(list_transform(generate_series(1, len(nn.nv)),
                              i -> CAST(nn.nv[i] AS DOUBLE) * CAST(nn.nv[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(generate_series(1, len(idx.iv)),
                              i -> CAST(idx.iv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))) > 0
                     THEN list_sum(list_transform(generate_series(1, len(nn.nv)),
                              i -> CAST(nn.nv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))
                        / (sqrt(list_sum(list_transform(generate_series(1, len(nn.nv)),
                              i -> CAST(nn.nv[i] AS DOUBLE) * CAST(nn.nv[i] AS DOUBLE))))
                         * sqrt(list_sum(list_transform(generate_series(1, len(idx.iv)),
                              i -> CAST(idx.iv[i] AS DOUBLE) * CAST(idx.iv[i] AS DOUBLE)))))
                     ELSE 0.0 END AS cos
             FROM nn JOIN idx USING (centroid_id))
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(mid AS BIGINT) AS match_id,
           CAST(centroid_id AS BIGINT) AS centroid_id,
           CAST(round(cos, 6) AS DOUBLE) AS cos_sim
    FROM cand WHERE cos >= 0.35
"""


@_q("stream_semantic_claims", _SEM_CLAIMS_SQL)
def stream_semantic_claims(spark, sf_dir):
    """Incremental SemDeDup AS A STREAM
    (streaming/ops.semantic_claims_stream): arriving embeddings
    (vec_id % 7 == 0) assign to their cluster ROW-LOCALLY (two-level
    folds over one-row broadcast model arrays — no streaming groupBy,
    no state), then a stream-static equality join against the persisted
    cluster index emits every ≥-threshold match as an append-mode
    claim; novelty is the absence of claims.  Replayed with
    AvailableNow; the oracle shares semantic_novelty's two-level
    assignment CTEs verbatim and differs only in the final pair
    selection."""
    from res2df_spark.llm.similarity import two_level_assign
    from res2df_spark.streaming.ops import (
        run_available_now,
        semantic_claims_stream,
    )

    emb = Catalog(spark, sf_dir).embeddings
    old = emb.filter(F.col("vec_id") % 7 != 0)
    k = max(old.count() // 64, 8)
    centroids = seed_centroids(old, k)
    index = two_level_assign(old, centroids).select(
        "vec_id", "centroid_id", F.col("__v").alias("embedding")
    )
    src = Catalog(spark, sf_dir).stream_table("embeddings").filter(
        F.col("vec_id") % 7 == 0
    )
    claims = semantic_claims_stream(src, index, centroids, threshold=0.35)
    out = run_available_now(
        claims, name="stream_semantic_claims", output_mode="append"
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("match_id").cast("long").alias("match_id"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        "cos_sim",
    )


# ---------------------------------------------------------------------------
# Document reweighting / selection scores (llm/weights.py)
# ---------------------------------------------------------------------------

_SOFT_DEDUP_SQL = f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM t),
    sh AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM idx),
    df AS (SELECT shingle, count(*) AS d FROM sh GROUP BY 1),
    com AS (SELECT doc_id, avg(ln(d)) AS mld
            FROM sh JOIN df USING (shingle) GROUP BY 1),
    sz AS (SELECT md5(text) AS h, count(*) AS n
           FROM documents WHERE text IS NOT NULL GROUP BY 1),
    g AS (SELECT doc_id, n FROM documents JOIN sz ON md5(text) = h
          WHERE text IS NOT NULL)
    SELECT doc_id, CAST(n AS BIGINT) AS group_size,
           CAST(round(coalesce(mld, 0), 6) AS DOUBLE) AS mean_log_df,
           CAST(round(1.0 / n, 6) AS DOUBLE) AS w_exact,
           CAST(round(1.0 / (1 + coalesce(mld, 0)), 6) AS DOUBLE) AS w_soft
    FROM g LEFT JOIN com USING (doc_id)
"""


@_q("soft_dedup_weights", _SOFT_DEDUP_SQL)
def soft_dedup_weights_q(spark, sf_dir):
    """SoftDeDup-style sampling weights (llm/weights.soft_dedup_weights):
    1/group_size for byte-identical copies plus a smooth "commonness"
    down-weight (mean ln shingle-df) for boilerplate-heavy documents —
    the soft counterpart of dedup_exact.  One md5 hash-aggregate + one
    vocabulary-sized shingle-df groupBy; no unbounded state."""
    from res2df_spark.llm.weights import soft_dedup_weights as op

    return op(Catalog(spark, sf_dir).documents)


_DSIR_SQL = f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    uni AS (SELECT doc_id, lang, unnest(toks) AS gram FROM t),
    bidx AS (SELECT doc_id, lang, toks,
                    unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
             FROM t),
    bi AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gram FROM bidx),
    feat AS (SELECT doc_id, lang = 'en' AS is_t, gram,
                    {_bucket256_sql('dsir', 'gram')} AS bucket
             FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
    counts AS (SELECT bucket,
                      sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_b,
                      count(*) AS r_b
               FROM feat GROUP BY 1),
    tot AS (SELECT sum(t_b) AS tt, sum(r_b) AS rr FROM counts),
    lam AS (SELECT bucket,
                   ln((t_b + 1) / CAST(tt + 256 AS DOUBLE))
                 - ln((r_b + 1) / CAST(rr + 256 AS DOUBLE)) AS lam
            FROM counts CROSS JOIN tot),
    db AS (SELECT doc_id, bucket, count(*) AS n FROM feat GROUP BY 1, 2),
    perdoc AS (SELECT doc_id,
                      round(sum(n * lam), 6) AS log_weight,
                      sum(n) AS n_feats
               FROM db JOIN lam USING (bucket) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(log_weight, 0.0) AS DOUBLE) AS log_weight,
           CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats
    FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
    LEFT JOIN perdoc USING (doc_id)
"""


@_q("dsir_weights", _DSIR_SQL)
def dsir_weights_q(spark, sf_dir):
    """DSIR importance-resampling weights (llm/weights.dsir_weights):
    hashed unigram+bigram log-likelihood ratio of the lang='en' target
    slice vs the raw corpus.  The model is a 256-row broadcast BY
    CONSTRUCTION (hashed features), so the small side never grows with
    the corpus; the oracle replicates the md5 bucketing, Laplace
    smoothing and per-doc feature-count-weighted sum."""
    from res2df_spark.llm.weights import dsir_weights as op

    docs = Catalog(spark, sf_dir).documents
    return op(docs, F.col("lang") == "en")


_NB_SQL = f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos,
                   unnest(toks) AS token
            FROM t),
    cls AS (SELECT token,
                   sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
                   sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
            FROM tok GROUP BY 1),
    sc AS (SELECT sum(c_pos) AS np, sum(c_neg) AS nn, count(*) AS v FROM cls),
    dc AS (SELECT sum(CASE WHEN source IN ('src0', 'src1', 'src2')
                           THEN 1 ELSE 0 END) AS dp,
                  sum(CASE WHEN source IN ('src0', 'src1', 'src2')
                           THEN 0 ELSE 1 END) AS dn
           FROM documents WHERE text IS NOT NULL),
    ratio AS (SELECT token,
                     ln((c_pos + 1) / CAST(np + v AS DOUBLE))
                   - ln((c_neg + 1) / CAST(nn + v AS DOUBLE)) AS llr,
                     ln(CAST(dp AS DOUBLE) / dn) AS prior
              FROM cls CROSS JOIN sc CROSS JOIN dc),
    dt AS (SELECT doc_id, token, count(*) AS n FROM tok GROUP BY 1, 2),
    perdoc AS (SELECT doc_id,
                      round(any_value(prior) + sum(n * llr), 6) AS nb_score,
                      (any_value(prior) + sum(n * llr)) > 0 AS predicted_pos
               FROM dt JOIN ratio USING (token) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(nb_score,
                         round(ln(CAST(dp AS DOUBLE) / dn), 6)) AS DOUBLE)
               AS nb_score,
           coalesce(predicted_pos, ln(CAST(dp AS DOUBLE) / dn) > 0)
               AS predicted_pos
    FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
    CROSS JOIN dc
    LEFT JOIN perdoc USING (doc_id)
"""


@_q("nb_quality_score", _NB_SQL)
def nb_quality_score_q(spark, sf_dir):
    """Naive-Bayes quality-classifier scores (llm/weights.nb_quality_score):
    multinomial log-odds of "looks like src0-src2" vs the rest with
    Laplace smoothing and a class prior — the CCNet/GPT-3 quality
    filter shape.  The vocabulary-sized ratio table joins on the token
    key (Heaps'-law small even at 100 TB); the oracle replicates the
    smoothing arithmetic term by term."""
    from res2df_spark.llm.weights import nb_quality_score as op

    docs = Catalog(spark, sf_dir).documents
    return op(docs, F.col("source").isin("src0", "src1", "src2"))


_CONTAINMENT_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM t),
    sh0 AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM idx),
    rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM sh s1 JOIN sh s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2)
    SELECT d1, d2, n_shared,
           CAST(z1.sz AS BIGINT) AS size1, CAST(z2.sz AS BIGINT) AS size2,
           CAST(round(n_shared / CAST(z1.sz AS DOUBLE), 6) AS DOUBLE) AS c1,
           CAST(round(n_shared / CAST(z2.sz AS DOUBLE), 6) AS DOUBLE) AS c2
    FROM shared JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
    WHERE greatest(n_shared / CAST(z1.sz AS DOUBLE),
                   n_shared / CAST(z2.sz AS DOUBLE)) >= 0.8
"""


@_q("dedup_containment", _CONTAINMENT_SQL)
def dedup_containment(spark, sf_dir):
    """Asymmetric containment pairs (llm/dedup.containment_pairs):
    |A∩B|/|A| over 3-gram shingle sets — catches a short document
    embedded in a long one, which Jaccard structurally misses (a
    50-in-5000-shingle embedding has Jaccard ≤ 0.01, containment 1.0).
    Same inverted-index candidate join + stop-shingle cap family as
    dedup_ngram_jaccard; the oracle replicates both direction ratios
    and the max(c1,c2) gate."""
    from res2df_spark.llm.dedup import containment_pairs

    docs = Catalog(spark, sf_dir).documents
    return containment_pairs(docs, threshold=0.8, shingle_k=3)


_SHINGLE_DF_STATS_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM t),
    sh AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM idx),
    dfs AS (SELECT shingle, count(*) AS dfc FROM sh GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(CASE WHEN dfc > 5 THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_dropped_tokens,
           CAST(coalesce(sum(dfc), 0) AS BIGINT) AS n_postings,
           CAST(coalesce(sum(CASE WHEN dfc > 5 THEN dfc ELSE 0 END), 0) AS BIGINT)
               AS n_dropped_postings,
           CAST(max(dfc) AS BIGINT) AS max_df
    FROM dfs
"""


@_q("dedup_shingle_df_stats", _SHINGLE_DF_STATS_SQL)
def dedup_shingle_df_stats(spark, sf_dir):
    """Drop accounting for the stop-shingle cap
    (llm/dedup.shingle_df_stats): how many distinct 3-gram shingles and
    index postings a given max_token_df removes before the
    Jaccard/containment pair join — the observability half of the
    default-on cap (round 6), same contract as the LSH bucket stats.
    max_token_df=5 here so the drop counters are EXERCISED at sf0.01,
    not trivially zero."""
    from res2df_spark.llm.dedup import shingle_df_stats

    docs = Catalog(spark, sf_dir).documents
    return shingle_df_stats(docs, max_token_df=5, shingle_k=3)


_LINE_DEDUP_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    nseg AS (SELECT doc_id, toks, CAST(ceil(len(toks) / 8.0) AS INT) AS ns
             FROM t WHERE len(toks) > 0),
    segs AS (SELECT doc_id, i AS seg_idx,
                    array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg
             FROM (SELECT doc_id, toks, unnest(generate_series(0, ns - 1)) AS i
                   FROM nseg)),
    sdf AS (SELECT md5(seg) AS seg_h, count(DISTINCT doc_id) AS df
            FROM segs GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                        FILTER (WHERE df <= 1), '') AS kept_text
    FROM segs JOIN sdf ON md5(seg) = seg_h
    GROUP BY doc_id
"""


@_q("line_dedup", _LINE_DEDUP_SQL)
def line_dedup(spark, sf_dir):
    """CCNet-style cross-document segment dedup
    (llm/dedup.cross_doc_segment_dedup): 8-token non-overlapping
    segments standing in for lines; any segment occurring in more than
    one DISTINCT document is cut from every document and the survivor
    text rebuilt in order — boilerplate removed surgically where
    doc-level dedup would keep or kill whole documents.  One md5
    hash-aggregate for segment df; rebuild state is bounded by the
    document, never the corpus.  The oracle rebuilds with an ordered
    filtered string_agg."""
    from res2df_spark.llm.dedup import cross_doc_segment_dedup

    docs = Catalog(spark, sf_dir).documents
    return cross_doc_segment_dedup(docs, window=8, max_df=1)


# ---------------------------------------------------------------------------
# Graph ranking (operators/graph.py) + telemetry anomalies
# ---------------------------------------------------------------------------

_PAGERANK_SQL = """
    WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                               's' || CAST(l_suppkey AS VARCHAR) AS dst
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
    od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    r0 AS (SELECT node, 1.0 / nn AS r FROM n CROSS JOIN cnt),
    c1 AS (SELECT e.dst, sum(r0.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
    r1 AS (SELECT node, (1 - 0.85) / nn + 0.85 * coalesce(m, 0) AS r
           FROM n CROSS JOIN cnt LEFT JOIN c1 ON c1.dst = node),
    c2 AS (SELECT e.dst, sum(r1.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
    r2 AS (SELECT node, (1 - 0.85) / nn + 0.85 * coalesce(m, 0) AS r
           FROM n CROSS JOIN cnt LEFT JOIN c2 ON c2.dst = node),
    c3 AS (SELECT e.dst, sum(r2.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
    r3 AS (SELECT node, (1 - 0.85) / nn + 0.85 * coalesce(m, 0) AS r
           FROM n CROSS JOIN cnt LEFT JOIN c3 ON c3.dst = node)
    SELECT node, CAST(round(r, 6) AS DOUBLE) AS pagerank FROM r3
"""


@_q("pagerank_entities", _PAGERANK_SQL)
def pagerank_entities(spark, sf_dir):
    """PageRank (operators/graph.pagerank) over the customer→supplier
    trade graph (distinct o_custkey→l_suppkey edges), 3 power
    iterations, damping 0.85 — the domain-centrality shape crawl
    curation ranks sources with.  Each iteration is one edge⋈rank
    shuffle join + one partial-aggregated dst groupBy (hub in-degree
    collapses map-side), lineage truncated per round; the node count
    rides as a broadcast one-row cross join.  The oracle unrolls the
    same three iterations as CTEs."""
    from res2df_spark.operators.graph import pagerank

    cat = Catalog(spark, sf_dir)
    edges = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    out = pagerank(edges, damping=0.85, iterations=3)
    return out.select("node", F.col("rank").alias("pagerank"))


_PAGERANK_DANGLING_SQL = """
    WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                               's' || CAST(l_suppkey AS VARCHAR) AS dst
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
    od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    dang AS (SELECT node FROM n WHERE node NOT IN (SELECT src FROM e)),
    r0 AS (SELECT node, 1.0 / nn AS r FROM n CROSS JOIN cnt),
    d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0 JOIN dang USING (node)),
    c1 AS (SELECT e.dst, sum(r0.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
    r1 AS (SELECT node, (1 - 0.85) / nn + 0.85 * (coalesce(m, 0) + dm / nn) AS r
           FROM n CROSS JOIN cnt CROSS JOIN d1 LEFT JOIN c1 ON c1.dst = node),
    d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1 JOIN dang USING (node)),
    c2 AS (SELECT e.dst, sum(r1.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
    r2 AS (SELECT node, (1 - 0.85) / nn + 0.85 * (coalesce(m, 0) + dm / nn) AS r
           FROM n CROSS JOIN cnt CROSS JOIN d2 LEFT JOIN c2 ON c2.dst = node),
    d3 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2 JOIN dang USING (node)),
    c3 AS (SELECT e.dst, sum(r2.r / od.deg) AS m
           FROM e JOIN od USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
    r3 AS (SELECT node, (1 - 0.85) / nn + 0.85 * (coalesce(m, 0) + dm / nn) AS r
           FROM n CROSS JOIN cnt CROSS JOIN d3 LEFT JOIN c3 ON c3.dst = node)
    SELECT node, CAST(round(r, 6) AS DOUBLE) AS pagerank FROM r3
"""


@_q("pagerank_dangling", _PAGERANK_DANGLING_SQL)
def pagerank_dangling(spark, sf_dir):
    """Full PageRank with dangling-mass redistribution
    (operators/graph.pagerank redistribute_dangling=True) over the same
    customer→supplier graph as pagerank_entities.  Suppliers have no
    out-edges, so on this graph — like real link graphs where sinks are
    a large node fraction — the simplified variant systematically
    deflates every rank; redistribution conserves total mass at 1.  The
    extra cost is ONE one-row scalar aggregate per round riding as a
    broadcast cross join (no driver action); the oracle unrolls the
    same three rounds with a dangling-mass CTE each."""
    from res2df_spark.operators.graph import pagerank

    cat = Catalog(spark, sf_dir)
    edges = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    out = pagerank(edges, damping=0.85, iterations=3, redistribute_dangling=True)
    return out.select("node", F.col("rank").alias("pagerank"))


_ANOMALY_SQL = """
    WITH a AS (SELECT user_id, min(value) AS av FROM events GROUP BY 1),
    s AS (SELECT e.user_id,
                 avg(e.value - av) AS m1,
                 avg((e.value - av) * (e.value - av)) AS m2s,
                 min(av) AS av, count(*) AS n
          FROM events e JOIN a USING (user_id) GROUP BY 1),
    st AS (SELECT user_id, av + m1 AS mean, m2s - m1 * m1 AS vr, n FROM s)
    SELECT event_id, e.user_id, e.value,
           CAST(round((e.value - mean) / sqrt(vr), 6) AS DOUBLE) AS z,
           CAST(n AS BIGINT) AS n_user_events
    FROM events e JOIN st USING (user_id)
    WHERE n >= 5 AND vr > 0
      AND abs((e.value - mean) / sqrt(vr)) >= 2.5
"""


@_q("value_anomalies", _ANOMALY_SQL)
def value_anomalies_q(spark, sf_dir):
    """Per-user z-score outliers (operators/eventanalytics.
    value_anomalies): |value − user mean| ≥ 2.5 population std-devs,
    variance from explicit moments so the arithmetic is
    engine-identical.  One partial-agg groupBy + one join on the same
    user key — partitioning reused, no unbounded state."""
    from res2df_spark.operators.eventanalytics import value_anomalies

    ev = Catalog(spark, sf_dir).events
    return value_anomalies(ev)


@_q("stream_anomalies", _ANOMALY_SQL)
def stream_anomalies(spark, sf_dir):
    """Per-key z-score anomalies AS A STREAM
    (streaming/ops.anomaly_stream): the moment table trains on the
    batch history (user_value_stats), arriving events score through a
    stateless stream-static join on the user key — the
    train-on-lake / score-on-ingest split.  Replayed with AvailableNow
    over the same events the stats saw, so the output equals the batch
    operator's and the oracle SQL is shared verbatim."""
    from res2df_spark.operators.eventanalytics import user_value_stats
    from res2df_spark.streaming.ops import anomaly_stream, run_available_now

    cat = Catalog(spark, sf_dir)
    stats = user_value_stats(cat.events)
    src = cat.stream_table("events")
    out = anomaly_stream(src, stats)
    return run_available_now(
        out, name="stream_anomalies", output_mode="append"
    )


_PIPELINE3_SQL = f"""
    WITH nn AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    keep AS (SELECT min(doc_id) AS doc_id FROM nn GROUP BY md5(text)),
    surv AS (SELECT nn.doc_id, nn.text FROM nn JOIN keep USING (doc_id)),
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM surv),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM t),
    sh AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM idx),
    df AS (SELECT shingle, count(*) AS d FROM sh GROUP BY 1),
    com AS (SELECT doc_id, avg(ln(d)) AS mld
            FROM sh JOIN df USING (shingle) GROUP BY 1),
    w AS (SELECT surv.doc_id,
                 round(1.0 / (1 + coalesce(mld, 0)), 6) AS w_soft
          FROM surv LEFT JOIN com USING (doc_id)),
    ranked AS (SELECT doc_id, w_soft,
                      row_number() OVER (ORDER BY w_soft DESC, doc_id) AS rnk
               FROM w)
    SELECT doc_id, CAST(w_soft AS DOUBLE) AS w_soft,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 50
"""


@_q("curation_pipeline3", _PIPELINE3_SQL)
def curation_pipeline3(spark, sf_dir):
    """The reweighting chain composed end-to-end: exact-dedup keepers
    (md5 min-id groups) → SoftDeDup commonness weights on the
    SURVIVORS (the df table reflects the deduped corpus, the way a
    production pipeline orders the two) → deterministic top-50 most
    novel documents by w_soft.  Shows hard dedup and soft reweighting
    composing: byte-identical copies die, boilerplate-heavy survivors
    sink.  Plan: one md5 hash-agg + keeper semi-join, the weights'
    shingle-df pass, one TakeOrdered-style ranking window."""
    from res2df_spark.llm.dedup import exact_duplicates
    from res2df_spark.llm.weights import soft_dedup_weights

    docs = Catalog(spark, sf_dir).documents
    keepers = exact_duplicates(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    surv = docs.join(keepers, "doc_id", "left_semi")
    w = soft_dedup_weights(surv)
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — per-task
    # heaps, no global sort), THEN the ranking window runs over only
    # the 50 survivors; a row_number over the whole corpus would drag
    # every row through one partition
    top = w.orderBy(F.col("w_soft").desc(), F.col("doc_id")).limit(50)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("w_soft").desc(), F.col("doc_id"))
        ),
    )
    return ranked.select(
        "doc_id", "w_soft", F.col("rnk").cast("int").alias("rnk")
    )


# the verified-pairs oracle extends the shared LSH banding CTEs with
# exact-Jaccard verification of only the candidate pairs
from res2df_spark.suite import _MINHASH_BANDS_SQL  # noqa: E402

_MINHASH_VERIFIED_SQL = _MINHASH_BANDS_SQL + """
    , cand AS (SELECT b1.doc_id AS d1, b2.doc_id AS d2, count(*) AS n_bands
               FROM bands b1 JOIN bands b2 USING (band_idx, band_key)
               WHERE b1.doc_id < b2.doc_id GROUP BY 1, 2),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    shared AS (SELECT c.d1, c.d2, count(*) AS n_shared
               FROM cand c
               JOIN sh s1 ON s1.doc_id = c.d1
               JOIN sh s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
               GROUP BY 1, 2)
    SELECT c.d1, c.d2, c.n_bands,
           CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
           CAST(round(coalesce(n_shared, 0)
                      / CAST(z1.sz + z2.sz - coalesce(n_shared, 0) AS DOUBLE),
                      6) AS DOUBLE) AS jaccard,
           coalesce(n_shared, 0)
               / CAST(z1.sz + z2.sz - coalesce(n_shared, 0) AS DOUBLE)
               >= 0.7 AS is_dup
    FROM cand c
    LEFT JOIN shared USING (d1, d2)
    JOIN sizes z1 ON z1.doc_id = c.d1
    JOIN sizes z2 ON z2.doc_id = c.d2
"""


@_q("dedup_minhash_verified", _MINHASH_VERIFIED_SQL)
def dedup_minhash_verified(spark, sf_dir):
    """The full candidates→verify→threshold near-dup pipeline
    (llm/dedup.minhash_verified_pairs): LSH banding proposes, exact
    shingle-Jaccard disposes — every candidate pair returned with its
    band count, exact Jaccard and is_dup verdict (pure minhash
    collisions survive with jaccard 0, keeping the false-positive rate
    observable).  Verification cost is proportional to candidate
    density, never C(n,2); the oracle extends the shared banding CTEs
    with the same verification join."""
    from res2df_spark.llm.dedup import minhash_verified_pairs

    docs = Catalog(spark, sf_dir).documents
    return minhash_verified_pairs(
        docs, num_hashes=16, band_size=4, shingle_k=3, threshold=0.7
    )


_CONTAINMENT_CAPPED_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks
               FROM documents WHERE text IS NOT NULL),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM t),
    sh AS (SELECT DISTINCT doc_id,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM idx),
    keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 5),
    shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM shf s1 JOIN shf s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2)
    SELECT d1, d2, n_shared,
           CAST(z1.sz AS BIGINT) AS size1, CAST(z2.sz AS BIGINT) AS size2,
           CAST(round(n_shared / CAST(z1.sz AS DOUBLE), 6) AS DOUBLE) AS c1,
           CAST(round(n_shared / CAST(z2.sz AS DOUBLE), 6) AS DOUBLE) AS c2
    FROM shared JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
    WHERE greatest(n_shared / CAST(z1.sz AS DOUBLE),
                   n_shared / CAST(z2.sz AS DOUBLE)) >= 0.8
"""


@_q("dedup_containment_capped", _CONTAINMENT_CAPPED_SQL)
def dedup_containment_capped(spark, sf_dir):
    """Containment pairing WITH the stop-shingle cap engaged
    (llm/dedup.containment_pairs max_token_df=5) — the 100 TB
    configuration: a shingle appearing in more than ``max_token_df``
    documents is boilerplate and is dropped from every document's set
    BEFORE the inverted-index join, bounding per-token join fan-in at
    cap² instead of df² (the uncapped join is quadratic in the hottest
    shingle's document frequency).  At the oracle scale the sf0.01
    corpus has shingles up to df=7, so cap=5 genuinely drops shingles
    here — the oracle replicates the drop with a HAVING df<=5 gate and
    both sides recompute set sizes from the surviving shingles."""
    from res2df_spark.llm.dedup import containment_pairs

    docs = Catalog(spark, sf_dir).documents
    return containment_pairs(docs, threshold=0.8, shingle_k=3, max_token_df=5)


_MINHASH_RECALL_SQL = _MINHASH_BANDS_SQL + """
    , sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM sh s1 JOIN sh s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2),
    truth AS (SELECT d1, d2 FROM shared
              JOIN sizes z1 ON z1.doc_id = d1
              JOIN sizes z2 ON z2.doc_id = d2
              WHERE n_shared / CAST(z1.sz + z2.sz - n_shared AS DOUBLE) >= 0.7),
    cand AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
             FROM bands b1 JOIN bands b2 USING (band_idx, band_key)
             WHERE b1.doc_id < b2.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_caught,
           CASE WHEN count(*) > 0
                THEN CAST(round(sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END)
                                / CAST(count(*) AS DOUBLE), 6) AS DOUBLE)
           END AS recall
    FROM truth t LEFT JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2
"""


@_q("minhash_recall", _MINHASH_RECALL_SQL)
def minhash_recall_q(spark, sf_dir):
    """LSH banding recall vs exact Jaccard truth
    (llm/dedup.minhash_recall): the offline calibration gate proving
    (num_hashes=16, band_size=4) catch the Jaccard≥0.7 pairs before a
    capped production run — the minhash analogue of the pq_recall
    quality query.  The oracle recomputes both the exact inverted-index
    truth and the banding candidates in SQL and takes the same ratio."""
    from res2df_spark.llm.dedup import minhash_recall

    docs = Catalog(spark, sf_dir).documents
    return minhash_recall(
        docs, num_hashes=16, band_size=4, shingle_k=3, threshold=0.7
    )


# ---------------------------------------------------------------------------
# Binary EGRID/INIT/UNRST round-trip (sources/eclbin.py: S3 + S4 + S5).
# Same pattern as eclbin_summary_roundtrip: the grid PROPERTIES are
# derived from the lineitem parquet, so although DuckDB cannot read the
# binary files, it CAN recompute what the write->read composition must
# return — the 2x2x2 unit-cube geometry is closed-form (centers at
# i-0.5, unit volumes), PORO/PORV/PRESSURE round-trip through float32
# REAL records, ACTNUM drops one cell, and the UNRST stack carries two
# INTEHEAD-dated report steps.
# ---------------------------------------------------------------------------

_GRID_RT_SQL = """
    WITH src AS (
        SELECT l_discount AS poro, l_extendedprice AS pres,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS gi
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 8),
    cells AS (
        SELECT gi, gi % 2 + 1 AS i, (gi // 2) % 2 + 1 AS j, gi // 4 + 1 AS k,
               poro, pres
        FROM src WHERE gi <> 5),
    steps AS (
        SELECT CAST('2021-01-01' AS TIMESTAMP) AS d, CAST(1.0 AS DOUBLE) AS scale
        UNION ALL
        SELECT CAST('2021-02-01' AS TIMESTAMP) AS d, CAST(2.0 AS DOUBLE) AS scale)
    SELECT CAST(c.gi AS BIGINT) AS global_index,
           CAST(c.i AS BIGINT) AS i, CAST(c.j AS BIGINT) AS j,
           CAST(c.k AS BIGINT) AS k,
           CAST(c.i - 0.5 AS DOUBLE) AS x,
           CAST(c.j - 0.5 AS DOUBLE) AS y,
           CAST(c.k - 0.5 AS DOUBLE) AS z,
           CAST(c.k - 1 AS DOUBLE) AS z_min,
           CAST(c.k AS DOUBLE) AS z_max,
           CAST(1.0 AS DOUBLE) AS volume,
           CAST(CAST(c.poro AS REAL) AS DOUBLE) AS poro,
           CAST(CAST(c.gi * CAST(10.0 AS DOUBLE) AS REAL) AS DOUBLE) AS porv,
           s.d,
           CAST(CAST(c.pres * s.scale AS REAL) AS DOUBLE) AS pressure
    FROM cells c CROSS JOIN steps s
    ORDER BY d, global_index
"""


@_q("eclbin_grid_roundtrip", _GRID_RT_SQL)
def eclbin_grid_roundtrip(spark, sf_dir):
    """S3+S4+S5 write -> read fixed point on the binary grid layer
    (reference grid.py:287-345 geometry, :411-473 INIT incl. the
    global-length PORV -> active mapping, :40-284 UNRST date-stacked
    restart vectors): a 2x2x2 unit-cube EGRID with one inactive cell
    (ACTNUM), an INIT carrying PORO (active length) + PORV (global
    length), and a two-step UNRST with INTEHEAD dates are written via
    write_keyword and read back through grid_table.  The oracle
    recomputes the closed-form geometry and the float32 property
    round-trip from the same lineitem rows — green means geometry
    decode, ACTNUM mapping, INIT joins and restart date stacking are
    all the identity, not merely that rows came back."""
    import os
    import tempfile

    import numpy as np

    from res2df_spark.sources.eclbin import grid_table, write_keyword

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_discount", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(8)
        .collect()  # 8 rows — driver-side writer boundary, like all K* sinks
    )
    poro = [float(r.l_discount) for r in rows]
    pres = [float(r.l_extendedprice) for r in rows]
    actnum = [1, 1, 1, 1, 1, 0, 1, 1]
    act = [g for g in range(8) if actnum[g]]

    d = tempfile.mkdtemp(prefix="eclbin_grid_rt_")
    egrid = os.path.join(d, "CASE.EGRID")
    init = os.path.join(d, "CASE.INIT")
    unrst = os.path.join(d, "CASE.UNRST")

    gridhead = [0] * 100
    gridhead[0:4] = [1, 2, 2, 2]
    coord: list[float] = []
    for j in range(3):  # (ny+1, nx+1, 6): straight vertical pillars, 0..2 deep
        for i in range(3):
            coord += [float(i), float(j), 0.0, float(i), float(j), 2.0]
    # (2nz, 2ny, 2nx) with layer boundaries at integer depths 0,1,2
    zcorn = np.repeat([0.0, 1.0, 1.0, 2.0], 16)
    with open(egrid, "wb") as f:
        write_keyword(f, "GRIDHEAD", "INTE", gridhead)
        write_keyword(f, "COORD", "REAL", coord)
        write_keyword(f, "ZCORN", "REAL", zcorn)
        write_keyword(f, "ACTNUM", "INTE", actnum)
    with open(init, "wb") as f:
        write_keyword(f, "PORO", "REAL", [poro[g] for g in act])
        write_keyword(f, "PORV", "REAL", [g * 10.0 for g in range(8)])
    with open(unrst, "wb") as f:
        for step, (day, month, scale) in enumerate([(1, 1, 1.0), (1, 2, 2.0)], 1):
            write_keyword(f, "SEQNUM", "INTE", [step])
            ih = [0] * 100
            ih[64], ih[65], ih[66] = day, month, 2021
            write_keyword(f, "INTEHEAD", "INTE", ih)
            write_keyword(f, "PRESSURE", "REAL", [pres[g] * scale for g in act])

    out = grid_table(spark, egrid, init_path=init, unrst_path=unrst, rstdates="all")
    return out.select(
        F.col("GLOBAL_INDEX").alias("global_index"),
        F.col("I").alias("i"), F.col("J").alias("j"), F.col("K").alias("k"),
        F.col("X").alias("x"), F.col("Y").alias("y"), F.col("Z").alias("z"),
        F.col("Z_MIN").alias("z_min"), F.col("Z_MAX").alias("z_max"),
        # 6-tet decomposition sums six det/6.0 terms — round away the
        # one-ulp accumulation the SQL side cannot reproduce
        F.round("VOLUME", 6).alias("volume"),
        F.col("PORO").alias("poro"), F.col("PORV").alias("porv"),
        F.col("DATE").alias("d"), F.col("PRESSURE").alias("pressure"),
    ).orderBy("d", "global_index")


# ---------------------------------------------------------------------------
# Binary RFT round-trip (sources/eclbin.py: S6) — survey grouping by
# TIME records, DATE/WELLETC context, per-connection vectors.
# ---------------------------------------------------------------------------

_RFT_RT_SQL = """
    WITH src AS (
        SELECT l_quantity AS qty, l_extendedprice AS price, l_discount AS disc,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS ci
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 4),
    surveys AS (
        SELECT CAST('2021-03-01' AS TIMESTAMP) AS d, 'OP1' AS well,
               CAST(1.0 AS DOUBLE) AS scale
        UNION ALL
        SELECT CAST('2021-04-15' AS TIMESTAMP) AS d, 'OP2' AS well,
               CAST(2.0 AS DOUBLE) AS scale)
    SELECT s.d, s.well, CAST(c.ci AS BIGINT) AS conidx,
           CAST(c.ci + 1 AS BIGINT) AS conipos,
           CAST(1 AS BIGINT) AS conjpos,
           CAST(c.ci + 1 AS BIGINT) AS conkpos,
           CAST(CAST(c.qty * CAST(10.0 AS DOUBLE) AS REAL) AS DOUBLE) AS depth,
           CAST(CAST(c.price * s.scale AS REAL) AS DOUBLE) AS pressure,
           CAST(CAST(c.disc AS REAL) AS DOUBLE) AS swat
    FROM src c CROSS JOIN surveys s
    ORDER BY d, conidx
"""


@_q("rft_binary_roundtrip", _RFT_RT_SQL)
def rft_binary_roundtrip(spark, sf_dir):
    """S6 write -> read fixed point on the binary RFT layer (reference
    rft.py survey grouping): two TIME-delimited surveys with DATE and
    WELLETC context and CON*/DEPTH/PRESSURE/SWAT vectors are written
    via write_keyword and read back through rft_table.  The oracle
    recomputes the survey stack and float32 vector round-trip from the
    same lineitem rows in SQL — green means survey boundary detection,
    date/well context stamping and the int/float vector split are the
    identity."""
    import os
    import tempfile

    from res2df_spark.sources.eclbin import rft_table, write_keyword

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(4)
        .collect()  # 4 rows — driver-side writer boundary
    )
    qty = [float(r.l_quantity) for r in rows]
    price = [float(r.l_extendedprice) for r in rows]
    disc = [float(r.l_discount) for r in rows]
    n = len(rows)

    d = tempfile.mkdtemp(prefix="eclbin_rft_rt_")
    path = os.path.join(d, "CASE.RFT")
    with open(path, "wb") as f:
        for days, (dd, mm, yy), well, scale in (
            (59.0, (1, 3, 2021), "OP1", 1.0),
            (104.0, (15, 4, 2021), "OP2", 2.0),
        ):
            write_keyword(f, "TIME", "REAL", [days])
            write_keyword(f, "DATE", "INTE", [dd, mm, yy])
            write_keyword(f, "WELLETC", "CHAR", ["METRIC", well, "R", "P"])
            write_keyword(f, "CONIPOS", "INTE", [c + 1 for c in range(n)])
            write_keyword(f, "CONJPOS", "INTE", [1] * n)
            write_keyword(f, "CONKPOS", "INTE", [c + 1 for c in range(n)])
            write_keyword(f, "DEPTH", "REAL", [q * 10.0 for q in qty])
            write_keyword(f, "PRESSURE", "REAL", [p * scale for p in price])
            write_keyword(f, "SWAT", "REAL", disc)

    out = rft_table(spark, path)
    return out.select(
        F.col("DATE").alias("d"), F.col("WELL").alias("well"),
        F.col("CONIDX").alias("conidx"),
        F.col("CONIPOS").alias("conipos"), F.col("CONJPOS").alias("conjpos"),
        F.col("CONKPOS").alias("conkpos"),
        F.col("DEPTH").alias("depth"), F.col("PRESSURE").alias("pressure"),
        F.col("SWAT").alias("swat"),
    ).orderBy("d", "conidx")


# ---------------------------------------------------------------------------
# Binary NNC round-trip (sources/eclbin.py nnc_table, reference
# nnc.py:37-110): EGRID NNC1/NNC2 global->I,J,K decode + INIT TRANNNC
# alignment, oracled by recomputing the index arithmetic in SQL.
# ---------------------------------------------------------------------------

_NNC_RT_SQL = """
    WITH src AS (
        SELECT l_extendedprice AS tran,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS e
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 6),
    pairs AS (
        -- NNC e: global pair (e+1, 8-e) on the 2x2x2 grid, 1-based
        SELECT e, e + 1 AS g1, 8 - e AS g2, tran FROM src)
    SELECT CAST((g1 - 1) % 2 + 1 AS INT) AS i1,
           CAST(((g1 - 1) // 2) % 2 + 1 AS INT) AS j1,
           CAST((g1 - 1) // 4 + 1 AS INT) AS k1,
           CAST((g2 - 1) % 2 + 1 AS INT) AS i2,
           CAST(((g2 - 1) // 2) % 2 + 1 AS INT) AS j2,
           CAST((g2 - 1) // 4 + 1 AS INT) AS k2,
           CAST(CAST(tran AS REAL) AS DOUBLE) AS tran
    FROM pairs ORDER BY e
"""


@_q("nnc_binary_roundtrip", _NNC_RT_SQL)
def nnc_binary_roundtrip(spark, sf_dir):
    """EGRID NNC pair-list decode (reference nnc.py:37-110): NNC1/NNC2
    1-based global indices written to a 2x2x2 EGRID and TRANNNC to the
    INIT are read back through nnc_table; the oracle recomputes the
    global->(I,J,K) arithmetic and the float32 TRAN round-trip in SQL
    from the same lineitem rows."""
    import os
    import tempfile

    from res2df_spark.sources.eclbin import nnc_table, write_keyword

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(6)
        .collect()  # 6 rows — driver-side writer boundary
    )
    tran = [float(r.l_extendedprice) for r in rows]
    n = len(rows)

    d = tempfile.mkdtemp(prefix="eclbin_nnc_rt_")
    egrid = os.path.join(d, "CASE.EGRID")
    init = os.path.join(d, "CASE.INIT")
    gridhead = [0] * 100
    gridhead[0:4] = [1, 2, 2, 2]
    with open(egrid, "wb") as f:
        write_keyword(f, "GRIDHEAD", "INTE", gridhead)
        write_keyword(f, "NNC1", "INTE", [e + 1 for e in range(n)])
        write_keyword(f, "NNC2", "INTE", [8 - e for e in range(n)])
    with open(init, "wb") as f:
        write_keyword(f, "TRANNNC", "REAL", tran)

    out = nnc_table(spark, egrid, init_path=init)
    return out.select(
        F.col("I1").alias("i1"), F.col("J1").alias("j1"),
        F.col("K1").alias("k1"),
        F.col("I2").alias("i2"), F.col("J2").alias("j2"),
        F.col("K2").alias("k2"),
        F.col("TRAN").alias("tran"),
    )


# ---------------------------------------------------------------------------
# PRT balance-sheet scan (modules/fipreports.py: S7) — driver-visible
# oracle for the distributed text-report parser: a real-shape PRT is
# generated from per-region customer counts, parsed with the positional
# colon-section rules, and the oracle recomputes every balance value
# (all chosen exactly representable: x.5 / x.25 / integers) in SQL.
# ---------------------------------------------------------------------------

_FIPREPORTS_SQL = """
    WITH cnt AS (
        SELECT n_regionkey AS r, CAST(count(*) AS DOUBLE) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey)
    SELECT CAST(make_date(2020, 1, CAST(r + 1 AS INT)) AS TIMESTAMP) AS d,
           'FIPNUM' AS fipname,
           CAST(r + 1 AS INT) AS region,
           'CURRENTLY IN PLACE' AS datatype,
           CAST(NULL AS INT) AS to_region,
           CAST(c + 0.5 AS DOUBLE) AS stoiip_oil,
           CAST(c * 2.0 AS DOUBLE) AS associatedoil_gas,
           CAST(c + 0.5 + c * 2.0 AS DOUBLE) AS stoiip_total,
           CAST(c * 3.0 AS DOUBLE) AS wiip_total,
           CAST(c * 4.0 AS DOUBLE) AS giip_gas,
           CAST(c + 0.25 AS DOUBLE) AS associatedgas_oil,
           CAST(c * 4.0 + c + 0.25 AS DOUBLE) AS giip_total
    FROM cnt ORDER BY region
"""


@_q("fipreports_prt", _FIPREPORTS_SQL)
def fipreports_prt(spark, sf_dir):
    """S7 generate -> parse fixed point on the PRT balance-sheet layer
    (reference fipreports.py:34-190): one REPORT-dated FIPNUM region
    block per region with a positional colon-sectioned CURRENTLY IN
    PLACE line (3-token oil, 1-token water, 3-token gas layouts) is
    written from per-region customer counts and parsed back by the
    distributed scanner.  The oracle recomputes date stamping, region
    context, layout dispatch and every float from the same join in
    SQL."""
    import os
    import tempfile

    cat = Catalog(spark, sf_dir)
    counts = (
        cat.customer.join(
            cat.nation, F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("n_regionkey")
        .collect()  # ≤5 rows — driver-side writer boundary
    )
    lines = [" NOISE"]
    for row in counts:
        r, c = int(row.n_regionkey), float(row.cnt)
        liquid, vapour = c + 0.5, c * 2.0
        water, free, diss = c * 3.0, c * 4.0, c + 0.25
        lines.append(f"  REPORT   {r}     {r + 1} JAN 2020   *  RUN")
        lines.append(
            f"                     : FIPNUM  REPORT REGION{r + 1:5d}    :"
        )
        lines.append(
            " :CURRENTLY IN PLACE       :"
            f"{liquid:>15.2f}{vapour:>12.2f}{liquid + vapour:>10.2f} :"
            f"{water:>10.2f} :"
            f"{free:>10.2f}{diss:>11.2f}{free + diss:>11.2f}:"
        )
    d = tempfile.mkdtemp(prefix="fipreports_prt_")
    path = os.path.join(d, "CASE.PRT")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    from res2df_spark.modules import fipreports

    out = fipreports.df(spark, path)
    return out.select(
        F.col("DATE").cast("timestamp").alias("d"),
        F.col("FIPNAME").alias("fipname"),
        F.col("REGION").alias("region"),
        F.col("DATATYPE").alias("datatype"),
        F.col("TO_REGION").alias("to_region"),
        F.col("STOIIP_OIL").alias("stoiip_oil"),
        F.col("ASSOCIATEDOIL_GAS").alias("associatedoil_gas"),
        F.col("STOIIP_TOTAL").alias("stoiip_total"),
        F.col("WIIP_TOTAL").alias("wiip_total"),
        F.col("GIIP_GAS").alias("giip_gas"),
        F.col("ASSOCIATEDGAS_OIL").alias("associatedgas_oil"),
        F.col("GIIP_TOTAL").alias("giip_total"),
    ).orderBy("region")


# ---------------------------------------------------------------------------
# lyr zonemap parse + broadcast attach (sources/aux.py: S8 + J4) —
# zone NAMES come from the region parquet so the oracle can recompute
# the reference's span arithmetic (range, span-after-range, color drop)
# as a constant k-list join in SQL.
# ---------------------------------------------------------------------------

_ZONEMAP_SQL = """
    WITH ks AS (
        SELECT 0 AS rk, unnest(generate_series(1, 3)) AS k
        UNION ALL SELECT 1, unnest(generate_series(4, 6))
        UNION ALL SELECT 2, unnest(generate_series(7, 8)))
    SELECT CAST(ks.k AS INT) AS k, r.r_name AS zone
    FROM ks JOIN region r ON r.r_regionkey = ks.rk
    ORDER BY k
"""


@_q("zonemap_spans", _ZONEMAP_SQL)
def zonemap_spans(spark, sf_dir):
    """S8 lyr parse fixed point (reference common.py:859-952
    parse_lyrfile + convert_lyrlist_to_zonemap): a lyr file whose zone
    names are the first three region names exercises an absolute range,
    a span entry resolved against the previous end layer
    (to = from + span), a spaced range with a trailing color token and
    a '--' comment; the oracle recomputes the layer assignment as a
    constant k-list joined back to region."""
    from res2df_spark.sources.aux import zonemap_df

    names = {
        int(r.r_regionkey): str(r.r_name)
        for r in Catalog(spark, sf_dir)
        .region.select("r_regionkey", "r_name")
        .filter(F.col("r_regionkey") <= 2)
        .collect()  # 3 rows — dim-table scale
    }
    lyr = (
        "-- zones from region names\n"
        f"'{names[0]}' 1-3\n"
        f"'{names[1]}' 2\n"          # span: layers 4 .. 4+2 = 6
        f"'{names[2]}' 7 - 8  #FF0000\n"
    )
    return zonemap_df(spark, lyr).select(
        F.col("K").alias("k"), F.col("ZONE").alias("zone")
    ).orderBy("k")


# ---------------------------------------------------------------------------
# parameters discovery + attach (sources/aux.py: S9 + J12) — key-value
# files are written from parquet aggregates, so the oracle recomputes
# the discovery precedence (nearest dir first, json > yml > txt) and
# the broadcast-literal attach as scalar subqueries.
# ---------------------------------------------------------------------------

_PARAMS_SQL = """
    SELECT r_regionkey, r_name,
           CAST((SELECT count(*) FROM region) AS BIGINT) AS nregions,
           CAST((SELECT count(*) FROM nation) AS BIGINT) AS nnations,
           'json' AS src
    FROM region ORDER BY r_regionkey
"""


@_q("params_attach", _PARAMS_SQL)
def params_attach(spark, sf_dir):
    """S9 + J12 (reference parameters.py:18-115 find/load_all +
    summary.py:529-564 attach): parameters.txt one directory up carries
    a numeric key (column-level int inference) and a SRC marker;
    parameters.yml and parameters.json in the case directory both
    redefine SRC — json must win (first occurrence in the reference's
    json > yml > txt lookup order).  The merged dict is attached as
    literal columns; the oracle recomputes every value as a scalar
    subquery."""
    import json as _json
    import os
    import tempfile

    from res2df_spark.sources.aux import attach_parameters, load_parameters

    cat = Catalog(spark, sf_dir)
    nreg = cat.region.count()
    nnat = cat.nation.count()
    root = tempfile.mkdtemp(prefix="params_attach_")
    case = os.path.join(root, "model")
    os.makedirs(case)
    with open(os.path.join(root, "parameters.txt"), "w") as f:
        f.write(f"NREGIONS {nreg}\n")
    with open(os.path.join(case, "parameters.yml"), "w") as f:
        f.write("SRC: yml\n")
    with open(os.path.join(case, "parameters.json"), "w") as f:
        f.write(_json.dumps({"NNATIONS": int(nnat), "SRC": "json"}))

    params = load_parameters(os.path.join(case, "CASE.DATA"))
    out = attach_parameters(
        cat.region.select("r_regionkey", "r_name"), params
    )
    return out.select(
        "r_regionkey", "r_name",
        F.col("NREGIONS").cast("long").alias("nregions"),
        F.col("NNATIONS").cast("long").alias("nnations"),
        F.col("SRC").alias("src"),
    ).orderBy("r_regionkey")


# ---------------------------------------------------------------------------
# CSV sink -> scan round-trip (sinks/writers.py: K1 + S11) — the
# single-file CSV writer (the reference's to_csv convention) re-read
# with an explicit schema must be the identity, which the oracle
# expresses as the original projection.
# ---------------------------------------------------------------------------

_CSV_RT_SQL = """
    SELECT n_nationkey, n_regionkey, n_name
    FROM nation ORDER BY n_nationkey
"""


@_q("csv_roundtrip", _CSV_RT_SQL)
def csv_roundtrip(spark, sf_dir):
    """K1 write -> S11 read fixed point (reference common.py:116-152
    write_dframe_stdout_file + csv2res's read path): nation is written
    through the single-file CSV sink and re-read with an explicit
    schema; green means the CSV text round-trip preserves keys, ints
    and strings exactly."""
    import os
    import tempfile

    from res2df_spark.sinks.writers import write_dataframe

    src = (
        Catalog(spark, sf_dir)
        .nation.select("n_nationkey", "n_regionkey", "n_name")
        .orderBy("n_nationkey")
    )
    d = tempfile.mkdtemp(prefix="csv_rt_")
    path = os.path.join(d, "nation.csv")
    write_dataframe(src, path)
    out = spark.read.csv(
        path, header=True,
        schema="n_nationkey long, n_regionkey long, n_name string",
    )
    return out.orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# Satfunc table writer -> deck parser fixed point (sinks/df2res.py: K8
# + R10): a two-region SWOF frame built from lineitem floats is
# rendered as include text (repr floats — shortest round-tripping
# form) and re-parsed through the record reshaper; the oracle
# recomputes the frame, so green means the text round-trip is the
# identity on every float.
# ---------------------------------------------------------------------------

_SATFUNC_RT_SQL = """
    WITH src AS (
        SELECT l_discount AS krw, l_tax AS krow, l_quantity AS pc,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS rn
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 6)
    SELECT 'SWOF' AS keyword,
           CAST(CASE WHEN rn <= 3 THEN 1 ELSE 2 END AS BIGINT) AS satnum,
           CAST((rn - 1) % 3 AS BIGINT) AS row_idx,
           CAST(rn AS DOUBLE) / CAST(10.0 AS DOUBLE) AS sw,
           krw, krow,
           CAST(pc AS DOUBLE) AS pc
    FROM src ORDER BY satnum, row_idx
"""


@_q("satfunc_writer_roundtrip", _SATFUNC_RT_SQL)
def satfunc_writer_roundtrip(spark, sf_dir):
    """K8 df -> include text -> df fixed point (reference
    satfunc.py:272-383 df2res renderer + :107-157 parser): a SWOF
    frame with two SATNUM regions is rendered via df2res_satfunc and
    re-parsed via satfunc_df (interpolation on, a no-op with no
    defaults); the oracle recomputes the same frame from lineitem.
    repr() float formatting makes the text round-trip bit-exact."""
    from res2df_spark.modules.tables import satfunc_df
    from res2df_spark.sinks.df2res import df2res_satfunc

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                "l_discount", "l_tax", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(6)
        .collect()  # 6 rows — driver-side writer boundary
    )
    data = []
    for n, r in enumerate(rows, 1):
        satnum, idx = (1, n - 1) if n <= 3 else (2, n - 4)
        data.append(
            ("SWOF", satnum, idx, n / 10.0,
             float(r.l_discount), float(r.l_tax), float(r.l_quantity))
        )
    src = spark.createDataFrame(
        data,
        "KEYWORD string, SATNUM int, ROW_IDX int, "
        "SW double, KRW double, KROW double, PCOW double",
    )
    text = df2res_satfunc(src)
    out = satfunc_df(spark, text)
    return out.select(
        F.col("KEYWORD").alias("keyword"),
        F.col("SATNUM").cast("long").alias("satnum"),
        F.col("ROW_IDX").cast("long").alias("row_idx"),
        F.col("SW").alias("sw"), F.col("KRW").alias("krw"),
        F.col("KROW").alias("krow"), F.col("PCOW").alias("pc"),
    ).orderBy("satnum", "row_idx")


# ---------------------------------------------------------------------------
# Distributed RLE (sinks/writers.py rle_encode_distributed: K5/F) —
# the grid-property writer's collapse step, oracled by the classic
# gaps-and-islands recompute in SQL.  The input is a dense sequence
# derived from lineitem with genuine repeats (floor(quantity) % 5).
# ---------------------------------------------------------------------------

_RLE_SQL = """
    WITH src AS (
        SELECT CAST(floor(l_quantity) AS BIGINT) % 5 AS v,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS rn
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 200),
    isl AS (
        SELECT v, rn,
               rn - row_number() OVER (PARTITION BY v ORDER BY rn) AS grp
        FROM src)
    SELECT CAST(min(rn) AS BIGINT) AS start_idx,
           CAST(count(*) AS BIGINT) AS run_length,
           CAST(v AS BIGINT) AS value
    FROM isl GROUP BY v, grp ORDER BY start_idx
"""


@_q("rle_runs", _RLE_SQL)
def rle_runs(spark, sf_dir):
    """K5's distributed run-length collapse (reference grid.py:623-760
    scatters into a driver-side numpy vector; here only the collapsed
    runs reach the driver): consecutive equal values in strict cell
    order become (start_idx, run_length, value) rows via the two-window
    one-groupBy plan.  The oracle recomputes the runs with the
    gaps-and-islands identity (rn - row_number within value) in SQL."""
    from pyspark.sql import Window

    from res2df_spark.sinks.writers import rle_encode_distributed

    src = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(200)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
            ),
        )
        .withColumn("v", F.floor("l_quantity").cast("long") % 5)
        .select("rn", "v")
    )
    out = rle_encode_distributed(src, "rn", "v")
    return out.select(
        F.col("start_idx").cast("long").alias("start_idx"),
        F.col("run_length").alias("run_length"),
        F.col("value").cast("long").alias("value"),
    ).orderBy("start_idx")


# ---------------------------------------------------------------------------
# EDITNNC writer -> deck parser fixed point (sinks/df2res.py: K6) — the
# NNC edit keyword rendered from lineitem-derived pairs and re-parsed
# through the schema-registry deck layer.
# ---------------------------------------------------------------------------

_EDITNNC_RT_SQL = """
    WITH src AS (
        SELECT l_extendedprice AS tranm,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS e
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 6)
    SELECT CAST(e % 2 + 1 AS INT) AS i1, CAST((e // 2) % 2 + 1 AS INT) AS j1,
           CAST(e // 4 + 1 AS INT) AS k1,
           CAST((5 - e) % 2 + 1 AS INT) AS i2, CAST(((5 - e) // 2) % 2 + 1 AS INT) AS j2,
           CAST((5 - e) // 4 + 1 AS INT) AS k2,
           tranm
    FROM src ORDER BY i1, j1, k1, i2, j2, k2
"""


@_q("editnnc_writer_roundtrip", _EDITNNC_RT_SQL)
def editnnc_writer_roundtrip(spark, sf_dir):
    """K6 df -> EDITNNC text -> df fixed point (reference
    nnc.py:206-260): six connection records with float transmissibility
    multipliers render through df2res_editnnc and re-parse through the
    deck schema registry; the oracle recomputes the pair arithmetic and
    the repr-float round-trip from the same lineitem rows."""
    from res2df_spark.sinks.df2res import df2res_editnnc
    from res2df_spark.sources.deck import deck_records

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(6)
        .collect()  # 6 rows — driver-side writer boundary
    )
    data = []
    for e, r in enumerate(rows):
        f = 5 - e
        data.append(
            (e % 2 + 1, (e // 2) % 2 + 1, e // 4 + 1,
             f % 2 + 1, (f // 2) % 2 + 1, f // 4 + 1,
             float(r.l_extendedprice))
        )
    src = spark.createDataFrame(
        data, "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRANM double"
    )
    text = df2res_editnnc(src)
    out = deck_records(spark, text, "EDITNNC")
    return out.select(
        F.col("I1").alias("i1"), F.col("J1").alias("j1"),
        F.col("K1").alias("k1"),
        F.col("I2").alias("i2"), F.col("J2").alias("j2"),
        F.col("K2").alias("k2"),
        F.col("TRANM").alias("tranm"),
    ).orderBy("i1", "j1", "k1", "i2", "j2", "k2")


# ---------------------------------------------------------------------------
# Generic include writer -> deck parser fixed point (sinks/writers.py
# df_to_include: K3/K4) — mid-record NULLs must render as '1*' (slot
# preserved), trailing NULLs must be dropped entirely, and both must
# re-parse to the same NULLs.
# ---------------------------------------------------------------------------

_INCLUDE_RT_SQL = """
    WITH src AS (
        SELECT n_nationkey, n_regionkey,
               row_number() OVER (ORDER BY n_nationkey) - 1 AS idx
        FROM nation ORDER BY n_nationkey LIMIT 3)
    SELECT 'W' || CAST(n_nationkey AS VARCHAR) AS well,
           'G' || CAST(n_regionkey AS VARCHAR) AS grp,
           CAST(n_nationkey + 1 AS INT) AS i,
           CAST(CASE WHEN idx = 1 THEN NULL ELSE n_regionkey + 1 END AS INT) AS j,
           CAST(CASE WHEN idx >= 1 THEN NULL
                     ELSE CAST(n_nationkey AS DOUBLE) * 100.0 + 0.5
                END AS DOUBLE) AS ref_depth,
           CASE WHEN idx = 2 THEN NULL ELSE 'OIL' END AS phase
    FROM src ORDER BY well
"""


@_q("include_writer_roundtrip", _INCLUDE_RT_SQL)
def include_writer_roundtrip(spark, sf_dir):
    """K3/K4 df -> include text -> df fixed point (reference
    common.py:628-750 df2res + the '1*'/trailing-default rules): a
    WELSPECS frame where one record defaults J mid-record (must render
    '1*' so later slots don't shift) and another defaults its trailing
    REF_DEPTH+PHASE (must be dropped entirely) renders through
    df_to_include and re-parses through the deck schema registry to the
    same NULLs.  The oracle recomputes the frame from nation."""
    from res2df_spark.sinks.writers import df_to_include
    from res2df_spark.sources.deck import deck_records

    rows = (
        Catalog(spark, sf_dir).nation
        .select("n_nationkey", "n_regionkey")
        .orderBy("n_nationkey")
        .limit(3)
        .collect()  # 3 rows — driver-side writer boundary
    )
    data = []
    for idx, r in enumerate(rows):
        nk, rk = int(r.n_nationkey), int(r.n_regionkey)
        data.append((
            f"W{nk}", f"G{rk}", nk + 1,
            None if idx == 1 else rk + 1,
            None if idx >= 1 else float(nk) * 100.0 + 0.5,
            None if idx == 2 else "OIL",
        ))
    src = spark.createDataFrame(
        data,
        "WELL string, GROUP string, I int, J int, REF_DEPTH double, PHASE string",
    )
    text = df_to_include(
        src.orderBy("WELL"), "WELSPECS",
        ["WELL", "GROUP", "I", "J", "REF_DEPTH", "PHASE"],
    )
    out = deck_records(spark, text, "WELSPECS")
    return out.select(
        F.col("WELL").alias("well"), F.col("GROUP").alias("grp"),
        F.col("I").alias("i"), F.col("J").alias("j"),
        F.col("REF_DEPTH").alias("ref_depth"), F.col("PHASE").alias("phase"),
    ).orderBy("well")


# ---------------------------------------------------------------------------
# WLIST running list algebra (modules/wlist.py: W6 + R11) — the
# documented driver-side fold (NEW/ADD/DEL, recursive '*LIST'
# expansion, per-date snapshots) with well names from the nation
# parquet; the oracle enumerates the expected membership per snapshot.
# ---------------------------------------------------------------------------

_WLIST_SQL = """
    WITH w AS (
        SELECT n_name AS well, row_number() OVER (ORDER BY n_nationkey) - 1 AS i
        FROM nation ORDER BY n_nationkey LIMIT 5),
    snaps AS (
        SELECT CAST('2020-01-01' AS TIMESTAMP) AS d, 'OPS' AS name, well
        FROM w WHERE i IN (0, 1)
        UNION ALL
        SELECT CAST('2020-01-01' AS TIMESTAMP), 'GAS', well FROM w WHERE i = 2
        UNION ALL
        SELECT CAST('2020-02-01' AS TIMESTAMP), 'OPS', well
        FROM w WHERE i IN (0, 1, 2, 3)
        UNION ALL
        SELECT CAST('2020-02-01' AS TIMESTAMP), 'ALL', well
        FROM w WHERE i IN (0, 1, 2, 3, 4))
    SELECT d, name, well FROM snaps ORDER BY d, name, well
"""


@_q("wlist_fold", _WLIST_SQL)
def wlist_fold(spark, sf_dir):
    """W6 + R11 (reference compdat.py:556-653): NEW seeds two lists at
    the START date; a second dated block ADDs two wells, DELs one (the
    R11 set difference — GAS empties and emits nothing) and NEWs a list
    through a recursive '*OPS' reference resolved at definition time.
    One snapshot of full list state per date with changes; list names
    lose the Eclipse asterisk.  The oracle enumerates the same
    membership from nation."""
    from res2df_spark.modules import wlist

    names = [
        str(r.n_name)
        for r in Catalog(spark, sf_dir).nation
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .limit(5)
        .collect()  # 5 rows — dim-table scale
    ]
    w = [f"'{n}'" for n in names]
    deck = f"""
START
  1 JAN 2020 /
WLIST
  '*OPS' 'NEW' {w[0]} {w[1]} /
  '*GAS' 'NEW' {w[2]} /
/
DATES
  1 FEB 2020 /
/
WLIST
  '*OPS' 'ADD' {w[2]} {w[3]} /
  '*GAS' 'DEL' {w[2]} /
  '*ALL' 'NEW' '*OPS' {w[4]} /
/
"""
    out = wlist.df(spark, deck)
    return out.select(
        F.col("DATE").cast("timestamp").alias("d"),
        F.col("NAME").alias("name"),
        F.col("WELL").alias("well"),
    ).orderBy("d", "name", "well")


# ---------------------------------------------------------------------------
# Directional transmissibility filter (modules/grid.py trans_df: P7) —
# the direction want-list ("IJ" excludes K faces) and the
# sealing-fault/NULL row drops, oracled as filtered projections in SQL.
# ---------------------------------------------------------------------------

_TRANS_DIR_SQL = """
    WITH src AS (
        SELECT CAST(e % 2 + 1 AS INT) AS i, CAST((e // 2) % 2 + 1 AS INT) AS j,
               CAST(e // 4 + 1 AS INT) AS k,
               CASE WHEN e % 3 = 0 THEN NULL ELSE price END AS tranx,
               CASE WHEN e = 1 THEN 0.0 ELSE disc END AS trany
        FROM (
            SELECT l_extendedprice AS price, l_discount AS disc,
                   row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS e
            FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 8))
    SELECT i AS i1, j AS j1, k AS k1, CAST(i + 1 AS INT) AS i2, j AS j2, k AS k2,
           'I' AS dir, CAST(tranx AS DOUBLE) AS tran
    FROM src WHERE tranx > 0
    UNION ALL
    SELECT i, j, k, i, CAST(j + 1 AS INT), k, 'J', CAST(trany AS DOUBLE)
    FROM src WHERE trany > 0
    ORDER BY dir, i1, j1, k1
"""


@_q("trans_directional", _TRANS_DIR_SQL)
def trans_directional(spark, sf_dir):
    """P7 direction want-list (reference trans.py:106-135): a 2x2x2
    grid frame with TRANX (NULL every third cell), TRANY (one sealing
    0.0 face) and TRANZ runs through trans_df(directions='IJ') — K
    faces excluded by the filter, NULL and zero faces dropped, the +I/
    +J neighbour addresses synthesized map-only.  The oracle recomputes
    the filtered projections in SQL."""
    from res2df_spark.modules.grid import trans_df

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                "l_discount", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(8)
        .collect()  # 8 cells — fixture-grid scale
    )
    data = []
    for e, r in enumerate(rows):
        data.append((
            e % 2 + 1, (e // 2) % 2 + 1, e // 4 + 1,
            None if e % 3 == 0 else float(r.l_extendedprice),
            0.0 if e == 1 else float(r.l_discount),
            float(r.l_quantity),  # TRANZ present but excluded by 'IJ'
        ))
    grid = spark.createDataFrame(
        data, "I int, J int, K int, TRANX double, TRANY double, TRANZ double"
    )
    out = trans_df(grid, directions="IJ")
    return out.select(
        F.col("I1").alias("i1"), F.col("J1").alias("j1"),
        F.col("K1").alias("k1"),
        F.col("I2").alias("i2"), F.col("J2").alias("j2"),
        F.col("K2").alias("k2"),
        F.col("DIR").alias("dir"), F.col("TRAN").alias("tran"),
    ).orderBy("dir", "i1", "j1", "k1")


# ---------------------------------------------------------------------------
# VFPINJ writer -> parser fixed point (sinks/df2res.py df2res_vfpinj +
# modules/vfp.df_inj: K8 + R7) — the melted long form re-assembled
# into axis records and re-melted; BHP values come from lineitem so
# the oracle can recompute the whole grid.
# ---------------------------------------------------------------------------

_VFPINJ_RT_SQL = """
    WITH src AS (
        SELECT l_extendedprice AS bhp,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS e
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 6)
    SELECT CAST(1 AS INT) AS tab, CAST(2500.0 AS DOUBLE) AS datum,
           CAST(100.0 * (e // 3 + 1) AS DOUBLE) AS thp,
           CAST(1000.0 * (e % 3 + 1) AS DOUBLE) AS rate,
           bhp
    FROM src ORDER BY thp, rate
"""


@_q("vfpinj_writer_roundtrip", _VFPINJ_RT_SQL)
def vfpinj_writer_roundtrip(spark, sf_dir):
    """K8 df -> VFPINJ text -> df fixed point (reference
    vfp/_vfpinj.py df2res + basic_data parse): a 2-THP x 3-RATE grid
    with lineitem BHP values renders through df2res_vfpinj (axis
    extraction, per-THP value records) and re-parses through df_inj
    (axis zip + melt).  The oracle recomputes the grid; repr floats
    keep the text round-trip bit-exact."""
    from res2df_spark.modules.vfp import df_inj
    from res2df_spark.sinks.df2res import df2res_vfpinj

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(6)
        .collect()  # 6 rows — driver-side writer boundary
    )
    data = [
        (1, 2500.0, 100.0 * (e // 3 + 1), 1000.0 * (e % 3 + 1),
         float(r.l_extendedprice))
        for e, r in enumerate(rows)
    ]
    src = spark.createDataFrame(
        data, "TABLE int, DATUM double, THP double, RATE double, BHP double"
    )
    text = df2res_vfpinj(src)
    out = df_inj(spark, text)
    return out.select(
        F.col("TABLE").alias("tab"), F.col("DATUM").alias("datum"),
        F.col("THP").alias("thp"), F.col("RATE").alias("rate"),
        F.col("BHP").alias("bhp"),
    ).orderBy("thp", "rate")


# ---------------------------------------------------------------------------
# Nested PVTO writer -> parser fixed point (sinks/df2res.py df2res_pvt
# + modules/tables.pvt_df: K8 + R10) — the hardest include renderer:
# one record per outer RS value holding its undersaturated inner rows,
# a lone '/' closing the PVTNUM.
# ---------------------------------------------------------------------------

_PVTO_RT_SQL = """
    WITH src AS (
        SELECT l_discount AS vf, l_tax AS visc,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS e
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 4)
    SELECT 'PVTO' AS keyword, CAST(1 AS INT) AS pvtnum,
           CAST(e % 2 AS INT) AS row_idx,
           CAST(100.0 * (e // 2 + 1) AS DOUBLE) AS rs,
           CAST(1000.0 * (e % 2 + 1) + 2000.0 * (e // 2) AS DOUBLE) AS pressure,
           vf AS volumefactor, visc AS viscosity
    FROM src ORDER BY rs, row_idx
"""


@_q("pvto_writer_roundtrip", _PVTO_RT_SQL)
def pvto_writer_roundtrip(spark, sf_dir):
    """K8 nested df -> PVTO text -> df fixed point (reference
    pvt.py:329-645 _pvto_pvtnum nesting + the R10 arbitrary-length
    record unroll): two RS records of two undersaturated rows each
    render through df2res_pvt and re-parse through pvt_df to the same
    (PVTNUM, ROW_IDX, RS, PRESSURE, VOLUMEFACTOR, VISCOSITY) rows; the
    oracle recomputes the grid with lineitem floats."""
    from res2df_spark.modules.tables import pvt_df
    from res2df_spark.sinks.df2res import df2res_pvt

    rows = (
        Catalog(spark, sf_dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(4)
        .collect()  # 4 rows — driver-side writer boundary
    )
    data = [
        ("PVTO", 1, e % 2, 100.0 * (e // 2 + 1),
         1000.0 * (e % 2 + 1) + 2000.0 * (e // 2),
         float(r.l_discount), float(r.l_tax))
        for e, r in enumerate(rows)
    ]
    src = spark.createDataFrame(
        data,
        "KEYWORD string, PVTNUM int, ROW_IDX int, RS double, "
        "PRESSURE double, VOLUMEFACTOR double, VISCOSITY double",
    )
    text = df2res_pvt(src)
    out = pvt_df(spark, text)
    return out.select(
        F.col("KEYWORD").alias("keyword"), F.col("PVTNUM").alias("pvtnum"),
        F.col("ROW_IDX").alias("row_idx"), F.col("RS").alias("rs"),
        F.col("PRESSURE").alias("pressure"),
        F.col("VOLUMEFACTOR").alias("volumefactor"),
        F.col("VISCOSITY").alias("viscosity"),
    ).orderBy("rs", "row_idx")


@_q(
    "a5_dedup_keep_agg",
    """
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def a5_dedup_keep_agg(spark, sf_dir):
    """Keep-last dedup as a partial-aggregatable max_by (A5, skew-safe
    form — operators/windows.dedup_keep_agg, round 6): identical output
    to a5_dedup_keep_last on a totally-ordered key, but a hot key
    collapses map-side to one candidate per task instead of pinning one
    window task — the documented mitigation for window-partition skew
    AQE cannot split."""
    from res2df_spark.operators.windows import dedup_keep_agg

    ev = Catalog(spark, sf_dir).events
    return dedup_keep_agg(
        ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"], keep="last"
    ).select("user_id", "event_type", "event_id", "ts", "value")


@_q(
    "hybrid_rrf",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    pairs AS (SELECT q.q_id, e.vec_id, q.qv, e.embedding AS ev
              FROM q, embeddings e WHERE e.vec_id <> q.q_id),
    d64 AS (SELECT q_id, vec_id,
                   sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                   sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                   sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
            FROM (SELECT q_id, vec_id, qv, ev,
                         unnest(generate_series(1, 64)) AS i FROM pairs)
            GROUP BY 1, 2),
    d8 AS (SELECT q_id, vec_id,
                  sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                  sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                  sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
           FROM (SELECT q_id, vec_id, qv, ev,
                        unnest(generate_series(1, 8)) AS i FROM pairs)
           GROUP BY 1, 2),
    r64 AS (SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
            FROM d64),
    r8 AS (SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
           FROM d8),
    u AS (SELECT q_id, vec_id, rnk FROM r64 WHERE rnk <= 10
          UNION ALL SELECT q_id, vec_id, rnk FROM r8 WHERE rnk <= 10),
    f AS (SELECT q_id, vec_id, round(sum(1.0 / (60 + rnk)), 6) AS rrf_score,
                 count(*) AS n_systems
          FROM u GROUP BY 1, 2)
    SELECT q_id, vec_id, CAST(rrf_score AS DOUBLE) AS rrf_score,
           CAST(n_systems AS BIGINT) AS n_systems,
           CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_score DESC, vec_id) AS BIGINT) AS fused_rank
    FROM f
    """,
)
def hybrid_rrf(spark, sf_dir):
    """Reciprocal-rank fusion (llm/similarity.rrf_fuse, round 6) of two
    exact retrievals: full 64-dim cosine top-10 and the 8-dim
    matryoshka-prefix cosine top-10 — the multi-vector ensemble /
    hybrid-search combiner (Σ 1/(60+rank)).  One union + one
    partial-agg groupBy on (query, doc) + a per-query window over at
    most systems×k rows; fused ranking on the 6dp-rounded score with
    doc-id tie-break so ranks are engine-portable.  The oracle
    recomputes both rankings and the fusion arithmetic."""
    from res2df_spark.llm.similarity import brute_force_topk, rrf_fuse

    emb = Catalog(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") < 8)
    full = brute_force_topk(emb, q, k=10)
    emb8 = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    pre8 = brute_force_topk(emb8, emb8.filter(F.col("vec_id") < 8), k=10)
    return rrf_fuse([full, pre8], k=60)


@_q(
    "mm_features_arity",
    """
    WITH m AS (SELECT doc_id, md5(text) AS h0 FROM documents),
    b AS (SELECT doc_id, h0, md5(h0 || '1') AS h1 FROM m),
    f AS (SELECT doc_id, h0, h1, unnest(generate_series(0, 5)) AS j FROM b),
    hx AS (SELECT doc_id, j,
                  CASE WHEN j < 4 THEN h0 ELSE h1 END AS h,
                  (j % 4) * 8 AS off FROM f),
    nib AS (SELECT doc_id, j,
                   sum((strpos('0123456789abcdef',
                               substr(h, CAST(off + i AS INT), 1)) - 1)
                       * power(16.0, 8 - i)) AS w
            FROM (SELECT doc_id, j, h, off,
                         unnest(generate_series(1, 8)) AS i FROM hx)
            GROUP BY doc_id, j)
    SELECT doc_id,
           string_agg(CAST(CAST(round(w / 4294967296.0, 6)
                                AS DECIMAL(20, 6)) AS VARCHAR),
                      ',' ORDER BY j) AS feats_csv,
           CASE WHEN max(w) IS NULL THEN NULL
                ELSE CAST(6 AS BIGINT) END AS n_features
    FROM nib GROUP BY doc_id
    """,
)
def mm_features_arity(spark, sf_dir):
    """Parametric feature arity (round 6): the SAME extract_features
    path at n_features=6 — features 4 and 5 come from the CHAINED
    second md5 block (md5(hexdigest + '1')), so this row proves the
    arity plumbing AND the block chaining, nibble-by-nibble in SQL.  A
    real embedder swaps in via decoder=/n_features= with no schema
    edit."""
    from res2df_spark.llm.multimodal import extract_features

    docs = Catalog(spark, sf_dir).documents
    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return _mm_feats_csv(extract_features(src, n_features=6)).drop(
        "n_bytes", "content_md5"
    )


# ---------------------------------------------------------------------------
# Round 7 — xxhash64 hash backend for the dedup hot paths
# ---------------------------------------------------------------------------


@_q("dedup_containment_xx", _CONTAINMENT_SQL)
def dedup_containment_xx(spark, sf_dir):
    """Containment pairs with the xxhash64 element-hash backend
    (llm/dedup.containment_pairs hash_fn='xxhash64', round 7): shingle
    strings are replaced by 64-bit integer hashes before the inverted
    index, so the pair join shuffles 8-byte longs instead of multi-word
    strings.  Set sizes and intersections — hence c1/c2 and the
    surviving pairs — are invariant under the injective hash map, so
    this row shares dedup_containment's raw-shingle ORACLE verbatim:
    a hash-green match here PROVES the integer-keyed index computes
    the same pairs."""
    from res2df_spark.llm.dedup import containment_pairs

    docs = Catalog(spark, sf_dir).documents
    return containment_pairs(
        docs, threshold=0.8, shingle_k=3, hash_fn="xxhash64"
    )


_SIMHASH_XX_INV_SQL = """
    WITH t AS (SELECT doc_id,
                      list_sort(list_distinct(list_filter(
                          string_split_regex(lower(trim(text)), '\\s+'),
                          x -> x <> ''))) AS ts
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT a.doc_id AS d1, b.doc_id AS d2
          FROM t a JOIN t b ON a.ts = b.ts AND a.doc_id < b.doc_id
          WHERE len(a.ts) > 0)
    SELECT (SELECT count(*) FROM p) AS n_exact_pairs,
           CAST(0 AS BIGINT) AS n_exact_missing,
           CAST(0 AS BIGINT) AS n_bound_violations,
           CAST(0 AS BIGINT) AS n_noncanonical,
           CAST(0 AS BIGINT) AS n_duplicate_rows
"""


@_q("dedup_simhash_pairs_xx", _SIMHASH_XX_INV_SQL)
def dedup_simhash_pairs_xx(spark, sf_dir):
    """SimHash near-dup pairing on the xxhash64 backend
    (llm/dedup.simhash_near_pairs hash_fn='xxhash64', round 7): one
    64-bit integer hash per token replaces md5 + two hex conv()s — the
    production hash for signature CPU at 100 TB.  Signature BITS differ
    from the md5 family (both are valid SimHash instances), so the
    near-threshold pair MEMBERSHIP cannot be replayed by DuckDB
    (Spark's seed-42 XXH64 over its internal encoding).  Round 9
    (verdict #6): instead of a rows-only registration, this row
    hash-verifies every DuckDB-derivable INVARIANT of the actual xx
    pair set in one summary row:

    * ``n_exact_pairs`` — identical-distinct-token-set pairs, the
      hash-independent ground truth DuckDB recomputes from raw text;
    * ``n_exact_missing`` = 0 — every exact pair present at Hamming 0
      (anti-join of truth against the xx Hamming-0 set);
    * ``n_bound_violations`` = 0 — every emitted pair within
      0 ≤ hamming ≤ max_hamming;
    * ``n_noncanonical`` = 0 — canonical d1 < d2 ordering;
    * ``n_duplicate_rows`` = 0 — pair set is a set (count minus
      countDistinct over (d1, d2)).

    tests/test_hashfn.py still pins schema parity of the raw pair frame
    with the md5 row, and dedup_simhash_xx_exact_pairs hash-verifies
    the per-pair Hamming-0 lane; the md5 sibling dedup_simhash_pairs
    remains the fully-oracled raw-pair registration.

    Plan: the truth side is one groupBy on the sorted-distinct token
    array; the pair side is the shared signature pipeline, enumerated
    ONCE; a tagged p∪e union grouped per (d1, d2) carries every
    invariant (the old anti-join lane re-ran the pair enumeration) —
    no cartesian, no collect before the driver's own."""
    from res2df_spark.functions.textan import tokens
    from res2df_spark.llm.dedup import _bucket_pairs, simhash_near_pairs

    docs = Catalog(spark, sf_dir).documents
    pairs = simhash_near_pairs(docs, max_hamming=3, hash_fn="xxhash64")
    ts = F.array_sort(F.array_distinct(tokens(F.col("text"))))
    truth = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id"), ts.alias("__ts"))
        .filter(F.size("__ts") > 0)
        .groupBy("__ts")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    truth = _bucket_pairs(truth, "ids").select(
        F.col("a").alias("d1"), F.col("b").alias("d2")
    )
    # The "exact pair missing from the Hamming-0 lane" check used to be
    # a third union branch built by anti-joining truth against a
    # RE-DERIVED ham0 pair set — which re-ran the whole bucket assembly
    # + C(n,2) pair Generate + (d1,d2) aggregate a second time (only
    # the signature exchange below them was plan-reused).  Instead,
    # union just the p and e rows, group ONCE per (d1, d2), and express
    # every invariant over the per-pair tallies: a truth pair is
    # "missing" exactly when its group holds no p row with hamming = 0
    # (the anti-join's membership test), and count−countDistinct over p
    # rows is Σp_cnt − #groups-with-p.  Pair enumeration now executes
    # once; the anti-join, its broadcast, and the count_distinct
    # expansion are gone.
    is_p, is_e = F.col("t") == "p", F.col("t") == "e"
    tagged = pairs.select(
        F.lit("p").alias("t"), "d1", "d2", "hamming"
    ).unionByName(
        truth.select(
            F.lit("e").alias("t"), "d1", "d2",
            F.lit(0).cast(pairs.schema["hamming"].dataType).alias("hamming"),
        )
    )
    per_pair = tagged.groupBy("d1", "d2").agg(
        F.sum(is_e.cast("long")).alias("__e"),
        F.sum(is_p.cast("long")).alias("__p"),
        F.sum((is_p & (F.col("hamming") == 0)).cast("long")).alias("__h0"),
        F.sum(
            (
                is_p
                & ~((F.col("hamming") >= 0) & (F.col("hamming") <= 3))
            ).cast("long")
        ).alias("__viol"),
        F.sum((is_p & (F.col("d1") >= F.col("d2"))).cast("long")).alias(
            "__noncan"
        ),
    )
    return per_pair.agg(
        F.coalesce(F.sum("__e"), F.lit(0)).alias("n_exact_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("__h0") == 0, F.col("__e")).otherwise(0)),
            F.lit(0),
        ).alias("n_exact_missing"),
        F.coalesce(F.sum("__viol"), F.lit(0)).alias("n_bound_violations"),
        F.coalesce(F.sum("__noncan"), F.lit(0)).alias("n_noncanonical"),
        (
            F.coalesce(F.sum("__p"), F.lit(0))
            - F.coalesce(
                F.sum((F.col("__p") > 0).cast("long")), F.lit(0)
            )
        ).alias("n_duplicate_rows"),
    )


from res2df_spark.suite import ORACLES as _ORACLES  # noqa: E402


@_q("j9_asof_chunked", _ORACLES["j9_asof_join"])
def j9_asof_chunked(spark, sf_dir):
    """Skew-safe chunked as-of join (operators/asof.asof_join_chunked,
    round 7): identical point-in-time semantics partitioned on
    (user, time-chunk) — the unbounded lookback is preserved by a
    CHUNK-GRAIN carry (latest observation per (key, chunk),
    forward-filled over the key's chunk sequence, injected as one
    synthetic observation per chunk at its true time).  Shares
    j9_asof_join's LATERAL oracle verbatim: a hash-green row proves the
    decomposition exact, ties and all."""
    from res2df_spark.operators.asof import asof_join_chunked

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join_chunked(
        purchases,
        views,
        on=["user_id"],
        left_time="purchase_ts",
        right_time="ts",
        value_cols=["view_value", "view_event_id"],
        chunk_seconds=7 * 86_400,
    ).select("user_id", "purchase_ts", "purchase_id", "view_value", "view_event_id")


# ---------------------------------------------------------------------------
# Round 8 — A/B completeness oracle for the simhash hash backends; the
# xxhash64 production profile for the composed reweighting pipeline
# ---------------------------------------------------------------------------

_SIMHASH_XX_EXACT_SQL = """
    WITH t AS (SELECT doc_id,
                      list_sort(list_distinct(list_filter(
                          string_split_regex(lower(trim(text)), '\\s+'),
                          x -> x <> ''))) AS ts
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT a.doc_id AS d1, b.doc_id AS d2
          FROM t a JOIN t b ON a.ts = b.ts AND a.doc_id < b.doc_id
          WHERE len(a.ts) > 0)
    SELECT d1, d2, CAST(0 AS BIGINT) AS ham_xx, CAST(0 AS BIGINT) AS ham_md5
    FROM p
"""


@_q("dedup_simhash_xx_exact_pairs", _SIMHASH_XX_EXACT_SQL)
def dedup_simhash_xx_exact_pairs(spark, sf_dir):
    """A/B completeness gate for the simhash hash backends (round 8,
    shrinking dedup_simhash_pairs_xx's non-oracled surface): documents
    with IDENTICAL distinct-token sets — exact duplicates as simhash
    sees them, a hash-independent ground truth DuckDB rebuilds from raw
    text — must appear at Hamming distance 0 under BOTH backends.  The
    ground-truth pair set inner-joins each backend's Hamming-0 pair set
    (simhash_near_pairs, the registered max_hamming=3 pigeonhole
    config), so a backend that misses even one true-duplicate pair
    drops rows and the hash goes red.  Hamming-0 COLLISIONS of
    non-identical token sets (vote coincidences — a handful exist at
    some SFs, under either backend) are legitimately engine-specific
    and excluded by the join; the xx row (dedup_simhash_pairs_xx) is
    hash-verified through its invariant summary since round 9.

    Plan: the truth side is one groupBy on the sorted-distinct token
    array (group payload = tiny id lists, pair enumeration is in-array
    combinatorics — no self-join); each backend side is the shared
    signature pipeline + one equality-bucket pass.  Three exchanges,
    all on bounded keys."""
    from res2df_spark.functions.textan import tokens
    from res2df_spark.llm.dedup import _bucket_pairs, simhash_near_pairs

    docs = Catalog(spark, sf_dir).documents
    ts = F.array_sort(F.array_distinct(tokens(F.col("text"))))
    truth = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id"), ts.alias("__ts"))
        .filter(F.size("__ts") > 0)
        .groupBy("__ts")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    truth = _bucket_pairs(truth, "ids").select(
        F.col("a").alias("d1"), F.col("b").alias("d2")
    )

    def ham0(hash_fn: str, out: str):
        return (
            simhash_near_pairs(docs, max_hamming=3, hash_fn=hash_fn)
            .filter(F.col("hamming") == 0)
            .select("d1", "d2", F.col("hamming").alias(out))
        )

    return (
        truth.join(ham0("xxhash64", "ham_xx"), ["d1", "d2"])
        .join(ham0("md5", "ham_md5"), ["d1", "d2"])
    )


@_q("curation_pipeline3_xx", _PIPELINE3_SQL)
def curation_pipeline3_xx(spark, sf_dir):
    """curation_pipeline3 on the xxhash64 production profile (round 8):
    the SAME dedup→reweight→rank chain with hash_fn='xxhash64' threaded
    through both composed builders — exact_duplicates groups on one
    64-bit integer instead of an md5 hex string, and soft_dedup_weights
    hashes its shingle-df join key to a long (8-byte shuffle keys
    through the two hottest exchanges).  Group membership and shingle
    document frequencies are invariant under the injective hash map, so
    this row shares curation_pipeline3's md5 ORACLE verbatim: a
    hash-green match proves the production profile computes identical
    weights end-to-end."""
    from res2df_spark.llm.dedup import exact_duplicates
    from res2df_spark.llm.weights import soft_dedup_weights

    docs = Catalog(spark, sf_dir).documents
    keepers = exact_duplicates(docs, hash_fn="xxhash64").select(
        F.col("keeper_id").alias("doc_id")
    )
    surv = docs.join(keepers, "doc_id", "left_semi")
    w = soft_dedup_weights(surv, hash_fn="xxhash64")
    top = w.orderBy(F.col("w_soft").desc(), F.col("doc_id")).limit(50)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("w_soft").desc(), F.col("doc_id"))
        ),
    )
    return ranked.select(
        "doc_id", "w_soft", F.col("rnk").cast("int").alias("rnk")
    )


# ---------------------------------------------------------------------------
# Round 8 — merge_asof direction family (forward / nearest)
# ---------------------------------------------------------------------------

_ASOF_FORWARD_SQL = """
    SELECT p.user_id, p.ts AS purchase_ts, p.event_id AS purchase_id,
           v.value AS view_value, v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT value, event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts >= p.ts
        ORDER BY v.ts ASC, v.value ASC NULLS FIRST, v.event_id ASC
        LIMIT 1
    ) v ON TRUE
"""


@_q("j9_asof_forward", _ASOF_FORWARD_SQL)
def j9_asof_forward(spark, sf_dir):
    """Forward as-of join (pandas merge_asof(direction='forward'),
    round 8): every purchase takes the EARLIEST view at-or-after it —
    the mirror of J9's latest-at-or-before, same single-shuffle
    union-window plan with the frame flipped to [current, following]
    (operators/asof.py).  Equal-time duplicates resolve to the payload
    struct sorting FIRST (the oracle's ASC NULLS FIRST mirrors Spark's
    struct ordering, where a NULL field sorts smallest).  Pinned
    ``skew_safe=False`` like j9_asof_join so the single-window form
    stays oracled; the chunked forward path is covered by
    j9_asof_nearest (whose carry machinery includes the forward
    mirror) and the chunked-equals-plain direction matrix in
    tests/test_asof_direction.py."""
    from res2df_spark.operators.asof import asof_join

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="purchase_ts",
        right_time="ts",
        value_cols=["view_value", "view_event_id"],
        direction="forward",
        skew_safe=False,
    ).select("user_id", "purchase_ts", "purchase_id", "view_value", "view_event_id")


_ASOF_NEAREST_SQL = """
    SELECT p.user_id, p.ts AS purchase_ts, p.event_id AS purchase_id,
           v.value AS view_value, v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT value, event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
        ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
                 (v.ts > p.ts) ASC,
                 CASE WHEN v.ts <= p.ts THEN v.value END DESC NULLS LAST,
                 CASE WHEN v.ts >  p.ts THEN v.value END ASC NULLS FIRST,
                 CASE WHEN v.ts <= p.ts THEN v.event_id END DESC NULLS LAST,
                 CASE WHEN v.ts >  p.ts THEN v.event_id END ASC NULLS FIRST
        LIMIT 1
    ) v ON TRUE
"""


@_q("j9_asof_nearest", _ASOF_NEAREST_SQL)
def j9_asof_nearest(spark, sf_dir):
    """Nearest as-of join (pandas merge_asof(direction='nearest'),
    round 8) on the DEFAULT skew-safe chunked path: every purchase
    takes whichever view is closer in time, equidistant candidates
    resolving BACKWARD (pandas semantics — the oracle's ``(v.ts >
    p.ts) ASC`` tiebreak after the exact µs-integer distance).  The
    chunked decomposition injects BOTH boundary carries per (user,
    chunk) — latest-before forward-filled and earliest-after
    backward-filled — so the per-chunk candidate set is exactly the
    plain form's; the two fills share one exchange+sort.
    ``chunk_seconds`` pinned (like j9_asof_chunked) so plan
    construction stays scan-free."""
    from res2df_spark.operators.asof import asof_join

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="purchase_ts",
        right_time="ts",
        value_cols=["view_value", "view_event_id"],
        direction="nearest",
        chunk_seconds=7 * 86_400,
    ).select("user_id", "purchase_ts", "purchase_id", "view_value", "view_event_id")


# ---------------------------------------------------------------------------
# Round 9 — oracles for the CLI-parity engine additions: three-phase
# pillar contacts (OWC/GOC with the epsilon-oil gas-cap guard and the
# reference's inner-join merge), constant-column dropping, and the
# stacked↔dated-headers reshape round-trip.
# ---------------------------------------------------------------------------

_PILLAR_CONTACTS_SQL = """
    WITH cells AS (
        SELECT CAST(l_orderkey % 5 + 1 AS INT) AS i,
               CAST(l_linenumber % 3 + 1 AS INT) AS j,
               l_extendedprice / 1000.0 AS z,
               l_discount * 9.0 AS swat,
               l_tax * 4.0 AS sgas
        FROM lineitem),
    soil AS (
        SELECT *, 1.0 - swat - sgas AS soil,
               CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS pillar
        FROM cells),
    water AS (SELECT DISTINCT pillar FROM soil WHERE swat > 0.4),
    owc AS (
        SELECT s.pillar, max(s.z) AS owc
        FROM soil s JOIN water w ON s.pillar = w.pillar
        WHERE s.soil > 0.3 GROUP BY s.pillar),
    gocp AS (SELECT DISTINCT pillar FROM soil WHERE soil > 0.01),
    goc AS (
        SELECT s.pillar, max(s.z) AS goc
        FROM soil s JOIN gocp g ON s.pillar = g.pillar
        WHERE s.sgas > 0.2 AND s.soil > 0.01 GROUP BY s.pillar)
    SELECT o.pillar, round(o.owc, 6) AS owc, round(g.goc, 6) AS goc
    FROM owc o JOIN goc g ON o.pillar = g.pillar
"""


@_q("pillar_contacts_3phase", _PILLAR_CONTACTS_SQL)
def pillar_contacts_3phase(spark, sf_dir):
    """Three-phase OWC/GOC contacts (modules/grid.pillar_contacts,
    round 9 — reference compute_pillar_contacts, pillars.py:192-318) on
    a synthetic saturation grid derived deterministically from
    lineitem: SOIL by phase closure, OWC = deepest SOIL-above-cutoff
    cell on water-bearing pillars, GOC = deepest SGAS-above-cutoff cell
    holding the epsilon (0.01) minimum oil saturation — the guard that
    keeps gas injected into the water phase out of the gas cap — and
    the reference's INNER merge of the two contact frames (pillars with
    only one contact drop).  Plan: three filter→groupBy passes and two
    equi-joins, all on the pillar key."""
    from res2df_spark.modules.grid import pillar_contacts

    li = Catalog(spark, sf_dir).lineitem
    cells = li.select(
        (F.col("l_orderkey") % 5 + 1).cast("int").alias("I"),
        (F.col("l_linenumber") % 3 + 1).cast("int").alias("J"),
        (F.col("l_extendedprice") / 1000.0).alias("Z"),
        (F.col("l_discount") * 9.0).alias("SWAT"),
        (F.col("l_tax") * 4.0).alias("SGAS"),
    ).withColumn(
        # the reference contract: SOIL is PRE-computed by the caller
        # (compute_volumes' phase closure) — its presence selects the
        # three-phase GOC branch over the gas-water GWC branch
        "SOIL", F.lit(1.0) - F.col("SWAT") - F.col("SGAS"),
    )
    out = pillar_contacts(
        cells, soilcutoff=0.3, sgascutoff=0.2, swatcutoff=0.4
    )
    return out.select(
        F.col("PILLAR").alias("pillar"),
        F.round("OWC", 6).alias("owc"),
        F.round("GOC", 6).alias("goc"),
    )


_DROP_CONSTANTS_SQL = """
    SELECT 'l_returnflag' AS col_name FROM lineitem
    HAVING count(DISTINCT l_returnflag)
           + max(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) > 1
    UNION ALL
    SELECT 'l_tax' FROM lineitem
    HAVING count(DISTINCT l_tax)
           + max(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) > 1
    UNION ALL
    SELECT 'const_one' FROM lineitem
    HAVING count(DISTINCT 1) + 0 > 1
    UNION ALL
    SELECT 'all_null' FROM lineitem
    HAVING count(DISTINCT CAST(NULL AS VARCHAR))
           + max(CASE WHEN CAST(NULL AS VARCHAR) IS NULL THEN 1 ELSE 0 END) > 1
    UNION ALL
    SELECT 'half_null' FROM lineitem
    HAVING count(DISTINCT CASE WHEN l_orderkey % 2 = 0 THEN 5.0 END)
           + max(CASE WHEN (CASE WHEN l_orderkey % 2 = 0 THEN 5.0 END)
                 IS NULL THEN 1 ELSE 0 END) > 1
"""


@_q("p4_drop_constants", _DROP_CONSTANTS_SQL)
def p4_drop_constants(spark, sf_dir):
    """Constant-column DROP as an engine operator
    (modules/grid.drop_constant_columns, round 9 — reference
    grid.py:590-620 with pandas ``.unique()`` NULL semantics): survivor
    column names of a frame with a constant, an all-NULL and a
    half-NULL synthetic column.  Constant and all-NULL drop (one
    "value" each); one-value-plus-NULLs is TWO values and stays.  The
    probe is one map-side min/max aggregation — no countDistinct
    Expand — and the survivors become rows so DuckDB re-derives the
    same set from the same table."""
    from res2df_spark.modules.grid import drop_constant_columns

    li = Catalog(spark, sf_dir).lineitem
    df = li.select(
        "l_returnflag",
        "l_tax",
        F.lit(1).alias("const_one"),
        F.lit(None).cast("string").alias("all_null"),
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(5.0)).alias("half_null"),
    )
    out = drop_constant_columns(df)
    return spark.createDataFrame(
        [(c,) for c in out.columns], "col_name string"
    )


_DATES_RT_SQL = """
    WITH obs AS (
        SELECT event_type, date_trunc('month', ts) AS dt,
               round(sum(value), 2) AS total,
               CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2)
    SELECT event_type, 'TOTAL' AS variable, CAST(dt AS TIMESTAMP) AS d,
           total AS v
    FROM obs
    UNION ALL
    SELECT event_type, 'N', CAST(dt AS TIMESTAMP), n FROM obs
"""


@_q("r12_dates_roundtrip", _DATES_RT_SQL)
def r12_dates_roundtrip(spark, sf_dir):
    """dates_to_headers (operators/reshape, round 9 — the reference's
    default non-stackdates restart shape, grid.py:258-262) verified by
    ROUND-TRIP: monthly per-type aggregates are pivoted to
    ``NAME@YYYY-MM-DD`` headers and melted back with
    stack_dated_columns; the result must equal the long frame DuckDB
    computes directly, proving the pivot put every value under the
    right (name, date) header (a swapped or mis-tagged column breaks
    the hash).  NULL cells fabricated by the pivot for absent
    (type, month) pairs are dropped on the way back — the original
    long frame has no such rows.  The pivot's distinct-date collect is
    bounded by the number of months in the corpus."""
    from res2df_spark.operators.reshape import (
        dates_to_headers,
        stack_dated_columns,
    )

    ev = Catalog(spark, sf_dir).events
    obs = ev.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("DATE")
    ).agg(
        F.round(F.sum("value"), 2).alias("TOTAL"),
        F.count(F.lit(1)).cast("double").alias("N"),
    )
    wide = dates_to_headers(obs, ["event_type"])
    dated = [c for c in wide.columns if "@" in c]
    back = stack_dated_columns(
        wide, ["event_type"], dated,
        var_name="variable", date_name="d", value_name="v",
    )
    return back.filter(F.col("v").isNotNull()).select(
        "event_type", "variable",
        F.col("d").cast("timestamp").alias("d"), "v",
    )


@_q("stream_asof_enrich", _ORACLES["j9_asof_join"])
def stream_asof_enrich(spark, sf_dir):
    """Streaming point-in-time enrichment (streaming/ops.
    asof_enrich_stream, round 9) — the streaming twin of the batch J9
    as-of join: views and purchases arrive as ONE stream, views update
    a per-user single-observation state (constant per-key state — the
    unbounded-backward lookback a stream-stream interval join cannot
    give), purchases emit enriched with the latest at-or-before view.
    The available-now replay over the finite events table shares
    j9_asof_join's LATERAL oracle VERBATIM — a hash-green row proves
    the stateful walk reproduces the batch union-window engine, ties,
    NULL times and never-observed keys included."""
    from res2df_spark.streaming.ops import asof_enrich_stream, run_available_now

    ev = Catalog(spark, sf_dir).stream_table("events")
    src = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").alias("__probe"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("view_value"),
        F.col("event_id").alias("view_event_id"),
    )
    out = run_available_now(
        asof_enrich_stream(
            src, ["user_id"], "ts", "__probe",
            ["view_value", "view_event_id"],
        ),
        name="stream_asof_enrich",
        output_mode="append",
    )
    return out.select(
        "user_id", F.col("ts").alias("purchase_ts"), "purchase_id",
        "view_value", "view_event_id",
    )


_RESTART_CHAIN_SQL = """
    WITH agg AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(count(*) AS DOUBLE) AS fopt
        FROM orders GROUP BY 1 ORDER BY m LIMIT 4),
    r AS (SELECT m, fopt, row_number() OVER (ORDER BY m) AS rn FROM agg)
    SELECT CAST(m AS TIMESTAMP) AS d, 'FOPT' AS vector,
           CAST(CAST(fopt AS REAL) AS DOUBLE) AS value
    FROM r WHERE rn <= 2
    UNION ALL
    SELECT CAST(m AS TIMESTAMP) AS d, 'FOPT' AS vector,
           CAST(CAST(fopt * 2 AS REAL) AS DOUBLE) AS value
    FROM r WHERE rn >= 3
"""


@_q("summary_restart_chain", _RESTART_CHAIN_SQL)
def summary_restart_chain(spark, sf_dir):
    """include_restart stitching (sources/eclbin.summary_long, round 9
    — reference summary.py:299 / resdatafiles.py:134-149): a parent
    case holding three monthly FOPT values and a child case whose
    SMSPEC RESTART keyword names it (child values doubled, overlapping
    the parent's last month) are written as binary SMSPEC/UNSMRY pairs;
    reading the CHILD with include_restart=True must return the
    parent's history STRICTLY BEFORE the child's first date plus the
    child's own rows — the parent's overlapping month must show the
    CHILD's doubled value, proving the cutoff is the child's first
    report, not a blind union.  The oracle recomputes the stitched
    series from the same orders aggregate with the float32 cast."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from res2df_spark.sources.eclbin import (
        summary_long,
        write_keyword,
        write_summary,
    )

    months = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(F.count(F.lit(1)).cast("double").alias("fopt"))
        .orderBy("m")
        .limit(4)
        .collect()  # 4 rows — driver-side writer boundary, like all K* sinks
    )
    idx = pd.to_datetime([r["m"] for r in months])
    fopt = [r["fopt"] for r in months]
    d = tempfile.mkdtemp(prefix="eclbin_restart_")

    parent = os.path.join(d, "PARENT.SMSPEC")
    pw = pd.DataFrame({"FOPT": fopt[:3]}, index=idx[:3])
    write_summary(parent, idx[0].to_pydatetime(), pw)

    child = os.path.join(d, "CHILD.SMSPEC")
    cw = pd.DataFrame({"FOPT": [v * 2 for v in fopt[2:4]]}, index=idx[2:4])
    write_summary(child, idx[2].to_pydatetime(), cw)
    with open(child, "ab") as f:
        write_keyword(f, "RESTART", "CHAR", ["PARENT"])

    out = summary_long(spark, child, include_restart=True)
    return out.filter(F.col("VECTOR") == "FOPT").select(
        F.col("DATE").alias("d"), F.col("VECTOR").alias("vector"),
        F.col("VALUE").alias("value"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# S10/R7 — the reference-vocabulary VFP accessor (vfp.df: RATE/PRESSURE/
# TAB columns + VFP_TYPE/TABLE_NUMBER/*_TYPE meta, _vfp.py:244-284),
# NEW in round 11.  One full-meta table and one fully-defaulted-meta
# table pin the default vocabulary (GAS/WCT/GOR/''/THP/BHP/DEFAULT).
# ---------------------------------------------------------------------------

_VFP_REF_DECK = """
VFPPROD
  1 3000.0 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'METRIC' 'BHP' /
  100 200 /
  10 /
  0.0 /
  0.0 /
  0.0 /
  1 1 1 1  500 450 /
VFPPROD
  2 4000.0 /
  50 /
  40 /
  0 /
  500 /
  0 /
  1 1 1 1  160.5 /
VFPINJ
  3 3200.0 'WAT' 'THP' 'FIELD' 'BHP' /
  100 200 /
  10 20 /
  1 2000 2100 /
  2 2200 2300 /
VFPINJ
  4 2500.0 /
  50 /
  10 /
  1 300 /
"""


@_q(
    "vfp_reference_prod",
    """
    WITH expected(rate, pressure, wfr, gfr, alq, tab, vfp_type,
                  table_number, datum, rate_type, wfr_type, gfr_type,
                  alq_type, pressure_type, tab_type, unit_type) AS (VALUES
        (100.0, 10.0, 0.0, 0.0, 0.0, 500.0, 'VFPPROD', 1, 3000.0,
         'LIQ', 'WCT', 'GOR', '''''', 'THP', 'BHP', 'METRIC'),
        (200.0, 10.0, 0.0, 0.0, 0.0, 450.0, 'VFPPROD', 1, 3000.0,
         'LIQ', 'WCT', 'GOR', '''''', 'THP', 'BHP', 'METRIC'),
        (50.0, 40.0, 0.0, 500.0, 0.0, 160.5, 'VFPPROD', 2, 4000.0,
         'GAS', 'WCT', 'GOR', '''''', 'THP', 'BHP', 'DEFAULT'))
    SELECT rate, pressure, wfr, gfr, alq, tab, vfp_type,
           CAST(table_number AS INT) AS table_number, datum, rate_type,
           wfr_type, gfr_type, alq_type, pressure_type, tab_type,
           unit_type
    FROM expected
    """,
)
def vfp_reference_prod(spark, sf_dir):
    """The reference-shape VFPPROD frame over an embedded two-table
    deck: full meta on table 1, fully-defaulted meta on table 2 (the
    default vocabulary is part of the contract)."""
    from res2df_spark.modules import vfp

    out = vfp.df(spark, _VFP_REF_DECK, "VFPPROD")
    return out.select(*[F.col(c).alias(c.lower()) for c in out.columns])


@_q(
    "vfp_reference_inj",
    """
    WITH expected(rate, pressure, tab, vfp_type, table_number, datum,
                  rate_type, pressure_type, tab_type, unit_type) AS (VALUES
        (100.0, 10.0, 2000.0, 'VFPINJ', 3, 3200.0, 'WAT', 'THP', 'BHP', 'FIELD'),
        (200.0, 10.0, 2100.0, 'VFPINJ', 3, 3200.0, 'WAT', 'THP', 'BHP', 'FIELD'),
        (100.0, 20.0, 2200.0, 'VFPINJ', 3, 3200.0, 'WAT', 'THP', 'BHP', 'FIELD'),
        (200.0, 20.0, 2300.0, 'VFPINJ', 3, 3200.0, 'WAT', 'THP', 'BHP', 'FIELD'),
        (50.0, 10.0, 300.0, 'VFPINJ', 4, 2500.0, 'GAS', 'THP', 'BHP', 'DEFAULT'))
    SELECT rate, pressure, tab, vfp_type,
           CAST(table_number AS INT) AS table_number, datum, rate_type,
           pressure_type, tab_type, unit_type
    FROM expected
    """,
)
def vfp_reference_inj(spark, sf_dir):
    """The reference-shape VFPINJ frame over the same embedded deck
    (table 3 full meta incl. FIELD units, table 4 defaulted)."""
    from res2df_spark.modules import vfp

    out = vfp.df(spark, _VFP_REF_DECK, "VFPINJ")
    return out.select(*[F.col(c).alias(c.lower()) for c in out.columns])
