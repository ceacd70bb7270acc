"""Zone-aggregated completion data: engine-layer equivalent of the
reference's ``wellcompletiondata.df()``
(/root/reference/src/res2df/wellcompletiondata.py:129-215).

Pipeline: connection table (modules/compdat) ⋈ zonemap (J4 broadcast
lookup on K) → A4 conditional zone aggregation: a zone is OPEN at a
date if ANY of its connections is OPEN; KH is summed over open
connections only (else 0).  Well-prefix exclusion is P8.

With ``connstatus`` given (the reference's ``use_wellconnstatus=True``,
wellcompletiondata.py:168-215), the OPEN/SHUT timeline comes from
the CPI-derived connection-status events instead of the schedule file:
connstatus rows are enriched with compdat's (KH, ZONE) per connection,
and wells absent from connstatus fall back to their compdat rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

#: KH unit per deck unit system — reference wellcompletiondata.py:21-33
#: (UnitSystem/KHUnit enums) + _get_metadata (:114-127).  METRIC is the
#: simulator default when no unit keyword is present in the deck.
KH_UNITS = {
    "METRIC": "mDm",
    "FIELD": "mDft",
    "LAB": "mDcm",
    "PVT-M": "mDm",
    "PVTM": "mDm",
}


def merge_connstatus(connstatus: DataFrame, compdat_zoned: DataFrame) -> DataFrame:
    """J11: merge schedule-file compdat properties onto the CPI-derived
    connection-status timeline — the reference's
    ``_merge_compdat_and_connstatus``
    (/root/reference/src/res2df/wellcompletiondata.py:168-215).

    ``connstatus``: (WELL, I, J, K, DATE, OP/SH) status-change events
    from :mod:`res2df_spark.modules.wellconnstatus` (the reference's
    single-K ``K`` plays its ``K1``).
    ``compdat_zoned``: (WELL, I, J, K, OP_SH, DATE, KH, ZONE, …)
    connection rows with ZONE already attached (NULL where unzoned).

    Reference semantics, re-expressed shuffle-minimally:

    * The reference left-joins connstatus to compdat on (WELL,I,J,K1)
      and then drops duplicates on (DATE, WELL, I, J, K1) keeping the
      FIRST — i.e. for a connection with several compdat rows, the
      first row in compdat order (the deck's date-cursor order) wins
      for every status event.  Equivalently: pre-dedup compdat to ONE
      row per connection key keeping the earliest DATE *before* the
      join — identical output with no join fan-out, and the dedup is
      the skew-safe A5 aggregate (partial-aggregatable ``min_by``).
      Ties within a DATE break deterministically on (OP_SH, KH) — the
      reference inherits whatever deck record order was (documented
      "no logic to handle KH changing with time", :185-187).
    * Wells present in compdat but absent from connstatus keep their
      compdat rows verbatim (anti-join concat, :209-211).  Conversely,
      when a well HAS connstatus rows its compdat rows are ignored,
      and always-shut connections (absent from connstatus by
      construction) vanish — both documented reference quirks
      (:176-184).
    * KH is filled with 0 where no compdat row matched (:214).

    Input contract: ``connstatus`` carries at most one event per
    (WELL, I, J, K, DATE) — the :mod:`wellconnstatus` output shape
    (status CHANGES cannot repeat a timestamp per connection).  Two
    conflicting same-time events would both survive here, where the
    reference's row-order drop_duplicates keeps an arbitrary first —
    neither order is meaningful, so the engine does not invent one.

    Returns (WELL, I, J, K, DATE, OP_SH, KH, ZONE).
    """
    key = ["WELL", "I", "J", "K"]
    from res2df_spark.operators.windows import dedup_keep

    cd = compdat_zoned.select(*key, "OP_SH", "DATE", "KH", "ZONE")
    cd_first = dedup_keep(
        cd, key, order_by=["DATE", "OP_SH", "KH"], keep="first"
    ).select(*key, "KH", "ZONE")
    enriched = connstatus.select(
        *key, "DATE", F.col("`OP/SH`").alias("OP_SH")
    ).join(cd_first, key, "left")
    # wells absent from the (small) status-event table fall back to
    # compdat — broadcast the distinct-well dim for a shuffle-free anti
    cs_wells = connstatus.select("WELL").distinct()
    fallback = cd.join(broadcast(cs_wells), "WELL", "left_anti").select(
        *key, "DATE", "OP_SH", "KH", "ZONE"
    )
    out = enriched.unionByName(fallback)
    return out.withColumn("KH", F.coalesce(F.col("KH"), F.lit(0.0)))


def df(
    connections: DataFrame,
    zonemap: DataFrame,
    excl_well_prefix: str | None = None,
    connstatus: DataFrame | None = None,
) -> DataFrame:
    """``connections``: (WELL, I, J, K, OP_SH, DATE, KH, …) from
    modules/compdat; ``zonemap``: (K, ZONE) dim table;
    ``connstatus``: optional (WELL, I, J, K, DATE, OP/SH) status
    events — when given, the merge path above replaces the schedule
    timeline (reference ``use_wellconnstatus=True``).
    Returns (WELL, ZONE, DATE, OP/SH, KH) — ``OP/SH`` carries
    OPEN/SHUT like the reference's _aggregate_layer_to_zone
    (wellcompletiondata.py:155-164; a zone is OPEN if ANY of its
    connections is)."""
    if excl_well_prefix:
        # P8 (wellcompletiondata.py:129-138) — applied to compdat only,
        # like the reference: an excluded well still in connstatus
        # surfaces there with NULL ZONE and dies at the aggregation
        connections = connections.filter(~F.col("WELL").startswith(excl_well_prefix))
    if connstatus is not None:
        zoned = connections.join(broadcast(zonemap), "K", "left")
        # NULL-ZONE rows are dropped: pandas groupby(["WELL","ZONE",
        # "DATE"]) silently drops NaN group keys (reference :155), so
        # connstatus connections with no zoned compdat match vanish
        j = merge_connstatus(connstatus, zoned).filter(F.col("ZONE").isNotNull())
    else:
        j = connections.join(broadcast(zonemap), "K")  # J4 zone lookup
    is_open = F.col("OP_SH") == "OPEN"
    return j.groupBy("WELL", "ZONE", "DATE").agg(
        F.when(F.max(F.when(is_open, 1).otherwise(0)) == 1, F.lit("OPEN"))
        .otherwise(F.lit("SHUT"))
        .alias("OP/SH"),
        F.coalesce(
            F.sum(F.when(is_open, F.col("KH"))), F.lit(0.0)
        ).alias("KH"),
    )


def detect_unit_system(deck_text: str) -> str:
    """First unit-system keyword in the deck (METRIC/FIELD/LAB/PVT-M),
    defaulting to METRIC like the simulator — reference
    ``_get_unit_system`` (wellcompletiondata.py:100-111).

    The unit switches are zero-payload FLAG_KEYWORDS the deck parser
    consumes silently, so this scans lines: a keyword must be the
    FIRST bare token on its line (Eclipse keyword grammar) — a quoted
    well named 'FIELD' or a FIELD inside a ``--`` comment never
    matches.  The scan STOPS at the first post-RUNSPEC section header:
    unit keywords are RUNSPEC-only, while later sections carry legal
    unquoted FIELD data tokens (``GCONPROD\\n  FIELD ...`` names the
    root group) that would false-positive.

    RUNSPEC itself contains free-text records — a ``TITLE`` keyword is
    followed by one line of arbitrary text (``TITLE\\nFIELD STUDY``)
    that must never match; the reference iterates PARSED keywords so
    record payloads can't collide.  Two guards reproduce that: the
    line after TITLE is skipped entirely, and a unit keyword must be
    the ONLY token on its line (unit switches are zero-payload flags,
    so a multi-token line is data, not a keyword)."""
    units = {"METRIC", "FIELD", "LAB", "PVT-M", "PVTM"}
    sections = {"GRID", "EDIT", "PROPS", "REGIONS", "SOLUTION",
                "SUMMARY", "SCHEDULE", "OPTIMIZE"}
    skip_record = False
    for line in deck_text.splitlines():
        tok = line.split("--", 1)[0].strip().split()
        if not tok:
            continue
        if skip_record:
            # TITLE's single free-text record line: consume blindly.
            skip_record = False
            continue
        if tok[0] in sections:
            break
        if tok[0] == "TITLE":
            skip_record = True
            continue
        if len(tok) == 1 and tok[0] in units:
            return "PVT-M" if tok[0] == "PVTM" else tok[0]
    return "METRIC"


def attach_kh_metadata(out: DataFrame, unit_system: str) -> DataFrame:
    """Stamp the KH column with its unit via StructField.metadata
    (the K2 typed-writer channel) — reference ``_get_metadata`` +
    ``_df2pyarrow`` attach ``{"unit": mD·length}`` as Arrow field
    metadata (wellcompletiondata.py:114-127, 218-246)."""
    unit = KH_UNITS.get(unit_system, "mDm")
    if "KH" not in out.columns:
        return out
    return out.withColumn(
        "KH", F.col("KH").alias("KH", metadata={"unit": unit})
    )
