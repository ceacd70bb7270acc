"""FIP region reports from PRT text: engine-layer equivalent of the
reference's ``fipreports.df()``
(/root/reference/src/res2df/fipreports.py:34-190).

The PRT file embeds per-(FIP region, date) balance blocks whose data
lines are POSITIONAL colon-separated sections::

    :CURRENTLY IN PLACE  :  liquid  vapour  total : water :  free  dissolved  total :

Built on the generic distributed text scanner (sources/textreport.py):
two forward-filled contexts — the running report DATE (from
``REPORT  n  d MMM yyyy`` lines) and the region index (from
``FIPNUM REPORT REGION n`` headers) — then the reference's
section-splitting rules expressed as array functions (split + try_cast,
1/2/3-token layouts per phase section).  Everything is codegen'd
expression work; no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from res2df_spark.sources.deck import _MONTHS
from res2df_spark.sources.textreport import numbered_lines, with_block_contexts

#: running report date, e.g. ``  REPORT   0     1 JAN 2000`` — ANCHORED
#: at line start like the reference's ``re.match`` (fipreports.py:144):
#: unanchored, a PRT's echoed deck text containing 'REPORT  1  1 JAN
#: 2000' mid-line would forward-fill a bogus date onto every following
#: balance row
_DATE_START = r"^\s\sREPORT\s+\d+\s+(\d+)\s+(\w+)\s+(\d+)"
#: OPM flow writes dates as ``Starting time step .. date = 01-Jan-2000``
#: (also re.match-anchored in the reference)
_OPM_DATE_START = r"^Starting time step.*? date = (\d+)-(\w+)-(\d+)"
#: region block context: a block HEADER opens it (group 1 = region
#: number), the ``====…`` terminator line CLOSES it (matches with group
#: 1 unset → regexp_extract yields '' → "not in a block", replicating
#: the reference's ``in_report_block = False`` reset at
#: fipreports.py:164-166 — without it every balance sheet after the
#: first region block inherits a stale region).  The terminator is the
#: reference's full ``' ' + 28*'='`` prefix — a shorter run of '='
#: (a narrow table rule inside the block) must NOT close it.
#: Case-insensitive header like the reference; Eclipse100 and OPM both
#: match.
_REGION_START = r"(?i)(?:.+{fipname}\s+REPORT\s+REGION\s+(\d+))|(?:^ ={{28}})"
#: the four data-line families the reference accepts
_ROW_STARTS = ("CURRENTLY", "OUTFLOW", "MATERIAL", "ORIGINALLY")


def _month_num(col: Column) -> Column:
    """Month token → number via the deck layer's alias table — Eclipse
    writes July as ``JLY``, which no ``MMM`` date pattern parses (the
    reference routes through common.parse_month for the same reason)."""
    m = F.upper(F.substring(col, 1, 3))
    out = F.lit(None).cast("int")
    for name, num in _MONTHS.items():
        out = F.when(m == name, F.lit(num)).otherwise(out)
    return out


def df(spark: SparkSession, prt_path: str, fipname: str = "FIPNUM") -> DataFrame:
    """(DATE, FIPNAME, REGION, DATATYPE, TO_REGION, STOIIP_OIL,
    ASSOCIATEDOIL_GAS, STOIIP_TOTAL, WIIP_TOTAL, GIIP_GAS,
    ASSOCIATEDGAS_OIL, GIIP_TOTAL) — the reference's output schema,
    one row per parsed balance line."""
    if not fipname.startswith("FIP"):
        raise ValueError("fipname must start with FIP")
    if len(fipname) > 8:
        raise ValueError("fipname can be at most 8 characters")
    # Eclipse keyword names are alphanumeric; anything else would be
    # spliced UNESCAPED into the region regex below — a '(' would die
    # as an invalid pattern inside the job, and a balanced group would
    # silently shift the capture index and extract wrong regions
    if not fipname.isalnum():
        raise ValueError(f"fipname must be alphanumeric, got {fipname!r}")

    # persisted: the context scan carries a lasts-aggregate self-join,
    # and without the cache the text file's whole numbering plan
    # (itself a counts-aggregate self-join) would re-scan the multi-GB
    # PRT on both sides
    lines = numbered_lines(spark, prt_path, keep_splits=True).localCheckpoint(
        eager=False
    )
    # ONE multi-family pass: all three contexts share a single
    # within-split window sort, one split-summary aggregate and one
    # carry join (stacked single-family calls cost three full sorts of
    # the multi-GB PRT — the interleaved aggregates block Catalyst's
    # same-spec window fusion)
    lines = with_block_contexts(
        lines,
        [
            (_DATE_START, {"__D": 1, "__MON": 2, "__Y": 3}, "__D_LN"),
            (_OPM_DATE_START, {"__OD": 1, "__OMON": 2, "__OY": 3}, "__OD_LN"),
            (_REGION_START.format(fipname=fipname), {"__REGION": 1}, None),
        ],
    )

    # The reference's colon repair (fipreports.py:176-186): colons are
    # not reliably present (differs by Eclipse version), so strip the
    # line, prepend ':' when the first char isn't one, and if chars
    # 26-27 (1-based) hold no ':' force one at position 27 — fixed
    # positions, like the reference ("and hope for the best").
    first_word = F.upper(
        F.element_at(F.split(F.trim(F.expr("element_at(__secs, 2)")), r"\s+"), 1)
    )
    rows = (
        lines.withColumn("__rep", F.trim(F.col("line")))
        .withColumn(
            "__rep",
            F.when(
                F.substring(F.col("__rep"), 1, 1) != ":",
                F.concat(F.lit(":"), F.col("__rep")),
            ).otherwise(F.col("__rep")),
        )
        .withColumn(
            "__rep",
            F.when(
                (~F.substring(F.col("__rep"), 26, 2).contains(":"))
                & (F.length(F.col("__rep")) > 26),
                F.concat(
                    F.substring(F.col("__rep"), 1, 26),
                    F.lit(":"),
                    F.expr("substring(__rep, 28, 2147483647)"),
                ),
            ).otherwise(F.col("__rep")),
        )
        .withColumn("__secs", F.split(F.col("__rep"), ":"))
        .filter(F.size("__secs") >= 5)
        # (no first-section-empty filter: the ':'-prepend repair above
        # guarantees every row starts with ':', so section 1 is
        # provably '' — the predicate could never fire)
        .withColumn("__name_sec", F.trim(F.expr("element_at(__secs, 2)")))
        .filter(first_word.rlike("^(" + "|".join(_ROW_STARTS) + ")"))
        # '' = after a block terminator (outside any region block)
        .filter(F.col("__REGION").isNotNull() & (F.col("__REGION") != ""))
    )

    def sec(i):
        return F.split(F.trim(F.expr(f"element_at(__secs, {i})")), r"\s+")

    rows = (
        rows.withColumn("__oil", sec(3))
        .withColumn("__wat", sec(4))
        .withColumn("__gas", sec(5))
    )

    def num(arr, idx):
        # try_cast: the reference's float_or_nan — junk yields NULL,
        # never an ANSI cast abort
        return F.expr(f"try_cast(element_at({arr}, {idx}) AS DOUBLE)")

    n_oil = F.size("__oil")
    n_gas = F.size("__gas")
    # oil section: 3 tokens = (liquid, vapour, total); 2 = (liquid,
    # total); 1 = (total) — the reference's layout dispatch
    liquid_oil = F.when(n_oil >= 2, num("__oil", 1))
    vapour_oil = F.when(n_oil == 3, num("__oil", 2))
    total_oil = F.when(n_oil == 3, num("__oil", 3)).otherwise(
        F.when(n_oil == 2, num("__oil", 2)).otherwise(num("__oil", 1))
    )
    # the reference casts the WHOLE water section (float_or_nan on the
    # untokenized string) — a multi-token water section yields NULL,
    # not its first token
    total_water = F.expr("try_cast(trim(element_at(__secs, 4)) AS DOUBLE)")
    free_gas = F.when(n_gas >= 2, num("__gas", 1))
    dissolved_gas = F.when(n_gas == 3, num("__gas", 2))
    total_gas = F.when(n_gas == 3, num("__gas", 3)).otherwise(
        F.when(n_gas == 2, num("__gas", 2)).otherwise(num("__gas", 1))
    )
    is_outflow_region = F.col("__name_sec").rlike("OUTFLOW TO REGION")
    to_region = F.when(
        is_outflow_region,
        F.expr(
            "try_cast(element_at(split(trim(element_at(__secs, 2)), '\\\\s+'), 4) AS INT)"
        ),
    )
    datatype = F.when(is_outflow_region, F.lit("OUTFLOW TO REGION")).otherwise(
        F.upper(F.regexp_replace(F.col("__name_sec"), r"\s+", " "))
    )
    # whichever date family appeared LAST before this line wins; lines
    # before any date line keep a NULL DATE (the reference's None), and
    # try_to_date never ANSI-aborts on the empty pre-context string.
    # Month tokens go through the deck layer's alias table (JLY = July,
    # which 'MMM' cannot parse) — numeric months via 'd M yyyy'.
    rows = rows.withColumn("__MONNUM", _month_num(F.col("__MON"))).withColumn(
        "__OMONNUM", _month_num(F.col("__OMON"))
    )
    ecl_date = F.expr(
        "try_to_date(concat_ws(' ', __D, cast(__MONNUM AS STRING), __Y), 'd M yyyy')"
    )
    opm_date = F.expr(
        "try_to_date(concat_ws(' ', __OD, cast(__OMONNUM AS STRING), __OY), 'd M yyyy')"
    )
    # the family whose date line appeared LAST before this row wins —
    # resolved on the forward-filled line numbers of each family's most
    # recent date line, so a mixed Eclipse/OPM PRT never stamps rows with
    # the stale family (a bare coalesce would always prefer Eclipse)
    opm_is_newer = F.col("__OD_LN").isNotNull() & (
        F.col("__D_LN").isNull() | (F.col("__OD_LN") > F.col("__D_LN"))
    )
    date = F.when(opm_is_newer, opm_date).otherwise(ecl_date)
    return rows.select(
        date.alias("DATE"),
        F.lit(fipname).alias("FIPNAME"),
        F.col("__REGION").cast("int").alias("REGION"),
        datatype.alias("DATATYPE"),
        to_region.alias("TO_REGION"),
        liquid_oil.alias("STOIIP_OIL"),
        vapour_oil.alias("ASSOCIATEDOIL_GAS"),
        total_oil.alias("STOIIP_TOTAL"),
        total_water.alias("WIIP_TOTAL"),
        free_gas.alias("GIIP_GAS"),
        dissolved_gas.alias("ASSOCIATEDGAS_OIL"),
        total_gas.alias("GIIP_TOTAL"),
    )
