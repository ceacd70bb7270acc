"""FIP region reports from PRT text: engine-layer equivalent of the
reference's ``fipreports.df()``
(/root/reference/src/res2df/fipreports.py:100-191).

The PRT file embeds balance blocks per (FIP region, date); each block
holds in-place rows per phase/category.  Built on the generic
distributed text scanner (sources/textreport.py): block headers carry
(regtype, region, date) context, forward-filled onto the data rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from res2df_spark.sources.textreport import numbered_lines, parse_report_blocks

#: block-start line, e.g.
#:   BALANCE  AT   1-JAN-2020    FIPNUM  REGION  2
_START = r"BALANCE\s+AT\s+(\S+)\s+(\w+)\s+REGION\s+(\d+)"
#: data line, e.g.
#:   CURRENTLY IN PLACE : LIQUID   12345.6
_ROW = r"([A-Z ]+?)\s*:\s*(\w+)\s+([-\d.Ee+]+)"


def df(spark: SparkSession, prt_path: str) -> DataFrame:
    # keep the (file, split) columns: parse_report_blocks then uses
    # the distributed two-pass ffill instead of a global window
    lines = numbered_lines(spark, prt_path, keep_splits=True)
    rows = parse_report_blocks(
        lines,
        start_pattern=_START,
        context_fields={"DATE_STR": 1, "REGTYPE": 2, "REGION": 3},
        row_pattern=_ROW,
        row_fields={"DATATYPE": 1, "PHASE": 2, "AMOUNT": 3},
    )
    return rows.select(
        F.col("DATE_STR"),
        "REGTYPE",
        F.col("REGION").cast("int").alias("REGION"),
        F.trim("DATATYPE").alias("DATATYPE"),
        "PHASE",
        F.col("AMOUNT").cast("double").alias("AMOUNT"),
    )
