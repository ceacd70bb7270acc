"""S7 text-report scan: block grouping + field extraction."""

from __future__ import annotations

from res2df_spark.sources.textreport import numbered_lines, parse_report_blocks
from tests.conftest import rows

REPORT = """\
 SIMULATION HEADER NOISE
 BALANCE REPORT  REGION  1  AT  1-JAN-2020
  CURRENTLY IN PLACE : OIL     1000.5
  CURRENTLY IN PLACE : WATER   2000.0
 other noise line
 BALANCE REPORT  REGION  2  AT  1-JAN-2020
  CURRENTLY IN PLACE : OIL     500.25
"""


def test_parse_report_blocks(spark, tmp_path):
    p = tmp_path / "report.prt"
    p.write_text(REPORT)
    lines = numbered_lines(spark, str(p))
    assert lines.count() == 7
    out = parse_report_blocks(
        lines,
        start_pattern=r"BALANCE REPORT\s+REGION\s+(\d+)\s+AT\s+(\S+)",
        context_fields={"region": 1, "date": 2},
        row_pattern=r"CURRENTLY IN PLACE : (\w+)\s+([\d.]+)",
        row_fields={"phase": 1, "amount": 2},
    )
    got = rows(out, "region", "date", "phase", "amount")
    assert got == [
        ("1", "1-JAN-2020", "OIL", "1000.5"),
        ("1", "1-JAN-2020", "WATER", "2000.0"),
        ("2", "1-JAN-2020", "OIL", "500.25"),
    ]
