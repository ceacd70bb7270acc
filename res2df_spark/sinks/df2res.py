"""Per-keyword include-file writers (K8 — the ``csv2res`` reverse flow,
/root/reference/src/res2df/satfunc.py:272-383, pvt.py:357-645,
equil.py:402-523, compdat's df2res at common.py:508-625).

Each writer renders a datatype DataFrame back to simulator input text.
Result tables are small by nature (they are input-deck text); rendering
collects and templates driver-side, matching the reference's split.
The correctness spine is the round-trip property: text → df → text →
df must be a fixed point (reference test layer 3, SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from res2df_spark.sources.deck import KEYWORD_ITEMS, TABLE_KEYWORDS


def _fmt(v) -> str:
    if v is None:
        return "1*"
    if isinstance(v, float):
        return f"{v:g}"
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


def df2res_compdat(df: DataFrame) -> str:
    """Connection rows → COMPDAT keyword text.  Unrolled K rows are
    re-emitted as K1=K2=K (the reference does the same after unrolldf)."""
    rows = df.orderBy("WELL", "I", "J", "K").collect()
    lines = ["COMPDAT"]
    for r in rows:
        items = [
            _fmt(r["WELL"]), _fmt(r["I"]), _fmt(r["J"]),
            _fmt(r["K"]), _fmt(r["K"]), _fmt(r["OP_SH"]),
        ]
        for opt in ("SATN", "TRAN", "WBDIA", "KH", "SKIN"):
            if opt in df.columns:
                items.append(_fmt(r[opt]))
        while items and items[-1] == "1*":
            items.pop()
        lines.append("  " + " ".join(items) + " /")
    lines.append("/")
    return "\n".join(lines) + "\n"


def df2res_satfunc(df: DataFrame) -> str:
    """Saturation-table rows → per-keyword per-region blocks
    (satfunc.py:272-383 nested-loop renderer)."""
    out = []
    pdf = df.toPandas()
    for kw in sorted(pdf["KEYWORD"].unique()):
        cols, region_col = TABLE_KEYWORDS[kw]
        sub = pdf[pdf["KEYWORD"] == kw]
        out.append(kw)
        for region in sorted(sub[region_col].dropna().unique()):
            tbl = sub[sub[region_col] == region].sort_values("ROW_IDX")
            for _, r in tbl.iterrows():
                vals = [r[c] for c in cols if c in tbl.columns]
                out.append("  " + " ".join(_fmt(None if v != v else float(v)) for v in vals))
            out.append("/")
        out.append("")
    return "\n".join(out)


def df2res_equil(df: DataFrame) -> str:
    """EQUIL rows → keyword text, one record per EQLNUM."""
    cols, _ = TABLE_KEYWORDS["EQUIL"]
    rows = df.orderBy("EQLNUM").collect()
    lines = ["EQUIL"]
    for r in rows:
        items = [_fmt(r[c] if c in df.columns else None) for c in cols]
        while items and items[-1] == "1*":
            items.pop()
        lines.append("  " + " ".join(items) + " /")
    return "\n".join(lines) + "\n"


def df2res_welspecs(df: DataFrame) -> str:
    rows = df.orderBy("WELL").collect()
    lines = ["WELSPECS"]
    for r in rows:
        items = [_fmt(r[name] if name in df.columns else None)
                 for name, _ in KEYWORD_ITEMS["WELSPECS"]]
        while items and items[-1] == "1*":
            items.pop()
        lines.append("  " + " ".join(items) + " /")
    lines.append("/")
    return "\n".join(lines) + "\n"
