"""Sinks (SURVEY.md §2.2, K1–K5).

The reference's terminal writes are CSV/stdout (K1:
/root/reference/src/res2df/common.py:116-152), typed Arrow files with
column metadata (K2: summary.py:486-526), and Eclipse include-file text
rendered from small result tables (K3/K4: common.py:508-750; K5 grid
properties with run-length encoding, grid.py:623-756 + common.py:753-784).

Spark split: big tables go through ``df.write`` (distributed); include-
file text is driver-side templating over a COLLECTED table — include
files are small by nature (they are simulator input text).  The one
writer that can be big — per-cell grid properties — gets a distributed
RLE: consecutive-run detection is two windows over GLOBAL_INDEX, after
which only (run_length, value) pairs are collected.
"""

from __future__ import annotations

import sys
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def to_pandas_datesafe(df: DataFrame) -> "pd.DataFrame":  # noqa: F821
    """``toPandas()`` that survives datetimes beyond pandas' ns range.

    pandas' datetime64[ns] caps at year 2262 (and floors at 1677); Arrow
    refuses to down-cast Spark's µs timestamps past that, so a collect
    of a long-horizon simulation dies at the driver boundary.  The
    reference degrades such columns to object dtype of ``datetime``
    (summary.py:130-192,626-639); this does the same.

    The in-range happy path is a plain Arrow ``toPandas()`` — zero extra
    compute.  Only when that raises the out-of-bounds cast error does
    the fallback run: a timezone-free epoch-µs bounds probe picks the
    offending columns, which are collected as ISO strings and rebuilt as
    object-dtype ``datetime.datetime`` columns.
    """
    import datetime as dt

    from pyspark.sql.types import TimestampNTZType, TimestampType

    ts_cols = [
        f.name
        for f in df.schema
        if isinstance(f.dataType, (TimestampType, TimestampNTZType))
    ]
    if not ts_cols:
        return df.toPandas()
    # the ns-cast failure is matched by exception TYPE first (stable
    # across Arrow/pandas versions) with the message substring as a
    # secondary net for wrapped/re-raised forms; anything else re-raises
    oob_types: tuple = ()
    try:
        from pyarrow.lib import ArrowInvalid

        oob_types += (ArrowInvalid,)
    except ImportError:  # pragma: no cover
        pass
    try:
        from pandas.errors import OutOfBoundsDatetime

        oob_types += (OutOfBoundsDatetime,)
    except ImportError:  # pragma: no cover
        pass
    try:
        return df.toPandas()
    except Exception as exc:  # noqa: BLE001 — only the ns-cast error falls through
        if not isinstance(exc, oob_types) and "out of bounds" not in str(exc).lower():
            raise
    # epoch-µs bounds (timezone-free, unlike comparing datetime objects
    # collected in the driver's local timezone)
    import pandas as pd

    lo_us = pd.Timestamp.min.value // 1000 + 1
    hi_us = pd.Timestamp.max.value // 1000
    # NTZ columns probe through a cast to TimestampType, which shifts
    # the wall-clock by the session-timezone offset; shrink their
    # in-range window by the largest real offset (UTC−12…UTC+14, use
    # 15 h) so an NTZ value just past the pandas boundary can never be
    # misclassified as in-range.  Over-flagging a value just INSIDE the
    # boundary is harmless — that column merely takes the object-dtype
    # path.
    ntz_margin_us = 15 * 3600 * 1_000_000
    # the fallback recomputes the plan twice (bounds probe + collect);
    # persist so both read the materialized result, then release
    df = df.persist()
    try:

        def us(c: str) -> F.Column:
            col = F.col(c)
            if isinstance(df.schema[c].dataType, TimestampNTZType):
                col = col.cast("timestamp")
            return F.unix_micros(col)

        def window(c: str) -> tuple[int, int]:
            if isinstance(df.schema[c].dataType, TimestampNTZType):
                return lo_us + ntz_margin_us, hi_us - ntz_margin_us
            return lo_us, hi_us

        bounds = df.agg(
            *[F.min(us(c)).alias(f"__lo_{i}") for i, c in enumerate(ts_cols)],
            *[F.max(us(c)).alias(f"__hi_{i}") for i, c in enumerate(ts_cols)],
        ).collect()[0]
        wild = [
            c
            for i, c in enumerate(ts_cols)
            if bounds[f"__lo_{i}"] is not None
            and not (
                window(c)[0] <= bounds[f"__lo_{i}"]
                and bounds[f"__hi_{i}"] <= window(c)[1]
            )
        ]
        stringified = df
        for c in wild:
            stringified = stringified.withColumn(
                c, F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            )
        pdf = stringified.toPandas()
    finally:
        df.unpersist()
    for c in wild:
        pdf[c] = pdf[c].map(
            lambda s: dt.datetime.fromisoformat(s) if s is not None else None
        )
    return pdf


def write_dataframe(df: DataFrame, path: str, fmt: str = "csv", mode: str = "overwrite") -> None:
    """K1/K2 terminal write.  ``path='-'`` streams CSV to stdout (the
    reference's convention); a ``*.csv`` path gets ONE file like the
    reference's pandas to_csv (common.py:116-152) — CLI outputs are
    result tables, small by contract; any other path is a distributed
    ``df.write`` directory for cluster-scale sinks."""
    if path == "-":
        if fmt != "csv":
            raise ValueError(f"stdout output only supports csv, not {fmt!r}")
        to_pandas_datesafe(df).to_csv(sys.stdout, index=False)
        return
    if fmt == "csv" and path.endswith(".csv"):
        # honour df.write.mode semantics on the single-file path too
        import os

        exists = os.path.exists(path)
        if exists:
            if mode in ("error", "errorifexists"):
                raise FileExistsError(path)
            if mode == "ignore":
                return
        if mode == "append":
            # pandas to_csv(path) TRUNCATES by default — an append-mode
            # caller would silently lose the existing rows; append the
            # file and repeat the header only when creating it
            to_pandas_datesafe(df).to_csv(
                path, index=False, mode="a", header=not exists
            )
        else:
            to_pandas_datesafe(df).to_csv(path, index=False)
        return
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def to_arrow_table(df: DataFrame, downcast32: bool = False) -> "pa.Table":  # noqa: F821
    """Collect a (small, terminal) result frame as a pyarrow Table whose
    field metadata carries each column's ``StructField.metadata`` — the
    reference's ``_df2pyarrow`` channel (wellcompletiondata.py:218-246,
    summary.py:506-521), so a ``--arrow`` export keeps units.

    Spark's ``toPandas()`` drops column metadata; this re-attaches it on
    the Arrow schema after the collect.  Values are bytes-encoded like
    the reference (Arrow field metadata is bytes→bytes).

    ``downcast32=True`` applies the reference's summary/grid dtype
    contract (summary.py _df2pyarrow:486-521, grid.py:126-147):
    integers → int32, floats → float32 ("Eclipse specific" — the
    binary formats are 32-bit, so 64-bit output would advertise
    precision the data never had), timestamps → millisecond (which
    also carries 500-year simulation spans beyond the nanosecond
    range).  Strings pass through."""
    import pyarrow as pa

    pdf = to_pandas_datesafe(df)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    fields = []
    meta_by_name = {f.name: f.metadata for f in df.schema}
    for field in table.schema:
        ftype = field.type
        if downcast32:
            if pa.types.is_integer(ftype):
                ftype = pa.int32()
            elif pa.types.is_floating(ftype):
                ftype = pa.float32()
            elif pa.types.is_timestamp(ftype):
                ftype = pa.timestamp("ms")
        meta = meta_by_name.get(field.name) or {}
        fields.append(
            pa.field(
                field.name, ftype,
                metadata={
                    str(k).encode(): str(v).encode()
                    for k, v in meta.items()
                } if meta else None,
            )
        )
    return table.cast(pa.schema(fields))


def write_parquet_with_metadata(
    df: DataFrame, path: str, column_metadata: dict[str, dict], mode: str = "overwrite"
) -> None:
    """K2: attach per-column metadata (unit, is_rate, …) that survives the
    Parquet round-trip, matching the reference's Arrow field metadata
    (summary.py:506-521)."""
    for col, meta in column_metadata.items():
        df = df.withColumn(col, F.col(col).alias(col, metadata=meta))
    df.write.mode(mode).parquet(path)


def _fmt_value(v, float_fmt: str | None = None) -> str:
    """One deck item: NULL → the Eclipse 'defaulted' token ``1*``;
    strings quoted; floats as repr() — the shortest round-tripping
    form; '%g' would truncate to 6 significant digits
    (common.py:694-750).

    Floating-point NOISE is trimmed first: values like
    1000.00000000000000000005 (arithmetic residue) have been observed
    to crash Eclipse, so the reference rounds on output (its
    test_eclipse_rounding).  Here the 6-decimal round is applied ONLY
    when it is a relative no-op (|Δ| < 1e-9·|v|) — noise disappears,
    legitimate high-precision values (0.581051658) pass through
    untouched, and the round-trip property is preserved."""
    if v is None:
        return "1*"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if v != v:
            # float NaN would render as the invalid deck token 'nan';
            # it means the same thing as a missing value here
            return "1*"
        r = round(v, 6)
        # PURELY relative tolerance: with max(1, |v|) a legitimate
        # tiny value (1e-12 compressibility) would zero out
        if abs(v - r) <= 1e-9 * abs(v):
            v = r
        return float_fmt % v if float_fmt else repr(v)
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


def trim_trailing_defaults(items: list[str]) -> list[str]:
    """Drop trailing ``1*`` items IN PLACE (the reference's
    trailing-default rule, common.py:628-750), keeping at least one
    item — a fully-defaulted record must render as ``1* /``, never as a
    bare ``/``, which TERMINATES the keyword and silently re-parses
    every later row as the next keyword.  One shared helper so the
    trim rule cannot drift between the four record writers that apply
    it."""
    while len(items) > 1 and items[-1] == "1*":
        items.pop()
    return items


def df_to_include(
    df: DataFrame,
    keyword: str,
    columns: Sequence[str] | None = None,
    comment: str | None = None,
    drop_trailing_defaults: bool = True,
) -> str:
    """K3/K4: render a (small, collected) table as an Eclipse keyword
    block::

        KEYWORD
        -- comment
          'OP1' 1 1 2 'OPEN' /
          'OP2' 2 2 1* 'SHUT' /
        /

    NULLs become ``1*``; trailing defaulted items are dropped entirely
    (the reference's trailing-default rule, common.py:628-750).  Column
    order follows ``columns`` (the keyword's item order)."""
    cols = list(columns or df.columns)
    rows = df.select(*cols).collect()
    lines = [keyword]
    if comment:
        lines.append(f"-- {comment}")
    for r in rows:
        items = [_fmt_value(r[c]) for c in cols]
        if drop_trailing_defaults:
            trim_trailing_defaults(items)
        lines.append("  " + " ".join(items) + " /")
    lines.append("/")
    return "\n".join(lines) + "\n"


def rle_encode(values: Iterable) -> str:
    """K5 RLE for grid-property export: ``2 2 2 5`` → ``3*2 5``
    (common.py:753-784).  Driver-side, for already-collected vectors."""
    out: list[str] = []
    run_val, run_len = object(), 0
    for v in values:
        if v == run_val:
            run_len += 1
        else:
            if run_len:
                out.append(f"{run_len}*{run_val}" if run_len > 1 else str(run_val))
            run_val, run_len = v, 1
    if run_len:
        out.append(f"{run_len}*{run_val}" if run_len > 1 else str(run_val))
    return " ".join(out)


def rle_encode_distributed(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Distributed RLE: collapse consecutive equal values (in
    ``order_col`` order) into (start_idx, run_length, value) rows.

    Two windows over one global sort: run starts where the lagged value
    differs; run id = running count of starts; then one groupBy.  At
    grid scale (billions of cells) only the collapsed runs ever reach
    the driver — the full vector never does.  The global window is the
    price of the format's strict cell ordering; AQE handles the
    single-partition sort spill."""
    w = Window.orderBy(order_col)
    # NULL-safe change detection: `lag != value` is NULL when either
    # side is NULL, which would silently merge a NULL cell into the
    # preceding run; and `lag().isNull()` conflates "first row" with
    # "previous value is NULL" — row_number marks the first row
    # explicitly and eqNullSafe compares values
    marked = df.select(
        F.col(order_col), F.col(value_col),
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(value_col).over(w).eqNullSafe(F.col(value_col)),
            1,
        )
        .otherwise(0)
        .alias("__start"),
    )
    runs = marked.withColumn(
        "__run", F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("__run")
        .agg(
            F.min(order_col).alias("start_idx"),
            F.count(F.lit(1)).alias("run_length"),
            F.first(value_col).alias("value"),
        )
        .drop("__run")
        .orderBy("start_idx")
    )
