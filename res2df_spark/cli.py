"""CLI: ``res2csv``-style entry point (SURVEY §3.1 —
/root/reference/src/res2df/res2csv.py): one subcommand per datatype
module, deck/parquet in, CSV out (``-o -`` streams to stdout, the
reference's convention)."""

from __future__ import annotations

import argparse
import sys

from res2df_spark.session import get_spark
from res2df_spark.sinks.writers import write_dataframe

#: subcommand → (module runner, help)
_DECK_MODULES = {
    "compdat": "Connection table (COMPDAT/WELOPEN schedule pipeline)",
    "gruptree": "Group-tree snapshots",
    "satfunc": "Saturation-function tables",
    "pvt": "PVT tables",
    "equil": "Equilibrium records",
    "wlist": "Well-list snapshots",
    "vfpprod": "VFPPROD lift curves (melted)",
    "vfpinj": "VFPINJ lift curves (melted)",
    "faults": "Per-cell fault table (FAULTS box explode)",
    "wcon": "Dated well-control table (WCONHIST/INJE/INJH/PROD)",
}

#: subcommands reading binary simulator output; argument is the case
#: root (path without extension, reference res2csv's DATAFILE idiom)
_BINARY_MODULES = {
    "summary": "Long summary table from CASE.SMSPEC/.UNSMRY",
    "grid": "Per-cell grid table from CASE.EGRID [+ .INIT, .UNRST]",
    "rft": "Per-connection RFT table from CASE.RFT",
    "nnc": "Non-neighbour connections from CASE.EGRID [+ TRANNNC from .INIT]",
    "trans": "Neighbour transmissibilities from CASE.EGRID + .INIT",
    "pillars": "Per-pillar statistics from CASE.EGRID [+ .INIT, .UNRST]",
    "fipreports": "FIP balance blocks from CASE.PRT",
    "wellconnstatus": "Connection status changes from CPI summary vectors",
}


def _run_binary_module(
    name: str, spark, root: str, rstdates, time_index=None, column_keys=None
):
    import os

    from res2df_spark.sources import eclbin

    if root.upper().endswith(".DATA"):
        root = root[: -len(".DATA")]
    if name == "summary":
        from res2df_spark.modules import summary as summary_mod

        long = eclbin.summary_long(spark, root + ".SMSPEC")
        keys = [k for k in (column_keys or "").split(",") if k]
        if not keys and (time_index or "raw") == "raw":
            return long
        return summary_mod.df(
            long, summary_mod.meta_from_vectors(long),
            time_index=time_index or "raw", column_keys=keys,
        )
    if name == "grid":
        init = root + ".INIT" if os.path.exists(root + ".INIT") else None
        unrst = root + ".UNRST" if os.path.exists(root + ".UNRST") else None
        return eclbin.grid_table(
            spark, root + ".EGRID", init, unrst,
            rstdates=rstdates if unrst else None,
        )
    if name == "rft":
        return eclbin.rft_table(spark, root + ".RFT")
    init = root + ".INIT" if os.path.exists(root + ".INIT") else None
    if name == "nnc":
        return eclbin.nnc_table(spark, root + ".EGRID", init)
    if name == "trans":
        from res2df_spark.modules.grid import trans_df

        return trans_df(eclbin.grid_table(spark, root + ".EGRID", init))
    if name == "pillars":
        from res2df_spark.modules.grid import pillar_stats

        unrst = root + ".UNRST" if os.path.exists(root + ".UNRST") else None
        return pillar_stats(
            eclbin.grid_table(
                spark, root + ".EGRID", init, unrst,
                rstdates=rstdates if unrst else None,
            )
        )
    if name == "fipreports":
        from res2df_spark.modules import fipreports

        prt = root if root.upper().endswith(".PRT") else root + ".PRT"
        return fipreports.df(spark, prt)
    if name == "wellconnstatus":
        from res2df_spark.modules.wellconnstatus import from_summary

        return from_summary(eclbin.summary_long(spark, root + ".SMSPEC"))
    raise SystemExit(f"unknown module {name}")


def _run_deck_module(name: str, spark, deck_text: str):
    from res2df_spark.modules import compdat, faults, gruptree, tables, vfp, wcon, wlist

    if name == "compdat":
        return compdat.df(spark, deck_text)
    if name == "gruptree":
        return gruptree.df(spark, deck_text)
    if name == "satfunc":
        return tables.satfunc_df(spark, deck_text)
    if name == "pvt":
        return tables.pvt_df(spark, deck_text)
    if name == "equil":
        return tables.equil_df(spark, deck_text)
    if name == "wlist":
        return wlist.df(spark, deck_text)
    if name == "vfpprod":
        return vfp.df_prod(spark, deck_text)
    if name == "vfpinj":
        return vfp.df_inj(spark, deck_text)
    if name == "faults":
        return faults.df(spark, deck_text)
    if name == "wcon":
        return wcon.df(spark, deck_text)
    raise SystemExit(f"unknown module {name}")


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="res2csv-spark",
        description="Extract datatype tables from a deck via the Spark engine",
    )
    sub = p.add_subparsers(dest="module", required=True)
    for name, help_ in _DECK_MODULES.items():
        s = sub.add_parser(name, help=help_)
        s.add_argument("deckfile", help="input .DATA / include file")
        s.add_argument("-o", "--output", default="-", help="CSV path, '-' = stdout")
    for name, help_ in _BINARY_MODULES.items():
        s = sub.add_parser(name, help=help_)
        s.add_argument("case", help="case root (path with or without .DATA)")
        s.add_argument("-o", "--output", default="-", help="CSV path, '-' = stdout")
        s.add_argument(
            "--rstdates", default="first",
            help="grid: restart dates to stack (first/last/all/ISO date)",
        )
        if name == "summary":
            s.add_argument(
                "--time_index", default="raw",
                help="raw/first/last or daily/weekly/monthly/yearly "
                     "(rate/total-aware resample, wide output)",
            )
            s.add_argument(
                "--column_keys", default="",
                help="comma-separated vector globs, e.g. 'FOPT,WOPR:*'",
            )
    return p


def main(argv: list[str] | None = None) -> int:
    args = get_parser().parse_args(argv)
    spark = get_spark(f"res2csv-{args.module}")
    spark.sparkContext.setLogLevel("ERROR")
    if args.module in _BINARY_MODULES:
        df = _run_binary_module(
            args.module, spark, args.case, args.rstdates,
            time_index=getattr(args, "time_index", None),
            column_keys=getattr(args, "column_keys", None),
        )
    else:
        with open(args.deckfile) as f:
            deck_text = f.read()
        df = _run_deck_module(args.module, spark, deck_text)
    if df is None:
        print("no matching keywords found in deck", file=sys.stderr)
        return 1
    write_dataframe(df, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
