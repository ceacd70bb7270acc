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
    return p


def main(argv: list[str] | None = None) -> int:
    args = get_parser().parse_args(argv)
    with open(args.deckfile) as f:
        deck_text = f.read()
    spark = get_spark(f"res2csv-{args.module}")
    spark.sparkContext.setLogLevel("ERROR")
    df = _run_deck_module(args.module, spark, deck_text)
    if df is None:
        print("no matching keywords found in deck", file=sys.stderr)
        return 1
    write_dataframe(df, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
