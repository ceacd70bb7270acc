"""Dump ``explain("formatted")`` for suite queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each named query (default:
the bench HEADLINE list) — the before/after plan evidence for the
optimization rounds.  AQE is disabled for the dump so the static plan
(exchange count, join strategy, scan pruning) is visible; execution
still runs with AQE on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.1")


def main() -> int:
    from res2df_spark import suite
    from res2df_spark.session import get_spark
    from tools.plan_audit import explain_string

    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for name in names:
        try:
            df = suite.QUERIES[name](spark, SF_DIR)
            plan = explain_string(spark, df, "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
