"""Local replica of the driver's correctness gate: run every suite query
on Spark AND its oracle SQL on DuckDB at sf0.01, compare row count,
column names/types, and order-insensitive values.

Usage: python tools/check_oracle.py [--json FILE] [query ...]

``--json FILE`` additionally records one entry per query in the same
per-query schema as the driver's CORRECTNESS_r*.json (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err) — the round
artifact covering the registry tail outside the driver's sampling
window.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates / arbitrary objects → string form
            df[c] = df[c].astype(str)
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duckdb={len(ddf)}")
    s, d = normalize(sdf), normalize(ddf)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns: spark={list(s.columns)} duckdb={list(d.columns)}")
        return problems
    if problems:
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = pd.to_numeric(sv, errors="coerce")
            da = pd.to_numeric(dv, errors="coerce")
            both_nan = sa.isna() & da.isna()
            close = both_nan | (abs(sa - da) <= 1e-9 + 1e-9 * abs(da))
            if not close.all():
                i = (~close).idxmax()
                problems.append(f"col {c}: first mismatch row {i}: {sv[i]!r} vs {dv[i]!r}")
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(
                    f"col {c} ({sv.dtype}/{dv.dtype}): first mismatch row {i}: {sv[i]!r} vs {dv[i]!r}"
                )
    # dtype compatibility note (driver may compare schemas more strictly)
    for c in s.columns:
        skind = s[c].dtype.kind
        dkind = d[c].dtype.kind
        if skind != dkind:
            problems.append(f"DTYPE col {c}: spark={s[c].dtype} duckdb={d[c].dtype}")
    return problems


def main() -> int:
    from res2df_spark import suite
    from res2df_spark.session import get_spark

    import json

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json FILE] [query ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    def _int_opt(flag: str) -> int | None:
        nonlocal argv
        if flag not in argv:
            return None
        i = argv.index(flag)
        val = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
        return val

    # --sample N [--offset K]: deterministic every-Kth pick of N queries
    # from OUTSIDE the driver's correctness window (the alphabetical
    # first 50) — the cheap CI-cadence insurance against out-of-window
    # rot.  --offset rotates the pick between rounds so successive
    # samples cover different names.
    sample_n = _int_opt("--sample")
    sample_offset = _int_opt("--offset") or 0
    only = set(argv)
    if sample_n:
        tail = sorted(suite.QUERIES)[50:]
        step = max(1, len(tail) // sample_n)
        picked = tail[sample_offset % step::step][:sample_n]
        print(f"sampled {len(picked)}/{len(tail)} out-of-window queries "
              f"(step {step}, offset {sample_offset % step})")
        only |= set(picked)
    records: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = 0
    for name, fn in suite.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {e}"[:500],
            }
            continue
        if name not in suite.ORACLES:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        try:
            ddf = con.sql(suite.ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"duckdb: {e}"[:500],
            }
            continue
        problems = compare(name, sdf, ddf)
        status = "ok" if not problems else "FAIL"
        if problems:
            failures += 1
        rows_match = not any(p.startswith("row count") for p in problems)
        schema_match = not any(
            p.startswith("columns") or p.startswith("DTYPE") for p in problems
        )
        records[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": "; ".join(problems)[:500] if problems else None,
        }
        print(f"{status:4s} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
        for p in problems:
            print(f"     - {p}")
    print(f"\n{failures} failing")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
