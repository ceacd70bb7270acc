"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_SMOKE = "/root/testdata/sf0.001"


#: Queries registered WITHOUT oracle SQL — the driver then records the
#: weaker rows-only check, so additions here need a reason the oracle
#: is IMPOSSIBLE, not merely inconvenient.  EMPTY since round 9: the
#: last rows-only entry (dedup_simhash_pairs_xx — near-threshold pair
#: membership depends on Spark's seed-42 XXH64, which DuckDB cannot
#: replay) was re-registered as a hash-verified INVARIANT summary of
#: the actual xx pair set (exact-pair completeness, hamming bound,
#: canonical ordering, set-ness), so every registry entry now carries
#: oracle SQL.
ROWS_ONLY_QUERIES: set[str] = set()


def test_queries_oracle_keys_align():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs), "every oracle key must have a query"
    missing = set(qs) - set(os_)
    # every query, including the binary round-trip (oracled via the
    # source-parquet aggregate it derives from), must have an oracle —
    # except the justified rows-only allowlist above
    assert missing <= ROWS_ONLY_QUERIES, (
        f"queries without oracle: {missing - ROWS_ONLY_QUERIES}"
    )


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_run_at_smoke_sf(spark):
    if not os.path.isdir(SF_SMOKE):
        import pytest

        pytest.skip("driver testdata absent")
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
