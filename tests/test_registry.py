"""Driver-contract registry integrity: queries() and oracle_sql() must stay
mutually consistent, and every oracle must remain valid DuckDB SQL.

These invariants are what the per-round CORRECTNESS gate builds on; a
registry edit that breaks one of them (a renamed query orphaning its
oracle, an oracle whose SQL silently rots after a refactor) would
otherwise surface only in the driver's run, a round later.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# xxhash64 signature outputs DuckDB cannot replay — the ONLY entries allowed
# to lack an oracle (each covered by oracle-checked companion contracts; see
# SURVEY section 8's terminal decision).
ROWS_ONLY = {"simhash_signatures", "simhash_near_dup"}


def test_every_query_has_oracle_or_is_known_rows_only():
    qs, os_ = entry.queries(), entry.oracle_sql()
    missing = {n for n in qs if n not in os_}
    assert missing == ROWS_ONLY
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracles without a query: {sorted(orphans)}"


def test_registry_size_and_window():
    qs = list(entry.queries())
    assert len(qs) >= 150  # only grows; shrinking loses driver coverage
    window = qs[:50]
    assert len(set(window)) == 50
    # queries added in round 6 must sit inside the driver's 50-entry window
    for added in (
        "bucketed_roundtrip",
        "partitioned_roundtrip",
        "user_retention_cohorts",
        "event_funnel",
        "value_histogram",
        "zscore_outliers",
        "bigram_pmi",
        "merge_upsert_orders",
        "schema_evolution_roundtrip",
    ):
        assert added in window, added


def test_all_oracles_parse_in_duckdb():
    """EXPLAIN every oracle against the real table views: catches SQL
    syntax/semantic rot (renamed columns, dialect slips) without paying for
    execution."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad[name] = str(exc).splitlines()[0]
    assert not bad, f"oracles no longer valid DuckDB SQL: {bad}"
