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
    # r7 rotation: the window clears the never-anchored backlog — the 47
    # oldest round-6 additions with no driver CORRECTNESS row plus the 3
    # queries whose code changed this round (policy (b))
    for member in (
        "skew_profile_events",      # oldest displaced addition
        "leakage_safe_split",       # curation-family head
        "domain_cap_docs",          # session-2 head
        "semantic_dedup",           # session-2 finals head
        "kfold_split_docs",         # session-3 head
        "calibration_bins_docs",    # 47th (last backlog slot)
        "dq_expectations_orders",   # changed: exact-count verdicts
        "heavy_hitters_sketch",     # changed: error-bound guard
        "text_roundtrip",           # changed: sanitizing writer
    ):
        assert member in window, member
    # the r06-anchored cohort rotated OUT to make room
    for rotated_out in ("dedup_exact", "bucketed_roundtrip", "bigram_pmi"):
        assert rotated_out not in window, rotated_out


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
