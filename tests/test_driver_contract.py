"""The __spark_entry__ driver contract: shape, key consistency, entry smoke."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_contract_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs and isinstance(qs, dict)
    # every oracle belongs to a query; every query is callable
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in oracles.values())
    # every driver-visible query is oracle-backed: the HLL rows-only op
    # moved to diagnostics once the deterministic KMV sketch gave the
    # approx-distinct slot a hash-checkable twin
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()
    # driver window: at most 50 entries are recorded
    assert len(qs) <= 50, f"registry has {len(qs)} entries; driver caps at 50"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"url", "chunk_id", "text"} <= set(df.columns)
