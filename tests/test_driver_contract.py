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
    # the documented split: non-SQL-expressible ops are rows-only, and the
    # registry keeps them LAST so they can never push an oracle-backed
    # query out of the driver's bounded CORRECTNESS window
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"events_approx_users"}
    names = list(qs)
    first_rows_only = min(names.index(n) for n in rows_only)
    assert all(names.index(n) < first_rows_only for n in oracles)
    # driver window: at most 50 entries are recorded
    assert len(qs) <= 50, f"registry has {len(qs)} entries; driver caps at 50"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"url", "chunk_id", "text"} <= set(df.columns)
