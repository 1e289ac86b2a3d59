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
    # the documented split: non-SQL-expressible ops are rows-only
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"extract_chunks", "extract_docs", "embed_chunks",
                         "search_topk", "media_describe",
                         "events_approx_users"}


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"url", "chunk_id", "text"} <= set(df.columns)
