"""Named query surface: Spark DataFrame builders + DuckDB oracle twins.

Each module exposes ``QUERIES: dict[str, (builder, oracle_sql | None)]``
where ``builder(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is an
ANSI-SQL string DuckDB can run over the same parquet tables (views
``region nation customer supplier part orders lineitem events documents
embeddings`` pre-registered).  A ``None`` oracle marks an op that is not
SQL-expressible (driver falls back to a rows-only check).

Portability rules (Spark ⇄ DuckDB hash-match):
- hashes: ``md5`` hex is identical in both; hex→int via Spark
  ``conv(substr(md5(x),1,15),16,10)`` / DuckDB ``('0x'||…)::BIGINT``.
- floats: sums over money-like doubles go through DECIMAL(18,2) (exact,
  order-independent) then cast back to DOUBLE; similarity scores are
  rounded to a fixed number of decimals on both sides.
- counts/sizes: cast to BIGINT on both sides.
- timestamps: never returned raw — formatted to strings (tz-cancelling)
  or differenced to seconds, so session-timezone settings cannot skew
  the comparison.
"""

from __future__ import annotations

from docling_rag_spark.queries import (
    clustering, curation, dedup, extraction, relational, retrieval,
    textstats, vectors, webops,
)

ALL_MODULES = (relational, textstats, dedup, vectors, extraction, curation,
               webops, retrieval, clustering)


def _registry():
    """Driver-visible registry, oracle-backed entries FIRST: the driver's
    CORRECTNESS window records a bounded number of rows in registry order,
    so every query with a DuckDB twin must precede the rows-only ones
    (VERDICT r2 task 1 — 7 oracle-backed digests fell off the end of the
    r2 window)."""
    oracle, rows_only = {}, {}
    for m in ALL_MODULES:
        for name, pair in m.QUERIES.items():
            (oracle if pair[1] is not None else rows_only)[name] = pair
    return {**oracle, **rows_only}


def all_queries():
    return {name: b for name, (b, _sql) in _registry().items()}


def all_oracles():
    return {name: sql for name, (_b, sql) in _registry().items()
            if sql is not None}


def all_diagnostics():
    """Builders kept OUT of the driver window (superseded by digest twins,
    or documented O(N²) diagnostics) but still bench-/pytest-runnable.
    Same (builder, oracle_sql|None) shape as QUERIES."""
    out = {}
    for m in ALL_MODULES:
        out.update(getattr(m, "DIAGNOSTICS", {}))
    return out
