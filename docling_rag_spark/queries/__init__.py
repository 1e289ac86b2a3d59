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

from docling_rag_spark.queries import dedup, extraction, relational, textstats, vectors

ALL_MODULES = (relational, textstats, dedup, vectors, extraction)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        for name, (builder, _sql) in m.QUERIES.items():
            out[name] = builder
    return out


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        for name, (_builder, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
