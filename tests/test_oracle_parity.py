"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For every query with an oracle: run the Spark builder and the DuckDB SQL at
sf0.01, sort columns by name, normalize values, sort rows, compare exactly.
Mirrors the driver's order-insensitive value-hash so a pass here predicts a
pass in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from docling_rag_spark.queries import ALL_MODULES

SF_DIR = "/root/testdata/sf0.01"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # driver-style value normalization: fixed decimal rendering
        return f"{v:.6f}"
    return str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _pairs():
    for m in ALL_MODULES:
        for reg in ("QUERIES", "DIAGNOSTICS"):
            for name, (builder, sql) in getattr(m, reg, {}).items():
                if sql is not None:
                    yield pytest.param(builder, sql, id=name)


@pytest.mark.parametrize("builder,sql", list(_pairs()))
def test_oracle_parity(spark, builder, sql):
    got = builder(spark, SF_DIR).toPandas()
    con = _duck()
    want = con.execute(sql).df()
    con.close()
    assert sorted(got.columns) == sorted(want.columns), \
        f"schema mismatch: {sorted(got.columns)} vs {sorted(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    cg, cw = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:5]
    assert cg == cw, f"first mismatching sorted rows at {mism}: " + "; ".join(
        f"spark={cg[i]} duck={cw[i]}" for i in mism)


def test_rows_only_queries(spark):
    """Queries without oracles must still run and return rows."""
    for m in ALL_MODULES:
        for reg in ("QUERIES", "DIAGNOSTICS"):
            for name, (builder, sql) in getattr(m, reg, {}).items():
                if sql is None:
                    df = builder(spark, SF_DIR)
                    assert df.count() > 0, name
