"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship fused parse+chunk pipeline; ``queries`` /
``oracle_sql`` expose the full operator surface (SURVEY.md §2 + the
training-data ops) with DuckDB twins for the driver's correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused parse+chunk extraction over sf0.001 documents."""
    from docling_rag_spark.queries.extraction import extract_chunks
    return extract_chunks(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_rag_spark.queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    from docling_rag_spark.queries import all_oracles
    return all_oracles()
