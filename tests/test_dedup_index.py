"""Incremental MinHash-LSH band index: delta pairs == batch pairs.

The invariant: candidate pairs from a delta joined against the
materialized band index must EQUAL the batch job's pairs over the whole
corpus restricted to pairs touching the delta — signatures depend only on
each doc's own text, so incremental and batch derivations are the same
function evaluated lazily vs eagerly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_rag_spark.plans.dedup_index import (
    append_band_delta,
    build_band_index,
    incremental_minhash_pairs,
)
from docling_rag_spark.queries.dedup import minhash_pairs_for

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text"))


def _split(docs, lo_pct: int, hi_pct: int):
    """Deterministic slice by doc_id percentile bucket (md5-keyed so the
    slices are hash-random, not id-ordered)."""
    bucket = F.abs(F.hash(F.col("doc_id"))) % 100
    return docs.filter((bucket >= lo_pct) & (bucket < hi_pct))


def _pairs_touching(batch_df, delta_ids):
    return sorted(
        tuple(r) for r in batch_df
        .filter(F.col("doc_a").isin(delta_ids)
                | F.col("doc_b").isin(delta_ids))
        .collect())


def test_incremental_equals_batch(spark, tmp_path):
    docs = _docs(spark)
    old = _split(docs, 0, 70)
    delta1 = _split(docs, 70, 90)
    delta2 = _split(docs, 90, 100)
    idx = str(tmp_path / "dedup_idx")

    build_band_index(spark, old, idx)

    # day 1: delta1 vs (old)
    got1 = sorted(tuple(r) for r in
                  incremental_minhash_pairs(spark, delta1, idx).collect())
    batch1 = minhash_pairs_for(old.union(delta1))
    ids1 = [r.doc_id for r in delta1.select("doc_id").collect()]
    assert got1 == _pairs_touching(batch1, ids1)
    assert len(got1) > 0  # the fixture corpus HAS near-dups across slices

    # day 2: after appending delta1, delta2 sees old+delta1
    append_band_delta(spark, delta1, idx)
    got2 = sorted(tuple(r) for r in
                  incremental_minhash_pairs(spark, delta2, idx).collect())
    batch2 = minhash_pairs_for(docs)
    ids2 = [r.doc_id for r in delta2.select("doc_id").collect()]
    assert got2 == _pairs_touching(batch2, ids2)


def test_index_join_broadcasts_delta(spark, tmp_path):
    """The corpus-sized index side must NEVER shuffle: the delta
    broadcasts into the index scan (map-side hash join)."""
    docs = _docs(spark)
    idx = str(tmp_path / "dedup_idx")
    build_band_index(spark, _split(docs, 0, 80), idx)
    plan = (incremental_minhash_pairs(spark, _split(docs, 80, 100), idx)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_index_is_band_partitioned(spark, tmp_path):
    import os
    docs = _docs(spark)
    idx = str(tmp_path / "dedup_idx")
    path = build_band_index(spark, docs, idx)
    parts = sorted(d for d in os.listdir(path) if d.startswith("band="))
    assert len(parts) == 16
