"""Regression: a batch whose buckets contain zero pages must commit
zero-count lineage (not crash on the empty staged-table read-back)."""

from __future__ import annotations

from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.plans.job import run_extraction
from docling_rag_spark.sources.pages import write_pages_parquet


def test_empty_bucket_batches_commit_lineage(spark, tmp_path):
    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 30)  # 30 urls over 64 buckets: gaps certain
    report = run_extraction(spark, pages, out, num_buckets=64,
                            buckets_per_batch=4, salt_partitions=4)
    assert report.doc_count == 30
    assert report.buckets_done == 64
    # every bucket — including empty ones — has a committed lineage row,
    # so a rerun resumes to a no-op
    assert wh.completed_buckets(out, "snap-0") == set(range(64))
    again = run_extraction(spark, pages, out, num_buckets=64,
                           buckets_per_batch=4, salt_partitions=4)
    assert again.buckets_skipped == 64 and again.doc_count == 0
