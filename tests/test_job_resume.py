"""Lineage, checkpoint resume, idempotent overwrite (SURVEY.md M4)."""

import os

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.plans.job import read_chunks, read_extracted, run_extraction
from docling_rag_spark.sources.pages import write_pages_parquet

N_DOCS = 60
N_BUCKETS = 8


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_pages_parquet(str(p), N_DOCS)
    return str(p)


def test_full_run_and_lineage(spark, pages_path, tmp_path):
    out = str(tmp_path / "wh")
    report = run_extraction(spark, pages_path, out,
                            num_buckets=N_BUCKETS, salt_partitions=4)
    assert report.buckets_done == N_BUCKETS and report.buckets_skipped == 0
    assert report.doc_count == N_DOCS
    assert report.failure_count >= 1  # the corrupt fixture
    rows = wh.read_lineage(out)
    assert {r["bucket"] for r in rows} == set(range(N_BUCKETS))
    assert sum(r["doc_count"] for r in rows) == N_DOCS
    # tables readable, chunk totals agree with lineage
    assert read_extracted(spark, out).count() == N_DOCS
    assert read_chunks(spark, out).count() == sum(r["chunk_count"] for r in rows)
    # lineage as DataFrame (metrics surface)
    ldf = wh.lineage_df(spark, out)
    assert ldf.agg(F.sum("doc_count")).first()[0] == N_DOCS


def test_rerun_is_noop_idempotent(spark, pages_path, tmp_path):
    out = str(tmp_path / "wh")
    run_extraction(spark, pages_path, out, num_buckets=N_BUCKETS, salt_partitions=4)
    before = read_chunks(spark, out).count()
    report2 = run_extraction(spark, pages_path, out,
                             num_buckets=N_BUCKETS, salt_partitions=4)
    assert report2.buckets_skipped == N_BUCKETS and report2.buckets_done == 0
    assert read_chunks(spark, out).count() == before  # no duplicates (D1)


def test_crash_then_resume_completes(spark, pages_path, tmp_path):
    out = str(tmp_path / "wh")
    with pytest.raises(RuntimeError, match="injected"):
        run_extraction(spark, pages_path, out, num_buckets=N_BUCKETS,
                       buckets_per_batch=3, salt_partitions=4,
                       _fail_after_batches=1)
    partial = wh.completed_buckets(out, "snap-0")
    assert len(partial) == 3
    report = run_extraction(spark, pages_path, out, num_buckets=N_BUCKETS,
                            buckets_per_batch=3, salt_partitions=4)
    assert report.buckets_skipped == 3
    assert report.buckets_done == N_BUCKETS - 3
    # resumed output identical to a clean full run
    out2 = str(tmp_path / "wh2")
    run_extraction(spark, pages_path, out2, num_buckets=N_BUCKETS, salt_partitions=4)
    a = {(r.url, r.chunk_id, r.text) for r in
         read_chunks(spark, out).select("url", "chunk_id", "text").collect()}
    b = {(r.url, r.chunk_id, r.text) for r in
         read_chunks(spark, out2).select("url", "chunk_id", "text").collect()}
    assert a == b and len(a) > 0


def test_new_snapshot_overwrites_buckets(spark, pages_path, tmp_path):
    out = str(tmp_path / "wh")
    run_extraction(spark, pages_path, out, num_buckets=N_BUCKETS, salt_partitions=4)
    n1 = read_chunks(spark, out).count()
    report = run_extraction(spark, pages_path, out, snapshot_id="snap-1",
                            num_buckets=N_BUCKETS, salt_partitions=4)
    assert report.buckets_done == N_BUCKETS  # new snapshot redoes all buckets
    assert read_chunks(spark, out).count() == n1  # overwrite, not append


def test_staging_cleaned(spark, pages_path, tmp_path):
    out = str(tmp_path / "wh")
    run_extraction(spark, pages_path, out, num_buckets=N_BUCKETS, salt_partitions=4)
    assert not os.path.exists(os.path.join(out, "_staging"))
