"""Concurrent-writer commit semantics (VERDICT r2 task 6).

The warehouse's check-then-commit runs under a filesystem commit lock; a
writer whose buckets were committed by a NEWER input snapshot after it
read its base state must fail with CommitConflict instead of silently
rolling those buckets back (Iceberg's optimistic-concurrency validation).
Same-snapshot concurrent commits are idempotent duplicates and pass.
"""

from __future__ import annotations

import os

import pytest

from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.plans.job import run_extraction
from docling_rag_spark.sources.pages import write_pages_parquet


def test_conflicting_buckets_primitive(tmp_path):
    out = str(tmp_path)
    base = wh.now()
    wh.append_lineage(out, "snap-A", [{
        "input_snapshot_id": "snap-A", "bucket": 3, "doc_count": 1,
        "chunk_count": 1, "failure_count": 0,
        "started_at": base, "finished_at": base + 1}])
    # different snapshot, committed after our base ts -> conflict
    assert wh.conflicting_buckets(out, "snap-B", [3, 4], base) == [3]
    # same snapshot -> benign duplicate, no conflict
    assert wh.conflicting_buckets(out, "snap-A", [3, 4], base) == []
    # committed before our base ts -> already part of our base state
    assert wh.conflicting_buckets(out, "snap-B", [3], base + 5) == []


def test_commit_lock_mutual_exclusion(tmp_path):
    out = str(tmp_path)
    with wh.commit_lock(out, timeout=0.2):
        with pytest.raises(TimeoutError):
            with wh.commit_lock(out, timeout=0.2):
                pass
    # released: re-acquirable
    with wh.commit_lock(out, timeout=0.2):
        pass


def test_stale_lock_is_stolen(tmp_path):
    out = str(tmp_path)
    lock_path = os.path.join(out, "_commit.lock")
    with open(lock_path, "w") as f:
        f.write("99999 0")
    old = 0
    os.utime(lock_path, (old, old))
    with wh.commit_lock(out, timeout=1.0, stale_sec=60):
        pass  # acquired despite the abandoned lock file


def test_stale_writer_commit_raises_conflict(spark, tmp_path):
    """Writer A (snap-0) starts; before its batch commits, writer B lands
    a newer snapshot over the same buckets. A's commit must raise."""
    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 40)

    # writer B: the 'newer snapshot' commits first, stamped in the future
    # relative to A's per-batch start (simulates B interleaving with A's
    # compute phase without needing real multiprocess timing)
    run_extraction(spark, pages, out, snapshot_id="snap-new",
                   num_buckets=8)
    future = wh.now() + 10_000
    rows = [{"input_snapshot_id": "snap-new", "bucket": b, "doc_count": 0,
             "chunk_count": 0, "failure_count": 0,
             "started_at": future, "finished_at": future}
            for b in range(8)]
    wh.append_lineage(out, "snap-new", rows)

    with pytest.raises(wh.CommitConflict) as ei:
        run_extraction(spark, pages, out, snapshot_id="snap-old",
                       num_buckets=8)
    assert ei.value.buckets  # names the buckets that moved under it


def test_same_snapshot_rerun_still_idempotent(spark, tmp_path):
    """Duplicate work on the SAME snapshot never conflicts (it's the
    resume path)."""
    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 40)
    r1 = run_extraction(spark, pages, out, snapshot_id="snap-0",
                        num_buckets=8)
    r2 = run_extraction(spark, pages, out, snapshot_id="snap-0",
                        num_buckets=8)
    assert r1.doc_count == 40 and r2.buckets_skipped == 8
