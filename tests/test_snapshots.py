"""Snapshot retention: time travel, rollback, expiry (io/snapshots.py).

The reference gets point-in-time consistency from postgres MVCC; Iceberg
makes it explicit (snapshot log + expire_snapshots + rollback). These
tests pin the warehouse's version of that contract:

  * a retained commit makes the PRE-commit table content readable at any
    as-of instant before the commit;
  * buckets created after the as-of instant are absent from the view;
  * rollback restores the as-of state as a NEW commit (the rolled-over
    state stays readable — history is never rewritten);
  * expiry drops old retained versions and fences earlier as-of reads
    with SnapshotExpired instead of silently serving current data.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_rag_spark.io import snapshots as snap
from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.plans.job import run_extraction
from docling_rag_spark.sources.pages import PAGES_ARROW_SCHEMA, generate_pages

N_BUCKETS = 8


def _write(df: pd.DataFrame, path: str) -> None:
    pq.write_table(pa.Table.from_pandas(df, schema=PAGES_ARROW_SCHEMA,
                                        preserve_index=False), path)


def _content(df) -> list[tuple]:
    cols = sorted(c for c in df.columns if c != "bucket")
    return sorted(tuple(str(v) for v in r) for r in df.select(cols).collect())


def _table(spark, out, table):
    return spark.read.parquet(os.path.join(out, table))


@pytest.fixture(scope="module")
def wh_dir(spark, tmp_path_factory):
    """Warehouse with two retained snapshots and the instants between."""
    root = tmp_path_factory.mktemp("snapwh")
    base = generate_pages(24, seed=7)
    v1 = base.iloc[:16].copy()
    # v2: 12 of the same urls re-extracted + 8 urls v1 never saw (their
    # buckets may be created by the v2 commit)
    v2 = pd.concat([base.iloc[:12].copy(), base.iloc[16:24].copy()])
    p1, p2 = str(root / "p1.parquet"), str(root / "p2.parquet")
    _write(v1, p1)
    _write(v2, p2)
    out = str(root / "wh")
    run_extraction(spark, p1, out, snapshot_id="v1",
                   num_buckets=N_BUCKETS, salt_partitions=4,
                   retain_snapshots=True)
    time.sleep(0.05)
    ts_after_v1 = wh.now()
    time.sleep(0.05)
    run_extraction(spark, p2, out, snapshot_id="v2",
                   num_buckets=N_BUCKETS, salt_partitions=4,
                   retain_snapshots=True)
    time.sleep(0.05)
    ts_after_v2 = wh.now()
    return {"out": out, "ts1": ts_after_v1, "ts2": ts_after_v2,
            "v1_urls": set(v1["url"]), "v2_urls": set(v2["url"])}


# NOTE: tests below run in file order and share wh_dir's warehouse state
# (rollback leaves it in the v2 state; expiry runs last).

@pytest.mark.parametrize("table", ["extracted", "chunks"])
def test_time_travel_reads_pre_commit_state(spark, wh_dir, table):
    out, ts1 = wh_dir["out"], wh_dir["ts1"]
    asof = snap.read_table_as_of(spark, out, table, ts1,
                                 num_buckets=N_BUCKETS)
    current = _content(_table(spark, out, table))
    assert _content(asof) != current  # v2 really changed the table
    # the as-of view contains only v1 urls (all 16 in extracted; chunks
    # lack the error-tier docs, which emit no chunk rows)
    urls = {r["url"] for r in asof.select("url").distinct().collect()}
    assert urls <= wh_dir["v1_urls"]
    if table == "extracted":
        assert urls == wh_dir["v1_urls"]
    # v2-only urls never leak into the historical view
    assert not urls & (wh_dir["v2_urls"] - wh_dir["v1_urls"])


def test_as_of_now_equals_current(spark, wh_dir):
    out, ts2 = wh_dir["out"], wh_dir["ts2"]
    asof = _content(snap.read_table_as_of(spark, out, "extracted", ts2,
                                          num_buckets=N_BUCKETS))
    assert asof == _content(_table(spark, out, "extracted"))


def test_rollback_restores_and_keeps_history(spark, wh_dir):
    out, ts1, ts2 = wh_dir["out"], wh_dir["ts1"], wh_dir["ts2"]
    golden_v1 = _content(snap.read_table_as_of(spark, out, "extracted", ts1,
                                               num_buckets=N_BUCKETS))
    golden_v2 = _content(_table(spark, out, "extracted"))
    res = snap.rollback_table(out, "extracted", ts1)
    assert res["buckets_changed"] > 0
    # current content is v1 again
    assert _content(_table(spark, out, "extracted")) == golden_v1
    # the rolled-over v2 state is still time-travel-readable
    asof_v2 = _content(snap.read_table_as_of(spark, out, "extracted", ts2,
                                             num_buckets=N_BUCKETS))
    assert asof_v2 == golden_v2
    # and ts1 still resolves to v1 (rollback rewrote nothing historical)
    asof_v1 = _content(snap.read_table_as_of(spark, out, "extracted", ts1,
                                             num_buckets=N_BUCKETS))
    assert asof_v1 == golden_v1
    # roll forward to leave the shared fixture in the v2 state
    snap.rollback_table(out, "extracted", ts2)
    assert _content(_table(spark, out, "extracted")) == golden_v2


def test_expiry_fences_old_reads(spark, wh_dir):
    out, ts1 = wh_dir["out"], wh_dir["ts1"]
    cutoff = wh.now()
    stats = snap.expire_snapshots(out, older_than=cutoff)
    assert stats["expired_commits"] > 0
    root = snap.snapshots_root(out)
    leftover = [d for t in ("extracted", "chunks")
                if os.path.isdir(os.path.join(root, t))
                for d in os.listdir(os.path.join(root, t))]
    assert leftover == []  # every retained commit dir removed
    with pytest.raises(snap.SnapshotExpired):
        snap.read_table_as_of(spark, out, "extracted", ts1,
                              num_buckets=N_BUCKETS)
    # current reads are untouched by expiry
    assert _table(spark, out, "extracted").count() > 0


def test_delete_is_a_retained_commit(spark, tmp_path):
    """DELETE on a retention-enabled warehouse must keep pre-delete
    history readable (Iceberg DELETE produces a snapshot; a non-retaining
    rewrite would silently corrupt every earlier as-of read)."""
    from docling_rag_spark.plans.job import delete_urls

    base = generate_pages(12, seed=3)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, num_buckets=4, salt_partitions=2,
                   retain_snapshots=True)
    time.sleep(0.05)
    ts_pre = wh.now()
    time.sleep(0.05)
    victim = base["url"].iloc[0]
    delete_urls(spark, out, [victim], num_buckets=4)
    cur = {r["url"] for r in
           _table(spark, out, "extracted").select("url").collect()}
    assert victim not in cur
    asof = snap.read_table_as_of(spark, out, "extracted", ts_pre,
                                 num_buckets=4)
    assert victim in {r["url"] for r in asof.select("url").collect()}


def test_overwrite_without_retention_logs_nothing(spark, tmp_path):
    base = generate_pages(6, seed=11)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, num_buckets=4, salt_partitions=2)
    assert snap.log_read(out) == []
    assert not os.path.isdir(snap.snapshots_root(out))


def test_extraction_auto_retains_on_retained_warehouse(spark, tmp_path):
    """A warehouse with retained history must keep retaining even when a
    later run forgets --retain-snapshots: a non-retaining rewrite would
    silently corrupt every earlier as-of read (review finding r3)."""
    base = generate_pages(12, seed=21)
    p1, p2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
    _write(base.iloc[:8], p1)
    _write(base.iloc[:8], p2)  # same urls: every bucket is a rewrite
    out = str(tmp_path / "wh")
    run_extraction(spark, p1, out, snapshot_id="v1", num_buckets=4,
                   salt_partitions=2, retain_snapshots=True)
    time.sleep(0.05)
    ts_mid = wh.now()
    time.sleep(0.05)
    golden_v1 = _content(_table(spark, out, "extracted"))
    # second run WITHOUT the flag — must auto-detect and retain anyway
    run_extraction(spark, p2, out, snapshot_id="v2", num_buckets=4,
                   salt_partitions=2)
    assert any(r["commit_id"].startswith("v2-") for r in snap.log_read(out))
    asof = _content(snap.read_table_as_of(spark, out, "extracted", ts_mid,
                                          num_buckets=4))
    assert asof == golden_v1


def test_rollback_visible_to_conflict_check(spark, tmp_path):
    """rollback_table must append lineage rows so a concurrent writer's
    optimistic conflicting_buckets() check sees it and aborts instead of
    silently re-committing the rolled-back-over state."""
    base = generate_pages(10, seed=31)
    p1, p2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
    _write(base.iloc[:6], p1)
    _write(base.iloc[:6], p2)
    out = str(tmp_path / "wh")
    run_extraction(spark, p1, out, snapshot_id="v1", num_buckets=4,
                   salt_partitions=2, retain_snapshots=True)
    time.sleep(0.05)
    ts_mid = wh.now()
    time.sleep(0.05)
    run_extraction(spark, p2, out, snapshot_id="v2", num_buckets=4,
                   salt_partitions=2)
    base_ts = wh.now()  # a concurrent job reads its base state here
    time.sleep(0.05)
    res = snap.rollback_table(out, "extracted", ts_mid)
    assert res["buckets_changed"] > 0
    changed = [r["bucket"] for r in snap.log_read(out)
               if r["commit_id"] == res["commit_id"]]
    conflicts = wh.conflicting_buckets(out, "some-other-job", changed,
                                       base_ts)
    assert sorted(conflicts) == sorted(set(changed))


def test_expire_noop_on_unretained_warehouse(spark, tmp_path):
    """expire_snapshots on a never-retained warehouse must not CREATE
    _snapshots (that would silently opt every future rewrite into
    retention)."""
    base = generate_pages(6, seed=41)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, num_buckets=4, salt_partitions=2)
    stats = snap.expire_snapshots(out, older_than=wh.now())
    assert stats == {"expired_commits": 0, "dirs_removed": 0, "log_rows": 0}
    assert not os.path.isdir(snap.snapshots_root(out))
    assert not snap.retention_enabled(out)


def test_rollback_to_genesis_pins_schema(spark, tmp_path):
    """Rolling back to before the table existed must leave a readable
    empty table (schema pinned by a zero-row parquet), and rolling
    forward again must restore the content."""
    ts_genesis = wh.now()
    time.sleep(0.05)
    base = generate_pages(8, seed=51)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, snapshot_id="v1", num_buckets=4,
                   salt_partitions=2, retain_snapshots=True)
    time.sleep(0.05)
    ts_v1 = wh.now()
    golden = _content(_table(spark, out, "extracted"))
    res = snap.rollback_table(out, "extracted", ts_genesis)
    assert res["buckets_removed"] > 0 and res["buckets_installed"] == 0
    empty = _table(spark, out, "extracted")  # must not fail schema inference
    assert empty.count() == 0
    assert "url" in empty.columns
    # roll forward: the v1 state is still retained history
    snap.rollback_table(out, "extracted", ts_v1)
    assert _content(_table(spark, out, "extracted")) == golden


def test_crashed_commit_intent_recovers(spark, tmp_path):
    """A crash between the write-ahead intent and the bucket renames (or
    mid-pair) must reconcile: the half-moved bucket is restored, the dead
    intent disappears, and no log row claims a commit that never
    happened."""
    base = generate_pages(8, seed=61)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, snapshot_id="v1", num_buckets=4,
                   salt_partitions=2, retain_snapshots=True)
    golden = _content(_table(spark, out, "extracted"))
    table_dir = os.path.join(out, "extracted")
    b = next(int(e.split("=")[1]) for e in sorted(os.listdir(table_dir))
             if e.startswith("bucket="))
    # simulate the crash: intent written, old dir parked, new NOT installed
    cid = "crash-test-000000000000"
    intent = snap._write_intent(out, cid, [{
        "commit_id": cid, "table": "extracted", "bucket": b,
        "had_prev": True, "committed_at": wh.now()}])
    park_b = os.path.join(snap.retained_dir(out, "extracted", cid),
                          f"bucket={b}")
    os.makedirs(os.path.dirname(park_b), exist_ok=True)
    os.rename(wh.bucket_dir(table_dir, b), park_b)
    assert os.path.isfile(intent)
    # any as-of read triggers recovery (writers recover under their lock)
    snap.read_table_as_of(spark, out, "extracted", wh.now(), num_buckets=4)
    assert snap._intent_files(out) == []
    assert not any(r["commit_id"] == cid for r in snap.log_read(out))
    assert _content(_table(spark, out, "extracted")) == golden


def test_completed_unfinalized_intent_is_kept(spark, tmp_path):
    """The mirror crash window: every rename done but the intent not yet
    promoted — recovery must KEEP the commit (finalize the log row), not
    roll it back."""
    import shutil as sh
    base = generate_pages(8, seed=71)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, snapshot_id="v1", num_buckets=4,
                   salt_partitions=2, retain_snapshots=True)
    table_dir = os.path.join(out, "extracted")
    b = next(int(e.split("=")[1]) for e in sorted(os.listdir(table_dir))
             if e.startswith("bucket="))
    ts_pre = wh.now()
    time.sleep(0.05)
    cid = "crash-done-000000000000"
    snap._write_intent(out, cid, [{
        "commit_id": cid, "table": "extracted", "bucket": b,
        "had_prev": True, "committed_at": wh.now()}])
    park_b = os.path.join(snap.retained_dir(out, "extracted", cid),
                          f"bucket={b}")
    os.makedirs(os.path.dirname(park_b), exist_ok=True)
    cur = wh.bucket_dir(table_dir, b)
    os.rename(cur, park_b)
    sh.copytree(park_b, cur)  # "new" version installed (same content here)
    with wh.commit_lock(out):
        assert snap.recover_intents(out) == 1
    rows = [r for r in snap.log_read(out) if r["commit_id"] == cid]
    assert len(rows) == 1 and rows[0]["had_prev"]
    # pre-"commit" as-of resolves the bucket to the retained version
    asof = snap.read_table_as_of(spark, out, "extracted", ts_pre,
                                 num_buckets=4)
    assert asof.count() > 0
