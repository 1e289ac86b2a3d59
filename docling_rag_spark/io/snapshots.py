"""Iceberg-style snapshot retention: time travel, rollback, expiry.

The reference leans on postgres MVCC for point-in-time consistency (every
read runs inside a transaction snapshot; ``DELETE``/upsert history lives in
the WAL until vacuum). Iceberg makes the same facility explicit: every
commit is a snapshot in the table's metadata log, old data files stay on
disk until ``expire_snapshots``, and ``SELECT ... FOR TIMESTAMP AS OF`` /
``rollback_to_snapshot`` resolve a historical file list.

This module is that metadata log for the bucket-committed parquet
warehouse (io/warehouse.py):

  * **retention** — ``commit_buckets(..., retain_to=...)`` parks each
    displaced bucket directory under
    ``<out>/_snapshots/<table>/<commit_id>/bucket=<k>`` instead of
    deleting it (a metadata-only rename: no data is copied, exactly like
    an Iceberg commit leaving the previous snapshot's files in place);
  * **commit log** — an append-only parquet table
    (``<out>/_snapshots/log/``, one fsync'd file per commit, the same
    atomic-append protocol as lineage) recording
    ``(commit_id, table, bucket, had_prev, committed_at)`` per bucket a
    commit replaced or created;
  * **time travel** — ``read_table_as_of`` resolves, per bucket, the
    directory that was live at the requested timestamp: the version
    retained by the EARLIEST commit after the timestamp, or the current
    directory when no later commit touched the bucket;
  * **rollback** — ``rollback_table`` re-installs an as-of view as a new
    retained commit (history is never rewritten: the rolled-back-over
    state remains time-travel-readable, exactly like Iceberg's
    rollback producing a new snapshot);
  * **expiry** — ``expire_snapshots`` deletes retained commits older than
    a cutoff and compacts the log, bounding storage; reads as-of times
    earlier than the cutoff then raise ``SnapshotExpired``.

Scale notes: retention is O(buckets touched) directory renames inside the
already-held commit lock; the log is tiny (a few rows per commit) and read
driver-side like lineage; expiry is a driver-side metadata delete. Every
piece maps 1:1 onto the Iceberg snapshot log / ``expire_snapshots`` /
``rollback_to_timestamp`` procedures.

Coverage: every bucket-structured table rewrite retains once the
warehouse has a ``_snapshots`` dir (extraction commits, merge mode,
deletes, registry upserts, stream folds — via
``commit_buckets_retained``). NOT retained: streaming ``batch=<id>``
dirs (a transient pre-fold layout) and the derived ANN index (rebuildable
from the embeddings table). Known race, shared with plain current-table
reads: an as-of DataFrame resolved before a concurrent ``expire`` may
fail mid-scan when the retained files vanish — rerun after expiry.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from docling_rag_spark.config import DEFAULT_NUM_BUCKETS

LOG_ARROW_SCHEMA = pa.schema([
    ("commit_id", pa.string()),
    ("table", pa.string()),
    ("bucket", pa.int32()),
    ("had_prev", pa.bool_()),
    ("committed_at", pa.float64()),
])


class SnapshotExpired(RuntimeError):
    """The as-of timestamp predates the oldest retained snapshot for at
    least one bucket — its historical version was expired."""


def snapshots_root(out_dir: str) -> str:
    return os.path.join(out_dir, "_snapshots")


def retained_dir(out_dir: str, table: str, commit_id: str) -> str:
    return os.path.join(snapshots_root(out_dir), table, commit_id)


def _log_dir(out_dir: str) -> str:
    return os.path.join(snapshots_root(out_dir), "log")


def log_append(out_dir: str, rows: list[dict]) -> str:
    """Atomic fsync'd append of one commit's log rows (same durability
    contract as warehouse.append_lineage — the log IS the time-travel
    commit record)."""
    d = _log_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    name = f"commit-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(d, "." + name + ".tmp")
    cols = {f.name: [r[f.name] for r in rows] for f in LOG_ARROW_SCHEMA}
    with open(tmp, "wb") as f:
        pq.write_table(pa.table(cols, schema=LOG_ARROW_SCHEMA), f)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(d, name)
    os.rename(tmp, final)
    return final


def _watermark_path(out_dir: str) -> str:
    return os.path.join(snapshots_root(out_dir), "expired_before")


def expired_before(out_dir: str) -> float | None:
    """Expiry watermark: time travel to any instant earlier than this is
    unavailable (Iceberg: the snapshot was removed from the metadata log).
    ``None`` = nothing expired yet."""
    try:
        with open(_watermark_path(out_dir)) as f:
            return float(f.read())
    except (FileNotFoundError, ValueError):
        return None


def _set_expired_before(out_dir: str, ts: float) -> None:
    p = _watermark_path(out_dir)
    tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(repr(ts))
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, p)


def log_read(out_dir: str) -> list[dict]:
    d = _log_dir(out_dir)
    if not os.path.isdir(d):
        return []
    rows: list[dict] = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet") and not fn.startswith("."):
            try:
                rows.extend(pq.read_table(os.path.join(d, fn)).to_pylist())
            except pa.ArrowInvalid as exc:
                import warnings
                warnings.warn(f"skipping unreadable snapshot log {fn}: {exc}")
    return rows


def retention_enabled(out_dir: str) -> bool:
    """True once any retained commit has been made (``_snapshots`` dir
    exists). Every bucket-rewriting writer — delete, registry upsert,
    stream fold — must then retain what it displaces: a single
    non-retaining rewrite silently corrupts every as-of read before it."""
    return os.path.isdir(snapshots_root(out_dir))


def commit_buckets_retained(out_dir: str, staging_table_dir: str, table: str,
                            buckets: list[int], commit_tag: str,
                            committed_at: float) -> str | None:
    """``warehouse.commit_buckets`` honoring warehouse-level retention.

    Call in place of ``commit_buckets`` (inside the same commit lock) at
    every bucket-rewrite site that is not the extraction job itself. When
    retention is off this is exactly ``commit_buckets``; when on, the
    displaced dirs are parked and logged under a fresh commit id (returned).
    """
    from docling_rag_spark.io.warehouse import commit_buckets

    table_dir = os.path.join(out_dir, table)
    enabled = retention_enabled(out_dir)
    commit_id = f"{commit_tag}-{uuid.uuid4().hex[:12]}"
    installed = commit_buckets(
        staging_table_dir, table_dir, buckets,
        retain_to=retained_dir(out_dir, table, commit_id) if enabled
        else None)
    if enabled and installed:
        log_append(out_dir, [
            {"commit_id": commit_id, "table": table, "bucket": b,
             "had_prev": had_prev, "committed_at": committed_at}
            for b, had_prev in installed])
        return commit_id
    return None


def resolve_as_of(out_dir: str, table: str, ts: float) -> dict[int, str | None]:
    """Per bucket, the directory holding its content as of ``ts``.

    ``None`` value = the bucket did not exist at ``ts`` (its earliest
    post-``ts`` commit created it). Buckets untouched after ``ts`` resolve
    to their current directory. Raises :class:`SnapshotExpired` when a
    needed retained version was expired.
    """
    from docling_rag_spark.io.warehouse import bucket_dir

    wm = expired_before(out_dir)
    if wm is not None and ts < wm:
        raise SnapshotExpired(
            f"as-of {ts} predates the expiry watermark {wm}: that history "
            "was removed by expire_snapshots")

    table_dir = os.path.join(out_dir, table)
    # earliest commit AFTER ts per bucket displaced (or created over) the
    # version live at ts
    first_after: dict[int, dict] = {}
    for r in log_read(out_dir):
        if r["table"] != table or r["committed_at"] <= ts:
            continue
        b = r["bucket"]
        cur = first_after.get(b)
        if cur is None or r["committed_at"] < cur["committed_at"]:
            first_after[b] = r

    out: dict[int, str | None] = {}
    for b, r in first_after.items():
        if not r["had_prev"]:
            out[b] = None  # created after ts
            continue
        d = os.path.join(retained_dir(out_dir, table, r["commit_id"]),
                         f"bucket={b}")
        if not os.path.isdir(d):
            raise SnapshotExpired(
                f"{table} bucket {b} as of {ts}: retained version of commit "
                f"{r['commit_id']!r} was expired")
        out[b] = d
    if os.path.isdir(table_dir):
        for e in os.listdir(table_dir):
            if e.startswith("bucket="):
                b = int(e.split("=", 1)[1])
                if b not in out:
                    out[b] = bucket_dir(table_dir, b)
    return out


def read_table_as_of(spark, out_dir: str, table: str, ts: float,
                     num_buckets: int = DEFAULT_NUM_BUCKETS):
    """The table's content as of ``ts`` as a DataFrame (Iceberg
    ``FOR TIMESTAMP AS OF``). The ``bucket`` partition column is
    re-derived from ``url`` (resolved paths span retained and current
    parents, so partition-dir inference cannot supply it)."""
    from pyspark.sql import functions as F

    from docling_rag_spark.plans.job import bucket_of

    paths = [p for p in resolve_as_of(out_dir, table, ts).values()
             if p is not None]
    if not paths:
        raise FileNotFoundError(
            f"table {table!r} had no committed buckets as of {ts}")
    return (spark.read.parquet(*paths)
            .withColumn("bucket", bucket_of(F.col("url"), num_buckets)))


def expire_snapshots(out_dir: str, older_than: float) -> dict:
    """Drop retained commits with ``committed_at < older_than`` and
    compact the log (Iceberg ``expire_snapshots``). Time travel to any
    instant earlier than the oldest surviving commit becomes unavailable.
    Serialized against concurrent commits via the warehouse commit lock.
    """
    from docling_rag_spark.io.warehouse import commit_lock

    with commit_lock(out_dir):
        rows = log_read(out_dir)
        keep = [r for r in rows if r["committed_at"] >= older_than]
        drop = [r for r in rows if r["committed_at"] < older_than]
        removed = 0
        for r in drop:
            d = retained_dir(out_dir, r["table"], r["commit_id"])
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
        if drop:
            d = _log_dir(out_dir)
            old_files = [fn for fn in os.listdir(d)
                         if fn.endswith(".parquet") and not fn.startswith(".")]
            if keep:
                log_append(out_dir, keep)
            for fn in old_files:
                os.unlink(os.path.join(d, fn))
        prev_wm = expired_before(out_dir)
        if prev_wm is None or older_than > prev_wm:
            os.makedirs(snapshots_root(out_dir), exist_ok=True)
            _set_expired_before(out_dir, older_than)
        return {"expired_commits": len({(r['table'], r['commit_id'])
                                        for r in drop}),
                "dirs_removed": removed, "log_rows": len(keep)}


def rollback_table(out_dir: str, table: str, ts: float) -> dict:
    """Restore ``table`` to its as-of-``ts`` state as a NEW retained
    commit (Iceberg ``rollback_to_timestamp``: history moves forward, the
    rolled-back-over state stays time-travel-readable). Driver-side
    directory ops under the commit lock; retained versions are COPIED in
    (they must survive for older as-of reads)."""
    from docling_rag_spark.io.warehouse import bucket_dir, commit_lock, now

    table_dir = os.path.join(out_dir, table)
    commit_id = f"rollback-{uuid.uuid4().hex[:12]}"
    with commit_lock(out_dir):
        resolved = resolve_as_of(out_dir, table, ts)
        park = retained_dir(out_dir, table, commit_id)
        commit_ts = now()
        log_rows, installed, removed = [], 0, 0
        for b, src in sorted(resolved.items()):
            cur = bucket_dir(table_dir, b)
            if src == cur:
                continue  # unchanged since ts
            had_prev = os.path.isdir(cur)
            if src is None and not had_prev:
                continue  # absent at ts and absent now: nothing to do
            if had_prev:
                os.makedirs(park, exist_ok=True)
                os.rename(cur, os.path.join(park, f"bucket={b}"))
            if src is not None:
                shutil.copytree(src, cur)
                installed += 1
            else:
                removed += 1
            log_rows.append({"commit_id": commit_id, "table": table,
                             "bucket": b, "had_prev": had_prev,
                             "committed_at": commit_ts})
        if log_rows:
            log_append(out_dir, log_rows)
        return {"commit_id": commit_id, "buckets_installed": installed,
                "buckets_removed": removed, "buckets_changed": len(log_rows)}
