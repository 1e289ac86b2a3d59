"""Snapshot-committed parquet warehouse + per-partition lineage.

This environment ships no Iceberg runtime jar, so the Iceberg semantics the
design calls for (SURVEY.md §1.4) are provided by a thin, self-contained
layer over partitioned parquet:

  * **bucket partitioning**: every output table is laid out as
    ``<table>/bucket=<k>/part-*.parquet`` with ``k = pmod(xxhash64(url), N)``
    — the moral equivalent of Iceberg ``bucket(N, url)``;
  * **atomic bucket commit**: a batch is written to a staging directory and
    moved bucket-directory-at-a-time with ``os.replace``-style renames —
    write-temp-then-atomic-commit (the reference's upload pattern,
    api/app.py:232-252, and an Iceberg snapshot commit in miniature);
  * **dynamic partition overwrite**: re-committing a bucket replaces its
    directory wholesale — the delete-then-insert idempotent-reindex contract
    (reference core/indexer.py:100-101, D1/S6);
  * **lineage**: one JSON file per committed batch records, per bucket,
    ``(input_snapshot_id, bucket, doc_count, chunk_count, failure_count,
    started_at, finished_at)`` — the jobs-queue replacement (SURVEY.md §2.9).
    Resume = anti-join of all buckets against committed lineage rows (J3).

On a real cluster each of these maps 1:1 onto Iceberg:
``bucket(N, url)`` partition spec, ``overwritePartitions()``, and a lineage
table appended with ``MERGE INTO``/append snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


def bucket_dir(table_dir: str, bucket: int) -> str:
    return os.path.join(table_dir, f"bucket={bucket}")


def commit_buckets(staging_table_dir: str, final_table_dir: str,
                   buckets: list[int]) -> None:
    """Move staged bucket directories into the table, replacing old ones."""
    os.makedirs(final_table_dir, exist_ok=True)
    for b in buckets:
        src = bucket_dir(staging_table_dir, b)
        dst = bucket_dir(final_table_dir, b)
        if not os.path.isdir(src):
            continue  # bucket had no rows in this batch
        if os.path.isdir(dst):
            old = dst + f".old-{uuid.uuid4().hex[:8]}"
            os.rename(dst, old)
            shutil.rmtree(old, ignore_errors=True)
        os.rename(src, dst)


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def append_lineage(out_dir: str, snapshot_id: str, rows: list[dict]) -> str:
    """Atomically append one lineage file (tmp write + rename)."""
    d = lineage_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    name = f"{snapshot_id}-{uuid.uuid4().hex[:12]}.json"
    tmp = os.path.join(d, "." + name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(rows, f)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(d, name)
    os.rename(tmp, final)
    return final


def read_lineage(out_dir: str) -> list[dict]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return []
    rows: list[dict] = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json") and not fn.startswith("."):
            with open(os.path.join(d, fn)) as f:
                rows.extend(json.load(f))
    return rows


def completed_buckets(out_dir: str, snapshot_id: str) -> set[int]:
    return {r["bucket"] for r in read_lineage(out_dir)
            if r["input_snapshot_id"] == snapshot_id}


def lineage_df(spark, out_dir: str):
    """Lineage as a DataFrame (for metrics queries / the J3 anti-join)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("input_snapshot_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("chunk_count", T.LongType(), False),
        T.StructField("failure_count", T.LongType(), False),
        T.StructField("started_at", T.DoubleType(), False),
        T.StructField("finished_at", T.DoubleType(), False),
    ])
    rows = read_lineage(out_dir)
    return spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields) for r in rows], schema=schema)


def now() -> float:
    return time.time()
