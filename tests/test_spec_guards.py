"""Guard rails around the warehouse bucket spec and commit lock
(review findings: legacy-warehouse default pinning, crashed-rebucket
marker, key-column drops, dead-holder lock steal)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.plans.job import delete_urls, run_extraction
from docling_rag_spark.plans.maintenance import rebucket_warehouse
from docling_rag_spark.sources.pages import PAGES_ARROW_SCHEMA, generate_pages


def _write(df: pd.DataFrame, path: str) -> None:
    pq.write_table(pa.Table.from_pandas(df, schema=PAGES_ARROW_SCHEMA,
                                        preserve_index=False), path)


def _mk_wh(spark, tmp_path, n_buckets=4, n_docs=10, seed=201):
    base = generate_pages(n_docs, seed=seed)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, num_buckets=n_buckets, salt_partitions=2)
    return out, base, p


def test_legacy_warehouse_refuses_default_modulus(spark, tmp_path):
    """Bucketed data + no pinned spec (pre-upgrade warehouse): an omitted
    modulus must NOT silently assume 64 — that would scatter urls across
    two layouts and then pin the wrong spec."""
    out, base, _p = _mk_wh(spark, tmp_path, n_buckets=8)
    os.unlink(wh._warehouse_props_path(out))  # simulate the old era
    with pytest.raises(wh.BucketSpecMismatch, match="no pinned spec"):
        delete_urls(spark, out, [base["url"].iloc[0]])
    # explicit value works and the next commit re-pins it
    delete_urls(spark, out, [base["url"].iloc[0]], num_buckets=8)


def test_first_pin_validated_against_layout(spark, tmp_path):
    """Pinning a modulus smaller than the highest existing bucket dir id
    is provably wrong and must be rejected."""
    out, _base, _p = _mk_wh(spark, tmp_path, n_buckets=8)
    os.unlink(wh._warehouse_props_path(out))
    top = max(int(e.split("=")[1])
              for e in os.listdir(os.path.join(out, "extracted"))
              if e.startswith("bucket="))
    assert top >= 4  # 10 docs over 8 buckets: ids past 4 exist
    with pytest.raises(wh.BucketSpecMismatch, match="layout modulus"):
        wh.pin_num_buckets(out, 4)
    wh.pin_num_buckets(out, 8)  # the true layout pins fine
    assert wh.warehouse_num_buckets(out) == 8


def test_crashed_rebucket_blocks_writers_until_rerun(spark, tmp_path):
    out, base, p = _mk_wh(spark, tmp_path, n_buckets=4)
    # simulate the crash window: marker set, job died before the final pin
    wh.mark_rebucket(out, 4, 8)
    with pytest.raises(wh.BucketSpecMismatch, match="did not complete"):
        run_extraction(spark, p, out, snapshot_id="v2", salt_partitions=2)
    with pytest.raises(wh.BucketSpecMismatch, match="rebucket --to 8"):
        delete_urls(spark, out, [base["url"].iloc[0]])
    # reads stay available through the marker
    assert wh.read_table(spark, out, "extracted").count() == len(base)
    # the documented recovery — rerunning the rebucket — clears it
    res = rebucket_warehouse(spark, out, 8)
    assert res["rebucketed"]
    assert wh.rebucket_in_progress(out) is None
    assert wh.warehouse_num_buckets(out) == 8
    run_extraction(spark, p, out, snapshot_id="v2", salt_partitions=2,
                   mode="merge")


def test_table_key_columns_not_droppable(tmp_path):
    from pyspark.sql import types as T

    out = str(tmp_path)
    wh.pin_table_schema(out, "chunks", T.StructType(
        [T.StructField("url", T.StringType()),
         T.StructField("chunk_id", T.IntegerType()),
         T.StructField("text", T.StringType())]))
    with pytest.raises(wh.SchemaEvolutionError, match="identity"):
        wh.drop_table_column(out, "chunks", "chunk_id")
    wh.drop_table_column(out, "chunks", "text")  # non-key drops fine


def test_dead_holder_lock_steals_immediately(tmp_path):
    """A lock file owned by a dead pid must be stolen on sight, not after
    stale_sec — a reader repairing a crashed commit would otherwise block
    the full stale window (review finding)."""
    out = str(tmp_path)
    os.makedirs(out, exist_ok=True)
    lock_path = os.path.join(out, "_commit.lock")
    # pid 2^22+larger than pid_max defaults: guaranteed-dead process id
    with open(lock_path, "w") as f:
        f.write("99999999-deadbeef")
    t0 = time.time()
    with wh.commit_lock(out, timeout=30.0, stale_sec=600.0):
        pass
    assert time.time() - t0 < 5.0, "dead-holder lock was not stolen fast"
    # a LIVE holder is respected (our own pid): times out instead
    with open(lock_path, "w") as f:
        f.write(f"{os.getpid()}-feedface")
    t0 = time.time()
    with pytest.raises(TimeoutError):
        with wh.commit_lock(out, timeout=1.0, stale_sec=600.0):
            pass
    assert time.time() - t0 >= 1.0
    os.unlink(lock_path)


def test_as_of_accepts_historical_modulus(spark, tmp_path):
    """Time travel to before a rebucket may pass the era's OLD modulus —
    a pure read must not be rejected by write-path spec validation."""
    from docling_rag_spark.io import snapshots as snap

    base = generate_pages(12, seed=202)
    p = str(tmp_path / "p.parquet")
    _write(base, p)
    out = str(tmp_path / "wh")
    run_extraction(spark, p, out, num_buckets=8, salt_partitions=2,
                   retain_snapshots=True)
    time.sleep(0.05)
    ts_mid = wh.now()
    time.sleep(0.05)
    rebucket_warehouse(spark, out, 3)
    df = snap.read_table_as_of(spark, out, "extracted", ts_mid,
                               num_buckets=8)
    assert df.count() == len(base)
