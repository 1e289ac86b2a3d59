"""Incremental streaming ingest: exactly-once file processing, batch parity."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from docling_rag_spark.sources.pages import PAGES_ARROW_SCHEMA, generate_pages
from docling_rag_spark.streaming.ingest import stream_extract_chunks


def _write_slice(df, path):
    table = pa.Table.from_pandas(df, schema=PAGES_ARROW_SCHEMA,
                                 preserve_index=False)
    pq.write_table(table, path)


def test_stream_incremental_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    all_pages = generate_pages(60, include_fixtures=False)
    first, second = all_pages.iloc[:40], all_pages.iloc[40:]
    _write_slice(first, os.path.join(pages_dir, "part-0.parquet"))

    q = stream_extract_chunks(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120), 'stream did not drain'
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # drop a new file; rerun drains ONLY the new file (checkpointed)
    _write_slice(second, os.path.join(pages_dir, "part-1.parquet"))
    q = stream_extract_chunks(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120), 'stream did not drain'
    streamed = spark.read.parquet(out_dir)
    n2 = streamed.count()
    assert n2 > n1

    # third run with nothing new: no duplicates appended
    q = stream_extract_chunks(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120), 'stream did not drain'
    assert spark.read.parquet(out_dir).count() == n2

    # parity with the batch stage on the same input
    from docling_rag_spark.operators.pipeline import (
        chunks_table, extract_documents)
    batch = chunks_table(extract_documents(
        spark.read.parquet(pages_dir), salt_partitions=4))
    assert batch.count() == n2
    got = {(r["url"], r["chunk_id"], r["text"])
           for r in streamed.select("url", "chunk_id", "text").collect()}
    want = {(r["url"], r["chunk_id"], r["text"])
            for r in batch.select("url", "chunk_id", "text").collect()}
    assert got == want
