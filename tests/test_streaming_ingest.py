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


def test_stream_ingest_dedup_bridge(spark, tmp_path):
    """Incremental ingest dedups against the warehouse: duplicate content
    arriving in a later micro-batch run appends nothing."""
    import pandas as pd

    from docling_rag_spark.streaming.ingest import stream_ingest_dedup

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    def page(url, body):
        return {"url": url, "warc_ts": pd.Timestamp("2026-01-01", tz="UTC"),
                "html": f"# Title\n\n{body}\n".encode(), "text": None,
                "lang": "en"}

    body_a = "Shared duplicate paragraph content for the dedup bridge test."
    body_b = "Completely different second document body, long enough."
    first = pd.DataFrame([page("https://a.example/1.md", body_a),
                          page("https://a.example/2.md", body_a),  # in-batch dup
                          page("https://a.example/3.md", body_b)])
    _write_slice(first, os.path.join(pages_dir, "part-0.parquet"))

    q = stream_ingest_dedup(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "stream did not drain"
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    urls1 = {r["url"] for r in chunks.select("url").distinct().collect()}
    # in-batch dup collapsed: lowest url per content hash survives
    assert urls1 == {"https://a.example/1.md", "https://a.example/3.md"}

    # second run: one dup of batch-1 content, one genuinely new doc
    body_c = "A third, brand new body that has never been seen before."
    second = pd.DataFrame([page("https://b.example/9.md", body_a),  # dup
                           page("https://b.example/10.md", body_c)])
    _write_slice(second, os.path.join(pages_dir, "part-1.parquet"))
    q = stream_ingest_dedup(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "stream did not drain"

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    urls2 = {r["url"] for r in chunks.select("url").distinct().collect()}
    assert urls2 == urls1 | {"https://b.example/10.md"}
    # index holds exactly one row per distinct content
    idx = spark.read.parquet(os.path.join(out_dir, "dedup_index"))
    assert idx.count() == 3
    assert idx.select("content_hash").distinct().count() == 3


def test_compact_dedup_index_bounds_batch_dirs(spark, tmp_path):
    """compact_dedup_index folds per-micro-batch index dirs into one base
    dir; dedup correctness is preserved across the fold and the newest
    batch only folds when the caller attests the stream is stopped."""
    import pandas as pd

    from docling_rag_spark.streaming.ingest import (compact_dedup_index,
                                                    stream_ingest_dedup)

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    def page(url, body):
        return {"url": url, "warc_ts": pd.Timestamp("2026-01-01", tz="UTC"),
                "html": f"# Title\n\n{body}\n".encode(), "text": None,
                "lang": "en"}

    body_a = "Shared duplicate paragraph content for the compaction test."
    body_b = "A different second document body, long enough to keep."
    _write_slice(pd.DataFrame([page("https://a.example/1.md", body_a)]),
                 os.path.join(pages_dir, "part-0.parquet"))
    q = stream_ingest_dedup(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120)
    _write_slice(pd.DataFrame([page("https://a.example/2.md", body_b)]),
                 os.path.join(pages_dir, "part-1.parquet"))
    q = stream_ingest_dedup(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120)

    index_dir = os.path.join(out_dir, "dedup_index")
    n_batches = len([d for d in os.listdir(index_dir)
                     if d.startswith("batch=")])
    assert n_batches == 2
    rep = compact_dedup_index(spark, out_dir)
    assert rep["compacted_batches"] == n_batches - 1
    assert os.path.isdir(os.path.join(index_dir, "base"))

    # dedup still holds against base + remaining batch dirs
    body_c = "A third brand-new body for the post-compaction batch run."
    _write_slice(pd.DataFrame([
        page("https://b.example/9.md", body_a),   # dup of folded content
        page("https://b.example/10.md", body_b),  # dup of unfolded batch
        page("https://b.example/11.md", body_c)]),
        os.path.join(pages_dir, "part-2.parquet"))
    q = stream_ingest_dedup(spark, pages_dir, out_dir, ckpt)
    assert q.awaitTermination(120)
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    urls = {r["url"] for r in chunks.select("url").distinct().collect()}
    assert urls == {"https://a.example/1.md", "https://a.example/2.md",
                    "https://b.example/11.md"}

    # full fold on a stopped stream: batch dirs gone, one hash per content
    rep = compact_dedup_index(spark, out_dir, include_newest=True)
    assert rep["compacted_batches"] >= 1
    assert [d for d in os.listdir(index_dir) if d.startswith("batch=")] == []
    base = spark.read.parquet(os.path.join(index_dir, "base"))
    assert base.count() == base.select("content_hash").distinct().count() == 3
