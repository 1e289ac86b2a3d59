"""Incremental ANN-index maintenance: delta appends, pruned probes,
compaction parity."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from docling_rag_spark.sources.pages import PAGES_ARROW_SCHEMA, generate_pages
from docling_rag_spark.streaming.embed_index import (
    ann_probe_candidates,
    compact_ann_index,
    stream_embed_index,
)


def _write_slice(df, path):
    table = pa.Table.from_pandas(df, schema=PAGES_ARROW_SCHEMA,
                                 preserve_index=False)
    pq.write_table(table, path)


def test_stream_embed_index_deltas_and_compaction(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    all_pages = generate_pages(40, include_fixtures=False)
    _write_slice(all_pages.iloc[:25], os.path.join(pages_dir, "p0.parquet"))
    q = stream_embed_index(spark, pages_dir, out, ckpt)
    assert q.awaitTermination(180), "stream did not drain"
    _write_slice(all_pages.iloc[25:], os.path.join(pages_dir, "p1.parquet"))
    q = stream_embed_index(spark, pages_dir, out, ckpt)
    assert q.awaitTermination(180), "stream did not drain"

    delta = os.path.join(out, "ann_delta")
    batches = [d for d in os.listdir(delta) if d.startswith("batch=")]
    assert len(batches) >= 2  # each drop produced its own delta

    # the delta rows ARE the embeddings rows, bucketed
    emb = spark.read.parquet(os.path.join(out, "embeddings"))
    all_idx = spark.read.option("basePath", delta).parquet(delta)
    assert all_idx.count() == emb.count()

    # pruned probe: candidates for a bucket set == brute filter over all
    some = [r["bucket"] for r in
            all_idx.select("bucket").distinct().limit(3).collect()]
    got = ann_probe_candidates(spark, out, some)
    want = all_idx.filter(F.col("bucket").isin(some))
    assert got.count() == want.count() > 0

    # default compaction leaves the newest delta (the only batch a
    # crashed stream can replay); candidate set unchanged either way
    before = sorted(r["url"] + str(r["chunk_id"]) for r in got.collect())
    rep = compact_ann_index(spark, out)
    assert rep["compacted_batches"] == len(batches) - 1
    left = [d for d in os.listdir(delta) if d.startswith("batch=")]
    assert len(left) == 1
    mid_df = ann_probe_candidates(spark, out, some)
    assert before == sorted(r["url"] + str(r["chunk_id"])
                            for r in mid_df.collect())
    # a drained stream may fold everything with include_newest=True
    rep = compact_ann_index(spark, out, include_newest=True)
    assert rep["compacted_batches"] == 1
    left = [d for d in os.listdir(delta) if d.startswith("batch=")] \
        if os.path.isdir(delta) else []
    assert left == []
    after_df = ann_probe_candidates(spark, out, some)
    after = sorted(r["url"] + str(r["chunk_id"]) for r in after_df.collect())
    assert before == after
