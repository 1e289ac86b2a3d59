"""delete_urls: bucket-local DELETE across warehouse tables (J4 cascade)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from docling_rag_spark.plans.job import delete_urls, run_extraction
from docling_rag_spark.sources.pages import write_pages_parquet


def _chunk_urls(spark, out):
    return {r["url"] for r in
            spark.read.parquet(os.path.join(out, "chunks"))
            .select("url").distinct().collect()}


def test_delete_urls_cascade(spark, tmp_path):
    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 80)
    run_extraction(spark, pages, out, num_buckets=8, salt_partitions=4)

    before = _chunk_urls(spark, out)
    victims = sorted(before)[:3]
    survivors = before - set(victims)

    # snapshot file lists of every bucket dir to prove locality afterwards
    def file_map(table):
        m = {}
        tdir = os.path.join(out, table)
        for b in os.listdir(tdir):
            d = os.path.join(tdir, b)
            m[b] = sorted(f for f in os.listdir(d)
                          if not f.startswith((".", "_")))
        return m
    chunks_files_before = file_map("chunks")

    report = delete_urls(spark, out, victims, num_buckets=8,
                         tables=("chunks", "extracted"))
    assert report["rows_deleted"]["chunks"] > 0
    assert report["rows_deleted"]["extracted"] == len(victims)

    after = _chunk_urls(spark, out)
    assert after == survivors
    ex_urls = {r["url"] for r in
               spark.read.parquet(os.path.join(out, "extracted"))
               .select("url").collect()}
    assert not (ex_urls & set(victims))

    # untouched buckets kept their exact files (bucket-local rewrite)
    rewritten = {f"bucket={b}" for b in report["buckets_rewritten"]}
    chunks_files_after = file_map("chunks")
    for b, files in chunks_files_before.items():
        if b not in rewritten:
            assert chunks_files_after[b] == files, b

    # parquet stays readable bucket-by-bucket (incl. emptied buckets)
    for b, files in chunks_files_after.items():
        for f in files:
            pq.read_table(os.path.join(out, "chunks", b, f))


def test_delete_cascades_into_ann_index(spark, tmp_path):
    """A deleted url must vanish from the materialized ANN index and the
    streaming deltas — a stale index would keep ranking its chunks in
    mode=ann searches (review r3 finding)."""
    from pyspark.sql import functions as F

    from docling_rag_spark.operators.embed import embed_chunks
    from docling_rag_spark.plans.ann_index import build_ann_index
    from docling_rag_spark.plans.job import bucket_of

    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 60)
    run_extraction(spark, pages, out, num_buckets=8, salt_partitions=4)
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    (embed_chunks(chunks)
     .withColumn("bucket", bucket_of(F.col("url"), 8))
     .write.partitionBy("bucket").mode("overwrite")
     .parquet(os.path.join(out, "embeddings")))
    build_ann_index(spark, spark.read.parquet(os.path.join(out, "embeddings")),
                    os.path.join(out, "ann"), id_cols=("url", "chunk_id"))

    victims = sorted(_chunk_urls(spark, out))[:2]
    report = delete_urls(spark, out, victims, num_buckets=8)
    assert report["ann_rows_deleted"].get("ann/lsh", 0) > 0
    # pq (IVF-PQ codes table) must cascade too — a stale codes table would
    # keep ADC-ranking deleted chunks even after lsh/ivf/mt forget them
    assert os.path.isdir(os.path.join(out, "ann", "pq"))
    assert report["ann_rows_deleted"].get("ann/pq", 0) > 0
    for sub in ("lsh", "ivf", "mt", "pq"):
        idx_urls = {r["url"] for r in
                    spark.read.parquet(os.path.join(out, "ann", sub))
                    .select("url").distinct().collect()}
        assert not (idx_urls & set(victims)), sub


def test_delete_is_visible_to_extraction_conflict_check(spark, tmp_path):
    """An extraction job whose base state predates a concurrent delete must
    raise CommitConflict instead of silently resurrecting deleted urls."""
    import pytest

    from docling_rag_spark.io import warehouse as wh

    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 40)
    run_extraction(spark, pages, out, num_buckets=8)

    victims = sorted(_chunk_urls(spark, out))[:1]
    report = delete_urls(spark, out, victims, num_buckets=8)
    # simulate the delete landing AFTER a second job read its base state:
    # push the delete's lineage stamp into the future relative to that job
    future = wh.now() + 10_000
    rows = [{"input_snapshot_id": "delete-future", "bucket": b,
             "doc_count": 0, "chunk_count": 0, "failure_count": 0,
             "started_at": future, "finished_at": future}
            for b in report["buckets_rewritten"]]
    wh.append_lineage(out, "delete-future", rows)
    with pytest.raises(wh.CommitConflict):
        run_extraction(spark, pages, out, snapshot_id="snap-rerun",
                       num_buckets=8)


def test_delete_cascades_into_registry_and_stream_batches(spark, tmp_path):
    """The cascade covers the registry card table AND streaming-written
    batch=<id> layouts: deleted documents must vanish from both."""
    import pandas as pd

    from docling_rag_spark.plans.registry import upsert_registry_table

    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 40)
    run_extraction(spark, pages, out, num_buckets=8, salt_partitions=4)

    urls = sorted(_chunk_urls(spark, out))
    victim, survivor = urls[0], urls[1]
    upsert_registry_table(
        spark, out,
        spark.createDataFrame(
            pd.DataFrame({"url": [victim, survivor],
                          "title": ["vic", "sur"]})),
        num_buckets=8)

    # streaming-layout embeddings: batch dirs keyed by url
    emb_batch = os.path.join(out, "embeddings", "batch=0")
    os.makedirs(os.path.dirname(emb_batch), exist_ok=True)
    spark.createDataFrame(
        pd.DataFrame({"url": [victim, survivor], "chunk_id": [0, 0],
                      "embedding": [[0.1, 0.2], [0.3, 0.4]]})) \
        .write.mode("overwrite").parquet(emb_batch)

    report = delete_urls(spark, out, [victim], num_buckets=8)
    reg = spark.read.parquet(os.path.join(out, "registry"))
    assert {r["url"] for r in reg.select("url").collect()} == {survivor}
    emb = spark.read.parquet(os.path.join(out, "embeddings"))
    assert {r["url"] for r in emb.select("url").collect()} == {survivor}
    assert report["rows_deleted"]["registry"] == 1
    assert report["rows_deleted"]["embeddings"] == 1


def test_delete_full_wipe_leaves_readable_state(spark, tmp_path):
    """Deleting every url must not leave file-less dirs that break later
    schema inference (empty batch dirs / ANN dirs are removed)."""
    import pandas as pd

    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "wh")
    write_pages_parquet(pages, 30)
    run_extraction(spark, pages, out, num_buckets=8, salt_partitions=4)
    urls = sorted(_chunk_urls(spark, out))

    emb_batch = os.path.join(out, "embeddings", "batch=0")
    os.makedirs(os.path.dirname(emb_batch), exist_ok=True)
    spark.createDataFrame(
        pd.DataFrame({"url": urls[:2], "chunk_id": [0, 0],
                      "embedding": [[0.1], [0.2]]})) \
        .write.mode("overwrite").parquet(emb_batch)

    delete_urls(spark, out, urls, num_buckets=8)
    # batch dir fully wiped -> removed, not left file-less
    assert not os.path.isdir(emb_batch)
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.count() == 0


def test_generate_pages_empty_and_fixture_floor():
    from docling_rag_spark.sources.pages import FIXTURE_ROWS, generate_pages
    empty = generate_pages(0, include_fixtures=False)
    assert len(empty) == 0
    assert list(empty.columns) == ["url", "warc_ts", "html", "text", "lang"]
    small = generate_pages(5)
    assert len(small) == len(FIXTURE_ROWS)
