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
