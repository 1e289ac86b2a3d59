"""End-to-end pipeline contracts on the synthetic pages table."""

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.operators.pipeline import (
    chunks_table,
    documents_table,
    extract_documents,
    extracted_table,
)
from docling_rag_spark.sources.pages import generate_pages

N_DOCS = 80


@pytest.fixture(scope="module")
def docs_df(spark):
    pages = spark.createDataFrame(generate_pages(N_DOCS))
    df = extract_documents(pages, salt_partitions=4)
    df.persist()
    yield df
    df.unpersist()


def test_all_rows_accounted(docs_df):
    assert docs_df.count() == N_DOCS


def test_fixture_e2e_chunks_golden(docs_df):
    rows = (chunks_table(docs_df)
            .filter(F.col("url") == "https://fixtures.example/docs/e2e.md")
            .orderBy("chunk_id").collect())
    assert [r.chunk_id for r in rows] == [0, 1]
    assert rows[0].text == "The DWH uses a star schema with fact and dimension tables."
    assert rows[0].element_type == "text"
    assert rows[0].headings == ["Database Architecture"]
    assert rows[1].element_type == "code"
    assert rows[1].headings == ["Database Architecture", "SQL Example"]
    assert rows[1].text == "SELECT customer_id, SUM(amount)\nFROM fact_sales\nGROUP BY customer_id;"


def test_error_isolation_fail_soft(docs_df):
    """A corrupt row errors; the batch continues (reference Q5)."""
    by_url = {r.url: r for r in extracted_table(docs_df).collect()}
    broken = by_url["https://fixtures.example/docs/broken.pdf"]
    assert broken.status == "error" and broken.n_chunks == 0
    statuses = [r.status for r in by_url.values()]
    assert set(statuses) <= {"ok", "degraded", "error"}
    assert statuses.count("ok") + statuses.count("degraded") \
        == N_DOCS - statuses.count("error")
    assert statuses.count("ok") >= N_DOCS - 6


def test_empty_and_scan_docs_degraded_paths(docs_df):
    by_url = {r.url: r for r in extracted_table(docs_df).collect()}
    assert by_url["https://fixtures.example/docs/empty.md"].status == "ok"
    assert by_url["https://fixtures.example/docs/empty.md"].n_chunks == 0
    # pure scan, no crawl text: degraded, zero chunks, never an error row
    scan = by_url["https://fixtures.example/docs/scan.pdf"]
    assert scan.status == "degraded" and scan.n_chunks == 0
    assert scan.format == "pdf" and "ocr unavailable" in scan.error
    # scan WITH crawl-supplied WET text: degraded low-confidence extraction
    wet = by_url["https://fixtures.example/docs/scanwet.pdf"]
    assert wet.status == "degraded" and wet.n_chunks >= 1
    assert "crawl-supplied text used" in wet.error
    assert "Recovered WET text" in wet.extracted_text


def test_byte_spans_verify_against_extracted_text(docs_df, spark):
    """span(start,end) are UTF-8 byte offsets: slicing extracted_text bytes
    reproduces chunk text exactly, for every chunk incl. Cyrillic docs."""
    joined = (chunks_table(docs_df)
              .join(extracted_table(docs_df).select("url", "extracted_text"), "url")
              .select("url", "chunk_id", "text", "span", "extracted_text")
              .collect())
    assert joined
    for r in joined:
        raw = r.extracted_text.encode("utf-8")
        assert raw[r.span.start:r.span.end].decode("utf-8") == r.text, r.url


def test_chunk_ids_dense_per_url(docs_df):
    bad = (chunks_table(docs_df)
           .groupBy("url")
           .agg(F.count("*").alias("n"), F.max("chunk_id").alias("mx"),
                F.min("chunk_id").alias("mn"),
                F.countDistinct("chunk_id").alias("nd"))
           .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
                   | (F.col("nd") != F.col("n")))
           .count())
    assert bad == 0


def test_token_budget_enforced(docs_df):
    over = (chunks_table(docs_df)
            .filter((F.col("token_count") > 512)
                    & (F.col("element_type") == "text")).count())
    assert over == 0


def test_deterministic_across_runs(docs_df, spark):
    pages = spark.createDataFrame(generate_pages(N_DOCS))
    again = extract_documents(pages, salt_partitions=2)  # different parallelism
    a = {(r.url, r.extracted_text) for r in
         extracted_table(docs_df).select("url", "extracted_text").collect()}
    b = {(r.url, r.extracted_text) for r in
         extracted_table(again).select("url", "extracted_text").collect()}
    assert a == b


def test_documents_registry_stub_title(docs_df):
    reg = {r.url: r for r in documents_table(extracted_table(docs_df)).collect()}
    # no heading in the WET row -> stub title = url stem (reference contract)
    assert reg["https://fixtures.example/docs/wet.txt"].title == "wet"
    assert reg["https://fixtures.example/docs/e2e.md"].title == "Database Architecture"
    assert reg["https://fixtures.example/docs/e2e.md"].n_chunks == 2
    assert reg["https://fixtures.example/docs/e2e.md"].added_at is not None


def test_degraded_rows_content_contract(spark):
    """Every degraded row's CONTENT contract (VERDICT r2 task 7), checked
    over a corpus large enough to carry many generated scan-class PDFs:
    a degraded row always explains itself (low-confidence flag in error),
    and whenever the crawl supplied WET text the degraded extraction is
    that text — chunked, non-empty — never a silently empty doc."""
    pages_pdf = generate_pages(300)
    pages = spark.createDataFrame(pages_pdf)
    ex = extracted_table(extract_documents(pages, salt_partitions=4))
    src_text = {r["url"]: r["text"] for _, r in pages_pdf.iterrows()}
    degraded = ex.filter(F.col("status") == "degraded").collect()
    assert len(degraded) >= 5  # corpus must actually exercise the tier
    with_wet = 0
    for r in degraded:
        # confidence flag: a degraded row must say WHY it is low-confidence
        assert r.error and "ocr unavailable" in r.error, r.url
        assert r.format == "pdf", r.url
        crawl_text = src_text.get(r.url)
        if crawl_text and crawl_text.strip():
            with_wet += 1
            # WET text present -> it IS the extraction, chunked, non-empty
            assert "crawl-supplied text used" in r.error, r.url
            assert r.n_chunks >= 1, r.url
            assert r.extracted_text and not r.extracted_text.isspace(), r.url
            # the degraded extraction is the crawl text (whitespace-normal)
            assert crawl_text.split() == r.extracted_text.split(), r.url
        else:
            assert "sparse parsed text only" in r.error, r.url
    assert with_wet >= 1  # the wet-backed branch was exercised
