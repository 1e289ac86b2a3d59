"""Extraction-pipeline queries over the driver tables.

The driver tables carry no html column, so the extraction queries adapt
``documents.text`` into the pages contract (url from doc_id, markdown body)
and run the real fused parse+chunk stage (operators/pipeline.py). These are
the non-SQL-expressible entries — the chunker is a stateful pandas stage —
so they ship without oracle SQL (driver records a rows-only check); their
correctness gate is the golden-fixture pytest suite instead.

``binary_meta`` shows the multimodal plumbing shape (opaque binary payload →
typed metadata via JVM-side functions) and does have an oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _as_pages(docs):
    """documents(doc_id, text, lang, …) → pages(url, warc_ts, html, text, lang)."""
    return docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("source"),
                 F.lit("/"), F.col("doc_id").cast("string"),
                 F.lit(".md")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(F.concat(F.lit("# Document "),
                          F.col("doc_id").cast("string"), F.lit("\n\n"),
                          F.col("text")), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        "lang")


def extract_chunks(spark, sf_dir):
    from docling_rag_spark.operators.pipeline import (
        chunks_table, extract_documents)
    pages = _as_pages(_t(spark, sf_dir, "documents"))
    docs = extract_documents(pages, salt_partitions=8)
    return (chunks_table(docs)
            .select("url", F.col("chunk_id").cast("int").alias("chunk_id"),
                    "text", "element_type",
                    F.col("token_count").cast("int").alias("token_count")))


def extract_docs(spark, sf_dir):
    from docling_rag_spark.operators.pipeline import (
        extract_documents, extracted_table)
    pages = _as_pages(_t(spark, sf_dir, "documents"))
    docs = extract_documents(pages, salt_partitions=8)
    return (extracted_table(docs)
            .select("url", "format", "status", "title",
                    F.col("n_blocks").cast("int").alias("n_blocks"),
                    F.col("n_chunks").cast("int").alias("n_chunks"),
                    F.length("extracted_text").cast("bigint")
                     .alias("n_chars_extracted")))


# --- multimodal plumbing: opaque binary → typed metadata ---------------------

def binary_meta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.substring(F.base64(payload), 1, 16).alias("preview_b64"))


BINARY_META_SQL = """
SELECT doc_id::BIGINT AS doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS payload_md5,
       substr(to_base64(encode(text)), 1, 16) AS preview_b64
FROM documents
"""


QUERIES = {
    "extract_chunks": (extract_chunks, None),
    "extract_docs": (extract_docs, None),
    "binary_meta": (binary_meta, BINARY_META_SQL),
}
