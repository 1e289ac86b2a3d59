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


def embed_chunks_q(spark, sf_dir):
    """X7: deterministic hashed-random-projection embeddings over chunks
    (pandas UDF; not SQL-expressible → rows-only check)."""
    from docling_rag_spark.operators.embed import embed_chunks
    return (embed_chunks(extract_chunks(spark, sf_dir)
                         .withColumnRenamed("text", "context_text"))
            .select("url", "chunk_id",
                    F.size("embedding").cast("int").alias("dim")))


def search_topk_q(spark, sf_dir):
    """O1 end-to-end: extract → embed → exact cosine top-k for a fixed
    query (the reference §3.2 lifecycle; rows-only check)."""
    from docling_rag_spark.operators.embed import embed_chunks
    from docling_rag_spark.operators.search import search_chunks
    emb = embed_chunks(extract_chunks(spark, sf_dir)
                       .withColumnRenamed("text", "context_text"))
    # emptiness verdict from the static source table (P5 guard) — probing
    # the derived embed pipeline would execute a slice of it twice
    return search_chunks(spark, emb, "query engine scan filter join",
                         top_k=10,
                         store_is_empty=_t(spark, sf_dir,
                                           "documents").isEmpty())


def media_describe_q(spark, sf_dir):
    """Multimodal plumbing over synthesized binary payloads keyed by doc_id
    (deterministic fake containers; rows-only check)."""
    import pandas as pd

    from docling_rag_spark.operators.multimodal import (
        build_fake_audio, build_fake_image, build_fake_video, describe_media)

    def make_payloads(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                kind = did % 3
                if kind == 0:
                    payloads.append(build_fake_image(16, 16, seed=int(did)))
                elif kind == 1:
                    payloads.append(build_fake_video(12, seed=int(did)))
                else:
                    payloads.append(build_fake_audio(8000, 4000,
                                                     seed=int(did)))
            yield pd.DataFrame({
                "url": ["media://" + str(d) for d in pdf["doc_id"]],
                "payload": payloads})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(make_payloads,
                             schema="url string, payload binary")
    return describe_media(media).select(
        "url", "media_type", "status",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.size("feature").cast("int").alias("feat_dim"))


QUERIES = {
    "extract_chunks": (extract_chunks, None),
    "extract_docs": (extract_docs, None),
    "binary_meta": (binary_meta, BINARY_META_SQL),
    "embed_chunks": (embed_chunks_q, None),
    "search_topk": (search_topk_q, None),
    "media_describe": (media_describe_q, None),
}
