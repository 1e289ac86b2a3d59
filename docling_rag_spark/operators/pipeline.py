"""The fused parse+chunk Spark stage (the reference's indexing loop, §3.1).

One ``mapInPandas`` stage performs format sniff -> extract -> chunk per Arrow
batch — the Spark analog of the reference's fused per-file loop iteration
(core/indexer.py:71-74: parse then chunk in the same pass, no materialized
intermediate). Fusing avoids a shuffle between parse and chunk; the only
shuffle in the whole extraction job is the salted repartition *before* the
UDF, which balances host-skewed url distributions across executors.

Doc-level output rows carry the chunk array; ``chunks_table`` explodes it
with the built-in (JVM-side) ``posexplode``-family operator, so the Python
boundary is crossed exactly once per document batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_rag_spark.config import CHUNK_MAX_TOKENS, DEFAULT_SALT_PARTITIONS

CHUNK_STRUCT = T.StructType([
    T.StructField("chunk_id", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("context_text", T.StringType(), False),
    T.StructField("page_number", T.IntegerType(), False),
    T.StructField("element_type", T.StringType(), False),
    T.StructField("headings", T.ArrayType(T.StringType()), False),
    T.StructField("span", T.StructType([
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]), False),
    T.StructField("token_count", T.IntegerType(), False),
])

DOC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("format", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("encoding", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("extracted_text", T.StringType(), False),
    T.StructField("n_blocks", T.IntegerType(), False),
    T.StructField("chunks", T.ArrayType(CHUNK_STRUCT), False),
])


def _parse_chunk_batches(batches: Iterator[pd.DataFrame],
                         max_tokens: int) -> Iterator[pd.DataFrame]:
    """Arrow-batch worker: (url, html, text, lang) -> DOC_SCHEMA rows."""
    # imports inside the worker: the package is shipped via addPyFile
    from docling_rag_spark.operators.blocks import chunk_blocks
    from docling_rag_spark.operators.dispatch import parse_document_ex

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "url", "warc_ts", "lang", "format", "status", "encoding",
            "error", "title", "extracted_text", "n_blocks", "chunks")}
        for url, warc_ts, html, text, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"], pdf["lang"]):
            fmt, blocks, status, error, enc = parse_document_ex(
                html if isinstance(html, (bytes, bytearray)) else None,
                text if isinstance(text, str) else None,
            )
            extracted, chunks = chunk_blocks(blocks, max_tokens=max_tokens)
            title = next((b.text for b in blocks if b.kind == "heading"), None)
            out["url"].append(url)
            out["warc_ts"].append(warc_ts)
            out["lang"].append(lang)
            out["format"].append(fmt)
            out["status"].append(status)
            out["encoding"].append(enc)
            out["error"].append(error)
            out["title"].append(title)
            out["extracted_text"].append(extracted)
            out["n_blocks"].append(len(blocks))
            out["chunks"].append([
                {
                    "chunk_id": c.chunk_id,
                    "text": c.text,
                    "context_text": c.context_text,
                    "page_number": c.page_number,
                    "element_type": c.element_type,
                    "headings": c.headings,
                    "span": {"start": c.span[0], "end": c.span[1]},
                    "token_count": c.token_count,
                }
                for c in chunks
            ])
        yield pd.DataFrame(out)


def extract_documents(pages: DataFrame,
                      max_tokens: int = CHUNK_MAX_TOKENS,
                      salt_partitions: int | None = DEFAULT_SALT_PARTITIONS,
                      ) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> doc-level DOC_SCHEMA rows.

    ``salt_partitions`` repartitions on a salted url hash before the UDF so
    that host-heavy url distributions (many pages of one host in one input
    file) spread evenly across executors — the skew mitigation the reference
    lacks (SURVEY.md §4 "Skew handling"). Column pruning: only the four
    needed columns cross the Arrow boundary.
    """
    cols = pages.select("url", "warc_ts", "html", "text", "lang")
    if salt_partitions:
        cols = cols.repartition(salt_partitions, F.xxhash64("url", F.lit(0x5A17)))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _parse_chunk_batches(batches, max_tokens)

    return cols.mapInPandas(fn, schema=DOC_SCHEMA)


def chunks_table(docs: DataFrame,
                 extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode doc rows into the chunk-row contract (FIXTURES.md §2).
    ``extra_cols`` pass staged columns (e.g. the bucket partition key)
    through instead of recomputing them per exploded row."""
    c = F.explode("chunks").alias("c")
    return (docs
            .select("url", c, *extra_cols)
            .select(
                "url",
                F.col("c.chunk_id").alias("chunk_id"),
                F.col("c.text").alias("text"),
                F.col("c.context_text").alias("context_text"),
                F.col("c.page_number").alias("page_number"),
                F.col("c.element_type").alias("element_type"),
                F.col("c.headings").alias("headings"),
                F.col("c.span").alias("span"),
                F.col("c.token_count").alias("token_count"),
                *extra_cols,
            ))


def extracted_table(docs: DataFrame,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Doc-level output: byte-identity comparison target + registry fields.

    Uses a precomputed ``n_chunks`` column when present (staged doc tables
    carry it so this derivation never scans the wide chunks column)."""
    n_chunks = (F.col("n_chunks") if "n_chunks" in docs.columns
                else F.size("chunks"))
    return docs.select("url", "format", "status", "encoding", "error",
                       "title", "lang", "extracted_text", "n_blocks",
                       n_chunks.alias("n_chunks"), "warc_ts", *extra_cols)


def documents_table(extracted: DataFrame) -> DataFrame:
    """Registry rows from the extracted table; stub title = url stem when no
    heading was found (reference stub-title contract, core/indexer.py:102)."""
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("url"), "/"), -1), r"\.[^.]*$", "")
    return extracted.select(
        "url",
        F.coalesce("title", stem).alias("title"),
        "lang",
        "n_chunks",
        F.col("warc_ts").alias("added_at"),
    )
