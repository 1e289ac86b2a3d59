"""Incremental ingest via Structured Streaming (the queue-replacement tier).

The reference ingests asynchronously through a postgres jobs queue + worker
poll loop (worker/runner.py:97-119). The batch job replaces that with
snapshot-scoped runs + lineage resume (plans/job.py); this module is the
*continuous* variant: a file-source stream over the pages directory runs
the SAME fused parse+chunk stage per micro-batch and appends to the chunks
table with exactly-once bookkeeping from the stream checkpoint (the file
source tracks processed files — the streaming analog of the lineage
anti-join, J3).

``trigger(availableNow=True)`` drains everything currently in the directory
and stops — an incremental batch run; leaving the default trigger tails the
directory forever. No watermarks/stateful ops are needed: extraction is
row-local (the reference has no streaming semantics to preserve,
SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from docling_rag_spark.config import CHUNK_MAX_TOKENS
from docling_rag_spark.operators.pipeline import chunks_table, extract_documents

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def stream_extract_chunks(spark: SparkSession,
                          pages_dir: str,
                          out_dir: str,
                          checkpoint_dir: str,
                          max_tokens: int = CHUNK_MAX_TOKENS,
                          available_now: bool = True):
    """Start the incremental extraction stream; returns the StreamingQuery.

    Callers wanting a one-shot incremental run do
    ``q = stream_extract_chunks(...); q.awaitTermination()`` — each new
    parquet file dropped into ``pages_dir`` since the last run is parsed
    exactly once.
    """
    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .option("maxFilesPerTrigger", "8")
             .parquet(pages_dir))
    # salt_partitions=None: a micro-batch is already file-granular; the
    # stateless shuffle would only add latency here
    docs = extract_documents(pages, max_tokens=max_tokens,
                             salt_partitions=None)
    chunks = chunks_table(docs)
    writer = (chunks.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
