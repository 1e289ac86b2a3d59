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


def stream_ingest_dedup(spark: SparkSession,
                        pages_dir: str,
                        out_dir: str,
                        checkpoint_dir: str,
                        max_tokens: int = CHUNK_MAX_TOKENS,
                        available_now: bool = True):
    """Incremental ingest that DEDUPS against the warehouse (the streaming
    bridge to ``dedup_exact``): each micro-batch computes the canonical
    content hash over its extracted text, keeps one doc per hash within
    the batch (lowest url wins, deterministic), anti-joins against the
    accumulated ``dedup_index`` table, and appends only fresh content.

    Exactly-once shape: outputs land in per-batch directories
    (``batch=<id>``) written with mode=overwrite, so a retried micro-batch
    overwrites its own partial output instead of duplicating it — and the
    current batch's own directory is EXCLUDED from the seen-hash read, so
    a retry does not anti-join its rows away against its failed attempt.
    On Iceberg this whole body is one ``MERGE INTO chunks ... WHEN NOT
    MATCHED BY content_hash`` per micro-batch.
    """
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from docling_rag_spark.queries.dedup import content_hash_col

    chunks_dir = os.path.join(out_dir, "chunks")
    index_dir = os.path.join(out_dir, "dedup_index")

    def process_batch(docs, batch_id: int) -> None:
        hashed = (docs.filter(F.col("status") != "error")
                  .withColumn("content_hash",
                              content_hash_col(F.col("extracted_text"))))
        w = Window.partitionBy("content_hash").orderBy("url")
        keep = (hashed.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
        prior = []
        if os.path.isdir(index_dir):
            prior = [os.path.join(index_dir, d)
                     for d in sorted(os.listdir(index_dir))
                     if d.startswith("batch=") and d != f"batch={batch_id}"]
        if prior:
            seen = (docs.sparkSession.read
                    .option("basePath", index_dir).parquet(*prior)
                    .select("content_hash"))
            keep = keep.join(seen, "content_hash", "left_anti")
        keep = keep.persist()
        try:
            (chunks_table(keep).write.mode("overwrite")
             .parquet(os.path.join(chunks_dir, f"batch={batch_id}")))
            (keep.select("content_hash", "url").write.mode("overwrite")
             .parquet(os.path.join(index_dir, f"batch={batch_id}")))
        finally:
            keep.unpersist()

    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .option("maxFilesPerTrigger", "8")
             .parquet(pages_dir))
    docs = extract_documents(pages, max_tokens=max_tokens,
                             salt_partitions=None)
    writer = (docs.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
