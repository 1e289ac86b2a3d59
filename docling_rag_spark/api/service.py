"""Serving-tier service functions over the extraction warehouse.

The reference exposes its store through FastAPI endpoints
(api/app.py:198-333: GET /search, GET /documents, DELETE /documents/{id},
POST /documents -> async job, GET /jobs/{id}). This module provides the
same operations as plain functions over (SparkSession, warehouse dir) so
the stdlib HTTP server (api/server.py) — or any other frontend — stays a
thin JSON shim. No web framework ships in this environment; the HTTP tier
is deliberately dependency-free.

Driver-side role: these run interactive, seconds-scale queries (top-k
search is a TakeOrderedAndProject over the bucketed embeddings table;
status is a lineage-table scan). The heavy batch work stays in plans/job.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_rag_spark.io import warehouse as wh


def search_warehouse(spark: SparkSession, warehouse: str, query: str,
                     top_k: int = 5, url_prefix: str | None = None,
                     log: bool = True, mode: str = "auto",
                     include_text: bool = False) -> list[dict]:
    """§3.2 search lifecycle: embed query -> top-k -> decorate (J1) ->
    heading path (F3) + 300-char preview (F4) -> search log (S8).

    ``mode``: 'exact' scans the full embeddings table
    (TakeOrderedAndProject); 'ann' requires the materialized
    <warehouse>/ann/lsh index (run_embed.py --ann-index) and scans only
    the 9 multiprobe bucket partitions — the reference's HNSW
    approximate-speed trade-off (storage/db_schema.py:36-37), here as
    Iceberg-style partition pruning; 'auto' uses the index when present."""
    from docling_rag_spark.operators.embed import embed_chunks, embed_texts
    from docling_rag_spark.operators.search import log_search, search_chunks
    from docling_rag_spark.plans import ann_index as AI

    if mode not in ("auto", "exact", "ann"):
        raise ValueError(f"invalid mode {mode!r}; use auto|exact|ann")
    chunks = wh.read_table(spark, warehouse, "chunks")
    emb_path = os.path.join(warehouse, "embeddings")
    ann_lsh = os.path.join(warehouse, "ann", "lsh")
    use_ann = (mode == "ann" or (mode == "auto" and os.path.isdir(ann_lsh)))
    if use_ann:
        if not os.path.isdir(ann_lsh):
            raise FileNotFoundError(
                f"mode='ann' but no index at {ann_lsh}; run "
                "scripts/run_embed.py --ann-index first")
        from docling_rag_spark.streaming.embed_index import (
            ann_probe_candidates)
        q_vec = [float(v) for v in embed_texts([query])[0]]
        probes = AI.multiprobe_buckets(AI.py_bucket(q_vec))
        # base index + streaming ann_delta batches (docs ingested via
        # stream_embed_index must be searchable before compaction)
        emb = (ann_probe_candidates(spark, warehouse, probes)
               .select("url", "chunk_id", "embedding"))
    elif os.path.isdir(emb_path):
        emb = spark.read.parquet(emb_path)
    else:
        emb = embed_chunks(chunks)
    allowed = None
    if url_prefix is not None:
        allowed = (chunks.select("url").distinct()
                   .filter(F.col("url").startswith(url_prefix)))
    hits = search_chunks(spark, emb, query, top_k=top_k,
                         allowed_urls=allowed,
                         store_is_empty=chunks.isEmpty())
    # decorate: hits is the small side (<= top_k rows), the registry and
    # chunk tables are corpus-sized — broadcasting THEM inverts the join
    # at scale. Prune each dim to the hit keys first (broadcast hash
    # semi-join: one map-only scan, no shuffle), then the <= k surviving
    # dim rows are safe to broadcast into the left joins. hits feeds
    # three consumers, so pin it once (k rows) instead of re-running the
    # search per branch.
    from pyspark import StorageLevel
    hits = hits.persist(StorageLevel.MEMORY_AND_DISK)
    hit_keys = hits.select("url", "chunk_id")
    docs = (wh.read_table(spark, warehouse, "extracted")
            .select("url", "title")
            .join(F.broadcast(hit_keys.select("url").distinct()),
                  "url", "left_semi"))
    meta = (chunks.select("url", "chunk_id", "text", "headings",
                          "page_number", "element_type")
            .join(F.broadcast(hit_keys), ["url", "chunk_id"], "left_semi"))
    extra = [F.col("text"), F.col("headings")] if include_text else []
    rows = (hits.join(F.broadcast(docs), "url", "left")
            .join(F.broadcast(meta), ["url", "chunk_id"], "left")
            .select("url", "chunk_id", F.round("score", 4).alias("score"),
                    "title",
                    F.array_join("headings", " > ").alias("heading_path"),
                    F.translate(F.substring("text", 1, 300), "\n", " ")
                     .alias("preview"),
                    "page_number", "element_type", *extra)
            .orderBy(F.desc("score"), "url", "chunk_id")
            .collect())
    hits.unpersist()
    if log:
        log_search(warehouse, query, rows[0]["score"] if rows else None)
    return [r.asDict() for r in rows]


def chat_payload(spark: SparkSession, warehouse: str, message: str,
                 top_k: int = 3) -> dict:
    """Deterministic /chat contract (reference api/app.py:145-176 +
    tests/api/test_chat_endpoint.py, minus the model call — same boundary
    as the X8 LLM stand-in): run the agent's search tool, compose the
    cited context block the LLM would receive, and return it as the
    answer alongside the reference's sources panel — file basename, page,
    headings, score, full chunk text, element_type per hit. The search is
    logged exactly like the reference's agent tool call
    (test_chat_logs_agent_search)."""
    rows = search_warehouse(spark, warehouse, message, top_k=top_k,
                            include_text=True)
    sources = [{
        "file": str(r["url"]).rsplit("/", 1)[-1],
        "page": r["page_number"],
        "headings": list(r["headings"] or []),
        "score": float(r["score"]),
        "text": r["text"],
        "element_type": r["element_type"],
    } for r in rows]
    from docling_rag_spark.operators.search import format_search_results
    context = format_search_results([
        ({"source_file": r["url"], "page_number": r["page_number"],
          "headings": list(r["headings"] or []), "text": r["text"]},
         float(r["score"]))
        for r in rows])
    return {"answer": context, "sources": sources}


def status_payload(spark: SparkSession, warehouse: str) -> dict:
    """Job-status rollup from the lineage table (the reference's GET
    /jobs view, backed here by per-bucket lineage rows)."""
    df = wh.lineage_df(spark, warehouse)
    rows = (df.groupBy("input_snapshot_id")
            .agg(F.countDistinct("bucket").alias("buckets_done"),
                 F.sum("doc_count").alias("doc_count"),
                 F.sum("chunk_count").alias("chunk_count"),
                 F.sum("failure_count").alias("failure_count"),
                 F.max("finished_at").alias("last_commit_at"))
            .orderBy("input_snapshot_id").collect())
    return {"snapshots": [r.asDict() for r in rows]}


def documents_payload(spark: SparkSession, warehouse: str,
                      limit: int = 100, url_prefix: str | None = None
                      ) -> list[dict]:
    """Catalog listing (reference GET /documents)."""
    ex = wh.read_table(spark, warehouse, "extracted")
    if url_prefix is not None:
        ex = ex.filter(F.col("url").startswith(url_prefix))
    rows = (ex.select("url", "title", "format", "status", "lang",
                      "n_chunks")
            .orderBy("url").limit(limit).collect())
    return [r.asDict() for r in rows]


def delete_documents(spark: SparkSession, warehouse: str,
                     urls: list[str]) -> dict:
    """FK-cascade delete across warehouse tables (reference DELETE
    /documents/{id}; bucket-pruned rewrite, plans/job.py)."""
    from docling_rag_spark.plans.job import delete_urls
    return delete_urls(spark, warehouse, urls)


class JobRunner:
    """Async extraction jobs (reference POST /documents -> jobs queue).

    One job at a time (the lock is the sandbox stand-in for the
    reference's single-worker queue); job state lives in memory here and
    in the lineage table durably — a restarted server resumes nothing,
    but rerunning the same snapshot only processes uncommitted buckets
    (J3 anti-join), which IS the durable queue semantics."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self._spark = spark
        self._warehouse = warehouse
        self._lock = threading.Lock()       # job-table mutations
        self._run_lock = threading.Lock()   # serializes job execution
        self._jobs: dict[str, dict] = {}
        self._seq = 0

    def submit(self, pages_path: str, snapshot_id: str = "snap-0",
               num_buckets: int | None = None) -> str:
        with self._lock:
            self._seq += 1
            job_id = f"job-{self._seq}"
            self._jobs[job_id] = {"job_id": job_id, "status": "queued",
                                  "snapshot_id": snapshot_id,
                                  "submitted_at": time.time()}

        def run():
            with self._run_lock:
                self._run(job_id, pages_path, snapshot_id, num_buckets)

        threading.Thread(target=run, daemon=True).start()
        return job_id

    def _run(self, job_id, pages_path, snapshot_id, num_buckets):
        from docling_rag_spark.plans.job import run_extraction
        self._update(job_id, status="running")
        try:
            rep = run_extraction(self._spark, pages_path, self._warehouse,
                                 snapshot_id=snapshot_id,
                                 num_buckets=num_buckets)
            self._update(job_id, status="done", doc_count=rep.doc_count,
                         chunk_count=rep.chunk_count,
                         failure_count=rep.failure_count,
                         buckets_skipped=rep.buckets_skipped)
        except Exception as exc:  # job-level fail-soft: surfaced in state
            self._update(job_id, status="error", error=str(exc))

    def _update(self, job_id: str, **kw) -> None:
        with self._lock:
            self._jobs[job_id] = {**self._jobs[job_id], **kw}

    def delete(self, urls: list[str]) -> dict:
        """FK-cascade delete, serialized against extraction jobs (a delete
        racing a running job would rewrite buckets the job is about to
        commit over — last-write-wins either way; the lock makes the
        ordering explicit instead of torn)."""
        with self._run_lock:
            return delete_documents(self._spark, self._warehouse, urls)

    def job(self, job_id: str) -> dict | None:
        with self._lock:
            j = self._jobs.get(job_id)
            return dict(j) if j is not None else None

    def jobs(self) -> list[dict]:
        with self._lock:
            snap = [dict(j) for j in self._jobs.values()]
        return sorted(snap, key=lambda j: j["submitted_at"])
