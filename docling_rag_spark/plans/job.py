"""The batch extraction job: pages -> chunks/extracted tables + lineage.

Replaces the reference's sequential indexing loop + postgres job queue
(core/indexer.py:41-117, worker/runner.py:97-119) with:

  scan pages -> assign bucket = pmod(xxhash64(url), N)
             -> anti-join buckets against committed lineage (resume, J3)
             -> per bucket-batch: salted repartition -> fused parse+chunk
                mapInPandas -> stage parquet partitioned by bucket
             -> atomic bucket-directory commit + lineage append

Unit of checkpointing = url-hash bucket (not file): a rerun after a crash
reprocesses only buckets without a committed lineage row for the input
snapshot id. Row-level failures never abort the job — they surface as
``status='error'`` rows counted in ``failure_count`` (the reference's
fail-soft tier, core/indexer.py:114-116); infrastructure failures abort the
Spark task and are retried by the scheduler (fail-hard tier).

At 100 TB: the input would be an Iceberg table bucketed by url so each batch
prunes to its buckets at scan time; here the pages parquet is re-scanned per
batch (cheap relative to parse) with the bucket filter applied before the
expensive UDF stage.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_rag_spark.config import (
    CHUNK_MAX_TOKENS,
    DEFAULT_NUM_BUCKETS,
    DEFAULT_SALT_PARTITIONS,
)
from docling_rag_spark.io import snapshots as snap
from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.operators.pipeline import (
    chunks_table,
    extract_documents,
    extracted_table,
)


@dataclass
class ExtractionReport:
    """Job-level counters (the reference's IndexReport, core/indexer.py:32-38)."""
    snapshot_id: str
    buckets_total: int
    buckets_skipped: int
    buckets_done: int
    doc_count: int = 0
    chunk_count: int = 0
    failure_count: int = 0
    docs_unchanged: int = 0
    batches: list[list[int]] = field(default_factory=list)
    # per-phase wall seconds, populated when SPARK_GRAFT_DEBUG=1 (summed
    # across batches): where a benchmark pair should look for Amdahl tails
    phase_sec: dict = field(default_factory=dict)


def bucket_of(url_col, num_buckets: int):
    return F.pmod(F.xxhash64(url_col), F.lit(num_buckets)).cast("int")


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _scan_split_bytes(spark, pages_path: str) -> str | None:
    """Adaptive scan-split size for this job's input.

    Spark packs files into ~``spark.sql.files.maxPartitionBytes`` splits at
    plan time; with the session default (32 MB) a bench-scale input (e.g.
    48 MB of 100k pages) scans on TWO map tasks no matter how many cores the
    cluster has — the scan, its shuffle write, and the staged read-back all
    inherit the cap, which measured as the scaling-efficiency killer between
    N and 4N executors (BASELINE.md). Target ~3 splits per core, clamped to
    [1 MB, 32 MB]: at petabyte scale the clamp returns the session default
    (splits stay row-group-sized), at bench scale every core gets work.
    Returns the previous setting (to restore) or None on opaque inputs.
    """
    total = _input_bytes(pages_path)
    if not total:
        return None
    cores = spark.sparkContext.defaultParallelism
    tgt = max(1 << 20, min(32 << 20, total // (3 * cores) or 1))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    return prev


def _staged_docs_schema():
    """DOC_SCHEMA + the staging columns (bucket is the partition key)."""
    from pyspark.sql import types as T

    from docling_rag_spark.operators.pipeline import DOC_SCHEMA
    # copy the field list: StructType.add mutates in place, and sharing
    # DOC_SCHEMA's list would silently widen the UDF's output contract
    return (T.StructType(list(DOC_SCHEMA.fields))
            .add("n_chunks", T.IntegerType())
            .add("is_error", T.IntegerType())
            .add("bucket", T.IntegerType()))


def run_extraction(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    snapshot_id: str = "snap-0",
    num_buckets: int | None = None,
    buckets_per_batch: int | None = None,
    max_tokens: int = CHUNK_MAX_TOKENS,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    mode: str = "overwrite",
    retain_snapshots: bool = False,
    _fail_after_batches: int | None = None,
) -> ExtractionReport:
    """Run (or resume) the extraction job. Idempotent per snapshot_id.

    ``mode="overwrite"`` (default) replaces each bucket with this
    snapshot's extraction — the full-reindex semantics of the reference's
    indexing loop (core/indexer.py:66-116).

    ``mode="merge"`` is the incremental-crawl path (Iceberg
    ``MERGE INTO`` on the natural key, the upsert shape of the
    reference's registry MERGE, db_registry.py:31-45): only pages that
    are NEW or STRICTLY NEWER (``warc_ts``) than their committed
    extraction are parsed; each touched bucket is rewritten as
    (existing rows minus re-extracted urls) ∪ (new rows) — copy-on-write
    at bucket granularity, so rewrite amplification is bounded by
    ``buckets_per_batch`` and untouched buckets are never opened. A
    re-crawl that fails to parse still replaces the old row (latest
    attempt is truth; the error tier is queryable). Change detection
    runs on narrow ``(url, warc_ts)`` column scans — page html bytes
    are never shuffled for unchanged urls. At Iceberg scale both sides
    of the url join are bucketed by url-hash, making it a
    storage-partitioned join with no shuffle at all.

    ``retain_snapshots=True`` parks every displaced bucket directory under
    ``<out>/_snapshots`` and appends a commit-log row per bucket
    (io/snapshots.py) — enabling ``read_table_as_of`` time travel,
    ``rollback_table``, and ``expire_snapshots``, the Iceberg snapshot
    facilities the default destructive overwrite forgoes.
    """
    if mode not in ("overwrite", "merge"):
        raise ValueError(f"mode must be 'overwrite' or 'merge', got {mode!r}")
    # num_buckets is the warehouse's partition SPEC, not a per-run knob:
    # omitted -> the pinned spec (DEFAULT_NUM_BUCKETS on a fresh
    # warehouse); explicit -> validated against it (BucketSpecMismatch
    # instead of silently scattering urls across a foreign modulus)
    num_buckets = wh.resolve_num_buckets(out_dir, num_buckets,
                                         DEFAULT_NUM_BUCKETS)
    prev_split = _scan_split_bytes(spark, pages_path)
    try:
        return _run_extraction_inner(
            spark, pages_path, out_dir, snapshot_id, num_buckets,
            buckets_per_batch, max_tokens, salt_partitions, mode,
            retain_snapshots, _fail_after_batches)
    finally:
        if prev_split is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)


def _run_extraction_inner(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    snapshot_id: str,
    num_buckets: int,
    buckets_per_batch: int | None,
    max_tokens: int,
    salt_partitions: int,
    mode: str,
    retain_snapshots: bool,
    _fail_after_batches: int | None,
) -> ExtractionReport:
    pages = spark.read.parquet(pages_path)

    # conflict base: the instant this job read its base state. Using the
    # per-batch start instead would miss a newer snapshot that committed
    # while an EARLIER batch of this run was computing.
    base_ts = wh.now()
    done = wh.completed_buckets(out_dir, snapshot_id)
    todo = [b for b in range(num_buckets) if b not in done]
    report = ExtractionReport(
        snapshot_id=snapshot_id,
        buckets_total=num_buckets,
        buckets_skipped=len(done),
        buckets_done=0,
    )
    if not todo:
        return report

    step = buckets_per_batch or len(todo)
    batches = [todo[i:i + step] for i in range(0, len(todo), step)]
    staging_root = os.path.join(out_dir, "_staging")

    import sys
    import time as _time
    debug = os.environ.get("SPARK_GRAFT_DEBUG") == "1"

    # unique per-run suffix: two concurrent runs of the SAME snapshot are
    # supported (idempotent duplicates), so a deterministic staging path
    # would let one run rmtree the other's half-written staged tables and
    # then commit partial buckets with lineage claiming them done
    import uuid
    run_id = uuid.uuid4().hex[:12]

    for batch_idx, batch in enumerate(batches):
        started = wh.now()
        _t0 = _time.time()
        staging = os.path.join(staging_root,
                               f"{snapshot_id}-{batch_idx}-{run_id}")
        shutil.rmtree(staging, ignore_errors=True)

        try:
            sub = pages.withColumn("bucket", bucket_of(F.col("url"), num_buckets))
            if len(batch) < num_buckets:
                sub = sub.filter(F.col("bucket").isin(batch))

            if mode == "merge":
                sub, n_unchanged = _changed_pages(spark, sub, out_dir, batch)
                report.docs_unchanged += n_unchanged

            # Bucket-aligned repartition: the url-hash bucket IS the salt (urls
            # hash uniformly, so host-heavy crawls still spread). Keeping whole
            # buckets per task means the dynamic-partition write below emits one
            # file per bucket with a trivial sort, instead of num_tasks ×
            # num_buckets fragments — the difference between a write that scales
            # with cores and one that collapses under small-file overhead.
            # When buckets are too coarse for the requested parallelism, add a
            # salted secondary key: buckets split across tasks (a few files per
            # bucket) rather than capping parallelism at num_buckets.
            # bucket_route (not repartitionByRange, not hash-repartition):
            # murmur3-preimage routing puts exactly one whole bucket in each
            # shuffle partition with ZERO extra jobs — repartitionByRange
            # pays a per-batch sampling scan of the input (pure Amdahl tail
            # in N-vs-4N scaling; measured 1.1-2.0 s/run via event logs),
            # and hash partitioning on a low-cardinality key leaves ~1/e of
            # slots empty while stacking 3-4 buckets on others (stragglers
            # in the expensive parse stage). See functions/partitioning.py.
            if len(batch) >= 2 * salt_partitions:
                from docling_rag_spark.functions.partitioning import bucket_route
                sub = sub.repartition(
                    len(batch),
                    bucket_route(F.col("bucket"), batch, num_buckets))
            else:
                sub = sub.repartition(max(len(batch), salt_partitions),
                                      F.col("bucket"),
                                      F.xxhash64("url", F.lit(0x5A17)))

            # One UDF pass, materialized to a staged doc-level table; chunks /
            # extracted / stats derive from it via column-pruned JVM-only scans.
            # Staging-to-parquet beats .persist() here: executor-memory caching
            # of the wide doc rows (text + chunk structs) thrashes GC as
            # parallelism grows, while the staged table reads back pruned (the
            # extracted derivation never touches the chunks column at all).
            (extract_documents(sub, max_tokens=max_tokens, salt_partitions=None)
             .withColumn("bucket", bucket_of(F.col("url"), num_buckets))
             .withColumn("n_chunks", F.size("chunks"))
             .withColumn("is_error", (F.col("status") == "error").cast("int"))
             .write.partitionBy("bucket").mode("overwrite")
             .parquet(os.path.join(staging, "docs")))

            _t1 = _time.time()
            # schema-specified read: an all-empty batch (no urls hash into
            # these buckets) writes only _SUCCESS, and an inferred read would
            # raise UNABLE_TO_INFER_SCHEMA — with the explicit schema the read
            # is simply empty and the derivations below no-op (no driver-side
            # filesystem probing; the same read works against object storage)
            docs_dir = os.path.join(staging, "docs")
            docs = spark.read.schema(_staged_docs_schema()).parquet(docs_dir)

            # Derivation-scan split sizing: the session's maxPartitionBytes
            # was adapted to the PAGES input (3 splits/core of html bytes,
            # _scan_split_bytes) — applied to the larger staged docs table it
            # yields ~10 splits/core, and the ~0.2 s fixed cost per scan task
            # (deser + footer + codec init) then grows with the core count:
            # event logs measured 84-task derivation stages at 8 cores doing
            # +26 task-seconds over the same stages at 19 tasks on 2 cores —
            # the second-largest Amdahl term in N-vs-4N scaling. Resize to
            # ~2.5 splits/core of the STAGED bytes for the derivation reads,
            # restored after the batch commits.
            _cores = spark.sparkContext.defaultParallelism
            _staged_bytes = _input_bytes(docs_dir)
            _prev_mpb = None
            if _staged_bytes:
                _tgt = max(1 << 20, min(128 << 20,
                                        _staged_bytes * 2 // (5 * _cores) or 1))
                _prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes",
                                           None)
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(_tgt))

            # The three derivations are independent reads of the staged docs
            # table; run them as CONCURRENT Spark jobs (threads share the
            # session; the scheduler interleaves their stages). Sequential
            # execution leaves cores idle during each job's fixed
            # scheduling/commit overhead — measurably worse scaling at high
            # parallelism for a fixed fraction of the batch wall-clock.
            from concurrent.futures import ThreadPoolExecutor

            def _stats():
                # narrow-column scan over (bucket, n_chunks, is_error)
                return {
                    row["bucket"]: row
                    for row in docs.groupBy("bucket").agg(
                        F.count("*").alias("docs"),
                        F.sum("n_chunks").alias("chunks"),
                        F.sum("is_error").alias("failures"),
                    ).collect()
                }

            # merge mode: stats go FIRST (a cheap 3-column scan) so the
            # merged writes below open ONLY buckets that received new
            # docs — a bucket of this batch with zero changed pages keeps
            # its committed dir untouched (no staged dir -> commit skips)
            old_chunks = old_extracted = new_urls = None
            if mode == "merge":
                stats = _stats()
                active = sorted(stats)
                new_urls = docs.select("url")
                old_chunks = _committed_bucket_rows(
                    spark, os.path.join(out_dir, "chunks"), active)
                old_extracted = _committed_bucket_rows(
                    spark, os.path.join(out_dir, "extracted"), active)

            # pass the staged bucket column through instead of re-hashing
            # every output row (an xxhash64+pmod per chunk after explode,
            # for a value the staged partitioning already fixed)
            staged_schema = {}

            def _write_chunks():
                new = chunks_table(docs, extra_cols=("bucket",))
                if old_chunks is not None:
                    # copy-on-write MERGE: existing rows of re-extracted
                    # urls are replaced; everything else carries over.
                    # allowMissingColumns: carried-over rows written by an
                    # older code version read null for any column this
                    # version added (Iceberg add-column semantics) instead
                    # of failing the whole run on the first upgraded crawl
                    new = (old_chunks.join(new_urls, "url", "left_anti")
                           .unionByName(new, allowMissingColumns=True))
                staged_schema["chunks"] = new.schema
                # url-sorted within each bucket: parquet row-group min/max
                # stats on url become tight and disjoint, so point lookups
                # and delete rewrites prune row groups instead of scanning
                # the whole bucket (the sort SATISFIES the partitionBy
                # write's required child ordering — it replaces the
                # bucket-only sort Spark would insert, not adds to it)
                (new.sortWithinPartitions("bucket", "url", "chunk_id")
                 .write.partitionBy("bucket").mode("overwrite")
                 .parquet(os.path.join(staging, "chunks")))

            def _write_extracted():
                new = extracted_table(docs, extra_cols=("bucket",))
                if old_extracted is not None:
                    new = (old_extracted.join(new_urls, "url", "left_anti")
                           .unionByName(new, allowMissingColumns=True))
                staged_schema["extracted"] = new.schema
                (new.sortWithinPartitions("bucket", "url")
                 .write.partitionBy("bucket").mode("overwrite")
                 .parquet(os.path.join(staging, "extracted")))

            try:
                with ThreadPoolExecutor(max_workers=3) as pool:
                    f_chunks = pool.submit(_write_chunks)
                    f_extracted = pool.submit(_write_extracted)
                    f_stats = (pool.submit(_stats)
                               if mode != "merge" else None)
                    f_chunks.result()
                    _t2 = _time.time()
                    f_extracted.result()
                    _t3 = _time.time()
                    if f_stats is not None:
                        stats = f_stats.result()
            finally:
                # next batch's PAGES scan must get its own split size back
                # (and a failed derivation must not leak the staged sizing
                # into the caller's session)
                if _prev_mpb is not None:
                    spark.conf.set("spark.sql.files.maxPartitionBytes",
                                   _prev_mpb)

            _t4 = _time.time()
            # Check-then-commit under the warehouse commit lock (the Iceberg
            # optimistic-concurrency validation): if a NEWER snapshot committed
            # any of these buckets while this batch was computing, completing
            # the commit would silently roll them back — fail instead; a rerun
            # rebases on current lineage (same-snapshot concurrent commits are
            # idempotent duplicates and pass through).
            with wh.commit_lock(out_dir):
                conflicts = wh.conflicting_buckets(out_dir, snapshot_id, batch,
                                                   base_ts)
                if conflicts:
                    raise wh.CommitConflict(conflicts, snapshot_id)
                # Retention via the shared helper: retains when the flag
                # asks for it (force) OR the warehouse already has retained
                # history — a later run without the flag must not
                # destructively rewrite buckets with no snapshot-log row,
                # which would silently corrupt every earlier as-of read.
                commit_id = f"{snapshot_id}-b{batch_idx}-{run_id}"
                finished = wh.now()
                wh.pin_num_buckets(out_dir, num_buckets)
                for tbl in ("chunks", "extracted"):
                    # evolve the pinned table schema BEFORE the renames: a
                    # reader must never see files the pinned schema cannot
                    # describe (rejects type conflicts here, at commit,
                    # not in some later reader's plan)
                    wh.pin_table_schema(out_dir, tbl, staged_schema[tbl])
                    snap.commit_buckets_retained(
                        out_dir, os.path.join(staging, tbl), tbl, batch,
                        snapshot_id, finished, force=retain_snapshots,
                        commit_id=commit_id)
                lineage_rows = []
                for b in batch:
                    s = stats.get(b)
                    lineage_rows.append({
                        "input_snapshot_id": snapshot_id,
                        "bucket": b,
                        "doc_count": int(s["docs"]) if s else 0,
                        "chunk_count": int(s["chunks"] or 0) if s else 0,
                        "failure_count": int(s["failures"]) if s else 0,
                        "started_at": started,
                        "finished_at": finished,
                    })
                wh.append_lineage(out_dir, snapshot_id, lineage_rows)
            if debug:
                _t5 = _time.time()
                for k, v in (("udf_stage", _t1 - _t0), ("chunks", _t2 - _t1),
                             ("extracted", _t3 - _t2), ("stats", _t4 - _t3),
                             ("commit", _t5 - _t4)):
                    report.phase_sec[k] = round(
                        report.phase_sec.get(k, 0.0) + v, 2)
        finally:
            # a failed batch (incl. CommitConflict) must not leak staged
            # parquet: the rerun recomputes; only committed tables survive
            shutil.rmtree(staging, ignore_errors=True)

        report.buckets_done += len(batch)
        report.batches.append(batch)
        report.doc_count += sum(r["doc_count"] for r in lineage_rows)
        report.chunk_count += sum(r["chunk_count"] for r in lineage_rows)
        report.failure_count += sum(r["failure_count"] for r in lineage_rows)

        if _fail_after_batches is not None and batch_idx + 1 >= _fail_after_batches:
            raise RuntimeError("injected failure for resume testing")

    # Remove ONLY the _staging root if nothing else is using it: a delete /
    # registry-upsert racing a finishing job stages under the same root, and
    # an rmtree here would wipe its bucket rewrite mid-commit. Each writer
    # cleans its own unique staging dir; the empty root is vacuumed softly.
    try:
        os.rmdir(staging_root)
    except OSError:
        pass  # non-empty (another writer's staging) or already gone
    return report


def _changed_pages(spark, sub: DataFrame, out_dir: str,
                   batch: list[int]) -> tuple[DataFrame, int]:
    """Merge-mode change detection for one bucket batch.

    Keeps only pages that are NEW (url absent from the committed
    ``extracted`` table) or NEWER (``warc_ts`` strictly greater than the
    committed row's). Crawl snapshots re-fetch: the same url can appear
    several times in one snapshot, so the latest ``warc_ts`` per url wins
    first; exact (url, warc_ts) duplicates are collapsed deterministically
    by content hash. All decisions run over narrow (url, warc_ts) column
    scans — unchanged pages' html bytes never enter a shuffle."""
    from pyspark.sql import Window

    latest = (sub.select("url", "warc_ts")
              .groupBy("url").agg(F.max("warc_ts").alias("warc_ts")))

    table_dir = os.path.join(out_dir, "extracted")
    dirs = [wh.bucket_dir(table_dir, b) for b in batch]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if dirs:
        done = (spark.read.option("basePath", table_dir).parquet(*dirs)
                .select("url", F.col("warc_ts").alias("_done_ts")))
        changed_keys = (latest.join(done, "url", "left")
                        .filter(F.col("_done_ts").isNull()
                                | (F.col("warc_ts") > F.col("_done_ts")))
                        .select("url", "warc_ts"))
    else:
        changed_keys = latest

    n_latest = latest.count()
    n_changed = changed_keys.count()

    sub = sub.join(changed_keys, ["url", "warc_ts"], "left_semi")
    # collapse exact (url, warc_ts) duplicates deterministically (shuffles
    # only the changed subset, which the parse stage repartitions anyway)
    w = Window.partitionBy("url").orderBy(
        F.md5(F.coalesce(F.col("html"), F.lit(b""))).asc(),
        F.coalesce(F.col("text"), F.lit("")).asc())
    sub = (sub.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1).drop("_rn"))
    return sub, n_latest - n_changed


def _committed_bucket_rows(spark, table_dir: str,
                           buckets: list[int]) -> DataFrame | None:
    """Committed rows of the given buckets (with the ``bucket`` partition
    column), or None when none of the dirs exist yet (first snapshot).
    Schema-pinned when the warehouse pins one: the selected buckets can
    span code-version eras, and footer inference over a mixed set silently
    drops columns the sampled footer lacks."""
    dirs = [wh.bucket_dir(table_dir, b) for b in buckets]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return None
    reader = spark.read.option("basePath", table_dir)
    pinned = wh.pinned_table_schema(os.path.dirname(table_dir),
                                    os.path.basename(table_dir))
    if pinned is not None:
        reader = reader.schema(pinned)
    return reader.parquet(*dirs)


def read_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    return wh.read_table(spark, out_dir, "chunks")


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return wh.read_table(spark, out_dir, "extracted")


def delete_urls(spark: SparkSession, out_dir: str, urls: list[str],
                num_buckets: int | None = None,
                tables: tuple[str, ...] = ("chunks", "extracted",
                                           "embeddings", "registry")) -> dict:
    """Delete documents by url across all warehouse tables (reference
    ``cli delete`` + the documents→chunks FK cascade, db_schema.py:27,
    cli/commands.py:268-269) — including the registry card table and any
    streaming-written ``batch=<id>`` layout of the same tables.

    Iceberg-wise this is ``DELETE FROM t WHERE url IN (...)``; here it is a
    *bucket-local rewrite*: only the url-hash buckets that can contain the
    targeted urls are read, filtered, and atomically re-committed — every
    other bucket's files are untouched (the same partition-pruned shape a
    real DELETE takes on a bucket-partitioned Iceberg table).
    """
    num_buckets = wh.resolve_num_buckets(out_dir, num_buckets)
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    buckets = sorted({
        r["bucket"]
        for r in urls_df.select(
            bucket_of(F.col("url"), num_buckets).alias("bucket"))
        .distinct().collect()})
    report = {"buckets_rewritten": buckets, "rows_deleted": {}}
    # unique per-invocation staging dir: concurrent deletes (or a delete
    # racing an extraction job's cleanup) must never share a staging path
    import uuid
    staging = os.path.join(out_dir, "_staging",
                           f"delete-{uuid.uuid4().hex[:12]}")
    os.makedirs(staging, exist_ok=True)
    del_snap = f"delete-{uuid.uuid4().hex[:12]}"

    # Make the delete VISIBLE to extraction's optimistic-concurrency check
    # BEFORE any data moves: appended after the swaps (or worse, after the
    # long ANN cascade) the record would leave the resurrection window it
    # exists to close wide open, and a crash mid-delete would never write
    # it. Written first, a crash merely leaves a conflict record with no
    # data change — extraction jobs rerun, which is safe.
    ts = wh.now()
    with wh.commit_lock(out_dir):
        wh.append_lineage(out_dir, del_snap, [{
            "input_snapshot_id": del_snap, "bucket": b, "doc_count": 0,
            "chunk_count": 0, "failure_count": 0,
            "started_at": ts, "finished_at": ts} for b in buckets])

    try:
        for table in tables:
            table_dir = os.path.join(out_dir, table)
            deleted = _delete_bucketed(spark, out_dir, table_dir, urls_df,
                                       buckets, staging, table, del_snap)
            deleted += _delete_batch_dirs(spark, table_dir, urls_df, staging,
                                          table)
            report["rows_deleted"][table] = deleted
        report["ann_rows_deleted"] = _delete_from_ann(spark, out_dir,
                                                      urls_df, staging)
    finally:
        # a CommitConflict / failed write must not leak staged parquet
        # (it would also keep the _staging root non-removable forever)
        shutil.rmtree(staging, ignore_errors=True)
    return report


def _delete_bucketed(spark, out_dir: str, table_dir: str, urls_df,
                     buckets: list[int], staging: str, table: str,
                     del_snap: str) -> int:
    """Bucket-local anti-join rewrite of one bucketed table; returns rows
    deleted (counted from the staged output — no post-commit rescan, which
    a concurrent extraction commit could skew negative)."""
    dirs = [wh.bucket_dir(table_dir, b) for b in buckets]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return 0
    read_ts = wh.now()
    # schema-pinned read: a delete over mixed-era buckets must not strip
    # an added column from the carried-over rows it rewrites
    reader = spark.read.option("basePath", table_dir)
    pinned = wh.pinned_table_schema(out_dir, table)
    if pinned is not None:
        reader = reader.schema(pinned)
    sub = reader.parquet(*dirs)
    before = sub.count()
    kept = sub.join(F.broadcast(urls_df), "url", "left_anti")
    stage_tbl = os.path.join(staging, table)
    shutil.rmtree(stage_tbl, ignore_errors=True)
    sort_cols = ["bucket", "url"] + (["chunk_id"]
                                     if "chunk_id" in kept.columns else [])
    from docling_rag_spark.functions.partitioning import route_repartition
    (route_repartition(kept, buckets)
     .sortWithinPartitions(*sort_cols)
     .write.partitionBy("bucket").mode("overwrite").parquet(stage_tbl))
    # a zero-row partitionBy write leaves only _SUCCESS: no files to infer
    # a schema from, so probe for parquet parts before reading back
    import glob
    has_parts = bool(glob.glob(os.path.join(stage_tbl, "bucket=*",
                                            "*.parquet")))
    kept_n = (spark.read.option("basePath", stage_tbl).parquet(stage_tbl)
              .count() if has_parts else 0)
    # buckets that became empty still need their old dir replaced
    for b in buckets:
        sdir = wh.bucket_dir(stage_tbl, b)
        if not os.path.isdir(sdir):
            os.makedirs(sdir, exist_ok=True)
    if kept_n == 0:
        # full wipe: a table of only file-less bucket dirs fails schema
        # inference on every later read — pin the schema with one
        # zero-row parquet file (what an Iceberg table keeps in metadata)
        from pyspark.sql.pandas.types import to_arrow_schema

        import pyarrow.parquet as _pq
        empty = to_arrow_schema(kept.drop("bucket").schema).empty_table()
        _pq.write_table(empty, os.path.join(
            wh.bucket_dir(stage_tbl, buckets[0]), "part-00000-empty.parquet"))
    with wh.commit_lock(out_dir):
        # delete's own check-then-commit: an extraction batch that
        # committed these buckets AFTER our stale read must not be
        # overwritten by the pre-extraction staged rewrite (its
        # lineage would still claim the bucket done -> permanent loss)
        newer = wh.conflicting_buckets(out_dir, del_snap, buckets, read_ts)
        if newer:
            raise wh.CommitConflict(newer, del_snap)
        # retention-aware: on a retain_snapshots warehouse the delete is a
        # retained commit like any other — pre-delete as-of reads still
        # resolve the deleted rows (Iceberg DELETE produces a snapshot)
        snap.commit_buckets_retained(out_dir, stage_tbl, table, buckets,
                                     del_snap, wh.now())
    return before - kept_n


def _delete_batch_dirs(spark, table_dir: str, urls_df, staging: str,
                       table: str) -> int:
    """Cascade into a streaming-written ``batch=<id>`` layout of the same
    table (stream_extract_chunks/stream_ingest_dedup/stream_embed_index
    output): without this, exact-mode search over streaming embeddings
    keeps returning deleted documents forever. Each snapshotted batch dir
    is rewritten in place via the recoverable swap."""
    if not os.path.isdir(table_dir):
        return 0
    batch_dirs = [d for d in sorted(os.listdir(table_dir))
                  if d.startswith("batch=")]
    deleted = 0
    for i, d in enumerate(batch_dirs):
        bdir = os.path.join(table_dir, d)
        wh.recover_swap(bdir)
        df = spark.read.option("basePath", table_dir).parquet(bdir) \
            .drop("batch")
        if "url" not in df.columns:
            return 0
        before = df.count()
        kept = df.join(F.broadcast(urls_df), "url", "left_anti")
        n_kept = kept.count()
        if n_kept == before:
            continue
        if n_kept == 0:
            # no rows survive: drop the batch dir (a file-less rewrite
            # would break schema inference on later whole-table reads)
            trash = os.path.join(staging, f".gone-{table}-batch-{i}")
            os.rename(bdir, trash)
            shutil.rmtree(trash, ignore_errors=True)
            deleted += before
            continue
        tmp = os.path.join(staging, f"{table}-batch-{i}")
        shutil.rmtree(tmp, ignore_errors=True)
        kept.write.mode("overwrite").parquet(tmp)
        wh.swap_dir(tmp, bdir)
        deleted += before - n_kept
    return deleted


def _delete_from_ann(spark: SparkSession, out_dir: str, urls_df,
                     staging: str) -> dict:
    """Cascade a url delete into the materialized ANN index (and streaming
    deltas): a stale index would keep ranking chunks of deleted documents
    in mode=auto/ann searches. Base tables get a whole-table rewrite (a
    url predicate does not align with the bucket/cell partitioning — the
    same shape Iceberg's DELETE takes on a non-partition predicate);
    streaming deltas are rewritten per snapshotted ``batch=<id>`` dir so a
    concurrently running stream's NEW batches are never touched. The whole
    cascade holds the compaction lock — a compactor staging its merge from
    the pre-delete base would otherwise resurrect the deleted vectors when
    it swaps."""
    removed: dict[str, int] = {}
    ann_root = os.path.join(out_dir, "ann")
    delta_root = os.path.join(out_dir, "ann_delta")
    if not (os.path.isdir(ann_root) or os.path.isdir(delta_root)):
        return removed

    def rewrite(table_dir: str, part_cols: list[str], base_path: str,
                label: str) -> None:
        df = spark.read.option("basePath", base_path).parquet(table_dir)
        if "url" not in df.columns:
            return  # index keyed by vec_id (oracle-table build): no cascade
        before = df.count()
        kept = df.join(F.broadcast(urls_df), "url", "left_anti")
        n_kept = kept.count()
        if n_kept == before:
            return  # nothing of these urls here
        if n_kept == 0:
            # a partitionBy write of zero rows yields a file-less dir
            # (only _SUCCESS) whose later read fails schema inference —
            # remove the index dir outright; readers treat a missing
            # index as empty / fall back to other tiers
            trash = os.path.join(staging,
                                 ".gone-" + label.replace("/", "_"))
            os.rename(table_dir, trash)
            shutil.rmtree(trash, ignore_errors=True)
            removed[label] = before
            return
        tmp = os.path.join(staging, "ann-" + label.replace("/", "_"))
        shutil.rmtree(tmp, ignore_errors=True)
        (kept.drop(*[c for c in part_cols if c == "batch"])
         .write.partitionBy(*[c for c in part_cols if c != "batch"])
         .mode("overwrite").parquet(tmp))
        wh.swap_dir(tmp, table_dir)
        removed[label] = before - n_kept

    with wh.commit_lock(os.path.join(out_dir, "_compaction"),
                        timeout=60.0, stale_sec=3600.0):
        for sub, part_cols in (("lsh", ["bucket"]), ("ivf", ["cell"]),
                               ("mt", ["table", "bucket"]),
                               ("pq", ["cell"])):
            table_dir = os.path.join(ann_root, sub)
            wh.recover_swap(table_dir)
            if os.path.isdir(table_dir):
                rewrite(table_dir, part_cols, table_dir, f"ann/{sub}")
        if os.path.isdir(delta_root):
            for d in sorted(os.listdir(delta_root)):
                if not d.startswith("batch="):
                    continue
                bdir = os.path.join(delta_root, d)
                wh.recover_swap(bdir)
                rewrite(bdir, ["batch", "bucket"], delta_root,
                        f"ann_delta/{d}")
    return removed
