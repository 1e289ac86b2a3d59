"""Materialized MinHash-LSH band index: incremental near-dup detection.

The batch path (``queries/dedup.py::minhash_pairs_for``) recomputes every
signature per run — correct for a one-shot corpus job, wrong for the
production cadence where a daily crawl delta (10^8 pages) lands next to a
10^12-page corpus. Reference parity: the reference reindexes one document
at a time against its stored vectors (core/indexer.py:76-116 upserts per
file); this is the corpus-scale analog for near-dup state.

This module materializes the (doc_id, band, band_sig) table once,
physically partitioned by ``band`` (16 spill-bounded partitions, each a
flat 3-column parquet — at 10^12 docs each band partition is ~doc-count
rows of 8+4+32 bytes, splittable across any executor count), then lets a
delta join against it WITHOUT touching the corpus text again:

* delta signatures: one pass over ONLY the new docs (the same
  ``band_sigs_for`` lineage the batch path and the oracle pin);
* delta-vs-corpus candidates: the delta's band rows BROADCAST to the
  index scan — a map-side hash join, zero shuffle of the corpus index;
* delta-vs-delta candidates: the tiny self-join of the delta itself;
* append: the delta's band rows land in the same partition layout, so
  tomorrow's delta sees today's.

Equivalence contract (pytest-pinned): incremental pairs over old ∪ delta
== ``minhash_pairs_for(old ∪ delta)`` restricted to pairs touching the
delta — exactly, because a doc's signature depends only on its own text.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from docling_rag_spark.queries.dedup import (
    _BAND_SIZE, _NUM_PERMS, _SHINGLE_K, band_sigs_for,
)

BANDS_SUBDIR = "minhash_bands"

# portable corpus split for the incremental diagnostic: md5 of the doc_id
# DECIMAL STRING, so Spark and DuckDB derive the identical bucket
SPLIT_PCT = 90


def split_bucket_col(doc_id_col):
    """0..99 bucket from md5(doc_id-as-string) — engine-portable (DuckDB
    twin: ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100)."""
    return (F.conv(F.substring(F.md5(doc_id_col.cast("string")), 1, 15),
                   16, 10).cast("bigint") % 100)


def _index_path(index_dir: str) -> str:
    return os.path.join(index_dir, BANDS_SUBDIR)


def build_band_index(spark, docs, index_dir: str) -> str:
    """Materialize the band-signature table for ``docs`` (doc_id, text),
    partitioned by band. Overwrites any existing index."""
    path = _index_path(index_dir)
    (band_sigs_for(docs)
     .repartition("band")
     .write.partitionBy("band").mode("overwrite").parquet(path))
    return path


def append_band_delta(spark, delta_docs, index_dir: str) -> None:
    """Append the delta's band signatures into the same partition layout
    (dynamic partition append — only touched band dirs gain files)."""
    (band_sigs_for(delta_docs)
     .repartition("band")
     .write.partitionBy("band").mode("append").parquet(_index_path(index_dir)))


def incremental_minhash_pairs(spark, delta_docs, index_dir: str):
    """LSH candidate pairs involving at least one delta doc, against the
    materialized index — identical rows to the batch job's pairs touching
    the delta, at delta-sized cost.

    Plan shape: the delta's band rows (|delta| x 16) broadcast into the
    index scan — the corpus-sized side never shuffles; only the candidate
    pairs (bounded by true near-dups x 16 bands) reach the final
    count-shared-bands aggregate. delta-vs-delta pairs come from the
    delta's own self-join so a delta that duplicates itself is caught
    before it is appended."""
    idx = spark.read.parquet(_index_path(index_dir))
    delta = band_sigs_for(delta_docs)

    new_old = (idx.join(F.broadcast(delta.withColumnRenamed("doc_id", "nid")),
                        ["band", "band_sig"])
               .select(F.least("doc_id", "nid").cast("bigint").alias("doc_a"),
                       F.greatest("doc_id", "nid").cast("bigint")
                        .alias("doc_b")))
    d_a, d_b = delta.alias("a"), delta.alias("b")
    new_new = (d_a.join(d_b, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.band_sig") == F.col("b.band_sig"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
               .select(F.col("a.doc_id").cast("bigint").alias("doc_a"),
                       F.col("b.doc_id").cast("bigint").alias("doc_b")))
    return (new_old.union(new_new)
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("bigint").alias("n_shared_bands")))


def ensure_band_index(spark, sf_dir: str, hi_pct: int = SPLIT_PCT) -> str:
    """Build-once cache of the band index over the md5-bucket < ``hi_pct``
    slice of ``documents`` — same (path, mtime, size)-keyed atomic-rename
    protocol as plans/ann_index.ensure_index."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path_key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
    # The signature shape is part of the key: a cached index built under a
    # different (shingle_k, perms, band_size) is silently incompatible with
    # fresh probe signatures (zero candidate pairs, no error) — exactly the
    # failure a versioned index layout must make impossible.
    sig_shape = f"k{_SHINGLE_K}p{_NUM_PERMS}b{_BAND_SIZE}"
    state_key = hashlib.md5(
        f"{st.st_mtime_ns}|{st.st_size}|{hi_pct}|{sig_shape}|v1"
        .encode()).hexdigest()[:12]
    root = os.environ.get("SPARK_GRAFT_DEDUP_DIR",
                          os.path.join(tempfile.gettempdir(),
                                       "spark_graft_dedup"))
    final = os.path.join(root, f"{path_key}-{state_key}")
    if os.path.isdir(os.path.join(final, BANDS_SUBDIR)):
        return final
    os.makedirs(root, exist_ok=True)
    docs = (spark.read.parquet(src)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
            .filter(split_bucket_col(F.col("doc_id")) < hi_pct))
    tmp = os.path.join(root, f".build-{uuid.uuid4().hex[:12]}")
    build_band_index(spark, docs, tmp)
    import shutil
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def dedup_incremental_pairs(spark, sf_dir):
    """Diagnostic entry: the md5-bucket >= SPLIT_PCT slice of ``documents``
    is 'today's crawl delta'; pairs come from the broadcast join against
    the materialized index of the other 90% — NOT from re-signing the
    corpus. The DuckDB twin recomputes the batch pairs and restricts to
    pairs touching the delta: equality proves the incremental derivation
    exactly (a doc's signature depends only on its own text)."""
    idx = ensure_band_index(spark, sf_dir)
    delta = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
             .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
             .filter(split_bucket_col(F.col("doc_id")) >= SPLIT_PCT))
    return incremental_minhash_pairs(spark, delta, idx)
