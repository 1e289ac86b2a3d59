"""Warehouse-level corpus curation: the job that turns extraction output
into a training-ready corpus.

Chains the curation tier over the ``extracted`` table in one DataFrame
DAG — quality gates (same C4/Gopher-shape rules and constants as
``queries/textstats.corpus_filter``), PII scrubbing, exact dedup with
keep-first survivors, token-budget shard packing — and writes
shard-partitioned parquet plus a JSON report of what was dropped and why.
The reference has no analog (its pipeline stops at chunks in postgres);
this is the step a 10^12-doc crawl needs between extraction and training.

Scale design: one text scan computes tokens/gates; the repetition gate
adds the one (url, token) shuffle ``text_repetition`` documents; dedup is
a single window over content hash; shard packing reuses the TWO-PHASE
prefix sum of ``queries/curation.shard_pack`` keyed by the existing
bucket column (per-bucket partials -> tiny offsets window -> broadcast
join), so no global-sort window ever sees the corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from docling_rag_spark.io import warehouse as wh
from docling_rag_spark.queries.dedup import (
    _cc_labels,
    content_hash_col,
    minhash_pairs_for,
)
from docling_rag_spark.queries import textstats as ts

_DEFAULT_SHARD_TOKENS = 200_000


def _with_dense_ids(df):
    """Deterministic dense bigint ``doc_id`` per row via the two-phase
    prefix pattern (per-bucket row_number + broadcast bucket offsets) —
    the scale-safe zipWithIndex: no global-sort window, stable across
    reruns because (bucket, url) is a total order."""
    w = Window.partitionBy("bucket").orderBy("url")
    numbered = df.withColumn("rn", F.row_number().over(w))
    counts = numbered.groupBy("bucket").agg(F.count("*").alias("n"))
    off_w = (Window.orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (counts.withColumn(
        "id_offset", F.coalesce(F.sum("n").over(off_w), F.lit(0)))
        .select("bucket", "id_offset"))
    return (numbered.join(F.broadcast(offsets), "bucket")
            .withColumn("doc_id",
                        (F.col("id_offset") + F.col("rn") - 1)
                        .cast("bigint"))
            .drop("rn", "id_offset"))


def _near_dup_survivors(deduped):
    """MassiveText-style near-dup removal: MinHash-LSH candidate pairs
    over the kept docs -> connected components -> keep each cluster's
    canonical (minimum dense-id == lowest (bucket, url)) member. Same
    banded-join machinery the oracle-checked ``dedup_minhash_pairs`` /
    ``dedup_components`` queries pin, applied to warehouse rows."""
    ids = _with_dense_ids(deduped)
    pairs = minhash_pairs_for(ids.select("doc_id", "text")) \
        .select("doc_a", "doc_b")
    labels = _cc_labels(pairs)
    return (ids.join(labels.withColumnRenamed("node", "doc_id"),
                     "doc_id", "left")
            .filter(F.coalesce(F.col("label"), F.col("doc_id"))
                    == F.col("doc_id"))
            .drop("label", "doc_id"))


def run_curation(spark, out_dir: str, dest_dir: str,
                 shard_tokens: int = _DEFAULT_SHARD_TOKENS,
                 include_degraded: bool = True,
                 min_words: int = ts._FILTER_MIN_WORDS,
                 max_top_bp: int = ts._FILTER_MAX_TOP_BP,
                 require_stopwords: bool = True,
                 near_dup: bool = True) -> dict:
    """extracted -> filtered, scrubbed, deduped, shard-packed corpus.

    Gate thresholds are parameters because they are corpus decisions (the
    C4/Gopher defaults assume natural language; a code or synthetic-text
    corpus disables the stopword rule). Deterministic end-to-end:
    rerunning over the same warehouse produces byte-identical shards
    (hash-ordered survivors, stable shard ids)."""
    statuses = ("ok", "degraded") if include_degraded else ("ok",)
    ext = (wh.read_table(spark, out_dir, "extracted")
           .filter(F.col("status").isin(*statuses))
           .select("url", "bucket", "lang", "status", "extracted_text"))
    n_input = ext.count()

    toks = F.regexp_extract_all(F.lower(F.col("extracted_text")),
                                F.lit(ts._WORD_RE), F.lit(0))
    base = ext.select(
        "url", "bucket", "lang", "status",
        ts.pii_scrub_expr(F.col("extracted_text")).alias("text"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda w: w.isin(*ts._STOP["en"])))
        .cast("bigint").alias("stop_hits"))

    # repetition gate: top-token mass in basis points (the one extra
    # shuffle; same rule + threshold as queries/textstats.corpus_filter)
    per_tok = (ext.select("url", F.explode(toks).alias("tok"))
               .groupBy("url", "tok").agg(F.count("*").alias("c")))
    rep = (per_tok.groupBy("url")
           .agg(F.floor(F.max("c") * 10000.0 / F.sum("c"))
                .cast("bigint").alias("top_token_bp")))

    reason = (F.when(F.col("n_tokens") < min_words, "too_short")
              .when(F.lit(require_stopwords)
                    & (F.col("stop_hits") == 0), "no_stopwords")
              .when(F.coalesce(F.col("top_token_bp"), F.lit(0))
                    > max_top_bp, "repetitive")
              .otherwise("ok"))
    gated = (base.join(rep, "url", "left")
             .withColumn("reason", reason))
    drop_counts = {r["reason"]: r["n"] for r in
                   gated.groupBy("reason")
                   .agg(F.count("*").alias("n")).collect()}
    kept = gated.filter(F.col("reason") == "ok")

    # exact dedup on the SCRUBBED text (what ships is what is hashed);
    # lowest url wins so the survivor set is replay-stable
    dw = Window.partitionBy("content_hash").orderBy("url")
    deduped = (kept.withColumn("content_hash",
                               content_hash_col(F.col("text")))
               .withColumn("rn", F.row_number().over(dw))
               .filter(F.col("rn") == 1)
               .drop("rn", "stop_hits", "top_token_bp", "reason"))
    n_unique = deduped.count()

    # near-dup cluster removal (MinHash-LSH pairs -> connected
    # components -> keep canonical) on top of exact dedup
    if near_dup:
        deduped = _near_dup_survivors(deduped)
        n_survivors = deduped.count()
    else:
        n_survivors = n_unique

    # two-phase prefix sum -> shard_id (per-bucket partials, tiny offsets
    # window, broadcast join; within-bucket order is url — total order
    # because (bucket, url) is unique)
    within_w = (Window.partitionBy("bucket").orderBy("url")
                .rowsBetween(Window.unboundedPreceding, -1))
    within = deduped.withColumn(
        "pre_in_bucket",
        F.coalesce(F.sum("n_tokens").over(within_w), F.lit(0)))
    totals = within.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_total"))
    off_w = (Window.orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "bucket_offset",
        F.coalesce(F.sum("bucket_total").over(off_w), F.lit(0))
    ).select("bucket", "bucket_offset")
    packed = (within.join(F.broadcast(offsets), "bucket")
              .withColumn("shard_id",
                          F.expr(f"div(bucket_offset + pre_in_bucket, "
                                 f"{int(shard_tokens)})").cast("bigint"))
              .select("url", "lang", "status", "text", "n_tokens",
                      "content_hash", "shard_id"))

    (packed.repartition("shard_id")
     .sortWithinPartitions("shard_id", "url")
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(os.path.join(dest_dir, "corpus")))

    stats = (spark.read.parquet(os.path.join(dest_dir, "corpus"))
             .agg(F.count("*").alias("docs"),
                  F.sum("n_tokens").alias("tokens"),
                  F.countDistinct("shard_id").alias("shards")).first())
    report = {
        "n_input": n_input,
        "dropped_by_reason": {k: v for k, v in sorted(drop_counts.items())
                              if k != "ok"},
        "n_passed_gates": drop_counts.get("ok", 0),
        "n_exact_dups_removed": drop_counts.get("ok", 0) - n_unique,
        "n_near_dups_removed": n_unique - n_survivors,
        "n_corpus_docs": stats["docs"],
        "total_tokens": int(stats["tokens"] or 0),
        "n_shards": stats["shards"],
        "shard_tokens_budget": int(shard_tokens),
    }
    with open(os.path.join(dest_dir, "_curation_report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report
