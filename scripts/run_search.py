#!/usr/bin/env python
"""Search CLI: top-k cosine retrieval over the extraction warehouse.

The reference's ``cli search`` lifecycle (§3.2) end-to-end: embed the query,
optional source filtering, exact top-k, decorate results with document
titles (J1 broadcast join), format heading paths " > " (F3) and 300-char
previews (F4), log the top score to the searches table (S8).

Usage:
    python scripts/run_search.py --warehouse /tmp/wh "star schema queries" \
        [--top-k 5] [--url-prefix https://host0.example/]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--url-prefix", default=None,
                    help="restrict to urls with this prefix")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import docling_rag_spark
    from docling_rag_spark.operators.embed import embed_chunks
    from docling_rag_spark.operators.search import log_search, search_chunks
    from docling_rag_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="search", cores=args.cores)
    docling_rag_spark.ship(spark)

    emb_path = os.path.join(args.warehouse, "embeddings")
    chunks = spark.read.parquet(os.path.join(args.warehouse, "chunks"))
    if os.path.isdir(emb_path):
        emb = spark.read.parquet(emb_path)
    else:  # embed on the fly (slower; run scripts/run_embed.py to persist)
        emb = embed_chunks(chunks)

    allowed = None
    if args.url_prefix is not None:
        allowed = (chunks.select("url").distinct()
                   .filter(F.col("url").startswith(args.url_prefix)))

    try:
        # P5 emptiness verdict from the cheap source table, so an
        # on-the-fly embed pipeline isn't executed twice
        hits = search_chunks(spark, emb, args.query, top_k=args.top_k,
                             allowed_urls=allowed,
                             store_is_empty=chunks.isEmpty())
    except FileNotFoundError:
        print(json.dumps({"error": "no chunks in storage"}))
        spark.stop()
        return 1

    docs = spark.read.parquet(os.path.join(args.warehouse, "extracted")) \
        .select("url", "title")
    meta = chunks.select("url", "chunk_id", "text", "headings",
                         "page_number", "element_type")
    out = (hits
           .join(F.broadcast(docs), "url", "left")          # J1
           .join(meta, ["url", "chunk_id"], "left")
           .select(
               "url", "chunk_id", F.round("score", 4).alias("score"),
               "title",
               F.array_join("headings", " > ").alias("heading_path"),  # F3
               F.translate(F.substring("text", 1, 300), "\n", " ")
                .alias("preview"),                                     # F4
               "page_number", "element_type")
           .orderBy(F.desc("score"), "url", "chunk_id"))

    rows = out.collect()
    top = rows[0]["score"] if rows else None
    log_search(args.warehouse, args.query, top)                        # S8
    for r in rows:
        print(json.dumps(r.asDict(), ensure_ascii=False))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
