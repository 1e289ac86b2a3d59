#!/usr/bin/env python
"""Corpus-curation job entrypoint: extraction warehouse -> training-ready
shard-packed corpus (quality gates, PII scrub, exact dedup, token-budget
shards). Prints the curation report as one JSON line.

Usage:
    python scripts/run_curate.py --warehouse <wh_dir> --dest <corpus_dir>
        [--shard-tokens 200000] [--no-degraded] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--shard-tokens", type=int, default=200_000)
    ap.add_argument("--no-degraded", action="store_true",
                    help="curate only status='ok' extractions")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import docling_rag_spark
    from docling_rag_spark.plans.curate import run_curation
    from docling_rag_spark.session import get_spark

    spark = get_spark(app_name="curate", cores=args.cores)
    docling_rag_spark.ship(spark)
    report = run_curation(spark, args.warehouse, args.dest,
                          shard_tokens=args.shard_tokens,
                          include_degraded=not args.no_degraded)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
