#!/usr/bin/env python
"""Serve the warehouse HTTP API (reference api/app.py surface).

Usage: python scripts/serve_api.py --warehouse /tmp/wh [--port 8080]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import docling_rag_spark
    from docling_rag_spark.api.server import make_server
    from docling_rag_spark.session import get_spark

    spark = get_spark(app_name="serve-api", cores=args.cores)
    docling_rag_spark.ship(spark)
    srv = make_server(spark, args.warehouse, args.host, args.port)
    print(f"serving warehouse {args.warehouse} on "
          f"http://{args.host}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
