#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

The local scripts call ``docling_rag_spark.ship(spark)`` (runtime
addPyFile); a real cluster run ships the same code ahead of time:

    python scripts/package_pyfiles.py          # -> dist/docling_rag_spark.zip
    spark-submit --py-files dist/docling_rag_spark.zip \\
        scripts/run_extract.py --pages <input> --out <warehouse> \\
        --buckets 4096 --cores <executor-cores>

Deterministic archive: entries are sorted and timestamps zeroed, so the
zip is byte-stable for a given tree (reproducible submissions).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    pkg_dir = os.path.join(REPO, "docling_rag_spark")
    out_path = out_path or os.path.join(REPO, "dist",
                                        "docling_rag_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(pkg_dir):
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
