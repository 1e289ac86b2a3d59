#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so the proxy mandated by the driver
is: the identical extraction job on the identical input at two local
parallelism levels (N and 4N cores); efficiency =
(docs_per_sec_4N / docs_per_sec_N) / 4.

The sandbox's 32 vCPUs are not 32 real cores: a pure-CPU multiprocessing
probe (md5 chains, no Spark, no IPC) tops out at ~16 cores of aggregate
throughput — 16→32 procs yields only ~1.2×. The probe runs first and its
per-pair hardware ceiling is reported alongside job efficiency, so the
default level pair (local[2] vs local[8]) sits inside the machine's linear
region; --levels 8 32 measures the saturated region for reference.

Each level runs in its own subprocess (a JVM pins its master for the session
lifetime) and times ONLY the job, excluding session startup and Python
worker warmup, via scripts/run_extract.py's elapsed_sec. Results go to
BASELINE.md; this script prints one JSON line.

Usage: python scripts/bench_scaling.py [--docs 100000] [--trials 2]
                                       [--levels 2 8]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(n: int) -> int:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def cpu_ceiling(levels: list[int], n: int = 300000) -> dict[int, float]:
    """Aggregate pure-CPU throughput (M md5/s) per parallelism level."""
    out = {}
    for procs in levels:
        t0 = time.time()
        with multiprocessing.Pool(procs) as p:
            p.map(_burn, [n] * procs)
        out[procs] = round(procs * n / (time.time() - t0) / 1e6, 2)
    return out


def run_level(pages: str, cores: int, out_root: str, trial: int) -> dict:
    out = os.path.join(out_root, f"wh_c{cores}_t{trial}")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "run_extract.py"),
           "--pages", pages, "--out", out, "--warmup",
           "--buckets", "256", "--cores", str(cores),
           "--salt-partitions", str(max(cores, 8))]
    env = dict(os.environ)
    # shuffle/spill on tmpfs: the sandbox's single virtual disk would
    # otherwise add IO-contention noise that no real cluster (with
    # per-executor local disks) would see
    env.setdefault("SPARK_LOCAL_DIRS", os.path.join(out_root, "spark-local"))
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True,
                          env=env)
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--heaviness", type=int, default=4,
                    help="content-size multiplier: ~8 KB docs approximate "
                         "real Common-Crawl page weight")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 8])
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="bench_scaling_", dir=base)
    pages = os.path.join(tmp, "pages.parquet")
    sys.path.insert(0, REPO)
    from docling_rag_spark.sources.pages import write_pages_parquet
    n = write_pages_parquet(pages, args.docs, heaviness=args.heaviness)

    lo, hi = min(args.levels), max(args.levels)
    ratio = hi / lo
    # drift-robust protocol: trials run INTERLEAVED (lo, hi, lo, hi, ...)
    # so slow co-tenant drift hits both levels equally; efficiency is
    # computed per adjacent (lo, hi) pair and the MEDIAN pair is reported
    # (a best-of-N per level lets one lucky lo trial tank the ratio).
    # The CPU probe runs before AND after as the contention control.
    probe_before = cpu_ceiling(args.levels)
    pairs = []
    trials = {lo: [], hi: []}
    for t in range(args.trials):
        r_lo = run_level(pages, lo, tmp, 2 * t)
        r_hi = run_level(pages, hi, tmp, 2 * t + 1)
        trials[lo].append(r_lo["docs_per_sec"])
        trials[hi].append(r_hi["docs_per_sec"])
        pairs.append(round(
            (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / ratio, 3))
    probe_after = cpu_ceiling(args.levels)
    med = sorted(pairs)[len(pairs) // 2]
    out = {
        "metric": "extraction scaling efficiency",
        "n_docs": n,
        "trials_docs_per_sec": {str(c): trials[c] for c in (lo, hi)},
        "pair_efficiencies": pairs,
        "efficiency": med,
        "core_ratio": ratio,
        "target": 0.8,
        "pass": med >= 0.8,
        "hw_probe_Mmd5_before": {str(c): probe_before[c]
                                 for c in args.levels},
        "hw_probe_Mmd5_after": {str(c): probe_after[c]
                                for c in args.levels},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
