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

    levels = sorted(set(args.levels))
    if len(levels) < 2:
        ap.error("--levels needs at least two distinct values")
    lo, hi = levels[0], levels[-1]
    # drift-robust protocol: each trial runs EVERY requested level
    # back-to-back (lo..hi interleaved across trials) so slow co-tenant
    # drift hits all levels equally; efficiency is computed per ADJACENT
    # level pair within each trial and the MEDIAN across trials is
    # reported per pair (a best-of-N per level lets one lucky lo trial
    # tank the ratio). Intermediate --levels entries are first-class:
    # every level gets trials and an adjacent-pair efficiency row.
    # The CPU probe runs before AND after as the contention control.
    probe_before = cpu_ceiling(levels)
    trials: dict[int, list[float]] = {c: [] for c in levels}
    pair_effs: dict[tuple[int, int], list[float]] = {
        (levels[i], levels[i + 1]): [] for i in range(len(levels) - 1)}
    overall = []
    for t in range(args.trials):
        per_level = {}
        for i, c in enumerate(levels):
            r = run_level(pages, c, tmp, t * len(levels) + i)
            per_level[c] = r["docs_per_sec"]
            trials[c].append(r["docs_per_sec"])
        for (a, b) in pair_effs:
            pair_effs[(a, b)].append(round(
                (per_level[b] / per_level[a]) / (b / a), 3))
        overall.append(round(
            (per_level[hi] / per_level[lo]) / (hi / lo), 3))
    probe_after = cpu_ceiling(levels)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    med_overall = med(overall)
    out = {
        "metric": "extraction scaling efficiency",
        "n_docs": n,
        "trials_docs_per_sec": {str(c): trials[c] for c in levels},
        "pair_efficiencies": {f"{a}->{b}": v
                              for (a, b), v in pair_effs.items()},
        "overall_efficiencies": overall,
        "efficiency": med_overall,
        "core_ratio": hi / lo,
        "target": 0.8,
        "pass": med_overall >= 0.8,
        "hw_probe_Mmd5_before": {str(c): probe_before[c] for c in levels},
        "hw_probe_Mmd5_after": {str(c): probe_after[c] for c in levels},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
