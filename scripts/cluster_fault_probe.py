#!/usr/bin/env python
"""Executor-loss fault tolerance on a REAL multi-executor standalone cluster.

The north rule requires the job to be resumable and robust at cluster scale.
`tests/test_job_resume.py` proves *driver*-level kill-resume; this probe
proves *executor*-level fault tolerance on a genuine standalone cluster:

  1. boot one Master + 4 Worker JVMs, `spark-submit --py-files` the
     extraction job, record the output content hash (clean run);
  2. rerun the identical job and `kill -9` one Worker JVM (taking its
     executor and any shuffle/Arrow state with it) mid-parse;
  3. the job must COMPLETE on the surviving executors — Spark reschedules
     the lost tasks — and the output must hash byte-identical to the
     clean run (DuckDB, independent reader).

This is the sandbox analog of losing a node in a 1000-executor fleet:
correctness must come from deterministic row transforms + atomic bucket
commits, never from any executor staying alive.

Usage:
  python scripts/cluster_fault_probe.py [--docs 40000] [--heaviness 2]
      [--workers 4] [--executor-cores 2] [--kill-frac 0.4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from bench_cluster import (  # noqa: E402
    HOST, MASTER_PORT, MASTER_UI_PORT, launch, submit_cmd, submit_env,
    wait_port, wait_workers,
)


def out_hash(out: str) -> dict:
    import duckdb
    con = duckdb.connect()
    row = con.sql(
        f"""
        select count(*) as chunks,
               sum(hash(url || '#' || chunk_id || '#' || text)) as chunk_hash
        from '{out}/chunks/*/*.parquet'
        """).fetchone()
    erow = con.sql(
        f"""
        select count(*) as docs,
               sum(hash(url || '#' || status || '#'
                        || coalesce(extracted_text, ''))) as text_hash
        from '{out}/extracted/*/*.parquet'
        """).fetchone()
    con.close()
    return {"chunks": row[0], "chunk_hash": str(row[1]),
            "docs": erow[0], "text_hash": str(erow[1])}


def parse_report(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--heaviness", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--executor-cores", type=int, default=2)
    ap.add_argument("--executor-mem", default="4g")
    ap.add_argument("--kill-frac", type=float, default=0.4,
                    help="kill the worker this fraction into the clean-run "
                         "wall time")
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="fault_probe_", dir=base)
    procs: list[subprocess.Popen] = []
    try:
        pages = os.path.join(tmp, "pages.parquet")
        from docling_rag_spark.sources.pages import write_pages_parquet
        n = write_pages_parquet(pages, args.docs, heaviness=args.heaviness)

        pyzip = os.path.join(tmp, "docling_rag_spark.zip")
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "package_pyfiles.py"),
                        pyzip], check=True, capture_output=True)

        env = dict(os.environ)
        env.setdefault("SPARK_NO_DAEMONIZE", "1")
        procs.append(launch(
            "org.apache.spark.deploy.master.Master",
            ["--host", HOST, "--port", str(MASTER_PORT),
             "--webui-port", str(MASTER_UI_PORT)],
            os.path.join(tmp, "master.log"), env))
        wait_port(MASTER_PORT)
        workers: list[subprocess.Popen] = []
        for i in range(args.workers):
            w = launch(
                "org.apache.spark.deploy.worker.Worker",
                ["--cores", str(args.executor_cores),
                 "--memory", args.executor_mem,
                 "--port", "0", "--webui-port", "0",
                 "--work-dir", os.path.join(tmp, f"worker{i}"),
                 f"spark://{HOST}:{MASTER_PORT}"],
                os.path.join(tmp, f"worker{i}.log"), env)
            workers.append(w)
            procs.append(w)
        wait_workers(args.workers)

        senv = submit_env(tmp)

        # clean run
        out_clean = os.path.join(tmp, "wh_clean")
        cmd = submit_cmd(pages, out_clean, args.workers, args.executor_cores,
                         args.executor_mem, pyzip)
        t0 = time.time()
        p = subprocess.run(cmd, capture_output=True, text=True, env=senv)
        clean_wall = time.time() - t0
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-8000:])
            raise RuntimeError("clean run failed")
        clean = parse_report(p.stdout)
        clean_h = out_hash(out_clean)

        # chaos run: same job, one worker SIGKILLed mid-parse
        out_chaos = os.path.join(tmp, "wh_chaos")
        cmd = submit_cmd(pages, out_chaos, args.workers, args.executor_cores,
                         args.executor_mem, pyzip)
        kill_at = max(3.0, args.kill_frac * clean_wall)
        t0 = time.time()
        sub = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                               stderr=subprocess.PIPE, text=True, env=senv)
        time.sleep(kill_at)
        victim = workers[-1]
        victim.kill()  # SIGKILL the Worker JVM (executor dies with it)
        victim.wait(timeout=10)
        stdout, stderr = sub.communicate(timeout=900)
        chaos_wall = time.time() - t0
        if sub.returncode != 0:
            sys.stderr.write(stdout[-2000:] + "\n" + stderr[-8000:])
            raise RuntimeError("chaos run failed — job did not survive "
                               "executor loss")
        chaos = parse_report(stdout)
        chaos_h = out_hash(out_chaos)

        match = (clean_h == chaos_h
                 and clean["chunk_count"] == chaos["chunk_count"]
                 and clean["failure_count"] == chaos["failure_count"])
        print(json.dumps({
            "metric": "executor-loss fault tolerance (standalone cluster)",
            "mode": f"spark-standalone: {args.workers} worker JVMs, "
                    "SIGKILL one worker mid-job",
            "n_docs": n,
            "executor_cores": args.executor_cores,
            "clean_wall_sec": round(clean_wall, 1),
            "chaos_wall_sec": round(chaos_wall, 1),
            "killed_after_sec": round(kill_at, 1),
            "clean": {k: clean[k] for k in
                      ("doc_count", "chunk_count", "failure_count")},
            "chaos": {k: chaos[k] for k in
                      ("doc_count", "chunk_count", "failure_count")},
            "clean_hash": clean_h,
            "chaos_hash": chaos_h,
            "hash_match": clean_h == chaos_h,
            "pass": match,
        }))
        return 0 if match else 1
    finally:
        for p in procs[::-1]:
            p.terminate()
        for p in procs[::-1]:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
