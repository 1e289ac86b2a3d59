#!/usr/bin/env python
"""ANN compaction cost/benefit evidence (VERDICT r3 task 7).

Builds the incremental-index layout at sf1 scale — base LSH index (30k
vectors) + 20 streaming-shaped delta batches (1k vectors each) — then
measures the multiprobe query path BEFORE and AFTER ``compact_ann_index``:
wall per query, files opened by the pruned scan, and recall@10 vs the
exact brute force (which must be IDENTICAL pre/post — compaction is a
layout change, not an answer change).

Prints ONE JSON line. Usage:
    python scripts/bench_ann_compaction.py [--sf-dir .benchdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 12_000      # of sf1's 20k embeddings
DELTA_ROWS = 500
N_DELTAS = 16
N_QUERIES = 16
TOP_K = 10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1"))
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from docling_rag_spark.plans.ann_index import (
        interpreted_eval, multiprobe_buckets, plane_matrix, py_bucket)
    from docling_rag_spark.queries.vectors import _bucket
    from docling_rag_spark.session import get_spark
    from docling_rag_spark.streaming.embed_index import (
        ann_probe_candidates, compact_ann_index)

    from pyspark.sql import Window

    spark = get_spark(app_name="bench-ann-compaction")
    # dense rank: sf1 vec_ids are sparse; slice by position (20k rows —
    # the one-partition window is bench plumbing, not a production shape)
    emb = (spark.read.parquet(os.path.join(args.sf_dir,
                                           "embeddings.parquet"))
           .select(F.col("vec_id").cast("long").alias("vec_id"),
                   "embedding")
           .withColumn("rid", F.row_number().over(
               Window.orderBy("vec_id")) - 1)
           .persist())
    dim = len(emb.select("embedding").first()["embedding"])
    n_total = N_BASE + N_DELTAS * DELTA_ROWS

    out = tempfile.mkdtemp(prefix="ann-compact-bench-")
    try:
        def write_slice(pred, dest):
            with interpreted_eval(spark):
                (emb.filter(pred).drop("rid")
                 .withColumn("bucket", _bucket(F.col("embedding"),
                                               plane_matrix(dim)))
                 .write.partitionBy("bucket").mode("overwrite")
                 .parquet(dest))

        write_slice(F.col("rid") < N_BASE,
                    os.path.join(out, "ann", "lsh"))
        for b in range(N_DELTAS):
            lo = N_BASE + b * DELTA_ROWS
            write_slice((F.col("rid") >= lo)
                        & (F.col("rid") < lo + DELTA_ROWS),
                        os.path.join(out, "ann_delta", f"batch={b}"))

        qvecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
                 for r in emb.filter(F.col("rid") < N_QUERIES).collect()}

        def run_queries():
            walls, files, hits, csets = [], [], {}, {}
            for qid in sorted(qvecs):
                q = qvecs[qid]
                t0 = time.time()
                probes = multiprobe_buckets(py_bucket(q))
                cand = ann_probe_candidates(spark, out, probes)
                pdf = cand.toPandas()
                vids = pdf["vec_id"].to_numpy()
                M = np.vstack(pdf["embedding"].to_numpy())
                # canonicalize: sort rows by vec_id and use a
                # single-threaded per-row einsum — threaded BLAS gemv
                # partitions the dot by matrix shape/row order, which
                # perturbs ulps and flips exact-duplicate ties between
                # layouts; scoring must depend only on the candidate SET
                o = np.argsort(vids)
                vids, M = vids[o], M[o].astype(np.float64)
                qv = np.asarray(q)
                cos = (np.einsum("ij,j->i", M, qv)
                       / (np.sqrt(np.einsum("ij,ij->i", M, M))
                          * np.linalg.norm(qv)))
                top = vids[np.lexsort((vids, -cos))][:TOP_K]
                walls.append(time.time() - t0)
                files.append(len(cand.inputFiles()))
                hits[qid] = [int(v) for v in top]
                csets[qid] = set(int(v) for v in vids)
            return walls, files, hits, csets

        run_queries()  # warm-up (codegen, partition discovery)
        walls_pre, files_pre, hits_pre, csets_pre = run_queries()

        t0 = time.time()
        rep = compact_ann_index(spark, out, include_newest=True)
        compact_wall = time.time() - t0

        run_queries()  # warm-up post layout change
        walls_post, files_post, hits_post, csets_post = run_queries()

        # exact recall (numpy brute force over the indexed slice)
        pdfall = (emb.filter(F.col("rid") < n_total).drop("rid")
                  .toPandas().sort_values("vec_id"))
        A = np.vstack(pdfall["embedding"].to_numpy())
        ids = pdfall["vec_id"].to_numpy()
        nrm = np.linalg.norm(A, axis=1)

        def recall(hits):
            rs = []
            for qid, top in hits.items():
                qv = np.asarray(qvecs[qid])
                exact = ids[np.argsort(-(A @ qv)
                                       / (nrm * np.linalg.norm(qv)))][:TOP_K]
                rs.append(len(set(top) & set(int(x) for x in exact)))
            return sum(rs) / len(rs)

        print(json.dumps({
            "metric": "ann probe wall pre/post compaction",
            "sf_dir": args.sf_dir, "dim": dim,
            "n_base": N_BASE, "n_deltas": N_DELTAS,
            "delta_rows": DELTA_ROWS,
            "query_wall_pre_s": round(sum(walls_pre) / len(walls_pre), 4),
            "query_wall_post_s": round(sum(walls_post) / len(walls_post), 4),
            "files_scanned_pre": round(sum(files_pre) / len(files_pre), 1),
            "files_scanned_post": round(sum(files_post) / len(files_post), 1),
            "compact_wall_s": round(compact_wall, 2),
            "compacted_batches": rep["compacted_batches"],
            "topk_identical": hits_pre == hits_post,
            "candidate_sets_identical": csets_pre == csets_post,
            "topk_diff_queries": [q for q in hits_pre
                                  if hits_pre[q] != hits_post[q]],
            "recall_at_10_pre": recall(hits_pre),
            "recall_at_10_post": recall(hits_post),
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
