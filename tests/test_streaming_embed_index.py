"""Incremental ANN-index maintenance: delta appends, pruned probes,
compaction parity."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from docling_rag_spark.sources.pages import PAGES_ARROW_SCHEMA, generate_pages
from docling_rag_spark.streaming.embed_index import (
    ann_probe_candidates,
    compact_ann_index,
    stream_embed_index,
)


def _write_slice(df, path):
    table = pa.Table.from_pandas(df, schema=PAGES_ARROW_SCHEMA,
                                 preserve_index=False)
    pq.write_table(table, path)


def test_stream_embed_index_deltas_and_compaction(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    all_pages = generate_pages(40, include_fixtures=False)
    _write_slice(all_pages.iloc[:25], os.path.join(pages_dir, "p0.parquet"))
    q = stream_embed_index(spark, pages_dir, out, ckpt)
    assert q.awaitTermination(180), "stream did not drain"
    _write_slice(all_pages.iloc[25:], os.path.join(pages_dir, "p1.parquet"))
    q = stream_embed_index(spark, pages_dir, out, ckpt)
    assert q.awaitTermination(180), "stream did not drain"

    delta = os.path.join(out, "ann_delta")
    batches = [d for d in os.listdir(delta) if d.startswith("batch=")]
    assert len(batches) >= 2  # each drop produced its own delta

    # the delta rows ARE the embeddings rows, bucketed
    emb = spark.read.parquet(os.path.join(out, "embeddings"))
    all_idx = spark.read.option("basePath", delta).parquet(delta)
    assert all_idx.count() == emb.count()

    # pruned probe: candidates for a bucket set == brute filter over all
    some = [r["bucket"] for r in
            all_idx.select("bucket").distinct().limit(3).collect()]
    got = ann_probe_candidates(spark, out, some)
    want = all_idx.filter(F.col("bucket").isin(some))
    assert got.count() == want.count() > 0

    # default compaction leaves the newest delta (the only batch a
    # crashed stream can replay); candidate set unchanged either way
    before = sorted(r["url"] + str(r["chunk_id"]) for r in got.collect())
    rep = compact_ann_index(spark, out)
    assert rep["compacted_batches"] == len(batches) - 1
    left = [d for d in os.listdir(delta) if d.startswith("batch=")]
    assert len(left) == 1
    mid_df = ann_probe_candidates(spark, out, some)
    assert before == sorted(r["url"] + str(r["chunk_id"])
                            for r in mid_df.collect())
    # a drained stream may fold everything with include_newest=True
    rep = compact_ann_index(spark, out, include_newest=True)
    assert rep["compacted_batches"] == 1
    left = [d for d in os.listdir(delta) if d.startswith("batch=")] \
        if os.path.isdir(delta) else []
    assert left == []
    after_df = ann_probe_candidates(spark, out, some)
    after = sorted(r["url"] + str(r["chunk_id"]) for r in after_df.collect())
    assert before == after


def test_compaction_preserves_topk_and_recall(spark, tmp_path):
    """VERDICT r3 task 7: compaction must not move the answer. On
    clustered embeddings (the structure ANN exists for), multiprobe top-10
    through base + 4 deltas is computed, the index is compacted, and the
    SAME top-10 must come back from the folded layout; recall vs the exact
    brute force holds the same floor as the batch-index test
    (test_vectors_ops.py::test_recall_high_on_clustered_embeddings)."""
    import numpy as np

    from docling_rag_spark.plans.ann_index import (
        interpreted_eval, multiprobe_buckets, plane_matrix, py_bucket)
    from docling_rag_spark.queries.vectors import _bucket

    rng = np.random.default_rng(11)
    n_clusters, per, dim = 12, 100, 64
    cents = rng.normal(size=(n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.vstack([cents[i % n_clusters]
                      + rng.normal(scale=0.03, size=dim)
                      for i in range(n_clusters * per)])
    n = len(vecs)
    out = str(tmp_path / "wh")

    def write_slice(lo, hi, dest):
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]]) for i in range(lo, hi)],
            "vec_id long, embedding array<float>")
        with interpreted_eval(spark):
            (df.withColumn("bucket", _bucket(F.col("embedding"),
                                             plane_matrix(dim)))
             .write.partitionBy("bucket").mode("overwrite").parquet(dest))

    write_slice(0, 800, os.path.join(out, "ann", "lsh"))        # base
    for b, lo in enumerate(range(800, n, 100)):                  # 4 deltas
        write_slice(lo, lo + 100,
                    os.path.join(out, "ann_delta", f"batch={b}"))

    def topk(q_vec, k=10):
        probes = multiprobe_buckets(py_bucket(q_vec))
        cand = ann_probe_candidates(spark, out, probes).toPandas()
        M = np.vstack(cand["embedding"].to_numpy())
        qv = np.asarray(q_vec)
        cos = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
        top = cand["vec_id"].to_numpy()[np.argsort(-cos)][:k]
        return [int(v) for v in top]

    queries = [[float(x) for x in vecs[i]] for i in range(8)]
    pre = [topk(q) for q in queries]

    rep = compact_ann_index(spark, out, include_newest=True)
    assert rep["compacted_batches"] == 4
    assert not os.listdir(os.path.join(out, "ann_delta"))
    post = [topk(q) for q in queries]
    assert pre == post, "compaction changed the top-k answer"

    # absolute recall floor vs exact brute force (numpy)
    norms = np.linalg.norm(vecs, axis=1)
    recalls = []
    for i, q in enumerate(queries):
        qv = np.asarray(q)
        exact = np.argsort(-(vecs @ qv) / (norms * np.linalg.norm(qv)))[:10]
        recalls.append(len(set(post[i]) & set(int(x) for x in exact)))
    assert np.mean(recalls) >= 7.0, recalls
