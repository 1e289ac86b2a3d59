"""Embedder (X7) + search (O1/P1/P2/P5/S8) contract tests.

Ports the reference's search contracts: brute-force exact cosine spec
(tests/fakes.py:61-63), tri-state allowed filter (db_storage.py:127-146),
empty-store FileNotFoundError (db_storage.py:131-133), AND-tag resolution
(core/search.py:26-40), and the integration-shaped "query finds the
relevant doc" semantic check (tests/test_integration.py:18-68, threshold
scaled to the hashed random-projection embedder).
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_rag_spark.operators.embed import embed_chunks, embed_texts
from docling_rag_spark.operators.search import (
    log_search,
    resolve_allowed_urls,
    search_chunks,
)

DOCS = [
    ("u://a", 0, "database star schema with fact and dimension tables"),
    ("u://a", 1, "the query engine scans parquet with predicate pushdown"),
    ("u://b", 0, "cooking pasta requires salted boiling water"),
    ("u://b", 1, "simmer the tomato sauce with garlic and basil"),
    ("u://c", 0, "spark shuffles data between executors by partition key"),
]


@pytest.fixture(scope="module")
def chunk_emb(spark):
    df = spark.createDataFrame(
        [(u, c, t) for u, c, t in DOCS],
        "url string, chunk_id int, context_text string")
    return embed_chunks(df).cache()


def test_embedder_deterministic_and_normalized():
    m1 = embed_texts(["alpha beta", "alpha beta", ""])
    m2 = embed_texts(["alpha beta"])
    assert np.array_equal(m1[0], m1[1])
    assert np.array_equal(m1[0], m2[0])
    assert abs(float(np.linalg.norm(m1[0])) - 1.0) < 1e-5
    assert float(np.linalg.norm(m1[2])) == 0.0  # empty → zero vector


def test_embedder_cosine_orders_by_overlap():
    m = embed_texts(["star schema fact dimension",
                     "star schema fact tables",
                     "boiling pasta water"])
    sim_close = float(m[0] @ m[1])
    sim_far = float(m[0] @ m[2])
    assert sim_close > sim_far


def test_spark_embedding_matches_local(spark, chunk_emb):
    rows = {(r["url"], r["chunk_id"]): np.array(r["embedding"], np.float32)
            for r in chunk_emb.collect()}
    local = embed_texts([t for _, _, t in DOCS])
    for (u, c, t), vec in zip(DOCS, local):
        assert np.allclose(rows[(u, c)], vec, atol=1e-6), (u, c)


def test_search_topk_matches_numpy_oracle(spark, chunk_emb):
    got = search_chunks(spark, chunk_emb, "star schema query", top_k=3)
    rows = got.collect()
    # numpy brute force (the fakes.py:61-63 executable spec)
    mat = embed_texts([t for _, _, t in DOCS])
    q = embed_texts(["star schema query"])[0]
    scores = mat @ q
    order = sorted(range(len(DOCS)), key=lambda i: (-scores[i], DOCS[i][0],
                                                    DOCS[i][1]))[:3]
    want = [(DOCS[i][0], DOCS[i][1]) for i in order]
    assert [(r["url"], r["chunk_id"]) for r in rows] == want
    for r, i in zip(rows, order):
        assert abs(r["score"] - float(scores[i])) < 1e-5


def test_search_allowed_semi_join(spark, chunk_emb):
    allowed = spark.createDataFrame([("u://b",)], "url string")
    rows = search_chunks(spark, chunk_emb, "pasta water", top_k=5,
                         allowed_urls=allowed).collect()
    assert rows and all(r["url"] == "u://b" for r in rows)


def test_search_empty_allowed_short_circuits(spark):
    # ∅ allowed set: empty result WITHOUT touching (even empty) storage
    empty_store = spark.createDataFrame(
        [], "url string, chunk_id int, embedding array<float>")
    out = search_chunks(spark, empty_store, "q", allowed_empty=True)
    assert out.count() == 0


def test_search_empty_store_raises(spark):
    empty_store = spark.createDataFrame(
        [], "url string, chunk_id int, embedding array<float>")
    with pytest.raises(FileNotFoundError):
        search_chunks(spark, empty_store, "q")


def test_resolve_allowed_and_tags_topic(spark):
    docs = spark.createDataFrame(
        [("u://a", ["Db", "spark"], "Engineering"),
         ("u://b", ["cooking"], "Food"),
         ("u://c", ["db"], "engineering")],
        "url string, tags array<string>, topic string")
    assert resolve_allowed_urls(docs) is None  # tri-state: no predicate
    got = {r["url"] for r in
           resolve_allowed_urls(docs, tags=["DB"]).collect()}
    assert got == {"u://a", "u://c"}  # case-insensitive tag match
    got = {r["url"] for r in
           resolve_allowed_urls(docs, tags=["db", "spark"]).collect()}
    assert got == {"u://a"}  # AND semantics
    got = {r["url"] for r in
           resolve_allowed_urls(docs, topic="ENGINEERING").collect()}
    assert got == {"u://a", "u://c"}


def test_search_log_appends(spark, tmp_path):
    import math
    import os

    import pandas as pd
    p1 = log_search(str(tmp_path), "q1", 0.42)
    p2 = log_search(str(tmp_path), "q2", None)
    df = pd.concat([pd.read_parquet(p1), pd.read_parquet(p2)])
    assert set(df["query"]) == {"q1", "q2"}
    # a zero-hit search (top_score=None) must not poison the unified
    # table with an Arrow null-typed column: Spark reads both files as
    # one double-typed table
    sdf = spark.read.parquet(os.path.join(str(tmp_path), "searches"))
    assert dict(sdf.dtypes)["top_score"] == "double"
    rows = {r["query"]: r["top_score"] for r in sdf.collect()}
    assert abs(rows["q1"] - 0.42) < 1e-9
    assert rows["q2"] is None or math.isnan(rows["q2"])


def test_semantic_quality_end_to_end(spark, chunk_emb):
    """The reference's golden threshold (top_score > 0.3) shape: the query
    about databases must hit the database chunk first with a clearly
    positive score."""
    rows = search_chunks(spark, chunk_emb,
                         "fact and dimension tables star schema",
                         top_k=1).collect()
    assert rows[0]["url"] == "u://a" and rows[0]["chunk_id"] == 0
    assert rows[0]["score"] > 0.3


def test_ann_serving_path_matches_exact_on_probed_buckets(spark, tmp_path):
    """search_warehouse(mode='ann') over the materialized warehouse index:
    pruned to the 9 multiprobe partitions, exact cosine within them; the
    top hit must agree with exact search whenever the exact winner lives
    in a probed bucket (on this tiny corpus it does)."""
    import os

    from docling_rag_spark.api import service
    from docling_rag_spark.plans import ann_index as AI
    from docling_rag_spark.plans.job import bucket_of, run_extraction
    from docling_rag_spark.sources.pages import write_pages_parquet
    from pyspark.sql import functions as F

    pages = str(tmp_path / "pages.parquet")
    wh = str(tmp_path / "wh")
    write_pages_parquet(pages, 60)
    run_extraction(spark, pages, wh, num_buckets=8)
    chunks = spark.read.parquet(os.path.join(wh, "chunks"))
    (embed_chunks(chunks)
     .withColumn("bucket", bucket_of(F.col("url"), 8))
     .write.partitionBy("bucket").mode("overwrite")
     .parquet(os.path.join(wh, "embeddings")))
    emb = spark.read.parquet(os.path.join(wh, "embeddings"))
    AI.build_ann_index(spark, emb, os.path.join(wh, "ann"),
                       id_cols=("url", "chunk_id"))

    q = "star schema fact dimension tables"
    exact = service.search_warehouse(spark, wh, q, top_k=3, log=False,
                                     mode="exact")
    ann = service.search_warehouse(spark, wh, q, top_k=3, log=False,
                                   mode="ann")
    assert exact and ann
    q_vec = [float(v) for v in embed_texts([q])[0]]
    probes = set(AI.multiprobe_buckets(AI.py_bucket(q_vec)))
    idx = {(r["url"], r["chunk_id"]): r["bucket"]
           for r in spark.read.parquet(os.path.join(wh, "ann", "lsh"))
           .select("url", "chunk_id", "bucket").collect()}
    top = exact[0]
    if idx[(top["url"], top["chunk_id"])] in probes:
        assert (ann[0]["url"], ann[0]["chunk_id"]) == \
               (top["url"], top["chunk_id"])
    # every ann hit must come from a probed bucket
    for r in ann:
        assert idx[(r["url"], r["chunk_id"])] in probes
    # mode='ann' on a warehouse WITHOUT an index is an explicit error
    import pytest as _pytest
    os.rename(os.path.join(wh, "ann"), os.path.join(wh, "ann_bak"))
    try:
        with _pytest.raises(FileNotFoundError):
            service.search_warehouse(spark, wh, q, mode="ann", log=False)
    finally:
        os.rename(os.path.join(wh, "ann_bak"), os.path.join(wh, "ann"))


def test_format_search_results_contract():
    """Port of the reference's citation formatting (core/agent.py:56-76):
    empty sentinel, [i] file (p.N, score=X.XX) [h1 > h2] headers with
    basename extraction, '?' for missing pages, blank-line joins."""
    from docling_rag_spark.operators.search import format_search_results

    assert format_search_results([]) == "No relevant documents found."
    out = format_search_results([
        ({"source_file": "/books/dv.pdf", "page_number": 42,
          "headings": ["Ch 2"], "text": "Data Vault uses hubs."}, 0.875),
        ({"source_file": "notes.md", "page_number": None,
          "headings": [], "text": "Second fact."}, 0.5),
    ])
    blocks = out.split("\n\n")
    assert blocks[0] == "[1] dv.pdf (p.42, score=0.88) [Ch 2]\n" \
                        "Data Vault uses hubs."
    assert blocks[1] == "[2] notes.md (p.?, score=0.50)\nSecond fact."
