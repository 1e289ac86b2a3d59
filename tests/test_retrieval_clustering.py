"""Semantic unit tests for the retrieval / clustering / LM-quality /
unicode-clean tiers beyond the oracle-parity hash (test_oracle_parity.py
covers Spark≡DuckDB; these pin the SEMANTICS on authored inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.queries.clustering import (
    vec_kmeans_assign,
    vec_semdedup_drop,
)
from docling_rag_spark.queries.retrieval import (
    _BM25_TERMS,
    search_hybrid_rrf,
    text_bm25_topk,
)
from docling_rag_spark.queries.textstats import text_lm_score
from docling_rag_spark.queries.webops import clean_unicode

SF_DIR = "/root/testdata/sf0.01"


# --- BM25 ----------------------------------------------------------------------

def test_bm25_ranks_matching_docs_first(spark):
    top = text_bm25_topk(spark, SF_DIR).toPandas()
    assert len(top) == 10
    # scores strictly positive and non-increasing
    assert (top.score_e4 > 0).all()
    assert list(top.score_e4) == sorted(top.score_e4, reverse=True)
    # every top doc must actually contain at least one query term
    ids = [int(i) for i in top.doc_id]
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "text").collect())
    for r in docs:
        assert any(t in r["text"] for t in _BM25_TERMS), r["doc_id"]


def test_bm25_rare_term_outweighs_common(spark):
    """A doc containing the rare term 'dup' (df=25/500) must outrank docs
    with only common terms: idf('dup') dominates. The entire top-10 should
    contain 'dup' given tf>=1 for it scores ~4x a common-term hit."""
    top = text_bm25_topk(spark, SF_DIR).toPandas()
    ids = [int(i) for i in top.doc_id]
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id").isin(ids)).collect())
    n_dup = sum("dup" in r["text"].split() for r in docs)
    assert n_dup == len(docs), f"only {n_dup}/{len(docs)} top docs have 'dup'"


# --- hybrid RRF ----------------------------------------------------------------

def test_rrf_fusion_math(spark):
    out = search_hybrid_rrf(spark, SF_DIR).toPandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        want = 0
        if r.r_vec > 0:
            want += 1000000000 // (60 + int(r.r_vec))
        if r.r_bm25 > 0:
            want += 1000000000 // (60 + int(r.r_bm25))
        assert int(r.rrf_e9) == want
    # a doc ranked by both systems beats one ranked by a single system at
    # similar depth: top hit must be dual-ranked if any dual-ranked exists
    dual = out[(out.r_vec > 0) & (out.r_bm25 > 0)]
    if len(dual):
        assert int(out.iloc[0].rrf_e9) >= int(dual.rrf_e9.max())


# --- k-means -------------------------------------------------------------------

def test_kmeans_covers_all_vectors_once(spark):
    a = vec_kmeans_assign(spark, SF_DIR).toPandas()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(a) == n
    assert a.vec_id.is_unique
    # cluster ids are the k smallest vec_ids (seeds); derive k from the
    # fixture size so resizing sf0.01 doesn't fail this for the wrong reason
    from docling_rag_spark.queries.clustering import _k_for
    assert set(a.cluster) <= set(range(_k_for(n)))
    # no degenerate clustering: every cluster non-trivial on this data
    sizes = a.groupby("cluster").size()
    assert (sizes > 10).all(), sizes.to_dict()


def test_kmeans_update_reduces_distance(spark):
    """Lloyd's guarantee: mean distance after (assign, update, re-assign)
    <= distance of the initial seed assignment."""
    from docling_rag_spark.queries.clustering import (
        _assign, _quantized, _update,
    )
    q = _quantized(spark, SF_DIR)
    seeds = q.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [int(v) for v in r["qv"]], 1) for r in seeds]
    a1 = _assign(q, cents)
    d1 = a1.agg(F.sum("dist")).collect()[0][0]
    a2 = _assign(q, _update(a1))
    d2 = a2.agg(F.sum("dist")).collect()[0][0]
    assert d2 <= d1


def test_semdedup_drops_are_within_cluster_keep_first(spark):
    a = vec_kmeans_assign(spark, SF_DIR).toPandas().set_index("vec_id")
    d = vec_semdedup_drop(spark, SF_DIR).toPandas()
    assert len(d) > 0
    for _, r in d.iterrows():
        assert r.kept_by < r.drop_id  # keep-first: survivor has lower id
        assert a.loc[int(r.kept_by)].cluster == r.cluster
        assert a.loc[int(r.drop_id)].cluster == r.cluster


# --- trigram LM ----------------------------------------------------------------

def test_lm_scores_in_vocab_text_above_junk(spark):
    """Text from the corpus vocabulary must score higher (less negative)
    than out-of-distribution junk under the corpus-trained LM."""
    import duckdb  # noqa: F401  (documents view not needed; use builder)
    out = text_lm_score(spark, SF_DIR).toPandas().set_index("doc_id")
    assert len(out) == 500
    assert set(out.ppl_bucket) <= {"head", "middle", "tail"}
    # every doc has >= 1 trigram and a negative avg logprob
    assert (out.n_tri > 0).all()
    assert (out.avg_lp_e6 < 0).all()
    # the bucket boundaries actually separate scores
    if {"middle", "tail"} <= set(out.ppl_bucket):
        assert (out[out.ppl_bucket == "middle"].avg_lp_e6.min()
                > out[out.ppl_bucket == "tail"].avg_lp_e6.max())


# --- unicode clean -------------------------------------------------------------

UNICODE_CASES = [
    ("\u201cquoted\u201d", '"quoted"'),
    ("\u2018single\u2019", "'single'"),
    ("a \u2013 b \u2014 c", "a - b - c"),
    ("nb\u00a0sp", "nb sp"),
    ("zero\u200bwidth\u200c\u200d gone\ufeff", "zerowidth gone"),
    ("soft\u00adhyphen", "softhyphen"),
    ("wait\u2026", "wait..."),
    ("  collapse   spaces  ", "collapse spaces"),
    ("plain ascii stays", "plain ascii stays"),
]


@pytest.mark.parametrize("raw,want", UNICODE_CASES)
def test_clean_unicode_cases(spark, raw, want):
    got = (spark.range(1)
           .select(clean_unicode(F.lit(raw)).alias("c"))
           .collect()[0]["c"])
    assert got == want
