"""Training-data corpus ops: PII scrub mechanics, repetition gates,
boilerplate detection, composed filter semantics (authored fixtures —
the driver-table oracle proves the corpus pass, these prove behavior)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from docling_rag_spark.queries.textstats import (
    pii_scrub_expr,
    text_pii_scrub,
)


def test_pii_redaction_mechanics(spark):
    rows = pd.DataFrame({"text": [
        "contact Bob.Smith+spam@mail-host.example.com today",
        "call 415-555-1234 or 415.555.9876 now",
        "server at 10.0.254.7 responded",
        "mixed: a@b.io then 212-555-0000 then 192.168.1.1 end",
        "clean text with no identifiers at all",
    ]})
    df = spark.createDataFrame(rows).select(
        pii_scrub_expr(F.lower(F.col("text"))).alias("red"))
    got = [r["red"] for r in df.collect()]
    assert got[0] == "contact <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "server at <IP> responded"
    assert got[3] == "mixed: <EMAIL> then <PHONE> then <IP> end"
    assert got[4] == "clean text with no identifiers at all"


def test_pii_scrub_counts_on_corpus(spark):
    # the synthetic corpus is PII-free: every count zero, redaction = noop
    out = text_pii_scrub(spark, "/root/testdata/sf0.001")
    agg = out.agg(F.sum("n_emails"), F.sum("n_phones"),
                  F.sum("n_ips")).first()
    assert tuple(agg) == (0, 0, 0)


def test_repetition_and_filter_semantics(spark):
    from docling_rag_spark.queries.textstats import (
        _FILTER_MAX_TOP_BP, _FILTER_MIN_WORDS)
    # a degenerate doc: one token repeated -> top_token_bp = 10000
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["spam " * 60 + "the a of is it",
                     ("the quick brown fox jumps over a lazy dog and it "
                      "is that good for sure ") * 3,
                     "short doc"],
            "lang": ["en"] * 3, "source": ["t"] * 3,
            "n_chars": [0, 0, 0]})
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        from docling_rag_spark.queries.textstats import (
            corpus_filter, text_repetition)
        rep = {r["doc_id"]: r for r in
               text_repetition(spark, d).collect()}
        assert rep[1]["n_distinct"] == 6
        assert rep[1]["top_token_bp"] == 60 * 10000 // 65
        filt = {r["doc_id"]: r for r in corpus_filter(spark, d).collect()}
        assert filt[1]["reason"] == "repetitive" and filt[1]["keep"] == 0
        assert filt[2]["reason"] == "ok" and filt[2]["keep"] == 1
        assert filt[3]["reason"] == "too_short" and filt[3]["keep"] == 0
        assert rep[1]["top_token_bp"] > _FILTER_MAX_TOP_BP
        assert filt[3]["n_words"] < _FILTER_MIN_WORDS


def test_boilerplate_detection(spark):
    import os
    import tempfile
    boiler = "all rights reserved contact the webmaster"
    with tempfile.TemporaryDirectory() as d:
        texts = [f"unique words alpha{i} beta{i} gamma{i} delta{i} "
                 f"epsilon{i} {boiler}" for i in range(5)]
        texts.append("entirely fresh document with no shared phrasing "
                     "anywhere inside it")
        pdf = pd.DataFrame({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["t"] * len(texts),
            "n_chars": [0] * len(texts)})
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        from docling_rag_spark.queries.textstats import corpus_boilerplate
        out = {r["doc_id"]: r for r in
               corpus_boilerplate(spark, d).collect()}
        # the shared tail is flagged in every doc that carries it
        assert all(out[i]["n_boiler"] > 0 for i in range(5))
        assert out[5]["n_boiler"] == 0 and out[5]["boiler_bp"] == 0
