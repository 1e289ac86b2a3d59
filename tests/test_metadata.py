"""Deterministic metadata extraction (X8 stand-in) + registry round trip."""

from __future__ import annotations

from docling_rag_spark.operators.metadata import extract_metadata
from docling_rag_spark.plans.registry import normalize_updates


def _extracted(spark):
    rows = [
        ("u://a", "Star Schemas",
         "Star schema star schema fact dimension fact tables the of and"),
        ("u://b/guide.md", None,
         "Pasta pasta pasta sauce sauce garlic basil water the a of"),
        ("u://c", "Empty Doc", ""),
    ]
    return spark.createDataFrame(
        rows, "url string, title string, extracted_text string")


def test_extract_metadata_contract(spark):
    got = {r["url"]: r for r in
           extract_metadata(_extracted(spark)).collect()}
    a = got["u://a"]
    assert a["title"] == "Star Schemas"
    # top tokens by frequency (star/schema/fact all ×2), ties alphabetical;
    # stopwords dropped
    assert a["tags"][:3] == ["fact", "schema", "star"]
    assert a["topic"] == a["tags"][0]
    assert a["author"] is None
    b = got["u://b/guide.md"]
    assert b["title"] == "guide"            # stub title = url stem
    assert b["tags"][0] == "pasta"
    c = got["u://c"]
    assert c["tags"] == [] and c["topic"] is None


def test_metadata_deterministic(spark):
    df = _extracted(spark)
    r1 = sorted(map(str, extract_metadata(df).collect()))
    r2 = sorted(map(str, extract_metadata(df).collect()))
    assert r1 == r2


def test_metadata_feeds_registry_normalization(spark):
    meta = extract_metadata(_extracted(spark))
    norm = normalize_updates(meta.withColumnRenamed("extracted_text", "x")
                             if "extracted_text" in meta.columns else meta)
    rows = {r["url"]: r for r in norm.collect()}
    assert all(len(r["tags"]) <= 5 for r in rows.values())
