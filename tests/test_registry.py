"""Registry upsert contracts (reference db_registry.py:22-45 + metadata
normalization core/metadata.py:65-83)."""

from __future__ import annotations

import datetime as dt


from docling_rag_spark.plans.registry import upsert_documents

SCHEMA = ("url string, title string, author string, topic string, "
          "tags array<string>, lang string, n_chunks bigint, "
          "added_at timestamp")

T0 = dt.datetime(2026, 1, 1)
T1 = dt.datetime(2026, 2, 2)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_coalesce_and_insert(spark):
    existing = _df(spark, [
        ("u://a", "Old Title", "Ann", "db", ["db"], "en", 3, T0),
    ])
    updates = _df(spark, [
        # matched: new title NULLish → keep old; author set → replace
        ("u://a", "  null ", "Bob", None, [], "en", 5, T1),
        # not matched: plain insert
        ("u://b", "Fresh", None, "food", ["Cooking"], "en", 2, T1),
    ])
    got = {r["url"]: r for r in
           upsert_documents(existing, updates).collect()}
    a = got["u://a"]
    assert a["title"] == "Old Title"       # nullish new → keep old
    assert a["author"] == "Bob"            # non-null new wins
    assert a["topic"] == "db"              # NULL new → keep old
    assert a["tags"] == ["db"]             # empty new tags → keep old
    assert a["n_chunks"] == 5
    assert a["added_at"] == T0             # preserved from first insert
    b = got["u://b"]
    assert b["title"] == "Fresh" and b["tags"] == ["cooking"]
    assert b["added_at"] == T1


def test_upsert_tag_normalization_cap(spark):
    existing = _df(spark, [])
    updates = _df(spark, [
        ("u://c", "T", None, None,
         [" DB ", "db", "None", "x1", "x2", "x3", "x4", "x5"],
         "en", 1, T1),
    ])
    row = upsert_documents(existing, updates).collect()[0]
    # lowercase+trim, dedupe, drop nullish, cap at 5, order-stable
    assert row["tags"] == ["db", "x1", "x2", "x3", "x4"]


def test_upsert_idempotent(spark):
    existing = _df(spark, [("u://a", "T", "A", "db", ["db"], "en", 3, T0)])
    updates = _df(spark, [("u://a", "T2", None, None, [], "en", 4, T1)])
    once = upsert_documents(existing, updates)
    twice = upsert_documents(once, updates)
    assert sorted(once.collect()) == sorted(twice.collect())
