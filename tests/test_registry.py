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


def test_upsert_duplicate_urls_in_batch_collapse(spark):
    """A batch containing the same url twice must not yield duplicate url
    rows (a real Iceberg MERGE errors on multiple source matches; we
    collapse deterministically instead)."""
    existing = _df(spark, [("u://a", "Old", "Ann", None, ["db"], "en", 3, T0)])
    updates = _df(spark, [
        ("u://a", "New A", None, None, [], "en", 4, T1),
        ("u://a", None, "Bob", "db", [], "en", 5, T1),
        ("u://a", "New A", None, None, [], "en", 4, T1),  # exact dup too
    ])
    out = upsert_documents(existing, updates).collect()
    assert len(out) == 1
    # and the collapse is deterministic: same batch shuffled → same winner
    shuffled = _df(spark, [
        ("u://a", None, "Bob", "db", [], "en", 5, T1),
        ("u://a", "New A", None, None, [], "en", 4, T1),
        ("u://a", "New A", None, None, [], "en", 4, T1),
    ])
    out2 = upsert_documents(existing, shuffled).collect()
    assert out == out2


def test_upsert_coalesce_matrix(spark):
    """Full COALESCE matrix (reference db_registry.py:22-45): every
    (existing, update) null/set combination for scalars, empty/non-empty
    for tags, replayed twice to prove idempotence under conflicting nulls."""
    existing = _df(spark, [
        # url, title(set), author(null), topic(set), tags(set), ...
        ("u://m1", "T1", None, "top1", ["a"], "en", 1, T0),
        ("u://m2", None, "A2", None, [], "en", 2, T0),
    ])
    updates = _df(spark, [
        # m1: update null title (keep), set author (fill), null topic (keep),
        #     empty tags (keep)
        ("u://m1", None, "NewA", None, [], "ru", 9, T1),
        # m2: set title (fill), null author (keep), set topic, non-empty tags
        ("u://m2", "NewT", None, "top2", ["z"], None, None, T1),
    ])
    once = upsert_documents(existing, updates)
    got = {r["url"]: r for r in once.collect()}
    m1, m2 = got["u://m1"], got["u://m2"]
    assert (m1["title"], m1["author"], m1["topic"], m1["tags"]) == \
        ("T1", "NewA", "top1", ["a"])
    assert (m2["title"], m2["author"], m2["topic"], m2["tags"]) == \
        ("NewT", "A2", "top2", ["z"])
    assert m1["added_at"] == T0 and m2["added_at"] == T0
    # replay the same batch against the merged snapshot: fixed point
    twice = upsert_documents(once, updates)
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_bucket_pruned_registry_upsert(spark, tmp_path):
    """Partition-pruned MERGE: only url-hash buckets containing updated
    urls are rewritten; untouched bucket files keep their mtime identity."""
    import os

    from docling_rag_spark.plans.registry import upsert_registry_table

    out = str(tmp_path / "wh")
    seed = _df(spark, [
        (f"u://doc{i}", f"T{i}", None, None, [], "en", i, T0)
        for i in range(40)])
    upsert_registry_table(spark, out, seed, num_buckets=8)
    table_dir = os.path.join(out, "registry")
    before = {d: sorted(os.listdir(os.path.join(table_dir, d)))
              for d in os.listdir(table_dir)}
    mtimes = {d: os.path.getmtime(os.path.join(table_dir, d))
              for d in before}

    # update a single url -> exactly one bucket rewritten
    upd = _df(spark, [("u://doc7", "NewTitle", "Auth", None, [], "en",
                       99, T1)])
    rep = upsert_registry_table(spark, out, upd, num_buckets=8)
    assert len(rep["buckets_rewritten"]) == 1
    touched = f"bucket={rep['buckets_rewritten'][0]}"
    for d, mt in mtimes.items():
        cur = os.path.getmtime(os.path.join(table_dir, d))
        assert (cur != mt) == (d == touched), d

    rows = {r["url"]: r for r in
            spark.read.parquet(table_dir).drop("bucket").collect()}
    assert len(rows) == 40
    assert rows["u://doc7"]["title"] == "NewTitle"
    assert rows["u://doc7"]["n_chunks"] == 99
    assert rows["u://doc7"]["added_at"] == T0      # preserved
    assert rows["u://doc3"]["title"] == "T3"       # untouched bucket intact
