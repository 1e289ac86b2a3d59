"""Semantic unit tests for queries/webops.py beyond the oracle-parity hash
(tests/test_oracle_parity.py covers Spark≡DuckDB; these pin the SEMANTICS).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.queries.webops import (
    canonicalize_url,
    corpus_span_dedup,
    events_asof_join,
    url_canonical_cap,
)

SF_DIR = "/root/testdata/sf0.001"


# --- URL canonicalization -----------------------------------------------------

URL_CASES = [
    # (raw, expected canonical)
    ("HTTPS://WWW.Example.COM:443/A/b?id=1#frag",
     "https://example.com/A/b?id=1"),
    ("http://Host.EXAMPLE:80/x", "http://host.example/x"),
    ("https://example.com/p?utm_source=a&utm_medium=b",
     "https://example.com/p"),
    ("https://example.com/p?utm_source=a&id=2&utm_medium=b",
     "https://example.com/p?id=2"),
    ("https://example.com/p?id=2&fbclid=xyz", "https://example.com/p?id=2"),
    ("https://example.com/p?gclid=1&id=2", "https://example.com/p?id=2"),
    # path is case-preserved; only scheme+host lowercase
    ("HTTP://A.B/CaseSensitive/Path", "http://a.b/CaseSensitive/Path"),
    # :443 on http is NOT a default port — kept
    ("http://a.b:443/x", "http://a.b:443/x"),
    # :8080 is never stripped
    ("https://a.b:8080/x?utm_x=1", "https://a.b:8080/x"),
    # www. stripped only as a host prefix
    ("https://www.a.b/www.c", "https://a.b/www.c"),
    ("https://example.com/just/path", "https://example.com/just/path"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["url"])
    got = [r[0] for r in
           df.select(canonicalize_url(F.col("url"))).collect()]
    for (raw, want), g in zip(URL_CASES, got):
        assert g == want, f"{raw} -> {g}, want {want}"


def test_canonicalize_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — a canonical form is a fixed point."""
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("u"))
    twice = once.select(canonicalize_url(F.col("u")).alias("u"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


def test_host_cap_keeps_first_n(spark):
    rows = url_canonical_cap(spark, SF_DIR).collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) > 1
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["doc_id"])
        for i, r in enumerate(rs):
            assert r["kept"] == (i < 5), (host, i)


# --- as-of join ----------------------------------------------------------------

def test_asof_matches_bruteforce(spark):
    """The union-marker window must agree with a brute-force 'latest click
    at-or-before each view' computed in plain Python, including NULL click
    values (row presence wins the match, not value presence)."""
    t = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    events = [
        # (event_id, ts, user_id, type, value)
        (1, t + 0 * s, 1, "click", 10.0),
        (2, t + 4 * s, 1, "view", None),     # matches click@0
        (3, t + 5 * s, 1, "click", 20.0),    # tie ts with view 4
        (4, t + 5 * s, 1, "view", None),     # inclusive: matches click@5
        (5, t + 9 * s, 1, "click", None),    # NULL-valued click
        (6, t + 10 * s, 1, "view", None),    # matches click@9, value NULL
        (7, t + 1 * s, 2, "view", None),     # no prior click -> NULLs
        (8, t + 2 * s, 2, "click", 7.0),
        (9, t + 3 * s, 2, "view", None),     # matches click@2
    ]
    df = spark.createDataFrame(
        [(e, ts, u, k, v, "{}") for e, ts, u, k, v in events],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r["event_id"]: (r["asof_value"], r["age_secs"])
               for r in events_asof_join(spark, d).collect()}
    assert got[2] == (10.0, 4)
    assert got[4] == (20.0, 0)      # inclusive tie
    assert got[6] == (None, 1)      # NULL-valued click still matched
    assert got[7] == (None, None)   # nothing before
    assert got[9] == (7.0, 1)
    assert len(got) == 4 + 1        # every view row present exactly once


# --- corpus span dedup ----------------------------------------------------------

def test_span_dedup_invariants(spark):
    rows = corpus_span_dedup(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_spans"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept <= total
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_spans"]
        assert len(r["dedup_md5"]) == 32


def test_span_dedup_keeps_first_occurrence(spark):
    """Two docs sharing a 4-token span: the lower doc_id keeps it, the
    higher loses exactly that span; unique docs keep everything."""
    import hashlib
    import tempfile
    docs = [
        (0, "aa bb cc dd ee ff gg hh", "en", "s", 1),
        (1, "aa bb cc dd zz yy xx ww", "en", "s", 1),  # span 0 dups doc 0
        (2, "qq rr ss tt uu vv", "en", "s", 1),        # all unique
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r for r in
               corpus_span_dedup(spark, d).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[0]["n_kept"] == 2 and got[0]["dedup_md5"] == \
        md5("aa bb cc dd ee ff gg hh")
    assert got[1]["n_kept"] == 1 and got[1]["dedup_md5"] == \
        md5("zz yy xx ww")
    assert got[2]["n_kept"] == 2 and got[2]["dedup_md5"] == \
        md5("qq rr ss tt uu vv")
