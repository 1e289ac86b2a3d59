"""SimHash blocking properties that the driver gate can't see.

Two complementary guarantees (ADVICE r2 — the cap must be mirrored, but the
losslessness proof must survive the mirroring):

1. With the cap DISABLED, the banded (pigeonhole-blocked) join recovers
   EXACTLY the brute-force hamming-ball pair set — the blocking loses no
   pair.
2. With a cap small enough to actually fire at test SF, Spark and the
   mirrored DuckDB SQL drop the SAME pairs — so the registry's capped
   query/oracle twins agree at every SF, not only ones where the cap is
   inert.
"""

from __future__ import annotations

import duckdb

from docling_rag_spark.queries.dedup import (
    SIMHASH_PAIRS_BRUTE_SQL,
    dedup_simhash_pairs,
    simhash_pairs_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck_pairs(sql):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    rows = con.execute(sql).fetchall()
    con.close()
    return sorted((int(a), int(b), int(h)) for a, b, h in rows)


def _spark_pairs(spark, band_cap):
    rows = dedup_simhash_pairs(spark, SF_DIR, band_cap=band_cap).collect()
    return sorted((int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
                  for r in rows)


def test_simhash_blocking_lossless(spark):
    got = _spark_pairs(spark, band_cap=None)
    want = _duck_pairs(SIMHASH_PAIRS_BRUTE_SQL)
    assert got == want
    assert len(want) > 0, "fixture produced no near-dup pairs; test is vacuous"


def test_simhash_cap_mirrored_when_firing(spark):
    # cap=1 drops every bucket with >1 member, i.e. every candidate source —
    # pick cap=2 so some buckets survive and the drop is partial
    cap = 2
    got = _spark_pairs(spark, band_cap=cap)
    want = _duck_pairs(simhash_pairs_sql(cap))
    assert got == want
    brute = _duck_pairs(SIMHASH_PAIRS_BRUTE_SQL)
    assert len(got) < len(brute), \
        "cap never fired at this SF; lower it so the mirror is exercised"


def test_component_labels_transitive(spark):
    """Min-label propagation must close chains transitively: A-B, B-C, C-D
    is ONE component labeled by its minimum id, even though A and D never
    share a pair — exactly what the pair queries alone cannot express."""
    from docling_rag_spark.queries.dedup import _cc_labels

    pairs = spark.createDataFrame(
        [(7, 2), (2, 9), (9, 4),        # chain: component 2
         (20, 21),                      # isolated pair: component 20
         (30, 31), (31, 30)],           # duplicate/reversed edges collapse
        "doc_a long, doc_b long")
    got = {r["node"]: r["label"] for r in _cc_labels(pairs).collect()}
    assert got == {7: 2, 2: 2, 9: 2, 4: 2,
                   20: 20, 21: 20,
                   30: 30, 31: 30}
