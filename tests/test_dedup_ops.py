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


def _spark_pairs(spark, band_cap, group_cap=None):
    rows = dedup_simhash_pairs(spark, SF_DIR, band_cap=band_cap,
                               group_cap=group_cap).collect()
    return sorted((int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
                  for r in rows)


def test_simhash_blocking_lossless(spark):
    got = _spark_pairs(spark, band_cap=None, group_cap=None)
    want = _duck_pairs(SIMHASH_PAIRS_BRUTE_SQL)
    assert got == want
    assert len(want) > 0, "fixture produced no near-dup pairs; test is vacuous"


def test_simhash_cap_mirrored_when_firing(spark):
    # cap=1 drops every bucket with >1 member, i.e. every candidate source —
    # pick cap=2 so some buckets survive and the drop is partial
    cap = 2
    got = _spark_pairs(spark, band_cap=cap)
    want = _duck_pairs(simhash_pairs_sql(cap, None))
    assert got == want
    brute = _duck_pairs(SIMHASH_PAIRS_BRUTE_SQL)
    assert len(got) < len(brute), \
        "cap never fired at this SF; lower it so the mirror is exercised"


def test_simhash_group_cap_mirrored_when_firing(spark):
    """Over-cap identical-fingerprint groups degrade to star edges through
    the min-id representative on BOTH engines; components are unchanged
    (every member still connects to the rep)."""
    gc = 2  # fixture has identical-fp groups larger than 2
    got = _spark_pairs(spark, band_cap=None, group_cap=gc)
    want = _duck_pairs(simhash_pairs_sql(None, gc))
    assert got == want
    brute = _duck_pairs(SIMHASH_PAIRS_BRUTE_SQL)
    assert 0 < len(got) < len(brute), \
        "group cap never fired at this SF; lower it"
    # component equivalence: star degradation must not split any cluster
    from docling_rag_spark.queries.dedup import _cc_labels
    star_df = dedup_simhash_pairs(spark, SF_DIR, band_cap=None, group_cap=gc)
    full_df = dedup_simhash_pairs(spark, SF_DIR, band_cap=None,
                                  group_cap=None)
    lab_star = {r["node"]: r["label"]
                for r in _cc_labels(star_df.select("doc_a", "doc_b"))
                .collect()}
    lab_full = {r["node"]: r["label"]
                for r in _cc_labels(full_df.select("doc_a", "doc_b"))
                .collect()}
    assert lab_star == lab_full


def test_minhash_group_cap_linear_on_template_cluster(spark):
    """VERDICT r4 task 1: a template cluster of m near-identical docs (the
    dominant dup structure in web crawls) shares all 16 band signatures;
    the uncapped band join emits 16·m²/2 rows from one bucket. With the
    cap, output is m-1 star edges through the min-id rep — O(m), and every
    member is still one hop from the rep (component-equivalent)."""
    from pyspark.sql import functions as F

    from docling_rag_spark.queries.dedup import minhash_pairs_for

    m = 5000
    docs = spark.range(1, m + 1).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate template sentence repeated across "
              "every page of the mirrored site farm").alias("text"))
    rows = minhash_pairs_for(docs, group_cap=100).collect()
    assert len(rows) == m - 1, f"expected O(m) star edges, got {len(rows)}"
    assert all(r["doc_a"] == 1 for r in rows)          # min-id rep
    assert all(r["n_shared_bands"] == 16 for r in rows)
    assert sorted(r["doc_b"] for r in rows) == list(range(2, m + 1))


def test_minhash_group_cap_mirrored_when_firing(spark):
    """With a cap small enough to fire at test SF, Spark and the DuckDB
    twin degrade the SAME buckets to the SAME star edges — and the capped
    pair graph keeps every uncapped component intact."""
    from docling_rag_spark.queries.dedup import (
        _cc_labels, dedup_minhash_pairs, minhash_pairs_for,
        minhash_pairs_sql,
    )
    from pyspark.sql import functions as F

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text"))
    cap = 2
    got = sorted(tuple(int(v) for v in r)
                 for r in minhash_pairs_for(docs, group_cap=cap).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    want = sorted(tuple(int(v) for v in r)
                  for r in con.execute(minhash_pairs_sql(cap)).fetchall())
    uncapped = sorted(
        tuple(int(v) for v in r)
        for r in con.execute(minhash_pairs_sql(None)).fetchall())
    con.close()
    assert got == want
    assert 0 < len(got) < len(uncapped), \
        "group cap never fired at this SF; lower it"
    # component equivalence under the firing cap
    full = minhash_pairs_for(docs, group_cap=None)
    capped = minhash_pairs_for(docs, group_cap=cap)
    lab_full = {r["node"]: r["label"]
                for r in _cc_labels(full.select("doc_a", "doc_b")).collect()}
    lab_cap = {r["node"]: r["label"]
               for r in _cc_labels(capped.select("doc_a", "doc_b")).collect()}
    assert lab_cap == lab_full
    # the uncapped path equals the pre-cap contract (old self-join output)
    got_un = sorted(tuple(int(v) for v in r)
                    for r in minhash_pairs_for(docs, group_cap=None)
                    .collect())
    assert got_un == uncapped


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


# --- recall floors under the caps (VERDICT r3 task 1) -------------------------
# Pinned at sf0.1, the smallest SF where the caps actually engage (at sf0.01
# every bucket/group is under cap and recall is trivially 1.0). Ground
# truths are exact by construction: the uncapped inverted-index jaccard and
# the uncapped pigeonhole join (== brute force, pinned above).

SF01_DIR = "/root/testdata/sf0.1"


def test_minhash_recall_floor_at_advertised_threshold(spark):
    """128-perm/16-band LSH must catch >=0.9 of true pairs at the
    advertised jaccard threshold 0.8 (theory: 1-(1-0.8^8)^16 ~ 0.947)."""
    from docling_rag_spark.queries.dedup import dedup_minhash_recall

    rows = dedup_minhash_recall(spark, SF01_DIR).collect()
    true = sum(r["n_true"] for r in rows if r["jaccard_band"] >= 8)
    caught = sum(r["n_caught"] for r in rows if r["jaccard_band"] >= 8)
    assert true >= 200, f"fixture has too few >=0.8 pairs ({true})"
    assert caught / true >= 0.9, f"LSH recall {caught/true:.4f} < 0.9"


def test_simhash_recall_floor_under_caps(spark):
    """Fingerprint-level banding + the level-2 re-block must hold >=0.95
    recall per hamming distance and >=0.98 aggregate under the production
    caps (r3's doc-level banding measured 0.17-0.26 here)."""
    from docling_rag_spark.queries.dedup import dedup_simhash_recall

    rows = dedup_simhash_recall(spark, SF01_DIR).collect()
    assert rows, "no true pairs at this SF; test is vacuous"
    for r in rows:
        assert r["n_caught"] / r["n_true"] >= 0.95, \
            f"hamming={r['hamming']}: recall {r['n_caught']/r['n_true']:.4f}"
    agg = sum(r["n_caught"] for r in rows) / sum(r["n_true"] for r in rows)
    assert agg >= 0.98, f"aggregate recall {agg:.4f} < 0.98"
    # hamming-0 (identical fingerprints) must be exact: it never touches
    # the banded join at all
    h0 = [r for r in rows if r["hamming"] == 0]
    assert h0 and h0[0]["n_caught"] == h0[0]["n_true"]
