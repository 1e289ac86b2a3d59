"""Incremental MinHash-LSH band index: delta pairs == batch pairs.

The invariant: candidate pairs from a delta joined against the
materialized band index must EQUAL the batch job's pairs over the whole
corpus restricted to pairs touching the delta — signatures depend only on
each doc's own text, so incremental and batch derivations are the same
function evaluated lazily vs eagerly. Pinned on BOTH join modes
(broadcast delta / bucket-aligned shuffle fallback) and with the group
cap both inert and firing, so the size gate can never drift from the
batch semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from docling_rag_spark.plans.dedup_index import (
    _read_index,
    _touched_members,
    append_band_delta,
    build_band_index,
    incremental_minhash_pairs,
)
from docling_rag_spark.queries.dedup import band_sigs_for, minhash_pairs_for

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text"))


def _split(docs, lo_pct: int, hi_pct: int):
    """Deterministic slice by doc_id percentile bucket (md5-keyed so the
    slices are hash-random, not id-ordered)."""
    bucket = F.abs(F.hash(F.col("doc_id"))) % 100
    return docs.filter((bucket >= lo_pct) & (bucket < hi_pct))


def _pairs_touching(batch_df, delta_ids):
    return sorted(
        tuple(r) for r in batch_df
        .filter(F.col("doc_a").isin(delta_ids)
                | F.col("doc_b").isin(delta_ids))
        .collect())


def test_incremental_equals_batch(spark, tmp_path):
    docs = _docs(spark)
    old = _split(docs, 0, 70)
    delta1 = _split(docs, 70, 90)
    delta2 = _split(docs, 90, 100)
    idx = str(tmp_path / "dedup_idx")

    build_band_index(spark, old, idx)

    # day 1: delta1 vs (old) — broadcast mode (default gate)
    got1 = sorted(tuple(r) for r in
                  incremental_minhash_pairs(spark, delta1, idx).collect())
    batch1 = minhash_pairs_for(old.union(delta1))
    ids1 = [r.doc_id for r in delta1.select("doc_id").collect()]
    assert got1 == _pairs_touching(batch1, ids1)
    assert len(got1) > 0  # the fixture corpus HAS near-dups across slices

    # same delta through the shuffle fallback (gate forced shut): the
    # bucket-aligned join must produce the identical pair set
    got1_smj = sorted(tuple(r) for r in
                      incremental_minhash_pairs(spark, delta1, idx,
                                                broadcast_max_rows=0)
                      .collect())
    assert got1_smj == got1

    # day 2: after appending delta1, delta2 sees old+delta1
    append_band_delta(spark, delta1, idx)
    got2 = sorted(tuple(r) for r in
                  incremental_minhash_pairs(spark, delta2, idx).collect())
    batch2 = minhash_pairs_for(docs)
    ids2 = [r.doc_id for r in delta2.select("doc_id").collect()]
    assert got2 == _pairs_touching(batch2, ids2)


def test_incremental_equals_batch_with_firing_cap(spark, tmp_path):
    """With a cap small enough to fire, the incremental path must degrade
    the SAME buckets to the SAME star edges as the batch path — on both
    join modes. Two synthetic template clusters span the old/delta split:
    cluster A's min-id rep lives in the old corpus (star edges touch the
    delta only through new members), cluster B's rep lives in the DELTA
    (a new min-id re-points every member's star edge — the rep-is-new
    branch)."""
    def _clones(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.lit(f"identical template cluster {tag} page body shared by "
                  "every mirror of the site farm").alias("text"))

    base = _docs(spark)
    # cluster A: rep 9_000_001 in old; cluster B: rep 8_000_001 in delta
    old = (_split(base, 0, 80)
           .union(_clones(9_000_001, 9_000_006, "alpha"))
           .union(_clones(8_000_006, 8_000_011, "beta")))
    delta = (_split(base, 80, 100)
             .union(_clones(9_000_006, 9_000_011, "alpha"))
             .union(_clones(8_000_001, 8_000_006, "beta")))
    idx = str(tmp_path / "dedup_idx")
    build_band_index(spark, old, idx)

    cap = 4  # each 10-doc cluster's buckets fire; small fixture dups don't
    batch = minhash_pairs_for(old.union(delta), group_cap=cap)
    ids = [r.doc_id for r in delta.select("doc_id").collect()]
    want = _pairs_touching(batch, ids)
    uncapped = _pairs_touching(
        minhash_pairs_for(old.union(delta), group_cap=None), ids)
    assert 0 < len(want) < len(uncapped), \
        "cap never fired on the delta slice; lower it"
    for bcast_rows in (4_000_000, 0):
        got = sorted(tuple(r) for r in
                     incremental_minhash_pairs(
                         spark, delta, idx, group_cap=cap,
                         broadcast_max_rows=bcast_rows).collect())
        assert got == want, f"mode broadcast_max_rows={bcast_rows}"


def _fmt_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def _n_exchanges(plan: str) -> int:
    body = plan.split("== Physical Plan ==")[-1].split("(1) ")[0]
    return len(re.findall(r"\bExchange\b", body))


def test_index_semi_join_never_shuffles_corpus(spark, tmp_path):
    """The corpus-sized index side must NEVER shuffle, in either mode:
    broadcast mode plans a map-side BroadcastHashJoin (zero Exchange);
    fallback mode leans on the bucketed table layout, so the ONLY
    Exchange in the semi-join stage is the delta-keys side."""
    docs = _docs(spark)
    idx_dir = str(tmp_path / "dedup_idx")
    build_band_index(spark, _split(docs, 0, 80), idx_dir)
    idx = _read_index(spark, idx_dir)
    dkeys = (band_sigs_for(_split(docs, 80, 100))
             .select("band", "band_sig").distinct())

    bcast = _fmt_plan(spark, _touched_members(idx, dkeys, broadcast=True))
    assert "BroadcastHashJoin" in bcast
    # the only Exchange feeds the broadcast (delta side); none on the scan
    assert "Exchange hashpartitioning" not in bcast

    # at test scale Spark's size estimate would still auto-broadcast the
    # keys; force the production-scale planning path (estimate too big)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj = _fmt_plan(spark, _touched_members(idx, dkeys, broadcast=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "Bucketed: true" in smj
    assert "SortMergeJoin LeftSemi" in smj
    # in the formatted tree the corpus (index) branch is the join's left
    # child — every line of it is prefixed with ':'. The bucketed scan
    # satisfies the join's required distribution for free, so NO Exchange
    # may appear anywhere on that branch; the delta-keys side exchanges.
    tree = smj.split("== Physical Plan ==")[-1].split("(1) ")[0]
    left_branch = [ln for ln in tree.splitlines()
                   if ln.lstrip().startswith(":")]
    assert left_branch, tree
    assert not any("Exchange" in ln for ln in left_branch), tree
    assert any("Exchange" in ln for ln in tree.splitlines()), tree


def test_index_is_bucketed_layout(spark, tmp_path):
    """The physical files must carry Spark bucket ids (the _000NN name
    component) so any later session's DDL re-registration reads them
    pre-partitioned."""
    import os

    docs = _docs(spark)
    idx = str(tmp_path / "dedup_idx")
    path = build_band_index(spark, docs, idx)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert files
    assert all(re.search(r"_\d{5}(\.c\d+)?\.snappy\.parquet$", f)
               or re.search(r"_\d{5}", f) for f in files), files[:5]
