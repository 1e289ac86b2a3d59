#!/usr/bin/env python
"""Deterministically scale the driver's sf0.1 tables 10x into an sf1 set.

Derives strictly from /root/testdata/sf0.1 (no synthesized distributions):
each fact/dim table is unioned 10x with key offsets that preserve every FK
relationship (replica k shifts all synthetic keys by k * KEY_STRIDE on both
sides of each FK). Document text gets a replica-specific word suffix so
replicas are NOT near-duplicates of their source - intra-replica dup/near-
dup structure is preserved, so dedup outputs scale ~linearly instead of
quadratically in replica count. Output: $SPARK_GRAFT_SF1_DIR (default
/root/repo/.benchdata/sf1). Pure column expressions -> byte-deterministic.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.benchdata/sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))
KEY_STRIDE = 10_000_000  # far above any sf0.1 key

# table -> columns shifted by k * KEY_STRIDE (FK-consistent on both sides)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]  # tiny dims referenced by nationkey: as-is


def main() -> int:
    from docling_rag_spark.session import get_spark

    spark = get_spark(app_name="make-sf1")
    os.makedirs(DST, exist_ok=True)
    for t in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in SHIFT_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        # Precondition: every key this script shifts must live below
        # KEY_STRIDE in the SOURCE, or replica offsets collide. This is
        # not hypothetical: pointing SRC at an already-replicated set
        # (sf1 -> "sf10") re-shifts ids that already carry a replica
        # offset, and (j + k) sums alias — a 10-replica pass over a
        # 10-replica source produced 500k rows with only 95k distinct
        # doc_ids, which downstream turned into jaccard denominators of
        # zero. Scale-up must always re-derive from the unshifted base.
        for c in keys:
            mx = base.agg(F.max(c)).first()[0]
            if mx is not None and mx >= KEY_STRIDE:
                raise SystemExit(
                    f"{t}.{c} max {mx} >= KEY_STRIDE {KEY_STRIDE}: "
                    f"SRC {SRC} is already replica-shifted — regenerate "
                    f"from the unshifted base (e.g. /root/testdata/sf0.1)")
        parts = []
        for k in range(REPLICAS):
            rep = base
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(k * KEY_STRIDE))
            if t == "documents" and k > 0:
                # suffix every word with the replica id: all shingles /
                # token hashes change, so replicas are not near-dups of
                # the original (dedup outputs stay ~linear in REPLICAS)
                rep = (rep.withColumn(
                    "text", F.regexp_replace(F.col("text"),
                                             r"([A-Za-z0-9]+)",
                                             rf"$1{k}"))
                       .withColumn("n_chars",
                                   F.length("text").cast("bigint")))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        # Postcondition on the WRITTEN files (also catches a dir mixing
        # part-files from two writes): tables whose first shift key is a
        # primary key must come back duplicate-free.
        if t not in ("lineitem",):   # l_orderkey is a legitimate FK dup
            chk = spark.read.parquet(f"{DST}/{t}.parquet")
            n, nd = chk.agg(F.count(keys[0]),
                            F.countDistinct(keys[0])).first()
            if n != nd:
                raise SystemExit(
                    f"{t}: {n} rows but {nd} distinct {keys[0]} after "
                    f"replication — output is corrupt")
        print(f"{t}: x{REPLICAS}")
    spark.stop()
    print(f"sf1 written to {DST}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
