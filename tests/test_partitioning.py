"""Murmur3-preimage bucket routing (functions/partitioning.py).

The routing is an optimization contract, not a correctness one (the staged
write re-groups by the bucket COLUMN either way), but a silent drift between
the Python murmur3 and Spark's HashPartitioning would quietly reintroduce
the straggler packing the router exists to remove — so parity is pinned."""

import pytest
from pyspark.sql import functions as F

from docling_rag_spark.functions.partitioning import (
    bucket_route,
    murmur3_int32,
    partition_preimages,
)


def test_murmur3_matches_spark_hash(spark):
    """Python murmur3_int32 == F.hash(int32) (seed 42), incl. negatives."""
    xs = [0, 1, 2, 41, 42, 255, 256, 1 << 20, -1, -123456,
          2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    got = {r["x"]: r["h"]
           for r in df.select("x", F.hash("x").alias("h")).collect()}
    for x in xs:
        assert got[x] == murmur3_int32(x), f"mismatch at {x}"


@pytest.mark.parametrize("n", [1, 7, 32, 256])
def test_preimages_cover_all_partitions(n):
    pre = partition_preimages(n)
    assert len(pre) == n
    assert sorted(murmur3_int32(x) % n for x in pre) == list(range(n))


def test_bucket_route_one_bucket_per_partition(spark):
    """repartition(n, bucket_route(...)) -> every partition holds exactly
    one bucket, every bucket its own partition (the property that makes
    the staged partitionBy write emit one file per bucket)."""
    num_buckets = 32
    batch = list(range(num_buckets))
    df = (spark.range(4000)
          .withColumn("bucket",
                      F.pmod(F.xxhash64("id"), F.lit(num_buckets))
                      .cast("int")))
    routed = df.repartition(len(batch),
                            bucket_route(F.col("bucket"), batch, num_buckets))
    per_part = (routed
                .withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(F.countDistinct("bucket").alias("nb"))
                .collect())
    assert len(per_part) == num_buckets          # no empty/missing slots
    assert all(r["nb"] == 1 for r in per_part)   # no stacking


def test_bucket_route_subset_batch(spark):
    """A resume-style batch (subset of buckets) still gets one bucket per
    partition across len(batch) partitions."""
    num_buckets = 64
    batch = [3, 17, 21, 40, 63]
    df = (spark.range(2000)
          .withColumn("bucket",
                      F.pmod(F.xxhash64("id"), F.lit(num_buckets))
                      .cast("int"))
          .filter(F.col("bucket").isin(batch)))
    routed = df.repartition(len(batch),
                            bucket_route(F.col("bucket"), batch, num_buckets))
    per_part = (routed
                .withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(F.countDistinct("bucket").alias("nb"))
                .collect())
    assert len(per_part) == len(batch)
    assert all(r["nb"] == 1 for r in per_part)


def test_route_repartition_one_bucket_per_partition(spark):
    """The shared rewrite helper (delete/registry/fold sites) must place
    each active bucket alone in its own shuffle partition — same property
    as raw bucket_route, via the list-only signature those sites have."""
    from docling_rag_spark.functions.partitioning import route_repartition

    buckets = [1, 5, 9, 12]
    df = (spark.range(1000)
          .withColumn("bucket",
                      F.pmod(F.xxhash64("id"), F.lit(16)).cast("int"))
          .filter(F.col("bucket").isin(buckets)))
    per_part = (route_repartition(df, buckets)
                .withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(F.countDistinct("bucket").alias("nb"))
                .collect())
    assert len(per_part) == len(buckets)
    assert all(r["nb"] == 1 for r in per_part)
