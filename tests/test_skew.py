"""Host-skew mitigation: url-hash bucketing balances a pathological host
distribution (the north rule's explicit requirement; absent in the
reference, SURVEY.md §4 "Skew handling")."""

from __future__ import annotations

import pandas as pd

from docling_rag_spark.plans.job import bucket_of
from pyspark.sql import functions as F


def test_bucket_balances_hot_host(spark):
    # 90% of urls on one host — the crawl pattern that stalls a
    # host-partitioned layout
    urls = ([f"https://hot.example/p/{i}" for i in range(900)]
            + [f"https://host{i % 37}.example/p/{i}" for i in range(100)])
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    n_buckets = 16
    sizes = (df.withColumn("bucket", bucket_of(F.col("url"), n_buckets))
             .groupBy("bucket").count().collect())
    counts = {r["bucket"]: r["count"] for r in sizes}
    assert len(counts) == n_buckets          # every bucket gets work
    mean = 1000 / n_buckets
    assert max(counts.values()) < 2 * mean   # no bucket owns the hot host
    assert min(counts.values()) > 0.4 * mean


def test_partitions_align_with_buckets(spark):
    """The job's bucket-aligned repartition keeps whole buckets per
    partition (one file per bucket at write time)."""
    urls = [f"https://h{i % 11}.example/{i}" for i in range(500)]
    df = (spark.createDataFrame(pd.DataFrame({"url": urls}))
          .withColumn("bucket", bucket_of(F.col("url"), 16))
          .repartition(16, F.col("bucket")))
    per_part = df.rdd.mapPartitions(
        lambda rows: [len({r["bucket"] for r in rows})]).collect()
    # a partition holds few whole buckets, never a fragment of many
    assert all(n <= 3 for n in per_part)
    assert sum(n > 0 for n in per_part) >= 8
