"""Embedding-space clustering for corpus curation (SemDeDup-shape).

SemDeDup (Abbas et al. 2023) prunes web corpora by k-means-clustering
document embeddings, then removing near-duplicates *within* each cluster —
the clustering bounds the quadratic so no all-pairs join ever happens.
These two operators add that tier:

- ``vec_kmeans_assign`` — Lloyd's k-means (k=4, seeds = the k smallest
  vec_ids, one update round, final re-assignment). Embeddings are
  quantized to e4-scaled BIGINTs up front, so centroid sums are EXACT
  integers (order-independent across engines) and every distance is a
  deterministic IEEE-double fold over identical expressions — bit-equal
  in Spark and DuckDB with no float aggregation anywhere. Spark plan per
  round: broadcast the k centroid vectors as a literal matrix (collected
  driver-side: k×64 ints), map-only argmin assignment, ONE groupBy
  shuffle of 64 per-dim F.sum partials for the update — no posexplode
  row blow-up, no N×k join. At 100 TB each round is one map pass plus
  one tree-aggregated shuffle; the eager loop is diameter-bounded by the
  fixed round count, like dedup_components.

- ``vec_semdedup_drop`` — within-cluster near-duplicate removal: inside
  each final cluster, a vector is DROPPED when a smaller-id vector in
  the same cluster has quantized-cosine >= the threshold (keep-first
  canonicalization, mirroring dedup_keep_first). The pairwise join is
  per-cluster only — the SemDeDup trick: with real-scale k (~100k
  clusters for 10^12 docs) clusters stay small, so the quadratic is
  bounded per cluster while the global plan is a single equi-join on
  cluster id. Cosine runs over the SAME e4-quantized vectors, so both
  engines fold identical doubles.

Both are DIAGNOSTICS (driver window full at 50) with full DuckDB
oracles; the SQL twins re-derive the same two Lloyd rounds from scratch
as unrolled CTEs — the Spark side's collected centroid literals are an
*execution* strategy, not an input, so the hash match proves the whole
iterative computation equivalent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_K = 4
_SCALE = 10000.0
_DIM = 64
_SEMDEDUP_MIN_E6 = 300000  # quantized-cosine keep-first threshold


def _t(spark: SparkSession, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _quantized(spark, sf_dir):
    """(vec_id BIGINT, qv array<BIGINT>) — e4 floor-scaled embeddings."""
    return _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(_SCALE))
            .cast("bigint")).alias("qv"))


def _dist_to(cent_sums, cent_n):
    """Deterministic sequential fold of squared distance from the row's
    ``qv`` to one centroid given as (per-dim BIGINT sums, member count).
    Expression order mirrors the SQL twin exactly: per dim,
    diff = qv[i]::double - (s[i]::double / n::double); acc + diff*diff."""
    lit_s = F.array(*[F.lit(int(s)) for s in cent_sums])
    n = F.lit(int(cent_n)).cast("double")
    sq = F.zip_with(
        F.col("qv"), lit_s,
        lambda x, s: (x.cast("double") - s.cast("double") / n)
        * (x.cast("double") - s.cast("double") / n))
    return F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)


def _assign(q, cents):
    """Add (cluster, dist) via argmin over the literal centroid matrix;
    ties break to the lower cluster id (strict < on already-seen best)."""
    cluster, best = F.lit(int(cents[0][0])), _dist_to(*cents[0][1:])
    for cid, s, n in cents[1:]:
        d = _dist_to(s, n)
        cluster = F.when(d < best, F.lit(int(cid))).otherwise(cluster)
        best = F.when(d < best, d).otherwise(best)
    return q.select("vec_id", "qv",
                    cluster.cast("bigint").alias("cluster"),
                    best.alias("dist"))


def _update(assigned):
    """Collect per-cluster (per-dim sums, count) — 64 F.sum partials in
    ONE groupBy (map-side combined), k rows to the driver."""
    rows = (assigned.groupBy("cluster")
            .agg(F.count("*").alias("n"),
                 *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                   for i in range(_DIM)])
            .collect())
    return sorted((int(r["cluster"]),
                   [int(r[f"s{i}"]) for i in range(_DIM)], int(r["n"]))
                  for r in rows)


def _final_assignment(spark, sf_dir):
    q = _quantized(spark, sf_dir)
    seeds = (q.filter(F.col("vec_id") < _K)
             .orderBy("vec_id").collect())
    cents = [(int(r["vec_id"]), [int(v) for v in r["qv"]], 1)
             for r in seeds]
    a1 = _assign(q, cents)           # round 1: assign to seeds
    cents = _update(a1)              # round 1: recompute centroids
    return _assign(q, cents)         # round 2: final assignment


def vec_kmeans_assign(spark, sf_dir):
    return (_final_assignment(spark, sf_dir)
            .select("vec_id", "cluster",
                    F.floor(F.col("dist") * F.lit(1000000.0))
                    .cast("bigint").alias("dist_e6")))


def vec_semdedup_drop(spark, sf_dir):
    a = _final_assignment(spark, sf_dir).select("vec_id", "qv", "cluster")
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("qv"), lambda x:
                    x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    a = a.withColumn("nrm", nrm)
    lo = a.select(F.col("cluster").alias("c"),
                  F.col("vec_id").alias("keep_id"),
                  F.col("qv").alias("qv_a"), F.col("nrm").alias("nrm_a"))
    hi = a.select(F.col("cluster").alias("c"),
                  F.col("vec_id").alias("drop_id"),
                  F.col("qv").alias("qv_b"), F.col("nrm").alias("nrm_b"))
    cos = F.floor(
        F.aggregate(F.zip_with(F.col("qv_a"), F.col("qv_b"),
                               lambda x, y: x.cast("double")
                               * y.cast("double")),
                    F.lit(0.0), lambda acc, v: acc + v)
        / (F.col("nrm_a") * F.col("nrm_b")) * F.lit(1000000.0)
    ).cast("bigint")
    return (lo.join(hi, "c")
            .filter(F.col("keep_id") < F.col("drop_id"))
            .select(F.col("c").alias("cluster"), "keep_id", "drop_id",
                    cos.alias("cos_e6"))
            .filter(F.col("cos_e6") >= _SEMDEDUP_MIN_E6)
            .groupBy("cluster", "drop_id")
            .agg(F.min("keep_id").cast("bigint").alias("kept_by"),
                 F.max("cos_e6").cast("bigint").alias("max_cos_e6")))


# --- DuckDB twins: the same two Lloyd rounds as unrolled CTEs ----------------

def _kmeans_cte():
    dist = """list_reduce(list_transform(range(1, {d1}),
                i -> (q.qv[i]::DOUBLE - (c.s[i]::DOUBLE / c.n::DOUBLE))
                     * (q.qv[i]::DOUBLE - (c.s[i]::DOUBLE / c.n::DOUBLE))),
                (a, b) -> a + b)""".format(d1=_DIM + 1)
    return f"""
q AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * {_SCALE})::BIGINT) AS qv
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cluster, qv AS s, 1::BIGINT AS n
  FROM q WHERE vec_id < {_K}),
d1 AS (
  SELECT q.vec_id, q.qv, c.cluster, {dist} AS dist,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {dist} ASC, c.cluster ASC) AS rn
  FROM q CROSS JOIN c0 c),
a1 AS (SELECT vec_id, qv, cluster FROM d1 WHERE rn = 1),
c1 AS (
  SELECT cluster, list(sd ORDER BY i) AS s, any_value(cnt) AS n
  FROM (SELECT a1.cluster, t.i,
               sum(a1.qv[t.i])::BIGINT AS sd, count(*)::BIGINT AS cnt
        FROM a1 CROSS JOIN range(1, {_DIM + 1}) t(i)
        GROUP BY a1.cluster, t.i)
  GROUP BY cluster),
d2 AS (
  SELECT q.vec_id, q.qv, c.cluster, {dist} AS dist,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {dist} ASC, c.cluster ASC) AS rn
  FROM q CROSS JOIN c1 c),
a2 AS (SELECT vec_id, qv, cluster, dist FROM d2 WHERE rn = 1)
"""


KMEANS_SQL = f"""
WITH {_kmeans_cte()}
SELECT vec_id, cluster::BIGINT AS cluster,
       floor(dist * 1000000.0)::BIGINT AS dist_e6
FROM a2 ORDER BY vec_id
"""


SEMDEDUP_SQL = f"""
WITH {_kmeans_cte()},
nq AS (
  SELECT vec_id, qv, cluster,
         sqrt(list_reduce(list_transform(range(1, {_DIM + 1}),
              i -> qv[i]::DOUBLE * qv[i]::DOUBLE), (a, b) -> a + b)) AS nrm
  FROM a2),
pairs AS (
  SELECT a.cluster, a.vec_id AS keep_id, b.vec_id AS drop_id,
         floor(list_reduce(list_transform(range(1, {_DIM + 1}),
                 i -> a.qv[i]::DOUBLE * b.qv[i]::DOUBLE), (x, y) -> x + y)
               / (a.nrm * b.nrm) * 1000000.0)::BIGINT AS cos_e6
  FROM nq a JOIN nq b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
SELECT cluster::BIGINT AS cluster, drop_id::BIGINT AS drop_id,
       min(keep_id)::BIGINT AS kept_by, max(cos_e6)::BIGINT AS max_cos_e6
FROM pairs WHERE cos_e6 >= {_SEMDEDUP_MIN_E6}
GROUP BY cluster, drop_id ORDER BY drop_id
"""


QUERIES: dict = {}

DIAGNOSTICS = {
    "vec_kmeans_assign": (vec_kmeans_assign, KMEANS_SQL),
    "vec_semdedup_drop": (vec_semdedup_drop, SEMDEDUP_SQL),
}
