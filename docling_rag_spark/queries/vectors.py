"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

  vec_topk_cosine      — exact brute-force cosine top-k (O1 semantics: the
                         reference's pgvector `ORDER BY embedding <=> q
                         LIMIT k`, db_storage.py:134-146; exact-scan spec =
                         tests/fakes.py:61-63). Spark plan:
                         TakeOrderedAndProject — no full sort, no shuffle of
                         the data, only top-k per partition then merge.
  vec_neardup_cosine   — embedding-cosine near-duplicate pairs.
  vec_lsh_bucketed     — the scale path: 8 signed random hyperplanes (md5-
                         derived, portable) bucket every vector; search only
                         scans the query's bucket. At 100 TB the bucket id
                         is the partition key, so a query touches one
                         partition instead of all of them.

Dot products fold left-to-right with ``F.aggregate`` (deterministic FP
order, mirrored by DuckDB ``list_reduce``); scores ship as floor-scaled
BIGINT micro-units so engine round() tie-semantics can't diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_TOPK = 10
_NEARDUP_MIN_E6 = 990000  # cosine 0.99, floor-scaled to micro-units
_NUM_PLANES = 8
_QUERY_VEC_ID = 0


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


# DuckDB: fold dot product sequentially to mirror F.aggregate's order
def _dot_sql(a, b):
    return (f"list_reduce(list_transform(range(1, 65), "
            f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)")


def _norm_sql(a):
    return (f"sqrt(list_reduce(list_transform(range(1, 65), "
            f"i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))")


# --- exact top-k -------------------------------------------------------------

def vec_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
         .select(F.col("embedding").alias("q_emb")))
    cos = F.floor(_dot(F.col("embedding"), F.col("q_emb"))
                  / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
                  * 1000000.0).cast("bigint")
    return (emb.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != _QUERY_VEC_ID)
            .select(F.col("vec_id").cast("bigint").alias("vec_id"),
                    F.col("label").cast("int").alias("label"),
                    cos.alias("score_e6"))
            .orderBy(F.desc("score_e6"), F.asc("vec_id")).limit(_TOPK))


TOPK_SQL = f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings
           WHERE vec_id = {_QUERY_VEC_ID})
SELECT e.vec_id::BIGINT AS vec_id, e.label::INT AS label,
       floor({_dot_sql('e.embedding', 'q.q_emb')}
             / ({_norm_sql('e.embedding')} * {_norm_sql('q.q_emb')})
             * 1000000.0)::BIGINT AS score_e6
FROM embeddings e CROSS JOIN q
WHERE e.vec_id != {_QUERY_VEC_ID}
ORDER BY score_e6 DESC, vec_id ASC LIMIT {_TOPK}
"""


# --- near-duplicate pairs ----------------------------------------------------

def vec_neardup_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "embedding", _norm(F.col("embedding")).alias("nrm"))
    a = emb.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("emb_a"),
                   F.col("nrm").alias("nrm_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("emb_b"),
                   F.col("nrm").alias("nrm_b"))
    cos = F.floor(_dot(F.col("emb_a"), F.col("emb_b"))
                  / (F.col("nrm_a") * F.col("nrm_b")) * 1000000.0
                  ).cast("bigint")
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
            .withColumn("score_e6", cos)
            .filter(F.col("score_e6") >= _NEARDUP_MIN_E6)
            .select("vec_a", "vec_b", "score_e6"))


NEARDUP_SQL = f"""
SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
       floor({_dot_sql('a.embedding', 'b.embedding')}
             / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')})
             * 1000000.0)::BIGINT AS score_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor({_dot_sql('a.embedding', 'b.embedding')}
            / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')})
            * 1000000.0) >= {_NEARDUP_MIN_E6}
"""


# --- LSH-bucketed ANN --------------------------------------------------------
# hyperplane component v(j, i) = ((md5-hex60("j_i") % 1001) - 500) / 500.0
# bucket(e) = Σ_j [dot(e, v_j) > 0] · 2^j   — deterministic, portable.

def _plane_component(j, i):
    key = F.concat_ws("_", j.cast("string"), i.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return ((h % 1001) - 500).cast("double") / 500.0


def _bucket(emb_col):
    def plane_dot(j):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(63)), F.lit(0.0),
            lambda acc, i: acc + F.element_at(emb_col, i + 1).cast("double")
            * _plane_component(j, i))
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(_NUM_PLANES - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, j: acc + F.when(plane_dot(j) > 0,
                                    F.pow(F.lit(2.0), j).cast("bigint"))
                             .otherwise(F.lit(0).cast("bigint")))


_BUCKET_SQL = """
  list_reduce(list_transform(range(0, {np}), j -> CASE WHEN
    list_reduce(list_transform(range(0, 64), i ->
      {e}[i + 1]::DOUBLE *
      ((('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15))::BIGINT
        % 1001 - 500) / 500.0)), (x, y) -> x + y) > 0
    THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y)
"""


def vec_lsh_bucketed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding",
        _bucket(F.col("embedding")).alias("bucket"))
    q = (emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
         .select(F.col("embedding").alias("q_emb"),
                 F.col("bucket").alias("q_bucket")))
    cos = F.floor(_dot(F.col("embedding"), F.col("q_emb"))
                  / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
                  * 1000000.0).cast("bigint")
    return (emb.join(F.broadcast(q), emb.bucket == q.q_bucket)
            .filter(F.col("vec_id") != _QUERY_VEC_ID)
            .select("vec_id", F.col("bucket").cast("bigint").alias("bucket"),
                    cos.alias("score_e6"))
            .orderBy(F.desc("score_e6"), F.asc("vec_id")).limit(_TOPK))


LSH_SQL = f"""
WITH bucketed AS (
  SELECT vec_id::BIGINT AS vec_id, embedding,
         {_BUCKET_SQL.format(np=_NUM_PLANES, e='embedding')} AS bucket
  FROM embeddings
), q AS (
  SELECT embedding AS q_emb, bucket AS q_bucket FROM bucketed
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT e.vec_id, e.bucket::BIGINT AS bucket,
       floor({_dot_sql('e.embedding', 'q.q_emb')}
             / ({_norm_sql('e.embedding')} * {_norm_sql('q.q_emb')})
             * 1000000.0)::BIGINT AS score_e6
FROM bucketed e JOIN q ON e.bucket = q.q_bucket
WHERE e.vec_id != {_QUERY_VEC_ID}
ORDER BY score_e6 DESC, vec_id ASC LIMIT {_TOPK}
"""


QUERIES = {
    "vec_topk_cosine": (vec_topk_cosine, TOPK_SQL),
    "vec_neardup_cosine": (vec_neardup_cosine, NEARDUP_SQL),
    "vec_lsh_bucketed": (vec_lsh_bucketed, LSH_SQL),
}
