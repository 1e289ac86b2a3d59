"""Deduplication operators over ``documents`` — the training-data-pipeline
core: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing is md5-based so the DuckDB oracle reproduces Spark bit-for-bit
(Spark ``xxhash64``/``hash`` are not portable). Everything is JVM-side
DataFrame ops — no Python UDFs.

Scale design (100 TB):
- exact: single shuffle on the 128-bit content hash; map-side combine.
- minhash: shingle explode is map-only; the signature agg shuffles once on
  doc_id (16 perms folded per doc); the LSH band join shuffles on
  (band, signature) — the whole point of banding is that this join key is
  high-cardinality and uniform, so no skew. Candidate pairs (not full
  pairwise) are the only quadratic term and banding bounds them.
- simhash: map-only fingerprint per doc + one shuffle on doc_id; the pair
  scan blocks by pigeonhole banding — split the 48-bit fingerprint into
  hamming_max+1 = 7 segments; any pair within hamming 6 agrees on ≥1 whole
  segment, so an equi-join on (band, band_val) + exact hamming filter +
  distinct is EXACTLY the brute-force result, at ~N·7/2^7 rows per bucket
  instead of N²/2 comparisons. The DuckDB oracle deliberately stays
  brute-force: it independently proves the blocked plan loses no pair.
  A per-bucket cap (default 1000, off at test SFs) bounds pathological
  band values at 10^12-doc scale; drops are observable via
  ``dedup_simhash_band_stats``.
- jaccard: candidate generation via shared-shingle equi-join (no cross
  join); per-pair intersection counts come out of the join's groupBy.
  Shingles with document frequency > 64 are dropped from BOTH the
  intersection and the size terms (jaccard over discriminative shingles):
  one stop-shingle in k docs would otherwise make a k² join blowup. The
  oracle SQL applies the identical cap; ``dedup_shingle_df_stats`` exposes
  how much was dropped (the production job logs that row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_P = 2147483647          # Mersenne prime 2^31-1 for the minhash permutations
_NUM_PERMS = 16
_BAND_SIZE = 4           # 4 bands × 4 rows
_SHINGLE_K = 3           # 3-word shingles
_SIMHASH_BITS = 48       # ≤53 so pow(2, bit) stays exact in doubles
_WORD_RE = "[a-z0-9]+"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(col):
    return F.regexp_extract_all(F.lower(col), F.lit(_WORD_RE), 0)


def _hex60(col):
    """Portable 60-bit integer hash of a string (md5-prefix based)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


_HEX60_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def content_hash_col(col):
    """Canonical content hash: whitespace-collapsed lowercase md5 — ONE
    definition shared by every exact-dedup variant AND the streaming
    ingest bridge (a drifted copy would silently split their hash
    spaces)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))


_content_hash = content_hash_col


_CONTENT_HASH_SQL = ("md5(regexp_replace(trim(lower({x})), '\\s+', ' ', 'g'))")


def _shingles(toks, k=_SHINGLE_K):
    """Word-k-gram shingles from an ALREADY-MATERIALIZED token-array
    column. Callers must project the token array in a prior select
    (``_exploded_shingles``): passing the regexp expression directly
    embeds it inside this lambda's closure, where Catalyst re-evaluates
    the full-text regexp once PER SHINGLE POSITION — measured 7x slower
    at sf0.1 (4.4 s vs 0.65 s for the exploded scan)."""
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " ")))


def _exploded_shingles(docs):
    """(doc_id, sh) — the one shared shingle scan shape."""
    return (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        _tokens(F.col("text")).alias("toks"))
            .select("doc_id", F.explode(_shingles(F.col("toks"))).alias("sh")))


_SHINGLES_SQL = """
  list_distinct(list_transform(
    range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - {km1}, 1) + 1),
    i -> array_to_string(list_slice(
           regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + {km1}), ' ')))
""".format(km1=_SHINGLE_K - 1)


# --- exact dedup -------------------------------------------------------------

def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        _content_hash(F.col("text")).alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.count("*").cast("bigint").alias("n_copies"),
                 F.min("doc_id").cast("bigint").alias("keeper_doc_id")))


DEDUP_EXACT_SQL = f"""
SELECT {_CONTENT_HASH_SQL.format(x='text')} AS content_hash,
       count(*)::BIGINT AS n_copies,
       min(doc_id)::BIGINT AS keeper_doc_id
FROM documents GROUP BY 1
"""


# --- n-gram Jaccard ----------------------------------------------------------

_JACCARD_MIN_BP = 500  # 0.05 in basis points (floor-scaled, engine-stable)
_JACCARD_DF_CAP = 64   # shingles in > CAP docs are non-discriminative: drop


# capped-shingle CTE body (portable: IN-subquery, not SEMI JOIN syntax).
# Shingles travel as 60-bit md5-prefix ints on both engines, so the join /
# grouping keys are 8 bytes and any hash collision reproduces identically.
_CAPPED_SH_CTES = f"""
sh0 AS (
  SELECT doc_id, {_HEX60_SQL.format(x='sh')} AS sh FROM (
    SELECT doc_id::BIGINT AS doc_id, unnest({_SHINGLES_SQL}) AS sh
    FROM documents)
), sh AS (
  SELECT doc_id, sh FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh
               HAVING count(*) <= {_JACCARD_DF_CAP})
)"""


def dedup_ngram_jaccard(spark, sf_dir):
    """Inverted-index jaccard: ONE pass computes shingles (the expensive
    regexp explode), ONE shuffle groups them into per-shingle posting
    lists; the DF cap is just ``size(list) <= CAP`` on the aggregate, and
    candidate pairs are generated map-side from each posting list (≤
    CAP·(CAP-1)/2 per shingle, a hard bound). A naive shingle self-join
    recomputes the explode per join side and shuffles every shingle row
    twice — this shape does neither.

    The posting table is persisted: three consumers read it (pair
    generation plus BOTH sides of the size join) and without the persist
    each re-runs the regexp explode + posting shuffle — measured 3x the
    scan cost at sf1 (9.9 s vs 4.3 s). At 100 TB the persisted table is
    the distinct-shingle set (8-byte key + ≤CAP ids), far smaller than
    re-reading and re-tokenizing the corpus per consumer."""
    from pyspark import StorageLevel
    docs = _t(spark, sf_dir, "documents")
    sh = _exploded_shingles(docs).select(
        "doc_id", _hex60(F.col("sh")).alias("sh"))
    posting = (sh.groupBy("sh")
               .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
               .filter(F.size("ds") <= _JACCARD_DF_CAP)
               .persist(StorageLevel.MEMORY_AND_DISK))
    # Materialize the cache EAGERLY: inside a single downstream job the
    # three consumer stages run concurrently and race to compute uncached
    # partitions redundantly (measured: lazy persist saved ~1 s of the 7 s
    # triple-compute; the eager count saves all of it).
    posting.count()
    # per-doc capped shingle counts, derived from the (small) posting table
    sizes = (posting.select(F.explode("ds").alias("doc_id"))
             .groupBy("doc_id")
             .agg(F.count("*").cast("bigint").alias("n_sh")))
    pair_lists = posting.filter(F.size("ds") >= 2).select(
        F.explode(F.flatten(F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2),
                        F.greatest(F.size(F.col("ds")) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))))))
        .alias("p"))
    shared = (pair_lists.groupBy(F.col("p.doc_a").alias("doc_a"),
                                 F.col("p.doc_b").alias("doc_b"))
              .agg(F.count("*").cast("bigint").alias("shared")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (shared.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard_bp", F.floor(
                F.col("shared") * F.lit(10000.0)
                / (F.col("n_a") + F.col("n_b") - F.col("shared")))
                .cast("bigint"))
            .filter(F.col("jaccard_bp") >= _JACCARD_MIN_BP)
            .select("doc_a", "doc_b", "shared", "jaccard_bp"))


DEDUP_JACCARD_SQL = f"""
WITH {_CAPPED_SH_CTES}, sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared,
       floor(shared * 10000.0 / (sa.n_sh + sb.n_sh - shared))::BIGINT
         AS jaccard_bp
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor(shared * 10000.0 / (sa.n_sh + sb.n_sh - shared)) >= {_JACCARD_MIN_BP}
"""


def dedup_shingle_df_stats(spark, sf_dir):
    """The 'logged drop count' for the DF cap: how many distinct shingles /
    exploded rows the cap removed. The production job materializes this one
    row next to the pair output so recall loss is observable, not silent."""
    docs = _t(spark, sf_dir, "documents")
    sh = _exploded_shingles(docs)
    df = sh.groupBy("sh").agg(F.count("*").alias("df"))
    return df.agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum((F.col("df") > _JACCARD_DF_CAP).cast("bigint"))
         .cast("bigint").alias("n_shingles_dropped"),
        F.sum(F.when(F.col("df") > _JACCARD_DF_CAP, F.col("df"))
               .otherwise(F.lit(0))).cast("bigint").alias("n_rows_dropped"),
        F.max("df").cast("bigint").alias("max_df"))


SHINGLE_DF_STATS_SQL = f"""
WITH sh AS (
  SELECT doc_id::BIGINT AS doc_id, unnest({_SHINGLES_SQL}) AS sh
  FROM documents
), df AS (
  SELECT sh, count(*)::BIGINT AS df FROM sh GROUP BY sh
)
SELECT count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN df > {_JACCARD_DF_CAP} THEN 1 ELSE 0 END)::BIGINT
         AS n_shingles_dropped,
       sum(CASE WHEN df > {_JACCARD_DF_CAP} THEN df ELSE 0 END)::BIGINT
         AS n_rows_dropped,
       max(df)::BIGINT AS max_df
FROM df
"""


# --- MinHash signatures + LSH band candidates --------------------------------
# permutation i: ((a_i * (h % p)) + b_i) % p  with arithmetically derived
# a_i, b_i (no literal tables; same formula on both engines).
#   a_i = (1103515245 * (i + 1) + 12345) % p   (odd LCG multiplier family)
#   b_i = (69069 * (i + 1) + 1) % p

_PERM_A = [(1103515245 * (i + 1) + 12345) % _P for i in range(_NUM_PERMS)]
_PERM_B = [(69069 * (i + 1) + 1) % _P for i in range(_NUM_PERMS)]


def minhash_sig_for(docs):
    """One wide agg (16 min() columns, map-side combined) instead of a 16×
    row blowup: the shuffle carries 16 partial mins per doc, not 16 copies
    of every shingle. ``stack`` unpivots the tiny per-doc result to the
    long (doc_id, perm_id, minhash) contract. ``docs`` is any
    (doc_id bigint, text) DataFrame — the warehouse curation job feeds
    dense-id'd extracted rows through the same machinery the oracle
    checks."""
    sh = _exploded_shingles(docs).withColumn("h", _hex60(F.col("sh")) % _P)
    aggs = [F.min((F.lit(_PERM_A[i]) * F.col("h") + F.lit(_PERM_B[i])) % _P)
            .cast("bigint").alias(f"m{i}") for i in range(_NUM_PERMS)]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{i}, m{i}" for i in range(_NUM_PERMS))
    return (wide.selectExpr(
        "doc_id", f"stack({_NUM_PERMS}, {stack}) AS (perm_id, minhash)")
        .select("doc_id", F.col("perm_id").cast("int").alias("perm_id"),
                F.col("minhash").cast("bigint").alias("minhash")))


def _minhash_sig(spark, sf_dir):
    return minhash_sig_for(_t(spark, sf_dir, "documents"))


def dedup_minhash_sig(spark, sf_dir):
    return _minhash_sig(spark, sf_dir)


MINHASH_SIG_SQL = f"""
WITH sh AS (
  SELECT doc_id::BIGINT AS doc_id, unnest({_SHINGLES_SQL}) AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, {_HEX60_SQL.format(x='sh')} % {_P} AS h FROM sh
), perms AS (
  SELECT i::INT AS perm_id,
         (1103515245 * (i + 1) + 12345) % {_P} AS pa,
         (69069 * (i + 1) + 1) % {_P} AS pb
  FROM range({_NUM_PERMS}) t(i)
)
SELECT doc_id, perm_id,
       min((pa * h + pb) % {_P})::BIGINT AS minhash
FROM hashed CROSS JOIN perms
GROUP BY doc_id, perm_id
"""


def minhash_pairs_for(docs):
    """LSH candidate pairs for any (doc_id bigint, text) DataFrame."""
    sig = minhash_sig_for(docs)
    bands = (sig.withColumn("band", (F.col("perm_id") / _BAND_SIZE)
                            .cast("int"))
             .groupBy("doc_id", "band")
             .agg(F.md5(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("perm_id", "minhash"))),
                     lambda s: s["minhash"].cast("string")), "_"))
                 .alias("band_sig")))
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_sig") == F.col("b.band_sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").cast("bigint").alias("n_shared_bands")))


def dedup_minhash_pairs(spark, sf_dir):
    return minhash_pairs_for(_t(spark, sf_dir, "documents"))


MINHASH_PAIRS_SQL = f"""
WITH sig AS ({MINHASH_SIG_SQL}),
bands AS (
  SELECT doc_id, (perm_id // {_BAND_SIZE})::INT AS band,
         md5(string_agg(minhash::VARCHAR, '_' ORDER BY perm_id)) AS band_sig
  FROM sig GROUP BY doc_id, (perm_id // {_BAND_SIZE})::INT
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*)::BIGINT AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
            AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# --- SimHash -----------------------------------------------------------------

def dedup_simhash(spark, sf_dir):
    """One wide agg (48 signed-sum columns) instead of a 48× bit-explode:
    the shuffle carries 48 partial balances per doc. The fingerprint folds
    the balances with exact integer powers of two."""
    docs = _t(spark, sf_dir, "documents")
    toks = (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        F.explode(F.array_distinct(_tokens(F.col("text"))))
                         .alias("tok"))
            .withColumn("h", _hex60(F.col("tok"))))
    aggs = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                         1).otherwise(-1)).alias(f"b{b}")
            for b in range(_SIMHASH_BITS)]
    bal = toks.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("bigint")
    for b in range(_SIMHASH_BITS):
        fp = fp + F.when(F.col(f"b{b}") > 0,
                         F.lit(1 << b).cast("bigint")) \
                   .otherwise(F.lit(0).cast("bigint"))
    return bal.select("doc_id", fp.alias("simhash"))


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
           AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, {_HEX60_SQL.format(x='tok')} AS h FROM toks
), bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS bal
  FROM hashed CROSS JOIN (SELECT i::INT AS bit
                          FROM range({_SIMHASH_BITS}) t(i))
  GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN bal > 0 THEN pow(2.0, bit) ELSE 0.0 END) AS BIGINT)
         AS simhash
FROM bits GROUP BY doc_id
"""


_SIMHASH_MAX_HAMMING = 6
_SIMHASH_N_BANDS = _SIMHASH_MAX_HAMMING + 1   # pigeonhole: ≥1 clean band
_SIMHASH_BAND_CAP = 1000  # max docs per (band, band_val) bucket at scale


def _simhash_bands(fp):
    """Explode each fingerprint into its 7 pigeonhole segments
    (6 bands × 7 bits + 1 band × 6 bits = 48). Any pair within hamming 6
    shares at least one unchanged segment, so the (band, band_val)
    equi-join has perfect recall over the hamming ball."""
    width = (_SIMHASH_BITS + _SIMHASH_N_BANDS - 1) // _SIMHASH_N_BANDS
    segs = []
    for b in range(_SIMHASH_N_BANDS):
        lo = b * width
        bits = min(width, _SIMHASH_BITS - lo)
        segs.append(F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), lo)
             .bitwiseAND(F.lit((1 << bits) - 1)).alias("band_val")))
    return (fp.select("doc_id", "simhash",
                      F.explode(F.array(*segs)).alias("seg"))
            .select("doc_id", "simhash",
                    F.col("seg.band").alias("band"),
                    F.col("seg.band_val").alias("band_val")))


def dedup_simhash_pairs(spark, sf_dir, band_cap: int | None = _SIMHASH_BAND_CAP):
    """Banded (pigeonhole-blocked) hamming join. With ``band_cap=None`` the
    pair set is EXACTLY brute force (pigeonhole guarantees ≥1 shared clean
    segment within hamming 6) — ``tests/test_dedup_ops.py`` pins that
    equivalence against the uncapped brute-force SQL. With a cap, degenerate
    (band, band_val) buckets larger than the cap are excluded from candidate
    generation to bound the per-bucket quadratic term at 10^12 docs; the
    oracle SQL mirrors the cap IDENTICALLY (same semantics as the jaccard
    ``_JACCARD_DF_CAP`` mirror), so Spark and DuckDB drop the same pairs at
    any SF and the correctness gate cannot spuriously mismatch. Drops stay
    observable via ``dedup_simhash_band_stats``."""
    fp = dedup_simhash(spark, sf_dir)
    bands = _simhash_bands(fp)
    if band_cap is not None:
        sizes = (bands.groupBy("band", "band_val")
                 .agg(F.count("*").alias("n"))
                 .filter(F.col("n") <= band_cap)
                 .select("band", "band_val"))
        bands = bands.join(F.broadcast(sizes), ["band", "band_val"],
                           "left_semi")
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.bit_count(F.col("a.simhash")
                                .bitwiseXOR(F.col("b.simhash")))
                    .cast("bigint").alias("hamming"))
            .filter(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
            .distinct())


# Brute-force twin (no blocking at all): the independent proof that the
# banded join with the cap DISABLED loses no pair (pytest-pinned).
SIMHASH_PAIRS_BRUTE_SQL = f"""
WITH fp AS ({SIMHASH_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
"""


def simhash_pairs_sql(band_cap: int | None = _SIMHASH_BAND_CAP) -> str:
    """DuckDB twin of ``dedup_simhash_pairs`` at the same ``band_cap`` —
    the cap is mirrored on both sides (like ``_JACCARD_DF_CAP``) so the
    hash compare holds at every SF, including ones where buckets overflow
    the cap. ``band_cap=None`` degenerates to the brute-force twin."""
    if band_cap is None:
        return SIMHASH_PAIRS_BRUTE_SQL
    w = (_SIMHASH_BITS + _SIMHASH_N_BANDS - 1) // _SIMHASH_N_BANDS
    return f"""
WITH fp AS ({SIMHASH_SQL}),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {w}))
           & ((1::BIGINT << least({w}, {_SIMHASH_BITS} - b.band * {w})) - 1)
           AS band_val
  FROM fp CROSS JOIN (SELECT i::INT AS band
                      FROM range({_SIMHASH_N_BANDS}) t(i)) b
), ok AS (
  SELECT band, band_val FROM bands
  GROUP BY band, band_val HAVING count(*) <= {band_cap}
), kept AS (
  SELECT bands.* FROM bands JOIN ok USING (band, band_val)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM kept a JOIN kept b USING (band, band_val)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
"""


SIMHASH_PAIRS_SQL = simhash_pairs_sql(_SIMHASH_BAND_CAP)


def dedup_simhash_band_stats(spark, sf_dir):
    """Bucket-size distribution of the pigeonhole blocking: candidate-pair
    work is sum(n·(n-1)/2) over buckets — this row is the scale evidence
    that the banded join's quadratic term stays bounded."""
    fp = dedup_simhash(spark, sf_dir)
    sizes = _simhash_bands(fp).groupBy("band", "band_val") \
        .agg(F.count("*").alias("n"))
    return sizes.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
         .alias("candidate_pairs"),
        F.sum((F.col("n") > _SIMHASH_BAND_CAP).cast("bigint"))
         .cast("bigint").alias("n_buckets_capped"))


_SIMHASH_BAND_W = (_SIMHASH_BITS + _SIMHASH_N_BANDS - 1) // _SIMHASH_N_BANDS

SIMHASH_BAND_STATS_SQL = f"""
WITH fp AS ({SIMHASH_SQL}),
bands AS (
  SELECT doc_id, b.band,
         (simhash >> (b.band * {_SIMHASH_BAND_W}))
           & ((1::BIGINT << least({_SIMHASH_BAND_W},
                {_SIMHASH_BITS} - b.band * {_SIMHASH_BAND_W})) - 1)
           AS band_val
  FROM fp CROSS JOIN (SELECT i::INT AS band
                      FROM range({_SIMHASH_N_BANDS}) t(i)) b
), sizes AS (
  SELECT band, band_val, count(*)::BIGINT AS n FROM bands GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_buckets,
       max(n)::BIGINT AS max_bucket,
       CAST(sum(n * (n - 1) / 2.0) AS BIGINT) AS candidate_pairs,
       sum(CASE WHEN n > {_SIMHASH_BAND_CAP} THEN 1 ELSE 0 END)::BIGINT
         AS n_buckets_capped
FROM sizes
"""




def dedup_keep_first(spark, sf_dir):
    """Materialize the dedup survivor set: one row per content hash, the
    lowest doc_id wins (window filter — the DELETE-duplicates shape a
    training-data pipeline actually runs; pairs/groups queries above are
    the diagnostics)."""
    from pyspark.sql import Window
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        "source",
                        _content_hash(F.col("text")).alias("content_hash"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "source", "content_hash"))


DEDUP_KEEP_FIRST_SQL = f"""
SELECT doc_id::BIGINT AS doc_id, source,
       {_CONTENT_HASH_SQL.format(x='text')} AS content_hash
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY {_CONTENT_HASH_SQL.format(x='text')}
  ORDER BY doc_id) = 1
"""


# --- connected components over dup pairs ------------------------------------

_CC_MAX_ITERS = 25


def _cc_labels(pairs):
    """(node, label) for every node in ``pairs`` — label = the minimum
    doc_id reachable through the undirected pair graph (the component's
    canonical id), via iterative min-label propagation.

    Scale design: each pass is ONE equi-join of edges against labels plus
    a groupBy — both shuffle on node id, no quadratic term anywhere.
    Passes needed = graph diameter; near-dup clusters are shallow
    (near-cliques from banding), so this converges in a handful of
    passes. A 10^12-doc run with adversarial chain-shaped components
    would swap in the large-star/small-star variant (same join shapes,
    O(log n) passes). ``localCheckpoint`` truncates the per-pass lineage
    growth that would otherwise blow up the plan; the convergence check
    (changed-label count) is a driver-side scalar, not a collect."""
    edges = pairs.select(F.col("doc_a").cast("bigint").alias("u"),
                         F.col("doc_b").cast("bigint").alias("v"))
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    # seed with min(self, direct neighbors): one groupBy (replacing the
    # plain distinct() init at the same shuffle count) and clusters of
    # diameter <= 2 — the common near-dup shape — converge a full
    # propagation pass earlier
    labels = (edges.groupBy("u").agg(F.min("v").alias("nb_min"))
              .select(F.col("u").alias("node"),
                      F.least(F.col("u"), F.col("nb_min")).alias("label"))
              .localCheckpoint())
    # labels are monotonically non-increasing, so the label sum is a
    # fixpoint witness: unchanged sum == no label moved (cheaper than a
    # join-and-count convergence probe — one agg scalar per pass)
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(_CC_MAX_ITERS):
        nb = (edges.join(labels.select(F.col("node").alias("v"),
                                       F.col("label").alias("v_label")), "v")
              .groupBy("u").agg(F.min("v_label").alias("nb_min")))
        labels = (labels.join(nb.select(F.col("u").alias("node"), "nb_min"),
                              "node", "left")
                  .select("node",
                          F.least(F.col("label"),
                                  F.coalesce(F.col("nb_min"), F.col("label")))
                          .alias("label"))
                  .localCheckpoint())
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"component labels did not converge in {_CC_MAX_ITERS} passes — "
        "component diameter exceeds the propagation bound; use the "
        "star-contraction variant for this graph")


def dedup_components(spark, sf_dir, pairs=None):
    """Transitive dup clusters: connected components over the MinHash-LSH
    candidate pairs. Every document gets its component's canonical
    (minimum) doc_id — pair lists say "A resembles B"; this is the step a
    training-data pipeline actually acts on (keep one doc per component).
    Singletons are their own component; ``is_canonical=1`` marks the
    survivor row of each cluster."""
    if pairs is None:
        pairs = dedup_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = _cc_labels(pairs)
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"))
    comp = F.coalesce(F.col("label"), F.col("doc_id"))
    return (docs.join(labels.withColumnRenamed("node", "doc_id"),
                      "doc_id", "left")
            .select("doc_id",
                    comp.cast("bigint").alias("component"),
                    F.when(comp == F.col("doc_id"), 1).otherwise(0)
                    .cast("bigint").alias("is_canonical")))


# The oracle computes the same components independently: full reachability
# closure via a recursive CTE (min over every reachable node == min-label
# fixpoint), deliberately NOT mirroring the Spark iteration.
DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT doc_a AS u, doc_b AS v FROM ({MINHASH_PAIRS_SQL}) p
  UNION
  SELECT doc_b, doc_a FROM ({MINHASH_PAIRS_SQL}) p
), walk(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
), comp AS (
  SELECT u AS doc_id, least(u, min(v)) AS component FROM walk GROUP BY u
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(c.component, d.doc_id)::BIGINT AS component,
       (CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
             THEN 1 ELSE 0 END)::BIGINT AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_keep_first": (dedup_keep_first, DEDUP_KEEP_FIRST_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_simhash_band_stats": (dedup_simhash_band_stats,
                                 SIMHASH_BAND_STATS_SQL),
    "dedup_minhash_sig": (dedup_minhash_sig, MINHASH_SIG_SQL),
    "dedup_minhash_pairs": (dedup_minhash_pairs, MINHASH_PAIRS_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, SIMHASH_PAIRS_SQL),
}

# Driver-window hygiene: the fingerprint query is strictly upstream of
# dedup_simhash_pairs (SIMHASH_SQL is a CTE of the pairs oracle, so the
# fingerprints stay fully oracle-verified through the pairs + band-stats
# rows); it remains bench-/pytest-visible here.
DIAGNOSTICS = {
    "dedup_simhash": (dedup_simhash, SIMHASH_SQL),
    # jaccard blocking observability (driver window holds its pattern twin
    # dedup_simhash_band_stats; this one stays pytest-/bench-visible)
    "dedup_shingle_df_stats": (dedup_shingle_df_stats, SHINGLE_DF_STATS_SQL),
    # transitive closure of the pair lists — lives here (not in the
    # 50-entry driver window) but is oracle-verified by the local parity
    # suite against an independent recursive-CTE closure
    "dedup_components": (dedup_components, DEDUP_COMPONENTS_SQL),
}
