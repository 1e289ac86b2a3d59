"""Text-analysis operators for a training-data pipeline over ``documents``.

  text_token_count — whitespace tokens + BPE-ish subword piece count
                     (deterministic: ceil(len/8) pieces per word, digit runs
                     and punctuation marks one token each; mirrors the
                     engine's from-scratch counter, functions/tokens.py)
  text_quality     — length / punctuation-ratio / stopword-ratio / mean word
                     length quality score
  text_lang_id     — stopword-hit n-gram heuristic language ID with a
                     deterministic priority tiebreak
  text_fingerprint — document fingerprint: md5 of the normalized text plus a
                     min-sampled 8-gram rolling fingerprint (winnowing-style)

All expressions are JVM-side built-ins (no Python UDFs): at 100 TB these run
inside whole-stage codegen with the parquet scan pruned to (doc_id, text).
The rolling fingerprint explodes character windows; its scale path is the
same expression fused into the scan projection — still no shuffle (the only
shuffle in this file is the final groupBy doc_id of text_fingerprint, which
AQE coalesces; at cluster scale it is a map-side-combined min()).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_WORD_RE = "[a-z0-9]+"

# tiny embedded stopword lists; deterministic heuristic, not a model
_STOP = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "que"),
}


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(col):
    return F.regexp_extract_all(F.lower(col), F.lit(_WORD_RE), 0)


# --- token counting ----------------------------------------------------------

def text_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # BPE-ish: every word contributes ceil(len/8) pieces
    pieces = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(8.0)).cast("bigint"))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?()\[\]{}\"'`]", ""))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_words"),
        (pieces + punct.cast("bigint")).alias("n_tokens"))


TOKEN_COUNT_SQL = r"""
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_words,
       (COALESCE(list_sum(list_transform(
                    regexp_extract_all(lower(text), '[a-z0-9]+'),
                    w -> CAST(ceil(length(w) / 8.0) AS BIGINT))), 0)
        + length(regexp_replace(text, '[^.,;:!?()\[\]{}"''`]', '', 'g')))::BIGINT
         AS n_tokens
FROM documents
"""


# --- quality scoring ---------------------------------------------------------

def text_quality(spark, sf_dir):
    """Ratios ship as floor-scaled BIGINTs (basis points / centi-chars):
    ``round()`` half-tie semantics differ between Spark (HALF_UP on the
    double) and DuckDB, but ``floor`` of the *identically-ordered* double
    expression is engine-stable."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(toks).cast("bigint")
    word_chars = F.aggregate(toks, F.lit(0).cast("bigint"),
                             lambda a, w: a + F.length(w).cast("bigint"))
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*_STOP["en"])))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    wn = F.greatest(n_words, F.lit(1))
    avg_word_len = word_chars / wn
    stop_ratio = stop_hits / wn
    score = (F.least(n_words / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
             + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
             + F.when((avg_word_len >= 3) & (avg_word_len <= 10), F.lit(1.0))
                .otherwise(F.lit(0.0)) * F.lit(0.3))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        n_chars.alias("n_chars_measured"), n_words.alias("n_words"),
        F.floor(avg_word_len * 100).cast("bigint").alias("avg_word_len_c"),
        F.floor(stop_ratio * 10000).cast("bigint").alias("stop_ratio_bp"),
        F.floor(punct / F.greatest(n_chars, F.lit(1)) * 10000).cast("bigint")
         .alias("punct_ratio_bp"),
        F.floor(score * 10000).cast("bigint").alias("quality_score_bp"))


QUALITY_SQL = """
WITH base AS (
  SELECT doc_id, text,
         length(text)::BIGINT AS n_chars_measured,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
  FROM documents
), m AS (
  SELECT doc_id, n_chars_measured, punct,
         len(toks)::BIGINT AS n_words,
         COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
           / greatest(len(toks), 1) AS avg_word_len,
         len(list_filter(toks, w -> w IN ('the','a','of','and','to',
               'in','is','that','it','for')))
           / greatest(len(toks), 1) AS stop_ratio
  FROM base
)
SELECT doc_id::BIGINT AS doc_id, n_chars_measured, n_words,
       floor(avg_word_len * 100)::BIGINT AS avg_word_len_c,
       floor(stop_ratio * 10000)::BIGINT AS stop_ratio_bp,
       floor(punct / greatest(n_chars_measured, 1) * 10000)::BIGINT
         AS punct_ratio_bp,
       floor((least(n_words / 50.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + (CASE WHEN avg_word_len >= 3 AND avg_word_len <= 10
                     THEN 1.0 ELSE 0.0 END) * 0.3) * 10000)::BIGINT
         AS quality_score_bp
FROM m
"""


# --- language ID -------------------------------------------------------------

def text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    def _hit_counter(stops):
        # closure factory: a default-arg lambda would read as 2-ary to
        # PySpark's higher-order-function arity sniffing
        return F.size(F.filter(toks, lambda w: w.isin(*stops))).cast("bigint")

    hits = {lang: _hit_counter(stops) for lang, stops in _STOP.items()}
    # deterministic argmax: priority order en > de > fr > es on ties,
    # 'und' (undetermined) when no stopword hits at all
    pred = (F.when(sum(hits.values()) == 0, F.lit("und"))
            .when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"])
                  & (hits["en"] >= hits["es"]), F.lit("en"))
            .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]),
                  F.lit("de"))
            .when(hits["fr"] >= hits["es"], F.lit("fr"))
            .otherwise(F.lit("es")))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        hits["en"].alias("hits_en"), hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"), hits["es"].alias("hits_es"),
        pred.alias("predicted_lang"), F.col("lang").alias("declared_lang"))


LANG_ID_SQL = """
WITH h AS (
  SELECT doc_id, lang,
    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        w -> w IN ('the','a','of','and','to','in','is','that','it','for')))::BIGINT AS hits_en,
    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        w -> w IN ('der','die','das','und','ist','ein','zu','den','von','mit')))::BIGINT AS hits_de,
    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        w -> w IN ('le','la','les','et','de','un','une','est','que','pour')))::BIGINT AS hits_fr,
    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        w -> w IN ('el','la','los','las','y','de','un','una','es','que')))::BIGINT AS hits_es
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, hits_en, hits_de, hits_fr, hits_es,
       CASE WHEN hits_en + hits_de + hits_fr + hits_es = 0 THEN 'und'
            WHEN hits_en >= hits_de AND hits_en >= hits_fr
                 AND hits_en >= hits_es THEN 'en'
            WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
            WHEN hits_fr >= hits_es THEN 'fr'
            ELSE 'es' END AS predicted_lang,
       lang AS declared_lang
FROM h
"""


# --- fingerprinting ----------------------------------------------------------

def text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    base = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       norm.alias("norm"))
    # min-sampled rolling 8-gram fingerprint (winnowing-style lower bound):
    # min over sampled i of hash(substr(norm, i, 8)); md5-based so DuckDB
    # matches. Stride 4 = winnowing density 1/4 (4× fewer hashes, still one
    # window through every 8-char neighborhood). array_min folds the min
    # per-row map-side — no gram explode, no groupBy shuffle at all (the
    # naive explode shape shuffles len/4 rows per document for a
    # single-row-per-doc answer).
    return base.select(
        "doc_id", F.md5("norm").alias("content_md5"),
        F.length("norm").cast("bigint").alias("n_chars_norm"),
        F.array_min(
            F.transform(
                F.sequence(F.lit(1),
                           F.greatest(F.length("norm") - F.lit(7), F.lit(1)),
                           F.lit(4)),
                lambda i: F.conv(F.substring(F.md5(F.substring("norm", i, 8)),
                                             1, 15), 16, 10).cast("bigint"))
        ).alias("min_gram_hash"))


FINGERPRINT_SQL = """
WITH base AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), grams AS (
  SELECT doc_id, md5(norm) AS content_md5,
         length(norm)::BIGINT AS n_chars_norm,
         unnest(list_transform(range(1, greatest(length(norm) - 7, 1) + 1, 4),
                i -> ('0x' || substr(md5(substr(norm, i, 8)), 1, 15))::BIGINT))
           AS gram_hash
  FROM base
)
SELECT doc_id, content_md5, n_chars_norm,
       min(gram_hash)::BIGINT AS min_gram_hash
FROM grams GROUP BY doc_id, content_md5, n_chars_norm
"""


QUERIES = {
    "text_token_count": (text_token_count, TOKEN_COUNT_SQL),
    "text_quality": (text_quality, QUALITY_SQL),
    "text_lang_id": (text_lang_id, LANG_ID_SQL),
    "text_fingerprint": (text_fingerprint, FINGERPRINT_SQL),
}
