"""Deterministic document-metadata extraction (X8 stand-in).

The reference extracts ``{title, topic, tags, author}`` with one structured
LLM call over the first ~8000 chars, fail-soft to a stub title
(core/metadata.py:40-94, core/indexer.py:80-91). No external LLM exists
here, so the extractor is a deterministic content heuristic with the same
output contract and the same downstream normalization (plans/registry.py):

  * title — the document's first heading, else the url stem (the
    reference's stub-title rule, core/indexer.py:102);
  * tags  — the top-5 most frequent non-stopword tokens (ties broken
    alphabetically), lowercased — feeding the P2 AND-tag filter;
  * topic — the single most frequent tag;
  * author — NULL (nothing derivable without an LLM; column kept so the
    registry MERGE contract is exercised end-to-end).

All JVM-side expressions (no UDFs): tokenize → explode-free frequency via
``aggregate`` over a distinct-token array would be quadratic, so this uses
the classic explode → count → window top-k shape — one shuffle on
(url, token), one on url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = (
    "the a an of and or to in is are was were it this that for on with as "
    "at by from be been has have had not no but if then so we you they he "
    "she i its their our your his her them us do does did can could will "
    "would should may might must").split()

_MAX_TAGS = 5


def extract_metadata(extracted: DataFrame,
                     text_col: str = "extracted_text") -> DataFrame:
    """extracted(url, title?, …) → (url, title, author, topic, tags)."""
    toks = (extracted
            .select("url",
                    F.explode(
                        F.filter(
                            F.regexp_extract_all(
                                F.lower(F.col(text_col)),
                                F.lit("[a-z][a-z0-9]{2,}"), 0),
                            lambda t: ~t.isin(*_STOPWORDS)))
                    .alias("tok")))
    counts = toks.groupBy("url", "tok").count()
    w = Window.partitionBy("url").orderBy(F.desc("count"), F.asc("tok"))
    ranked = counts.withColumn("rank", F.row_number().over(w)) \
                   .filter(F.col("rank") <= _MAX_TAGS)
    rolled = (ranked.groupBy("url")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("rank", "tok"))),
                  lambda s: s["tok"]).alias("tags")))
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("url"), "/"), -1), r"\.[^.]*$", "")
    return (extracted.select("url", "title")
            .join(rolled.select("url", "tags"), "url", "left")
            .select(
                "url",
                F.coalesce("title", stem).alias("title"),
                F.lit(None).cast("string").alias("author"),
                F.try_element_at(F.coalesce(
                    "tags", F.array().cast("array<string>")), F.lit(1))
                 .alias("topic"),
                F.coalesce("tags", F.array().cast("array<string>"))
                 .alias("tags")))
