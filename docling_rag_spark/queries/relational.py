"""Relational operator surface (SURVEY.md §2.2–2.7) over the driver tables.

Each entry re-expresses a reference operator Spark-first:
  a1_docs_per_source   — count-by-key agg (A1, db_storage.py:112-117)
  j1_orders_customer   — decorate-join with broadcast dim (J1, api/app.py:216-223)
  j2_catalog_card      — registry × counts × latest-per-key folded into one
                         plan: groupBy + window + broadcast joins (J2/W1,
                         api/app.py:315-333)
  w1_latest_event_per_user — row_number latest-per-key (W1, db_jobs.py:82-89)
  w2_running_value     — per-key ordered running sum (window agg)
  p2_filter_docs       — predicate resolution, case-insensitive + IN set
                         (P2, core/search.py:26-40)
  d2_tag_normalize     — lowercase/trim/drop-nullish/distinct/cap-5 tag
                         normalization (D2, core/metadata.py:76-83)
  f8_event_elapsed     — elapsed-seconds time math (F8, api/app.py:288-297)
  o3_recent_events     — ORDER BY … LIMIT with deterministic tiebreak (O3)
  a3_distinct_lang_source — distinct projection (A3, db_storage.py:69)
  q1_pricing_summary   — wide agg with exact DECIMAL partial+final sums
  q3_revenue_topk      — 3-way join + agg + top-k (broadcast small sides)

Scale notes: every agg here is partial+final (map-side combine free from
Catalyst); dims (customer, nation, documents-registry) are broadcast so the
only shuffles are on the agg keys of the fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A1: count/sum by key ----------------------------------------------------

def a1_docs_per_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("doc_count"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


A1_SQL = """
SELECT source,
       count(*)::BIGINT    AS doc_count,
       sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY source
"""


# --- J1: decorate join, broadcast dim ---------------------------------------

def j1_orders_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey, "left")
            .select(F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                    F.col("o_totalprice").cast("decimal(18,2)").cast("double")
                     .alias("total_price"),
                    "c_name", "c_mktsegment"))


J1_SQL = """
SELECT o.o_orderkey::BIGINT AS o_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --- J2 (+W1): catalog card: registry × counts × latest-per-key -------------

def j2_catalog_card(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    counts = (orders.groupBy("o_custkey")
              .agg(F.count("*").cast("bigint").alias("order_count"),
                   F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double").alias("total_spent")))
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = (orders.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("o_custkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd")
                       .alias("last_order_date"),
                      F.col("o_orderstatus").alias("last_status")))
    return (cust.select("c_custkey", "c_name")
            .join(counts, cust.c_custkey == counts.o_custkey, "left")
            .drop("o_custkey")
            .join(latest, cust.c_custkey == latest.o_custkey, "left")
            .drop("o_custkey")
            .select("c_custkey", "c_name",
                    F.coalesce("order_count", F.lit(0)).cast("bigint")
                     .alias("order_count"),
                    F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
                    "last_order_date", "last_status"))


J2_SQL = """
WITH counts AS (
  SELECT o_custkey, count(*)::BIGINT AS order_count,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
), latest AS (
  SELECT o_custkey,
         strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
         o_orderstatus AS last_status
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
  WHERE rn = 1
)
SELECT c.c_custkey, c.c_name,
       COALESCE(counts.order_count, 0)::BIGINT AS order_count,
       COALESCE(counts.total_spent, 0.0) AS total_spent,
       latest.last_order_date, latest.last_status
FROM customer c
LEFT JOIN counts ON c.c_custkey = counts.o_custkey
LEFT JOIN latest ON c.c_custkey = latest.o_custkey
"""


# --- W1: latest event per user ----------------------------------------------

def w1_latest_event_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    F.col("event_id").cast("bigint").alias("event_id"),
                    "event_type",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")))


W1_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
"""


# --- W2: running sum per key -------------------------------------------------

def w2_running_value(spark, sf_dir):
    """Values are quantized to integer milli-units BEFORE the window sum:
    engines disagree on windowed double accumulation order (DuckDB uses
    segment trees), so only an integer running sum is bit-portable."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    milli = F.floor(F.col("value") * 1000).cast("bigint")
    return ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.sum(milli).over(w).cast("bigint").alias("running_value_milli"))


W2_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
       sum(floor(value * 1000)::BIGINT)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS running_value_milli
FROM events
"""


# --- P2: predicate resolution (tri-state filter) -----------------------------

_P2_SOURCES = ("src1", "src7", "SRC12")  # mixed case: filter is ci


def p2_filter_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    allowed = [s.lower() for s in _P2_SOURCES]
    return (docs.filter((F.lower("lang") == "en")
                        & F.lower("source").isin(allowed))
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    "source", "lang"))


P2_SQL = """
SELECT doc_id::BIGINT AS doc_id, source, lang
FROM documents
WHERE lower(lang) = 'en' AND lower(source) IN ('src1', 'src7', 'src12')
"""


# --- D2: tag normalization ---------------------------------------------------

def d2_tag_normalize(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    tags = F.array_sort(F.slice(F.array_distinct(
        F.filter(
            F.transform(F.split(F.lower("p_type"), " "),
                        lambda x: F.trim(x)),
            lambda x: ~x.isin("", "null", "none"))), 1, 5))
    return part.select(F.col("p_partkey").cast("bigint").alias("p_partkey"),
                       F.array_join(tags, ",").alias("tags_norm"))


D2_SQL = """
SELECT p_partkey::BIGINT AS p_partkey,
       array_to_string(
         list_sort(list_slice(list_distinct(
           list_filter(list_transform(string_split(lower(p_type), ' '),
                                      x -> trim(x)),
                       x -> x NOT IN ('', 'null', 'none'))), 1, 5)),
         ',') AS tags_norm
FROM part
"""


# --- F8: elapsed-seconds time math -------------------------------------------

def f8_event_elapsed(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 (F.unix_timestamp(F.max("ts"))
                  - F.unix_timestamp(F.min("ts"))).cast("bigint")
                 .alias("elapsed_secs"))
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    "n_events", "elapsed_secs"))


F8_SQL = """
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_events,
       (floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT)
         AS elapsed_secs
FROM events GROUP BY user_id
"""


# --- O3: recent-n with deterministic tiebreak --------------------------------

def o3_recent_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(50)
            .select(F.col("event_id").cast("bigint").alias("event_id"),
                    "event_type",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")))


O3_SQL = """
SELECT event_id::BIGINT AS event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events ORDER BY ts DESC, event_id DESC LIMIT 50
"""


# --- A3: distinct projection -------------------------------------------------

def a3_distinct_lang_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("lang", "source").distinct()


A3_SQL = "SELECT DISTINCT lang, source FROM documents"


# --- Q1: pricing summary (exact DECIMAL partial+final agg) -------------------

def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(dec("l_extendedprice")).cast("double")
                  .alias("sum_base_price"),
                 F.sum((dec("l_extendedprice")
                        * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                       .cast("decimal(28,4)"))
                  .cast("double").alias("sum_disc_price"),
                 F.count("*").cast("bigint").alias("count_order")))


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: 3-way join + agg + top-k --------------------------------------------

def q3_revenue_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)")
              - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd")
                      .alias("order_date"))
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
            .select(F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
                    "order_date", "revenue"))


Q3_SQL = """
SELECT l.l_orderkey::BIGINT AS l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


QUERIES = {
    "a1_docs_per_source": (a1_docs_per_source, A1_SQL),
    "j1_orders_customer": (j1_orders_customer, J1_SQL),
    "j2_catalog_card": (j2_catalog_card, J2_SQL),
    "w1_latest_event_per_user": (w1_latest_event_per_user, W1_SQL),
    "w2_running_value": (w2_running_value, W2_SQL),
    "p2_filter_docs": (p2_filter_docs, P2_SQL),
    "d2_tag_normalize": (d2_tag_normalize, D2_SQL),
    "f8_event_elapsed": (f8_event_elapsed, F8_SQL),
    "o3_recent_events": (o3_recent_events, O3_SQL),
    "a3_distinct_lang_source": (a3_distinct_lang_source, A3_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_revenue_topk": (q3_revenue_topk, Q3_SQL),
}
