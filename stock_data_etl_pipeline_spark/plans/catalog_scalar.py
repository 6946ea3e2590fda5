"""Catalog entries: scalar-function surface (F6-F8) + outer joins +
streaming session windows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import latest_per_group
from ..sources.registry import load_table
from .catalog import register


@register("scalar_uri_parse", """
WITH uris AS (
  SELECT doc_id, 's3://raw-docs/' || source || '/' || doc_id || '.json' AS uri
  FROM documents
)
SELECT doc_id, uri,
       regexp_extract(uri, '^s3://([^/]+)/', 1) AS bucket,
       regexp_extract(uri, '^s3://[^/]+/(.+)$', 1) AS key
FROM uris ORDER BY doc_id
""")
def scalar_uri_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F7: S3-URI scheme/bucket/key parsing via regexp_extract (the
    # reference parses raw_data_uri in queue_for_delta.py:369-379)
    d = load_table(spark, sf_dir, "documents")
    uri = F.concat(F.lit("s3://raw-docs/"), F.col("source"),
                   F.lit("/"), F.col("doc_id").cast("string"), F.lit(".json"))
    return (d.select("doc_id", uri.alias("uri"))
            .select("doc_id", "uri",
                    F.regexp_extract("uri", r"^s3://([^/]+)/", 1).alias("bucket"),
                    F.regexp_extract("uri", r"^s3://[^/]+/(.+)$", 1).alias("key"))
            .orderBy("doc_id"))


@register("scalar_time_functions", """
SELECT extract(year FROM o_orderdate)::BIGINT AS y,
       extract(month FROM o_orderdate)::BIGINT AS m,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2 ORDER BY y, m
""")
def scalar_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F5/F6: calendar decomposition of event-time (year/month buckets)
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").cast("long").alias("y"),
                      F.month("o_orderdate").cast("long").alias("m"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("y", "m"))


@register("left_join_latest_order", """
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_orderdate
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
)
SELECT c.c_custkey, c.c_name, l.o_orderkey AS last_orderkey,
       l.o_orderdate AS last_orderdate
FROM customer c LEFT JOIN latest l ON l.o_custkey = c.c_custkey
ORDER BY c.c_custkey
""")
def left_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # outer-join surface: every customer row survives; customers without
    # orders carry NULLs (the list-endpoint's select_related shape when
    # the related row is absent)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    latest = latest_per_group(o, ["o_custkey"],
                              [F.col("o_orderdate").desc(),
                               F.col("o_orderkey").desc()])
    return (c.join(latest, c["c_custkey"] == latest["o_custkey"], "left")
            .select("c_custkey", "c_name",
                    F.col("o_orderkey").alias("last_orderkey"),
                    F.col("o_orderdate").alias("last_orderdate"))
            .orderBy("c_custkey"))


@register("streaming_session_windows", """
WITH o AS (SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM m)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start
""")
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Structured Streaming's native session_window (30 min gap), drained
    # with availableNow into memory (complete mode) — proven equivalent to
    # the batch lag-based sessionization oracle. NOTE: session_window's
    # "end" is last_event + gap, so the comparable columns are
    # (start, count), not end.
    import uuid as _uuid

    from ..streaming.events import event_stream
    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events")))
    name = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    "n_events")
            .orderBy("user_id", "session_start"))


@register("scalar_string_functions", """
SELECT c_custkey,
       upper(c_name) AS up,
       lpad(c_custkey::VARCHAR, 8, '0') AS padded,
       replace(c_mktsegment, 'URE', '_') AS translated,
       levenshtein(c_mktsegment, 'BUILDING') AS dist,
       substr(md5(c_name), 1, 8) AS name_hash
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""")
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F-family breadth: case mapping, padding, replacement, edit
    # distance, hashing — all codegen'd engine built-ins
    from ..sources.registry import load_table
    c = load_table(spark, sf_dir, "customer")
    return (c.filter(F.col("c_custkey") <= 200)
            .select("c_custkey",
                    F.upper("c_name").alias("up"),
                    F.lpad(F.col("c_custkey").cast("string"), 8, "0")
                    .alias("padded"),
                    F.replace(F.col("c_mktsegment"), F.lit("URE"),
                              F.lit("_")).alias("translated"),
                    F.levenshtein("c_mktsegment", F.lit("BUILDING"))
                    .alias("dist"),
                    F.substring(F.md5("c_name"), 1, 8).alias("name_hash"))
            .orderBy("c_custkey"))


@register("stats_aggregates_by_flag", """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 3) + 0.0 AS qty_price_corr,
       round(covar_samp(l_quantity, l_discount), 3) + 0.0 AS qty_disc_covar,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(skewness(l_extendedprice), 3) + 0.0 AS price_skew
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def stats_aggregates_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the statistical aggregate family (corr/covar/stddev/skewness) —
    # single-pass streaming moments, all map-side combinable; rounded
    # to 3dp because the engines' co-moment update orders differ at
    # ~1e-5 (same class as float-sum ordering, not a semantics gap);
    # '+ 0.0' normalizes IEEE negative zero on both engines
    from ..sources.registry import load_table
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg((F.round(F.corr("l_quantity", "l_extendedprice"), 3)
                  + F.lit(0.0)).alias("qty_price_corr"),
                 (F.round(F.covar_samp("l_quantity", "l_discount"), 3)
                  + F.lit(0.0)).alias("qty_disc_covar"),
                 F.round(F.stddev_samp("l_extendedprice"), 4)
                 .alias("price_stddev"),
                 (F.round(F.skewness("l_extendedprice"), 3)
                  + F.lit(0.0)).alias("price_skew"))
            .orderBy("l_returnflag"))


@register("udtf_word_ngrams", """
WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents WHERE doc_id < 20),
n AS (SELECT doc_id, unnest(range(len(ws) - 2)) AS pos, ws
      FROM w WHERE len(ws) >= 3)
SELECT doc_id, pos, array_to_string(ws[pos+1:pos+3], ' ') AS ngram
FROM n ORDER BY doc_id, pos
""")
def udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDTF exemplar (PySpark 4): lateral word-trigram expansion over a
    # 20-doc slice.  The native sequence+posexplode form is the hot-path
    # choice (corpus.chunk_documents); this entry pins the UDTF API and
    # its oracle comparability.  Tokenization == functions/text.words.
    from ..functions.py_udfs import WordNGrams
    from ..sources.registry import load_table
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < 20).select("doc_id", "text"))
    return (d.lateralJoin(WordNGrams(F.col("text").outer(), F.lit(3)))
            .select("doc_id", "pos", "ngram")
            .orderBy("doc_id", "pos"))


@register("gmean_price_by_status", """
SELECT o_orderstatus,
       round(exp(avg(ln(o_totalprice))), 3) AS gmean_price,
       count(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""")
def gmean_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas GROUPED_AGG UDAF exemplar: geometric mean per group.  The
    # whole group's column ships to one executor as an Arrow batch (no
    # partial aggregation for pandas UDAFs) — acceptable for one double
    # per row; the log-sum identity is what the oracle uses natively.
    from ..functions.py_udfs import gmean
    from ..sources.registry import load_table
    o = load_table(spark, sf_dir, "orders")
    # pandas UDAFs can't share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — split and rejoin on the tiny key
    g = (o.groupBy("o_orderstatus")
         .agg(F.round(gmean("o_totalprice"), 3).alias("gmean_price")))
    n = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    return g.join(n, "o_orderstatus").orderBy("o_orderstatus")
