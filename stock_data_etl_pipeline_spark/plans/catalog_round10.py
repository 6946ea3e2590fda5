"""Round-10 catalog entries — the families sketched in round 9's plan:
exact distribution tests over events (two-sample KS, dow×hour seasonal
decomposition, user-activity Gini), embedding-space geometry audits
(hubness, two-NN intrinsic dimension, Johnson–Lindenstrauss projection
distortion), graph closure-by-degree and neighbor-degree curves, and
corpus sentence/diversity profiles.

Every entry follows the exact-integer oracle discipline (COVERAGE.md):
integer-grid summands, single-division emits, shared transcendental
handling (ln on rational inputs + 1e-6 quantization), identical
association both engines, unrounded raw-double emits for ratios of
exact integers, and matrix-only windows (domain-bounded, never a sort
of the raw stream).

Reference parity: the reference's surface stops at filter/join/
aggregate over ingested series (SURVEY §2); these extend the engine's
quant/curation north star like plans/catalog_quant.py (round 7),
plans/catalog_round8.py and plans/catalog_round9.py.

MUST import after the other catalog modules (see plans/__init__) so
the rotation ranks these never-checked entries behind none — with the
whole catalog driver-green after r9, they land at the head of the
round-10 window right after the fingerprint-invalidated entries
(five by round end: the two r9-stale queries plus the three graph
queries whose triangle/threshold helpers changed this round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import analytics as AN
from ..operators import corpus as CP
from ..operators import similarity as SIM
from ..sources.registry import load_table
from .catalog import register


@register("events_ks_weekend", """
WITH m AS (
  SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS cwe,
         CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)
              AS BIGINT) AS cwd
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT g,
         CAST(sum(cwe) OVER w AS BIGINT) AS awe,
         CAST(sum(cwd) OVER w AS BIGINT) AS awd,
         CAST(sum(cwe) OVER p AS BIGINT) AS nwe,
         CAST(sum(cwd) OVER p AS BIGINT) AS nwd
  FROM m
  WINDOW w AS (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         p AS (PARTITION BY g)
)
SELECT g AS event_type,
       CAST(max(nwe) AS BIGINT) AS n_weekend,
       CAST(max(nwd) AS BIGINT) AS n_weekday,
       max(CASE WHEN nwe > 0 AND nwd > 0
                THEN abs(CAST(awe AS DOUBLE) / CAST(nwe AS DOUBLE)
                         - CAST(awd AS DOUBLE) / CAST(nwd AS DOUBLE))
           END) AS ks_stat
FROM c GROUP BY g ORDER BY event_type
""")
def events_ks_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact two-sample KS per event type (weekday vs weekend value
    # distributions): cents-grid support makes the ECDF window a
    # domain-bounded matrix pass, D(v) one pair of IEEE divisions of
    # exact BIGINT cumulatives, max order-independent
    ev = load_table(spark, sf_dir, "events")
    return AN.ks_two_sample(ev)


@register("events_dow_hour_decomposition", """
WITH dom AS (SELECT d.dow, h.hr FROM range(0, 7) d(dow),
             range(0, 24) h(hr)),
cnt AS (
  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), filled AS (
  SELECT dom.dow, dom.hr, CAST(coalesce(cnt.c, 0) AS BIGINT) AS n
  FROM dom LEFT JOIN cnt ON dom.dow = cnt.dow AND dom.hr = cnt.hr
), e AS (
  SELECT dow, hr, n,
         CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS rs,
         CAST(sum(n) OVER (PARTITION BY hr) AS BIGINT) AS cs,
         CAST(sum(n) OVER () AS BIGINT) AS g
  FROM filled
)
SELECT dow, hr, n,
       CAST(rs AS DOUBLE) / 24.0 + CAST(cs AS DOUBLE) / 7.0
         - CAST(g AS DOUBLE) / 168.0 AS expected,
       CAST(n AS DOUBLE) - (CAST(rs AS DOUBLE) / 24.0
         + CAST(cs AS DOUBLE) / 7.0 - CAST(g AS DOUBLE) / 168.0)
         AS residual
FROM e ORDER BY dow, hr
""")
def events_dow_hour_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-way additive seasonal decomposition of the 7×24 count
    # matrix, zero-filled domain, unrounded identically-associated
    # double emits of exact integer sums
    ev = load_table(spark, sf_dir, "events")
    return AN.dow_hour_decomposition(ev)


@register("events_user_gini", """
WITH x AS (
  SELECT event_type AS g, user_id AS e, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), h AS (SELECT g, x, CAST(count(*) AS BIGINT) AS w FROM x GROUP BY g, x),
hc AS (
  SELECT g, x, w,
         CAST(sum(w) OVER (PARTITION BY g ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w
              AS BIGINT) AS c
  FROM h
), a AS (
  SELECT g, CAST(sum(w) AS BIGINT) AS n,
         CAST(sum(x * w) AS BIGINT) AS sx,
         CAST(sum(x * (c * w + w * (w + 1) // 2)) AS BIGINT) AS s1
  FROM hc GROUP BY g
), b AS (
  SELECT g, n, sx, CAST(2 * s1 - (n + 1) * sx AS BIGINT) AS num,
         CAST(n * sx AS BIGINT) AS den FROM a
)
SELECT g AS event_type, n AS n_entities, sx AS n_rows,
       CASE WHEN den > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS gini
FROM b ORDER BY event_type
""")
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type activity concentration: rank-formula Gini on the
    # count-of-counts histogram (degree_gini's algebra, grouped) —
    # no entity sort, matrix-only window, one double division
    ev = load_table(spark, sf_dir, "events")
    return AN.grouped_count_gini(ev, "event_type", "user_id")


_KNN_CTE = """
WITH v AS (SELECT vec_id, label, embedding FROM embeddings),
cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 6)
                  AS score
         FROM v a JOIN v b ON a.label = b.label
                          AND a.vec_id <> b.vec_id),
r AS (SELECT qid, nid, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nid) AS nn_rank
      FROM cand)
"""


@register("embedding_hubness", _KNN_CTE + """
, ind AS (SELECT nid, CAST(count(*) AS BIGINT) AS k_occ
          FROM r WHERE nn_rank <= 3 GROUP BY nid)
SELECT CAST(coalesce(ind.k_occ, 0) AS BIGINT) AS k_occurrence,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM v LEFT JOIN ind ON v.vec_id = ind.nid
GROUP BY 1 ORDER BY 1
""")
def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-occurrence histogram over the blocked 3-NN graph: in-degree
    # hash-agg + left join from the id universe so anti-hubs (k=0)
    # stay visible — the hub-pathology audit for the embedding space
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.knn_hubness(e, k=3)


@register("embedding_twonn_dim", _KNN_CTE + """
, s AS (SELECT qid,
               max(CASE WHEN nn_rank = 1 THEN score END) AS s1,
               max(CASE WHEN nn_rank = 2 THEN score END) AS s2
        FROM r GROUP BY qid),
j AS (SELECT v.label AS g,
             CASE WHEN s1 IS NOT NULL AND s2 IS NOT NULL AND s1 < 1.0
                  THEN 1 ELSE 0 END AS u,
             s1, s2
      FROM v JOIN s ON v.vec_id = s.qid),
q AS (SELECT g, u,
             CASE WHEN u = 1 THEN CAST(round(
                  ln((1.0 - s2) / (1.0 - s1)) * 1e6, 0) AS BIGINT)
             END AS ql
      FROM j),
g2 AS (SELECT g, CAST(count(*) AS BIGINT) AS n_vectors,
              CAST(sum(u) AS BIGINT) AS n_used,
              CAST(sum(ql) AS BIGINT) AS slog
       FROM q GROUP BY g)
SELECT g AS label, n_vectors, n_used,
       CASE WHEN slog > 0
            THEN (2000000.0 * CAST(n_used AS DOUBLE))
                 / CAST(slog AS DOUBLE)
       END AS twonn_dim
FROM g2 ORDER BY label
""")
def embedding_twonn_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Facco two-NN intrinsic dimension per label block: ln distance
    # ratios off the 6-dp knn scores, 1e-6-grid BIGINT sum, one
    # double-division emit; duplicate-NN vectors excluded and counted
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.twonn_intrinsic_dim(e)


def _jl_sign_sql() -> str:
    """DuckDB derives the ±1 matrix inline from md5 parity — the same
    bits jl_sign_matrix computes in Python for the Spark literals."""
    return """
s AS (SELECT a.i, b.j,
             CASE WHEN ('0x' || substr(md5(a.i || '_' || b.j), 1, 15))
                       ::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sg
      FROM range(0, 64) a(i), range(0, 16) b(j))
"""


@register("embedding_jl_distortion", """
WITH p AS (
  SELECT a.vec_id AS ida, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
), q AS (
  SELECT p.ida, t.i,
         CAST(round((va[t.i + 1]::DOUBLE - vb[t.i + 1]::DOUBLE) * 1e6,
                    0) AS BIGINT) AS qd
  FROM p, range(0, 64) t(i)
), """ + _jl_sign_sql() + """,
pj AS (SELECT q.ida, s.j, CAST(sum(qd * sg) AS BIGINT) AS pj
       FROM q JOIN s ON q.i = s.i GROUP BY q.ida, s.j),
num AS (SELECT ida, CAST(sum(pj * pj) AS BIGINT) AS spj
        FROM pj GROUP BY ida),
den AS (SELECT ida, CAST(sum(qd * qd) AS BIGINT) AS sq
        FROM q GROUP BY ida),
r AS (SELECT num.ida, spj, sq FROM num JOIN den ON num.ida = den.ida
      WHERE sq > 0)
SELECT CAST((10 * spj) // (16 * sq) AS BIGINT) AS ratio_decile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(CAST(spj AS DOUBLE) / (16.0 * CAST(sq AS DOUBLE)))
         AS min_ratio,
       max(CAST(spj AS DOUBLE) / (16.0 * CAST(sq AS DOUBLE)))
         AS max_ratio
FROM r GROUP BY 1 ORDER BY 1
""")
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JL sketch audit: ±1 md5-parity projection of 1e-6-grid integer
    # differences over consecutive-id pairs; the decile bucket is pure
    # integer arithmetic — no float decides a boundary
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.jl_distortion(e, in_dim=64, out_dim=16)


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase item-pair projection shared by the two graph-curve
    builders — one definition so both queries provably analyze the
    same relation (the oracle side shares _COPURCHASE_CTE the same
    way)."""
    from pyspark.sql import functions as F
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    return (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.i") < F.col("b.i")))
            .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))


_COPURCHASE_CTE = """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
e AS (SELECT DISTINCT a.i AS ea, b.i AS eb
      FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       FROM (SELECT ea AS v FROM e UNION ALL SELECT eb FROM e)
       GROUP BY v)
"""


@register("graph_closure_by_degree", _COPURCHASE_CTE + """
, tr AS (
  SELECT w.a, w.b, w.c
  FROM (SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
        FROM e e1 JOIN e e2 ON e1.eb = e2.ea) w
  WHERE EXISTS (SELECT 1 FROM e WHERE e.ea = w.a AND e.eb = w.c)
), tv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS tri
  FROM (SELECT a AS v FROM tr UNION ALL SELECT b FROM tr
        UNION ALL SELECT c FROM tr)
  GROUP BY v
), nodes AS (
  SELECT dg.v, dg.d, CAST(coalesce(tv.tri, 0) AS BIGINT) AS tri
  FROM dg LEFT JOIN tv ON dg.v = tv.v
), g AS (
  SELECT CAST(length(bin(d)) AS BIGINT) AS degree_bucket,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(tri) AS BIGINT) AS n_triangles,
         CAST(sum(d * (d - 1)) AS BIGINT) AS w2
  FROM nodes GROUP BY 1
)
SELECT degree_bucket, n_nodes, n_triangles,
       CASE WHEN w2 > 0 THEN CAST(2 * n_triangles AS DOUBLE)
                             / CAST(w2 AS DOUBLE) END AS closure
FROM g ORDER BY degree_bucket
""")
def graph_closure_by_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # closure-vs-degree curve of the co-purchase graph: per-node
    # triangles from the degree-oriented adjacency intersection
    # (triangle list is output-sized, orientation-invariant),
    # bit-length degree buckets, integer rollup, one division
    return AN.closure_by_degree(_copurchase_pairs(spark, sf_dir),
                                "pa", "pb")


@register("graph_neighbor_degree", _COPURCHASE_CTE + """
, ed AS (
  SELECT e.ea, e.eb, da.d AS dxv, db.d AS dyv
  FROM e JOIN dg da ON e.ea = da.v JOIN dg db ON e.eb = db.v
), snd AS (
  SELECT v, CAST(sum(nd) AS BIGINT) AS snd
  FROM (SELECT ea AS v, dyv AS nd FROM ed
        UNION ALL SELECT eb, dxv FROM ed)
  GROUP BY v
), nodes AS (
  SELECT dg.v, dg.d, snd.snd FROM dg JOIN snd ON dg.v = snd.v
), g AS (
  SELECT CAST(length(bin(d)) AS BIGINT) AS degree_bucket,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d) AS BIGINT) AS sum_degree,
         CAST(sum(snd) AS BIGINT) AS snd2
  FROM nodes GROUP BY 1
)
SELECT degree_bucket, n_nodes, sum_degree,
       CASE WHEN sum_degree > 0
            THEN CAST(snd2 AS DOUBLE) / CAST(sum_degree AS DOUBLE)
       END AS avg_nbr_degree
FROM g ORDER BY degree_bucket
""")
def graph_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # assortativity curve: degree-weighted mean neighbor degree per
    # bit-length bucket — two node-keyed degree joins, exact BIGINT
    # sums, one double-division emit
    return AN.neighbor_degree_curve(_copurchase_pairs(spark, sf_dir),
                                    "pa", "pb")


@register("corpus_sentence_profile", """
WITH s AS (
  SELECT source,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    x -> trim(x)), x -> x <> '') AS sents
  FROM documents
), d AS (
  SELECT source, CAST(len(sents) AS BIGINT) AS ns,
         CAST(CASE WHEN len(sents) = 0 THEN 0
              ELSE list_reduce(list_transform(sents, x -> length(x)),
                               (a, b) -> a + b) END AS BIGINT) AS chars
  FROM s
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ns) AS BIGINT) AS n_sentences,
         CAST(sum(chars) AS BIGINT) AS sent_chars,
         CAST(max(ns) AS BIGINT) AS max_sentences
  FROM d GROUP BY source
)
SELECT source, n_docs, n_sentences, max_sentences,
       CAST(n_sentences AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS mean_sentences_per_doc,
       CASE WHEN n_sentences > 0
            THEN CAST(sent_chars AS DOUBLE) / CAST(n_sentences AS DOUBLE)
       END AS mean_sentence_chars
FROM g ORDER BY source
""")
def corpus_sentence_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sentence-structure health per source: [.!?]+ segments trimmed,
    # exact integer counts/sums, two single-division mean emits
    d = load_table(spark, sf_dir, "documents")
    return CP.sentence_profile(d)


@register("corpus_diversity_profile", """
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x != ''))
           AS wd
  FROM documents
), f AS (
  SELECT source, wd, CAST(count(*) AS BIGINT) AS f
  FROM w GROUP BY source, wd
), q AS (
  SELECT source, f,
         CAST(round(CAST(f AS DOUBLE) * ln(CAST(f AS DOUBLE)) * 1e6, 0)
              AS BIGINT) AS fl
  FROM f
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(sum(fl) AS BIGINT) AS sfl
  FROM q GROUP BY source
)
SELECT source, vocab, n_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       END AS ttr,
       CASE WHEN n_tokens > 0
            THEN ln(CAST(n_tokens AS DOUBLE))
                 - CAST(sfl AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)
       END AS word_entropy
FROM g ORDER BY source
""")
def corpus_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lexical diversity per source: vocab, type-token ratio, Shannon
    # word entropy on the 1e-6 f·ln f grid — one explode + hash-agg
    d = load_table(spark, sf_dir, "documents")
    return CP.diversity_profile(d)


@register("corpus_readability", """
WITH w AS (
  SELECT source,
         list_filter(string_split(text, ' '), x -> x != '') AS ws,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    x -> trim(x)), x -> x <> '') AS sents
  FROM documents
), d AS (
  SELECT source, CAST(len(ws) AS BIGINT) AS nw,
         CAST(len(sents) AS BIGINT) AS ns,
         CAST(CASE WHEN len(ws) = 0 THEN 0 ELSE list_reduce(
              list_transform(ws, x -> greatest(1,
                  len(regexp_extract_all(lower(x), '[aeiouy]+')))),
              (a, b) -> a + b) END AS BIGINT) AS ny
  FROM w
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS sw, CAST(sum(ns) AS BIGINT) AS ss,
         CAST(sum(ny) AS BIGINT) AS sy
  FROM d GROUP BY source
)
SELECT source, n_docs, sw, ss, sy,
       CASE WHEN ss > 0 AND sw > 0
            THEN 206.835
                 - 1.015 * (CAST(sw AS DOUBLE) / CAST(ss AS DOUBLE))
                 - 84.6 * (CAST(sy AS DOUBLE) / CAST(sw AS DOUBLE))
       END AS flesch_ease,
       CASE WHEN ss > 0 AND sw > 0
            THEN 0.39 * (CAST(sw AS DOUBLE) / CAST(ss AS DOUBLE))
                 + 11.8 * (CAST(sy AS DOUBLE) / CAST(sw AS DOUBLE))
                 - 15.59
       END AS fk_grade
FROM g ORDER BY source
""")
def corpus_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch ease / FK grade on aggregate ratios per source: vowel-run
    # syllable counts (floor 1/word), exact BIGINT sums, shared
    # literal coefficients, identically-associated double emits
    d = load_table(spark, sf_dir, "documents")
    return CP.readability_profile(d)


@register("corpus_word_burstiness", """
WITH c AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != ''))
           AS wd
  FROM documents
), pc AS (
  SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
  FROM c GROUP BY doc_id, wd
), pw AS (
  SELECT wd, CAST(sum(c) AS BIGINT) AS t,
         CAST(sum(c * c) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS df
  FROM pc GROUP BY wd
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT wd AS word, t AS total_count, df AS doc_freq, n_docs,
       CASE WHEN n_docs * t > 0
            THEN CAST(n_docs * s2 - t * t AS DOUBLE)
                 / CAST(n_docs * t AS DOUBLE)
       END AS vmr
FROM pw, n
ORDER BY t DESC, wd LIMIT 20
""")
def corpus_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # variance-to-mean dispersion of the top-20 words, zeros included
    # via the (N·Σc² − T²)/(N·T) identity — pure BIGINT algebra, one
    # unrounded double division, top-k off a vocab-sized heap
    d = load_table(spark, sf_dir, "documents")
    return CP.word_burstiness(d, top=20)


_DAILY_PSI_ORACLE = """
WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         least(9, floor(value / 60.0))::INT AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM h),
grid AS (SELECT d.day, g.bucket::INT AS bucket
         FROM days d, range(0, 10) g(bucket)),
dense AS (
  SELECT grid.day, grid.bucket, CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM grid LEFT JOIN h ON grid.day = h.day AND grid.bucket = h.bucket
), tot AS (SELECT day, CAST(sum(c) AS BIGINT) AS n
           FROM dense GROUP BY day),
r AS (SELECT min(day) AS rday FROM tot),
ref AS (SELECT d.bucket, d.c AS cr, t.n AS nr
        FROM dense d JOIN tot t ON d.day = t.day
        JOIN r ON d.day = r.rday),
j AS (SELECT d.day, d.bucket, d.c, t.n, ref.cr, ref.nr
      FROM dense d JOIN tot t ON d.day = t.day
      JOIN ref ON d.bucket = ref.bucket),
terms AS (
  SELECT day, n,
         CAST(round(1e9 * (((c + 1) / (n + 10.0) - (cr + 1) / (nr + 10.0))
              * ln(((c + 1) / (n + 10.0)) / ((cr + 1) / (nr + 10.0)))),
              0) AS BIGINT) AS t9
  FROM j
), s AS (SELECT day, CAST(max(n) AS BIGINT) AS n_events,
                CAST(sum(t9) AS BIGINT) AS s9
         FROM terms GROUP BY day)
SELECT day, n_events, s9 / 1e9 AS psi, s9 / 1e9 > 0.2 AS drifted
FROM s ORDER BY day
"""


@register("events_daily_psi", _DAILY_PSI_ORACLE)
def events_daily_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drift monitor, batch twin: per-day value histogram -> dense-grid
    # Laplace-smoothed PSI vs day 1 on the 1e-9 term grid
    from ..operators.quality import (daily_value_histogram,
                                     psi_from_daily_histogram)
    ev = load_table(spark, sf_dir, "events")
    return psi_from_daily_histogram(daily_value_histogram(ev))


@register("streaming_daily_psi", _DAILY_PSI_ORACLE)
def streaming_daily_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the same relation with the histogram produced by a REAL
    # Structured Streaming query (file stream -> watermark -> 1-day
    # window x bucket count -> memory sink); the PSI readout runs on
    # the drained sink, which is how a monitor consumes it live
    import os

    from ..operators.quality import psi_from_daily_histogram
    from ..streaming.events import streaming_daily_value_histogram
    h = streaming_daily_value_histogram(
        spark, os.path.join(sf_dir, "events.parquet"))
    return psi_from_daily_histogram(h)


@register("customer_l_diversity", """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT floor(c_acctbal / 1000.0)) AS BIGINT) AS l
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       l < 3 AS at_risk
FROM cls GROUP BY l ORDER BY l
""")
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # homogeneity-attack audit over the (nation, segment) QI pair with
    # the account-balance thousand-bucket as the sensitive attribute —
    # all-integer, two keyed aggregates (k-anonymity's companion)
    from pyspark.sql import functions as F
    from ..operators.analytics import l_diversity_profile
    c = load_table(spark, sf_dir, "customer")
    return l_diversity_profile(
        c, ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / 1000.0))


from .catalog_stock import _BARS_CTE  # noqa: E402
from ..operators import indicators as ind  # noqa: E402


@register("stock_minvar_pairs", _BARS_CTE + f"""
, lagd AS (
  SELECT event_type, hr, close,
         lag(close) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM bars WHERE low > 0
), rr AS (
  SELECT event_type, hr,
         CAST(round(ln(close / pc) * {ind.MINVAR_RET_GRID}, 0)
              AS BIGINT) AS r
  FROM lagd WHERE pc IS NOT NULL AND pc > 0
), p AS (
  SELECT a.event_type AS sym_a, b.event_type AS sym_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.r) AS BIGINT) AS sa, CAST(sum(b.r) AS BIGINT) AS sb,
         CAST(sum(a.r * a.r) AS BIGINT) AS saa,
         CAST(sum(b.r * b.r) AS BIGINT) AS sbb,
         CAST(sum(a.r * b.r) AS BIGINT) AS sab
  FROM rr a JOIN rr b ON a.hr = b.hr AND a.event_type < b.event_type
  GROUP BY 1, 2
), v AS (
  SELECT sym_a, sym_b, n AS n_obs,
         CAST(n * saa - sa * sa AS BIGINT) AS va,
         CAST(n * sbb - sb * sb AS BIGINT) AS vb,
         CAST(n * sab - sa * sb AS BIGINT) AS cab
  FROM p
)
SELECT sym_a, sym_b, n_obs,
       CASE WHEN va + vb - 2 * cab > 0
            THEN CAST(vb - cab AS DOUBLE)
                 / CAST(va + vb - 2 * cab AS DOUBLE) END AS w_a,
       CASE WHEN va + vb - 2 * cab > 0
            THEN 1.0 - CAST(vb - cab AS DOUBLE)
                 / CAST(va + vb - 2 * cab AS DOUBLE) END AS w_b
FROM v ORDER BY sym_a, sym_b
""")
def stock_minvar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # closed-form two-asset min-variance weights per symbol pair on
    # 1e-4-grid co-observed log returns: five exact BIGINT power sums,
    # integer n-scaled variance forms, one guarded double division
    # (grid cancels — weights are scale-free)
    ev = load_table(spark, sf_dir, "events")
    return ind.minvar_pair_weights(ind.hourly_bars(ev))


@register("events_seasonal_anomalies", """
WITH dom AS (SELECT d.dow, h.hr FROM range(0, 7) d(dow),
             range(0, 24) h(hr)),
cnt AS (
  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), filled AS (
  SELECT dom.dow, dom.hr, CAST(coalesce(cnt.c, 0) AS BIGINT) AS n
  FROM dom LEFT JOIN cnt ON dom.dow = cnt.dow AND dom.hr = cnt.hr
), e AS (
  SELECT dow, hr, n,
         CAST(168 * n - 7 * sum(n) OVER (PARTITION BY dow)
              - 24 * sum(n) OVER (PARTITION BY hr)
              + sum(n) OVER () AS BIGINT) AS r
  FROM filled
), s AS (
  SELECT dow, hr, n, r,
         CAST(sum(r * r) OVER () AS BIGINT) AS ssq
  FROM e
)
SELECT dow, hr, n, CAST(r AS DOUBLE) / 168.0 AS residual,
       168 * r * r > 9 * ssq AS is_anomaly
FROM s WHERE 168 * r * r > 9 * ssq
ORDER BY dow, hr
""")
def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    # alert-list composition over the dow×hour decomposition: exact
    # integer residual numerator R = 168n − 7·rowsum − 24·colsum +
    # total; the 3σ flag is the pure integer test 168·R² > 9·ΣR²
    ev = load_table(spark, sf_dir, "events")
    return AN.dow_hour_anomalies(ev)
