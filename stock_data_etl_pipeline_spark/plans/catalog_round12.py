"""Round-12 catalog entries.

Families this module registers:

* trend indicators — DEMA (lag-compensated double EWMA) and Pring's
  Know Sure Thing (weighted multi-horizon smoothed ROC blend);
* arrival-process diagnostics — hourly-count autocorrelation at lags
  1..24 and Goh–Barabási inter-arrival burstiness (the ACF and
  gap-domain companions of the round-11 overdispersion audit);
* experimentation — Wald SPRT day-by-day trace with ±ln 19 bounds,
  and IPS/SNIPS off-policy value of a uniform logging policy;
* embedding audits — simplified (centroid) silhouette per label;
* forensics — terminal-two-digit uniformity χ² of order totals (the
  last-digit complement of the Benford first-digit test);
* training-mix planning — Hamilton largest-remainder token-budget
  apportionment, per-source positional template profile, and the
  deterministic md5 shard plan;
* graph — Newman modularity of the 3-round LPA partition (shares the
  round-11 LPA CTE so the two can never desync).

Every entry follows the exact-integer oracle discipline (COVERAGE.md):
integer-grid summands, single-division emits, shared transcendental
literals, identical association both engines, unrounded raw-double
emits for ratios of exact integers, non-negative-operand integer
quotients only (BOTH Spark ``div`` and DuckDB ``//`` truncate toward
zero — verified live round 13: ``-4500 // 3600 = -1`` in DuckDB — but
the non-negative-operand rule stands so the question never matters).

Reference parity: the reference's surface stops at filter/join/
aggregate over ingested series (SURVEY §2); these extend the engine's
quant/curation north star like plans/catalog_quant.py (round 7) and
plans/catalog_round8/10/11.py.

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind anything still waiting
for a first driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicators as ind
from ..sources.registry import load_table
from .catalog import register
from .catalog_round8 import _ewma_stage_sql
from .catalog_round11 import _LPA_CTE
from .catalog_stock import _BARS_CTE


# ---------------------------------------------------------------------------
# trend indicators: DEMA, KST
# ---------------------------------------------------------------------------

@register("stock_dema", _BARS_CTE + """
, r0 AS (SELECT event_type, hr, close AS v0,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
         FROM bars),""" + _ewma_stage_sql(0, "r0", "v0", "v1") + ","
          + _ewma_stage_sql(1, "e0", "v1", "v2") + """
SELECT e0.event_type, e0.hr, e0.v1 AS ema,
       2.0 * e0.v1 - e1.v2 AS dema
FROM e0 JOIN e1 ON e1.event_type = e0.event_type AND e1.hr = e0.hr
ORDER BY e0.event_type, e0.hr
""")
def stock_dema(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mulloy DEMA: two chained banded-EWMA stages (each a 6-dp
    # canonical decimal), UNROUNDED 2·e1 − e2 combination
    ev = load_table(spark, sf_dir, "events")
    return ind.dema(ind.hourly_bars(ev))


def _kst_sql() -> str:
    rocs, smas, grid = ind.KST_ROCS, ind.KST_SMAS, ind.KST_GRID
    roc_cols = ",\n             ".join(
        f"CAST(round((close / lag(close, {n}) OVER w - 1.0) * {grid}, 0) "
        f"AS BIGINT) AS r{i}"
        for i, n in enumerate(rocs))
    sma_terms = " + ".join(
        f"CASE WHEN count(r{i}) OVER (PARTITION BY event_type ORDER BY hr "
        f"ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW) > 0 THEN "
        f"{i + 1} * (CAST(sum(r{i}) OVER (PARTITION BY event_type "
        f"ORDER BY hr ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW) "
        f"AS DOUBLE) / CAST(count(r{i}) OVER (PARTITION BY event_type "
        f"ORDER BY hr ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW) "
        f"AS DOUBLE)) END"
        for i, m in enumerate(smas))
    return _BARS_CTE + f"""
, k AS (SELECT event_type, hr,
             {roc_cols}
        FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY hr))
SELECT event_type, hr,
       ({sma_terms}) / {grid} AS kst
FROM k ORDER BY event_type, hr
"""


@register("stock_kst", _kst_sql())
def stock_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pring's KST: four 1e-6-grid ROCs, exact frame sums / non-null
    # counts, fixed left-to-right weighted blend, single grid division
    ev = load_table(spark, sf_dir, "events")
    return ind.kst(ind.hourly_bars(ev))


# ---------------------------------------------------------------------------
# arrival-process diagnostics: hourly ACF, burstiness
# ---------------------------------------------------------------------------

from ..operators.analytics import ACF_MAX_LAG as _ACF_MAX_LAG  # noqa: E402


@register("events_acf_hourly", f"""
WITH c AS (SELECT date_trunc('hour', ts) AS hr,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM c),
grid AS (SELECT unnest(generate_series(mn, mx,
                                       INTERVAL 1 HOUR)) AS hr FROM b),
d AS (SELECT CAST(epoch(g.hr) AS BIGINT) // 3600 AS t,
             coalesce(c.c, 0) AS c
      FROM grid g LEFT JOIN c ON c.hr = g.hr),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
j AS (SELECT l.lag, x.c AS x, y.c AS y
      FROM d x CROSS JOIN lags l JOIN d y ON y.t = x.t - l.lag),
g AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM j GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS acf
FROM g ORDER BY lag
""")
def events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ACF of the dense zero-filled hourly count series at lags 1..24:
    # exact BIGINT power sums per lag, one double correlation at emit
    from ..operators.analytics import hourly_count_acf
    ev = load_table(spark, sf_dir, "events")
    return hourly_count_acf(ev)


@register("events_burstiness", """
WITH d AS (SELECT event_type,
                  date_diff('second',
                            lag(ts) OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id),
                            ts) AS d
           FROM events),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(d * d) AS BIGINT) AS q
      FROM d WHERE d IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_s,
       CASE WHEN n >= 2 AND
                 sqrt(CASE WHEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                                        - 1.0)) > 0
                           THEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                                        - 1.0))
                           ELSE 0.0 END)
                 + CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
            THEN (sqrt(CASE WHEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                                         - 1.0)) > 0
                            THEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                                         - 1.0))
                            ELSE 0.0 END)
                  - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / (sqrt(CASE WHEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                   / (CAST(n AS DOUBLE)
                                      * (CAST(n AS DOUBLE) - 1.0)) > 0
                              THEN (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                   / (CAST(n AS DOUBLE)
                                      * (CAST(n AS DOUBLE) - 1.0))
                              ELSE 0.0 END)
                    + CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       END AS burstiness
FROM g ORDER BY event_type
""")
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Goh–Barabási B = (σ−μ)/(σ+μ) of per-type inter-arrival seconds:
    # exact integer gap power sums, one double expression at emit
    from ..operators.analytics import interarrival_burstiness
    ev = load_table(spark, sf_dir, "events")
    return interarrival_burstiness(ev)


# ---------------------------------------------------------------------------
# experimentation: SPRT trace, IPS off-policy value
# ---------------------------------------------------------------------------

def _sprt_sql() -> str:
    import math

    from ..operators import analytics as an

    grid = an.SPRT_LLR_GRID
    bound9 = int(round(math.log(an.SPRT_ALPHA_BOUND) * grid))
    lift = an.SPRT_LIFT
    return f"""
WITH daily AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
              ELSE 'weekday' END AS arm,
         date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events GROUP BY 1, 2),
pooled AS (SELECT CAST(sum(k) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS p0
           FROM daily),
q AS (SELECT arm, day,
             CAST(round((k * ln(least(p0 * {lift!r}, 0.999) / p0)
                         + (n - k) * ln((1.0 - least(p0 * {lift!r}, 0.999))
                                        / (1.0 - p0))) * {grid}, 0)
                  AS BIGINT) AS t9
      FROM daily, pooled),
cum AS (SELECT arm, day,
               CAST(sum(t9) OVER (PARTITION BY arm ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS llr9
        FROM q),
first_x AS (SELECT arm, CAST(day AS DATE) AS crossing_day,
                   CASE WHEN llr9 >= {bound9} THEN 'accept_h1'
                        ELSE 'accept_h0' END AS decision
            FROM (SELECT *, row_number() OVER (PARTITION BY arm
                                               ORDER BY day) AS rn
                  FROM cum
                  WHERE llr9 >= {bound9} OR llr9 <= -{bound9})
            WHERE rn = 1),
fin AS (SELECT arm, llr9 AS final_llr9
        FROM (SELECT *, row_number() OVER (PARTITION BY arm
                                           ORDER BY day DESC) AS rn
              FROM cum) WHERE rn = 1),
days AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_days
         FROM cum GROUP BY arm)
SELECT d.arm, d.n_days, f.final_llr9, x.crossing_day,
       coalesce(x.decision, 'censored') AS decision
FROM days d JOIN fin f ON f.arm = d.arm
LEFT JOIN first_x x ON x.arm = d.arm
ORDER BY d.arm
"""


@register("events_sprt_trace", _sprt_sql())
def events_sprt_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wald SPRT per arm (weekend vs weekday) on daily purchase
    # conversion: 1e-9-grid LLR increments, exact integer running sum,
    # integer boundary comparisons at ±ln 19
    from ..operators.analytics import sprt_conversion_trace
    ev = load_table(spark, sf_dir, "events")
    return sprt_conversion_trace(ev)


def _ips_sql() -> str:
    from ..operators import analytics as an

    grid = an.IPS_GRID
    return f"""
WITH base AS (SELECT event_type, hour(ts) AS hod, value FROM events),
cth AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2),
nh AS (SELECT hod, CAST(count(*) AS BIGINT) AS nh
       FROM base GROUP BY 1),
k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM base),
j AS (SELECT b.value,
             CAST(round(b.value * (CAST(n.nh AS DOUBLE) / (kk.k * c.c))
                        * {grid}, 0) AS BIGINT) AS c6,
             CAST(round((CAST(n.nh AS DOUBLE) / (kk.k * c.c))
                        * {grid}, 0) AS BIGINT) AS w6
      FROM base b
      JOIN cth c ON c.event_type = b.event_type AND c.hod = b.hod
      JOIN nh n ON n.hod = b.hod
      CROSS JOIN k kk),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(c6) AS BIGINT) AS sc6,
             CAST(sum(w6) AS BIGINT) AS sw6
      FROM j)
SELECT n_events, (SELECT k FROM k) AS n_types,
       CAST(sc6 AS DOUBLE) / (CAST(n_events AS DOUBLE) * {grid}) AS ips_value,
       CASE WHEN sw6 > 0
            THEN CAST(sc6 AS DOUBLE) / CAST(sw6 AS DOUBLE)
       END AS snips_value
FROM g
"""


@register("events_ips_value", _ips_sql())
def events_ips_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IPS + SNIPS value of a uniform policy from hour-of-day empirical
    # propensities: 1e-6-grid contributions, exact sums, emit divisions
    from ..operators.analytics import ips_uniform_policy_value
    ev = load_table(spark, sf_dir, "events")
    return ips_uniform_policy_value(ev)


# ---------------------------------------------------------------------------
# embedding audit: simplified silhouette
# ---------------------------------------------------------------------------

def _silhouette_sql() -> str:
    from ..operators import similarity as sim

    grid = sim.SIL_GRID
    return f"""
WITH ex AS (SELECT vec_id AS vid, label AS lbl, u.i - 1 AS j,
                   CAST(round(u.x * 1e6, 0) AS BIGINT) AS x
            FROM (SELECT vec_id, label,
                         unnest(list_transform(embedding::DOUBLE[],
                                (x, i) -> struct_pack(x := x, i := i))) AS u
                  FROM embeddings)),
cent AS (SELECT lbl AS clbl, j, CAST(sum(x) AS BIGINT) AS sx,
                count(*) AS n
         FROM ex GROUP BY lbl, j),
c2 AS (SELECT clbl, j,
              CASE WHEN sx >= 0
                   THEN CAST(floor((2 * sx + n) / (2 * n)) AS BIGINT)
                   ELSE -CAST(floor((2 * -sx + n) / (2 * n)) AS BIGINT)
              END AS c
       FROM cent),
d2 AS (SELECT e.vid, e.lbl, c.clbl,
              CAST(sum((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS d2
       FROM ex e JOIN c2 c ON e.j = c.j
       GROUP BY e.vid, e.lbl, c.clbl),
per AS (SELECT vid, lbl,
               max(CASE WHEN lbl = clbl THEN d2 END) AS a2,
               min(CASE WHEN lbl <> clbl THEN d2 END) AS b2
        FROM d2 GROUP BY vid, lbl),
lsz AS (SELECT label AS lbl, CAST(count(*) AS BIGINT) AS lsz
        FROM embeddings GROUP BY label),
s AS (SELECT p.lbl,
             CASE WHEN z.lsz = 1 THEN 0
                  WHEN a2 = 0 AND b2 = 0 THEN 0
                  ELSE CAST(round((sqrt(b2) - sqrt(a2))
                                  / greatest(sqrt(a2), sqrt(b2))
                                  * {grid}, 0) AS BIGINT)
             END AS s6
      FROM per p JOIN lsz z ON z.lbl = p.lbl WHERE b2 IS NOT NULL)
SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(s6) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * {grid})
         AS mean_silhouette
FROM s GROUP BY lbl ORDER BY lbl
"""


@register("embedding_silhouette", _silhouette_sql())
def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    # centroid-based silhouette per label: exact integer centroids and
    # distances, 1e-6-grid per-vector scores, one mean division
    from ..operators.similarity import simplified_silhouette
    e = load_table(spark, sf_dir, "embeddings")
    return simplified_silhouette(e)


# ---------------------------------------------------------------------------
# forensics: terminal-digit uniformity
# ---------------------------------------------------------------------------

@register("orders_digit_uniformity", """
WITH obs AS (SELECT ((CAST(round(o_totalprice * 100, 0) AS BIGINT)
                      % 100) + 100) % 100 AS digits,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1),
grid AS (SELECT unnest(generate_series(0, 99)) AS digits),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
g AS (SELECT CAST(grid.digits AS BIGINT) AS digits,
             coalesce(obs.n_obs, 0) AS n_obs, tot.n
      FROM grid LEFT JOIN obs ON obs.digits = grid.digits, tot)
SELECT digits, n_obs, CAST(n AS DOUBLE) / 100.0 AS expected,
       CASE WHEN n > 0
            THEN (100.0 * n_obs - CAST(n AS DOUBLE))
                 * (100.0 * n_obs - CAST(n AS DOUBLE))
                 / (100.0 * CAST(n AS DOUBLE))
       END AS chi2_term
FROM g ORDER BY digits
""")
def orders_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cents-pair 00..99 uniformity census of o_totalprice with exact
    # per-bucket chi-square terms — the last-digit fraud forensic
    from ..operators.quality import last_digit_uniformity
    o = load_table(spark, sf_dir, "orders")
    return last_digit_uniformity(o, "o_totalprice")


# ---------------------------------------------------------------------------
# training-mix planning: token budget, positional templates, shard plan
# ---------------------------------------------------------------------------

def _budget_sql() -> str:
    from ..operators import corpus as co

    t = co.TOKEN_BUDGET
    return f"""
WITH toks AS (SELECT source,
                     CAST(sum(len(list_filter(string_split(text, ' '),
                                              x -> x != ''))) AS BIGINT)
                       AS n_tokens
              FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM toks),
base AS (SELECT source, n_tokens,
                CAST(({t} * n_tokens) // total AS BIGINT) AS q_floor,
                CAST(({t} * n_tokens) % total AS BIGINT) AS rem
         FROM toks, tot),
r AS (SELECT *,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             {t} - CAST(sum(q_floor) OVER () AS BIGINT) AS short
      FROM base)
SELECT source, n_tokens,
       CAST(q_floor + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM r ORDER BY source
"""


@register("corpus_token_budget", _budget_sql())
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact Hamilton largest-remainder apportionment of a 1M-token
    # budget across sources (ties by source name); Σquota == budget
    from ..operators.corpus import token_budget_plan
    d = load_table(spark, sf_dir, "documents")
    return token_budget_plan(d)


def _template_sql() -> str:
    from ..operators import corpus as co

    p = co.TEMPLATE_POSITIONS
    return f"""
WITH ex AS (SELECT source, t.i AS pos, t.w AS word
            FROM (SELECT source,
                         unnest(list_transform(
                             list_filter(string_split(text, ' '),
                                         x -> x != '')[:{p}],
                             (w, i) -> struct_pack(w := w, i := i))) AS t
                  FROM documents)),
cnt AS (SELECT source, pos, word, CAST(count(*) AS BIGINT) AS c
        FROM ex GROUP BY 1, 2, 3),
g AS (SELECT source, pos, word, c,
             CAST(sum(c) OVER (PARTITION BY source, pos) AS BIGINT)
               AS n_docs,
             row_number() OVER (PARTITION BY source, pos
                                ORDER BY c DESC, word ASC) AS rn
      FROM cnt)
SELECT source, CAST(pos AS BIGINT) AS pos, word AS top_word, n_docs,
       CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE) AS share
FROM g WHERE rn = 1 ORDER BY source, pos
"""


@register("corpus_positional_template", _template_sql())
def corpus_positional_template(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # per-source modal word and share at the first 8 word slots — the
    # template/boilerplate-opening detector
    from ..operators.corpus import positional_template_profile
    d = load_table(spark, sf_dir, "documents")
    return positional_template_profile(d)


def _shard_sql() -> str:
    from ..operators import corpus as co

    n = co.SHARD_COUNT
    return f"""
WITH g AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % {n} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    x -> x != ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
               CAST(sum(n_tokens) AS BIGINT) AS tt FROM g)
SELECT shard, n_docs, n_tokens,
       CAST(n_docs AS DOUBLE) * {n} / CAST(td AS DOUBLE) AS doc_skew,
       CAST(n_tokens AS DOUBLE) * {n} / CAST(tt AS DOUBLE) AS token_skew
FROM g, tot ORDER BY shard
"""


@register("corpus_shard_plan", _shard_sql())
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic md5 doc_id sharding into 8 shards with doc/token
    # balance ratios — the pre-flight layout audit
    from ..operators.corpus import shard_plan
    d = load_table(spark, sf_dir, "documents")
    return shard_plan(d)


# ---------------------------------------------------------------------------
# graph: LPA modularity (shares the round-11 LPA CTE)
# ---------------------------------------------------------------------------

@register("graph_modularity", _LPA_CTE + """,
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM e GROUP BY src),
dc AS (SELECT l.lab, CAST(sum(d.d) AS BIGINT) AS dc
       FROM l3 l JOIN deg d ON d.node = l.node GROUP BY l.lab),
ec AS (SELECT lx.lab, CAST(count(*) AS BIGINT) AS ec
       FROM und u JOIN l3 lx ON u.x = lx.node
       JOIN l3 ly ON u.y = ly.node
       WHERE lx.lab = ly.lab GROUP BY lx.lab),
t AS (SELECT d.lab,
             CAST(4 * (SELECT m FROM m) * coalesce(e.ec, 0)
                  - d.dc * d.dc AS BIGINT) AS t4m2
      FROM dc d LEFT JOIN ec e ON e.lab = d.lab)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM l3) AS n_nodes,
       (SELECT m FROM m) AS m_edges,
       CAST(count(*) AS BIGINT) AS n_communities,
       CAST(CAST(sum(t4m2) AS BIGINT) AS DOUBLE)
         / (4.0 * CAST((SELECT m FROM m) AS DOUBLE)
            * CAST((SELECT m FROM m) AS DOUBLE)) AS modularity
FROM t
""")
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Newman modularity of the 3-round LPA partition over the
    # co-purchase part graph: integer numerator Σ(4·m·e_c − d_c²),
    # one division by 4m² at emit
    from ..operators.analytics import lpa_modularity
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return lpa_modularity(pairs, "pa", "pb", iters=3)


# ---------------------------------------------------------------------------
# batch 2: price-volume indicators, microstructure, forensics, streaming twin
# ---------------------------------------------------------------------------

def _emv_sql() -> str:
    g, n = ind.EMV_GRID, ind.EMV_SMA_N
    return _BARS_CTE + f"""
, b AS (SELECT event_type, hr, volume,
               CAST(round(high * 100, 0) AS BIGINT)
                 + CAST(round(low * 100, 0) AS BIGINT) AS hm2,
               CAST(round(high * 100, 0) AS BIGINT)
                 - CAST(round(low * 100, 0) AS BIGINT) AS rng
        FROM bars),
q AS (SELECT event_type, hr,
             CASE WHEN lag(hm2) OVER w IS NOT NULL AND rng > 0
                       AND volume > 0
                  THEN CAST(round(CAST(hm2 - lag(hm2) OVER w AS DOUBLE)
                                  * CAST(rng AS DOUBLE)
                                  / (20000.0 * CAST(volume AS DOUBLE))
                                  * {g}, 0) AS BIGINT)
             END AS emv6
      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY hr))
SELECT event_type, hr, CAST(emv6 AS DOUBLE) / {g} AS emv,
       CASE WHEN count(emv6) OVER f > 0
            THEN CAST(sum(emv6) OVER f AS DOUBLE)
                 / (CAST(count(emv6) OVER f AS DOUBLE) * {g})
       END AS emv_sma
FROM q WINDOW f AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
"""


@register("stock_emv", _emv_sql())
def stock_emv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arms' Ease of Movement: half-cent midpoint moves x cent ranges /
    # integer volume, 1e-6 per-bar grid, exact SMA sums
    ev = load_table(spark, sf_dir, "events")
    return ind.ease_of_movement(ind.hourly_bars(ev))


def _bop_sql() -> str:
    n = ind.BOP_SMA_N
    return _BARS_CTE + f"""
, b AS (SELECT event_type, hr,
               1000000 * (CAST(round(close * 100, 0) AS BIGINT)
                          - CAST(round(open * 100, 0) AS BIGINT)) AS s,
               CAST(round(high * 100, 0) AS BIGINT)
                 - CAST(round(low * 100, 0) AS BIGINT) AS rng
        FROM bars),
q AS (SELECT event_type, hr,
             CASE WHEN rng > 0 THEN
               CASE WHEN s >= 0
                    THEN CAST(floor((2 * s + rng)
                                    / (2 * rng)) AS BIGINT)
                    ELSE -CAST(floor((2 * -s + rng)
                                     / (2 * rng)) AS BIGINT)
               END
             END AS bop6
      FROM b)
SELECT event_type, hr, CAST(bop6 AS DOUBLE) / 1e6 AS bop,
       CASE WHEN count(bop6) OVER f > 0
            THEN CAST(sum(bop6) OVER f AS DOUBLE)
                 / (CAST(count(bop6) OVER f AS DOUBLE) * 1e6)
       END AS bop_sma
FROM q WINDOW f AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
"""


@register("stock_bop", _bop_sql())
def stock_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Balance of Power: half-away integer division of cent deltas by
    # cent ranges (grid-half safe), exact SMA sums
    ev = load_table(spark, sf_dir, "events")
    return ind.balance_of_power(ind.hourly_bars(ev))


def _chaikin_vol_sql() -> str:
    lag_n = ind.CHAIKIN_VOL_LAG
    return _BARS_CTE + """
, r0 AS (SELECT event_type, hr,
         CAST(CAST(round(high * 100, 0) AS BIGINT)
              - CAST(round(low * 100, 0) AS BIGINT) AS DOUBLE) / 100.0
           AS v0,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
         FROM bars),""" + _ewma_stage_sql(0, "r0", "v0", "erng") + f"""
SELECT event_type, hr, erng AS ema_range,
       CASE WHEN lag(erng, {lag_n}) OVER (PARTITION BY event_type
                                          ORDER BY hr) > 0
            THEN (erng / lag(erng, {lag_n})
                    OVER (PARTITION BY event_type ORDER BY hr) - 1.0)
                 * 100.0
       END AS chaikin_vol
FROM e0 ORDER BY event_type, hr
"""


@register("stock_chaikin_vol", _chaikin_vol_sql())
def stock_chaikin_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chaikin Volatility: banded-EWMA of the cent range (6-dp
    # canonical), 10-bar UNROUNDED rate of change (the trix rule)
    ev = load_table(spark, sf_dir, "events")
    return ind.chaikin_volatility(ind.hourly_bars(ev))


def _cs_sql() -> str:
    g = ind.CS_GRID
    return _BARS_CTE + f"""
, b AS (SELECT event_type, hr,
               CAST(round(high * 100, 0) AS BIGINT) AS h,
               CAST(round(low * 100, 0) AS BIGINT) AS l
        FROM bars
        WHERE round(low * 100, 0) > 0
          AND round(high * 100, 0) >= round(low * 100, 0)),
q AS (SELECT event_type, hr, h, l,
             CAST(round(ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                        * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                        * {g}, 0) AS BIGINT) AS q
      FROM b),
pair AS (SELECT event_type,
                q + lag(q) OVER w AS beta12,
                CASE WHEN lag(q) OVER w IS NOT NULL
                     THEN CAST(round(
                            ln(CAST(greatest(h, lag(h) OVER w) AS DOUBLE)
                               / CAST(least(l, lag(l) OVER w) AS DOUBLE))
                            * ln(CAST(greatest(h, lag(h) OVER w) AS DOUBLE)
                                 / CAST(least(l, lag(l) OVER w) AS DOUBLE))
                            * {g}, 0) AS BIGINT)
                END AS gamma12
         FROM q WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
s AS (SELECT event_type,
             CAST(round(greatest(
               2.0 * (exp((sqrt(2.0 * (CAST(beta12 AS DOUBLE) / {g}))
                           - sqrt(CAST(beta12 AS DOUBLE) / {g}))
                          / (3.0 - 2.0 * sqrt(2.0))
                          - sqrt((CAST(gamma12 AS DOUBLE) / {g})
                                 / (3.0 - 2.0 * sqrt(2.0)))) - 1.0)
               / (1.0 + exp((sqrt(2.0 * (CAST(beta12 AS DOUBLE) / {g}))
                             - sqrt(CAST(beta12 AS DOUBLE) / {g}))
                            / (3.0 - 2.0 * sqrt(2.0))
                            - sqrt((CAST(gamma12 AS DOUBLE) / {g})
                                   / (3.0 - 2.0 * sqrt(2.0))))),
               0.0) * 1e6, 0) AS BIGINT) AS s6
      FROM pair WHERE gamma12 IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(s6) AS BIGINT)
         / (CAST(count(*) AS DOUBLE) * 1e6) AS mean_spread
FROM s GROUP BY event_type ORDER BY event_type
"""


@register("stock_corwin_schultz", _cs_sql())
def stock_corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corwin-Schultz high-low spread estimator: 1e-12-grid squared-log
    # range terms, one double alpha/spread expression per bar pair,
    # 1e-6 re-quantized per-symbol mean
    ev = load_table(spark, sf_dir, "events")
    return ind.corwin_schultz_spread(ind.hourly_bars(ev))


def _dup_invoice_sql() -> str:
    from ..operators import quality as q

    w = q.DUP_INVOICE_WINDOW_DAYS
    mult = 100 // q.DUP_INVOICE_REL_GAP_PCT
    return f"""
WITH base AS (SELECT o_orderkey AS k, o_custkey AS c,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS amt,
                     o_orderdate AS d
              FROM orders)
SELECT a.c AS o_custkey, a.k AS okey_a, b.k AS okey_b,
       a.amt / 100.0 AS amount_a, b.amt / 100.0 AS amount_b,
       CAST(date_diff('day', a.d, b.d) AS BIGINT) AS days_apart,
       CAST((1000000 * abs(a.amt - b.amt)) // least(a.amt, b.amt)
            AS BIGINT) AS rel_gap_e6
FROM base a JOIN base b
  ON a.c = b.c
 AND (a.d < b.d OR (a.d = b.d AND a.k < b.k))
 AND date_diff('day', a.d, b.d) <= {w}
 AND {mult} * abs(a.amt - b.amt) <= least(a.amt, b.amt)
ORDER BY o_custkey, okey_a, okey_b
"""


@register("orders_duplicate_invoices", _dup_invoice_sql())
def orders_duplicate_invoices(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # double-billing forensic: same customer, amounts within 1%, within
    # 7 days — custkey self-join, integer cross-multiplied band test
    from ..operators.quality import near_duplicate_invoices
    o = load_table(spark, sf_dir, "orders")
    return near_duplicate_invoices(o)


@register("streaming_digit_uniformity", """
WITH obs AS (SELECT ((CAST(round(value * 100, 0) AS BIGINT)
                      % 100) + 100) % 100 AS digits,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM events WHERE value IS NOT NULL GROUP BY 1),
grid AS (SELECT unnest(generate_series(0, 99)) AS digits),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
g AS (SELECT CAST(grid.digits AS BIGINT) AS digits,
             coalesce(obs.n_obs, 0) AS n_obs, tot.n
      FROM grid LEFT JOIN obs ON obs.digits = grid.digits, tot)
SELECT digits, n_obs, CAST(n AS DOUBLE) / 100.0 AS expected,
       CASE WHEN n > 0
            THEN (100.0 * n_obs - CAST(n AS DOUBLE))
                 * (100.0 * n_obs - CAST(n AS DOUBLE))
                 / (100.0 * CAST(n AS DOUBLE))
       END AS chi2_term
FROM g ORDER BY digits
""")
def streaming_digit_uniformity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # the last-digit uniformity forensic as a REAL streaming query:
    # 100-row streaming aggregate drained availableNow, the batch
    # zero-fill/chi-square tail applied unchanged to the drained sink
    import os

    from ..streaming.events import streaming_digit_uniformity as sdu
    return sdu(spark, os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# batch 3: VPIN, eigenvector centrality, coverage curve, new-user mix
# ---------------------------------------------------------------------------

def _vpin_sql() -> str:
    b = ind.VPIN_BUCKET
    return f"""
WITH t AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
s0 AS (
  SELECT event_type, ts, event_id,
         CASE WHEN cents - lag(cents) OVER w > 0 THEN 1
              WHEN cents - lag(cents) OVER w < 0 THEN -1
         END AS raw,
         row_number() OVER w - 1 AS rn
  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
s1 AS (
  SELECT event_type, rn,
         last_value(raw IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM s0),
bk AS (
  SELECT event_type, rn // {b} AS bkt,
         CAST(count(*) AS BIGINT) AS n,
         CAST(abs(sum(s)) AS BIGINT) AS imb
  FROM s1 WHERE s IS NOT NULL GROUP BY 1, 2),
q AS (SELECT event_type, (1000000 * imb) // {b} AS q6
      FROM bk WHERE n = {b})
SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(q6) AS BIGINT)
         / (CAST(count(*) AS DOUBLE) * 1e6) AS vpin
FROM q GROUP BY event_type ORDER BY event_type
"""


@register("stock_vpin", _vpin_sql())
def stock_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VPIN flow toxicity: tick-rule signs with deterministic
    # carry-forward, 50-tick volume buckets, exact integer imbalance,
    # complete buckets only
    ev = load_table(spark, sf_dir, "events")
    return ind.vpin(ev)


def _eig_sql() -> str:
    from ..operators.analytics import EIG_SCALE as S

    it = """
y{i} AS (SELECT e.dst AS node, CAST(sum(x.r) AS BIGINT) AS r
         FROM e JOIN x{p} x ON e.src = x.node GROUP BY e.dst),
x{i} AS (SELECT node,
                ({S} * r) // greatest((SELECT max(r) FROM y{i}), 1) AS r
         FROM y{i})"""
    rounds = ",".join(it.format(i=i, p=i - 1, S=S) for i in (1, 2, 3))
    return f"""
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS x, b.i AS y
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
e AS (SELECT x AS src, y AS dst FROM und
      UNION ALL SELECT y, x FROM und),
x0 AS (SELECT DISTINCT src AS node, CAST({S} AS BIGINT) AS r FROM e),
{rounds}
SELECT node, CAST(r AS BIGINT) AS score_e6
FROM x3 ORDER BY r DESC, node LIMIT 20
"""


@register("graph_eigencentrality", _eig_sql())
def graph_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # undamped spectral centrality over the co-purchase part graph:
    # 3 integer power iterations, inf-norm renorm on the 1e-6 grid
    from ..operators.analytics import eigenvector_centrality
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return eigenvector_centrality(pairs, "pa", "pb", iters=3, top=20)


def _coverage_sql() -> str:
    from ..operators import corpus as co

    cuts = ", ".join(f"({c})" for c in co.COVERAGE_CUTOFFS)
    return f"""
WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                       x -> x != '')) AS w
             FROM documents),
vc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
ranked AS (SELECT c,
                  row_number() OVER (ORDER BY c DESC, w ASC) AS rk,
                  CAST(sum(c) OVER (ORDER BY c DESC, w ASC
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS cum
           FROM vc),
tot AS (SELECT CAST(max(cum) AS BIGINT) AS total,
               CAST(max(rk) AS BIGINT) AS v FROM ranked),
cuts(cutoff) AS (VALUES {cuts})
SELECT CAST(c.cutoff AS BIGINT) AS cutoff,
       least(c.cutoff, coalesce(t.v, 0)) AS n_vocab,
       CAST(coalesce(r.cum, 0) AS BIGINT) AS covered_tokens,
       CASE WHEN t.total > 0
            THEN CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE)
       END AS coverage
FROM cuts c CROSS JOIN tot t
LEFT JOIN ranked r ON r.rk = least(c.cutoff, t.v)
ORDER BY cutoff
"""


@register("corpus_coverage_curve", _coverage_sql())
def corpus_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-N vocabulary token-coverage curve at N in (100, 1k, 10k):
    # exact rank/cumsum on the vocab relation, one division per cutoff
    from ..operators.corpus import vocab_coverage_curve
    d = load_table(spark, sf_dir, "documents")
    return vocab_coverage_curve(d)


@register("events_new_user_share", """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
           FROM events GROUP BY user_id),
j AS (SELECT CAST(e.ts AS DATE) AS day,
             CASE WHEN CAST(e.ts AS DATE) = f.first_day
                  THEN 1 ELSE 0 END AS is_new
      FROM events e JOIN f ON f.user_id = e.user_id)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_new) AS BIGINT) AS n_new_user_events,
       CAST(sum(is_new) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS new_share
FROM j GROUP BY day ORDER BY day
""")
def events_new_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-day share of events from first-seen-that-day users — the
    # acquisition-mix drift monitor behind cohort dashboards
    from ..operators.analytics import new_user_share
    ev = load_table(spark, sf_dir, "events")
    return new_user_share(ev)


# ---------------------------------------------------------------------------
# batch 4: streaming new-user-mix twin, events DQ suite
# ---------------------------------------------------------------------------

@register("streaming_new_user_share", """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
           FROM events GROUP BY user_id),
j AS (SELECT CAST(e.ts AS DATE) AS day,
             CASE WHEN CAST(e.ts AS DATE) = f.first_day
                  THEN 1 ELSE 0 END AS is_new
      FROM events e JOIN f ON f.user_id = e.user_id)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_new) AS BIGINT) AS n_new_user_events,
       CAST(sum(is_new) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS new_share
FROM j GROUP BY day ORDER BY day
""")
def streaming_new_user_share(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # the acquisition-mix monitor as a REAL streaming query: bounded
    # (user, day, n) streaming aggregate drained availableNow, the
    # batch first-day/share tail applied unchanged to the drained sink
    import os

    from ..operators.analytics import new_user_share_from_counts
    from ..streaming.events import streaming_user_day_counts
    counts = streaming_user_day_counts(
        spark, os.path.join(sf_dir, "events.parquet"))
    return new_user_share_from_counts(counts)


@register("dq_events_constraints", """
WITH ra AS (SELECT count(*) AS n,
    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nn_user,
    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nn_ts,
    CAST(sum(CASE WHEN value IS NOT NULL AND value < 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS rng,
    CAST(sum(CASE WHEN event_type IS NOT NULL
                   AND event_type NOT IN ('click', 'error', 'purchase',
                                          'signup', 'view')
                  THEN 1 ELSE 0 END) AS BIGINT) AS st
  FROM events),
u AS (SELECT CAST(sum(c) AS BIGINT) AS checked,
             CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS viol
      FROM (SELECT event_id, count(*) AS c FROM events GROUP BY 1))
SELECT 'event_id_unique' AS constraint_name, viol AS violations,
       checked FROM u
UNION ALL SELECT 'event_type_in_set', st, n FROM ra
UNION ALL SELECT 'ts_not_null', nn_ts, n FROM ra
UNION ALL SELECT 'user_id_not_null', nn_user, n FROM ra
UNION ALL SELECT 'value_in_range', rng, n FROM ra
ORDER BY constraint_name
""")
def dq_events_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Deequ-lite suite over the events table: one fused row-rule
    # aggregation + one uniqueness groupBy (operators/quality.dq_check
    # compiles the whole suite to <= 3 passes whatever the rule count)
    from ..operators.quality import (UniqueRule, dq_check, in_range,
                                     in_set, not_null)
    ev = load_table(spark, sf_dir, "events")
    return dq_check(ev, [
        not_null("user_id"), not_null("ts"),
        in_range("value", lo=0.0),
        in_set("event_type",
               ("click", "error", "purchase", "signup", "view")),
        UniqueRule("event_id_unique", ("event_id",)),
    ])


# ---------------------------------------------------------------------------
# batch 5: multimodal shard balance, hour-of-day entropy, doc-length Gini
# ---------------------------------------------------------------------------

def _mm_balance_sql() -> str:
    from ..operators import corpus as co
    from .catalog_corpus import _MM_ITEMS_CTE

    n = co.SHARD_COUNT
    return _MM_ITEMS_CTE + f""",
g AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         ::BIGINT % {n} AS shard,
       modality,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(tokens) AS BIGINT) AS n_tokens
      FROM u GROUP BY 1, 2),
tot AS (SELECT modality, CAST(sum(n_tokens) AS BIGINT) AS mt
        FROM g GROUP BY modality)
SELECT g.shard, g.modality, g.n_items, g.n_tokens,
       CAST(g.n_tokens AS DOUBLE) * {n} / CAST(t.mt AS DOUBLE)
         AS token_skew
FROM g JOIN tot t ON t.modality = g.modality
ORDER BY g.shard, g.modality
"""


@register("multimodal_shard_balance", _mm_balance_sql())
def multimodal_shard_balance(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # modality-balanced shard audit for the interleaved multimodal
    # pack: md5 doc sharding (text+media co-located), per-(shard,
    # modality) exact counts, token share vs the fair 1/n
    from ..operators.multimodal import shard_modality_balance
    d = load_table(spark, sf_dir, "documents")
    return shard_modality_balance(d)


@register("events_hour_entropy", """
WITH g AS (SELECT event_type, hour(ts) AS hod,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
a AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_hours_active,
             CAST(sum(CAST(round(c * ln(c) * 1000000.0, 0) AS BIGINT))
                  AS BIGINT) AS t
      FROM g GROUP BY event_type)
SELECT event_type, n AS n_events, n_hours_active,
       ln(CAST(n AS DOUBLE))
         - (CAST(t AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE)
         AS entropy
FROM a ORDER BY event_type
""")
def events_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hour-of-day Shannon entropy per type on the exact c·ln c grid —
    # around-the-clock vs single-spike usage
    from ..operators.analytics import hour_of_day_entropy
    ev = load_table(spark, sf_dir, "events")
    return hour_of_day_entropy(ev)


@register("corpus_doc_length_gini", f"""
WITH x AS (
  SELECT source AS g, doc_id AS e,
         CAST(len(list_filter(string_split(text, ' '), t -> t != ''))
              AS BIGINT) AS x
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), t -> t != '')) > 0
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
SELECT g AS source, n AS n_entities, sx AS n_rows,
       CASE WHEN den > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS gini
FROM b ORDER BY source
""")
def corpus_doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token-length inequality across documents per source (rank-formula
    # Gini on the length histogram — the grouped_count_gini kernel over
    # exploded tokens): a high-Gini source mixes stubs with tomes and
    # skews any per-doc sampling
    from ..functions.text import words
    from ..operators.analytics import grouped_count_gini
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", "doc_id",
                   F.explode(words("text")).alias("_w"))
    return grouped_count_gini(tok, "source", "doc_id")
