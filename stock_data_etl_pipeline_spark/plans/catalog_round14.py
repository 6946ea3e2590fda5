"""Round-14 catalog entries.

Four families, all over machinery the engine already ships:

* index tuning sweeps — precision/recall of banded MinHash-LSH as a
  FUNCTION of the band count (`dedup_lsh_band_sweep`): the S-curve read
  before choosing a banding, the MinHash twin of round-13's
  `ann_recall_vs_nprobe` (one shared signature pass, one shared exact
  ground truth); and PQ-ADC recall as a function of the sub-space
  count (`ann_pq_m_sweep`) — the quantization-granularity knee, graded
  against exact squared-L2 (the metric ADC approximates).
* join/scan economics — an explicit Bloom-filter runtime-filter
  (`events_bloom_prune`) reporting the false-positive economics of
  pruning a probe side against a build-side membership sketch, and a
  Poisson-bootstrap standard error (`events_bootstrap_ci`) — the
  resampling scheme that distributes (per-row deterministic replicate
  weights; no resampled copies of the data ever exist), plus its
  Structured-Streaming twin `streaming_bootstrap_ci` (partials
  maintained by a live keyed aggregation, CI finalized on the drained
  sink — order-independent by construction, so the batch oracle is
  exact).
* distribution shift / causal reads — 1-Wasserstein weekday-vs-weekend
  shift per event type with an exact integer-arithmetic CDF area
  (`events_wasserstein_shift`), and a stratified treated-vs-control
  comparison on mean-relative activity strata
  (`events_propensity_strata`).
* three daily indicators the stock family lacked: KAMA (data-dependent
  smoothing via engine-portable sequential folds), the mass index
  (double-EMA bulge), and the Coppock curve (`stock_kama`,
  `stock_mass_index`, `stock_coppock`).

Exact-integer oracle discipline throughout (COVERAGE.md): integer
cents/counts until a single rounded emit, BIGINT casts on aggregates,
shared constants interpolated into the SQL from the same Python values
the Spark builders close over. The KAMA/mass recursions are sequential
folds on BOTH engines (F.aggregate / list_reduce over per-symbol
calendar-bounded arrays), so their float association order matches by
construction.

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind anything still waiting
for a first driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import indicators as ind
from ..operators.joins import (
    BLOOM_K,
    BLOOM_M,
    BLOOM_PRIME,
    bloom_constants,
    bloom_prune_report,
)
from ..sources.registry import load_table
from .catalog import register
from .catalog_text import _JACCARD_CTES

# ---------------------------------------------------------------------------
# dedup_lsh_band_sweep
# ---------------------------------------------------------------------------

LSH_SWEEP_HASHES = 12
LSH_SWEEP_BANDS = (1, 2, 3, 4, 6)
LSH_SWEEP_THRESHOLD = 0.5


def _lsh_band_sweep_sql(num_hashes: int = LSH_SWEEP_HASHES,
                        band_counts: tuple = LSH_SWEEP_BANDS,
                        threshold: float = LSH_SWEEP_THRESHOLD) -> str:
    """Oracle for the band sweep, interpolating the SAME constants and
    minhash family the Spark builder uses (the _ann_sweep_sql pattern)."""
    band_counts = sorted({int(b) for b in band_counts})
    p = DD.MINHASH_PRIME
    consts = DD.minhash_constants(num_hashes)
    mh = ", ".join(
        f"list_aggregate(list_transform(hv, v -> ({a} * v + {b}) % {p}), "
        f"'min') AS mh_{i}"
        for i, (a, b) in enumerate(consts))
    parts = []
    for b in band_counts:
        rows = num_hashes // b
        band_selects = " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band, md5(concat_ws('|', "
            + ", ".join(f"mh_{i * rows + r}" for r in range(rows))
            + ")) AS bsig FROM sig"
            for i in range(b))
        parts.append(f"""
cand_{b} AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM ({band_selects}) a JOIN ({band_selects}) b
               ON a.band = b.band AND a.bsig = b.bsig
              AND a.doc_id < b.doc_id),
stat_{b} AS (SELECT CAST({b} AS BIGINT) AS bands,
                    CAST({rows} AS BIGINT) AS rows_per_band,
                    CAST(count(*) AS BIGINT) AS n_cand,
                    CAST(COALESCE(sum(CASE WHEN e.id_a IS NOT NULL
                                           THEN 1 ELSE 0 END), 0)
                         AS BIGINT) AS n_hit
             FROM cand_{b} c LEFT JOIN exact e
               ON c.id_a = e.id_a AND c.id_b = e.id_b)""")
    union = " UNION ALL ".join(f"SELECT * FROM stat_{b}"
                               for b in band_counts)
    return f"""
WITH {_JACCARD_CTES},
ne AS (SELECT doc_id, shs AS hv FROM sh WHERE len(shs) > 0),
sig AS (SELECT doc_id, {mh} FROM ne),
exact AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
nex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact),
{", ".join(parts)},
stats AS ({union})
SELECT bands, rows_per_band, n_cand, n_hit, n_exact,
       round(CASE WHEN n_cand > 0
                  THEN n_hit / CAST(n_cand AS DOUBLE) END, 6) AS precision,
       round(CASE WHEN n_exact > 0
                  THEN n_hit / CAST(n_exact AS DOUBLE) END, 6) AS recall
FROM stats CROSS JOIN nex ORDER BY bands
"""


@register("dedup_lsh_band_sweep", _lsh_band_sweep_sql())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LSH S-curve: candidate precision/recall per band count over ONE
    # shared signature pass and ONE exact-Jaccard ground truth — the
    # curve read before choosing a banding (more bands => higher
    # recall, more candidates to verify).
    d = load_table(spark, sf_dir, "documents")
    return DD.lsh_band_sweep(d, threshold=LSH_SWEEP_THRESHOLD,
                             num_hashes=LSH_SWEEP_HASHES,
                             band_counts=LSH_SWEEP_BANDS, k=5)


# ---------------------------------------------------------------------------
# events_bloom_prune
# ---------------------------------------------------------------------------

def _bloom_sql(m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    p = BLOOM_PRIME
    consts = bloom_constants(k)
    pos_list = ", ".join(f"(({a} * (key + 1) + {b}) % {p}) % {m}"
                         for a, b in consts)
    bits_union = " UNION ".join(
        f"SELECT (({a} * (key + 1) + {b}) % {p}) % {m} AS pos FROM bk"
        for a, b in consts)
    return f"""
WITH bk AS (SELECT DISTINCT event_id AS key FROM events
            WHERE event_type = 'purchase'),
pk AS (SELECT DISTINCT event_id AS key FROM events),
bp AS ({bits_union}),
pp AS (SELECT DISTINCT key, pos FROM (
         SELECT key, unnest([{pos_list}]) AS pos FROM pk)),
hit AS (SELECT p.key,
               CASE WHEN count(*) = sum(CASE WHEN b.pos IS NOT NULL
                                             THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS pass
        FROM pp p LEFT JOIN bp b ON p.pos = b.pos GROUP BY p.key),
sc AS (SELECT h.pass,
              CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END AS mem
       FROM hit h LEFT JOIN bk k ON h.key = k.key)
SELECT CAST({m} AS BIGINT) AS m, CAST({k} AS BIGINT) AS k_hashes,
       (SELECT CAST(count(*) AS BIGINT) FROM bk) AS n_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM bp) AS bits_set,
       CAST(count(*) AS BIGINT) AS n_probed,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       CAST(sum(mem) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN pass = 1 AND mem = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       round(CASE WHEN count(*) - sum(mem) > 0
                  THEN sum(CASE WHEN pass = 1 AND mem = 0
                                THEN 1 ELSE 0 END)
                       / CAST(count(*) - sum(mem) AS DOUBLE) END, 6)
           AS fp_rate
FROM sc
"""


@register("events_bloom_prune", _bloom_sql())
def events_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    # runtime-filter economics: Bloom filter built over purchase
    # event_ids, probed with every event_id; reports how much of the
    # probe side a downstream semi-join would still see (fp_rate).
    # The m=16384-bit filter saturates as SF grows — the report makes
    # the m-vs-n tradeoff measurable instead of assumed.
    e = load_table(spark, sf_dir, "events")
    return bloom_prune_report(e.filter(F.col("event_type") == "purchase"),
                              e, key="event_id")


# ---------------------------------------------------------------------------
# events_bootstrap_ci
# ---------------------------------------------------------------------------

# constants live beside the operator (operators/quality.py) — the SQL
# template below interpolates the SAME values the Spark builder uses
from ..operators.quality import (  # noqa: E402
    BOOT_PRIME,
    BOOT_REPS,
    BOOT_THRESHOLDS,
    bootstrap_ci_from_partials,
    poisson_bootstrap_partials,
)


def _bootstrap_sql(reps: int = BOOT_REPS) -> str:
    p = BOOT_PRIME
    w = " + ".join(
        f"CASE WHEN h >= {t} THEN 1 ELSE 0 END" for t in BOOT_THRESHOLDS)
    return f"""
WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
x AS (SELECT event_type, event_id, cents, unnest(range(0, {reps})) AS rep
      FROM e),
hw AS (SELECT event_type, rep, cents,
              (event_id * 2654435761 + rep * 1103515245 + 12345) % {p} AS h
       FROM x),
wts AS (SELECT event_type, rep, cents, {w} AS wt FROM hw),
g1 AS (SELECT event_type, rep,
              CAST(sum(wt * cents) AS BIGINT) AS s,
              CAST(sum(wt) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS c_all,
              CAST(count(*) AS BIGINT) AS cnt
       FROM wts GROUP BY event_type, rep),
m AS (SELECT event_type, rep,
             s / (CAST(100 AS DOUBLE) * n) AS mr, c_all, cnt
      FROM g1 WHERE n > 0),
g2 AS (SELECT event_type,
              CAST(sum(cnt) / count(*) AS BIGINT) AS n_events,
              CAST(sum(c_all) AS BIGINT)
                  / (CAST(100 AS DOUBLE) * CAST(sum(cnt) AS BIGINT))
                  AS point_mean,
              CAST(count(*) AS BIGINT) AS b_eff,
              sum(mr) AS sum_m, sum(mr * mr) AS sum_m2
       FROM m GROUP BY event_type)
SELECT event_type, n_events, round(point_mean, 6) AS point_mean,
       round(CASE WHEN b_eff > 1 THEN sqrt(greatest(
           (sum_m2 - sum_m * sum_m / b_eff) / (b_eff - 1), 0.0)) END, 6)
           AS boot_se,
       round(point_mean - 1.96 * CASE WHEN b_eff > 1 THEN sqrt(greatest(
           (sum_m2 - sum_m * sum_m / b_eff) / (b_eff - 1), 0.0)) END, 6)
           AS ci_lo,
       round(point_mean + 1.96 * CASE WHEN b_eff > 1 THEN sqrt(greatest(
           (sum_m2 - sum_m * sum_m / b_eff) / (b_eff - 1), 0.0)) END, 6)
           AS ci_hi
FROM g2 ORDER BY event_type
"""


@register("events_bootstrap_ci", _bootstrap_sql())
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Poisson bootstrap (Chamandy et al., the map-reduce resampling
    # scheme): each row contributes a DETERMINISTIC hash-derived
    # Poisson(1) weight per replicate, so B resamples cost one
    # B-amplified pass with map-side partial aggregation and the data
    # is never copied. SE of the mean(value) per event_type, with a
    # normal-approximation CI around the full-sample point estimate.
    # Integer cents until the per-replicate division; the replicate
    # means are identical rationals on both engines.
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    return bootstrap_ci_from_partials(poisson_bootstrap_partials(e))


@register("streaming_bootstrap_ci", _bootstrap_sql())
def streaming_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SAME bootstrap with the per-replicate partial sums maintained
    # by a REAL Structured Streaming query (file stream -> stateless
    # weight projection -> keyed agg -> memory sink, drained
    # availableNow); the CI finalize runs on the drained sink, which is
    # how a live experiment monitor consumes it. Replicate weights are
    # per-row deterministic, so arrival order provably can't change the
    # drained partials — the batch oracle is exact, not approximate.
    import os

    from ..streaming.events import streaming_bootstrap_partials
    g1 = streaming_bootstrap_partials(
        spark, os.path.join(sf_dir, "events.parquet"))
    return bootstrap_ci_from_partials(g1)


# ---------------------------------------------------------------------------
# events_wasserstein_shift
# ---------------------------------------------------------------------------

@register("events_wasserstein_shift", """
WITH e AS (SELECT event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS v,
                  CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS we
           FROM events),
g AS (SELECT event_type, v,
             CAST(sum(1 - we) AS BIGINT) AS c_wd,
             CAST(sum(we) AS BIGINT) AS c_we
      FROM e GROUP BY event_type, v),
c AS (SELECT event_type, v,
             CAST(sum(c_wd) OVER (PARTITION BY event_type ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_wd,
             CAST(sum(c_we) OVER (PARTITION BY event_type ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_we,
             CAST(sum(c_wd) OVER (PARTITION BY event_type) AS BIGINT)
                 AS tot_wd,
             CAST(sum(c_we) OVER (PARTITION BY event_type) AS BIGINT)
                 AS tot_we,
             lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nxt
      FROM g)
SELECT event_type, tot_wd AS n_weekday, tot_we AS n_weekend,
       round(CAST(sum(abs(cum_wd * tot_we - cum_we * tot_wd)
                      * (nxt - v)) AS BIGINT)
             / (tot_wd * tot_we * CAST(100 AS DOUBLE)), 6) AS w1_distance
FROM c WHERE nxt IS NOT NULL AND tot_wd > 0 AND tot_we > 0
GROUP BY event_type, tot_wd, tot_we ORDER BY event_type
""")
def events_wasserstein_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-Wasserstein (earth-mover) distance between the weekday and
    # weekend value distributions per event type: the area between the
    # two empirical CDFs. Computed on the integer grid — cents values,
    # cross-multiplied cumulative counts (|cum_wd*tot_we -
    # cum_we*tot_wd| avoids any intermediate division) — so the sum is
    # exact and the single division happens at emit. One groupBy onto
    # (type, value) then windows partitioned by type: the distinct-
    # value relation is bounded by the value domain, not event count.
    # Integer headroom: the area sum is bounded by tot_wd*tot_we*
    # range_cents < 2^63, i.e. ~10^7 events per (type, side) at this
    # 49k-cent domain. Beyond that Spark's ANSI mode raises
    # ARITHMETIC_OVERFLOW (loudly — never a silent wrap) while DuckDB
    # rides HUGEINT until the final BIGINT cast; scaling further means
    # quantizing the per-term product (divide both cums by a common
    # 2^k before the cross-multiply), not widening silently.
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.when(F.weekday("ts") >= 5, 1).otherwise(0).alias("we"))
    g = (e.groupBy("event_type", "v")
         .agg(F.sum(1 - F.col("we")).cast("long").alias("c_wd"),
              F.sum("we").cast("long").alias("c_we")))
    w_run = (Window.partitionBy("event_type").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy("event_type")
    w_ord = Window.partitionBy("event_type").orderBy("v")
    c = g.select(
        "event_type", "v",
        F.sum("c_wd").over(w_run).cast("long").alias("cum_wd"),
        F.sum("c_we").over(w_run).cast("long").alias("cum_we"),
        F.sum("c_wd").over(w_all).cast("long").alias("tot_wd"),
        F.sum("c_we").over(w_all).cast("long").alias("tot_we"),
        F.lead("v").over(w_ord).alias("nxt"))
    area = F.sum(F.abs(F.col("cum_wd") * F.col("tot_we")
                       - F.col("cum_we") * F.col("tot_wd"))
                 * (F.col("nxt") - F.col("v"))).cast("long")
    return (c.filter(F.col("nxt").isNotNull() & (F.col("tot_wd") > 0)
                     & (F.col("tot_we") > 0))
            .groupBy("event_type", F.col("tot_wd").alias("n_weekday"),
                     F.col("tot_we").alias("n_weekend"))
            .agg(F.round(area / (F.col("tot_wd") * F.col("tot_we")
                                 * 100.0), 6).alias("w1_distance"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# events_propensity_strata
# ---------------------------------------------------------------------------

PROP_SPLIT = "2024-01-16"      # pre-period < split <= post-period
PROP_TREAT_CENTS = 45000       # treated: any pre-period purchase >= $450
PROP_STRATA = 4


@register("events_propensity_strata", f"""
WITH u AS (SELECT user_id,
                  CAST(sum(CASE WHEN ts < TIMESTAMP '{PROP_SPLIT}'
                                THEN 1 ELSE 0 END) AS BIGINT) AS pre_cnt,
                  max(CASE WHEN ts < TIMESTAMP '{PROP_SPLIT}'
                            AND event_type = 'purchase'
                            AND CAST(round(value * 100, 0) AS BIGINT)
                                >= {PROP_TREAT_CENTS}
                           THEN 1 ELSE 0 END) AS treated,
                  CAST(sum(CASE WHEN ts >= TIMESTAMP '{PROP_SPLIT}'
                                 AND event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS outcome
           FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(pre_cnt) AS BIGINT) AS total_pre,
             CAST(count(*) AS BIGINT) AS n_users FROM u),
s AS (SELECT u.*,
             least((pre_cnt * 2 * n_users) // total_pre,
                   {PROP_STRATA - 1}) AS stratum
      FROM u CROSS JOIN t)
SELECT stratum,
       CAST(sum(treated) AS BIGINT) AS n_treated,
       CAST(sum(1 - treated) AS BIGINT) AS n_control,
       round(CASE WHEN sum(treated) > 0
                  THEN sum(CASE WHEN treated = 1 THEN outcome ELSE 0 END)
                       / CAST(sum(treated) AS DOUBLE) END, 6)
           AS mean_outcome_treated,
       round(CASE WHEN sum(1 - treated) > 0
                  THEN sum(CASE WHEN treated = 0 THEN outcome ELSE 0 END)
                       / CAST(sum(1 - treated) AS DOUBLE) END, 6)
           AS mean_outcome_control
FROM s GROUP BY stratum ORDER BY stratum
""")
def events_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stratified treated-vs-control read: users stratified by
    # pre-period activity RELATIVE TO THE MEAN (integer arithmetic —
    # (pre_cnt*2*n_users) div total_pre, capped — so the bucketing is
    # exact on both engines and adapts to SF without a data-scaled
    # global ntile). Treated = any big pre-period purchase; outcome =
    # post-period purchase count. Per-stratum means let the reader
    # compute any weighting; the strata relation is constant-size.
    e = load_table(spark, sf_dir, "events")
    pre = F.col("ts") < PROP_SPLIT
    post = F.col("ts") >= PROP_SPLIT
    big = (F.round(F.col("value") * 100, 0).cast("long")
           >= PROP_TREAT_CENTS)
    u = (e.groupBy("user_id")
         .agg(F.sum(F.when(pre, 1).otherwise(0)).cast("long")
              .alias("pre_cnt"),
              F.max(F.when(pre & (F.col("event_type") == "purchase")
                           & big, 1).otherwise(0)).alias("treated"),
              F.sum(F.when(post & (F.col("event_type") == "purchase"),
                           1).otherwise(0)).cast("long").alias("outcome")))
    t = u.agg(F.sum("pre_cnt").cast("long").alias("total_pre"),
              F.count(F.lit(1)).cast("long").alias("n_users"))
    s = (u.crossJoin(F.broadcast(t))
         .withColumn("stratum", F.least(
             F.expr("(pre_cnt * 2 * n_users) div total_pre"),
             F.lit(PROP_STRATA - 1))))
    n_t = F.sum("treated")
    n_c = F.sum(1 - F.col("treated"))
    out_t = F.sum(F.when(F.col("treated") == 1,
                         F.col("outcome")).otherwise(0))
    out_c = F.sum(F.when(F.col("treated") == 0,
                         F.col("outcome")).otherwise(0))
    return (s.groupBy("stratum")
            .agg(n_t.cast("long").alias("n_treated"),
                 n_c.cast("long").alias("n_control"),
                 F.round(F.when(n_t > 0, out_t / n_t), 6)
                 .alias("mean_outcome_treated"),
                 F.round(F.when(n_c > 0, out_c / n_c), 6)
                 .alias("mean_outcome_control"))
            .orderBy("stratum"))


# ---------------------------------------------------------------------------
# daily indicators: KAMA / mass index / Coppock
# ---------------------------------------------------------------------------

_R14_DAILY = """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), ro AS (
  SELECT event_type, ts, event_id, value, d,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), daily AS (
  SELECT event_type, d AS hr,
         CAST(round(max(CASE WHEN rn_d = 1 THEN value END) * 100, 0)
              AS BIGINT) AS c,
         CAST(round(max(value) * 100, 0) AS BIGINT) AS hi_c,
         CAST(round(min(value) * 100, 0) AS BIGINT) AS lo_c
  FROM ro GROUP BY event_type, d
), rb AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM daily
)"""

_KAMA_DIFF = repr(2.0 / (ind.KAMA_FAST + 1) - 2.0 / (ind.KAMA_SLOW + 1))
_KAMA_SLOW_SC = repr(2.0 / (ind.KAMA_SLOW + 1))
# mass-index EMA constants, interpolated (not hardcoded) so a
# MASS_EMA_N tweak can never desync the two engines silently
_MASS_ALPHA = repr(2.0 / (ind.MASS_EMA_N + 1))
_MASS_DECAY = repr(1.0 - 2.0 / (ind.MASS_EMA_N + 1))


@register("stock_kama", _R14_DAILY + f"""
, ad AS (
  SELECT event_type, hr, rn, c,
         abs(c - lag(c) OVER w) AS adiff,
         abs(c - lag(c, {ind.KAMA_N}) OVER w) AS mom
  FROM rb WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), er AS (
  SELECT event_type, hr, rn, c, mom,
         CAST(sum(adiff) OVER (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN {ind.KAMA_N - 1} PRECEDING AND CURRENT ROW)
              AS BIGINT) AS vol
  FROM ad
), scd AS (
  SELECT event_type, hr, rn,
         pow(CASE WHEN vol > 0 THEN mom / CAST(vol AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END
             * {_KAMA_DIFF} + {_KAMA_SLOW_SC}, 2) AS sc,
         c / CAST(100 AS DOUBLE) AS cd
  FROM er WHERE rn > {ind.KAMA_N}
), arr AS (
  SELECT event_type,
         list({{'rn': rn, 'hr': hr, 'sc': sc, 'cd': cd}} ORDER BY rn) AS xs
  FROM scd GROUP BY event_type
), f AS (
  SELECT event_type, xs,
         list_reduce(
           list_prepend([xs[1].cd],
                        list_transform(xs[2:], x -> [x.sc, x.cd])),
           (acc, x) -> list_append(acc,
                                   acc[-1] + x[1] * (x[2] - acc[-1])))
             AS path
  FROM arr
)
SELECT event_type, xs[i].hr AS hr, round(path[i], 6) AS kama
FROM f, unnest(range(1, len(xs) + 1)) AS u(i)
ORDER BY event_type, hr
""")
def stock_kama(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kaufman adaptive MA on daily closes: the data-dependent smoothing
    # constant makes the recurrence un-truncatable, so it runs as a
    # sequential fold over the per-symbol calendar-bounded array —
    # F.aggregate here, list_reduce in the oracle, identical
    # left-to-right float association on both engines.
    ev = load_table(spark, sf_dir, "events")
    return ind.kama(ind.daily_ohlc(ev))


@register("stock_mass_index", _R14_DAILY + f"""
, rng AS (
  SELECT event_type, hr, rn,
         CAST(hi_c - lo_c AS DOUBLE) / 100 AS rng
  FROM rb
), arr AS (
  SELECT event_type,
         list({{'rn': rn, 'hr': hr, 'rng': rng}} ORDER BY rn) AS xs
  FROM rng GROUP BY event_type
), f1 AS (
  SELECT event_type, xs,
         list_reduce(
           list_prepend([xs[1].rng],
                        list_transform(xs[2:], x -> [x.rng])),
           (acc, x) -> list_append(acc, acc[-1] * {_MASS_DECAY} + x[1] * {_MASS_ALPHA}))
             AS ema1
  FROM arr
), f2 AS (
  SELECT event_type, xs, ema1,
         list_reduce(
           list_prepend([ema1[1]],
                        list_transform(ema1[2:], x -> [x])),
           (acc, x) -> list_append(acc, acc[-1] * {_MASS_DECAY} + x[1] * {_MASS_ALPHA}))
             AS ema2
  FROM f1
), f3 AS (
  SELECT event_type, xs,
         list_transform(range(1, len(ema1) + 1),
                        i -> CASE WHEN ema2[i] > 0 THEN ema1[i] / ema2[i]
                                  ELSE CAST(0 AS DOUBLE) END) AS ratio
  FROM f2
), f4 AS (
  SELECT event_type, xs,
         list_transform(range(1, len(ratio) + 1),
           t -> CASE WHEN t >= {ind.MASS_SUM_N}
                     THEN list_reduce(ratio[(t - {ind.MASS_SUM_N - 1}):t],
                                      (a, b) -> a + b) END) AS mass
  FROM f3
)
SELECT event_type, xs[i].hr AS hr, round(mass[i], 6) AS mass_index
FROM f4, unnest(range(1, len(xs) + 1)) AS u(i)
ORDER BY event_type, hr
""")
def stock_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dorsey mass index: EMA9(range)/EMA9(EMA9(range)) summed over 25
    # days — both EMAs and the trailing sum are sequential folds (the
    # kama machinery), NULL until 25 ratio days exist.
    ev = load_table(spark, sf_dir, "events")
    return ind.mass_index(ind.daily_ohlc(ev))


def _coppock_sql() -> str:
    n = ind.COPPOCK_WMA_N
    denom = f"CAST({n * (n + 1) // 2} AS DOUBLE)"
    terms = " + ".join(
        f"lag(s, {j}) OVER w2 * CAST({n - j} AS DOUBLE)"
        for j in range(n))
    return _R14_DAILY + f"""
, r AS (
  SELECT event_type, hr,
         (c - lag(c, {ind.COPPOCK_ROC_LONG}) OVER w)
             / CAST(lag(c, {ind.COPPOCK_ROC_LONG}) OVER w AS DOUBLE)
         + (c - lag(c, {ind.COPPOCK_ROC_SHORT}) OVER w)
             / CAST(lag(c, {ind.COPPOCK_ROC_SHORT}) OVER w AS DOUBLE) AS s
  FROM rb WINDOW w AS (PARTITION BY event_type ORDER BY hr)
)
SELECT event_type, hr,
       round(({terms}) / {denom}, 6) AS coppock
FROM r WINDOW w2 AS (PARTITION BY event_type ORDER BY hr)
ORDER BY event_type, hr
"""


@register("stock_coppock", _coppock_sql())
def stock_coppock(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Coppock curve: WMA10(ROC14 + ROC11) on daily closes; the WMA is
    # an explicit 10-term lag expression so the float association
    # order is a fixed tree, identical on both engines.
    ev = load_table(spark, sf_dir, "events")
    return ind.coppock(ind.daily_ohlc(ev))


# ---------------------------------------------------------------------------
# ann_pq_m_sweep
# ---------------------------------------------------------------------------

PQ_SWEEP_MS = (2, 4, 8)
PQ_SWEEP_K = 10
PQ_SWEEP_DIM = 64
PQ_SWEEP_EVERY = 40


def _pq_m_sweep_sql(ms: tuple = PQ_SWEEP_MS, k: int = PQ_SWEEP_K,
                    dim: int = PQ_SWEEP_DIM,
                    every: int = PQ_SWEEP_EVERY) -> str:
    """Oracle for the PQ sub-space sweep. The per-dimension squared
    residual join (d_base) is m-INDEPENDENT — (sub, j) equality is full
    index equality — so it's shared; only the grouping key i0 // sub_d
    changes per config (mirrors pq_adc_topk's arithmetic exactly,
    including the 6-dp rounds before every comparison)."""
    ms = sorted({int(m) for m in ms})
    parts = []
    for m in ms:
        sd = dim // m
        parts.append(f"""
d_{m} AS (SELECT vec_id, i0 // {sd} AS sub, cid,
                 round(sum(sq), 6) AS d2
          FROM d_base GROUP BY vec_id, i0 // {sd}, cid),
codes_{m} AS (SELECT vec_id, sub, cid FROM (
                SELECT vec_id, sub, cid,
                       row_number() OVER (PARTITION BY vec_id, sub
                                          ORDER BY d2, cid) AS rn
                FROM d_{m}) WHERE rn = 1),
qtab_{m} AS (SELECT i0 // {sd} AS sub, cid, round(sum(sq), 6) AS qd2
             FROM d_base WHERE vec_id = 0 GROUP BY i0 // {sd}, cid),
top_{m} AS (SELECT v.vec_id, round(sum(q.qd2), 6) AS adc_dist
            FROM codes_{m} v JOIN qtab_{m} q
              ON q.sub = v.sub AND q.cid = v.cid
            GROUP BY v.vec_id
            ORDER BY adc_dist, vec_id LIMIT {k}),
stat_{m} AS (SELECT CAST({m} AS BIGINT) AS m,
                    CAST({sd} AS BIGINT) AS sub_dim,
                    CAST({k} AS BIGINT) AS k,
                    CAST(count(*) AS BIGINT) AS n_hits,
                    round(count(*) / CAST({k} AS DOUBLE), 6) AS recall
             FROM top_{m} t JOIN exact e ON e.vec_id = t.vec_id)""")
    union = " UNION ALL ".join(f"SELECT * FROM stat_{m}" for m in ms)
    return f"""
WITH exbase AS (SELECT vec_id, u.i - 1 AS i0, u.x AS x
                FROM (SELECT vec_id,
                             unnest(list_transform(embedding::DOUBLE[],
                                    (x, i) -> struct_pack(x := x, i := i)))
                                 AS u
                      FROM embeddings)),
cbbase AS (SELECT vec_id AS cid, i0, x FROM exbase
           WHERE vec_id % {every} = 0),
d_base AS (SELECT e.vec_id, e.i0, c.cid, (e.x - c.x) * (e.x - c.x) AS sq
           FROM exbase e JOIN cbbase c ON c.i0 = e.i0),
q AS (SELECT i0, x AS qx FROM exbase WHERE vec_id = 0),
exact AS (SELECT vec_id FROM (
            SELECT e.vec_id,
                   round(sum((e.x - q.qx) * (e.x - q.qx)), 6) AS l2
            FROM exbase e JOIN q ON q.i0 = e.i0
            GROUP BY e.vec_id ORDER BY l2, vec_id LIMIT {k})),
{", ".join(parts)},
stats AS ({union})
SELECT * FROM stats ORDER BY m
"""


@register("ann_pq_m_sweep", _pq_m_sweep_sql())
def ann_pq_m_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PQ-ADC recall@10 as a function of the sub-space count m — the
    # third index-tuning sweep (nprobe r13, LSH bands above): finer
    # quantization buys recall at m lookups per scored vector. Graded
    # against the exact squared-L2 top-k (ADC approximates L2, so the
    # ground-truth metric matches the index metric).
    from ..operators import similarity as SIM
    from .catalog_text import _query_vec
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.pq_m_sweep(e, _query_vec(spark, sf_dir), k=PQ_SWEEP_K,
                          ms=PQ_SWEEP_MS, dim=PQ_SWEEP_DIM,
                          every=PQ_SWEEP_EVERY)
