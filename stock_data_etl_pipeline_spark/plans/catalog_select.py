"""Data-selection catalog family (round 6): weighted reservoir
sampling, token-budget greedy selection, and per-symbol OLS trend.

Three selection/estimation operators a training-data pipeline runs
between curation and packing:

- ``corpus_weighted_sample`` — Efraimidis–Spirakis A-Res weighted
  sampling WITHOUT replacement (VLDB '06): each doc draws a
  deterministic uniform u from the portable md5 hash and ranks by
  ln(u)/w (equivalent order to u^(1/w)); the global top-k IS a
  w-weighted sample without replacement. Shape: pure projection +
  TakeOrdered(k) — no shuffle beyond the top-k reduction.
- ``corpus_budget_selection`` — greedy quality-first selection under a
  fixed token budget (the "data-constrained scaling" selection rule):
  docs ordered by (quality desc, id), kept while the running token
  total stays inside budget. The running sum is the distributed
  prefix-sum primitive (``distributed_running_total``) — a range
  shuffle + partition-local windows, never a single-partition sort.
- ``stock_ols_trend`` — per-symbol least-squares trend of close on the
  hour index: slope/intercept/R² from exact integer component sums
  (1e-2 price grid — sized so n·Σy² keeps ~5000× int64
  headroom at the observed price range; the 1e-4 grid would overflow
  ANSI longs for a symbol pinned near the data's max close), one
  window + one hash-agg per symbol.

Reference anchor: the reference's analytics surface stops at windowed
indicators (services/workers/tasks/*.py); these extend the same
catalog discipline (deterministic, oracle-paired) to the selection
stage of a corpus pipeline.

Determinism: weights and token counts are exact integers; uniforms are
md5-derived rationals; ln() on rational inputs follows the accepted
perplexity precedent (transcendentals never sit on the 1e-6 grid
boundary); OLS ratios are single IEEE divisions of exact integer sums
with identical association in both engines (the beta/alpha precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.windows import distributed_running_total
from ..sources.registry import load_table
from .catalog import register
from .catalog_stock import _BARS_CTE
from .catalog_text import _STOPS, _WORDS

ES_K = 20
BUDGET_TOKENS = 4096


def _es_u_scaled(id_col: str = "doc_id"):
    """Deterministic uniform draw in [1, 1e6]: the portable md5 hash,
    salted so it is independent of every other sampling bucket in the
    catalog."""
    return (F.conv(F.substring(F.md5(F.concat(
        F.col(id_col).cast("string"), F.lit(":es"))), 1, 15), 16, 10)
        .cast("long") % 1000000 + 1)


@register("corpus_weighted_sample", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
t AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens FROM w
      WHERE len(ws) > 0),
k AS (SELECT doc_id, n_tokens,
             (('0x' || substr(md5(doc_id::VARCHAR || ':es'), 1, 15))::BIGINT
              % 1000000) + 1 AS u_scaled
      FROM t)
SELECT doc_id, n_tokens,
       round(ln(u_scaled / 1000000.0) / CAST(n_tokens AS DOUBLE), 6)
           AS es_key
FROM k
ORDER BY ln(u_scaled / 1000000.0) / CAST(n_tokens AS DOUBLE) DESC, doc_id
LIMIT {ES_K}
""")
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis: keep the k docs maximizing u^(1/w) — here
    # via the monotone ln(u)/w so both engines evaluate one ln and one
    # division; w = token count, so long docs are proportionally more
    # likely, the standard token-weighted doc draw
    d = load_table(spark, sf_dir, "documents")
    return weighted_sample(d, ES_K)


def weighted_sample(docs: DataFrame, k: int = ES_K,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """A-Res weighted sampling without replacement: top-``k`` docs by
    the deterministic ln(u)/w key, w = token count."""
    w = TX.token_count(text_col).cast("long")
    t = (docs.select(F.col(id_col), w.alias("n_tokens"))
         .filter(F.col("n_tokens") > 0))
    key = (F.log(_es_u_scaled(id_col) / F.lit(1000000.0))
           / F.col("n_tokens").cast("double"))
    return (t.select(id_col, "n_tokens", key.alias("_k"))
            .orderBy(F.col("_k").desc(), id_col).limit(k)
            .select(id_col, "n_tokens",
                    F.round(F.col("_k"), 6).alias("es_key")))


@register("corpus_budget_selection", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
q AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens,
             round((least(len(ws) / 100.0, 1.0)
                    + least(round(len(list_filter(ws, x -> x IN ({_STOPS})))
                                  / len(ws)::DOUBLE, 4) * 4, 1.0)
                    + round(len(list_distinct(ws)) / len(ws)::DOUBLE, 4))
                   / 3, 4) AS quality
      FROM w WHERE len(ws) > 0),
r AS (SELECT doc_id, quality, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running
      FROM q)
SELECT doc_id, quality, n_tokens, running
FROM r WHERE running <= {BUDGET_TOKENS}
ORDER BY doc_id
""")
def corpus_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quality-first greedy selection under a fixed token budget: the
    # running total over (quality desc, id) comes from the distributed
    # prefix-sum primitive — identical bucket arithmetic to the ABC/
    # Pareto entry, never an empty-partitionBy window
    d = load_table(spark, sf_dir, "documents")
    return budget_selection(d, BUDGET_TOKENS)


def budget_selection(docs: DataFrame, budget: int = BUDGET_TOKENS,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Greedy quality-first selection under a token ``budget``: the
    maximal (quality desc, id)-prefix whose running token total fits."""
    q = (docs.select(F.col(id_col),
                     TX.token_count(text_col).cast("long")
                     .alias("n_tokens"),
                     TX.quality_score(text_col).alias("quality"))
         .filter(F.col("n_tokens") > 0))
    r = distributed_running_total(
        q, [F.desc("quality"), F.col(id_col)], "n_tokens", out="running")
    return (r.filter(F.col("running") <= budget)
            .select(id_col, "quality", "n_tokens", "running")
            .orderBy(id_col))


@register("stock_ols_trend", _BARS_CTE + """
, y AS (SELECT event_type, hr,
               CAST(round(close * 100, 0) AS BIGINT) AS yi,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY hr) AS BIGINT) AS xi
        FROM bars),
a AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xi) AS BIGINT) AS sx,
             CAST(sum(yi) AS BIGINT) AS sy,
             CAST(sum(xi * yi) AS BIGINT) AS sxy,
             CAST(sum(xi * xi) AS BIGINT) AS sx2,
             CAST(sum(yi * yi) AS BIGINT) AS sy2
      FROM y GROUP BY event_type)
SELECT event_type, n,
       round(CASE WHEN n * sx2 - sx * sx > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sx2 - sx * sx AS DOUBLE) / 100
             END, 6) AS slope,
       round(CASE WHEN n * sx2 - sx * sx > 0
                  THEN (CAST(sy AS DOUBLE)
                        - CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sx2 - sx * sx AS DOUBLE)
                          * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) / 100
             END, 6) AS intercept,
       round(CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
                  THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                        * CAST(n * sxy - sx * sy AS DOUBLE))
                       / (CAST(n * sx2 - sx * sx AS DOUBLE)
                          * CAST(n * sy2 - sy * sy AS DOUBLE))
             END, 6) AS r2
FROM a ORDER BY event_type
""")
def stock_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-symbol OLS of close on the hour index: closes quantized to
    # the 1e-2 grid so every component sum (Σx Σy Σxy Σx² Σy²) is an
    # exact BIGINT; slope/intercept/R² are then single IEEE expressions
    # of those exact scalars with identical association in the oracle.
    # Integer differences are taken BEFORE the double cast (both
    # engines cast the same exact integer), and zero-variance groups
    # NULL out on the same integer predicates.
    from ..operators import indicators as ind
    ev = load_table(spark, sf_dir, "events")
    return ols_trend(ind.hourly_bars(ev))


def ols_trend(bars: DataFrame) -> DataFrame:
    """Per-symbol OLS of close on the hour index from exact integer
    component sums; see ``stock_ols_trend`` for the full contract."""
    w = Window.partitionBy("event_type").orderBy("hr")
    y = bars.select(
        "event_type",
        F.round(F.col("close") * 100, 0).cast("long").alias("yi"),
        F.row_number().over(w).cast("long").alias("xi"))
    a = (y.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("xi").alias("sx"), F.sum("yi").alias("sy"),
              F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
              F.sum(F.col("xi") * F.col("xi")).alias("sx2"),
              F.sum(F.col("yi") * F.col("yi")).alias("sy2")))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = (n * F.col("sx2") - sx * sx).cast("double")
    den_pos = (n * F.col("sx2") - sx * sx) > 0
    den2 = (n * F.col("sy2") - sy * sy).cast("double")
    den2_pos = (n * F.col("sy2") - sy * sy) > 0
    return (a.select(
        "event_type", "n",
        F.round(F.when(den_pos, num / den / 100), 6).alias("slope"),
        F.round(F.when(den_pos,
                       (sy.cast("double") - num / den * sx.cast("double"))
                       / n.cast("double") / 100), 6).alias("intercept"),
        F.round(F.when(den_pos & den2_pos,
                       (num * num) / (den * den2)), 6).alias("r2"))
        .orderBy("event_type"))


@register("events_mad_anomaly", """
WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                    ORDER BY c, hr) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
       FROM c),
med AS (SELECT event_type, c AS med FROM rk WHERE rn = (n + 1) // 2),
d AS (SELECT c.event_type, c.hr, c.c, med.med,
             abs(c.c - med.med) AS dev
      FROM c JOIN med USING (event_type)),
dr AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                    ORDER BY dev, hr) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
       FROM d),
mad AS (SELECT event_type, dev AS mad FROM dr WHERE rn = (n + 1) // 2)
SELECT d.event_type, CAST(d.hr AS TIMESTAMP) AS hr, d.c, d.med,
       mad.mad, d.dev > 3 * mad.mad AS anomaly
FROM d JOIN mad USING (event_type)
ORDER BY d.event_type, hr
""")
def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust (median/MAD) anomaly flags over the hourly event-count
    # series, fully integer-exact: the LOWER median is an exact rank
    # pick over a total (value, hour) order — no interpolation, no
    # floats anywhere — so the 3-MAD flag is a pure function of exact
    # BIGINTs on both engines. The count grid is |hours| x |types|
    # (calendar-bounded, independent of event volume), so the per-type
    # rank windows run on a tiny relation; the only full-data pass is
    # the first hash-agg.
    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy("event_type",
                    F.date_trunc("hour", F.col("ts")).alias("hr"))
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    return mad_anomaly(c).orderBy("event_type", "hr")


def mad_anomaly(counts: DataFrame, key: str = "event_type",
                t: str = "hr", val: str = "c",
                k_mad: int = 3) -> DataFrame:
    """Median/MAD anomaly flags per ``key`` over an integer series —
    lower medians via exact rank picks, everything BIGINT."""

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy(col, t)
        wn = Window.partitionBy(key)
        return (df.withColumn("_rn", F.row_number().over(w))
                .withColumn("_n", F.count(F.lit(1)).over(wn))
                .filter(F.col("_rn") == ((F.col("_n") + 1) / 2)
                        .cast("long"))
                .select(key, F.col(col).alias(out)))

    med = lower_median(counts, val, "med")
    d = (counts.join(med, key)
         .withColumn("dev", F.abs(F.col(val) - F.col("med"))))
    mad = lower_median(d, "dev", "mad")
    return (d.join(mad, key)
            .select(key, t, val, "med", "mad",
                    (F.col("dev") > k_mad * F.col("mad")).alias("anomaly")))


@register("stock_drawdown_duration", _BARS_CTE + """
, p AS (SELECT event_type, hr, close,
               max(close) OVER (PARTITION BY event_type ORDER BY hr
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS peak,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hr) AS rn
        FROM bars),
u AS (SELECT event_type, rn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY rn) AS rn2
      FROM p WHERE close < peak),
runs AS (SELECT event_type, rn - rn2 AS island,
                CAST(count(*) AS BIGINT) AS run_len
         FROM u GROUP BY 1, 2),
agg AS (SELECT event_type, CAST(max(run_len) AS BIGINT) AS max_run,
               CAST(sum(run_len) AS BIGINT) AS n_underwater
        FROM runs GROUP BY 1),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars FROM p
        GROUP BY 1)
SELECT t.event_type, t.n_bars,
       coalesce(a.n_underwater, 0) AS n_underwater,
       coalesce(a.max_run, 0) AS max_underwater_run
FROM tot t LEFT JOIN agg a USING (event_type)
ORDER BY t.event_type
""")
def stock_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time-underwater profile per symbol: total hours below the running
    # peak and the LONGEST consecutive underwater run (gaps-and-islands
    # on the strict close < peak flag — rank difference is constant
    # inside a run). Complements max_drawdown's magnitude with
    # duration; every emitted value is an exact BIGINT count, and the
    # island key is pure integer arithmetic on deterministic
    # row_numbers, so the result is engine- and partitioning-exact.
    from ..operators import indicators as ind
    ev = load_table(spark, sf_dir, "events")
    return drawdown_duration(ind.hourly_bars(ev)).orderBy("event_type")


def drawdown_duration(bars: DataFrame) -> DataFrame:
    """Per-symbol underwater totals and longest underwater run."""
    w = Window.partitionBy("event_type").orderBy("hr")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    p = bars.select(
        "event_type", "hr", "close",
        F.max("close").over(wp).alias("peak"),
        F.row_number().over(w).alias("rn"))
    wu = Window.partitionBy("event_type").orderBy("rn")
    u = (p.filter(F.col("close") < F.col("peak"))
         .withColumn("rn2", F.row_number().over(wu)))
    runs = (u.groupBy("event_type",
                      (F.col("rn") - F.col("rn2")).alias("island"))
            .agg(F.count(F.lit(1)).cast("long").alias("run_len")))
    agg = (runs.groupBy("event_type")
           .agg(F.max("run_len").cast("long").alias("max_run"),
                F.sum("run_len").cast("long").alias("n_underwater")))
    tot = (p.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_bars")))
    return (tot.join(agg, "event_type", "left")
            .select("event_type", "n_bars",
                    F.coalesce(F.col("n_underwater"), F.lit(0))
                    .cast("long").alias("n_underwater"),
                    F.coalesce(F.col("max_run"), F.lit(0))
                    .cast("long").alias("max_underwater_run")))


@register("corpus_sequence_pack_hot", f"""
WITH w AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens FROM documents),
c AS (SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before
      FROM w)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum_before / 256) AS BIGINT) AS pack_id,
       CAST(cum_before % 256 AS BIGINT)        AS pack_offset
FROM c
""")
def corpus_sequence_pack_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SAME oracle as corpus_sequence_pack, different physical plan: the
    # per-source cumulative sum runs on grouped_running_total (range
    # partition over (source, doc_id) + per-(partition, source) offsets),
    # so a source holding half the corpus spans many tasks instead of
    # serializing one window partition — the sub-sharding path
    # pack_sequences' docstring promises, proven equal by the shared
    # oracle and exercised under a hot-source fixture in
    # tests/test_select_ops.py
    from ..operators.windows import grouped_running_total
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source",
                 TX.token_count("text").cast("long").alias("n_tokens"))
    r = grouped_running_total(t, ["source"], [F.col("doc_id")],
                              "n_tokens", out="_run")
    cum_before = F.col("_run") - F.col("n_tokens")
    return r.select(
        "doc_id", "source", "n_tokens",
        F.floor(cum_before / 256).cast("long").alias("pack_id"),
        (cum_before % 256).cast("long").alias("pack_offset"))


@register("stock_acf", _BARS_CTE + """
, y AS (SELECT event_type,
               CAST(round(close * 100, 0) AS BIGINT) AS yv,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY hr) AS BIGINT) AS rn
        FROM bars),
base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(yv) AS BIGINT) AS sy,
                CAST(sum(yv * yv) AS BIGINT) AS sy2
         FROM y GROUP BY event_type),
ks AS (SELECT unnest([1, 2, 3, 4, 5]) AS k),
p AS (SELECT a.event_type, ks.k,
             a.yv AS ya, b.yv AS yb
      FROM y a CROSS JOIN ks
      JOIN y b ON b.event_type = a.event_type AND b.rn = a.rn + ks.k),
s AS (SELECT event_type, k, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(ya * yb) AS BIGINT) AS sxy,
             CAST(sum(ya) AS BIGINT) AS sh,
             CAST(sum(yb) AS BIGINT) AS st
      FROM p GROUP BY event_type, k)
SELECT s.event_type, s.k, s.m,
       round(CASE WHEN b.n * b.sy2 - b.sy * b.sy > 0 THEN
         (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE) * CAST(s.sxy AS DOUBLE)
          - CAST(b.n AS DOUBLE) * CAST(b.sy AS DOUBLE)
            * CAST(s.sh + s.st AS DOUBLE)
          + CAST(s.m AS DOUBLE) * CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE))
         / (CAST(b.n AS DOUBLE)
            * CAST(b.n * b.sy2 - b.sy * b.sy AS DOUBLE))
       END, 6) AS acf
FROM s JOIN base b USING (event_type)
ORDER BY s.event_type, s.k
""")
def stock_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-symbol autocorrelation at lags 1..5 — the stationarity/
    # seasonality diagnostic every forecasting pipeline computes.
    # Closes quantized to the 1e-2 grid keep every moment (Σy, Σy²,
    # lag cross-products, head/tail partial sums) an exact BIGINT and
    # the mean-centered estimator r_k = (n²Σy·y_k − nΣy(Σhead+Σtail)
    # + mΣyΣy) / (n(nΣy² − ΣyΣy)) is evaluated on leaf-cast doubles
    # with identical association in the oracle (the n²-scaled integer
    # numerator is cubic in n and would overflow ANSI longs on a long
    # history); the integer guard and every SUM stay exact. The lag pairing is an equi-join on
    # (symbol, rn+k): shuffle-partitionable at any history length, no
    # window state, no band residuals.
    from ..operators import indicators as ind
    ev = load_table(spark, sf_dir, "events")
    return acf(ind.hourly_bars(ev)).orderBy("event_type", "k")


def acf(bars: DataFrame, max_lag: int = 5) -> DataFrame:
    """Per-symbol ACF at lags 1..``max_lag`` in exact fixed-point."""
    w = Window.partitionBy("event_type").orderBy("hr")
    y = bars.select(
        "event_type",
        F.round(F.col("close") * 100, 0).cast("long").alias("yv"),
        F.row_number().over(w).cast("long").alias("rn"))
    base = (y.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("yv").alias("sy"),
                 F.sum(F.col("yv") * F.col("yv")).alias("sy2")))
    a = (y.withColumn("k", F.explode(F.array(
        *[F.lit(i) for i in range(1, max_lag + 1)])))
        .select("event_type", "k", F.col("yv").alias("ya"),
                (F.col("rn") + F.col("k")).alias("rn_b")))
    b = y.select(F.col("event_type").alias("et_b"),
                 F.col("rn").alias("rn_b2"), F.col("yv").alias("yb"))
    p = a.join(b, (F.col("event_type") == F.col("et_b"))
               & (F.col("rn_b") == F.col("rn_b2")))
    s = (p.groupBy("event_type", "k")
         .agg(F.count(F.lit(1)).cast("long").alias("m"),
              F.sum(F.col("ya") * F.col("yb")).alias("sxy"),
              F.sum("ya").alias("sh"), F.sum("yb").alias("st")))
    j = s.join(base, "event_type")
    n, sy = F.col("n"), F.col("sy")
    # the guard stays integer-exact (n*sy2 - sy*sy fits comfortably),
    # but the n^2-scaled numerator is CUBIC in n — at a longer history
    # it would blow past int64 and ANSI long arithmetic would raise
    # where the oracle's wider integers survive (the OLS-grid lesson).
    # So the formula runs on leaf-cast doubles with IDENTICAL
    # association in the oracle: parity needs identical IEEE
    # evaluation, not integer exactness (the rolling_corr precedent).
    den_i = n * F.col("sy2") - sy * sy
    nd, syd, md = (n.cast("double"), sy.cast("double"),
                   F.col("m").cast("double"))
    num = (nd * nd * F.col("sxy").cast("double")
           - nd * syd * (F.col("sh") + F.col("st")).cast("double")
           + md * syd * syd)
    return (j.select(
        "event_type", "k", "m",
        F.round(F.when(den_i > 0, num / (nd * den_i.cast("double"))), 6)
        .alias("acf")))


@register("corpus_source_balance", """
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY source),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(max(c) AS BIGINT) AS max_c
      FROM c),
r AS (SELECT source, c,
             CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS i
      FROM c),
g AS (SELECT CAST(sum(c * (2 * i - (SELECT n_sources FROM t) - 1))
                  AS BIGINT) AS gnum
      FROM r),
h AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e6, 0) AS BIGINT))
                  AS BIGINT) AS hsum
      FROM c)
SELECT t.n_sources, t.n_docs,
       round(CAST(g.gnum AS DOUBLE)
             / CAST(t.n_sources * t.n_docs AS DOUBLE), 6) AS gini,
       round(ln(t.n_docs)
             - CAST(h.hsum AS DOUBLE) / 1e6
               / CAST(t.n_docs AS DOUBLE), 6) AS entropy,
       round(CAST(t.max_c AS DOUBLE)
             / CAST(t.n_docs AS DOUBLE), 6) AS top_share
FROM t, g, h
""")
def corpus_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row source-imbalance diagnostics for the dataset card:
    # Gini over the sorted source sizes (exact integer numerator — the
    # rank weights 2i-n-1 are ints over a total (count, source) order),
    # Shannon entropy of the source distribution with each c*ln(c) term
    # quantized to a 1e-6 integer BEFORE the sum (the perplexity
    # precedent: transcendental per-term values never sit on the grid
    # boundary, and the quantized sum is reduction-order-exact), and
    # the largest source's share. The source-count relation is tiny, so
    # every window here runs on |sources| rows; the only full-data pass
    # is the first count.
    d = load_table(spark, sf_dir, "documents")
    return source_balance(d)


def source_balance(docs: DataFrame,
                   group_col: str = "source") -> DataFrame:
    """One-row Gini / entropy / top-share over the group distribution."""
    c = (docs.groupBy(group_col)
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    t = c.agg(F.sum("c").alias("n_docs"),
              F.count(F.lit(1)).cast("long").alias("n_sources"),
              F.max("c").alias("max_c"))
    wr = Window.orderBy("c", group_col)
    r = c.withColumn("i", F.row_number().over(wr).cast("long"))
    g = (r.crossJoin(F.broadcast(t))
         .agg(F.sum(F.col("c")
                    * (2 * F.col("i") - F.col("n_sources") - 1))
              .cast("long").alias("gnum")))
    h = c.agg(F.sum(F.round(F.col("c") * F.log(F.col("c")) * 1e6, 0)
                    .cast("long")).alias("hsum"))
    return (t.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(h))
            .select("n_sources", "n_docs",
                    F.round(F.col("gnum").cast("double")
                            / (F.col("n_sources") * F.col("n_docs"))
                            .cast("double"), 6).alias("gini"),
                    F.round(F.log(F.col("n_docs").cast("double"))
                            - F.col("hsum").cast("double") / 1e6
                            / F.col("n_docs").cast("double"), 6)
                    .alias("entropy"),
                    F.round(F.col("max_c").cast("double")
                            / F.col("n_docs").cast("double"), 6)
                    .alias("top_share")))
