"""Round-6 depth checks: (1) the end-to-end corpus-curation composition
(dedup -> quality -> contamination -> mixing -> packing) is
shuffle-bounded and conserves tokens at sf0.1; (2) a hot-key skew
fixture (one symbol carrying ~half of all ticks) through the indicator
family — the banded EWMA must stay EXACT under skew and must spread the
hot symbol's work across many tasks where a per-symbol window would
serialize it.

These pin the two scale-risk classes the uniform synthetic data cannot
surface on its own: composition cost (operators proven one-by-one can
still multiply shuffles when chained) and key skew (a 100 TB corpus
always has a hot source/symbol/user).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators import corpus as CP
from stock_data_etl_pipeline_spark.operators import indicators as ind
from stock_data_etl_pipeline_spark.operators.windows import banded_rank_join
from stock_data_etl_pipeline_spark.sources.registry import load_table

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF001 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF001), reason="driver testdata not present")


def _hash_rows(df):
    """Order-independent content hash (the oracle-compare idiom)."""
    cols = sorted(df.columns)
    h = (df.select(F.md5(F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))
        .alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10)
                   .cast("decimal(38,0)")).alias("s")))
    return h.collect()[0]["s"]


# ---------------------------------------------------------------------------
# 1. curation -> mixing -> packing composition at sf0.1
# ---------------------------------------------------------------------------

def test_curation_mixing_packing_composition_sf01(spark):
    from stock_data_etl_pipeline_spark.plans.catalog_corpus import (
        corpus_curation_full)
    docs = load_table(spark, SF01, "documents")

    t0 = time.time()
    kept_ids = corpus_curation_full(spark, SF01).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi")

    sources = [r["source"] for r in
               kept.select("source").distinct().collect()]
    weights = {s: 1.0 / len(sources) for s in sources}
    mixed = CP.mixture_sample(kept, weights)
    packed = CP.pack_sequences(mixed, budget=256)
    n_packed = packed.count()
    wall = time.time() - t0
    assert n_packed > 0

    # token conservation: the packer must account for every token of
    # every sampled doc, per source (packing is a reorganization, not a
    # filter)
    tok_in = {r["source"]: r["t"] for r in
              mixed.select("source", F.size(CP.words("text"))
                           .cast("long").alias("n"))
              .groupBy("source").agg(F.sum("n").alias("t")).collect()}
    tok_out = {r["source"]: r["t"] for r in
               packed.groupBy("source")
               .agg(F.sum("n_tokens").alias("t")).collect()}
    assert tok_in == tok_out

    # every doc's start offset sits inside its pack's budget
    bad = packed.filter((F.col("pack_offset") < 0)
                        | (F.col("pack_offset") >= 256)).count()
    assert bad == 0

    # the composed plan must stay shuffle-bounded: no cartesian product
    # anywhere (the 1-row scalar joins plan as broadcast loops, which is
    # the documented OK shape), and the whole chain runs in seconds at
    # sf0.1 — record the wall so a composition blow-up is visible in CI
    # output even before it times anything out
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    print(f"\ncomposition sf0.1: packed={n_packed} wall={wall:.1f}s")
    assert wall < 300


# ---------------------------------------------------------------------------
# 2. hot-symbol skew through the indicator family
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed_ticks(spark):
    """sf0.01 events with ~50% of ticks remapped onto one hot symbol —
    the deterministic md5-parity remap, so the fixture is stable."""
    ev = load_table(spark, SF001, "events")
    parity = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                 1, 15), 16, 10).cast("long") % 2)
    return ev.withColumn(
        "event_type",
        F.when(parity == 0, F.lit("hot")).otherwise(F.col("event_type")))


def test_skew_fixture_is_actually_skewed(spark, skewed_ticks):
    counts = {r["event_type"]: r["n"] for r in
              skewed_ticks.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert counts["hot"] / total > 0.4


def test_indicators_partition_invariant_under_skew(spark, skewed_ticks):
    """Bollinger + RSI + VWAP on the skewed fixture must hash-match
    between 32 and 7 shuffle partitions — skew must not change results,
    only task placement."""
    bars = ind.hourly_bars(skewed_ticks)

    def run():
        return (_hash_rows(ind.bollinger(bars)),
                _hash_rows(ind.rsi(bars)),
                _hash_rows(ind.vwap_daily(skewed_ticks)))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        h32 = run()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h7 = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h32 == h7


def test_banded_ewma_exact_and_parallel_under_skew(spark, skewed_ticks):
    """The banded EWMA (a) equals the naive per-symbol window recurrence
    on the skewed fixture and (b) spreads the hot symbol's join work
    over many band keys — the skew mitigation a partitionBy(symbol)
    window cannot offer, since a window partition is a single task no
    matter how hot the key."""
    bars = ind.hourly_bars(skewed_ticks)
    t0 = time.time()
    banded = ind.ewma_trend(bars)
    n_banded = banded.count()
    t_banded = time.time() - t0

    # naive truncated EWMA via an explicit per-symbol window of lagged
    # closes — O(lookback) lag columns, same math, single-task-per-symbol
    d, L = ind.EWMA_DECAY, ind.EWMA_LOOKBACK
    w = Window.partitionBy("event_type").orderBy("hr")
    num = sum((F.coalesce(F.lag("close", i).over(w) * F.lit(d ** i),
                          F.lit(0.0))
               for i in range(1, L)),
              F.col("close") * F.lit(1.0))
    den = sum((F.when(F.lag("close", i).over(w).isNotNull(),
                      F.lit(d ** i)).otherwise(F.lit(0.0))
               for i in range(1, L)),
              F.lit(1.0))
    naive = bars.select("event_type", "hr",
                        (num / den).alias("ewma_naive"))
    # tolerance compare, keyed: the banded groupBy sums in shuffle order
    # while the window sums sequentially, so the values may differ in
    # the last ulp — one 6-dp grid step is the acceptance band
    diff = (banded.join(naive, ["event_type", "hr"])
            .agg(F.max(F.abs(F.col("ewma")
                             - F.round(F.col("ewma_naive"), 6)))
                 .alias("mx"), F.count(F.lit(1)).alias("n"))
            .collect()[0])
    assert diff["n"] == n_banded
    assert diff["mx"] <= 1.1e-6

    # parallelism evidence: distinct band keys for the hot symbol — the
    # units the equi-join can schedule independently
    n_bars_hot = bars.filter(F.col("event_type") == "hot").count()
    w_rn = Window.partitionBy("event_type").orderBy("hr")
    b = bars.select("event_type", "hr", "close",
                    F.row_number().over(w_rn).alias("rn"))
    hot_bands = (banded_rank_join(b, ["event_type"], "rn", L)
                 .filter(F.col("cur.event_type") == "hot")
                 .select(F.col("cur.__probe").alias("band")).distinct()
                 .count())
    assert hot_bands >= max(2, n_bars_hot // L - 1)
    print(f"\nskew ewma: hot_bars={n_bars_hot} band_keys={hot_bands} "
          f"banded_wall={t_banded:.1f}s")


def test_aqe_splits_skewed_sort_merge_join(spark):
    """AQE's skew-join split must actually fire on a hot-key shuffle
    join — the runtime defense the session config promises for the
    joins salting doesn't cover. Thresholds are lowered so the test's
    ~200k-row hot key crosses the skew bar; the assertion reads the
    executed (adaptive) plan for the skew-handled join marker, and the
    split must not change the join result."""
    probe = spark.range(400_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000)
                            .cast("string"))).alias("k"),
        F.col("id").alias("v"))
    build = spark.range(1001).select(
        F.when(F.col("id") == 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("k"),
        (F.col("id") * 10).alias("w"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = probe.join(build, "k")
        # execute THIS dataframe's plan (a count() runs a different
        # QueryExecution and the join's own adaptive plan never
        # finalizes — isFinalPlan stays false with no skew markers)
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert n == 400_000  # every probe row matches exactly one build row
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan and "skewed" in plan


# ---------------------------------------------------------------------------
# 3. hub-skew stress through the triangle machinery
# ---------------------------------------------------------------------------

def test_triangle_machinery_collapses_hub_fanout(spark):
    """Degree-oriented triangle counting on a hub-heavy graph: one hub
    joined to 2000 spokes plus a chain along the spokes (1999 hub
    triangles) and a disjoint K5 (10 more).  Under raw-id orientation
    the hub (lowest id) would carry out-degree 2000 — a ~2M-wedge
    fan-out from ONE node, the exact shape that OOMs a hot task at
    100×.  Under (degree, id) orientation the hub is the highest-rank
    node, so its out-degree must collapse to 0 and every adjacency
    array stays bounded by the small-neighbor degrees — which is what
    makes the collect_list in _triangle_count safe on heavy-tailed
    graphs.  Counts must be unaffected by the reorientation."""
    import itertools
    from pyspark.sql import functions as F
    from stock_data_etl_pipeline_spark.operators.analytics import (
        _degree_oriented_edges, triangle_stats)
    edges = [(0, i) for i in range(1, 2001)]
    edges += [(i, i + 1) for i in range(1, 2000)]
    edges += list(itertools.combinations(range(10_000, 10_005), 2))
    df = spark.createDataFrame(edges, "x long, y long")
    row = triangle_stats(df, "x", "y").collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == \
        (2006, 4009, 1999 + 10)
    e, _deg = _degree_oriented_edges(df, "x", "y")
    out_deg = {r["a"]: r["c"] for r in
               e.groupBy("a").agg(F.count(F.lit(1)).alias("c")).collect()}
    # the hub emits NO wedge fan-out; nothing exceeds the max small
    # degree (chain nodes: 3, K5 nodes: 4)
    assert 0 not in out_deg
    assert max(out_deg.values()) <= 4


# ---------------------------------------------------------------------------
# 4. hot-user skew through the sweep-line concurrency census
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hot_user_events(spark):
    """sf0.001 events with ~50% of events remapped onto one hot user —
    the sessionize lag window partitions by user, so this is the
    worst-case key for the concurrency pipeline (one user's whole
    history through one window task; the DELTA relation downstream is
    what must stay parallel)."""
    ev = load_table(spark, SF001, "events")
    parity = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                 1, 15), 16, 10).cast("long") % 2)
    return ev.withColumn(
        "user_id",
        F.when(parity == 0, F.lit(999_999)).otherwise(F.col("user_id")))


def test_session_concurrency_partition_invariant_under_hot_user(
        spark, hot_user_events):
    """The concurrency census must hash-match between 32 and 7 shuffle
    partitions on a 50%-hot-user stream — the prefix sum rides
    distributed_running_total over sampled range boundaries, so the
    level histogram cannot depend on task placement."""
    from stock_data_etl_pipeline_spark.operators.analytics import (
        session_concurrency_census)

    def run():
        return tuple(sorted(
            (r["level"], r["n_instants"]) for r in
            session_concurrency_census(hot_user_events).collect()))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        h32 = run()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h7 = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h32 == h7
    # the census must balance: Σ level·n over transitions returns to 0,
    # i.e. the final (max-t) level is 0 — every session that opened
    # closed, a structural invariant of the ±1 sweep
    assert min(lv for lv, _ in h32) >= 0


# ---------------------------------------------------------------------------
# 5. hot-block skew through the capped edit-distance near-dup report
# ---------------------------------------------------------------------------

def test_edit_distance_hot_block_is_skipped_not_joined(spark):
    """sf0.001 documents with ~50% of docs remapped into ONE
    (lang, source, length-band) block — the template-heavy-crawl shape
    that made the uncapped r8 kernel quadratic.  The capped report
    must (a) count the hot block's pair mass arithmetically and audit
    it as skipped, (b) keep every small-block near-dup stat IDENTICAL
    to a run without the hot block's docs merged (the cap only ever
    removes over-cap blocks from the join, never perturbs small ones),
    and (c) finish in time linear in the doc count — a quadratic join
    on ~250 hot docs here is only 31k pairs, but the assertion that
    n_pairs_evaluated excludes them is exactly the property that makes
    a 10^9-doc hot block safe at 100 TB."""
    from stock_data_etl_pipeline_spark.operators.dedup import (
        EDIT_DIST_BLOCK_CAP, edit_distance_report)

    docs = load_table(spark, SF001, "documents")
    parity = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                 1, 15), 16, 10).cast("long") % 2)
    hot = docs.withColumn("is_hot", parity == 0)
    merged = (hot
              .withColumn("lang", F.when(F.col("is_hot"), F.lit("xx"))
                          .otherwise(F.col("lang")))
              .withColumn("source", F.when(F.col("is_hot"),
                                           F.lit("hotsrc"))
                          .otherwise(F.col("source")))
              .withColumn("n_chars", F.when(F.col("is_hot"), F.lit(256))
                          .otherwise(F.col("n_chars")))
              .drop("is_hot"))
    n_hot = hot.filter("is_hot").count()
    assert n_hot > EDIT_DIST_BLOCK_CAP  # the block genuinely overflows

    rep = {r["lang"]: r.asDict()
           for r in edit_distance_report(merged).collect()}
    xx = rep["xx"]
    # (a) audited skip: all C(n_hot, 2) pairs counted, none evaluated
    assert xx["n_candidate_pairs"] == n_hot * (n_hot - 1) // 2
    assert xx["n_pairs_skipped"] == xx["n_candidate_pairs"]
    assert xx["n_blocks_skipped"] == 1 and xx["n_pairs_evaluated"] == 0
    assert xx["n_near_dup"] == 0 and xx["min_distance"] is None

    # (b) small-block stats are untouched by the hot block's presence:
    # rerun on ONLY the cold docs and compare every cold language row
    cold = hot.filter(~F.col("is_hot")).drop("is_hot")
    cold_rep = {r["lang"]: r.asDict()
                for r in edit_distance_report(cold).collect()}
    cold_only = {k: v for k, v in rep.items() if k != "xx"}
    assert cold_only == cold_rep


def test_ks_and_gini_matrix_bounded_under_value_skew(spark):
    """Round-10 scale risk: the KS ECDF and Gini prefix windows run
    over per-group MATRICES whose row count is bounded by the DISTINCT
    value domain, never the stream — a hot group with millions of rows
    but few distinct values must produce a tiny matrix, and the result
    must be invariant to input partitioning (the window is keyed, so a
    different shuffle layout cannot change cumulation scope)."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators.analytics import (
        grouped_count_gini, ks_two_sample)
    sat, mon = dt.datetime(2024, 1, 6), dt.datetime(2024, 1, 8)
    # hot group: 40k rows, only 3 distinct cents values, 200 users;
    # each consecutive (sat, mon) pair carries the SAME value, so the
    # two halves are identical distributions by construction
    rows = [(i, mon if i % 2 else sat, i % 200, "hot",
             float((i // 2) % 3)) for i in range(40_000)]
    rows += [(100_000 + i, mon if i % 2 else sat, i % 5, "cold",
              float(i)) for i in range(50)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    for parts in (3, 17):
        out = {r["event_type"]: r for r in
               ks_two_sample(ev.repartition(parts)).collect()}
        # hot group: equal per-value weekday/weekend mass -> KS == 0
        assert out["hot"]["ks_stat"] == 0.0
        assert out["hot"]["n_weekend"] == 20_000
        g = {r["event_type"]: r for r in
             grouped_count_gini(ev.repartition(parts), "event_type",
                                "user_id").collect()}
        # 40k rows over 200 equally-active users -> Gini exactly 0
        assert g["hot"]["n_entities"] == 200 and g["hot"]["gini"] == 0.0


def test_word_burstiness_hot_word_and_template_doc(spark):
    """A template word stacked in one document must surface with a
    high VMR while a uniformly spread word stays near Poisson — and
    the integer identity must hold regardless of partitioning."""
    from stock_data_etl_pipeline_spark.operators.corpus import (
        word_burstiness)
    docs = [(i, ("spread " + ("filler%d " % i)) * 1, "en", "s", 10)
            for i in range(100)]
    docs.append((1000, "burst " * 100, "en", "s", 600))
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r["word"]: r for r in
           word_burstiness(d.repartition(7), top=2).collect()}
    n = 101
    # burst: one doc with c=100 -> VMR = (n·100² − 100²)/(n·100)
    exp_burst = (n * 10_000 - 10_000) / (n * 100)
    assert abs(out["burst"]["vmr"] - exp_burst) < 1e-12
    # spread: 100 docs with c=1 -> VMR = (n·100 − 100²)/(n·100)
    exp_spread = (n * 100 - 10_000) / (n * 100)
    assert abs(out["spread"]["vmr"] - exp_spread) < 1e-12
    assert out["burst"]["vmr"] > 10 * out["spread"]["vmr"]


# ---------------------------------------------------------------------------
# round-12 skew/scale depth: VPIN, burstiness/ACF, silhouette, modularity
# ---------------------------------------------------------------------------

def test_round12_event_ops_partition_invariant_under_skew(
        spark, skewed_ticks):
    """VPIN, burstiness and the hourly-count ACF on the hot-symbol
    fixture must hash-match between 32 and 7 shuffle partitions: the
    tick-rule carry-forward, the gap power sums and the lag joins ride
    (symbol/time)-keyed total orders, so skew may move tasks but never
    values."""
    from stock_data_etl_pipeline_spark.operators.analytics import (
        hourly_count_acf, interarrival_burstiness)

    def run():
        return (_hash_rows(ind.vpin(skewed_ticks)),
                _hash_rows(interarrival_burstiness(skewed_ticks)),
                _hash_rows(hourly_count_acf(skewed_ticks, max_lag=6)))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        h32 = run()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h7 = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h32 == h7


def test_silhouette_giant_label_stays_centroid_bounded(spark):
    """One label holding ~90% of vectors: the centroid silhouette must
    stay linear (explode -> |labels|*dim centroid broadcast -> two
    hash-aggs) — no per-label pairwise work — and remain exact across
    partition counts."""
    from stock_data_etl_pipeline_spark.operators.similarity import (
        simplified_silhouette)
    emb = load_table(spark, SF001, "embeddings")
    skewed = emb.withColumn(
        "label",
        F.when(F.col("vec_id") % 10 != 0, F.lit(0)).otherwise(
            F.col("label")))
    plan = simplified_silhouette(skewed)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        h32 = _hash_rows(simplified_silhouette(skewed))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h7 = _hash_rows(simplified_silhouette(skewed))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h32 == h7


def test_modularity_hot_basket_graph_exact_under_partitioning(spark):
    """LPA modularity on a hot-block co-purchase graph (one basket
    containing many parts -> a dense clique block) must be
    partition-invariant: every step is integer (counts, degree sums,
    the 4*m*e_c - d_c^2 numerator) so only the ONE final division is
    float."""
    from stock_data_etl_pipeline_spark.operators.analytics import (
        lpa_modularity)
    li = load_table(spark, SF001, "lineitem").limit(4000)
    oi = (li.select(F.col("l_orderkey").alias("bk"),
                    F.col("l_partkey").alias("i"))
          # remap ~25% of rows into ONE hot basket -> clique block
          .withColumn("bk", F.when(F.col("i") % 4 == 0, F.lit(-1))
                      .otherwise(F.col("bk")))
          .distinct())
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        r32 = lpa_modularity(pairs, "pa", "pb").collect()[0]
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        r7 = lpa_modularity(pairs, "pa", "pb").collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert r32 == r7
    assert r32["m_edges"] > 0 and -1.0 <= r32["modularity"] <= 1.0
