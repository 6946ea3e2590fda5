"""Behavioral / diagnostic analytics operators: ordered funnels, cohort
retention, frequent item pairs (market-basket), join-key skew profiling,
and blocked fuzzy (edit-distance) matching.

All five are pure DataFrame compositions — no UDFs, no driver loops —
chosen for their shuffle shape at scale:

- funnel: one aggregation per step plus an equi-join on the user key;
  every stage shuffles on the SAME key, so with AQE the exchanges reuse
  one partitioning.  No window over the whole event stream.
- cohort retention: two aggregations keyed on the user, then a count
  per (cohort, offset) pair — the classic two-level rollup.
- frequent pairs: per-basket self-join AFTER distinct-ing items within
  a basket; cost is sum over baskets of k_i^2, bounded by the basket
  size, never |items|^2.  A support threshold prunes the long tail
  before the result leaves the aggregation.
- key skew profile: the two-pass heavy-hitter scan used to decide
  whether a join needs salting (operators/skew.py) — per-key counts,
  then global max/avg against which each hot key is reported.
- fuzzy match: edit-distance joins are quadratic unless blocked; the
  canonical shape is distinct-values -> cheap block key -> within-block
  pairs -> exact Levenshtein on the survivors only.

Reference parity: the reference's query surface stops at filter/join/
aggregate (SURVEY §2); these extend the engine for the training-data /
analytics north star alongside operators/corpus.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel stage counts: a user is in stage i when an event of
    ``steps[i]`` exists at-or-after the timestamp that qualified them for
    stage i-1 (the first such event, greedily).

    Greedy first-occurrence semantics — NOT ``min(ts) per type`` compared
    pairwise, which would wrongly drop a user whose earliest click
    precedes their first view even though a later click completes the
    funnel.  Each step is one filtered aggregation on the user key joined
    to the previous frontier; with AQE the per-step joins reuse the same
    hash partitioning on ``user_col``.

    Output: one row per step — (stage: int, step: string, users: long).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step)
        if frontier is None:
            frontier = (ev.groupBy(user_col)
                        .agg(F.min(ts_col).alias("_frontier_ts")))
        else:
            prev = frontier.select(user_col, "_frontier_ts")
            frontier = (ev.join(prev, user_col)
                        .filter(F.col(ts_col) >= F.col("_frontier_ts"))
                        .groupBy(user_col)
                        .agg(F.min(ts_col).alias("_frontier_ts")))
        counts.append(frontier.agg(
            F.lit(i + 1).alias("stage"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stage")


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of
    their first event; activity is counted as distinct users per
    (cohort_week, week_offset).

    Two aggregations on the user key (first-seen, distinct active weeks)
    and one rollup on the tiny (cohort, offset) pair — no windows, no
    per-user state.  Output: (cohort_week: timestamp, week_offset: long,
    active_users: long), ordered.
    """
    first = (events.groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week")))
    active = (events
              .select(user_col,
                      F.date_trunc("week", F.col(ts_col)).alias("week"))
              .distinct())
    return (active.join(first, user_col)
            .select("cohort_week",
                    F.floor(
                        F.datediff(F.to_date("week"),
                                   F.to_date("cohort_week")) / 7)
                    .cast("long").alias("week_offset"),
                    F.col(user_col))
            .groupBy("cohort_week", "week_offset")
            .agg(F.countDistinct(user_col).alias("active_users"))
            .orderBy("cohort_week", "week_offset"))


def frequent_pairs(df: DataFrame, basket_col: str, item_col: str,
                   min_support: int = 2, k: int | None = None) -> DataFrame:
    """Market-basket pair counts: items co-occurring in the same basket,
    with pair support >= ``min_support``.

    A-priori-shaped: distinct (basket, item) first (multiplicity inside a
    basket must not inflate support), then a per-basket self-join with
    ``item_a < item_b`` so each unordered pair appears once.  Work is
    sum(k_i^2) over basket sizes — for bounded baskets (an order's
    lineitems, a session's pages) this is linear in the data, and the
    equi-join on the basket key is an ordinary hash join, never a cross.
    Output: (item_a, item_b, support), support-descending.
    """
    oi = df.select(F.col(basket_col).alias("_b"),
                   F.col(item_col).alias("_i")).distinct()
    a = oi.alias("a")
    b = oi.alias("b")
    pairs = (a.join(b, (F.col("a._b") == F.col("b._b"))
                    & (F.col("a._i") < F.col("b._i")))
             .groupBy(F.col("a._i").alias("item_a"),
                      F.col("b._i").alias("item_b"))
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= min_support)
             .orderBy(F.col("support").desc(), "item_a", "item_b"))
    return pairs.limit(k) if k is not None else pairs


def key_skew_profile(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Heavy-hitter profile of a join/grouping key: the ``top`` hottest
    keys with their share of rows and multiple-of-mean skew factor.

    This is the diagnostic that decides whether a join on ``key_col``
    needs salting (operators/skew.py) or AQE skew-join handling: a
    skew_x of s means the hottest task is ~s× the average task.  Two
    aggregations — per-key counts, then a broadcast of the 3-number
    global summary back onto the top keys.
    Output: (key, cnt, pct, skew_x), count-descending, ties by key.
    """
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").alias("_total"),
        F.avg("cnt").alias("_mean"))
    return (per_key.crossJoin(F.broadcast(totals))
            .select("key", "cnt",
                    F.round(100.0 * F.col("cnt") / F.col("_total"), 4)
                    .alias("pct"),
                    F.round(F.col("cnt") / F.col("_mean"), 4)
                    .alias("skew_x"))
            .orderBy(F.col("cnt").desc(), "key")
            .limit(top))


def triangle_stats(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Global triangle census of an undirected graph given as a pair
    list: one row — (n_nodes, n_edges, n_triangles).

    Edges are canonicalized to ``a < b`` so each undirected edge is one
    row; triangles are counted once each via the ordered wedge join
    (a<b)⋈(b<c) closed by a left-semi probe for (a,c) — two equi-joins,
    no enumeration of neighborhoods on the driver.  Work is bounded by
    the wedge count; at scale the standard refinement is to orient edges
    by (degree, id) instead of raw id so every hub node's wedge fan-out
    collapses onto its low-degree neighbors (count is orientation-
    invariant, so the simple id orientation used here stays correct —
    swap the ordering when the degree distribution is heavy-tailed).
    """
    e = (pairs.select(F.least(F.col(id_a), F.col(id_b)).alias("a"),
                      F.greatest(F.col(id_a), F.col(id_b)).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct().persist())
    wedge = (e.alias("e1").join(e.alias("e2"),
                                F.col("e1.b") == F.col("e2.a"))
             .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                     F.col("e2.b").alias("c")))
    tri = wedge.join(
        e.alias("e3"), (wedge["a"] == F.col("e3.a"))
        & (wedge["c"] == F.col("e3.b")), "left_semi")
    nodes = (e.select(F.col("a").alias("v"))
             .unionByName(e.select(F.col("b").alias("v"))).distinct())
    out = (nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
           .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
           .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles"))))
    return out


def fuzzy_match(df: DataFrame, name_col: str, block_key: Column,
                max_dist: int = 2) -> DataFrame:
    """Blocked edit-distance self-match over the DISTINCT values of
    ``name_col``: pairs (name_a < name_b) within ``max_dist`` Levenshtein
    edits that share ``block_key``.

    Distinct-first matters twice: it collapses the row count to the value
    cardinality before the quadratic step, and it makes the result a
    VALUE-level match table that callers join back to rows (the standard
    entity-resolution decomposition).  ``block_key`` (e.g. the last
    token, a soundex code, a length band) bounds the candidate set; the
    exact Levenshtein runs only within blocks.  Output:
    (name_a, name_b, dist: int).
    """
    names = (df.select(F.col(name_col).alias("_n"))
             .filter(F.col("_n").isNotNull()).distinct()
             .select("_n", block_key.alias("_blk")))
    a = names.alias("a")
    b = names.alias("b")
    return (a.join(b, (F.col("a._blk") == F.col("b._blk"))
                   & (F.col("a._n") < F.col("b._n")))
            .select(F.col("a._n").alias("name_a"),
                    F.col("b._n").alias("name_b"),
                    F.levenshtein(F.col("a._n"), F.col("b._n"))
                    .alias("dist"))
            .filter(F.col("dist") <= max_dist)
            .orderBy("name_a", "name_b"))


PR_SCALE = 1_000_000_000_000  # pagerank fixed-point unit (1e-12)


def pagerank(pairs: DataFrame, id_a: str, id_b: str, iters: int = 3,
             damping_pct: int = 85, top: int = 100) -> DataFrame:
    """PageRank over an undirected pair list (each edge walked both
    ways), by power iteration in EXACT integer arithmetic: ranks live
    on a 1e-12 fixed-point grid, each node pushes ``rank div outdeg``
    to its neighbors, and the damping mix is ``base + (85·Σ) div 100``
    — every operation is integer, so the result is bit-identical on
    any engine and any partitioning (float-sum PageRank drifts with
    reduction order, which a hash-compared oracle cannot tolerate).
    The floor divisions leak ≤ outdeg quanta of mass per node per
    round — at the 1e-12 grain that is noise far below any ranking
    decision, and determinism is what buys a verifiable result.

    Shape at 100 TB: the iteration is two shuffles (edges ⋈ ranks on
    src, then a groupBy dst) — the canonical distributed PageRank;
    edges and degrees are computed once and persisted, only the
    rank relation changes per round. For many iterations add
    localCheckpoint every few rounds to bound lineage (the CC
    operator in operators/clustering.py shows the pattern). Driver
    traffic is ONE scalar (the node count, control-plane sized).
    """
    und = (pairs.select(F.least(F.col(id_a), F.col(id_b)).alias("a"),
                        F.greatest(F.col(id_a), F.col(id_b)).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    e = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
         .unionByName(und.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
         .persist())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    n_nodes = deg.count()  # one control-plane scalar
    r0 = PR_SCALE // n_nodes
    base = (PR_SCALE * (100 - damping_pct) // 100) // n_nodes
    r = deg.select(F.col("src").alias("node"),
                   F.lit(r0).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (e.join(r.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("r div outdeg").alias("c")))
        r = (contrib.groupBy("node").agg(F.sum("c").alias("s"))
             .select("node",
                     (F.lit(base) + F.expr(
                         f"({damping_pct} * s) div 100")).alias("r")))
    return (r.orderBy(F.desc("r"), "node").limit(top)
            .select("node", F.col("r").alias("rank_e12")))
