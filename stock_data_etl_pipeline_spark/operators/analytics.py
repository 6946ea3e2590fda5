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

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .pinned import pin, pin_checkpoint, pin_cut


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


def _undirected_degrees(pairs: DataFrame, id_a: str, id_b: str
                        ) -> tuple[DataFrame, DataFrame]:
    """Canonical undirected edge list (x < y, self-loops dropped,
    deduped) and node degrees, both pinned — the shared prefix of the
    graph operators (degree orientation, neighbor-degree curves).
    Pinned because every caller consumes both frames at least twice."""
    # pin_cut (round 11): und feeds the degree union (2 refs) AND every
    # caller's edge-side joins, and deg is referenced twice per caller
    # with und nested inside — the repetition compounds through
    # _degree_oriented_edges into the triangle family's plan trees.
    # Both are ≤ edge-cardinality, deterministic, fully consumed before
    # release.
    und = pin_cut(_canon_undirected(pairs, id_a, id_b, "x", "y"))
    # both endpoints from one explode — a single pass over the cut
    # leaf instead of a two-branch self-union (round-15, guide §2.4)
    deg = pin(und.select(F.explode(F.array("x", "y")).alias("v"))
              .groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d")))
    return und, deg


def _degree_oriented_edges(pairs: DataFrame, id_a: str, id_b: str
                           ) -> tuple[DataFrame, DataFrame]:
    """Canonical directed edge list for triangle machinery, oriented by
    (degree, id): each undirected edge (x, y) becomes one row (a, b)
    with rank(a) < rank(b), where rank is the lexicographic tuple
    (degree(v), v).

    Why this orientation: the wedge join e1.b == e2.a fans out as
    Σ_v in(v)·out(v).  Under raw-id orientation a hub's fan-out is
    quadratic in its degree — the scale-killer on heavy-tailed graphs
    (the co-purchase projection has exactly such hubs).  Orienting by
    (degree, id) bounds every out-degree by O(√m), so the wedge count
    is O(m^1.5) regardless of skew — the standard node-iterator++
    refinement.  Triangle counts are orientation-invariant, so callers'
    results are byte-identical to the raw-id variant (asserted by
    tests/test_quality.py::test_triangle_orientation_invariance).

    Returns (edges, degrees) — both pinned: edges is referenced three
    times by the wedge join + closure, degrees twice (orientation join
    and, in clustering_coefficient, the wedge-count aggregate).  The
    degree join is keyed on the node id (two shuffles, node-cardinality
    sized) — cheap next to the wedge join it tames.
    """
    und, deg = _undirected_degrees(pairs, id_a, id_b)
    return _orient_by_degree(und, deg), deg


def _orient_by_degree(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical undirected edges (x, y) by (degree, id) rank:
    one row (a, b) per edge with rank(a) < rank(b) — THE single
    definition of the triangle family's hub-proofing tie-break
    (round-11 review: the orientation rule is the family's correctness
    linchpin; a second copy in the k-truss peel could silently desync
    on a future fix).

    pin_cut, not pin (round 11): the oriented edge list is the most
    deeply shared subtree in the package — adjacency aggregates,
    per-edge joins, and triangle-list consumers each repeat it in the
    ANALYZED tree, multiplicatively through the nesting
    (closure_by_degree compiled 56k plan lines / 6,528 scans with a
    plain persist; ~0.1k lines with the leaf). Edge-cardinality,
    deterministic, and always fully consumed before release."""
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    x_first = (F.col("dx") < F.col("dy")) | \
        ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    return pin_cut(und.join(dx, "x").join(dy, "y")
                   .select(F.when(x_first, F.col("x"))
                           .otherwise(F.col("y")).alias("a"),
                           F.when(x_first, F.col("y"))
                           .otherwise(F.col("x")).alias("b")))


def _triangle_count(e: DataFrame) -> DataFrame:
    """1-row (n_triangles) count over a degree-oriented edge list via
    adjacency-set intersection: each triangle with ranks a<b<c is
    counted exactly once on its base edge (a, b) as c ∈ N⁺(a) ∩ N⁺(b).

    Why intersect instead of the wedge join + semi-join closure (the
    pre-r8 plan): the wedge join MATERIALIZES and re-shuffles every
    open wedge — ~49M rows on the sf0.1 co-purchase graph for 1.9M
    triangles — and the closure shuffles them again.  Here nothing
    wider than the edge list itself moves: one groupBy builds per-node
    out-neighbor arrays (node-cardinality table, broadcast-joinable),
    two keyed joins land both arrays on each edge, and the intersection
    runs inside whole-stage codegen.  Degree orientation is what makes
    this safe: out-degree ≤ O(√m) bounds every array regardless of hub
    skew, so no collect_list row can blow up on a heavy-tailed graph.

    ``adj`` is pinned: it has TWO consumers (the a-side and b-side
    joins are separate references to the same plan), so un-pinned the
    collect_list aggregate — the expensive pass — runs twice
    (round-10 finding: cold triangle census dropped ~35% with the
    pin). Node-cardinality with O(√m)-bounded arrays, safe to hold.
    """
    adj = pin(e.groupBy(F.col("a").alias("v"))
              .agg(F.collect_list("b").alias("nbrs")))
    na = adj.select(F.col("v").alias("a"), F.col("nbrs").alias("na"))
    nb = adj.select(F.col("v").alias("b"), F.col("nbrs").alias("nb"))
    per_edge = (e.join(na, "a", "left").join(nb, "b", "left")
                .select(F.when(F.col("na").isNull()
                               | F.col("nb").isNull(), F.lit(0))
                        .otherwise(F.size(F.array_intersect("na", "nb")))
                        .alias("t")))
    return per_edge.agg(F.coalesce(F.sum("t"), F.lit(0)).cast("long")
                        .alias("n_triangles"))


def triangle_stats(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Global triangle census of an undirected graph given as a pair
    list: one row — (n_nodes, n_edges, n_triangles).

    Edges are canonicalized to one row per undirected edge and oriented
    by (degree, id) — see :func:`_degree_oriented_edges` — then
    triangles are counted by per-edge adjacency intersection
    (:func:`_triangle_count`): no wedge materialization, no driver
    enumeration, hub fan-out collapsed onto low-degree endpoints.
    """
    e, deg = _degree_oriented_edges(pairs, id_a, id_b)
    out = (deg.agg(F.count(F.lit(1)).alias("n_nodes"))
           .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
           .crossJoin(_triangle_count(e)))
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


def _canon_undirected(pairs: DataFrame, id_a: str, id_b: str,
                      a: str = "a", b: str = "b") -> DataFrame:
    """Canonical undirected distinct edge list (``a`` < ``b``,
    self-loops dropped) — the ONE canonicalization shared by the whole
    graph family (pagerank, BFS, LPA, link predictors, degree
    statistics, triangles, eigencentrality). Eleven operators used to
    inline this block with varying aliases; a fix here (e.g. null-id
    handling) now reaches every one of them at once (round-12
    review). Pin/cut policy stays at the call site — it depends on
    how many consumers the caller fans out to."""
    return (pairs.select(F.least(F.col(id_a), F.col(id_b)).alias(a),
                         F.greatest(F.col(id_a), F.col(id_b)).alias(b))
            .filter(F.col(a) != F.col(b)).distinct())


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
    und = _canon_undirected(pairs, id_a, id_b)
    # pin_cut e (round 12): it is re-referenced every iteration and the
    # un-cut analyzed tree reached 1,702 nodes / 320 exchanges by round
    # 11's audit; as a parquet leaf the per-iteration growth is a
    # handful of nodes. Round-14: both orientations come from ONE
    # posexplode-style array instead of a self-union, so the expensive
    # und subtree (pair self-join + distinct) is evaluated once, not
    # twice, inside the single cut-write job; deg is a plain hash-agg
    # over the cut leaf — a tiny tree — so a lazy memory pin replaces
    # the second parquet write job the old code paid at build time.
    e = pin_cut(und.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))))
        .alias("_ed")).select("_ed.src", "_ed.dst"))
    deg = pin(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    n_nodes = deg.count()  # one control-plane scalar
    if n_nodes == 0:  # edgeless input: empty result, never ZeroDivision
        return deg.select(F.col("src").alias("node"),
                          F.lit(0).cast("long").alias("rank_e12"))
    # Round-15 (guide §2.4 don't-recompute): e ⋈ deg is LOOP-INVARIANT
    # — every iteration used to re-join the out-degree onto the edge
    # list before joining the ranks. Attach outdeg to each edge ONCE
    # (pinned; materialized by the first iteration's action) so each
    # iteration is exactly one keyed join + one aggregate — the
    # theoretical minimum for distributed PageRank.
    ed = pin(e.join(deg, "src"))
    r0 = PR_SCALE // n_nodes
    base = (PR_SCALE * (100 - damping_pct) // 100) // n_nodes
    r = deg.select(F.col("src").alias("node"),
                   F.lit(r0).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (ed.join(r.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("r div outdeg").alias("c")))
        r = (contrib.groupBy("node").agg(F.sum("c").alias("s"))
             .select("node",
                     (F.lit(base) + F.expr(
                         f"({damping_pct} * s) div 100")).alias("r")))
    return (r.orderBy(F.desc("r"), "node").limit(top)
            .select("node", F.col("r").alias("rank_e12")))


def multi_touch_attribution(events: DataFrame,
                            purchase_type: str = "purchase",
                            touch_types: Sequence[str] = ("view", "click"),
                            lookback_days: int = 7) -> DataFrame:
    """Marketing attribution: credit each purchase's value to the
    user's preceding touch events (views/clicks) inside a lookback
    window, under BOTH last-touch and linear models, rolled up per
    channel.

    Eligibility is a strict total order — a touch at the exact purchase
    timestamp counts only when its event_id is smaller — so "last
    touch" is deterministic. The join is keyed on the user with the
    time window as residual: per-probe work is one user's touches in
    ``lookback_days``, bounded by user activity, never by table size.
    Money determinism: purchase values are 2-dp, so cent sums are
    exact; the linear split quantizes each touch share to a 1e-6
    integer (round-half-away matches both engines for positive values)
    before summing. Two shuffles: the user-keyed join, then the
    channel rollup.
    """
    p = (events.filter(F.col("event_type") == purchase_type)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("p_id"),
                 F.col("value").alias("p_value")))
    t = (events.filter(F.col("event_type").isin(*touch_types))
         .select(F.col("user_id").alias("t_user"),
                 F.col("ts").alias("t_ts"),
                 F.col("event_id").alias("t_id"),
                 F.col("event_type").alias("channel")))
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id")))
    pairs = p.join(t, (F.col("p_user") == F.col("t_user"))
                   & before
                   & (F.col("t_ts") >= F.col("p_ts")
                      - F.expr(f"INTERVAL {lookback_days} DAYS")))
    w = Window.partitionBy("p_id")
    w_last = w.orderBy(F.col("t_ts").desc(), F.col("t_id").desc())
    scored = (pairs
              .withColumn("k", F.count(F.lit(1)).over(w))
              .withColumn("is_last",
                          (F.row_number().over(w_last) == 1)
                          .cast("long"))
              .withColumn("p_cents",
                          F.round(F.col("p_value") * 100, 0).cast("long"))
              .withColumn("share_micro",
                          F.round(F.col("p_value") * 1e6 / F.col("k"), 0)
                          .cast("long")))
    # last-touch money is summed in exact integer cents (a raw double
    # sum could flip the 2-dp round at a half boundary under a
    # different partial-agg order); one IEEE division at emit.
    # ASSUMES p_value sits on a 1e-2 grid (the events generator emits
    # 2-dp money, asserted by dq_orders_constraints-style checks): the
    # quantize-before-sum is then a no-op vs round(sum(p_value), 2).
    # Sub-cent inputs would be rounded per-row BEFORE the sum — a
    # different (and deliberately chosen) metric definition, applied
    # identically in the oracle SQL so parity holds either way.
    return (scored.groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_touchpoints"),
                 F.sum("is_last").cast("long").alias("n_last_touch"),
                 F.round(F.sum(F.col("is_last") * F.col("p_cents"))
                         / 100.0, 2).alias("last_touch_value"),
                 F.round(F.sum("share_micro") / 1e6, 6)
                 .alias("linear_value")))


def survival_curve(events: DataFrame, churn_horizon_days: int = 14,
                   week_days: int = 7) -> DataFrame:
    """Weekly churn life table (the Kaplan–Meier ingredients) over user
    lifetimes.

    A user's lifetime is whole weeks between their first and last
    event; users whose last event is within ``churn_horizon_days`` of
    the global end of observation are CENSORED at their last week
    (still alive as far as the data shows), everyone else CHURNED at
    their last week. Emits, per week: the at-risk count (users whose
    lifetime reached the week), churned/censored exits, the discrete
    hazard d/n (one division + round — engine-identical), and the
    empirical all-users survival share. The per-user reduction is one
    hash-agg; the life table itself is |weeks| rows (bounded by the
    observation span, independent of user count), so its cumulative
    at-risk window is on a tiny relation.

    Timestamps carry sub-second parts; ``unix_timestamp`` truncates to
    whole seconds, so the oracle MUST mirror with ``floor(epoch(ts))``
    (raw ``epoch()`` is fractional in DuckDB — a first/last event
    within ~1s of a week boundary or the censoring cutoff would split
    the engines; same rule as bot_flags' gap seconds).
    """
    bounds = events.agg(F.max("ts").alias("obs_end"))
    per_user = (events.groupBy("user_id")
                .agg(F.min("ts").alias("first_ts"),
                     F.max("ts").alias("last_ts")))
    u = (per_user.crossJoin(F.broadcast(bounds))
         .select(
             F.floor(
                 (F.unix_timestamp("last_ts")
                  - F.unix_timestamp("first_ts"))
                 / (week_days * 86400)).cast("long").alias("week"),
             (F.unix_timestamp("last_ts")
              < F.unix_timestamp("obs_end")
              - churn_horizon_days * 86400).alias("churned")))
    total = u.agg(F.count(F.lit(1)).alias("n_total"))
    wk = (u.groupBy("week")
          .agg(F.sum(F.col("churned").cast("long")).alias("n_churned"),
               F.sum((~F.col("churned")).cast("long"))
               .alias("n_censored")))
    w_desc = Window.orderBy(F.col("week").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    w_asc = Window.orderBy("week") \
        .rowsBetween(Window.unboundedPreceding, 0)
    exits = F.col("n_churned") + F.col("n_censored")
    lt = (wk.withColumn("n_risk", F.sum(exits).over(w_desc))
          .withColumn("gone_thru", F.sum(exits).over(w_asc)))
    return (lt.crossJoin(F.broadcast(total))
            .select("week",
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("n_churned").cast("long").alias("n_churned"),
                    F.col("n_censored").cast("long").alias("n_censored"),
                    F.round(F.col("n_churned")
                            / F.col("n_risk").cast("double"), 6)
                    .alias("hazard"),
                    F.round((F.col("n_total") - F.col("gone_thru"))
                            / F.col("n_total").cast("double"), 6)
                    .alias("survival_emp")))


def cuped_ab_test(events: DataFrame, metric_type: str = "purchase",
                  pre_days: int = 15) -> DataFrame:
    """CUPED-adjusted A/B readout (Deng et al., WSDM'13): users are
    hash-assigned to two arms, the experiment metric is per-user
    post-period purchase value, and the pre-period value serves as the
    CUPED covariate — the industry-standard variance-reduction layer an
    experimentation engine runs on top of an event stream.

    Determinism: money is summed in exact integer cents per user;
    every pooled/arm moment (Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT
    aggregate; θ, the adjusted means and the variance reduction are
    then pure IEEE +−×/ chains over those exact scalars (big cross-
    products are cast to double BEFORE multiplying so no ANSI overflow
    at scale), so both engines produce the same double bit-for-bit.
    The arm hash is the portable md5-prefix integer. Zero-variance /
    single-user guards return NULL exactly where the oracle's float
    division-by-zero does. Two user-keyed aggregations + two scalar
    broadcasts — no per-user data ever converges on one task.
    """
    bounds = events.agg(F.min("ts").alias("t0"))
    e = events.crossJoin(F.broadcast(bounds))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    cut = F.col("t0") + F.expr(f"INTERVAL {pre_days} DAYS")
    is_m = F.col("event_type") == metric_type
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(is_m & (F.col("ts") < cut), cents)
              .otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(is_m & (F.col("ts") >= cut), cents)
              .otherwise(F.lit(0))).alias("y"))
    arm = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                              1, 15), 16, 10).cast("long") % 2)
    u = per_user.select(arm.alias("arm"), "x", "y")
    pooled = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"))
    pa = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum("x").cast("long").alias("sx_a"),
        F.sum("y").cast("long").alias("sy_a"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2_a"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy_a"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2_a"))
    j = pa.crossJoin(F.broadcast(pooled))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    th_den = d("sx2") - d("sx") * d("sx") / d("n")
    theta = F.when(th_den != 0.0,
                   (d("sxy") - d("sx") * d("sy") / d("n")) / th_den)
    mean_pre = d("sx_a") / d("n_a")
    mean_post = d("sy_a") / d("n_a")
    mean_adj = mean_post - theta * (mean_pre - d("sx") / d("n"))
    var_post = F.when(
        F.col("n_a") > 1,
        (d("sy2_a") - d("sy_a") * d("sy_a") / d("n_a"))
        / (d("n_a") - 1))
    var_adj = F.when(
        F.col("n_a") > 1,
        ((d("sy2_a") - 2 * theta * d("sxy_a")
          + theta * theta * d("sx2_a"))
         - (d("sy_a") - theta * d("sx_a"))
         * (d("sy_a") - theta * d("sx_a")) / d("n_a"))
        / (d("n_a") - 1))
    return j.select(
        F.col("arm"), F.col("n_a").alias("n_users"),
        F.round(mean_pre / 100, 6).alias("mean_pre"),
        F.round(mean_post / 100, 6).alias("mean_post"),
        F.round(mean_adj / 100, 6).alias("mean_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(F.when(var_post != 0.0, 1.0 - var_adj / var_post), 6)
        .alias("var_reduction"))


def adamic_adar(pairs: DataFrame, id_a: str, id_b: str,
                max_center_degree: int = 64, k: int = 50) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: for every
    non-adjacent pair sharing ≥1 neighbor, score
    Σ_{w ∈ N(a)∩N(b)} 1/ln(deg w) and keep the top-k.

    The wedge expansion (two-hop join through each common neighbor w)
    costs Σ_w deg(w)² — quadratic in hub degree — so centers above
    ``max_center_degree`` are excluded, the same hub-cap contract the
    blocked fuzzy/kNN operators use (a hub shared by everything carries
    ~no signal: 1/ln(deg) vanishes as deg grows). Each center's
    1/ln(deg) contribution is quantized to a 1e-6 integer before the
    per-pair sum, so scores are exact BIGINTs. Wedge centers have
    deg ≥ 2 by construction (ln > 0). Plan: degree agg → capped
    center join (equi-keyed on the center) → pair agg → anti-join
    existing edges → TakeOrdered top-k.
    """
    # Edges are canonicalized to ea < eb inside the adjacency build,
    # not at the caller: the scored pairs below are emitted with
    # a < b, so an input oriented id_a > id_b (or carrying both
    # orientations) would otherwise slip existing edges past the
    # non-adjacency anti-join.
    # Round-15 cut consolidation (guide §2.4/§6): ONE parquet cut —
    # the full adjacency, built with both orientations exploded from
    # each canonical edge in a single pass (the pagerank round-14
    # pattern) — replaces the former THREE cut writes (und, adj
    # re-read from the und leaf, adjc). The canonical edge list the
    # anti-join needs is just the node < nb half of the adjacency
    # leaf (a filter over the cut, no second materialization), and
    # adjc is a plain lazy pin: its tree is one join of the cut leaf
    # with a tiny aggregate, so the round-12 plan-size rationale for
    # cutting it no longer applies (3,333 analyzed nodes came from
    # adjc NESTING the un-cut und/adj subtrees).
    und_plan = _canon_undirected(pairs, id_a, id_b, "ea", "eb")
    adj = pin_cut(und_plan.select(F.explode(F.array(
        F.struct(F.col("ea").alias("node"), F.col("eb").alias("nb")),
        F.struct(F.col("eb").alias("node"), F.col("ea").alias("nb"))))
        .alias("_adj")).select("_adj.node", "_adj.nb"))
    und = adj.filter(F.col("node") < F.col("nb")).select(
        F.col("node").alias("ea"), F.col("nb").alias("eb"))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    centers = (deg.filter((F.col("deg") >= 2)
                          & (F.col("deg") <= max_center_degree))
               .select("node",
                       F.round(1e6 / F.log(F.col("deg")
                                           .cast("double")), 0)
                       .cast("long").alias("cw")))
    adjc = pin(adj.join(centers, "node"))
    ledge = adjc.select("node", F.col("nb").alias("a"), "cw")
    redge = adjc.select(F.col("node").alias("node_r"),
                        F.col("nb").alias("b"))
    wedges = ledge.join(redge,
                        (F.col("node") == F.col("node_r"))
                        & (F.col("a") < F.col("b")))
    scored = (wedges.groupBy("a", "b")
              .agg(F.sum("cw").cast("long").alias("score_e6"),
                   F.count(F.lit(1)).cast("long")
                   .alias("common_neighbors")))
    non_adj = scored.join(
        und, (F.col("a") == F.col("ea")) & (F.col("b") == F.col("eb")),
        "left_anti")
    return (non_adj
            .orderBy(F.col("score_e6").desc(), "a", "b").limit(k)
            .select("a", "b", "common_neighbors",
                    F.round(F.col("score_e6") / 1e6, 6).alias("aa_score")))


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event-type
    sequence: P(next_type | type) with exact counts and one division.

    Sequences are ordered by the total (ts, event_id) key per user, so
    the lag is deterministic; the matrix is |types|² rows regardless of
    event volume. One per-user window + one matrix-sized hash-agg; the
    row-normalizing totals come from a window over the tiny matrix.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (events.select("user_id", "ts", "event_id",
                       F.col("event_type").alias("to_type"),
                       F.lag("event_type").over(w).alias("from_type"))
         .filter(F.col("from_type").isNotNull()))
    m = (t.groupBy("from_type", "to_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w_row = Window.partitionBy("from_type")
    return (m.withColumn("row_total",
                         F.sum("n").over(w_row).cast("long"))
            .select("from_type", "to_type", "n", "row_total",
                    F.round(F.col("n")
                            / F.col("row_total").cast("double"), 6)
                    .alias("p")))


def k_core(pairs: DataFrame, id_a: str, id_b: str, k: int = 2,
           rounds: int = 5) -> DataFrame:
    """Bounded-round k-core decomposition: iteratively peel nodes of
    degree < ``k`` (degrees recounted against survivors each round) and
    return the surviving nodes with their in-core degree.

    Fixed ``rounds`` iterations rather than peel-to-fixpoint so the
    plan is a static 5-deep join chain an ANSI oracle can unroll
    CTE-for-CTE — on graphs this size the peel converges well inside
    the bound, and the bounded variant is deterministic either way.
    Per round: two semi-joins of the persisted edge list against the
    shrinking survivor set + one degree count — all equi-keyed on node
    ids, integer-only, no driver data traffic.
    """
    und = (pairs.select(F.col(id_a).alias("ea"), F.col(id_b).alias("eb"))
           .distinct())
    # both directions from ONE explode instead of a self-union, so the
    # distinct subtree is evaluated once inside edges' materialization
    # (the pagerank round-14 pattern)
    edges = pin(und.select(F.explode(F.array(
        F.struct(F.col("ea").alias("src"), F.col("eb").alias("dst")),
        F.struct(F.col("eb").alias("src"), F.col("ea").alias("dst"))))
        .alias("_ed")).select("_ed.src", "_ed.dst"))
    # Round 1 peels against the FULL node set, so its two semi-joins
    # were identities (every src/dst is alive by construction) — the
    # first degree count comes straight off the edge list, saving one
    # node-set distinct, one cut write and two joins (round-15,
    # guide §2.4 don't-compute-what-you-throw-away). Identical counts:
    # filtering edges by "endpoint ∈ all nodes" drops nothing.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    alive = deg.filter(F.col("deg") >= k).select("src")
    for _ in range(rounds - 1):
        # CUT each round's survivor set (node-cardinality): it is
        # referenced TWICE in the next round's join (src and dst
        # sides), so the un-cut lineage doubles the plan TREE per
        # iteration even when a persist bounds execution — the r11
        # audit caught a 214k-line executed plan for the 5-round peel.
        # MUST stay a parquet cut, not a localCheckpoint (round-15
        # measured negative result): a checkpoint's LogicalRDD leaf
        # carries no usable size statistics, so the two survivor
        # semi-joins flipped BroadcastHashJoin → SortMergeJoin of the
        # full edge list per round (plan-verified, 0→2 SMJ) and warm
        # time regressed ~20%; the parquet leaf's accurate stats keep
        # the join choice scale-adaptive (broadcast while the survivor
        # set is small, merge when it isn't).
        alive = pin_cut(alive)
        e2 = (edges.join(alive, "src")
              .join(alive.withColumnRenamed("src", "dst"), "dst"))
        deg = e2.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select("src")
    return (deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"),
                    F.col("deg").cast("long").alias("deg"))
            .orderBy("node"))


def bot_flags(events: DataFrame, burst_per_minute: int = 10,
              cv_threshold_micro: int = 300000) -> DataFrame:
    """Rule-based bot/abuse screening per user: peak events-per-minute
    (burst rate) and the coefficient of variation of inter-arrival
    gaps (machine traffic is suspiciously regular — low CV).

    All signals reduce to exact integers: per-minute counts are a
    (user, minute) hash-agg; inter-arrival gaps are WHOLE SECONDS
    (sub-second gaps floor to 0 — integer longs keep the gap moments
    exact where a microsecond sum-of-squares would overflow int64 and
    a double sum would be reduction-order-dependent); the CV runs on
    those exact sums with the same double shape on both engines and is
    quantized half-away to 1e-6 before the threshold compare, so the
    boolean flags are pure functions of emitted values. Two user-keyed
    aggs + one join on user_id.
    """
    per_min = (events.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("mn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("peak_per_min")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp(F.col("ts"))
           - F.unix_timestamp(F.lag("ts").over(w)))
    g = (events.select("user_id", gap.alias("g"))
         .filter(F.col("g").isNotNull()))
    mom = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("g").cast("long").alias("s1"),
                F.sum(F.col("g") * F.col("g")).cast("long")
                .alias("s2")))
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - F.col("s1").cast("double")
           * (F.col("s1").cast("double") / n)) / (n - 1)
    cv = F.when((F.col("n") > 1) & (F.col("s1") > 0),
                F.sqrt(var) / mean)
    cv_e6 = F.round(cv * 1e6, 0).cast("long")
    out = (per_min.join(mom.select(
        "user_id", F.col("n").alias("n_gaps"), cv_e6.alias("cv_e6")),
        "user_id", "left"))
    return (out.select(
        "user_id", "peak_per_min", "n_gaps",
        (F.col("cv_e6") / F.lit(1e6)).alias("gap_cv"),
        ((F.col("peak_per_min") >= burst_per_minute)
         | ((F.col("cv_e6").isNotNull())
            & (F.col("cv_e6") < cv_threshold_micro)))
        .alias("bot_suspect"))
        .orderBy("user_id"))


MARKOV_ITERS = 8
MARKOV_TOUCHES = ("click", "signup", "view")


def markov_attribution(events: DataFrame,
                       iters: int = MARKOV_ITERS) -> DataFrame:
    """Markov-chain (removal-effect) channel attribution: model user
    journeys as a first-order chain over touch channels with absorbing
    CONV/NULL states, estimate conversion probability from START by
    power iteration, and credit each channel by how much conversion
    drops when every edge into it is rerouted to NULL.

    Scale split: path extraction and transition counting are fully
    distributed (one per-user lag/lead window + one (from, to)
    hash-agg); the transition matrix itself is ≤|channels|+3 states —
    control-plane sized — so the absorption iterations run on the
    driver in EXACT Python integer arithmetic (1e-6 fixed-point,
    per-edge floor division) that the oracle's generated SQL unroll
    reproduces operation-for-operation. Conversions split paths: a
    post-purchase touch starts a new journey from START.
    """
    st = F.when(F.col("event_type") == "purchase", "CONV") \
        .otherwise(F.col("event_type"))
    f = (events.filter(F.col("event_type")
                       .isin(*MARKOV_TOUCHES, "purchase"))
         .select("user_id", "ts", "event_id", st.alias("st")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = f.select("st", F.lag("st").over(w).alias("prev_st"),
                 F.lead("st").over(w).alias("next_st"))
    t1 = (o.filter(F.col("prev_st").isNotNull()
                   & (F.col("prev_st") != "CONV"))
          .select(F.col("prev_st").alias("f"), F.col("st").alias("t")))
    t2 = (o.filter((F.col("st") != "CONV")
                   & (F.col("prev_st").isNull()
                      | (F.col("prev_st") == "CONV")))
          .select(F.lit("START").alias("f"), F.col("st").alias("t")))
    t3 = (o.filter((F.col("st") != "CONV") & F.col("next_st").isNull())
          .select(F.col("st").alias("f"), F.lit("NULL").alias("t")))
    cnt = (t1.union(t2).union(t3)
           .groupBy("f", "t").agg(F.count(F.lit(1)).alias("c"))
           .collect())  # <= (|channels|+1)^2 rows — control-plane

    counts = {(r["f"], r["t"]): r["c"] for r in cnt}
    totals: dict[str, int] = {}
    for (fs, _), c in counts.items():
        totals[fs] = totals.get(fs, 0) + c
    p = {(fs, ts): (c * 1000000) // totals[fs]
         for (fs, ts), c in counts.items()}

    def absorb(matrix: dict[tuple[str, str], int]) -> int:
        v = {"CONV": 1000000}
        for _ in range(iters):
            nv: dict[str, int] = {}
            for (fs, ts), pe in matrix.items():
                nv[fs] = nv.get(fs, 0) + (pe * v.get(ts, 0)) // 1000000
            nv["CONV"] = 1000000
            v = nv
        return v.get("START", 0)

    full = absorb(p)
    rows = []
    for ch in MARKOV_TOUCHES:
        rm = {(fs, "NULL" if ts == ch else ts): pe
              for (fs, ts), pe in p.items() if fs != ch}
        # merged duplicate (fs, NULL) keys: NULL carries v=0, so
        # collapsing vs not collapsing cannot change the sum — but the
        # dict comprehension WOULD drop mass, so accumulate instead
        rm = {}
        for (fs, ts), pe in p.items():
            if fs == ch:
                continue
            key = (fs, "NULL" if ts == ch else ts)
            rm[key] = rm.get(key, 0) + pe
        removed = absorb(rm)
        re_num = (full - removed) * 1000000
        re_e6 = ((2 * re_num + full) // (2 * full) if re_num >= 0
                 else -((2 * -re_num + full) // (2 * full)))
        rows.append((ch, full / 1000000.0, removed / 1000000.0,
                     re_e6 / 1000000.0))
    spark = events.sparkSession
    return spark.createDataFrame(
        rows, "channel string, p_conv double, p_conv_removed double, "
              "removal_effect double").orderBy("channel")


def degree_distribution(pairs: DataFrame, id_a: str, id_b: str
                        ) -> DataFrame:
    """Log2-binned degree histogram of an undirected graph with
    cumulative tail shares — the scale-free-ness profile that decides
    hub caps for the wedge-expansion operators (triangles,
    Adamic–Adar) before they run.

    bin = floor(log2(degree)) computed as the integer bit length
    (pure integer comparisons — no float log anywhere); counts are
    exact; the tail share per bin is one half-away division. The
    |bins| table is ≤ 64 rows regardless of graph size.
    """
    from .windows import int_mean_half_away
    und = (pairs.select(F.col(id_a).alias("ea"), F.col(id_b).alias("eb"))
           .distinct())
    # both endpoints from ONE explode — the distinct subtree is
    # evaluated once, not twice (round-15, guide §2.4)
    adj = und.select(F.explode(F.array("ea", "eb")).alias("node"))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # floor(log2(d)) as the binary-string length minus one — pure
    # integer/string ops; a float log2 could round 2^k to k-epsilon
    bin_ = (F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1) \
        .cast("long")
    h = (deg.select(bin_.alias("deg_bin"))
         .groupBy("deg_bin").agg(F.count(F.lit(1)).cast("long")
                                 .alias("n_nodes")))
    tot = h.agg(F.sum("n_nodes").cast("long").alias("n_total"))
    w = (Window.orderBy(F.col("deg_bin").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    lt = h.withColumn("tail_nodes", F.sum("n_nodes").over(w).cast("long"))
    share = int_mean_half_away(F.col("tail_nodes") * F.lit(1000000),
                               F.col("n_total"))
    return (lt.crossJoin(F.broadcast(tot))
            .select("deg_bin", "n_nodes", "tail_nodes",
                    (share / F.lit(1e6)).alias("tail_share"))
            .orderBy("deg_bin"))


def abc_pareto(df: DataFrame, key_col: str, value_cents: Column,
               a_cut: int = 700000, b_cut: int = 900000) -> DataFrame:
    """ABC / Pareto classification: rank keys by revenue, walk the
    cumulative share, and bucket into A (first ``a_cut``/1e6 of total
    revenue), B (to ``b_cut``/1e6), C (tail) — the inventory-analysis
    classic, built scale-safe on ``distributed_running_total`` (no
    global single-partition cumulative window).

    Revenue sums are exact integer cents; the cumulative share is
    integer floor arithmetic ((running·1e6)//total), so the class
    boundaries are engine-exact. Output: per class, key count, revenue
    and revenue share (half-away divisions of exact integers).
    """
    from .windows import distributed_running_total, int_mean_half_away
    rev = (df.groupBy(key_col)
           .agg(F.sum(value_cents).cast("long").alias("rev_c")))
    total = rev.agg(F.sum("rev_c").cast("long").alias("total_c"))
    run = distributed_running_total(
        rev, [F.desc("rev_c"), key_col], "rev_c", out="running_c")
    shared = run.crossJoin(F.broadcast(total))
    cum_e6 = F.floor((F.col("running_c") * 1000000)
                     / F.col("total_c")).cast("long")
    cls = (F.when(cum_e6 <= a_cut, "A")
           .when(cum_e6 <= b_cut, "B").otherwise("C"))
    agg = (shared.select(cls.alias("abc_class"), "rev_c")
           .groupBy("abc_class")
           .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum("rev_c").cast("long").alias("class_rev_c")))
    share = int_mean_half_away(F.col("class_rev_c") * F.lit(1000000),
                               F.col("total_c"))
    return (agg.crossJoin(F.broadcast(total))
            .select("abc_class", "n_keys",
                    (F.col("class_rev_c") / F.lit(100.0))
                    .alias("revenue"),
                    (share / F.lit(1e6)).alias("rev_share"))
            .orderBy("abc_class"))


def engagement_metrics(events: DataFrame, wau_days: int = 7,
                       mau_days: int = 30) -> DataFrame:
    """DAU / WAU / MAU and the DAU/MAU stickiness ratio per day — the
    product-analytics staple.

    Reduction first: the event stream collapses to distinct
    (user, day) pairs ONCE; the trailing windows are then a bounded
    fan-out join of that small relation against the |days| grid (each
    activity day lands in ≤ ``mau_days`` window anchors — a fixed 37×
    amplification, never |events|²) followed by per-anchor distinct
    counts. Stickiness is a half-away integer division. The grid is
    bounded by the calendar, independent of event volume.
    """
    from .windows import int_mean_half_away
    day = F.date_trunc("day", F.col("ts"))
    ud = pin(events.select("user_id", day.alias("day")).distinct())
    days = ud.select("day").distinct()
    dau = (ud.groupBy("day")
           .agg(F.countDistinct("user_id").cast("long").alias("dau")))
    fan = (ud.alias("u").join(
        days.alias("d"),
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") > F.col("d.day")
           - F.expr(f"INTERVAL {mau_days} DAYS"))))
    roll = (fan.groupBy(F.col("d.day").alias("day"))
            .agg(F.countDistinct(
                F.when(F.col("u.day") > F.col("d.day")
                       - F.expr(f"INTERVAL {wau_days} DAYS"),
                       F.col("u.user_id"))).cast("long").alias("wau"),
                F.countDistinct("u.user_id").cast("long").alias("mau")))
    j = dau.join(roll, "day")
    stick = int_mean_half_away(F.col("dau") * F.lit(1000000),
                               F.col("mau"))
    return (j.select("day", "dau", "wau", "mau",
                     (stick / F.lit(1e6)).alias("stickiness"))
            .orderBy("day"))


def bfs_distance(pairs: DataFrame, id_a: str, id_b: str,
                 seed_mod: int = 50, hops: int = 3) -> DataFrame:
    """Multi-source BFS distance histogram over an undirected pair
    list: seeds are the deterministic node set ``node % seed_mod == 0``
    (a scattered landmark set), and each unrolled round relaxes
    ``dist(v) = min(dist(v), dist(u)+1)`` across edges — the Pregel
    frontier pattern as plain joins, with EXACT integer distances (no
    float drift possible, bit-identical on any partitioning).

    Per round: one equi-join of the distance relation onto edges plus
    a min-combine groupBy — two shuffles, the same cost profile as a
    PageRank iteration; edges are computed once and persisted. Nodes
    beyond ``hops`` are simply absent (emit the reached histogram, one
    row per distance level — bounded output). For deep graphs swap the
    unrolled rounds for a loop with periodic localCheckpoint (the CC
    operator in operators/clustering.py shows the pattern).
    """
    und = _canon_undirected(pairs, id_a, id_b)
    # both directions from ONE explode instead of a self-union, so the
    # canonicalization subtree is evaluated once inside the pin's
    # materialization (the k_core/pagerank round-15 pattern)
    e = pin(und.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))))
        .alias("_ed")).select("_ed.src", "_ed.dst"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    d = pin(nodes.filter(F.col("node") % seed_mod == 0).select(
        "node", F.lit(0).cast("long").alias("dist")))
    for _ in range(hops):
        relaxed = (e.join(d.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("dist") + 1).alias("dist")))
        # CUT each round: d is referenced TWICE (union + relaxed), so
        # the distance relation's plan doubles per hop even when a
        # persist bounds execution (26.8k-line plan in the r11 audit —
        # the k_core per-iteration pattern)
        d = pin_cut(d.unionByName(relaxed)
                    .groupBy("node").agg(F.min("dist").alias("dist")))
    return (d.groupBy("dist")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .orderBy("dist"))


def did_estimator(events: DataFrame, split_days: int = 15,
                  value_col: str = "value",
                  user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Difference-in-differences effect estimate over a deterministic
    arm assignment (``user_id % 2``) and a pre/post split ``split_days``
    after the first observed event: DiD = (T̄post − T̄pre) − (C̄post −
    C̄pre) — the panel-data complement to the CUPED estimator.

    Exactness: cell sums are integer CENTS; each cell mean is the
    half-away integer mean on a 1e-6 dollar grid (the oracle mirrors
    the FULL sign form, so negative-sum cells cannot split engines); the
    DiD itself is a pure function of the four EMITTED means with fixed
    association, so both engines subtract identical doubles. The whole
    estimator is one 4-cell hash aggregate plus a 1-row broadcast
    scalar (the min-timestamp split point) — nothing shuffles on rows.
    """
    from .windows import int_mean_half_away
    t0 = events.agg(F.min(ts_col).alias("_t0"))
    e = (events.filter(F.col(value_col).isNotNull())
         .crossJoin(F.broadcast(t0))  # 1-row scalar join
         .select((F.col(user_col) % 2).alias("arm"),
                 (F.col(ts_col) >= F.col("_t0")
                  + F.expr(f"INTERVAL {split_days} DAYS"))
                 .cast("int").alias("post"),
                 F.round(F.col(value_col) * 100, 0).cast("long")
                 .alias("cents")))
    g = (e.groupBy("arm", "post")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("cents").alias("s")))
    mean = (int_mean_half_away(F.col("s") * 10000, F.col("n"))
            / F.lit(1e6))
    cell = lambda a, p, c: F.max(  # noqa: E731 — 4-cell pivot
        F.when((F.col("arm") == a) & (F.col("post") == p), F.col(c)))
    w = g.select("arm", "post", "n", mean.alias("mean"))
    out = w.agg(
        cell(1, 0, "n").alias("n_t_pre"), cell(1, 1, "n").alias("n_t_post"),
        cell(0, 0, "n").alias("n_c_pre"), cell(0, 1, "n").alias("n_c_post"),
        cell(1, 0, "mean").alias("mean_t_pre"),
        cell(1, 1, "mean").alias("mean_t_post"),
        cell(0, 0, "mean").alias("mean_c_pre"),
        cell(0, 1, "mean").alias("mean_c_post"))
    did = ((F.col("mean_t_post") - F.col("mean_t_pre"))
           - (F.col("mean_c_post") - F.col("mean_c_pre")))
    return out.withColumn("did", did)


HHI_UNIT_DIV = 10_000  # 1e4-grid revenue -> whole currency units


def supplier_hhi(lineitem: DataFrame, supplier: DataFrame,
                 nation: DataFrame) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue per
    nation: HHI = Σ share_i² · 10000 over each nation's suppliers.

    Exactness: per-supplier revenue is the exact integer
    Σ ep_cents·(100−disc_cents) (both factors on 2-dp grids, so the
    product sits on the 1e-4 grid), floored to whole currency units
    (non-negative — div and // agree); Σx and Σx² per nation are
    BIGINT; the emitted HHI is the UNROUNDED double
    ``ssq/(s·s)·10000`` — every input exact, the three IEEE ops
    identically associated on both engines, so no rounding knife-edge
    exists. Headroom: x² ≈ 4.8e14 per supplier at sf0.1; re-grid
    ``HHI_UNIT_DIV`` upward when per-nation supplier counts pass ~1e4.

    Scale: one shuffle keyed on suppkey for the revenue rollup, a
    shuffle join to the supplier dim on the same key, a 25-row nation
    broadcast, and a 25-group final aggregate.
    """
    ep_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    keep_c = (F.lit(100)
              - F.round(F.col("l_discount") * 100, 0).cast("long"))
    rev = (lineitem.groupBy("l_suppkey")
           .agg(F.sum(ep_c * keep_c).cast("long").alias("r4")))
    x = rev.withColumn("x", F.expr(f"r4 div {HHI_UNIT_DIV}"))
    per_sup = x.join(supplier.select("s_suppkey", "s_nationkey"),
                     x.l_suppkey == F.col("s_suppkey"))
    g = (per_sup.groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"),
              F.sum("x").cast("long").alias("s"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("ssq")))
    hhi = F.when(F.col("s") > 0,
                 F.col("ssq").cast("double")
                 / (F.col("s").cast("double") * F.col("s").cast("double"))
                 * F.lit(10000.0))
    return (g.join(F.broadcast(nation.select("n_nationkey", "n_name")),
                   g.s_nationkey == F.col("n_nationkey"))
            .select(F.col("n_name").alias("nation"), "n_suppliers",
                    hhi.alias("hhi"))
            .orderBy("nation"))


GINI_UNIT_DIV = 100  # cents -> whole currency units for the rank sums


def gini_by_nation(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame) -> DataFrame:
    """Gini coefficient of customer order spend per nation, via the
    rank formula G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) with x ascending.

    Exactness: per-customer spend is exact integer cents floored to
    whole units (non-negative); the rank i is a row_number over
    (x, custkey) — ties share a value, so the tie order cannot change
    Σ i·x_i; numerator and denominator are pure BIGINTs and the emit is
    the exact quotient ``(1e6·num) div den`` (num ≥ 0 by the sorted-
    rank inequality), one division by 1e6 — never a rounded ratio.
    Headroom: 1e6·num ≈ 5.4e17 at sf0.1's ~600 customers/nation;
    re-grid ``GINI_UNIT_DIV`` when per-nation spend totals pass ~1e12.

    Scale: spend rollup shuffles on custkey, the rank window partitions
    by nation (per-nation customer counts bounded), nation broadcast.
    Customers with no orders are out of scope (spend rollup is the
    universe).
    """
    spend_c = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    sp = (orders.groupBy("o_custkey")
          .agg(F.sum(spend_c).cast("long").alias("c4")))
    sp = sp.withColumn("x", F.expr(f"c4 div {GINI_UNIT_DIV}"))
    cust = sp.join(customer.select("c_custkey", "c_nationkey"),
                   sp.o_custkey == F.col("c_custkey"))
    w = Window.partitionBy("c_nationkey").orderBy("x", "c_custkey")
    r = cust.withColumn("i", F.row_number().over(w).cast("long"))
    g = (r.groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("s"),
              F.sum(F.col("i") * F.col("x")).cast("long").alias("s1")))
    num = F.lit(2) * F.col("s1") - (F.col("n") + 1) * F.col("s")
    g = g.withColumn("num", num).withColumn("den",
                                            F.col("n") * F.col("s"))
    gini = F.when(F.col("den") > 0,
                  F.expr("(1000000 * num) div den") / 1e6)
    return (g.join(F.broadcast(nation.select("n_nationkey", "n_name")),
                   g.c_nationkey == F.col("n_nationkey"))
            .select(F.col("n_name").alias("nation"), "n",
                    gini.alias("gini"))
            .orderBy("nation"))


def k_anonymity_profile(df: DataFrame, qi_cols: Sequence[str],
                        k_thresh: int = 10) -> DataFrame:
    """k-anonymity census over a quasi-identifier column set: the
    distribution of equivalence-class sizes k (how many rows share each
    QI combination) and whether each size clears the re-identification
    threshold — the first report a privacy review asks for before a
    data release.

    Pure integer pipeline: one aggregate per QI class, one aggregate
    over class sizes; the at-risk flag is an integer comparison. Scale:
    both shuffles key on the QI tuple / the size — never wider than the
    distinct-class count.
    """
    classes = (df.groupBy(*qi_cols)
               .agg(F.count(F.lit(1)).cast("long").alias("k")))
    return (classes.groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("n_classes"),
                 F.sum("k").cast("long").alias("n_rows"))
            .withColumn("at_risk", F.col("k") < k_thresh)
            .orderBy("k"))


def clustering_coefficient(pairs: DataFrame, id_a: str,
                           id_b: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of an undirected
    graph: C = 3·triangles / wedges, with wedges = Σ_v deg·(deg−1)/2.

    Same degree-oriented canonical-edge + adjacency-intersect machinery
    as :func:`triangle_stats` (hub fan-out collapsed, no wedge
    materialization — see :func:`_degree_oriented_edges` /
    :func:`_triangle_count`); degrees come from the same pinned
    aggregate that orients the edges. Everything is integer until the
    emit: deg·(deg−1) is always even so the wedge count is exact, and C
    rides the quotient grid ``(6e6·T) div Σdeg·(deg−1)`` (= 3T/W), one
    division by 1e6. Wedge-free graphs emit NULL.
    """
    e, deg = _degree_oriented_edges(pairs, id_a, id_b)
    w2 = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).cast("long")
                 .alias("w2"),
                 F.count(F.lit(1)).cast("long").alias("n_nodes"))
    out = (w2.crossJoin(e.agg(F.count(F.lit(1)).cast("long")
                              .alias("n_edges")))
           .crossJoin(_triangle_count(e)
                      .select(F.col("n_triangles").cast("long")
                              .alias("n_triangles"))))
    c = F.when(F.col("w2") > 0,
               F.expr("(6000000 * n_triangles) div w2") / 1e6)
    return out.select("n_nodes", "n_edges", "n_triangles",
                      F.expr("w2 div 2").alias("n_wedges"),
                      c.alias("transitivity"))


def open_order_backlog(orders: DataFrame, lineitem: DataFrame
                       ) -> DataFrame:
    """Daily open-order concurrency: each order is open from its order
    date until its last lineitem ship date (half-open [start, end)),
    and the backlog curve is the running sum of ±1 deltas over the
    distinct event days — the interval-concurrency pattern that also
    answers "concurrent sessions/jobs/loans at time t".

    The per-order interval is one aggregate over lineitem; deltas are
    exact integers; the cumulative curve rides
    ``distributed_running_total`` (range-partitioned prefix sums), so
    no single-partition global window exists even when the calendar
    spans decades. Output days are delta days only — the curve is
    piecewise constant between them.
    """
    from .windows import distributed_running_total
    span = (lineitem.groupBy("l_orderkey")
            .agg(F.max("l_shipdate").alias("end_day")))
    o = (orders.select(F.col("o_orderkey").alias("l_orderkey"),
                       F.col("o_orderdate").alias("start_day"))
         .join(span, "l_orderkey"))
    deltas = (o.select(F.col("start_day").alias("day"),
                       F.lit(1).cast("long").alias("d"))
              .unionByName(o.select(F.col("end_day").alias("day"),
                                    F.lit(-1).cast("long").alias("d")))
              .groupBy("day").agg(F.sum("d").cast("long").alias("delta")))
    run = distributed_running_total(deltas, ["day"], "delta",
                                    out="open_orders")
    return (run.select("day", "delta",
                       F.col("open_orders").cast("long")
                       .alias("open_orders"))
            .orderBy("day"))


def grouped_ols_slope(df: DataFrame, group_col: str, x_col: str,
                      y_col: str, grid: int = 10_000) -> DataFrame:
    """Per-group OLS slope of integer ``y`` on integer ``x`` — the
    grouped trend estimator (lead-time drift, per-segment seasonality
    slope), computed without ever forming float moments.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²): all five sums are
    BIGINT; the emit is the sign-split exact quotient
    ``sign(num)·((grid·|num|) div den)`` (den ≥ 0 by Cauchy–Schwarz)
    — never a rounded ratio of integers. Callers must pre-center ``x``
    against a FIXED anchor so n·Σx² stays inside int64 (document the
    headroom at the call site). Zero-variance groups emit NULL.
    """
    g = (df.groupBy(F.col(group_col).alias("g"))
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(x_col).cast("long").alias("sx"),
              F.sum(y_col).cast("long").alias("sy"),
              F.sum(F.col(x_col) * F.col(y_col)).cast("long")
              .alias("sxy"),
              F.sum(F.col(x_col) * F.col(x_col)).cast("long")
              .alias("sxx")))
    g = (g.withColumn("num", F.col("n") * F.col("sxy")
                      - F.col("sx") * F.col("sy"))
         .withColumn("den", F.col("n") * F.col("sxx")
                     - F.col("sx") * F.col("sx")))
    q = F.expr(f"CAST(sign(num) AS BIGINT)"
               f" * (({grid} * abs(num)) div den)")
    slope = F.when(F.col("den") > 0, q / float(grid))
    return (g.select(F.col("g").alias(group_col), "n",
                     slope.alias("slope"))
            .orderBy(group_col))


def transition_entropy(events: DataFrame) -> DataFrame:
    """Conditional next-event entropy per state: H(next | s) =
    Σ_t (c_st/c_s)·ln(c_s/c_st) over the first-order user-sequence
    transition counts — how predictable each event type's successor is
    (the sequence-modeling value of the attribution matrix).

    Counts ride the same deterministic lag as ``markov_transitions``;
    each (s, t) cell contributes round(c_st·ln(c_s/c_st)·1e6) on the
    perplexity-style integer grid (the log argument is a ratio of
    exact integers ≥ 1), and the emit divides the BIGINT sum once per
    state with fixed association. Matrix-sized work only.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (events.select("user_id", "ts", "event_id",
                       F.col("event_type").alias("to_type"),
                       F.lag("event_type").over(w).alias("from_type"))
         .filter(F.col("from_type").isNotNull()))
    m = (t.groupBy("from_type", "to_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = (m.groupBy("from_type")
           .agg(F.sum("n").cast("long").alias("c_s"),
                F.count(F.lit(1)).cast("long").alias("n_next")))
    j = m.join(F.broadcast(tot), "from_type")
    t6 = F.round((F.col("n").cast("double")
                  * F.log(F.col("c_s").cast("double")
                          / F.col("n").cast("double"))) * F.lit(1e6),
                 0).cast("long")
    s = (j.select("from_type", "c_s", "n_next", t6.alias("t6"))
         .groupBy("from_type", "c_s", "n_next")
         .agg(F.sum("t6").cast("long").alias("s6")))
    ent = F.round((F.col("s6").cast("double") / F.lit(1e6))
                  / F.col("c_s").cast("double"), 6)
    return (s.select("from_type", F.col("c_s").alias("n_out"),
                     "n_next", ent.alias("entropy"))
            .orderBy("from_type"))


def degree_assortativity(pairs: DataFrame, id_a: str,
                         id_b: str) -> DataFrame:
    """Degree assortativity of an undirected graph: the Pearson
    correlation of endpoint degrees over the 2m directed stubs — the
    one-number answer to "do hubs attach to hubs?" (r > 0) or to
    leaves (r < 0, the usual shape of co-occurrence projections).

    By stub symmetry Σx = Σy and Σx² = Σy², so everything reduces to
    FOUR exact BIGINT sums over the canonical edge list with both
    endpoint degrees joined on: M = 2m, Σx = Σ(dₐ+d_b),
    Σxy = 2Σdₐ·d_b, Σx² = Σ(dₐ²+d_b²). The emit is the UNROUNDED
    single IEEE division ``(MΣxy − (Σx)²) / (MΣx² − (Σx)²)`` on
    leaf-cast integers with identical association on both engines
    (ratio of exact integers — raw double is the knife-edge-free
    canonical form); regular graphs (zero degree variance) emit NULL.

    Scale: one degree aggregate + two node-keyed joins onto the edge
    list (the :func:`_degree_oriented_edges` cost shape), then one
    global aggregate — nothing wider than the edges ever shuffles.
    The n²-scaled combinations (M·Σxy) are evaluated as BIGINTs; on
    hub-heavy graphs past ~1e9 stub-degree mass, switch the final
    combination to leaf-cast doubles (rolling_corr precedent).
    """
    und = pin(_canon_undirected(pairs, id_a, id_b, "x", "y"))
    # both endpoints from one explode — a single pass over the cached
    # edge set instead of a two-branch self-union (round-15, §2.4)
    deg = (und.select(F.explode(F.array("x", "y")).alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d")))
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("da"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("db"))
    j = und.join(dx, "x").join(dy, "y")
    g = j.agg(
        (2 * F.count(F.lit(1))).cast("long").alias("m2"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("sx"),
        (2 * F.sum(F.col("da") * F.col("db"))).cast("long").alias("sxy"),
        F.sum(F.col("da") * F.col("da")
              + F.col("db") * F.col("db")).cast("long").alias("sxx"))
    den = F.col("m2") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sx")
    return g.select(
        F.expr("m2 div 2").alias("n_edges"),
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .alias("assortativity"))


def jaccard_link_prediction(pairs: DataFrame, id_a: str, id_b: str,
                            max_center_degree: int = 64,
                            k: int = 50) -> DataFrame:
    """Common-neighbor Jaccard link prediction: for every non-adjacent
    pair sharing ≥1 (capped) common neighbor, score
    |N(a)∩N(b)| / (deg a + deg b − |N(a)∩N(b)|), keep the top-k —
    Adamic–Adar's unweighted sibling (same hub-cap contract: wedge
    expansion through centers above ``max_center_degree`` is excluded;
    a hub shared by everything carries ~no signal).

    Common-neighbor counts are exact integers through the capped
    centers; degrees are FULL degrees (the cap bounds the wedge work,
    not the denominator); the score rides the non-negative quotient
    grid ``(1e6·c) div (dₐ+d_b−c)`` with one division at emit, and the
    top-k orders on the INTEGER score (ties by pair) so the cut is
    deterministic. Plan: degree agg → capped center join → pair agg →
    degree joins → anti-join existing edges → TakeOrdered top-k.
    """
    # Round-15 cut consolidation (guide §2.4/§6, the adamic_adar
    # treatment): ONE parquet cut — the full adjacency with both
    # orientations exploded from each canonical edge in a single pass
    # — replaces the former FOUR cut writes (und, adj, deg, adjc).
    # und is the node < nb half of the adjacency leaf (a filter, no
    # materialization); deg and adjc become lazy pins — their trees
    # are one aggregate / one join over the cut leaf, so the round-12
    # plan-size rationale (6,565 analyzed nodes from NESTED un-cut
    # subtrees) no longer applies.
    adj = pin_cut(_canon_undirected(pairs, id_a, id_b, "ea", "eb")
                  .select(F.explode(F.array(
                      F.struct(F.col("ea").alias("node"),
                               F.col("eb").alias("nb")),
                      F.struct(F.col("eb").alias("node"),
                               F.col("ea").alias("nb"))))
                      .alias("_adj")).select("_adj.node", "_adj.nb"))
    und = adj.filter(F.col("node") < F.col("nb")).select(
        F.col("node").alias("ea"), F.col("nb").alias("eb"))
    deg = pin(adj.groupBy("node")
              .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    centers = deg.filter((F.col("deg") >= 2)
                         & (F.col("deg") <= max_center_degree)) \
        .select("node")
    adjc = pin(adj.join(centers, "node"))
    ledge = adjc.select("node", F.col("nb").alias("a"))
    redge = adjc.select(F.col("node").alias("node_r"),
                        F.col("nb").alias("b"))
    wedges = ledge.join(redge, (F.col("node") == F.col("node_r"))
                        & (F.col("a") < F.col("b")))
    sc = (wedges.groupBy("a", "b")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    scored = (sc.join(da, "a").join(db, "b")
              .join(und, (F.col("a") == F.col("ea"))
                    & (F.col("b") == F.col("eb")), "left_anti")
              .withColumn("j6", F.expr("(1000000 * c) div (da + db - c)")
                          .cast("long")))
    return (scored.orderBy(F.col("j6").desc(), "a", "b").limit(k)
            .select("a", "b", F.col("c").alias("common_neighbors"),
                    (F.col("j6") / 1e6).alias("jaccard")))


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_support: int = 2, k: int = 25) -> DataFrame:
    """Market-basket association metrics for the top item pairs: joint
    support, per-item supports, confidence (P(b|a) on the exact
    ``(1e6·c_ab) div c_a`` grid) and lift (N·c_ab/(c_a·c_b), the
    independence multiple) — the report layer over
    :func:`frequent_pairs`'s candidate counts.

    All counts are exact integers from TWO aggregates over the same
    distinct (basket, item) projection (pair counts via the bounded
    per-basket self-join; item counts + the basket total piggyback);
    lift is an UNROUNDED single IEEE division of leaf-cast integer
    products (headroom: N·c_ab ≲ 1.5e5·30 ≈ 5e6 at sf0.1 — int64-safe
    through ~1e6× that). Top-k orders on (support, pair) so the cut is
    deterministic.
    """
    oi = pin(df.select(F.col(basket_col).alias("_b"),
                       F.col(item_col).alias("_i")).distinct())
    n_b = oi.agg(F.countDistinct("_b").cast("long").alias("n_baskets"))
    ic = oi.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("ci"))
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a._b") == F.col("b._b"))
                    & (F.col("a._i") < F.col("b._i")))
             .groupBy(F.col("a._i").alias("item_a"),
                      F.col("b._i").alias("item_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("support"))
             .filter(F.col("support") >= min_support))
    ca = ic.select(F.col("_i").alias("item_a"), F.col("ci").alias("ca"))
    cb = ic.select(F.col("_i").alias("item_b"), F.col("ci").alias("cb"))
    j = (pairs.join(ca, "item_a").join(cb, "item_b")
         .crossJoin(F.broadcast(n_b)))  # 1-row scalar join
    conf = F.expr("(1000000 * support) div ca") / 1e6
    lift = ((F.col("n_baskets") * F.col("support")).cast("double")
            / (F.col("ca") * F.col("cb")).cast("double"))
    return (j.orderBy(F.col("support").desc(), "item_a", "item_b")
            .limit(k)
            .select("item_a", "item_b", "support", "ca", "cb",
                    conf.alias("confidence"), lift.alias("lift")))


def cohort_ltv_triangle(orders: DataFrame, user_col: str = "o_custkey",
                        ts_col: str = "o_orderdate",
                        amount_col: str = "o_totalprice") -> DataFrame:
    """Customer-lifetime-value triangle: customers cohorted by the
    month of their FIRST order; each (cohort_month, month_offset) cell
    reports active customers, period revenue, and the cohort's running
    cumulative revenue — the retention×monetization report every
    subscription/commerce review starts from.

    Integer cents end to end: revenue sums are exact BIGINTs, months
    ride the linear year·12+month integer, and the cumulative column
    is a per-cohort running sum over the MATRIX (|cohorts| ×
    |offsets| rows — thousands at most, so the plain window is
    partition-bounded by construction; the heavy inputs never enter a
    window). Two keyed aggregates: first-order month per customer,
    then the (cohort, offset) rollup.
    """
    cents = F.round(F.col(amount_col) * 100, 0).cast("long")
    mon = (F.year(ts_col) * 12 + F.month(ts_col)).cast("long")
    o = orders.select(F.col(user_col).alias("u"), mon.alias("m"),
                      cents.alias("cents"))
    first = o.groupBy("u").agg(F.min("m").alias("m0"))
    j = o.join(first, "u")
    cell = (j.groupBy(F.col("m0").alias("cohort_month"),
                      (F.col("m") - F.col("m0")).alias("month_offset"))
            .agg(F.countDistinct("u").cast("long").alias("n_customers"),
                 F.sum("cents").cast("long").alias("rev_cents")))
    w = (Window.partitionBy("cohort_month").orderBy("month_offset")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (cell.withColumn("cum_rev_cents",
                            F.sum("rev_cents").over(w).cast("long"))
            .orderBy("cohort_month", "month_offset"))


def path_trigrams(events: DataFrame, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id", k: int = 20) -> DataFrame:
    """Top-k behavioral trigrams: the most frequent ordered
    3-step event-type sequences across all user streams — the
    "what do users actually do" path report feeding funnel design.

    One window pass (two lags over the (user, time, id) total order —
    deterministic like every sequence op here), one count aggregate
    over the |types|³-bounded key space, and a (count, path) top-k so
    the cut is tie-stable. Per-user partitions are the only window
    state — the same calendar/user bound as sessionization.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    t1 = F.lag(type_col, 2).over(w)
    t2 = F.lag(type_col, 1).over(w)
    g = (events.select(t1.alias("e1"), t2.alias("e2"),
                       F.col(type_col).alias("e3"))
         .filter(F.col("e1").isNotNull())
         .groupBy("e1", "e2", "e3")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (g.orderBy(F.col("n").desc(), "e1", "e2", "e3").limit(k))


def type_user_overlap(events: DataFrame, type_col: str = "event_type",
                      user_col: str = "user_id") -> DataFrame:
    """Pairwise audience overlap between event types: distinct-user
    Jaccard for every type pair — "do the same people click and
    purchase?" as a |types|² matrix.

    The pair join is keyed on the USER (rows = Σ_u k_u² over each
    user's distinct types — bounded by the type count, never |users|²)
    and the Jaccard rides the exact quotient grid
    ``(1e6·common) div (uₐ+u_b−common)`` with one division at emit.
    """
    tu = pin(events.select(F.col(type_col).alias("t"),
                           F.col(user_col).alias("u")).distinct())
    per = tu.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("nu"))
    a, b = tu.alias("a"), tu.alias("b")
    common = (a.join(b, (F.col("a.u") == F.col("b.u"))
                     & (F.col("a.t") < F.col("b.t")))
              .groupBy(F.col("a.t").alias("type_a"),
                       F.col("b.t").alias("type_b"))
              .agg(F.count(F.lit(1)).cast("long").alias("common_users")))
    ua = per.select(F.col("t").alias("type_a"), F.col("nu").alias("users_a"))
    ub = per.select(F.col("t").alias("type_b"), F.col("nu").alias("users_b"))
    j6 = F.expr("(1000000 * common_users) div "
                "(users_a + users_b - common_users)")
    return (common.join(ua, "type_a").join(ub, "type_b")
            .select("type_a", "type_b", "users_a", "users_b",
                    "common_users", (j6 / 1e6).alias("jaccard"))
            .orderBy("type_a", "type_b"))


def pareto_decile_share(orders: DataFrame,
                        key_col: str = "o_custkey",
                        amount_col: str = "o_totalprice",
                        n_buckets: int = 10) -> DataFrame:
    """Revenue-concentration (Pareto) report: customers ranked by
    lifetime revenue, cut into ``n_buckets`` exact deciles, each
    decile's revenue share and the running cumulative share — the
    80/20 curve account teams read.

    Revenue sums are integer cents; the decile assignment rides
    :func:`~..operators.windows.distributed_ntile` (range-partitioned
    local sorts over the customer dim — never a single-partition
    global window). Shares are UNROUNDED double ratios of exact
    BIGINTs (the kyle_lambda emit precedent — a 1e8 quotient-grid
    numerator on whole-corpus revenue overflows int64 even at
    sf0.01, the integer-headroom audit rule). The cumulative window
    runs over the ``n_buckets``-row MATRIX, never the customers.
    """
    from .windows import distributed_ntile
    rev = (orders.groupBy(key_col)
           .agg(F.sum(F.round(F.col(amount_col) * 100, 0).cast("long"))
                .cast("long").alias("rev_cents")))
    t = distributed_ntile(
        rev, n_buckets,
        [F.col("rev_cents").desc(), F.col(key_col)], out="decile")
    g = (t.groupBy("decile")
         .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
              F.sum("rev_cents").cast("long").alias("decile_rev_cents")))
    w_tot = Window.partitionBy()
    w_cum = (Window.partitionBy().orderBy("decile")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (g.withColumn("total_cents",
                      F.sum("decile_rev_cents").over(w_tot).cast("long"))
         .withColumn("cum_cents",
                     F.sum("decile_rev_cents").over(w_cum).cast("long")))
    sh = (F.col("decile_rev_cents").cast("double")
          / F.col("total_cents").cast("double"))
    cm = (F.col("cum_cents").cast("double")
          / F.col("total_cents").cast("double"))
    return (g.select(F.col("decile").cast("long").alias("decile"),
                     "n_customers", "decile_rev_cents",
                     F.when(F.col("total_cents") > 0, sh)
                     .alias("revenue_share"),
                     F.when(F.col("total_cents") > 0, cm)
                     .alias("cum_share"))
            .orderBy("decile"))


REORDER_BUCKET_DAYS = 7  # week-wide reorder-interval buckets


def reorder_interval_census(orders: DataFrame,
                            bucket_days: int = REORDER_BUCKET_DAYS
                            ) -> DataFrame:
    """Reorder-cadence census: day gaps between each customer's
    consecutive orders, bucketed into ``bucket_days``-wide bins — the
    repurchase-cycle histogram demand forecasting starts from.

    Gaps are exact integer day differences on the DATE grid (both
    engines date-cast before differencing), the bucket an integer div
    (gaps are non-negative under the (date, orderkey) total order),
    counts exact, shares on the ``(1e8·n) div total`` quotient grid;
    the total windows over the bucket MATRIX.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    d = F.col("o_orderdate").cast("date")
    gaps = (orders
            .select("o_custkey", "o_orderdate", "o_orderkey",
                    F.datediff(d, F.lag(d).over(w)).cast("long")
                    .alias("gap_days"))
            .filter(F.col("gap_days").isNotNull()))
    b = (gaps.select(F.expr(f"gap_days div {bucket_days}")
                     .alias("bucket"))
         .groupBy("bucket")
         .agg(F.count(F.lit(1)).cast("long").alias("n_intervals")))
    t = b.withColumn(
        "total_intervals",
        F.sum("n_intervals").over(Window.partitionBy()).cast("long"))
    sh = F.expr("(100000000 * n_intervals) div total_intervals") / 1e6
    return (t.select((F.col("bucket") * bucket_days)
                     .cast("long").alias("bucket_start_days"),
                     "n_intervals",
                     F.when(F.col("total_intervals") > 0, sh)
                     .alias("interval_share_pct"))
            .orderBy("bucket_start_days"))


RICH_CLUB_PCTS = (50, 75, 90)  # degree-quantile thresholds


def rich_club(pairs: DataFrame, id_a: str, id_b: str,
              pcts: Sequence[int] = RICH_CLUB_PCTS) -> DataFrame:
    """Rich-club coefficients of an undirected pair graph: for each
    degree threshold t (exact degree quantiles at ``pcts``), the
    density φ(t) = 2·E_t / (N_t·(N_t−1)) of the subgraph induced by
    nodes with degree ≥ t — do the hubs preferentially wire to each
    other? (Colizza et al.'s connectivity diagnostic.)

    Exactness/scale: degrees and edge counts are integers; thresholds
    come from a prefix sum over the degree-HISTOGRAM matrix (distinct
    degree values, never a node sort); the threshold table (|pcts|
    rows) broadcasts onto the degree-annotated edge list, so the only
    row-scale work is the two node-keyed degree joins. φ rides the
    ``(1e8·2E) div (N(N−1))`` quotient grid — one division at emit.
    N·(N−1) needs N < ~3e9 for int64 headroom (any real graph's rich
    club is far smaller).
    """
    # pin_cut: four downstream references (two degree-union branches,
    # two edge-degree joins), each repeating the subtree in the
    # analyzed tree (2.2k plan lines with plain pin, round-11 audit)
    und = pin_cut(_canon_undirected(pairs, id_a, id_b))
    deg = pin(und.select(F.col("a").alias("node"))
              .unionByName(und.select(F.col("b").alias("node")))
              .groupBy("node")
              .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    hist = (deg.groupBy("deg")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w_cum = (Window.partitionBy().orderBy("deg")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hist = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
            .withColumn("n_total",
                        F.sum("cnt").over(Window.partitionBy())))
    # threshold for pct p: the smallest degree whose cumulative count
    # reaches floor(p·(N+1)/100) — the nearest-rank (N+1) convention,
    # same form as events_exact_quantiles (NOT ceil(p·N/100): e.g.
    # p=10, N=11 gives rank 1, where ceil would give 2).
    # All thresholds come out of ONE conditional aggregate over the
    # histogram matrix (round-10: the per-pct filter+agg loop launched
    # |pcts| separate jobs, each rescanning the degree cache), then
    # stack to (pct, threshold_deg) rows driver-side — |pcts| scalars.
    one = hist.agg(*[
        F.min(F.when(
            F.col("cum") >= F.expr(f"({p} * n_total + {p}) div 100"),
            F.col("deg"))).alias(f"t{p}")
        for p in pcts])
    stack = ", ".join(f"{p}L, t{p}" for p in pcts)
    pct_df = one.selectExpr(
        f"stack({len(pcts)}, {stack}) AS (pct, threshold_deg)")
    thr = F.broadcast(pct_df)
    # Membership counts ride the degree HISTOGRAM the thresholds were
    # already computed from (round-14, guide §2.3): Σ cnt over
    # deg ≥ t touches |distinct degrees| rows instead of every node —
    # free (no new relation) and strictly less work at any scale.
    members = (hist.crossJoin(thr)
               .filter(F.col("deg") >= F.col("threshold_deg"))
               .groupBy("pct", "threshold_deg")
               .agg(F.sum("cnt").cast("long").alias("n_nodes")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ed = (und.join(da, "a").join(db, "b")
          .select(F.least("da", "db").alias("dmin")))
    # Edge counts go straight through the 3-row broadcast crossJoin +
    # filter + map-side partial agg, all pipelined in the edge-join
    # stage. Round-14 routed this through an intermediate dmin
    # histogram (groupBy(dmin) then crossJoin the histogram); that
    # added one exchange+stage and was measured SLOWER on two boxes
    # (driver r14: 0.73x at loadavg 5.68; r15 interleaved A/B: min
    # 3.52s vs 3.94s, tools/ab_rich_club.py) — the |pcts|-fold row
    # amplification is in-pipeline compute collapsed immediately by
    # the partial agg, never shuffled, so there is no at-scale data-
    # movement argument for the extra stage (r15 adjudication of the
    # r14 perf-weak mark).
    edges = (ed.crossJoin(thr)
             .filter(F.col("dmin") >= F.col("threshold_deg"))
             .groupBy("pct", "threshold_deg")
             .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    j = (members.join(edges, ["pct", "threshold_deg"], "left")
         .withColumn("n_edges",
                     F.coalesce(F.col("n_edges"), F.lit(0))
                     .cast("long")))
    phi = F.expr("(100000000 * 2 * n_edges) div "
                 "(n_nodes * (n_nodes - 1))") / 1e6
    return (j.select("pct", "threshold_deg", "n_nodes", "n_edges",
                     F.when(F.col("n_nodes") > 1, phi).alias("phi"))
            .orderBy("pct"))


# Benford's law expected first-digit shares: log10(1 + 1/d), shared
# literal-for-literal with the SQL oracle (the 4ln2 hardcoding rule)
BENFORD_EXPECTED = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829992, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514}


def benford_first_digit(events: DataFrame,
                        value_col: str = "value") -> DataFrame:
    """Benford first-digit audit of a positive amount column: observed
    vs expected leading-digit distribution — the classic fabricated-
    data / unit-mixup screen a data-quality pipeline runs on any
    money-like feed.

    The leading digit comes from the DECIMAL STRING of the integer
    cents (no float log10 — a transcendental bucket boundary would be
    a knife edge); counts are exact, the observed share rides the
    ``(1e8·n) div total`` quotient grid, expected shares are shared
    hardcoded literals, and the deviation subtracts the two emitted
    doubles with identical association. Zero/negative amounts drop on
    both engines.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    d = (events.select(cents.alias("cents"))
         .filter(F.col("cents") > 0)
         .select(F.substring(F.col("cents").cast("string"), 1, 1)
                 .cast("long").alias("digit"))
         .groupBy("digit")
         .agg(F.count(F.lit(1)).cast("long").alias("n_values")))
    t = d.withColumn(
        "total_values",
        F.sum("n_values").over(Window.partitionBy()).cast("long"))
    obs = F.expr("(100000000 * n_values) div total_values") / 1e8
    exp_col = F.create_map(
        *[F.lit(v) for kv in BENFORD_EXPECTED.items() for v in kv]
    )[F.col("digit")]
    o = F.when(F.col("total_values") > 0, obs)
    return (t.select("digit", "n_values",
                     o.alias("observed_share"),
                     exp_col.alias("expected_share"),
                     (o - exp_col).alias("deviation"))
            .orderBy("digit"))


def session_concurrency_census(events: DataFrame,
                               gap_seconds: int = 1800) -> DataFrame:
    """Concurrency census of gap-based sessions: sweep-line ±1 deltas
    at session starts/ends, an exact global prefix sum for the
    concurrency level at every boundary instant, and the census of
    levels — "how often were exactly k users on at once", the
    capacity-planning histogram (peak = the max row).

    Sessions are closed intervals, so the −1 lands at ``end + 1s``
    (an end and a start at the same instant DO overlap). Deltas
    aggregate per instant FIRST (the boundary relation is
    session-scale, instants unique), then the running level rides
    :func:`~..operators.windows.distributed_running_total` — no
    single-partition window at any calendar span. All integers.
    """
    from ..streaming.events import sessionize
    from .windows import distributed_running_total
    s = sessionize(events, gap_seconds=gap_seconds)
    deltas = (s.select(F.col("session_start").alias("t"),
                       F.lit(1).cast("long").alias("d"))
              .unionByName(
                  s.select((F.col("session_end")
                            + F.expr("INTERVAL 1 SECOND")).alias("t"),
                           F.lit(-1).cast("long").alias("d")))
              .groupBy("t").agg(F.sum("d").cast("long").alias("delta")))
    run = distributed_running_total(deltas, ["t"], "delta",
                                    out="level")
    return (run.groupBy(F.col("level").cast("long").alias("level"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_instants"))
            .orderBy("level"))


def advance_decline_line(daily: DataFrame) -> DataFrame:
    """Market-breadth advance/decline line: per day, how many symbols
    closed up vs down vs flat against their prior close, and the
    cumulative net (A/D line) — the cross-SECTIONAL health check no
    per-symbol indicator sees (narrow rallies diverge here first).

    Comparisons are integer cents; the cumulative net runs over the
    DAY matrix (calendar-bounded rows, the obv bound note), exact
    integer sums throughout.
    """
    w = Window.partitionBy("event_type").orderBy("hr")
    c = F.round(F.col("close") * 100, 0).cast("long")
    d = (daily.select("event_type", "hr", c.alias("c"))
         .withColumn("pc", F.lag("c").over(w))
         .filter(F.col("pc").isNotNull()))
    g = (d.groupBy("hr")
         .agg(F.sum(F.when(F.col("c") > F.col("pc"), 1).otherwise(0))
              .cast("long").alias("advancers"),
              F.sum(F.when(F.col("c") < F.col("pc"), 1).otherwise(0))
              .cast("long").alias("decliners"),
              F.sum(F.when(F.col("c") == F.col("pc"), 1).otherwise(0))
              .cast("long").alias("unchanged")))
    w_cum = (Window.partitionBy().orderBy("hr")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    net = (F.col("advancers") - F.col("decliners")).cast("long")
    return (g.withColumn("net", net)
            .withColumn("ad_line",
                        F.sum("net").over(w_cum).cast("long"))
            .select(F.col("hr").alias("day"), "advancers", "decliners",
                    "unchanged", "net", "ad_line")
            .orderBy("day"))


def copurchase_weight_histogram(baskets: DataFrame,
                                basket_col: str = "bk",
                                item_col: str = "i") -> DataFrame:
    """Edge-weight histogram of the co-purchase graph: weight(a,b) =
    number of baskets containing both items, then the census of
    weights — the support distribution that separates real affinity
    edges (weight ≫ 1) from one-off noise, and the tuning input for
    any min-support cut upstream of basket-lift mining.

    The pair join is basket-keyed (bounded per-basket fan-out, the
    basket_lift shape — never item×item); weights and counts exact
    integers; the share rides the quotient grid over the weight
    MATRIX.
    """
    oi = baskets.select(F.col(basket_col).alias("bk"),
                        F.col(item_col).alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    wts = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                  & (F.col("a.i") < F.col("b.i")))
           .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
           .agg(F.count(F.lit(1)).cast("long").alias("weight")))
    h = (wts.groupBy("weight")
         .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    t = h.withColumn(
        "total_edges",
        F.sum("n_edges").over(Window.partitionBy()).cast("long"))
    sh = F.expr("(1000000 * n_edges) div total_edges") / 1e6
    return (t.select("weight", "n_edges",
                     F.when(F.col("total_edges") > 0, sh)
                     .alias("edge_share"))
            .orderBy("weight"))


def retention_triangle(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by first-active
    week, and for each (cohort, week-offset) cell the count and share
    of the cohort still active — the product-analytics twin of the
    order-LTV triangle (activity, not revenue).

    One distinct (user, week) projection; the cohort week is a
    min-window over it; offsets are exact integer day-diffs div 7
    (both weeks are week-truncated, so the diff is a non-negative
    multiple of 7); the cohort size joins back from the offset-0 cell
    of the cohort×offset MATRIX; retention rides the
    ``(1e6·n) div size`` quotient grid.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    uw = (events.select(F.col(user_col).alias("u"), wk.alias("w"))
          .distinct())
    w_first = Window.partitionBy("u")
    c = uw.withColumn("cohort", F.min("w").over(w_first))
    cells = (c.select(
        "cohort",
        (F.datediff(F.col("w").cast("date"),
                    F.col("cohort").cast("date"))
         / 7).cast("long").alias("week_offset"))
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active")))
    size = (cells.filter(F.col("week_offset") == 0)
            .select("cohort", F.col("n_active").alias("cohort_size")))
    j = cells.join(F.broadcast(size), "cohort")
    ret = F.expr("(1000000 * n_active) div cohort_size") / 1e6
    return (j.select("cohort", "week_offset", "n_active", "cohort_size",
                     F.when(F.col("cohort_size") > 0, ret)
                     .alias("retention"))
            .orderBy("cohort", "week_offset"))


def discount_impact(lineitem: DataFrame) -> DataFrame:
    """Discount-impact report per discount level: item counts, gross
    extended price, and the revenue given away — is the 10% tier
    earning its volume? — all on exact integer grids.

    The discount-weighted sum is ``Σ e_cents·d_bp`` (both factors
    exact grid ints; int64 headroom holds to ~9e13 item-dollars per
    bucket — pre-aggregate per (bucket, price) above that, the
    integer-headroom audit rule); the effective-discount emit is ONE
    double division ``S / (gross·1e4)`` mirrored association-exact.
    """
    e = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d = F.round(F.col("l_discount") * 100, 0).cast("long")
    g = (lineitem.select(d.alias("discount_pct"), e.alias("ec"))
         .groupBy("discount_pct")
         .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
              F.sum("ec").cast("long").alias("gross_cents"),
              F.sum(F.col("ec") * F.col("discount_pct")).cast("long")
              .alias("disc_weighted")))
    eff = (F.col("disc_weighted").cast("double")
           / (F.col("gross_cents").cast("double") * F.lit(100.0)))
    given = F.expr("disc_weighted div 100")
    return (g.select("discount_pct", "n_items", "gross_cents",
                     given.alias("discount_given_cents"),
                     F.when(F.col("gross_cents") > 0, eff)
                     .alias("effective_discount"))
            .orderBy("discount_pct"))


def first_vs_repeat_revenue(orders: DataFrame) -> DataFrame:
    """Monthly revenue split between first-time and repeat customers —
    the acquisition-vs-retention mix curve growth teams track.

    An order is "first" iff it is row 1 under the per-customer
    (orderdate, orderkey) total order; revenue is integer cents; the
    within-month share is an UNROUNDED double ratio of exact BIGINTs
    (month totals overflow the 1e8 quotient numerator at scale — the
    pareto precedent); the month total windows over the
    month×2 MATRIX.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey")
    o = (orders.withColumn("rn", F.row_number().over(w))
         .select(F.date_trunc("month", F.col("o_orderdate"))
                 .alias("month"),
                 (F.col("rn") == 1).alias("is_first"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("cents")))
    g = (o.groupBy("month", "is_first")
         .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
              F.sum("cents").cast("long").alias("revenue_cents")))
    t = g.withColumn(
        "month_cents",
        F.sum("revenue_cents").over(Window.partitionBy("month"))
        .cast("long"))
    sh = (F.col("revenue_cents").cast("double")
          / F.col("month_cents").cast("double"))
    return (t.select("month", "is_first", "n_orders", "revenue_cents",
                     F.when(F.col("month_cents") > 0, sh)
                     .alias("revenue_share"))
            .orderBy("month", "is_first"))


def degree_gini(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Gini coefficient of the degree distribution — ONE number for
    "how hub-dominated is this graph", the inequality summary that
    decides whether degree-oriented machinery (triangles, wedge caps)
    is load-bearing or cosmetic on a given graph.

    The rank formula G = (2·Σ i·x_i − (n+1)·Σx)/(n·Σx) evaluated on
    the degree HISTOGRAM, never a node sort: for a block of w equal
    degrees after c predecessors, Σ i over the block is
    c·w + w(w+1)/2, so S1 = Σ_v x_v·(c_v·w_v + w_v(w_v+1)/2) needs
    only a prefix sum over the distinct-degree matrix. All terms exact
    BIGINTs (headroom: S1 ≲ deg_max·n² — re-grid degrees above ~1e9
    nodes); the emit is ONE double division of exact integers.
    """
    und = _canon_undirected(pairs, id_a, id_b)
    # both endpoints from ONE explode — the canon subtree (pair
    # self-join + distinct) is evaluated once, not twice (round-15)
    deg = (und.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("x")))
    h = deg.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("w"))
    w_cum = (Window.partitionBy().orderBy("x")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h = h.withColumn("c", (F.sum("w").over(w_cum) - F.col("w"))
                     .cast("long"))
    s1_term = (F.col("x") * (F.col("c") * F.col("w")
                             + F.expr("w * (w + 1) div 2"))).cast("long")
    g = h.agg(F.sum("w").cast("long").alias("n"),
              F.sum(F.col("x") * F.col("w")).cast("long").alias("sx"),
              F.sum(s1_term).cast("long").alias("s1"))
    g = (g.withColumn("num", (F.lit(2) * F.col("s1")
                              - (F.col("n") + 1) * F.col("sx"))
                      .cast("long"))
         .withColumn("den", (F.col("n") * F.col("sx")).cast("long")))
    gini = F.col("num").cast("double") / F.col("den").cast("double")
    return g.select("n", F.col("sx").alias("sum_degree"),
                    F.when(F.col("den") > 0, gini).alias("gini"))


def ks_two_sample(events: DataFrame, value_col: str = "value",
                  group_col: str = "event_type") -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group between
    the weekday and weekend distributions of ``value_col`` — the
    distribution-drift test a pipeline runs before trusting that a
    slice (new source, new day-of-week mix, post-deploy traffic) still
    follows the reference distribution.

    Exact, not sampled: values ride the cents grid, so the pooled
    support per group is DOMAIN-BOUNDED (≤ ~56k distinct cents values)
    and the ECDF difference is a window over the per-group count
    MATRIX (the bounded-domain ladder admissibility condition,
    operators/aggregates.py) — never a sort of the raw stream. One
    hash-agg over (group, value, side), one matrix window, one final
    aggregate. Cumulative counts are exact BIGINTs; each candidate
    D(v) = |cum_we/n_we − cum_wd/n_wd| is ONE pair of IEEE divisions
    of exact integers (identical association in the DuckDB oracle) and
    the max over v is order-independent, so the emit is deterministic.
    Weekend = Saturday/Sunday (Spark dayofweek ∈ {1, 7} ≡ DuckDB
    dayofweek ∈ {0, 6}).
    """
    v = F.round(F.col(value_col) * 100, 0).cast("long")
    we = F.dayofweek("ts").isin(1, 7).cast("long")
    # NULL values are excluded explicitly: the engines order NULL keys
    # differently in the cumulative window (Spark NULLS FIRST, DuckDB
    # NULLS LAST), so a null row would land in different ECDF prefixes
    # — the catalog_quant convention (filter, don't pin null order)
    m = (events.filter(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("g"), v.alias("v"),
                 we.alias("we"))
         .groupBy("g", "v")
         .agg(F.sum("we").cast("long").alias("cwe"),
              F.sum(F.lit(1) - F.col("we")).cast("long").alias("cwd")))
    cum = (Window.partitionBy("g").orderBy("v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("g")
    c = m.select(
        "g",
        F.sum("cwe").over(cum).cast("long").alias("awe"),
        F.sum("cwd").over(cum).cast("long").alias("awd"),
        F.sum("cwe").over(tot).cast("long").alias("nwe"),
        F.sum("cwd").over(tot).cast("long").alias("nwd"))
    d = F.abs(F.col("awe").cast("double") / F.col("nwe").cast("double")
              - F.col("awd").cast("double") / F.col("nwd").cast("double"))
    return (c.groupBy("g")
            .agg(F.max("nwe").alias("n_weekend"),
                 F.max("nwd").alias("n_weekday"),
                 F.max(F.when((F.col("nwe") > 0) & (F.col("nwd") > 0), d))
                 .alias("ks_stat"))
            .select(F.col("g").alias(group_col), "n_weekend",
                    "n_weekday", "ks_stat")
            .orderBy(group_col))


def dow_hour_decomposition(events: DataFrame) -> DataFrame:
    """Two-way additive seasonal decomposition of the event-count
    matrix over (day-of-week × hour-of-day): for each of the 168
    cells, expected = row_effect + col_effect − grand_mean and
    residual = n − expected — the classic means-model seasonality
    split that separates "Mondays are busy" from "9am is busy" and
    flags cells that break both patterns.

    The full 7×24 domain is zero-filled from a 168-row local relation
    (cells absent from the data would otherwise bias every marginal
    mean), counts are exact BIGINTs, and all three effects are single
    divisions of exact integer sums by exact literal cell counts —
    emitted UNROUNDED with identical association in the oracle (pure
    functions of exact integers, the kyle-lambda rule). dow is 0=Sun
    … 6=Sat (Spark ``dayofweek − 1`` ≡ DuckDB ``dayofweek``). Scale:
    one hash-agg over the stream; every window is over the 168-row
    matrix.
    """
    spark = events.sparkSession
    dom = spark.createDataFrame(
        [(d, h) for d in range(7) for h in range(24)],
        "dow long, hr long")
    cnt = (events.select((F.dayofweek("ts") - 1).cast("long").alias("dow"),
                         F.hour("ts").cast("long").alias("hr"))
           .groupBy("dow", "hr")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    filled = (dom.join(cnt, ["dow", "hr"], "left")
              .select("dow", "hr",
                      F.coalesce(F.col("c"), F.lit(0)).cast("long")
                      .alias("n")))
    rs = F.sum("n").over(Window.partitionBy("dow")).cast("long")
    cs = F.sum("n").over(Window.partitionBy("hr")).cast("long")
    g = F.sum("n").over(Window.partitionBy()).cast("long")
    e = filled.select("dow", "hr", "n", rs.alias("rs"), cs.alias("cs"),
                      g.alias("g"))
    expected = (F.col("rs").cast("double") / 24.0
                + F.col("cs").cast("double") / 7.0
                - F.col("g").cast("double") / 168.0)
    return (e.select("dow", "hr", "n", expected.alias("expected"),
                     (F.col("n").cast("double")
                      - (F.col("rs").cast("double") / 24.0
                         + F.col("cs").cast("double") / 7.0
                         - F.col("g").cast("double") / 168.0))
                     .alias("residual"))
            .orderBy("dow", "hr"))


def grouped_count_gini(df: DataFrame, group_col: str,
                       entity_col: str) -> DataFrame:
    """Gini coefficient of per-entity activity within each group —
    "how concentrated is this event type across users": 0 = everyone
    contributes equally, →1 = a handful of entities dominate. The
    per-group twin of :func:`degree_gini`, same histogram algebra.

    Never sorts entities: the rank formula
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) is evaluated on the
    count-of-counts HISTOGRAM (for a run of w equal values x after c
    predecessors, Σ i over the run is c·w + w(w+1)/2), so the only
    window is a prefix sum over the per-group distinct-count matrix —
    domain-bounded (distinct activity levels, not entities). All terms
    exact BIGINTs (headroom: S1 ≲ x_max·n² — re-grid above ~1e9
    entities/group); the emit is ONE double division of exact
    integers, ties need no ordering (equal values commute in Σi·x_i).
    """
    x = (df.groupBy(F.col(group_col).alias("g"),
                    F.col(entity_col).alias("e"))
         .agg(F.count(F.lit(1)).cast("long").alias("x")))
    h = x.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("w"))
    cum = (Window.partitionBy("g").orderBy("x")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h = h.withColumn("c", (F.sum("w").over(cum) - F.col("w")).cast("long"))
    s1_term = (F.col("x") * (F.col("c") * F.col("w")
                             + F.expr("w * (w + 1) div 2"))).cast("long")
    g = h.groupBy("g").agg(
        F.sum("w").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("w")).cast("long").alias("sx"),
        F.sum(s1_term).cast("long").alias("s1"))
    g = (g.withColumn("num", (F.lit(2) * F.col("s1")
                              - (F.col("n") + 1) * F.col("sx"))
                      .cast("long"))
         .withColumn("den", (F.col("n") * F.col("sx")).cast("long")))
    gini = F.col("num").cast("double") / F.col("den").cast("double")
    return (g.select(F.col("g").alias(group_col),
                     F.col("n").alias("n_entities"),
                     F.col("sx").alias("n_rows"),
                     F.when(F.col("den") > 0, gini).alias("gini"))
            .orderBy(group_col))


def _triangle_vertices(e: DataFrame) -> DataFrame:
    """Triangle list (a, b, c) over a degree-oriented edge list — the
    per-edge adjacency intersection of :func:`_triangle_count` with
    the third vertex EXPLODED instead of counted, for per-node
    credit. Output is triangle-cardinality (each triangle exactly
    once, on its base edge), never wedge-cardinality; degree
    orientation bounds every adjacency array by O(√m) so no explode
    input row is hub-sized. ``adj`` pinned — two join-side consumers
    (same rationale as :func:`_triangle_count`)."""
    adj = pin(e.groupBy(F.col("a").alias("v"))
              .agg(F.collect_list("b").alias("nbrs")))
    na = adj.select(F.col("v").alias("a"), F.col("nbrs").alias("na"))
    nb = adj.select(F.col("v").alias("b"), F.col("nbrs").alias("nb"))
    return (e.join(na, "a").join(nb, "b")
            .select("a", "b",
                    F.explode(F.array_intersect("na", "nb")).alias("c")))


def closure_by_degree(pairs: DataFrame, id_a: str, id_b: str
                      ) -> DataFrame:
    """Closure rate (local clustering) as a function of degree: nodes
    are bucketed by the bit length of their degree (bucket k covers
    degrees [2^(k−1), 2^k)) and each bucket reports
    closure = 2·Σ triangles(v) / Σ deg(v)·(deg(v)−1) — the ratio of
    closed to possible wedges among its nodes. The curve is how one
    reads hierarchical structure (closure falling with degree =
    hub-and-spoke; flat = uniform clustering) — the per-degree
    refinement of :func:`clustering_coefficient`'s single number.

    Per-node triangle counts come from the degree-oriented adjacency
    intersection (:func:`_triangle_vertices`): the triangle list is
    output-sized (orientation bounds the intersect arrays by O(√m)),
    each triangle credits its three vertices via one union + hash-agg,
    and the bucket rollup is integer-exact — the emit is ONE double
    division of exact BIGINTs per bucket, guarded on wedge count > 0.
    Bucketing by ``length(bin(d))`` is pure integer work — no
    float log2 knife edges at the power-of-two boundaries.
    """
    e, deg = _degree_oriented_edges(pairs, id_a, id_b)
    # Round-15 (guide §2.4): each triangle credits its three vertices
    # through ONE explode instead of a three-branch self-union — the
    # triangle list now has a single consumer, so the round-10/11
    # rationale for pinning/cutting it (3 refs re-running the
    # adjacency joins, the analyzed tree repeating the subtree per
    # branch) is gone along with the cut's parquet write of the
    # triangle-cardinality list. Same credits: one v-row per triangle
    # vertex, flowing straight into the hash-agg.
    t = _triangle_vertices(e)
    tv = (t.select(F.explode(F.array("a", "b", "c")).alias("v"))
          .groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("tri")))
    nodes = (deg.join(tv, deg["v"] == tv["v"], "left")
             .select(deg["v"].alias("v"), "d",
                     F.coalesce(F.col("tri"), F.lit(0)).cast("long")
                     .alias("tri")))
    bucket = F.length(F.bin(F.col("d"))).cast("long")
    g = (nodes.groupBy(bucket.alias("degree_bucket"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
              F.sum("tri").cast("long").alias("n_triangles"),
              F.sum(F.col("d") * (F.col("d") - 1)).cast("long")
              .alias("w2")))
    closure = ((F.lit(2) * F.col("n_triangles")).cast("double")
               / F.col("w2").cast("double"))
    return (g.select("degree_bucket", "n_nodes", "n_triangles",
                     F.when(F.col("w2") > 0, closure).alias("closure"))
            .orderBy("degree_bucket"))


def neighbor_degree_curve(pairs: DataFrame, id_a: str, id_b: str
                          ) -> DataFrame:
    """Average neighbor degree as a function of degree — the
    assortativity CURVE (rising = assortative core, falling = hubs
    feeding leaves) behind :func:`degree_assortativity`'s single
    coefficient. Buckets by degree bit length like
    :func:`closure_by_degree`.

    Per bucket: knn(bucket) = Σ_v Σ_{u∼v} deg(u) / Σ_v deg(v) — the
    degree-weighted mean neighbor degree, a ratio of two exact BIGINT
    sums emitted as ONE double division. Each edge credits both
    endpoints via two node-keyed joins on the degree table
    (node-cardinality, broadcast-joinable); nothing wider than the
    edge list shuffles.
    """
    und, deg = _undirected_degrees(pairs, id_a, id_b)
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dxv"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dyv"))
    ed = und.join(dx, "x").join(dy, "y")
    snd = (ed.select(F.col("x").alias("v"), F.col("dyv").alias("nd"))
           .unionByName(ed.select(F.col("y").alias("v"),
                                  F.col("dxv").alias("nd")))
           .groupBy("v").agg(F.sum("nd").cast("long").alias("snd")))
    nodes = deg.join(snd, "v")
    bucket = F.length(F.bin(F.col("d"))).cast("long")
    g = (nodes.groupBy(bucket.alias("degree_bucket"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
              F.sum("d").cast("long").alias("sum_degree"),
              F.sum("snd").cast("long").alias("sum_nbr_degree")))
    knn = F.col("sum_nbr_degree").cast("double") / F.col("sum_degree").cast("double")
    return (g.select("degree_bucket", "n_nodes", "sum_degree",
                     F.when(F.col("sum_degree") > 0, knn)
                     .alias("avg_nbr_degree"))
            .orderBy("degree_bucket"))


def l_diversity_profile(df: DataFrame, qi_cols: Sequence[str],
                        sensitive: Column | str,
                        l_thresh: int = 3) -> DataFrame:
    """l-diversity census — :func:`k_anonymity_profile`'s companion:
    k-anonymity alone leaves a release open to homogeneity attacks (a
    class of 50 rows that all share one sensitive value identifies the
    attribute, not the person), so the second report a privacy review
    asks for is the distribution of DISTINCT sensitive values per
    quasi-identifier class. Classes with l below the threshold are the
    actionable list.

    Pure integer pipeline: one aggregate per QI class (count +
    count-distinct of the sensitive attribute), one census over l; the
    at-risk flag is an integer comparison on the emitted value. Both
    shuffles key on the QI tuple / l — never wider than the
    distinct-class count.
    """
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    classes = (df.groupBy(*qi_cols)
               .agg(F.count(F.lit(1)).cast("long").alias("k"),
                    F.countDistinct(s).cast("long").alias("l")))
    return (classes.groupBy("l")
            .agg(F.count(F.lit(1)).cast("long").alias("n_classes"),
                 F.sum("k").cast("long").alias("n_rows"))
            .select("l", "n_classes", "n_rows",
                    (F.col("l") < l_thresh).alias("at_risk"))
            .orderBy("l"))


def dow_hour_anomalies(events: DataFrame) -> DataFrame:
    """Seasonal-anomaly cells of the (day-of-week × hour) count
    matrix: flag cells whose additive-decomposition residual exceeds
    3× the residual RMS — the composition step on top of
    :func:`dow_hour_decomposition` that turns the decomposition into
    an alert list ("Tuesday 03:00 is busy in a way neither Tuesdays
    nor 03:00 explain").

    Integer-exact throughout: residual = R/168 with
    R = 168·n − 7·rowsum − 24·colsum + total an exact BIGINT, and the
    3σ test |R/168| > 3·RMS(R/168) reduces to the pure integer
    comparison 168·R² > 9·ΣR² (the integer-only variance-test trick —
    no sqrt, no float decides the flag). Headroom: the binding term is
    9·ΣR² (ΣR² can reach 168·R_max²), so 9·168·R² ≤ 2^63 needs
    |R| ≤ ~7.8e7, i.e. cell counts ≲ ~5e5 — beyond that
    (continental-scale streams) Spark ANSI RAISES rather than silently
    wrapping; pre-divide counts by a fixed block factor (the flag is
    scale-invariant) before calling. All windows are over the 168-row
    matrix.
    """
    spark = events.sparkSession
    dom = spark.createDataFrame(
        [(d, h) for d in range(7) for h in range(24)],
        "dow long, hr long")
    cnt = (events.select((F.dayofweek("ts") - 1).cast("long").alias("dow"),
                         F.hour("ts").cast("long").alias("hr"))
           .groupBy("dow", "hr")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    filled = (dom.join(cnt, ["dow", "hr"], "left")
              .select("dow", "hr",
                      F.coalesce(F.col("c"), F.lit(0)).cast("long")
                      .alias("n")))
    rs = F.sum("n").over(Window.partitionBy("dow")).cast("long")
    cs = F.sum("n").over(Window.partitionBy("hr")).cast("long")
    g = F.sum("n").over(Window.partitionBy()).cast("long")
    r = (168 * F.col("n") - 7 * F.col("rs") - 24 * F.col("cs")
         + F.col("g")).cast("long")
    e = (filled.select("dow", "hr", "n", rs.alias("rs"), cs.alias("cs"),
                       g.alias("g"))
         .select("dow", "hr", "n", r.alias("r")))
    ssq = F.sum(F.col("r") * F.col("r")).over(Window.partitionBy()) \
        .cast("long")
    e = e.select("dow", "hr", "n", "r", ssq.alias("ssq"))
    return (e.select("dow", "hr", "n",
                     (F.col("r").cast("double") / 168.0)
                     .alias("residual"),
                     (168 * F.col("r") * F.col("r")
                      > 9 * F.col("ssq")).alias("is_anomaly"))
            .filter(F.col("is_anomaly"))
            .orderBy("dow", "hr"))


def t_closeness_profile(df: DataFrame, qi_cols: Sequence[str],
                        sensitive: Column | str) -> DataFrame:
    """t-closeness census — the third privacy report after
    :func:`k_anonymity_profile` and :func:`l_diversity_profile`:
    l-diversity is still open to similarity attacks (a class whose 3
    distinct salaries are all "high" leaks the attribute), so
    t-closeness bounds, per quasi-identifier class, the Earth Mover's
    Distance between the class's sensitive-value distribution and the
    GLOBAL one. For an ORDERED sensitive attribute over B buckets the
    EMD has the closed form (1/(B−1))·Σ_j |CumP_j − CumQ_j| over the
    B−1 interior prefix sums.

    Exact-integer core: with per-class counts cp over class size m and
    global counts cq over total n, each |CumP − CumQ| term is
    |cp_cum·n − cq_cum·m| / (m·n) — the numerators are exact BIGINTs
    (zero-filled over the shared bucket domain via a broadcast grid,
    the PSI/dow-hour precedent; prefix sums run inside each class's
    bounded window), summed exactly, and t is ONE double division
    t = Σ|…| / (m·n·(B−1)) at emit. Headroom: cp_cum·n ≤ m·n ≤ 2^63
    needs m·n ≲ 9e18 — with B ≲ 100 buckets the term SUM stays within
    int64 for any m·n ≲ 9e16 (rows ≲ 3e8 against a 3e8 table); beyond
    that pre-aggregate the sensitive attribute to coarser buckets.
    Shape: one class×bucket aggregate, one bucket aggregate, a
    |classes × buckets| broadcast-grid join, windows partitioned BY
    CLASS over ≤ B rows — nothing wider than |classes|·B anywhere.
    """
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    # NULL sensitive values are excluded from the census ENTIRELY
    # (class sizes included): a NULL has no position on an ordered
    # bucket axis, and carried through it would vanish from the
    # equi-joined grid while still inflating m — and the two engines
    # order NULL window keys differently (the ks_two_sample rule).
    # The oracle filters identically.
    base = (df.select(*qi_cols, s.cast("long").alias("_b"))
            .filter(F.col("_b").isNotNull()))
    cb = pin(base.groupBy(*qi_cols, "_b")
             .agg(F.count(F.lit(1)).cast("long").alias("cp")))
    classes = (cb.groupBy(*qi_cols)
               .agg(F.sum("cp").cast("long").alias("m")))
    gb = (cb.groupBy("_b").agg(F.sum("cp").cast("long").alias("cq")))
    tot = gb.agg(F.sum("cq").cast("long").alias("n"),
                 F.count(F.lit(1)).cast("long").alias("nb"))
    # zero-filled class × bucket grid (classes and buckets are both
    # aggregate-bounded; the join is a broadcast of the bucket list)
    grid = classes.crossJoin(F.broadcast(gb.select("_b")))
    filled = (grid.join(cb, [*qi_cols, "_b"], "left")
              .select(*qi_cols, "_b",
                      F.coalesce(F.col("cp"), F.lit(0)).alias("cp")))
    w = (Window.partitionBy(*qi_cols).orderBy("_b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (filled.join(F.broadcast(gb), "_b")
           .join(classes, list(qi_cols))
           .crossJoin(F.broadcast(tot))
           .select(*qi_cols, "_b", "m", "n", "nb",
                   F.sum("cp").over(w).alias("cpc"),
                   F.sum("cq").over(
                       Window.partitionBy(*qi_cols).orderBy("_b")
                       .rowsBetween(Window.unboundedPreceding,
                                    Window.currentRow)).alias("cqc")))
    # drop the last (total) prefix — EMD sums the B−1 interior cuts
    wb = Window.partitionBy(*qi_cols).orderBy(F.col("_b").desc())
    interior = (cum.withColumn("_rn", F.row_number().over(wb))
                .filter(F.col("_rn") > 1))
    num = F.abs(F.col("cpc") * F.col("n") - F.col("cqc") * F.col("m"))
    g = (interior.groupBy(*qi_cols, "m", "n", "nb")
         .agg(F.sum(num).cast("long").alias("s")))
    t = F.col("s").cast("double") / (
        F.col("m") * F.col("n") * (F.col("nb") - 1)).cast("double")
    return (g.select(*qi_cols, F.col("m").alias("class_rows"),
                     F.when(F.col("nb") > 1, t).alias("t_emd"))
            .orderBy(*qi_cols))


HITS_SCALE = 1_000_000_000_000  # 1e-12 fixed-point unit for HITS


def hits_bipartite(edges: DataFrame, src: str, dst: str,
                   iters: int = 2, top: int = 20) -> DataFrame:
    """HITS hubs/authorities over a DIRECTED bipartite edge list
    (src → dst; e.g. customer → purchased part), by power iteration in
    EXACT integer arithmetic: authority(d) = Σ hub(s) over in-edges,
    hub(s) = Σ authority(d) over out-edges, each half-step L1-renormalized
    back onto the 1e-12 fixed-point grid with the two-stage integer
    scale s := s div max(total div SCALE, 1) — every operation is
    integer, so the result is bit-identical on any engine and
    partitioning (the pagerank discipline; float HITS drifts with
    reduction order). The renormalizing floor-div leaks < 1 output
    quantum per node per half-step — noise at the 1e-12 grain.

    Note HITS on an UNDIRECTED graph degenerates (hubs ≡ authorities);
    the bipartite purchase graph is the natural directed input and
    gives the two scores their classical meaning (hub = broad buyer,
    authority = widely-bought part).

    Output: (kind, node, score_e12) — top ``top`` authorities and top
    ``top`` hubs, rank-ordered per kind (score desc, node asc).

    Shape at 100 TB: per half-step one keyed join + one groupBy on the
    edge list (the canonical distributed HITS); the edge list is
    pinned once; renormalization totals are 1-row broadcast scalars.
    Overflow headroom: raw scores are ≤ max-degree · SCALE ≲ 1e12·deg
    before renormalization — int64-safe for degrees to ~9e6; the
    renormalized grid resets each half-step, so headroom never
    compounds across iterations.
    """
    if iters < 1:
        raise ValueError("hits_bipartite needs iters >= 1")
    e = pin(edges.select(F.col(src).alias("s"),
                         F.col(dst).alias("d")).distinct())
    hubs0 = e.select("s").distinct()
    n_hubs = hubs0.count()  # one control-plane scalar
    if n_hubs == 0:  # empty graph: empty result, never a ZeroDivision
        return e.select(F.lit("authority").alias("kind"),
                        F.col("d").alias("node"),
                        F.lit(0).cast("long").alias("score_e12"))
    h = hubs0.select(F.col("s").alias("node"),
                     F.lit(HITS_SCALE // n_hubs).cast("long").alias("r"))

    def renorm(scores: DataFrame) -> DataFrame:
        # Leaf-ify each half-step (round 12): each half-step references
        # the previous half-step's WHOLE subtree twice (the renorm
        # total + the scores it scales), so the analyzed tree doubled
        # per half-step — 5,457 nodes / 136 InMemoryRelations / ~15 s
        # warm at sf0.01 by round 11's audit. Round-15: the leaf is an
        # eager localCheckpoint instead of a parquet cut — the frame is
        # a node-cardinality AGGREGATE (tiny), so the row-based
        # checkpoint scan that made checkpoints a loser for
        # edge-cardinality columnar frames (see pin_cut's docstring)
        # costs nothing here, and each half-step saves a parquet
        # write+read round trip (4 write jobs per query at iters=2).
        # Determinism is untouched: the checkpoint freezes exact
        # integer scores.
        scores = pin_checkpoint(scores)
        total = scores.agg(F.sum("r").alias("_t"))
        return (scores.crossJoin(F.broadcast(total))  # 1-row scalar
                .select("node", F.expr(
                    "r div greatest(_t div "
                    f"{HITS_SCALE}L, 1L)").alias("r")))

    a = None
    for _ in range(iters):
        a = renorm(e.join(h.withColumnRenamed("node", "s"), "s")
                   .groupBy(F.col("d").alias("node"))
                   .agg(F.sum("r").cast("long").alias("r")))
        h = renorm(e.join(a.withColumnRenamed("node", "d"), "d")
                   .groupBy(F.col("s").alias("node"))
                   .agg(F.sum("r").cast("long").alias("r")))
    top_a = (a.orderBy(F.desc("r"), "node").limit(top)
             .select(F.lit("authority").alias("kind"), "node",
                     F.col("r").alias("score_e12")))
    top_h = (h.orderBy(F.desc("r"), "node").limit(top)
             .select(F.lit("hub").alias("kind"), "node",
                     F.col("r").alias("score_e12")))
    return (top_a.unionByName(top_h)
            .orderBy("kind", F.desc("score_e12"), "node"))


def label_propagation(pairs: DataFrame, id_a: str, id_b: str,
                      iters: int = 3, top: int = 20) -> DataFrame:
    """Synchronous label propagation (LPA) communities over an
    undirected pair graph, made fully DETERMINISTIC: labels start as
    the node id; each round every node adopts its neighborhood's
    modal label with ties broken by the SMALLEST label (classic LPA
    randomizes both update order and tie-breaks, which no
    hash-compared oracle could verify); a fixed ``iters`` rounds
    bounds the work (the fixed-point discipline of
    :func:`pagerank` / clustering.py's CC).

    Output: the ``top`` largest communities after the final round —
    (label, n_members), size-desc then label-asc.

    Shape at 100 TB: per round one edge⋈label join, one
    (node, label)-keyed count, and one per-node modal pick through a
    window PARTITIONED BY NODE (≤ degree rows per partition — never a
    global sort). Edges are pinned once; label frames are
    node-cardinality.
    """
    _, _, lab = _lpa_core(pairs, id_a, id_b, iters)
    return (lab.groupBy("lab")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
            .orderBy(F.desc("n_members"), "lab").limit(top)
            .select(F.col("lab").alias("label"), "n_members"))


def _lpa_core(pairs: DataFrame, id_a: str, id_b: str,
              iters: int) -> tuple:
    """Shared LPA machinery: returns (und, e, lab) — the distinct
    undirected edge list, its two-way expansion, and the final (node,
    lab) assignment after ``iters`` synchronous rounds. und/e are
    pin_cut (re-referenced per round AND by :func:`lpa_modularity`'s
    intra-edge and degree joins — the pagerank plan-size rationale)."""
    und = pin_cut(_canon_undirected(pairs, id_a, id_b, "x", "y"))
    # both directions from ONE explode — a single scan of the und leaf
    # instead of a two-branch self-union (round-15, guide §2.4)
    e = pin_cut(und.select(F.explode(F.array(
        F.struct(F.col("x").alias("src"), F.col("y").alias("dst")),
        F.struct(F.col("y").alias("src"), F.col("x").alias("dst"))))
        .alias("_ed")).select("_ed.src", "_ed.dst"))
    lab = e.select(F.col("src").alias("node")).distinct() \
           .select("node", F.col("node").alias("lab"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), "lab")
    for _ in range(iters):
        nbr = (e.join(lab.withColumnRenamed("node", "dst"), "dst")
               .groupBy(F.col("src").alias("node"), "lab")
               .agg(F.count(F.lit(1)).alias("cnt")))
        lab = (nbr.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).select("node", "lab"))
    return und, e, lab


def lpa_modularity(pairs: DataFrame, id_a: str, id_b: str,
                   iters: int = 3) -> DataFrame:
    """Newman modularity of the LPA partition — the one-number "did
    label propagation find real structure" check (Q ≈ 0: no better
    than random; Q ≳ 0.3: strong communities) that turns
    :func:`label_propagation`'s census into a quality score.

    Exact-integer form: with m undirected edges, e_c intra-community
    edges and d_c the community degree sum, Q = Σ_c (e_c/m −
    (d_c/2m)²) is computed as the integer numerator
    ``Σ_c (4·m·e_c − d_c²)`` over the integer denominator ``4·m²`` —
    ONE double division at emit, bit-identical on any engine.
    Headroom: 4·m·e_c ≤ 4m² — int64-safe to m ≈ 1.5e9 edges; beyond
    that, divide both legs by a common block factor (Q is
    scale-free). Output: one row (n_nodes, m_edges, n_communities,
    modularity).

    Shape at 100 TB: LPA's per-round join/agg plus three label joins
    (two intra-edge sides, one degree rollup) — all equi-keyed on the
    cut label/edge tables; the per-community term table is
    |communities| rows and the final rollup is a 1-row aggregate.
    """
    und, e, lab = _lpa_core(pairs, id_a, id_b, iters)
    lab = pin_cut(lab)  # three downstream references below
    m1 = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dc = (deg.join(lab.withColumnRenamed("node", "src"), "src")
          .groupBy("lab").agg(F.sum("d").cast("long").alias("dc")))
    lx = lab.select(F.col("node").alias("x"), F.col("lab").alias("lx"))
    ly = lab.select(F.col("node").alias("y"), F.col("lab").alias("ly"))
    ec = (und.join(lx, "x").join(ly, "y")
          .filter(F.col("lx") == F.col("ly"))
          .groupBy(F.col("lx").alias("lab"))
          .agg(F.count(F.lit(1)).cast("long").alias("ec")))
    t = (dc.join(ec, "lab", "left")
         .crossJoin(F.broadcast(m1))  # 1-row scalar
         .select("lab", (4 * F.col("m") * F.coalesce(F.col("ec"), F.lit(0))
                         - F.col("dc") * F.col("dc")).alias("t4m2")))
    n_nodes = lab.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (t.agg(F.count(F.lit(1)).cast("long").alias("n_communities"),
                  F.sum("t4m2").cast("long").alias("num"))
            .crossJoin(F.broadcast(m1))
            .crossJoin(F.broadcast(n_nodes))
            .select("n_nodes", F.col("m").alias("m_edges"),
                    "n_communities",
                    (F.col("num").cast("double")
                     / (4.0 * F.col("m").cast("double")
                        * F.col("m").cast("double"))).alias("modularity")))


HILL_LN_GRID = 1_000_000_000  # 1e-9 grid for per-degree ln terms


def powerlaw_alpha(pairs: DataFrame, id_a: str, id_b: str,
                   d_min: int = 2) -> DataFrame:
    """Hill MLE of the degree-distribution power-law exponent over an
    undirected pair graph: α = 1 + n_tail / Σ ln(d_i / d_min) over
    nodes with degree ≥ ``d_min`` — the one-number heavy-tail
    diagnostic behind every "is this graph scale-free" claim, and the
    quantitative companion of :func:`rich_club` /
    :func:`degree_assortativity`.

    Exactness: degrees are integers and REPEAT, so the sum runs over
    the degree HISTOGRAM, not the node list: per distinct degree d the
    term is cnt(d) · round(ln(d / d_min) · 1e9) — ln of a ratio of two
    small integers never lands on the 1e-9 grid boundary (the
    perplexity precedent) and the identical scalar is computed in both
    engines; the weighted sum is an exact BIGINT; α is ONE double
    division 1 + n_tail·1e9 / Σ at emit. NULL when the tail is all at
    d_min (Σ = 0 — the MLE is undefined). Headroom: terms ≤
    cnt·ln(dmax)·1e9 ≲ n·3e10 — int64-safe to ~3e8 tail nodes.

    Shape: degree histogram (distinct-degree cardinality) on top of
    the pinned :func:`_undirected_degrees`; one 1-row aggregate.
    """
    _, deg = _undirected_degrees(pairs, id_a, id_b)
    hist = (deg.groupBy("d")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    term = F.col("cnt") * F.round(
        F.log(F.col("d").cast("double") / F.lit(float(d_min)))
        * HILL_LN_GRID, 0).cast("long")
    g = hist.agg(
        F.sum("cnt").cast("long").alias("n_nodes"),
        F.sum(F.when(F.col("d") >= d_min, F.col("cnt")).otherwise(0))
        .cast("long").alias("n_tail"),
        F.sum(F.when(F.col("d") >= d_min, term).otherwise(0))
        .cast("long").alias("s"))
    alpha = F.when(F.col("s") > 0,
                   1.0 + F.col("n_tail").cast("double") * HILL_LN_GRID
                   / F.col("s").cast("double"))
    return g.select(F.lit(d_min).cast("long").alias("d_min"),
                    "n_nodes", "n_tail", alpha.alias("alpha"))


def session_entropy_profile(events: DataFrame, gap_seconds: int = 1800
                            ) -> DataFrame:
    """Event-type entropy per gap-based session, rolled up by session
    size class — "do longer sessions diversify or loop?" (a
    behavioral-health profile; degenerate low-entropy long sessions
    flag bots and scraper loops). Sessions are the standard lag +
    running-sum-of-breaks construction (streaming/events.sessionize);
    entropy is the exact-grid Shannon form of corpus.bigram_entropy:
    H = ln(n) − (Σ round(c·ln c · 1e6)) / 1e6 / n per session, with the
    per-session H re-quantized to a 1e-6 BIGINT so the per-class MEAN
    is a ratio of exact integers (a float sum over sessions would be
    association-dependent across partitions).

    Output: (size_class, n_sessions, mean_entropy), class-ordered.
    All windows are (user)-partitioned; the rollup keys on the
    five-bucket size class.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    tagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_seconds), 1)
        .otherwise(0))
    s = tagged.withColumn("sid", F.sum("_new").over(run))
    cnt = (s.groupBy("user_id", "sid", "event_type")
           .agg(F.count(F.lit(1)).alias("c")))
    term = F.round(F.col("c") * F.log("c") * 1e6, 0).cast("long")
    per = (cnt.groupBy("user_id", "sid")
           .agg(F.sum("c").cast("long").alias("n"),
                F.sum(term).cast("long").alias("t")))
    h_q = F.round((F.log(F.col("n").cast("double"))
                   - (F.col("t") / 1e6) / F.col("n")) * 1e6, 0) \
        .cast("long")
    size_class = (F.when(F.col("n") == 1, "1")
                  .when(F.col("n") == 2, "2")
                  .when(F.col("n") <= 5, "3-5")
                  .when(F.col("n") <= 10, "6-10")
                  .otherwise("11+"))
    g = (per.select(size_class.alias("size_class"), h_q.alias("hq"))
         .groupBy("size_class")
         .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
              F.sum("hq").cast("long").alias("sh")))
    mean = F.col("sh").cast("double") / F.col("n_sessions").cast("double") / 1e6
    # order by the class LOWER BOUND, not the label string — lexical
    # order would emit 1, 11+, 2, 3-5, 6-10 (round-11 advisory)
    class_rank = (F.when(F.col("size_class") == "1", 1)
                  .when(F.col("size_class") == "2", 2)
                  .when(F.col("size_class") == "3-5", 3)
                  .when(F.col("size_class") == "6-10", 4)
                  .otherwise(5))
    return (g.select("size_class", "n_sessions",
                     F.round(mean, 6).alias("mean_entropy"))
            .orderBy(class_rank))


def generalization_ladder(df: DataFrame,
                          levels: Sequence[tuple[str, Sequence[str]]],
                          k_thresh: int = 5) -> DataFrame:
    """k-anonymity across a QI GENERALIZATION ladder: for each
    progressively coarser quasi-identifier set, the class count,
    minimum class size, and rows below the re-identification threshold
    — the utility-vs-privacy trade-off table a release review reads to
    pick the coarsest level that still clears policy
    (:func:`k_anonymity_profile` run once per rung, plus the corpus
    pct at risk).

    ``levels`` is [(level_name, qi_cols)], finest first. Pure integer
    pipeline per rung (one QI aggregate + one census aggregate);
    at_risk_pct is ONE double division of exact counts at emit. Each
    rung shuffles on its own QI tuple — never wider than the
    distinct-class count; rung outputs are 1-row, unioned.
    """
    parts: list[DataFrame] = []
    for name, qi in levels:
        classes = (df.groupBy(*qi)
                   .agg(F.count(F.lit(1)).cast("long").alias("k")))
        parts.append(classes.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("k").cast("long").alias("min_k"),
            F.sum(F.when(F.col("k") < k_thresh, F.col("k"))
                  .otherwise(0)).cast("long").alias("rows_at_risk"),
            F.sum("k").cast("long").alias("n_rows")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    pct = F.when(F.col("n_rows") > 0,
                 F.round(100.0 * F.col("rows_at_risk")
                         / F.col("n_rows"), 6))
    return (out.select("level", "n_classes", "min_k", "rows_at_risk",
                       pct.alias("at_risk_pct"))
            .orderBy("level"))


def ktruss_peel_census(pairs: DataFrame, id_a: str, id_b: str,
                       k: int = 4, iters: int = 2) -> DataFrame:
    """k-truss peeling census: per fixed peel iteration, how many edges
    survive the "every edge sits in ≥ k−2 triangles" rule and how many
    triangles the surviving graph has — the cohesion ladder above the
    plain triangle census (a 4-truss is the classic community-core
    extractor). Convergence needs data-dependent rounds; this reports
    a FIXED ``iters`` peels (the pagerank/LPA bounded-iteration
    discipline) which is itself the standard scalable approximation.

    Per round: per-edge triangle support from the degree-oriented
    adjacency intersection (:func:`_triangle_vertices` on the current
    edge set — output-sized, hub-proof via the O(√m) orientation
    bound), each triangle credited to its three edges through one
    union + hash-agg on canonical (least, greatest) edge keys, then
    one anti-filter support < k−2. Every round's edge set is
    ``pin_cut`` (multiply referenced AND feeding the next round's
    nested machinery — the plan-tree bound). Output: one row per
    iteration 0..iters — (iter, n_edges, n_triangles).
    """
    und = pin_cut(_canon_undirected(pairs, id_a, id_b, "x", "y"))

    def oriented(u: DataFrame) -> DataFrame:
        # degrees recomputed against the CURRENT survivors, then the
        # family's shared orientation rule (one definition)
        deg = (u.select(F.col("x").alias("v"))
               .unionByName(u.select(F.col("y").alias("v")))
               .groupBy("v").agg(F.count(F.lit(1)).cast("long")
                                 .alias("d")))
        return _orient_by_degree(u, deg)

    def census_row(it: int, u: DataFrame, tri: DataFrame) -> DataFrame:
        return (u.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
                .crossJoin(F.broadcast(  # 1-row scalar join
                    tri.agg(F.count(F.lit(1)).cast("long")
                            .alias("n_triangles"))))
                .select(F.lit(it).cast("long").alias("iter"),
                        "n_edges", "n_triangles"))

    rows: list[DataFrame] = []
    cur = und
    for it in range(iters + 1):
        tri = pin_cut(_triangle_vertices(oriented(cur)))
        rows.append(census_row(it, cur, tri))
        if it == iters:
            break
        # support per canonical undirected edge: each triangle credits
        # its three edges
        e1 = tri.select(F.least("a", "b").alias("x"),
                        F.greatest("a", "b").alias("y"))
        e2 = tri.select(F.least("a", "c").alias("x"),
                        F.greatest("a", "c").alias("y"))
        e3 = tri.select(F.least("b", "c").alias("x"),
                        F.greatest("b", "c").alias("y"))
        support = (e1.unionByName(e2).unionByName(e3)
                   .groupBy("x", "y")
                   .agg(F.count(F.lit(1)).cast("long").alias("sup")))
        cur = pin_cut(cur.join(support, ["x", "y"], "left")
                      .filter(F.coalesce(F.col("sup"), F.lit(0))
                              >= k - 2)
                      .select("x", "y"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("iter")


MARKOV_SCALE = 1_000_000_000_000  # 1e-12 fixed-point unit for π


def markov_steady_state(events: DataFrame, iters: int = 3) -> DataFrame:
    """Steady-state distribution of the event-type transition chain by
    fixed power iteration in EXACT integer arithmetic — "where does a
    user's attention settle": the fixed-point companion of
    events_markov_transitions' one-step matrix (and the chain analogue
    of :func:`pagerank`, which this follows operation-for-operation).

    Transitions are consecutive same-user events on the (ts, event_id)
    total order; each iteration pushes π_i · c_ij div rowsum_i along
    the (tiny, |states|²) transition matrix and re-sums per target.
    Floor division leaks < |states| quanta per row per round at the
    1e-12 grain — determinism over the last ulp, the pagerank rule.
    States with no INCOMING transition would vanish from a pure
    contribution sum; a left join from the state list zero-fills them
    per round so the relation keeps one row per state.

    Headroom: π ≤ 1e12 and c_ij ≤ total transitions T, so π·c needs
    T ≲ 9e6 per int64 — pre-divide the counts matrix by a fixed block
    factor beyond that (π is scale-free in c row-proportions).
    Shape: one user-keyed lag window + one (i, j) aggregate build the
    matrix ONCE (pinned); each iteration is a broadcast-sized join on
    the |states|-row π relation.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (events.select("user_id", "ts", "event_id",
                       F.col("event_type").alias("j"))
         .withColumn("i", F.lag("j").over(w))
         .filter(F.col("i").isNotNull()))
    c = pin(t.groupBy("i", "j")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    rowsum = c.groupBy("i").agg(F.sum("c").cast("long").alias("rs"))
    # pin_cut (round 12): m and states are re-referenced every
    # iteration and each embeds c twice/four times, so the analyzed
    # tree reached 5,815 nodes by round 11's audit; cutting them (and
    # each round's |states|-row pi below) bounds the tree at one
    # iteration's worth of nodes over parquet leaves.
    m = pin_cut(c.join(rowsum, "i"))
    states = pin_cut(m.select(F.col("i").alias("s"))
                     .unionByName(m.select(F.col("j").alias("s")))
                     .distinct())
    n_states = states.count()  # one control-plane scalar
    if n_states == 0:  # no same-user transition anywhere: empty result
        return m.select(F.col("j").alias("event_type"),
                        F.lit(0).cast("long").alias("pi_e12"))
    pi = states.select(F.col("s").alias("node"),
                       F.lit(MARKOV_SCALE // n_states).cast("long")
                       .alias("r"))
    for _ in range(iters):
        contrib = (m.join(pi.withColumnRenamed("node", "i"), "i")
                   .select(F.col("j").alias("node"),
                           F.expr("(r * c) div rs").alias("x")))
        agg = contrib.groupBy("node").agg(F.sum("x").cast("long")
                                          .alias("r"))
        pi = pin_cut(
            states.join(agg, states["s"] == agg["node"], "left")
            .select(states["s"].alias("node"),
                    F.coalesce(F.col("r"), F.lit(0)).cast("long")
                    .alias("r")))
    return (pi.select(F.col("node").alias("event_type"),
                      F.col("r").alias("pi_e12"))
            .orderBy("event_type"))


def poisson_overdispersion(events: DataFrame) -> DataFrame:
    """Index-of-dispersion audit of hourly arrival counts per event
    type: D = var/mean over the DENSE hour grid (empty hours count as
    zeros — dropping them is how dispersion checks silently lie). A
    Poisson process has D = 1; D ≫ 1 (overdispersion) means bursty
    arrivals and every Poisson-assuming alert threshold downstream is
    mis-calibrated — the arrival-process companion of
    :func:`dow_hour_anomalies`.

    The hour grid is generated from the GLOBAL min/max hour (one 1-row
    scalar broadcast, a sequence-explode — the timeline is
    audit-bounded: 30 days = 720 rows) crossed with the event types;
    counts zero-fill by left join. Everything else is exact BIGINT
    power sums: with n grid hours, S = Σc and Q = Σc², the sample
    index of dispersion D = var/mean = (n·Q − S²) / ((n−1)·S) is ONE
    double division of exact integers, and the conventional D > 1.5
    investigate flag is the pure-integer comparison
    2·(n·Q − S²) > 3·(n−1)·S. Headroom: n·Q ≤ n²·c_max² — int64-safe
    to ~3e6 events/hour over a month; pre-aggregate to coarser bins
    beyond. NULL D on an empty type (S = 0).
    """
    hr = F.date_trunc("hour", F.col("ts"))
    bounds = events.agg(F.min(hr).alias("_mn"), F.max(hr).alias("_mx"))
    hours = (bounds.select(F.explode(F.sequence(
        F.col("_mn"), F.col("_mx"), F.expr("INTERVAL 1 HOUR")))
        .alias("hr")))
    types = events.select(F.col("event_type").alias("et")).distinct()
    grid = types.crossJoin(F.broadcast(hours))
    cnt = (events.groupBy(F.col("event_type").alias("et"),
                          hr.alias("hr"))
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    filled = (grid.join(cnt, ["et", "hr"], "left")
              .select("et", F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    g = (filled.groupBy("et")
         .agg(F.count(F.lit(1)).cast("long").alias("n_hours"),
              F.sum("c").cast("long").alias("s"),
              F.sum(F.col("c") * F.col("c")).cast("long").alias("q")))
    varnum = F.col("n_hours") * F.col("q") - F.col("s") * F.col("s")
    d = F.when((F.col("s") > 0) & (F.col("n_hours") > 1),
               varnum.cast("double")
               / ((F.col("n_hours") - 1) * F.col("s")).cast("double"))
    flag = (F.lit(2) * varnum) > (F.lit(3) * (F.col("n_hours") - 1)
                                  * F.col("s"))
    return (g.select(F.col("et").alias("event_type"), "n_hours",
                     F.col("s").alias("n_events"),
                     d.alias("dispersion"),
                     F.when((F.col("s") > 0) & (F.col("n_hours") > 1),
                            flag).alias("overdispersed"))
            .orderBy("event_type"))


ACF_MAX_LAG = 24  # hourly-count autocorrelation horizon


def hourly_count_acf(events: DataFrame,
                     max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """Autocorrelation function of the GLOBAL hourly event-count
    series at lags 1..``max_lag`` — the load-seasonality diagnostic
    behind capacity planning and anomaly-detector calibration (a
    24-hour cycle shows as a peak at lag 24; the arrival-process
    companion of :func:`poisson_overdispersion`, which audits the
    same series' dispersion).

    The series is the DENSE hour grid (empty hours are zeros —
    dropping them would fabricate correlation). Each lag's r is the
    sample correlation of the (c_t, c_{t−k}) overlap, computed from
    exact BIGINT power sums (n, Σx, Σy, Σx², Σy², Σxy — the
    rolling_corr discipline) with ONE double expression at emit.
    Headroom: n·Σxy ≤ n²·c_max² — int64-safe to ~4e6 events/hour over
    a month of hours; pre-scale counts beyond. NULL r when either
    side is constant (zero variance).

    Shape at 100 TB: one hash-agg to hourly counts (grid-bounded:
    |hours| rows), a ≤ max_lag-fan-out self-equi-join on the hour
    index, one lag-keyed rollup — never touches row-level data twice.
    """
    hr = F.date_trunc("hour", F.col("ts"))
    counts = (events.select(hr.alias("hr"))
              .groupBy("hr").agg(F.count(F.lit(1)).alias("c")))
    bounds = counts.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    grid = bounds.select(F.explode(F.sequence(
        F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))).alias("hr"))
    # floor(x/3600), not cast-truncate (round-12 advice, refined by the
    # round-13 review): date_trunc-aligned hours make the division
    # EXACT, which is the actual parity invariant — DuckDB's `//`
    # TRUNCATES toward zero (verified live: -4500 // 3600 = -1), so
    # neither floor nor truncate can diverge here only because the
    # dividend is always a 3600 multiple. floor() is the defensive
    # choice should the alignment ever change; an oracle that applies
    # `//` to a SIGNED NON-ALIGNED dividend is still a parity bug.
    dense = pin_cut(grid.join(counts, "hr", "left")
                    .select(F.floor(F.unix_timestamp("hr") / 3600)
                            .cast("long").alias("t"),
                            F.coalesce(F.col("c"), F.lit(0))
                            .cast("long").alias("c")))
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    cur = dense.select(F.col("t"), F.col("c").alias("x")) \
               .select("*", lags)
    prev = dense.select((F.col("t")).alias("tp"), F.col("c").alias("y"))
    j = cur.join(prev, cur["t"] - cur["lag"] == prev["tp"])
    g = (j.groupBy("lag")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
              F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return (g.select(F.col("lag").cast("long").alias("lag"), "n",
                     F.when((vx > 0) & (vy > 0),
                            num / F.sqrt(vx * vy)).alias("acf"))
            .orderBy("lag"))


def interarrival_burstiness(events: DataFrame) -> DataFrame:
    """Goh–Barabási burstiness of per-type inter-arrival times:
    B = (σ − μ)/(σ + μ) over the gaps between consecutive same-type
    events — B → −1 periodic, B ≈ 0 Poisson, B → 1 maximally bursty.
    The inter-arrival-domain twin of :func:`poisson_overdispersion`
    (which audits the same process in the count domain): together
    they separate "bursty arrivals" from "heavy-tailed gaps".

    Gaps are exact integer SECONDS (epoch diffs on the (ts, event_id)
    total order); n, Σd, Σd² are exact BIGINTs; μ, σ and B are ONE
    double expression of the three leaf-cast sums with identical
    association both engines. Headroom: Σd² ≤ d_max·Σd ≤ span² —
    int64-safe to a ~95-year span at 1-second grain. NULL B with < 2
    gaps or σ + μ = 0.

    Shape at 100 TB: one type-partitioned lag window + one hash-agg —
    the per-type series never leaves its partition.
    """
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long"))
    g = (events.select("event_type", d.alias("d"))
         .filter(F.col("d").isNotNull())
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("d").cast("long").alias("s"),
              F.sum(F.col("d") * F.col("d")).cast("long").alias("q")))
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    q = F.col("q").cast("double")
    mean = s / n
    var = (n * q - s * s) / (n * (n - 1.0))
    sd = F.sqrt(F.when(var > 0, var).otherwise(F.lit(0.0)))
    b = F.when((F.col("n") >= 2) & (sd + mean > 0),
               (sd - mean) / (sd + mean))
    return (g.select("event_type", "n",
                     mean.alias("mean_gap_s"), b.alias("burstiness"))
            .orderBy("event_type"))


SPRT_LLR_GRID = 1_000_000_000  # 1e-9 grid for per-day LLR terms
SPRT_ALPHA_BOUND = 19.0        # Wald A = (1-β)/α at α = β = 0.05
SPRT_LIFT = 1.5                # H1 conversion lift over pooled H0


def sprt_conversion_trace(events: DataFrame,
                          target_type: str = "purchase",
                          lift: float = SPRT_LIFT) -> DataFrame:
    """Wald sequential probability ratio test trace per arm (weekend
    vs weekday, the ks_weekend split): day-by-day cumulative
    log-likelihood ratio of H1 (conversion = ``lift``·pooled rate)
    against H0 (pooled rate), with the classic ±ln 19 bounds
    (α = β = 0.05) — the "could we have stopped early" audit every
    always-on experimentation stack runs beside its fixed-horizon
    tests (CUPED/DiD cousins in this module).

    Determinism: p₀ is the pooled conversion share (one double
    division of exact counts), p₁ = min(lift·p₀, 0.999); each day's
    LLR increment k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)) is quantized
    to the 1e-9 integer grid (the perplexity/Hill-MLE precedent for
    shared transcendentals), so the cumulative trace is an exact
    BIGINT running sum and the boundary crossings are integer
    comparisons. Output per arm: days observed, final LLR (1e-9
    units), the first crossing day (NULL if censored) and the
    decision at that day.

    Shape at 100 TB: one day-grain hash-agg, a 1-row pooled-rate
    broadcast, one arm-partitioned running-sum window over ≤ |days|
    rows per arm.
    """
    day = F.date_trunc("day", F.col("ts"))
    arm = F.when(F.dayofweek("ts").isin(1, 7), "weekend") \
        .otherwise("weekday")
    daily = (events.select(day.alias("day"), arm.alias("arm"),
                           (F.col("event_type") == target_type)
                           .cast("long").alias("is_conv"))
             .groupBy("arm", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("is_conv").cast("long").alias("k")))
    pooled = daily.agg(
        (F.sum("k").cast("double") / F.sum("n").cast("double"))
        .alias("p0"))
    p0 = F.col("p0")
    p1 = F.least(p0 * lift, F.lit(0.999))
    term = (F.col("k") * F.log(p1 / p0)
            + (F.col("n") - F.col("k")) * F.log((1.0 - p1) / (1.0 - p0)))
    q = (daily.crossJoin(F.broadcast(pooled))  # 1-row scalar
         .select("arm", "day", "n", "k",
                 F.round(term * SPRT_LLR_GRID, 0).cast("long")
                 .alias("t9")))
    w = (Window.partitionBy("arm").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    bound9 = int(round(math.log(SPRT_ALPHA_BOUND) * SPRT_LLR_GRID))
    cum = q.select("arm", "day", F.sum("t9").over(w).alias("llr9"))
    crossed = cum.filter((F.col("llr9") >= bound9)
                         | (F.col("llr9") <= -bound9))
    w_first = Window.partitionBy("arm").orderBy("day")
    first = (crossed.withColumn("_rn", F.row_number().over(w_first))
             .filter(F.col("_rn") == 1)
             # DATE, not the day-truncated timestamp: DuckDB's
             # date_trunc('day') yields DATE, Spark's a timestamp
             .select("arm", F.col("day").cast("date")
                     .alias("crossing_day"),
                     F.when(F.col("llr9") >= bound9, "accept_h1")
                     .otherwise("accept_h0").alias("decision")))
    w_last = Window.partitionBy("arm").orderBy(F.col("day").desc())
    final = (cum.withColumn("_rn", F.row_number().over(w_last))
             .filter(F.col("_rn") == 1)
             .select("arm", F.col("llr9").alias("final_llr9")))
    days = cum.groupBy("arm").agg(F.count(F.lit(1)).cast("long")
                                  .alias("n_days"))
    return (days.join(final, "arm")
            .join(first, "arm", "left")
            .select("arm", "n_days", "final_llr9",
                    "crossing_day",
                    F.coalesce(F.col("decision"), F.lit("censored"))
                    .alias("decision"))
            .orderBy("arm"))


IPS_GRID = 1_000_000  # 1e-6 grid for per-event weighted contributions


def ips_uniform_policy_value(events: DataFrame) -> DataFrame:
    """Inverse-propensity-scoring estimate of the average event value
    under a UNIFORM exploration policy over event types, from logs
    whose empirical policy is the per-hour-of-day type distribution —
    the off-policy evaluation primitive behind training-data reweighting
    and logged-bandit audits (would a uniform collector have seen the
    same value?). Reports IPS and the self-normalized SNIPS variant
    (SNIPS divides by Σw instead of N — lower variance, small bias).

    Determinism: the logged propensity of event i is the exact
    rational c(type, hour)/n(hour); the importance weight w =
    n_hour/(K·c_th) and the contribution value·w are each quantized to
    the 1e-6 integer grid per event (value is a 2-dp decimal, the
    weight a ratio of exact integers), summed exactly, divided ONCE at
    emit. Headroom: w ≤ n_hour — contributions ≤ 1e6·v·n_hour;
    int64-safe to ~1e7 events/hour at typical values.

    Shape at 100 TB: one (type, hour) hash-agg joined back on its own
    group keys (broadcast-sized: |types|·24 rows), then one global
    rollup — two shuffles total.
    """
    hod = F.hour("ts").alias("hod")
    base = events.select("event_type", hod, F.col("value"))
    cth = (base.groupBy("event_type", "hod")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    nh = (base.groupBy("hod")
          .agg(F.count(F.lit(1)).cast("long").alias("nh")))
    k = base.agg(F.countDistinct("event_type").cast("long").alias("k"))
    j = (base.join(F.broadcast(cth), ["event_type", "hod"])
         .join(F.broadcast(nh), "hod")
         .crossJoin(F.broadcast(k)))  # 1-row scalar
    w = F.col("nh").cast("double") / (F.col("k") * F.col("c"))
    contrib6 = F.round(F.col("value") * w * IPS_GRID, 0).cast("long")
    w6 = F.round(w * IPS_GRID, 0).cast("long")
    g = j.agg(F.count(F.lit(1)).cast("long").alias("n_events"),
              F.max("k").alias("n_types"),
              F.sum(contrib6).cast("long").alias("sc6"),
              F.sum(w6).cast("long").alias("sw6"))
    return g.select(
        "n_events", "n_types",
        (F.col("sc6").cast("double")
         / (F.col("n_events").cast("double") * IPS_GRID))
        .alias("ips_value"),
        F.when(F.col("sw6") > 0,
               F.col("sc6").cast("double") / F.col("sw6").cast("double"))
        .alias("snips_value"))


EIG_SCALE = 1_000_000  # 1e-6 fixed grid for eigencentrality scores


def eigenvector_centrality(pairs: DataFrame, id_a: str, id_b: str,
                           iters: int = 3, top: int = 20) -> DataFrame:
    """Eigenvector centrality over an undirected pair graph by power
    iteration in EXACT integer arithmetic: x ← A·x, renormalized each
    round to the INFINITY norm on the 1e-6 grid (x ← (1e6·x) div
    max x) — an integer max is exact and order-independent where an
    L2 norm would be an order-dependent float sum. Completes the
    centrality family: degree (local), PageRank (random-walk with
    damping), HITS (bipartite), this (pure spectral influence — a
    node is central when its NEIGHBORS are central, undamped).

    Floor division leaks < 1 grid quantum per node per round — the
    pagerank determinism rule. Headroom: y = Σ_nbr x ≤ deg·1e6 and
    the renorm multiplies by 1e6 before dividing, so deg ≲ 9e6 is
    int64-safe; beyond that, renormalize with a coarser grid.
    Output: top ``top`` nodes, (node, score_e6), score desc / node
    asc — score 1e6 marks the arg-max node(s).

    Shape at 100 TB: per round one edge⋈score join + one node rollup
    + a 1-row max broadcast — the canonical distributed power
    iteration; edges and per-round scores are pin_cut (the HITS
    plan-size rationale).
    """
    if iters < 1:
        raise ValueError("eigenvector_centrality needs iters >= 1")
    und = _canon_undirected(pairs, id_a, id_b)
    # both directions from ONE explode, so the expensive canon subtree
    # (pair self-join + distinct) is evaluated once, not twice, inside
    # the single cut-write job (round-15; the pagerank r14 pattern)
    e = pin_cut(und.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))))
        .alias("_ed")).select("_ed.src", "_ed.dst"))
    x = e.select(F.col("src").alias("node")).distinct() \
         .select("node", F.lit(EIG_SCALE).cast("long").alias("r"))
    for _ in range(iters):
        y = pin_cut(e.join(x.withColumnRenamed("node", "src"), "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("r").cast("long").alias("r")))
        m = y.agg(F.max("r").alias("_m"))
        x = (y.crossJoin(F.broadcast(m))  # 1-row scalar
             .select("node", F.expr(
                 f"({EIG_SCALE}L * r) div greatest(_m, 1L)")
                 .cast("long").alias("r")))
    return (x.orderBy(F.desc("r"), "node").limit(top)
            .select("node", F.col("r").alias("score_e6")))


def new_user_share(events: DataFrame) -> DataFrame:
    """Per-day share of events produced by users whose FIRST-EVER
    event falls on that day — the acquisition-mix drift monitor (a
    rising new-user share silently shifts every engagement metric;
    cohort dashboards assume it is stable). The event-level companion
    of the weekly retention cohorts.

    Exact: a user's first day is min(ts, event_id) on the total
    order reduced to the day grain (min over exact timestamps); per
    day, n_events and n_new_user_events are exact counts and the
    share is ONE double division. Output: (day DATE, n_events,
    n_new_user_events, new_share), day-ordered.

    Shape at 100 TB: one per-user min agg (user-keyed), one broadcast-
    or shuffle-join back on user, one day rollup.
    """
    day = F.to_date(F.col("ts"))
    first = (events.groupBy("user_id")
             .agg(F.min(day).alias("first_day")))
    j = (events.select("user_id", day.alias("day"))
         .join(first, "user_id"))
    return (j.groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum((F.col("day") == F.col("first_day"))
                       .cast("long")).cast("long")
                 .alias("n_new_user_events"))
            .select("day", "n_events", "n_new_user_events",
                    (F.col("n_new_user_events").cast("double")
                     / F.col("n_events").cast("double"))
                    .alias("new_share"))
            .orderBy("day"))


def new_user_share_from_counts(counts: DataFrame) -> DataFrame:
    """Tail of :func:`new_user_share` over a pre-aggregated
    (user_id, day, n) relation — split out so the streaming twin
    (streaming/events.streaming_user_day_counts) drains its
    user-day aggregate through the IDENTICAL first-day/share
    arithmetic. Every count is exact; the share is one division.

    first_day via a user-partitioned window, NOT a self-join: a
    self-join of a memory-sink view trips Spark's conflicting-
    reference resolution (INTERNAL_ERROR), and the window is the
    better plan anyway (one shuffle on user_id, no second scan)."""
    w = Window.partitionBy("user_id")
    j = counts.withColumn("first_day", F.min("day").over(w))
    return (j.groupBy("day")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.sum(F.when(F.col("day") == F.col("first_day"),
                              F.col("n")).otherwise(0)).cast("long")
                 .alias("n_new_user_events"))
            .select("day", "n_events", "n_new_user_events",
                    (F.col("n_new_user_events").cast("double")
                     / F.col("n_events").cast("double"))
                    .alias("new_share"))
            .orderBy("day"))


def hour_of_day_entropy(events: DataFrame) -> DataFrame:
    """Shannon entropy of each event type's hour-of-day distribution
    (0..23) — "is this activity spread around the clock or
    concentrated": H = ln 24 marks perfectly uniform usage, H → 0 a
    single-hour spike (bots, batch jobs, one-timezone products). The
    clock-position companion of :func:`poisson_overdispersion`
    (dispersion) and :func:`hourly_count_acf` (periodicity).

    The exact-grid Shannon form shared with session_entropy_profile:
    H = ln n − (Σ round(c·ln c · 1e6)) / 1e6 / n over the 24 hour
    bins — integer summands, one double expression at emit. Output:
    (event_type, n_events, n_hours_active, entropy).
    """
    g = (events.select("event_type", F.hour("ts").alias("hod"))
         .groupBy("event_type", "hod")
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    term = F.round(F.col("c") * F.log("c") * 1e6, 0).cast("long")
    a = (g.groupBy("event_type")
         .agg(F.sum("c").cast("long").alias("n"),
              F.count(F.lit(1)).cast("long").alias("n_hours_active"),
              F.sum(term).cast("long").alias("t")))
    h = (F.log(F.col("n").cast("double"))
         - (F.col("t").cast("double") / 1e6) / F.col("n").cast("double"))
    return (a.select("event_type", F.col("n").alias("n_events"),
                     "n_hours_active", h.alias("entropy"))
            .orderBy("event_type"))
