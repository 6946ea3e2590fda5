"""Iterative operators: near-dup clustering + k-means-lite centroids.

Genuinely iterative algorithms (the class the SQL oracle can't express —
the driver records rows-only checks for these):

- ``cluster_near_dups``: connected components over the near-dup pair
  graph via iterative DataFrame min-label propagation (join edges to the
  current labels, take the neighborhood min, repeat to fixpoint). The
  edge set never leaves the executors — a billion-edge verified-pair
  graph (plausible at 100 TB corpus scale) propagates in O(diameter)
  shuffles, each a plain join+groupBy. Lineage is truncated per round
  with localCheckpoint so the plan stays bounded.
- ``kmeans_lite``: Lloyd's iterations over an embedding column with
  deterministic seeding (every ``seed_stride``-th vector). Assignment is
  the broadcast cross-join argmax from operators/similarity; the update
  step is a groupBy mean — both stock DataFrame ops, iterated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from .similarity import assign_centroids


def cluster_near_dups(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b",
                      max_iterations: int = 50) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in a near-dup pair;
    cluster_id = the smallest doc id in its connected component.

    Iterative min-label propagation + pointer jumping, fully distributed:
    each round every vertex takes min(own label, neighbors' labels), then
    shortcuts to its label's label (label <- label(label)). The jump
    halves remaining chain length, so convergence is O(log diameter)
    rounds — a 2^50-diameter path fits the default iteration budget (the
    hashing-to-min variant of Kiveris et al.'s star contractions,
    SoCC'14). Only a 1-row changed-count crosses to the driver per
    round — never the edge set. Raises if the budget is exhausted before
    the fixpoint: a loud failure beats silently-wrong clusters."""
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iterations):
        nbr_min = (edges
                   .join(labels.select(F.col("doc_id").alias("dst"),
                                       F.col("cluster_id").alias("nbr_lbl")),
                         "dst")
                   .groupBy(F.col("src").alias("doc_id"))
                   .agg(F.min("nbr_lbl").alias("nbr_min")))
        stepped = (labels.join(nbr_min, "doc_id", "left")
                   .select("doc_id",
                           F.least(F.col("cluster_id"),
                                   F.coalesce("nbr_min", F.col("cluster_id"))
                                   ).alias("cluster_id")))
        # pointer jump: every label is itself a vertex id, so label(label)
        # is a self-join lookup; labels only ever decrease
        lut = stepped.select(F.col("doc_id").alias("_p"),
                             F.col("cluster_id").alias("_plbl"))
        jumped = (stepped.join(lut, stepped["cluster_id"] == lut["_p"])
                  .select("doc_id",
                          F.least("cluster_id", "_plbl").alias("cluster_id")))
        # localCheckpoint: materializes the round AND truncates lineage so
        # the plan doesn't grow by two joins per iteration
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_iterations} "
            f"rounds — raise max_iterations")
    return labels.orderBy("doc_id")


def kmeans_lite(emb: DataFrame, iterations: int = 2, seed_stride: int = 40,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column. Returns
    (centroid_id, centroid array<double>, n_members) after ``iterations``
    assign/update rounds; centroids seeded from every seed_stride-th
    vector (no RNG, reproducible across runs/engines)."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    centroids = (v.filter(F.col(id_col) % seed_stride == 0)
                 .select(F.col(id_col).alias("centroid_id"),
                         F.col("v").alias("centroid")))
    for _ in range(iterations):
        assigned = assign_centroids(v, centroids, vec_col="v", id_col=id_col)
        # update: element-wise mean per cell (posexplode -> avg -> re-pack)
        exploded = assigned.select("centroid_id",
                                   F.posexplode("v").alias("pos", "x"))
        means = (exploded.groupBy("centroid_id", "pos")
                 .agg(F.avg("x").alias("m")))
        centroids = (means.groupBy("centroid_id")
                     .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                          .alias("pm"))
                     .select("centroid_id",
                             F.expr("transform(pm, e -> e.m)").alias("centroid")))
    sizes = (assign_centroids(v, centroids, vec_col="v", id_col=id_col)
             .groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_members")))
    # both sides are k rows — broadcast beats the sort-merge join Spark
    # picks for the post-aggregation relation
    return (centroids.join(F.broadcast(sizes), "centroid_id", "left")
            .na.fill({"n_members": 0})
            .select("centroid_id",
                    F.expr("transform(centroid, x -> round(x, 6))")
                    .alias("centroid"), "n_members")
            .orderBy("centroid_id"))


def logistic_fit(df: DataFrame, feature_cols: list[str], label_col: str,
                 iterations: int = 2, lr: float = 1.0) -> DataFrame:
    """Distributed logistic regression by full-batch gradient descent —
    the "train the quality classifier" op: fit a filter model over corpus
    features without leaving the engine.

    Same execution shape as ``kmeans_lite``: the weight vector lives on
    the driver (a handful of scalars), each iteration is ONE aggregate
    over the data (avg((sigmoid(w·x) - y) * x_j) per feature — map-side
    combinable, a single shuffle of partial sums), and the updated
    weights re-enter the next pass as literals. Nothing row-shaped ever
    reaches the driver, so the fit scales to any corpus the aggregates
    scale to. The FIXED iteration count makes the whole fit unrollable
    into plain SQL CTEs, so the oracle is an exact hash — not a
    tolerance check. Returns (idx, w): idx 0 is the bias.

    At 100 TB: swap full-batch avg for per-partition mini-batches or
    sampled batches if iteration latency matters; the aggregate shape is
    unchanged."""
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols, start=1):
            z = z + F.lit(w[j]) * F.col(c)
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(label_col)
        aggs = [F.avg(err).alias("g0")] + [
            F.avg(err * F.col(c)).alias(f"g{j}")
            for j, c in enumerate(feature_cols, start=1)]
        g = df.agg(*aggs).collect()[0]
        w = [w[j] - lr * g[f"g{j}"] for j in range(len(w))]
    spark = df.sparkSession
    return (spark.createDataFrame([(j, wj) for j, wj in enumerate(w)],
                                  "idx int, w double")
            .select("idx", F.round("w", 6).alias("w"))
            .orderBy("idx"))


def calibration_table(df: DataFrame, weights: list[float],
                      feature_cols: list[str], label_col: str = "y",
                      id_col: str = "doc_id", bins: int = 10) -> DataFrame:
    """Reliability diagram for a fitted probabilistic classifier:
    quantile-bin predictions by confidence (ntile over a total order,
    so every bin holds ~n/bins rows even when scores concentrate — a
    2-step GD fit puts everything within one fixed-width bucket) and
    compare mean confidence against the empirical positive rate per
    bin — the calibration check that should gate any learned quality
    filter before its scores become keep/drop thresholds.

    ``weights`` are the ROUNDED coefficients the training query emits
    (bias first) — scoring from the hash-checked artifact keeps the
    whole table a pure function of already-verified values. Predictions
    are quantized to 1e-6 so the per-bin sums are exact integers
    (order-independent); the bin ordering is total (score, then
    ``id_col``) and assigned by ``distributed_ntile`` — range-
    partitioned local sorts, never a global single-partition window
    sort over every scored document — then one map-side-combinable
    aggregate."""
    from .windows import distributed_ntile
    z = F.lit(weights[0])
    for j, c in enumerate(feature_cols, start=1):
        z = z + F.lit(weights[j]) * F.col(c)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    pi = F.round(p * 1_000_000, 0).cast("long")
    scored = df.select(
        F.col(label_col).cast("long").alias("_y"), pi.alias("_pi"),
        F.col(id_col).alias("_id"))
    binned = distributed_ntile(scored, bins, ["_pi", "_id"], out="bin")
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("_pi").cast("double")
                         / F.count(F.lit(1)) / 1_000_000.0, 6)
                 .alias("avg_conf"),
                 F.round(F.sum("_y").cast("double")
                         / F.count(F.lit(1)), 6).alias("frac_pos"))
            .withColumn("gap", F.round(
                F.abs(F.col("avg_conf") - F.col("frac_pos")), 6))
            .orderBy("bin"))
