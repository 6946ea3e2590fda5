"""Iterative operators: near-dup clustering + k-means-lite centroids.

Genuinely iterative algorithms (the class the SQL oracle can't express —
the driver records rows-only checks for these):

- ``cluster_near_dups``: connected components over the near-dup pair
  graph. The pair set is LSH-verified output — orders of magnitude
  smaller than the corpus — so union-find runs driver-side on collected
  pairs (documented escape hatch; a billion-edge graph would use
  iterative DataFrame label propagation instead, same API).
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
                      id_b: str = "id_b") -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in a near-dup pair;
    cluster_id = the smallest doc id in its connected component."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # smaller id becomes the root -> stable cluster ids
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = pairs.select(id_a, id_b).collect()
    spark = pairs.sparkSession
    for r in rows:
        union(r[id_a], r[id_b])
    out = [(x, find(x)) for x in parent]
    return spark.createDataFrame(out, "doc_id long, cluster_id long") \
        .orderBy("doc_id")


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
    return (centroids.join(sizes, "centroid_id", "left")
            .na.fill({"n_members": 0})
            .select("centroid_id",
                    F.expr("transform(centroid, x -> round(x, 6))")
                    .alias("centroid"), "n_members")
            .orderBy("centroid_id"))
