"""Similarity search (ANN) over an embedding column.

Three tiers, all relational and deterministic:

- brute-force top-k: one codegen'd cosine projection + top-k sort — the
  exact baseline, linear scan, no shuffle until the final k-row sort.
- sign-LSH buckets: random-hyperplane LSH (Charikar '02) with anchors
  drawn deterministically from the corpus itself; equal-bucket probing
  turns the scan into a partition-pruned subset scan.
- IVF (inverted-file): k centroids, nearest-centroid assignment, probe
  the ``nprobe`` closest cells — the classic Faiss IVF layout expressed
  as two small cross-joins + windows.

At 100 TB the bucket/cell column becomes the table's partition key, so a
probe reads only matching partitions (partition pruning does the 'index').
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine
from .pinned import pin, pin_checkpoint, pin_cut
from .windows import top_k_per_group


def _query_col(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine to ``query_vec``; deterministic tie-break on id.
    Score rounded so rank order is engine-stable."""
    q = _query_col(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(as_double(vec_col), q), 6).alias("score"))
    # the heavy part is TakeOrderedAndProject (map-side top-k, no global
    # sort); rank over the surviving k rows is a broadcast self-join
    # count — no Window at all, so no single-partition WindowExec stage
    # (Spark 4's EliminateWindowPartitions folds a constant partition key
    # back to the warning path, so the lit(0) trick no longer applies).
    top = (scored.orderBy(F.col("score").desc(), F.col(id_col))
           .limit(k))
    other = top.select(F.col("score").alias("score2"),
                       F.col(id_col).alias("id2"))
    before = (F.col("score2") > F.col("score")) | (
        (F.col("score2") == F.col("score")) & (F.col("id2") < F.col(id_col)))
    return (top.join(F.broadcast(other), before, "left")
            .groupBy(id_col, "score")
            .agg((F.count("id2") + 1).cast("long").alias("rank"))
            .orderBy("rank"))


def sign_lsh_bucket(vec: Column, anchors: list[list[float]]) -> Column:
    """Bucket id from the sign pattern of dot products against anchor
    hyperplanes: bit_i = [dot(v, anchor_i) >= 0]."""
    from ..functions.vectors import dot
    bucket = F.lit(0)
    for i, a in enumerate(anchors):
        d = dot(vec, F.array(*[F.lit(float(x)) for x in a]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(0)
    return bucket.cast("long")


def lsh_topk(emb: DataFrame, query_vec: list[float],
             anchors: list[list[float]], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN: score only vectors in the query's sign-LSH bucket. Recall trades
    off with #anchors; the bucket column is the scale-out partition key."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    bucketed = v.withColumn("bucket", sign_lsh_bucket(F.col("v"), anchors))
    qb_row = (bucketed.sparkSession.createDataFrame([(query_vec,)], "q array<double>")
              .select(sign_lsh_bucket(F.col("q"), anchors).alias("b")).collect())
    qbucket = qb_row[0]["b"]
    q = _query_col(query_vec)
    return (bucketed.filter(F.col("bucket") == qbucket)
            .select(F.col(id_col),
                    F.round(cosine(F.col("v"), q), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def assign_centroids(emb: DataFrame, centroids: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     cent_id: str = "centroid_id",
                     cent_vec: str = "centroid") -> DataFrame:
    """IVF cell assignment: nearest centroid per vector (broadcast
    cross-join + top-1 window; centroids are tiny by construction)."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    c = centroids.select(F.col(cent_id), as_double(cent_vec).alias("c"))
    scored = (v.crossJoin(F.broadcast(c))
              .withColumn("sim", F.round(cosine(F.col("v"), F.col("c")), 6)))
    return (top_k_per_group(scored, [id_col],
                            [F.col("sim").desc(), F.col(cent_id)], 1)
            .select(id_col, cent_id, "v"))


def ivf_topk(emb: DataFrame, centroids: DataFrame, query_vec: list[float],
             k: int = 10, nprobe: int = 3,
             vec_col: str = "embedding", id_col: str = "vec_id",
             cent_id: str = "centroid_id", cent_vec: str = "centroid") -> DataFrame:
    """IVF ANN: probe the nprobe centroids closest to the query, exact
    top-k within their cells only."""
    q = _query_col(query_vec)
    probe = (centroids
             .select(F.col(cent_id),
                     F.round(cosine(as_double(cent_vec), q), 6).alias("csim"))
             .orderBy(F.col("csim").desc(), F.col(cent_id))
             .limit(nprobe).select(cent_id))
    assigned = assign_centroids(emb, centroids, vec_col, id_col,
                                cent_id, cent_vec)
    return (assigned.join(F.broadcast(probe), cent_id)
            .select(F.col(id_col),
                    F.round(cosine(F.col("v"), q), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def ivf_recall_sweep(emb: DataFrame, centroids: DataFrame,
                     query_vec: list[float], k: int = 10,
                     nprobes: Sequence[int] = (1, 2, 4, 8),
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     cent_id: str = "centroid_id",
                     cent_vec: str = "centroid") -> DataFrame:
    """Recall@k of the IVF index as a FUNCTION of nprobe — the tuning
    curve read before choosing the probe budget (recall rises with
    nprobe, query cost rises linearly; the knee is the operating
    point). One row per nprobe: (nprobe, k, n_hits, recall), exact
    against the brute-force ground truth, so the whole curve is a
    hash-stable oracle, not a statistical bound.

    Assignment and scoring are shared across the sweep (unlike calling
    :func:`ivf_topk` per nprobe, which would re-assign the corpus
    |nprobes| times):

    - centroid probe ranks: only the max(nprobes) query-closest
      centroids matter, so they come from a distributed top-k
      (TakeOrderedAndProject) and the rank window runs on that
      ≤ max(nprobes)-row relation — never a data-scaled global window.
    - per-PRANK top-k: the global top-k of any probed-cell union is a
      subset of the union of per-cell top-ks, so the pool ranked per
      nprobe is ≤ max(nprobes)·k rows (constant-bounded).
    - the candidate relation (vectors in probed cells) is scored ONCE;
      nprobe membership is a broadcast range join on the cell's rank.

    Shape at 100 TB: one assignment pass (vector×centroid broadcast
    scores), one probed-cell filter, per-cell windows keyed by prank,
    then constant-size arithmetic.
    """
    # normalize up front: the contract is ONE row per distinct nprobe,
    # so duplicates collapse and an empty sweep is a caller error
    # (round-13 advice)
    nprobes = sorted({int(n) for n in nprobes})
    if not nprobes:
        raise ValueError("ivf_recall_sweep: nprobes must be non-empty")
    q = _query_col(query_vec)
    max_np = nprobes[-1]
    csim = centroids.select(
        F.col(cent_id),
        F.round(cosine(as_double(cent_vec), q), 6).alias("csim"))
    top_c = (csim.orderBy(F.col("csim").desc(), F.col(cent_id))
             .limit(max_np))
    w = Window.orderBy(F.col("csim").desc(), F.col(cent_id))
    pranked = top_c.select(F.col(cent_id),
                           F.row_number().over(w).alias("prank"))
    assigned = assign_centroids(emb, centroids, vec_col, id_col,
                                cent_id, cent_vec)
    cand = (assigned.join(F.broadcast(pranked), cent_id)
            .select(F.col(id_col), F.col("prank"),
                    F.round(cosine(F.col("v"), q), 6).alias("score")))
    pool = top_k_per_group(cand, ["prank"],
                           [F.col("score").desc(), F.col(id_col)], k) \
        .drop("rank")
    nps = emb.sparkSession.createDataFrame(
        [(n,) for n in nprobes], "nprobe long")
    pooled = pool.join(F.broadcast(nps),
                       F.col("prank") <= F.col("nprobe"))
    ivf_top = top_k_per_group(pooled, ["nprobe"],
                              [F.col("score").desc(), F.col(id_col)], k)
    exact = brute_force_topk(emb, query_vec, k, vec_col, id_col) \
        .select(id_col)
    hits = (ivf_top.join(F.broadcast(exact), id_col)
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
    return (nps.join(hits, "nprobe", "left")
            .select("nprobe", F.lit(int(k)).cast("long").alias("k"),
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                            / float(k), 6).alias("recall"))
            .orderBy("nprobe"))


def knn_join(emb: DataFrame, k: int = 3, vec_col: str = "embedding",
             id_col: str = "vec_id", block_col: str = "label",
             impl: str = "arrow") -> DataFrame:
    """All-pairs k-nearest-neighbors, blocked: for every vector, its k
    most cosine-similar neighbors within the same ``block_col`` (an LSH
    bucket, IVF cell or cluster label). The blocking is what keeps the
    candidate join off O(n^2) at scale — candidates are generated
    per-block only. Exact within the block; recall across blocks is the
    blocker's contract (same tradeoff as embedding_near_dup_pairs).

    Deterministic: score rounded to 6 dp, ties broken on neighbor id.

    Two implementations with identical results (equality-tested):
    - ``impl="arrow"`` (default): one ``applyInPandas`` per block — the
      block's vectors become a numpy matrix and the pairwise scores ONE
      BLAS matmul (Vn @ Vn.T). This is the legitimate Pandas-UDF case:
      the inner loop is dense linear algebra Spark expressions can't
      vectorize. One shuffle on block; per-task memory is O(block^2)
      scores, which is exactly the blocker's size contract.
    - ``impl="sql"``: pure relational (self-join + window) — engine-
      portable, used by the DuckDB-oracle twin and as the semantics
      reference. Per-pair cost is one dot product over pre-normalized
      vectors."""
    if impl == "arrow":
        return _knn_join_arrow(emb, k, vec_col, id_col, block_col)
    from ..functions.vectors import dot, norm
    v = (emb.select(F.col(id_col), as_double(vec_col).alias("v"),
                    F.col(block_col))
         .withColumn("_n", norm(F.col("v")))
         .withColumn("v", F.when(F.col("_n") > 0, F.transform(
             F.col("v"), lambda x: x / F.col("_n"))))
         .drop("_n"))
    a, b = v.alias("a"), v.alias("b")
    cand = (a.join(b, (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
                   & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("qid"),
                    F.col(f"b.{id_col}").alias("nid"),
                    F.round(dot(F.col("a.v"), F.col("b.v")), 6)
                    .alias("score")))
    ranked = cand.withColumn("nn_rank", F.row_number().over(
        Window.partitionBy("qid")
        .orderBy(F.col("score").desc(), F.col("nid"))).cast("long"))
    return (ranked.filter(F.col("nn_rank") <= k)
            .select(F.col("qid").alias(id_col),
                    F.col("nid").alias("neighbor_id"), "score", "nn_rank"))


def _knn_join_arrow(emb: DataFrame, k: int, vec_col: str,
                    id_col: str, block_col: str,
                    row_batch: int = 2048) -> DataFrame:
    """Per-block numpy kernel for knn_join: normalize rows once, score
    pairs with BLAS matmuls, emit each row's top-k by
    (round(score, 6) desc, neighbor id asc) — the same order contract as
    the relational implementation.

    Memory is bounded: query rows are scored in ``row_batch`` slices, so
    the live score matrix is O(row_batch x block), never O(block^2) —
    a 1M-row block peaks at ~16 GB x (2048/1M) ≈ 33 MB per slice instead
    of 8 TB. The matmul count is unchanged (same FLOPs, sliced)."""
    import numpy as np
    import pandas as pd

    def topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({id_col: np.empty(0, dtype=np.int64),
                                 "neighbor_id": np.empty(0, dtype=np.int64),
                                 "score": np.empty(0, dtype=np.float64),
                                 "nn_rank": np.empty(0, dtype=np.int64)})
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf[vec_col]])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            Vn = np.where(norms > 0, V / norms, np.nan)
        kk = min(k, n - 1)
        out_q, out_n, out_s, out_r = [], [], [], []
        for lo in range(0, n, row_batch):
            hi = min(lo + row_batch, n)
            S = np.round(Vn[lo:hi] @ Vn.T, 6)
            S[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf  # self
            S = np.nan_to_num(S, nan=-np.inf)  # zero-norm rows rank last
            for i in range(hi - lo):
                # lexsort: last key is primary -> (-score, id)
                order = np.lexsort((ids, -S[i]))[:kk]
                keep = S[i][order] > -np.inf
                order = order[keep]
                out_q.append(np.full(len(order), ids[lo + i]))
                out_n.append(ids[order])
                out_s.append(S[i][order])
                out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        return pd.DataFrame({id_col: np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "score": np.concatenate(out_s),
                             "nn_rank": np.concatenate(out_r)})

    schema = (f"{id_col} long, neighbor_id long, "
              "score double, nn_rank long")
    return (emb.select(F.col(id_col), F.col(vec_col), F.col(block_col))
            .groupBy(block_col).applyInPandas(topk, schema=schema))


def embedding_space_profile(emb: DataFrame, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            label_col: str = "label") -> DataFrame:
    """Per-label embedding-space health profile: member count, centroid
    norm, and cohesion (mean member distance to the label centroid) —
    the drift/collapse monitor for an embedding column (a label whose
    cohesion balloons or centroid norm collapses flags a bad encoder
    batch or polluted cluster).

    Relational throughout: posexplode to (row, dim) pairs, centroid =
    per-(label, dim) mean, member distances via the expansion
    ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2 — three hash aggregations
    over the exploded (n_rows x dim) relation, no driver-side vectors.
    At 100 TB the explode factor is the (bounded, ~100s) dimension
    count and every aggregate is map-side-combinable."""
    ex = emb.select(
        F.col(id_col), F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("i", "x"))
    dim = (ex.groupBy(label_col, "i")
           .agg(F.avg("x").alias("c")))
    cnorm = (dim.groupBy(label_col)
             .agg(F.sum(F.col("c") * F.col("c")).alias("c2")))
    per_vec = (ex.join(dim, [label_col, "i"])
               .groupBy(id_col, label_col)
               .agg(F.sum(F.col("x") * F.col("c")).alias("dot"),
                    F.sum(F.col("x") * F.col("x")).alias("x2")))
    dist = F.sqrt(F.greatest(
        F.col("x2") - 2 * F.col("dot") + F.col("c2"), F.lit(0.0)))
    return (per_vec.join(cnorm, label_col)
            .groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.sqrt(F.first("c2")), 6).alias("centroid_norm"),
                 F.round(F.avg(dist), 6).alias("cohesion"))
            .orderBy(label_col))


def pq_adc_topk(emb: DataFrame, codebook: DataFrame,
                query_vec: list[float], k: int = 10,
                m: int = 4, dim: int = 64,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation
    (ADC, Jegou et al. '11): vectors are encoded as m sub-space codes
    (argmin codeword per sub-vector); the query stays UNquantized and
    scores against the per-subspace distance table, so ranking costs
    m table lookups per vector instead of a full dim-dimensional
    distance — the memory-bound regime ANN rollouts actually run at
    100 TB (codes are m bytes vs dim floats per vector).

    ``codebook``: (cid, sub, codeword array<double>) — here supplied
    deterministically (IVF-style sampled rows split into sub-vectors);
    k-means-trained codebooks drop in unchanged. Relational shape:
    posexplode to (row, sub, dim-in-sub), one (row, sub, cid) distance
    aggregate against the broadcast codebook, min_by argmin, then the
    ADC sum per row. Distances rounded to 6dp before every comparison
    so ranking is engine-stable."""
    sub_d = dim // m
    ex = _flat_explode(emb, vec_col, id_col)
    # flatten the (cid, sub, codeword) form onto the global dimension
    # index: i0 = sub*sub_d + j — (sub, j) equality IS i0 equality
    cbex = (codebook.select(
        "cid", "sub",
        F.posexplode(F.col("codeword").cast("array<double>"))
        .alias("j", "c"))
        .select("cid", (F.col("sub") * sub_d + F.col("j")).alias("i0"),
                "c"))
    spark = emb.sparkSession
    qx = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(query_vec)],
        "i0 int, x double")
    return _pq_adc_topk_flat(ex, cbex, qx, k, sub_d, id_col)


def _flat_explode(emb: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(id, i0, x): the vector column posexploded onto its global
    dimension index — the m-independent base every PQ config derives
    its (sub, j) split from."""
    return emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("i0", "x"))


def _pq_adc_topk_flat(ex: DataFrame, cbex: DataFrame, qx: DataFrame,
                      k: int, sub_d: int, id_col: str) -> DataFrame:
    """ADC core on flat-indexed inputs — THE single source of the PQ
    arithmetic (pq_adc_topk and pq_m_sweep both delegate here; the SQL
    oracle generator mirrors it): ex (id, i0, x), cbex (cid, i0, c),
    qx (i0, x). sub = i0 div sub_d; distances rounded to 6 dp before
    every comparison so ranking is engine-stable."""
    sub = (F.col("i0") / sub_d).cast("int").alias("sub")
    d = (ex.join(F.broadcast(cbex), "i0")
         .groupBy(id_col, sub, F.col("cid"))
         .agg(F.round(F.sum((F.col("x") - F.col("c")) ** 2), 6)
              .alias("d2")))
    codes = (d.groupBy(id_col, "sub")
             .agg(F.min(F.struct("d2", "cid")).alias("_m"))
             .select(id_col, "sub", F.col("_m.cid").alias("cid")))
    qtab = (qx.join(F.broadcast(cbex), "i0")
            .groupBy(sub, F.col("cid"))
            .agg(F.round(F.sum((F.col("x") - F.col("c")) ** 2), 6)
                 .alias("qd2")))
    adc = (codes.join(F.broadcast(qtab), ["sub", "cid"])
           .groupBy(id_col)
           .agg(F.round(F.sum("qd2"), 6).alias("adc_dist")))
    return (adc.orderBy("adc_dist", id_col).limit(k)
            .select(id_col, "adc_dist"))


def sampled_codebook(emb: DataFrame, m: int = 4, dim: int = 64,
                     every: int = 40, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Deterministic PQ codebook: IVF-style sampled rows (id % every
    == 0) split into m sub-vectors -> (cid, sub, codeword). A k-means-
    trained codebook (operators/clustering.kmeans_lite per subspace)
    drops in with the same schema."""
    sub_d = dim // m
    ex = (emb.filter(F.col(id_col) % every == 0)
          .select(F.col(id_col).alias("cid"),
                  F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("i", "x"))
          .select("cid", (F.col("i") / sub_d).cast("int").alias("sub"),
                  (F.col("i") % sub_d).alias("j"), "x"))
    return (ex.groupBy("cid", "sub")
            .agg(F.sort_array(F.collect_list(F.struct("j", "x"))).alias("p"))
            .select("cid", "sub",
                    F.transform("p", lambda t: t["x"]).alias("codeword")))


def trained_codebook(emb: DataFrame, m: int = 4, dim: int = 64,
                     every: int = 40, iterations: int = 2,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """PQ codebook TRAINED per subspace with deterministic Lloyd's
    k-means (operators/clustering.kmeans_lite), seeded from the same
    sampled rows ``sampled_codebook`` uses — same (cid, sub, codeword)
    schema, strictly lower quantization error (pinned by
    tests/test_similarity.py). Each subspace trains independently on
    its slice; m small k-means runs over (n x dim/m) data, every stage
    map-side-combinable."""
    from .clustering import kmeans_lite
    sub_d = dim // m
    parts = []
    for sub in range(m):
        sl = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"),
                    sub * sub_d + 1, sub_d).alias("subv"))
        cents = kmeans_lite(sl, iterations=iterations, seed_stride=every,
                            vec_col="subv", id_col=id_col)
        parts.append(cents.select(
            F.col("centroid_id").alias("cid"),
            F.lit(sub).alias("sub"),
            F.col("centroid").alias("codeword")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quantization_error(emb: DataFrame, codebook: DataFrame,
                       m: int = 4, dim: int = 64,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> float:
    """Mean squared quantization error of a PQ codebook over the corpus
    (sum over subspaces of the assigned codeword's squared distance) —
    the codebook-quality metric that justifies training cost."""
    sub_d = dim // m
    ex = (emb.select(F.col(id_col),
                     F.posexplode(F.col(vec_col).cast("array<double>"))
                     .alias("i", "x"))
          .select(id_col, (F.col("i") / sub_d).cast("int").alias("sub"),
                  (F.col("i") % sub_d).alias("j"), "x"))
    cb = codebook.select(
        "cid", "sub",
        F.posexplode(F.col("codeword").cast("array<double>"))
        .alias("j", "c"))
    d = (ex.join(F.broadcast(cb), ["sub", "j"])
         .groupBy(id_col, "sub", "cid")
         .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2")))
    best = (d.groupBy(id_col, "sub")
            .agg(F.min("d2").alias("bd2")))
    row = (best.groupBy(id_col).agg(F.sum("bd2").alias("err"))
           .agg(F.avg("err").alias("mse")).collect())
    return float(row[0]["mse"])


def triplet_mining(emb: DataFrame, anchor_stride: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   label_col: str = "label",
                   neg_anchors: list[list[float]] | None = None) -> DataFrame:
    """Mine (anchor, positive, hardest-negative) triplets for
    contrastive embedding training.

    For each anchor (every ``anchor_stride``-th vector, deterministic):
    - positive = most cosine-similar SAME-label vector (not itself)
    - negative = most cosine-similar DIFFERENT-label vector — the
      "hardest" negative, the one a margin loss learns most from
    - margin  = pos_score − neg_score (negative margin ⇒ the current
      embedding space misranks this anchor: mining signal)

    Plan shape: the anchor set (|corpus|/stride rows) broadcasts
    against ONE corpus scan — candidate generation is linear in the
    corpus for a fixed anchor budget, never corpus × corpus. At 100 TB
    pass ``neg_anchors`` (sign-LSH hyperplanes): the negative side then
    joins on the EQUI bucket key instead of broadcasting against the
    whole corpus — hard negatives are by definition near the anchor, so
    same-bucket probing keeps recall, and the bucket column becomes the
    corpus partition key. The per-anchor windows are unchanged; only
    the negative candidate set shrinks (the blocked result is exact
    within the bucket — the blocker's standard recall contract, same as
    knn_join / lsh_topk).

    Deterministic: scores rounded to 6 dp, rank ties broken on
    candidate id, anchors chosen by id arithmetic — engine-portable.
    """
    v = emb.select(F.col(id_col), F.col(label_col),
                   as_double(vec_col).alias("v"))
    if neg_anchors is not None:
        v = v.withColumn("bucket",
                         sign_lsh_bucket(F.col("v"), neg_anchors))
    anchors = (v.filter(F.pmod(F.col(id_col), F.lit(anchor_stride)) == 0)
               .select(F.col(id_col).alias("qid"),
                       F.col(label_col).alias("qlab"),
                       F.col("v").alias("qv"),
                       *([F.col("bucket").alias("qbucket")]
                         if neg_anchors is not None else [])))
    if neg_anchors is None:
        cand = (v.join(F.broadcast(anchors), F.col("qid") != F.col(id_col))
                .select("qid", "qlab", F.col(id_col).alias("nid"),
                        (F.col(label_col) == F.col("qlab")).alias("same"),
                        F.round(cosine(F.col("qv"), F.col("v")), 6)
                        .alias("score")))
    else:
        # positives: label-keyed equi-join (the label IS the block);
        # negatives: bucket-keyed equi-join — both shuffle-joinable at
        # scale, no broadcast of the corpus anywhere
        pos_c = (v.join(anchors, (F.col(label_col) == F.col("qlab"))
                        & (F.col("qid") != F.col(id_col)))
                 .select("qid", "qlab", F.col(id_col).alias("nid"),
                         F.lit(True).alias("same"),
                         F.round(cosine(F.col("qv"), F.col("v")), 6)
                         .alias("score")))
        neg_c = (v.join(anchors, (F.col("bucket") == F.col("qbucket"))
                        & (F.col(label_col) != F.col("qlab")))
                 .select("qid", "qlab", F.col(id_col).alias("nid"),
                         F.lit(False).alias("same"),
                         F.round(cosine(F.col("qv"), F.col("v")), 6)
                         .alias("score")))
        cand = pos_c.unionByName(neg_c)
    w = (Window.partitionBy("qid", "same")
         .orderBy(F.col("score").desc(), F.col("nid")))
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    pos = best.filter(F.col("same")).select(
        "qid", F.col("qlab").alias("anchor_label"),
        F.col("nid").alias("pos_id"), F.col("score").alias("pos_score"))
    neg = best.filter(~F.col("same")).select(
        "qid", F.col("nid").alias("neg_id"),
        F.col("score").alias("neg_score"))
    return (pos.join(neg, "qid")
            .select(F.col("qid").alias("anchor_id"), "anchor_label",
                    "pos_id", "pos_score", "neg_id", "neg_score",
                    F.round(F.col("pos_score") - F.col("neg_score"), 6)
                    .alias("margin"))
            .orderBy("anchor_id"))


def knn_label_accuracy(emb: DataFrame, anchors: list[list[float]],
                       k: int = 5, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       label_col: str = "label") -> DataFrame:
    """Per-class kNN classification accuracy — the end-to-end quality
    gate for an embedding space + blocking scheme: every vector is
    classified by majority vote of its k nearest in-bucket neighbors
    (sign-LSH blocking, so the blocker is independent of the label
    being predicted) and scored against its own label.

    Ties in the vote break deterministically (highest count, then
    smallest label); vectors whose bucket holds no other member get no
    prediction and drop out — that coverage loss is the blocker's
    recall contract, same as knn_join. Shape at 100 TB: the candidate
    generation is knn_join's per-bucket matmul (never O(n²)); the vote
    and scoring are two hash-aggs on (id, label)-scale rows."""
    v = (emb.select(F.col(id_col), F.col(label_col),
                    as_double(vec_col).alias("v"))
         .withColumn("bucket", sign_lsh_bucket(F.col("v"), anchors)))
    nn = knn_join(v, k=k, vec_col="v", id_col=id_col, block_col="bucket")
    nlab = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(label_col).alias("nlab"))
    votes = (nn.join(nlab, "neighbor_id")
             .groupBy(id_col, "nlab")
             .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.col("nlab"))
    pred = (votes.withColumn("vr", F.row_number().over(w))
            .filter(F.col("vr") == 1)
            .select(F.col(id_col), F.col("nlab").alias("predicted")))
    scored = pred.join(emb.select(id_col, label_col), id_col)
    ok = (F.col("predicted") == F.col(label_col)).cast("long")
    return (scored.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(ok).alias("n_correct"),
                 F.round(F.sum(ok) / F.count(F.lit(1)), 6)
                 .alias("accuracy"))
            .orderBy(label_col))


def ndcg_at_k(emb: DataFrame, query_vec: list[float], query_id: int,
              query_label: int, k: int = 10, vec_col: str = "embedding",
              id_col: str = "vec_id",
              label_col: str = "label") -> DataFrame:
    """NDCG@k of exact cosine retrieval against label relevance: a
    neighbor is relevant iff it carries the query's label (binary
    gains), DCG discounts by log2(rank+1), and the ideal ordering puts
    every relevant hit first. The rank-weighted companion to
    ann_recall_at_k — recall says WHETHER the right items surfaced,
    NDCG says how HIGH.

    The query itself is excluded (self-retrieval is a gimme). The
    top-k is brute_force_topk's deterministic ranking; the k discount
    terms are fixed literals, so the score is a pure function of the
    verified ranking. One scan + top-k, then k-row arithmetic."""
    import math
    top = (brute_force_topk(
        emb.filter(F.col(id_col) != query_id), query_vec, k=k,
        vec_col=vec_col, id_col=id_col))
    labs = emb.select(F.col(id_col), F.col(label_col))
    rel = (top.join(labs, id_col)
           .select("rank",
                   (F.col(label_col) == query_label).cast("long")
                   .alias("rel")))
    disc = F.lit(1.0) / F.log2(F.col("rank").cast("double") + 1.0)
    agg = rel.agg(
        F.sum("rel").alias("n_relevant"),
        F.sum(F.col("rel") * disc).alias("_dcg"))
    # ideal DCG for m relevant hits: the first m discount weights
    ideal = [sum(1.0 / math.log2(i + 2) for i in range(m))
             for m in range(k + 1)]
    icol = F.element_at(F.array(*[F.lit(x) for x in ideal]),
                        (F.col("n_relevant") + 1).cast("int"))
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_relevant"),
        F.round(F.col("_dcg"), 6).alias("dcg"),
        F.round(icol, 6).alias("idcg"),
        F.round(F.when(F.col("n_relevant") > 0,
                       F.col("_dcg") / icol).otherwise(0.0), 6)
        .alias("ndcg"))


def _sym_floor_div(c: Column, k: int) -> Column:
    """Sign-symmetric truncating division by a power of two, written as
    floor-of-abs so Spark (DIV truncates) and ANSI engines (// floors)
    cannot diverge on negatives. Division by 2^n is exact in binary
    floating point, so the floor sees the exact quotient."""
    kf = F.lit(float(k))
    return (F.when(c >= 0, F.floor(c / kf))
            .otherwise(-F.floor(-c / kf)).cast("long"))


def pca_power_direction(vectors: DataFrame, iters: int = 3,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Dominant principal direction of the embedding cloud by power
    iteration — v ← Xᵀ(Xv), repeated — in exact fixed-point integer
    arithmetic, so the result is bit-identical on any engine and any
    partitioning (the same contract as the integer PageRank).

    Embeddings are quantized to 1e-6 integers on the exploded
    (vec, coord, value) long layout — the layout a 100 TB vector store
    aggregates on anyway. Each iteration is two equi-keyed hash-aggs
    (dot products per vector, then back-projections per coordinate);
    between steps magnitudes are controlled with sign-symmetric 2²⁰
    shifts, and the vector is renormalized to the INFINITY norm (an
    integer max — exact and order-independent, where a Euclidean norm
    would be an order-dependent float sum of squares) with half-away
    integer division. v₀ = (1/8, …, 1/8): exact in micro units for
    dim 64. No driver traffic at all — the per-iteration state is a
    dim-row DataFrame kept distributed (persisted: it feeds the next
    iteration's join and the plan would otherwise double per round).
    Output: (j, v_e6), the direction scaled to max|v|=1e6.
    """
    from .windows import int_mean_half_away
    x = pin(vectors.select(F.col(id_col).alias("vid"),
                           F.posexplode(as_double(vec_col))
                           .alias("j", "xv"))
            .select("vid", "j",
                    F.round(F.col("xv") * 1e6, 0).cast("long").alias("x")))
    v = (x.select("j").distinct()
         .select("j", F.lit(125000).cast("long").alias("v")))
    for _ in range(iters):
        # Leaf-ify v each iteration (round 12): v embeds the whole
        # previous iteration and s is referenced twice (the inf-norm
        # agg + the shifted copy), so the analyzed tree reached 4,799
        # nodes by round 11's audit. Round-15: v is an eager
        # localCheckpoint instead of a parquet cut — it still truncates
        # the lineage per iteration, but skips a parquet write+read
        # JOB per round; its ONLY join consumer is explicitly
        # broadcast-hinted, so the k_core stats-loss hazard (checkpoint
        # leaves flipping broadcast joins to SMJ) cannot bite. s drops
        # to a plain pin: with v a leaf its tree is two joins + two
        # aggs, and both its consumers are aggregates (no join-strategy
        # dependence) — 6 cut-write jobs per query become 3
        # checkpoints + 3 persists of dim-row (64-row) frames.
        v = pin_checkpoint(v)
        d = (x.join(F.broadcast(v), "j")
             .groupBy("vid")
             .agg(F.sum(F.col("x") * F.col("v")).alias("d")))
        dk = d.select("vid", _sym_floor_div(F.col("d"), 1 << 20)
                      .alias("dk"))
        s = pin(
            x.join(dk, "vid")
            .groupBy("j")
            .agg(F.sum(F.col("x") * F.col("dk")).alias("s")))
        m = s.agg(F.max(F.abs(F.col("s"))).alias("m"))
        sk = s.select("j", _sym_floor_div(F.col("s"), 1 << 20)
                      .alias("sk"))
        mk = m.select(_sym_floor_div(F.col("m"), 1 << 20).alias("mk"))
        v = (sk.crossJoin(F.broadcast(mk))
             .select("j", int_mean_half_away(
                 F.col("sk") * F.lit(1000000), F.col("mk"))
                 .alias("v")))
    return (v.select(F.col("j").cast("long").alias("j"),
                     F.col("v").alias("v_e6"))
            .orderBy("j"))


def embedding_outliers(vectors: DataFrame, k: int = 20,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       label_col: str = "label") -> DataFrame:
    """Top-k embedding outliers per the distance-to-own-centroid
    criterion — the vectors a curation pass reviews first (mislabeled
    or off-distribution points sit farthest from their class center).

    Centroids are per-label means on the exploded layout (exact
    1e-6-int sums / count via half-away division, so the centroid is
    an exact integer vector both engines agree on); distances are
    Σ(x−c)² in integer micro² per (vector, label) — exact BIGINTs —
    and the top-k is a TakeOrdered on (distance DESC, vec_id). The
    |labels|·dim centroid table broadcasts.
    """
    from .windows import int_mean_half_away
    x = (vectors.select(F.col(id_col).alias("vid"),
                        F.col(label_col).alias("lbl"),
                        F.posexplode(as_double(vec_col))
                        .alias("j", "xv"))
         .select("vid", "lbl", "j",
                 F.round(F.col("xv") * 1e6, 0).cast("long").alias("x")))
    cent = (x.groupBy("lbl", "j")
            .agg(F.sum("x").alias("sx"),
                 F.count(F.lit(1)).alias("n"))
            .select("lbl", "j",
                    int_mean_half_away(F.col("sx"), F.col("n"))
                    .alias("c")))
    d = (x.join(F.broadcast(cent), ["lbl", "j"])
         .groupBy("vid", "lbl")
         .agg(F.sum((F.col("x") - F.col("c"))
                    * (F.col("x") - F.col("c"))).alias("d2")))
    return (d.orderBy(F.col("d2").desc(), "vid").limit(k)
            .select(F.col("vid").alias(id_col),
                    F.col("lbl").alias(label_col),
                    (F.sqrt(F.col("d2")) / F.lit(1e6)).alias("dist")))


def scalar_quantization_error(vectors: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              label_col: str = "label",
                              levels: int = 256) -> DataFrame:
    """Int8 scalar quantization (SQ) audit: per-dimension affine
    codebooks with ``levels`` buckets, then the per-label reconstruction
    MSE — the go/no-go number for shipping SQ-compressed vectors to the
    ANN index (4× smaller than float32; complements the PQ tier, which
    compresses jointly across dims).

    Codes are FLOOR buckets, not rounded midpoints: ``code =
    min(floor((x − mn)/span · levels), levels−1)`` with dequantization
    at the bucket center — floor is identical in every engine while
    round() half-rules differ, so the whole quantize/dequantize path is
    deterministic double arithmetic with no rounding boundary to split
    on. Per-dim min/max is one |dims|-row aggregate broadcast back as
    ordered arrays (1-row scalar join); per-row squared error folds the
    error array LEFT-TO-RIGHT (both engines), then is quantized to a
    1e-12 integer grid so the per-label sum is an exact BIGINT and the
    mean uses the half-away integer form. The fixed-point label sum
    holds ~6e8 rows of headroom at this fixture's error scale; re-grid
    for corpora beyond that.

    Shape at scale: one posexplode aggregate (|dims| output rows), one
    broadcast join, one hash-agg on the label — the fact is scanned
    twice, nothing shuffles on |rows|·|dims|.
    """
    from .windows import int_mean_half_away
    v = vectors.select(F.col(id_col).alias("vid"),
                       F.col(label_col).alias("lbl"),
                       as_double(vec_col).alias("x"))
    dims = v.select(F.posexplode("x").alias("pos", "val"))
    stats = (dims.groupBy("pos")
             .agg(F.min("val").alias("mn"), F.max("val").alias("mx")))
    arrs = stats.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mn"))),
                    lambda s: s.mn).alias("amn"),
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s.mx).alias("amx"))
    lv = F.lit(float(levels))

    def err_elem(xi: Column, i: Column) -> Column:
        mn = F.element_at("amn", i + 1)
        mx = F.element_at("amx", i + 1)
        span = mx - mn
        code = F.least(F.floor((xi - mn) / span * lv).cast("double"),
                       lv - 1)
        dq = mn + (code + 0.5) * span / lv
        diff = xi - dq
        return F.when(span > 0.0, diff * diff).otherwise(0.0)

    rows = (v.crossJoin(F.broadcast(arrs))  # 1-row scalar join
            .select("lbl",
                    F.round(F.aggregate(
                        F.transform("x", err_elem),
                        F.lit(0.0), lambda a, b: a + b) * 1e12, 0)
                    .cast("long").alias("e")))
    agg = rows.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("e").alias("se"))
    # mse = mean per-VECTOR total squared error (sum over dims), on the
    # exact integer grid; one division at emit
    return (agg.select(
        F.col("lbl").alias(label_col), "n_vecs",
        (int_mean_half_away(F.col("se"), F.col("n_vecs"))
         / F.lit(1e12)).alias("mse"))
        .orderBy(label_col))


def _sq_minmax_arrays(v: DataFrame) -> DataFrame:
    """1-row frame of per-dimension (amn, amx) ordered arrays for a
    frame with an array<double> column ``x`` — the SQ codebook stats."""
    dims = v.select(F.posexplode("x").alias("pos", "val"))
    stats = (dims.groupBy("pos")
             .agg(F.min("val").alias("mn"), F.max("val").alias("mx")))
    return stats.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mn"))),
                    lambda s: s.mn).alias("amn"),
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s.mx).alias("amx"))


def _sq_dequant_elem(xi: Column, i: Column, levels: int) -> Column:
    """Bucket-center dequantization of one element against the
    broadcast (amn, amx) arrays; zero-span dims reconstruct exactly."""
    lv = F.lit(float(levels))
    mn = F.element_at("amn", i + 1)
    mx = F.element_at("amx", i + 1)
    span = mx - mn
    code = F.least(F.floor((xi - mn) / span * lv).cast("double"),
                   lv - 1)
    return F.when(span > 0.0, mn + (code + 0.5) * span / lv).otherwise(xi)


def sq_recall_at_k(vectors: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 10,
                   query_id: int = 0, levels: int = 256) -> DataFrame:
    """Retrieval-quality check for int8 scalar quantization: recall@k
    of brute-force cosine search over DEQUANTIZED vectors (query
    included) against the exact float search — the accuracy half of
    the compression trade-off whose error half is
    :func:`scalar_quantization_error`.

    Both rankings order by (6-dp-rounded cosine, id) — a total order —
    and take the top ``k`` with a TakeOrdered limit-sort (no
    single-partition WindowExec). The cosine is the explicit left-fold
    dot/(‖a‖·‖b‖) form, which the oracle mirrors with the identical
    list_reduce folds — bit-for-bit, no reliance on an engine's fused
    cosine kernel. One |dims|-row stats aggregate, two broadcast
    scalar joins, two top-k sorts, one k-row intersection join.
    """
    v = vectors.select(F.col(id_col).alias("vid"),
                       as_double(vec_col).alias("x"))
    arrs = _sq_minmax_arrays(v)
    va = v.crossJoin(F.broadcast(arrs))  # 1-row scalar join
    dq = va.select(
        "vid", F.transform(
            "x", lambda xi, i: _sq_dequant_elem(xi, i, levels))
        .alias("x"))

    def topk(frame: DataFrame) -> DataFrame:
        q = (frame.filter(F.col("vid") == query_id)
             .select(F.col("x").alias("qv")))
        return (frame.crossJoin(F.broadcast(q))  # 1-row scalar join
                .select("vid", F.round(cosine(F.col("x"), F.col("qv")),
                                       6).alias("s"))
                .orderBy(F.col("s").desc(), "vid").limit(k)
                .select("vid"))

    exact = topk(v)
    sq = topk(dq).withColumn("h", F.lit(1))
    hits = F.sum(F.coalesce("h", F.lit(0)))
    return (exact.join(sq, "vid", "left")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact"),
                 hits.cast("long").alias("n_sq_hits"),
                 F.round(hits / F.count(F.lit(1)), 6).alias("recall")))


def centroid_drift(vectors: DataFrame, vec_col: str = "embedding",
                   label_col: str = "label", dims: int = 64,
                   grid: int = 1_000_000) -> DataFrame:
    """Per-group embedding centroid drift: the cosine between each
    group's centroid and the global centroid — the first diagnostic for
    "did this source/label shift in embedding space".

    Cosine is scale-invariant, so centroids never materialize as float
    ratios: cos(S_g/n_g, S/n) = cos(S_g, S) on the per-dim SUM vectors,
    which are EXACT integers on a 1e-6 component grid. The global sums
    REUSE the per-group aggregate (one pass over the vectors). The
    final cosine runs on ordered arrays through the explicit left fold
    (F.aggregate seed 0.0 == DuckDB list_reduce, bit-for-bit), with
    identical dot/(√·√) association — the sq_recall precedent.

    Scale: posexplode to (row, dim) then two keyed integer aggregates;
    per-group arrays are |dims| wide, the global array is one
    broadcast row. Nothing widens beyond |groups × dims|.
    """
    q = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("pos", "x"))
    q = q.select("label", "pos",
                 F.round(F.col("x") * grid, 0).cast("long").alias("v"))
    ld = pin(q.groupBy("label", "pos")
             .agg(F.sum("v").cast("long").alias("s")))
    gd = ld.groupBy("pos").agg(F.sum("s").cast("long").alias("sg"))
    la = (ld.groupBy("label")
          .agg(F.array_sort(F.collect_list(F.struct("pos", "s")))
               .alias("ps"))
          .select("label", F.expr(
              "transform(ps, p -> CAST(p.s AS DOUBLE))").alias("a")))
    ga = (gd.agg(F.array_sort(F.collect_list(F.struct("pos", "sg")))
                 .alias("ps"))
          .select(F.expr(
              "transform(ps, p -> CAST(p.sg AS DOUBLE))").alias("g")))
    n = (vectors.groupBy(F.col(label_col).alias("label"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_vectors")))
    j = la.crossJoin(F.broadcast(ga))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0),  # noqa: E731
                                   lambda acc, e: acc + e)
    dot = fold(F.zip_with("a", "g", lambda x, y: x * y))
    na = fold(F.expr("transform(a, e -> e * e)"))
    ng = fold(F.expr("transform(g, e -> e * e)"))
    j = j.select("label", dot.alias("dot"), na.alias("na"),
                 ng.alias("ng"))
    cos = F.when((F.col("na") > 0) & (F.col("ng") > 0),
                 F.round(F.col("dot")
                         / (F.sqrt("na") * F.sqrt("ng")), 6))
    return (j.join(n, "label")
            .select("label", "n_vectors", cos.alias("cos_to_global"))
            .orderBy("label"))


def dimension_variance_profile(emb: DataFrame, top: int = 16,
                               vec_col: str = "embedding",
                               grid: int = 10_000) -> DataFrame:
    """Per-dimension variance profile of an embedding column: the
    ``top`` highest-variance dimensions with mean and sample variance
    — the feature-selection / dead-dimension audit run before
    quantization or indexing (a near-zero-variance dim is free to
    drop; one dominating dim distorts cosine buckets).

    Each component is quantized to the 1/`grid` integer grid, so the
    per-dimension (n, Σq, Σq²) are exact BIGINTs under any partial-agg
    order; mean and variance are emitted as UNROUNDED
    fixed-association doubles over the leaf-cast sums (ratios of exact
    integers — raw doubles are the canonical form), de-scaled by the
    grid once. Top-k orders on the INTEGER variance numerator
    ``n·Σq² − (Σq)²`` (ties by dim), so the cut never depends on a
    float. Headroom: q ≲ 5·grid, n·q² ≲ n²·2.5e9 — re-grid past ~1e4
    vectors per the integer-headroom audit rule.

    Scale: posexplode + one (dim)-keyed aggregate — dims, not vectors,
    bound everything after the scan.
    """
    # widen float32 components to double BEFORE scaling — the oracle
    # casts to DOUBLE[] first, and float×int arithmetic would round
    # differently
    q = (emb.select(F.posexplode(as_double(vec_col)).alias("dim", "x"))
         .select("dim", F.round(F.col("x") * grid, 0).cast("long")
                 .alias("q")))
    g = (q.groupBy("dim")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("q").cast("long").alias("s"),
              F.sum(F.col("q") * F.col("q")).cast("long").alias("ss")))
    varnum = (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    mean = F.col("s").cast("double") / F.col("n").cast("double") \
        / F.lit(float(grid))
    var = varnum.cast("double") \
        / (F.col("n") * (F.col("n") - 1)).cast("double") \
        / F.lit(float(grid) * grid)
    return (g.filter(F.col("n") > 1)
            .withColumn("_vn", varnum.cast("long"))
            .orderBy(F.col("_vn").desc(), "dim").limit(top)
            .select(F.col("dim").cast("long").alias("dim"), "n",
                    mean.alias("mean"), var.alias("variance")))


CENTROID_GRID = 10_000  # 1e-4 coordinate grid for centroid sums


def label_centroid_similarity(vecs: DataFrame,
                              vec_col: str = "embedding",
                              label_col: str = "label",
                              grid: int = CENTROID_GRID) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid vectors —
    the class-separation audit run before trusting labels for
    classifier-based curation (entangled centroids predict label
    noise).

    cosine(mean_a, mean_b) == cosine(sum_a, sum_b), so no mean (and no
    knife-edge integer ratio) is ever formed: coordinates are widened
    float32→double FIRST, quantized to the ``1/grid`` grid, and summed
    as exact BIGINTs per (label, dim); dot products and squared norms
    of the sum vectors are exact integer aggregates over the
    label × dim MATRIX (labels · dims rows — dim-sized, never
    vector-count-sized); the cosine emit is the UNROUNDED double
    ``dot / sqrt(na·nb)`` with the multiplication inside the sqrt in
    BOTH engines (na·nb can exceed int64 — the product is formed in
    doubles).
    """
    q = F.round(F.col("x").cast("double") * grid, 0).cast("long")
    s = (vecs.select(label_col, F.posexplode(vec_col)
                     .alias("dim", "x"))
         .select(label_col, "dim", q.alias("xi"))
         .groupBy(label_col, "dim")
         .agg(F.sum("xi").cast("long").alias("s")))
    s = pin(s)
    norms = (s.groupBy(label_col)
             .agg(F.sum(F.col("s") * F.col("s")).cast("long")
                  .alias("nsq")))
    a = s.select(F.col(label_col).alias("label_a"), "dim",
                 F.col("s").alias("sa"))
    b = s.select(F.col(label_col).alias("label_b"), "dim",
                 F.col("s").alias("sb"))
    dots = (a.join(b, "dim")
            .filter(F.col("label_a") < F.col("label_b"))
            .groupBy("label_a", "label_b")
            .agg(F.sum(F.col("sa") * F.col("sb")).cast("long")
                 .alias("dot")))
    na = norms.select(F.col(label_col).alias("label_a"),
                      F.col("nsq").alias("na"))
    nb = norms.select(F.col(label_col).alias("label_b"),
                      F.col("nsq").alias("nb"))
    j = dots.join(na, "label_a").join(nb, "label_b")
    cos = (F.col("dot").cast("double")
           / F.sqrt(F.col("na").cast("double")
                    * F.col("nb").cast("double")))
    return (j.select(F.col("label_a").cast("long").alias("label_a"),
                     F.col("label_b").cast("long").alias("label_b"),
                     "dot",
                     F.when((F.col("na") > 0) & (F.col("nb") > 0), cos)
                     .alias("cosine"))
            .orderBy("label_a", "label_b"))


def knn_hubness(emb: DataFrame, k: int = 3, vec_col: str = "embedding",
                id_col: str = "vec_id", block_col: str = "label"
                ) -> DataFrame:
    """k-occurrence histogram — the hubness audit for an embedding
    space: how many vectors appear in exactly ``k_occurrence`` other
    vectors' k-NN lists. A healthy space is near-binomial around k; a
    hub-dominated one (the high-dimensional pathology that wrecks
    retrieval) shows a heavy right tail plus a mass of anti-hubs at
    zero — this table is how you see it before shipping an index.

    Rides :func:`knn_join` (blocked, Arrow matmul kernel), so the
    candidate join stays per-block; the in-degree count is one
    hash-agg on neighbor id, the zero-occurrence class is recovered by
    a left join from the id universe (anti-hubs are the diagnostic —
    dropping them would hide the pathology), and the histogram rollup
    is dashboard-sized. Exact integers end to end.
    """
    nn = knn_join(emb, k=k, vec_col=vec_col, id_col=id_col,
                  block_col=block_col)
    ind = (nn.groupBy(F.col("neighbor_id").alias("v"))
           .agg(F.count(F.lit(1)).cast("long").alias("k_occ")))
    allv = emb.select(F.col(id_col).alias("v"))
    occ = (allv.join(ind, "v", "left")
           .select(F.coalesce(F.col("k_occ"), F.lit(0)).cast("long")
                   .alias("k_occurrence")))
    return (occ.groupBy("k_occurrence")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
            .orderBy("k_occurrence"))


def twonn_intrinsic_dim(emb: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        block_col: str = "label") -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al. 2017) per
    block: ID = n / Σ ln(r2/r1) over each vector's two nearest
    neighbors — the one-number answer to "how many effective
    dimensions does this 64-dim embedding actually use", which decides
    PQ/SQ codebook sizes and whether an IVF index can work at all.

    Distances come from the blocked k-NN scores: for unit vectors
    r² = 2·(1−s), so ln(r2/r1) = ½·ln((1−s2)/(1−s1)) — evaluated on
    the 6-dp-rounded scores BOTH engines already agree on
    (knn_join's contract). Each vector's log term is quantized to the
    1e-6 grid and summed as BIGINT (the perplexity precedent:
    transcendentals on rational inputs never sit on grid boundaries);
    the emit is one double division of exact integers. Vectors whose
    nearest neighbor is exact (s1 = 1: duplicates, r1 = 0) or with
    only one neighbor are excluded from the MLE but still counted in
    ``n_vectors`` (the n_used/n_vectors gap reports them). Vectors in
    SINGLETON blocks never appear in the k-NN output at all and are
    dropped entirely — they show up in neither n_vectors nor n_used
    (the DuckDB oracle drops them identically); a block with one
    vector has no row in the result.
    """
    nn = knn_join(emb, k=2, vec_col=vec_col, id_col=id_col,
                  block_col=block_col)
    s = (nn.groupBy(F.col(id_col).alias("q"))
         .agg(F.max(F.when(F.col("nn_rank") == 1, F.col("score")))
              .alias("s1"),
              F.max(F.when(F.col("nn_rank") == 2, F.col("score")))
              .alias("s2")))
    lab = emb.select(F.col(id_col).alias("q"),
                     F.col(block_col).alias("g"))
    j = s.join(lab, "q")
    usable = (F.col("s1").isNotNull() & F.col("s2").isNotNull()
              & (F.col("s1") < 1.0))
    q = F.round(F.log((1.0 - F.col("s2")) / (1.0 - F.col("s1")))
                * 1e6, 0).cast("long")
    g = (j.groupBy("g")
         .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"),
              F.sum(usable.cast("long")).cast("long").alias("n_used"),
              F.sum(F.when(usable, q)).cast("long").alias("slog")))
    est = (2000000.0 * F.col("n_used").cast("double")
           / F.col("slog").cast("double"))
    return (g.select(F.col("g").alias(block_col), "n_vectors", "n_used",
                     F.when(F.col("slog") > 0, est).alias("twonn_dim"))
            .orderBy(block_col))


def jl_sign_matrix(in_dim: int, out_dim: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix for :func:`jl_distortion`:
    sign(i, j) = +1 iff the md5 of ``"i_j"`` is even — the same
    portable md5-parity both engines compute, evaluated ONCE here in
    Python (hashlib md5 == Spark md5 == DuckDB md5 on identical
    strings) so the Spark plan carries literals instead of 1024
    per-row md5 calls. The DuckDB oracle derives the matrix inline
    from md5 — agreeing outputs prove the derivation, not just the
    copy."""
    import hashlib

    def sign(i: int, j: int) -> int:
        h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    return [[sign(i, j) for i in range(in_dim)] for j in range(out_dim)]


def jl_distortion(emb: DataFrame, in_dim: int = 64, out_dim: int = 16,
                  vec_col: str = "embedding", id_col: str = "vec_id"
                  ) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit: project vector
    DIFFERENCES through a deterministic ±1/√k matrix and histogram the
    squared-norm ratio ‖P(x−y)‖²/k ÷ ‖x−y‖² over a linear-sized pair
    sample (consecutive ids — one keyed self-join, never all pairs).
    The table answers "how much does a k-dim sketch distort distances
    on THIS corpus" before committing an ANN index to the sketch.

    Exactness: per-pair differences are quantized to the 1e-6 grid as
    BIGINTs (the grid cancels in the ratio), each projected coordinate
    is an exact integer dot product with the ±1 matrix
    (:func:`jl_sign_matrix`), and the decile bucket is INTEGER
    arithmetic — (10·Σp²) div (k·Σq²) — so no float ever decides a
    bucket boundary. Headroom: |q| ≤ ~2e6 ⇒ p² ≤ ~2.6e16, 10·Σp²
    ≤ ~4e18 < int64 at 64→16 dims; re-grid to 1e-5 beyond 256 input
    dims. min/max ratios are order-independent doubles of exact
    integers.
    """
    signs = jl_sign_matrix(in_dim, out_dim)
    a = emb.select(F.col(id_col).alias("ida"),
                   as_double(vec_col).alias("va"))
    b = emb.select((F.col(id_col) - 1).alias("ida"),
                   as_double(vec_col).alias("vb"))
    pairs = a.join(b, "ida")
    q = F.transform(
        F.zip_with("va", "vb", lambda x, y: x - y),
        lambda d: F.round(d * 1e6, 0).cast("long"))
    p = pairs.select("ida", q.alias("q"))
    sq = F.aggregate("q", F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    pjs = [
        F.aggregate(
            F.zip_with("q", F.lit(signs[j]),
                       lambda qi, s: qi * s.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x).alias(f"p{j}")
        for j in range(out_dim)]
    r = p.select("ida", sq.alias("sq"), *pjs)
    spj = r.select(
        "ida", "sq",
        sum((F.col(f"p{j}") * F.col(f"p{j}") for j in range(out_dim)),
            start=F.lit(0).cast("long")).alias("spj"))
    kept = spj.filter(F.col("sq") > 0)
    ratio = (F.col("spj").cast("double")
             / (float(out_dim) * F.col("sq").cast("double")))
    bucket = F.expr(f"(10 * spj) div ({out_dim} * sq)")
    h = (kept.select(bucket.cast("long").alias("ratio_decile"),
                     ratio.alias("ratio"))
         .groupBy("ratio_decile")
         .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
              F.min("ratio").alias("min_ratio"),
              F.max("ratio").alias("max_ratio")))
    return h.orderBy("ratio_decile")


def isotropy_profile(emb: DataFrame, vec_col: str = "embedding",
                     grid: int = 10_000) -> DataFrame:
    """Embedding-space isotropy audit: the min/max per-dimension
    variance ratio across ALL dimensions (1.0 = perfectly isotropic on
    the diagonal; a tiny ratio means a few dominant directions carry
    the space — cosine similarities then collapse toward the dominant
    axes, the classic anisotropy pathology of contextual embeddings).
    The whole-space summary on top of
    :func:`dimension_variance_profile`'s per-dimension top-k.

    One row: (n_vectors, n_dims, dead_dims, min_var_dim, max_var_dim,
    var_ratio). Exactness: components quantized to the 1/``grid``
    integer grid, per-dim (n, Σq, Σq²) exact BIGINTs, dimension
    selection on the INTEGER variance numerator n·Σq² − (Σq)² with
    ties to the smaller dim (min/max over (numerator, dim) structs —
    one aggregate, no sort), and var_ratio is ONE double division of
    the two numerators at emit (the n·(n−1)·grid² denominators
    cancel). dead_dims counts zero-numerator dimensions. Headroom as
    dimension_variance_profile: re-grid past ~1e4 vectors.

    Shape: posexplode → one (dim)-keyed aggregate → one 1-row global
    aggregate. Dims bound everything after the scan.
    """
    q = (emb.select(F.posexplode(as_double(vec_col)).alias("dim", "x"))
         .select("dim", F.round(F.col("x") * grid, 0).cast("long")
                 .alias("q")))
    g = (q.groupBy("dim")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("q").cast("long").alias("s"),
              F.sum(F.col("q") * F.col("q")).cast("long").alias("ss")))
    # pinned: three consumers (the global aggregate, the max-numerator
    # scalar, and the max-dim resolve) — un-pinned each would rescan
    # the embeddings; the frame itself is dims-cardinality
    d = pin(g.select("dim", "n",
                     (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                     .cast("long").alias("vn")))
    # min side: struct min over (vn, dim) resolves equal numerators to
    # the smaller dim directly
    out = d.agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.sum(F.when(F.col("vn") == 0, 1).otherwise(0))
        .cast("long").alias("dead_dims"),
        F.min(F.struct("vn", "dim")).alias("_mn"))
    # max side: equal numerators must ALSO pick the smaller dim, and a
    # struct max on (vn, dim) would pick the larger — resolve the max
    # dim with a second pass over the (dims-cardinality) table instead
    mx = d.agg(F.max("vn").alias("_v"))
    maxdim = (d.join(F.broadcast(mx), d["vn"] == mx["_v"])
              .agg(F.min("dim").cast("long").alias("max_var_dim"),
                   F.max("vn").cast("long").alias("_maxvn")))
    ratio = F.when(F.col("_maxvn") > 0,
                   F.col("_mn.vn").cast("double")
                   / F.col("_maxvn").cast("double"))
    return (out.crossJoin(F.broadcast(maxdim))  # 1-row scalar join
            .select("n_vectors", "n_dims", "dead_dims",
                    F.col("_mn.dim").cast("long").alias("min_var_dim"),
                    "max_var_dim", ratio.alias("var_ratio")))


def matryoshka_recall_at_k(vectors: DataFrame,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id", k: int = 10,
                           query_id: int = 0,
                           prefixes: Sequence[int] = (4, 8, 16)
                           ) -> DataFrame:
    """Matryoshka (truncation) retrieval check: recall@k of brute-force
    cosine search over the FIRST ``m`` dimensions against the full-dim
    exact search, one row per prefix length — the measurement behind
    "can we serve the 16-dim head of this embedding and keep recall".
    :func:`sq_recall_at_k`'s sibling along the dimension axis instead
    of the precision axis.

    Both rankings order by (6-dp-rounded cosine, id) — a total order —
    with TakeOrdered limit-sorts; the truncated side slices the array
    BEFORE the fold, so the cosine is the genuine m-dim one. One
    brute-force scan per prefix plus one for the exact baseline, each
    a codegen'd projection + top-k — no shuffle wider than k rows.
    """
    v = vectors.select(F.col(id_col).alias("vid"),
                       as_double(vec_col).alias("x"))

    def topk(frame: DataFrame) -> DataFrame:
        q = (frame.filter(F.col("vid") == query_id)
             .select(F.col("x").alias("qv")))
        return (frame.crossJoin(F.broadcast(q))  # 1-row scalar join
                .select("vid", F.round(cosine(F.col("x"), F.col("qv")),
                                       6).alias("s"))
                .orderBy(F.col("s").desc(), "vid").limit(k)
                .select("vid"))

    exact = pin(topk(v))
    parts = []
    for m in prefixes:
        tr = v.select("vid", F.slice("x", 1, int(m)).alias("x"))
        hits_df = topk(tr).withColumn("h", F.lit(1))
        hits = F.sum(F.coalesce("h", F.lit(0)))
        parts.append(
            exact.join(hits_df, "vid", "left")
            .agg(F.lit(int(m)).cast("long").alias("prefix_dims"),
                 F.count(F.lit(1)).cast("long").alias("n_exact"),
                 hits.cast("long").alias("n_hits"),
                 F.round(hits / F.count(F.lit(1)), 6).alias("recall")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("prefix_dims")


def sign_recall_at_k(vectors: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10,
                     query_id: int = 0) -> DataFrame:
    """One-bit (sign) quantization retrieval check: rank by Hamming
    AGREEMENT between sign patterns (component ≥ 0 → 1) and report
    recall@k against the exact cosine ranking — the cheapest
    quantization on the ladder (64 dims → 64 bits) and the floor the
    int8 (:func:`sq_recall_at_k`) and Matryoshka
    (:func:`matryoshka_recall_at_k`) variants are judged against.
    Unlike :func:`lsh_topk` (random anchor projections, a candidate
    FILTER), this scores the full vector's own sign pattern as the
    similarity itself.

    Agreement counting is pure integer (a zip_with of sign matches
    summed as BIGINT; ties by id), so the quantized ranking is exact
    by construction; the baseline cosine rounds to 6 dp as everywhere.
    One codegen'd projection + two top-k limit-sorts + one k-row join.
    """
    v = vectors.select(F.col(id_col).alias("vid"),
                       as_double(vec_col).alias("x"))
    q = (v.filter(F.col("vid") == query_id)
         .select(F.col("x").alias("qv")))
    va = v.crossJoin(F.broadcast(q))  # 1-row scalar join
    agree = F.aggregate(
        F.zip_with("x", "qv",
                   lambda a, b: ((a >= 0) == (b >= 0)).cast("long")),
        F.lit(0).cast("long"), lambda acc, e: acc + e)
    sgn = (va.select("vid", agree.alias("a"))
           .orderBy(F.col("a").desc(), "vid").limit(k)
           .select("vid").withColumn("h", F.lit(1)))
    exact = (va.select("vid", F.round(cosine(F.col("x"), F.col("qv")),
                                      6).alias("s"))
             .orderBy(F.col("s").desc(), "vid").limit(k)
             .select("vid"))
    hits = F.sum(F.coalesce("h", F.lit(0)))
    return (exact.join(sgn, "vid", "left")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact"),
                 hits.cast("long").alias("n_sign_hits"),
                 F.round(hits / F.count(F.lit(1)), 6).alias("recall")))


SIL_GRID = 1_000_000  # 1e-6 grid for per-vector silhouette terms


def simplified_silhouette(vectors: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          label_col: str = "label") -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each
    vector, a = distance to its OWN label centroid, b = distance to
    the nearest OTHER centroid, s = (b − a)/max(a, b); report the
    per-label mean — the clustering-quality number curation reads
    before trusting label-stratified sampling (full silhouette is
    O(n²); the centroid form is the standard linear-time surrogate
    and ranks clusters identically in practice).

    Exactness: centroids are exact integer micro vectors (half-away
    mean of 1e-6-quantized coordinates — the embedding_outliers
    kernel); squared distances are exact BIGINT micro² sums; a and b
    are IEEE sqrt of exact integers (correctly rounded, engine-
    identical); each s is quantized to the 1e-6 grid and the
    per-label mean is Σs/n — ONE double division of exact integers.
    s = 0 when a = b = 0 (a vector ON both centroids) and for
    SINGLETON labels (the standard convention: a size-1 cluster has
    zero cohesion evidence, and its a = 0 would otherwise score a
    perfect 1 exactly for the noise labels the metric should
    penalize — round-12 review finding). Headroom:
    d² ≤ dim·(2e6·max|x|)² — int64-safe through |x| ≲ 1e2 at dim 64.

    Shape at 100 TB: explode → one (label, dim) hash-agg for the
    |labels|·dim centroid table (broadcast), one broadcast join
    fanning each vector over |labels| centroids, two hash-aggs back
    down — no pairwise work anywhere.
    """
    from .windows import int_mean_half_away
    x = (vectors.select(F.col(id_col).alias("vid"),
                        F.col(label_col).alias("lbl"),
                        F.posexplode(as_double(vec_col))
                        .alias("j", "xv"))
         .select("vid", "lbl", "j",
                 F.round(F.col("xv") * 1e6, 0).cast("long").alias("x")))
    cent = (x.groupBy(F.col("lbl").alias("clbl"), "j")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .select("clbl", "j",
                    int_mean_half_away(F.col("sx"), F.col("n"))
                    .alias("c")))
    d2 = (x.join(F.broadcast(cent), "j")
          .groupBy("vid", "lbl", "clbl")
          .agg(F.sum((F.col("x") - F.col("c"))
                     * (F.col("x") - F.col("c"))).alias("d2")))
    per = (d2.groupBy("vid", "lbl")
           .agg(F.max(F.when(F.col("lbl") == F.col("clbl"),
                             F.col("d2"))).alias("a2"),
                F.min(F.when(F.col("lbl") != F.col("clbl"),
                             F.col("d2"))).alias("b2")))
    lsz = (vectors.groupBy(F.col(label_col).alias("lbl"))
           .agg(F.count(F.lit(1)).cast("long").alias("lsz")))
    per = per.join(F.broadcast(lsz), "lbl")
    a = F.sqrt(F.col("a2").cast("double"))
    b = F.sqrt(F.col("b2").cast("double"))
    s6 = (F.when(F.col("lsz") == 1, F.lit(0))
          .when((F.col("a2") == 0) & (F.col("b2") == 0), F.lit(0))
          .otherwise(F.round((b - a) / F.greatest(a, b) * SIL_GRID, 0))
          .cast("long"))
    scored = per.filter(F.col("b2").isNotNull()).select("lbl", s6.alias("s6"))
    return (scored.groupBy(F.col("lbl").alias(label_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 (F.sum("s6").cast("double")
                  / (F.count(F.lit(1)).cast("double") * SIL_GRID))
                 .alias("mean_silhouette"))
            .orderBy(label_col))


def brute_force_l2_topk(emb: DataFrame, query_vec: list[float],
                        k: int = 10, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Exact squared-L2 top-k — the ground truth PQ-ADC approximates
    (ADC estimates L2, not cosine, so the PQ tuning sweep must grade
    against the same metric). Distance rounded to 6 dp with an id
    tie-break; distributed top-k (TakeOrderedAndProject)."""
    q = _query_col(query_vec)
    d2 = F.aggregate(
        F.zip_with(as_double(vec_col), q, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (emb.select(F.col(id_col), F.round(d2, 6).alias("l2_dist"))
            .orderBy("l2_dist", id_col)
            .limit(k))


def pq_m_sweep(emb: DataFrame, query_vec: list[float], k: int = 10,
               ms: Sequence[int] = (2, 4, 8), dim: int = 64,
               every: int = 40, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Recall@k of PQ-ADC as a FUNCTION of the sub-space count ``m`` —
    the third tuning sweep beside ivf_recall_sweep (nprobe) and
    dedup.lsh_band_sweep (bands): more sub-spaces = finer quantization
    = higher recall but m lookups per scored vector, and the knee is
    the operating point. One row per m: (m, sub_dim, k, n_hits,
    recall), exact against the brute-force squared-L2 ground truth.

    Shared across the sweep: the scan + posexplode of the corpus onto
    its flat dimension index (pin_cut — every config and the ground
    truth read the materialized n·dim-row base) and the flat-indexed
    sampled codebook (m-independent: the (sub, j) split is just
    i0 div/mod sub_d). What legitimately repeats per m is the
    residual join + per-(vector, sub) aggregation — each m GROUPS the
    residuals differently, and materializing the joint per-(vector,
    dim, codeword) residual table to share it would write
    |codebook|-times more rows than the source. Offline index-tuning
    read, not a serving path.
    """
    from .pinned import pin_cut
    ms = sorted({int(m) for m in ms})
    if not ms:
        raise ValueError("pq_m_sweep: ms must be non-empty")
    for m in ms:
        if dim % m != 0:
            raise ValueError(f"m={m} does not divide dim={dim}")
    ex = pin_cut(_flat_explode(emb, vec_col, id_col))
    cbex = (ex.filter(F.col(id_col) % every == 0)
            .select(F.col(id_col).alias("cid"), "i0",
                    F.col("x").alias("c")))
    spark = emb.sparkSession
    qx = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(query_vec)],
        "i0 int, x double")
    # exact squared-L2 ground truth from the same pinned base
    exact = (ex.join(F.broadcast(qx.select("i0",
                                           F.col("x").alias("qx"))), "i0")
             .groupBy(id_col)
             .agg(F.round(F.sum((F.col("x") - F.col("qx")) ** 2), 6)
                  .alias("l2"))
             .orderBy("l2", id_col).limit(k).select(id_col))
    rows = []
    for m in ms:
        top = _pq_adc_topk_flat(ex, cbex, qx, k, dim // m, id_col)
        rows.append(
            top.join(F.broadcast(exact), id_col, "left_semi")
            .agg(F.lit(m).cast("long").alias("m"),
                 F.lit(dim // m).cast("long").alias("sub_dim"),
                 F.lit(int(k)).cast("long").alias("k"),
                 F.count(F.lit(1)).cast("long").alias("n_hits"),
                 F.round(F.count(F.lit(1)) / float(k), 6).alias("recall")))
    out = rows[0]
    for extra in rows[1:]:
        out = out.unionByName(extra)
    return out.orderBy("m")
