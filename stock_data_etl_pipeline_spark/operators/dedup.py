"""Deduplication operators for training-data pipelines.

Five families, each expressed relationally (explode/join/groupBy) rather
than pairwise-loop, so cost scales with (docs x shingles) and candidate
pairs — never O(n^2) over the corpus:

- exact:        hash-groupBy on raw text (or md5)
- fingerprint:  order/dup-insensitive token-set hash
- ngram-jaccard: inverted index on k-word shingles -> pair intersection
                 counts -> Jaccard >= tau
- minhash-LSH:  per-doc minhash signature (md5-based, deterministic),
                banded; candidates collide on a band -> verify true Jaccard
- simhash:      per-bit majority hash; near-dups = small Hamming distance,
                blocked on signature bytes to avoid O(n^2)
- embedding:    cosine >= tau within blocking buckets

Scale notes: the inverted-index join is the canonical web-dedup shape
(MinHash/LSH from Broder '97; SimHash from Charikar '02 as used by
Manku et al. WWW'07). Hot shingles (stop-phrases) explode the join —
``max_doc_freq`` drops shingles seen in more than N docs, the standard
frequency cap. All hashing is md5-derived -> deterministic across engines
and runs (no seed state on executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    shingle_hashes_from_word_hashes,
    shingles,
    shingles_from_words,
    word_hashes,
    words,
)
from ..functions.vectors import as_double, cosine
from .pinned import pin, pin_cut


# -- exact ------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact text; adds ``dup_count``.
    One hash-aggregation — the 100 TB-safe exact dedup."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


def fingerprint_dedup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-exact dedup on the sorted-distinct-token fingerprint (word
    order / duplication changes collide)."""
    return (docs.groupBy(fingerprint(text_col).alias("fp"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


# -- n-gram Jaccard ---------------------------------------------------------

def shingle_index(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  max_doc_freq: int | None = None) -> DataFrame:
    """Inverted index: (shingle, doc_id), distinct. ``max_doc_freq`` drops
    shingles appearing in more than N docs (hot-key cap)."""
    # hash-based index: shingles are 31-bit polynomial hashes of word
    # hashes (one md5 per TOKEN), so no shingle strings are built and the
    # self-join shuffles 8-byte keys. Staged projections per the
    # multi-reference alias rule (see minhash_signature).
    # No .distinct() after the explode (round-15, guide §2.4): the
    # shingle-hash array is already array_distinct PER DOC (see
    # shingle_hashes_from_word_hashes), and doc_id differs across
    # docs, so (doc_id, shingle) rows are unique by construction — the
    # former distinct was a full index-scale exchange deduping
    # already-unique rows, paid by every caller (jaccard/containment/
    # similarity-histogram cut writes, both contamination sides).
    idx = (docs.select(F.col(id_col), words(text_col).alias("_ws"))
           .select(F.col(id_col), word_hashes("_ws").alias("_wh"))
           .select(F.col(id_col),
                   F.explode(shingle_hashes_from_word_hashes("_wh", k))
                   .alias("shingle")))
    if max_doc_freq is not None:
        hot = (idx.groupBy("shingle").count()
               .filter(F.col("count") > max_doc_freq).select("shingle"))
        idx = idx.join(hot, "shingle", "left_anti")
    return idx


def ngram_jaccard_pairs(docs: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-set Jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from the inverted
    index: only docs sharing >=1 shingle ever meet (candidate generation is
    the index self-join, not a cross join).
    """
    # the index is referenced three times below (both join sides + sizes);
    # shingle construction is the expensive projection (interpreted HOFs),
    # so materialize it once — at scale this is the "write the shingle
    # table" step every real dedup pipeline has
    idx = pin_cut(shingle_index(docs, text_col, id_col, k, max_doc_freq))
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") /
                (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# -- MinHash + LSH ----------------------------------------------------------

MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne); a*v+b stays < 2^62


def minhash_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a_i, b_i), shared verbatim
    by the SQL oracle generator."""
    p = MINHASH_PRIME
    return [(((2654435761 * (i + 1)) % p) | 1, (40503 * (i + 7)) % p)
            for i in range(num_hashes)]


def minhash_signature(docs: DataFrame, num_hashes: int = 16,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3) -> DataFrame:
    """(id, mh_0..mh_{H-1}): per-doc minhash under a universal hash family
    h_i(v) = (a_i*v + b_i) mod p over v = int(md5(shingle)[:15hex]) — ONE
    md5 pass per shingle, then pure bigint arithmetic per hash function
    (the md5-per-hash variant was 5x slower). Deterministic, seedless,
    portable to ANSI SQL.

    Staged projections (words -> shingles -> base hash -> minhashes) keep
    each expensive array expression evaluated once per row: CollapseProject
    refuses to inline non-cheap multi-referenced aliases.
    """
    p = MINHASH_PRIME
    # filter on word count, NOT on the shingle array:
    # PushPredicateThroughProject rewrites a filter over a projected alias
    # into the alias' full expression below the project, which would
    # re-evaluate the expensive shingle construction once per reference
    w_df = (docs.select(F.col(id_col), words(text_col).alias("_ws"))
            .filter(F.size("_ws") >= k))
    hv_df = (w_df.select(F.col(id_col), word_hashes("_ws").alias("_wh"))
             .select(F.col(id_col),
                     shingle_hashes_from_word_hashes("_wh", k).alias("_hv")))
    def _hash_fn(a: int, b: int):
        return lambda v: (F.lit(a) * v + F.lit(b)) % F.lit(p)

    cols = [F.array_min(F.transform(F.col("_hv"), _hash_fn(a, b)))
            .alias(f"mh_{i}")
            for i, (a, b) in enumerate(minhash_constants(num_hashes))]
    return hv_df.select(F.col(id_col), *cols)


def _band_signature_array(num_hashes: int, bands: int) -> Column:
    """Banded signature encoding over mh_0..mh_{H-1} columns: one
    md5('|'-joined rows) per band, as an array for a single posexplode.
    THE single source of truth for the banding scheme — lsh_band_table
    (the persisted index), lsh_band_sweep (the tuning curve) and the
    SQL oracle generator all mirror this exact encoding; change it here
    and the sweep keeps measuring the index actually served."""
    rows = num_hashes // bands
    return F.array(*[
        F.md5(F.concat_ws(
            "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]))
        for b in range(bands)])


def lsh_band_table(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                   text_col: str = "text", id_col: str = "doc_id",
                   k: int = 3) -> DataFrame:
    """(id, band, sig): the banded-LSH collision table — the PERSISTABLE
    dedup index.  Stored (e.g. in a ManagedTable partitioned by band),
    it lets a new batch dedup against an existing corpus by probing
    (band, sig) without ever recomputing corpus signatures — see
    incremental_lsh_dedup.

    One scan: band signatures as an array column, posexploded — a
    bands-way union would recompute the (md5-heavy) minhash signature
    once per band."""
    assert num_hashes % bands == 0
    sig = minhash_signature(docs, num_hashes, text_col, id_col, k)
    return sig.select(
        F.col(id_col),
        F.posexplode(_band_signature_array(num_hashes, bands))
        .alias("band", "sig"))


def incremental_lsh_dedup(batch: DataFrame, corpus: DataFrame,
                          index: DataFrame, threshold: float,
                          num_hashes: int = 16, bands: int = 4,
                          text_col: str = "text", id_col: str = "doc_id",
                          k: int = 3) -> DataFrame:
    """Dedup a NEW batch against an already-indexed corpus plus itself,
    touching corpus text only for verification candidates.

    ``index`` is the corpus' stored band table (lsh_band_table output,
    typically read back from a ManagedTable) — the corpus' signatures
    are NOT recomputed.  Work scales with the batch: signatures for
    batch docs only, an equi-join probe of (band, sig) against the
    index, a batch-internal collision self-join, then exact-Jaccard
    verification restricted to candidate documents (corpus text is
    semi-joined down to the candidate ids before any tokenization).
    This is the arrival-time shape of corpus dedup at 100 TB: the full
    quadratic pass happens once, every later batch pays only
    batch-size work.  Pairs are (id_a < id_b, jaccard >= threshold),
    at least one side in the batch; no false positives survive.
    """
    nb = pin_cut(lsh_band_table(batch, num_hashes, bands,
                            text_col, id_col, k))
    probe = (nb.alias("n")
             .join(index.alias("o"), ["band", "sig"])
             .filter(F.col(f"n.{id_col}") != F.col(f"o.{id_col}"))
             .select(F.least(F.col(f"n.{id_col}"),
                             F.col(f"o.{id_col}")).alias("id_a"),
                     F.greatest(F.col(f"n.{id_col}"),
                                F.col(f"o.{id_col}")).alias("id_b")))
    a, b_ = nb.alias("a"), nb.alias("b")
    within = (a.join(b_, (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.sig") == F.col("b.sig"))
                     & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b")))
    cand = pin_cut(probe.unionByName(within).distinct())
    cand_ids = (cand.select(F.col("id_a").alias(id_col))
                .unionByName(cand.select(F.col("id_b").alias(id_col)))
                .distinct())
    docs_all = (batch.select(id_col, text_col)
                .unionByName(corpus.select(id_col, text_col)))
    docs_cand = docs_all.join(cand_ids, id_col, "left_semi")
    verified = ngram_jaccard_pairs(docs_cand, threshold, text_col, id_col, k)
    return cand.join(verified, ["id_a", "id_b"], "inner")


def minhash_lsh_pairs(docs: DataFrame, threshold: float,
                      num_hashes: int = 16, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3) -> DataFrame:
    """Banded LSH over the minhash signature: docs colliding on any band
    become candidates; candidates are verified with the TRUE shingle
    Jaccard >= threshold (no false positives leave this operator).

    bands * rows = num_hashes; collision prob ~ 1-(1-j^rows)^bands.
    """
    assert num_hashes % bands == 0
    bands_df = pin_cut(lsh_band_table(docs, num_hashes, bands,
                                  text_col, id_col, k))
    a, b_ = bands_df.alias("a"), bands_df.alias("b")
    cand = (a.join(b_, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    # verify ONLY docs that appear in some candidate pair — at scale the
    # candidate set is orders of magnitude smaller than the corpus, so the
    # exact-Jaccard pass never touches non-candidate documents. The pair
    # set is small by construction: persist it so the minhash/band stages
    # run once instead of once per downstream use.
    cand = pin_cut(cand)
    cand_ids = (cand.select(F.col("id_a").alias(id_col))
                .unionByName(cand.select(F.col("id_b").alias(id_col)))
                .distinct())
    docs_cand = docs.join(cand_ids, id_col, "left_semi")
    verified = ngram_jaccard_pairs(docs_cand, threshold, text_col, id_col, k)
    return cand.join(verified, ["id_a", "id_b"], "inner")


def lsh_band_sweep(docs: DataFrame, threshold: float = 0.5,
                   num_hashes: int = 12,
                   band_counts: tuple[int, ...] = (1, 2, 3, 4, 6),
                   text_col: str = "text", id_col: str = "doc_id",
                   k: int = 3) -> DataFrame:
    """Precision/recall of the banded-LSH candidate generator as a
    FUNCTION of the band count — the S-curve read before choosing a
    banding (more bands => steeper candidate growth => higher recall,
    lower precision; collision prob ~ 1-(1-j^rows)^bands). One row per
    band count: (bands, rows_per_band, n_cand, n_hit, n_exact,
    precision, recall), exact against the true shingle-Jaccard pair
    set — the MinHash twin of similarity.ivf_recall_sweep.

    Shared across the sweep (unlike calling minhash_lsh_pairs per
    config): ONE minhash signature pass (pin_cut — every config reads
    the same materialized signature table) and ONE exact-Jaccard
    ground-truth pass. Per config the only new work is the band
    hashing (cheap md5 over already-computed minhashes) and the
    collision self-join, whose size IS the quantity being measured.

    ``rows_per_band = 1`` configs are rejected: a single-minhash band
    buckets every document sharing one hot min-shingle, which is the
    quadratic-blowup shape the banding exists to avoid.
    """
    band_counts = sorted({int(b) for b in band_counts})
    if not band_counts:
        raise ValueError("lsh_band_sweep: band_counts must be non-empty")
    for b in band_counts:
        if num_hashes % b != 0:
            raise ValueError(f"band count {b} does not divide "
                             f"num_hashes={num_hashes}")
        if num_hashes // b < 2:
            raise ValueError(f"band count {b} gives rows_per_band=1 "
                             "(hot-shingle quadratic blowup)")
    sig = pin_cut(minhash_signature(docs, num_hashes, text_col, id_col, k))
    exact = pin_cut(
        ngram_jaccard_pairs(docs, threshold, text_col, id_col, k)
        .select("id_a", "id_b"))
    n_exact = exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    per_config = []
    for b in band_counts:
        rows = num_hashes // b
        bt = sig.select(F.col(id_col),
                        F.posexplode(_band_signature_array(num_hashes, b))
                        .alias("band", "bsig"))
        a, c = bt.alias("a"), bt.alias("b")
        cand = (a.join(c, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bsig") == F.col("b.bsig"))
                       & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
                .select(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b"))
                .distinct())
        hit = F.coalesce(F.col("h"), F.lit(0))
        per_config.append(
            cand.join(exact.withColumn("h", F.lit(1)),
                      ["id_a", "id_b"], "left")
            .agg(F.lit(b).cast("long").alias("bands"),
                 F.lit(rows).cast("long").alias("rows_per_band"),
                 F.count(F.lit(1)).cast("long").alias("n_cand"),
                 F.sum(hit).cast("long").alias("n_hit")))
    swept = per_config[0]
    for extra in per_config[1:]:
        swept = swept.unionByName(extra)
    # 1-row scalar broadcast (the repo's crossJoin-is-scalar pattern)
    return (swept.crossJoin(F.broadcast(n_exact))
            .select("bands", "rows_per_band",
                    # a config with zero candidates still emits its row:
                    # a global agg over empty input yields count=0 and
                    # sum=NULL, hence the n_hit coalesce
                    "n_cand",
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
                    .alias("n_hit"),
                    "n_exact",
                    F.round(F.when(F.col("n_cand") > 0,
                                   F.coalesce(F.col("n_hit"), F.lit(0))
                                   / F.col("n_cand")), 6)
                    .alias("precision"),
                    F.round(F.when(F.col("n_exact") > 0,
                                   F.coalesce(F.col("n_hit"), F.lit(0))
                                   / F.col("n_exact")), 6)
                    .alias("recall"))
            .orderBy("bands"))


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 16


def _word_hash16(w: Column) -> Column:
    """Deterministic 16-bit hash of a token: first 4 hex digits of md5,
    decoded positionally (portable to ANSI SQL via instr arithmetic)."""
    h = F.md5(w)
    hexdigits = "0123456789abcdef"
    val = F.lit(0)
    for i in range(4):
        digit = F.instr(F.lit(hexdigits), F.substring(h, i + 1, 1)) - 1
        val = val * 16 + digit
    return val


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: bit_j(doc) = majority over tokens of bit_j(h(token)).
    Near-duplicate docs differ in few bits (Charikar '02)."""
    ws = words(text_col)
    tok = docs.select(F.col(id_col), F.explode(ws).alias("w"))
    tok = tok.withColumn("h", _word_hash16(F.col("w")))
    aggs = [F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << j)) > 0, 1)
                  .otherwise(-1)).alias(f"b{j}")
            for j in range(SIMHASH_BITS)]
    per_doc = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0)
    for j in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0)
    return per_doc.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs within Hamming distance <= max_hamming, Manku-style
    block-and-verify (WWW'07): split the signature into max_hamming+1
    equal bit-blocks; by pigeonhole, any pair within distance d <=
    max_hamming agrees exactly on at least one block, so the equi-join on
    (block_index, block_value) has COMPLETE recall and is never all-pairs.
    Candidates are then verified with the exact Hamming distance."""
    n_blocks = max_hamming + 1
    assert SIMHASH_BITS % n_blocks == 0, (
        f"SIMHASH_BITS={SIMHASH_BITS} must divide into {n_blocks} blocks")
    width = SIMHASH_BITS // n_blocks
    mask = (1 << width) - 1
    sig = simhash(docs, text_col, id_col)
    # one scan, posexplode of the block array (vs an n_blocks-way union
    # recomputing the signature aggregation per block)
    block_arr = F.array(*[
        F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_blocks)])
    blocks = sig.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(block_arr).alias("part", "blk"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, (F.col("a.part") == F.col("b.part"))
                   & (F.col("a.blk") == F.col("b.blk"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.simhash").alias("sig_a"),
                    F.col("b.simhash").alias("sig_b"))
            .distinct())
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (cand.withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Production-width (64-bit) SimHash using xxhash64 token hashes —
    drastically fewer spurious collisions than the 16-bit oracle-portable
    variant; Spark-only (xxhash64 has no cross-engine twin)."""
    ws = words(text_col)
    tok = docs.select(F.col(id_col), F.explode(ws).alias("w"))
    tok = tok.withColumn("h", F.xxhash64("w"))
    aggs = [F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1)
                  .otherwise(-1)).alias(f"b{j}") for j in range(64)]
    per_doc = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(64):
        # shiftleft wraps bit 63 into the sign bit (1 << 63 would overflow
        # a Python->Spark long literal)
        bit = F.shiftleft(F.lit(1).cast("long"), j)
        sig = sig.bitwiseOR(F.when(F.col(f"b{j}") > 0, bit)
                            .otherwise(F.lit(0).cast("long")))
    return per_doc.select(F.col(id_col), sig.alias("simhash64"))


# -- embedding cosine -------------------------------------------------------

def embedding_near_dup_pairs(emb: DataFrame, threshold: float,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             block_col: str | None = "label") -> DataFrame:
    """Pairs with cosine >= threshold. ``block_col`` restricts candidate
    generation to equal-block pairs (e.g. an LSH bucket or cluster label) —
    the blocking that keeps this off O(n^2) at scale; pass None for the
    exhaustive small-corpus variant."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"),
                   *( [F.col(block_col)] if block_col else [] ))
    a, b = v.alias("a"), v.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    sim.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


# -- canonical selection ----------------------------------------------------

def canonical_keep(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   quality_col: str = "n_chars") -> DataFrame:
    """Per near-dup cluster, keep the single best document by
    ``quality_col`` (ties -> lowest id); documents in no pair are their
    own cluster and survive. The curation step AFTER pair generation:
    min-id keep is arbitrary, production pipelines keep the *best*
    member (longest / highest quality score) of each duplicate group.

    Cost: the pair-graph clustering (O(log diameter) label-propagation
    rounds over edges) + one window over docs partitioned by cluster —
    both shuffle-bounded, nothing driver-sized. Any pair source works
    (ngram Jaccard, MinHash-LSH, SimHash, embedding cosine)."""
    from pyspark.sql import Window

    from .clustering import cluster_near_dups
    clusters = cluster_near_dups(pairs)  # only docs that appear in a pair
    assigned = (docs.join(clusters, id_col, "left")
                .withColumn("cluster_id",
                            F.coalesce("cluster_id", F.col(id_col))))
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.col(quality_col).desc(), F.col(id_col).asc()))
    return (assigned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "cluster_id", quality_col))


def similarity_histogram(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5,
                         max_doc_freq: int | None = None) -> DataFrame:
    """Distribution of candidate-pair Jaccard similarities in 0.1
    buckets — the threshold-sweep report that decides WHERE to set a
    dedup cutoff before committing to one (run once, read the knee).

    Same inverted-index candidate generation as
    :func:`ngram_jaccard_pairs` (only docs sharing a shingle ever
    meet); the bucket is the EXACT integer quotient
    ``(10·|∩|) div |∪|`` — bucket 10 is identical shingle sets — so
    binning never touches a rounded float. One extra hash-agg over the
    pair list; candidate volume is the cost, shared with any dedup run.
    """
    idx = pin_cut(shingle_index(docs, text_col, id_col, k, max_doc_freq))
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("sz").alias("sz_b"))
    j = inter.join(sa, "id_a").join(sb, "id_b")
    bucket = F.expr("(10 * inter) div (sz_a + sz_b - inter)")
    return (j.select(bucket.cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .withColumn("jaccard_lo", F.col("bucket") / 10.0)
            .orderBy("bucket"))


def containment_pairs(docs: DataFrame, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 5,
                      max_doc_freq: int | None = None) -> DataFrame:
    """Asymmetric near-duplicate pairs by shingle CONTAINMENT:
    |A ∩ B| / min(|A|, |B|) ≥ threshold — catches a short document
    embedded inside a long one, which symmetric Jaccard dilutes
    toward 0 (the quote/excerpt/boilerplate-wrapper case every
    training-data dedup pass needs alongside Jaccard).

    Same inverted-index candidate generation as
    :func:`ngram_jaccard_pairs`; the score rides the exact integer
    grid ``(1e6·|∩|) div min(|A|,|B|)`` (non-negative operands, so
    truncating div == DuckDB ``//``), thresholded as an INTEGER
    comparison and divided once at emit.
    """
    idx = pin_cut(shingle_index(docs, text_col, id_col, k, max_doc_freq))
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("sz").alias("sz_b"))
    c6 = F.expr("(1000000 * inter) div least(sz_a, sz_b)")
    t6 = int(round(threshold * 1_000_000))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("c6", c6.cast("long"))
            .filter(F.col("c6") >= t6)
            .select("id_a", "id_b",
                    (F.col("c6") / 1e6).alias("containment"))
            .orderBy("id_a", "id_b"))


PREFIX_WORDS = 8  # leading-token prefix length for prefix-dup grouping


def prefix_dup_census(docs: DataFrame, text_col: str = "text",
                      n_words: int = PREFIX_WORDS) -> DataFrame:
    """Prefix-duplicate census: group documents on their first
    ``n_words`` tokens and report the size distribution of groups
    that share a prefix — the cheap detector for boilerplate openings
    and template-generated docs (crawl corpora are full of both) that
    full-text dedup misses when tails diverge.

    One hash-agg over a projected prefix key, then a census over the
    group-size MATRIX; exact counts only, scale-safe at any corpus
    size (the prefix key bounds the group key cardinality).
    """
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    prefix = F.array_join(F.slice(ws, 1, n_words), " ")
    groups = (docs.select(prefix.alias("prefix"))
              .groupBy("prefix")
              .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
              .filter(F.col("group_size") >= 2))
    return (groups.groupBy("group_size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum("group_size").cast("long").alias("n_docs"))
            .orderBy("group_size"))


EDIT_DIST_MAX = 150  # near-dup acceptance threshold (chars)
EDIT_DIST_BLOCK_CAP = 64  # max docs per block entering the pair join


def edit_distance_report(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         max_dist: int = EDIT_DIST_MAX,
                         block_cap: int = EDIT_DIST_BLOCK_CAP) -> DataFrame:
    """Block-keyed Levenshtein near-dup report per language with a
    HARD per-block size bound: candidate pairs come ONLY from
    (lang, source, n_chars//8) blocks (docs in different languages/
    sources or with length gaps can't be cheap edits of each other),
    and a block larger than ``block_cap`` never enters the pair join
    at all — its pair mass is counted ARITHMETICALLY (C(bsz,2) from a
    single hash-agg of block sizes) and reported as skipped. One hot
    block — millions of near-equal-length docs from one template-heavy
    source — therefore costs one agg row, not a quadratic join; the
    same doc-frequency-cap principle as the shingle index above
    (``ngram_jaccard_dedup``), applied to the block key.

    No window/rank anywhere: the cap is enforced by joining docs to
    the size relation (hash join on the block key), so a hot block
    never serializes into one task either.

    Round-14 note (measured, kept as-is): a collect_list-per-block +
    double-explode pair generator (one text shuffle instead of two, one
    scan fewer) was built and benched — it REGRESSED 3.2 s -> 6.1 s at
    sf0.1 because the grouped relation's shuffle is only a few MB, AQE
    coalesces it to ~2 partitions, and the Levenshtein compute (whose
    cost is invisible to byte-based coalescing) serializes; the
    self-join spreads pair evaluation across the full hash-partition
    fan-out. Re-shuffling exploded pair texts to recover parallelism
    would move bsz-amplified bytes — worse than the 2x doc shuffle at
    any scale. The join shape stands (guide §1.1: measure, keep the
    empirical winner).

    Per language: total candidate-pair count (arithmetic — exact even
    for skipped blocks), pairs evaluated / blocks skipped / pairs
    skipped (the audit triple), near-dups within ``max_dist`` among
    evaluated pairs, min distance and quotient-grid mean
    (``(1e6·Σd) div n``) over evaluated pairs, and the cap itself so
    downstream readers can interpret the audit columns.
    """
    # null block keys are excluded up front: the census groupBy would
    # keep NULL keys while the inner pair join drops them, so leaving
    # them in would overstate n_pairs_evaluated for null-key docs —
    # the audit must count exactly what the join can see
    d = (docs.filter(F.col("lang").isNotNull()
                     & F.col("source").isNotNull()
                     & F.col("n_chars").isNotNull())
         .select(id_col, "lang", "source",
                 F.expr("n_chars div 8").alias("lb"),
                 F.col(text_col).alias("t")))
    # pinned: two consumers (census agg + the cap filter join) would
    # otherwise each recompute the docs scan + hash-agg
    sizes = pin(d.groupBy("lang", "source", "lb")
                .agg(F.count(F.lit(1)).cast("long").alias("bsz")))
    census = sizes.groupBy("lang").agg(
        F.sum(F.expr("bsz * (bsz - 1) div 2"))
        .cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("bsz") <= block_cap,
                     F.expr("bsz * (bsz - 1) div 2")).otherwise(F.lit(0)))
        .cast("long").alias("n_pairs_evaluated"),
        F.sum(F.when(F.col("bsz") > block_cap, 1).otherwise(0))
        .cast("long").alias("n_blocks_skipped"),
        F.sum(F.when(F.col("bsz") > block_cap,
                     F.expr("bsz * (bsz - 1) div 2")).otherwise(F.lit(0)))
        .cast("long").alias("n_pairs_skipped"))
    small = d.join(
        sizes.filter(F.col("bsz") <= block_cap)
        .select("lang", "source", "lb"),
        on=["lang", "source", "lb"], how="inner")
    a, b = small.alias("a"), small.alias("b")
    # the Levenshtein is computed AFTER a deterministic pair-key
    # repartition, not on the join output directly: the join's output
    # partitioning is the block key, and AQE's byte-based coalescing
    # sees only a few MB of pair rows — at sf0.1 it coalesced ALL
    # pairs into ONE partition, serializing the entire O(len_a·len_b)
    # distance compute (measured: 2.9 s -> 0.7 s noop at sf0.1 with
    # the spread). The explicit partition count (compute-bound, so
    # sized to task slots, not bytes) keeps AQE from re-coalescing;
    # the key is the id pair — deterministic under task retry (guide
    # §2.5: never rand()) and uniform because no id pair repeats.
    n_spread = 2 * docs.sparkSession.sparkContext.defaultParallelism
    pairs = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                    & (F.col("a.source") == F.col("b.source"))
                    & (F.col("a.lb") == F.col("b.lb"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col("a.lang").alias("lang"),
                     F.col(f"a.{id_col}").alias("ia"),
                     F.col(f"b.{id_col}").alias("ib"),
                     F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
             .repartition(n_spread, F.col("ia"), F.col("ib"))
             .select("lang", F.levenshtein(F.col("ta"), F.col("tb"))
                     .cast("long").alias("dist")))
    stats = pairs.groupBy("lang").agg(
        F.sum(F.when(F.col("dist") <= max_dist, 1).otherwise(0))
        .cast("long").alias("n_near_dup"),
        F.min("dist").cast("long").alias("min_distance"),
        F.sum("dist").cast("long").alias("sum_distance"))
    mean = F.expr("(1000000 * sum_distance) div n_pairs_evaluated") / 1e6
    return (census.join(stats, on="lang", how="left")
            .filter(F.col("n_candidate_pairs") > 0)
            .select("lang", "n_candidate_pairs", "n_pairs_evaluated",
                    "n_blocks_skipped", "n_pairs_skipped",
                    F.coalesce(F.col("n_near_dup"), F.lit(0))
                    .cast("long").alias("n_near_dup"),
                    "min_distance",
                    F.when(F.col("n_pairs_evaluated") > 0, mean)
                    .alias("mean_distance"),
                    F.lit(block_cap).cast("long").alias("block_cap"))
            .orderBy("lang"))
