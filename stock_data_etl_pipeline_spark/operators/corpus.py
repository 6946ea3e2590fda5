"""Corpus-statistics operators for training-data pipelines: vocabulary,
n-gram counts, TF-IDF, deterministic sampling, benchmark contamination,
PII redaction.

The ops a data-curation team runs across a 100 TB corpus besides dedup
(operators/dedup.py) and quality scoring (functions/text.py). All pure
Column expressions + hash-partitioned aggregations — no Python in the hot
path, every aggregation map-side-combinable:

- vocab_top_terms:       explode -> groupBy(term) -> TakeOrdered top-N
- bigram_counts:         adjacent-pair expansion, same aggregation shape
- tfidf_top_terms:       tf x ln(N/df), top-k per doc (partitioned window)
- deterministic_sample:  md5-bucket sampling — reproducible across runs,
                         engines and corpus growth (doc keeps its bucket)
- contamination_overlap: share of a doc's shingles appearing in a
                         benchmark corpus (train/test leakage check),
                         via the same hashed inverted index as dedup
- redact_pii:            email/phone masking as regexp_replace (codegen)

Reference parity: the reference has no corpus tooling (it is a stock ETL
service); these extend the engine for the LLM-data workload the brief
names as first-class. Oracles live in plans/catalog_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import words
from .dedup import shingle_index
from .pinned import pin

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"


def vocab_top_terms(docs: DataFrame, n: int = 100,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The n most frequent terms: (term, tf, df) ordered by tf desc, term.
    One explode + one partial-aggregated groupBy; the top-N is
    TakeOrderedAndProject (no global sort materializes the full vocab)."""
    tok = docs.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    agg = (tok.groupBy("term")
           .agg(F.count(F.lit(1)).alias("tf"),
                F.countDistinct(id_col).alias("df")))
    return agg.orderBy(F.col("tf").desc(), "term").limit(n)


def bigram_counts(docs: DataFrame, min_count: int = 2,
                  text_col: str = "text") -> DataFrame:
    """Adjacent word-pair frequencies >= min_count (the n-gram LM /
    collocation counting shape). The pair expansion is a per-row array
    transform — no join, no extra shuffle beyond the count."""
    ws = words(text_col)
    pairs = F.expr(
        "transform(sequence(0, size(_ws) - 2), "
        "i -> concat(_ws[i], ' ', _ws[i+1]))")
    tok = (docs.select(ws.alias("_ws"))
           .filter(F.size("_ws") >= 2)
           .select(F.explode(pairs).alias("bigram")))
    return (tok.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .orderBy(F.col("n").desc(), "bigram"))


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k terms per doc by tf * ln(N/df). The corpus size N stays a
    lazy broadcast scalar (no driver action), df comes from the same
    doc-term aggregate as tf, and the per-doc top-k is a partitioned
    window — every stage scales with (docs x terms)."""
    tok = docs.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    # persisted: tf feeds BOTH the df aggregate and the scored join —
    # without it the tokenize+explode+groupBy pipeline runs twice
    tf = pin(tok.groupBy(id_col, "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = (docs.filter(F.size(words(text_col)) > 0)
          .agg(F.count(F.lit(1)).alias("n_docs")))
    # NO broadcast hint on df_: the vocabulary is unbounded at corpus
    # scale (100M+ terms), so forcing a broadcast is a scale trap — AQE
    # broadcasts it at small SF and shuffle-joins on term when it's big
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(nd))
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.col("n_docs")
                                      / F.col("df").cast("double")), 6)))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "term")
    return (scored.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= k)
            .select(id_col, "term", "tf", "score", "rn"))


def sample_bucket(id_col: Column | str) -> Column:
    """Deterministic 0..99 bucket from md5 of the id — the reproducible,
    engine-portable sampling key (a doc never changes bucket, so samples
    are stable as the corpus grows)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
            .cast("long") % 100)


def deterministic_sample(docs: DataFrame, pct: int = 10,
                         id_col: str = "doc_id") -> DataFrame:
    """~pct% hash-sample of the corpus. Unlike rand()-based sampling this
    is reproducible across runs/engines and composable (the 10% sample is
    a subset of the 20% sample)."""
    return docs.filter(sample_bucket(id_col) < pct)


def stratified_sample(docs: DataFrame, strata: dict[str, int],
                      strata_col: str = "lang",
                      id_col: str = "doc_id",
                      default_pct: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing shape
    (e.g. keep 100% of low-resource languages, 10% of English). Same md5
    bucket as deterministic_sample, so per-stratum samples stay
    reproducible and nested; strata absent from ``strata`` get
    ``default_pct``. Pure Column expression: the rate lookup is a literal
    when-chain, no join."""
    rate = F.lit(default_pct)
    for value, pct in sorted(strata.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return docs.filter(sample_bucket(id_col) < rate)


def exact_n_per_stratum(docs: DataFrame, n: int,
                        strata_col: str = "lang",
                        id_col: str = "doc_id") -> DataFrame:
    """EXACTLY min(n, stratum size) docs per stratum, chosen by md5-hash
    rank — the fixed-budget companion to stratified_sample's percentage
    rates ("give me 10k eval docs per language"). Hash order makes the
    pick reproducible across runs/engines AND stable under corpus
    growth: a selected doc stays selected until n better-ranked hashes
    arrive in its stratum. One partitioned row_number window — the
    standard distributed top-n-per-group, no global sort."""
    from pyspark.sql import Window
    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(rank_key, id_col)
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def contamination_overlap(docs: DataFrame, bench: DataFrame, k: int = 5,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-doc benchmark contamination: the fraction of the doc's distinct
    k-word shingles that appear anywhere in ``bench`` (the train-on-test
    leakage check run before an LLM training job). Docs shorter than k
    words have no shingles and emit no row.

    Shape: hashed inverted index (8-byte keys) on both sides, distinct
    benchmark shingle set, ONE marked left join + ONE groupBy — sz and
    n_hit come out of the same aggregation, so the doc index is scanned
    once (a semi-join + separate size count would tokenize/hash/distinct
    the whole corpus twice and add a shuffle).  The benchmark side is
    the small one at scale, so the join broadcasts or buckets on
    shingle."""
    idx = shingle_index(docs, text_col, id_col, k)
    bidx = (shingle_index(bench, text_col, id_col, k)
            .select("shingle").distinct().withColumn("_hit", F.lit(1)))
    return (idx.join(bidx, "shingle", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("sz"),
                 F.count("_hit").alias("n_hit"))
            .select(F.col(id_col),
                    F.round(F.col("n_hit") / F.col("sz"), 6).alias("overlap")))


def redact_pii(col: Column | str) -> Column:
    """Email/phone masking — two codegen'd regexp_replace passes, the
    standard pre-training scrub. Patterns are RE2-compatible so the same
    strings run in the SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_top_bigram_frac: float = 0.18,
                       max_dup_word_frac: float = 0.6) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. '21 §A1.1): per doc,
    the fraction of word-bigram occurrences taken by the single most
    frequent bigram, and the duplicate-word fraction (1 - distinct/total).
    ``keep`` is the quality-gate verdict under the given thresholds.

    Shape: adjacent-pair expansion (zip_with against the array tail —
    pure codegen, no Python), one (doc, bigram) count aggregate, then a
    per-doc max/sum reduce. Both aggregations are map-side combinable and
    key on doc_id, so at 100 TB this is two combiner-friendly shuffles of
    token-scale data partitioned by document — no skew beyond document
    length, which the bigram pre-count already compresses."""
    ws = words(text_col)
    base = docs.select(F.col(id_col), ws.alias("ws"))
    wd = base.select(
        F.col(id_col),
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"))
    bg = base.select(
        F.col(id_col),
        F.explode(F.filter(
            F.zip_with("ws", F.slice("ws", 2, F.size("ws")),
                       lambda x, y: F.concat_ws(" ", x, y)),
            lambda p: p.contains(" "))).alias("bigram"))
    bc = bg.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("n"))
    top = (bc.groupBy(id_col)
           .agg(F.max("n").alias("top_n"), F.sum("n").alias("total_bg")))
    out = (wd.join(top, id_col, "left")
           .select(
               F.col(id_col),
               F.coalesce(F.round(F.col("top_n")
                                  / F.col("total_bg"), 4), F.lit(0.0))
               .alias("top_bigram_frac"),
               # empty docs have no word total: NULL, not divide-by-zero
               F.when(F.col("n_words") > 0,
                      F.round(1 - F.col("n_distinct") / F.col("n_words"), 4))
               .alias("dup_word_frac")))
    return out.withColumn(
        "keep", (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac))


def pack_sequences(docs: DataFrame, budget: int = 256,
                   text_col: str = "text", id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    in deterministic (group, id) order and cut into fixed ``budget``-token
    training sequences; each doc reports the pack it starts in and its
    token offset inside that pack (GPT-style packing — a doc may span
    packs; the pack key is (group, pack_id)).

    Shape: token count is a pure projection; the running offset is one
    cumulative-sum window partitioned by ``group_col``, so packing
    parallelizes across groups and never sees a global sort. At 100 TB
    the group is the unit of packing locality (a source shard); a group
    too large for one task gets sub-sharded upstream by the same
    deterministic id order."""
    n_tok = F.size(words(text_col)).cast("long")
    from pyspark.sql import Window
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.select(F.col(id_col), F.col(group_col),
                        n_tok.alias("n_tokens"))
            .withColumn("cum_before",
                        F.coalesce(F.sum("n_tokens").over(w),
                                   F.lit(0).cast("long")))
            .select(id_col, group_col, "n_tokens",
                    F.floor(F.col("cum_before") / budget).alias("pack_id"),
                    (F.col("cum_before") % budget).alias("pack_offset")))


def mixture_sample(docs: DataFrame, weights: dict[str, float],
                   group_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Data-mixing: per-group keep-rates chosen so the sampled corpus's
    group distribution matches the target ``weights``, taking the largest
    volume achievable WITHOUT upsampling: rate_g = cap * w_g / n_g with
    cap = min_g(n_g / w_g), so the binding group keeps ~everything and
    every other group downsamples to match the mixture. Groups absent
    from ``weights`` are dropped. Selection is the deterministic md5
    bucket (0..9999 here, for fractional rates), so the mix is
    reproducible across runs and engines and nested under rate increases.

    Shape: one tiny per-group count aggregate, a scalar min, and a
    broadcast rate join — the fact is touched exactly once, by a pure
    column-expression filter. The cap group's rate can floor to 9999/10000
    (float division round-trip), which is the documented epsilon."""
    spark = docs.sparkSession
    w_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{group_col} string, w double")
    counts = (docs.groupBy(group_col)
              .agg(F.count(F.lit(1)).cast("double").alias("n_g"))
              .join(w_df, group_col))
    cap = counts.agg(F.min(F.col("n_g") / F.col("w")).alias("cap"))
    cuts = (counts.crossJoin(F.broadcast(cap))
            .select(group_col,
                    F.floor(F.col("cap") * F.col("w") / F.col("n_g")
                            * 10000).alias("cut")))
    bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                     16, 10).cast("long") % 10000)
    return docs.join(F.broadcast(cuts), group_col).filter(bucket < F.col("cut"))


def temperature_mixture_sample(docs: DataFrame, temperature: float = 0.5,
                               group_col: str = "source",
                               id_col: str = "doc_id") -> DataFrame:
    """Temperature-scaled mixing: target weights w_g ∝ n_g^T — T < 1
    flattens a skewed corpus toward uniform (the standard multilingual /
    multi-source rebalancing rule), T = 1 keeps natural proportions.
    Delegates to ``mixture_sample``; weights stay UNNORMALIZED — the cap
    formula is scale-invariant, and skipping the Σ-normalization keeps
    the float arithmetic bit-identical to the SQL oracle (no
    summation-order drift). The per-group counts collected here are
    control-plane sized (one row per source/lang)."""
    import math
    counts = (docs.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("n_g")).collect())
    if temperature == 0.5:
        # sqrt is IEEE correctly-rounded in every engine; pow(x, .5) is
        # not guaranteed bit-equal to it
        weights = {r[group_col]: math.sqrt(float(r["n_g"])) for r in counts}
    else:
        weights = {r[group_col]: float(r["n_g"]) ** temperature
                   for r in counts}
    return mixture_sample(docs, weights, group_col, id_col)


def chunk_documents(docs: DataFrame, size: int = 128, overlap: int = 32,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping token windows (the
    RAG/pretraining chunking op): chunk i covers tokens
    [i*stride, i*stride + size) with stride = size - overlap; the last
    chunk is shorter, and a tail that would sit entirely inside the
    previous chunk is not emitted. Empty docs emit no chunks.

    Pure column expressions: one sequence + posexplode per doc, the
    chunk text a slice + join — no Python, no shuffle at all (chunking
    is embarrassingly parallel; the explode multiplies rows in place)."""
    assert 0 <= overlap < size
    stride = size - overlap
    ws = words(text_col)
    base = (docs.select(F.col(id_col), ws.alias("_ws"))
            .withColumn("_n", F.size("_ws"))
            .filter(F.col("_n") > 0))
    num = F.greatest(
        F.lit(1),
        F.ceil((F.col("_n") - F.lit(overlap))
               / F.lit(float(stride))).cast("int"))
    chunks = base.select(
        F.col(id_col), F.col("_ws"), F.col("_n"),
        F.posexplode(F.sequence(F.lit(0), num - 1)).alias("chunk_id", "_i"))
    start = F.col("chunk_id") * stride
    clen = F.least(F.lit(size), F.col("_n") - start)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        clen.cast("long").alias("n_tokens"),
        F.array_join(F.slice("_ws", start + 1, clen), " ").alias("chunk_text"))


def lm_perplexity(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc bigram-LM cross-entropy under the corpus's OWN bigram
    model with add-1 smoothing (the CCNet-style LM quality signal,
    self-trained so no external model ships):

        p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
        score    = avg over the doc's bigram positions of -log2 p

    High score = the doc's transitions are improbable under the corpus
    (gibberish / boilerplate-free outlier); low = well-trodden text.
    Docs with < 2 tokens have no bigram positions and emit NULL.

    Shape: the model IS two count aggregations (bigram, unigram) over
    the same tokenization; scoring joins each doc's bigram occurrences
    to the model tables — all combiner-friendly aggregations and
    equi-joins on token keys, no Python. V (distinct vocabulary) is a
    1-row broadcast. At 100 TB both model tables are token-scale
    aggregates, exactly the vocabulary/bigram tables already built by
    vocab_top_terms/bigram_counts."""
    ws = words(text_col)
    base = docs.select(F.col(id_col), ws.alias("_ws"))
    # per-position bigram occurrences (NOT distinct — each transition
    # scores); same zip_with tail-pair expansion as repetition_metrics
    occ = pin(base.select(
        F.col(id_col),
        F.explode(F.filter(
            F.zip_with("_ws", F.slice("_ws", 2, F.size("_ws")),
                       lambda x, y: F.struct(x.alias("w1"),
                                             F.concat_ws(" ", x, y)
                                             .alias("bg"))),
            lambda p: p["bg"].contains(" "))).alias("_p"))
        .select(F.col(id_col), F.col("_p.w1").alias("w1"),
                F.col("_p.bg").alias("bg")))
    # occ feeds BOTH the bigram model agg and the scoring join —
    # without the pin the tokenize+zip_with pipeline runs twice
    tok = pin(base.select(F.col(id_col), F.explode("_ws").alias("w")))
    uni = tok.groupBy(F.col("w").alias("w1")) \
             .agg(F.count(F.lit(1)).alias("c1"))
    bi = occ.groupBy(F.col("bg").alias("_bg")) \
            .agg(F.count(F.lit(1)).alias("c2"))
    vocab = tok.agg(F.countDistinct("w").alias("v"))
    scored = (occ.join(bi, occ["bg"] == bi["_bg"])
              .join(uni, "w1")
              .crossJoin(F.broadcast(vocab))
              .withColumn("_nll", -F.log2(
                  (F.col("c2") + 1) / (F.col("c1") + F.col("v")))))
    per = scored.groupBy(id_col).agg(
        F.round(F.avg("_nll"), 6).alias("lm_score"))
    return (docs.select(id_col).join(per, id_col, "left")
            .select(id_col, "lm_score"))


def duplicate_span_stats(docs: DataFrame, n: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         max_dup_frac: float = 0.3) -> DataFrame:
    """Exact-substring span dedup stats (the fixed-n form of Lee et al.
    '22, "Deduplicating Training Data Makes Language Models Better"): per
    document, how many of its n-token windows occur verbatim elsewhere in
    the corpus — in another document or repeated within the same one.
    A window is duplicated when its span occurs >= 2 times corpus-wide
    (all occurrences count, unlike the membership-style shingle index).
    ``keep`` gates docs at ``dup_frac <= max_dup_frac``; docs shorter
    than n tokens have no windows and keep=true.

    The suffix-array original finds arbitrary-length >= 50-token spans;
    this fixed-n variant has identical recall for spans >= n and is
    expressible as two combiner-friendly aggregations. Spans are the same
    31-bit polynomial hashes as the dedup inverted index (8-byte keys, no
    span strings built), position-ordered and NOT distinct. Shape at
    100 TB: one groupBy(span) count (map-side combinable), one shuffle
    join of the occurrence list against the per-span totals (one row per
    distinct span), one groupBy(doc) reduce — token-scale data, bigint
    keys, no skew beyond natural span hotness, which caps at the totals
    table's one-row-per-span."""
    from ..functions.text import span_hashes_from_word_hashes, word_hashes
    spans = (docs.select(F.col(id_col), words(text_col).alias("_ws"))
             .select(F.col(id_col), word_hashes("_ws").alias("_wh"))
             .select(F.col(id_col),
                     F.explode(span_hashes_from_word_hashes("_wh", n))
                     .alias("span")))
    # pre-aggregate to (doc, span, occurrences): compresses within-doc
    # boilerplate repeats before anything shuffles, and is the stage both
    # downstream aggregations reuse (persisted, like minhash's band table).
    # Pinned in SPAN-keyed layout (round-14, guide §2.4/§3.1): span
    # hashes are near-unique, so the per-span totals barely compress
    # under partial aggregation and their exchange moved almost the
    # whole table every run — with the cached span partitioning the
    # totals aggregate needs no exchange at all, and the totals join
    # runs as a co-partitioned shuffled-hash join (hint) instead of
    # collecting + broadcasting a span-scale relation. Interleaved noop
    # A/B at sf0.1: ~2.4 s -> ~1.8 s warm.
    dsc = pin(spans.groupBy(id_col, "span")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .repartition("span"))
    tot = (dsc.groupBy("span").agg(F.sum("cnt").alias("tot"))
           .hint("shuffle_hash"))
    per = (dsc.join(tot, "span")
           .groupBy(id_col)
           .agg(F.sum("cnt").alias("n_spans"),
                F.sum(F.when(F.col("tot") >= 2, F.col("cnt"))
                      .otherwise(F.lit(0))).alias("n_dup_spans")))
    return (docs.select(id_col).join(per, id_col, "left")
            .na.fill({"n_spans": 0, "n_dup_spans": 0})
            .withColumn("dup_frac",
                        F.when(F.col("n_spans") > 0,
                               F.round(F.col("n_dup_spans")
                                       / F.col("n_spans"), 6))
                        .otherwise(F.lit(0.0)))
            .withColumn("keep", F.col("dup_frac") <= max_dup_frac))


def source_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Per-source corpus health profile: volume (docs, tokens), document
    length, exact-duplicate rate, and the fraction passing the Gopher
    repetition gate — the monitoring table a curation team watches per
    ingest batch. One pass over the corpus for the volume/dup metrics
    plus the repetition aggregates, all combiner-friendly, rolled up to
    one row per source (dashboard-sized output)."""
    ws = words(text_col)
    base = docs.select(F.col(id_col), F.col(group_col),
                       F.size(ws).alias("n_tokens"),
                       F.md5(F.col(text_col)).alias("fp"))
    rep = repetition_metrics(docs, text_col, id_col).select(id_col, "keep")
    j = base.join(rep, id_col)
    return (j.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
                 F.round(1 - F.countDistinct("fp")
                         / F.count(F.lit(1)), 4).alias("dup_rate"),
                 F.round(F.avg(F.col("keep").cast("int")), 4)
                 .alias("keep_rate"))
            .orderBy(group_col))


def global_shuffle(docs: DataFrame, num_shards: int = 8, seed: int = 1,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic, seedable global corpus shuffle — the epoch-order
    randomization step before training. Every doc gets a pseudo-random
    ``shuffle_key`` from two rounds of a Lehmer/minstd LCG over its id
    (modular arithmetic only, so Spark and any SQL engine compute
    bit-identical keys — no engine-specific hash), a ``shard_id`` =
    key mod num_shards, and the global order is (shard_id, shuffle_key,
    id). No global row-numbering window: at 100 TB the shuffle IS the
    sharded write — ``repartitionByRange(shard_id, shuffle_key)`` +
    ``write.partitionBy(shard_id)`` streams each shard out sorted, and a
    training reader consumes shards in order. Changing ``seed`` yields
    an independent permutation for the next epoch."""
    m, a = 2147483647, 48271  # minstd: a*m fits comfortably in int64
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative id
    # would produce a negative key/shard (SQL engines' % agrees with
    # pmod only for non-negative inputs — pmod keeps the oracle exact
    # for the testdata's non-negative ids AND the op total for any id)
    h1 = F.pmod(F.pmod(F.col(id_col), m) * a + F.lit(seed), m)
    h2 = F.pmod(h1 * a + F.lit(7919), m)
    return (docs.select(F.col(id_col),
                        h2.alias("shuffle_key"),
                        (h2 % num_shards).cast("int").alias("shard_id"))
            .orderBy("shard_id", "shuffle_key", id_col))


def curriculum_phases(docs: DataFrame, k: int = 4,
                      text_col: str = "text") -> DataFrame:
    """Curriculum assembly: bucket the corpus into ``k`` difficulty
    phases by quality-score quantiles (phase 1 = lowest-quality k-th,
    phase k = highest) and report per-phase volume — the plan a
    curriculum-ordered training run consumes (easy->hard or the
    reverse). Two passes: a 1-row exact-quantile aggregate (broadcast),
    then one phase-assignment scan + hash agg; thresholds cross the
    driver as k-1 scalars. At 100 TB swap `percentile` for
    `approx_percentile` — phase boundaries move within sketch tolerance
    but the shape (tiny agg + broadcast + one scan) is unchanged."""
    from ..functions.text import quality_score
    scored = docs.select(quality_score(text_col).alias("score"),
                         F.col(text_col))
    qs = [i / k for i in range(1, k)]
    th = scored.agg(*[F.percentile("score", F.lit(q)).alias(f"t{i}")
                      for i, q in enumerate(qs, 1)])
    phase = F.lit(1)
    for i in range(1, k):
        phase = phase + (F.col("score") > F.col(f"t{i}")).cast("int")
    from ..functions.text import token_count
    return (scored.crossJoin(F.broadcast(th))
            .select(phase.alias("phase"), "score",
                    token_count(text_col).alias("n_tokens"))
            .groupBy("phase")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("score"), 4).alias("avg_score"),
                 F.sum("n_tokens").alias("total_tokens"))
            .orderBy("phase"))


def bpe_merges(docs: DataFrame, n_merges: int = 3,
               text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus:
    per round, the most frequent adjacent symbol pair (weighted by word
    frequency, ties broken by pair string) is merged corpus-wide.
    Output: one row per round — (rank, pair, freq).

    Distributed shape: the working set is the VOCABULARY table
    (word, count, symbol-string), orders of magnitude smaller than the
    corpus; each round is one bigram hash-aggregate over it plus a
    1-row top-pair collect (the same scalar-per-iteration pattern as
    k-means centroids). At 100 TB: corpus -> word-count table is one
    shuffle; every merge round after that is vocabulary-sized work.

    Merge application is a single-pass left-to-right non-overlapping
    delimited string replace — identical semantics in Spark and any SQL
    engine (the oracle replays the same rounds as unrolled CTEs), and
    the standard practical approximation of strict leftmost-pair BPE.
    """
    w = words(text_col)
    vocab = pin(docs.select(F.explode(w).alias("word"))
                .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
                .withColumn(
                    "sym",
                    F.concat(F.lit(" "),
                             F.array_join(
                                 F.regexp_extract_all("word", F.lit("."),
                                                      F.lit(0)), " "),
                             F.lit(" "))))
    out = []
    cur = vocab
    for rank in range(1, n_merges + 1):
        toks = F.split(F.trim(F.col("sym")), " ")
        pairs = F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)))
        top = (cur.filter(F.size(toks) >= 2)  # 1-symbol words: no pairs
               .select("n", F.explode(pairs).alias("pair"))
               .groupBy("pair").agg(F.sum("n").alias("freq"))
               .orderBy(F.col("freq").desc(), "pair").limit(1).collect())
        if not top:
            break
        pair, freq = top[0]["pair"], top[0]["freq"]
        out.append((rank, pair, freq))
        merged = pair.replace(" ", "")
        # replace TWICE: a left-to-right non-overlapping pass consumes
        # the delimiter of the next occurrence (" a b a b " merges only
        # the first pair), so a second pass sweeps the leftover
        # alternation — same two-pass semantics in the SQL oracle
        sym = F.col("sym")
        for _ in range(2):
            sym = F.replace(sym, F.lit(f" {pair} "), F.lit(f" {merged} "))
        cur = cur.withColumn("sym", sym)
    spark = docs.sparkSession
    return spark.createDataFrame(out, "rank int, pair string, freq long")


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 20, max_words: int = 100_000,
                 min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_distinct_stopwords: int = 2) -> DataFrame:
    """Gopher/MassiveText document-quality rule bundle (Rae et al. '21
    §A1.1) as one projection: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio (#/ellipsis), and the >=N distinct
    stopwords requirement. Per-doc rule booleans + the conjunctive
    ``keep`` — pure Column expressions, zero shuffles (the repetition
    rules, which need bigram aggregation, live in
    ``repetition_metrics``; the line-level bullet/ellipsis rules don't
    apply to this corpus' single-line documents).

    Thresholds are the paper's, parameterized: curation teams re-tune
    per corpus (min_words defaults to 20 here — the synthetic docs are
    short — vs the paper's 50)."""
    from ..functions.text import ENGLISH_STOPWORDS, words
    c = F.col(text_col)
    ws = words(c)
    n = F.size(ws)
    nf = n.cast("double")
    mean_wl = (F.length(c) - (n - 1)) / nf
    symbols = (F.size(F.split(c, "#", -1)) - 1
               + F.size(F.split(c, "\\.\\.\\.", -1)) - 1)
    n_stops = F.size(F.array_intersect(
        F.array_distinct(ws),
        F.array(*[F.lit(s) for s in sorted(set(ENGLISH_STOPWORDS))])))
    r_count = (n >= min_words) & (n <= max_words)
    r_wl = (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
    r_sym = (symbols / nf) <= max_symbol_ratio
    r_stop = n_stops >= min_distinct_stopwords
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        r_count.alias("ok_word_count"),
        r_wl.alias("ok_mean_word_len"),
        r_sym.alias("ok_symbol_ratio"),
        r_stop.alias("ok_stopwords"),
        (r_count & r_wl & r_sym & r_stop).alias("keep"))


def ccnet_buckets(docs: DataFrame, n_buckets: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. '19): per
    language, rank documents by their self-trained LM score and split
    them into equal-size head/middle/tail tertiles — the standard
    quality stratification before keeping head(+middle) for training.

    The score is ``lm_perplexity``'s 6-dp-rounded bigram cross-entropy;
    docs with no score (fewer than 2 tokens) sink to the tail via a
    sentinel. The ntile ordering is total (score, then doc_id), so the
    assignment is deterministic on any engine. Shape at 100 TB: the LM
    scoring is the dominant cost (token-scale aggs, see lm_perplexity);
    the bucketing itself is one window per language over doc-scale rows.
    """
    from pyspark.sql import Window
    lm = lm_perplexity(docs, text_col=text_col, id_col=id_col)
    j = (docs.select(F.col(id_col), F.col(lang_col))
         .join(lm, id_col, "left"))
    rank_score = F.coalesce(F.col("lm_score"), F.lit(1e9))
    w = Window.partitionBy(lang_col).orderBy(rank_score, F.col(id_col))
    tile = F.ntile(n_buckets).over(w)
    bucket = (F.when(tile == 1, "head")
              .when(tile == n_buckets, "tail")
              .otherwise("middle"))
    return (j.select(F.col(id_col), F.col(lang_col), "lm_score",
                     bucket.alias("ppl_bucket"),
                     (tile < n_buckets).alias("keep"))
            .orderBy(id_col))


def epoch_schedule(docs: DataFrame, budget_multiple: int = 3,
                   temperature: float = 0.7, max_epochs: float = 4.0,
                   text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Data-constrained epoch allocation (the Muennighoff et al. '23
    regime): given a token budget of ``budget_multiple``× the corpus,
    split it across sources proportionally to ``tokens^temperature``
    (temperature < 1 upweights small sources, the multilingual-mixing
    rule) and cap every source at ``max_epochs`` repeats — repeating
    data beyond ~4 epochs stops buying loss.

    Determinism: per-source token counts are exact integer sums; the
    temperature weights are ROUNDED TO INTEGERS before the Σw
    normalizer, so the normalizer is again an exact integer sum and
    every emitted double is a pure function of exact integers (the
    <0.1% weight quantization is part of the operator's definition).
    The totals row is one scalar broadcast — no driver round-trip.
    Shape at 100 TB: one token-count agg over docs, then source-scale
    arithmetic (tens of rows)."""
    tok = (docs.select(F.col(group_col),
                       F.size(words(text_col)).alias("_nt"))
           .groupBy(group_col)
           .agg(F.sum("_nt").alias("native_tokens")))
    wt = tok.withColumn(
        "_wgt",
        F.round(F.pow(F.col("native_tokens").cast("double"),
                      F.lit(temperature)), 0).cast("long"))
    tot = wt.agg(
        (F.sum("native_tokens") * budget_multiple).alias("_budget"),
        F.sum("_wgt").alias("_tw"))
    j = wt.crossJoin(F.broadcast(tot))
    desired = (F.col("_budget").cast("double") * F.col("_wgt").cast("double")
               / F.col("_tw").cast("double"))
    epochs = F.round(F.least(F.lit(max_epochs),
                             desired / F.col("native_tokens")), 4)
    used = F.least(F.lit(max_epochs) * F.col("native_tokens"), desired)
    return (j.select(
        group_col, "native_tokens",
        F.round(desired, 2).alias("desired_tokens"),
        epochs.alias("epochs"),
        F.round(used, 2).alias("tokens_used"),
        (epochs == max_epochs).alias("capped"))
        .orderBy(group_col))


def feature_hash_counts(docs: DataFrame, dim: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. '09 / fastText's
    bucket embedding): every token maps to ``hash(token) mod dim`` and
    the document becomes sparse (bucket, count) rows — the fixed-width,
    vocabulary-free text representation for linear models and n-gram
    classifiers. Collisions are the method's contract, not a bug.

    Tokens use the engine's portable 31-bit md5 word hash (the same
    keys as the dedup shingle index), so the bucketing is bit-identical
    on any engine. Shape at 100 TB: tokenize + explode (no shuffle),
    then ONE map-side-combinable groupBy((doc, bucket)) — the classic
    wordcount plan; output rows are bounded by docs × dim."""
    base = docs.select(F.col(id_col), words(text_col).alias("_ws"))
    from ..functions.text import word_hashes
    wh = base.select(F.col(id_col), word_hashes("_ws").alias("_wh"))
    return (wh.select(F.col(id_col), F.explode("_wh").alias("_h"))
            .select(F.col(id_col), (F.col("_h") % dim).alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(id_col, "bucket"))


def bm25_search(docs: DataFrame, query_terms: list[str], k: int = 20,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """BM25 keyword search (Robertson/Lucene idf variant): rank
    documents for a fixed bag of query terms — the retrieval companion
    to tfidf_top_terms, and the lexical half of any hybrid
    (BM25 + embedding) retrieval stack.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln((N−df+0.5)/(df+0.5) + 1).

    The token stream is semi-joined to the query terms BEFORE any
    aggregation, so tf/df work scales with |matches|, not corpus
    tokens; dl/avgdl come from one doc-length aggregate. All counts
    are exact integers; the per-doc score sums ≤ |query| float terms.
    Top-k by (score, doc_id) is a map-side TakeOrdered."""
    from pyspark.sql import Window
    q = F.array(*[F.lit(t) for t in query_terms])
    base = (docs.select(F.col(id_col), words(text_col).alias("_ws"))
            .filter(F.size("_ws") > 0))
    dl = base.select(F.col(id_col), F.size("_ws").cast("long").alias("dl"))
    n = dl.agg(F.count(F.lit(1)).alias("nd"),
               F.sum("dl").alias("_sdl"))
    tok = (base.select(F.col(id_col), F.explode("_ws").alias("term"))
           .filter(F.array_contains(q, F.col("term"))))
    tf = (tok.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("_sdl").cast("double") / F.col("nd")
    idf = F.log((F.col("nd") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1)
               / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)))
    sc = (tf.join(F.broadcast(df_), "term")
          .join(dl, id_col)
          .crossJoin(F.broadcast(n))
          .groupBy(id_col)
          .agg(F.round(F.sum(idf * tf_part), 6).alias("score")))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return (sc.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_heavy_hitters(docs: DataFrame, top: int = 20,
                      depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Count-Min-Sketch heavy hitters with an in-query error audit:
    build a d×w CMS over term frequencies, read the top terms back out
    of the sketch, and compare against exact counts — including the
    ceil(e·N/w) error-bound check that the CMS guarantee promises.
    The sketch is the mergeable, fixed-size structure a 100 TB
    streaming counter actually ships between executors; the exact
    counts exist here only to audit it.

    The d bucket counters are built from the TERM-count table, not the
    token stream (Σ counts per bucket ≡ counting tokens per bucket,
    at |vocab| cost instead of |tokens|). Hashes are the portable md5
    arithmetic (salted per row); every number is an exact integer, so
    estimates, overcounts and bound booleans hash-match any engine."""
    tok = docs.select(F.explode(words(text_col)).alias("term"))
    cnts = pin(tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    n_tok = pin(cnts.agg(F.sum("cnt").alias("n")))

    def bucket(row: int) -> F.Column:
        return (F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{row}"),
                                                  F.col("term"))), 1, 15),
                       16, 10).cast("long") % width)

    rows = None
    for r in range(depth):
        part = cnts.select(F.lit(r).alias("row"),
                           bucket(r).alias("bucket"), "cnt")
        rows = part if rows is None else rows.unionByName(part)
    sketch = (rows.groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("bcnt")))  # the d x w CMS table
    top_terms = (cnts.orderBy(F.col("cnt").desc(), "term").limit(top)
                 .withColumnRenamed("cnt", "true_cnt"))
    probes = None
    for r in range(depth):
        p = top_terms.select("term", "true_cnt",
                             F.lit(r).alias("row"), bucket(r).alias("bucket"))
        probes = p if probes is None else probes.unionByName(p)
    est = (probes.join(F.broadcast(sketch), ["row", "bucket"])
           .groupBy("term", "true_cnt")
           .agg(F.min("bcnt").alias("cms_estimate")))
    # CMS guarantee: overcount <= ceil(e*N/w) w.h.p.; 3 > e keeps the
    # check integer-exact
    return (est.crossJoin(F.broadcast(n_tok))
            .select("term", "true_cnt", "cms_estimate",
                    (F.col("cms_estimate") - F.col("true_cnt"))
                    .alias("overcount"),
                    ((F.col("cms_estimate") - F.col("true_cnt")) * width
                     <= 3 * F.col("n")).alias("within_bound"))
            .orderBy(F.col("true_cnt").desc(), "term"))


def hash_embedding(docs: DataFrame, dim: int = 16,
                   buckets: int = CMS_WIDTH // 4,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Signed-random-projection text embedding (Achlioptas ±1 variant,
    seeded by hashing): project the feature-hash bucket counts through
    a deterministic ±1 matrix whose entries are md5 parities of
    (bucket, component) — a pseudo-embedding that needs no model, no
    floats and no stored matrix, yet preserves cosine structure well
    enough for LSH-style blocking. The engine-native bridge from the
    documents table into the ANN operator family.

    Emitted exploded as (doc, component, value) with exact integer
    values (Σ ±count per component) — hash-stable on any engine. Cost:
    the feature-hash agg plus a ``dim``-way expansion of the BUCKET
    table (|docs|·buckets rows, already far smaller than tokens)."""
    cnts = feature_hash_counts(docs, dim=buckets, text_col=text_col,
                               id_col=id_col)
    js = None
    for j in range(dim):
        p = cnts.select(F.col(id_col), F.lit(j).alias("component"),
                        "bucket", "cnt")
        js = p if js is None else js.unionByName(p)
    sign = (F.when(
        F.conv(F.substring(
            F.md5(F.concat(F.lit("proj"), F.col("bucket"),
                           F.lit("_"), F.col("component"))), 1, 15),
            16, 10).cast("long") % 2 == 0,
        F.lit(1)).otherwise(F.lit(-1)))
    return (js.groupBy(id_col, "component")
            .agg(F.sum(sign * F.col("cnt")).alias("value"))
            .orderBy(id_col, "component"))


def phrase_search(docs: DataFrame, phrase_words: list[str],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact phrase search through the span-hash inverted index — the
    classic two-phase retrieval: CANDIDATE generation compares each
    document's position-ordered k-token span hashes against the
    phrase's hash (pure bigint equality, the same 31-bit polynomial the
    dedup index uses, so at scale this reads an existing index
    partitioned by span instead of rescanning text), then a VERIFY
    phase re-checks candidates against the raw text to eliminate hash
    collisions. Emits hash occurrences AND the verified flag so the
    collision layer is observable rather than silently absorbed.

    Only candidate docs are ever re-read in the verify phase — the
    standard index-then-confirm shape that keeps exact search off a
    full-text scan."""
    from ..functions.text import (span_hashes_from_word_hashes,
                                  word_hashes, words)
    k = len(phrase_words)
    phrase = " ".join(phrase_words)
    # the phrase's own hash, via the same md5 polynomial on a 1-row
    # literal relation (no Python-side hashing — one engine, one hash)
    ph = (docs.sparkSession.range(1)
          .select(F.array(*[F.lit(w) for w in phrase_words]).alias("_ws"))
          .select(word_hashes("_ws").alias("_wh"))
          .select(F.element_at(
              span_hashes_from_word_hashes("_wh", k), 1).alias("phash")))
    spans = (docs.select(F.col(id_col), words(text_col).alias("_ws"))
             .select(F.col(id_col), word_hashes("_ws").alias("_wh"))
             .select(F.col(id_col),
                     F.explode(span_hashes_from_word_hashes("_wh", k))
                     .alias("span")))
    cand = (spans.crossJoin(F.broadcast(ph))
            .filter(F.col("span") == F.col("phash"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hash_hits")))
    return (cand.join(docs.select(F.col(id_col), F.col(text_col)), id_col)
            .select(F.col(id_col), "n_hash_hits",
                    F.col(text_col).contains(phrase).alias("verified"))
            .orderBy(id_col))


def cv_fold_assignment(docs: DataFrame, k: int = 5,
                       strat_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """K-fold cross-validation assignment by portable id hash
    (reproducible across runs, engines and corpus growth — a doc never
    changes folds when neighbors arrive), with the balance audit a
    fold assignment must pass: per-(fold, stratum) counts, each fold's
    share of the corpus, and a flag when a fold drifts more than 25%
    from the ideal 1/k. Hash-based folds are binomial, not exact-n —
    the audit is what makes that tradeoff observable.

    One map-side-combinable count over (fold, stratum); the per-fold
    totals re-aggregate those counts (stratum-scale rows)."""
    fold = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                   16, 10).cast("long") % k).alias("fold")
    cnt = (docs.select(fold, F.col(strat_col))
           .groupBy("fold", strat_col)
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("fold").agg(F.sum("n").alias("fold_total"))
    grand = cnt.agg(F.sum("n").alias("_g"))
    share = F.round(F.col("fold_total").cast("double") / F.col("_g"), 4)
    return (cnt.join(tot, "fold").crossJoin(F.broadcast(grand))
            .select("fold", strat_col, "n", "fold_total",
                    share.alias("fold_share"),
                    (F.abs(share - 1.0 / k) <= 0.25 / k)
                    .alias("balanced"))
            .orderBy("fold", strat_col))


def dsir_select(docs: DataFrame, target_source: str, dim: int = 1024,
                k: int = 50, text_col: str = "text",
                id_col: str = "doc_id",
                source_col: str = "source") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. '23,
    arXiv:2302.03169), hashed-n-gram variant: score every candidate
    document by how target-domain-like its hashed-unigram bag is, and
    keep the top-k.

    Both the target distribution (docs from ``target_source``) and the
    raw pool (everything else) are add-0.5-smoothed multinomials over
    ``dim`` hashed token buckets; a document's importance weight is
    Σ_f c_f·(ln p_target[f] − ln p_raw[f]) — its log-likelihood ratio.
    The per-bucket log-ratio is quantized to a 1e-6 integer (ln of a
    rational never sits exactly on the grid boundary — the perplexity
    precedent), so every per-doc weight is an exact BIGINT dot product
    and the ranking is engine-stable. Plan shape at 100 TB: one
    wordcount-shaped agg per side, a ≤``dim``-row log-ratio table
    broadcast into the (doc, bucket, count) join, one weight agg, and
    a TakeOrdered top-k. DSIR's Gumbel resampling step is replaced by
    deterministic top-k — weights are emitted, so any downstream
    sampler can reuse them.
    """
    from ..functions.text import word_hashes
    base = docs.select(F.col(id_col), F.col(source_col),
                       words(text_col).alias("_ws"))
    x = (base.select(id_col, source_col,
                     word_hashes("_ws").alias("_wh"))
         .select(F.col(id_col), F.col(source_col),
                 F.explode("_wh").alias("_h"))
         .select(id_col, source_col, (F.col("_h") % dim).alias("bucket")))
    # the hashed token stream feeds the target counts AND (twice) the
    # pool side — persist it so tokenize+md5 runs once, not three times
    x = pin(x)
    is_t = F.col(source_col) == target_source
    tc = (x.filter(is_t).groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("ct")))
    pool = x.filter(~is_t)
    pc = pool.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    nt = tc.agg(F.sum("ct").alias("n_t"))
    nr = pc.agg(F.sum("cr").alias("n_r"))
    lr = (pc.join(tc, "bucket", "left")
          .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nr))
          .select("bucket",
                  F.round(1e6 * (
                      F.log((F.coalesce(F.col("ct"), F.lit(0)) + 0.5)
                            / (F.col("n_t") + 0.5 * dim))
                      - F.log((F.col("cr") + 0.5)
                              / (F.col("n_r") + 0.5 * dim))), 0)
                  .cast("long").alias("lrm")))
    db = (pool.groupBy(id_col, source_col, "bucket")
          .agg(F.count(F.lit(1)).alias("c")))
    wt = (db.join(F.broadcast(lr), "bucket")
          .groupBy(id_col, source_col)
          .agg(F.sum(F.col("c") * F.col("lrm")).cast("long")
               .alias("weight_e6")))
    return (wt.orderBy(F.col("weight_e6").desc(), id_col).limit(k)
            .select(id_col, source_col, "weight_e6"))


def winnowing_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                           sample_pct: int = 10,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    plagiarism-detector selection rule): slide a ``w``-window over the
    document's k-gram hash sequence and keep each window's minimum
    hash; matching guarantees any shared substring of length ≥ w+k−1
    shares a fingerprint.

    Tie-break is leftmost-minimum, encoded branch-free: each shingle
    becomes ``hash·2²⁰ + position`` (positions capped below 2²⁰), so a
    single integer window-min picks (min hash, then min position) and
    the pair decodes exactly on any engine — no struct/arg_min
    portability hazard. Fingerprints are emitted for a deterministic
    md5 ``sample_pct``% of docs (bounded gate output); the operator
    itself is per-doc window arithmetic — embarrassingly parallel, no
    shuffle beyond the doc partition.
    """
    # span (NOT shingle) hashes: position-ordered, repeats kept —
    # winnowing needs one entry per window position
    from ..functions.text import span_hashes_from_word_hashes, word_hashes
    base = (docs.filter(sample_bucket(id_col) < sample_pct)
            .select(F.col(id_col), words(text_col).alias("_ws")))
    sh = (base.select(F.col(id_col), word_hashes("_ws").alias("_wh"))
          .select(F.col(id_col),
                  F.posexplode(
                      span_hashes_from_word_hashes("_wh", k))
                  .alias("pos", "h"))
          .filter(F.col("pos") < 1048576)
          .select(F.col(id_col), "pos",
                  (F.col("h") * 1048576 + F.col("pos")).alias("key")))
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(-(w - 1), 0))
    sel = (sh.withColumn("sel", F.min("key").over(win))
           .filter(F.col("pos") >= w - 1)
           .select(F.col(id_col), "sel").distinct())
    return (sel.select(
        F.col(id_col),
        (F.col("sel") % 1048576).cast("long").alias("fp_pos"),
        F.expr("CAST(sel DIV 1048576 AS BIGINT)").alias("fp_hash"))
        .orderBy(id_col, "fp_pos"))


def zipf_fit(docs: DataFrame, top_n: int = 500,
             text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the term-frequency distribution: OLS of
    ln(frequency) on ln(rank) across the ``top_n`` most frequent terms
    (slope ≈ −1 for natural language — the standard sanity profile of
    a scraped corpus, and a drift alarm when a crawl goes mechanical).

    The vocabulary aggregation is the wordcount shape; only the top-N
    survive (TakeOrdered — the full vocab is never globally sorted),
    and ranking happens inside that N-row relation. ln terms are
    quantized to 1e-6 integers so the five OLS moments are exact
    BIGINT sums; slope/intercept/R² are then identical IEEE chains on
    those scalars in any engine.
    """
    tok = docs.select(F.explode(words(text_col)).alias("term"))
    tf = (tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
          .orderBy(F.col("cnt").desc(), "term").limit(top_n))
    w = Window.orderBy(F.col("cnt").desc(), "term")
    xy = (tf.select(
        F.row_number().over(w).alias("rank"), "cnt")
        .select(
            F.round(F.log(F.col("rank").cast("double")) * 1e6, 0)
            .cast("long").alias("x"),
            F.round(F.log(F.col("cnt").cast("double")) * 1e6, 0)
            .cast("long").alias("y")))
    a = xy.agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("x") * F.col("x")).alias("sx2"),
               F.sum(F.col("y") * F.col("y")).alias("sy2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n")
    cov = d("sxy") - d("sx") * d("sy") / n
    vx = d("sx2") - d("sx") * d("sx") / n
    vy = d("sy2") - d("sy") * d("sy") / n
    slope = cov / vx
    return a.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        # mirror the oracle's association exactly: slope * (sx/n),
        # not (slope*sx)/n — a different IEEE grouping can differ in
        # the last ulp and flip the 6-dp rounding
        F.round((d("sy") / n - slope * (d("sx") / n)) / 1e6, 6)
        .alias("intercept"),
        F.round(cov * cov / (vx * vy), 6).alias("r2"))


TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_stats_by_lang(docs: DataFrame, text_col: str = "text",
                        lang_col: str = "lang") -> DataFrame:
    """Tokenizer-cost profile per language: whitespace word counts vs
    BPE-style pre-tokenizer counts (letter runs | single digits |
    punctuation — the GPT-2 pre-tokenizer shape) and their fertility
    ratio — the number LLM data teams watch to price a corpus in
    tokens and spot languages the tokenizer fragments badly.

    Counts are exact integer sums; fertility is ONE half-away integer
    division per language (ratio-of-integers + round() splits engines —
    the established hazard), emitted as micro-units divided once.
    Pure Column ops + one hash-agg: the wordcount shape.
    """
    from .windows import int_mean_half_away
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.size(words(text_col)).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE),
                                  F.lit(0)))
        .cast("long").alias("n_subtok"))
    agg = (base.groupBy("lang")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_words").cast("long").alias("words"),
                F.sum("n_subtok").cast("long").alias("subtokens")))
    fert = int_mean_half_away(F.col("subtokens") * F.lit(1000000),
                              F.col("words"))
    return (agg.select("lang", "n_docs", "words", "subtokens",
                       (fert / F.lit(1e6)).alias("fertility"))
            .orderBy("lang"))


def ngram_novelty_by_source(docs: DataFrame, k: int = 3,
                            text_col: str = "text",
                            source_col: str = "source") -> DataFrame:
    """Per-source n-gram novelty: the share of a source's distinct
    k-gram shingles that appear in NO other source — the uniqueness
    profile a curation team uses to decide which feeds actually add
    content vs mirror the rest of the crawl.

    Built on the same hashed inverted index as the dedup family:
    (source, shingle) distinct pairs, one shingle-keyed count, an
    equi-join back, one source rollup. The novelty ratio is a single
    half-away integer division. All counts exact integers.
    """
    from ..functions.text import (shingle_hashes_from_word_hashes,
                                  word_hashes)
    from .windows import int_mean_half_away
    idx = pin(docs.select(F.col(source_col).alias("source"),
                          words(text_col).alias("_ws"))
              .select("source", word_hashes("_ws").alias("_wh"))
              .select("source",
                      F.explode(shingle_hashes_from_word_hashes("_wh", k))
                      .alias("shingle"))
              .distinct())  # feeds the count AND the join back
    cnt = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("ns"))
    per = (idx.join(cnt, "shingle")
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("total"),
                F.sum(F.when(F.col("ns") == 1, 1).otherwise(0))
                .cast("long").alias("novel")))
    nv = int_mean_half_away(F.col("novel") * F.lit(1000000),
                            F.col("total"))
    return (per.select("source", "total", "novel",
                       (nv / F.lit(1e6)).alias("novelty"))
            .orderBy("source"))


def dataset_card(docs: DataFrame, text_col: str = "text",
                 lang_col: str = "lang",
                 source_col: str = "source") -> DataFrame:
    """One-row dataset card: the summary block a corpus release ships
    with (doc/token/char volume, language and source breadth, English
    share, mean document length).

    Everything is an exact integer count or a half-away integer
    division of such counts — no float aggregates at all. Single
    full-scan aggregation, map-side combinable.
    """
    from .windows import int_mean_half_away
    a = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(words(text_col))).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.countDistinct(lang_col).cast("long").alias("n_langs"),
        F.countDistinct(source_col).cast("long").alias("n_sources"),
        F.sum(F.when(F.col(lang_col) == "en", 1).otherwise(0))
        .cast("long").alias("n_en"))
    mean_tok = int_mean_half_away(F.col("n_tokens") * F.lit(1000000),
                                  F.col("n_docs"))
    pct_en = int_mean_half_away(F.col("n_en") * F.lit(1000000),
                                F.col("n_docs"))
    return a.select("n_docs", "n_tokens", "n_chars", "n_langs",
                    "n_sources",
                    (mean_tok / F.lit(1e6)).alias("mean_tokens"),
                    (pct_en / F.lit(1e6)).alias("en_share"))


def packing_efficiency(docs: DataFrame, budget: int = 256,
                       text_col: str = "text", id_col: str = "doc_id",
                       group_col: str = "source") -> DataFrame:
    """Per-source report card for :func:`pack_sequences`: how many
    training sequences each source fills, the tail padding it wastes,
    and — the number that decides whether you need cross-document
    attention masking — how many documents get SPLIT across sequence
    boundaries by concat-and-chunk packing.

    All integers derived from the pack layout: a doc spans a boundary
    iff its last token's pack ``floor((cum_before + n_tokens − 1) /
    budget)`` exceeds its start pack; packs per source is
    ``ceil(total_tokens / budget)`` (concat-and-chunk leaves padding
    only in the final pack); fill share is the single division at
    emit. One aggregate over the pack projection — the report adds no
    pass over the corpus beyond what packing itself does.
    """
    packed = pack_sequences(docs, budget=budget, text_col=text_col,
                            id_col=id_col, group_col=group_col)
    start = F.col("pack_id")
    end = F.floor((start * budget + F.col("pack_offset")
                   + F.col("n_tokens") - 1) / budget)
    spans = ((F.col("n_tokens") >= 1) & (end > start)).cast("long")
    agg = (packed.groupBy(group_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
                F.sum(spans).cast("long").alias("n_split_docs")))
    n_packs = F.floor((F.col("total_tokens") + budget - 1)
                      / budget).cast("long")
    return (agg
            .withColumn("n_packs", n_packs)
            .withColumn("tail_waste",
                        (F.col("n_packs") * budget
                         - F.col("total_tokens")).cast("long"))
            .withColumn("fill_pct", F.when(
                F.col("n_packs") > 0,
                F.round(F.col("total_tokens")
                        / (F.col("n_packs") * budget).cast("double")
                        * 100.0, 6))))


def bigram_entropy(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document bigram Shannon entropy — the repetition/diversity
    quality signal one notch above unigram stats: low entropy flags
    boilerplate and degenerate loops that unigram counts miss.

    H = ln(n) − Σ c·ln(c) / n over bigram counts c. Each ``c·ln c``
    term is quantized to a 1e-6 integer grid BEFORE the per-doc sum
    (the perplexity precedent — ln of an integer never lands on a grid
    boundary), so the aggregate is an exact BIGINT and the final
    formula runs on identical scalars in both engines with fixed
    association ``ln(n) − (Σ/1e6)/n``. Docs with fewer than two words
    have no bigrams and emit no row. One explode + two hash-aggs, all
    keyed by doc.
    """
    ws = words(text_col)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 2),
        lambda i: F.concat(F.element_at(ws, i + 1), F.lit(" "),
                           F.element_at(ws, i + 2)))
    tok = (docs.filter(F.size(ws) >= 2)
           .select(F.col(id_col), F.explode(pairs).alias("bg")))
    cnt = tok.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    term = F.round(F.col("c") * F.log("c") * 1e6, 0).cast("long")
    agg = (cnt.groupBy(id_col)
           .agg(F.sum("c").cast("long").alias("n_bigrams"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum(term).alias("t")))
    h = F.round(F.log("n_bigrams")
                - (F.col("t") / 1e6) / F.col("n_bigrams"), 6)
    return agg.select(id_col, "n_bigrams", "n_distinct",
                      h.alias("entropy"))


def token_kl_by_source(docs: DataFrame, text_col: str = "text",
                       source_col: str = "source") -> DataFrame:
    """Per-source KL divergence of the token unigram distribution from
    the whole-corpus distribution — the standard drift/contrast metric
    when deciding mixture weights or spotting a skewed source.

    KL(P_s‖P) decomposes as (Σ_t c_st·ln(c_st/c_t))/N_s + ln(N/N_s):
    each per-term summand rides the perplexity-style 1e-6 c·ln-grid
    (counts are exact integers; the ln of a ratio of integers is the
    identical IEEE expression on both engines and never sits on the
    grid boundary), the sum is BIGINT, and the final formula is fixed-
    association double math. c_st ≤ c_t by construction, so every log
    argument is a positive rational ≤ 1.

    Scale: token explode → one (source, term) aggregate; the global
    term counts REUSE that aggregate (sum over sources — never a
    second pass over raw text); the join keys on term (token-scale
    shuffle, the intrinsic cost).
    """
    tok = docs.select(F.col(source_col).alias("source"),
                      F.explode(words(text_col)).alias("term"))
    # pinned in TERM-keyed layout (round-14, guide §2.4/§3.1, same
    # pattern as duplicate_span_stats): the global term counts then
    # aggregate with no exchange on the cached partitioning and the
    # term join runs co-partitioned shuffled-hash instead of broadcast.
    # The row-scale explode keeps its (source, term) combine key; only
    # the vocabulary-scale combined table moves again.
    st = (tok.groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
          .repartition("term"))
    st = pin(st)
    gt = (st.groupBy("term").agg(F.sum("c_st").cast("long").alias("c_t"))
          .hint("shuffle_hash"))
    ns = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    n_tot = ns.agg(F.sum("n_s").cast("long").alias("n_tot"))
    t6 = F.round((F.col("c_st").cast("double")
                  * F.log(F.col("c_st").cast("double")
                          / F.col("c_t").cast("double"))) * F.lit(1e6),
                 0).cast("long")
    s = (st.join(gt, "term").select("source", t6.alias("t6"))
         .groupBy("source").agg(F.sum("t6").cast("long").alias("s6")))
    out = s.join(ns, "source").crossJoin(F.broadcast(n_tot))
    kl = F.round((F.col("s6").cast("double") / F.lit(1e6))
                 / F.col("n_s").cast("double")
                 + F.log(F.col("n_tot").cast("double")
                         / F.col("n_s").cast("double")), 6)
    return (out.select("source", F.col("n_s").alias("n_tokens"),
                       kl.alias("kl"))
            .orderBy("source"))


def filter_attrition(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Sequential-filter attrition report over the Gopher rule cascade:
    for each rule applied in its fixed order (word count → mean word
    length → symbol ratio → stopwords), how many docs entered the
    stage, how many that rule removed, how many survived — the
    curation funnel every pipeline review starts from.

    One projection (:func:`gopher_rules` is shuffle-free) + ONE global
    aggregate of conditional counts, then the 4-row report is a
    ``stack`` over that single row. Counts are exact integers; the
    removal rate is the quotient grid ``(1e6·removed) div n_in``.
    """
    g = gopher_rules(docs, text_col=text_col, id_col=id_col)
    r1, r2 = F.col("ok_word_count"), F.col("ok_mean_word_len")
    r3, r4 = F.col("ok_symbol_ratio"), F.col("ok_stopwords")
    cnt = lambda c: F.sum(c.cast("long")).cast("long")  # noqa: E731
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        cnt(~r1).alias("f1"),
        cnt(r1 & ~r2).alias("f2"),
        cnt(r1 & r2 & ~r3).alias("f3"),
        cnt(r1 & r2 & r3 & ~r4).alias("f4"))
    rows = agg.select(F.expr(
        "stack(4, "
        "1, 'word_count',    n0,                f1, "
        "2, 'mean_word_len', n0 - f1,           f2, "
        "3, 'symbol_ratio',  n0 - f1 - f2,      f3, "
        "4, 'stopwords',     n0 - f1 - f2 - f3, f4) "
        "AS (stage, rule, n_in, n_removed)"))
    rate = F.when(F.col("n_in") > 0,
                  F.expr("(1000000 * n_removed) div n_in") / 1e6)
    return (rows.select(
        F.col("stage").cast("long").alias("stage"), "rule",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_removed").cast("long").alias("n_removed"),
        (F.col("n_in") - F.col("n_removed")).cast("long").alias("n_out"),
        rate.alias("removal_rate"))
        .orderBy("stage"))


def hapax_profile(docs: DataFrame, text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Per-source lexical-diversity census: vocabulary size, hapax
    legomena count (types occurring exactly once in the source), and
    the hapax share of the vocabulary — the quick corpus-health signal
    (a high hapax rate flags OCR noise / junk tokens; a collapsing one
    flags boilerplate or dedup failure).

    Two keyed aggregates — (source, word) term frequencies, then the
    per-source rollup; the hapax rate rides the exact quotient
    ``(1e6·n_hapax) div n_vocab`` with ONE division at emit. Work is
    bounded by |source × vocabulary|, never token count.
    """
    tf = (docs.select(F.col(source_col).alias("source"),
                      F.explode(words(text_col)).alias("w"))
          .groupBy("source", "w")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    g = (tf.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"),
              F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
              .cast("long").alias("n_hapax"),
              F.sum("cnt").cast("long").alias("n_tokens")))
    rate = F.expr("(1000000 * n_hapax) div n_vocab") / 1e6
    return (g.select("source", "n_tokens", "n_vocab", "n_hapax",
                     F.when(F.col("n_vocab") > 0, rate)
                     .alias("hapax_rate"))
            .orderBy("source"))


def heaps_curve(docs: DataFrame, n_deciles: int = 10,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heaps'-law vocabulary-growth curve: walk the corpus in doc-id
    order and report, at each decile of documents, the cumulative
    token count, the cumulative vocabulary (distinct types seen so
    far), and the Heaps exponent β = ln(V_d/V_1)/ln(N_d/N_1) relative
    to the first decile (β ≈ 0.4–0.6 for natural text; β → 0 flags a
    closed vocabulary, β → 1 token noise).

    Everything that can be integer IS: per-doc token counts, per-doc
    NEW-type counts (each type attributed to its min doc id — one
    aggregate over the distinct (type, doc) index), and both
    cumulative curves ride ``distributed_running_total`` (no
    single-partition global window at any corpus size). The decile
    pick is the largest doc id per ntile bucket from
    ``distributed_ntile``. β is ln on a ratio of exact integers —
    transcendental, so the 1e-6 round is knife-edge-free.
    """
    # ONE combined kernel pass (round-14): both cumulative curves and
    # the decile bucket share the same total order on d, so composing
    # two running-total kernels + an ntile kernel (each with its own
    # range sample, eager checkpoint, offsets collect and window) was
    # 3x the kernel cost plus a d-keyed join to reunite the curves —
    # distributed_cum_curve does it with one shuffle/checkpoint/
    # collect/window and identical exact-integer arithmetic.
    from .windows import distributed_cum_curve
    w = docs.select(F.col(id_col).alias("d"), words(text_col).alias("ws"))
    per_doc = pin(w.select("d", F.size("ws").cast("long").alias("n_tok")))
    first = (w.select("d", F.explode(F.array_distinct("ws")).alias("t"))
             .groupBy("t").agg(F.min("d").alias("d"))
             .groupBy("d").agg(F.count(F.lit(1)).cast("long")
                               .alias("new_types")))
    base = (per_doc.join(first, "d", "left")
            .select("d", "n_tok",
                    F.coalesce("new_types", F.lit(0)).cast("long")
                    .alias("new_types")))
    dec = distributed_cum_curve(
        base, ["d"], ["n_tok", "new_types"], ["cum_tokens", "cum_vocab"],
        n_tiles=n_deciles, tile_out="decile")
    last = (dec.groupBy("decile")
            .agg(F.max("d").alias("d"))
            .join(dec.select("decile", "d", "cum_tokens", "cum_vocab"),
                  ["decile", "d"]))
    anchor = F.broadcast(
        last.filter(F.col("decile") == 1)
        .select(F.col("cum_tokens").alias("n1"),
                F.col("cum_vocab").alias("v1")))
    out = last.crossJoin(anchor)  # 1-row broadcast scalar join
    beta = F.round(
        F.log(F.col("cum_vocab").cast("double")
              / F.col("v1").cast("double"))
        / F.log(F.col("cum_tokens").cast("double")
                / F.col("n1").cast("double")), 6)
    return (out.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("d").alias("last_doc_id"),
        F.col("cum_tokens"), F.col("cum_vocab"),
        F.when((F.col("decile") > 1) & (F.col("v1") > 0)
               & (F.col("cum_tokens") > F.col("n1")), beta).alias("beta"))
        .orderBy("decile"))


LN2_E6 = 693147  # round(1e6·ln 2): the absent-mass JS term per token


def js_divergence_matrix(docs: DataFrame, text_col: str = "text",
                         source_col: str = "source") -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the unigram
    distributions of every source pair — the symmetric mixing-distance
    matrix (in nats, ≤ ln 2) that decides which corpus slices are
    interchangeable and which need their own mixture weight.

    Exact-integer discipline via the c·ln grid (the perplexity /
    transition-entropy precedent): with integer counts c_a(w), c_b(w)
    and totals N_a, N_b, the per-word ratio p/m reduces to
    ``2·c_a·N_b / (c_a·N_b + c_b·N_a)`` — a ratio of exact BIGINTs —
    so each shared-word term ``round(1e6·c_a·ln(ratio))`` is an exact
    integer summand. Words present in only one source contribute
    exactly ln 2 per token; that absent-mass block is ONE integer
    product ``(N_a − Σ_shared c_a)·round(1e6·ln2)`` per (pair, side)
    — same definition both engines. JS assembles the four integer
    sums with one fixed-association double expression. Headroom:
    1e6·c·0.7 ≲ 7e10 per word-pair at sf0.1 token counts.

    Scale: the pair join is |vocab|-keyed (rows = Σ_w k_w² over the
    ~20 sources holding w) and everything after is |pairs|-sized.
    """
    tf = pin(docs.select(F.col(source_col).alias("s"),
                         F.explode(words(text_col)).alias("w"))
             .groupBy("s", "w")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    tot = pin(tf.groupBy("s").agg(F.sum("c").cast("long").alias("n")))
    a = (tf.join(tot, "s")
         .select(F.col("s").alias("sa"), "w", F.col("c").alias("ca"),
                 F.col("n").alias("na")))
    b = (tf.join(tot, "s")
         .select(F.col("s").alias("sb"), "w", F.col("c").alias("cb"),
                 F.col("n").alias("nb")))
    sh = a.join(b, "w").filter(F.col("sa") < F.col("sb"))
    ratio_a = (2 * F.col("ca") * F.col("nb")).cast("double") \
        / (F.col("ca") * F.col("nb") + F.col("cb") * F.col("na")) \
        .cast("double")
    ratio_b = (2 * F.col("cb") * F.col("na")).cast("double") \
        / (F.col("ca") * F.col("nb") + F.col("cb") * F.col("na")) \
        .cast("double")
    term_a = F.round(1e6 * F.col("ca").cast("double") * F.log(ratio_a), 0) \
        .cast("long")
    term_b = F.round(1e6 * F.col("cb").cast("double") * F.log(ratio_b), 0) \
        .cast("long")
    g = (sh.groupBy("sa", "sb")
         .agg(F.min("na").alias("na"), F.min("nb").alias("nb"),
              F.sum("ca").cast("long").alias("sca"),
              F.sum("cb").cast("long").alias("scb"),
              F.sum(term_a).cast("long").alias("ta"),
              F.sum(term_b).cast("long").alias("tb")))
    full_a = F.col("ta") + (F.col("na") - F.col("sca")) * LN2_E6
    full_b = F.col("tb") + (F.col("nb") - F.col("scb")) * LN2_E6
    js = (full_a.cast("double") / 1e6 / F.col("na").cast("double")
          + full_b.cast("double") / 1e6 / F.col("nb").cast("double")) / 2.0
    # UNROUNDED: js is a fixed-association combination of ratios of
    # exact integers, and rounding a rational can land on a knife edge
    # — the raw double is the canonical form (kyle_lambda precedent)
    return (g.select(F.col("sa").alias("source_a"),
                     F.col("sb").alias("source_b"),
                     js.alias("js_divergence"))
            .orderBy("source_a", "source_b"))


def length_histogram(docs: DataFrame, len_col: str = "n_chars",
                     source_col: str = "source") -> DataFrame:
    """Per-source power-of-two document-length histogram — the
    curation report that shows truncation cliffs, boilerplate spikes
    and empty-doc mass at a glance.

    The bucket is the INTEGER bit length (length of the binary
    representation minus one) — never floor(log2(x)), whose float
    round-trip can misbucket exact powers of two. Output rows are
    |source × ~20 buckets|; everything is one aggregate.
    """
    b = (docs.select(F.col(source_col).alias("source"),
                     F.col(len_col).cast("long").alias("n"))
         .filter(F.col("n") > 0)
         .withColumn("bucket",
                     (F.length(F.expr("bin(n)")) - 1).cast("long")))
    return (b.groupBy("source", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n").cast("long").alias("total_chars"))
            .withColumn("bucket_lo",
                        F.expr("cast(power(2, bucket) as bigint)"))
            .select("source", "bucket", "bucket_lo", "n_docs",
                    "total_chars")
            .orderBy("source", "bucket"))


def char_class_profile(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Character-class composition per source: how much of each
    source's raw text is lowercase letters, digits, spaces, or other —
    the first-pass encoding/noise audit a crawl-curation pipeline runs
    before any tokenizer sees the bytes (binary junk and markup soup
    show up as an 'other' spike).

    Class counts are length differences after regexp strip-outs —
    pure projections, summed as exact BIGINTs in one hash-agg; shares
    ride the ``(1e8·c) div total`` quotient grid with one division at
    emit. (DuckDB mirror needs the 'g' flag: its regexp_replace is
    first-match-only by default, Spark's is replace-all.)
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    alpha = (n - F.length(F.regexp_replace(t, "[a-z]", ""))).cast("long")
    digit = (n - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("long")
    space = (n - F.length(F.regexp_replace(t, " ", ""))).cast("long")
    g = (docs.select("source", n.alias("n"), alpha.alias("a"),
                     digit.alias("d"), space.alias("s"))
         .groupBy("source")
         .agg(F.sum("n").cast("long").alias("n_chars"),
              F.sum("a").cast("long").alias("n_alpha"),
              F.sum("d").cast("long").alias("n_digit"),
              F.sum("s").cast("long").alias("n_space")))
    g = g.withColumn(
        "n_other",
        (F.col("n_chars") - F.col("n_alpha") - F.col("n_digit")
         - F.col("n_space")).cast("long"))
    def share(c: str):
        q = F.expr(f"(100000000 * {c}) div n_chars") / 1e6
        return F.when(F.col("n_chars") > 0, q)
    return (g.select("source", "n_chars", "n_alpha", "n_digit",
                     "n_space", "n_other",
                     share("n_alpha").alias("alpha_share"),
                     share("n_space").alias("space_share"),
                     share("n_other").alias("other_share"))
            .orderBy("source"))


def source_vocab_overlap(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: how much of each
    source pair's distinct-token vocabulary is shared — the domain-
    shift screen run before mixing corpora (disjoint vocabularies
    predict tokenizer OOV spikes and mixing-weight surprises).

    One distinct (source, token) projection, a token-keyed pair join
    (candidates meet ONLY on shared tokens — never a source×source
    cross of vocabularies), vocab sizes joined in from the source dim,
    and Jaccard on the exact ``(1e6·|∩|) div |∪|`` quotient grid.
    Output is the source-pair MATRIX.
    """
    from ..functions.text import words
    st = (docs.select("source",
                      F.explode(words(F.col(text_col))).alias("tok"))
          .distinct())
    sizes = st.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"))
    a = st.select(F.col("source").alias("source_a"), "tok")
    b = st.select(F.col("source").alias("source_b"), "tok")
    inter = (a.join(b, "tok")
             .filter(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("vocab").alias("vocab_b"))
    j = (inter.join(sa, "source_a").join(sb, "source_b")
         .withColumn("n_union",
                     (F.col("vocab_a") + F.col("vocab_b")
                      - F.col("n_shared")).cast("long")))
    jac = F.expr("(1000000 * n_shared) div n_union") / 1e6
    return (j.select("source_a", "source_b", "vocab_a", "vocab_b",
                     "n_shared", "n_union",
                     F.when(F.col("n_union") > 0, jac)
                     .alias("jaccard"))
            .orderBy("source_a", "source_b"))


PMI_TOP_K = 20  # bigrams kept, by (count desc, bigram) total order


def bigram_pmi(docs: DataFrame, text_col: str = "text",
               top_k: int = PMI_TOP_K) -> DataFrame:
    """Pointwise mutual information of the ``top_k`` most frequent
    adjacent bigrams: PMI = ln(p(ab) / (p(a)·p(b))) — the collocation
    detector ("new york" vs "the of") run when building tokenizer
    merge candidates or phrase tables.

    All counts (bigram, unigram, both corpus totals) are exact
    BIGINTs; the top-k cut is on the INTEGER count with a lexicographic
    tie-break (float-free cut); PMI itself is a transcendental of a
    rational — ln of ONE double division whose numerator/denominator
    are exact-integer products formed in doubles with identical
    association both engines (``(c_ab·Nu·Nu) / (Nb·c_a·c_b)`` —
    int64 would overflow at corpus scale, the n²-estimator rule).
    """
    from ..functions.text import words
    ws = docs.select(words(F.col(text_col)).alias("ws"))
    uni = pin(ws.select(F.explode("ws").alias("w"))
              .groupBy("w")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    nu = uni.agg(F.sum("c").cast("long").alias("nu"))
    bi = (docs.select(words(F.col(text_col)).alias("ws"))
          .select(F.posexplode("ws").alias("p", "w1"),
                  F.col("ws").alias("ws"))
          .select("w1", F.expr("get(ws, p + 1)").alias("w2"))
          .filter(F.col("w2").isNotNull())
          .groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("c_ab")))
    nb = bi.agg(F.sum("c_ab").cast("long").alias("nb"))
    top = (bi.orderBy(F.col("c_ab").desc(), "w1", "w2").limit(top_k))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    j = (top.join(ua, "w1").join(ub, "w2")
         .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb)))
    num = (F.col("c_ab").cast("double") * F.col("nu").cast("double")
           * F.col("nu").cast("double"))
    den = (F.col("nb").cast("double") * F.col("c_a").cast("double")
           * F.col("c_b").cast("double"))
    return (j.select("w1", "w2", "c_ab", "c_a", "c_b",
                     F.log(num / den).alias("pmi"))
            .orderBy(F.col("c_ab").desc(), "w1", "w2"))


def sentences(text_col: str) -> Column:
    """``[.!?]+``-delimited segments, trimmed, empties dropped — THE
    sentence segmentation shared by :func:`sentence_profile` and
    :func:`readability_profile` and mirrored by their DuckDB oracles
    (``string_split_regex`` twin); one definition so the two profiles
    can never disagree on what a sentence is."""
    return F.filter(
        F.transform(F.split(F.col(text_col), "[.!?]+"),
                    lambda s: F.trim(s)),
        lambda s: s != "")


def sentence_profile(docs: DataFrame, text_col: str = "text",
                     group_col: str = "source") -> DataFrame:
    """Per-source sentence-structure profile: sentence counts, mean
    sentences per document, mean sentence length in characters, and
    the per-source maximum — the readability/segmentation health
    table a curation pipeline checks before sentence-level chunking
    (a source whose "sentences" average 800 chars is markup, not
    prose; one averaging 8 is boilerplate fragments).

    Sentences are ``[.!?]+``-delimited segments, trimmed, empties
    dropped — the same split both engines express natively (Spark
    ``split`` / DuckDB ``string_split_regex``). Everything is an
    exact integer until the two mean emits, each ONE double division
    of exact BIGINT sums (identical association in the oracle). One
    projection + one hash-agg; the array work is per-row codegen.
    """
    sents = sentences(text_col)
    per_doc = docs.select(
        F.col(group_col).alias("g"),
        F.size(sents).cast("long").alias("ns"),
        F.aggregate(sents, F.lit(0).cast("long"),
                    lambda acc, s: acc + F.length(s)).alias("chars"))
    g = (per_doc.groupBy("g")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("ns").cast("long").alias("n_sentences"),
              F.sum("chars").cast("long").alias("sent_chars"),
              F.max("ns").cast("long").alias("max_sentences")))
    mean_per_doc = (F.col("n_sentences").cast("double")
                    / F.col("n_docs").cast("double"))
    mean_len = (F.col("sent_chars").cast("double")
                / F.col("n_sentences").cast("double"))
    return (g.select(F.col("g").alias(group_col), "n_docs",
                     "n_sentences", "max_sentences",
                     mean_per_doc.alias("mean_sentences_per_doc"),
                     F.when(F.col("n_sentences") > 0, mean_len)
                     .alias("mean_sentence_chars"))
            .orderBy(group_col))


def diversity_profile(docs: DataFrame, text_col: str = "text",
                      group_col: str = "source") -> DataFrame:
    """Per-source lexical-diversity profile: vocabulary size,
    type-token ratio, and Shannon word entropy — the three numbers
    that separate a genuinely diverse source from a template farm
    with a big corpus (high volume, tiny entropy) when deciding
    mixture weights.

    Entropy is H = ln T − (Σ_w f_w·ln f_w)/T over the per-source word
    frequency table: each word's f·ln f is quantized to the 1e-6 grid
    and summed as BIGINT (transcendentals on integer inputs never sit
    on grid boundaries — the perplexity precedent), T and V are exact
    counts, and the emit is one identically-associated double
    expression of exact integers in both engines. The frequency table
    is one explode + hash-agg on (source, word) — the TF-IDF shuffle
    shape, no window, no all-pairs anything.
    """
    w = (docs.select(F.col(group_col).alias("g"),
                     F.explode(words(text_col)).alias("wd"))
         .groupBy("g", "wd")
         .agg(F.count(F.lit(1)).cast("long").alias("f")))
    flnf = F.round(F.col("f").cast("double")
                   * F.log(F.col("f").cast("double")) * 1e6, 0).cast("long")
    g = (w.groupBy("g")
         .agg(F.count(F.lit(1)).cast("long").alias("vocab"),
              F.sum("f").cast("long").alias("n_tokens"),
              F.sum(flnf).cast("long").alias("sfl")))
    ttr = F.col("vocab").cast("double") / F.col("n_tokens").cast("double")
    ent = (F.log(F.col("n_tokens").cast("double"))
           - F.col("sfl").cast("double") / 1e6
           / F.col("n_tokens").cast("double"))
    return (g.select(F.col("g").alias(group_col), "vocab", "n_tokens",
                     F.when(F.col("n_tokens") > 0, ttr).alias("ttr"),
                     F.when(F.col("n_tokens") > 0, ent)
                     .alias("word_entropy"))
            .orderBy(group_col))


def readability_profile(docs: DataFrame, text_col: str = "text",
                        group_col: str = "source") -> DataFrame:
    """Per-source readability: Flesch reading ease and Flesch–Kincaid
    grade computed on aggregate ratios (Σwords/Σsentences,
    Σsyllables/Σwords) — the curation-time proxy for "is this source
    prose a model should learn from, legal boilerplate, or keyword
    soup". Aggregate-ratio form (not mean-of-per-doc-scores) so short
    documents don't dominate.

    Syllables are vowel-group counts (``[aeiouy]+`` runs, floor 1 per
    word) — the standard cheap estimator, expressed identically in
    both engines (``regexp_extract_all`` over the word array). All
    three sums are exact BIGINTs; the two scores are
    identically-associated double expressions of exact integers with
    shared literal coefficients (206.835/1.015/84.6 and
    0.39/11.8/15.59), guarded on nonzero sentence/word counts. One
    projection + one hash-agg — the per-word regex work stays in
    per-row codegen, nothing wider than (group, 3 sums) shuffles.
    """
    ws = words(text_col)
    sents = sentences(text_col)
    syl = F.aggregate(
        ws, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.lit(1).cast("long"),
            F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"),
                                        F.lit(0))).cast("long")))
    per_doc = docs.select(
        F.col(group_col).alias("g"),
        F.size(ws).cast("long").alias("nw"),
        F.size(sents).cast("long").alias("ns"),
        syl.alias("ny"))
    g = (per_doc.groupBy("g")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("nw").cast("long").alias("sw"),
              F.sum("ns").cast("long").alias("ss"),
              F.sum("ny").cast("long").alias("sy")))
    wps = F.col("sw").cast("double") / F.col("ss").cast("double")
    spw = F.col("sy").cast("double") / F.col("sw").cast("double")
    ok = (F.col("ss") > 0) & (F.col("sw") > 0)
    ease = 206.835 - 1.015 * wps - 84.6 * spw
    grade = 0.39 * wps + 11.8 * spw - 15.59
    return (g.select(F.col("g").alias(group_col), "n_docs", "sw", "ss",
                     "sy",
                     F.when(ok, ease).alias("flesch_ease"),
                     F.when(ok, grade).alias("fk_grade"))
            .orderBy(group_col))


def word_burstiness(docs: DataFrame, top: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Burstiness (variance-to-mean ratio of per-document counts,
    zeros included) for the corpus's ``top`` most frequent words — the
    dispersion screen that separates function words (VMR ≈ 1, Poisson
    -ish) from topical/template words (VMR ≫ 1: absent almost
    everywhere, stacked where they appear). Template-word lists feed
    boilerplate filters; a "stopword" with high VMR is a tell that a
    source is flooding the corpus with one document shape.

    Entirely integer algebra: with N docs, total count T and per-doc
    squared sum Σc², population VMR = (N·Σc² − T²) / (N·T) — both
    sides exact BIGINTs, emitted as ONE unrounded double division
    (kyle-lambda rule). Zeros never materialize: the formula only
    needs the nonzero (doc, word) counts. Headroom: N·Σc² — at 1e9
    docs with 1e3-count cells this needs ~1e18, inside int64; re-grid
    by sharding N beyond that. Top-k is a heap over the vocab-sized
    aggregate (TakeOrdered, never a full sort), ties on the word.
    """
    c = (docs.select(F.col(id_col), F.explode(words(text_col))
                     .alias("wd"))
         .groupBy(id_col, "wd")
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    per_word = (c.groupBy("wd")
                .agg(F.sum("c").cast("long").alias("t"),
                     F.sum(F.col("c") * F.col("c")).cast("long")
                     .alias("s2"),
                     F.count(F.lit(1)).cast("long").alias("df")))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    j = per_word.crossJoin(F.broadcast(n_docs))
    num = (F.col("n_docs") * F.col("s2") - F.col("t") * F.col("t"))
    den = (F.col("n_docs") * F.col("t"))
    out = j.select(
        F.col("wd").alias("word"), "t", "df", "n_docs",
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .alias("vmr"))
    return (out.orderBy(F.col("t").desc(), "word").limit(top)
            .select("word", F.col("t").alias("total_count"),
                    F.col("df").alias("doc_freq"), "n_docs", "vmr"))


def good_turing_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Good–Turing count-of-counts table over the corpus unigram
    frequencies: for each observed count r, the number of word types
    N_r seen exactly r times, the adjusted count r* = (r+1)·N_{r+1}/N_r
    and the GT probability r*/N — the classic smoothing table (and the
    unseen-mass estimate N_1/N at r = 1's row) that decides how much
    probability a tokenizer/LM should reserve for unseen types.

    Everything before the emit is exact integers: word counts, the
    count-of-counts histogram, the self-join on r+1 (left — a missing
    N_{r+1} is a genuine 0), and the total mass N = Σ r·N_r. The two
    emitted ratios are UNROUNDED raw doubles of exact integers (the
    kyle-lambda rule: round() on a rational is a knife edge) with
    identical association both engines. Shape at 100 TB: one token
    aggregate, one histogram over it (|distinct r| rows — hundreds),
    driver-free scalar via broadcast. Output ordered by r.
    """
    tok = docs.select(F.explode(words(text_col)).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("r"))
    coc = pin(uni.groupBy("r")
              .agg(F.count(F.lit(1)).cast("long").alias("n_r")))
    nxt = coc.select((F.col("r") - 1).alias("r"),
                     F.col("n_r").alias("n_next"))
    tot = coc.agg(F.sum(F.col("r") * F.col("n_r")).cast("long")
                  .alias("n_tokens"))
    j = (coc.join(nxt, "r", "left")
         .crossJoin(F.broadcast(tot))
         .select("r", "n_r",
                 F.coalesce(F.col("n_next"), F.lit(0)).cast("long")
                 .alias("n_next"), "n_tokens"))
    r_star = ((F.col("r") + 1) * F.col("n_next")).cast("double") \
        / F.col("n_r").cast("double")
    return (j.select("r", "n_r", "n_next",
                     r_star.alias("r_star"),
                     (r_star / F.col("n_tokens").cast("double"))
                     .alias("p_gt"))
            .orderBy("r"))


def tokenizer_fertility(docs: DataFrame, text_col: str = "text",
                        source_col: str = "source") -> DataFrame:
    """Per-source tokenizer fertility profile: whitespace words vs the
    BPE-ish 4-chars-per-token estimate (``subword_token_estimate``) —
    the subwords-per-word ratio that flags sources a byte-pair
    tokenizer will inflate (URLs, code, agglutinative text) before
    anyone pays for the real tokenization pass.

    Pure integer sums (words, estimated subwords, characters) in one
    hash-agg; the three emitted ratios are UNROUNDED raw doubles of
    exact integers with identical association, each guarded on its own
    denominator. One scan, one combiner-friendly group-by — trivially
    100 TB-safe.
    """
    from ..functions.text import subword_token_estimate, token_count
    d = docs.select(
        F.col(source_col).alias("source"),
        token_count(text_col).cast("long").alias("nw"),
        subword_token_estimate(text_col).alias("ns"),
        F.length(text_col).cast("long").alias("nc"))
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("ns").cast("long").alias("n_subwords"),
        F.sum("nc").cast("long").alias("n_chars"))
    fert = F.col("n_subwords").cast("double") \
        / F.col("n_words").cast("double")
    cpw = F.col("n_chars").cast("double") / F.col("n_words").cast("double")
    return (g.select("source", "n_docs", "n_words", "n_subwords",
                     F.when(F.col("n_words") > 0, fert).alias("fertility"),
                     F.when(F.col("n_words") > 0, cpw)
                     .alias("chars_per_word"))
            .orderBy("source"))


KN_NLL_GRID = 1e6  # 1e-6 grid for per-position −log2 p quantization


def kn_bigram_perplexity(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-doc bigram cross-entropy under interpolated Kneser–Ney with
    the fixed discount D = 3/4 — the LM-quality signal one rung above
    :func:`lm_perplexity`'s add-1 model (KN's continuation
    probabilities are what make "San Francisco"-style collocations
    score sanely):

        p(w2|w1) = max(c12 − D, 0)/ctx1 + (D·T1/ctx1) · (cont2/B)

    with ctx1 = Σ_w c(w1 w), T1 = |{w : c(w1 w) > 0}|, cont2 =
    |{w : c(w w2) > 0}|, B = total distinct bigram types. With D = 3/4
    the probability is the exact integer rational

        num/den = (max(4·c12 − 3, 0)·B + 3·T1·cont2) / (4·ctx1·B)

    so −log2 is ONE transcendental on a ratio of exact integers —
    quantized to the 1e-6 grid, BIGINT-summed per doc, and the per-doc
    mean emitted as the UNROUNDED chain s/n/1e6 (a rounded ratio of
    integers is a knife edge). Docs with < 2 tokens emit NULL. Int64
    headroom: 4·c12·B and 4·ctx1·B at corpus scale bound the form —
    past ~10⁹ bigram types × 10⁹-count contexts, evaluate num/den on
    leaf-cast doubles instead (identical association both sides).

    Shape at 100 TB: the model IS three aggregates over the bigram
    type table (all map-side combinable) plus equi-joins on token keys
    — same scale as :func:`lm_perplexity`, no Python anywhere.
    """
    base = docs.select(F.col(id_col), words(text_col).alias("_ws"))
    occ = pin(base
              .select(F.col(id_col), F.posexplode("_ws").alias("p", "w1"),
                      F.col("_ws").alias("_ws"))
              .select(F.col(id_col), "w1",
                      F.expr("get(_ws, p + 1)").alias("w2"))
              .filter(F.col("w2").isNotNull()))
    # bigram type table feeds c12, T1, cont2 AND B — pin it
    bi = pin(occ.groupBy("w1", "w2")
             .agg(F.count(F.lit(1)).cast("long").alias("c12")))
    ctx = occ.groupBy("w1").agg(F.count(F.lit(1)).cast("long")
                                .alias("ctx1"))
    t1 = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("t1"))
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("long")
                                .alias("cont2"))
    btot = bi.agg(F.count(F.lit(1)).cast("long").alias("b"))
    j = (occ.join(bi, ["w1", "w2"])
         .join(ctx, "w1").join(t1, "w1").join(cont, "w2")
         .crossJoin(F.broadcast(btot)))
    num = (F.greatest(4 * F.col("c12") - 3, F.lit(0)).cast("long")
           * F.col("b") + 3 * F.col("t1") * F.col("cont2")).cast("long")
    den = (4 * F.col("ctx1") * F.col("b")).cast("long")
    nll = F.round(-F.log2(num.cast("double") / den.cast("double"))
                  * F.lit(KN_NLL_GRID), 0).cast("long")
    per = (j.select(F.col(id_col), nll.alias("q"))
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum("q").cast("long").alias("s")))
    score = F.col("s").cast("double") / F.col("n_bigrams").cast("double") \
        / F.lit(KN_NLL_GRID)
    scored = per.select(F.col(id_col), "n_bigrams", score.alias("kn_score"))
    return (docs.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
                    .alias("n_bigrams"), "kn_score")
            .orderBy(id_col))


def rake_word_scores(docs: DataFrame, top_n: int = 100,
                     text_col: str = "text",
                     stopwords: tuple = None) -> DataFrame:
    """Word-level RAKE keyword metrics (Rose et al. 2010): split each
    doc into candidate phrases at stopword boundaries, then score each
    content word by freq (occurrences), degree (Σ over its occurrences
    of the containing phrase's length — co-occurrence incl. self) and
    degree/freq — the keyword-extraction signal that favors words
    living in long multiword phrases. Top ``top_n`` by (degree, word).

    Phrase segmentation is the gaps-and-islands identity on the
    non-stopword token stream: group key = pos − row_number() over
    (doc, pos-order) is constant exactly within a maximal stopword-free
    run (engine-portable — the key's absolute value differs per engine
    base index but only ever serves as a grouping key). freq/degree are
    exact integers, the emitted ratio an UNROUNDED raw double, and the
    top-N order (degree DESC, word) is integer-keyed — no float decides
    placement. Shape: one posexplode, two windows over ONE (doc, pos)
    ordering, two hash-aggs; token-scale everywhere.
    """
    from ..functions.text import ENGLISH_STOPWORDS
    stop = list(stopwords or ENGLISH_STOPWORDS)
    tok = (docs.select(F.col("doc_id"),
                       F.posexplode(words(text_col)).alias("pos", "w"))
           .filter(~F.col("w").isin(stop)))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    tok = tok.withColumn("grp",
                         (F.col("pos") - F.row_number().over(w_doc))
                         .cast("long"))
    plen = F.count(F.lit(1)).over(Window.partitionBy("doc_id", "grp")) \
        .cast("long")
    occ = tok.select("w", plen.alias("plen"))
    g = occ.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("degree"))
    rake = F.col("degree").cast("double") / F.col("freq").cast("double")
    return (g.select(F.col("w").alias("word"), "freq", "degree",
                     rake.alias("rake_score"))
            .orderBy(F.col("degree").desc(), "word")
            .limit(top_n))


def vocab_overlap(docs: DataFrame, text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the mixture-design
    diagnostic next to :func:`source_profile`: two sources with
    near-identical vocabularies add volume but not diversity to a
    training mix, and a near-zero overlap flags a language/domain
    outlier.

    One distinct (source, word) projection, then a word-keyed self-join
    (an inverted-index join: each word's source list is tiny — bounded
    by the source count, never by corpus size), one pair-keyed count,
    and the per-source vocab sizes broadcast on. Jaccard
    |A∩B| / (|A| + |B| − |A∩B|) is ONE raw double division of exact
    integers. Output (source_a, source_b, vocab_a, vocab_b, n_common,
    jaccard), pair-ordered.
    """
    ws = words(text_col)
    sv = pin(docs.select(F.col(source_col).alias("src"),
                         F.explode(ws).alias("w")).distinct())
    sizes = sv.groupBy("src").agg(F.count(F.lit(1)).cast("long")
                                  .alias("vsz"))
    a = sv.select(F.col("src").alias("sa"), "w")
    b = sv.select(F.col("src").alias("sb"), "w")
    common = (a.join(b, "w").filter(F.col("sa") < F.col("sb"))
              .groupBy("sa", "sb")
              .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    za = sizes.select(F.col("src").alias("sa"), F.col("vsz").alias("vocab_a"))
    zb = sizes.select(F.col("src").alias("sb"), F.col("vsz").alias("vocab_b"))
    j = common.join(F.broadcast(za), "sa").join(F.broadcast(zb), "sb")
    jac = F.col("n_common").cast("double") / (
        F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
    ).cast("double")
    return (j.select(F.col("sa").alias("source_a"),
                     F.col("sb").alias("source_b"),
                     "vocab_a", "vocab_b", "n_common",
                     jac.alias("jaccard"))
            .orderBy("source_a", "source_b"))


def stopword_drift(docs: DataFrame, text_col: str = "text",
                   source_col: str = "source") -> DataFrame:
    """Per-source stopword-token ratio against the corpus-wide
    baseline — the cheapest register/quality drift monitor: a source
    whose stopword share sits far from the corpus norm is boilerplate,
    code, or a different language wearing the wrong tag (the
    per-source counterpart of text.quality_features' per-doc ratio).

    Counts are exact integers (token totals and stopword hits summed
    per source; the corpus baseline is the integer sum over sources
    broadcast back — one pass); each ratio is ONE double division and
    the drift is the difference of the two identically-computed
    ratios, so every emitted value is a deterministic function of
    exact integers. Output per source, source-ordered.
    """
    from ..functions.text import ENGLISH_STOPWORDS

    ws = words(text_col)
    stops = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    per_doc = docs.select(
        F.col(source_col).alias("src"),
        F.size(ws).cast("long").alias("nt"),
        F.size(F.filter(ws, lambda w: F.array_contains(stops, w)))
        .cast("long").alias("nsw"))
    g = pin(per_doc.groupBy("src")
            .agg(F.sum("nt").cast("long").alias("n_tokens"),
                 F.sum("nsw").cast("long").alias("n_stopwords")))
    tot = g.agg(F.sum("n_tokens").cast("long").alias("ct"),
                F.sum("n_stopwords").cast("long").alias("cs"))
    j = g.crossJoin(F.broadcast(tot))  # 1-row scalar join
    r_src = F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double")
    r_corp = F.col("cs").cast("double") / F.col("ct").cast("double")
    return (j.select(F.col("src").alias("source"), "n_tokens",
                     "n_stopwords",
                     F.when(F.col("n_tokens") > 0, r_src)
                     .alias("stopword_ratio"),
                     F.when(F.col("ct") > 0, r_corp)
                     .alias("corpus_ratio"),
                     F.when((F.col("n_tokens") > 0) & (F.col("ct") > 0),
                            r_src - r_corp).alias("drift"))
            .orderBy("source"))


TOKEN_BUDGET = 1_000_000  # default training-mix token budget


def token_budget_plan(docs: DataFrame, budget: int = TOKEN_BUDGET,
                      text_col: str = "text",
                      source_col: str = "source") -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a training token
    budget across sources, proportional to each source's token count
    — the exact version of "mix to N tokens at natural proportions"
    every pretraining data plan starts from (temperature_mix and
    mixture_sample handle the non-proportional variants; this is the
    faithful baseline they're compared against).

    Pure integer arithmetic — the apportionment is EXACTLY the
    largest-remainder method, not a float approximation: floor quota
    = budget·tok_s div total, remainders budget·tok_s mod total, the
    Σfloor shortfall goes one seat each to the largest remainders
    (ties broken by source name). Σquota == budget by construction.
    Headroom: budget·tok_s — int64-safe through ~9e18/budget tokens
    per source.

    Shape at 100 TB: one hash-agg to |sources| rows; the rank window
    and total broadcast run on that tiny relation.
    """
    toks = (docs.select(F.col(source_col).alias("source"),
                        F.size(words(text_col)).cast("long").alias("nt"))
            .groupBy("source")
            .agg(F.sum("nt").cast("long").alias("n_tokens")))
    tot = toks.agg(F.sum("n_tokens").cast("long").alias("total"))
    base = (toks.crossJoin(F.broadcast(tot))  # 1-row scalar
            .select("source", "n_tokens",
                    F.expr(f"({budget} * n_tokens) div total")
                    .cast("long").alias("q_floor"),
                    F.expr(f"({budget} * n_tokens) % total")
                    .cast("long").alias("rem")))
    w_short = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    w_rank = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = base.select(
        "source", "n_tokens", "q_floor",
        F.row_number().over(w_rank).alias("_rk"),
        (F.lit(budget) - F.sum("q_floor").over(w_short)).alias("_short"))
    return (ranked.select(
        "source", "n_tokens",
        (F.col("q_floor") + F.when(F.col("_rk") <= F.col("_short"), 1)
         .otherwise(0)).cast("long").alias("quota"))
        .orderBy("source"))


TEMPLATE_POSITIONS = 8  # leading word positions audited for templates


def positional_template_profile(docs: DataFrame,
                                n_positions: int = TEMPLATE_POSITIONS,
                                text_col: str = "text",
                                source_col: str = "source") -> DataFrame:
    """Per-source positional template profile: for each of the first
    ``n_positions`` word slots, the modal word and its share of the
    source's documents — template-generated and boilerplate-opened
    corpora show near-1.0 shares on early slots while organic text
    decays fast (the positional complement of prefix_dup_census,
    which needs the WHOLE prefix to repeat verbatim).

    Exact integer counts; the modal pick is a deterministic window
    top-1 (count desc, word asc); share = ONE double division per
    emitted row. Output: (source, pos, top_word, n_docs, share),
    pos 1-based.

    Shape at 100 TB: explode bounded to ``n_positions`` terms per doc
    → one (source, pos, word) hash-agg → a window over per-(source,
    pos) groups (≤ |vocab at slot| rows each) — never a global sort.
    """
    ws = words(text_col)
    ex = (docs.select(F.col(source_col).alias("source"),
                      F.posexplode(F.slice(ws, 1, n_positions))
                      .alias("p", "word"))
          .select("source", (F.col("p") + 1).alias("pos"), "word"))
    cnt = (ex.groupBy("source", "pos", "word")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w_tot = Window.partitionBy("source", "pos")
    w_top = Window.partitionBy("source", "pos") \
        .orderBy(F.col("c").desc(), F.col("word").asc())
    return (cnt.select("source", "pos", "word", "c",
                       F.sum("c").over(w_tot).alias("n_docs"),
                       F.row_number().over(w_top).alias("_rn"))
            .filter(F.col("_rn") == 1)
            .select("source", F.col("pos").cast("long").alias("pos"),
                    F.col("word").alias("top_word"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    (F.col("c").cast("double")
                     / F.col("n_docs").cast("double")).alias("share"))
            .orderBy("source", "pos"))


SHARD_COUNT = 8  # default output fan-out for the shard plan


def shard_plan(docs: DataFrame, n_shards: int = SHARD_COUNT,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Deterministic hash-shard plan: assign every document to
    ``md5(doc_id) % n_shards`` and report per-shard document/token
    counts plus the balance ratio against the ideal share — the
    pre-flight audit before writing N training shards (a skewed shard
    becomes the stragglers of every epoch; the doc-level companion of
    corpus_global_shuffle's position assignment).

    The shard key is the same portable md5-prefix integer the minhash
    family uses (``int(md5(id)[:15 hex])``) — engine-reproducible, so
    the plan itself can be recomputed anywhere. Counts are exact
    BIGINTs; skew = docs·n_shards/total is ONE double division
    (exactly 1.0 = perfectly balanced).

    Shape at 100 TB: one projection + one ≤ n_shards-group hash-agg.
    In production the same expression feeds
    ``df.repartition(n_shards, shard)`` so the plan IS the layout.
    """
    shard = F.expr(
        f"cast(conv(substr(md5(cast({id_col} AS STRING)), 1, 15), 16, 10) "
        f"AS BIGINT) % {n_shards}")
    g = (docs.select(shard.alias("shard"),
                     F.size(words(text_col)).cast("long").alias("nt"))
         .groupBy("shard")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("nt").cast("long").alias("n_tokens")))
    tot = g.agg(F.sum("n_docs").cast("long").alias("td"),
                F.sum("n_tokens").cast("long").alias("tt"))
    return (g.crossJoin(F.broadcast(tot))  # 1-row scalar
            .select("shard", "n_docs", "n_tokens",
                    (F.col("n_docs").cast("double") * n_shards
                     / F.col("td").cast("double")).alias("doc_skew"),
                    (F.col("n_tokens").cast("double") * n_shards
                     / F.col("tt").cast("double")).alias("token_skew"))
            .orderBy("shard"))


COVERAGE_CUTOFFS = (100, 1_000, 10_000)


def vocab_coverage_curve(docs: DataFrame,
                         cutoffs: tuple = COVERAGE_CUTOFFS,
                         text_col: str = "text") -> DataFrame:
    """Vocabulary coverage curve: for each rank cutoff N, the fraction
    of ALL corpus tokens covered by the N most frequent words — the
    number a tokenizer/vocab-size decision reads first (Zipf's law
    says coverage saturates fast; this measures exactly where).

    Exact: word counts are exact integers, the rank order is
    deterministic (count desc, word asc), the cumulative covered
    count is an exact window sum, and each cutoff's coverage is ONE
    double division. Output: (cutoff, n_vocab, covered_tokens,
    coverage), cutoff-ordered; n_vocab = min(cutoff, |vocab|).

    Shape at 100 TB: one token hash-agg to |vocab| rows (pinned —
    two consumers), then TWO bounded consumers of it: a scalar
    aggregate for total tokens / |vocab|, and a distributed top-k
    (``orderBy(...).limit(max(cutoffs))`` → TakeOrderedAndProject —
    the full vocab is never globally sorted or single-partitioned).
    Only the ≤ max(cutoffs)-row top-k relation is ranked/cumsum'd
    with a window, so the one unpartitioned window here is bounded
    by a constant, never by |vocab| (round-12 verdict: the previous
    version ran the window over the entire vocab relation).
    """
    max_cut = int(max(cutoffs))
    tok = docs.select(F.explode(words(text_col)).alias("w"))
    vc = pin(tok.groupBy("w")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    # total tokens / vocab size: one scalar hash-agg — count() is 0
    # (not NULL) on an empty corpus, so least(cutoff, v) can no longer
    # fabricate n_vocab = cutoff for a zero-word vocabulary
    tot = vc.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                 .alias("total"),
                 F.count(F.lit(1)).cast("long").alias("v"))
    top = (vc.orderBy(F.col("c").desc(), F.col("w").asc())
           .limit(max_cut))
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    run = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    ranked = top.select(
        F.row_number().over(w_rank).alias("rk"),
        F.sum("c").over(run).alias("cum"))
    cuts = docs.sparkSession.createDataFrame(
        [(int(c),) for c in cutoffs], "cutoff long")
    at = (cuts.crossJoin(F.broadcast(tot))
          .join(ranked,
                ranked["rk"] == F.least(F.col("cutoff"), F.col("v")),
                "left"))
    return (at.select("cutoff",
                      F.least(F.col("cutoff"), F.col("v"))
                      .cast("long").alias("n_vocab"),
                      F.coalesce(F.col("cum"), F.lit(0)).cast("long")
                      .alias("covered_tokens"),
                      F.when(F.col("total") > 0,
                             F.col("cum").cast("double")
                             / F.col("total").cast("double"))
                      .alias("coverage"))
            .orderBy("cutoff"))
