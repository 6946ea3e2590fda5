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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import words
from .dedup import shingle_index

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
    tf = (tok.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = (docs.filter(F.size(words(text_col)) > 0)
          .agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (tf.join(F.broadcast(df_), "term")
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


def contamination_overlap(docs: DataFrame, bench: DataFrame, k: int = 5,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-doc benchmark contamination: the fraction of the doc's distinct
    k-word shingles that appear anywhere in ``bench`` (the train-on-test
    leakage check run before an LLM training job). Docs shorter than k
    words have no shingles and emit no row.

    Shape: hashed inverted index (8-byte keys) on both sides, distinct
    benchmark shingle set, semi-join + ratio — the benchmark side is the
    small one at scale, so the join broadcasts or buckets on shingle."""
    idx = shingle_index(docs, text_col, id_col, k)
    bidx = shingle_index(bench, text_col, id_col, k).select("shingle").distinct()
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    hits = (idx.join(bidx, "shingle", "left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit")))
    return (sizes.join(hits, id_col, "left")
            .na.fill({"n_hit": 0})
            .select(F.col(id_col),
                    F.round(F.col("n_hit") / F.col("sz"), 6).alias("overlap")))


def redact_pii(col: Column | str) -> Column:
    """Email/phone masking — two codegen'd regexp_replace passes, the
    standard pre-training scrub. Patterns are RE2-compatible so the same
    strings run in the SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
