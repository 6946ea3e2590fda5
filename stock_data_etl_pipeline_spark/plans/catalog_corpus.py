"""Catalog entries: corpus-statistics operators (operators/corpus.py) —
vocabulary, bigrams, TF-IDF, deterministic sampling, benchmark
contamination, PII redaction. Oracles share the exact tokenization and
md5/shingle-hash arithmetic of the text/dedup oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus as CP
from ..operators import dedup as DD
from ..sources.registry import load_table
from .catalog import register
from .catalog_text import _shingle_hash_expr, _STOPS, _WORD_HASHES, _WORDS


@register("corpus_vocab_top_terms", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w)
SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM tok GROUP BY term
ORDER BY tf DESC, term LIMIT 100
""")
def corpus_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CP.vocab_top_terms(d, n=100)


@register("corpus_bigram_counts", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
pairs AS (SELECT unnest(list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i+1])) AS bigram
          FROM w)
SELECT bigram, count(*) AS n
FROM pairs GROUP BY bigram
HAVING count(*) >= 5
ORDER BY n DESC, bigram
""")
def corpus_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CP.bigram_counts(d, min_count=5)


@register("corpus_tfidf_top_terms", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM w WHERE len(ws) > 0),
scored AS (SELECT t.doc_id, t.term, t.tf,
                  round(t.tf * ln(nd.n_docs / d.df::DOUBLE), 6) AS score
           FROM tf t JOIN df d USING (term), nd),
ranked AS (SELECT *, (row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, term))::BIGINT AS rn
           FROM scored)
SELECT doc_id, term, tf, score, rn
FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn
""")
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CP.tfidf_top_terms(d, k=3).orderBy("doc_id", "rn")


@register("corpus_deterministic_sample", """
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
ORDER BY doc_id
""")
def corpus_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (CP.deterministic_sample(d, pct=10)
            .select("doc_id", "lang", "source").orderBy("doc_id"))


@register("corpus_stratified_sample", """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
      < CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 80 ELSE 40 END
ORDER BY doc_id
""")
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus rebalancing: downsample dominant English hard, keep most of
    # the low-resource tail — per-stratum rates over the same md5 bucket
    d = load_table(spark, sf_dir, "documents")
    return (CP.stratified_sample(d, {"en": 10, "zh": 80}, "lang",
                                 default_pct=40)
            .select("doc_id", "lang").orderBy("doc_id"))


@register("corpus_contamination_overlap", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
sh AS (SELECT doc_id, {_shingle_hash_expr(5)} AS shs FROM wh),
idx AS (SELECT DISTINCT doc_id, unnest(shs) AS shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM idx
          JOIN documents USING (doc_id) WHERE source = 'src0'),
tgt AS (SELECT idx.doc_id, idx.shingle FROM idx
        JOIN documents USING (doc_id) WHERE source <> 'src0'),
sizes AS (SELECT doc_id, count(*) AS sz FROM tgt GROUP BY 1),
hits AS (SELECT doc_id, count(*) AS n_hit FROM tgt
         WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1)
SELECT s.doc_id, round(coalesce(h.n_hit, 0) / s.sz::DOUBLE, 6) AS overlap
FROM sizes s LEFT JOIN hits h USING (doc_id)
ORDER BY s.doc_id
""")
def corpus_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # train/test leakage check: every non-src0 doc scored for 5-gram
    # overlap against the src0 "benchmark" slice
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    rest = d.filter(F.col("source") != "src0")
    return CP.contamination_overlap(rest, bench, k=5).orderBy("doc_id")


def _full_curation_sql() -> str:
    # assembled from the individually-verified fragments: quality formula
    # (text_quality), idx/jaccard shape (_JACCARD_CTES, here filtered to
    # the non-benchmark slice), contamination ratio, md5 sampling bucket
    from ..functions.text import ENGLISH_STOPWORDS
    stops = ", ".join(repr(s) for s in ENGLISH_STOPWORDS)
    return f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
sh AS (SELECT doc_id, {_shingle_hash_expr(5)} AS shs FROM wh),
idx0 AS (SELECT DISTINCT doc_id, unnest(shs) AS shingle FROM sh),
nb AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
idx AS (SELECT i.doc_id, i.shingle FROM idx0 i JOIN nb USING (doc_id)),
bench AS (SELECT DISTINCT shingle FROM idx0
          JOIN documents USING (doc_id) WHERE source = 'src0'),
sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM idx a JOIN idx b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT id_a, id_b, round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b),
dupes AS (SELECT DISTINCT id_b AS doc_id FROM jac WHERE jaccard >= 0.5),
hits AS (SELECT doc_id, count(*) AS n_hit FROM idx
         WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1),
cont AS (SELECT s.doc_id,
                round(coalesce(h.n_hit, 0) / s.sz::DOUBLE, 6) AS overlap
         FROM sizes s LEFT JOIN hits h USING (doc_id)),
scored AS (
  SELECT w.doc_id,
         round((least(len(ws) / 100.0, 1.0)
                + least(round(len(list_filter(ws, x -> x IN ({stops})))
                        / len(ws)::DOUBLE, 4) * 4, 1.0)
                + round(len(list_distinct(ws)) / len(ws)::DOUBLE, 4)) / 3,
               4) AS quality
  FROM w JOIN nb USING (doc_id))
SELECT s.doc_id, s.quality, coalesce(c.overlap, 0) AS overlap
FROM scored s LEFT JOIN cont c USING (doc_id)
WHERE s.quality >= 0.43
  AND coalesce(c.overlap, 0) < 0.5
  AND s.doc_id NOT IN (SELECT doc_id FROM dupes)
  AND ('0x' || substr(md5(s.doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 50
ORDER BY s.doc_id
"""


@register("corpus_curation_full", _full_curation_sql())
def corpus_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the COMPLETE pre-training curation pass, one Catalyst plan over the
    # non-benchmark slice: quality gate + near-dup removal (keep lowest
    # id) + benchmark-contamination filter + 50% deterministic sample.
    # Every stage is an independently-verified operator; this entry
    # proves they compose without glue code.
    from ..functions.text import quality_score
    from ..operators.joins import anti_join
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    rest = d.filter(F.col("source") != "src0")

    pairs = DD.ngram_jaccard_pairs(rest, threshold=0.5, k=5)
    dupes = F.broadcast(pairs.select(F.col("id_b").alias("doc_id")).distinct())
    cont = CP.contamination_overlap(rest, bench, k=5)
    scored = rest.select("doc_id", quality_score("text").alias("quality"))

    kept = (anti_join(scored.filter(F.col("quality") >= 0.43), dupes,
                      ["doc_id"])
            .join(cont, "doc_id", "left")
            .na.fill({"overlap": 0.0})
            .filter(F.col("overlap") < 0.5)
            .filter(CP.sample_bucket("doc_id") < 50))
    return kept.select("doc_id", "quality", "overlap").orderBy("doc_id")


_AUG_SUFFIX = "@mail.example dial 555-123-4567"


@register("corpus_pii_redact", """
WITH aug AS (SELECT doc_id,
       text || ' reach me at user' || doc_id::VARCHAR
            || '""" + _AUG_SUFFIX + """' AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(t,
           '""" + CP.EMAIL_RE + """', '<EMAIL>', 'g'),
           '""" + CP.PHONE_RE + """', '<PHONE>', 'g') AS clean
FROM aug ORDER BY doc_id
""")
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every row gets a synthetic email+phone appended so the scrub is
    # exercised on the whole corpus, then redacted; output must be
    # byte-identical across engines (same RE2-safe patterns)
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(F.col("text"), F.lit(" reach me at user"),
                   F.col("doc_id").cast("string"), F.lit(_AUG_SUFFIX))
    return (d.select("doc_id", CP.redact_pii(aug).alias("clean"))
            .orderBy("doc_id"))


@register("multimodal_frame_sample", """
SELECT doc_id AS media_id,
       unnest(generate_series(0, n_chars - 1, 50))::BIGINT AS frame_ts_ms
FROM documents WHERE n_chars > 0
ORDER BY media_id, frame_ts_ms
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frame-sampling plumbing in the gate: documents stand in for media
    # assets (n_chars as duration_ms); zero/NULL-duration assets emit no
    # rows — the oracle's WHERE n_chars > 0 is the same contract.
    from ..operators import multimodal as MM
    d = load_table(spark, sf_dir, "documents")
    media = (d.select(F.col("doc_id").alias("media_id"),
                      F.encode(F.col("text"), "UTF-8").alias("bytes"),
                      "n_chars"))
    media = MM.attach_media_column(media, "bytes", "video", "raw")
    media = media.withColumn(
        "meta", F.struct(F.col("meta.media_type"), F.col("meta.format"),
                         F.col("meta.width"), F.col("meta.height"),
                         F.col("n_chars").alias("duration_ms")))
    return (MM.frame_sample_plan(media, every_ms=50)
            .orderBy("media_id", "frame_ts_ms"))


@register("corpus_repetition_filter", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                                            i -> ws[i] || ' ' || ws[i+1])) AS bigram
       FROM w),
bc AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
tp AS (SELECT doc_id, max(n) AS top_n, sum(n) AS total_bg FROM bc GROUP BY 1),
wd AS (SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct
       FROM w)
SELECT wd.doc_id,
       coalesce(round(top_n / total_bg::DOUBLE, 4), 0.0) AS top_bigram_frac,
       CASE WHEN n_words > 0
            THEN round(1 - n_distinct / n_words::DOUBLE, 4) END AS dup_word_frac,
       (coalesce(round(top_n / total_bg::DOUBLE, 4), 0.0) <= 0.18
        AND CASE WHEN n_words > 0
                 THEN round(1 - n_distinct / n_words::DOUBLE, 4) END <= 0.6)
       AS keep
FROM wd LEFT JOIN tp ON tp.doc_id = wd.doc_id
""")
def corpus_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CP.repetition_metrics(d)


@register("corpus_sequence_pack", f"""
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
def corpus_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CP.pack_sequences(d, budget=256)


@register("knn_join_blocked", """
WITH v AS (SELECT vec_id, label, embedding FROM embeddings),
cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 6) AS score
         FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id),
r AS (SELECT qid, nid, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nid) AS nn_rank
      FROM cand)
SELECT qid AS vec_id, nid AS neighbor_id, score,
       CAST(nn_rank AS BIGINT) AS nn_rank
FROM r WHERE nn_rank <= 3
""")
def knn_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_join
    e = load_table(spark, sf_dir, "embeddings")
    return knn_join(e, k=3)


@register("corpus_mixture_sample", """
WITH wts(source, w) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
cnt AS (SELECT d.source, count(*)::DOUBLE AS n_g, any_value(w) AS w
        FROM documents d JOIN wts USING (source) GROUP BY d.source),
cap AS (SELECT min(n_g / w) AS cap FROM cnt),
cut AS (SELECT source, floor(cap * w / n_g * 10000)::BIGINT AS cut
        FROM cnt, cap)
SELECT d.doc_id, d.source FROM documents d
JOIN cut USING (source)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < cut
ORDER BY d.doc_id
""")
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # data mixing: sample so the kept corpus is 50/30/20 across three
    # sources, max volume with no upsampling, deterministic md5 buckets
    d = load_table(spark, sf_dir, "documents")
    return (CP.mixture_sample(d, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
            .select("doc_id", "source").orderBy("doc_id"))


@register("corpus_temperature_mix", """
WITH cnt AS (SELECT lang, count(*)::DOUBLE AS n_g
             FROM documents GROUP BY lang),
w AS (SELECT lang, n_g, sqrt(n_g) AS w FROM cnt),
cap AS (SELECT min(n_g / w) AS cap FROM w),
cut AS (SELECT lang, floor(cap * w / n_g * 10000)::BIGINT AS cut FROM w, cap)
SELECT d.doc_id, d.lang FROM documents d
JOIN cut USING (lang)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < cut
ORDER BY d.doc_id
""")
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # temperature-scaled rebalancing (T=0.5) over the skewed lang
    # distribution: weights ∝ sqrt(n_g) flatten the mix toward uniform
    # without upsampling; deterministic md5 buckets, fact scanned once
    d = load_table(spark, sf_dir, "documents")
    return (CP.temperature_mixture_sample(d, temperature=0.5,
                                          group_col="lang")
            .select("doc_id", "lang").orderBy("doc_id"))


@register("corpus_chunk_documents", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
b AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
c AS (SELECT doc_id, ws, n,
             unnest(range(0, greatest(1, ceil((n - 8) / 24.0))::BIGINT))
                 AS chunk_id
      FROM b)
SELECT doc_id, chunk_id, (chunk_id * 24)::BIGINT AS start_tok,
       least(32, n - chunk_id * 24)::BIGINT AS n_tokens,
       array_to_string(list_slice(ws, chunk_id * 24 + 1,
                                  chunk_id * 24
                                  + least(32, n - chunk_id * 24)), ' ')
           AS chunk_text
FROM c
""")
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # overlapping token windows (size 32, overlap 8): the RAG/pretraining
    # chunking op as a pure explode — no shuffle, no Python
    d = load_table(spark, sf_dir, "documents")
    return CP.chunk_documents(d, size=32, overlap=8)


@register("corpus_source_profile", f"""
WITH w AS (SELECT doc_id, source, md5(text) AS fp, {_WORDS} AS ws
           FROM documents),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                                            i -> ws[i] || ' ' || ws[i+1])) AS bigram
       FROM w),
bc AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
tp AS (SELECT doc_id, max(n) AS top_n, sum(n) AS total_bg FROM bc GROUP BY 1),
rep AS (SELECT w.doc_id,
               (coalesce(round(top_n / total_bg::DOUBLE, 4), 0.0) <= 0.18
                AND CASE WHEN len(ws) > 0
                         THEN round(1 - len(list_distinct(ws))
                                    / len(ws)::DOUBLE, 4) END <= 0.6) AS keep
        FROM w LEFT JOIN tp ON tp.doc_id = w.doc_id)
SELECT source, count(*) AS n_docs,
       sum(len(ws))::BIGINT AS total_tokens,
       round(avg(len(ws)), 2) AS avg_tokens,
       round(1 - count(DISTINCT fp) / count(*)::DOUBLE, 4) AS dup_rate,
       round(avg(CASE WHEN keep THEN 1 ELSE 0 END), 4) AS keep_rate
FROM w JOIN rep USING (doc_id)
GROUP BY source ORDER BY source
""")
def corpus_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-source health dashboard: volume, length, dup rate, and the
    # repetition-gate pass rate, one row per source
    d = load_table(spark, sf_dir, "documents")
    return CP.source_profile(d)


def _span_hash_expr(k: int) -> str:
    # non-distinct twin of catalog_text._shingle_hash_expr: one hash per
    # window POSITION, so within-doc repeats keep every occurrence
    from .catalog_text import _B, _P
    expr = "whs[i]"
    for j in range(1, k):
        expr = f"(({expr}) * {_B} + whs[i+{j}]) % {_P}"
    return (f"CASE WHEN len(whs) >= {k} THEN "
            f"list_transform(range(1, greatest(len(whs)-{k-1}, 0)+1), "
            f"i -> {expr}) ELSE [] END")


@register("corpus_span_dedup", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
g AS (SELECT doc_id, unnest({{SPAN}}) AS span FROM wh),
tot AS (SELECT span, count(*) AS tot FROM g GROUP BY span),
per AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
               (count(*) FILTER (WHERE tot >= 2))::BIGINT AS n_dup_spans
        FROM g JOIN tot USING (span) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(per.n_spans, 0)::BIGINT AS n_spans,
       coalesce(per.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       CASE WHEN coalesce(per.n_spans, 0) > 0
            THEN round(per.n_dup_spans / per.n_spans::DOUBLE, 6)
            ELSE 0.0 END AS dup_frac,
       CASE WHEN coalesce(per.n_spans, 0) > 0
            THEN round(per.n_dup_spans / per.n_spans::DOUBLE, 6) <= 0.3
            ELSE true END AS keep
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY doc_id
""".replace("{SPAN}", _span_hash_expr(8)))
def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-substring span dedup (fixed-n Lee et al. '22): per doc, the
    # fraction of its 8-token windows occurring verbatim >= 2 times
    # corpus-wide; keep-gate at 30%
    d = load_table(spark, sf_dir, "documents")
    return CP.duplicate_span_stats(d, n=8).orderBy("doc_id")


@register("corpus_lm_perplexity", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
occ AS (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bg
        FROM w),
tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
uni AS (SELECT w AS w1, count(*) AS c1 FROM tok GROUP BY w),
bi AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg),
v AS (SELECT count(DISTINCT w) AS v FROM tok),
per AS (SELECT o.doc_id,
               round(avg(-log2((bi.c2 + 1) / (uni.c1 + v.v)::DOUBLE)), 6)
                   AS lm_score
        FROM occ o JOIN bi USING (bg) JOIN uni USING (w1), v
        GROUP BY o.doc_id)
SELECT d.doc_id, per.lm_score
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
""")
def corpus_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # self-trained bigram-LM cross-entropy per doc (add-1 smoothing):
    # the CCNet-style LM quality signal without an external model
    d = load_table(spark, sf_dir, "documents")
    return CP.lm_perplexity(d).orderBy("doc_id")


@register("corpus_exact_n_per_stratum", """
WITH r AS (SELECT doc_id, lang, source,
                  (row_number() OVER (PARTITION BY lang
                     ORDER BY md5(doc_id::VARCHAR), doc_id))::BIGINT AS rn
           FROM documents)
SELECT doc_id, lang, source FROM r WHERE rn <= 40 ORDER BY doc_id
""")
def corpus_exact_n_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-budget stratified pick: exactly min(40, |stratum|) docs per
    # language by md5-hash rank (reproducible, growth-stable)
    d = load_table(spark, sf_dir, "documents")
    return (CP.exact_n_per_stratum(d, n=40)
            .select("doc_id", "lang", "source").orderBy("doc_id"))


@register("corpus_global_shuffle", """
SELECT doc_id,
       (((doc_id % 2147483647) * 48271 + 1) % 2147483647 * 48271 + 7919)
           % 2147483647 AS shuffle_key,
       CAST(((((doc_id % 2147483647) * 48271 + 1) % 2147483647 * 48271
              + 7919) % 2147483647) % 8 AS INTEGER) AS shard_id
FROM documents
ORDER BY shard_id, shuffle_key, doc_id
""")
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic seedable epoch shuffle: two minstd-LCG rounds give a
    # pseudo-random order both engines compute bit-identically (modular
    # int64 arithmetic only — no engine hash functions)
    d = load_table(spark, sf_dir, "documents")
    return CP.global_shuffle(d, num_shards=8, seed=1)


@register("corpus_curriculum_phases", f"""
WITH w AS (SELECT text, {_WORDS} AS ws FROM documents),
s AS (SELECT round((least(len(ws) / 100.0, 1.0)
                    + least(round(len(list_filter(ws, x -> x IN ({_STOPS})))
                            / len(ws)::DOUBLE, 4) * 4, 1.0)
                    + round(len(list_distinct(ws)) / len(ws)::DOUBLE, 4))
                   / 3, 4) AS score,
             len(ws)::BIGINT AS n_tokens
      FROM w),
th AS (SELECT quantile_cont(score, 0.25) AS t1,
              quantile_cont(score, 0.50) AS t2,
              quantile_cont(score, 0.75) AS t3
       FROM s)
SELECT (1 + (score > t1)::INT + (score > t2)::INT + (score > t3)::INT)
           AS phase,
       count(*) AS n_docs,
       round(avg(score), 4) AS avg_score,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s, th
GROUP BY 1 ORDER BY phase
""")
def corpus_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    # curriculum assembly: quality-quantile difficulty phases; exact
    # percentiles here (oracle parity: quantile_cont == percentile),
    # approx_percentile at 100 TB
    d = load_table(spark, sf_dir, "documents")
    return CP.curriculum_phases(d, k=4)


def _bpe_sql(k: int = 3) -> str:
    """Unrolled-CTE oracle for ``bpe_merges`` (same pattern as the
    k-means fixed-iteration oracle): each round recounts weighted
    adjacent pairs over the vocabulary, picks the (freq DESC, pair)
    top-1 as a scalar subquery, and replays the same delimited
    single-pass replace."""
    toks = "string_split(trim(sym), ' ')"
    ctes = [f"""v0 AS (
  SELECT word, count(*) AS n,
         ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' '
             AS sym
  FROM (SELECT unnest({_WORDS}) AS word FROM documents) GROUP BY word)"""]
    for r in range(1, k + 1):
        ctes.append(f"""p{r} AS (
  SELECT pr AS pair, sum(n) AS freq
  FROM (SELECT n, unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])) AS pr
        FROM (SELECT n, {toks} AS toks FROM v{r - 1}
              WHERE len({toks}) >= 2))
  GROUP BY pr)""")
        ctes.append(f"""t{r} AS (
  SELECT pair, freq FROM p{r} ORDER BY freq DESC, pair LIMIT 1)""")
        if r < k:
            # two-pass replace, same as the operator: one LTR pass
            # consumes the next occurrence's delimiter
            rep = ("replace({s}, ' ' || (SELECT pair FROM t%d) || ' ', "
                   "' ' || replace((SELECT pair FROM t%d), ' ', '') || ' ')"
                   % (r, r))
            twice = rep.format(s=rep.format(s="sym"))
            ctes.append(f"""v{r} AS (
  SELECT word, n, {twice} AS sym
  FROM v{r - 1})""")
    unions = " UNION ALL ".join(
        f"SELECT {r} AS rank, pair, CAST(freq AS BIGINT) AS freq FROM t{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({unions}) ORDER BY rank"


@register("corpus_bpe_merges", _bpe_sql(3))
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first 3 BPE merge rules learned over the corpus; see
    # operators/corpus.bpe_merges (vocabulary-table iterations, one
    # weighted bigram hash-agg + a 1-row top-pair collect per round)
    d = load_table(spark, sf_dir, "documents")
    return CP.bpe_merges(d, n_merges=3)


@register("corpus_gopher_rules", f"""
WITH w AS (SELECT doc_id, text, {_WORDS} AS ws FROM documents),
f AS (SELECT doc_id, text, ws, len(ws) AS n,
             (length(text) - (len(ws) - 1)) / len(ws)::DOUBLE AS mean_wl,
             (len(string_split(text, '#')) - 1
              + len(string_split(text, '...')) - 1) / len(ws)::DOUBLE
                 AS sym_ratio,
             len(list_intersect(list_distinct(ws), ['a', 'and', 'as', 'at', 'by', 'for', 'in', 'is', 'it', 'of', 'on', 'the', 'to', 'with'])) AS n_stops
      FROM w)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       (n >= 20 AND n <= 100000) AS ok_word_count,
       (mean_wl >= 3.0 AND mean_wl <= 10.0) AS ok_mean_word_len,
       (sym_ratio <= 0.1) AS ok_symbol_ratio,
       (n_stops >= 2) AS ok_stopwords,
       ((n >= 20 AND n <= 100000) AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
        AND (sym_ratio <= 0.1) AND (n_stops >= 2)) AS keep
FROM f ORDER BY doc_id
""")
def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher/MassiveText rule bundle; see operators/corpus.gopher_rules
    d = load_table(spark, sf_dir, "documents")
    return CP.gopher_rules(d).orderBy("doc_id")


@register("corpus_ccnet_buckets", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
occ AS (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bg
        FROM w),
tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
uni AS (SELECT w AS w1, count(*) AS c1 FROM tok GROUP BY w),
bi AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg),
v AS (SELECT count(DISTINCT w) AS v FROM tok),
per AS (SELECT o.doc_id,
               round(avg(-log2((bi.c2 + 1) / (uni.c1 + v.v)::DOUBLE)), 6)
                   AS lm_score
        FROM occ o JOIN bi USING (bg) JOIN uni USING (w1), v
        GROUP BY o.doc_id),
scored AS (SELECT d.doc_id, d.lang, per.lm_score,
                  coalesce(per.lm_score, 1000000000.0) AS rs
           FROM documents d LEFT JOIN per USING (doc_id)),
t AS (SELECT doc_id, lang, lm_score,
             ntile(3) OVER (PARTITION BY lang ORDER BY rs, doc_id) AS tile
      FROM scored)
SELECT doc_id, lang, lm_score,
       CASE WHEN tile = 1 THEN 'head' WHEN tile = 3 THEN 'tail'
            ELSE 'middle' END AS ppl_bucket,
       tile < 3 AS keep
FROM t ORDER BY doc_id
""")
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet head/middle/tail perplexity tertiles per language over the
    # self-trained bigram-LM score; deterministic total ordering
    # (score, doc_id), scoreless docs sink to tail via sentinel
    d = load_table(spark, sf_dir, "documents")
    return CP.ccnet_buckets(d)


@register("corpus_epoch_schedule", f"""
WITH w AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
tok AS (SELECT source, CAST(sum(len(ws)) AS BIGINT) AS native_tokens
        FROM w GROUP BY source),
wt AS (SELECT source, native_tokens,
              CAST(round(pow(cast(native_tokens AS DOUBLE), 0.7), 0)
                   AS BIGINT) AS wgt
       FROM tok),
tot AS (SELECT CAST(sum(native_tokens) AS BIGINT) * 3 AS budget,
               CAST(sum(wgt) AS BIGINT) AS tw
        FROM wt)
SELECT source, native_tokens,
       round(cast(budget AS DOUBLE) * cast(wgt AS DOUBLE)
             / cast(tw AS DOUBLE), 2) AS desired_tokens,
       round(least(4.0, (cast(budget AS DOUBLE) * cast(wgt AS DOUBLE)
                         / cast(tw AS DOUBLE)) / native_tokens), 4)
           AS epochs,
       round(least(4.0 * native_tokens,
                   cast(budget AS DOUBLE) * cast(wgt AS DOUBLE)
                   / cast(tw AS DOUBLE)), 2) AS tokens_used,
       round(least(4.0, (cast(budget AS DOUBLE) * cast(wgt AS DOUBLE)
                         / cast(tw AS DOUBLE)) / native_tokens), 4) = 4.0
           AS capped
FROM wt, tot ORDER BY source
""")
def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    # data-constrained epoch allocation: 3x-corpus token budget split by
    # tokens^0.7 with a 4-epoch repeat cap; integer-rounded weights keep
    # the normalizer an exact integer sum on both engines
    d = load_table(spark, sf_dir, "documents")
    return CP.epoch_schedule(d)


@register("corpus_feature_hash", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
x AS (SELECT doc_id, unnest(whs) % 64 AS bucket FROM wh)
SELECT doc_id, bucket::BIGINT AS bucket, count(*)::BIGINT AS cnt
FROM x GROUP BY doc_id, bucket ORDER BY doc_id, bucket
""")
def corpus_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashing-trick featurization: token -> md5-hash mod 64 buckets,
    # sparse (doc, bucket, count) rows — vocabulary-free fixed-width
    # text features; one map-side-combinable wordcount-shaped agg
    d = load_table(spark, sf_dir, "documents")
    return CP.feature_hash_counts(d, dim=64)


@register("corpus_bm25_search", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
base AS (SELECT doc_id, ws FROM w WHERE len(ws) > 0),
dl AS (SELECT doc_id, len(ws)::BIGINT AS dl FROM base),
n AS (SELECT count(*)::BIGINT AS nd,
             CAST(sum(dl) AS BIGINT) AS sdl FROM dl),
tok AS (SELECT doc_id, unnest(ws) AS term FROM base),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM tok WHERE term IN ('spark', 'join', 'scan')
       GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              round(sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                        * tf * (1.2 + 1)
                        / (tf + 1.2 * (1.0 - 0.75
                                       + 0.75 * dl
                                         / (cast(sdl AS DOUBLE) / nd)))),
                    6) AS score
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n
       GROUP BY tf.doc_id),
top AS (SELECT doc_id, score FROM sc
        ORDER BY score DESC, doc_id LIMIT 20)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
FROM top
""")
def corpus_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 lexical retrieval for a fixed query bag — token stream
    # semi-joined to the query terms before any aggregation, so work
    # scales with matches, not corpus tokens
    d = load_table(spark, sf_dir, "documents")
    return CP.bm25_search(d, ["spark", "join", "scan"], k=20)


@register("corpus_cms_heavy_hitters", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
tok AS (SELECT unnest(ws) AS term FROM w),
cnts AS (SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY term),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cnts),
rows AS (
  SELECT r.row, ('0x' || substr(md5('cms' || r.row || term), 1, 15))::BIGINT
             % 256 AS bucket, cnt
  FROM cnts, (SELECT unnest([0, 1, 2, 3]) AS row) r),
sketch AS (SELECT row, bucket, CAST(sum(cnt) AS BIGINT) AS bcnt
           FROM rows GROUP BY row, bucket),
top_terms AS (SELECT term, cnt AS true_cnt FROM cnts
              ORDER BY cnt DESC, term LIMIT 20),
probes AS (
  SELECT t.term, t.true_cnt, r.row,
         ('0x' || substr(md5('cms' || r.row || t.term), 1, 15))::BIGINT
             % 256 AS bucket
  FROM top_terms t, (SELECT unnest([0, 1, 2, 3]) AS row) r),
est AS (SELECT p.term, p.true_cnt, min(s.bcnt) AS cms_estimate
        FROM probes p JOIN sketch s USING (row, bucket)
        GROUP BY p.term, p.true_cnt)
SELECT term, true_cnt, cms_estimate,
       cms_estimate - true_cnt AS overcount,
       (cms_estimate - true_cnt) * 256 <= 3 * n AS within_bound
FROM est, n
ORDER BY true_cnt DESC, term
""")
def corpus_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-Min-Sketch heavy hitters with the ceil(e*N/w) error-bound
    # audit in-query: the mergeable fixed-size counter a streaming
    # 100 TB pipeline ships, audited against exact counts
    d = load_table(spark, sf_dir, "documents")
    return CP.cms_heavy_hitters(d, top=20)


@register("corpus_hash_embedding", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
x AS (SELECT doc_id, unnest(whs) % 64 AS bucket FROM wh),
cnts AS (SELECT doc_id, bucket::BIGINT AS bucket, count(*)::BIGINT AS cnt
         FROM x GROUP BY doc_id, bucket),
js AS (SELECT doc_id, j.component, bucket, cnt
       FROM cnts, (SELECT unnest(range(0, 16)) AS component) j),
signed AS (SELECT doc_id, component,
                  CASE WHEN ('0x' || substr(md5('proj' || bucket || '_'
                                            || component), 1, 15))::BIGINT
                            % 2 = 0
                       THEN cnt ELSE -cnt END AS sv
           FROM js)
SELECT doc_id, component::BIGINT AS component,
       CAST(sum(sv) AS BIGINT) AS value
FROM signed GROUP BY doc_id, component
ORDER BY doc_id, component
""")
def corpus_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # signed-random-projection pseudo-embedding from hashed bucket
    # counts (±1 matrix seeded by md5 parity) — model-free, all-integer,
    # the bridge from raw text into the ANN/blocking family
    d = load_table(spark, sf_dir, "documents")
    return CP.hash_embedding(d, dim=16, buckets=64)


@register("corpus_phrase_search", f"""
WITH pw AS (SELECT ['key', 'order', 'sort'] AS ws),
pwh AS (SELECT list_transform(ws, w ->
            ('0x' || substr(md5(w), 1, 15))::BIGINT % 2147483647) AS whs
        FROM pw),
ph AS (SELECT ((whs[1] * 131 + whs[2]) % 2147483647 * 131 + whs[3])
               % 2147483647 AS phash
       FROM pwh),
w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
g AS (SELECT doc_id, unnest({{SPAN}}) AS span FROM wh),
cand AS (SELECT doc_id, count(*)::BIGINT AS n_hash_hits
         FROM g, ph WHERE span = phash GROUP BY doc_id)
SELECT c.doc_id, c.n_hash_hits,
       contains(d.text, 'key order sort') AS verified
FROM cand c JOIN documents d USING (doc_id)
ORDER BY c.doc_id
""".replace("{{SPAN}}", "{SPAN}").replace(
    "{SPAN}", _span_hash_expr(3)))
def corpus_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact phrase search, two-phase: span-hash candidates (the dedup
    # index's 31-bit polynomial — at scale an existing span-partitioned
    # index) then raw-text verification of candidates only
    d = load_table(spark, sf_dir, "documents")
    return CP.phrase_search(d, ["key", "order", "sort"])


@register("corpus_cv_folds", """
WITH f AS (SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 5
               AS fold, lang
           FROM documents),
cnt AS (SELECT fold, lang, count(*)::BIGINT AS n FROM f GROUP BY fold, lang),
tot AS (SELECT fold, CAST(sum(n) AS BIGINT) AS fold_total
        FROM cnt GROUP BY fold),
g AS (SELECT CAST(sum(n) AS BIGINT) AS gt FROM cnt)
SELECT c.fold, c.lang, c.n, t.fold_total,
       round(cast(t.fold_total AS DOUBLE) / g.gt, 4) AS fold_share,
       abs(round(cast(t.fold_total AS DOUBLE) / g.gt, 4) - 0.2) <= 0.05
           AS balanced
FROM cnt c JOIN tot t USING (fold), g
ORDER BY c.fold, c.lang
""")
def corpus_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reproducible k-fold assignment by portable id hash + the balance
    # audit (hash folds are binomial, not exact-n — the audit makes
    # that observable)
    d = load_table(spark, sf_dir, "documents")
    return CP.cv_fold_assignment(d, k=5)


# the interleaved image-text item relation (doc_id, ref, k1, k2,
# modality, tokens) — the ONE definition shared by
# multimodal_interleaved_pack here and multimodal_shard_balance
# (catalog_round12): a second copy would silently desync the two on
# any chunking change
_MM_ITEMS_CTE = f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
b AS (SELECT doc_id, len(ws) AS n FROM w WHERE len(ws) > 0),
tc AS (SELECT doc_id, n,
              unnest(range(0, greatest(1, ceil(n / 32.0))::BIGINT))
                  AS ref
       FROM b),
t AS (SELECT doc_id, ref, ref AS k1, 0 AS k2, 'text' AS modality,
             least(32, n - ref * 32)::BIGINT AS tokens
      FROM tc),
im AS (SELECT doc_id, unnest(range(0, n_chars // 100)) AS ref
       FROM documents WHERE n_chars >= 100),
i AS (SELECT doc_id, ref, ref AS k1, 1 AS k2, 'image' AS modality,
             16::BIGINT AS tokens
      FROM im),
u AS (SELECT * FROM t UNION ALL SELECT * FROM i)"""


@register("multimodal_interleaved_pack", _MM_ITEMS_CTE + """
SELECT doc_id,
       (row_number() OVER wd - 1)::BIGINT AS position,
       modality, ref, tokens,
       (CAST(sum(tokens) OVER (wd ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) - tokens)
           AS token_offset
FROM u
WINDOW wd AS (PARTITION BY doc_id ORDER BY k1, k2)
ORDER BY doc_id, position
""")
def multimodal_interleaved_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interleaved image-text sample assembly (MMC4/OBELICS shape):
    # text chunks with media placeholders slotted between them, emitted
    # as position-ordered (modality, ref, tokens, token_offset) rows —
    # refs only, pixels never shuffle through curriculum planning
    from ..operators.multimodal import interleaved_pack
    d = load_table(spark, sf_dir, "documents")
    return interleaved_pack(d)


@register("corpus_dsir_selection", f"""
WITH w AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
wh AS (SELECT doc_id, source, {_WORD_HASHES} AS whs FROM w),
x AS (SELECT doc_id, source, unnest(whs) % 1024 AS bucket FROM wh),
tc AS (SELECT bucket, count(*) AS ct FROM x
       WHERE source = 'src1' GROUP BY bucket),
pc AS (SELECT bucket, count(*) AS cr FROM x
       WHERE source <> 'src1' GROUP BY bucket),
nt AS (SELECT CAST(sum(ct) AS BIGINT) AS n_t FROM tc),
nr AS (SELECT CAST(sum(cr) AS BIGINT) AS n_r FROM pc),
lr AS (SELECT pc.bucket,
              CAST(round(1e6 * (
                  ln((coalesce(tc.ct, 0) + 0.5) / (nt.n_t + 512.0))
                - ln((pc.cr + 0.5) / (nr.n_r + 512.0))), 0) AS BIGINT)
                  AS lrm
       FROM pc LEFT JOIN tc USING (bucket), nt, nr),
db AS (SELECT doc_id, source, bucket, count(*) AS c
       FROM x WHERE source <> 'src1' GROUP BY 1, 2, 3),
wt AS (SELECT doc_id, source,
              CAST(sum(c * lrm) AS BIGINT) AS weight_e6
       FROM db JOIN lr USING (bucket) GROUP BY doc_id, source)
SELECT doc_id, source, weight_e6 FROM wt
ORDER BY weight_e6 DESC, doc_id LIMIT 50
""")
def corpus_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR (Xie '23): importance-weight candidate docs by the hashed-
    # unigram log-likelihood ratio against the src1 target domain;
    # deterministic top-50 with exact BIGINT dot-product weights
    d = load_table(spark, sf_dir, "documents")
    return CP.dsir_select(d, target_source="src1", dim=1024, k=50)


@register("corpus_winnowing_fingerprints", f"""
WITH sm AS (SELECT doc_id, text FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 100 < 10),
w AS (SELECT doc_id, {_WORDS} AS ws FROM sm),
wh AS (SELECT doc_id, {_WORD_HASHES} AS whs FROM w),
sh AS (SELECT doc_id,
              unnest(list_transform(
                range(1, greatest(len(whs) - 2, 0) + 1),
                i -> ((((whs[i]) * 131 + whs[i+1]) % 2147483647 * 131 + whs[i+2]) % 2147483647) * 1048576 + (i - 1))) AS key
       FROM wh),
x AS (SELECT doc_id, key % 1048576 AS pos, key FROM sh),
m AS (SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      FROM x),
fp AS (SELECT DISTINCT doc_id, sel FROM m WHERE pos >= 3)
SELECT doc_id,
       CAST(sel % 1048576 AS BIGINT) AS fp_pos,
       CAST(sel // 1048576 AS BIGINT) AS fp_hash
FROM fp ORDER BY doc_id, fp_pos
""")
def corpus_winnowing_fingerprints(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    # winnowing (MOSS) fingerprints: per-window min of k-gram hashes
    # with a branch-free (hash, position) integer encoding; emitted for
    # a deterministic 10% doc sample to bound gate output
    d = load_table(spark, sf_dir, "documents")
    return CP.winnowing_fingerprints(d, k=3, w=4, sample_pct=10)


@register("corpus_zipf_fit", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
tok AS (SELECT unnest(ws) AS term FROM w),
tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term
       ORDER BY cnt DESC, term LIMIT 500),
xy AS (SELECT
         CAST(round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, term)
                            AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
       FROM tf),
a AS (SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sx2,
             CAST(sum(y * y) AS BIGINT) AS sy2
      FROM xy),
m AS (SELECT n,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                   / CAST(n AS DOUBLE) AS cov,
             CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                   / CAST(n AS DOUBLE) AS vx,
             CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                                   / CAST(n AS DOUBLE) AS vy,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
      FROM a)
SELECT n AS n_terms,
       round(cov / vx, 6) AS slope,
       round((my - (cov / vx) * mx) / 1e6, 6) AS intercept,
       round(cov * cov / (vx * vy), 6) AS r2
FROM m
""")
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zipf-law OLS over the top-500 term frequencies: ln terms
    # quantized to 1e-6 integers, exact BIGINT moments, identical IEEE
    # slope/intercept/R^2 chains (operators/corpus.zipf_fit)
    d = load_table(spark, sf_dir, "documents")
    return CP.zipf_fit(d, top_n=500)


@register("corpus_token_stats", f"""
WITH b AS (
  SELECT lang,
         len({_WORDS}) AS n_words,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
             AS n_subtok
  FROM documents
), a AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS words,
         CAST(sum(n_subtok) AS BIGINT) AS subtokens
  FROM b GROUP BY lang
)
SELECT lang, n_docs, words, subtokens,
       CASE WHEN subtokens >= 0
            THEN CAST(floor((2 * (subtokens * 1000000) + words)
                            / (2 * words)) AS BIGINT)
            ELSE -CAST(floor((2 * -(subtokens * 1000000) + words)
                             / (2 * words)) AS BIGINT)
       END / 1000000.0 AS fertility
FROM a ORDER BY lang
""")
def corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language tokenizer fertility: whitespace words vs GPT-2-style
    # pre-tokenizer counts; one half-away integer division per language
    d = load_table(spark, sf_dir, "documents")
    return CP.token_stats_by_lang(d)


@register("corpus_ngram_novelty", f"""
WITH w AS (SELECT source, {_WORDS} AS ws FROM documents),
wh AS (SELECT source, {_WORD_HASHES} AS whs FROM w),
sh AS (SELECT source, {_shingle_hash_expr(3)} AS shs FROM wh),
idx AS (SELECT DISTINCT source, unnest(shs) AS shingle FROM sh),
cnt AS (SELECT shingle, count(*) AS ns FROM idx GROUP BY shingle),
per AS (SELECT i.source,
               count(*) AS total,
               CAST(sum(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS novel
        FROM idx i JOIN cnt c USING (shingle) GROUP BY i.source)
SELECT source, total, novel,
       CAST(floor((2 * (novel * 1000000) + total) / (2 * total))
            AS BIGINT) / 1000000.0 AS novelty
FROM per ORDER BY source
""")
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source share of 3-gram shingles unique to that source —
    # inverted-index shape, exact counts, one half-away division
    d = load_table(spark, sf_dir, "documents")
    return CP.ngram_novelty_by_source(d, k=3)


@register("corpus_dataset_card", f"""
WITH a AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_WORDS})) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en
  FROM documents
)
SELECT n_docs, n_tokens, n_chars, n_langs, n_sources,
       CAST(floor((2 * (n_tokens * 1000000) + n_docs) / (2 * n_docs))
            AS BIGINT) / 1000000.0 AS mean_tokens,
       CAST(floor((2 * (n_en * 1000000) + n_docs) / (2 * n_docs))
            AS BIGINT) / 1000000.0 AS en_share
FROM a
""")
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-row corpus release card: exact counts + half-away ratios,
    # single map-side-combinable scan
    d = load_table(spark, sf_dir, "documents")
    return CP.dataset_card(d)
