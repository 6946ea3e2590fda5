"""Corpus-statistics operators: vocab, bigrams, TF-IDF, sampling,
contamination, PII redaction (operators/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators import corpus as CP


def docs_of(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_vocab_counts_tf_and_df(spark):
    d = docs_of(spark, ["a a b", "a c"])
    rows = {r["term"]: (r["tf"], r["df"])
            for r in CP.vocab_top_terms(d, n=10).collect()}
    assert rows == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}


def test_bigram_counts_adjacent_pairs_only(spark):
    d = docs_of(spark, ["x y x y", "x y", "solo"])
    rows = {r["bigram"]: r["n"]
            for r in CP.bigram_counts(d, min_count=1).collect()}
    # "x y" appears twice in doc0 + once in doc1; "y x" bridges inside doc0
    assert rows == {"x y": 3, "y x": 1}


def test_tfidf_distinctive_term_ranks_first(spark):
    d = docs_of(spark, ["common rare rare", "common", "common"])
    top = {r["doc_id"]: r["term"]
           for r in CP.tfidf_top_terms(d, k=1).collect()}
    # 'common' is in every doc -> idf 0; 'rare' dominates doc 0
    assert top[0] == "rare"


def test_deterministic_sample_stable_and_nested(spark):
    d = docs_of(spark, [f"doc {i}" for i in range(200)])
    s10 = {r["doc_id"] for r in CP.deterministic_sample(d, 10).collect()}
    s10b = {r["doc_id"] for r in CP.deterministic_sample(d, 10).collect()}
    s20 = {r["doc_id"] for r in CP.deterministic_sample(d, 20).collect()}
    assert s10 == s10b          # reproducible
    assert s10 <= s20           # composable: smaller sample nests in larger
    assert 0 < len(s10) < 200


def test_contamination_full_and_zero_overlap(spark):
    bench = docs_of(spark, ["one two three four five six"])
    # doc 0 copies a benchmark doc; doc 1 shares no 5-gram
    tgt = docs_of(spark, ["one two three four five six",
                          "alpha beta gamma delta epsilon zeta"])
    rows = {r["doc_id"]: r["overlap"]
            for r in CP.contamination_overlap(tgt, bench, k=5).collect()}
    assert rows[0] == 1.0 and rows[1] == 0.0


def test_contamination_short_docs_emit_no_row(spark):
    bench = docs_of(spark, ["one two three four five"])
    tgt = docs_of(spark, ["too short"])
    assert CP.contamination_overlap(tgt, bench, k=5).count() == 0


def test_redact_pii_masks_email_and_phone(spark):
    d = docs_of(spark, ["mail bob.smith+x@corp.example.org or 555-123-4567 now"])
    out = d.select(CP.redact_pii("text").alias("t")).collect()[0]["t"]
    assert out == "mail <EMAIL> or <PHONE> now"


def test_stratified_sample_rates_and_determinism(spark):
    d = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(400)],
        "doc_id long, lang string")
    out = CP.stratified_sample(d, {"en": 0, "zh": 100}, "lang",
                               default_pct=0).collect()
    # en fully dropped, zh fully kept
    assert all(r["lang"] == "zh" for r in out)
    assert len(out) == 200
    # a stratum's sample is exactly the deterministic sample at its rate
    half = CP.stratified_sample(d, {"zh": 30}, "lang", default_pct=0)
    flat = CP.deterministic_sample(d.filter("lang = 'zh'"), 30)
    assert sorted(r["doc_id"] for r in half.collect()) == \
        sorted(r["doc_id"] for r in flat.collect())
