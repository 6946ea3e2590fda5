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


def test_repetition_metrics_flags_loops(spark):
    d = docs_of(spark, ["a b a b a b",          # top bigram "a b" 3/5
                        "one two three four five six seven eight nine ten eleven",
                        "solo"])
    rows = {r["doc_id"]: r for r in CP.repetition_metrics(d).collect()}
    assert rows[0]["top_bigram_frac"] == 0.6
    assert round(rows[0]["dup_word_frac"], 4) == round(1 - 2 / 6, 4)
    assert not rows[0]["keep"]
    assert rows[1]["top_bigram_frac"] == 0.1  # all bigrams unique, 1/10
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["keep"]
    # single word: no bigrams -> 0.0, still judged on dup fraction
    assert rows[2]["top_bigram_frac"] == 0.0
    assert rows[2]["keep"]


def test_pack_sequences_concat_and_chunk(spark):
    d = spark.createDataFrame(
        [(0, "s", "w " * 3), (1, "s", "w " * 4), (2, "s", "w " * 2),
         (3, "t", "w " * 9)],
        "doc_id long, source string, text string")
    rows = {r["doc_id"]: r for r in CP.pack_sequences(d, budget=5).collect()}
    # source s: cum_before 0,3,7 -> packs 0,0,1; offsets 0,3,2
    assert (rows[0]["pack_id"], rows[0]["pack_offset"]) == (0, 0)
    assert (rows[1]["pack_id"], rows[1]["pack_offset"]) == (0, 3)
    assert (rows[2]["pack_id"], rows[2]["pack_offset"]) == (1, 2)
    # source t packs independently
    assert (rows[3]["pack_id"], rows[3]["pack_offset"]) == (0, 0)


def test_knn_join_blocked_exact_within_block(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import knn_join
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.0, 1.0], 0),
         (4, [1.0, 0.0], 1)],
        "vec_id long, embedding array<double>, label int")
    rows = [(r["vec_id"], r["neighbor_id"], r["nn_rank"])
            for r in knn_join(emb, k=1).collect()]
    # vec 4 is identical to vec 1 but blocked apart -> never its neighbor
    assert (1, 2, 1) in rows and (2, 1, 1) in rows
    assert all(n != 4 for q, n, _ in rows if q != 4)
    # vec 4 alone in its block: no candidates at all
    assert all(q != 4 for q, _, _ in rows)


def test_mixture_sample_matches_target_distribution(spark):
    import collections
    d = spark.createDataFrame(
        [(i, "a" if i < 400 else "b", "t") for i in range(600)],
        "doc_id long, source string, text string")
    kept = collections.Counter(
        r["source"] for r in
        CP.mixture_sample(d, {"a": 0.5, "b": 0.5},
                          group_col="source").collect())
    # b is binding (200 docs at weight .5 -> cap 400): a downsamples to
    # ~200 and b keeps ~all; proportions within hash-bucket noise
    assert kept["b"] > 180
    assert abs(kept["a"] - kept["b"]) < 40
    # no upsampling ever
    assert kept["a"] <= 400 and kept["b"] <= 200
    # deterministic: same call, same sample
    again = collections.Counter(
        r["source"] for r in
        CP.mixture_sample(d, {"a": 0.5, "b": 0.5},
                          group_col="source").collect())
    assert kept == again


def test_mixture_sample_drops_unweighted_groups(spark):
    d = spark.createDataFrame(
        [(1, "a", "t"), (2, "zzz", "t")],
        "doc_id long, source string, text string")
    rows = CP.mixture_sample(d, {"a": 1.0}).collect()
    assert all(r["source"] == "a" for r in rows)


def test_knn_join_arrow_equals_sql(spark):
    import random

    from stock_data_etl_pipeline_spark.operators.similarity import knn_join
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    key = lambda r: (r["vec_id"], r["neighbor_id"], r["nn_rank"])
    a = sorted(map(key, knn_join(emb, k=4, impl="arrow").collect()))
    b = sorted(map(key, knn_join(emb, k=4, impl="sql").collect()))
    assert a == b


def test_chunk_documents_windows_and_tail(spark):
    d = docs_of(spark, [" ".join(f"w{i}" for i in range(10)), "a b", ""])
    out = sorted(
        ((r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"],
          r["chunk_text"])
         for r in CP.chunk_documents(d, size=4, overlap=2).collect()))
    # doc0: 10 tokens, stride 2 -> ceil(8/2)=4 chunks; last is short
    d0 = [c for c in out if c[0] == 0]
    assert [(c[1], c[2], c[3]) for c in d0] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)]
    assert d0[0][4] == "w0 w1 w2 w3"
    assert d0[-1][4] == "w6 w7 w8 w9"
    # doc1 shorter than size: one whole-doc chunk; empty doc2: no rows
    assert [(c[1], c[3], c[4]) for c in out if c[0] == 1] == [(0, 2, "a b")]
    assert not [c for c in out if c[0] == 2]
    # overlap: consecutive chunks share exactly `overlap` tokens
    assert d0[0][4].split()[-2:] == d0[1][4].split()[:2]


def test_span_dedup_cross_doc_and_within_doc(spark):
    # doc0 and doc1 share their full 4-token span; doc2 repeats its own
    # span twice; doc3 is unique; doc4 is shorter than n
    d = docs_of(spark, [
        "a b c d",              # span abcd occurs in doc0 + doc1
        "a b c d",
        "p q r s p q r s",      # spans at pos 0 and 4 are identical
        "w x y z",              # unique span
        "too short",            # < n tokens -> no spans, keep
    ])
    out = {r["doc_id"]: r for r in
           CP.duplicate_span_stats(d, n=4, max_dup_frac=0.5).collect()}
    assert (out[0]["n_spans"], out[0]["n_dup_spans"]) == (1, 1)
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (1, 1)
    # doc2 has 5 windows of 4 tokens; pos0 (pqrs) and pos4 (pqrs) repeat
    assert out[2]["n_spans"] == 5
    assert out[2]["n_dup_spans"] == 2
    assert out[2]["dup_frac"] == 0.4
    assert (out[3]["n_dup_spans"], out[3]["keep"]) == (0, True)
    assert (out[4]["n_spans"], out[4]["dup_frac"], out[4]["keep"]) == \
        (0, 0.0, True)
    assert not out[0]["keep"] and not out[1]["keep"]  # dup_frac 1.0 > 0.5


def test_span_dedup_counts_bounded(spark):
    # n_dup_spans <= n_spans and n_spans == max(0, n_tokens - n + 1)
    texts = ["one two three four five", "one two", "", "a a a a a a"]
    d = docs_of(spark, texts)
    for r in CP.duplicate_span_stats(d, n=3).collect():
        n_tok = len([w for w in texts[r["doc_id"]].split(" ") if w])
        assert r["n_spans"] == max(0, n_tok - 3 + 1)
        assert 0 <= r["n_dup_spans"] <= r["n_spans"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_lm_perplexity_ranks_common_transitions_cheaper(spark):
    # "a b" dominates the corpus, so doc0 (all a->b transitions) must
    # score lower cross-entropy than doc2's one-off transitions;
    # single-token doc has no bigram positions -> NULL
    d = docs_of(spark, ["a b a b a b", "a b", "x y", "solo"])
    out = {r["doc_id"]: r["lm_score"]
           for r in CP.lm_perplexity(d).collect()}
    assert out[0] < out[2]
    assert out[3] is None
    assert all(v is None or v > 0 for v in out.values())


def test_exact_n_per_stratum_counts_and_stability(spark):
    d = spark.createDataFrame(
        [(i, "t", "en" if i % 3 else "zh") for i in range(30)],
        "doc_id long, text string, lang string")
    take2 = {r["doc_id"] for r in
             CP.exact_n_per_stratum(d, 2, strata_col="lang").collect()}
    from collections import Counter
    langs = Counter("zh" if i % 3 == 0 else "en" for i in take2)
    assert langs == {"en": 2, "zh": 2}
    # nested stability: the 2-per-stratum pick is inside the 5-per pick
    take5 = {r["doc_id"] for r in
             CP.exact_n_per_stratum(d, 5, strata_col="lang").collect()}
    assert take2 <= take5
    # small stratum: asking for more than exists returns all of it
    tiny = d.filter("doc_id < 4")  # zh has only 2 docs (0, 3)
    got = CP.exact_n_per_stratum(tiny, 10, strata_col="lang").count()
    assert got == 4

def test_temperature_mix_flattens_skew(spark):
    import collections
    # 400 'a' vs 100 'b': T=0.5 weights sqrt(400)=20 vs sqrt(100)=10 ->
    # target 2:1 instead of natural 4:1; b binds (keeps ~all), a
    # downsamples to ~2x b
    d = spark.createDataFrame(
        [(i, "a" if i < 400 else "b", "t") for i in range(500)],
        "doc_id long, source string, text string")
    kept = collections.Counter(
        r["source"] for r in
        CP.temperature_mixture_sample(d, temperature=0.5,
                                      group_col="source").collect())
    assert kept["b"] > 90  # binding group keeps ~everything
    ratio = kept["a"] / kept["b"]
    assert 1.6 < ratio < 2.4  # flattened from 4:1 toward 2:1


def test_temperature_one_is_natural_mix(spark):
    d = spark.createDataFrame(
        [(i, "a" if i < 300 else "b", "t") for i in range(400)],
        "doc_id long, source string, text string")
    kept = CP.temperature_mixture_sample(d, temperature=1.0,
                                         group_col="source").count()
    # T=1 -> weights proportional to counts -> every rate ~1, all kept
    # (modulo the documented 9999/10000 floor epsilon)
    assert kept >= 398


def test_global_shuffle_is_seeded_permutation(spark):
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.corpus import global_shuffle
    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = global_shuffle(docs, num_shards=8, seed=1).collect()
    # permutation: every doc exactly once
    assert sorted(r["doc_id"] for r in s1) == list(range(1000))
    # sharding: all 8 shards populated, shard = key mod shards
    assert {r["shard_id"] for r in s1} == set(range(8))
    assert all(r["shard_id"] == r["shuffle_key"] % 8 for r in s1)
    # deterministic: same seed -> same order
    s1b = global_shuffle(docs, num_shards=8, seed=1).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s1b]
    # a different seed -> a different permutation (epoch re-shuffle)
    s2 = global_shuffle(docs, num_shards=8, seed=2).collect()
    assert [r["doc_id"] for r in s1] != [r["doc_id"] for r in s2]
    # keys look shuffled, not id-ordered, within a shard
    shard0 = [r["doc_id"] for r in s1 if r["shard_id"] == 0]
    assert shard0 != sorted(shard0)
    # no global window in the plan (the op must stay shardable)
    plan = global_shuffle(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_curriculum_phases_partition_the_corpus(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        curriculum_phases,
    )
    docs = spark.createDataFrame(
        [(i, ("word " * (5 + i)).strip()) for i in range(100)],
        "doc_id long, text string")
    out = curriculum_phases(docs, k=4).collect()
    assert [r["phase"] for r in out] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in out) == 100
    # quality_score is monotone in doc length here, so phase averages
    # must strictly increase easy -> hard
    scores = [r["avg_score"] for r in out]
    assert scores == sorted(scores) and len(set(scores)) == 4


def test_zorder_key_interleaves_and_localizes(spark):
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.layout import zorder_key
    # a 16x16 grid: zkey must equal the hand-computed Morton number
    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y"))
    out = zorder_key(grid, ["x", "y"], bits=4).collect()

    def morton(x, y):
        z = 0
        for b in range(4):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    # ranks: x,y in [0,15] scale exactly onto [0,15] for bits=4
    for r in out:
        assert r["zkey"] == morton(r["x"], r["y"])
    # locality: sorting by zkey keeps both coordinates bounded within
    # any 4-row run (the property that makes footer stats prune)
    ordered = sorted(out, key=lambda r: r["zkey"])
    for i in range(0, 256, 4):
        run = ordered[i:i + 4]
        assert max(r["x"] for r in run) - min(r["x"] for r in run) <= 1
        assert max(r["y"] for r in run) - min(r["y"] for r in run) <= 1


def test_bpe_merges_learns_and_applies(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import bpe_merges
    # 'abab' x3 + 'ab' x2: round 1 must merge 'a b' (freq 8 = 2 per
    # 'abab' x3 + 1 per 'ab' x2); round 2 then sees 'ab ab' and merges
    # it (freq 3) — proving merges feed later rounds
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string")
    out = bpe_merges(docs, n_merges=2).collect()
    assert [(r["rank"], r["pair"], r["freq"]) for r in out] == [
        (1, "a b", 8), (2, "ab ab", 3)]


def test_bpe_merges_skips_short_words(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import bpe_merges
    docs = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string")
    # all words are single chars -> no pairs -> no merges, empty result
    assert bpe_merges(docs, n_merges=2).collect() == []


def test_global_shuffle_handles_negative_and_sparse_ids(spark):
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.corpus import global_shuffle
    ids = [-5, -1, 0, 3, 1_000_000_007, 2**40]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = global_shuffle(docs, num_shards=8, seed=9).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(ids)
    for r in out:
        assert 0 <= r["shard_id"] < 8, r
        assert r["shuffle_key"] >= 0, r


def test_ccnet_buckets_orders_by_lm_score(spark):
    # 9 docs, one lang: three repeat common bigrams heavily (low
    # cross-entropy -> head), three are rarer, three are 1-token docs
    # (no score -> sentinel -> tail); tertiles are equal-size
    common = "the cat sat on the mat " * 5
    texts = [common, common + "again", common + "anew",
             "some middling words appear here twice " * 2,
             "other middling words appear there twice " * 2,
             "more middling words appear where twice " * 2,
             "x", "y", "z"]
    d = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in CP.ccnet_buckets(d).collect()}
    assert len(rows) == 9
    buckets = [rows[i]["ppl_bucket"] for i in range(9)]
    assert buckets.count("head") == buckets.count("middle") \
        == buckets.count("tail") == 3
    # the scoreless 1-token docs sit in the tail and are dropped
    for i in (6, 7, 8):
        assert rows[i]["lm_score"] is None
        assert rows[i]["ppl_bucket"] == "tail" and not rows[i]["keep"]
    # scored docs: every head score <= every middle score
    head = [rows[i]["lm_score"] for i in range(9)
            if rows[i]["ppl_bucket"] == "head"]
    mid = [rows[i]["lm_score"] for i in range(9)
           if rows[i]["ppl_bucket"] == "middle"]
    assert max(head) <= min(mid)
    assert all(rows[i]["keep"] for i in range(9)
               if rows[i]["ppl_bucket"] in ("head", "middle"))


def test_epoch_schedule_caps_and_upweights_small_sources(spark):
    # big source: 900 tokens; small source: 9 tokens. With a 3x budget
    # and T=0.7 the small source hits the 4-epoch cap; totals respect
    # the budget direction (used <= desired, used <= 4x native)
    rows = [(i, "w " * 9, "big") for i in range(100)]
    rows.append((1000, "w " * 9, "small"))
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in CP.epoch_schedule(d).collect()}
    big, small = out["big"], out["small"]
    assert big["native_tokens"] == 900 and small["native_tokens"] == 9
    # small source's share under T=0.7 far exceeds 4 epochs -> capped
    assert small["capped"] and small["epochs"] == 4.0
    assert small["tokens_used"] == 4.0 * 9
    # big source absorbs the rest, uncapped, epochs near but under 4
    assert not big["capped"] and 0 < big["epochs"] < 4.0
    assert big["tokens_used"] <= big["desired_tokens"]
    # allocation never exceeds the per-source cap or the global budget
    assert (big["tokens_used"] + small["tokens_used"]
            <= 3 * (900 + 9) + 1e-6)


def test_feature_hash_counts_sum_to_tokens_and_collide_consistently(spark):
    d = docs_of(spark, ["a b a c", "a", ""])
    rows = CP.feature_hash_counts(d, dim=8).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 <= r["bucket"] < 8
    # counts per doc sum to its token count; empty doc emits nothing
    assert sum(r["cnt"] for r in per_doc[0]) == 4
    assert sum(r["cnt"] for r in per_doc[1]) == 1
    assert 2 not in per_doc
    # the same token hashes to the same bucket everywhere: doc1's only
    # token 'a' lands in a bucket that doc0 also counted 'a' into
    a_bucket = per_doc[1][0]["bucket"]
    assert any(r["bucket"] == a_bucket and r["cnt"] >= 2
               for r in per_doc[0])


def test_bm25_rewards_rare_terms_and_penalizes_length(spark):
    d = docs_of(spark, [
        "rare word here",                  # doc0: has the rare term
        "common common common",            # doc1: only common terms
        "rare " + "pad " * 50,             # doc2: rare term, long doc
        "common rare",                     # doc3: both, short
    ])
    out = CP.bm25_search(d, ["rare", "common"], k=10).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    ranks = {r["doc_id"]: r["rank"] for r in out}
    # 'rare' (df=3) outscores 'common' (df=2)? No: df(rare)=3 > df(common)=2
    # -> idf(common) > idf(rare); doc3 holds both terms and is shortest
    assert ranks[3] == 1
    # length normalization: the padded doc2 scores below the short doc0
    # for the same single 'rare' hit
    assert scores[0] > scores[2]
    # every doc containing a query term appears; ranks are 1..4
    assert sorted(ranks.values()) == [1, 2, 3, 4]


def test_cms_heavy_hitters_estimates_upper_bound_truth(spark):
    # heavy term 'x' (60 occurrences) among light noise terms
    d = docs_of(spark, ["x " * 60, "y z w q r s t u v", "y z " * 3])
    out = CP.cms_heavy_hitters(d, top=5, width=16).collect()
    byterm = {r["term"]: r for r in out}
    assert byterm["x"]["true_cnt"] == 60
    for r in out:
        # CMS never undercounts, and the in-query bound must hold here
        assert r["cms_estimate"] >= r["true_cnt"]
        assert r["overcount"] == r["cms_estimate"] - r["true_cnt"]
        assert r["within_bound"]
    # ordering is by true count desc then term
    assert out[0]["term"] == "x"


def test_hash_embedding_deterministic_and_linear(spark):
    d = docs_of(spark, ["alpha beta gamma", "alpha beta gamma",
                        "alpha alpha beta beta gamma gamma"])
    out = CP.hash_embedding(d, dim=8, buckets=16).collect()
    vecs = {}
    for r in out:
        vecs.setdefault(r["doc_id"], {})[r["component"]] = r["value"]
    assert all(len(v) == 8 for v in vecs.values())
    # identical text -> identical vector; doubled counts -> doubled vector
    assert vecs[0] == vecs[1]
    assert all(vecs[2][j] == 2 * vecs[0][j] for j in range(8))


def test_phrase_search_counts_occurrences_and_verifies(spark):
    d = docs_of(spark, [
        "a b c d",            # one hit
        "a b c a b c",        # two hits
        "b c a",              # phrase words present but not adjacent
        "x y z",              # no overlap
    ])
    out = {r["doc_id"]: r for r in
           CP.phrase_search(d, ["a", "b", "c"]).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_hash_hits"] == 1 and out[0]["verified"]
    assert out[1]["n_hash_hits"] == 2 and out[1]["verified"]


def test_cv_folds_are_stable_and_partition_the_corpus(spark):
    d = spark.createDataFrame([(i, "t", "en" if i % 3 else "de")
                               for i in range(200)],
                              "doc_id long, text string, lang string")
    out = CP.cv_fold_assignment(d, k=4).collect()
    # folds partition the corpus exactly
    assert sum(r["n"] for r in out) == 200
    assert {r["fold"] for r in out} <= {0, 1, 2, 3}
    # growth stability: adding docs never moves an existing doc's fold
    d2 = spark.createDataFrame([(i, "t", "en") for i in range(400)],
                               "doc_id long, text string, lang string")
    a = {(r["fold"], r["lang"]): r["n"]
         for r in CP.cv_fold_assignment(d, k=4).collect()}
    # recompute the original docs' folds inside the larger corpus by
    # direct hash — cv_fold_assignment only aggregates, so equal
    # per-(fold,lang) counts on the same 200 docs prove stability
    b = {(r["fold"], r["lang"]): r["n"]
         for r in CP.cv_fold_assignment(
             d2.filter("doc_id < 200").withColumn(
                 "lang", F.when(F.col("doc_id") % 3 == 0, "de")
                 .otherwise("en")), k=4).collect()}
    assert a == b


def test_dsir_ranks_target_like_candidates_first(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import dsir_select
    rows = [
        # target domain: all about "alpha"
        (1, "alpha alpha alpha alpha", "tgt"),
        (2, "alpha alpha beta", "tgt"),
        # candidates: doc 10 target-like, doc 11 off-domain
        (10, "alpha alpha alpha", "pool"),
        (11, "gamma gamma gamma", "pool"),
        (12, "alpha gamma", "pool"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_select(df, target_source="tgt", dim=64, k=10).collect()
    ranked = [r["doc_id"] for r in out]
    assert ranked[0] == 10 and ranked[-1] == 11
    weights = {r["doc_id"]: r["weight_e6"] for r in out}
    assert weights[10] > weights[12] > weights[11]
    # off-domain tokens never seen in target must score negative
    assert weights[11] < 0


def test_winnowing_shared_substring_shares_fingerprint(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        winnowing_fingerprints)
    # two docs sharing a 6-token run (>= w+k-1 = 6) MUST share at least
    # one fingerprint hash; an unrelated doc shares none
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "intro words " + shared + " tail one"),
        (2, "other prefix tokens here " + shared),
        (3, "nothing in common with those docs at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnowing_fingerprints(df, sample_pct=100).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert fps[1] & fps[2], "shared 6-gram run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # fingerprint density: ~1 per window, far fewer than shingles
    for d, h in fps.items():
        assert 1 <= len(h) <= 12


def test_zipf_fit_exact_power_law(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import zipf_fit
    # construct term frequencies following cnt = round(1000 / rank):
    # slope should be close to -1 and R^2 near 1
    rows = []
    doc = []
    for rank in range(1, 21):
        term = f"t{rank:02d}"
        doc.extend([term] * round(1000 / rank))
    rows.append((1, " ".join(doc)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    (r,) = zipf_fit(df, top_n=20).collect()
    assert r["n_terms"] == 20
    assert -1.1 < r["slope"] < -0.9
    assert r["r2"] > 0.99


def test_token_stats_fertility_hand_calc(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        token_stats_by_lang)
    df = spark.createDataFrame(
        [(1, "hello, world 42", "en")],
        "doc_id long, text string, lang string")
    (r,) = token_stats_by_lang(df).collect()
    # whitespace words: 'hello,' 'world' '42' = 3
    # pre-tokens: 'hello' ',' 'world' '4' '2' = 5
    assert r["words"] == 3 and r["subtokens"] == 5
    import math
    assert r["fertility"] == math.floor((2 * 5000000 + 3) / 6) / 1e6


def test_ngram_novelty_unique_vs_mirrored(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        ngram_novelty_by_source)
    mirrored = "alpha beta gamma delta epsilon"
    rows = [
        (1, mirrored, "s1"),
        (2, mirrored + " extra tokens here", "s2"),
        (3, "wholly original content stream", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           ngram_novelty_by_source(df, k=3).collect()}
    assert out["s3"]["novelty"] == 1.0          # nothing shared
    assert out["s1"]["novelty"] == 0.0          # fully mirrored by s2
    assert 0.0 < out["s2"]["novelty"] < 1.0     # mirror + extra tail


def test_dataset_card_counts_and_ratios(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        dataset_card)
    rows = [(1, "a b c", "en", "s1"), (2, "d e", "en", "s2"),
            (3, "f g h i", "fr", "s1")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    (r,) = dataset_card(df).collect()
    assert r["n_docs"] == 3 and r["n_tokens"] == 9
    assert r["n_langs"] == 2 and r["n_sources"] == 2
    import math
    assert r["mean_tokens"] == math.floor((2 * 9000000 + 3) / 6) / 1e6
    assert r["en_share"] == math.floor((2 * 2000000 + 3) / 6) / 1e6
