"""Text-analysis scalar functions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language ID, quality
scoring, token counting, and document fingerprinting run inside the scan
projection with zero Python cost, so they scale to 100 TB of documents the
same way a filter does.

Design constraint: every function here has an exact ANSI-SQL equivalent
(see plans/catalog_text.py oracles) so correctness is oracle-checkable.
Tokenization is deliberately simple & portable: split on single spaces,
drop empties.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, fixed marker-word lists per language (n-gram/stopword heuristic)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("de", "shi", "le", "bu", "wo", "ni", "ta", "men"),
}
ENGLISH_STOPWORDS = LANG_MARKERS["en"] + ("for", "on", "with", "as", "at", "by")


def words(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (portable tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda w: w != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def subword_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: ~1 token per 4 characters (the standard
    heuristic for byte-pair-encoded English), as a long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


# GPT-2-style pre-tokenizer classes, lookahead-free so the same pattern
# runs under Java regex (Spark) and RE2 (DuckDB): letter runs, digit
# runs, punctuation runs. BPE merges only ever split WITHIN these.
PRETOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def pretoken_count(col: Column | str) -> Column:
    """Number of BPE pre-tokens (the upper bound on merged-token count
    and the unit BPE training actually sees), as a long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PRETOKEN_RE), F.lit(0))) \
        .cast("long")


def _marker_hits(ws: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*markers)))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-word hit count per language."""
    ws = words(col)
    return {lang: _marker_hits(ws, m) for lang, m in LANG_MARKERS.items()}


def lang_id(col: Column | str) -> Column:
    """Predicted language = argmax of marker hits; ties resolve in fixed
    lang-code order; zero hits everywhere -> 'und' (undetermined)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-chain in reverse so earlier langs win ties
    for lang in reversed(sorted(scores)):
        expr = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length/stopword/diversity features for quality filtering."""
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n = F.size(ws)
    nf = n.cast("double")
    return {
        "n_chars": F.length(c).cast("long"),
        "n_words": n.cast("long"),
        "mean_word_len": F.round((F.length(c) - (n - 1)) / nf, 4),
        "stopword_ratio": F.round(
            _marker_hits(ws, ENGLISH_STOPWORDS) / nf, 4),
        "distinct_ratio": F.round(F.size(F.array_distinct(ws)) / nf, 4),
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs, a sane
    stopword ratio, and lexical diversity. Deterministic, portable."""
    f = quality_features(col)
    length_term = F.least(f["n_words"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    div_term = f["distinct_ratio"]
    return F.round((length_term + stop_term + div_term) / 3, 4)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — identical token multisets (minus order/dup changes) collide
    on purpose, the 'near-exact dup' key."""
    ws = words(col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(ws))))


def shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (distinct), the unit set for Jaccard/MinHash.
    Docs shorter than k words yield an empty array (sequence(1,0) would
    count DOWN in Spark, hence the explicit guard)."""
    ws = words(col)
    n = F.size(ws)
    return F.when(n >= k, F.array_distinct(
        F.transform(F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, k))))
    ).otherwise(F.array().cast("array<string>"))


HASH_PRIME = 2147483647  # 2^31-1; word/shingle hashes live below this
HASH_BASE = 131


def word_hashes(words_col: str) -> Column:
    """Per-token 31-bit hash: int(md5[:15hex]) mod p — one md5 per TOKEN
    (not per shingle), portable to ANSI SQL."""
    return F.expr(
        f"transform({words_col}, w -> "
        f"cast(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT) % {HASH_PRIME})")


def shingle_hashes_from_word_hashes(wh_col: str, k: int = 3) -> Column:
    """k-word shingle hashes by polynomial combination of word hashes
    (h = fold(h*B + w mod p)) — no shingle strings are ever built, so the
    shingle stage is pure bigint arithmetic and the inverted index joins
    on 8-byte keys instead of strings. Distinct, order-preserving within
    the window; docs shorter than k give an empty array."""
    expr = f"{wh_col}[i]"
    for j in range(1, k):
        expr = f"(({expr}) * {HASH_BASE} + {wh_col}[i+{j}]) % {HASH_PRIME}"
    return F.expr(f"""
        CASE WHEN size({wh_col}) >= {k}
             THEN array_distinct(transform(
                  sequence(0, size({wh_col}) - {k}), i -> {expr}))
             ELSE array() END""").cast("array<bigint>")


def span_hashes_from_word_hashes(wh_col: str, k: int = 3) -> Column:
    """Position-ordered k-token span hashes — the same polynomial as
    shingle_hashes_from_word_hashes but WITHOUT the distinct: one entry
    per window position, so repeated spans inside a document keep every
    occurrence (exact-substring dedup counts occurrences, not membership).
    Docs shorter than k give an empty array."""
    expr = f"{wh_col}[i]"
    for j in range(1, k):
        expr = f"(({expr}) * {HASH_BASE} + {wh_col}[i+{j}]) % {HASH_PRIME}"
    return F.expr(f"""
        CASE WHEN size({wh_col}) >= {k}
             THEN transform(sequence(0, size({wh_col}) - {k}), i -> {expr})
             ELSE array() END""").cast("array<bigint>")


def shingles_from_words(words_col: str, k: int = 3) -> Column:
    """Same shingle set, built from an already-materialized words column by
    direct subscripting — ~1.5x faster than the slice() form (no per-shingle
    array copy) and safe to use in a second projection so the tokenization
    runs once per row. Use with:
        df.select(id, words(text).alias("_ws"))
          .select(id, shingles_from_words("_ws", k).alias("shs"))
    """
    parts = ", ".join(f"{words_col}[i+{j}]" for j in range(k))
    return F.expr(f"""
        CASE WHEN size({words_col}) >= {k}
             THEN array_distinct(transform(
                  sequence(0, size({words_col}) - {k}),
                  i -> concat_ws(' ', {parts})))
             ELSE array() END""").cast("array<string>")
