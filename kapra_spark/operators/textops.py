"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting — all JVM-side built-ins
(split/regexp/HOFs), no Python in the hot path, so they run at scan
speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "con", "del"],
}


def tokens_col(text_col: str = "text") -> F.Column:
    """Whitespace tokenization (the BPE-ish regex variant splits on
    word boundaries too)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens_col(text_col)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword / word-length features
    + a composite quality score in [0, 1]."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[\p{Punct}]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(txt, r"[0-9]", ""))
    n_stop = F.size(F.filter(F.transform(toks, lambda w: F.lower(w)),
                             lambda w: w.isin([s for s in STOPWORDS["en"]])))
    avg_word_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    digit_ratio = n_digit / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
        + (1 - F.least(digit_ratio * 4, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2
    )
    return (df
            .withColumn("n_chars_q", n_chars)
            .withColumn("n_tokens", n_tokens)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("digit_ratio", digit_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("avg_word_len", avg_word_len)
            .withColumn("quality_score", score))


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit heuristic language ID: score = fraction of tokens
    in each language's stopword list; argmax wins, 'und' (undetermined)
    when no list scores > 0."""
    toks = F.transform(tokens_col(text_col), lambda w: F.lower(w))
    scores = []
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda w: w.isin(words)))
        scores.append(F.struct((hits / F.greatest(F.size(toks), F.lit(1)))
                               .alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_detected",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).withColumn("lang_score", best["score"])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint over normalized text
    (lowercase, strip punctuation, collapse whitespace): md5 for a
    cross-engine-stable digest + xxhash64 for cheap 64-bit joins."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        r"\s+", " "))
    return (df.withColumn("fp_md5", F.md5(norm))
            .withColumn("fp_xx64", F.xxhash64(norm)))
