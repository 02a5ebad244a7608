"""Text analysis for LLM training-data pipelines: language-ID
heuristic, quality scoring, token counting, fingerprinting
(north-star extension — SURVEY §2B).

Everything stays in built-in JVM-side functions (split/filter/
array_intersect/regexp) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny stopword lists per language for the n-gram/stopword heuristic.
# Deterministic tie order: en > de > fr > es > zh (argmax scan order).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "que", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def words_col(text_col) -> "F.Column":
    return F.filter(F.split(text_col, " "), lambda x: x != "")


def stopword_hits(text_col, lang: str) -> "F.Column":
    """Distinct stopwords of `lang` present in the text."""
    return F.size(
        F.array_intersect(words_col(text_col), F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def predicted_lang(text_col) -> "F.Column":
    """argmax over per-language stopword hits, ties resolved by
    LANG_ORDER scan; zero hits everywhere -> 'unknown'."""
    hits = {l: stopword_hits(text_col, l) for l in LANG_ORDER}
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("unknown"))
    for l in LANG_ORDER:
        expr = expr.when(hits[l] == best, F.lit(l))
    return expr


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for l in LANG_ORDER:
        out = out.withColumn(f"hits_{l}", stopword_hits(F.col(text_col), l))
    return out.withColumn("pred_lang", predicted_lang(F.col(text_col)))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish alnum-run tokens."""
    ws = F.size(words_col(F.col(text_col)))
    alnum = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    )
    return df.withColumn("n_tokens_ws", ws).withColumn("n_tokens_alnum", alnum)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    composite score in [0,1]. Punct count via length-difference (no
    regexp_count dependency — oracle parity with DuckDB 1.0)."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_tokens = F.size(words_col(txt))
    n_punct = n_chars - F.length(F.regexp_replace(txt, "[^a-zA-Z0-9 ]", ""))
    n_stop = stopword_hits(txt, "en")
    mean_word_len = F.length(F.regexp_replace(txt, " ", "")) / n_tokens
    # all-integer-derived ratios; round once at the end
    punct_ratio = n_punct / n_chars
    score = (
        F.when(n_tokens >= 20, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_stop > 0, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_punct", n_punct.cast("long"))
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("quality_score", F.round(score, 4))
    )
