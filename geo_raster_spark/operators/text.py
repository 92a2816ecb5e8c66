"""Text analysis for training-data pipelines: language-ID, quality scoring,
token stats, document fingerprinting.

All operators are pure column expressions (whole-stage codegen); the same
formulas are expressible in ANSI SQL for the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small stopword seed lists (public common-word lists, trimmed)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "ich", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "de", "que", "es", "en", "un", "por"],
}


def tokens(text_col: str) -> F.Column:
    """Whitespace+punct tokenization (the BPE-ish regex split)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+"),
        lambda t: F.length(t) > 0)


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ n_tokens, n_chars_engine, avg_token_len."""
    tok = tokens(text_col)
    return (docs
            .withColumn("n_tokens", F.size(tok))
            .withColumn("n_chars_engine", F.length(F.col(text_col)))
            .withColumn("avg_token_len",
                        F.round(F.aggregate(tok, F.lit(0), lambda a, t: a + F.length(t))
                                .cast("double")
                                / F.greatest(F.size(tok), F.lit(1)), 6)))


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ lang_pred: argmax of stopword-hit counts (n-gram-free heuristic).

    Ties / zero hits -> 'und' (undetermined)."""
    tok = F.array_distinct(tokens(text_col))
    score_cols = []
    df = docs
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        df = df.withColumn(f"_s_{lang}", F.size(F.array_intersect(tok, sw)))
        score_cols.append(f"_s_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    # reversed so earlier languages win ties (deterministic ordering)
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(F.col(f"_s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return df.withColumn("lang_pred", pred).drop(*score_cols)


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ quality in [0,1]: length band + alpha ratio + stopword presence.

    Formula (documented, oracle-replicable):
      0.4 * clamp(n_chars/500)           (enough content)
    + 0.3 * alpha_ratio                  (not symbol soup)
    + 0.3 * min(1, en_stopword_hits/5)   (natural-language prior)
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = (F.length(F.regexp_replace(F.lower(t), r"[^a-z ]", "")).cast("double")
             / F.greatest(n, F.lit(1.0)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    hits = F.size(F.array_intersect(F.array_distinct(tokens(text_col)), sw)).cast("double")
    q = (F.lit(0.4) * F.least(n / F.lit(500.0), F.lit(1.0))
         + F.lit(0.3) * alpha
         + F.lit(0.3) * F.least(hits / F.lit(5.0), F.lit(1.0)))
    return docs.withColumn("quality", F.round(q, 6))


def with_fingerprint(docs: DataFrame, text_col: str = "text",
                     k: int = 8, keep: int = 4) -> DataFrame:
    """+ fingerprint: min-``keep`` sorted k-shingle hashes concatenated —
    a compact rolling-hash document signature (winnowing-style)."""
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    hashes = F.transform(F.sequence(F.lit(1), n),
                         lambda i: F.xxhash64(t.substr(i, F.lit(k))))
    fp = F.concat_ws("-", F.slice(F.array_sort(hashes), 1, keep))
    return docs.withColumn("fingerprint", fp)
