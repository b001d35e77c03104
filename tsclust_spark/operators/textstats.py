"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure DataFrame expressions (JVM-side, SQL-oracle-able); no Python
in the hot path. These are per-row map operations — zero shuffle, so
they scale trivially; the interesting part is keeping them expression-
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "que", "de", "un"],
}


def _words(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


# --- reusable per-row expressions (shared with operators.curate) -----------

def ws_token_count_expr(text):
    """Whitespace token count as a single Column expression."""
    return F.size(F.filter(_words(text), lambda w: F.length(w) > 0))


def _lang_counts(text):
    words = _words(text)
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    return out


def language_pred_expr(text):
    """Marker-vote language prediction as a single Column expression
    (same vote rule as :func:`language_id`: first max in fixed order,
    'und' when no marker hits)."""
    counts = _lang_counts(text)
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for lng, c in counts.items():
        pred = pred.when(c == best, F.lit(lng))
    return pred


def quality_expr(text):
    """Composite quality score in [0, 1] as a single Column expression
    (same formula as :func:`quality_score`)."""
    n_chars = F.greatest(F.length(text), F.lit(1))
    n_words = F.greatest(F.size(_words(text)), F.lit(1))
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
        / n_chars
    )
    punct_ratio = (
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
        / n_chars
    )
    mean_word_len = F.length(text).cast("double") / n_words
    return (
        F.least(alpha_ratio / 0.7, F.lit(1.0)) * 0.5
        + F.when(
            (mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.3)
        ).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word vote language ID: (doc_id, lang_pred, lang_score).

    Score = fraction of words that are markers of the winning language;
    'und' (undetermined) when no marker hits. A real pipeline would swap
    in fastText — the Spark plumbing (map-only expression, no UDF) stays
    identical.
    """
    words = _words(F.col(text_col))
    counts = _lang_counts(F.col(text_col))
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        *[c.alias(f"n_{lang}") for lang, c in counts.items()],
    )
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"n_{lng}") for lng in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lng in langs:  # first max wins, fixed order -> deterministic
        pred = pred.when(F.col(f"n_{lng}") == best, F.lit(lng))
    return scored.select(
        "doc_id",
        pred.alias("lang_pred"),
        (best.cast("double") / F.greatest(F.col("n_words"), F.lit(1))).alias(
            "lang_score"
        ),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    word count, mean word length, alpha ratio, punctuation ratio,
    uppercase ratio, digit ratio."""
    text = F.col(text_col)
    n_chars = F.greatest(F.length(text), F.lit(1))
    words = _words(text)
    n_words = F.greatest(F.size(words), F.lit(1))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        (F.length(text).cast("double") / n_words).alias("mean_word_len"),
        (alpha.cast("double") / n_chars).alias("alpha_ratio"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        (upper.cast("double") / n_chars).alias("upper_ratio"),
        (digits.cast("double") / n_chars).alias("digit_ratio"),
        # composite: reward alpha-dominated prose of sane word length
        quality_expr(text).alias("quality"),
    )
    return feats


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate.

    Subword estimate: word pieces of <=4 chars, i.e.
    sum(ceil(len(word)/4)) — the standard chars/4 heuristic computed
    exactly per word, plus punctuation runs counted as single tokens.
    """
    words = _words(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count_expr(F.col(text_col)).alias("ws_tokens"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("bigint"),
        ).alias("bpe_est_tokens"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive document fingerprint: rolling polynomial hash
    over words (mod 2^31-1: keeps every intermediate product within
    exact bigint range — Spark 4 runs ANSI mode, where bigint overflow
    is an error) alongside md5.

    (doc_id, fp_rolling, fp_md5): the rolling hash changes under any
    reordering; md5 is the byte-exact content id.
    """
    M = 2147483647  # 2^31 - 1
    words = _words(F.col(text_col))
    rolling = F.aggregate(
        words,
        F.lit(1469598103 % M).cast("bigint"),
        lambda acc, w: (
            acc * 31
            + F.aggregate(
                F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("bigint")),
                F.lit(7).cast("bigint"),
                lambda a2, c: (a2 * 131 + c) % F.lit(M),
            )
        )
        % F.lit(M),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        rolling.alias("fp_rolling"),
        F.md5(F.col(text_col)).alias("fp_md5"),
    )


def top_tokens_per_group(
    df: DataFrame,
    k: int = 10,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Heavy hitters: the k most frequent whitespace tokens per group.

    Output: ``(group, token, n, rank)``, rank 1..k, ties broken by token
    (deterministic). The vocabulary-frequency pass every training-data
    pipeline runs before building a tokenizer.

    Scale notes (100 TB): the explode multiplies rows by tokens/doc, but
    the per-(group, token) count is a hash aggregate with map-side
    partial combine — the shuffle carries only distinct (group, token)
    partials (vocabulary-sized, not corpus-sized). The top-k window then
    runs over the already-aggregated counts, partitioned by group. No
    driver-side collection; k and the vocabulary bound the output.
    """
    from pyspark.sql import Window

    tokens = df.select(
        F.col(group_col).alias("grp"),
        F.explode(_words(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("grp", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "token", "n", "rank")
    )
