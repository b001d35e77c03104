"""Gopher-style document quality rules (Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", 2021,
Appendix A1.1), adapted to word-level signals.

Unlike the composite ``quality_score`` (operators/textstats.py), each
rule here is a named boolean column, so the output is both a filter
(``gopher_pass``) and a per-rule attrition report
(``groupBy().agg(avg(col.cast("int")))`` per flag).

Rules (thresholds are parameters; defaults adapted from the paper):
- word count within [min_words, max_words]
- mean word length within [3, 10] characters
- fraction of words containing an alphabetic character >= 0.8
- at least 2 distinct stop words present (the "natural language" test)
- most frequent word occupies <= 20% of the document (repetition)
- duplicate 2-gram fraction <= 30% (repetition)

Scale shape: every rule is a pure JVM higher-order-function expression
over one split of the text — map-only, zero shuffle, fused into the
scan by whole-stage codegen.  The per-row repetition rules are
O(distinct_words * words) on ~100-word web docs — cheap relative to
the scan itself; truncate pathological documents upstream
(curate.max_tokens) before this pass.

All ratio metrics are exact small-integer divisions, so the boolean
flags are bit-identical across engines and SQL-oracle-able without
rounding games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "to", "and", "in", "be", "that", "with", "for"]


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    max_top_word_frac: float = 0.2,
    max_dup_2gram_frac: float = 0.3,
) -> DataFrame:
    """Append the per-rule metrics, flags, and ``gopher_pass`` verdict."""
    text = F.col(text_col)
    words = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: F.length(x) > 0
    )
    df = df.withColumn("_w", words)
    w = F.col("_w")
    n = F.size(w)
    n_safe = F.greatest(n, F.lit(1))

    mean_word_len = (
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_safe
    )
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("double") / n_safe
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOPWORDS]),
            lambda s: F.array_contains(w, s),
        )
    )
    top_word_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(w),
                lambda x: F.size(F.filter(w, lambda y: y == x)),
            )
        ).cast("double")
        / n_safe
    )
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    dup_2gram_frac = F.when(n < 2, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(bigrams)).cast("double") / (n - 1)
    )

    out = (
        df.withColumn("n_words", n)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("alpha_frac", alpha_frac)
        .withColumn("n_stop", n_stop)
        .withColumn("top_word_frac", top_word_frac)
        .withColumn("dup_2gram_frac", dup_2gram_frac)
        .drop("_w")
    )
    out = (
        out.withColumn(
            "ok_word_count",
            F.col("n_words").between(min_words, max_words),
        )
        .withColumn(
            "ok_mean_word_len",
            F.col("mean_word_len").between(
                min_mean_word_len, max_mean_word_len
            ),
        )
        .withColumn("ok_alpha_words", F.col("alpha_frac") >= min_alpha_frac)
        .withColumn("ok_stopwords", F.col("n_stop") >= min_stopwords)
        .withColumn(
            "ok_top_word", F.col("top_word_frac") <= max_top_word_frac
        )
        .withColumn(
            "ok_dup_2gram", F.col("dup_2gram_frac") <= max_dup_2gram_frac
        )
    )
    flags = [
        "ok_word_count",
        "ok_mean_word_len",
        "ok_alpha_words",
        "ok_stopwords",
        "ok_top_word",
        "ok_dup_2gram",
    ]
    verdict = F.lit(True)
    for f in flags:
        verdict = verdict & F.col(f)
    return out.withColumn("gopher_pass", verdict)
