"""Char-weighted n-gram repetition signals (Gopher, Rae et al. 2021,
Appendix A1.1 — the "fraction of characters" family).

``operators/gopher.py`` implements the COUNT-based repetition rules
(top-word fraction, duplicate-2-gram fraction by count).  The paper's
other half weighs repetition by CHARACTERS, which penalizes long
repeated phrases that count-based rules under-weigh:

- ``top{n}_char_frac``  — the largest character coverage any single
  word n-gram achieves: ``max over grams of count(gram) * len(gram)``,
  relative to the normalized document length.  (Gopher applies this
  for n = 2, 3, 4 with thresholds 0.20 / 0.18 / 0.16.)
- ``dup{n}_char_frac``  — characters contained in REPEATED occurrences
  of n-grams: ``sum over grams with count > 1 of (count - 1) *
  len(gram)``, relative to the same denominator.  (Gopher: n = 5..10,
  thresholds 0.15 down to 0.10.)

Both are exact integer products/sums divided once at the end, so the
values are bit-identical across engines (same two integers divided).
``len(gram)`` counts the words joined by single spaces; the denominator
is the length of the single-space-normalized document (words joined by
one space), so the fractions are invariant to the original whitespace
shape.

Scale shape: map-only, zero shuffle.  Per document the pipeline is
split -> build n-grams -> ``array_sort`` -> ONE ``aggregate`` pass that
walks the sorted array as a run-length state machine (prev gram, run
length, best coverage, duplicate chars) — O(m log m) per doc in the
sort and O(m) in the walk, all inside whole-stage codegen.  No
``explode``, no per-doc groupBy: the repeated-gram counting that would
naively be a (doc, gram) aggregation collapses into adjacent-run
detection on the sorted array.  This is the difference between a
shuffle of every n-gram occurrence (~5x the corpus bytes at n = 5) and
a pure scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams(w: Column, n_words: Column, n: int) -> Column:
    """All word ``n``-grams of ``w`` joined by single spaces.

    ``F.sequence(1, m)`` DESCENDS when m < 1 (sequence(1, 0) == [1, 0]),
    so the short-document case must be guarded to an empty array rather
    than relying on the sequence bounds.
    """
    if n == 1:
        return w
    grams = F.transform(
        F.sequence(F.lit(1), n_words - (n - 1)),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.when(n_words >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _run_stats(sorted_grams: Column) -> Column:
    """One aggregate pass over a SORTED gram array.

    Returns ``struct(best, dup)`` where ``best`` is the max of
    ``run * len(gram)`` over equal-gram runs and ``dup`` the sum of
    ``(run - 1) * len(gram)`` over runs longer than 1.  Equal grams are
    adjacent after the sort, so one linear walk with O(1) state
    replaces the per-gram count aggregation.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = (acc["run"] > 0) & (x == acc["prev"])
        flushed_best = F.when(
            same | (acc["run"] == 0), acc["best"]
        ).otherwise(
            F.greatest(acc["best"], acc["run"] * F.length(acc["prev"]))
        )
        flushed_dup = F.when(same | (acc["run"] <= 1), acc["dup"]).otherwise(
            acc["dup"] + (acc["run"] - 1) * F.length(acc["prev"])
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            flushed_best.alias("best"),
            flushed_dup.alias("dup"),
        )

    def finish(acc: Column) -> Column:
        last_best = F.when(acc["run"] == 0, acc["best"]).otherwise(
            F.greatest(acc["best"], acc["run"] * F.length(acc["prev"]))
        )
        last_dup = F.when(acc["run"] <= 1, acc["dup"]).otherwise(
            acc["dup"] + (acc["run"] - 1) * F.length(acc["prev"])
        )
        return F.struct(last_best.alias("best"), last_dup.alias("dup"))

    return F.aggregate(sorted_grams, init, step, finish)


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Append ``top{n}_char_frac`` / ``dup{n}_char_frac`` columns.

    Documents shorter than ``n`` words score 0.0 for that n (no n-gram
    exists, hence no repetition).  Empty/whitespace-only documents
    score 0.0 everywhere.
    """
    text = F.col(text_col)
    words = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: F.length(x) > 0
    )
    df = df.withColumn("_rw", words)
    w = F.col("_rw")
    n_words = F.size(w)
    # normalized doc length: words re-joined by single spaces
    denom = F.greatest(F.length(F.array_join(w, " ")), F.lit(1)).cast(
        "double"
    )

    out = df
    for n in sorted(set(top_ns) | set(dup_ns)):
        stats = _run_stats(F.array_sort(_ngrams(w, n_words, n)))
        if n in top_ns:
            out = out.withColumn(
                f"top{n}_char_frac", stats["best"].cast("double") / denom
            )
        if n in dup_ns:
            out = out.withColumn(
                f"dup{n}_char_frac", stats["dup"].cast("double") / denom
            )
    return out.drop("_rw")
