"""Trimmed-mean tier: outlier-robust bucket aggregation by exact rank.

The plain ``avg`` tier is wrecked by a single glitch reading (one
490.0 among 0.1s moves the bucket mean by orders of magnitude); the
rolling-median operator repairs *point* glitches but not *bucket*
statistics.  This computes, per (key, day) bucket, the textbook
trimmed mean — sort the bucket's values, drop exactly
``floor(alpha * n)`` rows from EACH end (the scipy
``trim_mean(proportiontocut=alpha)`` convention), average the rest —
next to the plain mean and the kept-row count, so a tier consumer can
both use the robust value and see how much was cut.  ``floor`` means
small buckets degrade gracefully: n < 1/alpha cuts nothing, so a
single-row bucket keeps its value.

Exact ranks, not approximate quantiles: ``approx_percentile``
sketches differ between engines (and between runs at different
parallelism), so the trim boundary would be nondeterministic.  A
``row_number`` over (value, tiebreak) is pure integer arithmetic:
the number of rows cut per end is exact, and although WHICH member of
a tie group survives depends on the tiebreak, tied values are equal
by definition, so ``mean_trimmed`` and ``n_kept`` are invariant to
the tiebreak and bit-reproducible across engines and partitionings.
(The earlier percent_rank formulation cut or kept whole tie groups
together — a bucket whose minimum value ties 8 ways would trim all 8
rows; the row-count trim cuts exactly floor(alpha*n) regardless.)

Engine shape: one window sort per (key, day) for the rank (the
partition key includes the bucket, so window state is one bucket's
rows — bounded, spill-safe, skew-free unless a single (key, day) is
itself hot), then one hash aggregate fusing both means via
conditional aggregation — no second scan, no join between the
trimmed and untrimmed branches.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trimmed_tier(
    df: DataFrame,
    alpha: float = 0.1,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(key, day, n, n_kept, mean_all, mean_trimmed)`` per
    (key, day) bucket with at least one non-NULL value.

    ``mean_trimmed`` averages ranks ``cut < rn <= n - cut`` over
    ``value`` within the bucket, ``cut = floor(alpha * n)``;
    ``n_kept = n - 2*cut`` (always >= 1 for alpha < 0.5).
    """
    w = Window.partitionBy("key", "day").orderBy(value_col, tiebreak_col)
    wb = Window.partitionBy("key", "day")
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(value_col),
            F.col(tiebreak_col),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nb", F.count(F.lit(1)).over(wb))
    )
    cut = F.floor(F.lit(alpha) * F.col("nb"))
    keep = (F.col("rn") > cut) & (F.col("rn") <= F.col("nb") - cut)
    return (
        ranked.groupBy("key", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.avg(value_col).alias("mean_all"),
            F.avg(F.when(keep, F.col(value_col))).alias("mean_trimmed"),
        )
        .select("key", "day", "n", "n_kept", "mean_all", "mean_trimmed")
    )
