"""Offline change-point localization (AMOC) per series.

Complements the sequential detector (operators/cusum.py): CUSUM answers
"has the mean shifted, flag it as points stream past"; AMOC ("at most
one change", Hinkley 1970 / the standard first step of binary
segmentation) answers "WHERE did it shift" — scan every split point
tau of the ordered series and keep the one maximizing the normalized
between-segment contrast

    stat(tau) = sqrt(tau * (m - tau) / m) * |mean(x[1..tau]) - mean(x[tau+1..m])|

which is the likelihood-ratio statistic for a single mean change under
a fixed-variance Gaussian model (up to the sigma scale, which is
constant per key and cannot move the argmax).

Engine shape: the O(m) scan is two cumulative sums, so the WHOLE
operator is Catalyst window functions over the calendar-bounded daily
tier — zero Python, one hash Exchange on the key for the tier
aggregate, one sort for the windows.  The tier collapse means raw
volume never reaches the window: m is #days in range regardless of
data scale (the theilsen.py / backtest.py discipline).

Cross-engine determinism: the argmax is taken over the statistic
ROUNDED to ``rank_decimals`` (quantize-before-rank, the tfidf.py
rule), tie-broken by earliest bucket, so Spark and a SQL oracle pick
the same split even when the unrounded float64 sums differ in the
last ulp.  The partition total is read off the running sum at i = m
(never a separately-ordered aggregate), so both engines sum in the
identical order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def changepoint_amoc(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    rank_decimals: int = 6,
) -> DataFrame:
    """``(key, n_buckets, cp_bucket, mean_before, mean_after,
    cp_stat)`` — the best single mean-change split per key.

    ``cp_bucket`` is the LAST bucket of the left segment (the change
    happens after it).  Keys with fewer than two buckets are omitted
    (no split exists).  ``mean_before``/``mean_after``/``cp_stat``
    are unrounded doubles; round at the call site for gating.
    """
    tier = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("v"))
    )

    w = Window.partitionBy("key").orderBy("bucket")
    wall = Window.partitionBy("key")
    scan = tier.select(
        "key",
        "bucket",
        F.row_number().over(w).alias("i"),
        F.sum("v").over(w).alias("cum"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).withColumn(
        # the total is the running sum at i = m: identical summation
        # order on every engine, unlike a partition-hash aggregate
        "tot",
        F.max(F.when(F.col("i") == F.col("m"), F.col("cum"))).over(wall),
    )

    cand = (
        scan.filter(F.col("i") < F.col("m"))
        .withColumn("mean_before", F.col("cum") / F.col("i"))
        .withColumn(
            "mean_after",
            (F.col("tot") - F.col("cum")) / (F.col("m") - F.col("i")),
        )
        .withColumn(
            "cp_stat",
            F.sqrt(
                F.col("i") * (F.col("m") - F.col("i")) / F.col("m")
            )
            * F.abs(F.col("mean_before") - F.col("mean_after")),
        )
    )

    pick = Window.partitionBy("key").orderBy(
        F.round(F.col("cp_stat"), rank_decimals).desc(),
        F.col("bucket").asc(),
    )
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            F.col("m").alias("n_buckets"),
            F.col("bucket").alias("cp_bucket"),
            "mean_before",
            "mean_after",
            "cp_stat",
        )
    )
