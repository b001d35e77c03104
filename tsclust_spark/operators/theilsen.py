"""Theil–Sen robust trend estimator per series.

Completes the trend toolkit: ``trend_slope`` (operators/trend.py) is
the efficient-but-fragile OLS estimator, ``mann_kendall`` answers "is
there a monotone trend" — Theil–Sen answers "how steep is it" with a
29.3% breakdown point (the median of pairwise slopes ignores up to
~29% arbitrarily corrupted points, where one bad point can swing OLS
unboundedly).

Two-stage shape, the same discipline as the backtest operator:

1. raw points collapse to the per-key DAILY tier with one partial+
   final hash aggregate (the only Exchange that sees point-scale
   rows);
2. each key's tier series — whose length is bounded by the CALENDAR
   (#days in range), not by data volume — flows through one
   ``applyInPandas`` group that forms all pairwise slopes with one
   vectorized outer difference and takes their median.

O(m^2) per key is deliberate: m is days-in-range (365 days -> 66k
pairs, microseconds in numpy), so the cost is scale-invariant while
the estimator stays the exact textbook one.  Keys parallelize across
the cluster like any grouped kernel.

Slope units: value per DAY (time axis is epoch days as float64).  The
intercept is the pairing median ``median(v - slope * t)`` (Sen 1968).
Keys with fewer than two buckets are OMITTED (no pair exists, so no
estimate — emitting NULL would force the SQL twin into NULL-vs-NaN
games across engines).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_buckets", LongType()),
        StructField("ts_slope", DoubleType()),
        StructField("ts_intercept", DoubleType()),
    ]
)


def theil_sen(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``(key, n_buckets, ts_slope, ts_intercept)`` per key.

    ``ts_slope`` is the median over all bucket pairs (i < j) of
    ``(v_j - v_i) / (t_j - t_i)`` with t in epoch days — identical
    arithmetic to the SQL twin, so the gate is value-exact up to
    median tie order (none: medians of the same multiset agree).
    """
    tier = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("v"))
        .withColumn(
            "t", F.col("bucket").cast("double") / F.lit(86400.0)
        )
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        order = np.argsort(pdf["t"].to_numpy())
        t = pdf["t"].to_numpy(dtype=np.float64)[order]
        v = pdf["v"].to_numpy(dtype=np.float64)[order]
        m = t.size
        if m < 2:
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=object),
                    "n_buckets": pd.Series([], dtype=np.int64),
                    "ts_slope": pd.Series([], dtype=np.float64),
                    "ts_intercept": pd.Series([], dtype=np.float64),
                }
            )
        iu = np.triu_indices(m, k=1)
        slopes = (v[iu[1]] - v[iu[0]]) / (t[iu[1]] - t[iu[0]])
        slope = float(np.median(slopes))
        intercept = float(np.median(v - slope * t))
        return pd.DataFrame(
            {
                "key": [key],
                "n_buckets": [m],
                "ts_slope": [slope],
                "ts_intercept": [intercept],
            }
        )

    return tier.groupBy("key").applyInPandas(run, schema=_OUT_SCHEMA)
