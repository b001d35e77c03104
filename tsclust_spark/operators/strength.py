"""Trend and seasonal strength per series (FPP3 STL-feature measure).

Hyndman & Athanasopoulos (*Forecasting: Principles and Practice*,
public literature) summarize a decomposition ``value = trend +
seasonal + residual`` into two [0, 1] scores:

    F_trend    = max(0, 1 - var(residual) / var(trend + residual))
    F_seasonal = max(0, 1 - var(residual) / var(seasonal + residual))

— the variance share the trend (resp. seasonal) component explains
once the other is removed.  ~1 means strongly trended / seasonal, ~0
means that component is noise.  This is THE standard per-series
feature pair for routing large series collections ("model the
seasonal ones, flatline-forecast the rest"), and it turns the
per-point output of :func:`~tsclust_spark.operators.decompose.
decompose_additive` into one row per key.

Engine shape: the decomposition's own plan (window MA + slot profile
+ broadcast join, zero Python) followed by ONE hash aggregate of five
sums; the variances come from the sums-of-squares algebra
(``var = (sxx - sx^2/n) / n``, population form — both engines
evaluate the identical expression tree).  Only rows with a defined
residual (complete centered-MA window) enter, on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.decompose import decompose_additive


def decomposition_strength(
    df: DataFrame,
    period: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    min_points: int = 8,
) -> DataFrame:
    """``(key, n_points, trend_strength, seasonal_strength)`` per key.

    ``n_points`` counts rows with a defined residual.  Keys with
    fewer than ``min_points`` such rows, or with zero variance in a
    denominator (strength undefined; engines disagree on 0/0), are
    omitted.
    """
    dec = decompose_additive(
        df,
        period=period,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak_col=tiebreak_col,
    ).filter(F.col("residual").isNotNull())

    tr = F.col("trend") + F.col("residual")  # deseasonalized
    sr = F.col("seasonal") + F.col("residual")  # detrended
    mom = dec.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("residual")).alias("sr1"),
        F.sum(F.col("residual") * F.col("residual")).alias("sr2"),
        F.sum(tr).alias("st1"),
        F.sum(tr * tr).alias("st2"),
        F.sum(sr).alias("ss1"),
        F.sum(sr * sr).alias("ss2"),
    )
    n = F.col("n_points")
    var_r = (F.col("sr2") - F.col("sr1") * F.col("sr1") / n) / n
    var_t = (F.col("st2") - F.col("st1") * F.col("st1") / n) / n
    var_s = (F.col("ss2") - F.col("ss1") * F.col("ss1") / n) / n
    return (
        mom.filter((n >= min_points) & (var_t > 0.0) & (var_s > 0.0))
        .select(
            "key",
            n.cast("long").alias("n_points"),
            F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_t).alias(
                "trend_strength"
            ),
            F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_s).alias(
                "seasonal_strength"
            ),
        )
    )
