"""Rolling-origin forecast backtesting on the hourly tier.

The missing evaluation half of the forecasting operators (holt.py,
holtwinters.py, seasonal.py): given a per-key hourly series, score a
forecaster by walking forward in time and comparing each hour's
prediction against the actual.  The first model every production
backtest needs is the one to beat — **seasonal naive** (predict this
hour = the actual from ``period`` hours earlier), which is also the
standard denominator of the MASE metric.

Semantics:
- the input is bucketed to hours per key (mean of values in the
  bucket), the same tier-1h shape as ``operators/rollup.py``;
- the forecast for bucket ``t`` is the actual at ``t - period`` hours
  BY TIMESTAMP, not by row offset — a missing hour yields no forecast
  (no silent row-shift across gaps, the classic lag() backtest bug);
- per key the scored hours aggregate to ``n_scored``, ``mae``,
  ``rmse`` and ``smape`` (symmetric, in [0, 2], 0/0 terms count 0).

Scale shape: one hash aggregate to the hourly tier (map-side partial
combine collapses raw points before the shuffle), then a self
equi-join of the TIER on ``(key, ts - period)`` — tier rows number
~keys x hours, orders of magnitude below raw points — then one final
per-key aggregate.  All JVM expressions; nothing touches raw-point
scale after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_naive_backtest(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period_hours: int = 24,
) -> DataFrame:
    """Score the seasonal-naive forecaster per key.

    Returns ``(key, n_scored, mae, rmse, smape)`` with one row per key
    that has at least one scored hour (an hour whose ``t - period``
    hour also exists).
    """
    tier = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("actual"))
    )
    fcst = tier.select(
        "key",
        (F.col("bucket") + F.expr(f"INTERVAL {period_hours} HOURS")).alias(
            "bucket"
        ),
        F.col("actual").alias("forecast"),
    )
    scored = tier.join(fcst, on=["key", "bucket"])
    err = F.col("actual") - F.col("forecast")
    denom = F.abs(F.col("actual")) + F.abs(F.col("forecast"))
    smape_term = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        F.lit(2.0) * F.abs(err) / denom
    )
    return (
        scored.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.avg(F.abs(err)).alias("mae"),
            F.sqrt(F.avg(err * err)).alias("rmse"),
            F.avg(smape_term).alias("smape"),
        )
    )
