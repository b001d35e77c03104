"""Classical additive seasonal-trend decomposition per series.

    value = trend + seasonal + residual

- ``trend``    : centered moving average over ``period`` points (odd
  period required — the textbook even-period variant needs a second
  2-point MA pass; keep the window odd and the decomposition stays a
  single frame).  NULL at the first/last (period-1)/2 points of each
  series, where the centered window is incomplete — no extrapolated
  trend, matching the classical definition.
- ``seasonal`` : per-slot mean of the detrended series (slot = position
  mod period), CENTERED by subtracting the mean of slot means so the
  seasonal component sums to ~0 over one cycle and the trend keeps the
  level.
- ``residual`` : what's left — the anomaly-hunting ground.

Unlike the calendar-slot profile (operators/seasonal.py), the period
here is in POINTS, the decomposition removes the trend FIRST (a
drifting level does not leak into the seasonal profile), and all three
components come back per point.

Plan shape: one Exchange on the series key serves the centered-MA
window AND (via the position column it emits) the slot aggregate; the
slot profile is (keys x period) rows joined back broadcast.  Everything
is plain window/aggregate SQL — no Python anywhere — so the operator is
oracle-ready for the driver gate (SQL twin steps identical frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decompose_additive(
    df: DataFrame,
    period: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``trend``, ``seasonal``, ``residual`` per row.

    ``period`` must be odd and >= 3.  Rows where the centered window is
    incomplete carry NULL trend and residual (seasonal is still
    defined — the slot profile uses only fully-detrended points).
    """
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    half = period // 2
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w_ord = Window.partitionBy(key_col).orderBy(*order)
    w_ma = w_ord.rowsBetween(-half, half)
    base = (
        df.withColumn("_pos", F.row_number().over(w_ord) - F.lit(1))
        .withColumn("_n_in", F.count(F.lit(1)).over(w_ma))
        .withColumn(
            "trend",
            F.when(
                F.col("_n_in") == period, F.avg(value_col).over(w_ma)
            ),
        )
        .withColumn("_slot", F.col("_pos") % period)
        .withColumn("_detr", F.col(value_col) - F.col("trend"))
    )
    prof = base.groupBy(key_col, "_slot").agg(
        F.avg("_detr").alias("_slot_mean")
    )
    centered = prof.withColumn(
        "seasonal",
        F.col("_slot_mean")
        - F.avg("_slot_mean").over(Window.partitionBy(key_col)),
    ).select(key_col, "_slot", "seasonal")
    return (
        base.join(F.broadcast(centered), [key_col, "_slot"], "left")
        .withColumn(
            "residual", F.col(value_col) - F.col("trend") - F.col("seasonal")
        )
        .drop("_pos", "_n_in", "_slot", "_detr")
    )


def decompose_multiplicative(
    df: DataFrame,
    period: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classical MULTIPLICATIVE decomposition:

        value = trend * seasonal * residual

    - ``trend``: the same centered moving average (odd period);
    - ``seasonal``: per-slot mean of the DETRENDED RATIO ``v/trend``,
      normalized by the mean of slot means so the seasonal factors
      average to ~1 over one cycle (the level stays with the trend);
    - ``residual``: ``v / (trend * seasonal)`` — ~1 where the model
      fits, the anomaly-hunting ground as a ratio.

    The ratio twin of :func:`decompose_additive`, paired with
    multiplicative Holt-Winters: use it when seasonal amplitude grows
    with the level.  Only defined for positive series (filter
    ``value > 0`` upstream, as the driver gate does); a zero trend
    or slot mean would make the ratios blow up — the textbook
    constraint.

    Same plan shape as the additive variant: one Exchange on the key
    serves the centered-MA window and the slot aggregate; the slot
    profile joins back broadcast; zero Python.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    half = period // 2
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w_ord = Window.partitionBy(key_col).orderBy(*order)
    w_ma = w_ord.rowsBetween(-half, half)
    base = (
        df.withColumn("_pos", F.row_number().over(w_ord) - F.lit(1))
        .withColumn("_n_in", F.count(F.lit(1)).over(w_ma))
        .withColumn(
            "trend",
            F.when(
                F.col("_n_in") == period, F.avg(value_col).over(w_ma)
            ),
        )
        .withColumn("_slot", F.col("_pos") % period)
        .withColumn("_ratio", F.col(value_col) / F.col("trend"))
    )
    prof = base.groupBy(key_col, "_slot").agg(
        F.avg("_ratio").alias("_slot_mean")
    )
    centered = prof.withColumn(
        "seasonal",
        F.col("_slot_mean")
        / F.avg("_slot_mean").over(Window.partitionBy(key_col)),
    ).select(key_col, "_slot", "seasonal")
    return (
        base.join(F.broadcast(centered), [key_col, "_slot"], "left")
        .withColumn(
            "residual",
            F.col(value_col) / (F.col("trend") * F.col("seasonal")),
        )
        .drop("_pos", "_n_in", "_slot", "_ratio")
    )
