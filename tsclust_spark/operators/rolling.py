"""Trailing time-range rolling statistics and z-score anomaly flags.

The window is a RANGE frame over floor-epoch seconds — time-based, not
row-based, so irregular sampling is handled correctly (a 10-minute
window means 10 minutes, not N rows).  Epoch seconds rather than raw
timestamps keep the frame semantics identical across engines (a SQL
twin orders by the same integer and uses a numeric RANGE frame, so
peer groups and boundaries agree exactly).

Scale shape: one Exchange on the series key, then a single sorted pass
per partition computes every stat (Spark evaluates all window
aggregates over one frame in one WindowExec).  Hot keys: the same
pre-split discipline as operators/asof.py — range-bucket the hot key's
timeline upstream and stitch, or cap per-key history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 600,
) -> DataFrame:
    """Append trailing-window aggregates (inclusive of the current row):
    ``roll_n, roll_avg, roll_min, roll_max, roll_std`` over the last
    ``window_seconds`` seconds per key."""
    epoch = F.unix_timestamp(F.col(ts_col))
    base = df.withColumn("_epoch", epoch)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_epoch"))
        .rangeBetween(-int(window_seconds), 0)
    )
    return (
        base.withColumn("roll_n", F.count(F.lit(1)).over(w))
        .withColumn("roll_avg", F.avg(value_col).over(w))
        .withColumn("roll_min", F.min(value_col).over(w))
        .withColumn("roll_max", F.max(value_col).over(w))
        # NaN -> NULL: Spark's stddev_samp yields NaN on a 1-row frame
        # where SQL engines yield NULL; normalize to the SQL convention
        .withColumn(
            "roll_std",
            F.when(
                F.isnan(F.stddev_samp(value_col).over(w)), F.lit(None)
            ).otherwise(F.stddev_samp(value_col).over(w)),
        )
        .drop("_epoch")
    )


def rolling_median(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 600,
) -> DataFrame:
    """Append the EXACT trailing-window median (``roll_n``,
    ``roll_median``) over the last ``window_seconds`` seconds per key.

    Uses Spark's exact ``percentile`` aggregate (linear interpolation
    between the two middle order statistics — the same continuous
    definition as SQL ``quantile_cont``/``percentile_cont``) over a
    numeric RANGE frame.  Exactness costs a per-frame sort of the
    frame's values; this is the robust-statistics complement to
    ``rolling_stats`` (mean/std are moment-decomposable, the median is
    not — approx_percentile is the knob to reach for when frames grow
    beyond ~1e5 points per window at full scale).
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    base = df.withColumn("_epoch", epoch)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_epoch"))
        .rangeBetween(-int(window_seconds), 0)
    )
    return (
        base.withColumn("roll_n", F.count(F.lit(1)).over(w))
        .withColumn("roll_median", F.percentile(value_col, F.lit(0.5)).over(w))
        .drop("_epoch")
    )


def _arr_median(arr) -> F.Column:
    """Exact median of an array column via sort + middle elements —
    linear interpolation at even sizes, the same continuous definition
    as ``percentile``/``quantile_cont``/DuckDB ``median``."""
    s = F.array_sort(arr)
    n = F.size(s)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))
    hi = F.element_at(s, (n / 2 + 1).cast("int"))
    return (lo + hi) / F.lit(2.0)


def mad_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    threshold: float = 3.5,
    quantize_digits: int = 6,
) -> DataFrame:
    """Robust anomaly flags: modified z-score vs the trailing window's
    median absolute deviation (Iglewicz-Hoaglin: 0.6745*(x - med)/MAD,
    flag at |z| > 3.5) — the outlier-resistant twin of
    :func:`zscore_anomalies` (one wild spike inflates mean/std and can
    mask itself; it barely moves median/MAD).

    MAD is not frame-decomposable (each row's frame has its own
    median), so the frame's values ride a ``collect_list`` window and
    both medians are exact JVM higher-order expressions over that
    array.  Cost: O(frame log frame) per row map-side — bound the frame
    (time-window x sampling rate) exactly like the exact rolling
    median.  Same single-Exchange plan as every trailing-window op.

    The score is quantized before the threshold comparison (engine-
    identical flags); zero-MAD windows yield NULL z and flag false.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    base = df.withColumn("_epoch", epoch)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_epoch"))
        .rangeBetween(-int(window_seconds), 0)
    )
    arr = F.collect_list(value_col).over(w)
    med = _arr_median(arr)
    mad = _arr_median(F.transform(arr, lambda v: F.abs(v - med)))
    s = float(10**quantize_digits)
    z_raw = F.lit(0.6745) * (F.col(value_col) - med) / F.nullif(mad, F.lit(0.0))
    z = F.floor(F.abs(z_raw) * s + F.lit(0.5)) / F.lit(s)
    return (
        base.withColumn("roll_n", F.count(F.lit(1)).over(w))
        .withColumn("roll_median", med)
        .withColumn("roll_mad", mad)
        .withColumn("abs_mod_z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.col("abs_mod_z") > F.lit(threshold), F.lit(False)),
        )
        .drop("_epoch")
    )


def zscore_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    threshold: float = 3.0,
    quantize_digits: int = 6,
) -> DataFrame:
    """Flag points deviating more than ``threshold`` trailing-window
    standard deviations from the trailing mean.

    The z-score is quantized (engine-wide floor-rounding) BEFORE the
    threshold comparison so borderline values flag identically on any
    engine computing the same formula.  Windows with fewer than 2 points
    or zero variance yield z = NULL and flag false.
    """
    r = rolling_stats(df, key_col, ts_col, value_col, window_seconds)
    s = float(10**quantize_digits)
    z_raw = (F.col(value_col) - F.col("roll_avg")) / F.nullif(
        F.col("roll_std"), F.lit(0.0)
    )
    z = F.floor(F.abs(z_raw) * s + F.lit(0.5)) / F.lit(s)
    return (
        r.withColumn("abs_z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.col("abs_z") > F.lit(threshold), F.lit(False)),
        )
        .drop("roll_min", "roll_max")
    )
