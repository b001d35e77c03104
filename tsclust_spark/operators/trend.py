"""Per-window least-squares trend slope (rate-of-change estimator).

For each (series, tier bucket), fit ``value ~ a + slope * t`` by
ordinary least squares over the bucket's points — the
irregular-sampling-robust rate estimator (a naive last-minus-first
delta is hostage to the two boundary points; OLS uses every point).
``slope`` is per second.

Implementation notes:
- One partial+final hash aggregate over decomposable moment sums
  (n, Σx, Σy, Σxy, Σx²) — same single-Exchange shape as the tier
  rollups, whole-stage codegen, no UDF.
- ``x`` is seconds SINCE THE BUCKET START, not absolute epoch: epoch
  microseconds are ~1.7e15, so Σx² would hit 1e31 where float64
  cancellation destroys the slope; bucket-relative x is <= 3600.
- The slope is written as the explicit moment formula
  ``(n*Σxy - Σx*Σy) / (n*Σx² - Σx*Σx)`` on BOTH engines (the SQL twin
  spells out the same sums) rather than regr_slope(), whose internal
  algorithm differs between engines.
- Degenerate buckets (single point, or all points at one timestamp)
  have zero x-variance: slope is NULL (guarded, never ANSI
  DIVIDE_BY_ZERO); NULL values are excluded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tsclust_spark.operators.rollup import TIER_TRUNC


def trend_slope(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """OLS slope (units/second) per (key, bucket).

    Output: ``(key, bucket_ts, n, slope)``; slope NULL when the bucket
    has no x-variance.
    """
    trunc = TIER_TRUNC[tier]
    bucket = F.date_trunc(trunc, F.col(ts_col))
    # parquet timestamps may arrive as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP (session tz pinned to UTC, cast is a reinterpretation)
    x = (
        F.expr(f"unix_micros(cast({ts_col} as timestamp))")
        - F.unix_micros(bucket.cast("timestamp"))
    ).cast("double") / F.lit(1e6)
    y = F.col(value_col)
    base = df.filter(y.isNotNull()).select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket_ts"),
        x.alias("_x"),
        y.alias("_y"),
    )
    agg = base.groupBy("key", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom > 0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
    )
    return agg.select("key", "bucket_ts", "n", slope.alias("slope"))
