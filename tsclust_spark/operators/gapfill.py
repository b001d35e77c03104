"""Gap-fill over tier tables: LOCF and linear interpolation (SURVEY.md C18/C19).

The dense bucket grid comes from ``sequence(min_ts, max_ts, interval)``
per key (one tiny per-key agg + a generator explode — no Python), the
sparse tier is left-joined on, and the fill itself is a window function:

- LOCF: ``last(value, ignorenulls=True)`` over an unbounded-preceding
  row window — one pass, whole-stage codegen.
- linear: bracketing (ts, value) pairs via backward ``last`` + forward
  ``first`` windows, then the interpolation formula in plain column
  arithmetic. Points before the first / after the last observation stay
  null (no extrapolation).

Scale: both fills are a single shuffle on the key (the window's
partitionBy). The grid explode multiplies rows but stays pipelined into
the window stage; for a 1m grid over a day that is 1440 rows per key —
bounded, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INTERVALS = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def dense_grid(
    tier_df: DataFrame,
    tier: str = "1m",
    key_col: str = "doc_id",
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Per-key dense bucket grid spanning [min(ts), max(ts)]."""
    interval = INTERVALS[tier]
    bounds = tier_df.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    return bounds.select(
        key_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {interval}"))
        ).alias(ts_col),
    )


def fill_gaps(
    tier_df: DataFrame,
    tier: str = "1m",
    method: str = "locf",
    key_col: str = "doc_id",
    ts_col: str = "bucket_ts",
    value_col: str = "mean_value",
) -> DataFrame:
    """Dense per-key series with gaps filled.

    Output: ``(key, bucket_ts, value, filled boolean)`` where ``filled``
    marks synthesized buckets.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gap-fill method: {method!r}")
    grid = dense_grid(tier_df, tier, key_col, ts_col)
    sparse = tier_df.select(
        key_col, ts_col, F.col(value_col).alias("_obs")
    )
    joined = grid.join(sparse, on=[key_col, ts_col], how="left")

    w_back = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "locf":
        filled = joined.select(
            key_col,
            ts_col,
            F.last("_obs", ignorenulls=True).over(w_back).alias(value_col),
            F.col("_obs").isNull().alias("filled"),
        )
        return filled

    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ts_long = F.unix_timestamp(F.col(ts_col))
    obs_ts = F.when(F.col("_obs").isNotNull(), ts_long)
    prev_v = F.last("_obs", ignorenulls=True).over(w_back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_back)
    next_v = F.first("_obs", ignorenulls=True).over(w_fwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_fwd)
    interp = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v
            + (next_v - prev_v)
            * (ts_long - prev_t)
            / F.when(next_t != prev_t, next_t - prev_t),
        )
    )
    return joined.select(
        key_col,
        ts_col,
        interp.alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )
