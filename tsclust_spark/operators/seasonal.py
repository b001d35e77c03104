"""Seasonal baseline profile + anomalies (calendar seasonality).

``seasonal_profile`` aggregates each series into per-slot statistics
(slot = hour-of-day by default, optionally day-of-week): the profile a
capacity planner or anomaly detector compares against. ``
seasonal_anomalies`` joins every point back to its slot's profile and
flags |z| >= threshold — "this Tuesday-3am point is wild FOR
Tuesday-3am", which a rolling z-score (operators/rolling.py) cannot
express because its window mixes all times of day.

Scale notes (100 TB): the profile is (keys x n_slots) rows — far
smaller than the point table, but it SCALES WITH KEY CARDINALITY, so
the join strategy is a caller knob (``broadcast_profile``): broadcast
for bounded key sets (the fact side never shuffles), shuffle join on
(key, slot) for 10^7+ series, or let AQE decide from size estimates
(default). The profile aggregate itself is one partial+final hash
aggregate (decomposable count/mean/std moments).

NULL/degenerate contract (tools/fuzz_oracle.py class): NULL values
drop out of both the profile and the flags; a slot with one point has
NULL std (stddev_samp) and a constant slot has std 0 — both yield
NULL z (guarded division, matching DuckDB's x/0 = NULL), never an
ANSI DIVIDE_BY_ZERO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SLOT_EXPRS = {
    # hour-of-day 0..23; day-of-week 1..7 (Sunday=1, both engines'
    # dayofweek/isodow differ — use Spark dayofweek and DuckDB's
    # dayofweek+1 equivalent documented in the oracle)
    "hour_of_day": lambda ts: F.hour(ts),
    "day_of_week": lambda ts: F.dayofweek(ts),
}


def seasonal_profile(
    df: DataFrame,
    slot: str = "hour_of_day",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, slot) statistics: ``(key, slot, n, mean_value,
    std_value)`` over non-NULL values."""
    if slot not in SLOT_EXPRS:
        raise ValueError(f"slot must be one of {sorted(SLOT_EXPRS)}")
    s = SLOT_EXPRS[slot](F.col(ts_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), s.alias("slot"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("mean_value"),
            F.stddev_samp(value_col).alias("std_value"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    threshold: float = 3.0,
    slot: str = "hour_of_day",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    broadcast_profile: bool | None = None,
) -> DataFrame:
    """Points whose value deviates >= threshold sample-stddevs from
    their own (key, slot) seasonal mean.

    Output: ``(key, ts, value, slot, z)`` for flagged points only.
    Slots with NULL or zero std produce no flags (z undefined).

    ``broadcast_profile``: the profile is keys x n_slots rows — tiny
    for bounded key sets (hosts, tenants: force-broadcast with True so
    the point side never shuffles), but it SCALES WITH KEYS: at 10^7+
    series it no longer fits an executor, so pass False to plan a
    shuffle join on (key, slot) instead. The default None lets
    Catalyst/AQE decide from the profile's size estimate — the right
    call when key cardinality is unknown.
    """
    prof = seasonal_profile(df, slot, key_col, ts_col, value_col)
    if broadcast_profile:
        prof = F.broadcast(prof)
    s = SLOT_EXPRS[slot](F.col(ts_col))
    pts = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        s.alias("slot"),
    )
    z = F.when(
        F.col("std_value") > 0,
        (F.col("value") - F.col("mean_value")) / F.col("std_value"),
    )
    return (
        pts.join(prof, ["key", "slot"])
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .select("key", "ts", "value", "slot", "z")
    )
