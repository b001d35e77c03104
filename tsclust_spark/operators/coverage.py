"""Tier completeness / coverage report per series.

The operational QC question every tier pipeline answers before any
statistic is trusted: for each key, WHICH FRACTION of the expected
calendar actually has data, and how bad is the worst outage?  Reports,
per key over the daily tier:

    n_days_expected   days in [first bucket, last bucket] inclusive
    n_days_present    distinct days with >= 1 non-NULL point
    coverage          present / expected
    max_gap_days      largest run of consecutive MISSING days
                      (0 when the calendar is fully covered)
    n_gaps            number of distinct missing runs

Engine shape: one hash aggregate to the daily tier, one ``lag``
window for bucket-to-bucket deltas (a delta of d days means d-1
missing days between two present buckets), one final aggregate.
The expected calendar is NEVER materialized — no explode/sequence,
no rows for missing days — so the operator costs O(present buckets)
regardless of how sparse the series is; a key with 2 points spanning
ten years is 2 rows, not 3650.  All Catalyst expressions, zero
Python, integer-exact (the only doubles are the final ratio).

Relation to gap-fill (operators/gapfill.py): gapfill MATERIALIZES the
missing buckets to repair them; this reports on them without paying
for materialization — run coverage first, gap-fill only the keys
worth repairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coverage_report(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``(key, n_days_expected, n_days_present, coverage,
    max_gap_days, n_gaps)`` per key; every key with at least one
    non-NULL point yields exactly one row."""
    tier = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .distinct()
    )

    w = Window.partitionBy("key").orderBy("day")
    gaps = tier.withColumn(
        "gap_before",
        F.datediff(F.col("day"), F.lag("day").over(w)) - F.lit(1),
    )

    agg = gaps.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days_present"),
        (
            F.datediff(F.max("day"), F.min("day")) + F.lit(1)
        ).cast("long").alias("n_days_expected"),
        F.coalesce(F.max("gap_before"), F.lit(0))
        .cast("long")
        .alias("max_gap_days"),
        F.sum(
            F.when(F.col("gap_before") > 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_gaps"),
    )
    return agg.select(
        "key",
        "n_days_expected",
        "n_days_present",
        (
            F.col("n_days_present") / F.col("n_days_expected")
        ).alias("coverage"),
        "max_gap_days",
        "n_gaps",
    )
