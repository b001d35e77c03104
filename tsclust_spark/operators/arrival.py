"""Inter-arrival time statistics and burstiness per series.

Tier statistics describe VALUES; this describes the event process
itself: per key, the distribution of gaps between consecutive events
and Goh & Barabási's burstiness coefficient (EPL 81:48002, 2008,
public literature)

    B = (sigma - mu) / (sigma + mu)

over the gap distribution — B ~ -1 for a metronome (periodic
heartbeat), ~0 for a Poisson process, -> +1 for heavy-tailed bursts.
The single most useful triage split for event telemetry: a regular
sensor whose B jumps toward 1 has started dropping and batching.

Engine shape: one window ``lag`` ordered by (ts, tiebreak) forms the
gaps, one hash aggregate computes count/min/max and the two moment
sums; mean, sample std, and B are projected from the moments in the
same float64 expression tree on both engines.  Zero Python, one
key-partitioned Exchange; keys parallelize like any grouped window.

Determinism: the tiebreak column totalizes the order under duplicate
timestamps (ADVICE-r3 rule), making the gap MULTISET itself exact —
duplicate-ts pairs contribute exact zeros; moment-sum ordering
differences sit far below the 6-dp gate rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interarrival_stats(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gaps: int = 3,
) -> DataFrame:
    """``(key, n_gaps, mean_gap_s, std_gap_s, max_gap_s, burstiness)``
    per key with at least ``min_gaps`` inter-event gaps.

    Gaps are in float seconds (microsecond timestamps divide
    exactly); ``std_gap_s`` is the sample (n-1) standard deviation;
    keys whose gaps are all identical (sigma = 0, B undefined at
    -0/0 ... well-defined but degenerate) report ``burstiness`` -1
    when mu > 0 and are omitted when mu = sigma = 0 (every event at
    one instant).
    """
    w = Window.partitionBy("key").orderBy(ts_col, tiebreak_col)
    # microsecond-precision seconds: integer microseconds / 1e6 is
    # exact in float64 for any realistic span.  unix_micros rejects
    # TIMESTAMP_NTZ (the parquet fixtures' type); the cast is a no-op
    # relabel under the session's UTC timezone, matching DuckDB's
    # naive epoch_us.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .withColumn("gap_s", (us - F.lag(us).over(w)) / F.lit(1e6))
        .filter(F.col("gap_s").isNotNull())
    )
    mom = gaps.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        F.max("gap_s").alias("max_gap_s"),
    )
    n = F.col("n_gaps")
    mean = F.col("s1") / n
    # sample variance from moments, clamped against negative rounding
    var = F.greatest(
        F.lit(0.0),
        (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1),
    )
    std = F.sqrt(var)
    return (
        mom.filter((n >= min_gaps) & (F.col("s1") > 0.0))
        .select(
            "key",
            n.cast("long").alias("n_gaps"),
            mean.alias("mean_gap_s"),
            std.alias("std_gap_s"),
            F.col("max_gap_s"),
            ((std - mean) / (std + mean)).alias("burstiness"),
        )
    )
