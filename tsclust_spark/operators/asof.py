"""As-of join + gap sessionization — time-series relational operators.

Neither exists as a Spark built-in; both are expressed as single-shuffle
DataFrame plans (no UDFs, no per-row Python), which is the shape that
survives 100 TB:

- :func:`asof_join`: for each left row, the most recent right row with
  ``r.ts <= l.ts`` per key. Implemented with the union-tag trick: tag
  and union both sides, ONE shuffle on the key, and a running
  ``last(..., ignorenulls=True)`` window carries the right side's
  latest values forward onto left rows. Cost: one Exchange + one
  in-partition sort — strictly cheaper than a range join (which Spark
  would plan as a broadcast-nested-loop or a cross-range product).
- :func:`sessionize`: assign session ids by inactivity gap — the
  classic ``lag`` + cumulative-sum-of-boundaries window pair, again one
  shuffle on the key.

Per-key time ordering lives inside a single window partition; skewed
keys (one device with billions of points) should be pre-split by time
range upstream (the window itself is sequential per key by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    right_value_col: str = "value",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left rows + the latest right value at-or-before each left ts.

    Output: left's columns + ``asof_value`` / ``asof_ts`` (null when no
    right row precedes, or when it is older than ``tolerance_seconds``).
    Right rows tie-sorted before left rows at equal ``ts`` so an exact
    timestamp match IS visible (DuckDB ``ASOF JOIN`` semantics,
    ``l.ts >= r.ts``).
    """
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_value_col].dataType).alias("_rv"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in (key_col, ts_col)
        ],
        F.lit(0).alias("_side"),
        F.col(right_value_col).alias("_rv"),
        F.col(ts_col).alias("_rts"),
    ).select(*left_cols, "_side", "_rv", "_rts")

    merged = l.unionByName(r)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry (value, ts) as ONE struct so they always come from the SAME
    # right row: tracking them with two independent last(ignorenulls)
    # calls would pair a stale value with a newer row's timestamp
    # whenever a right row's value is NULL
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_rv").alias("rv"), F.col("_rts").alias("rts")),
    )
    out = (
        merged.withColumn("_r", right_row)
        .withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .withColumn("asof_value", F.col("_asof.rv"))
        .withColumn("asof_ts", F.col("_asof.rts"))
        .drop("_side", "_rv", "_rts", "_r", "_asof")
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp(ts_col) - F.unix_timestamp("asof_ts")
            > tolerance_seconds
        )
        out = out.withColumn(
            "asof_value", F.when(stale, None).otherwise(F.col("asof_value"))
        ).withColumn("asof_ts", F.when(stale, None).otherwise(F.col("asof_ts")))
    return out


def sessionize(
    points: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    since the key's previous event exceeds ``gap_seconds``.

    Output: input columns + ``session_id`` (0-based per key). One
    shuffle on the key; boundaries via ``lag``, ids via a running sum.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return points.withColumn(
        "session_id", (F.sum(is_new).over(running) - 1).cast("int")
    )


def session_stats(
    points: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output."""
    s = sessionize(points, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_sec"),
    )
