"""Bucketed interval (range) join: points into containing intervals.

The naive plan for ``p JOIN i ON p.key = i.key AND p.ts BETWEEN i.start
AND i.end`` equi-joins on the key alone and post-filters the range —
every point meets every interval of its key, so a key with millions of
points and thousands of intervals fans out multiplicatively.  The scale
shape (same trick as Spark's own range-join hints and the dedup LSH
band-join) is to chunk time into coarse buckets: an interval explodes
into the buckets it spans, a point lands in exactly one bucket, and the
join key becomes (key, bucket) — fan-out is bounded by intervals
actually overlapping the point's bucket, and the exact BETWEEN filter
runs on that small candidate set.

Pick ``bucket_seconds`` near the typical interval length: much smaller
buckets inflate the exploded interval side, much larger ones degrade
back toward the naive fan-out.  Both sides shuffle once on
(key, bucket); no crossJoin, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Inner-join each point to every interval of the same key whose
    [start, end] (inclusive both ends) contains it.

    Output: all point columns + all non-key interval columns.
    ``max_buckets_per_interval`` guards against a runaway explode from a
    degenerate open-ended interval (the sequence() would otherwise
    materialize it); offenders fail the job loudly rather than OOM.
    """
    b = F.lit(int(bucket_seconds))
    # unix_timestamp, not a long cast: parquet timestamps arrive as
    # TIMESTAMP_NTZ, which Spark refuses to cast to numeric
    s_b = F.floor(F.unix_timestamp(F.col(start_col)) / b)
    e_b = F.floor(F.unix_timestamp(F.col(end_col)) / b)
    guarded = intervals.withColumn(
        "_n_buckets", (e_b - s_b + F.lit(1)).cast("long")
    ).withColumn(
        "_bucket",
        F.explode(
            F.when(
                F.col("_n_buckets") <= max_buckets_per_interval,
                F.sequence(s_b, e_b),
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "interval spans %d buckets > max %d — raise "
                        "bucket_seconds or split the interval",
                        F.col("_n_buckets"),
                        F.lit(max_buckets_per_interval),
                    )
                )
            )
        ),
    ).drop("_n_buckets")
    pts = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    joined = pts.join(guarded, on=key_cols + ["_bucket"], how="inner").filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")
