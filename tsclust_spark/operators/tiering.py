"""Shared per-series calendar-tier construction.

The repo-wide convention every tier-based statistic starts from
(AR(1), ordinal/permutation entropy, spectral power, change-point
family, ...): drop NULL values, collapse raw points to one mean row
per (key, truncated bucket), key cast to string so mixed-type key
columns gate identically across engines.  The SQL-twin line is
always::

    SELECT CAST(<key> AS VARCHAR) AS key,
           date_trunc('<trunc>', <ts>) AS bucket, avg(<value>) AS v
    FROM ... WHERE <value> IS NOT NULL GROUP BY 1, 2

Centralized so a change to the convention (bucket typing, NULL
policy) is one edit, not one per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_tier(
    df: DataFrame,
    trunc: str = "day",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``(key string, bucket timestamp, v double)`` — one mean row per
    (key, ``trunc`` bucket) over non-NULL values."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("v"))
    )
