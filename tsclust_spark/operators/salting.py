"""Two-stage salted aggregation for skewed group keys (SURVEY.md C5).

The mandated skew case (BASELINE.json:14): ``source`` is ~80% one value,
so a plain ``groupBy("source")`` funnels 80% of the table through one
reducer. AQE splits skewed *joins* but does NOT salt aggregations, so we
do it explicitly:

  stage 1: group by ``(source, salt)`` where ``salt = pmod(hash(doc_id), S)``
           — S-way fan-out of the hot key, partial stats per shard;
  stage 2: group by ``source`` merging the partials (decomposable stats
           only: sum/count/min/max — mean derived at the end).

Cost: one extra (tiny) shuffle of S rows per group vs. an unbounded
hot-partition stall. At 10^12 rows the stage-1 shuffle is the same size
as the unsalted one but evenly spread across S*n_groups reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str = "doc_id", n_salts: int = 16) -> DataFrame:
    return df.withColumn("salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)))


def salted_stats(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_tok",
    salt_from: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe per-group stats: count, sum, min, max, mean.

    Bit-identical to the unsalted groupBy for integer values (integer
    sums are associative across the two stages).
    """
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(group_col, "salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(value_col).alias("_sum"),
            F.min(value_col).alias("_min"),
            F.max(value_col).alias("_max"),
        )
    )
    return (
        partial.groupBy(group_col)
        .agg(
            F.sum("_cnt").alias("count_value"),
            F.sum("_sum").alias("sum_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        )
        .withColumn(
            "mean_value", F.col("sum_value").cast("double") / F.col("count_value")
        )
    )
