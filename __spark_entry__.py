"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship tier-rollup pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator DuckDB-checked queries
(SURVEY.md §2 inventory). Float aggregates are rounded identically on
both sides so the driver's value-hash compares stably.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Tier cascade over the events table at sf0.001: raw -> 1m -> 1h.

    Returns the 1h continuous aggregate (min/max/mean/count per
    user_id x hour) computed by cascading from the 1m tier — the
    engine's core operator chain (SURVEY.md C16/C17).
    """
    from tsclust_spark.operators.rollup import cascade_tier, rollup_tier

    events = _load(spark, "/root/testdata/sf0.001", "events")
    points = events.select(
        F.col("user_id").alias("doc_id"), F.col("ts"), F.col("value")
    )
    t1m = rollup_tier(points, "1m", integer_values=False)
    return cascade_tier(t1m, "1h", integer_values=False)


# ---------------------------------------------------------------------------
# queries + DuckDB oracles
# ---------------------------------------------------------------------------

def _q_tier_1m_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: 1-minute continuous aggregate over events."""
    from tsclust_spark.operators.rollup import rollup_tier

    points = _load(spark, sf_dir, "events").select(
        F.col("user_id").alias("doc_id"), "ts", "value"
    )
    t = rollup_tier(points, "1m", integer_values=False)
    return t.select(
        "doc_id",
        "bucket_ts",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round("sum_value", 4).alias("sum_value"),
        "count_value",
        F.round("mean_value", 6).alias("mean_value"),
    )


_SQL_TIER_1M_EVENTS = """
SELECT user_id AS doc_id,
       date_trunc('minute', ts) AS bucket_ts,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(sum(value), 4) AS sum_value,
       count(value) AS count_value,
       round(sum(value) / count(value), 6) AS mean_value
FROM events
GROUP BY 1, 2
"""


def _q_tier_cascade_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: 1h tier built by cascading from 1m — oracle computes 1h directly
    from raw, proving the cascade is exact (decomposable stats)."""
    from tsclust_spark.operators.rollup import cascade_tier, rollup_tier

    points = _load(spark, sf_dir, "events").select(
        F.col("user_id").alias("doc_id"), "ts", "value"
    )
    t1m = rollup_tier(points, "1m", integer_values=False)
    t1h = cascade_tier(t1m, "1h", integer_values=False)
    return t1h.select(
        "doc_id",
        "bucket_ts",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        "count_value",
        F.round("mean_value", 6).alias("mean_value"),
    )


_SQL_TIER_1H_DIRECT = """
SELECT user_id AS doc_id,
       date_trunc('hour', ts) AS bucket_ts,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       count(value) AS count_value,
       round(sum(value) / count(value), 6) AS mean_value
FROM events
GROUP BY 1, 2
"""


def _q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9/C10/C16/C20 plumbing: TPC-H Q1-style pricing summary."""
    li = _load(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


_SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _q_explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: posexplode of an array column (embeddings as the stand-in for
    the tokens array; value rounded for float-hash stability)."""
    emb = _load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select(
        "vec_id", "pos", F.round(F.col("component").cast("double"), 5).alias("component")
    )


_SQL_EXPLODE_POSITIONS = """
SELECT vec_id,
       CAST(u.pos - 1 AS INT) AS pos,
       round(CAST(u.component AS DOUBLE), 5) AS component
FROM (
  SELECT vec_id,
         unnest(embedding) AS component,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
) u
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tier_1m_events": _q_tier_1m_events,
        "tier_cascade_1h_events": _q_tier_cascade_1h_events,
        "lineitem_pricing_summary": _q_lineitem_pricing_summary,
        "explode_positions": _q_explode_positions,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tier_1m_events": _SQL_TIER_1M_EVENTS,
        "tier_cascade_1h_events": _SQL_TIER_1H_DIRECT,
        "lineitem_pricing_summary": _SQL_LINEITEM_PRICING,
        "explode_positions": _SQL_EXPLODE_POSITIONS,
    }
