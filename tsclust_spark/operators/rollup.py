"""Continuous-aggregate tier rollup: raw -> 1m -> 1h -> 1d (SURVEY.md C16/C17).

Each tier stores the decomposable stats ``(min, max, sum, count)`` per
``(key, bucket_ts)``; ``mean`` is derived as ``sum / count`` on read —
never an average of averages — so the 1h tier computed by cascading from
1m is bit-exact equal to the 1h tier computed directly from raw points
(integer sums are associative; this is the SURVEY.md §7 "hard part (a)"
design). Buckets use ``date_trunc``, which exists with identical
semantics in DuckDB for the oracle comparison.

Scale notes (100 TB): the rollup is ONE hash-aggregate per tier —
Catalyst plans partial (map-side) + final aggregation automatically, so
the shuffle carries only per-bucket partials. The cascade re-aggregates
the (already tiny) finer tier instead of rescanning raw data: 1m -> 1h
-> 1d touches ~1/60 then ~1/3600 of the raw volume. Tier tables are
written partitioned by ``bucket_date`` for partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["1m", "1h", "1d"]


def _agg_exprs(value_col: str, sum_type: str):
    return [
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.sum(value_col).cast(sum_type).alias("sum_value"),
        F.count(value_col).alias("count_value"),
    ]


def rollup_tier(
    points_df: DataFrame,
    tier: str = "1m",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    integer_values: bool = True,
) -> DataFrame:
    """Aggregate a long points view into one retention tier.

    Output: ``(key, bucket_ts, min_value, max_value, sum_value,
    count_value, mean_value)``. With ``integer_values`` the sum is kept
    as BIGINT (exact, associative -> bit-exact cascade).
    """
    trunc = TIER_TRUNC[tier]
    sum_type = "bigint" if integer_values else "double"
    out = (
        points_df.groupBy(
            F.col(key_col),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(*_agg_exprs(value_col, sum_type))
    )
    return out.withColumn(
        "mean_value",
        F.col("sum_value").cast("double") / F.col("count_value"),
    )


def cascade_tier(
    finer_df: DataFrame,
    tier: str,
    key_col: str = "doc_id",
    integer_values: bool = True,
) -> DataFrame:
    """Coarser tier from a finer tier (1m -> 1h -> 1d), exactly.

    min/max compose as min-of-min / max-of-max; sum and count add. The
    derived mean is therefore identical to a direct rollup from raw.
    """
    trunc = TIER_TRUNC[tier]
    sum_type = "bigint" if integer_values else "double"
    out = (
        finer_df.groupBy(
            F.col(key_col),
            F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_value").cast(sum_type).alias("sum_value"),
            F.sum("count_value").alias("count_value"),
        )
    )
    return out.withColumn(
        "mean_value",
        F.col("sum_value").cast("double") / F.col("count_value"),
    )


def rollup_all_tiers(
    points_df: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    integer_values: bool = True,
) -> dict[str, DataFrame]:
    """The full cascade. The 1m tier is the only scan of raw points."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_tier(
        points_df, "1m", key_col, ts_col, value_col, integer_values
    )
    tiers["1h"] = cascade_tier(tiers["1m"], "1h", key_col, integer_values)
    tiers["1d"] = cascade_tier(tiers["1h"], "1d", key_col, integer_values)
    return tiers


def rollup_sequences_1m_fast(
    seq_df: DataFrame,
    t0: str = "2024-01-01 00:00:00",
    step_seconds: int = 1,
    with_rep: bool = True,
) -> DataFrame:
    """Map-only 1m tier straight from the nested sequence rows.

    The mandated input keeps one doc's whole series in one row on an
    implicit 1s grid (SURVEY.md §1.3), so each 60s bucket is a
    contiguous ``slice`` of the tokens array: min/max/sum/count/medoid
    are pure array expressions — **no explode of 60x the rows, and no
    shuffle at all** for the 1m tier (each output row derives from one
    input row). The 1h/1d cascade then shuffles only the 1m tier, 60x
    smaller than the raw points. Requires ``t0`` minute-aligned and
    ``60 % step_seconds == 0``.

    Bit-exact equal to the explode-based
    ``rollup_tier(explode_to_points(seq))`` path (asserted in
    tests/test_fastpath.py).
    """
    if 60 % step_seconds != 0:
        raise ValueError("fast path needs step_seconds dividing 60")
    per_bucket = 60 // step_seconds
    t0_expr = f"to_timestamp('{t0}')"

    chunks = seq_df.filter(F.size("tokens") > 0).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"""
                transform(
                  sequence(0, int(ceil(size(tokens) / {per_bucket})) - 1),
                  b -> slice(tokens, b * {per_bucket} + 1, {per_bucket}))
                """
            )
        ).alias("bucket_idx", "chunk"),
    )
    out = chunks.select(
        "doc_id",
        F.expr(
            f"{t0_expr} + make_interval(0, 0, 0, 0, 0, bucket_idx, 0)"
        ).alias("bucket_ts"),
        F.array_min("chunk").alias("min_value"),
        F.array_max("chunk").alias("max_value"),
        F.expr("aggregate(chunk, 0L, (acc, x) -> acc + x)").alias("sum_value"),
        F.size("chunk").cast("long").alias("count_value"),
        *(
            [
                F.expr(
                    "element_at(array_sort(chunk),"
                    " cast((size(chunk) + 1) / 2 as int))"
                ).alias("rep_value")
            ]
            if with_rep
            else []
        ),
    )
    return out.withColumn(
        "mean_value", F.col("sum_value").cast("double") / F.col("count_value")
    )


def write_tier(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Full-write tier sink (SURVEY.md C2), partitioned for pruning.

    Iceberg variant on a real cluster: ``df.writeTo(tbl).createOrReplace()``
    with ``days(bucket_ts)`` partition transform; sandbox uses parquet
    with an explicit ``bucket_date`` partition column.
    """
    (
        df.withColumn("bucket_date", F.to_date("bucket_ts"))
        # range partition (C6) + in-partition sort (C22): clusters files
        # by (date, doc) so doc_id predicates prune row groups on read
        .repartitionByRange("bucket_date", "doc_id")
        .sortWithinPartitions("bucket_date", "doc_id")
        .write.mode(mode)
        .partitionBy("bucket_date")
        .parquet(path)
    )
