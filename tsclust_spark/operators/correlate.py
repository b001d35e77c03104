"""Pairwise Pearson correlation between series over aligned time
buckets.

Plan shape: bucket each series to one row per (key, bucket) — partial
aggregation map-side, one Exchange on the series key — then equi-join
the bucketed table with itself ON THE BUCKET (never a crossJoin): each
time bucket contributes |keys_in_bucket|^2/2 pair rows, and the final
per-pair corr() aggregation is again partially aggregated before its
Exchange on (key_a, key_b).

Scale note: all-pairs correlation is inherently O(k^2) in the number of
series sharing a bucket; at 100 TB you bound k per bucket (candidate
pre-filter — SAX word equality from operators.symbolic, an LSH bucket
from operators.similarity, or an explicit pair list) and feed the
restricted pair set through the same bucket-join.  ``min_overlap``
drops pairs with too few shared buckets to correlate meaningfully —
applied post-aggregation, like SQL HAVING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """One mean-value row per (key, time bucket)."""
    return (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.avg(value_col).alias("v"))
    )


def series_corr_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    min_overlap: int = 5,
) -> DataFrame:
    """Pearson correlation for every pair of series with at least
    ``min_overlap`` shared buckets.

    Output: ``(key_a, key_b, n_overlap bigint, r double)`` with
    key_a < key_b and r the sample correlation (zero-variance pairs,
    where corr is undefined, are dropped on both engines).
    """
    b = bucketize(df, key_col, ts_col, value_col, bucket)
    # pair expansion WITHOUT a self-join: a DataFrame self-join would
    # compute the bucketize aggregation twice (Spark does not dedupe a
    # twice-referenced subplan) and add two more Exchanges for the join
    # key. Instead: collect each bucket's (key, v) rows into one sorted
    # array (one Exchange, reusing the bucketize output) and expand the
    # i<j pairs with higher-order functions, map-side. Per-bucket memory
    # is O(#series in the bucket) — the same quadratic pair OUTPUT as
    # the join, but the input row is bounded by the candidate-set
    # discipline described above.
    arr = F.array_sort(F.collect_list(F.struct("key", "v")))
    buckets = b.groupBy("bucket_ts").agg(arr.alias("_arr"))
    pair_expr = F.flatten(
        F.transform(
            F.col("_arr"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_arr"),
                    i + F.lit(2),
                    F.greatest(F.size("_arr") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x["key"].alias("key_a"),
                    y["key"].alias("key_b"),
                    x["v"].alias("v_a"),
                    y["v"].alias("v_b"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_expr).alias("_p"))
        .select("_p.key_a", "_p.key_b", "_p.v_a", "_p.v_b")
    )
    # covar/(sd*sd) with a nullif guard instead of F.corr: under ANSI
    # mode (Spark 4 default) corr on a zero-variance pair raises
    # DIVIDE_BY_ZERO; the guard yields NULL there, matching SQL corr()
    out = (
        pairs.groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            (
                F.covar_samp("v_a", "v_b")
                / F.nullif(
                    F.stddev_samp("v_a") * F.stddev_samp("v_b"), F.lit(0.0)
                )
            ).alias("r"),
        )
        .filter(F.col("n_overlap") >= min_overlap)
        .filter(F.col("r").isNotNull() & ~F.isnan("r"))
    )
    return out


def _avg_rank(value_col: str) -> F.Column:
    """Fractional (average) rank of ``value_col`` within the pair:
    rank() + (peers - 1)/2 — the standard tie treatment for Spearman.
    Ranks are integers-plus-halves, so the arithmetic is exact binary
    and engine-identical."""
    pair = ["key_a", "key_b"]
    r = F.rank().over(Window.partitionBy(*pair).orderBy(value_col))
    peers = F.count(F.lit(1)).over(Window.partitionBy(*pair, value_col))
    return r.cast("double") + (peers - F.lit(1)).cast("double") / F.lit(2.0)


def series_spearman_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    min_overlap: int = 5,
) -> DataFrame:
    """Spearman rank correlation for every pair of series with at least
    ``min_overlap`` shared buckets: Pearson over fractional ranks of
    the PAIRED sample (each side ranked within its pair, average ranks
    on ties) — the robust, outlier- and monotone-transform-insensitive
    complement to :func:`series_corr_pairs`.

    Plan shape: identical bucket-collect pair expansion (no self-join),
    then ONE Exchange on (key_a, key_b) evaluates both sides' rank
    windows and the final moment aggregate — the rank windows reuse the
    aggregation's partitioning, so ranking adds sorts but no shuffle.

    Output: ``(key_a, key_b, n_overlap bigint, rho double)``; pairs
    where either side is constant (rank variance zero) are dropped on
    both engines.
    """
    b = bucketize(df, key_col, ts_col, value_col, bucket)
    arr = F.array_sort(F.collect_list(F.struct("key", "v")))
    buckets = b.groupBy("bucket_ts").agg(arr.alias("_arr"))
    pair_expr = F.flatten(
        F.transform(
            F.col("_arr"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_arr"),
                    i + F.lit(2),
                    F.greatest(F.size("_arr") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x["key"].alias("key_a"),
                    y["key"].alias("key_b"),
                    x["v"].alias("v_a"),
                    y["v"].alias("v_b"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_expr).alias("_p"))
        .select("_p.key_a", "_p.key_b", "_p.v_a", "_p.v_b")
        .withColumn("rank_a", _avg_rank("v_a"))
        .withColumn("rank_b", _avg_rank("v_b"))
    )
    return (
        pairs.groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            (
                F.covar_samp("rank_a", "rank_b")
                / F.nullif(
                    F.stddev_samp("rank_a") * F.stddev_samp("rank_b"),
                    F.lit(0.0),
                )
            ).alias("rho"),
        )
        .filter(F.col("n_overlap") >= min_overlap)
        .filter(F.col("rho").isNotNull() & ~F.isnan("rho"))
    )
