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


def rolling_corr(
    df: DataFrame,
    key_a: str,
    key_b: str,
    window_days: int = 7,
    min_days: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing ``window_days``-day Pearson correlation between TWO
    named series over the daily tier: ``(day, n_days, roll_corr)``.

    Where :func:`series_corr_pairs` reports one static number per
    pair, this tracks WHEN two macro signals couple and decouple — a
    regime-change lens (e.g. views and purchases correlating during a
    sale and decoupling after).  Only days where BOTH series have data
    enter; the trailing frame is calendar-RANGE (6 preceding days for
    a 7-day window), so data gaps shrink ``n_days`` rather than
    silently stretching the frame, and ``min_days`` drops frames too
    thin to correlate.  Zero-variance frames (either side constant)
    are dropped on both engines — corr is undefined there and engines
    disagree on 0/0.

    Engine shape: daily tier (one Exchange) -> per-day pivot of the
    two keys via conditional aggregation (one Exchange on day, no
    self-join, no re-aggregation) -> five moment sums over ONE shared
    calendar-range window -> the textbook sums-of-products corr
    projected driver-free.  The window is intentionally unpartitioned:
    input is one row per calendar DAY for a single pair (tier scale,
    ~365 rows/year), so single-task sequencing is correct and cheap;
    for many pairs, partition the same window by the pair id.

    Determinism: frame membership is integer calendar arithmetic; the
    only float work is the moment sums, whose frame-order evaluation
    differs across engines by ~1 ulp — far below the 6-dp gate.
    """
    tier = bucketize(
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(key_col).cast("string").isin([key_a, key_b])
        ),
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        bucket="day",
    )
    key = F.col("key").cast("string")
    pivot = (
        tier.groupBy(F.col("bucket_ts").alias("day"))
        .agg(
            F.max(F.when(key == key_a, F.col("v"))).alias("va"),
            F.max(F.when(key == key_b, F.col("v"))).alias("vb"),
        )
        .filter(F.col("va").isNotNull() & F.col("vb").isNotNull())
    )
    d_idx = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(d_idx)
        .rangeBetween(-(window_days - 1), Window.currentRow)
    )
    m = pivot.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("va").over(w).alias("sa"),
        F.sum("vb").over(w).alias("sb"),
        F.sum(F.col("va") * F.col("vb")).over(w).alias("sab"),
        F.sum(F.col("va") * F.col("va")).over(w).alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).over(w).alias("sbb"),
    )
    n = F.col("n_days")
    da = n * F.col("saa") - F.col("sa") * F.col("sa")
    db = n * F.col("sbb") - F.col("sb") * F.col("sb")
    r = (n * F.col("sab") - F.col("sa") * F.col("sb")) / F.sqrt(da * db)
    return (
        m.filter((n >= min_days) & (da > 0.0) & (db > 0.0))
        .select("day", n.cast("long").alias("n_days"), r.alias("roll_corr"))
    )
