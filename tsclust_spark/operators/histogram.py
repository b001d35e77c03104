"""Mergeable per-bucket histograms for retention tiers.

min/max/sum/count cascade exactly but answer no distribution questions;
a fixed-bin histogram per (key, bucket) adds percentile/CDF estimates
with bin-width-bounded error, and — unlike quantile sketches — merges
EXACTLY (element-wise vector addition), so a 1m -> 1h -> 1d cascade is
bit-identical to binning the raw data directly at any tier.

Scale notes (100 TB): the histogram is built in ONE hash aggregate —
each bin is a conditional-sum expression, so the map-side partial
combine reduces every partition to (keys x buckets) rows of
``n_bins``-long arrays before the shuffle; no per-bin row explosion,
no second aggregate. Cascading aggregates the arrays element-wise in
the same partial/final shape. ``n_bins`` is a plan-time constant
(expressions, not data), so keep it modest (16-64); bounds are fixed
per deployment, which is what makes merges exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from tsclust_spark.operators.rollup import TIER_TRUNC


def bin_index(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped bin index in [0, n_bins): floor((v - lo) / w), with
    values below lo in bin 0 and at/above hi in the last bin. NULL
    values stay NULL (excluded from every bin)."""
    w = (hi - lo) / n_bins
    raw = F.floor((value - F.lit(lo)) / F.lit(w)).cast("int")
    return F.when(
        value.isNull(), F.lit(None).cast("int")
    ).otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)))


def histogram_tier(
    points_df: DataFrame,
    tier: str = "1m",
    lo: float = -100.0,
    hi: float = 100.0,
    n_bins: int = 16,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, bucket) fixed-bin histogram: ``(key, bucket_ts, hist)``
    with ``hist`` an ``array<bigint>`` of length ``n_bins``."""
    trunc = TIER_TRUNC[tier]
    # project the bin index ONCE per row: referencing the full bin_index
    # expression inside every conditional sum would evaluate the
    # floor/clamp chain n_bins times per row in the partial aggregate
    binned = points_df.select(
        F.col(key_col),
        F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        bin_index(F.col(value_col), lo, hi, n_bins).alias("_bin"),
    )
    bins = [
        F.sum(F.when(F.col("_bin") == i, 1).otherwise(0))
        .cast("bigint")
        .alias(f"_b{i}")
        for i in range(n_bins)
    ]
    agg = binned.groupBy(F.col(key_col), F.col("bucket_ts")).agg(*bins)
    return agg.select(
        key_col,
        "bucket_ts",
        F.array(*[F.col(f"_b{i}") for i in range(n_bins)]).alias("hist"),
    )


def cascade_histogram(
    finer_df: DataFrame,
    tier: str,
    n_bins: int = 16,
    key_col: str = "doc_id",
) -> DataFrame:
    """Coarser-tier histogram from a finer tier by element-wise addition
    — exact, because fixed-bin counts are associative."""
    trunc = TIER_TRUNC[tier]
    sums = [
        F.sum(F.col("hist")[i]).cast("bigint").alias(f"_b{i}")
        for i in range(n_bins)
    ]
    agg = finer_df.groupBy(
        F.col(key_col),
        F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
    ).agg(*sums)
    return agg.select(
        key_col,
        "bucket_ts",
        F.array(*[F.col(f"_b{i}") for i in range(n_bins)]).alias("hist"),
    )


def percentile_from_histogram(
    hist_df: DataFrame,
    q: float,
    lo: float,
    hi: float,
    n_bins: int,
    out_col: str = "p_est",
) -> DataFrame:
    """Estimate the q-quantile per row from ``hist``: the upper edge of
    the first bin where the cumulative count reaches ``q * total``.
    Error is bounded by one bin width; the estimate is deterministic
    and engine-reproducible (no interpolation). Pure expressions — no
    shuffle, no UDF.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    w = (hi - lo) / n_bins
    total = F.aggregate("hist", F.lit(0).cast("bigint"), lambda a, x: a + x)
    target = F.ceil(F.lit(q) * total)
    # cum[i] = sum(hist[0..i]), then the first index reaching the
    # target rank (n_bins is small, so the O(n_bins^2) expression tree
    # is plan-time noise)
    cum = F.transform(
        F.sequence(F.lit(1), F.lit(n_bins)),
        lambda i: F.aggregate(
            F.slice("hist", F.lit(1), i),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ),
    )
    idx = F.array_position(
        F.transform(cum, lambda c: c >= target), F.lit(True)
    )  # 1-based; 0 if not found (empty histogram)
    est = F.when(idx > 0, F.lit(lo) + idx.cast("double") * F.lit(w))
    return hist_df.withColumn(out_col, est)


def value_entropy(
    df: DataFrame,
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 32,
    key_col: str = "event_type",
    value_col: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Binned Shannon entropy of the VALUE distribution per key:
    ``(key, n_points, n_bins_occupied, value_entropy)`` with the
    entropy normalized to [0, 1] by ``ln(n_bins)``.

    The distribution-shape complement of permutation entropy
    (operators/ordinal.py): that one scores temporal structure and is
    blind to the histogram; this scores the histogram and is blind to
    order.  A healthy sensor usually sits mid-range on both; a stuck
    one collapses value_entropy toward 0 (one occupied bin) while a
    uniform-noise fault pushes it toward 1.

    Engine shape: the clamped integer :func:`bin_index` (exact, no
    float boundary ambiguity beyond the shared IEEE division), one
    hash aggregate per (key, bin), one per key using the
    ``H = ln n - sum(c ln c)/n`` plug-in form — zero Python, bin
    cardinality capped at ``n_bins`` per key so the second aggregate
    is metadata-scale.
    """
    import math

    idx = bin_index(F.col(value_col), lo, hi, n_bins)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).cast("string").alias("key"),
            idx.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy("key").agg(
        F.sum("c").alias("n_points"),
        F.count(F.lit(1)).alias("n_bins_occupied"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
    )
    h = (
        F.log(F.col("n_points")) - F.col("clogc") / F.col("n_points")
    ) / F.lit(math.log(float(n_bins)))
    return (
        agg.filter(F.col("n_points") >= min_points)
        .select(
            "key",
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_bins_occupied").cast("long").alias("n_bins_occupied"),
            h.alias("value_entropy"),
        )
    )
