"""Per-window least-squares trend slope (rate-of-change estimator).

For each (series, tier bucket), fit ``value ~ a + slope * t`` by
ordinary least squares over the bucket's points — the
irregular-sampling-robust rate estimator (a naive last-minus-first
delta is hostage to the two boundary points; OLS uses every point).
``slope`` is per second.

Implementation notes:
- One partial+final hash aggregate over decomposable moment sums
  (n, Σx, Σy, Σxy, Σx²) — same single-Exchange shape as the tier
  rollups, whole-stage codegen, no UDF.
- ``x`` is seconds SINCE THE BUCKET START, not absolute epoch: epoch
  microseconds are ~1.7e15, so Σx² would hit 1e31 where float64
  cancellation destroys the slope; bucket-relative x is <= 3600.
- The slope is written as the explicit moment formula
  ``(n*Σxy - Σx*Σy) / (n*Σx² - Σx*Σx)`` on BOTH engines (the SQL twin
  spells out the same sums) rather than regr_slope(), whose internal
  algorithm differs between engines.
- Degenerate buckets (single point, or all points at one timestamp)
  have zero x-variance: slope is NULL (guarded, never ANSI
  DIVIDE_BY_ZERO); NULL values are excluded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tsclust_spark.operators.rollup import TIER_TRUNC


def trend_slope(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """OLS slope (units/second) per (key, bucket).

    Output: ``(key, bucket_ts, n, slope)``; slope NULL when the bucket
    has no x-variance.
    """
    trunc = TIER_TRUNC[tier]
    bucket = F.date_trunc(trunc, F.col(ts_col))
    # parquet timestamps may arrive as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP (session tz pinned to UTC, cast is a reinterpretation)
    x = (
        F.expr(f"unix_micros(cast({ts_col} as timestamp))")
        - F.unix_micros(bucket.cast("timestamp"))
    ).cast("double") / F.lit(1e6)
    y = F.col(value_col)
    base = df.filter(y.isNotNull()).select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket_ts"),
        x.alias("_x"),
        y.alias("_y"),
    )
    agg = base.groupBy("key", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom > 0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
    )
    return agg.select("key", "bucket_ts", "n", slope.alias("slope"))


def mann_kendall(
    df: DataFrame,
    tier: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    z_threshold: float = 1.96,
    quantize_digits: int = 6,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per (key, bucket): the
    NON-parametric complement to :func:`trend_slope` — it counts
    concordant minus discordant time-ordered pairs, so a monotone but
    nonlinear drift registers at full strength and a single spike
    cannot fake a trend.

        S     = sum_{i<j} sign(v_j - v_i)
        var_S = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18   (ties-corrected)
        z     = (S -/+ 1) / sqrt(var_S)                    (continuity-corrected)

    ``trend`` is sign(S) where the QUANTIZED |z| clears ``z_threshold``
    (quantize-before-compare keeps boundary flags engine-identical),
    else 0; z is NULL when var_S = 0 (n < 2 or all values tied).

    Implementation: the bucket's time-ordered values ride ONE
    ``collect_list`` aggregate (single Exchange, the tier-rollup
    shape); S and the tie term are exact-integer higher-order
    expressions over that array — O(n^2) pairs per bucket map-side,
    which is the test's intrinsic cost; bound the bucket like every
    collect-based operator (a 1d bucket at 1-minute cadence is 1440
    points = ~1M sign evaluations, vectorized in codegen).
    """
    trunc = TIER_TRUNC[tier] if tier in TIER_TRUNC else tier
    order_key = F.struct(
        F.col(ts_col),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        F.col(value_col),
    )
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.array_sort(F.collect_list(order_key)).alias("_pts"))
    )
    vals = F.transform(F.col("_pts"), lambda p: p[value_col])
    n = F.size(vals)
    one = F.lit(1).cast("long")
    s_stat = F.when(
        n >= 2,
        F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.aggregate(
                F.sequence(i + 1, n),
                F.lit(0).cast("long"),
                lambda a2, j: a2
                + F.signum(
                    F.element_at(vals, j) - F.element_at(vals, i)
                ).cast("long"),
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    tie_sizes = F.transform(
        F.array_distinct(vals),
        lambda d: F.size(F.filter(vals, lambda v: v == d)).cast("long"),
    )
    tie_term = F.aggregate(
        tie_sizes,
        F.lit(0).cast("long"),
        lambda acc, t: acc + t * (t - one) * (F.lit(2).cast("long") * t + F.lit(5).cast("long")),
    )
    nl = n.cast("long")
    var_s = (
        nl * (nl - one) * (F.lit(2).cast("long") * nl + F.lit(5).cast("long"))
        - tie_term
    ).cast("double") / F.lit(18.0)
    base = g.select(
        "key",
        "bucket_ts",
        n.alias("n"),
        s_stat.alias("s_stat"),
        var_s.alias("var_s"),
    )
    z_raw = F.when(
        (F.col("var_s") > 0) & (F.col("s_stat") > 0),
        (F.col("s_stat") - one).cast("double") / F.sqrt("var_s"),
    ).when(
        (F.col("var_s") > 0) & (F.col("s_stat") < 0),
        (F.col("s_stat") + one).cast("double") / F.sqrt("var_s"),
    ).when(
        (F.col("var_s") > 0) & (F.col("s_stat") == 0), F.lit(0.0)
    )
    sc = float(10**quantize_digits)
    z = (
        F.signum(z_raw)
        * F.floor(F.abs(z_raw) * sc + F.lit(0.5))
        / F.lit(sc)
    )
    return base.select(
        "key",
        "bucket_ts",
        "n",
        "s_stat",
        z.alias("z"),
        F.when(
            F.abs(z) > F.lit(z_threshold), F.signum("s_stat").cast("int")
        ).otherwise(F.lit(0)).alias("trend"),
    )
