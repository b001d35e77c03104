"""AR(1) / Ornstein–Uhlenbeck parameter fit per series.

Fits the first-order autoregression  x_t = c + phi * x_{t-1} + eps_t
on each key's daily tier by conditional least squares — the closed
form over lag pairs:

    phi = cov(x_t, x_{t-1}) / var(x_{t-1})        (over adjacent pairs)
    c   = mean(x_t) - phi * mean(x_{t-1})

``phi`` is the one-step memory of the series (0 = white noise, ->1 =
random-walk-like persistence; its sign flags oscillation), the
single most-used summary after mean/trend for characterizing tier
telemetry, and the discrete-time twin of the OU mean-reversion rate
(theta = -ln(phi) per day).  Differs from operators/acf.py: ACF
reports the raw lag-k autocorrelations; this fits the generative
model (regression slope, intercept, innovation variance) — slope and
lag-1 autocorrelation coincide only when the pair means/variances are
stationary.

Engine shape: one hash aggregate collapses raw points to the daily
tier, one ``lag`` window forms adjacent pairs, one aggregate computes
the five pair moments.  All Catalyst expressions, zero Python; only
CONSECUTIVE calendar days pair up (a gap breaks the lag-1 relation,
so pairs spanning gaps are excluded on both engines by the datediff
guard).

Determinism: moments are computed as explicit sums-of-products
ratios (``sum(xy)/n - mean*mean`` form avoided: we use the
centered-by-sums algebra below which both engines evaluate in the
same float64 expression tree); the only engine-ordered reduction is
``sum`` over the pair set, whose order differences land far below
the 6-dp gate rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ar1_fit(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``(key, n_pairs, phi, intercept, resid_var)`` per key.

    ``resid_var`` is the mean squared residual of the fitted
    regression over the pairs (the innovation-variance estimate).
    Keys with fewer than two adjacent-day pairs are omitted: one pair
    fits phi exactly with zero residual but an undefined variance
    denominator is avoided by requiring n_pairs >= 2.
    """
    from tsclust_spark.operators.tiering import value_tier

    tier = value_tier(
        df, "day", key_col=key_col, ts_col=ts_col, value_col=value_col
    )

    w = Window.partitionBy("key").orderBy("bucket")
    pairs = (
        tier.withColumn("prev_v", F.lag("v").over(w))
        .withColumn("prev_bucket", F.lag("bucket").over(w))
        .filter(
            F.col("prev_v").isNotNull()
            & (F.datediff(F.col("bucket"), F.col("prev_bucket")) == 1)
        )
        .select("key", F.col("v").alias("y"), F.col("prev_v").alias("x"))
    )

    mom = pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    n = F.col("n_pairs")
    # phi = (n*sxy - sx*sy) / (n*sxx - sx^2): the standard
    # sums-of-products slope, one expression tree on both engines
    phi = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - phi * F.col("sx")) / n
    # mean squared residual via the same moment algebra:
    # sum((y - c - phi x)^2)/n expanded in moments
    resid_var = (
        F.col("syy")
        + n * intercept * intercept
        + phi * phi * F.col("sxx")
        - 2.0 * intercept * F.col("sy")
        - 2.0 * phi * F.col("sxy")
        + 2.0 * intercept * phi * F.col("sx")
    ) / n

    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        # den == 0 iff the lagged series is exactly constant: no slope
        # is identified, and engines disagree on double-div-by-zero
        # (NULL vs inf), so such keys are omitted on BOTH sides
        mom.filter((n >= 2) & (den != 0.0))
        .select(
            "key",
            "n_pairs",
            phi.alias("phi"),
            intercept.alias("intercept"),
            resid_var.alias("resid_var"),
        )
    )
