"""Data-integrity screens: per-key self-drift and Benford's law.

Two questions about whether a series can be TRUSTED, complementing
the cross-slice drift gates (operators/drift.py compares slice A vs
slice B; these interrogate one series against itself / against a
universal law):

- :func:`self_drift_ks` — has this key's value DISTRIBUTION changed
  over its own lifetime?  Split each key's history at its midpoint
  instant and take the two-sample Kolmogorov-Smirnov distance between
  the halves.  Catches slow sensor degradation and silent unit
  changes that per-point anomaly gates never flag (every point is
  in-range; the distribution walked away).
- :func:`benford_digits` — do the leading digits follow Benford's
  law (Newcomb 1881 / Benford 1938, public literature: P(d) =
  log10(1 + 1/d))?  Organic multi-scale measurements do; fabricated,
  clipped, or unit-capped data does not — the classic
  forensic/synthetic-data screen, with the chi-square statistic per
  key for ranking.

Both are pure Catalyst expressions — exact integer splits and counts,
ratios the only floats; both partition per key, so they parallelize
like any grouped aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def self_drift_ks(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 0.1,
    quantize_digits: int = 6,
    min_half: int = 8,
) -> DataFrame:
    """``(key, n_a, n_b, ks_d, drifted)`` per key: KS distance between
    the first and second half of the key's own history (split at the
    integer-microsecond midpoint of [min ts, max ts] — engine-exact
    arithmetic, so half membership is identical everywhere).

    Keys with fewer than ``min_half`` points in either half are
    omitted (an empty/thin half makes D meaningless).  The per-key
    cumulative window is value-cardinality-sized — quantize the value
    upstream at full scale, the ks_statistic discipline.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pts = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key"),
        us.alias("_us"),
        F.col(value_col).alias("v"),
    )
    bounds = pts.groupBy("key").agg(
        # integer midpoint: (min + max) // 2 without overflow
        (
            F.min("_us")
            + F.floor((F.max("_us") - F.min("_us")) / F.lit(2))
        ).alias("_mid")
    )
    halved = pts.join(F.broadcast(bounds), "key").withColumn(
        "_in_a", F.col("_us") <= F.col("_mid")
    )
    counts = halved.groupBy("key", "v").agg(
        F.sum(F.col("_in_a").cast("long")).alias("ca"),
        F.sum((~F.col("_in_a")).cast("long")).alias("cb"),
    )
    w = Window.partitionBy("key").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy("key")
    cum = counts.select(
        "key",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(w_tot).alias("n_a"),
        F.sum("cb").over(w_tot).alias("n_b"),
    )
    s = float(10**quantize_digits)
    d_raw = F.max(
        F.abs(
            F.col("cum_a").cast("double") / F.col("n_a").cast("double")
            - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
        )
    )
    d = F.floor(d_raw * F.lit(s) + F.lit(0.5)) / F.lit(s)
    return (
        cum.groupBy("key")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            d.alias("ks_d"),
        )
        .filter((F.col("n_a") >= min_half) & (F.col("n_b") >= min_half))
        .withColumn("drifted", F.col("ks_d") > F.lit(threshold))
    )


BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_digits(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    min_points: int = 30,
) -> DataFrame:
    """``(key, n_points, chi2)`` per key plus per-digit detail
    columns ``share_1..share_9``: the leading-digit distribution of
    positive values against Benford's law.

    ``chi2 = sum_d (n_d - n*p_d)^2 / (n*p_d)`` — large values mean
    the digits do NOT follow the law (8 dof; ~15.5 is the 5% line).
    A uniform-on-[a,b) synthetic column or a unit-capped sensor
    jumps out immediately.  Keys with fewer than ``min_points``
    positive values are omitted (the statistic needs mass).

    Leading digit: ``floor(v / 10^floor(log10(v)) + 1e-9)``, clamped
    to [1, 9].  The epsilon corrects binary-decimal mismatch for
    sub-1 values (10^-1 is not exactly 0.1, so 0.3/0.1 evaluates to
    2.999...96 — digit 2 without the nudge); 1e-9 sits ~7 orders
    above the division's ~1e-16 relative noise and far below any
    data's decimal resolution.  Both engines evaluate the identical
    double tree, so assignment matches everywhere including
    power-of-ten boundaries.
    """
    v = F.col(value_col)
    digit = F.least(
        F.greatest(
            F.floor(
                v / F.pow(F.lit(10.0), F.floor(F.log10(v)))
                + F.lit(1e-9)
            ).cast("int"),
            F.lit(1),
        ),
        F.lit(9),
    )
    binned = (
        df.filter(v.isNotNull() & (v > 0))
        .select(
            F.col(key_col).cast("string").alias("key"),
            digit.alias("d"),
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for d in range(1, 10):
        aggs.append(
            F.sum((F.col("d") == d).cast("long")).alias(f"n_{d}")
        )
    per = binned.groupBy("key").agg(*aggs)
    n = F.col("n_points")
    chi2 = None
    shares = []
    for d in range(1, 10):
        p = F.lit(BENFORD_P[d - 1])
        exp = n * p
        term = (F.col(f"n_{d}") - exp) * (F.col(f"n_{d}") - exp) / exp
        chi2 = term if chi2 is None else chi2 + term
        shares.append((F.col(f"n_{d}") / n).alias(f"share_{d}"))
    return (
        per.filter(n >= min_points)
        .select(
            "key",
            n.cast("long").alias("n_points"),
            chi2.alias("chi2"),
            *shares,
        )
    )
