"""Single-bin DFT (Goertzel-style) spectral power at candidate periods.

Answers "does this series actually have the cycle we think it has, and
how strong is it?" without an FFT: for each candidate period P the
fraction of the series' variance explained by the frequency 1/P is

    power_frac(P) = 2 * (C^2 + S^2) / (m * SS)

    C  = sum_t (v_t - mean) * cos(2*pi*h_t / P)
    S  = sum_t (v_t - mean) * sin(2*pi*h_t / P)
    SS = sum_t (v_t - mean)^2

over the hourly tier, where ``h_t`` is the bucket's absolute hour
index (epoch hours, so phase is consistent across keys and gaps cost
nothing — missing buckets simply contribute no term).  This is the
classical Schuster periodogram ordinate for an evenly-spaced grid
with gaps; the factor 2 folds in the mirrored negative-frequency bin
so a pure sinusoid of period P scores exactly 1.0.  It needs no FFT
library, no uniform grid, and no per-key length: a handful of
aggregates per (key, period).

A full FFT over every series would demand gap-filled, per-key-length
power-of-two buffers in Python; telemetry QC only ever checks a
handful of physically-motivated periods (day, week), and for k
candidate periods this form is k fused column expressions inside ONE
hash aggregate — zero Python, one point-scale Exchange, whole-stage
codegen, arbitrarily many keys in parallel.

Determinism: both engines evaluate cos/sin via their libm (<= 1 ulp);
terms are O(sd), sums over m buckets, so cross-engine drift is ~1e-13
relative — far below the 6-dp gate rounding.  The mean is subtracted
(the DC bin would otherwise swamp every ordinate), computed per key
inside the same aggregate via the sum/count moments, so no second
scan of the tier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spectral_power(
    df: DataFrame,
    periods_hours: tuple[int, ...] = (24, 168),
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    min_buckets: int = 8,
) -> DataFrame:
    """``(key, period_hours, n_buckets, power_frac)`` — one row per
    key per candidate period.

    ``power_frac`` is ~[0, 1]: the share of tier variance at that
    frequency (1.0 = a pure sinusoid of period P; incoherent noise
    scores O(1/m)).  Keys with fewer
    than ``min_buckets`` hourly buckets or zero variance are omitted
    (the ratio is undefined; engines disagree on 0/0).
    """
    from tsclust_spark.operators.tiering import value_tier

    tier = value_tier(
        df, "hour", key_col=key_col, ts_col=ts_col, value_col=value_col
    )

    h = F.unix_timestamp("bucket") / F.lit(3600.0)
    aggs = [
        F.count(F.lit(1)).alias("m"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    ]
    for p in periods_hours:
        ang = F.lit(2.0 * math.pi / p) * h
        aggs.append(F.sum(F.col("v") * F.cos(ang)).alias(f"c_{p}"))
        aggs.append(F.sum(F.col("v") * F.sin(ang)).alias(f"s_{p}"))
        aggs.append(F.sum(F.cos(ang)).alias(f"uc_{p}"))
        aggs.append(F.sum(F.sin(ang)).alias(f"us_{p}"))
    mom = tier.groupBy("key").agg(*aggs)

    # centered sums from raw moments: sum((v-mean)*f) =
    # sum(v*f) - mean*sum(f); SS = svv - sv^2/m.  One expression tree,
    # identical on both engines.
    m = F.col("m")
    mean = F.col("sv") / m
    ss = F.col("svv") - F.col("sv") * F.col("sv") / m

    # one struct per period, inlined from the SINGLE aggregate row —
    # a union of per-period selects would re-run the aggregate per
    # branch; inline(array(...)) keeps it one scan, one Exchange.
    structs = []
    for p in periods_hours:
        c = F.col(f"c_{p}") - mean * F.col(f"uc_{p}")
        s = F.col(f"s_{p}") - mean * F.col(f"us_{p}")
        frac = F.lit(2.0) * (c * c + s * s) / (m * ss)
        structs.append(
            F.struct(
                F.lit(p).cast("int").alias("period_hours"),
                frac.alias("power_frac"),
            )
        )
    return (
        mom.filter((m >= min_buckets) & (ss > 0.0))
        .select(
            "key",
            m.cast("long").alias("n_buckets"),
            F.inline(F.array(*structs)),
        )
        .select("key", "period_hours", "n_buckets", "power_frac")
    )
