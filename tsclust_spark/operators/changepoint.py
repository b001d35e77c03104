"""Offline change-point localization (AMOC) per series.

Complements the sequential detector (operators/cusum.py): CUSUM answers
"has the mean shifted, flag it as points stream past"; AMOC ("at most
one change", Hinkley 1970 / the standard first step of binary
segmentation) answers "WHERE did it shift" — scan every split point
tau of the ordered series and keep the one maximizing the normalized
between-segment contrast

    stat(tau) = sqrt(tau * (m - tau) / m) * |mean(x[1..tau]) - mean(x[tau+1..m])|

which is the likelihood-ratio statistic for a single mean change under
a fixed-variance Gaussian model (up to the sigma scale, which is
constant per key and cannot move the argmax).

Engine shape: the O(m) scan is two cumulative sums, so the WHOLE
operator is Catalyst window functions over the calendar-bounded daily
tier — zero Python, one hash Exchange on the key for the tier
aggregate, one sort for the windows.  The tier collapse means raw
volume never reaches the window: m is #days in range regardless of
data scale (the theilsen.py / backtest.py discipline).

Cross-engine determinism: the argmax is taken over the statistic
ROUNDED to ``rank_decimals`` (quantize-before-rank, the tfidf.py
rule), tie-broken by earliest bucket, so Spark and a SQL oracle pick
the same split even when the unrounded float64 sums differ in the
last ulp.  The partition total is read off the running sum at i = m
(never a separately-ordered aggregate), so both engines sum in the
identical order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def changepoint_amoc(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    rank_decimals: int = 6,
) -> DataFrame:
    """``(key, n_buckets, cp_bucket, mean_before, mean_after,
    cp_stat)`` — the best single mean-change split per key.

    ``cp_bucket`` is the LAST bucket of the left segment (the change
    happens after it).  Keys with fewer than two buckets are omitted
    (no split exists).  ``mean_before``/``mean_after``/``cp_stat``
    are unrounded doubles; round at the call site for gating.
    """
    from tsclust_spark.operators.tiering import value_tier

    tier = value_tier(
        df, "day", key_col=key_col, ts_col=ts_col, value_col=value_col
    )

    w = Window.partitionBy("key").orderBy("bucket")
    wall = Window.partitionBy("key")
    scan = tier.select(
        "key",
        "bucket",
        F.row_number().over(w).alias("i"),
        F.sum("v").over(w).alias("cum"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).withColumn(
        # the total is the running sum at i = m: identical summation
        # order on every engine, unlike a partition-hash aggregate
        "tot",
        F.max(F.when(F.col("i") == F.col("m"), F.col("cum"))).over(wall),
    )

    cand = (
        scan.filter(F.col("i") < F.col("m"))
        .withColumn("mean_before", F.col("cum") / F.col("i"))
        .withColumn(
            "mean_after",
            (F.col("tot") - F.col("cum")) / (F.col("m") - F.col("i")),
        )
        .withColumn(
            "cp_stat",
            F.sqrt(
                F.col("i") * (F.col("m") - F.col("i")) / F.col("m")
            )
            * F.abs(F.col("mean_before") - F.col("mean_after")),
        )
    )

    pick = Window.partitionBy("key").orderBy(
        F.round(F.col("cp_stat"), rank_decimals).desc(),
        F.col("bucket").asc(),
    )
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            F.col("m").alias("n_buckets"),
            F.col("bucket").alias("cp_bucket"),
            "mean_before",
            "mean_after",
            "cp_stat",
        )
    )


def _seg_tier(df, key_col, ts_col, value_col):
    """Daily tier with the root segment label — the shared input of
    changepoint_binseg and piecewise_trend."""
    from tsclust_spark.operators.tiering import value_tier

    return value_tier(
        df, "day", key_col=key_col, ts_col=ts_col, value_col=value_col
    ).withColumn("seg", F.lit(""))


def _binseg_labels(
    tier: DataFrame,
    depth: int,
    min_seg: int,
    rank_decimals: int,
    keep_unsplit: bool,
) -> tuple[DataFrame, list[DataFrame]]:
    """Run ``depth`` binseg levels over a ('' -seeded) segmented tier.

    Returns ``(relabeled tier, per-level accepted splits)``.  With
    ``keep_unsplit=False`` (changepoint_binseg) the relabel join is
    inner — rows whose segment had no accepted split drop out, which
    is fine because only the split lists are consumed.  With
    ``keep_unsplit=True`` (piecewise_trend) it is a LEFT join and
    unsplit segments keep their label, so every tier row survives to
    the final segmentation.  One shared implementation so the
    split-acceptance and relabel rules cannot diverge between the two
    operators.
    """
    levels = []
    for _ in range(depth):
        best = _amoc_best_per_segment(tier, rank_decimals, min_seg)
        levels.append(best)
        sel = best.select("key", "seg", F.col("cp_bucket").alias("_cp"))
        tier = (
            tier.join(
                F.broadcast(sel),
                ["key", "seg"],
                "left" if keep_unsplit else "inner",
            )
            .withColumn(
                "seg",
                F.when(F.col("_cp").isNull(), F.col("seg")).otherwise(
                    F.concat(
                        F.col("seg"),
                        F.when(
                            F.col("bucket") <= F.col("_cp"), F.lit("L")
                        ).otherwise(F.lit("R")),
                    )
                ),
            )
            .drop("_cp")
        )
    return tier, levels


def _amoc_best_per_segment(
    tier: DataFrame, rank_decimals: int, min_seg: int
) -> DataFrame:
    """Best split per (key, seg) over a segmented tier — the AMOC scan
    of :func:`changepoint_amoc` with the segment label carried through
    the windows. Splits leaving either side shorter than ``min_seg``
    buckets are not candidates."""
    w = Window.partitionBy("key", "seg").orderBy("bucket")
    wall = Window.partitionBy("key", "seg")
    scan = tier.select(
        "key",
        "seg",
        "bucket",
        F.row_number().over(w).alias("i"),
        F.sum("v").over(w).alias("cum"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).withColumn(
        "tot",
        F.max(F.when(F.col("i") == F.col("m"), F.col("cum"))).over(wall),
    )
    cand = (
        scan.filter(
            (F.col("i") >= min_seg)
            & (F.col("m") - F.col("i") >= min_seg)
        )
        .withColumn("mean_before", F.col("cum") / F.col("i"))
        .withColumn(
            "mean_after",
            (F.col("tot") - F.col("cum")) / (F.col("m") - F.col("i")),
        )
        .withColumn(
            "cp_stat",
            F.sqrt(F.col("i") * (F.col("m") - F.col("i")) / F.col("m"))
            * F.abs(F.col("mean_before") - F.col("mean_after")),
        )
    )
    pick = Window.partitionBy("key", "seg").orderBy(
        F.round(F.col("cp_stat"), rank_decimals).desc(),
        F.col("bucket").asc(),
    )
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            "seg",
            F.col("m").alias("n_buckets"),
            F.col("bucket").alias("cp_bucket"),
            "mean_before",
            "mean_after",
            "cp_stat",
        )
    )


def changepoint_binseg(
    df: DataFrame,
    depth: int = 2,
    min_seg: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    rank_decimals: int = 6,
) -> DataFrame:
    """Binary segmentation (Scott & Knott 1974; the standard greedy
    multi-change-point extension of AMOC): split each key's daily
    tier at its best AMOC point, then recursively split each child
    segment, ``depth`` levels deep — up to 2^depth - 1 change points
    per key.

    Output: ``(key, segment, n_buckets, cp_bucket, mean_before,
    mean_after, cp_stat)`` — one row per ACCEPTED split, ``segment``
    the path label of the segment being split ('' = whole series,
    then 'L'/'R', 'LL'.., by bucket <= the parent split).  A split is
    accepted only if both children keep >= ``min_seg`` buckets; no
    significance threshold is applied (report the statistic, let the
    caller cut — the changepoint_amoc discipline).

    Engine shape: the level loop is PLAN construction, not execution
    — each level adds one windowed scan over the (key, seg)-relabeled
    tier and one broadcast-scale join of the parent splits (one row
    per accepted parent segment).  Each level's windows shuffle tier
    rows, never raw points; depth is a small constant, so the whole
    operator is O(depth) tier-scale stages, zero Python.

    Determinism: the argmax quantizes before ranking (ties to the
    earliest bucket), so the SPLIT — and therefore every child
    segment label downstream — is engine- and partitioning-exact.
    """
    tier = _seg_tier(df, key_col, ts_col, value_col)
    _, levels = _binseg_labels(
        tier, depth, min_seg, rank_decimals, keep_unsplit=False
    )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "key",
        F.col("seg").alias("segment"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        "cp_bucket",
        "mean_before",
        "mean_after",
        "cp_stat",
    )


def piecewise_trend(
    df: DataFrame,
    depth: int = 2,
    min_seg: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    rank_decimals: int = 6,
) -> DataFrame:
    """Segmented (piecewise-linear) trend: OLS slope/intercept per
    FINAL segment of the binary segmentation — ``(key, segment,
    seg_start, seg_end, n_buckets, slope_per_day, intercept,
    mean_v)``.

    The composition a change-point user actually wants: binseg says
    WHERE the regimes break, this says what each regime IS (its level
    and drift).  ``slope_per_day`` regresses the daily-tier value on
    the bucket's day index; ``intercept`` is the fitted value at the
    segment's first day (not at epoch — epoch intercepts are
    numerically meaningless 50 years out); keys/segments where the
    slope is unidentified (single day) are omitted.

    Engine shape: the binseg labeling (O(depth) tier-scale stages)
    plus ONE five-moment hash aggregate per final segment and the
    sums-of-products slope algebra (the ar1.py discipline) —
    projected driver-free, zero Python.
    """
    tier = _seg_tier(df, key_col, ts_col, value_col)
    # same accepted splits as changepoint_binseg; keep_unsplit keeps
    # segments without a split so they simply stop subdividing
    tier, _ = _binseg_labels(
        tier, depth, min_seg, rank_decimals, keep_unsplit=True
    )
    d_idx = F.datediff(
        F.col("bucket"), F.lit("1970-01-01").cast("date")
    ).cast("double")
    mom = (
        tier.withColumn("x", d_idx)
        .groupBy("key", "seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("bucket").alias("seg_start"),
            F.max("bucket").alias("seg_end"),
            F.min("x").alias("x0"),
            F.sum("x").alias("sx"),
            F.sum("v").alias("sv"),
            F.sum(F.col("x") * F.col("v")).alias("sxv"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxv") - F.col("sx") * F.col("sv")) / den
    # value at the segment's first day: mean_v + slope*(x0 - mean_x)
    intercept = F.col("sv") / n + slope * (
        F.col("x0") - F.col("sx") / n
    )
    return (
        mom.filter((n >= 2) & (den != 0.0))
        .select(
            "key",
            F.col("seg").alias("segment"),
            "seg_start",
            "seg_end",
            n.cast("long").alias("n_buckets"),
            slope.alias("slope_per_day"),
            intercept.alias("intercept"),
            (F.col("sv") / n).alias("mean_v"),
        )
    )


def regime_anomalies(
    df: DataFrame,
    depth: int = 2,
    min_seg: int = 4,
    z_thresh: float = 3.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    rank_decimals: int = 6,
) -> DataFrame:
    """Anomalies AGAINST THE REGIME, not the global distribution:
    studentized OLS residuals per binseg segment — ``(key, segment,
    bucket, v, fitted, resid_z)`` for tier buckets with
    ``|resid_z| >= z_thresh``.

    A global z-score flags every point of a new regime as anomalous
    forever; detrending against the per-segment line flags only what
    deviates from ITS OWN regime — the step change is absorbed by the
    segmentation, the drift by the slope, and what remains is the
    actual surprise.  The missing composition between the change-point
    family and the z-score family.

    Engine shape: the piecewise fit's stages plus ONE broadcast join
    of the per-segment fit (segment-count rows) back onto the tier
    and a codegen residual projection.  ``resid_z`` uses the
    segment's own OLS residual std (SSE/(n-2)); segments with n < 4
    or zero residual variance produce no anomaly rows (z undefined;
    engines disagree on 0/0).
    """
    tier = _seg_tier(df, key_col, ts_col, value_col)
    tier, _ = _binseg_labels(
        tier, depth, min_seg, rank_decimals, keep_unsplit=True
    )
    d_idx = F.datediff(
        F.col("bucket"), F.lit("1970-01-01").cast("date")
    ).cast("double")
    xv = tier.withColumn("x", d_idx)
    mom = xv.groupBy("key", "seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sv"),
        F.sum(F.col("x") * F.col("v")).alias("sxv"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    n = F.col("n")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxv") - F.col("sx") * F.col("sv")) / den
    # SSE = (svv - sv^2/n) - slope^2 * (sxx - sx^2/n); resid var on
    # n-2 dof — the same moment discipline as piecewise_trend
    sse = (
        F.col("svv")
        - F.col("sv") * F.col("sv") / n
        - slope * slope * (F.col("sxx") - F.col("sx") * F.col("sx") / n)
    )
    fit = (
        mom.filter((n >= 4) & (den != 0.0))
        .select(
            "key",
            "seg",
            n.alias("_n"),
            slope.alias("_slope"),
            (F.col("sv") / n).alias("_mv"),
            (F.col("sx") / n).alias("_mx"),
            F.sqrt(
                F.greatest(F.lit(0.0), sse / (n - 2))
            ).alias("_rstd"),
        )
        .filter(F.col("_rstd") > 0.0)
    )
    joined = xv.join(F.broadcast(fit), ["key", "seg"])
    fitted = F.col("_mv") + F.col("_slope") * (F.col("x") - F.col("_mx"))
    z = (F.col("v") - fitted) / F.col("_rstd")
    return (
        joined.withColumn("fitted", fitted)
        .withColumn("resid_z", z)
        .filter(F.abs(F.col("resid_z")) >= z_thresh)
        .select(
            "key",
            F.col("seg").alias("segment"),
            "bucket",
            "v",
            "fitted",
            "resid_z",
        )
    )
