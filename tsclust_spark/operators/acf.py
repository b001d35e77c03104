"""Per-series autocorrelation (ACF) at fixed lags.

The classic first look at any time series — "does the signal remember
itself k steps back?" — and the feature a rollup engine feeds into
seasonality detection and retention-tier choice (a series with no
autocorrelation past 1m does not need a raw tier).

Definition used: sample Pearson correlation between the series and its
k-lagged self over the rows where the lag exists, with the lag taken in
the (ts, tiebreak) total order.  This is the pandas
``Series.autocorr(k)`` definition, chosen over the "population ACF with
global mean" variant because it is exactly expressible in BOTH engines
(window lag + covar/stddev aggregates), which makes the driver gate a
true value-level twin.

Scale shape: ONE hash Exchange on the key (the window's), an
in-partition sort, and a final aggregate that reuses the window's
partitioning — no second shuffle, no UDF, all whole-stage codegen.
ANSI-safe: zero-variance windows yield NULL via nullif, never a
DIVIDE_BY_ZERO (the engine's corr/divide convention, session.py).

Reference parity: imartinezl/tsclust computes pairwise distance
matrices over series (example.py); ACF is the matching single-series
diagnostic on the engine's point model. Public-literature semantics
(Box & Jenkins sample autocorrelation, pandas autocorr).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def acf(
    points_df: DataFrame,
    lags: Sequence[int] = (1, 2, 3),
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``(key, n_<k>, acf_<k> ...)`` — one row per series, one column
    pair per lag.

    ``n_<k>`` counts the (v_t, v_{t-k}) pairs; ``acf_<k>`` is NULL when
    either side of the pair set has zero variance or fewer than two
    pairs exist (sample moments undefined), identically in the DuckDB
    twin.  Pass ``tiebreak_col`` (unique per (key, ts)) whenever
    duplicate timestamps are possible — the recurrence order must be a
    total order or the lag pairing is shuffle-dependent.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    df = points_df
    for k in lags:
        df = df.withColumn(f"_lag{k}", F.lag(value_col, k).over(w))
    aggs = []
    for k in lags:
        lagged = F.col(f"_lag{k}")
        # restrict BOTH sides' moments to the rows where the pair
        # exists: when() nulls drop out of covar/stddev identically
        paired_v = F.when(lagged.isNotNull(), F.col(value_col))
        aggs.append(F.count(lagged).alias(f"n_{k}"))
        aggs.append(
            (
                F.covar_samp(paired_v, lagged)
                / F.nullif(
                    F.stddev_samp(paired_v) * F.stddev_samp(lagged),
                    F.lit(0.0),
                )
            ).alias(f"acf_{k}")
        )
    return df.groupBy(key_col).agg(*aggs)


def dominant_lag(
    points_df: DataFrame,
    lags: Sequence[int] = (1, 2, 3, 4, 6, 12, 24),
    min_acf: float = 0.2,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    rank_decimals: int = 6,
) -> DataFrame:
    """Seasonality auto-detection: ``(key, lag, acf_value)`` — the
    candidate lag with the LARGEST autocorrelation per key, when it
    clears ``min_acf`` (keys with no lag above the floor emit no row:
    "no detectable period" is an answer, not a row of noise).

    The missing decision layer over :func:`acf`: downstreams
    (decompose period, Holt-Winters m, seasonal-naive horizon) need
    ONE lag, not a table of correlations.  Candidate lags are
    physically motivated (hour/day multiples), the spectral-power
    discipline.

    Determinism: quantize-before-rank on the acf value, ties to the
    SMALLEST lag (the most parsimonious period), the tfidf.py rule.
    Engine shape: the acf plan plus one inline(struct) projection and
    a top-1 window over keys x |lags| rows — metadata scale.
    """
    wide = acf(
        points_df,
        lags=lags,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak_col=tiebreak_col,
    )
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(int(k)).alias("lag"),
                    F.col(f"acf_{k}").alias("acf_value"),
                )
                for k in lags
            ]
        )
    )
    long = wide.select(F.col(key_col).alias("key"), rows).filter(
        F.col("acf_value").isNotNull()
        & (F.col("acf_value") >= min_acf)
    )
    pick = Window.partitionBy("key").orderBy(
        F.round(F.col("acf_value"), rank_decimals).desc(),
        F.col("lag").asc(),
    )
    return (
        long.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select("key", "lag", "acf_value")
    )
