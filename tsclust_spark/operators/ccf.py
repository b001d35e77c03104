"""Cross-correlation (CCF) between two bucketed series at fixed lags.

For each key, bucket series A and series B to a tier grid (hourly
means), then correlate pairs ``(A[t], B[t + lag])`` for each requested
lag — "do purchases follow views an hour later?". The lagged sibling
of :mod:`operators/acf` (one series vs itself) and
``series_corr_pairs`` (two series, lag 0).

Scale notes: points aggregate to tier rows first (one partial+final
hash aggregate — the only full-data shuffle), so the lag join moves
tier rows, 1/60-1/3600th of the input; lags expand map-side via
``explode`` on the A side before ONE equi-join on (key, bucket).

Determinism: correlation is computed from explicit moment sums
(n, Σa, Σb, Σab, Σa², Σb²) — NOT engine ``corr()``, whose internal
algorithm differs between engines — with both variance terms guarded
> 0 (constant series yield NULL, never ANSI errors or NaN). NULL
values are excluded before bucketing on both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from tsclust_spark.operators.rollup import TIER_TRUNC


def _bucketed_mean(df, key_col, ts_col, value_col, trunc, name):
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.avg(value_col).alias(name))
    )


def ccf(
    df_a: DataFrame,
    df_b: DataFrame,
    lags: Sequence[int] = (0, 1, 2),
    tier: str = "1h",
    min_pairs: int = 3,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, lag) Pearson correlation of bucket-mean pairs
    ``(A[t], B[t + lag])``; lag is in tier buckets.

    Output: ``(key, lag, n_pairs, ccf)``; ccf NULL when either side is
    constant over the paired buckets. Keys/lags with fewer than
    ``min_pairs`` overlapping buckets emit no row.
    """
    trunc = TIER_TRUNC[tier]
    seconds = {"1m": 60, "1h": 3600, "1d": 86400}[tier]
    a = _bucketed_mean(df_a, key_col, ts_col, value_col, trunc, "a")
    b = _bucketed_mean(df_b, key_col, ts_col, value_col, trunc, "b")
    return _ccf_from_bucketed(a, b, lags, seconds, min_pairs)


def ccf_pivot(
    df: DataFrame,
    a_value: str,
    b_value: str,
    split_col: str = "event_type",
    lags: Sequence[int] = (0, 1, 2),
    tier: str = "1h",
    min_pairs: int = 3,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Same-table CCF with ONE scan: when A and B are two slices of the
    same table (e.g. event_type values), :func:`ccf` would scan it
    twice — at 100 TB the scans dominate, so this variant pivots both
    bucket means out of a single scan + single hash aggregate
    (``avg(when(split == a, value))`` ignores the other slice's rows
    exactly like the filtered aggregate does), then runs the identical
    lag join over tier rows."""
    trunc = TIER_TRUNC[tier]
    seconds = {"1m": 60, "1h": 3600, "1d": 86400}[tier]
    sp = F.col(split_col)
    base = (
        df.filter(F.col(value_col).isNotNull() & sp.isin(a_value, b_value))
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.avg(F.when(sp == a_value, F.col(value_col))).alias("a"),
            F.avg(F.when(sp == b_value, F.col(value_col))).alias("b"),
        )
    )
    # materialize the tier-row base ONCE (lazy): without this, Catalyst
    # column-prunes each branch down to its own pivot column and plans
    # TWO point scans — exactly the double-read the pivot exists to
    # avoid. base is tier-sized (keys x buckets), so the checkpoint is
    # cheap next to the point scan it saves.
    base = base.localCheckpoint(eager=False)
    a = base.filter(F.col("a").isNotNull()).select("key", "bucket_ts", "a")
    b = base.filter(F.col("b").isNotNull()).select("key", "bucket_ts", "b")
    return _ccf_from_bucketed(a, b, lags, seconds, min_pairs)


def _ccf_from_bucketed(a, b, lags, seconds, min_pairs):
    # join on integer bucket epochs (timestamp + interval*column is not
    # expressible as a plain binary op; epoch arithmetic is, and the
    # SQL twin mirrors it exactly)
    epoch = lambda c: F.unix_timestamp(F.col(c).cast("timestamp"))  # noqa: E731
    lag_arr = F.array(*[F.lit(int(l)) for l in lags])
    # A at bucket t pairs with B at bucket t + lag
    a_lagged = a.select(
        "key", "a", F.explode(lag_arr).alias("lag"), epoch("bucket_ts").alias("_e")
    ).select(
        "key", "a", "lag",
        (F.col("_e") + F.col("lag").cast("long") * F.lit(seconds)).alias("bucket_epoch"),
    )
    b_e = b.select("key", "b", epoch("bucket_ts").alias("bucket_epoch"))
    pairs = a_lagged.join(b_e, ["key", "bucket_epoch"])
    agg = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("a").alias("_sa"),
        F.sum("b").alias("_sb"),
        F.sum(F.col("a") * F.col("b")).alias("_sab"),
        F.sum(F.col("a") * F.col("a")).alias("_saa"),
        F.sum(F.col("b") * F.col("b")).alias("_sbb"),
    )
    n = F.col("n_pairs").cast("double")
    var_a = n * F.col("_saa") - F.col("_sa") * F.col("_sa")
    var_b = n * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    r = F.when(
        (var_a > 0) & (var_b > 0),
        (n * F.col("_sab") - F.col("_sa") * F.col("_sb"))
        / (F.sqrt(var_a) * F.sqrt(var_b)),
    )
    return (
        agg.filter(F.col("n_pairs") >= min_pairs)
        .select("key", "lag", "n_pairs", r.alias("ccf"))
    )
