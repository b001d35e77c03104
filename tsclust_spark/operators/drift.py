"""Distribution drift between two data slices: fixed-bin PSI.

Population Stability Index is the standard snapshot-vs-snapshot drift
check in training-data pipelines (did this week's corpus shift against
last week's?): bin both slices on the SAME fixed edges, then
``PSI = sum_i (p_i - q_i) * ln(p_i / q_i)`` with epsilon-smoothed
proportions.  Rule of thumb: < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action.

Plan shape: one partial+final hash aggregate per slice over the binned
column (two Exchanges total, each carrying n_bins rows per partial),
then a bin-aligned join of two n_bins-row tables — metadata-scale.
Binning is the closed form ``clamp(floor((v - lo) / width))`` computed
identically on any engine, so bin membership is deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_expr(value_col: str, lo: float, hi: float, n_bins: int):
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")


def _bin_counts(df: DataFrame, value_col, lo, hi, n_bins, name):
    # NULL values are excluded EXPLICITLY so the slice totals (computed
    # as the sum of binned counts) are defined identically to any SQL
    # twin counting non-NULL values — without the filter a NULL row
    # silently fell out of the bin join but could be counted by a
    # count(*)-style total on another engine (ADVICE r3).
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(_bin_expr(value_col, lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(name))
    )


def population_stability(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bin PSI contributions between slice a (reference) and slice b
    (current).

    Output: ``(bin, n_a, n_b, p_a, p_b, psi_bin)`` for ALL n_bins bins
    (empty bins appear with zero counts — the epsilon keeps their
    contribution finite and the bin list engine-independent).  Total
    PSI = ``sum(psi_bin)``.
    """
    spark = df_a.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    a = _bin_counts(df_a, value_col, lo, hi, n_bins, "n_a")
    b = _bin_counts(df_b, value_col, lo, hi, n_bins, "n_b")
    j = (
        bins.join(F.broadcast(a), on="bin", how="left")
        .join(F.broadcast(b), on="bin", how="left")
        .fillna(0, subset=["n_a", "n_b"])
    )
    tot = j.select(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    ).collect()[0]
    ta, tb = max(int(tot["ta"]), 1), max(int(tot["tb"]), 1)
    p_a = F.col("n_a").cast("double") / F.lit(float(ta)) + F.lit(eps)
    p_b = F.col("n_b").cast("double") / F.lit(float(tb)) + F.lit(eps)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        ((p_a - p_b) * (F.log(p_a) - F.log(p_b))).alias("psi_bin"),
    )


def categorical_psi(
    df: DataFrame,
    a_value: str,
    b_value: str,
    split_col: str = "source",
    token_arr_col: str = "_words",
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over a token VOCABULARY between two corpus slices — the
    categorical sibling of :func:`population_stability` (which bins a
    numeric column): "did source B's word distribution drift from
    source A's?", the standard gate before mixing a new crawl into a
    training corpus.

    ``df`` carries a pre-tokenized array column (``token_arr_col``) and
    the slice label. Both slices' per-token counts pivot out of ONE
    scan + ONE vocabulary-sized hash aggregate
    (``sum(when(split == a, 1))`` — the ccf_pivot recipe, so the corpus
    is never read twice); totals are two driver-side scalars. Tokens
    absent from one slice get the epsilon floor, exactly like empty
    bins in the numeric PSI.

    Output: ``(token, n_a, n_b, p_a, p_b, psi_token)`` over the union
    vocabulary; total PSI = ``sum(psi_token)``.
    """
    sp = F.col(split_col)
    toks = df.filter(sp.isin(a_value, b_value)).select(
        sp.alias("_split"), F.explode(token_arr_col).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("_split") == a_value, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_split") == b_value, 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.select(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")).first()
    ta, tb = max(int(tot["ta"]), 1), max(int(tot["tb"]), 1)
    p_a = F.col("n_a").cast("double") / F.lit(float(ta)) + F.lit(eps)
    p_b = F.col("n_b").cast("double") / F.lit(float(tb)) + F.lit(eps)
    return counts.select(
        "token",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        ((p_a - p_b) * (F.log(p_a) - F.log(p_b))).alias("psi_token"),
    )


def ks_statistic(
    df: DataFrame,
    slice_col: str,
    slice_a: str,
    slice_b: str,
    value_col: str = "value",
    threshold: float = 0.1,
    quantize_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between two slices:
    ``D = max_v |CDF_a(v) - CDF_b(v)|`` — the distribution-free
    complement to fixed-bin PSI (PSI can miss drift that stays inside
    the bin edges; KS is binning-free).

    One scan pivots both slices' per-value counts (the categorical_psi
    recipe — a value-cardinality Exchange), then a single ordered
    cumulative window turns counts into empirical CDFs and a max
    aggregate takes D.  The cumulative window is unpartitioned, so its
    input must be value-CARDINALITY-sized: for continuous doubles at
    full scale, quantize the value upstream (or reuse the PSI bin
    edges) to bound distinct values — the binning-free exactness is
    then "exact at the chosen resolution", which is the honest
    trade at 10^12 rows.

    Output: one row ``(n_a, n_b, ks_d, drifted)``; ``ks_d`` is
    quantized before the threshold comparison.
    """
    pts = df.filter(
        F.col(slice_col).isin([slice_a, slice_b])
        & F.col(value_col).isNotNull()
    )
    counts = pts.groupBy(F.col(value_col).alias("v")).agg(
        F.sum((F.col(slice_col) == slice_a).cast("long")).alias("ca"),
        F.sum((F.col(slice_col) == slice_b).cast("long")).alias("cb"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy(F.lit(1))
    cum = counts.select(
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
        cum.agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            d.alias("ks_d"),
        )
        .withColumn("drifted", F.col("ks_d") > F.lit(threshold))
    )


def embedding_centroid_drift(
    df: DataFrame,
    slice_col: str,
    slice_a,
    slice_b,
    vec_col: str = "embedding",
    threshold: float = 0.05,
    quantize_digits: int = 6,
) -> DataFrame:
    """Embedding-modality drift: cosine distance between two slices'
    centroid vectors — did the new crawl's semantic center move?
    Completes the drift family across modalities (numeric PSI,
    vocabulary PSI, KS, Zipf -> embeddings).

    Plan shape: ONE posexplode + hash aggregate produces per-(slice,
    dim) means (dims x 2 rows — metadata-scale regardless of corpus
    size); the cosine is a dim-keyed join of two tiny tables plus one
    final aggregate.  No vector ever rides a shuffle whole.

    Output: one row ``(n_a, n_b, cosine_sim, cosine_dist, drifted)``;
    distance quantized before the threshold flag; degenerate zero-norm
    centroids yield NULL similarity and flag false.
    """
    pts = df.filter(
        F.col(slice_col).isin([slice_a, slice_b]) & F.col(vec_col).isNotNull()
    ).select(
        (F.col(slice_col) == slice_a).alias("is_a"),
        F.posexplode(vec_col).alias("dim", "x"),
    )
    means = pts.groupBy("dim").agg(
        F.avg(F.when(F.col("is_a"), F.col("x"))).alias("ma"),
        F.avg(F.when(~F.col("is_a"), F.col("x"))).alias("mb"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cb"),
    )
    s = float(10**quantize_digits)
    agg = means.agg(
        (F.max("ca")).alias("n_a"),
        (F.max("cb")).alias("n_b"),
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("na"),
        F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("nb"),
    )
    sim = F.col("dot") / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    dist = F.floor((F.lit(1.0) - sim) * F.lit(s) + F.lit(0.5)) / F.lit(s)
    return agg.select(
        "n_a",
        "n_b",
        sim.alias("cosine_sim"),
        dist.alias("cosine_dist"),
        F.coalesce(dist > F.lit(threshold), F.lit(False)).alias("drifted"),
    )
