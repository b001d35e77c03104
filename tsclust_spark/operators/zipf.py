"""Per-slice Zipf power-law fit over the token vocabulary.

Corpus health diagnostic: natural language follows ln(freq) ≈
a + s·ln(rank) with s near -1; machine-generated or template-heavy
slices bend the curve (|s| far from 1, or a poor fit).  Tracking the
fitted slope per source is a cheap per-slice drift/quality gate that
complements the distributional PSI gates (operators/drift.py).

The fit is ordinary least squares of ln(freq) on ln(rank), where rank
is frequency-descending with a deterministic token tiebreak (ties must
rank identically on every engine or the fit is engine-dependent).

Plan shape: one Exchange on (slice, token) for the frequency table —
vocabulary-sized, not corpus-sized — then a per-slice window for the
rank and a hash aggregate of the five OLS moment sums.  Nothing after
the first aggregate scales with corpus size, so the job is scan-bound
at 100 TB like every other vocabulary statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def zipf_slope(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """OLS Zipf slope per slice.

    Output: ``(slice, n_vocab, n_tokens, zipf_slope)``; slope is NULL
    for degenerate slices (all-equal ranks can't happen for n_vocab >=
    2, but a 1-term vocabulary yields zero x-variance).
    """
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    toks = df.select(F.col(slice_col).alias("slice"), words.alias("_w")).select(
        "slice", F.explode("_w").alias("token")
    )
    freq = (
        toks.groupBy("slice", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w = Window.partitionBy("slice").orderBy(F.desc("cnt"), F.col("token"))
    pts = freq.select(
        "slice",
        "cnt",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    agg = pts.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("cnt").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_vocab").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom > 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    return agg.select("slice", "n_vocab", "n_tokens", slope.alias("zipf_slope"))
