"""Symbolic / dimensionality-reducing series transforms: z-normalize,
PAA, SAX (Lin, Keogh, Lonardi & Chiu, "A Symbolic Representation of
Time Series", DMKD 2003).

These are the classic front-end reductions of a time-series-clustering
engine: z-normalize a series, compress it to ``n_segments`` piecewise
aggregate means (PAA), then discretize each mean against equiprobable
N(0,1) breakpoints into an alphabet symbol — turning a numeric series
into a short word that downstream dedup/grouping/DTW-prefilters can
compare with string equality.

Spark shape: everything here is pure JVM expressions — window
aggregates for the per-series moments and one groupBy for the segment
means.  Per series of length n the shuffle carries only ``n_segments``
rows after the PAA aggregation (partial aggregation map-side), and the
SAX mapping is a branch-free comparison sum, so the whole chain is
whole-stage-codegen'd with exactly one Exchange on (series, segment).

Reference parity note: the reference (tsclust, 288 LoC pre-alpha) has
no symbolic layer; this follows the published SAX construction and is
part of the engine mandate's clustering toolkit.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gaussian_breakpoints(alphabet_size: int, digits: int = 7) -> list[float]:
    """Equiprobable N(0,1) breakpoints (alphabet_size - 1 of them),
    rounded to a fixed grid so Spark and any SQL oracle compare PAA
    values against bit-identical literals."""
    if not 2 <= alphabet_size <= 26:
        raise ValueError("alphabet_size must be in [2, 26]")
    nd = NormalDist()
    return [
        round(nd.inv_cdf(i / alphabet_size), digits)
        for i in range(1, alphabet_size)
    ]


def znormalize(
    df: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    value_col: str = "value",
    out_col: str = "zvalue",
) -> DataFrame:
    """Per-series z-normalization: (v - mean) / stddev_pop, with
    constant series mapping to 0 (stddev 0 guarded via nullif).

    One window over the series key — at scale this is the same
    hash-partition the downstream PAA groupBy needs, so AQE coalesces
    the two into one Exchange.
    """
    w = Window.partitionBy(id_col)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn(
        out_col,
        F.coalesce(
            (F.col(value_col) - F.avg(value_col).over(w))
            / F.nullif(std, F.lit(0.0)),
            F.lit(0.0),
        ),
    )


def paa(
    df: DataFrame,
    n_segments: int,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    value_col: str = "value",
) -> DataFrame:
    """Piecewise Aggregate Approximation: mean of each of ``n_segments``
    equal position-ranges per series.

    Segment of a point = floor(rank * n_segments / series_len) where
    rank is the 0-based position index — handles ragged series lengths
    without a fixed-length assumption.  Output one row per (series,
    segment): ``(id, segment int, paa_value double, seg_n bigint)``.
    """
    w = Window.partitionBy(id_col)
    wo = Window.partitionBy(id_col).orderBy(F.col(pos_col).asc())
    ranked = df.withColumn("_rank", F.row_number().over(wo) - F.lit(1)).withColumn(
        "_len", F.count(F.lit(1)).over(w)
    )
    seg = F.floor(F.col("_rank") * n_segments / F.col("_len")).cast("int")
    return (
        ranked.withColumn("segment", seg)
        .groupBy(F.col(id_col), F.col("segment"))
        .agg(
            F.avg(value_col).alias("paa_value"),
            F.count(F.lit(1)).alias("seg_n"),
        )
    )


def sax_symbol_expr(value_col, breakpoints: list[float]):
    """Branch-free SAX symbol index: the count of breakpoints strictly
    below the value — 0..len(breakpoints), monotone in the value."""
    expr = F.lit(0)
    for bp in breakpoints:
        expr = expr + F.when(F.col(value_col) > F.lit(bp), 1).otherwise(0)
    return expr.cast("int")


def sax(
    df: DataFrame,
    n_segments: int,
    alphabet_size: int = 4,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    value_col: str = "value",
    quantize_digits: int = 6,
) -> DataFrame:
    """Full SAX pipeline: z-normalize -> PAA -> symbol per segment.

    ``quantize_digits`` rounds the PAA mean before the breakpoint
    comparison so two engines whose float aggregation order differs map
    borderline values to the same symbol (the engine-wide _sround
    discipline; breakpoints are 7-digit literals off the 1e-6 grid so
    rounded values never tie them exactly).

    Output: ``(id, segment, paa_value double, symbol int)``.
    """
    bps = gaussian_breakpoints(alphabet_size)
    z = znormalize(df, id_col, pos_col, value_col, out_col="_z")
    p = paa(z, n_segments, id_col, pos_col, value_col="_z")
    # floor(x*10^d + 0.5)/10^d — the engine-wide cross-engine-stable
    # rounding (__spark_entry__._sround twin), so a SQL oracle using the
    # same formula maps borderline values to the same symbol
    s = float(10**quantize_digits)
    quant = F.floor(F.col("paa_value") * s + F.lit(0.5)) / F.lit(s)
    return p.select(
        F.col(id_col), F.col("segment"), quant.alias("paa_value")
    ).withColumn("symbol", sax_symbol_expr("paa_value", bps))


def sax_words(
    df: DataFrame,
    n_segments: int,
    alphabet_size: int = 4,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    value_col: str = "value",
) -> DataFrame:
    """One SAX word (letters 'a'..) per series — the string key used for
    symbolic grouping / hot-path dedup of similar series.

    Output: ``(id, sax_word string)``; the concat is an in-group
    array_join over the already-aggregated n_segments rows, so the
    second aggregation reuses the (id) partitioning of the first.
    """
    s = sax(df, n_segments, alphabet_size, id_col, pos_col, value_col)
    letter = F.char(F.col("symbol") + F.lit(97))  # 'a' + symbol
    per_seg = s.select(F.col(id_col), F.col("segment"), letter.alias("_letter"))
    return (
        per_seg.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("segment", "_letter"))
                    ),
                    lambda x: x["_letter"],
                ),
                "",
            ).alias("sax_word")
        )
    )
