"""M4 visualization-oriented downsampling (Jugel et al., VLDB 2014).

For a fixed pixel width (a time-bucket duration), keep per (series,
pixel) only the rows that a pixel-perfect line rendering can show:
the first, last, minimum and maximum points of the bucket — at most 4
rows per pixel, error-free for min/max envelopes at the chosen width.
This complements the LTTB kernel (``kernels/lttb.py``): LTTB picks a
fixed per-series budget by triangle area (shape-preserving, sequential
per series); M4 is a pure per-bucket aggregate, so it is the one that
scales embarrassingly — one hash aggregate, no per-series state.

Scale notes (100 TB): exactly ONE shuffle (the groupBy on
``(key, pixel)``), whole-stage-codegen struct min/max, map-side partial
aggregation. The 4 candidate points are deduplicated with a map-side
``array_distinct`` BEFORE the explode — a cross-pixel duplicate is
impossible (a row belongs to exactly one pixel), so no ``distinct()``
shuffle is needed.

Determinism: ties are broken by lexicographic struct comparison —
first/last compare ``(ts, value)``, min/max compare ``(value, ts)`` —
identical semantics in Spark and the DuckDB oracle twin.

Reference parity: the reference engine (tsclust) has no downsampler;
this operator is part of the retention-tier surface mandated by
BASELINE.json's north_star (downsample + retention engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICROS = 1_000_000


def m4_downsample(
    df: DataFrame,
    width_seconds: int,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Reduce each (series, pixel-bucket) to its <=4 M4 points.

    ``width_seconds`` is the pixel width; buckets are aligned to the
    epoch (``unix_micros(ts) div width``), so two runs over different
    data slices of the same stream land in the same buckets — the
    property that makes the output mergeable across incremental runs.

    Output: ``(key, pixel, ts, value)`` — one row per kept point.
    """
    if width_seconds <= 0:
        raise ValueError(f"width_seconds must be positive, got {width_seconds}")
    width_us = int(width_seconds) * MICROS
    # parquet timestamps may arrive as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP (session tz is pinned to UTC in session.py, so the cast
    # is a no-op reinterpretation)
    pixel = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {width_us}")

    pt = lambda s: F.struct(  # noqa: E731
        F.col(f"{s}.{ts_col}").alias(ts_col),
        F.col(f"{s}.{value_col}").alias(value_col),
    )
    # each struct is projected ONCE per row and fed to both its min and
    # max aggregate (the inline form re-evaluated the struct constructor
    # per aggregate expression in the partial-aggregate stage)
    agg = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            pixel.alias("pixel"),
            F.struct(ts_col, value_col).alias("_tv"),
            F.struct(value_col, ts_col).alias("_vt"),
        )
        .groupBy("key", "pixel")
        .agg(
            F.min("_tv").alias("_first"),
            F.max("_tv").alias("_last"),
            F.min("_vt").alias("_min"),
            F.max("_vt").alias("_max"),
        )
    )
    return (
        agg.select(
            "key",
            "pixel",
            F.explode(
                F.array_distinct(
                    F.array(pt("_first"), pt("_min"), pt("_max"), pt("_last"))
                )
            ).alias("_pt"),
        )
        .select(
            F.col("key").alias(key_col),
            "pixel",
            F.col(f"_pt.{ts_col}").alias(ts_col),
            F.col(f"_pt.{value_col}").alias(value_col),
        )
    )
