"""Pruned reads over the compressed raw tier.

The raw tier stores Gorilla/delta-of-delta blocks (kernels/codec.py,
one block per sequence row).  At 100 TB nobody can afford to decode
the whole tier to answer a range query, so the read path must skip
blocks from METADATA alone:

- **time pruning** needs no stored stats at all: the tier's implicit
  timestamp model (``ts = t0 + pos * step``, codec.py
  ``compress_sequences``) makes a block's covered range a pure
  expression over its existing ``(t0, n)`` columns.  The derived
  ``t_min``/``t_max`` are plain int64 columns, so the predicate is
  JVM-side, survives Catalyst pushdown, and — when blocks are
  materialized to parquet — prunes at row-group level via min/max
  statistics without touching the compressed payload.
- **value pruning** uses per-block ``v_min``/``v_max`` computed DURING
  encoding (``compress_sequences(with_stats=True)``): stats are free
  at write time and let a threshold scan ("which series ever exceeded
  X?") decode only blocks whose recorded max clears the threshold.

Both pruning predicates are strictly implied by the exact row-level
filter applied after decoding, so pruned plans return row-identical
results to decode-everything plans (pytest-asserted, plus the
``raw_range_scan`` / ``raw_value_scan`` driver gates oracle the full
prune -> decode -> filter -> aggregate pipeline value-level against
DuckDB computing directly from the uncompressed table).

Reference parity: imartinezl/tsclust has no storage layer (288-line
numerics skeleton); this is BASELINE.json engine-mandate surface
("delta-of-delta timestamp encoding and Gorilla XOR value compression
... across retention tiers").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.kernels.codec import decompress_blocks


def with_time_bounds(blocks: DataFrame, step_seconds: int = 1) -> DataFrame:
    """Derive the closed time range [t_min, t_max] each block covers.

    Empty blocks (n == 0) get t_max = t0 - step < t_min so no range
    predicate can ever select them (they hold no points).
    """
    step = F.lit(int(step_seconds)).cast("long")
    return blocks.withColumn("t_min", F.col("t0")).withColumn(
        "t_max", F.col("t0") + (F.col("n").cast("long") - 1) * step
    )


def prune_blocks_by_time(
    blocks: DataFrame, t_lo: int, t_hi: int, step_seconds: int = 1
) -> DataFrame:
    """Blocks whose covered range intersects [t_lo, t_hi].

    Metadata-only: evaluates (t0, n), never the compressed payload.
    """
    b = with_time_bounds(blocks, step_seconds)
    return b.filter(
        (F.col("t_max") >= F.lit(int(t_lo)))
        & (F.col("t_min") <= F.lit(int(t_hi)))
    )


def prune_blocks_by_value(blocks: DataFrame, threshold: int) -> DataFrame:
    """Blocks that MAY contain a value >= threshold (v_max stats).

    Requires blocks encoded with ``compress_sequences(with_stats=True)``;
    null v_max (empty block) never qualifies.
    """
    return blocks.filter(F.col("v_max") >= F.lit(int(threshold)))


def _decoded_points(blocks: DataFrame, step_seconds: int) -> DataFrame:
    """Decode blocks and explode to (doc_id, ts, value) points with the
    implicit-index timestamp reconstructed JVM-side."""
    step = F.lit(int(step_seconds)).cast("long")
    dec = decompress_blocks(blocks)
    return dec.select(
        "doc_id",
        "t0",
        F.posexplode("tokens").alias("pos", "value"),
    ).select(
        "doc_id",
        (F.col("t0") + F.col("pos").cast("long") * step).alias("ts"),
        "value",
    )


def raw_range_points(
    blocks: DataFrame, t_lo: int, t_hi: int, step_seconds: int = 1
) -> DataFrame:
    """Exact points in [t_lo, t_hi]: metadata prune -> decode survivors
    -> exact row filter.  The row filter implies the prune predicate,
    so the result is identical to decoding everything."""
    pruned = prune_blocks_by_time(blocks, t_lo, t_hi, step_seconds)
    pts = _decoded_points(pruned, step_seconds)
    return pts.filter(
        (F.col("ts") >= F.lit(int(t_lo))) & (F.col("ts") <= F.lit(int(t_hi)))
    )


def raw_range_stats(
    blocks: DataFrame, t_lo: int, t_hi: int, step_seconds: int = 1
) -> DataFrame:
    """Per-series aggregate over a time range of the compressed tier."""
    return (
        raw_range_points(blocks, t_lo, t_hi, step_seconds)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("value").alias("sum_val"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
        )
    )


def raw_value_scan(
    blocks: DataFrame, threshold: int, step_seconds: int = 1
) -> DataFrame:
    """Per-series hit count + max for values >= threshold, decoding
    only blocks whose encoded v_max clears the threshold."""
    pruned = prune_blocks_by_value(blocks, threshold)
    pts = _decoded_points(pruned, step_seconds)
    hits = pts.filter(F.col("value") >= F.lit(int(threshold)))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max("value").alias("max_val"),
    )


def _epoch(t, step_seconds: int = 1) -> int:
    import calendar
    import datetime as dt

    if isinstance(t, dt.datetime):
        return int(calendar.timegm(t.timetuple()))
    return int(t)


def raw_points_for_router(
    blocks: DataFrame, t_lo, t_hi, step_seconds: int = 1
) -> DataFrame:
    """``(doc_id, ts timestamp, value)`` live-tail leg for
    :func:`tsclust_spark.plans.tierquery.routed_tier_read` — the
    production shape where the raw tier itself is stored COMPRESSED:
    only blocks intersecting [t_lo, t_hi) are decompressed (metadata
    prune), then the exact half-open row filter applies.

    ``t_lo``/``t_hi``: epoch seconds or naive-UTC datetimes (the
    engine's session timezone is UTC, session.py).
    """
    lo, hi = _epoch(t_lo), _epoch(t_hi)
    # prune with the closed superset [lo, hi] (conservative, correct),
    # exact filter is half-open like every router leg
    pruned = prune_blocks_by_time(blocks, lo, hi, step_seconds)
    pts = _decoded_points(pruned, step_seconds).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
    )
    return pts.select(
        "doc_id", F.timestamp_seconds("ts").alias("ts"), "value"
    )


def prune_counts(
    blocks: DataFrame,
    t_lo: int | None = None,
    t_hi: int | None = None,
    value_threshold: int | None = None,
    step_seconds: int = 1,
) -> dict:
    """Evidence helper: how many blocks the metadata predicates skip.

    Metadata-scale aggregate (one row to the driver), used by tests and
    the bench addendum — not part of any query's data path.
    """
    total = blocks.count()
    out = {"total_blocks": total}
    if t_lo is not None:
        kept = prune_blocks_by_time(blocks, t_lo, t_hi, step_seconds).count()
        out["time_kept"] = kept
        out["time_pruned"] = total - kept
    if value_threshold is not None:
        kept = prune_blocks_by_value(blocks, value_threshold).count()
        out["value_kept"] = kept
        out["value_pruned"] = total - kept
    return out
