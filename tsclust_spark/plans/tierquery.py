"""Resolution-aware multi-tier query router.

The piece that makes the retention tiers *queryable* as one surface
(the TimescaleDB/Grafana read path): a request "aggregate [t0, t1) at
resolution R" is answered by splitting the range into contiguous,
R-aligned segments and serving each segment from the CHEAPEST source
that can answer it exactly:

- buckets older than the R tier's refresh watermark come straight from
  the materialized R tier (no recompute at all);
- buckets between the R tier's and a finer tier's watermarks are
  re-aggregated from the finer tier (1/60th of raw volume for 1m->1h);
- the live tail past the finest materialized watermark is aggregated
  from raw points.

Exactness rests on the same invariant as the cascade
(operators/rollup.py): every stored stat is decomposable
(min/max/sum/count; mean derived as sum/count on read), so
re-bucketing a finer tier is bit-equal to aggregating raw directly —
the driver gate (`routed_tier_1h`) proves the three-way union equals a
single direct-from-raw aggregate.

Scale notes (100 TB): the routing decision is driver-side arithmetic
on a handful of timestamps — each leg's scan carries a LITERAL
``bucket_ts``/``ts`` range predicate, so Parquet/Iceberg partition
pruning (tiers are partitioned by ``bucket_date``) and row-group
min/max skipping apply before a single byte is read.  A month-long 1h
dashboard query reads ~720 tier rows per key plus minutes of raw tail
instead of re-scanning a month of raw points.  Legs are unioned, never
joined, and each leg aggregates at most one watermark interval.

A tier whose retention has expired for part of the range simply has no
rows there — pass ``strict_coverage=False`` to let a coarser-only
answer through, or keep the default and the router raises when the
requested resolution cannot be answered exactly for the full range.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.rollup import TIER_TRUNC, rollup_tier

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}

_STAT_COLS = ["min_value", "max_value", "sum_value", "count_value"]


def _parse(t) -> dt.datetime:
    if isinstance(t, dt.datetime):
        return t
    return dt.datetime.fromisoformat(t)


def _floor(t: dt.datetime, resolution: str) -> dt.datetime:
    if resolution == "1m":
        return t.replace(second=0, microsecond=0)
    if resolution == "1h":
        return t.replace(minute=0, second=0, microsecond=0)
    if resolution == "1d":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"unknown resolution {resolution!r}")


def route_plan(
    t0,
    t1,
    resolution: str,
    watermarks: dict[str, object],
) -> list[tuple[str, dt.datetime, dt.datetime]]:
    """Split [t0, t1) into per-source segments, coarse -> fine -> raw.

    ``watermarks`` maps tier name -> refresh high-water mark (rows with
    ``ts`` < mark are materialized in that tier; plans/refresh.py).
    Only tiers whose bucket length divides the resolution are eligible
    (a 1d tier cannot answer an hourly query).  Each eligible tier,
    from coarsest to finest, serves the R-aligned buckets that are
    FULLY materialized (bucket_ts < floor_R(watermark)) and not already
    served by a coarser-but-eligible tier; raw serves the remainder.
    Floors make unaligned watermarks safe: a bucket only partially
    covered by a tier's watermark is routed to a finer source entirely.

    Returns ``[(source, seg_start, seg_end), ...]`` with ``source`` a
    tier name or ``"raw"``; segments are disjoint, R-aligned except for
    the raw tail's end, and cover [t0, t1) exactly (gapless —
    pytest-asserted).  Empty segments are dropped.
    """
    t0, t1 = _parse(t0), _parse(t1)
    if resolution not in TIER_SECONDS:
        raise ValueError(f"unknown resolution {resolution!r}")
    res_s = TIER_SECONDS[resolution]
    if _floor(t0, resolution) != t0:
        raise ValueError("t0 must be aligned to the requested resolution")
    eligible = [
        t
        for t in ("1d", "1h", "1m")  # coarse -> fine
        if t in watermarks and res_s % TIER_SECONDS[t] == 0
    ]
    plan: list[tuple[str, dt.datetime, dt.datetime]] = []
    edge = t0
    for tier in eligible:
        hi = min(_floor(_parse(watermarks[tier]), resolution), t1)
        if hi > edge:
            plan.append((tier, edge, hi))
            edge = hi
    if t1 > edge:
        plan.append(("raw", edge, t1))
    return plan


def routed_tier_read(
    resolution: str,
    t0,
    t1,
    tier_tables: dict[str, DataFrame],
    watermarks: dict[str, object],
    raw_points: DataFrame | None = None,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    integer_values: bool = True,
) -> DataFrame:
    """Aggregate [t0, t1) at ``resolution`` from the cheapest sources.

    ``tier_tables`` maps tier name -> its materialized table (rollup
    schema: key, bucket_ts, min/max/sum/count); ``watermarks`` the
    corresponding refresh marks.  ``raw_points`` covers the live tail —
    required when the finest watermark is inside the range.

    Output: one row per (key, R-bucket) with min/max/sum/count and the
    derived mean — identical to ``rollup_tier(raw, resolution)`` over
    the same range (driver-gated), while reading each segment from the
    coarsest exact source.
    """
    plan = route_plan(t0, t1, resolution, watermarks)
    trunc = TIER_TRUNC[resolution]
    sum_type = "bigint" if integer_values else "double"
    legs = []
    for source, lo, hi in plan:
        lo_l, hi_l = F.lit(str(lo)).cast("timestamp"), F.lit(str(hi)).cast(
            "timestamp"
        )
        if source == "raw":
            if raw_points is None:
                raise ValueError(
                    f"range [{lo}, {hi}) is past every tier watermark "
                    "and no raw_points table was supplied"
                )
            seg = raw_points.filter(
                (F.col(ts_col) >= lo_l) & (F.col(ts_col) < hi_l)
            )
            leg = rollup_tier(
                seg, resolution, key_col, ts_col, value_col, integer_values
            ).drop("mean_value")
        else:
            t = tier_tables[source].filter(
                (F.col("bucket_ts") >= lo_l) & (F.col("bucket_ts") < hi_l)
            )
            if source == resolution:
                # already at the requested granularity: pass through,
                # no shuffle at all for this leg
                leg = t.select(key_col, "bucket_ts", *_STAT_COLS)
            else:
                # re-bucket the finer tier; decomposable stats make
                # this exact (same rule as cascade_tier)
                leg = t.groupBy(
                    key_col,
                    F.date_trunc(trunc, "bucket_ts").alias("bucket_ts"),
                ).agg(
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                    F.sum("sum_value").cast(sum_type).alias("sum_value"),
                    F.sum("count_value").alias("count_value"),
                )
        legs.append(leg)
    if not legs:
        raise ValueError("empty routing plan (t0 >= t1?)")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.withColumn(
        "mean_value",
        F.col("sum_value").cast("double") / F.col("count_value"),
    )
