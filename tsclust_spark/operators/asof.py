"""As-of join + gap sessionization — time-series relational operators.

Neither exists as a Spark built-in; both are expressed as single-shuffle
DataFrame plans (no UDFs, no per-row Python), which is the shape that
survives 100 TB:

- :func:`asof_join`: for each left row, the most recent right row with
  ``r.ts <= l.ts`` per key. Implemented with the union-tag trick: tag
  and union both sides, ONE shuffle on the key, and a running
  ``last(..., ignorenulls=True)`` window carries the right side's
  latest values forward onto left rows. Cost: one Exchange + one
  in-partition sort — strictly cheaper than a range join (which Spark
  would plan as a broadcast-nested-loop or a cross-range product).
- :func:`sessionize`: assign session ids by inactivity gap — the
  classic ``lag`` + cumulative-sum-of-boundaries window pair, again one
  shuffle on the key.

Per-key time ordering lives inside a single window partition; for
skewed keys (one device with billions of points) use the bucketed
variants — :func:`asof_join_bucketed` / :func:`sessionize_bucketed`
range-split each key's timeline into fixed time buckets, run the window
per (key, bucket), and stitch the boundary exactly (carry the last
right-row struct across buckets; merge sessions spanning a boundary).
The heavy window then parallelizes across (key, bucket) instead of
serializing per key; the stitch windows run over one row per
(key, bucket) — metadata-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    right_value_col: str = "value",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left rows + the latest right value at-or-before each left ts.

    Output: left's columns + ``asof_value`` / ``asof_ts`` (null when no
    right row precedes, or when it is older than ``tolerance_seconds``).
    Right rows tie-sorted before left rows at equal ``ts`` so an exact
    timestamp match IS visible (DuckDB ``ASOF JOIN`` semantics,
    ``l.ts >= r.ts``). When several right rows share the same
    (key, ts), the one with the greatest value wins — deterministic via
    the ``_rv`` tertiary sort (nondeterministic before: the window order
    left equal-(ts, _side) rows unordered across partitionings).
    """
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_value_col].dataType).alias("_rv"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in (key_col, ts_col)
        ],
        F.lit(0).alias("_side"),
        F.col(right_value_col).alias("_rv"),
        F.col(ts_col).alias("_rts"),
    ).select(*left_cols, "_side", "_rv", "_rts")

    merged = l.unionByName(r)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry (value, ts) as ONE struct so they always come from the SAME
    # right row: tracking them with two independent last(ignorenulls)
    # calls would pair a stale value with a newer row's timestamp
    # whenever a right row's value is NULL
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_rv").alias("rv"), F.col("_rts").alias("rts")),
    )
    out = (
        merged.withColumn("_r", right_row)
        .withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .withColumn("asof_value", F.col("_asof.rv"))
        .withColumn("asof_ts", F.col("_asof.rts"))
        .drop("_side", "_rv", "_rts", "_r", "_asof")
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp(ts_col) - F.unix_timestamp("asof_ts")
            > tolerance_seconds
        )
        out = out.withColumn(
            "asof_value", F.when(stale, None).otherwise(F.col("asof_value"))
        ).withColumn("asof_ts", F.when(stale, None).otherwise(F.col("asof_ts")))
    return out


def sessionize(
    points: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    since the key's previous event exceeds ``gap_seconds``.

    Output: input columns + ``session_id`` (0-based per key). One
    shuffle on the key; boundaries via ``lag``, ids via a running sum.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return points.withColumn(
        "session_id", (F.sum(is_new).over(running) - 1).cast("int")
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    right_value_col: str = "value",
    bucket_seconds: int = 86400,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """:func:`asof_join` for skewed keys: range-split each key's
    timeline into fixed ``bucket_seconds`` buckets, run the as-of window
    per (key, bucket), then stitch boundaries exactly.

    Stitch: per (key, bucket) take the LAST right-row struct
    ``max(struct(ts, value))`` (same greatest-value tiebreak as the
    unsplit window), carry it forward across buckets with a running max
    over one-row-per-bucket aggregates (metadata-scale window), and
    substitute it wherever the within-bucket as-of found no preceding
    right row. Result is row-for-row equal to :func:`asof_join`
    (pytest-asserted), but the heavy window parallelizes across
    (key, bucket) instead of serializing a hot key in one partition.
    """
    bkt = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds))
    lb = left.withColumn("_bkt", bkt).withColumn(
        "_kb", F.struct(F.col(key_col), F.col("_bkt"))
    )
    rb = right.withColumn("_bkt", bkt).withColumn(
        "_kb", F.struct(F.col(key_col), F.col("_bkt"))
    )
    local = asof_join(
        lb, rb, key_col="_kb", ts_col=ts_col, right_value_col=right_value_col
    )

    # boundary carry: last right row strictly BEFORE each bucket, over the
    # union of bucket keys both sides touch (a left bucket with no right
    # rows still needs a carry row)
    buckets = (
        lb.select(key_col, "_bkt").union(rb.select(key_col, "_bkt")).distinct()
    )
    last_r = rb.groupBy(key_col, "_bkt").agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("rts"), F.col(right_value_col).alias("rv")
            )
        ).alias("_last_r")
    )
    wprev = (
        Window.partitionBy(key_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.join(last_r, [key_col, "_bkt"], "left")
        .withColumn("_carry", F.max("_last_r").over(wprev))
        .select(key_col, "_bkt", "_carry")
    )

    out = (
        local.join(carry, [key_col, "_bkt"], "left")
        .withColumn(
            "asof_value",
            F.when(F.col("asof_ts").isNull(), F.col("_carry.rv")).otherwise(
                F.col("asof_value")
            ),
        )
        .withColumn(
            "asof_ts",
            F.when(F.col("asof_ts").isNull(), F.col("_carry.rts")).otherwise(
                F.col("asof_ts")
            ),
        )
        .drop("_bkt", "_kb", "_carry")
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp(ts_col) - F.unix_timestamp("asof_ts")
            > tolerance_seconds
        )
        out = out.withColumn(
            "asof_value", F.when(stale, None).otherwise(F.col("asof_value"))
        ).withColumn("asof_ts", F.when(stale, None).otherwise(F.col("asof_ts")))
    return out


def sessionize_bucketed(
    points: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """:func:`sessionize` for skewed keys: sessionize per (key, time
    bucket), then renumber so sessions spanning a bucket boundary merge.

    Stitch math over one row per (key, bucket) (ordered by bucket):
    ``merge_b = 1`` iff the bucket's first event is within
    ``gap_seconds`` of the previous bucket's last event, and
    ``base_b = sum(n_sessions before b) - sum(merge up to b)``;
    each local id then maps to ``base_b + local_id``. Equal to the
    unsplit :func:`sessionize` row-for-row (pytest-asserted), including
    sessions spanning many buckets (a fully-merging bucket contributes
    ``n_sessions=1`` and ``merge=1`` — net zero new sessions).
    """
    b = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds))
    )
    wl = Window.partitionBy(key_col, "_bkt").orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(wl))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    wrun = wl.rowsBetween(Window.unboundedPreceding, 0)
    local = b.withColumn("_local_sid", F.sum(is_new).over(wrun) - 1)

    agg = local.groupBy(key_col, "_bkt").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        (F.max("_local_sid") + 1).alias("_n_sessions"),
    )
    word = Window.partitionBy(key_col).orderBy("_bkt")
    merge = F.when(
        F.unix_timestamp("_first_ts")
        - F.unix_timestamp(F.lag("_last_ts").over(word))
        <= gap_seconds,
        1,
    ).otherwise(0)
    base = F.coalesce(
        F.sum("_n_sessions").over(word.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ) - F.sum("_merge").over(word.rowsBetween(Window.unboundedPreceding, 0))
    bases = (
        agg.withColumn("_merge", merge)
        .withColumn("_base", base)
        .select(key_col, "_bkt", "_base")
    )
    return (
        local.join(bases, [key_col, "_bkt"])
        .withColumn(
            "session_id", (F.col("_base") + F.col("_local_sid")).cast("int")
        )
        .drop("_bkt", "_local_sid", "_base")
    )


def session_stats(
    points: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output."""
    s = sessionize(points, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_sec"),
    )


def asof_join_interpolate(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    right_value_col: str = "value",
) -> DataFrame:
    """Left rows + the right value LINEARLY INTERPOLATED between the
    nearest right rows at-or-before and at-or-after each left ts (the
    tick-data "interpolated quote" variant of the as-of join; the plain
    join is the "prevailing quote").

    Same union-tag single-Exchange shape as :func:`asof_join`, with a
    second in-partition sort for the forward pass (both windows share
    the one hash partitioning on the key; no extra shuffle).  Edge
    semantics: only-one-side rows take that side's value verbatim; an
    exact-ts right match (or equal prev/next ts) takes the backward
    value; equal-(key, ts) right duplicates resolve to the greatest
    value on BOTH sides, keeping the result deterministic.

    Output: left's columns + ``prev_value prev_ts next_value next_ts
    asof_value``.
    """
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_value_col].dataType).alias("_rv"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in (key_col, ts_col)
        ],
        F.lit(0).alias("_side"),
        F.col(right_value_col).alias("_rv"),
        F.col(ts_col).alias("_rts"),
    ).select(*left_cols, "_side", "_rv", "_rts")
    merged = l.unionByName(r)

    # backward: right rows sort BEFORE left at equal ts -> exact match
    # visible; greatest _rv wins ties (as in asof_join)
    wb = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left rows sort BEFORE right at equal ts -> the following
    # frame starting at a left row sees a same-ts right row; _rv desc +
    # first() makes the greatest value win ties, mirroring backward
    wf = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_rv").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_rv").alias("rv"), F.col("_rts").alias("rts")),
    )
    base = (
        merged.withColumn("_r", right_row)
        .withColumn("_prev", F.last("_r", ignorenulls=True).over(wb))
        .withColumn("_next", F.first("_r", ignorenulls=True).over(wf))
        .filter(F.col("_side") == 1)
    )
    pv, pt = F.col("_prev.rv"), F.col("_prev.rts")
    nv, nt = F.col("_next.rv"), F.col("_next.rts")

    def _us(c):
        # unix_micros requires TIMESTAMP; parquet sources arrive as
        # TIMESTAMP_NTZ — the cast interprets in the session zone (the
        # engine pins UTC), identically for all three columns
        return F.unix_micros(c.cast("timestamp"))

    frac = (
        (_us(F.col(ts_col)) - _us(pt)).cast("double")
        / (_us(nt) - _us(pt)).cast("double")
    )
    interp = (
        F.when(pv.isNull() & nv.isNull(), F.lit(None).cast("double"))
        .when(pv.isNull(), nv.cast("double"))
        .when(nv.isNull() | (_us(nt) == _us(pt)), pv.cast("double"))
        .otherwise(pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac)
    )
    return (
        base.withColumn("prev_value", pv)
        .withColumn("prev_ts", pt)
        .withColumn("next_value", nv)
        .withColumn("next_ts", nt)
        .withColumn("asof_value", interp)
        .drop("_side", "_rv", "_rts", "_r", "_prev", "_next")
    )
