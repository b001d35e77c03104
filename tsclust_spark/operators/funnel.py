"""Ordered funnels, rolling active users, cohort retention.

The product-analytics queries every event pipeline ships:

- :func:`funnel_counts` — how many users perform a given SEQUENCE of
  event types in order (view -> click -> purchase), each step within
  ``max_days`` of the previous one, counted per step.  "In order"
  means each step's event strictly AFTER the chosen event of the
  previous step; the chosen event is the EARLIEST eligible one — the
  FIRST-TOUCH attribution convention.  Without a deadline, greedy
  earliest choice is provably equivalent to existence (an earlier
  anchor never forecloses a later step); WITH a deadline it is a
  deliberate semantic choice — a user whose first view goes stale
  before they click is counted as NOT converting even if a later
  re-view would have been in time (pytest-asserted in
  tests/test_funnel.py::test_funnel_greedy_equals_existence).  The
  any-anchor variant is a different operator (per-step windowed
  joins) with quadratic worst-case per user; first-touch is what
  product funnels ship by default.
- :func:`rolling_active_users` — distinct users active in the
  trailing ``window_days`` calendar days, per day (the WAU curve for
  window_days=7).  Sliding COUNT DISTINCT is not a window aggregate
  in either engine; the standard exact rewrite is contribution
  expansion: each (user, active-day) pair contributes to the
  ``window_days`` following report days, then one exact distinct
  count per report day.  Cost is O(active-pairs x window) at
  USER-DAY tier scale (already deduplicated), not event scale — the
  same trick a 100-TB pipeline uses, with the window factor bounded
  by the report granularity.

Both are pure Catalyst expressions — zero Python, no self-joins on
the event table (funnel steps fold left over per-user min-aggregates
of the SAME grouped scan).

Engine shape, funnel: filter to the step event types, one hash
aggregate per (user, step) keeping each step's ordered event times as
a sorted array... simpler and shuffle-cheaper: one groupBy(user)
collecting per-step sorted ts arrays (bounded by the funnel's event
count per user), then a left-fold of "first element after prev" via
array filtering — per-user state only, one Exchange on user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _funnel_anchors(
    df: DataFrame,
    steps: list[str],
    max_days: float | None,
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """Per-user first-touch anchor timestamps ``_r0.._r{k-1}`` (NULL
    once the funnel breaks) — the shared core of funnel_counts and
    funnel_latency.  One Exchange on user."""
    secs = None if max_days is None else float(max_days) * 86400.0
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).cast("timestamp").alias("t"),
    )
    per_user = ev.groupBy("user").agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col("etype") == s, F.col("t")))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # left-fold: reach_0 = earliest step-0 event; reach_k = earliest
    # step-k event strictly after reach_{k-1} (and within the
    # deadline). NULL propagates = funnel broken.  F.get (0-based) is
    # the null-on-missing accessor; element_at throws on empty arrays
    # under ANSI.
    reach = F.get(F.col("_ts_0"), 0)
    cols = [reach.alias("_r0")]
    for i in range(1, len(steps)):
        prev = F.col(f"_r{i - 1}")
        cand = F.filter(
            F.col(f"_ts_{i}"),
            (lambda p: (lambda x: x > p))(prev)
            if secs is None
            else (
                lambda p: (
                    lambda x: (x > p)
                    & (
                        F.unix_micros(x) - F.unix_micros(p)
                        <= int(secs * 1e6)
                    )
                )
            )(prev),
        )
        cols.append(F.get(cand, 0).alias(f"_r{i}"))
    for i, c in enumerate(cols):
        per_user = per_user.withColumn(f"_r{i}", c)
    return per_user


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    max_days: float | None = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(step_idx, step, n_users, conversion)`` — users reaching each
    funnel step in order; ``conversion`` is n_users / step-1 users.

    A user "reaches" step k if, anchoring each step at its EARLIEST
    eligible event (first touch), events e_1 < e_2 < ... < e_k exist
    with the given types, each within ``max_days`` of the anchored
    predecessor.  With ``max_days=None`` this equals plain ordered
    existence.
    """
    per_user = _funnel_anchors(
        df, steps, max_days, user_col, ts_col, type_col
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"_r{i}")).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").cast("long").alias("n_users"),
                (
                    F.lit(1.0)
                    if i == 0
                    else F.when(
                        F.col(f"_n{i - 1}") > 0,
                        F.col(f"_n{i}") / F.col(f"_n{i - 1}"),
                    ).otherwise(F.lit(0.0))
                ).alias("conversion"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.inline(rows))


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(day, active_users)`` — distinct users with >= 1 event in the
    trailing ``window_days`` days ending at ``day``, for every day
    that has at least one contributing active day.

    Exact, via contribution expansion over the (user, day) tier:
    report days with zero activity in their whole trailing window
    emit no row (they would be 0; materializing them is gap-fill's
    job), and report days never extend past the data's LAST active
    day — without the cap the expansion would emit up to
    window_days - 1 phantom trailing rows counting only stale
    activity, which a WAU plot would read as real observed days.
    """
    ud = (
        df.select(
            F.col(user_col).alias("user"),
            F.date_trunc("day", F.col(ts_col)).alias("aday"),
        )
        .distinct()
    )
    last = ud.agg(F.max("aday").alias("_last_day"))
    offsets = F.sequence(F.lit(0), F.lit(int(window_days) - 1))
    contrib = ud.select(
        "user",
        F.explode(
            F.transform(
                offsets,
                lambda k: F.timestamp_add("DAY", k, F.col("aday")),
            )
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(last))  # 1-row dim
        .filter(F.col("day") <= F.col("_last_day"))
        .groupBy("day")
        .agg(F.count_distinct("user").alias("active_users"))
        .select("day", F.col("active_users").cast("long").alias("active_users"))
    )


def cohort_retention(
    df: DataFrame,
    cohort_trunc: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention triangle: ``(cohort, period, n_active,
    cohort_size, retention)`` — of the users whose FIRST activity fell
    in ``cohort`` (a ``cohort_trunc`` bucket), how many were active
    again ``period`` buckets later.

    ``period`` 0 is the cohort itself (retention 1.0 by construction);
    (cohort, period) cells with no returning users emit no row (sparse
    triangle — materializing zeros is gap-fill's job).  The
    survival-over-calendar complement of the funnel: the funnel asks
    "how deep users go", this asks "how long they keep coming back".

    Engine shape: (user, bucket) DISTINCT tier -> per-user min-bucket
    (one aggregate) -> join the one-row-per-user cohort map back onto
    the tier on its own user key (co-partitioned: the tier is already
    hashed by user from the DISTINCT, so the join adds no third
    shuffle of point-scale data) -> one (cohort, period) distinct
    count + a broadcast cohort-size join.  Period arithmetic is
    integer calendar-day differences divided by the bucket length —
    exact on both engines since truncated buckets differ by whole
    units; the single float is the final ratio.  All point-scale work
    ends at the first DISTINCT.
    """
    unit_days = {"week": 7, "day": 1}[cohort_trunc]
    ub = (
        df.select(
            F.col(user_col).alias("user"),
            F.date_trunc(cohort_trunc, F.col(ts_col)).alias("bucket"),
        )
        .distinct()
    )
    first = ub.groupBy("user").agg(F.min("bucket").alias("cohort"))
    per = (
        ub.join(first, "user")
        .withColumn(
            "period",
            (F.datediff("bucket", "cohort") / F.lit(unit_days))
            .cast("long"),
        )
        .groupBy("cohort", "period")
        .agg(F.count_distinct("user").alias("n_active"))
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        per.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "period",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )


def funnel_latency(
    df: DataFrame,
    steps: list[str],
    max_days: float | None = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """End-to-end conversion latency of the users who complete the
    funnel: one row ``(n_converted, mean_s, p50_s, min_s, max_s)``
    over first-touch anchor times (seconds from the step-0 anchor to
    the final step's anchor).

    ``p50_s`` is the LOWER median (the rank-ceil(n/2) element by
    exact integer rank) — no interpolation, so the statistic is
    engine- and partitioning-exact; all four time stats are integer
    microseconds under the hood, the mean the only division.

    Engine shape: the funnel fold's per-user anchors (one Exchange on
    user, see :func:`funnel_counts`), filtered to completers, then
    one global aggregate.  The exact median's rank window is
    deliberately unpartitioned — it sorts COMPLETERS only (typically
    a small fraction of users), and exactness is what makes the
    statistic engine-gateable; at extreme completer counts swap
    ``p50_s`` for ``approx_percentile`` and drop the gate, or bucket
    latencies to a histogram first.
    """
    anchors = _funnel_anchors(
        df, steps, max_days, user_col, ts_col, type_col
    )
    last = f"_r{len(steps) - 1}"
    lat = (
        anchors.filter(F.col(last).isNotNull())
        .select(
            (
                (
                    F.unix_micros(F.col(last))
                    - F.unix_micros(F.col("_r0"))
                )
                / F.lit(1e6)
            ).alias("lat_s")
        )
    )
    w = Window.orderBy("lat_s")
    ranked = lat.withColumn("rn", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(Window.partitionBy())
    )
    return ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.avg("lat_s").alias("mean_s"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.col("nn") / 2), F.col("lat_s")
            )
        ).alias("p50_s"),
        F.min("lat_s").alias("min_s"),
        F.max("lat_s").alias("max_s"),
    )
