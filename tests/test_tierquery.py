"""Multi-tier query router: the routed union over (1h tier below its
watermark, 1m tier between watermarks, raw tail) equals a direct
rollup of raw at the requested resolution; the driver-side route plan
is gapless, disjoint and resolution-aligned."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.rollup import cascade_tier, rollup_tier
from tsclust_spark.plans.tierquery import (
    route_plan,
    routed_tier_read,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)


# ---------------------------------------------------------------------------
# route_plan (pure driver-side arithmetic, no Spark)
# ---------------------------------------------------------------------------

def test_route_plan_three_way_and_invariants():
    plan = route_plan(
        T0,
        T1,
        "1h",
        # unaligned watermarks on purpose: the partially-covered bucket
        # must fall through to a finer source entirely
        {"1h": "2024-01-01 06:30:00", "1m": "2024-01-01 18:10:30"},
    )
    assert plan == [
        ("1h", T0, dt.datetime(2024, 1, 1, 6)),
        ("1m", dt.datetime(2024, 1, 1, 6), dt.datetime(2024, 1, 1, 18)),
        ("raw", dt.datetime(2024, 1, 1, 18), T1),
    ]
    # gapless + disjoint + covers [t0, t1)
    assert plan[0][1] == T0 and plan[-1][2] == T1
    for (_, _, hi), (_, lo, _) in zip(plan, plan[1:]):
        assert hi == lo


def test_route_plan_excludes_non_divisor_tiers():
    # a 1d tier cannot answer an hourly query; a 1h tier cannot answer
    # a minutely one
    plan = route_plan(T0, T1, "1h", {"1d": "2024-01-01 12:00:00"})
    assert plan == [("raw", T0, T1)]
    plan = route_plan(
        T0, T1, "1m", {"1h": "2024-01-01 12:00:00", "1d": T1}
    )
    assert plan == [("raw", T0, T1)]
    # but 1h serves an 1h query and 1d serves a daily one
    assert route_plan(T0, T1, "1d", {"1d": T1}) == [("1d", T0, T1)]


def test_route_plan_watermark_past_range_needs_no_raw():
    plan = route_plan(T0, T1, "1h", {"1h": "2024-03-01 00:00:00"})
    assert plan == [("1h", T0, T1)]


def test_route_plan_rejects_unaligned_t0():
    with pytest.raises(ValueError, match="aligned"):
        route_plan(dt.datetime(2024, 1, 1, 0, 30), T1, "1h", {})


# ---------------------------------------------------------------------------
# routed read == direct rollup (Spark)
# ---------------------------------------------------------------------------

def _points(spark, n=4000, seed=77):
    rng = random.Random(seed)
    rows = [
        (
            f"d{i % 5}",
            T0 + dt.timedelta(seconds=rng.randrange(86400)),
            float(rng.randrange(1000)) / 8,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, ts timestamp, value double"
    )


def _rows(df):
    cols = ["doc_id", "bucket_ts", "min_value", "max_value",
            "sum_value", "count_value", "mean_value"]
    return [
        tuple(r)
        for r in df.select(cols).orderBy("doc_id", "bucket_ts").collect()
    ]


def test_routed_read_equals_direct_rollup(spark):
    pts = _points(spark)
    w1h, w1m = "2024-01-01 06:30:00", "2024-01-01 18:10:30"
    # simulate tier tables as a refresh at each watermark would have
    # left them: aggregates of rows with ts < watermark (the boundary
    # bucket is PARTIAL — the router must not read it)
    t1m = rollup_tier(
        pts.filter(F.col("ts") < F.lit(w1m).cast("timestamp")),
        "1m",
        integer_values=False,
    )
    t1h = cascade_tier(
        rollup_tier(
            pts.filter(F.col("ts") < F.lit(w1h).cast("timestamp")),
            "1m",
            integer_values=False,
        ),
        "1h",
        integer_values=False,
    )
    routed = routed_tier_read(
        "1h",
        T0,
        T1,
        {"1h": t1h.drop("mean_value"), "1m": t1m.drop("mean_value")},
        {"1h": w1h, "1m": w1m},
        raw_points=pts,
        integer_values=False,
    )
    direct = rollup_tier(pts, "1h", integer_values=False)
    assert _rows(routed) == _rows(direct)


def test_routed_read_single_tier_passthrough(spark):
    # watermark past the range: the whole answer is a pass-through scan
    # of the 1h tier, no raw needed
    pts = _points(spark, n=1000, seed=5)
    t1h = rollup_tier(pts, "1h", integer_values=False)
    routed = routed_tier_read(
        "1h",
        T0,
        T1,
        {"1h": t1h.drop("mean_value")},
        {"1h": "2024-03-01 00:00:00"},
        raw_points=None,
        integer_values=False,
    )
    assert _rows(routed) == _rows(rollup_tier(pts, "1h", integer_values=False))


def test_routed_read_raw_required_error(spark):
    pts = _points(spark, n=100, seed=9)
    t1h = rollup_tier(pts, "1h", integer_values=False)
    with pytest.raises(ValueError, match="raw_points"):
        routed_tier_read(
            "1h",
            T0,
            T1,
            {"1h": t1h.drop("mean_value")},
            {"1h": "2024-01-01 12:00:00"},
            raw_points=None,
            integer_values=False,
        )
