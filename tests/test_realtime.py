"""first()/last() tier aggregates + real-time continuous aggregate.

Covers what the driver gate can't: deterministic tie-breaking on equal
timestamps, cascade-vs-direct exactness on adversarial shapes, and the
watermark edge cases of `realtime_tier` (unaligned, before-all, after-all).
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.rollup import (
    cascade_tier,
    realtime_tier,
    rollup_tier,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _points(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


def _rand_points(spark, n_docs=5, n=400, seed=7):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        for _ in range(n // n_docs):
            # second-resolution over ~3 hours, duplicates likely
            ts = T0 + dt.timedelta(seconds=rng.randrange(3 * 3600))
            rows.append((f"doc{d}", ts, float(rng.randrange(-50, 50))))
    return _points(spark, rows)


def _sorted(df):
    return [tuple(r) for r in df.orderBy("doc_id", "bucket_ts").collect()]


@pytest.mark.spark
def test_first_last_tie_broken_by_value(spark):
    ts = T0 + dt.timedelta(seconds=5)
    pts = _points(
        spark,
        [("a", ts, 9.0), ("a", ts, 3.0), ("a", ts + dt.timedelta(seconds=50), 7.0)],
    )
    row = (
        rollup_tier(pts, "1m", integer_values=False, include_first_last=True)
        .select("first_value", "last_value")
        .first()
    )
    # ties on ts: first takes the smaller value, last the larger —
    # lexicographic struct ordering, same rule the DuckDB oracle applies
    assert row.first_value == 3.0
    assert row.last_value == 7.0


@pytest.mark.spark
def test_first_last_cascade_equals_direct(spark):
    pts = _rand_points(spark)
    t1m = rollup_tier(pts, "1m", integer_values=False, include_first_last=True)
    cascaded = cascade_tier(t1m, "1h", integer_values=False, include_first_last=True)
    direct = rollup_tier(
        pts, "1h", integer_values=False, include_first_last=True
    )
    cols = ["doc_id", "bucket_ts", "first_value", "last_value",
            "min_value", "max_value", "count_value"]
    assert _sorted(cascaded.select(cols)) == _sorted(direct.select(cols))


@pytest.mark.spark
def test_realtime_unaligned_watermark_equals_direct(spark):
    pts = _rand_points(spark, seed=11)
    wm = T0 + dt.timedelta(minutes=90, seconds=17)  # deliberately off-boundary
    stale = rollup_tier(
        pts.filter(F.col("ts") < F.lit(wm)), "1m", integer_values=False
    )
    rt = realtime_tier(pts, stale, "1m", wm, integer_values=False)
    direct = rollup_tier(pts, "1m", integer_values=False)
    assert _sorted(rt) == _sorted(direct)
    # the boundary minute (only partially materialized) was recomputed
    # from raw, not taken from the stale tier
    boundary = wm.replace(second=0, microsecond=0)
    assert rt.filter(F.col("bucket_ts") == F.lit(boundary)).count() == direct.filter(
        F.col("bucket_ts") == F.lit(boundary)
    ).count()


@pytest.mark.spark
@pytest.mark.parametrize("offset_min", [-10, 10**6])
def test_realtime_watermark_outside_range(spark, offset_min):
    """Watermark before all data => all-live; after all data => all-frozen.
    Both must still equal the direct rollup."""
    pts = _rand_points(spark, seed=13)
    wm = T0 + dt.timedelta(minutes=offset_min)
    stale = rollup_tier(
        pts.filter(F.col("ts") < F.lit(wm)), "1m", integer_values=False
    )
    rt = realtime_tier(pts, stale, "1m", wm, integer_values=False)
    assert _sorted(rt) == _sorted(rollup_tier(pts, "1m", integer_values=False))


@pytest.mark.spark
def test_realtime_with_first_last(spark):
    pts = _rand_points(spark, seed=17)
    wm = T0 + dt.timedelta(minutes=45, seconds=33)
    stale = rollup_tier(
        pts.filter(F.col("ts") < F.lit(wm)),
        "1m",
        integer_values=False,
        include_first_last=True,
    )
    rt = realtime_tier(
        pts, stale, "1m", wm, integer_values=False, include_first_last=True
    )
    direct = rollup_tier(
        pts, "1m", integer_values=False, include_first_last=True
    )
    assert _sorted(rt) == _sorted(direct)


@pytest.mark.spark
def test_time_weighted_avg_locf(spark):
    from tsclust_spark.operators.rollup import time_weighted_avg

    pts = _points(
        spark,
        [
            # 10.0 held 10s then 30.0 held 3525s -> twa ~ 29.94; tie row
            # (20.0 at the same ts as 10.0) gets zero weight but does
            # deterministically reorder which of the pair carries the 10s
            ("a", T0 + dt.timedelta(seconds=5), 10.0),
            ("a", T0 + dt.timedelta(seconds=5), 20.0),
            ("a", T0 + dt.timedelta(seconds=15), 30.0),
            ("a", T0 + dt.timedelta(minutes=59), 2.0),
            # single point -> plain mean fallback
            ("b", T0 + dt.timedelta(minutes=10), 7.0),
        ],
    )
    rows = {r.doc_id: r for r in time_weighted_avg(pts, "1h").collect()}
    # value-ordered tie: 10.0 first (0s weight), 20.0 carries the 10s
    expect_a = (20.0 * 10 + 30.0 * 3525) / (10 + 3525)
    assert abs(rows["a"].twa_value - expect_a) < 1e-9
    assert rows["b"].twa_value == 7.0
    assert rows["a"].count_value == 4


@pytest.mark.spark
def test_counter_delta_resets(spark):
    from tsclust_spark.operators.rollup import counter_delta

    pts = _points(
        spark,
        [
            # 5 -> 12 (+7), 12 -> 3 (reset, +3), 3 -> 10 (+7) => 17, 1 reset
            ("a", T0 + dt.timedelta(seconds=0), 5.0),
            ("a", T0 + dt.timedelta(seconds=10), 12.0),
            ("a", T0 + dt.timedelta(seconds=20), 3.0),
            ("a", T0 + dt.timedelta(seconds=30), 10.0),
            # single point: no pairs -> increase 0
            ("b", T0 + dt.timedelta(seconds=5), 42.0),
        ],
    )
    rows = {r.doc_id: r for r in counter_delta(pts, "1h").collect()}
    assert rows["a"].increase_value == 17.0
    assert rows["a"].n_resets == 1
    assert rows["b"].increase_value == 0.0
    assert rows["b"].n_resets == 0


@pytest.mark.spark
def test_top_tokens_tiebreak_and_k(spark):
    from tsclust_spark.operators.textstats import top_tokens_per_group

    docs = spark.createDataFrame(
        [("s1", "b a b c a"), ("s1", "a  c"), ("s2", "z z")],
        "source string, text string",
    )
    got = {
        (r.source, r.rank): (r.token, r.n)
        for r in top_tokens_per_group(docs, k=2).collect()
    }
    # s1: a=3, b=2, c=2 -> ranks: a then b (token tiebreak beats c)
    assert got[("s1", 1)] == ("a", 3)
    assert got[("s1", 2)] == ("b", 2)
    assert got[("s2", 1)] == ("z", 2)
    assert ("s2", 2) not in got


@pytest.mark.spark
def test_twa_and_counter_single_exchange(spark):
    """The window and the final aggregate share one hash partitioning:
    exactly ONE Exchange in each plan."""
    from tsclust_spark.operators.rollup import counter_delta, time_weighted_avg

    pts = _rand_points(spark, seed=23)
    for df in (time_weighted_avg(pts, "1h"), counter_delta(pts, "1h")):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") == 1, tree
