"""Continuous-aggregate refresh policy: incremental materialization
equals direct rollup; idempotent; realtime view seamless between
refreshes."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.rollup import rollup_tier
from tsclust_spark.plans.refresh import (
    read_watermark,
    realtime_view,
    refresh_tier,
)

T0 = dt.datetime(2024, 1, 1)


def _points(spark, n=500, seed=21):
    rng = random.Random(seed)
    rows = [
        (
            f"d{i % 4}",
            T0 + dt.timedelta(seconds=rng.randrange(3 * 3600)),
            float(rng.randrange(100)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, ts timestamp, value double"
    )


def _sorted(df):
    cols = ["doc_id", "bucket_ts", "min_value", "max_value",
            "sum_value", "count_value", "mean_value"]
    return [tuple(r) for r in df.select(cols).orderBy("doc_id", "bucket_ts").collect()]


@pytest.mark.spark
def test_incremental_refresh_equals_direct(spark, tmp_path):
    pts = _points(spark)
    tier_path = str(tmp_path / "tier1m")
    wm_path = str(tmp_path / "wm")

    # phase 1: only data before T1 has arrived; T1 is off-boundary
    t1 = T0 + dt.timedelta(minutes=95, seconds=41)
    phase1 = pts.filter(F.col("ts") < F.lit(t1))
    r1 = refresh_tier(
        spark, phase1, tier_path, wm_path, now=t1, integer_values=False
    )
    assert r1["watermark"] == t1.replace(second=0, microsecond=0)
    assert read_watermark(spark, wm_path) == r1["watermark"]

    # between refreshes: the realtime view over (all raw, stale tier)
    # must already equal the direct rollup of everything
    live = realtime_view(
        spark, pts, tier_path, wm_path, integer_values=False
    )
    assert _sorted(live) == _sorted(rollup_tier(pts, "1m", integer_values=False))

    # phase 2: everything arrived; advance past the data
    t2 = T0 + dt.timedelta(hours=4)
    refresh_tier(spark, pts, tier_path, wm_path, now=t2, integer_values=False)
    stored = spark.read.parquet(tier_path).drop("bucket_date")
    assert _sorted(stored) == _sorted(
        rollup_tier(pts, "1m", integer_values=False)
    )


@pytest.mark.spark
def test_refresh_idempotent(spark, tmp_path):
    pts = _points(spark, seed=33)
    tier_path = str(tmp_path / "tier1m")
    wm_path = str(tmp_path / "wm")
    t2 = T0 + dt.timedelta(hours=4)
    refresh_tier(spark, pts, tier_path, wm_path, now=t2, integer_values=False)
    first = _sorted(spark.read.parquet(tier_path).drop("bucket_date"))
    # same `now` again: the window [align(t2), align(t2)) is empty ->
    # zero rows merged, tier byte-identical
    r = refresh_tier(
        spark, pts, tier_path, wm_path, now=t2, integer_values=False
    )
    assert r["rows"] == 0
    assert _sorted(spark.read.parquet(tier_path).drop("bucket_date")) == first


@pytest.mark.spark
def test_no_partial_bucket_ever_stored(spark, tmp_path):
    pts = _points(spark, seed=44)
    tier_path = str(tmp_path / "tier1m")
    wm_path = str(tmp_path / "wm")
    t1 = T0 + dt.timedelta(minutes=30, seconds=29)
    refresh_tier(
        spark,
        pts.filter(F.col("ts") < F.lit(t1)),
        tier_path,
        wm_path,
        now=t1,
        integer_values=False,
    )
    stored = spark.read.parquet(tier_path)
    # the boundary minute is only partially covered by t1 -> it must NOT
    # have been materialized (realtime_tier computes it live instead)
    boundary = t1.replace(second=0, microsecond=0)
    assert stored.filter(F.col("bucket_ts") >= F.lit(boundary)).count() == 0


@pytest.mark.spark
def test_watermark_never_regresses(spark, tmp_path):
    pts = _points(spark, seed=55)
    tier_path = str(tmp_path / "tier1m")
    wm_path = str(tmp_path / "wm")
    t2 = T0 + dt.timedelta(hours=4)
    refresh_tier(spark, pts, tier_path, wm_path, now=t2, integer_values=False)
    before = _sorted(spark.read.parquet(tier_path).drop("bucket_date"))
    # a refresh with an EARLIER `now` (misconfigured scheduler) must be
    # a no-op: no rows, mark unchanged, tier unchanged
    r = refresh_tier(
        spark,
        pts,
        tier_path,
        wm_path,
        now=T0 + dt.timedelta(hours=1),
        integer_values=False,
    )
    assert r["rows"] == 0
    assert read_watermark(spark, wm_path) == t2  # t2 is minute-aligned
    assert _sorted(spark.read.parquet(tier_path).drop("bucket_date")) == before
