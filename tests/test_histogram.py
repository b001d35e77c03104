"""Mergeable tier histograms: cascade exactness, clamping, NULLs,
percentile error bounds, and the single-aggregate plan shape."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.histogram import (
    bin_index,
    cascade_histogram,
    histogram_tier,
    percentile_from_histogram,
)

T0 = dt.datetime(2024, 1, 1)
LO, HI, NB = 0.0, 100.0, 10


def _pts(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


def _rand(spark, n=600, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                f"d{i % 4}",
                T0 + dt.timedelta(seconds=rng.randrange(2 * 86400)),
                # includes values outside [LO, HI) -> clamped bins
                rng.uniform(-30.0, 140.0),
            )
        )
    return _pts(spark, rows)


def _hists(df):
    return {(r.doc_id, r.bucket_ts): list(r.hist) for r in df.collect()}


@pytest.mark.spark
def test_cascade_equals_direct_1h_and_1d(spark):
    pts = _rand(spark)
    h1m = histogram_tier(pts, "1m", LO, HI, NB)
    for tier in ("1h", "1d"):
        cascaded = cascade_histogram(h1m, tier, NB)
        direct = histogram_tier(pts, tier, LO, HI, NB)
        assert _hists(cascaded) == _hists(direct)


@pytest.mark.spark
def test_clamping_and_nulls(spark):
    pts = _pts(
        spark,
        [
            ("a", T0, -5.0),   # below lo -> bin 0
            ("a", T0, 100.0),  # == hi -> last bin
            ("a", T0, 250.0),  # above hi -> last bin
            ("a", T0, None),   # excluded entirely
            ("a", T0, 55.0),   # bin 5
        ],
    )
    h = _hists(histogram_tier(pts, "1d", LO, HI, NB))[("a", T0)]
    assert h[0] == 1 and h[5] == 1 and h[9] == 2
    assert sum(h) == 4  # the NULL row is in no bin


@pytest.mark.spark
def test_percentile_within_bin_width(spark):
    rng = random.Random(9)
    vals = [rng.uniform(0, 100) for _ in range(2000)]
    pts = _pts(spark, [("a", T0, v) for v in vals])
    h = histogram_tier(pts, "1d", LO, HI, NB)
    bin_w = (HI - LO) / NB
    for q in (0.1, 0.5, 0.9, 1.0):
        est = percentile_from_histogram(h, q, LO, HI, NB).first().p_est
        exact = sorted(vals)[max(0, int(q * len(vals)) - 1)]
        assert abs(est - exact) <= bin_w, (q, est, exact)
    with pytest.raises(ValueError):
        percentile_from_histogram(h, 0.0, LO, HI, NB)


@pytest.mark.spark
def test_single_exchange_plan(spark):
    pts = _rand(spark)
    df = histogram_tier(pts, "1h", LO, HI, NB)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    # one shuffle: partial conditional-sums combine map-side, the array
    # is assembled after the final aggregate
    assert tree.count("Exchange") == 1, tree


@pytest.mark.spark
def test_bin_index_edges(spark):
    df = spark.createDataFrame([(x,) for x in [0.0, 9.999, 10.0, 99.9]], "v double")
    got = [
        r[0]
        for r in df.select(bin_index(F.col("v"), LO, HI, NB)).collect()
    ]
    assert got == [0, 0, 1, 9]
