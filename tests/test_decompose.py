"""Classical additive decomposition: numpy-reference equality and
planted trend+seasonal recovery."""

import datetime as dt

import numpy as np
import pytest

T0 = dt.datetime(2024, 7, 1)


def _df(spark, series: dict[int, list[float]]):
    rows = []
    for k, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((k, i, T0 + dt.timedelta(minutes=i), float(v)))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _ref(vals, m):
    x = np.asarray(vals, float)
    half = m // 2
    n = x.size
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        trend[i] = x[i - half : i + half + 1].mean()
    detr = x - trend
    slot_means = np.array(
        [np.nanmean(detr[s::m]) if np.any(~np.isnan(detr[s::m])) else np.nan
         for s in range(m)]
    )
    seasonal_profile = slot_means - np.nanmean(slot_means)
    seasonal = np.array([seasonal_profile[i % m] for i in range(n)])
    residual = x - trend - seasonal
    return trend, seasonal, residual


def test_matches_numpy_reference(spark):
    from tsclust_spark.operators.decompose import decompose_additive

    rng = np.random.default_rng(23)
    vals = list(rng.normal(10, 2, size=40).round(2))
    out = {
        r["event_id"]: r.asDict()
        for r in decompose_additive(
            _df(spark, {1: vals}), period=5, tiebreak_col="event_id"
        ).collect()
    }
    trend, seasonal, residual = _ref(vals, 5)
    for i in range(len(vals)):
        got = out[i]
        if np.isnan(trend[i]):
            assert got["trend"] is None and got["residual"] is None
        else:
            assert abs(got["trend"] - trend[i]) < 1e-9
            assert abs(got["residual"] - residual[i]) < 1e-9
        assert abs(got["seasonal"] - seasonal[i]) < 1e-9


def test_recovers_planted_components(spark):
    from tsclust_spark.operators.decompose import decompose_additive

    m = 5
    pat = np.array([4.0, -1.0, -3.0, 2.0, -2.0])  # sums to 0
    n = 60
    x = [100.0 + 0.5 * i + pat[i % m] for i in range(n)]
    out = {
        r["event_id"]: r.asDict()
        for r in decompose_additive(
            _df(spark, {1: x}), period=m, tiebreak_col="event_id"
        ).collect()
    }
    # linear trend: the centered MA of (level + linear) is exact, and
    # the MA of an integral number of seasonal cycles is its mean (0)
    for i in range(2, n - 2):
        assert abs(out[i]["trend"] - (100.0 + 0.5 * i)) < 1e-9
        assert abs(out[i]["seasonal"] - pat[i % m]) < 1e-9
        assert abs(out[i]["residual"]) < 1e-9


def test_rejects_even_or_tiny_period(spark):
    from tsclust_spark.operators.decompose import decompose_additive

    df = _df(spark, {1: [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError):
        decompose_additive(df, period=4)
    with pytest.raises(ValueError):
        decompose_additive(df, period=1)


def test_multiple_series_independent(spark):
    from tsclust_spark.operators.decompose import decompose_additive

    a = [float(i) for i in range(20)]
    b = [50.0] * 20
    rows = decompose_additive(
        _df(spark, {1: a, 2: b}), period=3, tiebreak_col="event_id"
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    # constant series: zero seasonal, trend == level, residual 0
    for r in by_key[2]:
        if r["trend"] is not None:
            assert r["trend"] == 50.0 and abs(r["residual"]) < 1e-12
        assert abs(r["seasonal"]) < 1e-12


@pytest.mark.spark
def test_multiplicative_recovers_planted_ratio_components(spark):
    from tsclust_spark.operators.decompose import decompose_multiplicative

    t0 = dt.datetime(2024, 1, 1)
    season = np.array([0.6, 1.4, 0.8, 1.2, 1.0, 0.9, 1.1])
    n = 140
    rows = [
        (1, i, t0 + dt.timedelta(hours=i),
         float((100.0 + 0.2 * i) * season[i % 7]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "value"]
    )
    out = decompose_multiplicative(
        df, period=7, tiebreak_col="event_id"
    ).collect()
    mid = [r for r in out if r["trend"] is not None]
    assert len(mid) == n - 6  # edges NULL, classical definition
    for r in mid:
        i = r["event_id"]
        # trend ~ the level line, seasonal ~ the planted ratio,
        # residual ~ 1 (MA over a ratio series has small wiggle)
        assert r["trend"] == pytest.approx(100.0 + 0.2 * i, rel=0.06)
        assert r["seasonal"] == pytest.approx(
            float(season[i % 7]), rel=0.05
        )
        assert r["residual"] == pytest.approx(1.0, rel=0.1)


@pytest.mark.spark
def test_multiplicative_rejects_even_period(spark):
    from tsclust_spark.operators.decompose import decompose_multiplicative

    df = spark.createDataFrame(
        [(1, 0, dt.datetime(2024, 1, 1), 1.0)],
        ["user_id", "event_id", "ts", "value"],
    )
    with pytest.raises(ValueError):
        decompose_multiplicative(df, period=4)
