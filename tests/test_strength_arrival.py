"""Unit tests: decomposition strength + inter-arrival stats."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.arrival import interarrival_stats
from tsclust_spark.operators.strength import decomposition_strength


def _mk_ev(spark, rows):
    return spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "value"]
    )


def _series(uid, values, t0=datetime(2024, 1, 1)):
    return [
        (uid, i, t0 + timedelta(hours=i), float(v))
        for i, v in enumerate(values)
    ]


@pytest.mark.spark
def test_strength_separates_trend_from_seasonal(spark):
    n = 70
    trend = [0.5 * i for i in range(n)]
    seas = [10.0 * math.sin(2 * math.pi * i / 7) for i in range(n)]
    rng = np.random.default_rng(2)
    noise = rng.normal(0, 0.1, n)
    rows = (
        _series(1, [t + e for t, e in zip(trend, noise)])
        + _series(2, [s + e for s, e in zip(seas, noise)])
        + _series(3, list(rng.normal(0, 1, n)))
    )
    out = {
        r["key"]: r
        for r in decomposition_strength(
            _mk_ev(spark, rows), period=7, tiebreak_col="event_id"
        ).collect()
    }
    # trending series: high trend strength
    assert out[1]["trend_strength"] > 0.9
    # seasonal series: high seasonal strength, weak trend
    assert out[2]["seasonal_strength"] > 0.9
    assert out[2]["trend_strength"] < out[2]["seasonal_strength"]
    # white noise: both weak
    assert out[3]["trend_strength"] < 0.6
    assert out[3]["seasonal_strength"] < 0.6


@pytest.mark.spark
def test_strength_short_keys_omitted(spark):
    rows = _series(1, range(9))  # 9 points, period 7 -> 3 residuals
    assert (
        decomposition_strength(
            _mk_ev(spark, rows), period=7, tiebreak_col="event_id"
        ).count()
        == 0
    )


def _mk_arr(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "event_id"])


@pytest.mark.spark
def test_interarrival_periodic_is_antibursty(spark):
    t0 = datetime(2024, 1, 1)
    # metronome: constant 60 s gap -> sigma 0 -> B = -1
    rows = [("beat", t0 + timedelta(seconds=60 * i), i) for i in range(20)]
    r = interarrival_stats(_mk_arr(spark, rows)).collect()[0]
    assert r["n_gaps"] == 19
    assert r["mean_gap_s"] == pytest.approx(60.0)
    assert r["std_gap_s"] == pytest.approx(0.0, abs=1e-9)
    assert r["burstiness"] == pytest.approx(-1.0)


@pytest.mark.spark
def test_interarrival_matches_numpy_and_bursty_positive(spark):
    rng = np.random.default_rng(9)
    # heavy-tailed (Pareto) gaps -> B > 0
    gaps = rng.pareto(1.5, 200) + 0.001
    ts = np.cumsum(gaps)
    t0 = datetime(2024, 1, 1)
    rows = [
        ("bursty", t0 + timedelta(seconds=float(t)), i)
        for i, t in enumerate(ts)
    ]
    r = interarrival_stats(_mk_arr(spark, rows)).collect()[0]
    # timestamps quantize to microseconds: compare against the
    # quantized gap multiset, like the engine sees
    us = np.array(
        [int(round(float(t) * 1e6)) for t in ts], dtype=np.int64
    )
    g = np.diff(us) / 1e6
    mu, sd = g.mean(), g.std(ddof=1)
    assert r["n_gaps"] == g.size
    assert r["mean_gap_s"] == pytest.approx(float(mu), rel=1e-9)
    assert r["std_gap_s"] == pytest.approx(float(sd), rel=1e-6)
    assert r["max_gap_s"] == pytest.approx(float(g.max()), rel=1e-9)
    b = (sd - mu) / (sd + mu)
    assert r["burstiness"] == pytest.approx(float(b), rel=1e-6)
    assert r["burstiness"] > 0.2


@pytest.mark.spark
def test_interarrival_duplicate_ts_and_short_keys(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # duplicate timestamps contribute exact zero gaps
        ("dup", t0, 0),
        ("dup", t0, 1),
        ("dup", t0 + timedelta(seconds=10), 2),
        ("dup", t0 + timedelta(seconds=20), 3),
        # 2 gaps < min_gaps -> omitted
        ("short", t0, 0),
        ("short", t0 + timedelta(seconds=5), 1),
        ("short", t0 + timedelta(seconds=9), 2),
    ]
    got = {
        r["key"]: r
        for r in interarrival_stats(_mk_arr(spark, rows)).collect()
    }
    assert set(got) == {"dup"}
    assert got["dup"]["n_gaps"] == 3
    assert got["dup"]["mean_gap_s"] == pytest.approx(20.0 / 3.0)
