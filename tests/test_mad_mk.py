"""Rolling MAD anomalies and the Mann-Kendall trend test."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 5, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_mad_catches_spike_zscore_masks(spark):
    """The motivating case: ONE huge spike inflates std enough that the
    plain z-score misses it at 3 sigma on a short window, while the
    modified z-score (MAD) flags it."""
    from tsclust_spark.operators.rolling import mad_anomalies, zscore_anomalies

    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 500.0]
    rows = [
        (1, i, T0 + dt.timedelta(minutes=5 * i), v) for i, v in enumerate(vals)
    ]
    mad = {
        r["event_id"]: r.asDict()
        for r in mad_anomalies(_df(spark, rows), window_seconds=3600).collect()
    }
    assert mad[7]["is_anomaly"]
    assert not any(mad[i]["is_anomaly"] for i in range(7))
    z = {
        r["event_id"]: r.asDict()
        for r in zscore_anomalies(
            _df(spark, rows), window_seconds=3600, threshold=3.0
        ).collect()
    }
    assert not z[7]["is_anomaly"]  # masked: the spike is in its own window


def test_mad_values_match_numpy(spark):
    from tsclust_spark.operators.rolling import mad_anomalies

    rng = np.random.default_rng(5)
    vals = list(np.round(rng.normal(50, 4, size=30), 2))
    rows = [
        (1, i, T0 + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(vals)
    ]
    got = {
        r["event_id"]: r.asDict()
        for r in mad_anomalies(_df(spark, rows), window_seconds=600).collect()
    }
    for i in range(len(vals)):
        frame = np.array(vals[max(0, i - 10) : i + 1])
        med = np.median(frame)
        mad = np.median(np.abs(frame - med))
        assert got[i]["roll_n"] == frame.size
        assert abs(got[i]["roll_median"] - med) < 1e-12
        assert abs(got[i]["roll_mad"] - mad) < 1e-12


def test_mad_zero_mad_window_flags_false(spark):
    from tsclust_spark.operators.rolling import mad_anomalies

    rows = [(1, i, T0 + dt.timedelta(minutes=i), 5.0) for i in range(6)]
    out = mad_anomalies(_df(spark, rows)).collect()
    assert all(r["abs_mod_z"] is None and not r["is_anomaly"] for r in out)


def _mk_reference(vals):
    n = len(vals)
    s = sum(
        (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(vals)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if var <= 0:
        return s, None
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, z


@pytest.mark.parametrize(
    "vals",
    [
        list(range(20)),                          # perfect increase
        list(range(20, 0, -1)),                   # perfect decrease
        [3.0, 3.0, 3.0, 3.0, 3.0],                # all tied -> var 0
        [1.0, 5.0, 2.0, 5.0, 3.0, 5.0, 4.0, 5.0], # ties + drift
    ],
)
def test_mk_matches_reference(spark, vals):
    from tsclust_spark.operators.trend import mann_kendall

    rows = [
        (1, i, T0 + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(vals)
    ]
    got = mann_kendall(
        _df(spark, rows), tier="1d", tiebreak_col="event_id"
    ).collect()
    assert len(got) == 1
    r = got[0]
    s, z = _mk_reference([float(v) for v in vals])
    assert r["s_stat"] == s
    if z is None:
        assert r["z"] is None and r["trend"] == 0
    else:
        assert abs(r["z"] - z) < 1e-6
        want_trend = (1 if s > 0 else -1 if s < 0 else 0) if abs(z) > 1.96 else 0
        assert r["trend"] == want_trend


def test_mk_monotone_nonlinear_beats_spike(spark):
    from tsclust_spark.operators.trend import mann_kendall

    # exponential growth: MK sees a perfect trend
    rows = [
        (1, i, T0 + dt.timedelta(minutes=i), float(math.exp(0.1 * i)))
        for i in range(15)
    ]
    # flat series with one spike: no trend
    rows += [
        (2, 100 + i, T0 + dt.timedelta(minutes=i), 10.0 if i != 7 else 99.0)
        for i in range(15)
    ]
    got = {r["key"]: r.asDict() for r in mann_kendall(
        _df(spark, rows), tier="1d", tiebreak_col="event_id"
    ).collect()}
    assert got[1]["trend"] == 1 and got[1]["s_stat"] == 105  # all concordant
    assert got[2]["trend"] == 0
