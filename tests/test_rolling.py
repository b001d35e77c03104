"""Rolling time-range stats vs a brute-force python oracle."""

import datetime as dt

import numpy as np
import pytest

from tsclust_spark.operators.rolling import rolling_stats, zscore_anomalies

T0 = dt.datetime(2024, 5, 1)
RNG = np.random.default_rng(17)


def _mk_rows(n=80, keys=(1, 2)):
    rows = []
    for k in keys:
        t = 0
        for i in range(n):
            t += int(RNG.integers(1, 400))  # irregular sampling
            rows.append((k, T0 + dt.timedelta(seconds=t), float(RNG.normal())))
    return rows


def test_rolling_matches_bruteforce(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = rolling_stats(df, window_seconds=600).collect()
    by_key = {}
    for k, ts, v in rows:
        by_key.setdefault(k, []).append((int(ts.timestamp()), v))
    for r in out:
        e = int(r["ts"].timestamp())
        win = [v for (t, v) in by_key[r["user_id"]] if e - 600 <= t <= e]
        assert r["roll_n"] == len(win)
        assert r["roll_avg"] == pytest.approx(np.mean(win))
        assert r["roll_min"] == pytest.approx(min(win))
        assert r["roll_max"] == pytest.approx(max(win))
        if len(win) >= 2:
            assert r["roll_std"] == pytest.approx(np.std(win, ddof=1))
        else:
            assert r["roll_std"] is None


def test_zscore_flags_spike(spark):
    rows = [(1, T0 + dt.timedelta(seconds=60 * i), 10.0 + 0.1 * ((-1) ** i))
            for i in range(30)]
    rows.append((1, T0 + dt.timedelta(seconds=60 * 30), 50.0))  # spike
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {int(r["ts"].timestamp()): r for r in zscore_anomalies(
        df, window_seconds=3600, threshold=3.0).collect()}
    spike_ts = int((T0 + dt.timedelta(seconds=1800)).timestamp())
    assert out[spike_ts]["is_anomaly"] is True
    flagged = [r for r in out.values() if r["is_anomaly"]]
    assert len(flagged) == 1


def test_zscore_degenerate_windows(spark):
    rows = [(1, T0, 5.0), (2, T0, 1.0), (2, T0 + dt.timedelta(seconds=10), 1.0),
            (2, T0 + dt.timedelta(seconds=20), 9.9)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = zscore_anomalies(df, window_seconds=3600).collect()
    for r in out:
        if r["roll_n"] == 1 or r["roll_std"] is None:
            assert r["is_anomaly"] is False
