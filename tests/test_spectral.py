"""Unit tests: single-bin DFT (Goertzel) spectral power."""

from datetime import datetime, timedelta

import math

import numpy as np
import pytest

from tsclust_spark.operators.spectral import spectral_power


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


def _hourly(key, values, t0=datetime(2024, 1, 3)):
    return [
        (key, t0 + timedelta(hours=i), float(v))
        for i, v in enumerate(values)
    ]


@pytest.mark.spark
def test_pure_sinusoid_concentrates_power(spark):
    # 14 full cycles of a 24 h sinusoid: power_frac(24) ~ 1, (168) ~ 0
    n = 24 * 14
    v = [10.0 + 3.0 * math.sin(2 * math.pi * i / 24) for i in range(n)]
    rows = _hourly("sine", v)
    got = {
        r["period_hours"]: r
        for r in spectral_power(_mk(spark, rows)).collect()
    }
    assert got[24]["power_frac"] == pytest.approx(1.0, abs=1e-6)
    assert got[168]["power_frac"] < 0.01
    assert got[24]["n_buckets"] == n


@pytest.mark.spark
def test_weekly_cycle_found_at_168(spark):
    n = 168 * 4
    v = [5.0 * math.cos(2 * math.pi * i / 168) for i in range(n)]
    got = {
        r["period_hours"]: r
        for r in spectral_power(_mk(spark, _hourly("wk", v))).collect()
    }
    assert got[168]["power_frac"] == pytest.approx(1.0, abs=1e-6)
    assert got[24]["power_frac"] < 0.01


@pytest.mark.spark
def test_matches_numpy_periodogram_with_gaps(spark):
    rng = np.random.default_rng(3)
    t0 = datetime(2024, 1, 1)
    keep = rng.random(400) > 0.3  # 30% missing buckets
    hours = np.nonzero(keep)[0]
    x = rng.normal(10.0, 2.0, size=hours.size)
    rows = [
        ("gappy", t0 + timedelta(hours=int(h)), float(v))
        for h, v in zip(hours, x)
    ]
    got = {
        r["period_hours"]: r
        for r in spectral_power(_mk(spark, rows)).collect()
    }
    # numpy twin on ABSOLUTE epoch hours (phase must match)
    epoch_h = hours + (t0 - datetime(1970, 1, 1)).total_seconds() / 3600
    xc = x - x.mean()
    for p in (24, 168):
        ang = 2 * math.pi * epoch_h / p
        c = float((xc * np.cos(ang)).sum())
        s = float((xc * np.sin(ang)).sum())
        frac = 2.0 * (c * c + s * s) / (x.size * float((xc * xc).sum()))
        assert got[p]["power_frac"] == pytest.approx(frac, rel=1e-6)


@pytest.mark.spark
def test_constant_and_short_keys_omitted(spark):
    rows = _hourly("const", [7.0] * 50) + _hourly("short", [1, 2, 3])
    assert spectral_power(_mk(spark, rows)).count() == 0
