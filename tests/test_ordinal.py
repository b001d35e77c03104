"""Unit tests: permutation (ordinal-pattern) entropy."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.ordinal import permutation_entropy


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


def _hourly(key, values, t0=datetime(2024, 1, 1)):
    return [
        (key, t0 + timedelta(hours=i), float(v))
        for i, v in enumerate(values)
    ]


@pytest.mark.spark
def test_monotone_ramp_has_zero_entropy(spark):
    # strictly increasing: every triple is the same pattern -> H = 0
    rows = _hourly("ramp", range(20))
    r = permutation_entropy(_mk(spark, rows)).collect()[0]
    assert r["n_windows"] == 18
    assert r["n_patterns"] == 1
    assert r["perm_entropy"] == pytest.approx(0.0, abs=1e-12)


@pytest.mark.spark
def test_alternating_series_two_patterns(spark):
    # 0,1,0,1,...: triples alternate (0,1,0) and (1,0,1) -> 2 patterns,
    # near-equal counts -> H ~ ln2/ln6
    rows = _hourly("alt", [i % 2 for i in range(21)])
    r = permutation_entropy(_mk(spark, rows)).collect()[0]
    assert r["n_patterns"] == 2
    expected = np.log(2) / np.log(6)
    # 19 windows: 10 of one pattern, 9 of the other
    p = np.array([10, 9]) / 19.0
    h = float(-(p * np.log(p)).sum() / np.log(6))
    assert r["perm_entropy"] == pytest.approx(h, rel=1e-9)
    assert abs(r["perm_entropy"] - expected) < 0.01


@pytest.mark.spark
def test_noise_entropy_near_one_and_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=300)
    rows = _hourly("noise", x)
    r = permutation_entropy(_mk(spark, rows)).collect()[0]

    # numpy twin with the same earlier-ranks-smaller tie rule
    v1, v2, v3 = x[:-2], x[1:-1], x[2:]
    code = (
        4 * (v1 <= v2).astype(int)
        + 2 * (v1 <= v3).astype(int)
        + (v2 <= v3).astype(int)
    )
    _, counts = np.unique(code, return_counts=True)
    p = counts / counts.sum()
    h = float(-(p * np.log(p)).sum() / np.log(6))
    assert r["n_windows"] == 298
    assert r["perm_entropy"] == pytest.approx(h, rel=1e-9)
    assert r["perm_entropy"] > 0.95


@pytest.mark.spark
def test_gap_breaks_triples_and_short_keys_omitted(spark):
    t0 = datetime(2024, 1, 1)
    # hours 0..4 then 10..12: windows only within each dense span
    hours = [0, 1, 2, 3, 4, 10, 11, 12]
    rows = [
        ("gappy", t0 + timedelta(hours=h), float(h * h)) for h in hours
    ] + _hourly("short", [1, 2, 3, 4])  # 2 windows < min_windows
    got = {
        r["key"]: r
        for r in permutation_entropy(_mk(spark, rows)).collect()
    }
    assert set(got) == {"gappy"}
    # dense span 0-4 gives 3 triples; 10-12 gives 1
    assert got["gappy"]["n_windows"] == 4


@pytest.mark.spark
def test_tie_rule_earlier_ranks_smaller(spark):
    # constant series: every comparison is <= -> pattern 4+2+1=7 only
    rows = _hourly("const", [5.0] * 10)
    r = permutation_entropy(_mk(spark, rows)).collect()[0]
    assert r["n_patterns"] == 1
    assert r["perm_entropy"] == pytest.approx(0.0, abs=1e-12)
