"""Unit tests: self-drift KS + Benford leading-digit screen."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.integrity import (
    BENFORD_P,
    benford_digits,
    self_drift_ks,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


T0 = datetime(2024, 1, 1)


@pytest.mark.spark
def test_self_drift_detects_distribution_walk(spark):
    rng = np.random.default_rng(6)
    rows = []
    # 'stable': same N(10,1) throughout -> tiny D
    for i in range(200):
        rows.append(
            ("stable", T0 + timedelta(minutes=i), float(rng.normal(10, 1)))
        )
    # 'walked': N(10,1) then N(13,1) -> D ~ large
    for i in range(100):
        rows.append(
            ("walked", T0 + timedelta(minutes=i), float(rng.normal(10, 1)))
        )
    for i in range(100, 200):
        rows.append(
            ("walked", T0 + timedelta(minutes=i), float(rng.normal(13, 1)))
        )
    got = {r["key"]: r for r in self_drift_ks(_mk(spark, rows)).collect()}
    assert not got["stable"]["drifted"]
    assert got["stable"]["ks_d"] < 0.2
    assert got["walked"]["drifted"]
    assert got["walked"]["ks_d"] > 0.8
    assert got["walked"]["n_a"] + got["walked"]["n_b"] == 200


@pytest.mark.spark
def test_self_drift_matches_numpy_ks(spark):
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 80)
    b = rng.normal(0.5, 1.2, 80)
    rows = [
        ("k", T0 + timedelta(minutes=i), float(v))
        for i, v in enumerate(np.concatenate([a, b]))
    ]
    r = self_drift_ks(_mk(spark, rows)).collect()[0]
    # exact two-sample KS over the combined support
    allv = np.sort(np.unique(np.concatenate([a, b])))
    cdf_a = np.searchsorted(np.sort(a), allv, side="right") / a.size
    cdf_b = np.searchsorted(np.sort(b), allv, side="right") / b.size
    d = float(np.abs(cdf_a - cdf_b).max())
    assert r["ks_d"] == pytest.approx(d, abs=1e-6)


@pytest.mark.spark
def test_self_drift_thin_halves_omitted(spark):
    rows = [("tiny", T0 + timedelta(minutes=i), 1.0) for i in range(10)]
    assert self_drift_ks(_mk(spark, rows)).count() == 0  # 5 < min_half


@pytest.mark.spark
def test_benford_organic_vs_uniform(spark):
    rng = np.random.default_rng(3)
    rows = []
    # organic: log-uniform over 4 decades follows Benford closely
    for i, v in enumerate(10 ** rng.uniform(0, 4, 3000)):
        rows.append(("organic", T0 + timedelta(seconds=i), float(v)))
    # capped: uniform on [100, 200) -> leading digit always 1
    for i, v in enumerate(rng.uniform(100, 200, 3000)):
        rows.append(("capped", T0 + timedelta(seconds=i), float(v)))
    got = {r["key"]: r for r in benford_digits(_mk(spark, rows)).collect()}
    assert got["organic"]["chi2"] < 20.0  # ~8 dof, follows the law
    assert got["capped"]["chi2"] > 1000.0  # spectacularly not
    assert got["capped"]["share_1"] == pytest.approx(1.0)
    # organic shares track log10(1 + 1/d)
    for d in range(1, 10):
        assert got["organic"][f"share_{d}"] == pytest.approx(
            BENFORD_P[d - 1], abs=0.03
        )


@pytest.mark.spark
def test_benford_digit_assignment_boundaries(spark):
    # exact powers of ten and sub-1 values land on the right digit
    vals = [1.0, 10.0, 100.0, 0.1, 0.02, 9.99, 0.3]
    want = [1, 1, 1, 1, 2, 9, 3]
    rows = [
        ("k", T0 + timedelta(seconds=i), v) for i, v in enumerate(vals)
    ] * 10  # clear min_points
    r = benford_digits(_mk(spark, rows)).collect()[0]
    from collections import Counter

    c = Counter(want)
    for d in range(1, 10):
        assert r[f"share_{d}"] == pytest.approx(c.get(d, 0) / len(vals))
