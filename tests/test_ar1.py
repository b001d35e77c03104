"""Unit tests: AR(1) conditional-least-squares fit."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.ar1 import ar1_fit


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


@pytest.mark.spark
def test_ar1_recovers_simulated_process(spark):
    rng = np.random.default_rng(11)
    phi_true, c_true = 0.7, 3.0
    x = [10.0]
    for _ in range(199):
        x.append(c_true + phi_true * x[-1] + float(rng.normal(0, 0.5)))
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0 + timedelta(days=i), float(v)) for i, v in enumerate(x)
    ]
    r = ar1_fit(_mk(spark, rows)).collect()[0]
    assert r["n_pairs"] == 199

    xa = np.array(x)
    xp, y = xa[:-1], xa[1:]
    phi_hat = float(
        (len(y) * (xp * y).sum() - xp.sum() * y.sum())
        / (len(y) * (xp * xp).sum() - xp.sum() ** 2)
    )
    c_hat = float((y.sum() - phi_hat * xp.sum()) / len(y))
    assert r["phi"] == pytest.approx(phi_hat, rel=1e-9)
    assert r["intercept"] == pytest.approx(c_hat, rel=1e-9)
    resid = y - c_hat - phi_hat * xp
    assert r["resid_var"] == pytest.approx(
        float((resid**2).mean()), rel=1e-6
    )
    # the estimate itself should be near truth on 200 points
    assert abs(r["phi"] - phi_true) < 0.1


@pytest.mark.spark
def test_ar1_gap_breaks_pairs(spark):
    t0 = datetime(2024, 1, 1)
    # days 0,1,2 then 10,11: pairs (0,1),(1,2),(10,11) -> 3 pairs,
    # the 2->10 jump is NOT a lag-1 pair
    days = [0, 1, 2, 10, 11]
    rows = [
        ("a", t0 + timedelta(days=d), float(d * d)) for d in days
    ]
    r = ar1_fit(_mk(spark, rows)).collect()[0]
    assert r["n_pairs"] == 3


@pytest.mark.spark
def test_ar1_constant_or_short_keys_omitted(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # constant lagged series: denominator 0 -> omitted
        ("const", t0 + timedelta(days=d), 5.0) for d in range(4)
    ] + [
        # one pair only -> omitted by n_pairs >= 2
        ("short", t0, 1.0),
        ("short", t0 + timedelta(days=1), 2.0),
        # healthy key
        ("ok", t0, 1.0),
        ("ok", t0 + timedelta(days=1), 2.0),
        ("ok", t0 + timedelta(days=2), 1.5),
    ]
    got = {r["key"]: r for r in ar1_fit(_mk(spark, rows)).collect()}
    assert set(got) == {"ok"}
