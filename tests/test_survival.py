"""Unit tests: Kaplan-Meier churn survival."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.survival import kaplan_meier


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts"])


T0 = datetime(2024, 1, 1)


def _user(uid, first_day, last_day):
    return [
        (uid, T0 + timedelta(days=first_day)),
        (uid, T0 + timedelta(days=last_day)),
    ]


@pytest.mark.spark
def test_km_textbook_example(spark):
    # dataset end = day 30 (one active anchor user defines the edge).
    # u1: duration 5, last day 5  -> gap 25 >= 7 -> EVENT
    # u2: duration 5, last day 25 -> gap 5 < 7   -> censored
    # u3: duration 10, last day 10 -> EVENT
    # u4 (anchor): duration 30, last day 30 -> censored
    rows = (
        _user(1, 0, 5)
        + _user(2, 20, 25)
        + _user(3, 0, 10)
        + _user(4, 0, 30)
    )
    out = {r["duration_days"]: r for r in kaplan_meier(_mk(spark, rows)).collect()}
    assert set(out) == {5, 10, 30}
    # t=5: n_risk 4, events 1, censored 1 -> S = 1 - 1/4 = 0.75
    assert out[5]["n_risk"] == 4
    assert out[5]["n_events"] == 1 and out[5]["n_censored"] == 1
    assert out[5]["survival"] == pytest.approx(0.75)
    # t=10: at risk 2 (u3, u4), 1 event -> S = 0.75 * (1 - 1/2)
    assert out[10]["n_risk"] == 2
    assert out[10]["survival"] == pytest.approx(0.375)
    # t=30: censored only -> survival unchanged
    assert out[30]["n_events"] == 0
    assert out[30]["survival"] == pytest.approx(0.375)


@pytest.mark.spark
def test_km_matches_reference_implementation(spark):
    rng = np.random.default_rng(14)
    rows = []
    end = 60
    lifes = []
    for uid in range(40):
        f = int(rng.integers(0, 30))
        l = f + int(rng.integers(0, 30))
        l = min(l, end)
        rows += _user(uid, f, l)
        lifes.append((l - f, (end - l) >= 7))
    # anchor the dataset end
    rows += [(999, T0 + timedelta(days=end))]
    lifes.append((0, False))

    got = {
        r["duration_days"]: r["survival"]
        for r in kaplan_meier(_mk(spark, rows)).collect()
    }
    # pure-python KM with the same conventions
    from collections import Counter

    ev = Counter(d for d, e in lifes if e)
    cen = Counter(d for d, e in lifes if not e)
    times = sorted(set(ev) | set(cen))
    n_risk = len(lifes)
    s = 1.0
    for t in times:
        d = ev.get(t, 0)
        s *= 1.0 - d / n_risk
        assert got[t] == pytest.approx(s, rel=1e-9), t
        n_risk -= d + cen.get(t, 0)


@pytest.mark.spark
def test_km_everyone_churns_reaches_zero(spark):
    rows = []
    for uid in range(5):
        rows += _user(uid, 0, 3)
    rows += [(99, T0 + timedelta(days=30))]  # anchor, duration 0 censored...
    # wait: anchor's last day == end -> censored, duration 0
    out = {r["duration_days"]: r for r in kaplan_meier(_mk(spark, rows)).collect()}
    # all 5 duration-3 users churn at t=3; survival after = S(0)* (1 - 5/5) = 0
    assert out[3]["survival"] == pytest.approx(0.0, abs=1e-12)


@pytest.mark.spark
def test_logrank_null_and_alternative(spark):
    from pyspark.sql import functions as F

    from tsclust_spark.operators.survival import logrank_test

    rng = np.random.default_rng(21)
    end = 100

    def cohort(uid0, n, mean_life):
        rows = []
        for k in range(n):
            f = int(rng.integers(0, 20))
            l = min(f + max(0, int(rng.exponential(mean_life))), end)
            rows += _user(uid0 + k, f, l)
        return rows

    # identical survival in both groups -> chi2 small.
    # group by user-id parity (explicit expr) so the split is clean.
    rows = cohort(0, 60, 15) + cohort(1000, 60, 15)
    rows += [(9999, T0 + timedelta(days=end))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    r = logrank_test(df, group_expr=F.col("user") >= 1000).collect()[0]
    assert r["n_g0"] + r["n_g1"] == 121
    assert r["chi2"] < 6.0  # null holds (5% line 3.84; allow slack)

    # very different lifetimes -> chi2 large
    rows2 = cohort(0, 60, 5) + cohort(1000, 60, 40)
    rows2 += [(9999, T0 + timedelta(days=end))]
    df2 = spark.createDataFrame(rows2, ["user_id", "ts"])
    r2 = logrank_test(
        df2, group_expr=F.col("user") >= 1000
    ).collect()[0]
    assert r2["chi2"] > 15.0
    # moment identities: expected close to observed under the null only
    assert r2["variance_g1"] > 0


@pytest.mark.spark
def test_weibull_fit_recovers_planted_parameters(spark):
    from tsclust_spark.operators.survival import weibull_fit

    rng = np.random.default_rng(33)
    shape_true, scale_true = 1.5, 20.0
    end = 365
    rows = []
    for uid in range(400):
        f = int(rng.integers(0, 60))
        dur = int(round(float(scale_true * rng.weibull(shape_true))))
        l = min(f + max(dur, 0), end)
        rows += _user(uid, f, l)
    rows += [(9999, T0 + timedelta(days=end))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    r = weibull_fit(df, churn_gap_days=7).collect()[0]
    # the Weibull-plot OLS over unweighted KM points is a rough
    # estimator; generous tolerances, but it must land in the
    # neighborhood and order the quantities correctly
    assert 1.0 < r["shape"] < 2.2
    assert 12.0 < r["scale_days"] < 30.0
    med_true = scale_true * np.log(2) ** (1 / shape_true)
    assert r["median_lifetime_days"] == pytest.approx(med_true, rel=0.4)
    # identity: median = scale * ln2^(1/shape) exactly as computed
    assert r["median_lifetime_days"] == pytest.approx(
        r["scale_days"] * np.log(2) ** (1 / r["shape"]), rel=1e-9
    )
