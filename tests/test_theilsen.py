"""Unit tests: Theil–Sen robust trend estimator."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.theilsen import theil_sen


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


@pytest.mark.spark
def test_theil_sen_exact_line(spark):
    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(days=d), 2.0 * d + 5.0) for d in range(10)]
    r = theil_sen(_mk(spark, rows)).collect()[0]
    assert r["n_buckets"] == 10
    assert r["ts_slope"] == pytest.approx(2.0, abs=1e-12)
    # intercept at t=0 epoch days: 5.0 - 2.0 * epoch_days(t0)
    t0_days = t0.timestamp() / 86400.0
    assert r["ts_intercept"] == pytest.approx(
        5.0 - 2.0 * t0_days, rel=1e-12
    )


@pytest.mark.spark
def test_theil_sen_ignores_outlier_where_ols_cannot(spark):
    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(days=d), 1.0 * d) for d in range(20)]
    rows[10] = ("a", t0 + timedelta(days=10), 1e6)  # one wild point
    r = theil_sen(_mk(spark, rows)).collect()[0]
    # median of pairwise slopes still ~1.0; OLS would be ~ thousands
    assert r["ts_slope"] == pytest.approx(1.0, abs=1e-9)


@pytest.mark.spark
def test_theil_sen_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    t0 = datetime(2024, 1, 1)
    days = rng.choice(60, size=25, replace=False)
    vals = {int(d): float(rng.normal(0.5 * d, 2.0)) for d in days}
    rows = [
        ("k", t0 + timedelta(days=int(d), hours=3), vals[int(d)])
        for d in days
    ]
    r = theil_sen(_mk(spark, rows)).collect()[0]
    t = np.sort(
        np.array(
            [
                (t0 + timedelta(days=int(d))).timestamp() / 86400.0
                for d in days
            ]
        )
    )
    v = np.array([vals[int(d)] for d in np.sort(days)])
    iu = np.triu_indices(t.size, k=1)
    slopes = (v[iu[1]] - v[iu[0]]) / (t[iu[1]] - t[iu[0]])
    assert r["ts_slope"] == pytest.approx(float(np.median(slopes)), abs=1e-12)


@pytest.mark.spark
def test_theil_sen_single_bucket_key_omitted(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("multi", t0, 1.0),
        ("multi", t0 + timedelta(days=1), 2.0),
        ("solo", t0 + timedelta(hours=2), 9.0),
        ("solo", t0 + timedelta(hours=5), 11.0),  # same day: one bucket
    ]
    got = {r["key"]: r for r in theil_sen(_mk(spark, rows)).collect()}
    assert set(got) == {"multi"}
    assert got["multi"]["ts_slope"] == pytest.approx(1.0)
