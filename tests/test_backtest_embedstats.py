"""Unit tests: seasonal-naive backtest + embedding covariance/whitening.

The oracle gates prove Spark == DuckDB on fixtures; these pin the
semantics the gates cannot see: the by-timestamp (not row-offset) join
across gaps, the numpy ground truth for the one-pass moments, and the
whitened-output property.
"""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.backtest import seasonal_naive_backtest
from tsclust_spark.operators.embedstats import (
    embedding_covariance,
    pca_whitening_model,
    whiten_embeddings,
)


@pytest.mark.spark
def test_backtest_scores_by_timestamp_not_row_offset(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    # key 'a': hours 0, 1, 2 on day 1; hours 0 and 2 on day 2 (hour 1
    # missing). Day-2 hour 2's forecast must be day-1 hour 2 (same
    # clock hour), NOT day-1 hour 1 (previous row).
    for h, v in [(0, 10.0), (1, 20.0), (2, 30.0)]:
        rows.append(("a", t0 + timedelta(hours=h), v))
    rows.append(("a", t0 + timedelta(days=1, hours=0), 12.0))
    rows.append(("a", t0 + timedelta(days=1, hours=2), 36.0))
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = seasonal_naive_backtest(df, period_hours=24).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_scored"] == 2  # day-2 hours 0 and 2 only
    # errors: |12-10| = 2 and |36-30| = 6
    assert r["mae"] == pytest.approx(4.0)
    assert r["rmse"] == pytest.approx(np.sqrt((4 + 36) / 2))


@pytest.mark.spark
def test_backtest_bucket_means_feed_the_forecast(spark):
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", t0 + timedelta(minutes=5), 1.0),
            ("a", t0 + timedelta(minutes=50), 3.0),  # hour mean 2.0
            ("a", t0 + timedelta(days=1, minutes=30), 5.0),
        ],
        ["event_type", "ts", "value"],
    )
    r = seasonal_naive_backtest(df, period_hours=24).collect()[0]
    assert r["n_scored"] == 1
    assert r["mae"] == pytest.approx(3.0)  # |5 - mean(1,3)|


@pytest.mark.spark
def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(200, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(5)
    got = {
        (r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()
    }
    ref = np.cov(x.astype(np.float64), rowvar=False)
    assert len(got) == 6 * 7 // 2  # upper triangle incl. diagonal
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(ref[i, j], abs=1e-12)


@pytest.mark.spark
def test_covariance_ignores_null_vectors(spark):
    x = np.arange(12, dtype=np.float64).reshape(4, 3)
    rows = [(i, v.tolist()) for i, v in enumerate(x)] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()
    }
    ref = np.cov(x, rowvar=False)
    for (i, j), v in got.items():
        assert v == pytest.approx(ref[i, j], abs=1e-12)


@pytest.mark.spark
def test_whitening_produces_identity_covariance(spark):
    rng = np.random.default_rng(7)
    # anisotropic data: correlated dims with very different scales
    base = rng.normal(size=(400, 4))
    mix = np.array(
        [[3.0, 0, 0, 0], [1.0, 0.5, 0, 0], [0, 0, 10.0, 0], [0.2, 0, 0, 0.01]]
    )
    x = (base @ mix + np.array([5.0, -3.0, 100.0, 0.0])).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)
    model = pca_whitening_model(df)
    out = whiten_embeddings(df, model)
    y = np.array(
        [r["whitened"] for r in out.orderBy("vec_id").collect()]
    )
    cov = np.cov(y, rowvar=False)
    # float32 inputs bound the achievable identity match (~1e-5 with a
    # 1e3 condition number); exact-arithmetic correctness is covered by
    # test_covariance_matches_numpy
    assert np.abs(cov - np.eye(4)).max() < 1e-4
    # projection is map-only: no Exchange beyond the test's own
    # repartition — assert on an un-repartitioned input
    plain = spark.createDataFrame(
        [(0, x[0].tolist())], ["vec_id", "embedding"]
    )
    plan = (
        whiten_embeddings(plain, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
