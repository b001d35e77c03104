"""ACF operator (operators/acf.py): known-value series, degenerate
cases, and partitioning invariance."""

import datetime as dt
import math

import numpy as np

import pyspark.sql.functions as F
import pytest

from tsclust_spark.operators.acf import acf


def _series(spark, vals, key="a"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "doc_id string, ts long, value double")


def _one(df, col):
    return df.collect()[0][col]


def test_linear_series_is_perfectly_autocorrelated(spark):
    out = acf(_series(spark, range(50)), lags=(1, 2))
    assert _one(out, "n_1") == 49
    assert abs(_one(out, "acf_1") - 1.0) < 1e-12
    assert abs(_one(out, "acf_2") - 1.0) < 1e-12


def test_alternating_series_is_anticorrelated_at_lag1(spark):
    vals = [1.0 if i % 2 == 0 else -1.0 for i in range(40)]
    out = acf(_series(spark, vals), lags=(1, 2))
    assert abs(_one(out, "acf_1") - (-1.0)) < 1e-12
    assert abs(_one(out, "acf_2") - 1.0) < 1e-12


def test_constant_series_is_null(spark):
    out = acf(_series(spark, [7.0] * 20), lags=(1,))
    assert _one(out, "n_1") == 19
    assert _one(out, "acf_1") is None


def test_matches_pandas_autocorr(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.normal(size=200))
    out = acf(_series(spark, vals), lags=(1, 3))
    s = pd.Series(vals)
    assert math.isclose(_one(out, "acf_1"), s.autocorr(1), rel_tol=1e-9)
    assert math.isclose(_one(out, "acf_3"), s.autocorr(3), rel_tol=1e-9)


def test_partitioning_invariance_and_tiebreak(spark):
    """Same rows, different physical layout -> identical ACF; duplicate
    timestamps resolved by the tiebreak column."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for key in ("a", "b", "c"):
        for i in range(60):
            # duplicate ts every 3rd row: tiebreak must pin the order
            rows.append((key, i // 3, i, float(rng.normal())))
    df = spark.createDataFrame(
        rows, "doc_id string, ts long, event_id long, value double"
    )
    base = acf(df, lags=(1, 2), tiebreak_col="event_id")
    shuffled = acf(
        df.repartition(13, "event_id"), lags=(1, 2), tiebreak_col="event_id"
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, shuffled.collect()))
    assert a == b


def test_single_exchange_plan(spark):
    """The aggregate must reuse the window's hash partitioning: exactly
    one Exchange in the physical plan."""
    df = _series(spark, range(100))
    plan = (
        acf(df, lags=(1, 2))
        ._sc._jvm.PythonSQLUtils.explainString(
            acf(df, lags=(1, 2))._jdf.queryExecution(), "formatted"
        )
    )
    assert plan.count("Exchange") - plan.count("ReusedExchange") >= 1
    # hashpartitioning on the key appears once; no second shuffle for the agg
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan


@pytest.mark.spark
def test_dominant_lag_detects_planted_period(spark):
    from tsclust_spark.operators.acf import dominant_lag

    T0 = dt.datetime(2024, 1, 1)

    rng = np.random.default_rng(19)
    rows = []
    # key 1: strong period-6 cycle; key 2: white noise (no row)
    for i in range(240):
        rows.append(
            (1, i, T0 + dt.timedelta(minutes=i),
             float(10.0 + 5.0 * np.sin(2 * np.pi * i / 6)
                   + rng.normal(0, 0.3)))
        )
        rows.append(
            (2, 1000 + i, T0 + dt.timedelta(minutes=i),
             float(rng.normal(0, 1)))
        )
    df = spark.createDataFrame(
        rows, ["doc_id", "event_id", "ts", "value"]
    )
    out = {
        r["key"]: r
        for r in dominant_lag(
            df, lags=(1, 2, 3, 6, 12), tiebreak_col="event_id"
        ).collect()
    }
    assert out[1]["lag"] == 6
    assert out[1]["acf_value"] > 0.9
    assert 2 not in out  # noise clears no floor — "no period" = no row
