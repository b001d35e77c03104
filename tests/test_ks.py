"""Two-sample KS drift statistic."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 6, 1)


def _df(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "slice string, value double")


def _ks_reference(a, b):
    a, b = np.sort(np.asarray(a, float)), np.sort(np.asarray(b, float))
    grid = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, grid, side="right") / a.size
    cb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.max(np.abs(ca - cb)))


def test_ks_identical_slices_zero(spark):
    from tsclust_spark.operators.drift import ks_statistic

    vals = list(np.arange(100) % 17)
    r = ks_statistic(
        _df(spark, vals, vals), "slice", "a", "b"
    ).collect()[0]
    assert r["n_a"] == 100 and r["n_b"] == 100
    assert r["ks_d"] == 0.0 and not r["drifted"]


def test_ks_matches_reference_on_shifted_normals(spark):
    from tsclust_spark.operators.drift import ks_statistic

    rng = np.random.default_rng(3)
    a = np.round(rng.normal(0, 1, 400), 2)
    b = np.round(rng.normal(0.5, 1, 300), 2)
    r = ks_statistic(_df(spark, a, b), "slice", "a", "b").collect()[0]
    want = _ks_reference(a, b)
    assert abs(r["ks_d"] - want) < 1e-6
    assert r["drifted"]  # a half-sigma shift is far above D=0.1


def test_ks_disjoint_supports_is_one(spark):
    from tsclust_spark.operators.drift import ks_statistic

    r = ks_statistic(
        _df(spark, [1.0, 2.0, 3.0], [10.0, 11.0]), "slice", "a", "b"
    ).collect()[0]
    assert r["ks_d"] == 1.0 and r["drifted"]


def test_ks_ignores_nulls_and_other_slices(spark):
    from tsclust_spark.operators.drift import ks_statistic

    rows = [("a", 1.0), ("a", None), ("b", 1.0), ("c", 99.0)]
    df = spark.createDataFrame(rows, "slice string, value double")
    r = ks_statistic(df, "slice", "a", "b").collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 1 and r["ks_d"] == 0.0
