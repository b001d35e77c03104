"""Interpolating as-of join: hand-computed expectations on every edge."""

import datetime as dt

import pytest

from tsclust_spark.operators.asof import asof_join, asof_join_interpolate

T0 = dt.datetime(2024, 8, 1)


def _t(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_interpolation_edges(spark):
    right = spark.createDataFrame(
        [
            ("k", _t(100), 10.0),
            ("k", _t(200), 30.0),
            ("k", _t(200), 20.0),   # duplicate ts: greatest value (30) wins
            ("k", _t(400), 50.0),
        ],
        "doc_id string, ts timestamp, value double",
    )
    left = spark.createDataFrame(
        [
            ("k", _t(50)),    # before first right -> next value verbatim
            ("k", _t(100)),   # exact match -> backward value
            ("k", _t(150)),   # halfway 10..30 -> 20
            ("k", _t(300)),   # halfway 30..50 -> 40
            ("k", _t(500)),   # after last right -> prev value verbatim
            ("x", _t(100)),   # key with no right rows -> null
        ],
        "doc_id string, ts timestamp",
    )
    out = {
        (r["doc_id"], int(r["ts"].timestamp() - T0.timestamp())): r
        for r in asof_join_interpolate(left, right).collect()
    }
    assert out[("k", 50)]["asof_value"] == 10.0
    assert out[("k", 100)]["asof_value"] == 10.0
    assert out[("k", 150)]["asof_value"] == pytest.approx(20.0)
    assert out[("k", 300)]["asof_value"] == pytest.approx(40.0)
    assert out[("k", 500)]["asof_value"] == 50.0
    assert out[("x", 100)]["asof_value"] is None
    # duplicate right ts resolved to the max on both sides
    assert out[("k", 300)]["prev_value"] == 30.0
    assert out[("k", 150)]["next_value"] == 30.0
    # exact-ts row: prev and next are both the ts-200 row
    assert out[("k", 100)]["prev_ts"] == _t(100)


def test_interpolate_prev_matches_plain_asof(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    right = spark.createDataFrame(
        [("k", _t(int(s)), float(v)) for s, v in
         zip(sorted(rng.choice(10000, 50, replace=False)), rng.normal(size=50))],
        "doc_id string, ts timestamp, value double",
    )
    left = spark.createDataFrame(
        [("k", _t(int(s))) for s in rng.choice(10000, 80)],
        "doc_id string, ts timestamp",
    )
    interp = {
        (r["doc_id"], r["ts"]): (r["prev_value"], r["prev_ts"])
        for r in asof_join_interpolate(left, right).collect()
    }
    plain = {
        (r["doc_id"], r["ts"]): (r["asof_value"], r["asof_ts"])
        for r in asof_join(left.distinct(), right, key_col="doc_id",
                           right_value_col="value").collect()
    }
    for k, v in plain.items():
        assert interp[k] == v
