"""Bucketed interval join vs the naive BETWEEN join; pairwise series
correlation vs numpy."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.correlate import series_corr_pairs
from tsclust_spark.operators.intervaljoin import interval_join_bucketed

RNG = np.random.default_rng(99)
T0 = dt.datetime(2024, 3, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=int(sec))


def test_interval_join_matches_naive(spark):
    # random intervals (some spanning many buckets, some tiny, touching
    # boundaries) and random points, three keys
    intervals = []
    iid = 0
    for key in ["a", "b", "c"]:
        for _ in range(12):
            start = int(RNG.integers(0, 500_000))
            length = int(RNG.integers(0, 40_000))
            intervals.append((key, iid, _ts(start), _ts(start + length)))
            iid += 1
    points = [
        (["a", "b", "c", "d"][int(RNG.integers(0, 4))], pid, _ts(int(RNG.integers(0, 550_000))))
        for pid in range(400)
    ]
    # include exact-boundary points for a few intervals
    for k, i, s, e in intervals[:5]:
        points.append((k, 1000 + i, s))
        points.append((k, 2000 + i, e))
    idf = spark.createDataFrame(
        intervals, "key string, interval_id int, session_start timestamp, session_end timestamp"
    )
    pdf = spark.createDataFrame(points, "key string, point_id int, ts timestamp")

    got = {
        (r["point_id"], r["interval_id"])
        for r in interval_join_bucketed(
            pdf, idf, key_cols=["key"], bucket_seconds=7200
        ).collect()
    }
    naive = {
        (r["point_id"], r["interval_id"])
        for r in pdf.join(idf, on="key")
        .filter(F.col("ts").between(F.col("session_start"), F.col("session_end")))
        .collect()
    }
    assert got == naive
    assert len(naive) > 0


def test_interval_join_guard_raises(spark):
    idf = spark.createDataFrame(
        [("k", 0, _ts(0), _ts(10**9))],
        "key string, interval_id int, session_start timestamp, session_end timestamp",
    )
    pdf = spark.createDataFrame([("k", 0, _ts(5))], "key string, point_id int, ts timestamp")
    with pytest.raises(Exception, match="buckets"):
        interval_join_bucketed(
            pdf, idf, key_cols=["key"], bucket_seconds=60,
            max_buckets_per_interval=100,
        ).collect()


def test_series_corr_matches_numpy(spark):
    # three series on a shared minute grid: y = 2x + noise (high r),
    # z independent, w constant (zero variance -> dropped)
    n = 60
    x = RNG.normal(size=n)
    rows = []
    for i in range(n):
        ts = _ts(i * 3600)
        rows.append((1, ts, float(x[i])))
        rows.append((2, ts, float(2 * x[i] + RNG.normal(scale=0.1))))
        rows.append((3, ts, float(RNG.normal())))
        rows.append((4, ts, 7.0))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {
        (r["key_a"], r["key_b"]): (r["n_overlap"], r["r"])
        for r in series_corr_pairs(df, bucket="hour", min_overlap=10).collect()
    }
    # constant series 4 has undefined corr with everything: dropped
    assert all(4 not in k for k in out)
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    vals = {k: v[1] for k, v in out.items()}
    v2 = np.array([2 * x[i] for i in range(n)])  # noiseless twin unused; recompute exact
    got_series = {1: x, 2: None, 3: None}
    # rebuild the exact per-series arrays from rows for the numpy oracle
    per = {1: [], 2: [], 3: []}
    for uid, ts, v in rows:
        if uid in per:
            per[uid].append(v)
    for (a, b), r in vals.items():
        expect = np.corrcoef(per[a], per[b])[0, 1]
        assert r == pytest.approx(expect, abs=1e-9)
    assert out[(1, 2)][0] == n


def test_series_corr_min_overlap(spark):
    rows = [(1, _ts(i * 3600), float(i)) for i in range(4)]
    rows += [(2, _ts(i * 3600), float(-i)) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    assert series_corr_pairs(df, min_overlap=5).count() == 0
    assert series_corr_pairs(df, min_overlap=3).count() == 1
